"""Vectorized Levenshtein distance of ONE query against an array of
candidate strings — the kernel behind QueryEngine.suggest
(did-you-mean).

The classic DP runs with the candidate axis vectorized: DP state is a
[N, m+1] int16 matrix (m = query length), advanced one candidate-
character position at a time; each of the L*m steps is a handful of
numpy ops over all N candidates at once, so no Python loop touches an
individual string pair.  Distances are exact (unit costs, same
definition as DuckDB's levenshtein(), which the driver oracle uses).

Candidates are padded into a [N, L] uint32 codepoint matrix once; each
candidate's final distance is collected from the DP row at its own
length.  A length prefilter (|len - m| <= max_distance) is the
caller's job and cuts most of the work.
"""

from __future__ import annotations

import numpy as np


def _code_matrix(terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
    lens = np.array([len(t) for t in terms], dtype=np.int32)
    L = int(lens.max()) if len(lens) else 0
    mat = np.zeros((len(terms), L), dtype=np.uint32)
    for i, t in enumerate(terms):
        # fromiter over codepoints: one pass per term at build time only
        mat[i, : len(t)] = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
    return mat, lens


def levenshtein_to(query: str, terms: list[str]) -> np.ndarray:
    """exact edit distance from `query` to every term (int32 array)."""
    n = len(terms)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    q = np.frombuffer(query.encode("utf-32-le"), dtype=np.uint32)
    m = len(q)
    W, lens = _code_matrix(terms)
    L = W.shape[1]
    if m == 0:
        return lens.astype(np.int32)
    # prev[i, j] = distance(terms[i][:t-1], query[:j]); final collects
    # each term's row at its own length (zero-length terms -> m)
    final = np.where(lens == 0, np.int16(m), np.int16(max(m, L) + 1)).astype(np.int16)
    prev = np.broadcast_to(np.arange(m + 1, dtype=np.int16), (n, m + 1)).copy()
    for t in range(1, L + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = t
        ct = W[:, t - 1]
        for j in range(1, m + 1):
            sub = prev[:, j - 1] + (ct != q[j - 1])
            np.minimum(sub, prev[:, j] + 1, out=sub)
            np.minimum(sub, cur[:, j - 1] + 1, out=sub)
            cur[:, j] = sub
        hit = lens == t
        if hit.any():
            final = np.where(hit, cur[:, m], final)
        prev = cur
    return final.astype(np.int32)
