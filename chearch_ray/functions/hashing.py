"""Deterministic hashing: stable doc ids, term shard routing, content
sha256.

The reference routes documents to partitions by caller-chosen hash
(README.md:17 "document-based hash partitioning") and buckets terms
with a murmur3 finalizer into a 32768-bucket table
(genhashkey32.chpl:7-18, memorysegment.chpl:124-126).  We keep the
murmur3 finalizer for integer term-shard routing parity and add:

* ``doc_id_from_keys`` — stable 64-bit doc id from (repo, path, commit)
  via blake2b-8.  Sort-free and deterministic across runs/processes
  (PYTHONHASHSEED-independent), which rank-identity requires.  NOTE at
  10^12 docs a 64-bit space expects ~3e4 birthday collisions; the
  production-scale setting would widen to 128 bits (two columns) — the
  engine only relies on ids being unique and stable, not dense.
* ``term_shards`` — shard routing for string terms, memoized per
  callable (terms are Zipfian; the cache hit rate is ~100%).
* ``sha256_hex`` — per-row content sha for the input invariant
  (BASELINE.json: per-row content sha256 equality vs the reference).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def murmur3_finalize32(h: int) -> int:
    """32-bit murmur3 finalizer (genhashkey32.chpl:7-18)."""
    h &= 0xFFFFFFFF
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def doc_id_from_keys(
    repo: pa.Array | list, path: pa.Array | list, commit: pa.Array | list
) -> np.ndarray:
    """(repo, path, commit) -> uint64 doc id, vectorized over rows.

    Per-row blake2b is a Python loop, but runs once per *document*
    (not per token) inside the tokenize stage — negligible next to
    tokenization itself.
    """
    out = np.empty(len(repo), dtype=np.uint64)
    h = hashlib.blake2b
    for i, (r, p, c) in enumerate(zip(repo, path, commit)):
        key = f"{r}\x00{p}\x00{c}".encode()
        out[i] = int.from_bytes(h(key, digest_size=8).digest(), "big")
    return out


def doc_id_wide_from_keys(
    repo: pa.Array | list, path: pa.Array | list, commit: pa.Array | list
) -> tuple[np.ndarray, np.ndarray]:
    """(repo, path, commit) -> (hi, lo) uint64 pair per row: the
    128-bit external id of `EngineConfig.doc_id_bits=128` mode
    (blake2b-16; birthday collisions ~0 at 10^12 docs, vs ~3e4 for
    the 64-bit ids — ROADMAP #6)."""
    hi = np.empty(len(repo), dtype=np.uint64)
    lo = np.empty(len(repo), dtype=np.uint64)
    h = hashlib.blake2b
    for i, (r, p, c) in enumerate(zip(repo, path, commit)):
        key = f"{r}\x00{p}\x00{c}".encode()
        d = h(key, digest_size=16).digest()
        hi[i] = int.from_bytes(d[:8], "big")
        lo[i] = int.from_bytes(d[8:], "big")
    return hi, lo


def key16(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    """(hi, lo) uint64 pairs -> 'S16' big-endian byte keys whose
    BYTEWISE order equals the numeric (hi, lo) order — numpy sorts and
    searchsorted work on fixed-width bytes, giving vectorized 128-bit
    comparisons without a 128-bit integer dtype."""
    n = len(hi)
    rec = np.empty(n, dtype=[("h", ">u8"), ("l", ">u8")])
    rec["h"] = hi
    rec["l"] = lo
    return rec.view("S16").reshape(n)


def term_hash64(term: str) -> int:
    """Stable 64-bit hash of a term string."""
    return int.from_bytes(hashlib.blake2b(term.encode(), digest_size=8).digest(), "big")


class TermSharder:
    """Memoized term -> shard router (use one instance per actor/stage;
    the dict amortizes across batches like the reference's resident
    term hash table, memorysegment.chpl:124-126)."""

    def __init__(self, num_shards: int):
        self.num_shards = num_shards
        self._cache: dict[str, int] = {}

    def shard_of(self, term: str) -> int:
        s = self._cache.get(term)
        if s is None:
            s = term_hash64(term) % self.num_shards
            self._cache[term] = s
        return s

    def shards(self, terms: pa.Array | np.ndarray | list) -> np.ndarray:
        """Vectorized-ish routing: hash each *unique* term once, then
        map via dictionary encode."""
        arr = terms if isinstance(terms, pa.Array) else pa.array(terms)
        dict_arr = arr.dictionary_encode()
        uniq = dict_arr.dictionary.to_pylist()
        lut = np.fromiter((self.shard_of(t) for t in uniq), dtype=np.int32, count=len(uniq))
        indices = np.asarray(dict_arr.indices)
        return lut[indices]


def sha256_hex(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """string column -> lowercase hex sha256 (per-row; used once per
    document for the input invariant and exact dedup)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = [hashlib.sha256(("" if v is None else v).encode()).hexdigest() for v in col.to_pylist()]
    return pa.array(out, type=pa.string())
