"""Benchmark decontamination: flag training documents that share
word n-grams with an evaluation/benchmark set.

The standard LLM-pretraining hygiene pass (e.g. GPT-3 appendix C /
Gopher §A.5 style n-gram overlap): an eval suite is tiny next to the
corpus, so its n-gram set is computed ONCE, broadcast to every worker
via the object store, and the corpus is scanned in a single vectorized
map_batches pass — no shuffle, no join, no driver loop over documents.

Shingles reuse the dedup layer's rolling-hash machinery
(stages/dedup._doc_shingle_hashes): token-level w-grams hashed to
uint64.  Matching on hashes instead of strings is exact at any
realistic scale (a 64-bit collision would need ~2^32 distinct
n-grams in ONE benchmark set before a false flag becomes likely).

The reference engine has no analogue; this is a training-data-side
operator like stages/dedup.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from chearch_ray.stages.dedup import _doc_shingle_hashes


def shingle_hash_set(table: pa.Table, text_column: str = "text", w: int = 5) -> np.ndarray:
    """sorted unique uint64 shingle hashes of a (small) benchmark
    table — the broadcast side.  Driver-side by design: eval suites
    are KBs-to-MBs while the corpus is TBs; if the benchmark ever
    outgrew the driver, the same per-batch union runs as map_batches
    + one tiny aggregate."""
    h, _ = _doc_shingle_hashes(table, text_column, w)
    return np.unique(h)


def _overlap_batch(batch: pa.Table, bench_ref, w: int, min_overlap: int,
                   text_column: str) -> pa.Table:
    import ray

    bench = ray.get(bench_ref) if isinstance(bench_ref, ray.ObjectRef) else bench_ref
    n = len(batch)
    h, rows = _doc_shingle_hashes(batch, text_column, w)
    # unique (doc, shingle): overlap counts DISTINCT shared n-grams
    order = np.lexsort((h, rows))
    rows_s, h_s = rows[order], h[order]
    keep = np.ones(len(h_s), dtype=bool)
    if len(h_s):
        keep[1:] = (rows_s[1:] != rows_s[:-1]) | (h_s[1:] != h_s[:-1])
    rows_u, h_u = rows_s[keep], h_s[keep]
    n_shingles = np.zeros(n, dtype=np.int64)
    np.add.at(n_shingles, rows_u, 1)
    # membership against the sorted benchmark set: one searchsorted
    # over the batch's unique shingles
    if len(bench) and len(h_u):
        pos = np.searchsorted(bench, h_u)
        pos_c = np.minimum(pos, len(bench) - 1)
        hit = bench[pos_c] == h_u
    else:
        hit = np.zeros(len(h_u), dtype=bool)
    n_overlap = np.zeros(n, dtype=np.int64)
    np.add.at(n_overlap, rows_u[hit], 1)
    return pa.table(
        {
            "doc_id": batch["doc_id"].cast(pa.int64()),
            "n_shingles": pa.array(n_shingles, type=pa.int64()),
            "n_overlap": pa.array(n_overlap, type=pa.int64()),
            "contaminated": pa.array(n_overlap >= min_overlap),
        }
    )


def decontaminate(ds, bench_hashes: np.ndarray, w: int = 5, min_overlap: int = 1,
                  text_column: str = "text"):
    """corpus Dataset -> (doc_id, n_shingles, n_overlap, contaminated):
    per-document count of DISTINCT w-gram shingles shared with the
    broadcast benchmark set, flagged at `min_overlap`.  Keep the clean
    half with `.filter(expr="not contaminated")` downstream, or audit
    the flagged rows directly."""
    from functools import partial

    import ray

    bench_ref = ray.put(np.asarray(bench_hashes, dtype=np.uint64))
    return ds.map_batches(
        partial(_overlap_batch, bench_ref=bench_ref, w=w,
                min_overlap=min_overlap, text_column=text_column),
        batch_format="pyarrow",
        batch_size=1024,
    )
