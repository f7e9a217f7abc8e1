"""KMV (k-minimum-values) distinct-count sketch: a one-pass,
mergeable cardinality estimator for integer key columns.

Each batch contributes its k smallest DISTINCT Knuth-hash values
(`h = key * 6364136223846793005 mod 2^64` — an odd multiplier, so the
map is a BIJECTION on uint64 and distinct hashes == distinct keys,
no collision error term); partials merge by keeping the k smallest of
the union, and the estimate is the classic KMV

    D ≈ (k - 1) * 2^64 / h_(k)        (exact count when fewer than k)

computed in INTEGER arithmetic so a SQL oracle (HUGEINT) reproduces
the estimate bit-for-bit — the sketch is deterministic, merge-order-
and partition-invariant.

Scale shape: the shuffle carries k values per block (k * 8 bytes),
the driver merge holds blocks * k values; at 10^12 rows the pass
never materializes the distinct set anywhere — that is the point of
the sketch (contrast `count(DISTINCT ...)`, whose exact groupby
shuffles every distinct key).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

from chearch_ray.stages.sample import KNUTH_MULT

#: default sketch size
KMV_K = 1024


def _kmv_partial(batch: pa.Table, column: str, k: int) -> pa.Table:
    h = np.unique(batch[column].to_numpy().astype(np.uint64) * KNUTH_MULT)
    if len(h) > k:
        h = np.partition(h, k - 1)[:k]
    return pa.table({"hv": pa.array(h, type=pa.uint64())})


def kmv_distinct(ds, column: str, k: int = KMV_K) -> int:
    """Dataset -> KMV distinct-count estimate of `column` (int).
    Deterministic: same input -> same estimate, regardless of
    partitioning."""
    partials = ds.map_batches(
        partial(_kmv_partial, column=column, k=k), batch_format="pyarrow"
    )
    vals: list[np.ndarray] = []
    for t in partials.iter_batches(batch_size=None, batch_format="pyarrow"):
        if len(t):
            vals.append(t["hv"].to_numpy().astype(np.uint64))
    if not vals:
        return 0
    h = np.unique(np.concatenate(vals))
    if len(h) < k:
        return int(len(h))
    kth = int(np.partition(h, k - 1)[k - 1])
    if kth == 0:
        return int(len(h))
    return ((k - 1) << 64) // kth
