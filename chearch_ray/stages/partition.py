"""Shared coarse-partitioning helpers.

Several operators (MinHash buckets, n-gram Jaccard, connected
components, sessionize, as-of join, quantizer sampling) use the same
pattern: spread integer keys across a FIXED number of coarse
partitions with one fmix64-style avalanche round, groupby the
partition id, then process runs vectorized inside each partition —
~n_partitions Ray tasks instead of one Python call per tiny group.
This module is the single home for that mixing/partitioning logic so
a fix (e.g. signed-key handling) lands everywhere at once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_FMIX_MULT = np.uint64(0xFF51AFD7ED558CCD)


def fmix_mix(u: np.ndarray) -> np.ndarray:
    """One fmix64 avalanche round over a uint64 array: enough to
    decorrelate adjacent/clustered integer keys before a modulo."""
    u = np.asarray(u, dtype=np.uint64)
    return (u ^ (u >> np.uint64(33))) * _FMIX_MULT


def coarse_partition_ids(keys: np.ndarray, n_partitions: int) -> np.ndarray:
    """keys (any 64-bit integer dtype; signed values bit-cast) ->
    int32 partition ids in [0, n_partitions)."""
    u = np.asarray(keys)
    if u.dtype != np.uint64:
        # astype int64->uint64 wraps mod 2^64 == the bit pattern
        u = u.astype(np.uint64)
    return (fmix_mix(u) % np.uint64(n_partitions)).astype(np.int32)


def add_pgrp_column(batch: pa.Table, n_partitions: int, key: str) -> pa.Table:
    """Append the coarse-partition id of `key` as int32 column `pgrp`
    (module-level so functools.partial over it survives map_batches /
    map_groups serialization)."""
    ids = coarse_partition_ids(batch[key].to_numpy(), n_partitions)
    return batch.append_column("pgrp", pa.array(ids, type=pa.int32()))


def drop_pgrp_then(group: pa.Table, fn) -> pa.Table:
    """map_groups adapter: strip the routing column before the real
    per-partition function runs."""
    return fn(group.drop_columns(["pgrp"]))
