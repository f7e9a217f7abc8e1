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


# ------------------------------------------------- join sizing
#: CPU reserved per hash-join aggregator actor.  One aggregator actor
#: is spawned PER PARTITION and the reservation lives for the whole
#: plan, so a two-join pipeline holds 2 x partitions x this many CPUs
#: before any read/map task (1 CPU each) can schedule.  Ray's default
#: (0.125/partition) deadlocked the 4-cpu test session: 2 joins x 8
#: partitions x 0.125 = 2.0 CPUs + resident searcher actors left less
#: than one whole CPU for tasks.  Aggregators only concat/hash-route
#: blocks, so a small fraction is honest.
JOIN_AGG_NUM_CPUS = 0.05

#: hard cap on join partitions (= aggregator actors) per join
JOIN_PARTITIONS_CAP = 64


def cluster_cpus(default: int = 8) -> int:
    """Total CPUs of the current Ray cluster (or `default` when Ray
    isn't initialised yet — sizing must never force an init)."""
    try:
        import ray

        if ray.is_initialized():
            return max(1, int(ray.cluster_resources().get("CPU", default)))
    except Exception:
        pass
    return default


#: target bytes per join partition when the input size is known
JOIN_PARTITION_BYTES = 256 << 20


def join_parallelism(requested: int | None = None,
                     cap: int = JOIN_PARTITIONS_CAP,
                     size_bytes: int | None = None) -> int:
    """Join partition count sized to the session.  Each partition
    costs one long-lived aggregator actor (spawn + reservation for the
    whole plan), so the count must track BOTH cluster size and input
    size: measured at 32 cpus over a 25 MB join input, 32 partitions
    ran 1.8x slower than 8 — pure actor-spawn overhead.  Resolution
    order: an explicit `requested` wins (clamped to cluster cpus);
    else a known `size_bytes` gives ceil(bytes / 256 MB); else the
    cluster cpu count.  All clamped to [2, min(cap, cpus)]."""
    ceiling = min(cap, cluster_cpus())
    if requested is not None:
        n = requested
    elif size_bytes:
        n = -(-int(size_bytes) // JOIN_PARTITION_BYTES)
    else:
        n = ceiling
    return max(2, min(ceiling, n))


def datasets_size_bytes(*datasets) -> int | None:
    """best-effort input size for join-partition sizing: parquet reads
    report a metadata-based estimate without executing; transformed /
    unsized datasets contribute nothing."""
    total = 0
    for ds in datasets:
        try:
            b = ds.size_bytes()
        except Exception:
            b = None
        if b:
            total += int(b)
    return total or None


def join_remote_args() -> dict:
    """aggregator_ray_remote_args for Dataset.join: explicit per-call
    CPU reservation.  NOTE: the DataContext
    `join_operator_actor_num_cpus_per_partition_override` is NOT a
    substitute — each Dataset snapshots its DataContext at creation,
    so mutating the global context between `read_parquet` and
    `materialize` never reaches the join operator (observed: actors
    still reserved Ray's 0.125 default)."""
    return {"num_cpus": JOIN_AGG_NUM_CPUS}
