"""Distributed semi-join / anti-join on an integer key.

The reference engine has no relational joins at all (its only "joins"
are posting-list intersections, search.chpl); these exist for the
relational/analytics side of the pipeline (EXISTS / NOT EXISTS
shapes: "orders with a returned item", "customers with no orders").

Shape: ONE coarse hash-partition shuffle carrying both inputs.  The
probe side is projected to bare keys and deduplicated map-side (per
batch) before the exchange, so a heavily duplicated probe key costs
one row per input block, not one per occurrence.  Inside each
partition the membership test is a single vectorized `np.isin` over
all keys at once.  Unlike a hash equi-join there is no pairing or
payload multiplication — output rows are a subset of the left input —
so this never needs the join operator's actor pool or a build-side
hash table; partitioning by key hash is sufficient because membership
never crosses key boundaries.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

from chearch_ray.stages.partition import coarse_partition_ids

#: default coarse partition count (matches the dedup/events operators:
#: enough for 32-way parallelism with headroom, few enough that the
#: per-partition python overhead is noise)
JOIN_PARTITIONS = 64


def _left_rows(batch: pa.Table, key: str, payload: list[str],
               n_partitions: int) -> pa.Table:
    k = batch[key].to_numpy().astype(np.int64)
    cols = {"__sj_k": pa.array(k, type=pa.int64()), "__sj_probe": pa.array(
        np.zeros(len(batch), dtype=np.int8), type=pa.int8())}
    for c in payload:
        cols[c] = batch[c]
    t = pa.table(cols)
    return t.append_column(
        "pgrp", pa.array(coarse_partition_ids(k, n_partitions), type=pa.int32()))


def _probe_rows(batch: pa.Table, key: str, payload_schema: pa.Schema,
                n_partitions: int) -> pa.Table:
    # dedup map-side: one row per distinct key per input block
    k = np.unique(batch[key].to_numpy().astype(np.int64))
    cols = {"__sj_k": pa.array(k, type=pa.int64()), "__sj_probe": pa.array(
        np.ones(len(k), dtype=np.int8), type=pa.int8())}
    for f in payload_schema:
        cols[f.name] = pa.nulls(len(k), type=f.type)
    t = pa.table(cols)
    return t.append_column(
        "pgrp", pa.array(coarse_partition_ids(k, n_partitions), type=pa.int32()))


def _membership_partition(group: pa.Table, anti: bool) -> pa.Table:
    probe = group["__sj_probe"].to_numpy()
    left = group.filter(pa.array(probe == 0)).drop_columns(["pgrp", "__sj_probe"])
    probe_keys = group["__sj_k"].to_numpy()[probe == 1]
    if len(left) == 0:
        return left.drop_columns(["__sj_k"])
    hit = np.isin(left["__sj_k"].to_numpy(), probe_keys)
    keep = ~hit if anti else hit
    return left.filter(pa.array(keep)).drop_columns(["__sj_k"])


def hash_semi_join(left_ds, right_ds, on: str, right_on: str | None = None,
                   payload: list[str] | None = None, anti: bool = False,
                   n_partitions: int | None = None):
    """left rows whose `on` key IS (semi) / IS NOT (anti) present in
    `right_ds[right_on]`.  `payload` names the left columns to carry
    through (default: every column except the key; the key itself is
    re-emitted only if listed).  Returns a Dataset of payload columns.
    """
    import ray.data  # noqa: F401  (caller owns the session)

    if n_partitions is None:
        from chearch_ray.stages.partition import (datasets_size_bytes,
                                                  join_parallelism)

        n_partitions = join_parallelism(
            None, size_bytes=datasets_size_bytes(left_ds, right_ds))
    right_on = right_on or on
    if payload is None:
        payload = [c for c in left_ds.schema().names if c != on]
    left_schema = left_ds.schema()
    payload_schema = pa.schema(
        [pa.field(c, left_schema.types[left_schema.names.index(c)]) for c in payload])

    left = left_ds.map_batches(
        partial(_left_rows, key=on, payload=payload, n_partitions=n_partitions),
        batch_format="pyarrow",
    )
    probe = right_ds.map_batches(
        partial(_probe_rows, key=right_on, payload_schema=payload_schema,
                n_partitions=n_partitions),
        batch_format="pyarrow",
    )
    return left.union(probe).groupby("pgrp").map_groups(
        partial(_membership_partition, anti=anti), batch_format="pyarrow",
    )


def hash_anti_join(left_ds, right_ds, on: str, right_on: str | None = None,
                   payload: list[str] | None = None,
                   n_partitions: int | None = None):
    """left rows with NO matching key in right (NOT EXISTS)."""
    return hash_semi_join(left_ds, right_ds, on, right_on=right_on,
                          payload=payload, anti=True,
                          n_partitions=n_partitions)
