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


#: below this many probe-key partial rows (per-block-deduped), the key
#: set broadcasts (`ray.put`) and membership is ONE map pass over the
#: left side — no shuffle.  A sort exchange has seconds of fixed
#: scheduling cost however small the data (measured: 4.8 s Sort for
#: 0.7 s of work on the sf0.1 semi-joins); at 100 TB a huge probe side
#: exceeds the gate and takes the partitioned path.
PROBE_BROADCAST_KEYS = 5_000_000


def _probe_key_partial(batch: pa.Table, key: str) -> pa.Table:
    k = np.unique(batch[key].to_numpy().astype(np.int64))
    return pa.table({"__sj_k": pa.array(k, type=pa.int64())})


def _broadcast_member_filter(batch: pa.Table, key: str, payload: list[str],
                             anti: bool, keys_ref) -> pa.Table:
    import ray

    keys = ray.get(keys_ref) if not isinstance(keys_ref, np.ndarray) else keys_ref
    hit = np.isin(batch[key].to_numpy().astype(np.int64), keys)
    keep = ~hit if anti else hit
    return pa.table({c: batch[c] for c in payload}).filter(pa.array(keep))


def hash_semi_join(left_ds, right_ds, on: str, right_on: str | None = None,
                   payload: list[str] | None = None, anti: bool = False,
                   n_partitions: int | None = None,
                   probe_broadcast_limit: int = PROBE_BROADCAST_KEYS):
    """left rows whose `on` key IS (semi) / IS NOT (anti) present in
    `right_ds[right_on]`.  `payload` names the left columns to carry
    through (default: every column except the key; the key itself is
    re-emitted only if listed).  Returns a Dataset of payload columns.

    Two shapes behind one contract: the probe side always reduces to
    per-block distinct keys first; when that partial set is small
    (<= probe_broadcast_limit rows) the merged key array broadcasts
    via `ray.put` and membership is a single vectorized map over the
    left side — otherwise both sides exchange on a coarse key-hash
    partition and each partition runs one `np.isin`.
    """
    import ray
    import ray.data  # noqa: F401  (caller owns the session)

    right_on = right_on or on
    if payload is None:
        payload = [c for c in left_ds.schema().names if c != on]

    # probe partials are needed by BOTH paths; materialized so the
    # gate's count() is free and neither path recomputes them
    probe_partials = right_ds.map_batches(
        partial(_probe_key_partial, key=right_on), batch_format="pyarrow",
    ).materialize()
    if probe_partials.count() <= probe_broadcast_limit:
        vals = [t["__sj_k"].to_numpy() for t in probe_partials.iter_batches(
            batch_size=None, batch_format="pyarrow") if len(t)]
        keys = np.unique(np.concatenate(vals)) if vals else np.empty(0, dtype=np.int64)
        keys_ref = ray.put(keys)
        return left_ds.map_batches(
            partial(_broadcast_member_filter, key=on, payload=payload,
                    anti=anti, keys_ref=keys_ref),
            batch_format="pyarrow",
        )

    if n_partitions is None:
        from chearch_ray.stages.partition import (datasets_size_bytes,
                                                  join_parallelism)

        n_partitions = join_parallelism(
            None, size_bytes=datasets_size_bytes(left_ds, right_ds))
    left_schema = left_ds.schema()
    payload_schema = pa.schema(
        [pa.field(c, left_schema.types[left_schema.names.index(c)]) for c in payload])

    left = left_ds.map_batches(
        partial(_left_rows, key=on, payload=payload, n_partitions=n_partitions),
        batch_format="pyarrow",
    )
    probe = probe_partials.map_batches(
        partial(_probe_rows, key="__sj_k", payload_schema=payload_schema,
                n_partitions=n_partitions),
        batch_format="pyarrow",
    )
    return left.union(probe).groupby("pgrp").map_groups(
        partial(_membership_partition, anti=anti), batch_format="pyarrow",
    )


def hash_anti_join(left_ds, right_ds, on: str, right_on: str | None = None,
                   payload: list[str] | None = None,
                   n_partitions: int | None = None,
                   probe_broadcast_limit: int = PROBE_BROADCAST_KEYS):
    """left rows with NO matching key in right (NOT EXISTS)."""
    return hash_semi_join(left_ds, right_ds, on, right_on=right_on,
                          payload=payload, anti=True,
                          n_partitions=n_partitions,
                          probe_broadcast_limit=probe_broadcast_limit)


# --------------------------------------------- broadcast lookup join
#: below this many right-side rows the lookup table broadcasts
LOOKUP_BROADCAST_ROWS = 2_000_000


def _lookup_attach(batch: pa.Table, key: str, payload: list[str], ref) -> pa.Table:
    import ray

    keys, cols = ray.get(ref) if not isinstance(ref, tuple) else ref
    k = batch[key].to_numpy().astype(np.int64)
    pos = np.searchsorted(keys, k)
    posc = np.minimum(pos, max(len(keys) - 1, 0))
    hit = keys[posc] == k if len(keys) else np.zeros(len(k), dtype=bool)
    out = batch.filter(pa.array(hit))
    take = pa.array(posc[hit], type=pa.int64())
    for c in payload:
        out = out.append_column(c, cols[c].take(take))
    return out


def broadcast_lookup_join(left_ds, right_ds, on: str, right_on: str | None = None,
                          payload: list[str] | None = None,
                          n_partitions: int | None = None,
                          broadcast_limit: int = LOOKUP_BROADCAST_ROWS,
                          payload_types: dict | None = None):
    """INNER equi-join against a UNIQUE-KEY lookup table (dimension
    join): left rows keep every left column plus the right `payload`
    columns; rows with no match drop.  Below `broadcast_limit` rows
    the right table ships once via `ray.put` and the join is ONE
    vectorized map pass over the left side (searchsorted on the sorted
    key array) — the scale shape for star-schema dimensions, where a
    hash-join exchange pays seconds of fixed actor cost.  Above the
    gate it falls back to Dataset.join.  Duplicate right keys raise
    (a lookup table with repeated keys would silently multiply rows
    in the broadcast path but not the hash path).  `payload_types`
    optionally pins {column: pa.DataType} for the zero-row right-side
    fallback so empty join outputs keep real payload types instead of
    pa.null() when Ray reports no schema."""
    import ray

    from chearch_ray.stages.partition import (datasets_size_bytes,
                                              join_parallelism,
                                              join_remote_args)

    right_on = right_on or on
    if payload is None:
        payload = [c for c in right_ds.schema().names if c != right_on]
    right = right_ds.materialize()
    if right.count() <= broadcast_limit:
        parts = [t for t in right.iter_batches(batch_size=None, batch_format="pyarrow")
                 if len(t)]
        if parts:
            tbl = pa.concat_tables(parts).combine_chunks()
        else:
            # zero-row right side: Ray may report no schema at all for
            # a materialized empty map output.  The join result is
            # empty either way, but downstream consumers (typed
            # concats, schema assertions) still see the payload column
            # TYPES — prefer, in order: the caller's `payload_types`
            # hint, Ray's declared base schema, null-typed last resort
            sch = right.schema()
            base = getattr(sch, "base_schema", None) if sch is not None else None
            cols_needed = [right_on] + [c for c in payload if c != right_on]
            if isinstance(base, pa.Schema):
                tbl = base.empty_table()
            else:
                hints = payload_types or {}
                tbl = pa.table({c: pa.array([], type=hints.get(c, pa.null()))
                                for c in cols_needed})
            if payload_types:  # hint wins even over a declared schema
                tbl = pa.table({
                    c: (pa.array([], type=payload_types[c])
                        if c in payload_types else tbl[c])
                    for c in tbl.column_names})
        keys = tbl[right_on].to_numpy().astype(np.int64) if len(tbl) else np.empty(0, np.int64)
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        if len(keys) > 1 and bool(np.any(keys[1:] == keys[:-1])):
            raise ValueError(f"broadcast_lookup_join: duplicate keys in {right_on}")
        cols = {c: (tbl[c].combine_chunks() if isinstance(tbl[c], pa.ChunkedArray)
                    else tbl[c]).take(pa.array(order, type=pa.int64()))
                for c in payload} if len(tbl) else {c: tbl[c] for c in payload}
        ref = ray.put((keys, cols))
        return left_ds.map_batches(
            partial(_lookup_attach, key=on, payload=payload, ref=ref),
            batch_format="pyarrow",
        )
    jp = join_parallelism(n_partitions,
                          size_bytes=datasets_size_bytes(left_ds, right_ds))
    left_cols = list(left_ds.schema().names)
    return left_ds.join(
        right, "inner", jp, on=(on,), right_on=(right_on,),
        aggregator_ray_remote_args=join_remote_args(),
    ).select_columns(left_cols + payload)  # same contract as broadcast path


def set_op_keys(left_ds, right_ds, on: str, op: str = "intersect",
                right_on: str | None = None,
                driver_merge_limit: int | None = None) -> pa.Table:
    """SQL INTERSECT / EXCEPT over key columns: the DISTINCT keys of
    `left_ds[on]` that are (intersect) / are not (except) present in
    `right_ds[right_on]`, ascending.

    Scale shape: membership rides the gated semi/anti join (broadcast
    probe set below the key gate, coarse hash-partition exchange
    above); the surviving keys dedup map-side (per-block distinct)
    before ONE gated merge bounded by the distinct-result size."""
    from chearch_ray.pipelines.analytics import _gated_group_sum

    if op not in ("intersect", "except"):
        raise ValueError(f"unknown set op {op!r}")
    member = hash_semi_join(left_ds, right_ds, on=on,
                            right_on=right_on or on,
                            payload=[on], anti=(op == "except"))

    def distinct_partial(b: pa.Table) -> pa.Table:
        k = np.unique(b[on].to_numpy().astype(np.int64))
        return pa.table({on: pa.array(k, type=pa.int64()),
                         "n": pa.array(np.ones(len(k), dtype=np.int64))})

    out = _gated_group_sum(member.map_batches(distinct_partial,
                                              batch_format="pyarrow"),
                           [on], ["n"], driver_merge_limit=driver_merge_limit)
    if out is None or not len(out):
        return pa.table({on: pa.array([], type=pa.int64())})
    keys = np.sort(out[on].to_numpy().astype(np.int64))
    return pa.table({on: pa.array(keys, type=pa.int64())})
