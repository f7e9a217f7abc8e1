"""Event-stream operators: tumbling-window aggregation, gap-based
sessionization, regex token counting.

The reference engine has no time/stream dimension at all; these are
the windowed-aggregate / stateful-session operators a training-data
pipeline needs over event logs (driver `events` table shape:
event_id, ts, user_id, event_type, value, props).

Scale shape:
* windowed_aggregate — map-side PARTIAL aggregation per batch (one row
  per (window, key) per batch), then a small global groupby over the
  partials: the shuffle carries window-count rows, not event rows.
* sessionize / asof_join — one groupby on hash(user_id) % N COARSE
  partitions (the only all-to-all), then vectorized multi-user run
  detection inside each partition: a per-user map_groups would pay one
  Python/framework call per user (millions of tiny groups at scale —
  the overhead stages/dedup._bucket_runs exists to avoid), whereas N
  partition tasks each process all their users in a handful of numpy
  passes.  Sessions and as-of lookups never span users, so user hash
  partitioning is the natural key; at 100 TB the same key should be
  reused by upstream storage layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from chearch_ray.stages.partition import add_pgrp_column as _user_partition_column
from chearch_ray.stages.partition import drop_pgrp_then as _drop_pgrp_then

#: default tumbling window (seconds)
WINDOW_SEC = 300
#: default session gap (seconds)
SESSION_GAP_SEC = 1800


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """round-half-AWAY-from-zero (DuckDB round() semantics).  np.rint
    rounds half-to-even; floor(abs+0.5) double-rounds values whose
    float64 sum with 0.5 lands on the next integer (e.g.
    0.49999999999999994) — so compare the fraction exactly instead of
    adding."""
    a = np.abs(x)
    f = np.floor(a)
    y = np.where(a - f >= 0.5, f + 1.0, f)
    return (np.sign(x) * y).astype(np.int64)


def _epoch_us(ts_col) -> np.ndarray:
    if isinstance(ts_col, pa.ChunkedArray):
        ts_col = ts_col.combine_chunks()
    return np.asarray(ts_col.cast(pa.int64()))


def _window_partial(batch: pa.Table, window_sec: int, key: str) -> pa.Table:
    """one batch -> one row per (window_start, key): the map-side
    combiner that keeps the shuffle at window-count rows."""
    us = _epoch_us(batch["ts"])
    window_start = (us // (window_sec * 1_000_000)) * window_sec  # epoch seconds
    # value sums ride as integer CENTS: float addition order differs
    # between engines (map-side partials here, arbitrary group order in
    # a SQL oracle), so exact-match aggregation needs integers
    cents = _round_half_away(np.asarray(batch["value"].to_numpy(), dtype=np.float64) * 100)
    t = pa.table(
        {
            "window_start": pa.array(window_start, type=pa.int64()),
            key: batch[key],
            "n_events": pa.array(np.ones(len(batch), dtype=np.int64)),
            "sum_cents": pa.array(cents, type=pa.int64()),
        }
    )
    agg = t.group_by(["window_start", key], use_threads=False).aggregate(
        [("n_events", "sum"), ("sum_cents", "sum")]
    )
    return pa.table(
        {
            "window_start": agg["window_start"],
            key: agg[key],
            "n_events": agg["n_events_sum"],
            "sum_cents": agg["sum_cents_sum"],
        }
    )


def windowed_aggregate(ds, window_sec: int = WINDOW_SEC, key: str = "event_type"):
    """Tumbling-window aggregate: (window_start epoch-sec, key) ->
    n_events, sum_value.  Pre-aggregated per batch before the global
    groupby (the shuffle ships partials, not events)."""
    from functools import partial

    from ray.data.aggregate import Sum

    partials = ds.map_batches(
        partial(_window_partial, window_sec=window_sec, key=key),
        batch_format="pyarrow",
    )
    return partials.groupby(["window_start", key]).aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_cents", alias_name="sum_cents")
    )


#: coarse partition count for the user-keyed event operators — ~2x
#: cores single-node; size ~2-4x total cores on a real cluster
USER_PARTITIONS = 64

_SESSION_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_id", pa.int64()),
        ("session_start_us", pa.int64()),
        ("session_end_us", pa.int64()),
        ("n_events", pa.int64()),
        ("sum_cents", pa.int64()),
    ]
)


def _run_starts(users: np.ndarray) -> np.ndarray:
    """boolean mask: True where a new user's run begins (input sorted
    by user)."""
    new_user = np.empty(len(users), dtype=bool)
    new_user[0] = True
    new_user[1:] = users[1:] != users[:-1]
    return new_user


def _sessionize_partition(group: pa.Table, gap_sec: int) -> pa.Table:
    """one coarse partition (many users) -> session summary rows.
    Fully vectorized: one sort by (user_id, ts, event_id), then numpy
    run detection over all users at once."""
    if len(group) == 0:
        return _SESSION_SCHEMA.empty_table()
    order = pc.sort_indices(
        group,
        sort_keys=[("user_id", "ascending"), ("ts", "ascending"), ("event_id", "ascending")],
    )
    g = group.take(order)
    us = _epoch_us(g["ts"])
    users = g["user_id"].to_numpy()
    n = len(g)
    new_user = _run_starts(users)
    gap = np.empty(n, dtype=bool)
    gap[0] = True
    gap[1:] = new_user[1:] | ((us[1:] - us[:-1]) > gap_sec * 1_000_000)
    starts = np.flatnonzero(gap)
    bounds = np.append(starts, n)
    n_events = np.diff(bounds)
    cents = _round_half_away(g["value"].to_numpy().astype(np.float64) * 100)
    sums = np.add.reduceat(cents, starts)
    # 1-based session ordinal per user: start index minus the index of
    # that user's first session start
    user_of_start = users[starts]
    new_u_at_start = _run_starts(user_of_start)
    idx = np.arange(len(starts), dtype=np.int64)
    first_of_user = np.maximum.accumulate(np.where(new_u_at_start, idx, 0))
    session_id = idx - first_of_user + 1
    return pa.table(
        {
            "user_id": pa.array(user_of_start.astype(np.int64), type=pa.int64()),
            "session_id": pa.array(session_id, type=pa.int64()),
            "session_start_us": pa.array(us[starts], type=pa.int64()),
            "session_end_us": pa.array(us[bounds[1:] - 1], type=pa.int64()),
            "n_events": pa.array(n_events, type=pa.int64()),
            "sum_cents": pa.array(sums, type=pa.int64()),
        }
    )


def sessionize(ds, gap_sec: int = SESSION_GAP_SEC,
               coarse_partitions: int = USER_PARTITIONS):
    """Gap-based sessionization: one session row per (user, session).
    The hash(user_id)%N coarse groupby is the only shuffle; within a
    partition every user is processed by the same vectorized pass
    (never one Python call per user)."""
    from functools import partial

    parted = ds.map_batches(
        partial(_user_partition_column, n_partitions=coarse_partitions, key="user_id"),
        batch_format="pyarrow",
    )
    return parted.groupby("pgrp").map_groups(
        partial(_drop_pgrp_then, fn=partial(_sessionize_partition, gap_sec=gap_sec)),
        batch_format="pyarrow",
    )


#: RE2-safe GPT-2-ish token pattern (no lookaheads: both Arrow and
#: DuckDB run RE2, so counts match exactly between engine and oracle)
BPEISH_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def bpeish_token_count(batch: pa.Table, text_column: str = "text",
                       pattern: str = BPEISH_PATTERN) -> pa.Table:
    """doc_id/text -> (doc_id, n_bpeish): count of BPE-style pretoken
    pieces via one vectorized RE2 scan (pc.count_substring_regex)."""
    text = batch[text_column]
    n = pc.count_substring_regex(text, pattern)
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_bpeish": n.cast(pa.int64())
            if isinstance(n, pa.Array)
            else n.combine_chunks().cast(pa.int64()),
        }
    )


_ASOF_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts_us", pa.int64()),
        ("value", pa.float64()),
        ("asof_value", pa.float64()),
    ]
)


def _asof_partition(group: pa.Table, key: str, ts_column: str, type_column: str,
                    left_type: str, right_type: str, value_column: str) -> pa.Table:
    """one coarse partition (many keys) -> as-of rows for the left
    type.  Fully vectorized over all keys at once: after one sort by
    (key, ts, event_id), the latest STRICTLY-earlier right row for a
    left row at position i is the last right row before the first row
    of i's (key, ts) run — equal-ts right rows are excluded by the run
    boundary and ties on earlier ts resolve to the larger event_id by
    sort order."""
    if len(group) == 0:
        return _ASOF_SCHEMA.empty_table()
    order = pc.sort_indices(
        group,
        sort_keys=[(key, "ascending"), (ts_column, "ascending"), ("event_id", "ascending")],
    )
    g = group.take(order)
    us = _epoch_us(g[ts_column])
    users = g[key].to_numpy()
    tcol = g[type_column]
    if isinstance(tcol, pa.ChunkedArray):
        tcol = tcol.combine_chunks()
    is_l = np.asarray(pc.equal(tcol, left_type).fill_null(False))
    is_r = np.asarray(pc.equal(tcol, right_type).fill_null(False))
    l_idx = np.flatnonzero(is_l)
    if len(l_idx) == 0:
        return _ASOF_SCHEMA.empty_table()
    n = len(g)
    idx = np.arange(n, dtype=np.int64)
    new_user = _run_starts(users)
    ts_change = np.empty(n, dtype=bool)
    ts_change[0] = True
    ts_change[1:] = new_user[1:] | (us[1:] != us[:-1])
    first_same = np.maximum.accumulate(np.where(ts_change, idx, 0))
    user_start = np.maximum.accumulate(np.where(new_user, idx, 0))
    # cumr[i] = number of right rows at positions < i (exclusive prefix)
    cumr = np.concatenate([[0], np.cumsum(is_r, dtype=np.int64)])
    r_pos = np.flatnonzero(is_r)
    fs = first_same[l_idx]
    has = cumr[fs] > cumr[user_start[l_idx]]
    vals = g[value_column].to_numpy()
    ridx = r_pos[np.maximum(cumr[fs] - 1, 0)] if len(r_pos) else np.zeros(len(l_idx), dtype=np.int64)
    asof = np.where(has, vals[ridx], 0.0)
    take = pa.array(l_idx, type=pa.int64())
    return pa.table(
        {
            "event_id": g["event_id"].take(take),
            "user_id": g[key].take(take),
            "ts_us": pa.array(us[l_idx], type=pa.int64()),
            "value": g[value_column].take(take),
            "asof_value": pa.array(asof, type=pa.float64(), mask=~has),
        }
    )


def asof_join(ds, key: str = "user_id", ts_column: str = "ts",
              type_column: str = "event_type", left_type: str = "purchase",
              right_type: str = "view", value_column: str = "value",
              coarse_partitions: int = USER_PARTITIONS):
    """Per-key AS-OF join within one event stream: each `left_type`
    row gets the `value` of the latest `right_type` row with STRICTLY
    earlier ts (right-side ties broken by larger event_id — fully
    deterministic, mirrored by the driver oracle SQL).

    Ray Data has no asof-join primitive; this is the prescribed
    composition — one hash(key)%N coarse groupby shuffle, then one
    vectorized pass over each partition covering all its keys (never
    one Python call per key).  Partitioning assumption: the join never
    crosses `key` boundaries, so key-hash partitioning is sufficient
    and reusable by adjacent stages."""
    from functools import partial

    parted = ds.map_batches(
        partial(_user_partition_column, n_partitions=coarse_partitions, key=key),
        batch_format="pyarrow",
    )
    return parted.groupby("pgrp").map_groups(
        partial(
            _drop_pgrp_then,
            fn=partial(
                _asof_partition,
                key=key,
                ts_column=ts_column,
                type_column=type_column,
                left_type=left_type,
                right_type=right_type,
                value_column=value_column,
            ),
        ),
        batch_format="pyarrow",
    )


_WINDOW_FN_SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("ts_us", pa.int64()),
        ("rn", pa.int64()),
        ("run_sum_cents", pa.int64()),
        ("prev_gap_us", pa.int64()),
    ]
)


def _running_partition(group: pa.Table, key: str, ts_column: str,
                       id_column: str, value_column: str) -> pa.Table:
    """one coarse partition (many keys) -> per-row ordered window
    values, all keys in one vectorized pass: sort by (key, ts, id),
    then segmented cumsum / ordinal / lag with run-start resets."""
    if len(group) == 0:
        return _WINDOW_FN_SCHEMA.empty_table()
    order = pc.sort_indices(
        group,
        sort_keys=[(key, "ascending"), (ts_column, "ascending"),
                   (id_column, "ascending")],
    )
    g = group.take(order)
    us = _epoch_us(g[ts_column])
    keys = g[key].to_numpy()
    n = len(g)
    new_key = _run_starts(keys)
    starts = np.flatnonzero(new_key)
    counts = np.diff(np.append(starts, n))
    cents = _round_half_away(g[value_column].to_numpy().astype(np.float64) * 100)
    # segmented cumulative sum: global cumsum minus each run's base
    cum = np.cumsum(cents)
    base = np.repeat(cum[starts] - cents[starts], counts)
    run_sum = cum - base
    # 1-based ordinal within the key's run
    rn = np.arange(n, dtype=np.int64) - np.repeat(starts, counts) + 1
    # gap to the previous event of the SAME key; -1 on run starts
    # (mirrors coalesce(ts - lag(ts) over w, -1))
    gap = np.empty(n, dtype=np.int64)
    gap[0] = -1
    gap[1:] = us[1:] - us[:-1]
    gap[new_key] = -1
    return pa.table(
        {
            "event_id": pa.array(g[id_column].to_numpy(), type=pa.int64()),
            "user_id": pa.array(keys.astype(np.int64), type=pa.int64()),
            "ts_us": pa.array(us, type=pa.int64()),
            "rn": pa.array(rn, type=pa.int64()),
            "run_sum_cents": pa.array(run_sum, type=pa.int64()),
            "prev_gap_us": pa.array(gap, type=pa.int64()),
        }
    )


def running_windows(ds, key: str = "user_id", ts_column: str = "ts",
                    id_column: str = "event_id", value_column: str = "value",
                    coarse_partitions: int = USER_PARTITIONS):
    """Ordered per-key window functions over an event stream — the SQL
    `OVER (PARTITION BY key ORDER BY ts, id)` family as one distributed
    pass: per input row, emit its 1-based ordinal (`rn`,
    row_number()), running value sum in integer cents
    (`run_sum_cents`, SUM ... ROWS UNBOUNDED PRECEDING), and
    microsecond gap to the key's previous event (`prev_gap_us`,
    ts - lag(ts), -1 on each key's first row).

    Ray Data has no ordered-window primitive; the prescribed
    composition is the same shape as sessionize/asof: ONE
    hash(key)%N coarse groupby shuffle, then one vectorized
    sort + segmented-scan pass per partition covering all its keys.
    Window state never crosses key boundaries, so key-hash
    partitioning is sufficient; output row count equals input row
    count (this is a per-row annotation, not an aggregate)."""
    from functools import partial

    parted = ds.map_batches(
        partial(_user_partition_column, n_partitions=coarse_partitions, key=key),
        batch_format="pyarrow",
    )
    return parted.groupby("pgrp").map_groups(
        partial(
            _drop_pgrp_then,
            fn=partial(
                _running_partition,
                key=key,
                ts_column=ts_column,
                id_column=id_column,
                value_column=value_column,
            ),
        ),
        batch_format="pyarrow",
    )


def _hopping_partial(batch: pa.Table, window_sec: int, hop_sec: int,
                     key: str) -> pa.Table:
    """one batch -> one row per (window_start, key) across every
    hopping window each event falls in.  An event at t belongs to the
    windows starting at hop-aligned s with s <= t < s + window —
    exactly window/hop of them; replication happens MAP-SIDE via one
    np.repeat (never a shuffle of duplicated events: the combiner
    still reduces to window-count rows before the exchange)."""
    us = _epoch_us(batch["ts"])
    w_us = window_sec * 1_000_000
    h_us = hop_sec * 1_000_000
    n_hops = -(-window_sec // hop_sec)  # windows covering each event
    # last hop-aligned start <= t, then walk back n_hops-1 hops
    last = (us // h_us) * h_us
    starts = last[:, None] - np.arange(n_hops, dtype=np.int64)[None, :] * h_us
    valid = (starts > us[:, None] - w_us) & (starts >= 0)
    cents = _round_half_away(
        np.asarray(batch["value"].to_numpy(), dtype=np.float64) * 100)
    rows = np.repeat(np.arange(len(batch), dtype=np.int64), n_hops)[valid.ravel()]
    ws = starts.ravel()[valid.ravel()] // 1_000_000  # epoch seconds
    kcol = batch[key]
    if isinstance(kcol, pa.ChunkedArray):
        kcol = kcol.combine_chunks()
    t = pa.table(
        {
            "window_start": pa.array(ws, type=pa.int64()),
            key: kcol.take(pa.array(rows, type=pa.int64())),
            "n_events": pa.array(np.ones(len(rows), dtype=np.int64)),
            "sum_cents": pa.array(cents[rows], type=pa.int64()),
        }
    )
    agg = t.group_by(["window_start", key], use_threads=False).aggregate(
        [("n_events", "sum"), ("sum_cents", "sum")]
    )
    return agg.rename_columns(["window_start", key, "n_events", "sum_cents"])


def hopping_window_aggregate(ds, window_sec: int = WINDOW_SEC,
                             hop_sec: int | None = None,
                             key: str = "event_type"):
    """Hopping (sliding) window aggregate: every `hop_sec` a new
    window of length `window_sec` opens, and each event counts in all
    windows covering it — the streaming-analytics generalization of
    `windowed_aggregate` (hop == window degenerates to tumbling).
    Replication is bounded map-side (window/hop partial rows per
    (batch, window, key)); the shuffle still carries combiner output
    only."""
    from functools import partial

    from ray.data.aggregate import Sum

    hop_sec = hop_sec or window_sec
    if window_sec % hop_sec:
        raise ValueError("window_sec must be a multiple of hop_sec "
                         "(hop-aligned window starts)")
    partials = ds.map_batches(
        partial(_hopping_partial, window_sec=window_sec, hop_sec=hop_sec, key=key),
        batch_format="pyarrow",
    )
    return partials.groupby(["window_start", key]).aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_cents", alias_name="sum_cents")
    )


_FUNNEL_INF = np.int64(np.iinfo(np.int64).max)


def _funnel_partition(group: pa.Table, steps: list[str], key: str,
                      ts_column: str, type_column: str) -> pa.Table:
    """one coarse partition -> per-step completer counts for ITS
    users, every step vectorized across all users at once: per user,
    step k's time is min ts of a step-k event STRICTLY after the
    user's step-(k-1) time (np.minimum.at over user codes)."""
    if len(group) == 0:
        return pa.table({"step_index": pa.array([], type=pa.int64()),
                         "step": pa.array([], type=pa.string()),
                         "n_users": pa.array([], type=pa.int64())})
    us = _epoch_us(group[ts_column])
    users = group[key].to_numpy()
    _, codes = np.unique(users, return_inverse=True)
    n_users = codes.max() + 1 if len(codes) else 0
    types = group[type_column]
    if isinstance(types, pa.ChunkedArray):
        types = types.combine_chunks()
    type_np = np.asarray(types.to_numpy(zero_copy_only=False))
    thr = np.full(n_users, -1, dtype=np.int64)  # step -1: before all time
    counts = []
    for s in steps:
        ok = (type_np == s) & (us > thr[codes]) & (thr[codes] < _FUNNEL_INF)
        t_next = np.full(n_users, _FUNNEL_INF, dtype=np.int64)
        np.minimum.at(t_next, codes[ok], us[ok])
        thr = t_next
        counts.append(int((t_next < _FUNNEL_INF).sum()))
    return pa.table({
        "step_index": pa.array(np.arange(len(steps), dtype=np.int64)),
        "step": pa.array(list(steps), type=pa.string()),
        "n_users": pa.array(counts, type=pa.int64()),
    })


def funnel(ds, steps: list[str], key: str = "user_id", ts_column: str = "ts",
           type_column: str = "event_type",
           coarse_partitions: int = USER_PARTITIONS):
    """Ordered funnel analysis: how many users complete step 0, then a
    step-1 event strictly after it, then step 2 after that, ... —
    per-step completer counts (step_index, step, n_users).

    Same distribution contract as sessionize/running_windows: ONE
    hash(key)%N shuffle (funnel state never crosses users), then each
    partition resolves ALL its users per step with one boolean mask +
    one np.minimum.at scatter — no per-user Python.  Partition counts
    sum exactly because user sets are disjoint."""
    from functools import partial

    from ray.data.aggregate import Sum

    if not steps:
        raise ValueError("funnel needs at least one step")
    parted = ds.map_batches(
        partial(_user_partition_column, n_partitions=coarse_partitions, key=key),
        batch_format="pyarrow",
    )
    partials = parted.groupby("pgrp").map_groups(
        partial(
            _drop_pgrp_then,
            fn=partial(_funnel_partition, steps=list(steps), key=key,
                       ts_column=ts_column, type_column=type_column),
        ),
        batch_format="pyarrow",
    )
    return partials.groupby(["step_index", "step"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )


def _retention_partition(group: pa.Table, period_sec: int, key: str,
                         ts_column: str) -> pa.Table:
    """one coarse partition -> (cohort_period, k, n_active) partials
    for ITS users: per-user first period via one np.minimum.at, then
    distinct (user, offset) pairs via one np.unique over packed keys."""
    if len(group) == 0:
        return pa.table({"cohort": pa.array([], type=pa.int64()),
                         "k": pa.array([], type=pa.int64()),
                         "n_active": pa.array([], type=pa.int64())})
    per = _epoch_us(group[ts_column]) // (period_sec * 1_000_000)
    users = group[key].to_numpy()
    _, codes = np.unique(users, return_inverse=True)
    n_users = codes.max() + 1
    cohort = np.full(n_users, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(cohort, codes, per)
    k = per - cohort[codes]
    # distinct (user, k): pack into one int64 (k < 2^20 periods is
    # ample for any real window span)
    packed = codes.astype(np.int64) * (1 << 20) + k
    uniq = np.unique(packed)
    ucodes = uniq >> 20
    uk = uniq & ((1 << 20) - 1)
    t = pa.table({
        "cohort": pa.array(cohort[ucodes], type=pa.int64()),
        "k": pa.array(uk, type=pa.int64()),
        "n_active": pa.array(np.ones(len(uniq), dtype=np.int64)),
    })
    agg = t.group_by(["cohort", "k"], use_threads=False).aggregate([("n_active", "sum")])
    return agg.rename_columns(["cohort", "k", "n_active"])


def retention(ds, period_sec: int = 86_400, key: str = "user_id",
              ts_column: str = "ts",
              coarse_partitions: int = USER_PARTITIONS):
    """Cohort retention: bucket time into `period_sec` periods, assign
    each user to the cohort of their FIRST event's period, and count
    how many of each cohort are active again k periods later ->
    (cohort, k, n_active); k = 0 rows are cohort sizes.

    One user-hash shuffle (cohort membership never crosses users),
    vectorized per partition, partials summed by a tiny
    (cohort, k) groupby."""
    from functools import partial

    from ray.data.aggregate import Sum

    parted = ds.map_batches(
        partial(_user_partition_column, n_partitions=coarse_partitions, key=key),
        batch_format="pyarrow",
    )
    partials = parted.groupby("pgrp").map_groups(
        partial(
            _drop_pgrp_then,
            fn=partial(_retention_partition, period_sec=period_sec, key=key,
                       ts_column=ts_column),
        ),
        batch_format="pyarrow",
    )
    return partials.groupby(["cohort", "k"]).aggregate(
        Sum("n_active", alias_name="n_active")
    )


# ------------------------------------------------------- interval join
def _interval_partition(group: pa.Table, window_us: int) -> pa.Table:
    """one coarse user partition of tagged (side 0=left / 1=right)
    events -> all (left, right) pairs of the SAME user with
    0 <= ts_right - ts_left <= window_us.  Vectorized: one sort, per
    user-run searchsorted window bounds over the right side, one
    np.repeat/arange expansion — no Python loop over events."""
    if len(group) == 0:
        return pa.table(
            {
                "a_id": pa.array([], type=pa.int64()),
                "b_id": pa.array([], type=pa.int64()),
                "gap_us": pa.array([], type=pa.int64()),
            }
        )
    order = pc.sort_indices(
        group,
        sort_keys=[("user_id", "ascending"), ("side", "ascending"),
                   ("ts_us", "ascending"), ("event_id", "ascending")],
    )
    g = group.take(order)
    users = g["user_id"].to_numpy()
    side = g["side"].to_numpy()
    ts = g["ts_us"].to_numpy()
    eid = g["event_id"].to_numpy()
    new_user = _run_starts(users)
    u_starts = np.flatnonzero(new_user)
    u_bounds = np.append(u_starts, len(g))
    out_a, out_b, out_gap = [], [], []
    for i in range(len(u_starts)):  # per-user loop: bounded by the
        s, e = int(u_bounds[i]), int(u_bounds[i + 1])  # partition's users
        sd = side[s:e]
        nl = int(np.searchsorted(sd, 1))
        if nl == 0 or nl == e - s:
            continue
        lt, lid = ts[s:s + nl], eid[s:s + nl]
        rt, rid = ts[s + nl:e], eid[s + nl:e]
        lo = np.searchsorted(rt, lt, side="left")
        hi = np.searchsorted(rt, lt + window_us, side="right")
        counts = hi - lo
        m = counts > 0
        if not m.any():
            continue
        la = np.repeat(np.arange(nl)[m], counts[m])
        rb = (np.repeat(lo[m], counts[m])
              + (np.arange(int(counts[m].sum()))
                 - np.repeat(np.cumsum(counts[m]) - counts[m], counts[m])))
        out_a.append(lid[la])
        out_b.append(rid[rb])
        out_gap.append(rt[rb] - lt[la])
    if not out_a:
        return pa.table(
            {
                "a_id": pa.array([], type=pa.int64()),
                "b_id": pa.array([], type=pa.int64()),
                "gap_us": pa.array([], type=pa.int64()),
            }
        )
    return pa.table(
        {
            "a_id": pa.array(np.concatenate(out_a), type=pa.int64()),
            "b_id": pa.array(np.concatenate(out_b), type=pa.int64()),
            "gap_us": pa.array(np.concatenate(out_gap), type=pa.int64()),
        }
    )


def interval_join(ds, left_type: str, right_type: str, window_sec: int,
                  coarse_partitions: int = USER_PARTITIONS):
    """Stream-stream interval join: every (left, right) event pair of
    the same user with right in [left.ts, left.ts + window] ->
    (a_id, b_id, gap_us).  The WITHIN-WINDOW companion of asof_join
    (which keeps only the nearest preceding match): funnels want the
    first match, attribution wants ALL matches inside the window.

    Same shape as sessionize/asof: both sides filter map-side (only
    the two event types survive the read), ONE hash(user)%N coarse
    exchange co-locates each user's rows, and each partition runs one
    vectorized sort + per-user searchsorted window expansion.  Output
    size is data-dependent (a hot user with k left x m right in-window
    events emits k*m pairs) — the join's semantics, not a shuffle
    artifact; aggregate inside the partition when only counts are
    needed."""
    from functools import partial

    window_us = int(window_sec) * 1_000_000

    def tag(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        isl = pc.equal(et, left_type)
        isr = pc.equal(et, right_type)
        keep = pc.or_(isl, isr)
        b = batch.filter(keep)
        sd = np.where(
            np.asarray(pc.equal(b["event_type"], left_type)), 0, 1
        ).astype(np.int8)
        return pa.table(
            {
                "user_id": b["user_id"].cast(pa.int64()),
                "event_id": b["event_id"].cast(pa.int64()),
                "ts_us": pa.array(_epoch_us(b["ts"]), type=pa.int64()),
                "side": pa.array(sd, type=pa.int8()),
            }
        )

    parted = ds.map_batches(tag, batch_format="pyarrow").map_batches(
        partial(_user_partition_column, n_partitions=coarse_partitions,
                key="user_id"),
        batch_format="pyarrow",
    )
    return parted.groupby("pgrp").map_groups(
        partial(_drop_pgrp_then,
                fn=partial(_interval_partition, window_us=window_us)),
        batch_format="pyarrow",
    )


# ------------------------------------------------------------ LAG gaps
_LAG_SCHEMA = pa.schema([
    pa.field("event_id", pa.int64()),
    pa.field("user_id", pa.int64()),
    pa.field("gap_us", pa.int64()),
])


def _lag_partition(group: pa.Table) -> pa.Table:
    """one coarse partition -> per-event LAG gap rows: for every event
    with a same-user predecessor (ordered by ts, event_id), the
    microseconds since that predecessor.  First events per user drop
    (SQL LAG yields NULL there).  One sort + one vectorized diff for
    ALL users in the partition."""
    if len(group) == 0:
        return _LAG_SCHEMA.empty_table()
    order = pc.sort_indices(
        group,
        sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                   ("event_id", "ascending")],
    )
    g = group.take(order)
    us = _epoch_us(g["ts"])
    users = g["user_id"].to_numpy()
    new_user = _run_starts(users)
    keep = ~new_user
    gaps = np.empty(len(g), dtype=np.int64)
    gaps[0] = 0
    gaps[1:] = us[1:] - us[:-1]
    return pa.table(
        {
            "event_id": pa.array(
                g["event_id"].to_numpy().astype(np.int64)[keep], type=pa.int64()),
            "user_id": pa.array(users.astype(np.int64)[keep], type=pa.int64()),
            "gap_us": pa.array(gaps[keep], type=pa.int64()),
        }
    )


def event_lag_gaps(ds, coarse_partitions: int = USER_PARTITIONS):
    """SQL LAG() OVER (PARTITION BY user ORDER BY ts, event_id): time
    since each user's previous event.  Same coarse hash(user)%N
    single-shuffle shape as sessionize — one vectorized segmented scan
    per partition, never per-user Python."""
    from functools import partial

    parted = ds.map_batches(
        partial(_user_partition_column, n_partitions=coarse_partitions,
                key="user_id"),
        batch_format="pyarrow",
    )
    return parted.groupby("pgrp").map_groups(
        partial(_drop_pgrp_then, fn=_lag_partition),
        batch_format="pyarrow",
    )


# --------------------------------------------------- latest per group
def _latest_partial(batch: pa.Table) -> pa.Table:
    """per-block latest event per user: sort (user, ts desc, event_id
    desc), keep each user's first row — <= |users in block| rows out."""
    if len(batch) == 0:
        return batch
    order = pc.sort_indices(
        batch,
        sort_keys=[("user_id", "ascending"), ("ts", "descending"),
                   ("event_id", "descending")],
    )
    g = batch.take(order)
    users = g["user_id"].to_numpy()
    return g.filter(pa.array(_run_starts(users)))


def latest_event_per_user(ds, coarse_partitions: int = USER_PARTITIONS):
    """The "latest record" dedup (SQL row_number() OVER (PARTITION BY
    user ORDER BY ts DESC, event_id DESC) = 1): each user's most
    recent event row.

    Scale shape: each block first reduces to its own per-user latest
    (bounded by users-per-block), then ONE coarse hash(user) exchange
    and the same vectorized keep-first pass per partition — the
    shuffle carries per-(block, user) winner rows, never raw events."""
    from functools import partial

    partials = ds.map_batches(_latest_partial, batch_format="pyarrow")
    parted = partials.map_batches(
        partial(_user_partition_column, n_partitions=coarse_partitions,
                key="user_id"),
        batch_format="pyarrow",
    )
    return parted.groupby("pgrp").map_groups(
        partial(_drop_pgrp_then, fn=_latest_partial),
        batch_format="pyarrow",
    )


# --------------------------------------------------- moving window
_MOVING_SCHEMA = pa.schema([
    pa.field("event_id", pa.int64()),
    pa.field("user_id", pa.int64()),
    pa.field("w_sum_cents", pa.int64()),
    pa.field("w_count", pa.int64()),
])


def _moving_partition(group: pa.Table, window_rows: int) -> pa.Table:
    """one coarse partition -> per-event moving-frame rows: the SQL
    `ROWS BETWEEN window_rows-1 PRECEDING AND CURRENT ROW` sum/count
    per user (ordered by ts, event_id).  One sort, one cumsum, and
    per-user frame clamping via a segment-start maximum-accumulate —
    never per-user Python."""
    if len(group) == 0:
        return _MOVING_SCHEMA.empty_table()
    order = pc.sort_indices(
        group,
        sort_keys=[("user_id", "ascending"), ("ts", "ascending"),
                   ("event_id", "ascending")],
    )
    g = group.take(order)
    users = g["user_id"].to_numpy()
    cents = _round_half_away(g["value"].to_numpy().astype(np.float64) * 100)
    n = len(g)
    i = np.arange(n, dtype=np.int64)
    seg_start = np.maximum.accumulate(np.where(_run_starts(users), i, 0))
    lo = np.maximum(seg_start, i - (window_rows - 1))
    cum = np.concatenate([[0], np.cumsum(cents)])
    return pa.table(
        {
            "event_id": pa.array(g["event_id"].to_numpy().astype(np.int64),
                                 type=pa.int64()),
            "user_id": pa.array(users.astype(np.int64), type=pa.int64()),
            "w_sum_cents": pa.array(cum[i + 1] - cum[lo], type=pa.int64()),
            "w_count": pa.array(i - lo + 1, type=pa.int64()),
        }
    )


def event_moving_sum(ds, window_rows: int = 4,
                     coarse_partitions: int = USER_PARTITIONS):
    """SQL windowed-frame aggregate SUM/COUNT OVER (PARTITION BY user
    ORDER BY ts, event_id ROWS BETWEEN window_rows-1 PRECEDING AND
    CURRENT ROW), in integer cents (exact).  Same coarse hash(user)%N
    single-shuffle shape as sessionize/lag."""
    from functools import partial

    parted = ds.map_batches(
        partial(_user_partition_column, n_partitions=coarse_partitions,
                key="user_id"),
        batch_format="pyarrow",
    )
    return parted.groupby("pgrp").map_groups(
        partial(_drop_pgrp_then,
                fn=partial(_moving_partition, window_rows=window_rows)),
        batch_format="pyarrow",
    )
