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
* sessionize — one groupby on user_id (the only all-to-all), then
  vectorized per-user gap detection inside map_groups.  Sessions never
  span users, so user hash partitioning is the natural key; at 100 TB
  the same key should be reused by upstream storage layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


def _sessionize_group(group: pa.Table, gap_sec: int) -> pa.Table:
    """one user's events -> session summary rows (vectorized gap
    detection; deterministic order by (ts, event_id))."""
    order = pc.sort_indices(
        group, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
    )
    g = group.take(order)
    us = _epoch_us(g["ts"])
    gap = np.empty(len(g), dtype=bool)
    gap[0] = True
    gap[1:] = (us[1:] - us[:-1]) > gap_sec * 1_000_000
    session_id = np.cumsum(gap)  # 1-based per user
    starts = np.flatnonzero(gap)
    bounds = np.append(starts, len(g))
    n_events = np.diff(bounds)
    cents = _round_half_away(g["value"].to_numpy().astype(np.float64) * 100)
    sums = np.add.reduceat(cents, starts)
    user = g["user_id"][0].as_py()
    return pa.table(
        {
            "user_id": pa.array([user] * len(starts), type=pa.int64()),
            "session_id": pa.array(session_id[starts], type=pa.int64()),
            "session_start_us": pa.array(us[starts], type=pa.int64()),
            "session_end_us": pa.array(us[bounds[1:] - 1], type=pa.int64()),
            "n_events": pa.array(n_events, type=pa.int64()),
            "sum_cents": pa.array(sums, type=pa.int64()),
        }
    )


def sessionize(ds, gap_sec: int = SESSION_GAP_SEC):
    """Gap-based sessionization: one session row per (user, session).
    The user_id groupby is the only shuffle; everything else is
    vectorized per group."""
    from functools import partial

    return ds.groupby("user_id").map_groups(
        partial(_sessionize_group, gap_sec=gap_sec), batch_format="pyarrow"
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


def _asof_group(group: pa.Table, ts_column: str, type_column: str,
                left_type: str, right_type: str, value_column: str) -> pa.Table:
    """one key's rows -> as-of rows for the left type."""
    order = pc.sort_indices(
        group, sort_keys=[(ts_column, "ascending"), ("event_id", "ascending")]
    )
    g = group.take(order)
    us = _epoch_us(g[ts_column])
    types = np.asarray(g[type_column].to_pandas())
    is_l = types == left_type
    is_r = types == right_type
    l_idx = np.flatnonzero(is_l)
    if len(l_idx) == 0:
        return pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "ts_us": pa.array([], type=pa.int64()),
                "value": pa.array([], type=pa.float64()),
                "asof_value": pa.array([], type=pa.float64()),
            }
        )
    r_ts = us[is_r]
    r_val = g[value_column].to_numpy()[is_r]
    # last right row with ts strictly earlier; equal right ts resolves
    # to the larger event_id (rows sorted by (ts, event_id))
    pos = np.searchsorted(r_ts, us[l_idx], side="left") - 1
    asof = np.where(pos >= 0, r_val[np.maximum(pos, 0)], np.nan)
    out = pa.table(
        {
            "event_id": g["event_id"].take(pa.array(l_idx, type=pa.int64())),
            "user_id": g["user_id"].take(pa.array(l_idx, type=pa.int64())),
            "ts_us": pa.array(us[l_idx], type=pa.int64()),
            "value": g[value_column].take(pa.array(l_idx, type=pa.int64())),
            "asof_value": pa.array(
                [None if np.isnan(v) else float(v) for v in asof], type=pa.float64()
            ),
        }
    )
    return out


def asof_join(ds, key: str = "user_id", ts_column: str = "ts",
              type_column: str = "event_type", left_type: str = "purchase",
              right_type: str = "view", value_column: str = "value"):
    """Per-key AS-OF join within one event stream: each `left_type`
    row gets the `value` of the latest `right_type` row with STRICTLY
    earlier ts (right-side ties broken by larger event_id — fully
    deterministic, mirrored by the driver oracle SQL).

    Ray Data has no asof-join primitive; this is the prescribed
    composition — one groupby(key) shuffle, then vectorized
    searchsorted inside each group.  Partitioning assumption: the join
    never crosses `key` boundaries, so key-hash partitioning is
    sufficient and reusable by adjacent stages."""
    from functools import partial

    return ds.groupby(key).map_groups(
        partial(
            _asof_group,
            ts_column=ts_column,
            type_column=type_column,
            left_type=left_type,
            right_type=right_type,
            value_column=value_column,
        ),
        batch_format="pyarrow",
    )
