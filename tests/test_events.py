"""Event-stream operators: windowed aggregate, sessionization, BPE-ish
token counting (stages/events.py)."""

import datetime as dt

import pyarrow as pa

from chearch_ray.stages.events import (
    BPEISH_PATTERN,
    bpeish_token_count,
    sessionize,
    windowed_aggregate,
)


def _events():
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions (gap > 30 min between e2 and e3)
        {"event_id": 0, "ts": base, "user_id": 1, "event_type": "view", "value": 1.25},
        {"event_id": 1, "ts": base + dt.timedelta(minutes=10), "user_id": 1, "event_type": "click", "value": 2.50},
        {"event_id": 2, "ts": base + dt.timedelta(minutes=20), "user_id": 1, "event_type": "view", "value": 0.25},
        {"event_id": 3, "ts": base + dt.timedelta(minutes=80), "user_id": 1, "event_type": "buy", "value": 9.99},
        # user 2: one session
        {"event_id": 4, "ts": base + dt.timedelta(minutes=2), "user_id": 2, "event_type": "view", "value": 4.00},
        {"event_id": 5, "ts": base + dt.timedelta(minutes=31), "user_id": 2, "event_type": "view", "value": 1.00},
    ]
    return pa.Table.from_pylist(rows)


def test_windowed_aggregate(ray_session):
    import ray.data

    out = (
        windowed_aggregate(ray.data.from_arrow(_events()), window_sec=900)
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    base_s = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp())
    # window 0: view@0 + click@10m + view... wait 10m < 15m window
    w0 = out[(out["window_start"] == base_s) & (out["event_type"] == "view")]
    assert int(w0["n_events"].iloc[0]) == 2  # user1@0 and user2@2m
    assert int(w0["sum_cents"].iloc[0]) == 525
    # click@10m also in window 0
    c0 = out[(out["window_start"] == base_s) & (out["event_type"] == "click")]
    assert int(c0["n_events"].iloc[0]) == 1
    # buy@80m lands in window starting at 75m
    b = out[out["event_type"] == "buy"]
    assert int(b["window_start"].iloc[0]) == base_s + 4500
    assert int(b["sum_cents"].iloc[0]) == 999


def test_sessionize(ray_session):
    import ray.data

    out = (
        sessionize(ray.data.from_arrow(_events()), gap_sec=1800)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == [1, 1, 2]
    assert out["session_id"].tolist() == [1, 2, 1]
    assert out["n_events"].tolist() == [3, 1, 2]
    assert out["sum_cents"].tolist() == [400, 999, 500]
    # session boundaries: user1 session1 spans 0..20min
    base_us = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()) * 1_000_000
    assert out["session_start_us"].tolist()[0] == base_us
    assert out["session_end_us"].tolist()[0] == base_us + 20 * 60 * 1_000_000


def test_bpeish_token_count():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], type=pa.int64()),
            "text": pa.array(["it's a test", "hello   world 42", ""]),
        }
    )
    out = bpeish_token_count(t).to_pydict()
    # "it's a test" -> it, 's, ' a', ' test'
    assert out["n_bpeish"][0] == 4
    # "hello   world 42" -> hello, '  ' (ws run), ' world'... RE2 scan:
    # 'hello', '  ' (two spaces, third consumed by ' world'), ' world', ' 42'
    assert out["n_bpeish"][1] == 4
    assert out["n_bpeish"][2] == 0


def test_bpeish_matches_duckdb():
    import duckdb

    texts = ["it's a test", "CamelCase42 under_score", "a.b,c!  d", "ünïcode tøkens"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": pa.array(texts)})
    got = bpeish_token_count(t).to_pydict()["n_bpeish"]
    con = duckdb.connect()
    con.register("d", t)
    sql_pat = BPEISH_PATTERN.replace("'", "''")
    want = [r[0] for r in con.execute(
        f"SELECT length(regexp_extract_all(text, '{sql_pat}')) FROM d ORDER BY doc_id"
    ).fetchall()]
    assert got == want


def test_asof_join(ray_session):
    import ray.data

    from chearch_ray.stages.events import asof_join

    base = dt.datetime(2024, 1, 1)
    rows = [
        {"event_id": 0, "ts": base, "user_id": 1, "event_type": "view", "value": 1.0},
        {"event_id": 1, "ts": base + dt.timedelta(minutes=5), "user_id": 1, "event_type": "view", "value": 2.0},
        # same-ts tie on the right side: larger event_id (3) wins
        {"event_id": 2, "ts": base + dt.timedelta(minutes=6), "user_id": 1, "event_type": "view", "value": 3.0},
        {"event_id": 3, "ts": base + dt.timedelta(minutes=6), "user_id": 1, "event_type": "view", "value": 4.0},
        {"event_id": 4, "ts": base + dt.timedelta(minutes=10), "user_id": 1, "event_type": "purchase", "value": 9.0},
        # purchase before any view -> null asof
        {"event_id": 5, "ts": base, "user_id": 2, "event_type": "purchase", "value": 7.0},
        {"event_id": 6, "ts": base + dt.timedelta(minutes=1), "user_id": 2, "event_type": "view", "value": 5.0},
    ]
    out = (
        asof_join(ray.data.from_arrow(pa.Table.from_pylist(rows)))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["event_id"].tolist() == [4, 5]
    assert out["asof_value"].tolist()[0] == 4.0  # tie broken by event_id
    assert out["asof_value"].isna().tolist() == [False, True]


def test_cents_rounding_matches_duckdb():
    """Midpoint values must round like DuckDB round() (half away from
    zero), not np.rint (half to even)."""
    import duckdb
    import numpy as np

    from chearch_ray.stages.events import _round_half_away

    vals = np.array([0.125, 0.135, -0.125, 2.5 / 100, 0.105, 1.005])
    got = _round_half_away(vals * 100).tolist()
    want = [
        r[0]
        for r in duckdb.connect()
        .execute(
            "SELECT CAST(round(v * 100) AS BIGINT) FROM (SELECT unnest(?) AS v)",
            [vals.tolist()],
        )
        .fetchall()
    ]
    assert got == want


def test_running_windows_vs_duckdb(ray_session):
    """Per-key ordered window functions match SQL window semantics
    exactly, including ts ties (ordered by event_id) and run resets."""
    import duckdb
    import numpy as np
    import ray.data

    from chearch_ray.stages.events import running_windows

    rng = np.random.default_rng(41)
    n = 5000
    base = dt.datetime(2024, 1, 1)
    # few keys -> long runs; ts ties injected deliberately
    ts_s = rng.integers(0, 50_000, size=n)
    rows = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array([base + dt.timedelta(seconds=int(s)) for s in ts_s],
                       type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 37, size=n).astype(np.int64)),
        "value": pa.array(np.round(rng.random(n) * 100, 2)),
    })
    got = (running_windows(ray.data.from_arrow(rows).repartition(7),
                           coarse_partitions=5)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("events", rows)
    want = con.execute("""
SELECT event_id, user_id, epoch_us(ts)::BIGINT AS ts_us,
       row_number() OVER w::BIGINT AS rn,
       sum(CAST(round(value * 100) AS BIGINT))
         OVER (w ROWS UNBOUNDED PRECEDING)::BIGINT AS run_sum_cents,
       coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER w, -1)::BIGINT AS prev_gap_us
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY event_id
""").df()
    assert got.equals(want), got.compare(want)


def test_hopping_window_vs_duckdb(ray_session):
    """Hopping windows: each event lands in exactly window/hop
    windows, sums in integer cents match SQL, hop == window reduces to
    the tumbling aggregate; partition-invariant."""
    import duckdb
    import numpy as np
    import ray.data

    from chearch_ray.stages.events import hopping_window_aggregate, windowed_aggregate

    rng = np.random.default_rng(73)
    n = 4000
    base = dt.datetime(2024, 3, 1)
    rows = pa.table({
        "ts": pa.array([base + dt.timedelta(seconds=int(s))
                        for s in rng.integers(0, 20_000, n)], type=pa.timestamp("us")),
        "event_type": pa.array(rng.choice(["a", "b"], n)),
        "value": pa.array(np.round(rng.random(n) * 50, 2)),
    })
    ds = ray.data.from_arrow(rows).repartition(6)
    got = (hopping_window_aggregate(ds, window_sec=60, hop_sec=20)
           .to_pandas().sort_values(["window_start", "event_type"]).reset_index(drop=True))
    got["n_events"] = got["n_events"].astype("int64")
    con = duckdb.connect()
    con.register("events", rows)
    want = con.execute("""
WITH ev AS (SELECT epoch_us(ts)::BIGINT AS us, event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents FROM events),
hops AS (SELECT unnest(range(0, 3))::BIGINT AS i),
x AS (SELECT (ev.us // 20000000) * 20000000 - hops.i * 20000000 AS s_us,
             ev.event_type, ev.cents, ev.us FROM ev CROSS JOIN hops)
SELECT s_us // 1000000 AS window_start, event_type,
       count(*)::BIGINT AS n_events, sum(cents)::BIGINT AS sum_cents
FROM x WHERE s_us > us - 60000000 AND s_us >= 0
GROUP BY 1, 2 ORDER BY 1, 2""").df()
    assert got.equals(want)
    # every event counted window/hop = 3 times in total
    assert got["n_events"].sum() == 3 * n
    # hop == window degenerates to tumbling
    t1 = (hopping_window_aggregate(ds, window_sec=60, hop_sec=60)
          .to_pandas().sort_values(["window_start", "event_type"]).reset_index(drop=True))
    t2 = (windowed_aggregate(ds, window_sec=60)
          .to_pandas().sort_values(["window_start", "event_type"]).reset_index(drop=True))
    assert t1.equals(t2)


def test_funnel_vs_duckdb(ray_session):
    """Ordered funnel matches the chained min-after-threshold SQL on
    sparse synthetic events (real attrition at every step), honors
    strict ordering (equal timestamps do NOT advance), and is
    partition-invariant."""
    import duckdb
    import numpy as np
    import ray.data

    from chearch_ray.stages.events import funnel

    rng = np.random.default_rng(79)
    n = 6000
    base = dt.datetime(2024, 5, 1)
    rows = pa.table({
        "ts": pa.array([base + dt.timedelta(seconds=int(s))
                        for s in rng.integers(0, 10_000, n)], type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 400, n).astype(np.int64)),
        "event_type": pa.array(rng.choice(["a", "b", "c"], n, p=[0.5, 0.35, 0.15])),
    })
    steps = ["a", "b", "c", "b"]
    got = (funnel(ray.data.from_arrow(rows).repartition(7), steps)
           .to_pandas().sort_values("step_index").reset_index(drop=True))
    got["n_users"] = got["n_users"].astype("int64")
    con = duckdb.connect()
    con.register("events", rows)
    ctes = ["s0 AS (SELECT user_id, min(epoch_us(ts))::BIGINT AS t FROM events "
            "WHERE event_type = 'a' GROUP BY user_id)"]
    for i, s in enumerate(steps[1:], start=1):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(epoch_us(e.ts))::BIGINT AS t "
            f"FROM events e JOIN s{i-1} USING (user_id) "
            f"WHERE e.event_type = '{s}' AND epoch_us(e.ts) > s{i-1}.t "
            f"GROUP BY e.user_id)")
    sels = [f"SELECT {i}::BIGINT AS step_index, '{s}' AS step, "
            f"count(*)::BIGINT AS n_users FROM s{i}" for i, s in enumerate(steps)]
    want = con.execute("WITH " + ", ".join(ctes) + " " + " UNION ALL ".join(sels)
                       ).df().sort_values("step_index").reset_index(drop=True)
    assert got.equals(want), (got, want)
    # attrition is real in this fixture
    assert got["n_users"].iloc[-1] < got["n_users"].iloc[0]
    # strict ordering: a user whose only b is SIMULTANEOUS with a stalls
    tiny = pa.table({
        "ts": pa.array([base, base, base + dt.timedelta(seconds=1)], type=pa.timestamp("us")),
        "user_id": pa.array([7, 7, 7], type=pa.int64()),
        "event_type": pa.array(["a", "b", "c"]),
    })
    t = (funnel(ray.data.from_arrow(tiny), ["a", "b", "c"])
         .to_pandas().sort_values("step_index"))
    assert t["n_users"].tolist() == [1, 0, 0]
    got2 = (funnel(ray.data.from_arrow(rows).repartition(1), steps)
            .to_pandas().sort_values("step_index").reset_index(drop=True))
    got2["n_users"] = got2["n_users"].astype("int64")
    assert got.equals(got2)


def test_retention_vs_duckdb(ray_session):
    """Cohort retention matches the SQL distinct-(user, offset)
    formulation; k=0 rows are cohort sizes; partition-invariant."""
    import duckdb
    import numpy as np
    import ray.data

    from chearch_ray.stages.events import retention

    rng = np.random.default_rng(83)
    n = 5000
    base = dt.datetime(2024, 6, 1)
    rows = pa.table({
        "ts": pa.array([base + dt.timedelta(hours=int(h))
                        for h in rng.integers(0, 24 * 14, n)], type=pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, 300, n).astype(np.int64)),
    })
    got = (retention(ray.data.from_arrow(rows).repartition(8), period_sec=86_400)
           .to_pandas().sort_values(["cohort", "k"]).reset_index(drop=True))
    got["n_active"] = got["n_active"].astype("int64")
    con = duckdb.connect()
    con.register("events", rows)
    want = con.execute("""
WITH p AS (SELECT user_id, epoch_us(ts) // 86400000000 AS per FROM events),
f AS (SELECT user_id, min(per)::BIGINT AS cohort FROM p GROUP BY user_id),
a AS (SELECT DISTINCT p.user_id, f.cohort, (p.per - f.cohort)::BIGINT AS k
      FROM p JOIN f USING (user_id))
SELECT cohort, k, count(*)::BIGINT AS n_active FROM a GROUP BY cohort, k
ORDER BY cohort, k""").df()
    assert got.equals(want)
    # k = 0 rows equal cohort sizes (every user is active in their own
    # first period by definition)
    sizes = got[got["k"] == 0].set_index("cohort")["n_active"]
    per_user_cohort = want  # structure check above suffices; spot check total
    assert sizes.sum() == 300  # every user appears in exactly one cohort
    got2 = (retention(ray.data.from_arrow(rows).repartition(1), period_sec=86_400)
            .to_pandas().sort_values(["cohort", "k"]).reset_index(drop=True))
    got2["n_active"] = got2["n_active"].astype("int64")
    assert got.equals(got2)


def test_interval_join_bruteforce(ray_session):
    """interval_join == brute-force all same-user (left, right) pairs
    with 0 <= gap <= window, including boundary gaps and multi-match
    expansion."""
    import itertools

    import pyarrow as pa
    import ray.data

    from chearch_ray.stages.events import interval_join

    us = 1_000_000
    rows = [
        # user 1: one view, purchases at 0s, 10s, 3600s (boundary), 3601s (out)
        {"event_id": 1, "user_id": 1, "event_type": "view", "ts": 0},
        {"event_id": 2, "user_id": 1, "event_type": "purchase", "ts": 0},
        {"event_id": 3, "user_id": 1, "event_type": "purchase", "ts": 10 * us},
        {"event_id": 4, "user_id": 1, "event_type": "purchase", "ts": 3600 * us},
        {"event_id": 5, "user_id": 1, "event_type": "purchase", "ts": 3601 * us},
        # user 2: purchase BEFORE the view (excluded), one after
        {"event_id": 6, "user_id": 2, "event_type": "purchase", "ts": 5 * us},
        {"event_id": 7, "user_id": 2, "event_type": "view", "ts": 10 * us},
        {"event_id": 8, "user_id": 2, "event_type": "purchase", "ts": 20 * us},
        # user 3: other types only
        {"event_id": 9, "user_id": 3, "event_type": "click", "ts": 0},
        # user 4: two views sharing one purchase (fan-out both ways)
        {"event_id": 10, "user_id": 4, "event_type": "view", "ts": 0},
        {"event_id": 11, "user_id": 4, "event_type": "view", "ts": 1 * us},
        {"event_id": 12, "user_id": 4, "event_type": "purchase", "ts": 2 * us},
    ]
    t = pa.table(
        {
            "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
            "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
            "event_type": pa.array([r["event_type"] for r in rows]),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        }
    )
    out = interval_join(ray.data.from_arrow(t), "view", "purchase", 3600).to_pandas()
    got = {(a, b): g for a, b, g in zip(out["a_id"], out["b_id"], out["gap_us"])}
    want = {}
    for a, b in itertools.product(rows, rows):
        if (a["event_type"] == "view" and b["event_type"] == "purchase"
                and a["user_id"] == b["user_id"]
                and 0 <= b["ts"] - a["ts"] <= 3600 * us):
            want[(a["event_id"], b["event_id"])] = b["ts"] - a["ts"]
    assert got == want
    assert (1, 4) in want and (1, 5) not in want  # boundary in, past out
    assert (7, 6) not in want                     # earlier purchase out
    assert (10, 12) in want and (11, 12) in want  # fan-out


def test_event_moving_sum_partition_independent(ray_session):
    """event_moving_sum must be identical for any coarse partition
    count (frames never cross users, users never split), and match a
    pandas rolling mirror."""
    import pyarrow.parquet as pq
    import ray.data

    import numpy as np
    from chearch_ray.stages.events import _round_half_away, event_moving_sum

    tbl = pq.read_table("/root/testdata/sf0.001/events.parquet",
                        columns=["event_id", "user_id", "ts", "value"])

    def run(n_parts):
        out = event_moving_sum(ray.data.from_arrow(tbl).repartition(5),
                               window_rows=4, coarse_partitions=n_parts)
        return out.to_pandas().sort_values("event_id", ignore_index=True)

    a, b = run(3), run(17)
    assert a.equals(b)

    df = tbl.to_pandas().sort_values(["user_id", "ts", "event_id"],
                                     ignore_index=True)
    df["cents"] = _round_half_away(df["value"].to_numpy() * 100)
    g = df.groupby("user_id")["cents"]
    want_sum = g.rolling(4, min_periods=1).sum().reset_index(level=0, drop=True)
    want_cnt = g.rolling(4, min_periods=1).count().reset_index(level=0, drop=True)
    df["w_sum_cents"] = want_sum.astype(np.int64)
    df["w_count"] = want_cnt.astype(np.int64)
    want = df[["event_id", "user_id", "w_sum_cents", "w_count"]].sort_values(
        "event_id", ignore_index=True)
    assert a.equals(want)


def test_ordered_page_matches_single_block(ray_session):
    """ordered_page over many blocks == the page of a driver-side full
    sort (unique trailing key makes the page deterministic)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from chearch_ray.pipelines.analytics import ordered_page

    tbl = pq.read_table("/root/testdata/sf0.001/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    keys = [("o_orderdate", "ascending"), ("o_orderkey", "ascending")]
    got = ordered_page(ray.data.from_arrow(tbl).repartition(9),
                       sort_keys=keys, limit=20, offset=7)
    want = tbl.take(pc.sort_indices(tbl, sort_keys=keys).slice(7, 20))
    assert got.to_pandas().equals(want.to_pandas())
    # offset past the end -> empty page, stable schema
    empty = ordered_page(ray.data.from_arrow(tbl).repartition(9),
                         sort_keys=keys, limit=5, offset=len(tbl) + 10)
    assert len(empty) == 0
    assert empty.column_names == ["o_orderkey", "o_custkey", "o_orderdate"]
