"""Driver-contract emulation: run every queries() entry at sf0.01 and
compare to oracle_sql() via DuckDB the way the driver does — row
count, column names, order-insensitive exact values."""

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"

import __ray_entry__ as entrymod


def _duck(sf_dir):
    con = duckdb.connect()
    for name in ("documents", "embeddings", "events", "lineitem", "orders",
                 "customer", "nation", "region", "supplier", "part"):
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df


def _to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


@pytest.fixture(scope="module")
def con():
    yield _duck(SF_DIR)
    # release the driver-contract engine cache: its SearcherGroup
    # actors (0.5 CPU each) would otherwise outlive this module and
    # starve later tests' task scheduling at the 4-CPU test session
    from chearch_ray.pipelines import driver_contract as dc

    for eng in dc._ENGINES.values():
        try:
            eng.close()
        except Exception:
            pass
    dc._ENGINES.clear()


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle(ray_session, con, name):
    got = _canon(_to_pandas(QUERIES[name](SF_DIR)))
    want = _canon(con.execute(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(ray_session, name):
    got = _to_pandas(QUERIES[name](SF_DIR))
    assert got is not None
    assert len(got.columns) > 0


def test_entry_smoke(ray_session):
    out = entrymod.entry()
    df = _to_pandas(out)
    assert len(df) >= 0
    assert "doc_id" in df.columns and "score" in df.columns


def test_engine_cache_bounded_no_cpu_starvation(ray_session):
    """Regression: an unbounded engine cache accumulated SearcherGroup
    CPU reservations (one engine per index flavor) until Ray Data task
    stages could not schedule at the 4-cpu test session (observed
    deadlock inside ivf_build).  The cache must stay bounded, evicted
    engines must release their actors, and an actor-pool pipeline must
    still complete with every cache slot full."""
    import pyarrow as pa
    import ray.data

    from chearch_ray.pipelines import driver_contract as dc

    # touch >cap distinct engine flavors (indexes are disk-cached by
    # the parametrized oracle tests above, so this is load-only)
    dc.engine_for(SF_DIR)
    dc.wide_engine_for(SF_DIR)
    dc.field_engine_for(SF_DIR, "source")
    dc._deleted_engine_for(SF_DIR)
    dc.engine_for(SF_DIR)
    assert len(dc._ENGINES) <= dc._ENGINE_CACHE_CAP
    # reservations of live engines stay under half the 4-cpu budget
    live_actors = sum(len(e._actors) for e in dc._ENGINES.values())
    assert live_actors * 0.25 <= 2.0
    # an actor-pool map stage (the shape that starved) still schedules

    class Echo:
        def __call__(self, b: pa.Table) -> pa.Table:
            return b

    n = (ray.data.range(1000)
         .map_batches(Echo, concurrency=2, num_cpus=0.5, batch_size=256)
         .count())
    assert n == 1000
