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
    for name in ("documents", "embeddings", "events",
                 "lineitem", "orders", "customer", "nation", "region"):
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
