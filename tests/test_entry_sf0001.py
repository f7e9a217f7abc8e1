"""Second-scale driver-contract check: every oracle-backed query also
compares exactly at sf0.001 — a different data scale flips which
gated paths (broadcast vs exchange, driver vs groupby merges) run and
surfaces scale-dependent edge cases (empty filter windows, zero-row
join sides) the sf0.01 pass can miss."""

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

import __ray_entry__ as entrymod

from tests.test_entry import _canon, _duck, _to_pandas

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    yield _duck(SF_DIR)
    from chearch_ray.pipelines import driver_contract as dc

    for eng in dc._ENGINES.values():
        try:
            eng.close()
        except Exception:
            pass
    dc._ENGINES.clear()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_vs_oracle_sf0001(ray_session, con, name):
    got = _canon(_to_pandas(QUERIES[name](SF_DIR)))
    want = _canon(con.execute(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)
