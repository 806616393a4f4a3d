"""Driver-style correctness gate, run locally at sf0.001: every analytics query
vs its DuckDB oracle — row count, column names, and order-insensitive exact
values (mimics the driver's value-hash compare at sf0.01)."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as _entry

QUERIES = _entry.queries()
# c360_* entries run the whole identity DAG — covered by tests/test_c360_oracle.py
ORACLE_SQL = {
    k: v for k, v in _entry.oracle_sql().items() if not k.startswith("c360_")
}

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(name, ddb):
    got = QUERIES[name](SF_DIR)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = ddb.sql(ORACLE_SQL[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    g, w = _normalize(got), _normalize(want)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
