"""customer360 DAG vs the independent DuckDB SQL oracle (c360_oracle.py) at a
small fixture scale: all ten driver outputs, exact values."""

import os

import duckdb
import pandas as pd
import pyarrow.parquet as pq
import pytest

from dbt_customer360_ray.pipelines.c360_fixtures import fixture_config
from dbt_customer360_ray.pipelines.c360_oracle import ensure_fixture, oracle_entries
from dbt_customer360_ray.pipelines.customer360 import run_customer360

N = 60
KEYS = [
    "mapping", "summary", "customer", "attr_email", "attr_phone", "attr_name",
    "attr_address", "ip_address", "status", "updates",
]

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def engine_res(ray_session):
    d = ensure_fixture(N)
    tables = {
        name: pq.read_table(os.path.join(d, f"{name}.parquet"))
        for name in (
            "marketo_leads", "stripe_customer_overview", "zendesk_users",
            "zendesk_organizations", "marketo_metrics", "stripe_metrics",
            "zendesk_metrics",
        )
    }
    return run_customer360(tables, fixture_config())


@pytest.fixture(scope="module")
def oracle_res():
    con = duckdb.connect()
    sqls = oracle_entries(num_people=N)
    return {k: con.sql(q).df() for k, q in sqls.items()}


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt in ("Int64", "Int32"):
            df[c] = df[c].astype("float64")
        elif dt.startswith("datetime64") and dt != "datetime64[us]":
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("key", KEYS)
def test_c360_output_matches_sql_oracle(key, engine_res, oracle_res):
    got = _normalize(engine_res[key])
    want = _normalize(oracle_res[f"c360_{key}"])
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
