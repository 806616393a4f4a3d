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


_RAW_ANALYSES = {
    "c360_analysis_email_campaign_raw": "analysis_email_campaign_list_raw",
    "c360_analysis_all_phones_raw": "analysis_metrics_with_all_phones_raw",
    "c360_analysis_email_campaign_raw_delta": "analysis_email_campaign_raw_delta",
    "c360_analysis_all_phones_raw_delta": "analysis_all_phones_raw_delta",
    "c360_analysis_monthly_metrics_raw": "analysis_monthly_metrics_raw",
    "c360_analysis_monthly_metrics_raw_delta": "analysis_monthly_metrics_raw_delta",
}


@pytest.fixture(scope="module")
def raw_tables():
    d = ensure_fixture(N)
    return {
        name: pd.read_parquet(os.path.join(d, f"{name}.parquet"))
        for name in (
            "marketo_leads", "stripe_customer_overview", "zendesk_users",
            "zendesk_organizations", "stripe_metrics", "zendesk_metrics",
        )
    }


@pytest.mark.parametrize("key", sorted(_RAW_ANALYSES))
def test_raw_conformance_analyses_match_oracle(key, engine_res, oracle_res, raw_tables):
    """The reference's raw-vs-360 conformance pair (analyses_old/elan/*_raw.sql
    twins + deltas) — engine pandas vs independent DuckDB derivation."""
    from dbt_customer360_ray.pipelines import customer360 as c3

    fn = getattr(c3, _RAW_ANALYSES[key])
    got = fn(engine_res, raw_tables) if key.endswith("_delta") else fn(raw_tables)
    want = oracle_res[key]
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        _normalize(got), _normalize(want), check_dtype=False, check_exact=True
    )


def test_raw_delta_surfaces_resolution_differences(engine_res, raw_tables):
    """The conformance deltas must actually carry content: the raw email-only
    join misses entities c360 matching links (billing emails, null-email
    rows), so both raw_only and non-trivial rows exist in the fixture."""
    from dbt_customer360_ray.pipelines import customer360 as c3

    delta = c3.analysis_email_campaign_raw_delta(engine_res, raw_tables)
    assert set(delta["status"]) >= {"both", "raw_only"}
    ph = c3.analysis_all_phones_raw_delta(engine_res, raw_tables)
    both = ph[ph["status"] == "both"]
    # raw keeps distinct SPELLINGS, c360 normalizes — counts must diverge
    # somewhere, or the delta would be vacuous
    assert (both["raw_n_phones"] != both["c360_n_phones"]).any()
