"""Join operators + PipelineConfig + remaining attribute tables."""

import numpy as np
import pandas as pd
import pytest

from dbt_customer360_ray.config import MatchIdSpec, PipelineConfig
from dbt_customer360_ray.stages import joins as J

pytestmark = pytest.mark.usefixtures("ray_session")


def _ds(df):
    import ray.data

    return ray.data.from_pandas(df)


LEFT = pd.DataFrame({"k": [1, 2, 2, 3, 5], "a": list("abcde")})
RIGHT = pd.DataFrame({"k": [1, 2, 4], "b": list("xyz")})


def test_broadcast_join():
    out = J.broadcast_join(_ds(LEFT), RIGHT, on="k").to_pandas().sort_values(["k", "a"])
    assert out["b"].where(out["b"].notna(), None).tolist() == ["x", "y", "y", None, None]


def test_bucketed_hash_join_matches_pandas():
    for how in ("inner", "left"):
        got = (
            J.bucketed_hash_join(_ds(LEFT), _ds(RIGHT), on="k", how=how, num_buckets=4)
            .to_pandas()
            .sort_values(["k", "a"])
            .reset_index(drop=True)
        )
        want = LEFT.merge(RIGHT, on="k", how=how).sort_values(["k", "a"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)


def test_semi_anti_join():
    semi = J.semi_join(_ds(LEFT), {2, 3}, on="k").to_pandas()
    assert sorted(semi["k"]) == [2, 2, 3]
    anti = J.anti_join(_ds(LEFT), {2, 3}, on="k").to_pandas()
    assert sorted(anti["k"]) == [1, 5]


def test_asof_join_matches_pandas():
    t0 = pd.Timestamp("2025-01-01")
    left = pd.DataFrame(
        {"k": ["a"] * 4 + ["b"] * 3, "ts": [t0 + pd.Timedelta(minutes=m) for m in (1, 5, 9, 13, 2, 6, 10)],
         "v": range(7)}
    )
    right = pd.DataFrame(
        {"k": ["a", "a", "b"], "ts": [t0, t0 + pd.Timedelta(minutes=8), t0 + pd.Timedelta(minutes=4)],
         "price": [1.0, 2.0, 3.0]}
    )
    got = (
        J.asof_join(_ds(left), _ds(right), key="k", ts="ts", num_buckets=2)
        .to_pandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"), on="ts", by="k")
    want = want.sort_values(["k", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)


def test_point_in_interval_join_matches_bruteforce():
    """Grid-cell composition equals the brute-force predicate join, including
    boundary points (ts == lo kept, ts == hi excluded) and intervals spanning
    multiple grid cells."""
    import pyarrow as pa
    import ray.data

    t0 = pd.Timestamp("2024-01-01")
    pts = pd.DataFrame(
        {
            "pid": np.arange(8, dtype=np.int64),
            "k": [1, 1, 1, 1, 2, 2, 3, 3],
            "ts": [
                t0, t0 + pd.Timedelta(hours=5), t0 + pd.Timedelta(days=2),
                t0 + pd.Timedelta(days=3),  # == hi of iv0: excluded
                t0 + pd.Timedelta(days=1), t0 + pd.Timedelta(days=9),
                t0 + pd.Timedelta(days=4), t0 + pd.Timedelta(days=5),
            ],
        }
    )
    ivs = pd.DataFrame(
        {
            "iid": np.arange(4, dtype=np.int64),
            "k": [1, 1, 2, 4],
            "lo": [t0, t0 + pd.Timedelta(days=2), t0, t0],
            "hi": [
                t0 + pd.Timedelta(days=3),  # spans 3 one-day cells
                t0 + pd.Timedelta(days=2, hours=1),
                t0 + pd.Timedelta(days=10),
                t0 + pd.Timedelta(days=10),
            ],
        }
    )
    got = (
        J.point_in_interval_join(
            ray.data.from_pandas(pts), ray.data.from_pandas(ivs),
            key="k", ts="ts", lo="lo", hi="hi", grid_seconds=86_400,
        )
        .to_pandas()[["pid", "iid"]]
        .sort_values(["pid", "iid"]).reset_index(drop=True)
    )
    want = (
        pts.merge(ivs, on="k")
        .query("ts >= lo and ts < hi")[["pid", "iid"]]
        .sort_values(["pid", "iid"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(want) > 0 and 3 not in want["pid"].tolist()


def test_pipeline_config_validation():
    PipelineConfig()  # defaults valid
    with pytest.raises(ValueError):
        PipelineConfig(enabled_sources=("marketo",))  # 2-of-3 rule
    with pytest.raises(ValueError):
        PipelineConfig(enabled_sources=("marketo", "hubspot"))
    with pytest.raises(ValueError):
        PipelineConfig(grains={"marketo": "galactic"})
    spec = MatchIdSpec("crm_id", {"marketo": "crm_id", "stripe": "metadata_crm_id"})
    cfg = PipelineConfig(internal_match_ids=(spec,))
    assert cfg.internal_match_ids[0].name == "crm_id"


def test_remaining_attribute_tables():
    from dbt_customer360_ray.pipelines.c360_fixtures import gen_c360_sources
    from dbt_customer360_ray.pipelines.customer360 import run_customer360

    tables, _ = gen_c360_sources(80, seed=9)
    res = run_customer360(tables)
    addr = res["attr_address"]
    assert not addr.empty
    assert addr[addr["index"] == 1]["customer360_id"].is_unique
    # street-expanded values: match keys made '123 X St' == '123 X Street'
    assert addr["value"].str.contains("Street|Rd|Avenue", regex=True).any()
    ip = res["ip_address"]
    assert set(ip["type"].unique()) <= {"ipv4", "ipv6"}
    st = res["status"]
    assert set(st["status"].unique()) >= {"is_unsubscribed", "is_delinquent", "is_active"}
    up = res["updates"]
    assert set(up["source"].unique()) == {"marketo", "stripe", "zendesk"}
    assert "best_address" in res["summary"].columns


def test_analyses_layer():
    from dbt_customer360_ray.pipelines.c360_fixtures import gen_c360_sources
    from dbt_customer360_ray.pipelines.customer360 import (
        analysis_email_campaign_list,
        analysis_metrics_with_all_phones,
        analysis_monthly_metrics,
        run_customer360,
    )

    tables, _ = gen_c360_sources(80, seed=9)
    res = run_customer360(tables)
    camp = analysis_email_campaign_list(res)
    assert set(camp["revenue_bucket"].unique()) <= {"none", "low", "mid", "high"}
    assert camp["best_email"].notna().all()
    phones = analysis_metrics_with_all_phones(res)
    assert phones["phones"].str.contains(r"\+1").any()
    monthly = analysis_monthly_metrics(res)
    assert monthly["new_customers"].sum() > 0
    assert monthly["month"].is_monotonic_increasing


def test_rolling_window_semantics():
    from dbt_customer360_ray.stages.windows import rolling_window

    # user 1: ts 0s, 30m, 30m (peers), 90m; user 2: ts 0s
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 1, 2],
            "ts": [
                base,
                base + pd.Timedelta(minutes=30),
                base + pd.Timedelta(minutes=30),
                base + pd.Timedelta(minutes=90),
                base,
            ],
            "event_id": [10, 11, 12, 13, 20],
            "value_cents": [100, 200, 400, 800, 50],
        }
    )
    out = (
        rolling_window(_ds(df), keep_cols=("event_id",), window_seconds=3600)
        .to_pandas()
        .sort_values("event_id")
        .set_index("event_id")
    )
    # RANGE semantics: equal-ts rows are peers — both 30m rows see each other
    assert out.loc[10, "n_window"] == 1 and out.loc[10, "cents_window"] == 100
    assert out.loc[11, "n_window"] == 3 and out.loc[11, "cents_window"] == 700
    assert out.loc[12, "n_window"] == 3 and out.loc[12, "cents_window"] == 700
    # 90m row: 0s row fell out of the 1h window, the 30m peers remain
    assert out.loc[13, "n_window"] == 3 and out.loc[13, "cents_window"] == 1400
    # other user unaffected
    assert out.loc[20, "n_window"] == 1 and out.loc[20, "cents_window"] == 50

    # segmented fallback (int64-overflow guard for extreme key-cardinality ×
    # time-range buckets) computes the identical result
    seg = (
        rolling_window(
            _ds(df), keep_cols=("event_id",), window_seconds=3600, axis_limit=0
        )
        .to_pandas()
        .sort_values("event_id")
        .set_index("event_id")
    )
    pd.testing.assert_frame_equal(out, seg)


def test_range_join():
    df = pd.DataFrame({"id": [1, 2, 3, 4], "v": [5.0, 10.0, 25.0, 99.0]})
    bands = pd.DataFrame(
        {"band": ["lo", "hi"], "lo": [0.0, 10.0], "hi": [10.0, 50.0]}
    )
    inner = (
        J.range_join(_ds(df), bands, "v").to_pandas().sort_values("id")
    )
    # 5 -> lo; 10 (boundary: lo-inclusive, hi-exclusive) -> hi; 25 -> hi; 99 dropped
    assert inner["id"].tolist() == [1, 2, 3]
    assert inner["band"].tolist() == ["lo", "hi", "hi"]

    left = J.range_join(_ds(df), bands, "v", how="left").to_pandas().sort_values("id")
    assert left["id"].tolist() == [1, 2, 3, 4]
    assert left["band"].isna().tolist() == [False, False, False, True]

    with pytest.raises(ValueError):
        J.range_join(
            _ds(df),
            pd.DataFrame({"band": ["a", "b"], "lo": [0.0, 5.0], "hi": [10.0, 20.0]}),
            "v",
        )
