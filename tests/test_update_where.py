"""Predicate UPDATE DML (update_where): full-image 'U' events through the
exactly-once epoch path — SQL UPDATE WHERE semantics (NULL predicate updates
nothing), change-feed visible, time-travelable, LWW-consistent with later
events, key/ts columns frozen."""

import pandas as pd
import pytest

from dbt_customer360_ray.gen import gen_changes, oracle_lake, split_epochs
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")

SPEC = {"name": "tool_turns", "column": "role", "op": "==", "value": "tool"}
SET = {"text": "[tool output redacted]", "tool": "redactor"}
KEY = ["conv_id", "turn_idx"]
SYNC = "2025-06-01"


def _replay(tmp_path, epochs, name="lake", P=8):
    import ray.data

    lake = CdcLake(str(tmp_path / name), num_partitions=P)
    for part in epochs:
        lake.apply(ray.data.from_arrow(part))
    return lake


def _served(lake) -> pd.DataFrame:
    return (
        lake.read_local_table()
        .to_pandas()
        .sort_values(KEY, kind="stable")
        .reset_index(drop=True)
    )


def _fixture(tmp_path, seed=52, name="lake"):
    changes = gen_changes(6_000, 400, seed=seed)
    epochs = split_epochs(changes, 3)
    lake = _replay(tmp_path, epochs, name=name)
    want = oracle_lake(*epochs)
    assert (want.role == "tool").any()  # predicate is non-vacuous
    return lake, epochs, want


def _expected_update(want: pd.DataFrame) -> pd.DataFrame:
    hit = want.role.eq("tool").fillna(False)
    exp = want.copy()
    for c, v in SET.items():
        exp.loc[hit, c] = v
    exp.loc[hit, "ts"] = pd.Timestamp(SYNC)
    return exp.sort_values(KEY, kind="stable").reset_index(drop=True)


def test_update_where_matches_sql_update_semantics(tmp_path):
    lake, _epochs, want = _fixture(tmp_path)
    m = lake.update_where(SPEC, SET, SYNC)
    assert m["upserts"] > 0 and m["deletes"] == 0
    exp = _expected_update(want)
    got = _served(lake)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)
    # distributed read agrees
    ds = lake.read().to_pandas().sort_values(KEY, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(ds[exp.columns.tolist()], exp, check_dtype=False)


def test_update_where_null_predicate_updates_nothing(tmp_path):
    # rows whose predicate column is NULL are untouched (coalesce(pred, FALSE))
    lake, _epochs, want = _fixture(tmp_path)
    spec = {"name": "n", "column": "tool", "op": "==", "value": "__nonexistent__"}
    assert want.tool.isna().any()
    m = lake.update_where(spec, {"text": "x"}, SYNC)
    assert m["upserts"] == 0
    got = _served(lake)
    exp = want.sort_values(KEY, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)


def test_update_is_time_travelable_and_change_feed_visible(tmp_path):
    lake, epochs, want = _fixture(tmp_path)
    v_before = lake.manifest.version
    lake.update_where(SPEC, SET, SYNC)
    # below the commit: the exact pre-update rows
    pre = (
        lake.read_as_of(version=v_before)
        .to_pandas()
        .sort_values(KEY, kind="stable")
        .reset_index(drop=True)
    )
    exp_pre = want.sort_values(KEY, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        pre[exp_pre.columns.tolist()], exp_pre, check_dtype=False
    )
    # the change feed across the commit is exactly the updated keys
    feed = lake.change_feed(
        from_version=v_before, to_version=lake.manifest.version
    ).to_pandas()
    n_hit = int(want.role.eq("tool").fillna(False).sum())
    assert (feed["change_type"] == "update").sum() == n_hit
    assert (feed["change_type"] != "update").sum() == 0


def test_later_event_overrides_update(tmp_path):
    import pyarrow as pa
    import ray.data

    lake, epochs, want = _fixture(tmp_path)
    lake.update_where(SPEC, SET, SYNC)
    # a genuinely newer event for one updated key wins LWW over the update
    hit = want[want.role.eq("tool").fillna(False)].iloc[0]
    base = max(lake.manifest.committed_offsets().values()) + 1
    ev = pa.table(
        {
            "offset": pa.array([base], pa.int64()),
            "op": pa.array(["U"], pa.string()),
            "conv_id": pa.array([hit.conv_id], pa.string()),
            "turn_idx": pa.array([int(hit.turn_idx)], pa.int32()),
            "role": pa.array([hit.role], pa.string()),
            "text": pa.array(["fresh after update"], pa.string()),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([pd.Timestamp("2025-07-01")], pa.timestamp("us")),
        }
    )
    lake.apply(ray.data.from_arrow(ev))
    got = _served(lake)
    row = got[(got.conv_id == hit.conv_id) & (got.turn_idx == hit.turn_idx)]
    assert row.text.iloc[0] == "fresh after update"


def test_update_where_rejects_key_ts_and_unknown_columns(tmp_path):
    lake, _epochs, _want = _fixture(tmp_path)
    with pytest.raises(ValueError, match="cannot be assigned"):
        lake.update_where(SPEC, {"conv_id": "x"}, SYNC)
    with pytest.raises(ValueError, match="cannot be assigned"):
        lake.update_where(SPEC, {"ts": "2025-01-01"}, SYNC)
    with pytest.raises(ValueError, match="unknown column"):
        lake.update_where(SPEC, {"nope": 1}, SYNC)
    with pytest.raises(Exception):  # type mismatch caught on the driver
        lake.update_where(SPEC, {"turn_idx": "not-an-int"}, SYNC)
    with pytest.raises(ValueError, match="non-empty"):
        lake.update_where(SPEC, {}, SYNC)


def test_update_where_set_null(tmp_path):
    lake, _epochs, want = _fixture(tmp_path)
    lake.update_where(SPEC, {"tool": None}, SYNC)
    got = _served(lake)
    hit = got.role.eq("tool").fillna(False)
    assert got.loc[hit, "tool"].isna().all()
    # non-matching rows untouched
    exp_other = want[~want.role.eq("tool").fillna(False)]
    got_other = got[~hit]
    merged = got_other.merge(exp_other, on=KEY, suffixes=("_g", "_e"))
    assert merged.text_g.fillna("").eq(merged.text_e.fillna("")).all()
