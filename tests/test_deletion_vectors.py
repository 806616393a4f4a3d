"""Deletion vectors (delete_where mode="dv"): merge-on-read positional masks
on hardlink-renamed runs — zero data bytes moved, every serving surface
consistent, time travel / change feed exact, compaction folds them away."""

import os

import pandas as pd
import pytest

from dbt_customer360_ray.gen import gen_changes, oracle_lake, split_epochs
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")

SPEC = {"name": "drop_tool", "column": "role", "op": "==", "value": "tool"}
KEY = ["conv_id", "turn_idx"]


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


def _fixture(tmp_path, seed=51, name="lake"):
    changes = gen_changes(6_000, 400, seed=seed)
    epochs = split_epochs(changes, 3)
    lake = _replay(tmp_path, epochs, name=name)
    want = oracle_lake(*epochs)
    assert (want.role == "tool").any()  # predicate is non-vacuous
    return lake, epochs, want


def test_dv_equals_tombstone_delete_and_oracle(tmp_path):
    changes = gen_changes(6_000, 400, seed=51)
    epochs = split_epochs(changes, 3)
    a = _replay(tmp_path, epochs, name="tomb")
    b = _replay(tmp_path, epochs, name="dv")
    a.delete_where(SPEC, "2025-06-01")
    m = b.delete_where(SPEC, mode="dv")
    assert m["partitions_vectorized"] > 0 and m["rows_masked"] > 0
    want = oracle_lake(*epochs)
    exp = want[~want.role.eq("tool").fillna(False)].reset_index(drop=True)
    got = _served(b)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)
    ga = _served(a)[exp.columns.tolist()].reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], ga, check_dtype=False)
    # distributed read agrees with the local one (exercises _masked_run_read)
    ds = b.read().to_pandas().sort_values(KEY, kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(ds[exp.columns.tolist()], exp, check_dtype=False)


def test_dv_moves_no_data_bytes(tmp_path):
    lake, _epochs, _want = _fixture(tmp_path)
    before = {
        os.path.abspath(p): os.stat(p).st_ino for p in lake.manifest.live_files()
    }
    lake.delete_where(SPEC, mode="dv")
    inodes = set(before.values())
    dv_runs = 0
    for pid in range(lake.P):
        for run in lake.manifest.partition(pid)["runs"]:
            p = os.path.join(lake.lake_dir, run["path"])
            if run.get("dv_rows"):
                dv_runs += 1
                # the "new" run is a hardlink to pre-delete bytes
                assert os.stat(p).st_ino in inodes
                assert os.path.exists(p + ".dv")
    assert dv_runs > 0
    for p in before:  # old names untouched (time travel reads them)
        assert os.path.exists(p)


def test_dv_time_travel_and_change_feed(tmp_path):
    lake, _epochs, want = _fixture(tmp_path)
    v0 = lake.manifest.version
    pre = _served(lake)
    lake.delete_where(SPEC, mode="dv")
    # below the commit: exact pre-delete rows (old names carry no sidecar)
    back = (
        lake.read_local_table_as_of(version=v0)
        .to_pandas()
        .sort_values(KEY, kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, pre, check_dtype=False)
    # the snapshot diff classifies exactly the masked winners as deletes
    feed = lake.change_feed(
        from_version=v0, to_version=lake.manifest.version
    ).to_pandas()
    assert set(feed["change_type"]) == {"delete"}
    gone = want[want.role.eq("tool").fillna(False)]
    assert len(feed) == len(gone)
    assert set(zip(feed.conv_id, feed.turn_idx)) == set(
        zip(gone.conv_id, gone.turn_idx)
    )
    hist = lake.describe_history().to_pandas()
    assert "DELETE_DV" in set(hist["operation"])


def test_dv_lookup_and_since_read(tmp_path):
    lake, _epochs, want = _fixture(tmp_path)
    lake.delete_where(SPEC, mode="dv")
    exp = want[~want.role.eq("tool").fillna(False)]
    conv = exp[exp.conv_id.isin(want[want.role.eq("tool")].conv_id)].conv_id.iloc[0]
    got = lake.lookup(conv).to_pandas()
    e = exp[exp.conv_id == conv].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[e.columns.tolist()].reset_index(drop=True), e, check_dtype=False
    )
    cutoff = exp.ts.quantile(0.8)
    since = (
        lake.read(since_ts=cutoff)
        .to_pandas()
        .sort_values(KEY, kind="stable")
        .reset_index(drop=True)
    )
    e2 = exp[exp.ts >= pd.Timestamp(cutoff)].reset_index(drop=True)
    pd.testing.assert_frame_equal(since[e2.columns.tolist()], e2, check_dtype=False)


def test_dv_second_delete_unions_and_compaction_folds(tmp_path):
    lake, _epochs, want = _fixture(tmp_path)
    lake.delete_where(SPEC, mode="dv")
    lake.delete_where(
        {"name": "sys", "column": "role", "op": "==", "value": "system"}, mode="dv"
    )
    exp = want[~want.role.isin(["tool", "system"])].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        _served(lake)[exp.columns.tolist()], exp, check_dtype=False
    )
    assert lake.fsck(check_rows=True)["ok"]
    # compaction reads through the vectors and folds them into clean bytes
    lake.compact(force=True, policy="full")
    for pid in range(lake.P):
        for run in lake.manifest.partition(pid)["runs"]:
            assert not run.get("dv_rows")
    lake.vacuum()  # old names + orphaned .dv sidecars reclaimed
    data_dir = os.path.join(lake.lake_dir, "data")
    stray = [
        f
        for root, _d, names in os.walk(data_dir)
        for f in names
        if f.endswith(".dv")
    ]
    assert stray == []
    pd.testing.assert_frame_equal(
        _served(lake)[exp.columns.tolist()], exp, check_dtype=False
    )
    assert lake.fsck(check_rows=True)["ok"]


def test_dv_reshard_does_not_resurrect(tmp_path):
    lake, _epochs, want = _fixture(tmp_path)
    lake.delete_where(SPEC, mode="dv")
    dest = lake.reshard(str(tmp_path / "resharded"), 5)
    exp = want[~want.role.eq("tool").fillna(False)].reset_index(drop=True)
    got = (
        dest.read()
        .to_pandas()
        .sort_values(KEY, kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)


def test_dv_requires_known_mode_and_tombstone_needs_sync_ts(tmp_path):
    lake, _epochs, _want = _fixture(tmp_path)
    with pytest.raises(ValueError, match="unknown mode"):
        lake.delete_where(SPEC, mode="wat")
    with pytest.raises(ValueError, match="sync_ts"):
        lake.delete_where(SPEC)


def test_restore_undoes_a_dv_delete(tmp_path):
    """RESTORE to the pre-DV version serves the exact pre-delete state (the
    old run names have no sidecars and stay on disk until vacuum)."""
    lake, _epochs, want = _fixture(tmp_path, seed=53)
    v0 = lake.manifest.version
    pre = _served(lake)
    lake.delete_where(SPEC, mode="dv")
    assert len(_served(lake)) < len(pre)
    lake.restore(version=v0)
    pd.testing.assert_frame_equal(_served(lake), pre)
    assert lake.fsck(check_rows=True)["ok"]
