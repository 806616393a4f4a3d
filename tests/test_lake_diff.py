"""Anti-entropy between replica lakes: diff_lake (cross-lake change_feed —
empty diff = replica-equality proof) and repair_from (adopt the other side's
run files for exactly the diverged partitions, zero bytes copied)."""

import os

import pandas as pd
import pytest

from dbt_customer360_ray.gen import gen_changes, oracle_lake, split_epochs
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")

KEY = ["conv_id", "turn_idx"]
SPEC = {"name": "tool_turns", "column": "role", "op": "==", "value": "tool"}
SET = {"text": "[redacted]"}
SYNC = "2025-06-01"


def _replay(tmp_path, epochs, name, P=8):
    import ray.data

    lake = CdcLake(str(tmp_path / name), num_partitions=P)
    for part in epochs:
        lake.apply(ray.data.from_arrow(part))
    return lake


def _fixture(tmp_path, seed=53):
    changes = gen_changes(6_000, 400, seed=seed)
    epochs = split_epochs(changes, 3)
    return epochs, oracle_lake(*epochs)


def _served(lake) -> pd.DataFrame:
    return (
        lake.read_local_table()
        .to_pandas()
        .sort_values(KEY, kind="stable")
        .reset_index(drop=True)
    )


def test_identical_replicas_diff_empty(tmp_path):
    epochs, _want = _fixture(tmp_path)
    a = _replay(tmp_path, epochs, "a")
    # replica built from the SAME encoded stream in different batch sizes
    # (each epoch applied as two half-slices): LWW convergence makes the
    # served states equal, and the diff must prove it
    import ray.data

    b = CdcLake(str(tmp_path / "b"), num_partitions=8)
    for part in epochs:
        half = part.num_rows // 2
        b.apply(ray.data.from_arrow(part.slice(0, half)))
        b.apply(ray.data.from_arrow(part.slice(half)))
    assert a.diff_lake(b).count() == 0
    assert b.diff_lake(a).count() == 0


def test_diff_classifies_all_three_change_types(tmp_path):
    epochs, want = _fixture(tmp_path)
    a = _replay(tmp_path, epochs, "a")
    b = _replay(tmp_path, epochs, "b")
    b.update_where(SPEC, SET, SYNC)
    b.delete_where(
        {"name": "d", "column": "role", "op": "==", "value": "system"},
        "2025-06-02",
    )
    diff = a.diff_lake(b).to_pandas()
    n_tool = int(want.role.eq("tool").fillna(False).sum())
    n_sys = int(want.role.eq("system").fillna(False).sum())
    assert n_tool > 0 and n_sys > 0
    by_type = diff.change_type.value_counts().to_dict()
    assert by_type.get("update", 0) == n_tool
    assert by_type.get("delete", 0) == n_sys
    assert by_type.get("insert", 0) == 0
    upd = diff[diff.change_type == "update"]
    assert (upd.text == "[redacted]").all()  # post-image is B's row
    dele = diff[diff.change_type == "delete"]
    assert dele.text.isna().all() and dele.ts.isna().all()


def test_repair_from_adopts_only_diverged_partitions(tmp_path):
    epochs, _want = _fixture(tmp_path)
    a = _replay(tmp_path, epochs, "a")
    b = _replay(tmp_path, epochs, "b")
    # diverge ONE conversation: only its owner partition should be repaired
    import pyarrow as pa
    import ray.data

    hit = _served(b).conv_id.iloc[0]
    base = max(b.manifest.committed_offsets().values()) + 1
    ev = pa.table(
        {
            "offset": pa.array([base], pa.int64()),
            "op": pa.array(["U"], pa.string()),
            "conv_id": pa.array([hit], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"], pa.string()),
            "text": pa.array(["diverged"], pa.string()),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([pd.Timestamp("2025-06-05")], pa.timestamp("us")),
        }
    )
    b.apply(ray.data.from_arrow(ev))
    assert a.diff_lake(b).count() == 1
    before_runs = {
        pid: [r["path"] for r in a.manifest.partition(pid)["runs"]]
        for pid in range(a.P)
    }
    m = a.repair_from(b)
    assert m["partitions_repaired"] == 1 and m["rows_changed"] == 1
    assert a.diff_lake(b).count() == 0
    pd.testing.assert_frame_equal(_served(a), _served(b), check_dtype=False)
    # untouched partitions keep their exact run lists; the adopted one
    # references B's files in place (zero bytes copied)
    changed = [
        pid
        for pid in range(a.P)
        if [r["path"] for r in a.manifest.partition(pid)["runs"]]
        != before_runs[pid]
    ]
    assert len(changed) == 1
    for r in a.manifest.partition(changed[0])["runs"]:
        assert os.path.isabs(r["path"]) and r["path"].startswith(b.lake_dir)


def test_diff_rejects_mismatched_partitioning(tmp_path):
    epochs, _want = _fixture(tmp_path)
    a = _replay(tmp_path, epochs, "a", P=8)
    b = _replay(tmp_path, epochs, "b", P=16)
    with pytest.raises(ValueError, match="partition counts differ"):
        a.diff_lake(b)


def test_repair_respects_purge_lists(tmp_path):
    epochs, _want = _fixture(tmp_path)
    a = _replay(tmp_path, epochs, "a")
    b = _replay(tmp_path, epochs, "b")
    victim = _served(a).conv_id.iloc[0]
    a.purge_key(victim)
    # the purged conversation reads as a difference (B still serves it) …
    d = a.diff_lake(b).to_pandas()
    assert (d.conv_id == victim).all() and (d.change_type == "insert").all()
    # … but repair refuses to resurrect it
    with pytest.raises(ValueError, match="purge lists differ"):
        a.repair_from(b)
    b.purge_key(victim)
    assert a.diff_lake(b).count() == 0
    assert a.repair_from(b)["partitions_repaired"] == 0
