"""Column-mapping schema evolution: RENAME / DROP COLUMN as metadata-only
commits over the CDC lake (Delta column-mapping name mode).

The reference handles upstream column changes by full-refreshing every model
(/root/reference/dbt_project.yml:11); the lake-side answer is a manifest-level
logical→physical mapping so an upstream ``ALTER TABLE RENAME/DROP COLUMN``
costs one metadata commit, never a data rewrite. Semantics under test:

- rename/drop rewrite NO data files (live file set unchanged);
- post-rename events must carry the NEW name; the old name becomes a brand-new
  column (exactly Delta's rule);
- a dropped column re-added under the same name gets a FRESH physical column —
  the dropped data never resurrects;
- time travel / RESTORE see the names as of each snapshot;
- every read surface (read, read_local_table, lookup, lookup_many, change_feed,
  export_snapshot) presents logical names; system/key columns are immutable.
"""

import pandas as pd
import pyarrow as pa
import pytest

from dbt_customer360_ray.gen import gen_changes, oracle_lake, split_epochs
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")


def _lake(tmp_path, name="lake", **kw):
    return CdcLake(str(tmp_path / name), num_partitions=8, **kw)


def _apply(lake, table):
    import ray.data

    return lake.apply(ray.data.from_arrow(table))


def _renamed(t: pa.Table, old: str, new: str) -> pa.Table:
    return t.rename_columns([new if n == old else n for n in t.column_names])


def _tbl(rows):
    """rows: (offset, op, conv_id, turn_idx, role, text, tool, ts_str)."""
    cols = list(zip(*rows))
    return pa.table(
        {
            "offset": pa.array(cols[0], pa.int64()),
            "op": pa.array(cols[1], pa.string()),
            "conv_id": pa.array(cols[2], pa.string()),
            "turn_idx": pa.array(cols[3], pa.int32()),
            "role": pa.array(cols[4], pa.string()),
            "text": pa.array(cols[5], pa.string()),
            "tool": pa.array(cols[6], pa.string()),
            "ts": pa.array([pd.Timestamp(x) for x in cols[7]], pa.timestamp("us")),
        }
    )


def _sorted_df(tbl) -> pd.DataFrame:
    df = tbl.to_pandas() if hasattr(tbl, "to_pandas") else tbl
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )


def test_rename_is_metadata_only_and_reads_logical(tmp_path):
    epochs = split_epochs(gen_changes(4_000, 200, seed=31), 2)
    lake = _lake(tmp_path)
    for e in epochs:
        _apply(lake, e)
    files_before = sorted(lake.manifest.live_files())
    v_before = lake.manifest.version
    lake.rename_column("tool", "tool_label")
    assert lake.manifest.version == v_before + 1
    assert sorted(lake.manifest.live_files()) == files_before  # no data rewrite

    got = _sorted_df(lake.read_local_table())
    want = _sorted_df(oracle_lake(*epochs).rename(columns={"tool": "tool_label"}))
    assert "tool" not in got.columns and "tool_label" in got.columns
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()], check_dtype=False)
    # the Dataset read path agrees, including columns= pruning by LOGICAL name
    assert set(lake.read().schema().names) == set(got.columns)
    pruned = lake.read(columns=["tool_label"]).schema().names
    assert sorted(pruned) == ["conv_id", "tool_label", "turn_idx"]
    with pytest.raises(KeyError):
        lake.read(columns=["tool"])


def test_ingest_after_rename_lands_in_same_physical(tmp_path):
    epochs = split_epochs(gen_changes(4_000, 200, seed=33), 4)
    lake = _lake(tmp_path)
    _apply(lake, epochs[0])
    _apply(lake, epochs[1])
    lake.rename_column("tool", "tool_label")
    for e in epochs[2:]:
        _apply(lake, _renamed(e, "tool", "tool_label"))  # events carry NEW name
    got = _sorted_df(lake.read_local_table())
    want = _sorted_df(oracle_lake(*epochs).rename(columns={"tool": "tool_label"}))
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()], check_dtype=False)


def test_old_name_after_rename_is_a_new_column(tmp_path):
    e0 = _tbl(
        [
            (0, "I", "c1", 0, "user", "hi", "calc", "2025-01-01 00:00:00"),
            (1, "I", "c2", 0, "user", "yo", "web", "2025-01-01 00:00:01"),
        ]
    )
    lake = _lake(tmp_path)
    _apply(lake, e0)
    lake.rename_column("tool", "tool_label")
    # an upstream producer still emitting the OLD name: brand-new column
    e1 = _tbl([(2, "U", "c1", 0, "user", "hi2", "sql", "2025-01-01 00:00:02")])
    _apply(lake, e1)
    got = _sorted_df(lake.read_local_table()).set_index("conv_id")
    assert {"tool_label", "tool"} <= set(got.columns)
    # c1 was fully overwritten by the new-schema row: tool_label nulls, tool set
    assert pd.isna(got.loc["c1", "tool_label"]) and got.loc["c1", "tool"] == "sql"
    # c2 untouched: tool_label keeps its value, new column is null
    assert got.loc["c2", "tool_label"] == "web" and pd.isna(got.loc["c2", "tool"])


def test_drop_and_readd_never_resurrects(tmp_path):
    e0 = _tbl(
        [
            (0, "I", "c1", 0, "user", "a", "calc", "2025-01-01 00:00:00"),
            (1, "I", "c2", 0, "user", "b", "web", "2025-01-01 00:00:01"),
        ]
    )
    lake = _lake(tmp_path)
    _apply(lake, e0)
    v_predrop = lake.manifest.version
    lake.drop_column("tool")
    assert "tool" not in lake.read_local_table().column_names
    # time travel BEFORE the drop still shows the column and its data
    old = _sorted_df(lake.read_local_table_as_of(version=v_predrop))
    assert old["tool"].tolist() == ["calc", "web"]
    # re-add the same logical name: fresh physical, no resurrection
    e1 = _tbl([(2, "U", "c1", 0, "user", "a2", "numpy", "2025-01-01 00:00:02")])
    _apply(lake, e1)
    got = _sorted_df(lake.read_local_table()).set_index("conv_id")
    assert got.loc["c1", "tool"] == "numpy"
    assert pd.isna(got.loc["c2", "tool"])  # dropped 'web' did NOT come back
    # physical allocation is fresh (storage column name differs)
    cm = lake.manifest.column_mapping
    assert cm["logical"]["tool"] != "tool"


def test_system_and_conflict_guards(tmp_path):
    lake = _lake(tmp_path)
    _apply(lake, _tbl([(0, "I", "c1", 0, "u", "x", "t", "2025-01-01")]))
    for bad in ("conv_id", "turn_idx", "ts", "op", "offset"):
        with pytest.raises(ValueError):
            lake.rename_column(bad, "zzz")
        with pytest.raises(ValueError):
            lake.drop_column(bad)
    with pytest.raises(KeyError):
        lake.rename_column("nope", "x")
    with pytest.raises(ValueError):
        lake.rename_column("tool", "text")  # collides with a live logical
    with pytest.raises(KeyError):
        lake.drop_column("nope")


def test_change_feed_and_lookups_present_logical(tmp_path):
    epochs = split_epochs(gen_changes(3_000, 150, seed=35), 3)
    lake = _lake(tmp_path)
    _apply(lake, epochs[0])
    _apply(lake, epochs[1])
    lake.rename_column("tool", "tool_label")
    _apply(lake, _renamed(epochs[2], "tool", "tool_label"))
    feed = lake.change_feed(from_epoch=1, to_epoch=2, include_preimage=True)
    names = feed.schema().names
    assert "tool_label" in names and "old_tool_label" in names
    assert "tool" not in names and "old_tool" not in names
    # point lookup and batch lookup
    some = lake.read_local_table().column("conv_id")[0].as_py()
    assert "tool_label" in lake.lookup(some).column_names
    assert "tool_label" in lake.lookup_many([some]).schema().names
    # export writes logical names
    dest = str(tmp_path / "export")
    lake.export_snapshot(dest)
    import pyarrow.parquet as pq
    import glob
    one = sorted(glob.glob(dest + "/part-*.parquet"))[0]
    assert "tool_label" in pq.read_schema(one).names


def test_restore_rolls_mapping_back(tmp_path):
    epochs = split_epochs(gen_changes(2_000, 100, seed=37), 2)
    lake = _lake(tmp_path)
    for e in epochs:
        _apply(lake, e)
    lake.rename_column("tool", "tool_label")
    assert "tool_label" in lake.read_local_table().column_names
    lake.restore(epoch=1)
    got = lake.read_local_table()
    assert "tool" in got.column_names and "tool_label" not in got.column_names
    want = _sorted_df(oracle_lake(*epochs))
    pd.testing.assert_frame_equal(
        _sorted_df(got), want[got.column_names], check_dtype=False
    )


def test_merge_into_and_snapshot_sync_accept_logical(tmp_path):
    e0 = _tbl(
        [
            (0, "I", "c1", 0, "user", "a", "calc", "2025-01-01 00:00:00"),
            (1, "I", "c2", 0, "user", "b", "web", "2025-01-01 00:00:01"),
        ]
    )
    lake = _lake(tmp_path)
    _apply(lake, e0)
    lake.rename_column("tool", "tool_label")
    src = pa.table(
        {
            "conv_id": pa.array(["c1"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "tool_label": pa.array(["sql"], pa.string()),
        }
    )
    lake.merge_into(src, "2025-06-01", when_not_matched="skip")
    got = _sorted_df(lake.read_local_table()).set_index("conv_id")
    assert got.loc["c1", "tool_label"] == "sql"
    assert got.loc["c2", "tool_label"] == "web"
    # the old logical name is rejected outright
    bad = _renamed(src, "tool_label", "tool")
    with pytest.raises(ValueError):
        lake.merge_into(bad, "2025-06-02", when_not_matched="skip")
    # snapshot_sync under logical names: desired state keeps c1, drops c2
    snap = pa.table(
        {
            "conv_id": pa.array(["c1"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array(["user"], pa.string()),
            "text": pa.array(["a2"], pa.string()),
            "tool_label": pa.array(["sql"], pa.string()),
        }
    )
    lake.snapshot_sync(snap, "2025-06-03")
    got = _sorted_df(lake.read_local_table())
    assert got["conv_id"].tolist() == ["c1"]
    assert got["text"].tolist() == ["a2"] and got["tool_label"].tolist() == ["sql"]


def test_streaming_ingest_respects_mapping(tmp_path):
    from dbt_customer360_ray.state.streaming import StreamingSession

    e0 = _tbl(
        [
            (0, "I", "c1", 0, "user", "a", "calc", "2025-01-01 00:00:00"),
            (1, "I", "c2", 0, "user", "b", "web", "2025-01-01 00:00:01"),
        ]
    )
    lake = _lake(tmp_path)
    _apply(lake, e0)
    lake.rename_column("tool", "tool_label")
    sess = StreamingSession(lake, pool_size=2)
    mb = _renamed(
        _tbl([(2, "U", "c1", 0, "user", "a2", "sql", "2025-01-01 00:00:02")]),
        "tool",
        "tool_label",
    )
    sess.ingest(mb)
    sess.checkpoint()
    sess.close()
    got = _sorted_df(lake.read_local_table()).set_index("conv_id")
    # streamed update landed in the SAME physical column
    assert got.loc["c1", "tool_label"] == "sql"
    assert got.loc["c2", "tool_label"] == "web"
    assert "tool" not in got.columns


def test_patch_mode_rename_column_level_lww(tmp_path):
    lake = _lake(tmp_path, merge_mode="patch")
    _apply(
        lake,
        _tbl([(0, "I", "c1", 0, "user", "a", "calc", "2025-01-01 00:00:00")]),
    )
    lake.rename_column("tool", "tool_label")
    # a PATCH carrying only the renamed column (null text/role = unchanged)
    patch = pa.table(
        {
            "offset": pa.array([1], pa.int64()),
            "op": pa.array(["P"], pa.string()),
            "conv_id": pa.array(["c1"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "role": pa.array([None], pa.string()),
            "text": pa.array([None], pa.string()),
            "tool_label": pa.array(["sql"], pa.string()),
            "ts": pa.array([pd.Timestamp("2025-01-01 00:00:05")], pa.timestamp("us")),
        }
    )
    _apply(lake, patch)
    got = lake.read_local_table().to_pandas().set_index("conv_id")
    # column-level LWW: text survives, the renamed column took the patch
    assert got.loc["c1", "text"] == "a"
    assert got.loc["c1", "tool_label"] == "sql"
