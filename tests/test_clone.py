"""Shallow clone: metadata-only lake copy sharing data files by absolute
reference — independent manifests, divergent writes, clone-local vacuum."""

import glob
import os

import pandas as pd
import pytest

from dbt_customer360_ray.gen import gen_changes, oracle_lake, split_epochs
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")


def _state(lake) -> pd.DataFrame:
    df = lake.read_local_table().to_pandas()
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )


def _oracle(*tables) -> pd.DataFrame:
    df = pd.DataFrame(oracle_lake(*tables))
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(
        drop=True
    )


def test_clone_is_metadata_only_and_diverges(tmp_path):
    import ray.data

    changes = gen_changes(3_000, 200, seed=81)
    epochs = split_epochs(changes, 3)
    src = CdcLake(str(tmp_path / "src"), num_partitions=8)
    src.apply(ray.data.from_arrow(epochs[0]))
    src.apply(ray.data.from_arrow(epochs[1]))

    clone = src.clone(str(tmp_path / "clone"))
    # zero data files copied
    assert glob.glob(str(tmp_path / "clone" / "data" / "**" / "*.parquet"),
                     recursive=True) == []
    want01 = _oracle(*epochs[:2])
    got = _state(clone)
    pd.testing.assert_frame_equal(got[want01.columns.tolist()], want01,
                                  check_dtype=False)

    # divergence: epoch 2 lands only on the clone
    clone.apply(ray.data.from_arrow(epochs[2]))
    want012 = _oracle(*epochs)
    got = _state(clone)
    pd.testing.assert_frame_equal(got[want012.columns.tolist()], want012,
                                  check_dtype=False)
    # source untouched
    assert src.manifest.last_epoch == 1
    pd.testing.assert_frame_equal(
        _state(src)[want01.columns.tolist()], want01, check_dtype=False
    )
    # clone's new run files live under the clone, not the source
    new_files = glob.glob(str(tmp_path / "clone" / "data" / "**" / "*.parquet"),
                          recursive=True)
    assert new_files


def test_clone_time_travels_and_resumes_exactly_once(tmp_path):
    import ray.data

    changes = gen_changes(2_000, 150, seed=82)
    epochs = split_epochs(changes, 2)
    src = CdcLake(str(tmp_path / "src"), num_partitions=4)
    src.apply(ray.data.from_arrow(epochs[0]))
    src.apply(ray.data.from_arrow(epochs[1]))
    clone = src.clone(str(tmp_path / "clone"))
    # version log came along: epoch-0 snapshot readable on the clone
    asof = clone.read_as_of(epoch=0).to_pandas().sort_values(
        ["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    want0 = _oracle(epochs[0])
    # the epoch-0 snapshot keeps its own (pre-evolution) schema: no `tool`
    shared = [c for c in want0.columns if c in asof.columns]
    assert "tool" not in asof.columns
    pd.testing.assert_frame_equal(asof[shared], want0[shared], check_dtype=False)
    # exactly-once epoch line: re-applying a committed epoch dedups fully
    m = clone.apply(ray.data.from_arrow(epochs[1]))
    assert m["events_deduped"] == m["events_in"] > 0


def test_clone_vacuum_never_touches_source_files(tmp_path):
    import ray.data

    changes = gen_changes(1_500, 100, seed=83)
    src = CdcLake(str(tmp_path / "src"), num_partitions=4)
    src.apply(ray.data.from_arrow(changes))
    src_files = set(
        glob.glob(str(tmp_path / "src" / "data" / "**" / "*.parquet"),
                  recursive=True)
    )
    clone = src.clone(str(tmp_path / "clone"))
    # severing: rewrite ALL live state (even single-run partitions) under
    # the clone's own dir...
    clone.compact(force=True, rewrite_single=True)
    clone.vacuum()
    # ...and vacuum reclaimed nothing of the source
    assert set(
        glob.glob(str(tmp_path / "src" / "data" / "**" / "*.parquet"),
                  recursive=True)
    ) == src_files
    want = _oracle(changes)
    pd.testing.assert_frame_equal(
        _state(clone)[want.columns.tolist()], want, check_dtype=False
    )
    # post-compaction the clone no longer references any source file
    live = clone.manifest.live_files()
    assert all(os.path.abspath(p).startswith(str(tmp_path / "clone"))
               for p in live)


def test_clone_refuses_existing_lake_and_self(tmp_path):
    import ray.data

    changes = gen_changes(500, 40, seed=84)
    src = CdcLake(str(tmp_path / "src"), num_partitions=2)
    src.apply(ray.data.from_arrow(changes))
    src.clone(str(tmp_path / "clone"))
    with pytest.raises(ValueError, match="already a lake"):
        src.clone(str(tmp_path / "clone"))
    with pytest.raises(ValueError, match="source lake"):
        src.clone(str(tmp_path / "src"))


def test_clone_carries_merge_mode_and_constraints(tmp_path):
    import ray.data

    changes = gen_changes(1_000, 80, seed=85)
    src = CdcLake(str(tmp_path / "src"), num_partitions=4)
    src.add_check_constraint(
        "role_allowed", "role", "in", ["user", "assistant", "system", "tool"]
    )
    src.apply(ray.data.from_arrow(changes))
    clone = src.clone(str(tmp_path / "clone"))
    assert [c["name"] for c in clone.manifest.constraints] == ["role_allowed"]


def test_describe_history_stamps_operations(tmp_path):
    import ray.data

    changes = gen_changes(1_200, 80, seed=86)
    epochs = split_epochs(changes, 2)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4, max_runs=1_000)
    lake.apply(ray.data.from_arrow(epochs[0]))
    lake.apply(ray.data.from_arrow(epochs[1]))
    lake.compact(force=True)
    lake.rename_column("text", "body")
    lake.add_check_constraint("turn_nonneg", "turn_idx", ">=", 0)
    lake.restore(epoch=1)
    h = lake.describe_history().to_pandas()
    assert h["operation"].tolist() == [
        "APPLY", "APPLY", "COMPACT", "SCHEMA_CHANGE", "SET_CONSTRAINTS",
        "RESTORE",
    ]
    assert h["version"].tolist() == [1, 2, 3, 4, 5, 6]
    assert h.loc[0, "epoch"] == 0 and h.loc[1, "epoch"] == 1
    raw = pd.concat([e.to_pandas() for e in epochs])
    assert int(h.loc[:1, "events_in"].sum()) == len(raw)
    # a re-applied epoch after restore shows up as a fresh APPLY with full dedup
    m = lake.apply(ray.data.from_arrow(epochs[1]))
    h2 = lake.describe_history().to_pandas()
    assert h2["operation"].tolist()[-1] == "APPLY"
    assert m["events_in"] == h2.iloc[-1]["events_in"]


def test_merge_branch_converges_to_union_replay(tmp_path):
    import ray.data

    changes = gen_changes(4_000, 250, seed=87)
    epochs = split_epochs(changes, 4)
    parent = CdcLake(str(tmp_path / "parent"), num_partitions=8)
    parent.apply(ray.data.from_arrow(epochs[0]))
    parent.apply(ray.data.from_arrow(epochs[1]))
    fork_version = parent.manifest.version

    branch = parent.clone(str(tmp_path / "branch"))
    parent.apply(ray.data.from_arrow(epochs[2]))
    branch.apply(ray.data.from_arrow(epochs[3]))

    res = parent.merge_branch(branch, fork_version=fork_version)
    assert res["merged_runs"] > 0

    # merged state == one lake that applied all four epochs
    want = _oracle(*epochs)
    got = _state(parent)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want,
                                  check_dtype=False)
    # the branch itself is untouched by the merge
    want_b = _oracle(epochs[0], epochs[1], epochs[3])
    pd.testing.assert_frame_equal(
        _state(branch)[want_b.columns.tolist()], want_b, check_dtype=False
    )
    # checkpoints advanced: replaying the branch's epoch fully dedupes
    m = parent.apply(ray.data.from_arrow(epochs[3]))
    assert m["events_deduped"] == m["events_in"] > 0

    # merge is metadata-only: no branch data bytes copied under the parent
    merged_abs = [
        p for p in parent.manifest.live_files()
        if str(tmp_path / "branch") in p
    ]
    assert merged_abs, "expected by-reference runs from the branch"
    for p in merged_abs:
        assert os.path.exists(p)


def test_merge_branch_refuses_mismatched_lakes(tmp_path):
    import ray.data

    changes = gen_changes(1_000, 60, seed=88)
    epochs = split_epochs(changes, 2)
    a = CdcLake(str(tmp_path / "a"), num_partitions=8)
    a.apply(ray.data.from_arrow(epochs[0]))
    other_p = CdcLake(str(tmp_path / "b"), num_partitions=4)
    other_p.apply(ray.data.from_arrow(epochs[1]))
    with pytest.raises(ValueError, match="partition counts"):
        a.merge_branch(other_p)

    # column mapping on either side is refused
    branch = a.clone(str(tmp_path / "c"))
    branch.apply(ray.data.from_arrow(epochs[1]))
    branch.rename_column("tool", "tool_label")
    with pytest.raises(ValueError, match="column-mapping"):
        a.merge_branch(branch)


def test_wap_publishes_clean_and_rejects_poison(tmp_path):
    import pyarrow as pa
    import ray.data

    changes = gen_changes(4_000, 250, seed=29)
    epochs = split_epochs(changes, 4)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    for e in epochs[:3]:
        lake.apply(ray.data.from_arrow(e))
    audits = [
        {"name": "role_domain", "column": "role", "op": "in",
         "value": ["user", "assistant", "system", "tool"]},
        {"name": "ts_present", "column": "ts", "op": "not_null"},
    ]
    v_before = lake.manifest.version

    r = lake.write_audit_publish(
        ray.data.from_arrow(epochs[3]), audits,
        branch_dir=str(tmp_path / "b1"),
    )
    assert r["published"] and set(r["violations"].values()) == {0}
    want = _oracle(*epochs)
    pd.testing.assert_frame_equal(_state(lake)[want.columns.tolist()], want)

    # a poisoned epoch (out-of-domain role, fresh offsets) is staged, audited,
    # and rejected — the parent state and version log are untouched
    df = epochs[3].to_pandas()
    img = df["op"].isin(["I", "U"])
    df.loc[img, "role"] = "robot"
    df["offset"] = df["offset"] + 10_000_000
    v_pub = lake.manifest.version
    r2 = lake.write_audit_publish(
        ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
        audits, branch_dir=str(tmp_path / "b2"),
    )
    assert not r2["published"]
    assert r2["violations"]["role_domain"] > 0
    assert lake.manifest.version == v_pub > v_before
    want = _oracle(*epochs)
    pd.testing.assert_frame_equal(_state(lake)[want.columns.tolist()], want)
    # the abandoned branch is inspectable: its staged state holds the poison
    staged = CdcLake(str(tmp_path / "b2"), num_partitions=8).read_local_table()
    assert "robot" in set(staged.column("role").to_pylist())

    # exactly-once survives publish: redelivering the published epoch directly
    # on the parent fully dedupes
    m = lake.apply(ray.data.from_arrow(epochs[3]))
    assert m["events_deduped"] == m["events_in"]
    want = _oracle(*epochs)
    pd.testing.assert_frame_equal(_state(lake)[want.columns.tolist()], want)


def test_audit_state_counts_exact_violations(tmp_path):
    import ray.data

    changes = gen_changes(2_000, 120, seed=31)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    lake.apply(ray.data.from_arrow(changes))
    st = _state(lake)
    got = lake.audit_state(
        [
            {"name": "no_short", "column": "text", "op": "matches", "value": "."},
            {"name": "role_user_only", "column": "role", "op": "==", "value": "user"},
        ]
    )
    # CHECK semantics: null passes; definitive violations only
    want_role = int((st.role.notna() & st.role.ne("user")).sum())
    assert got["role_user_only"] == want_role
    assert got["no_short"] == int((st.text.notna() & st.text.eq("")).sum())


def test_clone_mutators_never_write_into_source_dir(tmp_path):
    """DV deletes, backfills and purges on a SHALLOW CLONE must land their
    rewrites under the CLONE's data dir — the clone references source files
    by absolute path, and deriving output names from those paths verbatim
    would drop files into the source lake (which its vacuum would treat as
    orphans)."""
    import ray.data

    changes = gen_changes(3_000, 200, seed=83)
    epochs = split_epochs(changes, 3)
    src = CdcLake(str(tmp_path / "src"), num_partitions=8)
    for part in epochs:
        src.apply(ray.data.from_arrow(part))
    src_files = set(glob.glob(str(tmp_path / "src" / "data" / "**"), recursive=True))
    src_before = _state(src)

    clone = src.clone(str(tmp_path / "clone"))
    m = clone.delete_where(
        {"name": "t", "column": "role", "op": "==", "value": "tool"}, mode="dv"
    )
    assert m["rows_masked"] > 0
    clone.add_computed_column("text_len", "length", "text")
    clone.backfill_computed()
    victim = src_before.conv_id.iloc[0]
    clone.purge_key(victim, rewrite=True)

    # the source's data dir gained nothing and its state is untouched
    assert (
        set(glob.glob(str(tmp_path / "src" / "data" / "**"), recursive=True))
        == src_files
    )
    pd.testing.assert_frame_equal(_state(src), src_before)
    # the clone serves all three mutations
    got = _state(clone)
    assert not got.role.eq("tool").any()
    assert "text_len" in got.columns
    assert victim not in set(got.conv_id)
    # every clone-side run file lives under the clone
    for pid in range(clone.P):
        for run in clone.manifest.partition(pid)["runs"]:
            p = os.path.join(clone.lake_dir, run["path"])
            if not os.path.isabs(run["path"]):
                assert os.path.abspath(p).startswith(
                    os.path.abspath(str(tmp_path / "clone"))
                )
