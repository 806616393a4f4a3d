"""Time-travel reads and the change-data-feed (CDC-out) over the manifest log.

The reference has no history at all (every run overwrites its tables,
/root/reference/dbt_project.yml:11); snapshot reads and a CDF are the lake-side
features its users lose by full-refreshing, re-expressed here over the retained
MANIFEST-<version>.json files (SURVEY.md §7 step 4's exactly-once log doubles
as the Delta/Iceberg-style version log)."""

import numpy as np
import pandas as pd
import pytest

from dbt_customer360_ray.gen import gen_changes, oracle_lake, split_epochs
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")


def _replay(tmp_path, epochs, **lake_kwargs):
    import ray.data

    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8, **lake_kwargs)
    for part in epochs:
        lake.apply(ray.data.from_arrow(part))
    return lake


def _prefix_oracle(epochs, upto):
    return oracle_lake(*epochs[: upto + 1])


def _assert_state(got_tbl, want_df):
    got = got_tbl.to_pandas()
    # epoch-0 snapshots predate the `tool` column; the oracle then carries all
    # nulls for it — compare on the snapshot's own columns and check that
    cols = got.columns.tolist()
    if "tool" not in cols:
        assert want_df["tool"].isna().all()
    got = got[cols].sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want_df[cols], check_dtype=False)


def test_read_as_of_every_epoch(tmp_path):
    changes = gen_changes(8_000, 400, seed=21)
    epochs = split_epochs(changes, 4)  # epoch 0 is schema v0 (no tool)
    lake = _replay(tmp_path, epochs)
    for e in range(4):
        _assert_state(lake.read_local_table_as_of(epoch=e), _prefix_oracle(epochs, e))
    # epoch-0 snapshot exposes the v0 schema (time travel includes the schema)
    assert "tool" not in lake.read_local_table_as_of(epoch=0).column_names
    # the Dataset read path agrees with the local path
    ds = lake.read_as_of(epoch=1).to_pandas()
    _assert_state(lake.read_local_table_as_of(epoch=1), _prefix_oracle(epochs, 1))
    assert len(ds) == lake.read_local_table_as_of(epoch=1).num_rows


def test_read_as_of_survives_compaction(tmp_path):
    changes = gen_changes(6_000, 300, seed=23)
    epochs = split_epochs(changes, 3)
    lake = _replay(tmp_path, epochs, max_runs=1)  # compact after every epoch
    # compaction bumped versions between epochs; old snapshots still resolve
    for e in range(3):
        _assert_state(lake.read_local_table_as_of(epoch=e), _prefix_oracle(epochs, e))


def test_vacuum_is_the_retention_horizon(tmp_path):
    changes = gen_changes(4_000, 200, seed=25)
    epochs = split_epochs(changes, 2)
    lake = _replay(tmp_path, epochs)
    lake.compact(force=True)
    lake.vacuum()
    # current state unaffected; pre-compaction snapshot files are gone
    _assert_state(lake.read_local_table(), _prefix_oracle(epochs, 1))
    with pytest.raises(FileNotFoundError):
        lake.read_local_table_as_of(epoch=0)


def _bruteforce_feed(state_a: pd.DataFrame, state_b: pd.DataFrame) -> pd.DataFrame:
    key = ["conv_id", "turn_idx"]
    payload = [c for c in state_b.columns if c not in key]
    m = state_a.merge(state_b, on=key, how="outer", suffixes=("__a", ""), indicator=True)
    ins = (m["_merge"] == "right_only").to_numpy()
    dele = (m["_merge"] == "left_only").to_numpy()
    changed = np.zeros(len(m), dtype=bool)
    for c in payload:
        x, y = m[f"{c}__a"], m[c]
        changed |= ((x != y) & ~(x.isna() & y.isna())).to_numpy()
    upd = (m["_merge"] == "both").to_numpy() & changed
    out = m.loc[ins | dele | upd, key + payload].copy()
    out.insert(0, "change_type", np.where(ins[ins | dele | upd], "insert",
                                          np.where(upd[ins | dele | upd], "update", "delete")))
    for c in payload:
        out.loc[out["change_type"] == "delete", c] = None
    return out.sort_values(key, kind="stable").reset_index(drop=True)


def _norm_feed(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df.sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
        .astype({"turn_idx": "int64"})
    )


def test_change_feed_matches_bruteforce(tmp_path):
    changes = gen_changes(8_000, 300, seed=27)  # small conv pool → many U/D hits
    epochs = split_epochs(changes, 4)
    lake = _replay(tmp_path, epochs)
    # from a v0-schema epoch: the diff must null-backfill `tool` on the FROM
    # side and classify a null→value tool transition as an update
    got = _norm_feed(lake.change_feed(from_epoch=0, to_epoch=2).to_pandas())
    want = _norm_feed(_bruteforce_feed(_prefix_oracle(epochs, 0), _prefix_oracle(epochs, 2)))
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)
    assert set(got["change_type"]) <= {"insert", "update", "delete"}
    assert (got["change_type"] == "update").any()
    assert (got["change_type"] == "delete").any()


def test_change_feed_from_empty_is_full_snapshot(tmp_path):
    changes = gen_changes(3_000, 200, seed=29)
    epochs = split_epochs(changes, 2)
    lake = _replay(tmp_path, epochs)
    feed = _norm_feed(lake.change_feed(from_version=0, to_epoch=1).to_pandas())
    assert (feed["change_type"] == "insert").all()
    state = _prefix_oracle(epochs, 1)
    assert len(feed) == len(state)
    pd.testing.assert_frame_equal(
        feed[["conv_id", "turn_idx", "text"]],
        _norm_feed(state)[["conv_id", "turn_idx", "text"]],
        check_dtype=False,
    )


def test_change_feed_identical_snapshots_is_empty(tmp_path):
    changes = gen_changes(2_000, 150, seed=31)
    lake = _replay(tmp_path, [changes])
    assert lake.change_feed(from_epoch=0, to_epoch=0).count() == 0


def test_lookup_reads_only_owner_partition(tmp_path):
    changes = gen_changes(5_000, 120, seed=33)  # small conv pool → multi-turn convs
    lake = _replay(tmp_path, split_epochs(changes, 3))
    full = lake.read_local_table().to_pandas()
    some = full["conv_id"].drop_duplicates().head(5)
    for cid in some:
        got = lake.lookup(cid).to_pandas()
        want = full[full["conv_id"] == cid].reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert lake.lookup("conv-nonexistent").num_rows == 0


def test_read_with_column_pruning(tmp_path):
    changes = gen_changes(4_000, 250, seed=35)
    epochs = split_epochs(changes, 3)  # epoch 0 lacks `tool`
    lake = _replay(tmp_path, epochs)
    full = lake.read().to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pruned = (
        lake.read(columns=["text", "tool"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert list(pruned.columns) == ["conv_id", "turn_idx", "text", "tool"]
    pd.testing.assert_frame_equal(pruned, full[pruned.columns.tolist()], check_dtype=False)
    with pytest.raises(KeyError):
        lake.read(columns=["nope"])
    # snapshot read prunes too
    snap = lake.read_as_of(epoch=1, columns=["role"]).to_pandas()
    assert list(snap.columns) == ["conv_id", "turn_idx", "role"]


def test_conversation_headers_match_state(tmp_path):
    changes = gen_changes(5_000, 150, seed=37)
    epochs = split_epochs(changes, 3)
    lake = _replay(tmp_path, epochs)
    heads = (
        lake.conversation_headers()
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    state = lake.read_local_table().to_pandas()
    g = state.groupby("conv_id", sort=True)
    assert (heads.set_index("conv_id")["n_turns"] == g.size()).all()
    assert (heads.set_index("conv_id")["n_tool_turns"] == g["tool"].count()).all()
    assert (heads.set_index("conv_id")["first_ts"] == g["ts"].min()).all()
    assert (heads.set_index("conv_id")["last_ts"] == g["ts"].max()).all()
    # time-traveled header table reflects the snapshot, not the head
    h0 = lake.conversation_headers(epoch=0).to_pandas()
    s0 = _prefix_oracle(epochs, 0)
    assert h0["n_turns"].sum() == len(s0)


def test_time_bounded_read_prunes_runs(tmp_path):
    """Stats-based data skipping: a lower ts bound must skip whole runs via
    the manifest's per-run ts_max and still return exactly the filtered
    converged state (soundness argument in CdcLake._read_manifest)."""
    changes = gen_changes(8_000, 400, seed=21)
    epochs = split_epochs(changes, 4)
    lake = _replay(tmp_path, epochs)
    full = lake.read().to_pandas()
    cut = full["ts"].quantile(0.7)
    got = (
        lake.read(since_ts=cut)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    assert lake.last_read_stats["runs_pruned"] > 0
    want = (
        full[full["ts"] >= cut]
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # both bounds; the upper bound filters but never prunes
    hi = full["ts"].quantile(0.9)
    got2 = lake.read(since_ts=cut, until_ts=hi).to_pandas()
    assert len(got2) == ((full["ts"] >= cut) & (full["ts"] <= hi)).sum()
    only_hi = lake.read(until_ts=hi)
    assert lake.last_read_stats["runs_pruned"] == 0
    assert only_hi.count() == (full["ts"] <= hi).sum()


def test_time_bounded_read_survives_compaction_and_pruning(tmp_path):
    changes = gen_changes(6_000, 300, seed=23)
    epochs = split_epochs(changes, 4)
    lake = _replay(tmp_path, epochs)
    full = lake.read().to_pandas()
    cut = full["ts"].quantile(0.5)
    want = len(full[full["ts"] >= cut])
    lake.compact(force=True)  # base runs re-derive their ts stats
    assert lake.read(since_ts=cut).count() == want
    for p in range(lake.P):
        for run in lake.manifest.partition(p)["runs"]:
            assert "ts_min" in run and run["ts_min"] <= run["ts_max"]
    # column pruning composes with the time bound (ts rides along internally)
    got = lake.read(columns=["role"], since_ts=cut).to_pandas()
    assert len(got) == want and set(got.columns) == {"conv_id", "turn_idx", "role"}


def test_restore_rolls_back_to_snapshot(tmp_path):
    changes = gen_changes(6_000, 300, seed=31)
    epochs = split_epochs(changes, 3)
    lake = _replay(tmp_path, epochs)
    pre_restore_version = lake.manifest.version
    v = lake.restore(epoch=1)
    assert v == pre_restore_version + 1  # rollback is a forward commit
    # current state == the epoch-1 snapshot
    _assert_state(lake.read_local_table(), _prefix_oracle(epochs, 1))
    _assert_state(lake.read().to_pandas().pipe(_df_to_table), _prefix_oracle(epochs, 1))
    # history preserved: the pre-restore version is still time-travelable
    _assert_state(
        lake.read_local_table_as_of(version=pre_restore_version),
        _prefix_oracle(epochs, 2),
    )


def _df_to_table(df):
    import pyarrow as pa

    return pa.Table.from_pandas(df, preserve_index=False)


def test_restore_is_resumable(tmp_path):
    """Checkpoints roll back with the data: re-applying the undone epochs is
    NOT skipped by exactly-once and re-converges to the full-replay state."""
    import ray.data

    changes = gen_changes(6_000, 300, seed=33)
    epochs = split_epochs(changes, 3)
    lake = _replay(tmp_path, epochs)
    lake.restore(epoch=0)
    # max_offset checkpoints rolled back to epoch 0's range
    first_undone = epochs[1].column("offset")[0].as_py()
    assert max(lake.checkpoints().values()) < first_undone
    for part in epochs[1:]:
        lake.apply(ray.data.from_arrow(part))
    _assert_state(lake.read_local_table(), oracle_lake(*epochs))


def test_vacuum_after_restore_keeps_restored_files(tmp_path):
    changes = gen_changes(6_000, 300, seed=35)
    epochs = split_epochs(changes, 3)
    lake = _replay(tmp_path, epochs)
    lake.restore(epoch=1)
    removed = lake.vacuum()
    assert removed > 0  # the undone epoch's runs are reclaimed
    _assert_state(lake.read_local_table(), _prefix_oracle(epochs, 1))


def test_change_feed_preimages_match_bruteforce(tmp_path):
    """include_preimage=True: every update/delete carries the FROM side's
    payload as old_*; inserts carry nulls there. The classification and
    post-images must be identical to the plain feed."""
    changes = gen_changes(8_000, 300, seed=27)
    epochs = split_epochs(changes, 4)
    lake = _replay(tmp_path, epochs)
    got = _norm_feed(
        lake.change_feed(from_epoch=0, to_epoch=2, include_preimage=True).to_pandas()
    )
    plain = _norm_feed(lake.change_feed(from_epoch=0, to_epoch=2).to_pandas())
    pd.testing.assert_frame_equal(got[plain.columns], plain, check_dtype=False)
    a = _prefix_oracle(epochs, 0).set_index(["conv_id", "turn_idx"])
    # deletes and updates: old_* equals the FROM state's payload row
    for _, r in got[got["change_type"] != "insert"].head(50).iterrows():
        src = a.loc[(r["conv_id"], r["turn_idx"])]
        for c in ("role", "text", "ts"):
            assert (pd.isna(r[f"old_{c}"]) and pd.isna(src[c])) or r[f"old_{c}"] == src[c]
    # inserts: no pre-image
    ins = got[got["change_type"] == "insert"]
    assert ins["old_role"].isna().all() and ins["old_ts"].isna().all()


def test_read_as_of_offset_binlog_position(tmp_path):
    """Binlog-position time travel: read_as_of(offset=…) resolves the newest
    snapshot whose committed watermark is ≤ the position."""
    changes = gen_changes(6_000, 300, seed=41)
    epochs = split_epochs(changes, 3)
    lake = _replay(tmp_path, epochs)
    # position exactly at each epoch's end → that epoch's snapshot
    for e in range(3):
        end = int(
            max(max(t.column("offset").to_pylist()) for t in epochs[: e + 1])
        )
        _assert_state(
            lake.read_local_table_as_of(offset=end), _prefix_oracle(epochs, e)
        )
        # a position strictly inside the NEXT epoch still resolves to e
        if e < 2:
            _assert_state(
                lake.read_local_table_as_of(offset=end + 1),
                _prefix_oracle(epochs, e),
            )
    with pytest.raises(KeyError):
        lake.read_local_table_as_of(offset=-1)
    ds_len = lake.read_as_of(offset=6_000_000).to_pandas()
    assert len(ds_len) == lake.read_local_table().num_rows


def test_named_consumer_cursor_at_least_once(tmp_path):
    changes = gen_changes(4_000, 200, seed=61)
    epochs = split_epochs(changes, 4)
    lake = _replay(tmp_path, epochs[:2])
    # first window: the whole lake as inserts (cursor starts at version 0)
    feed1, tok1 = lake.consume_changes("sink")
    n1 = feed1.count()
    assert n1 == lake.read_local_table().num_rows
    # re-consume BEFORE ack: the same window again (at-least-once downstream)
    feed1b, tok1b = lake.consume_changes("sink")
    assert feed1b.count() == n1 and tok1b == tok1
    lake.ack_changes(tok1)
    # nothing new: the next window is empty
    feed_empty, tok_e = lake.consume_changes("sink")
    assert feed_empty.count() == 0
    # stale/duplicate ack never moves the cursor backwards
    lake.ack_changes(tok1)
    assert lake.manifest.consumers["sink"] == tok_e["from_version"]
    # new epochs: the next window equals the snapshot diff
    import ray.data

    for part in epochs[2:]:
        lake.apply(ray.data.from_arrow(part))
    feed2, tok2 = lake.consume_changes("sink")
    want = lake.change_feed(
        from_version=tok2["from_version"], to_version=tok2["to_version"]
    )
    got = feed2.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = want.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # a second consumer is independent: still sees everything from scratch
    feed_other, _ = lake.consume_changes("other")
    assert feed_other.count() == lake.read_local_table().num_rows


def test_named_tags_alias_versions(tmp_path):
    import ray.data

    from dbt_customer360_ray.gen import gen_changes, oracle_lake, split_epochs

    changes = gen_changes(1_500, 100, seed=91)
    epochs = split_epochs(changes, 2)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply(ray.data.from_arrow(epochs[0]))
    v_before = lake.manifest.version
    lake.tag("after-e0")
    lake.apply(ray.data.from_arrow(epochs[1]))
    assert lake.tags() == {"after-e0": v_before}
    # tags are aliases, not commits
    got = (
        lake.read_as_of(tag="after-e0").to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    want = pd.DataFrame(oracle_lake(epochs[0])).sort_values(
        ["conv_id", "turn_idx"]).reset_index(drop=True)
    shared = [c for c in want.columns if c in got.columns]
    pd.testing.assert_frame_equal(got[shared], want[shared], check_dtype=False)
    with pytest.raises(ValueError, match="already exists"):
        lake.tag("after-e0")
    with pytest.raises(KeyError):
        lake.read_as_of(tag="nope")
    lake.untag("after-e0")
    assert lake.tags() == {}
    with pytest.raises(KeyError):
        lake.untag("after-e0")


def test_expire_snapshots_trims_log_but_serves(tmp_path):
    import pytest as _pytest
    import ray.data

    from dbt_customer360_ray.gen import gen_changes, split_epochs
    from dbt_customer360_ray.state.engine import CdcLake

    epochs = split_epochs(gen_changes(2_000, 120, seed=97), 3)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    for e in epochs:
        lake.apply(ray.data.from_arrow(e))
    before = lake.read().to_pandas()

    removed = lake.expire_snapshots(keep_last=1)
    assert removed > 0
    lake.vacuum()

    # current reads unchanged; fsck clean; sub-horizon travel raises clearly
    after = lake.read().to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(
        after.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        before.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
    )
    assert lake.fsck()["ok"]
    with _pytest.raises(KeyError, match="expired"):
        lake.read_as_of(epoch=0)
    # history still enumerable (expired versions surface as UNKNOWN)
    h = lake.describe_history().to_pandas()
    assert len(h) == lake.manifest.version
    assert (h["operation"] == "UNKNOWN").sum() == removed
    with _pytest.raises(ValueError, match="keep_last"):
        lake.expire_snapshots(keep_last=0)
