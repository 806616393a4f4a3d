"""Patch mode: partial-image upserts resolved by column-level LWW.

The reference's incremental merges always carry full post-images (dbt merge
updates every column); real binlog tails don't (Debezium partial images for
Postgres TOAST, Cassandra-style per-cell LWW). Three independent derivations
must agree: the engine's segmented reduceat kernels (functions/lww.py), the
sequential-application oracle (gen.oracle_patch_lake), and the per-column
QUALIFY SQL oracle (cdc_replay.patch_oracle_sql, exercised by the driver).
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dbt_customer360_ray.functions.lww import (
    drop_tombstones,
    lww_latest,
    patch_collapse,
    patch_latest,
)
from dbt_customer360_ray.gen import gen_changes, oracle_patch_lake, split_epochs
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")


def _events_table(n, seed, p_patch=0.35):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame(
        {
            "offset": np.arange(n, dtype=np.int64),
            "op": rng.choice(list("IUDP"), n, p=[0.3, 0.2, 0.15, 0.35]),
            "conv_id": [f"c{v}" for v in rng.integers(0, max(2, n // 8), n)],
            "turn_idx": rng.integers(0, 3, n).astype("int32"),
            "role": rng.choice(["user", "assistant", None], n),
            "text": rng.choice(["a", "b", "c", None], n),
            "tool": rng.choice(["t1", None], n),
            "ts": pd.to_datetime("2025-01-01")
            + pd.to_timedelta(rng.integers(0, max(2, n // 2), n), unit="s"),
        }
    )
    df.loc[df["op"] == "D", ["role", "text", "tool"]] = None
    return pa.Table.from_pandas(df, preserve_index=False)


def _resolve_df(t: pa.Table) -> pd.DataFrame:
    got = drop_tombstones(patch_latest(t)).to_pandas()
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    return got[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_patch_latest_matches_sequential_oracle():
    t = _events_table(5_000, seed=0)
    pd.testing.assert_frame_equal(
        _resolve_df(t), oracle_patch_lake(t), check_dtype=False
    )


def test_patch_latest_degenerates_to_lww_without_patches():
    t = gen_changes(4_000, 200, seed=42)  # I/U/D only
    a = drop_tombstones(patch_latest(t)).to_pandas()
    b = drop_tombstones(lww_latest(t)).to_pandas()
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        a[cols].sort_values(key).reset_index(drop=True),
        b[cols].sort_values(key).reset_index(drop=True),
    )


def test_full_image_resets_patched_column():
    # I(text=a, tool=NULL) → P(tool=x) → U(text=b, tool=NULL): the later full
    # image must reset tool to null even though the patch is newer than the I
    df = pd.DataFrame(
        {
            "offset": [0, 1, 2],
            "op": ["I", "P", "U"],
            "conv_id": ["c", "c", "c"],
            "turn_idx": pd.array([0, 0, 0], dtype="int32"),
            "role": ["user", None, "user"],
            "text": ["a", None, "b"],
            "tool": [None, "x", None],
            "ts": pd.to_datetime(["2025-01-01", "2025-01-02", "2025-01-03"]),
        }
    )
    out = _resolve_df(pa.Table.from_pandas(df, preserve_index=False))
    assert out.loc[0, "text"] == "b" and pd.isna(out.loc[0, "tool"])


def test_patch_after_delete_resurrects_partial_row():
    df = pd.DataFrame(
        {
            "offset": [0, 1, 2],
            "op": ["I", "D", "P"],
            "conv_id": ["c", "c", "c"],
            "turn_idx": pd.array([0, 0, 0], dtype="int32"),
            "role": ["user", None, None],
            "text": ["a", None, None],
            "tool": [None, None, "x"],
            "ts": pd.to_datetime(["2025-01-01", "2025-01-02", "2025-01-03"]),
        }
    )
    out = _resolve_df(pa.Table.from_pandas(df, preserve_index=False))
    # columns from before the delete must NOT survive; the patch's must
    assert len(out) == 1
    assert pd.isna(out.loc[0, "text"]) and out.loc[0, "tool"] == "x"


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(seed=st.integers(0, 10_000), cut_frac=st.floats(0.1, 0.9))
def test_collapse_is_associative(seed, cut_frac):
    """patch_collapse on any prefix must not change the final merge against an
    arbitrary suffix — the property that makes per-run GC + merge-at-read (and
    compaction of any run subset) sound."""
    t = _events_table(400, seed=seed)
    cut = max(1, int(t.num_rows * cut_frac))
    a, b = t.slice(0, cut), t.slice(cut)
    merged_gc = _resolve_df(pa.concat_tables([patch_collapse(a), b]))
    merged_raw = _resolve_df(pa.concat_tables([a, b]))
    pd.testing.assert_frame_equal(merged_gc, merged_raw)
    # and collapse is idempotent
    ca = patch_collapse(a)
    assert patch_collapse(ca).equals(ca)


def _patch_epochs(n_events=8_000, n_convs=250, seed=77):
    return split_epochs(
        gen_changes(n_events, n_convs, seed=seed, patch_frac=0.45), 3
    )


def test_engine_patch_replay_matches_oracle(tmp_path):
    epochs = _patch_epochs()
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8, merge_mode="patch")
    import ray.data

    for part in epochs:
        lake.apply(ray.data.from_arrow(part))
    want = oracle_patch_lake(*epochs)
    got_local = lake.read_local_table().to_pandas()
    pd.testing.assert_frame_equal(
        got_local[want.columns.tolist()], want, check_dtype=False
    )
    got_ds = (
        lake.read()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got_ds[want.columns.tolist()], want, check_dtype=False)


def test_engine_patch_survives_compaction_and_reopen(tmp_path):
    epochs = _patch_epochs(seed=78)
    lake = CdcLake(
        str(tmp_path / "lake"), num_partitions=8, merge_mode="patch", max_runs=1
    )
    import ray.data

    for part in epochs:
        lake.apply(ray.data.from_arrow(part))  # compacts after every epoch
    want = oracle_patch_lake(*epochs)
    cols = want.columns.tolist()
    pd.testing.assert_frame_equal(
        lake.read_local_table().to_pandas()[cols], want, check_dtype=False
    )
    # reopen WITHOUT the flag: merge_mode is persisted, reopen wins
    reopened = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    assert reopened.merge_mode == "patch"
    pd.testing.assert_frame_equal(
        reopened.read_local_table().to_pandas()[cols], want, check_dtype=False
    )


def test_patch_ops_quarantined_on_lww_lake(tmp_path):
    """A row-image lake must NOT silently drop or misapply partial images —
    'P' is an invalid op there and goes to the dead-letter queue."""
    import ray.data

    epochs = _patch_epochs(n_events=2_000, n_convs=100, seed=79)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)  # default lww
    m = lake.apply(ray.data.from_arrow(epochs[0]))
    assert m["events_quarantined"] > 0
    dl = lake.read_deadletter().to_pandas()
    assert (dl.loc[dl["op"] == "P", "dl_reason"] == "bad_op").all()
    assert (dl["op"] == "P").any()


def test_patch_lookup_and_headers_consistent(tmp_path):
    import ray.data

    epochs = _patch_epochs(n_events=4_000, n_convs=60, seed=80)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4, merge_mode="patch")
    for part in epochs:
        lake.apply(ray.data.from_arrow(part))
    state = lake.read_local_table().to_pandas()
    cid = state["conv_id"].iloc[0]
    got = lake.lookup(cid).to_pandas()
    want = state[state["conv_id"] == cid].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    heads = lake.conversation_headers().to_pandas().set_index("conv_id")
    g = state.groupby("conv_id")
    assert heads["n_turns"].sort_index().equals(g.size().astype("int64").sort_index())


def test_streaming_patch_ingest_matches_oracle(tmp_path):
    """Patch mode on the streaming actor-pool path: micro-batch tailing with
    memtable compaction, flushed at checkpoints — same column-level LWW state
    as the epoch path and the sequential oracle."""
    from dbt_customer360_ray.gen import oracle_patch_lake
    from dbt_customer360_ray.state.streaming import StreamingSession

    changes = gen_changes(6_000, 200, seed=81, patch_frac=0.45)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=6, merge_mode="patch")
    sess = StreamingSession(lake, pool_size=3)
    step = 500
    for i in range(0, changes.num_rows, step):
        sess.ingest(changes.slice(i, step))
        if (i // step) % 4 == 3:
            sess.checkpoint()
    sess.checkpoint()
    sess.close()
    want = oracle_patch_lake(changes)
    got = lake.read_local_table().to_pandas()
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )


def test_patch_crash_and_resume_mid_epoch(tmp_path):
    """Crash between run writes and the manifest commit on a PATCH lake: the
    rerun replays over the orphaned files and converges to the oracle (the
    patch run paths are deterministic, so orphans are overwritten
    byte-for-byte, exactly like the lww path)."""
    import ray.data

    from dbt_customer360_ray.gen import oracle_patch_lake

    epochs = _patch_epochs(n_events=5_000, n_convs=200, seed=83)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=6, merge_mode="patch")
    lake.apply(ray.data.from_arrow(epochs[0]))
    manifest_dir = tmp_path / "lake" / "_manifest"
    current = (manifest_dir / "CURRENT").read_text()
    lake.apply(ray.data.from_arrow(epochs[1]))
    (manifest_dir / "CURRENT").write_text(current)  # crash: revert the commit

    resumed = CdcLake(str(tmp_path / "lake"))  # merge_mode from CONFIG.json
    assert resumed.merge_mode == "patch"
    assert resumed.manifest.last_epoch == 0
    for part in epochs[1:]:
        resumed.apply(ray.data.from_arrow(part))
    want = oracle_patch_lake(*epochs)
    got = resumed.read_local_table().to_pandas()
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )
