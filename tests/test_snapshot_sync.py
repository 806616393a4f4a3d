"""snapshot_sync — MERGE-style full-snapshot re-sync (snapshot-diff CDC).

The reference's only refresh story is the full rebuild (``dbt run
--full-refresh``, /root/reference/dbt_project.yml:11); snapshot_sync expresses
it as a minimal incremental epoch: diff the desired snapshot against the
converged lake per partition, emit only I/U/D events, and run them through the
normal exactly-once apply path.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dbt_customer360_ray.gen import gen_changes, split_epochs
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")

SYNC = "2025-06-01 00:00:00"


def _replayed(tmp_path, n=6_000, convs=300, seed=11):
    import ray.data

    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    for part in split_epochs(gen_changes(n, convs, seed=seed), 3):
        lake.apply(ray.data.from_arrow(part))
    return lake


def _snapshot_from(state: pd.DataFrame) -> pa.Table:
    snap = state[state["turn_idx"] % 5 != 3][
        ["conv_id", "turn_idx", "role", "text", "tool"]
    ].copy()
    m = snap["role"] == "user"
    snap.loc[m, "text"] = snap.loc[m, "text"] + " [edited]"
    marker = pd.DataFrame({"conv_id": sorted(state["conv_id"].unique())})
    marker["turn_idx"] = np.int32(9999)
    marker["role"] = "system"
    marker["text"] = "snapshot marker"
    marker["tool"] = None
    snap = pd.concat([snap, marker], ignore_index=True)
    t = pa.Table.from_pandas(snap, preserve_index=False)
    return t.set_column(
        t.schema.get_field_index("turn_idx"),
        "turn_idx",
        t.column("turn_idx").cast(pa.int32()),
    )


def test_sync_converges_to_snapshot_with_ts_provenance(tmp_path):
    lake = _replayed(tmp_path)
    state = lake.read().to_pandas()
    snap_t = _snapshot_from(state)

    m = lake.snapshot_sync(snap_t, SYNC)
    assert m["events_in"] > 0 and m["deletes"] > 0 and m["upserts"] > 0

    post = lake.read().to_pandas()
    got = (
        post[["conv_id", "turn_idx", "role", "text", "tool"]]
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    want = (
        snap_t.to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)[got.columns]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # ts provenance: payload-identical rows keep their old ts; changed rows
    # (and inserts) carry the sync timestamp
    merged = post.merge(
        state, on=["conv_id", "turn_idx"], how="left", suffixes=("", "_old")
    )
    same = (
        (merged["role"] == merged["role_old"])
        & (merged["text"] == merged["text_old"])
        & (
            (merged["tool"] == merged["tool_old"])
            | (merged["tool"].isna() & merged["tool_old"].isna())
        )
    )
    assert (merged.loc[same, "ts"] == merged.loc[same, "ts_old"]).all()
    assert (merged.loc[~same, "ts"] == pd.Timestamp(SYNC)).all()


def test_resync_is_a_zero_event_epoch(tmp_path):
    lake = _replayed(tmp_path, n=3_000, convs=150, seed=13)
    snap_t = _snapshot_from(lake.read().to_pandas())
    lake.snapshot_sync(snap_t, SYNC)
    m2 = lake.snapshot_sync(snap_t, "2025-06-02 00:00:00")
    assert m2["events_in"] == 0 == m2["upserts"] == m2["deletes"]


def test_empty_snapshot_deletes_every_partition(tmp_path):
    """The sentinel path: partitions with an empty snapshot slice must still
    emit their deletes."""
    lake = _replayed(tmp_path, n=2_000, convs=120, seed=17)
    snap_t = _snapshot_from(lake.read().to_pandas())
    m = lake.snapshot_sync(snap_t.slice(0, 0), SYNC)
    assert m["deletes"] == m["events_in"] > 0
    assert lake.read().count() == 0


def test_initial_load_into_empty_lake(tmp_path):
    import ray.data

    src = _replayed(tmp_path / "src", n=2_000, convs=120, seed=19)
    snap_t = _snapshot_from(src.read().to_pandas())
    lake = CdcLake(str(tmp_path / "fresh"), num_partitions=4)
    m = lake.snapshot_sync(ray.data.from_arrow(snap_t), SYNC)
    assert m["events_in"] == snap_t.num_rows == lake.read().count()
    assert (lake.read().to_pandas()["ts"] == pd.Timestamp(SYNC)).all()


def test_sync_ts_must_beat_committed_ts(tmp_path):
    lake = _replayed(tmp_path, n=1_000, convs=60, seed=23)
    snap_t = _snapshot_from(lake.read().to_pandas())
    with pytest.raises(ValueError, match="sync_ts"):
        lake.snapshot_sync(snap_t, "2024-01-01 00:00:00")


def test_snapshot_schema_is_validated(tmp_path):
    lake = _replayed(tmp_path, n=1_000, convs=60, seed=29)
    snap_t = _snapshot_from(lake.read().to_pandas())
    with pytest.raises(ValueError, match="columns"):
        lake.snapshot_sync(snap_t.drop_columns(["tool"]), SYNC)
    with pytest.raises(ValueError, match="duplicate"):
        lake.snapshot_sync(
            pa.concat_tables([snap_t, snap_t.slice(0, 5)]), SYNC
        )


def test_sync_is_change_feed_visible(tmp_path):
    """The sync epoch commits through the normal manifest path, so the change
    feed across it reports exactly the diff the kernel emitted."""
    lake = _replayed(tmp_path, n=2_000, convs=100, seed=31)
    pre_epoch = lake.manifest.last_epoch
    snap_t = _snapshot_from(lake.read().to_pandas())
    m = lake.snapshot_sync(snap_t, SYNC)
    feed = lake.change_feed(from_epoch=pre_epoch, to_epoch=pre_epoch + 1).to_pandas()
    assert len(feed) == m["events_in"]
    assert (feed["change_type"] == "delete").sum() == m["deletes"]
