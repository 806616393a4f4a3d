"""Dead-letter queue: malformed change events are quarantined, not applied.

A binlog tail always carries some malformed rows (null keys, unparseable ops);
the north rule's lineage/metrics surface extends naturally to a DLQ: invalid
rows route to a dedicated quarantine group (skey = P*S), land under
``deadletter/`` with a reason, count in the manifest metrics, and never touch
partition state or checkpoints."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dbt_customer360_ray.gen import gen_changes, oracle_lake
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")


def _corrupt(changes: pa.Table) -> tuple[pa.Table, int]:
    """Inject malformed rows: bad op, null conv_id, null ts, null turn_idx."""
    df = changes.to_pandas()
    df.loc[3, "op"] = "X"
    df.loc[7, "conv_id"] = None
    df.loc[11, "ts"] = pd.NaT
    df.loc[13, "turn_idx"] = None
    bad_idx = [3, 7, 11, 13]
    out = pa.Table.from_pandas(df, preserve_index=False)
    out = out.set_column(
        out.schema.get_field_index("turn_idx"),
        "turn_idx",
        out.column("turn_idx").cast(pa.int32()),
    )
    return out, len(bad_idx)


@pytest.mark.parametrize("exchange", [True, False])
def test_malformed_events_quarantined(tmp_path, exchange):
    import ray.data

    changes = gen_changes(2_000, 150, seed=41)
    corrupted, n_bad = _corrupt(changes)
    lake = CdcLake(str(tmp_path / f"lake-{exchange}"), num_partitions=8, exchange=exchange)
    m = lake.apply(ray.data.from_arrow(corrupted))
    assert m["events_quarantined"] == n_bad
    assert lake.metrics()["events_quarantined"] == n_bad

    # lake state equals the oracle over only the VALID rows
    valid = corrupted.to_pandas().drop(index=[3, 7, 11, 13])
    want = oracle_lake(pa.Table.from_pandas(valid, preserve_index=False))
    got = lake.read_local_table().to_pandas()
    got = (
        got[want.columns.tolist()]
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # the DLQ carries the rows with reasons
    dl = lake.read_deadletter().to_pandas()
    assert len(dl) == n_bad
    assert set(dl["dl_reason"]) == {"bad_op", "null_key", "null_ts"}


def test_clean_stream_has_empty_dlq(tmp_path):
    import ray.data

    changes = gen_changes(1_000, 100, seed=43)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    m = lake.apply(ray.data.from_arrow(changes))
    assert m["events_quarantined"] == 0
    assert lake.read_deadletter().num_rows == 0
    assert "deadletter" not in lake.manifest._state


def test_quarantine_is_idempotent_on_replay(tmp_path):
    import ray.data

    changes = gen_changes(1_500, 100, seed=47)
    corrupted, n_bad = _corrupt(changes)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply(ray.data.from_arrow(corrupted), epoch=0)
    # re-applying the committed epoch is a no-op (manifest-level skip)
    m = lake.apply(ray.data.from_arrow(corrupted), epoch=0)
    assert m.get("skipped") is True
    assert lake.metrics()["events_quarantined"] == n_bad
    assert len(lake.manifest._state["deadletter"]) == 1


def test_streaming_ingest_quarantines(tmp_path):
    from dbt_customer360_ray.state.streaming import StreamingSession

    changes = gen_changes(2_000, 150, seed=53)
    corrupted, n_bad = _corrupt(changes)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    sess = StreamingSession(lake, pool_size=2)
    half = corrupted.num_rows // 2
    sess.ingest(corrupted.slice(0, half))
    sess.ingest(corrupted.slice(half))
    m = sess.checkpoint()
    sess.close()
    assert m["events_quarantined"] == n_bad
    assert lake.metrics()["events_quarantined"] == n_bad

    valid = corrupted.to_pandas().drop(index=[3, 7, 11, 13])
    want = oracle_lake(pa.Table.from_pandas(valid, preserve_index=False))
    got = lake.read_local_table().to_pandas()
    got = (
        got[want.columns.tolist()]
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    dl = lake.read_deadletter().to_pandas()
    assert len(dl) == n_bad and set(dl["dl_reason"]) == {"bad_op", "null_key", "null_ts"}


def test_allowed_lateness_quarantines_below_watermark(tmp_path):
    """Events with ts < (watermark − lateness) at apply time go to the DLQ as
    'too_late'; the watermark (max committed ts, from run stats) only advances
    with applied events, and epoch 0 has no watermark yet."""
    import ray.data

    from dbt_customer360_ray.gen import gen_changes, split_epochs
    from dbt_customer360_ray.state.engine import CdcLake

    epochs = split_epochs(gen_changes(8_000, 400, seed=21), 4)
    L = pd.Timedelta("30 minutes")
    lake = CdcLake(
        str(tmp_path / "lake"), num_partitions=8, allowed_lateness="30 minutes"
    )
    metrics = [lake.apply(ray.data.from_arrow(p)) for p in epochs]
    assert metrics[0]["events_quarantined"] == 0  # no watermark before epoch 0
    assert sum(m["events_quarantined"] for m in metrics[1:]) > 0

    # python mirror of the per-epoch watermark
    w = None
    late_all = []
    for df in (p.to_pandas() for p in epochs):
        cutoff = (w - L) if w is not None else None
        is_late = (
            (df["ts"] < cutoff) if cutoff is not None else pd.Series(False, df.index)
        )
        late_all.append(df[is_late])
        mx = df.loc[~is_late, "ts"].max()
        if pd.notna(mx):
            w = mx if w is None else max(w, mx)
    want = pd.concat(late_all).sort_values("offset").reset_index(drop=True)
    got = lake.read_deadletter().to_pandas().sort_values("offset").reset_index(drop=True)
    assert (got["dl_reason"] == "too_late").all()
    assert got["offset"].tolist() == want["offset"].tolist()

    # quarantined events never reach partition state
    state = lake.read().to_pandas()
    merged = state.merge(
        got[["conv_id", "turn_idx", "offset"]],
        on=["conv_id", "turn_idx"],
        how="inner",
    )
    # a late event's (ts, offset) may still exist as a key via other events,
    # but the exact quarantined offsets must not be the winners - spot check:
    # without lateness the state differs
    base = CdcLake(str(tmp_path / "base"), num_partitions=8)
    for p in epochs:
        base.apply(ray.data.from_arrow(p))
    assert len(base.read_deadletter().to_pandas()) == 0
    assert not base.read().to_pandas().equals(state)


def test_streaming_lateness_frozen_per_checkpoint_interval(tmp_path):
    """Streaming path: the late cutoff is the committed watermark − lateness,
    frozen across the micro-batches of a checkpoint interval and refreshed
    only after each commit — so the same stream chunked differently is still
    deterministic per (micro-batch, checkpoint) sequence."""
    import ray.data

    from dbt_customer360_ray.gen import gen_changes, split_epochs
    from dbt_customer360_ray.state.engine import CdcLake
    from dbt_customer360_ray.state.streaming import StreamingSession

    batches = split_epochs(gen_changes(6_000, 300, seed=33), 12)
    L = pd.Timedelta("30 minutes")
    lake = CdcLake(
        str(tmp_path / "lake"), num_partitions=8, allowed_lateness="30 minutes"
    )
    sess = StreamingSession(lake, pool_size=2)
    quarantined = 0
    for i, b in enumerate(batches):
        sess.ingest(b)
        if i % 3 == 2:  # checkpoint every 3 micro-batches
            quarantined += sess.checkpoint()["events_quarantined"]
    quarantined += sess.checkpoint()["events_quarantined"]
    sess.close()

    # python mirror: cutoff frozen per interval, watermark advances on commit
    w = None
    late_all = []
    for i0 in range(0, len(batches), 3):
        cutoff = (w - L) if w is not None else None
        for df in (b.to_pandas() for b in batches[i0 : i0 + 3]):
            is_late = (
                (df["ts"] < cutoff)
                if cutoff is not None
                else pd.Series(False, df.index)
            )
            late_all.append(df[is_late])
            mx = df.loc[~is_late, "ts"].max()
            if pd.notna(mx):
                w = mx if w is None else max(w, mx)
    want = pd.concat(late_all).sort_values("offset").reset_index(drop=True)
    assert quarantined > 0 and quarantined == len(want)
    got = (
        lake.read_deadletter().to_pandas().sort_values("offset").reset_index(drop=True)
    )
    assert (got["dl_reason"] == "too_late").all()
    assert got["offset"].tolist() == want["offset"].tolist()


def test_lateness_reason_priority_and_malformed_mix(tmp_path):
    """A row that is both malformed and late keeps the malformed reason."""
    import ray.data

    from dbt_customer360_ray.state.engine import CdcLake

    lake = CdcLake(
        str(tmp_path / "lake"), num_partitions=4, allowed_lateness="1 minutes"
    )
    base = pa.table(
        {
            "offset": pa.array([0, 1], pa.int64()),
            "op": ["I", "I"],
            "conv_id": ["a", "b"],
            "turn_idx": pa.array([0, 0], pa.int32()),
            "role": ["user", "user"],
            "text": ["x", "y"],
            "tool": pa.nulls(2, pa.string()),
            "ts": pa.array(
                [pd.Timestamp("2025-01-01 10:00"), pd.Timestamp("2025-01-01 10:00")]
            ).cast(pa.timestamp("us")),
        }
    )
    lake.apply(ray.data.from_arrow(base))
    nxt = pa.table(
        {
            "offset": pa.array([2, 3, 4], pa.int64()),
            "op": ["I", "I", None],
            "conv_id": ["a", "c", "d"],
            "turn_idx": pa.array([1, 0, 0], pa.int32()),
            "role": ["user"] * 3,
            "text": ["fresh", "stale", "stale-and-bad"],
            "tool": pa.nulls(3, pa.string()),
            "ts": pa.array(
                [
                    pd.Timestamp("2025-01-01 10:05"),
                    pd.Timestamp("2025-01-01 09:00"),
                    pd.Timestamp("2025-01-01 09:00"),
                ]
            ).cast(pa.timestamp("us")),
        }
    )
    m = lake.apply(ray.data.from_arrow(nxt))
    assert m["events_quarantined"] == 2
    dl = lake.read_deadletter().to_pandas().set_index("offset")
    assert dl.loc[3, "dl_reason"] == "too_late"
    assert dl.loc[4, "dl_reason"] == "bad_op"  # malformed wins over late
    state = lake.read().to_pandas()
    assert set(state["text"]) == {"x", "y", "fresh"}


def test_retry_deadletter_repairs_and_drains(tmp_path, ray_session):
    """DLQ repair loop: fix the quarantined rows (fill null keys/offsets/ops),
    re-apply them as a normal epoch, manifest drains, files become vacuumable."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from dbt_customer360_ray.gen import gen_changes
    from dbt_customer360_ray.state.engine import CdcLake

    changes = gen_changes(3_000, 150, seed=91).to_pandas()
    i = np.arange(len(changes))
    changes.loc[i % 41 == 5, "op"] = "Z"
    changes["offset"] = changes["offset"].astype("Int64")
    changes.loc[i % 43 == 7, "offset"] = None
    t = pa.Table.from_pandas(changes, preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("turn_idx"), "turn_idx",
        t.column("turn_idx").cast(pa.int32()),
    )
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    m = lake.apply(ray.data.from_arrow(t))
    assert m["events_quarantined"] > 0
    assert lake.fsck()["ok"]

    watermark = max(lake.checkpoints().values())

    def fix(rows: pa.Table) -> pa.Table:
        df = rows.to_pandas()
        df.loc[df["op"] == "Z", "op"] = "U"  # the producer meant an update
        need = df["offset"].isna()
        df.loc[need, "offset"] = watermark + 1 + np.arange(int(need.sum()))
        df["offset"] = df["offset"].astype("int64")
        out = pa.Table.from_pandas(df, preserve_index=False)
        return out.set_column(
            out.schema.get_field_index("turn_idx"), "turn_idx",
            out.column("turn_idx").cast(pa.int32()),
        )

    r = lake.retry_deadletter(fix)
    assert r["repaired"] == m["events_quarantined"]
    assert lake.read_deadletter().num_rows == 0  # drained
    assert lake.manifest._state.get("deadletter", []) == []
    removed = lake.vacuum()
    assert removed >= 1  # the drained quarantine file is reclaimable
    assert lake.fsck()["ok"]
    # repaired rows are actually IN the lake now
    state = lake.read_local_table().to_pandas()
    assert len(state) > 0


def test_fsck_detects_missing_and_mismatched_runs(tmp_path, ray_session):
    import os

    import pyarrow.parquet as pq
    import ray.data

    from dbt_customer360_ray.gen import gen_changes
    from dbt_customer360_ray.state.engine import CdcLake

    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply(ray.data.from_arrow(gen_changes(2_000, 100, seed=93)))
    assert lake.fsck()["ok"]
    # corrupt: truncate one run, delete another
    files = lake.manifest.live_files()
    victim, gone = files[0], files[1]
    t = pq.read_table(victim)
    pq.write_table(t.slice(0, max(1, t.num_rows // 2)), victim)
    os.remove(gone)
    rep = lake.fsck()
    assert not rep["ok"]
    assert len(rep["row_mismatches"]) == 1
    assert len(rep["missing_files"]) == 1
