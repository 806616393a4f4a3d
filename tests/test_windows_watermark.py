"""Tumbling event-time windows with watermark finalization: per-(window, op)
applied-event counts folded into the manifest per commit, finalized when the
lateness watermark passes the window end — the streaming emit-on-watermark
contract on both ingest paths."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dbt_customer360_ray.state.engine import CdcLake
from dbt_customer360_ray.state.streaming import StreamingSession

pytestmark = pytest.mark.usefixtures("ray_session")

TS0 = pd.Timestamp("2025-01-01")
MIN = pd.Timedelta("1 minute")


def _ev(rows, start_offset=0):
    """rows: (op, conv, turn, minutes)"""
    return pa.table(
        {
            "offset": pa.array(
                np.arange(start_offset, start_offset + len(rows), dtype=np.int64)
            ),
            "op": pa.array([r[0] for r in rows]),
            "conv_id": pa.array([r[1] for r in rows]),
            "turn_idx": pa.array([r[2] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows)),
            "text": pa.array(["x"] * len(rows)),
            "ts": pa.array([TS0 + r[3] * MIN for r in rows]),
        }
    )


def _counts(lake, final_only=False):
    df = lake.window_counts(final_only=final_only).to_pandas()
    return {
        (int((r.window_start - TS0).total_seconds() // 60), r.op): (int(r.n), bool(r.final))
        for r in df.itertuples()
    }


def test_window_requires_lateness(tmp_path):
    with pytest.raises(ValueError, match="allowed_lateness"):
        CdcLake(str(tmp_path / "w"), window="1 minute")
    lake = CdcLake(str(tmp_path / "l"), num_partitions=2)
    with pytest.raises(ValueError, match="without window"):
        lake.window_counts()


def test_window_counts_fold_and_finalize(tmp_path):
    import ray.data

    lake = CdcLake(
        str(tmp_path / "lake"), num_partitions=4,
        window="1 minute", allowed_lateness="2 minutes",
    )
    lake.apply(ray.data.from_arrow(_ev([
        ("I", "a", 0, 0.5), ("I", "a", 1, 0.6),   # window 0
        ("I", "b", 0, 1.5),                        # window 1
        ("U", "a", 0, 5.0),                        # window 5 (sets watermark)
    ])))
    c = _counts(lake)
    # watermark 5.0 min − 2 min lateness = 3.0 → windows ending ≤ 3 min final
    assert c == {(0, "I"): (2, True), (1, "I"): (1, True), (5, "U"): (1, False)}
    assert set(_counts(lake, final_only=True)) == {(0, "I"), (1, "I")}

    # second epoch: an on-time event folds into an OPEN window; a too-late
    # event (below 5.0 − 2 min) is quarantined and never counted
    lake.apply(ray.data.from_arrow(_ev([
        ("D", "b", 0, 5.2),
        ("U", "a", 1, 0.9),   # ts in a FINAL window → quarantined, not counted
    ], start_offset=10)))
    c = _counts(lake)
    assert c[(5, "D")] == (1, False)
    assert (0, "U") not in c and c[(0, "I")] == (2, True)  # final rows frozen
    assert lake.metrics()["events_quarantined"] == 1


def test_intra_epoch_duplicate_offsets_counted_once(tmp_path):
    import ray.data

    base = _ev([("I", "a", 0, 0.1), ("I", "b", 0, 0.2)])
    dup = pa.concat_tables([base, base.slice(0, 1)])  # offset 0 delivered twice
    lake = CdcLake(
        str(tmp_path / "lake"), num_partitions=2,
        window="1 minute", allowed_lateness="1 minute",
    )
    m = lake.apply(ray.data.from_arrow(dup))
    assert m["events_deduped"] == 1 and m["upserts"] == 2
    assert _counts(lake) == {(0, "I"): (2, False)}


def test_restore_rolls_window_counts_back(tmp_path):
    import ray.data

    lake = CdcLake(
        str(tmp_path / "lake"), num_partitions=2,
        window="1 minute", allowed_lateness="10 minutes",
    )
    lake.apply(ray.data.from_arrow(_ev([("I", "a", 0, 0.1)])))
    c0 = _counts(lake)
    lake.apply(ray.data.from_arrow(_ev([("I", "a", 1, 1.1)], start_offset=5)))
    assert _counts(lake) != c0
    lake.restore(epoch=0)
    assert _counts(lake) == c0


def test_streaming_path_matches_epoch_path(tmp_path):
    import ray.data

    rows = [("I", f"c{i % 7}", i, (i * 7 % 40) / 10) for i in range(60)]
    rows += [("D", "c1", 1, 4.5), ("U", "c2", 2, 4.6)]
    t = _ev(rows)
    epoch_lake = CdcLake(
        str(tmp_path / "ep"), num_partitions=4,
        window="1 minute", allowed_lateness="2 minutes",
    )
    epoch_lake.apply(ray.data.from_arrow(t))

    stream_lake = CdcLake(
        str(tmp_path / "st"), num_partitions=4,
        window="1 minute", allowed_lateness="2 minutes",
    )
    sess = StreamingSession(stream_lake, pool_size=2)
    for lo in range(0, t.num_rows, 17):
        sess.ingest(t.slice(lo, 17))
    sess.checkpoint()
    sess.close()
    pd.testing.assert_frame_equal(
        epoch_lake.window_counts().to_pandas(),
        stream_lake.window_counts().to_pandas(),
    )
    # a redelivered micro-batch within the NEXT interval is fully deduped
    sess2 = StreamingSession(stream_lake, pool_size=2)
    sess2.ingest(t.slice(0, 17))
    sess2.ingest(t.slice(0, 17))  # intra-interval redelivery
    m = sess2.checkpoint()
    sess2.close()
    # every redelivered event is either deduped (on-time) or quarantined
    # (now below the advanced watermark) — none is applied or counted twice
    assert m["events_deduped"] + m["events_quarantined"] == m["events_in"]
    pd.testing.assert_frame_equal(
        epoch_lake.window_counts().to_pandas(),
        stream_lake.window_counts().to_pandas(),
    )


def test_full_compaction_gcs_tombstones_under_lateness(tmp_path):
    """With a lateness watermark, full compaction physically drops tombstones
    below (watermark − lateness): nothing older survives for them to mask, a
    redelivery is offset-deduped, and a new event that old is quarantined —
    so the live state is provably unchanged (gc_grace rule)."""
    import pyarrow.parquet as pq
    import ray.data

    lake = CdcLake(
        str(tmp_path / "lake"), num_partitions=2,
        allowed_lateness="1 minute",
    )
    lake.apply(ray.data.from_arrow(_ev([("I", "a", 0, 0.0), ("I", "b", 0, 0.1)])))
    lake.apply(ray.data.from_arrow(_ev([("D", "a", 0, 0.2)], start_offset=10)))
    # advance the watermark far past the tombstone + lateness
    lake.apply(ray.data.from_arrow(_ev([("I", "c", 0, 30.0)], start_offset=20)))
    assert lake.compact(force=True, policy="full") > 0
    live = pd.concat(
        [pq.read_table(p).to_pandas() for p in lake.manifest.live_files()]
    )
    assert not (live["op"] == "D").any()  # tombstone physically gone
    state = lake.read().to_pandas().sort_values("conv_id")
    assert list(state["conv_id"]) == ["b", "c"]
    # a resurrect attempt below the watermark cutoff is quarantined, not applied
    m = lake.apply(ray.data.from_arrow(_ev([("I", "a", 0, 0.3)], start_offset=30)))
    assert m["events_quarantined"] == 1
    assert list(lake.read().to_pandas().sort_values("conv_id")["conv_id"]) == ["b", "c"]

    # without a lateness bound, tombstones are never GC'd
    plain = CdcLake(str(tmp_path / "plain"), num_partitions=2)
    plain.apply(ray.data.from_arrow(_ev([("I", "a", 0, 0.0)])))
    plain.apply(ray.data.from_arrow(_ev([("D", "a", 0, 0.2)], start_offset=10)))
    plain.compact(force=True, policy="full")
    live = pd.concat(
        [pq.read_table(p).to_pandas() for p in plain.manifest.live_files()]
    )
    assert (live["op"] == "D").sum() == 1
