"""Transaction-boundary atomicity (Debezium transaction-metadata contract).

The reference's incremental models implicitly assume warehouse loads are
transactionally consistent; a binlog tail does not get that for free — an
epoch boundary can cut an upstream transaction in half. ``apply_transactional``
makes visible ONLY transactions whose events are all present (txn_id/txn_n
stream metadata), parking cut transactions in a manifest-committed ``pending/``
sidecar that replays — through the applier's exempt-offsets dedup bypass, since
checkpoints have advanced past the parked offsets — once the remainder arrives.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dbt_customer360_ray.gen import gen_changes, oracle_lake
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")


def _with_txn(t: pa.Table, group: int, total: int) -> pa.Table:
    """Append Debezium-style transaction metadata: txn_id = offset // group,
    txn_n = the transaction's TRUE total event count over the whole stream."""
    off = t.column("offset").to_numpy(zero_copy_only=False)
    txn = off // group
    n = np.minimum(group, total - txn * group).astype(np.int64)
    return t.append_column("txn_id", pa.array(txn, pa.int64())).append_column(
        "txn_n", pa.array(n, pa.int64())
    )


def _apply_txn(lake, table):
    import ray.data

    return lake.apply_transactional(ray.data.from_arrow(table))


def _state(lake) -> pd.DataFrame:
    return (
        lake.read_local_table()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )


def _want(*tables) -> pd.DataFrame:
    return oracle_lake(*tables).reset_index(drop=True)


def _assert_eq(lake, *tables):
    got = _state(lake)
    want = _want(*tables)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)


def test_cut_transaction_held_then_applied(tmp_path):
    N, G = 1_000, 5
    changes = gen_changes(N, 60, seed=41)
    # cut txn 99 (offsets 495-499): epoch 0 carries only its first 3 events
    e0, e1 = changes.slice(0, 498), changes.slice(498)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    m0 = _apply_txn(lake, _with_txn(e0, G, N))
    assert m0["held_txns"] == 1 and m0["held_events"] == 3
    assert lake.manifest.pending_txns[0]["rows"] == 3
    # visible state = complete transactions only (offsets 0..494)
    _assert_eq(lake, changes.slice(0, 495))
    # txn metadata never reaches the lake schema
    assert "txn_id" not in lake.read_local_table().column_names

    m1 = _apply_txn(lake, _with_txn(e1, G, N))
    assert m1["held_txns"] == 0 and lake.manifest.pending_txns == []
    # the parked offsets (below the advanced checkpoint) replayed exactly once
    _assert_eq(lake, changes)


def test_transaction_spanning_three_epochs(tmp_path):
    N, G = 200, 50
    changes = gen_changes(N, 20, seed=43)
    slices = [changes.slice(0, 120), changes.slice(120, 20), changes.slice(140)]
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    m0 = _apply_txn(lake, _with_txn(slices[0], G, N))
    assert m0["held_txns"] == 1 and m0["held_events"] == 20  # txn 2: 100-119
    _assert_eq(lake, changes.slice(0, 100))
    m1 = _apply_txn(lake, _with_txn(slices[1], G, N))
    assert m1["held_txns"] == 1 and m1["held_events"] == 40  # txn 2: 100-139
    _assert_eq(lake, changes.slice(0, 100))  # still invisible
    m2 = _apply_txn(lake, _with_txn(slices[2], G, N))
    assert m2["held_txns"] == 0
    _assert_eq(lake, changes)


def test_epoch_with_no_complete_transaction(tmp_path):
    N, G = 100, 50
    changes = gen_changes(N, 10, seed=45)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    _apply_txn(lake, _with_txn(changes.slice(0, 50), G, N))  # txn 0 complete
    before = _state(lake)
    # next epoch is ONLY a prefix of txn 1: zero visible change, all parked
    m = _apply_txn(lake, _with_txn(changes.slice(50, 30), G, N))
    assert m["held_events"] == 30 and m["events_in"] == 0
    pd.testing.assert_frame_equal(_state(lake), before)
    _apply_txn(lake, _with_txn(changes.slice(80), G, N))
    _assert_eq(lake, changes)


def test_crash_resume_replays_pending_exactly_once(tmp_path):
    N, G = 600, 5
    changes = gen_changes(N, 40, seed=47)
    e0, e1 = changes.slice(0, 303), changes.slice(303)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    _apply_txn(lake, _with_txn(e0, G, N))
    cur = os.path.join(str(tmp_path / "lake"), "_manifest", "CURRENT")
    with open(cur) as f:
        v_after_e0 = f.read()
    _apply_txn(lake, _with_txn(e1, G, N))
    _assert_eq(lake, changes)
    # crash: roll CURRENT back to the post-e0 commit, reopen, re-apply e1 —
    # the pending sidecar is referenced again and must replay exactly once
    with open(cur, "w") as f:
        f.write(v_after_e0)
    lake2 = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    assert lake2.manifest.pending_txns != []
    _apply_txn(lake2, _with_txn(e1, G, N))
    _assert_eq(lake2, changes)


def test_vacuum_reclaims_consumed_sidecars(tmp_path):
    N, G = 300, 5
    changes = gen_changes(N, 30, seed=49)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    _apply_txn(lake, _with_txn(changes.slice(0, 152), G, N))
    _apply_txn(lake, _with_txn(changes.slice(152), G, N))
    pend_dir = os.path.join(str(tmp_path / "lake"), "pending")
    assert os.listdir(pend_dir)  # consumed sidecar kept until vacuum
    lake.vacuum()
    assert os.listdir(pend_dir) == []
    _assert_eq(lake, changes)


def test_missing_txn_metadata_raises(tmp_path):
    import ray.data

    changes = gen_changes(50, 5, seed=51)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=2)
    with pytest.raises(ValueError, match="txn_id"):
        lake.apply_transactional(ray.data.from_arrow(changes))


def _stream_session(lake, **kw):
    from dbt_customer360_ray.state.streaming import StreamingSession

    return StreamingSession(lake, pool_size=2, txn_boundaries=True, **kw)


def test_streaming_txn_holdback_and_release(tmp_path):
    N, G = 400, 5
    changes = gen_changes(N, 30, seed=53)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    sess = _stream_session(lake)
    # first micro-batch cuts txn 40 (offsets 200-204) after 3 events
    sess.ingest(_with_txn(changes.slice(0, 203), G, N))
    m0 = sess.checkpoint()
    assert m0["held_txns"] == 1 and m0["held_events"] == 3
    assert lake.manifest.pending_txns[0]["rows"] == 3
    _assert_eq(lake, changes.slice(0, 200))
    # remainder arrives: the held transaction releases and applies
    sess.ingest(_with_txn(changes.slice(203), G, N))
    m1 = sess.checkpoint()
    sess.close()
    assert m1["held_txns"] == 0 and lake.manifest.pending_txns == []
    _assert_eq(lake, changes)


def test_streaming_txn_completes_within_interval(tmp_path):
    # a transaction split across micro-batches but completed BEFORE the
    # checkpoint releases immediately and never becomes a sidecar
    N, G = 100, 10
    changes = gen_changes(N, 10, seed=55)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    sess = _stream_session(lake)
    sess.ingest(_with_txn(changes.slice(0, 55), G, N))
    sess.ingest(_with_txn(changes.slice(55, 45), G, N))
    m = sess.checkpoint()
    sess.close()
    assert m["held_txns"] == 0 and lake.manifest.pending_txns == []
    _assert_eq(lake, changes)


def test_streaming_txn_resume_reloads_sidecar(tmp_path):
    N, G = 300, 5
    changes = gen_changes(N, 20, seed=57)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    sess = _stream_session(lake)
    sess.ingest(_with_txn(changes.slice(0, 152), G, N))
    sess.checkpoint()
    sess.close()  # crash/stop: holdback survives only via the sidecar
    _assert_eq(lake, changes.slice(0, 150))
    lake2 = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    sess2 = _stream_session(lake2)
    sess2.ingest(_with_txn(changes.slice(152), G, N))
    sess2.checkpoint()
    sess2.close()
    assert lake2.manifest.pending_txns == []
    _assert_eq(lake2, changes)


def test_streaming_txn_redelivery_is_deduped(tmp_path):
    N, G = 200, 5
    changes = gen_changes(N, 15, seed=59)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    sess = _stream_session(lake)
    sess.ingest(_with_txn(changes.slice(0, 103), G, N))
    sess.checkpoint()
    # the producer retries: the whole first window again, plus the rest —
    # parked and applied events must both dedup, completion stays exact
    sess.ingest(_with_txn(changes, G, N))
    m = sess.checkpoint()
    sess.close()
    assert m["held_txns"] == 0 and lake.manifest.pending_txns == []
    _assert_eq(lake, changes)
