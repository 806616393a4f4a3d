"""Streaming actor-pool ingest: micro-batch tail → checkpoint → converged lake
(SURVEY.md §5 items 2-3 for the streaming path)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dbt_customer360_ray.gen import gen_changes, oracle_lake, split_epochs
from dbt_customer360_ray.state.engine import CdcLake
from dbt_customer360_ray.state.streaming import StreamingSession

pytestmark = pytest.mark.usefixtures("ray_session")


def _micro_batches(table: pa.Table, n: int):
    bounds = np.linspace(0, table.num_rows, n + 1).astype(int)
    return [table.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n)]


def test_stream_matches_oracle_across_checkpoints(tmp_path):
    changes = gen_changes(6_000, 400, seed=37)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    sess = StreamingSession(lake, pool_size=3)
    batches = _micro_batches(changes, 10)
    for i, b in enumerate(batches):
        sess.ingest(b)
        if i % 4 == 3:
            m = sess.checkpoint()
            assert m["events_in"] > 0
    sess.checkpoint()
    sess.close()
    got = lake.read_local_table().to_pandas()
    want = oracle_lake(changes)
    got = got[want.columns.tolist()].sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_schema_evolution(tmp_path):
    changes = gen_changes(3_000, 200, seed=41)
    e0, e1 = split_epochs(changes, 2)  # e0 lacks `tool`
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    sess = StreamingSession(lake, pool_size=2)
    sess.ingest(e0)
    sess.checkpoint()
    sess.ingest(e1)
    sess.checkpoint()
    sess.close()
    got = lake.read_local_table().to_pandas()
    want = oracle_lake(e0, e1)
    got = got[want.columns.tolist()].sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_crash_resume_from_checkpoint(tmp_path):
    """Memtables lost between checkpoints; re-tail from committed offsets."""
    changes = gen_changes(4_000, 300, seed=43)
    b1, b2, b3 = _micro_batches(changes, 3)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    sess = StreamingSession(lake, pool_size=2)
    sess.ingest(b1)
    sess.checkpoint()
    sess.ingest(b2)  # never checkpointed → lost in the "crash"
    sess.close()

    resumed_lake = CdcLake(str(tmp_path / "lake"))
    cps = resumed_lake.checkpoints()
    max_committed = max(cps.values())
    assert max_committed < changes.num_rows - 1
    sess2 = StreamingSession(resumed_lake, pool_size=2)
    # re-tail everything after the LOWEST committed offset (overlap is fine:
    # offset dedup + LWW idempotence absorb replays)
    import pyarrow.compute as pc

    replay_from = min(cps.values())
    for b in (b1, b2, b3):
        remainder = b.filter(pc.greater(b.column("offset"), replay_from))
        if remainder.num_rows:
            sess2.ingest(remainder)
    sess2.checkpoint()
    sess2.close()
    got = resumed_lake.read_local_table().to_pandas()
    want = oracle_lake(changes)
    got = got[want.columns.tolist()].sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stream_metrics_not_double_counted(tmp_path):
    changes = gen_changes(2_000, 100, seed=47)
    b1, b2 = _micro_batches(changes, 2)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    sess = StreamingSession(lake, pool_size=2)
    sess.ingest(b1)
    m1 = sess.checkpoint()
    sess.ingest(b2)
    m2 = sess.checkpoint()
    sess.close()
    assert m1["events_in"] == b1.num_rows
    assert m2["events_in"] == b2.num_rows
    total = lake.metrics()
    assert total["events_in"] == changes.num_rows


def test_stream_oracle_sql_matches_session(tmp_path, monkeypatch):
    """stream_oracle_sql over the written stream fixture equals the
    actor-pool streaming session's converged lake."""
    import duckdb
    import pyarrow.parquet as pq

    from dbt_customer360_ray.pipelines import cdc_replay
    from dbt_customer360_ray.state.engine import CdcLake
    from dbt_customer360_ray.state.streaming import StreamingSession

    monkeypatch.setattr(cdc_replay, "FIXTURE_ROOT", str(tmp_path / "fx"))
    changes = pq.read_table(cdc_replay.stream_fixture_path(5_000, 400, seed=9))
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    sess = StreamingSession(lake, pool_size=2)
    sess.ingest(changes.slice(0, 2_500))
    sess.ingest(changes.slice(2_500))
    sess.checkpoint()
    sess.close()
    got = (
        lake.read_local_table()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    sql = cdc_replay._lww_sql(
        [
            'SELECT "offset", op, conv_id, turn_idx, role, text, tool, ts, '
            "0 AS epoch, file_row_number AS file_rn "
            f"FROM read_parquet('{cdc_replay.stream_fixture_path(5_000, 400, seed=9)}', file_row_number=true)"
        ]
    )
    want = (
        duckdb.sql(sql).df()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)
