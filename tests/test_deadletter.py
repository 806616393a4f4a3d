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
