"""Debezium-style JSONL change-stream source: the JSON envelope decode must
replay to the exact same converged state as the native parquet path."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dbt_customer360_ray.gen import gen_changes, split_epochs
from dbt_customer360_ray.sources.binlog_json import (
    changes_to_debezium_jsonl,
    read_debezium_jsonl,
)
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")


def test_envelope_roundtrip_exact(tmp_path):
    changes = gen_changes(3_000, 200, seed=83)
    path = changes_to_debezium_jsonl(changes, str(tmp_path / "tail.jsonl"))
    got = (
        read_debezium_jsonl(path, schema=changes.schema)
        .to_pandas()
        .sort_values("offset", kind="stable")
        .reset_index(drop=True)
    )
    want = (
        changes.to_pandas().sort_values("offset", kind="stable").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)


def test_jsonl_replay_converges_like_parquet(tmp_path):
    import ray.data

    epochs = split_epochs(gen_changes(6_000, 300, seed=89), 3)
    pq_lake = CdcLake(str(tmp_path / "pq"), num_partitions=8)
    js_lake = CdcLake(str(tmp_path / "js"), num_partitions=8)
    for i, part in enumerate(epochs):
        pq_lake.apply(ray.data.from_arrow(part))
        path = changes_to_debezium_jsonl(part, str(tmp_path / f"e{i}.jsonl"))
        js_lake.apply(read_debezium_jsonl(path, schema=part.schema))
    a = pq_lake.read_local_table().to_pandas()
    b = js_lake.read_local_table().to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_decode_rejects_missing_image_column(tmp_path):
    changes = gen_changes(500, 50, seed=97)
    path = changes_to_debezium_jsonl(changes, str(tmp_path / "t.jsonl"))
    bad = pa.schema(list(changes.schema) + [pa.field("bogus", pa.string())])
    with pytest.raises(Exception):
        read_debezium_jsonl(path, schema=bad).materialize()


def test_egress_roundtrip_reconstructs_state(tmp_path, ray_session):
    """export_change_feed_jsonl ∘ read_debezium_jsonl is the identity on lake
    state: two position segments (incl. update/delete envelopes) re-ingested
    into a fresh lake converge to the original, even under equal-ts LWW ties
    (the segment bases keep downstream offsets feed-ordered)."""
    import tempfile

    import pandas as pd
    import ray.data

    from dbt_customer360_ray.gen import gen_changes
    from dbt_customer360_ray.sources.binlog_json import (
        export_change_feed_jsonl,
        read_debezium_jsonl,
    )
    from dbt_customer360_ray.state.engine import CdcLake

    lake = CdcLake(str(tmp_path / "src"), num_partitions=4)
    changes = gen_changes(4_000, 250, seed=77)
    half = changes.num_rows // 2
    lake.apply(ray.data.from_arrow(changes.slice(0, half)))
    lake.apply(ray.data.from_arrow(changes.slice(half)))

    d1 = export_change_feed_jsonl(
        lake, str(tmp_path / "seg1"), pos_base=1 << 41, from_version=0, to_epoch=0
    )
    d2 = export_change_feed_jsonl(
        lake, str(tmp_path / "seg2"), pos_base=2 << 41, from_epoch=0, to_epoch=1
    )
    schema = lake._event_schema()
    rt = CdcLake(str(tmp_path / "rt"), num_partitions=3)  # P-independent
    rt.apply(read_debezium_jsonl(d1, schema=schema))
    rt.apply(read_debezium_jsonl(d2, schema=schema))
    a = lake.read().to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = rt.read().to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
