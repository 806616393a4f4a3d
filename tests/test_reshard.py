"""reshard — rewrite the lake under a new partition count.

P is pinned at lake creation so checkpoints line up (state/engine.py
CdcLake.__init__); reshard is the sanctioned way to change it: one hash-shuffle
pass into a fresh exactly-once-committed destination.
"""

import pandas as pd
import pyarrow as pa
import pytest

from dbt_customer360_ray.gen import gen_changes, split_epochs
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")


def _replayed(tmp_path, n=6_000, convs=300, seed=11, P=8):
    import ray.data

    lake = CdcLake(str(tmp_path / "lake"), num_partitions=P)
    for part in split_epochs(gen_changes(n, convs, seed=seed), 3):
        lake.apply(ray.data.from_arrow(part))
    return lake


def test_reshard_preserves_state_and_source(tmp_path):
    lake = _replayed(tmp_path)
    src = (
        lake.read()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    for newP in (3, 13):
        dest = lake.reshard(str(tmp_path / f"resharded-{newP}"), newP)
        assert dest.P == newP
        got = (
            dest.read()
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, src, check_dtype=False)
    # source untouched
    assert lake.read().count() == len(src)


def test_reshard_keeps_point_lookup_and_headers(tmp_path):
    lake = _replayed(tmp_path, n=3_000, convs=150, seed=13)
    src = lake.read().to_pandas()
    dest = lake.reshard(str(tmp_path / "resharded"), 5)
    conv = src["conv_id"].iloc[0]
    assert dest.lookup(conv).num_rows == (src["conv_id"] == conv).sum()
    heads = dest.conversation_headers().to_pandas()
    assert heads["n_turns"].sum() == len(src)


def test_reshard_carries_checkpoints_and_tombstones(tmp_path):
    import ray.data

    epochs = split_epochs(gen_changes(4_000, 200, seed=17), 3)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    for part in epochs:
        lake.apply(ray.data.from_arrow(part))
    dest = lake.reshard(str(tmp_path / "resharded"), 6)

    # replaying an already-applied epoch dedups everything (global high-water)
    m = dest.apply(ray.data.from_arrow(epochs[-1]))
    assert m["events_deduped"] == m["events_in"] > 0
    assert dest.read().count() == lake.read().count()

    # a late event older than a carried tombstone cannot resurrect the delete
    state = lake.read().to_pandas()
    deleted = pd.concat([p.to_pandas() for p in epochs])
    deleted = deleted[deleted["op"] == "D"]
    key = deleted.sort_values("offset").iloc[-1]
    assert not (
        (state["conv_id"] == key["conv_id"]) & (state["turn_idx"] == key["turn_idx"])
    ).any(), "fixture sanity: pick a key whose delete won"
    late = pa.table(
        {
            "offset": pa.array([10_000_000], pa.int64()),
            "op": pa.array(["U"]),
            "conv_id": pa.array([key["conv_id"]]),
            "turn_idx": pa.array([key["turn_idx"]], pa.int32()),
            "role": pa.array(["user"]),
            "text": pa.array(["zombie"]),
            "tool": pa.nulls(1, pa.string()),
            "ts": pa.array([pd.Timestamp(key["ts"]) - pd.Timedelta(hours=5)]).cast(
                pa.timestamp("us")
            ),
        }
    )
    dest.apply(ray.data.from_arrow(late))
    post = dest.read().to_pandas()
    assert not (
        (post["conv_id"] == key["conv_id"]) & (post["turn_idx"] == key["turn_idx"])
    ).any()


def test_reshard_refuses_nonempty_dest_and_empty_src(tmp_path):
    lake = _replayed(tmp_path, n=1_000, convs=60, seed=23)
    dest = lake.reshard(str(tmp_path / "resharded"), 4)
    with pytest.raises(ValueError, match="not empty"):
        lake.reshard(str(tmp_path / "resharded"), 4)
    empty = CdcLake(str(tmp_path / "empty"), num_partitions=4)
    with pytest.raises(ValueError, match="empty"):
        empty.reshard(str(tmp_path / "resharded2"), 8)
