"""Unit tests: vectorized last-writer-wins kernel + schema evolution helpers."""

import numpy as np
import pyarrow as pa
import pytest

from dbt_customer360_ray.functions.lww import drop_tombstones, lww_latest
from dbt_customer360_ray.schemas import (
    CHANGES_SCHEMA,
    conform_batch,
    evolve_schema,
)


def _events(rows):
    cols = {name: [] for name in ["offset", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]}
    for r in rows:
        for k in cols:
            cols[k].append(r.get(k))
    return pa.table(
        {
            "offset": pa.array(cols["offset"], pa.int64()),
            "op": pa.array(cols["op"], pa.string()),
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array(cols["tool"], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        }
    )


T0 = np.datetime64("2025-01-01T00:00:00", "us")


def ev(offset, conv, turn, ts_s, op="I", text="x"):
    return {
        "offset": offset,
        "op": op,
        "conv_id": conv,
        "turn_idx": turn,
        "text": text,
        "role": "user",
        "ts": T0 + np.timedelta64(ts_s, "s"),
    }


def test_lww_picks_max_ts():
    t = _events([ev(0, "a", 0, 10, text="old"), ev(1, "a", 0, 20, text="new")])
    out = lww_latest(t)
    assert out.num_rows == 1
    assert out.column("text")[0].as_py() == "new"


def test_lww_tie_breaks_on_offset():
    t = _events([ev(5, "a", 0, 10, text="later-offset"), ev(3, "a", 0, 10, text="earlier")])
    out = lww_latest(t)
    assert out.column("text")[0].as_py() == "later-offset"


def test_lww_late_event_loses():
    t = _events([ev(0, "a", 0, 100, text="applied"), ev(9, "a", 0, 50, text="late")])
    out = lww_latest(t)
    assert out.column("text")[0].as_py() == "applied"


def test_lww_multiple_keys_no_cross_talk():
    t = _events(
        [
            ev(0, "a", 0, 10, text="a0"),
            ev(1, "a", 1, 10, text="a1"),
            ev(2, "b", 0, 5, text="b0"),
            ev(3, "a", 0, 20, text="a0v2"),
        ]
    )
    out = lww_latest(t)
    got = {
        (out.column("conv_id")[i].as_py(), out.column("turn_idx")[i].as_py()): out.column("text")[i].as_py()
        for i in range(out.num_rows)
    }
    assert got == {("a", 0): "a0v2", ("a", 1): "a1", ("b", 0): "b0"}


def test_tombstone_wins_and_filters():
    t = _events([ev(0, "a", 0, 10, text="x"), ev(1, "a", 0, 20, op="D", text=None)])
    winners = lww_latest(t)
    assert winners.column("op")[0].as_py() == "D"
    assert drop_tombstones(winners).num_rows == 0


def test_empty_table():
    t = _events([])
    assert lww_latest(t).num_rows == 0


def test_conform_backfills_and_casts():
    t = pa.table({"conv_id": pa.array(["a"]), "turn_idx": pa.array([1], pa.int64())})
    out = conform_batch(t, CHANGES_SCHEMA)
    assert out.schema == CHANGES_SCHEMA
    assert out.column("tool")[0].as_py() is None
    assert out.column("turn_idx").type == pa.int32()


def test_evolve_appends_new_columns():
    cur = pa.schema([("a", pa.string())])
    inc = pa.schema([("a", pa.string()), ("b", pa.int32())])
    assert evolve_schema(cur, inc).names == ["a", "b"]
    # order stable, existing types pinned
    assert evolve_schema(inc, cur) == inc


def test_evolve_conflict_raises():
    cur = pa.schema([("a", pa.string())])
    inc = pa.schema([("a", pa.int32())])
    with pytest.raises(TypeError):
        evolve_schema(cur, inc)


def test_evolve_widens_types():
    cur = pa.schema([("a", pa.int32()), ("f", pa.float32()), ("s", pa.string())])
    inc = pa.schema(
        [("a", pa.int64()), ("f", pa.float64()), ("s", pa.large_string())]
    )
    widened = evolve_schema(cur, inc)
    assert widened.field("a").type == pa.int64()
    assert widened.field("f").type == pa.float64()
    assert widened.field("s").type == pa.large_string()
    # narrower incoming keeps the registered (wider) type — casts up at conform
    assert evolve_schema(widened, cur) == widened
    # cross-kind still conflicts
    with pytest.raises(TypeError):
        evolve_schema(pa.schema([("a", pa.int32())]), pa.schema([("a", pa.float64())]))


def test_engine_widening_evolution(tmp_path, ray_session):
    """Mid-stream upstream ALTER COLUMN int32→int64 on a payload column: the
    lake schema widens, old runs cast up losslessly, snapshots keep their own
    (pre-widening) schema."""
    import ray.data

    from dbt_customer360_ray.state.engine import CdcLake

    def tbl(offsets, score_type):
        n = len(offsets)
        return pa.table(
            {
                "offset": pa.array(offsets, pa.int64()),
                "op": pa.array(["I"] * n, pa.string()),
                "conv_id": pa.array([f"c{i}" for i in offsets], pa.string()),
                "turn_idx": pa.array([0] * n, pa.int32()),
                "role": pa.array(["user"] * n, pa.string()),
                "text": pa.array(["t"] * n, pa.string()),
                "tool": pa.array([None] * n, pa.string()),
                "ts": pa.array([1_700_000_000_000_000 + i for i in offsets], pa.timestamp("us")),
                "score": pa.array(list(offsets), score_type),
            }
        )

    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply(ray.data.from_arrow(tbl([0, 1, 2], pa.int32())))
    lake.apply(ray.data.from_arrow(tbl([3, 4], pa.int64())))  # widened epoch
    state = lake.read_local_table()
    assert state.schema.field("score").type == pa.int64()
    assert sorted(state.column("score").to_pylist()) == [0, 1, 2, 3, 4]
    # the epoch-0 snapshot still reads with the narrow type
    snap = lake.read_local_table_as_of(epoch=0)
    assert snap.schema.field("score").type == pa.int32()
