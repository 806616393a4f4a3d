"""Z-order layout: Morton key correctness, deterministic file assignment,
and the data-skipping win a 2-D box predicate gets over a 1-D sort order."""

import numpy as np
import pyarrow as pa
import pytest

from dbt_customer360_ray.stages.layout import (
    _interleave,
    files_pruned,
    zorder_assign,
    zorder_layout,
)


def test_interleave_known_bits():
    u = np.array([0b101, 0b000, 0b111], dtype=np.int64)
    v = np.array([0b011, 0b000, 0b111], dtype=np.int64)
    z = _interleave(u, v, bits=3)
    # bit i of u -> 2i, bit i of v -> 2i+1
    assert z[0] == (1 << 0) + (1 << 4) + (1 << 1) + (1 << 3)
    assert z[1] == 0
    assert z[2] == 0b111111


def _grid_table(n_side: int = 40, reps: int = 4) -> pa.Table:
    """A (user, ts) grid: every combination appears, so neither column alone
    clusters the other."""
    ids, users, tss = [], [], []
    k = 0
    for u in range(n_side):
        for t in range(n_side):
            for _ in range(reps):
                ids.append(k)
                users.append(u * 1000)
                tss.append(t * 86_400_000_000)
                k += 1
    return pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts_us": pa.array(tss, pa.int64()),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_zorder_prunes_more_than_single_column_sort():
    import ray.data

    t = _grid_table()
    rows_per_file = 200
    ds = ray.data.from_arrow(t).repartition(8)

    z_stats = zorder_layout(
        ds, "user_id", "ts_us", "event_id", rows_per_file=rows_per_file
    ).to_pandas()

    # baseline layout: files cut from the ts-sorted order (what a plain
    # time-ordered ingest produces)
    df = t.to_pandas().sort_values(["ts_us", "event_id"], kind="stable")
    df["file_idx"] = np.arange(len(df)) // rows_per_file
    base = df.groupby("file_idx").agg(
        user_id_min=("user_id", "min"),
        user_id_max=("user_id", "max"),
        ts_us_min=("ts_us", "min"),
        ts_us_max=("ts_us", "max"),
    ).reset_index()

    # box predicate: one user decile x one time decile
    a = (0, 4_000)
    b = (0, 4 * 86_400_000_000)
    z_pruned, z_total = files_pruned(z_stats, "user_id", "ts_us", a, b)
    b_pruned, b_total = files_pruned(base, "user_id", "ts_us", a, b)
    assert z_total == b_total
    # the ts-sort gives no user_id locality: only the ts dimension prunes;
    # z-order must strictly beat it on the 2-D box
    assert z_pruned > b_pruned
    # and every row is accounted for
    assert int(z_stats["n_rows"].sum()) == t.num_rows


@pytest.mark.usefixtures("ray_session")
def test_zorder_assign_block_invariant():
    import ray.data

    t = _grid_table(n_side=12, reps=2)
    a, _ = zorder_assign(
        ray.data.from_arrow(t).repartition(2),
        "user_id", "ts_us", "event_id", rows_per_file=50,
    )
    b, _ = zorder_assign(
        ray.data.from_arrow(t).repartition(7),
        "user_id", "ts_us", "event_id", rows_per_file=50,
    )
    pa_ = a.to_pandas().sort_values("event_id").reset_index(drop=True)
    pb = b.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert pa_[["event_id", "file_idx"]].equals(pb[["event_id", "file_idx"]])
