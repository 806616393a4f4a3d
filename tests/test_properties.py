"""Property-based tests (SURVEY.md §5 item 4): LWW convergence is independent
of delivery order, partitioning, and batching."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from dbt_customer360_ray.functions.lww import drop_tombstones, lww_latest
from dbt_customer360_ray.gen import gen_changes, oracle_lake


def _events_strategy():
    event = st.tuples(
        st.integers(0, 4),   # conv
        st.integers(0, 3),   # turn
        st.integers(0, 50),  # ts seconds
        st.sampled_from(["I", "U", "D"]),
    )
    return st.lists(event, min_size=1, max_size=40)


def _table(rows):
    t0 = np.datetime64("2025-01-01T00:00:00", "us")
    return pa.table(
        {
            "offset": pa.array(range(len(rows)), pa.int64()),
            "op": pa.array([r[3] for r in rows], pa.string()),
            "conv_id": pa.array([f"c{r[0]}" for r in rows], pa.string()),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "role": pa.array(["user"] * len(rows), pa.string()),
            "text": pa.array([f"t{i}" for i in range(len(rows))], pa.string()),
            "tool": pa.array([None] * len(rows), pa.string()),
            "ts": pa.array([t0 + np.timedelta64(r[2], "s") for r in rows], pa.timestamp("us")),
        }
    )


def _state(table: pa.Table) -> pd.DataFrame:
    out = drop_tombstones(lww_latest(table)).to_pandas()
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


@settings(max_examples=60, deadline=None)
@given(_events_strategy(), st.randoms(use_true_random=False))
def test_lww_order_invariant(rows, rnd):
    """Any permutation of the same event set converges to the same state."""
    table = _table(rows)
    perm = list(range(table.num_rows))
    rnd.shuffle(perm)
    shuffled = table.take(pa.array(perm))
    pd.testing.assert_frame_equal(_state(table), _state(shuffled))


@settings(max_examples=40, deadline=None)
@given(_events_strategy(), st.integers(1, 5))
def test_lww_partial_merge_associative(rows, n_chunks):
    """LWW(concat(LWW(chunk_i))) == LWW(all) for any chunking (the property the
    run-merge read path and map-side combine rely on)."""
    table = _table(rows)
    bounds = np.linspace(0, table.num_rows, n_chunks + 1).astype(int)
    partials = [
        lww_latest(table.slice(bounds[i], bounds[i + 1] - bounds[i]))
        for i in range(n_chunks)
        if bounds[i + 1] > bounds[i]
    ]
    merged = pa.concat_tables(partials)
    pd.testing.assert_frame_equal(_state(merged), _state(table))


def test_generator_oracle_idempotent_under_duplication():
    """Feeding the oracle the stream twice changes nothing (offset identity)."""
    changes = gen_changes(2_000, 150, seed=51)
    once = oracle_lake(changes)
    twice = oracle_lake(changes, changes)
    pd.testing.assert_frame_equal(once, twice)
