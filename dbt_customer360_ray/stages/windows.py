"""Windowed / per-group ordered operators.

The reference's only windowing is the per-entity confidence ranking
(``count(*) over (partition by customer360_id, value)`` +
``max(...) over (...)`` then dense_rank/row_number —
/root/reference/models/output/customer360__email.sql:95-110). Ray Data has no
window functions; we express them as ``groupby(key).map_groups`` over sorted
groups — a per-group sort, never a global one (SURVEY.md §2.6).

Sessionization is the stream-shaped extension a transcript/event pipeline needs
(gap-based sessions per user); same primitive.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sessionize(
    ds,
    key: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    gap_seconds: int = 1800,
):
    """Per key: count gap-based sessions and events.

    Returns a Dataset with (key, n_events:int64, n_sessions:int64).
    Partitioning assumption: one group per key fits in a worker's heap (bounded
    per-user event counts); for 100 TB, pre-bucket keys and sessionize inside
    buckets the same way.
    """

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, tie_col], kind="stable")
        gaps = g[ts_col].diff().dt.total_seconds()
        new_session = gaps.isna() | (gaps > gap_seconds)
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                "n_events": np.array([len(g)], dtype=np.int64),
                "n_sessions": np.array([int(new_session.sum())], dtype=np.int64),
            }
        )

    return ds.groupby(key).map_groups(per_group, batch_format="pandas")


def rank_survivors(
    ds,
    entity_key: str,
    value_col: str,
    count_col: str = "value_count",
    recency_col: str = "last_seen",
):
    """customer360-style survivorship: per entity keep the value with the
    highest (frequency, recency) — 'recency and frequency'
    (/root/reference/README.md:48; customer360__email.sql:109-110). Expects a
    pre-aggregated Dataset of (entity_key, value_col, count_col, recency_col);
    emits the index=1 row per entity with deterministic tie-break on value."""

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [count_col, recency_col, value_col],
            ascending=[False, False, True],
            kind="stable",
        )
        return g.head(1)

    return ds.groupby(entity_key).map_groups(pick, batch_format="pandas")
