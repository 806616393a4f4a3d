"""Vectorized last-writer-wins resolution.

This is the engine's replacement for the reference's confidence-ranking
survivorship ("recency and frequency", /root/reference/README.md:48;
``customer360__email.sql:109-110`` ranks by value_count desc, last_updated desc):
per row identity ``(conv_id, turn_idx)`` the event with the greatest
``(ts, offset)`` wins — recency survives, with the global event offset as the
deterministic tie-breaker so two cluster sizes can never diverge (SURVEY.md §7.4).

Pure pyarrow/numpy: sort once, detect group boundaries by adjacent comparison on
dictionary-encoded keys, take the last row per group. No Python row loop, no
pandas conversion.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..schemas import KEY_COLUMNS


def _key_codes(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Integer codes for a (possibly string) column, for fast adjacent compares."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
        col = pc.dictionary_encode(col).indices
    return col.to_numpy(zero_copy_only=False)


def lww_latest(
    table: pa.Table,
    key_columns: list[str] | None = None,
    ts_column: str = "ts",
    tie_column: str = "offset",
) -> pa.Table:
    """Keep, per key, the single row with max ``(ts, offset)``.

    Null ``ts`` sorts first (oldest). Winners retain all columns including ``op``
    — callers decide whether tombstones ('D') are filtered or persisted.
    """
    if table.num_rows == 0:
        return table
    keys = key_columns or KEY_COLUMNS
    sort_keys = [(c, "ascending") for c in keys] + [
        (ts_column, "ascending"),
        (tie_column, "ascending"),
    ]
    idx_arr = pc.sort_indices(table, sort_keys=sort_keys, null_placement="at_start")
    idx = idx_arr.to_numpy(zero_copy_only=False)
    n = table.num_rows
    same_all = np.ones(n - 1, dtype=bool)
    for c in keys:
        codes = _key_codes(table.column(c))[idx]  # reorder codes, not the table
        same_all &= codes[:-1] == codes[1:]
    # row i (in sorted order) is the last of its group iff the key changes next;
    # take winners directly — ONE gather of the winning rows, not sort+filter
    last = np.ones(n, dtype=bool)
    last[:-1] = ~same_all
    return table.take(pa.array(idx[last]))


def drop_tombstones(table: pa.Table, op_column: str = "op") -> pa.Table:
    """Public-read filter: remove rows whose winning event was a delete."""
    if op_column not in table.column_names or table.num_rows == 0:
        return table
    keep = pc.fill_null(pc.not_equal(table.column(op_column), "D"), True)
    return table.filter(keep)
