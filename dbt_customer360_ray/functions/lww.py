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


# -- patch mode (partial-image upserts, column-level LWW) ---------------------
#
# The reference's incremental merge models always carry FULL post-images (dbt
# merge on the unique key updates every column). Real binlog tails don't:
# Debezium emits partial images for Postgres TOAST columns, and Cassandra-style
# cells resolve per COLUMN. Patch mode adds op 'P' — a partial image whose null
# payload columns mean "unchanged" (a patch therefore cannot set a column to
# null; full images I/U can). Resolution per key:
#   - the row exists iff the latest event (ts, offset) is not a tombstone;
#     a patch AFTER a delete resurrects the row with only its patched columns
#   - column c takes its value from the latest event that SET c, restricted to
#     events after the latest tombstone: full images set every column
#     (including to null — a later U with c=null beats an earlier patch),
#     patches set only their non-null columns
# This equals applying the events sequentially, and degenerates to row-level
# LWW when no 'P' events are present (every event sets every column).


def _patch_layout(table, keys, ts_column, tie_column):
    """Sorted order + segment ids for patch kernels, with exact-duplicate
    offsets (redelivery) dropped keep-first: returns (idx, seg_id) where
    ``idx`` indexes `table` in (keys, ts, tie) ascending order."""
    sort_keys = [(c, "ascending") for c in keys] + [
        (ts_column, "ascending"),
        (tie_column, "ascending"),
    ]
    idx = pc.sort_indices(
        table, sort_keys=sort_keys, null_placement="at_start"
    ).to_numpy(zero_copy_only=False)
    n = table.num_rows
    same = np.zeros(n, dtype=bool)
    same[1:] = True
    for c in keys:
        codes = _key_codes(table.column(c))[idx]
        same[1:] &= codes[:-1] == codes[1:]
    seg_id = np.cumsum(~same) - 1
    offs = table.column(tie_column).to_numpy(zero_copy_only=False)[idx]
    dup = np.zeros(n, dtype=bool)
    dup[1:] = (offs[1:] == offs[:-1]) & (seg_id[1:] == seg_id[:-1])
    if dup.any():
        keep = ~dup
        idx, seg_id = idx[keep], seg_id[keep]
        # renumber (segments stay contiguous; ids may skip — recompute)
        same2 = np.zeros(len(idx), dtype=bool)
        same2[1:] = seg_id[1:] == seg_id[:-1]
        seg_id = np.cumsum(~same2) - 1
    return idx, seg_id


def _op_masks(table, idx, op_column):
    op = table.column(op_column)
    if isinstance(op, pa.ChunkedArray):
        op = op.combine_chunks()
    is_d = pc.equal(op, "D")
    is_p = pc.equal(op, "P")
    d = pc.fill_null(is_d, False).to_numpy(zero_copy_only=False)[idx]
    p = pc.fill_null(is_p, False).to_numpy(zero_copy_only=False)[idx]
    return d, p, ~(d | p)


def patch_collapse(
    table: pa.Table,
    key_columns: list[str] | None = None,
    ts_column: str = "ts",
    tie_column: str = "offset",
    op_column: str = "op",
) -> pa.Table:
    """Associative storage collapse for patch-mode runs (the ``lww_latest``
    analogue the applier/compactor use). Keeps, per key: the latest tombstone
    (it must keep killing older events in other runs), the latest full image
    after it, and every patch after that full image. Every dropped row is
    shadowed FOR EVERY COLUMN by a kept row with greater (ts, offset), so the
    GC cannot change any merge-at-read outcome against arbitrary other runs
    (property-tested in tests/test_patch_mode.py). Output is key-sorted."""
    if table.num_rows == 0:
        return table
    keys = key_columns or KEY_COLUMNS
    idx, seg_id = _patch_layout(table, keys, ts_column, tie_column)
    n = len(idx)
    starts = np.flatnonzero(np.r_[True, seg_id[1:] != seg_id[:-1]])
    is_d, is_p, is_full = _op_masks(table, idx, op_column)
    ar = np.arange(n)
    last_d = np.maximum.reduceat(np.where(is_d, ar, -1), starts)[seg_id]
    after_d = ar > last_d
    last_full = np.maximum.reduceat(
        np.where(is_full & after_d, ar, -1), starts
    )[seg_id]
    keep = (ar == last_d) | (ar == last_full) | (is_p & after_d & (ar > last_full))
    return table.take(pa.array(idx[keep]))


def patch_latest(
    table: pa.Table,
    key_columns: list[str] | None = None,
    ts_column: str = "ts",
    tie_column: str = "offset",
    op_column: str = "op",
    internal_columns: tuple = ("pid",),
) -> pa.Table:
    """Full column-level-LWW resolve: ONE row per key (the patch-mode
    ``lww_latest``). Dead keys surface as their tombstone row (op='D', null
    payload) so ``drop_tombstones`` composes unchanged; live keys carry the
    latest event's (op, ts, offset) and per-column latest-setter values."""
    if table.num_rows == 0:
        return table
    keys = key_columns or KEY_COLUMNS
    idx, seg_id = _patch_layout(table, keys, ts_column, tie_column)
    n = len(idx)
    starts = np.flatnonzero(np.r_[True, seg_id[1:] != seg_id[:-1]])
    ends = np.r_[starts[1:], n] - 1
    is_d, is_p, is_full = _op_masks(table, idx, op_column)
    ar = np.arange(n)
    last_d = np.maximum.reduceat(np.where(is_d, ar, -1), starts)[seg_id]
    after_d = ar > last_d
    winners = table.take(pa.array(idx[ends]))
    skip = set(keys) | {ts_column, tie_column, op_column} | set(internal_columns)
    payload = [c for c in table.column_names if c not in skip]
    n_seg = len(starts)
    for c in payload:
        col = table.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)[idx]
        cand = after_d & (is_full | (is_p & valid))
        src = np.maximum.reduceat(np.where(cand, ar, -1), starts)
        has = src >= 0
        gather = idx[np.where(has, src, 0)]
        vals = col.take(pa.array(gather))
        vals = pc.if_else(pa.array(has), vals, pa.scalar(None, col.type))
        assert len(vals) == n_seg
        winners = winners.set_column(
            winners.schema.get_field_index(c), c, vals
        )
    return winners
