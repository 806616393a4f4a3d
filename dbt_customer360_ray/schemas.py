"""Schemas for the transcript lake and the CDC change stream, plus additive
schema evolution.

The authoritative input shape comes from BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])``. The change stream adds ``(offset:int64, op:string)``.

Schema evolution mirrors the reference's compile-time additive column injection
(``/root/reference/models/cleaning/int_customer360__zendesk.sql:17-19`` emits
``null as <col>`` when a source lacks a column): unseen columns are appended to
the lake schema and old rows are read back as null; incoming batches missing a
column get a null-backfilled column of the registered type.
"""

from __future__ import annotations

import pyarrow as pa

# Row identity for the lake: (conv_id, turn_idx). LWW tiebreaker: (ts, offset).
KEY_COLUMNS = ["conv_id", "turn_idx"]

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# v0 of the stream predates the `tool` column (schema-evolution fixture,
# FIXTURES.md §2): CHANGES_SCHEMA_V0 = CHANGES_SCHEMA minus `tool`.
CHANGES_SCHEMA = pa.schema(
    [
        ("offset", pa.int64()),
        ("op", pa.string()),  # I | U | D
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

CHANGES_SCHEMA_V0 = pa.schema([f for f in CHANGES_SCHEMA if f.name != "tool"])

# Internal lake-state schema: winners including tombstones (op retained so late
# events cannot resurrect deleted rows across epochs); public reads filter op != D.
STATE_SCHEMA = pa.schema(
    list(CHANGES_SCHEMA)
    + [
        ("pid", pa.int32()),
    ]
)


def conform_batch(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    """Project ``batch`` onto ``schema``: missing columns null-backfilled, extra
    columns dropped, types cast. Vectorized; zero-copy when already conforming."""
    n = batch.num_rows
    cols = []
    names = set(batch.column_names)
    for field in schema:
        if field.name in names:
            col = batch.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, field.type))
    return pa.Table.from_arrays(cols, schema=schema)


def rename_columns_map(batch: pa.Table, mapping: dict[str, str]) -> pa.Table:
    """Zero-copy rename of the columns of ``batch`` present in ``mapping``
    (absent keys ignored). Used by column-mapping evolution to move incoming
    batches between the logical (user) and physical (storage) namespaces."""
    if not mapping:
        return batch
    names = [mapping.get(n, n) for n in batch.column_names]
    if names == batch.column_names:
        return batch
    return batch.rename_columns(names)


# lossless same-kind promotion lattice (upstream ALTER COLUMN int → bigint is
# routine in a binlog's lifetime); anything outside it is a hard conflict
_INT_ORDER = {pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3}
_UINT_ORDER = {pa.uint8(): 0, pa.uint16(): 1, pa.uint32(): 2, pa.uint64(): 3}
_FLOAT_ORDER = {pa.float32(): 0, pa.float64(): 1}


def _widens(cur: pa.DataType, new: pa.DataType) -> bool:
    """True iff ``new`` is a strictly wider type than ``cur`` in a lossless
    same-kind promotion (int8→…→int64, uint likewise, float32→float64,
    string→large_string). Cross-kind (int→float, string→int) never widens."""
    for order in (_INT_ORDER, _UINT_ORDER, _FLOAT_ORDER):
        if cur in order and new in order:
            return order[new] > order[cur]
    return pa.types.is_string(cur) and pa.types.is_large_string(new)


def evolve_schema(current: pa.Schema, incoming: pa.Schema) -> pa.Schema:
    """Additive + widening evolution: append fields of ``incoming`` unseen in
    ``current``; an incoming field whose type strictly WIDENS the registered
    one (lossless same-kind promotion — ``_widens``) upgrades the lake schema,
    and old runs cast up losslessly at read (``conform_batch``). Narrower
    incoming types cast up into the registered type as before. Any other type
    change raises — destructive evolution is out of scope, as in the reference
    (columns are only ever added by enabling sources/vars, never retyped).
    Time-travel is unaffected: each snapshot carries its own schema."""
    by_name = {f.name: f for f in current}
    out = list(current)
    for f in incoming:
        cur = by_name.get(f.name)
        if cur is None:
            out.append(f)
        elif cur.type != f.type and not pa.types.is_null(f.type):
            # null-typed incoming columns (all-null batch) conform to anything
            if _widens(cur.type, f.type):
                out[out.index(cur)] = pa.field(f.name, f.type)
            elif not _widens(f.type, cur.type):  # narrower incoming casts up
                raise TypeError(
                    f"schema evolution conflict on {f.name!r}: "
                    f"{cur.type} vs {f.type}"
                )
    return pa.schema(out)
