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


def evolve_schema(current: pa.Schema, incoming: pa.Schema) -> pa.Schema:
    """Additive evolution: append fields of ``incoming`` unseen in ``current``.

    Existing fields keep their registered type (incoming must cast to it); a type
    conflict raises — destructive evolution is out of scope, as in the reference
    (columns are only ever added by enabling sources/vars, never retyped).
    """
    by_name = {f.name: f for f in current}
    out = list(current)
    for f in incoming:
        cur = by_name.get(f.name)
        if cur is None:
            out.append(f)
        elif cur.type != f.type and not pa.types.is_null(f.type):
            # null-typed incoming columns (all-null batch) conform to anything
            raise TypeError(
                f"schema evolution conflict on {f.name!r}: {cur.type} vs {f.type}"
            )
    return pa.schema(out)
