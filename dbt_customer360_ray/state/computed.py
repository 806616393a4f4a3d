"""Computed (generated) columns: derived at INGEST from a source column.

The reference derives columns inside its staged models (lower/trim/regexp
expressions in every cleaning model, e.g. ``stg_customer360__marketo.sql``'s
lowered emails); the engine's equivalent is a generated-column spec persisted
in the manifest (per-version, RESTORE-aware, like constraints) and computed
vectorized inside the shuffle-map task via the apply path's enrich hook — so
the derived value is stored WITH the row, versioned, time-travelable, and
never recomputed at read.

Semantics:
- Deterministic single-source-column functions only (``KINDS``): a null
  source yields a null computed value, which composes with every merge mode —
  deletes carry nulls, and a patch-mode row that doesn't set the source
  doesn't set the computed column either (column-level LWW keeps the pair
  consistent automatically).
- Producer-supplied values for a computed column are ignored (overwritten):
  the lake owns derivation, exactly like a database GENERATED ALWAYS column.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# kind -> (output arrow type, vectorized kernel, SQL template)
KINDS = {
    "length": (
        pa.int64(),
        lambda col: pc.cast(pc.utf8_length(col), pa.int64()),
        "length({src})",
    ),
    "lower": (
        pa.string(),
        pc.utf8_lower,
        "lower({src})",
    ),
    "token_count": (
        pa.int64(),
        lambda col: pc.cast(
            pc.count_substring_regex(pc.utf8_lower(col), "[a-z0-9]+"), pa.int64()
        ),
        "len(regexp_extract_all(lower({src}), '[a-z0-9]+'))",
    ),
}


def validate_computed(spec: dict) -> dict:
    name, kind, source = spec.get("name"), spec.get("kind"), spec.get("source")
    if not name or not isinstance(name, str):
        raise ValueError(f"computed column needs a string name: {spec!r}")
    if kind not in KINDS:
        raise ValueError(
            f"computed column {name!r}: unknown kind {kind!r} "
            f"(have {sorted(KINDS)})"
        )
    if not source or not isinstance(source, str):
        raise ValueError(f"computed column {name!r} needs a source column")
    if name == source:
        raise ValueError(f"computed column {name!r} cannot derive from itself")
    return {"name": name, "kind": kind, "source": source}


def computed_fields(specs: list[dict]) -> list[pa.Field]:
    return [pa.field(s["name"], KINDS[s["kind"]][0]) for s in specs]


def apply_computed(batch: pa.Table, specs: list[dict]) -> pa.Table:
    """Vectorized derivation pass (runs inside the shuffle-map task, fused
    with any user enrich). A missing source column yields an all-null
    computed column; a producer-supplied computed column is overwritten."""
    n = batch.num_rows
    for s in specs:
        out_type, kernel, _ = KINDS[s["kind"]]
        if s["source"] in batch.column_names:
            col = batch.column(s["source"])
            val = kernel(col)
            if isinstance(val, pa.ChunkedArray):
                val = val.combine_chunks()
        else:
            val = pa.nulls(n, out_type)
        idx = batch.schema.get_field_index(s["name"])
        if idx >= 0:
            batch = batch.set_column(idx, s["name"], val)
        else:
            batch = batch.append_column(s["name"], val)
    return batch


def computed_sql(spec: dict) -> str:
    """The derivation as a DuckDB expression over the source column —
    identical per-row function, so applying it to the converged winners
    equals storing it at ingest."""
    return KINDS[spec["kind"]][2].format(src=spec["source"])
