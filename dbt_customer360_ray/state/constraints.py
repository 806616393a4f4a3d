"""Ingest-time CHECK / NOT NULL constraints (Delta-style table constraints).

The reference enforces data quality declaratively — accepted-values /
not-null tests gate every staged model before the merge
(``dbt_project.yml`` test config; e.g. the staged Zendesk role filter,
``int_customer360__zendesk.sql``). The engine's equivalent is a constraint
list persisted in the manifest (per-version, like the schema) and enforced
vectorized inside the shuffle-map task: violating change events are routed to
the dead-letter queue with reason ``chk:<name>`` instead of applied, so the
lake itself can never hold a violating live row.

Semantics (SQL CHECK):
- A constraint passes when its predicate is TRUE **or NULL** — only a
  definitively-FALSE predicate violates (``not_null`` is the explicit
  null-rejecting form).
- Constraints apply to image-carrying ops only: ``I``/``U`` (and, for
  comparison constraints, patch-mode ``P`` rows where the column is set —
  a patch asserts only the columns it carries, so ``not_null`` is not
  enforceable on ``P``). Deletes carry no image and are exempt.

Every spec is a flat serializable dict so it round-trips through the manifest
JSON and translates 1:1 to SQL for the oracle:

    {"name": "role_allowed", "column": "role", "op": "in",
     "value": ["user", "assistant", "system"]}

Supported ops: ``not_null``, ``in``, ``==``, ``!=``, ``<``, ``<=``, ``>``,
``>=``, ``matches`` (RE2 substring search, DuckDB ``regexp_matches``
semantics).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CONSTRAINT_OPS = (
    "not_null", "in", "==", "!=", "<", "<=", ">", ">=", "matches", "fk",
)

_IMAGE_OPS = ("I", "U")  # full-image ops every constraint applies to


def validate_spec(spec: dict) -> dict:
    """Normalize + sanity-check one constraint spec (returns a fresh dict)."""
    name = spec.get("name")
    col = spec.get("column")
    op = spec.get("op")
    if not name or not isinstance(name, str):
        raise ValueError(f"constraint needs a string name: {spec!r}")
    if not col or not isinstance(col, str):
        raise ValueError(f"constraint {name!r} needs a column")
    if op not in CONSTRAINT_OPS:
        raise ValueError(f"constraint {name!r}: unknown op {op!r}")
    out = {"name": name, "column": col, "op": op}
    if op == "not_null":
        if spec.get("value") is not None:
            raise ValueError(f"constraint {name!r}: not_null takes no value")
    elif op == "in":
        vals = spec.get("value")
        if not isinstance(vals, (list, tuple)) or not vals:
            raise ValueError(f"constraint {name!r}: 'in' needs a non-empty list")
        out["value"] = list(vals)
    elif op == "fk":
        # referential integrity against another lake: the engine resolves the
        # referenced key set at apply time (never persisted in the manifest)
        v = spec.get("value")
        if not isinstance(v, dict) or not v.get("ref_dir"):
            raise ValueError(
                f"constraint {name!r}: 'fk' needs value="
                "{'ref_dir': <lake dir>, 'ref_column': <col, default column>}"
            )
        out["value"] = {
            "ref_dir": str(v["ref_dir"]),
            "ref_column": str(v.get("ref_column") or out["column"]),
        }
    else:
        if spec.get("value") is None:
            raise ValueError(f"constraint {name!r}: op {op!r} needs a value")
        out["value"] = spec["value"]
    return out


def _scalar_for(col: pa.ChunkedArray | pa.Array, value):
    """Cast a JSON-carried comparison value to the column's type (timestamps
    arrive as ISO strings through the manifest round-trip)."""
    t = col.type
    if pa.types.is_timestamp(t):
        import pandas as pd

        return pa.scalar(pd.Timestamp(value), type=t)
    return pa.scalar(value, type=t)


def _predicate_false(col, spec) -> "pc.Expression":
    """Boolean array: True where the constraint predicate is definitively
    FALSE (nulls pass, per SQL CHECK)."""
    op = spec["op"]
    if op == "matches":
        pred = pc.match_substring_regex(col, spec["value"])
    elif op == "in":
        pred = pc.is_in(col, value_set=pa.array(spec["value"], type=col.type))
        # is_in yields False (not null) for null inputs — restore CHECK
        # semantics by masking nulls back to pass
        return pc.and_(pc.invert(pred), pc.is_valid(col))
    else:
        kernel = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
                  "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}[op]
        pred = kernel(col, _scalar_for(col, spec["value"]))
    return pc.fill_null(pc.invert(pred), False)


def _predicate_true(col, spec) -> "pc.Expression":
    """Boolean array: True where the predicate is definitively TRUE —
    ``coalesce(pred, FALSE)``, the DML WHERE semantics (a NULL comparison
    selects nothing), dual of ``_predicate_false``'s CHECK semantics."""
    op = spec["op"]
    if op == "not_null":
        return pc.is_valid(col)
    if op == "matches":
        return pc.fill_null(pc.match_substring_regex(col, spec["value"]), False)
    if op == "in":
        # is_in yields False (not null) for null inputs already
        return pc.is_in(col, value_set=pa.array(spec["value"], type=col.type))
    kernel = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
              "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}[op]
    return pc.fill_null(kernel(col, _scalar_for(col, spec["value"])), False)


def violation_masks(batch: pa.Table, constraints: list[dict]) -> list[np.ndarray]:
    """One bool ndarray per constraint: True where that constraint quarantines
    the row. Vectorized — one pyarrow.compute kernel chain per constraint.

    Rows whose op is not image-carrying never violate. ``not_null`` applies to
    I/U only; comparison constraints also bind patch (``P``) rows, where an
    unset (null) column passes by CHECK-null semantics automatically.
    A constraint on a column absent from the batch behaves as an all-null
    column (conform runs before routing, so this only happens pre-evolution).
    """
    n = batch.num_rows
    op_col = batch.column("op")
    iu = pc.is_in(op_col, value_set=pa.array(list(_IMAGE_OPS), pa.string()))
    iu = pc.fill_null(iu, False).to_numpy(zero_copy_only=False)
    iup = pc.is_in(
        op_col, value_set=pa.array(list(_IMAGE_OPS) + ["P"], pa.string())
    )
    iup = pc.fill_null(iup, False).to_numpy(zero_copy_only=False)
    out = []
    for spec in constraints:
        if spec["op"] == "fk":
            raise ValueError(
                f"fk constraint {spec['name']!r} must be resolved to a key set "
                "before evaluation (CdcLake resolves it at apply time)"
            )
        if spec["column"] not in batch.column_names:
            if spec["op"] == "not_null":
                out.append(iu.copy())  # absent column == all null
            else:
                out.append(np.zeros(n, dtype=bool))
            continue
        col = batch.column(spec["column"])
        if spec["op"] == "not_null":
            viol = pc.is_null(col).to_numpy(zero_copy_only=False) & iu
        else:
            viol = _predicate_false(col, spec).to_numpy(zero_copy_only=False) & iup
        out.append(viol)
    return out


def violation_any(batch: pa.Table, constraints: list[dict]) -> np.ndarray:
    masks = violation_masks(batch, constraints)
    if not masks:
        return np.zeros(batch.num_rows, dtype=bool)
    out = masks[0].copy()
    for m in masks[1:]:
        out |= m
    return out


# -- oracle SQL translation -------------------------------------------------


def _sql_literal(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)


def predicate_sql(spec: dict, col_sql: str | None = None) -> str:
    """The constraint's CHECK predicate as a DuckDB boolean expression
    (TRUE/NULL = pass, FALSE = violate — exactly ``_predicate_false``)."""
    c = col_sql if col_sql is not None else spec["column"]
    op = spec["op"]
    if op == "fk":
        raise NotImplementedError(
            "fk constraints reference another lake's state — inline the "
            "referenced key set as a subquery when building the oracle"
        )
    if op == "not_null":
        return f"{c} IS NOT NULL"
    if op == "in":
        return f"{c} IN ({', '.join(_sql_literal(v) for v in spec['value'])})"
    if op == "matches":
        return f"regexp_matches({c}, {_sql_literal(spec['value'])})"
    sql_op = {"==": "=", "!=": "<>"}.get(op, op)
    return f"{c} {sql_op} {_sql_literal(spec['value'])}"


def violation_sql(spec: dict, patch: bool = False) -> str:
    """Boolean SQL: TRUE where this constraint quarantines the event row."""
    ops = "('I', 'U', 'P')" if (patch and spec["op"] != "not_null") else "('I', 'U')"
    if spec["op"] == "not_null":
        return f"(op IN {ops} AND {spec['column']} IS NULL)"
    return f"(op IN {ops} AND ({predicate_sql(spec)}) IS FALSE)"


def keep_sql(constraints: list[dict], patch: bool = False) -> str:
    """WHERE clause keeping only events that pass every constraint."""
    if not constraints:
        return "TRUE"
    return " AND ".join(f"NOT {violation_sql(c, patch)}" for c in constraints)


def reason_case_sql(constraints: list[dict], patch: bool = False) -> str:
    """CASE expression yielding ``chk:<name>`` of the FIRST violated
    constraint in declaration order (the engine's reason priority)."""
    arms = "".join(
        f" WHEN {violation_sql(c, patch)} THEN 'chk:{c['name']}'"
        for c in constraints
    )
    return f"CASE{arms} END"
