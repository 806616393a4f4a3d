"""Physical layout clustering: Z-order (Morton) file assignment.

The lakehouse ``OPTIMIZE ... ZORDER BY (a, b)`` primitive (Delta/Iceberg):
rewrite a table's files so rows close in BOTH key dimensions land in the same
file, which tightens every file's per-column min/max envelope and lets a
2-D box predicate prune files that a single-column sort order cannot.
The reference's only layout lever is input windowing
(``dbt_project.yml:27,42``); this is the engine-side generalisation a 100 TB
lake needs for multi-dimensional read locality.

Scale shape: one map to compute the interleaved key (map-only, int64 math),
ONE distributed sort on it (the unavoidable all-to-all — clustering IS a
sort), an O(blocks) driver offset pass (stages/windows.global_row_number),
then a small per-file stats aggregate. No driver row materialisation.

Determinism contract (house style): quantisation is pure integer math —
``step = ((max - min) >> bits) + 1; q = (x - min) // step`` — so numpy and
DuckDB agree bit-for-bit, with (z, id) as the unique total order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _quantize(x: np.ndarray, lo: int, step: int) -> np.ndarray:
    """(x - lo) // step as int64 — overflow-free for any int64 input because
    the subtraction stays within the observed range and step >= 1."""
    return (x.astype(np.int64) - np.int64(lo)) // np.int64(step)


def _interleave(u: np.ndarray, v: np.ndarray, bits: int) -> np.ndarray:
    """Morton code: bit i of u -> bit 2i of z, bit i of v -> bit 2i+1."""
    z = np.zeros(len(u), dtype=np.int64)
    for i in range(bits):
        z |= ((u >> i) & 1) << (2 * i)
        z |= ((v >> i) & 1) << (2 * i + 1)
    return z


def _min_max(ds, cols: list[str]) -> dict[str, int]:
    """One small aggregate pass for the quantisation envelope."""
    from ray.data.aggregate import Max, Min

    aggs = []
    for c in cols:
        aggs.append(Min(c, alias_name=f"{c}_min"))
        aggs.append(Max(c, alias_name=f"{c}_max"))
    row = ds.aggregate(*aggs)
    return {k: int(v) for k, v in row.items()}


def zorder_key(ds, col_a: str, col_b: str, bits: int = 16, out_col: str = "z"):
    """Append the Morton key of (col_a, col_b) — both must be int64 columns.

    Returns (dataset, envelope) where envelope carries the min/step used so
    the oracle can reproduce the exact quantisation.
    """
    env = _min_max(ds, [col_a, col_b])
    a_lo, a_hi = env[f"{col_a}_min"], env[f"{col_a}_max"]
    b_lo, b_hi = env[f"{col_b}_min"], env[f"{col_b}_max"]
    a_step = ((a_hi - a_lo) >> bits) + 1
    b_step = ((b_hi - b_lo) >> bits) + 1

    def add_z(t: pa.Table) -> pa.Table:
        a = t.column(col_a).to_numpy(zero_copy_only=False)
        b = t.column(col_b).to_numpy(zero_copy_only=False)
        u = _quantize(a, a_lo, a_step)
        v = _quantize(b, b_lo, b_step)
        return t.append_column(out_col, pa.array(_interleave(u, v, bits)))

    out = ds.map_batches(add_z, batch_format="pyarrow", zero_copy_batch=True)
    return out, {"a_lo": a_lo, "a_step": a_step, "b_lo": b_lo, "b_step": b_step}


def zorder_assign(
    ds,
    col_a: str,
    col_b: str,
    id_col: str,
    rows_per_file: int,
    bits: int = 16,
):
    """Rows + ``file_idx``: global (z, id) rank floor-divided into files of
    ``rows_per_file`` — the deterministic file assignment an OPTIMIZE ZORDER
    rewrite materialises. Output stays a Dataset (sorted by z)."""
    from .windows import global_row_number

    keyed, env = zorder_key(ds, col_a, col_b, bits=bits)
    numbered, _total = global_row_number(keyed, ["z", id_col], out_col="_rn")

    def assign(t: pa.Table) -> pa.Table:
        rn = t.column("_rn").to_numpy(zero_copy_only=False)
        f = (rn - 1) // rows_per_file
        return t.drop_columns(["_rn"]).append_column("file_idx", pa.array(f))

    return (
        numbered.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True),
        env,
    )


def zorder_layout(
    ds,
    col_a: str,
    col_b: str,
    id_col: str,
    rows_per_file: int,
    bits: int = 16,
):
    """Per-file stats of the Z-ordered layout: (file_idx, n_rows, and the
    min/max envelope of each clustered column) — exactly the data-skipping
    index a manifest records per file. Small output (O(files))."""
    from ray.data.aggregate import Count, Max, Min

    assigned, _env = zorder_assign(ds, col_a, col_b, id_col, rows_per_file, bits)
    return (
        assigned.groupby("file_idx").aggregate(
            Count(alias_name="n_rows"),
            Min(col_a, alias_name=f"{col_a}_min"),
            Max(col_a, alias_name=f"{col_a}_max"),
            Min(col_b, alias_name=f"{col_b}_min"),
            Max(col_b, alias_name=f"{col_b}_max"),
        )
    )


def zorder_sql_expr(col_a: str, col_b: str, bits: int = 16) -> str:
    """The Morton key as one (unrolled) SQL expression over pre-quantised
    integer columns ``{col_a}`` and ``{col_b}`` — bit-identical to
    ``_interleave``."""
    terms = []
    for i in range(bits):
        terms.append(f"((({col_a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({col_b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def files_pruned(
    stats_df, a_col: str, b_col: str, a_range: tuple, b_range: tuple
) -> tuple[int, int]:
    """(pruned, total) for predicate a in [a_range] AND b in [b_range]."""
    lo_a, hi_a = a_range
    lo_b, hi_b = b_range
    overlap = (
        (stats_df[f"{a_col}_max"] >= lo_a)
        & (stats_df[f"{a_col}_min"] <= hi_a)
        & (stats_df[f"{b_col}_max"] >= lo_b)
        & (stats_df[f"{b_col}_min"] <= hi_b)
    )
    total = len(stats_df)
    return total - int(overlap.sum()), total
