"""Sequence packing: assign whole documents to fixed token-budget bins.

The step before writing fixed-length pretraining sequences: examples are
concatenated greedily until the sequence budget is hit, then a new bin starts
(the T5 / GPT "example packing" recipe — next-fit over a deterministic order;
cf. Raffel et al. 2020 §3.1.2's packed batches). This stage answers *which
docs share a sequence* so an egress can materialize each bin with one task;
mid-document truncation is the token egress's concern, not packing's.

Determinism + cluster-size invariance: bin membership must be a pure function
of the corpus, never of partition layout, so docs are routed to ``num_buckets``
md5 buckets (SQL-reproducible — same hex parse as ``stages/sampling``) and
packed WITHIN each bucket in id order. The next-fit recurrence
(``fill + n > budget → open a new bin``) is inherently sequential, so the
parallelism unit is the bucket: the house split→fold task exchange (one fold
task per bucket, only (id, n_tokens) rows ever move — no Dataset-groupby
aggregator fixed costs on a lean table). At 100 TB the bucket count scales
with the corpus (buckets are independent; packing quality is per-bucket
next-fit either way) and a bucket's working set is 16 bytes/doc.

Oracle: ``pack_next_fit_oracle_sql`` reproduces the recurrence exactly with a
DuckDB recursive CTE stepping rn→rn+1 per bucket.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_HEX_BITS = 13  # 52 bits, exact in float64 — same parse as stages/sampling


def _md5_mod(values, salt: str, mod: int) -> np.ndarray:
    """md5(salt || str(id)) first 13 hex chars as int, mod ``mod``."""
    return np.array(
        [
            int(hashlib.md5(f"{salt}{v}".encode("utf-8")).hexdigest()[:_HEX_BITS], 16)
            % mod
            for v in values
        ],
        dtype=np.int64,
    )


def _md5_mod_sql(id_col: str, salt: str, mod: int) -> str:
    """DuckDB mirror of ``_md5_mod`` (same md5, same 52-bit hex parse)."""
    parse = (
        f"list_reduce(list_transform(range(1, {_HEX_BITS + 1}), "
        f"i -> CAST(strpos('0123456789abcdef', substr(md5('{salt}' || "
        f"CAST({id_col} AS VARCHAR)), CAST(i AS INT), 1)) AS BIGINT) - 1), "
        f"(a, b) -> a * 16 + b)"
    )
    return f"({parse}) % {mod}"


_EMPTY = pa.table(
    {
        "id": pa.array([], pa.string()),
        "n_tokens": pa.array([], pa.int64()),
        "bucket": pa.array([], pa.int64()),
        "bin_idx": pa.array([], pa.int64()),
        "pos_in_bin": pa.array([], pa.int64()),
        "bin_fill": pa.array([], pa.int64()),
    }
)


def _pack_bucket(bucket: int, budget: int, *parts: pa.Table) -> pa.Table:
    """Next-fit over one bucket's docs in id order. Sequential by definition
    (each decision depends on the running fill), but the loop body is trivial
    and the bucket is the parallelism unit — O(docs/bucket) per task."""
    tbl = pa.concat_tables(parts)
    if tbl.num_rows == 0:
        return _EMPTY
    df = tbl.to_pandas().sort_values("id", kind="stable")
    toks = df["n_tokens"].to_numpy(np.int64)
    bin_idx = np.empty(len(toks), np.int64)
    pos = np.empty(len(toks), np.int64)
    fill_out = np.empty(len(toks), np.int64)
    b, fill, p = 0, 0, 0
    for i, n in enumerate(toks):
        if i > 0 and fill + n > budget:
            b, fill, p = b + 1, 0, 0
        fill += int(n)
        bin_idx[i], pos[i], fill_out[i] = b, p, fill
        p += 1
    return pa.table(
        {
            "id": pa.array(df["id"].to_numpy(dtype=object), pa.string()),
            "n_tokens": pa.array(toks),
            "bucket": pa.array(np.full(len(toks), bucket, np.int64)),
            "bin_idx": pa.array(bin_idx),
            "pos_in_bin": pa.array(pos),
            "bin_fill": pa.array(fill_out),
        }
    )


def pack_next_fit(
    ds,
    id_col: str,
    tokens_col: str,
    budget: int,
    num_buckets: int = 32,
    salt: str = "pack",
):
    """Pack ``ds``'s docs into fixed token-``budget`` bins (md5-bucketed
    next-fit in id order). Returns one row per doc:
    ``(id_col, n_tokens, bucket, bin_idx, pos_in_bin, bin_fill)`` where
    ``bin_fill`` is the running bin total after placing the doc (the last
    doc's value is the bin's packed size). An oversize doc (n > budget)
    occupies a bin alone; bins never exceed the budget otherwise."""
    import ray
    import ray.data

    def lean(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pandas().to_numpy(dtype=object)
        return pa.table(
            {
                "id": pa.array(ids, pa.string()),
                "n_tokens": batch.column(tokens_col).cast(pa.int64()),
                "b": pa.array(_md5_mod(ids, salt, num_buckets)),
            }
        )

    slim = ds.map_batches(lean, batch_format="pyarrow").materialize()
    B = num_buckets

    def _split(t: pa.Table) -> list:
        b = t.column("b").to_numpy(zero_copy_only=False)
        order = np.argsort(b, kind="stable")
        tt, sb = t.drop_columns(["b"]).take(pa.array(order)), b[order]
        cuts = np.searchsorted(sb, np.arange(B + 1))
        return [tt.slice(cuts[i], cuts[i + 1] - cuts[i]) for i in range(B)]

    split = ray.remote(num_returns=B)(_split)
    fold = ray.remote(_pack_bucket)
    cols = [split.remote(r) for r in slim.to_arrow_refs()]
    packed = ray.data.from_arrow_refs(
        [fold.remote(b, budget, *[c[b] for c in cols]) for b in range(B)]
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            [id_col if c == "id" else c for c in t.column_names]
        )

    return packed.map_batches(rename, batch_format="pyarrow")


def pack_next_fit_oracle_sql(
    inner_sql: str,
    id_col: str,
    tokens_col: str,
    budget: int,
    num_buckets: int = 32,
    salt: str = "pack",
) -> str:
    """DuckDB mirror of ``pack_next_fit``: same md5 bucket, same id order,
    same next-fit recurrence — stepped exactly by a recursive CTE joining
    rn → rn+1 within each bucket."""
    return f"""
        WITH RECURSIVE docs AS (
            SELECT CAST({id_col} AS VARCHAR) AS id,
                   CAST({tokens_col} AS BIGINT) AS n_tokens,
                   {_md5_mod_sql(id_col, salt, num_buckets)} AS bucket
            FROM ({inner_sql})
        ), ord AS (
            SELECT *, row_number() OVER (
                       PARTITION BY bucket ORDER BY id) AS rn
            FROM docs
        ), packed AS (
            SELECT bucket, rn, id, n_tokens,
                   CAST(0 AS BIGINT) AS bin_idx,
                   n_tokens AS fill
            FROM ord WHERE rn = 1
            UNION ALL
            SELECT o.bucket, o.rn, o.id, o.n_tokens,
                   CASE WHEN p.fill + o.n_tokens > {budget}
                        THEN p.bin_idx + 1 ELSE p.bin_idx END,
                   CASE WHEN p.fill + o.n_tokens > {budget}
                        THEN o.n_tokens ELSE p.fill + o.n_tokens END
            FROM ord o JOIN packed p
              ON o.bucket = p.bucket AND o.rn = p.rn + 1
        )
        SELECT id AS {id_col}, n_tokens, bucket, bin_idx,
               CAST(row_number() OVER (
                   PARTITION BY bucket, bin_idx ORDER BY id
               ) AS BIGINT) - 1 AS pos_in_bin,
               fill AS bin_fill
        FROM packed
    """
