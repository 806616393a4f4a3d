"""Cardinality sketches for training-data pipelines.

KMV (k-minimum-values) approximate distinct count: every value is md5-hashed
to a uniform point in [0,1); the k smallest distinct hashes are a sufficient
statistic for cardinality (est = (k-1)/h_k, Bar-Yossef et al. 2002, the
bottom-k sketch). Unlike HyperLogLog the sketch is DETERMINISTIC given the
hash, so the approximate answer itself is oracle-checkable in SQL
(``kmv_oracle_sql`` — DuckDB's md5() is the same function).

Scale shape: per-batch partial (unique values → k min hex hashes, ≤k rows per
batch leave the worker) → groupby dedup across batches → global sort+limit-k
on ≤ k·B rows → one-row estimate. Sketches from disjoint shards union by
re-applying the same k-min merge, so the operator is embarrassingly
combinable across a 256-node cluster.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# 16 hex chars = 64 bits; the estimator reads the top 13 (52 bits — exact in
# a float64 significand)
_HEX_LEN = 16
_FRAC_BITS = 13
_FRAC_DEN = float(16 ** _FRAC_BITS)  # 2^52


def _md5_hex(values: np.ndarray) -> np.ndarray:
    return np.array(
        [hashlib.md5(v.encode("utf-8")).hexdigest()[:_HEX_LEN] for v in values],
        dtype=object,
    )


def kmv_distinct(ds, col: str, k: int = 128):
    """Approximate distinct count of ``ds[col]`` (nulls excluded).

    Returns a one-row Dataset (n_sketch: int64, n_distinct_est: float64);
    ``n_sketch < k`` means the count was exact. The ≤k-row sketch is the only
    thing materialized on the driver.
    """

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[col].dropna().astype(str).unique()
        hs = np.sort(_md5_hex(vals))[:k]
        return pd.DataFrame({"h": pd.Series(hs, dtype="string")})

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=4096)
    sketch = (
        partials.groupby("h")
        .count()
        .sort("h")
        .limit(k)
        .to_pandas()
    )
    n = len(sketch)
    if n < k:
        est = float(n)
    else:
        h_k = str(sketch["h"].iloc[-1])
        est = (k - 1) / (int(h_k[:_FRAC_BITS], 16) / _FRAC_DEN)
    import ray.data

    return ray.data.from_pandas(
        pd.DataFrame({"n_sketch": np.array([n], dtype=np.int64),
                      "n_distinct_est": np.array([est], dtype=np.float64)})
    )


def kmv_oracle_sql(col: str, table: str, k: int = 128) -> str:
    """DuckDB mirror of ``kmv_distinct``: same md5 hash, same k-min sketch,
    same (k-1)/h_k float64 estimator (hex→int via exact 52-bit parse)."""
    parse = (
        f"list_reduce(list_transform(range(1, {_FRAC_BITS + 1}), "
        f"i -> CAST(strpos('0123456789abcdef', substr(hk, CAST(i AS INT), 1)) "
        f"AS BIGINT) - 1), (a, b) -> a * 16 + b)"
    )
    return f"""
        WITH h AS (
            SELECT DISTINCT substr(md5(CAST({col} AS VARCHAR)), 1, {_HEX_LEN}) AS h
            FROM {table} WHERE {col} IS NOT NULL
        ), topk AS (
            SELECT h FROM h ORDER BY h LIMIT {k}
        ), kth AS (
            SELECT max(h) AS hk, count(*) AS c FROM topk
        )
        SELECT CAST(c AS BIGINT) AS n_sketch,
               CASE WHEN c < {k} THEN CAST(c AS DOUBLE)
                    ELSE ({k} - 1) / (CAST({parse} AS DOUBLE) / {_FRAC_DEN!r})
               END AS n_distinct_est
        FROM kth
    """
