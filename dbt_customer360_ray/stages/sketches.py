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


# -- heavy hitters: Misra-Gries candidates + exact verify ----------------------


def _mg_summary(counts: pd.Series, k: int) -> pd.Series:
    """Reduce exact value counts to a ≤k-counter Misra-Gries summary: keep the
    top k and subtract the (k+1)-th largest from them (the standard reduction
    — each kept counter under-estimates by ≤ the decrement, and every item
    with true count above it survives)."""
    if len(counts) <= k:
        return counts
    counts = counts.sort_values(ascending=False, kind="stable")
    dec = int(counts.iloc[k])
    kept = counts.iloc[:k] - dec
    return kept[kept > 0]


def heavy_hitters(ds, col: str, phi: float, premerge_buckets: int = 64):
    """EXACT φ-heavy hitters over ``ds[col]`` (nulls excluded): every value
    with frequency ≥ ceil(φ·N), with its exact count — the classic two-pass
    scheme (Misra-Gries '82; merge rule per Agarwal et al., mergeable
    summaries).

    Pass 1 (one streaming scan + one lean tree level): each batch reduces its
    value counts to a ≤⌈2/φ⌉-counter MG summary, so only O(1/φ) rows per
    batch leave the worker; the summaries then TREE-MERGE through a
    hash-bucketed distributed level (bucket by value → sum → per-bucket MG
    re-reduction to ≤⌈2/φ⌉ counters) before the driver's final reduction, so
    the driver sees O(premerge_buckets/φ) rows — INDEPENDENT of batch count
    (at 100 TB, ~10⁷ batches would otherwise land O(#batches/φ) rows on the
    driver). MG summaries are mergeable by construction (merge = counter-wise
    sum, then reduce-to-k), and values are hash-DISJOINT across buckets, so
    per-bucket error ≤ n_b/(k+1) and the final global reduction adds
    ≤ n/(k+1): total under-count < φN, every true heavy hitter survives as a
    candidate. Pass 2 (one streaming scan): exact counts of the candidates
    only (broadcast membership, filtered partial counts, tiny groupby), then
    the exact ≥⌈φN⌉ threshold. Deterministic and exact, so fully
    SQL-oracle-able; both scans are map-only + lean reduces — no all-to-all
    on row data at any scale.
    """
    import ray.data

    from ..hashing import stable_hash

    if not (0 < phi < 1):
        raise ValueError(f"heavy_hitters: phi must be in (0,1), got {phi}")
    k = int(np.ceil(2.0 / phi))

    def partial_mg(batch: pd.DataFrame) -> pd.DataFrame:
        vals = batch[col].dropna().astype(str)
        mg = _mg_summary(vals.value_counts(), k)
        if not len(mg) and len(vals):
            # an all-ties batch can MG-reduce to nothing; the row count must
            # still reach the total — ride it on a zero-count carrier row
            return pd.DataFrame(
                {"value": [vals.iloc[0]], "c": np.int64(0),
                 "n_rows": np.int64(len(vals))}
            )
        n_rows = np.zeros(len(mg), dtype=np.int64)
        if len(mg):  # the batch's row count rides on ONE summary row
            n_rows[0] = len(vals)
        return pd.DataFrame(
            {
                "value": mg.index.astype(str),
                "c": mg.to_numpy(dtype=np.int64),
                "n_rows": n_rows,
            }
        )

    def tag(df: pd.DataFrame, nb=premerge_buckets) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = (
            stable_hash(df["value"].to_numpy()) % np.uint64(nb)
        ).astype(np.int64)
        return df

    def premerge(grp: pd.DataFrame) -> pd.DataFrame:
        summed = grp.groupby("value")["c"].sum()
        mg = _mg_summary(summed[summed > 0], k)
        nb = np.int64(grp["n_rows"].sum())
        if not len(mg):
            return pd.DataFrame(
                {"value": [str(grp["value"].iloc[0])], "c": np.int64(0),
                 "n_rows": nb}
            )
        out = pd.DataFrame(
            {"value": mg.index.astype(str), "c": mg.to_numpy(dtype=np.int64)}
        )
        n_rows = np.zeros(len(out), dtype=np.int64)
        n_rows[0] = nb
        out["n_rows"] = n_rows
        return out

    # typed Arrow result schema: an all-filtered outcome must still carry the
    # (value, n) columns — ray.data.from_pandas on an empty frame loses them
    import pyarrow as pa

    out_schema = pa.schema([("value", pa.string()), ("n", pa.int64())])

    parts = (
        ds.map_batches(partial_mg, batch_format="pandas")
        .map_batches(tag, batch_format="pandas")
        .groupby("bucket")
        .map_groups(premerge, batch_format="pandas")
        .to_pandas()
    )
    total = int(parts["n_rows"].sum()) if len(parts) else 0
    if total == 0:
        return ray.data.from_arrow(out_schema.empty_table())
    merged = parts[parts["c"] > 0].groupby("value")["c"].sum()
    merged = _mg_summary(merged, k)
    cands = set(merged.index.astype(str))
    threshold = int(np.ceil(phi * total))

    def exact_counts(batch: pd.DataFrame, members=frozenset(cands)) -> pd.DataFrame:
        vals = batch[col].dropna().astype(str)
        hit = vals[vals.isin(members)].value_counts()
        return pd.DataFrame(
            {"value": hit.index.astype(str), "n": hit.to_numpy(dtype=np.int64)}
        )

    # the grouped candidate-count table is ≤⌈2/φ⌉ rows by construction, so the
    # threshold filter finishes on the driver with a TYPED result — a
    # distributed filter that drops every row would otherwise surface as a
    # schemaless empty Dataset (columns lost in to_pandas)
    counts = (
        ds.map_batches(exact_counts, batch_format="pandas")
        .groupby("value")
        .sum("n")
        .to_pandas()
    )
    if len(counts):
        counts = counts.rename(columns={"sum(n)": "n"})
        counts = counts[counts["n"] >= threshold]
    if not len(counts):
        return ray.data.from_arrow(out_schema.empty_table())
    return ray.data.from_arrow(
        pa.table(
            {
                "value": pa.array(counts["value"].astype(str), pa.string()),
                "n": pa.array(counts["n"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )
    )


def heavy_hitters_oracle_sql(col: str, table: str, phi: float) -> str:
    """DuckDB mirror of ``heavy_hitters``: the exact definition (two-pass MG
    is exact by construction, so the oracle is just GROUP BY + HAVING)."""
    return f"""
        SELECT CAST({col} AS VARCHAR) AS value, count(*) AS n
        FROM {table}
        WHERE {col} IS NOT NULL
        GROUP BY 1
        HAVING count(*) >= ceil({phi} * (
            SELECT count(*) FROM {table} WHERE {col} IS NOT NULL))
    """


def sample_quantiles(
    ds,
    id_col: str,
    value_col: str,
    qs_permille: tuple = (100, 500, 900, 990),
    k: int = 256,
    salt: str = "quant",
):
    """Approximate quantiles from a deterministic bottom-k uniform sample —
    the quantile cousin of ``kmv_distinct``: hashing row IDS to [0,1) and
    keeping the k smallest hashes IS a uniform k-sample of the rows
    (bottom-k sampling, Cohen & Kaplan 2007), and the q-quantile of that
    sample estimates the population quantile with error O(1/sqrt(k)).
    Deterministic given the hash, so the approximate answer itself is
    oracle-checkable (``sample_quantiles_oracle_sql`` — same md5, same
    sample, same order statistic).

    Per batch ≤k (hash, value) rows leave the worker; a distributed
    sort+limit-k reduces the k·B candidates; the driver holds only the k-row
    sample. The quantile is the type-1 order statistic: sorted ASC, index
    ceil(q·n) computed in INTEGER arithmetic ((q‰·n + 999) // 1000) — no
    float boundary to diverge. ``value_col`` must be integer."""
    import ray.data

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].astype(str).to_numpy()
        hs = np.array(
            [hashlib.md5(f"{salt}{v}".encode("utf-8")).hexdigest()[:_HEX_LEN] for v in ids],
            dtype=object,
        )
        out = pd.DataFrame(
            {"h": pd.Series(hs, dtype="string"), "v": batch[value_col].to_numpy(np.int64)}
        )
        return out.sort_values("h", kind="stable").head(k)

    sample = (
        ds.map_batches(partial, batch_format="pandas", batch_size=4096)
        .sort("h")
        .limit(k)
        .to_pandas()
    )
    n = len(sample)
    vals = np.sort(sample["v"].to_numpy(np.int64))
    qp = np.asarray(qs_permille, dtype=np.int64)
    idx = np.maximum((qp * n + 999) // 1000, 1) - 1
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "q_permille": qp,
                "value_est": vals[idx],
                "n_sample": np.full(len(qp), n, dtype=np.int64),
            }
        )
    )


def sample_quantiles_oracle_sql(
    table: str,
    id_col: str,
    value_expr: str,
    qs_permille: tuple = (100, 500, 900, 990),
    k: int = 256,
    salt: str = "quant",
) -> str:
    """DuckDB mirror of ``sample_quantiles``: same md5 bottom-k sample, same
    integer ceil index, same order statistic. ``value_expr`` must already be
    BIGINT-typed."""
    qvals = ", ".join(f"({q})" for q in qs_permille)
    return f"""
        WITH s AS (
            SELECT {value_expr} AS v,
                   substr(md5('{salt}' || CAST({id_col} AS VARCHAR)), 1, {_HEX_LEN}) AS h
            FROM {table}
            ORDER BY h LIMIT {k}
        ), ranked AS (
            SELECT v, row_number() OVER (ORDER BY v) AS rn,
                   count(*) OVER () AS n
            FROM s
        )
        SELECT CAST(q.qp AS BIGINT) AS q_permille,
               CAST(r.v AS BIGINT) AS value_est,
               CAST(r.n AS BIGINT) AS n_sample
        FROM (VALUES {qvals}) q(qp)
        JOIN ranked r
          ON r.rn = GREATEST((q.qp * r.n + 999) // 1000, 1)
    """


# -- KMV set operations: vocabulary overlap between corpus slices --------------


def kmv_vocab_overlap(
    ds,
    text_col: str = "text",
    group_col: str = "lang",
    a: str = "en",
    b: str = "fr",
    k: int = 256,
):
    """Distinct-token SET OPERATIONS between two corpus slices from mergeable
    KMV sketches — the corpus-comparison question data mixing asks ("how much
    vocabulary do slices A and B share?") answered in one pass with ≤k rows
    per side ever leaving the cluster.

    KMV sketches are closed under union: bottom-k(A ∪ B) =
    bottom-k(bottom-k(A) ∪ bottom-k(B)), so |A∪B| uses the same (k-1)/h_k
    estimator, Jaccard is the fraction of the union sketch present in BOTH
    side sketches (Beyer et al. 2007), and |A∩B| = J·|A∪B|. Every estimate is
    a deterministic function of md5, reproduced verbatim by
    ``kmv_overlap_oracle_sql`` — the approximate answers themselves are
    oracle-checked. Returns one row:
    (n_a_sketch, n_b_sketch, n_union_sketch, n_intersect_sketch: int64;
     n_a_est, n_b_est, n_union_est, jaccard_est, n_intersect_est: float64)."""
    import ray.data

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for side in (a, b):
            txt = batch.loc[batch[group_col] == side, text_col].dropna()
            if not len(txt):
                continue
            toks = pd.unique(
                np.concatenate([t.split(" ") for t in txt]) if len(txt) else []
            )
            toks = np.array([t for t in toks if t != ""], dtype=object)
            hs = np.sort(_md5_hex(toks))[:k]
            out.append(pd.DataFrame({"side": side, "h": pd.Series(hs, dtype="string")}))
        if not out:
            return pd.DataFrame(
                {"side": pd.Series([], dtype="string"),
                 "h": pd.Series([], dtype="string")}
            )
        return pd.concat(out, ignore_index=True)

    partials = ds.map_batches(
        partial, batch_format="pandas", batch_size=4096
    ).materialize()

    def side_sketch(side: str) -> list:
        sk = (
            partials.map_batches(
                lambda df, s=side: df[df["side"] == s][["h"]],
                batch_format="pandas",
            )
            .groupby("h")
            .count()
            .sort("h")
            .limit(k)
            .to_pandas()
        )
        return [str(h) for h in sk["h"]]

    ha, hb = side_sketch(a), side_sketch(b)

    def est(hs: list) -> float:
        if len(hs) < k:
            return float(len(hs))
        return (k - 1) / (int(hs[-1][:_FRAC_BITS], 16) / _FRAC_DEN)

    sa, sb = set(ha), set(hb)
    union = sorted(sa | sb)[:k]
    inter = [h for h in union if h in sa and h in sb]
    n_union = est(union)
    jacc = (len(inter) / len(union)) if union else 0.0
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "n_a_sketch": np.array([len(ha)], np.int64),
                "n_b_sketch": np.array([len(hb)], np.int64),
                "n_union_sketch": np.array([len(union)], np.int64),
                "n_intersect_sketch": np.array([len(inter)], np.int64),
                "n_a_est": np.array([est(ha)], np.float64),
                "n_b_est": np.array([est(hb)], np.float64),
                "n_union_est": np.array([n_union], np.float64),
                "jaccard_est": np.array([jacc], np.float64),
                "n_intersect_est": np.array([jacc * n_union], np.float64),
            }
        )
    )


def kmv_overlap_oracle_sql(
    table: str,
    text_col: str = "text",
    group_col: str = "lang",
    a: str = "en",
    b: str = "fr",
    k: int = 256,
) -> str:
    """DuckDB mirror of ``kmv_vocab_overlap``: same tokenization (split on
    single space, '' dropped), same md5 16-hex prefix, same bottom-k per
    side, same merged-union sketch and (k-1)/h_k estimator."""

    def parse(col: str) -> str:
        return (
            f"list_reduce(list_transform(range(1, {_FRAC_BITS + 1}), "
            f"i -> CAST(strpos('0123456789abcdef', substr({col}, CAST(i AS INT), 1)) "
            f"AS BIGINT) - 1), (x, y) -> x * 16 + y)"
        )

    def est(cte: str) -> str:
        return f"""
            CASE WHEN (SELECT count(*) FROM {cte}) < {k}
                 THEN CAST((SELECT count(*) FROM {cte}) AS DOUBLE)
                 ELSE ({k} - 1) / (CAST((SELECT {parse("h")} FROM {cte}
                                         ORDER BY h DESC LIMIT 1) AS DOUBLE)
                                   / {_FRAC_DEN!r})
            END"""

    return f"""
        WITH tok AS (
            SELECT {group_col} AS side,
                   unnest(string_split({text_col}, ' ')) AS tok
            FROM {table}
            WHERE {group_col} IN ('{a}', '{b}') AND {text_col} IS NOT NULL
        ), hs AS (
            SELECT DISTINCT side, substr(md5(tok), 1, {_HEX_LEN}) AS h
            FROM tok WHERE tok <> ''
        ),
        ka AS (SELECT h FROM hs WHERE side = '{a}' ORDER BY h LIMIT {k}),
        kb AS (SELECT h FROM hs WHERE side = '{b}' ORDER BY h LIMIT {k}),
        ku AS (
            SELECT DISTINCT h
            FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
            ORDER BY h LIMIT {k}
        ),
        ki AS (
            SELECT h FROM ku
            WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
        )
        SELECT CAST((SELECT count(*) FROM ka) AS BIGINT) AS n_a_sketch,
               CAST((SELECT count(*) FROM kb) AS BIGINT) AS n_b_sketch,
               CAST((SELECT count(*) FROM ku) AS BIGINT) AS n_union_sketch,
               CAST((SELECT count(*) FROM ki) AS BIGINT) AS n_intersect_sketch,
               {est("ka")} AS n_a_est,
               {est("kb")} AS n_b_est,
               {est("ku")} AS n_union_est,
               CASE WHEN (SELECT count(*) FROM ku) = 0 THEN 0.0
                    ELSE CAST((SELECT count(*) FROM ki) AS DOUBLE)
                         / (SELECT count(*) FROM ku)
               END AS jaccard_est,
               (CASE WHEN (SELECT count(*) FROM ku) = 0 THEN 0.0
                     ELSE CAST((SELECT count(*) FROM ki) AS DOUBLE)
                          / (SELECT count(*) FROM ku)
                END) * ({est("ku")}) AS n_intersect_est
    """
