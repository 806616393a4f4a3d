"""Similarity search over an embedding column (list<float>).

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` and every batch does one numpy matmul against it; per-batch partial
top-k rows are merged by a final tiny per-query group sort. Scale path:
``lsh_bucket_topk`` buckets vectors by random-hyperplane signature so each query
only scans its bucket (approximate; recall grows with num_tables).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _topk_frame(
    q_ids_rep, ids, sims, k: int, id_col: str, round_to: int | None
) -> pd.DataFrame:
    """Shared ordering rule for partial AND merge: (cosine rounded desc, id
    asc) lexsort then head-k per query. Using one total order in both stages
    makes the distributed merge exact (top-k of a union of per-batch top-k)."""
    df = pd.DataFrame({"query_id": q_ids_rep, id_col: ids, "cosine": sims})
    if round_to is not None:
        df["cosine"] = df["cosine"].round(round_to)
    df = df.sort_values(
        ["query_id", "cosine", id_col], ascending=[True, False, True], kind="stable"
    )
    return df.groupby("query_id", sort=False).head(k)


def brute_force_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    round_to: int | None = 2,
):
    """Exact cosine top-k per query vector.

    Ranking rule is (cosine rounded to ``round_to`` desc, id asc) and is applied
    IDENTICALLY in the per-batch partial and the per-query merge, so the
    distributed merge is exact (top-k of a union of per-batch top-k under one
    total order). Rounding also absorbs float32-vs-float64 noise when results
    are compared against an independent engine.
    """
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qm))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q_ids, q = ray.get(ref)
        emb = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = q @ emb.T  # (Q, B)
        ids = batch[id_col].to_numpy()
        n_q, n_b = sims.shape
        return _topk_frame(
            np.repeat(q_ids, n_b), np.tile(ids, n_q), sims.reshape(-1),
            k, id_col, round_to,
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = _topk_frame(
            g["query_id"].to_numpy(), g[id_col].to_numpy(), g["cosine"].to_numpy(),
            k, id_col, round_to,
        )
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=4096)
    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


class HyperplaneLsh:
    """Random-hyperplane signature stage (actor pool): adds ``bucket`` column."""

    def __init__(self, dim: int, num_bits: int = 8, seed: int = 11):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((num_bits, dim))
        self.weights = (1 << np.arange(num_bits)).astype(np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        bits = (emb @ self.planes.T) > 0
        batch["bucket"] = (bits @ self.weights).astype(np.int64)
        return batch


def lsh_bucket_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    dim: int,
    k: int = 10,
    num_bits: int = 8,
    num_tables: int = 4,
    id_col: str = "vec_id",
    round_to: int | None = 2,
):
    """Approximate top-k: a vector is scanned for a query iff they share a
    bucket in ANY of ``num_tables`` independent hyperplane tables — the
    standard multi-table LSH recall lever (miss prob ≈ (1-p^bits)^tables).
    Still approximate: recall < 1 by construction, documented trade-off vs
    ``brute_force_topk``.

    Candidate membership is deterministic given the seeded planes, so the
    result is oracle-comparable: ``lsh_topk_oracle_sql`` reproduces the exact
    bucket assignment (planes inlined as literals) and the same
    (rounded-cosine desc, id asc) ranking in DuckDB."""
    import ray

    hashers = [HyperplaneLsh(dim, num_bits, seed=11 + 7 * t) for t in range(num_tables)]
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    # (Q, T) query bucket per table
    q_buckets = np.stack(
        [((qm @ h.planes.T) > 0) @ h.weights for h in hashers], axis=1
    ).astype(np.int64)
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qm, q_buckets))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q_ids, qvecs, qb = ray.get(ref)
        emb_raw = np.stack(batch["embedding"].to_numpy()).astype(np.float64)
        emb = _normalize(emb_raw)
        ids = batch[id_col].to_numpy()
        # (B, T) row bucket per table
        rb = np.stack(
            [((emb_raw @ h.planes.T) > 0) @ h.weights for h in hashers], axis=1
        ).astype(np.int64)
        out_q, out_i, out_s = [], [], []
        for qi in range(len(q_ids)):
            mask = (rb == qb[qi][None, :]).any(axis=1)
            if not mask.any():
                continue
            cand = np.nonzero(mask)[0]
            sims = emb[cand] @ qvecs[qi]
            out_q.append(np.full(len(cand), q_ids[qi], dtype=np.int64))
            out_i.append(ids[cand])
            out_s.append(sims)
        if not out_q:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 id_col: pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="float64")}
            )
        return _topk_frame(
            np.concatenate(out_q), np.concatenate(out_i), np.concatenate(out_s),
            k, id_col, round_to,
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = _topk_frame(
            g["query_id"].to_numpy(), g[id_col].to_numpy(), g["cosine"].to_numpy(),
            k, id_col, round_to,
        )
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=4096)
    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def lsh_topk_oracle_sql(
    dim: int,
    k: int = 10,
    num_queries: int = 5,
    num_bits: int = 8,
    num_tables: int = 4,
    table: str = "embeddings",
) -> str:
    """DuckDB mirror of ``lsh_bucket_topk``: the SAME seeded hyperplanes are
    inlined as float literals, bucket membership is the same sign-of-dot rule
    (float32 values widened to float64 on both sides), and ranking is the same
    (rounded-cosine desc, vec_id asc) order — so the approximate result is
    reproduced exactly, candidates and all."""
    hashers = [HyperplaneLsh(dim, num_bits, seed=11 + 7 * t) for t in range(num_tables)]

    def bucket_expr(t: int) -> str:
        terms = []
        for j in range(num_bits):
            vec = ", ".join(repr(float(x)) for x in hashers[t].planes[j])
            terms.append(
                f"(CASE WHEN list_dot_product(de, [{vec}]) > 0 THEN {1 << j} ELSE 0 END)"
            )
        return " + ".join(terms)

    buckets = ",\n               ".join(
        f"({bucket_expr(t)}) AS b{t}" for t in range(num_tables)
    )
    qcols = ", ".join(f"b{t}" for t in range(num_tables))
    on = " OR ".join(f"e.b{t} = q.b{t}" for t in range(num_tables))
    return f"""
        WITH b AS (
            SELECT vec_id, de,
               {buckets}
            FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM {table})
        ), q AS (
            SELECT vec_id AS query_id, de AS qe, {qcols}
            FROM b ORDER BY vec_id LIMIT {num_queries}
        ), sims AS (
            SELECT q.query_id, e.vec_id,
                   ROUND(CAST(list_cosine_similarity(e.de, q.qe) AS DOUBLE), 2) AS cosine
            FROM b e JOIN q ON ({on})
        )
        SELECT query_id, vec_id, cosine,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
               ) AS BIGINT) AS rank
        FROM sims
        QUALIFY rank <= {k}
    """
