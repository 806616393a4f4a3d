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

    def topk_frame(q_ids_rep, ids, sims) -> pd.DataFrame:
        """shared ordering rule: (-cosine, id) lexsort then head-k per query."""
        df = pd.DataFrame({"query_id": q_ids_rep, id_col: ids, "cosine": sims})
        if round_to is not None:
            df["cosine"] = df["cosine"].round(round_to)
        df = df.sort_values(
            ["query_id", "cosine", id_col], ascending=[True, False, True], kind="stable"
        )
        return df.groupby("query_id", sort=False).head(k)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q_ids, q = ray.get(ref)
        emb = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = q @ emb.T  # (Q, B)
        ids = batch[id_col].to_numpy()
        n_q, n_b = sims.shape
        return topk_frame(
            np.repeat(q_ids, n_b), np.tile(ids, n_q), sims.reshape(-1)
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = topk_frame(
            g["query_id"].to_numpy(), g[id_col].to_numpy(), g["cosine"].to_numpy()
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
    id_col: str = "vec_id",
):
    """Approximate top-k: only vectors sharing the query's hyperplane bucket are
    scanned. One table; recall < 1 by construction (documented trade-off)."""
    import ray

    hasher = HyperplaneLsh(dim, num_bits)
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    q_buckets = ((qm @ hasher.planes.T) > 0) @ hasher.weights
    by_bucket: dict[int, list[int]] = {}
    for qi, b in zip(np.asarray(query_ids, dtype=np.int64), q_buckets.astype(np.int64)):
        by_bucket.setdefault(int(b), []).append(int(qi))
    ref = ray.put((by_bucket, {int(q): qm[i] for i, q in enumerate(np.asarray(query_ids))}))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        buckets_map, qvecs = ray.get(ref)
        frames = []
        for b, grp in batch.groupby("bucket"):
            q_ids = buckets_map.get(int(b))
            if not q_ids:
                continue
            emb = _normalize(np.stack(grp["embedding"].to_numpy()).astype(np.float64))
            ids = grp[id_col].to_numpy()
            for qid in q_ids:
                sims = emb @ qvecs[qid]
                kk = min(k, len(sims))
                top = np.argpartition(-sims, kk - 1)[:kk]
                frames.append(
                    pd.DataFrame(
                        {"query_id": qid, id_col: ids[top], "cosine": sims[top]}
                    )
                )
        if not frames:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 id_col: pd.Series([], dtype="int64"),
                 "cosine": pd.Series([], dtype="float64")}
            )
        return pd.concat(frames, ignore_index=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True], kind="stable").head(k)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    bucketed = ds.map_batches(
        lambda b: hasher(b), batch_format="pandas", batch_size=4096
    )
    partials = bucketed.map_batches(partial, batch_format="pandas", batch_size=4096)
    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")
