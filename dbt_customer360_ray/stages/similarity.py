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


def ivf_seeded_centroids(dim: int, num_clusters: int = 16, seed: int = 23) -> np.ndarray:
    """Pretrained coarse quantizer stand-in: seeded random unit vectors.

    At lake scale the quantizer is trained ONCE offline (``ivf_train_centroids``)
    and broadcast; the oracled query entry pins this seeded variant instead so a
    single SQL string (centroids inlined as literals) is valid at every scale
    factor the driver runs."""
    rng = np.random.default_rng(seed)
    return _normalize(rng.standard_normal((num_clusters, dim)))


def _ivf_fit(sample: pd.DataFrame, num_clusters: int, iters: int, id_col: str) -> np.ndarray:
    """Deterministic Lloyd's k-means core shared by the Ray training path and
    the no-Ray oracle builder: sample sorted by id (unique ids → one total
    order regardless of block arrival order), init = first ``num_clusters``
    sampled vectors, argmax assignment (first-wins on ties), empty clusters
    keep their previous centroid."""
    sample = sample.sort_values(id_col, kind="stable")
    x = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float64))
    c = min(num_clusters, len(x))
    centroids = x[:c].copy()
    for _ in range(iters):
        assign = np.argmax(x @ centroids.T, axis=1)
        for j in range(c):
            members = x[assign == j]
            if len(members):
                m = members.mean(axis=0)
                centroids[j] = m / max(np.linalg.norm(m), 1e-12)
    return centroids


def ivf_train_centroids(
    ds,
    num_clusters: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: Lloyd's k-means over a stable
    hash-mod sample of the (normalized) vectors.

    The sample filter is map-only (``stable_hash(id) % mod == 0`` — no
    sort/shuffle, deterministic across runs and cluster sizes); only
    ``~sample_size`` sampled vectors reach the driver. Every step is
    deterministic, so the trained centroids can be inlined into a SQL oracle
    (``ivf_topk_oracle_sql``) — ``ivf_train_centroids_table`` reproduces them
    from the same parquet without a Ray session."""
    from ..hashing import stable_hash

    n = ds.count()
    mod = max(1, n // sample_size)

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        keep = (stable_hash(batch[id_col]) % np.uint64(mod)) == 0
        return batch.loc[keep, [id_col, "embedding"]]

    sample = ds.map_batches(pick, batch_format="pandas").to_pandas()
    return _ivf_fit(sample, num_clusters, iters, id_col)


def ivf_train_centroids_table(
    table,
    num_clusters: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    id_col: str = "vec_id",
) -> np.ndarray:
    """No-Ray twin of ``ivf_train_centroids`` over an in-memory pyarrow Table
    (same hash-mod sample rule, same fit) — used to inline the identical
    centroids into the DuckDB oracle."""
    from ..hashing import stable_hash

    df = table.select([id_col, "embedding"]).to_pandas()
    mod = max(1, len(df) // sample_size)
    keep = (stable_hash(df[id_col]) % np.uint64(mod)) == 0
    return _ivf_fit(df.loc[keep], num_clusters, iters, id_col)


def ivf_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    num_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    round_to: int | None = 2,
    centroids: np.ndarray | None = None,
):
    """IVF (inverted-file) approximate top-k — the classic ANN scale path:
    vectors are assigned to their nearest coarse centroid, and each query
    scans only its ``nprobe`` nearest centroids' lists (here: a vectorized
    per-batch mask — at lake scale the assignment becomes the partition key
    so probes read only ``nprobe`` partitions). ``nprobe == num_clusters``
    degenerates to exact brute force. Deterministic end to end (trained
    centroids + argmax assignment), so the approximate answer itself is
    oracle-checkable via ``ivf_topk_oracle_sql`` with the centroids inlined.
    """
    import ray

    if centroids is None:
        centroids = ivf_train_centroids(ds, num_clusters=num_clusters, id_col=id_col)
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    nprobe = min(nprobe, len(centroids))
    # (Q, nprobe) probed cluster ids: centroid-similarity desc, cluster id asc
    order = np.lexsort((np.arange(len(centroids))[None, :].repeat(len(qm), 0),
                        -(qm @ centroids.T)), axis=1)
    probes = order[:, :nprobe]
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), qm, centroids, probes))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q_ids, q, cent, prb = ray.get(ref)
        emb = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        ids = batch[id_col].to_numpy()
        assign = np.argmax(emb @ cent.T, axis=1)  # (B,)
        out_q, out_i, out_s = [], [], []
        for qi in range(len(q_ids)):
            mask = np.isin(assign, prb[qi])
            if not mask.any():
                continue
            cand = np.nonzero(mask)[0]
            out_q.append(np.full(len(cand), q_ids[qi], dtype=np.int64))
            out_i.append(ids[cand])
            out_s.append(emb[cand] @ q[qi])
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


def ivf_topk_oracle_sql(
    centroids: np.ndarray,
    k: int = 10,
    num_queries: int = 5,
    nprobe: int = 4,
    table: str = "embeddings",
) -> str:
    """DuckDB mirror of ``ivf_topk``: the trained centroids are inlined as
    float literals; cluster assignment is argmax of centroid dot products
    (``list_position(dl, list_max(dl))`` — first occurrence on ties, matching
    np.argmax); probes are each query's nprobe best (centroid-sim desc,
    cluster id asc); ranking is the shared (rounded-cosine desc, id asc)."""
    c = len(centroids)

    def lit(v) -> str:
        return "[" + ", ".join(repr(float(x)) for x in v) + "]"

    dots = ", ".join(
        f"list_dot_product(ne, {lit(centroids[j])})" for j in range(c)
    )
    return f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> x / sqrt(list_dot_product(
                                      CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))) AS ne
            FROM {table}
        ), a AS (
            SELECT vec_id, ne, dl,
                   CAST(list_position(dl, list_max(dl)) - 1 AS BIGINT) AS cluster
            FROM (SELECT vec_id, ne, [{dots}] AS dl FROM v)
        ), q AS (
            SELECT vec_id AS query_id, ne AS qe, dl AS qdl
            FROM a ORDER BY vec_id LIMIT {num_queries}
        ), probes AS (
            SELECT query_id, j.j AS cluster
            FROM q, range({c}) j(j)
            QUALIFY row_number() OVER (
                PARTITION BY query_id ORDER BY qdl[CAST(j.j AS INT) + 1] DESC, j.j ASC
            ) <= {nprobe}
        ), sims AS (
            SELECT q.query_id, a.vec_id,
                   ROUND(list_dot_product(a.ne, q.qe), 2) AS cosine
            FROM a
            JOIN probes p ON p.cluster = a.cluster
            JOIN q ON q.query_id = p.query_id
        )
        SELECT query_id, vec_id, cosine,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
               ) AS BIGINT) AS rank
        FROM sims
        QUALIFY rank <= {k}
    """


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


def kmeans_assign(ds, centroids: np.ndarray, id_col: str = "vec_id"):
    """Corpus clustering: assign every vector to its nearest (max-dot over
    normalized vectors) centroid — map-only over a broadcast centroid matrix;
    at lake scale the cluster id becomes the partition key for downstream
    per-cluster work (dedup within topic, stratified sampling). Deterministic
    (argmax, first on ties) so the assignment is oracle-checkable with the
    centroids inlined (``kmeans_assign_oracle_sql``)."""
    import ray

    ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        cent = ray.get(ref)
        emb = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "cluster": np.argmax(emb @ cent.T, axis=1).astype(np.int64),
            }
        )

    return ds.map_batches(assign, batch_format="pandas", batch_size=4096)


def kmeans_assign_oracle_sql(centroids: np.ndarray, table: str = "embeddings") -> str:
    """DuckDB mirror of ``kmeans_assign`` (same a-CTE shape as
    ``ivf_topk_oracle_sql``): argmax via list_position(dl, list_max(dl)) —
    first occurrence on ties, matching np.argmax."""
    def lit(v) -> str:
        return "[" + ", ".join(repr(float(x)) for x in v) + "]"

    dots = ", ".join(
        f"list_dot_product(ne, {lit(c)})" for c in np.asarray(centroids)
    )
    return f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> x / sqrt(list_dot_product(
                                      CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))) AS ne
            FROM {table}
        )
        SELECT vec_id,
               CAST(list_position(dl, list_max(dl)) - 1 AS BIGINT) AS cluster
        FROM (SELECT vec_id, [{dots}] AS dl FROM v)
    """


def quantize_int8(ds, id_col: str = "vec_id", vec_col: str = "embedding"):
    """Scalar int8 quantization of an embedding column — the storage-side
    compression step of an ANN index build (4x smaller than float32).
    Per vector: scale = max(|x|); code_i = floor(x_i / scale * 127 + 0.5)
    (floor-plus-half rounding — deterministic and SQL-reproducible, unlike
    numpy's round-half-even vs SQL round-half-away). All arithmetic is forced
    to float64 on both sides, so the codes are bit-exactly oracle-checkable.
    Map-only; emits one (id, dim_idx, code, scale-as-code sign check) row per
    dimension for the oracle's sake — a production sink would keep the
    fixed_size_list form instead.
    """

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        mat = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        n, d = mat.shape
        scale = np.abs(mat).max(axis=1)
        safe = np.where(scale == 0.0, 1.0, scale)
        codes = np.floor(mat / safe[:, None] * 127.0 + 0.5).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: np.repeat(ids, d),
                "dim_idx": np.tile(np.arange(d, dtype=np.int64), n),
                "code": codes.reshape(-1),
            }
        )

    return ds.map_batches(kernel, batch_format="pandas")


def rp_sign_planes(dim: int, out_dim: int = 8, seed: int = 29) -> np.ndarray:
    """Achlioptas (2003) sparse sign projection matrix: entries ∈ {+1, 0, −1}
    with probabilities {1/6, 2/3, 1/6} — a JL-lemma projection that needs no
    floats at all. Seeded and deterministic, so the oracle inlines it."""
    rng = np.random.default_rng(seed)
    draw = rng.integers(0, 6, (out_dim, dim))
    return (np.where(draw == 0, 1, 0) - np.where(draw == 1, 1, 0)).astype(np.int64)


def rp_sketch(
    ds,
    dim: int,
    out_dim: int = 8,
    seed: int = 29,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Johnson-Lindenstrauss dimensionality reduction as an INTEGER sketch:
    int8-quantize each vector (same floor-plus-half recipe as
    ``quantize_int8``), then project through a seeded Achlioptas sparse-sign
    matrix. All arithmetic after quantization is int64 — sums of small
    integers are exact in any evaluation order, so the sketch is bit-exactly
    oracle-checkable (no float-summation ULP hazard). Map-only: the
    (out_dim × dim) sign matrix ships once in the task closure; this is the
    shrink-before-ANN/clustering step for an embedding corpus at lake scale.
    Emits one (id, proj_idx, value) row per output dimension."""
    R = rp_sign_planes(dim, out_dim, seed)

    def kernel(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        mat = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        scale = np.abs(mat).max(axis=1)
        safe = np.where(scale == 0.0, 1.0, scale)
        codes = np.floor(mat / safe[:, None] * 127.0 + 0.5).astype(np.int64)
        proj = codes @ R.T
        n = len(ids)
        return pd.DataFrame(
            {
                id_col: np.repeat(ids, out_dim),
                "proj_idx": np.tile(np.arange(out_dim, dtype=np.int64), n),
                "value": proj.reshape(-1),
            }
        )

    return ds.map_batches(kernel, batch_format="pandas")


def rp_sketch_oracle_sql(
    dim: int,
    out_dim: int = 8,
    seed: int = 29,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB mirror of ``rp_sketch``: the SAME seeded sign matrix inlined as
    a VALUES relation (all entries, zeros included, so every (id, proj_idx)
    group sums over exactly ``dim`` rows); quantization is the shared float64
    floor-plus-half expression; the projection is an integer SUM — exact."""
    R = rp_sign_planes(dim, out_dim, seed)
    rows = ", ".join(
        f"({j}, {i}, {int(R[j, i])})" for j in range(out_dim) for i in range(dim)
    )
    return f"""
        WITH ex AS (
            SELECT {id_col},
                   CAST(generate_subscripts({vec_col}, 1) - 1 AS BIGINT) AS dim_idx,
                   CAST(unnest({vec_col}) AS DOUBLE) AS x
            FROM {table}
        ), sc AS (
            SELECT {id_col}, max(abs(x)) AS scale FROM ex GROUP BY 1
        ), codes AS (
            SELECT ex.{id_col}, ex.dim_idx,
                   CAST(floor(ex.x / (CASE WHEN sc.scale = 0 THEN 1.0 ELSE sc.scale END)
                              * 127.0 + 0.5) AS BIGINT) AS code
            FROM ex JOIN sc USING ({id_col})
        ), planes(proj_idx, dim_idx, s) AS (
            VALUES {rows}
        )
        SELECT c.{id_col}, CAST(p.proj_idx AS BIGINT) AS proj_idx,
               CAST(sum(c.code * p.s) AS BIGINT) AS value
        FROM codes c JOIN planes p ON p.dim_idx = c.dim_idx
        GROUP BY 1, 2
    """


def quantize_int8_oracle_sql(
    table: str, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    """DuckDB mirror of ``quantize_int8`` (same float64 expression order)."""
    return f"""
        WITH ex AS (
            SELECT {id_col},
                   CAST(generate_subscripts({vec_col}, 1) - 1 AS BIGINT) AS dim_idx,
                   CAST(unnest({vec_col}) AS DOUBLE) AS x
            FROM {table}
        ), sc AS (
            SELECT {id_col}, max(abs(x)) AS scale FROM ex GROUP BY 1
        )
        SELECT ex.{id_col}, ex.dim_idx,
               CAST(floor(ex.x / (CASE WHEN sc.scale = 0 THEN 1.0 ELSE sc.scale END)
                          * 127.0 + 0.5) AS BIGINT) AS code
        FROM ex JOIN sc USING ({id_col})
    """


# -- product quantization (PQ) --------------------------------------------------


def pq_seeded_codebooks(
    dim: int = 64, m: int = 8, codewords: int = 16, seed: int = 29
) -> np.ndarray:
    """Seeded PQ codebooks, shape (m, codewords, dim // m) — the pretrained
    stand-in (same rationale as ``ivf_seeded_centroids``): one SQL oracle with
    the codebooks inlined is valid at every scale factor. A production
    codebook trains per-subspace k-means offline with ``_ivf_fit``."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rng = np.random.default_rng(seed)
    return rng.standard_normal((m, codewords, dim // m))


def _pq_subdists(sub: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """(B, codewords) squared L2 distances, accumulated dim-by-dim LEFT TO
    RIGHT — the exact float64 op order the SQL oracle's '+' chain uses."""
    b, d = sub.shape
    out = np.zeros((b, cb.shape[0]), dtype=np.float64)
    for i in range(d):
        diff = sub[:, i, None] - cb[None, :, i]
        out += diff * diff
    return out


def pq_encode_matrix(emb: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    """(B, m) int64 codes: per subspace, the argmin-distance codeword (ties →
    lowest index, matching SQL list_position-of-min)."""
    m, _, d = codebooks.shape
    codes = np.empty((emb.shape[0], m), dtype=np.int64)
    for s in range(m):
        codes[:, s] = np.argmin(
            _pq_subdists(emb[:, s * d : (s + 1) * d], codebooks[s]), axis=1
        )
    return codes


def pq_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    round_to: int = 2,
):
    """PQ/ADC approximate top-k (Jégou et al. 2011): vectors compress to m
    one-byte codes; each query precomputes an (m × codewords) distance table
    and scores a candidate as the SUM of m table lookups — no full-vector
    arithmetic at scan time (the memory-bound regime PQ exists for). Map-only
    partial top-k per batch (adc asc, id asc) + one per-query merge; fully
    deterministic (fixed summation order), so the approximate answer itself
    is oracled via ``pq_topk_oracle_sql`` with the codebooks inlined."""
    import ray

    m, _, d = codebooks.shape
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    # (Q, m, codewords) ADC tables, same left-to-right accumulation
    tables = np.stack(
        [
            np.stack(
                [_pq_subdists(qm[qi, None, s * d : (s + 1) * d], codebooks[s])[0]
                 for s in range(m)]
            )
            for qi in range(len(qm))
        ]
    )
    ref = ray.put((np.asarray(query_ids, dtype=np.int64), tables, codebooks))

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q_ids, tabs, cbs = ray.get(ref)
        emb = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        ids = batch[id_col].to_numpy()
        codes = pq_encode_matrix(emb, cbs)
        out = []
        for qi in range(len(q_ids)):
            adc = np.zeros(len(ids), dtype=np.float64)
            for s in range(cbs.shape[0]):  # fixed subspace order == SQL chain
                adc += tabs[qi, s][codes[:, s]]
            out.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(len(ids), q_ids[qi], dtype=np.int64),
                        id_col: ids,
                        "adc_dist": np.round(adc, round_to),
                    }
                )
                .sort_values(["adc_dist", id_col], kind="stable")
                .head(k)
            )
        return pd.concat(out, ignore_index=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.sort_values(["adc_dist", id_col], kind="stable")
            .head(k)
            .reset_index(drop=True)
        )
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=4096)
    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def pq_topk_oracle_sql(
    codebooks: np.ndarray,
    k: int = 10,
    num_queries: int = 5,
    table: str = "embeddings",
) -> str:
    """DuckDB mirror of ``pq_topk``: codebooks inlined as float literals;
    per-subspace squared distances written as explicit left-to-right '+'
    chains (the same float64 op order as ``_pq_subdists``); codes via
    list_position-of-min (first-wins ties = np.argmin); ADC = the m-term
    lookup chain."""
    m, c, d = codebooks.shape

    def dist_chain(vec_expr_prefix: str, cw: np.ndarray, lo: int) -> str:
        terms = [
            f"({vec_expr_prefix}[{lo + i}] - {float(cw[i])!r}) * "
            f"({vec_expr_prefix}[{lo + i}] - {float(cw[i])!r})"
            for i in range(d)
        ]
        return "(" + " + ".join(terms) + ")"

    code_cols, qtab_cols, adc_terms = [], [], []
    for s in range(m):
        lo = s * d + 1  # SQL lists are 1-indexed
        dl = "[" + ", ".join(dist_chain("ne", codebooks[s][j], lo) for j in range(c)) + "]"
        code_cols.append(
            f"CAST(list_position({dl}, list_min({dl})) AS BIGINT) AS code_{s}"
        )
        qdl = "[" + ", ".join(dist_chain("qe", codebooks[s][j], lo) for j in range(c)) + "]"
        qtab_cols.append(f"{qdl} AS qt_{s}")
        adc_terms.append(f"q.qt_{s}[c.code_{s}]")
    adc = " + ".join(adc_terms)
    return f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> x / sqrt(list_dot_product(
                                      CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))) AS ne
            FROM {table}
        ), codes AS (
            SELECT vec_id, {', '.join(code_cols)} FROM v
        ), q AS (
            SELECT vec_id AS query_id, {', '.join(qtab_cols)}
            FROM (SELECT vec_id, ne AS qe FROM v ORDER BY vec_id LIMIT {num_queries})
        ), adc AS (
            SELECT q.query_id, c.vec_id,
                   ROUND(CAST({adc} AS DOUBLE), 2) AS adc_dist
            FROM codes c CROSS JOIN q
        )
        SELECT query_id, vec_id, adc_dist,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY adc_dist ASC, vec_id ASC
               ) AS BIGINT) AS rank
        FROM adc
        QUALIFY rank <= {k}
    """


def ivfpq_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    round_to: int = 2,
):
    """IVF-PQ — the production ANN architecture (FAISS's IndexIVFPQ): a
    coarse quantizer prunes the scan to ``nprobe`` inverted lists, then PQ
    ADC scores only those candidates with m table lookups each. At lake
    scale the coarse assignment is the partition key (probes touch nprobe
    partitions) and codes are 8 bytes/vector resident memory. Deterministic:
    same probe rule as ``ivf_topk``, same ADC chain as ``pq_topk`` — oracled
    with both the centroids and the codebooks inlined."""
    import ray

    m, _, d = codebooks.shape
    qm = _normalize(np.asarray(queries, dtype=np.float64))
    nprobe = min(nprobe, len(centroids))
    order = np.lexsort((np.arange(len(centroids))[None, :].repeat(len(qm), 0),
                        -(qm @ centroids.T)), axis=1)
    probes = order[:, :nprobe]
    tables = np.stack(
        [
            np.stack(
                [_pq_subdists(qm[qi, None, s * d : (s + 1) * d], codebooks[s])[0]
                 for s in range(m)]
            )
            for qi in range(len(qm))
        ]
    )
    ref = ray.put(
        (np.asarray(query_ids, dtype=np.int64), centroids, probes, tables, codebooks)
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q_ids, cent, prb, tabs, cbs = ray.get(ref)
        emb = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        ids = batch[id_col].to_numpy()
        assign = np.argmax(emb @ cent.T, axis=1)
        codes = pq_encode_matrix(emb, cbs)
        out = []
        for qi in range(len(q_ids)):
            mask = np.isin(assign, prb[qi])
            if not mask.any():
                continue
            cand = np.nonzero(mask)[0]
            adc = np.zeros(len(cand), dtype=np.float64)
            for s in range(cbs.shape[0]):
                adc += tabs[qi, s][codes[cand, s]]
            out.append(
                pd.DataFrame(
                    {
                        "query_id": np.full(len(cand), q_ids[qi], dtype=np.int64),
                        id_col: ids[cand],
                        "adc_dist": np.round(adc, round_to),
                    }
                )
                .sort_values(["adc_dist", id_col], kind="stable")
                .head(k)
            )
        if not out:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 id_col: pd.Series([], dtype="int64"),
                 "adc_dist": pd.Series([], dtype="float64")}
            )
        return pd.concat(out, ignore_index=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = (
            g.sort_values(["adc_dist", id_col], kind="stable")
            .head(k)
            .reset_index(drop=True)
        )
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=4096)
    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def ivfpq_topk_oracle_sql(
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 10,
    num_queries: int = 5,
    nprobe: int = 4,
    table: str = "embeddings",
) -> str:
    """DuckDB mirror of ``ivfpq_topk``: the IVF probe CTEs composed with the
    PQ code/ADC chains, everything inlined."""
    c = len(centroids)
    m, cw, d = codebooks.shape

    def lit(v) -> str:
        return "[" + ", ".join(repr(float(x)) for x in v) + "]"

    dots = ", ".join(
        f"list_dot_product(ne, {lit(centroids[j])})" for j in range(c)
    )

    def dist_chain(prefix: str, cwv: np.ndarray, lo: int) -> str:
        terms = [
            f"({prefix}[{lo + i}] - {float(cwv[i])!r}) * "
            f"({prefix}[{lo + i}] - {float(cwv[i])!r})"
            for i in range(d)
        ]
        return "(" + " + ".join(terms) + ")"

    code_cols, qtab_cols, adc_terms = [], [], []
    for s in range(m):
        lo = s * d + 1
        dl = "[" + ", ".join(dist_chain("ne", codebooks[s][j], lo) for j in range(cw)) + "]"
        code_cols.append(
            f"CAST(list_position({dl}, list_min({dl})) AS BIGINT) AS code_{s}"
        )
        qdl = "[" + ", ".join(dist_chain("qe", codebooks[s][j], lo) for j in range(cw)) + "]"
        qtab_cols.append(f"{qdl} AS qt_{s}")
        adc_terms.append(f"q.qt_{s}[c.code_{s}]")
    adc = " + ".join(adc_terms)
    return f"""
        WITH v AS (
            SELECT vec_id,
                   list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> x / sqrt(list_dot_product(
                                      CAST(embedding AS DOUBLE[]),
                                      CAST(embedding AS DOUBLE[])))) AS ne
            FROM {table}
        ), a AS (
            SELECT vec_id, ne, dl,
                   CAST(list_position(dl, list_max(dl)) - 1 AS BIGINT) AS cluster
            FROM (SELECT vec_id, ne, [{dots}] AS dl FROM v)
        ), codes AS (
            SELECT vec_id, cluster, {', '.join(code_cols)} FROM a
        ), qsrc AS (
            SELECT vec_id AS query_id, ne AS qe, dl AS qdl
            FROM a ORDER BY vec_id LIMIT {num_queries}
        ), probes AS (
            SELECT query_id, j.j AS cluster
            FROM qsrc, range({c}) j(j)
            QUALIFY row_number() OVER (
                PARTITION BY query_id ORDER BY qdl[CAST(j.j AS INT) + 1] DESC, j.j ASC
            ) <= {nprobe}
        ), q AS (
            SELECT query_id, {', '.join(qtab_cols)} FROM qsrc
        ), adc AS (
            SELECT q.query_id, c.vec_id,
                   ROUND(CAST({adc} AS DOUBLE), 2) AS adc_dist
            FROM codes c
            JOIN probes p ON p.cluster = c.cluster
            JOIN q ON q.query_id = p.query_id
        )
        SELECT query_id, vec_id, adc_dist,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY adc_dist ASC, vec_id ASC
               ) AS BIGINT) AS rank
        FROM adc
        QUALIFY rank <= {k}
    """


# -- exact k-NN graph ---------------------------------------------------------


def _knn_tile(
    ta, tb, same: bool, k: int, id_col: str, round_to: int | None,
    label_col: str | None = None,
) -> "pa.Table":
    """One matmul tile of the all-pairs k-NN graph (Ray task, zero-copy blocks
    from the object store): partial top-k for ta's rows against tb — and, for
    an off-diagonal tile, tb's rows against ta too, so each of the B·(B+1)/2
    tiles is computed once. With ``label_col``, SAME-label pairs are masked
    out — the hard-negative mining variant."""
    import pyarrow as pa

    ia = ta.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    ib = tb.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    def mat(t):
        c = t.column("embedding").combine_chunks()
        flat = c.values.to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(len(c), -1) if len(c) else flat.reshape(0, 0)

    ma, mb = mat(ta), mat(tb)
    na, nb = _normalize(ma), _normalize(mb)
    sims = na @ nb.T
    if label_col is not None:
        la = ta.column(label_col).to_numpy(zero_copy_only=False)
        lb = tb.column(label_col).to_numpy(zero_copy_only=False)
        sims[la[:, None] == lb[None, :]] = -np.inf  # negatives only
    if same:
        np.fill_diagonal(sims, -np.inf)  # no self edge
    frames = [
        _topk_frame(
            np.repeat(ia, len(ib)), np.tile(ib, len(ia)), sims.reshape(-1),
            k, "neighbor_id", round_to,
        )
    ]
    if not same:
        frames.append(
            _topk_frame(
                np.repeat(ib, len(ia)), np.tile(ia, len(ib)),
                sims.T.reshape(-1), k, "neighbor_id", round_to,
            )
        )
    out = pd.concat(frames, ignore_index=True)
    out = out[np.isfinite(out["cosine"].to_numpy())]  # masked pairs never emit
    out = out.rename(columns={"query_id": id_col})
    return pa.Table.from_pandas(out, preserve_index=False)


def knn_graph(
    ds,
    k: int = 5,
    id_col: str = "vec_id",
    round_to: int | None = 2,
    num_blocks: int | None = None,
):
    """Exact cosine k-NN graph: every vector's top-``k`` neighbours (self
    excluded) under the (cosine rounded DESC, neighbour id ASC) total order —
    the neighbourhood structure semantic-dedup and graph-based curation
    build on.

    Same distributed shape as ``dedup.embedding_near_dups``: blocks pinned in
    the object store, one Ray task per block PAIR (each off-diagonal tile
    serves both directions), per-tile partial top-k, then one
    ``groupby(id).map_groups`` merge under the identical total order — the
    merge of per-tile top-k is exact, and rounding the cosine first makes the
    ranking reproducible against an independent engine. O(N²) compute is
    inherent to the exact graph; the approximate scale path runs these tiles
    inside LSH/IVF buckets instead (``embedding_near_dups_lsh``)."""
    import ray
    import ray.data

    if num_blocks is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_blocks = max(2, min(16, cpus))
    packed = (
        ds.select_columns([id_col, "embedding"]).repartition(num_blocks).materialize()
    )
    refs = packed.to_arrow_refs()
    tile = ray.remote(_knn_tile)
    out = [
        tile.remote(refs[i], refs[j], i == j, k, id_col, round_to)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = _topk_frame(
            g[id_col].to_numpy(), g["neighbor_id"].to_numpy(),
            g["cosine"].to_numpy(), k, "neighbor_id", round_to,
        ).rename(columns={"query_id": id_col})
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        ray.data.from_arrow_refs(out)
        .groupby(id_col)
        .map_groups(merge, batch_format="pandas")
    )


def knn_graph_oracle_sql(
    table: str = "embeddings", k: int = 5, id_col: str = "vec_id"
) -> str:
    """DuckDB mirror of ``knn_graph`` (round-2 cosine, id tiebreak, no self)."""
    return f"""
        WITH sims AS (
            SELECT a.{id_col}, b.{id_col} AS neighbor_id,
                   ROUND(CAST(list_cosine_similarity(a.embedding, b.embedding)
                         AS DOUBLE), 2) AS cosine
            FROM {table} a JOIN {table} b ON a.{id_col} <> b.{id_col}
        )
        SELECT {id_col}, neighbor_id, cosine,
               CAST(row_number() OVER (
                   PARTITION BY {id_col}
                   ORDER BY cosine DESC, neighbor_id ASC
               ) AS BIGINT) AS rank
        FROM sims
        QUALIFY rank <= {k}
    """


def _dense_topk(
    q_ids: np.ndarray,
    cand_ids: np.ndarray,
    sims: np.ndarray,
    k: int,
    round_to: int | None,
) -> pd.DataFrame:
    """Per-row top-k of a dense (Q, C) sims matrix under the shared
    (cosine rounded desc, id asc) total order — argsort-based so a tile
    never builds a Q·C-row DataFrame (an 8k-row bucket would otherwise
    frame 67M rows). Masked entries (-inf) never emit."""
    if round_to is not None:
        sims = np.round(sims, round_to)
    order = np.argsort(cand_ids, kind="stable")
    cand_ids, sims = cand_ids[order], sims[:, order]
    kk = min(k, sims.shape[1])
    idx = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
    vals = np.take_along_axis(sims, idx, axis=1).reshape(-1)
    keep = np.isfinite(vals)
    return pd.DataFrame(
        {
            "query_id": np.repeat(q_ids, kk)[keep],
            "neighbor_id": cand_ids[idx.reshape(-1)][keep],
            "cosine": vals[keep].astype(np.float64),
        }
    )


def knn_graph_lsh(
    ds,
    k: int = 5,
    id_col: str = "vec_id",
    dim: int = 64,
    num_bits: int = 8,
    num_tables: int = 4,
    round_to: int | None = 2,
    jumbo_threshold: int = 8192,
    tile_rows: int = 4096,
):
    """APPROXIMATE cosine k-NN graph — the 100 TB scale path ``knn_graph``'s
    docstring promises: each vector's top-``k`` neighbours are drawn only
    from candidates sharing a hyperplane-LSH bucket in ANY of ``num_tables``
    seeded tables, so compute drops from O(N²) to Σ|bucket|² (recall < 1 by
    construction, miss prob ≈ (1-p^bits)^tables per pair). Output schema and
    total order ((cosine rounded desc, neighbor id asc), rank column) match
    ``knn_graph`` exactly, so every downstream graph op (``pagerank``,
    ``bfs_hops``, ``triangle_stats``, ``adamic_adar``, ``label_propagate``)
    accepts the edge table unchanged via their ``edges=`` parameter.

    Distributed shape: ``dedup.lsh_tiles`` candidate generation (bucket
    fan-out actor pool → jumbo split, so no task ever matmuls a whole hot
    bucket) → per-tile dense partial top-k (argsort, no Q·C-row frames) →
    one query-bucketed merge that dedups multi-table duplicates and
    re-ranks under the same total order — the merge of per-tile top-k is
    exact over the candidate set because every shared-bucket pair co-occurs
    in at least one tile. Both groupbys run at COARSE grain (hash of
    tkey/query into ~64 groups, whole tiles kept together; the kernels loop
    tiles / rank vectorized within the group) — a per-query map_groups pays
    ~1 ms of frame setup per vector, 2+ s of pure overhead at 10k vectors
    (the label_propagate lesson). Bucket membership is deterministic given
    the seeded planes, so the approximate answer itself is oracle-checkable
    (``knn_graph_lsh_oracle_sql`` inlines the same planes)."""
    from ..hashing import stable_hash
    from .dedup import lsh_tiles

    tiled = lsh_tiles(
        ds,
        id_col=id_col,
        dim=dim,
        num_bits=num_bits,
        num_tables=num_tables,
        jumbo_threshold=jumbo_threshold,
        tile_rows=tile_rows,
    )
    B = 64

    def tag_tile_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["tbucket"] = (
            stable_hash(df["tkey"].to_numpy(np.int64)) % np.uint64(B)
        ).astype(np.int64)
        return df

    def knn_in_tile(g: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(g["embedding"].to_numpy())
        ids = g[id_col].to_numpy().astype(np.int64)
        n = np.maximum(np.linalg.norm(m, axis=1), 1e-300)
        subs = g["sub"].to_numpy()
        lo_sub = subs.min()
        if subs.max() == lo_sub:  # diagonal tile (or unsplit bucket)
            sims = (m @ m.T) / (n[:, None] * n[None, :])
            np.fill_diagonal(sims, -np.inf)
            return _dense_topk(ids, ids, sims, k, round_to)
        am = subs == lo_sub
        ma, mb_ = m[am], m[~am]
        ia, ib = ids[am], ids[~am]
        sims = (ma @ mb_.T) / (n[am][:, None] * n[~am][None, :])
        return pd.concat(
            [
                _dense_topk(ia, ib, sims, k, round_to),
                _dense_topk(ib, ia, sims.T.copy(), k, round_to),
            ],
            ignore_index=True,
        )

    def knn_tiles_kernel(g: pd.DataFrame) -> pd.DataFrame:
        out = [knn_in_tile(sub) for _, sub in g.groupby("tkey", sort=False)]
        res = pd.concat(out, ignore_index=True)
        res["qbucket"] = (
            stable_hash(res["query_id"].to_numpy(np.int64)) % np.uint64(B)
        ).astype(np.int64)
        return res

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # a pair found in several tables/tiles repeats with the same cosine;
        # _topk_frame ranks ALL queries in the bucket in one vectorized pass
        g = g.drop_duplicates(["query_id", "neighbor_id"])
        g = _topk_frame(
            g["query_id"].to_numpy(), g["neighbor_id"].to_numpy(),
            g["cosine"].to_numpy(), k, "neighbor_id", round_to,
        )
        g["rank"] = g.groupby("query_id", sort=False).cumcount() + 1
        g = g.rename(columns={"query_id": id_col})
        g["rank"] = g["rank"].astype(np.int64)
        return g[[id_col, "neighbor_id", "cosine", "rank"]]

    return (
        tiled.map_batches(tag_tile_bucket, batch_format="pandas")
        .groupby("tbucket")
        .map_groups(knn_tiles_kernel, batch_format="pandas")
        .groupby("qbucket")
        .map_groups(merge_bucket, batch_format="pandas")
    )


def knn_graph_lsh_oracle_sql(
    table: str = "embeddings",
    k: int = 5,
    id_col: str = "vec_id",
    dim: int = 64,
    num_bits: int = 8,
    num_tables: int = 4,
) -> str:
    """DuckDB mirror of ``knn_graph_lsh``: the SAME seeded planes inlined as
    literals, candidate membership is shared-bucket-in-any-table, ranking is
    the shared (round-2 cosine desc, id asc) order."""
    hashers = [
        HyperplaneLsh(dim, num_bits, seed=11 + 7 * t) for t in range(num_tables)
    ]

    def bucket_expr(t: int) -> str:
        terms = []
        for j in range(num_bits):
            vec = ", ".join(repr(float(x)) for x in hashers[t].planes[j])
            terms.append(
                f"(CASE WHEN list_dot_product(de, [{vec}]) > 0"
                f" THEN {1 << j} ELSE 0 END)"
            )
        return " + ".join(terms)

    buckets = ",\n               ".join(
        f"({bucket_expr(t)}) AS b{t}" for t in range(num_tables)
    )
    on = " OR ".join(f"x.b{t} = y.b{t}" for t in range(num_tables))
    return f"""
        WITH b AS (
            SELECT {id_col}, de,
               {buckets}
            FROM (SELECT {id_col}, CAST(embedding AS DOUBLE[]) AS de
                  FROM {table})
        ),
        sims AS (
            SELECT x.{id_col}, y.{id_col} AS neighbor_id,
                   ROUND(list_dot_product(x.de, y.de)
                         / (sqrt(list_dot_product(x.de, x.de))
                            * sqrt(list_dot_product(y.de, y.de))), 2) AS cosine
            FROM b x JOIN b y ON x.{id_col} <> y.{id_col} AND ({on})
        )
        SELECT {id_col}, neighbor_id, cosine,
               CAST(row_number() OVER (
                   PARTITION BY {id_col}
                   ORDER BY cosine DESC, neighbor_id ASC
               ) AS BIGINT) AS rank
        FROM sims
        QUALIFY rank <= {k}
    """


def hard_negatives(
    ds,
    k: int = 5,
    id_col: str = "vec_id",
    label_col: str = "label",
    round_to: int | None = 2,
    num_blocks: int | None = None,
):
    """Hard-negative mining for contrastive training: each vector's top-``k``
    most-similar neighbours with a DIFFERENT label — the highest-loss
    negatives a contrastive batch wants.

    Identical distributed shape to ``knn_graph`` (block-pair tiles, partial
    top-k, one groupby merge under the shared total order); same-label pairs
    are masked inside the tile so they never ship."""
    import ray
    import ray.data

    if num_blocks is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        num_blocks = max(2, min(16, cpus))
    packed = (
        ds.select_columns([id_col, label_col, "embedding"])
        .repartition(num_blocks)
        .materialize()
    )
    refs = packed.to_arrow_refs()
    tile = ray.remote(_knn_tile)
    out = [
        tile.remote(refs[i], refs[j], i == j, k, id_col, round_to, label_col)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = _topk_frame(
            g[id_col].to_numpy(), g["neighbor_id"].to_numpy(),
            g["cosine"].to_numpy(), k, "neighbor_id", round_to,
        ).rename(columns={"query_id": id_col})
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return (
        ray.data.from_arrow_refs(out)
        .groupby(id_col)
        .map_groups(merge, batch_format="pandas")
    )


def hard_negatives_oracle_sql(
    table: str = "embeddings",
    k: int = 5,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> str:
    """DuckDB mirror of ``hard_negatives`` (different-label pairs only)."""
    return f"""
        WITH sims AS (
            SELECT a.{id_col}, b.{id_col} AS neighbor_id,
                   ROUND(CAST(list_cosine_similarity(a.embedding, b.embedding)
                         AS DOUBLE), 2) AS cosine
            FROM {table} a JOIN {table} b
              ON a.{id_col} <> b.{id_col} AND a.{label_col} <> b.{label_col}
        )
        SELECT {id_col}, neighbor_id, cosine,
               CAST(row_number() OVER (
                   PARTITION BY {id_col}
                   ORDER BY cosine DESC, neighbor_id ASC
               ) AS BIGINT) AS rank
        FROM sims
        QUALIFY rank <= {k}
    """


def label_propagate(
    ds,
    k: int = 5,
    seed_permille: int = 500,
    id_col: str = "vec_id",
    label_col: str = "label",
    salt: str = "lp",
    round_to: int | None = 2,
    num_blocks: int | None = None,
    edges=None,
):
    """One-hop label propagation (semi-supervised labeling): an md5-permille
    SEED subset keeps its true label; every other vector takes the MAJORITY
    label among its top-``k`` cosine neighbours that are seeds (ties →
    lexicographically smallest label; no seed neighbour → null). The cheap
    way to stretch a small labeled set over a big corpus before training a
    classifier on the result.

    Composition, not new machinery: the ``knn_graph`` tiles produce the
    neighbourhood, the seed split is the ``hash_split`` md5 recipe (so the
    SQL oracle reproduces membership verbatim), and the vote is ONE
    vectorized pandas pass per COARSE bucket (hash(id) % B groups — a
    per-vector map_groups paid ~1 ms of frame setup per vector, 2.4 s of
    pure overhead at sf0.1). Deterministic end-to-end; the majority vote is
    exact-count arithmetic."""
    import ray

    from ..hashing import stable_hash as _sh
    from .sampling import _bucket_of

    graph = (
        knn_graph(ds, k=k, id_col=id_col, round_to=round_to,
                  num_blocks=num_blocks)
        if edges is None
        else edges
    )
    labels = ds.select_columns([id_col, label_col]).to_pandas()
    # a nullable result column: numeric labels surface as float64 (what an
    # independent engine's NULL-able projection yields), strings as object
    numeric = pd.api.types.is_numeric_dtype(labels[label_col])
    is_seed = _bucket_of(labels[id_col].to_numpy(), salt) < seed_permille
    seed_map = dict(
        zip(labels[id_col][is_seed], labels[label_col][is_seed].astype(object))
    )
    ref = ray.put(seed_map)
    B = 32

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[id_col, "neighbor_id"]].copy()
        b["bucket"] = (
            _sh(b[id_col].to_numpy().astype(np.int64)) % np.uint64(B)
        ).astype(np.int64)
        return b

    def vote_bucket(g: pd.DataFrame) -> pd.DataFrame:
        seeds = ray.get(ref)
        lab = g["neighbor_id"].map(seeds)
        votes = (
            pd.DataFrame({"id": g[id_col], "lab": lab})
            .dropna(subset=["lab"])
            .groupby(["id", "lab"], sort=False)
            .size()
            .reset_index(name="n")
            .sort_values(["id", "n", "lab"], ascending=[True, False, True],
                         kind="stable")
            .drop_duplicates("id")  # majority, ties → smallest label
            .set_index("id")["lab"]
        )
        ids = pd.unique(g[id_col])
        own = pd.Series(ids, index=ids).map(seeds)
        seeded = pd.Series(ids, index=ids).isin(seeds).to_numpy()
        prop = own.where(seeded, votes.reindex(ids)).to_numpy(dtype=object)
        if numeric:
            col = pd.array(
                [np.nan if v is None or v is np.nan or pd.isna(v) else float(v)
                 for v in prop],
                dtype="float64",
            )
        else:
            col = pd.array(prop, dtype=object)
        return pd.DataFrame(
            {id_col: ids, "propagated": col, "is_seed": seeded}
        )

    return (
        graph.map_batches(tag, batch_format="pandas")
        .groupby("bucket")
        .map_groups(vote_bucket, batch_format="pandas")
    )


def label_propagate_oracle_sql(
    table: str = "embeddings",
    k: int = 5,
    seed_permille: int = 500,
    id_col: str = "vec_id",
    label_col: str = "label",
    salt: str = "lp",
    numeric: bool = True,
    knn_sql: str | None = None,
) -> str:
    """DuckDB mirror of ``label_propagate`` over the same knn-graph SQL
    (``knn_sql`` swaps in e.g. the LSH edge-table SQL).
    ``numeric`` pins the propagated column to DOUBLE (the nullable dtype the
    Python side emits for numeric labels); pass False for string labels."""
    from .sampling import _permille_sql

    knn = knn_sql or knn_graph_oracle_sql(table, k=k, id_col=id_col)
    out_type = "DOUBLE" if numeric else "VARCHAR"
    return f"""
        WITH knn AS ({knn}),
        seeds AS (
            SELECT {id_col}, {label_col}
            FROM {table}
            WHERE {_permille_sql(id_col, salt)} < {seed_permille}
        ), votes AS (
            SELECT knn.{id_col}, s.{label_col} AS lab, count(*) AS n
            FROM knn JOIN seeds s ON s.{id_col} = knn.neighbor_id
            GROUP BY 1, 2
        ), winner AS (
            SELECT {id_col}, lab
            FROM votes
            QUALIFY row_number() OVER (
                PARTITION BY {id_col} ORDER BY n DESC, lab ASC
            ) = 1
        )
        SELECT t.{id_col},
               CAST(CASE WHEN s.{id_col} IS NOT NULL THEN s.{label_col}
                    ELSE w.lab END AS {out_type}) AS propagated,
               s.{id_col} IS NOT NULL AS is_seed
        FROM {table} t
        LEFT JOIN seeds s ON s.{id_col} = t.{id_col}
        LEFT JOIN winner w ON w.{id_col} = t.{id_col}
    """


def pagerank(
    ds,
    k: int = 5,
    iters: int = 3,
    damping_pm: int = 850,
    id_col: str = "vec_id",
    scale: int = 10**9,
    round_to: int | None = 2,
    num_blocks: int | None = None,
    num_buckets: int | None = None,

    edges=None,):
    """PageRank over the exact cosine k-NN graph — the centrality signal
    graph-based curation ranks documents/vectors by (well-connected ⇒
    representative). ``iters`` fixed power-iteration rounds in INTEGER
    arithmetic: ranks live at ``scale`` (1e9), damping is permille, every
    division is a floor — so numpy and an independent SQL engine agree
    bit-for-bit with no float drift (house determinism style, cf. the
    quantized-ln fluency scorer).

    r_0(v)   = scale // N
    r_t+1(v) = ((1000-d)·scale) // (1000·N)  +  (d · Σ_{u→v} r_t(u)//deg) // 1000

    where deg = min(k, N-1) is every node's exact out-degree in the k-NN
    graph (k neighbours, self excluded). Distributed shape: edges and nodes
    are hash-bucketed by id ONCE into object-store tables; each round is the
    house two-stage task exchange (cf. the CDC epoch apply) — one task per
    SOURCE bucket joins its co-partitioned edge and rank tables with a
    searchsorted lookup and emits per-destination partial sums split by the
    destination's bucket, one task per DESTINATION bucket folds the B
    addressed partials plus its node list into next ranks. B² tiny refs per
    round instead of a full hash-shuffle join — measured ~5× faster than the
    ``Dataset.join`` formulation at sf0.1 (the aggregator-actor fixed cost
    dominated). Rank state stays in the object store, O(N/B) rows per task,
    never on the driver; integer sums are order-independent so any task
    interleaving gives the identical answer.

    ``edges=`` accepts a prebuilt (id, neighbor_id) table (e.g.
    ``knn_graph_lsh`` for the bucketed scale path). Note the integer recipe
    still divides by deg = min(k, N−1): nodes the approximate graph left
    with fewer neighbours leak their residual mass (the standard
    dangling-mass-dropped PageRank variant) rather than re-weighting."""
    import pyarrow as pa
    import ray
    import ray.data

    edges_ds = (
        (knn_graph(ds, k=k, id_col=id_col, round_to=round_to,
                   num_blocks=num_blocks) if edges is None else edges)
        .select_columns([id_col, "neighbor_id"])
        .materialize()
    )
    nodes_ds = ds.select_columns([id_col]).materialize()
    n = nodes_ds.count()
    deg = min(k, n - 1)
    base = ((1000 - damping_pm) * scale) // (1000 * n)
    r0 = scale // n
    if num_buckets is None:
        # one bucket per ~250k nodes, floor 4: tasks stay heap-sized at scale
        # without drowning small inputs in scheduling overhead
        num_buckets = max(4, min(256, n // 250_000 + 4))
    B = num_buckets

    def _split(t: pa.Table, col: str) -> list:
        ids = t.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = ids % B  # numpy floor-mod: non-negative for any id sign
        order = np.argsort(b, kind="stable")
        sorted_t, sb = t.take(order), b[order]
        cuts = np.searchsorted(sb, np.arange(B + 1))
        return [sorted_t.slice(cuts[i], cuts[i + 1] - cuts[i]) for i in range(B)]

    split_task = ray.remote(num_returns=B)(_split)
    edge_cols = [split_task.remote(ref, id_col) for ref in edges_ds.to_arrow_refs()]
    node_cols = [split_task.remote(ref, id_col) for ref in nodes_ds.to_arrow_refs()]

    def _bucket_nodes(*parts: pa.Table) -> np.ndarray:
        ids = pa.concat_tables(parts).column(id_col).to_numpy(zero_copy_only=False)
        return np.sort(ids.astype(np.int64))

    def _bucket_edges(*parts: pa.Table) -> pa.Table:
        return pa.concat_tables(parts).combine_chunks()

    bucket_nodes = ray.remote(_bucket_nodes)
    bucket_edges = ray.remote(_bucket_edges)
    node_b = [bucket_nodes.remote(*[c[b] for c in node_cols]) for b in range(B)]
    edge_b = [bucket_edges.remote(*[c[b] for c in edge_cols]) for b in range(B)]

    def _seed(ids: np.ndarray) -> np.ndarray:
        return np.full(len(ids), r0, np.int64)

    def _contribs(edges: pa.Table, ids: np.ndarray, r: np.ndarray) -> list:
        # ids are the SORTED node ids of this bucket; every edge src is one
        src = edges.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        dst = edges.column("neighbor_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        c = r[np.searchsorted(ids, src)] // deg
        ud, inv = np.unique(dst, return_inverse=True)
        s = np.zeros(len(ud), np.int64)
        np.add.at(s, inv, c)  # exact int64 segmented sum
        db = ud % B
        order = np.argsort(db, kind="stable")
        ud, s, db = ud[order], s[order], db[order]
        cuts = np.searchsorted(db, np.arange(B + 1))
        return [
            (ud[cuts[i] : cuts[i + 1]], s[cuts[i] : cuts[i + 1]]) for i in range(B)
        ]

    def _fold(ids: np.ndarray, *parts) -> np.ndarray:
        s = np.zeros(len(ids), np.int64)
        for ud, ps in parts:
            s[np.searchsorted(ids, ud)] += ps
        return base + (damping_pm * s) // 1000

    seed_task = ray.remote(_seed)
    contrib_task = ray.remote(num_returns=B)(_contribs)
    fold_task = ray.remote(_fold)

    rank_b = [seed_task.remote(node_b[b]) for b in range(B)]
    for _ in range(iters):
        outs = [
            contrib_task.remote(edge_b[b], node_b[b], rank_b[b]) for b in range(B)
        ]
        if B == 1:  # num_returns=1 yields a bare ref, not a list
            outs = [[o] for o in outs]
        rank_b = [
            fold_task.remote(node_b[c], *[outs[b][c] for b in range(B)])
            for c in range(B)
        ]

    def _emit(ids: np.ndarray, r: np.ndarray) -> pa.Table:
        return pa.table({id_col: pa.array(ids), "pr_scaled": pa.array(r)})

    emit = ray.remote(_emit)
    return ray.data.from_arrow_refs(
        [emit.remote(node_b[b], rank_b[b]) for b in range(B)]
    )


def pagerank_oracle_sql(
    table: str = "embeddings",
    k: int = 5,
    iters: int = 3,
    damping_pm: int = 850,
    id_col: str = "vec_id",
    scale: int = 10**9,
    knn_sql: str | None = None,
) -> str:
    """DuckDB mirror of ``pagerank``: the same knn-graph SQL feeds ``iters``
    UNROLLED iteration CTEs with identical integer floors (``//``); SUM's
    HUGEINT widening is collapsed by the same ``// 1000`` before re-entering
    BIGINT range. ``knn_sql`` swaps in a different edge-table SQL (e.g.
    ``knn_graph_lsh_oracle_sql`` to mirror ``pagerank(edges=knn_graph_lsh(…))``)."""
    knn = knn_sql or knn_graph_oracle_sql(table, k=k, id_col=id_col)
    head = f"""
        WITH knn AS ({knn}),
        edges AS (SELECT {id_col} AS src, neighbor_id AS dst FROM knn),
        nodes AS (SELECT {id_col} AS id FROM {table}),
        c AS (SELECT count(*) AS n FROM nodes),
        r0 AS (SELECT id, CAST({scale} AS BIGINT) // (SELECT n FROM c) AS r
               FROM nodes)"""
    step = ""
    for i in range(iters):
        step += f""",
        r{i + 1} AS (
            SELECT nodes.id,
                   ((CAST({1000 - damping_pm} AS BIGINT) * {scale})
                    // (1000 * (SELECT n FROM c)))
                   + ({damping_pm} * COALESCE(s.s, 0)) // 1000 AS r
            FROM nodes LEFT JOIN (
                SELECT e.dst AS id,
                       SUM(r.r // LEAST({k}, (SELECT n FROM c) - 1)) AS s
                FROM edges e JOIN r{i} r ON r.id = e.src
                GROUP BY 1
            ) s ON s.id = nodes.id
        )"""
    return f"""{head}{step}
        SELECT id AS {id_col}, CAST(r AS BIGINT) AS pr_scaled FROM r{iters}
    """

def bfs_hops(
    ds,
    k: int = 5,
    max_hops: int = 3,
    seed_permille: int = 40,
    id_col: str = "vec_id",
    salt: str = "bfs",
    round_to: int | None = 2,
    num_blocks: int | None = None,
    num_buckets: int | None = None,

    edges=None,):
    """Multi-source BFS hop distance over the UNDIRECTED exact cosine k-NN
    graph: an md5-permille seed subset sits at hops=0 and every other vector
    gets the MINIMUM number of graph hops to any seed, capped at ``max_hops``
    (unreached vectors are omitted) — the "distance to curated exemplars"
    signal graph-based selection ranks by, and the same frontier-expansion
    primitive k-hop neighbourhood sampling uses.

    Distributed shape: the PAGERANK bucket exchange (edges and a per-node
    dist array hash-bucketed by id ONCE into the object store; see
    ``pagerank``), but each round ships only the CURRENT FRONTIER's unique
    neighbour ids (monotonically shrinking), not a full rank vector — B²
    tiny refs per hop, state never on the driver. The hop count is integer
    and order-independent, so any task interleaving gives the identical
    answer; the SQL oracle is a recursive CTE over the same knn edges."""
    import pyarrow as pa
    import ray
    import ray.data

    from .sampling import _bucket_of

    edges_ds = (
        (knn_graph(ds, k=k, id_col=id_col, round_to=round_to,
                   num_blocks=num_blocks) if edges is None else edges)
        .select_columns([id_col, "neighbor_id"])
        .materialize()
    )
    nodes_ds = ds.select_columns([id_col]).materialize()
    n = nodes_ds.count()
    if num_buckets is None:
        # same recipe as pagerank: tasks stay heap-sized at scale, small
        # inputs don't drown in scheduling overhead
        num_buckets = max(4, min(256, n // 250_000 + 4))
    B = num_buckets

    def _sym_split(t: pa.Table) -> list:
        # undirected: materialize both directed copies, bucket by the src
        if t.num_rows == 0 or id_col not in t.column_names:
            e = np.empty(0, np.int64)
            return [(e, e) for _ in range(B)]
        a = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("neighbor_id").to_numpy(zero_copy_only=False).astype(np.int64)
        s, d = np.concatenate([a, b]), np.concatenate([b, a])
        bk = s % B
        order = np.argsort(bk, kind="stable")
        s, d, bk = s[order], d[order], bk[order]
        cuts = np.searchsorted(bk, np.arange(B + 1))
        return [
            (s[cuts[i] : cuts[i + 1]], d[cuts[i] : cuts[i + 1]]) for i in range(B)
        ]

    def _node_split(t: pa.Table) -> list:
        if t.num_rows == 0 or id_col not in t.column_names:
            return [np.empty(0, np.int64) for _ in range(B)]
        ids = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bk = ids % B
        order = np.argsort(bk, kind="stable")
        ids, bk = ids[order], bk[order]
        cuts = np.searchsorted(bk, np.arange(B + 1))
        return [ids[cuts[i] : cuts[i + 1]] for i in range(B)]

    split_edges = ray.remote(num_returns=B)(_sym_split)
    split_nodes = ray.remote(num_returns=B)(_node_split)
    edge_cols = [split_edges.remote(r) for r in edges_ds.to_arrow_refs()]
    node_cols = [split_nodes.remote(r) for r in nodes_ds.to_arrow_refs()]

    def _bucket_edges(*parts) -> tuple:
        s = np.concatenate([p[0] for p in parts])
        d = np.concatenate([p[1] for p in parts])
        order = np.argsort(s, kind="stable")
        return s[order], d[order]

    def _bucket_nodes(*parts) -> np.ndarray:
        return np.sort(np.concatenate(parts))

    def _seed(ids: np.ndarray) -> np.ndarray:
        dist = np.full(len(ids), -1, np.int64)
        if len(ids):
            dist[_bucket_of(ids, salt) < seed_permille] = 0
        return dist

    edge_b = [
        ray.remote(_bucket_edges).remote(*[c[b] for c in edge_cols])
        for b in range(B)
    ]
    node_b = [
        ray.remote(_bucket_nodes).remote(*[c[b] for c in node_cols])
        for b in range(B)
    ]
    dist_b = [ray.remote(_seed).remote(node_b[b]) for b in range(B)]

    def _expand(edges: tuple, ids: np.ndarray, dist: np.ndarray, h: int) -> list:
        src, dst = edges
        f = ids[dist == h - 1]  # this bucket's frontier (sorted: ids sorted)
        if len(f) == 0 or len(src) == 0:
            return [np.empty(0, np.int64)] * B
        pos = np.searchsorted(f, src)
        m = (pos < len(f)) & (f[np.minimum(pos, len(f) - 1)] == src)
        out = np.unique(dst[m])
        bk = out % B
        order = np.argsort(bk, kind="stable")
        out, bk = out[order], bk[order]
        cuts = np.searchsorted(bk, np.arange(B + 1))
        return [out[cuts[i] : cuts[i + 1]] for i in range(B)]

    def _settle(ids: np.ndarray, dist: np.ndarray, h: int, *arrivals) -> np.ndarray:
        dist = dist.copy()  # object-store arrays are read-only
        arr = [a for a in arrivals if len(a)]
        if arr and len(ids):
            pos = np.searchsorted(ids, np.unique(np.concatenate(arr)))
            pos = pos[pos < len(ids)]
            fresh = pos[dist[pos] < 0]
            dist[fresh] = h
        return dist

    expand = ray.remote(num_returns=B)(_expand)
    settle = ray.remote(_settle)
    for h in range(1, max_hops + 1):
        outs = [expand.remote(edge_b[b], node_b[b], dist_b[b], h) for b in range(B)]
        dist_b = [
            settle.remote(node_b[c], dist_b[c], h, *[outs[b][c] for b in range(B)])
            for c in range(B)
        ]

    def _emit(ids: np.ndarray, dist: np.ndarray) -> pa.Table:
        m = dist >= 0
        return pa.table({id_col: pa.array(ids[m]), "hops": pa.array(dist[m])})

    emit = ray.remote(_emit)
    return ray.data.from_arrow_refs(
        [emit.remote(node_b[b], dist_b[b]) for b in range(B)]
    )


def bfs_hops_oracle_sql(
    table: str = "embeddings",
    k: int = 5,
    max_hops: int = 3,
    seed_permille: int = 40,
    id_col: str = "vec_id",
    salt: str = "bfs",
    knn_sql: str | None = None,
) -> str:
    """DuckDB mirror of ``bfs_hops``: a recursive CTE over the same knn-graph
    SQL (UNION, not UNION ALL, so the recursion is node-bounded), MIN(hops)
    per reached node. ``knn_sql`` swaps in a different edge-table SQL (e.g.
    ``knn_graph_lsh_oracle_sql`` to mirror ``bfs_hops(edges=knn_graph_lsh(…))``)."""
    from .sampling import _permille_sql

    knn = knn_sql or knn_graph_oracle_sql(table, k=k, id_col=id_col)
    return f"""
        WITH RECURSIVE knn AS ({knn}),
        edges AS (
            SELECT {id_col} AS src, neighbor_id AS dst FROM knn
            UNION
            SELECT neighbor_id, {id_col} FROM knn
        ),
        reach AS (
            SELECT {id_col} AS id, 0 AS hops FROM {table}
            WHERE {_permille_sql(id_col, salt)} < {seed_permille}
            UNION
            SELECT e.dst, r.hops + 1
            FROM reach r JOIN edges e ON e.src = r.id
            WHERE r.hops < {max_hops}
        )
        SELECT id AS {id_col}, CAST(MIN(hops) AS BIGINT) AS hops
        FROM reach GROUP BY 1
    """


def triangle_stats(
    ds,
    k: int = 5,
    id_col: str = "vec_id",
    round_to: int | None = 2,
    num_blocks: int | None = None,
    num_buckets: int | None = None,

    edges=None,):
    """Per-node triangle count and integer local clustering coefficient over
    the UNDIRECTED exact cosine k-NN graph — the density signal that separates
    tight semantic clusters (duplicates, templated families) from bridge
    nodes. ``lcc_pm`` is the clustering coefficient in PERMILLE with floor
    division (house integer-determinism style), so numpy and SQL agree
    bit-for-bit.

    Distributed shape: the PAGERANK bucket exchange (measured ~5x faster than
    chained ``Dataset.join``/groupby ops at sf0.1 — hash-shuffle aggregator
    actors have a fixed cost per op that dominates lean graph tables). One
    split pass buckets normalized edges by hash(u) and adjacency copies by
    hash(ctr); each bucket task dedupes, emits its nodes' degrees, and
    generates wedges (neighbour pairs, ≤ 2k·(2k−1)/2 per node — LINEAR in N
    for fixed k) addressed by wa's bucket; the closure stage matches wedges
    against its LOCAL deduped edge set ((wa,wc) lives in wa's bucket by
    construction — one pandas hash-merge, no shuffle) and addresses per-centre
    partial counts back to ctr's bucket, where the fold joins degrees. B²
    tiny refs per stage, state never on the driver, no N² term beyond the
    knn tiles themselves."""
    import pyarrow as pa
    import ray
    import ray.data

    edges_ds = (
        (knn_graph(ds, k=k, id_col=id_col, round_to=round_to,
                   num_blocks=num_blocks) if edges is None else edges)
        .select_columns([id_col, "neighbor_id"])
        .materialize()
    )
    n_edges = edges_ds.count()
    if num_buckets is None:
        # ~same recipe as pagerank, sized on nodes ≈ edges/k
        num_buckets = max(4, min(256, (n_edges // max(k, 1)) // 250_000 + 4))
    B = num_buckets

    def _split(t: pa.Table) -> list:
        if t.num_rows == 0 or id_col not in t.column_names:
            e = np.empty(0, np.int64)
            return [(e, e, e, e) for _ in range(B)]
        a = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("neighbor_id").to_numpy(zero_copy_only=False).astype(np.int64)
        u, v = np.minimum(a, b), np.maximum(a, b)
        # normalized edges keyed by u; adjacency copies keyed by ctr
        eu, ev, ebk = u, v, u % B
        ac = np.concatenate([u, v])
        an = np.concatenate([v, u])
        abk = ac % B
        eo = np.argsort(ebk, kind="stable")
        ao = np.argsort(abk, kind="stable")
        eu, ev, ebk = eu[eo], ev[eo], ebk[eo]
        ac, an, abk = ac[ao], an[ao], abk[ao]
        ec = np.searchsorted(ebk, np.arange(B + 1))
        acuts = np.searchsorted(abk, np.arange(B + 1))
        return [
            (
                eu[ec[i] : ec[i + 1]],
                ev[ec[i] : ec[i + 1]],
                ac[acuts[i] : acuts[i + 1]],
                an[acuts[i] : acuts[i + 1]],
            )
            for i in range(B)
        ]

    split = ray.remote(num_returns=B)(_split)
    cols = [split.remote(r) for r in edges_ds.to_arrow_refs()]

    def _dedup_pairs(x: np.ndarray, y: np.ndarray) -> tuple:
        order = np.lexsort((y, x))
        x, y = x[order], y[order]
        if len(x):
            fresh = np.empty(len(x), bool)
            fresh[0] = True
            fresh[1:] = (x[1:] != x[:-1]) | (y[1:] != y[:-1])
            x, y = x[fresh], y[fresh]
        return x, y

    def _bucket_wedges(*parts) -> list:
        """One bucket's combine: dedupe its edges and adjacency, emit
        (sorted local edge set, this bucket's degree table) first, then B
        wedge batches addressed by wa's bucket."""
        eu = np.concatenate([p[0] for p in parts])
        ev = np.concatenate([p[1] for p in parts])
        eu, ev = _dedup_pairs(eu, ev)
        ac = np.concatenate([p[2] for p in parts])
        an = np.concatenate([p[3] for p in parts])
        ac, an = _dedup_pairs(ac, an)  # sorted by (ctr, nb)
        ctrs, starts = np.unique(ac, return_index=True)
        degs = np.diff(np.append(starts, len(ac)))
        deg_t = pa.table({id_col: ctrs, "degree": degs.astype(np.int64)})
        # wedges per centre, vectorized by degree class (deg ≤ 2k is tiny)
        was, wcs, wct = [], [], []
        for d in np.unique(degs):
            if d < 2:
                continue
            sel = np.flatnonzero(degs == d)
            # (num_centres, d) matrix of each centre's sorted neighbours
            mat = an[starts[sel][:, None] + np.arange(d)[None, :]]
            ii, jj = np.triu_indices(int(d), k=1)
            was.append(mat[:, ii].reshape(-1))
            wcs.append(mat[:, jj].reshape(-1))
            wct.append(np.repeat(ctrs[sel], len(ii)))
        wa = np.concatenate(was) if was else np.empty(0, np.int64)
        wc = np.concatenate(wcs) if wcs else np.empty(0, np.int64)
        ct = np.concatenate(wct) if wct else np.empty(0, np.int64)
        bk = wa % B
        order = np.argsort(bk, kind="stable")
        wa, wc, ct, bk = wa[order], wc[order], ct[order], bk[order]
        cuts = np.searchsorted(bk, np.arange(B + 1))
        out = [((eu, ev), deg_t)]
        out += [
            (wa[cuts[i] : cuts[i + 1]], wc[cuts[i] : cuts[i + 1]],
             ct[cuts[i] : cuts[i + 1]])
            for i in range(B)
        ]
        return out

    bw = ray.remote(num_returns=B + 1)(_bucket_wedges)
    staged = [bw.remote(*[c[b] for c in cols]) for b in range(B)]
    local = [s[0] for s in staged]  # ((edge set, degree table)) per bucket
    wedge_to = [[staged[b][1 + c] for b in range(B)] for c in range(B)]

    def _close(local_b, *wedge_parts) -> list:
        """Match this bucket's addressed wedges against its LOCAL edge set
        (pandas hash-merge — exact, vectorized); address per-centre partial
        triangle counts to each centre's bucket."""
        (eu, ev), _deg = local_b
        wa = np.concatenate([p[0] for p in wedge_parts])
        wc = np.concatenate([p[1] for p in wedge_parts])
        ct = np.concatenate([p[2] for p in wedge_parts])
        if len(wa) and len(eu):
            m = pd.DataFrame({"wa": wa, "wc": wc, "ct": ct}).merge(
                pd.DataFrame({"wa": eu, "wc": ev}), on=["wa", "wc"], how="inner"
            )
            cu, cn = np.unique(m["ct"].to_numpy(), return_counts=True)
        else:
            cu, cn = np.empty(0, np.int64), np.empty(0, np.int64)
        bk = cu % B
        order = np.argsort(bk, kind="stable")
        cu, cn, bk = cu[order], cn[order], bk[order]
        cuts = np.searchsorted(bk, np.arange(B + 1))
        return [
            (cu[cuts[i] : cuts[i + 1]], cn[cuts[i] : cuts[i + 1]])
            for i in range(B)
        ]

    close = ray.remote(num_returns=B)(_close)
    closed = [close.remote(local[b], *wedge_to[b]) for b in range(B)]

    def _fold(local_b, *tri_parts) -> pa.Table:
        _edges, deg_t = local_b
        ids = deg_t.column(id_col).to_numpy(zero_copy_only=False)
        d = deg_t.column("degree").to_numpy(zero_copy_only=False)
        tr = np.zeros(len(ids), np.int64)
        for cu, cn in tri_parts:
            pos = np.searchsorted(ids, cu)  # ids sorted (np.unique order)
            tr[pos] += cn
        lcc = np.where(d >= 2, (2000 * tr) // np.maximum(d * (d - 1), 1), 0)
        return pa.table(
            {
                id_col: pa.array(ids),
                "degree": pa.array(d.astype(np.int64)),
                "triangles": pa.array(tr),
                "lcc_pm": pa.array(lcc.astype(np.int64)),
            }
        )

    fold = ray.remote(_fold)
    return ray.data.from_arrow_refs(
        [fold.remote(local[c], *[closed[b][c] for b in range(B)]) for c in range(B)]
    )


def triangle_stats_oracle_sql(
    table: str = "embeddings", k: int = 5, id_col: str = "vec_id",
    knn_sql: str | None = None,
) -> str:
    """DuckDB mirror of ``triangle_stats`` (wedge ⋈ edge closure, permille
    floor-division clustering coefficient). ``knn_sql`` swaps in a different
    edge-table SQL (e.g. ``knn_graph_lsh_oracle_sql`` to mirror
    ``triangle_stats(edges=knn_graph_lsh(…))``)."""
    knn = knn_sql or knn_graph_oracle_sql(table, k=k, id_col=id_col)
    return f"""
        WITH knn AS ({knn}),
        und AS (
            SELECT DISTINCT LEAST({id_col}, neighbor_id) AS u,
                   GREATEST({id_col}, neighbor_id) AS v
            FROM knn
        ),
        adj AS (SELECT u AS ctr, v AS nb FROM und
                UNION ALL SELECT v, u FROM und),
        deg AS (SELECT ctr, count(*) AS degree FROM adj GROUP BY 1),
        wedge AS (
            SELECT a.ctr, a.nb AS wa, b.nb AS wc
            FROM adj a JOIN adj b ON a.ctr = b.ctr AND a.nb < b.nb
        ),
        tri AS (
            SELECT w.ctr, count(*) AS t
            FROM wedge w JOIN und e ON e.u = w.wa AND e.v = w.wc
            GROUP BY 1
        )
        SELECT d.ctr AS {id_col},
               CAST(d.degree AS BIGINT) AS degree,
               CAST(COALESCE(tri.t, 0) AS BIGINT) AS triangles,
               CAST(CASE WHEN d.degree >= 2
                    THEN (2000 * COALESCE(tri.t, 0)) // (d.degree * (d.degree - 1))
                    ELSE 0 END AS BIGINT) AS lcc_pm
        FROM deg d LEFT JOIN tri ON tri.ctr = d.ctr
    """


def adamic_adar(
    ds,
    k: int = 5,
    id_col: str = "vec_id",
    round_to: int | None = 2,
    num_blocks: int | None = None,
    num_buckets: int | None = None,
    scale: int = 10**12,

    edges=None,):
    """Adamic–Adar link prediction over the undirected exact k-NN graph:
    for every OPEN wedge pair (a, c) — two vectors sharing a neighbour but
    not yet connected — the score Σ_b 1/ln(deg(b)) over their common
    neighbours b, the classic "should these join the same cluster" signal
    that completes near-dup groups and proposes graph edges. House integer
    determinism: the ONE transcendental ln(deg) is quantized to int64 at 1e6
    scale, each contribution is the floor division ``scale // lnq``, and the
    pair score is the exact int64 sum — numpy and the SQL oracle agree
    bit-for-bit.

    Distributed shape: the ``triangle_stats`` bucket exchange with the
    closure test INVERTED — wedges carry their centre's quantized weight,
    the closure bucket ANTI-joins them against its local edge set (a pair
    (wa,wc) lives in wa's bucket by construction), and one local groupby
    sums each surviving pair's contributions — already globally complete,
    so the fold stage disappears."""
    import pyarrow as pa
    import ray
    import ray.data

    edges_ds = (
        (knn_graph(ds, k=k, id_col=id_col, round_to=round_to,
                   num_blocks=num_blocks) if edges is None else edges)
        .select_columns([id_col, "neighbor_id"])
        .materialize()
    )
    n_edges = edges_ds.count()
    if num_buckets is None:
        num_buckets = max(4, min(256, (n_edges // max(k, 1)) // 250_000 + 4))
    B = num_buckets

    def _split(t: pa.Table) -> list:
        if t.num_rows == 0 or id_col not in t.column_names:
            e = np.empty(0, np.int64)
            return [(e, e, e, e) for _ in range(B)]
        a = t.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = t.column("neighbor_id").to_numpy(zero_copy_only=False).astype(np.int64)
        u, v = np.minimum(a, b), np.maximum(a, b)
        ac, an = np.concatenate([u, v]), np.concatenate([v, u])
        ebk, abk = u % B, ac % B
        eo, ao = np.argsort(ebk, kind="stable"), np.argsort(abk, kind="stable")
        eu, ev, ebk = u[eo], v[eo], ebk[eo]
        ac, an, abk = ac[ao], an[ao], abk[ao]
        ec = np.searchsorted(ebk, np.arange(B + 1))
        acuts = np.searchsorted(abk, np.arange(B + 1))
        return [
            (
                eu[ec[i] : ec[i + 1]],
                ev[ec[i] : ec[i + 1]],
                ac[acuts[i] : acuts[i + 1]],
                an[acuts[i] : acuts[i + 1]],
            )
            for i in range(B)
        ]

    def _dedup_pairs(x: np.ndarray, y: np.ndarray) -> tuple:
        order = np.lexsort((y, x))
        x, y = x[order], y[order]
        if len(x):
            fresh = np.empty(len(x), bool)
            fresh[0] = True
            fresh[1:] = (x[1:] != x[:-1]) | (y[1:] != y[:-1])
            x, y = x[fresh], y[fresh]
        return x, y

    def _wedges(*parts) -> list:
        eu = np.concatenate([p[0] for p in parts])
        ev = np.concatenate([p[1] for p in parts])
        eu, ev = _dedup_pairs(eu, ev)
        ac = np.concatenate([p[2] for p in parts])
        an = np.concatenate([p[3] for p in parts])
        ac, an = _dedup_pairs(ac, an)
        ctrs, starts = np.unique(ac, return_index=True)
        degs = np.diff(np.append(starts, len(ac)))
        lnq = np.round(np.log(np.maximum(degs, 2)) * 1_000_000).astype(np.int64)
        w = scale // lnq  # centre weight rides the wedge
        was, wcs, wws = [], [], []
        for d in np.unique(degs):
            if d < 2:
                continue
            sel = np.flatnonzero(degs == d)
            mat = an[starts[sel][:, None] + np.arange(d)[None, :]]
            ii, jj = np.triu_indices(int(d), k=1)
            was.append(mat[:, ii].reshape(-1))
            wcs.append(mat[:, jj].reshape(-1))
            wws.append(np.repeat(w[sel], len(ii)))
        wa = np.concatenate(was) if was else np.empty(0, np.int64)
        wc = np.concatenate(wcs) if wcs else np.empty(0, np.int64)
        ww = np.concatenate(wws) if wws else np.empty(0, np.int64)
        bk = wa % B
        order = np.argsort(bk, kind="stable")
        wa, wc, ww, bk = wa[order], wc[order], ww[order], bk[order]
        cuts = np.searchsorted(bk, np.arange(B + 1))
        out = [(eu, ev)]
        out += [
            (wa[cuts[i] : cuts[i + 1]], wc[cuts[i] : cuts[i + 1]],
             ww[cuts[i] : cuts[i + 1]])
            for i in range(B)
        ]
        return out

    split = ray.remote(num_returns=B)(_split)
    wedge_t = ray.remote(num_returns=B + 1)(_wedges)
    cols = [split.remote(r) for r in edges_ds.to_arrow_refs()]
    staged = [wedge_t.remote(*[c[b] for c in cols]) for b in range(B)]
    local = [s[0] for s in staged]
    wedge_to = [[staged[b][1 + c] for b in range(B)] for c in range(B)]

    def _score(local_b, *wedge_parts) -> pa.Table:
        eu, ev = local_b
        wa = np.concatenate([p[0] for p in wedge_parts])
        wc = np.concatenate([p[1] for p in wedge_parts])
        ww = np.concatenate([p[2] for p in wedge_parts])
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "aa_score": pa.array([], pa.int64()),
            }
        )
        if not len(wa):
            return empty
        df = pd.DataFrame({"id_a": wa, "id_b": wc, "w": ww})
        if len(eu):
            closed = pd.DataFrame({"id_a": eu, "id_b": ev, "_e": 1})
            df = df.merge(closed, on=["id_a", "id_b"], how="left")
            df = df[df["_e"].isna()]  # OPEN wedges only
        if not len(df):
            return empty
        out = df.groupby(["id_a", "id_b"], sort=False, as_index=False)["w"].sum()
        return pa.table(
            {
                "id_a": pa.array(out["id_a"].to_numpy(np.int64)),
                "id_b": pa.array(out["id_b"].to_numpy(np.int64)),
                "aa_score": pa.array(out["w"].to_numpy(np.int64)),
            }
        )

    score = ray.remote(_score)
    return ray.data.from_arrow_refs(
        [score.remote(local[b], *wedge_to[b]) for b in range(B)]
    )


def adamic_adar_oracle_sql(
    table: str = "embeddings",
    k: int = 5,
    id_col: str = "vec_id",
    scale: int = 10**12,
    knn_sql: str | None = None,
) -> str:
    """DuckDB mirror of ``adamic_adar`` (open wedges only; ln quantized to
    1e6 then floor-divided — bit-exact vs numpy). ``knn_sql`` swaps in a
    different edge-table SQL (e.g. ``knn_graph_lsh_oracle_sql`` to mirror
    ``adamic_adar(edges=knn_graph_lsh(…))``)."""
    knn = knn_sql or knn_graph_oracle_sql(table, k=k, id_col=id_col)
    return f"""
        WITH knn AS ({knn}),
        und AS (
            SELECT DISTINCT LEAST({id_col}, neighbor_id) AS u,
                   GREATEST({id_col}, neighbor_id) AS v
            FROM knn
        ),
        adj AS (SELECT u AS ctr, v AS nb FROM und
                UNION ALL SELECT v, u FROM und),
        deg AS (SELECT ctr, count(*) AS degree FROM adj GROUP BY 1),
        wedge AS (
            SELECT a.ctr, a.nb AS wa, b.nb AS wc
            FROM adj a JOIN adj b ON a.ctr = b.ctr AND a.nb < b.nb
        ),
        openw AS (
            SELECT w.ctr, w.wa, w.wc
            FROM wedge w LEFT JOIN und e ON e.u = w.wa AND e.v = w.wc
            WHERE e.u IS NULL
        ),
        contrib AS (
            SELECT o.wa, o.wc,
                   {scale} // CAST(round(ln(d.degree) * 1000000) AS BIGINT) AS c
            FROM openw o JOIN deg d ON d.ctr = o.ctr
        )
        SELECT wa AS id_a, wc AS id_b, CAST(SUM(c) AS BIGINT) AS aa_score
        FROM contrib GROUP BY 1, 2
    """
