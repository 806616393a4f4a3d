"""Deterministic sampling / splitting for training-data pipelines.

A train/test split must be a pure function of the row id — stable across
reruns, cluster sizes, and partition layouts — so it is computed from
md5(salt || id), not an RNG. Map-only (no shuffle), and reproducible in SQL
(``hash_split_oracle_sql``) because DuckDB's md5() is the same function.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

_FRAC_BITS = 13  # 52 bits — exact in a float64, same parse as stages/sketches


def _bucket_of(values, salt: str) -> np.ndarray:
    """md5(salt || str(id)) first 13 hex chars as int, mod 1000 (permille)."""
    return np.array(
        [
            int(hashlib.md5(f"{salt}{v}".encode("utf-8")).hexdigest()[:_FRAC_BITS], 16)
            % 1000
            for v in values
        ],
        dtype=np.int64,
    )


def hash_split(ds, id_col: str, test_permille: int = 100, salt: str = "split"):
    """Adds a ``split`` column: 'test' iff the id's hash permille falls below
    ``test_permille``, else 'train'. Changing ``salt`` yields an independent
    split; the same (salt, id) always lands on the same side."""

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        pm = _bucket_of(batch[id_col].to_numpy(), salt)
        batch = batch.copy()
        batch["split"] = np.where(pm < test_permille, "test", "train")
        return batch

    return ds.map_batches(tag, batch_format="pandas")


def hash_sample(ds, id_col: str, keep_permille: int, salt: str = "sample"):
    """Deterministic fractional sample: keep rows whose hash permille falls
    below ``keep_permille`` — the id-stable cousin of ``Dataset.random_sample``
    (resumable pipelines need the same rows kept on every rerun)."""

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        pm = _bucket_of(batch[id_col].to_numpy(), salt)
        return batch.loc[pm < keep_permille]

    return ds.map_batches(pick, batch_format="pandas")


def _permille_sql(id_col: str, salt: str) -> str:
    parse = (
        f"list_reduce(list_transform(range(1, {_FRAC_BITS + 1}), "
        f"i -> CAST(strpos('0123456789abcdef', substr(md5('{salt}' || "
        f"CAST({id_col} AS VARCHAR)), CAST(i AS INT), 1)) AS BIGINT) - 1), "
        f"(a, b) -> a * 16 + b)"
    )
    return f"({parse}) % 1000"


def hash_split_oracle_sql(
    table: str, id_col: str, test_permille: int = 100, salt: str = "split"
) -> str:
    """DuckDB mirror of ``hash_split`` (same md5, same 52-bit hex parse)."""
    return f"""
        SELECT {id_col},
               CASE WHEN {_permille_sql(id_col, salt)} < {test_permille}
                    THEN 'test' ELSE 'train' END AS split
        FROM {table}
    """


def hash_sample_oracle_sql(
    table: str, id_col: str, keep_permille: int, salt: str = "sample"
) -> str:
    """DuckDB mirror of ``hash_sample``."""
    return f"""
        SELECT {id_col}
        FROM {table}
        WHERE {_permille_sql(id_col, salt)} < {keep_permille}
    """


def _hash_int(values, salt: str) -> np.ndarray:
    """md5(salt || str(id)) first 13 hex chars as int64 (same parse as
    ``_bucket_of``, un-modded)."""
    return np.array(
        [
            int(hashlib.md5(f"{salt}{v}".encode("utf-8")).hexdigest()[:_FRAC_BITS], 16)
            for v in values
        ],
        dtype=np.int64,
    )


def shuffle_shard(ds, id_col: str, num_shards: int, salt: str = "shuf"):
    """Deterministic global shuffle + shard assignment for training-data
    writers: shard = md5(salt||id) mod ``num_shards`` (an iid deal — map-only),
    position within the shard = rank under an independent md5 order. Together
    that IS a seeded global permutation dealt into shards, with no global-sort
    barrier: assignment never shuffles, and each shard orders independently
    (one groupby group per shard). Rerunning at any cluster size reproduces
    the identical (shard, pos) for every id — the resumability contract of
    ``hash_split``, extended to epoch ordering."""

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        out = batch[[id_col]].copy()
        out["shard"] = _hash_int(ids, f"shard:{salt}") % num_shards
        out["_h"] = _rank_hash(ids, f"ord:{salt}")
        return out

    def order(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", id_col], kind="stable").reset_index(drop=True)
        g["pos"] = np.arange(len(g), dtype=np.int64)
        return g.drop(columns=["_h"])

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("shard")
        .map_groups(order, batch_format="pandas")
    )


def _hash_int_sql(id_col: str, salt: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, {_FRAC_BITS + 1}), "
        f"i -> CAST(strpos('0123456789abcdef', substr(md5('{salt}' || "
        f"CAST({id_col} AS VARCHAR)), CAST(i AS INT), 1)) AS BIGINT) - 1), "
        f"(a, b) -> a * 16 + b)"
    )


def shuffle_shard_oracle_sql(
    table: str, id_col: str, num_shards: int, salt: str = "shuf"
) -> str:
    """DuckDB mirror of ``shuffle_shard`` (same md5 parse, same order key)."""
    return f"""
        SELECT {id_col}, shard,
               row_number() OVER (
                   PARTITION BY shard
                   ORDER BY md5('ord:{salt}' || CAST({id_col} AS VARCHAR)), {id_col}
               ) - 1 AS pos
        FROM (
            SELECT {id_col},
                   ({_hash_int_sql(id_col, f"shard:{salt}")}) % {num_shards} AS shard
            FROM {table}
        )
    """


def pack_sequences(
    ds,
    id_col: str,
    n_tokens_col: str,
    seq_len: int,
    num_shards: int,
    salt: str = "shuf",
):
    """Concat-then-chunk sequence packing (the classic pretraining layout):
    documents are laid end to end in the deterministic ``shuffle_shard`` order
    of their shard, and the token stream is cut every ``seq_len`` tokens. Each
    doc row gains (shard, pos, seq_start, seq_end, offset_in_seq) — the
    training sequences it lands in and where — all integer arithmetic over a
    per-shard running token total, so the layout is reproducible at any
    cluster size and resumable mid-corpus.

    Shard assignment is map-only; the running total is one vectorized cumsum
    per shard group (each shard is an independent training stream, so no
    global prefix-sum barrier is needed)."""

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[id_col].to_numpy()
        out = batch[[id_col, n_tokens_col]].copy()
        out["shard"] = _hash_int(ids, f"shard:{salt}") % num_shards
        out["_h"] = _rank_hash(ids, f"ord:{salt}")
        return out

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", id_col], kind="stable").reset_index(drop=True)
        n = g[n_tokens_col].to_numpy().astype(np.int64)
        cum_before = np.cumsum(n) - n
        g["pos"] = np.arange(len(g), dtype=np.int64)
        g["seq_start"] = cum_before // seq_len
        g["seq_end"] = np.maximum(cum_before, cum_before + n - 1) // seq_len
        g["offset_in_seq"] = cum_before % seq_len
        return g.drop(columns=["_h"])

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("shard")
        .map_groups(pack, batch_format="pandas")
    )


def pack_sequences_oracle_sql(
    table: str,
    id_col: str,
    n_tokens_expr: str,
    seq_len: int,
    num_shards: int,
    salt: str = "shuf",
) -> str:
    """DuckDB mirror of ``pack_sequences`` (same md5 order, same window sum).
    ``n_tokens_expr`` is the SQL expression for the per-row token count."""
    return f"""
        SELECT {id_col}, n_tokens, shard,
               row_number() OVER w - 1 AS pos,
               CAST((sum(n_tokens) OVER w - n_tokens) // {seq_len} AS BIGINT) AS seq_start,
               CAST(greatest(sum(n_tokens) OVER w - n_tokens,
                             sum(n_tokens) OVER w - 1) // {seq_len} AS BIGINT) AS seq_end,
               CAST((sum(n_tokens) OVER w - n_tokens) % {seq_len} AS BIGINT) AS offset_in_seq
        FROM (
            SELECT {id_col}, {n_tokens_expr} AS n_tokens,
                   ({_hash_int_sql(id_col, f"shard:{salt}")}) % {num_shards} AS shard,
                   md5('ord:{salt}' || CAST({id_col} AS VARCHAR)) AS h
            FROM {table}
        )
        WINDOW w AS (PARTITION BY shard ORDER BY h, {id_col}
                     ROWS UNBOUNDED PRECEDING)
    """


def _rank_hash(values, salt: str) -> np.ndarray:
    """Full md5 hex (lexicographic = numeric order) — the per-key rank key."""
    return np.array(
        [hashlib.md5(f"{salt}{v}".encode("utf-8")).hexdigest() for v in values],
        dtype=object,
    )


def stratified_sample(
    ds,
    key_col: str,
    id_col: str,
    n_per_key: int,
    salt: str = "strat",
    num_buckets: int = 64,
):
    """Deterministic stratified sample: the ``n_per_key`` rows with the
    smallest (md5(salt||id), id) per key — id-stable across reruns, cluster
    sizes and partition layouts, like ``hash_split``.

    Two-stage top-n under one total order (associative): a per-batch partial
    prunes to ≤ n rows per key before the coarse key-bucket shuffle; the
    per-bucket final applies the same rule, so the distributed result equals
    a single global pass. Oracle: ``stratified_sample_oracle_sql`` (same md5,
    same tie-break)."""
    from ..hashing import stable_hash

    def best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, "_h", id_col], kind="stable")
        return df.groupby(key_col, sort=False).head(n_per_key)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_h=_rank_hash(df[id_col].to_numpy(), salt))
        df = best(df)
        df["_b"] = (
            stable_hash(df[key_col].astype(str)) % np.uint64(num_buckets)
        ).astype(np.int64)
        return df

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return best(g).drop(columns=["_b", "_h"])

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("_b")
        .map_groups(final, batch_format="pandas")
    )


def stratified_sample_oracle_sql(
    table: str, key_col: str, id_col: str, n_per_key: int, salt: str = "strat"
) -> str:
    """DuckDB mirror of ``stratified_sample`` (same md5 rank, same tie-break)."""
    return f"""
        SELECT * EXCLUDE (rn) FROM (
            SELECT {id_col}, {key_col},
                   row_number() OVER (
                       PARTITION BY {key_col}
                       ORDER BY md5('{salt}' || CAST({id_col} AS VARCHAR)), {id_col}
                   ) AS rn
            FROM {table}
        ) WHERE rn <= {n_per_key}
    """


def quota_sample(
    ds,
    key_col: str = "source",
    id_col: str = "doc_id",
    quota: int = 10,
    salt: str = "quota",
):
    """Per-key quota sampling (cap documents per source/domain — the standard
    corpus-balancing step): keep the ``quota`` rows with the smallest
    md5(salt||id) per key. Deterministic at any cluster size, like every
    sampler here.

    Map-side partial top-N per key (combiner) → tiny groupby final: the
    shuffle carries at most quota rows per (block, key), never the corpus."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        b = batch.assign(_h=_hash_int(batch[id_col].to_numpy(), salt))
        b = b.sort_values(["_h", id_col], kind="stable")
        return b.groupby(key_col, sort=False).head(quota)

    def final(grp: pd.DataFrame) -> pd.DataFrame:
        return (
            grp.sort_values(["_h", id_col], kind="stable")
            .head(quota)
            .drop(columns=["_h"])
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(key_col)
        .map_groups(final, batch_format="pandas")
    )


def quota_sample_oracle_sql(
    table: str,
    key_col: str = "source",
    id_col: str = "doc_id",
    quota: int = 10,
    salt: str = "quota",
) -> str:
    """DuckDB mirror of ``quota_sample``. Fixed-width hex compares identically
    to the parsed integer, so ORDER BY the md5 prefix string reproduces the
    engine's order without the hex-parse lambda."""
    return f"""
        SELECT {id_col}, {key_col} FROM (
            SELECT {id_col}, {key_col},
                   row_number() OVER (
                       PARTITION BY {key_col}
                       ORDER BY substr(md5('{salt}' || CAST({id_col} AS VARCHAR)), 1, 13),
                                {id_col}) AS rn
            FROM {table}
        ) WHERE rn <= {quota}
    """


def mix_to_proportions(
    ds, id_col: str, source_col: str, weights: dict[str, int], salt: str = "mix"
):
    """Deterministic corpus mixing (The Pile / Gopher-style source weighting):
    downsample each source so the kept corpus approaches the target weight
    proportions — never upsampling. The rate derivation is all-integer, so
    the engine and the SQL oracle compute IDENTICAL rates from identical
    counts:

        W = Σ w_s
        T = min_s (n_s · W) // w_s      (max total honoring every proportion)
        k_s = (w_s · T) // W            (per-source keep target)
        rate_s = (1000 · k_s) // n_s    (keep permille)

    then keep rows whose md5 permille (id-stable — the SAME row set at any
    cluster size) falls below the source's rate. One O(#sources) count
    groupby + a map-only filter; sources absent from ``weights`` drop."""
    counts = ds.groupby(source_col).count().to_pandas()
    n = dict(zip(counts[source_col], counts["count()"].astype(int)))
    W = sum(weights.values())
    T = min((n[s] * W) // w for s, w in weights.items() if s in n and w > 0)
    rates = {
        s: (1000 * ((w * T) // W)) // n[s]
        for s, w in weights.items()
        if s in n and w > 0
    }

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        pm = _bucket_of(batch[id_col].to_numpy(), salt)
        rate = batch[source_col].map(rates).fillna(0).to_numpy(np.int64)
        return batch.loc[pm < rate]

    return ds.map_batches(pick, batch_format="pandas")


def mix_oracle_sql(
    table: str,
    id_col: str,
    source_col: str,
    weights: dict[str, int],
    salt: str = "mix",
) -> str:
    """DuckDB mirror of ``mix_to_proportions`` — the same integer rate grid
    over the same counts, weights inlined as a VALUES relation."""
    vals = ", ".join(f"('{s}', {int(w)})" for s, w in sorted(weights.items()))
    return f"""
        WITH w({source_col}, wgt) AS (VALUES {vals}),
        n AS (
            SELECT {source_col}, CAST(count(*) AS BIGINT) AS n_s
            FROM {table} GROUP BY {source_col}
        ), tot AS (
            SELECT CAST(sum(wgt) AS BIGINT) AS W FROM w
        ), t AS (
            SELECT min((n.n_s * tot.W) // w.wgt) AS T
            FROM n JOIN w USING ({source_col}), tot
            WHERE w.wgt > 0
        ), r AS (
            SELECT w.{source_col},
                   (1000 * ((w.wgt * t.T) // tot.W)) // n.n_s AS rate
            FROM w JOIN n USING ({source_col}), t, tot
            WHERE w.wgt > 0
        )
        SELECT d.*
        FROM {table} d JOIN r USING ({source_col})
        WHERE {_permille_sql("d." + id_col, salt)} < r.rate
    """


def temperature_weights(n: dict[str, int], alpha_pm: int) -> dict[str, int]:
    """Temperature/alpha-sampling source weights (the multilingual-training
    recipe: p_s ∝ n_s^α with α ∈ (0, 1] flattening the source distribution
    toward uniform): w_s = round(10⁶ · n_s^(alpha_pm/1000)). House integer
    determinism via the quantized-transcendental rule (cf. ``adamic_adar``'s
    ln(deg) and the lm-fluency scorer): ONE exp∘ln per source, quantized to
    int64 at 1e6 — numpy and DuckDB produce the identical integers, so the
    derived weights (and everything downstream of them) are oracled."""
    out = {}
    for s, ns in n.items():
        v = np.exp((alpha_pm / 1000.0) * np.log(float(ns))) * 1e6
        out[s] = int(np.floor(v + 0.5))
    return out


def temperature_mix(
    ds,
    id_col: str,
    source_col: str,
    alpha_pm: int = 500,
    salt: str = "tmix",
):
    """Temperature-based corpus mixing: downsample sources toward the
    n_s^α proportions (α = ``alpha_pm``/1000) — α=1000 keeps the natural
    distribution, α→0 approaches uniform; the standard lever for keeping
    low-resource sources/languages represented. Derives the integer weights
    with ``temperature_weights`` from the SAME O(#sources) count pass
    ``mix_to_proportions`` already does, then reuses its id-stable integer
    rate grid verbatim — one count groupby + a map-only filter, identical
    kept rows at any cluster size."""
    counts = ds.groupby(source_col).count().to_pandas()
    n = dict(zip(counts[source_col], counts["count()"].astype(int)))
    return mix_to_proportions(
        ds, id_col, source_col, temperature_weights(n, alpha_pm), salt=salt
    )


def temperature_mix_oracle_sql(
    table: str,
    id_col: str,
    source_col: str,
    alpha_pm: int = 500,
    salt: str = "tmix",
) -> str:
    """DuckDB mirror of ``temperature_mix``: weights re-DERIVED from the
    counts inside SQL (floor(1e6·exp(α·ln n)+0.5), the same quantized
    transcendental), then the identical integer rate grid as
    ``mix_oracle_sql``."""
    return f"""
        WITH n AS (
            SELECT {source_col}, CAST(count(*) AS BIGINT) AS n_s
            FROM {table} GROUP BY {source_col}
        ), w AS (
            SELECT {source_col}, n_s,
                   CAST(floor(1e6 * exp(({alpha_pm} / 1000.0) * ln(CAST(n_s AS DOUBLE))) + 0.5) AS BIGINT) AS wgt
            FROM n
        ), tot AS (
            SELECT CAST(sum(wgt) AS BIGINT) AS W FROM w
        ), t AS (
            SELECT min((w.n_s * tot.W) // w.wgt) AS T
            FROM w, tot WHERE w.wgt > 0
        ), r AS (
            SELECT w.{source_col},
                   (1000 * ((w.wgt * t.T) // tot.W)) // w.n_s AS rate
            FROM w, t, tot
            WHERE w.wgt > 0
        )
        SELECT d.*
        FROM {table} d JOIN r USING ({source_col})
        WHERE {_permille_sql("d." + id_col, salt)} < r.rate
    """


def priority_sample(
    ds,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "prio",
):
    """Weighted sampling WITHOUT replacement via priority sampling
    (Duffield-Lund-Thorup, JACM 2007): each row gets priority
    ``w / u`` with ``u`` uniform on the row's id, and the k highest
    priorities are the sample — inclusion probability ≈ proportional to
    weight, and the scheme is the variance-optimal k-sample for subset-sum
    estimation. Deterministic twist: ``u`` is the 52-bit md5 grid of
    ``hash_split`` (u+1 ∈ [1, 2^52], exactly representable in a float64), and
    the priority is ONE correctly-rounded IEEE division — numpy and DuckDB
    produce bit-identical doubles, so the weighted sample itself is oracled
    (same total order, ties broken by id).

    Map-only + driver merge: each batch emits its local top-k (k rows), one
    O(k × blocks) final task ranks the survivors — no shuffle, identical
    rows at any cluster size. Weights must be positive integers."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        u = _hash_int(batch[id_col].to_numpy(), salt)
        out = batch[[id_col, weight_col]].copy()
        out["priority"] = out[weight_col].to_numpy(np.float64) / (
            u.astype(np.float64) + 1.0
        )
        out = out.sort_values(
            ["priority", id_col], ascending=[False, True], kind="stable"
        )
        return out.head(k)

    def final(t: pd.DataFrame) -> pd.DataFrame:
        t = t.sort_values(
            ["priority", id_col], ascending=[False, True], kind="stable"
        ).head(k)
        t = t.reset_index(drop=True)
        t["rank"] = np.arange(1, len(t) + 1, dtype=np.int64)
        return t

    return (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def priority_sample_oracle_sql(
    table: str,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "prio",
) -> str:
    """DuckDB mirror of ``priority_sample`` (same md5 grid, same single IEEE
    division, same (priority DESC, id) order)."""
    return f"""
        SELECT {id_col}, {weight_col},
               CAST({weight_col} AS DOUBLE)
                   / CAST(({_hash_int_sql(id_col, salt)}) + 1 AS DOUBLE)
                   AS priority,
               CAST(row_number() OVER (
                   ORDER BY priority DESC, {id_col} ASC
               ) AS BIGINT) AS rank
        FROM {table}
        QUALIFY rank <= {k}
    """
