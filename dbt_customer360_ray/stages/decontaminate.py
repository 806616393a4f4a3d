"""Benchmark decontamination: drop training documents that share an exact
word n-gram with an evaluation/benchmark set.

The standard training-data hygiene pass (GPT-3 appendix C / The Pile use
13-grams; the driver entry uses n=4 scaled to the fixture's ~40-word docs).
The eval side is small by nature — benchmark suites are ~10^4-10^6 documents
— so the default path broadcasts the eval n-gram set once (``ray.put``) and
decontamination is ONE map-only pass over the training corpus: no shuffle,
the 100 TB shape. Above ``broadcast_gate`` eval grams, a size-gated fallback
explodes the train side to (gram-hash, doc_id) rows and bucket-joins — the
same gate pattern as ``ngram_jaccard_pairs``.

No reference analogue (the reference cleans CRM rows, not corpora); this is
part of the LLM-pipeline extension surface alongside stages/dedup.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..hashing import stable_hash


def doc_ngrams(texts, n: int) -> list[list[str]]:
    """Word n-grams per text (whitespace tokens). Documents shorter than n
    tokens contribute no grams — too short to witness contamination."""
    out = []
    for t in texts:
        toks = (t or "").split()
        out.append(
            [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        )
    return out


def _eval_gram_rows(eval_ds, text_col: str, n: int):
    """Eval grams as a Dataset of distinct-per-batch (gram,) rows."""

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        grams = set()
        for gs in doc_ngrams(batch[text_col].to_numpy(), n):
            grams.update(gs)
        return pd.DataFrame({"gram": sorted(grams)})

    return eval_ds.map_batches(explode, batch_format="pandas").materialize()


def decontaminate(
    train_ds,
    eval_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    broadcast_gate: int = 5_000_000,
    num_buckets: int = 64,
):
    """Surviving train-doc ids: rows of ``train_ds`` sharing NO word n-gram
    with any ``eval_ds`` document. Returns a Dataset with one ``id_col``
    column.

    Path choice is decided from the materialized eval-gram count (a count(),
    never a driver collect of the big side): ≤ ``broadcast_gate`` grams →
    broadcast-set membership filter (map-only); above → bucket-join on the
    64-bit gram hash (collision odds ~1e-19 per corpus — documented epsilon).
    """
    import ray

    gram_rows = _eval_gram_rows(eval_ds, text_col, n)
    n_grams = gram_rows.count()

    if n_grams <= broadcast_gate:
        gram_set = set(gram_rows.to_pandas()["gram"]) if n_grams else set()
        set_ref = ray.put(gram_set)

        def keep_clean(batch: pd.DataFrame) -> pd.DataFrame:
            gs = ray.get(set_ref)
            grams = doc_ngrams(batch[text_col].to_numpy(), n)
            clean = np.array(
                [not any(g in gs for g in doc) for doc in grams], dtype=bool
            )
            return batch.loc[clean, [id_col]]

        return train_ds.map_batches(keep_clean, batch_format="pandas")

    # distributed fallback: hash grams to uint64, bucket both sides by
    # hash % num_buckets, mark train docs seen next to an eval gram
    def train_gram_hashes(batch: pd.DataFrame) -> pd.DataFrame:
        ids, hs = [], []
        for i, gs in zip(
            batch[id_col].to_numpy(), doc_ngrams(batch[text_col].to_numpy(), n)
        ):
            uniq = np.unique(np.array(gs, dtype=object)) if gs else np.array([], object)
            ids.append(np.full(len(uniq), i, dtype=np.int64))
            hs.append(stable_hash(uniq).astype(np.uint64) if len(uniq) else np.array([], np.uint64))
        h = np.concatenate(hs) if hs else np.array([], np.uint64)
        return pd.DataFrame(
            {
                id_col: np.concatenate(ids) if ids else np.array([], np.int64),
                "gh": h.astype(np.int64),
                "bucket": (h % np.uint64(num_buckets)).astype(np.int64),
                "side": 0,
            }
        )

    def eval_gram_hashes(batch: pd.DataFrame) -> pd.DataFrame:
        h = stable_hash(batch["gram"].to_numpy()).astype(np.uint64)
        return pd.DataFrame(
            {
                id_col: np.full(len(h), -1, dtype=np.int64),
                "gh": h.astype(np.int64),
                "bucket": (h % np.uint64(num_buckets)).astype(np.int64),
                "side": 1,
            }
        )

    both = train_ds.map_batches(train_gram_hashes, batch_format="pandas").union(
        gram_rows.map_batches(eval_gram_hashes, batch_format="pandas")
    )

    def contaminated_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        hot = set(g.loc[g["side"] == 1, "gh"])
        tr = g[g["side"] == 0]
        bad = tr.loc[tr["gh"].isin(hot), [id_col]].drop_duplicates()
        return bad

    contaminated = (
        both.groupby("bucket")
        .map_groups(contaminated_in_bucket, batch_format="pandas")
        .to_pandas()[id_col]
        .to_numpy()
    )
    from .joins import anti_join

    return anti_join(train_ds, contaminated, on=id_col).map_batches(
        lambda b: b[[id_col]], batch_format="pandas"
    )


def decontaminate_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    eval_pred: str = "doc_id % 37 = 0",
) -> str:
    """DuckDB mirror: same whitespace n-grams, same survivor definition. The
    eval set is carved out of ``table`` by ``eval_pred`` (how the driver entry
    builds its benchmark side)."""
    return f"""
        WITH tok AS (
            SELECT {id_col}, string_split({text_col}, ' ') AS w FROM {table}
        ), grams AS (
            SELECT {id_col}, unnest(list_transform(
                generate_series(1, greatest(len(w) - {n} + 1, 0)),
                i -> array_to_string(w[i : i + {n} - 1], ' '))) AS g
            FROM tok
        ), eval_g AS (
            SELECT DISTINCT g FROM grams WHERE {eval_pred}
        ), contaminated AS (
            SELECT DISTINCT {id_col} FROM grams
            WHERE NOT ({eval_pred}) AND g IN (SELECT g FROM eval_g)
        )
        SELECT {id_col} FROM {table}
        WHERE NOT ({eval_pred})
          AND {id_col} NOT IN (SELECT {id_col} FROM contaminated)
    """


# -- semantic (embedding-overlap) decontamination -----------------------------


def semantic_decontaminate(
    train_ds,
    eval_vecs: np.ndarray,
    eval_ids: np.ndarray,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    round_to: int | None = 2,
):
    """Embedding-space contamination report: training vectors whose cosine to
    ANY eval vector is ≥ ``threshold``, each with its closest eval witness —
    the fuzzy companion to the exact n-gram pass above, catching paraphrased
    benchmark leakage n-grams miss.

    The eval side is small by nature (a benchmark suite), so its normalized
    matrix ships ONCE via ``ray.put`` and the whole pass is map-only over the
    training corpus — one numpy matmul per batch, no shuffle, the 100 TB
    shape. Witness choice follows the shared (cosine rounded DESC, eval id
    ASC) total order, so the report is deterministic at any layout and
    oracle-checkable."""
    import pyarrow as pa
    import ray

    from .similarity import _normalize

    em = _normalize(np.asarray(eval_vecs, dtype=np.float64))
    ref = ray.put((np.asarray(eval_ids, dtype=np.int64), em))

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        e_ids, e_m = ray.get(ref)
        emb = _normalize(np.stack(batch["embedding"].to_numpy()).astype(np.float64))
        sims = emb @ e_m.T  # (B, E)
        if round_to is not None:
            sims = sims.round(round_to)
        # per train row: best (cosine desc, eval id asc) — ids are sorted
        # ascending, so the first argmax along the row IS the tiebreak winner
        order = np.argsort(e_ids, kind="stable")
        sims = sims[:, order]
        best = sims.argmax(axis=1)
        best_sim = sims[np.arange(len(sims)), best]
        keep = best_sim >= threshold
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy()[keep],
                "eval_id": e_ids[order][best[keep]],
                "cosine": best_sim[keep],
            }
        )

    return train_ds.map_batches(flag, batch_format="pandas")


def semantic_decontaminate_oracle_sql(
    table: str = "embeddings",
    test_permille: int = 100,
    salt: str = "split",
    threshold: float = 0.95,
    id_col: str = "vec_id",
) -> str:
    """DuckDB mirror of the driver entry: eval side = the md5-permille test
    split (``hash_split`` recipe), train side = the rest; per train vector the
    single best eval witness at rounded cosine ≥ threshold."""
    from .sampling import _permille_sql

    return f"""
        WITH split AS (
            SELECT *, {_permille_sql(id_col, salt)} < {test_permille} AS is_eval
            FROM {table}
        ), sims AS (
            SELECT t.{id_col}, e.{id_col} AS eval_id,
                   ROUND(CAST(list_cosine_similarity(t.embedding, e.embedding)
                         AS DOUBLE), 2) AS cosine
            FROM split t JOIN split e ON NOT t.is_eval AND e.is_eval
        )
        SELECT {id_col}, eval_id, cosine
        FROM sims
        QUALIFY row_number() OVER (
            PARTITION BY {id_col} ORDER BY cosine DESC, eval_id ASC
        ) = 1 AND cosine >= {threshold}
    """
