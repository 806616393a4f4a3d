"""Text analysis stages for large-scale training-data pipelines: token counting,
fingerprinting, language ID, quality scoring.

All are actor-pool ``map_batches`` stages: regexes/stopword tables are compiled
once per actor in ``__init__`` (SURVEY.md §2.3 pattern), kernels are vectorized
(pyarrow.compute / pandas C string ops) — no Python row loops.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\w+"  # RE2 \w (ASCII), identical semantics in pyarrow and DuckDB

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por"},
    "it": {"il", "lo", "gli", "e", "di", "che", "non", "per", "con", "sono"},
    "pt": {"o", "os", "as", "um", "uma", "não", "com", "para", "mais", "como"},
    "nl": {"de", "het", "een", "van", "en", "niet", "met", "voor", "naar", "zijn"},
    "sv": {"och", "att", "det", "som", "en", "på", "är", "för", "med", "inte"},
}

URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[\w.+-]+@[\w-]+\.[\w.]+"


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized token/char counts (pyarrow RE2 kernels, zero-copy in)."""
    text = batch.column(text_col)
    n_tokens = pc.count_substring_regex(text, TOKEN_RE)
    n_chars = pc.utf8_length(text)
    return batch.append_column(
        "n_tokens", n_tokens.cast(pa.int64())
    ).append_column("n_chars_calc", n_chars.cast(pa.int64()))


def fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprint: md5 of lowercased text (matches SQL md5(lower(x)));
    the deterministic-id recipe mirrors the reference's md5 surrogate keys
    (/root/reference/models/output/customer360__mapping.sql:107,205)."""
    low = pc.utf8_lower(batch.column(text_col)).to_pandas()
    fp = low.map(
        lambda s: hashlib.md5(s.encode("utf-8")).hexdigest() if s is not None else None
    )
    return batch.append_column("fp", pa.array(fp, pa.string()))


class TextQuality:
    """Actor-pool stage: language ID + quality scores per document.

    __init__ builds the per-language RE2 alternations once per actor; __call__
    is fully vectorized (pyarrow.compute count_substring_regex scans + numpy) —
    no per-row token lists.
    Outputs: lang_pred (argmax marker-hit rate, 'und' if no hits), stopword_ratio,
    mean_word_len, punct_ratio, quality_score in [0,1].
    """

    def __init__(self):
        self.langs = sorted(LANG_MARKERS)
        # one RE2 word-boundary alternation per language: \b(w1|w2|...)\b
        # counts exactly the \w+ tokens that are marker words (markers are
        # \w-only, so \b aligns with token boundaries)
        self.patterns = [
            r"\b(" + "|".join(sorted(LANG_MARKERS[lang])) + r")\b"
            for lang in self.langs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        low = pc.utf8_lower(text)
        n_tok = pc.count_substring_regex(text, TOKEN_RE).to_numpy(zero_copy_only=False)
        safe_n = np.maximum(n_tok, 1)

        hit_counts = np.stack(
            [
                pc.count_substring_regex(low, pat).to_numpy(zero_copy_only=False)
                for pat in self.patterns
            ],
            axis=1,
        )  # (n, n_langs)
        best = hit_counts.argmax(axis=1)
        any_hit = hit_counts.max(axis=1) > 0
        lang = np.where(any_hit, np.array(self.langs, dtype=object)[best], "und")
        stopword_ratio = hit_counts.max(axis=1) / safe_n

        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        # total word chars == count of \w characters
        word_chars = pc.count_substring_regex(text, r"\w").to_numpy(zero_copy_only=False)
        mean_word_len = word_chars / safe_n
        punct = pc.count_substring_regex(text, r"[^\w\s]").to_numpy(zero_copy_only=False)
        punct_ratio = punct / np.maximum(n_chars, 1)

        # simple composite: long-enough, word-like, not punctuation soup
        length_ok = np.clip(n_tok / 20.0, 0, 1)
        word_ok = np.clip(mean_word_len / 4.0, 0, 1)
        punct_ok = 1.0 - np.clip(punct_ratio * 4.0, 0, 1)
        quality = (length_ok + word_ok + punct_ok) / 3.0
        return (
            batch.append_column("lang_pred", pa.array(lang, pa.string()))
            .append_column("stopword_ratio", pa.array(stopword_ratio, pa.float64()))
            .append_column("mean_word_len", pa.array(mean_word_len, pa.float64()))
            .append_column("punct_ratio", pa.array(punct_ratio, pa.float64()))
            .append_column("quality_score", pa.array(quality, pa.float64()))
        )


ENRICH_SCHEMA = pa.schema(
    [
        ("n_tokens", pa.int64()),
        ("lang_pred", pa.string()),
        ("quality_score", pa.float64()),
    ]
)


class TranscriptEnricher:
    """Per-event transcript enrichment for the CDC ingest path: token counts,
    language ID, quality score on the ``text`` payload. Plugged into
    ``CdcLake.apply(enrich=...)`` so enrichment runs fused inside the
    shuffle-map task — the realistic compute profile of a training-data
    transcript pipeline (per-turn analysis during ingest).

    Fully vectorized: one RE2 alternation scan per language + token/punct
    scans (pyarrow compute kernels), no Python row loops."""

    def __init__(self):
        self.langs = sorted(LANG_MARKERS)
        self.patterns = [
            r"\b(" + "|".join(sorted(LANG_MARKERS[lang])) + r")\b"
            for lang in self.langs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch.column("text"), "")
        low = pc.utf8_lower(text)
        n_tokens = pc.count_substring_regex(text, TOKEN_RE).cast(pa.int64())
        hits = np.stack(
            [
                pc.count_substring_regex(low, pat).to_numpy(zero_copy_only=False)
                for pat in self.patterns
            ]
        )  # (n_langs, n)
        best = hits.argmax(axis=0)
        any_hit = hits.max(axis=0) > 0
        lang = np.where(any_hit, np.array(self.langs, dtype=object)[best], "und")
        n_tok = n_tokens.to_numpy(zero_copy_only=False)
        safe_n = np.maximum(n_tok, 1)
        punct = pc.count_substring_regex(text, r"[^\w\s]").to_numpy(zero_copy_only=False)
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        n_urls = pc.count_substring_regex(text, URL_RE).to_numpy(zero_copy_only=False)
        n_emails = pc.count_substring_regex(text, EMAIL_RE).to_numpy(zero_copy_only=False)
        n_digits = pc.count_substring_regex(text, r"\d").to_numpy(zero_copy_only=False)
        quality = (
            np.clip(n_tok / 20.0, 0, 1)
            + (1.0 - np.clip(punct / np.maximum(n_chars, 1) * 4.0, 0, 1))
            + np.clip(hits.max(axis=0) / safe_n * 10.0, 0, 1)
            + (1.0 - np.clip((n_urls + n_emails) / 3.0, 0, 1))
            + (1.0 - np.clip(n_digits / np.maximum(n_chars, 1) * 2.0, 0, 1))
        ) / 5.0
        return (
            batch.append_column("n_tokens", n_tokens)
            .append_column("lang_pred", pa.array(lang, pa.string()))
            .append_column("quality_score", pa.array(quality, pa.float64()))
        )


def analyze_text(ds, concurrency: int = 4, batch_size: int = 4096):
    """documents Dataset → + lang_pred/stopword_ratio/mean_word_len/punct_ratio/
    quality_score columns, via a TextQuality actor pool."""
    return ds.map_batches(
        TextQuality,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, concurrency),
    )


# PII patterns (RE2 syntax — the SAME engine evaluates them on both sides:
# pyarrow's replace_substring_regex here, DuckDB's regexp_replace in the
# oracle, so the redaction is oracle-checkable byte for byte)
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?\d[\d().\- ]{7,}\d"


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Training-data PII scrub: emails → <EMAIL>, then phone-shaped digit
    runs → <PHONE> (ordering matters — the email pass first so its digits
    can't half-match the phone pattern). Map-only, vectorized RE2; emits the
    redaction counts so a curation pipeline can threshold on PII density."""
    text = batch.column(text_col)
    n_emails = pc.count_substring_regex(text, PII_EMAIL_RE).cast(pa.int64())
    no_email = pc.replace_substring_regex(text, PII_EMAIL_RE, "<EMAIL>")
    n_phones = pc.count_substring_regex(no_email, PII_PHONE_RE).cast(pa.int64())
    redacted = pc.replace_substring_regex(no_email, PII_PHONE_RE, "<PHONE>")
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "text_redacted": redacted,
            "n_emails": n_emails,
            "n_phones": n_phones,
        }
    )


def chunk_tokens(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 16,
) -> pa.Table:
    """Token-budget chunking: each document's whitespace tokens split into
    consecutive ``chunk_size``-token chunks (final remainder kept) — the
    context-window packing primitive of a pretraining pipeline. Map-only and
    vectorized per chunk INDEX, not per row: the k-th chunk of every doc in
    the batch is one list_slice + binary_join kernel pass, so the Python loop
    runs ceil(max_tokens/chunk_size) times regardless of batch size."""
    toks = pc.split_pattern(batch.column(text_col), pattern=" ")
    nt = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    ids = batch.column(id_col)
    parts_id, parts_idx, parts_txt, parts_n = [], [], [], []
    max_chunks = int(np.ceil(nt.max() / chunk_size)) if len(nt) else 0
    for k in range(max_chunks):
        lo = k * chunk_size
        take = np.nonzero(nt > lo)[0]
        if not len(take):
            break
        idx = pa.array(take)
        sl = pc.list_slice(toks, lo, lo + chunk_size)
        parts_id.append(pc.take(ids, idx))
        parts_idx.append(pa.array(np.full(len(take), k, dtype=np.int64)))
        parts_txt.append(pc.take(pc.binary_join(sl, " "), idx))
        parts_n.append(pa.array(np.minimum(nt[take] - lo, chunk_size)))
    if not parts_id:
        return pa.table(
            {
                id_col: pa.array([], ids.type),
                "chunk_idx": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string()),
                "n_tokens": pa.array([], pa.int64()),
            }
        )
    concat = lambda parts: pa.concat_arrays(
        [p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts]
    )
    return pa.table(
        {
            id_col: concat(parts_id),
            "chunk_idx": concat(parts_idx),
            "chunk_text": concat(parts_txt),
            "n_tokens": concat(parts_n),
        }
    )


def chunk_tokens_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", chunk_size: int = 16
) -> str:
    """DuckDB mirror of ``chunk_tokens`` (same whitespace split, same
    remainder rule). Note string_split('', ' ') = [''] on both sides: an
    empty text yields one empty 1-token chunk, matching pyarrow."""
    c = chunk_size
    return f"""
        WITH tok AS (
            SELECT {id_col}, string_split({text_col}, ' ') AS w FROM {table}
        ), k AS (
            SELECT {id_col}, w,
                   unnest(generate_series(0, CAST(ceil(len(w) / {c}.0) AS BIGINT) - 1)) AS chunk_idx
            FROM tok
        )
        SELECT {id_col}, chunk_idx,
               array_to_string(w[chunk_idx * {c} + 1 : least((chunk_idx + 1) * {c}, len(w))], ' ') AS chunk_text,
               least((chunk_idx + 1) * {c}, len(w)) - chunk_idx * {c} AS n_tokens
        FROM k
    """


def _term_tf(batch: pa.Table, id_col: str, text_col: str) -> pd.DataFrame:
    """(doc, term, tf) rows for one batch — vectorized: one split_pattern,
    one flatten + repeat, one pandas groupby."""
    toks = pc.split_pattern(batch.column(text_col), pattern=" ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    flat = toks.combine_chunks().flatten() if isinstance(toks, pa.ChunkedArray) else toks.flatten()
    df = pd.DataFrame(
        {
            "doc": np.repeat(ids, lens),
            "term": flat.to_pandas().to_numpy(dtype=object),
        }
    )
    return df.groupby(["doc", "term"], sort=False).size().rename("tf").reset_index()


def top_terms(ds, id_col: str = "doc_id", text_col: str = "text", k: int = 3):
    """Per-document distinctive terms: the top-k terms by (tf DESC, global
    document-frequency ASC, term ASC) — an integer-ranked tf-idf stand-in
    whose ordering is exactly reproducible in SQL (no float idf to diverge).

    Two map-only passes, no shuffle: pass 1 emits per-batch partial document
    frequencies (each doc lives in exactly one batch, so partials sum to the
    exact global df — the same combiner argument as the metric rollups);
    the driver combines the vocabulary-sized partials and broadcasts the df
    table; pass 2 recomputes each batch's tf and ranks locally. Driver/
    broadcast memory is O(vocabulary), not O(corpus) — fine for natural-
    language vocabularies; a bucketed groupby swap-in applies above that."""
    import ray

    def df_partial(batch: pa.Table) -> pd.DataFrame:
        tf = _term_tf(batch, id_col, text_col)
        return tf.groupby("term", sort=False).size().rename("n").reset_index()

    from ..blocks import sum_kernel, tree_reduce

    # task-tree merge: driver sees ONE vocabulary-sized table, independent
    # of batch count (per-batch-partials collection scale-bug class)
    partials = tree_reduce(
        ds.map_batches(df_partial, batch_format="pyarrow"),
        sum_kernel(["term"], ["n"]),
    ).to_pandas()
    df_map = dict(zip(partials["term"], partials["n"]))
    df_ref = ray.put(df_map)

    def rank(batch: pa.Table) -> pd.DataFrame:
        dfm = ray.get(df_ref)
        tf = _term_tf(batch, id_col, text_col)
        tf["df"] = tf["term"].map(dfm).astype(np.int64)
        tf = tf.sort_values(
            ["doc", "tf", "df", "term"],
            ascending=[True, False, True, True],
            kind="stable",
        )
        out = tf.groupby("doc", sort=False).head(k)
        out = out.rename(columns={"doc": id_col})
        out["tf"] = out["tf"].astype(np.int64)
        return out[[id_col, "term", "tf", "df"]]

    return ds.map_batches(rank, batch_format="pyarrow")


def top_terms_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", k: int = 3
) -> str:
    """DuckDB mirror of ``top_terms`` (same split, same integer rank order)."""
    return f"""
        WITH tok AS (
            SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS term
            FROM {table}
        ), tf AS (
            SELECT {id_col}, term, count(*) AS tf FROM tok GROUP BY 1, 2
        ), df AS (
            SELECT term, count(DISTINCT {id_col}) AS df FROM tok GROUP BY 1
        )
        SELECT {id_col}, term, tf, df FROM (
            SELECT tf.{id_col}, tf.term, tf.tf, df.df,
                   row_number() OVER (
                       PARTITION BY tf.{id_col}
                       ORDER BY tf.tf DESC, df.df ASC, tf.term ASC
                   ) AS rn
            FROM tf JOIN df USING (term)
        ) WHERE rn <= {k}
    """


def cluster_top_terms(
    docs,
    assign,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Cluster labeling: the top-``k`` terms per k-means cluster by
    (tf DESC, term ASC) — the human-readable name a topic-clustered corpus
    browser puts on each cluster (the standard summarization step after
    SemDeDup/ANN-style clustering; cf. Abbas et al. 2023 §4's cluster
    inspection). ``assign`` is a (vec_id, cluster) Dataset from
    ``similarity.kmeans_assign``; cluster ids join documents by id.

    Shape: one bucketed hash join (docs ⋈ assignment on id — the assignment
    side is O(N) rows × 16 bytes, far too big to broadcast at corpus scale),
    one map-only pass emitting per-batch (cluster, term) partial counts, then
    ONE bucket task exchange keyed by cluster — each bucket task folds its
    clusters' partials and ranks them in the same pass (the two Dataset
    groupby ops this replaces paid ~2 s of aggregator fixed cost against
    vocab×K-bounded tables). Integer rank order (no float tf-idf), so the
    labels are bit-exact in SQL."""
    import ray
    import ray.data

    from .joins import bucketed_hash_join

    joined = bucketed_hash_join(
        docs.select_columns([id_col, text_col]),
        assign,
        on=id_col,
        right_on="vec_id",
    )

    def partial(batch: pa.Table) -> pd.DataFrame:
        tf = _term_tf(batch, "cluster", text_col)
        g = tf.groupby(["doc", "term"], sort=False)["tf"].sum().reset_index()
        return g.rename(columns={"doc": "cluster", "tf": "n"})

    partials = joined.map_batches(partial, batch_format="pyarrow").materialize()
    B = 8

    def _split(t: pa.Table) -> list:
        b = (
            t.column("cluster").to_numpy(zero_copy_only=False).astype(np.int64)
            % B
        )
        order = np.argsort(b, kind="stable")
        tt, sb = t.take(pa.array(order)), b[order]
        cuts = np.searchsorted(sb, np.arange(B + 1))
        return [tt.slice(cuts[i], cuts[i + 1] - cuts[i]) for i in range(B)]

    def _fold_rank(*parts) -> pa.Table:
        df = pa.concat_tables(parts).to_pandas()
        if not len(df):
            return pa.table(
                {
                    "cluster": pa.array([], pa.int64()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        tf = df.groupby(["cluster", "term"], sort=False, as_index=False)["n"].sum()
        tf = tf.sort_values(
            ["cluster", "n", "term"], ascending=[True, False, True], kind="stable"
        )
        out = tf.groupby("cluster", sort=False).head(k).copy()
        out["rank"] = out.groupby("cluster", sort=False).cumcount() + 1
        return pa.table(
            {
                "cluster": pa.array(out["cluster"].to_numpy(np.int64)),
                "term": pa.array(out["term"].to_numpy(dtype=object), pa.string()),
                "tf": pa.array(out["n"].to_numpy(np.int64)),
                "rank": pa.array(out["rank"].to_numpy(np.int64)),
            }
        )

    split = ray.remote(num_returns=B)(_split)
    fold = ray.remote(_fold_rank)
    cols = [split.remote(r) for r in partials.to_arrow_refs()]
    return ray.data.from_arrow_refs(
        [fold.remote(*[c[b] for c in cols]) for b in range(B)]
    )


def cluster_top_terms_oracle_sql(
    assign_sql: str,
    k: int = 5,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of ``cluster_top_terms``: ``assign_sql`` is the full
    assignment SELECT (``kmeans_assign_oracle_sql`` with the same centroids
    inlined), wrapped as a CTE; same split, same (tf DESC, term ASC) order."""
    return f"""
        WITH assign AS ({assign_sql}), tok AS (
            SELECT a.cluster, unnest(string_split(d.{text_col}, ' ')) AS term
            FROM {table} d JOIN assign a ON a.vec_id = d.{id_col}
        ), tf AS (
            SELECT cluster, term, CAST(count(*) AS BIGINT) AS tf
            FROM tok GROUP BY 1, 2
        )
        SELECT cluster, term, tf,
               CAST(row_number() OVER (
                   PARTITION BY cluster ORDER BY tf DESC, term ASC
               ) AS BIGINT) AS rank
        FROM tf
        QUALIFY rank <= {k}
    """


def repetition_stats(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_word_frac: float = 0.2,
    max_dup_word_frac: float = 0.3,
):
    """Gopher-style repetition quality stats, map-only (each document lives in
    exactly one batch, so per-doc aggregates are exact with NO shuffle):
    ``top_word_frac`` = most frequent term's share, ``dup_word_frac`` = share
    of tokens that are repeats of an earlier-seen term, plus a ``keep`` flag
    under the given thresholds (Rae et al. 2021's repetition filters, §A1.1,
    applied at word granularity — this corpus has no newlines to line-filter)."""
    import functools

    return ds.map_batches(
        functools.partial(
            repetition_batch,
            id_col=id_col,
            text_col=text_col,
            max_top_word_frac=max_top_word_frac,
            max_dup_word_frac=max_dup_word_frac,
        ),
        batch_format="pyarrow",
    )


def repetition_batch(
    batch: pa.Table,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_word_frac: float = 0.2,
    max_dup_word_frac: float = 0.3,
) -> pa.Table:
    """Per-batch kernel of ``repetition_stats`` (module-level so composed
    pipelines — ``pipelines/curate.fineweb_audit`` — can fuse it with other
    map-only signals in one pass)."""
    tf = _term_tf(batch, id_col, text_col)
    g = tf.groupby("doc", sort=False)["tf"]
    per = pd.DataFrame({"n_words": g.sum(), "n_distinct": g.size(), "top_c": g.max()})
    # _term_tf drops nothing, so every input doc appears; align to batch order
    per = per.loc[batch.column(id_col).to_numpy(zero_copy_only=False)]
    n = per["n_words"].to_numpy(dtype=np.float64)
    top_frac = per["top_c"].to_numpy(dtype=np.float64) / n
    dup_frac = 1.0 - per["n_distinct"].to_numpy(dtype=np.float64) / n
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_words": pa.array(per["n_words"].to_numpy(np.int64)),
            "n_distinct": pa.array(per["n_distinct"].to_numpy(np.int64)),
            "top_word_frac": pa.array(top_frac),
            "dup_word_frac": pa.array(dup_frac),
            "keep": pa.array(
                (top_frac <= max_top_word_frac) & (dup_frac <= max_dup_word_frac)
            ),
        }
    )


def repetition_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_top_word_frac: float = 0.2,
    max_dup_word_frac: float = 0.3,
) -> str:
    """DuckDB mirror of ``repetition_stats`` (same split, same double math)."""
    return f"""
        WITH tok AS (
            SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS term
            FROM {table}
        ), tf AS (
            SELECT {id_col}, term, count(*) AS c FROM tok GROUP BY 1, 2
        ), agg AS (
            SELECT {id_col}, sum(c) AS n_words, count(*) AS n_distinct,
                   max(c) AS top_c
            FROM tf GROUP BY 1
        )
        SELECT {id_col},
               CAST(n_words AS BIGINT) AS n_words,
               CAST(n_distinct AS BIGINT) AS n_distinct,
               top_c / CAST(n_words AS DOUBLE) AS top_word_frac,
               1.0 - n_distinct / CAST(n_words AS DOUBLE) AS dup_word_frac,
               (top_c / CAST(n_words AS DOUBLE) <= {max_top_word_frac}
                AND 1.0 - n_distinct / CAST(n_words AS DOUBLE) <= {max_dup_word_frac})
                   AS keep
        FROM agg
    """


def build_vocab(ds, text_col: str = "text", max_size: int = 100_000) -> pd.DataFrame:
    """Corpus vocabulary: terms ranked by (count DESC, term ASC), token ids
    1..max_size (0 is reserved for OOV). One map-only partial-count pass (the
    same combiner argument as ``top_terms``: per-batch counts sum exactly),
    then a vocabulary-sized driver combine — O(distinct terms), NOT O(corpus);
    a bucketed groupby swap-in applies for web-scale vocabularies.

    Returns a pandas DataFrame (token_id:int32, term, n:int64) — a model-side
    artifact that is broadcast, never joined."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        toks = pc.split_pattern(batch.column(text_col), pattern=" ")
        flat = (
            toks.combine_chunks().flatten()
            if isinstance(toks, pa.ChunkedArray)
            else toks.flatten()
        )
        vc = pd.Series(flat.to_pandas().to_numpy(dtype=object)).value_counts()
        return pd.DataFrame({"term": vc.index, "n": vc.to_numpy(np.int64)})

    from ..blocks import sum_kernel, tree_reduce

    counts = tree_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        sum_kernel(["term"], ["n"]),
    ).to_pandas()
    counts = counts.sort_values(
        ["n", "term"], ascending=[False, True], kind="stable"
    ).head(max_size)
    counts.insert(0, "token_id", np.arange(1, len(counts) + 1, dtype=np.int32))
    return counts.reset_index(drop=True)


def vocab_oracle_sql(table: str, text_col: str = "text", max_size: int = 100_000) -> str:
    """DuckDB mirror of ``build_vocab``."""
    return f"""
        WITH tok AS (
            SELECT unnest(string_split({text_col}, ' ')) AS term FROM {table}
        ), counts AS (
            SELECT term, count(*) AS n FROM tok GROUP BY 1
        )
        SELECT CAST(row_number() OVER (ORDER BY n DESC, term ASC) AS INTEGER)
                   AS token_id,
               term, n
        FROM counts
        QUALIFY row_number() OVER (ORDER BY n DESC, term ASC) <= {max_size}
    """


def encode_documents(ds, vocab: pd.DataFrame, id_col: str = "doc_id", text_col: str = "text"):
    """Token-ID encoding against a built vocabulary: each document's token
    sequence mapped to int32 ids (OOV → 0), order-preserving, as a
    ``list<int32>`` column. The vocab dict ships ONCE via ``ray.put`` and maps
    inside each batch (broadcast lookup, no join shuffle — the id space is a
    model artifact, always small next to the corpus)."""
    import ray

    vocab_ref = ray.put(dict(zip(vocab["term"], vocab["token_id"].astype(np.int32))))

    def encode(batch: pa.Table) -> pa.Table:
        vmap = ray.get(vocab_ref)
        toks = pc.split_pattern(batch.column(text_col), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pd.Series(toks.flatten().to_pandas().to_numpy(dtype=object))
        ids = flat.map(vmap).fillna(0).to_numpy(np.int32)
        offsets = np.zeros(len(batch) + 1, dtype=np.int32)
        np.cumsum(lens, out=offsets[1:])
        return pa.table(
            {
                id_col: batch.column(id_col),
                "ids": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), pa.array(ids, pa.int32())
                ),
                "n_tokens": pa.array(lens.astype(np.int64)),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def encode_oracle_sql(table: str, id_col: str = "doc_id", text_col: str = "text", max_size: int = 100_000) -> str:
    """DuckDB mirror of ``encode_documents`` over the same corpus-built vocab
    (parallel unnests zip in DuckDB, giving token order for the list agg)."""
    return f"""
        WITH tok AS (
            SELECT {id_col},
                   unnest(string_split({text_col}, ' ')) AS term,
                   unnest(range(1, len(string_split({text_col}, ' ')) + 1)) AS ord
            FROM {table}
        ), counts AS (
            SELECT term, count(*) AS n FROM tok GROUP BY 1
        ), vocab AS (
            SELECT term,
                   CAST(row_number() OVER (ORDER BY n DESC, term ASC) AS INTEGER)
                       AS token_id
            FROM counts
            QUALIFY row_number() OVER (ORDER BY n DESC, term ASC) <= {max_size}
        )
        SELECT t.{id_col},
               list(CAST(coalesce(v.token_id, 0) AS INTEGER) ORDER BY t.ord)
                   AS ids,
               CAST(count(*) AS BIGINT) AS n_tokens
        FROM tok t LEFT JOIN vocab v USING (term)
        GROUP BY t.{id_col}
    """


def encode_documents_flat(ds, vocab: pd.DataFrame, id_col: str = "doc_id", text_col: str = "text"):
    """``encode_documents`` in exploded form — one (doc, ord, token_id) row per
    token position (1-based). Same broadcast-dict mapping; this is the
    hash-comparable shape (list columns don't sort), the list form is the
    training-sink shape."""
    import ray

    vocab_ref = ray.put(dict(zip(vocab["term"], vocab["token_id"].astype(np.int32))))

    def encode(batch: pa.Table) -> pa.Table:
        vmap = ray.get(vocab_ref)
        toks = pc.split_pattern(batch.column(text_col), pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pd.Series(toks.flatten().to_pandas().to_numpy(dtype=object))
        ids = flat.map(vmap).fillna(0).to_numpy(np.int32)
        ord_ = np.concatenate([np.arange(1, n + 1, dtype=np.int64) for n in lens]) \
            if len(lens) else np.array([], np.int64)
        doc = np.repeat(batch.column(id_col).to_numpy(zero_copy_only=False), lens)
        return pa.table(
            {
                id_col: pa.array(doc),
                "ord": pa.array(ord_),
                "token_id": pa.array(ids),
            }
        )

    return ds.map_batches(encode, batch_format="pyarrow")


def encode_flat_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", max_size: int = 100_000
) -> str:
    """DuckDB mirror of ``encode_documents_flat``."""
    return f"""
        WITH tok AS (
            SELECT {id_col},
                   unnest(string_split({text_col}, ' ')) AS term,
                   unnest(range(1, len(string_split({text_col}, ' ')) + 1)) AS ord
            FROM {table}
        ), counts AS (
            SELECT term, count(*) AS n FROM tok GROUP BY 1
        ), vocab AS (
            SELECT term,
                   CAST(row_number() OVER (ORDER BY n DESC, term ASC) AS INTEGER)
                       AS token_id
            FROM counts
            QUALIFY row_number() OVER (ORDER BY n DESC, term ASC) <= {max_size}
        )
        SELECT t.{id_col}, CAST(t.ord AS BIGINT) AS ord,
               CAST(coalesce(v.token_id, 0) AS INTEGER) AS token_id
        FROM tok t LEFT JOIN vocab v USING (term)
    """


def inverted_index(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 64,
    num_buckets: int = 64,
):
    """Distributed inverted-index build: ``(term, df, postings)`` where ``df``
    is the exact document frequency and ``postings`` is the first
    ``max_postings`` doc ids ascending, comma-joined (pinned order, the
    string_agg convention of the reference's source_ids arrays).

    Shape: one map-only pass emits per-batch partials — each term's partial df
    and its per-batch first-``max_postings`` sorted ids (each doc lives in
    exactly one batch, so partial dfs sum exactly and the global first-k is a
    merge of per-batch first-k) — then ONE vocabulary-sized shuffle: partials
    are grouped by term-hash bucket (``num_buckets`` groups, not |vocab| tiny
    groups — map_groups runs once per group) and merged vectorized. Shuffle
    volume is O(vocab × batches × k), never O(corpus tokens)."""
    import hashlib

    def partial(batch: pa.Table) -> pd.DataFrame:
        tf = _term_tf(batch, id_col, text_col)
        tf = tf.sort_values(["term", "doc"], kind="stable")
        g = tf.groupby("term", sort=False)
        head = tf[g.cumcount() < max_postings]
        ids = head.groupby("term", sort=False)["doc"].agg(
            lambda s: ",".join(map(str, s))
        )
        out = pd.DataFrame({"n": g.size(), "ids": ids}).reset_index()
        out["bucket"] = (
            out["term"]
            .map(lambda t: int(hashlib.md5(t.encode()).hexdigest()[:8], 16))
            .astype(np.int64)
            % num_buckets
        )
        return out

    def merge(grp: pd.DataFrame) -> pd.DataFrame:
        ex = grp.assign(ids=grp["ids"].str.split(",")).explode("ids")
        ex["doc"] = ex["ids"].astype(np.int64)
        ex = ex.sort_values(["term", "doc"], kind="stable")
        keep = ex[ex.groupby("term", sort=False).cumcount() < max_postings]
        postings = keep.groupby("term", sort=False)["doc"].agg(
            lambda s: ",".join(map(str, s))
        )
        df = grp.groupby("term", sort=False)["n"].sum()
        out = pd.DataFrame({"df": df, "postings": postings}).reset_index()
        out["df"] = out["df"].astype(np.int64)
        return out[["term", "df", "postings"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


def inverted_index_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", max_postings: int = 64
) -> str:
    """DuckDB mirror of ``inverted_index`` (same split, same pinned order)."""
    return f"""
        WITH tok AS (
            SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS term
            FROM {table}
        ), td AS (
            SELECT DISTINCT term, {id_col} AS doc FROM tok
        )
        SELECT term, CAST(count(*) AS BIGINT) AS df,
               array_to_string(list_sort(list(doc))[1:{max_postings}], ',')
                   AS postings
        FROM td GROUP BY term
    """


def _doc_ngrams(batch: pa.Table, id_col: str, text_col: str, k: int):
    """Vectorized within-document k-gram positions for one batch: returns
    (doc_ids_per_gram, [token_array_0..k-1]) — slot j holds the j-th token of
    every k-gram (np fancy-indexing over the flattened token array, no row
    loop). Documents shorter than k contribute nothing."""
    toks = pc.split_pattern(batch.column(text_col), pattern=" ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = (
        toks.combine_chunks().flatten()
        if isinstance(toks, pa.ChunkedArray)
        else toks.flatten()
    ).to_pandas().to_numpy(dtype=object)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(lens) else np.array([], np.int64)
    n_grams = np.maximum(lens - (k - 1), 0)
    base = np.repeat(starts, n_grams) + _intra_offsets(n_grams)
    ids = np.repeat(batch.column(id_col).to_numpy(zero_copy_only=False), n_grams)
    return ids, [flat[base + j] for j in range(k)]


def _intra_offsets(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] without a Python loop (zero counts fine)."""
    total = int(counts.sum())
    if total == 0:
        return np.array([], np.int64)
    gs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    return np.arange(total, dtype=np.int64) - np.repeat(gs, counts)


def bigram_lift(ds, id_col: str = "doc_id", text_col: str = "text", top_k: int = 200):
    """Corpus collocations: the ``top_k`` within-document bigrams by
    (count DESC, w1, w2) with their pointwise-lift
    ``p(x,y) / (p(x)·p(y))`` — the exp of PMI, computed division-only so the
    float64 values are IEEE-identical to the SQL oracle (a log would diverge
    across libms).

    Shape: one map-only pass emits per-batch partial bigram counts; a
    distributed (w1, w2) groupby sums them (vocab²-bounded, tiny next to the
    corpus); unigram counts ride the ``build_vocab`` partial-combine and are
    broadcast; lift is computed per batch and the top-k selected by one
    bounded sort+limit."""
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pd.DataFrame:
        _, (w1, w2) = _doc_ngrams(batch, id_col, text_col, 2)
        g = (
            pd.DataFrame({"w1": w1, "w2": w2})
            .groupby(["w1", "w2"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )
        return g

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n", alias_name="c_xy"))
    )
    uni = build_vocab(ds, text_col=text_col, max_size=1 << 62)
    n_uni = int(uni["n"].sum())
    uni_ref = ray.put(dict(zip(uni["term"], uni["n"].astype(np.int64))))
    n_big_ds = int(counts.sum("c_xy") or 0)

    def with_lift(batch: pd.DataFrame) -> pd.DataFrame:
        uc = ray.get(uni_ref)
        c_xy = batch["c_xy"].to_numpy(np.float64)
        c1 = batch["w1"].map(uc).to_numpy(np.float64)
        c2 = batch["w2"].map(uc).to_numpy(np.float64)
        lift = (c_xy / n_big_ds) * (n_uni / c1) * (n_uni / c2)
        out = batch[["w1", "w2"]].copy()
        out["c_xy"] = batch["c_xy"].astype(np.int64)
        out["lift"] = lift
        return out

    return (
        counts.map_batches(with_lift, batch_format="pandas")
        .sort(["c_xy", "w1", "w2"], descending=[True, False, False])
        .limit(top_k)
    )


def bigram_lift_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", top_k: int = 200
) -> str:
    """DuckDB mirror of ``bigram_lift`` (same split, same division-only float
    pipeline in the same order)."""
    return f"""
        WITH l AS (
            SELECT {id_col}, string_split({text_col}, ' ') AS l FROM {table}
        ), big AS (
            SELECT l[i] AS w1, l[i + 1] AS w2
            FROM l, UNNEST(range(1, len(l))) AS t(i)
        ), uni AS (
            SELECT unnest(string_split({text_col}, ' ')) AS term FROM {table}
        ), uc AS (
            SELECT term, count(*) AS c FROM uni GROUP BY 1
        ), bc AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy FROM big GROUP BY 1, 2
        )
        SELECT w1, w2, c_xy,
               (CAST(c_xy AS DOUBLE) / (SELECT count(*) FROM big))
                   * (CAST((SELECT count(*) FROM uni) AS DOUBLE) / u1.c)
                   * (CAST((SELECT count(*) FROM uni) AS DOUBLE) / u2.c) AS lift
        FROM bc
        JOIN uc u1 ON u1.term = w1
        JOIN uc u2 ON u2.term = w2
        QUALIFY row_number() OVER (ORDER BY c_xy DESC, w1, w2) <= {top_k}
        ORDER BY c_xy DESC, w1, w2
    """


def kgram_dup_stats(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    broadcast_threshold: int = 2_000_000,
):
    """Cross-document duplicated-substring share, the token-k-gram form of
    Lee et al. 2022's exact substring dedup signal: for each document, the
    fraction of its k-gram positions whose k-gram also appears in at least
    one OTHER document. High ``dup_frac`` marks boilerplate/templated docs.

    Shape: pass 1 emits per-batch (k-gram → distinct-doc count) partials
    (docs live in one batch each, so partials sum to the exact df); a
    distributed groupby keeps only df ≥ 2 grams — the DUPLICATED set, tiny
    next to the k-gram universe for natural corpora — which is broadcast via
    ``ray.put``; pass 2 re-derives each batch's k-grams and counts membership
    vectorized. Raises if the dup set exceeds ``broadcast_threshold`` —
    the decontaminate-style bucketed-join fallback is the swap-in there."""
    import ray
    from ray.data.aggregate import Sum

    SEP = "\x1f"

    def join_grams(batch: pa.Table):
        ids, slots = _doc_ngrams(batch, id_col, text_col, k)
        if not len(ids):
            return ids, np.array([], object)
        g = slots[0].astype(object)
        for s in slots[1:]:
            g = g + SEP
            g = g + s.astype(object)
        return ids, g

    def df_partial(batch: pa.Table) -> pd.DataFrame:
        ids, grams = join_grams(batch)
        u = pd.DataFrame({"g": grams, "doc": ids}).drop_duplicates()
        out = u.groupby("g", sort=False).size().rename("nd").reset_index()
        return out

    dup = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("nd", alias_name="nd"))
        .filter(expr="nd >= 2")
    )
    dup_grams = dup.select_columns(["g"]).to_pandas()
    if len(dup_grams) > broadcast_threshold:
        raise NotImplementedError(
            "duplicated k-gram set exceeds the broadcast budget; use the "
            "bucketed-join fallback (stages/decontaminate.py pattern)"
        )
    dup_ref = ray.put(set(dup_grams["g"]))

    def per_doc(batch: pa.Table) -> pa.Table:
        dset = ray.get(dup_ref)
        ids, grams = join_grams(batch)
        doc_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        frame = pd.DataFrame({"doc": ids})
        frame["dup"] = pd.Series(grams, dtype=object).isin(dset).to_numpy()
        g = frame.groupby("doc", sort=False)["dup"]
        per = pd.DataFrame({"n_kgrams": g.size(), "n_dup": g.sum()})
        per = per.reindex(doc_ids, fill_value=0)
        n = per["n_kgrams"].to_numpy(np.float64)
        nd = per["n_dup"].to_numpy(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            frac = np.where(n == 0, 0.0, nd / np.maximum(n, 1.0))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_kgrams": pa.array(per["n_kgrams"].to_numpy(np.int64)),
                "n_dup": pa.array(per["n_dup"].to_numpy(np.int64)),
                "dup_frac": pa.array(frac, pa.float64()),
            }
        )

    return ds.map_batches(per_doc, batch_format="pyarrow")


def kgram_dup_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text", k: int = 5
) -> str:
    """DuckDB mirror of ``kgram_dup_stats`` (same split; the SQL k-gram join
    key is the space-joined window, identical token sequence)."""
    return f"""
        WITH l AS (
            SELECT {id_col}, string_split({text_col}, ' ') AS l FROM {table}
        ), kg AS (
            SELECT {id_col}, array_to_string(l[i:i + {k - 1}], chr(31)) AS g
            FROM l, UNNEST(range(1, len(l) - {k - 2})) AS t(i)
        ), df AS (
            SELECT g, count(DISTINCT {id_col}) AS nd FROM kg GROUP BY 1
        ), per AS (
            SELECT kg.{id_col}, count(*) AS n_kgrams,
                   count(*) FILTER (WHERE df.nd >= 2) AS n_dup
            FROM kg JOIN df USING (g) GROUP BY 1
        )
        SELECT d.{id_col},
               CAST(coalesce(per.n_kgrams, 0) AS BIGINT) AS n_kgrams,
               CAST(coalesce(per.n_dup, 0) AS BIGINT) AS n_dup,
               CASE WHEN coalesce(per.n_kgrams, 0) = 0 THEN 0.0
                    ELSE CAST(per.n_dup AS DOUBLE) / per.n_kgrams END AS dup_frac
        FROM {table} d LEFT JOIN per USING ({id_col})
    """


# -- Gopher quality rules ------------------------------------------------------

GOPHER_STOPWORD_RE = r"\b(the|and|of|to|in|is|that|it|for|with)\b"
GOPHER_SYMBOL_RE = r"[#…]"
GOPHER_ALPHA_WORD_RE = r"\w*[A-Za-z]\w*"


def gopher_rules(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Gopher-style document quality rules (Rae et al. 2021 §A1.1), the
    word-level subset, as one vectorized RE2 pass per signal. All thresholds
    are cross-multiplied INTEGER comparisons (no float ratios), so the DuckDB
    oracle reproduces every boolean bit-exactly:

      - 50 ≤ word count ≤ 100 000
      - mean word length in [3, 10]   (3·n_words ≤ word_chars ≤ 10·n_words)
      - symbol-to-word ratio < 0.1    (10·n_symbols ≤ n_words; '#' and '…')
      - ≥80% of words contain a letter (10·n_alpha_words ≥ 8·n_words)
      - ≥2 stopword hits
    """
    text = batch.column(text_col)
    n_words = pc.count_substring_regex(text, TOKEN_RE)
    word_chars = pc.utf8_length(pc.replace_substring_regex(text, r"\W", ""))
    n_symbols = pc.count_substring_regex(text, GOPHER_SYMBOL_RE)
    n_alpha = pc.count_substring_regex(text, GOPHER_ALPHA_WORD_RE)
    n_stop = pc.count_substring_regex(text, GOPHER_STOPWORD_RE)
    n_words64 = pc.cast(n_words, pa.int64())
    wc64 = pc.cast(word_chars, pa.int64())
    ok_count = pc.and_(
        pc.greater_equal(n_words64, 50), pc.less_equal(n_words64, 100_000)
    )
    ok_len = pc.and_(
        pc.greater_equal(wc64, pc.multiply(n_words64, 3)),
        pc.less_equal(wc64, pc.multiply(n_words64, 10)),
    )
    ok_sym = pc.less_equal(
        pc.multiply(pc.cast(n_symbols, pa.int64()), 10), n_words64
    )
    ok_alpha = pc.greater_equal(
        pc.multiply(pc.cast(n_alpha, pa.int64()), 10), pc.multiply(n_words64, 8)
    )
    ok_stop = pc.greater_equal(pc.cast(n_stop, pa.int64()), 2)
    passes = ok_count
    for m in (ok_len, ok_sym, ok_alpha, ok_stop):
        passes = pc.and_(passes, m)
    return pa.table(
        {
            id_col: batch.column(id_col),
            "n_words": n_words64,
            "word_chars": wc64,
            "n_symbols": pc.cast(n_symbols, pa.int64()),
            "n_alpha_words": pc.cast(n_alpha, pa.int64()),
            "n_stopwords": pc.cast(n_stop, pa.int64()),
            "ok_word_count": ok_count,
            "ok_word_len": ok_len,
            "ok_symbols": ok_sym,
            "ok_alpha": ok_alpha,
            "ok_stopwords": ok_stop,
            "gopher_pass": passes,
        }
    )


def gopher_oracle_sql(table: str, id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB mirror of ``gopher_rules`` (same RE2 patterns, same integer
    threshold algebra)."""
    return f"""
        WITH sig AS (
            SELECT {id_col},
                   CAST(len(regexp_extract_all({text_col}, '{TOKEN_RE}')) AS BIGINT) AS n_words,
                   CAST(length(regexp_replace({text_col}, '\\W', '', 'g')) AS BIGINT) AS word_chars,
                   CAST(len(regexp_extract_all({text_col}, '{GOPHER_SYMBOL_RE}')) AS BIGINT) AS n_symbols,
                   CAST(len(regexp_extract_all({text_col}, '{GOPHER_ALPHA_WORD_RE}')) AS BIGINT) AS n_alpha_words,
                   CAST(len(regexp_extract_all({text_col}, '{GOPHER_STOPWORD_RE}')) AS BIGINT) AS n_stopwords
            FROM {table}
        )
        SELECT {id_col}, n_words, word_chars, n_symbols, n_alpha_words, n_stopwords,
               (n_words BETWEEN 50 AND 100000) AS ok_word_count,
               (word_chars BETWEEN 3 * n_words AND 10 * n_words) AS ok_word_len,
               (10 * n_symbols <= n_words) AS ok_symbols,
               (10 * n_alpha_words >= 8 * n_words) AS ok_alpha,
               (n_stopwords >= 2) AS ok_stopwords,
               ((n_words BETWEEN 50 AND 100000)
                AND (word_chars BETWEEN 3 * n_words AND 10 * n_words)
                AND (10 * n_symbols <= n_words)
                AND (10 * n_alpha_words >= 8 * n_words)
                AND (n_stopwords >= 2)) AS gopher_pass
        FROM sig
    """


def lm_fluency(
    ds, id_col: str = "doc_id", text_col: str = "text", carry_cols: tuple = ()
):
    """CCNet-style LM quality scoring (Wenzek et al. 2019 filter corpora by
    LM perplexity), recast all-integer so the score is bit-exact at any
    cluster size AND in SQL: per document, the mean conditional bigram
    frequency in permille —

        score = ( Σ_bigrams (1000·c(w1,w2)) // c(w1) ) // n_bigrams

    where the counts are corpus-wide. A true perplexity needs a log whose
    ulps diverge across libms (same reason ``bigram_lift`` ships exp-PMI);
    integer division in a fixed permille grid removes every float from the
    pipeline. Two corpus passes build the count maps (bigram partial-count
    groupby — vocab²-bounded — and ``build_vocab``'s unigram combine), both
    broadcast once via ``ray.put`` (O(distinct grams); above ~256 MB swap in
    the bucketed-join fallback documented at ``ngram_jaccard_pairs``); the
    scoring pass is map-only. Documents with < 2 tokens have no bigrams and
    are dropped (the SQL INNER JOIN + GROUP BY shape). ``carry_cols`` ride
    the map-only scoring pass onto the output (batch-local reindex, zero
    shuffle) — a downstream per-language cut then needs NO join back to the
    source."""
    import ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pd.DataFrame:
        _, (w1, w2) = _doc_ngrams(batch, id_col, text_col, 2)
        return (
            pd.DataFrame({"w1": w1, "w2": w2})
            .groupby(["w1", "w2"], sort=False)
            .size()
            .rename("n")
            .reset_index()
        )

    uni = build_vocab(ds, text_col=text_col, max_size=1 << 62)
    uni_ref = ray.put(dict(zip(uni["term"], uni["n"].astype(np.int64))))
    partials = ds.map_batches(partial, batch_format="pyarrow")
    if len(uni) ** 2 <= 1_000_000:
        # bounded bigram cardinality (vocab² rows max per partial) → fold the
        # per-batch partials in a TASK TREE instead of paying the
        # sort-shuffle groupby (~12s → ~1s on the sf0.1 battery); vs the
        # earlier repartition(1) single-task fold, no one worker ever holds
        # all O(#batches × vocab²) partial rows at once
        from ..blocks import sum_kernel, tree_reduce

        bdf = tree_reduce(partials, sum_kernel(["w1", "w2"], ["n"])).to_pandas()
        bdf = bdf.rename(columns={"n": "c_xy"})
    else:  # open-vocabulary corpus: distributed key shuffle
        bdf = (
            partials.groupby(["w1", "w2"])
            .aggregate(Sum("n", alias_name="c_xy"))
            .to_pandas()
        )
    big_ref = ray.put(
        dict(
            zip(
                bdf["w1"].astype(str) + "\x1f" + bdf["w2"].astype(str),
                bdf["c_xy"].astype(np.int64),
            )
        )
    )

    def score(batch: pa.Table) -> pa.Table:
        id_type = batch.schema.field(id_col).type
        ids, grams = _doc_ngrams(batch, id_col, text_col, 2)
        if len(ids) == 0:
            empty = {
                id_col: pa.array([], id_type),
                "fluency_permille": pa.array([], pa.int64()),
            }
            for c in carry_cols:
                empty[c] = pa.array([], batch.schema.field(c).type)
            return pa.table(empty)
        bc, uc = ray.get(big_ref), ray.get(uni_ref)
        carried = (
            batch.select([id_col, *carry_cols]).to_pandas().set_index(id_col)
            if carry_cols
            else None
        )
        w1, w2 = pd.Series(grams[0]), pd.Series(grams[1])
        c_xy = (w1.astype(str) + "\x1f" + w2.astype(str)).map(bc).to_numpy(np.int64)
        c1 = w1.map(uc).to_numpy(np.int64)
        p = (1000 * c_xy) // c1
        # per-doc segment reduction: _doc_ngrams emits grams doc-contiguous
        bounds = np.flatnonzero(ids[1:] != ids[:-1]) + 1
        starts = np.concatenate([[0], bounds])
        sums = np.add.reduceat(p, starts)
        n_grams = np.diff(np.concatenate([starts, [len(p)]]))
        cols = {
            id_col: pa.array(ids[starts], id_type),
            "fluency_permille": pa.array(sums // n_grams, pa.int64()),
        }
        if carried is not None:
            keep = carried.reindex(pd.Index(ids[starts]))
            for c in carry_cols:
                cols[c] = pa.array(keep[c].to_numpy(dtype=object))
        return pa.table(
            cols
        )

    return ds.map_batches(score, batch_format="pyarrow")


def lm_fluency_oracle_sql(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB mirror of ``lm_fluency`` (same split, same integer divisions in
    the same grid — byte-exact)."""
    return f"""
        WITH l AS (
            SELECT {id_col}, string_split({text_col}, ' ') AS l FROM {table}
        ), big AS (
            SELECT {id_col}, l[i] AS w1, l[i + 1] AS w2
            FROM l, UNNEST(range(1, len(l))) AS t(i)
        ), uc AS (
            SELECT term, CAST(count(*) AS BIGINT) AS c FROM (
                SELECT unnest(string_split({text_col}, ' ')) AS term FROM {table}
            ) GROUP BY 1
        ), bc AS (
            SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_xy FROM big GROUP BY 1, 2
        )
        SELECT b.{id_col},
               CAST(sum((1000 * bc.c_xy) // uc.c) // count(*) AS BIGINT)
                   AS fluency_permille
        FROM big b
        JOIN bc USING (w1, w2)
        JOIN uc ON uc.term = b.w1
        GROUP BY b.{id_col}
    """


# -- BM25 ranked retrieval ----------------------------------------------------


def bm25_topk(
    ds,
    query_terms: tuple[str, ...],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """BM25 top-``k`` documents for a fixed bag of query terms (k1=1.2,
    b=0.75) — the ranked-retrieval face of ``inverted_index``.

    Distributed shape: one map-only STATS pass (per-batch partial document
    frequencies for the query terms + corpus length totals; partial counts sum
    exactly because each document lives in exactly one batch), a tiny driver
    combine (O(|query|)), then a broadcast SCORE pass with per-batch partial
    top-k under the total order (score DESC, id ASC) and a driver merge —
    identical at any cluster size, no shuffle.

    Integer-exact scoring (the lm_fluency/dsir house style): with k1=6/5 and
    b=3/4 the per-term score idf · tf(k1+1) / (tf + k1(1−b+b·dl/avgdl)),
    avgdl=L/N, clears denominators to round(idf_int·22·tf·L /
    (10·tf·L + 3·L + 9·dl·N)) — an int64 everywhere except one
    correctly-rounded float64 division, so numpy and DuckDB agree bit-for-bit
    (products stay ≪ 2^53 for corpora to ~10^8 tokens; shard the id space
    above that). idf_int = round(1e6·ln(1+(N−df+0.5)/(df+0.5))) quantizes the
    only transcendental once, on the driver.
    """
    import ray

    qterms = tuple(dict.fromkeys(query_terms))  # stable de-dup

    def stats_partial(batch: pa.Table) -> pd.DataFrame:
        texts = batch.column(text_col).to_pandas().fillna("")
        toks = texts.str.split(" ")
        dl = toks.str.len().to_numpy(np.int64)
        rows = [{"term": "", "df": 0, "dl_sum": int(dl.sum()), "n_docs": len(texts)}]
        tok_sets = toks.map(set)
        for t in qterms:
            rows.append(
                {
                    "term": t,
                    "df": int(tok_sets.map(lambda s: t in s).sum()),
                    "dl_sum": 0,
                    "n_docs": 0,
                }
            )
        return pd.DataFrame(rows)

    from ..blocks import sum_kernel, tree_reduce

    agg = (
        tree_reduce(
            ds.map_batches(stats_partial, batch_format="pyarrow"),
            sum_kernel(["term"], ["df", "dl_sum", "n_docs"]),
        )
        .to_pandas()
        .set_index("term")
    )
    N = int(agg["n_docs"].sum())
    L = int(agg["dl_sum"].sum())
    df = {t: int(agg.loc[t, "df"]) if t in agg.index else 0 for t in qterms}
    idf = {
        t: int(
            np.floor(
                1_000_000.0 * np.log1p((N - df[t] + 0.5) / (df[t] + 0.5)) + 0.5
            )
        )
        for t in qterms
    }
    ref = ray.put((idf, N, L))

    def score_partial(batch: pa.Table) -> pd.DataFrame:
        idf_, N_, L_ = ray.get(ref)
        df_b = batch.select([id_col, text_col]).to_pandas()
        toks = df_b[text_col].fillna("").str.split(" ")
        dl = toks.str.len().to_numpy(np.int64)
        score = np.zeros(len(df_b), np.int64)
        hit = np.zeros(len(df_b), bool)
        den_base = 3 * L_ + 9 * dl * N_
        for t, idf_t in idf_.items():
            tf = np.fromiter((doc.count(t) for doc in toks), np.int64, len(df_b))
            m = tf > 0
            if not m.any():
                continue
            num = idf_t * 22 * tf[m] * L_
            den = 10 * tf[m] * L_ + den_base[m]
            score[m] += np.floor(num / den + 0.5).astype(np.int64)
            hit |= m
        out = pd.DataFrame(
            {id_col: df_b[id_col].to_numpy()[hit], "bm25_score": score[hit]}
        )
        out = out.sort_values(
            ["bm25_score", id_col], ascending=[False, True], kind="stable"
        )
        return out.head(k)

    from ..blocks import topk_kernel, tree_reduce

    top = tree_reduce(
        ds.map_batches(score_partial, batch_format="pyarrow"),
        topk_kernel(["bm25_score", id_col], [False, True], k),
    ).to_pandas()
    top.insert(0, "rank", np.arange(1, len(top) + 1, dtype=np.int64))
    return pa.Table.from_pandas(top.reset_index(drop=True), preserve_index=False)


def bm25_oracle_sql(
    table: str,
    query_terms: tuple[str, ...],
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of ``bm25_topk`` — same cleared-denominator integer
    formula, same 1e6 idf quantization, same (score DESC, id) rank."""
    terms = ", ".join(f"'{t}'" for t in dict.fromkeys(query_terms))
    return f"""
        WITH tok AS (
            SELECT {id_col},
                   unnest(string_split(coalesce({text_col}, ''), ' ')) AS term
            FROM {table}
        ), stats AS (
            SELECT count(*) AS L, (SELECT count(*) FROM {table}) AS N FROM tok
        ), dl AS (
            SELECT {id_col}, count(*) AS dl FROM tok GROUP BY 1
        ), tf AS (
            SELECT {id_col}, term, count(*) AS tf
            FROM tok WHERE term IN ({terms}) GROUP BY 1, 2
        ), df AS (
            SELECT term, count(DISTINCT {id_col}) AS df
            FROM tok WHERE term IN ({terms}) GROUP BY 1
        ), idf AS (
            SELECT term,
                   CAST(round(1000000 * ln(1 + (s.N - df + 0.5) / (df + 0.5)))
                       AS BIGINT) AS idf
            FROM df, stats s
        ), contrib AS (
            SELECT tf.{id_col},
                   CAST(round(
                       (idf.idf * 22 * tf.tf * s.L)
                       / (10 * tf.tf * s.L + 3 * s.L + 9 * d.dl * s.N)
                   ) AS BIGINT) AS c
            FROM tf
            JOIN idf USING (term)
            JOIN dl d USING ({id_col})
            CROSS JOIN stats s
        ), scored AS (
            SELECT {id_col}, CAST(sum(c) AS BIGINT) AS bm25_score
            FROM contrib GROUP BY 1
        )
        SELECT CAST(row_number() OVER (
                   ORDER BY bm25_score DESC, {id_col} ASC) AS BIGINT) AS rank,
               {id_col}, bm25_score
        FROM scored
        QUALIFY rank <= {k}
        ORDER BY rank
    """


# -- T5 span corruption --------------------------------------------------------


def span_corrupt(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    noise_permille: int = 150,
    salt: str = "corrupt",
):
    """T5-style SPAN CORRUPTION pairs (Raffel et al. 2020 §3.1.4): each token
    is noise iff its md5 permille (house hash_split recipe, keyed
    ``salt + "doc_id:pos"``) falls below ``noise_permille``; consecutive noise
    tokens form spans; ``inputs`` replaces each span with ``<extra_id_k>``,
    ``targets`` lists each sentinel + its span's tokens and ends with the
    final sentinel (``<extra_id_0>`` alone when nothing was masked).
    Deterministic — no RNG — so the pairs are id-stable across cluster sizes
    AND the whole transform is SQL-oracled (``span_corrupt_oracle_sql``).

    Map-only, no shuffle; one md5 per token (the determinism cost), string
    assembly one C-level join per document."""
    from .sampling import _bucket_of

    def corrupt(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column(text_col), pattern=" ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = (
            toks.combine_chunks().flatten()
            if isinstance(toks, pa.ChunkedArray)
            else toks.flatten()
        ).to_pandas().to_numpy(dtype=object)
        doc_ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        ids_tok = np.repeat(doc_ids, lens)
        pos = _intra_offsets(lens)
        keys = (
            pd.Series(ids_tok).astype(str) + ":" + pd.Series(pos).astype(str)
        ).to_numpy(dtype=object)
        mask = _bucket_of(keys, salt) < noise_permille
        prev = np.concatenate([[False], mask[:-1]]) if len(mask) else mask
        starts = mask & ((pos == 0) | ~prev)
        s = np.cumsum(starts)
        doc_start = np.concatenate([[0], np.cumsum(lens)[:-1]]) if len(lens) else lens
        before_doc = (s[doc_start] - starts[doc_start]) if len(mask) else np.zeros(0, np.int64)
        k = s - np.repeat(before_doc, lens) - 1  # 0-based sentinel idx in-doc
        doc_end = doc_start + lens - 1
        n_spans = (s[doc_end] - before_doc) if len(mask) else np.zeros(0, np.int64)

        sent = np.array([f"<extra_id_{v}>" for v in k], dtype=object)
        piece_in = np.where(starts, sent, flat)
        sel_in = ~mask | starts
        piece_tg = np.where(starts, sent + " " + flat.astype(object), flat)

        def join(piece: np.ndarray, sel: np.ndarray) -> pd.Series:
            if not sel.any():
                return pd.Series("", index=doc_ids, dtype=object)
            return (
                pd.Series(piece[sel])
                .groupby(ids_tok[sel], sort=False)
                .agg(" ".join)
                .reindex(doc_ids)
                .fillna("")
            )

        inputs = join(piece_in, sel_in)
        tgt = join(piece_tg, mask)
        final = np.where(
            n_spans == 0,
            "<extra_id_0>",
            tgt.to_numpy(dtype=object) + np.array(
                [f" <extra_id_{v}>" for v in n_spans], dtype=object
            ),
        )
        per = pd.DataFrame({"n": lens, "m": np.zeros(len(lens), np.int64)})
        if len(mask):
            msum = pd.Series(mask.astype(np.int64)).groupby(ids_tok, sort=False).sum()
            per["m"] = msum.reindex(doc_ids).fillna(0).to_numpy(np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "inputs": pa.array(inputs.to_numpy(dtype=object), pa.string()),
                "targets": pa.array(final, pa.string()),
                "n_tokens": pa.array(lens),
                "n_masked": pa.array(per["m"].to_numpy(np.int64)),
                "n_noise_spans": pa.array(n_spans.astype(np.int64)),
            }
        )

    return ds.map_batches(corrupt, batch_format="pyarrow")


def span_corrupt_oracle_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    noise_permille: int = 150,
    salt: str = "corrupt",
) -> str:
    """DuckDB mirror of ``span_corrupt`` (same md5-permille key, same window
    semantics; sentinel text built with the identical CAST). The token index
    is named ``ti`` because ``_permille_sql``'s list_transform lambda binds
    ``i`` — an outer column named ``i`` would be silently shadowed."""
    from .sampling import _permille_sql

    key = f"(CAST({id_col} AS VARCHAR) || ':' || CAST(ti - 1 AS VARCHAR))"
    return f"""
        WITH l AS (
            SELECT {id_col}, string_split({text_col}, ' ') AS l FROM {table}
        ), t AS (
            SELECT {id_col}, ti, l[ti] AS tok,
                   {_permille_sql(key, salt)} < {noise_permille} AS m
            FROM l, UNNEST(range(1, len(l) + 1)) AS u(ti)
        ), st AS (
            SELECT *, m AND (ti = 1 OR NOT lag(m) OVER (
                       PARTITION BY {id_col} ORDER BY ti)) AS s
            FROM t
        ), k AS (
            SELECT *, SUM(CASE WHEN s THEN 1 ELSE 0 END) OVER (
                       PARTITION BY {id_col} ORDER BY ti) - 1 AS k
            FROM st
        ), agg AS (
            SELECT {id_col},
                   count(*) AS n_tokens,
                   count(*) FILTER (WHERE m) AS n_masked,
                   count(*) FILTER (WHERE s) AS n_noise_spans,
                   coalesce(string_agg(
                       CASE WHEN s THEN '<extra_id_' || CAST(k AS VARCHAR) || '>'
                            ELSE tok END, ' ' ORDER BY ti)
                       FILTER (WHERE NOT m OR s), '') AS inputs,
                   coalesce(string_agg(
                       CASE WHEN s THEN '<extra_id_' || CAST(k AS VARCHAR) || '> ' || tok
                            ELSE tok END, ' ' ORDER BY ti)
                       FILTER (WHERE m), '') AS tgt
            FROM k GROUP BY 1
        )
        SELECT {id_col}, inputs,
               CASE WHEN n_noise_spans = 0 THEN '<extra_id_0>'
                    ELSE tgt || ' <extra_id_' || CAST(n_noise_spans AS VARCHAR) || '>'
               END AS targets,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_masked AS BIGINT) AS n_masked,
               CAST(n_noise_spans AS BIGINT) AS n_noise_spans
        FROM agg
    """
