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

    partials = ds.map_batches(df_partial, batch_format="pyarrow").to_pandas()
    df_map = partials.groupby("term")["n"].sum().to_dict()
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

    def stats(batch: pa.Table) -> pa.Table:
        tf = _term_tf(batch, id_col, text_col)
        g = tf.groupby("doc", sort=False)["tf"]
        per = pd.DataFrame(
            {"n_words": g.sum(), "n_distinct": g.size(), "top_c": g.max()}
        )
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

    return ds.map_batches(stats, batch_format="pyarrow")


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

    partials = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    counts = partials.groupby("term")["n"].sum().reset_index()
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
