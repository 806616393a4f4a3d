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

    __init__ compiles token regex + marker tables once per actor; __call__ is
    vectorized pandas/numpy per batch.
    Outputs: lang_pred (argmax marker-hit rate, 'und' if no hits), stopword_ratio,
    mean_word_len, punct_ratio, quality_score in [0,1].
    """

    def __init__(self):
        import re

        self.word_re = re.compile(TOKEN_RE)
        self.langs = sorted(LANG_MARKERS)
        self.marker_sets = [LANG_MARKERS[lang] for lang in self.langs]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        tokens = text.str.lower().str.findall(self.word_re)
        n_tok = tokens.str.len().to_numpy(dtype=np.int64)
        safe_n = np.maximum(n_tok, 1)

        hit_counts = np.zeros((len(batch), len(self.langs)), dtype=np.int64)
        for j, markers in enumerate(self.marker_sets):
            hit_counts[:, j] = tokens.map(
                lambda ws, m=markers: sum(1 for w in ws if w in m)
            ).to_numpy()
        best = hit_counts.argmax(axis=1)
        any_hit = hit_counts.max(axis=1) > 0
        batch["lang_pred"] = np.where(
            any_hit, np.array(self.langs, dtype=object)[best], "und"
        )
        batch["stopword_ratio"] = hit_counts.max(axis=1) / safe_n

        n_chars = text.str.len().to_numpy(dtype=np.int64)
        word_chars = tokens.map(lambda ws: sum(len(w) for w in ws)).to_numpy()
        batch["mean_word_len"] = word_chars / safe_n
        punct = text.str.count(r"[^\w\s]").to_numpy(dtype=np.int64)
        batch["punct_ratio"] = punct / np.maximum(n_chars, 1)

        # simple composite: long-enough, word-like, not punctuation soup
        length_ok = np.clip(n_tok / 20.0, 0, 1)
        word_ok = np.clip(batch["mean_word_len"].to_numpy() / 4.0, 0, 1)
        punct_ok = 1.0 - np.clip(batch["punct_ratio"].to_numpy() * 4.0, 0, 1)
        batch["quality_score"] = (length_ok + word_ok + punct_ok) / 3.0
        return batch


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
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
