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
}


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


def analyze_text(ds, concurrency: int = 4, batch_size: int = 4096):
    """documents Dataset → + lang_pred/stopword_ratio/mean_word_len/punct_ratio/
    quality_score columns, via a TextQuality actor pool."""
    return ds.map_batches(
        TextQuality,
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )
