"""Byte-pair-encoding tokenizer induction (Sennrich et al. 2016) over a
document corpus — the canonical vocabulary-training step of an LLM data
pipeline, shaped for Ray Data:

- **Word counting is distributed**: one map-only pass emits per-batch word
  frequencies, folded in a coalesced combine (word vocab is tiny next to the
  corpus; above the gate it switches to the key-shuffle groupby — same rule
  as ``lm_fluency``).
- **Merge training is driver-side over the word-frequency table** — the
  classic shape (HuggingFace/SentencePiece train from word counts too): the
  loop over merges is inherently sequential, but its input is O(word vocab),
  never O(corpus). Each round counts adjacent symbol pairs weighted by word
  frequency and merges the (count DESC, pair ASC) argmax — fully
  deterministic, cluster-size independent.
- **Encoding is map-only**: the learned merge list broadcasts once via
  ``ray.put``; each batch re-segments its words by merge rank (the GPT-2
  apply-lowest-rank-first rule).

Training is not SQL-expressible (iterative re-segmentation), so the driver
entry is a rows-only check; determinism is pinned by unit tests against a
brute-force reference and by encode(train twice) equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_EOW = "</w>"  # end-of-word marker, per the original BPE formulation


def _word_counts(ds, text_col: str) -> pd.Series:
    """Distributed word-frequency table: per-batch value_counts partials,
    coalesced on the driver (O(word vocab))."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        toks = pc.split_pattern(batch.column(text_col), pattern=" ")
        flat = (
            toks.combine_chunks().flatten()
            if isinstance(toks, pa.ChunkedArray)
            else toks.flatten()
        )
        vc = flat.to_pandas().value_counts()
        return pd.DataFrame({"word": vc.index, "n": vc.to_numpy(np.int64)})

    from ..blocks import sum_kernel, tree_reduce

    parts = tree_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        sum_kernel(["word"], ["n"]),
    ).to_pandas()
    return parts.groupby("word", sort=True)["n"].sum()


def train_bpe(ds, text_col: str = "text", num_merges: int = 100) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the ordered
    merge list [(left, right), ...]; deterministic: ties broken by pair
    lexicographic order."""
    wc = _word_counts(ds, text_col)
    # symbol sequences per distinct word, weighted by frequency
    seqs = [tuple(w) + (_EOW,) for w in wc.index]
    freqs = wc.to_numpy(np.int64)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, f in zip(seqs, freqs):
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + int(f)
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_seqs = []
        for seq in seqs:
            if len(seq) < 2:
                new_seqs.append(seq)
                continue
            out = []
            i = 0
            while i < len(seq):
                if i < len(seq) - 1 and seq[i] == best[0] and seq[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_seqs.append(tuple(out))
        seqs = new_seqs
    return merges


def _encode_word(word: str, rank: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges lowest-rank-first (the GPT-2 rule)."""
    seq = list(word) + [_EOW]
    while len(seq) > 1:
        best_i, best_r = -1, None
        for i in range(len(seq) - 1):
            r = rank.get((seq[i], seq[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]
    return seq


def encode_bpe(ds, merges: list[tuple[str, str]], id_col: str = "doc_id",
               text_col: str = "text"):
    """Map-only corpus encoding under a learned merge list: per document, the
    BPE token count and the distinct-token count. The merge table broadcasts
    once; each batch caches per-WORD encodings (corpus words repeat heavily,
    so the per-batch memo turns the quadratic re-segmentation into a lookup)."""
    import ray

    rank_ref = ray.put({tuple(m): i for i, m in enumerate(merges)})

    def enc(batch: pd.DataFrame) -> pd.DataFrame:
        rank = ray.get(rank_ref)
        memo: dict[str, list[str]] = {}

        def doc_tokens(text: str) -> tuple[int, int]:
            toks: list[str] = []
            for w in text.split(" "):
                got = memo.get(w)
                if got is None:
                    got = memo[w] = _encode_word(w, rank)
                toks.extend(got)
            return len(toks), len(set(toks))

        pairs = [doc_tokens(t) for t in batch[text_col]]
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(),
                "n_bpe_tokens": np.array([p[0] for p in pairs], np.int64),
                "n_distinct_tokens": np.array([p[1] for p in pairs], np.int64),
            }
        )

    return ds.map_batches(enc, batch_format="pandas")


def train_bpe_local(texts: list[str], num_merges: int) -> list[tuple[str, str]]:
    """No-Ray twin of ``train_bpe`` for equivalence tests."""
    wc = pd.Series(
        np.concatenate([t.split(" ") for t in texts])
    ).value_counts().sort_index()
    # reuse the driver loop by faking the Series shape train_bpe consumes
    seqs = [tuple(w) + (_EOW,) for w in wc.index]
    freqs = wc.to_numpy(np.int64)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for seq, f in zip(seqs, freqs):
            for i in range(len(seq) - 1):
                p = (seq[i], seq[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + int(f)
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        seqs = [
            _merge_seq(seq, best, joined) for seq in seqs
        ]
    return merges


def _merge_seq(seq: tuple, best: tuple[str, str], joined: str) -> tuple:
    out = []
    i = 0
    while i < len(seq):
        if i < len(seq) - 1 and seq[i] == best[0] and seq[i + 1] == best[1]:
            out.append(joined)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return tuple(out)
