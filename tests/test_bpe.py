"""BPE tokenizer induction: deterministic merges from distributed word counts,
map-only encoding, equivalence with the no-Ray twin."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dbt_customer360_ray.stages.bpe import (
    _encode_word,
    encode_bpe,
    train_bpe,
    train_bpe_local,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs(n=200, seed=11):
    rng = np.random.default_rng(seed)
    vocab = ["low", "lower", "lowest", "new", "newer", "wide", "wider", "widest"]
    texts = [" ".join(rng.choice(vocab, size=int(k))) for k in rng.integers(2, 30, n)]
    return pa.table({"doc_id": np.arange(n, dtype=np.int64), "text": texts})


def test_bpe_classic_merges_and_determinism():
    import ray.data

    docs = _docs()
    merges = train_bpe(ray.data.from_arrow(docs), num_merges=10)
    assert len(merges) == 10
    # the distributed trainer equals the no-Ray twin on the same corpus
    local = train_bpe_local(docs.column("text").to_pylist(), 10)
    assert merges == local
    # batch layout / parallelism independence
    merges2 = train_bpe(ray.data.from_arrow(docs).repartition(7), num_merges=10)
    assert merges2 == merges
    # frequent substrings merge early: multi-char units appear within 10 rounds
    flat = ["".join(m).replace("</w>", "") for m in merges]
    assert any(len(t) >= 3 for t in flat), flat


def test_bpe_encode_word_applies_lowest_rank_first():
    rank = {("l", "o"): 0, ("lo", "w"): 1, ("w", "</w>"): 2}
    assert _encode_word("low", rank) == ["low</w>"] or _encode_word("low", rank) == ["low", "</w>"]
    # no applicable merge → characters + EOW survive
    assert _encode_word("xyz", {}) == ["x", "y", "z", "</w>"]


def test_bpe_encode_counts_shrink_with_more_merges():
    import ray.data

    docs = _docs()
    ds = ray.data.from_arrow(docs)
    m5 = train_bpe(ds, num_merges=5)
    m40 = train_bpe(ds, num_merges=40)
    e5 = encode_bpe(ds, m5).to_pandas().sort_values("doc_id").reset_index(drop=True)
    e40 = encode_bpe(ds, m40).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert len(e5) == len(e40) == docs.num_rows
    # more merges never lengthen an encoding
    assert (e40["n_bpe_tokens"] <= e5["n_bpe_tokens"]).all()
    # zero merges → pure character(+EOW) count
    e0 = encode_bpe(ds, []).to_pandas().sort_values("doc_id").reset_index(drop=True)
    texts = docs.column("text").to_pylist()
    want = [sum(len(w) + 1 for w in t.split(" ")) for t in texts]
    assert e0["n_bpe_tokens"].tolist() == want
