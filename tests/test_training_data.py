"""Training-data operators: decontamination, shuffle-shard, token chunking."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs_ds(texts, start_id=0):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array(
                np.arange(start_id, start_id + len(texts), dtype=np.int64)
            ),
            "text": pa.array(texts, pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(4)


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def _mk_texts(rng, n, length=20):
    return [" ".join(rng.choice(WORDS, length)) for _ in range(n)]


def test_decontaminate_broadcast_and_join_paths_agree():
    from dbt_customer360_ray.stages.decontaminate import decontaminate

    rng = np.random.default_rng(5)
    eval_texts = _mk_texts(rng, 6)
    train_texts = _mk_texts(rng, 40)
    # plant contamination: two train docs embed an eval doc's 4-gram run
    train_texts[3] = eval_texts[0]
    train_texts[17] = "zzz " + " ".join(eval_texts[2].split()[:8]) + " yyy"
    train, ev = _docs_ds(train_texts), _docs_ds(eval_texts, start_id=1000)

    bc = decontaminate(train, ev, n=4).to_pandas()["doc_id"].sort_values().to_numpy()
    jn = (
        decontaminate(train, ev, n=4, broadcast_gate=0)
        .to_pandas()["doc_id"]
        .sort_values()
        .to_numpy()
    )
    np.testing.assert_array_equal(bc, jn)
    assert 3 not in bc and 17 not in bc
    assert len(bc) <= 38


def test_decontaminate_short_docs_never_contaminate():
    from dbt_customer360_ray.stages.decontaminate import decontaminate

    # docs shorter than n tokens carry no grams on either side
    train = _docs_ds(["alpha beta", "alpha beta gamma delta epsilon"])
    ev = _docs_ds(["alpha beta"], start_id=100)
    out = decontaminate(train, ev, n=4).to_pandas()["doc_id"].tolist()
    assert sorted(out) == [0, 1]


def test_shuffle_shard_is_deterministic_and_dense():
    from dbt_customer360_ray.stages.sampling import shuffle_shard

    ds = _docs_ds(["x"] * 500)
    a = shuffle_shard(ds, "doc_id", num_shards=8).to_pandas()
    b = shuffle_shard(ds.repartition(2), "doc_id", num_shards=8).to_pandas()
    a = a.sort_values(["shard", "pos"]).reset_index(drop=True)
    b = b.sort_values(["shard", "pos"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # layout-independent
    assert len(a) == 500 and a["doc_id"].nunique() == 500
    for _, g in a.groupby("shard"):
        np.testing.assert_array_equal(
            np.sort(g["pos"].to_numpy()), np.arange(len(g))
        )  # positions dense per shard


def test_chunk_tokens_roundtrip():
    from dbt_customer360_ray.stages.text import chunk_tokens

    rng = np.random.default_rng(9)
    texts = _mk_texts(rng, 30, length=37) + ["single", ""]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(32, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = chunk_tokens(t, chunk_size=16).to_pandas()
    re = (
        out.sort_values(["doc_id", "chunk_idx"])
        .groupby("doc_id")["chunk_text"]
        .apply(" ".join)
    )
    for i, txt in enumerate(texts):
        assert re[i] == txt  # chunks reassemble the document exactly
    sums = out.groupby("doc_id")["n_tokens"].sum()
    assert sums[0] == 37 and sums[30] == 1 and sums[31] == 1  # '' is one empty token
    assert out["n_tokens"].max() <= 16
    assert (out.groupby("doc_id")["chunk_idx"].min() == 0).all()


def test_pack_sequences_layout_invariants():
    import ray.data

    from dbt_customer360_ray.stages.sampling import pack_sequences

    rng = np.random.default_rng(3)
    n = 300
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "n_tokens": pa.array(rng.integers(1, 50, n).astype(np.int64)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(5)
    out = (
        pack_sequences(ds, "doc_id", "n_tokens", seq_len=64, num_shards=4)
        .to_pandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
    )
    assert len(out) == n
    for _, g in out.groupby("shard"):
        cum = 0
        for r in g.itertuples(index=False):
            # the token stream is contiguous: each doc starts where the
            # previous one ended
            assert r.seq_start == cum // 64
            assert r.offset_in_seq == cum % 64
            cum += r.n_tokens
            assert r.seq_end == (cum - 1) // 64
    # layout-independent determinism
    again = (
        pack_sequences(ds.repartition(2), "doc_id", "n_tokens", seq_len=64, num_shards=4)
        .to_pandas()
        .sort_values(["shard", "pos"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, again)


def test_top_terms_batching_independent():
    from dbt_customer360_ray.stages.text import top_terms

    rng = np.random.default_rng(11)
    texts = [" ".join(rng.choice(WORDS, 25)) for _ in range(120)]
    a = top_terms(_docs_ds(texts), k=3).to_pandas()
    b = top_terms(_docs_ds(texts).repartition(7), k=3).to_pandas()
    key = ["doc_id", "term"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("doc_id").size() <= 3).all()
    # df is GLOBAL: a term's df is identical on every row it appears in
    assert (a.groupby("term")["df"].nunique() == 1).all()


def test_quantize_int8_roundtrip_error_bounded():
    import ray.data

    from dbt_customer360_ray.stages.similarity import quantize_int8

    rng = np.random.default_rng(13)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    vecs[0] = 0.0  # zero vector: scale guard, codes all 0
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(200, dtype=np.int64)),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        }
    )
    out = quantize_int8(ray.data.from_arrow(t).repartition(4)).to_pandas()
    assert len(out) == 200 * 16
    assert out["code"].between(-127, 127).all()
    z = out[out["vec_id"] == 0]
    assert (z["code"] == 0).all()
    # dequantization error ≤ scale/254 per dim (half a code step)
    codes = out.sort_values(["vec_id", "dim_idx"])["code"].to_numpy().reshape(200, 16)
    scale = np.abs(vecs.astype(np.float64)).max(axis=1)
    scale[scale == 0] = 1.0
    deq = codes / 127.0 * scale[:, None]
    assert np.abs(deq - vecs.astype(np.float64)).max() <= (scale.max() / 127.0) * 0.5 + 1e-12


def test_lead_lag_gaps_match_pandas_windows():
    import ray.data

    from dbt_customer360_ray.stages.windows import lead_lag_gaps

    rng = np.random.default_rng(17)
    n = 2_000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, 60, n),
            "ts": pd.Timestamp("2025-01-01")
            + pd.to_timedelta(rng.integers(0, 10**6, n), unit="s"),
        }
    )
    out = (
        lead_lag_gaps(ray.data.from_pandas(df).repartition(6))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    ref = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
    want_prev = ref.groupby("user_id")["ts"].diff().dt.total_seconds()
    want_next = -ref.groupby("user_id")["ts"].diff(-1).dt.total_seconds()
    ref = ref.assign(gp=np.floor(want_prev), gn=np.floor(want_next)).sort_values("event_id")
    np.testing.assert_array_equal(
        out["gap_prev_s"].to_numpy(), ref["gp"].to_numpy()
    )
    np.testing.assert_array_equal(
        out["gap_next_s"].to_numpy(), ref["gn"].to_numpy()
    )


def test_canonicalize_picks_most_complete_member():
    from dbt_customer360_ray.stages.dedup import canonicalize_near_dups

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa alpha beta"
    texts = [
        base,                      # 0: full
        base + " extra tail",      # 1: longer near-dup of 0 → representative
        "unrelated words only here with nothing shared at all",  # 2
        base,                      # 3: exact dup of 0
    ]
    out = (
        canonicalize_near_dups(_docs_ds(texts))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 4
    assert out.loc[2, "canonical_id"] == 2            # singleton → itself
    grp = out.loc[[0, 1, 3], "canonical_id"]
    assert (grp == 1).all()                           # longest member wins


def test_repetition_stats_match_bruteforce():
    import ray.data

    from dbt_customer360_ray.stages.text import repetition_stats

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                "a a a a b",          # top 4/5, dup 1 - 2/5
                "v w x y z q",        # all distinct: top 1/6 <= 0.2
                "spam spam spam spam",
                "",                   # one empty token
            ],
        }
    )
    got = (
        repetition_stats(ray.data.from_arrow(docs))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert got.loc[1, "top_word_frac"] == 4 / 5
    assert got.loc[1, "dup_word_frac"] == 1 - 2 / 5
    assert not got.loc[1, "keep"]
    assert got.loc[2, "top_word_frac"] == 1 / 6 and got.loc[2, "dup_word_frac"] == 0.0
    assert bool(got.loc[2, "keep"])
    assert got.loc[3, "dup_word_frac"] == 0.75 and not got.loc[3, "keep"]
    assert got.loc[4, "n_words"] == 1  # split('') -> [''], the SQL convention


def test_vocab_and_encode_are_batching_independent():
    import ray.data

    from dbt_customer360_ray.stages.text import (
        build_vocab,
        encode_documents,
        encode_documents_flat,
    )

    rng = np.random.default_rng(7)
    words = np.array(["alpha", "beta", "gamma", "delta", "eps"])
    texts = [" ".join(rng.choice(words, rng.integers(1, 12))) for _ in range(200)]
    docs = pa.table({"doc_id": pa.array(range(200), pa.int64()), "text": texts})

    v1 = build_vocab(ray.data.from_arrow(docs))
    v64 = build_vocab(ray.data.from_arrow(docs).repartition(64))
    pd.testing.assert_frame_equal(v1, v64)
    assert v1["token_id"].tolist() == list(range(1, len(v1) + 1))
    assert v1["n"].is_monotonic_decreasing

    enc = encode_documents(ray.data.from_arrow(docs), v1).to_pandas()
    enc = enc.sort_values("doc_id").reset_index(drop=True)
    vmap = dict(zip(v1["term"], v1["token_id"]))
    for i in (0, 17, 199):
        want = [vmap[w] for w in texts[i].split(" ")]
        assert list(enc.loc[i, "ids"]) == want
        assert enc.loc[i, "n_tokens"] == len(want)

    # flat form agrees with the list form
    flat = (
        encode_documents_flat(ray.data.from_arrow(docs).repartition(8), v1)
        .to_pandas()
        .sort_values(["doc_id", "ord"])
    )
    rebuilt = flat.groupby("doc_id")["token_id"].apply(list)
    for i in (0, 42):
        assert rebuilt.loc[i] == list(enc.loc[i, "ids"])


def test_encode_oov_maps_to_zero():
    import ray.data

    from dbt_customer360_ray.stages.text import build_vocab, encode_documents

    train = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["a b c"]})
    vocab = build_vocab(ray.data.from_arrow(train), max_size=2)
    assert len(vocab) == 2
    new = pa.table({"doc_id": pa.array([9], pa.int64()), "text": ["a zzz c"]})
    got = encode_documents(ray.data.from_arrow(new), vocab).to_pandas()
    ids = list(got["ids"].iloc[0])
    assert 0 in ids and len(ids) == 3


def test_global_row_number_exact_across_blockings():
    import ray.data

    from dbt_customer360_ray.stages.windows import global_row_number, with_ntile

    rng = np.random.default_rng(3)
    vals = rng.permutation(500)
    t = pa.table({"id": pa.array(range(500), pa.int64()), "v": pa.array(vals, pa.int64())})
    for nblocks in (1, 7, 32):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        numbered, total = global_row_number(ds, ["v", "id"], descending=[True, False], out_col="rn")
        df = numbered.to_pandas().sort_values("rn").reset_index(drop=True)
        assert total == 500
        assert df["rn"].tolist() == list(range(1, 501))
        assert df["v"].is_monotonic_decreasing

    # NTILE matches the SQL split: first (total % n) tiles get one extra row
    ds = ray.data.from_arrow(t).repartition(9)
    tiles = with_ntile(ds, 3, ["v", "id"], descending=[True, False]).to_pandas()
    vc = tiles["tile"].value_counts().sort_index()
    assert vc.tolist() == [167, 167, 166]
    # tile boundaries follow the sort order exactly
    srt = tiles.sort_values(["v", "id"], ascending=[False, True])
    assert srt["tile"].is_monotonic_increasing

    # total < n: every row is its own tile
    small = pa.table({"id": pa.array([1, 2], pa.int64()), "v": pa.array([5, 9], pa.int64())})
    got = with_ntile(ray.data.from_arrow(small), 4, ["v", "id"]).to_pandas()
    assert sorted(got["tile"].tolist()) == [1, 2]


# -- gopher rules / window dedup / quota sample --------------------------------


def test_gopher_rules_thresholds():
    from dbt_customer360_ray.stages.text import gopher_rules

    long_good = " ".join(["the quick brown foxes jumped"] * 12)  # 60 words
    short = "the and tiny"  # fails word count
    symbols = " ".join(["the quick brown foxes jumped"] * 12) + " " + "#" * 40
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([long_good, short, symbols], pa.string()),
        }
    )
    out = gopher_rules(t).to_pandas().set_index("doc_id")
    assert bool(out.loc[1, "gopher_pass"])
    assert not bool(out.loc[2, "ok_word_count"])
    assert not bool(out.loc[3, "ok_symbols"]) and not bool(out.loc[3, "gopher_pass"])


def test_window_dedup_drops_repeated_spans():
    from dbt_customer360_ray.stages.dedup import window_dedup

    span = " ".join(WORDS)  # exactly one 10-token window
    uniq = " ".join(reversed(WORDS))
    # doc 0 owns the span; doc 1 repeats it then adds a unique span; doc 2 is
    # the span verbatim and must vanish entirely
    ds = _docs_ds([span, span + " " + uniq, span])
    got = (
        window_dedup(ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [0, 1]
    assert got.loc[0, "text"] == span
    assert got.loc[1, "text"] == uniq  # only its second window survives


def test_window_dedup_is_partition_invariant():
    import ray.data

    from dbt_customer360_ray.stages.dedup import window_dedup

    rng = np.random.default_rng(5)
    texts = _mk_texts(rng, 60, length=25)
    texts += texts[:10]  # verbatim dup docs
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    a = (
        window_dedup(ray.data.from_arrow(t).repartition(2))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        window_dedup(ray.data.from_arrow(t).repartition(13))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert set(a["doc_id"]) & set(range(60, 70)) == set()  # dup docs vanished


def test_quota_sample_caps_per_key_deterministically():
    import ray.data

    from dbt_customer360_ray.stages.sampling import quota_sample

    n = 500
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "source": pa.array([f"s{i % 7}" for i in range(n)], pa.string()),
        }
    )
    a = (
        quota_sample(ray.data.from_arrow(t).repartition(3), quota=10)
        .to_pandas().sort_values(["source", "doc_id"]).reset_index(drop=True)
    )
    b = (
        quota_sample(ray.data.from_arrow(t).repartition(17), quota=10)
        .to_pandas().sort_values(["source", "doc_id"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert (a.groupby("source").size() == 10).all()


def test_rp_sketch_integer_exact_and_partition_invariant():
    import ray.data

    from dbt_customer360_ray.stages.similarity import rp_sign_planes, rp_sketch

    rng = np.random.default_rng(5)
    n, dim, out_dim = 40, 16, 4
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    emb[7] = 0.0  # zero vector: scale guard path
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(emb)),
        }
    )
    a = (
        rp_sketch(ray.data.from_arrow(t).repartition(2), dim=dim, out_dim=out_dim)
        .to_pandas().sort_values(["vec_id", "proj_idx"]).reset_index(drop=True)
    )
    b = (
        rp_sketch(ray.data.from_arrow(t).repartition(9), dim=dim, out_dim=out_dim)
        .to_pandas().sort_values(["vec_id", "proj_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)  # cluster-size invariant
    # hand-check one vector against the definition
    R = rp_sign_planes(dim, out_dim)
    v = emb[3].astype(np.float64)
    codes = np.floor(v / np.abs(v).max() * 127.0 + 0.5).astype(np.int64)
    want = codes @ R.T
    got = a[a.vec_id == 3].sort_values("proj_idx")["value"].to_numpy()
    assert (got == want).all()
    assert (a[a.vec_id == 7]["value"] == 0).all()  # zero vector stays zero


def test_lm_fluency_matches_duckdb_oracle():
    import duckdb
    import ray.data

    from dbt_customer360_ray.stages.text import lm_fluency, lm_fluency_oracle_sql

    rng = np.random.default_rng(19)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=int(n)))
        for n in rng.integers(1, 60, size=300)  # includes 1-token docs
    ]
    docs = pa.table({"doc_id": np.arange(300, dtype=np.int64), "text": texts})
    got = (
        lm_fluency(ray.data.from_arrow(docs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = (
        con.execute(lm_fluency_oracle_sql("documents"))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got["fluency_permille"] >= 0).all()
    assert got["fluency_permille"].max() <= 1000
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()], check_dtype=False)
    # 1-token docs contribute no bigrams and are absent
    one_tok = {i for i, t in enumerate(texts) if len(t.split()) < 2}
    assert one_tok.isdisjoint(set(got["doc_id"]))
    assert len(got) == 300 - len(one_tok)


def test_mix_to_proportions_hits_targets_and_is_deterministic():
    import ray.data

    from dbt_customer360_ray.stages.sampling import mix_to_proportions

    rng = np.random.default_rng(23)
    n_per = {"web": 6_000, "wiki": 2_000, "code": 1_000, "junk": 500}
    rows = []
    i = 0
    for s, n in n_per.items():
        for _ in range(n):
            rows.append({"doc_id": i, "source": s, "text": f"t{i}"})
            i += 1
    docs = pa.Table.from_pylist(rows)
    weights = {"web": 5, "wiki": 3, "code": 2}  # junk unweighted → dropped

    got = mix_to_proportions(
        ray.data.from_arrow(docs), "doc_id", "source", weights
    ).to_pandas()
    assert "junk" not in set(got["source"])
    kept = got.groupby("source").size()
    # code is the scarcest source relative to its weight: nearly all kept
    assert kept["code"] >= 900
    # proportions approach 5:3:2 (md5 sampling is ±few-% at these counts)
    total = kept.sum()
    for s, w in weights.items():
        assert abs(kept[s] / total - w / 10) < 0.05, (s, kept[s], total)
    # identical row set at a different parallelism/batch layout
    got2 = mix_to_proportions(
        ray.data.from_arrow(docs).repartition(13), "doc_id", "source", weights
    ).to_pandas()
    assert set(got2["doc_id"]) == set(got["doc_id"])


def test_pq_topk_deterministic_and_plausible():
    import ray.data

    from dbt_customer360_ray.stages.similarity import (
        pq_encode_matrix,
        pq_seeded_codebooks,
        pq_topk,
    )

    rng = np.random.default_rng(31)
    n, dim = 400, 64
    emb = rng.standard_normal((n, dim))
    t = pa.table({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": list(emb.astype(np.float64)),
    })
    cbs = pq_seeded_codebooks(dim=dim, m=8, codewords=16)
    q = emb[:3]
    out = pq_topk(ray.data.from_arrow(t), q, np.arange(3), cbs, k=5).to_pandas()
    out = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert len(out) == 15
    # a query's own vector has ADC distance == its reconstruction distance —
    # it must rank at or near the top (quantization noise bounded)
    top3 = out[out["rank"] <= 3]
    assert all(
        qid in set(top3.loc[top3["query_id"] == qid, "vec_id"]) for qid in range(3)
    )
    # layout independence
    out2 = pq_topk(
        ray.data.from_arrow(t).repartition(7), q, np.arange(3), cbs, k=5
    ).to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out, out2)
    # codes are within range and deterministic
    codes = pq_encode_matrix(emb, cbs)
    assert codes.shape == (n, 8) and codes.min() >= 0 and codes.max() < 16
    assert (pq_encode_matrix(emb, cbs) == codes).all()


def test_dsir_select_matches_duckdb_oracle_and_layout_independent():
    import duckdb
    import ray.data

    from dbt_customer360_ray.stages.dsir import dsir_oracle_sql, dsir_select

    rng = np.random.default_rng(31)
    # two "domains" with shifted vocabularies; target docs favour w0..w9
    tgt_vocab = [f"w{i}" for i in range(10)]
    raw_vocab = [f"w{i}" for i in range(5, 40)]
    rows = []
    for i in range(240):
        is_t = i % 3 == 0
        vocab = tgt_vocab if is_t else raw_vocab
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(rng.choice(vocab, size=int(rng.integers(1, 30)))),
                "source": "target" if is_t else f"raw{i % 4}",
            }
        )
    docs = pa.Table.from_pylist(rows)

    got = dsir_select(
        ray.data.from_arrow(docs).repartition(7), ("target",), k=50,
        num_buckets=256,
    ).to_pandas()
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(
        dsir_oracle_sql("documents", ("target",), k=50, num_buckets=256)
    ).df()
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])

    # layout independence: one block vs many blocks, identical result
    again = dsir_select(
        ray.data.from_arrow(docs), ("target",), k=50, num_buckets=256
    ).to_pandas()
    pd.testing.assert_frame_equal(got, again)

    # target-domain docs dominate the selection: their vocabulary is what the
    # importance weight rewards
    top10 = set(got.head(10)["doc_id"])
    assert sum(1 for d in top10 if d % 3 == 0) >= 8


def test_bm25_topk_matches_duckdb_oracle_and_ranks_sanely():
    import duckdb
    import ray.data

    from dbt_customer360_ray.stages.text import bm25_oracle_sql, bm25_topk

    rng = np.random.default_rng(47)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=int(n)))
        for n in rng.integers(1, 50, size=200)
    ]
    # doc 0: saturated with the query terms; doc 1: no query terms at all
    texts[0] = "hash merge hash merge hash scan"
    texts[1] = "w1 w2 w3"
    docs = pa.table({"doc_id": np.arange(200, dtype=np.int64), "text": texts})
    q = ("hash", "merge", "scan", "absent-term")

    got = bm25_topk(ray.data.from_arrow(docs).repartition(5), q, k=25).to_pandas()
    con = duckdb.connect()
    con.register("documents", docs)
    want = con.execute(bm25_oracle_sql("documents", q, k=25)).df()
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])

    assert 0 in set(got["doc_id"])  # query-term-dense doc is retrieved
    assert 1 not in set(got["doc_id"])  # doc without query terms never scores
    # layout independence
    again = bm25_topk(ray.data.from_arrow(docs), q, k=25).to_pandas()
    pd.testing.assert_frame_equal(got, again)


def test_knn_graph_matches_duckdb_oracle_and_excludes_self():
    import duckdb
    import ray.data

    from dbt_customer360_ray.stages.similarity import (
        knn_graph,
        knn_graph_oracle_sql,
    )

    rng = np.random.default_rng(53)
    n, dim = 120, 16
    emb = rng.standard_normal((n, dim))
    emb[7] = emb[3] * 2.0  # planted exact-direction duplicate pair
    t = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(emb.astype(np.float64)),
        }
    )
    got = (
        knn_graph(ray.data.from_arrow(t).repartition(6), k=4)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("embeddings", t)
    want = (
        con.execute(knn_graph_oracle_sql("embeddings", k=4))
        .df()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])

    assert (got["vec_id"] != got["neighbor_id"]).all()  # no self edges
    assert got.groupby("vec_id").size().eq(4).all()  # exactly k per node
    # the planted colinear pair are each other's top neighbour at cosine 1.0
    r1 = got[(got["vec_id"] == 3) & (got["rank"] == 1)].iloc[0]
    assert r1["neighbor_id"] == 7 and r1["cosine"] == 1.0


def test_hard_negatives_matches_oracle_and_masks_same_label():
    import duckdb
    import ray.data

    from dbt_customer360_ray.stages.similarity import (
        hard_negatives,
        hard_negatives_oracle_sql,
    )

    rng = np.random.default_rng(59)
    n, dim = 90, 12
    emb = rng.standard_normal((n, dim))
    emb[11] = emb[4] * 3.0  # colinear pair with DIFFERENT labels
    labels = np.array([f"c{i % 3}" for i in range(n)], dtype=object)
    labels[4], labels[11] = "c0", "c1"
    t = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "label": pa.array(list(labels), pa.string()),
            "embedding": list(emb.astype(np.float64)),
        }
    )
    got = (
        hard_negatives(ray.data.from_arrow(t).repartition(5), k=3)
        .to_pandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("embeddings", t)
    want = (
        con.execute(hard_negatives_oracle_sql("embeddings", k=3))
        .df()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])

    lab = dict(zip(range(n), labels))
    assert all(lab[r.vec_id] != lab[r.neighbor_id] for r in got.itertuples())
    top4 = got[(got["vec_id"] == 4) & (got["rank"] == 1)].iloc[0]
    assert top4["neighbor_id"] == 11 and top4["cosine"] == 1.0


def test_semantic_decontaminate_flags_planted_leak():
    import ray.data

    from dbt_customer360_ray.stages.decontaminate import semantic_decontaminate

    rng = np.random.default_rng(61)
    n, dim = 80, 16
    train_emb = rng.standard_normal((n, dim))
    eval_emb = rng.standard_normal((6, dim))
    train_emb[17] = eval_emb[2] * 1.5  # planted paraphrase-leak (cos 1.0)
    t = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(train_emb.astype(np.float64)),
        }
    )
    got = (
        semantic_decontaminate(
            ray.data.from_arrow(t).repartition(5),
            eval_emb, np.arange(100, 106, dtype=np.int64), threshold=0.95,
        )
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert got.loc[got["vec_id"] == 17, "eval_id"].tolist() == [102]
    assert (got["cosine"] >= 0.95).all()
    # layout independence
    again = semantic_decontaminate(
        ray.data.from_arrow(t), eval_emb,
        np.arange(100, 106, dtype=np.int64), threshold=0.95,
    ).to_pandas().sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, again)


def test_nb_classify_separable_domains_and_oracle_parity():
    import duckdb
    import ray.data

    from dbt_customer360_ray.stages.dsir import nb_classify, nb_oracle_sql

    rng = np.random.default_rng(67)
    vocabs = {
        "code": [f"fn{i}" for i in range(15)],
        "web": [f"ad{i}" for i in range(15)],
        "wiki": [f"ref{i}" for i in range(15)],
    }
    rows = []
    for i in range(210):
        src = ["code", "web", "wiki"][i % 3]
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(rng.choice(vocabs[src], size=int(rng.integers(5, 25)))),
                "source": src,
            }
        )
    docs = pa.Table.from_pylist(rows)

    got = (
        nb_classify(ray.data.from_arrow(docs).repartition(6), num_buckets=512)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", docs)
    want = (
        con.execute(nb_oracle_sql("documents", num_buckets=512))
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])

    # disjoint vocabularies are perfectly separable — self-train accuracy 100%
    actual = pd.Series([r["source"] for r in rows])
    assert (got["predicted"] == actual).all()


def test_label_propagate_seeds_keep_and_neighbors_vote():
    import duckdb
    import ray.data

    from dbt_customer360_ray.stages.similarity import (
        label_propagate,
        label_propagate_oracle_sql,
    )

    rng = np.random.default_rng(71)
    # three well-separated clusters => neighbours share the cluster label
    centers = np.eye(3) * 10
    n_per = 40
    emb, labels = [], []
    for c in range(3):
        emb.append(centers[c] + 0.1 * rng.standard_normal((n_per, 3)))
        labels.extend([c] * n_per)
    t = pa.table(
        {
            "vec_id": np.arange(3 * n_per, dtype=np.int64),
            "label": pa.array(labels, pa.int32()),
            "embedding": list(np.vstack(emb).astype(np.float64)),
        }
    )
    got = (
        label_propagate(ray.data.from_arrow(t).repartition(5), k=4)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("embeddings", t)
    want = (
        con.execute(label_propagate_oracle_sql("embeddings", k=4))
        .df()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])

    # seeds keep their label; non-seeds in tight clusters inherit it
    truth = pd.Series(labels, dtype="float64")
    resolved = got["propagated"].notna()
    assert resolved.mean() > 0.9
    assert (got.loc[resolved, "propagated"] == truth[resolved]).all()


def test_cluster_top_terms_matches_bruteforce_and_layout_independent():
    import ray.data

    from dbt_customer360_ray.stages.text import cluster_top_terms

    rng = np.random.default_rng(7)
    texts = _mk_texts(rng, 60, length=15)
    docs = _docs_ds(texts)
    # a planted 3-cluster assignment (cluster = doc_id mod 3) keyed vec_id
    assign_tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(60, dtype=np.int64)),
            "cluster": pa.array(np.arange(60, dtype=np.int64) % 3),
        }
    )
    assign = ray.data.from_arrow(assign_tbl).repartition(3)
    out = (
        cluster_top_terms(docs, assign, k=4)
        .to_pandas()
        .sort_values(["cluster", "rank"])
        .reset_index(drop=True)
    )
    # brute force in pandas
    rows = []
    for i, t in enumerate(texts):
        for w in t.split(" "):
            rows.append({"cluster": i % 3, "term": w})
    tf = (
        pd.DataFrame(rows).groupby(["cluster", "term"]).size().rename("tf").reset_index()
    )
    tf = tf.sort_values(["cluster", "tf", "term"], ascending=[True, False, True])
    want = tf.groupby("cluster").head(4).reset_index(drop=True)
    want["rank"] = want.groupby("cluster").cumcount() + 1
    for c in ["cluster", "tf", "rank"]:
        want[c] = want[c].astype(np.int64)
    pd.testing.assert_frame_equal(out, want[["cluster", "term", "tf", "rank"]])
    # layout independence
    again = (
        cluster_top_terms(docs.repartition(7), assign.repartition(1), k=4)
        .to_pandas()
        .sort_values(["cluster", "rank"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, again)


def test_grouped_row_number_matches_duckdb_across_blockings():
    import duckdb
    import ray.data

    from dbt_customer360_ray.stages.windows import grouped_row_number, with_grouped_ntile

    rng = np.random.default_rng(17)
    n = 400
    t = pa.table(
        {
            "id": pa.array(range(n), pa.int64()),
            "part": pa.array(rng.choice(["en", "de", "fr", "xx"], n)),
            "v": pa.array(rng.integers(0, 50, n), pa.int64()),  # heavy ties
        }
    )
    want = duckdb.sql(
        """
        SELECT id, part, v,
               CAST(row_number() OVER (PARTITION BY part ORDER BY v DESC, id) AS BIGINT) AS rn,
               CAST(ntile(3) OVER (PARTITION BY part ORDER BY v DESC, id) AS BIGINT) AS tile
        FROM t ORDER BY id
        """
    ).df()
    for nblocks in (1, 5, 23):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        numbered, totals = grouped_row_number(
            ds, "part", ["v", "id"], descending=[True, False]
        )
        got = numbered.to_pandas().sort_values("id").reset_index(drop=True)
        assert got["rn"].tolist() == want["rn"].tolist()
        assert totals == dict(want["part"].value_counts())
        tiled = (
            with_grouped_ntile(ds, 3, "part", ["v", "id"], descending=[True, False])
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        assert tiled["tile"].tolist() == want["tile"].tolist()


def test_priority_sample_weighted_and_layout_independent():
    import hashlib

    import ray.data

    from dbt_customer360_ray.stages.sampling import priority_sample

    n = 600
    # weights: ids < 100 are 50x heavier
    w = np.where(np.arange(n) < 100, 500, 10).astype(np.int64)
    t = pa.table({"doc_id": pa.array(np.arange(n, dtype=np.int64)), "w": pa.array(w)})
    ds = ray.data.from_arrow(t).repartition(8)
    out = priority_sample(ds, "doc_id", "w", k=50).to_pandas()
    assert len(out) == 50
    assert out["rank"].tolist() == list(range(1, 51))
    # brute force: same md5 grid, same division, same order
    u = np.array(
        [
            int(hashlib.md5(f"prio{v}".encode()).hexdigest()[:13], 16)
            for v in range(n)
        ],
        dtype=np.int64,
    )
    prio = w.astype(np.float64) / (u.astype(np.float64) + 1.0)
    want = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "w": w, "priority": prio})
    want = want.sort_values(["priority", "doc_id"], ascending=[False, True]).head(50)
    assert out["doc_id"].tolist() == want["doc_id"].tolist()
    assert (out["priority"].to_numpy() == want["priority"].to_numpy()).all()
    # heavy ids dominate the sample: 100/600 rows hold 50x weight
    assert (out["doc_id"] < 100).mean() > 0.6
    # layout independence
    again = priority_sample(ds.repartition(1), "doc_id", "w", k=50).to_pandas()
    pd.testing.assert_frame_equal(out, again)


def test_sample_quantiles_accuracy_and_layout_independence():
    import ray.data

    from dbt_customer360_ray.stages.sketches import sample_quantiles

    n = 20_000
    t = pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            # values ARE the 0..n-1 range shuffled: true q-quantile ≈ q·n
            "v": pa.array(np.random.default_rng(3).permutation(n).astype(np.int64)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(9)
    out = (
        sample_quantiles(ds, "id", "v", qs_permille=(100, 500, 900), k=512)
        .to_pandas()
        .set_index("q_permille")
    )
    assert (out["n_sample"] == 512).all()
    for qp in (100, 500, 900):
        # sampling error O(1/sqrt(k)) ~ 4.4% at k=512; allow 4 sigma
        assert abs(out.loc[qp, "value_est"] / n - qp / 1000) < 0.18
    again = (
        sample_quantiles(ds.repartition(2), "id", "v", qs_permille=(100, 500, 900), k=512)
        .to_pandas()
        .set_index("q_permille")
    )
    pd.testing.assert_frame_equal(out, again)


def test_pagerank_matches_duckdb_oracle_integer_exact():
    """PageRank over the k-NN graph: bit-exact vs the unrolled SQL mirror
    (integer floors everywhere), total mass conserved up to floor loss, and a
    planted hub (a direction many vectors share) ranks above the median."""
    import duckdb
    import ray.data

    from dbt_customer360_ray.stages.similarity import (
        pagerank,
        pagerank_oracle_sql,
    )

    rng = np.random.default_rng(71)
    n, dim = 80, 12
    emb = rng.standard_normal((n, dim))
    for i in range(1, 12):  # 11 vectors near vector 0's direction → 0 is a hub
        emb[i] = emb[0] + 0.01 * rng.standard_normal(dim)
    t = pa.table(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": list(emb.astype(np.float64)),
        }
    )
    got = (
        pagerank(ray.data.from_arrow(t).repartition(5), k=4, iters=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("embeddings", t)
    want = (
        con.execute(pagerank_oracle_sql("embeddings", k=4, iters=3))
        .df()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])

    scale = 10**9
    assert (got["pr_scaled"] > 0).all()
    # mass conservation: floors drop <1 unit per node per division
    assert 0.9 * scale <= got["pr_scaled"].sum() <= scale
    assert got["pr_scaled"].nunique() > 1  # structure, not a uniform vector
    hub = got.loc[got["vec_id"] == 0, "pr_scaled"].iloc[0]
    assert hub > got["pr_scaled"].median()
    # layout independence: same answer from a different partitioning
    again = (
        pagerank(ray.data.from_arrow(t), k=4, iters=3)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, again)


def test_temperature_mix_flattens_toward_uniform(ray_session):
    """alpha=0 keeps sources near-uniform, alpha=1000 keeps the natural
    distribution — the defining property of temperature sampling; and the
    kept set is invariant to input partitioning (id-stable md5 grid)."""
    import ray.data

    from dbt_customer360_ray.stages.sampling import temperature_mix

    rng = np.random.default_rng(23)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(13_000, dtype=np.int64),
            "source": (["big"] * 10_000 + ["mid"] * 2_500 + ["small"] * 500),
        }
    )
    ds = ray.data.from_pandas(df).repartition(6)

    nat = temperature_mix(ds, "doc_id", "source", alpha_pm=1000).to_pandas()
    flat = temperature_mix(ds, "doc_id", "source", alpha_pm=1).to_pandas()
    nat_share = nat["source"].value_counts(normalize=True)
    flat_share = flat["source"].value_counts(normalize=True)
    # natural: big dominates; near-zero alpha: shares approach uniform
    assert nat_share["big"] > 0.7
    assert abs(flat_share["small"] - 1 / 3) < 0.05
    assert abs(flat_share["big"] - 1 / 3) < 0.05
    # partition invariance: same kept ids at a different block layout
    again = (
        temperature_mix(
            ray.data.from_pandas(df).repartition(2), "doc_id", "source",
            alpha_pm=1,
        )
        .to_pandas()
    )
    assert sorted(again["doc_id"]) == sorted(flat["doc_id"])


def test_tree_reduce_fan_invariant_and_driver_bounded(ray_session):
    """blocks.tree_reduce: the reduced table is identical at any fan (merge
    tree shape must not matter for associative kernels), equals the naive
    global reduction, and handles empty blocks."""
    import pyarrow as pa
    import ray.data

    from dbt_customer360_ray.blocks import sum_kernel, topk_kernel, tree_reduce

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {"k": rng.integers(0, 50, 20_000), "v": rng.integers(1, 9, 20_000)}
    )
    ds = ray.data.from_pandas(df).repartition(17)
    partial = ds.map_batches(
        lambda b: b.groupby("k", as_index=False)["v"].sum(),
        batch_format="pandas",
    )
    want = df.groupby("k", as_index=False)["v"].sum()
    for fan in (2, 5, 32):
        got = (
            tree_reduce(partial, sum_kernel(["k"], ["v"]), fan=fan)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want.sort_values("k").reset_index(drop=True))

    # top-k kernel: merge of per-block top-k equals global top-k under the
    # shared total order, at any fan
    scored = ds.map_batches(
        lambda b: b.sort_values(["v", "k"], ascending=[False, True]).head(10),
        batch_format="pandas",
    )
    want_top = (
        df.sort_values(["v", "k"], ascending=[False, True], kind="stable")
        .head(10)
        .reset_index(drop=True)
    )
    for fan in (2, 32):
        got = (
            tree_reduce(scored, topk_kernel(["v", "k"], [False, True], 10), fan=fan)
            .to_pandas()
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want_top)

    # empty blocks: a filter that empties some blocks must not poison concat
    sparse = ds.map_batches(
        lambda b: b[b["k"] == 3].groupby("k", as_index=False)["v"].sum(),
        batch_format="pandas",
    )
    got = tree_reduce(sparse, sum_kernel(["k"], ["v"]), fan=4).to_pandas()
    assert got["v"].sum() == df.loc[df["k"] == 3, "v"].sum()


def test_tree_reduce_empty_corpus_returns_typed_empty(ray_session):
    """A zero-block dataset (r4 ADVICE): tree_reduce must return a pa.Table
    the call sites can .to_pandas() — with the kernel's output columns —
    not None; all-empty schemaless fan groups must not KeyError either."""
    import pyarrow as pa
    import ray.data

    from dbt_customer360_ray.blocks import sum_kernel, topk_kernel, tree_reduce

    empty = ray.data.from_items([])
    got = tree_reduce(empty, sum_kernel(["k"], ["v"])).to_pandas()
    assert len(got) == 0 and set(got.columns) >= {"k", "v"}
    top = tree_reduce(empty, topk_kernel(["v", "k"], [False, True], 5)).to_pandas()
    assert len(top) == 0 and set(top.columns) >= {"v", "k"}

    # schemaless empty blocks (zero-row, zero-column) through a real tree
    blanks = ray.data.from_arrow([pa.table({})] * 6)
    got2 = tree_reduce(blanks, sum_kernel(["k"], ["v"]), fan=2).to_pandas()
    assert len(got2) == 0 and set(got2.columns) >= {"k", "v"}
