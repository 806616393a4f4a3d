"""Sequence packing (stages/packing): md5-bucketed next-fit into fixed
token-budget bins — checked against a naive single-threaded derivation, plus
the invariants an egress relies on (budget respected except oversize-alone,
contiguous bin ids, cluster-size/layout invariance)."""

import numpy as np
import pandas as pd
import pytest

from dbt_customer360_ray.stages.packing import _md5_mod, pack_next_fit

pytestmark = pytest.mark.usefixtures("ray_session")

BUDGET = 100
BUCKETS = 8


def _docs(n=400, seed=7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    toks = rng.integers(1, 60, n).astype(np.int64)
    toks[:5] = [150, 101, 100, 99, 1]  # oversize + boundary cases
    return pd.DataFrame(
        {"doc_id": [f"d{i:05d}" for i in range(n)], "n_tokens": toks}
    )


def _naive(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df["bucket"] = _md5_mod(df["doc_id"].to_numpy(dtype=object), "pack", BUCKETS)
    rows = []
    for b, g in df.groupby("bucket", sort=True):
        g = g.sort_values("doc_id", kind="stable")
        bin_idx, fill, pos = 0, 0, 0
        for r in g.itertuples():
            if fill and fill + r.n_tokens > BUDGET:
                bin_idx, fill, pos = bin_idx + 1, 0, 0
            fill += r.n_tokens
            rows.append((r.doc_id, r.n_tokens, b, bin_idx, pos, fill))
            pos += 1
    return pd.DataFrame(
        rows,
        columns=["doc_id", "n_tokens", "bucket", "bin_idx", "pos_in_bin", "bin_fill"],
    )


def _packed(df: pd.DataFrame, **kw) -> pd.DataFrame:
    import ray.data

    ds = ray.data.from_pandas(df)
    out = pack_next_fit(
        ds, "doc_id", "n_tokens", BUDGET, num_buckets=BUCKETS, **kw
    )
    return (
        out.to_pandas()
        .sort_values(["bucket", "bin_idx", "pos_in_bin"], kind="stable")
        .reset_index(drop=True)
    )


def test_matches_naive_next_fit():
    df = _docs()
    got = _packed(df)
    want = (
        _naive(df)
        .sort_values(["bucket", "bin_idx", "pos_in_bin"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=True)


def test_invariants_and_layout_invariance():
    import ray.data

    df = _docs(n=300, seed=11)
    got = _packed(df)
    # every doc packed exactly once
    assert sorted(got["doc_id"]) == sorted(df["doc_id"])
    per_bin = got.groupby(["bucket", "bin_idx"])
    sums = per_bin["n_tokens"].sum()
    sizes = per_bin.size()
    # a bin over budget must be a single oversize doc
    over = sums[sums > BUDGET]
    assert (sizes.loc[over.index] == 1).all()
    # bin ids contiguous from 0 per bucket
    for b, g in got.groupby("bucket"):
        assert sorted(g["bin_idx"].unique()) == list(range(g["bin_idx"].max() + 1))
    # partition-layout invariance: 1 block vs many blocks, same assignment
    ds_many = ray.data.from_pandas(df).repartition(13)
    got2 = (
        pack_next_fit(ds_many, "doc_id", "n_tokens", BUDGET, num_buckets=BUCKETS)
        .to_pandas()
        .sort_values(["bucket", "bin_idx", "pos_in_bin"], kind="stable")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)
