"""Corpus-curation pipeline: filter semantics + the resumable sharded sink."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dbt_customer360_ray.pipelines import curate as C

pytestmark = pytest.mark.usefixtures("ray_session")

GOOD_EN = (
    "the quick brown fox and the lazy dog are walking to the park with a "
    "team of good friends for a long day of games and food and fun"
)


def _docs() -> pa.Table:
    rows = [
        (0, GOOD_EN),            # kept
        (1, GOOD_EN),            # exact dup of 0 → dropped (keeper = min id)
        (2, "!!! ### $$$ %%%"),  # no language markers → 'und' → dropped
        (3, "the !!!! ???? ####"),  # identified (en) but low quality → dropped
        (4, GOOD_EN + " extra words about the weather and the sea today"),  # kept
    ]
    return pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string())}
    )


def test_curate_filters():
    import ray.data

    out = C.curate_documents(ray.data.from_arrow(_docs())).to_pandas()
    assert sorted(out["doc_id"]) == [0, 4]
    assert (out["lang_pred"] == "en").all()
    assert (out["quality_score"] >= 0.5).all()


def test_curate_semi_join_fallback_matches_broadcast():
    """broadcast_keeper_ids=0 forces the bucketed-hash-semi-join keeper test
    (the scale path): identical curated rows to the broadcast membership."""
    import ray.data

    def norm(ds):
        return (
            ds.to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)[["doc_id", "lang_pred", "quality_score"]]
        )

    base = norm(C.curate_documents(ray.data.from_arrow(_docs())))
    joined = norm(
        C.curate_documents(ray.data.from_arrow(_docs()), broadcast_keeper_ids=0)
    )
    pd.testing.assert_frame_equal(base, joined)


def test_fineweb_audit_verdicts():
    """Every input doc appears exactly once; verdict columns match the stage
    semantics on a hand-built corpus (Gopher needs ≥50 words, so the good
    docs are long); kept == AND of the verdicts."""
    import ray.data

    # ≥50 mostly-distinct words: clears Gopher AND the repetition filters
    good = (
        "the quick brown fox jumped over one lazy dog while seven children "
        "walked slowly to school past green fields and tall trees as birds "
        "sang in the bright morning air near a quiet river where old boats "
        "drifted gently toward the small wooden bridge that villagers "
        "crossed each day carrying fresh bread with ripe fruit for home"
    )
    rows = [
        (0, good),                       # kept
        (1, good),                       # exact dup of 0 → keeper = min id
        (2, "!!! ### $$$ %%%"),          # no language markers → 'und'
        (3, GOOD_EN),                    # en but <50 words → gopher fail
        (4, ("the dog and " * 20).strip()),  # en, 60 words, repetition fail
        (5, good.replace("fox", "cat")),     # near-dup of 0 → not keeper
    ]
    docs = pa.table(
        {"doc_id": pa.array([r[0] for r in rows], pa.int64()),
         "text": pa.array([r[1] for r in rows], pa.string())}
    )
    out = (
        C.fineweb_audit(ray.data.from_arrow(docs))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [0, 1, 2, 3, 4, 5]
    assert list(out["ok_lang"]) == [True, True, False, True, True, True]
    assert list(out["is_exact_keeper"]) == [True, False, True, True, True, True]
    assert not bool(out.loc[3, "gopher_pass"])  # under the 50-word floor
    assert bool(out.loc[4, "gopher_pass"])
    assert not bool(out.loc[4, "ok_repetition"])
    assert not bool(out.loc[5, "is_near_dup_keeper"])  # member, rep is doc 0
    conj = (
        out["ok_lang"] & out["gopher_pass"] & out["ok_repetition"]
        & out["is_exact_keeper"] & out["is_near_dup_keeper"]
    )
    assert (out["kept"] == conj).all()
    assert bool(out.loc[0, "kept"])
    assert not out.loc[[1, 2, 3, 4, 5], "kept"].any()


def test_write_curated_resumes(tmp_path):
    import ray.data

    n = 500
    df = pd.DataFrame(
        {"doc_id": np.arange(n, dtype=np.int64),
         "text": [f"doc number {i}" for i in range(n)]}
    )
    out_dir = str(tmp_path / "curated")
    stats = C.write_curated(
        ray.data.from_pandas(df), out_dir, num_shards=8
    ).to_pandas()
    assert sorted(stats["shard"]) == list(range(8))
    assert stats["rows"].sum() == n
    full = C.read_curated(out_dir).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(full.reset_index(drop=True), df)

    # simulate a crashed run: one shard lost its marker + data
    lost = int(stats["shard"].iloc[0])
    os.remove(os.path.join(out_dir, f"_SUCCESS.{lost}"))
    os.remove(os.path.join(out_dir, f"shard={lost:05d}", "part.parquet"))
    mtimes = {
        d: os.path.getmtime(os.path.join(out_dir, d, "part.parquet"))
        for d in os.listdir(out_dir)
        if d.startswith("shard=") and d != f"shard={lost:05d}"
    }

    stats2 = C.write_curated(
        ray.data.from_pandas(df), out_dir, num_shards=8
    ).to_pandas()
    # only the lost shard was rewritten
    assert sorted(stats2["shard"]) == [lost]
    for d, m in mtimes.items():
        assert os.path.getmtime(os.path.join(out_dir, d, "part.parquet")) == m
    full2 = C.read_curated(out_dir).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(full2.reset_index(drop=True), df)
