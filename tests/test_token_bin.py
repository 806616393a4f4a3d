"""Indexed-binary token egress: parse-back equals the flat encoding,
re-runs are byte-identical, crash-resume completes missing shards only."""

import glob
import hashlib
import os

import pandas as pd
import pytest

from dbt_customer360_ray.sources.readers import read_table
from dbt_customer360_ray.sources.sinks import export_token_bin, read_token_bin
from dbt_customer360_ray.stages.text import (
    build_vocab,
    encode_documents,
    encode_documents_flat,
)

pytestmark = pytest.mark.usefixtures("ray_session")

SF_DIR = "/root/testdata/sf0.001"
KEY = ["doc_id", "ord"]


def _docs():
    return read_table(SF_DIR, "documents", columns=["doc_id", "text"])


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(KEY, kind="stable").reset_index(drop=True)


def _dir_md5(d: str) -> dict:
    return {
        os.path.basename(p): hashlib.md5(open(p, "rb").read()).hexdigest()
        for p in sorted(glob.glob(os.path.join(d, "*")))
    }


def test_parse_back_equals_flat_encoding(tmp_path):
    ds = _docs()
    vocab = build_vocab(ds)
    dest = str(tmp_path / "out")
    manifest = export_token_bin(encode_documents(ds, vocab), dest)
    got = _norm(read_token_bin(dest).to_pandas())
    want = _norm(encode_documents_flat(ds, vocab).to_pandas())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert manifest["docs"] == want.doc_id.nunique()
    assert manifest["tokens"] == len(want)


def test_rerun_is_byte_identical_and_resume_fills_gaps(tmp_path):
    ds = _docs()
    vocab = build_vocab(ds)
    enc = encode_documents(ds, vocab)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    export_token_bin(enc, a)
    export_token_bin(enc, b)
    assert _dir_md5(a) == _dir_md5(b)  # deterministic layout end-to-end
    # crash-resume: lose one shard + the manifest, re-export completes it
    os.remove(os.path.join(b, "shard-00003.bin"))
    os.remove(os.path.join(b, "shard-00003.idx.parquet"))
    os.remove(os.path.join(b, "_SUCCESS"))
    m = export_token_bin(enc, b)
    resumed = [s for s in m["shards"] if s["resumed"]]
    assert len(resumed) == m["num_shards"] - 1  # only the gap was rewritten
    assert _dir_md5(a) == _dir_md5(b)
