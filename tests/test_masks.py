"""Dynamic column masking: metadata-committed policies applied at every
serving read surface (read / read_as_of / lookup / lookup_many)."""

import hashlib

import pandas as pd
import pytest

from dbt_customer360_ray.gen import gen_changes, split_epochs
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")


def _lake(tmp_path, n=2_000, convs=120):
    import ray.data

    epochs = split_epochs(gen_changes(n, convs, seed=91), 2)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    for e in epochs:
        lake.apply(ray.data.from_arrow(e))
    return lake


def test_masks_apply_on_every_serving_surface(tmp_path):
    lake = _lake(tmp_path)
    plain = lake.read().to_pandas().sort_values(["conv_id", "turn_idx"])
    lake.add_mask("text", "hash")
    lake.add_mask("tool", "null")

    got = lake.read().to_pandas().sort_values(["conv_id", "turn_idx"])
    want_text = plain["text"].map(
        lambda v: None if v is None else hashlib.md5(v.encode()).hexdigest()
    )
    assert got["text"].tolist() == want_text.tolist()
    assert got["tool"].isna().all()
    # unmasked columns untouched
    assert got["role"].tolist() == plain["role"].tolist()

    conv = plain["conv_id"].iloc[0]
    lk = lake.lookup(conv).to_pandas()
    assert lk["tool"].isna().all()
    assert (
        lk["text"].dropna().map(len).eq(32).all()
    )  # md5 hex tokens, not raw text
    lm = lake.lookup_many([conv]).to_pandas()
    assert lm["tool"].isna().all() and lm["text"].dropna().map(len).eq(32).all()

    # time travel is masked too — policies cover history (the epoch-0
    # snapshot predates the tool column entirely; its mask is a no-op)
    tt = lake.read_as_of(epoch=0).to_pandas()
    assert "tool" not in tt.columns
    assert tt["text"].dropna().map(len).eq(32).all()

    # drop restores the plain read
    lake.drop_mask("text")
    lake.drop_mask("tool")
    back = lake.read().to_pandas().sort_values(["conv_id", "turn_idx"])
    pd.testing.assert_frame_equal(
        back.reset_index(drop=True), plain.reset_index(drop=True)
    )


def test_mask_validation(tmp_path):
    lake = _lake(tmp_path, n=300, convs=20)
    with pytest.raises(ValueError, match="mask kind"):
        lake.add_mask("text", "rot13")
    with pytest.raises(KeyError, match="unknown lake column"):
        lake.add_mask("nope", "null")
    with pytest.raises(ValueError, match="key column"):
        lake.add_mask("conv_id", "hash")
    with pytest.raises(ValueError, match="string column"):
        lake.add_mask("ts", "hash")
    with pytest.raises(KeyError, match="no mask"):
        lake.drop_mask("text")
    # replace-not-stack: re-adding a mask for the same column keeps one policy
    lake.add_mask("text", "hash")
    lake.add_mask("text", "null")
    assert lake.manifest.masks == [{"column": "text", "kind": "null"}]


def test_row_policies_serve_and_drop(tmp_path):
    lake = _lake(tmp_path)
    plain = lake.read().to_pandas()
    n_system = int((plain["role"] == "system").sum())
    assert n_system > 0

    lake.add_row_filter(
        {"name": "no_system", "column": "role", "op": "!=", "value": "system"}
    )
    got = lake.read().to_pandas()
    assert len(got) == len(plain) - n_system
    assert (got["role"] != "system").all()

    # lookup surfaces enforce the policy too
    conv = plain.loc[plain["role"] == "system", "conv_id"].iloc[0]
    lk = lake.lookup(conv).to_pandas()
    assert (lk["role"] != "system").all()
    lm = lake.lookup_many([conv]).to_pandas()
    assert (lm["role"] != "system").all()

    # stacked policies AND together; replace-by-name holds
    lake.add_row_filter(
        {"name": "no_system", "column": "role", "op": "in",
         "value": ["user", "assistant"]}
    )
    assert len(lake.manifest.row_filters) == 1
    got2 = lake.read().to_pandas()
    assert set(got2["role"]) <= {"user", "assistant"}

    lake.drop_row_filter("no_system")
    pd.testing.assert_frame_equal(
        lake.read().to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        plain.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
    )
    with pytest.raises(KeyError, match="no row policy"):
        lake.drop_row_filter("no_system")
    with pytest.raises(ValueError, match="fk"):
        lake.add_row_filter(
            {"name": "x", "column": "conv_id", "op": "fk",
             "value": {"ref_dir": "/tmp/nope"}}
        )


def test_purge_key_erases_everywhere(tmp_path):
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    lake = _lake(tmp_path)
    plain = lake.read().to_pandas()
    victim = plain["conv_id"].iloc[0]
    n_victim = int((plain["conv_id"] == victim).sum())
    assert n_victim > 0

    res = lake.purge_key(victim)
    assert res["rows_removed"] >= n_victim  # raw run rows ≥ converged rows
    assert res["runs_rewritten"] > 0

    # serving reads, lookups, time travel: gone
    got = lake.read().to_pandas()
    assert len(got) == len(plain) - n_victim
    assert victim not in set(got["conv_id"])
    assert lake.lookup(victim).num_rows == 0
    assert lake.lookup_many([victim]).count() == 0
    assert victim not in set(lake.read_as_of(epoch=0).to_pandas()["conv_id"])

    # producer surfaces too — erasure binds where governance masking doesn't
    assert victim not in set(
        lake.change_feed(
            from_version=0, to_version=lake.manifest.version
        ).to_pandas()["conv_id"]
    )
    assert victim not in set(
        lake.conversation_headers().to_pandas()["conv_id"]
    )
    assert victim not in set(
        lake.assemble_conversations().to_pandas()["conv_id"]
    )
    exp = str(tmp_path / "export")
    lake.export_snapshot(exp)
    for f in sorted((tmp_path / "export").glob("part-*.parquet")):
        t = pq.read_table(str(f), columns=["conv_id"])
        assert not pc.any(pc.equal(t.column("conv_id"), victim)).as_py()

    # physically absent from live runs; manifest still consistent
    for f in lake.manifest.live_files():
        t = pq.read_table(f, columns=["conv_id"])
        assert not pc.any(pc.equal(t.column("conv_id"), victim)).as_py()
    assert lake.fsck()["ok"]

    # everyone else untouched
    rest = plain[plain["conv_id"] != victim].reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        rest.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
    )


def test_redact_mask_scrubs_pii_on_serving_surfaces(tmp_path):
    import pyarrow as pa
    import ray.data

    lake = _lake(tmp_path, n=1_500, convs=90)
    st = lake.read().to_pandas()
    conv = st["conv_id"].iloc[0]
    # plant PII via an ordinary update epoch on one conversation
    upd = st[st.conv_id == conv].head(3).copy()
    upd["op"] = "U"
    upd["text"] = upd["text"].fillna("") + " mail a.b@x.io or call 415-555-0100"
    upd["ts"] = (upd["ts"] + pd.Timedelta(hours=1)).astype("datetime64[us]")
    upd["offset"] = 10_000_000 + pd.RangeIndex(len(upd))
    lake.apply(ray.data.from_arrow(pa.Table.from_pandas(
        upd[["offset", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]],
        preserve_index=False,
    )))
    lake.add_mask("text", "redact")

    got = lake.read().to_pandas()
    assert not got["text"].dropna().str.contains("a.b@x.io", regex=False).any()
    assert not got["text"].dropna().str.contains("415-555", regex=False).any()
    assert got["text"].dropna().str.contains("<EMAIL>").sum() == 3
    assert got["text"].dropna().str.contains("<PHONE>").sum() == 3
    # non-PII text is untouched (unlike hash/null masks)
    lk = lake.lookup(conv).to_pandas()
    assert lk["text"].dropna().str.contains("<EMAIL>").sum() == 3
    other = got[got.conv_id != conv]
    assert other["text"].dropna().map(len).gt(0).any()
    # drop restores raw PII
    lake.drop_mask("text")
    back = lake.read().to_pandas()
    assert back["text"].dropna().str.contains("a.b@x.io", regex=False).sum() == 3


def test_redact_mask_requires_string_column(tmp_path):
    lake = _lake(tmp_path, n=500, convs=40)
    with pytest.raises(ValueError, match="redact mask requires a string"):
        lake.add_mask("ts", "redact")
