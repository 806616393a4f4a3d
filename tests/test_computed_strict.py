"""Generated columns (derived at ingest, stored with the row) and strict
schema mode (reject unknown producer columns instead of auto-evolving)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dbt_customer360_ray.state.computed import apply_computed, validate_computed
from dbt_customer360_ray.state.engine import CdcLake
from dbt_customer360_ray.state.streaming import StreamingSession

pytestmark = pytest.mark.usefixtures("ray_session")

TS0 = pd.Timestamp("2025-01-01")


def _ev(rows, start_offset=0, extra=None):
    """rows: (op, conv, turn, text)"""
    t = pa.table(
        {
            "offset": pa.array(
                np.arange(start_offset, start_offset + len(rows), dtype=np.int64)
            ),
            "op": pa.array([r[0] for r in rows]),
            "conv_id": pa.array([r[1] for r in rows]),
            "turn_idx": pa.array([r[2] for r in rows], pa.int32()),
            "text": pa.array([r[3] for r in rows]),
            "ts": pa.array([TS0 + pd.Timedelta(seconds=i) for i in range(len(rows))]),
        }
    )
    if extra:
        for name, vals in extra.items():
            t = t.append_column(name, pa.array(vals))
    return t


def test_kernels_match_specs():
    t = pa.table({"text": ["Hello World", "", None, "a-b_c 9"]})
    specs = [
        validate_computed({"name": "n", "kind": "length", "source": "text"}),
        validate_computed({"name": "lc", "kind": "lower", "source": "text"}),
        validate_computed({"name": "tok", "kind": "token_count", "source": "text"}),
    ]
    out = apply_computed(t, specs).to_pandas()
    assert out["n"].tolist()[:2] == [11, 0] and pd.isna(out["n"][2])
    assert out["lc"][0] == "hello world" and pd.isna(out["lc"][2])
    assert out["tok"].tolist()[:2] == [2, 0] and out["tok"][3] == 4


def test_computed_columns_epoch_and_streaming_paths(tmp_path):
    import ray.data

    rows = [("I", "a", 0, "Hello There"), ("I", "b", 0, "x y z"), ("D", "a", 1, None)]
    for path in ("epoch", "stream"):
        lake = CdcLake(str(tmp_path / path), num_partitions=2)
        lake.add_computed_column("n_tokens", "token_count", "text")
        lake.add_computed_column("text_lc", "lower", "text")
        if path == "epoch":
            lake.apply(ray.data.from_arrow(_ev(rows)))
        else:
            sess = StreamingSession(lake, pool_size=2)
            sess.ingest(_ev(rows))
            sess.checkpoint()
            sess.close()
        df = lake.read().to_pandas().sort_values("conv_id").reset_index(drop=True)
        assert df["n_tokens"].tolist() == [2, 3]
        assert df["text_lc"].tolist() == ["hello there", "x y z"]
        with pytest.raises(ValueError, match="already exists"):
            lake.add_computed_column("n_tokens", "length", "text")


def test_producer_values_for_computed_column_are_overwritten(tmp_path):
    import ray.data

    lake = CdcLake(str(tmp_path / "lake"), num_partitions=2)
    lake.add_computed_column("n_chars", "length", "text")
    t = _ev([("I", "a", 0, "abc")], extra={"n_chars": [999]})
    lake.apply(ray.data.from_arrow(t))
    assert lake.read().to_pandas()["n_chars"].tolist() == [3]


def test_drop_computed_column_stops_derivation(tmp_path):
    import ray.data

    lake = CdcLake(str(tmp_path / "lake"), num_partitions=2)
    lake.add_computed_column("n_chars", "length", "text")
    lake.apply(ray.data.from_arrow(_ev([("I", "a", 0, "abc")])))
    lake.drop_computed_column("n_chars")
    lake.apply(ray.data.from_arrow(_ev([("I", "b", 0, "wxyz")], start_offset=5)))
    df = lake.read().to_pandas().sort_values("conv_id").reset_index(drop=True)
    # old row keeps its stored value; new row's column is null (not derived)
    assert df["n_chars"].tolist()[0] == 3 and pd.isna(df["n_chars"][1])


@pytest.mark.parametrize("path", ["epoch", "stream"])
def test_strict_mode_rejects_unknown_columns(tmp_path, path):
    import ray.data

    lake = CdcLake(str(tmp_path / path), num_partitions=2, schema_mode="strict")
    first = _ev([("I", "a", 0, "hi")])
    drift = _ev([("I", "b", 0, "yo")], start_offset=5, extra={"surprise": ["?"]})
    if path == "epoch":
        lake.apply(ray.data.from_arrow(first))
        with pytest.raises(ValueError, match="unknown columns.*surprise"):
            lake.apply(ray.data.from_arrow(drift))
    else:
        sess = StreamingSession(lake, pool_size=2)
        sess.ingest(first)
        with pytest.raises(ValueError, match="unknown columns.*surprise"):
            sess.ingest(drift)
        sess.checkpoint()
        sess.close()
    # reopen: schema_mode persisted in CONFIG.json
    again = CdcLake(str(tmp_path / path), num_partitions=2)
    assert again.schema_mode == "strict"


def test_strict_mode_allows_computed_columns(tmp_path):
    import ray.data

    lake = CdcLake(str(tmp_path / "lake"), num_partitions=2, schema_mode="strict")
    lake.apply(ray.data.from_arrow(_ev([("I", "a", 0, "hi there")])))
    lake.add_computed_column("n_tokens", "token_count", "text")
    lake.apply(ray.data.from_arrow(_ev([("I", "b", 0, "x y")], start_offset=5)))
    df = lake.read().to_pandas().sort_values("conv_id").reset_index(drop=True)
    assert pd.isna(df["n_tokens"][0]) and df["n_tokens"][1] == 2


def test_backfill_rewrites_history_only_and_vacuums(tmp_path):
    import os

    import ray.data

    from dbt_customer360_ray.gen import gen_changes, split_epochs

    epochs = split_epochs(gen_changes(3_000, 150, seed=37), 3)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    lake.apply(ray.data.from_arrow(epochs[0]))
    lake.apply(ray.data.from_arrow(epochs[1]))
    lake.add_computed_column("text_len", "length", "text")
    lake.apply(ray.data.from_arrow(epochs[2]))

    pre = lake.read().to_pandas()
    assert pre["text_len"].isna().any()  # history predates the declaration

    runs_before = sum(
        len(lake.manifest.partition(p)["runs"]) for p in range(lake.P)
    )
    m = lake.backfill_computed()
    assert 0 < m["runs_rewritten"] < runs_before  # post-declaration runs skipped

    got = lake.read().to_pandas()
    want = got["text"].str.len()
    assert (
        got["text_len"].astype("float64").fillna(-1).to_numpy()
        == want.astype("float64").fillna(-1).to_numpy()
    ).all()

    # idempotent: a second backfill rewrites nothing
    assert lake.backfill_computed()["runs_rewritten"] == 0
    # the swap is compaction-shaped: vacuum reclaims replaced files, fsck clean
    assert lake.vacuum() >= m["runs_rewritten"]
    assert lake.fsck()["ok"]


def test_backfill_evolves_schema_without_new_epochs(tmp_path):
    import ray.data

    from dbt_customer360_ray.gen import gen_changes

    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply(ray.data.from_arrow(gen_changes(800, 60, seed=41)))
    lake.add_computed_column("text_lower", "lower", "text")
    # no post-declaration apply: backfill itself must land the column
    m = lake.backfill_computed()
    assert m["runs_rewritten"] > 0
    df = lake.read().to_pandas()
    assert "text_lower" in df.columns
    assert df["text_lower"].dropna().eq(
        df["text"].dropna().str.lower()
    ).all()
