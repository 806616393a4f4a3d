"""Flink-style temporal table join over the SCD2 history view: each probe
(key, as_of-epoch) gets the dimension version valid AT that epoch; absent or
deleted keys come back NULL with matched=false. Checked against a per-epoch
read_as_of re-derivation."""

import pandas as pd
import pytest

from dbt_customer360_ray.gen import gen_changes, split_epochs
from dbt_customer360_ray.state.engine import CdcLake
from dbt_customer360_ray.state.history import sync_history_view, temporal_join

pytestmark = pytest.mark.usefixtures("ray_session")

KEY = ["conv_id", "turn_idx"]


def _lake(tmp_path, n_epochs=4, P=8, seed=54):
    import ray.data

    changes = gen_changes(8_000, 500, seed=seed)
    epochs = split_epochs(changes, n_epochs)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=P)
    for part in epochs:
        lake.apply(ray.data.from_arrow(part))
    return lake, epochs


def _probe_ds(epochs, n_epochs):
    import pyarrow as pa
    import ray.data

    keys = (
        pd.concat([p.select(KEY).to_pandas() for p in epochs])
        .drop_duplicates(KEY)
        .reset_index(drop=True)
    )
    keys["as_of"] = (keys.turn_idx % n_epochs).astype("int32")
    return keys, ray.data.from_arrow(
        pa.Table.from_pandas(keys, preserve_index=False)
    )


def test_temporal_join_matches_per_epoch_snapshots(tmp_path):
    lake, epochs = _lake(tmp_path)
    view = str(tmp_path / "hist")
    sync_history_view(lake, view)
    keys, probes = _probe_ds(epochs, 4)
    got = (
        temporal_join(view, probes, src=lake)
        .to_pandas()
        .sort_values(KEY, kind="stable")
        .reset_index(drop=True)
    )
    assert len(got) == len(keys)
    # expected: read_as_of at each probed epoch, LEFT-joined per slice
    parts = []
    for e in range(4):
        snap = lake.read_as_of(epoch=e).to_pandas()
        sel = keys[keys.as_of == e]
        m = sel.merge(snap, on=KEY, how="left", indicator=True)
        m["matched"] = m.pop("_merge") == "both"
        parts.append(m)
    exp = (
        pd.concat(parts)
        .sort_values(KEY, kind="stable")
        .reset_index(drop=True)
    )
    if "tool" not in exp.columns:
        exp["tool"] = None
    for c in ["role", "text", "tool"]:
        pd.testing.assert_series_equal(
            got[c].fillna(""), exp[c].fillna(""), check_names=False,
            check_dtype=False,
        )
    pd.testing.assert_series_equal(
        got["matched"], exp["matched"], check_names=False, check_dtype=False
    )
    assert not got.matched.all()  # some keys genuinely absent at their epoch
    assert got.matched.any()
    # unmatched probes carry a fully-null payload
    un = got[~got.matched]
    assert un.role.isna().all() and un.text.isna().all() and un.ts.isna().all()


def test_deleted_key_is_null_after_deletion_epoch(tmp_path):
    import pyarrow as pa
    import ray.data

    lake, epochs = _lake(tmp_path)
    view = str(tmp_path / "hist")
    sync_history_view(lake, view)
    # find a key deleted in epoch 1 and live in epoch 0
    s0 = lake.read_as_of(epoch=0).to_pandas()
    s1 = lake.read_as_of(epoch=1).to_pandas()
    gone = s0.merge(s1[KEY], on=KEY, how="left", indicator=True)
    gone = gone[gone._merge == "left_only"]
    if gone.empty:
        pytest.skip("fixture produced no epoch-1 deletions")
    k = gone.iloc[0]
    probes = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([k.conv_id] * 2, pa.string()),
                "turn_idx": pa.array([int(k.turn_idx)] * 2, pa.int32()),
                "as_of": pa.array([0, 1], pa.int32()),
            }
        )
    )
    got = temporal_join(view, probes, src=lake).to_pandas()
    got = got.sort_values("as_of").reset_index(drop=True)
    assert len(got) == 2
    assert bool(got.matched[0]) and got.text[0] == k.text
    assert not bool(got.matched[1]) and pd.isna(got.text[1])
