"""Incrementally-maintained embedding-sketch (ANN) index — the semantic
sibling of the minhash index (r4 VERDICT Next #6): per-epoch dirty-key sketch
upserts equal from-scratch sketching, deletes propagate, backfill epochs never
land text on the driver, and clone conversations collide in the sign-bucket
near-dup serving path."""

import numpy as np
import pandas as pd
import pytest

from dbt_customer360_ray.gen import gen_changes, split_epochs
from dbt_customer360_ray.state.engine import CdcLake
from dbt_customer360_ray.state.views import (
    _ann_hexsigs,
    read_ann_sketch,
    sync_ann_index,
)

pytestmark = pytest.mark.usefixtures("ray_session")

PARAMS = {"dim": 64, "out_dim": 8, "seed": 29, "salt": "ann"}


def _replay(tmp_path, epochs, name="lake", P=8):
    import ray.data

    lake = CdcLake(str(tmp_path / name), num_partitions=P)
    for part in epochs:
        lake.apply(ray.data.from_arrow(part))
    return lake


def _scratch_sketches(lake) -> pd.DataFrame:
    docs = (
        lake.assemble_conversations()
        .to_pandas()
        .sort_values("conv_id", kind="stable")
        .reset_index(drop=True)
    )
    return pd.DataFrame(
        {
            "conv_id": docs["conv_id"].to_numpy(),
            "sig_hex": _ann_hexsigs(docs["sft_text"].to_numpy(), PARAMS),
        }
    )


def _index_sketches(dst) -> pd.DataFrame:
    return (
        dst.read(columns=["sig_hex"])
        .to_pandas()[["conv_id", "sig_hex"]]
        .sort_values("conv_id", kind="stable")
        .reset_index(drop=True)
    )


def test_index_equals_scratch_after_multi_epoch_sync(tmp_path):
    changes = gen_changes(5_000, 300, seed=81)
    src = _replay(tmp_path, split_epochs(changes, 3))
    dst = CdcLake(str(tmp_path / "index"), num_partitions=4)
    metrics = sync_ann_index(src, dst)
    assert len(metrics) == 3
    pd.testing.assert_frame_equal(_index_sketches(dst), _scratch_sketches(src))
    # resync is a no-op (epochs committed)
    assert sync_ann_index(src, dst) == []


def test_update_and_delete_propagate_incrementally(tmp_path):
    import pyarrow as pa
    import ray.data

    changes = gen_changes(4_000, 250, seed=83)
    src = _replay(tmp_path, split_epochs(changes, 2))
    dst = CdcLake(str(tmp_path / "index"), num_partitions=4)
    sync_ann_index(src, dst)
    before = _index_sketches(dst).set_index("conv_id")["sig_hex"]

    st = src.read_local_table().to_pandas()
    victim = st.conv_id.iloc[0]
    bystander = st.conv_id.iloc[-1]
    goner = st.conv_id.unique()[1]
    n_gone = int((st.conv_id == goner).sum())
    ev = pd.DataFrame(
        {
            "offset": 40_000_000 + np.arange(1 + n_gone),
            "op": ["U"] + ["D"] * n_gone,
            "conv_id": [victim] + [goner] * n_gone,
            "turn_idx": np.concatenate(
                [[st[st.conv_id == victim].turn_idx.iloc[0]],
                 st[st.conv_id == goner].turn_idx.to_numpy()]
            ).astype("int32"),
            "role": "user",
            "text": "entirely new text for the ann index test",
            "tool": None,
            "ts": pd.Timestamp("2025-07-01"),
        }
    )
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    src.apply(ray.data.from_arrow(pa.Table.from_pandas(ev, preserve_index=False)))
    m = sync_ann_index(src, dst)
    assert len(m) == 1
    after = _index_sketches(dst).set_index("conv_id")["sig_hex"]
    assert goner not in after.index  # all turns deleted → sketch dropped
    assert after[victim] != before[victim]  # text change re-sketched
    assert after[bystander] == before[bystander]  # clean conv untouched
    pd.testing.assert_frame_equal(_index_sketches(dst), _scratch_sketches(src))


def test_read_ann_sketch_long_format(tmp_path):
    changes = gen_changes(2_000, 120, seed=85)
    src = _replay(tmp_path, split_epochs(changes, 2))
    dst = CdcLake(str(tmp_path / "index"), num_partitions=4)
    sync_ann_index(src, dst)
    sk = read_ann_sketch(dst).to_pandas()
    n_convs = src.read_local_table().to_pandas().conv_id.nunique()
    assert len(sk) == n_convs * 8
    assert list(sk.columns) == ["conv_id", "proj_idx", "value"]
    assert sk["proj_idx"].dtype == np.int64 and sk["value"].dtype == np.int64
    assert set(sk["proj_idx"]) == set(range(8))
    # decode equals the direct kernel on the same assembled text
    want = _scratch_sketches(src)
    one = want.iloc[0]
    got = (
        sk[sk["conv_id"] == one["conv_id"]]
        .sort_values("proj_idx")["value"].to_numpy()
    )
    np.testing.assert_array_equal(
        got, np.frombuffer(bytes.fromhex(one["sig_hex"]), dtype="<i8")
    )


def test_backfill_epoch_never_materializes_text_on_driver(tmp_path, monkeypatch):
    """Bulk/backfill epoch (epoch 0 dirties EVERY conversation): the
    re-assembly + re-sketch must stream through workers — any driver-side
    ``Dataset.to_pandas`` is intercepted and must not carry a text/role
    column (the sync_minhash_index RSS-interception pattern, applied to the
    ANN sibling per the r4 VERDICT done-criterion)."""
    import ray.data

    changes = gen_changes(6_000, 400, seed=87)
    src = _replay(tmp_path, [changes])  # single bulk epoch: all convs dirty
    dst = CdcLake(str(tmp_path / "index"), num_partitions=4)

    real_to_pandas = ray.data.Dataset.to_pandas
    driver_cols: list[list[str]] = []

    def checked_to_pandas(self, *a, **kw):
        df = real_to_pandas(self, *a, **kw)
        driver_cols.append(list(df.columns))
        assert "text" not in df.columns and "role" not in df.columns, (
            f"driver materialized conversation payload: {list(df.columns)}"
        )
        return df

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", checked_to_pandas)
    metrics = sync_ann_index(src, dst)
    monkeypatch.setattr(ray.data.Dataset, "to_pandas", real_to_pandas)
    assert len(metrics) == 1
    assert driver_cols  # the dirty-id collection did go through the hook
    pd.testing.assert_frame_equal(_index_sketches(dst), _scratch_sketches(src))


def test_clone_convs_group_in_served_near_dups():
    """The planted ``-dup`` clones (identical text → identical sketch → same
    sign bucket, cosine 1000 permille) must group with their originals in the
    index-served semantic near-dup path."""
    from dbt_customer360_ray.pipelines.cdc_replay import (
        _DUP_CONVS,
        ann_index_near_dups,
    )

    got = ann_index_near_dups(sf=0.001)
    df = got.to_pandas() if hasattr(got, "to_pandas") else got
    groups = df.set_index("conv_id")["dup_group"]
    for c in _DUP_CONVS:
        assert groups.get(c) == groups.get(c + "-dup") == c
