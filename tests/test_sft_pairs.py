"""merged_turns (consecutive same-role coalescing) and context_pairs
(next-turn-prediction training pairs) over the conv-partitioned lake — both
shuffle-free per-partition kernels, checked against naive pandas derivations
of the same converged state."""

import pandas as pd
import pytest

from dbt_customer360_ray.gen import gen_changes, split_epochs
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")


def _lake(tmp_path, n=3_000, convs=150, seed=17):
    import ray.data

    epochs = split_epochs(gen_changes(n, convs, seed=seed), 2)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    for e in epochs:
        lake.apply(ray.data.from_arrow(e))
    return lake


def _state(lake) -> pd.DataFrame:
    return (
        lake.read()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )


def _naive_merged(st: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for conv, g in st.groupby("conv_id", sort=True):
        cur = None
        for r in g.itertuples():
            role = r.role if isinstance(r.role, str) else None
            text = r.text if isinstance(r.text, str) else ""
            if cur is not None and cur["role"] == role:
                cur["text"] += "\n" + text
                cur["n_merged"] += 1
                cur["ts"] = max(cur["ts"], r.ts)
            else:
                if cur is not None:
                    rows.append(cur)
                cur = {
                    "conv_id": conv, "turn_idx": r.turn_idx, "role": role,
                    "text": text, "n_merged": 1, "ts": r.ts,
                }
        if cur is not None:
            rows.append(cur)
    return pd.DataFrame(rows)


def _naive_pairs(st: pd.DataFrame, k: int) -> pd.DataFrame:
    rows = []
    for conv, g in st.groupby("conv_id", sort=True):
        lines = [
            (r.role if isinstance(r.role, str) else "")
            + ": "
            + (r.text if isinstance(r.text, str) else "")
            for r in g.itertuples()
        ]
        for i, r in enumerate(g.itertuples()):
            if r.role != "assistant" or i == 0:
                continue
            ctx = "\n".join(lines[max(0, i - k) : i])
            rows.append(
                {
                    "conv_id": conv, "turn_idx": r.turn_idx, "context": ctx,
                    "target": r.text if isinstance(r.text, str) else "",
                }
            )
    return pd.DataFrame(rows)


def test_merged_turns_matches_naive(tmp_path):
    lake = _lake(tmp_path)
    st = _state(lake)
    got = (
        lake.merged_turns()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    want = _naive_merged(st).reset_index(drop=True)
    # the fixture produces runs of equal roles (roles cycle over a hash), so
    # the op must actually merge somewhere — guard against a vacuous pass
    assert (got["n_merged"] > 1).any()
    assert got["n_merged"].sum() == len(st)
    pd.testing.assert_frame_equal(
        got, want[got.columns].astype(got.dtypes.to_dict()), check_like=False
    )


def test_merged_turns_alternates_roles(tmp_path):
    lake = _lake(tmp_path, seed=23)
    got = lake.merged_turns().to_pandas().sort_values(
        ["conv_id", "turn_idx"], kind="stable"
    )
    # after coalescing, no two adjacent turns of a conversation share a role
    same = (got["conv_id"] == got["conv_id"].shift()) & (
        got["role"].fillna("\x00") == got["role"].shift().fillna("\x00")
    )
    assert not same.any()


def test_context_pairs_matches_naive(tmp_path):
    lake = _lake(tmp_path)
    st = _state(lake)
    for k in (1, 4):
        got = (
            lake.context_pairs(k=k)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )
        want = _naive_pairs(st, k).reset_index(drop=True)
        assert len(got) > 0
        pd.testing.assert_frame_equal(
            got, want[got.columns].astype(got.dtypes.to_dict())
        )
    # every pair's context holds at most k lines
    assert got["context"].str.count("\n").max() <= 4 - 1


def test_near_dup_convs_groups_planted_clones():
    from dbt_customer360_ray.pipelines.cdc_replay import (
        _DUP_CONVS,
        near_dup_convs_lake,
    )

    got = near_dup_convs_lake(sf=0.001)
    df = got.to_pandas() if hasattr(got, "to_pandas") else got
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    g = dict(zip(df["conv_id"], df["dup_group"]))
    for c in _DUP_CONVS:
        # each planted clone pairs with its original; the group label is the
        # least member, which is the original id
        assert g.get(c + "-dup") == g.get(c) == c
