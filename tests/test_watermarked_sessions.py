"""Watermark-finalized sessionization: the distributed bucket exchange must
equal a single-threaded pandas derivation of the same semantics (first-delivery
dedup → watermark admission → gap islands → finalization epoch), and the
fixture must exercise every arm (late exclusions, open sessions)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from dbt_customer360_ray.pipelines.cdc_replay import (
    SESSION_GAP_S,
    WATERMARK_LAG_S,
    changes_fixture,
    watermarked_sessions,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _naive(paths, gap_s=SESSION_GAP_S, lag_s=WATERMARK_LAG_S) -> pd.DataFrame:
    evs = []
    for e, p in enumerate(paths):
        t = pq.read_table(p, columns=["offset", "conv_id", "ts"]).to_pandas()
        t["epoch"] = e
        evs.append(t)
    ev = pd.concat(evs, ignore_index=True)
    wm = (
        ev.groupby("epoch")["ts"].max().sort_index().cummax()
        - pd.Timedelta(seconds=lag_s)
    ).to_numpy("datetime64[us]")
    first = ev.sort_values(["offset", "epoch"], kind="stable").drop_duplicates(
        "offset", keep="first"
    )
    ep = first["epoch"].to_numpy()
    ts = first["ts"].to_numpy("datetime64[us]")
    adm = first.loc[(ep == 0) | (ts >= wm[np.maximum(ep - 1, 0)])]
    rows = []
    for conv, g in adm.groupby("conv_id", sort=True):
        t = np.sort(g["ts"].to_numpy("datetime64[us]"))
        brk = np.concatenate(
            [[True], np.diff(t) > np.timedelta64(gap_s, "s")]
        )
        sid = np.cumsum(brk)
        for s in range(1, sid.max() + 1):
            seg = t[sid == s]
            end = seg.max()
            later = np.nonzero(wm > end + np.timedelta64(gap_s, "s"))[0]
            fin = int(later[0]) if len(later) else None
            rows.append((conv, s, len(seg), seg.min(), end, fin))
    return pd.DataFrame(
        rows,
        columns=[
            "conv_id", "session_idx", "n_events", "ts_start", "ts_end",
            "finalized_epoch",
        ],
    )


def test_matches_naive_and_exercises_all_arms():
    fx = changes_fixture(0.001)
    got = (
        watermarked_sessions(sf=0.001)
        .to_pandas()
        .sort_values(["conv_id", "session_idx"], kind="stable")
        .reset_index(drop=True)
    )
    want = (
        _naive(fx["paths"])
        .sort_values(["conv_id", "session_idx"], kind="stable")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["session_idx"].tolist() == want["session_idx"].tolist()
    assert got["n_events"].tolist() == want["n_events"].tolist()
    assert (
        got["ts_start"].to_numpy("datetime64[us]")
        == want["ts_start"].to_numpy("datetime64[us]")
    ).all()
    assert (
        got["ts_end"].to_numpy("datetime64[us]")
        == want["ts_end"].to_numpy("datetime64[us]")
    ).all()
    gf = got["finalized_epoch"].astype("Float64")
    wf = want["finalized_epoch"].astype("Float64")
    assert gf.where(gf.notna(), -1).tolist() == wf.where(wf.notna(), -1).tolist()
    # non-vacuous: the fixture stream must exercise both arms
    assert wf.isna().any(), "expected some sessions still open at stream end"
    assert wf.notna().any(), "expected some finalized sessions"
