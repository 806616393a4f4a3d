"""Event-time watermark audit (late_event_report): per-epoch late counts
against a naive pandas derivation from the same fixture files, plus the
semantics that matter — epoch 0 has no watermark, and lateness is judged
against the running max of STRICTLY PRIOR epochs."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from dbt_customer360_ray.pipelines.cdc_replay import (
    WATERMARK_LAG_S,
    changes_fixture,
    late_event_report,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_matches_naive_watermark_audit():
    fx = changes_fixture(0.001)
    got = late_event_report(sf=0.001).to_pandas()

    lag = np.timedelta64(WATERMARK_LAG_S, "s")
    run_max = None
    want = []
    for e, p in enumerate(fx["paths"]):
        ts = pq.read_table(p, columns=["ts"]).column("ts").to_numpy()
        wm = run_max - lag if run_max is not None else None
        late = int((ts < wm).sum()) if wm is not None else 0
        want.append((e, len(ts), late, wm))
        run_max = max(ts.max(), run_max) if run_max is not None else ts.max()

    assert got["epoch"].tolist() == [w[0] for w in want]
    assert got["events_in"].tolist() == [w[1] for w in want]
    assert got["late_events"].tolist() == [w[2] for w in want]
    assert pd.isna(got["watermark"].iloc[0])
    for i, w in enumerate(want[1:], start=1):
        assert got["watermark"].iloc[i] == pd.Timestamp(w[3])
    # the fixture's cross-epoch disorder must actually exercise the path
    assert sum(w[2] for w in want) > 0
