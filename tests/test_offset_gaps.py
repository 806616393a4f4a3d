"""Offset sequence-gap audit: the range-bucketed exchange must equal the
naive distinct-sort-diff derivation, including gaps that SPAN bucket
boundaries (exercised by forcing many narrow buckets)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from dbt_customer360_ray.pipelines.cdc_replay import (
    _gapped_epoch_path,
    changes_fixture,
    offset_gap_report,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _naive(paths):
    offs = np.unique(
        np.concatenate(
            [pq.read_table(p, columns=["offset"]).column("offset").to_numpy()
             for p in paths]
        )
    )
    d = np.diff(offs)
    at = np.nonzero(d > 1)[0]
    return sorted(zip(offs[at] + 1, offs[at + 1] - 1))


@pytest.mark.parametrize("target_buckets", [8, 4096])
def test_matches_naive_at_both_bucket_grains(target_buckets):
    fx = changes_fixture(0.001)
    paths = [
        fx["paths"][0],
        _gapped_epoch_path(fx["paths"][1]),
        fx["paths"][2],
        fx["paths"][3],
    ]
    got = offset_gap_report(sf=0.001, target_buckets=target_buckets).to_pandas()
    want = _naive(paths)
    assert want, "planted gaps must exist"
    assert list(zip(got["gap_start"], got["gap_end"])) == want
    assert (got["n_missing"] == got["gap_end"] - got["gap_start"] + 1).all()
