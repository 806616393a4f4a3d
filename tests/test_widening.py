"""Type-widening evolution end to end: int32 score runs cast up losslessly
at read after a later epoch widens the column to int64."""

import pytest

from dbt_customer360_ray.pipelines.cdc_replay import widened_lake

pytestmark = pytest.mark.usefixtures("ray_session")

INT32_MAX = 2**31 - 1


def test_widened_column_serves_both_eras():
    got = widened_lake(sf=0.001).to_pandas()
    s = got["score"]
    assert str(s.dtype) in ("float64", "Int64", "int64")  # int64 w/ nulls
    live = s.dropna()
    # the widening is load-bearing: post-widen values exceed int32 range
    assert (live > INT32_MAX).any()
    # and int32-era rows still serve (values within the narrow range,
    # multiples-of-5e9 excluded so they are provably from the narrow epoch)
    narrow = live[(live <= INT32_MAX) & (live % 5_000_000_000 != 0)]
    assert len(narrow) > 0
    # rows from before the column existed serve NULL
    assert s.isna().any()
