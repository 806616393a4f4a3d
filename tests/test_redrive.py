"""DLQ redrive (retry_deadletter after DROP CONSTRAINT): the redriven lake
must contain turns whose only deliveries were quarantined, and the drained
DLQ must stay empty on a second read."""

import pytest

from dbt_customer360_ray.pipelines.cdc_replay import (
    CHECK_CONSTRAINTS,
    _REDRIVEN,
    constrained_lake,
    redriven_lake,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_redrive_restores_quarantined_turns():
    got = redriven_lake(sf=0.001).to_pandas()
    constrained = constrained_lake(sf=0.001).read().to_pandas()
    # every constrained-state turn survives the redrive
    keys = lambda df: set(zip(df["conv_id"], df["turn_idx"]))
    assert keys(constrained) <= keys(got)
    # and the redrive added turns that only ever arrived as violators
    extra = keys(got) - keys(constrained)
    assert extra, "expected quarantined-only turns to appear after redrive"
    # violating payloads are now served (e.g. roles outside the allowed set)
    allowed = set(CHECK_CONSTRAINTS[0]["value"])
    assert (~got["role"].isin(allowed) & got["role"].notna()).any()
    # the DLQ stays drained
    assert _REDRIVEN[0.001].read_deadletter().num_rows == 0
