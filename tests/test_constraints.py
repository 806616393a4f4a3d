"""Table constraints (CHECK / NOT NULL): declared in the manifest, enforced
vectorized at every apply — violating change events quarantine to the DLQ with
``chk:<name>`` reasons instead of reaching a partition (the engine analogue of
the reference's accepted_values / not_null dbt tests gating staged models)."""

import pandas as pd
import pyarrow as pa
import pytest

from dbt_customer360_ray.gen import gen_changes, oracle_lake
from dbt_customer360_ray.state.constraints import (
    keep_sql,
    predicate_sql,
    validate_spec,
    violation_any,
)
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")


def test_spec_validation_rejects_bad_specs():
    with pytest.raises(ValueError):
        validate_spec({"name": "x", "column": "c", "op": "between"})
    with pytest.raises(ValueError):
        validate_spec({"name": "x", "column": "c", "op": "in", "value": []})
    with pytest.raises(ValueError):
        validate_spec({"name": "x", "column": "c", "op": ">"})  # no value
    s = validate_spec({"name": "x", "column": "c", "op": "not_null"})
    assert s == {"name": "x", "column": "c", "op": "not_null"}


def test_check_null_passes_false_violates():
    t = pa.table(
        {
            "op": ["I", "U", "D", "I", "P"],
            "role": ["user", "weird", None, "tool", "weird"],
        }
    )
    spec = validate_spec(
        {"name": "r", "column": "role", "op": "in", "value": ["user", "assistant"]}
    )
    # D exempt; NULL passes (SQL CHECK); P rows bind comparison constraints
    assert violation_any(t, [spec]).tolist() == [False, True, False, True, True]


def test_not_null_skips_patch_rows():
    t = pa.table({"op": ["I", "P", "U"], "text": [None, None, "x"]})
    spec = validate_spec({"name": "t", "column": "text", "op": "not_null"})
    assert violation_any(t, [spec]).tolist() == [True, False, False]


@pytest.mark.parametrize("exchange", [True, False])
def test_constraint_violations_quarantined(tmp_path, exchange):
    import ray.data

    changes = gen_changes(3_000, 200, seed=43)
    lake = CdcLake(str(tmp_path / f"lake-{exchange}"), num_partitions=8,
                   exchange=exchange)
    lake.add_check_constraint(
        "role_allowed", "role", "in", ["user", "assistant", "system"]
    )
    m = lake.apply(ray.data.from_arrow(changes))

    df = changes.to_pandas()
    bad = df["op"].isin(["I", "U"]) & df["role"].notna() & (df["role"] == "tool")
    assert m["events_quarantined"] == int(bad.sum()) > 0

    # converged state equals the oracle over only the passing events
    want = oracle_lake(pa.Table.from_pandas(df[~bad], preserve_index=False))
    got = (
        lake.read().to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    want = pd.DataFrame(want).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)

    dlq = lake.read_deadletter().to_pandas()
    assert len(dlq) == int(bad.sum())
    assert set(dlq["dl_reason"]) == {"chk:role_allowed"}


def test_streaming_path_enforces_constraints(tmp_path):
    """The streaming tail must quarantine the same rows the epoch path does —
    constraint enforcement is a lake property, not an ingest-path property."""
    import numpy as np

    from dbt_customer360_ray.state.streaming import StreamingSession

    changes = gen_changes(3_000, 200, seed=43)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=8)
    lake.add_check_constraint(
        "role_allowed", "role", "in", ["user", "assistant", "system"]
    )
    sess = StreamingSession(lake, pool_size=2)
    bounds = np.linspace(0, changes.num_rows, 5).astype(int)
    for i in range(4):
        sess.ingest(changes.slice(bounds[i], bounds[i + 1] - bounds[i]))
        if i % 2 == 1:
            sess.checkpoint()
    sess.checkpoint()
    sess.close()

    df = changes.to_pandas()
    bad = df["op"].isin(["I", "U"]) & df["role"].notna() & (df["role"] == "tool")
    assert int(bad.sum()) > 0

    want = oracle_lake(pa.Table.from_pandas(df[~bad], preserve_index=False))
    got = (
        lake.read().to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    want = pd.DataFrame(want).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)

    dlq = lake.read_deadletter().to_pandas()
    assert len(dlq) == int(bad.sum())
    assert set(dlq["dl_reason"]) == {"chk:role_allowed"}


def test_add_constraint_validates_existing_state(tmp_path):
    import ray.data

    changes = gen_changes(1_000, 80, seed=44)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply(ray.data.from_arrow(changes))
    # the fixture has role='tool' live rows → validated ADD must refuse
    with pytest.raises(ValueError, match="existing live rows"):
        lake.add_check_constraint(
            "role_allowed", "role", "in", ["user", "assistant", "system"]
        )
    # unvalidated ADD commits; future applies enforce it
    v = lake.add_check_constraint(
        "role_allowed", "role", "in", ["user", "assistant", "system"],
        validate=False,
    )
    assert v == lake.manifest.version
    with pytest.raises(ValueError, match="already exists"):
        lake.add_check_constraint("role_allowed", "turn_idx", ">=", 0)


def test_drop_constraint_and_restore_rolls_back(tmp_path):
    import ray.data

    changes = gen_changes(800, 60, seed=45)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply(ray.data.from_arrow(changes))  # epoch 0, unconstrained
    lake.add_check_constraint("turn_nonneg", "turn_idx", ">=", 0)
    assert [c["name"] for c in lake.manifest.constraints] == ["turn_nonneg"]
    lake.drop_constraint("turn_nonneg")
    assert lake.manifest.constraints == []
    with pytest.raises(KeyError):
        lake.drop_constraint("turn_nonneg")
    # RESTORE to the epoch-0 snapshot rolls the (then-empty) set back — and a
    # post-restore reader sees no constraints either way; re-adding works
    lake.restore(epoch=0)
    assert lake.manifest.constraints == []
    lake.add_check_constraint("turn_nonneg", "turn_idx", ">=", 0)
    assert [c["name"] for c in lake.manifest.constraints] == ["turn_nonneg"]


def test_sql_translation_matches_kernels():
    import duckdb

    t = pa.table(
        {
            "op": ["I"] * 6,
            "text": ["", "hello", None, "x", "multi\nline", "??"],
        }
    )
    spec = validate_spec(
        {"name": "text_nonempty", "column": "text", "op": "matches", "value": "."}
    )
    viol_py = violation_any(t, [spec]).tolist()
    keep = keep_sql([spec])
    kept_sql = duckdb.sql(
        f"SELECT NOT ({keep}) AS viol FROM t"
    ).df()["viol"].fillna(False).tolist()
    assert viol_py == kept_sql
    assert "regexp_matches" in predicate_sql(spec)
