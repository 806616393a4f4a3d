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


def test_fk_constraint_quarantines_unknown_parents(tmp_path):
    """Referential integrity across lakes: children whose conv_id is absent
    from the parent lake's live state quarantine as fk:<name>; the converged
    child equals the oracle over only the admitted events."""
    import ray.data

    from dbt_customer360_ray.gen import split_epochs

    changes = gen_changes(4_000, 250, seed=46)
    epochs = split_epochs(changes, 4)
    parent = CdcLake(str(tmp_path / "parent"), num_partitions=4)
    parent.apply(ray.data.from_arrow(epochs[0]))  # parent universe = epoch 0
    pdf = pd.DataFrame(oracle_lake(epochs[0]))
    known = set(pdf["conv_id"])

    child = CdcLake(str(tmp_path / "child"), num_partitions=8)
    child.add_fk_constraint("conv_known", "conv_id", parent.lake_dir,
                            validate=False)
    for e in epochs:
        child.apply(ray.data.from_arrow(e))

    df = changes.to_pandas()
    bad = df["op"].isin(["I", "U"]) & ~df["conv_id"].isin(known)
    assert int(bad.sum()) > 0
    dlq = child.read_deadletter().to_pandas()
    assert len(dlq) == int(bad.sum())
    assert set(dlq["offset"]) == set(df.loc[bad, "offset"])
    assert set(dlq["dl_reason"]) == {"fk:conv_known"}

    # expected state: the SAME epoch tables (epoch 0 is schema v0 — no tool)
    # minus the FK-rejected events, through the reference oracle
    def admit(t: pa.Table) -> pa.Table:
        e = t.to_pandas()
        rej = e["op"].isin(["I", "U"]) & ~e["conv_id"].isin(known)
        return pa.Table.from_pandas(e[~rej], preserve_index=False, schema=t.schema)

    want = pd.DataFrame(
        oracle_lake(*[admit(e) for e in epochs])
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    got = (
        child.read().to_pandas()
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_fk_resolution_tracks_parent_commits(tmp_path):
    """A parent commit invalidates the resolved key set: children rejected
    before the parent lands are admitted on a later apply (check-at-apply)."""
    import numpy as np
    import ray.data

    def ev(off, conv, turn, ts):
        return pa.table({
            "offset": pa.array([off], pa.int64()),
            "op": pa.array(["I"], pa.string()),
            "conv_id": pa.array([conv], pa.string()),
            "turn_idx": pa.array([turn], pa.int32()),
            "role": pa.array(["user"], pa.string()),
            "text": pa.array(["x"], pa.string()),
            "tool": pa.array([None], pa.string()),
            "ts": pa.array([np.datetime64(ts, "us")], pa.timestamp("us")),
        })

    parent = CdcLake(str(tmp_path / "parent"), num_partitions=2)
    parent.apply(ray.data.from_arrow(ev(1, "cA", 0, "2025-01-01T00:00:00")))
    child = CdcLake(str(tmp_path / "child"), num_partitions=2)
    child.add_fk_constraint("fk", "conv_id", parent.lake_dir, validate=False)
    m = child.apply(ray.data.from_arrow(ev(10, "cB", 0, "2025-01-01T00:01:00")))
    assert m["events_quarantined"] == 1  # cB unknown
    parent.apply(ray.data.from_arrow(ev(2, "cB", 0, "2025-01-01T00:02:00")))
    m = child.apply(ray.data.from_arrow(ev(11, "cB", 1, "2025-01-01T00:03:00")))
    assert m["events_quarantined"] == 0  # parent landed; new child admitted
    # validated ADD refuses when live rows violate
    other = CdcLake(str(tmp_path / "other"), num_partitions=2)
    other.apply(ray.data.from_arrow(ev(1, "cZ", 0, "2025-01-01T00:00:00")))
    with pytest.raises(ValueError, match="existing live rows"):
        other.add_fk_constraint("fk", "conv_id", parent.lake_dir)


def test_fsck_counts_constraint_violations(tmp_path):
    import ray.data

    changes = gen_changes(1_000, 80, seed=47)
    lake = CdcLake(str(tmp_path / "lake"), num_partitions=4)
    lake.apply(ray.data.from_arrow(changes))
    # clean lake, no constraints → zero violations reported
    assert lake.fsck(check_constraints=True)["constraint_violations"] == 0
    # a validate=False ADD over dirty data → fsck surfaces the live violations
    lake.add_check_constraint(
        "role_allowed", "role", "in", ["user", "assistant", "system"],
        validate=False,
    )
    live = lake.read_local_table().to_pandas()
    dirty = int((live["role"] == "tool").sum())
    assert dirty > 0
    rep = lake.fsck(check_constraints=True)
    assert rep["constraint_violations"] == dirty
    assert rep["ok"]  # structural integrity unaffected
