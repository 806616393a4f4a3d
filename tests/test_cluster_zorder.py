"""OPTIMIZE ZORDER on the lake: content unchanged, and the rewrite turns the
existing per-run ts stats + key blooms into real intra-partition skipping."""

import pandas as pd
import pytest

from dbt_customer360_ray.gen import gen_changes, oracle_lake, split_epochs
from dbt_customer360_ray.state.engine import CdcLake

pytestmark = pytest.mark.usefixtures("ray_session")


def _replay(tmp_path, epochs, name="lake", P=8):
    import ray.data

    lake = CdcLake(str(tmp_path / name), num_partitions=P)
    for part in epochs:
        lake.apply(ray.data.from_arrow(part))
    return lake


def test_cluster_zorder_content_unchanged(tmp_path):
    changes = gen_changes(6_000, 400, seed=23)
    epochs = split_epochs(changes, 3)
    lake = _replay(tmp_path, epochs)
    n = lake.cluster_zorder(rows_per_file=64)
    assert n > 0
    got = (
        lake.read_local_table()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    want = oracle_lake(*epochs)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)
    # history records the layout operation as its own commit kind
    hist = lake.describe_history().to_pandas()
    assert "CLUSTER" in set(hist["operation"])


def test_cluster_zorder_enables_intra_partition_skipping(tmp_path):
    changes = gen_changes(8_000, 500, seed=29)
    epochs = split_epochs(changes, 4)

    # baseline: full compaction — one base run per partition, nothing for the
    # per-run stats or blooms to skip inside a partition
    base = _replay(tmp_path, epochs, name="base")
    base.compact(force=True, policy="full")
    clus = _replay(tmp_path, epochs, name="clus")
    clus.cluster_zorder(rows_per_file=64)

    ts = changes.column("ts").to_pandas()
    cutoff = ts.quantile(0.9)

    def pruned_ts(lake):
        plan = lake.explain_read(since_ts=cutoff).to_pandas()
        return int(plan["pruned_by_ts"].sum()), plan

    base_pruned, base_plan = pruned_ts(base)
    clus_pruned, clus_plan = pruned_ts(clus)
    assert base_pruned == 0  # one fat base per partition straddles all time
    assert clus_pruned > 0  # time-local z-order files drop out on stats alone
    # both plans still cover the same max surviving state
    assert clus_pruned > base_pruned

    # point lookup: blooms prune the other-key files only after clustering
    conv = changes.column("conv_id")[0].as_py()
    base_bloom = base.explain_read(conv_ids=[conv], probe_blooms=True).to_pandas()
    clus_bloom = clus.explain_read(conv_ids=[conv], probe_blooms=True).to_pandas()
    assert int(clus_bloom["pruned_by_bloom"].sum()) > int(
        base_bloom["pruned_by_bloom"].sum()
    )
    # the plan is honest: the since-read returns exactly the rows the full
    # state filter would
    got = clus.read(since_ts=cutoff).to_pandas()
    want = base.read(since_ts=cutoff).to_pandas()
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        got.sort_values(key, kind="stable").reset_index(drop=True)[want.columns.tolist()],
        want.sort_values(key, kind="stable").reset_index(drop=True),
        check_dtype=False,
    )


def test_cluster_zorder_then_ingest_and_recluster(tmp_path):
    """Clustering is not terminal: later epochs append normally and a second
    OPTIMIZE folds them in; content tracks the oracle throughout."""
    changes = gen_changes(5_000, 300, seed=31)
    epochs = split_epochs(changes, 4)
    lake = _replay(tmp_path, epochs[:2])
    lake.cluster_zorder(rows_per_file=64)
    import ray.data

    for part in epochs[2:]:
        lake.apply(ray.data.from_arrow(part))
    lake.cluster_zorder(rows_per_file=64)
    got = (
        lake.read_local_table()
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    want = oracle_lake(*epochs)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want, check_dtype=False)
