"""Planted-structure properties for the k-NN-graph ops (BFS hops, triangles).

Three 6-vector orthogonal clusters with k=5 make each cluster an exact K6
clique and leave NO cross-cluster edges — so degree/triangles/lcc and BFS
reachability have closed-form expected values. The sf0.001 oracle equivalence
runs in tests/test_analytics_oracle.py like every other driver entry.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from dbt_customer360_ray.stages.sampling import _bucket_of
from dbt_customer360_ray.stages.similarity import bfs_hops, triangle_stats

pytestmark = pytest.mark.usefixtures("ray_session")

C, SZ = 3, 6  # clusters x vectors per cluster


def _clustered_ds():
    import ray.data

    ids, vecs = [], []
    for c in range(C):
        base = np.zeros(8, np.float32)
        base[c] = 1.0
        for j in range(SZ):
            ids.append(c * 100 + j)
            vecs.append(base.tolist())
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(t), np.array(ids, np.int64)


def test_triangle_stats_planted_cliques():
    ds, ids = _clustered_ds()
    got = triangle_stats(ds, k=5).to_pandas().sort_values("vec_id")
    # every cluster is a K6: degree 5, C(5,2)=10 triangles, lcc exactly 1
    assert len(got) == C * SZ
    assert (got["degree"] == 5).all()
    assert (got["triangles"] == 10).all()
    assert (got["lcc_pm"] == 1000).all()


def test_bfs_hops_planted_reachability():
    ds, ids = _clustered_ds()
    got = bfs_hops(ds, k=5, max_hops=3, seed_permille=500).to_pandas()
    seeds = set(ids[_bucket_of(ids, "bfs") < 500])
    assert seeds and seeds != set(ids)  # the planted ids split both ways
    seeded_clusters = {i // 100 for i in seeds}
    want = {i for i in ids if i // 100 in seeded_clusters}
    assert set(got["vec_id"]) == want  # cross-cluster never reached
    hop = dict(zip(got["vec_id"], got["hops"]))
    for i in want:
        assert hop[i] == (0 if i in seeds else 1)  # cliques: one hop max


def test_bfs_hops_degenerate_seed_sets():
    ds, ids = _clustered_ds()
    all_seed = bfs_hops(ds, k=5, max_hops=2, seed_permille=1000).to_pandas()
    assert len(all_seed) == len(ids) and (all_seed["hops"] == 0).all()
    none_seed = bfs_hops(ds, k=5, max_hops=2, seed_permille=0).to_pandas()
    assert len(none_seed) == 0


def test_triangle_counts_globally_consistent():
    ds, _ = _clustered_ds()
    got = triangle_stats(ds, k=5).to_pandas()
    # each triangle is counted once per corner
    assert got["triangles"].sum() % 3 == 0
    pd.testing.assert_series_equal(
        got["lcc_pm"],
        (2000 * got["triangles"]) // (got["degree"] * (got["degree"] - 1)),
        check_names=False,
    )
