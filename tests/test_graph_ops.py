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


def test_adamic_adar_cliques_have_no_open_wedges():
    from dbt_customer360_ray.stages.similarity import adamic_adar

    ds, _ = _clustered_ds()
    got = adamic_adar(ds, k=5).to_pandas()
    # K6 cliques: every wedge is closed, so no link is predicted
    assert len(got) == 0


def test_adamic_adar_open_wedges_score_by_centre_degree():
    """Star of 6 leaves + hub (orthogonal leaves, hub = mean direction):
    with k=5 the hub is every leaf's only strong neighbour, so leaf-leaf
    pairs are open wedges scored through shared centres."""
    import ray.data
    from dbt_customer360_ray.stages.similarity import adamic_adar, knn_graph

    rng_vecs = []
    ids = []
    base = np.zeros(8, np.float32)
    for j in range(6):
        v = np.zeros(8, np.float32)
        v[j] = 1.0
        v[7] = 0.2  # shared component pulls everyone toward the hub
        ids.append(j)
        rng_vecs.append(v.tolist())
    hub = np.zeros(8, np.float32)
    hub[7] = 1.0
    ids.append(99)
    rng_vecs.append(hub.tolist())
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(rng_vecs, pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(t)
    got = adamic_adar(ds, k=5).to_pandas()
    edges = knn_graph(ds, k=5).to_pandas()
    und = set(
        (min(a, b), max(a, b))
        for a, b in zip(edges.vec_id, edges.neighbor_id)
    )
    # every predicted pair is genuinely open, scores positive, and the exact
    # integer recomputation from degrees matches
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    import itertools

    expect = {}
    adjacency = {}
    for a, b in und:
        adjacency.setdefault(a, set()).add(b)
        adjacency.setdefault(b, set()).add(a)
    for c, nbs in adjacency.items():
        w = 10**12 // int(np.round(np.log(deg[c]) * 1_000_000))
        for a, b in itertools.combinations(sorted(nbs), 2):
            if (a, b) not in und:
                expect[(a, b)] = expect.get((a, b), 0) + w
    got_map = dict(zip(zip(got.id_a, got.id_b), got.aa_score))
    assert got_map == expect and len(expect) > 0
