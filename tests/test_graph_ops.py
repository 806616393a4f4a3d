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


def _clustered_embeddings(n_clusters=4, per=60, dim=64, spread=0.004, seed=29):
    """Well-separated unit-vector clusters: every point is a tiny angular
    perturbation of its cluster centre, so within-cluster cosines ≈ 1 and
    cross-cluster cosines are far below — the planted-community fixture."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs, labels = [], []
    for c in range(n_clusters):
        pts = centers[c] + spread * rng.standard_normal((per, dim))
        vecs.append(pts / np.linalg.norm(pts, axis=1, keepdims=True))
        labels.extend([c] * per)
    emb = np.concatenate(vecs).astype(np.float64)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(len(emb), dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(emb.reshape(-1)), dim
            ).cast(pa.list_(pa.float64())),
            "label": pa.array(np.array(labels, dtype=np.int64)),
        }
    )


def test_knn_graph_lsh_identical_communities_on_planted_clusters():
    """The bucketed scale path must reproduce the exact graph's community
    structure on clustered data: label propagation over knn_graph_lsh edges
    equals label propagation over exact knn_graph edges (VERDICT r3 Next #3).
    Tight clusters make LSH recall effectively 1 within clusters, so the
    neighbourhoods — and hence the propagated communities — coincide."""
    import ray.data

    from dbt_customer360_ray.stages.similarity import (
        knn_graph,
        knn_graph_lsh,
        label_propagate,
    )

    tbl = _clustered_embeddings()
    df = tbl.to_pandas()
    ds = ray.data.from_arrow(tbl).repartition(4)

    exact_edges = knn_graph(ds, k=5)
    lsh_edges = knn_graph_lsh(ds, k=5, dim=64)

    def communities(edges):
        out = (
            label_propagate(ds, k=5, seed_permille=500, edges=edges)
            .to_pandas()
            .sort_values("vec_id", kind="stable")
            .reset_index(drop=True)
        )
        return out

    got_lsh = communities(lsh_edges)
    got_exact = communities(exact_edges)
    pd.testing.assert_frame_equal(got_lsh, got_exact)
    # propagated labels recover the planted clusters wherever assigned
    truth = df.set_index("vec_id")["label"]
    assigned = got_lsh.dropna(subset=["propagated"])
    assert len(assigned) > 0.9 * len(df)
    assert (
        assigned["propagated"].to_numpy()
        == truth.loc[assigned["vec_id"]].to_numpy()
    ).all()


def test_knn_graph_lsh_edges_feed_graph_family_unchanged():
    """bfs_hops/triangle_stats consume the LSH edge table via edges= with no
    reshaping; on planted clusters the hop structure matches the exact graph."""
    import ray.data

    from dbt_customer360_ray.stages.similarity import knn_graph, knn_graph_lsh

    ds = ray.data.from_arrow(_clustered_embeddings(seed=31)).repartition(4)
    exact_edges = knn_graph(ds, k=5)
    lsh_edges = knn_graph_lsh(ds, k=5, dim=64)

    def norm(d):
        d = d.to_pandas()
        return d.sort_values(list(d.columns), kind="stable").reset_index(drop=True)

    pd.testing.assert_frame_equal(
        norm(bfs_hops(ds, k=5, max_hops=2, seed_permille=60, edges=lsh_edges)),
        norm(bfs_hops(ds, k=5, max_hops=2, seed_permille=60, edges=exact_edges)),
    )
    pd.testing.assert_frame_equal(
        norm(triangle_stats(ds, k=5, edges=lsh_edges)),
        norm(triangle_stats(ds, k=5, edges=exact_edges)),
    )
