"""connected_components: distributed min-label propagation vs a local
union-find oracle on random graphs, plus edge shapes (chains, stars,
singleton-free input)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from raydoc.functions.graph import connected_components


def _union_find(edges):
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    nodes = {x for e in edges for x in e}
    return {x: find(x) for x in nodes}


@pytest.mark.parametrize("seed", [1, 2])
def test_components_match_union_find(ray_session, seed):
    rng = np.random.RandomState(seed)
    n = 400
    edges = [(int(a), int(b)) for a, b in rng.randint(0, n, (300, 2))
             if a != b]
    want = _union_find(edges)
    ds = rd.from_arrow(pa.table({
        "a": pa.array([e[0] for e in edges], pa.int64()),
        "b": pa.array([e[1] for e in edges], pa.int64())}))
    got = connected_components(ds, num_buckets=8).to_pandas()
    got_map = dict(zip(got["node"], got["label"]))
    assert got_map == want


def test_components_long_chain(ray_session):
    """A 60-node path graph needs ~diameter rounds — exercises the
    iteration loop well past one or two rounds."""
    edges = [(i, i + 1) for i in range(60)]
    ds = rd.from_arrow(pa.table({
        "a": pa.array([e[0] for e in edges], pa.int64()),
        "b": pa.array([e[1] for e in edges], pa.int64())}))
    got = connected_components(ds, num_buckets=4, max_iters=100).to_pandas()
    assert set(got["label"]) == {0}
    assert len(got) == 61


def test_components_max_iters_guard(ray_session):
    edges = [(i, i + 1) for i in range(30)]
    ds = rd.from_arrow(pa.table({
        "a": pa.array([e[0] for e in edges], pa.int64()),
        "b": pa.array([e[1] for e in edges], pa.int64())}))
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(ds, num_buckets=4, max_iters=2)


def test_neardup_components_regimes_agree(ray_session):
    """The driver union-find fast path and the distributed CC path label
    identically (both converge to the component-minimum label)."""
    from raydoc.functions.graph import neardup_components
    sf = "/root/testdata/sf0.001"
    fast = neardup_components(sf)                      # union-find regime
    dist = neardup_components(sf, max_driver_pairs=0)  # force distributed
    assert fast.equals(dist)


@pytest.mark.parametrize("seed", [5, 6])
def test_bfs_distributed_matches_driver(ray_session, seed):
    """Round-synchronous distributed BFS equals the driver BFS on a
    random graph: same reached set, same min hop counts, hop cap honored."""
    import numpy as np
    from raydoc.functions.graph import _bfs_hops_driver, bfs_hops_distributed

    rng = np.random.default_rng(seed)
    n = 60
    a = rng.integers(0, n, 120)
    b = rng.integers(0, n, 120)
    keep = a != b
    edges = list({(min(x, y), max(x, y))
                  for x, y in zip(a[keep].tolist(), b[keep].tolist())})
    seeds = sorted({int(x) for x in rng.integers(0, n, 4)})
    max_hops = 3

    exp = _bfs_hops_driver(edges, set(seeds), max_hops)

    eds = rd.from_arrow(pa.table({
        "a": pa.array([e[0] for e in edges], pa.int64()),
        "b": pa.array([e[1] for e in edges], pa.int64())}))
    sds = rd.from_arrow(pa.table({"node": pa.array(seeds, pa.int64())}))
    got_t = bfs_hops_distributed(eds, sds, max_hops, num_buckets=4)
    got = {r["node"]: r["hops"] for r in got_t.take_all()}
    assert got == exp
    assert max(got.values()) <= max_hops


def test_neardup_hops_regimes_agree(ray_session):
    """The driver-BFS fast path and the distributed frontier path return
    identical hop tables on the real near-dup graph."""
    from raydoc.functions.graph import neardup_hops
    sf = "/root/testdata/sf0.001"
    fast = neardup_hops(sf)
    dist = neardup_hops(sf, max_driver_pairs=0)   # force distributed
    assert fast.equals(dist)


def test_dbscan_core_border_noise(ray_session, tmp_path):
    """Hand-built geometry: a 3-core cluster, one border point reachable
    from exactly one core, one noise point. Labels are the component-min
    core id; border inherits it; noise is -1."""
    import numpy as np
    import pyarrow.parquet as pq
    from raydoc.functions.graph import embedding_dbscan

    def unit(deg):
        r = np.radians(deg)
        return [float(np.cos(r)), float(np.sin(r))]

    # cos >= 0.4 within ~66.4 degrees
    vecs = [unit(0), unit(-5), unit(-10),   # mutually-close cores 0,1,2
            unit(65),                        # border: only core 0 in range
            unit(150)]                       # noise: nothing in range
    t = pa.table({
        "vec_id": pa.array(range(5), pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0] * 5, pa.int32()),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = embedding_dbscan(str(tmp_path)).to_pandas()
    assert list(out["label"]) == [0, 0, 0, 0, -1]
    assert list(out["is_core"]) == [1, 1, 1, 0, 0]


def _kcore_brute(edges, k):
    """Independent reference: repeatedly drop any node with degree < k
    until a fixed point (set-algebra, no peeling queue)."""
    nodes = {x for e in edges for x in e}
    while True:
        deg = {n: 0 for n in nodes}
        for a, b in edges:
            if a in nodes and b in nodes:
                deg[a] += 1
                deg[b] += 1
        keep = {n for n in nodes if deg[n] >= k}
        if keep == nodes:
            return nodes
        nodes = keep


def test_kcore_driver_matches_brute_force():
    import numpy as np

    from raydoc.functions.graph import _k_core_driver

    rng = np.random.default_rng(3)
    for trial in range(25):
        n = int(rng.integers(4, 40))
        m = int(rng.integers(3, 80))
        edges = {tuple(sorted(p)) for p in
                 rng.integers(0, n, (m, 2)).tolist() if p[0] != p[1]}
        for k in (1, 2, 3):
            assert _k_core_driver(list(edges), k) == \
                _kcore_brute(edges, k), (trial, k)


def test_kcore_distributed_matches_driver(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from raydoc.functions.graph import _k_core_driver, k_core

    rng = np.random.default_rng(9)
    edges = {tuple(sorted(p)) for p in
             rng.integers(0, 60, (150, 2)).tolist() if p[0] != p[1]}
    t = pa.table({"a": pa.array([a for a, _ in sorted(edges)], pa.int64()),
                  "b": pa.array([b for _, b in sorted(edges)], pa.int64())})
    for k in (2, 3, 4):
        dist = k_core(rd.from_arrow(t), k=k, num_buckets=4)
        assert set(dist.column("node").to_pylist()) == \
            _k_core_driver(list(edges), k), k


def test_kcore_empty_and_full(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from raydoc.functions.graph import k_core

    # a triangle is its own 2-core; k=3 peels it away entirely
    tri = pa.table({"a": pa.array([1, 1, 2], pa.int64()),
                    "b": pa.array([2, 3, 3], pa.int64())})
    assert k_core(rd.from_arrow(tri), k=2).column(
        "node").to_pylist() == [1, 2, 3]
    assert k_core(rd.from_arrow(tri), k=3).num_rows == 0


def test_neardup_kcore_nonvacuous(ray_session):
    from raydoc.functions.graph import neardup_kcore, neardup_triangles

    core = neardup_kcore("/root/testdata/sf0.01")
    tris = neardup_triangles("/root/testdata/sf0.01")
    members = set(core.column("vec_id").to_pylist())
    # every triangle vertex sits in the 2-core
    for c in ("a", "b", "c"):
        assert set(tris.column(c).to_pylist()) <= members
    assert len(members) > 0


@pytest.mark.parametrize("seed", [7, 21])
def test_sssp_distributed_matches_driver(ray_session, seed):
    """Round-synchronous distributed Bellman-Ford equals the driver
    Bellman-Ford on a random weighted digraph: same reached set, same
    min costs, round cap honored (paths needing more edges than
    ``rounds`` stay at their bounded-length optimum)."""
    import numpy as np

    from raydoc.functions.graph import _sssp_driver, sssp_distributed

    rng = np.random.default_rng(seed)
    n = 50
    a = rng.integers(0, n, 150)
    b = rng.integers(0, n, 150)
    w = rng.integers(1, 100, 150)
    keep = a != b
    edges = list({(int(x), int(y), int(z)) for x, y, z
                  in zip(a[keep], b[keep], w[keep])})
    seeds = sorted({int(x) for x in rng.integers(0, n, 3)})
    for rounds in (1, 3, 8):
        exp = _sssp_driver(edges, set(seeds), rounds)
        eds = rd.from_arrow(pa.table({
            "a": pa.array([e[0] for e in edges], pa.int64()),
            "b": pa.array([e[1] for e in edges], pa.int64()),
            "w": pa.array([e[2] for e in edges], pa.int64())}))
        sds = rd.from_arrow(pa.table({
            "node": pa.array(seeds, pa.int64())}))
        got = {r["node"]: r["dist"] for r in sssp_distributed(
            eds, sds, rounds, num_buckets=4).take_all()}
        assert got == exp, rounds


def test_sssp_round_cap_is_path_length_bound(ray_session):
    """On a pure chain with a costly shortcut, round k must report the
    best cost among paths of ≤ k edges — not the converged optimum."""
    from raydoc.functions.graph import _sssp_driver

    # 0 → 1 → 2 → 3 each cost 1; direct 0 → 3 cost 10
    edges = [(0, 1, 1), (1, 2, 1), (2, 3, 1), (0, 3, 10)]
    assert _sssp_driver(edges, {0}, 1)[3] == 10
    assert _sssp_driver(edges, {0}, 2)[3] == 10
    assert _sssp_driver(edges, {0}, 3)[3] == 3


def test_knn_geodesic_regimes_agree(ray_session):
    """The driver Bellman-Ford fast path and the distributed
    round-synchronous path return identical geodesic tables on the
    real k-NN graph."""
    from raydoc.functions.graph import knn_geodesic

    sf = "/root/testdata/sf0.001"
    fast = knn_geodesic(sf)
    dist = knn_geodesic(sf, max_driver_edges=0)   # force distributed
    assert fast.equals(dist)
    # seeds are zero-distance, non-seeds strictly positive
    rows = {r["vec_id"]: r["dist"] for r in fast.to_pylist()}
    assert all(d == 0 for v, d in rows.items() if v % 50 == 0)
    assert all(d > 0 for v, d in rows.items() if v % 50 != 0)


def test_label_propagation_regimes_agree(ray_session):
    """The driver fast path and the distributed join+argmax path return
    identical community tables on the real embedding knn graph."""
    from raydoc.functions.graph import label_propagation
    sf = "/root/testdata/sf0.001"
    fast = label_propagation(sf)
    dist = label_propagation(sf, max_driver_edges=0)
    assert fast.equals(dist)


def test_label_propagation_two_blobs(ray_session, tmp_path):
    """Two well-separated embedding blobs converge to two communities,
    each labeled by its smallest member id."""
    import numpy as np
    import pyarrow.parquet as pq
    from raydoc.functions.graph import label_propagation
    rng = np.random.RandomState(3)
    a = rng.standard_normal((12, 8)) * 0.05 + 5.0
    b = rng.standard_normal((12, 8)) * 0.05 - 5.0
    emb = np.vstack([a, b]).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(24), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in emb],
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(24, np.int32), pa.int32()),
    }), tmp_path / "embeddings.parquet")
    got = label_propagation(str(tmp_path), k=3).to_pandas()
    comm = dict(zip(got["vec_id"], got["community"]))
    # synchronous LP may keep sub-communities inside a blob, but no
    # community ever spans the two separated blobs, and every label is
    # a member id of its own blob
    left = {comm[i] for i in range(12)}
    right = {comm[i] for i in range(12, 24)}
    assert left.isdisjoint(right)
    assert all(0 <= l < 12 for l in left)
    assert all(12 <= l < 24 for l in right)
