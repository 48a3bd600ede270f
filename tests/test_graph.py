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
