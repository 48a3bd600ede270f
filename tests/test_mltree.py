"""Distributed histogram regression tree: exact-gain split selection
vs an independent brute-force reference (Fractions, row-level), leaf
partition invariants, target-shift invariance, deeper trees, and tie
determinism on adversarial symmetric data."""

from fractions import Fraction

import numpy as np
import pyarrow as pa
import pytest


def _table(n=400, seed=11, n_feats=3, bins=(6, 4, 8)):
    rng = np.random.default_rng(seed)
    cols = {}
    for i, b in enumerate(bins[:n_feats]):
        cols[f"f{i}"] = pa.array(rng.integers(0, b, n), pa.int64())
    # planted structure on f0 plus noise, plenty of exact ties
    f0 = cols["f0"].to_numpy()
    v = f0 * 1000 + rng.integers(0, 50, n)
    cols["v"] = pa.array(v.astype(np.int64), pa.int64())
    return pa.table(cols)


def _brute_force_tree(t, feature_cols, depth):
    """Row-level exact reference: no histograms, Fraction gains."""
    feats = {c: t.column(c).to_numpy() for c in feature_cols}
    v = t.column("v").to_numpy()

    def best_split(idx):
        nt = len(idx)
        st = int(v[idx].sum())
        best = None
        for fi, c in enumerate(feature_cols):
            fv = feats[c][idx]
            for b in sorted(set(fv.tolist()))[:-1]:
                lm = fv <= b
                nl = int(lm.sum())
                sl = int(v[idx][lm].sum())
                gain = Fraction(sl * sl, nl) + \
                    Fraction((st - sl) ** 2, nt - nl)
                key = (gain, -fi, -b)
                if best is None or key > best[0]:
                    best = (key, fi, b, nt, st)
        return best

    nodes = {0: np.arange(t.num_rows)}
    internal, order = {}, [0]
    for nid in order:
        if nid >= 2 ** depth - 1:  # beyond internal levels
            continue
        idx = nodes[nid]
        got = best_split(idx)
        if got is None:
            continue
        _, fi, b, nt, st = got
        internal[nid] = (fi, b, nt, st)
        lm = feats[feature_cols[fi]][idx] <= b
        nodes[2 * nid + 1] = idx[lm]
        nodes[2 * nid + 2] = idx[~lm]
        order.extend([2 * nid + 1, 2 * nid + 2])
    leaves = {nid: (len(ix), int(v[ix].sum()))
              for nid, ix in nodes.items()
              if nid not in internal and len(ix)}
    return internal, leaves


def _as_dicts(tree):
    internal, leaves = {}, {}
    for r in tree.to_pylist():
        if r["feature"] is None:
            leaves[r["node"]] = (r["n"], r["sum_cents"])
        else:
            internal[r["node"]] = (r["feature"], r["bin"],
                                   r["n"], r["sum_cents"])
    return internal, leaves


@pytest.mark.parametrize("depth,seed", [(1, 3), (2, 11), (3, 42)])
def test_tree_matches_brute_force(ray_session, depth, seed):
    import ray.data as rd

    from raydoc.functions.mltree import regression_tree

    t = _table(seed=seed)
    tree = regression_tree(rd.from_arrow(t), ["f0", "f1", "f2"], "v",
                           depth=depth)
    internal, leaves = _as_dicts(tree)
    exp_internal, exp_leaves = _brute_force_tree(
        t, ["f0", "f1", "f2"], depth)
    assert internal == exp_internal
    assert leaves == exp_leaves


def test_tree_leaf_partition(ray_session):
    import ray.data as rd

    from raydoc.functions.mltree import regression_tree

    t = _table(n=700, seed=5)
    tree = regression_tree(rd.from_arrow(t), ["f0", "f1", "f2"], "v",
                           depth=2)
    internal, leaves = _as_dicts(tree)
    assert sum(n for n, _ in leaves.values()) == t.num_rows
    assert sum(s for _, s in leaves.values()) == \
        int(t.column("v").to_numpy().sum())
    # each internal node's stats equal the sum of its two subtrees
    root = internal[0]
    kids = [internal.get(k) or (None, None) + leaves[k] for k in (1, 2)]
    assert root[2] == kids[0][2] + kids[1][2]
    assert root[3] == kids[0][3] + kids[1][3]


def test_tree_shift_invariance(ray_session):
    """Adding a constant to the target must not change any chosen
    split (the demeaning argument the SQL twin relies on)."""
    import ray.data as rd

    from raydoc.functions.mltree import regression_tree

    t = _table(n=300, seed=7)
    shifted = t.set_column(
        t.schema.get_field_index("v"), "v",
        pa.array(t.column("v").to_numpy() + 987_654, pa.int64()))
    a, _ = _as_dicts(regression_tree(
        rd.from_arrow(t), ["f0", "f1", "f2"], "v", depth=2))
    b, _ = _as_dicts(regression_tree(
        rd.from_arrow(shifted), ["f0", "f1", "f2"], "v", depth=2))
    assert {k: v[:2] for k, v in a.items()} == \
        {k: v[:2] for k, v in b.items()}


def test_tree_tie_determinism(ray_session):
    """Perfectly symmetric features: f1 is a copy of f0, so every f0
    split gain ties its f1 twin — the winner must be the lower feature
    index, matching the SQL twin's tiebreak."""
    import ray.data as rd

    from raydoc.functions.mltree import regression_tree

    rng = np.random.default_rng(0)
    f0 = rng.integers(0, 4, 200)
    t = pa.table({"f0": pa.array(f0, pa.int64()),
                  "f1": pa.array(f0, pa.int64()),
                  "v": pa.array(f0 * 10 + rng.integers(0, 3, 200),
                                pa.int64())})
    internal, _ = _as_dicts(regression_tree(
        rd.from_arrow(t), ["f0", "f1"], "v", depth=1))
    assert internal[0][0] == 0


def test_tree_single_bin_node_becomes_leaf(ray_session):
    """A node whose every feature is constant has no candidate split
    and must surface as a leaf, not crash."""
    import ray.data as rd

    from raydoc.functions.mltree import regression_tree

    t = pa.table({"f0": pa.array([0, 0, 0, 1], pa.int64()),
                  "f1": pa.array([5, 5, 5, 5], pa.int64()),
                  "v": pa.array([1, 2, 3, 100], pa.int64())})
    tree = regression_tree(rd.from_arrow(t), ["f0", "f1"], "v", depth=2)
    internal, leaves = _as_dicts(tree)
    # root splits f0<=0; both children are then single-bin -> leaves
    assert list(internal) == [0]
    assert leaves == {1: (3, 6), 2: (1, 100)}
