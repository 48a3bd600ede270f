"""Distributed histogram-based regression tree (the XGBoost/LightGBM
split-finding pattern).

The scalable way to fit a tree on 100 TB is NOT to ship rows around by
node — it is the histogram method every distributed GBM uses: per
level, every batch folds its rows into per-(node, feature, bin)
integer histograms (a combiner — only tiny partials cross the wire),
the driver picks each node's best split from the folded histogram, the
chosen splits broadcast back, and node assignment is RECOMPUTED from
features next pass (no per-row label ever materializes). Depth-d
training therefore streams the input d+1 times and shuffles nothing
but histograms — the same partial/broadcast discipline as
``embedding_kmeans`` and ``logreg`` in similarity.py.

Exactness: the target is integer cents and the variance-reduction gain
of a split (L, R) is the rational (S'L²·nR + S'R²·nL) / (nL·nR) where
S' are sums DEMEANED by the node's integer mean c = S//n — a shift of
the target changes every candidate's gain by the same constant, so the
argmax is unchanged while the magnitudes shrink enough for the SQL
twin's 128-bit cross-multiplied comparisons (engine-side the compare
is arbitrary-precision Python int, the true 100-TB path). Candidate
gains compare exactly by p1·q2 vs p2·q1 with the deterministic
tiebreak (feature asc, bin asc), so the fitted tree is bit-reproducible
and DuckDB-twinnable (a NOT EXISTS dominance argmax over HUGEINT
cross-products — oracle in __ray_entry__.py).

Reference analog: the confidence/statistics aggregation surface (G3) —
this is the model-fitting generalization a training-data pipeline
needs (quality-score regressors, curriculum difficulty models).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from raydoc.functions._collect import collect_table
from raydoc.functions.agg import partial_groupby


def _assign_nodes(feats: list[np.ndarray],
                  splits: dict[int, tuple[int, int]],
                  levels: int) -> np.ndarray:
    """Vectorized root-to-level walk: rows land on their node id given
    the splits chosen so far (node i → children 2i+1 / 2i+2)."""
    node = np.zeros(len(feats[0]), dtype=np.int64)
    for _ in range(levels):
        nxt = node.copy()
        for nid, (fi, b) in splits.items():
            m = node == nid
            if not m.any():
                continue
            nxt[m] = np.where(feats[fi][m] <= b, 2 * nid + 1, 2 * nid + 2)
        node = nxt
    return node


def _best_splits(hist: pa.Table, n_features: int) -> dict[int, tuple]:
    """Per node, the exact-gain argmax over (feature, bin) candidates.
    ``hist`` columns: node, feature, bin, n, s. Returns
    {node: (feature, bin, n_total, s_total)}; nodes with no valid
    candidate (single bin on every feature) are absent = leaves."""
    rows = sorted(zip(hist.column("node").to_pylist(),
                      hist.column("feature").to_pylist(),
                      hist.column("bin").to_pylist(),
                      hist.column("n").to_pylist(),
                      hist.column("s").to_pylist()))
    per_node: dict[int, dict[int, list]] = {}
    for node, f, b, n, s in rows:
        per_node.setdefault(node, {}).setdefault(f, []).append((b, n, s))

    out: dict[int, tuple] = {}
    for node, by_f in per_node.items():
        # every feature sees every row, so totals come from feature 0
        nt = sum(n for _, n, _ in by_f[0])
        st = sum(s for _, _, s in by_f[0])
        c = st // nt
        tp = st - nt * c                      # demeaned total
        best = None                           # (p, q, f, b) maximizing p/q
        for f in range(n_features):
            nl = sl = 0
            for b, n, s in by_f.get(f, []):   # bins ascend (sorted above)
                nl += n
                sl += s
                if nl == 0 or nl >= nt:
                    continue
                slp = sl - nl * c
                srp = tp - slp
                nr = nt - nl
                p = slp * slp * nr + srp * srp * nl
                q = nl * nr
                if best is None or p * best[1] > best[0] * q:
                    best = (p, q, f, b)
        if best is not None:
            out[node] = (best[2], best[3], nt, st)
    return out


def regression_tree(features: rd.Dataset, feature_cols: list[str],
                    target_col: str, depth: int = 2) -> pa.Table:
    """Fit a depth-``depth`` regression tree over integer features and
    an integer target. Returns one row per node, sorted by node id:
    (node, feature, bin, n, sum_target) — internal nodes carry their
    chosen split (go left iff feature value <= bin), leaves carry null
    feature/bin. ``features`` streams once per level plus once for the
    leaf pass; only histograms and the broadcast split table move."""
    splits: dict[int, tuple[int, int]] = {}
    meta: dict[int, tuple] = {}

    for level in range(depth):
        frozen = dict(splits)

        def hist_stage(t: pa.Table, _frozen=frozen, _level=level) -> pa.Table:
            if t.num_rows == 0 or feature_cols[0] not in t.schema.names:
                return pa.table({
                    "node": pa.array([], pa.int64()),
                    "feature": pa.array([], pa.int64()),
                    "bin": pa.array([], pa.int64()),
                    "v_c": pa.array([], pa.int64())})
            feats = [t.column(c).to_numpy(zero_copy_only=False)
                     for c in feature_cols]
            node = _assign_nodes(feats, _frozen, _level)
            v = t.column(target_col).to_numpy(zero_copy_only=False)
            parts = []
            for fi, fvals in enumerate(feats):
                parts.append(pa.table({
                    "node": pa.array(node, pa.int64()),
                    "feature": pa.array(
                        np.full(len(node), fi, np.int64), pa.int64()),
                    "bin": pa.array(fvals.astype(np.int64), pa.int64()),
                    "v_c": pa.array(v.astype(np.int64), pa.int64())}))
            return pa.concat_tables(parts)

        hist = collect_table(partial_groupby(
            features.map_batches(hist_stage, batch_format="pyarrow"),
            ["node", "feature", "bin"],
            {"n": ("v_c", "count"), "s": ("v_c", "sum")}))
        chosen = _best_splits(hist, len(feature_cols))
        for nid, (f, b, nt, st) in chosen.items():
            splits[nid] = (f, b)
            meta[nid] = (f, b, nt, st)

    frozen = dict(splits)

    def leaf_stage(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or feature_cols[0] not in t.schema.names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "v_c": pa.array([], pa.int64())})
        feats = [t.column(c).to_numpy(zero_copy_only=False)
                 for c in feature_cols]
        node = _assign_nodes(feats, frozen, depth)
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "v_c": pa.array(t.column(target_col).to_numpy(
                zero_copy_only=False).astype(np.int64), pa.int64())})

    leaves = collect_table(partial_groupby(
        features.map_batches(leaf_stage, batch_format="pyarrow"),
        ["node"], {"n": ("v_c", "count"), "s": ("v_c", "sum")}))

    node_ids, feat_col, bin_col, n_col, s_col = [], [], [], [], []
    for nid in sorted(meta):
        f, b, nt, st = meta[nid]
        node_ids.append(nid)
        feat_col.append(f)
        bin_col.append(b)
        n_col.append(nt)
        s_col.append(st)
    for nid, n, s in sorted(zip(leaves.column("node").to_pylist(),
                                leaves.column("n").to_pylist(),
                                leaves.column("s").to_pylist())):
        node_ids.append(nid)
        feat_col.append(None)
        bin_col.append(None)
        n_col.append(int(n))
        s_col.append(int(s))
    return pa.table({
        "node": pa.array(node_ids, pa.int64()),
        "feature": pa.array(feat_col, pa.int64()),
        "bin": pa.array(bin_col, pa.int64()),
        "n": pa.array(n_col, pa.int64()),
        "sum_cents": pa.array(s_col, pa.int64())})


def value_regression_tree(sf_dir: str) -> pa.Table:
    """Depth-2 regression tree predicting event value (cents) from
    three exact integer features — hour of day, day of week (epoch-day
    + 4 mod 7, timezone-free), and a 32-way user bucket. Output = the
    fitted tree: 3 internal nodes with their chosen (feature, bin)
    split and 4 leaves, all counts/sums exact integers. Oracle = the
    same histogram + demeaned cross-multiplied argmax in DuckDB
    (HUGEINT dominance anti-join)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id", "value"])

    def featurize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "ts" not in t.schema.names:
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("f_hour", "f_dow", "f_user", "v_c")})
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy()
        uid = t.column("user_id").to_numpy()
        v = t.column("value").to_numpy()
        return pa.table({
            "f_hour": pa.array(us // 3_600_000_000 % 24, pa.int64()),
            "f_dow": pa.array((us // 86_400_000_000 + 4) % 7, pa.int64()),
            "f_user": pa.array(uid % 32, pa.int64()),
            "v_c": pa.array(np.round(v * 100.0).astype(np.int64),
                            pa.int64())})

    feats = ds.map_batches(featurize, batch_format="pyarrow")
    return regression_tree(feats, ["f_hour", "f_dow", "f_user"], "v_c",
                           depth=2)
