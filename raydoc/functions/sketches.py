"""Distinct-count: exact (oracle-checkable) and HyperLogLog sketch.

The sketch is the scale path for cardinality over 10¹²-row tables: each
batch folds its values into a fixed 2^p-register numpy array (a partial
aggregate a few KB in size), register arrays merge with elementwise max
(associative + commutative ⇒ combiner-friendly, any shuffle topology), and
the final estimate runs on the driver. No row ever leaves its batch.

HLL per Flajolet et al. 2007: register j = max leading-zero rank of the
hashed suffix; estimate = α·m²/Σ2^(−M[j]) with the standard small-range
(linear counting) correction. p=12 ⇒ ~1.6% typical error.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

P = 12
M = 1 << P                     # 4096 registers
_ALPHA = 0.7213 / (1 + 1.079 / M)


def _hash64(values: list) -> np.ndarray:
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")
         for v in values), dtype=np.uint64, count=len(values))


def hll_partial(values: list) -> np.ndarray:
    """Fold a batch of values into a fresh 2^p register array."""
    regs = np.zeros(M, dtype=np.uint8)
    if not values:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    suffix = h << np.uint64(P)  # drop the index bits (wraps, fine)
    # rank = leading zeros of the 64-bit suffix + 1 (s==0 ⇒ 64-P+1),
    # vectorized binary-search clz (float log2 would mis-round near powers
    # of two for 64-bit values)
    ranks = _clz64(suffix) + np.uint8(1)
    ranks[suffix == 0] = 64 - P + 1
    np.maximum.at(regs, idx, ranks)
    return regs


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (0 maps to 64)."""
    zero = x == 0
    x = x.copy()
    n = np.zeros(x.shape, dtype=np.uint8)
    for s in (32, 16, 8, 4, 2, 1):
        m = x < (np.uint64(1) << np.uint64(64 - s))
        n[m] += s
        x[m] <<= np.uint64(s)
    n[zero] = 64
    return n


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def _fold_type_regs(t: pa.Table) -> pa.Table:
    """Worker-side pre-fold for (event_type, regs) HLL partial streams:
    merge same-type registers WITHIN the batch (no exchange), so the
    later per-type groupby folds ~#batches/64^levels rows per type
    instead of one per input batch — the grouped twin of the global
    HLL/CMS tree-fold levels."""
    if t.num_rows == 0:
        return t
    accs: dict = {}
    for g, blob in zip(t.column("event_type").to_pylist(),
                       t.column("regs").to_pylist()):
        cur = np.frombuffer(blob, dtype=np.uint8)
        prev = accs.get(g)
        accs[g] = cur if prev is None else hll_merge(prev, cur)
    return pa.table({
        "event_type": pa.array(list(accs), pa.string()),
        "regs": pa.array([a.tobytes() for a in accs.values()],
                         pa.binary())})


def hll_estimate(regs: np.ndarray) -> float:
    est = _ALPHA * M * M / float(np.sum(np.exp2(-regs.astype(np.float64))))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)     # linear counting small-range fix
    return float(est)


def distinct_users_exact(sf_dir: str) -> pa.Table:
    """Exact COUNT(DISTINCT user_id): per-batch dedup partials → one
    distributed groupby → ``count()`` — the distinct ID SET never lands on
    the driver (only the final scalar does). SQL-oracle-checkable."""
    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    n = partial_groupby(ds, ["user_id"],
                        {"n": ("user_id", "count")}).count()
    return pa.table({"n_users": pa.array([n], pa.int64())})


def distinct_users_hll(sf_dir: str) -> pa.Table:
    """HLL sketch of distinct user_id: per-batch register partials merge by
    elementwise max in WORKER-side tree-fold levels (same shape as the CMS
    fold below), so the driver folds a handful of 4 KB blobs — not one per
    input batch — regardless of corpus size. The 10¹²-row cardinality path."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        regs = hll_partial(t.column("user_id").to_pylist())
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def fold(t: pa.Table) -> pa.Table:
        acc = np.zeros(M, dtype=np.uint8)
        for blob in t.column("regs").to_pylist():
            acc = hll_merge(acc, np.frombuffer(blob, dtype=np.uint8))
        return pa.table({"regs": pa.array([acc.tobytes()], pa.binary())})

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    # two fold levels cut partial count by 64× each (1M batches → 245 → 4)
    for _ in range(2):
        parts_ds = parts_ds.map_batches(fold, batch_format="pyarrow",
                                        batch_size=64)
    parts = parts_ds.to_pandas()
    regs = np.zeros(M, dtype=np.uint8)
    for blob in parts["regs"]:
        regs = hll_merge(regs, np.frombuffer(blob, dtype=np.uint8))
    return pa.table({"n_users_estimate": pa.array([round(hll_estimate(regs))],
                                                  pa.int64())})


# --- Count-Min sketch + heavy hitters ---------------------------------------

_CMS_D = 4
_CMS_W = 1 << 13               # 8192 counters per row -> 256 KB int64 sketch
_CMS_SALTS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0x27D4EB2F165667C5],
                      dtype=np.uint64)


def _cms_buckets(keys: np.ndarray) -> np.ndarray:
    """(D, n) bucket indices via a splitmix64-style scramble per row."""
    k = keys.astype(np.uint64)
    out = np.empty((_CMS_D, len(k)), dtype=np.int64)
    for d in range(_CMS_D):
        v = k ^ _CMS_SALTS[d]
        v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        out[d] = ((v ^ (v >> np.uint64(31))) % np.uint64(_CMS_W)).astype(np.int64)
    return out


def cms_user_counts(sf_dir: str, k: int = 20, local_k: int = 64) -> pa.Table:
    """Approximate top-k user event counts via Count-Min: each batch folds
    its counts into a fixed (D, W) counter matrix (a ~256 KB partial —
    never a per-key row) plus its ``local_k`` locally-heaviest keys as
    candidates. Sketches merge by elementwise SUM (associative ⇒ any
    topology), candidates by union; final estimates = min over rows at the
    candidate's buckets. Guarantees estimate ≥ true count (one-sided);
    heavy keys are always local-top in some batch at this skew, but
    formally recall < 1 — the exact twin is ``heavy_hitter_users``."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        uids, counts = np.unique(
            t.column("user_id").to_numpy(zero_copy_only=False),
            return_counts=True)
        sketch = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
        if len(uids):
            b = _cms_buckets(uids)
            for d in range(_CMS_D):
                np.add.at(sketch[d], b[d], counts)
        top = np.argsort(-counts)[:local_k]
        return pa.table({
            "sketch": pa.array([sketch.tobytes()], pa.binary()),
            "candidates": pa.array([uids[top].astype(np.int64).tolist()],
                                   pa.list_(pa.int64())),
        })

    def fold(t: pa.Table) -> pa.Table:
        """Tree-reduce level: sum this batch's sketches, union candidates
        — merging happens in WORKERS, so the driver only ever sees a
        handful of 256 KB partials regardless of corpus size."""
        acc = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
        cand: set[int] = set()
        for blob, cl in zip(t.column("sketch").to_pylist(),
                            t.column("candidates").to_pylist()):
            acc += np.frombuffer(blob, dtype=np.int64).reshape(_CMS_D, _CMS_W)
            cand.update(int(c) for c in cl)
        return pa.table({
            "sketch": pa.array([acc.tobytes()], pa.binary()),
            "candidates": pa.array([sorted(cand)], pa.list_(pa.int64())),
        })

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    # two fold levels cut partial count by 64× each (1M batches → 245 → 4)
    for _ in range(2):
        parts_ds = parts_ds.map_batches(fold, batch_format="pyarrow",
                                        batch_size=64)
    parts = parts_ds.to_pandas()
    sketch = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    cands: set[int] = set()
    for blob, cl in zip(parts["sketch"], parts["candidates"]):
        sketch += np.frombuffer(blob, dtype=np.int64).reshape(_CMS_D, _CMS_W)
        cands.update(int(c) for c in cl)
    if not cands:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "est_count": pa.array([], pa.int64())})
    cand_arr = np.array(sorted(cands), dtype=np.int64)
    b = _cms_buckets(cand_arr)
    est = np.min(np.stack([sketch[d][b[d]] for d in range(_CMS_D)]), axis=0)
    order = np.lexsort((cand_arr, -est))[:k]
    return pa.table({"user_id": pa.array(cand_arr[order], pa.int64()),
                     "est_count": pa.array(est[order], pa.int64())})


def heavy_hitter_users(sf_dir: str, threshold: int = 70) -> pa.Table:
    """EXACT heavy hitters (users with ≥ ``threshold`` events): per-batch
    combiner counts → one small groupby of partials → filter. The
    SQL-oracle twin of the Count-Min path."""
    import pyarrow.compute as pc

    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
    counts = partial_groupby(ds, ["user_id"],
                             {"n_events": ("user_id", "count")})
    # filter INSIDE the dataset: only the (small by definition) heavy-
    # hitter rows ever reach the driver, not one row per distinct user
    heavy = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_events"], threshold)),
        batch_format="pyarrow")
    return collect_table(heavy).select(
        ["user_id", "n_events"]).sort_by("user_id")


# --- DDSketch-style quantiles (Masson, Rim, Lee; VLDB 2019) -----------
# Relative-error quantile sketch: log-spaced bins with base gamma; a
# value x > 0 lands in bin ceil(log(x)/log(gamma)), negatives mirror
# into negated bins, and a dedicated zero bin catches |x| < _DD_MIN.
# Quantile answers carry relative error <= (gamma-1)/(gamma+1).

_DD_GAMMA = 1.02
_DD_MIN = 1e-9


def _dd_bins(vals: "np.ndarray") -> "np.ndarray":
    """Signed DDSketch bin index per value (0 = the zero bin)."""
    out = np.zeros(len(vals), dtype=np.int64)
    lg = np.log(_DD_GAMMA)
    pos = vals >= _DD_MIN
    neg = vals <= -_DD_MIN
    out[pos] = np.ceil(np.log(vals[pos]) / lg).astype(np.int64)
    out[neg] = -np.ceil(np.log(-vals[neg]) / lg).astype(np.int64)
    return out


def value_percentiles_sketch(sf_dir: str,
                             qs=(0.25, 0.5, 0.75, 0.9, 0.99)) -> pa.Table:
    """(q, value_est) over events.value via a DDSketch histogram — the
    mergeable approximate-quantile twin of the exact
    ``windows.value_percentiles`` (which needs a global sort). Answers
    are within ~1% RELATIVE error (gamma=1.02; property-tested against
    the exact op).

    Scale shape: each batch reduces to (bin, count) rows; a combiner
    groupby sums them — the sketch itself IS the aggregation result
    (≤ a few thousand bins regardless of row count), so there is no
    driver fold at all, no sort, and no whole-column collection; only
    the final histogram lands on the driver."""
    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def to_bins(t: pa.Table) -> pa.Table:
        vals = t.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64)
        bins, counts = np.unique(_dd_bins(vals), return_counts=True)
        return pa.table({"bin": pa.array(bins, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    hist = collect_table(partial_groupby(
        ds.map_batches(to_bins, batch_format="pyarrow"),
        ["bin"], {"n": ("n", "sum")})).sort_by("bin")

    bins = hist.column("bin").to_numpy(zero_copy_only=False)
    counts = hist.column("n").to_numpy(zero_copy_only=False)
    total = counts.sum()
    cum = counts.cumsum()

    def bin_value(b: int) -> float:
        if b == 0:
            return 0.0
        mag = 2.0 * _DD_GAMMA ** abs(b) / (_DD_GAMMA + 1)  # bin midpoint
        return mag if b > 0 else -mag

    out_q, out_v = [], []
    for q in qs:
        # the value at rank floor((n-1)*q) — same rank convention as the
        # exact windows.value_percentiles
        rank = int(np.floor((total - 1) * q))
        ix = int(np.searchsorted(cum, rank + 1))
        out_q.append(float(q))
        out_v.append(bin_value(int(bins[ix])))
    return pa.table({"q": pa.array(out_q, pa.float64()),
                     "value_est": pa.array(out_v, pa.float64())})


def distinct_users_by_type(sf_dir: str) -> pa.Table:
    """Exact per-group COUNT(DISTINCT user_id) per event_type: per-batch
    (type, user) dedup partials → distributed distinct → combiner count.
    SQL-oracle-checkable; the grouped twin of ``distinct_users_exact``."""
    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])
    pairs = partial_groupby(ds, ["event_type", "user_id"],
                            {"n": ("user_id", "count")})
    out = collect_table(partial_groupby(
        pairs, ["event_type"], {"n_users": ("user_id", "count")}))
    return out.sort_by("event_type")


def distinct_users_by_type_hll(sf_dir: str) -> pa.Table:
    """HLL AS A GROUPED AGGREGATE: one register array per event_type,
    merged group-wise — the sketch shape for per-key cardinality over
    10¹²-row tables (e.g. distinct users per country/domain).

    Scale shape: each batch emits ONE (group, 4 KB registers) row per
    group it saw; a groupby co-locates each group's partials and a
    worker-side fold leaves one row per group; only #groups tiny rows
    reach the driver. Accurate to ~1.6% (p=12) — property-tested
    against the exact grouped twin."""
    from raydoc.functions._collect import collect_table

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({"g": t.column("event_type").to_pylist(),
                           "u": t.column("user_id").to_pylist()})
        groups, blobs = [], []
        for g, sub in df.groupby("g", sort=False):
            groups.append(g)
            blobs.append(hll_partial(sub["u"].tolist()).tobytes())
        return pa.table({"event_type": pa.array(groups, pa.string()),
                         "regs": pa.array(blobs, pa.binary())})

    def fold_group(t: pa.Table) -> pa.Table:
        acc = np.zeros(M, dtype=np.uint8)
        for blob in t.column("regs").to_pylist():
            acc = hll_merge(acc, np.frombuffer(blob, dtype=np.uint8))
        return pa.table({
            "event_type": t.column("event_type").slice(0, 1),
            "n_users_estimate": pa.array([round(hll_estimate(acc))],
                                         pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    # two worker-side pre-fold levels (64× row cut each) keep the final
    # per-type group a handful of rows regardless of input batch count
    for _ in range(2):
        parts = parts.map_batches(_fold_type_regs, batch_format="pyarrow",
                                  batch_size=64)
    out = parts.groupby("event_type").map_groups(fold_group,
                                                 batch_format="pyarrow")
    return collect_table(out).sort_by("event_type")


def value_percentiles_by_type_sketch(
        sf_dir: str, qs=(0.5, 0.9, 0.99)) -> pa.Table:
    """(event_type, q, value_est): per-group DDSketch quantiles — the
    scale-correct grouped percentile. An EXACT grouped percentile needs
    either a whole group in one task (the single-stratum straggler the
    round-2 review flagged on low-cardinality keys) or distributed
    selection; the mergeable histogram sidesteps both: batches emit
    (group, bin, count) rows, a combiner groupby sums them, and the
    per-group quantile read-off happens on the tiny final histogram.
    ~1% relative error (property-tested against exact numpy per group)."""
    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def to_bins(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({"g": t.column("event_type").to_pylist()})
        df["bin"] = _dd_bins(t.column("value").to_numpy(
            zero_copy_only=False).astype(np.float64))
        agg = df.groupby(["g", "bin"], sort=False).size().reset_index(name="n")
        return pa.table({"event_type": pa.array(agg["g"], pa.string()),
                         "bin": pa.array(agg["bin"], pa.int64()),
                         "n": pa.array(agg["n"], pa.int64())})

    hist = collect_table(partial_groupby(
        ds.map_batches(to_bins, batch_format="pyarrow"),
        ["event_type", "bin"], {"n": ("n", "sum")})).sort_by(
        [("event_type", "ascending"), ("bin", "ascending")])

    df = hist.to_pandas()
    out_g, out_q, out_v = [], [], []
    for g, sub in df.groupby("event_type", sort=True):
        bins = sub["bin"].to_numpy()
        cum = sub["n"].to_numpy().cumsum()
        total = cum[-1]
        for q in qs:
            rank = int(np.floor((total - 1) * q))
            ix = int(np.searchsorted(cum, rank + 1))
            b = int(bins[ix])
            mag = 0.0 if b == 0 else 2.0 * _DD_GAMMA ** abs(b) / (_DD_GAMMA + 1)
            out_g.append(g)
            out_q.append(float(q))
            out_v.append(mag if b >= 0 else -mag)
    return pa.table({"event_type": pa.array(out_g, pa.string()),
                     "q": pa.array(out_q, pa.float64()),
                     "value_est": pa.array(out_v, pa.float64())})


def audience_overlap_hll(sf_dir: str) -> pa.Table:
    """(type_a, type_b, n_a_est, n_b_est, n_union_est, n_intersect_est,
    jaccard_est): pairwise audience overlap between event types via HLL
    SET OPERATIONS — union is the elementwise register max (exact HLL
    semantics), intersection via inclusion–exclusion, all from ONE pass
    over the events table. The sketch twin of the exact
    ``relational.q_audience_jaccard`` (property-tested against it); at
    10¹²-row scale the exact pairwise shuffle is replaced by |types|
    4 KB register blobs that merge worker-side.

    Scale shape: per-batch (type, registers) partials → per-type
    groupby fold (one row per type reaches the driver) → all C(t,2)
    pair estimates are driver arithmetic over t tiny blobs.
    Inclusion–exclusion inherits HLL's additive error, so relative
    error on a SMALL intersection of two large sets is amplified —
    the documented sketch trade-off (same regime as every HLL-based
    overlap estimator); pairs estimate ≤ 0 clamp to 0."""
    from raydoc.functions._collect import collect_table

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({"g": t.column("event_type").to_pylist(),
                           "u": t.column("user_id").to_pylist()})
        groups, blobs = [], []
        for g, sub in df.groupby("g", sort=False):
            groups.append(g)
            blobs.append(hll_partial(sub["u"].tolist()).tobytes())
        return pa.table({"event_type": pa.array(groups, pa.string()),
                         "regs": pa.array(blobs, pa.binary())})

    def fold_group(t: pa.Table) -> pa.Table:
        acc = np.zeros(M, dtype=np.uint8)
        for blob in t.column("regs").to_pylist():
            acc = hll_merge(acc, np.frombuffer(blob, dtype=np.uint8))
        return pa.table({"event_type": t.column("event_type").slice(0, 1),
                         "regs": pa.array([acc.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    for _ in range(2):
        parts = parts.map_batches(_fold_type_regs, batch_format="pyarrow",
                                  batch_size=64)
    per_type = collect_table(
        parts.groupby("event_type").map_groups(fold_group,
                                               batch_format="pyarrow"))
    regs = {r["event_type"]: np.frombuffer(r["regs"], dtype=np.uint8)
            for r in per_type.to_pylist()}
    types = sorted(regs)
    rows = {"type_a": [], "type_b": [], "n_a_est": [], "n_b_est": [],
            "n_union_est": [], "n_intersect_est": [], "jaccard_est": []}
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            na = round(hll_estimate(regs[a]))
            nb = round(hll_estimate(regs[b]))
            nu = round(hll_estimate(hll_merge(regs[a], regs[b])))
            ni = max(0, na + nb - nu)
            rows["type_a"].append(a)
            rows["type_b"].append(b)
            rows["n_a_est"].append(na)
            rows["n_b_est"].append(nb)
            rows["n_union_est"].append(nu)
            rows["n_intersect_est"].append(ni)
            rows["jaccard_est"].append(ni / nu if nu else float("nan"))
    return pa.table({
        "type_a": pa.array(rows["type_a"], pa.string()),
        "type_b": pa.array(rows["type_b"], pa.string()),
        "n_a_est": pa.array(rows["n_a_est"], pa.int64()),
        "n_b_est": pa.array(rows["n_b_est"], pa.int64()),
        "n_union_est": pa.array(rows["n_union_est"], pa.int64()),
        "n_intersect_est": pa.array(rows["n_intersect_est"], pa.int64()),
        "jaccard_est": pa.array(rows["jaccard_est"], pa.float64())})


def cms_error_report(sf_dir: str, threshold: int = 70) -> pa.Table:
    """(user_id, true_n, est_n, overestimate): Count-Min ACCURACY audit
    — the sketch's one-sided error measured against ground truth at the
    exact heavy-hitter set. Unlike ``cms_user_counts`` (whose candidate
    set depends on batch-local top-k proposals), every piece here is
    partition-independent: the sketch is an associative SUM of per-batch
    (D, W) counter partials, and the probe set is the deterministic
    exact heavy hitters — so the whole report has a bit-exact DuckDB
    twin that replays the splitmix64 bucket scramble in SQL
    (32-bit-limb multiply mod 2⁶⁴). est ≥ true always (Count-Min is
    one-sided); a growing overestimate tail tells you the sketch width
    no longer fits the key cardinality."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        uids, counts = np.unique(
            t.column("user_id").to_numpy(zero_copy_only=False),
            return_counts=True)
        sketch = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
        if len(uids):
            b = _cms_buckets(uids)
            for d in range(_CMS_D):
                np.add.at(sketch[d], b[d], counts)
        return pa.table({"sketch": pa.array([sketch.tobytes()],
                                            pa.binary())})

    def fold(t: pa.Table) -> pa.Table:
        acc = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
        for blob in t.column("sketch").to_pylist():
            acc += np.frombuffer(blob, dtype=np.int64).reshape(
                _CMS_D, _CMS_W)
        return pa.table({"sketch": pa.array([acc.tobytes()],
                                            pa.binary())})

    parts_ds = ds.map_batches(partial, batch_format="pyarrow")
    for _ in range(2):
        parts_ds = parts_ds.map_batches(fold, batch_format="pyarrow",
                                        batch_size=64)
    sketch = np.zeros((_CMS_D, _CMS_W), dtype=np.int64)
    for blob in parts_ds.to_pandas()["sketch"]:
        sketch += np.frombuffer(blob, dtype=np.int64).reshape(
            _CMS_D, _CMS_W)

    hh = heavy_hitter_users(sf_dir, threshold=threshold)
    if hh.num_rows == 0:
        z = pa.array([], pa.int64())
        return pa.table({"user_id": z, "true_n": z, "est_n": z,
                         "overestimate": z})
    users = np.array(hh.column("user_id").to_pylist(), dtype=np.int64)
    true_n = np.array(hh.column("n_events").to_pylist(), dtype=np.int64)
    b = _cms_buckets(users)
    est = np.min(np.stack([sketch[d][b[d]] for d in range(_CMS_D)]),
                 axis=0)
    return pa.table({
        "user_id": pa.array(users, pa.int64()),
        "true_n": pa.array(true_n, pa.int64()),
        "est_n": pa.array(est, pa.int64()),
        "overestimate": pa.array(est - true_n, pa.int64())})
