"""Data-audit operators: Benford first-digit screening, inter-labeler
agreement (Cohen's kappa), and market-basket association rules.

All three follow the repo's combiner discipline — per-batch vectorized
partials, one tiny exchange, exact integer arithmetic end-to-end so
every output hashes bit-identically to its DuckDB twin (ppm values are
integer parts-per-million; the one signed division emulates SQL's
truncating ``//``). Reference analog: the G3/G4 statistics surface —
these are the corpus-audit generalizations a training-data pipeline
runs before ingest (fraud/entry-error screening, labeler QA, event
co-occurrence mining).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from raydoc.functions._collect import collect_table
from raydoc.functions.agg import partial_groupby


def _trunc_div(n: int, d: int) -> int:
    """SQL-style truncating integer division (Python ``//`` floors)."""
    q = abs(n) // abs(d)
    return -q if (n < 0) != (d < 0) else q


def _first_digit(v: np.ndarray) -> np.ndarray:
    """Exact first significant digit of positive int64s — successive
    integer division, no float log10 edge cases at powers of ten."""
    v = v.copy()
    while True:
        m = v >= 10
        if not m.any():
            return v
        v[m] //= 10


def benford_values(sf_dir: str) -> pa.Table:
    """(digit, n, ppm): first-significant-digit distribution of event
    values in cents — the Benford's-law screen for fabricated or
    unit-mangled numeric columns. ppm = n·10⁶ // total (exact int)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def digits(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "value" not in t.schema.names:
            return pa.table({"digit": pa.array([], pa.int64())})
        c = np.round(t.column("value").to_numpy() * 100.0).astype(np.int64)
        c = c[c > 0]
        return pa.table({"digit": pa.array(_first_digit(c), pa.int64())})

    g = collect_table(partial_groupby(
        ds.map_batches(digits, batch_format="pyarrow"),
        ["digit"], {"n": ("digit", "count")})).sort_by("digit")
    n = g.column("n").to_pylist()
    total = sum(n)
    return pa.table({
        "digit": pc.cast(g.column("digit"), pa.int64()),
        "n": pc.cast(g.column("n"), pa.int64()),
        "ppm": pa.array([v * 1_000_000 // total for v in n], pa.int64())})


def cohen_kappa(sf_dir: str, chars_min: int = 300,
                spaces_min: int = 55) -> pa.Table:
    """One-row inter-labeler agreement audit over documents: labeler A
    flags long documents (n_chars ≥ chars_min), labeler B flags
    space-rich documents (space count ≥ spaces_min — the two gates a
    real pipeline would A/B). Output: the 2×2 confusion matrix plus
    observed/expected agreement and Cohen's kappa as exact integer ppm
    (kappa can be negative; division truncates like SQL)."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["text", "n_chars"])

    def cells(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "text" not in t.schema.names:
            z = pa.array([], pa.int64())
            return pa.table({"k": z, "n11": z, "n10": z, "n01": z,
                             "n00": z})
        a = pc.greater_equal(t.column("n_chars"),
                             pa.scalar(chars_min)).to_numpy(
            zero_copy_only=False)
        b = pc.greater_equal(
            pc.count_substring(t.column("text"), " "),
            pa.scalar(spaces_min)).to_numpy(zero_copy_only=False)
        return pa.table({
            "k": pa.array([0], pa.int64()),
            "n11": pa.array([int((a & b).sum())], pa.int64()),
            "n10": pa.array([int((a & ~b).sum())], pa.int64()),
            "n01": pa.array([int((~a & b).sum())], pa.int64()),
            "n00": pa.array([int((~a & ~b).sum())], pa.int64())})

    g = collect_table(partial_groupby(
        ds.map_batches(cells, batch_format="pyarrow"), ["k"],
        {c: (c, "sum") for c in ("n11", "n10", "n01", "n00")}))
    n11, n10, n01, n00 = (int(g.column(c)[0].as_py())
                          for c in ("n11", "n10", "n01", "n00"))
    nn = n11 + n10 + n01 + n00
    exp = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    po_ppm = (n11 + n00) * 1_000_000 // nn
    pe_ppm = exp * 1_000_000 // (nn * nn)
    kappa_ppm = _trunc_div((nn * (n11 + n00) - exp) * 1_000_000,
                           nn * nn - exp)
    return pa.table({
        "n_both_pos": pa.array([n11], pa.int64()),
        "n_a_only": pa.array([n10], pa.int64()),
        "n_b_only": pa.array([n01], pa.int64()),
        "n_both_neg": pa.array([n00], pa.int64()),
        "po_ppm": pa.array([po_ppm], pa.int64()),
        "pe_ppm": pa.array([pe_ppm], pa.int64()),
        "kappa_ppm": pa.array([kappa_ppm], pa.int64())})


def association_rules(sf_dir: str,
                      num_buckets: int | None = None) -> pa.Table:
    """(antecedent, consequent, n_both, n_ante, conf_ppm, lift_ppm):
    directed association rules over event-type baskets — for every
    ordered pair of co-occurring event types, the confidence
    P(consequent | antecedent) and lift against independence, both as
    exact integer ppm. Pairs with an empty intersection are omitted
    (inner-join semantics, matching the SQL twin).

    Scale shape (same as q_audience_jaccard, which shares the
    primitive): distinct (user, type) rows come off a combiner groupby;
    pair generation co-locates each user's types with ONE coarse
    user-bucket exchange and a vectorized self-merge per bucket; the
    final expansion to both directions + divisions runs on the driver
    over ≤ |types|² rows."""
    import pandas as pd

    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    # two consumers (pairs, sizes) + a count — materialize once
    distinct = partial_groupby(ds, ["user_id", "event_type"],
                               {"n": ("event_type", "count")}).materialize()

    def add_bucket(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"], "event_type": t["event_type"],
            "bucket": pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = g[["user_id", "event_type"]].merge(
            g[["user_id", "event_type"]], on="user_id")
        m = m[m["event_type_x"] < m["event_type_y"]]
        return m.rename(columns={"event_type_x": "type_a",
                                 "event_type_y": "type_b"})[
            ["type_a", "type_b"]]

    inter = collect_table(partial_groupby(
        distinct.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket").map_groups(pairs, batch_format="pandas"),
        ["type_a", "type_b"], {"n_both": ("type_a", "count")}))
    sizes = collect_table(partial_groupby(
        distinct, ["event_type"], {"n_aud": ("user_id", "count")}))
    n_users = distinct.groupby("user_id").count().count()

    cols = {c: [] for c in ("antecedent", "consequent", "n_both",
                            "n_ante", "conf_ppm", "lift_ppm")}
    size = dict(zip(sizes.column("event_type").to_pylist(),
                    sizes.column("n_aud").to_pylist()))
    for a, b, nab in zip(inter.column("type_a").to_pylist(),
                         inter.column("type_b").to_pylist(),
                         inter.column("n_both").to_pylist()):
        nab = int(nab)
        for ante, cons in ((a, b), (b, a)):
            na, nb = int(size[ante]), int(size[cons])
            cols["antecedent"].append(ante)
            cols["consequent"].append(cons)
            cols["n_both"].append(nab)
            cols["n_ante"].append(na)
            cols["conf_ppm"].append(nab * 1_000_000 // na)
            cols["lift_ppm"].append(nab * n_users * 1_000_000 // (na * nb))
    t = pa.table({
        "antecedent": pa.array(cols["antecedent"], pa.string()),
        "consequent": pa.array(cols["consequent"], pa.string()),
        "n_both": pa.array(cols["n_both"], pa.int64()),
        "n_ante": pa.array(cols["n_ante"], pa.int64()),
        "conf_ppm": pa.array(cols["conf_ppm"], pa.int64()),
        "lift_ppm": pa.array(cols["lift_ppm"], pa.int64())})
    return t.sort_by([("antecedent", "ascending"),
                      ("consequent", "ascending")])


def k_anonymity_report(sf_dir: str) -> pa.Table:
    """(class_size, n_classes, n_rows): k-anonymity audit of the
    customer table under the quasi-identifier triple (nation, market
    segment, account-balance band of 1000) — the re-identification-risk
    histogram a privacy review runs before releasing "anonymized" data:
    every row in a class of size 1 is uniquely re-identifiable from the
    quasi-identifiers alone; classes of 2-4 are linkage-attack cheap.

    Exactness: the balance band uses an offset-then-truncate division
    (cents + 10 000 000) // 100 000 so negative balances get floor
    semantics in BOTH engines (DuckDB ``//`` truncates, Python floors —
    the offset makes the dividend non-negative where they agree).

    Shape: one combiner groupby over the quasi triple (class sizes),
    then a second tiny combiner over the bucketed sizes — class rows
    never collect."""
    ds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_nationkey", "c_acctbal",
                                  "c_mktsegment"])

    def quasi(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100.0)),
                        pa.int64())
        band = pc.divide(pc.add(cents, pa.scalar(10_000_000, pa.int64())),
                         pa.scalar(100_000, pa.int64()))
        return pa.table({
            "nat": pc.cast(t["c_nationkey"], pa.int64()),
            "seg": t["c_mktsegment"],
            "band": pc.cast(band, pa.int64()),
            "one": pa.array(np.ones(t.num_rows, np.int64))})

    classes = partial_groupby(
        ds.map_batches(quasi, batch_format="pyarrow"),
        ["nat", "seg", "band"], {"s": ("one", "sum")})

    def bucketize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "s" not in t.schema.names:
            return pa.table({"class_size": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64())})
        s = t.column("s").to_pylist()
        lab = ["1" if v == 1 else "2-4" if v <= 4 else
               "5-9" if v <= 9 else "10+" for v in s]
        return pa.table({"class_size": pa.array(lab, pa.string()),
                         "n": pa.array(np.ones(len(s), np.int64)),
                         "rows": pa.array(s, pa.int64())})

    out = collect_table(partial_groupby(
        classes.map_batches(bucketize, batch_format="pyarrow"),
        ["class_size"], {"n_classes": ("n", "sum"),
                         "n_rows": ("rows", "sum")}))
    if out.num_rows == 0 or "class_size" not in out.schema.names:
        return pa.table({"class_size": pa.array([], pa.string()),
                         "n_classes": pa.array([], pa.int64()),
                         "n_rows": pa.array([], pa.int64())})
    return out.select(["class_size", "n_classes", "n_rows"]) \
        .sort_by("class_size")


def l_diversity_report(sf_dir: str) -> pa.Table:
    """(l_bucket, n_classes, n_rows): l-diversity companion to
    ``k_anonymity_report`` — per quasi-identifier class (nation,
    segment), how DIVERSE the sensitive attribute (1000-balance band)
    is. A class can be k-anonymous yet leak everything when all its
    members share one sensitive value (l = 1): this histogram counts
    classes by their distinct-sensitive-value count."""
    ds = rd.read_parquet(f"{sf_dir}/customer.parquet",
                         columns=["c_nationkey", "c_acctbal",
                                  "c_mktsegment"])

    def quasi(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100.0)),
                        pa.int64())
        band = pc.divide(pc.add(cents, pa.scalar(10_000_000, pa.int64())),
                         pa.scalar(100_000, pa.int64()))
        return pa.table({
            "nat": pc.cast(t["c_nationkey"], pa.int64()),
            "seg": t["c_mktsegment"],
            "band": pc.cast(band, pa.int64()),
            "one": pa.array(np.ones(t.num_rows, np.int64))})

    # distinct (class, band) + per-cell row counts in ONE combiner pass
    cells = partial_groupby(
        ds.map_batches(quasi, batch_format="pyarrow"),
        ["nat", "seg", "band"], {"rows": ("one", "sum")})

    def per_class(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "nat" not in t.schema.names:
            z = pa.array([], pa.int64())
            return pa.table({"nat": z, "seg": pa.array([], pa.string()),
                             "l": z, "rows": z})
        return pa.table({"nat": t["nat"], "seg": t["seg"],
                         "l": pa.array([1] * t.num_rows, pa.int64()),
                         "rows": t["rows"]})

    classes = partial_groupby(
        cells.map_batches(per_class, batch_format="pyarrow"),
        ["nat", "seg"], {"l": ("l", "sum"), "rows": ("rows", "sum")})

    def bucketize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l" not in t.schema.names:
            z = pa.array([], pa.int64())
            return pa.table({"l_bucket": pa.array([], pa.string()),
                             "n": z, "rows": z})
        ls = t.column("l").to_pylist()
        lab = ["1" if v == 1 else "2-4" if v <= 4 else
               "5-9" if v <= 9 else "10+" for v in ls]
        return pa.table({"l_bucket": pa.array(lab, pa.string()),
                         "n": pa.array(np.ones(len(ls), np.int64)),
                         "rows": t["rows"]})

    out = collect_table(partial_groupby(
        classes.map_batches(bucketize, batch_format="pyarrow"),
        ["l_bucket"], {"n_classes": ("n", "sum"),
                       "n_rows": ("rows", "sum")}))
    if out.num_rows == 0 or "l_bucket" not in out.schema.names:
        return pa.table({"l_bucket": pa.array([], pa.string()),
                         "n_classes": pa.array([], pa.int64()),
                         "n_rows": pa.array([], pa.int64())})
    return out.select(["l_bucket", "n_classes", "n_rows"]) \
        .sort_by("l_bucket")
