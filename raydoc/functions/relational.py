"""Relational operator coverage over the driver's TPC-H-ish tables, each
with a DuckDB-oracle twin in ``__ray_entry__.oracle_sql``.

Design rules for oracle-exact results:
- monetary aggregates are computed on integer cents
  (``round(x·100) as int64``) so summation order cannot perturb the result;
  dollar values are derived from the exact integer at the end
- joins: broadcast for dimension tables (``ray.put`` once), bucketed hash
  join for large-large
- every groupby is preceded by a per-batch pyarrow partial aggregation
  (functions/agg.py) so the shuffle moves partials, not rows
- ties in top-k are broken by explicit key order in BOTH engines
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from raydoc.functions._collect import collect_table

from raydoc.functions.agg import partial_groupby
from raydoc.functions.joins import broadcast_join, bucket_hash_join


def _read(sf_dir: str, table: str, columns: list[str]) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def _pc_mod(col, n: int):
    """Integer k % n for pyarrow columns (no modulo kernel in pa 16):
    k - (k // n) * n — shared by the deterministic CDC/versioned feeds."""
    return pc.subtract(col, pc.multiply(pc.divide(col, n), n))


def q_pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H Q1-shaped pricing summary: filter on ship date, grouped exact
    aggregates by (returnflag, linestatus)."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity",
                "l_extendedprice", "l_discount", "l_shipdate"])

    import datetime
    cutoff = pa.scalar(datetime.datetime(1998, 9, 2), pa.timestamp("us"))

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        qty = pc.cast(t["l_quantity"], pa.int64())
        price_c = _cents(t["l_extendedprice"])
        disc_pct = pc.cast(pc.round(pc.multiply(t["l_discount"], pa.scalar(100.0))), pa.int64())
        disc_price = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": qty,
            "price_c": price_c,
            "disc_price_c100": disc_price,
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    out = partial_groupby(prepped, ["l_returnflag", "l_linestatus"], {
        "sum_qty": ("qty", "sum"),
        "sum_base_price_c": ("price_c", "sum"),
        "sum_disc_price_c100": ("disc_price_c100", "sum"),
        "count_order": ("qty", "count"),
    })

    t = out.sort(["l_returnflag", "l_linestatus"]).take_all()
    t = pa.Table.from_pylist(t)
    return pa.table({
        "l_returnflag": t["l_returnflag"],
        "l_linestatus": t["l_linestatus"],
        "sum_qty": t["sum_qty"],
        "sum_base_price": pc.divide(pc.cast(t["sum_base_price_c"], pa.float64()), 100.0),
        "sum_disc_price": pc.divide(pc.cast(t["sum_disc_price_c100"], pa.float64()), 10000.0),
        "count_order": t["count_order"],
    })


def q_filter_project(sf_dir: str) -> rd.Dataset:
    """Predicate + projection pushed to the read path."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"])
    return ds.map_batches(
        lambda t: t.filter(pc.and_(pc.greater(t["l_quantity"], 45.0),
                                   pc.equal(t["l_returnflag"], "R"))),
        batch_format="pyarrow")


def q_distinct_flags(sf_dir: str) -> pa.Table:
    """Distinct pairs via partial dedup per batch + tiny final groupby."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])
    out = partial_groupby(ds, ["l_returnflag", "l_linestatus"],
                          {"n": ("l_returnflag", "count")})
    t = collect_table(out)
    return t.select(["l_returnflag", "l_linestatus"]).sort_by(
        [("l_returnflag", "ascending"), ("l_linestatus", "ascending")])


def q_top_orders(sf_dir: str) -> pa.Table:
    """Broadcast join orders ⋈ customer(BUILDING), global top-10 by price
    with deterministic tiebreak."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment", "c_name"])
    cust = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING")) \
               .select(["c_custkey", "c_name"]) \
               .rename_columns(["o_custkey", "c_name"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    joined = broadcast_join(orders, cust, key="o_custkey")
    top = joined.sort(["o_totalprice", "o_orderkey"], descending=[True, False]) \
                .limit(10)
    t = collect_table(top)
    return t.select(["o_orderkey", "o_custkey", "o_totalprice", "c_name"])


def q_revenue_by_nation(sf_dir: str) -> pa.Table:
    """TPC-H Q5 shape, single region: only the GENUINELY small side
    (customer→nation-name, region-filtered) is broadcast; orders and
    lineitem — both fact tables — stream and meet in one bucketed hash
    join. No fact table ever lands on the driver."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet")
    amerika = region.filter(pc.equal(region["r_name"], "AMERICA"))
    rkeys = set(amerika["r_regionkey"].to_pylist())
    nation = nation.filter(pc.is_in(nation["n_regionkey"],
                                    value_set=pa.array(sorted(rkeys))))
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cust_nation = cust.join(
        nation.select(["n_nationkey", "n_name"]),
        keys="c_nationkey", right_keys="n_nationkey",
        join_type="inner").select(["c_custkey", "n_name"]) \
        .rename_columns(["o_custkey", "n_name"])

    # orders (fact) streams; broadcast-join it to the small cust→nation map,
    # keep only the join key + nation name for the lineitem join
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    order_nation = broadcast_join(orders, cust_nation,
                                  key="o_custkey").map_batches(
        lambda t: pa.table({"l_orderkey": t["o_orderkey"],
                            "n_name": t["n_name"]}),
        batch_format="pyarrow")

    # map-side pre-aggregation: lineitem collapses to one partial row per
    # (batch, orderkey) BEFORE the join, so the bucket shuffle moves ~1/4
    # of the rows (exact: sum/count are order-insensitive on integer cents)
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(t: pa.Table) -> pa.Table:
        price_c = _cents(t["l_extendedprice"])
        disc_pct = pc.cast(pc.round(pc.multiply(t["l_discount"], pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
        g = pa.table({"l_orderkey": t["l_orderkey"], "rev_c100": rev}) \
            .group_by("l_orderkey").aggregate([("rev_c100", "sum"),
                                               ("rev_c100", "count")])
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "rev_c100": g["rev_c100_sum"],
                         "li_count": g["rev_c100_count"]})

    li_part = li.map_batches(li_partial, batch_format="pyarrow")
    joined = bucket_hash_join(li_part, order_nation, key="l_orderkey",
                              num_buckets=32)
    out = partial_groupby(joined, ["n_name"],
                          {"revenue_c100": ("rev_c100", "sum"),
                           "n_items": ("li_count", "sum")})
    t = collect_table(out).sort_by("n_name")
    return pa.table({
        "n_name": t["n_name"],
        "revenue": pc.divide(pc.cast(t["revenue_c100"], pa.float64()), 10000.0),
        "n_items": t["n_items"],
    })


def q_local_supplier_volume(sf_dir: str) -> pa.Table:
    """FULL TPC-H Q5: revenue from lineitems whose customer and supplier
    sit in the SAME nation of one region, within an order-date range.
    Extends ``q_revenue_by_nation``'s topology with the supplier
    dimension and the cross-dimension equality (s_nationkey =
    c_nationkey, a predicate neither dimension can pre-filter alone):
    region→nation and the region's supplier→nationkey map broadcast
    map-side; orders date-filter BEFORE their broadcast join to the
    customer→(nationkey, name) map; lineitem tags s_nationkey map-side
    (region-mismatched suppliers drop there, shrinking the exchange);
    ONE bucketed fact-fact join meets the two, the same-nation predicate
    filters post-join, and integer-cent partials aggregate per nation."""
    import datetime

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet")
    asia = region.filter(pc.equal(region["r_name"], "ASIA"))
    rkeys = set(asia["r_regionkey"].to_pylist())
    nation = nation.filter(pc.is_in(nation["n_regionkey"],
                                    value_set=pa.array(sorted(rkeys))))

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cust_nation = cust.join(
        nation.select(["n_nationkey", "n_name"]),
        keys="c_nationkey", right_keys="n_nationkey",
        join_type="inner").select(["c_custkey", "c_nationkey", "n_name"]) \
        .rename_columns(["o_custkey", "c_nationkey", "n_name"])

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    supp = supp.filter(pc.is_in(
        supp["s_nationkey"], value_set=nation["n_nationkey"])) \
        .rename_columns(["l_suppkey", "s_nationkey"])

    lo = pa.scalar(datetime.datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime.datetime(1999, 1, 1), pa.timestamp("us"))
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], lo),
            pc.less(t["o_orderdate"], hi))).drop_columns(["o_orderdate"]),
        batch_format="pyarrow")
    order_nation = broadcast_join(orders, cust_nation,
                                  key="o_custkey").map_batches(
        lambda t: pa.table({"l_orderkey": t["o_orderkey"],
                            "c_nationkey": t["c_nationkey"],
                            "n_name": t["n_name"]}),
        batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def li_tag(t: pa.Table) -> pa.Table:
        price_c = _cents(t["l_extendedprice"])
        disc_pct = pc.cast(pc.round(pc.multiply(
            t["l_discount"], pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(price_c, pc.subtract(
            pa.scalar(100, pa.int64()), disc_pct))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "rev_c100": rev})

    li_tagged = broadcast_join(
        li.map_batches(li_tag, batch_format="pyarrow"), supp,
        key="l_suppkey").map_batches(
        lambda t: t.drop_columns(["l_suppkey"]), batch_format="pyarrow")

    joined = bucket_hash_join(li_tagged, order_nation, key="l_orderkey",
                              num_buckets=32)
    same_nation = joined.map_batches(
        lambda t: t.filter(pc.equal(t["s_nationkey"], t["c_nationkey"])),
        batch_format="pyarrow")
    out = partial_groupby(same_nation, ["n_name"],
                          {"revenue_c100": ("rev_c100", "sum"),
                           "n_items": ("rev_c100", "count")})
    t = collect_table(out).sort_by("n_name")
    return pa.table({
        "n_name": t["n_name"],
        "revenue": pc.divide(pc.cast(t["revenue_c100"], pa.float64()),
                             10000.0),
        "n_items": t["n_items"],
    })


def q_customer_order_stats(sf_dir: str) -> pa.Table:
    """Large-large bucketed hash join orders ⋈ customer + grouped stats per
    market segment (count/max are order-insensitive exact)."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_mktsegment"]),
        batch_format="pyarrow")
    joined = bucket_hash_join(orders, cust, key="o_custkey", num_buckets=16)
    out = partial_groupby(joined, ["c_mktsegment"], {
        "n_orders": ("o_totalprice", "count"),
        "max_price": ("o_totalprice", "max"),
        "min_price": ("o_totalprice", "min"),
    })
    return collect_table(out).sort_by("c_mktsegment")


def q_orders_above_avg(sf_dir: str, num_buckets: int = 32) -> pa.Table:
    """Decorrelated-subquery shape (TPC-H Q17 family): orders strictly
    above their OWN customer's average order price. The correlated
    ``WHERE o_totalprice > (SELECT AVG(..) ..)`` decorrelates inside
    ONE custkey-bucket exchange: every customer's orders co-locate, so
    the per-customer sum+count folds in the bucket that already holds
    them and the integer cross-multiplied filter (``price_c · n >
    sum_c`` — exact, no float division on either side) applies in
    place. No O(customers) driver collect, no broadcast — the
    single-exchange rewrite of the round-2 combiner+broadcast shape
    (same rows, same hash; the aggregate exchange, the driver
    round-trip and the second parquet read all fold away)."""
    from raydoc.functions.joins import _key_hash

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"])

    out_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("o_custkey", pa.int64()),
                            ("o_totalprice", pa.float64())])

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.schema.names:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "o_orderkey": pa.array([], pa.int64()),
                             "o_custkey": pa.array([], pa.int64()),
                             "o_totalprice": pa.array([], pa.float64()),
                             "price_c": pa.array([], pa.int64())})
        b = _key_hash(t["o_custkey"].combine_chunks(), num_buckets)
        return pa.table({"bucket": pa.array(b, pa.int32()),
                         "o_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"],
                         "o_totalprice": t["o_totalprice"],
                         "price_c": _cents(t["o_totalprice"])})

    def per_bucket(g: pa.Table) -> pa.Table:
        agg = pa.table({"o_custkey": g["o_custkey"],
                        "price_c": g["price_c"]}) \
            .group_by("o_custkey", use_threads=False).aggregate(
            [("price_c", "sum"), ("price_c", "count")])
        j = g.join(agg, keys="o_custkey")
        keep = pc.greater(pc.multiply(j["price_c"], j["price_c_count"]),
                          j["price_c_sum"])
        return j.filter(keep).select(out_schema.names).cast(out_schema)

    out = orders.map_batches(prep, batch_format="pyarrow") \
        .groupby("bucket").map_groups(per_bucket, batch_format="pyarrow")
    return collect_table(out).sort_by("o_orderkey")


def q_customer_order_dist(sf_dir: str) -> pa.Table:
    """TPC-H Q13 shape: the distribution of customers by order count,
    INCLUDING zero-order customers (the left-outer subtlety). Orders
    pre-reduce map-side to per-batch (custkey, n) partials, the partial
    stream and the customer stream tag_union into ONE custkey-bucket
    exchange, and each bucket folds its counts, LEFT-joins its own
    customers (null→0) and emits a tiny per-bucket histogram partial —
    no O(customers) driver collect, no broadcast (the single-exchange
    rewrite of the round-2 combiner+broadcast shape; same rows, same
    hash)."""
    from raydoc.functions.joins import tag_union

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def ord_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.schema.names:
            return pa.table({"c_custkey": pa.array([], pa.int64()),
                             "ocnt": pa.array([], pa.int64())})
        g = pa.table({"c_custkey": t["o_custkey"],
                      "one": pa.array(np.ones(t.num_rows, np.int64))}) \
            .group_by("c_custkey", use_threads=False).aggregate(
            [("one", "sum")])
        return g.rename_columns(["c_custkey", "ocnt"])

    cust = _read(sf_dir, "customer", ["c_custkey"])

    def cust_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_custkey" not in t.schema.names:
            return pa.table({"c_custkey": pa.array([], pa.int64())})
        return pa.table({"c_custkey": pc.cast(t["c_custkey"],
                                              pa.int64())})

    fields = [("c_custkey", pa.int64()), ("ocnt", pa.int64())]
    tagged = tag_union(
        orders.map_batches(ord_partial, batch_format="pyarrow"),
        cust.map_batches(cust_prep, batch_format="pyarrow"),
        "c_custkey", fields, num_buckets=32)

    hist_schema = pa.schema([("c_count", pa.int64()),
                             ("n_cust", pa.int64())])

    def per_bucket(g: pa.Table) -> pa.Table:
        side = g.column("__side")
        o = g.filter(pc.equal(side, 0)).select(["c_custkey", "ocnt"])
        c = g.filter(pc.equal(side, 1)).select(["c_custkey"])
        if c.num_rows == 0:
            return hist_schema.empty_table()
        folded = o.group_by("c_custkey", use_threads=False).aggregate(
            [("ocnt", "sum")])
        j = c.join(folded, keys="c_custkey", join_type="left outer")
        cc = pc.coalesce(j["ocnt_sum"], pa.scalar(0, pa.int64()))
        h = pa.table({"c_count": cc,
                      "one": pa.array(np.ones(len(cc), np.int64))}) \
            .group_by("c_count", use_threads=False).aggregate(
            [("one", "sum")])
        return h.rename_columns(["c_count", "n_cust"]).cast(hist_schema)

    dist = partial_groupby(
        tagged.groupby("__bucket").map_groups(per_bucket,
                                              batch_format="pyarrow"),
        ["c_count"], {"n_cust": ("n_cust", "sum")})
    t = collect_table(dist).sort_by([("c_count", "ascending")])
    return pa.table({"c_count": t["c_count"].cast(pa.int64()),
                     "n_cust": t["n_cust"].cast(pa.int64())})


def q_brand_volume(sf_dir: str) -> pa.Table:
    """lineitem ⋈ part (broadcast) → exact quantity totals per brand."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand"])
    part = part.rename_columns(["l_partkey", "p_brand"])
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    joined = broadcast_join(li, part, key="l_partkey")

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"p_brand": t["p_brand"],
                         "qty": pc.cast(t["l_quantity"], pa.int64())})

    out = partial_groupby(joined.map_batches(prep, batch_format="pyarrow"),
                          ["p_brand"], {"sum_qty": ("qty", "sum"),
                                        "n_items": ("qty", "count")})
    return collect_table(out).sort_by("p_brand")


_HOUR_US = 3_600_000_000


def q_click_error_matrix(sf_dir: str) -> pa.Table:
    """Per-(user, hour) click AND error counts, FULL-OUTER semantics:
    hours where a user clicked but never errored (and vice versa) emit
    with a zero on the other side.

    Shape — ONE exchange, no join operator: both event kinds reduce to
    batch-local partial counts keyed (user_id, hour, kind), users
    coarse-bucket by hash so every (user, hour) cell lives in exactly one
    bucket, and each bucket pivots its cells vectorized (pandas
    unstack) straight into FINAL rows — additive partials make the outer
    join a fill_value=0."""
    import numpy as np
    import pandas as pd

    from raydoc.functions._buckets import reduce_bucket_count

    mask = reduce_bucket_count() - 1
    ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["event_type"],
                              pa.array(["click", "error"])))
        hours = pc.divide(pc.cast(t["ts"], pa.int64()),
                          pa.scalar(_HOUR_US, pa.int64()))
        g = pa.table({"user_id": t["user_id"], "hour": hours,
                      "kind": t["event_type"]}).group_by(
            ["user_id", "hour", "kind"]).aggregate([("kind", "count")])
        return pa.table({
            "user_id": g["user_id"], "hour": g["hour"],
            "kind": g["kind"], "n": g["kind_count"],
        }).append_column(
            "bucket", pc.cast(pc.bit_wise_and(g["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cell = (g.groupby(["user_id", "hour", "kind"], sort=False)["n"]
                .sum().unstack("kind", fill_value=0).reset_index())
        for col in ("click", "error"):
            if col not in cell.columns:
                cell[col] = 0
        return pd.DataFrame({
            "user_id": cell["user_id"],
            "hour": cell["hour"],
            "n_clicks": cell["click"].astype(np.int64),
            "n_errors": cell["error"].astype(np.int64)})

    out = (ev.map_batches(prep, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket,
                                         batch_format="pandas"))
    t = collect_table(out)
    return pa.table({
        "user_id": t["user_id"],
        "window_start": pc.multiply(
            t["hour"], pa.scalar(_HOUR_US, pa.int64())).cast(
            pa.timestamp("us")),
        "n_clicks": t["n_clicks"],
        "n_errors": t["n_errors"],
    }).sort_by([("user_id", "ascending"), ("window_start", "ascending")])


def q_top_events(sf_dir: str) -> pa.Table:
    """Global sort + limit with deterministic tiebreak."""
    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
    top = ds.sort(["value", "event_id"], descending=[True, False]).limit(100)
    return collect_table(top).select(
        ["event_id", "event_type", "value"])


def q_supplier_by_nation(sf_dir: str) -> pa.Table:
    """supplier ⋈ nation (broadcast small side) → per-nation supplier count
    and exact total account balance in cents."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nation = nation.rename_columns(["s_nationkey", "n_name"])
    sup = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    joined = broadcast_join(sup, nation, key="s_nationkey")

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["s_acctbal"], 100)), pa.int64())
        return pa.table({"n_name": t["n_name"], "bal_cents": cents})

    out = partial_groupby(joined.map_batches(prep, batch_format="pyarrow"),
                          ["n_name"], {"n_suppliers": ("bal_cents", "count"),
                                       "total_acctbal_cents": ("bal_cents", "sum")})
    return collect_table(out).sort_by("n_name")


def q_user_topk_events(sf_dir: str, k: int = 3,
                       num_buckets: int | None = None) -> pa.Table:
    """Per-user top-k events by value (windowed rank): coarse-bucket the
    users, rank inside each block with a vectorized sort — the grouped
    top-k pattern that avoids per-user micro-groups."""
    import numpy as np
    import pandas as pd

    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = _read(sf_dir, "events", ["user_id", "event_id", "value"])

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "value", "event_id"],
                          ascending=[True, False, True], ignore_index=True)
        rank = g.groupby("user_id", sort=False).cumcount() + 1
        g = g.assign(rank=rank.astype(np.int64))
        return g[g["rank"] <= k][["user_id", "rank", "event_id", "value"]]

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("bucket").map_groups(per_bucket, batch_format="pandas"))
    return collect_table(out).sort_by(
        [("user_id", "ascending"), ("rank", "ascending")])


def q_pdf_dates(sf_dir: str) -> pa.Table:
    """M12 round-trip over real timestamps: events.ts → PDF ``D:`` string →
    parse_pdf_date → ISO 8601 (oracle: strftime)."""
    from raydoc.kernels.textnorm import parse_pdf_date

    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def fn(t: pa.Table) -> pa.Table:
        import datetime as _dt
        isos = []
        for us in pc.cast(t["ts"], pa.int64()).to_pylist():
            dt = _dt.datetime(1970, 1, 1) + _dt.timedelta(microseconds=us)
            isos.append(parse_pdf_date(dt.strftime("D:%Y%m%d%H%M%S")))
        return pa.table({"event_id": t["event_id"],
                         "iso_date": pa.array(isos, pa.string())})

    out = ds.map_batches(fn, batch_format="pyarrow")
    return collect_table(out).sort_by("event_id")


def q_json_props_stats(sf_dir: str) -> pa.Table:
    """Semi-structured extraction: parse the events JSON ``props`` column
    per batch, pull ``k``, and aggregate exactly per event_type (combiner
    partials; null-safe — unparseable/absent k drops the row, matching the
    SQL oracle's json_extract semantics)."""
    import json

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def prep(t: pa.Table) -> pa.Table:
        types, ks = [], []
        for et, pr in zip(t.column("event_type").to_pylist(),
                          t.column("props").to_pylist()):
            try:
                k = json.loads(pr)["k"]
            except (TypeError, ValueError, KeyError):
                continue
            types.append(et)
            ks.append(int(k))
        return pa.table({"event_type": pa.array(types, pa.string()),
                         "k": pa.array(ks, pa.int64())})

    out = partial_groupby(ds.map_batches(prep, batch_format="pyarrow"),
                          ["event_type"], {"n_events": ("k", "count"),
                                           "sum_k": ("k", "sum"),
                                           "max_k": ("k", "max")})
    t = collect_table(out)
    if t.num_rows == 0 or "event_type" not in t.schema.names:
        # no event carries key "k" → fully-empty (schemaless) aggregate
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_events": pa.array([], pa.int64()),
                         "sum_k": pa.array([], pa.int64()),
                         "max_k": pa.array([], pa.int64())})
    return t.sort_by("event_type")


def pivot_agg(ds: rd.Dataset, index: list[str], pivot_col: str,
              values: list[str] | None = None,
              value_col: str | None = None,
              prefix: str = "n_") -> pa.Table:
    """Wide pivot: one output column per ``pivot_col`` value, counting rows
    (or summing int64 ``value_col``) per ``index`` group.

    The pivot happens INSIDE the per-batch combiner — each batch reduces to
    one row per local index key with k indicator-sum columns — so the
    shuffle moves partials with k extra int columns, never raw rows. With
    ``values=None`` the distinct pivot values are discovered first via
    their own combiner pass (small: the set of distinct categories).
    """
    if values is None:
        vals = collect_table(partial_groupby(
            ds, [pivot_col], {"__n": (pivot_col, "count")}))
        values = sorted(v for v in vals.column(pivot_col).to_pylist()
                        if v is not None)

    def prep(t: pa.Table) -> pa.Table:
        cols = {k: t.column(k) for k in index}
        pv = t.column(pivot_col)
        src = (pc.cast(t.column(value_col), pa.int64()) if value_col
               else pa.nulls(t.num_rows, pa.int64()).fill_null(1))
        for v in values:
            ind = pc.cast(pc.equal(pv, v), pa.int64()).fill_null(0)
            cols[f"{prefix}{v}"] = pc.multiply(ind, src)
        return pa.table(cols)

    out = partial_groupby(
        ds.map_batches(prep, batch_format="pyarrow"), index,
        {f"{prefix}{v}": (f"{prefix}{v}", "sum") for v in values})
    return collect_table(out).sort_by([(k, "ascending") for k in index])


def q_status_priority_pivot(sf_dir: str) -> pa.Table:
    """Orders count matrix: rows = o_orderpriority, one column per
    o_orderstatus (discovered) — the pivot/crosstab operator."""
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"])
    return pivot_agg(ds, ["o_orderpriority"], "o_orderstatus")


def unpivot(t: pa.Table, id_cols: list[str], value_cols: list[str],
            var_name: str = "variable",
            value_name: str = "value") -> pa.Table:
    """Melt a wide table back to long form — pivot's inverse (the SQL
    UNPIVOT): one output row per (input row × value column). Pure Arrow
    column stacking (no row loop); a driver-table helper because wide
    pivot OUTPUTS are aggregate-sized by construction. For a wide RAW
    dataset, apply the same stacking inside ``map_batches``."""
    n = t.num_rows
    pieces = []
    for c in value_cols:
        cols = {k: t.column(k) for k in id_cols}
        cols[var_name] = pa.array([c] * n, pa.string())
        cols[value_name] = t.column(c)
        pieces.append(pa.table(cols))
    # permissive promotion melts mixed numeric value columns (int64 +
    # float64 wide tables) like pandas.melt instead of raising
    return pa.concat_tables(pieces, promote_options="permissive")


def q_status_priority_unpivot(sf_dir: str) -> pa.Table:
    """pivot ∘ unpivot ≡ the plain long-form GROUP BY — the melt operator
    verified through its algebraic identity (the SQL twin is the direct
    two-key count with the pivot column name prefixed like the wide
    pivot's columns)."""
    wide = q_status_priority_pivot(sf_dir)
    value_cols = [c for c in wide.column_names if c.startswith("n_")]
    long = unpivot(wide, ["o_orderpriority"], value_cols,
                   var_name="status_col", value_name="n_orders")
    return long.sort_by([("o_orderpriority", "ascending"),
                         ("status_col", "ascending")])


def rollup_aggregate(ds: rd.Dataset, keys: list[str],
                     spec: dict[str, tuple[str, str]]) -> pa.Table:
    """``GROUP BY ROLLUP(keys)``: aggregates at every key prefix, rolled-up
    key columns null (SQL rollup semantics).

    One distributed combiner pass computes the finest level; every coarser
    level re-aggregates the finest RESULT (size = #distinct groups — the
    already-reduced aggregate output, never the input), so the input is
    scanned once and no extra shuffle runs.
    """
    finest = collect_table(partial_groupby(ds, keys, spec))
    # coarser levels re-aggregate sums/mins/maxes; partial counts add up
    refold = {out: (out, "sum" if kind in ("sum", "count") else kind)
              for out, (_, kind) in spec.items()}
    levels = [finest]
    for depth in range(len(keys) - 1, -1, -1):
        kept = keys[:depth]
        aggs = [(col, {"sum": "sum", "min": "min", "max": "max"}[kind])
                for col, kind in refold.values()]
        g = finest.group_by(kept).aggregate(aggs)   # kept=[] ⇒ grand total
        renames = {f"{col}_{kind}": out
                   for out, (col, kind) in refold.items()}
        g = g.rename_columns([renames.get(c, c) for c in g.column_names])
        for missing in keys[depth:]:
            g = g.append_column(
                missing, pa.nulls(g.num_rows, finest.schema.field(missing).type))
        levels.append(g.select(finest.column_names))
    out = pa.concat_tables(levels)
    return out.sort_by([(k, "ascending") for k in keys] )


def q_rollup_pricing(sf_dir: str) -> pa.Table:
    """ROLLUP(l_returnflag, l_linestatus) over lineitem — subtotals and a
    grand total in one pass."""
    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_quantity"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "qty": pc.cast(t["l_quantity"], pa.int64()),
        })

    return rollup_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["l_returnflag", "l_linestatus"],
        {"sum_qty": ("qty", "sum"), "n_items": ("qty", "count")})


def cube_aggregate(ds: rd.Dataset, keys: list[str],
                   spec: dict[str, tuple[str, str]]) -> pa.Table:
    """``GROUP BY CUBE(keys)``: aggregates at EVERY key subset (2^k
    grouping sets), absent key columns null — SQL cube semantics.

    Same shape as ``rollup_aggregate``: one distributed combiner pass
    computes the finest level; every other grouping set re-aggregates the
    finest RESULT (size = #distinct finest groups, already tiny), so the
    input streams once and only one shuffle runs regardless of k.
    """
    from itertools import combinations

    finest = collect_table(partial_groupby(ds, keys, spec))
    refold = {out: (out, "sum" if kind in ("sum", "count") else kind)
              for out, (_, kind) in spec.items()}
    aggs = [(col, {"sum": "sum", "min": "min", "max": "max"}[kind])
            for col, kind in refold.values()]
    renames = {f"{col}_{kind}": out for out, (col, kind) in refold.items()}

    levels = [finest]
    subsets = [list(c) for r in range(len(keys))
               for c in combinations(keys, r)]
    for kept in subsets:
        g = finest.group_by(kept).aggregate(aggs)   # kept=[] ⇒ grand total
        g = g.rename_columns([renames.get(c, c) for c in g.column_names])
        for missing in (k for k in keys if k not in kept):
            g = g.append_column(
                missing, pa.nulls(g.num_rows,
                                  finest.schema.field(missing).type))
        levels.append(g.select(finest.column_names))
    out = pa.concat_tables(levels)
    return out.sort_by([(k, "ascending") for k in keys])


def grouping_sets_aggregate(ds: rd.Dataset, keys: list[str],
                            sets: list[list[str]],
                            spec: dict[str, tuple[str, str]]) -> pa.Table:
    """``GROUP BY GROUPING SETS(sets)`` — the general form that CUBE and
    ROLLUP specialize: aggregate at exactly the requested key subsets,
    absent key columns null.

    Same one-shuffle shape as ``cube_aggregate``: one distributed
    combiner pass computes the finest level (GROUP BY all ``keys``);
    every requested set re-aggregates that already-tiny RESULT. The
    finest level itself appears in the output only if requested."""
    for s in sets:
        unknown = set(s) - set(keys)
        if unknown:
            raise ValueError(f"grouping set {s} references unknown "
                             f"keys {sorted(unknown)}")

    finest = collect_table(partial_groupby(ds, keys, spec))
    refold = {out: (out, "sum" if kind in ("sum", "count") else kind)
              for out, (_, kind) in spec.items()}
    aggs = [(col, {"sum": "sum", "min": "min", "max": "max"}[kind])
            for col, kind in refold.values()]
    renames = {f"{col}_{kind}": out for out, (col, kind) in refold.items()}

    levels = []
    for kept in sets:
        if sorted(kept) == sorted(keys):
            levels.append(finest)
            continue
        g = finest.group_by(kept).aggregate(aggs)   # kept=[] ⇒ grand total
        g = g.rename_columns([renames.get(c, c) for c in g.column_names])
        for missing in (k for k in keys if k not in kept):
            g = g.append_column(
                missing, pa.nulls(g.num_rows,
                                  finest.schema.field(missing).type))
        levels.append(g.select(finest.column_names))
    out = pa.concat_tables(levels)
    return out.sort_by([(k, "ascending") for k in keys])


def q_status_priority_sets(sf_dir: str) -> pa.Table:
    """GROUPING SETS ((status), (priority)): two independent subtotal
    dimensions in one input pass — the case CUBE over-computes."""
    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderstatus": t["o_orderstatus"],
            "o_orderpriority": t["o_orderpriority"],
            "price_c": pc.cast(pc.round(pc.multiply(
                t["o_totalprice"], pa.scalar(100.0))), pa.int64()),
        })

    return grouping_sets_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["o_orderstatus", "o_orderpriority"],
        [["o_orderstatus"], ["o_orderpriority"]],
        {"total_cents": ("price_c", "sum"),
         "n_orders": ("price_c", "count")})


def q_cube_orders(sf_dir: str) -> pa.Table:
    """CUBE(o_orderstatus, o_orderpriority) over orders: exact totals in
    cents at all four grouping sets."""
    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderstatus": t["o_orderstatus"],
            "o_orderpriority": t["o_orderpriority"],
            "price_c": pc.cast(pc.round(pc.multiply(
                t["o_totalprice"], pa.scalar(100.0))), pa.int64()),
        })

    return cube_aggregate(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["o_orderstatus", "o_orderpriority"],
        {"total_cents": ("price_c", "sum"), "n_orders": ("price_c", "count")})


def q_customers_semi_f(sf_dir: str) -> pa.Table:
    """Semi-join: customers with at least one F-status order (EXISTS)."""
    from raydoc.functions.joins import bucket_semi_join
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    f_orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_orderstatus"]) \
        .map_batches(lambda t: t.filter(
            pc.equal(t["o_orderstatus"], "F")).select(["o_custkey"])
            .rename_columns(["c_custkey"]), batch_format="pyarrow")
    out = bucket_semi_join(cust, f_orders, key="c_custkey")
    return collect_table(out).sort_by("c_custkey")


def q_customers_anti_f(sf_dir: str) -> pa.Table:
    """Anti-join: customers with NO F-status order (NOT EXISTS)."""
    from raydoc.functions.joins import bucket_semi_join
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    f_orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_orderstatus"]) \
        .map_batches(lambda t: t.filter(
            pc.equal(t["o_orderstatus"], "F")).select(["o_custkey"])
            .rename_columns(["c_custkey"]), batch_format="pyarrow")
    out = bucket_semi_join(cust, f_orders, key="c_custkey", anti=True)
    return collect_table(out).sort_by("c_custkey")


def q_order_status_except(sf_dir: str) -> pa.Table:
    """Set difference: custkeys holding an O-status order but never an
    F-status order (SQL EXCEPT on a key column)."""
    from raydoc.functions.joins import except_distinct

    def side(status: str) -> rd.Dataset:
        return rd.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_orderstatus"]) \
            .map_batches(lambda t, s=status: t.filter(
                pc.equal(t["o_orderstatus"], s)).select(["o_custkey"]),
                batch_format="pyarrow")

    out = except_distinct(side("O"), side("F"), key="o_custkey")
    return collect_table(out).sort_by("o_custkey")


def q_order_status_intersect(sf_dir: str) -> pa.Table:
    """Set intersection: custkeys holding BOTH an O-status and an
    F-status order (SQL INTERSECT on a key column)."""
    from raydoc.functions.joins import intersect_distinct

    def side(status: str) -> rd.Dataset:
        return rd.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_orderstatus"]) \
            .map_batches(lambda t, s=status: t.filter(
                pc.equal(t["o_orderstatus"], s)).select(["o_custkey"]),
                batch_format="pyarrow")

    out = intersect_distinct(side("O"), side("F"), key="o_custkey")
    return collect_table(out).sort_by("o_custkey")


def q_stratified_sample(sf_dir: str, per_type: int = 20,
                        num_buckets: int | None = None) -> pa.Table:
    """Deterministic stratified sample: ``per_type`` events per event_type
    under a content-derived pseudo-random order (md5 of the event id) —
    stable across runs, cluster sizes and input order, and EXACTLY
    replicable in SQL (same md5 ranking).

    Two-phase rank so no stratum ever lands in a single task: phase 1
    keeps the LOCAL md5-top-``per_type`` per stratum within each coarse
    event_id-hash bucket (the global per-type top-N is always a subset of
    the union of per-bucket top-Ns), phase 2 merges the tiny survivor set
    (≤ buckets × strata × per_type rows) with one final rank. A dominant
    event_type spreads across all buckets instead of one pandas group."""
    import hashlib as _hl

    import pandas as pd

    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def add_keys(t: pa.Table) -> pa.Table:
        keys = [_hl.md5(str(v).encode()).hexdigest()
                for v in t.column("event_id").to_pylist()]
        t = t.append_column("rk", pa.array(keys, pa.string()))
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["event_id"], mask),
                              pa.int32()))

    def local_top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["event_type", "rk"], ignore_index=True)
        rank = g.groupby("event_type", sort=False).cumcount()
        return g[rank < per_type][["event_id", "event_type", "rk"]]

    survivors = collect_table(
        ds.map_batches(add_keys, batch_format="pyarrow")
          .groupby("bucket").map_groups(local_top, batch_format="pandas"))
    df = survivors.to_pandas().sort_values(["event_type", "rk"],
                                           ignore_index=True)
    rank = df.groupby("event_type", sort=False).cumcount()
    out = pa.Table.from_pandas(
        df[rank < per_type][["event_id", "event_type"]],
        preserve_index=False)
    return out.sort_by(
        [("event_type", "ascending"), ("event_id", "ascending")])


def q_orders_upsert(sf_dir: str) -> pa.Table:
    """CDC merge: orders (version 1) upserted with a derived update stream
    (every 7th orderkey, price bumped by 1.00, version 2) — one surviving
    row per orderkey, last writer wins. The lakehouse merge-on-read
    operator (functions/joins.py:merge_upsert) with a QUALIFY
    ROW_NUMBER SQL twin."""
    from raydoc.functions.joins import merge_upsert

    cols = ["o_orderkey", "o_custkey", "o_totalprice"]

    def base_fn(t: pa.Table) -> pa.Table:
        return t.append_column("version",
                               pa.array([1] * t.num_rows, pa.int64()))

    def upd_fn(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"]
        t = t.filter(pc.equal(_pc_mod(k, 7), 0))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "o_totalprice": pc.add(t["o_totalprice"], 1.0),
            "version": pa.array([2] * t.num_rows, pa.int64()),
        })

    base = _read(sf_dir, "orders", cols).map_batches(
        base_fn, batch_format="pyarrow")
    updates = _read(sf_dir, "orders", cols).map_batches(
        upd_fn, batch_format="pyarrow")
    out = merge_upsert(base, updates, key="o_orderkey",
                       version_col="version", num_buckets=16)
    return collect_table(out).sort_by("o_orderkey")


def q_cheapest_supplier_per_part(sf_dir: str) -> pa.Table:
    """(p_partkey, s_suppkey, s_name, best_price): per part, the supplier
    quoting the LOWEST lineitem extendedprice (ties → lowest suppkey) —
    the TPC-H Q2 correlated-min family re-expressed over lineitem (this
    corpus has no partsupp table; reference analog: the min-cost
    candidate-selection joins in structure_engine's table matching).

    Scale shape: the per-part ARGMIN is a pure MIN aggregate over a
    bit-packed ``price_cents·2²⁰ + suppkey`` int64 key (suppkey < 2²⁰,
    price < $10⁸ — asserted), so it rides the existing combiner
    ``partial_groupby`` — one partial row per part per batch crosses the
    wire, never a row stream. Supplier names attach via a broadcast join
    (dimension table shipped once via ray.put)."""
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice"])

    def pack(t: pa.Table) -> pa.Table:
        cents = _cents(t["l_extendedprice"])
        if t.num_rows and (
                pc.max(cents).as_py() >= (1 << 43)
                or pc.max(t["l_suppkey"]).as_py() >= (1 << 20)):
            raise ValueError("argmin pack overflow: price or suppkey "
                             "out of packable range")
        packed = pc.add(pc.multiply(cents, pa.scalar(1 << 20, pa.int64())),
                        pc.cast(t["l_suppkey"], pa.int64()))
        return pa.table({"p_partkey": t["l_partkey"], "packed": packed})

    best = partial_groupby(li.map_batches(pack, batch_format="pyarrow"),
                           ["p_partkey"], {"best": ("packed", "min")})

    def unpack(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_partkey": t["p_partkey"],
            "s_suppkey": pc.bit_wise_and(
                t["best"], pa.scalar((1 << 20) - 1, pa.int64())),
            "best_price_cents": pc.divide(t["best"],
                                          pa.scalar(1 << 20, pa.int64()))})

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    out = broadcast_join(best.map_batches(unpack, batch_format="pyarrow"),
                         sup, "s_suppkey")
    return collect_table(out).select(
        ["p_partkey", "s_suppkey", "s_name", "best_price_cents"]).sort_by(
        "p_partkey")


def q_rich_inactive_customers(sf_dir: str) -> pa.Table:
    """(c_nationkey, n_custs, total_bal_cents): count + balance of
    customers whose account balance exceeds the GLOBAL average positive
    balance and who placed no FINISHED (F-status) order — TPC-H Q22's
    shape (scalar subquery threshold + NOT EXISTS anti-join +
    aggregate); the F-status predicate keeps the result non-vacuous on
    this corpus, where every customer has at least one order.

    Scale shape: the threshold is one tiny combiner aggregate (two int64
    partials per batch; floor-divide on the driver keeps it integer-exact
    like the SQL twin); it is closed over as a SCALAR — never joined. The
    NOT EXISTS is the existing bucketed hash semi-join (anti=True): both
    sides shuffle once on the same key, no driver materialization. The
    final per-nation rollup is again combiner partials."""
    from raydoc.functions.joins import bucket_semi_join

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"])

    def to_cents(t: pa.Table) -> pa.Table:
        return pa.table({"c_custkey": t["c_custkey"],
                         "c_nationkey": t["c_nationkey"],
                         "bal_c": _cents(t["c_acctbal"])})

    # materialized: TWO consumers (threshold scan, rich filter) — a lazy
    # branch would re-read customer; the pinned set is 3 ints per row
    cents = cust.map_batches(to_cents, batch_format="pyarrow").materialize()

    def pos_only(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["bal_c"], 0))
        return t.append_column("one",
                               pa.array([1] * t.num_rows, pa.int64()))

    pos = cents.map_batches(pos_only, batch_format="pyarrow")
    tot = collect_table(partial_groupby(
        pos, ["one"], {"s": ("bal_c", "sum"), "n": ("bal_c", "count")}))
    thr_c = (tot.column("s")[0].as_py()
             // max(tot.column("n")[0].as_py(), 1))

    rich = cents.map_batches(
        lambda t: t.filter(pc.greater(t["bal_c"], thr_c)),
        batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderstatus"]).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderstatus"], "F"))
        .select(["o_custkey"]).rename_columns(["c_custkey"]),
        batch_format="pyarrow")
    inactive = bucket_semi_join(rich, orders, key="c_custkey", anti=True)

    out = partial_groupby(inactive, ["c_nationkey"],
                          {"n_custs": ("c_custkey", "count"),
                           "total_bal_cents": ("bal_c", "sum")})
    t = collect_table(out)
    if t.num_rows == 0:        # empty Ray blocks carry an EMPTY schema
        return pa.table({"c_nationkey": pa.array([], pa.int64()),
                         "n_custs": pa.array([], pa.int64()),
                         "total_bal_cents": pa.array([], pa.int64())})
    return t.sort_by("c_nationkey")


def _skyline2d_mask(price: np.ndarray, date: np.ndarray) -> np.ndarray:
    """Boolean mask of the 2-D maximize/maximize Pareto frontier: row i
    survives iff no row j has (price_j >= price_i AND date_j >= date_i)
    with at least one strict. Duplicates on BOTH dims all survive.
    O(n log n): sort by (price desc, date desc); within an equal-price
    group only group-max dates survive the same-price check, and the
    strictly-higher-price check compares against the running max of
    previous groups' max dates."""
    n = price.size
    if n == 0:
        return np.zeros(0, bool)
    order = np.lexsort((-date, -price))
    p, d = price[order], date[order]
    grp_start = np.empty(n, bool)
    grp_start[0] = True
    grp_start[1:] = p[1:] != p[:-1]
    gid = np.cumsum(grp_start) - 1
    gmax = d[grp_start]                   # group sorted date-desc → first
    prev = np.empty(gmax.size, np.int64)  # max date over HIGHER-price grps
    prev[0] = np.iinfo(np.int64).min
    if gmax.size > 1:
        np.maximum.accumulate(gmax[:-1], out=prev[1:])
    keep_sorted = (d == gmax[gid]) & (d > prev[gid])
    mask = np.zeros(n, bool)
    mask[order] = keep_sorted
    return mask


def q_skyline_orders(sf_dir: str) -> pa.Table:
    """(o_orderkey, price_c, o_orderdate): the Pareto frontier of orders
    maximizing BOTH total price and order date — no other order is at
    least as expensive AND at least as recent with one strict (the
    dominance/skyline query family; reference analog: the dominant-
    candidate selection in structure_engine's best-match scoring).

    Scale shape: the global skyline is a subset of every partition's
    local skyline, so each batch filters to its own frontier first (the
    vectorized O(n log n) mask above) and only local survivors — for
    independent-ish dims an O(log n)-sized set per batch — reach the
    driver for one final exact pass. No shuffle at all. The known
    hazard (adversarially anti-correlated dims make every row a skyline
    point) does not arise for price×date; a cap guard raises rather
    than OOMs the driver."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_totalprice", "o_orderdate"])

    def local_skyline(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:        # empty Ray blocks carry an EMPTY schema
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "price_c": pa.array([], pa.int64()),
                             "o_orderdate": pa.array([],
                                                     pa.timestamp("us"))})
        price = _cents(t["o_totalprice"]).to_numpy(zero_copy_only=False)
        date = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(
            zero_copy_only=False)
        mask = _skyline2d_mask(price, date)
        out = pa.table({"o_orderkey": t["o_orderkey"],
                        "price_c": pa.array(price, pa.int64()),
                        "o_orderdate": t["o_orderdate"]})
        return out.filter(pa.array(mask))

    cand = collect_table(ds.map_batches(local_skyline,
                                        batch_format="pyarrow"))
    if cand.num_rows > 2_000_000:
        raise ValueError(
            f"skyline candidate set unexpectedly large ({cand.num_rows} "
            "rows) — dims look anti-correlated; shard the final merge")
    if cand.num_rows == 0:
        return pa.table({"o_orderkey": pa.array([], pa.int64()),
                         "price_c": pa.array([], pa.int64()),
                         "o_orderdate": pa.array([], pa.timestamp("us"))})
    mask = _skyline2d_mask(
        cand.column("price_c").to_numpy(zero_copy_only=False),
        cand.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False))
    return cand.filter(pa.array(mask)).sort_by("o_orderkey")


def q_top_supplier_revenue(sf_dir: str) -> pa.Table:
    """(s_suppkey, s_name, revenue_c100): the supplier(s) with the MAX
    lineitem revenue (price·(100-disc%) on integer cents, so revenue_c100
    is exact cents×100) shipped in [1996-01-01, 1996-04-01) — TPC-H Q15
    (max-with-ties via a scalar subquery, not LIMIT 1).

    Scale shape: per-supplier revenue is a combiner ``partial_groupby``
    (one partial row per supplier per batch); the max is taken on the
    driver over the tiny per-supplier table and ties filter locally;
    names attach via a broadcast dimension join."""
    import datetime
    lo = pa.scalar(datetime.datetime(1996, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime.datetime(1996, 4, 1), pa.timestamp("us"))
    ds = _read(sf_dir, "lineitem",
               ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(t["l_shipdate"], lo),
                       pc.less(t["l_shipdate"], hi))
        t = t.filter(keep)
        price_c = _cents(t["l_extendedprice"])
        disc_pct = pc.cast(pc.round(pc.multiply(
            t["l_discount"], pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(price_c, pc.subtract(
            pa.scalar(100, pa.int64()), disc_pct))
        return pa.table({"s_suppkey": t["l_suppkey"], "rev": rev})

    per_sup = collect_table(partial_groupby(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["s_suppkey"], {"revenue_c100": ("rev", "sum")}))
    if per_sup.num_rows == 0:
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "revenue_c100": pa.array([], pa.int64())})
    best = pc.max(per_sup["revenue_c100"])
    winners = per_sup.filter(pc.equal(per_sup["revenue_c100"], best))
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"])
    out = winners.join(sup, keys="s_suppkey", join_type="inner")
    return out.select(["s_suppkey", "s_name", "revenue_c100"]).sort_by(
        "s_suppkey")


def q_audience_jaccard(sf_dir: str,
                       num_buckets: int | None = None) -> pa.Table:
    """(type_a, type_b, n_inter, n_union, jaccard): pairwise Jaccard
    similarity between the USER AUDIENCES of every co-occurring pair of
    event types (type_a < type_b) — the audience-overlap primitive
    behind segment analysis and co-occurrence features. ``jaccard`` is
    one IEEE-exact division of two int64s, so it hashes identically to
    the SQL twin; pairs with an empty intersection are omitted by both
    engines (inner-join semantics, documented).

    Scale shape: distinct (user, type) pairs come off a combiner
    groupby (count partials — never a row shuffle); pair generation
    needs each user's types co-located, so ONE coarse user-bucket
    exchange of the distinct pairs (≤ |types| rows per user), then a
    vectorized self-merge per bucket; per-(a,b) intersection counts and
    per-type audience sizes are again combiner partials; the final join
    + division happens on the driver over ≤ C(|types|,2) rows."""
    import pandas as pd

    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    # materialized: TWO consumers (pair generation, audience sizes) — a
    # lazy branch would re-scan events and re-run the distinct exchange;
    # the pinned set is bounded by true (user, type) cardinality
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
        ["type_a", "type_b"], {"n_inter": ("type_a", "count")}))
    sizes = collect_table(partial_groupby(
        distinct, ["event_type"], {"n_aud": ("user_id", "count")}))
    empty = pa.table({"type_a": pa.array([], pa.string()),
                      "type_b": pa.array([], pa.string()),
                      "n_inter": pa.array([], pa.int64()),
                      "n_union": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    if inter.num_rows == 0:
        return empty
    size = dict(zip(sizes.column("event_type").to_pylist(),
                    sizes.column("n_aud").to_pylist()))
    ta = inter.column("type_a").to_pylist()
    tb = inter.column("type_b").to_pylist()
    ni = inter.column("n_inter").to_numpy(zero_copy_only=False)
    nu = np.array([size[a] + size[b] for a, b in zip(ta, tb)],
                  np.int64) - ni
    return pa.table({
        "type_a": inter.column("type_a"),
        "type_b": inter.column("type_b"),
        "n_inter": pc.cast(inter.column("n_inter"), pa.int64()),
        "n_union": pa.array(nu, pa.int64()),
        "jaccard": pa.array(ni.astype(np.float64) / nu.astype(np.float64),
                            pa.float64()),
    }).sort_by([("type_a", "ascending"), ("type_b", "ascending")])


def _order_status_side(sf_dir: str, status: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey", "o_orderstatus"]) \
        .map_batches(lambda t, s=status: t.filter(
            pc.equal(t["o_orderstatus"], s)).select(["o_custkey"]),
            batch_format="pyarrow")


def q_order_status_intersect_all(sf_dir: str) -> pa.Table:
    """Multiset intersection (SQL INTERSECT ALL): each custkey repeated
    min(#O-orders, #F-orders) times — the bag-semantics complement of
    ``order_status_intersect``. Combiner (key, count) partials shuffle,
    never rows; multiplicities re-expand vectorized per bucket."""
    from raydoc.functions.joins import intersect_all

    out = intersect_all(_order_status_side(sf_dir, "O"),
                        _order_status_side(sf_dir, "F"), key="o_custkey")
    t = collect_table(out)
    if t.num_rows == 0:
        return pa.table({"o_custkey": pa.array([], pa.int64())})
    return t.sort_by("o_custkey")


def q_order_status_except_all(sf_dir: str) -> pa.Table:
    """Multiset difference (SQL EXCEPT ALL): each custkey repeated
    max(#O-orders − #F-orders, 0) times. Same combiner-counts shape as
    ``order_status_intersect_all``."""
    from raydoc.functions.joins import except_all

    out = except_all(_order_status_side(sf_dir, "O"),
                     _order_status_side(sf_dir, "F"), key="o_custkey")
    t = collect_table(out)
    if t.num_rows == 0:
        return pa.table({"o_custkey": pa.array([], pa.int64())})
    return t.sort_by("o_custkey")


def q_type_triple_support(sf_dir: str,
                          num_buckets: int | None = None) -> pa.Table:
    """(type_a, type_b, type_c, n_users): for every ordered triple of
    event types (a < b < c), how many users exhibit ALL THREE — the
    frequent-itemset / market-basket support count one size up from
    ``audience_jaccard``'s pairs. Triples a user never completes are
    omitted by both engines (inner semantics).

    Scale shape: identical to audience_jaccard — distinct (user, type)
    off a combiner groupby, ONE coarse user-bucket exchange, then a
    per-bucket vectorized double self-merge generates each user's
    C(t, 3) triples (t = that user's distinct types, ≤ the type-universe
    size — the row explosion is bounded per user, not per corpus);
    per-triple counts are again combiner partials."""
    import pandas as pd

    from raydoc.functions._buckets import reduce_bucket_count
    mask = (num_buckets or reduce_bucket_count()) - 1
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    distinct = partial_groupby(ds, ["user_id", "event_type"],
                               {"n": ("event_type", "count")})

    def add_bucket(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"], "event_type": t["event_type"],
            "bucket": pc.cast(pc.bit_wise_and(t["user_id"], mask),
                              pa.int32())})

    def triples(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["user_id", "event_type"]]
        m2 = d.merge(d, on="user_id")
        m2 = m2[m2["event_type_x"] < m2["event_type_y"]]
        m3 = m2.merge(d.rename(columns={"event_type": "type_c"}),
                      on="user_id")
        m3 = m3[m3["event_type_y"] < m3["type_c"]]
        return m3.rename(columns={"event_type_x": "type_a",
                                  "event_type_y": "type_b"})[
            ["type_a", "type_b", "type_c"]]

    out = partial_groupby(
        distinct.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket").map_groups(triples, batch_format="pandas"),
        ["type_a", "type_b", "type_c"], {"n_users": ("type_a", "count")})
    t = collect_table(out)
    if t.num_rows == 0:
        return pa.table({"type_a": pa.array([], pa.string()),
                         "type_b": pa.array([], pa.string()),
                         "type_c": pa.array([], pa.string()),
                         "n_users": pa.array([], pa.int64())})
    return t.set_column(
        t.schema.get_field_index("n_users"), "n_users",
        t.column("n_users").cast(pa.int64())).sort_by(
        [("type_a", "ascending"), ("type_b", "ascending"),
         ("type_c", "ascending")])


def q_user_type_gini(sf_dir: str) -> pa.Table:
    """(user_id, n_events, gini): Gini impurity of each user's
    event-type mix — ``1 − Σ c_t² / n²`` — the class-balance /
    behavioral-diversity feature for ranking and segmentation models.
    Rational arithmetic only (integer Σc², n², ONE double division and
    one subtraction, both IEEE-exact), so the score hashes identically
    to the SQL twin.

    Scale shape: two stacked combiner groupbys — (user, type) counts,
    then per-user Σc/Σc² — every exchange moves one partial row per key
    per batch; the final arithmetic is one vectorized map."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    counts = partial_groupby(ds, ["user_id", "event_type"],
                             {"c": ("event_type", "count")})

    def sq(t: pa.Table) -> pa.Table:
        c = pc.cast(t["c"], pa.int64())
        return pa.table({"user_id": t["user_id"], "n": c,
                         "ssq": pc.multiply(c, c)})

    per_user = partial_groupby(
        counts.map_batches(sq, batch_format="pyarrow"),
        ["user_id"], {"n_events": ("n", "sum"), "ssq": ("ssq", "sum")})

    def finish(t: pa.Table) -> pa.Table:   # arithmetic rides the workers
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "gini": pa.array([], pa.float64())})
        n = t.column("n_events").to_numpy(zero_copy_only=False)
        ssq = t.column("ssq").to_numpy(zero_copy_only=False)
        gini = 1.0 - (ssq.astype(np.float64) / (n * n).astype(np.float64))
        return pa.table({"user_id": t["user_id"],
                         "n_events": pc.cast(t["n_events"], pa.int64()),
                         "gini": pa.array(gini, pa.float64())})

    t = collect_table(per_user.map_batches(finish, batch_format="pyarrow"))
    if t.num_rows == 0:
        return pa.table({"user_id": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64()),
                         "gini": pa.array([], pa.float64())})
    return t.sort_by("user_id")


def q_ab_test_chi2(sf_dir: str) -> pa.Table:
    """(n_control, conv_control, n_treatment, conv_treatment, chi2):
    2×2 chi-square independence statistic for a deterministic A/B split
    (variant = user_id % 2; conversion = user has ≥1 purchase event) —
    the experimentation-analytics primitive. χ² = N·(ad−bc)² / ((a+b)
    (c+d)(a+c)(b+d)) stays in EXACT integers (Python bigints on the
    driver, HUGEINT in the twin) until ONE final double division, so
    the statistic hashes identically to DuckDB.

    Scale shape: per-user conversion flags come off a combiner groupby
    (max of a 0/1 per user per batch), the 2×2 contingency off a second
    combiner by variant — the driver sees four integers."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "conv": pc.cast(pc.equal(t["event_type"], "purchase"),
                            pa.int64())})

    per_user = partial_groupby(ds.map_batches(prep, batch_format="pyarrow"),
                               ["user_id"], {"conv": ("conv", "max")})

    def variant(t: pa.Table) -> pa.Table:
        return pa.table({
            "variant": pc.bit_wise_and(pc.cast(t["user_id"], pa.int64()),
                                       pa.scalar(1, pa.int64())),
            "one": pa.array(np.ones(t.num_rows, np.int64)),
            "conv": t["conv"]})

    cells = collect_table(partial_groupby(
        per_user.map_batches(variant, batch_format="pyarrow"),
        ["variant"], {"n": ("one", "sum"), "k": ("conv", "sum")}))
    by_v = {r["variant"]: (r["n"], r["k"]) for r in cells.to_pylist()}
    if set(by_v) != {0, 1}:
        raise ValueError("ab_test_chi2 needs users in both parity "
                         f"variants; saw variants {sorted(by_v)}")
    n0, k0 = (int(x) for x in by_v[0])
    n1, k1 = (int(x) for x in by_v[1])
    num = (n0 + n1) * (k0 * (n1 - k1) - (n0 - k0) * k1) ** 2  # exact ints
    den = n0 * n1 * (k0 + k1) * ((n0 - k0) + (n1 - k1))
    chi2 = np.float64(num) / np.float64(den)
    return pa.table({"n_control": pa.array([n0], pa.int64()),
                     "conv_control": pa.array([k0], pa.int64()),
                     "n_treatment": pa.array([n1], pa.int64()),
                     "conv_treatment": pa.array([k1], pa.int64()),
                     "chi2": pa.array([chi2], pa.float64())})


def q_value_target_encode(sf_dir: str) -> pa.Table:
    """(event_id, loo_mean_c): leave-one-out target encoding — each
    event's feature is the mean value (in cents) of its OWN event type
    computed over all OTHER events of that type, ``(S_t − v_i)/(n_t −
    1)`` — the leakage-free categorical encoding used in tabular ML.
    Integer-exact numerator/denominator with ONE IEEE double division,
    so 10⁵ encoded doubles hash identically to the SQL twin; a
    singleton type encodes NULL on both engines.

    Scale shape: per-type (Σcents, n) off a combiner groupby (driver
    sees |types| rows), broadcast back into one vectorized map over the
    streaming fact — no second exchange, no per-row work."""
    import ray

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"event_type": t["event_type"],
                         "v_c": _cents(t["value"])})

    per_type = collect_table(partial_groupby(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type"], {"sc": ("v_c", "sum"), "n": ("v_c", "count")}))
    stats = {r["event_type"]: (int(r["sc"]), int(r["n"]))
             for r in per_type.to_pylist()}
    ref = ray.put(stats)

    def encode(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:        # empty Ray blocks carry an EMPTY schema
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "loo_mean_c": pa.array([], pa.float64())})
        m = ray.get(ref)
        types = t.column("event_type").to_pylist()
        sc = np.array([m[x][0] for x in types], np.int64)
        n = np.array([m[x][1] for x in types], np.int64)
        v = _cents(t["value"]).to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            loo = (sc - v).astype(np.float64) / (n - 1).astype(np.float64)
        out = pa.array(loo, pa.float64())
        out = pc.if_else(pa.array(n == 1), pa.nulls(t.num_rows,
                                                    pa.float64()), out)
        return pa.table({"event_id": t["event_id"], "loo_mean_c": out})

    return collect_table(ds.map_batches(
        encode, batch_format="pyarrow")).sort_by("event_id")


def q_orders_checksum(sf_dir: str) -> pa.Table:
    """(n_rows, checksum): ORDER-INDEPENDENT content checksum of the
    orders table — per row, the first 64 bits of
    ``md5(orderkey|custkey|status)``; the table checksum is their sum
    mod 2⁶⁴ (hex, 16 digits) — the migration/replication validation
    primitive: two engines (or two copies) agree iff row contents agree,
    regardless of row order or partitioning.

    Scale shape: per-batch partials carry the hash sum as FOUR 16-bit
    limb sums (Σ of each 16-bit slice — int64-safe to ~1.4·10¹⁴ rows,
    where a single mod-2⁶⁴ partial would overflow int64 at ~2³¹ rows),
    folded by a constant-key combiner groupby; the driver reassembles
    the exact mod-2⁶⁴ sum from four integers. Limb decomposition is an
    exact rearrangement, so the value equals the twin's HUGEINT sum."""
    import hashlib

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderstatus"])

    def partial(t: pa.Table) -> pa.Table:
        s = [0, 0, 0, 0]
        n = t.num_rows
        if n:
            for ok, ck, st in zip(t.column("o_orderkey").to_pylist(),
                                  t.column("o_custkey").to_pylist(),
                                  t.column("o_orderstatus").to_pylist()):
                h = int(hashlib.md5(
                    f"{ok}|{ck}|{st}".encode()).hexdigest()[:16], 16)
                s[0] += h & 0xFFFF
                s[1] += (h >> 16) & 0xFFFF
                s[2] += (h >> 32) & 0xFFFF
                s[3] += (h >> 48) & 0xFFFF
        return pa.table({"one": pa.array([1], pa.int64()),
                         "n": pa.array([n], pa.int64()),
                         **{f"s{i}": pa.array([s[i]], pa.int64())
                            for i in range(4)}})

    spec = {"n_rows": ("n", "sum")}
    for i in range(4):
        spec[f"s{i}"] = (f"s{i}", "sum")
    g = collect_table(partial_groupby(
        ds.map_batches(partial, batch_format="pyarrow"), ["one"], spec))
    if g.num_rows == 0:
        return pa.table({"n_rows": pa.array([0], pa.int64()),
                         "checksum": pa.array(["0" * 16], pa.string())})
    limbs = [int(g.column(f"s{i}")[0].as_py()) for i in range(4)]
    total = (limbs[0] + (limbs[1] << 16) + (limbs[2] << 32)
             + (limbs[3] << 48)) % (1 << 64)
    return pa.table({
        "n_rows": pc.cast(g.column("n_rows"), pa.int64()),
        "checksum": pa.array([format(total, "016x")], pa.string())})


def q_orders_scd2(sf_dir: str) -> pa.Table:
    """(o_orderkey, version, o_totalprice, valid_to): type-2
    slowly-changing-dimension HISTORY of the orders CDC stream (base v1;
    +1.00 updates for every 7th key as v2; +2.00 for every 21st as v3) —
    each version carries its validity range, ``valid_to`` = next version
    − 1, NULL while current. The keep-all complement of
    ``orders_upsert``'s last-writer-wins merge, via joins.scd2_history
    (one key-bucket exchange, per-bucket vectorized shift)."""
    from raydoc.functions.joins import scd2_history

    cols = ["o_orderkey", "o_totalprice"]

    def ver(version: int, mod: int, bump: float):
        def fn(t: pa.Table) -> pa.Table:
            k = t["o_orderkey"]
            if mod > 1:
                t = t.filter(pc.equal(_pc_mod(k, mod), 0))
            return pa.table({
                "o_orderkey": t["o_orderkey"],
                "version": pa.array([version] * t.num_rows, pa.int64()),
                "o_totalprice": pc.add(t["o_totalprice"], bump)
                if bump else t["o_totalprice"]})
        return fn

    base = _read(sf_dir, "orders", cols).map_batches(
        ver(1, 1, 0.0), batch_format="pyarrow")
    u2 = _read(sf_dir, "orders", cols).map_batches(
        ver(2, 7, 1.0), batch_format="pyarrow")
    u3 = _read(sf_dir, "orders", cols).map_batches(
        ver(3, 21, 2.0), batch_format="pyarrow")
    hist = scd2_history(base.union(u2).union(u3), key="o_orderkey",
                        version_col="version", num_buckets=16)
    t = collect_table(hist)
    # float64 valid_to (NULL → NaN): nullable ints round-trip to float in
    # pandas-level comparisons, so BOTH engines emit DOUBLE
    return t.select(["o_orderkey", "version", "o_totalprice",
                     "valid_to"]).set_column(
        3, "valid_to", t.column("valid_to").cast(pa.float64())).sort_by(
        [("o_orderkey", "ascending"), ("version", "ascending")])


def q_value_hour_corr(sf_dir: str) -> pa.Table:
    """(event_type, n_events, pearson_r): Pearson correlation between an
    event's value (integer cents) and its hour-of-day, per event type —
    the seasonality-feature screen. All five moments (Σx, Σy, Σxy, Σx²,
    Σy², n) are EXACT integers off one combiner groupby; r needs one
    subtraction tree, two sqrts and one division — and IEEE-754 sqrt is
    CORRECTLY ROUNDED (like +,−,·,/), so the final double hashes
    identically to the SQL twin. The driver assembles per-type results
    from |types| integer rows (Python bigints; the twin uses HUGEINT —
    at 10¹²-row scale split the int64 moment partials into limb sums
    like orders_checksum)."""
    import math

    _HOUR = 3_600_000_000
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        x = _cents(t["value"]).to_numpy(zero_copy_only=False)
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        y = (us // _HOUR) % 24
        return pa.table({"event_type": t["event_type"],
                         "x": pa.array(x, pa.int64()),
                         "y": pa.array(y, pa.int64()),
                         "xy": pa.array(x * y, pa.int64()),
                         "xx": pa.array(x * x, pa.int64()),
                         "yy": pa.array(y * y, pa.int64())})

    m = collect_table(partial_groupby(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["event_type"], {"n": ("x", "count"), "sx": ("x", "sum"),
                         "sy": ("y", "sum"), "sxy": ("xy", "sum"),
                         "sxx": ("xx", "sum"), "syy": ("yy", "sum")}))
    if m.num_rows == 0:
        return pa.table({"event_type": pa.array([], pa.string()),
                         "n_events": pa.array([], pa.int64()),
                         "pearson_r": pa.array([], pa.float64())})
    types, ns, rs = [], [], []
    for r_ in m.to_pylist():
        n, sx, sy = int(r_["n"]), int(r_["sx"]), int(r_["sy"])
        sxy, sxx, syy = int(r_["sxy"]), int(r_["sxx"]), int(r_["syy"])
        num = n * sxy - sx * sy
        denx = n * sxx - sx * sx
        deny = n * syy - sy * sy
        rv = (float(num) / (math.sqrt(float(denx))
                            * math.sqrt(float(deny)))
              if denx > 0 and deny > 0 else float("nan"))
        types.append(r_["event_type"])
        ns.append(n)
        rs.append(rv)
    return pa.table({"event_type": pa.array(types, pa.string()),
                     "n_events": pa.array(ns, pa.int64()),
                     "pearson_r": pa.array(rs, pa.float64())}).sort_by(
        "event_type")


def q_type_drift_cells(sf_dir: str) -> pa.Table:
    """(event_type, half, observed, expected_n, contrib): distribution-
    drift screen — the event-type mix of the corpus's FIRST time half vs
    its SECOND (split at the integer-µs midpoint of the observed span),
    as per-cell chi-square contributions. With E = row·col/N, each
    cell's term rewrites as ``(N·O − r·c)² / (N·r·c)`` — exact integers
    (Python bigints; HUGEINT twin) with ONE IEEE double division, so
    every contrib hashes identically; per-cell rows avoid a
    float-summation order dependence entirely (Σ contrib = the χ²
    statistic, summed by the caller at whatever precision they like).

    Scale shape: the span midpoint is one min/max combiner; cell counts
    one (type, half) combiner; the arithmetic sees 2·|types| integer
    rows on the driver."""
    ds = _read(sf_dir, "events", ["event_type", "ts"])

    def span(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table({"one": pa.array([1], pa.int64()),
                         "lo": pa.array([pc.min(us).as_py()], pa.int64()),
                         "hi": pa.array([pc.max(us).as_py()], pa.int64())})

    s = collect_table(partial_groupby(
        ds.map_batches(span, batch_format="pyarrow"),
        ["one"], {"lo": ("lo", "min"), "hi": ("hi", "max")}))
    empty = pa.table({"event_type": pa.array([], pa.string()),
                      "half": pa.array([], pa.int64()),
                      "observed": pa.array([], pa.int64()),
                      "expected_n": pa.array([], pa.int64()),
                      "contrib": pa.array([], pa.float64())})
    if s.num_rows == 0:
        return empty
    mid = (int(s.column("lo")[0].as_py())
           + int(s.column("hi")[0].as_py())) // 2

    def cellprep(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        half = pc.cast(pc.greater_equal(us, pa.scalar(mid, pa.int64())),
                       pa.int64())
        return pa.table({"event_type": t["event_type"], "half": half})

    cells = collect_table(partial_groupby(
        ds.map_batches(cellprep, batch_format="pyarrow"),
        ["event_type", "half"], {"observed": ("half", "count")}))
    rows = cells.to_pylist()
    n_total = sum(r["observed"] for r in rows)
    row_tot = {}
    col_tot = {}
    for r in rows:
        row_tot[r["event_type"]] = (row_tot.get(r["event_type"], 0)
                                    + r["observed"])
        col_tot[r["half"]] = col_tot.get(r["half"], 0) + r["observed"]
    out = []
    for r in rows:
        o = int(r["observed"])
        rc = row_tot[r["event_type"]] * col_tot[r["half"]]
        num = (n_total * o - rc) ** 2
        den = n_total * rc
        out.append((r["event_type"], int(r["half"]), o, rc,
                    float(num) / float(den)))
    out.sort(key=lambda x: (x[0], x[1]))
    return pa.table({
        "event_type": pa.array([x[0] for x in out], pa.string()),
        "half": pa.array([x[1] for x in out], pa.int64()),
        "observed": pa.array([x[2] for x in out], pa.int64()),
        "expected_n": pa.array([x[3] for x in out], pa.int64()),
        "contrib": pa.array([x[4] for x in out], pa.float64())})


def q_late_shipment_orders(sf_dir: str) -> pa.Table:
    """(o_orderpriority, n_orders): TPC-H Q4-shaped EXISTS decorrelation —
    count orders per priority having at least one lineitem shipped more
    than 30 days after the order date. ONE orderkey-bucket exchange
    total: lineitems pre-reduce to per-batch (orderkey, max ship)
    partials map-side (TPC-H co-locates an order's lines, so this is
    ~4× smaller than the line stream), both sides tag_union into coarse
    buckets, and each bucket finishes locally — final max, Arrow inner
    join, integer epoch-µs compare, per-priority partial counts — so
    only G-sized count rows leave the reduce. (A first cut spent 9 s in
    a full per-orderkey groupby-aggregate before a second join
    exchange; this shape is ~4× faster and half the shuffles.)
    All-integer → hash-exact twin."""
    from raydoc.functions.joins import tag_union

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def li_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "ship_us": pa.array([], pa.int64())})
        part = pa.table({"o_orderkey": t["l_orderkey"],
                         "ship_us": pc.cast(t["l_shipdate"], pa.int64())})
        g = part.group_by(["o_orderkey"]).aggregate([("ship_us", "max")])
        return g.rename_columns(["o_orderkey", "ship_us"])

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def ord_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.schema.names:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "ord_us": pa.array([], pa.int64()),
                             "o_orderpriority": pa.array([], pa.string())})
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "ord_us": pc.cast(t["o_orderdate"], pa.int64()),
                         "o_orderpriority": t["o_orderpriority"]})

    all_fields = [("o_orderkey", pa.int64()), ("ord_us", pa.int64()),
                  ("o_orderpriority", pa.string()),
                  ("ship_us", pa.int64())]
    tagged = tag_union(
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        li.map_batches(li_prep, batch_format="pyarrow"),
        "o_orderkey", all_fields, num_buckets=32)

    _30D_US = 30 * 86_400 * 1_000_000
    out_schema = pa.schema([("o_orderpriority", pa.string()),
                            ("n_orders", pa.int64())])

    def per_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        side = group.column("__side")
        o = group.filter(pc.equal(side, 0)).select(
            ["o_orderkey", "ord_us", "o_orderpriority"])
        l = group.filter(pc.equal(side, 1)).select(
            ["o_orderkey", "ship_us"])
        if o.num_rows == 0 or l.num_rows == 0:
            return out_schema.empty_table()
        ms = l.group_by(["o_orderkey"]).aggregate([("ship_us", "max")]) \
            .rename_columns(["o_orderkey", "max_ship_us"])
        j = o.join(ms, keys="o_orderkey", join_type="inner")
        j = j.filter(pc.greater(j["max_ship_us"],
                                pc.add(j["ord_us"], _30D_US)))
        g = j.group_by(["o_orderpriority"]).aggregate(
            [("o_orderkey", "count")])
        return g.rename_columns(
            ["o_orderpriority", "n_orders"]).cast(out_schema)

    counts = tagged.groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow")
    out = counts.groupby("o_orderpriority").aggregate(
        rd.aggregate.Sum("n_orders", alias_name="n_orders"))
    return collect_table(out).sort_by("o_orderpriority")


def q_promo_revenue(sf_dir: str) -> pa.Table:
    """(promo_cents, total_cents, promo_pct): TPC-H Q14-shaped promo
    revenue share over a ship-date quarter — the part dimension
    broadcasts once (``ray.put`` inside broadcast_join), lineitem
    streams through one conditional-sum pass, and only per-batch
    integer partials reach the final fold. Revenue follows the repo's
    exact-money discipline: price and discount each round to integers
    SEPARATELY (x·100 is always ±ε off an integer, never at .5 — a
    joint round(price·(1−disc)·100) does hit half-boundaries and
    diverges from SQL by banker's-vs-away rounding), so revenue is the
    exact integer cents·(100−disc%) in hundredth-cents. promo_pct is a
    single float division of two exact integers (both also emitted, so
    the hash gate checks the integers AND the derived double)."""
    t0 = 852_076_800_000_000      # 1997-01-01 epoch µs
    t1 = 859_852_800_000_000      # 1997-04-01 epoch µs

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    flags = pa.table({
        "l_partkey": part["p_partkey"],
        "is_promo": pc.equal(part["p_type"], "PROMO"),
    })

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def window(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_shipdate" not in t.schema.names:
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64())})
        us = pc.cast(t["l_shipdate"], pa.int64())
        t = t.filter(pc.and_(pc.greater_equal(us, t0), pc.less(us, t1)))
        disc = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                       pa.int64())
        rev = pc.multiply(_cents(t["l_extendedprice"]),
                          pc.subtract(pa.scalar(100, pa.int64()), disc))
        return pa.table({"l_partkey": t["l_partkey"], "rev": rev})

    tagged = broadcast_join(li.map_batches(window, batch_format="pyarrow"),
                            flags, key="l_partkey")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "rev" not in t.schema.names:
            return pa.table({"promo_rev": pa.array([], pa.int64()),
                             "total_rev": pa.array([], pa.int64())})
        rev = t["rev"]
        promo = pc.sum(pc.if_else(t["is_promo"], rev, 0)).as_py() or 0
        total = pc.sum(rev).as_py() or 0
        return pa.table({"promo_rev": pa.array([promo], pa.int64()),
                         "total_rev": pa.array([total], pa.int64())})

    partials = tagged.map_batches(partial, batch_format="pyarrow")
    sums = partials.sum(["promo_rev", "total_rev"])
    promo = int(sums["sum(promo_rev)"])
    total = int(sums["sum(total_rev)"])
    return pa.table({
        "promo_rev": pa.array([promo], pa.int64()),
        "total_rev": pa.array([total], pa.int64()),
        "promo_pct": pa.array([100.0 * promo / total], pa.float64()),
    })


def q_snapshot_diff(sf_dir: str) -> pa.Table:
    """(o_orderkey, change, old/new price+status): reverse CDC — diff
    the orders snapshot against a derived next-day snapshot (every 11th
    key deleted, every 7th price bumped, every 13th key re-inserted
    shifted by 10M = adds). Exercises functions/joins.py:snapshot_diff
    (one bucket exchange, full-outer Arrow join per bucket, unchanged
    keys dropped task-side so output is change-sized)."""
    from raydoc.functions.joins import snapshot_diff

    cols = ["o_orderkey", "o_totalprice", "o_orderstatus"]
    base = _read(sf_dir, "orders", cols)

    def new_fn(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.schema.names:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "o_totalprice": pa.array([], pa.float64()),
                             "o_orderstatus": pa.array([], pa.string())})
        k = t["o_orderkey"]

        keep = t.filter(pc.not_equal(_pc_mod(k, 11), 0))
        kk = keep["o_orderkey"]
        bump = pc.equal(_pc_mod(kk, 7), 0)
        upd = pa.table({
            "o_orderkey": kk,
            "o_totalprice": pc.if_else(
                bump, pc.add(keep["o_totalprice"], 1.0),
                keep["o_totalprice"]),
            "o_orderstatus": keep["o_orderstatus"],
        })
        ins = t.filter(pc.equal(_pc_mod(k, 13), 0))
        ins = pa.table({
            "o_orderkey": pc.add(ins["o_orderkey"], 10_000_000),
            "o_totalprice": ins["o_totalprice"],
            "o_orderstatus": ins["o_orderstatus"],
        })
        return pa.concat_tables([upd, ins])

    new = _read(sf_dir, "orders", cols).map_batches(
        new_fn, batch_format="pyarrow")
    out = snapshot_diff(base, new, key="o_orderkey",
                        compare_cols=["o_totalprice", "o_orderstatus"],
                        num_buckets=32)
    return collect_table(out).sort_by("o_orderkey")


def _global_topk(ds: rd.Dataset, sort_keys: list[str],
                 descending: list[bool], k: int) -> pa.Table:
    """Exact global top-k without sorting the full dataset: each block
    prunes to its local top-k map-side (no exchange), the ≤ k·n_blocks
    survivors collect, and one driver-side sort of that tiny table
    finishes. The scale-safe replacement for ``ds.sort(...).limit(k)``
    when the input is bigger than "small"."""
    order = [(c, "descending" if d else "ascending")
             for c, d in zip(sort_keys, descending)]

    def prune(t: pa.Table) -> pa.Table:
        if t.num_rows <= k or sort_keys[0] not in t.schema.names:
            return t
        return t.take(pc.sort_indices(t, sort_keys=order)[:k])

    t = collect_table(ds.map_batches(prune, batch_format="pyarrow"))
    return t.take(pc.sort_indices(t, sort_keys=order)[:k])


def _rev_c100(t: pa.Table, price: str = "l_extendedprice",
              disc: str = "l_discount") -> pa.ChunkedArray:
    """Exact discounted revenue in hundredth-cents: round price and
    discount to integers SEPARATELY (the repo's exact-money discipline —
    a joint round hits .5 boundaries and diverges banker's-vs-away from
    SQL), then cents·(100−disc%) as int64."""
    price_c = _cents(t[price])
    disc_pct = pc.cast(pc.round(pc.multiply(t[disc], pa.scalar(100.0))),
                       pa.int64())
    return pc.multiply(price_c,
                       pc.subtract(pa.scalar(100, pa.int64()), disc_pct))


_98H2_US = 899_251_200_000_000        # 1998-07-01 epoch µs


def q_shipping_priority(sf_dir: str) -> pa.Table:
    """(l_orderkey, revenue, o_orderdate, o_orderpriority): TPC-H Q3 —
    top-10 unshipped-revenue orders for one market segment. Shape:
    customer(BUILDING) is a region-of-a-dimension → its keys broadcast
    into the orders stream as a map-side semi-filter; lineitem
    pre-reduces to per-batch (orderkey, rev) integer partials before
    the ONE orderkey-bucket exchange (tag_union) where it meets the
    filtered orders — each bucket finishes locally (final rev sum,
    Arrow inner join, in-bucket top-10 prune), so only ≤ 10 rows per
    bucket reach the tiny driver merge; no second fine-key exchange.
    Revenue is exact integer hundredth-cents (also emitted, so the
    gate hashes the integer AND the derived double)."""
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"])
    ckeys = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING")) \
                .column("c_custkey").combine_chunks()
    ckeys_ref = ray.put(ckeys)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_orderpriority"])

    def ord_prep(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_orderkey": pa.array([], pa.int64()),
                          "ord_us": pa.array([], pa.int64()),
                          "o_orderpriority": pa.array([], pa.string())})
        if t.num_rows == 0 or "o_orderkey" not in t.schema.names:
            return empty
        ks = ray.get(ckeys_ref)
        keep = pc.and_(
            pc.fill_null(pc.is_in(t["o_custkey"], value_set=ks), False),
            pc.less(pc.cast(t["o_orderdate"], pa.int64()), _98H2_US))
        t = t.filter(keep)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "ord_us": pc.cast(t["o_orderdate"], pa.int64()),
                         "o_orderpriority": t["o_orderpriority"]})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_shipdate", "l_extendedprice",
                "l_discount"])

    def li_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "rev_c100": pa.array([], pa.int64())})
        t = t.filter(pc.greater(pc.cast(t["l_shipdate"], pa.int64()),
                                _98H2_US))
        part = pa.table({"l_orderkey": t["l_orderkey"],
                         "rev_c100": _rev_c100(t)})
        g = part.group_by("l_orderkey").aggregate([("rev_c100", "sum")])
        return g.rename_columns(["l_orderkey", "rev_c100"])

    from raydoc.functions.joins import tag_union
    all_fields = [("l_orderkey", pa.int64()), ("ord_us", pa.int64()),
                  ("o_orderpriority", pa.string()),
                  ("rev_c100", pa.int64())]
    tagged = tag_union(
        orders.map_batches(ord_prep, batch_format="pyarrow")
              .rename_columns({"o_orderkey": "l_orderkey"}),
        li.map_batches(li_prep, batch_format="pyarrow"),
        "l_orderkey", all_fields, num_buckets=32)

    out_schema = pa.schema(all_fields)

    def per_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        side = group.column("__side")
        o = group.filter(pc.equal(side, 0)).select(
            ["l_orderkey", "ord_us", "o_orderpriority"])
        l = group.filter(pc.equal(side, 1)).select(
            ["l_orderkey", "rev_c100"])
        if o.num_rows == 0 or l.num_rows == 0:
            return out_schema.empty_table()
        rev = l.group_by("l_orderkey").aggregate([("rev_c100", "sum")]) \
            .rename_columns(["l_orderkey", "rev_c100"])
        j = o.join(rev, keys="l_orderkey", join_type="inner") \
             .select(["l_orderkey", "ord_us", "o_orderpriority",
                      "rev_c100"]).cast(out_schema)
        order = [("rev_c100", "descending"), ("ord_us", "ascending"),
                 ("l_orderkey", "ascending")]
        return j.take(pc.sort_indices(j, sort_keys=order)[:10])

    per_order = tagged.groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow")
    top = _global_topk(per_order, ["rev_c100", "ord_us", "l_orderkey"],
                       [True, False, False], 10)
    return pa.table({
        "l_orderkey": top["l_orderkey"],
        "revenue": pc.divide(pc.cast(top["rev_c100"], pa.float64()),
                             10000.0),
        "rev_c100": top["rev_c100"],
        "o_orderdate": pc.cast(top["ord_us"], pa.timestamp("us")),
        "o_orderpriority": top["o_orderpriority"],
    })


def q_returned_item_customers(sf_dir: str) -> pa.Table:
    """(c_custkey, c_name, revenue, rev_c100, n_name, c_acctbal): TPC-H
    Q10 — top-20 customers by revenue lost to returns in one order
    quarter. lineitem('R') pre-reduces to (orderkey, rev) partials;
    orders (quarter-filtered) meets it in one orderkey-bucket exchange;
    per-customer revenue rides the combiner; the customer→nation
    dimension joins AFTER aggregation on the customer-sized result via
    one broadcast; top-20 is the block-prune + driver-merge pattern."""
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice",
                "l_discount"])

    def li_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "rev_c100": pa.array([], pa.int64())})
        t = t.filter(pc.equal(t["l_returnflag"], "R"))
        part = pa.table({"l_orderkey": t["l_orderkey"],
                         "rev_c100": _rev_c100(t)})
        g = part.group_by("l_orderkey").aggregate([("rev_c100", "sum")])
        return g.rename_columns(["l_orderkey", "rev_c100"])

    t0 = 852_076_800_000_000      # 1997-01-01 epoch µs
    t1 = 859_852_800_000_000      # 1997-04-01 epoch µs
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def ord_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.schema.names:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "o_custkey": pa.array([], pa.int64())})
        us = pc.cast(t["o_orderdate"], pa.int64())
        t = t.filter(pc.and_(pc.greater_equal(us, t0), pc.less(us, t1)))
        return pa.table({"l_orderkey": t["o_orderkey"],
                         "o_custkey": t["o_custkey"]})

    joined = bucket_hash_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        key="l_orderkey", num_buckets=32)
    per_cust = partial_groupby(joined, ["o_custkey"],
                               {"rev_c100": ("rev_c100", "sum")})

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name", "c_nationkey",
                                  "c_acctbal"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    dim = cust.join(nation, keys="c_nationkey", right_keys="n_nationkey",
                    join_type="inner") \
              .select(["c_custkey", "c_name", "n_name", "c_acctbal"]) \
              .rename_columns(["o_custkey", "c_name", "n_name",
                               "c_acctbal"])
    enriched = broadcast_join(per_cust, dim, key="o_custkey")
    top = _global_topk(enriched, ["rev_c100", "o_custkey"],
                       [True, False], 20)
    return pa.table({
        "c_custkey": top["o_custkey"],
        "c_name": top["c_name"],
        "revenue": pc.divide(pc.cast(top["rev_c100"], pa.float64()),
                             10000.0),
        "rev_c100": top["rev_c100"],
        "n_name": top["n_name"],
        "c_acctbal": top["c_acctbal"],
    })


def q_large_volume_customers(sf_dir: str, min_qty: int = 250) -> pa.Table:
    """(c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
    total_qty): TPC-H Q18 — orders whose total line quantity exceeds
    ``min_qty``, with their customer, top-100 by price. Quantity sums
    ride integer per-batch partials (orderkey-grouped map-side, TPC-H
    co-locates an order's lines) into ONE orderkey-bucket exchange
    (tag_union with the orders stream) — each bucket finishes locally:
    final qty sum, HAVING filter, Arrow inner join against its orders
    slice, in-bucket top-100 prune. No second fine-key exchange (a
    first cut paid a per-orderkey partial_groupby shuffle PLUS a
    bucket-join shuffle: 19 s at sf0.1; this shape is one exchange).
    Customer names broadcast at the end onto the ≤ 100·buckets-row
    stream."""
    from raydoc.functions.joins import tag_union

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def li_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "total_qty": pa.array([], pa.int64())})
        part = pa.table({
            "l_orderkey": t["l_orderkey"],
            "total_qty": pc.cast(pc.round(t["l_quantity"]), pa.int64())})
        g = part.group_by("l_orderkey").aggregate([("total_qty", "sum")])
        return g.rename_columns(["l_orderkey", "total_qty"])

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_totalprice"]).rename_columns(
        {"o_orderkey": "l_orderkey"})

    all_fields = [("l_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                  ("o_orderdate", pa.timestamp("us")),
                  ("o_totalprice", pa.float64()),
                  ("total_qty", pa.int64())]
    tagged = tag_union(orders, li.map_batches(li_prep,
                                              batch_format="pyarrow"),
                       "l_orderkey", all_fields, num_buckets=32)
    out_schema = pa.schema(all_fields)

    def per_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        side = group.column("__side")
        o = group.filter(pc.equal(side, 0)).select(
            ["l_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
        l = group.filter(pc.equal(side, 1)).select(
            ["l_orderkey", "total_qty"])
        if o.num_rows == 0 or l.num_rows == 0:
            return out_schema.empty_table()
        q = l.group_by("l_orderkey").aggregate([("total_qty", "sum")]) \
            .rename_columns(["l_orderkey", "total_qty"])
        q = q.filter(pc.greater(q["total_qty"], min_qty))
        if q.num_rows == 0:
            return out_schema.empty_table()
        j = o.join(q, keys="l_orderkey", join_type="inner") \
             .select([n for n, _ in all_fields]).cast(out_schema)
        order = [("o_totalprice", "descending"),
                 ("l_orderkey", "ascending")]
        return j.take(pc.sort_indices(j, sort_keys=order)[:100])

    joined = tagged.groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow")

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"]) \
             .rename_columns(["o_custkey", "c_name"])
    enriched = broadcast_join(joined, cust, key="o_custkey")
    top = _global_topk(enriched, ["o_totalprice", "l_orderkey"],
                       [True, False], 100)
    return pa.table({
        "c_name": top["c_name"],
        "c_custkey": top["o_custkey"],
        "o_orderkey": top["l_orderkey"],
        "o_orderdate": top["o_orderdate"],
        "o_totalprice": top["o_totalprice"],
        "total_qty": top["total_qty"],
    })


_Q19_BRACKETS = (("Brand#1", 1, 15, 1, 11),
                 ("Brand#2", 1, 25, 10, 20),
                 ("Brand#3", 1, 50, 20, 30))


def q_bracket_revenue(sf_dir: str) -> pa.Table:
    """(rev_c100, revenue, n_lines): TPC-H Q19 — revenue from three
    OR-ed (brand, size-range, quantity-range) brackets. The part
    dimension broadcasts once (``ray.put`` inside broadcast_join);
    lineitem streams through one vectorized mask-and-sum pass; only
    per-batch integer partials reach the final fold."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_size"]) \
             .rename_columns(["l_partkey", "p_brand", "p_size"])
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"])
    joined = broadcast_join(li, part, key="l_partkey")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "p_brand" not in t.schema.names:
            return pa.table({"rev_c100": pa.array([], pa.int64()),
                             "n_lines": pa.array([], pa.int64())})
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        mask = pa.array(np.zeros(t.num_rows, dtype=bool))
        for brand, s0, s1, q0, q1 in _Q19_BRACKETS:
            m = pc.and_(pc.equal(t["p_brand"], brand),
                        pc.and_(pc.greater_equal(t["p_size"], s0),
                                pc.less_equal(t["p_size"], s1)))
            m = pc.and_(m, pc.and_(pc.greater_equal(qty, q0),
                                   pc.less_equal(qty, q1)))
            mask = pc.or_(mask, pc.fill_null(m, False))
        t = t.filter(mask)
        rev = _rev_c100(t)
        return pa.table({
            "rev_c100": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
            "n_lines": pa.array([t.num_rows], pa.int64())})

    partials = joined.map_batches(partial, batch_format="pyarrow")
    t = collect_table(partials)
    rev = pc.sum(t["rev_c100"]).as_py() or 0
    n = pc.sum(t["n_lines"]).as_py() or 0
    return pa.table({"rev_c100": pa.array([rev], pa.int64()),
                     "revenue": pa.array([rev / 10000.0], pa.float64()),
                     "n_lines": pa.array([n], pa.int64())})


def q_profit_by_nation(sf_dir: str) -> pa.Table:
    """(n_name, o_year, profit, profit_c100): TPC-H Q9 shape adapted to
    the schema (no partsupp → profit = discounted revenue): revenue
    from lineitems of parts named like '%red%', by supplier nation and
    ship year. Both dimensions reduce to broadcast lookups — the part
    filter to a key SET (map-side semi filter), supplier→nation-name to
    a two-column map joined per batch — so lineitem streams through a
    single map stage; only (nation, year) integer partials exchange."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    pkeys = part.filter(pc.match_substring(part["p_name"], "red")) \
                .column("p_partkey").combine_chunks()
    pkeys_ref = ray.put(pkeys)

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    supp_nation = supp.join(nation, keys="s_nationkey",
                            right_keys="n_nationkey",
                            join_type="inner") \
                      .select(["s_suppkey", "n_name"]) \
                      .rename_columns(["l_suppkey", "n_name"])

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount"])
    joined = broadcast_join(li, supp_nation, key="l_suppkey")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "n_name" not in t.schema.names:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "o_year": pa.array([], pa.int64()),
                             "profit_c100": pa.array([], pa.int64())})
        ks = ray.get(pkeys_ref)
        t = t.filter(pc.fill_null(
            pc.is_in(t["l_partkey"], value_set=ks), False))
        part_t = pa.table({
            "n_name": t["n_name"],
            "o_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
            "profit_c100": _rev_c100(t)})
        g = part_t.group_by(["n_name", "o_year"]).aggregate(
            [("profit_c100", "sum")])
        return g.rename_columns(["n_name", "o_year", "profit_c100"])

    out = partial_groupby(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["n_name", "o_year"], {"profit_c100": ("profit_c100", "sum")})
    t = collect_table(out).sort_by([("n_name", "ascending"),
                                    ("o_year", "ascending")])
    return pa.table({
        "n_name": t["n_name"],
        "o_year": t["o_year"],
        "profit": pc.divide(pc.cast(t["profit_c100"], pa.float64()),
                            10000.0),
        "profit_c100": t["profit_c100"],
    })


_96_US = 820_454_400_000_000          # 1996-01-01 epoch µs
_98_US = 883_612_800_000_000          # 1998-01-01 epoch µs


def q_volume_shipping(sf_dir: str, region_a: str = "AMERICA",
                      region_b: str = "EUROPE") -> pa.Table:
    """(supp_region, cust_region, l_year, rev_c100, revenue): TPC-H Q7
    at region grain (25 synthetic nations make a nation pair vacuous at
    tiny scales) — two-year shipping volume between two regions, both
    directions. The fact-fact meeting is ONE orderkey-bucket exchange:
    orders broadcast-joins the customer→region map and ships only
    (orderkey, cust_region); lineitem broadcast-joins the
    supplier→region map, filters the window map-side, and pre-reduces
    to (orderkey, supp_region, year) integer partials. The pair filter
    and final (supp, cust, year) groupby both ride the combiner."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet")
    region = region.filter(pc.is_in(region["r_name"],
                                    value_set=pa.array([region_a,
                                                        region_b])))
    nat_region = nation.join(region, keys="n_regionkey",
                             right_keys="r_regionkey",
                             join_type="inner") \
                       .select(["n_nationkey", "r_name"])

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cust_region = cust.join(nat_region, keys="c_nationkey",
                            right_keys="n_nationkey",
                            join_type="inner") \
                      .select(["c_custkey", "r_name"]) \
                      .rename_columns(["o_custkey", "cust_region"])

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    supp_region = supp.join(nat_region, keys="s_nationkey",
                            right_keys="n_nationkey",
                            join_type="inner") \
                      .select(["s_suppkey", "r_name"]) \
                      .rename_columns(["l_suppkey", "supp_region"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    order_side = broadcast_join(orders, cust_region,
                                key="o_custkey").map_batches(
        lambda t: (pa.table({"l_orderkey": t["o_orderkey"],
                             "cust_region": t["cust_region"]})
                   if "o_orderkey" in t.schema.names else
                   pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "cust_region": pa.array([], pa.string())})),
        batch_format="pyarrow")

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount"])

    def li_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "supp_region": pa.array([], pa.string()),
                             "l_year": pa.array([], pa.int64()),
                             "rev_c100": pa.array([], pa.int64())})
        us = pc.cast(t["l_shipdate"], pa.int64())
        t = t.filter(pc.and_(pc.greater_equal(us, _96_US),
                             pc.less(us, _98_US)))
        part_t = pa.table({
            "l_orderkey": t["l_orderkey"],
            "supp_region": t["supp_region"],
            "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
            "rev_c100": _rev_c100(t)})
        g = part_t.group_by(["l_orderkey", "supp_region",
                             "l_year"]).aggregate([("rev_c100", "sum")])
        return g.rename_columns(["l_orderkey", "supp_region", "l_year",
                                 "rev_c100"])

    li_side = broadcast_join(li, supp_region, key="l_suppkey") \
        .map_batches(li_prep, batch_format="pyarrow")

    joined = bucket_hash_join(li_side, order_side, key="l_orderkey",
                              num_buckets=32)

    def pair_filter(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "supp_region" not in t.schema.names:
            return pa.table({"supp_region": pa.array([], pa.string()),
                             "cust_region": pa.array([], pa.string()),
                             "l_year": pa.array([], pa.int64()),
                             "rev_c100": pa.array([], pa.int64())})
        t = t.filter(pc.not_equal(t["supp_region"], t["cust_region"]))
        return t.select(["supp_region", "cust_region", "l_year",
                         "rev_c100"])

    out = partial_groupby(
        joined.map_batches(pair_filter, batch_format="pyarrow"),
        ["supp_region", "cust_region", "l_year"],
        {"rev_c100": ("rev_c100", "sum")})
    t = collect_table(out).sort_by([("supp_region", "ascending"),
                                    ("cust_region", "ascending"),
                                    ("l_year", "ascending")])
    return pa.table({
        "supp_region": t["supp_region"],
        "cust_region": t["cust_region"],
        "l_year": t["l_year"],
        "rev_c100": t["rev_c100"],
        "revenue": pc.divide(pc.cast(t["rev_c100"], pa.float64()),
                             10000.0),
    })


def q_market_share(sf_dir: str, supp_region: str = "AMERICA",
                   cust_region: str = "EUROPE",
                   p_type: str = "MEDIUM") -> pa.Table:
    """(o_year, share_rev_c100, total_rev_c100, mkt_share): TPC-H Q8 —
    the ``supp_region`` suppliers' share of ``p_type``-part revenue sold
    into ``cust_region``, by order year. All three dimension reductions
    broadcast (part keys as a semi-filter SET, supplier→region as a
    two-column map, customer(cust_region) keys as a semi-filter into
    orders); lineitem pre-reduces to per-batch (orderkey,
    total/share-rev) integer partials, meets the filtered orders stream
    in ONE orderkey-bucket exchange, and each bucket emits per-year
    partials — the final year groupby moves a handful of rows.
    ``mkt_share`` is one IEEE division of the two exact integers (both
    emitted, so the gate hashes ints AND the derived double)."""
    from raydoc.functions.joins import tag_union

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_type"])
    pkeys = part.filter(pc.equal(part["p_type"], p_type)) \
                .column("p_partkey").combine_chunks()
    pkeys_ref = ray.put(pkeys)

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet")
    nat_region = nation.join(region, keys="n_regionkey",
                             right_keys="r_regionkey",
                             join_type="inner") \
                       .select(["n_nationkey", "r_name"])

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"])
    supp_map = supp.join(nat_region, keys="s_nationkey",
                         right_keys="n_nationkey", join_type="inner") \
                   .select(["s_suppkey", "r_name"]) \
                   .rename_columns(["l_suppkey", "supp_region"])

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    ckeys = cust.join(
        nat_region.filter(pc.equal(nat_region["r_name"], cust_region)),
        keys="c_nationkey", right_keys="n_nationkey",
        join_type="inner").column("c_custkey").combine_chunks()
    ckeys_ref = ray.put(ckeys)

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])

    def ord_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.schema.names:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "o_year": pa.array([], pa.int64())})
        ks = ray.get(ckeys_ref)
        t = t.filter(pc.fill_null(
            pc.is_in(t["o_custkey"], value_set=ks), False))
        return pa.table({
            "l_orderkey": t["o_orderkey"],
            "o_year": pc.cast(pc.year(t["o_orderdate"]), pa.int64())})

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_partkey", "l_suppkey",
                "l_extendedprice", "l_discount"])

    def li_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "supp_region" not in t.schema.names:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "rev_c100": pa.array([], pa.int64()),
                             "share_c100": pa.array([], pa.int64())})
        ks = ray.get(pkeys_ref)
        t = t.filter(pc.fill_null(
            pc.is_in(t["l_partkey"], value_set=ks), False))
        rev = _rev_c100(t)
        share = pc.if_else(pc.equal(t["supp_region"], supp_region),
                           rev, pa.scalar(0, pa.int64()))
        part_t = pa.table({"l_orderkey": t["l_orderkey"],
                           "rev_c100": rev, "share_c100": share})
        g = part_t.group_by("l_orderkey").aggregate(
            [("rev_c100", "sum"), ("share_c100", "sum")])
        return g.rename_columns(["l_orderkey", "rev_c100", "share_c100"])

    li_side = broadcast_join(li, supp_map, key="l_suppkey") \
        .map_batches(li_prep, batch_format="pyarrow")

    all_fields = [("l_orderkey", pa.int64()), ("o_year", pa.int64()),
                  ("rev_c100", pa.int64()), ("share_c100", pa.int64())]
    tagged = tag_union(orders.map_batches(ord_prep,
                                          batch_format="pyarrow"),
                       li_side, "l_orderkey", all_fields,
                       num_buckets=32)

    year_schema = pa.schema([("o_year", pa.int64()),
                             ("rev_c100", pa.int64()),
                             ("share_c100", pa.int64())])

    def per_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        side = group.column("__side")
        o = group.filter(pc.equal(side, 0)).select(
            ["l_orderkey", "o_year"])
        l = group.filter(pc.equal(side, 1)).select(
            ["l_orderkey", "rev_c100", "share_c100"])
        if o.num_rows == 0 or l.num_rows == 0:
            return year_schema.empty_table()
        j = l.join(o, keys="l_orderkey", join_type="inner")
        g = j.group_by("o_year").aggregate([("rev_c100", "sum"),
                                            ("share_c100", "sum")])
        return g.rename_columns(["o_year", "rev_c100",
                                 "share_c100"]).cast(year_schema)

    per_year = tagged.groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow")
    out = partial_groupby(per_year, ["o_year"],
                          {"total_rev_c100": ("rev_c100", "sum"),
                           "share_rev_c100": ("share_c100", "sum")})
    t = collect_table(out).sort_by("o_year")
    return pa.table({
        "o_year": t["o_year"],
        "share_rev_c100": t["share_rev_c100"],
        "total_rev_c100": t["total_rev_c100"],
        "mkt_share": pc.divide(
            pc.cast(t["share_rev_c100"], pa.float64()),
            pc.cast(t["total_rev_c100"], pa.float64())),
    })


def q_discount_band_revenue(sf_dir: str) -> pa.Table:
    """(rev_c100, revenue, n_lines): TPC-H Q6 — revenue delta from
    lineitems of one ship year in a discount band below a quantity cap.
    The pure streaming aggregate: one predicate+sum pass over the fact
    table, integer partials fold, nothing else moves."""
    y0 = 852_076_800_000_000      # 1997-01-01 epoch µs
    y1 = 883_612_800_000_000      # 1998-01-01 epoch µs
    li = _read(sf_dir, "lineitem",
               ["l_shipdate", "l_quantity", "l_extendedprice",
                "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_shipdate" not in t.schema.names:
            return pa.table({"rev_c100": pa.array([], pa.int64()),
                             "n_lines": pa.array([], pa.int64())})
        us = pc.cast(t["l_shipdate"], pa.int64())
        disc_pct = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                           pa.int64())
        keep = pc.and_(
            pc.and_(pc.greater_equal(us, y0), pc.less(us, y1)),
            pc.and_(pc.and_(pc.greater_equal(disc_pct, 2),
                            pc.less_equal(disc_pct, 4)),
                    pc.less(t["l_quantity"], 24.0)))
        t = t.filter(keep)
        rev = _rev_c100(t)
        return pa.table({
            "rev_c100": pa.array([pc.sum(rev).as_py() or 0], pa.int64()),
            "n_lines": pa.array([t.num_rows], pa.int64())})

    t = collect_table(li.map_batches(partial, batch_format="pyarrow"))
    rev = pc.sum(t["rev_c100"]).as_py() or 0
    n = pc.sum(t["n_lines"]).as_py() or 0
    return pa.table({"rev_c100": pa.array([rev], pa.int64()),
                     "revenue": pa.array([rev / 10000.0], pa.float64()),
                     "n_lines": pa.array([n], pa.int64())})


def q_top_part_revenue_share(sf_dir: str) -> pa.Table:
    """(l_partkey, rev_c100): TPC-H Q11 shape — parts whose revenue
    exceeds 1.5× the mean part revenue (scale-free analog of Q11's
    FRACTION·total cut; no partsupp table in this schema). Per-part
    revenue rides integer combiner partials into one dimension-sized
    groupby; the global threshold is the exact rational comparison
    ``2·n·v > 3·Σv`` evaluated on the collected part-sized aggregate
    (both sides exact ints — at extreme corpus scale promote to
    HUGEINT/Python int before the products; the SQL twin already
    compares in HUGEINT)."""
    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_partkey" not in t.schema.names:
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "rev_c100": pa.array([], pa.int64())})
        part_t = pa.table({"l_partkey": t["l_partkey"],
                           "rev_c100": _rev_c100(t)})
        g = part_t.group_by("l_partkey").aggregate([("rev_c100", "sum")])
        return g.rename_columns(["l_partkey", "rev_c100"])

    per_part = partial_groupby(
        li.map_batches(partial, batch_format="pyarrow"),
        ["l_partkey"], {"rev_c100": ("rev_c100", "sum")})
    t = collect_table(per_part)      # part-dimension-sized
    v = t["rev_c100"].to_pylist()
    n, s = len(v), sum(v)            # exact Python ints — no overflow
    keep = pa.array([2 * x * n > 3 * s for x in v], pa.bool_())
    out = t.filter(keep)
    return out.sort_by([("rev_c100", "descending"),
                        ("l_partkey", "ascending")])


def q_supplier_count_by_part(sf_dir: str) -> pa.Table:
    """(p_brand, p_type, p_size, supplier_cnt): TPC-H Q16 shape —
    DISTINCT suppliers per part-attribute group, one brand excluded
    (supplier relationships derived from lineitem; no partsupp table).
    Exact distributed COUNT(DISTINCT): batch-local distinct
    (partkey, suppkey) pairs → broadcast part-attrs join → batch-local
    distinct (attrs, suppkey) → ONE hash-bucket exchange where each
    distinct tuple lands in exactly one bucket (dedup there) → per-
    bucket partial counts → tiny final attr groupby."""
    from raydoc.functions._buckets import reduce_bucket_count
    mask = reduce_bucket_count() - 1

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_brand", "p_type",
                                  "p_size"])
    part = part.filter(pc.not_equal(part["p_brand"], "Brand#1")) \
               .rename_columns(["l_partkey", "p_brand", "p_type",
                                "p_size"])

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pair_distinct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_partkey" not in t.schema.names:
            return pa.table({"l_partkey": pa.array([], pa.int64()),
                             "l_suppkey": pa.array([], pa.int64())})
        return t.select(["l_partkey", "l_suppkey"]) \
                .group_by(["l_partkey", "l_suppkey"]).aggregate([])

    pairs = li.map_batches(pair_distinct, batch_format="pyarrow")
    tagged = broadcast_join(pairs, part, key="l_partkey")

    def attr_distinct(t: pa.Table) -> pa.Table:
        empty = pa.table({"p_brand": pa.array([], pa.string()),
                          "p_type": pa.array([], pa.string()),
                          "p_size": pa.array([], pa.int32()),
                          "l_suppkey": pa.array([], pa.int64()),
                          "bucket": pa.array([], pa.int32())})
        if t.num_rows == 0 or "p_brand" not in t.schema.names:
            return empty
        g = t.select(["p_brand", "p_type", "p_size", "l_suppkey"]) \
             .group_by(["p_brand", "p_type", "p_size",
                        "l_suppkey"]).aggregate([])
        # every copy of one distinct tuple hashes to the SAME bucket —
        # vectorized (pandas siphash is deterministic for equal values
        # within AND across worker processes; determinism across runs
        # is not needed for bucket routing)
        import pandas as pd
        hv = pd.util.hash_pandas_object(
            g.to_pandas(), index=False).to_numpy()
        bk = pa.array((hv & mask).astype("int32"), pa.int32())
        return g.append_column("bucket", bk)

    exploded = tagged.map_batches(attr_distinct, batch_format="pyarrow")

    cnt_schema = pa.schema([("p_brand", pa.string()),
                            ("p_type", pa.string()),
                            ("p_size", pa.int32()),
                            ("supplier_cnt", pa.int64())])

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return cnt_schema.empty_table()
        d = g.select(["p_brand", "p_type", "p_size", "l_suppkey"]) \
             .group_by(["p_brand", "p_type", "p_size",
                        "l_suppkey"]).aggregate([])
        c = d.group_by(["p_brand", "p_type", "p_size"]).aggregate(
            [("l_suppkey", "count")])
        return c.rename_columns(["p_brand", "p_type", "p_size",
                                 "supplier_cnt"]).cast(cnt_schema)

    counts = exploded.groupby("bucket").map_groups(
        per_bucket, batch_format="pyarrow")
    out = partial_groupby(counts, ["p_brand", "p_type", "p_size"],
                          {"supplier_cnt": ("supplier_cnt", "sum")})
    return collect_table(out).sort_by([
        ("supplier_cnt", "descending"), ("p_brand", "ascending"),
        ("p_type", "ascending"), ("p_size", "ascending")])


def q_lone_return_suppliers(sf_dir: str) -> pa.Table:
    """(s_suppkey, s_name, n_orders): TPC-H Q21 shape — suppliers who
    were the ONLY supplier with returned lines in a multi-supplier
    order (returnflag replaces the receipt/commit delay; this schema
    has no receiptdate). The EXISTS + NOT-EXISTS pair collapses into
    per-order counts: (orderkey, suppkey, returned) partials map-side,
    ONE orderkey-bucket exchange where each bucket computes per-order
    supplier/returner counts and emits (suppkey, 1) for qualifying
    pairs, a supplier-sized combiner groupby, then one broadcast for
    names."""
    from raydoc.functions.joins import tag_union  # noqa: F401 (shape doc)

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_returnflag"])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return pa.table({"l_orderkey": pa.array([], pa.int64()),
                             "l_suppkey": pa.array([], pa.int64()),
                             "ret": pa.array([], pa.int64())})
        part_t = pa.table({
            "l_orderkey": t["l_orderkey"],
            "l_suppkey": t["l_suppkey"],
            "ret": pc.cast(pc.equal(t["l_returnflag"], "R"), pa.int64())})
        g = part_t.group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [("ret", "max")])
        return g.rename_columns(["l_orderkey", "l_suppkey", "ret"])

    from raydoc.functions._buckets import reduce_bucket_count
    mask = reduce_bucket_count() - 1

    def add_bucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return t.append_column("bucket", pa.array([], pa.int32()))
        return t.append_column(
            "bucket", pc.cast(pc.bit_wise_and(t["l_orderkey"], mask),
                              pa.int32()))

    exploded = li.map_batches(partial, batch_format="pyarrow") \
                 .map_batches(add_bucket, batch_format="pyarrow")

    sup_schema = pa.schema([("l_suppkey", pa.int64()),
                            ("n_orders", pa.int64())])

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return sup_schema.empty_table()
        # final per-(order, supplier) returned flag (batch partials of
        # one pair can split across batches but land in one bucket)
        d = g.select(["l_orderkey", "l_suppkey", "ret"]) \
             .group_by(["l_orderkey", "l_suppkey"]).aggregate(
            [("ret", "max")]) \
             .rename_columns(["l_orderkey", "l_suppkey", "ret"])
        per_order = d.group_by("l_orderkey").aggregate(
            [("l_suppkey", "count"), ("ret", "sum")]) \
            .rename_columns(["l_orderkey", "n_supp", "n_ret"])
        j = d.filter(pc.equal(d["ret"], 1)) \
             .join(per_order, keys="l_orderkey", join_type="inner")
        j = j.filter(pc.and_(pc.greater(j["n_supp"], 1),
                             pc.equal(j["n_ret"], 1)))
        c = j.group_by("l_suppkey").aggregate([("l_orderkey", "count")])
        return c.rename_columns(["l_suppkey", "n_orders"]) \
                .cast(sup_schema)

    counts = exploded.groupby("bucket").map_groups(
        per_bucket, batch_format="pyarrow")
    out = partial_groupby(counts, ["l_suppkey"],
                          {"n_orders": ("n_orders", "sum")})
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"]) \
             .rename_columns(["l_suppkey", "s_name"])
    named = broadcast_join(out, supp, key="l_suppkey")
    t = collect_table(named)
    t = t.sort_by([("n_orders", "descending"),
                   ("l_suppkey", "ascending")])
    return pa.table({"s_suppkey": t["l_suppkey"], "s_name": t["s_name"],
                     "n_orders": t["n_orders"]})


def q_orders_apply_changes(sf_dir: str) -> pa.Table:
    """(o_orderkey, o_totalprice, o_orderstatus): lakehouse MERGE — a
    deterministic CDC feed (every 7th key updated at v2, every 11th
    deleted at v3 — so keys divisible by 77 resolve delete-beats-update
    by version, every 13th re-inserted shifted +20M at v1) applied to
    the orders snapshot via functions/joins.py:apply_changes (one
    key-bucket exchange, tombstones drop, upserts replace-or-insert).
    The deletes-included completion of orders_upsert."""
    from raydoc.functions.joins import apply_changes

    cols = ["o_orderkey", "o_totalprice", "o_orderstatus"]
    base = _read(sf_dir, "orders", cols)

    def mk_changes(t: pa.Table) -> pa.Table:
        empty = pa.table({"o_orderkey": pa.array([], pa.int64()),
                          "o_totalprice": pa.array([], pa.float64()),
                          "o_orderstatus": pa.array([], pa.string()),
                          "version": pa.array([], pa.int64()),
                          "op": pa.array([], pa.string())})
        if t.num_rows == 0 or "o_orderkey" not in t.schema.names:
            return empty
        k = t["o_orderkey"]

        upd = t.filter(pc.equal(_pc_mod(k, 7), 0))
        upd = pa.table({
            "o_orderkey": upd["o_orderkey"],
            "o_totalprice": pc.add(upd["o_totalprice"], 5.0),
            "o_orderstatus": upd["o_orderstatus"],
            "version": pa.array([2] * upd.num_rows, pa.int64()),
            "op": pa.array(["U"] * upd.num_rows, pa.string()),
        })
        dele = t.filter(pc.equal(_pc_mod(k, 11), 0))
        dele = pa.table({
            "o_orderkey": dele["o_orderkey"],
            "o_totalprice": pa.nulls(dele.num_rows, pa.float64()),
            "o_orderstatus": pa.nulls(dele.num_rows, pa.string()),
            "version": pa.array([3] * dele.num_rows, pa.int64()),
            "op": pa.array(["D"] * dele.num_rows, pa.string()),
        })
        ins = t.filter(pc.equal(_pc_mod(k, 13), 0))
        ins = pa.table({
            "o_orderkey": pc.add(ins["o_orderkey"], 20_000_000),
            "o_totalprice": ins["o_totalprice"],
            "o_orderstatus": ins["o_orderstatus"],
            "version": pa.array([1] * ins.num_rows, pa.int64()),
            "op": pa.array(["I"] * ins.num_rows, pa.string()),
        })
        return pa.concat_tables([upd, dele, ins])

    changes = _read(sf_dir, "orders", cols).map_batches(
        mk_changes, batch_format="pyarrow")
    out = apply_changes(base, changes, key="o_orderkey",
                        version_col="version", op_col="op",
                        num_buckets=32)
    return collect_table(out).sort_by("o_orderkey")


def q_bloom_filtered_revenue(sf_dir: str,
                             price_threshold: float = 400_000.0,
                             n_bits: int = 1 << 20) -> pa.Table:
    """(l_returnflag, n_items, revenue_c100): revenue of lineitems whose
    order exceeds ``price_threshold`` — executed with BLOOM-JOIN PUSHDOWN,
    the runtime-filter optimization of distributed SQL engines: the
    qualifying orderkeys OR-fold into one broadcastable Bloom bitmap
    (``dedup.bloom_build_ints`` — worker-side tree fold, fixed-size
    result no matter how many build rows), every lineitem batch
    prefilters LOCALLY against the broadcast bitmap (no shuffle), and
    only the surviving minority pays the exact bucketed semi-join that
    removes Bloom false positives. Result is EXACT (false negatives
    impossible) — the SQL twin is the plain ``IN`` subquery — while the
    semi-join exchange moves ~selectivity·(1+FP) of the fact table
    instead of all of it. At 10⁹ build keys size ``n_bits`` ≥ 10
    bits/key (the broadcast stays a bitmap; an exact key SET at that
    scale would not fit). The SEMI-join sibling of the fused
    inner-join operator ``joins.bloom_prefiltered_join`` — EXISTS
    semantics must not duplicate matched fact rows, so the verify step
    is ``bucket_semi_join``, and the decomposed build/probe API
    (``dedup.bloom_build_ints``) lets one bitmap serve several probe
    datasets."""
    from raydoc.functions.agg import partial_groupby
    from raydoc.functions.dedup import (bloom_build_ints,
                                        bloom_filter_member_ints)
    from raydoc.functions.joins import bucket_semi_join

    keys = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]) \
        .map_batches(
            lambda t: t.filter(
                pc.greater(t["o_totalprice"], price_threshold))
            .select(["o_orderkey"]).rename_columns(["l_orderkey"]),
            batch_format="pyarrow") \
        .materialize()      # consumed twice (bloom build + verify join)
    bloom = bloom_build_ints(keys, "l_orderkey", n_bits)
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice",
                "l_discount"])
    li = bloom_filter_member_ints(li, bloom, "l_orderkey", n_bits)
    matched = bucket_semi_join(li, keys, key="l_orderkey")

    def rev(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_returnflag" not in t.schema.names:
            return pa.table({"l_returnflag": pa.array([], pa.string()),
                             "rev": pa.array([], pa.int64())})
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "rev": _rev_c100(t)})

    out = partial_groupby(matched.map_batches(rev, batch_format="pyarrow"),
                          ["l_returnflag"],
                          {"n_items": ("rev", "count"),
                           "revenue_c100": ("rev", "sum")})
    return collect_table(out).sort_by("l_returnflag")


def q_line_priority_counts(sf_dir: str) -> pa.Table:
    """(l_linestatus, high_line_count, low_line_count): TPC-H Q12 shape —
    per line status (this schema's stand-in for l_shipmode), how many
    1997-shipped lineitems belong to critical- vs normal-priority
    orders. The fact-fact join moves only pre-reduced partials:
    lineitems combine map-side to per-batch (orderkey, linestatus,
    n_lines), orders project (orderkey, is_high), both tag_union into
    ONE orderkey-bucket exchange, and each bucket joins + folds to
    (linestatus, hi, lo) partial counts — only |status|-sized rows
    leave the reduce. All-integer → hash-exact twin.
    Reference parity: DocFlow has no relational engine; this completes
    the 22/22 TPC-H query-shape sweep of the wider engine surface."""
    from raydoc.functions.joins import tag_union

    t0 = pa.scalar(__import__("datetime").datetime(1997, 1, 1),
                   pa.timestamp("us"))
    t1 = pa.scalar(__import__("datetime").datetime(1998, 1, 1),
                   pa.timestamp("us"))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linestatus", "l_shipdate"])

    def li_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "l_linestatus": pa.array([], pa.string()),
                             "n_lines": pa.array([], pa.int64())})
        t = t.filter(pc.and_(pc.greater_equal(t["l_shipdate"], t0),
                             pc.less(t["l_shipdate"], t1)))
        g = pa.table({"o_orderkey": t["l_orderkey"],
                      "l_linestatus": t["l_linestatus"],
                      "one": pa.array(np.ones(t.num_rows, np.int64))}) \
            .group_by(["o_orderkey", "l_linestatus"]).aggregate(
            [("one", "sum")])
        return g.rename_columns(["o_orderkey", "l_linestatus", "n_lines"])

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def ord_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.schema.names:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "is_high": pa.array([], pa.int64())})
        hi = pc.cast(pc.is_in(t["o_orderpriority"],
                              value_set=pa.array(["1-URGENT", "2-HIGH"])),
                     pa.int64())
        return pa.table({"o_orderkey": t["o_orderkey"], "is_high": hi})

    all_fields = [("o_orderkey", pa.int64()),
                  ("l_linestatus", pa.string()),
                  ("n_lines", pa.int64()), ("is_high", pa.int64())]
    tagged = tag_union(
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        li.map_batches(li_prep, batch_format="pyarrow"),
        "o_orderkey", all_fields, num_buckets=32)

    out_schema = pa.schema([("l_linestatus", pa.string()),
                            ("high_line_count", pa.int64()),
                            ("low_line_count", pa.int64())])

    def per_bucket(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        o = group.filter(pc.equal(side, 0)).select(
            ["o_orderkey", "is_high"])
        l = group.filter(pc.equal(side, 1)).select(
            ["o_orderkey", "l_linestatus", "n_lines"])
        if o.num_rows == 0 or l.num_rows == 0:
            return out_schema.empty_table()
        j = l.join(o, keys="o_orderkey", join_type="inner")
        hi = pc.multiply(j["n_lines"], j["is_high"])
        lo = pc.subtract(j["n_lines"], hi)
        g = pa.table({"l_linestatus": j["l_linestatus"],
                      "high_line_count": hi, "low_line_count": lo}) \
            .group_by(["l_linestatus"]).aggregate(
            [("high_line_count", "sum"), ("low_line_count", "sum")])
        return g.rename_columns(["l_linestatus", "high_line_count",
                                 "low_line_count"]).cast(out_schema)

    counts = tagged.groupby("__bucket").map_groups(
        per_bucket, batch_format="pyarrow")
    out = partial_groupby(counts, ["l_linestatus"],
                          {"high_line_count": ("high_line_count", "sum"),
                           "low_line_count": ("low_line_count", "sum")})
    return collect_table(out).sort_by("l_linestatus")


def q_dominant_part_suppliers(sf_dir: str) -> pa.Table:
    """(s_suppkey, s_name, n_parts): TPC-H Q20 shape — suppliers that
    shipped MORE THAN HALF of the total shipped quantity of at least
    one 'large …' part during the 2000 ship-year (no partsupp table in
    this schema; lineitem stands in for the supply relationship, the
    0.5·SUM correlated subquery over a one-year window is the Q20
    semantics being exercised). Topology: the part
    prefix filter broadcasts a partkey SET once (``ray.put``) so
    lineitem prunes map-side BEFORE the exchange; surviving lines
    combine to per-batch (partkey, suppkey, qty) partials; ONE
    partkey-bucket exchange finishes per-pair and per-part totals
    locally and emits only qualifying (suppkey, partkey) pairs —
    integer compare 2·sq > tq, no division; a supplier-sized combiner
    groupby counts parts per supplier and ONE broadcast attaches
    names. Driver sees supplier-sized rows only."""
    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    keep = part.filter(
        pc.starts_with(part["p_name"], "large"))["p_partkey"]
    keys_ref = ray.put(pc.cast(keep, pa.int64()).combine_chunks())

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])

    from raydoc.functions._buckets import reduce_bucket_count
    mask = reduce_bucket_count() - 1
    import datetime
    d0 = pa.scalar(datetime.datetime(2000, 1, 1), pa.timestamp("us"))
    d1 = pa.scalar(datetime.datetime(2001, 1, 1), pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"l_partkey": pa.array([], pa.int64()),
                          "l_suppkey": pa.array([], pa.int64()),
                          "qty": pa.array([], pa.int64()),
                          "bucket": pa.array([], pa.int32())})
        if t.num_rows == 0 or "l_partkey" not in t.schema.names:
            return empty
        t = t.filter(pc.and_(
            pc.is_in(t["l_partkey"], value_set=ray.get(keys_ref)),
            pc.and_(pc.greater_equal(t["l_shipdate"], d0),
                    pc.less(t["l_shipdate"], d1))))
        if t.num_rows == 0:
            return empty
        g = pa.table({"l_partkey": t["l_partkey"],
                      "l_suppkey": t["l_suppkey"],
                      "qty": pc.cast(t["l_quantity"], pa.int64())}) \
            .group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("qty", "sum")]) \
            .rename_columns(["l_partkey", "l_suppkey", "qty"])
        bk = pc.cast(pc.bit_wise_and(g["l_partkey"], mask), pa.int32())
        return g.append_column("bucket", bk)

    exploded = li.map_batches(partial, batch_format="pyarrow")

    pair_schema = pa.schema([("l_suppkey", pa.int64()),
                             ("n_parts", pa.int64())])

    def per_bucket(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pair_schema.empty_table()
        d = g.select(["l_partkey", "l_suppkey", "qty"]) \
             .group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("qty", "sum")]) \
             .rename_columns(["l_partkey", "l_suppkey", "sq"])
        tot = d.group_by("l_partkey").aggregate([("sq", "sum")]) \
               .rename_columns(["l_partkey", "tq"])
        j = d.join(tot, keys="l_partkey", join_type="inner")
        j = j.filter(pc.greater(pc.multiply(j["sq"], pa.scalar(2, pa.int64())),
                                j["tq"]))
        c = j.group_by("l_suppkey").aggregate([("l_partkey", "count")])
        return c.rename_columns(["l_suppkey", "n_parts"]).cast(pair_schema)

    counts = exploded.groupby("bucket").map_groups(
        per_bucket, batch_format="pyarrow")
    out = partial_groupby(counts, ["l_suppkey"],
                          {"n_parts": ("n_parts", "sum")})
    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_name"]) \
             .rename_columns(["l_suppkey", "s_name"])
    named = broadcast_join(out, supp, key="l_suppkey")
    t = collect_table(named).sort_by([("l_suppkey", "ascending")])
    return pa.table({"s_suppkey": t["l_suppkey"], "s_name": t["s_name"],
                     "n_parts": t["n_parts"]})


def q_building_orders_full_join(sf_dir: str) -> pa.Table:
    """FULL OUTER JOIN driver twin: BUILDING-segment customers vs
    per-customer order rollups. Non-vacuous on BOTH unmatched sides —
    TPC-H leaves ~1/3 of customers orderless (left-only rows: account
    balance, null order stats) and the segment filter strands every
    non-BUILDING customer's orders (right-only rows: order stats, null
    balance).

    Scale shape: orders pre-reduce map-side to per-batch (custkey,
    n_part, sum_part) partials and tag_union into ONE custkey-bucket
    exchange with the filtered dimension; each bucket finishes the
    fold AND the pyarrow full-outer join (coalesced key, unmatched
    sides null-pad) — the ``line_priority_counts`` single-exchange
    shape with an outer join at the end. Integer cents keep the
    DuckDB hash bit-exact."""
    from raydoc.functions.joins import tag_union

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_mktsegment", "c_acctbal"]) \
        .map_batches(lambda t: pa.table({
            "c_custkey": (f := t.filter(
                pc.equal(t["c_mktsegment"], "BUILDING")))["c_custkey"],
            "acctbal_cents": _cents(f["c_acctbal"])}),
            batch_format="pyarrow")

    def ord_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_custkey" not in t.schema.names:
            return pa.table({"c_custkey": pa.array([], pa.int64()),
                             "n_part": pa.array([], pa.int64()),
                             "sum_part": pa.array([], pa.int64())})
        g = pa.table({"c_custkey": t["o_custkey"],
                      "one": pa.array(np.ones(t.num_rows, np.int64)),
                      "cents": _cents(t["o_totalprice"])}) \
            .group_by(["c_custkey"]).aggregate(
            [("one", "sum"), ("cents", "sum")])
        return g.rename_columns(["c_custkey", "n_part", "sum_part"])

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(ord_prep, batch_format="pyarrow")

    all_fields = [("c_custkey", pa.int64()), ("acctbal_cents", pa.int64()),
                  ("n_part", pa.int64()), ("sum_part", pa.int64())]
    tagged = tag_union(cust, orders, "c_custkey", all_fields,
                       num_buckets=32)

    out_schema = pa.schema([("c_custkey", pa.int64()),
                            ("acctbal_cents", pa.int64()),
                            ("n_orders", pa.int64()),
                            ("total_cents", pa.int64())])

    def per_bucket(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        c = group.filter(pc.equal(side, 0)).select(
            ["c_custkey", "acctbal_cents"])
        o = group.filter(pc.equal(side, 1)).select(
            ["c_custkey", "n_part", "sum_part"])
        if c.num_rows == 0 and o.num_rows == 0:
            return out_schema.empty_table()
        o = o.group_by(["c_custkey"]).aggregate(
            [("n_part", "sum"), ("sum_part", "sum")]).rename_columns(
            ["c_custkey", "n_orders", "total_cents"])
        j = c.join(o, keys="c_custkey", join_type="full outer")
        return j.select(out_schema.names).cast(out_schema)

    out = tagged.groupby("__bucket").map_groups(per_bucket,
                                                batch_format="pyarrow")
    return collect_table(out).sort_by("c_custkey")


def q_orders_scd2_snapshot(sf_dir: str, at_version: int = 2) -> pa.Table:
    """(o_orderkey, version, o_totalprice): TIME-TRAVEL read — the
    orders table AS OF ``at_version``, reconstructed from the same SCD2
    history ``q_orders_scd2`` builds. Snapshot selection is a pure
    validity filter on the history (version ≤ v AND (valid_to IS NULL
    OR valid_to ≥ v)) — one map_batches after the history's single
    key-bucket exchange, no extra shuffle: the lakehouse ``FOR
    TIMESTAMP AS OF`` primitive expressed over the versioned stream."""
    from raydoc.functions.joins import scd2_history

    cols = ["o_orderkey", "o_totalprice"]

    def ver(version: int, mod: int, bump: float):
        def fn(t: pa.Table) -> pa.Table:
            k = t["o_orderkey"]
            if mod > 1:
                t = t.filter(pc.equal(_pc_mod(k, mod), 0))
            return pa.table({
                "o_orderkey": t["o_orderkey"],
                "version": pa.array([version] * t.num_rows, pa.int64()),
                "o_totalprice": pc.add(t["o_totalprice"], bump)
                if bump else t["o_totalprice"]})
        return fn

    base = _read(sf_dir, "orders", cols).map_batches(
        ver(1, 1, 0.0), batch_format="pyarrow")
    u2 = _read(sf_dir, "orders", cols).map_batches(
        ver(2, 7, 1.0), batch_format="pyarrow")
    u3 = _read(sf_dir, "orders", cols).map_batches(
        ver(3, 21, 2.0), batch_format="pyarrow")
    hist = scd2_history(base.union(u2).union(u3), key="o_orderkey",
                        version_col="version", num_buckets=16)

    v = at_version

    def live_at(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "version" not in t.schema.names:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "version": pa.array([], pa.int64()),
                             "o_totalprice": pa.array([], pa.float64())})
        # valid_to is NULL while current (a pandas hop inside
        # scd2_history may surface it as float64 NaN — nan_is_null
        # covers both), and the OR must be Kleene: plain pc.or_
        # propagates the null from >=(NULL, v) and filter() DROPS
        # null-mask rows, silently losing every current row
        keep = pc.and_(
            pc.less_equal(t["version"], v),
            pc.or_kleene(pc.is_null(t["valid_to"], nan_is_null=True),
                         pc.greater_equal(t["valid_to"], v)))
        return t.filter(keep).select(
            ["o_orderkey", "version", "o_totalprice"])

    out = hist.map_batches(live_at, batch_format="pyarrow")
    return collect_table(out).sort_by("o_orderkey")


def q_star_flatten(sf_dir: str, num_buckets: int = 32) -> pa.Table:
    """(c_nation, s_nation, n_rows, checksum): star-schema
    DENORMALIZATION — every lineitem flattened to the full wide
    training row (order date/status, customer segment + nation,
    supplier name + nation, part brand + type), the feature-store /
    training-table materialization pattern. The result is summarized as
    per-(customer-nation, supplier-nation) row counts plus an
    order-independent md5 checksum over the complete wide-row content
    (Σ md5₆₄ mod 2⁶⁴, 16-bit limb partials — the orders_checksum
    discipline), so the oracle proves every attribute of every wide row
    bit-exact without shipping 6 B wide rows to the driver.

    Topology (the honest 100-TB star shape): the two BIG dimensions
    meet the facts in thin bucketed exchanges — orders⋈customer on ONE
    custkey-bucket exchange, the result⋈lineitem on ONE orderkey-bucket
    exchange whose lineitem side carries integers only; the genuinely
    small dimensions (nation, supplier, part) broadcast once via
    ``ray.put`` and attach INSIDE the bucket task AFTER the join, so
    no dimension string ever rides an exchange twice."""
    import hashlib

    import pandas as pd

    from raydoc.functions.joins import tag_union

    def _i64(t: pa.Table, key: str) -> pa.Table:
        return t.set_column(t.schema.get_field_index(key), key,
                            pc.cast(t[key], pa.int64()))

    nat = _i64(pq.read_table(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"]),
               "n_nationkey")
    sup = _i64(_i64(pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey"]), "s_suppkey"),
        "s_nationkey") \
        .join(nat.rename_columns(["s_nationkey", "n_name"]),
              keys="s_nationkey") \
        .select(["s_suppkey", "s_name", "n_name"]) \
        .rename_columns(["s_suppkey", "s_name", "s_nation"])
    prt = _i64(pq.read_table(f"{sf_dir}/part.parquet",
                             columns=["p_partkey", "p_brand", "p_type"]),
               "p_partkey")
    cnat = nat.rename_columns(["c_nationkey", "c_nation"])
    nat_ref = ray.put(cnat)
    sup_ref = ray.put(sup)
    prt_ref = ray.put(prt)

    # ---- exchange 1: orders ⋈ customer on custkey -------------------
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderstatus",
                    "o_orderdate"])

    def ord_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_orderkey" not in t.schema.names:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "o_orderkey": pa.array([], pa.int64()),
                             "odate_us": pa.array([], pa.int64()),
                             "o_orderstatus": pa.array([], pa.string())})
        return pa.table({"o_custkey": t["o_custkey"],
                         "o_orderkey": t["o_orderkey"],
                         "odate_us": pc.cast(t["o_orderdate"], pa.int64()),
                         "o_orderstatus": t["o_orderstatus"]})

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_mktsegment", "c_nationkey"])

    def cust_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c_custkey" not in t.schema.names:
            return pa.table({"o_custkey": pa.array([], pa.int64()),
                             "c_mktsegment": pa.array([], pa.string()),
                             "c_nationkey": pa.array([], pa.int64())})
        return pa.table({"o_custkey": t["c_custkey"],
                         "c_mktsegment": t["c_mktsegment"],
                         "c_nationkey": t["c_nationkey"]})

    fields1 = [("o_custkey", pa.int64()), ("o_orderkey", pa.int64()),
               ("odate_us", pa.int64()), ("o_orderstatus", pa.string()),
               ("c_mktsegment", pa.string()), ("c_nationkey", pa.int64())]
    tagged1 = tag_union(
        orders.map_batches(ord_prep, batch_format="pyarrow"),
        cust.map_batches(cust_prep, batch_format="pyarrow"),
        "o_custkey", fields1, num_buckets)

    oside_schema = pa.schema(
        [("o_orderkey", pa.int64()), ("odate_us", pa.int64()),
         ("o_orderstatus", pa.string()), ("c_mktsegment", pa.string()),
         ("c_nationkey", pa.int64())])

    def join1(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        o = group.filter(pc.equal(side, 0)).select(
            ["o_custkey", "o_orderkey", "odate_us", "o_orderstatus"])
        c = group.filter(pc.equal(side, 1)).select(
            ["o_custkey", "c_mktsegment", "c_nationkey"])
        if o.num_rows == 0 or c.num_rows == 0:
            return oside_schema.empty_table()
        return o.join(c, keys="o_custkey", join_type="inner") \
            .select(oside_schema.names).cast(oside_schema)

    oside = tagged1.groupby("__bucket").map_groups(
        join1, batch_format="pyarrow")

    # ---- exchange 2: lineitem ⋈ order-side on orderkey (ints only) --
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_suppkey", "l_partkey"])

    def li_prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "l_linenumber": pa.array([], pa.int64()),
                             "qty": pa.array([], pa.int64()),
                             "price_c": pa.array([], pa.int64()),
                             "l_suppkey": pa.array([], pa.int64()),
                             "l_partkey": pa.array([], pa.int64())})
        return pa.table({"o_orderkey": t["l_orderkey"],
                         "l_linenumber": pc.cast(t["l_linenumber"],
                                                 pa.int64()),
                         "qty": pc.cast(pc.round(t["l_quantity"]),
                                        pa.int64()),
                         "price_c": _cents(t["l_extendedprice"]),
                         "l_suppkey": t["l_suppkey"],
                         "l_partkey": t["l_partkey"]})

    fields2 = [("o_orderkey", pa.int64()), ("l_linenumber", pa.int64()),
               ("qty", pa.int64()), ("price_c", pa.int64()),
               ("l_suppkey", pa.int64()), ("l_partkey", pa.int64()),
               ("odate_us", pa.int64()), ("o_orderstatus", pa.string()),
               ("c_mktsegment", pa.string()), ("c_nationkey", pa.int64())]
    tagged2 = tag_union(oside, li.map_batches(li_prep,
                                              batch_format="pyarrow"),
                        "o_orderkey", fields2, num_buckets)

    part_schema = pa.schema(
        [("c_nation", pa.string()), ("s_nation", pa.string()),
         ("n", pa.int64())] +
        [(f"s{i}", pa.int64()) for i in range(4)])

    def join2(group: pa.Table) -> pa.Table:
        side = group.column("__side")
        o = group.filter(pc.equal(side, 0)).select(
            ["o_orderkey", "odate_us", "o_orderstatus", "c_mktsegment",
             "c_nationkey"])
        l = group.filter(pc.equal(side, 1)).select(
            ["o_orderkey", "l_linenumber", "qty", "price_c", "l_suppkey",
             "l_partkey"])
        if o.num_rows == 0 or l.num_rows == 0:
            return part_schema.empty_table()
        w = l.join(o, keys="o_orderkey", join_type="inner")
        # broadcast dims attach AFTER the exchange (zero-copy reads)
        w = w.join(ray.get(nat_ref), keys="c_nationkey")
        w = w.join(ray.get(sup_ref), keys="l_suppkey",
                   right_keys="s_suppkey")
        w = w.join(ray.get(prt_ref), keys="l_partkey",
                   right_keys="p_partkey")
        # wide-row content string built vectorized; only md5 is a loop
        key_str = pc.binary_join_element_wise(
            pc.cast(w["o_orderkey"], pa.string()),
            pc.cast(w["l_linenumber"], pa.string()),
            pc.cast(w["qty"], pa.string()),
            pc.cast(w["price_c"], pa.string()),
            pc.cast(w["odate_us"], pa.string()),
            w["o_orderstatus"], w["c_mktsegment"], w["c_nation"],
            w["s_name"], w["s_nation"], w["p_brand"], w["p_type"],
            pa.scalar("|")).cast(pa.binary())
        md5 = hashlib.md5
        hs = np.fromiter(
            (int.from_bytes(md5(s.as_py()).digest()[:8], "big")
             for s in key_str.combine_chunks()),
            dtype=np.uint64, count=w.num_rows)
        df = pd.DataFrame({
            "c_nation": w["c_nation"].to_pandas(),
            "s_nation": w["s_nation"].to_pandas(),
            "n": np.ones(w.num_rows, np.int64),
            **{f"s{i}": ((hs >> np.uint64(16 * i))
                         & np.uint64(0xFFFF)).astype(np.int64)
               for i in range(4)}})
        out = df.groupby(["c_nation", "s_nation"], sort=True,
                         as_index=False).sum()
        return pa.Table.from_pandas(out, preserve_index=False) \
            .cast(part_schema)

    parts = tagged2.groupby("__bucket").map_groups(
        join2, batch_format="pyarrow")
    # per-bucket partials are ≤ |c_nation|·|s_nation| rows each — fold
    # the ≤ buckets·625 tiny rows on the driver instead of paying a
    # third all-to-all barrier
    g = collect_table(parts).group_by(
        ["c_nation", "s_nation"], use_threads=False).aggregate(
        [("n", "sum")] + [(f"s{i}", "sum") for i in range(4)]) \
        .rename_columns(["c_nation", "s_nation", "n_rows"]
                        + [f"s{i}" for i in range(4)]).sort_by(
        [("c_nation", "ascending"), ("s_nation", "ascending")])
    sums = [(int(a) + (int(b) << 16) + (int(c) << 32) + (int(d) << 48))
            % (1 << 64)
            for a, b, c, d in zip(g.column("s0").to_pylist(),
                                  g.column("s1").to_pylist(),
                                  g.column("s2").to_pylist(),
                                  g.column("s3").to_pylist())]
    return pa.table({
        "c_nation": g.column("c_nation"),
        "s_nation": g.column("s_nation"),
        "n_rows": pc.cast(g.column("n_rows"), pa.int64()),
        "checksum": pa.array([format(v, "016x") for v in sums],
                             pa.string())})


def q_ship_latency_percentiles(sf_dir: str,
                               num_buckets: int = 256) -> pa.Table:
    """(o_orderpriority, p50_days, p90_days): EXACT median and p90 of
    the order-to-ship latency (l_shipdate − o_orderdate, integer days)
    per order priority — the fulfillment-SLA tail report, and a date-
    arithmetic exercise of the two-pass distributed selection
    (``windows._exact_group_quantile``, DuckDB ``quantile_disc``
    semantics).

    Shape: one bucketed hash join lineitem ⋈ orders (only the three
    needed columns move), then the selection's two combiner passes —
    the driver sees G×B count cells plus ~2/B of the rows, never the
    join output."""
    from raydoc.functions.windows import _exact_group_quantile

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    od = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": t["o_orderkey"],
                         "o_orderdate": t["o_orderdate"],
                         "prio": t["o_orderpriority"]})

    j = bucket_hash_join(
        li, od.map_batches(rename, batch_format="pyarrow"),
        key="l_orderkey")

    def to_days(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "value": pa.array([], pa.float64())})
        days = pc.days_between(t["o_orderdate"], t["l_shipdate"])
        return pa.table({
            "event_type": t["prio"],
            "value": pc.cast(days, pa.float64())})

    ds = j.map_batches(to_days, batch_format="pyarrow").materialize()
    p50 = _exact_group_quantile(ds, 0.5, num_buckets)
    p90 = _exact_group_quantile(ds, 0.9, num_buckets)
    gs = sorted(p50)
    return pa.table({
        "o_orderpriority": pa.array(gs, pa.string()),
        "p50_days": pa.array([p50[g] for g in gs], pa.float64()),
        "p90_days": pa.array([p90[g] for g in gs], pa.float64())})
