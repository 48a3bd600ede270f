"""Catalog-level multi-table transactions: cross-table snapshot
isolation, crash invisibility, and racing-txn convergence."""

import os
import threading

import pyarrow as pa
import pytest

import ray.data as rd

from raydoc.state import catalog as cat
from raydoc.state import table_log as tl


def _tbl(vals):
    return rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))


def test_txn_pins_consistent_pair(ray_session, tmp_path):
    root = str(tmp_path)
    a, b = os.path.join(root, "a"), os.path.join(root, "b")
    v0 = cat.txn(root, [("a", _tbl([1, 2]), a), ("b", _tbl([10]), b)])
    v1 = cat.txn(root, [("a", _tbl([3]), a), ("b", _tbl([20]), b)])
    assert (v0, v1) == (0, 1)
    for v, want_a, want_b in ((0, [1, 2], [10]), (1, [1, 2, 3],
                                                  [10, 20])):
        ga = sorted(r["x"] for r in
                    cat.read_catalog_table(root, "a", v).take_all())
        gb = sorted(r["x"] for r in
                    cat.read_catalog_table(root, "b", v).take_all())
        assert (ga, gb) == (want_a, want_b)


def test_crashed_txn_is_invisible(ray_session, tmp_path):
    """A table append WITHOUT its catalog commit (crash between the
    two phases) never shows through the catalog."""
    root = str(tmp_path)
    a = os.path.join(root, "a")
    cat.txn(root, [("a", _tbl([1]), a)])
    tl.append(_tbl([99]), a)           # simulated half-finished txn
    got = [r["x"] for r in cat.read_catalog_table(root, "a").take_all()]
    assert got == [1]
    # the orphaned version exists in the table log but no catalog pin
    assert tl.latest_version(a) == 1
    assert cat.catalog_snapshot(root)["tables"]["a"]["version"] == 0


def test_racing_txns_on_disjoint_tables_both_land(ray_session,
                                                  tmp_path):
    root = str(tmp_path)
    a, b = os.path.join(root, "a"), os.path.join(root, "b")
    cat.txn(root, [("a", _tbl([1]), a)])
    errs = []

    def run(name, path, vals):
        try:
            cat.txn(root, [(name, _tbl(vals), path)])
        except Exception as e:        # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=run, args=("a", a, [2]))
    t2 = threading.Thread(target=run, args=("b", b, [7]))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    head = cat.catalog_snapshot(root)
    assert head["version"] == 2
    assert head["tables"]["a"]["version"] == 1
    assert head["tables"]["b"]["version"] == 0
    ga = sorted(r["x"] for r in
                cat.read_catalog_table(root, "a").take_all())
    gb = [r["x"] for r in cat.read_catalog_table(root, "b").take_all()]
    assert (ga, gb) == ([1, 2], [7])


def test_unknown_table_raises(ray_session, tmp_path):
    root = str(tmp_path)
    cat.txn(root, [("a", _tbl([1]), os.path.join(root, "a"))])
    with pytest.raises(ValueError, match="not in catalog"):
        cat.read_catalog_table(root, "zz")


def test_same_table_interleaving_fail_stops(ray_session, tmp_path):
    """A foreign append interleaved between a txn's append and its
    catalog commit (the crashed-concurrent-writer hole) must make the
    commit REFUSE rather than pin across the foreign rows — pinning
    them would expose that txn's facts without its audit row."""
    root = str(tmp_path)
    facts = os.path.join(root, "facts")
    audit = os.path.join(root, "audit")
    cat.txn(root, [("facts", _tbl([1]), facts),
                   ("audit", _tbl([100]), audit)])
    tl.append(_tbl([99]), facts)       # txn B appended, then crashed
    with pytest.raises(RuntimeError, match="interleaved"):
        cat.txn(root, [("facts", _tbl([2]), facts),
                       ("audit", _tbl([200]), audit)], max_retries=3)
    # catalog still consistent: head pins unchanged, B's (and the
    # failed txn C's) rows invisible
    got = [r["x"] for r in
           cat.read_catalog_table(root, "facts").take_all()]
    assert got == [1]
    assert cat.catalog_snapshot(root)["version"] == 0


def test_adopt_table_unwedges_after_crashed_writer(ray_session,
                                                   tmp_path):
    """adopt_table is the operator repair: it pins the table's current
    head (sanctioning the orphaned rows), after which normal txns land
    again."""
    root = str(tmp_path)
    facts = os.path.join(root, "facts")
    audit = os.path.join(root, "audit")
    cat.txn(root, [("facts", _tbl([1]), facts),
                   ("audit", _tbl([100]), audit)])
    tl.append(_tbl([99]), facts)       # crashed writer's orphan
    with pytest.raises(RuntimeError):
        cat.txn(root, [("facts", _tbl([2]), facts),
                       ("audit", _tbl([200]), audit)], max_retries=2)
    # the failed txn orphaned an append in BOTH tables — the operator
    # repairs the full set
    cat.adopt_table(root, "facts", facts)
    cat.adopt_table(root, "audit", audit)
    v = cat.txn(root, [("facts", _tbl([3]), facts),
                       ("audit", _tbl([300]), audit)])
    got = sorted(r["x"] for r in
                 cat.read_catalog_table(root, "facts", v).take_all())
    # adopted state includes the orphans (99 from B, 2 from failed C)
    assert got == [1, 2, 3, 99]


def test_same_table_racing_txns_serialize(ray_session, tmp_path):
    """Two live txns writing the SAME table pair: the later committer
    waits for the earlier commit, so every catalog version satisfies
    the facts-sum == audit-sum invariant (no partial transaction)."""
    root = str(tmp_path)
    facts = os.path.join(root, "facts")
    audit = os.path.join(root, "audit")
    errs = []

    def run(vals):
        try:
            cat.txn(root, [("facts", _tbl(vals), facts),
                           ("audit", _tbl([len(vals)]), audit)])
        except Exception as e:        # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=run, args=([1, 2],))
    t2 = threading.Thread(target=run, args=([3, 4, 5],))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    head = cat.catalog_snapshot(root)
    for v in range(head["version"] + 1):
        nf = len(cat.read_catalog_table(root, "facts", v).take_all())
        na = sum(r["x"] for r in
                 cat.read_catalog_table(root, "audit", v).take_all())
        assert nf == na
    assert len(cat.read_catalog_table(root, "facts").take_all()) == 5


def test_new_table_racing_txns_serialize(ray_session, tmp_path):
    """N threads racing txns on a BRAND-NEW table pair (the catalog has
    never seen either table): first-ever writers must serialize exactly
    like existing-table writers — zero RuntimeErrors, and EVERY
    committed catalog version satisfies the cross-table invariant
    facts-count == audit-sum (no torn partial-transaction read)."""
    root = str(tmp_path)
    facts = os.path.join(root, "facts")
    audit = os.path.join(root, "audit")
    errs = []

    def run(vals):
        try:
            cat.txn(root, [("facts", _tbl(vals), facts),
                           ("audit", _tbl([len(vals)]), audit)])
        except Exception as e:        # noqa: BLE001
            errs.append(e)

    payloads = [[1], [2, 3], [4, 5, 6], [7, 8, 9, 10]]
    threads = [threading.Thread(target=run, args=(p,))
               for p in payloads]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    head = cat.catalog_snapshot(root)
    assert head["version"] == len(payloads) - 1
    for v in range(head["version"] + 1):
        nf = len(cat.read_catalog_table(root, "facts", v).take_all())
        na = sum(r["x"] for r in
                 cat.read_catalog_table(root, "audit", v).take_all())
        assert nf == na, (v, nf, na)
    got = sorted(r["x"] for r in
                 cat.read_catalog_table(root, "facts").take_all())
    assert got == sorted(x for p in payloads for x in p)


def test_opposite_order_multi_table_txns_both_land(ray_session,
                                                   tmp_path):
    """Two txns listing the same two tables in OPPOSITE orders (A: t
    then u; B: u then t) — the historical livelock interleaving: sorted
    lock acquisition means both land with zero errors and every version
    is consistent (t-count == u-sum)."""
    root = str(tmp_path)
    t_dir = os.path.join(root, "t")
    u_dir = os.path.join(root, "u")
    errs = []

    def run(order, vals):
        w = [("t", _tbl(vals), t_dir),
             ("u", _tbl([len(vals)]), u_dir)]
        if order == "reversed":
            w = w[::-1]
        try:
            cat.txn(root, w)
        except Exception as e:        # noqa: BLE001
            errs.append(e)

    t1 = threading.Thread(target=run, args=("forward", [1, 2]))
    t2 = threading.Thread(target=run, args=("reversed", [3, 4, 5]))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs, errs
    head = cat.catalog_snapshot(root)
    assert head["version"] == 1
    for v in range(head["version"] + 1):
        nt = len(cat.read_catalog_table(root, "t", v).take_all())
        nu = sum(r["x"] for r in
                 cat.read_catalog_table(root, "u", v).take_all())
        assert nt == nu, (v, nt, nu)


def test_adopt_race_repins_on_head(ray_session, tmp_path,
                                   monkeypatch):
    """If the head advances PAST a txn's own appends between its append
    and its catalog commit (an adopt_table operator-repair race), the
    txn re-pins on the head — cumulative table-log versions mean its
    rows are already covered — instead of burning retries into a
    RuntimeError. Deterministic: the race is injected right after the
    txn's append via a patched table_log.append."""
    root = str(tmp_path)
    a = os.path.join(root, "a")
    b = os.path.join(root, "b")
    cat.txn(root, [("a", _tbl([1]), a)])
    real_append = tl.append

    def racing_append(ds, tdir, **kw):
        v = real_append(ds, tdir, **kw)
        if os.path.abspath(tdir) == os.path.abspath(a) and v == 1:
            # between the txn's append (v=1) and its commit, a foreign
            # writer appends and an operator adopts the head past us
            real_append(_tbl([99]), a)
            cat.adopt_table(root, "a", a)
        return v

    monkeypatch.setattr(tl, "append", racing_append)
    v = cat.txn(root, [("a", _tbl([2]), a), ("b", _tbl([7]), b)])
    # the commit landed (no RuntimeError), pinned on the adopted head
    snap = cat.catalog_snapshot(root, v)
    assert snap["tables"]["a"]["version"] == 2
    got = sorted(r["x"] for r in
                 cat.read_catalog_table(root, "a", v).take_all())
    assert got == [1, 2, 99]          # our rows covered by the head pin
    gb = [r["x"] for r in cat.read_catalog_table(root, "b", v).take_all()]
    assert gb == [7]


def test_catalog_cdc_stream_totals(ray_session):
    """The corpus-scale CDC exercise at sf0.001: 8 atomic txns stream
    all of lineitem through the catalog; totals equal a direct scan and
    the audit table mirrors them exactly."""
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    r = cat.catalog_cdc_stream(sf).to_pylist()[0]
    li = pq.read_table(f"{sf}/lineitem.parquet",
                       columns=["l_extendedprice"])
    want_rows = li.num_rows
    want_cents = sum(round(v * 100) for v in
                     li["l_extendedprice"].to_pylist())
    assert r["n_txns"] == r["n_versions"] == r["audit_rows"] == 8
    assert r["n_rows"] == r["audit_total_rows"] == want_rows
    assert r["sum_cents"] == r["audit_total_cents"] == want_cents
