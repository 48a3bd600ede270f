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
