"""Catalog-level multi-table transactions over ``state/table_log.py``
tables — snapshot isolation ACROSS tables (the Iceberg-REST-catalog
idea, dependency-free).

A single table log makes one table's commits atomic; a pipeline that
maintains, say, a fact table AND its quarantine/rejects table needs the
PAIR to move together. The catalog is its own tiny commit log whose
entries pin ``{table_name: (table_dir, version)}``:

- ``txn(catalog_dir, writes)`` appends to every table FIRST (each
  append is individually atomic and, crucially, invisible to catalog
  readers until pinned), then claims the next catalog version with the
  same ``O_CREAT | O_EXCL`` optimistic-concurrency protocol the table
  log uses. A crash between the table appends and the catalog commit
  leaves newer table versions that no catalog snapshot references —
  catalog readers NEVER observe a partial transaction; the orphaned
  versions are ordinary vacuumable history.
- ``catalog_snapshot`` / ``read_catalog_table`` resolve a consistent
  cross-table view: every table reads at its pinned version, so a
  reader joining two tables can never see one table's half of a
  transaction without the other's.
- Racing transactions touching DISJOINT tables both land, in some
  order: the loser of the catalog-version race re-reads the head and
  re-pins. Racing transactions writing the SAME table serialize on a
  per-table advisory lock (``flock`` on a file under the catalog log,
  acquired in sorted-name order so opposite-order multi-table txns
  can't deadlock) held across the append AND the catalog commit —
  table-log versions are cumulative, so an interleaved foreign append
  between a txn's append and its commit would expose that txn's rows
  without its other tables; the lock makes the interleaving impossible
  for LIVE writers, including two concurrent FIRST writers of a
  brand-new table. The lock is tied to the open file description, so
  a writer that dies releases it automatically. A CRASHED writer that
  appended but never committed (its lock auto-released) still leaves
  orphaned versions below the next txn's appends; that txn fail-stops
  with a clear ``RuntimeError`` after ``max_retries`` — repair with
  ``adopt_table`` (operator-sanctioned) or vacuum the orphans. If the
  head has meanwhile advanced PAST a txn's own appends (an
  ``adopt_table`` race), the txn re-pins on the head — cumulative
  versions mean its rows are already covered — instead of retrying
  forever.

No wall-clock enters the log; reruns are byte-deterministic.
"""

from __future__ import annotations

import fcntl
import hashlib
import json
import os
import re
import threading

import ray.data as rd

from raydoc.state import table_log as _tl

_LOG = "_catalog"


def _log_dir(catalog_dir: str) -> str:
    return os.path.join(catalog_dir, _LOG)


def _version_path(catalog_dir: str, version: int) -> str:
    return os.path.join(_log_dir(catalog_dir), f"{version:08d}.json")


def _table_lock_paths(catalog_dir: str, names: list[str]) -> list[str]:
    """One lock file per distinct written table, SORTED by name —
    ordered acquisition prevents deadlock between multi-table txns
    that list the same tables in different orders."""
    d = os.path.join(_log_dir(catalog_dir), "_locks")
    os.makedirs(d, exist_ok=True)
    out = []
    for name in sorted(set(names)):
        safe = re.sub(r"[^A-Za-z0-9._-]", "_", name)[:80]
        tag = hashlib.blake2s(name.encode(), digest_size=4).hexdigest()
        out.append(os.path.join(d, f"{safe}-{tag}.lock"))
    return out


def list_versions(catalog_dir: str) -> list[int]:
    d = _log_dir(catalog_dir)
    if not os.path.isdir(d):
        return []
    return sorted(int(f[:-5]) for f in os.listdir(d)
                  if f.endswith(".json") and f[:-5].isdigit())


def catalog_snapshot(catalog_dir: str,
                     version: int | None = None) -> dict:
    """{"version": V, "tables": {name: {"dir": ..., "version": v}}} —
    the consistent cross-table view at catalog version V (default:
    latest)."""
    vs = list_versions(catalog_dir)
    if not vs:
        raise ValueError(f"{catalog_dir!r} has no catalog log")
    if version is None:
        version = vs[-1]
    if version not in vs:
        raise ValueError(f"catalog version {version} not in {vs}")
    with open(_version_path(catalog_dir, version)) as fh:
        return json.load(fh)


def read_catalog_table(catalog_dir: str, name: str,
                       version: int | None = None,
                       columns: list[str] | None = None) -> rd.Dataset:
    """Stream table ``name`` at its version PINNED by the catalog
    snapshot — the only read path that is consistent across tables."""
    snap = catalog_snapshot(catalog_dir, version)
    ent = snap["tables"].get(name)
    if ent is None:
        raise ValueError(f"table {name!r} not in catalog "
                         f"(have {sorted(snap['tables'])})")
    return _tl.read_table(ent["dir"], version=ent["version"],
                          columns=columns)


def txn(catalog_dir: str,
        writes: list[tuple[str, rd.Dataset, str]],
        shard_rows: int = 250_000, max_retries: int = 20) -> int:
    """Atomically (to catalog readers) append each dataset to its
    table: ``writes`` is [(table_name, dataset, table_dir)]. Returns
    the committed catalog version. Table appends land first; the
    catalog commit pins the new versions — until it lands, no catalog
    snapshot references them, so a crash mid-txn is invisible (the
    newer table versions become ordinary vacuumable history)."""
    os.makedirs(_log_dir(catalog_dir), exist_ok=True)
    # per-table exclusive locks held across append AND commit: cumulative
    # table-log versions make a foreign append between the two phases
    # unrecoverable (pinning across it exposes that txn's rows without
    # its other tables), so same-table writers — including two FIRST
    # writers of a brand-new table — must serialize here. Sorted-name
    # acquisition prevents deadlock; flock dies with the holder, so a
    # crashed writer never wedges the catalog (its orphaned appends
    # fail-stop the next writer below instead).
    lock_fds = []
    try:
        for lp in _table_lock_paths(catalog_dir,
                                    [name for name, _, _ in writes]):
            fd = open(lp, "w")
            fcntl.flock(fd, fcntl.LOCK_EX)
            lock_fds.append(fd)

        pins: dict[str, dict] = {}
        for name, ds, tdir in writes:
            v = _tl.append(ds, tdir, shard_rows=shard_rows)
            pins[name] = {"dir": os.path.abspath(tdir), "version": v}

        # appends per table this txn (writes may hit a table repeatedly)
        n_appends: dict[str, int] = {}
        for name, _, _ in writes:
            n_appends[name] = n_appends.get(name, 0) + 1

        for attempt in range(max_retries):
            vs = list_versions(catalog_dir)
            head = catalog_snapshot(catalog_dir, vs[-1]) if vs else None
            nxt = (vs[-1] + 1) if vs else 0
            tables = dict(head["tables"]) if head else {}
            # rebase: racing txns touching DISJOINT tables both land.
            # For a table THIS txn wrote, the table lock guarantees no
            # LIVE writer interleaved, so only two abnormal cases can
            # show here: (a) orphaned versions from a CRASHED writer sit
            # between the head pin and our appends — committing would
            # expose its partial transaction, so fail-stop toward
            # adopt_table; (b) the head advanced PAST our appends (an
            # adopt_table race) — cumulative versions mean our rows are
            # already covered, so re-pin on the head and commit the
            # txn's other tables rather than retrying forever.
            stale = []
            for name, ent in pins.items():
                cur = tables.get(name)
                if cur is None:
                    # first catalog pin for this table: live first
                    # writers serialize on the lock; pre-catalog
                    # history adoption stays legal
                    tables[name] = ent
                elif ent["version"] > cur["version"] + n_appends[name]:
                    stale.append((name, cur["version"], ent["version"]))
                elif cur["version"] > ent["version"]:
                    tables[name] = cur   # head already covers our rows
                else:
                    tables[name] = ent
            if stale:
                import time
                time.sleep(0.02 * (attempt + 1))  # backoff, never logged
                continue
            payload = {"version": nxt, "tables": tables}
            path = _version_path(catalog_dir, nxt)
            # content-atomic claim: full payload lands in a tmp file
            # first, then os.link claims the version name (EEXIST = lost
            # the race) — a crash or concurrent reader can never observe
            # a truncated head commit, unlike O_EXCL-create-then-write
            tmp = f"{path}.tmp-{os.getpid()}-{threading.get_ident()}"
            with open(tmp, "w") as fh:
                json.dump(payload, fh, sort_keys=True)
                fh.flush()
                os.fsync(fh.fileno())
            try:
                os.link(tmp, path)
            except FileExistsError:
                continue  # lost the race — rebase on the new head
            finally:
                os.unlink(tmp)
            return nxt
        raise RuntimeError(
            "catalog txn could not commit after "
            f"{max_retries} attempts: "
            + ("another writer's table append interleaved with this "
               f"txn's and its catalog commit never landed (stale pins: "
               f"{stale}) — a crashed writer leaves this hole (live "
               "writers hold the table lock); repair with adopt_table "
               "to sanction its orphaned versions, or vacuum them and "
               "re-run its txn"
               if stale else "lost the catalog-version race every time"))
    finally:
        for fd in lock_fds:
            fd.close()                   # close releases the flock


def adopt_table(catalog_dir: str, name: str, table_dir: str) -> int:
    """Operator repair / adoption: commit a catalog version pinning
    ``table_dir``'s CURRENT head version for ``name``, bypassing the
    succession validation ``txn`` enforces. Two uses: adopting a
    pre-catalog table's history, and unwedging the fail-stop left by a
    crashed writer (its orphaned appends become visible as one
    operator-sanctioned batch — by construction without the crashed
    txn's other-table rows, which is exactly what the operator is
    signing off on)."""
    v = _tl.latest_version(table_dir)
    if v is None:
        raise ValueError(f"{table_dir!r} has no table log to adopt")
    os.makedirs(_log_dir(catalog_dir), exist_ok=True)
    ent = {"dir": os.path.abspath(table_dir), "version": v}
    while True:
        vs = list_versions(catalog_dir)
        head = catalog_snapshot(catalog_dir, vs[-1]) if vs else None
        nxt = (vs[-1] + 1) if vs else 0
        tables = dict(head["tables"]) if head else {}
        cur = tables.get(name)
        if cur is not None and cur["version"] >= v:
            return vs[-1]          # already at/past this version — no-op
        tables[name] = ent
        payload = {"version": nxt, "tables": tables}
        path = _version_path(catalog_dir, nxt)
        tmp = f"{path}.tmp-{os.getpid()}-{threading.get_ident()}"
        with open(tmp, "w") as fh:
            json.dump(payload, fh, sort_keys=True)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            continue
        finally:
            os.unlink(tmp)
        return nxt


def catalog_txn_snapshot(sf_dir: str) -> "pa.Table":
    """(cat_version, n_facts, sum_cents, audit_rows, audit_total):
    end-to-end proof of cross-table snapshot isolation — each txn
    appends a half of orders to the ``facts`` table AND its row-count
    record to the ``audit`` table as ONE catalog commit; reading BOTH
    tables through each catalog snapshot must satisfy the invariant
    ``audit_total == n_facts`` at every version (a reader can never
    see facts without their audit row or vice versa). Oracle: the two
    halves recomputed directly from orders."""
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc

    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby

    root = os.path.join(
        tempfile.gettempdir(),
        f"raydoc_catalog_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(root, ignore_errors=True)
    facts_dir = os.path.join(root, "facts")
    audit_dir = os.path.join(root, "audit")

    src = rd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_totalprice"])

    def half(parity: int):
        def f(t):
            if t.num_rows == 0:
                return t
            k = pc.cast(t["o_orderkey"], pa.int64())
            rem = pc.subtract(k, pc.multiply(
                pc.divide(k, pa.scalar(2, pa.int64())),
                pa.scalar(2, pa.int64())))
            return t.filter(pc.equal(rem, pa.scalar(parity, pa.int64())))
        return src.map_batches(f, batch_format="pyarrow")

    for i, parity in enumerate((0, 1)):
        h = half(parity).materialize()
        audit_row = rd.from_arrow(pa.table({
            "txn": pa.array([f"t{i}"], pa.string()),
            "n_rows": pa.array([h.count()], pa.int64())}))
        txn(root, [("facts", h, facts_dir),
                   ("audit", audit_row, audit_dir)],
            shard_rows=50_000)

    out = []
    for v in (0, 1):
        facts = read_catalog_table(root, "facts", version=v)

        def cents(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "o_totalprice" not in t.schema.names:
                return pa.table({"k": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            return pa.table({
                "k": pa.array([0] * t.num_rows, pa.int64()),
                "c": pc.cast(pc.round(pc.multiply(
                    t["o_totalprice"], 100.0)), pa.int64())})

        g = collect_table(partial_groupby(
            facts.map_batches(cents, batch_format="pyarrow"), ["k"],
            {"n_facts": ("c", "count"), "sum_cents": ("c", "sum")}))
        audit = collect_table(read_catalog_table(root, "audit",
                                                 version=v))
        out.append({
            "cat_version": v,
            "n_facts": int(g.column("n_facts")[0].as_py()),
            "sum_cents": int(g.column("sum_cents")[0].as_py()),
            "audit_rows": audit.num_rows,
            "audit_total": int(pc.sum(audit["n_rows"]).as_py())})
    return pa.table({
        "cat_version": pa.array([o["cat_version"] for o in out],
                                pa.int64()),
        "n_facts": pa.array([o["n_facts"] for o in out], pa.int64()),
        "sum_cents": pa.array([o["sum_cents"] for o in out],
                              pa.int64()),
        "audit_rows": pa.array([o["audit_rows"] for o in out],
                               pa.int64()),
        "audit_total": pa.array([o["audit_total"] for o in out],
                                pa.int64())})


def catalog_cdc_stream(sf_dir: str, n_shards: int = 8) -> "pa.Table":
    """Corpus-scale ACID exercise (round-5 bench ask): stream the WHOLE
    lineitem table through the catalog as a CDC-style sequence of
    ``n_shards`` multi-table transactions (one facts append + its audit
    row per shard, committed atomically), then read BOTH tables back
    through the final catalog snapshot and emit exact integer totals.

    One combiner pass computes per-shard (rows, cents) up front — the
    audit rows the txns must pin with their facts; each txn's facts
    append is a streaming column-pruned filtered read (no
    materialization). The oracle twin recomputes every counter from
    lineitem in SQL, so a torn commit, lost shard, or double-applied
    append breaks the hash. n_versions pins exactly one catalog commit
    per shard."""
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc

    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby

    root = os.path.join(
        tempfile.gettempdir(),
        f"raydoc_catalog_cdc_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(root, ignore_errors=True)
    facts_dir = os.path.join(root, "facts")
    audit_dir = os.path.join(root, "audit")

    cols = ["l_orderkey", "l_extendedprice"]
    src = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
            return pa.table({"shard": pa.array([], pa.int64()),
                             "cents": pa.array([], pa.int64())})
        k = pc.cast(t["l_orderkey"], pa.int64())
        shard = pc.subtract(k, pc.multiply(
            pc.divide(k, pa.scalar(n_shards, pa.int64())),
            pa.scalar(n_shards, pa.int64())))
        cents = pc.cast(pc.round(pc.multiply(
            t["l_extendedprice"], 100.0)), pa.int64())
        return pa.table({"shard": shard, "cents": cents})

    per_shard = collect_table(partial_groupby(
        src.map_batches(prep, batch_format="pyarrow"), ["shard"],
        {"n_rows": ("cents", "count"),
         "sum_cents": ("cents", "sum")})).sort_by("shard")
    shard_stats = {int(s): (int(n), int(c)) for s, n, c in zip(
        per_shard["shard"].to_pylist(), per_shard["n_rows"].to_pylist(),
        per_shard["sum_cents"].to_pylist())}

    for s in range(n_shards):
        def one_shard(t: pa.Table, s=s) -> pa.Table:
            if t.num_rows == 0 or "l_orderkey" not in t.schema.names:
                return t
            k = pc.cast(t["l_orderkey"], pa.int64())
            rem = pc.subtract(k, pc.multiply(
                pc.divide(k, pa.scalar(n_shards, pa.int64())),
                pa.scalar(n_shards, pa.int64())))
            return t.filter(pc.equal(rem, pa.scalar(s, pa.int64())))

        n_s, c_s = shard_stats.get(s, (0, 0))
        audit_row = rd.from_arrow(pa.table({
            "shard": pa.array([s], pa.int64()),
            "n_rows": pa.array([n_s], pa.int64()),
            "sum_cents": pa.array([c_s], pa.int64())}))
        txn(root, [
            ("facts",
             src.map_batches(one_shard, batch_format="pyarrow"),
             facts_dir),
            ("audit", audit_row, audit_dir)])

    n_versions = len(list_versions(root))
    facts = read_catalog_table(root, "facts")

    def cents_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "l_extendedprice" not in t.schema.names:
            return pa.table({"k": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        return pa.table({
            "k": pa.array([0] * t.num_rows, pa.int64()),
            "c": pc.cast(pc.round(pc.multiply(
                t["l_extendedprice"], 100.0)), pa.int64())})

    g = collect_table(partial_groupby(
        facts.map_batches(cents_only, batch_format="pyarrow"), ["k"],
        {"n_rows": ("c", "count"), "sum_cents": ("c", "sum")}))
    audit = collect_table(read_catalog_table(root, "audit"))
    return pa.table({
        "n_txns": pa.array([n_shards], pa.int64()),
        "n_versions": pa.array([n_versions], pa.int64()),
        "n_rows": pa.array([int(g["n_rows"][0].as_py())], pa.int64()),
        "sum_cents": pa.array([int(g["sum_cents"][0].as_py())],
                              pa.int64()),
        "audit_rows": pa.array([audit.num_rows], pa.int64()),
        "audit_total_rows": pa.array(
            [int(pc.sum(audit["n_rows"]).as_py() or 0)], pa.int64()),
        "audit_total_cents": pa.array(
            [int(pc.sum(audit["sum_cents"]).as_py() or 0)], pa.int64()),
    })
