"""Versioned table log: Delta-style ACID commits + time travel for a
directory of parquet shards.

The manifests in ``state/manifest.py`` make ONE writer resumable; this
adds what a multi-writer 100-TB pipeline needs on top of a dumb object
store — the public Delta/Iceberg recipe, dependency-free:

- a table is a directory of immutable content-addressed parquet shards
  plus ``_log/<version 8-digit>.json`` commit files;
- each commit lists add/remove actions; the LIVE file set at version V
  folds the log prefix [0..V];
- commits serialize via optimistic concurrency: a writer claims the
  next version with ``os.open(..., O_CREAT | O_EXCL)`` (atomic on
  POSIX); the loser re-reads the log and retries, so concurrent
  appends both land, in some order, and never corrupt state;
- shard files are written worker-side (rows never visit the driver),
  tmp+rename, named by content hash — a crashed writer leaves only
  unreferenced garbage that ``vacuum`` collects; readers are never
  affected because the log is the source of truth;
- time travel: ``read_table(dir, version=V)`` streams any historical
  snapshot (the SCD2 queries time-travel ROWS; this time-travels the
  TABLE).

No wall-clock enters the log (commit payloads are content + version
only), so reruns are byte-deterministic.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading

import pyarrow as pa

import ray.data as rd

from raydoc.functions._collect import collect_table

_LOG = "_log"


def _log_dir(table_dir: str) -> str:
    return os.path.join(table_dir, _LOG)


def _version_path(table_dir: str, version: int) -> str:
    return os.path.join(_log_dir(table_dir), f"{version:08d}.json")


def list_versions(table_dir: str) -> list[int]:
    d = _log_dir(table_dir)
    if not os.path.isdir(d):
        return []
    return sorted(int(f[:-5]) for f in os.listdir(d)
                  if f.endswith(".json") and f[:-5].isdigit())


def latest_version(table_dir: str) -> int | None:
    vs = list_versions(table_dir)
    return vs[-1] if vs else None


def snapshot(table_dir: str, version: int | None = None) -> dict:
    """Fold the commit log through ``version`` (default: latest) →
    {"version": V, "files": {name: add-action}} where each add-action
    carries n_rows/n_bytes and, if recorded, per-column zone-map
    stats."""
    vs = list_versions(table_dir)
    if not vs:
        raise ValueError(f"{table_dir!r} has no table log")
    if version is None:
        version = vs[-1]
    if version not in vs:
        raise ValueError(f"version {version} not in log (have {vs})")
    files: dict[str, dict] = {}
    for v in vs:
        if v > version:
            break
        with open(_version_path(table_dir, v)) as fh:
            commit = json.load(fh)
        for a in commit["actions"]:
            if "add" in a:
                files[a["add"]] = a
            elif "remove" in a:
                files.pop(a["remove"], None)
    return {"version": version, "files": files}


_BLOOM_K = 4                       # hash probes per value


def _bloom_bits(values, m_bits: int):
    """k=4 double-hashed bit positions for each value — deterministic
    across processes (pd.util.hash_array with the fixed default key).
    Returns an (n, k) int array of positions in [0, m_bits)."""
    import numpy as np
    import pandas as pd

    arr = np.asarray(values, dtype=object)
    h1 = pd.util.hash_array(arr, categorize=False)
    h2 = (h1 >> np.uint64(17)) | np.uint64(1)     # odd => full cycle
    ks = np.arange(_BLOOM_K, dtype=np.uint64)
    return ((h1[:, None] + ks[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def _bloom_build(values, m_bits: int) -> bytes:
    import numpy as np

    bits = np.zeros(m_bits, dtype=np.uint8)
    pos = _bloom_bits(values, m_bits)
    bits[pos.ravel()] = 1
    return np.packbits(bits).tobytes()


def _bloom_may_contain(blob: bytes, value) -> bool:
    import numpy as np

    bits = np.unpackbits(np.frombuffer(blob, dtype=np.uint8))
    pos = _bloom_bits([value], len(bits))[0]
    return bool(bits[pos].all())


def _bloom_sidecar(name: str, col: str) -> str:
    return f"{name}.bloom-{col}"


def _write_shards(ds: rd.Dataset, table_dir: str,
                  shard_rows: int = 250_000,
                  stats_cols: list[str] | None = None,
                  bloom_cols: list[str] | None = None) -> list[dict]:
    """Worker-side content-addressed parquet shard writes (the
    export_* sink discipline); returns [{add, n_rows, n_bytes[,
    stats]}]. ``stats_cols`` records per-shard min/max zone maps in
    the commit (the Iceberg manifest-stats idea) so ``read_table``
    can prune files without opening them. ``bloom_cols`` additionally
    writes a per-shard Bloom-filter SIDECAR per column (the
    Iceberg-puffin idea — ~20 bits/row, k=4, sized to the shard) for
    ``point_lookup`` equality pruning; sidecars stay OUT of the commit
    JSON (they'd bloat the log) and are content-addressed by their
    shard's name, so vacuum can collect them with the shard."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(table_dir, exist_ok=True)
    scols = list(stats_cols or [])
    bcols = list(bloom_cols or [])

    def write_block(t: pa.Table) -> pa.Table:
        names, rows, sizes, stats = [], [], [], []
        for off in range(0, max(t.num_rows, 1), shard_rows):
            sub = t.slice(off, shard_rows)
            if sub.num_rows == 0:
                continue
            sub = sub.combine_chunks()
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, sub.schema) as w:
                w.write_table(sub)
            digest = hashlib.sha256(
                sink.getvalue().to_pybytes()).hexdigest()[:20]
            name = f"part-{digest}.parquet"
            path = os.path.join(table_dir, name)
            if not os.path.exists(path):
                tmp = path + f".tmp-{os.getpid()}"
                pq.write_table(sub, tmp)
                os.replace(tmp, path)
            names.append(name)
            rows.append(sub.num_rows)
            sizes.append(os.path.getsize(path))
            for c in bcols:
                side = os.path.join(table_dir, _bloom_sidecar(name, c))
                if not os.path.exists(side):
                    m_bits = 1 << max(
                        10, (20 * sub.num_rows - 1).bit_length())
                    blob = _bloom_build(
                        sub.column(c).to_pylist(), m_bits)
                    tmp = side + f".tmp-{os.getpid()}"
                    with open(tmp, "wb") as fh:
                        fh.write(blob)
                    os.replace(tmp, side)
            st = {}
            for c in scols:
                mm = pc.min_max(sub.column(c)).as_py()
                lo, hi = mm["min"], mm["max"]
                if hasattr(lo, "isoformat"):    # timestamps → epoch us
                    lo = int(lo.timestamp() * 1_000_000)
                    hi = int(hi.timestamp() * 1_000_000)
                st[c] = [lo, hi]
            stats.append(json.dumps(st, sort_keys=True))
        return pa.table({"name": pa.array(names, pa.string()),
                         "n_rows": pa.array(rows, pa.int64()),
                         "n_bytes": pa.array(sizes, pa.int64()),
                         "stats": pa.array(stats, pa.string())})

    m = collect_table(ds.map_batches(write_block,
                                     batch_format="pyarrow"))
    seen: dict[str, dict] = {}
    for r in m.to_pylist():
        act = {"add": r["name"], "n_rows": r["n_rows"],
               "n_bytes": r["n_bytes"]}
        if scols:
            act["stats"] = json.loads(r["stats"])
        seen[r["name"]] = act
    return [seen[k] for k in sorted(seen)]


def _try_commit(table_dir: str, actions, operation: str,
                max_retries: int = 64) -> int:
    """Claim the next version atomically; on a race, re-read the log
    head and retry at the bumped version. ``actions`` is a list OR a
    callable(head_version) -> list, re-evaluated per attempt so
    conflict resolution (e.g. overwrite's remove set) sees the commit
    that beat it.

    Content-atomic: the full record lands in a tmp file first, then
    ``os.link`` claims the version name (EEXIST = lost the race) — a
    crash or concurrent reader can never observe a truncated commit,
    unlike O_EXCL-create-then-write (the commit file IS referenced
    state the moment its name exists)."""
    os.makedirs(_log_dir(table_dir), exist_ok=True)
    for _ in range(max_retries):
        head = latest_version(table_dir)
        version = 0 if head is None else head + 1
        acts = actions(head) if callable(actions) else actions
        path = _version_path(table_dir, version)
        tmp = f"{path}.tmp-{os.getpid()}-{threading.get_ident()}"
        with open(tmp, "w") as fh:
            json.dump({"version": version, "operation": operation,
                       "actions": acts}, fh, indent=1)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            os.link(tmp, path)
        except FileExistsError:
            continue  # lost the race — rebase on the new head
        finally:
            os.unlink(tmp)
        return version
    raise RuntimeError(f"commit contention: {max_retries} retries "
                       f"exhausted on {table_dir!r}")


def append(ds: rd.Dataset, table_dir: str, shard_rows: int = 250_000,
           stats_cols: list[str] | None = None,
           bloom_cols: list[str] | None = None) -> int:
    """Append ``ds`` as a new version; returns the committed version.
    Shards land before the commit, so a crash mid-append leaves the
    table unchanged (plus vacuumable garbage). ``stats_cols`` records
    per-shard zone maps for pruned reads; ``bloom_cols`` writes
    per-shard Bloom sidecars for ``point_lookup``."""
    actions = _write_shards(ds, table_dir, shard_rows, stats_cols,
                            bloom_cols)
    return _try_commit(table_dir, actions, "append")


def commit_info(table_dir: str, version: int) -> dict:
    """The raw commit record (version, operation, actions) — lineage
    inspection for ingestion ledgers and audits."""
    with open(_version_path(table_dir, version)) as fh:
        return json.load(fh)


def ingested_sources(table_dir: str) -> set[str]:
    """Source tags of every ``ingest:`` commit in the log — the
    exactly-once ledger for continuous ingestion (the commit IS the
    ledger entry, so there is no second write to crash between)."""
    out: set[str] = set()
    for v in list_versions(table_dir):
        with open(_version_path(table_dir, v)) as fh:
            op = json.load(fh).get("operation", "")
        if op.startswith("ingest:"):
            out.update(op[len("ingest:"):].split(";"))
    return out


class _AlreadyIngested(Exception):
    pass


def append_once(ds: rd.Dataset, table_dir: str, sources: list[str],
                shard_rows: int = 250_000,
                stats_cols: list[str] | None = None) -> int | None:
    """Exactly-once append keyed by ``sources`` (input-shard tags):
    commits with operation ``ingest:<s1;s2;...>``; returns None without
    committing if ANY tag already appears in the log — including one
    committed by a concurrent ingestor during our attempt (the actions
    callback re-checks against the rebased head on every conflict
    retry). An aborted attempt leaves only vacuumable orphan shards;
    the table itself is untouched."""
    if any(";" in s for s in sources):
        raise ValueError("source tags must not contain ';'")
    base = latest_version(table_dir)
    if set(sources) & ingested_sources(table_dir):
        return None
    adds = _write_shards(ds, table_dir, shard_rows, stats_cols)
    tags = set(sources)

    def actions(head):
        # only commits that landed AFTER our full pre-scan can race us —
        # rescan just (base, head], not the whole ledger, so a long-lived
        # table pays O(new commits) per attempt, not O(all versions)
        lo = 0 if base is None else base + 1
        hi = -1 if head is None else head
        for v in range(lo, hi + 1):
            op = commit_info(table_dir, v).get("operation", "")
            if (op.startswith("ingest:")
                    and tags & set(op[len("ingest:"):].split(";"))):
                raise _AlreadyIngested
        return adds

    try:
        return _try_commit(table_dir, actions,
                           "ingest:" + ";".join(sources))
    except _AlreadyIngested:
        return None


def overwrite(ds: rd.Dataset, table_dir: str, shard_rows: int = 250_000,
              stats_cols: list[str] | None = None) -> int:
    """Replace the table contents atomically: one commit removes every
    currently-live file and adds the new shards. Readers of any prior
    version still see their snapshot (files are immutable)."""
    adds = _write_shards(ds, table_dir, shard_rows, stats_cols)
    new_names = {a["add"] for a in adds}

    def actions(head):
        if head is None:
            return adds
        live = snapshot(table_dir, head)["files"]
        return adds + [{"remove": n} for n in sorted(live)
                       if n not in new_names]

    return _try_commit(table_dir, actions, "overwrite")


def read_table(table_dir: str, version: int | None = None,
               columns: list[str] | None = None,
               where: tuple | None = None,
               unify: bool = False) -> rd.Dataset:
    """Stream a snapshot (default: latest) as a Ray Dataset — the
    time-travel read. Column pruning pushes into the parquet reader;
    ``where=(col, lo, hi)`` (inclusive; timestamps as epoch-us ints)
    prunes whole shards via the commit-recorded zone maps BEFORE any
    file opens — the Iceberg manifest-stats read path. Shards without
    stats for ``col`` are conservatively kept, and the filter is only
    a pruning hint: rows outside the range in surviving shards still
    stream (exact filtering stays the caller's map stage).

    ``unify=True`` is the schema-evolution read: shards written under
    DIFFERENT schema versions (a column added by a later append) read
    under their union schema — per-shard footers group the live set by
    schema fingerprint (driver-side, footer-only: O(shards), the same
    budget as the zone-map scan), each group reads with its own
    pruned column list, and every batch widens map-side to the unified
    schema (missing columns become typed nulls — the
    sources/evolved.py discipline)."""
    snap = snapshot(table_dir, version)
    live = snap["files"]
    names = sorted(live)
    if where is not None:
        col, lo, hi = where
        kept = []
        for n in names:
            st = live[n].get("stats", {}).get(col)
            if st is None or not (st[1] < lo or st[0] > hi):
                kept.append(n)
        names = kept
    files = [os.path.join(table_dir, n) for n in names]
    if not files:
        raise ValueError(
            f"version {snap['version']} of {table_dir!r} is empty "
            f"(or fully pruned)")
    if not unify:
        return rd.read_parquet(files, columns=columns)

    import pyarrow.parquet as pq

    from raydoc.sources.evolved import widen_to_schema

    groups: dict[bytes, list[str]] = {}
    schemas: dict[bytes, pa.Schema] = {}
    for f in files:
        s = pq.read_schema(f)
        k = s.serialize().to_pybytes()
        groups.setdefault(k, []).append(f)
        schemas[k] = s
    target = pa.unify_schemas(list(schemas.values()))
    if columns is not None:
        target = pa.schema([target.field(c) for c in columns])
    want = [f.name for f in target]
    parts = []
    for k in sorted(groups):
        have = [c for c in want if c in schemas[k].names]
        # a shard with NONE of the requested columns still contributes
        # its row count — read its narrowest column to keep the rows
        cols = have or [schemas[k].names[0]]
        ds = rd.read_parquet(groups[k], columns=cols)
        parts.append(ds.map_batches(
            lambda t, _tg=target: widen_to_schema(t, _tg),
            batch_format="pyarrow"))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def delete_where(table_dir: str, col: str, values) -> int:
    """DELETE rows whose ``col`` is in ``values`` — the right-to-be-
    forgotten / compliance operation. Shards that can't contain a
    target (commit-recorded zone maps) are left UNTOUCHED (no rewrite,
    no commit entry); every possibly-affected shard is rewritten
    without the matching rows in ONE distributed pass (worker-side
    content-addressed writes — the append machinery), and a single
    commit swaps the rewritten set in. Prior versions still see the
    deleted rows (immutable snapshots — audit trail); ``vacuum``
    physically drops them once the retention window passes. Returns
    the committed version, or -1 if no shard could contain a target."""
    import pyarrow.compute as pc

    import bisect

    head = latest_version(table_dir)
    snap = snapshot(table_dir, head)
    vals = sorted(values)
    touched = []
    for name, meta in sorted(snap["files"].items()):
        st = meta.get("stats", {}).get(col)
        if st is None:
            touched.append(name)        # no zone map → conservatively in
            continue
        i = bisect.bisect_left(vals, st[0])
        if i < len(vals) and vals[i] <= st[1]:
            touched.append(name)
    if not touched:
        return -1
    ds = rd.read_parquet([os.path.join(table_dir, n) for n in touched])
    val_arr = pa.array(vals)

    def drop(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or col not in t.schema.names:
            return t
        return t.filter(pc.invert(pc.is_in(t[col], value_set=val_arr)))

    stats_cols = sorted({c for m in snap["files"].values()
                         for c in m.get("stats", {})})
    adds = _write_shards(ds.map_batches(drop, batch_format="pyarrow"),
                         table_dir, stats_cols=stats_cols or None)
    new_names = {a["add"] for a in adds}

    def actions(h):
        live = snapshot(table_dir, h)["files"] if h is not None else {}
        return adds + [{"remove": n} for n in sorted(touched)
                       if n in live and n not in new_names]

    return _try_commit(table_dir, actions, f"delete:{col}")


def merge_into(changes: rd.Dataset, table_dir: str, key: str,
               shard_rows: int = 250_000) -> int:
    """MERGE (upsert) ``changes`` into the table by ``key`` — the Delta
    ``MERGE INTO`` shape: a table row whose key appears in ``changes``
    is REPLACED by the change row, keys with no match INSERT. One
    distributed pass, ONE commit: shards whose commit-recorded zone
    maps cannot contain a changed key are untouched; every possibly-
    affected shard rewrites without the matched rows, and the change
    rows land as fresh shards in the same commit.

    Scale contract (the ``delete_where`` one): the DISTINCT change
    keys fold to the driver through a combiner — key scalars only,
    never change payloads; a merge whose key set cannot fit the driver
    should be expressed as a partitioned overwrite instead. ``changes``
    must be unique per key (last-writer-wins resolution is the
    caller's CDC step — see relational.q_orders_apply_changes) and
    must match the table schema."""
    import bisect

    import pyarrow.compute as pc

    from raydoc.functions.agg import partial_groupby

    keys_t = collect_table(partial_groupby(
        changes.select_columns([key]), [key], {"n": (key, "count")}))
    vals = sorted(keys_t.column(key).to_pylist())
    head = latest_version(table_dir)
    snap = snapshot(table_dir, head)
    touched = []
    for name, meta in sorted(snap["files"].items()):
        st = meta.get("stats", {}).get(key)
        if st is None:
            touched.append(name)
            continue
        i = bisect.bisect_left(vals, st[0])
        if i < len(vals) and vals[i] <= st[1]:
            touched.append(name)
    stats_cols = sorted({c for m in snap["files"].values()
                         for c in m.get("stats", {})})
    val_arr = pa.array(vals)

    def drop_matched(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key not in t.schema.names:
            return t
        return t.filter(pc.invert(pc.is_in(t[key], value_set=val_arr)))

    if touched:
        kept = rd.read_parquet(
            [os.path.join(table_dir, n) for n in touched]).map_batches(
            drop_matched, batch_format="pyarrow")
        merged = kept.union(changes)
    else:
        merged = changes
    adds = _write_shards(merged, table_dir, shard_rows,
                         stats_cols=stats_cols or None)
    new_names = {a["add"] for a in adds}

    def actions(h):
        live = snapshot(table_dir, h)["files"] if h is not None else {}
        return adds + [{"remove": n} for n in sorted(touched)
                       if n in live and n not in new_names]

    return _try_commit(table_dir, actions, f"merge:{key}")


def table_changes(table_dir: str, version: int) -> rd.Dataset:
    """Row-level change-data-feed of commit ``version`` (the Delta CDF
    analog): what a downstream consumer must apply to move from
    snapshot ``version-1`` to snapshot ``version``. Returns a Dataset
    of the table columns plus ``change`` ('insert' | 'delete') and
    ``n`` (multiplicity) — rows that merely moved between shards
    (compaction, the kept side of a delete rewrite) cancel out.

    Shape: the files ADDED by the commit stream with tag +1, the files
    REMOVED stream with tag −1, and one combiner groupby over the full
    row folds the multiset difference — the ``except_all`` discipline
    over whole rows; nothing but the surviving net-change rows leaves
    the workers. Add-actions for files already live at ``version-1``
    (a rewrite that reproduced identical content) are ignored."""
    ci = commit_info(table_dir, version)
    prev_live = (set(snapshot(table_dir, version - 1)["files"])
                 if version > 0 else set())
    adds = [a["add"] for a in ci["actions"]
            if "add" in a and a["add"] not in prev_live]
    removes = [a["remove"] for a in ci["actions"]
               if "remove" in a and a["remove"] in prev_live]

    from raydoc.functions.agg import partial_groupby

    def tagged(names: list[str], tag: int) -> rd.Dataset | None:
        if not names:
            return None
        ds = rd.read_parquet([os.path.join(table_dir, n)
                              for n in names])
        return ds.map_batches(
            lambda t, _g=tag: t.append_column(
                "tag", pa.array([_g] * t.num_rows, pa.int64())),
            batch_format="pyarrow")

    plus, minus = tagged(adds, 1), tagged(removes, -1)
    if plus is None and minus is None:
        raise ValueError(f"commit {version} changed no files")
    both = plus.union(minus) if plus is not None and minus is not None \
        else (plus if plus is not None else minus)
    data_cols = [c for c in both.schema().names if c != "tag"]
    folded = partial_groupby(both, data_cols, {"delta": ("tag", "sum")})

    def finalize(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        if t.num_rows == 0 or "delta" not in t.schema.names:
            return t
        t = t.filter(pc.not_equal(t["delta"], 0))
        change = pc.if_else(pc.greater(t["delta"], 0),
                            pa.scalar("insert"), pa.scalar("delete"))
        out = t.drop_columns(["delta"])
        return out.append_column("change", change).append_column(
            "n", pc.abs(t["delta"]))

    return folded.map_batches(finalize, batch_format="pyarrow")


def optimize(table_dir: str, target_rows: int = 250_000) -> int:
    """Bin-pack the live shards into ~``target_rows`` files (the Delta
    OPTIMIZE small-file compaction): streams every live shard through
    the content-addressed writer at the target size and commits ONE
    swap. Readers of prior versions are untouched; vacuum reclaims the
    small files after retention. Returns the committed version, or -1
    when the table is already a single shard."""
    head = latest_version(table_dir)
    snap = snapshot(table_dir, head)
    names = sorted(snap["files"])
    if len(names) <= 1:
        return -1
    stats_cols = sorted({c for m in snap["files"].values()
                         for c in m.get("stats", {})})
    ds = rd.read_parquet([os.path.join(table_dir, n) for n in names]) \
        .repartition(max(1, sum(m.get("n_rows", 0) for m in
                                snap["files"].values()) // target_rows))
    adds = _write_shards(ds, table_dir, shard_rows=target_rows,
                         stats_cols=stats_cols or None)
    new_names = {a["add"] for a in adds}

    def actions(h):
        live = snapshot(table_dir, h)["files"] if h is not None else {}
        return adds + [{"remove": n} for n in sorted(live)
                       if n not in new_names]

    return _try_commit(table_dir, actions, "optimize")


def vacuum(table_dir: str, keep_versions: int = 2) -> list[str]:
    """Delete shard files referenced by NO version in the retained
    window (the last ``keep_versions`` versions) — crashed-writer
    garbage and files removed long ago. Returns the deleted names."""
    vs = list_versions(table_dir)
    if not vs:
        return []
    keep = vs[-keep_versions:]
    referenced: set[str] = set()
    for v in keep:
        referenced |= set(snapshot(table_dir, v)["files"])
    deleted = []
    for name in sorted(os.listdir(table_dir)):
        if ".parquet.bloom-" in name:
            base = name.split(".bloom-", 1)[0]
            # a tmp sidecar is NEVER the live sidecar after os.replace —
            # collect crashed-writer tmp files even when their base
            # shard is still referenced
            if base not in referenced or ".tmp-" in name:
                try:
                    os.remove(os.path.join(table_dir, name))
                    deleted.append(name)
                except OSError:
                    pass
            continue
        if not (name.endswith(".parquet") or ".parquet.tmp-" in name):
            continue
        if name not in referenced:
            try:
                os.remove(os.path.join(table_dir, name))
                deleted.append(name)
            except OSError:
                pass
    return deleted


def orders_time_travel(sf_dir: str) -> pa.Table:
    """(version, n_orders, sum_cents): end-to-end proof of the table
    log — orders before 1998-01-01 commit as version 0, the remainder
    appends as version 1, then BOTH snapshots stream back through
    ``read_table`` (version 0 must still see only the old rows after
    the append) and aggregate in integer cents. Oracle = the same two
    aggregates straight off the parquet view, so a snapshot that
    leaks, loses, or double-counts rows flips the hash. The table
    rebuilds from scratch in /tmp each run (it is the demo subject,
    not a cache)."""
    import shutil
    import tempfile

    import pyarrow.compute as pc

    from raydoc.functions.agg import partial_groupby

    cutoff = pa.scalar(883_612_800_000_000, pa.timestamp("us"))  # 1998-01-01
    tdir = os.path.join(
        tempfile.gettempdir(),
        f"raydoc_tlog_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(tdir, ignore_errors=True)

    src = rd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_orderdate",
                                   "o_totalprice"])
    old = src.map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], cutoff)),
        batch_format="pyarrow")
    new = src.map_batches(
        lambda t: t.filter(pc.greater_equal(t["o_orderdate"], cutoff)),
        batch_format="pyarrow")
    v0 = append(old, tdir, shard_rows=50_000)
    v1 = append(new, tdir, shard_rows=50_000)
    assert (v0, v1) == (0, 1), (v0, v1)

    outs = []
    for v in (0, 1):
        ds = read_table(tdir, version=v,
                        columns=["o_orderkey", "o_totalprice"])

        def cents(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "o_totalprice" not in t.schema.names:
                return pa.table({"k": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            return pa.table({
                "k": pa.array([0] * t.num_rows, pa.int64()),
                "c": pa.compute.cast(pa.compute.round(
                    pa.compute.multiply(t["o_totalprice"], 100.0)),
                    pa.int64())})

        g = collect_table(partial_groupby(
            ds.map_batches(cents, batch_format="pyarrow"), ["k"],
            {"n_orders": ("c", "count"), "sum_cents": ("c", "sum")}))
        outs.append({"version": v,
                     "n_orders": int(g.column("n_orders")[0].as_py()),
                     "sum_cents": int(g.column("sum_cents")[0].as_py())})
    return pa.table({
        "version": pa.array([o["version"] for o in outs], pa.int64()),
        "n_orders": pa.array([o["n_orders"] for o in outs], pa.int64()),
        "sum_cents": pa.array([o["sum_cents"] for o in outs],
                              pa.int64())})


def orders_gdpr_delete(sf_dir: str, mod: int = 97) -> pa.Table:
    """(version, n_orders, sum_cents): end-to-end proof of
    ``delete_where`` — every order commits as version 0 (custkey zone
    maps recorded), then the right-to-be-forgotten request deletes all
    orders of customers with ``o_custkey % mod == 0`` as version 1;
    BOTH snapshots stream back and aggregate in integer cents (the
    audit-trail read: version 0 must still show the erased customers
    until vacuum). Oracle = the same two aggregates with/without the
    deleted custkeys straight off the parquet view. Scratch table in
    /tmp per run."""
    import shutil
    import tempfile

    import pyarrow.compute as pc

    from raydoc.functions._collect import collect_table
    from raydoc.functions.agg import partial_groupby

    tdir = os.path.join(
        tempfile.gettempdir(),
        f"raydoc_gdpr_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(tdir, ignore_errors=True)

    src = rd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey",
                                   "o_totalprice"])
    v0 = append(src, tdir, shard_rows=20_000, stats_cols=["o_custkey"])
    assert v0 == 0, v0
    hi = collect_table(src.select_columns(["o_custkey"])).column(
        "o_custkey")
    max_ck = pc.max(hi).as_py() or 0
    targets = list(range(0, int(max_ck) + 1, mod))
    v1 = delete_where(tdir, "o_custkey", targets)
    assert v1 == 1, v1

    outs = []
    for v in (0, 1):
        ds = read_table(tdir, version=v,
                        columns=["o_orderkey", "o_totalprice"])

        def cents(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "o_totalprice" not in t.schema.names:
                return pa.table({"one": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64())})
            return pa.table({
                "one": pa.array([1] * t.num_rows, pa.int64()),
                "n": pa.array([1] * t.num_rows, pa.int64()),
                "c": pc.cast(pc.round(pc.multiply(t["o_totalprice"],
                                                  100.0)), pa.int64())})

        g = collect_table(partial_groupby(
            ds.map_batches(cents, batch_format="pyarrow"), ["one"],
            {"n_orders": ("n", "sum"), "sum_cents": ("c", "sum")}))
        outs.append((v, int(g.column("n_orders")[0].as_py()),
                     int(g.column("sum_cents")[0].as_py())))
    shutil.rmtree(tdir, ignore_errors=True)
    return pa.table({
        "version": pa.array([o[0] for o in outs], pa.int64()),
        "n_orders": pa.array([o[1] for o in outs], pa.int64()),
        "sum_cents": pa.array([o[2] for o in outs], pa.int64())})


def _agg_snapshot(ds: rd.Dataset) -> tuple[int, int, int]:
    """(n_orders, sum_cents, key_sum) of an orders snapshot — integer
    cents so the oracle hash is bit-exact."""
    import pyarrow.compute as pc

    from raydoc.functions.agg import partial_groupby

    def m(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_totalprice" not in t.schema.names:
            return pa.table({"k": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64())})
        return pa.table({
            "k": pa.array([0] * t.num_rows, pa.int64()),
            "n": pa.array([1] * t.num_rows, pa.int64()),
            "c": pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                         pa.int64()),
            "s": pc.cast(t["o_orderkey"], pa.int64())})

    g = collect_table(partial_groupby(
        ds.map_batches(m, batch_format="pyarrow"), ["k"],
        {"n_orders": ("n", "sum"), "sum_cents": ("c", "sum"),
         "key_sum": ("s", "sum")}))
    if g.num_rows == 0:
        return 0, 0, 0
    return (int(g.column("n_orders")[0].as_py()),
            int(g.column("sum_cents")[0].as_py()),
            int(g.column("key_sum")[0].as_py()))


def _mod_eq(col: pa.ChunkedArray, m: int, r: int):
    """Arrow boolean mask col % m == r (non-negative ints)."""
    import pyarrow.compute as pc

    ids = pc.cast(col, pa.int64())
    rem = pc.subtract(ids, pc.multiply(
        pc.divide(ids, pa.scalar(m, pa.int64())),
        pa.scalar(m, pa.int64())))
    return pc.equal(rem, pa.scalar(r, pa.int64()))


def orders_merge_upsert(sf_dir: str) -> pa.Table:
    """(version, n_orders, sum_cents, key_sum): end-to-end proof of
    ``merge_into`` — every order commits as version 0 (orderkey zone
    maps), then ONE merge applies a CDC batch that UPDATES every order
    with ``o_orderkey % 37 == 0`` (price +1.00) and INSERTS a synthetic
    order with key ``-o_orderkey-1`` for every ``o_orderkey % 53 == 0``
    (negative keys prove the no-touch insert path: no live shard's
    zone map admits them). Both snapshots aggregate in integer cents +
    an orderkey checksum, so a merge that drops, duplicates, or
    misses a row flips the hash. Scratch table in /tmp per run."""
    import shutil
    import tempfile

    import pyarrow.compute as pc

    tdir = os.path.join(
        tempfile.gettempdir(),
        f"raydoc_merge_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(tdir, ignore_errors=True)

    src = rd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey",
                                   "o_totalprice"])
    v0 = append(src, tdir, shard_rows=20_000,
                stats_cols=["o_orderkey"])
    assert v0 == 0, v0

    def upd(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        t = t.filter(_mod_eq(t["o_orderkey"], 37, 0))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "o_custkey": t["o_custkey"],
            "o_totalprice": pc.add(t["o_totalprice"], 1.0)})

    def ins(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        t = t.filter(_mod_eq(t["o_orderkey"], 53, 0))
        return pa.table({
            "o_orderkey": pc.subtract(
                pc.negate(pc.cast(t["o_orderkey"], pa.int64())),
                pa.scalar(1, pa.int64())),
            "o_custkey": t["o_custkey"],
            "o_totalprice": t["o_totalprice"]})

    changes = src.map_batches(upd, batch_format="pyarrow").union(
        src.map_batches(ins, batch_format="pyarrow"))
    v1 = merge_into(changes, tdir, key="o_orderkey",
                    shard_rows=20_000)
    assert v1 == 1, v1

    rows = []
    for v in (0, 1):
        n, c, s = _agg_snapshot(read_table(tdir, version=v))
        rows.append((v, n, c, s))
    shutil.rmtree(tdir, ignore_errors=True)
    return pa.table({
        "version": pa.array([r[0] for r in rows], pa.int64()),
        "n_orders": pa.array([r[1] for r in rows], pa.int64()),
        "sum_cents": pa.array([r[2] for r in rows], pa.int64()),
        "key_sum": pa.array([r[3] for r in rows], pa.int64())})


def orders_table_changes(sf_dir: str, mod: int = 97) -> pa.Table:
    """(version, change, n_rows, sum_cents, key_sum): end-to-end proof
    of the row-level change-data-feed — orders split at 1998-01-01
    commit as versions 0 and 1, a GDPR delete of every customer with
    ``o_custkey % mod == 0`` commits as version 2, then
    ``table_changes`` reconstructs each commit's net row delta: pure
    inserts for the appends, pure deletes for the erasure (rows the
    delete-rewrite merely MOVED between shards must cancel). The
    oracle recomputes all three change sets straight off the parquet
    view. Scratch table in /tmp per run."""
    import shutil
    import tempfile

    import pyarrow.compute as pc

    from raydoc.functions.agg import partial_groupby

    cutoff = pa.scalar(883_612_800_000_000, pa.timestamp("us"))
    tdir = os.path.join(
        tempfile.gettempdir(),
        f"raydoc_cdf_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(tdir, ignore_errors=True)

    src = rd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey",
                                   "o_orderdate", "o_totalprice"])

    def split(t: pa.Table, old: bool) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "o_custkey": pa.array([], pa.int64()),
                             "o_totalprice": pa.array([], pa.float64())})
        mask = (pc.less(t["o_orderdate"], cutoff) if old
                else pc.greater_equal(t["o_orderdate"], cutoff))
        t = t.filter(mask)
        return t.select(["o_orderkey", "o_custkey", "o_totalprice"])

    v0 = append(src.map_batches(lambda t: split(t, True),
                                batch_format="pyarrow"),
                tdir, shard_rows=20_000, stats_cols=["o_custkey"])
    v1 = append(src.map_batches(lambda t: split(t, False),
                                batch_format="pyarrow"),
                tdir, shard_rows=20_000, stats_cols=["o_custkey"])
    assert (v0, v1) == (0, 1), (v0, v1)
    max_ck = int(src.max("o_custkey") or 0)
    v2 = delete_where(tdir, "o_custkey",
                      list(range(0, max_ck + 1, mod)))

    rows = []
    for v in (0, 1, 2):
        if v > (v2 if v2 >= 0 else 1):
            rows.append((v, "delete", 0, 0, 0))
            continue
        cdc = table_changes(tdir, v)

        def m(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "change" not in t.schema.names:
                return pa.table({"change": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64()),
                                 "c": pa.array([], pa.int64()),
                                 "s": pa.array([], pa.int64())})
            n = pc.cast(t["n"], pa.int64())
            cents = pc.cast(pc.round(pc.multiply(
                t["o_totalprice"], 100.0)), pa.int64())
            return pa.table({
                "change": t["change"], "n": n,
                "c": pc.multiply(cents, n),
                "s": pc.multiply(pc.cast(t["o_orderkey"], pa.int64()),
                                 n)})

        g = collect_table(partial_groupby(
            cdc.map_batches(m, batch_format="pyarrow"), ["change"],
            {"n_rows": ("n", "sum"), "sum_cents": ("c", "sum"),
             "key_sum": ("s", "sum")}))
        if g.num_rows == 0:
            rows.append((v, "delete" if v == 2 else "insert", 0, 0, 0))
            continue
        for r in g.sort_by("change").to_pylist():
            rows.append((v, r["change"], int(r["n_rows"]),
                         int(r["sum_cents"]), int(r["key_sum"])))
    shutil.rmtree(tdir, ignore_errors=True)
    return pa.table({
        "version": pa.array([r[0] for r in rows], pa.int64()),
        "change": pa.array([r[1] for r in rows], pa.string()),
        "n_rows": pa.array([r[2] for r in rows], pa.int64()),
        "sum_cents": pa.array([r[3] for r in rows], pa.int64()),
        "key_sum": pa.array([r[4] for r in rows], pa.int64())})


def orders_schema_evolution(sf_dir: str) -> pa.Table:
    """(o_orderpriority, n_orders, sum_cents): end-to-end proof of the
    unified-schema read — even orderkeys commit as version 0 WITHOUT
    the priority column, odd orderkeys append as version 1 WITH it,
    and ``read_table(unify=True)`` streams the union schema (nulls for
    the early shards) through one grouped aggregate. The oracle
    reproduces the null-fill with a CASE on orderkey parity."""
    import shutil
    import tempfile

    import pyarrow.compute as pc

    from raydoc.functions.agg import partial_groupby

    tdir = os.path.join(
        tempfile.gettempdir(),
        f"raydoc_evolve_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(tdir, ignore_errors=True)

    src = rd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_totalprice",
                                   "o_orderpriority"])

    def old_half(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"o_orderkey": pa.array([], pa.int64()),
                             "o_totalprice": pa.array([], pa.float64())})
        t = t.filter(_mod_eq(t["o_orderkey"], 2, 0))
        return t.select(["o_orderkey", "o_totalprice"])

    def new_half(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "o_orderkey": pa.array([], pa.int64()),
                "o_totalprice": pa.array([], pa.float64()),
                "o_orderpriority": pa.array([], pa.string())})
        return t.filter(_mod_eq(t["o_orderkey"], 2, 1))

    v0 = append(src.map_batches(old_half, batch_format="pyarrow"),
                tdir, shard_rows=20_000)
    v1 = append(src.map_batches(new_half, batch_format="pyarrow"),
                tdir, shard_rows=20_000)
    assert (v0, v1) == (0, 1), (v0, v1)

    ds = read_table(tdir, unify=True)

    def m(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "o_totalprice" not in t.schema.names:
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        pr = t["o_orderpriority"] if "o_orderpriority" in t.schema.names \
            else pa.nulls(t.num_rows, pa.string())
        return pa.table({
            "o_orderpriority": pc.fill_null(pr, "<none>"),
            "n": pa.array([1] * t.num_rows, pa.int64()),
            "c": pc.cast(pc.round(pc.multiply(t["o_totalprice"], 100.0)),
                         pa.int64())})

    g = collect_table(partial_groupby(
        ds.map_batches(m, batch_format="pyarrow"), ["o_orderpriority"],
        {"n_orders": ("n", "sum"), "sum_cents": ("c", "sum")}))
    shutil.rmtree(tdir, ignore_errors=True)
    if g.num_rows == 0:
        return pa.table({"o_orderpriority": pa.array([], pa.string()),
                         "n_orders": pa.array([], pa.int64()),
                         "sum_cents": pa.array([], pa.int64())})
    return g.select(["o_orderpriority", "n_orders",
                     "sum_cents"]).sort_by("o_orderpriority")


def point_lookup(table_dir: str, col: str, value,
                 version: int | None = None
                 ) -> tuple[rd.Dataset, dict]:
    """Equality point lookup through the per-shard Bloom sidecars:
    shards whose filter says DEFINITELY-ABSENT never open; survivors
    stream with an exact map-side equality filter (Bloom false
    positives only cost a scan, never a wrong row). Returns
    ``(dataset, {"shards_total": T, "shards_scanned": S})`` — S/T is
    the pruning ratio a point query on a 100-TB table lives or dies
    by. Shards written without a sidecar for ``col`` are
    conservatively scanned."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if value is None:
        raise ValueError("point_lookup value must be non-null")
    snap = snapshot(table_dir, version)
    names = sorted(snap["files"])
    kept = []
    for n in names:
        side = os.path.join(table_dir, _bloom_sidecar(n, col))
        if os.path.exists(side):
            with open(side, "rb") as fh:
                blob = fh.read()
            if not _bloom_may_contain(blob, value):
                continue
        kept.append(n)
    stats = {"shards_total": len(names), "shards_scanned": len(kept)}
    if not names:
        # a valid EMPTY snapshot (empty-dataset append or delete-all):
        # no shard carries a schema, so the result is an empty
        # single-column table of the probe column's value type
        schema = pa.schema([(col, pa.scalar(value).type)])
        return rd.from_arrow(schema.empty_table()), stats
    if not kept:
        schema = pq.read_schema(os.path.join(table_dir, names[0]))
        return rd.from_arrow(schema.empty_table()), stats

    def exact(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or col not in t.schema.names:
            return t
        return t.filter(pc.equal(t[col], value))

    ds = rd.read_parquet([os.path.join(table_dir, n) for n in kept])
    return ds.map_batches(exact, batch_format="pyarrow"), stats


def orders_point_lookup(sf_dir: str, n_probes: int = 3) -> pa.Table:
    """(o_orderkey, o_custkey, cents): Bloom-indexed point lookups —
    the orders table commits once with ``bloom_cols=["o_custkey"]``
    (20 bits/row k=4 sidecars), then the ``n_probes`` smallest
    custkeys ending in 7 probe through ``point_lookup``. The test
    suite pins that probes scan a strict subset of shards; the oracle
    is a plain WHERE IN. Exactness never depends on the filter —
    false positives fall to the map-side equality."""
    import shutil
    import tempfile

    import pyarrow.compute as pc

    tdir = os.path.join(
        tempfile.gettempdir(),
        f"raydoc_bloomtbl_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(tdir, ignore_errors=True)
    src = rd.read_parquet(f"{sf_dir}/orders.parquet",
                          columns=["o_orderkey", "o_custkey",
                                   "o_totalprice"])
    append(src, tdir, shard_rows=5_000, bloom_cols=["o_custkey"])

    keys = rd.read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey"])

    def ending7(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64())})
        ks = pc.cast(t["o_custkey"], pa.int64())
        return pa.table({"k": ks.filter(pc.equal(
            pc.subtract(ks, pc.multiply(pc.divide(ks, 10), 10)), 7))})

    kt = collect_table(keys.map_batches(ending7,
                                        batch_format="pyarrow"))
    probes = sorted(set(kt.column("k").to_pylist()))[:n_probes]

    parts = []
    for k in probes:
        ds, _ = point_lookup(tdir, "o_custkey", int(k))
        parts.append(collect_table(ds))
    if not parts:
        return pa.table({"o_orderkey": pa.array([], pa.int64()),
                         "o_custkey": pa.array([], pa.int64()),
                         "cents": pa.array([], pa.int64())})
    t = pa.concat_tables(parts)
    return pa.table({
        "o_orderkey": pa.compute.cast(t["o_orderkey"], pa.int64()),
        "o_custkey": pa.compute.cast(t["o_custkey"], pa.int64()),
        "cents": pa.compute.cast(pa.compute.round(
            pa.compute.multiply(t["o_totalprice"], 100.0)),
            pa.int64())}).sort_by([("o_orderkey", "ascending")])
