"""Local replica of the driver's correctness gate: run each queries()
entry at a given sf and compare with oracle_sql() via DuckDB — row count,
column names, and an order-insensitive value hash over name-sorted columns.

Usage: python tools/check_correctness.py [sf_dir] [query ...]

A full run (no explicit query list, or a long one) is SHARDED into
fresh-process workers, for the same reason as bench.py: Ray 2.49.2 has a
nondeterministic core race (``reference_count.cc:581``) that can abort a
session creating/destroying hundreds of Datasets. Each worker emits one
``##R {json}`` line per query as it completes; a crashed worker costs only
its unfinished queries, which are re-queued (chunk halved, ≤3 attempts).
``--one-process`` restores the single-session behavior; an explicit list
of ≤20 queries also runs in-process (the iterate-on-one-operator path).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

CHUNK_SIZE = 55


def to_pandas(result) -> pd.DataFrame:
    import ray.data as rd
    if isinstance(result, rd.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def value_hash(df: pd.DataFrame) -> str:
    import hashlib
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False))
    h = hashlib.md5()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def _init_ray() -> None:
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def run_gate(sf_dir: str, names: list[str], emit: bool = False) -> list[str]:
    """Run the named queries against their oracles in the CURRENT Ray
    session; print one human line (and with ``emit`` one ``##R`` line) per
    query as it completes. Returns the list of failing query names."""
    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = []

    def record(name: str, ok: bool, line: str) -> None:
        if not ok:
            failures.append(name)
        print(line, flush=True)
        if emit:
            print("##R " + json.dumps({"name": name, "ok": ok, "line": line}),
                  flush=True)

    for name in names:
        fn = qs.get(name)
        if fn is None:
            record(name, False, f"FAIL  {name:22s} not in queries()")
            continue
        t0 = time.perf_counter()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            import traceback
            traceback.print_exc()
            record(name, False, f"FAIL  {name:22s} query raised: {e}")
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            record(name, True,
                   f"rows  {name:22s} {len(mine):7d} rows {dt:6.1f}s (no oracle)")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            record(name, False, f"FAIL  {name:22s} oracle raised: {e}")
            continue
        ok_rows = len(mine) == len(exp)
        ok_cols = sorted(mine.columns) == sorted(exp.columns)
        ok_hash = ok_rows and ok_cols and value_hash(mine) == value_hash(exp)
        ok = ok_rows and ok_cols and ok_hash
        status = "OK  " if ok else "FAIL"
        record(name, ok,
               f"{status}  {name:22s} rows {len(mine)}/{len(exp)} "
               f"cols={'=' if ok_cols else sorted(mine.columns)} "
               f"hash={'=' if ok_hash else '!'} {dt:6.1f}s")
        if not ok and ok_cols and ok_rows:
            m = mine[sorted(mine.columns)].sort_values(sorted(mine.columns)).head(3)
            e2 = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).head(3)
            print("  mine:", m.to_dict("records"))
            print("  orac:", e2.to_dict("records"))
    return failures


def sharded_gate(sf_dir: str, names: list[str]) -> list[str]:
    """Fan the gate out to fresh-process workers; merge ##R lines and
    re-queue queries lost to a worker crash (halving, ≤3 attempts)."""
    import subprocess

    me = os.path.abspath(__file__)
    results: dict[str, bool] = {}
    pending = [names[i:i + CHUNK_SIZE]
               for i in range(0, len(names), CHUNK_SIZE)]
    attempts: dict[str, int] = {}
    while pending:
        chunk = [n for n in pending.pop(0) if n not in results]
        if not chunk:
            continue
        cmd = [sys.executable, me, "--run-chunk", sf_dir] + chunk
        try:
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=2400)
            stdout, rc, stderr = proc.stdout, proc.returncode, proc.stderr
        except subprocess.TimeoutExpired as exc:
            stdout = (exc.stdout or b"").decode(errors="replace") \
                if isinstance(exc.stdout, bytes) else (exc.stdout or "")
            rc, stderr = -9, "gate worker timed out"
        for line in stdout.splitlines():
            if line.startswith("##R "):
                try:
                    rec = json.loads(line[4:])
                except json.JSONDecodeError:
                    continue
                results[rec["name"]] = rec["ok"]
                print(rec["line"], flush=True)
        if rc != 0:
            lost = [n for n in chunk if n not in results]
            print(f"# gate worker rc={rc}; {len(lost)} queries lost, "
                  f"requeueing\n{stderr[-2000:]}", file=sys.stderr)
            retry = []
            for n in lost:
                attempts[n] = attempts.get(n, 0) + 1
                if attempts[n] >= 3:
                    results[n] = False
                    print(f"FAIL  {n:22s} worker crashed 3x", flush=True)
                else:
                    retry.append(n)
            if len(retry) > 1:
                mid = len(retry) // 2
                pending[:0] = [retry[:mid], retry[mid:]]
            elif retry:
                pending.insert(0, retry)
    return [n for n in names if not results.get(n, False)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--one-process", action="store_true")
    ap.add_argument("--run-chunk", action="store_true",
                    help="internal: gate-chunk worker")
    args = ap.parse_args()

    if args.run_chunk:
        _init_ray()
        run_gate(args.sf_dir, args.queries, emit=True)
        return  # parent decides pass/fail from ##R lines

    if not args.queries or args.one_process or len(args.queries) <= 20:
        # resolve the full list in a throwaway import only when needed
        names = args.queries
        if not names:
            import __ray_entry__ as entrymod
            names = list(entrymod.queries())
        if args.one_process or len(names) <= 20:
            _init_ray()
            failures = run_gate(args.sf_dir, names)
            import ray
            ray.shutdown()
        else:
            failures = sharded_gate(args.sf_dir, names)
    else:
        failures = sharded_gate(args.sf_dir, args.queries)

    print("FAILURES:", failures or "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
