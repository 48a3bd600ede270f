"""Local replica of the driver's correctness gate: run each queries()
entry at a given sf and compare with oracle_sql() via DuckDB — row count,
column names, and an order-insensitive value hash over name-sorted columns.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            import traceback
            traceback.print_exc()
            failures.append(name)
            print(f"FAIL  {name:22s} query raised: {e}")
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"rows  {name:22s} {len(mine):7d} rows {dt:6.1f}s (no oracle)")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name:22s} oracle raised: {e}")
            continue
        ok_rows = len(mine) == len(exp)
        ok_cols = sorted(mine.columns) == sorted(exp.columns)
        ok_hash = ok_rows and ok_cols and value_hash(mine) == value_hash(exp)
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(f"{status}  {name:22s} rows {len(mine)}/{len(exp)} "
              f"cols={'=' if ok_cols else sorted(mine.columns)} "
              f"hash={'=' if ok_hash else '!'} {dt:6.1f}s")
        if status == "FAIL" and ok_cols and ok_rows:
            m = mine[sorted(mine.columns)].sort_values(sorted(mine.columns)).head(3)
            e2 = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).head(3)
            print("  mine:", m.to_dict("records"))
            print("  orac:", e2.to_dict("records"))
    ray.shutdown()
    print("FAILURES:", failures or "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
