"""Local stand-in for the driver's correctness check.

Runs every ``__ray_entry__.queries()`` entry at sf0.01 (override with argv)
and compares against ``oracle_sql()`` via DuckDB: row count, column names,
and order-insensitive value equality (rows sorted by all columns; floats
compared to 1e-9 after the queries' own rounding). Queries without oracle
SQL get the rows-only check. Prints one line per query + a summary.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj.reset_index(drop=True)
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas().reset_index(drop=True)
    raise TypeError(type(obj))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def frames_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} != {len(b)}"
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            if not np.allclose(a[c], b[c], atol=1e-9, equal_nan=True):
                bad = int((~np.isclose(a[c], b[c], atol=1e-9, equal_nan=True)).sum())
                return False, f"float col {c}: {bad} mismatches"
        else:
            if not (a[c].values == b[c].values).all():
                bad = int((a[c].values != b[c].values).sum())
                return False, f"col {c}: {bad} mismatches"
    return True, ""


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    results = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = normalize(to_pandas(fn(sf_dir)))
            dt = time.time() - t0
            if name in sqls:
                exp = normalize(con.execute(sqls[name]).df())
                ok, why = frames_equal(ours, exp)
                status = "OK " if ok else "FAIL"
                results.append((name, ok, f"{status} rows={len(ours)} {why} ({dt:.1f}s)"))
            else:
                ok = len(ours) >= 0
                results.append((name, ok, f"OK* rows-only rows={len(ours)} ({dt:.1f}s)"))
        except Exception as e:
            traceback.print_exc()
            results.append((name, False, f"ERROR {type(e).__name__}: {e}"))
    n_ok = sum(1 for _, ok, _ in results if ok)
    for name, ok, msg in results:
        print(f"  {name:28s} {msg}")
    print(f"== {n_ok}/{len(results)} pass ==")
    ray.shutdown()
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
