"""Local stand-in for the driver's correctness check.

Runs every ``__ray_entry__.queries()`` entry at sf0.01 (override with argv)
and compares against ``oracle_sql()`` via DuckDB.

Default mode is EXACT-HASH parity (what the driver grades): columns sorted
by name, rows sorted by all columns, every cell serialized together with
its dtype kind, md5 of the whole — so int64 ``5`` vs float64 ``5.0`` FAILS
even though the values are numerically equal, exactly like the driver's
hash. A tolerant 1e-9 compare still runs afterwards purely as a diagnostic
(printed as ``values~=`` when the hash mismatches, so dtype-only drift is
distinguishable from wrong math at a glance).

Queries without oracle SQL get the rows-only check. Prints one line per
query + a summary. Pass ``--tolerant`` to grade on the old 1e-9 compare.
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
    """Sort columns by name and rows by all columns; canonicalize numeric
    dtypes WITHIN their family (any int width -> int64, any float ->
    float64) but never ACROSS families — int vs float stays a mismatch,
    mirroring the driver's dtype-sensitive hash."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def frame_hash(df: pd.DataFrame) -> str:
    """Driver-equivalent value hash: dtype-kind marker per column + exact
    per-cell serialization over the normalized (column/row-sorted) frame."""
    import hashlib

    h = hashlib.md5()
    for c in df.columns:
        col = df[c]
        h.update(f"{c}|{col.dtype.kind}\x1f".encode())
        if col.dtype.kind == "f":
            # exact bit pattern — both engine and oracle round to 6 decimals,
            # so bitwise equality is the contract (48/50 r3 rows prove it)
            h.update(col.to_numpy(dtype="float64").tobytes())
        elif col.dtype.kind in "iu":
            h.update(col.to_numpy(dtype="int64").tobytes())
        elif col.dtype.kind == "b":
            h.update(col.to_numpy(dtype="bool").tobytes())
        else:
            h.update("\x1e".join(col.astype(str)).encode())
    return h.hexdigest()


def frames_exact(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    """Exact-hash mode: driver parity. Returns (ok, reason)."""
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} != {len(b)}"
    for c in a.columns:
        if a[c].dtype.kind != b[c].dtype.kind:
            return False, f"dtype col {c}: ours={a[c].dtype} oracle={b[c].dtype}"
    ha, hb = frame_hash(a), frame_hash(b)
    if ha != hb:
        # locate the first offending column for the message
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if a[c].dtype.kind == "f":
                same = np.array_equal(av, bv, equal_nan=True)
            else:
                same = bool((av == bv).all())
            if not same:
                return False, f"hash col {c}: exact values differ"
        return False, "hash mismatch (serialization)"
    return True, ""


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
    argv = [a for a in sys.argv[1:] if a != "--tolerant"]
    tolerant = "--tolerant" in sys.argv[1:]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    only = argv[1].split(",") if len(argv) > 1 else None

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
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
                if tolerant:
                    ok, why = frames_equal(ours, exp)
                else:
                    ok, why = frames_exact(ours, exp)
                    if not ok:
                        tol_ok, _ = frames_equal(ours, exp)
                        if tol_ok:
                            why += " [values~= at 1e-9: dtype/serialization drift]"
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
