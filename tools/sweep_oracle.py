"""Driver-style correctness sweep: run every `queries()` entry next to its
`oracle_sql()` twin over the same parquet tables and compare values exactly.

Mirrors the driver's compare: columns sorted by name, rows sorted by all
columns, exact (bitwise for floats) value equality — and DTYPE-STRICT:
the oracle twin must come back from DuckDB with the engine's exact pandas
dtype (int64 vs int32 vs float64 vs Int64 all fail loudly).  The round-4
escape (engine int64 vs DuckDB SUM(BIGINT)->HUGEINT->float64, 9 queries)
shipped because this sweep used to coerce every int dtype to int64 and
upcast int-vs-float to float64 before comparing; those normalizations are
deliberately gone — ::BIGINT every SUM/window/iterative aggregate in the
twin instead (see COVERAGE.md's dtype-discipline note).  Only two
representation-level normalizations remain: datetimes unified to us
resolution (parquet/DuckDB fetch units differ, values compared exactly)
and object columns stringified.  Rows-only entries (no oracle) are
executed and checked for >=0 rows and a stable schema.

Usage:  python tools/sweep_oracle.py [sf_dir] [--only q1,q2] [--skip qX]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(f"unexpected result type {type(res)}")


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object or isinstance(df[c].dtype, pd.StringDtype):
            # object vs pandas-string is a representation difference for
            # the same VARCHAR values (driver-green either way) — unify
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if list(a.columns) != list(b.columns):
        return f"schema mismatch: ray={list(a.columns)} sql={list(b.columns)}"
    if len(a) != len(b):
        return f"row count mismatch: ray={len(a)} sql={len(b)}"
    for c in a.columns:
        if str(a[c].dtype) != str(b[c].dtype):
            return f"dtype mismatch col={c}: ray={a[c].dtype} sql={b[c].dtype}"
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            ok = np.array_equal(av, bv, equal_nan=True)
        else:
            ok = np.array_equal(av, bv)
        if not ok:
            bad = next(
                i for i in range(len(av))
                if not (av[i] == bv[i] or (isinstance(av[i], float) and np.isnan(av[i]) and np.isnan(bv[i])))
            )
            return f"value mismatch col={c} row={bad}: ray={av[bad]!r} sql={bv[bad]!r}"
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    ap.add_argument("--skip", default="")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")

    import __ray_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()

    only = {s for s in args.only.split(",") if s}
    skip = {s for s in args.skip.split(",") if s}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        if name in skip:
            continue
        t0 = time.time()
        try:
            ray_df = _to_pandas(fn(args.sf_dir))
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: ray query raised\n{traceback.format_exc()}")
            continue
        if name not in oracles:
            n_rows_only += 1
            print(f"rows {name}: {len(ray_df)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            sql_df = con.execute(oracles[name]).fetchdf()
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: oracle SQL raised\n{traceback.format_exc()}")
            continue
        err = _compare(_normalize(ray_df), _normalize(sql_df))
        if err:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: {err}")
        else:
            n_pass += 1
            print(f"pass {name}: {len(ray_df)} rows ({time.time()-t0:.1f}s)")

    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    if failures:
        print("failures:", ", ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
