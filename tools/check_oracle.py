"""Local mimic of the driver's correctness gate.

Runs every queries() entry at sf0.01 (or --sf-dir) AND its oracle_sql()
in DuckDB, compares row count, column names, and values (sorted by all
columns, column order by name). Floats compared exactly first, then
with tolerance — a tolerance-only pass is flagged, since the driver
hashes exact values.

Usage: python tools/check_oracle.py [--only key1,key2] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    df = df.reindex(sorted(df.columns), axis=1)
    # lists/arrays/ndarrays → tuples so they sort/compare
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple, np.ndarray))).any():
            df[c] = df[c].map(
                lambda v: tuple(v.tolist() if isinstance(v, np.ndarray) else v)
                if isinstance(v, (list, tuple, np.ndarray))
                else v
            )
        # python date objects → Timestamps (Spark DATE cols arrive as object)
        if df[c].dtype == object and df[c].map(
            lambda v: hasattr(v, "toordinal") and not hasattr(v, "hour")
        ).any():
            df[c] = pd.to_datetime(df[c])
        # datetime normalization: drop tz, cast to datetime64[us]
        if str(df[c].dtype).startswith("datetime64"):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("float32",):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
    key = list(df.columns)
    if key:
        df = df.sort_values(key, kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b, tol=0.0):
    if a is None and b is None:
        return True
    # NaT / None / nan cross-engine null markers
    if not isinstance(a, (tuple, list)) and not isinstance(b, (tuple, list)):
        try:
            if pd.isna(a) and pd.isna(b):
                return True
        except (TypeError, ValueError):
            pass
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if tol:
            return abs(a - b) <= tol * max(1.0, abs(a), abs(b))
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y, tol) for x, y in zip(a, b))
    return a == b


def frames_equal(a: pd.DataFrame, b: pd.DataFrame, tol=0.0) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            ok = values_equal(x, y, tol)
            if not ok:
                return False, f"col {c} row {i}: {x!r} vs {y!r}"
    return True, ""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="use an unconfigured SparkSession (no UTC/AQE confs), like the "
        "driver does — queries must repair the session themselves",
    )
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        from spark_cep_spark.session import get_spark

        spark = get_spark("oracle_check")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    n_pass = n_fuzzy = n_fail = n_rowsonly = 0
    failures = []
    for key, fn in sorted(qs.items()):
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {key:24s} spark error: {e}")
            n_fail += 1
            failures.append(key)
            continue
        if key not in oracles:
            print(f"rows  {key:24s} rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[key]).fetchdf()
        except Exception as e:
            print(f"FAIL  {key:24s} oracle error: {e}")
            n_fail += 1
            failures.append(key)
            continue
        a, b = normalize(sdf), normalize(odf)
        ok, why = frames_equal(a, b, tol=0.0)
        if ok:
            print(f"PASS  {key:24s} ({len(a)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            ok2, _ = frames_equal(a, b, tol=1e-9)
            if ok2:
                print(f"FUZZ  {key:24s} exact-mismatch but within 1e-9: {why}")
                n_fuzzy += 1
            else:
                print(f"FAIL  {key:24s} {why}")
                n_fail += 1
                failures.append(key)
    print(
        f"\n{n_pass} exact-pass, {n_fuzzy} fuzzy-only (RISK), "
        f"{n_fail} fail, {n_rowsonly} rows-only"
    )
    if failures:
        print("failed:", ", ".join(failures))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
