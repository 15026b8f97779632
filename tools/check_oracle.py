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


class ListColumnError(Exception):
    """An output column is list/array-typed — the DRIVER's canonicalizer
    crashes on these (round-1 `agg_collect` ERR: `unhashable type:
    numpy.ndarray`). Queries must emit arrays as canonical strings."""


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        # list-typed outputs crash the driver's hasher — refuse them here
        # so the failure is caught locally, not in CORRECTNESS_r{N}.
        if df[c].map(lambda v: isinstance(v, (list, tuple, np.ndarray))).any():
            raise ListColumnError(
                f"column {c!r} is list-typed — driver hasher would crash; "
                "emit it as a canonical string (array_join/array_to_string)"
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
    key = list(df.columns)
    if key:
        df = df.sort_values(key, kind="mergesort").reset_index(drop=True)
    return df


def _kind(dtype) -> str:
    """Dtype kind with unsigned folded into signed int."""
    k = dtype.kind
    return "i" if k == "u" else k


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
        # Bit-exact at zero: the driver's value-hash distinguishes -0.0
        # from +0.0 (round-6's only red row, win_rolling_corr) while
        # `==` does not — require matching sign bit when either is zero.
        if a == 0.0 and b == 0.0:
            return math.copysign(1.0, a) == math.copysign(1.0, b)
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y, tol) for x, y in zip(a, b))
    return a == b


def frames_equal(
    a: pd.DataFrame, b: pd.DataFrame, tol=0.0
) -> tuple[bool, str, list[str]]:
    """Driver-faithful compare: the driver's value-hash is
    REPRESENTATION-sensitive (round 1: DuckDB HUGEINT → float64 vs Spark
    int64 hash-mismatched on identical values), so a dtype-KIND mismatch
    (int vs float vs object...) is a hard fail even when `==` holds.
    Same-kind width differences (int32 vs int64, float32 vs float64) are
    a HARD FAIL since round 9: the driver's schema compare may be width-
    strict, and a width drift (row_number() without .cast('long')) is
    always a one-line fix — catch it here, never in CORRECTNESS_r{N}."""
    warns: list[str] = []
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}", warns
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}", warns
    for c in a.columns:
        ka, kb = _kind(a[c].dtype), _kind(b[c].dtype)
        if ka != kb:
            return (
                False,
                f"col {c}: dtype kind mismatch {a[c].dtype} vs {b[c].dtype} "
                "(driver hash is representation-sensitive)",
                warns,
            )
        if str(a[c].dtype) != str(b[c].dtype):
            return (
                False,
                f"col {c}: dtype WIDTH mismatch {a[c].dtype} vs "
                f"{b[c].dtype} (hard fail since r9 — cast to the oracle "
                "width, e.g. .cast('long'))",
                warns,
            )
    a = a.copy()
    b = b.copy()
    for df in (a, b):
        for c in df.columns:
            k = _kind(df[c].dtype)
            if k == "i":
                df[c] = df[c].astype("int64")
            elif k == "f" and str(df[c].dtype) != "float64":
                df[c] = df[c].astype("float64")
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            ok = values_equal(x, y, tol)
            if not ok:
                return False, f"col {c} row {i}: {x!r} vs {y!r}", warns
    return True, "", warns


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
            if key == "emb_pca_power":
                # rows-only forever (an eigenvector has no SQL
                # spelling) — gate on agreement with numpy's eigh
                from spark_cep_spark.operators.llm_similarity import (
                    pca_quality_probe,
                )

                cos, _one = pca_quality_probe(spark, args.sf_dir)
                if cos >= 0.9999:
                    print(
                        f"rows  {key:24s} rows-only ({len(sdf)} rows) + "
                        f"eigh-cos {cos:.6f} ({time.time()-t0:.1f}s)"
                    )
                    n_rowsonly += 1
                else:
                    print(
                        f"FAIL  {key:24s} power-iteration vs eigh "
                        f"cos {cos:.6f} < 0.9999"
                    )
                    n_fail += 1
                    failures.append(key)
                continue
            if key in ("sim_ann_lsh", "sim_ann_ivf", "sim_ann_pq",
                       "sim_ann_ivfpq", "sim_ann_ivfpq_index",
                       "sim_ann_ivfpq_delete",
                       "sim_index_stream_ingest"):
                # rows-only forever (approximate candidate sets) — gate
                # on planted-near-dup recall instead so an ANN recall
                # regression fails HERE, not just in pytest.
                from spark_cep_spark.operators.llm_similarity import (
                    planted_recall_probe,
                )

                hits, total = planted_recall_probe(spark, key)
                if hits >= 0.9 * total:
                    print(
                        f"rows  {key:24s} rows-only ({len(sdf)} rows) + "
                        f"recall {hits}/{total} ({time.time()-t0:.1f}s)"
                    )
                    n_rowsonly += 1
                else:
                    print(
                        f"FAIL  {key:24s} planted-near-dup recall "
                        f"{hits}/{total} < 0.9"
                    )
                    n_fail += 1
                    failures.append(key)
                continue
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
        try:
            a, b = normalize(sdf), normalize(odf)
        except ListColumnError as e:
            print(f"FAIL  {key:24s} {e}")
            n_fail += 1
            failures.append(key)
            continue
        ok, why, warns = frames_equal(a, b, tol=0.0)
        for w in warns:
            print(f"WARN  {key:24s} {w}")
        if ok:
            print(f"PASS  {key:24s} ({len(a)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            ok2, _, _ = frames_equal(a, b, tol=1e-9)
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
