"""Same-session A/B of the dedup_cluster edge build (round 12): the
old 4-way-union band table (md5 scan re-planned per branch, x2 join
sides) vs the posexplode + persist shape now in _cluster_edges.

Times the FULL dedup_cluster (edges + connected components) to the
noop sink, alternating old/new; also asserts identical output rows.

Usage: python tools/ab_cluster_edges.py [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from spark_cep_spark.io import table
    from spark_cep_spark.operators.llm_dedup import (
        _cluster_edges,
        connected_components,
    )
    from spark_cep_spark.session import get_spark

    spark = get_spark("ab_cluster_edges")
    d = table(spark, args.sf_dir, "documents")

    def old_edges(dd):
        docs = dd.select("doc_id", F.md5("text").alias("fp"))
        bands = reduce(
            DataFrame.unionByName,
            [
                docs.select(
                    "doc_id",
                    F.lit(i + 1).alias("idx"),
                    F.substring("fp", 1 + 8 * i, 3).alias("b"),
                )
                for i in range(4)
            ],
        )
        x, y = bands.alias("x"), bands.alias("y")
        return (
            x.join(
                y,
                (F.col("x.idx") == F.col("y.idx"))
                & (F.col("x.b") == F.col("y.b")),
            )
            .filter(F.col("x.doc_id") != F.col("y.doc_id"))
            .select(
                F.col("x.doc_id").alias("src"), F.col("y.doc_id").alias("dst")
            )
            .distinct()
        )

    def run_old() -> float:
        t0 = time.perf_counter()
        connected_components(old_edges(d), d, "doc_id").write.mode(
            "overwrite"
        ).format("noop").save()
        return time.perf_counter() - t0

    def run_new() -> float:
        t0 = time.perf_counter()
        edges, bands = _cluster_edges(d)
        out = connected_components(edges, d, "doc_id")
        bands.unpersist()
        out.write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # identical rows
    a = sorted(
        map(tuple, connected_components(old_edges(d), d, "doc_id").collect())
    )
    edges, bands = _cluster_edges(d)
    b = sorted(map(tuple, connected_components(edges, d, "doc_id").collect()))
    bands.unpersist()
    assert a == b, f"MISMATCH old={len(a)} new={len(b)}"
    print(f"rows identical: {len(a)}", file=sys.stderr)

    res = {"old": [], "new": []}
    for _ in range(args.reps):
        res["old"].append(run_old())
        res["new"].append(run_new())
    for mode in ("old", "new"):
        xs = sorted(res[mode])
        print(
            f"{mode}: median {xs[len(xs)//2]:6.2f}s  min {xs[0]:6.2f}  "
            f"max {xs[-1]:6.2f}"
        )


if __name__ == "__main__":
    main()
