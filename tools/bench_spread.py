"""Per-query warm spread for the headline bench (round-5 verdict item
4): run every BASELINE.md headline query N times warm in one session
and print min/median/max PER QUERY, so a single-query outlier in a
driver BENCH line (like round 5's q3 0.98 s vs 0.54 s re-runs)
self-adjudicates against the recorded band instead of needing a
manual re-measurement session.

Usage: python tools/bench_spread.py [--runs 5]
Writes a markdown table to stdout (recorded in SCALE.md per round).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CACHE_INPUTS"] = "1"  # warm-bench posture
    import bench
    import spark_cep_spark
    from pyspark.sql import functions as F
    from spark_cep_spark.io import load_tables, table
    from spark_cep_spark.operators.llm_similarity import topk_matmul
    from spark_cep_spark.session import get_spark

    spark_cep_spark.load_all()
    qs = dict(spark_cep_spark.QUERIES)

    def knn_bench(spark, sf_dir):
        e = table(spark, sf_dir, "embeddings")
        q = e.filter(F.col("vec_id") < 100)
        return topk_matmul(spark, q, e, k=10)

    qs["sim_topk_pandas_bench"] = knn_bench

    spark = get_spark("bench-spread")
    for df in load_tables(spark, SF_DIR).values():
        df.count()

    times: dict[str, list[float]] = {n: [] for n in bench.HEADLINE}
    for bench_name, key in bench.HEADLINE.items():  # warm pass
        qs[key](spark, SF_DIR).write.mode("overwrite").format("noop").save()
    for _ in range(args.runs):
        for bench_name, key in bench.HEADLINE.items():
            t0 = time.perf_counter()
            qs[key](spark, SF_DIR).write.mode("overwrite").format("noop").save()
            times[bench_name].append(time.perf_counter() - t0)

    print(f"| query | min (s) | median (s) | max (s) | ({args.runs} warm runs) |")
    print("| --- | --- | --- | --- | --- |")
    tot = [sum(times[n][i] for n in times) for i in range(args.runs)]
    for name, ts in times.items():
        print(
            f"| {name} | {min(ts):.3f} | {statistics.median(ts):.3f} "
            f"| {max(ts):.3f} | |"
        )
    print(
        f"| **total** | {min(tot):.3f} | {statistics.median(tot):.3f} "
        f"| {max(tot):.3f} | |"
    )


if __name__ == "__main__":
    main()
