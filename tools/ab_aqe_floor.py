"""Cold-JVM A/B of the AQE coalesce floor on the headline 7 (VERDICT
r11 item 3): each rep is a FRESH process (own JVM) that replays
bench.py's exact batch methodology (input warm-up, warm pass,
best-of-2 to the noop sink) under one floor setting, alternating
16KB / 1MB reps.  Prints per-query medians and the ratio.

Usage: python tools/ab_aqe_floor.py [--reps 5]
       python tools/ab_aqe_floor.py --child 16KB   (internal)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def child(floor: str) -> None:
    os.environ["SPARK_GRAFT_CACHE_INPUTS"] = "1"
    os.environ["SPARK_GRAFT_AQE_MIN_PARTITION_SIZE"] = floor
    import time

    from pyspark.sql import functions as F

    import spark_cep_spark
    from spark_cep_spark.io import load_tables, table
    from spark_cep_spark.operators.llm_similarity import topk_matmul_arrow
    from spark_cep_spark.session import get_spark

    spark_cep_spark.load_all()
    qs = dict(spark_cep_spark.QUERIES)

    def knn_bench(spark, sf_dir):
        e = table(spark, sf_dir, "embeddings")
        q = e.filter(F.col("vec_id") < 100)
        return topk_matmul_arrow(spark, q, e, k=10)

    qs["sim_topk_pandas_bench"] = knn_bench
    headline = {
        "q1_pricing_summary": "agg_group",
        "q3_join_agg_topk": "join_inner_equi",
        "window_rank": "win_topk_per_group",
        "events_tumbling": "stream_tumbling",
        "events_sessionish": "stream_session",
        "knn_selfjoin_sample": "sim_topk_pandas_bench",
        "doc_dedup": "dedup_exact",
    }
    spark = get_spark("ab_floor")
    for df in load_tables(spark, SF_DIR).values():
        df.count()

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    times = {}
    for name, key in headline.items():
        fn = qs[key]
        run_once(fn)
        times[name] = round(min(run_once(fn), run_once(fn)), 4)
    print("CHILD_JSON " + json.dumps(times))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--child", default=None)
    args = ap.parse_args()
    if args.child:
        child(args.child)
        return

    results: dict[str, list[dict]] = {"16KB": [], "1MB": []}
    for rep in range(args.reps):
        for floor in ("16KB", "1MB"):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", floor],
                capture_output=True,
                text=True,
                timeout=900,
            )
            line = [
                ln for ln in out.stdout.splitlines()
                if ln.startswith("CHILD_JSON ")
            ]
            if not line:
                print(f"rep {rep} {floor}: FAILED\n{out.stderr[-2000:]}")
                continue
            d = json.loads(line[0][len("CHILD_JSON "):])
            results[floor].append(d)
            print(
                f"rep {rep} {floor}: total "
                f"{sum(d.values()):.3f}s",
                file=sys.stderr,
            )

    names = list(results["16KB"][0])
    print(f"| query | 16KB med | 1MB med | 1MB/16KB |")
    print("| --- | --- | --- | --- |")
    for n in names:
        a = sorted(d[n] for d in results["16KB"])
        b = sorted(d[n] for d in results["1MB"])
        ma, mb = a[len(a) // 2], b[len(b) // 2]
        print(f"| {n} | {ma:.3f} | {mb:.3f} | {mb/ma:.2f} |")
    ta = sorted(sum(d.values()) for d in results["16KB"])
    tb = sorted(sum(d.values()) for d in results["1MB"])
    print(
        f"| TOTAL | {ta[len(ta)//2]:.3f} | {tb[len(tb)//2]:.3f} | "
        f"{tb[len(tb)//2]/ta[len(ta)//2]:.2f} |"
    )


if __name__ == "__main__":
    main()
