"""Same-session A/B of the bench's streaming NFA drains with bucketed
grouping ON (default, B = 4x parallelism) vs OFF
(SPARK_GRAFT_STREAM_BUCKETS=1 -> plain groupBy(key)).

Alternates A/B/A/B... within one warm session per the host-noise
discipline; also asserts both modes produce IDENTICAL result rows.

Usage: python tools/ab_stream_buckets.py [--reps 3] [--mult 1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAM_NFA_SQL = """
PATTERN ( S -> V{1,3} -> P )
WITHIN 2 HOURS
PARTITION BY user_id
DEFINE S AS event_type = 'signup',
       V AS event_type = 'view',
       P AS event_type = 'purchase'
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--mult", type=int, default=1, help="8 for the 8x line")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from spark_cep_spark.operators.cep_sql import match_recognize
    from spark_cep_spark.session import get_spark
    from spark_cep_spark.streaming import harness

    spark = get_spark("ab_stream_buckets")
    staged = harness.stage_events_files_sorted(spark, args.sf_dir, n_files=8)
    if args.mult > 1:
        big_dir = os.path.join(harness.SCRATCH, f"ab_events_{args.mult}x")
        e = spark.read.parquet(staged)
        copies = [
            e.withColumn(
                "event_id",
                (F.col("event_id") + F.lit(i * 100_000_000)).cast("long"),
            ).withColumn(
                "user_id",
                (F.col("user_id") + F.lit(i * 10_000_000)).cast("long"),
            )
            for i in range(args.mult)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        os.makedirs(big_dir, exist_ok=True)
        big.write.mode("overwrite").parquet(
            os.path.join(big_dir, "events.parquet")
        )
        staged = harness.stage_events_files_sorted(spark, big_dir, n_files=8)
    n_events = spark.read.parquet(staged).count()
    print(f"n_events={n_events}", file=sys.stderr)

    def drain(collect=False):
        sdf = harness.events_stream(spark, staged, max_files_per_trigger=4)
        q = match_recognize(sdf, STREAM_NFA_SQL, watermark="0 seconds")
        t0 = time.perf_counter()
        out = harness.run_available_now(q, "append")
        if collect:
            rows = sorted(map(tuple, out.collect()))
            return time.perf_counter() - t0, rows
        n = out.count()
        return time.perf_counter() - t0, n

    # correctness: identical rows both modes
    os.environ["SPARK_GRAFT_STREAM_BUCKETS"] = "1"
    _, rows_off = drain(collect=True)
    os.environ.pop("SPARK_GRAFT_STREAM_BUCKETS")
    _, rows_on = drain(collect=True)
    assert rows_off == rows_on, (
        f"MISMATCH: off={len(rows_off)} rows, on={len(rows_on)} rows"
    )
    print(f"rows identical: {len(rows_on)}", file=sys.stderr)

    res = {"off": [], "on": []}
    for _ in range(args.reps):
        os.environ["SPARK_GRAFT_STREAM_BUCKETS"] = "1"
        res["off"].append(drain()[0])
        os.environ.pop("SPARK_GRAFT_STREAM_BUCKETS")
        res["on"].append(drain()[0])
    for mode in ("off", "on"):
        xs = sorted(res[mode])
        med = xs[len(xs) // 2]
        print(
            f"{mode:3s}: median {med:6.2f}s  min {xs[0]:6.2f}  "
            f"max {xs[-1]:6.2f}  ev/s {n_events/med:,.0f}"
        )


if __name__ == "__main__":
    main()
