"""Micro-batch time breakdown for the bench's streaming drains.

bench.py's streaming lines (nfa_variants / windowed_agg / 8x) are
END-TO-END AvailableNow drains; this tool answers WHERE those seconds
go by reading StreamingQuery.recentProgress after each drain:
per-batch `durationMs` (addBatch / getBatch / latestOffset /
queryPlanning / walCommit / commitOffsets / triggerExecution) and the
stateful operator metrics (commit time, rows, state memory), plus the
query start/stop overhead (wall - sum of triggerExecution).

Usage: python tools/profile_stream_progress.py [--sf-dir DIR] [--mult N]
       [--state-parts K]  (K overrides spark.sql.shuffle.partitions for
       the drain, which is what sizes the state store; 0 = leave as-is)
"""

from __future__ import annotations

import argparse
import json
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


def drain_profiled(spark, build, mode, staged, max_files=4):
    """One drain; returns (wall_sec, progresses:list[dict])."""
    import uuid

    from spark_cep_spark.streaming import harness

    sdf = harness.events_stream(spark, staged, max_files_per_trigger=max_files)
    name = f"prof_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(harness.SCRATCH, "checkpoints", name)
    t0 = time.perf_counter()
    q = (
        build(sdf)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    progs = [json.loads(p.json) for p in q.recentProgress]
    spark.catalog.dropTempView(name)
    return wall, progs


def report(label, wall, progs):
    print(f"\n=== {label}: wall {wall:.2f}s, {len(progs)} batches ===")
    tot_trig = 0.0
    for i, p in enumerate(progs):
        d = p.get("durationMs", {})
        tot_trig += d.get("triggerExecution", 0) / 1000
        so = p.get("stateOperators") or []
        st = (
            "state commit {:.2f}s rows={} mem={}MB keys_no_data?".format(
                sum(s.get("allUpdatesTimeMs", 0) + s.get("commitTimeMs", 0) for s in so) / 1000,
                sum(s.get("numRowsTotal", 0) for s in so),
                round(sum(s.get("memoryUsedBytes", 0) for s in so) / 1e6, 1),
            )
            if so
            else ""
        )
        print(
            "  b{}: trigger {:.2f}s  addBatch {:.2f}s  getBatch {:.2f}s  "
            "latestOffset {:.2f}s  planning {:.2f}s  wal {:.2f}s  "
            "commitOff {:.2f}s  rows={}  {}".format(
                i,
                d.get("triggerExecution", 0) / 1000,
                d.get("addBatch", 0) / 1000,
                d.get("getBatch", 0) / 1000,
                d.get("latestOffset", 0) / 1000,
                d.get("queryPlanning", 0) / 1000,
                d.get("walCommit", 0) / 1000,
                d.get("commitOffsets", 0) / 1000,
                p.get("numInputRows"),
                st,
            )
        )
    print(f"  start/stop + gaps: {wall - tot_trig:.2f}s (wall - triggerExecution)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=1)
    ap.add_argument("--state-parts", type=int, default=0)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from spark_cep_spark.operators.cep_sql import match_recognize
    from spark_cep_spark.session import get_spark
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.windows import tumbling_stream

    spark = get_spark("profile_stream")
    if args.state_parts:
        spark.conf.set("spark.sql.shuffle.partitions", str(args.state_parts))

    staged = harness.stage_events_files_sorted(spark, args.sf_dir, n_files=8)
    if args.mult > 1:
        big_dir = os.path.join(harness.SCRATCH, f"prof_events_{args.mult}x")
        e = spark.read.parquet(staged)
        copies = [
            e.withColumn(
                "event_id", (F.col("event_id") + F.lit(i * 100_000_000)).cast("long")
            ).withColumn(
                "user_id", (F.col("user_id") + F.lit(i * 10_000_000)).cast("long")
            )
            for i in range(args.mult)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        os.makedirs(big_dir, exist_ok=True)
        big.write.mode("overwrite").parquet(os.path.join(big_dir, "events.parquet"))
        staged = harness.stage_events_files_sorted(spark, big_dir, n_files=8)

    n = spark.read.parquet(staged).count()
    print(f"events: {n}, state parts: {spark.conf.get('spark.sql.shuffle.partitions')}")

    builds = [
        (
            "nfa_variants",
            lambda s: match_recognize(s, STREAM_NFA_SQL, watermark="0 seconds"),
            "append",
        ),
        ("windowed_agg", lambda s: tumbling_stream(s), "update"),
    ]
    for label, build, mode in builds:
        drain_profiled(spark, build, mode, staged)  # warm
        for r in range(args.runs):
            wall, progs = drain_profiled(spark, build, mode, staged)
            report(f"{label} run{r}", wall, progs)


if __name__ == "__main__":
    main()
