"""Incremental sliding-window aggregation vs naive per-batch recompute.

The reference's (Samsung/spark-cep) headline feature was incremental
sliding-window aggregation: instead of re-aggregating the whole window
every slide (the DStream-era `window()` model), it kept per-window
partial aggregates in a state store and merged deltas. Structured
Streaming gives the same algorithm natively — this script MEASURES that
claim on this engine:

- incremental: `sliding_stream` (1h/15m windowed agg) executed once
  over the staged files with maxFilesPerTrigger=1 → one stateful pass,
  each event read ONCE, per-window partials updated in the state store.
- naive: for each micro-batch prefix [0..i], recompute the full batch
  sliding aggregate from scratch — what a recompute-per-slide engine
  does. Reads O(N·B) rows for B batches.

The script reports BOTH wall-clock and rows-scanned. Measured at 10M
rows / 16 batches on local[32] (2026-08-13): incremental 14.2 s vs
naive 10.0 s wall — the naive pass WINS wall-clock at fixture scale,
because Spark's batch aggregate over page-cached parquet runs at
~10M rows/s while each micro-batch carries ~0.9 s of fixed cost
(offset/commit log, state checkpoint, sink bookkeeping) that 10M rows
cannot amortize. The scale-invariant metric is rows scanned:
(B+1)/2 ≈ 8.5× at B=16. At 100 TB the window no longer lives in page
cache — the naive model re-reads the full window from storage every
slide (8.5× the I/O and agg work here, growing linearly with B), while
the incremental pass reads each event once and touches only per-window
partials in the state store. Honest conclusion: incrementality is a
scale feature, not a toy-scale feature, and this engine gets it native
from Structured Streaming.

Usage: python tools/bench_incremental.py [--batches 16] [--replicate 20]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument(
        "--replicate",
        type=int,
        default=20,
        help="row-multiply the fixture so real work beats fixed job overhead",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from spark_cep_spark.io import table
    from spark_cep_spark.session import get_spark
    from spark_cep_spark.streaming.harness import SCRATCH, events_stream, run_available_now
    from spark_cep_spark.streaming.windows import sliding_agg, sliding_stream

    spark = get_spark("bench_incremental")
    # Right-size the shuffle/state partitioning to the aggregate's key
    # cardinality (~2900 sliding windows): 32 state-store instances per
    # micro-batch is pure commit overhead at this key count. Applied to
    # BOTH passes — same rule SCALE.md gives for sizing at 100 TB.
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    # Stage: replicate events (jitter event_id so dedup-free), range-sort
    # by ts into `batches` files — arrival order == event-time order.
    ev = table(spark, SF_DIR, "events")
    if args.replicate > 1:
        ev = ev.crossJoin(spark.range(args.replicate).select(F.col("id").alias("_r"))).drop("_r")
    staged = os.path.join(SCRATCH, "bench_incremental")
    shutil.rmtree(staged, ignore_errors=True)
    (
        ev.repartitionByRange(args.batches, F.col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(staged)
    )
    files = sorted(
        os.path.join(staged, f) for f in os.listdir(staged) if f.startswith("part")
    )
    n_rows = spark.read.parquet(staged).count()  # also warms the page cache

    # --- incremental: one stateful streaming pass, every row read once.
    t0 = time.perf_counter()
    out = run_available_now(
        sliding_stream(events_stream(spark, staged, max_files_per_trigger=1)),
        output_mode="update",
    )
    out.count()
    t_incremental = time.perf_counter() - t0

    # --- naive recompute: per batch, full aggregate over the prefix.
    rows_naive = 0
    t0 = time.perf_counter()
    for i in range(1, len(files) + 1):
        sliding_agg(spark.read.parquet(*files[:i])).write.mode("overwrite").format(
            "noop"
        ).save()
        rows_naive += n_rows * i // len(files)
    t_naive = time.perf_counter() - t0

    shutil.rmtree(staged, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "incremental_vs_recompute_sliding_window",
                "rows": n_rows,
                "batches": args.batches,
                "incremental_sec": round(t_incremental, 3),
                "naive_recompute_sec": round(t_naive, 3),
                "wall_speedup": round(t_naive / t_incremental, 2),
                "rows_scanned_incremental": n_rows,
                "rows_scanned_naive": rows_naive,
                "scan_ratio": round(rows_naive / n_rows, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
