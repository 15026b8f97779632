"""Continuously-maintained aggregate tables (SURVEY §0 north star:
"continuous SQL queries over event streams" whose results land in a
queryable sink — the reference family's `SELECT ... INSERT INTO sink`
loop with incremental window aggregation [PK]).

Structured Streaming already maintains the aggregate STATE
incrementally; what the reference's sink loop adds is a continuously
UPSERTED result table. This module composes the two modern primitives:

    update-mode aggregation   → per micro-batch, only the (key, agg)
                                rows whose values changed
    foreachBatch MERGE        → upsert those rows into a parquet target
                                (anti-join out stale keys, union new)

so the target parquet is always the current aggregate over everything
ingested — readable mid-stream by any batch consumer, exactly-once
across restarts (foreachBatch re-delivery overwrites the same keys
idempotently; the swap is atomic-by-rename).

Scale: each batch touches only changed keys (update mode); the merge
cost is target-scan + anti-join, the standard parquet-upsert shape. On
a real deployment the target would be a Delta/Iceberg table whose
MERGE INTO does the same thing transactionally; plain parquet +
directory swap keeps this repo dependency-free and test-runnable.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def merge_into_parquet(batch_df: DataFrame, target: str, keys: list[str]) -> None:
    """Upsert batch_df into the parquet directory `target` by key:
    target rows whose key appears in the batch are replaced, everything
    else kept. Directory-swap write so readers never see a half state."""
    spark = batch_df.sparkSession
    if os.path.exists(target):
        tgt = spark.read.parquet(target)
        merged = tgt.join(
            batch_df.select(*keys).distinct(), keys, "left_anti"
        ).unionByName(batch_df)
    else:
        merged = batch_df
    staging = f"{target}__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    old = f"{target}__old_{uuid.uuid4().hex[:8]}"
    if os.path.exists(target):
        os.rename(target, old)
    os.rename(staging, target)
    shutil.rmtree(old, ignore_errors=True)


def materialize_aggregate(
    agg_stream: DataFrame,
    keys: list[str],
    target: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Run an update-mode streaming aggregation into a continuously
    upserted parquet table. `agg_stream` is any streaming aggregation
    DataFrame (groupBy().agg(...), windowed or keyed); `keys` identify
    its rows for the upsert.

    The reference shape this re-creates [PK]:
        SELECT key, agg(...) FROM stream GROUP BY key INSERT INTO sink
    with the incremental-aggregation speedup native to the engine.
    """

    def upsert(batch_df: DataFrame, _batch_id: int) -> None:
        merge_into_parquet(batch_df, target, keys)

    writer = (
        agg_stream.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
