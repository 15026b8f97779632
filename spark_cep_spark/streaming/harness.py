"""Deterministic streaming test harness (SURVEY §5.5).

Runs any streaming DataFrame to completion with Trigger.AvailableNow
into a memory sink and returns the result as a batch DataFrame. Tests
split the fixture into several files + maxFilesPerTrigger to force
multiple micro-batches, proving incremental state correctness (results
must equal the batch twin regardless of batch boundaries).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from spark_cep_spark.io import table
from spark_cep_spark.schemas import EVENTS

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp")


def stage_events_files(
    spark: SparkSession, sf_dir: str, n_files: int = 8, subdir: str | None = None
) -> str:
    """Rewrite the events fixture as n parquet files (micro-batch fuel).

    Spark rewrites the data itself so the streaming source sees
    Spark-native timestamp encoding regardless of the fixture's
    original physical type.
    """
    subdir = subdir or f"events_stream_{uuid.uuid4().hex[:8]}"
    out = os.path.join(SCRATCH, subdir)
    shutil.rmtree(out, ignore_errors=True)
    table(spark, sf_dir, "events").repartition(n_files).write.mode("overwrite").parquet(out)
    return out


def stage_events_files_sorted(
    spark: SparkSession, sf_dir: str, n_files: int = 8, subdir: str | None = None
) -> str:
    """Stage events as n files RANGE-PARTITIONED AND SORTED by event
    time, with file mtimes ascending in range order — arrival order ==
    event-time order, so a zero-delay watermark drops nothing and the
    whole stream matures by end-of-stream. This is the staging used for
    exact streaming-vs-batch equivalence tests of order-sensitive
    operators (CEP NFA); unordered staging + a real watermark delay is
    the production shape."""
    import pyspark.sql.functions as F  # local alias

    subdir = subdir or f"events_sorted_{uuid.uuid4().hex[:8]}"
    out = os.path.join(SCRATCH, subdir)
    shutil.rmtree(out, ignore_errors=True)
    (
        table(spark, sf_dir, "events")
        .repartitionByRange(n_files, F.col("ts"))
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    parts = sorted(f for f in os.listdir(out) if f.startswith("part"))
    base = 1_700_000_000
    for i, f in enumerate(parts):
        os.utime(os.path.join(out, f), (base + i * 3600,) * 2)
    return out


def events_stream(
    spark: SparkSession, staged_dir: str, max_files_per_trigger: int | None = 2
) -> DataFrame:
    """Unbounded events source over staged files (explicit schema —
    required for streaming file sources)."""
    reader = spark.readStream.schema(EVENTS)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(staged_dir)


def run_available_now(
    stream_df: DataFrame, output_mode: str = "complete", name: str | None = None
) -> DataFrame:
    """Execute to completion (AvailableNow → drains all input honoring
    maxFilesPerTrigger, then stops) into a memory sink; return results."""
    spark = stream_df.sparkSession
    name = name or f"q_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(SCRATCH, "checkpoints", name)
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def run_foreach_batch_parquet(
    stream_df: DataFrame, out_dir: str, output_mode: str = "update"
) -> None:
    """`INSERT INTO <sink>` equivalent via foreachBatch (the reference
    family's sink clause, SURVEY §2.1): append each micro-batch to a
    parquet sink transactionally per epoch. Default `update` mode emits
    changed aggregates each batch (append would wait for the watermark
    to finalize windows)."""
    ckpt = os.path.join(SCRATCH, "checkpoints", f"fb_{uuid.uuid4().hex[:8]}")

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


DOCUMENTS_TS = None  # built lazily from the documents schema + ts


def _documents_ts_schema():
    global DOCUMENTS_TS
    if DOCUMENTS_TS is None:
        from pyspark.sql import types as T

        from spark_cep_spark.schemas import DOCUMENTS

        DOCUMENTS_TS = T.StructType(
            list(DOCUMENTS.fields) + [T.StructField("ts", T.TimestampType())]
        )
    return DOCUMENTS_TS


def stage_documents_files(
    spark: SparkSession, sf_dir: str, n_files: int = 6, subdir: str | None = None
) -> str:
    """Stage the documents fixture as an unbounded-source directory with
    a synthetic arrival timestamp (ts = epoch + doc_id seconds) — the
    fuel for streaming near-dedup tests. Deterministic: the same doc
    always gets the same ts."""
    import pyspark.sql.functions as F  # local alias

    subdir = subdir or f"documents_stream_{uuid.uuid4().hex[:8]}"
    out = os.path.join(SCRATCH, subdir)
    shutil.rmtree(out, ignore_errors=True)
    (
        table(spark, sf_dir, "documents")
        .withColumn(
            "ts", F.expr("timestamp_seconds(1700000000 + doc_id)")
        )
        .repartition(n_files)
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def stage_documents_files_sorted(
    spark: SparkSession, sf_dir: str, n_files: int = 4, subdir: str | None = None
) -> str:
    """Stage documents RANGE-PARTITIONED AND SORTED by the synthetic
    arrival time (ts = epoch + doc_id seconds), mtimes ascending —
    arrival order == event-time order, the exact-equivalence staging
    for order-sensitive streaming intake tests (first-arrival dedup
    winner == lowest doc_id == the batch twin's winner)."""
    import pyspark.sql.functions as F  # local alias

    subdir = subdir or f"documents_sorted_{uuid.uuid4().hex[:8]}"
    out = os.path.join(SCRATCH, subdir)
    shutil.rmtree(out, ignore_errors=True)
    (
        table(spark, sf_dir, "documents")
        .withColumn(
            "ts", F.expr("timestamp_seconds(1700000000 + doc_id)")
        )
        .repartitionByRange(n_files, F.col("doc_id"))
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(out)
    )
    parts = sorted(f for f in os.listdir(out) if f.startswith("part"))
    base = 1_700_000_000
    for i, f in enumerate(parts):
        os.utime(os.path.join(out, f), (base + i * 3600,) * 2)
    return out


def documents_stream(
    spark: SparkSession, staged_dir: str, max_files_per_trigger: int | None = 2
) -> DataFrame:
    """Unbounded documents source over staged files."""
    reader = spark.readStream.schema(_documents_ts_schema())
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(staged_dir)
