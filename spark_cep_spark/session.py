"""SparkSession builder tuned for this engine.

Local-mode testing runs on local[$SPARK_GRAFT_CPUS]; the same settings
(AQE, Arrow, sized shuffle partitions) are the ones we'd ship for a real
cluster, where `spark.sql.shuffle.partitions` scales with executor
cores and data volume instead of being pinned to the local core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Configs that are safe (and desirable) to apply to ANY session at
#: runtime — including the driver-provided session in queries() — because
#: they are runtime-mutable SQL confs. Timezone pinning keeps timestamp
#: semantics identical to the DuckDB oracle (fixtures are naive
#: timestamps; UTC makes window alignment deterministic).
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE coalescing sizes partitions by SHUFFLE BYTES, which is the
    # wrong proxy for a Python-boundary stage: a grouped applyInPandas
    # costs milliseconds of per-GROUP dispatch (pandas frame build +
    # kernel + output frame) regardless of group bytes.  Measured
    # (round 11, sf0.1): the run-agg family's 2.6 MB exchange was
    # coalesced 32 -> 2 partitions, serializing 7,487 x ~6 ms of
    # Python work on 2 cores — cep_sql_run_agg_multikey 28.4 s wall.
    # Lowering the coalesce floor (default 1 MB) to 16 KB keeps the
    # fan-out: same query 3.2 s (9x), cep_sql_run_agg 5.4 -> 1.1 s,
    # cep_sql_leading_kleene 7.1 -> 1.1 s.  Scale posture: the floor
    # only matters when a stage's shuffle is small-in-bytes but
    # expensive-per-row (reduced corpora feeding Python kernels); at
    # 100 TB the same pathology appears whenever a selective stage
    # feeds applyInPandas, and partitions above the floor are sized by
    # advisoryPartitionSizeInBytes exactly as before.  Env-overridable
    # for cluster tuning.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": os.environ.get(
        "SPARK_GRAFT_AQE_MIN_PARTITION_SIZE", "16KB"
    ),
    # The static planner's post-filter size estimates are optimistic
    # enough at bench scale to broadcast a 600k-row filtered fact table
    # (measured: q3 builds a broadcast hash relation of filtered
    # lineitem under the default 10 MB threshold — ~0.2 s slower than
    # the shuffle join). 4 MB keeps every true dimension (region,
    # nation, filtered customer, the lexicon) on the broadcast path and
    # pushes fact-fact joins to shuffle, which is also the plan shape
    # that is correct at 100 TB; AQE can still re-broadcast at runtime
    # when the *measured* size is genuinely small.
    "spark.sql.autoBroadcastJoinThreshold": str(4 * 1024 * 1024),
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply runtime-mutable confs; call at the top of every entry point."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf may be non-mutable
            pass
    return spark


def get_spark(
    app_name: str = "spark_cep_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "32g",
) -> SparkSession:
    """Build (or fetch) a local SparkSession.

    At 100 TB on a real cluster the same knobs apply with different
    values: shuffle partitions sized so each task handles ~128-200 MB,
    AQE left on to coalesce/repartition at runtime and split skewed
    partitions, RocksDB state store for streaming state.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Streaming: RocksDB would be the 100 TB choice; HDFS-backed
        # in-memory store is fine for local fixtures and avoids native
        # lib friction in CI. Flip via env for scale runs.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            os.environ.get(
                "SPARK_GRAFT_STATESTORE",
                "org.apache.spark.sql.execution.streaming.state."
                "HDFSBackedStateStoreProvider",
            ),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
