"""Batch sources and sinks (SURVEY §2.1).

Parquet is the primary format (vectorized reader, predicate pushdown,
column pruning). CSV/JSON ingest is demonstrated via a lossless
round-trip of a fixture table so it gets a FULL oracle (the round-trip
re-produces `nation` exactly). Kafka is interface-stubbed — no broker
in this environment (SURVEY §2.1); the streaming file source stands in
(spark_cep_spark.streaming).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.registry import register
from spark_cep_spark.schemas import NATION

# Scratch space inside the repo (everything outside /root/repo is
# off-limits for writes); gitignored.
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".tmp")


@register(
    "scan_parquet",
    oracle="SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice FROM part",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-table parquet scan — the baseline source every other
    operator builds on."""
    return table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"
    )


@register(
    "scan_csv_json",
    oracle="""
    SELECT n.n_nationkey, n.n_name, n.n_regionkey, n.n_name AS j_name
    FROM nation n
    """,
)
def scan_csv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV + JSON ingest with explicit schemas: writes `nation` out as
    CSV and JSON, reads both back, joins — result must equal the
    original (lossless int/string round-trip), giving a full oracle."""
    os.makedirs(SCRATCH, exist_ok=True)
    n = table(spark, sf_dir, "nation")
    csv_dir = os.path.join(SCRATCH, "nation_csv")
    json_dir = os.path.join(SCRATCH, "nation_json")
    n.coalesce(1).write.mode("overwrite").option("header", True).csv(csv_dir)
    n.coalesce(1).write.mode("overwrite").json(json_dir)
    from_csv = spark.read.schema(NATION).option("header", True).csv(csv_dir)
    from_json_src = (
        spark.read.schema(NATION)
        .json(json_dir)
        .select(F.col("n_nationkey").alias("jk"), F.col("n_name").alias("j_name"))
    )
    return from_csv.join(from_json_src, from_csv.n_nationkey == from_json_src.jk).select(
        "n_nationkey", "n_name", "n_regionkey", "j_name"
    )


# Spark's default JSON timestamp WRITE format is millisecond-precision
# — a silent 999 µs loss per event on round-trip — so the writer pins
# microseconds. The READER must stay lenient: a pinned SSSSSS parse
# format would NULL-out whole-second ISO timestamps from external
# producers (DateTimeFormatter fractions are not optional), so it uses
# an optional-fraction pattern instead.
_KAFKA_WRITE_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"}
_KAFKA_READ_OPTS = {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]XXX"}


def parse_kafka_payload(raw: DataFrame, schema) -> DataFrame:
    """Decode the Kafka wire format: JSON in `value` → typed columns.

    Pure DataFrame transform — works on any relation with a `value`
    column (streaming Kafka source OR a batch stand-in), which is how
    it is tested without a broker: to_kafka_payload ∘
    parse_kafka_payload must be identity on typed rows, and external
    whole-second / millisecond ISO timestamps must parse too."""
    return raw.select(
        F.from_json(
            F.col("value").cast("string"), schema, _KAFKA_READ_OPTS
        ).alias("payload")
    ).select("payload.*")


def to_kafka_payload(df: DataFrame) -> DataFrame:
    """Encode typed columns to the Kafka wire format (JSON `value`)."""
    return df.select(
        F.to_json(F.struct(*df.columns), _KAFKA_WRITE_OPTS).alias("value")
    )


def kafka_stream_reader(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source interface (reference-family standard source).

    Returns an unbounded DataFrame with the payload parsed from the
    Kafka `value` as JSON with the given schema. No broker (or Kafka
    connector jar) exists in this environment, so the connector load
    is untestable here; the payload codec (parse_kafka_payload /
    to_kafka_payload) is round-trip-tested on batch stand-ins, and the
    availableNow file source is the tested streaming stand-in.
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return parse_kafka_payload(raw, schema)


def kafka_stream_writer(df: DataFrame, bootstrap_servers: str, topic: str, checkpoint: str):
    """Kafka sink interface (INSERT INTO <sink> equivalent)."""
    return (
        to_kafka_payload(df)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


@register(
    "scan_orc",
    oracle="""
    SELECT s_suppkey, s_name, s_nationkey, round(s_acctbal, 2) AS acctbal
    FROM supplier
    """,
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC ingest (Spark's second columnar format, vectorized reader +
    predicate pushdown like parquet): lossless round-trip of `supplier`
    through ORC, so the scan gets a full oracle against the original
    table. At scale ORC behaves like parquet here — same pushdown,
    pruning, and split planning; format choice is an interop concern,
    not a plan concern."""
    os.makedirs(SCRATCH, exist_ok=True)
    s = table(spark, sf_dir, "supplier")
    orc_dir = os.path.join(SCRATCH, "supplier_orc")
    s.write.mode("overwrite").orc(orc_dir)
    return spark.read.orc(orc_dir).select(
        "s_suppkey",
        "s_name",
        "s_nationkey",
        F.round("s_acctbal", 2).alias("acctbal"),
    )


@register(
    "scan_hive_partitioned",
    oracle="""
    SELECT doc_id, source, n_chars, lang
    FROM documents WHERE lang IN ('en', 'de')
    """,
)
def scan_hive_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + partition-PRUNED scan: write
    `documents` partitioned by lang (the canonical corpus layout —
    per-language directories so monolingual pipelines never touch the
    other languages' bytes), read it back with a lang predicate, and
    let Catalyst prune to the matching directories.

    The pruning is the point at 100 TB: `lang IN ('en','de')` must
    appear as PartitionFilters on the scan (pinned in
    tests/test_plans.py), meaning Spark lists and reads ONLY those two
    directories — zero I/O for the other partitions, before any row
    filter runs. Partition values ride in directory names, so the
    files themselves don't store the column; the explicit select
    restores the original column order and the string type round-trips
    losslessly."""
    os.makedirs(SCRATCH, exist_ok=True)
    d = table(spark, sf_dir, "documents")
    part_dir = os.path.join(SCRATCH, "documents_by_lang")
    d.write.mode("overwrite").partitionBy("lang").parquet(part_dir)
    return (
        spark.read.parquet(part_dir)
        .filter(F.col("lang").isin("en", "de"))
        .select("doc_id", "source", "n_chars", "lang")
    )


def rate_source(
    spark: SparkSession, rows_per_second: int = 100, num_partitions: int = 1
) -> DataFrame:
    """Built-in rate source — dev/smoke stream (timestamp, value)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", num_partitions)
        .load()
    )


def socket_source(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Socket text source (reference-family standard [PK]) — one STRING
    column `value` per line; parse with from_json/split downstream. Dev
    only: no replay, not fault-tolerant (same caveat as upstream Spark)."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )


# 16-bit Morton (Z-order) interleave of two 8-bit dims, generated once
# at import so the Spark plan and the DuckDB oracle compute the SAME
# closed-form bit arithmetic (Spark spells shifts as shiftleft/
# shiftright functions, DuckDB as << / >> operators).
_SPARK_MORTON16 = "shiftleft(shiftright(xb, 0) & 1, 0) + shiftleft(shiftright(yb, 0) & 1, 1) + shiftleft(shiftright(xb, 1) & 1, 2) + shiftleft(shiftright(yb, 1) & 1, 3) + shiftleft(shiftright(xb, 2) & 1, 4) + shiftleft(shiftright(yb, 2) & 1, 5) + shiftleft(shiftright(xb, 3) & 1, 6) + shiftleft(shiftright(yb, 3) & 1, 7) + shiftleft(shiftright(xb, 4) & 1, 8) + shiftleft(shiftright(yb, 4) & 1, 9) + shiftleft(shiftright(xb, 5) & 1, 10) + shiftleft(shiftright(yb, 5) & 1, 11) + shiftleft(shiftright(xb, 6) & 1, 12) + shiftleft(shiftright(yb, 6) & 1, 13) + shiftleft(shiftright(xb, 7) & 1, 14) + shiftleft(shiftright(yb, 7) & 1, 15)"
_DUCK_MORTON16 = "(((xb >> 0) & 1) << 0) + (((yb >> 0) & 1) << 1) + (((xb >> 1) & 1) << 2) + (((yb >> 1) & 1) << 3) + (((xb >> 2) & 1) << 4) + (((yb >> 2) & 1) << 5) + (((xb >> 3) & 1) << 6) + (((yb >> 3) & 1) << 7) + (((xb >> 4) & 1) << 8) + (((yb >> 4) & 1) << 9) + (((xb >> 5) & 1) << 10) + (((yb >> 5) & 1) << 11) + (((xb >> 6) & 1) << 12) + (((yb >> 6) & 1) << 13) + (((xb >> 7) & 1) << 14) + (((yb >> 7) & 1) << 15)"


@register(
    "scan_zorder",
    oracle="""
    WITH d AS (
      SELECT user_id % 256 AS xb,
             CAST(floor(epoch(ts) / 3600) AS BIGINT) % 256 AS yb
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), z AS (SELECT xb, yb, (((xb >> 0) & 1) << 0) + (((yb >> 0) & 1) << 1) + (((xb >> 1) & 1) << 2) + (((yb >> 1) & 1) << 3) + (((xb >> 2) & 1) << 4) + (((yb >> 2) & 1) << 5) + (((xb >> 3) & 1) << 6) + (((yb >> 3) & 1) << 7) + (((xb >> 4) & 1) << 8) + (((yb >> 4) & 1) << 9) + (((xb >> 5) & 1) << 10) + (((yb >> 5) & 1) << 11) + (((xb >> 6) & 1) << 12) + (((yb >> 6) & 1) << 13) + (((xb >> 7) & 1) << 14) + (((yb >> 7) & 1) << 15) AS zv FROM d)
    SELECT zv >> 6 AS zbucket,
           count(*) AS n_rows,
           min(xb) AS x_lo, max(xb) AS x_hi,
           min(yb) AS y_lo, max(yb) AS y_hi
    FROM z GROUP BY zbucket
    """,
)
def scan_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout clustering: interleave the bits of two
    query dimensions — user bucket x time bucket — into one sort key,
    so ONE physical ordering serves range predicates on EITHER
    dimension.

    This is the data-layout technique behind Delta/Iceberg OPTIMIZE
    ZORDER BY: a lexicographic sort on (user, ts) clusters only the
    leading column, so `ts BETWEEN ...` predicates still touch every
    file; sorting by the interleaved z-value tiles the (user, time)
    plane into locality squares, and per-file min/max stats on BOTH
    raw dims become tight — a two-dimensional range predicate prunes
    to O(perimeter) files instead of O(all).  The emitted per-bucket
    (min, max) spans ARE the pruning stats a writer would persist:
    each 64-cell z-bucket covers an 8x8 tile (x_hi-x_lo <= 7 AND
    y_hi-y_lo <= 7, pinned in tests), whereas the same buckets under
    a one-dimensional sort span the full 0..255 on the second dim.

    The interleave itself is 16 terms of shift/AND arithmetic —
    closed-form, whole-stage-codegen, no UDF — generated from the same
    Python loop as the oracle's DuckDB spelling so both engines agree
    bit-for-bit.  At 100 TB the z-value is computed scan-side,
    the groupBy shuffles one row per bucket (<= 1024), and a real
    writer would `repartitionByRange(zv).sortWithinPartitions(zv)` —
    a single range shuffle — to materialize the clustered layout."""
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            (F.col("user_id") % 256).alias("xb"),
            (
                F.floor(F.unix_timestamp("ts") / 3600) % 256
            ).alias("yb"),
        )
        .withColumn("zv", F.expr(_SPARK_MORTON16))
    )
    return e.groupBy(
        F.shiftright("zv", 6).alias("zbucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("xb").alias("x_lo"),
        F.max("xb").alias("x_hi"),
        F.min("yb").alias("y_lo"),
        F.max("yb").alias("y_hi"),
    )


@register(
    "scan_binaryfile",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    WHERE doc_id < 200 AND text IS NOT NULL
    """,
)
def scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's `binaryFile` source — the ingestion face of the
    multimodal family (SURVEY §2.11): opaque media payloads enter the
    engine as whole files with (path, length, content) and typed
    metadata derived downstream (llm_multimodal's decode plumbing
    consumes exactly this shape). Staged fixture: the first 200
    documents' UTF-8 bytes written as one file each (bounded,
    documented scaffolding — at 100 TB the files already exist in
    object storage and ONLY this read path runs: whole-file splits,
    no decode, predicate pushdown on path/length metadata).

    Full oracle (the scan_csv_json lossless-round-trip discipline):
    doc_id parsed back from the file name, byte length and md5 of the
    content must equal the source table's — proving the bytes survive
    the filesystem round-trip untouched."""
    os.makedirs(SCRATCH, exist_ok=True)
    bin_dir = os.path.join(SCRATCH, "docs_binary")
    import shutil

    shutil.rmtree(bin_dir, ignore_errors=True)
    os.makedirs(bin_dir)
    rows = (
        table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 200) & F.col("text").isNotNull())
        .select("doc_id", "text")
        .collect()  # bounded by contract: 200 rows of fixture text
    )
    for r in rows:
        with open(os.path.join(bin_dir, f"{r['doc_id']}.bin"), "wb") as f:
            f.write(r["text"].encode("utf-8"))
    return (
        spark.read.format("binaryFile")
        .load(bin_dir)
        .select(
            F.regexp_extract(
                F.col("path"), r"(\d+)\.bin$", 1
            )
            .cast("long")
            .alias("doc_id"),
            F.col("length").cast("long").alias("n_bytes"),
            F.md5("content").alias("content_md5"),
        )
    )


@register(
    "layout_compaction",
    oracle="""
    SELECT CAST(64 AS BIGINT) AS n_files_before,
           CAST(4 AS BIGINT) AS n_files_after,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST('0x' || substr(md5(
                 l_orderkey || '|' || l_partkey || '|' ||
                 CAST(round(l_quantity * 100) AS BIGINT)), 1, 8)
               AS BIGINT)) AS BIGINT) AS fingerprint
    FROM lineitem
    WHERE l_orderkey % 10 = 0
      AND l_partkey IS NOT NULL AND l_quantity IS NOT NULL
    """,
)
def layout_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the warehouse maintenance job every
    streaming ingest eventually needs (a micro-batch sink leaves
    thousands of KB-sized files; scans then pay per-file open cost and
    the driver pays per-file planning): write a 64-fragment layout,
    compact it to 4 files, and PROVE row identity across the rewrite
    with an order-independent content fingerprint (sum of per-row
    32-bit md5 prefixes — 32 bits per row keeps the sum inside BIGINT
    to 2^31 rows; floats enter the hash as exact integer cents, never
    engine-formatted strings).

    The emitted file counts are the CONTRACT (64 -> 4, pinned by the
    oracle's literals): round-robin repartition leaves no empty
    partition at any fixture SF, so a count drift means the compaction
    didn't do what it claims. At 100 TB the same job is
    read -> repartition(target) -> write per partition-date, and the
    fingerprint check is how you ship it without a diff of 10^11
    rows."""
    import shutil

    os.makedirs(SCRATCH, exist_ok=True)
    frag_dir = os.path.join(SCRATCH, "compact_frag")
    comp_dir = os.path.join(SCRATCH, "compact_out")
    shutil.rmtree(frag_dir, ignore_errors=True)
    shutil.rmtree(comp_dir, ignore_errors=True)

    li = (
        table(spark, sf_dir, "lineitem")
        # null guards mirror the oracle: concat_ws SKIPS a null element
        # while DuckDB's || nulls the whole string — a null row would
        # silently diverge the fingerprints
        .filter(
            (F.col("l_orderkey") % 10 == 0)
            & F.col("l_partkey").isNotNull()
            & F.col("l_quantity").isNotNull()
        )
        .select("l_orderkey", "l_partkey", "l_quantity")
    )
    li.repartition(64).write.parquet(frag_dir)
    n_before = len(
        [f for f in os.listdir(frag_dir) if f.endswith(".parquet")]
    )
    spark.read.parquet(frag_dir).repartition(4).write.parquet(comp_dir)
    n_after = len(
        [f for f in os.listdir(comp_dir) if f.endswith(".parquet")]
    )
    row_key = F.concat_ws(
        "|",
        F.col("l_orderkey"),
        F.col("l_partkey"),
        F.round(F.col("l_quantity") * 100).cast("long"),
    )
    return (
        spark.read.parquet(comp_dir)
        .select(
            F.conv(F.substring(F.md5(row_key), 1, 8), 16, 10)
            .cast("long")
            .alias("h")
        )
        .agg(
            F.lit(n_before).cast("long").alias("n_files_before"),
            F.lit(n_after).cast("long").alias("n_files_after"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("h").cast("long").alias("fingerprint"),
        )
    )
