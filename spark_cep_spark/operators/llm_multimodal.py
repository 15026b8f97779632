"""Multimodal column handling (SURVEY §2.11, §1.2).

Design: media are opaque BINARY payloads inside a typed struct
(uri, mime, bytes, meta MAP<STRING,STRING>) — schemas.MULTIMODAL_ASSET.
No media fixture exists (driver fixture set has none → rows-only
check), so payloads are synthesized deterministically from `documents`;
the Spark-side plumbing — struct schema, binary column, Arrow batch
shape through mapInPandas, partition-parallel decode — is real and
tested.

Decode libraries (PIL/ffmpeg/librosa) are NOT in this container:
`decode_asset` raises NotImplementedError unless the deterministic fake
decoder is requested — the UDF signature, batch iteration, and output
schema are exactly what a real decoder would use.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.registry import register


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Wrap documents as multimodal assets (binary payload + metadata)."""
    return docs.select(
        "doc_id",
        F.struct(
            F.concat(F.lit("mem://docs/"), F.col("doc_id")).alias("uri"),
            F.lit("text/plain").alias("mime"),
            F.encode(F.col("text"), "UTF-8").alias("bytes"),
            F.create_map(
                F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
            ).alias("meta"),
        ).alias("asset"),
    )


@register("multimodal_ingest")  # no media fixture → rows-only check
def multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary/struct column round-trip: build assets, extract typed
    metadata + payload size back out (all JVM-side)."""
    d = table(spark, sf_dir, "documents")
    a = assets_from_documents(d)
    return a.select(
        "doc_id",
        F.col("asset.uri").alias("uri"),
        F.col("asset.mime").alias("mime"),
        F.length(F.col("asset.bytes")).alias("n_bytes"),
        F.element_at(F.col("asset.meta"), "lang").alias("lang"),
        F.element_at(F.col("asset.meta"), "source").alias("source"),
    )


def decode_asset(payload: bytes, mime: str, fake: bool = False) -> dict:
    """Decode one media payload → feature dict.

    Real decoders (PIL for image/*, librosa for audio/*) are not
    available in this container (SURVEY constraint). `fake=True` uses a
    deterministic stand-in (byte statistics) so the distributed
    plumbing is testable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media decode requires PIL/ffmpeg/librosa — not present in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    n = len(payload)
    checksum = sum(payload) % 65536 if n else 0
    return {"n_bytes": n, "checksum": checksum, "width": n % 640, "height": n % 480}


DECODE_SCHEMA = "doc_id long, n_bytes long, checksum long, width long, height long"


def decode_assets(assets: DataFrame, fake: bool = True) -> DataFrame:
    """Distributed decode via mapInPandas: Arrow batches of binary
    payloads → per-asset feature rows. Partition-parallel; at 100 TB,
    repartition by size-bucket first so decode skew (one 4K video vs
    thousands of thumbnails) doesn't straggle."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_asset(b if b is not None else b"", m, fake=fake)
                for b, m in zip(pdf["bytes"], pdf["mime"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    flat = assets.select(
        "doc_id",
        F.col("asset.bytes").alias("bytes"),
        F.col("asset.mime").alias("mime"),
    )
    return flat.mapInPandas(decode_batches, DECODE_SCHEMA)


def read_binary_dir(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Directory-of-media source via Spark's binaryFile format →
    normalized to the asset struct."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.struct(
            F.col("path").alias("uri"),
            F.lit("application/octet-stream").alias("mime"),
            F.col("content").alias("bytes"),
            F.create_map(
                F.lit("length"), F.col("length").cast("string"),
                F.lit("mtime"), F.col("modificationTime").cast("string"),
            ).alias("meta"),
        ).alias("asset")
    )


def size_bucket_repartition(
    assets: DataFrame, n_partitions: int = 32, id_col: str = "doc_id"
) -> DataFrame:
    """Decode-skew mitigation: repartition assets by (log2 size bucket,
    salted id) so payloads of similar cost land together and one huge
    video cannot straggle a partition of thumbnails. The log2 bucket
    groups similar-cost work; the salted id spreads each bucket over
    many partitions. This is a pure physical rewrite — row set
    unchanged."""
    b = F.floor(F.log2(F.greatest(F.length(F.col("asset.bytes")), F.lit(1))))
    return assets.repartition(
        n_partitions, b, F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_partitions))
    )


def resize_features(decoded: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize step (aspect-preserving fit into max_side×max_side) over
    already-decoded dimensions — JVM-side arithmetic; the actual pixel
    resample would live in the same mapInPandas as decode_asset when a
    real imaging library is present."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side)
        / F.greatest(F.col("width"), F.col("height"), F.lit(1)).cast("double"),
    )
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.floor(F.col("width") * scale).cast("int").alias("out_w"),
        F.floor(F.col("height") * scale).cast("int").alias("out_h"),
    )


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_checksum long"


def frame_sample(assets: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Video frame sampling via mapInPandas: each asset expands to its
    every-n-th frames. Real frame extraction (ffmpeg) is unavailable in
    this container — the deterministic stand-in derives a frame count
    and per-frame checksum from the payload so batch fan-out (1 row in,
    k rows out, Arrow both ways) is tested for real. Run AFTER
    size_bucket_repartition: fan-out is proportional to payload size,
    exactly the skew the bucketing spreads."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_ck = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["bytes"]):
                if not fake:
                    raise NotImplementedError(
                        "frame extraction requires ffmpeg — pass fake=True"
                    )
                payload = payload if payload is not None else b""
                n_frames = max(len(payload) // 100, 1)
                for i in range(0, n_frames, every_n):
                    out_ids.append(doc_id)
                    out_idx.append(i)
                    start = (i * 37) % max(len(payload), 1)
                    out_ck.append(sum(payload[start : start + 16]))
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame_checksum": out_ck}
            )

    flat = assets.select("doc_id", F.col("asset.bytes").alias("bytes"))
    return flat.mapInPandas(sample, FRAME_SCHEMA)


@register("multimodal_decode")  # no media fixture → rows-only check
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal pipeline: synthesize assets → size-bucket
    repartition (skew spread) → Arrow-batched decode → resize features
    → per-asset frame count joined back. All distributed plumbing is
    real; only the codec inside the batch loop is the deterministic
    stand-in (no imaging libs in this container)."""
    d = table(spark, sf_dir, "documents")
    assets = size_bucket_repartition(assets_from_documents(d))
    decoded = resize_features(decode_assets(assets, fake=True))
    frames = (
        frame_sample(assets, every_n=10, fake=True)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_frames"))
    )
    return decoded.join(frames, "doc_id").select(
        "doc_id", "width", "height", "out_w", "out_h", "n_frames"
    )
