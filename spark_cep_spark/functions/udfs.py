"""UDF / UDAF / UDTF surface (SURVEY §2.12).

Demonstrates every user-function extension point with oracle-checkable
semantics, plus SQL registration (`spark.udf.register`) so SQL-string
users reach the same functions. The guidance stands: builtins first;
when Python is unavoidable, Arrow-vectorized pandas UDFs — the
row-at-a-time scalar UDF below exists to cover the API, and its unit
test doubles as the "why not" benchmark.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_cep_spark.io import table
from spark_cep_spark.registry import register


# -- scalar pandas UDF (Arrow-vectorized, the preferred Python path) -------
@F.pandas_udf(T.DoubleType())
def scale_shift(v: pd.Series) -> pd.Series:
    """2x + 1 — deterministic IEEE arithmetic, exact oracle parity."""
    return v * 2.0 + 1.0


# -- row-at-a-time scalar UDF (API coverage; slow path) --------------------
# (no type hints: F.udf warns it cannot infer an eval type from them)
@F.udf(T.LongType())
def type_len(s):
    return len(s) if s is not None else None


# -- grouped-agg pandas UDAF ----------------------------------------------
@F.pandas_udf(T.DoubleType())
def mean_udaf(v: pd.Series) -> float:
    return float(v.mean())


@register(
    "udf_surface",
    oracle="""
    SELECT event_id,
           value * 2.0 + 1.0 AS scaled,
           length(event_type) AS type_len
    FROM events
    """,
)
def udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas UDF + python UDF in one projection, SQL-registered so the
    same query works as a SQL string (spark.udf.register)."""
    spark.udf.register("scale_shift_sql", scale_shift)
    spark.udf.register("type_len_sql", type_len)
    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        scale_shift(F.col("value")).alias("scaled"),
        type_len(F.col("event_type")).alias("type_len"),
    )


@register(
    "udaf_grouped",
    oracle="""
    SELECT event_type, round(avg(value), 4) AS mean_value
    FROM events GROUP BY event_type
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom aggregate via GROUPED_AGG pandas UDF (Arrow transfer,
    one pandas Series per group per partition-merge)."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(mean_udaf(F.col("value")), 4).alias("mean_value")
    )


@register(
    "grouped_map",
    oracle="""
    SELECT user_id, event_id, ts,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0)) AS seq_no
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-user pandas frame in/out (the
    batch-side engine of the CEP NFA and custom per-entity transforms).
    Computes a per-user sequence number — deterministic, oracle-checked
    against the window-function equivalent."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")

    def number(pdf: pd.DataFrame) -> pd.DataFrame:
        # NULL event_id sorts as 0 (temp key only — output keeps NULL)
        # to match the oracle's ORDER BY ts, coalesce(event_id, 0):
        # pandas NaN sorts LAST, DuckDB NULLS LAST, Spark NULLS FIRST —
        # the three disagree on a timestamp tie (round-8 parity sweep).
        pdf = (
            pdf.assign(_eid0=pdf["event_id"].fillna(0))
            .sort_values(["ts", "_eid0"])
            .drop(columns="_eid0")
            .reset_index(drop=True)
        )
        pdf["seq_no"] = range(1, len(pdf) + 1)
        return pdf[["user_id", "event_id", "ts", "seq_no"]]

    return e.select("user_id", "event_id", "ts").groupBy("user_id").applyInPandas(
        number, "user_id long, event_id long, ts timestamp, seq_no long"
    )


@register(
    "map_in_pandas",
    oracle="""
    SELECT doc_id, n_chars, n_chars * 2 AS doubled
    FROM documents
    """,
)
def map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas: whole-partition Arrow batch iterator (the embedding/
    multimodal workhorse) — integer arithmetic for exact parity."""
    d = table(spark, sf_dir, "documents")

    def f(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[["doc_id", "n_chars"]].copy()
            pdf["doubled"] = pdf["n_chars"] * 2
            yield pdf

    return d.mapInPandas(f, "doc_id long, n_chars long, doubled long")


@register(
    "udtf_tokens",
    oracle="""
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) AS pos,
           unnest(string_split(text, ' ')) AS tok
    FROM documents
    WHERE doc_id < 20
    """,
)
def udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 UDTF: one row in, N rows out (tokenizer-as-table-function
    — the pattern-match emitter shape). 1-based positions to match the
    SQL subscripts."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, pos bigint, tok string")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            if text is None:  # NULL text -> no rows, matching unnest(NULL)
                return
            for i, tok in enumerate(text.split(" "), start=1):
                yield doc_id, i, tok

    spark.udtf.register("tokenize", Tokenize)
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    d.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.tok "
        "FROM docs_for_udtf d, LATERAL tokenize(d.doc_id, d.text) t"
    )


@register(
    "map_in_arrow",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(length(text) AS BIGINT) AS n_chars_utf8
    FROM documents
    ORDER BY doc_id
    """,
)
def map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the zero-copy sibling of mapInPandas (§2.12): the
    batch function receives pyarrow RecordBatches directly, skipping
    the Arrow→pandas materialization entirely, which is the right
    surface when the kernel is itself Arrow-native (pyarrow.compute /
    Arrow-backed tokenizers). Whitespace token counts and UTF-8
    character lengths computed with pc.split_pattern /
    pc.list_value_length / pc.utf8_length — vectorized C++ kernels,
    no per-row Python. NULL text propagates to NULL counts on both
    engines."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = table(spark, sf_dir, "documents").select("doc_id", "text")

    def count_tokens(batches):
        for b in batches:
            text = b.column("text")
            words = pc.split_pattern(text, " ")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pc.list_value_length(words).cast(pa.int64()),
                    pc.utf8_length(text).cast(pa.int64()),
                ],
                ["doc_id", "n_words", "n_chars_utf8"],
            )

    return d.mapInArrow(
        count_tokens, "doc_id long, n_words long, n_chars_utf8 long"
    ).orderBy("doc_id")
