"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``spark_cep_spark/`` — operators register
themselves in spark_cep_spark.registry; this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import spark_cep_spark
from spark_cep_spark.session import apply_runtime_confs

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Flagship = the spark-cep signature operation: windowed aggregation
    over the event stream (1h tumbling counts+sums per event_type),
    via the same code path the streaming face uses (SURVEY §7 M0).
    """
    apply_runtime_confs(spark)
    spark_cep_spark.load_all()
    return spark_cep_spark.QUERIES["stream_tumbling"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    spark_cep_spark.load_all()
    return dict(spark_cep_spark.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted keys → rows-only)."""
    spark_cep_spark.load_all()
    return dict(spark_cep_spark.ORACLES)
