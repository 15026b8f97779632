"""Query/oracle registry — the driver-facing contract surface.

Every operator from SURVEY.md §2 registers here as
    @register("key", oracle="<DuckDB SQL>")
    def key(spark, sf_dir) -> DataFrame: ...

`__spark_entry__.py` re-exports QUERIES/ORACLES. Keys with oracle=None
get the driver's weaker rows-only check (non-SQL-expressible ops).

Column-name discipline (driver hashes sort columns by name): every
computed column is aliased identically in the Spark plan and the oracle
SQL. Float discipline: aggregate outputs that accumulate (sum/avg/
stddev) are rounded on BOTH sides so engine-order float noise cannot
flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_LOADED = False


def register(key: str, oracle: Optional[str] = None):
    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are inside the function to avoid circular imports at
    # package-import time.
    from spark_cep_spark.sources import readers  # noqa: F401
    from spark_cep_spark.operators import (  # noqa: F401
        relational,
        joins,
        aggregates,
        windows,
        cep,
        cep_sql,
        llm_dedup,
        llm_similarity,
        llm_text,
        llm_multimodal,
        llm_pipeline,
        sql_surface,
    )
    from spark_cep_spark.functions import families, udfs  # noqa: F401
    from spark_cep_spark.streaming import windows as stream_windows  # noqa: F401

    _LOADED = True
