"""Core contract tests: schemas, registry completeness, entry smoke."""

from __future__ import annotations

import pytest

import spark_cep_spark
from spark_cep_spark import schemas


def test_all_tables_load_with_declared_schemas(tables):
    # Spark 4 reads naive parquet timestamps as TIMESTAMP_NTZ
    # (inferTimestampNTZ); semantically identical to TIMESTAMP under the
    # pinned UTC session — treat the two flavors as equal here.
    norm = lambda t: "timestamp" if t.startswith("timestamp") else t
    for name, df in tables.items():
        declared = schemas.TABLES[name]
        got = {f.name: norm(f.dataType.simpleString()) for f in df.schema.fields}
        want = {f.name: norm(f.dataType.simpleString()) for f in declared.fields}
        assert got == want, f"{name}: {got} != {want}"
        assert df.count() > 0


def test_registry_every_query_has_callable_and_alias_discipline():
    spark_cep_spark.load_all()
    assert len(spark_cep_spark.QUERIES) >= 60
    # every oracle belongs to a registered query
    assert set(spark_cep_spark.ORACLES) <= set(spark_cep_spark.QUERIES)


def test_entry_smoke(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.count() > 0


@pytest.mark.parametrize("key", ["agg_group", "join_inner_equi", "win_topk_per_group"])
def test_query_columns_match_oracle_aliases(spark, key):
    """Column-name discipline: Spark result columns == oracle SELECT aliases
    (driver sorts columns by name before hashing)."""
    import duckdb

    spark_cep_spark.load_all()
    sdf = spark_cep_spark.QUERIES[key](spark, "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in schemas.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    odf = con.execute(spark_cep_spark.ORACLES[key]).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)


def test_rate_source_smoke(spark):
    """Rate source plans as a valid streaming DataFrame (dev source)."""
    from spark_cep_spark.sources.readers import rate_source

    df = rate_source(spark, rows_per_second=10)
    assert df.isStreaming and set(df.columns) == {"timestamp", "value"}
