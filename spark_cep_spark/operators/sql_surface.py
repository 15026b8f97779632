"""String-SQL surface (the reference's user-facing interface shape).

Samsung/spark-cep's users wrote SQL strings against registered tables
(SURVEY §0 north star: "SQL-based complex event processing"). The
DataFrame operators elsewhere in this package prove the semantics; this
module proves the *SQL-string* entry point: `spark.sql(...)` over
registered temp views, exercising the SQL features a CEP analyst
actually writes — CTEs, correlated and uncorrelated subqueries,
EXISTS/IN, and LATERAL VIEW table generation.

Everything here goes through the Catalyst parser → analyzer, the same
pipeline as the DataFrame API (SURVEY §3.2), so pushdown/pruning/AQE
apply identically. At 100 TB these plans are indistinguishable from
their DataFrame twins — the SQL string is a front-end, not an engine.

Float discipline: scalar-subquery thresholds use max() (exact, no
accumulation order) rather than avg/sum, so borderline-row membership
cannot differ between engines; aggregated doubles are rounded on both
sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_cep_spark.io import table
from spark_cep_spark.registry import register


def _views(spark: SparkSession, sf_dir: str, names: list[str]) -> None:
    """Register fixture tables as temp views (idempotent overwrite) so
    SQL strings use bare table names, mirroring the reference's
    registered stream/static tables."""
    for name in names:
        table(spark, sf_dir, name).createOrReplaceTempView(name)


@register(
    "sql_cte",
    oracle="""
    WITH cust_orders AS (
      SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend
      FROM orders
      GROUP BY o_custkey
    )
    SELECT c.c_mktsegment AS segment,
           count(*) AS n_cust,
           CAST(sum(co.n_orders) AS BIGINT) AS orders_total,
           round(avg(co.spend), 2) AS avg_spend
    FROM cust_orders co
    JOIN customer c ON c.c_custkey = co.o_custkey
    GROUP BY segment
    """,
)
def sql_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH-clause (CTE) + join + re-aggregation, pure SQL string.
    Catalyst inlines the CTE; the orders aggregate shuffles once on
    o_custkey and the customer join broadcasts at dim scale."""
    _views(spark, sf_dir, ["orders", "customer"])
    return spark.sql(
        """
        WITH cust_orders AS (
          SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS spend
          FROM orders
          GROUP BY o_custkey
        )
        SELECT c.c_mktsegment AS segment,
               count(*) AS n_cust,
               sum(co.n_orders) AS orders_total,
               round(avg(co.spend), 2) AS avg_spend
        FROM cust_orders co
        JOIN customer c ON c.c_custkey = co.o_custkey
        GROUP BY segment
        """
    )


@register(
    "sql_subqueries",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > (SELECT max(o2.o_totalprice) FROM orders o2) * 0.5
      AND o.o_custkey IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'BUILDING')
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    """,
)
def sql_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery + IN-subquery + correlated EXISTS in
    one WHERE clause. Catalyst rewrites IN → left-semi join and EXISTS →
    left-semi join; the scalar subquery becomes a broadcast one-row
    plan. The max()-based threshold is accumulation-order-exact."""
    _views(spark, sf_dir, ["orders", "customer", "lineitem"])
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > (SELECT max(o2.o_totalprice) FROM orders o2) * 0.5
          AND o.o_custkey IN (SELECT c_custkey FROM customer
                              WHERE c_mktsegment = 'BUILDING')
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
        """
    )


@register(
    "sql_subquery_correlated",
    oracle="""
    SELECT c.c_custkey,
           (SELECT count(*) FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
             AS n_finished
    FROM customer c
    WHERE c.c_nationkey = 5
    """,
)
def sql_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in the SELECT list (per-customer
    finished-order count). Catalyst de-correlates it into an outer join
    against a pre-aggregated orders plan — one shuffle, no per-row
    probing, which is what survives 100 TB."""
    _views(spark, sf_dir, ["orders", "customer"])
    return spark.sql(
        """
        SELECT c.c_custkey,
               (SELECT count(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
                 AS n_finished
        FROM customer c
        WHERE c.c_nationkey = 5
        """
    )


@register(
    "sql_lateral_explode",
    oracle="""
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    HAVING count(*) > 50
    """,
)
def sql_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL VIEW explode (table-generating SQL) — tokenize the corpus
    in SQL and aggregate token frequencies. The explode runs inside
    whole-stage codegen (no Python); the aggregate is the only
    shuffle."""
    _views(spark, sf_dir, ["documents"])
    return spark.sql(
        """
        SELECT token, count(*) AS cnt
        FROM documents
        LATERAL VIEW explode(split(text, ' ')) t AS token
        GROUP BY token
        HAVING count(*) > 50
        """
    )
