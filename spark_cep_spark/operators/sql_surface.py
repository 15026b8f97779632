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
from pyspark.sql import functions as F

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


@register(
    "sql_recursive_cte",
    oracle="""
    WITH RECURSIVE edges AS (
      SELECT a.vec_id AS src, b.vec_id AS dst
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.25
    ),
    reach(vec_id, hops) AS (
      SELECT vec_id, 0 FROM embeddings WHERE vec_id % 20 = 0
      UNION ALL
      SELECT DISTINCT e.dst, r.hops + 1
      FROM reach r JOIN edges e ON e.src = r.vec_id
      WHERE r.hops < 3
    )
    SELECT vec_id, CAST(min(hops) AS BIGINT) AS hops
    FROM reach GROUP BY vec_id
    """,
)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4.x) — depth-bounded BFS over the
    embedding near-neighbour graph: hop distance from a seed set
    through edges with cosine >= 0.25, the reachability query behind
    "everything transitively similar to these seeds" (dedup cluster
    expansion, contamination spread analysis).

    The edge list is materialized ONCE as a temp view before the
    recursion (at 100 TB you would never recompute an all-pairs
    similarity join per iteration — candidate pairs come from the
    LSH-bucketed path, cf. dedup_minhash_lsh, and land in a table);
    each recursive step is then one equi-join of the current frontier
    against the edge table keyed on src — the standard distributed
    BFS round. The recursive member is SELECT DISTINCT: without
    frontier dedup an unpruned UNION ALL BFS fans out as
    degree^depth (verified to blow up at 10x the fixture), while the
    deduped frontier is bounded by |V| rows per level — the
    level-synchronous BFS that survives scale. (Spark 4.1 rejects
    recursive UNION-distinct, so the dedup lives inside the member —
    identical semantics on both engines.) Depth bound 3 caps the
    iteration count; the final min(hops) aggregate dedups multiple
    discovery paths. Exact
    integer output (no float discipline needed beyond the edge
    threshold, which both engines evaluate as an identical
    sequential-order dot product — same contract as dedup_embed)."""
    e = table(spark, sf_dir, "embeddings")
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(
        F.zip_with(
            F.col("a.embedding"),
            F.col("b.embedding"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    # persist: the recursive UnionLoop re-evaluates its plan every
    # iteration — without this the all-pairs similarity join would run
    # once per BFS round instead of once (the "materialize the edge
    # table first" rule stated above, enforced)
    (
        a.join(b, F.col("a.vec_id") != F.col("b.vec_id"))
        .filter(dot >= 0.25)
        .select(F.col("a.vec_id").alias("src"), F.col("b.vec_id").alias("dst"))
        .persist()
        .createOrReplaceTempView("nn_edges")
    )
    e.createOrReplaceTempView("embeddings")
    return spark.sql(
        """
        WITH RECURSIVE reach(vec_id, hops) AS (
          SELECT vec_id, 0 FROM embeddings WHERE vec_id % 20 = 0
          UNION ALL
          SELECT DISTINCT e.dst, r.hops + 1
          FROM reach r JOIN nn_edges e ON e.src = r.vec_id
          WHERE r.hops < 3
        )
        SELECT vec_id, CAST(min(hops) AS BIGINT) AS hops
        FROM reach GROUP BY vec_id
        """
    )


@register(
    "sql_match_recognize",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'view'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
         s2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_v, min(c.ts) AS t_c
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 6 HOUR
           GROUP BY v.user_id, v.event_id, v.ts),
         m AS (
           SELECT s2.user_id AS key, s2.event_id AS anchor_id,
                  s2.t_v, s2.t_c, min(p.ts) AS t_p
           FROM s2 JOIN p ON p.user_id = s2.user_id
                         AND p.ts > s2.t_c AND p.ts <= s2.t_v + INTERVAL 6 HOUR
           GROUP BY s2.user_id, s2.event_id, s2.t_v, s2.t_c)
    SELECT key, CAST(count(*) AS BIGINT) AS n_funnels,
           min(t_v) AS first_funnel, max(t_p) AS last_purchase
    FROM m GROUP BY key HAVING count(*) >= 1
    """,
)
def sql_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedded MATCH_RECOGNIZE inside an ordinary SQL statement (the
    standard-SQL table-valued shape): the pattern relation feeds a
    plain GROUP BY / HAVING — repeat-funnel users — with the outer
    query planned by Catalyst like any other. One statement, two
    engines: the MR call compiles through the same dialect as
    cep_sql_match; the aggregation is ordinary SQL over its output."""
    from spark_cep_spark.io import load_tables
    from spark_cep_spark.sql import sql_with_match_recognize

    load_tables(spark, sf_dir, register_views=True)
    return sql_with_match_recognize(
        spark,
        """
        SELECT key, CAST(count(*) AS BIGINT) AS n_funnels,
               min(t_v) AS first_funnel, max(t_p) AS last_purchase
        FROM MATCH_RECOGNIZE(events, $$
            PATTERN ( v -> c -> p )
            WITHIN 6 HOURS
            DEFINE v AS event_type = 'view',
                   c AS event_type = 'click',
                   p AS event_type = 'purchase'
        $$)
        GROUP BY key HAVING count(*) >= 1
        """,
    )


@register(
    "sql_qualify",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
           CAST(row_number() OVER (PARTITION BY o_custkey
                ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
    FROM orders
    QUALIFY rn <= 3
    """,
)
def sql_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALIFY clause (Snowflake/DuckDB/BigQuery dialect): top-3
    orders per customer, written as the one-level QUALIFY statement an
    analyst writes, run through sql_with_qualify's rewrite — the SAME
    text is the oracle, which DuckDB executes natively. The rewritten
    Spark plan collapses to WindowGroupLimit (pinned in
    tests/test_plans.py), so the sugar costs nothing at scale."""
    from spark_cep_spark.sql import sql_with_qualify

    _views(spark, sf_dir, ["orders"])
    return sql_with_qualify(
        spark,
        """
        SELECT o_custkey, o_orderkey,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
               CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
        FROM orders
        QUALIFY rn <= 3
        """,
    )


@register(
    "sql_pivot",
    oracle="""
    SELECT o_orderpriority AS pri,
           CAST(sum(CASE WHEN year(o_orderdate) = 1995
                    THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
                AS BIGINT) AS y1995_cents,
           CAST(sum(CASE WHEN year(o_orderdate) = 1996
                    THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
                AS BIGINT) AS y1996_cents,
           CAST(sum(CASE WHEN year(o_orderdate) = 1997
                    THEN CAST(round(o_totalprice * 100) AS BIGINT) END)
                AS BIGINT) AS y1997_cents
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL PIVOT clause (long→wide reshape in the dialect itself
    — the sugar BI tools emit): revenue cents per priority × year,
    pivoted to one column per year.  The oracle is the portable
    CASE-aggregation spelling — PIVOT is definitionally that rewrite,
    and Spark plans it as exactly one hash aggregate over the
    filtered scan (same plan as agg_pivot's DataFrame groupBy().
    pivot() face; this key covers the PARSER surface).  Exact integer
    cents so the per-cell sums hash across engines.  At 100 TB the
    pivot IS a groupBy: one shuffle on the grouping key, cell count
    bounded by the fixed IN-list."""
    _views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT pri, y1995_cents, y1996_cents, y1997_cents
        FROM (
          SELECT o_orderpriority AS pri,
                 year(o_orderdate) AS yr,
                 CAST(round(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders
        )
        PIVOT (
          CAST(sum(cents) AS BIGINT)
          FOR yr IN (1995 AS y1995_cents, 1996 AS y1996_cents,
                     1997 AS y1997_cents)
        )
        """
    )


@register(
    "sql_unpivot",
    oracle="""
    SELECT c_custkey AS custkey, metric, val
    FROM (
      UNPIVOT (SELECT c_custkey,
                      CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
                      CAST(c_nationkey AS BIGINT) AS nationkey
               FROM customer)
      ON bal_cents, nationkey
      INTO NAME metric VALUE val
    )
    """,
)
def sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL UNPIVOT clause (wide→long reshape in the dialect — the
    inverse of sql_pivot, completing the reshape pair on the parser
    surface; agg_unpivot covers the DataFrame unpivot/melt face).
    Spark plans UNPIVOT as a single Expand node over the scan — each
    input row fans out to one row per measure with NO shuffle at all,
    so the reshape is scan-shaped at any scale.  Both engines ship
    UNPIVOT natively; measures are cast to one exact integer type
    because UNPIVOT requires a common value type (and mixed
    double/int would hash-differ)."""
    _views(spark, sf_dir, ["customer"])
    return spark.sql(
        """
        SELECT c_custkey AS custkey, metric, val
        FROM (
          SELECT c_custkey,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents,
                 CAST(c_nationkey AS BIGINT) AS nationkey
          FROM customer
        )
        UNPIVOT (
          val FOR metric IN (bal_cents, nationkey)
        )
        """
    )


@register(
    "sql_exists_flag",
    oracle="""
    SELECT c.c_custkey AS custkey,
           EXISTS (SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_orderpriority = '1-URGENT') AS has_urgent,
           NOT EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey) AS orderless
    FROM customer c
    """,
)
def sql_exists_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a PROJECTED flag (not a filter): every customer row
    survives, annotated with has-urgent-order / orderless booleans —
    the mark-join shape. A semi/anti join can only keep or drop rows;
    projecting existence forces Spark's ExistenceJoin physical variant
    (the subquery side joins with a synthetic exists# flag), still a
    hash join on the correlation key — plan-pinned in tests.  At
    100 TB this costs the same one shuffle per subquery as a semi
    join; the alternative (LEFT JOIN + DISTINCT + CASE) pays an extra
    dedup aggregate."""
    _views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c.c_custkey AS custkey,
               EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderpriority = '1-URGENT') AS has_urgent,
               NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey) AS orderless
        FROM customer c
        """
    )
