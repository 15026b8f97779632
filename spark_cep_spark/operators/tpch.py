"""TPC-H-adapted analytical query pack (round 6d).

The reference's users ran warehouse-style analytical SQL alongside CEP
(SURVEY §2.2–§2.7); Q1/Q3/Q5/Q10/Q18 are already covered elsewhere
(aggregates.py, joins.py). This module completes the TPC-H shape
catalogue with the remaining queries that this fixture's schema can
express — adapted where the fixture lacks a column (no partsupp table,
no l_commitdate/l_receiptdate/l_shipmode, no c_phone/p_container):
lateness is derived from l_shipdate vs o_orderdate, supply cost from
p_retailprice, and country codes from c_nationkey. Each adaptation is
noted in the docstring.

Scale posture (the whole point of the pack): every query is declared
as plain DataFrame joins/aggregates so Catalyst keeps the classic
TPC-H plan shapes — selective filters pushed to the parquet scans,
dimension chains broadcast under AQE's size rules (no forced hints),
fact⋈fact shuffles on the join key only, top-k via
TakeOrderedAndProject, and EXISTS/NOT-EXISTS as left-semi/anti joins.

Float discipline (registry standing rules): money in exact integer
cents / 1e-4 units so partial-aggregation order cannot flip the
driver's value hash; ratios computed from exact integer numerator and
denominator, divided and rounded(6) identically on both sides;
threshold comparisons (Q17's 0.2·avg, Q22's avg balance) rewritten as
exact integer cross-multiplications so borderline membership is
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.registry import register


def _rev_e4() -> "F.Column":
    """extendedprice·(1−discount) in exact 1e-4 units: cents × percent
    points, both integral by fixture construction."""
    return (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round((1 - F.col("l_discount")) * 100).cast("long")
    )


_REV_E4_SQL = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * CAST(round((1 - l_discount) * 100) AS BIGINT)"
)


@register(
    "tpch_q4",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY priority
    ORDER BY priority
    """,
)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking), adapted: the fixture has no
    l_commitdate/l_receiptdate, so "late" = shipped more than 30 days
    after the order date. Orders in a one-quarter window counted per
    priority when ANY lineitem shipped late — an EXISTS, which Spark
    plans as a left-semi join on l_orderkey (never multiplies rows, so
    no distinct needed). The quarter filter pushes to the orders scan;
    the semi join shuffles on orderkey only."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("priority")
    )


@register(
    "tpch_q6",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * CAST(round(l_discount * 100) AS BIGINT))
                AS BIGINT) AS revenue_e4,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): pure scan-filter-agg, the
    query that exists to prove predicate pushdown — all three filters
    reach the parquet scan (PushedFilters), ReadSchema is 4 columns,
    and the global sum is a map-side partial + 1-row exchange. The
    discount band is compared in exact integer percent points
    (round(d·100) BETWEEN 5 AND 7) so float representation of 0.05
    cannot flip membership between engines."""
    li = table(spark, sf_dir, "lineitem")
    disc_pp = F.round(F.col("l_discount") * 100).cast("long")
    disc_rev = F.round(F.col("l_extendedprice") * 100).cast("long") * disc_pp
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & disc_pp.between(5, 7)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(disc_rev).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q7",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(sum({rev}) AS BIGINT) AS revenue_e4
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey  = o.o_custkey
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, ship_year
    ORDER BY supp_nation, cust_nation, ship_year
    """.replace("{rev}", _REV_E4_SQL),
)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue between a nation PAIR in
    both directions, per ship year. Two independent nation lookups
    (customer's and supplier's) — both dimension joins broadcast; the
    pair predicate is applied AFTER both joins (it references both
    sides) but the two-year shipdate filter pushes to the lineitem
    scan. The only shuffles are the two fact joins on orderkey and
    the final 3-key aggregate."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(cn, F.col("cn_key") == c.c_nationkey)
        .join(sn, F.col("sn_key") == s.s_nationkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(F.sum(_rev_e4()).alias("revenue_e4"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@register(
    "tpch_q8",
    oracle="""
    WITH base AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
             CASE WHEN sn.n_name = 'NATION_3' THEN {rev} ELSE 0 END
               AS nat_rev_e4,
             {rev} AS rev_e4
      FROM lineitem l
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey  = o.o_custkey
      JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey  = cn.n_regionkey
      JOIN supplier s ON s.s_suppkey  = l.l_suppkey
      JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
      JOIN part p     ON p.p_partkey  = l.l_partkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT order_year,
           round(CAST(CAST(sum(nat_rev_e4) AS BIGINT) AS DOUBLE)
                 / CAST(CAST(sum(rev_e4) AS BIGINT) AS DOUBLE), 6)
             AS mkt_share
    FROM base
    GROUP BY order_year
    ORDER BY order_year
    """.replace("{rev}", _REV_E4_SQL),
)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_3's share of PROMO-part
    revenue sold into ASIA customers, per order year. Both the share's
    numerator and denominator accumulate as exact 1e-4 integers inside
    ONE aggregate (conditional sum — no second pass over the facts),
    and only the final division is floating, rounded(6) on both
    engines. Dimension chain (region→nation, part-type filter,
    supplier→nation) broadcasts; facts shuffle on orderkey once."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = _rev_e4()
    nat_rev = F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(F.lit(0))
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(cn, F.col("cn_key") == c.c_nationkey)
        .join(r, r.r_regionkey == F.col("cn_region"))
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(sn, F.col("sn_key") == s.s_nationkey)
        .join(p, p.p_partkey == li.l_partkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.round(
                F.sum(nat_rev).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("order_year")
    )


@register(
    "tpch_q9",
    oracle="""
    SELECT sn.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS order_year,
           CAST(sum({rev}
                    - CAST(round(p.p_retailprice * 100) AS BIGINT) * 50
                      * CAST(l.l_quantity AS BIGINT))
                AS BIGINT) AS profit_e4
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
    JOIN part p     ON p.p_partkey  = l.l_partkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, order_year
    ORDER BY nation, order_year DESC
    """.replace("{rev}", _REV_E4_SQL),
)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit), adapted: the fixture has no
    partsupp/ps_supplycost, so unit cost is proxied as half the part's
    retail price. Profit per (supplier nation, order year) over parts
    named like '%gear%'. Cost in the same exact 1e-4 units as revenue
    (retail cents × 50 × integral quantity), so the whole measure sums
    as BIGINT. The name filter prunes part before its join; at real SF
    the filtered part side broadcasts under AQE."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    cost = (
        F.round(F.col("p_retailprice") * 100).cast("long")
        * F.lit(50)
        * F.col("l_quantity").cast("long")
    )
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(n, n.n_nationkey == s.s_nationkey)
        .join(p, p.p_partkey == li.l_partkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(F.sum(_rev_e4() - cost).alias("profit_e4"))
        .orderBy("nation", F.desc("order_year"))
    )


@register(
    "tpch_q12",
    oracle="""
    SELECT CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30
                THEN 'FAST' ELSE 'SLOW' END AS ship_bucket,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY ship_bucket
    ORDER BY ship_bucket
    """,
)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping-priority classes), adapted: no l_shipmode in
    the fixture, so lines bucket by ship latency (≤30 days = FAST)
    instead; the payload — counting urgent-vs-other order lines per
    bucket — is unchanged. One fact⋈fact join on orderkey; both
    conditional counts come out of a single aggregate pass. Midnight
    timestamps make day-diff semantics identical across engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    o = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .groupBy(
            F.when(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30,
                "FAST",
            )
            .otherwise("SLOW")
            .alias("ship_bucket")
        )
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


@register(
    "tpch_q13",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey,
             count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(count(*) AS BIGINT) AS custdist
    FROM per_cust
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution), adapted: the
    original excludes orders by a comment pattern; the fixture has no
    o_comment, so non-urgent orders stand in. The signature plan is
    the LEFT join with the filter in the JOIN condition (customers
    with zero qualifying orders must appear with c_count=0), then a
    double aggregation: per-customer count (shuffle on custkey),
    re-grouped into a histogram over the tiny c_count domain."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q14",
    oracle="""
    SELECT round(100.0 * CAST(CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                   THEN {rev} ELSE 0 END) AS BIGINT) AS DOUBLE)
                 / CAST(CAST(sum({rev}) AS BIGINT) AS DOUBLE), 6)
             AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """.replace("{rev}", _REV_E4_SQL),
)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percent of one month's revenue
    from PROMO-type parts. Same conditional-sum-in-one-pass shape as
    Q8 — numerator and denominator are exact 1e-4 integers out of a
    single aggregate, the only float is the final rounded division.
    The month filter pushes to the lineitem scan; part joins on
    partkey (broadcast at dim scale under AQE)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01")
        & (F.col("l_shipdate") < "1996-10-01")
    )
    p = table(spark, sf_dir, "part")
    rev = _rev_e4()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return li.join(p, p.p_partkey == li.l_partkey).agg(
        F.round(
            F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


@register(
    "tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum({rev}) AS BIGINT) AS total_revenue_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue_e4
    FROM revenue r
    JOIN supplier s ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue_e4 = (SELECT max(total_revenue_e4) FROM revenue)
    ORDER BY s.s_suppkey
    """.replace("{rev}", _REV_E4_SQL),
)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) with the maximum quarterly
    revenue. Revenue accumulates as exact 1e-4 integers so the
    max-equality predicate — the part of Q15 that is flaky under
    float summation — is bit-exact on both engines. The max arrives
    as a broadcast 1-row aggregate (documented bounded collect-free
    pattern); Spark computes `revenue` once per branch but both
    branches are one map-side-combined pass over a quarter of
    lineitem. No window, no global sort — only the final orderBy on
    the (tiny) winner set."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_e4()).alias("total_revenue_e4")
    )
    mx = revenue.agg(F.max("total_revenue_e4").alias("mx"))
    s = table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(mx), F.col("total_revenue_e4") == F.col("mx"))
        .join(s, s.s_suppkey == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue_e4")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22, 25)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size
    """,
)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship), adapted: no partsupp,
    so the supplier-part relation is derived from lineitem; no
    s_comment, so "complaint" suppliers are those with negative
    account balance, excluded via NOT IN → left-anti join (the
    excluded set is dimension-sized and broadcasts). count(DISTINCT
    suppkey) per (brand, type, size) expands to Spark's two-phase
    distinct aggregate — partial de-dup before the shuffle."""
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22, 25)
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, p.p_partkey == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q17",
    oracle="""
    WITH part_qty AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS small_qty_cents,
           CAST(count(*) AS BIGINT) AS n_small
    FROM lineitem l
    JOIN part_qty q ON q.l_partkey = l.l_partkey
    JOIN part p     ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND CAST(l.l_quantity AS BIGINT) * 5 * q.n_lines < q.sum_qty
    """,
)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue from lineitems
    whose quantity is below 20% of their part's average. The
    correlated scalar subquery is decorrelated into one per-part
    aggregate joined back on partkey (Spark and modern optimizers do
    exactly this rewrite); the threshold `qty < 0.2·avg` is
    cross-multiplied into the exact integer test `5·qty·n < sum_qty`
    (quantities integral, n > 0), so borderline rows cannot straddle a
    float boundary. Per-part stats are computed over ALL lineitems (as
    the correlated original does) and the brand filter narrows only
    the outer scan."""
    li = table(spark, sf_dir, "lineitem")
    part_qty = li.groupBy(F.col("l_partkey").alias("q_partkey")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    return (
        li.join(part_qty, F.col("q_partkey") == li.l_partkey)
        .join(p, p.p_partkey == li.l_partkey)
        .filter(
            F.col("l_quantity").cast("long") * 5 * F.col("n_lines")
            < F.col("sum_qty")
        )
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "small_qty_cents"
            ),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "tpch_q19",
    oracle="""
    SELECT CAST(sum({rev}) AS BIGINT) AS revenue_e4,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#2'  AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#24' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """.replace("{rev}", _REV_E4_SQL),
)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue), adapted: no p_container, so each
    disjunct is (brand, size range, quantity range). The point of Q19
    is the OR-of-conjunctions join predicate: Spark keeps it an
    equi-join on partkey with the disjunction as a post-join filter,
    and pushes the derivable single-side implications (brand/size on
    part) into the scans where possible. One aggregate row out."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(p, p.p_partkey == li.l_partkey)
        .filter(cond)
        .agg(
            F.sum(_rev_e4()).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q20",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        AND l.l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE '%bolt%')
      GROUP BY l.l_suppkey
      HAVING sum(CAST(l.l_quantity AS BIGINT)) > 300
    )
    ORDER BY s.s_suppkey
    """,
)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion), adapted: no partsupp
    (whose available-quantity threshold the original compares), so the
    promotion candidates are suppliers who shipped more than 300 units
    of '%bolt%' parts in 1996. Plan: part-name filter → semi join
    prunes lineitem rows, per-supplier quantity sum with HAVING, then
    a semi join into supplier — the qualifying-supplier set is tiny
    and broadcasts."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    bolts = table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    heavy = (
        li.join(bolts, bolts.p_partkey == li.l_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .filter(F.col("qty") > 300)
    )
    s = table(spark, sf_dir, "supplier")
    return (
        s.join(heavy, heavy.l_suppkey == s.s_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q21",
    oracle="""
    WITH lo AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ), per_order AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late,
             min(CASE WHEN late = 1 THEN l_suppkey END) AS late_supp
      FROM lo GROUP BY l_orderkey
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM per_order po
    JOIN supplier s ON s.s_suppkey = po.late_supp
    WHERE po.n_supp >= 2 AND po.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), adapted: "late" =
    shipped over 60 days after the order date (no receipt/commit
    dates). The textbook spelling is EXISTS(other supplier) AND NOT
    EXISTS(other late supplier) — two correlated self-joins of
    lineitem. This plan collapses both into ONE per-order aggregate:
    an order contributes iff it has ≥2 distinct suppliers and exactly
    one distinct late supplier (min() then names the unique culprit —
    same set semantics, no self-join). One orderkey shuffle instead of
    three; the supplier join broadcasts; top-20 via
    TakeOrderedAndProject."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
        F.col("l_suppkey"),
    )
    per_order = (
        li.join(o, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(late).alias("n_late"),
            F.min(late).alias("late_supp"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
    )
    s = table(spark, sf_dir, "supplier")
    return (
        per_order.join(s, s.s_suppkey == F.col("late_supp"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "tpch_q22",
    oracle="""
    WITH pos AS (
      SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS sum_pos,
             CAST(count(*) AS BIGINT) AS n_pos
      FROM customer
      WHERE c_acctbal > 0
        AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    )
    SELECT CAST(c.c_nationkey AS BIGINT) AS cntry,
           CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
             AS totacctbal_cents
    FROM customer c, pos
    WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND CAST(round(c.c_acctbal * 100) AS BIGINT) * pos.n_pos > pos.sum_pos
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY cntry
    ORDER BY cntry
    """,
)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted twice: no c_phone,
    so the "country code" is c_nationkey over a 7-nation allowlist;
    and every fixture customer has SOME order, so "lapsed" = no order
    since 1999 (the original's no-orders-at-all test is vacuous here —
    same NOT-EXISTS shape, shifted predicate). Customers with
    above-average positive balance and no recent order, counted per
    country. The avg threshold is exact: `bal·n > sum` in integer
    cents (cross-multiplied, no float division); the average's inputs
    arrive as a broadcast 1-row aggregate; the no-recent-orders test
    is a left-anti join on custkey (the original's NOT EXISTS), with
    the date filter pushed to the orders scan before the anti join."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    c = table(spark, sf_dir, "customer").filter(F.col("c_nationkey").isin(nations))
    bal_cents = F.round(F.col("c_acctbal") * 100).cast("long")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal_cents).alias("sum_pos"), F.count(F.lit(1)).alias("n_pos")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left_anti")
        .join(F.broadcast(pos))
        .filter(bal_cents * F.col("n_pos") > F.col("sum_pos"))
        .groupBy(F.col("c_nationkey").cast("long").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal_cents).alias("totacctbal_cents"),
        )
        .orderBy("cntry")
    )


@register(
    "tpch_q2",
    oracle="""
    WITH asup AS (
      SELECT s.s_suppkey, s.s_name,
             CAST(round(s.s_acctbal * 100) AS BIGINT) AS bal_cents,
             n.n_name
      FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
    ),
    rel AS (
      SELECT DISTINCT l.l_partkey, l.l_suppkey FROM lineitem l
    ),
    cand AS (
      SELECT p.p_partkey, a.s_suppkey, a.s_name, a.n_name, a.bal_cents
      FROM part p
      JOIN rel ON rel.l_partkey = p.p_partkey
      JOIN asup a ON a.s_suppkey = rel.l_suppkey
      WHERE p.p_type = 'LARGE' AND p.p_size <= 10
    ),
    best AS (
      SELECT p_partkey, min(bal_cents) AS min_bal
      FROM cand GROUP BY p_partkey
    )
    SELECT c.bal_cents AS s_acctbal_cents, c.s_name, c.n_name, c.p_partkey
    FROM cand c JOIN best b
      ON b.p_partkey = c.p_partkey AND c.bal_cents = b.min_bal
    ORDER BY s_acctbal_cents DESC, c.n_name, c.s_name, c.p_partkey
    LIMIT 100
    """,
)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted: no partsupp, so the
    supplier-part relation derives from lineitem and the minimized
    "cost" is the supplier's account balance (the fixture's only
    per-supplier economic attribute). For each LARGE small-size part,
    the ASIA supplier(s) with the minimal balance. The correlated
    MIN subquery decorrelates into a per-part aggregate joined back
    on exact integer cents equality (the float-flaky part of Q2 made
    exact); the region-filtered supplier side is dimension-sized and
    broadcasts; top-100 via TakeOrderedAndProject on a total order."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asup = (
        s.join(n, n.n_nationkey == s.s_nationkey)
        .join(r, r.r_regionkey == n.n_regionkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("s_acctbal") * 100).cast("long").alias("bal_cents"),
            "n_name",
        )
    )
    rel = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    cand = (
        p.join(rel, rel.l_partkey == p.p_partkey)
        .join(asup, asup.s_suppkey == rel.l_suppkey)
        .select("p_partkey", "s_name", "n_name", "bal_cents")
    )
    best = cand.groupBy(F.col("p_partkey").alias("b_partkey")).agg(
        F.min("bal_cents").alias("min_bal")
    )
    return (
        cand.join(
            best,
            (F.col("b_partkey") == cand.p_partkey)
            & (F.col("bal_cents") == F.col("min_bal")),
        )
        .select(
            F.col("bal_cents").alias("s_acctbal_cents"),
            "s_name",
            "n_name",
            "p_partkey",
        )
        .orderBy(F.desc("s_acctbal_cents"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q11",
    oracle="""
    WITH asup AS (
      SELECT s.s_suppkey FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
    ),
    pv AS (
      SELECT l.l_partkey,
             sum(CAST(round(p.p_retailprice * 100) AS BIGINT)
                 * CAST(l.l_quantity AS BIGINT)) AS value_cents
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_suppkey IN (SELECT s_suppkey FROM asup)
      GROUP BY l.l_partkey
    ),
    tot AS (SELECT sum(value_cents) AS total FROM pv)
    SELECT pv.l_partkey AS p_partkey,
           CAST(pv.value_cents AS BIGINT) AS value_cents
    FROM pv, tot
    WHERE pv.value_cents * 1000 > tot.total
    ORDER BY value_cents DESC, p_partkey
    """,
)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification), adapted: no
    partsupp, so a part's held value is proxied by what ASIA's
    suppliers shipped of it (retail cents × quantity, exact
    integers). Parts whose value exceeds 0.1% of the regional total —
    the original's scalar-subquery fraction test, cross-multiplied
    into exact integer arithmetic (value·1000 > total) so borderline
    parts cannot straddle a float threshold. The supplier allowlist
    is a broadcast semi join; the total arrives as a broadcast 1-row
    aggregate over the (already small) per-part value table."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asup = (
        s.join(n, n.n_nationkey == s.s_nationkey)
        .join(r, r.r_regionkey == n.n_regionkey)
        .select("s_suppkey")
    )
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    val = (
        F.round(F.col("p_retailprice") * 100).cast("long")
        * F.col("l_quantity").cast("long")
    )
    pv = (
        li.join(asup, asup.s_suppkey == li.l_suppkey, "left_semi")
        .join(p, p.p_partkey == li.l_partkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(val).alias("value_cents"))
    )
    tot = pv.agg(F.sum("value_cents").alias("total"))
    return (
        pv.join(F.broadcast(tot))
        .filter(F.col("value_cents") * 1000 > F.col("total"))
        .select("p_partkey", "value_cents")
        .orderBy(F.desc("value_cents"), "p_partkey")
    )
