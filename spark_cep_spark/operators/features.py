"""ML feature-engineering and dataset-profiling operators (round 6d).

A training-data pipeline at 100 TB does more than dedup/filter: it
builds model-ready features (categorical encodings) and publishes
dataset profiles (per-column statistics for the dataset card / drift
baseline). These are one-pass aggregate shapes — the profiling unpivot
touches each row once, and the target encoder is a dimension-sized
aggregate joined back under AQE's broadcast rules.

Float discipline: money in exact cents; the leave-one-out division is
the only float and is rounded(6) identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.registry import register


@register(
    "feat_target_encode",
    oracle="""
    WITH seg AS (
      SELECT c_mktsegment,
             CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS sum_cents,
             CAST(count(*) AS BIGINT) AS n
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c.c_custkey,
           c.c_mktsegment AS segment,
           CASE WHEN s.n > 1
                THEN round(CAST(s.sum_cents
                                - CAST(round(c.c_acctbal * 100) AS BIGINT)
                                AS DOUBLE) / (s.n - 1) / 100.0, 6)
                END AS loo_mean_acctbal
    FROM customer c
    JOIN seg s ON s.c_mktsegment = c.c_mktsegment
    ORDER BY c.c_custkey
    """,
)
def feat_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding (the standard leakage-free
    categorical encoder for gradient-boosted / linear models): each
    customer's segment is encoded as the mean account balance of the
    OTHER customers in that segment — (sum − own)/(n − 1), NULL for a
    singleton category. One dimension-sized aggregate (5 segments)
    joined back — broadcast under AQE, no second fact shuffle; the
    sums accumulate in exact cents so the single rounded division is
    the only float on both engines. At 100 TB the category aggregate
    is k rows regardless of fact size."""
    c = table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    seg = c.groupBy("c_mktsegment").agg(
        F.sum(cents).alias("sum_cents"), F.count(F.lit(1)).alias("n")
    )
    return (
        c.join(seg, "c_mktsegment")
        .select(
            "c_custkey",
            F.col("c_mktsegment").alias("segment"),
            F.when(
                F.col("n") > 1,
                F.round(
                    (F.col("sum_cents") - cents).cast("double")
                    / (F.col("n") - 1)
                    / 100.0,
                    6,
                ),
            ).alias("loo_mean_acctbal"),
        )
        .orderBy("c_custkey")
    )


@register(
    "profile_columns",
    oracle="""
    SELECT 'o_totalprice' AS col,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) - count(o_totalprice) AS BIGINT) AS n_null,
           CAST(count(DISTINCT o_totalprice) AS BIGINT) AS n_distinct,
           min(o_totalprice) AS min_v, max(o_totalprice) AS max_v
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_orderkey', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(o_orderkey) AS BIGINT),
           CAST(count(DISTINCT o_orderkey) AS BIGINT),
           CAST(min(o_orderkey) AS DOUBLE), CAST(max(o_orderkey) AS DOUBLE)
    FROM orders
    ORDER BY col
    """,
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling (the per-column statistics block of a dataset
    card / drift baseline): row count, null count, distinct count,
    min/max for each profiled column — computed in ONE aggregation
    pass over the table (all columns' aggregates in a single agg, so
    one scan and one 1-row exchange) and unpivoted to a (col, stats)
    row per column with `stack`. min/max are order-insensitive and
    exact; counts are BIGINT — no float accumulation anywhere. The
    oracle spells the same numbers as a per-column UNION ALL."""
    o = table(spark, sf_dir, "orders")
    cols = ["o_totalprice", "o_custkey", "o_orderkey"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(F.col(c).cast("double")).alias(f"{c}__mn"),
            F.max(F.col(c).cast("double")).alias(f"{c}__mx"),
        ]
    one = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nn, {c}__nd, {c}__mn, {c}__mx" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col, n, n_null, n_distinct, min_v, max_v)"
    ).orderBy("col")


@register(
    "feat_scale",
    oracle="""
    WITH e AS (
      SELECT event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE value IS NOT NULL AND abs(value) <= 1e9
        AND event_type IS NOT NULL
    ),
    st AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(min(cents) AS BIGINT) AS mn,
             CAST(max(cents) AS BIGINT) AS mx,
             CAST(sum(cents) AS BIGINT) AS s,
             -- widen the OPERAND, not the sum: DuckDB BIGINT*BIGINT
             -- products raise on overflow (sums widen, products do
             -- not) — the rollup_wow convention (review catch)
             sum(CAST(cents AS HUGEINT) * cents) AS s2
      FROM e GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round(e.cents / 100.0, 2) AS value,
           CASE WHEN st.mx > st.mn
                THEN round((e.cents - st.mn) * 1.0 / (st.mx - st.mn), 6)
                     + 0.0
                ELSE 0.0 END AS minmax,
           CASE WHEN st.n >= 2
                AND st.n * st.s2 > CAST(st.s AS HUGEINT) * st.s
                THEN round((CAST(st.n AS DOUBLE) * e.cents - st.s)
                           / sqrt(CAST(st.n AS DOUBLE)
                                  * (CAST(st.n AS DOUBLE)
                                     * CAST(st.s2 AS DOUBLE)
                                     - CAST(st.s AS DOUBLE)
                                       * CAST(st.s AS DOUBLE))),
                           6) + 0.0
                ELSE 0.0 END AS zscore
    FROM e JOIN st USING (event_type)
    """,
)
def feat_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature scaling — the two standard normalizations a
    feature pipeline applies before any model: min-max to [0, 1] and
    the population z-score, each computed against the row's
    event_type group. Degenerate groups (constant value, or n < 2 for
    the z-score) emit 0.0 — the conventional neutral encoding.

    Exact-arithmetic discipline: all moments are exact integers in
    cents (the quadratic sum as decimal(38,0)/HUGEINT — the
    agg_regression lesson), and the z-score is algebraically
    rearranged so the ONLY float operations are one sqrt of an exact
    integer expression and one division, spelled identically on both
    engines: z = (n*x - s) / sqrt(n * (n*s2 - s^2)). Both outputs are
    rounded 6dp with signed zero folded (+ 0.0, RULE 4 — a value at
    the group mean rounds to zero from either side).

    100 TB shape: one map-side-combinable group aggregate over a
    dimension-sized key (event types), broadcast back to the fact
    scan by AQE — the classic stats-then-scale two-pass, no window
    anywhere."""
    e = (
        table(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & (F.abs("value") <= 1e9)
            & F.col("event_type").isNotNull()
        )
        .select(
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    st = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("cents").cast("long").alias("mn"),
        F.max("cents").cast("long").alias("mx"),
        F.sum("cents").cast("long").alias("s"),
        F.sum(
            F.col("cents").cast("decimal(38,0)") * F.col("cents")
        ).alias("s2"),
    )
    n, mn, mx, s, s2 = (F.col(c) for c in ("n", "mn", "mx", "s", "s2"))
    c = F.col("cents")
    minmax = F.when(
        mx > mn,
        F.round((c - mn) * 1.0 / (mx - mn), 6) + F.lit(0.0),
    ).otherwise(F.lit(0.0))
    var_num = (
        n.cast("decimal(38,0)") * s2
        - s.cast("decimal(38,0)") * s.cast("decimal(38,0)")
    )
    # numerator in DOUBLE on both engines: n x cents overflows int64
    # once n reaches ~1e8 rows per group (identical IEEE ops keep the
    # two engines bit-aligned; the z-score is a float anyway)
    z = F.when(
        (n >= 2) & (var_num > 0),
        F.round(
            (n.cast("double") * c - s)
            / F.sqrt(
                n.cast("double")
                * (
                    n.cast("double") * s2.cast("double")
                    - s.cast("double") * s.cast("double")
                )
            ),
            6,
        )
        + F.lit(0.0),
    ).otherwise(F.lit(0.0))
    return e.join(st, "event_type").select(
        "event_id",
        "event_type",
        F.round(c / 100.0, 2).alias("value"),
        minmax.alias("minmax"),
        z.alias("zscore"),
    )


@register(
    "profile_expectations",
    oracle="""
    WITH li AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS null_rflag,
             CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                           THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty,
             CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS neg_price,
             CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc
      FROM lineitem
    ),
    od AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
               AS dup_keys,
             CAST(sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P')
                           THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
      FROM orders
    ),
    fk AS (
      SELECT CAST(count(*) AS BIGINT) AS orphans,
             (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_custkey IS NULL
    )
    SELECT * FROM (
      SELECT 'completeness_l_returnflag' AS check_name,
             'lineitem' AS target, n AS n_rows,
             null_rflag AS n_bad, null_rflag = 0 AS pass FROM li
      UNION ALL
      SELECT 'range_l_quantity_1_50', 'lineitem', n, bad_qty,
             bad_qty = 0 FROM li
      UNION ALL
      SELECT 'non_negative_l_extendedprice', 'lineitem', n, neg_price,
             neg_price = 0 FROM li
      UNION ALL
      SELECT 'range_l_discount_0_1', 'lineitem', n, bad_disc,
             bad_disc = 0 FROM li
      UNION ALL
      SELECT 'unique_o_orderkey', 'orders', n, dup_keys,
             dup_keys = 0 FROM od
      UNION ALL
      SELECT 'accepted_values_o_orderstatus', 'orders', n, bad_status,
             bad_status = 0 FROM od
      UNION ALL
      SELECT 'fk_orders_customer', 'orders', n, orphans,
             orphans = 0 FROM fk
    )
    """,
)
def profile_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative data-quality constraint suite (Schelter
    et al 2018, VLDB — public Deequ/dbt-test shape): completeness,
    uniqueness, accepted-values, range, cross-column ordering, and
    referential-integrity checks evaluated as ONE row per check with
    the violation count and verdict — the publish gate a warehouse
    runs before promoting a batch, completing the profiling trio
    (profile_columns: stats, profile_skew: key distribution, this:
    constraints).

    100 TB shape: all per-table checks for one table fold into ONE
    map-side-combinable aggregation over that table (never one scan
    per check — Deequ's core trick); the FK check is one left-anti
    count whose build side is the dimension; the final UNION is 7
    one-row frames.  Counts are exact BIGINTs — no floats anywhere."""
    li = table(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("l_returnflag").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("null_rflag"),
        F.sum(
            F.when(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("bad_qty"),
        F.sum(F.when(F.col("l_extendedprice") < 0, 1).otherwise(0))
        .cast("long")
        .alias("neg_price"),
        F.sum(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("bad_disc"),
    )
    od = table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey")))
        .cast("long")
        .alias("dup_keys"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("F", "O", "P"), 1)
            .otherwise(0)
        )
        .cast("long")
        .alias("bad_status"),
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select("c_custkey")
    fk = (
        orders.join(
            F.broadcast(cust),
            orders["o_custkey"] == cust["c_custkey"],
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("orphans"))
        .crossJoin(
            orders.agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
    )

    def row(src, name, target, bad_col):
        return src.select(
            F.lit(name).alias("check_name"),
            F.lit(target).alias("target"),
            F.col("n").alias("n_rows"),
            F.col(bad_col).alias("n_bad"),
            (F.col(bad_col) == 0).alias("pass"),
        )

    out = row(li, "completeness_l_returnflag", "lineitem", "null_rflag")
    for src, name, target, col in (
        (li, "range_l_quantity_1_50", "lineitem", "bad_qty"),
        (li, "non_negative_l_extendedprice", "lineitem", "neg_price"),
        (li, "range_l_discount_0_1", "lineitem", "bad_disc"),
        (od, "unique_o_orderkey", "orders", "dup_keys"),
        (od, "accepted_values_o_orderstatus", "orders", "bad_status"),
        (fk, "fk_orders_customer", "orders", "orphans"),
    ):
        out = out.unionByName(row(src, name, target, col))
    return out


@register(
    "feat_hashed_cross",
    oracle="""
    WITH x AS (
      SELECT c.c_custkey,
             coalesce(c.c_mktsegment, '') AS seg,
             coalesce(n.n_name, '') AS nat,
             coalesce(c.c_mktsegment, '') || '|' ||
               coalesce(n.n_name, '') AS crossed
      FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    )
    SELECT c_custkey, seg, nat,
           CAST(CAST('0x' || substr(md5(crossed), 1, 6) AS INTEGER) % 64
                AS BIGINT) AS cross_bucket
    FROM x
    """,
)
def feat_hashed_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed feature cross (the wide-and-deep trick, Cheng et al
    2016): the (market segment x nation) categorical pair hashed into
    64 buckets — the standard way to feed pairwise interactions to a
    linear tower without materializing the |A| x |B| vocabulary.
    md5-prefix bucketing (the _hash_bucket / text_feat_hash
    convention) keeps the assignment engine-portable and exactly
    reproducible; NULL categories fold to '' so the cross is total.

    100 TB shape: one broadcast dimension join (nation is tiny) + one
    codegen projection — no shuffle beyond the join, no vocabulary
    state anywhere (that absence is the hashing trick's point); the
    bucket count is a config, collisions are the accepted trade."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    seg = F.coalesce(F.col("c_mktsegment"), F.lit(""))
    nat = F.coalesce(F.col("n_name"), F.lit(""))
    crossed = F.concat(seg, F.lit("|"), nat)
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .select(
            "c_custkey",
            seg.alias("seg"),
            nat.alias("nat"),
            (
                F.conv(F.substring(F.md5(crossed), 1, 6), 16, 10)
                .cast("long")
                % 64
            ).alias("cross_bucket"),
        )
    )
