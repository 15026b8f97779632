"""Aggregation operators (SURVEY §2.4).

Spark performs partial (map-side) + final aggregation automatically for
all of these — the 100 TB posture is simply "groupBy on the natural key
and let AQE coalesce"; no manual combiners.

Float discipline: accumulated aggregates (sum/avg/stddev/...) are
rounded identically on both sides so engine summation order can't flip
the driver's value hash. Counts / min / max are exact and left alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.operators.grouped import keyed_partition_apply
from spark_cep_spark.registry import register


@register(
    "agg_global",
    oracle="""
    SELECT count(*) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           min(l_shipdate) AS min_ship,
           max(l_shipdate) AS max_ship
    FROM lineitem
    """,
)
def agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate — single-row result, partials per partition."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@register(
    "agg_group",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — the bench `q1_pricing_summary`.

    Hash aggregate over 2 low-cardinality keys; at 100 TB this is the
    ideal Spark shape: map-side partials shrink 600M+ rows/task to 6
    groups before the (tiny) shuffle.
    """
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_cust,
           CAST(sum(DISTINCT o_custkey) AS BIGINT) AS sum_cust,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT/SUM DISTINCT — Spark expands to a two-phase aggregate."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.sum_distinct(F.col("o_custkey")).alias("sum_cust"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register("agg_approx")  # approximate — no exact oracle → rows-only
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct counting. Sketches merge
    associatively, so this is the 100 TB-friendly distinct count (no
    two-phase distinct shuffle). Accuracy asserted in tests vs exact."""
    e = table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS rflag,
           coalesce(l_linestatus, 'ALL') AS lstat,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (hierarchical grouping sets). Subtotal rows are surfaced
    via COALESCE markers (group columns are non-null in the fixture)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("rflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("lstat"),
            "sum_qty",
            "n",
        )
    )


@register(
    "agg_stats",
    oracle="""
    SELECT event_type,
           round(stddev_samp(value), 6) AS sd_value,
           round(var_samp(value), 6) AS var_value,
           round(corr(value, CAST(user_id AS DOUBLE)), 6) AS corr_vu,
           round(covar_samp(value, CAST(user_id AS DOUBLE)), 6) AS covar_vu,
           round(quantile_cont(value, 0.5), 6) AS median_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates. Spark's exact `percentile` uses the same
    linear interpolation as DuckDB's quantile_cont."""
    e = table(spark, sf_dir, "events")
    u = F.col("user_id").cast("double")
    return e.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 6).alias("sd_value"),
        F.round(F.var_samp("value"), 6).alias("var_value"),
        F.round(F.corr(F.col("value"), u), 6).alias("corr_vu"),
        F.round(F.covar_samp(F.col("value"), u), 6).alias("covar_vu"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
    )


@register(
    "agg_collect",
    oracle="""
    SELECT l_orderkey,
           array_to_string(list(l_linenumber ORDER BY l_linenumber), ',')
             AS line_numbers,
           count(*) AS n_lines
    FROM lineitem
    GROUP BY l_orderkey
    """,
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list wrapped in sort_array — Spark's collect order is
    partition-dependent, sorting makes it deterministic (SURVEY §5).
    The list is emitted as a canonical comma-joined STRING: the driver's
    value-hasher cannot canonicalize array-typed output columns
    (round-1 ERR), and the string keeps the collect+sort exercise while
    staying hashable on both engines."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.sort_array(F.collect_list("l_linenumber")).cast("array<string>"), ","
        ).alias("line_numbers"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "having",
    oracle="""
    SELECT c_nationkey AS nk, count(*) AS n_cust, round(sum(c_acctbal), 2) AS bal
    FROM customer
    GROUP BY c_nationkey
    HAVING count(*) >= 50
    """,
)
def having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING) — a filter above the aggregate
    node; Catalyst cannot push it below, which is the correct plan."""
    c = table(spark, sf_dir, "customer")
    return (
        c.groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("bal"),
        )
        .filter(F.col("n_cust") >= 50)
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT o_orderpriority,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
           count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
           count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: long→wide with explicit value list (explicit values keep
    the plan a single pass; omitting them adds a distinct-scan job)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )


@register(
    "fn_explode",
    oracle="""
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) AS pos,
           unnest(string_split(text, ' ')) AS tok
    FROM documents
    WHERE doc_id < 50
    """,
)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array→rows with 1-based position (generator output,
    stays in codegen — no Python)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "tok")


@register(
    "rollup_hypertable",
    oracle="""
    WITH t AS (
      SELECT CAST(ts AS DATE) AS day, CAST(hour(ts) AS INT) AS hr, value
      FROM events
    )
    SELECT day, hr,
           CAST(grouping_id(day, hr) AS BIGINT) AS lvl,
           count(*) AS n_events,
           round(sum(value), 2) AS total_value
    FROM t
    GROUP BY ROLLUP(day, hr)
    """,
)
def rollup_hypertable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup over the event hypertable: one pass emits
    hour-grain, day-grain, and grand-total aggregates (grouping_id
    disambiguates the levels — Spark and DuckDB share the bit
    convention). Spark expands the rollup map-side and partial-aggregates
    each grain before the single shuffle, so the exchange carries
    ~(days×25) rows regardless of input size — the materialized-rollup
    pattern for continuous dashboards at 100 TB."""
    e = table(spark, sf_dir, "events")
    t = e.select(
        F.to_date("ts").alias("day"),
        F.hour("ts").cast("int").alias("hr"),
        "value",
    )
    return t.rollup("day", "hr").agg(
        F.grouping_id().cast("bigint").alias("lvl"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(value / 50) AS BIGINT) AS bucket,
           count(*) AS n,
           round(sum(value), 2) AS total
    FROM events
    GROUP BY bucket
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value histogram with fixed-width buckets. The bucket expression
    is the SAME floor arithmetic in both engines (width_bucket-style
    builtins differ at boundary ulps across engines — identical
    arithmetic on identical doubles cannot). Map-side partial
    aggregation means the shuffle carries one row per bucket per task
    regardless of input size."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.floor(F.col("value") / 50).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("total"),
        )
    )


@register(
    "rollup_gapfill",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', ts) AS hr, count(*) AS n
      FROM events GROUP BY hr
    ),
    r AS (
      SELECT unnest(generate_series((SELECT min(hr) FROM b),
                                    (SELECT max(hr) FROM b),
                                    INTERVAL 1 HOUR)) AS hr
    )
    SELECT r.hr, coalesce(b.n, 0) AS n
    FROM r LEFT JOIN b ON b.hr = r.hr
    """,
)
def rollup_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series (the dashboard/hypertable staple:
    empty hours must appear as zeros, not missing rows). The hour
    spine is generated with sequence()+explode from the aggregated
    min/max — O(hours) rows broadcast to the left join, so the spine
    costs nothing at any scale; the only real shuffle is the hourly
    aggregate."""
    e = table(spark, sf_dir, "events")
    b = e.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        F.count(F.lit(1)).alias("n")
    )
    spine = (
        b.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hr")
        )
    )
    return spine.join(b, "hr", "left").select(
        "hr", F.coalesce("n", F.lit(0)).alias("n")
    )


@register("agg_sketches")  # rows-only: sketch estimates are approximate
def agg_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch aggregation (Datasketches HLL, Spark 3.5+):
    per-event_type distinct-user sketches UNIONED into a global
    estimate without rescanning — the 100 TB cardinality pattern
    (sketch once at the finest grain, roll up by merging binaries; an
    exact count(DISTINCT) re-shuffles raw keys at every grain).
    Approximate by nature → rows-only for the driver; the accuracy
    bound vs exact counts is asserted in tests/test_llm_ops.py."""
    e = table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.approx_count_distinct("user_id").alias("acd_users"),
        F.percentile_approx("value", 0.5).alias("p50_value"),
    )
    return (
        per_type.agg(
            F.hll_union_agg("sk").alias("merged"),
            F.sum(F.lit(1)).alias("n_types"),
        )
        .select(
            F.hll_sketch_estimate("merged").alias("est_total_users"),
            "n_types",
        )
    )


@register(
    "agg_unpivot",
    oracle="""
    SELECT p_partkey, metric, val
    FROM (
      UNPIVOT (SELECT p_partkey,
                      p_retailprice,
                      CAST(p_size AS DOUBLE) AS p_size
               FROM part)
      ON p_retailprice, p_size
      INTO NAME metric VALUE val
    )
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt — wide→long reshape (the inverse of agg_pivot):
    each part row becomes one row per measure column. Spark's unpivot
    is a zero-shuffle narrow transform (row expansion in the scan
    stage); at 100 TB it only multiplies row count, never shuffles."""
    p = table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_retailprice",
        F.col("p_size").cast("double").alias("p_size"),
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["p_retailprice", "p_size"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "agg_ohlc",
    oracle="""
    SELECT user_id,
           date_trunc('day', ts) AS day,
           arg_min(value, printf('%020d%012d', epoch_us(ts), event_id))
             AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, printf('%020d%012d', epoch_us(ts), event_id))
             AS close,
           count(*) AS volume,
           round(sum(value), 6) AS turnover
    FROM events
    GROUP BY user_id, date_trunc('day', ts)
    """,
)
def agg_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candle rollup (the time-series downsample every monitoring
    /finance pipeline runs): per user per day, the first/last values
    by (ts, event_id) via min_by/max_by over a struct ordering — exact
    arg_min/arg_max parity with deterministic tie-breaks — plus
    high/low/volume/turnover. The ordering key is a zero-padded
    (epoch-micros, event_id) string because DuckDB's arg_min cannot
    order by a struct — lexicographic on the padded string ≡ the
    (ts, id) sort, on both engines.

    100 TB shape: one partial-aggregated groupBy; min_by/max_by carry
    a single (value, key-struct) pair per group per partition, so the
    shuffle is group-count-bounded like any sum. This is the
    downsample-to-candles pattern that turns raw ticks into a
    1000×-smaller hypertable before further rollups."""
    e = table(spark, sf_dir, "events")
    key = F.format_string(
        "%020d%012d", F.unix_micros("ts"), F.col("event_id")
    )
    return e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count(F.lit(1)).alias("volume"),
        F.round(F.sum("value"), 6).alias("turnover"),
    )


@register(
    "agg_median",
    oracle="""
    SELECT l_returnflag,
           round(median(l_quantity), 6) AS med_qty,
           round(quantile_cont(l_quantity, 0.25), 6) AS q25,
           round(quantile_cont(l_quantity, 0.75), 6) AS q75,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median / interpolated percentiles per group — the exact
    twins of agg_approx's sketches (use these when the group count is
    small enough to afford a per-group sort; the approx path when it
    is not). Spark percentile() and DuckDB quantile_cont both
    linearly interpolate, so values match to rounding."""
    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("med_qty"),
        F.round(F.expr("percentile(l_quantity, 0.25)"), 6).alias("q25"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 6).alias("q75"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 6).alias(
            "p90_price"
        ),
    )


@register(
    "rollup_interpolate",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', ts) AS hr, event_type,
             round(sum(value), 2) AS v
      FROM events GROUP BY hr, event_type
    ),
    spine AS (
      SELECT unnest(generate_series((SELECT min(hr) FROM b),
                                    (SELECT max(hr) FROM b),
                                    INTERVAL 1 HOUR)) AS hr
    ),
    grid AS (
      SELECT s.hr, t.event_type, b.v,
             CAST(epoch(s.hr) // 3600 AS BIGINT) AS i
      FROM spine s
      CROSS JOIN (SELECT DISTINCT event_type FROM events) t
      LEFT JOIN b ON b.hr = s.hr AND b.event_type = t.event_type
    ),
    ctx AS (
      SELECT hr, event_type, v, i,
             last_value(v IGNORE NULLS) OVER w_prev AS pv,
             last_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS)
               OVER w_prev AS pi,
             first_value(v IGNORE NULLS) OVER w_next AS nv,
             first_value(CASE WHEN v IS NOT NULL THEN i END IGNORE NULLS)
               OVER w_next AS ni
      FROM grid
      WINDOW
        w_prev AS (PARTITION BY event_type ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        w_next AS (PARTITION BY event_type ORDER BY i
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT hr, event_type,
           -- exact integer interpolation: the endpoints have exactly 2
           -- decimals, so scaling to BIGINT centi-units and doing the
           -- line arithmetic in integers makes the single final double
           -- division bit-identical across engines (a round(double, 4)
           -- here diverged at a .xxxx5 boundary — caught at sf0.001)
           CASE WHEN v IS NOT NULL THEN v
                WHEN pv IS NOT NULL AND nv IS NOT NULL
                  THEN (CAST(round(pv * 100) AS BIGINT) * (ni - i)
                        + CAST(round(nv * 100) AS BIGINT) * (i - pi))
                       / (100.0 * (ni - pi))
                ELSE coalesce(pv, nv) END AS value_filled,
           CASE WHEN v IS NOT NULL THEN 'present'
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN 'interp'
                ELSE 'edge' END AS fill_kind
    FROM ctx
    """,
)
def rollup_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over a gap-filled hourly grid (the
    time-series `interpolate()` of hypertable engines): hours with no
    events for a given event_type get the straight line between the
    nearest observed hours (ties to the hourly sum rounded to cents —
    the module's established cross-engine float discipline); leading/
    trailing gaps carry the nearest edge value.

    100 TB shape: the hour x type spine is generated (never scanned),
    the hourly aggregate is the only data-sized shuffle, and the
    prev/next scan is two frame-bounded window passes partitioned by
    event_type — series count partitions the work, series length
    streams through each partition in hour order. The interpolation
    itself is pure arithmetic on two already-aggregated doubles, so
    both engines execute the identical IEEE expression."""
    e = table(spark, sf_dir, "events")
    # two consumers (spine min/max + the grid join) — persist so the
    # data-sized hourly aggregate computes once
    b = e.groupBy(
        F.date_trunc("hour", "ts").alias("hr"),
        "event_type",
    ).agg(F.round(F.sum("value"), 2).alias("v")).persist()

    spine = (
        b.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hr")
        )
    )
    types = e.select("event_type").distinct()
    grid = (
        spine.crossJoin(types)
        .join(b, ["hr", "event_type"], "left")
        .withColumn(
            "i", F.expr("unix_timestamp(hr) div 3600").cast("long")
        )
    )
    w_prev = (
        W.partitionBy("event_type")
        .orderBy("i")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_next = (
        W.partitionBy("event_type")
        .orderBy("i")
        .rowsBetween(1, W.unboundedFollowing)
    )
    i_if_v = F.when(F.col("v").isNotNull(), F.col("i"))
    ctx = (
        grid.withColumn("pv", F.last("v", ignorenulls=True).over(w_prev))
        .withColumn("pi", F.last(i_if_v, ignorenulls=True).over(w_prev))
        .withColumn("nv", F.first("v", ignorenulls=True).over(w_next))
        .withColumn("ni", F.first(i_if_v, ignorenulls=True).over(w_next))
    )
    both = F.col("pv").isNotNull() & F.col("nv").isNotNull()
    # exact integer interpolation — see the oracle comment: endpoints
    # scaled to centi-units, line arithmetic in BIGINT, one double
    # division at the end (identical IEEE operands on both engines)
    p100 = F.round(F.col("pv") * 100).cast("long")
    n100 = F.round(F.col("nv") * 100).cast("long")
    interp = (
        p100 * (F.col("ni") - F.col("i")) + n100 * (F.col("i") - F.col("pi"))
    ) / (F.lit(100.0) * (F.col("ni") - F.col("pi")))
    return ctx.select(
        "hr",
        "event_type",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(both, interp)
        .otherwise(F.coalesce("pv", "nv"))
        .alias("value_filled"),
        F.when(F.col("v").isNotNull(), F.lit("present"))
        .when(both, F.lit("interp"))
        .otherwise(F.lit("edge"))
        .alias("fill_kind"),
    )


@register(
    "agg_argminmax",
    oracle="""
    SELECT event_type,
           (max(CASE WHEN value IS NOT NULL
                THEN {'v': value, 'id': event_id} END)).id
             AS peak_event_id,
           max(value) AS peak_value,
           (min(CASE WHEN value IS NOT NULL
                THEN {'v': value, 'id': event_id} END)).id
             AS trough_event_id,
           min(value) AS trough_value,
           (min({'t': ts, 'id': event_id})).id AS first_event_id,
           (max({'t': ts, 'id': event_id})).id AS last_event_id
    FROM events GROUP BY event_type
    """,
)
def agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin aggregation (max_by/min_by): per event type, the
    event id at the extreme value and at the time-range edges. Every
    ordering key is a composite (value_or_ts, event_id) so ties are
    deterministic — a bare max_by(id, value) is free to pick either of
    two equal-valued rows, which is exactly the kind of
    engine-dependent nondeterminism the driver's value hash would
    catch. NULL policy is pinned explicitly: rows with NULL value are
    excluded from the value extremes on BOTH engines (the whole
    composite key is NULLed so the aggregate skips it) — without this,
    Spark struct comparison sorts a NULL field FIRST while DuckDB
    struct min/max treats NULLs as LARGEST, and peak/trough ids would
    diverge on null-valued events. One map-side-combinable hash
    aggregate; 5 output rows at any input scale."""
    e = table(spark, sf_dir, "events")
    v_key = F.when(
        F.col("value").isNotNull(),
        F.struct(F.col("value").alias("v"), F.col("event_id").alias("id")),
    )
    t_key = F.struct(F.col("ts").alias("t"), F.col("event_id").alias("id"))
    return e.groupBy("event_type").agg(
        F.max(v_key).getField("id").alias("peak_event_id"),
        F.max("value").alias("peak_value"),
        F.min(v_key).getField("id").alias("trough_event_id"),
        F.min("value").alias("trough_value"),
        F.min(t_key).getField("id").alias("first_event_id"),
        F.max(t_key).getField("id").alias("last_event_id"),
    )


@register(
    "agg_mode",
    oracle="""
    WITH counts AS (
      SELECT user_id, event_type, count(*) AS n
      FROM events GROUP BY user_id, event_type)
    SELECT user_id,
           (max({'n': n, 'neg': 0 - length(event_type),
                 'et': event_type})).et AS top_type,
           CAST((max({'n': n, 'neg': 0 - length(event_type),
                      'et': event_type})).n AS BIGINT) AS top_n
    FROM counts GROUP BY user_id
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MODE (most frequent event_type per user).
    Engine-native mode() breaks ties arbitrarily — here the winner is
    the lexicographic struct-max over (count, -len(type), type), so
    equal counts resolve identically everywhere (shorter name wins,
    then reverse-alphabetical — any total order works as long as BOTH
    engines use the same one). Two hash aggregates, both map-side
    combinable; never a sort."""
    e = table(spark, sf_dir, "events")
    counts = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    key = F.struct(
        F.col("n"),
        (F.lit(0) - F.length("event_type")).alias("neg"),
        F.col("event_type").alias("et"),
    )
    return counts.groupBy("user_id").agg(
        F.max(key).getField("et").alias("top_type"),
        F.max(key).getField("n").cast("long").alias("top_n"),
    )


@register(
    "agg_conditional",
    oracle="""
    SELECT event_type,
           CAST(count(*) FILTER (WHERE value > 50) AS BIGINT) AS n_high,
           CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT) AS n_null,
           bool_and(value > 0) AS all_positive,
           bool_or(value > 100) AS any_extreme,
           CAST(sum(CAST(round(value * 100) AS BIGINT))
                  FILTER (WHERE value > 50) AS BIGINT) AS sum_high_cents
    FROM events GROUP BY event_type
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER clause / count_if family):
    per-type counts and sums restricted by predicates, plus bool_and /
    bool_or quantifiers — the surface SQL dashboards are built from.
    Expressed with count_if/sum(when) on the Spark side and FILTER
    clauses in the oracle; identical 3VL semantics (NULL predicate
    rows are excluded from the filtered aggregate, and the bool
    quantifiers ignore NULL operands). The filtered sum accumulates
    exact integer cents (round-to-int per row BEFORE the sum — the
    module's float discipline: a round(sum(double), 2) is partition-
    order dependent at half-cent boundaries). One map-side-combinable
    hash aggregate."""
    e = table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    return e.groupBy("event_type").agg(
        F.count_if(F.col("value") > 50).cast("long").alias("n_high"),
        F.count_if(F.col("value").isNull()).cast("long").alias("n_null"),
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("value") > 100).alias("any_extreme"),
        F.sum(F.when(F.col("value") > 50, cents))
        .cast("long")
        .alias("sum_high_cents"),
    )


@register(
    "agg_weighted",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
             AS total_qty,
           round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round(l_quantity) AS BIGINT)) * 1.0
                 / sum(CAST(round(l_quantity) AS BIGINT)) / 100.0, 6)
             AS wavg_price,
           round(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) * 1.0
                 / count(*) / 100.0, 6) AS avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted aggregation (the quantity-weighted average price per
    return flag — the 'weighted mean' every metrics pipeline needs and
    plain avg() silently gets wrong). Float discipline: price is
    scaled to exact integer cents and quantity to exact integers
    BEFORE summing, so both engines accumulate identical BIGINTs and
    the two final divisions are the same IEEE operations — no
    engine-order float noise (sum(double) would be order-dependent).
    One map-side-combinable hash aggregate; 3 output rows at any
    scale."""
    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty = F.round(F.col("l_quantity")).cast("long")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum(qty).cast("long").alias("total_qty"),
        F.round(
            F.sum(cents * qty) * 1.0 / F.sum(qty) / 100.0, 6
        ).alias("wavg_price"),
        F.round(
            F.sum(cents) * 1.0 / F.count(F.lit(1)) / 100.0, 6
        ).alias("avg_price"),
    )


@register(
    "agg_weighted_median",
    oracle="""
    WITH pc AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS w
      FROM lineitem GROUP BY l_returnflag, cents
    ),
    c AS (
      SELECT l_returnflag, cents, w,
             CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS BIGINT) AS cum,
             CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
      FROM pc
    )
    SELECT l_returnflag,
           round(min(CASE WHEN cum * 2 >= tot THEN cents END) / 100.0, 2)
             AS wmedian_price,
           CAST(min(tot) AS BIGINT) AS total_weight
    FROM c GROUP BY l_returnflag
    """,
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (price weighted by quantity per return
    flag) — the robust center a metrics pipeline wants when rows carry
    unequal mass and avg()/median() both mislead.

    100 TB shape: two-stage. Stage 1 collapses raw rows to per-(flag,
    distinct price) integer weight sums — a map-side-combinable hash
    aggregate that shrinks the data to |distinct prices| BEFORE any
    sort. Stage 2's running-sum window runs over that collapsed table
    only (the corpus_token_budget lesson: never feed a running window
    the raw fact table). All arithmetic is exact BIGINT (price in
    cents, integer weights) until the single final division, so both
    engines pick the identical median row."""
    li = table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    qty = F.round(F.col("l_quantity")).cast("long")
    pc = li.groupBy(
        "l_returnflag", cents.alias("cents")
    ).agg(F.sum(qty).cast("long").alias("w"))
    wf = W.partitionBy("l_returnflag").orderBy("cents")
    c = pc.select(
        "l_returnflag",
        "cents",
        F.sum("w").over(
            wf.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).cast("long").alias("cum"),
        F.sum("w").over(W.partitionBy("l_returnflag")).cast("long").alias("tot"),
    )
    return c.groupBy("l_returnflag").agg(
        F.round(
            F.min(F.when(F.col("cum") * 2 >= F.col("tot"), F.col("cents")))
            / 100.0,
            2,
        ).alias("wmedian_price"),
        F.min("tot").cast("long").alias("total_weight"),
    )


@register(
    "agg_corr",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
           round(covar_samp(l_extendedprice, l_quantity), 4) AS price_qty_cov,
           round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group: Pearson correlation, sample
    covariance, and the OLS regression line (slope/intercept/R²) of
    price on quantity — the feature-vs-target screening pass a training
    pipeline runs before building anything fancier.

    100 TB shape: every one of these is an algebraic aggregate over
    (n, Σx, Σy, Σxy, Σx², Σy²) — Spark computes map-side partials and
    merges, one shuffle of 6 doubles per (group, partition). No window,
    no sort, no second pass. Rounded on both engines because partial-
    sum order differs across engines at the last ulp."""
    li = table(spark, sf_dir, "lineitem")
    x, y = F.col("l_extendedprice"), F.col("l_quantity")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.corr(x, y), 6).alias("price_qty_corr"),
        F.round(F.covar_samp(x, y), 4).alias("price_qty_cov"),
        F.round(F.regr_slope(x, y), 6).alias("slope"),
        F.round(F.regr_intercept(x, y), 4).alias("intercept"),
        F.round(F.regr_r2(x, y), 6).alias("r2"),
    )


@register(
    "rollup_retention_cohort",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(time_bucket(INTERVAL '7 days', CAST(ts AS DATE)))
               AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             date_diff('week', f.cohort_week,
                       time_bucket(INTERVAL '7 days', CAST(e.ts AS DATE)))
               AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    ),
    sizes AS (
      SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
      FROM firsts GROUP BY cohort_week
    )
    SELECT a.cohort_week, a.week_offset,
           CAST(count(*) AS BIGINT) AS n_active,
           round(count(*) * 1.0 / min(s.cohort_size), 6) AS retention
    FROM activity a JOIN sizes s ON a.cohort_week = s.cohort_week
    GROUP BY a.cohort_week, a.week_offset
    """,
)
def rollup_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: bucket each user into the week of
    their FIRST event, then for every (cohort_week, weeks-since)
    cell count how many cohort members were active — the
    triangle-shaped retention table behind every growth dashboard.

    Week bucketing uses 7-day buckets anchored at 2000-01-03 —
    DuckDB time_bucket's documented origin for day/week intervals (a
    Monday) — reproduced in Spark as floor division of
    days-since-origin, so both engines draw identical cohort
    boundaries.

    100 TB shape: firsts is one map-side-combinable min per user;
    activity collapses events to DISTINCT (user, week) BEFORE any
    join (bounded by users × weeks, not events); both joins are
    user/cohort-keyed equi-joins the planner broadcasts when small.
    No window functions at all — this is pure aggregate algebra."""
    e = table(spark, sf_dir, "events")
    # 7-day bucket of the event date, anchored at DuckDB time_bucket's
    # day-interval origin 2000-01-03 (Monday)
    day_idx = F.datediff(F.col("ts").cast("date"), F.lit("2000-01-03"))
    week_start = F.date_add(
        F.lit("2000-01-03").cast("date"),
        (F.floor(day_idx / 7) * 7).cast("int"),
    )
    firsts = (
        e.select("user_id", week_start.alias("wk"))
        .groupBy("user_id")
        .agg(F.min("wk").alias("cohort_week"))
    )
    activity = (
        e.select("user_id", week_start.alias("wk"))
        .distinct()
        .join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.col("wk"), F.col("cohort_week")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
        .join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            F.round(
                F.col("n_active") * 1.0 / F.col("cohort_size"), 6
            ).alias("retention"),
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS rflag,
           coalesce(l_linestatus, 'ALL') AS lstat,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty,
           CAST(grouping(l_returnflag) AS INT) * 2
             + CAST(grouping(l_linestatus) AS INT) AS gid
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (all 2^k grouping sets — the every-margin OLAP rollup,
    completing §2.4's ROLLUP/GROUPING SETS family): totals per
    (flag, shipmode), per flag, per shipmode, and grand total in one
    pass, with the standard grouping-bits id distinguishing real NULL
    group values from subtotal rows. One map-side-combinable hash
    aggregate: Spark expands the grouping sets internally and still
    shuffles each partial once — no 2^k scans. Quantities are exact
    integers before summation (float discipline)."""
    li = table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("long")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(qty).cast("long").alias("qty"),
            (
                F.grouping("l_returnflag").cast("int") * 2
                + F.grouping("l_linestatus").cast("int")
            ).alias("gid"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("rflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("lstat"),
            "n",
            "qty",
            "gid",
        )
    )


@register(
    "agg_gini",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(row_number() OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_totalprice, o_orderkey)
                  AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY o_orderpriority)
                  AS BIGINT) AS n_grp
      FROM orders
    ),
    g AS (
      SELECT o_orderpriority,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS total_cents,
             CAST(sum((2 * rn - n_grp - 1) * cents) AS BIGINT) AS num
      FROM c GROUP BY o_orderpriority
    )
    SELECT o_orderpriority AS priority, n,
           round(total_cents / 100.0, 2) AS total_spend,
           round(num * 1.0 / (n * total_cents), 6) AS gini
    FROM g
    """,
)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of order value per priority class (the
    inequality/concentration metric — for a training corpus, the same
    aggregate over per-source token counts answers "how skewed is my
    mix"): G = Σ(2·rank − n − 1)·xᵢ / (n·Σxᵢ) over values ranked
    ascending within the group.

    Exact-integer discipline end to end: prices scale to cent BIGINTs,
    ranks are ints, so numerator and denominator are exact BIGINTs on
    both engines and the single final division is the same IEEE op —
    no accumulation-order noise despite the O(n)-term weighted sum.

    100 TB shape: one (group, (value, key)) shuffle+sort serves the
    rank window AND (AQE-reused) the group rollup — the honest cost
    of an exact rank statistic, same as exact median; for ±ε at scale
    swap in a quantile-sketch approximation with the same output
    schema."""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    wr = W.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    c = o.select(
        "o_orderpriority",
        cents.alias("cents"),
        F.row_number().over(wr).cast("long").alias("rn"),
        F.count(F.lit(1))
        .over(W.partitionBy("o_orderpriority"))
        .cast("long")
        .alias("n_grp"),
    )
    g = c.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("total_cents"),
        F.sum((2 * F.col("rn") - F.col("n_grp") - 1) * F.col("cents"))
        .cast("long")
        .alias("num"),
    )
    return g.select(
        F.col("o_orderpriority").alias("priority"),
        "n",
        F.round(F.col("total_cents") / 100.0, 2).alias("total_spend"),
        F.round(
            F.col("num") * 1.0 / (F.col("n") * F.col("total_cents")), 6
        ).alias("gini"),
    )


@register(
    "agg_entropy",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
      FROM events
      WHERE user_id IS NOT NULL
      GROUP BY event_type, user_id
    ),
    g AS (
      SELECT event_type,
             CAST(sum(c) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_users,
             sum(c * log2(c)) AS sclc
      FROM c GROUP BY event_type
    )
    SELECT event_type,
           n_events, n_users,
           round(log2(n_events) - sclc / n_events, 6) AS entropy,
           round(CASE WHEN n_users > 1
                      THEN (log2(n_events) - sclc / n_events)
                           / log2(n_users)
                      ELSE 0.0 END, 6) AS norm_entropy
    FROM g
    """,
)
def agg_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the user distribution per event type — the
    concentration/balance diagnostic (for a training corpus, the same
    aggregate over per-source document counts answers "is my mix
    dominated by a handful of sources"); norm_entropy rescales by the
    max log2(n_users) so 1.0 = perfectly uniform.

    Numerics: counts are exact BIGINTs on both engines; the only float
    work is the shared identity H = log2(n) - sum(c*log2(c))/n (one
    multiply-log per distinct user, ~1e-10 accumulation-order noise
    across engines), rounded to 6 dp on both sides.

    Scale: two hash aggregations — (type, user) partial-combined
    map-side, then type — no window, no sort; the distinct-user
    explosion is the aggregation key, never a collected list."""
    e = table(spark, sf_dir, "events")
    c = (
        e.filter(F.col("user_id").isNotNull())
        .groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    g = c.groupBy("event_type").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.col("c") * F.log2("c")).alias("sclc"),
    )
    h = F.log2("n_events") - F.col("sclc") / F.col("n_events")
    return g.select(
        "event_type",
        "n_events",
        "n_users",
        F.round(h, 6).alias("entropy"),
        F.round(
            F.when(F.col("n_users") > 1, h / F.log2("n_users")).otherwise(
                0.0
            ),
            6,
        ).alias("norm_entropy"),
    )


@register(
    "agg_benford",
    oracle="""
    WITH v AS (
      SELECT o_orderpriority AS grp,
             CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (
      SELECT grp, d, CAST(count(*) AS BIGINT) AS cnt
      FROM v GROUP BY grp, d
    ),
    g AS (
      SELECT grp, CAST(sum(cnt) AS BIGINT) AS n,
             list(cnt ORDER BY d) AS cnts,
             list(d ORDER BY d) AS ds
      FROM c GROUP BY grp
    )
    SELECT grp,
           n,
           round(list_sum(list_transform(range(1, 10), k ->
             CASE WHEN list_position(ds, CAST(k AS BIGINT)) > 0
                  THEN power(CAST(cnts[list_position(ds, CAST(k AS BIGINT))]
                                  AS DOUBLE)
                             - n * log10(1.0 + 1.0 / k), 2)
                       / (n * log10(1.0 + 1.0 / k))
                  ELSE power(0.0 - n * log10(1.0 + 1.0 / k), 2)
                       / (n * log10(1.0 + 1.0 / k))
             END)), 6) AS chi2
    FROM g
    """,
)
def agg_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance per group — the classic
    fraud / synthetic-data screen: chi-squared distance between the
    observed leading-digit distribution of order values and Benford's
    law p(d) = log10(1 + 1/d). A generated or tampered feed jumps out
    as a large chi2; for a training corpus the same aggregate over
    numeric spans flags synthetic number soup.

    Determinism: digit counts are exact BIGINTs; the chi2 sum is
    folded over digits 1..9 IN DIGIT ORDER on both engines
    (F.aggregate over a sequence vs list_sum over list_transform
    (range) — both left-to-right), so the 9-term float accumulation is
    order-identical, then rounded.

    Scale: one (group, digit) hash aggregation (81 rows for 9 digits x
    priorities), then per-group list fold — nothing is
    partition-bound."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    v = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.substring(
            F.floor("o_totalprice").cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("d"),
    )
    c = v.groupBy("grp", "d").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    g = c.groupBy("grp").agg(
        F.sum("cnt").cast("long").alias("n"),
        F.map_from_arrays(
            F.collect_list("d"), F.collect_list("cnt")
        ).alias("cmap"),
    )
    # fold digits 1..9 in order; map lookup is order-independent
    chi2 = F.aggregate(
        F.sequence(F.lit(1), F.lit(9)),
        F.lit(0.0),
        lambda acc, k: acc
        + F.pow(
            F.coalesce(
                F.element_at(F.col("cmap"), k).cast("double"), F.lit(0.0)
            )
            - F.col("n") * F.log10(1.0 + 1.0 / k.cast("double")),
            2,
        )
        / (F.col("n") * F.log10(1.0 + 1.0 / k.cast("double"))),
    )
    return g.select("grp", "n", F.round(chi2, 6).alias("chi2"))


@register(
    "agg_heavy_hitters",
    oracle="""
    WITH tot AS (SELECT count(*) AS n FROM events),
    c AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    )
    SELECT c.user_id, c.cnt
    FROM c, tot
    WHERE c.cnt * 800 > tot.n
    ORDER BY c.cnt DESC, c.user_id
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phi-heavy-hitters (frequency > n/800 of the whole
    table): the users generating an outsized share of events. Plan:
    one distributed count per key, then a 1-row global total
    broadcast-joined in (the classic scalable threshold pattern — the
    total is a single row, so the 'cross join' is a broadcast nested
    loop over ONE row, never a shuffle). At 100 TB both aggregates
    reduce map-side; nothing is collected to the driver."""
    e = table(spark, sf_dir, "events")
    counts = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    total = e.agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.join(F.broadcast(total))
        .filter(F.col("cnt") * 800 > F.col("n"))
        .select("user_id", "cnt")
        .orderBy(F.desc("cnt"), "user_id")
    )


@register(
    "agg_path_string",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, coalesce(event_id, 0)) AS rn
      FROM events
    )
    SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path,
           CAST(count(*) AS BIGINT) AS n
    FROM r WHERE rn <= 10 GROUP BY user_id
    """,
)
def agg_path_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG WITHIN GROUP):
    each user's first-10-event path as 'view>click>...' — the
    session-path feature funnel tools consume. Spark has no ordered
    string_agg, so the deterministic spelling is
    array_join(transform(array_sort(collect_list(struct(rn, type)))))
    — the struct sort pins the order INSIDE the aggregate, immune to
    partial-aggregation arrival order. The rank window bounds every
    user's contribution to 10 rows before the aggregate, so state per
    key is capped at any scale."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", F.coalesce(F.col("event_id"), F.lit(0)))
    r = e.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= 10
    )
    return r.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )


@register(
    "agg_regression",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(count(*) AS BIGINT) AS n,
             sum(CAST(l_quantity AS BIGINT)) AS sx,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS sy,
             sum(CAST(l_quantity AS BIGINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT)) AS sxy,
             sum(CAST(l_quantity AS BIGINT)
                 * CAST(l_quantity AS BIGINT)) AS sxx,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                 * CAST(round(l_extendedprice * 100) AS BIGINT)) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             AS slope_cents,
           round((CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             AS intercept_cents,
           round(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS r2
    FROM s ORDER BY l_returnflag
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group OLS (price-on-quantity regression per returnflag):
    slope, intercept, and R² assembled from the five classical sums —
    NOT from an engine regr_slope/corr builtin, whose internal float
    accumulation order differs between engines. All five sums
    accumulate as exact BIGINTs (quantities integral, prices in
    cents), so partial-aggregation order cannot change them; the
    normal-equation arithmetic then runs in double on IDENTICAL
    integer inputs with the identical expression shape on both
    engines (IEEE determinism), rounded(6). One map-side-combined
    aggregate pass; the sums-to-coefficients step is a 3-row
    projection.

    Overflow posture (caught by the 8× fact probe, not hypothetically):
    sum(y²) at y ≈ 10⁷ cents exceeds int64 around 10⁶ rows — Spark's
    ANSI mode threw ARITHMETIC_OVERFLOW at 8× sf0.1 while DuckDB
    silently widened to HUGEINT. The quadratic-term sums therefore
    accumulate as decimal(38,0) (exact 128-bit, good to ~10³⁸ — beyond
    any corpus) and only THEN cast to double; DuckDB's HUGEINT sums
    take the same exact-integer→nearest-double rounding, so the
    normal-equation inputs stay identical. n·Sxy products after that
    are double-side magnitude, which costs precision but never
    cross-engine agreement."""
    li = table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    dec = "decimal(38,0)"
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y.cast(dec)).alias("sy"),  # 10^7-cent values pass int64
        # around 10^12 rows — same widening as the quadratic terms
        F.sum((x * y).cast(dec)).alias("sxy"),
        F.sum((x * x).cast(dec)).alias("sxx"),
        F.sum((y * y).cast(dec)).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sxd, syd = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxyd = F.col("sxy").cast("double")
    sxxd, syyd = F.col("sxx").cast("double"), F.col("syy").cast("double")
    cov_n = nd * sxyd - sxd * syd
    var_x = nd * sxxd - sxd * sxd
    var_y = nd * syyd - syd * syd
    return s.select(
        "l_returnflag",
        "n",
        F.round(cov_n / var_x, 6).alias("slope_cents"),
        F.round((syd * sxxd - sxd * sxyd) / var_x, 6).alias(
            "intercept_cents"
        ),
        F.round((cov_n * cov_n) / (var_x * var_y), 6).alias("r2"),
    ).orderBy("l_returnflag")


@register(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           CAST(ts AS DATE) AS day,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
    GROUP BY event_type, CAST(ts AS DATE)
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting via bitmap partial aggregation — the
    warehouse-standard way to compute daily-active-users at scale
    without shuffling raw user ids.

    ``count(DISTINCT user_id)`` at 100 TB shuffles every distinct
    (event_type, day, user_id) tuple to the reducers.  The bitmap
    spelling instead buckets the id space (bitmap_bucket_number: 4 KiB
    = 32768 ids per bucket), builds one fixed-size bitmap per
    (group, bucket) with bitmap_construct_agg — partials combine
    map-side, and merging two partials is a pure bit OR — then sums
    bitmap_count per group.  The shuffle carries at most
    n_groups × ceil(id_range / 32768) 4 KiB payloads instead of one
    row per distinct id, and the count is EXACT (the oracle is plain
    count(DISTINCT)), unlike approx_count_distinct.  All expressions
    are built-in JVM functions — no UDF, no driver-side state.
    """
    e = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    inner = (
        e.groupBy(
            "event_type",
            F.to_date("ts").alias("day"),
            F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
        )
        .agg(
            F.expr(
                "bitmap_construct_agg(bitmap_bit_position(user_id))"
            ).alias("bm"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    return inner.groupBy("event_type", "day").agg(
        F.expr("sum(bitmap_count(bm))").alias("n_users"),
        F.sum("c").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# LTTB downsampling (observability charts)

def _lttb_oracle_sql(k: int = 8) -> str:
    """Generate the unrolled LTTB oracle: k is small and fixed, so the
    sequential choose-per-bucket recurrence unrolls into k-2 chained
    CTEs (sel1..sel6), each an arg_max over one bucket — no recursive
    aggregation (which recursive CTEs disallow). All arithmetic is
    exact integers (epoch seconds x round-half-away cents), with the
    triangle area multiplied through by the next bucket's point count
    so the centroid never becomes a float — both engines pick
    IDENTICAL points, making the oracle hash-exact."""
    mid = k - 2
    parts = [
        f"""
    WITH pts AS (
      SELECT user_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, coalesce(event_id, 0)) AS rn,
             count(*) OVER (PARTITION BY user_id) AS n,
             CAST(floor(epoch(ts)) AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
        AND abs(value) <= 1e12
    ),
    small AS (
      SELECT user_id, CAST(rn - 1 AS BIGINT) AS sel_no, x, y
      FROM pts WHERE n <= {k}
    ),
    bkt AS (
      SELECT user_id, rn, n, x, y,
             CASE WHEN rn = 1 THEN 0
                  WHEN rn = n THEN {k - 1}
                  ELSE 1 + ((rn - 2) * {mid}) // (n - 2) END AS b
      FROM pts WHERE n > {k}
    ),
    bav AS (
      SELECT user_id, b, CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy, count(*) AS c
      FROM bkt GROUP BY user_id, b
    ),
    sel0 AS (SELECT user_id, x, y FROM bkt WHERE rn = 1)"""
    ]
    for i in range(1, mid + 1):
        parts.append(
            f""",
    sel{i}_a AS (
      SELECT p.user_id,
             max(struct_pack(
                   a := CAST(abs((s.x * v.c - v.sx) * (p.y - s.y)
                             - (s.x - p.x) * (v.sy - s.y * v.c))
                        AS HUGEINT),
                   nr := -p.rn,
                   x := p.x, y := p.y)) AS pt
      FROM bkt p
      JOIN sel{i - 1} s ON s.user_id = p.user_id
      JOIN bav v ON v.user_id = p.user_id AND v.b = {i + 1}
      WHERE p.b = {i}
      GROUP BY p.user_id
    ),
    sel{i} AS (SELECT user_id, pt.x AS x, pt.y AS y FROM sel{i}_a)"""
        )
    parts.append(
        f""",
    sel{k - 1} AS (SELECT user_id, x, y FROM bkt WHERE rn = n)
    SELECT user_id, sel_no, x, y FROM small
    """
    )
    for i in range(k):
        parts.append(
            f"""UNION ALL
    SELECT user_id, CAST({i} AS BIGINT) AS sel_no, x, y FROM sel{i}
    """
        )
    return "".join(parts)


def _lttb_kernel_factory(k: int = 8):
    def kernel(pdf):
        import pandas as pd

        pdf = (  # NULL id sorts as 0, output keeps NULL (round-8 parity)
            pdf.assign(_eid0=pdf["event_id"].fillna(0))
            .sort_values(["ts", "_eid0"], kind="mergesort")
            .drop(columns="_eid0")
        )
        xs = [int(v) for v in pdf["x"]]
        ys = [int(v) for v in pdf["y"]]
        n = len(xs)
        uid = int(pdf["user_id"].iloc[0])
        if n <= k:
            return pd.DataFrame(
                {
                    "user_id": [uid] * n,
                    "sel_no": list(range(n)),
                    "x": xs,
                    "y": ys,
                }
            )
        mid = k - 2
        # bucket of each 0-indexed point (rn = i+1)
        bs = [0] + [
            1 + ((i - 1) * mid) // (n - 2) for i in range(1, n - 1)
        ] + [k - 1]
        by_bucket: dict[int, list[int]] = {}
        for i, b in enumerate(bs):
            by_bucket.setdefault(b, []).append(i)
        out_x, out_y = [xs[0]], [ys[0]]
        px, py = xs[0], ys[0]
        for b in range(1, mid + 1):
            nxt = by_bucket[b + 1]
            sx = sum(xs[i] for i in nxt)
            sy = sum(ys[i] for i in nxt)
            c = len(nxt)
            best, best_area = None, -1
            for i in by_bucket[b]:
                # triangle area x 2c, exact integers (same spelling as
                # the oracle: centroid multiplied through by c)
                area = abs(
                    (px * c - sx) * (ys[i] - py)
                    - (px - xs[i]) * (sy - py * c)
                )
                if area > best_area:  # strict: first max = min rn
                    best, best_area = i, area
            out_x.append(xs[best])
            out_y.append(ys[best])
            px, py = xs[best], ys[best]
        out_x.append(xs[-1])
        out_y.append(ys[-1])
        return pd.DataFrame(
            {
                "user_id": [uid] * k,
                "sel_no": list(range(k)),
                "x": out_x,
                "y": out_y,
            }
        )

    return kernel


@register("rollup_lttb", oracle=_lttb_oracle_sql(8))
def rollup_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013),
    the observability-dashboard standard: reduce each user's event
    series to k=8 visually-representative points — endpoints pinned,
    each middle bucket contributing the point that maximizes the
    triangle area with the previously KEPT point and the next
    bucket's centroid.

    The per-bucket choice depends on the previous choice — genuinely
    sequential per key, so this is the documented applyInPandas tier
    (b): a pure-Python integer kernel per user_id group, distributed
    across keys, O(n) per key with no state beyond the previous
    point. All candidate scoring is EXACT integer arithmetic (epoch
    seconds x cents, centroid multiplied through by the bucket count
    instead of divided), so the kernel and the DuckDB oracle — the
    same recurrence unrolled into k-2 chained arg_max CTEs — select
    identical points and the driver hash matches exactly; float
    areas would argmax-flip on near-ties between engines.

    At 100 TB: one (user) shuffle, kernel state O(1), output k rows
    per key — the chart query that turns a billion-point series into
    a renderable sparkline without a driver-side pass. Keys with
    n <= k pass through unchanged (sel_no = original position)."""
    e = (
        table(spark, sf_dir, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            # cents domain bound (mirrored in the oracle): readings
            # beyond 1e12 are sensor garbage, and 1e12*100 still fits
            # BIGINT exactly — no ANSI cast overflow on adversarial
            # inputs (the degenerate sweep's 1e308 row)
            & (F.abs(F.col("value")) <= 1e12)
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            F.unix_timestamp("ts").alias("x"),
            F.round(F.col("value") * 100).cast("long").alias("y"),
        )
    )
    return keyed_partition_apply(
        e,
        "user_id",
        _lttb_kernel_factory(8),
        "user_id long, sel_no long, x long, y long",
    )


@register(
    "agg_bitmap_retention",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    dau AS (
      SELECT day, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY day
    ),
    ret AS (
      SELECT a.day AS day, CAST(count(*) AS BIGINT) AS returning
      FROM du a JOIN du b
        ON b.user_id = a.user_id AND b.day = a.day - 1
      GROUP BY a.day
    )
    SELECT dau.day AS day, dau.dau AS dau,
           coalesce(ret.returning, CAST(0 AS BIGINT)) AS returning
    FROM dau LEFT JOIN ret ON dau.day = ret.day
    """,
)
def agg_bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day returning users (exact retention) via bitmap set
    algebra — the sequel to agg_bitmap_distinct: |active(d) ∩
    active(d-1)| computed WITHOUT ever joining raw user ids.

    The naive plan self-joins the distinct (day, user) table on
    user_id — at 100 TB that shuffles every active user twice per day
    pair.  The bitmap plan reuses the DAU layout: one 4 KiB bitmap per
    (day, 32768-id bucket), then each day's buckets meet the PREVIOUS
    day's (re-keyed day+1) in a single union + re-aggregation, and the
    intersection falls out of inclusion-exclusion per bucket —
    |A∩B| = |A| + |B| - |A∪B| with |A∪B| a bit-OR merge
    (bitmap_or_agg).  Everything after the first bucket aggregation
    handles ≤ days × buckets fixed-size rows; no id ever crosses the
    wire twice.  All built-in JVM functions, exact answer — the oracle
    is the plain distinct self-join."""
    e = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    daily = e.groupBy(
        F.to_date("ts").alias("day"),
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
            "bm"
        )
    )
    cur = daily.select("day", "bkt", "bm", F.lit("cur").alias("tag"))
    prev = daily.select(
        F.date_add("day", 1).alias("day"), "bkt", "bm",
        F.lit("prev").alias("tag"),
    )
    per_bkt = (
        cur.unionByName(prev)
        .groupBy("day", "bkt")
        .agg(
            F.sum(
                F.when(F.col("tag") == "cur", F.expr("bitmap_count(bm)"))
                .otherwise(F.lit(0))
            ).alias("cur_n"),
            F.sum(
                F.when(F.col("tag") == "prev", F.expr("bitmap_count(bm)"))
                .otherwise(F.lit(0))
            ).alias("prev_n"),
            F.expr("bitmap_count(bitmap_or_agg(bm))").alias("uni_n"),
        )
    )
    per_day = per_bkt.groupBy("day").agg(
        F.sum("cur_n").alias("dau"),
        F.sum(F.col("cur_n") + F.col("prev_n") - F.col("uni_n")).alias(
            "returning"
        ),
    )
    # prev-only phantom rows (day after the last active day) have
    # dau = 0 — the oracle lists only days with activity.
    return per_day.filter(F.col("dau") > 0).select(
        "day", "dau", "returning"
    )


@register(
    "rollup_wow",
    oracle="""
    WITH wk AS (
      SELECT date_trunc('week', o_orderdate) AS week,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS rev_cents,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders
      WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
      GROUP BY 1
    )
    SELECT week, rev_cents, n_orders,
           lag(rev_cents) OVER (ORDER BY week) AS prev_rev_cents,
           CAST(CASE WHEN lag(rev_cents) OVER (ORDER BY week) > 0
                THEN (CAST(rev_cents AS HUGEINT) * 1000000)
                     // lag(rev_cents) OVER (ORDER BY week)
                END AS BIGINT) AS wow_ratio_ppm
    FROM wk
    """,
)
def rollup_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week reporting panel: ISO-week revenue and order
    counts with the previous week's revenue and the WoW ratio in exact
    ppm (current·10⁶ DIV previous — a RATIO of positives, not a signed
    delta, because integer division of negatives floors in DuckDB but
    truncates in Spark and the two would hash-differ; the signed
    change is derivable as ratio − 10⁶).

    The ordered lag window runs over |weeks| rows — input bounded by
    the CALENDAR, not the data (the corpus_token_budget precedent for
    an acceptable unpartitioned window): the heavy lifting is the
    per-week aggregation, one shuffle with map-side partials.  Ratio
    numerator widened to decimal(38,0)/HUGEINT (the win_pareto_share
    lesson)."""
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    wk = o.groupBy(
        F.date_trunc("week", F.col("o_orderdate")).alias("week")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("rev_cents"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    # |weeks| rows by construction — the ordered window input is bounded.
    w = W.orderBy("week")
    prev = F.lag("rev_cents").over(w)
    return wk.select(
        "week",
        "rev_cents",
        "n_orders",
        prev.alias("prev_rev_cents"),
        F.when(
            prev > 0,
            F.expr(
                "(CAST(rev_cents AS DECIMAL(38,0)) * 1000000)"
            ).cast("decimal(38,0)")
        )
        .otherwise(F.lit(None))
        .alias("_num"),
    ).select(
        "week",
        "rev_cents",
        "n_orders",
        "prev_rev_cents",
        F.expr("CAST(_num DIV prev_rev_cents AS BIGINT)").alias(
            "wow_ratio_ppm"
        ),
    )


@register(
    "rollup_twap",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS DATE) AS day, epoch_us(ts) AS tus,
             event_id, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
        AND value IS NOT NULL AND abs(value) <= 1e9
    ),
    w AS (
      SELECT user_id, day, tus, cents,
             lead(tus) OVER (PARTITION BY user_id, day
                             ORDER BY tus, coalesce(event_id, 0)) AS nxt
      FROM e
    ),
    seg AS (
      SELECT user_id, day, cents, nxt - tus AS dus
      FROM w WHERE nxt IS NOT NULL
    )
    SELECT user_id, day,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(dus) AS BIGINT) AS span_us,
           -- widen the OPERAND: cents(1e11) x day-span-us(8.6e10)
           -- overflows the BIGINT product per segment and DuckDB
           -- products raise instead of widening (review catch —
           -- the Spark side already sums decimal(38,0))
           round(CAST(sum(CAST(cents AS HUGEINT) * dus) AS DOUBLE)
                 / CAST(sum(dus) AS DOUBLE) / 100.0, 6) AS twap
    FROM seg
    GROUP BY user_id, day
    HAVING sum(dus) > 0
    """,
)
def rollup_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per (user, day) — the financial /
    metering rollup a plain avg() gets wrong when observations are
    irregularly spaced: each observation's value holds until the next
    observation that day (last-observation-carried-forward), so TWAP =
    sum(value_i * dt_i) / sum(dt_i) over the day's observed span (the
    day's last event opens no segment; single-event days emit
    nothing).

    Exact-arithmetic discipline: dt in exact integer microseconds,
    value in exact integer cents, and the value x time products
    accumulate as decimal(38,0) / HUGEINT — cents(1e11) x day-span-us
    (8.6e10) overflows int64 per SEGMENT (the win_pareto_share /
    agg_regression quadratic-sum lesson), so the widening is
    preemptive, not reactive. One IEEE division at the end.

    100 TB shape: ONE (user) shuffle serves the lead() window and the
    (user, day) rollup (day nests inside user); map-side combine on
    the aggregate. Same tier as the other event windows."""
    e = (
        table(spark, sf_dir, "events")
        .filter(
            F.col("ts").isNotNull()
            & F.col("user_id").isNotNull()
            & F.col("value").isNotNull()
            & (F.abs("value") <= 1e9)
        )
        .select(
            "user_id",
            F.to_date("ts").alias("day"),
            F.unix_micros("ts").alias("tus"),
            "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    w = W.partitionBy("user_id", "day").orderBy("tus", F.coalesce(F.col("event_id"), F.lit(0)))
    seg = (
        e.withColumn("nxt", F.lead("tus").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            "user_id",
            "day",
            "cents",
            (F.col("nxt") - F.col("tus")).alias("dus"),
        )
    )
    num = F.sum(F.col("cents").cast("decimal(38,0)") * F.col("dus"))
    den = F.sum("dus")
    return (
        seg.groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segments"),
            den.cast("long").alias("span_us"),
            F.round(
                num.cast("double") / den.cast("double") / 100.0, 6
            ).alias("twap"),
        )
        .filter(F.col("span_us") > 0)
    )


@register(
    "agg_hll_union",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS merged_within_5pct
    FROM events
    WHERE event_type IS NOT NULL AND user_id IS NOT NULL
      AND ts IS NOT NULL
    GROUP BY event_type
    """,
)
def agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL distinct-count sketches (Apache DataSketches via
    Spark's hll_sketch_agg / hll_union_agg) — the re-aggregatable
    approximate-distinct layout a 100 TB warehouse materializes:
    per-(event_type, day) sketches roll up to event_type by sketch
    UNION, never re-touching raw ids — the property approx_count_
    distinct (agg_approx) lacks and the exact bitmaps
    (agg_bitmap_distinct) pay 4 KiB/bucket for.

    Oracle contract: the estimate itself has no SQL spelling, so the
    HASHED output carries the exact distinct count plus the INVARIANT
    `|union-estimate - exact| <= 5% of exact` as a boolean the oracle
    pins TRUE — an estimator regression flips the hash. The
    merged-equals-direct sketch property (union of day sketches vs
    one direct sketch) is pinned in tests/test_round7_ops.py.

    100 TB shape: two map-side-combinable aggregations; the shuffle
    carries one <= 1.5 KiB sketch per (type, day) then per type —
    constant-size state, the entire point of the sketch family."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull()
        & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
    )
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk"))
        .cast("long")
        .alias("est"),
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "exact_users",
        (
            F.abs(F.col("est") - F.col("exact_users")) * 20
            <= F.col("exact_users")
        ).alias("merged_within_5pct"),
    )


@register(
    "rollup_seasonal",
    oracle="""
    WITH e AS (
      SELECT coalesce(event_type, '') AS etype,
             isodow(ts) AS dow,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
        AND abs(value) <= 1e9
    ),
    d AS (
      SELECT etype, dow,
             sum(cents) AS s_dow,
             CAST(count(*) AS BIGINT) AS n_dow
      FROM e GROUP BY etype, dow
    ),
    t AS (
      SELECT etype, sum(s_dow) AS s_all, sum(n_dow) AS n_all
      FROM d GROUP BY etype
    )
    SELECT d.etype, CAST(d.dow AS BIGINT) AS dow, d.n_dow,
           CASE WHEN t.s_all <> 0
                THEN round(CAST(CAST(d.s_dow AS HUGEINT)
                                * CAST(t.n_all AS HUGEINT) AS DOUBLE)
                           / CAST(CAST(d.n_dow AS HUGEINT)
                                  * CAST(t.s_all AS HUGEINT) AS DOUBLE),
                           6) + 0.0
           END AS seasonal_index
    FROM d JOIN t ON d.etype = t.etype
    """,
)
def rollup_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index per event type: mean(value) on that
    ISO weekday ÷ the type's overall mean — the classical
    multiplicative seasonality profile (ratio-to-moving-average
    method's constant-window special case).  Exact integer
    cross-multiplication ((Σ_dow · n_all) / (n_dow · Σ_all)) defers
    the ONLY division to the final double, so both engines round the
    identical quotient; a zero overall sum pins NULL (no meaningful
    index).  ISO weekday (Mon=1…Sun=7) via Spark weekday()+1 ==
    DuckDB isodow().

    100 TB shape: two map-side-combinable hash aggregates — the
    second groups a ≤(types × 7)-row frame, broadcast back to the
    per-dow rows by key (AQE broadcasts it); the events scan reads
    (event_type, ts, value) only.  No window over the full table, no
    UDF."""
    e = (
        table(spark, sf_dir, "events")
        .filter(
            F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & (F.abs("value") <= 1e9)
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("")).alias("etype"),
            (F.weekday("ts") + F.lit(1)).alias("dow"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    d = e.groupBy("etype", "dow").agg(
        F.sum("cents").alias("s_dow"),
        F.count(F.lit(1)).cast("long").alias("n_dow"),
    )
    t = d.groupBy("etype").agg(
        F.sum("s_dow").alias("s_all"), F.sum("n_dow").alias("n_all")
    )
    return d.join(t, "etype").select(
        "etype",
        F.col("dow").cast("long").alias("dow"),
        "n_dow",
        F.when(
            F.col("s_all") != 0,
            # DECIMAL(38,0) cross-products: at 100 TB s_dow*n_all can
            # exceed int64 (same failure class profile_skew widened for)
            F.round(
                (
                    F.col("s_dow").cast("decimal(38,0)")
                    * F.col("n_all").cast("decimal(38,0)")
                ).cast("double")
                / (
                    F.col("n_dow").cast("decimal(38,0)")
                    * F.col("s_all").cast("decimal(38,0)")
                ).cast("double"),
                6,
            )
            + F.lit(0.0),
        ).alias("seasonal_index"),
    )


@register(
    "agg_log2_quantile",
    oracle="""
    WITH e AS (
      SELECT coalesce(event_type, '') AS etype,
             length(bin(CAST(round(value * 100) AS BIGINT))) AS b
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
        AND value > 0 AND value <= 1e9
    ),
    c AS (
      SELECT etype, b, CAST(count(*) AS BIGINT) AS cnt
      FROM e GROUP BY etype, b
    ),
    cum AS (
      SELECT etype, b, cnt,
             CAST(sum(cnt) OVER (PARTITION BY etype ORDER BY b)
                  AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY etype) AS BIGINT) AS tot
      FROM c
    )
    SELECT etype, max(tot) AS n,
           CAST(min(CASE WHEN cum * 100 >= 50 * tot THEN b END)
                AS BIGINT) AS q50_bucket,
           CAST(min(CASE WHEN cum * 100 >= 90 * tot THEN b END)
                AS BIGINT) AS q90_bucket,
           CAST(min(CASE WHEN cum * 100 >= 99 * tot THEN b END)
                AS BIGINT) AS q99_bucket,
           (CAST(1 AS BIGINT)
            << min(CASE WHEN cum * 100 >= 99 * tot THEN b END)) - 1
             AS q99_ub_cents
    FROM cum GROUP BY etype
    """,
)
def agg_log2_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable bounded-relative-error quantiles — the DDSketch idea
    (Masson et al 2019, VLDB) on exact base-2 buckets: a positive
    cents value lands in bucket b = its bit length (b = ⌊log₂ v⌋ + 1,
    computed as length(bin(v)) — an exact INTEGER operation on both
    engines, never libm log, which disagrees at boundary ulps — the
    width_bucket lesson), so a bucket spans [2^(b−1), 2^b) and any
    quantile read from the histogram is within 2× of the true value.
    Per event type: q50/q90/q99 bucket ids (smallest bucket whose
    cumulative count covers the rank, exact cross-multiplied
    cum·100 ≥ p·tot) and the q99 upper bound in cents.

    WHY this beats exact quantiles at 100 TB: the state is ≤ 64
    counters per group — map-side combinable, mergeable across
    partitions / days / clusters by plain addition (the same
    re-aggregation story as agg_hll_union), where exact percentiles
    need a full sort and approx_percentile's GK sketch is
    order-sensitive and un-oracle-able.  One hash aggregate + one
    ≤64-rows-per-group window.  Positive-domain by contract (a
    latency/price sketch; two's-complement bit lengths of negatives
    diverge between engines)."""
    from spark_cep_spark.streaming.windows import (
        log2_bucket,
        log2q_select,
    )

    e = (
        table(spark, sf_dir, "events")
        .filter(
            F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & (F.col("value") > 0)
            & (F.col("value") <= 1e9)
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("")).alias("etype"),
            log2_bucket().alias("b"),
        )
    )
    c = e.groupBy("etype", "b").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    return log2q_select(c, keys=("etype",), ps=(50, 90, 99)).withColumn(
        "q99_ub_cents",
        F.expr(
            "CAST(shiftleft(CAST(1 AS BIGINT), "
            "CAST(q99_bucket AS INT)) - 1 AS BIGINT)"
        ),
    )


@register(
    "rollup_ohlc_multi",
    oracle="""
    SELECT user_id,
           date_trunc('day', ts) AS day,
           arg_min(value, printf('%020d%012d', epoch_us(ts),
                                 coalesce(event_id, 0))) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, printf('%020d%012d', epoch_us(ts),
                                 coalesce(event_id, 0))) AS close,
           CAST(count(*) AS BIGINT) AS volume,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS turnover_cents
    FROM events
    WHERE ts IS NOT NULL AND value IS NOT NULL AND abs(value) <= 1e9
    GROUP BY user_id, date_trunc('day', ts)
    """,
)
def rollup_ohlc_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical candle rollup — the hypertable continuous-
    aggregate pattern: DAY candles are derived from HOUR candle
    PARTIALS (open = earliest non-empty hour's open via
    min_by(open, hour), close = max_by, high/low = max/min of the
    partials, volume/turnover = sums), never from the raw ticks.
    Because hours partition the day, the merge is LOSSLESS: the
    oracle computes the day candles DIRECTLY from raw rows and the
    two must agree bit-for-bit — the invariant that makes cascaded
    rollups (1m → 1h → 1d → 1mo) trustworthy.  Tie-breaks by the
    zero-padded (epoch-micros, coalesce(event_id, 0)) key (the
    agg_ohlc discipline + the NULL-tie convention); turnover in
    exact integer cents.

    100 TB shape: the raw scan feeds ONE hour-grain partial aggregate
    (group-count-bounded shuffle); the day merge then runs on the
    24×-smaller candle table — at petabyte tick volumes every coarser
    resolution reads the previous one, not the raw data, which is the
    entire point of hypertable rollups."""
    e = table(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull()
        & F.col("value").isNotNull()
        & (F.abs("value") <= 1e9)
    )
    key = F.format_string(
        "%020d%012d",
        F.unix_micros("ts"),
        F.coalesce(F.col("event_id"), F.lit(0)),
    )
    hours = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count(F.lit(1)).cast("long").alias("volume"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias(
            "turnover_cents"
        ),
    )
    return hours.groupBy(
        "user_id", F.date_trunc("day", "hr").alias("day")
    ).agg(
        F.min_by("open", F.col("hr")).alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", F.col("hr")).alias("close"),
        F.sum("volume").cast("long").alias("volume"),
        F.sum("turnover_cents").cast("long").alias("turnover_cents"),
    )


@register(
    "profile_skew",
    oracle="""
    WITH k AS (
      SELECT 'user_id' AS key_col,
             coalesce(CAST(user_id AS VARCHAR), '<NULL>') AS key
      FROM events
      UNION ALL
      SELECT 'event_type', coalesce(event_type, '<NULL>') FROM events
    ),
    c AS (
      SELECT key_col, key, CAST(count(*) AS BIGINT) AS cnt
      FROM k GROUP BY key_col, key
    ),
    s AS (
      SELECT key_col,
             CAST(count(*) AS BIGINT) AS n_distinct,
             CAST(sum(cnt) AS BIGINT) AS total,
             CAST(max(cnt) AS BIGINT) AS max_cnt,
             arg_max(key, printf('%020d%s', cnt, key)) AS top_key
      FROM c GROUP BY key_col
    )
    SELECT key_col, n_distinct, total, max_cnt, top_key,
           CAST(CAST(max_cnt AS HUGEINT) * 1000000 // total AS BIGINT)
             AS top_share_ppm,
           CAST(CAST(max_cnt AS HUGEINT) * n_distinct * 1000 // total
                AS BIGINT) AS skew_ratio_millis
    FROM s
    """,
)
def profile_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew census — the diagnostic you run BEFORE keying a
    100 TB join/agg on a column: per candidate key column, the
    distinct count, the heaviest key and its exact ppm share of rows,
    and the skew ratio max·distinct/total (1000 = perfectly uniform;
    a hot key pushes it toward distinct·1000) — the number that
    decides between a plain hash join, AQE skew handling, and salting
    (join_skew_salted).  Exact integer arithmetic throughout (ppm and
    millis by integer division); the heaviest key is tie-broken by a
    zero-padded (count, key) string — the agg_ohlc arg_max
    discipline — so both engines pick the same key.

    100 TB shape: one stacked projection + two map-side-combinable
    aggregates; the per-key count table is the only shuffle and is
    distinct-bounded.  NULL keys are surveyed as their own '<NULL>'
    bucket — a NULL-heavy key column is the classic silent skew."""
    e = table(spark, sf_dir, "events")
    k = e.selectExpr(
        "stack(2, 'user_id', coalesce(CAST(user_id AS STRING), '<NULL>'),"
        " 'event_type', coalesce(event_type, '<NULL>')) AS (key_col, key)"
    )
    c = k.groupBy("key_col", "key").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    s = c.groupBy("key_col").agg(
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum("cnt").cast("long").alias("total"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.max_by(
            "key", F.format_string("%020d%s", F.col("cnt"), F.col("key"))
        ).alias("top_key"),
    )
    return s.select(
        "key_col",
        "n_distinct",
        "total",
        "max_cnt",
        "top_key",
        # products widened to DECIMAL(38,0): at 10^12 rows x 10^9
        # distinct keys the int64 product wraps on Spark and errors on
        # DuckDB — exactly where the diagnostic matters (review catch)
        F.expr(
            "CAST(CAST(max_cnt AS DECIMAL(38,0)) * 1000000 DIV total "
            "AS BIGINT)"
        ).alias("top_share_ppm"),
        F.expr(
            "CAST(CAST(max_cnt AS DECIMAL(38,0)) * n_distinct * 1000 "
            "DIV total AS BIGINT)"
        ).alias("skew_ratio_millis"),
    )
