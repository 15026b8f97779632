"""Projection / filter / predicate / sort / limit / set operators
(SURVEY §2.2, §2.6, §2.7).

All pure DataFrame API — Catalyst pushes the filters and the column
pruning into the parquet scan (verified via .explain: PushedFilters +
ReadSchema), so at 100 TB these queries read only the needed columns
and row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.registry import register


@register(
    "project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_quantity AS qty
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
      AND l_quantity >= 10
      AND NOT l_returnflag IN ('N')
      AND (l_discount > 0.05 OR l_tax <= 0.03)
      AND l_linestatus LIKE 'F%'
      AND l_shipdate IS NOT NULL
    """,
)
def project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT/WHERE with AND/OR/NOT, BETWEEN, IN, LIKE, IS NULL and a
    computed column. Filter + pruning push down to the parquet scan."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate").between("1996-01-01", "1998-12-31")
            & (F.col("l_quantity") >= 10)
            & ~F.col("l_returnflag").isin("N")
            & ((F.col("l_discount") > 0.05) | (F.col("l_tax") <= 0.03))
            & F.col("l_linestatus").like("F%")
            & F.col("l_shipdate").isNotNull()
        ).select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
            F.col("l_quantity").alias("qty"),
        )
    )


@register(
    "case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'high'
                WHEN o_orderpriority = '3-MEDIUM' THEN 'mid'
                ELSE 'low' END AS priority_class,
           CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END AS big_order
    FROM orders
    """,
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional projection via F.when chains (CASE WHEN)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "mid")
        .otherwise("low")
        .alias("priority_class"),
        F.when(F.col("o_totalprice") > 200000, 1).otherwise(0).alias("big_order"),
    )


@register(
    "distinct_select",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def distinct_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT — hash aggregate with map-side partials."""
    c = table(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()


@register(
    "sort_multi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC NULLS LAST, c_name ASC, c_custkey
    LIMIT 100
    """,
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering; LIMIT makes it a
    TakeOrderedAndProject (no full global sort materialization)."""
    c = table(spark, sf_dir, "customer")
    return (
        c.select("c_custkey", "c_name", "c_acctbal")
        .orderBy(
            F.col("c_acctbal").desc_nulls_last(),
            F.col("c_name").asc(),
            F.col("c_custkey"),
        )
        .limit(100)
    )


@register(
    "limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY .. LIMIT k → Spark plans TakeOrderedAndProject: each
    partition keeps a k-heap, driver merges — no global sort shuffle."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register("sample")  # nondeterministic vs oracle → rows-only check
def sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bernoulli sample (seeded). Spark's split-sampling is per-partition
    so results differ from any SQL oracle — rows-only contract."""
    e = table(spark, sf_dir, "events")
    return e.sample(fraction=0.1, seed=42).select("event_id", "event_type")


@register(
    "set_union_all",
    oracle="""
    SELECT o_orderkey AS k, 'F' AS src FROM orders WHERE o_orderstatus = 'F'
    UNION ALL
    SELECT o_orderkey AS k, 'O' AS src FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("k"), F.lit("F").alias("src")
    )
    b = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("k"), F.lit("O").alias("src")
    )
    return a.unionByName(b)


@register(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    UNION
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    # subtract == EXCEPT DISTINCT (exceptAll keeps multiplicities, which
    # diverges from SQL EXCEPT when a row appears more often left than right)
    return c.subtract(s)


@register(
    "merge_upsert",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey, round(o_totalprice + 10, 2) AS price, 'F' AS status
      FROM orders WHERE o_orderkey % 10 = 0
    ),
    ins AS (
      SELECT o_orderkey + 10000000 AS o_orderkey,
             round(o_totalprice, 2) AS price, 'N' AS status
      FROM orders WHERE o_orderkey % 37 = 0
    ),
    changes AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
    merged AS (
      SELECT coalesce(c.o_orderkey, t.o_orderkey) AS okey,
             CASE WHEN t.o_orderkey IS NULL THEN 'insert'
                  WHEN c.o_orderkey IS NULL THEN 'unchanged'
                  ELSE 'update' END AS action,
             coalesce(c.price, round(t.o_totalprice, 2)) AS price
      FROM orders t
      FULL OUTER JOIN changes c ON t.o_orderkey = c.o_orderkey
    )
    SELECT action, count(*) AS n, round(sum(price), 2) AS total_price
    FROM merged
    GROUP BY action
    """,
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (matched → update, not-matched → insert)
    without a table format: one full-outer join of target and change
    set, action derived from null-sides. (The change-set price is an
    ADDITIVE bump: a multiplicative one creates true 3-decimal values at
    .xx5 boundaries, where Spark's decimal-string round and DuckDB's
    binary round legitimately disagree) — the reference family's
    `INSERT INTO <sink>` maintenance pattern, expressed relationally.
    Emits the merge audit. At 100 TB both sides shuffle once on the
    merge key (or zero times if the target is bucketed on it — see
    plans/scale.write_bucketed); with a lakehouse format the same plan
    becomes MERGE INTO. The audit aggregate rides the join's
    partitioning."""
    o = table(spark, sf_dir, "orders")
    upd = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") + 10, 2).alias("price"),
        F.lit("F").alias("status"),
    )
    ins = o.filter(F.col("o_orderkey") % 37 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        F.round("o_totalprice", 2).alias("price"),
        F.lit("N").alias("status"),
    )
    changes = upd.unionByName(ins)
    t = o.select(
        F.col("o_orderkey").alias("t_key"), F.col("o_totalprice").alias("t_price")
    )
    merged = t.join(changes, t.t_key == changes.o_orderkey, "full_outer").select(
        F.when(F.col("t_key").isNull(), F.lit("insert"))
        .when(F.col("o_orderkey").isNull(), F.lit("unchanged"))
        .otherwise(F.lit("update"))
        .alias("action"),
        F.coalesce("price", F.round("t_price", 2)).alias("price"),
    )
    return merged.groupBy("action").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("price"), 2).alias("total_price")
    )


@register(
    "merge_scd2",
    oracle="""
    WITH ordered AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
             CASE WHEN lag(o_orderpriority) OVER w IS DISTINCT FROM
                       o_orderpriority THEN 1 ELSE 0 END AS chg
      FROM orders
      WHERE o_custkey % 50 = 0
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    runs AS (
      SELECT *,
             CAST(sum(chg) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS run_id
      FROM ordered
    ),
    hist AS (
      SELECT o_custkey AS custkey, run_id, o_orderpriority AS priority,
             min(o_orderdate) AS valid_from,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM runs GROUP BY o_custkey, run_id, o_orderpriority
    )
    SELECT custkey, run_id AS version, priority, valid_from,
           lead(valid_from) OVER (PARTITION BY custkey ORDER BY run_id)
             AS valid_to,
           CASE WHEN lead(valid_from) OVER (PARTITION BY custkey
                                            ORDER BY run_id) IS NULL
                THEN 1 ELSE 0 END AS is_current,
           n_orders
    FROM hist
    """,
)
def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 history build: collapse each
    customer's order-priority timeline into runs of consecutive equal
    values and emit one versioned row per run with
    [valid_from, valid_to) validity and an is_current flag — the
    dimension-table maintenance pattern behind every `MERGE ...
    WHEN MATCHED` SCD2 pipeline, built relationally from the raw
    change log (filtered to the custkey%50 cohort so the fixture
    output stays reviewable; the plan is cohort-size-independent).

    100 TB shape: ONE (custkey, (date, key)) shuffle+sort serves the
    change-detect lag, the run-id running sum (O(1)-state frame), and
    — after the per-run collapse shrinks rows to |runs| — the
    valid_to lead window, which Spark runs on the same partitioning
    without a second exchange. No self-join of the history against
    itself (the naive SCD2 build), no unbounded state."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = F.when(
        ~F.lag("o_orderpriority")
        .over(w)
        .eqNullSafe(F.col("o_orderpriority")),
        F.lit(1),
    ).otherwise(F.lit(0))
    runs = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_orderpriority",
        F.sum(chg)
        .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("long")
        .alias("run_id"),
    )
    hist = runs.groupBy(
        F.col("o_custkey").alias("custkey"),
        "run_id",
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.min("o_orderdate").alias("valid_from"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
    )
    wv = W.partitionBy("custkey").orderBy("run_id")
    lead_from = F.lead("valid_from").over(wv)
    return hist.select(
        "custkey",
        F.col("run_id").alias("version"),
        "priority",
        "valid_from",
        lead_from.alias("valid_to"),
        F.when(lead_from.isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_current"),
        "n_orders",
    )


@register(
    "set_except_all",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference (EXCEPT ALL): keeps left multiplicities minus
    right multiplicities — the multiset sibling of set_except, and the
    semantics reconciliation jobs actually need ("how many surplus
    rows does the left feed have per key"). Spark's exceptAll plans as
    a count-tagged aggregate + generate, no full sort."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    return c.exceptAll(s)


@register(
    "set_intersect_all",
    oracle="""
    SELECT c_nationkey AS nk FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (INTERSECT ALL): min of left/right
    multiplicities per row — completes the SQL-standard set-operation
    family (UNION/UNION ALL/INTERSECT/INTERSECT ALL/EXCEPT/EXCEPT
    ALL, all driver-checked)."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    )
    return c.intersectAll(s)


@register(
    "merge_snapshot_diff",
    oracle="""
    WITH a AS (
      SELECT o_orderkey AS k,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderstatus AS st
      FROM orders
    ),
    b AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 10 = 0
                  THEN CAST(round(o_totalprice * 100) AS BIGINT) + 500
                  ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents,
             o_orderstatus AS st
      FROM orders WHERE o_orderkey % 13 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000 AS k,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             'N' AS st
      FROM orders WHERE o_orderkey % 37 = 0
    ),
    d AS (
      SELECT coalesce(a.k, b.k) AS okey,
             CASE WHEN b.k IS NULL THEN 'delete'
                  WHEN a.k IS NULL THEN 'insert'
                  WHEN a.cents <> b.cents OR a.st <> b.st THEN 'update'
                  ELSE 'unchanged' END AS action,
             a.cents AS old_cents,
             b.cents AS new_cents
      FROM a FULL OUTER JOIN b ON a.k = b.k
    )
    SELECT okey, action, old_cents, new_cents
    FROM d WHERE action <> 'unchanged'
    """,
)
def merge_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — DERIVE a CDC change set by comparing two table
    snapshots: classify every key as insert / update / delete (emitting
    old and new values) and drop the unchanged majority.  The inverse
    of merge_upsert (which APPLIES a change set): together they are the
    reconcile-and-replay loop every lakehouse ingestion pipeline runs
    when the upstream cannot produce a change log itself.

    Snapshot B is built deterministically from snapshot A (orders):
    keys %13 deleted, %10 price-bumped by 500 cents, %37 re-inserted
    under shifted keys — all comparisons in exact integer cents.

    100 TB shape: ONE co-partitioned shuffle each side for the
    full-outer sort-merge join on the primary key (ZERO shuffles when
    both snapshots are bucketed on it — the layout a nightly diff job
    would maintain); classification is pure codegen null-side /
    inequality tests.  For wide rows the equality test collapses to a
    16-byte fingerprint compare (md5 of the concatenated business
    columns) computed scan-side, so the join carries key + fingerprint
    only and re-reads full rows just for the changed sliver.  Output
    is only that sliver — the diff of a 100 TB snapshot pair is
    typically GBs, never a second copy of the table."""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    a = o.select(
        F.col("o_orderkey").alias("a_k"),
        cents.alias("a_cents"),
        F.col("o_orderstatus").alias("a_st"),
    )
    b_upd = o.filter(F.col("o_orderkey") % 13 != 0).select(
        F.col("o_orderkey").alias("b_k"),
        F.when(F.col("o_orderkey") % 10 == 0, cents + 500)
        .otherwise(cents)
        .alias("b_cents"),
        F.col("o_orderstatus").alias("b_st"),
    )
    b_ins = o.filter(F.col("o_orderkey") % 37 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("b_k"),
        cents.alias("b_cents"),
        F.lit("N").alias("b_st"),
    )
    b = b_upd.unionByName(b_ins)
    d = a.join(b, a.a_k == b.b_k, "full_outer").select(
        F.coalesce("a_k", "b_k").alias("okey"),
        F.when(F.col("b_k").isNull(), F.lit("delete"))
        .when(F.col("a_k").isNull(), F.lit("insert"))
        .when(
            (F.col("a_cents") != F.col("b_cents"))
            | (F.col("a_st") != F.col("b_st")),
            F.lit("update"),
        )
        .otherwise(F.lit("unchanged"))
        .alias("action"),
        F.col("a_cents").alias("old_cents"),
        F.col("b_cents").alias("new_cents"),
    )
    return d.filter(F.col("action") != "unchanged")


@register(
    "merge_incremental_agg",
    oracle="""
    SELECT o_custkey AS custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS sum_cents,
           CAST(min(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS min_cents,
           CAST(max(CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS max_cents,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                // count(*) AS BIGINT) AS avg_cents
    FROM orders
    WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
      AND o_orderdate IS NOT NULL
    GROUP BY o_custkey
    """,
)
def merge_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance — the materialized-view
    refresh pattern: yesterday's stored per-customer aggregate
    (history: orders before 2001-01-01) merged with the new delta's
    aggregate (orders from 2001-01-01 on) via pure merge algebra —
    counts and sums add, min/max compose with least/greatest, avg is
    re-derived from the merged sum/count.  THE ORACLE IS THE FULL
    RESCAN: the driver's hash gate proves the algebra equals the
    recompute, which is the whole correctness obligation of an
    incremental refresh job.

    100 TB shape: the nightly refresh aggregates ONLY the delta
    partition (a day of data) and merges it into the stored aggregate
    with one co-partitioned full-outer join on the key — never
    rescanning history.  At fixture scale both branches read the same
    file (partition pruning on o_orderdate splits them — the date
    filters reach the scan); in a partitioned lakehouse layout the
    history branch IS the stored table.  avg from merged sums, never
    averaged averages."""
    # NULL o_orderdate rows are excluded on BOTH sides: a date-
    # partitioned refresh has no partition to place them in, and
    # without this filter they fall out of hist AND delta while the
    # full-rescan oracle would count them (caught by code review on a
    # NULL-ridden snapshot).
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull()
        & F.col("o_totalprice").isNotNull()
        & F.col("o_orderdate").isNotNull()
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")

    def agg(df, suffix):
        return df.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.count(F.lit(1)).cast("long").alias(f"n{suffix}"),
            F.sum(cents).cast("long").alias(f"s{suffix}"),
            F.min(cents).alias(f"mn{suffix}"),
            F.max(cents).alias(f"mx{suffix}"),
        )
    hist = agg(o.filter(F.col("o_orderdate") < "2001-01-01"), "1")
    delta = agg(
        o.filter(F.col("o_orderdate") >= "2001-01-01"), "2"
    ).withColumnRenamed("custkey", "custkey2")
    m = hist.join(
        delta, hist.custkey == delta.custkey2, "full_outer"
    ).select(
        F.coalesce("custkey", "custkey2").alias("custkey"),
        (F.coalesce("n1", F.lit(0)) + F.coalesce("n2", F.lit(0))).alias(
            "n_orders"
        ),
        (F.coalesce("s1", F.lit(0)) + F.coalesce("s2", F.lit(0))).alias(
            "sum_cents"
        ),
        F.least(
            F.coalesce("mn1", "mn2"), F.coalesce("mn2", "mn1")
        ).alias("min_cents"),
        F.greatest(
            F.coalesce("mx1", "mx2"), F.coalesce("mx2", "mx1")
        ).alias("max_cents"),
    )
    return m.withColumn(
        "avg_cents", F.expr("sum_cents DIV n_orders")
    )
