"""Join operators (SURVEY §2.3).

Scale posture per join type:
- equi-joins: let Catalyst/AQE pick sort-merge vs shuffled-hash; at
  100 TB pre-bucketing both sides on the join key removes the shuffle.
- dimension joins: explicit `F.broadcast` — deterministic broadcast
  regardless of autoBroadcastJoinThreshold stats at scale.
- range/theta joins: keep the small side broadcast (BroadcastNestedLoop)
  or pre-bucket time into bands so the pair space is bounded.
- as-of join: Spark has no native ASOF — implemented as a single-shuffle
  union + last(ignorenulls) window (scales linearly; no n×m pair blowup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.registry import register


@register(
    "join_inner_equi",
    oracle="""
    SELECT o.o_orderkey AS orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderkey
    LIMIT 10
    """,
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — the bench `q3_join_agg_topk`. customer⋈orders⋈
    lineitem with selective filters pushed below the joins by Catalyst;
    AQE turns the customer side into a broadcast after filtering."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-03-15")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderkey").alias("orderkey"), F.col("o_orderdate").alias("orderdate"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("orderkey", "revenue", "orderdate")
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )


@register(
    "join_broadcast",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           count(*) AS n_cust, round(avg(c.c_acctbal), 4) AS avg_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dim join with explicit broadcast hints — at 100 TB
    the fact side streams; no shuffle of the big table at all."""
    c = table(spark, sf_dir, "customer")
    n = F.broadcast(table(spark, sf_dir, "nation"))
    r = F.broadcast(table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
    )


@register(
    "join_left",
    oracle="""
    SELECT c.c_custkey AS custkey,
           count(o.o_orderkey) AS n_orders,
           round(coalesce(sum(o.o_totalprice), 0), 2) AS spend
    FROM customer c
    LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join keeping order-less customers (count=0 rows)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy(F.col("c_custkey").alias("custkey"))
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("spend"),
        )
    )


@register(
    "join_right",
    oracle="""
    SELECT n.n_name AS nation, count(s.s_suppkey) AS n_supp
    FROM supplier s
    RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join — nations keep a row even with zero suppliers."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("s_suppkey").alias("n_supp"))
    )


@register(
    "join_full",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, count(*) AS nc FROM customer GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, count(*) AS ns FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(c.nk, s.nk) AS nk,
           coalesce(c.nc, 0) AS n_cust,
           coalesce(s.ns, 0) AS n_supp
    FROM c FULL JOIN s ON c.nk = s.nk
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregates (nations present on either side)."""
    c = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    s = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("ns"))
    )
    return c.join(s, c.c_nk == s.s_nk, "full").select(
        F.coalesce(F.col("c_nk"), F.col("s_nk")).alias("nk"),
        F.coalesce(F.col("nc"), F.lit(0)).alias("n_cust"),
        F.coalesce(F.col("ns"), F.lit(0)).alias("n_supp"),
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join ≡ EXISTS — emits left rows once, never duplicates."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join ≡ NOT EXISTS (join key is non-null in fixture, so
    NOT IN and NOT EXISTS agree)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_theta_range",
    oracle="""
    SELECT b.band AS band, count(*) AS n_parts, round(avg(p.p_retailprice), 4) AS avg_price
    FROM part p
    JOIN (VALUES ('budget', 0.0, 1000.0),
                 ('mid', 1000.0, 1500.0),
                 ('premium', 1500.0, 1e9)) b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    """,
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band join. Small side broadcast → BroadcastNestedLoop;
    at 100 TB the band table stays tiny so this remains a map-side join."""
    p = table(spark, sf_dir, "part")
    bands = F.broadcast(
        spark.createDataFrame(
            [("budget", 0.0, 1000.0), ("mid", 1000.0, 1500.0), ("premium", 1500.0, 1e9)],
            "band string, lo double, hi double",
        )
    )
    return (
        p.join(bands, (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
    )


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name AS region, s.st AS status
    FROM region r CROSS JOIN (SELECT DISTINCT o_orderstatus AS st FROM orders) s
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product (both sides tiny by construction)."""
    r = table(spark, sf_dir, "region").select(F.col("r_name").alias("region"))
    s = table(spark, sf_dir, "orders").select(F.col("o_orderstatus").alias("st")).distinct()
    return r.crossJoin(s).select("region", F.col("st").alias("status"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_on: str = "ts",
    right_on: str = "ts",
    strict: bool = False,
) -> DataFrame:
    """Generic as-of join: every left row ↔ the latest right row whose
    `right_on` is at-or-before (`strict=False`, pandas/DuckDB `>=`) or
    strictly-before (`strict=True`) the left row's `left_on`, per `by`
    key. Left rows with no prior right row keep NULLs (left-outer).

    Spark has no native ASOF join; a range join explodes to
    O(left × right-within-range) pairs. This is the scalable encoding:
    union both sides, ONE shuffle on the key, and carry the right
    side's columns forward with `last(ignorenulls)` over an ordered
    window — linear in rows, no pair blowup, the same plan shape at any
    scale. Right columns come back suffixed `_asof`
    (`<right_on>_asof` for the time column).

    Equal-timestamp semantics: at `strict=False` the right row sorts
    BEFORE the left row (kind 0 < 1) so it is visible; at `strict=True`
    after, so it is not. Multiple right rows at the same (key, ts):
    ties are broken by whichever sorts last — make the right side
    unique per (key, ts) if that matters (pandas merge_asof keeps the
    last occurrence, which matches this window's `last`).
    """
    rcols = [c for c in right.columns if c != by]
    lcols = [c for c in left.columns]
    r = right.select(
        F.col(by),
        F.col(right_on).alias("_ord"),
        F.lit(0 if not strict else 1).alias("_kind"),
        *[F.col(c).alias(f"{c}_asof") for c in rcols],
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c != by],
    )
    l = left.select(
        F.col(by),
        F.col(left_on).alias("_ord"),
        F.lit(1 if not strict else 0).alias("_kind"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}_asof") for c in rcols],
        *[F.col(c) for c in lcols if c != by],
    )
    w = (
        W.partitionBy(by)
        .orderBy("_ord", "_kind")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    left_kind = 1 if not strict else 0
    out = r.unionByName(l)
    for c in rcols:
        out = out.withColumn(f"{c}_asof", F.last(f"{c}_asof", ignorenulls=True).over(w))
    return out.filter(F.col("_kind") == left_kind).select(
        by, *[c for c in lcols if c != by], *[f"{c}_asof" for c in rcols]
    )


@register(
    "join_asof",
    oracle="""
    SELECT p.event_id AS event_id, p.user_id AS user_id,
           p.ts AS purchase_ts, v.ts AS last_view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join: each purchase ↔ the latest view at-or-before it.

    Delegates to the generic `asof_join` (union + last(ignorenulls)
    window — ONE shuffle on user_id, linear in events, no range-join
    pair explosion; property-tested against pandas merge_asof in
    tests/test_core.py). `strict=False` matches DuckDB ASOF's `>=`.
    """
    e = table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select("user_id", "ts")
    p = e.filter(F.col("event_type") == "purchase").select("user_id", "ts", "event_id")
    return asof_join(p, v, by="user_id").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("ts_asof").alias("last_view_ts"),
    )


@register(
    "join_interval",
    oracle="""
    SELECT a.user_id AS user_id, count(*) AS n_pairs
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
    WHERE a.event_type = 'error' AND b.event_type = 'error'
    GROUP BY a.user_id
    """,
)
def join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: error pairs within 5 minutes per user.

    Partitioned by user so the pair space is per-user-bounded; at 100 TB
    add a coarse time-bucket equi-key (floor(ts/5min) self-join on
    adjacent buckets) to keep it sort-merge-friendly instead of
    nested-loop — noted in SCALE.md.
    """
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    a = e.alias("a")
    b = e.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("a.ts"))
            & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "join_skew_salted",
    oracle="""
    WITH dim AS (
      SELECT event_type, max(value) * 0.5 AS thresh
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, count(*) AS n_above
    FROM events e
    JOIN dim d ON e.event_type = d.event_type
    WHERE e.value > d.thresh
    GROUP BY e.event_type
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated dimension join: events.event_type has a handful of
    hot keys (power-law — the pathological shuffle-join case at 100 TB),
    so the fact side gets a deterministic salt (hash of the unique id,
    NOT rand() — reruns and retried tasks must salt identically) and the
    dim side is exploded ×16; the equi-join on (event_type, _salt) then
    spreads each hot key over 16 partitions. The oracle is the UNSALTED
    join — proving the salting is a pure physical rewrite. The max-based
    threshold keeps the float comparison accumulation-order-exact.
    AQE's skew-join handles moderate skew without this; the helper is
    for keys hot enough that a single salt-free partition would spill."""
    from spark_cep_spark.plans.scale import explode_salts

    e = table(spark, sf_dir, "events")
    dim = e.groupBy("event_type").agg((F.max("value") * 0.5).alias("thresh"))
    n_salts = 16
    salted = e.withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salts)).cast("int")
    )
    j = salted.join(explode_salts(dim, n_salts), ["event_type", "_salt"])
    return (
        j.filter(F.col("value") > F.col("thresh"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )


def interval_join_banded(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lo_us: int,
    hi_us: int,
) -> DataFrame:
    """Interval join as a PURE equi-join: pairs where
    right_ts − left_ts ∈ (lo_us, hi_us] microseconds, with matching
    `keys` columns. The band becomes an equi-key: rights land in
    fixed-width time buckets (width = band span), lefts explode to the
    ≤2 buckets their band can touch, the join runs sort-merge/hash on
    (keys…, bucket), and the exact predicate filters afterwards.

    This is the 100 TB posture for interval joins: the naive range
    condition rides along an equi-join only while a keys column exists
    and its groups stay small; a hot key degrades to a per-key
    cartesian. Bucketing bounds every join group by (keys × width)
    regardless of skew, keeps the plan in SortMergeJoin/ShuffledHash
    (never BroadcastNestedLoop), and each qualifying pair meets exactly
    once (the right's single bucket picks exactly one left expansion).
    Non-key column names must be disjoint — project before joining.
    """
    if hi_us <= lo_us:
        raise ValueError(f"empty band: ({lo_us}, {hi_us}]")
    width = hi_us - lo_us
    l = left.withColumn("_lus", F.unix_micros(F.col(left_ts)))
    r = right.withColumn("_rus", F.unix_micros(F.col(right_ts))).withColumn(
        "_bkt", F.floor(F.col("_rus") / F.lit(width))
    )
    lb = l.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor((F.col("_lus") + F.lit(lo_us)) / F.lit(width)),
                F.floor((F.col("_lus") + F.lit(hi_us)) / F.lit(width)),
            )
        ),
    )
    return (
        lb.join(r, keys + ["_bkt"])
        .filter(
            (F.col("_rus") > F.col("_lus") + F.lit(lo_us))
            & (F.col("_rus") <= F.col("_lus") + F.lit(hi_us))
        )
        .drop("_bkt", "_lus", "_rus")
    )


@register(
    "join_interval_banded",
    oracle="""
    SELECT a.user_id AS user_id, count(*) AS n_pairs
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 5 MINUTE
    WHERE a.event_type = 'error' AND b.event_type = 'error'
    GROUP BY a.user_id
    """,
)
def join_interval_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """join_interval's scale rewrite: identical semantics (error pairs
    within 5 minutes per user — same oracle), but the band is an
    equi-key so the plan is a plain SortMergeJoin on
    (user_id, bucket) with no range condition in the join itself."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    a = e.select("user_id", F.col("ts").alias("a_ts"))
    b = e.select("user_id", F.col("ts").alias("b_ts"))
    five_min_us = 5 * 60 * 1_000_000
    return (
        interval_join_banded(a, b, ["user_id"], "a_ts", "b_ts", 0, five_min_us)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "join_asof_tolerance",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           CASE WHEN v.ts >= p.ts - INTERVAL 1 HOUR THEN v.ts END
             AS last_view_ts,
           v.ts IS NOT NULL AND v.ts >= p.ts - INTERVAL 1 HOUR
             AS attributed
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join with a tolerance (pandas merge_asof `tolerance=`):
    each purchase ↔ the latest view at-or-before it, but only if that
    view is within 1 hour — the attribution-window join. Tolerance
    composes on top of the linear asof_join encoding as a post-filter
    (the latest-before row is unaffected by discarding older ones), so
    the plan is still ONE shuffle on user_id, no range-join pair
    explosion. Left rows keep NULL + attributed=false when the match
    is stale or absent — attribution reports need the unattributed
    denominator."""
    e = table(spark, sf_dir, "events")
    v = e.filter(F.col("event_type") == "view").select("user_id", "ts")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(p, v, by="user_id")
    in_window = F.col("ts_asof") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(in_window, F.col("ts_asof")).alias("last_view_ts"),
        F.coalesce(in_window, F.lit(False)).alias("attributed"),
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
         agg AS (
           SELECT p.event_id, p.user_id, p.ts,
                  (min(CASE WHEN v.ts IS NOT NULL THEN
                       {'d': abs(epoch_us(v.ts) - epoch_us(p.ts)),
                        't': v.ts} END)).t AS nearest_view_ts
           FROM p LEFT JOIN v ON v.user_id = p.user_id
                AND abs(epoch_us(v.ts) - epoch_us(p.ts)) <= 86400000000
           GROUP BY p.event_id, p.user_id, p.ts)
    SELECT event_id, user_id, ts AS purchase_ts, nearest_view_ts,
           CASE WHEN nearest_view_ts IS NULL THEN NULL
                WHEN nearest_view_ts <= ts THEN 'before'
                ELSE 'after' END AS side
    FROM agg
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join, direction='nearest' (pandas merge_asof's third
    mode, the variant join_asof/join_asof_tolerance don't cover):
    each purchase ↔ the CLOSEST view in either direction within a 24h
    tolerance, ties preferring the earlier (before) view; left-outer
    (unmatched purchases keep NULL + NULL side).

    100 TB shape: the same union + ordered-window encoding as
    asof_join run in BOTH directions over ONE shuffle on (user_id,
    (ts, kind)) — backward candidate = last view at-or-before the
    purchase (running last(ignorenulls)), forward candidate = first
    view strictly after (mirrored first(ignorenulls) over the
    following frame), then a per-row 3-way CASE picks the nearer.
    Linear in events, no range-join pair explosion; the oracle's
    |Δts| <= 24h range join is the O(pairs) plan this avoids."""
    e = table(spark, sf_dir, "events")
    tol_us = 24 * 3600 * 1_000_000
    v = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("_ord"),
        F.lit(0).alias("_kind"),
        F.col("ts").alias("_vts"),
        F.lit(None).cast("long").alias("event_id"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("_ord"),
        F.lit(1).alias("_kind"),
        F.lit(None).cast("timestamp").alias("_vts"),
        "event_id",
    )
    u = v.unionByName(p)
    w = W.partitionBy("user_id").orderBy("_ord", "_kind")
    # window columns MUST be materialized before the kind filter — a
    # window expression evaluated on the filtered frame would only see
    # purchase rows (all-NULL _vts) and carry nothing
    u = u.withColumn(
        "_prev",
        F.last("_vts", ignorenulls=True).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    ).withColumn(
        "_next",
        F.first("_vts", ignorenulls=True).over(
            w.rowsBetween(W.currentRow, W.unboundedFollowing)
        ),
    )
    prev, nxt = F.col("_prev"), F.col("_next")
    prev_d = F.unix_micros("_ord") - F.unix_micros(prev)
    next_d = F.unix_micros(nxt) - F.unix_micros("_ord")
    prev_ok = prev.isNotNull() & (prev_d <= tol_us)
    next_ok = nxt.isNotNull() & (next_d <= tol_us)
    nearest = (
        F.when(prev_ok & (~next_ok | (prev_d <= next_d)), prev)
        .when(next_ok, nxt)
    )
    return (
        u.filter(F.col("_kind") == 1)
        .select(
            "event_id",
            "user_id",
            F.col("_ord").alias("purchase_ts"),
            nearest.alias("nearest_view_ts"),
            F.when(nearest.isNull(), F.lit(None).cast("string"))
            .when(nearest <= F.col("_ord"), "before")
            .otherwise("after")
            .alias("side"),
        )
    )


@register(
    "join_bucketed",
    oracle="""
    SELECT o.o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(CAST(round(l.l_extendedprice * (100 -
                     CAST(round(l.l_discount * 100) AS BIGINT)))
                     AS BIGINT)) / 10000.0, 2) AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located fact⋈fact join via BUCKETED layout: both
    sides are persisted bucketed+sorted on the join key
    (plans/scale.write_bucketed), so the SortMergeJoin reads matching
    buckets directly — NO Exchange and NO per-query Sort on either
    side (tests/test_plans.py pins the exchange-free plan for this
    layout). This is the pay-once-at-write-time answer for the join
    every pipeline repeats at 100 TB; the result itself is checked
    against the plain-join oracle, proving layout never changes
    semantics.

    Revenue is accumulated as exact integer (price-cents × discount
    basis points) so engine summation order can't flip the hash. The
    bucketed copies live under the repo scratch dir, keyed by sf so
    tiers don't collide; they are rewritten only when absent (write
    once, join many — the actual production economics)."""
    import os

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
        ".tmp",
        f"bucketed_{tag}",
    )
    n_buckets = 8
    names = {}
    for t, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        name = f"b_{tag}_{t}"
        names[t] = name
        path = os.path.join(scratch, t)
        if not (
            spark.catalog.tableExists(name)
            and os.path.exists(os.path.join(path, "_SUCCESS"))
        ):
            from spark_cep_spark.plans.scale import write_bucketed

            write_bucketed(
                table(spark, sf_dir, t), name, [key], n_buckets, path
            )
    li = spark.table(names["lineitem"])
    o = spark.table(names["orders"])
    disc_bp = F.round(F.col("l_discount") * 100).cast("long")
    rev_int = F.round(F.col("l_extendedprice") * (100 - disc_bp)).cast("long")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_items"),
            F.round(F.sum(rev_int) / 10000.0, 2).alias("revenue"),
        )
    )


@register(
    "join_star_q5",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * CAST(round((1 - l.l_discount) * 100) AS BIGINT))
                AS BIGINT) AS revenue_e4
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate <  DATE '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue_e4 DESC, n.n_name
    """,
)
def join_star_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume) — the canonical snowflake
    star join: region -> nation -> customer -> orders -> lineitem,
    with the supplier constrained to the customer's nation (the join
    that makes Q5 a join-ORDER benchmark). Declared as plain
    DataFrame joins: Catalyst broadcasts the filtered dimension chain
    (region' -> nation' is a handful of rows, supplier/customer are
    fact-fraction-sized after the region filter at real SF) under
    AQE's size rules — no forced hints — and the two fact tables
    shuffle-join on orderkey. Revenue in exact integer 1e-4 units
    (cents x (1-d) in percent) so Spark and DuckDB sum bit-equal
    regardless of partial-aggregation order."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(
            s,
            (s.s_suppkey == li.l_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(n, n.n_nationkey == c.c_nationkey)
        .join(r, r.r_regionkey == n.n_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), "n_name")
    )


@register(
    "join_star_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * CAST(round((1 - l.l_discount) * 100) AS BIGINT))
                AS BIGINT) AS revenue_e4
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= DATE '1996-01-01'
      AND o.o_orderdate <  DATE '1996-07-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue_e4 DESC, c.c_custkey LIMIT 20
    """,
)
def join_star_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): top-20 customers by lost
    revenue from returned lineitems in a half-year window. The classic
    fact-fact-dim plan: both selective filters (returnflag on
    lineitem, date range on orders) push to the parquet scans, the
    fact join shuffles on orderkey, nation broadcasts, and the final
    top-20 is orderBy+limit = TakeOrderedAndProject (per-partition
    heap, never a global sort of all customers). Revenue in exact
    integer 1e-4 units as in join_star_q5."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    n = table(spark, sf_dir, "nation")
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(n, n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).alias("revenue_e4"))
        .orderBy(F.desc("revenue_e4"), "c_custkey")
        .limit(20)
    )


@register(
    "join_star_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS BIGINT)) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(round(o.o_totalprice * 100) AS BIGINT)
             AS totalprice_cents,
           b.total_qty
    FROM big b
    JOIN orders o   ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY totalprice_cents DESC, o.o_orderdate, o.o_orderkey
    LIMIT 100
    """,
)
def join_star_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total lineitem
    quantity exceeds 300, with the customer and order header, top-100
    by order value. The textbook spelling re-joins lineitem to
    re-aggregate the quantity inside the outer GROUP BY; since the
    HAVING subquery has already computed exactly that sum, this plan
    CARRIES it through the join instead — one lineitem scan + one
    orderkey-partial-combined aggregation (map-side partials, the
    HAVING filter drops ~99% of orders before any join), then two
    equi-joins where the filtered `big` side is small enough for AQE
    to broadcast. Quantities are integral by TPC-H construction, so
    the sum is exact BIGINT arithmetic; order value in exact cents.
    Top-100 is orderBy+limit = TakeOrderedAndProject on the
    (cents, date, orderkey) total order — deterministic at the limit
    boundary on both engines."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("total_qty")
        )
        .filter(F.col("total_qty") > 300)
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("totalprice_cents"),
            "total_qty",
        )
        .orderBy(
            F.desc("totalprice_cents"), "o_orderdate", "o_orderkey"
        )
        .limit(100)
    )


@register(
    "join_bloom_pruned",
    oracle="""
    SELECT l.l_returnflag AS returnflag,
           count(*) AS n_items,
           CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * CAST(round((1 - l.l_discount) * 100) AS BIGINT))
                AS BIGINT) AS revenue_e4
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag
    """,
)
def join_bloom_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction: prune the fact table with a
    broadcast Bloom bitset BEFORE the shuffle join, then run the exact
    equi-join so false positives cannot leak into the result.

    The classic 100 TB move when a selective dimension filter implies
    only a sliver of the fact matters: shuffling all of lineitem to
    join a 1%-selective orders subset wastes the network.  Runtime
    row-level filtering in Spark does this automatically only when
    stats line up; this operator is the explicit, deterministic form:

    1. Distinct dim keys (orders with o_orderpriority = '1-URGENT').
    2. Size the filter from the key count: m = 2^ceil(log2(10·n_keys))
       bits (~10 bits/key → ~1% FP rate), floor 2^10, cap 2^23.  Past
       the cap the dim is no longer selective and the plain AQE join
       is the right plan anyway — the bloom is for small-but-not-
       broadcastable-fact situations.
    3. Build the bitset DISTRIBUTED: explode k=3 seeded xxhash64 bit
       positions per key, map to (word, bit) pairs, bit_or-aggregate
       into at most m/64 longs (map-side partial combine), and collect
       only those words — a bounded-by-construction collect of at most
       2^17 longs (1 MiB) at the cap, independent of table size.
    4. Probe: a pure-codegen membership predicate (element_at + bit
       test, no UDF) filters the fact scan before any shuffle; seeds
       are written as BIGINT literals on BOTH sides because xxhash64
       is type-width-sensitive (an INT seed at build time and a LONG
       seed at probe time silently produce false negatives — found
       live while building this).
    5. The exact join + aggregation afterwards removes the ~1% false
       positives, so the oracle is the plain join: the bloom changes
       the plan, never the answer.

    At sf0.001 the probe keeps 1,168 of 6,000 fact rows (1,147 true
    matches + 21 FPs) — an 81% shuffle-volume cut for a 4 KiB bitset.
    """
    seeds = (11, 37, 71)
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    dim_keys = o.select("o_orderkey").distinct()
    n_keys = dim_keys.count()
    m = 1 << min(23, max(10, (10 * max(n_keys, 1) - 1).bit_length()))
    pos = dim_keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(
                            F.lit(s).cast("bigint"), F.col("o_orderkey")
                        ),
                        F.lit(m),
                    )
                    for s in seeds
                ]
            )
        ).alias("pos")
    )
    words = (
        pos.select(
            F.expr("CAST(pos / 64 AS INT)").alias("w"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        # Bounded collect: at most m/64 <= 2^17 longs by construction.
        .collect()
    )
    bitset = [0] * (m // 64)
    for r in words:
        bitset[r["w"]] |= r["bits"]

    li = table(spark, sf_dir, "lineitem")
    cond = None
    for s in seeds:
        t = F.expr(
            f"(element_at(__bloom__, CAST(pmod(xxhash64({s}L, l_orderkey),"
            f" {m}) / 64 AS INT) + 1) & shiftleft(1L,"
            f" CAST(pmod(xxhash64({s}L, l_orderkey), {m}) % 64 AS INT)))"
            " != 0"
        )
        cond = t if cond is None else (cond & t)
    # Ship the bitset as DATA in a broadcast one-row frame, NOT as a
    # literal column: F.lit(list) compiles to CreateArray over m/64
    # Literal children, an array REBUILT PER PROBED ROW (the 8x facts
    # probe caught this live — 5.4 s base and ~linear growth; with the
    # broadcast row the probe is a shared-array element_at, sub-second).
    bitset_df = spark.createDataFrame([(bitset,)], "__bloom__ array<bigint>")
    probe = (
        li.crossJoin(F.broadcast(bitset_df)).where(cond).drop("__bloom__")
    )
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        probe.join(o, probe.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(rev).alias("revenue_e4"),
        )
    )


@register(
    "join_scd2_pit",
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
             min(o_orderdate) AS valid_from
      FROM runs GROUP BY o_custkey, run_id, o_orderpriority
    ),
    ver AS (
      SELECT custkey, run_id AS version, priority, valid_from,
             lead(valid_from) OVER (PARTITION BY custkey ORDER BY run_id)
               AS valid_to
      FROM hist
    )
    SELECT o.o_orderkey AS okey, o.o_custkey AS custkey,
           v.version AS version, v.priority AS dim_priority,
           CASE WHEN v.priority = o.o_orderpriority THEN 1 ELSE 0 END
             AS is_own_version
    FROM orders o
    JOIN ver v
      ON v.custkey = o.o_custkey
     AND o.o_orderdate >= v.valid_from
     AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
    WHERE o.o_custkey % 50 = 0
    """,
)
def join_scd2_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join: look every fact row up against the
    SCD2 dimension VERSION that was current at the fact's timestamp —
    the feature-store / as-was-reporting pattern, composed directly on
    merge_scd2's versioned history ([valid_from, valid_to) intervals,
    NULL-open current version).

    Same-date version flips make the lookup non-trivial: a run whose
    whole validity collapses to one timestamp is an EMPTY interval, so
    facts at that timestamp resolve to the NEXT version — exactly the
    date-granularity ambiguity every PIT join has to pin down, and the
    is_own_version flag exposes it (oracle and engine must agree row
    for row).

    100 TB shape: the join is EQUI on the dimension key with the
    interval test as a residual filter — Spark plans the custkey
    shuffle (or broadcast: SCD2 histories are dimension-sized, AQE
    decides) and evaluates the range residual in codegen against the
    handful of versions per key.  No interval explosion, no
    time-bucketing needed, because SCD2 versions per key are few and
    bounded — the general interval-join machinery (join_interval /
    join_interval_banded) is for when THAT assumption breaks."""
    from spark_cep_spark.operators.relational import merge_scd2

    hist = merge_scd2(spark, sf_dir).select(
        "custkey", F.col("version"), "priority", "valid_from", "valid_to"
    )
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 50 == 0)
    j = o.join(
        hist,
        (o.o_custkey == hist.custkey)
        & (o.o_orderdate >= hist.valid_from)
        & (hist.valid_to.isNull() | (o.o_orderdate < hist.valid_to)),
    )
    return j.select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("custkey"),
        "version",
        F.col("priority").alias("dim_priority"),
        F.when(F.col("priority") == F.col("o_orderpriority"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_own_version"),
    )


@register(
    "join_null_safe",
    oracle="""
    WITH c AS (
      SELECT c_custkey, NULLIF(c_nationkey % 5, 0) AS grp FROM customer
    ),
    s AS (
      SELECT s_suppkey, NULLIF(s_nationkey % 5, 0) AS grp FROM supplier
    )
    SELECT c.grp AS grp,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_cust,
           CAST(count(DISTINCT s.s_suppkey) AS BIGINT) AS n_supp
    FROM c JOIN s ON c.grp IS NOT DISTINCT FROM s.grp
    GROUP BY c.grp
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of vanishing — the semantics
    reconciliation and dimension-with-unknowns joins need (a plain
    equi-join silently drops every NULL-keyed row from both sides).
    The derived key NULLIF(nationkey % 5, 0) plants a real NULL cohort
    so the fixture exercises the NULL⋈NULL group.

    100 TB shape: Spark treats EqualNullSafe as a HASH-JOIN key (it
    compiles to coalesce-tagged equality), so the plan is the same
    shuffled/broadcast equi-join as `=` — NOT a nested loop; pinned in
    tests. One shuffle each side on the tagged key."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", F.expr("NULLIF(c_nationkey % 5, 0)").alias("c_grp")
    )
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.expr("NULLIF(s_nationkey % 5, 0)").alias("s_grp")
    )
    return (
        c.join(s, c.c_grp.eqNullSafe(s.s_grp))
        .groupBy(F.col("c_grp").alias("grp"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.countDistinct("c_custkey").cast("long").alias("n_cust"),
            F.countDistinct("s_suppkey").cast("long").alias("n_supp"),
        )
    )
