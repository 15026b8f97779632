"""Distribution-drift diagnostics — the monitoring layer a
training-data pipeline runs between corpus snapshots, ingest cohorts,
or time windows: Population Stability Index (PSI, the standard
feature-drift score) and the two-sample Kolmogorov–Smirnov statistic
on a fixed bin grid.

Design for 100 TB: every operator reduces the raw table to FIXED-SIZE
integer bin counts first (one map-side-combined hash aggregation; the
float work happens on ≤ a few dozen numbers per group), so cost is
one scan + one fixed-width shuffle regardless of data size. Float
discipline: bin counts are exact BIGINTs on both engines; PSI sums
its 10 per-bin terms in ONE spelled-out fixed order (no
accumulation-order noise), KS does all comparisons in cross-multiplied
exact integers and divides once at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.registry import register

# 10 equal-width value bins [0, 50), [50, 100), ... [450, inf); the
# under/overflow rows clamp into the edge bins so no event is dropped.
_N_PSI_BINS = 10
_PSI_WIDTH = 50


def _bin_expr_sql(width: int, n_bins: int) -> str:
    """The shared bin assignment, spelled identically in Spark SQL and
    DuckDB: one IEEE division, floor, clamp — clamped while still
    DOUBLE so an extreme value (1e308) cannot overflow the ANSI cast."""
    return (
        f"CAST(GREATEST(LEAST(floor(value / {width}), "
        f"{n_bins - 1}), 0) AS INT)"
    )


def _psi_sum_sql(cur: str, ctot: str, ref: str, rtot: str, n: int) -> str:
    """The PSI sum over n bins with Laplace +0.5 smoothing, as ONE
    fixed-order expression — `cur`/`ref` are printf-style column-name
    templates ('c{i}'). Identical text runs on both engines, so the
    accumulation order (left-to-right) is identical too.

    The smoothing literal is spelled `0.5e0` — identical TEXT is not
    enough, the literal must parse to the same TYPE: Spark reads a
    bare `0.5` as DECIMAL, so `(count + 0.5) / (total + 5.0)` ran the
    whole chain in truncated decimal arithmetic (~1e-8 relative error)
    while DuckDB's division promoted to DOUBLE — invisible under
    round(·,6) until an sf0.001 value landed within 5e-8 of a rounding
    boundary (stream_drift_psi, caught by the full small-SF sweep).
    Scientific notation parses as DOUBLE in BOTH engines."""
    terms = []
    for i in range(n):
        p = f"(({cur.format(i=i)} + 0.5e0) / ({ctot} + {n}*0.5e0))"
        q = f"(({ref.format(i=i)} + 0.5e0) / ({rtot} + {n}*0.5e0))"
        terms.append(f"(({p}) - ({q})) * ln(({p}) / ({q}))")
    return " + ".join(terms)


def _psi_counts(events: DataFrame, group_cols: list) -> DataFrame:
    """ONE hash aggregation producing the fixed-width count row per
    group: total + one conditional count per bin for the reference
    (even user_id) and current (everything else) cohorts."""
    b = events.filter("value IS NOT NULL").selectExpr(
        *group_cols,
        f"{_bin_expr_sql(_PSI_WIDTH, _N_PSI_BINS)} AS bin",
        "CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_ref",
    )
    aggs = [
        F.expr("CAST(sum(is_ref) AS BIGINT)").alias("rt"),
        F.expr("CAST(sum(1 - is_ref) AS BIGINT)").alias("ct"),
    ]
    for i in range(_N_PSI_BINS):
        aggs.append(
            F.expr(
                f"CAST(sum(CASE WHEN bin = {i} THEN is_ref ELSE 0 END)"
                " AS BIGINT)"
            ).alias(f"r{i}")
        )
        aggs.append(
            F.expr(
                f"CAST(sum(CASE WHEN bin = {i} THEN 1 - is_ref ELSE 0 "
                "END) AS BIGINT)"
            ).alias(f"c{i}")
        )
    return b.groupBy(*group_cols).agg(*aggs)


def _psi_oracle_counts(group_sql: str) -> str:
    """The oracle's mirror of _psi_counts (same CASE spellings)."""
    cols = [
        "CAST(sum(is_ref) AS BIGINT) AS rt",
        "CAST(sum(1 - is_ref) AS BIGINT) AS ct",
    ]
    for i in range(_N_PSI_BINS):
        cols.append(
            f"CAST(sum(CASE WHEN bin = {i} THEN is_ref ELSE 0 END) "
            f"AS BIGINT) AS r{i}"
        )
        cols.append(
            f"CAST(sum(CASE WHEN bin = {i} THEN 1 - is_ref ELSE 0 END)"
            f" AS BIGINT) AS c{i}"
        )
    return f"""
    WITH b AS (
      SELECT {group_sql} AS g,
             {_bin_expr_sql(_PSI_WIDTH, _N_PSI_BINS)} AS bin,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_ref
      FROM events WHERE value IS NOT NULL
    ),
    counts AS (SELECT g, {', '.join(cols)} FROM b GROUP BY g)
    """


_PSI_FINAL = _psi_sum_sql("c{i}", "ct", "r{i}", "rt", _N_PSI_BINS)


@register(
    "agg_psi",
    oracle=_psi_oracle_counts("event_type")
    + f"""
    SELECT g AS event_type, rt AS ref_n, ct AS cur_n,
           round({_PSI_FINAL}, 6) AS psi
    FROM counts
    """,
)
def agg_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type: how far the `value`
    distribution of the odd-user cohort has drifted from the even-user
    reference cohort (the A/B-cohort framing; swap the cohort
    predicate for snapshot-vs-snapshot drift). PSI < 0.1 = stable,
    0.1–0.25 = moderate shift, > 0.25 = investigate — the standard
    monitoring thresholds.

    Numerics: ONE hash aggregation yields exact BIGINT bin counts;
    the PSI sum is a single spelled-out 10-term expression evaluated
    left-to-right identically on both engines (Laplace +0.5 smoothing
    keeps empty bins finite), rounded to 6 dp. Scale: one scan, one
    fixed-width (22 longs per type) shuffle — no window, no join, no
    spine; 100 TB costs the scan."""
    counts = _psi_counts(table(spark, sf_dir, "events"), ["event_type"])
    return counts.selectExpr(
        "event_type",
        "rt AS ref_n",
        "ct AS cur_n",
        f"round({_PSI_FINAL}, 6) AS psi",
    )


# ---------------------------------------------------------------------------
# Two-sample KS on a fixed bin grid

_N_KS_BINS = 20
_KS_WIDTH = 25


@register(
    "agg_ks",
    oracle=f"""
    WITH b AS (
      SELECT event_type,
             {_bin_expr_sql(_KS_WIDTH, _N_KS_BINS)} AS bin,
             CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_ref
      FROM events WHERE value IS NOT NULL
    ),
    c AS (
      SELECT event_type, bin,
             CAST(sum(is_ref) AS BIGINT) AS ref_n,
             CAST(sum(1 - is_ref) AS BIGINT) AS cur_n
      FROM b GROUP BY event_type, bin
    ),
    spine AS (
      SELECT t.event_type, g.bin
      FROM (SELECT DISTINCT event_type FROM b) t
      CROSS JOIN (SELECT CAST(range AS INT) AS bin
                  FROM range({_N_KS_BINS})) g
    ),
    f AS (
      SELECT s.event_type, s.bin,
             coalesce(c.ref_n, 0) AS ref_n, coalesce(c.cur_n, 0) AS cur_n
      FROM spine s LEFT JOIN c
        ON c.event_type = s.event_type AND c.bin = s.bin
    ),
    cum AS (
      SELECT event_type,
             sum(ref_n) OVER (PARTITION BY event_type ORDER BY bin
                              ROWS BETWEEN UNBOUNDED PRECEDING AND
                              CURRENT ROW) AS cr,
             sum(cur_n) OVER (PARTITION BY event_type ORDER BY bin
                              ROWS BETWEEN UNBOUNDED PRECEDING AND
                              CURRENT ROW) AS cc
      FROM f
    ),
    tot AS (
      SELECT event_type, CAST(sum(ref_n) AS BIGINT) AS rt,
             CAST(sum(cur_n) AS BIGINT) AS ct
      FROM f GROUP BY event_type
    )
    SELECT cum.event_type, tot.rt AS ref_n, tot.ct AS cur_n,
           max(abs(cum.cr * tot.ct - cum.cc * tot.rt))
             / (tot.rt * tot.ct) AS ks
    FROM cum JOIN tot ON tot.event_type = cum.event_type
    WHERE tot.rt > 0 AND tot.ct > 0
    GROUP BY cum.event_type, tot.rt, tot.ct
    """,
)
def agg_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per event type between
    the even-user reference and odd-user current cohorts, on a fixed
    20-bin grid: D = max over bin boundaries of |ECDF_ref - ECDF_cur|.
    The grid version is the scale-correct KS — the exact statistic
    needs a global sort of every value, the binned one needs only
    integer bin counts (the estimate is exact for the binned
    distributions; grid resolution is the documented tradeoff).

    Numerics: EXACT end to end — the ECDF comparison is done in
    cross-multiplied integers (|cum_ref*ct - cum_cur*rt|, max'd as a
    BIGINT) and divided by rt*ct ONCE at the end, so both engines
    produce the bit-identical double with no rounding step. (At
    corpus scale beyond ~3e9 rows per cohort the cross-product nears
    int64 range — switch the compare to DOUBLE there and round.)

    Scale: one scan + one (type, bin) hash agg; the running-ECDF
    window runs over the 20-row-per-type SPINE (bounded by the grid,
    never by the data)."""
    e = table(spark, sf_dir, "events")
    b = e.filter("value IS NOT NULL").selectExpr(
        "event_type",
        f"{_bin_expr_sql(_KS_WIDTH, _N_KS_BINS)} AS bin",
        "CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS is_ref",
    )
    c = b.groupBy("event_type", "bin").agg(
        F.expr("CAST(sum(is_ref) AS BIGINT)").alias("ref_n"),
        F.expr("CAST(sum(1 - is_ref) AS BIGINT)").alias("cur_n"),
    )
    spine = (
        b.select("event_type")
        .distinct()
        .withColumn(
            "bin",
            F.explode(F.sequence(F.lit(0), F.lit(_N_KS_BINS - 1))),
        )
        .withColumn("bin", F.col("bin").cast("int"))
    )
    f = (
        spine.join(c, ["event_type", "bin"], "left")
        .fillna(0, ["ref_n", "cur_n"])
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = f.select(
        "event_type",
        F.sum("ref_n").over(w).alias("cr"),
        F.sum("cur_n").over(w).alias("cc"),
    )
    tot = f.groupBy("event_type").agg(
        F.expr("CAST(sum(ref_n) AS BIGINT)").alias("rt"),
        F.expr("CAST(sum(cur_n) AS BIGINT)").alias("ct"),
    )
    return (
        cum.join(tot, "event_type")
        .filter("rt > 0 AND ct > 0")
        .groupBy("event_type", "rt", "ct")
        .agg(
            F.expr(
                "max(abs(cr * ct - cc * rt)) / (rt * ct)"
            ).alias("ks")
        )
        .selectExpr("event_type", "rt AS ref_n", "ct AS cur_n", "ks")
    )


# ---------------------------------------------------------------------------
# Streaming drift: per-day PSI against a static reference distribution


def drift_psi_day(
    events: DataFrame, reference: DataFrame
) -> DataFrame:
    """Per-day PSI of the value distribution against a STATIC
    reference distribution (the corpus norm): one windowed
    aggregation producing the day's 10 bin counts as COLUMNS (a
    single stateful operator — no spine, no second stateful agg, so
    the same plan runs on a stream), then a stateless join to the
    1-row reference and the fixed-order PSI expression.

    `events` may be batch or streaming (caller sets the watermark);
    `reference` must be a static 1-row DataFrame from
    drift_reference()."""
    binned = events.filter("value IS NOT NULL").selectExpr(
        "ts",
        f"{_bin_expr_sql(_PSI_WIDTH, _N_PSI_BINS)} AS bin",
    )
    aggs = [F.expr("CAST(count(*) AS BIGINT)").alias("n")]
    for i in range(_N_PSI_BINS):
        aggs.append(
            F.expr(
                f"CAST(sum(CASE WHEN bin = {i} THEN 1 ELSE 0 END) "
                "AS BIGINT)"
            ).alias(f"c{i}")
        )
    cur = (
        binned.groupBy(F.window("ts", "1 day").alias("win"))
        .agg(*aggs)
        .select(F.col("win.start").alias("day"), "n", *[
            f"c{i}" for i in range(_N_PSI_BINS)
        ])
    )
    psi = _psi_sum_sql("c{i}", "n", "r{i}", "rn", _N_PSI_BINS)
    return cur.crossJoin(F.broadcast(reference)).selectExpr(
        "day",
        "n AS n_day",
        f"round({psi}, 6) AS psi",
    )


def drift_reference(events: DataFrame) -> DataFrame:
    """The static reference distribution: ONE row of global bin
    counts (rn, r0..r9) — small enough to broadcast by construction
    (its width is the bin grid, independent of data size)."""
    binned = events.filter("value IS NOT NULL").selectExpr(
        f"{_bin_expr_sql(_PSI_WIDTH, _N_PSI_BINS)} AS bin"
    )
    aggs = [F.expr("CAST(count(*) AS BIGINT)").alias("rn")]
    for i in range(_N_PSI_BINS):
        aggs.append(
            F.expr(
                f"CAST(sum(CASE WHEN bin = {i} THEN 1 ELSE 0 END) "
                "AS BIGINT)"
            ).alias(f"r{i}")
        )
    return binned.agg(*aggs)


def _stream_psi_oracle() -> str:
    bin_sql = _bin_expr_sql(_PSI_WIDTH, _N_PSI_BINS)
    cur_cols = ", ".join(
        f"CAST(sum(CASE WHEN bin = {i} THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS c{i}"
        for i in range(_N_PSI_BINS)
    )
    ref_cols = ", ".join(
        f"CAST(sum(CASE WHEN bin = {i} THEN 1 ELSE 0 END) AS BIGINT) "
        f"AS r{i}"
        for i in range(_N_PSI_BINS)
    )
    psi = _psi_sum_sql("c{i}", "n", "r{i}", "rn", _N_PSI_BINS)
    return f"""
    WITH b AS (
      SELECT time_bucket(INTERVAL '1 day', ts) AS day, {bin_sql} AS bin
      FROM events WHERE value IS NOT NULL
    ),
    cur AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n, {cur_cols}
      FROM b GROUP BY day
    ),
    ref AS (
      SELECT CAST(count(*) AS BIGINT) AS rn, {ref_cols} FROM b
    )
    SELECT day, n AS n_day, round({psi}, 6) AS psi
    FROM cur CROSS JOIN ref
    """


@register("stream_drift_psi", oracle=_stream_psi_oracle())
def stream_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous drift monitoring: per-day PSI of the event-value
    distribution against the whole-table reference — the batch twin
    of the streaming face (drift_psi_day over a watermarked stream
    joined to the same static reference; streaming==batch pinned in
    tests/test_drift.py). The day's 10 bin counts are COLUMNS of one
    aggregation, so the streaming plan has exactly one stateful
    operator followed by a stateless broadcast join + projection."""
    events = table(spark, sf_dir, "events")
    return drift_psi_day(events, drift_reference(events))


@register(
    "agg_ttest",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(count(*) FILTER (user_id % 2 = 0) AS BIGINT) AS n1,
             CAST(count(*) FILTER (user_id % 2 = 1) AS BIGINT) AS n2,
             sum(CAST(round(value * 100) AS BIGINT))
               FILTER (user_id % 2 = 0) AS s1,
             sum(CAST(round(value * 100) AS BIGINT))
               FILTER (user_id % 2 = 1) AS s2,
             sum(CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS BIGINT))
               FILTER (user_id % 2 = 0) AS ss1,
             sum(CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS BIGINT))
               FILTER (user_id % 2 = 1) AS ss2
      FROM events
      WHERE value IS NOT NULL AND user_id IS NOT NULL
      GROUP BY event_type
    ),
    d AS (
      SELECT event_type, n1, n2,
             CAST(s1 AS DOUBLE) / n1 AS m1,
             CAST(s2 AS DOUBLE) / n2 AS m2,
             (CAST(ss1 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1)
               / (n1 - 1) AS v1,
             (CAST(ss2 AS DOUBLE)
              - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2)
               / (n2 - 1) AS v2
      FROM s WHERE n1 >= 2 AND n2 >= 2
    )
    SELECT event_type, n1, n2,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           round(((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2))
                 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                    + (v2 / n2) * (v2 / n2) / (n2 - 1)), 6) AS dof
    FROM d
    ORDER BY event_type
    """,
)
def agg_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test per event type between the even/odd
    user cohorts (the drift family's parametric member, next to
    agg_psi and agg_ks): t = (m1−m2)/√(v1/n1 + v2/n2) with the
    Welch–Satterthwaite degrees of freedom. Values are cent-rounded
    (round(v·100) — deterministic on both engines) and the five
    per-cohort sums accumulate as exact integers in ONE conditional
    aggregation pass, so partial-aggregation order cannot move them;
    means/variances/t/dof are then identical-shape double expressions
    over those exact inputs (IEEE sqrt is correctly rounded, so even
    the root is deterministic), rounded(6). Groups with a cohort of
    fewer than 2 rows drop (variance undefined). At 100 TB: one scan,
    one fixed-width shuffle of 7 numbers per (type, cohort)."""
    e = table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("user_id").isNotNull()
    )
    cents = F.round(F.col("value") * 100).cast("long")
    even = F.col("user_id") % 2 == 0
    s = e.groupBy("event_type").agg(
        F.count(F.when(even, 1)).alias("n1"),
        F.count(F.when(~even, 1)).alias("n2"),
        F.sum(F.when(even, cents)).alias("s1"),
        F.sum(F.when(~even, cents)).alias("s2"),
        # cents^2 ~ 1.2e9/row passes int64 around 1e10 rows — widen to
        # exact 128-bit decimal like agg_regression's quadratic sums
        F.sum(F.when(even, (cents * cents).cast("decimal(38,0)"))).alias(
            "ss1"
        ),
        F.sum(F.when(~even, (cents * cents).cast("decimal(38,0)"))).alias(
            "ss2"
        ),
    ).filter((F.col("n1") >= 2) & (F.col("n2") >= 2))
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    s1d, s2d = F.col("s1").cast("double"), F.col("s2").cast("double")
    m1, m2 = s1d / n1d, s2d / n2d
    v1 = (F.col("ss1").cast("double") - s1d * s1d / n1d) / (n1d - 1)
    v2 = (F.col("ss2").cast("double") - s2d * s2d / n2d) / (n2d - 1)
    se2_1, se2_2 = v1 / n1d, v2 / n2d
    return s.select(
        "event_type",
        "n1",
        "n2",
        F.round((m1 - m2) / F.sqrt(se2_1 + se2_2), 6).alias("t_stat"),
        F.round(
            ((se2_1 + se2_2) * (se2_1 + se2_2))
            / (se2_1 * se2_1 / (n1d - 1) + se2_2 * se2_2 / (n2d - 1)),
            6,
        ).alias("dof"),
    ).orderBy("event_type")


def _chi2_sum_sql(cur: str, ctot: str, ref: str, rtot: str, n: int) -> str:
    """The chi-squared sum over the 2×n (cohort × bin) contingency
    table as ONE fixed-order expression (same discipline as
    _psi_sum_sql): e_cell = cohort_total · bin_total / N, term =
    (o − e)²/e, zero-total bins contribute 0. All inputs are exact
    BIGINT counts; the arithmetic is identically-shaped doubles."""
    terms = []
    nn = f"({rtot} + {ctot})"
    for i in range(n):
        col = f"({ref.format(i=i)} + {cur.format(i=i)})"
        er = f"(CAST({rtot} AS DOUBLE) * {col} / {nn})"
        ec = f"(CAST({ctot} AS DOUBLE) * {col} / {nn})"
        terms.append(
            f"(CASE WHEN {col} > 0 THEN "
            f"({ref.format(i=i)} - {er}) * ({ref.format(i=i)} - {er}) / {er}"
            f" + ({cur.format(i=i)} - {ec}) * ({cur.format(i=i)} - {ec}) / {ec}"
            f" ELSE 0.0 END)"
        )
    return " + ".join(terms)


_CHI2_FINAL = _chi2_sum_sql("c{i}", "ct", "r{i}", "rt", _N_PSI_BINS)
_CHI2_DOF = " + ".join(
    f"(CASE WHEN r{i} + c{i} > 0 THEN 1 ELSE 0 END)"
    for i in range(_N_PSI_BINS)
)


@register(
    "agg_chi2",
    oracle=_psi_oracle_counts("event_type")
    + f"""
    SELECT g AS event_type, rt AS ref_n, ct AS cur_n,
           round({_CHI2_FINAL}, 6) AS chi2,
           CAST(({_CHI2_DOF}) - 1 AS BIGINT) AS dof
    FROM counts
    WHERE rt > 0 AND ct > 0
    ORDER BY event_type
    """,
)
def agg_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-squared homogeneity test per event type between the
    even/odd user cohorts over the fixed 10-bin value grid — the
    drift family's classical test statistic next to agg_psi
    (heuristic index), agg_ks (distribution-free), and agg_ttest
    (parametric mean shift). Same one-pass exact-BIGINT bin counts as
    agg_psi (the counts CTE is literally shared), then the 2×10-cell
    (observed−expected)²/expected sum as ONE spelled-out fixed-order
    double expression — zero-total bins contribute 0 and drop from
    the degrees of freedom (dof = nonzero_bins − 1); a group with an
    empty cohort drops entirely (no expected counts). 100 TB cost:
    one scan + a 22-number shuffle per type."""
    e = table(spark, sf_dir, "events")
    counts = _psi_counts(e, ["event_type"])
    return (
        counts.filter("rt > 0 AND ct > 0")
        .selectExpr(
            "event_type",
            "rt AS ref_n",
            "ct AS cur_n",
            f"round({_CHI2_FINAL}, 6) AS chi2",
            f"CAST(({_CHI2_DOF}) - 1 AS BIGINT) AS dof",
        )
        .orderBy("event_type")
    )
