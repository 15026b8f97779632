"""Streaming windowed operators (SURVEY §2.9) — the spark-cep core.

Every operator exists twice over the SAME logic:
- a *batch twin* registered in queries() (DuckDB-checkable oracle), and
- a *streaming builder* (`*_stream`) taking an unbounded DataFrame,
  executed under Trigger.AvailableNow in tests (streaming/harness.py)
  and asserted equal to its batch twin — the streaming golden output.

This is the modern replacement for the reference's incremental
sliding-window aggregation over an external KV store: Structured
Streaming keeps per-(window,key) partial aggregates in the embedded
state store (RocksDB at scale) and updates them incrementally per
micro-batch — no recompute, no network hop to Redis (SURVEY §0, §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.registry import register

# ---------------------------------------------------------------------------
# Tumbling window

def tumbling_agg(events: DataFrame) -> DataFrame:
    """1h tumbling counts+sums per event_type — works on bounded AND
    unbounded inputs (identical plan, incremental state when streaming)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(table(spark, sf_dir, "events"))


def tumbling_stream(events_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming face: watermark bounds state; late rows beyond it drop."""
    return tumbling_agg(events_stream.withWatermark("ts", watermark))


# ---------------------------------------------------------------------------
# Sliding window (1h window / 15m slide) — *the* spark-cep headline op.

def sliding_agg(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("win.start").alias("win_start"), "n", "sum_value")
    )


@register(
    "stream_sliding",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes' AS win_start,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
    GROUP BY 1
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event belongs to 4 overlapping windows; the oracle expands
    the 4 memberships explicitly (epoch-aligned starts, same as Spark)."""
    return sliding_agg(table(spark, sf_dir, "events"))


def sliding_stream(events_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    return sliding_agg(events_stream.withWatermark("ts", watermark))


# ---------------------------------------------------------------------------
# Session window (30m gap, per user)

SESSION_GAP = "30 minutes"


def session_agg(events: DataFrame) -> DataFrame:
    """F.session_window works on bounded input too — same merge logic."""
    return (
        events.groupBy(
            F.session_window("ts", SESSION_GAP).alias("sw"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "stream_session",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), isl AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM seq
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM isl
    GROUP BY user_id, sess_id
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows; the oracle is the gaps-and-islands encoding.
    Boundary semantics verified: Spark merges events whose [ts, ts+gap)
    windows overlap, so a gap of EXACTLY 30min starts a new session —
    hence `>=` in the oracle's new-session predicate (SURVEY §7 risk 4).
    """
    return session_agg(table(spark, sf_dir, "events"))


def session_stream(events_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    return session_agg(events_stream.withWatermark("ts", watermark))


# ---------------------------------------------------------------------------
# Dedup

@register(
    "stream_dedup",
    oracle="""
    SELECT user_id, event_type, event_id, ts FROM (
        SELECT user_id, event_type, event_id, ts,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, coalesce(event_id, 0)) AS rn
        FROM events) t
    WHERE rn = 1
    """,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keep-first dedup per (user, event_type). The
    streaming face is dropDuplicates/dropDuplicatesWithinWatermark
    (arbitrary-winner semantics — asserted on counts in tests); the
    batch twin pins the winner so the oracle hash is stable."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", F.coalesce(F.col("event_id"), F.lit(0)))
    return (
        e.select("user_id", "event_type", "event_id", "ts", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def dedup_stream(events_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming exactly-once dedup by event_id within the watermark —
    state is bounded: old keys expire once the watermark passes."""
    return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


# ---------------------------------------------------------------------------
# Stream ⋈ static (dimension enrichment) and stream ⋈ stream (windowed pair)

def user_dim(events: DataFrame) -> DataFrame:
    """Per-user dimension (first_seen) derived from events — stands in
    for an external user table; broadcast-sized by construction."""
    return events.groupBy("user_id").agg(F.min("ts").alias("first_seen"))


def enrich_purchases(events: DataFrame, users: DataFrame) -> DataFrame:
    """Enrichment join: purchases ⋈ user dim. Streaming-legal as-is —
    Structured Streaming natively joins an unbounded left side against
    a static (broadcast) dimension with no state store involved."""
    return (
        events.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(users), "user_id")
        .select("user_id", "event_id", "ts", "value", "first_seen")
    )


@register(
    "stream_static_join",
    oracle="""
    WITH users AS (SELECT user_id, min(ts) AS first_seen FROM events GROUP BY user_id)
    SELECT e.user_id, e.event_id, e.ts, e.value, u.first_seen
    FROM events e JOIN users u USING (user_id)
    WHERE e.event_type = 'purchase'
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return enrich_purchases(e, user_dim(e))


def static_join_stream(events_stream: DataFrame, users: DataFrame) -> DataFrame:
    """Streaming face of stream_static_join (same builder, unbounded left)."""
    return enrich_purchases(events_stream, users)


def view_purchase_pairs(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """view → purchase pairs within 1h per user: the stream-stream join
    shape (equi-key + event-time range). On two unbounded sides both
    must carry watermarks so the state store can evict expired rows;
    the time-range condition bounds how long a view waits for a match."""
    return views.join(
        purchases,
        F.expr("user_id = p_user AND p_ts > v_ts AND p_ts <= v_ts + INTERVAL 1 HOUR"),
    ).select("user_id", "v_ts", "p_ts")


def _views(events: DataFrame) -> DataFrame:
    return events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )


def _purchases(events: DataFrame) -> DataFrame:
    return events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )


@register(
    "stream_stream_join",
    oracle="""
    SELECT v.user_id, v.v_ts, p.p_ts
    FROM (SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view') v
    JOIN (SELECT user_id AS p_user, ts AS p_ts FROM events WHERE event_type = 'purchase') p
      ON v.user_id = p.p_user
     AND p.p_ts > v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return view_purchase_pairs(_views(e), _purchases(e))


def stream_stream_join_stream(
    events_stream: DataFrame, watermark: str = "40 days"
) -> DataFrame:
    """Streaming face: both sides watermarked on their event-time col."""
    return view_purchase_pairs(
        _views(events_stream).withWatermark("v_ts", watermark),
        _purchases(events_stream).withWatermark("p_ts", watermark),
    )


def view_purchase_left_pairs(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Stream-stream LEFT OUTER join: every view emits — joined when a
    purchase follows within 1h, null-extended otherwise. On two
    unbounded sides the OUTER result for an unmatched view can only
    emit once the watermark passes v_ts + 1h (before that a matching
    purchase could still arrive); Structured Streaming does that
    eviction-time emission natively once both sides carry watermarks
    and the join condition bounds the wait."""
    return views.join(
        purchases,
        F.expr("user_id = p_user AND p_ts > v_ts AND p_ts <= v_ts + INTERVAL 1 HOUR"),
        "left_outer",
    ).select("user_id", "v_ts", "p_ts")


@register(
    "stream_stream_left_join",
    oracle="""
    SELECT v.user_id, v.v_ts, p.p_ts
    FROM (SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT user_id AS p_user, ts AS p_ts FROM events
               WHERE event_type = 'purchase') p
      ON v.user_id = p.p_user
     AND p.p_ts > v.v_ts AND p.p_ts <= v.v_ts + INTERVAL 1 HOUR
    """,
)
def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream left-outer join (same builder,
    bounded inputs)."""
    e = table(spark, sf_dir, "events")
    return view_purchase_left_pairs(_views(e), _purchases(e))


def stream_stream_left_join_stream(
    events_stream: DataFrame, watermark: str = "0 seconds"
) -> DataFrame:
    """Streaming face: both sides watermarked; outer rows emit at state
    eviction (watermark past v_ts + 1h)."""
    return view_purchase_left_pairs(
        _views(events_stream).withWatermark("v_ts", watermark),
        _purchases(events_stream).withWatermark("p_ts", watermark),
    )


# ---------------------------------------------------------------------------
# Pane-based sliding aggregation — the reference family's headline
# optimization (slice windows into disjoint panes, aggregate each pane
# once, assemble windows from pane partials), expressed Spark-first.

def sliding_agg_panes(events: DataFrame) -> DataFrame:
    """Sliding 1h/15m aggregate via 15-minute PANES: each input row is
    aggregated into exactly ONE pane (vs 4 window replicas in the
    direct plan), then each pane partial is fanned out to the 4
    windows it covers and merged.

    Why this is the 100 TB plan: the corpus-sized shuffle carries one
    partial row per (pane) instead of window/slide copies of every
    event — a 4x shuffle-volume reduction here, window/slide-x in
    general (a 24h window sliding by 15m = 96x). The second aggregate
    is over #panes x 4 rows — negligible. Same mergeable-partial idea
    as agg_sketches; count/sum merge exactly, so results are
    bit-identical to the direct plan (same oracle)."""
    panes = (
        events.groupBy(F.window("ts", "15 minutes").alias("pane"))
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("value").alias("psum"))
        .select(F.col("pane.start").alias("pane_start"), "pn", "psum")
    )
    k = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("k")
    fan = panes.select("pane_start", "pn", "psum", k)
    return (
        fan.select(
            F.expr("pane_start - k * INTERVAL '15' MINUTE").alias("win_start"),
            "pn",
            "psum",
        )
        .groupBy("win_start")
        .agg(
            F.sum("pn").cast("long").alias("n"),
            F.round(F.sum("psum"), 2).alias("sum_value"),
        )
    )


@register(
    "stream_sliding_panes",
    oracle="""
    SELECT time_bucket(INTERVAL '15 minutes', ts) - k.k * INTERVAL '15 minutes' AS win_start,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
    GROUP BY 1
    """,
)
def stream_sliding_panes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pane-based twin of stream_sliding — identical results (same
    oracle), shuffle-volume-optimal plan."""
    return sliding_agg_panes(table(spark, sf_dir, "events"))


def sliding_panes_stream(
    events_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming face of the pane plan: CHAINED windowed aggregations
    (Spark >= 3.4 multiple-stateful-operator support) — a 15m tumbling
    pane aggregate feeding a 1h/15m sliding merge keyed on
    window_time(pane). State per operator is panes, not event replicas."""
    panes = (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "15 minutes").alias("pane"))
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("value").alias("psum"))
    )
    return (
        panes.groupBy(
            F.window(F.window_time("pane"), "1 hour", "15 minutes").alias("win")
        )
        .agg(
            F.sum("pn").cast("long").alias("n"),
            F.round(F.sum("psum"), 2).alias("sum_value"),
        )
        .select(F.col("win.start").alias("win_start"), "n", "sum_value")
    )


# ---------------------------------------------------------------------------
# Trending top-k: windowed counts + per-window rank — the canonical
# continuous-query demo of the reference family ("top hashtags per
# window" [PK]).

def trending_counts(events: DataFrame) -> DataFrame:
    """6h tumbling counts per event_type — the streamable half (plain
    windowed aggregation, incremental state per (window, type))."""
    return (
        events.groupBy(F.window("ts", "6 hours").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "event_type", "n")
    )


def trending_rank(counts: DataFrame, k: int = 3) -> DataFrame:
    """Per-window top-k by count (ties → event_type asc). Batch-side
    (or foreachBatch-side): rank is not incrementally maintainable, so
    streaming pipelines compute it per micro-batch over the maintained
    counts — exactly how the tests drive it."""
    w = W.partitionBy("win_start").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


@register(
    "stream_trending",
    oracle="""
    WITH w AS (
      SELECT time_bucket(INTERVAL '6 hours', ts) AS win_start, event_type,
             count(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT win_start, event_type, n, CAST(rk AS BIGINT) AS rk
    FROM (SELECT win_start, event_type, n,
                 row_number() OVER (PARTITION BY win_start
                                    ORDER BY n DESC, event_type) AS rk
          FROM w) t
    WHERE rk <= 3
    """,
)
def stream_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending top-3 event types per 6h window. 100 TB shape: the
    count agg is partial-aggregated (shuffle carries (window, type,
    partial n)); the rank is WindowGroupLimit over type-cardinality
    rows per window — never a full sort. Streaming: the counts half
    runs incrementally under a watermark; the rank half runs per
    micro-batch over the maintained counts (foreachBatch), the
    standard split for non-incremental finishers."""
    return trending_rank(trending_counts(table(spark, sf_dir, "events")))


def trending_stream(
    events_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming face of the counts half; rank via trending_rank in
    foreachBatch (see tests/test_streaming.py)."""
    return trending_counts(events_stream.withWatermark("ts", watermark))


@register(
    "stream_sessionize",
    oracle="""
    WITH seq AS (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS is_start
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0))),
    sess AS (
      SELECT event_id, user_id, ts,
             sum(is_start) OVER (PARTITION BY user_id
                                 ORDER BY ts, coalesce(event_id, 0)
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS sid
      FROM seq)
    SELECT user_id, CAST(sid AS BIGINT) AS session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sess GROUP BY user_id, sid
    """,
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-session RECORDS (one row per session with start/end/
    count) — the record-level dual of stream_session's windowed
    aggregate, and the batch twin of `sessionize_stream` (nfa.py):
    the streaming face keeps ONE open session per key and emits a
    session the moment a >30min gap closes it (or the watermark proves
    no in-gap event can still arrive). Batch side: win_sessionize's
    two shared-shuffle window passes + one hash aggregate on
    (user, session_id)."""
    from pyspark.sql import Window as W

    # the session-id assignment is computed inline (same logic as
    # win_sessionize) carrying ts, instead of joining back on
    # event_id — event_id is not guaranteed unique (the degenerate
    # fixture ships duplicates), and a re-join would multiply rows.
    # Null-ts events dropped on both sides (Spark sorts nulls first,
    # DuckDB last), matching the streaming face's null discipline.
    e = table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = W.partitionBy("user_id").orderBy("ts", F.coalesce(F.col("event_id"), F.lit(0)))
    prev = F.lag("ts").over(w)
    is_start = F.when(
        prev.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = e.select(
        "user_id",
        "ts",
        F.sum(is_start).over(wsum).cast("long").alias("session_id"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


def dynamic_rules_stream(
    events_stream: DataFrame,
    rules_path: str,
    out_path: str,
    checkpoint: str,
    key_col: str = "event_type",
):
    """Dynamic-rule alerting (Esper/Siddhi-style broadcast state, the
    Spark way): per-event-type alert thresholds live in a small
    parquet RULES table that is RE-READ and broadcast on every
    micro-batch inside foreachBatch — operators pick up rule changes
    at the next trigger with no query restart, the capability a
    production CEP deployment needs for tunable alerting.

    Scale: the rules table is dimension-sized by contract (one row per
    event type / tenant rule), so the re-read is a metadata-cheap
    scan and the join is always a broadcast hash join against the
    micro-batch. Exactly-once FOR EVENTS: a manual write inside
    foreachBatch sits outside the file sink's transaction log, so a
    blind append would duplicate a replayed micro-batch's alerts —
    instead each epoch OVERWRITES its own epoch_id=N partition
    directory DIRECTLY (idempotent replay: re-running epoch N
    replaces epoch N's rows — including the empty case, where a
    dynamic-partition overwrite would touch nothing and leave the
    failed attempt's stale rows behind; the direct-path overwrite
    truncates them — review catch). Rule VERSIONS stay
    at-least-once: a replayed epoch re-reads the CURRENT rules — the
    industry-standard trade-off for broadcast rule refresh.

    Returns the started StreamingQuery (AvailableNow)."""
    import os as _os

    from pyspark.sql import functions as SF

    def apply_rules(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        rules = spark.read.parquet(rules_path)
        alerts = (
            batch_df.join(SF.broadcast(rules), key_col)
            .filter(SF.col("value") >= SF.col("threshold"))
            .select(
                "event_id",
                "ts",
                "user_id",
                key_col,
                "value",
                "threshold",
                SF.col("rule_id"),
            )
        )
        alerts.write.mode("overwrite").parquet(
            _os.path.join(out_path, f"epoch_id={epoch_id}")
        )

    return (
        events_stream.writeStream.foreachBatch(apply_rules)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Continuous top-k (windowed heavy hitters)

def topk_counts(events: DataFrame) -> DataFrame:
    """Shared kernel: per 6-hour tumbling window, per-user event
    counts — the STATEFUL half of continuous top-k (the only part
    that needs streaming state; selection is a stateless view)."""
    return (
        events.groupBy(F.window("ts", "6 hours").alias("win"), "user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            F.col("win.start").alias("win_start"), "user_id", "n"
        )
    )


def topk_select(counts: DataFrame, k: int = 3) -> DataFrame:
    """Top-k users per window from the count table (rank window →
    WindowGroupLimit: each shuffle partition pre-filters to its own
    k-head before the final per-window selection)."""
    w = W.partitionBy("win_start").orderBy(F.desc("n"), "user_id")
    return (
        counts.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )


@register(
    "stream_topk",
    oracle="""
    WITH c AS (
      SELECT time_bucket(INTERVAL '6 hours', ts) AS win_start, user_id,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY win_start, user_id
    ),
    r AS (
      SELECT win_start, user_id, n,
             row_number() OVER (PARTITION BY win_start
                                ORDER BY n DESC, user_id) AS rk
      FROM c
    )
    SELECT win_start, user_id, n, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= 3
    """,
)
def stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous top-k: the 3 most active users per 6-hour window —
    the trending-items query every event platform runs. Batch twin of
    topk_stream (the driver-checked key): the streaming face keeps
    ONLY the windowed counts in state (watermark-bounded, appended
    once the window closes); the per-window top-3 is a stateless rank
    over the emitted counts, so streaming == batch by construction
    (tests/test_streaming.py pins it under multi-micro-batch
    AvailableNow). At 100 TB the count state shards by (window, user)
    key and the selection's rank window group-limits per window."""
    return topk_select(topk_counts(table(spark, sf_dir, "events")))


def topk_stream(
    events_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming face: watermark-bounded windowed counts (append mode
    emits each (window, user) count exactly once, when the window
    closes). Compose with topk_select on the materialized output for
    the continuous top-k view."""
    return topk_counts(events_stream.withWatermark("ts", watermark))


# ---------------------------------------------------------------------------
# Dynamic-gap session windows (per-event gap expression)

_DYN_GAP = (
    "CASE event_type WHEN 'view' THEN '30 minutes' "
    "WHEN 'click' THEN '10 minutes' ELSE '20 minutes' END"
)


def dynamic_session_agg(events: DataFrame) -> DataFrame:
    """Shared kernel: session windows whose inactivity gap depends on
    EACH EVENT (Flink's session gap extractor, Spark's dynamic
    F.session_window) — a view holds the session open 30 min, a click
    only 10. Works identically on batch input and a watermarked
    stream."""
    return (
        events.groupBy(
            F.session_window("ts", F.expr(_DYN_GAP)).alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
        )
    )


@register(
    "stream_session_dynamic",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE event_type WHEN 'view' THEN 30
                             WHEN 'click' THEN 10 ELSE 20 END AS gap_min
      FROM events),
    w AS (
      SELECT user_id, ts, event_id, gap_min,
             max(ts + INTERVAL (gap_min) MINUTE) OVER (
               PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0)
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS runmax
      FROM g),
    f AS (
      SELECT user_id, ts, event_id, gap_min,
             CASE WHEN runmax IS NULL OR ts >= runmax THEN 1 ELSE 0 END
               AS brk
      FROM w),
    s AS (
      SELECT user_id, ts, gap_min,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0))
               AS sid
      FROM f)
    SELECT user_id, min(ts) AS session_start,
           max(ts + INTERVAL (gap_min) MINUTE) AS session_end,
           CAST(count(*) AS BIGINT) AS n
    FROM s GROUP BY user_id, sid
    """,
)
def stream_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap sessionization (batch twin of the streaming face):
    Spark's session_window with a PER-EVENT gap expression merges
    [ts, ts+gap) windows that overlap — a session stays open as long
    as the latest event's own patience allows. The oracle replays the
    merge as a gaps-and-islands pass: a session break is an event at
    or past the running max of (ts + gap) over all earlier events
    (the running max is monotone, so a break proves EVERY earlier
    window has closed); session_end = max(ts + gap) of the members.
    Scale: one (user) shuffle for the session assignment — identical
    cost to the fixed-gap stream_session; the gap CASE is a codegen
    projection."""
    return dynamic_session_agg(table(spark, sf_dir, "events"))


def dynamic_session_stream(
    events_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming face: watermark bounds the open-session state; a
    session emits once the watermark passes its dynamic close."""
    return dynamic_session_agg(
        events_stream.withWatermark("ts", watermark)
    )


# ---------------------------------------------------------------------------
# Windowed EXACT distinct count (daily/hourly-active-users, streaming)

def distinct_users_agg(events: DataFrame) -> DataFrame:
    """Exact distinct users per (1h window, event_type), written as
    dedup-then-count rather than count(DISTINCT) so the SAME two-stage
    logic runs bounded and unbounded (streaming count(DISTINCT) is
    unsupported; dedup→count is the documented chained-stateful
    spelling and what an incremental engine does anyway: membership
    state + a running counter, each bounded by the watermark)."""
    d = (
        events.filter(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        )
        .select(
            F.window("ts", "1 hour").alias("win"),
            "event_type",
            "user_id",
        )
        .dropDuplicates(["win", "event_type", "user_id"])
    )
    return (
        d.groupBy("win", "event_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_users",
        )
    )


@register(
    "stream_distinct_users",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start, event_type,
           count(DISTINCT user_id) AS n_users
    FROM events
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1, 2
    """,
)
def stream_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming windowed-exact-distinct (the oracle
    is plain count(DISTINCT)). At 100 TB batch the dedup stage
    shuffles one row per distinct (window, type, user) — same key
    cardinality count(DISTINCT) shuffles — and the counting stage is
    a near-free second aggregation; streaming, both stages hold
    watermark-bounded state (membership keys / window counters), the
    incremental-DAU layout. See also agg_bitmap_distinct for the
    bitmap-partial batch spelling of the same statistic."""
    return distinct_users_agg(table(spark, sf_dir, "events"))


def distinct_users_stream(
    events_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming face: dropDuplicates keyed on the event-time window
    struct evicts membership state once the watermark passes the
    window; the downstream count updates per micro-batch (chained
    stateful operators, Spark 3.4+)."""
    return distinct_users_agg(
        events_stream.withWatermark("ts", watermark)
    )


@register(
    "stream_retention",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    m AS (
      SELECT day,
             CASE WHEN lag(day) OVER w IS NULL THEN 0
                  WHEN lag(day) OVER w = day - 1 THEN 1 ELSE 0
             END AS ret,
             CASE WHEN lag(day) OVER w IS NULL THEN 1 ELSE 0
             END AS is_new
      FROM du
      WINDOW w AS (PARTITION BY user_id ORDER BY day)
    )
    SELECT day, CAST(count(*) AS BIGINT) AS n_active,
           CAST(sum(ret) AS BIGINT) AS n_returning,
           CAST(sum(is_new) AS BIGINT) AS n_new
    FROM m GROUP BY day
    """,
)
def stream_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the incremental retention face (streaming/
    nfa.retention_stream): per day, active users split into new
    (first-ever day), returning (active yesterday too), and lapsed
    reactivations (neither) — the DAU/WAU cohort panel every product
    dashboard runs.

    Three spellings of the same statistic, each with its scale home:
    agg_bitmap_retention re-aggregates history through bitmap partials
    (cheapest full-history batch recompute); THIS lag spelling rides
    one (user) shuffle serving dedup + lag on the same partitioning
    (cheapest incremental-shaped batch plan); retention_stream holds
    ONE int of per-user state and never revisits history (the
    streaming face, marks roll up to this aggregate — test-pinned).
    """
    e = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    du = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    w = W.partitionBy("user_id").orderBy("day")
    prev = F.lag("day").over(w)
    marks = du.select(
        "day",
        F.when(prev.isNull(), F.lit(0))
        .when(F.date_add(prev, 1) == F.col("day"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("returning"),
        F.when(prev.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_new"),
    )
    return marks.groupBy("day").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum("returning").cast("long").alias("n_returning"),
        F.sum("is_new").cast("long").alias("n_new"),
    )


# ---------------------------------------------------------------------------
# Rolling 7-day active users (WAU) — sliding-window exact distinct

def wau_agg(events: DataFrame) -> DataFrame:
    """Exact weekly-active-users per 1-day slide: dedup on the
    (7-day sliding window, user) pair, then count — the same
    chained-stateful spelling as distinct_users_agg, with each user
    membership fanning out to the 7 windows that contain it."""
    d = (
        events.filter(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        )
        .select(
            F.window("ts", "7 days", "1 day").alias("win"),
            "user_id",
        )
        .dropDuplicates(["win", "user_id"])
    )
    return (
        d.groupBy("win")
        .agg(F.count(F.lit(1)).alias("wau"))
        .select(F.col("win.start").alias("win_start"), "wau")
    )


@register(
    "stream_wau",
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', ts)
             - k.k * INTERVAL '1 day' AS win_start,
           count(DISTINCT user_id) AS wau
    FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3, 4, 5, 6]) AS k) k
    WHERE user_id IS NOT NULL AND ts IS NOT NULL
    GROUP BY 1
    """,
)
def stream_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the rolling 7-day active users panel (WAU per
    1-day slide — the stickiness denominator of every DAU/WAU
    dashboard).  Each event belongs to 7 overlapping windows; the
    oracle expands the 7 memberships explicitly (epoch-aligned starts,
    same as Spark — the stream_sliding precedent) under
    count(DISTINCT).

    100 TB shape: the dedup stage shuffles one row per distinct
    (window, user) — a 7× fan-out of the distinct (day, user) table,
    the standard sliding-distinct cost — and the count is a near-free
    second aggregation on the same partitioning.  Streaming
    (wau_stream), both stages are chained stateful operators with
    watermark-bounded membership + counter state: the incremental WAU
    no batch recompute can match at streaming latency."""
    return wau_agg(table(spark, sf_dir, "events"))


def wau_stream(
    events_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming face: membership state for a (window, user) pair is
    evicted once the watermark passes the window's end."""
    return wau_agg(events_stream.withWatermark("ts", watermark))


# ---------------------------------------------------------------------------
# Streaming OHLC candles (the agg_ohlc batch key's streaming face)

def ohlc_stream(
    events_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming face of operators/aggregates.agg_ohlc: the SAME
    declarative min_by/max_by candle aggregation over the watermarked
    stream — open/close ride one (value, padded-(ts,id)-key) pair of
    incremental state per (user, day) group, exactly like any
    streaming sum; no kernel needed because the whole op is built-in
    aggregates.  The day is a 1-day F.window (NOT date_trunc: grouping
    by a plain expression strips the event-time tag, so the watermark
    could never evict state and append mode would be impossible —
    code-review catch); win.start == date_trunc('day') under UTC, so
    the output matches the batch key column for column.  Proven
    multi-micro-batch == the batch key in tests."""
    e = events_stream.withWatermark("ts", watermark)
    key = F.format_string(
        "%020d%012d", F.unix_micros("ts"), F.col("event_id")
    )
    return e.groupBy(
        "user_id", F.window("ts", "1 day").alias("win")
    ).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count(F.lit(1)).alias("volume"),
        F.round(F.sum("value"), 6).alias("turnover"),
    ).select(
        "user_id",
        F.col("win.start").alias("day"),
        "open", "high", "low", "close", "volume", "turnover",
    )


# ---------------------------------------------------------------------------
# Continuous mergeable quantile sketch (windowed base-2 log histogram)


def log2_bucket(value_col: str = "value"):
    """The sketch's bucket expression — exact bit length of positive
    cents (never libm log).  ONE definition serves the batch op
    (agg_log2_quantile), the streaming face, and the tests."""
    return F.length(
        F.bin(F.round(F.col(value_col) * 100).cast("long"))
    )


def log2q_counts(events: DataFrame) -> DataFrame:
    """Shared kernel: per 6-hour tumbling window and event type, the
    base-2 bit-length bucket counts of positive cents — the STATEFUL
    half of a continuous quantile sketch (agg_log2_quantile's
    buckets over windows).  State = ≤64 counters per (window, type):
    the mergeable-by-addition property is exactly what windowed
    streaming aggregation needs."""
    return (
        events.filter(
            F.col("ts").isNotNull()
            & F.col("value").isNotNull()
            & (F.col("value") > 0)
            & (F.col("value") <= 1e9)
        )
        .select(
            "ts",
            F.coalesce(F.col("event_type"), F.lit("")).alias("etype"),
            log2_bucket().alias("b"),
        )
        .groupBy(F.window("ts", "6 hours").alias("win"), "etype", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .select(F.col("win.start").alias("win_start"), "etype", "b", "cnt")
    )


def log2q_select(
    counts: DataFrame,
    keys: tuple = ("win_start", "etype"),
    ps: tuple = (50, 99),
) -> DataFrame:
    """Quantile finisher over bucket counts: the smallest bucket whose
    cumulative count covers each rank p (exact cross-multiplied
    cum·100 ≥ p·tot) per key group — a stateless view over ≤64 rows
    per group.  ONE definition of the rank rule serves the batch op,
    the streaming face, and the mergeability proof (review catch:
    three copies would let the threshold convention drift)."""
    wc = W.partitionBy(*keys).orderBy("b")
    wt = W.partitionBy(*keys)
    cum = counts.select(
        *keys,
        "b",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wt).alias("tot"),
    )

    def qb(p: int):
        return F.min(
            F.when(F.col("cum") * 100 >= p * F.col("tot"), F.col("b"))
        ).cast("long")

    return cum.groupBy(*keys).agg(
        F.max("tot").alias("n"),
        *[qb(p).alias(f"q{p}_bucket") for p in ps],
    )


@register(
    "stream_log2_quantile",
    oracle="""
    WITH e AS (
      SELECT time_bucket(INTERVAL '6 hours', ts) AS win_start,
             coalesce(event_type, '') AS etype,
             length(bin(CAST(round(value * 100) AS BIGINT))) AS b
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL
        AND value > 0 AND value <= 1e9
    ),
    c AS (
      SELECT win_start, etype, b, CAST(count(*) AS BIGINT) AS cnt
      FROM e GROUP BY win_start, etype, b
    ),
    cum AS (
      SELECT win_start, etype, b,
             CAST(sum(cnt) OVER (PARTITION BY win_start, etype
                                 ORDER BY b) AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY win_start, etype)
                  AS BIGINT) AS tot
      FROM c
    )
    SELECT win_start, etype, max(tot) AS n,
           CAST(min(CASE WHEN cum * 100 >= 50 * tot THEN b END)
                AS BIGINT) AS q50_bucket,
           CAST(min(CASE WHEN cum * 100 >= 99 * tot THEN b END)
                AS BIGINT) AS q99_bucket
    FROM cum GROUP BY win_start, etype
    """,
)
def stream_log2_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous quantile monitoring: per 6-hour window and event
    type, the q50/q99 base-2 sketch buckets (agg_log2_quantile's
    exact bit-length histogram over tumbling windows) — the
    latency-SLO dashboard query, streamed.  Batch twin of
    log2q_stream: the streaming face keeps ONLY the ≤64 bucket
    counters per (window, type) in state (watermark-bounded, appended
    once the window closes — mergeable by addition, so late partials
    combine exactly); the quantile read is a stateless view over the
    emitted counts, so streaming == batch by construction
    (tests/test_streaming.py pins it under multi-micro-batch
    AvailableNow).

    100 TB shape: the count state shards by (window, type, bucket) —
    bounded at 64 x types x open-windows rows total; the finisher
    windows over ≤64 rows per group.  No raw value ever sits in
    state."""
    return log2q_select(log2q_counts(table(spark, sf_dir, "events")))


def log2q_stream(
    events_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming face: watermark-bounded windowed bucket counts
    (append mode emits each (window, type, bucket) count exactly
    once, when the window closes).  Compose with log2q_select on the
    materialized output for the continuous quantile view."""
    return log2q_counts(events_stream.withWatermark("ts", watermark))


# ---------------------------------------------------------------------------
# Temporal (as-of) enrichment join — the Flink event-time temporal
# table join / DuckDB ASOF JOIN, round 9.

def asof_enrich(events: DataFrame, ttl_us: int | None = None) -> DataFrame:
    """Batch twin of asof_enrich_stream (streaming/nfa.py): enrich
    each purchase with the user's latest at-or-before view value in
    (ts, coalesce(event_id, 0)) order — one window pass, pure JVM
    (last(..., ignorenulls=True) over an unbounded-preceding frame),
    no join at all.  age_us is the exact integer staleness of the
    joined observation.  ttl_us expires observations older than the
    bound AT the fact's event time (NULLs out, kernel parity)."""
    e = (
        events.filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & (F.col("value").isNull() | (F.abs("value") <= 1e9))
            & F.col("event_type").isin("view", "purchase")
        )
        .select(
            "user_id",
            "ts",
            F.coalesce("event_id", F.lit(0)).cast("long").alias("event_id"),
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    w = (
        W.partitionBy("user_id")
        # third key: on an exact (ts, event_id) tie the view orders
        # BEFORE the purchase (a same-instant observation is visible
        # to the fact) — deterministic on every face (review catch)
        .orderBy(
            "ts",
            "event_id",
            F.when(F.col("event_type") == "view", 0).otherwise(1),
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    dim_val = F.when(
        (F.col("event_type") == "view") & F.col("cents").isNotNull(),
        F.col("cents"),
    )
    dim_tus = F.when(
        (F.col("event_type") == "view") & F.col("cents").isNotNull(),
        F.unix_micros("ts"),
    )
    out = (
        e.withColumn("view_cents", F.last(dim_val, ignorenulls=True).over(w))
        .withColumn("view_tus", F.last(dim_tus, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .withColumn(
            "age_us", F.unix_micros("ts") - F.col("view_tus")
        )
    )
    if ttl_us is not None:
        live = F.col("age_us") <= F.lit(ttl_us)
        out = out.withColumn(
            "view_cents", F.when(live, F.col("view_cents"))
        ).withColumn("age_us", F.when(live, F.col("age_us")))
    return out.select(
        "user_id", "ts", "event_id", "view_cents", "age_us"
    )


@register(
    "stream_asof_enrich",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, coalesce(event_id, 0) AS event_id,
             coalesce(event_type, '') AS et,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND (value IS NULL OR abs(value) <= 1e9)
        AND coalesce(event_type, '') IN ('view', 'purchase')
    ),
    w AS (
      SELECT user_id, ts, event_id, et,
             last_value(CASE WHEN et = 'view' AND cents IS NOT NULL
                             THEN cents END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id,
                     CASE WHEN et = 'view' THEN 0 ELSE 1 END
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS view_cents,
             last_value(CASE WHEN et = 'view' AND cents IS NOT NULL
                             THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id,
                     CASE WHEN et = 'view' THEN 0 ELSE 1 END
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS view_tus
      FROM e
    )
    SELECT user_id, ts, event_id, view_cents,
           epoch_us(ts) - view_tus AS age_us
    FROM w WHERE et = 'purchase'
    """,
)
def stream_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time temporal join (Flink's temporal table join, DuckDB's
    ASOF JOIN — an operator Structured Streaming's built-in
    stream-stream join cannot express, since it matches on equality
    within a bound, not latest-at-or-before): each purchase is
    enriched with the user's most recent prior view value and the
    exact staleness (age_us) of that observation.  This batch twin is
    ONE window pass (no join); the streaming face
    (asof_enrich_stream, streaming/nfa.py) runs the same LOCF walk in
    applyInPandasWithState with O(1) state — one observation per key
    — and is pinned streaming == batch under multi-micro-batch
    AvailableNow in tests.

    100 TB shape: batch = one (user) shuffle + one ordered window
    scan in whole-stage codegen; streaming state is ONE row per key
    regardless of stream length (LOCF needs no history) — the
    smallest state of any operator in the streaming family."""
    return asof_enrich(table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Continuous data-quality monitoring — profile_expectations' streaming
# face (round 9): per-window violation counters over the event stream.

def dq_monitor_agg(events: DataFrame) -> DataFrame:
    """Per-hour data-quality counters over the event stream: volume,
    NULL-field counts, domain violations (|value| > 1e9 — the corrupt
    magnitude the pipeline filters), and unknown event types — the
    Deequ-style checks recast as ONE windowed aggregation, so a bad
    producer deploy shows up as a counter step in the very next
    window instead of at the nightly batch gate."""
    return (
        events.filter(F.col("ts").isNotNull())
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("null_user"),
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("null_value"),
            F.sum(
                F.when(
                    F.col("value").isNotNull()
                    & (F.abs("value") > 1e9),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("bad_magnitude"),
            F.sum(
                F.when(
                    F.col("event_type").isNull()
                    | ~F.col("event_type").isin(
                        "signup", "view", "click", "purchase", "error"
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("bad_type"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "n_events",
            "null_user",
            "null_value",
            "bad_magnitude",
            "bad_type",
        )
    )


@register(
    "stream_dq_monitor",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS null_user,
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS null_value,
           CAST(sum(CASE WHEN value IS NOT NULL AND abs(value) > 1e9
                         THEN 1 ELSE 0 END) AS BIGINT) AS bad_magnitude,
           CAST(sum(CASE WHEN event_type IS NULL OR event_type NOT IN
                         ('signup', 'view', 'click', 'purchase', 'error')
                         THEN 1 ELSE 0 END) AS BIGINT) AS bad_type
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY time_bucket(INTERVAL '1 hour', ts)
    """,
)
def stream_dq_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous data-quality monitoring (the streaming face of
    profile_expectations' constraint suite): per-hour counters for
    volume, completeness (NULL user/value), domain violations
    (|value| > 1e9), and schema-drift signals (unexpected event
    types) — ONE map-side-combinable windowed aggregation, the
    standard freshness/quality dashboard feed.  The streaming face
    (dq_monitor_stream) is the identical aggregation under a
    watermark — counters emit as windows close, and the batch twin
    here is what the driver hashes.

    100 TB shape: pure codegen scan -> partial agg -> one (window)
    shuffle of counter rows; adding a check adds a column, never a
    scan or shuffle; state is one counter row per open window."""
    return dq_monitor_agg(table(spark, sf_dir, "events"))


def dq_monitor_stream(
    events_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming face: watermark bounds state; append mode emits each
    hour's verdict row exactly once when the window closes."""
    return dq_monitor_agg(events_stream.withWatermark("ts", watermark))


@register(
    "stream_asof_ttl",
    oracle="""
    WITH e AS (
      SELECT user_id, ts, coalesce(event_id, 0) AS event_id,
             coalesce(event_type, '') AS et,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND (value IS NULL OR abs(value) <= 1e9)
        AND coalesce(event_type, '') IN ('view', 'purchase')
    ),
    w AS (
      SELECT user_id, ts, event_id, et,
             last_value(CASE WHEN et = 'view' AND cents IS NOT NULL
                             THEN cents END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id,
                     CASE WHEN et = 'view' THEN 0 ELSE 1 END
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS view_cents,
             last_value(CASE WHEN et = 'view' AND cents IS NOT NULL
                             THEN epoch_us(ts) END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id,
                     CASE WHEN et = 'view' THEN 0 ELSE 1 END
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS view_tus
      FROM e
    )
    SELECT user_id, ts, event_id,
           CASE WHEN epoch_us(ts) - view_tus <= 3600000000
                THEN view_cents END AS view_cents,
           CASE WHEN epoch_us(ts) - view_tus <= 3600000000
                THEN epoch_us(ts) - view_tus END AS age_us
    FROM w WHERE et = 'purchase'
    """,
)
def stream_asof_ttl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TTL'd temporal join (Flink temporal table join with a state
    TTL): a dimension observation older than ONE HOUR at the fact's
    event time no longer enriches — the fact emits NULLs, exactly as
    if no observation existed.  The staleness check is pure
    arithmetic on the same O(1) LOCF state (the observation stays —
    a later update refreshes it); stale reference data silently
    enriching facts is the classic temporal-join correctness bug this
    variant exists to prevent.  Same kernel (advance_asof_enrich,
    ttl_us), same one-window-pass batch twin, streaming == batch
    pinned in tests.

    100 TB shape: identical to stream_asof_enrich — ONE observation
    per key, one window pass batch-side, plus one comparison."""
    return asof_enrich(
        table(spark, sf_dir, "events"), ttl_us=3_600_000_000
    )
