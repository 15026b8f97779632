"""Streaming determinism (SURVEY §5.5): every streaming op runs under
Trigger.AvailableNow over the fixture split into multiple files
(forcing multiple micro-batches) and must equal its batch twin.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.streaming import harness
from spark_cep_spark.streaming.windows import (
    dedup_stream,
    session_agg,
    session_stream,
    sliding_agg,
    sliding_stream,
    tumbling_agg,
    tumbling_stream,
)


@pytest.fixture(scope="module")
def staged(spark, sf_dir):
    return harness.stage_events_files(spark, sf_dir, n_files=8)


def _sorted_pdf(df, cols):
    return df.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)


def test_tumbling_stream_equals_batch(spark, sf_dir, staged):
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(tumbling_stream(stream, watermark="35 days"), "complete")
    want = tumbling_agg(table(spark, sf_dir, "events"))
    cols = ["win_start", "event_type", "n", "sum_value"]
    assert _sorted_pdf(got, cols).equals(_sorted_pdf(want, cols))


def test_sliding_stream_equals_batch(spark, sf_dir, staged):
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(sliding_stream(stream, watermark="35 days"), "complete")
    want = sliding_agg(table(spark, sf_dir, "events"))
    cols = ["win_start", "n", "sum_value"]
    assert _sorted_pdf(got, cols).equals(_sorted_pdf(want, cols))


def test_session_stream_equals_batch(spark, sf_dir, staged):
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(session_stream(stream, watermark="35 days"), "complete")
    want = session_agg(table(spark, sf_dir, "events"))
    cols = ["user_id", "session_start", "session_end", "n_events", "sum_value"]
    assert _sorted_pdf(got, cols).equals(_sorted_pdf(want, cols))


def test_streaming_dedup_by_event_id(spark, sf_dir, staged):
    """Feed the events twice (union of two staged copies would need two
    dirs; instead assert dedup over the single feed keeps all unique
    event_ids and drops nothing else)."""
    stream = harness.events_stream(spark, staged, max_files_per_trigger=4)
    got = harness.run_available_now(dedup_stream(stream), "append")
    n_unique = table(spark, sf_dir, "events").select("event_id").distinct().count()
    assert got.count() == n_unique


def test_foreach_batch_parquet_sink(spark, sf_dir, staged, tmp_path):
    out = str(tmp_path / "sink")
    stream = harness.events_stream(spark, staged, max_files_per_trigger=4)
    harness.run_foreach_batch_parquet(tumbling_stream(stream, watermark="35 days"), out)
    # complete-mode semantics don't apply to foreachBatch append; just
    # assert the sink received rows with the right schema
    sunk = spark.read.parquet(out)
    assert sunk.count() > 0
    assert set(sunk.columns) == {"win_start", "event_type", "n", "sum_value"}


def test_stream_static_join(spark, sf_dir, staged):
    """Stream-static enrichment join (SURVEY §2.3): stream events ⋈
    static per-user dimension — supported natively by Structured
    Streaming; verify against the batch join."""
    from spark_cep_spark.streaming.windows import (
        enrich_purchases,
        static_join_stream,
        user_dim,
    )

    e = table(spark, sf_dir, "events")
    users = user_dim(e)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=4)
    got = harness.run_available_now(static_join_stream(stream, users), "append")
    want = enrich_purchases(e, users)
    assert got.count() == want.count()


def test_stream_stream_join(spark, sf_dir, staged):
    """Stream-stream windowed join: views ⋈ purchases within 1h per
    user (both sides watermarked, time-range condition)."""
    from spark_cep_spark.streaming.windows import (
        stream_stream_join,
        stream_stream_join_stream,
    )

    stream = harness.events_stream(spark, staged, max_files_per_trigger=4)
    got = harness.run_available_now(
        stream_stream_join_stream(stream, watermark="40 days"), "append"
    )
    want = stream_stream_join(spark, sf_dir)
    assert got.count() == want.count()


def test_watermark_drops_late_data(spark, tmp_path):
    """Deliberate late-data semantics: an event older than the watermark
    arriving in a LATER micro-batch is dropped from the aggregation.

    Two empirically-verified Spark subtleties this test pins down:
    - only APPEND mode guarantees late-row dropping (update mode uses
      the watermark for state eviction only — a late row that arrives
      while its window state is alive still gets aggregated);
    - watermark propagation lags one batch (the wm computed from batch
      N's data takes effect in batch N+2), so the late row is staged
      two micro-batches after the event that advances the watermark.
    Micro-batch order is pinned via file modification times.
    """
    import datetime as dt
    import glob
    import os as _os

    t0 = dt.datetime(2024, 6, 1, 0, 0, 0)

    def mk(rows, sid):
        return spark.createDataFrame(
            [(sid + i, t, 1, "view", 1.0, "{}") for i, t in enumerate(rows)],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )

    src = str(tmp_path / "late_src")
    # batch 0: t0 and t0+1h -> wm (effective two batches later) = t0+30m
    mk([t0, t0 + dt.timedelta(hours=1)], 0).coalesce(1).write.parquet(src)
    # batch 1: filler (lets the wm from batch 0 commit)
    mk([t0 + dt.timedelta(minutes=65)], 10).coalesce(1).write.mode("append").parquet(src)
    # batch 2: t0+1s (LATE: < wm=t0+30m) and t0+70m (on time)
    mk([t0 + dt.timedelta(seconds=1), t0 + dt.timedelta(minutes=70)], 20).coalesce(
        1
    ).write.mode("append").parquet(src)

    # order files by the event_ids they contain (write order), pin mtimes
    order = []
    for f in glob.glob(src + "/part*"):
        ids = [r.event_id for r in spark.read.parquet(f).collect()]
        order.append((min(ids), f))
    order.sort()
    now = 1_700_000_000
    for i, (_, f) in enumerate(order):
        _os.utime(f, (now - 3600 * (3 - i),) * 2)

    stream = harness.events_stream(spark, src, max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("win_start"), "n")
    )
    got = harness.run_available_now(agg, "append").toPandas()
    finalized = got[got.win_start == t0]
    assert len(finalized) == 1
    assert finalized.n.iloc[0] == 1  # late t0+1s row was dropped


def test_transform_with_state_running_totals(spark, sf_dir, staged):
    """transformWithStateInPandas (Spark 4 stateful API): per-user
    running totals accumulate across micro-batches; the LAST emission
    per key must equal the batch groupBy over all events — the
    incremental-aggregation contract.

    Skips where the TWS driver-worker protocol can't run (its protobuf
    dependency is absent in this container; applyInPandasWithState
    operators carry the tested stateful surface here)."""
    from spark_cep_spark.streaming.stateful import (
        running_totals_stream,
        tws_available,
    )

    if not tws_available():
        pytest.skip("google.protobuf absent: transformWithState cannot run here")

    stream = harness.events_stream(spark, staged, max_files_per_trigger=4)
    got = harness.run_available_now(
        running_totals_stream(stream, watermark="35 days"), "update"
    )
    # memory sink in update mode appends one row per key per batch;
    # the final state of a key is its row in the LAST batch it appears
    final = {}
    for r in got.collect():
        final[r.user_id] = (r.n_events, round(r.total_value, 6))
    want = {
        r.user_id: (r.n, round(r.total, 6))
        for r in table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert final == want


def test_checkpoint_restart_is_exactly_once(spark, sf_dir, staged, tmp_path):
    """Kill-and-resume: run the stream over half the source files, then
    add the rest and RESTART from the same checkpoint. The offset log
    must skip everything already committed — the sink ends up with each
    event exactly once (the exactly-once story the reference bought
    with external state; Structured Streaming's checkpoint + file-sink
    commit log gives it natively)."""
    import os
    import shutil

    from spark_cep_spark.schemas import TABLES

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    parts = sorted(f for f in os.listdir(staged) if f.startswith("part"))
    assert len(parts) >= 4
    half = len(parts) // 2
    for f in parts[:half]:
        shutil.copy(os.path.join(staged, f), os.path.join(src, f))

    def run_once():
        stream = (
            spark.readStream.schema(
                spark.read.parquet(staged).schema
            ).parquet(src)
        ).select("event_id", "user_id", "value")
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n_first = spark.read.parquet(out).count()
    assert n_first > 0
    for f in parts[half:]:
        shutil.copy(os.path.join(staged, f), os.path.join(src, f))
    run_once()

    got = spark.read.parquet(out)
    want = spark.read.parquet(staged)
    assert got.count() == want.count()  # nothing reprocessed, nothing lost
    assert got.select("event_id").distinct().count() == want.count()


def test_stream_stream_left_join_outer_rows_emit_at_eviction(spark, sf_dir, tmp_path):
    """Stream-stream LEFT OUTER: null-extended rows emit at state
    eviction, i.e. once the watermark passes v_ts + 1h. Run 1 drains
    the fixture (outer rows near end-of-stream stay pending — not yet
    provably unmatched); run 2 on the same checkpoint feeds a far-
    future sentinel that closes every join window, after which the
    streamed result must EQUAL the batch left join."""
    import datetime as dt
    import os
    import shutil

    from pyspark.sql import functions as F

    from spark_cep_spark.streaming.windows import (
        stream_stream_left_join,
        stream_stream_left_join_stream,
    )

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    src = str(tmp_path / "src")
    os.makedirs(src)
    # copy preserving the harness's ascending-mtime arrival order — a
    # same-millisecond mtime tie lets the file source list files out of
    # event-time order, which late-drops whole files under a 0s watermark
    for i, f in enumerate(sorted(os.listdir(staged))):
        if f.startswith("part"):
            dst = os.path.join(src, f)
            shutil.copy(os.path.join(staged, f), dst)
            os.utime(dst, (1_700_000_000 + i * 3600,) * 2)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        stream = harness.events_stream(spark, src, max_files_per_trigger=2)
        q = (
            stream_stream_left_join_stream(stream, watermark="0 seconds")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    pending_after_run1 = spark.read.parquet(out).filter(F.col("p_ts").isNull()).count()
    # the flush must reach BOTH event-time columns: the global watermark
    # is min(views_wm, purchases_wm), and each side's watermark node
    # sits above its event_type filter — a sentinel of any other type
    # advances neither
    sentinel = spark.createDataFrame(
        [
            (10**9, dt.datetime(2099, 1, 1), 10**6, "view", 0.0, "{}"),
            (10**9 + 1, dt.datetime(2099, 1, 1), 10**6, "purchase", 0.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)
    run()
    # eviction uses the PREVIOUS batch's watermark — one more data-bearing
    # tick applies the sentinel-advanced watermark
    sentinel2 = spark.createDataFrame(
        [
            (10**9 + 2, dt.datetime(2099, 6, 1), 10**6, "view", 0.0, "{}"),
            (10**9 + 3, dt.datetime(2099, 6, 1), 10**6, "purchase", 0.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sentinel2.coalesce(1).write.mode("append").parquet(src)
    run()

    got = spark.read.parquet(out)
    want = stream_stream_left_join(spark, sf_dir)
    norm = lambda df: sorted(
        map(tuple, df.filter(F.col("user_id") < 10**6).collect())
    )
    assert norm(got) == norm(want)
    # non-vacuous: the sentinel flushed outer rows run 1 couldn't prove
    assert got.filter(F.col("p_ts").isNull()).count() > pending_after_run1 > 0


def test_materialized_aggregate_upserts_to_current_state(spark, sf_dir, tmp_path):
    """Continuously-maintained aggregate table: hourly counts+sums per
    event_type materialize into parquet via update-mode + foreachBatch
    merge. After draining half the source the target is a CORRECT
    aggregate of what was ingested; after the rest (a separate run,
    same checkpoint — exactly-once across restart) it equals the batch
    aggregate over everything."""
    import os
    import shutil as _sh

    from pyspark.sql import functions as F

    from spark_cep_spark.streaming.materialize import materialize_aggregate

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    src = str(tmp_path / "src")
    os.makedirs(src)
    parts = sorted(f for f in os.listdir(staged) if f.startswith("part"))

    def copy_ordered(names):
        for f in names:
            dst = os.path.join(src, f)
            _sh.copy(os.path.join(staged, f), dst)
            os.utime(dst, (1_700_000_000 + parts.index(f) * 3600,) * 2)

    target, ckpt = str(tmp_path / "mv"), str(tmp_path / "ckpt")

    def agg_of(df):
        return df.groupBy(
            F.window("ts", "1 hour").start.alias("h"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total"))

    def run():
        stream = harness.events_stream(spark, src, max_files_per_trigger=2)
        q = materialize_aggregate(
            agg_of(stream), ["h", "event_type"], target, ckpt
        )
        q.awaitTermination(180)

    norm = lambda df: sorted(map(tuple, df.collect()))

    copy_ordered(parts[:3])
    run()
    got_half = spark.read.parquet(target)
    want_half = agg_of(spark.read.parquet(*[os.path.join(src, f) for f in parts[:3]]))
    assert norm(got_half) == norm(want_half)

    copy_ordered(parts[3:])
    run()
    got_full = spark.read.parquet(target)
    want_full = agg_of(table(spark, sf_dir, "events"))
    assert norm(got_full) == norm(want_full)
    assert got_full.count() > 0


def test_merge_into_parquet_crash_recovery(spark, tmp_path):
    """The versioned-dir + atomic-symlink swap heals every crash point:
    a missing link with complete versions on disk re-links the newest
    one (half-written versions without _SUCCESS are never chosen), and
    a legacy real-directory state migrates in place without a window
    where the target is unreadable."""
    import os
    import shutil as _sh

    from spark_cep_spark.streaming.materialize import merge_into_parquet

    target = str(tmp_path / "tbl")
    norm = lambda df: sorted(map(tuple, df.collect()))

    def mk(rows):
        return spark.createDataFrame(rows, "k long, v string")

    # normal path: create, then upsert — target must stay a readable
    # symlink to a complete version and old versions must be GC'd
    merge_into_parquet(mk([(1, "a"), (2, "b")]), target, ["k"])
    assert os.path.islink(target)
    merge_into_parquet(mk([(2, "B"), (3, "c")]), target, ["k"])
    assert norm(spark.read.parquet(target)) == [(1, "a"), (2, "B"), (3, "c")]
    import glob as _glob

    assert len(_glob.glob(target + "__v_*")) == 1

    # crash between "write new version" and "repoint": link is gone,
    # two complete versions exist → recovery must pick the NEWER one
    # and never a half-written (_SUCCESS-less) directory
    cur = os.path.realpath(target)
    stale = target + "__v_stale"
    _sh.copytree(cur, stale)
    os.utime(stale, (os.path.getmtime(cur) - 100,) * 2)
    half = target + "__v_half"
    _sh.copytree(cur, half)
    os.remove(os.path.join(half, "_SUCCESS"))
    os.utime(half, (os.path.getmtime(cur) + 100,) * 2)
    os.remove(target)  # the crash: link never landed
    merge_into_parquet(mk([(4, "d")]), target, ["k"])
    assert norm(spark.read.parquet(target)) == [
        (1, "a"),
        (2, "B"),
        (3, "c"),
        (4, "d"),
    ]
    assert len(_glob.glob(target + "__v_*")) == 1  # stale+half GC'd

    # legacy layout: target is a REAL directory from the pre-versioned
    # format — one merge migrates it and keeps every pre-existing key
    legacy_target = str(tmp_path / "legacy")
    mk([(7, "x")]).coalesce(1).write.parquet(legacy_target)
    assert not os.path.islink(legacy_target)
    merge_into_parquet(mk([(8, "y")]), legacy_target, ["k"])
    assert os.path.islink(legacy_target)
    assert norm(spark.read.parquet(legacy_target)) == [(7, "x"), (8, "y")]


def test_streaming_near_dedup_counts_match_batch_twin(spark, sf_dir):
    """Streaming minhash near-dedup (signature dedup within watermark)
    over multiple micro-batches keeps exactly one doc per signature —
    count-equal to the batch twin (winners are arrival-order-arbitrary,
    so only counts are asserted; the twin pins winners for the
    oracle)."""
    import __spark_entry__ as entry
    from spark_cep_spark.operators.llm_dedup import near_dedup_sig_stream
    from spark_cep_spark.streaming import harness

    staged = harness.stage_documents_files(spark, sf_dir, n_files=6)
    stream = harness.documents_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        near_dedup_sig_stream(stream, watermark="365 days"), "append"
    )
    batch = entry.queries()["stream_dedup_near"](spark, sf_dir)
    assert got.count() == batch.count()
    # and signatures themselves agree as a set
    assert {r["sig"] for r in got.select("sig").collect()} == {
        r["sig"] for r in batch.select("sig").collect()
    }


def test_kafka_payload_codec_roundtrip(spark, sf_dir):
    """The Kafka wire codec (to_json value <-> from_json payload) must
    be lossless on the events schema — tested on a batch stand-in
    since no broker exists; the connector wrapper reuses exactly these
    two transforms."""
    from pyspark.sql import functions as F

    from spark_cep_spark.io import table
    from spark_cep_spark.sources.readers import (
        parse_kafka_payload,
        to_kafka_payload,
    )

    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    ).limit(200)
    back = parse_kafka_payload(to_kafka_payload(e), e.schema)
    assert back.schema == e.schema
    a = {tuple(r) for r in e.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b

    # external producers commonly emit whole-second / millisecond ISO
    # timestamps — the reader must parse them, not NULL them out
    ext = spark.createDataFrame(
        [
            ('{"event_id": 1, "ts": "2024-01-01T00:00:00Z"}',),
            ('{"event_id": 2, "ts": "2024-01-01T00:00:00.123Z"}',),
            ('{"event_id": 3, "ts": "2024-01-01T00:00:00.123456Z"}',),
        ],
        "value string",
    )
    got = parse_kafka_payload(ext, "event_id long, ts timestamp").collect()
    assert all(r["ts"] is not None for r in got), got


def test_chained_pane_sliding_equals_batch_sliding(spark, sf_dir):
    """Pane-based streaming sliding agg (chained windowed aggregates,
    Spark's multiple-stateful-operator support) over multiple
    micro-batches == the direct batch sliding aggregate, for every
    window the zero-delay watermark provably closed (sorted staging =>
    arrival order is event-time order; windows ending after the final
    watermark legitimately stay open in append mode)."""
    import datetime

    from pyspark.sql import functions as F

    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.windows import (
        sliding_agg,
        sliding_panes_stream,
    )

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=8)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        sliding_panes_stream(stream, watermark="0 seconds"), "append"
    )
    events = harness.table(spark, sf_dir, "events")
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    want = sliding_agg(events)
    g = {r["win_start"]: (r["n"], r["sum_value"]) for r in got.collect()}
    w = {
        r["win_start"]: (r["n"], r["sum_value"])
        for r in want.collect()
        # outer-agg watermark closes a window once pane event-times pass
        # its end; the final watermark is the max pane time seen
        if r["win_start"] + datetime.timedelta(hours=1) <= max_ts
    }
    assert w  # the cutoff must leave a non-trivial comparison set
    missing = {k: v for k, v in w.items() if g.get(k) != v}
    assert not missing
    # nothing emitted may disagree with batch (late-window extras allowed)
    full = {r["win_start"]: (r["n"], r["sum_value"]) for r in want.collect()}
    wrong = {k: v for k, v in g.items() if full.get(k) != v}
    assert not wrong


def test_trending_stream_equals_batch(spark, sf_dir, staged):
    """Counts maintained incrementally in the stream; top-k ranked over
    the sunk counts (the foreachBatch finisher) — equals the batch
    twin's ranked output."""
    from spark_cep_spark.streaming.windows import (
        trending_counts,
        trending_rank,
        trending_stream,
    )

    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    counts = harness.run_available_now(
        trending_stream(stream, watermark="35 days"), "complete"
    )
    got = trending_rank(counts)
    want = trending_rank(trending_counts(table(spark, sf_dir, "events")))
    cols = ["win_start", "event_type", "n", "rk"]
    assert _sorted_pdf(got, cols).equals(_sorted_pdf(want, cols))


def test_streaming_sessionize_equals_batch(spark, sf_dir):
    """Per-key open-session state over multiple micro-batches emits
    exactly the batch twin's session rows (zero-delay watermark +
    far-future sentinel to flush the tail session closed)."""
    import datetime as dt
    import glob
    import os

    import __spark_entry__ as entry
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import sessionize_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    sentinel = spark.createDataFrame(
        [(10**9, dt.datetime(2025, 1, 1), -1, "view", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sentinel.coalesce(1).write.mode("append").parquet(staged)
    newest = max(glob.glob(os.path.join(staged, "part-*")), key=os.path.getmtime)
    os.utime(newest, (1_700_000_000 + 10_000 * 3600,) * 2)

    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        sessionize_stream(stream, watermark="0 seconds"), "append"
    )
    g = {
        (r["key"], r["session_start"], r["session_end"], r["n_events"])
        for r in got.collect()
        if r["key"] != -1  # the sentinel's own session
    }
    w = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in entry.queries()["stream_sessionize"](spark, sf_dir).collect()
    }
    assert g == w


def test_sessionize_kernel_chunking_invariance():
    from spark_cep_spark.streaming.nfa import advance_sessionize

    US = 60_000_000
    evs = [[m * US, i] for i, m in enumerate([0, 5, 10, 50, 55, 120])]
    gap, wm = 30 * US, 200 * US
    _, whole = advance_sessionize(None, evs, gap, wm)
    assert [(s[0] // US, s[1] // US, s[2]) for s in whole] == [
        (0, 10, 3),
        (50, 55, 2),
        (120, 120, 1),
    ]
    for cut in range(len(evs) + 1):
        st, c1 = advance_sessionize(None, evs[:cut], gap, 0)
        st, c2 = advance_sessionize(st, evs[cut:], gap, wm)
        assert c1 + c2 == whole


def test_sessionize_state_survives_checkpoint_restart(spark, sf_dir, tmp_path):
    """Kill-and-resume for the sessionize face: drain half the files,
    restart from the same checkpoint with the rest — two-run output
    equals one uninterrupted run, including sessions SPANNING the
    restart boundary, with no duplicates."""
    import os
    import shutil as _shutil

    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import sessionize_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=8)
    src = str(tmp_path / "src")
    os.makedirs(src)
    parts = sorted(f for f in os.listdir(staged) if f.startswith("part"))

    def run(out, ckpt):
        stream = harness.events_stream(spark, src, max_files_per_trigger=2)
        q = (
            sessionize_stream(stream, watermark="0 seconds")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def copy_ordered(names):
        for f in names:
            dst = os.path.join(src, f)
            _shutil.copy(os.path.join(staged, f), dst)
            os.utime(dst, (1_700_000_000 + parts.index(f) * 3600,) * 2)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    copy_ordered(parts[:4])
    run(out, ckpt)
    n_first = spark.read.parquet(out).count()
    copy_ordered(parts[4:])
    run(out, ckpt)

    got = {
        (r["key"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    uninterrupted = {
        (r["key"], r["session_start"], r["session_end"], r["n_events"])
        for r in harness.run_available_now(
            sessionize_stream(
                harness.events_stream(spark, staged, max_files_per_trigger=2),
                watermark="0 seconds",
            ),
            "append",
        ).collect()
    }
    assert got == uninterrupted
    assert len(got) == spark.read.parquet(out).count()  # no duplicates
    assert 0 < n_first < len(got)  # sessions close on both sides


def test_dynamic_rules_swap_between_runs(spark, sf_dir, tmp_path):
    """Broadcast-rule refresh without restart: run 1 processes the
    first half of the stream under rules v1; the rules parquet is
    OVERWRITTEN (threshold flips for one type, a new type gains a
    rule) and run 2 resumes from the same checkpoint — its alerts
    must reflect v2 ONLY, proving rules are re-read per run/trigger
    and events are processed exactly once across the swap."""
    import os
    import shutil

    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.windows import dynamic_rules_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=8)
    parts = sorted(f for f in os.listdir(staged) if f.startswith("part"))
    src = str(tmp_path / "src")
    os.makedirs(src)

    def copy_ordered(names):
        for f in names:
            dst = os.path.join(src, f)
            shutil.copy(os.path.join(staged, f), dst)
            os.utime(dst, (1_700_000_000 + parts.index(f) * 3600,) * 2)

    rules_path = str(tmp_path / "rules")
    out = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")

    def write_rules(rows):
        spark.createDataFrame(
            rows, "rule_id long, event_type string, threshold double"
        ).coalesce(1).write.mode("overwrite").parquet(rules_path)

    def run():
        stream = harness.events_stream(spark, src, max_files_per_trigger=4)
        q = dynamic_rules_stream(stream, rules_path, out, ckpt)
        q.awaitTermination(180)

    write_rules([(1, "purchase", 90.0)])
    copy_ordered(parts[:4])
    run()
    first = spark.read.parquet(out).collect()
    assert len(first) > 0
    assert all(r["event_type"] == "purchase" and r["rule_id"] == 1
               and r["value"] >= 90.0 for r in first)

    write_rules([(2, "purchase", 99.0), (3, "error", 0.0)])
    copy_ordered(parts[4:])
    run()
    both = spark.read.parquet(out).collect()
    second = [r for r in both if r["rule_id"] != 1]
    # run 2 alerts carry ONLY v2 rules, both types present
    assert {r["rule_id"] for r in second} <= {2, 3}
    assert any(r["rule_id"] == 3 for r in second)
    assert all(r["value"] >= r["threshold"] for r in both)
    # exactly-once on events: no duplicate alert rows
    ids = [(r["event_id"], r["rule_id"]) for r in both]
    assert len(ids) == len(set(ids))
    # v1 alert count unchanged by run 2 (no reprocessing of old epochs)
    assert len([r for r in both if r["rule_id"] == 1]) == len(first)


def test_topk_stream_equals_batch(spark, sf_dir, staged):
    """Continuous top-k: the streaming face keeps only the windowed
    counts in state; the stateless topk_select over the materialized
    append output must equal the batch twin end-to-end."""
    from spark_cep_spark.streaming.windows import (
        stream_topk,
        topk_select,
        topk_stream,
    )

    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = topk_select(
        harness.run_available_now(
            topk_stream(stream, watermark="35 days"), "complete"
        )
    )
    want = stream_topk(spark, sf_dir)
    cols = ["win_start", "user_id", "n", "rk"]
    assert _sorted_pdf(got, cols).equals(_sorted_pdf(want, cols))


def test_dynamic_session_stream_equals_batch(spark, sf_dir, staged):
    """Dynamic-gap sessions: per-event gap expression through the
    streaming session_window operator == the batch twin."""
    from spark_cep_spark.streaming.windows import (
        dynamic_session_stream,
        stream_session_dynamic,
    )

    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        dynamic_session_stream(stream, watermark="35 days"), "complete"
    )
    want = stream_session_dynamic(spark, sf_dir)
    cols = ["user_id", "session_start", "session_end", "n"]
    assert _sorted_pdf(got, cols).equals(_sorted_pdf(want, cols))


def test_distinct_users_stream_equals_batch(spark, sf_dir, staged):
    """Chained stateful dedup→count (windowed exact distinct) drained
    multi-micro-batch must equal the batch twin exactly."""
    from spark_cep_spark.streaming.windows import (
        distinct_users_stream,
        stream_distinct_users,
    )
    from spark_cep_spark.streaming import harness

    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        distinct_users_stream(stream, watermark="35 days"), "complete"
    )
    want = stream_distinct_users(spark, sf_dir)
    g = {
        (r["win_start"], r["event_type"]): r["n_users"]
        for r in got.collect()
    }
    w = {
        (r["win_start"], r["event_type"]): r["n_users"]
        for r in want.collect()
    }
    assert g == w and len(g) > 0


def test_wau_stream_equals_batch(spark, sf_dir, staged):
    """Sliding-window exact distinct (rolling 7-day WAU) drained
    multi-micro-batch must equal the batch twin exactly."""
    from spark_cep_spark.streaming.windows import stream_wau, wau_stream
    from spark_cep_spark.streaming import harness

    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        wau_stream(stream, watermark="35 days"), "complete"
    )
    want = stream_wau(spark, sf_dir)
    g = {r["win_start"]: r["wau"] for r in got.collect()}
    w = {r["win_start"]: r["wau"] for r in want.collect()}
    assert g == w and len(g) > 0


def test_ohlc_stream_equals_batch(spark, sf_dir, staged):
    """Streaming OHLC candles (declarative min_by/max_by state)
    drained multi-micro-batch must equal the agg_ohlc batch key."""
    from spark_cep_spark.operators.aggregates import agg_ohlc
    from spark_cep_spark.streaming.windows import ohlc_stream
    from spark_cep_spark.streaming import harness

    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        ohlc_stream(stream, watermark="35 days"), "complete"
    )
    want = agg_ohlc(spark, sf_dir)
    cols = ["user_id", "day", "open", "high", "low", "close",
            "volume", "turnover"]
    g = {tuple(r[c] for c in cols) for r in got.collect()}
    w = {tuple(r[c] for c in cols) for r in want.collect()}
    assert g == w and len(g) > 0


def test_log2q_stream_equals_batch(spark, sf_dir, tmp_path_factory):
    """Continuous quantile sketch under the PRODUCTION path: APPEND
    mode with a short watermark — a far-future sentinel row pushes
    the watermark past every fixture window so each (window, type)
    count row is emitted exactly once when its window CLOSES; the
    stateless log2q_select over the appended counts must equal the
    batch twin (mergeable-by-addition means multi-micro-batch
    partials combine exactly).  The sentinel's own window is filtered
    from both sides."""
    import datetime as _ddt
    import glob as _glob
    import os

    from spark_cep_spark.streaming.windows import (
        log2q_select,
        log2q_stream,
        stream_log2_quantile,
    )

    staged2 = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    sentinel = spark.createDataFrame(
        [(10**9, _ddt.datetime(2030, 1, 1), -1, "view", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sentinel.coalesce(1).write.mode("append").parquet(staged2)
    newest = max(
        _glob.glob(os.path.join(staged2, "part-*")), key=os.path.getmtime
    )
    os.utime(newest, (1_700_000_000 + 10_000 * 3600,) * 2)

    stream = harness.events_stream(spark, staged2, max_files_per_trigger=2)
    counts = harness.run_available_now(
        log2q_stream(stream, watermark="10 minutes"), "append"
    ).filter("win_start < timestamp'2029-01-01'")
    got = log2q_select(counts)
    want = stream_log2_quantile(spark, sf_dir)
    cols = ["win_start", "etype", "n", "q50_bucket", "q99_bucket"]
    assert _sorted_pdf(got, cols).equals(_sorted_pdf(want, cols))
