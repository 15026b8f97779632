"""Streaming CEP NFA vs the batch compiler (its executable spec).

The NFA runs under availableNow over the fixture split into multiple
micro-batches. With time-sorted staging + zero-delay watermark, every
event matures by end-of-stream and nothing is watermark-dropped, so
the NFA's output must EQUAL compile_batch on the same data — the
strongest equivalence assertable (SURVEY §7 M3 risk 1). Out-of-order
arrival within the watermark delay is exercised separately.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import shutil

import pytest

from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.operators.cep import Pattern
from spark_cep_spark.streaming import harness
from spark_cep_spark.streaming.nfa import compile_stream


def _funnel(within: str) -> Pattern:
    return (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by("purchase", "event_type = 'purchase'")
        .within(within)
    )


def _norm(rows):
    return sorted(tuple(r) for r in rows)


@pytest.mark.parametrize("within", ["6 HOURS", "24 HOURS"])
def test_nfa_equals_batch_compiler_on_fixture(spark, sf_dir, within):
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        compile_stream(_funnel(within), stream, watermark="0 seconds"), "append"
    )
    want = _funnel(within).compile_batch(table(spark, sf_dir, "events"))
    assert _norm(got.collect()) == _norm(want.collect())
    assert got.count() > 0  # non-vacuous


def test_absence_stream_equals_batch_anti_join(spark, sf_dir):
    """Streaming negation vs the batch anti-join (cep_absence): on the
    time-sorted fixture with zero watermark delay, the stream must emit
    exactly the batch result RESTRICTED to anchors whose full window
    passed the final watermark — later anchors are not yet provably
    unmatched (that is the correct streaming answer, not a defect)."""
    import spark_cep_spark
    from spark_cep_spark.streaming.nfa import absence_stream

    spark_cep_spark.load_all()
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        absence_stream(
            stream,
            "event_type = 'signup'",
            "event_type = 'purchase'",
            "7 DAYS",
            watermark="0 seconds",
        ),
        "append",
    )
    events = table(spark, sf_dir, "events")
    max_ts = events.agg({"ts": "max"}).first()[0]
    want = (
        spark_cep_spark.QUERIES["cep_absence"](spark, sf_dir)
        .filter(F.expr(f"signup_ts + INTERVAL 7 DAYS <= timestamp'{max_ts}'"))
        .select("user_id", F.col("signup_id").alias("anchor_id"),
                F.col("signup_ts").alias("t_anchor"))
    )
    assert _norm(got.collect()) == _norm(want.collect())
    assert got.count() > 0  # non-vacuous


def test_kleene_stream_equals_batch_closed_runs(spark, sf_dir):
    """Streaming Kleene-plus vs the batch gaps-and-islands (cep_kleene):
    the stream emits a run when a non-matching event breaks it, so the
    comparable batch set is runs with ANY later event for that user
    (a user's final, still-open run stays in state — correct streaming
    semantics, the run could still grow)."""
    import spark_cep_spark
    from spark_cep_spark.streaming.nfa import kleene_stream

    spark_cep_spark.load_all()
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        kleene_stream(
            stream, "event_type = 'error'", min_len=3, watermark="0 seconds"
        ),
        "append",
    )
    events = table(spark, sf_dir, "events")
    later = events.select(F.col("user_id").alias("key"), F.col("ts").alias("later_ts"))
    want = (
        spark_cep_spark.QUERIES["cep_kleene"](spark, sf_dir)
        .select(
            F.col("user_id").alias("key"), "run_start", "run_end", "run_len"
        )
        .join(later, ["key"])
        .filter(F.col("later_ts") > F.col("run_end"))
        .drop("later_ts")
        .distinct()
    )
    assert _norm(got.collect()) == _norm(want.collect())
    assert got.count() > 0


def test_threshold_stream_equals_batch_window(spark, sf_dir):
    """Streaming spike detection vs the batch trailing-window query
    (cep_threshold). The spike decision depends only on PAST events, so
    every matured event decides immediately — exact equality with batch,
    no open-window remainder."""
    import spark_cep_spark
    from spark_cep_spark.streaming.nfa import threshold_stream

    spark_cep_spark.load_all()
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        threshold_stream(stream, watermark="0 seconds"), "append"
    ).select(
        F.col("key").alias("user_id"), "event_id", "ts", "value",
        F.round("trail_avg", 6).alias("trail_avg"),
    )
    want = spark_cep_spark.QUERIES["cep_threshold"](spark, sf_dir)
    assert _norm(got.collect()) == _norm(want.collect())
    assert got.count() > 0


def test_strict_next_stream_equals_batch_compiler(spark, sf_dir):
    """Streaming strict contiguity (`Pattern.next`) vs its batch
    compilation (cep_strict_next). compile_stream must auto-disable the
    non-matching-event filter: the key's immediately-next event decides
    life or death of a strict partial, whatever its type. End-of-stream
    watermark matures everything, so equality is exact (a last-event
    anchor has no next event in EITHER engine)."""
    pat = (
        Pattern.begin("e1", "event_type = 'error'")
        .next("e2", "event_type = 'error'")
        .within("1 HOUR")
    )
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        compile_stream(pat, stream, watermark="0 seconds"), "append"
    )
    want = pat.compile_batch(table(spark, sf_dir, "events"))
    assert _norm(got.collect()) == _norm(want.collect())
    assert got.count() > 0


def test_strict_next_stream_rejects_interleaved(spark):
    """error→view→error must NOT match error NEXT error (relaxed
    followed_by would match it) — the discriminating case for strict
    semantics in the stream, plus a flush sentinel."""
    t0 = dt.datetime(2024, 6, 1)
    rows = [
        (1, 1, t0, "error"),
        (2, 1, t0 + dt.timedelta(minutes=5), "view"),
        (3, 1, t0 + dt.timedelta(minutes=10), "error"),
        (4, 2, t0 + dt.timedelta(minutes=20), "error"),
        (5, 2, t0 + dt.timedelta(minutes=25), "error"),
        (6, 99, t0 + dt.timedelta(hours=12), "view"),  # watermark flush
    ]
    df = spark.createDataFrame(
        [(i, t, u, ty, 1.0, "{}") for i, u, t, ty in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    src = harness.SCRATCH + "/strict_next"
    shutil.rmtree(src, ignore_errors=True)
    df.coalesce(1).write.parquet(src)
    pat = (
        Pattern.begin("e1", "event_type = 'error'")
        .next("e2", "event_type = 'error'")
        .within("1 HOUR")
    )
    stream = harness.events_stream(spark, src, max_files_per_trigger=1)
    got = harness.run_available_now(
        compile_stream(pat, stream, watermark="0 seconds"), "append"
    ).collect()
    assert [(r.key, r.anchor_id) for r in got] == [(2, 4)]


def test_funnel_abandon_stream_equals_batch_compiler(spark, sf_dir):
    """Streaming terminal negation (`Pattern.not_followed_by`) vs its
    batch compilation (cep_funnel_abandon), restricted to anchors whose
    full window passed the final watermark — the same discipline as the
    absence test: a later anchor is not yet provably unmatched."""
    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .not_followed_by("purchase", "event_type = 'purchase'")
        .within("6 HOUR")
    )
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        compile_stream(pat, stream, watermark="0 seconds"), "append"
    )
    events = table(spark, sf_dir, "events")
    max_ts = events.agg({"ts": "max"}).first()[0]
    want = pat.compile_batch(events).filter(
        F.expr(f"t_view + INTERVAL 6 HOURS <= timestamp'{max_ts}'")
    )
    assert _norm(got.collect()) == _norm(want.collect())
    assert got.count() > 0


def test_nfa_handles_out_of_order_arrival_within_watermark(spark):
    """The click ARRIVES in an earlier micro-batch than the view (files
    reversed), but both are within the watermark delay — event-time
    order must win inside the NFA's buffer. A far-future sentinel view
    event (different user) arrives last to flush the watermark forward —
    it must match a step: the non-matching-event filter sits below the
    watermark node, so only matching events advance the event clock."""
    t0 = dt.datetime(2024, 6, 1)

    def mk(rows, sid):
        return spark.createDataFrame(
            [(sid + i, t, u, ty, 1.0, "{}") for i, (u, t, ty) in enumerate(rows)],
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        )

    src = harness.SCRATCH + "/nfa_ooo"
    shutil.rmtree(src, ignore_errors=True)
    # arrival order: click(t0+10m) → view(t0) → sentinel(t0+10h)
    mk([(1, t0 + dt.timedelta(minutes=10), "click")], 0).coalesce(1).write.parquet(src)
    mk([(1, t0, "view")], 10).coalesce(1).write.mode("append").parquet(src)
    mk([(99, t0 + dt.timedelta(hours=10), "view")], 20).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    order = []
    for f in glob.glob(src + "/part*"):
        ids = [r.event_id for r in spark.read.parquet(f).collect()]
        order.append((min(ids), f))
    order.sort()
    now = 1_700_000_000
    for i, (_, f) in enumerate(order):
        os.utime(f, (now + 3600 * i,) * 2)

    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .within("1 HOUR")
    )
    stream = harness.events_stream(spark, src, max_files_per_trigger=1)
    got = harness.run_available_now(
        compile_stream(pat, stream, watermark="30 minutes"), "append"
    ).collect()
    # view(t0) then click(t0+10m): exactly one match, anchored at the view
    assert len(got) == 1
    assert got[0].anchor_id == 10
    assert got[0].t_click == t0 + dt.timedelta(minutes=10)


def test_times_stream_equals_batch_compiler(spark, sf_dir):
    """Pattern.times expands to plain sub-steps, so the streaming NFA
    must agree with the batch compiler with no kernel changes — checked
    for both contiguity modes of the run."""
    for contiguity in ("relaxed", "strict"):
        pat = (
            Pattern.begin("v", "event_type = 'view'")
            .times("c", "event_type = 'click'", 2, contiguity=contiguity)
            .within("24 HOURS")
        )
        staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=4)
        stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
        got = harness.run_available_now(
            compile_stream(pat, stream, watermark="0 seconds"), "append"
        )
        want = pat.compile_batch(table(spark, sf_dir, "events"))
        assert _norm(got.collect()) == _norm(want.collect())
        if contiguity == "relaxed":
            assert got.count() > 0


def test_kleene_middle_stream_equals_batch_compiler(spark, sf_dir):
    """one_or_more in the middle of a sequence: the event that binds
    the following step is the one that closes the run, so streaming
    equals batch exactly at end-of-stream (every match's closing event
    matured)."""
    pat = (
        Pattern.begin("s", "event_type = 'signup'")
        .one_or_more("err", "event_type = 'error'")
        .followed_by("v", "event_type = 'view'")
        .within("7 DAYS")
    )
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        compile_stream(pat, stream, watermark="0 seconds"), "append"
    )
    want = pat.compile_batch(table(spark, sf_dir, "events"))
    assert _norm(got.collect()) == _norm(want.collect())
    assert got.count() > 0


def test_emit_ids_stream_equals_batch_compiler(spark, sf_dir):
    """emit_ids parity across both engines on a pattern mixing a plain
    step, a Kleene run (id_first/id_last), and a strict step: every
    id_<step> column the NFA emits must equal the batch compiler's —
    the ids are the join-back-to-attributes handle, so they must agree
    under ts ties (both sides break ties by (ts, event_id))."""
    pat = (
        Pattern.begin("s", "event_type = 'signup'")
        .one_or_more("err", "event_type = 'error'")
        .followed_by("v", "event_type = 'view'")
        .within("7 DAYS")
    )
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        compile_stream(pat, stream, watermark="0 seconds", emit_ids=True),
        "append",
    )
    want = pat.compile_batch(table(spark, sf_dir, "events"), emit_ids=True)
    assert sorted(got.columns) == sorted(want.columns)
    cols = sorted(want.columns)
    assert _norm(got.select(*cols).collect()) == _norm(
        want.select(*cols).collect()
    )
    assert got.count() > 0
    # ids must reference real events of the right type (join-back check)
    ev = table(spark, sf_dir, "events").select("event_id", "event_type")
    joined = want.join(ev, want.id_v == ev.event_id, "left")
    assert joined.filter(F.col("event_type") != "view").count() == 0
    assert joined.filter(F.col("event_type").isNull()).count() == 0


def test_corr_stream_equals_batch_compiler(spark, sf_dir):
    """Cross-step correlation on the fixture: the purchase step binds
    only when its value exceeds BOTH the anchor view's and the bound
    click's — exercising anchor env capture AND the struct-carried
    intermediate binding. Streaming (Python-translated where inside
    the NFA) must equal batch (SQL-translated where in the join
    condition) exactly — this parity is what proves the two
    translations of the same clause agree."""
    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by(
            "purchase",
            "event_type = 'purchase'",
            where="purchase.value > view.value AND purchase.value > click.value",
        )
        .within("24 HOURS")
    )
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        compile_stream(pat, stream, watermark="0 seconds"), "append"
    )
    want = pat.compile_batch(table(spark, sf_dir, "events"))
    assert _norm(got.collect()) == _norm(want.collect())
    assert got.count() > 0
    # the correlation must actually bite: strictly fewer matches than
    # the uncorrelated funnel
    plain = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by("purchase", "event_type = 'purchase'")
        .within("24 HOURS")
    )
    assert got.count() < plain.compile_batch(
        table(spark, sf_dir, "events")
    ).count()


def test_corr_null_with_or_stream_equals_batch(spark):
    """SQL three-valued logic parity on NULL correlation values: a NULL
    operand in ONE disjunct must not veto a true OTHER disjunct
    (NULL OR TRUE = TRUE), and the result must not depend on disjunct
    order (the old whole-expression try/except made it Python-
    short-circuit-order-dependent). Batch F.expr is the spec."""
    t0 = dt.datetime(2024, 6, 1)
    rows = [
        # user 1: view.value NULL, second disjunct true → MUST match
        (1, 1, t0, "view", None),
        (2, 1, t0 + dt.timedelta(minutes=5), "click", 2.0),
        (3, 1, t0 + dt.timedelta(minutes=10), "purchase", 5.0),
        # user 2: NULL OR FALSE → UNKNOWN → no match on either engine
        (4, 2, t0, "view", None),
        (5, 2, t0 + dt.timedelta(minutes=5), "click", 10.0),
        (6, 2, t0 + dt.timedelta(minutes=10), "purchase", 5.0),
        # user 3: no NULLs, first disjunct true → match (control)
        (7, 3, t0, "view", 1.0),
        (8, 3, t0 + dt.timedelta(minutes=5), "click", 10.0),
        (9, 3, t0 + dt.timedelta(minutes=10), "purchase", 5.0),
        (10, 99, t0 + dt.timedelta(hours=12), "view", 1.0),  # flush
    ]
    df = spark.createDataFrame(
        [(i, t, u, ty, v, "{}") for i, u, t, ty, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    src = harness.SCRATCH + "/corr_null_or"
    shutil.rmtree(src, ignore_errors=True)
    df.coalesce(1).write.parquet(src)
    for where in (
        "purchase.value > view.value OR purchase.value > click.value",
        "purchase.value > click.value OR purchase.value > view.value",
    ):
        pat = (
            Pattern.begin("view", "event_type = 'view'")
            .followed_by("click", "event_type = 'click'")
            .followed_by("purchase", "event_type = 'purchase'", where=where)
            .within("24 HOURS")
        )
        stream = harness.events_stream(spark, src, max_files_per_trigger=1)
        got = harness.run_available_now(
            compile_stream(pat, stream, watermark="0 seconds"), "append"
        )
        want = pat.compile_batch(spark.read.parquet(src))
        assert _norm(got.collect()) == _norm(want.collect())
        assert sorted(r.key for r in got.collect()) == [1, 3]


def test_measures_stream_equals_batch_compiler(spark, sf_dir):
    """MEASURES projection parity: computed columns (final-step and
    intermediate-step values, an arithmetic combination) must be
    identical between the batch carried-value projection and the NFA's
    env-based evaluation — including under the where-correlation that
    shares the same carried values."""
    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by(
            "purchase",
            "event_type = 'purchase'",
            where="purchase.value > view.value",
        )
        .within("24 HOURS")
        .measure("uplift", "purchase.value - view.value")
        .measure("click_val", "click.value")
    )
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        compile_stream(pat, stream, watermark="0 seconds"), "append"
    )
    want = pat.compile_batch(table(spark, sf_dir, "events"))
    assert got.columns == want.columns
    assert _norm(got.collect()) == _norm(want.collect())
    assert got.count() > 0


def test_measures_on_negation_pattern_stream(spark, sf_dir):
    """Measures on a not_followed_by pattern: emission happens on the
    WATERMARK path (absence proven), so the env must survive in the
    partial's state — the other emission path from the in-loop binds."""
    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .not_followed_by("purchase", "event_type = 'purchase'")
        .within("6 HOUR")
        .measure("combo", "view.value + 2 * click.value")
    )
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        compile_stream(pat, stream, watermark="0 seconds"), "append"
    )
    events = table(spark, sf_dir, "events")
    max_ts = events.agg({"ts": "max"}).first()[0]
    want = pat.compile_batch(events).filter(
        F.expr(f"t_view + INTERVAL 6 HOURS <= timestamp'{max_ts}'")
    )
    assert _norm(got.collect()) == _norm(want.collect())
    assert got.count() > 0


def test_run_agg_measures_stream_equals_batch(spark, sf_dir):
    """Aggregates over a Kleene run, both as a later step's correlation
    input (where on max(err.value)) and as measures: the NFA's one-pass
    run state must equal the batch gaps-and-islands aggregation. sum
    and avg are rounded on both sides (engine-order float addition);
    max/first/count are compared exactly."""
    pat = (
        Pattern.begin("s", "event_type = 'signup'")
        .one_or_more("err", "event_type = 'error'")
        .followed_by("v", "event_type = 'view'", where="v.value < max(err.value)")
        .within("7 DAYS")
        .measure("err_max", "max(err.value)")
        .measure("err_first", "first(err.value)")
        .measure("err_n", "count(err.value)")
        .measure("err_sum", "sum(err.value)")
        .measure("err_avg", "avg(err.value)")
    )
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        compile_stream(pat, stream, watermark="0 seconds"), "append"
    )
    want = pat.compile_batch(table(spark, sf_dir, "events"))
    assert got.columns == want.columns

    def rounded(df):
        return df.withColumn("err_sum", F.round("err_sum", 6)).withColumn(
            "err_avg", F.round("err_avg", 6)
        )

    assert _norm(rounded(got).collect()) == _norm(rounded(want).collect())
    assert got.count() > 0


def test_kleene_terminal_stream_greedy_run(spark):
    """Terminal one_or_more: the run must absorb ALL consecutive
    matching events (greedy) and emit once closed — by a following
    event (user 1) or by the watermark passing the deadline (user 2,
    flushed by the sentinel)."""
    t0 = dt.datetime(2024, 6, 1)
    rows = [
        (1, 1, t0, "signup"),
        (2, 1, t0 + dt.timedelta(minutes=5), "error"),
        (3, 1, t0 + dt.timedelta(minutes=6), "error"),
        (4, 1, t0 + dt.timedelta(minutes=7), "view"),   # closes run
        (5, 2, t0 + dt.timedelta(minutes=20), "signup"),
        (6, 2, t0 + dt.timedelta(minutes=25), "error"),  # run open at end
        (7, 99, t0 + dt.timedelta(days=2), "view"),      # watermark flush
    ]
    df = spark.createDataFrame(
        [(i, t, u, ty, 1.0, "{}") for i, u, t, ty in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    src = harness.SCRATCH + "/kleene_term"
    shutil.rmtree(src, ignore_errors=True)
    df.orderBy("ts").coalesce(1).write.parquet(src)
    pat = (
        Pattern.begin("s", "event_type = 'signup'")
        .one_or_more("err", "event_type = 'error'")
        .within("1 HOUR")
    )
    stream = harness.events_stream(spark, src, max_files_per_trigger=1)
    got = sorted(
        (r.key, r.anchor_id, r.err_count)
        for r in harness.run_available_now(
            compile_stream(pat, stream, watermark="0 seconds"), "append"
        ).collect()
    )
    assert got == [(1, 1, 2), (2, 5, 1)]


def test_nfa_state_survives_checkpoint_restart(spark, sf_dir, tmp_path):
    """Kill-and-resume for the stateful CEP operator: drain half the
    source files into a parquet sink, then add the rest and restart
    from the same checkpoint. The NFA's partials/buffer state and the
    watermark must resume exactly — the two-run output equals an
    uninterrupted run (incl. matches SPANNING the restart boundary),
    with no duplicates."""
    import os

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=8)
    pat = _funnel("24 HOURS")

    src = str(tmp_path / "src")
    os.makedirs(src)
    parts = sorted(f for f in os.listdir(staged) if f.startswith("part"))
    assert len(parts) >= 8

    def run(src_dir, out, ckpt):
        stream = harness.events_stream(spark, src_dir, max_files_per_trigger=2)
        q = (
            compile_stream(pat, stream, watermark="0 seconds")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    def copy_ordered(names):
        # ascending mtimes keep the file source's arrival order equal to
        # event-time order (a same-ms mtime tie can reorder files and
        # late-drop under the 0s watermark)
        for f in names:
            dst = os.path.join(src, f)
            shutil.copy(os.path.join(staged, f), dst)
            os.utime(dst, (1_700_000_000 + parts.index(f) * 3600,) * 2)

    copy_ordered(parts[:4])
    run(src, out, ckpt)
    n_first = spark.read.parquet(out).count()
    copy_ordered(parts[4:])
    run(src, out, ckpt)

    got = spark.read.parquet(out)
    uninterrupted = harness.run_available_now(
        compile_stream(
            pat,
            harness.events_stream(spark, staged, max_files_per_trigger=2),
            watermark="0 seconds",
        ),
        "append",
    )
    assert _norm(got.collect()) == _norm(uninterrupted.collect())
    assert got.count() == got.dropDuplicates(["key", "anchor_id"]).count()
    # non-vacuous: matches exist on both sides of the restart boundary
    assert 0 < n_first < got.count()


def test_multi_pattern_single_pass_equals_individual_runs(spark, sf_dir):
    """compile_stream_multi: three heterogeneous patterns (relaxed
    funnel with a measure, strict pair, kleene run with aggregate
    correlation) evaluated in ONE stream pass must produce, per
    pattern, exactly the matches of its individual compile_stream run
    — one shuffle and one state store shared by the whole registry."""
    import json as _json

    from spark_cep_spark.streaming.nfa import compile_stream_multi

    pats = {
        "funnel": (
            Pattern.begin("view", "event_type = 'view'")
            .followed_by("click", "event_type = 'click'")
            .followed_by("purchase", "event_type = 'purchase'")
            .within("24 HOURS")
            .measure("uplift", "purchase.value - view.value")
        ),
        "errpair": (
            Pattern.begin("e1", "event_type = 'error'")
            .next("e2", "event_type = 'error'")
            .within("1 HOUR")
        ),
        "errburst": (
            Pattern.begin("s", "event_type = 'signup'")
            .one_or_more("err", "event_type = 'error'")
            .followed_by(
                "v", "event_type = 'view'", where="v.value < max(err.value)"
            )
            .within("7 DAYS")
        ),
    }
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        compile_stream_multi(pats, stream, watermark="0 seconds"), "append"
    ).collect()
    by_pat = {}
    for r in got:
        by_pat.setdefault(r.pattern, []).append(r)

    for pname, pat in pats.items():
        stream_i = harness.events_stream(
            spark,
            harness.stage_events_files_sorted(spark, sf_dir, n_files=6),
            max_files_per_trigger=2,
        )
        want = harness.run_available_now(
            compile_stream(pat, stream_i, watermark="0 seconds"), "append"
        ).collect()
        got_keys = sorted((r.key, r.anchor_id) for r in by_pat.get(pname, []))
        want_keys = sorted((r.key, r.anchor_id) for r in want)
        assert got_keys == want_keys, pname
        assert len(got_keys) > 0, pname

    # measures flow into the normalized JSON: funnel uplift must match
    # the typed batch output
    want_uplift = {
        (r.key, r.anchor_id): r.uplift
        for r in pats["funnel"].compile_batch(
            table(spark, sf_dir, "events")
        ).collect()
    }
    for r in by_pat["funnel"]:
        doc = _json.loads(r.match)
        assert doc["measures"]["uplift"] == want_uplift[(r.key, r.anchor_id)]
        assert set(doc) == {"view", "click", "purchase", "measures"}


def test_streaming_alert_throttle_equals_batch(spark, sf_dir):
    """Spike detection + cooldown suppression in one keyed state over
    multiple micro-batches == the batch cep_alert_throttle (sorted
    staging + zero-delay watermark matures the whole stream)."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import alert_throttle_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        alert_throttle_stream(stream, watermark="0 seconds"), "append"
    )
    want = entry.queries()["cep_alert_throttle"](spark, sf_dir)
    g = {
        (r["key"], r["event_id"]): round(r["trail_avg"], 6)
        for r in got.collect()
    }
    w = {
        (r["user_id"], r["event_id"]): r["trail_avg"]
        for r in want.collect()
    }
    assert g == w


def test_gap_stream_equals_batch_compiler(spark, sf_dir):
    """Per-transition gap deadlines (Step.gap) in the NFA vs the batch
    compilation: view -> click within 30min OF THE VIEW -> no purchase
    within 1h OF THE CLICK, whole match in 24h. Same final-watermark
    discipline as the other negation tests."""
    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'", gap="30 MINUTES")
        .not_followed_by("purchase", "event_type = 'purchase'", gap="1 HOUR")
        .within("24 HOURS")
    )
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        compile_stream(pat, stream, watermark="0 seconds"), "append"
    )
    events = table(spark, sf_dir, "events")
    max_ts = events.agg({"ts": "max"}).first()[0]
    want = pat.compile_batch(events).filter(
        F.expr(f"t_view + INTERVAL 24 HOURS <= timestamp'{max_ts}'")
    )
    assert _norm(got.collect()) == _norm(want.collect())


def test_gap_positive_stream_equals_batch_compiler(spark, sf_dir):
    """Gap on a positive relaxed step only (no negation): the earliest
    click within 10 minutes of the view — events between 10min and the
    24h bound must NOT bind."""
    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'", gap="10 MINUTES")
        .within("24 HOURS")
    )
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        compile_stream(pat, stream, watermark="0 seconds"), "append"
    )
    events = table(spark, sf_dir, "events")
    max_ts = events.agg({"ts": "max"}).first()[0]
    want = pat.compile_batch(events).filter(
        F.expr(f"t_view <= timestamp'{max_ts}' - INTERVAL 24 HOURS")
    )
    got_f = got.filter(
        F.expr(f"t_view <= timestamp'{max_ts}' - INTERVAL 24 HOURS")
    )
    assert _norm(got_f.collect()) == _norm(want.collect())
    assert want.count() > 0


def test_gap_kernel_chunking_invariance():
    """advance_nfa_full with gaps is micro-batch-boundary invariant:
    any split of the event list yields the same matches as one pass."""
    from spark_cep_spark.streaming.nfa import advance_nfa_full

    US = 60_000_000  # 1 minute
    # user timeline: A at 0; B candidates at 5, 45 min; gap(B)=30min
    evs = [
        [0 * US, 0, [True, False]],
        [5 * US, 1, [False, True]],
        [45 * US, 2, [False, True]],
        [300 * US, 3, [False, False]],  # watermark pusher
    ]
    contig = ["relaxed", "relaxed"]
    gaps = [None, 30 * US]
    wm = 400 * US
    _, whole = advance_nfa_full([], evs, contig, 3600 * US, wm, gaps=gaps)
    for cut in range(len(evs) + 1):
        st, m1 = advance_nfa_full([], evs[:cut], contig, 3600 * US, 0, gaps=gaps)
        st, m2 = advance_nfa_full(st, evs[cut:], contig, 3600 * US, wm, gaps=gaps)
        assert m1 + m2 == whole
    # the in-gap candidate (5 min) binds; without gaps same; and a
    # gap of 2 minutes excludes both candidates
    assert [mt[1][1][0] for mt in whole] == [5 * US]
    _, no_gap = advance_nfa_full([], evs, contig, 3600 * US, wm)
    assert [mt[1][1][0] for mt in no_gap] == [5 * US]
    _, tight = advance_nfa_full(
        [], evs, contig, 3600 * US, wm, gaps=[None, 2 * US]
    )
    assert tight == []


def test_multi_pattern_respects_gaps(spark, sf_dir):
    """compile_stream_multi must thread per-step gap deadlines — a
    gapped pattern in the registry equals its individual
    compile_stream run (before the fix the multi path silently ignored
    gaps and over-matched)."""
    from spark_cep_spark.streaming.nfa import compile_stream_multi

    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'", gap="10 MINUTES")
        .within("24 HOURS")
    )
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=4)
    multi = harness.run_available_now(
        compile_stream_multi(
            {"gapped": pat},
            harness.events_stream(spark, staged, max_files_per_trigger=2),
            watermark="0 seconds",
        ),
        "append",
    )
    single = harness.run_available_now(
        compile_stream(
            pat,
            harness.events_stream(spark, staged, max_files_per_trigger=2),
            watermark="0 seconds",
        ),
        "append",
    )
    m = {(r["key"], r["anchor_id"]) for r in multi.collect()}
    s_ = {(r["key"], r["anchor_id"]) for r in single.collect()}
    assert m == s_
    assert len(m) > 0


def test_subset_measures_stream_equals_batch_compiler(spark, sf_dir):
    """SUBSET union-variable measures on BOTH engines: a kleene run in
    the middle so the closing step matures every match — streaming
    must equal batch exactly, including the expanded subset measures
    (sum across members, least() min, member-navigated first/last)."""
    pat = (
        Pattern.begin("s", "event_type = 'signup'")
        .one_or_more("err", "event_type = 'error'")
        .followed_by("v", "event_type = 'view'")
        .within("7 DAYS")
        .subset("u", ["s", "err", "v"])
        .measure("u_first", "first(u.value)")
        .measure("u_last", "last(u.value)")
        .measure("u_min", "min(u.value)")
        .measure("u_sum", "sum(u.value)")
    )
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        compile_stream(pat, stream, watermark="0 seconds"), "append"
    )
    want = pat.compile_batch(table(spark, sf_dir, "events"))
    cols = sorted(want.columns)
    assert sorted(got.columns) == cols
    assert _norm(got.select(*cols).collect()) == _norm(
        want.select(*cols).collect()
    )
    assert got.count() > 0


def test_subset_validation_errors():
    """Pointed errors: unknown member, negated member, duplicate name,
    bare subset ref, count over a subset."""
    base = (
        Pattern.begin("s", "event_type = 'signup'")
        .one_or_more("err", "event_type = 'error'")
        .followed_by("v", "event_type = 'view'")
        .not_followed_by("x", "event_type = 'purchase'")
        .within("7 DAYS")
    )
    with pytest.raises(ValueError, match="not a declared step"):
        base.subset("u", ["s", "nope"])
    with pytest.raises(ValueError, match="negated"):
        base.subset("u", ["s", "x"])
    base.subset("u", ["s", "err"])
    with pytest.raises(ValueError, match="collides"):
        base.subset("u", ["s"])
    with pytest.raises(ValueError, match="without\\s+an aggregate"):
        base.measure("m1", "u.value + 1")
    with pytest.raises(ValueError, match="count/avg over a SUBSET"):
        base.measure("m2", "count(u.value)")


def test_sql_subset_malformed_entry_errors(spark):
    """SUBSET clause parse errors are pointed, not raw exceptions."""
    from spark_cep_spark.operators.cep_sql import parse_pattern_sql

    with pytest.raises(ValueError, match="malformed SUBSET entry"):
        parse_pattern_sql(
            """
            PATTERN ( s -> e )
            WITHIN 1 HOUR
            SUBSET U = s, e
            DEFINE s AS event_type = 'signup',
                   e AS event_type = 'error'
            """
        )
