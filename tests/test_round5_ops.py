"""Round-5 hygiene/scale tests: text_vocab's TakeOrdered plan,
corpus_token_budget's exact pre-filter (differential vs the naive
single-window plan), agg_argminmax's pinned NULL policy,
win_sessionize's null-ts discipline, and the NFA's relaxed-path gap
state drop."""

from __future__ import annotations

import datetime as dt

import pytest

from conftest import SF_CHECK


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_text_vocab_plans_take_ordered_not_global_window(spark):
    """The top-256 cut must be TakeOrderedAndProject (bounded per-
    partition heaps), never a rank window over the full vocabulary."""
    from spark_cep_spark.operators.llm_text import text_vocab

    plan = _executed_plan(text_vocab(spark, SF_CHECK))
    assert "TakeOrderedAndProject" in plan


def test_token_budget_prefilter_matches_naive_plan(spark):
    """Differential: the pre-filtered corpus_token_budget must emit
    exactly the rows of the naive global-window plan."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W
    from spark_cep_spark.operators.llm_pipeline import corpus_token_budget
    from spark_cep_spark.io import table

    got = sorted(
        tuple(r) for r in corpus_token_budget(spark, SF_CHECK).collect()
    )
    d = table(spark, SF_CHECK, "documents")
    scored = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        "n_chars",
    )
    w = W.orderBy(F.col("n_chars").desc(), "doc_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    naive = (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= 10000)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )
    want = sorted(tuple(r) for r in naive.collect())
    assert got == want and len(got) > 0


def test_token_budget_window_input_is_bounded(spark):
    """The doc-level running-sum window must see only the pre-filtered
    candidate set (≈ budget tokens), not the whole corpus."""
    import pyspark.sql.functions as F
    from spark_cep_spark.operators.llm_pipeline import corpus_token_budget
    from spark_cep_spark.io import table

    d = table(spark, SF_CHECK, "documents")
    n_docs = d.count()
    scored = d.select(
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        "n_chars",
    )
    per_q = scored.groupBy("n_chars").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    from pyspark.sql import Window as W

    wq = W.orderBy(F.col("n_chars").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    c_min = (
        per_q.withColumn(
            "tokens_above",
            F.coalesce(F.sum("bucket_tokens").over(wq), F.lit(0)),
        )
        .filter(F.col("tokens_above") < 10000)
        .agg(F.min("n_chars"))
        .collect()[0][0]
    )
    n_candidates = scored.filter(F.col("n_chars") >= c_min).count()
    assert n_candidates < n_docs  # the pre-filter actually prunes
    # every candidate doc carries >=1 token, so the windowed row count
    # is bounded by budget + the boundary n_chars group
    boundary = scored.filter(F.col("n_chars") == c_min).count()
    assert n_candidates <= 10000 + boundary


def _with_events(spark, module, rows):
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "ts timestamp, value double"
    )
    orig = module.table
    module.table = lambda s, d, n: df
    return orig


def test_argminmax_ignores_null_values_for_extremes(spark):
    """A NULL-valued event must never win peak/trough (Spark struct
    compare sorts NULL first; DuckDB treats NULL as largest — the op
    pins the policy by excluding NULL-value rows from the extremes)."""
    import spark_cep_spark.operators.aggregates as A

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, "click", t0, 5.0),
        (2, 1, "click", t0 + dt.timedelta(minutes=1), None),
        (3, 1, "click", t0 + dt.timedelta(minutes=2), 1.0),
    ]
    orig = _with_events(spark, A, rows)
    try:
        r = A.agg_argminmax(spark, "x").collect()[0]
    finally:
        A.table = orig
    assert r["peak_event_id"] == 1 and r["peak_value"] == 5.0
    assert r["trough_event_id"] == 3 and r["trough_value"] == 1.0
    # time edges still consider every row (ts is never NULL here)
    assert r["first_event_id"] == 1 and r["last_event_id"] == 3


def test_win_sessionize_drops_null_ts(spark):
    """Null-ts events are excluded on both engine sides (Spark sorts
    nulls first, DuckDB last — ids would diverge otherwise)."""
    import spark_cep_spark.operators.windows as WND

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, "click", t0, 1.0),
        (2, 1, "click", None, 1.0),
        (3, 1, "click", t0 + dt.timedelta(hours=2), 1.0),
    ]
    orig = _with_events(spark, WND, rows)
    try:
        out = {
            r["event_id"]: r["session_id"]
            for r in WND.win_sessionize(spark, "x").collect()
        }
    finally:
        WND.table = orig
    assert out == {1: 1, 3: 2}  # null-ts row gone; gap still splits


def test_nfa_relaxed_gap_deadline_frees_state():
    """A relaxed partial whose per-step gap deadline has passed the
    watermark is dropped immediately (its transition is provably
    dead), not held until the whole-match bound expires."""
    from spark_cep_spark.streaming.nfa import advance_nfa_full

    M = 60_000_000  # one minute in us
    # pattern: A relaxed-then B within 60min, gap(B after A) = 5min
    contig = ["relaxed", "relaxed"]
    gaps = [None, 5 * M]
    # batch 1: one A at t=0 — partial parked
    partials, matches = advance_nfa_full(
        [], [[0, 1, [True, False]]], contig, 60 * M, 0, gaps=gaps
    )
    assert len(partials) == 1 and matches == []
    # batch 2: no events, watermark passes the 5-min gap deadline but
    # NOT the 60-min whole-match bound — state must be freed anyway
    partials, matches = advance_nfa_full(
        partials, [], contig, 60 * M, 6 * M, gaps=gaps
    )
    assert partials == [] and matches == []


def test_nfa_relaxed_gap_deadline_keeps_live_partials():
    """Same shape, watermark short of the gap deadline: partial kept,
    and a B inside the gap still completes the match."""
    from spark_cep_spark.streaming.nfa import advance_nfa_full

    M = 60_000_000
    contig = ["relaxed", "relaxed"]
    gaps = [None, 5 * M]
    partials, _ = advance_nfa_full(
        [], [[0, 1, [True, False]]], contig, 60 * M, 0, gaps=gaps
    )
    partials, matches = advance_nfa_full(
        partials, [], contig, 60 * M, 4 * M, gaps=gaps
    )
    assert len(partials) == 1
    partials, matches = advance_nfa_full(
        partials,
        [[int(4.5 * M), 2, [False, True]]],
        contig,
        60 * M,
        int(4.5 * M),
        gaps=gaps,
    )
    assert len(matches) == 1


# ---------------------------------------------------------------------------
# Round-5 coverage additions: nearest-direction as-of, bigram LM,
# weighted aggregate, IGNORE NULLS navigation.


def test_asof_nearest_semantics(spark):
    """Tie prefers the earlier (before) view; tolerance cuts; matches
    work in either direction; unmatched purchases keep NULL."""
    import spark_cep_spark.operators.joins as J

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    h = dt.timedelta(hours=1)
    rows = [
        # u1: views 1h before AND 1h after -> tie -> before
        (1, 1, "view", t0 - h, 1.0),
        (2, 1, "purchase", t0, 1.0),
        (3, 1, "view", t0 + h, 1.0),
        # u2: only a view after, 2h away
        (4, 2, "purchase", t0, 1.0),
        (5, 2, "view", t0 + 2 * h, 1.0),
        # u3: nearest view is 30h away -> outside 24h tolerance
        (6, 3, "purchase", t0, 1.0),
        (7, 3, "view", t0 + 30 * h, 1.0),
    ]
    df = spark.createDataFrame(
        [(i, u, ty, ts, v) for i, u, ty, ts, v in rows],
        "event_id long, user_id long, event_type string, ts timestamp, "
        "value double",
    )
    orig = J.table
    J.table = lambda s, d, n: df
    try:
        out = {
            r["event_id"]: (r["nearest_view_ts"], r["side"])
            for r in J.join_asof_nearest(spark, "x").collect()
        }
    finally:
        J.table = orig
    assert out[2] == (t0 - h, "before")  # tie -> earlier view
    assert out[4] == (t0 + 2 * h, "after")
    assert out[6] == (None, None)


def test_bigram_lm_counts_and_conditionals(spark):
    import spark_cep_spark.operators.llm_text as LT

    rows = [
        (1, "a b a b c", "en", "s", 9),
        (2, "a b", "en", "s", 3),
        (3, "x", "en", "s", 1),  # single token: no bigram
    ]
    orig = LT.table
    LT.table = lambda s, d, n: spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    try:
        out = {
            (r["w1"], r["w2"]): (r["n_pair"], r["n_first"], r["cond_p"])
            for r in LT.text_bigram_lm(spark, "x").collect()
        }
    finally:
        LT.table = orig
    # bigrams: (a,b)x3, (b,a)x1, (b,c)x1 ; firsts: a->3, b->2
    assert out[("a", "b")] == (3, 3, 1.0)
    assert out[("b", "a")] == (1, 2, 0.5)
    assert out[("b", "c")] == (1, 2, 0.5)
    assert len(out) == 3  # the 1-token doc contributes nothing


def test_agg_weighted_differs_from_plain_avg(spark):
    import spark_cep_spark.operators.aggregates as A

    rows = [  # heavy item cheap, light item expensive
        (1, 1, 1, 1, 10.0, 1.00, 0.0, 0.0, "R", "F",
         dt.datetime(1995, 1, 1)),
        (2, 1, 1, 2, 1.0, 100.00, 0.0, 0.0, "R", "F",
         dt.datetime(1995, 1, 1)),
    ]
    schema = (
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp"
    )
    orig = A.table
    A.table = lambda s, d, n: spark.createDataFrame(rows, schema)
    try:
        r = A.agg_weighted(spark, "x").collect()[0]
    finally:
        A.table = orig
    # weighted by qty: (10*1.00 + 1*100.00) / 11 = 10.0
    assert r["wavg_price"] == 10.0
    assert r["avg_price"] == 50.5
    assert r["total_qty"] == 11


def test_lag_ignore_nulls_fills_over_gaps(spark):
    import spark_cep_spark.operators.windows as WND

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, "click", t0, 5.0),
        (2, 1, "view", t0 + dt.timedelta(minutes=1), 9.0),   # masked
        (3, 1, "view", t0 + dt.timedelta(minutes=2), 9.0),   # masked
        (4, 1, "click", t0 + dt.timedelta(minutes=3), 7.0),
    ]
    orig = _with_events(spark, WND, rows)
    try:
        out = {
            r["event_id"]: (r["v"], r["v_filled"], r["v_prev"])
            for r in WND.win_lag_ignore_nulls(spark, "x").collect()
        }
    finally:
        WND.table = orig
    assert out[1] == (5.0, 5.0, None)
    assert out[2] == (None, 5.0, 5.0)  # filled across the gap
    assert out[3] == (None, 5.0, 5.0)
    assert out[4] == (7.0, 7.0, 5.0)  # prev skips its own value


def test_select_skip_to_resumes_at_binding(spark):
    """SKIP TO LAST click: the next anchor may start AT-or-after the
    kept match's click (overlap with the purchase tail allowed) —
    strictly more matches than SKIP PAST LAST ROW, fewer than
    emit-all."""
    from spark_cep_spark.operators.cep import (
        Pattern,
        select_non_overlapping,
        select_skip_to,
    )

    t0 = dt.datetime(2024, 1, 1)
    m = lambda k: t0 + dt.timedelta(minutes=k)
    rows = [
        (1, 1, "view", m(0), 1.0),
        (2, 1, "click", m(10), 1.0),
        (3, 1, "view", m(15), 1.0),   # anchors AFTER click, BEFORE purchase
        (4, 1, "purchase", m(20), 1.0),
        (5, 1, "click", m(25), 1.0),
        (6, 1, "purchase", m(30), 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "ts timestamp, value double"
    )
    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by("purchase", "event_type = 'purchase'")
        .within("24 HOURS")
    )
    matches = pat.compile_batch(df)
    skip_to = {
        r["anchor_id"]
        for r in select_skip_to(matches, "t_view", "t_click").collect()
    }
    skip_past = {
        r["anchor_id"]
        for r in select_non_overlapping(
            matches, "t_view", "t_purchase"
        ).collect()
    }
    assert skip_to == {1, 3}   # second anchor allowed from t_click on
    assert skip_past == {1}    # but not before the first purchase


def test_rows_per_match_unpivots_each_binding(spark):
    from spark_cep_spark.operators.cep import Pattern, rows_per_match

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, 1, "view", t0, 1.0),
        (2, 1, "click", t0 + dt.timedelta(minutes=5), 1.0),
        (3, 1, "purchase", t0 + dt.timedelta(minutes=10), 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "ts timestamp, value double"
    )
    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by("purchase", "event_type = 'purchase'")
        .within("24 HOURS")
    )
    out = sorted(
        (r["seq_no"], r["step"], r["event_id"])
        for r in rows_per_match(
            pat.compile_batch(df, emit_ids=True),
            ["view", "click", "purchase"],
        ).collect()
    )
    assert out == [(1, "view", 1), (2, "click", 2), (3, "purchase", 3)]
