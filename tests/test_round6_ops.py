"""Round-6 hygiene tests: win_lag_ignore_nulls' pinned NULL-event_type
policy (round-6 ADVICE), text_bigram_lm's unbroadcast-hinted unigram
join (round-5 verdict "What's wrong" #1), and the streaming variant
cap at higher variant counts (verdict item 7)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from conftest import SF_CHECK


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_lag_ignore_nulls_null_event_type_keeps_value(spark):
    """Pinned policy: a NULL event_type KEEPS its value (the oracle's
    CASE WHEN type='view' THEN NULL ELSE value END falls to ELSE on a
    NULL condition; the Spark mask must do the same via .otherwise)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 0, 0), "click", 10.0),
        (2, 1, dt.datetime(2024, 1, 1, 0, 1), None, 77.0),  # NULL type
        (3, 1, dt.datetime(2024, 1, 1, 0, 2), "view", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
        "event_type string, value double"
    )
    v = F.when(
        F.col("event_type") == "view", F.lit(None).cast("double")
    ).otherwise(F.col("value"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    out = {
        r["event_id"]: (r["v"], r["v_filled"])
        for r in df.select(
            "event_id",
            v.alias("v"),
            F.last(v, ignorenulls=True)
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("v_filled"),
        ).collect()
    }
    assert out[2] == (77.0, 77.0)  # NULL type keeps its value
    assert out[3] == (None, 77.0)  # view masks; fill carries 77


def test_bigram_lm_join_carries_no_broadcast_hint(spark):
    """The n2⋈n1 join must NOT force-broadcast the unigram table (a
    web corpus has 1e8+ distinct tokens). At fixture scale AQE may
    still CHOOSE broadcast — what we pin is the absence of a forced
    hint in the analyzed plan, plus the TakeOrdered top-200 cut."""
    from spark_cep_spark.operators.llm_text import text_bigram_lm

    df = text_bigram_lm(spark, SF_CHECK)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "UnresolvedHint" not in analyzed
    assert "ResolvedHint" not in analyzed  # no broadcast/merge hint
    plan = _executed_plan(df)
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------------------------
# verdict item 7: variant cap behavior at higher variant counts
# ------------------------------------------------------------------


def test_permute4_rejected_with_pointed_error():
    """PERMUTE of 4 = 24 orderings > the 16-variant expansion cap —
    must be a pointed ValueError at expansion time, not an NFA blowup
    (the streaming runner holds one NFA per variant per key)."""
    from spark_cep_spark.operators.cep_sql import expand_permute_sql

    with pytest.raises(ValueError, match="24.*capped at 16"):
        expand_permute_sql(
            """
            PATTERN ( PERMUTE(A, B, C, D) )
            WITHIN 1 HOUR
            DEFINE A AS event_type = 'view',
                   B AS event_type = 'click',
                   C AS event_type = 'cart',
                   D AS event_type = 'purchase'
            """
        )


FOUR_VARIANT_SQL = """
PATTERN ( S -> V{1,4} -> P )
WITHIN 2 HOURS
DEFINE S AS event_type = 'signup',
       V AS event_type = 'view',
       P AS event_type = 'purchase'
"""


def test_four_variant_range_expands_and_runs_batch(spark):
    """V{1,4} = 4 variants (under the 16 cap): expansion enumerates
    all four in greedy preference order and the batch winner is the
    longest available repeat chain."""
    from spark_cep_spark.operators.cep_sql import (
        expand_quantifier_sql,
        match_recognize,
    )

    variants = expand_quantifier_sql(FOUR_VARIANT_SQL)
    assert len(variants) == 4

    base = dt.datetime(2024, 1, 1)
    rows = (
        [(0, base, 1, "signup", 1.0, "{}")]
        + [
            (1 + i, base + dt.timedelta(minutes=1 + i), 1, "view", 1.0, "{}")
            for i in range(3)
        ]
        + [(9, base + dt.timedelta(minutes=10), 1, "purchase", 1.0, "{}")]
    )
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = match_recognize(df, FOUR_VARIANT_SQL).collect()
    assert len(out) == 1  # greedy: one winner, the 3-view variant
    assert out[0]["variant"] == "S->V{3}->P"
    assert out[0]["t_V_3"] is not None and out[0]["t_V_4"] is None


# ------------------------------------------------------------------
# round-6 operators: plan shape + distributed-ntile equivalence
# ------------------------------------------------------------------


def test_join_bucketed_reads_buckets_and_elides_shuffle(spark):
    """The registered join_bucketed key must (a) scan the bucketed
    layout, and (b) with broadcast disabled, produce a SortMergeJoin
    with NO shuffle exchange feeding the join — the whole point of
    paying the bucketed write. (At fixture scale AQE legitimately
    broadcasts the small side; the bucketed scan must be used either
    way, and the exchange-free SMJ is pinned under the no-broadcast
    conf, which is what a fact-to-fact join at 100 TB sees.)"""
    from spark_cep_spark.operators.joins import join_bucketed

    plan = _executed_plan(join_bucketed(spark, SF_CHECK))
    assert "Bucketed: true" in plan

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _executed_plan(join_bucketed(spark, SF_CHECK))
        assert "SortMergeJoin" in plan
        join_input = plan.split("SortMergeJoin")[-1]
        assert "Exchange hashpartitioning" not in join_input
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_quality_deciles_no_single_partition_window(spark):
    """The decile rank must stay distributed: no unpartitioned window
    funneling the corpus through one partition (the text_vocab
    lesson) — physically, no SinglePartition exchange in the plan."""
    from spark_cep_spark.operators.llm_pipeline import corpus_quality_deciles

    plan = _executed_plan(corpus_quality_deciles(spark, SF_CHECK))
    assert "SinglePartition" not in plan


@pytest.mark.parametrize("n_rows, n_tiles", [(0, 10), (7, 10), (10, 10), (101, 10), (1000, 7)])
def test_distributed_ntile_matches_builtin(spark, n_rows, n_tiles):
    """_distributed_ntile must assign EXACTLY the buckets
    ntile() OVER (ORDER BY ...) assigns, for n<k, n=k, remainder and
    clean-division sizes, including duplicate score values."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W
    from spark_cep_spark.operators.llm_pipeline import _distributed_ntile

    rows = [(i, (i * 37) % 11) for i in range(n_rows)]  # duplicate scores
    df = spark.createDataFrame(rows, "id long, score long")
    got = {
        r["id"]: r["t"]
        for r in _distributed_ntile(
            df, ["score", "id"], n_tiles, "t", n_range_parts=5
        ).collect()
    }
    want = {
        r["id"]: r["t"]
        for r in df.select(
            "id",
            F.ntile(n_tiles).over(W.orderBy("score", "id")).cast("long").alias("t"),
        ).collect()
    }
    assert got == want


def test_funnel_steps_monotone_and_bounded(spark):
    """Funnel sanity on the fixture: counts are non-increasing down the
    funnel and conversion pcts are in (0, 1]."""
    from spark_cep_spark.operators.cep import cep_funnel_steps

    rows = sorted(
        (r["step"], r["n_users"], r["pct_of_first"], r["pct_of_prev"])
        for r in cep_funnel_steps(spark, SF_CHECK).collect()
    )
    ns = [n for _, n, _, _ in rows]
    assert ns == sorted(ns, reverse=True)
    assert rows[0][2] == 1.0 and rows[0][3] is None
    for _, _, pf, pp in rows[1:]:
        assert 0 < pf <= 1 and 0 < pp <= 1


# ------------------------------------------------------------------
# streaming z-score anomaly face (round-6 streaming addition)
# ------------------------------------------------------------------


def test_zscore_kernel_matches_brute_force_and_chunking():
    """advance_zscore == a brute-force rolling recompute on every
    prefix, and splitting the matured rows at ANY boundary changes
    nothing (the state ring is a sufficient statistic)."""
    from spark_cep_spark.streaming.nfa import advance_zscore

    import random

    rng = random.Random(7)
    rows = []
    for i in range(120):
        v = rng.gauss(10, 1)
        if i % 37 == 0:
            v += 25  # planted outliers
        if i % 41 == 0:
            v = None  # null values occupy frame slots, unscored
        rows.append([i * 1_000_000, i, v])

    _, whole = advance_zscore([], [r[:] for r in rows])

    # brute force: mirror the batch frame definition directly
    brute = []
    hist = []
    for ts, eid, v in rows:
        ring = hist[-20:]
        vals = [x for x in ring if x is not None]
        if len(ring) >= 10 and len(vals) >= 2 and v is not None:
            mu = sum(vals) / len(vals)
            sd = (
                sum((x - mu) ** 2 for x in vals) / (len(vals) - 1)
            ) ** 0.5
            if sd > 1e-9 and abs(v - mu) > 3 * sd:
                brute.append([eid, ts, v, round((v - mu) / sd, 4)])
        hist.append(v)
    assert whole == brute and len(whole) >= 2

    for cut in (0, 1, 17, 60, 119, 120):
        ring, a1 = advance_zscore([], [r[:] for r in rows[:cut]])
        _, a2 = advance_zscore(ring, [r[:] for r in rows[cut:]])
        assert a1 + a2 == whole


def test_streaming_anomaly_equals_batch(spark, sf_dir):
    """anomaly_stream over multiple micro-batches emits exactly the
    batch twin's alert rows (zero-delay watermark over sorted staging
    + a far-future sentinel to mature the tail)."""
    import datetime as dt
    import glob
    import os

    from spark_cep_spark.operators.windows import anomaly_zscore
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import anomaly_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    sentinel = spark.createDataFrame(
        [(10**9, dt.datetime(2025, 1, 1), -1, "view", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sentinel.coalesce(1).write.mode("append").parquet(staged)
    newest = max(
        glob.glob(os.path.join(staged, "part-*")), key=os.path.getmtime
    )
    os.utime(newest, (1_700_000_000 + 10_000 * 3600,) * 2)

    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        anomaly_stream(stream, watermark="0 seconds"), "append"
    )
    g = {
        (r["key"], r["event_id"], r["ts"], r["value"], r["z"])
        for r in got.collect()
        if r["key"] != -1
    }
    batch = anomaly_zscore(
        spark.read.parquet(staged).filter("user_id <> -1")
    )
    w = {
        (r["user_id"], r["event_id"], r["ts"], r["value"], r["z"])
        for r in batch.collect()
    }
    assert g == w and len(w) > 0


# ------------------------------------------------------------------
# BM25 + RRF hybrid retrieval sanity (oracle equality is the driver
# gate; these pin SEMANTICS the hash can't express)
# ------------------------------------------------------------------


def test_bm25_top1_contains_query_terms(spark):
    """Relevance sanity: every query's #1 document actually contains
    at least two of its three query terms."""
    import pyspark.sql.functions as F
    from spark_cep_spark.operators.llm_text import (
        _BM25_QUERIES,
        text_bm25_topk,
    )
    from spark_cep_spark.io import table

    top = {
        r["query_id"]: r["doc_id"]
        for r in text_bm25_topk(spark, SF_CHECK).collect()
        if r["rk"] == 1
    }
    wanted = list(top.values())
    texts = {
        r["doc_id"]: r["text"]
        for r in table(spark, SF_CHECK, "documents")
        .filter(F.col("doc_id").isin(wanted))
        .collect()
    }
    for qid, qtext in _BM25_QUERIES:
        toks = set(texts[top[qid]].split())
        hits = sum(1 for t in qtext.split() if t in toks)
        assert hits >= 2, (qid, qtext, top[qid])


def test_bm25_repartition_invariant(spark):
    """The ranking must not depend on input partitioning (partial
    aggregation order)."""
    from spark_cep_spark.operators.llm_text import bm25_ranked

    a = sorted(tuple(r) for r in bm25_ranked(spark, SF_CHECK, 5).collect())
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try:
        b = sorted(
            tuple(r) for r in bm25_ranked(spark, SF_CHECK, 5).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert a == b


def test_rrf_fuses_both_rankers(spark):
    """Every output row carries at least one source rank; rrf equals
    the closed-form sum of its present ranks; a doc ranked by BOTH
    sources outranks one ranked by only the weaker position."""
    from spark_cep_spark.operators.llm_similarity import sim_rrf_hybrid

    rows = sim_rrf_hybrid(spark, SF_CHECK).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["r_lex"] is not None or r["r_sem"] is not None
        want = (1.0 / (60 + r["r_lex"]) if r["r_lex"] else 0.0) + (
            1.0 / (60 + r["r_sem"]) if r["r_sem"] else 0.0
        )
        assert abs(r["rrf"] - round(want, 6)) < 1e-9
    both = [r for r in rows if r["r_lex"] and r["r_sem"]]
    assert both, "PRF seeds come from the lexical top — overlap expected"


# ------------------------------------------------------------------
# streaming rolling-corr face
# ------------------------------------------------------------------


def test_trendcorr_kernel_chunking_invariance():
    """advance_trendcorr: any micro-batch chunking of the same ordered
    stream yields identical scores (the 30-pair ring is a sufficient
    statistic)."""
    from spark_cep_spark.streaming.nfa import advance_trendcorr

    import random

    rng = random.Random(11)
    rows = [
        [i * 60_000_000, i, None if i % 23 == 0 else rng.gauss(10, 3) + 0.1 * i]
        for i in range(90)
    ]
    _, whole = advance_trendcorr([], [r[:] for r in rows])
    assert len(whole) == 90 - 29  # one score per full frame
    for cut in (0, 1, 29, 30, 31, 60, 89, 90):
        ring, a1 = advance_trendcorr([], [r[:] for r in rows[:cut]])
        _, a2 = advance_trendcorr(ring, [r[:] for r in rows[cut:]])
        assert a1 + a2 == whole


def test_streaming_trendcorr_equals_batch(spark, sf_dir):
    """trendcorr_stream over multiple micro-batches emits exactly the
    batch twin's rows."""
    import datetime as ddt
    import glob
    import os

    from spark_cep_spark.operators.windows import rolling_corr
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import trendcorr_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    sentinel = spark.createDataFrame(
        [(10**9, ddt.datetime(2025, 1, 1), -1, "view", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sentinel.coalesce(1).write.mode("append").parquet(staged)
    newest = max(
        glob.glob(os.path.join(staged, "part-*")), key=os.path.getmtime
    )
    os.utime(newest, (1_700_000_000 + 10_000 * 3600,) * 2)

    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        trendcorr_stream(stream, watermark="0 seconds"), "append"
    )
    g = {
        (r["key"], r["event_id"], r["ts"], r["trend_corr"])
        for r in got.collect()
        if r["key"] != -1
    }
    batch = rolling_corr(
        spark.read.parquet(staged).filter("user_id <> -1")
    )
    w = {
        (r["user_id"], r["event_id"], r["ts"], r["trend_corr"])
        for r in batch.collect()
    }
    assert g == w and len(w) > 0


# ------------------------------------------------------------------
# streaming CUSUM face
# ------------------------------------------------------------------


def test_cusum_kernel_chunking_and_restart():
    """advance_cusum: chunk-split invariance, null skipping, and the
    signal-and-restart recurrence vs an inline transcription."""
    from spark_cep_spark.streaming.nfa import advance_cusum

    vals = [50, 58, 70, 90, None, 90, 90, 50, 10, 5, 5, 50, 49]
    rows = [[i * 1000, i, None if v is None else float(v)]
            for i, v in enumerate(vals)]

    s_hi = s_lo = 0.0
    want = []
    for ts, eid, v in rows:
        if v is None:
            continue
        s_hi = max(0.0, s_hi + (v - 50.0 - 5.0))
        s_lo = max(0.0, s_lo + (50.0 - v - 5.0))
        a = 1 if (s_hi > 25.0 or s_lo > 25.0) else 0
        want.append([eid, ts, v, s_hi, s_lo, a])
        if a:
            s_hi = s_lo = 0.0
    assert sum(r[5] for r in want) >= 2  # both drift directions alarm

    _, whole = advance_cusum(None, [r[:] for r in rows], 50.0)
    assert whole == want
    for cut in range(len(rows) + 1):
        st, a1 = advance_cusum(None, [r[:] for r in rows[:cut]], 50.0)
        _, a2 = advance_cusum(st, [r[:] for r in rows[cut:]], 50.0)
        assert a1 + a2 == whole


def test_streaming_cusum_equals_reference(spark, sf_dir):
    """cusum_stream over multiple micro-batches equals the kernel-
    independent per-user reference recurrence on the same data."""
    import datetime as ddt
    import glob
    import os

    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import cusum_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    sentinel = spark.createDataFrame(
        [(10**9, ddt.datetime(2025, 1, 1), -1, "view", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sentinel.coalesce(1).write.mode("append").parquet(staged)
    newest = max(
        glob.glob(os.path.join(staged, "part-*")), key=os.path.getmtime
    )
    os.utime(newest, (1_700_000_000 + 10_000 * 3600,) * 2)

    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        cusum_stream(stream, mu=50.0, watermark="0 seconds"), "append"
    )
    g = {
        (r["key"], r["event_id"], r["s_hi"], r["s_lo"], r["alarm"])
        for r in got.collect()
        if r["key"] != -1
    }

    # independent reference: per-user python recurrence over the data
    by_user = {}
    for r in sorted(
        spark.read.parquet(staged).filter("user_id <> -1").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    ):
        by_user.setdefault(r["user_id"], []).append(r)
    w = set()
    for u, rs in by_user.items():
        s_hi = s_lo = 0.0
        for r in rs:
            v = r["value"]
            if v is None:
                continue
            s_hi = max(0.0, s_hi + (v - 50.0 - 5.0))
            s_lo = max(0.0, s_lo + (50.0 - v - 5.0))
            a = 1 if (s_hi > 25.0 or s_lo > 25.0) else 0
            w.add((u, r["event_id"], s_hi, s_lo, a))
            if a:
                s_hi = s_lo = 0.0
    assert g == w and len(w) > 0


# ------------------------------------------------------------------
# trend runs + V-shape (batch) and the streaming runs face
# ------------------------------------------------------------------


def test_trend_runs_kernel_vs_batch_and_chunking(spark):
    """advance_trendruns equals the batch _trend_runs plan on the same
    per-user sequences (runs all CLOSED by a final equal-value event),
    and chunk splits change nothing."""
    import pyspark.sql.functions as F
    from spark_cep_spark.operators.cep import _trend_runs
    from spark_cep_spark.streaming.nfa import advance_trendruns

    base = dt.datetime(2024, 1, 1)
    vals = {
        1: [10, 12, 15, 20, 18, 14, 9, 30, 31, 32, 32],  # up4, down4, up3 + closer
        2: [5, 4, 3, 2, 2],                               # down4 + closer
        3: [7, 7, 7],                                     # no runs
    }
    rows = []
    eid = 0
    for u, vs in vals.items():
        for i, v in enumerate(vs):
            rows.append(
                (eid, base + dt.timedelta(minutes=i), u, "view",
                 float(v), "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    batch = {
        (r["user_id"], r["direction"], r["start_ts"], r["end_ts"],
         r["n_steps"], r["delta"])
        for r in _trend_runs(df).collect()
    }
    assert len(batch) == 4  # user1: up,down,up; user2: down

    got = set()
    for u, vs in vals.items():
        ev = [
            [int((base + dt.timedelta(minutes=i)).timestamp() * 1e6),
             i, float(v)]
            for i, v in enumerate(vs)
        ]
        _, whole = advance_trendruns(None, [e[:] for e in ev])
        for cut in range(len(ev) + 1):
            st, a1 = advance_trendruns(None, [e[:] for e in ev[:cut]])
            _, a2 = advance_trendruns(st, [e[:] for e in ev[cut:]])
            assert a1 + a2 == whole
        for d, s_us, e_us, n, delta in whole:
            got.add(
                (u, "up" if d == 1 else "down",
                 dt.datetime.utcfromtimestamp(s_us / 1e6),
                 dt.datetime.utcfromtimestamp(e_us / 1e6), n, delta)
            )
    assert got == batch


def test_vshape_finds_the_planted_v(spark):
    import pyspark.sql.functions as F
    from spark_cep_spark.operators.cep import cep_vshape, _trend_runs

    base = dt.datetime(2024, 1, 1)
    vs = [20, 15, 10, 5, 8, 12, 19]  # down3 then up3, trough at idx 3
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, "view", float(v), "{}")
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    runs = _trend_runs(df)
    dn = runs.filter(F.col("direction") == "down").first()
    up = runs.filter(F.col("direction") == "up").first()
    assert dn["end_ts"] == up["start_ts"] == base + dt.timedelta(minutes=3)
    assert (dn["delta"], up["delta"]) == (-15.0, 14.0)


def test_streaming_trendruns_equals_batch(spark, sf_dir):
    """trendruns_stream == the batch runs over staged events with the
    per-key tail run closed by the watermark sentinel being absent —
    compare only runs both sides CLOSED (batch minus each user's last
    run if it is still open streaming-side would be flaky; instead the
    fixture's own data is used and streaming output must be a subset
    equal to batch minus open tails)."""
    from spark_cep_spark.operators.cep import _trend_runs
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import trendruns_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        trendruns_stream(stream, watermark="0 seconds"), "append"
    )
    g = {
        (r["key"], r["direction"], r["start_ts"], r["end_ts"],
         r["n_steps"], r["delta"])
        for r in got.collect()
    }
    batch_df = _trend_runs(spark.read.parquet(staged))
    w = {
        (r["user_id"], r["direction"], r["start_ts"], r["end_ts"],
         r["n_steps"], r["delta"])
        for r in batch_df.collect()
    }
    # streaming can only be missing runs still OPEN at stream end
    # (no breaking event arrived); everything it emitted must be a
    # batch run, and per key at most one batch run may be missing.
    assert g <= w
    missing = w - g
    by_key = {}
    for m in missing:
        by_key.setdefault(m[0], []).append(m)
    assert all(len(v) == 1 for v in by_key.values())
    # and the missing one is the key's LAST batch run (the open tail)
    for k, (m,) in by_key.items():
        last = max(
            (r for r in w if r[0] == k), key=lambda r: r[3]
        )
        assert m == last
    assert len(g) > 0


def test_streaming_vshape_equals_batch(spark, sf_dir):
    """vshape_stream == the batch cep_vshape rows whose UP leg closed
    before stream end (a V needs its up run broken to be maximal —
    per key at most the final V can still be pending)."""
    from spark_cep_spark.operators.cep import cep_vshape
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import vshape_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        vshape_stream(stream, watermark="0 seconds"), "append"
    )
    g = {
        tuple(r)
        for r in got.select(
            "key", "start_ts", "trough_ts", "end_ts",
            "down_steps", "up_steps", "drop_delta", "rebound_delta",
        ).collect()
    }

    import pyspark.sql.functions as F
    from spark_cep_spark.operators.cep import _trend_runs

    runs = _trend_runs(spark.read.parquet(staged))
    dn = runs.filter(F.col("direction") == "down").select(
        "user_id",
        F.col("start_ts"),
        F.col("end_ts").alias("trough_ts"),
        F.col("n_steps").alias("down_steps"),
        F.col("delta").alias("drop_delta"),
    )
    up = runs.filter(F.col("direction") == "up").select(
        F.col("user_id").alias("u2"),
        F.col("start_ts").alias("u_start"),
        F.col("end_ts"),
        F.col("n_steps").alias("up_steps"),
        F.col("delta").alias("rebound_delta"),
    )
    w = {
        tuple(r)
        for r in dn.join(
            up, (dn.user_id == up.u2) & (dn.trough_ts == up.u_start)
        )
        .select(
            "user_id", "start_ts", "trough_ts", "end_ts",
            "down_steps", "up_steps", "drop_delta", "rebound_delta",
        )
        .collect()
    }
    assert g <= w
    missing = w - g
    by_key = {}
    for m in missing:
        by_key.setdefault(m[0], []).append(m)
    assert all(len(v) == 1 for v in by_key.values())
    assert len(g) > 0


def test_streaming_rollmedian_equals_batch(spark, sf_dir):
    """rollmedian_stream over multiple micro-batches emits exactly
    the batch win_rolling_median rows (zero-delay watermark over
    sorted staging + a far-future sentinel to mature the tail)."""
    import datetime as dt
    import glob
    import os

    from spark_cep_spark.operators.windows import rolling_median
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import rollmedian_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    sentinel = spark.createDataFrame(
        [(10**9, dt.datetime(2025, 1, 1), -1, "view", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sentinel.coalesce(1).write.mode("append").parquet(staged)
    newest = max(
        glob.glob(os.path.join(staged, "part-*")), key=os.path.getmtime
    )
    os.utime(newest, (1_700_000_000 + 10_000 * 3600,) * 2)

    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        rollmedian_stream(stream, watermark="0 seconds"), "append"
    )
    g = {
        (
            r["key"], r["event_id"], r["ts"], r["value"],
            r["roll_med"], r["roll_mad"], r["is_outlier"],
        )
        for r in got.collect()
        if r["key"] != -1
    }
    batch = rolling_median(
        spark.read.parquet(staged).filter("user_id <> -1")
    )
    w = {
        (
            r["user_id"], r["event_id"], r["ts"], r["value"],
            r["roll_med"], r["roll_mad"], r["is_outlier"],
        )
        for r in batch.collect()
    }
    assert g == w and len(w) > 0


def test_streaming_holt_equals_batch(spark, sf_dir):
    """holt_stream emits exactly the batch win_holt rows (zero-delay
    watermark, sorted staging, far-future sentinel)."""
    import datetime as dt
    import glob
    import os

    from spark_cep_spark.operators.windows import holt_smooth
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import holt_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    sentinel = spark.createDataFrame(
        [(10**9, dt.datetime(2025, 1, 1), -1, "view", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sentinel.coalesce(1).write.mode("append").parquet(staged)
    newest = max(
        glob.glob(os.path.join(staged, "part-*")), key=os.path.getmtime
    )
    os.utime(newest, (1_700_000_000 + 10_000 * 3600,) * 2)

    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        holt_stream(stream, watermark="0 seconds"), "append"
    )
    g = {
        (
            r["key"], r["event_id"], r["ts"], r["value"],
            r["level"], r["trend"], r["forecast"],
        )
        for r in got.collect()
        if r["key"] != -1
    }
    batch = holt_smooth(
        spark.read.parquet(staged).filter("user_id <> -1")
    )
    w = {
        (
            r["user_id"], r["event_id"], r["ts"], r["value"],
            r["level"], r["trend"], r["forecast"],
        )
        for r in batch.collect()
    }
    assert g == w and len(w) > 0


def test_mmr_rerank_diversifies(spark):
    """Semantics the driver hash can't express: (a) every query's
    rank-1 MMR pick IS the pure-relevance argmax (greedy step 1
    theorem); (b) the MMR set's max pairwise similarity never exceeds
    the pure top-5's, and strictly improves for a majority of queries
    — i.e. the operator actually diversifies."""
    import collections

    import numpy as np

    from spark_cep_spark.io import table
    from spark_cep_spark.operators.llm_similarity import (
        sim_mmr_rerank,
        sim_topk,
    )

    mmr = sim_mmr_rerank(spark, SF_CHECK).collect()
    top = sim_topk(spark, SF_CHECK).collect()
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in table(spark, SF_CHECK, "embeddings").collect()
        if r["embedding"] is not None
    }

    def maxpair(ids):
        m = 0.0
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                m = max(m, float(vecs[ids[i]] @ vecs[ids[j]]))
        return m

    mmr_by = collections.defaultdict(list)
    top_by = collections.defaultdict(list)
    for r in mmr:
        mmr_by[r["qid"]].append((r["rank"], r["vec_id"]))
    for r in top:
        if r["rk"] <= 5 and r["qid"] < 8:
            top_by[r["qid"]].append((r["rk"], r["neighbor_id"]))

    assert len(mmr_by) == 8
    wins = 0
    for q in mmr_by:
        mids = [v for _, v in sorted(mmr_by[q])]
        tids = [v for _, v in sorted(top_by[q])]
        assert len(mids) == 5 and len(set(mids)) == 5
        assert mids[0] == tids[0]  # step 1 = pure relevance argmax
        a, b = maxpair(mids), maxpair(tids)
        assert a <= b + 1e-12
        wins += a < b - 1e-12
    assert wins >= len(mmr_by) // 2


def test_holt_state_survives_checkpoint_restart(spark, sf_dir, tmp_path):
    """Kill-and-resume for holt_stream: the level/trend floats and
    the arrival buffer must resume exactly from the checkpoint — the
    two-run output equals an uninterrupted run (Holt is the sharpest
    restart probe of the round-6 faces: every emitted row depends on
    the ENTIRE per-key history, so one lost state float diverges all
    post-restart rows)."""
    import os
    import shutil

    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import holt_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=8)
    src = str(tmp_path / "src")
    os.makedirs(src)
    parts = sorted(f for f in os.listdir(staged) if f.startswith("part"))
    assert len(parts) >= 8

    def run(src_dir, out, ckpt):
        stream = harness.events_stream(spark, src_dir, max_files_per_trigger=2)
        q = (
            holt_stream(stream, watermark="0 seconds")
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
        for f in names:
            dst = os.path.join(src, f)
            shutil.copy(os.path.join(staged, f), dst)
            os.utime(dst, (1_700_000_000 + parts.index(f) * 3600,) * 2)

    copy_ordered(parts[:4])
    run(src, out, ckpt)
    n_first = spark.read.parquet(out).count()
    copy_ordered(parts[4:])
    run(src, out, ckpt)

    got = {
        (r["key"], r["event_id"], r["ts"], r["value"],
         r["level"], r["trend"], r["forecast"])
        for r in spark.read.parquet(out).collect()
    }
    uninterrupted = {
        (r["key"], r["event_id"], r["ts"], r["value"],
         r["level"], r["trend"], r["forecast"])
        for r in harness.run_available_now(
            holt_stream(
                harness.events_stream(spark, staged, max_files_per_trigger=2),
                watermark="0 seconds",
            ),
            "append",
        ).collect()
    }
    assert got == uninterrupted
    assert 0 < n_first < len(got)


def test_ivf_index_build_query_equals_oneshot(spark, tmp_path):
    """Persistent IVF index: build+load+query must equal the one-shot
    topk_ivf bit-for-bit (same seeded KMeans, same probe rule), and
    the probed read must be PARTITION-PRUNED to the probed cells."""
    import io
    from contextlib import redirect_stdout

    from spark_cep_spark.io import table
    from spark_cep_spark.operators.llm_similarity import IvfIndex, topk_ivf

    e = table(spark, SF_CHECK, "embeddings")
    q = e.filter("vec_id < 10")

    idx = IvfIndex.build(spark, e, str(tmp_path / "ivf"))
    got = IvfIndex.load(spark, str(tmp_path / "ivf")).query(q, k=10, nprobe=4)
    want = topk_ivf(spark, q, e, k=10, nprobe=4)
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w and len(g) > 0

    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [" in plan and "cell" in plan.split(
        "PartitionFilters"
    )[1][:200]


def test_substring_dedup_planted_span(spark, tmp_path):
    """A 12-token passage shared by doc 1 and doc 2: the later doc's
    overlapping duplicated 8-gram windows union to exactly 12 covered
    tokens; the first doc keeps its copy (0 dup tokens); an unrelated
    doc reports 0."""
    import os

    from spark_cep_spark.operators.llm_dedup import (
        pipeline_substring_dedup,
    )

    shared = " ".join(f"w{i}" for i in range(12))  # 12 tokens
    rows = [
        (1, f"alpha beta {shared} gamma", "en", "s1"),
        (2, f"{shared} delta epsilon zeta", "en", "s2"),
        (3, "totally different content here with many words", "en", "s3"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df.coalesce(1).write.parquet(os.path.join(d, "_doc"))
    part = next(
        p
        for p in os.listdir(os.path.join(d, "_doc"))
        if p.endswith(".parquet")
    )
    os.rename(
        os.path.join(d, "_doc", part), os.path.join(d, "documents.parquet")
    )
    out = {
        r["doc_id"]: r for r in pipeline_substring_dedup(spark, d).collect()
    }
    assert out[1]["dup_tokens"] == 0  # first occurrence keeps its copy
    # doc 2: 5 duplicated 8-gram windows at pos 1..5 union to 12 tokens
    assert out[2]["dup_spans"] == 5
    assert out[2]["dup_tokens"] == 12
    assert out[3]["dup_tokens"] == 0 and out[3]["dup_spans"] == 0
    assert abs(out[2]["dup_frac"] - round(12 / 15, 6)) < 1e-9


@settings(max_examples=200, deadline=None)
@given(
    vs=st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False),
        min_size=0,
        max_size=60,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=60), max_size=3),
)
def test_ewma_kernel_brute_force_and_chunking(vs, cuts):
    """advance_ewma == the batch pandas recurrence (same literal
    coefficients) and is chunking-invariant."""
    from spark_cep_spark.streaming.nfa import advance_ewma

    rows = [[i * 1000, i, v] for i, v in enumerate(vs)]
    prev, want = None, []
    for ts, eid, v in rows:
        prev = v if prev is None else 0.3 * v + 0.7 * prev
        want.append([eid, ts, v, prev])
    _, whole = advance_ewma(None, [r[:] for r in rows])
    assert whole == want

    bounds = sorted({c for c in cuts if c <= len(rows)})
    stt, got, prev_i = None, [], 0
    for b in bounds + [len(rows)]:
        stt, part = advance_ewma(stt, [r[:] for r in rows[prev_i:b]])
        got.extend(part)
        prev_i = b
    assert got == whole


def test_streaming_ewma_equals_batch_twin(spark, sf_dir):
    """ewma_stream over multiple micro-batches equals win_ewma's
    batch output bit-for-bit on the same data (null-free users;
    the null-poisoning policy matches pandas NaN arithmetic and is
    covered by the kernel's definition, not comparable via == )."""
    import datetime as ddt
    import glob
    import os

    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import ewma_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    sentinel = spark.createDataFrame(
        [(10**9, ddt.datetime(2025, 1, 1), -1, "view", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sentinel.coalesce(1).write.mode("append").parquet(staged)
    newest = max(
        glob.glob(os.path.join(staged, "part-*")), key=os.path.getmtime
    )
    os.utime(newest, (1_700_000_000 + 10_000 * 3600,) * 2)

    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        ewma_stream(stream, watermark="0 seconds"), "append"
    )
    # users whose values contain a null are NaN-poisoned from that row
    # on (the batch twin's pandas semantics) — compare null-free users
    null_users = {
        r["user_id"]
        for r in spark.read.parquet(staged)
        .filter("value IS NULL AND user_id <> -1")
        .select("user_id")
        .distinct()
        .collect()
    }
    g = {
        (r["key"], r["event_id"], r["ewma"])
        for r in got.collect()
        if r["key"] != -1 and r["key"] not in null_users
    }
    by_user = {}
    for r in sorted(
        spark.read.parquet(staged).filter("user_id <> -1").collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    ):
        by_user.setdefault(r["user_id"], []).append(r)
    w = set()
    for u, rs in by_user.items():
        if u in null_users:
            continue
        prev = None
        for r in rs:
            v = r["value"]
            prev = v if prev is None else 0.3 * v + 0.7 * prev
            w.add((u, r["event_id"], prev))
    assert g == w and len(w) > 0


def test_ewma_state_survives_checkpoint_restart(spark, sf_dir, tmp_path):
    """Kill-and-resume for ewma_stream: the single smoothed float and
    the arrival buffer must resume exactly from the checkpoint — like
    Holt, every post-restart row depends on the entire per-key
    history, so one lost state float diverges the whole tail."""
    import os
    import shutil

    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import ewma_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=8)
    src = str(tmp_path / "src")
    os.makedirs(src)
    parts = sorted(f for f in os.listdir(staged) if f.startswith("part"))
    assert len(parts) >= 8

    def run(src_dir, out, ckpt):
        stream = harness.events_stream(spark, src_dir, max_files_per_trigger=2)
        q = (
            ewma_stream(stream, watermark="0 seconds")
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
        for f in names:
            dst = os.path.join(src, f)
            shutil.copy(os.path.join(staged, f), dst)
            os.utime(dst, (1_700_000_000 + parts.index(f) * 3600,) * 2)

    copy_ordered(parts[:4])
    run(src, out, ckpt)
    n_first = spark.read.parquet(out).count()
    copy_ordered(parts[4:])
    run(src, out, ckpt)

    def keyfn(r):
        e = r["ewma"]
        return (r["key"], r["event_id"], None if e is None or e != e else e)

    got = {keyfn(r) for r in spark.read.parquet(out).collect()}
    uninterrupted = {
        keyfn(r)
        for r in harness.run_available_now(
            ewma_stream(
                harness.events_stream(spark, staged, max_files_per_trigger=2),
                watermark="0 seconds",
            ),
            "append",
        ).collect()
    }
    assert got == uninterrupted
    assert 0 < n_first < len(got)


def test_ewma_stream_under_rocksdb_state_store(spark, sf_dir):
    """ewma_stream's JSON state payload must round-trip through the
    RocksDB state store provider (the 100 TB deployment choice)
    exactly as through the default HDFS-backed one."""
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import ewma_stream

    conf = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf, None)
    spark.conf.set(
        conf,
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider",
    )
    try:
        staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=4)
        got = harness.run_available_now(
            ewma_stream(
                harness.events_stream(spark, staged, max_files_per_trigger=2),
                watermark="0 seconds",
            ),
            "append",
        )
        assert got.count() > 0
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)


@settings(max_examples=200, deadline=None)
@given(
    vs=st.lists(
        st.one_of(st.none(), st.integers(min_value=-500, max_value=500)),
        min_size=0,
        max_size=60,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=60), max_size=3),
)
def test_drawdown_kernel_brute_force_and_chunking(vs, cuts):
    from spark_cep_spark.streaming.nfa import advance_drawdown

    rows = [[i * 1000, i, v] for i, v in enumerate(vs)]
    rm, mdd, want = None, 0, []
    for ts, eid, c in rows:
        if c is None:
            continue
        rm = c if rm is None else max(rm, c)
        dd = c - rm
        mdd = min(mdd, dd)
        want.append([eid, ts, c, rm, dd, mdd])
    _, whole = advance_drawdown(None, [r[:] for r in rows])
    assert whole == want

    bounds = sorted({c for c in cuts if c <= len(rows)})
    stt, got, prev_i = None, [], 0
    for b in bounds + [len(rows)]:
        stt, part = advance_drawdown(stt, [r[:] for r in rows[prev_i:b]])
        got.extend(part)
        prev_i = b
    assert got == whole


def test_streaming_drawdown_final_equals_batch_aggregate(spark, sf_dir):
    """The last emitted (run_max, max_drawdown) per key equals
    win_drawdown's whole-history (peak, max_drawdown) aggregate."""
    import datetime as ddt
    import glob
    import os

    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import drawdown_stream
    from spark_cep_spark.operators.windows import win_drawdown

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    sentinel = spark.createDataFrame(
        [(10**9, ddt.datetime(2025, 1, 1), -1, "view", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sentinel.coalesce(1).write.mode("append").parquet(staged)
    newest = max(
        glob.glob(os.path.join(staged, "part-*")), key=os.path.getmtime
    )
    os.utime(newest, (1_700_000_000 + 10_000 * 3600,) * 2)

    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        drawdown_stream(stream, watermark="0 seconds"), "append"
    )
    last = {}
    for r in sorted(
        got.filter("key <> -1").collect(),
        key=lambda r: (r["key"], r["ts"], r["event_id"]),
    ):
        last[r["key"]] = (r["run_max"], r["max_drawdown"])
    # batch twin over the staged data (not the fixture dir: the staged
    # copy includes exactly the same rows minus the sentinel)
    batch_df = spark.read.parquet(staged).filter("user_id <> -1")
    import tempfile

    d = tempfile.mkdtemp()
    batch_df.write.parquet(os.path.join(d, "events.parquet"), mode="overwrite")
    for f in os.listdir("/root/testdata/sf0.001"):
        if f != "events.parquet":
            os.symlink(os.path.join("/root/testdata/sf0.001", f),
                       os.path.join(d, f))
    want = {
        r["user_id"]: (r["peak_cents"], r["max_drawdown_cents"])
        for r in win_drawdown(spark, d).collect()
    }
    assert last == want and len(want) > 0


# ---------------------------------------------------------------------------
# Round-6f batch: bloom-pruned join, bitmap exact distinct, z-order
# layout, QUALIFY dialect.
# ---------------------------------------------------------------------------


def test_bloom_probe_is_superset_of_true_matches(spark):
    """The Bloom pre-filter may keep false positives but must NEVER
    drop a true match (the build/probe xxhash64 seeds are
    type-width-sensitive — this is the regression test for the INT-
    vs-BIGINT seed trap), and at the fixture's 1-URGENT selectivity
    it must actually prune the fact scan."""
    import pyspark.sql.functions as F
    from spark_cep_spark.io import table
    from spark_cep_spark.operators.joins import join_bloom_pruned  # noqa: F401
    from spark_cep_spark import registry

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    out = registry.QUERIES["join_bloom_pruned"](spark, sf)
    # Oracle-equivalent plain join computed with DataFrame ops:
    o = table(spark, sf, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    li = table(spark, sf, "lineitem")
    rev = F.round(F.col("l_extendedprice") * 100).cast("long") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("long")
    truth = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(F.count(F.lit(1)).alias("n_items"), F.sum(rev).alias("revenue_e4"))
    )
    got = {r["returnflag"]: (r["n_items"], r["revenue_e4"]) for r in out.collect()}
    want = {r["returnflag"]: (r["n_items"], r["revenue_e4"]) for r in truth.collect()}
    assert got == want


def test_bloom_bitset_prunes_fact_rows(spark):
    """Rebuild the bitset the operator builds and verify the membership
    predicate keeps every matching key while cutting fact rows by >2x
    at the fixture's selectivity (the semi-join-reduction point)."""
    import pyspark.sql.functions as F
    from spark_cep_spark.io import table

    sf = "/root/testdata/sf0.001"
    seeds = (11, 37, 71)
    o = table(spark, sf, "orders").filter(
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
                        F.xxhash64(F.lit(s).cast("bigint"), F.col("o_orderkey")),
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
        .collect()
    )
    bitset = [0] * (m // 64)
    for r in words:
        bitset[r["w"]] |= r["bits"]
    li = table(spark, sf, "lineitem")
    cond = None
    for s in seeds:
        t = F.expr(
            f"(element_at(__bloom__, CAST(pmod(xxhash64({s}L, l_orderkey),"
            f" {m}) / 64 AS INT) + 1) & shiftleft(1L,"
            f" CAST(pmod(xxhash64({s}L, l_orderkey), {m}) % 64 AS INT))) != 0"
        )
        cond = t if cond is None else (cond & t)
    kept = li.withColumn("__bloom__", F.lit(bitset)).where(cond).drop("__bloom__")
    n_total = li.count()
    n_kept = kept.count()
    n_true = li.join(dim_keys, li.l_orderkey == dim_keys.o_orderkey, "left_semi").count()
    n_kept_true = kept.join(
        dim_keys, kept.l_orderkey == dim_keys.o_orderkey, "left_semi"
    ).count()
    assert n_kept_true == n_true  # zero false negatives
    assert n_kept >= n_true
    assert n_kept * 2 < n_total  # actually prunes


def test_bitmap_distinct_equals_count_distinct(spark):
    """sum(bitmap_count(partial bitmaps)) is EXACT — equal to
    count(DISTINCT) per group, including over the degenerate empty
    group-set."""
    import pyspark.sql.functions as F
    from spark_cep_spark import registry

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    out = registry.QUERIES["agg_bitmap_distinct"](spark, sf)
    from spark_cep_spark.io import table

    e = table(spark, sf, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    truth = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    got = {
        (r["event_type"], r["day"]): (r["n_users"], r["n_events"])
        for r in out.collect()
    }
    want = {
        (r["event_type"], r["day"]): (r["n_users"], r["n_events"])
        for r in truth.collect()
    }
    assert got == want and len(got) > 0


def test_zorder_buckets_are_locality_tiles(spark):
    """Every 64-cell z-bucket must cover at most an 8x8 tile of the
    (user, hour) plane — the per-file min/max tightness that makes
    two-dimensional pruning work. A 1-D sort's buckets provably
    cannot do this on the second dimension (checked on the fixture:
    its y-span stretches past 8)."""
    import pyspark.sql.functions as F
    from spark_cep_spark import registry

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    rows = registry.QUERIES["scan_zorder"](spark, sf).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["x_hi"] - r["x_lo"] <= 7, r
        assert r["y_hi"] - r["y_lo"] <= 7, r
    # contrast: bucketing the SAME rows by a 1-D (x-major) sort key
    # leaves the y-span wide — z-order is what buys the second dim
    from spark_cep_spark.io import table

    d = (
        table(spark, sf, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(
            (F.col("user_id") % 256).alias("xb"),
            (F.floor(F.unix_timestamp("ts") / 3600) % 256).alias("yb"),
        )
    )
    lin = (
        d.withColumn("lv", F.col("xb") * 256 + F.col("yb"))
        .groupBy(F.shiftright("lv", 6).alias("b"))
        .agg((F.max("yb") - F.min("yb")).alias("yspan"))
    )
    assert lin.agg(F.max("yspan")).first()[0] > 8


def test_qualify_rewrite_errors_and_passthrough(spark):
    """Dialect guards: inline OVER() in QUALIFY and double QUALIFY get
    pointed errors; a statement without QUALIFY passes through; ORDER
    BY / LIMIT after QUALIFY survive the rewrite."""
    import pytest as _pytest
    from spark_cep_spark.sql import sql_with_qualify

    spark.range(10).selectExpr("id", "id % 3 AS g").createOrReplaceTempView(
        "q_t"
    )
    with _pytest.raises(ValueError, match="alias"):
        sql_with_qualify(
            spark,
            "SELECT id, g FROM q_t QUALIFY row_number() OVER "
            "(PARTITION BY g ORDER BY id) = 1",
        )
    with _pytest.raises(ValueError, match="one top-level QUALIFY"):
        sql_with_qualify(spark, "SELECT 1 QUALIFY a QUALIFY b")
    assert sql_with_qualify(spark, "SELECT count(*) AS n FROM q_t").first()[
        "n"
    ] == 10
    out = sql_with_qualify(
        spark,
        "SELECT id, g, CAST(row_number() OVER (PARTITION BY g ORDER BY id)"
        " AS BIGINT) AS rn FROM q_t QUALIFY rn = 1 ORDER BY g LIMIT 2",
    ).collect()
    assert [r["id"] for r in out] == [0, 1]


def test_qualify_topk_plan_is_window_group_limit(spark):
    """The rewritten rank-filter must collapse to WindowGroupLimit —
    QUALIFY sugar may not cost a full per-partition sort."""
    from spark_cep_spark import registry

    registry.load_all()
    df = registry.QUERIES["sql_qualify"](spark, "/root/testdata/sf0.001")
    plan = _executed_plan(df)
    assert "WindowGroupLimit" in plan


def test_lttb_kernel_matches_independent_reference():
    """The production kernel vs an independently-written LTTB
    transcription (float centroid, classic formula) on random integer
    series: same k points whenever no area tie occurs (the float ref
    breaks ties identically here because areas differ)."""
    import random

    import pandas as pd

    from spark_cep_spark.operators.aggregates import _lttb_kernel_factory

    rng = random.Random(406)
    k = 8
    kernel = _lttb_kernel_factory(k)
    for trial in range(25):
        n = rng.randint(9, 120)
        xs = sorted(rng.sample(range(1_000_000), n))
        ys = [rng.randint(-500, 500) for _ in range(n)]
        pdf = pd.DataFrame(
            {
                "user_id": [1] * n,
                "ts": pd.to_datetime(xs, unit="s"),
                "event_id": range(n),
                "x": xs,
                "y": ys,
            }
        )
        got = kernel(pdf)
        # independent reference: float centroids, classic area formula
        mid = k - 2
        bs = [0] + [
            1 + ((i - 1) * mid) // (n - 2) for i in range(1, n - 1)
        ] + [k - 1]
        buckets = {}
        for i, b in enumerate(bs):
            buckets.setdefault(b, []).append(i)
        sel = [0]
        for b in range(1, mid + 1):
            nxt = buckets[b + 1]
            cx = sum(xs[i] for i in nxt) / len(nxt)
            cy = sum(ys[i] for i in nxt) / len(nxt)
            ax, ay = xs[sel[-1]], ys[sel[-1]]
            best, best_a = None, -1.0
            for i in buckets[b]:
                a = abs(
                    (ax - cx) * (ys[i] - ay) - (ax - xs[i]) * (cy - ay)
                )
                if a > best_a:
                    best, best_a = i, a
            sel.append(best)
        sel.append(n - 1)
        assert list(got["x"]) == [xs[i] for i in sel], f"trial {trial}"
        assert list(got["y"]) == [ys[i] for i in sel], f"trial {trial}"


def test_lttb_keeps_spike_and_endpoints(spark):
    """A flat series with one huge spike: LTTB must keep first, last,
    and the spike (the whole point of the algorithm vs uniform
    sampling); short series (n<=k) pass through whole."""
    import datetime as _dt

    rows = []
    t0 = _dt.datetime(2024, 1, 1)
    for i in range(80):
        v = 1000.0 if i == 37 else 1.0
        rows.append((i, t0 + _dt.timedelta(minutes=i), 9, "view", v, "{}"))
    for i in range(5):  # user 10: short series, passes through
        rows.append((100 + i, t0 + _dt.timedelta(minutes=i), 10, "view", float(i), "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import os
    import shutil
    import tempfile

    d = tempfile.mkdtemp()
    src = "/root/testdata/sf0.001"
    for f in os.listdir(src):
        if f != "events.parquet":
            os.symlink(os.path.join(src, f), os.path.join(d, f))
    out = os.path.join(d, "_o")
    df.coalesce(1).write.parquet(out)
    part = next(p for p in os.listdir(out) if p.endswith(".parquet"))
    shutil.move(os.path.join(out, part), os.path.join(d, "events.parquet"))
    shutil.rmtree(out)
    from spark_cep_spark import registry

    registry.load_all()
    res = registry.QUERIES["rollup_lttb"](spark, d).collect()
    u9 = sorted(
        [r for r in res if r["user_id"] == 9], key=lambda r: r["sel_no"]
    )
    assert len(u9) == 8
    assert u9[0]["x"] == int(t0.timestamp())
    assert u9[-1]["x"] == int((t0 + _dt.timedelta(minutes=79)).timestamp())
    assert 100000 in [r["y"] for r in u9]  # the spike (cents)
    u10 = [r for r in res if r["user_id"] == 10]
    assert len(u10) == 5  # pass-through
    shutil.rmtree(d)


# ---------------------------------------------------------------------------
# round-6g: snapshot diff + bitmap retention


def test_snapshot_diff_against_python_recompute(spark):
    """Recompute the full diff in plain Python over the sf0.001 orders
    snapshot pair and compare row-for-row — an oracle-independent
    referee for the classify logic (null-sides vs value inequality)."""
    import pyspark.sql.functions as F
    from spark_cep_spark.io import table
    from spark_cep_spark import registry
    from spark_cep_spark.operators.relational import (  # noqa: F401
        merge_snapshot_diff,
    )

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    rows = (
        table(spark, sf, "orders")
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            "o_orderstatus",
        )
        .collect()
    )
    a = {r.o_orderkey: (r.cents, r.o_orderstatus) for r in rows}
    b = {}
    for k, (c, st) in a.items():
        if k % 13 != 0:
            b[k] = (c + 500 if k % 10 == 0 else c, st)
        if k % 37 == 0:
            b[k + 10_000_000] = (c, "N")
    want = {}
    for k in a.keys() | b.keys():
        if k not in b:
            want[k] = ("delete", a[k][0], None)
        elif k not in a:
            want[k] = ("insert", None, b[k][0])
        elif a[k] != b[k]:
            want[k] = ("update", a[k][0], b[k][0])
    out = registry.QUERIES["merge_snapshot_diff"](spark, sf).collect()
    got = {r.okey: (r.action, r.old_cents, r.new_cents) for r in out}
    assert got == want
    # the fixture must exercise every action class
    assert {v[0] for v in got.values()} == {"insert", "update", "delete"}


def test_bitmap_retention_against_python_recompute(spark):
    """|active(d) ∩ active(d-1)| per day recomputed with Python sets
    from the raw events — referees the inclusion-exclusion-per-bucket
    bitmap algebra independently of the SQL oracle."""
    import datetime as _dt

    import pyspark.sql.functions as F
    from spark_cep_spark.io import table
    from spark_cep_spark import registry
    from spark_cep_spark.operators.aggregates import (  # noqa: F401
        agg_bitmap_retention,
    )

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    rows = (
        table(spark, sf, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select(F.to_date("ts").alias("day"), "user_id")
        .collect()
    )
    active: dict = {}
    for r in rows:
        active.setdefault(r.day, set()).add(r.user_id)
    out = registry.QUERIES["agg_bitmap_retention"](spark, sf).collect()
    got = {r.day: (r.dau, r.returning) for r in out}
    want = {
        d: (
            len(users),
            len(users & active.get(d - _dt.timedelta(days=1), set())),
        )
        for d, users in active.items()
    }
    assert got == want
    # the fixture spans consecutive days, so retention is non-trivial
    assert any(v[1] > 0 for v in want.values())


def test_scd2_pit_against_python_recompute(spark):
    """Rebuild the SCD2 version timeline and the point-in-time
    assignment in plain Python over the sf0.001 cohort — referees both
    the interval construction and the empty-interval (same-timestamp
    flip) resolution rule independently of the SQL oracle."""
    import pyspark.sql.functions as F
    from spark_cep_spark.io import table
    from spark_cep_spark import registry
    from spark_cep_spark.operators.joins import join_scd2_pit  # noqa: F401

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    rows = (
        table(spark, sf, "orders")
        .filter(F.col("o_custkey") % 50 == 0)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
        .collect()
    )
    by_cust: dict = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    want = {}
    for ck, rs in by_cust.items():
        rs.sort(key=lambda r: (r.o_orderdate, r.o_orderkey))
        # versions: runs of equal consecutive priority; run ids start
        # at 1 (merge_scd2's first-row lag is NULL -> IS DISTINCT FROM
        # -> chg=1, so the running sum opens at 1)
        versions = []  # (version_id, priority, valid_from)
        vid = 0
        for i, r in enumerate(rs):
            if i == 0 or r.o_orderpriority != rs[i - 1].o_orderpriority:
                vid += 1
                versions.append([vid, r.o_orderpriority, r.o_orderdate])
        # valid_to = next version's valid_from (None for last)
        for i, v in enumerate(versions):
            v.append(versions[i + 1][2] if i + 1 < len(versions) else None)
        for r in rs:
            for vid_, pri, vf, vt in versions:
                if r.o_orderdate >= vf and (vt is None or r.o_orderdate < vt):
                    want[r.o_orderkey] = (
                        ck, vid_, pri, 1 if pri == r.o_orderpriority else 0
                    )
    out = registry.QUERIES["join_scd2_pit"](spark, sf).collect()
    got = {
        r.okey: (r.custkey, r.version, r.dim_priority, r.is_own_version)
        for r in out
    }
    # every cohort order resolves to exactly one version
    assert len(out) == len(rows)
    assert got == want


def test_graph_components_against_union_find(spark):
    """Union-find over the collected sf0.001 edge list — referees the
    two-phase small-star/large-star result (labels AND sizes) against
    the textbook sequential algorithm."""
    from spark_cep_spark import registry
    from spark_cep_spark.operators.graph import (  # noqa: F401
        cooccurrence_edges,
        graph_components,
    )

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    edges = [
        (r.u, r.v) for r in cooccurrence_edges(spark, sf).collect()
    ]
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    comp = {n: find(n) for n in parent}
    # canonical label = min node id in the component
    mins: dict = {}
    for n, c in comp.items():
        mins[c] = min(mins.get(c, n), n)
    want_label = {n: mins[c] for n, c in comp.items()}
    sizes: dict = {}
    for lbl in want_label.values():
        sizes[lbl] = sizes.get(lbl, 0) + 1
    out = registry.QUERIES["graph_components"](spark, sf).collect()
    got = {r.node: (r.component, r.csize) for r in out}
    assert got == {n: (l, sizes[l]) for n, l in want_label.items()}
    # non-trivial fixture: more than one component or one big one
    assert len(out) > 0


def test_pareto_share_matches_naive_global_window(spark):
    """Differential referee: the scale-safe two-pass (bucket offset +
    within-bucket running sum) must reproduce the naive global-ordered-
    window spelling row for row — and its big window must be
    PARTITIONED (the whole point), which we pin in the executed plan."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W
    from spark_cep_spark.io import table
    from spark_cep_spark import registry
    from spark_cep_spark.operators.windows import (  # noqa: F401
        win_pareto_share,
    )

    registry.load_all()
    sf = "/root/testdata/sf0.001"
    spend = (
        table(spark, sf, "orders")
        .filter(F.col("o_custkey").isNotNull() & F.col("o_totalprice").isNotNull())
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    wg = W.orderBy(F.desc("cents"), F.asc("custkey")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    naive = spend.select(
        "custkey", "cents", F.sum("cents").over(wg).cast("long").alias("cum")
    )
    want = {r.custkey: (r.cents, r.cum) for r in naive.collect()}
    out = registry.QUERIES["win_pareto_share"](spark, sf)
    got = {r.custkey: (r.cents, r.cum_cents) for r in out.collect()}
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the spend-sized window carries a partition spec (bkt); only the
    # <=65-row bucket-offset window may be unpartitioned
    import re
    wins = re.findall(r"Window \[.*?windowspecdefinition\(([^)]*)\)", plan)
    partitioned = [w for w in wins if "bkt" in w]
    assert partitioned, f"no bkt-partitioned window in plan:\n{plan[:2000]}"


# ---------------------------------------------------------------------------
# round-6g streaming face: incremental retention marks


@settings(max_examples=200, deadline=None)
@given(
    days=st.lists(
        st.integers(min_value=0, max_value=20), min_size=0, max_size=40
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=40), max_size=3),
)
def test_retention_kernel_brute_force_and_chunking(days, cuts):
    from spark_cep_spark.streaming.nfa import advance_retention

    DAY = 86_400_000_000
    # events sorted by ts (the wrapper's contract); several per day ok
    rows = [[d * DAY + i, i] for i, d in enumerate(sorted(days))]
    last, want = None, []
    for ts, _ in rows:
        d = ts // DAY
        if last is None:
            want.append([d, 0, 1])
            last = d
        elif d > last:
            want.append([d, 1 if d == last + 1 else 0, 0])
            last = d
    _, whole = advance_retention(None, [r[:] for r in rows])
    assert whole == want

    bounds = sorted({c for c in cuts if c <= len(rows)})
    stt, got, prev_i = None, [], 0
    for b in bounds + [len(rows)]:
        stt, part = advance_retention(stt, [r[:] for r in rows[prev_i:b]])
        got.extend(part)
        prev_i = b
    assert got == whole


def test_streaming_retention_marks_roll_up_to_batch_twin(spark, sf_dir):
    """Multi-micro-batch AvailableNow marks, aggregated per day, must
    equal the stream_retention batch twin over the same rows — and the
    per-(key, day) marks themselves must match a Python recompute."""
    import datetime as ddt
    import glob
    import os

    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import retention_stream
    from spark_cep_spark import registry
    registry.load_all()

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    sentinel = spark.createDataFrame(
        [(10**9, ddt.datetime(2025, 1, 1), -1, "view", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sentinel.coalesce(1).write.mode("append").parquet(staged)
    newest = max(
        glob.glob(os.path.join(staged, "part-*")), key=os.path.getmtime
    )
    os.utime(newest, (1_700_000_000 + 10_000 * 3600,) * 2)

    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        retention_stream(stream, watermark="0 seconds"), "append"
    )
    marks = {
        (r["key"], r["day"].date()): (r["returning"], r["new"])
        for r in got.filter("key <> -1").collect()
    }
    # python recompute from the staged rows
    import pyspark.sql.functions as F

    rows = (
        spark.read.parquet(staged)
        .filter("user_id <> -1 AND user_id IS NOT NULL AND ts IS NOT NULL")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
        .collect()
    )
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r.day)
    want = {}
    for u, ds in by_user.items():
        ds.sort()
        for i, d in enumerate(ds):
            if i == 0:
                want[(u, d)] = (0, 1)
            else:
                want[(u, d)] = (
                    1 if (d - ds[i - 1]).days == 1 else 0, 0
                )
    assert marks == want and len(want) > 0
    # rollup equals the registered batch twin's per-day panel
    agg: dict = {}
    for (u, d), (ret, new) in marks.items():
        a = agg.setdefault(d, [0, 0, 0])
        a[0] += 1
        a[1] += ret
        a[2] += new
    import tempfile

    tmp = tempfile.mkdtemp()
    spark.read.parquet(staged).filter("user_id <> -1").write.parquet(
        os.path.join(tmp, "events.parquet"), mode="overwrite"
    )
    for f in os.listdir("/root/testdata/sf0.001"):
        if f != "events.parquet":
            os.symlink(
                os.path.join("/root/testdata/sf0.001", f),
                os.path.join(tmp, f),
            )
    twin = {
        r["day"]: [r["n_active"], r["n_returning"], r["n_new"]]
        for r in registry.QUERIES["stream_retention"](spark, tmp).collect()
    }
    assert agg == twin


def test_retention_stream_under_rocksdb_state_store(spark, sf_dir):
    """retention_stream's JSON state payload must round-trip through
    the RocksDB state store provider exactly as through the default."""
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import retention_stream

    conf = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf, None)
    spark.conf.set(
        conf,
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider",
    )
    try:
        staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=4)
        got = harness.run_available_now(
            retention_stream(
                harness.events_stream(spark, staged, max_files_per_trigger=2),
                watermark="0 seconds",
            ),
            "append",
        )
        assert got.count() > 0
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)


def test_retention_state_survives_checkpoint_restart(spark, sf_dir, tmp_path):
    """Kill-and-resume for retention_stream: the last-active-day int
    and the arrival buffer must resume exactly from the checkpoint —
    a lost state int would re-mark a user as `new` after the restart,
    so two-run output must equal an uninterrupted run."""
    import os
    import shutil

    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import retention_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=8)
    src = str(tmp_path / "src")
    os.makedirs(src)
    parts = sorted(f for f in os.listdir(staged) if f.startswith("part"))
    assert len(parts) >= 8

    def run(src_dir, out, ckpt):
        stream = harness.events_stream(spark, src_dir, max_files_per_trigger=2)
        q = (
            retention_stream(stream, watermark="0 seconds")
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
        for f in names:
            dst = os.path.join(src, f)
            shutil.copy(os.path.join(staged, f), dst)
            os.utime(dst, (1_700_000_000 + parts.index(f) * 3600,) * 2)

    copy_ordered(parts[:4])
    run(src, out, ckpt)
    n_first = spark.read.parquet(out).count()
    copy_ordered(parts[4:])
    run(src, out, ckpt)

    got = {
        (r["key"], r["day"], r["returning"], r["new"])
        for r in spark.read.parquet(out).collect()
    }
    uninterrupted = {
        (r["key"], r["day"], r["returning"], r["new"])
        for r in harness.run_available_now(
            retention_stream(
                harness.events_stream(spark, staged, max_files_per_trigger=2),
                watermark="0 seconds",
            ),
            "append",
        ).collect()
    }
    assert got == uninterrupted
    assert 0 < n_first <= len(got)


def test_share_of_total_single_exchange(spark):
    """Both window functions (full-partition sum and ordered rank)
    share the custkey partitioning — the executed plan must contain
    exactly ONE shuffle exchange (the docstring's claim)."""
    from spark_cep_spark import registry
    from spark_cep_spark.operators.windows import (  # noqa: F401
        win_share_of_total,
    )

    registry.load_all()
    df = registry.QUERIES["win_share_of_total"](spark, SF_CHECK)
    plan = _executed_plan(df).split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1, plan[:3000]


def test_incremental_agg_merge_is_exercised(spark):
    """The fixture split (2001-01-01) must exercise every merge case:
    history-only customers, delta-only customers (if any), and
    customers present on BOTH sides — otherwise the full-outer merge
    algebra is vacuously 'correct'."""
    import pyspark.sql.functions as F
    from spark_cep_spark.io import table
    from spark_cep_spark import registry
    from spark_cep_spark.operators.relational import (  # noqa: F401
        merge_incremental_agg,
    )

    registry.load_all()
    sf = SF_CHECK
    o = table(spark, sf, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    h = {r.o_custkey for r in
         o.filter("o_orderdate < '2001-01-01'").select("o_custkey")
          .distinct().collect()}
    d = {r.o_custkey for r in
         o.filter("o_orderdate >= '2001-01-01'").select("o_custkey")
          .distinct().collect()}
    assert h - d, "no history-only customers"
    assert h & d, "no customers on both sides - merge untested"
    assert len(d) > 0, "empty delta"
    out = registry.QUERIES["merge_incremental_agg"](spark, sf)
    assert out.count() == len(h | d)


def test_retention_three_spellings_agree(spark):
    """The bitmap inclusion-exclusion (agg_bitmap_retention), the
    dedup+lag panel (stream_retention), and the kernel's definition
    all compute |active(d) ∩ active(d-1)| — the two registered
    spellings must agree day-for-day on both dau/n_active and
    returning, at sf0.01."""
    from spark_cep_spark import registry

    registry.load_all()
    sf = SF_CHECK
    bitmap = {
        r.day: (r.dau, r.returning)
        for r in registry.QUERIES["agg_bitmap_retention"](spark, sf).collect()
    }
    panel = {
        r.day: (r.n_active, r.n_returning)
        for r in registry.QUERIES["stream_retention"](spark, sf).collect()
    }
    assert bitmap == panel and len(bitmap) > 1


def test_incremental_agg_null_date_rows_excluded_both_sides(spark, tmp_path):
    """A NULL o_orderdate row must be excluded from BOTH the engine
    plan and the oracle semantics (a date-partitioned refresh has no
    partition for it) — caught by code review: without the filter the
    row fell out of hist AND delta while the full-rescan oracle
    counted it."""
    import datetime as ddt
    import os

    import duckdb
    from spark_cep_spark import registry
    from spark_cep_spark.operators.relational import (  # noqa: F401
        merge_incremental_agg,
    )

    registry.load_all()
    rows = [
        (1, 10, "O", 100.0, ddt.datetime(2000, 5, 1), "1-URGENT"),
        (2, 10, "O", 50.0, None, "1-URGENT"),  # dateless
        (3, 10, "O", 25.0, ddt.datetime(2001, 3, 1), "1-URGENT"),
        (4, 20, "O", 75.0, None, "1-URGENT"),  # dateless-only customer
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    d = str(tmp_path / "snap")
    os.makedirs(d)
    df.write.parquet(os.path.join(d, "orders.parquet"))
    for f in os.listdir("/root/testdata/sf0.001"):
        if f != "orders.parquet":
            os.symlink(os.path.join("/root/testdata/sf0.001", f),
                       os.path.join(d, f))
    got = {
        r.custkey: (r.n_orders, r.sum_cents)
        for r in registry.QUERIES["merge_incremental_agg"](spark, d).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"'{os.path.join(d, 'orders.parquet')}/*.parquet'"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(registry.ORACLES["merge_incremental_agg"])
        .fetchall()
    }
    assert got == want == {10: (2, 12500)}


def test_pareto_and_share_survive_degenerate_value_domains(spark, tmp_path):
    """Refund-heavy / zero-total domains (code-review catch): pareto's
    min-shifted buckets must keep the exact global order when ALL
    spends are negative (incl. max = -1, the divide-by-zero case of
    the unshifted form), and both ops must emit NULL share for a
    non-positive total instead of throwing under ANSI."""
    import os

    import pyspark.sql.functions as F
    from pyspark.sql import Window as W
    from spark_cep_spark import registry

    registry.load_all()
    rows = [
        # custkey, price: all-negative domain with max total = -0.01
        (1, 101, -0.01),
        (2, 102, -5.00),
        (3, 103, -2.50),
        # a zero-total customer (offsetting rows)
        (4, 104, 3.00),
        (5, 104, -3.00),
    ]
    df = spark.createDataFrame(
        [(k, c, p, None, None, None) for k, c, p in
         [(r[0], r[1], r[2]) for r in rows]],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderstatus string, o_orderdate timestamp, o_orderpriority string",
    )
    d = str(tmp_path / "neg")
    os.makedirs(d)
    df.write.parquet(os.path.join(d, "orders.parquet"))
    for f in os.listdir("/root/testdata/sf0.001"):
        if f != "orders.parquet":
            os.symlink(os.path.join("/root/testdata/sf0.001", f),
                       os.path.join(d, f))

    out = registry.QUERIES["win_pareto_share"](spark, d).collect()
    # grand total = -751 cents (non-positive) -> share NULL everywhere
    assert all(r.share_ppm is None for r in out) and len(out) == 4
    # cum_cents must equal the naive global window on the same spends
    spend = (
        df.filter("o_custkey IS NOT NULL AND o_totalprice IS NOT NULL")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
             .cast("long").alias("cents"))
    )
    wg = W.orderBy(F.desc("cents"), F.asc("custkey")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    want = {
        r.custkey: r.cum
        for r in spend.select(
            "custkey", F.sum("cents").over(wg).cast("long").alias("cum")
        ).collect()
    }
    assert {r.custkey: r.cum_cents for r in out} == want

    st = registry.QUERIES["win_share_of_total"](spark, d).collect()
    zero_total = [r for r in st if r.custkey == 104]
    others = [r for r in st if r.custkey != 104]
    assert zero_total and all(r.share_ppm is None for r in zero_total)
    # negative single-order customers: total < 0 -> NULL share too
    assert all(r.share_ppm is None for r in others)


def test_bitmap_id_mapping_injective_on_mixed_sign_ids(spark):
    """agg_bitmap_distinct / agg_bitmap_retention are exact only if
    id → (bitmap_bucket_number, bitmap_bit_position) is injective —
    pinned here across negative ids, bucket boundaries, and zero
    (empirically Spark partitions the full integer line cleanly, but
    nothing in the docs promises it for negatives)."""
    ids = [-70000, -32769, -32768, -32767, -1, 0, 1, 2,
           32767, 32768, 32769, 70000]
    df = spark.createDataFrame([(i,) for i in ids], "user_id long")
    rows = df.selectExpr(
        "user_id",
        "bitmap_bucket_number(user_id) AS b",
        "bitmap_bit_position(user_id) AS p",
    ).collect()
    assert len({(r.b, r.p) for r in rows}) == len(ids)
    # and the bitmap count agrees with the exact distinct
    import pyspark.sql.functions as F

    got = (
        df.selectExpr("bitmap_bucket_number(user_id) AS b",
                      "bitmap_bit_position(user_id) AS p")
        .groupBy("b")
        .agg(F.expr("bitmap_count(bitmap_construct_agg(p))").alias("c"))
        .agg(F.expr("sum(c)").alias("n"))
        .collect()[0]["n"]
    )
    assert got == len(ids)


def test_null_safe_join_is_hash_not_nested_loop(spark):
    """EqualNullSafe must compile to a hash-family join (Spark tags
    the key with coalesce, keeping it equi) — a NestedLoop here would
    be the quadratic trap; and the NULL<=>NULL group must be present."""
    from spark_cep_spark import registry
    from spark_cep_spark.operators.joins import join_null_safe  # noqa: F401

    registry.load_all()
    df = registry.QUERIES["join_null_safe"](spark, SF_CHECK)
    rows = df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    null_grp = [r for r in rows if r.grp is None]
    assert null_grp and null_grp[0].n_pairs > 0


def test_exists_flag_plans_existence_join(spark):
    """Projected EXISTS must compile to the ExistenceJoin hash variant
    (a semi join can't carry the flag; a left-join+dedup would pay an
    extra aggregate)."""
    from spark_cep_spark import registry
    from spark_cep_spark.operators.sql_surface import (  # noqa: F401
        sql_exists_flag,
    )

    registry.load_all()
    df = registry.QUERIES["sql_exists_flag"](spark, SF_CHECK)
    plan = _executed_plan(df)
    assert "ExistenceJoin" in plan, plan[:2000]
    assert "NestedLoop" not in plan.split("== Initial Plan ==")[0]


# ---------------------------------------------------------------------------
# round-6g: running-aggregate kleene (DEFINE-aggregate semantics)


@settings(max_examples=200, deadline=None)
@given(
    evs=st.lists(
        st.tuples(
            st.sampled_from(["signup", "view", "click", None]),
            st.one_of(st.none(), st.integers(min_value=-50, max_value=200)),
            st.integers(min_value=0, max_value=20),  # day gaps
        ),
        min_size=0,
        max_size=40,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=40), max_size=3),
)
def test_run_agg_kernel_brute_force_and_chunking(evs, cuts):
    """Inline brute-force transcription of the run-agg definition vs
    the kernel, then chunked replay with a monotone watermark — the
    chunking-invariance property every streaming face must hold."""
    from spark_cep_spark.streaming.nfa import (
        _RUN_AGG_WITHIN_US,
        advance_run_agg,
    )

    DAY = 86_400_000_000
    t = 0
    rows = []
    for i, (et, c, gap) in enumerate(evs):
        t += gap * DAY // 4
        rows.append([t, i, et, c])

    # brute force (independent transcription)
    st_, want = None, []
    for ts, _eid, et, c in rows:
        if st_ is not None and ts > st_[3]:
            if st_[0] > 0:
                want.append([st_[2], st_[0], st_[1]])
            st_ = None
        if st_ is None:
            if et == "signup":
                st_ = [0, 0, ts, ts + _RUN_AGG_WITHIN_US]
        elif et == "view" and c is not None:
            if 2 * c * (st_[0] + 1) <= 3 * (st_[1] + c):
                st_ = [st_[0] + 1, st_[1] + c, st_[2], st_[3]]
            else:
                if st_[0] > 0:
                    want.append([st_[2], st_[0], st_[1]])
                st_ = None
    if st_ is not None and st_[0] > 0:
        want.append([st_[2], st_[0], st_[1]])

    FAR = 1 << 62
    _, whole = advance_run_agg(None, [r[:] for r in rows], FAR)
    assert whole == want

    bounds = sorted({c for c in cuts if c <= len(rows)})
    stt, got, prev_i = None, [], 0
    for b in bounds + [len(rows)]:
        chunk = rows[prev_i:b]
        wm = chunk[-1][0] if chunk else (rows[prev_i - 1][0] if prev_i else 0)
        stt, part = advance_run_agg(stt, [r[:] for r in chunk], wm)
        got.extend(part)
        prev_i = b
    stt, part = advance_run_agg(stt, [], FAR)
    got.extend(part)
    assert got == whole


def test_run_agg_stream_equals_batch(spark, sf_dir):
    """Multi-micro-batch AvailableNow emission equals the cep_run_agg
    batch key over the same rows (sentinel extends the watermark past
    every run deadline, so deadline-timer emission is exercised)."""
    import datetime as ddt
    import glob
    import os
    import tempfile

    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import run_agg_stream
    from spark_cep_spark import registry

    registry.load_all()
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    sentinel = spark.createDataFrame(
        [(10**9, ddt.datetime(2026, 1, 1), -1, "view", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sentinel.coalesce(1).write.mode("append").parquet(staged)
    newest = max(
        glob.glob(os.path.join(staged, "part-*")), key=os.path.getmtime
    )
    os.utime(newest, (1_700_000_000 + 10_000 * 3600,) * 2)

    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = {
        (r["key"], r["anchor_ts"], r["n_b"], r["sum_b_cents"])
        for r in harness.run_available_now(
            run_agg_stream(stream, watermark="0 seconds"), "append"
        ).filter("key <> -1").collect()
    }
    d = tempfile.mkdtemp()
    spark.read.parquet(staged).filter("user_id <> -1").write.parquet(
        os.path.join(d, "events.parquet"), mode="overwrite"
    )
    for f in os.listdir("/root/testdata/sf0.001"):
        if f != "events.parquet":
            os.symlink(os.path.join("/root/testdata/sf0.001", f),
                       os.path.join(d, f))
    want = {
        (r["user_id"], r["anchor_ts"], r["n_b"], r["sum_b_cents"])
        for r in registry.QUERIES["cep_run_agg"](spark, d).collect()
    }
    assert got == want and len(want) > 0


def test_run_agg_stream_under_rocksdb_state_store(spark, sf_dir):
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import run_agg_stream

    conf = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf, None)
    spark.conf.set(
        conf,
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider",
    )
    try:
        staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=4)
        got = harness.run_available_now(
            run_agg_stream(
                harness.events_stream(spark, staged, max_files_per_trigger=2),
                watermark="0 seconds",
            ),
            "append",
        )
        # fail-closes inside the staged data emit without any sentinel,
        # so a zero count means the RocksDB path lost state
        assert got.count() > 0
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)


def test_run_agg_state_survives_checkpoint_restart(spark, sf_dir, tmp_path):
    """Kill-and-resume for run_agg_stream: the open run's
    [n, sum, anchor, deadline] and the buffer must resume exactly —
    a lost run state would re-anchor mid-run and change emissions."""
    import os
    import shutil

    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import run_agg_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=8)
    src = str(tmp_path / "src")
    os.makedirs(src)
    parts = sorted(f for f in os.listdir(staged) if f.startswith("part"))

    def run(src_dir, out, ckpt):
        stream = harness.events_stream(spark, src_dir, max_files_per_trigger=2)
        q = (
            run_agg_stream(stream, watermark="0 seconds")
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
        for f in names:
            dst = os.path.join(src, f)
            shutil.copy(os.path.join(staged, f), dst)
            os.utime(dst, (1_700_000_000 + parts.index(f) * 3600,) * 2)

    copy_ordered(parts[:4])
    run(src, out, ckpt)
    copy_ordered(parts[4:])
    run(src, out, ckpt)

    got = {
        (r["key"], r["anchor_ts"], r["n_b"], r["sum_b_cents"])
        for r in spark.read.parquet(out).collect()
    }
    uninterrupted = {
        (r["key"], r["anchor_ts"], r["n_b"], r["sum_b_cents"])
        for r in harness.run_available_now(
            run_agg_stream(
                harness.events_stream(spark, staged, max_files_per_trigger=2),
                watermark="0 seconds",
            ),
            "append",
        ).collect()
    }
    assert got == uninterrupted
