"""Round-10 operators: FINAL/RUNNING MEASURES on the CLASSIC
(non-run-agg) SQL-text path — universal-set aggregates
(SUM/COUNT/COUNT(*)/AVG over an UNQUALIFIED column) range over all
bound rows of the match, RUNNING as of each ALL-ROWS output row,
FINAL over the whole match, and fold to the whole-match value in ONE
ROW mode. Compiles to hidden per-step carries + the
rows_per_match_measures unpivot (prefix arithmetic inside the
array-of-structs — no window, no extra shuffle, streams unchanged)."""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import time

import pytest

from spark_cep_spark.operators.cep_sql import (
    match_recognize,
    parse_pattern_sql,
)

T0 = dt.datetime(2024, 1, 1)
SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

FR_SQL = """
PATTERN ( v -> c -> p )
WITHIN 1 HOUR
DEFINE v AS event_type = 'view',
       c AS event_type = 'click',
       p AS event_type = 'purchase'
MEASURES RUNNING SUM(value) AS run_sum,
         FINAL SUM(value) AS fin_sum,
         RUNNING COUNT(value) AS n_so_far,
         FINAL COUNT(*) AS n_rows,
         RUNNING AVG(value) AS avg_so_far
ALL ROWS PER MATCH
PARTITION BY user_id
ORDER BY ts
"""

# u1: full funnel with a NULL mid-value; u2: NULL anchor value (the
# SUM/AVG-over-zero-non-NULL edge on row 1); u3: no match (no purchase)
ROWS = [
    (0, 0, 1, "view", 10.0),
    (1, 5, 1, "click", None),
    (2, 9, 1, "purchase", 2.5),
    (3, 0, 2, "view", None),
    (4, 3, 2, "click", 7.0),
    (5, 8, 2, "purchase", 1.0),
    (6, 0, 3, "view", 4.0),
    (7, 5, 3, "click", 3.0),
]


def _fixture(spark):
    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, v, "{}")
        for i, m, u, t, v in ROWS
    ]
    return spark.createDataFrame(data, SCHEMA)


# ---------------------------------------------------------------------------
# Parse-level contract


def test_parse_extracts_universal_specs():
    parsed = parse_pattern_sql(FR_SQL)
    assert parsed.universal_measures == (
        ("run_sum", "RUNNING", "sum", "value"),
        ("fin_sum", "FINAL", "sum", "value"),
        ("n_so_far", "RUNNING", "count", "value"),
        ("n_rows", "FINAL", "count_star", None),
        ("avg_so_far", "RUNNING", "avg", "value"),
    )
    # one hidden carry per (col, step); no user step-measures
    assert [a for a, _e in parsed.pattern.measures] == [
        "__arm_value__v",
        "__arm_value__c",
        "__arm_value__p",
    ]


def test_bare_universal_agg_defaults_to_running():
    parsed = parse_pattern_sql(
        FR_SQL.replace("RUNNING SUM(value)", "SUM(value)")
    )
    assert parsed.universal_measures[0] == ("run_sum", "RUNNING", "sum", "value")


def test_min_max_universal_fold(spark):
    # MIN/MAX fold through least()/greatest(), NULL-skipping on both
    # engines — RUNNING min ignores the NULL click, FINAL max sees all
    out = match_recognize(
        _fixture(spark),
        FR_SQL.replace(
            "RUNNING AVG(value) AS avg_so_far",
            "RUNNING MIN(value) AS min_so_far, FINAL MAX(value) AS max_fin",
        ),
    ).collect()
    got = {
        (r["key"], r["seq_no"]): (r["min_so_far"], r["max_fin"])
        for r in out
    }
    assert got[(1, 1)] == (10.0, 10.0)
    assert got[(1, 2)] == (10.0, 10.0)  # NULL click skipped by MIN
    assert got[(1, 3)] == (2.5, 10.0)
    assert got[(2, 1)] == (None, 7.0)  # all-NULL-so-far min is NULL


def test_sum_star_rejected():
    with pytest.raises(ValueError, match=r"only\s+COUNT takes the \* form"):
        parse_pattern_sql(FR_SQL.replace("FINAL COUNT(*)", "FINAL SUM(*)"))


def test_step_qualified_measure_still_rejected_in_all_rows():
    with pytest.raises(ValueError, match="step-qualified MEASURES"):
        parse_pattern_sql(
            FR_SQL.replace("RUNNING SUM(value)", "v.value")
        )


def test_step_qualified_prefix_is_noop_in_one_row(spark):
    # FINAL <step>.<col> in ONE ROW mode: the output row is the
    # match's last, where RUNNING == FINAL — both prefixes peel
    out = match_recognize(
        _fixture(spark),
        """
        PATTERN ( v -> c )
        WITHIN 1 HOUR
        DEFINE v AS event_type = 'view',
               c AS event_type = 'click'
        MEASURES FINAL v.value AS vv, RUNNING c.value AS cv
        PARTITION BY user_id
        ORDER BY ts
        """,
    )
    got = {(r["key"], r["anchor_id"]): (r["vv"], r["cv"]) for r in out.collect()}
    assert got[(1, 0)] == (10.0, None)
    assert got[(2, 3)] == (None, 7.0)


def test_universal_with_kleene_rejected():
    with pytest.raises(ValueError, match="fixed chain"):
        parse_pattern_sql(
            """
            PATTERN ( v -> c+ )
            WITHIN 1 HOUR
            DEFINE v AS event_type = 'view',
                   c AS event_type = 'click'
            MEASURES FINAL COUNT(*) AS n
            PARTITION BY user_id
            ORDER BY ts
            """
        )


def test_universal_with_expansion_rejected(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError, match="not supported with"):
        match_recognize(
            df,
            """
            PATTERN ( v -> c? )
            WITHIN 1 HOUR
            DEFINE v AS event_type = 'view',
                   c AS event_type = 'click'
            MEASURES FINAL COUNT(*) AS n
            PARTITION BY user_id
            ORDER BY ts
            """,
        )


def test_alias_collision_and_reserved_prefix_rejected():
    with pytest.raises(ValueError, match="listed twice"):
        parse_pattern_sql(
            FR_SQL.replace("AS fin_sum", "AS run_sum")
        )
    with pytest.raises(ValueError, match="collide with output"):
        parse_pattern_sql(FR_SQL.replace("AS run_sum", "AS seq_no"))
    with pytest.raises(ValueError, match="reserved"):
        parse_pattern_sql(FR_SQL.replace("AS run_sum", "AS __arm_x"))


def test_universal_alias_collides_with_match_number_classifier():
    # a universal aggregate alias equal to the MATCH_NUMBER() /
    # CLASSIFIER() alias would silently duplicate output columns after
    # the unpivot/rename — must raise at parse time (round-10 advice)
    with pytest.raises(ValueError, match="collide with output"):
        parse_pattern_sql(
            """
            PATTERN ( v -> c )
            WITHIN 1 HOUR
            DEFINE v AS event_type = 'view',
                   c AS event_type = 'click'
            MEASURES MATCH_NUMBER() AS mn, FINAL COUNT(*) AS mn
            PARTITION BY user_id
            ORDER BY ts
            """
        )
    with pytest.raises(ValueError, match="collide with output"):
        parse_pattern_sql(
            """
            PATTERN ( v -> c )
            WITHIN 1 HOUR
            DEFINE v AS event_type = 'view',
                   c AS event_type = 'click'
            MEASURES CLASSIFIER() AS lbl, RUNNING SUM(value) AS lbl
            PARTITION BY user_id
            ORDER BY ts
            ALL ROWS PER MATCH
            """
        )


# ---------------------------------------------------------------------------
# Batch semantics


def test_batch_running_final_null_semantics(spark):
    rows = match_recognize(_fixture(spark), FR_SQL).collect()
    got = {
        (r["key"], r["seq_no"]): (
            r["run_sum"], r["fin_sum"], r["n_so_far"], r["n_rows"],
            r["avg_so_far"],
        )
        for r in rows
    }
    assert len(rows) == 6  # u1 + u2, 3 rows each; u3 no match
    # u1: 10.0, NULL, 2.5
    assert got[(1, 1)] == (10.0, 12.5, 1, 3, 10.0)
    assert got[(1, 2)] == (10.0, 12.5, 1, 3, 10.0)  # NULL click skipped
    assert got[(1, 3)] == (12.5, 12.5, 2, 3, 6.25)
    # u2: NULL anchor — SUM/AVG over zero non-NULLs is NULL, COUNT 0
    assert got[(2, 1)] == (None, 8.0, 0, 3, None)
    assert got[(2, 2)] == (7.0, 8.0, 1, 3, 7.0)
    assert got[(2, 3)] == (8.0, 8.0, 2, 3, 4.0)


def test_one_row_fold_equals_last_all_rows_row(spark):
    all_rows = match_recognize(_fixture(spark), FR_SQL)
    one_row = match_recognize(
        _fixture(spark), FR_SQL.replace("ALL ROWS PER MATCH", "")
    )
    cols = ["run_sum", "fin_sum", "n_so_far", "n_rows", "avg_so_far"]
    last = {
        (r["key"], r["anchor_id"]): tuple(r[c] for c in cols)
        for r in all_rows.filter("seq_no = 3").collect()
    }
    fold = {
        (r["key"], r["anchor_id"]): tuple(r[c] for c in cols)
        for r in one_row.collect()
    }
    assert fold == last and len(fold) == 2
    # hidden carries are dropped from the ONE ROW output
    assert not [c for c in one_row.columns if c.startswith("__arm_")]


def test_exclusion_keeps_running_over_excluded_rows(spark):
    out = match_recognize(
        _fixture(spark),
        FR_SQL.replace("( v -> c -> p )", "( v -> {- c -} -> p )"),
    ).collect()
    by = {(r["key"], r["seq_no"]): r for r in out}
    # click rows omitted from the OUTPUT, but the purchase row's
    # RUNNING values still count the excluded click (standard)
    assert {(k, s) for k, s in by} == {(1, 1), (1, 3), (2, 1), (2, 3)}
    assert by[(2, 3)]["run_sum"] == 8.0 and by[(2, 3)]["n_so_far"] == 2


def test_universal_composes_with_match_number_and_classifier(spark):
    out = match_recognize(
        _fixture(spark),
        FR_SQL.replace(
            "RUNNING AVG(value) AS avg_so_far",
            "RUNNING AVG(value) AS avg_so_far, MATCH_NUMBER() AS mn, "
            "CLASSIFIER() AS cls",
        ),
    ).collect()
    assert {r["cls"] for r in out} == {"v", "c", "p"}
    assert all(r["mn"] == 1 for r in out)


# ---------------------------------------------------------------------------
# Streaming == batch (multi-micro-batch availableNow)


def test_stream_final_running_equals_batch(spark):
    rows = ROWS + [
        # u1's second funnel lands in a later file
        (10, 200, 1, "view", 4.0),
        (11, 205, 1, "click", 3.0),
        (12, 209, 1, "purchase", 2.0),
    ]
    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, v, "{}")
        for i, m, u, t, v in rows
    ]
    df = spark.createDataFrame(data, SCHEMA)
    d = tempfile.mkdtemp()
    chunks = [data[:5], data[5:]] + [
        [(100 + j, T0 + dt.timedelta(minutes=mm), 9, "view", 1.0, "{}")]
        for j, mm in enumerate((500, 1000))
    ]
    for i, ch in enumerate(chunks):
        spark.createDataFrame(ch, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"f{i}"))
        time.sleep(1.05)
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "f*"))
    )
    from spark_cep_spark.streaming import harness

    got = harness.run_available_now(
        match_recognize(sdf, FR_SQL, watermark="0 seconds"), "append"
    )
    g = sorted(tuple(r) for r in got.filter("key <> 9").collect())
    w = sorted(
        tuple(r)
        for r in match_recognize(df, FR_SQL)
        .filter("key <> 9")
        .select(*got.columns)
        .collect()
    )
    assert g == w and len(g) == 9


# ---------------------------------------------------------------------------
# Leading Kleene: PATTERN (A+ -> B) on the kleene-agg kernel
# (trivially-true bind, min_n=0 — the anchor is the +'s first binding)

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

LK_SQL = """
PATTERN ( A+ -> B )
WITHIN 1 HOUR
DEFINE A AS event_type = 'view',
       B AS event_type = 'purchase'
AFTER MATCH SKIP PAST LAST ROW
PARTITION BY user_id
ORDER BY ts
"""

# u1: run of 3 views (noise click ignored) then purchase; u2: single
# view then purchase (the min_n=0 edge); u3: first run dies at the
# deadline (purchase late), the post-deadline view re-anchors
LK_ROWS = [
    (0, 0, 1, "view"), (1, 2, 1, "click"), (2, 4, 1, "view"),
    (3, 6, 1, "view"), (4, 10, 1, "purchase"),
    (5, 0, 2, "view"), (6, 3, 2, "purchase"),
    (7, 0, 3, "view"), (8, 200, 3, "purchase"),
    (9, 220, 3, "view"), (10, 230, 3, "purchase"),
]


def _lk_fixture(spark):
    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, 1.0, "{}")
        for i, m, u, t in LK_ROWS
    ]
    return spark.createDataFrame(data, SCHEMA)


def test_leading_kleene_batch_semantics(spark):
    got = {
        r["key"]: (r["A_count"], r["t_A"].minute, r["t_B"].minute)
        for r in match_recognize(_lk_fixture(spark), LK_SQL).collect()
    }
    assert got == {1: (3, 0, 10), 2: (1, 0, 3), 3: (1, 40, 50)}
    # u3's surviving match re-anchored at minute 220 (3h40m)


def test_leading_kleene_measures(spark):
    out = match_recognize(
        _lk_fixture(spark),
        LK_SQL.replace(
            "AFTER MATCH",
            "MEASURES COUNT(A.*) AS n_a, A.ts AS t_first, B.ts AS t_b,"
            " MATCH_NUMBER() AS mn\nAFTER MATCH",
        ),
    )
    assert out.columns == ["key", "n_a", "t_first", "t_b", "mn"]
    got = {r["key"]: r["n_a"] for r in out.collect()}
    assert got == {1: 3, 2: 1, 3: 1}


def test_leading_kleene_pointed_errors(spark):
    df = _lk_fixture(spark)
    for bad, msg in [
        (LK_SQL.replace("( A+ -> B )", "( A+ )"), "exactly PATTERN"),
        (LK_SQL.replace("( A+ -> B )", "( A+ => B )"), "relaxed ->"),
        (LK_SQL.replace("( A+ -> B )", "( A+ -> B+ )"), "plain step"),
        (
            LK_SQL.replace("AFTER MATCH SKIP PAST LAST ROW\n", ""),
            "SKIP PAST LAST ROW",
        ),
        (
            LK_SQL.replace(
                "AFTER MATCH",
                "MEASURES SUM(A.value) AS s\nAFTER MATCH",
            ),
            "non-one_or_more|no value accumulator",
        ),
    ]:
        with pytest.raises(ValueError, match=msg):
            match_recognize(df, bad)


def test_lk_step_name_prefix_reserved():
    with pytest.raises(ValueError, match="reserved"):
        parse_pattern_sql(
            LK_SQL.replace("A+", "__lk_x+").replace("A AS", "__lk_x AS")
        )


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.sampled_from(["a", "b", "x"])),
        min_size=1,
        max_size=40,
    ),
    st.lists(st.integers(1, 39), max_size=4),
)
@settings(max_examples=150, deadline=None)
def test_leading_kleene_kernel_chunking_invariance(evs, cuts):
    """min_n=0 + trivially-true bind + confirm (the leading-Kleene
    configuration): any chunking with monotone watermarks equals the
    whole-stream scan."""
    from spark_cep_spark.streaming.nfa import advance_kleene_agg

    bind = lambda n, s, v: True  # noqa: E731
    W = 60
    t = 0
    rows = []
    for d, et in evs:
        t += d
        # a+ -> b: anchor and candidate are the SAME predicate
        rows.append([t, 0, et == "a", et == "a", 0, et == "b"])
    _, whole = advance_kleene_agg(
        None, rows, 1 << 62, bind, W, confirm=True, min_n=0
    )
    bounds = sorted({min(c, len(rows)) for c in cuts} | {len(rows)})
    stt, got, prev = None, [], 0
    for b in bounds:
        chunk = rows[prev:b]
        wm = chunk[-1][0] if chunk else (rows[prev - 1][0] if prev else 0)
        stt, part = advance_kleene_agg(
            stt, chunk, wm, bind, W, confirm=True, min_n=0
        )
        got += part
        prev = b
    stt, part = advance_kleene_agg(
        stt, [], 1 << 62, bind, W, confirm=True, min_n=0
    )
    got += part
    assert got == whole
    # every emission carries n >= 0 and the conf timestamp
    for rec in whole:
        assert len(rec) == 4 and rec[1] >= 0


def test_stream_leading_kleene_equals_batch(spark):
    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, 1.0, "{}")
        for i, m, u, t in LK_ROWS
    ]
    df = spark.createDataFrame(data, SCHEMA)
    d = tempfile.mkdtemp()
    # split mid-run for u1 so the run state crosses micro-batches
    chunks = [data[:3], data[3:]] + [
        [(100 + j, T0 + dt.timedelta(minutes=mm), 9, "view", 1.0, "{}")]
        for j, mm in enumerate((600, 1200))
    ]
    for i, ch in enumerate(chunks):
        spark.createDataFrame(ch, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"f{i}"))
        time.sleep(1.05)
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "f*"))
    )
    from spark_cep_spark.streaming import harness

    got = harness.run_available_now(
        match_recognize(sdf, LK_SQL, watermark="0 seconds"), "append"
    )
    g = sorted(tuple(r) for r in got.filter("key <> 9").collect())
    w = sorted(
        tuple(r)
        for r in match_recognize(df, LK_SQL)
        .filter("key <> 9")
        .select(*got.columns)
        .collect()
    )
    assert g == w and len(g) == 3


# ---------------------------------------------------------------------------
# stream_corpus_intake: quality gate -> near-dedup -> window counters


def test_intake_stream_accepted_equals_batch_ordered(spark, sf_dir):
    """Under ordered arrival the streaming intake accepts exactly ONE
    doc per surviving signature — signature set and count equal the
    batch twin. (Within a single micro-batch the winner row is
    engine-arbitrary even under sorted staging, so doc_id-level
    equality is pinned only ACROSS batch boundaries — the
    checkpoint-restart test below does that.)"""
    from spark_cep_spark.operators.llm_pipeline import (
        corpus_intake_flags,
        corpus_intake_stream,
    )
    from spark_cep_spark.operators.llm_dedup import _minhash_signature
    from spark_cep_spark.streaming import harness

    staged = harness.stage_documents_files_sorted(spark, sf_dir, n_files=4)
    stream = harness.documents_stream(spark, staged, max_files_per_trigger=1)
    got = harness.run_available_now(
        corpus_intake_stream(stream, watermark="365 days"), "append"
    )
    batch_acc = corpus_intake_flags(
        spark.read.parquet(staged)
    ).filter("acc")
    g = {r["sig"] for r in got.select("sig").collect()}
    docs = spark.read.parquet(staged)
    w_sigs = _minhash_signature(
        docs.join(batch_acc.select("doc_id"), "doc_id").select(
            "doc_id", "text"
        )
    )
    w = {r["sig"] for r in w_sigs.select("sig").collect()}
    assert g == w and len(g) > 0
    assert got.count() == batch_acc.count()


def test_intake_stream_count_invariant_any_order(spark, sf_dir):
    """Under ARBITRARY arrival order the winner may differ but the
    accepted COUNT and signature set equal the batch twin (the
    stream_dedup_near invariant, composed with the quality gate)."""
    from spark_cep_spark.operators.llm_pipeline import (
        corpus_intake_flags,
        corpus_intake_stream,
    )
    from spark_cep_spark.streaming import harness

    staged = harness.stage_documents_files(spark, sf_dir, n_files=6)
    stream = harness.documents_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        corpus_intake_stream(stream, watermark="365 days"), "append"
    )
    batch_acc = corpus_intake_flags(
        spark.read.parquet(staged)
    ).filter("acc")
    assert got.count() == batch_acc.count() > 0


def test_intake_counters_stream_equals_batch(spark, sf_dir):
    """The dedup-independent counter feed under multi-micro-batch
    AvailableNow equals the batch flags rollup for every closed
    window (sorted staging, zero-delay watermark)."""
    from spark_cep_spark.operators.llm_pipeline import (
        corpus_intake_counters_stream,
        corpus_intake_flags,
    )
    from spark_cep_spark.streaming import harness
    import pyspark.sql.functions as F

    staged = harness.stage_documents_files_sorted(spark, sf_dir, n_files=4)
    stream = harness.documents_stream(spark, staged, max_files_per_trigger=1)
    got = {
        tuple(r)
        for r in harness.run_available_now(
            corpus_intake_counters_stream(stream, watermark="0 seconds"),
            "append",
        ).collect()
    }
    fl = corpus_intake_flags(spark.read.parquet(staged))
    batch = (
        fl.groupBy(F.date_trunc("minute", F.col("ts")).alias("win_start"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_quality_reject"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_quality_pass"),
            F.sum(F.when(F.col("keep"), F.col("n_words")).otherwise(0))
            .cast("long")
            .alias("quality_pass_words"),
        )
    )
    max_ts = spark.read.parquet(staged).agg(F.max("ts")).first()[0]
    want = {
        tuple(r)
        for r in batch.filter(
            F.col("win_start") + F.expr("INTERVAL 1 MINUTE")
            <= F.lit(max_ts)
        ).collect()
    }
    assert want <= got and len(want) > 0
    batch_all = {tuple(r) for r in batch.collect()}
    assert got <= batch_all


def test_intake_counters_consistent_with_registered_key(spark, sf_dir):
    """The registered batch twin's columns decompose: n_quality_pass ==
    n_dup_reject + n_accepted per window, totals match the table."""
    import __spark_entry__ as entry

    rows = entry.queries()["stream_corpus_intake"](spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == 500  # sf0.001 docs
    for r in rows:
        assert r["n_docs"] == r["n_quality_reject"] + r["n_dup_reject"] + r["n_accepted"]
        assert r["accepted_words"] >= 10 * r["n_accepted"]  # gopher min


def test_intake_dedup_state_survives_checkpoint_restart(spark, tmp_path):
    """Kill-and-resume: a signature accepted before the restart must
    still suppress its duplicate arriving AFTER the restart — the
    dropDuplicatesWithinWatermark state is checkpointed, not reset."""
    import os
    import shutil as _shutil

    from spark_cep_spark.operators.llm_pipeline import corpus_intake_stream
    from spark_cep_spark.streaming import harness

    # quality-passing text: >=10 words, mean len in [2,10], >=2 lexicon
    # stopwords ('the', 'data' ... — the corpus-adapted lexicon)
    base = "the data table holds value rows and the row keeps data safe"
    uniq = "a fresh value arrived into the data table as rows grew more"
    docs1 = [(1, base), (2, base + " extra tail words here now")]
    docs2 = [(3, base), (4, uniq)]  # 3 duplicates 1's text => same sig

    src = str(tmp_path / "src")
    os.makedirs(src)

    from pyspark.sql.functions import expr as F_expr

    def stage(docs, fname, mtime):
        df = spark.createDataFrame(
            [
                (i, t, "en", "web", len(t))
                for i, t in docs
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).withColumn(
            "ts", F_expr("timestamp_seconds(1700000000 + doc_id)")
        )
        d = str(tmp_path / fname)
        df.coalesce(1).write.mode("overwrite").parquet(d)
        part = next(p for p in os.listdir(d) if p.endswith(".parquet"))
        dst = os.path.join(src, fname + ".parquet")
        _shutil.copy(os.path.join(d, part), dst)
        os.utime(dst, (mtime,) * 2)

    stage(docs1, "f1", 1_700_000_000)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        stream = harness.documents_stream(
            spark, src, max_files_per_trigger=1
        )
        q = (
            corpus_intake_stream(stream, watermark="365 days")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run()
    first = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert first == {1, 2}
    stage(docs2, "f2", 1_700_003_600)
    run()
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    # 3 (duplicate of 1's signature, post-restart) suppressed; 4 fresh
    assert got == {1, 2, 4}


# ---------------------------------------------------------------------------
# MEASURES composed with PERMUTE (both engines)

PM_SQL = """
PATTERN ( V -> PERMUTE(C, P) )
WITHIN 1 HOUR
DEFINE V AS event_type = 'view',
       C AS event_type = 'click',
       P AS event_type = 'purchase'
MEASURES P.value - V.value AS uplift, C.value AS click_val
PARTITION BY user_id
ORDER BY ts
"""

PM_ROWS = [
    # u1: C then P (C->P wins); u2: P then C (P->C completes earlier)
    (0, 0, 1, "view", 10.0), (1, 5, 1, "click", 3.0),
    (2, 9, 1, "purchase", 20.0),
    (3, 0, 2, "view", 5.0), (4, 2, 2, "purchase", 9.0),
    (5, 6, 2, "click", 1.5),
]


def test_permute_measures_batch_winner_values(spark):
    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, v, "{}")
        for i, m, u, t, v in PM_ROWS
    ]
    out = match_recognize(spark.createDataFrame(data, SCHEMA), PM_SQL)
    got = {
        r["key"]: (r["uplift"], r["click_val"], r["permute_order"])
        for r in out.collect()
    }
    # the winner ORDERING's bound values feed the measures
    assert got == {1: (10.0, 3.0, "C->P"), 2: (4.0, 1.5, "P->C")}


def test_permute_measures_stream_equals_batch(spark):
    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, v, "{}")
        for i, m, u, t, v in PM_ROWS
    ]
    df = spark.createDataFrame(data, SCHEMA)
    d = tempfile.mkdtemp()
    chunks = [data[:3], data[3:]] + [
        [(100 + j, T0 + dt.timedelta(minutes=mm), 9, "view", 1.0, "{}")]
        for j, mm in enumerate((500, 1000))
    ]
    for i, ch in enumerate(chunks):
        spark.createDataFrame(ch, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"f{i}"))
        time.sleep(1.05)
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "f*"))
    )
    from spark_cep_spark.streaming import harness

    got = harness.run_available_now(
        match_recognize(sdf, PM_SQL, watermark="0 seconds"), "append"
    )
    g = sorted(tuple(r) for r in got.filter("key <> 9").collect())
    w = sorted(
        tuple(r)
        for r in match_recognize(df, PM_SQL)
        .filter("key <> 9")
        .select(*got.columns)
        .collect()
    )
    assert g == w and len(g) == 2


# ---------------------------------------------------------------------------
# Two quantified groups: cross-product expansion, leftmost-greedy

TG_SQL = """
PATTERN ( (V -> C){1,2} -> (P){1,2} )
WITHIN 1 HOUR
DEFINE V AS event_type = 'view',
       C AS event_type = 'click',
       P AS event_type = 'purchase'
PARTITION BY user_id
ORDER BY ts
"""

TG_ROWS = [
    # u1: full greedy (2,2); its inner V also anchors a (1,2) match
    (0, 0, 1, "view"), (1, 2, 1, "click"), (2, 4, 1, "view"),
    (3, 6, 1, "click"), (4, 8, 1, "purchase"), (5, 10, 1, "purchase"),
    # u2: (1,1); u3: (1,2); u4: (2,1)
    (6, 0, 2, "view"), (7, 3, 2, "click"), (8, 5, 2, "purchase"),
    (9, 0, 3, "view"), (10, 2, 3, "click"), (11, 4, 3, "purchase"),
    (12, 6, 3, "purchase"),
    (13, 0, 4, "view"), (14, 1, 4, "click"), (15, 2, 4, "view"),
    (16, 3, 4, "click"), (17, 4, 4, "purchase"),
]


def test_two_groups_expansion_order():
    from spark_cep_spark.operators.cep_sql import expand_group_sql

    vs = expand_group_sql(TG_SQL)
    assert [d for d, _ in vs] == [
        "V_r1->C_r1->V_r2->C_r2->P_r1->P_r2",
        "V_r1->C_r1->V_r2->C_r2->P_r1",
        "V_r1->C_r1->P_r1->P_r2",
        "V_r1->C_r1->P_r1",
    ]


def test_two_groups_pointed_errors():
    from spark_cep_spark.operators.cep_sql import expand_group_sql

    with pytest.raises(ValueError, match="more than one quantified"):
        expand_group_sql(
            TG_SQL.replace("(P){1,2}", "(V -> P){1,2}")
        )
    with pytest.raises(ValueError, match="capped at 8"):
        expand_group_sql(
            TG_SQL.replace("{1,2} -> (P){1,2}", "{1,4} -> (P){1,3}")
        )


def test_two_groups_batch_greedy_winners(spark):
    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, 1.0, "{}")
        for i, m, u, t in TG_ROWS
    ]
    out = match_recognize(spark.createDataFrame(data, SCHEMA), TG_SQL)
    got = {
        (r["key"], r["anchor_id"]): r["variant"] for r in out.collect()
    }
    assert got == {
        (1, 0): "V_r1->C_r1->V_r2->C_r2->P_r1->P_r2",
        (1, 2): "V_r1->C_r1->P_r1->P_r2",
        (2, 6): "V_r1->C_r1->P_r1",
        (3, 9): "V_r1->C_r1->P_r1->P_r2",
        (4, 13): "V_r1->C_r1->V_r2->C_r2->P_r1",
        (4, 15): "V_r1->C_r1->P_r1",
    }


def test_two_groups_stream_equals_batch(spark):
    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, 1.0, "{}")
        for i, m, u, t in TG_ROWS
    ]
    df = spark.createDataFrame(data, SCHEMA)
    d = tempfile.mkdtemp()
    chunks = [data[:9], data[9:]] + [
        [(100 + j, T0 + dt.timedelta(minutes=mm), 9, "view", 1.0, "{}")]
        for j, mm in enumerate((500, 1000))
    ]
    for i, ch in enumerate(chunks):
        spark.createDataFrame(ch, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"f{i}"))
        time.sleep(1.05)
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "f*"))
    )
    from spark_cep_spark.streaming import harness

    got = harness.run_available_now(
        match_recognize(sdf, TG_SQL, watermark="0 seconds"), "append"
    )
    g = sorted(tuple(r) for r in got.filter("key <> 9").collect())
    w = sorted(
        tuple(r)
        for r in match_recognize(df, TG_SQL)
        .filter("key <> 9")
        .select(*got.columns)
        .collect()
    )
    assert g == w and len(g) == 6


# ---------------------------------------------------------------------------
# decay_scores segment-vectorized fast path == the per-row loop

@given(
    st.lists(
        st.tuples(
            st.integers(0, 7_300_000_000),  # gap us (spans the 1h edge)
            st.integers(1, 10**11),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(max_examples=300, deadline=None)
def test_decay_fast_path_equals_loop(evs):
    from spark_cep_spark.operators.windows import (
        _decay_scores_loop,
        decay_scores,
    )

    t = 0
    tus, cents = [], []
    for gap, c in evs:
        t += gap
        tus.append(t)
        cents.append(c)
    assert decay_scores(tus, cents) == _decay_scores_loop(tus, cents)


def test_decay_fast_path_overflow_falls_back_exactly():
    from spark_cep_spark.operators.windows import (
        _decay_scores_loop,
        decay_scores,
    )

    # a same-hour burst whose running sum crosses the 2^62 guard —
    # the fast path must hand the WHOLE frame to the loop, not wrap
    big = (1 << 61)
    tus = [0, 1, 2, 3]
    cents = [big, big, big, big]
    got = decay_scores(tus, cents)
    want = _decay_scores_loop(tus, cents)
    assert got == want and want[-1] == 4 * big


def test_decay_dense_burst_and_all_gaps():
    from spark_cep_spark.operators.windows import (
        _decay_scores_loop,
        decay_scores,
    )

    h = 3_600_000_000
    # all rows in one burst (single segment) and all rows gapped
    # (every row its own segment) — the two structural extremes
    for tus in ([0, 1, 2, 3, 4], [0, h, 2 * h, 3 * h, 5 * h]):
        cents = [7, 11, 13, 17, 19]
        assert decay_scores(tus, cents) == _decay_scores_loop(tus, cents)


# ---------------------------------------------------------------------------
# Leading Kleene ALL ROWS PER MATCH face

LKR_SQL = """
PATTERN ( A+ -> B )
WITHIN 1 HOUR
DEFINE A AS event_type = 'view',
       B AS event_type = 'purchase'
MEASURES COUNT(A.*) AS n_so_far,
         FINAL COUNT(A.*) AS n_total,
         CLASSIFIER() AS cls,
         A.ts AS t_first, B.ts AS t_b,
         MATCH_NUMBER() AS mn
ALL ROWS PER MATCH
AFTER MATCH SKIP PAST LAST ROW
PARTITION BY user_id
ORDER BY ts
"""


def test_leading_kleene_all_rows_batch(spark):
    out = match_recognize(_lk_fixture(spark), LKR_SQL).collect()
    by = {(r["key"], r["event_id"]): r for r in out}
    # u1: 3 A rows (noise click not bound) + the B row
    assert [(by[(1, i)]["cls"], by[(1, i)]["n_so_far"]) for i in (0, 2, 3)] == [
        ("A", 1), ("A", 2), ("A", 3)
    ]
    assert by[(1, 4)]["cls"] == "B" and by[(1, 4)]["n_so_far"] == 3
    assert all(by[(1, i)]["n_total"] == 3 for i in (0, 2, 3, 4))
    # u2: single-A match — anchor row counts 1 (anchor-inclusive)
    assert by[(2, 5)]["n_so_far"] == 1 and by[(2, 6)]["cls"] == "B"
    # u3: only the re-anchored match emits; internal step never leaks
    assert {r["cls"] for r in out} == {"A", "B"}
    assert all(r["mn"] == 1 for r in out)


def test_leading_kleene_all_rows_default_output(spark):
    out = match_recognize(
        _lk_fixture(spark),
        LK_SQL + "ALL ROWS PER MATCH\n",
    )
    assert "A_count" in out.columns  # anchor-inclusive running count
    got = {
        (r["key"], r["event_id"]): r["A_count"] for r in out.collect()
    }
    assert got[(1, 0)] == 1 and got[(1, 3)] == 3 and got[(1, 4)] == 3


def test_leading_kleene_exclusion_rejected(spark):
    with pytest.raises(ValueError, match="exclusion is not supported"):
        match_recognize(
            _lk_fixture(spark),
            LKR_SQL.replace("( A+ -> B )", "( {- A+ -} -> B )"),
        )


def test_leading_kleene_all_rows_stream_equals_batch(spark):
    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, 1.0, "{}")
        for i, m, u, t in LK_ROWS
    ]
    df = spark.createDataFrame(data, SCHEMA)
    d = tempfile.mkdtemp()
    chunks = [data[:3], data[3:]] + [
        [(100 + j, T0 + dt.timedelta(minutes=mm), 9, "view", 1.0, "{}")]
        for j, mm in enumerate((600, 1200))
    ]
    for i, ch in enumerate(chunks):
        spark.createDataFrame(ch, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"f{i}"))
        time.sleep(1.05)
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "f*"))
    )
    from spark_cep_spark.streaming import harness

    got = harness.run_available_now(
        match_recognize(sdf, LKR_SQL, watermark="0 seconds"), "append"
    )
    g = sorted(tuple(r) for r in got.filter("key <> 9").collect())
    w = sorted(
        tuple(r)
        for r in match_recognize(df, LKR_SQL)
        .filter("key <> 9")
        .select(*got.columns)
        .collect()
    )
    assert g == w and len(g) > 0


# ---------------------------------------------------------------------------
# Round-10 review-pass fixes

def test_prefix_on_per_match_functions_rejected():
    with pytest.raises(ValueError, match="not applicable to MATCH_NUMBER"):
        parse_pattern_sql(
            FR_SQL.replace(
                "RUNNING SUM(value) AS run_sum",
                "FINAL MATCH_NUMBER() AS run_sum",
            )
        )
    with pytest.raises(ValueError, match="not applicable to CLASSIFIER"):
        parse_pattern_sql(
            FR_SQL.replace(
                "RUNNING SUM(value) AS run_sum",
                "RUNNING CLASSIFIER() AS run_sum",
            )
        )


def test_permute_measure_alias_collisions_pointed(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError, match="permute_order"):
        match_recognize(
            df, PM_SQL.replace("AS uplift", "AS permute_order")
        )
    with pytest.raises(ValueError, match="reserved here"):
        match_recognize(df, PM_SQL.replace("AS uplift", "AS _rk"))


def test_leading_kleene_terminal_agg_never_leaks_internal_name():
    with pytest.raises(ValueError) as ei:
        parse_pattern_sql(
            LK_SQL.replace(
                "AFTER MATCH",
                "MEASURES SUM(B.value) AS s\nAFTER MATCH",
            )
        )
    assert "__lk_" not in str(ei.value)


def test_decay_fast_path_negative_overflow_falls_back():
    from spark_cep_spark.operators.windows import (
        _decay_scores_loop,
        decay_scores,
    )

    big = -(1 << 61)
    tus = [0, 1, 2, 3, 4]
    cents = [big] * 5
    got = decay_scores(tus, cents)
    want = _decay_scores_loop(tus, cents)
    assert got == want and want[-1] == 5 * big


@given(
    st.lists(
        st.tuples(
            st.integers(0, 7_300_000_000),
            st.integers(-(10**11), 10**11),
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=150, deadline=None)
def test_decay_fast_path_equals_loop_signed(evs):
    from spark_cep_spark.operators.windows import (
        _decay_scores_loop,
        decay_scores,
    )

    t = 0
    tus, cents = [], []
    for gap, c in evs:
        t += gap
        tus.append(t)
        cents.append(c)
    assert decay_scores(tus, cents) == _decay_scores_loop(tus, cents)


def test_intake_stream_plans_have_no_stream_stream_join(spark, sf_dir):
    """The quality gate must stay a projection on the stream — a
    self-join would hold unbounded state 24/7 (review catch)."""
    from spark_cep_spark.operators.llm_pipeline import (
        corpus_intake_counters_stream,
        corpus_intake_stream,
    )
    from spark_cep_spark.streaming import harness

    staged = harness.stage_documents_files(spark, sf_dir, n_files=2)
    stream = harness.documents_stream(spark, staged, max_files_per_trigger=2)
    for face in (corpus_intake_stream, corpus_intake_counters_stream):
        plan = face(stream)._jdf.queryExecution().analyzed().toString()
        assert "Join" not in plan, plan


# ---------------------------------------------------------------------------
# Multi-query pattern pack: mode='all' (every rule emits, own bounds)


def _mp_rules():
    from spark_cep_spark.operators.cep import Pattern

    return [
        (
            "funnel",
            Pattern.begin("view", "event_type = 'view'")
            .followed_by("click", "event_type = 'click'")
            .followed_by("purchase", "event_type = 'purchase'")
            .within("1 HOURS"),
        ),
        (
            "churn_risk",
            Pattern.begin("signup", "event_type = 'signup'")
            .followed_by("error", "event_type = 'error'")
            .within("1 HOURS"),
        ),
        (
            "quick_buy",
            Pattern.begin("view", "event_type = 'view'")
            .followed_by("purchase", "event_type = 'purchase'")
            .within("2 HOURS"),  # rules keep their OWN bounds
        ),
    ]


MP_ROWS = [
    (0, 0, 1, "view"), (1, 5, 1, "click"), (2, 9, 1, "purchase"),
    (3, 0, 2, "signup"), (4, 30, 2, "error"),
    # u3: purchase at 90min — only the 2h quick_buy rule fires
    (5, 0, 3, "view"), (6, 90, 3, "purchase"),
]


def test_multi_pattern_batch_all_rules_fire(spark):
    from spark_cep_spark.operators.cep import match_all_patterns

    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, 1.0, "{}")
        for i, m, u, t in MP_ROWS
    ]
    out = match_all_patterns(
        spark.createDataFrame(data, SCHEMA), _mp_rules()
    )
    got = {
        (r["key"], r["pattern_name"]) for r in out.collect()
    }
    # u1 fires BOTH view rules (independent — no winner pick) + u2
    # churn + u3 only the longer-bound rule
    assert got == {
        (1, "funnel"), (1, "quick_buy"), (2, "churn_risk"),
        (3, "quick_buy"),
    }
    # a rule emits NULL for steps it does not declare
    row = {r["pattern_name"]: r for r in out.filter("key = 2").collect()}
    assert row["churn_risk"]["t_view"] is None
    assert row["churn_risk"]["t_error"] is not None


def test_multi_pattern_duplicate_names_rejected(spark):
    from spark_cep_spark.operators.cep import match_all_patterns

    rules = _mp_rules()
    rules.append(rules[0])
    with pytest.raises(ValueError, match="unique"):
        match_all_patterns(spark.createDataFrame([], SCHEMA), rules)


def test_multi_pattern_stream_equals_batch(spark):
    from spark_cep_spark.operators.cep import match_all_patterns

    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, 1.0, "{}")
        for i, m, u, t in MP_ROWS
    ]
    df = spark.createDataFrame(data, SCHEMA)
    d = tempfile.mkdtemp()
    chunks = [data[:3], data[3:]] + [
        [(100 + j, T0 + dt.timedelta(minutes=mm), 9, "view", 1.0, "{}")]
        for j, mm in enumerate((600, 1200))
    ]
    for i, ch in enumerate(chunks):
        spark.createDataFrame(ch, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"f{i}"))
        time.sleep(1.05)
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "f*"))
    )
    from spark_cep_spark.streaming import harness

    got = harness.run_available_now(
        match_all_patterns(sdf, _mp_rules(), watermark="0 seconds"),
        "append",
    )
    # NULL-padded timestamp columns: sort by repr (None < datetime
    # comparisons are not defined)
    g = sorted(
        (tuple(r) for r in got.filter("key <> 9").collect()), key=repr
    )
    w = sorted(
        (
            tuple(r)
            for r in match_all_patterns(df, _mp_rules())
            .filter("key <> 9")
            .select(*got.columns)
            .collect()
        ),
        key=repr,
    )
    assert g == w and len(g) == 4


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.sampled_from("vcpsx")),
        min_size=1,
        max_size=30,
    ),
    st.lists(st.integers(1, 29), max_size=3),
)
@settings(max_examples=150, deadline=None)
def test_advance_variants_mode_all_chunking_invariance(evs, cuts):
    """mode='all' must be chunking-invariant like the winner modes —
    every rule's matches, each exactly once, under any micro-batch
    split (rules with DIFFERENT bounds)."""
    from spark_cep_spark.streaming.nfa import advance_variants

    # two rules over flag slices: r1 = v->p within 50, r2 = s->x
    # within 25; flags vector = [is_v, is_p, is_s, is_x]
    specs = [
        {
            "off": 0, "n": 2, "contig": ["relaxed", "relaxed"],
            "gaps": None, "corr": None, "env_names": None,
            "run_cols": None, "emit_env": False, "bound_us": 50,
            "row": lambda b, env: {"td": b[-1][0], "_td": b[-1][0],
                                   "r": 1},
        },
        {
            "off": 2, "n": 2, "contig": ["relaxed", "relaxed"],
            "gaps": None, "corr": None, "env_names": None,
            "run_cols": None, "emit_env": False, "bound_us": 25,
            "row": lambda b, env: {"td": b[-1][0], "_td": b[-1][0],
                                   "r": 2},
        },
    ]
    t = 0
    rows = []
    for i, (d, et) in enumerate(evs):
        t += d
        flags = [et == "v", et == "p", et == "s", et == "x"]
        rows.append([t, i, flags])

    def run(chunks):
        pv, pend, done, out = [[], []], [], [], []
        prev_wm = 0
        for ch, wm in chunks:
            pv, pend, done, part = advance_variants(
                pv, pend, done, ch, wm, specs, 50, "all"
            )
            out += part
        return sorted((eid, r["r"], r["td"]) for eid, r in out)

    whole = run([(rows, 1 << 62)])
    bounds = sorted({min(c, len(rows)) for c in cuts} | {len(rows)})
    chunks, prev = [], 0
    for b in bounds:
        ch = rows[prev:b]
        wm = ch[-1][0] if ch else (rows[prev - 1][0] if prev else 0)
        chunks.append((ch, wm))
        prev = b
    chunks.append(([], 1 << 62))
    assert run(chunks) == whole


# ---------------------------------------------------------------------------
# SQL-text face of the rule pack


def test_match_recognize_all_text_face(spark):
    from spark_cep_spark.operators.cep_sql import match_recognize_all

    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, 1.0, "{}")
        for i, m, u, t in MP_ROWS
    ]
    out = match_recognize_all(
        spark.createDataFrame(data, SCHEMA),
        [
            (
                "funnel",
                """
                PATTERN ( view -> click -> purchase )
                WITHIN 1 HOUR
                DEFINE view AS event_type = 'view',
                       click AS event_type = 'click',
                       purchase AS event_type = 'purchase'
                PARTITION BY user_id
                ORDER BY ts
                """,
            ),
            (
                "quick_buy",
                """
                PATTERN ( view -> purchase )
                WITHIN 2 HOURS
                DEFINE view AS event_type = 'view',
                       purchase AS event_type = 'purchase'
                PARTITION BY user_id
                ORDER BY ts
                """,
            ),
        ],
    )
    got = {(r["key"], r["pattern_name"]) for r in out.collect()}
    assert got == {(1, "funnel"), (1, "quick_buy"), (3, "quick_buy")}


def test_match_recognize_all_pointed_errors(spark):
    from spark_cep_spark.operators.cep_sql import match_recognize_all

    df = spark.createDataFrame([], SCHEMA)
    base = (
        "r1",
        """
        PATTERN ( v -> p )
        WITHIN 1 HOUR
        DEFINE v AS event_type = 'view', p AS event_type = 'purchase'
        PARTITION BY user_id
        ORDER BY ts
        """,
    )
    bad = base[1].replace(
        "PARTITION BY user_id", "MEASURES p.value AS pv\nPARTITION BY user_id"
    )
    with pytest.raises(ValueError, match="MEASURES is not supported inside"):
        match_recognize_all(df, [base, ("r2", bad)])
    with pytest.raises(ValueError, match="disagree on PARTITION"):
        match_recognize_all(
            df,
            [base, ("r2", base[1].replace("BY user_id", "BY event_id"))],
        )
