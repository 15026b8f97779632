"""Round-7 regression tests.

Covers the round-6 verdict's action items:
  1. win_rolling_corr signed-zero normalization (the one red row in
     CORRECTNESS_r06 — DuckDB's round(c,4) emitted -0.0 where Spark
     emitted +0.0; bit-level driver hash diverged).
  2. tools/check_oracle.values_equal bit-exact zero compare, so this
     defect class fails locally instead of in a driver round.
"""

import math


def test_values_equal_distinguishes_signed_zero():
    """The driver's value-hash is bit-level: -0.0 != +0.0. The local
    gate must agree (STANDING ORACLE RULE 4, registry.py)."""
    from tools.check_oracle import values_equal

    assert values_equal(0.0, 0.0)
    assert values_equal(-0.0, -0.0)
    assert not values_equal(-0.0, 0.0)
    assert not values_equal(0.0, -0.0)
    # nested containers recurse
    assert not values_equal((1, -0.0), (1, 0.0))
    # tolerance mode still treats them as equal (fuzzy gate unaffected)
    assert values_equal(-0.0, 0.0, tol=1e-9)


def test_rolling_corr_emits_no_negative_zero(spark, sf_dir):
    """Both the Spark face and the DuckDB oracle of win_rolling_corr
    normalize signed zero (round(c,4) + 0.0): no emitted trend_corr may
    carry a negative sign bit at zero, on either engine."""
    import duckdb

    from spark_cep_spark.registry import ORACLES, QUERIES, load_all

    load_all()
    rows = QUERIES["win_rolling_corr"](spark, sf_dir).collect()
    assert rows, "fixture produced no full 30-row frames"
    for r in rows:
        v = r["trend_corr"]
        if v is not None and v == 0.0:
            assert math.copysign(1.0, v) == 1.0, "Spark emitted -0.0"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    oracle_rows = con.execute(ORACLES["win_rolling_corr"]).fetchall()
    assert len(oracle_rows) == len(rows)
    for row in oracle_rows:
        v = row[3]
        if v is not None and v == 0.0:
            assert math.copysign(1.0, v) == 1.0, "oracle emitted -0.0"
    con.close()


def test_trendcorr_kernel_normalizes_signed_zero():
    """The streaming kernel face must fold -0.0 the same way as the
    batch face, else streaming==batch breaks at the bit level."""
    from spark_cep_spark.streaming.nfa import advance_trendcorr

    # With x = [0,1,2]ms the corr sign is sign(y3 - y1); a tiny negative
    # y3-y1 against a large middle spread gives corr ≈ -8.7e-13, which
    # round(·,4) turns into -0.0 absent normalization (verified: the
    # un-normalized kernel emits copysign -1.0 on this exact fixture).
    rows = [
        [0, 0, 0.0],
        [1_000_000, 1, 1000.0],
        [2_000_000, 2, -1e-9],
    ]
    _, alerts = advance_trendcorr([], rows, window=3)
    assert len(alerts) == 1, "expected exactly one full-window emission"
    c = alerts[0][2]
    assert c == 0.0
    assert math.copysign(1.0, c) == 1.0, "kernel emitted -0.0"


# ---------------------------------------------------------------------------
# Running-aggregate DEFINE in the MATCH_RECOGNIZE dialect (verdict item 4):
# DEFINE B AS ... AND B.col <= k * AVG(B.col) on a Kleene step compiles to
# the shared advance_kleene_agg kernel on both engines (cep_sql_run_agg).
# ---------------------------------------------------------------------------

_RA_TEXT = """
    PATTERN ( A -> B+ )
    WITHIN 7 DAYS
    DEFINE A AS event_type = 'signup',
           B AS event_type = 'view' AND B.cents <= 1.5 * AVG(B.cents)
    AFTER MATCH SKIP PAST LAST ROW
    PARTITION BY user_id
    ORDER BY ts
"""


def test_run_agg_spec_parsing_forms():
    from spark_cep_spark.operators.cep_sql import (
        RunAggSpec,
        _parse_run_agg_conjunct,
    )

    s = _parse_run_agg_conjunct("B.cents <= 1.5 * AVG(B.cents)", "B")
    assert s == RunAggSpec("cur_vs_avg", "cents", "<=", 3, 2)
    s = _parse_run_agg_conjunct("B.v > SUM(B.v) * 0.25", "B")
    assert s == RunAggSpec("cur_vs_sum", "v", ">", 1, 4)
    s = _parse_run_agg_conjunct("sum(B.v) <= 100", "B")
    assert s == RunAggSpec("sum_cap", "v", "<=", 100, 1)
    s = _parse_run_agg_conjunct("COUNT(B.*) < 4", "B")
    assert s == RunAggSpec("count_cap", None, "<", 4, 1)
    s = _parse_run_agg_conjunct("count(*) <= 2.5", "B")
    assert s == RunAggSpec("count_cap", None, "<=", 5, 2)
    # not aggregate-shaped: plain correlation falls through as None
    assert _parse_run_agg_conjunct("B.v > A.v", "B") is None


def test_run_agg_spec_pointed_errors():
    import pytest

    from spark_cep_spark.operators.cep_sql import _parse_run_agg_conjunct

    with pytest.raises(ValueError, match="own variable"):
        _parse_run_agg_conjunct("B.v <= 1.5 * AVG(A.v)", "B")
    with pytest.raises(ValueError, match="must match"):
        _parse_run_agg_conjunct("B.v <= 1.5 * AVG(B.w)", "B")
    with pytest.raises(ValueError, match="one side"):
        _parse_run_agg_conjunct("B.v <= 2 * AVG(B.v) * 2", "B")
    with pytest.raises(ValueError, match="SUM needs a column"):
        _parse_run_agg_conjunct("SUM(B.*) <= 9", "B")
    with pytest.raises(ValueError, match="not of a supported form"):
        _parse_run_agg_conjunct("MAX(B.v) <= 9", "B")


def test_run_agg_dialect_pointed_errors():
    import pytest

    from spark_cep_spark.operators.cep_sql import parse_pattern_sql

    base = """
        PATTERN ( A -> B+ )
        WITHIN 7 DAYS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'view' AND B.cents <= 1.5 * AVG(B.cents)
        {extra}
        PARTITION BY user_id
        ORDER BY ts
    """
    # the explicit PAST LAST ROW spelling is required (the kernel's
    # single-scan runs never overlap)
    with pytest.raises(ValueError, match="PAST LAST ROW"):
        parse_pattern_sql(base.format(extra=""))
    with pytest.raises(ValueError, match="PAST LAST ROW"):
        parse_pattern_sql(
            base.format(extra="AFTER MATCH SKIP TO LAST B")
        )
    with pytest.raises(ValueError, match="MEASURES is not supported"):
        parse_pattern_sql(
            base.format(
                extra="AFTER MATCH SKIP PAST LAST ROW "
                "MEASURES count(B.cents) AS n"
            )
        )
    # a three-step pattern cannot take the aggregate DEFINE
    with pytest.raises(ValueError, match="exactly"):
        parse_pattern_sql("""
            PATTERN ( A -> B+ -> C )
            WITHIN 7 DAYS
            DEFINE A AS event_type = 'signup',
                   B AS event_type = 'view'
                        AND B.cents <= 1.5 * AVG(B.cents),
                   C AS event_type = 'purchase'
            AFTER MATCH SKIP PAST LAST ROW
        """)
    # aggregate + other correlation on the same kleene step
    with pytest.raises(ValueError, match="correlation is not supported"):
        parse_pattern_sql("""
            PATTERN ( A -> B+ )
            WITHIN 7 DAYS
            DEFINE A AS event_type = 'signup',
                   B AS B.cents <= 1.5 * AVG(B.cents) AND B.cents > A.cents
            AFTER MATCH SKIP PAST LAST ROW
        """)
    # braced quantifier keeps the general rejection
    with pytest.raises(ValueError, match="correlation is not supported"):
        parse_pattern_sql("""
            PATTERN ( A -> B{3} )
            WITHIN 7 DAYS
            DEFINE A AS event_type = 'signup',
                   B AS B.cents <= 1.5 * AVG(B.cents)
            AFTER MATCH SKIP PAST LAST ROW
        """)


def test_cep_sql_run_agg_equals_standalone(spark, sf_dir):
    """One text, one kernel: the dialect compilation must reproduce the
    standalone cep_run_agg operator row-for-row."""
    from spark_cep_spark import registry

    registry.load_all()
    via_sql = {
        tuple(r)
        for r in registry.QUERIES["cep_sql_run_agg"](spark, sf_dir).collect()
    }
    standalone = {
        tuple(r)
        for r in registry.QUERIES["cep_run_agg"](spark, sf_dir).collect()
    }
    assert via_sql == standalone and len(via_sql) > 0


def test_run_agg_generic_forms_small_fixture(spark):
    """sum_cap and count_cap semantics on a hand-computed fixture:
    anchor 'a' opens, candidates 'c' bind while the RUNNING aggregate
    (current row included) satisfies the cap; the failing row closes
    and is consumed."""
    import datetime as ddt

    from spark_cep_spark.operators.cep_sql import match_recognize

    t0 = ddt.datetime(2026, 1, 1)
    rows = [
        # (event_id, ts, user_id, event_type, v)
        (1, t0, 1, "a", 0),
        (2, t0 + ddt.timedelta(minutes=1), 1, "c", 60),
        (3, t0 + ddt.timedelta(minutes=2), 1, "c", 30),
        (4, t0 + ddt.timedelta(minutes=3), 1, "c", 20),  # sum 110 > 100
        (5, t0 + ddt.timedelta(minutes=4), 1, "a", 0),
        (6, t0 + ddt.timedelta(minutes=5), 1, "c", 100),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, v long",
    )
    out = match_recognize(
        df,
        """
        PATTERN ( A -> B+ )
        WITHIN 1 HOURS
        DEFINE A AS event_type = 'a',
               B AS event_type = 'c' AND SUM(B.v) <= 100
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    ).collect()
    got = {(r["key"], r["t_A"], r["B_count"], r["B_sum_v"]) for r in out}
    # run 1: binds 60+30 (90), v=20 would reach 110 -> close, consumed;
    # run 2: binds 100 exactly at the cap, closes at partition end
    assert got == {
        (1, t0, 2, 90),
        (1, t0 + ddt.timedelta(minutes=4), 1, 100),
    }

    out2 = match_recognize(
        df,
        """
        PATTERN ( A -> B+ )
        WITHIN 1 HOURS
        DEFINE A AS event_type = 'a',
               B AS event_type = 'c' AND COUNT(B.*) <= 2
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    ).collect()
    got2 = {(r["key"], r["t_A"], r["B_count"]) for r in out2}
    # run 1: first two candidates bind, the third (n+1=3 > 2) closes;
    # run 2: one candidate, closes at partition end
    assert got2 == {
        (1, t0, 2),
        (1, t0 + ddt.timedelta(minutes=4), 1),
    }


def test_cep_sql_run_agg_streaming_equals_batch(spark, sf_dir):
    """The SAME MATCH_RECOGNIZE text on a streaming input (multi-
    micro-batch AvailableNow) emits exactly the batch rows — the
    dialect's DEFINE-aggregate promise on both engines."""
    import datetime as ddt
    import glob
    import os

    from spark_cep_spark.operators.cep_sql import match_recognize
    from spark_cep_spark.streaming import harness

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

    def prep(df):
        return (
            df.filter(
                "user_id IS NOT NULL AND ts IS NOT NULL "
                "AND (value IS NULL OR abs(value) <= 1e9)"
            )
            .selectExpr(
                "user_id",
                "ts",
                "event_id",
                "event_type",
                "CAST(round(value * 100) AS LONG) AS cents",
            )
        )

    stream = prep(harness.events_stream(spark, staged, max_files_per_trigger=2))
    got = {
        tuple(r)
        for r in harness.run_available_now(
            match_recognize(stream, _RA_TEXT, watermark="0 seconds"),
            "append",
        )
        .filter("key <> -1")
        .collect()
    }
    batch = prep(spark.read.parquet(staged)).filter("user_id <> -1")
    want = {tuple(r) for r in match_recognize(batch, _RA_TEXT).collect()}
    assert got == want and len(want) > 0


def test_dynamic_rules_replayed_epoch_is_idempotent(spark, sf_dir, tmp_path):
    """Round-6 ADVICE (medium): a manual parquet write inside
    foreachBatch is outside the file-sink transaction log, so a
    replayed micro-batch must not double its alerts. Re-running the
    SAME source from a FRESH checkpoint replays every epoch with the
    same epoch_ids — the dynamic epoch_id-partition overwrite must
    leave the alert set unchanged (the old blind append doubled it)."""
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.windows import dynamic_rules_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=4)
    rules_path = str(tmp_path / "rules")
    out = str(tmp_path / "alerts")
    spark.createDataFrame(
        [(1, "purchase", 90.0)],
        "rule_id long, event_type string, threshold double",
    ).coalesce(1).write.mode("overwrite").parquet(rules_path)

    def run(ckpt):
        stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
        q = dynamic_rules_stream(stream, rules_path, out, str(tmp_path / ckpt))
        q.awaitTermination(180)

    run("ckpt1")
    first = sorted(
        (r["event_id"], r["rule_id"], r["epoch_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert len(first) > 0
    assert len({e for _, _, e in first}) > 1, "want multiple epochs"
    run("ckpt2")  # fresh checkpoint == full replay of the same epochs
    second = sorted(
        (r["event_id"], r["rule_id"], r["epoch_id"])
        for r in spark.read.parquet(out).collect()
    )
    assert second == first


def test_streaming_face_accepts_string_key(spark, sf_dir):
    """Round-6 ADVICE (low): the round-6 streaming faces hard-coded the
    output key as LongType while accepting an arbitrary key_col. The
    schema is now derived from the input — a string PARTITION BY key
    (here event_type) must flow through unchanged."""
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import ewma_stream

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=4)
    out = harness.run_available_now(
        ewma_stream(
            harness.events_stream(spark, staged, max_files_per_trigger=2),
            key_col="event_type",
            watermark="0 seconds",
        ),
        "append",
    )
    assert out.schema["key"].dataType.simpleString() == "string"
    rows = out.limit(5).collect()
    assert rows and all(isinstance(r["key"], str) for r in rows)


def test_qualify_rewrite_ignores_comments(spark, sf_dir):
    """Round-6 ADVICE (low): 'qualify'/'order'/'limit' inside -- or
    /* */ comments must not trigger or misplace the QUALIFY rewrite."""
    import pytest

    from spark_cep_spark.io import load_tables
    from spark_cep_spark.sql import _top_level_keyword, sql_with_qualify

    assert _top_level_keyword("select 1 -- qualify here\n", "qualify") == []
    assert _top_level_keyword("select 1 /* limit 5 */", "limit") == []
    assert _top_level_keyword("select 1 -- x\nqualify r = 1", "qualify") == [
        len("select 1 -- x\n")
    ]
    with pytest.raises(ValueError, match="unterminated"):
        _top_level_keyword("select 1 /* oops", "qualify")

    load_tables(spark, sf_dir, register_views=True)
    out = sql_with_qualify(
        spark,
        """
        -- pick each region's first nation; a stray qualify in this
        -- comment must not split the statement
        SELECT n_regionkey,
               n_name,
               row_number() OVER (PARTITION BY n_regionkey
                                  ORDER BY n_name) AS rk
        FROM nation
        QUALIFY rk = 1 /* and not this limit 99 either */
        ORDER BY n_regionkey
        """,
    ).collect()
    assert [r["rk"] for r in out] == [1] * len(out) and len(out) == 5
