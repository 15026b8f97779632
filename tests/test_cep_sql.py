"""SQL-text CEP surface (cep_sql.py): parser units, equivalence with
the Pattern builder on both engines, and rejection of every malformed
shape — a text surface that misparses silently produces silently wrong
matches, so the error paths are product behavior."""

from __future__ import annotations

import pytest

from spark_cep_spark.io import table
from spark_cep_spark.operators.cep import Pattern
from spark_cep_spark.operators.cep_sql import match_recognize, parse_pattern_sql
from spark_cep_spark.streaming import harness
from spark_cep_spark.streaming.nfa import compile_stream

FUNNEL_SQL = """
PATTERN ( V -> C -> P )
WITHIN 24 HOURS
DEFINE V AS event_type = 'view',
       C AS event_type = 'click',
       P AS event_type = 'purchase'
PARTITION BY user_id
ORDER BY ts
"""


def test_parse_funnel_roundtrip():
    parsed = parse_pattern_sql(FUNNEL_SQL)
    assert [s.name for s in parsed.pattern.steps] == ["V", "C", "P"]
    assert [s.contiguity for s in parsed.pattern.steps] == ["relaxed"] * 3
    assert parsed.pattern.time_bound == "24 HOURS"
    assert (parsed.key_col, parsed.time_col) == ("user_id", "ts")


def test_parse_connectors_and_negation():
    parsed = parse_pattern_sql(
        """
        PATTERN ( A => B -> !C )
        WITHIN 1 HOUR
        DEFINE A AS event_type = 'error',
               B AS value > 50,
               C AS event_type = 'view'
        """
    )
    assert [s.contiguity for s in parsed.pattern.steps] == [
        "relaxed",
        "strict",
        "absent",
    ]
    # defaults when PARTITION BY / ORDER BY omitted
    assert (parsed.key_col, parsed.time_col) == ("user_id", "ts")


def test_literals_do_not_break_parsing():
    """Commas and clause keywords inside string literals are content,
    not delimiters."""
    parsed = parse_pattern_sql(
        """
        PATTERN ( A -> B )
        WITHIN 1 HOUR
        DEFINE A AS event_type = 'DEFINE, WITHIN',
               B AS event_type IN ('a,b', 'PATTERN')
        """
    )
    assert parsed.pattern.steps[0].predicate == "event_type = 'DEFINE, WITHIN'"
    assert parsed.pattern.steps[1].predicate == "event_type IN ('a,b', 'PATTERN')"


@pytest.mark.parametrize(
    "bad, msg",
    [
        ("WITHIN 1 HOUR DEFINE A AS x = 1", "missing PATTERN"),
        ("PATTERN (A) DEFINE A AS x = 1", "missing WITHIN"),
        ("PATTERN (A) WITHIN 1 HOUR", "missing DEFINE"),
        (
            "PATTERN (A -> B) WITHIN 1h DEFINE A AS x = 1",
            "step B has no DEFINE entry",
        ),
        (
            "PATTERN (A) WITHIN 1h DEFINE A AS x = 1, B AS y = 2",
            "never used",
        ),
        (
            "PATTERN (!A -> B) WITHIN 1h DEFINE A AS x = 1, B AS y = 2",
            "cannot start with a negated step",
        ),
        (
            "PATTERN (A => !B) WITHIN 1h DEFINE A AS x = 1, B AS y = 2",
            "strict negation",
        ),
        (
            "PATTERN (A -> !B -> C) WITHIN 1h "
            "DEFINE A AS x = 1, B AS y = 2, C AS z = 3",
            "must be the last step",
        ),
        (
            "PATTERN (A -> A) WITHIN 1h DEFINE A AS x = 1",
            "appears twice",
        ),
        (
            "PATTERN (A B) WITHIN 1h DEFINE A AS x = 1, B AS y = 2",
            "bad pattern token|alternate",
        ),
        (
            "PATTERN (A -> B) WITHIN 1h DEFINE A AS x = 1, B AS y = 2 "
            "PARTITION BY a.b",
            "must name a column",
        ),
        ("SELECT 1", "no CEP clauses|unexpected text"),
    ],
)
def test_malformed_patterns_rejected(bad, msg):
    with pytest.raises(ValueError, match=msg):
        parse_pattern_sql(bad)


def test_batch_equals_builder(spark, sf_dir):
    """The text funnel is plan-equivalent to the hand-built Pattern."""
    events = table(spark, sf_dir, "events")
    got = match_recognize(events, FUNNEL_SQL)
    want = (
        Pattern.begin("V", "event_type = 'view'")
        .followed_by("C", "event_type = 'click'")
        .followed_by("P", "event_type = 'purchase'")
        .within("24 HOURS")
        .compile_batch(events)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0


def test_streaming_text_equals_batch_text(spark, sf_dir):
    """One text, both engines: match_recognize on the streaming events
    table equals match_recognize on the batch table (time-sorted
    staging + zero-delay watermark matures everything)."""
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=4)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        match_recognize(stream, FUNNEL_SQL, watermark="0 seconds"), "append"
    )
    want = match_recognize(table(spark, sf_dir, "events"), FUNNEL_SQL)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0


def test_parse_quantifier_expansion():
    parsed = parse_pattern_sql(
        """
        PATTERN ( a -> b{3} => c{2} )
        WITHIN 1 HOUR
        DEFINE a AS event_type = 'view',
               b AS event_type = 'click',
               c AS event_type = 'error'
        """
    )
    names = [s.name for s in parsed.pattern.steps]
    modes = [s.contiguity for s in parsed.pattern.steps]
    assert names == ["a", "b_1", "b_2", "b_3", "c_1", "c_2"]
    # a strict run's ENTRY is relaxed (like one_or_more / Flink's
    # times(n).consecutive()); only events 2..n are strict
    assert modes == ["relaxed", "relaxed", "relaxed", "relaxed", "relaxed", "strict"]


def test_parse_quantified_first_step():
    parsed = parse_pattern_sql(
        """
        PATTERN ( a{2} -> b )
        WITHIN 1 HOUR
        DEFINE a AS event_type = 'error', b AS event_type = 'view'
        """
    )
    assert [s.name for s in parsed.pattern.steps] == ["a_1", "a_2", "b"]


@pytest.mark.parametrize(
    "bad, msg",
    [
        (
            "PATTERN (a -> !b{2}) WITHIN 1h DEFINE a AS x = 1, b AS y = 2",
            "cannot be quantified",
        ),
        (
            "PATTERN (a -> b{0}) WITHIN 1h DEFINE a AS x = 1, b AS y = 2",
            "must be >= 1",
        ),
    ],
)
def test_malformed_quantifiers_rejected(bad, msg):
    with pytest.raises(ValueError, match=msg):
        parse_pattern_sql(bad)


def test_parse_kleene_plus():
    parsed = parse_pattern_sql(
        """
        PATTERN ( s -> e+ -> v )
        WITHIN 7 DAYS
        DEFINE s AS event_type = 'signup',
               e AS event_type = 'error',
               v AS event_type = 'view'
        """
    )
    assert [(st.name, st.contiguity) for st in parsed.pattern.steps] == [
        ("s", "relaxed"),
        ("e", "kleene"),
        ("v", "relaxed"),
    ]


@pytest.mark.parametrize(
    "bad, msg",
    [
        (
            # a leading + step is legal since round 10 (routes to the
            # kleene-agg kernel) but requires the explicit skip policy
            "PATTERN (a+ -> b) WITHIN 1h DEFINE a AS x = 1, b AS y = 2",
            "SKIP PAST LAST ROW",
        ),
        (
            "PATTERN (a => b+) WITHIN 1h DEFINE a AS x = 1, b AS y = 2",
            "takes ->",
        ),
        (
            "PATTERN (a -> !b+) WITHIN 1h DEFINE a AS x = 1, b AS y = 2",
            "cannot be quantified",
        ),
    ],
)
def test_malformed_kleene_rejected(bad, msg):
    with pytest.raises(ValueError, match=msg):
        parse_pattern_sql(bad)


# ---------------------------------------------------------------------------
# Cross-step correlation in DEFINE (MATCH_RECOGNIZE's defining feature)

CORR_SQL = """
PATTERN ( V -> C -> P )
WITHIN 24 HOURS
DEFINE V AS event_type = 'view',
       C AS event_type = 'click',
       P AS event_type = 'purchase' AND P.value > V.value
            AND P.value > C.value
PARTITION BY user_id
ORDER BY ts
"""


def test_parse_correlation_split():
    """AND-conjuncts with step-qualified refs route to the step's
    where; the per-event predicate keeps the rest."""
    parsed = parse_pattern_sql(CORR_SQL)
    p = parsed.pattern.steps[2]
    assert p.predicate.strip() == "(event_type = 'purchase')"
    assert "P.value > V.value" in p.where and "P.value > C.value" in p.where
    assert parsed.pattern.steps[0].where is None


def test_correlation_text_equals_builder(spark, sf_dir):
    """Text-dialect correlation is plan-equivalent to the builder's
    where= (the cep_seq_corr query, modulo step names)."""
    events = table(spark, sf_dir, "events")
    got = match_recognize(events, CORR_SQL)
    want = (
        Pattern.begin("V", "event_type = 'view'")
        .followed_by("C", "event_type = 'click'")
        .followed_by(
            "P",
            "event_type = 'purchase'",
            where="P.value > V.value AND P.value > C.value",
        )
        .within("24 HOURS")
        .compile_batch(events)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0


@pytest.mark.parametrize(
    "bad, msg",
    [
        (  # correlation on the anchor step
            "PATTERN (a -> b) WITHIN 1h "
            "DEFINE a AS a.value > b.value, b AS x = 1",
            "first step cannot correlate",
        ),
        (  # correlation on a quantified step
            "PATTERN (a -> b{2}) WITHIN 1h "
            "DEFINE a AS x = 1, b AS b.value > a.value",
            "not supported on",
        ),
        (  # correlation on a kleene step
            "PATTERN (a -> b+) WITHIN 1h "
            "DEFINE a AS x = 1, b AS b.value > a.value",
            "not supported on",
        ),
        (  # unqualified column inside a correlation conjunct
            "PATTERN (a -> b) WITHIN 1h "
            "DEFINE a AS x = 1, b AS value > a.value",
            "qualify every column",
        ),
    ],
)
def test_malformed_correlation_rejected(bad, msg):
    with pytest.raises(ValueError, match=msg):
        parse_pattern_sql(bad)


MEASURES_SQL = """
PATTERN ( V -> C -> P )
WITHIN 24 HOURS
MEASURES P.value - V.value AS uplift, C.value AS click_val
DEFINE V AS event_type = 'view',
       C AS event_type = 'click',
       P AS event_type = 'purchase' AND P.value > V.value
"""


def test_parse_measures():
    parsed = parse_pattern_sql(MEASURES_SQL)
    assert parsed.pattern.measures == [
        ("uplift", "P.value - V.value"),
        ("click_val", "C.value"),
    ]


def test_measures_text_equals_builder(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    got = match_recognize(events, MEASURES_SQL)
    assert got.columns[-2:] == ["uplift", "click_val"]
    want = (
        Pattern.begin("V", "event_type = 'view'")
        .followed_by("C", "event_type = 'click'")
        .followed_by(
            "P", "event_type = 'purchase'", where="P.value > V.value"
        )
        .within("24 HOURS")
        .measure("uplift", "P.value - V.value")
        .measure("click_val", "C.value")
        .compile_batch(events)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0


@pytest.mark.parametrize(
    "bad, msg",
    [
        (  # measure referencing the negated step
            "PATTERN (a -> !b) WITHIN 1h MEASURES b.value AS x "
            "DEFINE a AS x = 1, b AS y = 2",
            "never binds",
        ),
        (  # measure referencing a kleene run
            "PATTERN (a -> b+) WITHIN 1h MEASURES b.value AS x "
            "DEFINE a AS x = 1, b AS y = 2",
            "has no single value",
        ),
        (  # malformed entry
            "PATTERN (a -> b) WITHIN 1h MEASURES b.value "
            "DEFINE a AS x = 1, b AS y = 2",
            "want expr AS alias",
        ),
        (  # alias collides with an output column
            "PATTERN (a -> b) WITHIN 1h MEASURES b.value AS t_a "
            "DEFINE a AS x = 1, b AS y = 2",
            "collides",
        ),
    ],
)
def test_malformed_measures_rejected(bad, msg):
    with pytest.raises(ValueError, match=msg):
        parse_pattern_sql(bad)


def test_run_aggregates_in_text_dialect(spark, sf_dir):
    """agg(K.col) refs flow through DEFINE (correlation) and MEASURES
    unchanged — the text surface inherits run aggregates."""
    text = """
    PATTERN ( S -> E+ -> V )
    WITHIN 7 DAYS
    MEASURES max(E.value) AS err_max, count(E.value) AS err_n
    DEFINE S AS event_type = 'signup',
           E AS event_type = 'error',
           V AS event_type = 'view' AND V.value < max(E.value)
    """
    parsed = parse_pattern_sql(text)
    assert parsed.pattern.steps[2].where == "(V.value < max(E.value))"
    got = match_recognize(table(spark, sf_dir, "events"), text)
    want = (
        Pattern.begin("S", "event_type = 'signup'")
        .one_or_more("E", "event_type = 'error'")
        .followed_by(
            "V", "event_type = 'view'", where="V.value < max(E.value)"
        )
        .within("7 DAYS")
        .measure("err_max", "max(E.value)")
        .measure("err_n", "count(E.value)")
        .compile_batch(table(spark, sf_dir, "events"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0


def test_permute_text_equals_dataframe_face(spark, sf_dir):
    """The SQL-text PERMUTE route and the hand-expanded cep_permute
    operator must produce identical matches (same anchors, same bound
    timestamps, same winning ordering) — two surfaces, one semantics."""
    import spark_cep_spark

    spark_cep_spark.load_all()
    sql_rows = {
        (r.key, r.anchor_id): (r.t_V, r.t_C, r.t_P, r.permute_order)
        for r in spark_cep_spark.QUERIES["cep_sql_permute"](
            spark, sf_dir
        ).collect()
    }
    df_rows = {
        (r.key, r.anchor_id): (
            r.t_view,
            r.t_click,
            r.t_purchase,
            {"click_first": "C->P", "purchase_first": "P->C"}[r.branch],
        )
        for r in spark_cep_spark.QUERIES["cep_permute"](
            spark, sf_dir
        ).collect()
    }
    assert sql_rows == df_rows
    assert sql_rows  # non-vacuous


@pytest.mark.parametrize(
    "bad, msg",
    [
        ("PATTERN ( V -> PERMUTE(C) )", "at least two"),
        # round 11: a plain '-> step' suffix is now LEGAL — only
        # quantified/negated/duplicate suffixes stay pointed errors
        ("PATTERN ( V -> PERMUTE(C, P) -> X? )", "may only continue"),
        ("PATTERN ( V -> PERMUTE(C, P) -> !X )", "may only continue"),
        ("PATTERN ( V -> PERMUTE(C, P) -> C )", "not repeat"),
        ("PATTERN ( V -> PERMUTE(C, P) -> X -> X )", "distinct"),
        ("PATTERN ( V -> PERMUTE(C, C) )", "duplicate"),
        ("PATTERN ( V -> PERMUTE(C, !P) )", "plain step names"),
        (
            "PATTERN ( PERMUTE(A, B) -> PERMUTE(C, D) )",
            "only one PERMUTE",
        ),
        (
            "PATTERN ( V -> PERMUTE(A, B, C, D, E) )",
            "capped at 16",
        ),
    ],
)
def test_malformed_permute_rejected(bad, msg):
    from spark_cep_spark.operators.cep_sql import expand_permute_sql

    text = (
        bad
        + " WITHIN 1 HOURS DEFINE V AS true, C AS true, P AS true, "
        "A AS true, B AS true, D AS true, E AS true, X AS true"
    )
    with pytest.raises(ValueError, match=msg):
        expand_permute_sql(text)


def test_permute_compiles_on_streams(spark, sf_dir, tmp_path):
    """PERMUTE now has a streaming face (compile_stream_variants,
    mode='earliest') — full multi-micro-batch equivalence lives in
    tests/test_cep_stream_variants.py."""
    from spark_cep_spark.operators.cep_sql import match_recognize

    df = table(spark, sf_dir, "events")
    p = str(tmp_path / "perm_ev")
    df.limit(10).write.parquet(p)
    stream = spark.readStream.schema(df.schema).parquet(p)
    out = match_recognize(
        stream,
        "PATTERN ( V -> PERMUTE(C, P) ) WITHIN 1 HOURS "
        "DEFINE V AS event_type = 'view', C AS event_type = 'click', "
        "P AS event_type = 'purchase'",
    )
    assert out.isStreaming and "permute_order" in out.columns


def test_gapped_connector_parses_and_matches_builder(spark, sf_dir):
    """`A -[g]-> B` / `-[g]-> !C` == the Pattern builder with gap=."""
    from spark_cep_spark.io import table
    from spark_cep_spark.operators.cep import Pattern
    from spark_cep_spark.operators.cep_sql import match_recognize

    events = table(spark, sf_dir, "events")
    got = match_recognize(
        events,
        """
        PATTERN ( v -[30 MINUTES]-> c -[1 HOUR]-> !p )
        WITHIN 24 HOURS
        DEFINE v AS event_type = 'view',
               c AS event_type = 'click',
               p AS event_type = 'purchase'
        """,
    )
    want = (
        Pattern.begin("v", "event_type = 'view'")
        .followed_by("c", "event_type = 'click'", gap="30 MINUTES")
        .not_followed_by("p", "event_type = 'purchase'", gap="1 HOUR")
        .within("24 HOURS")
        .compile_batch(events)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_gapped_connector_rejected_on_quantified_steps():
    from spark_cep_spark.operators.cep_sql import parse_pattern_sql

    import pytest as _pytest

    with _pytest.raises(ValueError, match="gapped connector"):
        parse_pattern_sql(
            """
            PATTERN ( a -[5 MINUTES]-> b{2} )
            WITHIN 1 HOUR
            DEFINE a AS event_type = 'view', b AS event_type = 'click'
            """
        )


def test_gapped_connector_strict_form(spark):
    """=[g]=> : the key's immediately-next event must also be in gap."""
    import datetime as dt

    from spark_cep_spark.operators.cep_sql import match_recognize

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: next event 5 min later -> in gap, matches
        (0, t0, 1, "signup", 1.0, "{}"),
        (1, t0 + dt.timedelta(minutes=5), 1, "purchase", 1.0, "{}"),
        # user 2: next event 2 hours later -> out of gap, dies
        (2, t0, 2, "signup", 1.0, "{}"),
        (3, t0 + dt.timedelta(hours=2), 2, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = match_recognize(
        df,
        """
        PATTERN ( s =[30 MINUTES]=> p )
        WITHIN 24 HOURS
        DEFINE s AS event_type = 'signup', p AS event_type = 'purchase'
        """,
    )
    keys = {r["key"] for r in out.collect()}
    assert keys == {1}


def test_after_match_clause_batch_matches_selectors(spark, sf_dir):
    """`AFTER MATCH SKIP PAST LAST ROW` / `SKIP TO LAST <step>` in the
    dialect equal the composed batch selectors."""
    from spark_cep_spark.operators.cep import (
        Pattern,
        select_non_overlapping,
        select_skip_to,
    )
    from spark_cep_spark.operators.cep_sql import match_recognize

    events = table(spark, sf_dir, "events")
    base = """
        PATTERN ( v -> c -> p )
        WITHIN 24 HOURS
        DEFINE v AS event_type = 'view',
               c AS event_type = 'click',
               p AS event_type = 'purchase'
    """
    pat = (
        Pattern.begin("v", "event_type = 'view'")
        .followed_by("c", "event_type = 'click'")
        .followed_by("p", "event_type = 'purchase'")
        .within("24 HOURS")
    )
    matches = pat.compile_batch(events)
    got_past = match_recognize(
        events, base + "AFTER MATCH SKIP PAST LAST ROW"
    )
    want_past = select_non_overlapping(matches, "t_v", "t_p")
    assert sorted(map(tuple, got_past.collect())) == sorted(
        map(tuple, want_past.collect())
    )
    got_to = match_recognize(events, base + "AFTER MATCH SKIP TO LAST c")
    want_to = select_skip_to(matches, "t_v", "t_c")
    assert sorted(map(tuple, got_to.collect())) == sorted(
        map(tuple, want_to.collect())
    )
    assert 0 < got_past.count() <= got_to.count() <= matches.count()


def test_after_match_clause_malformed_rejected(spark, sf_dir):
    from spark_cep_spark.operators.cep_sql import parse_pattern_sql

    base = """
        PATTERN ( v -> c )
        WITHIN 1 HOUR
        DEFINE v AS event_type = 'view', c AS event_type = 'click'
    """
    # SKIP TO FIRST became a supported spelling in round 6d — a truly
    # malformed clause still gets the pointed error
    with pytest.raises(ValueError, match="malformed AFTER MATCH"):
        parse_pattern_sql(base + "AFTER MATCH SKIP TO MIDDLE c")
    with pytest.raises(ValueError, match="unknown step"):
        parse_pattern_sql(base + "AFTER MATCH SKIP TO LAST z")
    with pytest.raises(ValueError, match="anchor"):
        parse_pattern_sql(base + "AFTER MATCH SKIP TO LAST v")
    from spark_cep_spark.operators.cep_sql import match_recognize

    with pytest.raises(ValueError, match="not supported with"):
        match_recognize(
            table(spark, sf_dir, "events"),
            """
            PATTERN ( v -> c? -> p )
            WITHIN 1 HOUR
            DEFINE v AS event_type = 'view',
                   c AS event_type = 'click',
                   p AS event_type = 'purchase'
            AFTER MATCH SKIP PAST LAST ROW
            """,
        )
