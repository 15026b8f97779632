"""Optional (`B?`) and range-repetition (`B{n,m}`) quantifiers: greedy
alternation semantics on crafted sequences, the SQL-dialect expansion
path, and rejection of every malformed quantifier shape."""

from __future__ import annotations

import datetime as dt

import pytest

from spark_cep_spark.operators.cep import Pattern
from spark_cep_spark.operators.cep_sql import (
    expand_quantifier_sql,
    match_recognize,
    parse_pattern_sql,
)

T0 = dt.datetime(2024, 1, 1)


def _events_df(spark, rows):
    """rows: list of (user_id, minutes_offset, event_type)"""
    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, 1.0, "{}")
        for i, (u, m, t) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


OPTIONAL_SQL = """
PATTERN ( A -> B? -> C )
WITHIN 2 HOURS
DEFINE A AS event_type = 'signup',
       B AS event_type = 'error',
       C AS event_type = 'purchase'
"""


def test_optional_expansion_shape():
    variants = expand_quantifier_sql(OPTIONAL_SQL)
    assert [d for d, _ in variants] == ["A->B->C", "A->C"]
    # each variant parses standalone (skipped step's DEFINE dropped)
    for _, vtext in variants:
        parse_pattern_sql(vtext)


def test_optional_greedy_prefers_present(spark):
    rows = [
        (1, 0, "signup"), (1, 10, "error"), (1, 20, "purchase"),
        # user 2: no error — optional skipped, t_B NULL
        (2, 0, "signup"), (2, 15, "purchase"),
        # user 3: error AFTER purchase — with-B variant can't complete
        # (no purchase after the error), greedy falls back to A->C
        (3, 0, "signup"), (3, 30, "purchase"), (3, 40, "error"),
        # user 4: error but no purchase at all — no match
        (4, 0, "signup"), (4, 10, "error"),
    ]
    out = match_recognize(_events_df(spark, rows), OPTIONAL_SQL)
    got = {
        r["key"]: (r["t_B"], r["t_C"], r["variant"])
        for r in out.collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1] == (T0 + dt.timedelta(minutes=10),
                      T0 + dt.timedelta(minutes=20), "A->B->C")
    assert got[2] == (None, T0 + dt.timedelta(minutes=15), "A->C")
    assert got[3] == (None, T0 + dt.timedelta(minutes=30), "A->C")


def test_optional_greedy_wins_even_when_slower(spark):
    """Greedy semantics: the with-B variant wins although the skip
    variant completes EARLIER (purchase at 5' precedes the error)."""
    rows = [
        (1, 0, "signup"), (1, 5, "purchase"),
        (1, 10, "error"), (1, 20, "purchase"),
    ]
    out = match_recognize(_events_df(spark, rows), OPTIONAL_SQL).collect()
    assert len(out) == 1
    assert out[0]["variant"] == "A->B->C"
    assert out[0]["t_C"] == T0 + dt.timedelta(minutes=20)


RANGE_SQL = """
PATTERN ( A -> B{1,3} )
WITHIN 2 HOURS
DEFINE A AS event_type = 'view',
       B AS event_type = 'click'
"""


def test_range_expansion_greedy_order():
    variants = expand_quantifier_sql(RANGE_SQL)
    assert [d for d, _ in variants] == ["A->B{3}", "A->B{2}", "A->B{1}"]


def test_range_binds_longest_available(spark):
    rows = [
        (1, 0, "view"), (1, 5, "click"), (1, 10, "click"), (1, 15, "click"),
        (2, 0, "view"), (2, 5, "click"), (2, 10, "click"),
        (3, 0, "view"), (3, 5, "click"),
        (4, 0, "view"),
    ]
    out = match_recognize(_events_df(spark, rows), RANGE_SQL)
    got = {
        r["key"]: (r["t_B_1"], r["t_B_2"], r["t_B_3"], r["variant"])
        for r in out.collect()
    }
    m = lambda k: T0 + dt.timedelta(minutes=k)
    assert set(got) == {1, 2, 3}
    assert got[1] == (m(5), m(10), m(15), "A->B{3}")
    assert got[2] == (m(5), m(10), None, "A->B{2}")
    assert got[3] == (m(5), None, None, "A->B{1}")


def test_builder_rewrite_matches_dialect(spark):
    """The hand-written alternation (times(3) | times(2) with anti-join
    preference — the cep_times_range recipe) agrees with the dialect's
    {2,3} expansion on the same input."""
    from pyspark.sql import functions as F

    rows = [
        (u, m, t)
        for u in range(1, 8)
        for m, t in [(0, "view"), (7, "click"), (9, "click")]
    ] + [(u, 11, "click") for u in range(1, 4)]
    df = _events_df(spark, rows)
    via_sql = match_recognize(
        df,
        """
        PATTERN ( V -> B{2,3} )
        WITHIN 1 HOUR
        DEFINE V AS event_type = 'view', B AS event_type = 'click'
        """,
    )
    b3 = (
        Pattern.begin("V", "event_type = 'view'")
        .times("B", "event_type = 'click'", 3)
        .within("1 HOUR")
        .compile_batch(df)
    )
    b2 = (
        Pattern.begin("V", "event_type = 'view'")
        .times("B", "event_type = 'click'", 2)
        .within("1 HOUR")
        .compile_batch(df)
    )
    manual = b3.unionByName(
        b2.join(b3.select("key", "anchor_id"), ["key", "anchor_id"], "left_anti")
        .withColumn("t_B_3", F.lit(None).cast("timestamp"))
        .select(*b3.columns)
    )
    got = sorted(
        (r["key"], r["t_B_1"], r["t_B_2"], r["t_B_3"])
        for r in via_sql.collect()
    )
    want = sorted(
        (r["key"], r["t_B_1"], r["t_B_2"], r["t_B_3"])
        for r in manual.collect()
    )
    assert got == want


def test_quantifiers_on_empty_input(spark):
    empty = _events_df(spark, []).limit(0)
    assert match_recognize(empty, OPTIONAL_SQL).count() == 0
    assert match_recognize(empty, RANGE_SQL).count() == 0


def test_plain_pattern_is_not_expanded():
    assert expand_quantifier_sql(
        """
        PATTERN ( A -> B{3} -> C+ )
        WITHIN 1 HOUR
        DEFINE A AS event_type = 'view',
               B AS event_type = 'click',
               C AS event_type = 'purchase'
        """
    ) is None


@pytest.mark.parametrize(
    "pattern, msg",
    [
        ("( A? -> B )", "first step cannot be optional"),
        ("( A -> B{0,2} )", "needs n >= 1"),
        ("( A -> B{3,2} )", "needs m > n"),
        ("( A -> B{1,9} )", "span capped"),
        ("( A -> B? -> C? -> D? -> E? -> F? )", "max 16"),
    ],
)
def test_malformed_quantifiers_rejected(pattern, msg):
    defines = ", ".join(
        f"{s} AS event_type = '{s}'" for s in "ABCDEF"
    )
    with pytest.raises(ValueError, match=msg):
        expand_quantifier_sql(
            f"PATTERN {pattern} WITHIN 1 HOUR DEFINE {defines}"
        )


def test_measures_lift_through_expansion():
    """A measure travels into exactly the variants that bind every
    step it references; the skip variant drops the B-referencing item
    (its column is NULL-padded at union time)."""
    variants = expand_quantifier_sql(
        """
        PATTERN ( A -> B? )
        WITHIN 1 HOUR
        MEASURES A.value AS av, B.value AS bv
        DEFINE A AS event_type = 'view', B AS event_type = 'click'
        """
    )
    texts = dict(variants)
    assert "bv" in texts["A->B"] and "av" in texts["A->B"]
    assert "bv" not in texts["A"] and "av" in texts["A"]  # skip variant
    for _, vtext in variants:
        parse_pattern_sql(vtext)  # each variant parses standalone


def test_measures_referencing_ranged_step_rejected():
    with pytest.raises(ValueError, match="ranged step"):
        expand_quantifier_sql(
            """
            PATTERN ( A -> B{1,2} )
            WITHIN 1 HOUR
            MEASURES B.value AS bv
            DEFINE A AS event_type = 'view', B AS event_type = 'click'
            """
        )


def test_streaming_quantifier_compiles(spark, tmp_path):
    """Quantifier patterns now have a streaming face (the variant
    NFA runner) — full multi-micro-batch equivalence lives in
    tests/test_cep_stream_variants.py."""
    df = _events_df(spark, [(1, 0, "signup")])
    p = str(tmp_path / "q_ev")
    df.write.parquet(p)
    sdf = spark.readStream.schema(df.schema).parquet(p)
    out = match_recognize(sdf, OPTIONAL_SQL)
    assert out.isStreaming
    assert "variant" in out.columns and "t_B" in out.columns


# ---------------------------------------------------------------------------
# Property tests: greedy expansion semantics vs brute-force references
# on randomized sequences (per-user interleavings, ties impossible by
# construction: one event per minute offset).

from hypothesis import given, settings, strategies as st  # noqa: E402


def _brute_optional(rows, within):
    """A -> B? -> C greedy: per signup anchor, prefer the A-B-C chain
    (earliest B after A, earliest C after B), else A-C."""
    out = []
    for i, (u, m, t) in enumerate(rows):
        if t != "signup":
            continue
        bs = sorted(m2 for (u2, m2, t2) in rows
                    if u2 == u and t2 == "error" and m < m2 <= m + within)
        hit = None
        if bs:
            cs = sorted(m3 for (u3, m3, t3) in rows
                        if u3 == u and t3 == "purchase"
                        and bs[0] < m3 <= m + within)
            if cs:
                hit = (u, i, m, bs[0], cs[0])
        if hit is None:
            cs = sorted(m3 for (u3, m3, t3) in rows
                        if u3 == u and t3 == "purchase" and m < m3 <= m + within)
            if cs:
                hit = (u, i, m, None, cs[0])
        if hit:
            out.append(hit)
    return sorted(out, key=lambda x: (x[0], x[1]))


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),
        st.sampled_from(["signup", "error", "purchase"]),
    ),
    min_size=0,
    max_size=14,
)


@settings(max_examples=25, deadline=None)
@given(events_strategy)
def test_optional_matches_brute_force(spark_session_holder, seq):
    spark = spark_session_holder
    rows = [(u, i, t) for i, (u, t) in enumerate(seq)]  # minute = index
    out = match_recognize(_events_df(spark, rows), OPTIONAL_SQL).collect()
    got = sorted(
        (
            r["key"],
            r["anchor_id"],
            int((r["t_A"] - T0).total_seconds() // 60),
            None if r["t_B"] is None
            else int((r["t_B"] - T0).total_seconds() // 60),
            int((r["t_C"] - T0).total_seconds() // 60),
        )
        for r in out
    )
    assert got == _brute_optional(rows, within=120)


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark


def _brute_range(rows, lo, hi, within):
    """A -> B{lo,hi} greedy: the longest chain of earliest clicks."""
    out = []
    for i, (u, m, t) in enumerate(rows):
        if t != "view":
            continue
        chain, cur = [], m
        while len(chain) < hi:
            nxt = sorted(m2 for (u2, m2, t2) in rows
                         if u2 == u and t2 == "click"
                         and cur < m2 <= m + within)
            if not nxt:
                break
            chain.append(nxt[0])
            cur = nxt[0]
        if len(chain) >= lo:
            padded = chain + [None] * (hi - len(chain))
            out.append((u, i, m, *padded))
    return sorted(out, key=lambda x: (x[0], x[1]))


range_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),
        st.sampled_from(["view", "click"]),
    ),
    min_size=0,
    max_size=14,
)


@settings(max_examples=25, deadline=None)
@given(range_strategy)
def test_range_matches_brute_force(spark_session_holder, seq):
    spark = spark_session_holder
    rows = [(u, i, t) for i, (u, t) in enumerate(seq)]
    out = match_recognize(_events_df(spark, rows), RANGE_SQL).collect()

    def m(ts):
        return None if ts is None else int((ts - T0).total_seconds() // 60)

    got = sorted(
        (r["key"], r["anchor_id"], m(r["t_A"]),
         m(r["t_B_1"]), m(r["t_B_2"]), m(r["t_B_3"]))
        for r in out
    )
    assert got == _brute_range(rows, lo=1, hi=3, within=120)


# ------------------------------------------------------------------
# reluctant (`B??`, `{n,m}?`) quantifiers
# ------------------------------------------------------------------

RELUCTANT_SQL = """
PATTERN ( A => B?? => C )
WITHIN 2 HOURS
DEFINE A AS event_type = 'signup',
       B AS event_type = 'click',
       C AS event_type = 'purchase'
"""


def test_reluctant_expansion_flips_order():
    variants = expand_quantifier_sql(RELUCTANT_SQL)
    assert [d for d, _ in variants] == ["A=>C", "A=>B=>C"]


def test_reluctant_range_ascending_order():
    variants = expand_quantifier_sql(
        """
PATTERN ( A -> B{2,4}? )
WITHIN 2 HOURS
DEFINE A AS event_type = 'signup', B AS event_type = 'click'
"""
    )
    assert [d for d, _ in variants] == ["A->B{2}", "A->B{3}", "A->B{4}"]


def test_reluctant_prefers_skip_under_strict_contiguity(spark):
    rows = [
        # user 1: signup, purchase adjacent -> skip branch wins
        (1, 0, "signup"), (1, 10, "purchase"),
        # user 2: signup, click, purchase — only the with-B strict
        # chain completes, reluctant takes it as the fallback
        (2, 0, "signup"), (2, 5, "click"), (2, 10, "purchase"),
        # user 3: signup, view, purchase — neither strict chain
        (3, 0, "signup"), (3, 5, "view"), (3, 10, "purchase"),
    ]
    out = match_recognize(_events_df(spark, rows), RELUCTANT_SQL)
    got = {r["key"]: (r["variant"], r["t_B"]) for r in out.collect()}
    assert got[1] == ("A=>C", None)
    assert got[2][0] == "A=>B=>C" and got[2][1] is not None
    assert 3 not in got


def test_reluctant_optional_collapses_under_relaxed_contiguity(spark):
    """Documented semantics: with `->` connectors the skip branch
    matches whenever the with branch does, so `B??` always skips."""
    relaxed = RELUCTANT_SQL.replace("=>", "->")
    rows = [
        (1, 0, "signup"), (1, 5, "click"), (1, 10, "purchase"),
    ]
    out = match_recognize(_events_df(spark, rows), relaxed)
    got = {r["key"]: r["variant"] for r in out.collect()}
    assert got[1] == "A->C"


def test_greedy_and_reluctant_agree_when_unambiguous(spark):
    """Where only one branch can match, preference order is moot: the
    greedy and reluctant forms produce identical rows."""
    greedy = RELUCTANT_SQL.replace("??", "?")
    rows = [
        (2, 0, "signup"), (2, 5, "click"), (2, 10, "purchase"),
        (3, 0, "signup"), (3, 5, "view"), (3, 10, "purchase"),
    ]
    df = _events_df(spark, rows)
    g = {
        (r["key"], r["t_B"], r["t_C"])
        for r in match_recognize(df, greedy).collect()
    }
    r_ = {
        (r["key"], r["t_B"], r["t_C"])
        for r in match_recognize(df, RELUCTANT_SQL).collect()
    }
    assert g == r_


def test_gapped_connector_composes_with_reluctant_optional(spark):
    """`s =[10 MINUTES]=> b?? =[10 MINUTES]=> p`: quantifier expansion
    carries gapped connectors verbatim into each variant, so the gap
    deadline applies in both the skip and take branches."""
    rows = [
        # user 1: s then p 5 min later (adjacent, in gap) -> skip branch
        (1, 0, "signup"), (1, 5, "purchase"),
        # user 2: s, b(+5), p(+10): strict chain, every hop in gap
        (2, 0, "signup"), (2, 5, "click"), (2, 10, "purchase"),
        # user 3: s, b(+5), p(+40): second hop breaks the 10-min gap
        (3, 0, "signup"), (3, 5, "click"), (3, 45, "purchase"),
    ]
    out = match_recognize(
        _events_df(spark, rows),
        """
PATTERN ( s =[10 MINUTES]=> b?? =[10 MINUTES]=> p )
WITHIN 2 HOURS
DEFINE s AS event_type = 'signup',
       b AS event_type = 'click',
       p AS event_type = 'purchase'
""",
    )
    got = {r["key"]: r["variant"] for r in out.collect()}
    assert got[1] == "s=[10 MINUTES]=>p"
    assert got[2] == "s=[10 MINUTES]=>b=[10 MINUTES]=>p"
    assert 3 not in got


# ------------------------------------------------------------------
# quantified groups: (A -> B){n} / {n,m}
# ------------------------------------------------------------------

from spark_cep_spark.operators.cep_sql import expand_group_sql  # noqa: E402

GROUP_SQL = """
PATTERN ( S -> (A -> B){1,2} )
WITHIN 2 HOURS
DEFINE S AS event_type = 'signup',
       A AS event_type = 'view',
       B AS event_type = 'click'
"""


def test_group_expansion_shape():
    variants = expand_group_sql(GROUP_SQL)
    assert [d for d, _ in variants] == [
        "S->A_r1->B_r1->A_r2->B_r2",
        "S->A_r1->B_r1",
    ]
    for _, vtext in variants:
        parse_pattern_sql(vtext)  # each variant parses standalone


def test_group_exact_n_single_chain():
    variants = expand_group_sql(
        GROUP_SQL.replace("{1,2}", "{2}")
    )
    assert len(variants) == 1
    assert variants[0][0] == "S->A_r1->B_r1->A_r2->B_r2"


def test_group_greedy_prefers_more_repeats(spark):
    rows = [
        (1, 0, "signup"), (1, 5, "view"), (1, 10, "click"),
        (1, 15, "view"), (1, 20, "click"),
        (2, 0, "signup"), (2, 5, "view"), (2, 10, "click"),
        (3, 0, "signup"),
    ]
    out = match_recognize(_events_df(spark, rows), GROUP_SQL)
    got = {r["key"]: (r["variant"], r["t_B_r2"]) for r in out.collect()}
    assert got[1][0] == "S->A_r1->B_r1->A_r2->B_r2"
    assert got[2] == ("S->A_r1->B_r1", None)
    assert 3 not in got


def test_group_strict_connector_carries_into_repeats(spark):
    """`(A => B){2}`: the strict connector INSIDE the group applies in
    every repeat — each B must be the key's immediately-next event
    after its A."""
    sql = """
PATTERN ( (A => B){2} )
WITHIN 2 HOURS
DEFINE A AS event_type = 'view', B AS event_type = 'click'
"""
    rows = [
        (1, 0, "view"), (1, 5, "click"), (1, 10, "view"), (1, 15, "click"),
        # user 2: a purchase interrupts the second pair -> strict fails
        (2, 0, "view"), (2, 5, "click"), (2, 10, "view"),
        (2, 12, "purchase"), (2, 15, "click"),
    ]
    out = match_recognize(_events_df(spark, rows), sql)
    assert sorted(r["key"] for r in out.collect()) == [1]


@pytest.mark.parametrize(
    "pattern, msg",
    [
        ("( (A -> B){0,2} )", "n >= 1"),
        ("( (A -> B){3,2} )", "m >= n"),
        ("( (A -> B){1,9} )", "capped"),
        # two groups are legal since round 10 — but the SAME step
        # names in both would rename onto colliding columns
        ("( (A -> B){2} -> (A -> B){2} )", "more than one quantified"),
        ("( (A -> B?){2} )", "plain step names"),
        ("( (A -> A){2} )", "duplicate step name"),
    ],
)
def test_malformed_groups_rejected(pattern, msg):
    with pytest.raises(ValueError, match=msg):
        expand_group_sql(
            f"PATTERN {pattern} WITHIN 1 HOUR "
            "DEFINE A AS event_type = 'view', B AS event_type = 'click'"
        )


@pytest.mark.parametrize(
    "strip, msg",
    [
        ("WITHIN 2 HOURS\n", "missing WITHIN clause"),
        (
            "DEFINE S AS event_type = 'signup',\n"
            "       A AS event_type = 'view',\n"
            "       B AS event_type = 'click'\n",
            "missing DEFINE clause",
        ),
    ],
)
def test_group_missing_required_clause_pointed_error(strip, msg):
    """A quantified-group query missing DEFINE/WITHIN gets the
    dialect's pointed ValueError, not a raw KeyError — expand_group_sql
    runs before parse_pattern_sql so it must validate too (round-6
    ADVICE)."""
    with pytest.raises(ValueError, match=msg):
        expand_group_sql(GROUP_SQL.replace(strip, ""))


def test_group_malformed_define_entry_pointed_error():
    with pytest.raises(ValueError, match="malformed DEFINE entry"):
        expand_group_sql(
            GROUP_SQL.replace("B AS event_type = 'click'", "B event_type")
        )


def test_group_with_correlation_rejected():
    with pytest.raises(ValueError, match="correlation"):
        expand_group_sql(
            """
            PATTERN ( S -> (A -> B){2} )
            WITHIN 1 HOUR
            DEFINE S AS event_type = 'signup',
                   A AS event_type = 'view',
                   B AS event_type = 'click' AND B.value > S.value
            """
        )


def test_group_range_with_step_quantifier_rejected(spark):
    with pytest.raises(ValueError, match="cannot be combined"):
        match_recognize(
            _events_df(spark, [(1, 0, "signup")]),
            """
            PATTERN ( (A -> B){1,2} -> C? )
            WITHIN 1 HOUR
            DEFINE A AS event_type = 'view',
                   B AS event_type = 'click',
                   C AS event_type = 'purchase'
            """,
        )
