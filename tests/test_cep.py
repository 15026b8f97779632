"""CEP batch compiler tests: crafted sequences + property test against
a brute-force reference matcher (SURVEY §5.4).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st

from spark_cep_spark.operators.cep import Pattern

T0 = dt.datetime(2024, 1, 1)


def _events_df(spark, rows):
    """rows: list of (user_id, minutes_offset, event_type)"""
    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, 1.0, "{}")
        for i, (u, m, t) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


FUNNEL = lambda within: (
    Pattern.begin("a", "event_type = 'view'")
    .followed_by("b", "event_type = 'click'")
    .followed_by("c", "event_type = 'purchase'")
    .within(within)
)


def brute_force_matches(rows, within_minutes):
    """Reference matcher: skip-till-next-match, earliest-bind, per user."""
    out = []
    for i, (u, m, t) in enumerate(rows):
        if t != "view":
            continue
        # earliest click after m within bound
        clicks = sorted(
            m2 for (u2, m2, t2) in rows if u2 == u and t2 == "click" and m2 > m and m2 <= m + within_minutes
        )
        if not clicks:
            continue
        t2 = clicks[0]
        purchases = sorted(
            m3 for (u3, m3, t3) in rows if u3 == u and t3 == "purchase" and m3 > t2 and m3 <= m + within_minutes
        )
        if not purchases:
            continue
        out.append((u, i, m, t2, purchases[0]))
    return sorted(out)


def test_simple_funnel_match(spark):
    rows = [
        (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),   # full funnel
        (2, 0, "view"), (2, 10, "purchase"),                      # no click
        (3, 0, "view"), (3, 90, "click"), (3, 95, "purchase"),    # click too late
    ]
    got = FUNNEL("60 MINUTES").compile_batch(_events_df(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert r.key == 1 and r.anchor_id == 0


def test_earliest_match_policy(spark):
    """Two clicks qualify — the EARLIEST must bind (skip-till-next-match)."""
    rows = [
        (1, 0, "view"), (1, 5, "click"), (1, 30, "click"), (1, 40, "purchase"),
    ]
    got = FUNNEL("60 MINUTES").compile_batch(_events_df(spark, rows)).collect()
    assert len(got) == 1
    assert got[0].t_b == T0 + dt.timedelta(minutes=5)


def test_purchase_before_click_does_not_match(spark):
    rows = [(1, 0, "view"), (1, 10, "purchase"), (1, 20, "click")]
    got = FUNNEL("60 MINUTES").compile_batch(_events_df(spark, rows)).collect()
    assert got == []


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),      # user
            st.integers(min_value=0, max_value=120),    # minute offset
            st.sampled_from(["view", "click", "purchase", "error"]),
        ),
        min_size=0,
        max_size=25,
        unique_by=lambda r: (r[0], r[1]),  # unique (user, ts): no tie ambiguity
    )
)
def test_property_compiler_equals_bruteforce(spark_session_holder, events):
    spark = spark_session_holder
    got = FUNNEL("60 MINUTES").compile_batch(_events_df(spark, events)).collect()
    got_set = sorted(
        (r.key, r.anchor_id, _mins(r.t_a), _mins(r.t_b), _mins(r.t_c)) for r in got
    )
    want = brute_force_matches(events, 60)
    assert got_set == want


def _mins(ts: dt.datetime) -> int:
    return int((ts - T0).total_seconds() // 60)


# hypothesis can't use function-scoped fixtures; bind session fixture
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark


def test_next_is_strict_not_relaxed(spark):
    """error→(view)→error matches followed_by but NOT next."""
    import datetime as dt

    from spark_cep_spark.operators.cep import Pattern

    rows = [
        (1, 100, dt.datetime(2024, 1, 1, 10, 0), "error"),
        (1, 101, dt.datetime(2024, 1, 1, 10, 5), "view"),
        (1, 102, dt.datetime(2024, 1, 1, 10, 10), "error"),
        (2, 200, dt.datetime(2024, 1, 1, 11, 0), "error"),
        (2, 201, dt.datetime(2024, 1, 1, 11, 1), "error"),
        # out of bound for the 1 HOUR within
        (3, 300, dt.datetime(2024, 1, 1, 12, 0), "error"),
        (3, 301, dt.datetime(2024, 1, 1, 13, 30), "error"),
    ]
    e = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, event_type string")
    relaxed = (
        Pattern.begin("a", "event_type='error'")
        .followed_by("b", "event_type='error'")
        .within("1 HOUR")
        .compile_batch(e)
    )
    strict = (
        Pattern.begin("a", "event_type='error'")
        .next("b", "event_type='error'")
        .within("1 HOUR")
        .compile_batch(e)
    )
    assert {r["anchor_id"] for r in relaxed.collect()} == {100, 200}
    assert {r["anchor_id"] for r in strict.collect()} == {200}


def test_not_followed_by_terminal_negation(spark):
    import datetime as dt

    import pytest

    from spark_cep_spark.operators.cep import Pattern

    rows = [
        (1, 100, dt.datetime(2024, 1, 1, 10, 0), "view"),
        (1, 101, dt.datetime(2024, 1, 1, 10, 5), "click"),
        (1, 102, dt.datetime(2024, 1, 1, 10, 10), "purchase"),
        (2, 200, dt.datetime(2024, 1, 1, 11, 0), "view"),
        (2, 201, dt.datetime(2024, 1, 1, 11, 5), "click"),
    ]
    e = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, event_type string")
    p = (
        Pattern.begin("v", "event_type='view'")
        .followed_by("c", "event_type='click'")
        .not_followed_by("p", "event_type='purchase'")
        .within("1 HOUR")
    )
    assert {r["anchor_id"] for r in p.compile_batch(e).collect()} == {200}
    # negation must be terminal
    bad = (
        Pattern.begin("v", "event_type='view'")
        .not_followed_by("p", "event_type='purchase'")
        .followed_by("c", "event_type='click'")
        .within("1 HOUR")
    )
    with pytest.raises(ValueError, match="last step"):
        bad.compile_batch(e)


def test_strict_and_negation_match_brute_force_on_random_events(spark):
    """Differential test of the batch compiler's strict (next) and
    negation (not_followed_by) paths against a literal-transcription
    brute force, on a seeded random event soup (20 users x ~20 events,
    duplicate timestamps included to exercise the (ts, id) tie-break)."""
    import datetime as dt

    import numpy as np

    from spark_cep_spark.operators.cep import Pattern

    rng = np.random.RandomState(0)
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(20):
        t = 0
        for _ in range(rng.randint(5, 25)):
            t += int(rng.randint(0, 40))  # minutes; 0 => duplicate ts
            rows.append(
                (u, eid, base + dt.timedelta(minutes=t),
                 ["a", "b", "c"][rng.randint(0, 3)])
            )
            eid += 1
    e = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string"
    )
    bound = dt.timedelta(hours=1)

    by_user: dict = {}
    for u, i, ts, et in rows:
        by_user.setdefault(u, []).append((ts, i, et))
    for seq in by_user.values():
        seq.sort()  # (ts, id) order == the compiler's rn order

    # strict: a whose immediately-next event is b, within 1h
    want_strict = set()
    for seq in by_user.values():
        for j in range(len(seq) - 1):
            if (seq[j][2] == "a" and seq[j + 1][2] == "b"
                    and seq[j + 1][0] <= seq[j][0] + bound):
                want_strict.add(seq[j][1])
    got_strict = {
        r["anchor_id"]
        for r in Pattern.begin("x", "event_type='a'")
        .next("y", "event_type='b'")
        .within("1 HOUR")
        .compile_batch(e)
        .collect()
    }
    assert got_strict == want_strict

    # negation: a followed_by b (earliest), then NO c within a+1h
    want_neg = set()
    for seq in by_user.values():
        for ts0, i0, et0 in seq:
            if et0 != "a":
                continue
            bs = [ts for ts, _i, et in seq if et == "b" and ts > ts0
                  and ts <= ts0 + bound]
            if not bs:
                continue
            tb = min(bs)
            cs = [ts for ts, _i, et in seq if et == "c" and ts > tb
                  and ts <= ts0 + bound]
            if not cs:
                want_neg.add(i0)
    got_neg = {
        r["anchor_id"]
        for r in Pattern.begin("x", "event_type='a'")
        .followed_by("y", "event_type='b'")
        .not_followed_by("z", "event_type='c'")
        .within("1 HOUR")
        .compile_batch(e)
        .collect()
    }
    assert got_neg == want_neg


def test_select_non_overlapping_greedy(spark):
    """AFTER MATCH SKIP PAST LAST ROW: overlapping funnel matches per
    key collapse to the greedy non-overlapping chain; ties on
    (start, end) break by anchor_id."""
    import datetime as dt

    from spark_cep_spark.operators.cep import select_non_overlapping

    t = lambda m: dt.datetime(2024, 6, 1) + dt.timedelta(minutes=m)
    rows = [
        # key 1: [0,10] overlaps [5,15]; [12,20] follows the kept [0,10]
        (1, 10, t(0), t(10)),
        (1, 11, t(5), t(15)),
        (1, 12, t(12), t(20)),
        # key 2: tie on (start, end) — anchor 20 wins; [25,30] follows
        (2, 21, t(0), t(8)),
        (2, 20, t(0), t(8)),
        (2, 22, t(25), t(30)),
        # key 3: back-to-back boundary: start == prev end is an overlap
        (3, 30, t(0), t(5)),
        (3, 31, t(5), t(9)),
    ]
    df = spark.createDataFrame(
        rows, "key long, anchor_id long, t_s timestamp, t_e timestamp"
    )
    got = sorted(
        (r.key, r.anchor_id)
        for r in select_non_overlapping(df, "t_s", "t_e").collect()
    )
    assert got == [(1, 10), (1, 12), (2, 20), (2, 22), (3, 30)]


def test_times_strict_run_entry_is_relaxed(spark):
    """times(n, 'strict') is a bounded Kleene run: its ENTRY is relaxed
    (non-matching events may sit between the previous step and the
    run), and only events 2..n must be immediately consecutive —
    round-4 review fixed the first sub-step wrongly being strict
    against the previous step."""
    import datetime as dt

    from spark_cep_spark.operators.cep import Pattern

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 10, "other", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 10, "click", 1.0, "{}"),
        (4, t0 + dt.timedelta(minutes=3), 10, "click", 1.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    pat = (
        Pattern.begin("v", "event_type = 'view'")
        .times("c", "event_type = 'click'", 2, contiguity="strict")
        .within("24 HOURS")
    )
    got = pat.compile_batch(events).collect()
    assert len(got) == 1  # the run starts at event 3, after the 'other'
    # but a non-click BETWEEN the two clicks must still kill the run
    rows2 = rows[:3] + [
        (5, t0 + dt.timedelta(minutes=4), 10, "other", 1.0, "{}"),
        (6, t0 + dt.timedelta(minutes=5), 10, "click", 1.0, "{}"),
    ]
    events2 = spark.createDataFrame(
        rows2,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    assert pat.compile_batch(events2).count() == 0
