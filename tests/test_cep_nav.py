"""PREV()/NEXT() physical-row navigation in the MATCH_RECOGNIZE
dialect (cep_sql._rewrite_nav_conjunct + the NFA kernel's nav tail):
batch pre-projects lag/lead columns; streaming re-evaluates PREV
conjuncts against the key's last-k released rows kept in state.
Asserts hand-computed matches, multi-micro-batch streaming == batch,
partition-start NULL semantics, and every pointed rejection path."""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import time

import pytest

from spark_cep_spark.operators.cep_sql import match_recognize

T0 = dt.datetime(2024, 1, 1)
SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

PREV_SQL = """
PATTERN ( d -> r )
WITHIN 2 HOURS
DEFINE d AS event_type = 'click' AND value < PREV(value),
       r AS event_type = 'click' AND value > 1.5 * PREV(value)
"""


def _mkdf(spark, rows):
    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, v, "{}")
        for i, (u, m, t, v) in enumerate(rows)
    ]
    return spark.createDataFrame(data, SCHEMA), data


def _stream_vs_batch(spark, rows, sql):
    """Stage rows as 2 content files + 2 far-future tail files (tail
    events advance the watermark past every deadline; nav queries set
    filter_nonmatching=False so ANY event drives the clock), run
    availableNow with maxFilesPerTrigger=1, and compare row sets with
    the tail user filtered out of both."""
    df, data = _mkdf(spark, rows)
    d = tempfile.mkdtemp()
    half = (len(data) + 1) // 2
    files = [data[:half], data[half:]] + [
        [(100 + j, T0 + dt.timedelta(minutes=mm), 9, "click", 1.0, "{}")]
        for j, mm in enumerate((500, 1000))
    ]
    for i, chunk in enumerate(files):
        if not chunk:
            continue
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
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
        match_recognize(sdf, sql, watermark="0 seconds"), "append"
    )
    want = match_recognize(df, sql)
    g = sorted(tuple(r) for r in got.filter("key <> 9").collect())
    w = sorted(
        tuple(r)
        for r in want.filter("key <> 9").select(*got.columns).collect()
    )
    return g, w


def test_prev_batch_hand_computed(spark):
    # user 1: 10, 8 (drop), 20 (> 1.5*8) -> one match (anchor e1)
    # user 2: 5, 4 (drop), 5 (not > 1.5*4=6) -> none
    rows = [
        (1, 0, "click", 10.0),
        (1, 5, "click", 8.0),
        (1, 10, "click", 20.0),
        (2, 0, "click", 5.0),
        (2, 5, "click", 4.0),
        (2, 10, "click", 5.0),
    ]
    df, _ = _mkdf(spark, rows)
    out = match_recognize(df, PREV_SQL).collect()
    assert [(r["key"], r["anchor_id"]) for r in out] == [(1, 1)]


def test_prev_partition_start_never_binds(spark):
    # the first row of a key has no previous row: lag is NULL, the
    # comparison is UNKNOWN, the step must not bind (both engines)
    rows = [(1, 0, "click", -1e9), (1, 5, "click", 1e9)]
    df, _ = _mkdf(spark, rows)
    out = match_recognize(df, PREV_SQL).collect()
    assert out == []


def test_prev_offset_two(spark):
    # d binds where value < the row TWO back: 10, 9, 8(<10) -> e2
    sql = """
    PATTERN ( d -> r )
    WITHIN 2 HOURS
    DEFINE d AS value < PREV(value, 2),
           r AS event_type = 'purchase'
    """
    rows = [
        (1, 0, "click", 10.0),
        (1, 5, "click", 9.5),
        (1, 10, "click", 8.0),
        (1, 15, "purchase", 1.0),
    ]
    df, _ = _mkdf(spark, rows)
    out = match_recognize(df, sql).collect()
    assert [(r["key"], r["anchor_id"]) for r in out] == [(1, 2)]


def test_next_batch(spark):
    # a view whose next row halves the value, then a purchase
    sql = """
    PATTERN ( a -> p )
    WITHIN 6 HOURS
    DEFINE a AS event_type = 'view' AND value >= 2 * NEXT(value),
           p AS event_type = 'purchase'
    """
    rows = [
        (1, 0, "view", 10.0),
        (1, 5, "click", 4.0),
        (1, 10, "purchase", 1.0),
        (2, 0, "view", 10.0),
        (2, 5, "click", 9.0),
        (2, 10, "purchase", 1.0),
    ]
    df, _ = _mkdf(spark, rows)
    out = match_recognize(df, sql).collect()
    assert [(r["key"], r["anchor_id"]) for r in out] == [(1, 0)]


def test_prev_stream_equals_batch(spark):
    rows = [
        # user 1: dip-rebound inside one file
        (1, 0, "click", 10.0),
        (1, 5, "click", 8.0),
        (1, 10, "click", 20.0),
        # user 2: the rebound row lands in the SECOND file while the
        # dip is in the first — the nav tail must cross the chunk
        (2, 0, "click", 9.0),
        (2, 5, "click", 7.0),
        (2, 60, "click", 30.0),
        (2, 65, "click", 2.0),
        # user 3: drop only, no rebound
        (3, 0, "click", 6.0),
        (3, 5, "click", 5.0),
        # user 4: non-click rows sit INSIDE the navigation sequence —
        # PREV sees the physical previous row, not the previous click
        (4, 0, "click", 10.0),
        (4, 5, "view", 100.0),
        (4, 10, "click", 8.0),
        (4, 15, "click", 50.0),
    ]
    g, w = _stream_vs_batch(spark, rows, PREV_SQL)
    assert g == w
    assert len(w) >= 2  # the scenario really matches


def test_prev_stream_equals_batch_with_negation(spark):
    sql = """
    PATTERN ( d -> !x )
    WITHIN 1 HOURS
    DEFINE d AS event_type = 'click' AND value < PREV(value),
           x AS event_type = 'error'
    """
    rows = [
        (1, 0, "click", 10.0),
        (1, 5, "click", 8.0),   # dip, no error after -> match
        (2, 0, "click", 10.0),
        (2, 5, "click", 8.0),   # dip, error follows -> killed
        (2, 10, "error", 0.0),
    ]
    g, w = _stream_vs_batch(spark, rows, sql)
    assert g == w
    assert len(w) == 1


def test_next_on_stream_raises(spark):
    sdf = spark.readStream.format("rate").load().selectExpr(
        "value AS event_id",
        "timestamp AS ts",
        "value % 5 AS user_id",
        "'click' AS event_type",
        "CAST(value AS DOUBLE) AS value",
        "'{}' AS props",
    )
    sql = """
    PATTERN ( a -> b )
    WITHIN 1 HOURS
    DEFINE a AS value > NEXT(value),
           b AS event_type = 'click'
    """
    with pytest.raises(ValueError, match="NEXT navigation"):
        match_recognize(sdf, sql)


def test_nav_rejections(spark):
    df, _ = _mkdf(spark, [(1, 0, "click", 1.0)])

    def q(define, pattern="( a -> b )"):
        return f"""
        PATTERN {pattern}
        WITHIN 1 HOURS
        DEFINE {define}
        """

    # navigation mixed with a cross-step ref in ONE conjunct
    with pytest.raises(ValueError, match="mixes PREV/NEXT"):
        match_recognize(
            df, q("a AS value > 0, b AS b.value > a.value + PREV(value)")
        )
    # IS NULL outside the restricted grammar
    with pytest.raises(ValueError, match="restricted"):
        match_recognize(
            df, q("a AS PREV(value) IS NULL, b AS value > 0")
        )
    # function calls other than abs()
    with pytest.raises(ValueError, match="restricted"):
        match_recognize(
            df, q("a AS sqrt(value) > PREV(value), b AS value > 0")
        )
    # abs() IS allowed
    out = match_recognize(
        df, q("a AS abs(value) > abs(PREV(value)), b AS value > 0")
    )
    assert out.count() == 0
    # offset must be >= 1
    with pytest.raises(ValueError, match="offset must be >= 1"):
        match_recognize(df, q("a AS value > PREV(value, 0), b AS value > 0"))
    # nav + quantifier expansion
    with pytest.raises(ValueError, match="not supported with"):
        match_recognize(
            df,
            q("a AS value > PREV(value), b AS value > 0", "( a -> b? )"),
        )


def test_prev_string_literal_not_rewritten(spark):
    # a 'PREV(' inside a string literal is data, not navigation
    rows = [(1, 0, "PREV(x)", 1.0), (1, 5, "purchase", 1.0)]
    df, _ = _mkdf(spark, rows)
    sql = """
    PATTERN ( a -> b )
    WITHIN 1 HOURS
    DEFINE a AS event_type = 'PREV(x)',
           b AS event_type = 'purchase'
    """
    out = match_recognize(df, sql).collect()
    assert len(out) == 1


def test_prev_stream_out_of_order_arrival(spark):
    """Rows arriving out of ts order across micro-batches (but inside
    the watermark) must still navigate in (ts, event_id) order: the
    buffer sorts before maturation and the nav tail is built from
    RELEASED order, not arrival order."""
    from spark_cep_spark.streaming import harness

    data = [
        # arrival file 1: the dip's REBOUND and the anchor, no dip yet
        [
            (0, T0, 1, "click", 10.0, "{}"),
            (2, T0 + dt.timedelta(minutes=10), 1, "click", 20.0, "{}"),
        ],
        # arrival file 2: the dip event arrives LATE (ts between them)
        [(1, T0 + dt.timedelta(minutes=5), 1, "click", 8.0, "{}")],
        # far-future tails flush the watermark past every deadline
        [(100, T0 + dt.timedelta(minutes=500), 9, "click", 1.0, "{}")],
        [(101, T0 + dt.timedelta(minutes=1000), 9, "click", 1.0, "{}")],
    ]
    d = tempfile.mkdtemp()
    for i, chunk in enumerate(data):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, f"f{i}")
        )
        time.sleep(1.05)
    sdf = (
        spark.readStream.schema(
            spark.read.parquet(os.path.join(d, "f0")).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "f*"))
    )
    # watermark 30 minutes: the late dip (5 min behind) is inside it
    got = harness.run_available_now(
        match_recognize(sdf, PREV_SQL, watermark="30 minutes"), "append"
    )
    rows = sorted(
        (r["key"], r["anchor_id"])
        for r in got.filter("key <> 9").collect()
    )
    # ts order is 10, 8(dip), 20(rebound): one match anchored at e1
    assert rows == [(1, 1)]


MULTIKEY_SQL = """
PATTERN ( a -> b )
WITHIN 2 HOURS
DEFINE a AS value > 80,
       b AS value > 80
PARTITION BY user_id, event_type
ORDER BY ts
"""


def test_multikey_stream_equals_batch(spark):
    """Composite PARTITION BY on the streaming engine: the struct
    grouping key flows through applyInPandasWithState and the output
    flattens to key_<col> columns identical to the batch plan."""
    from spark_cep_spark.streaming import harness

    rows = [
        # user 1: two >80 clicks (match) with a >80 view between them
        # (different sub-stream — must NOT break the click sequence,
        # and the two views also match within their own partition)
        (1, 0, "click", 90.0),
        (1, 5, "view", 95.0),
        (1, 10, "click", 85.0),
        (1, 15, "view", 99.0),
        # user 2: >80 events of DIFFERENT types only -> no match
        (2, 0, "click", 90.0),
        (2, 5, "view", 90.0),
    ]
    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, v, "{}")
        for i, (u, m, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, SCHEMA)
    d = tempfile.mkdtemp()
    half = (len(data) + 1) // 2
    files = [data[:half], data[half:]] + [
        [(100 + j, T0 + dt.timedelta(minutes=mm), 9, "click", 99.0, "{}")]
        for j, mm in enumerate((500, 1000))
    ]
    for i, chunk in enumerate(files):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, f"f{i}")
        )
        time.sleep(1.05)
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "f*"))
    )
    got = harness.run_available_now(
        match_recognize(sdf, MULTIKEY_SQL, watermark="0 seconds"),
        "append",
    )
    want = match_recognize(df, MULTIKEY_SQL)
    g = sorted(
        tuple(r) for r in got.filter("key_user_id <> 9").collect()
    )
    w = sorted(
        tuple(r)
        for r in want.filter("key_user_id <> 9")
        .select(*got.columns)
        .collect()
    )
    assert g == w
    assert len(w) == 2  # (1, click) and (1, view) both match


def test_multikey_rejections(spark):
    df = spark.createDataFrame(
        [(0, T0, 1, "click", 1.0, "{}")], SCHEMA
    )
    with pytest.raises(ValueError, match="multi-column PARTITION BY"):
        match_recognize(
            df,
            """
            PATTERN ( a -> b? )
            WITHIN 1 HOURS
            DEFINE a AS value > 0, b AS value > 1
            PARTITION BY user_id, event_type
            """,
        )
    with pytest.raises(ValueError, match="lists a column twice"):
        match_recognize(
            df,
            """
            PATTERN ( a -> b )
            WITHIN 1 HOURS
            DEFINE a AS value > 0, b AS value > 1
            PARTITION BY user_id, user_id
            """,
        )


def test_string_key_stream_equals_batch(spark):
    """A plain STRING partition key through the streaming NFA (the
    key output field takes the input's type — it was long-only before
    round 6b)."""
    from spark_cep_spark.streaming import harness

    sql = """
    PATTERN ( a -> b )
    WITHIN 1 HOURS
    DEFINE a AS value > 95,
           b AS value > 95
    PARTITION BY event_type
    ORDER BY ts
    """
    rows = [
        (1, 0, "click", 99.0),
        (2, 10, "click", 97.0),   # second high click -> match
        (1, 5, "view", 99.0),     # lone high view -> no match
        (3, 20, "view", 10.0),
    ]
    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, v, "{}")
        for i, (u, m, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, SCHEMA)
    d = tempfile.mkdtemp()
    files = [data[:2], data[2:]] + [
        [(100 + j, T0 + dt.timedelta(minutes=mm), 9, "tail", 1.0, "{}")]
        for j, mm in enumerate((500, 1000))
    ]
    for i, chunk in enumerate(files):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, f"f{i}")
        )
        time.sleep(1.05)
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "f*"))
    )
    got = harness.run_available_now(
        match_recognize(sdf, sql, watermark="0 seconds"), "append"
    )
    want = match_recognize(df, sql)
    g = sorted(tuple(r) for r in got.filter("key <> 'tail'").collect())
    w = sorted(
        tuple(r)
        for r in want.filter("key <> 'tail'").select(*got.columns).collect()
    )
    assert g == w
    assert [r[0] for r in w] == ["click"]


ALL_ROWS_SQL = """
PATTERN ( v -> c )
WITHIN 1 HOURS
DEFINE v AS event_type = 'view',
       c AS event_type = 'click'
ALL ROWS PER MATCH
"""


def test_all_rows_clause_stream_equals_batch(spark):
    """The ALL ROWS PER MATCH dialect clause on a stream: emit_ids +
    unpivot compose on the streaming match output."""
    from spark_cep_spark.streaming import harness

    rows = [
        (1, 0, "view", 1.0),
        (1, 5, "click", 2.0),
        (2, 0, "view", 1.0),   # no click -> no rows
    ]
    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, v, "{}")
        for i, (u, m, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, SCHEMA)
    d = tempfile.mkdtemp()
    files = [data, [(100, T0 + dt.timedelta(minutes=500), 9, "view", 1.0, "{}")],
             [(101, T0 + dt.timedelta(minutes=1000), 9, "view", 1.0, "{}")]]
    for i, chunk in enumerate(files):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            os.path.join(d, f"f{i}")
        )
        time.sleep(1.05)
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "f*"))
    )
    got = harness.run_available_now(
        match_recognize(sdf, ALL_ROWS_SQL, watermark="0 seconds"),
        "append",
    )
    want = match_recognize(df, ALL_ROWS_SQL)
    g = sorted(tuple(r) for r in got.filter("key <> 9").collect())
    w = sorted(
        tuple(r)
        for r in want.filter("key <> 9").select(*got.columns).collect()
    )
    assert g == w
    assert [(r[2], r[3]) for r in w] == [(1, "v"), (2, "c")]


def test_all_rows_clause_rejections(spark):
    df = spark.createDataFrame([(0, T0, 1, "view", 1.0, "{}")], SCHEMA)
    # narrowed in round 10: universal-set aggregates now compose with
    # ALL ROWS PER MATCH; only step-QUALIFIED measures stay rejected
    with pytest.raises(ValueError, match="step-qualified MEASURES"):
        match_recognize(
            df,
            """
            PATTERN ( v -> c )
            WITHIN 1 HOURS
            DEFINE v AS event_type = 'view', c AS event_type = 'click'
            MEASURES c.value AS cv
            ALL ROWS PER MATCH
            """,
        )
    with pytest.raises(ValueError, match="one_or_more"):
        match_recognize(
            df,
            """
            PATTERN ( v -> c+ )
            WITHIN 1 HOURS
            DEFINE v AS event_type = 'view', c AS event_type = 'click'
            ALL ROWS PER MATCH
            """,
        )
    with pytest.raises(ValueError, match="not supported with"):
        match_recognize(
            df,
            """
            PATTERN ( v -> c? -> p )
            WITHIN 1 HOURS
            DEFINE v AS event_type = 'view', c AS event_type = 'click',
                   p AS event_type = 'purchase'
            ALL ROWS PER MATCH
            """,
        )
    with pytest.raises(ValueError, match="at most one rows-per-match"):
        match_recognize(
            df,
            """
            PATTERN ( v -> c )
            WITHIN 1 HOURS
            DEFINE v AS event_type = 'view', c AS event_type = 'click'
            ONE ROW PER MATCH
            ALL ROWS PER MATCH
            """,
        )


# ------------------------------------------------------------------
# pure nav kernel (advance_nav) — chunking invariance, no SparkSession
# ------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=120, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(-5, 5)), min_size=0, max_size=24
    ),
    k=st.integers(1, 3),
    cuts=st.lists(st.integers(0, 23), max_size=4),
)
def test_advance_nav_chunking_invariant(vals, k, cuts):
    """Feeding the same released sequence through advance_nav in ANY
    chunking yields identical flags and final tail: the tail after a
    prefix IS the resume state."""
    from spark_cep_spark.streaming.nfa import (
        _compile_where_py,
        advance_nav,
    )

    fn = _compile_where_py(f"CUR.v > __PREVROW{k}.v", "CUR")
    navs = [(0, (fn, ["v"], k, False))]

    def entries():
        return [
            [t, t, [True], [v]] for t, v in enumerate(vals)
        ]  # base=3: no val_cols

    tail1, out1 = advance_nav([], entries(), navs, ["v"], k, 3)
    flags1 = [e[2][0] for e in out1]

    bounds = sorted({c for c in cuts if c <= len(vals)} | {0, len(vals)})
    tail2: list = []
    flags2: list = []
    es = entries()
    for a, b in zip(bounds, bounds[1:]):
        tail2, out = advance_nav(tail2, es[a:b], navs, ["v"], k, 3)
        flags2 += [e[2][0] for e in out]
    assert flags1 == flags2
    assert tail1 == tail2
    # referee: brute-force lag semantics (NULL prev -> unsatisfied)
    want = [
        v is not None
        and i >= k
        and vals[i - k] is not None
        and v > vals[i - k]
        for i, v in enumerate(vals)
    ]
    assert flags1 == want


def test_prev_on_braced_step_batch(spark):
    """An explicit {2} repetition inherits its root DEFINE's
    navigation on every sub-step (name_1/name_2 attr attachment)."""
    sql = """
    PATTERN ( s -> d{2} )
    WITHIN 2 HOURS
    DEFINE s AS event_type = 'signup',
           d AS value < PREV(value)
    """
    rows = [
        (1, 0, "signup", 100.0),
        (1, 5, "click", 90.0),   # drop 1 (vs 100)
        (1, 10, "click", 80.0),  # drop 2 (vs 90) -> match
        (2, 0, "signup", 100.0),
        (2, 5, "click", 90.0),   # drop 1
        (2, 10, "click", 95.0),  # rise -> no second drop
    ]
    df, _ = _mkdf(spark, rows)
    out = match_recognize(df, sql).collect()
    assert [(r["key"], r["anchor_id"]) for r in out] == [(1, 0)]
