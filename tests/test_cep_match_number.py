"""SQL-standard MATCH_NUMBER() / CLASSIFIER() in the MATCH_RECOGNIZE
dialect: MATCH_NUMBER numbers matches 1, 2, ... per key in start
order (both output modes, both engines — batch via a per-key window
over the match output, streaming via advance_match_number's
hold-until-mature counter, or a bare counter when a skip policy
already releases in start order); CLASSIFIER names the pattern
variable each ALL-ROWS output row bound (the unpivot's step column).
Kernel tests assert chunking invariance without a SparkSession."""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import time

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_cep_spark.operators.cep_sql import (
    match_recognize,
    parse_pattern_sql,
)
from spark_cep_spark.streaming.nfa import advance_match_number

T0 = dt.datetime(2024, 1, 1)
SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

MN_SKIP_SQL = """
PATTERN ( V -> P )
WITHIN 2 HOURS
DEFINE V AS event_type = 'view',
       P AS event_type = 'purchase'
MEASURES MATCH_NUMBER() AS mn
AFTER MATCH SKIP PAST LAST ROW
"""

MN_EMITALL_SQL = """
PATTERN ( V -> P )
WITHIN 2 HOURS
DEFINE V AS event_type = 'view',
       P AS event_type = 'purchase'
MEASURES MATCH_NUMBER() AS mn
"""

CLS_SQL = """
PATTERN ( V -> P )
WITHIN 2 HOURS
DEFINE V AS event_type = 'view',
       P AS event_type = 'purchase'
MEASURES CLASSIFIER() AS cls,
         MATCH_NUMBER() AS mn
ALL ROWS PER MATCH
"""


# ---------------------------------------------------------------------------
# Parse-level contract


def test_classifier_requires_all_rows():
    with pytest.raises(ValueError, match="requires ALL ROWS"):
        parse_pattern_sql(MN_SKIP_SQL.replace(
            "MATCH_NUMBER() AS mn", "CLASSIFIER() AS cls"
        ))


def test_match_number_listed_twice_rejected():
    with pytest.raises(ValueError, match="listed twice"):
        parse_pattern_sql(MN_EMITALL_SQL.replace(
            "MATCH_NUMBER() AS mn",
            "MATCH_NUMBER() AS a, MATCH_NUMBER() AS b",
        ))


def test_parse_extracts_aliases():
    parsed = parse_pattern_sql(CLS_SQL)
    assert parsed.match_number_alias == "mn"
    assert parsed.classifier_alias == "cls"
    assert parsed.pattern.measures == []  # not routed to measures


def test_match_number_rejected_with_quantifier_expansion(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError, match="not supported with"):
        match_recognize(
            df,
            """
            PATTERN ( V -> P{1,2} )
            WITHIN 1 HOUR
            DEFINE V AS event_type = 'view',
                   P AS event_type = 'purchase'
            MEASURES MATCH_NUMBER() AS mn
            """,
        )


# ---------------------------------------------------------------------------
# Kernel: chunking invariance


def _brute_number(entries):
    out = sorted(entries, key=lambda m: (m[0], m[1]))
    return [(i + 1, m[2]) for i, m in enumerate(out)]


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 10)),
        min_size=0,
        max_size=12,
    ),
    st.lists(st.integers(min_value=0, max_value=12), max_size=4),
)
def test_match_number_kernel_chunking_invariance(raw, cuts):
    """Any chunking of the completion stream yields the one-shot
    start-order numbering. Stream model = the NFA contract: a match
    completes within start + bound, arrival is completion order, the
    watermark after a chunk is the max completion seen, and a chunk
    boundary never splits equal-watermark completions."""
    B = 10
    entries = [[s, i, ["p", i]] for i, (s, d) in enumerate(raw)]
    ends = {i: s + d for i, (s, d) in enumerate(raw)}
    want = _brute_number(entries)

    arrival = sorted(entries, key=lambda m: (ends[m[1]], m[1]))
    valid = [
        c
        for c in range(1, len(arrival))
        if ends[arrival[c - 1][1]] < ends[arrival[c][1]]
    ]
    bounds = sorted({valid[c % len(valid)] for c in cuts} if valid else set())
    chunks, prev = [], 0
    for c in bounds + [len(arrival)]:
        chunks.append(arrival[prev:c])
        prev = c
    pending, nxt, got = [], 1, []
    wm = 0
    for ch in chunks:
        if ch:
            wm = max(wm, max(ends[m[1]] for m in ch))
        pending, nxt, out = advance_match_number(pending, nxt, ch, wm, B)
        got += out
    pending, nxt, out = advance_match_number(pending, nxt, [], 10_000, B)
    got += out
    assert pending == [] and got == want


# ---------------------------------------------------------------------------
# Batch semantics on a hand-built fixture


def _fixture(spark):
    m = lambda k: T0 + dt.timedelta(minutes=k)
    data = [
        # u1: three non-overlapping view->purchase funnels
        (0, m(0), 1, "view", 1.0, "{}"),
        (1, m(10), 1, "purchase", 1.0, "{}"),
        (2, m(20), 1, "view", 1.0, "{}"),
        (3, m(30), 1, "purchase", 1.0, "{}"),
        (4, m(400), 1, "view", 1.0, "{}"),
        (5, m(410), 1, "purchase", 1.0, "{}"),
        # u2: two OVERLAPPING anchors sharing one purchase — emit-all
        # numbers both; skip-past keeps only the first
        (6, m(0), 2, "view", 1.0, "{}"),
        (7, m(5), 2, "view", 1.0, "{}"),
        (8, m(15), 2, "purchase", 1.0, "{}"),
    ]
    return spark.createDataFrame(data, SCHEMA)


def test_batch_match_number_skip(spark):
    got = {
        (r["key"], r["anchor_id"]): r["mn"]
        for r in match_recognize(_fixture(spark), MN_SKIP_SQL).collect()
    }
    assert got == {(1, 0): 1, (1, 2): 2, (1, 4): 3, (2, 6): 1}


def test_batch_match_number_emit_all(spark):
    got = {
        (r["key"], r["anchor_id"]): r["mn"]
        for r in match_recognize(_fixture(spark), MN_EMITALL_SQL).collect()
    }
    # u2's overlapping anchors both match; start order numbers them
    assert got == {
        (1, 0): 1, (1, 2): 2, (1, 4): 3, (2, 6): 1, (2, 7): 2,
    }


def test_batch_classifier_all_rows(spark):
    rows = match_recognize(_fixture(spark), CLS_SQL).collect()
    # one row per bound event: 5 matches x 2 steps
    assert len(rows) == 10
    assert {r["cls"] for r in rows} == {"V", "P"}
    by_match = {}
    for r in rows:
        by_match.setdefault((r["key"], r["anchor_id"]), set()).add(
            (r["cls"], r["mn"])
        )
    # the match number is replicated onto every row of its match,
    # and each match has exactly one V row and one P row
    for (key, anchor), pairs in by_match.items():
        assert len(pairs) == 2
        assert len({mn for _c, mn in pairs}) == 1


# ---------------------------------------------------------------------------
# Streaming == batch (multi-micro-batch availableNow)


def _stream_vs_batch(spark, rows, sql, tail_type):
    data = [
        (i, T0 + dt.timedelta(minutes=m), u, t, v, "{}")
        for i, (u, m, t, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, SCHEMA)
    d = tempfile.mkdtemp()
    half = (len(data) + 1) // 2
    files = [data[:half], data[half:]] + [
        [(100 + j, T0 + dt.timedelta(minutes=mm), 9, tail_type, 1.0, "{}")]
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


ROWS = [
    (1, 0, "view", 1.0), (1, 10, "purchase", 1.0),
    (1, 20, "view", 1.0), (1, 30, "purchase", 1.0),
    # u2: the overlap case — second anchor's binding shared
    (2, 0, "view", 1.0), (2, 5, "view", 1.0), (2, 15, "purchase", 1.0),
    # u3: late second funnel crosses the file split
    (3, 0, "view", 1.0), (3, 10, "purchase", 1.0),
    (3, 200, "view", 1.0), (3, 215, "purchase", 1.0),
]


def test_stream_match_number_skip_equals_batch(spark):
    g, w = _stream_vs_batch(spark, ROWS, MN_SKIP_SQL, "view")
    assert g == w and len(g) > 0


def test_stream_match_number_emit_all_equals_batch(spark):
    g, w = _stream_vs_batch(spark, ROWS, MN_EMITALL_SQL, "view")
    assert g == w and len(g) > 0


def test_stream_classifier_all_rows_equals_batch(spark):
    g, w = _stream_vs_batch(spark, ROWS, CLS_SQL, "view")
    assert g == w and len(g) > 0


def test_match_number_counter_survives_checkpoint_restart(spark, tmp_path):
    """Kill-and-resume for the MATCH_NUMBER counter: run 1 emits a
    key's match #1 and drains every window (state reduced to the bare
    counter); the restarted run sees a much later match for the SAME
    key and must number it 2 — proving the one-integer counter was
    checkpointed, not reset with the drained window state."""
    import os
    import shutil

    m = lambda k: T0 + dt.timedelta(minutes=k)
    first = [
        (0, m(0), 1, "view", 1.0, "{}"),
        (1, m(10), 1, "purchase", 1.0, "{}"),
    ]
    second = [
        (2, m(3000), 1, "view", 1.0, "{}"),
        (3, m(3010), 1, "purchase", 1.0, "{}"),
    ]
    tails = [
        [(100, m(500), 9, "view", 1.0, "{}")],
        [(101, m(4000), 9, "view", 1.0, "{}")],
        [(102, m(5000), 9, "view", 1.0, "{}")],
    ]
    all_rows = first + second
    df = spark.createDataFrame(all_rows, SCHEMA)
    src = str(tmp_path / "src")
    os.makedirs(src)

    def add_file(name, chunk, order):
        d = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        part = [f for f in os.listdir(d) if f.startswith("part")][0]
        dst = os.path.join(src, f"{name}.parquet")
        shutil.copy(os.path.join(d, part), dst)
        os.utime(dst, (1_700_000_000 + order * 3600,) * 2)

    def run(out, ckpt):
        sdf = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            match_recognize(sdf, MN_EMITALL_SQL, watermark="0 seconds")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    add_file("f0", first, 0)
    add_file("f1", tails[0], 1)
    run(out, ckpt)
    got1 = spark.read.parquet(out).filter("key = 1").collect()
    assert [(r["anchor_id"], r["mn"]) for r in got1] == [(0, 1)]
    add_file("f2", second, 2)
    add_file("f3", tails[1], 3)
    add_file("f4", tails[2], 4)
    run(out, ckpt)
    got = sorted(
        (r["anchor_id"], r["mn"])
        for r in spark.read.parquet(out).filter("key = 1").collect()
    )
    assert got == [(0, 1), (2, 2)]
    want = sorted(
        (r["anchor_id"], r["mn"])
        for r in match_recognize(df, MN_EMITALL_SQL).collect()
    )
    assert got == want


def test_match_number_composite_key_skip(spark):
    """Composite PARTITION BY + AFTER MATCH SKIP + MATCH_NUMBER: the
    partition-wise selector scan must reset its recurrence at STRUCT
    key boundaries (keys arrive as dicts in the mapInPandas pass)."""
    m = lambda k: T0 + dt.timedelta(minutes=k)
    rows = [
        (0, m(0), 1, "view", 90.0, "{}"),
        (1, m(10), 1, "view", 91.0, "{}"),
        (2, m(20), 1, "view", 92.0, "{}"),
        (3, m(0), 2, "view", 95.0, "{}"),
        (4, m(5), 2, "view", 96.0, "{}"),
    ]
    out = match_recognize(
        spark.createDataFrame(rows, SCHEMA),
        """
        PATTERN ( a -> b )
        WITHIN 1 HOURS
        DEFINE a AS value > 80, b AS value > 80
        MEASURES MATCH_NUMBER() AS mn
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id, event_type
        ORDER BY ts
        """,
    ).collect()
    got = sorted((r["key_user_id"], r["anchor_id"], r["mn"]) for r in out)
    assert got == [(1, 0, 1), (2, 3, 1)]
