"""Round-9 batteries.

FINAL/RUNNING MEASURES + ALL ROWS PER MATCH + {- step -} exclusion
composed with the DEFINE-aggregate (run-agg) path (VERDICT r8 items
4-5): the advance_kleene_agg kernel's emit_rows face must (a) emit
per-row records whose RUNNING columns replay the accumulator AT each
row and whose FINAL columns repeat the close state, (b) emit for
exactly the same matches as the ONE ROW face, (c) stay
chunking-invariant with the row buffer in state, and (d) drop excluded
steps' rows from the output WITHOUT touching the measures.
"""

from __future__ import annotations

import datetime as ddt
import shutil
import sys

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")

from spark_cep_spark.registry import QUERIES, load_all  # noqa: E402

load_all()

T0 = ddt.datetime(2026, 2, 1)


def _m(k):
    return T0 + ddt.timedelta(minutes=k)


# ---------------------------------------------------------------------------
# kernel: emit_rows semantics + invariances
# ---------------------------------------------------------------------------


def _mk_rows(evs):
    """evs: (ts, et, v) with et in a/b/c/x -> kernel rows."""
    return [
        [t, i + 1, et == "a", et == "b", v if et == "b" else None, et == "c"]
        for i, (t, et, v) in enumerate(evs)
    ]


def test_kleene_agg_emit_rows_kernel_semantics():
    """Hand-computed emit_rows fixture: per-row records carry
    (cls, running n/s, final n/s, anchor, conf); which matches emit is
    identical to the per-match face."""
    from spark_cep_spark.streaming.nfa import advance_kleene_agg

    bind = lambda n, s, v: s + v <= 40  # noqa: E731
    W = 60
    evs = [
        (0, "a", 0),    # anchor
        (5, "b", 10),   # binds  n=1 s=10
        (10, "x", 0),   # noise
        (15, "b", 20),  # binds  n=2 s=30
        (20, "c", 0),   # confirm
        (25, "a", 0),   # anchor 2
        (30, "b", 50),  # bind fails -> run dies
        (35, "c", 0),   # nothing to confirm
    ]
    rows = _mk_rows(evs)
    _, per_match = advance_kleene_agg(
        None, rows, 1 << 62, bind, W, confirm=True
    )
    assert per_match == [[0, 2, 30, 20]]
    _, per_row = advance_kleene_agg(
        None, rows, 1 << 62, bind, W, confirm=True, emit_rows=True
    )
    # [row_ts, row_eid, cls, n_run, s_run, n_fin, s_fin, anchor, conf]
    assert per_row == [
        [0, 1, 0, 0, 0, 2, 30, 0, 20],
        [5, 2, 1, 1, 10, 2, 30, 0, 20],
        [15, 4, 1, 2, 30, 2, 30, 0, 20],
        [20, 5, 2, 2, 30, 2, 30, 0, 20],
    ]


def test_kleene_agg_emit_rows_two_step_and_bounds():
    """2-step shape: close (bind-fail / watermark / max saturation)
    emits the buffered rows with conf=None; max_n completes greedily
    AT the saturating row."""
    from spark_cep_spark.streaming.nfa import advance_kleene_agg

    bind = lambda n, s, v: True  # noqa: E731
    W = 60
    evs = [(0, "a", 0), (5, "b", 10), (10, "b", 20), (15, "b", 30)]
    rows = _mk_rows(evs)
    _, out = advance_kleene_agg(
        None, rows, 1 << 62, bind, W, emit_rows=True, max_n=2
    )
    assert out == [
        [0, 1, 0, 0, 0, 2, 30, 0, None],
        [5, 2, 1, 1, 10, 2, 30, 0, None],
        [10, 3, 1, 2, 30, 2, 30, 0, None],
    ]
    # min_n gate: a run closing below min emits NOTHING (no rows)
    _, out2 = advance_kleene_agg(
        None, rows[:2], 1 << 62, bind, W, emit_rows=True, min_n=3
    )
    assert out2 == []


def test_filter_excluded_rows_shared_helper():
    from spark_cep_spark.streaming.nfa import filter_excluded_rows

    recs = [
        [0, 1, 0, 0, 0, 2, 30, 0, 20],
        [5, 2, 1, 1, 10, 2, 30, 0, 20],
        [20, 5, 2, 2, 30, 2, 30, 0, 20],
    ]
    assert filter_excluded_rows(recs, ()) == recs
    assert filter_excluded_rows(recs, (1,)) == [recs[0], recs[2]]
    assert filter_excluded_rows(recs, (0, 2)) == [recs[1]]


@given(
    st.lists(
        st.tuples(
            st.integers(0, 50),
            st.sampled_from(["a", "b", "c", "x"]),
            st.integers(1, 30),
        ),
        min_size=1,
        max_size=40,
    ),
    st.lists(st.integers(1, 39), max_size=4),
    st.booleans(),
)
@settings(max_examples=150, deadline=None)
def test_kleene_agg_emit_rows_chunking_invariance(evs, cuts, confirm):
    """Any micro-batch chunking (monotone watermarks at boundaries)
    emits exactly the whole-stream per-row records — the row buffer
    lives in state, so matches spanning chunk boundaries must
    reassemble byte-identically."""
    from spark_cep_spark.streaming.nfa import advance_kleene_agg

    bind = lambda n, s, v: s + v <= 40  # noqa: E731
    W = 60
    t = 0
    rows = []
    for i, (dt, et, v) in enumerate(evs):
        t += dt
        rows.append(
            [t, i + 1, et == "a", et == "b",
             v if et == "b" else None, et == "c"]
        )
    kw = dict(confirm=confirm, emit_rows=True)
    _, whole = advance_kleene_agg(None, rows, 1 << 62, bind, W, **kw)
    bounds = sorted({min(c, len(rows)) for c in cuts} | {len(rows)})
    stt, got, prev = None, [], 0
    for b in bounds:
        chunk = rows[prev:b]
        wm = chunk[-1][0] if chunk else (rows[prev - 1][0] if prev else 0)
        stt, part = advance_kleene_agg(stt, chunk, wm, bind, W, **kw)
        got += part
        prev = b
    stt, part = advance_kleene_agg(stt, [], 1 << 62, bind, W, **kw)
    got += part
    assert got == whole


@given(
    st.lists(
        st.tuples(
            st.integers(0, 50),
            st.sampled_from(["a", "b", "c", "x"]),
            st.integers(1, 30),
        ),
        min_size=1,
        max_size=40,
    ),
    st.booleans(),
)
@settings(max_examples=150, deadline=None)
def test_emit_rows_match_set_equals_per_match_face(evs, confirm):
    """emit_rows only WIDENS emissions: grouping the per-row records
    by (anchor, conf) reproduces the per-match face exactly — same
    matches, same final aggregates."""
    from spark_cep_spark.streaming.nfa import advance_kleene_agg

    bind = lambda n, s, v: s + v <= 40  # noqa: E731
    W = 60
    t = 0
    rows = []
    for i, (dt, et, v) in enumerate(evs):
        t += dt
        rows.append(
            [t, i + 1, et == "a", et == "b",
             v if et == "b" else None, et == "c"]
        )
    _, per_match = advance_kleene_agg(
        None, rows, 1 << 62, bind, W, confirm=confirm
    )
    _, per_row = advance_kleene_agg(
        None, rows, 1 << 62, bind, W, confirm=confirm, emit_rows=True
    )
    seen = []
    for r in per_row:
        key = [r[7], r[5], r[6]] + ([r[8]] if confirm else [])
        if key not in seen:
            seen.append(key)
    assert seen == per_match
    # per-match rows: anchor + n_fin bound rows (+ confirm row)
    expect_rows = sum(1 + m[1] + (1 if confirm else 0) for m in per_match)
    assert len(per_row) == expect_rows


# ---------------------------------------------------------------------------
# dialect: small fixtures through the full parse -> compile path
# ---------------------------------------------------------------------------

_RAM_TEXT = """
    PATTERN ( A -> B+ -> C )
    WITHIN 2 HOURS
    DEFINE A AS event_type = 'signup',
           B AS event_type = 'view' AND SUM(B.cents) <= 600,
           C AS event_type = 'purchase'
    MEASURES RUNNING COUNT(B.cents) AS n_so_far,
             RUNNING SUM(B.cents) AS sum_so_far,
             FINAL SUM(B.cents) AS total,
             FINAL COUNT(B.cents) AS n_total
    ALL ROWS PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PARTITION BY user_id
    ORDER BY ts
"""

_RAX_TEXT = """
    PATTERN ( A -> {- B+ -} -> C )
    WITHIN 2 HOURS
    DEFINE A AS event_type = 'signup',
           B AS event_type = 'view' AND SUM(B.cents) <= 600,
           C AS event_type = 'purchase'
    MEASURES CLASSIFIER() AS cls,
             FINAL COUNT(B.cents) AS n_b,
             FINAL SUM(B.cents) AS total
    ALL ROWS PER MATCH
    AFTER MATCH SKIP PAST LAST ROW
    PARTITION BY user_id
    ORDER BY ts
"""


def _fixture_df(spark):
    rows = [
        # user 1: full match (anchor, 2 binds, confirm)
        (1, _m(0), 1, "signup", 1.0),
        (2, _m(10), 1, "view", 1.0),
        (3, _m(20), 1, "view", 2.0),
        (4, _m(30), 1, "purchase", 9.0),
        # user 2: bind fails (700 > 600) -> run dies, no match
        (5, _m(0), 2, "signup", 1.0),
        (6, _m(10), 2, "view", 7.0),
        (7, _m(20), 2, "purchase", 9.0),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    ).withColumn("cents", F.round(F.col("value") * 100).cast("long"))


def test_cep_sql_run_agg_measures_small_fixture(spark):
    from spark_cep_spark.operators.cep_sql import match_recognize

    got = sorted(
        tuple(r) for r in match_recognize(_fixture_df(spark), _RAM_TEXT).collect()
    )
    assert got == [
        (1, _m(0), 1, 0, None, 300, 2),
        (1, _m(10), 2, 1, 100, 300, 2),
        (1, _m(20), 3, 2, 300, 300, 2),
        (1, _m(30), 4, 2, 300, 300, 2),
    ]


def test_cep_sql_run_agg_exclusion_small_fixture(spark):
    from spark_cep_spark.operators.cep_sql import match_recognize

    got = sorted(
        tuple(r) for r in match_recognize(_fixture_df(spark), _RAX_TEXT).collect()
    )
    assert got == [
        (1, _m(0), 1, "A", 2, 300),
        (1, _m(30), 4, "C", 2, 300),
    ]


def test_run_agg_all_rows_default_measures(spark):
    """No MEASURES: ALL ROWS defaults to the RUNNING count/sum twins
    (the SQL standard's bare-aggregate semantics)."""
    from spark_cep_spark.operators.cep_sql import match_recognize

    out = match_recognize(
        _fixture_df(spark),
        """
        PATTERN ( A -> B+ -> C )
        WITHIN 2 HOURS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'view' AND SUM(B.cents) <= 600,
               C AS event_type = 'purchase'
        ALL ROWS PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    )
    assert out.columns == ["key", "ts", "event_id", "B_count", "B_sum_cents"]
    got = sorted(tuple(r) for r in out.collect())
    assert got == [
        (1, _m(0), 1, 0, None),
        (1, _m(10), 2, 1, 100),
        (1, _m(20), 3, 2, 300),
        (1, _m(30), 4, 2, 300),
    ]


def test_run_agg_rows_pointed_errors(spark):
    from spark_cep_spark.operators.cep_sql import parse_pattern_sql

    # MATCH_NUMBER() composes with the run-agg path (round 9 —
    # assign_match_numbers): the alias lands as the 'mn' kind
    p_mn = parse_pattern_sql(
        """
        PATTERN ( A -> B+ )
        WITHIN 1 HOURS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'view' AND SUM(B.cents) <= 600
        MEASURES MATCH_NUMBER() AS mn
        ALL ROWS PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        """
    )
    assert ("mn", "mn") in p_mn.run_agg[4]
    # SUM(B.*) is malformed — the generic validator refuses the bare
    # star form (only COUNT(B.*) is rewritten through)
    with pytest.raises(ValueError, match="SUM|unqualified"):
        parse_pattern_sql(
            """
            PATTERN ( A -> B+ )
            WITHIN 1 HOURS
            DEFINE A AS event_type = 'signup',
                   B AS event_type = 'view' AND SUM(B.cents) <= 600
            MEASURES SUM(B.*) AS s
            AFTER MATCH SKIP PAST LAST ROW
            """
        )
    # COUNT(B.*) parses — the standard count-the-run form
    p = parse_pattern_sql(
        """
        PATTERN ( A -> B+ )
        WITHIN 1 HOURS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'view' AND SUM(B.cents) <= 600
        MEASURES COUNT(B.*) AS nb
        AFTER MATCH SKIP PAST LAST ROW
        """
    )
    assert p.run_agg[4] == [("nb", "n")]
    # FINAL/RUNNING on the NON-run-agg path: lifted in round 10 — the
    # prefix peels to a no-op in ONE ROW mode (the output row is the
    # match's last, where RUNNING == FINAL on a step-qualified ref)
    p_fr = parse_pattern_sql(
        """
        PATTERN ( v -> c )
        WITHIN 1 HOURS
        DEFINE v AS event_type = 'view', c AS event_type = 'click'
        MEASURES FINAL c.value AS cv
        """
    )
    assert ("cv", "c.value") in p_fr.pattern.measures
    # ...while step-qualified measures under ALL ROWS stay rejected
    with pytest.raises(ValueError, match="step-qualified MEASURES"):
        parse_pattern_sql(
            """
            PATTERN ( v -> c )
            WITHIN 1 HOURS
            DEFINE v AS event_type = 'view', c AS event_type = 'click'
            MEASURES FINAL c.value AS cv
            ALL ROWS PER MATCH
            """
        )
    # exclusion without ALL ROWS stays rejected
    with pytest.raises(ValueError, match="exclusion requires ALL ROWS"):
        parse_pattern_sql(
            """
            PATTERN ( A -> {- B+ -} -> C )
            WITHIN 1 HOURS
            DEFINE A AS event_type = 'signup',
                   B AS event_type = 'view' AND SUM(B.cents) <= 600,
                   C AS event_type = 'purchase'
            AFTER MATCH SKIP PAST LAST ROW
            """
        )


def test_exclusion_consistent_with_measures_key(spark, sf_dir):
    """The exclusion key's rows are exactly the measures key's
    anchor/confirm rows (same matches, same FINAL values) — the two
    registered keys must agree because they share every kernel
    decision and differ only in the output filter."""
    qm = QUERIES["cep_sql_run_agg_measures"]
    qx = QUERIES["cep_sql_run_agg_exclusion"]
    m = qm(spark, sf_dir).collect()
    x = qx(spark, sf_dir).collect()
    # measures key: anchor rows have n_so_far=0; confirm rows have
    # n_so_far == n_total AND event follows the last bind — identify
    # A/C rows as (first row, last row) per (user, total, n_total)
    # via the exclusion key instead: every exclusion row must appear
    # in the measures key's output with matching FINAL values.
    m_set = {(r.user_id, r.ts, r.event_id, r.n_total, r.total) for r in m}
    for r in x:
        assert (r.user_id, r.ts, r.event_id, r.n_b, r.total) in m_set
    # 2 rows per match in the exclusion key; match count agrees
    n_matches_m = sum(1 for r in m if r.n_so_far == 0)
    assert len(x) == 2 * n_matches_m > 0


# ---------------------------------------------------------------------------
# streaming == batch (multi-micro-batch AvailableNow)
# ---------------------------------------------------------------------------


def _staged_stream_pair(spark, sf_dir, text):
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
        return df.filter(
            "user_id IS NOT NULL AND ts IS NOT NULL "
            "AND (value IS NULL OR abs(value) <= 1e9)"
        ).selectExpr(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            "CAST(round(value * 100) AS LONG) AS cents",
        )

    stream = prep(
        harness.events_stream(spark, staged, max_files_per_trigger=2)
    )
    got = {
        tuple(r)
        for r in harness.run_available_now(
            match_recognize(stream, text, watermark="0 seconds"), "append"
        )
        .filter("key <> -1")
        .collect()
    }
    batch = prep(spark.read.parquet(staged)).filter("user_id <> -1")
    want = {tuple(r) for r in match_recognize(batch, text).collect()}
    return got, want


_RAM_SF_TEXT = _RAM_TEXT.replace("2 HOURS", "7 DAYS").replace("600", "25000")
_RAX_SF_TEXT = _RAX_TEXT.replace("2 HOURS", "7 DAYS").replace("600", "25000")


def test_cep_sql_run_agg_measures_streaming_equals_batch(spark, sf_dir):
    got, want = _staged_stream_pair(spark, sf_dir, _RAM_SF_TEXT)
    assert got == want and len(want) > 0


def test_cep_sql_run_agg_exclusion_streaming_equals_batch(spark, sf_dir):
    got, want = _staged_stream_pair(spark, sf_dir, _RAX_SF_TEXT)
    assert got == want and len(want) > 0


# ---------------------------------------------------------------------------
# pipeline_e2e (round-9 verdict item 7)
# ---------------------------------------------------------------------------


def test_pipeline_e2e_stage_consistency(spark, sf_dir):
    """The composed key must agree with its own stages run standalone:
    survivors are exactly (gopher keep ∩ exact keepers ∩ simhash
    keep-first), one output row each, every column well-formed."""
    from spark_cep_spark.io import table
    from spark_cep_spark.operators.llm_dedup import (
        exact_keepers,
        simhash_md5_fp,
    )
    from spark_cep_spark.operators.llm_text import gopher_stats
    from pyspark.sql import Window as W

    out = QUERIES["pipeline_e2e"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    ids = [r.doc_id for r in rows]
    assert len(ids) == len(set(ids))  # one row per survivor

    d = table(spark, sf_dir, "documents")
    kept = d.join(
        gopher_stats(d).filter("keep").select("doc_id"), "doc_id"
    )
    kept = kept.join(exact_keepers(kept).select("doc_id"), "doc_id")
    wn = W.partitionBy("simhash").orderBy("doc_id")
    near = (
        simhash_md5_fp(kept)
        .withColumn("rn", F.row_number().over(wn))
        .filter("rn = 1")
        .select("doc_id")
    )
    want = sorted(
        r.doc_id for r in kept.join(near, "doc_id").select("doc_id").collect()
    )
    assert sorted(ids) == want

    for r in rows:
        assert r.bucket in ("head", "middle", "tail")
        assert r.bucket_id in (1, 2, 3)
        # n_toks counts whitespace tokens (dsir), n_tokens counts BPE
        # symbols over [a-z]+ runs — different token definitions, so
        # only positivity is a guaranteed property
        assert r.n_toks > 0 and r.n_tokens > 0
        assert r.weight is not None


def test_pipeline_e2e_filters_actually_filter(spark, sf_dir):
    """The e2e survivor count is strictly below the document count
    (the fixture contains sub-10-word docs and exact/near dups by
    construction) — guards against a stage silently passing through."""
    from spark_cep_spark.io import table

    n_docs = table(spark, sf_dir, "documents").count()
    n_surv = QUERIES["pipeline_e2e"](spark, sf_dir).count()
    assert 0 < n_surv < n_docs


# ---------------------------------------------------------------------------
# MATCH_NUMBER() on the run-agg path
# ---------------------------------------------------------------------------

_RMN_TEXT = """
    PATTERN ( A -> B+ -> C )
    WITHIN 7 DAYS
    DEFINE A AS event_type = 'signup',
           B AS event_type = 'view' AND SUM(B.cents) <= 25000,
           C AS event_type = 'purchase'
    MEASURES MATCH_NUMBER() AS mn,
             C.ts AS confirm_ts,
             COUNT(B.cents) AS n_b,
             SUM(B.cents) AS total
    AFTER MATCH SKIP PAST LAST ROW
    PARTITION BY user_id
    ORDER BY ts
"""


def test_assign_match_numbers_helper():
    from spark_cep_spark.streaming.nfa import assign_match_numbers

    per_match = [[0, 2, 30, 20], [100, 1, 10, 120]]
    assert assign_match_numbers(per_match, False, 3) == 5
    assert [r[-1] for r in per_match] == [4, 5]
    per_row = [
        [0, 1, 0, 0, 0, 1, 10, 0, 20],
        [5, 2, 1, 1, 10, 1, 10, 0, 20],
        [20, 5, 2, 1, 10, 0, 20, 0, 20],
        [30, 6, 0, 0, 0, 1, 5, 30, 40],
        [40, 8, 2, 1, 5, 1, 5, 30, 40],
    ]
    assert assign_match_numbers(per_row, True, 0) == 2
    assert [r[-1] for r in per_row] == [1, 1, 1, 2, 2]


def test_run_agg_match_number_small_fixture(spark):
    """Two sequential matches for user 1 number 1, 2; user 2's single
    match numbers 1 — numbering is per key, in close order."""
    from spark_cep_spark.operators.cep_sql import match_recognize

    rows = [
        (1, _m(0), 1, "signup", 1.0),
        (2, _m(10), 1, "view", 1.0),
        (3, _m(30), 1, "purchase", 9.0),
        (4, _m(40), 1, "signup", 1.0),
        (5, _m(50), 1, "view", 2.0),
        (6, _m(60), 1, "purchase", 9.0),
        (7, _m(0), 2, "signup", 1.0),
        (8, _m(10), 2, "view", 3.0),
        (9, _m(20), 2, "purchase", 9.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    ).withColumn("cents", F.round(F.col("value") * 100).cast("long"))
    got = sorted(
        (r.key, r.mn, r.n_b, r.total)
        for r in match_recognize(df, _RMN_TEXT).collect()
    )
    assert got == [(1, 1, 1, 100), (1, 2, 1, 200), (2, 1, 1, 300)]


def test_run_agg_match_number_streaming_equals_batch(spark, sf_dir):
    """The per-key counter persists across micro-batches: numbers
    assigned over 3 AvailableNow batches equal the batch numbering."""
    got, want = _staged_stream_pair(spark, sf_dir, _RMN_TEXT)
    assert got == want and len(want) > 0
    # and numbering is dense 1..k per key in both
    from collections import defaultdict

    per_key = defaultdict(list)
    for r in want:  # columns: key, confirm_ts, n_b, total, mn (mn last)
        per_key[r[0]].append(r[-1])
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in per_key.values())


# ---------------------------------------------------------------------------
# stream_asof_enrich (temporal join)
# ---------------------------------------------------------------------------


def test_asof_enrich_kernel_semantics():
    from spark_cep_spark.streaming.nfa import advance_asof_enrich

    rows = [
        [0, 1, False, None],    # fact before any dim -> NULLs
        [5, 2, True, 100],      # dim
        [10, 3, False, None],   # fact -> 100, age 5
        [15, 4, True, None],    # dim with NULL val: ignored
        [20, 5, True, 200],     # dim
        [20, 6, False, None],   # same-ts fact, later eid -> 200, age 0
        [30, 7, False, None],   # fact -> 200, age 10
    ]
    st, out = advance_asof_enrich(None, rows, 1 << 62)
    assert out == [
        [0, 1, None, None],
        [10, 3, 100, 5],
        [20, 6, 200, 0],
        [30, 7, 200, 10],
    ]
    assert st == [20, 5, 200]
    # state carries across chunks
    st2, out2 = advance_asof_enrich(st, [[40, 8, False, None]], 1 << 62)
    assert out2 == [[40, 8, 200, 20]] and st2 == st


@given(
    st.lists(
        st.tuples(
            st.integers(0, 50),
            st.booleans(),
            st.one_of(st.none(), st.integers(1, 30)),
        ),
        min_size=1,
        max_size=40,
    ),
    st.lists(st.integers(1, 39), max_size=4),
)
@settings(max_examples=150, deadline=None)
def test_asof_enrich_chunking_invariance(evs, cuts):
    from spark_cep_spark.streaming.nfa import advance_asof_enrich

    t = 0
    rows = []
    for i, (dt, isd, v) in enumerate(evs):
        t += dt
        rows.append([t, i + 1, isd, v if isd else None])
    _, whole = advance_asof_enrich(None, rows, 1 << 62)
    bounds = sorted({min(c, len(rows)) for c in cuts} | {len(rows)})
    stt, got, prev = None, [], 0
    for b in bounds:
        chunk = rows[prev:b]
        wm = chunk[-1][0] if chunk else 0
        stt, part = advance_asof_enrich(stt, chunk, wm)
        got += part
        prev = b
    assert got == whole


def test_asof_enrich_streaming_equals_batch(spark, sf_dir):
    """The applyInPandasWithState temporal join emits exactly the
    batch window-pass twin under multi-micro-batch AvailableNow —
    including facts whose latest dim observation landed in an EARLIER
    micro-batch (the state-carry case)."""
    import glob
    import os

    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import asof_enrich_stream
    from spark_cep_spark.streaming.windows import asof_enrich
    from spark_cep_spark.io import table

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
        tuple(r)
        for r in harness.run_available_now(
            asof_enrich_stream(stream, watermark="0 seconds"), "append"
        )
        .filter("key <> -1")
        .collect()
    }
    want = {
        tuple(r)
        for r in asof_enrich(spark.read.parquet(staged))
        .filter("user_id <> -1")
        .collect()
    }
    assert got == want and len(want) > 0
    # the enrichment actually fires: most purchases have a prior view
    assert sum(1 for r in want if r[3] is not None) > 0


def test_profile_expectations_verdicts(spark, sf_dir):
    """7 checks, one row each; the TPC-H-ish fixture is clean on every
    constraint by construction, so all verdicts pass with 0 bad rows —
    and n_rows matches the actual table sizes."""
    from spark_cep_spark.io import table

    rows = {r.check_name: r for r in
            QUERIES["profile_expectations"](spark, sf_dir).collect()}
    assert len(rows) == 7
    n_li = table(spark, sf_dir, "lineitem").count()
    n_od = table(spark, sf_dir, "orders").count()
    for r in rows.values():
        assert r.n_bad == 0
        assert r["pass"] is True  # 'pass' is a keyword — index access
    got = {(r.check_name, r.target, r.n_rows, r.n_bad) for r in rows.values()}
    assert ("unique_o_orderkey", "orders", n_od, 0) in got
    assert ("range_l_quantity_1_50", "lineitem", n_li, 0) in got


def test_profile_expectations_catches_violations(spark, sf_dir, tmp_path):
    """Plant violations in a scratch copy of the tables and assert the
    suite flags exactly them (the checks are not vacuous)."""
    import os

    from spark_cep_spark.io import table

    sf = sf_dir
    scratch = str(tmp_path / "dq")
    os.makedirs(scratch, exist_ok=True)
    li = table(spark, sf, "lineitem")
    # 3 out-of-range quantities
    bad_li = li.limit(3).select(
        *[
            F.when(F.lit(c == "l_quantity"), F.lit(999.0))
            .otherwise(F.col(c))
            .alias(c)
            if c == "l_quantity"
            else F.col(c)
            for c in li.columns
        ]
    )
    li.unionByName(bad_li).write.mode("overwrite").parquet(
        os.path.join(scratch, "lineitem.parquet")
    )
    od = table(spark, sf, "orders")
    # duplicate one order key + orphan custkey
    dup = od.limit(1)
    orphan = od.limit(1).withColumn("o_custkey", F.lit(10**12))
    od.unionByName(dup).unionByName(orphan).write.mode(
        "overwrite"
    ).parquet(os.path.join(scratch, "orders.parquet"))
    table(spark, sf, "customer").write.mode("overwrite").parquet(
        os.path.join(scratch, "customer.parquet")
    )
    rows = {r.check_name: r for r in
            QUERIES["profile_expectations"](spark, scratch).collect()}
    assert rows["range_l_quantity_1_50"].n_bad == 3
    assert not rows["range_l_quantity_1_50"]["pass"]
    assert rows["unique_o_orderkey"].n_bad >= 1
    assert rows["fk_orders_customer"].n_bad == 1
    assert rows["completeness_l_returnflag"].n_bad == 0


# ---------------------------------------------------------------------------
# MIN/MAX DEFINE-aggregate forms (combine closure)
# ---------------------------------------------------------------------------


def test_kleene_agg_combine_max_semantics():
    """cur_vs_max: a candidate binds while >= half the running peak
    including itself; the accumulator tracks the max, seeded by the
    first bound value."""
    from spark_cep_spark.operators.cep_sql import (
        RunAggSpec,
        _compile_run_agg_bind,
        _run_agg_combine,
    )
    from spark_cep_spark.streaming.nfa import advance_kleene_agg

    spec = RunAggSpec("cur_vs_max", "cents", ">=", 1, 2)
    bind, combine = _compile_run_agg_bind(spec), _run_agg_combine(spec)
    assert combine is max
    evs = [
        (0, "a", 0),
        (5, "b", 100),   # binds (first), acc=100
        (10, "b", 60),   # 2*60 >= max(100,60) -> binds, acc=100
        (15, "b", 200),  # 2*200 >= 200 -> binds, acc=200
        (20, "b", 90),   # 2*90=180 < max(200,90)=200 -> FAILS, run dies
        (25, "a", 0),
        (30, "b", 10),   # first bind of run 2
    ]
    rows = _mk_rows(evs)
    _, out = advance_kleene_agg(
        None, rows, 1 << 62, bind, 60, combine=combine
    )
    assert out == [[0, 3, 200], [25, 1, 10]]


def test_run_agg_minmax_parse_and_pointed_errors():
    from spark_cep_spark.operators.cep_sql import parse_pattern_sql

    p = parse_pattern_sql(
        """
        PATTERN ( A -> B+ )
        WITHIN 1 HOURS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'view' AND B.cents <= 3 * MIN(B.cents)
        MEASURES MIN(B.cents) AS floor_cents, COUNT(B.*) AS nb
        AFTER MATCH SKIP PAST LAST ROW
        """
    )
    assert p.run_agg[2].form == "cur_vs_min"
    assert ("floor_cents", "s") in p.run_agg[4]
    # SUM measure on a MAX-form DEFINE: one accumulator only
    with pytest.raises(ValueError, match="ONE accumulator"):
        parse_pattern_sql(
            """
            PATTERN ( A -> B+ )
            WITHIN 1 HOURS
            DEFINE A AS event_type = 'signup',
                   B AS event_type = 'view'
                        AND B.cents >= 0.5 * MAX(B.cents)
            MEASURES SUM(B.cents) AS total
            AFTER MATCH SKIP PAST LAST ROW
            """
        )
    # MIN measure on a SUM-form DEFINE likewise
    with pytest.raises(ValueError, match="ONE accumulator"):
        parse_pattern_sql(
            """
            PATTERN ( A -> B+ )
            WITHIN 1 HOURS
            DEFINE A AS event_type = 'signup',
                   B AS event_type = 'view' AND SUM(B.cents) <= 600
            MEASURES MIN(B.cents) AS floor_cents
            AFTER MATCH SKIP PAST LAST ROW
            """
        )


@given(
    st.lists(
        st.tuples(
            st.integers(0, 50),
            st.sampled_from(["a", "b", "x"]),
            st.integers(1, 30),
        ),
        min_size=1,
        max_size=40,
    ),
    st.lists(st.integers(1, 39), max_size=4),
)
@settings(max_examples=150, deadline=None)
def test_kleene_agg_combine_chunking_invariance(evs, cuts):
    from spark_cep_spark.streaming.nfa import advance_kleene_agg

    bind = lambda n, s, v: 2 * v >= (v if n == 0 else max(s, v))  # noqa: E731
    W = 60
    t = 0
    rows = []
    for i, (dt, et, v) in enumerate(evs):
        t += dt
        rows.append(
            [t, i + 1, et == "a", et == "b",
             v if et == "b" else None, False]
        )
    _, whole = advance_kleene_agg(
        None, rows, 1 << 62, bind, W, combine=max
    )
    bounds = sorted({min(c, len(rows)) for c in cuts} | {len(rows)})
    stt, got, prev = None, [], 0
    for b in bounds:
        chunk = rows[prev:b]
        wm = chunk[-1][0] if chunk else (rows[prev - 1][0] if prev else 0)
        stt, part = advance_kleene_agg(
            stt, chunk, wm, bind, W, combine=max
        )
        got += part
        prev = b
    stt, part = advance_kleene_agg(
        stt, [], 1 << 62, bind, W, combine=max
    )
    got += part
    assert got == whole


_PEAK_TEXT = """
    PATTERN ( A -> B+ )
    WITHIN 7 DAYS
    DEFINE A AS event_type = 'signup',
           B AS event_type = 'view' AND B.cents >= 0.5 * MAX(B.cents)
    AFTER MATCH SKIP PAST LAST ROW
    PARTITION BY user_id
    ORDER BY ts
"""


def test_run_agg_peak_streaming_equals_batch(spark, sf_dir):
    got, want = _staged_stream_pair(spark, sf_dir, _PEAK_TEXT)
    assert got == want and len(want) > 0


# ---------------------------------------------------------------------------
# stream_dq_monitor
# ---------------------------------------------------------------------------


def test_dq_monitor_streaming_equals_batch(spark, sf_dir):
    """The windowed DQ counters under multi-micro-batch AvailableNow
    equal the batch twin (closed windows only — the stream's final
    watermark leaves the last window open in append mode)."""
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.windows import (
        dq_monitor_agg,
        dq_monitor_stream,
    )

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = {
        tuple(r)
        for r in harness.run_available_now(
            dq_monitor_stream(stream, watermark="0 seconds"), "append"
        ).collect()
    }
    batch = dq_monitor_agg(spark.read.parquet(staged))
    max_ts = spark.read.parquet(staged).agg(F.max("ts")).first()[0]
    want = {
        tuple(r)
        for r in batch.filter(
            F.col("win_start") + F.expr("INTERVAL 1 HOUR")
            <= F.lit(max_ts)
        ).collect()
    }
    assert want <= got and len(want) > 0
    # every emitted row matches the batch twin exactly
    batch_all = {tuple(r) for r in batch.collect()}
    assert got <= batch_all


def test_dq_monitor_counts_planted_violations(spark):
    """Planted NULLs / bad magnitudes / unknown types land in the
    right counters of the right window."""
    rows = [
        (1, _m(0), 1, "view", 1.0),
        (2, _m(1), None, "view", 2.0),          # null_user
        (3, _m(2), 2, "view", None),            # null_value
        (4, _m(3), 3, "view", 2.5e9),           # bad_magnitude
        (5, _m(4), 4, "refund", 1.0),           # bad_type
        (6, _m(70), 5, "view", 1.0),            # next window
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    from spark_cep_spark.streaming.windows import dq_monitor_agg

    got = {tuple(r) for r in dq_monitor_agg(df).collect()}
    assert got == {
        (_m(0), 5, 1, 1, 1, 1),
        (_m(60), 1, 0, 0, 0, 0),
    }


# ---------------------------------------------------------------------------
# TTL'd temporal join + checkpoint kill-and-resume for the new kernels
# ---------------------------------------------------------------------------


def test_asof_ttl_kernel_and_batch(spark):
    from spark_cep_spark.streaming.nfa import advance_asof_enrich

    rows = [
        [0, 1, True, 100],
        [50, 2, False, None],    # age 50 <= 60 -> joins
        [200, 3, False, None],   # age 200 > 60 -> NULLs (stale)
        [210, 4, True, 300],     # refresh
        [220, 5, False, None],   # age 10 -> joins 300
    ]
    _, out = advance_asof_enrich(None, rows, 1 << 62, ttl_us=60)
    assert out == [
        [50, 2, 100, 50],
        [200, 3, None, None],
        [220, 5, 300, 10],
    ]


def test_asof_ttl_streaming_equals_batch(spark, sf_dir):
    import glob
    import os

    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import asof_enrich_stream
    from spark_cep_spark.streaming.windows import asof_enrich

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

    ttl = 3_600_000_000
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = {
        tuple(r)
        for r in harness.run_available_now(
            asof_enrich_stream(stream, watermark="0 seconds", ttl_us=ttl),
            "append",
        )
        .filter("key <> -1")
        .collect()
    }
    want = {
        tuple(r)
        for r in asof_enrich(spark.read.parquet(staged), ttl_us=ttl)
        .filter("user_id <> -1")
        .collect()
    }
    assert got == want and len(want) > 0
    # the TTL actually bites somewhere: some fact has a stale dim
    full = {
        tuple(r)
        for r in asof_enrich(spark.read.parquet(staged))
        .filter("user_id <> -1")
        .collect()
    }
    n_joined_full = sum(1 for r in full if r[3] is not None)
    n_joined_ttl = sum(1 for r in want if r[3] is not None)
    assert n_joined_ttl < n_joined_full


def _kill_resume_stream(spark, sf_dir, tmp_path, build, out_cols):
    """Drain half the staged files to a parquet sink, add the rest,
    restart from the same checkpoint; return (resumed_df, n_first,
    uninterrupted_df)."""
    import os

    from spark_cep_spark.streaming import harness

    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=8)
    src = str(tmp_path / "src")
    os.makedirs(src)
    parts = sorted(f for f in os.listdir(staged) if f.startswith("part"))

    def run(out, ckpt):
        stream = harness.events_stream(spark, src, max_files_per_trigger=2)
        q = (
            build(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def copy_ordered(names):
        for f in names:
            dst = os.path.join(src, f)
            shutil.copy(os.path.join(staged, f), dst)
            os.utime(dst, (1_700_000_000 + parts.index(f) * 3600,) * 2)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    copy_ordered(parts[:4])
    run(out, ckpt)
    n_first = spark.read.parquet(out).count()
    copy_ordered(parts[4:])
    run(out, ckpt)
    got = spark.read.parquet(out)
    uninterrupted = harness.run_available_now(
        build(harness.events_stream(spark, staged, max_files_per_trigger=2)),
        "append",
    )
    return got, n_first, uninterrupted


def test_run_agg_rows_state_survives_checkpoint_restart(
    spark, sf_dir, tmp_path
):
    """Kill-and-resume for the emit_rows face: the row BUFFER in state
    (not just counters) must round-trip the checkpoint — matches whose
    anchor landed before the restart and confirm after must emit their
    full per-row records exactly once."""
    from spark_cep_spark.operators.cep_sql import match_recognize

    def build(stream):
        prepped = stream.filter(
            "user_id IS NOT NULL AND ts IS NOT NULL "
            "AND (value IS NULL OR abs(value) <= 1e9)"
        ).selectExpr(
            "user_id", "ts", "event_id", "event_type",
            "CAST(round(value * 100) AS LONG) AS cents",
        )
        return match_recognize(prepped, _RAM_SF_TEXT, watermark="0 seconds")

    got, n_first, uninterrupted = _kill_resume_stream(
        spark, sf_dir, tmp_path, build, None
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, uninterrupted.collect())
    )
    assert 0 < n_first < got.count()


def test_asof_state_survives_checkpoint_restart(spark, sf_dir, tmp_path):
    """Kill-and-resume for the temporal join: the last-observation
    state must resume, so facts after the restart still join dim
    updates from before it."""
    from spark_cep_spark.streaming.nfa import asof_enrich_stream

    def build(stream):
        return asof_enrich_stream(stream, watermark="0 seconds")

    got, n_first, uninterrupted = _kill_resume_stream(
        spark, sf_dir, tmp_path, build, None
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, uninterrupted.collect())
    )
    assert 0 < n_first < got.count()


def test_pipeline_e2e_zero_survivors(spark, sf_dir, tmp_path):
    """Every document failing the gopher gate (sub-10-word texts) must
    yield an EMPTY result, not a crash — the BPE trainer, ntile
    bucketer, and dsir fold all run over zero survivors."""
    import os
    import shutil as sh

    dst = str(tmp_path / "zero")
    os.makedirs(dst)
    for f in os.listdir(sf_dir):
        if f != "documents.parquet":
            os.symlink(os.path.join(sf_dir, f), os.path.join(dst, f))
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    tiny = docs.limit(3).selectExpr(
        "doc_id", "'one two' AS text", "lang", "source", "n_chars"
    )
    out = dst + "/_o"
    tiny.coalesce(1).write.parquet(out)
    p = next(x for x in os.listdir(out) if x.endswith(".parquet"))
    sh.move(os.path.join(out, p), os.path.join(dst, "documents.parquet"))
    sh.rmtree(out)
    assert QUERIES["pipeline_e2e"](spark, dst).count() == 0


# ---------------------------------------------------------------------------
# Differential fuzz: kernel vs an independent reference interpreter
# ---------------------------------------------------------------------------


def _ref_kleene_agg(rows, within, bind, confirm, min_n, max_n, combine):
    """Independent reference interpreter for the kleene-agg semantics,
    written in a different style (explicit phase enum + per-run record
    list) so a kernel mutation cannot hide in shared structure.  Spec:
    greedy B+ with consume-on-fail, deadline = anchor + within
    (inclusive), min_n gates every emission, max_n saturates (2-step:
    emit AT the max-th bind; confirm: wait for C, saturated candidates
    are noise), confirm shape emits only on C with n >= min_n."""
    IDLE, OPEN = 0, 1
    phase, run, out = IDLE, None, []
    for ts, eid, is_a, is_c, v, is_conf in rows:
        if phase == OPEN and ts > run["deadline"]:
            if not confirm and run["n"] >= min_n:
                out.append([run["anchor"], run["n"], run["acc"]])
            phase, run = IDLE, None
        if phase == IDLE:
            if is_a:
                phase = OPEN
                run = {"anchor": ts, "deadline": ts + within,
                       "n": 0, "acc": 0}
            continue
        saturated = max_n is not None and run["n"] >= max_n
        if is_c and v is not None and not saturated:
            if bind(run["n"], run["acc"], v):
                run["n"] += 1
                run["acc"] = (
                    v if run["n"] == 1 and combine is not None
                    else (combine or (lambda a, b: a + b))(run["acc"], v)
                )
                if (
                    not confirm
                    and max_n is not None
                    and run["n"] == max_n
                ):
                    out.append([run["anchor"], run["n"], run["acc"]])
                    phase, run = IDLE, None
                continue
            if confirm and is_conf and run["n"] >= min_n:
                # bind-failing row that also confirms: C completes
                out.append([run["anchor"], run["n"], run["acc"], ts])
                phase, run = IDLE, None
                continue
            if not confirm and run["n"] >= min_n:
                out.append([run["anchor"], run["n"], run["acc"]])
            phase, run = IDLE, None
            continue
        if confirm and is_conf and run["n"] >= min_n:
            out.append([run["anchor"], run["n"], run["acc"], ts])
            phase, run = IDLE, None
    if phase == OPEN and not confirm and run["n"] >= min_n:
        out.append([run["anchor"], run["n"], run["acc"]])
    return out


@given(
    st.lists(
        st.tuples(
            st.integers(0, 30),
            st.sampled_from(["a", "b", "c", "ab", "bc", "x"]),
            st.integers(-5, 30),
        ),
        min_size=1,
        max_size=50,
    ),
    st.booleans(),
    st.integers(1, 3),
    st.one_of(st.none(), st.integers(1, 4)),
    st.sampled_from(["sum", "min", "max"]),
)
@settings(max_examples=300, deadline=None)
def test_kleene_agg_kernel_equals_reference(
    evs, confirm, min_n, max_n, acc_kind
):
    """advance_kleene_agg == the independent interpreter across the
    full flag matrix (confirm x min_n x max_n x combine), including
    rows that are simultaneously anchor+candidate or candidate+confirm
    and negative values under the MIN/MAX forms."""
    from spark_cep_spark.streaming.nfa import advance_kleene_agg

    if max_n is not None and max_n < min_n:
        max_n = min_n
    combine = {"sum": None, "min": min, "max": max}[acc_kind]
    if acc_kind == "sum":
        bind = lambda n, s, v: s + v <= 40  # noqa: E731
    elif acc_kind == "max":
        # at least a third of the running peak (incl. the candidate)
        bind = lambda n, s, v: 3 * v >= (v if n == 0 else max(s, v))  # noqa: E731
    else:
        # within 3x of the running floor (incl. the candidate)
        bind = lambda n, s, v: v <= 3 * (v if n == 0 else min(s, v))  # noqa: E731
    W = 40
    t = 0
    rows = []
    for i, (dt, et, v) in enumerate(evs):
        t += dt
        rows.append(
            [
                t,
                i + 1,
                "a" in et,
                "b" in et,
                v if "b" in et else None,
                "c" in et,
            ]
        )
    _, got = advance_kleene_agg(
        None, rows, 1 << 62, bind, W, confirm=confirm,
        min_n=min_n, max_n=max_n, combine=combine,
    )
    want = _ref_kleene_agg(rows, W, bind, confirm, min_n, max_n, combine)
    assert got == want


# ---------------------------------------------------------------------------
# feat_hashed_cross + win_decay_score
# ---------------------------------------------------------------------------


def test_hashed_cross_properties(spark, sf_dir):
    """Bucket is a pure function of the (seg, nat) pair: identical
    pairs share a bucket, buckets stay in [0, 64), every customer
    appears exactly once."""
    out = QUERIES["feat_hashed_cross"](spark, sf_dir).collect()
    assert len(out) == len({r.c_custkey for r in out})
    by_pair = {}
    for r in out:
        assert 0 <= r.cross_bucket < 64
        b = by_pair.setdefault((r.seg, r.nat), r.cross_bucket)
        assert b == r.cross_bucket
    assert len(by_pair) > 1  # the cross actually varies


def test_decay_score_hand_fixture(spark):
    """Hand-computed decay: burst rows keep the full score (gap < 1h
    -> shift 0); a 2h idle gap halves twice; the first row of a key
    starts fresh (shift 63 zeroes any carried value)."""
    rows = [
        (1, _m(0), 1, "view", 1.0),     # score 100
        (2, _m(30), 1, "view", 2.0),    # gap 0h: 200 + 100 = 300
        (3, _m(150), 1, "view", 1.0),   # gap 2h: 100 + (300 >> 2) = 175
        (4, _m(0), 2, "view", 4.0),     # fresh key: 400
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    import os
    import shutil as sh

    src = "/root/testdata/sf0.001"
    dst = "/tmp/decay_fixture"
    sh.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for f in os.listdir(src):
        if f != "events.parquet":
            os.symlink(os.path.join(src, f), os.path.join(dst, f))
    base = spark.read.parquet(os.path.join(src, "events.parquet"))
    full = df.select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # align to the fixture's schema (extra cols NULL)
    for c in base.columns:
        if c not in full.columns:
            full = full.withColumn(c, F.lit(None).cast(base.schema[c].dataType))
    out = dst + "/_o"
    full.select(*base.columns).coalesce(1).write.parquet(out)
    p = next(x for x in os.listdir(out) if x.endswith(".parquet"))
    sh.move(os.path.join(out, p), os.path.join(dst, "events.parquet"))
    sh.rmtree(out)
    got = sorted(
        (r.user_id, r.event_id, r.score)
        for r in QUERIES["win_decay_score"](spark, dst).collect()
    )
    assert got == [(1, 1, 100), (1, 2, 300), (1, 3, 175), (2, 4, 400)]
