"""Round-8 batteries.

NULL-id-on-ts-tie ordering parity (VERDICT r7 "What's wrong" #1):
Spark window ORDER BY sorts NULL FIRST, DuckDB NULLS LAST, pandas NaN
LAST — so a NULL event_id tied on a timestamp silently flips the tie
order between an engine and its oracle unless BOTH order by
coalesce(event_id, 0) (the streaming kernels' NULL->0 convention,
established for the run_agg family in round 7). Round 8 swept the ~45
remaining oracle texts + Spark windows + applyInPandas sorts; this
battery runs every swept family over a fixture RICH in NULL-id ties
(3 users x 40 events, 3 exact-timestamp NULL-id ties per user with
divergent values, so recurrences/selections/paths/navigation all
change if the tie order flips) and asserts the driver-faithful
frames_equal parity plus non-empty output.
"""

from __future__ import annotations

import datetime as ddt
import os
import sys

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/tools")

from check_oracle import frames_equal, normalize  # noqa: E402

from spark_cep_spark.registry import ORACLES, QUERIES, load_all  # noqa: E402

load_all()

T0 = ddt.datetime(2026, 5, 4, 8, 0, 0)


def _fixture_rows():
    """3 users x ~40 events. Per user: a CEP-complete sequence
    (signup -> views -> clicks -> purchases -> errors), one value
    spike (anomaly/cusum), multi-day span (twap/wau day boundaries),
    and THREE exact-ts ties where one side has a NULL event_id and a
    very different value — the order-sensitive probe."""
    rows = []
    eid = 100
    for u in (1, 2, 3):
        t = T0 + ddt.timedelta(hours=u)
        seq = [
            ("signup", 10.0),
            ("view", 20.0 + u),
            ("view", 30.0),
            ("click", 25.0),
            ("view", 40.0),
            ("purchase", 60.0),
            ("error", 500.0),  # spike
            ("view", 22.0),
            ("click", 28.0),
            ("view", 26.0),
            ("purchase", 65.0),
            ("view", 24.0),
            ("click", 27.0),
            ("view", 23.0),
            ("error", 21.0),
            ("error", 33.0),  # run of >=3 consecutive errors —
            ("error", 34.0),  # cep_kleene; the i==15 NULL-id tie
            ("purchase", 61.0),  # lands INSIDE the run
            ("view", 25.5),
            ("click", 24.5),
            ("view", 26.5),
        ]
        for i, (et, v) in enumerate(seq):
            # gaps >35min at i%7==0 exercise sessionize boundaries;
            # a day hop mid-sequence exercises twap day rollup
            t += ddt.timedelta(minutes=40 if i % 7 == 0 else 3)
            if i == 13:
                t += ddt.timedelta(days=1)
            rows.append((eid, t, u, et, v, '{"k": %d}' % i))
            eid += 1
            # ties 1-3: NULL-id row at the SAME timestamp with a very
            # different value (and a different type for tie 2) — if an
            # engine orders the tie differently from its oracle, the
            # ewma/cusum/holt recurrence, lttb/twap segment, dedup
            # winner, path string, and prev/next navigation all flip.
            if i in (2, 8, 15):
                tie_type = {2: "view", 8: "click", 15: "error"}[i]
                rows.append((None, t, u, tie_type, 900.0 + i, "{}"))
    return rows


@pytest.fixture(scope="module")
def tie_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("null_tie"))
    df = spark.createDataFrame(
        _fixture_rows(),
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


# every swept family, representative keys; all must yield >0 rows on
# this fixture so the parity is exercised, not vacuous
TIE_KEYS = [
    # operators/windows.py (Spark window + applyInPandas kernels)
    "win_ewma",
    "win_cusum",
    "win_holt",
    "win_rolling_median",
    "win_sessionize",
    "win_time_range",
    "win_drawdown",
    "win_lag_ignore_nulls",
    # operators/aggregates.py
    "rollup_twap",
    "rollup_lttb",
    "agg_path_string",
    # operators/cep.py (rn window, struct-min, greedy-scan tiebreak)
    "cep_seq",
    "cep_seq_ids",
    "cep_kleene",
    "cep_skip_to_last",
    # operators/cep_sql.py (nav window, match numbering)
    "cep_sql_prev",
    "cep_sql_match_number",
    "cep_sql_classifier",
    # round-10: universal RUNNING/FINAL measures ride the same
    # struct-min bindings — tie flips change run_sum/avg values
    "cep_sql_final_running",
    # round-10: leading-Kleene scan order (ts, coalesce(id,0)) decides
    # which row anchors/binds at a tie
    "cep_sql_leading_kleene",
    # round-10: permute winner values ride the (ts, id0) struct mins
    "cep_sql_permute_measures",
    # round-10: two-group variant chains bind by min-ts per step
    "cep_sql_two_groups",
    "cep_sql_leading_kleene_rows",
    "cep_multi_pattern",
    # round-11: mixed pack — chain min-ts winners + run-agg scan order
    "cep_multi_rules_mixed",
    # round-11: suffix t_ values ride the (td, rk) winner struct
    "cep_sql_permute_confirm",
    # (cep_sql_run_agg_times is NOT here: the 900.x tie value busts
    # its sum cap at n=1 < min, so it emits nothing on this fixture —
    # vacuous; the same compile path's tie discipline is exercised by
    # cep_sql_run_agg_multikey below and the round-7 run-agg tie test)
    "cep_sql_run_agg_multikey",
    "cep_sql_run_agg_corr",
    "win_acf",
    "win_pacf",
    # operators/graph.py
    "graph_transitions",
    # functions/udfs.py
    "grouped_map",
    # streaming/windows.py batch twins
    "stream_dedup",
    "stream_sessionize",
    "stream_topk",
]


@pytest.mark.parametrize("key", TIE_KEYS)
def test_null_id_tie_parity(spark, tie_dir, key):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tie_dir}/events.parquet/*.parquet')"
        )
        sdf = QUERIES[key](spark, tie_dir).toPandas()
        odf = con.execute(ORACLES[key]).fetchdf()
    finally:
        con.close()
    a, b = normalize(sdf), normalize(odf)
    ok, why, _warns = frames_equal(a, b, tol=0.0)
    assert ok, (key, why)
    assert len(a) > 0, f"{key}: parity vacuous — fixture yields no rows"


def test_tie_fixture_order_actually_matters(spark, tie_dir):
    """Referee for the battery itself: flipping the tie order (NULLS
    LAST instead of the NULL->0 convention) must change at least one
    checked key's output on this fixture — otherwise the battery can't
    catch the class it exists for. win_ewma's recurrence reads the
    tied 900.x value either before or after its same-ts partner."""
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tie_dir}/events.parquet/*.parquet')"
        )
        good = ORACLES["win_ewma"]
        assert "coalesce(event_id, 0)" in good
        flipped = good.replace(
            "coalesce(event_id, 0)", "event_id NULLS LAST"
        )
        a = normalize(con.execute(good).fetchdf())
        b = normalize(con.execute(flipped).fetchdf())
    finally:
        con.close()
    ok, _why, _ = frames_equal(a, b, tol=0.0)
    assert not ok, "tie order does not affect win_ewma on this fixture"


# ---------------------------------------------------------------------------
# Terminal-confirm DEFINE-aggregate (round-8 verdict item 3):
# PATTERN (A -> B+ -> C) + MEASURES over the run aggregate, compiling to
# the same advance_kleene_agg kernel (confirm=True) on both engines.
# ---------------------------------------------------------------------------

_RAC_TEXT = """
    PATTERN ( A -> B+ -> C )
    WITHIN 7 DAYS
    DEFINE A AS event_type = 'signup',
           B AS event_type = 'view' AND B.cents <= 1.5 * AVG(B.cents),
           C AS event_type = 'purchase'
    MEASURES A.ts AS anchor_ts,
             C.ts AS confirm_ts,
             COUNT(B.cents) AS n_b,
             SUM(B.cents) AS run_total
    AFTER MATCH SKIP PAST LAST ROW
    PARTITION BY user_id
    ORDER BY ts
"""


def test_kleene_agg_confirm_kernel_semantics():
    """Hand-walked confirm-mode kernel cases: greedy B+ first, C
    closes with ≥1 bound B, bind-fail kills unemitted, a bind-failing
    row that ALSO confirms completes the match, C at n=0 is skipped
    (relaxed), deadline/watermark expiry never emits."""
    from spark_cep_spark.streaming.nfa import advance_kleene_agg

    bind = lambda n, s, v: 2 * v * (n + 1) <= 3 * (s + v)  # noqa: E731
    W = 1000  # within_us

    def run(rows, wm=1 << 62):
        _, out = advance_kleene_agg(None, rows, wm, bind, W, confirm=True)
        return out

    # rows: [ts, eid, is_a, is_c, v, is_conf]
    A = lambda t: [t, 0, True, False, None, False]  # noqa: E731
    B = lambda t, v: [t, 0, False, True, v, False]  # noqa: E731
    C = lambda t: [t, 0, False, False, None, True]  # noqa: E731

    # happy path: A, B(10), B(12), C → one match [anchor, 2, 22, t_C]
    assert run([A(0), B(1, 10), B(2, 12), C(3)]) == [[0, 2, 22, 3]]
    # no C → no match (2-step shape would emit at partition end)
    assert run([A(0), B(1, 10), B(2, 12)]) == []
    # bind-fail kills unemitted; later C finds nothing
    assert run([A(0), B(1, 10), B(2, 1000), C(3)]) == []
    # a bind-FAILING row that also confirms completes the match
    BC = [2, 0, False, True, 1000, True]
    assert run([A(0), B(1, 10), BC]) == [[0, 1, 10, 2]]
    # a bind-EXTENDING row that also confirms extends (greedy B+) —
    # the later plain C closes with n=2
    BC2 = [2, 0, False, True, 11, True]
    assert run([A(0), B(1, 10), BC2, C(3)]) == [[0, 2, 21, 3]]
    # C at n=0 is relaxed noise: run survives, binds later, C closes
    assert run([A(0), C(1), B(2, 10), C(3)]) == [[0, 1, 10, 3]]
    # deadline expiry kills unemitted; the late C cannot close it,
    # and a post-deadline A re-anchors
    assert run([A(0), B(1, 10), C(W + 5)]) == []
    out = run([A(0), B(1, 10), A(W + 5), B(W + 6, 7), C(W + 7)])
    assert out == [[W + 5, 1, 7, W + 7]]
    # watermark passing the deadline closes WITHOUT emitting
    st, out = advance_kleene_agg(
        None, [A(0), B(1, 10)], W + 1, bind, W, confirm=True
    )
    assert st is None and out == []


@given(
    st.lists(
        st.tuples(
            st.integers(0, 50),  # ts increment
            st.sampled_from(["a", "b", "c", "x"]),
            st.integers(1, 30),
        ),
        min_size=1,
        max_size=40,
    ),
    st.lists(st.integers(1, 39), max_size=4),
)
@settings(max_examples=200, deadline=None)
def test_kleene_agg_confirm_chunking_invariance(evs, cuts):
    """Any micro-batch chunking of the same ordered stream (with
    monotone watermarks at chunk boundaries) must emit exactly the
    whole-stream result — the streaming face's correctness contract."""
    from spark_cep_spark.streaming.nfa import advance_kleene_agg

    bind = lambda n, s, v: s + v <= 40  # noqa: E731
    W = 60
    t = 0
    rows = []
    for dt, et, v in evs:
        t += dt
        rows.append(
            [
                t,
                0,
                et == "a",
                et == "b",
                v if et == "b" else None,
                et == "c",
            ]
        )
    _, whole = advance_kleene_agg(
        None, rows, 1 << 62, bind, W, confirm=True
    )
    bounds = sorted({min(c, len(rows)) for c in cuts} | {len(rows)})
    stt, got, prev = None, [], 0
    for b in bounds:
        chunk = rows[prev:b]
        wm = chunk[-1][0] if chunk else (rows[prev - 1][0] if prev else 0)
        stt, part = advance_kleene_agg(
            stt, chunk, wm, bind, W, confirm=True
        )
        got += part
        prev = b
    stt, part = advance_kleene_agg(stt, [], 1 << 62, bind, W, confirm=True)
    got += part
    assert got == whole


def test_cep_sql_run_agg_confirm_small_fixture(spark):
    """Hand-computed confirm + MEASURES fixture through the full
    dialect path (text → parse → batch compile)."""
    import datetime as ddt

    from spark_cep_spark.operators.cep_sql import match_recognize

    t0 = ddt.datetime(2026, 1, 1)
    m = lambda k: t0 + ddt.timedelta(minutes=k)  # noqa: E731
    rows = [
        # user 1: signup, views 10+12 bind, purchase confirms
        (1, m(0), 1, "signup", 0.10),
        (2, m(1), 1, "view", 0.10),
        (3, m(2), 1, "view", 0.12),
        (4, m(3), 1, "purchase", 9.99),
        # user 1 again: second signup, view, NO purchase → unemitted
        (5, m(4), 1, "signup", 0.10),
        (6, m(5), 1, "view", 0.50),
        # user 2: view 9.00 fails the 1.5×avg bind after 0.10+0.12 —
        # run dies unemitted, the later purchase finds nothing
        (7, m(0), 2, "signup", 0.10),
        (8, m(1), 2, "view", 0.10),
        (9, m(2), 2, "view", 9.00),
        (10, m(3), 2, "purchase", 9.99),
        # user 3: purchase BEFORE any view is relaxed noise
        (11, m(0), 3, "signup", 0.10),
        (12, m(1), 3, "purchase", 9.99),
        (13, m(2), 3, "view", 0.20),
        (14, m(3), 3, "purchase", 9.99),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    ).withColumn("cents", F.round(F.col("value") * 100).cast("long"))
    got = {
        tuple(r)
        for r in match_recognize(df, _RAC_TEXT).collect()
    }
    assert got == {
        (1, m(0), m(3), 2, 22),
        (3, m(0), m(3), 1, 20),
    }


def test_cep_sql_run_agg_confirm_streaming_equals_batch(spark, sf_dir):
    """The SAME confirm + MEASURES text on a streaming input
    (multi-micro-batch AvailableNow) emits exactly the batch rows."""
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
            match_recognize(stream, _RAC_TEXT, watermark="0 seconds"),
            "append",
        )
        .filter("key <> -1")
        .collect()
    }
    batch = prep(spark.read.parquet(staged)).filter("user_id <> -1")
    want = {tuple(r) for r in match_recognize(batch, _RAC_TEXT).collect()}
    assert got == want and len(want) > 0


def test_run_agg_confirm_pointed_errors():
    from spark_cep_spark.operators.cep_sql import parse_pattern_sql

    base = """
        PATTERN ( A -> B+ {conn} C )
        WITHIN 7 DAYS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'view' AND B.cents <= 1.5 * AVG(B.cents),
               C AS {cdef}
        {extra}
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
    """

    def t(conn="->", cdef="event_type = 'purchase'", extra=""):
        return base.format(conn=conn, cdef=cdef, extra=extra)

    # strict => into the confirm step
    with pytest.raises(ValueError, match="relaxed ->"):
        parse_pattern_sql(t(conn="=>"))
    # gapped connector into the confirm step
    with pytest.raises(ValueError, match="gapped"):
        parse_pattern_sql(t(conn="-[1 HOURS]->"))
    # correlation on the confirm step
    with pytest.raises(ValueError, match="correlation"):
        parse_pattern_sql(
            t(cdef="event_type = 'purchase' AND C.cents > A.cents")
        )
    # measures: aggregate over the wrong column
    with pytest.raises(ValueError, match="one.*accumulator"):
        parse_pattern_sql(
            t(extra="MEASURES SUM(B.other) AS x")
        )
    # measures: a bare kleene-step ref is caught by the general
    # measure validation (corr_plan) before the run-agg conversion
    with pytest.raises(ValueError, match="without an aggregate"):
        parse_pattern_sql(t(extra="MEASURES B.ts AS x"))
    # measures: plain ref must be anchor/confirm + the ORDER BY column
    with pytest.raises(ValueError, match="ORDER BY column"):
        parse_pattern_sql(t(extra="MEASURES C.cents AS x"))
    with pytest.raises(ValueError, match="ORDER BY column"):
        parse_pattern_sql(t(extra="MEASURES A.cents AS x"))
    # count-cap form has no value column to aggregate in MEASURES
    with pytest.raises(ValueError, match="COUNT-cap"):
        parse_pattern_sql("""
            PATTERN ( A -> B+ )
            WITHIN 7 DAYS
            DEFINE A AS event_type = 'signup',
                   B AS event_type = 'view' AND COUNT(B.*) <= 3
            MEASURES SUM(B.cents) AS x
            AFTER MATCH SKIP PAST LAST ROW
            PARTITION BY user_id
            ORDER BY ts
        """)


def test_run_agg_measures_rename_two_step(spark):
    """MEASURES on the 2-step shape: pure renames of the kernel
    outputs, incl. the AVG measure (exact sum / exact count as
    double)."""
    import datetime as ddt

    from spark_cep_spark.operators.cep_sql import match_recognize

    t0 = ddt.datetime(2026, 1, 1)
    rows = [
        (1, t0, 1, "a", 0),
        (2, t0 + ddt.timedelta(minutes=1), 1, "c", 60),
        (3, t0 + ddt.timedelta(minutes=2), 1, "c", 30),
        (4, t0 + ddt.timedelta(minutes=3), 1, "c", 20),  # sum 110 > 100
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
        MEASURES A.ts AS started, COUNT(B.v) AS n,
                 SUM(B.v) AS total, AVG(B.v) AS mean
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    )
    assert out.columns == ["key", "started", "n", "total", "mean"]
    assert [tuple(r) for r in out.collect()] == [(1, t0, 2, 90, 45.0)]


# ---------------------------------------------------------------------------
# Persistent IVF×PQ serving face (round-8 verdict item 4): build / append /
# query from the stored index; append == bulk bit-for-bit; pruned plans.
# ---------------------------------------------------------------------------


def test_ivfpq_index_append_equals_bulk(spark, tmp_path):
    """build(all, train=base) must equal build(base)+append(rest)
    bit-for-bit: identical stored (id, cell, codes) rows and identical
    query output — one quantization kernel for both ingest paths."""
    from spark_cep_spark.io import table
    from spark_cep_spark.operators.llm_similarity import IvfPqIndex

    e = table(spark, "/root/testdata/sf0.001", "embeddings")
    base = e.filter("vec_id >= 100")
    rest = e.filter("vec_id >= 10 AND vec_id < 100")
    both = e.filter("vec_id >= 10")
    q = e.filter("vec_id < 10")

    p_bulk = str(tmp_path / "bulk")
    p_incr = str(tmp_path / "incr")
    IvfPqIndex.build(spark, both, p_bulk, train_df=base)
    IvfPqIndex.build(spark, base, p_incr).append(rest)

    def stored(p):
        return sorted(
            (r["vec_id"], r["cell"], tuple(r["codes"]))
            for r in spark.read.parquet(p + "/cells").collect()
        )

    sb, si = stored(p_bulk), stored(p_incr)
    assert sb == si and len(sb) > 0

    gb = sorted(
        map(tuple, IvfPqIndex.load(spark, p_bulk).query(q, k=10).collect())
    )
    gi = sorted(
        map(tuple, IvfPqIndex.load(spark, p_incr).query(q, k=10).collect())
    )
    assert gb == gi and len(gb) > 0


def test_ivfpq_index_query_plan_pruned(spark, tmp_path):
    """The ADC pass must be PARTITION-pruned to the probed cells AND
    COLUMN-pruned to (id, codes, cell) — the raw embedding column must
    not be read in the scan that feeds the ADC mapInPandas (the PQ
    byte bound); the re-rank scan alone touches it."""
    import io
    from contextlib import redirect_stdout

    from spark_cep_spark.io import table
    from spark_cep_spark.operators.llm_similarity import IvfPqIndex

    e = table(spark, "/root/testdata/sf0.001", "embeddings")
    idx = IvfPqIndex.build(
        spark, e.filter("vec_id >= 10"), str(tmp_path / "ix")
    )
    got = idx.query(e.filter("vec_id < 10"), k=5, nprobe=2)

    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [" in plan and "cell" in plan.split(
        "PartitionFilters"
    )[1][:200]
    adc_reads = [
        ln
        for ln in plan.splitlines()
        if "ReadSchema" in ln and "codes" in ln
    ]
    assert adc_reads, "no scan reading the codes column found"
    assert all(
        "embedding" not in ln for ln in adc_reads
    ), "ADC scan reads the raw embedding column — PQ byte bound lost"


def test_ivfpq_index_planted_recall(spark):
    """Full persistent lifecycle (build base, append twins, query from
    disk) under the same planted-near-dup recall gate as the other ANN
    keys."""
    from spark_cep_spark.operators.llm_similarity import (
        planted_recall_probe,
    )

    hits, total = planted_recall_probe(spark, "sim_ann_ivfpq_index")
    assert hits >= 0.9 * total, (hits, total)


# ---------------------------------------------------------------------------
# Trained BPE tokenizer (round-8 verdict item 5): 32 iterated merges.
# Referee: an independent pure-Python canonical BPE (Sennrich greedy
# left-to-right application) must reproduce the Spark trainer exactly —
# this guards the class where the Spark fold and the generated oracle
# share a wrong spelling and hash-agree on the wrong answer.
# ---------------------------------------------------------------------------


def _bpe_reference(texts, n_merges):
    import re as _re
    from collections import Counter

    words = Counter()
    for t in texts:
        if t:
            words.update(_re.findall(r"[a-z]+", t.lower()))
    syms = {w: list(w) for w in words}
    merges = []
    for step in range(1, n_merges + 1):
        pairs = Counter()
        for w, f in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, a, b, a + b, cnt))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, {w: len(s) for w, s in syms.items()}, words


def test_bpe_trainer_matches_python_reference(spark, tmp_path):
    import os

    texts = [
        "low lower lowest low low",
        "new newer newest new new new",
        "the cat sat on the mat the cat",
        "aaaaa aaa aa a",  # odd runs — the greedy left-to-right probe
        "banana bandana ban",
        None,
        "",
    ]
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t) if t else None)
         for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    out = str(tmp_path / "_o")
    df.coalesce(1).write.parquet(out)
    part = next(p for p in os.listdir(out) if p.endswith(".parquet"))
    import shutil

    shutil.move(os.path.join(out, part),
                os.path.join(d, "documents.parquet"))

    from spark_cep_spark.operators.llm_text import bpe_train_words

    wf, merges = bpe_train_words(spark, d, n_merges=12)
    ref_merges, ref_tlen, ref_words = _bpe_reference(
        [t for t in texts if t], 12
    )
    assert merges == ref_merges
    got_tlen = {
        r["w"]: len(r["syms"]) for r in wf.select("w", "syms").collect()
    }
    assert got_tlen == ref_tlen

    # per-doc token counts under the final vocab, vs a direct recount
    from spark_cep_spark.registry import QUERIES

    got = {
        r["doc_id"]: r["n_tokens"]
        for r in QUERIES["pipeline_bpe_tokens"](spark, d).collect()
    }
    # NOTE: the registered key trains 32 merges; recompute reference
    ref_merges32, ref_tlen32, _ = _bpe_reference(
        [t for t in texts if t], 32
    )
    import re as _re

    want = {}
    for i, t in enumerate(texts):
        if not t:
            continue
        ws = _re.findall(r"[a-z]+", t.lower())
        if ws:
            want[i] = sum(ref_tlen32[w] for w in ws)
    assert got == want


def test_count_over_column_rejected_pointed(spark, tie_dir):
    """COUNT(B.col) in a DEFINE run-cap is REJECTED with a pointed
    error (round-8 ADVICE): the kernel's cap counts bound ROWS, so
    silently accepting COUNT(B.col) would give it COUNT(B.*) semantics
    while SQL's COUNT(col) skips NULLs — a lie, not a feature."""
    from spark_cep_spark.operators.cep_sql import match_recognize
    from spark_cep_spark.operators.relational import table

    events = table(spark, tie_dir, "events")
    with pytest.raises(ValueError, match=r"COUNT.*column.*COUNT\(B"):
        match_recognize(
            events,
            """
            PATTERN ( A -> B+ )
            WITHIN 7 DAYS
            DEFINE A AS event_type = 'signup',
                   B AS event_type = 'view' AND COUNT(B.value) <= 3
            PARTITION BY user_id
            ORDER BY ts
            """,
        )


# ---------------------------------------------------------------------------
# {n,m} quantifier bounds on the DEFINE-aggregate Kleene step
# (advance_kleene_agg min_n/max_n) + composite PARTITION BY — round-8
# generality notches past the r7 verdict's item-3 list.
# ---------------------------------------------------------------------------

_RAT_TEXT = """
    PATTERN ( A -> B{2,4} )
    WITHIN 7 DAYS
    DEFINE A AS event_type = 'signup',
           B AS event_type = 'view' AND SUM(B.cents) <= 25000
    AFTER MATCH SKIP PAST LAST ROW
    PARTITION BY user_id
    ORDER BY ts
"""

_RAM_TEXT = """
    PATTERN ( A -> B+ )
    WITHIN 3 DAYS
    DEFINE A AS event_type = 'signup',
           B AS event_type = 'view' AND B.cents <= 2 * AVG(B.cents)
    AFTER MATCH SKIP PAST LAST ROW
    PARTITION BY user_id, wk
    ORDER BY ts
"""


def test_kleene_agg_bounds_kernel_semantics():
    """Hand-walked {min,max} kernel cases: greedy completion at the
    max-th bind, min gating every close (cap-fail / deadline /
    partition-end), saturated-B noise while awaiting C, and defaults
    (1, None) exactly reproducing B+."""
    from spark_cep_spark.streaming.nfa import advance_kleene_agg

    bind = lambda n, s, v: s + v <= 100  # noqa: E731
    W = 1000

    def rows(seq):
        return [
            [t, i, a, c, v, False]
            for i, (t, a, c, v) in enumerate(seq)
        ]

    def run(seq, **kw):
        _, out = advance_kleene_agg(
            None, rows(seq), 1 << 62, bind, W, **kw
        )
        return out

    A = lambda t: (t, True, False, None)  # noqa: E731
    B = lambda t, v: (t, False, True, v)  # noqa: E731
    # greedy completion AT the 3rd bind; the later candidate finds
    # no open run (SKIP PAST LAST ROW consumed through the 3rd B)
    assert run(
        [A(0), B(1, 10), B(2, 20), B(3, 30), B(4, 5)],
        min_n=2, max_n=3,
    ) == [[0, 3, 60]]
    # n=1 < min on a cap-fail: silent death, NOT a 1-row emission
    assert run([A(0), B(1, 10), B(2, 200)], min_n=2, max_n=3) == []
    # cap-fail with n=2 in [min, max): emits
    assert run(
        [A(0), B(1, 10), B(2, 20), B(3, 200)], min_n=2, max_n=4
    ) == [[0, 2, 30]]
    # partition-end close respects min
    assert run([A(0), B(1, 10), B(2, 20)], min_n=2, max_n=4) == [
        [0, 2, 30]
    ]
    assert run([A(0), B(1, 10)], min_n=2, max_n=4) == []
    # deadline close respects min (2 binds, then past-deadline anchor)
    assert run(
        [A(0), B(1, 10), B(2, 20), A(W + 5)], min_n=2, max_n=4
    ) == [[0, 2, 30]]
    # defaults = B+ exactly
    assert run([A(0), B(1, 10), B(2, 200)]) == [[0, 1, 10]]
    # confirm shape: B saturates at max=2, the 3rd candidate is noise
    # (its bind predicate is never evaluated), C still confirms
    bindc = lambda n, s, v: True  # noqa: E731
    seq = [
        [0, 0, True, False, None, False],
        [1, 1, False, True, 1, False],
        [2, 2, False, True, 1, False],
        [3, 3, False, True, 999, False],  # saturated: noise
        [4, 4, False, False, None, True],
    ]
    _, out = advance_kleene_agg(
        None, seq, 1 << 62, bindc, W, confirm=True, min_n=2, max_n=2
    )
    assert out == [[0, 2, 2, 4]]
    # confirm shape: C before B{min} completes is noise, not a close
    seq2 = [
        [0, 0, True, False, None, False],
        [1, 1, False, True, 1, False],
        [2, 2, False, False, None, True],  # n=1 < min: noise
        [3, 3, False, True, 1, False],
        [4, 4, False, False, None, True],
    ]
    _, out = advance_kleene_agg(
        None, seq2, 1 << 62, bindc, W, confirm=True, min_n=2, max_n=5
    )
    assert out == [[0, 2, 2, 4]]


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
    st.integers(1, 3),
    st.integers(0, 3),
)
@settings(max_examples=200, deadline=None)
def test_kleene_agg_bounds_chunking_invariance(evs, cuts, lo, extra):
    """Chunking invariance of the BOUNDED kernel: any micro-batch
    split with monotone boundary watermarks emits exactly the
    whole-stream result, for every (min, max) drawn."""
    from spark_cep_spark.streaming.nfa import advance_kleene_agg

    bind = lambda n, s, v: s + v <= 40  # noqa: E731
    W = 60
    hi = lo + extra
    t = 0
    rows = []
    for dt, et, v in evs:
        t += dt
        rows.append([t, 0, et == "a", et == "b", v if et == "b" else None])
    kw = dict(min_n=lo, max_n=hi)
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


def test_rewrite_run_agg_bounds_detector():
    from spark_cep_spark.operators.cep_sql import (
        _rewrite_run_agg_bounds,
    )

    r = _rewrite_run_agg_bounds(_RAT_TEXT)
    assert r is not None
    text, lo, hi = r
    assert (lo, hi) == (2, 4)
    assert "B+" in text and "{2,4}" not in text.replace(" ", "")
    # exact {n} and open {n,} forms
    t3 = _RAT_TEXT.replace("{2,4}", "{3}")
    assert _rewrite_run_agg_bounds(t3)[1:] == (3, 3)
    topen = _RAT_TEXT.replace("{2,4}", "{2,}")
    assert _rewrite_run_agg_bounds(topen)[1:] == (2, None)
    # a NON-aggregate quantified step keeps the expansion path
    plain = _RAT_TEXT.replace("AND SUM(B.cents) <= 25000", "")
    assert _rewrite_run_agg_bounds(plain) is None
    # pointed bounds errors
    with pytest.raises(ValueError, match="min >= 1"):
        _rewrite_run_agg_bounds(_RAT_TEXT.replace("{2,4}", "{0,4}"))
    with pytest.raises(ValueError, match="min <= max"):
        _rewrite_run_agg_bounds(_RAT_TEXT.replace("{2,4}", "{4,2}"))


def test_cep_sql_run_agg_times_small_fixture(spark):
    """Hand-computed {2,4} sum-cap fixture through the full dialect
    path: greedy completion at the 4th bind, min-gated cap-fail
    closes, sub-min silent deaths."""
    t0 = ddt.datetime(2026, 1, 1)
    m = lambda k: t0 + ddt.timedelta(minutes=k)  # noqa: E731
    rows = [
        # user 1: 4 views of 60.00 bind (sum 24000 <= 25000) —
        # greedy completion at the 4th; the 5th view is past the match
        (1, m(0), 1, "signup", 0.0),
        (2, m(1), 1, "view", 60.0),
        (3, m(2), 1, "view", 60.0),
        (4, m(3), 1, "view", 60.0),
        (5, m(4), 1, "view", 60.0),
        (6, m(5), 1, "view", 60.0),
        # user 2: views 100+100 bind, 3rd view 100 busts the cap
        # (sum would be 30000) -> closes with n=2
        (7, m(0), 2, "signup", 0.0),
        (8, m(1), 2, "view", 100.0),
        (9, m(2), 2, "view", 100.0),
        (10, m(3), 2, "view", 100.0),
        # user 3: one view then cap-bust -> n=1 < min -> silent death
        (11, m(0), 3, "signup", 0.0),
        (12, m(1), 3, "view", 100.0),
        (13, m(2), 3, "view", 200.0),
        # user 4: one view to partition end -> n=1 < min -> nothing
        (14, m(0), 4, "signup", 0.0),
        (15, m(1), 4, "view", 50.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    ).withColumn("cents", F.round(F.col("value") * 100).cast("long"))
    from spark_cep_spark.operators.cep_sql import match_recognize

    got = {tuple(r) for r in match_recognize(df, _RAT_TEXT).collect()}
    assert got == {
        (1, m(0), 4, 24000),
        (2, m(0), 2, 20000),
    }


def test_cep_sql_run_agg_times_streaming_equals_batch(spark, sf_dir):
    """The SAME {2,4} text on a streaming input (multi-micro-batch
    AvailableNow) emits exactly the batch rows — the bounds ride the
    kernel into applyInPandasWithState unchanged."""
    import glob

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
            match_recognize(stream, _RAT_TEXT, watermark="0 seconds"),
            "append",
        )
        .filter("key <> -1")
        .collect()
    }
    batch = prep(spark.read.parquet(staged)).filter("user_id <> -1")
    want = {tuple(r) for r in match_recognize(batch, _RAT_TEXT).collect()}
    assert got == want and len(want) > 0


def test_cep_sql_run_agg_multikey_small_fixture(spark):
    """Composite (user_id, wk) PARTITION BY through the dialect: the
    same user's runs are scoped per week — an open run at a week
    boundary closes at ITS partition's end, and each week re-anchors
    independently."""
    # Mondays: 2026-01-05 and 2026-01-12
    t0 = ddt.datetime(2026, 1, 5, 12, 0)
    h = lambda k: t0 + ddt.timedelta(hours=k)  # noqa: E731
    rows = [
        # week 1: signup + two binding views
        (1, h(0), 1, "signup", 0.0),
        (2, h(1), 1, "view", 10.0),
        (3, h(2), 1, "view", 12.0),
        # week 2 (same user): fresh partition — view before the
        # week-2 signup is noise, then one binding view
        (4, h(7 * 24 + 0), 1, "view", 50.0),
        (5, h(7 * 24 + 1), 1, "signup", 0.0),
        (6, h(7 * 24 + 2), 1, "view", 20.0),
    ]
    df = (
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )
        .withColumn("cents", F.round(F.col("value") * 100).cast("long"))
        .withColumn("wk", F.date_trunc("week", F.col("ts")).cast("date"))
    )
    from spark_cep_spark.operators.cep_sql import match_recognize

    got = {tuple(r) for r in match_recognize(df, _RAM_TEXT).collect()}
    assert got == {
        (1, ddt.date(2026, 1, 5), h(0), 2, 2200),
        (1, ddt.date(2026, 1, 12), h(7 * 24 + 1), 1, 2000),
    }


def test_cep_sql_run_agg_multikey_streaming_equals_batch(spark, sf_dir):
    """The SAME composite-key text on a streaming input: the state op
    groups by BOTH key parts (kleene_agg_stream key_cols) and each
    part's dtype (long, date) flows through."""
    import glob

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
            .withColumn(
                "wk", F.date_trunc("week", F.col("ts")).cast("date")
            )
        )

    stream = prep(
        harness.events_stream(spark, staged, max_files_per_trigger=2)
    )
    got = {
        tuple(r)
        for r in harness.run_available_now(
            match_recognize(stream, _RAM_TEXT, watermark="0 seconds"),
            "append",
        )
        .filter("key_user_id <> -1")
        .collect()
    }
    batch = prep(spark.read.parquet(staged)).filter("user_id <> -1")
    want = {tuple(r) for r in match_recognize(batch, _RAM_TEXT).collect()}
    assert got == want and len(want) > 0


def test_run_agg_bounds_pointed_errors():
    """The bounded form inherits every run-agg validation on the
    REWRITTEN text, and two quantified aggregate steps are rejected
    at the rewriter."""
    from spark_cep_spark.operators.cep_sql import (
        _rewrite_run_agg_bounds,
        match_recognize,
    )

    with pytest.raises(ValueError, match="at most one quantified"):
        _rewrite_run_agg_bounds(
            """
            PATTERN ( A -> B{2,4} -> C{1,2} )
            WITHIN 7 DAYS
            DEFINE A AS event_type = 'signup',
                   B AS SUM(B.cents) <= 100,
                   C AS SUM(C.cents) <= 100
            AFTER MATCH SKIP PAST LAST ROW
            PARTITION BY user_id
            ORDER BY ts
            """
        )
    # malformed aggregate conjunct on a bounded step: the rewriter
    # claims it (routing to the run-agg parse) and the parse's
    # pointed error fires — NOT the expansion machinery's generic one
    from spark_cep_spark.operators.cep_sql import parse_pattern_sql

    bad = _RAT_TEXT.replace("SUM(B.cents) <= 25000", "MIN(B.cents) <= 5")
    rw = _rewrite_run_agg_bounds(bad)
    assert rw is not None and rw[1:] == (2, 4)
    with pytest.raises(ValueError, match="not of a supported form"):
        parse_pattern_sql(rw[0])


# ---------------------------------------------------------------------------
# IVF x PQ index delete + compaction (the remaining lifecycle face).
# ---------------------------------------------------------------------------


def test_ivfpq_delete_tombstone_equals_compact(spark, tmp_path):
    """Tombstoned query results == post-compaction results bit-for-bit
    (compaction is pure storage); deleted ids never surface; the
    tombstone table is cleared by compact; delete composes with a
    later append."""
    import numpy as np

    from spark_cep_spark.operators.llm_similarity import IvfPqIndex

    rng = np.random.RandomState(11)
    base = rng.normal(size=(120, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    q = df.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "idx")
    idx = IvfPqIndex.build(spark, df.filter(F.col("vec_id") >= 5), path)

    dead = df.filter(
        (F.col("vec_id") % 3 == 0) & (F.col("vec_id") >= 5)
    ).select("vec_id")
    dead_ids = {r.vec_id for r in dead.collect()}
    idx.delete(dead)

    tombstoned = sorted(
        tuple(r) for r in idx.query(q, k=8, nprobe=4).collect()
    )
    assert tombstoned, "query returned nothing"
    assert all(r[1] not in dead_ids for r in tombstoned)

    idx.compact()
    assert idx._tombstones() is None  # cleared
    compacted = sorted(
        tuple(r) for r in idx.query(q, k=8, nprobe=4).collect()
    )
    assert compacted == tombstoned

    # physically gone: the cells table no longer holds the ids
    remaining = {
        r.vec_id
        for r in spark.read.parquet(path + "/cells")
        .select("vec_id")
        .collect()
    }
    assert remaining.isdisjoint(dead_ids)

    # append after compact keeps serving (same quantizers)
    extra = rng.normal(size=(10, 64))
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    idx.append(
        spark.createDataFrame(
            [(500 + i, v.tolist()) for i, v in enumerate(extra)],
            "vec_id long, embedding array<double>",
        )
    )
    after = idx.query(q, k=8, nprobe=4).collect()
    assert len(after) > 0


def test_ivfpq_delete_key_registered(spark, sf_dir):
    """The registered key runs end-to-end on the fixture corpus and
    never returns a multiple-of-10 base id (the deleted cohort)."""
    from spark_cep_spark.registry import QUERIES

    got = QUERIES["sim_ann_ivfpq_delete"](spark, sf_dir).collect()
    assert len(got) > 0
    assert all(
        not (r.neighbor_id >= 100 and r.neighbor_id % 10 == 0)
        for r in got
    )


# ---------------------------------------------------------------------------
# IVF x PQ streaming ingest (continuous indexing, exactly-once epochs).
# ---------------------------------------------------------------------------


def _norm_rows(rng, n, d=64, off=0):
    import numpy as np

    x = rng.normal(size=(n, d))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return [(off + i, v.tolist()) for i, v in enumerate(x)]


def test_ivfpq_stream_ingest_equals_batch_append(spark, tmp_path):
    """stream_ingest == batch append bit-for-bit on query results
    (same _encode kernel, same stored quantizers); a REPLAY of the
    same staged files from a fresh checkpoint neither duplicates ids
    nor changes results (epoch-directory overwrite); compact folds
    the epochs and preserves results; delete excludes streamed ids."""
    import shutil

    import numpy as np

    from spark_cep_spark.operators.llm_similarity import IvfPqIndex

    rng = np.random.RandomState(23)
    base_rows = _norm_rows(rng, 100)
    new_rows = _norm_rows(rng, 30, off=300)
    schema = "vec_id long, embedding array<double>"
    base = spark.createDataFrame(base_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    q = base.filter(F.col("vec_id") < 5)

    # batch-append reference
    pb = str(tmp_path / "batch")
    IvfPqIndex.build(spark, base, pb).append(new)
    want = sorted(
        tuple(r)
        for r in IvfPqIndex.load(spark, pb).query(q, k=8).collect()
    )

    # streaming ingest, 3 epochs
    ps = str(tmp_path / "stream")
    stage = str(tmp_path / "stage")
    idx = IvfPqIndex.build(spark, base, ps)
    new.repartition(3).write.mode("overwrite").parquet(stage)

    def run_stream(ckpt):
        s = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        idx.stream_ingest(s, checkpoint=ckpt).awaitTermination()

    run_stream(str(tmp_path / "ckpt1"))
    got = sorted(
        tuple(r)
        for r in IvfPqIndex.load(spark, ps).query(q, k=8).collect()
    )
    assert got == want and len(got) > 0

    # replay from a FRESH checkpoint: same files, epochs rewritten —
    # no duplicate ids, identical results
    run_stream(str(tmp_path / "ckpt2"))
    streamed = spark.read.parquet(ps + "/cells_stream")
    ids = [r.vec_id for r in streamed.select("vec_id").collect()]
    assert sorted(ids) == sorted(r[0] for r in new_rows)  # no dups
    got2 = sorted(
        tuple(r)
        for r in IvfPqIndex.load(spark, ps).query(q, k=8).collect()
    )
    assert got2 == want

    # compact folds the epochs into the main layout, results unchanged
    idx.compact()
    assert not os.path.isdir(ps + "/cells_stream")
    got3 = sorted(
        tuple(r)
        for r in IvfPqIndex.load(spark, ps).query(q, k=8).collect()
    )
    assert got3 == want

    # a streamed id can be tombstoned like any other
    idx.delete(spark.createDataFrame([(300,)], "vec_id long"))
    got4 = IvfPqIndex.load(spark, ps).query(q, k=8).collect()
    assert all(r.neighbor_id != 300 for r in got4)
    shutil.rmtree(stage, ignore_errors=True)


def test_ivfpq_stream_ingest_key_registered(spark, sf_dir):
    """The registered key equals the batch-append key bit-for-bit on
    the fixture corpus — the continuous-indexing face is the SAME
    index a bulk loader would have produced."""
    from spark_cep_spark.registry import QUERIES

    got = sorted(
        tuple(r)
        for r in QUERIES["sim_index_stream_ingest"](spark, sf_dir).collect()
    )
    want = sorted(
        tuple(r)
        for r in QUERIES["sim_ann_ivfpq_index"](spark, sf_dir).collect()
    )
    assert got == want and len(got) > 0


# ---------------------------------------------------------------------------
# Mixed aggregate + anchor-correlation DEFINE (the last item-3 notch).
# ---------------------------------------------------------------------------

_RACO_TEXT = """
    PATTERN ( A -> B+ )
    WITHIN 7 DAYS
    DEFINE A AS event_type = 'signup',
           B AS event_type = 'view'
                AND B.cents <= 1.5 * AVG(B.cents)
                AND B.cents >= A.cents
    AFTER MATCH SKIP PAST LAST ROW
    PARTITION BY user_id
    ORDER BY ts
"""


def test_kleene_agg_corr_kernel_semantics():
    """Hand-walked corr-mode kernel cases: anchor value captured at
    open, candidates need BOTH binds, NULL operands follow 3VL
    (NULL ay never opens, NULL bx is a non-candidate), corr composes
    with bounds and confirm."""
    from spark_cep_spark.streaming.nfa import advance_kleene_agg

    bind = lambda n, s, v: True  # noqa: E731  (agg always true)
    ge = lambda bx, ay: bx >= ay  # noqa: E731
    W = 1000

    def run(rows, **kw):
        _, out = advance_kleene_agg(
            None, rows, 1 << 62, bind, W, corr=ge, **kw
        )
        return out

    A = lambda t, ay: [t, 0, True, False, None, False, None, ay]  # noqa: E731
    B = lambda t, v, bx: [t, 0, False, True, v, False, bx, None]  # noqa: E731
    # bx >= ay binds; a smaller bx is a failing candidate (consumed)
    assert run([A(0, 50), B(1, 10, 60), B(2, 20, 70)]) == [[0, 2, 30]]
    assert run([A(0, 50), B(1, 10, 60), B(2, 20, 40)]) == [[0, 1, 10]]
    # NULL ay: the anchor cannot open — later B finds no run
    assert run([A(0, None), B(1, 10, 60)]) == []
    # NULL bx: non-candidate (noise), run stays open to partition end
    assert run([A(0, 50), B(1, 10, None), B(2, 20, 70)]) == [[0, 1, 20]]
    # corr + bounds: the 2nd bind greedily completes at max
    assert run(
        [A(0, 50), B(1, 10, 60), B(2, 20, 70), B(3, 5, 80)],
        min_n=1, max_n=2,
    ) == [[0, 2, 30]]
    # corr + confirm: C closes only after >= 1 corr-passing bind
    C = lambda t: [t, 0, False, False, None, True, None, None]  # noqa: E731
    _, out = advance_kleene_agg(
        None,
        [A(0, 50), B(1, 10, 60), C(2)],
        1 << 62,
        bind,
        W,
        corr=ge,
        confirm=True,
    )
    assert out == [[0, 1, 10, 2]]


@given(
    st.lists(
        st.tuples(
            st.integers(0, 50),
            st.sampled_from(["a", "b", "x"]),
            st.integers(1, 30),
            st.integers(0, 12),
        ),
        min_size=1,
        max_size=40,
    ),
    st.lists(st.integers(1, 39), max_size=4),
)
@settings(max_examples=200, deadline=None)
def test_kleene_agg_corr_chunking_invariance(evs, cuts):
    """Chunking invariance of the corr-mode kernel: any micro-batch
    split with monotone boundary watermarks emits exactly the
    whole-stream result."""
    from spark_cep_spark.streaming.nfa import advance_kleene_agg

    bind = lambda n, s, v: s + v <= 40  # noqa: E731
    ge = lambda bx, ay: bx >= ay  # noqa: E731
    W = 60
    t = 0
    rows = []
    for dt, et, v, x in evs:
        t += dt
        rows.append(
            [
                t,
                0,
                et == "a",
                et == "b",
                v if et == "b" else None,
                False,
                x if et == "b" else None,
                x if et == "a" else None,
            ]
        )
    _, whole = advance_kleene_agg(
        None, rows, 1 << 62, bind, W, corr=ge
    )
    bounds = sorted({min(c, len(rows)) for c in cuts} | {len(rows)})
    stt, got, prev = None, [], 0
    for b in bounds:
        chunk = rows[prev:b]
        wm = chunk[-1][0] if chunk else (rows[prev - 1][0] if prev else 0)
        stt, part = advance_kleene_agg(
            stt, chunk, wm, bind, W, corr=ge
        )
        got += part
        prev = b
    stt, part = advance_kleene_agg(stt, [], 1 << 62, bind, W, corr=ge)
    got += part
    assert got == whole


def test_cep_sql_run_agg_corr_small_fixture(spark):
    """Hand-computed mixed agg+corr fixture through the full dialect
    path, including the reversed-orientation spelling."""
    t0 = ddt.datetime(2026, 1, 1)
    m = lambda k: t0 + ddt.timedelta(minutes=k)  # noqa: E731
    rows = [
        # user 1: signup cents 1000; views 1500, 2000 pass both binds;
        # view 500 fails the anchor comparison -> closes with n=2
        (1, m(0), 1, "signup", 10.0),
        (2, m(1), 1, "view", 15.0),
        (3, m(2), 1, "view", 20.0),
        (4, m(3), 1, "view", 5.0),
        # user 2: signup with NULL value cannot open
        (5, m(0), 2, "signup", None),
        (6, m(1), 2, "view", 15.0),
        # user 3: view with NULL value is a non-candidate (noise)
        (7, m(0), 3, "signup", 10.0),
        (8, m(1), 3, "view", None),
        (9, m(2), 3, "view", 12.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    ).withColumn("cents", F.round(F.col("value") * 100).cast("long"))
    from spark_cep_spark.operators.cep_sql import match_recognize

    got = {tuple(r) for r in match_recognize(df, _RACO_TEXT).collect()}
    assert got == {
        (1, m(0), 2, 3500),
        (3, m(0), 1, 1200),
    }
    # reversed orientation (A.cents <= B.cents) compiles identically
    rev = _RACO_TEXT.replace("B.cents >= A.cents", "A.cents <= B.cents")
    got2 = {tuple(r) for r in match_recognize(df, rev).collect()}
    assert got2 == got


def test_cep_sql_run_agg_corr_streaming_equals_batch(spark, sf_dir):
    """The SAME mixed agg+corr text on a streaming input emits exactly
    the batch rows — the corr operands ride the kernel into
    applyInPandasWithState unchanged."""
    import glob

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
            match_recognize(stream, _RACO_TEXT, watermark="0 seconds"),
            "append",
        )
        .filter("key <> -1")
        .collect()
    }
    batch = prep(spark.read.parquet(staged)).filter("user_id <> -1")
    want = {
        tuple(r) for r in match_recognize(batch, _RACO_TEXT).collect()
    }
    assert got == want and len(want) > 0


def test_run_agg_corr_pointed_errors():
    from spark_cep_spark.operators.cep_sql import parse_pattern_sql

    # two anchor-correlation conjuncts
    with pytest.raises(ValueError, match="at most one anchor-corr"):
        parse_pattern_sql(
            _RACO_TEXT.replace(
                "AND B.cents >= A.cents",
                "AND B.cents >= A.cents AND B.cents <= A.cents",
            )
        )
    # correlation against a NON-anchor step (the terminal-confirm C)
    # stays rejected with the pointed error
    with pytest.raises(ValueError, match="correlation is not supported"):
        parse_pattern_sql(
            _RACO_TEXT.replace("B.cents >= A.cents", "B.cents >= C.cents")
            .replace(
                "PATTERN ( A -> B+ )", "PATTERN ( A -> B+ -> C )"
            )
            .replace(
                "ORDER BY ts",
                "ORDER BY ts",
            )
            .replace(
                "DEFINE A AS event_type = 'signup',",
                "DEFINE A AS event_type = 'signup',\n"
                "           C AS event_type = 'purchase',",
            )
        )


def test_run_agg_bounds_compose_with_corr(spark):
    """{n,m} bounds + anchor-correlation in ONE DEFINE go through the
    rewriter into the same kernel: greedy completion at the max-th
    corr-passing bind."""
    t0 = ddt.datetime(2026, 1, 1)
    m = lambda k: t0 + ddt.timedelta(minutes=k)  # noqa: E731
    rows = [
        (1, m(0), 1, "signup", 10.0),
        (2, m(1), 1, "view", 15.0),   # >= anchor: binds (n=1)
        (3, m(2), 1, "view", 5.0),    # < anchor: failing row, but
        # n=1 >= min=1 -> emits [n=1]
        (4, m(3), 1, "signup", 10.0),
        (5, m(4), 1, "view", 15.0),
        (6, m(5), 1, "view", 20.0),   # 2nd bind == max -> completes
        (7, m(6), 1, "view", 25.0),   # past the match
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    ).withColumn("cents", F.round(F.col("value") * 100).cast("long"))
    from spark_cep_spark.operators.cep_sql import match_recognize

    text = """
        PATTERN ( A -> B{1,2} )
        WITHIN 7 DAYS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'view'
                    AND SUM(B.cents) <= 100000
                    AND B.cents >= A.cents
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
    """
    got = {tuple(r) for r in match_recognize(df, text).collect()}
    assert got == {
        (1, m(0), 1, 1500),
        (1, m(3), 2, 3500),
    }


def test_ivfpq_empty_compact_and_empty_epoch_survive(spark, tmp_path):
    """The two review-caught lifecycle edges: (a) delete-EVERYTHING +
    compact leaves a fileless cells/ dir — the index must keep
    serving (empty results), accept a later append, and serve again;
    (b) a streaming epoch whose batch is entirely invalid vectors
    writes a fileless epoch dir — queries must not crash on it."""
    import numpy as np

    from spark_cep_spark.operators.llm_similarity import IvfPqIndex

    rng = np.random.RandomState(31)
    base = rng.normal(size=(60, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    schema = "vec_id long, embedding array<double>"
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(base)], schema
    )
    q = df.filter(F.col("vec_id") < 3)

    # (a) delete everything, compact, keep serving
    p = str(tmp_path / "idx")
    idx = IvfPqIndex.build(spark, df, p)
    idx.delete(df.select("vec_id"))
    idx.compact()
    assert idx.query(q, k=5).collect() == []
    # the index is NOT bricked: append works and queries serve again
    idx.append(df.filter(F.col("vec_id") >= 3))
    got = idx.query(q, k=5).collect()
    assert len(got) > 0

    # (b) an all-invalid micro-batch (wrong dim) -> fileless epoch
    stage = str(tmp_path / "stage")
    bad = spark.createDataFrame([(900, [1.0, 2.0])], schema)
    bad.coalesce(1).write.mode("overwrite").parquet(stage)
    s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    idx.stream_ingest(s, checkpoint=str(tmp_path / "ck")).awaitTermination()
    got2 = idx.query(q, k=5).collect()
    assert sorted(map(tuple, got2)) == sorted(map(tuple, got))
    idx.compact()  # folds the fileless epoch away without error
    got3 = idx.query(q, k=5).collect()
    assert sorted(map(tuple, got3)) == sorted(map(tuple, got))


def test_log2_sketch_mergeable_by_addition(spark, sf_dir):
    """The sketch's 100 TB claim, pinned: per-DAY partial bucket
    counts summed by plain addition then read as quantiles equal the
    direct whole-table sketch exactly (the agg_hll_union invariant,
    but exact) — re-aggregation without touching raw values."""
    from spark_cep_spark.io import table as _table

    e = (
        _table(spark, sf_dir, "events")
        .filter(
            "ts IS NOT NULL AND value IS NOT NULL "
            "AND value > 0 AND value <= 1e9"
        )
        .selectExpr(
            "CAST(ts AS DATE) AS day",
            "coalesce(event_type, '') AS etype",
            "length(bin(CAST(round(value * 100) AS BIGINT))) AS b",
        )
    )
    # partials per (day, etype, b), merged by addition across days
    merged = (
        e.groupBy("day", "etype", "b")
        .count()
        .groupBy("etype", "b")
        .agg(F.sum("count").cast("long").alias("cnt"))
    )

    def read_q(counts):
        from spark_cep_spark.streaming.windows import log2q_select

        # the SHARED finisher: the invariant under test is that
        # merged-by-addition partials feed it identically
        return log2q_select(counts, keys=("etype",), ps=(50, 99))

    direct = read_q(
        e.groupBy("etype", "b").agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
    )
    a = sorted(tuple(r) for r in read_q(merged).collect())
    b = sorted(tuple(r) for r in direct.collect())
    assert a == b and len(a) > 0
