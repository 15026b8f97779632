"""Round-11 operators: MIXED multi-query rule packs — a chain rule
and a running-aggregate rule over ONE scan and ONE keyed state
(match_recognize_all lifts the round-10 pointed error; the variant
multiplexer gains kind='kleene_agg' specs driving advance_kleene_agg
next to chain NFAs — streaming/nfa.py advance_variants)."""

from __future__ import annotations

import datetime as dt
import os
import tempfile
import time

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_cep_spark.operators.cep_sql import match_recognize_all

T0 = dt.datetime(2024, 1, 1)
MIX_SCHEMA = (
    "user_id long, ts timestamp, event_id long, event_type string, "
    "cents long"
)

RULES = [
    (
        "funnel",
        """
        PATTERN ( v -> p )
        WITHIN 1 HOUR
        DEFINE v AS event_type = 'view', p AS event_type = 'purchase'
        PARTITION BY user_id
        ORDER BY ts
        """,
    ),
    (
        "threshold",
        """
        PATTERN ( a -> b+ )
        WITHIN 1 HOUR
        DEFINE a AS event_type = 'signup',
               b AS event_type = 'view' AND SUM(b.cents) <= 100
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    ),
]


def _t(m):
    return T0 + dt.timedelta(minutes=m)


def _rows():
    return [
        # user 1: a funnel AND a threshold run 40+50 (the 60 breaks it)
        (1, _t(0), 1, "signup", None),
        (1, _t(1), 2, "view", 40),
        (1, _t(2), 3, "view", 50),
        (1, _t(3), 4, "view", 60),
        (1, _t(4), 5, "purchase", None),
        # user 2: funnel only
        (2, _t(0), 6, "view", 10),
        (2, _t(5), 7, "purchase", None),
        # user 3: a run that only closes on the DEADLINE (no breaker)
        (3, _t(0), 8, "signup", None),
        (3, _t(1), 9, "view", 30),
    ]


def test_mixed_pack_batch_values(spark):
    out = match_recognize_all(
        spark.createDataFrame(_rows(), MIX_SCHEMA), RULES
    )
    got = sorted((tuple(r) for r in out.collect()), key=repr)
    names = out.columns
    assert names == [
        "key", "anchor_id", "t_v", "t_p", "t_a", "b_count",
        "b_sum_cents", "pattern_name",
    ]
    fun = [r for r in got if r[-1] == "funnel"]
    thr = [r for r in got if r[-1] == "threshold"]
    # funnel: every view before the purchase, per user
    assert [(r[0], r[1]) for r in sorted(fun)] == [
        (1, 2), (1, 3), (1, 4), (2, 6),
    ]
    # threshold: (key, anchor NULL, n, s) — run-agg rows pad anchor_id
    assert sorted((r[0], r[1], r[5], r[6]) for r in thr) == [
        (1, None, 2, 90),
        (3, None, 1, 30),
    ]
    # padding: chain rows carry NULL run-agg cols and vice versa
    assert all(r[4] is None and r[5] is None for r in fun)
    assert all(r[2] is None and r[3] is None for r in thr)


def test_mixed_pack_stream_equals_batch(spark):
    from spark_cep_spark.streaming import harness

    rows = _rows()
    df = spark.createDataFrame(rows, MIX_SCHEMA)
    batch = match_recognize_all(df, RULES)
    d = tempfile.mkdtemp()
    # trailing far-future sentinels (key 9) push the watermark past
    # every deadline so the deadline-close threshold emission (user 3)
    # appears on the stream face too
    chunks = [rows[:4], rows[4:]] + [
        [(9, dt.datetime(2024, 1, 1, h, 0), 100 + h, "view", None)]
        for h in (10, 20)
    ]
    for i, ch in enumerate(chunks):
        spark.createDataFrame(ch, MIX_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"f{i}"))
        time.sleep(1.05)
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "f*"))
    )
    got = harness.run_available_now(
        match_recognize_all(sdf, RULES, watermark="0 seconds"), "append"
    )
    g = sorted(
        (tuple(r) for r in got.filter("key <> 9").collect()), key=repr
    )
    w = sorted(
        (
            tuple(r)
            for r in batch.filter("key <> 9").select(*got.columns).collect()
        ),
        key=repr,
    )
    assert g == w and len(g) == 6


def test_mixed_pack_pointed_errors(spark):
    df = spark.createDataFrame([], MIX_SCHEMA)
    ra = RULES[1][1]
    # anchor correlation needs its own projected columns — rejected
    with pytest.raises(ValueError, match="anchor-correlation"):
        match_recognize_all(
            df,
            [
                RULES[0],
                (
                    "r2",
                    ra.replace(
                        "SUM(b.cents) <= 100",
                        "SUM(b.cents) <= 100 AND b.cents > a.cents",
                    ),
                ),
            ],
        )
    # MEASURES stay pack-rejected on the run-agg side too
    with pytest.raises(ValueError, match="MEASURES is not supported"):
        match_recognize_all(
            df,
            [
                RULES[0],
                (
                    "r2",
                    ra.replace(
                        "AFTER MATCH",
                        "MEASURES FINAL COUNT(b.cents) AS n\nAFTER MATCH",
                    ),
                ),
            ],
        )


def test_kleene_agg_spec_requires_mode_all(spark):
    from spark_cep_spark.operators.cep_sql import (
        _run_agg_pack_spec,
        parse_pattern_sql,
    )
    from spark_cep_spark.streaming.nfa import compile_stream_variants

    df = spark.createDataFrame([], MIX_SCHEMA)
    spec = _run_agg_pack_spec(df, parse_pattern_sql(RULES[1][1]))
    with pytest.raises(ValueError, match="mode='all'"):
        compile_stream_variants(
            [("r", spec)], df, mode="preference"
        )


def test_run_agg_quantifier_bounds_in_pack(spark):
    # {2,} bounds route through _rewrite_run_agg_bounds inside the pack
    rows = _rows()
    out = match_recognize_all(
        spark.createDataFrame(rows, MIX_SCHEMA),
        [
            RULES[0],
            (
                "threshold2",
                RULES[1][1].replace("b+", "b{2,}"),
            ),
        ],
    )
    thr = [
        tuple(r)
        for r in out.filter("pattern_name = 'threshold2'").collect()
    ]
    # user 3's single-view run (n=1 < 2) must NOT emit; user 1's
    # 2-view run stays
    assert [(r[0], r[5], r[6]) for r in sorted(thr)] == [(1, 2, 90)]


# ---------------------------------------------------------------------------
# kernel property: mixed chain + kleene-agg multiplexing is
# chunking-invariant


def _mixed_specs():
    # r1 = chain v->p within 50; r2 = kleene-agg: a anchors, b binds
    # while run sum (incl. itself) <= 100, within 30.
    # flags vector = [is_v, is_p, is_a, is_b]; vals = [cents]
    return [
        {
            "off": 0, "n": 2, "contig": ["relaxed", "relaxed"],
            "gaps": None, "corr": None, "env_names": None,
            "run_cols": None, "emit_env": False, "bound_us": 50,
            "row": lambda b, env: {"td": b[-1][0], "_td": b[-1][0],
                                   "r": 1},
        },
        {
            "off": 2, "n": 2, "kind": "kleene_agg", "val_idx": 0,
            "integral": True, "confirm": False, "min_n": 1,
            "max_n": None, "combine": None, "bound_us": 30,
            "bind": lambda n, s, v: s + v <= 100,
            "row": lambda rec: {"anchor": rec[0], "n": rec[1],
                                "s": rec[2], "r": 2},
        },
    ]


@given(
    st.lists(
        st.tuples(
            st.integers(0, 20),
            st.sampled_from("vpabx"),
            st.integers(0, 60),
        ),
        min_size=1,
        max_size=30,
    ),
    st.lists(st.integers(1, 29), max_size=3),
)
@settings(max_examples=150, deadline=None)
def test_advance_variants_mixed_chunking_invariance(evs, cuts):
    """A kleene-agg rule sharing the mode='all' state with a chain
    rule must emit the same matches (runs, counts, sums) under any
    micro-batch split — including deadline closes straddling cuts."""
    from spark_cep_spark.streaming.nfa import advance_variants

    specs = _mixed_specs()
    t = 0
    rows = []
    for i, (d, et, cents) in enumerate(evs):
        t += d
        flags = [et == "v", et == "p", et == "a", et == "b"]
        rows.append([t, i, flags, [cents]])

    def run(chunks):
        pv, pend, done, out = [[], []], [], [], []
        for ch, wm in chunks:
            pv, pend, done, part = advance_variants(
                pv, pend, done, ch, wm, specs, 50, "all",
                val_cols=("cents",),
            )
            out += part
        # kleene-agg emissions carry anchor eid None — sort by repr
        return sorted(
            (repr(eid), repr(sorted(r.items()))) for eid, r in out
        )

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
# PERMUTE(...) -> terminal (round 11, verdict item 3)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)

PC_SQL = """
PATTERN ( PERMUTE(a, b) -> x )
WITHIN 1 HOUR
DEFINE a AS value >= 2, b AS value <= 3, x AS event_type = 'X'
PARTITION BY user_id
ORDER BY ts
"""


def _pc_rows():
    def _t(m):
        return T0 + dt.timedelta(minutes=m)

    return [
        # user 1: anchor@1 (v=2.5 satisfies BOTH a and b), then 4.0
        # (a-only) at t2, then X — ordering b->a completes (b@1, a@2);
        # ordering a->b needs a b after t1: the 1.0 row at t3 gives
        # a->b a LATER confirm; winner = earliest confirm
        (1, _t(1), 1, "view", 2.5, "{}"),
        (2, _t(2), 1, "view", 4.0, "{}"),
        (3, _t(3), 1, "view", 1.0, "{}"),
        (4, _t(4), 1, "X", 10.0, "{}"),
        # user 2: a@1 (v=5), b@2 (v=1), X@3 — only a->b
        (5, _t(1), 2, "view", 5.0, "{}"),
        (6, _t(2), 2, "view", 1.0, "{}"),
        (7, _t(3), 2, "X", 10.0, "{}"),
        # user 3: a@1, b@2 but NO X -> no match
        (8, _t(1), 3, "view", 5.0, "{}"),
        (9, _t(2), 3, "view", 1.0, "{}"),
    ]


def test_permute_confirm_batch_winner_per_anchor(spark):
    from spark_cep_spark.operators.cep_sql import match_recognize

    out = match_recognize(
        spark.createDataFrame(_pc_rows(), EV_SCHEMA), PC_SQL
    )
    assert out.columns == [
        "key", "anchor_id", "t_a", "t_b", "t_x", "permute_order",
    ]
    got = {
        (r["key"], r["anchor_id"]): (
            r["t_a"].minute, r["t_b"].minute, r["t_x"].minute,
            r["permute_order"],
        )
        for r in out.collect()
    }
    # user 1: BOTH orderings anchor at event 1 and confirm at the
    # same X@4 (a->b binds b@3; b->a binds a@2) — declaration rank
    # breaks the (td) tie: a->b wins
    assert got[(1, 1)] == (1, 3, 4, "a->b")
    # user 1, anchor 2 (v=4.0, a-only): a@2 -> b@3 -> X@4
    assert got[(1, 2)] == (2, 3, 4, "a->b")
    assert got[(2, 5)] == (1, 2, 3, "a->b")
    # user 2, anchor 6 (v=1 satisfies both): b->a has no later a;
    # a->b (anchor a=nothing later)... v=1 is b-only for a (needs
    # >=2): as an 'a' anchor it fails, as 'b' anchor needs later a —
    # none. 3 matches total.
    assert len(got) == 3


def test_permute_confirm_stream_equals_batch(spark):
    from spark_cep_spark.operators.cep_sql import match_recognize
    from spark_cep_spark.streaming import harness

    rows = _pc_rows()
    df = spark.createDataFrame(rows, EV_SCHEMA)
    batch = match_recognize(df, PC_SQL)
    d = tempfile.mkdtemp()
    chunks = [rows[:4], rows[4:]] + [
        [(100 + j, dt.datetime(2024, 1, 1, h, 0), 9, "view", 0.0, "{}")]
        for j, h in enumerate((10, 20))
    ]
    for i, ch in enumerate(chunks):
        spark.createDataFrame(ch, EV_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"f{i}"))
        time.sleep(1.05)
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "f*"))
    )
    got = harness.run_available_now(
        match_recognize(sdf, PC_SQL, watermark="0 seconds"), "append"
    )
    g = sorted(
        (tuple(r) for r in got.filter("key <> 9").collect()), key=repr
    )
    w = sorted(
        (
            tuple(r)
            for r in batch.filter("key <> 9").select(*got.columns).collect()
        ),
        key=repr,
    )
    assert g == w and len(g) == 3
