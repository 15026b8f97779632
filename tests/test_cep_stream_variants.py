"""Streaming faces for the quantifier / PERMUTE expansions
(compile_stream_variants + the pure advance_variants kernel): the
expanded variants run as parallel NFAs in one keyed state and the
preference (greedy/reluctant) or earliest-completion (PERMUTE) winner
is decided per anchor. Spark tests assert multi-micro-batch streaming
== the batch compiler; kernel tests assert brute-force agreement and
chunking invariance without a SparkSession."""

from __future__ import annotations

import datetime as dt
import math
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


def _stream_vs_batch(spark, rows, sql, tail_type):
    """Stage rows as 2 content files + 2 far-future tail files (the
    tail events MATCH a step so they advance the pushed-down
    watermark past every anchor's deadline — see the
    filter_nonmatching caveat), run availableNow with
    maxFilesPerTrigger=1, and return (streaming, batch) row sets with
    the tail user filtered out of both."""
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


OPTIONAL_SQL = """
PATTERN ( A -> B? -> C )
WITHIN 2 HOURS
DEFINE A AS event_type = 'signup',
       B AS event_type = 'error',
       C AS event_type = 'purchase'
"""


def test_stream_optional_equals_batch(spark):
    rows = [
        (1, 0, "signup", 1.0), (1, 10, "error", 1.0), (1, 20, "purchase", 1.0),
        (2, 0, "signup", 1.0), (2, 15, "purchase", 1.0),
        # with-B variant alive (error seen) but never completes — the
        # held A->C decision must resolve at the anchor deadline
        (3, 0, "signup", 1.0), (3, 30, "purchase", 1.0), (3, 40, "error", 1.0),
        (4, 0, "signup", 1.0), (4, 10, "error", 1.0),
    ]
    g, w = _stream_vs_batch(spark, rows, OPTIONAL_SQL, "signup")
    assert g == w and len(g) == 3


def test_stream_optional_greedy_wins_even_when_slower(spark):
    """The skip variant completes EARLIER (purchase at 5') but greedy
    preference must still wait for — and emit — the with-B chain."""
    rows = [
        (1, 0, "signup", 1.0), (1, 5, "purchase", 1.0),
        (1, 10, "error", 1.0), (1, 20, "purchase", 1.0),
    ]
    g, w = _stream_vs_batch(spark, rows, OPTIONAL_SQL, "signup")
    assert g == w and len(g) == 1
    assert g[0][-1] == "A->B->C"


def test_stream_range_equals_batch(spark):
    sql = """
PATTERN ( A -> B{1,3} )
WITHIN 2 HOURS
DEFINE A AS event_type = 'view', B AS event_type = 'click'
"""
    rows = [
        (1, 0, "view", 1.0), (1, 5, "click", 1.0),
        (1, 10, "click", 1.0), (1, 15, "click", 1.0),
        (2, 0, "view", 1.0), (2, 5, "click", 1.0), (2, 10, "click", 1.0),
        (3, 0, "view", 1.0), (3, 5, "click", 1.0),
        (4, 0, "view", 1.0),
    ]
    g, w = _stream_vs_batch(spark, rows, sql, "view")
    assert g == w and len(g) == 3


def test_stream_reluctant_equals_batch(spark):
    sql = """
PATTERN ( A => B?? => C )
WITHIN 2 HOURS
DEFINE A AS event_type = 'signup',
       B AS event_type = 'click',
       C AS event_type = 'purchase'
"""
    rows = [
        (1, 0, "signup", 1.0), (1, 10, "purchase", 1.0),
        (2, 0, "signup", 1.0), (2, 5, "click", 1.0), (2, 10, "purchase", 1.0),
        (3, 0, "signup", 1.0), (3, 5, "view", 1.0), (3, 10, "purchase", 1.0),
    ]
    g, w = _stream_vs_batch(spark, rows, sql, "signup")
    assert g == w and len(g) == 2


def test_stream_permute_equals_batch(spark):
    sql = """
PATTERN ( V -> PERMUTE(C, P) )
WITHIN 2 HOURS
DEFINE V AS event_type = 'view',
       C AS event_type = 'click',
       P AS event_type = 'purchase'
"""
    rows = [
        (1, 0, "view", 1.0), (1, 5, "click", 1.0), (1, 10, "purchase", 1.0),
        (2, 0, "view", 1.0), (2, 5, "purchase", 1.0), (2, 10, "click", 1.0),
        (3, 0, "view", 1.0), (3, 5, "click", 1.0),
    ]
    g, w = _stream_vs_batch(spark, rows, sql, "view")
    assert g == w and len(g) == 2
    orders = {r[0]: r[-1] for r in g}
    assert orders == {1: "C->P", 2: "P->C"}


def test_stream_measures_over_optional_equals_batch(spark):
    sql = """
PATTERN ( A -> B? -> C )
WITHIN 2 HOURS
MEASURES C.value - A.value AS uplift, B.value AS b_val
DEFINE A AS event_type = 'signup',
       B AS event_type = 'error',
       C AS event_type = 'purchase'
"""
    rows = [
        (1, 0, "signup", 10.0), (1, 10, "error", 3.0),
        (1, 20, "purchase", 25.0),
        (2, 0, "signup", 5.0), (2, 15, "purchase", 9.0),
    ]
    g, w = _stream_vs_batch(spark, rows, sql, "signup")
    assert g == w and len(g) == 2
    by_key = {r[0]: r for r in g}
    # with-B: uplift 15, b_val 3; skip: uplift 4, b_val NULL
    assert by_key[1][-3:] == (15.0, 3.0, "A->B->C")
    assert by_key[2][-3:] == (4.0, None, "A->C")


def test_variant_state_survives_checkpoint_restart(spark, tmp_path):
    """Kill-and-resume for the variant runner: the FIRST run ends with
    a completed-but-HELD decision in `pend` (the skip variant finished
    but the with-variant is still alive for the anchor); the restart
    must restore pend/done/partials from the checkpoint and emit the
    held match once the watermark passes the deadline — equal to the
    uninterrupted batch result, with no duplicates."""
    data = [
        # key 1: greedy with-B chain completes — emits during run 1
        (0, T0, 1, "signup", 1.0, "{}"),
        (1, T0 + dt.timedelta(minutes=10), 1, "error", 1.0, "{}"),
        (2, T0 + dt.timedelta(minutes=20), 1, "purchase", 1.0, "{}"),
        # key 2: A->C completes but A->B->C stays alive -> held in pend
        (3, T0, 2, "signup", 1.0, "{}"),
        (4, T0 + dt.timedelta(minutes=15), 2, "purchase", 1.0, "{}"),
    ]
    tails = [
        (100, T0 + dt.timedelta(minutes=500), 9, "signup", 1.0, "{}"),
        (101, T0 + dt.timedelta(minutes=1000), 9, "signup", 1.0, "{}"),
    ]
    df = spark.createDataFrame(data + tails, SCHEMA)
    src = str(tmp_path / "src")
    os.makedirs(src)

    def add_file(name, chunk, order):
        d = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        part = [f for f in os.listdir(d) if f.startswith("part")][0]
        dst = os.path.join(src, f"{name}.parquet")
        import shutil

        shutil.copy(os.path.join(d, part), dst)
        os.utime(dst, (1_700_000_000 + order * 3600,) * 2)

    def run(out, ckpt):
        sdf = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            match_recognize(sdf, OPTIONAL_SQL, watermark="0 seconds")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    add_file("f0", data[:3], 0)
    add_file("f1", data[3:], 1)
    run(out, ckpt)  # run 1: key 1 emitted; key 2 held in pend
    first = spark.read.parquet(out)
    assert sorted(r["key"] for r in first.collect()) == [1]
    add_file("f2", tails[:1], 2)
    add_file("f3", tails[1:], 3)
    run(out, ckpt)  # run 2: watermark passes the deadline -> pend emits

    got = spark.read.parquet(out).filter("key <> 9")
    want = match_recognize(df, OPTIONAL_SQL).filter("key <> 9")
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.select(*got.columns).collect())
    assert g == w and len(g) == 2
    assert got.count() == got.dropDuplicates(["key", "anchor_id"]).count()


# ---------------------------------------------------------------------------
# Pure-kernel property tests (no SparkSession): advance_variants vs a
# brute-force greedy reference, and chunking invariance.

from hypothesis import given, settings, strategies as st  # noqa: E402

from spark_cep_spark.streaming.nfa import advance_variants  # noqa: E402

BOUND = 120  # the within bound in kernel time units


def _opt_specs():
    """A -> B? -> C as two variants: rank 1 = A->B->C, rank 2 = A->C.
    Flags layout per event: [isA, isB, isC, isA, isC]."""
    return [
        {
            "off": 0,
            "n": 3,
            "contig": ["relaxed"] * 3,
            "row": lambda b, env: {
                "_td": b[-1][0],
                "steps": tuple(e[0] for e in b),
                "k": 3,
            },
        },
        {
            "off": 3,
            "n": 2,
            "contig": ["relaxed"] * 2,
            "row": lambda b, env: {
                "_td": b[-1][0],
                "steps": tuple(e[0] for e in b),
                "k": 2,
            },
        },
    ]


def _opt_flags(rows):
    """rows: [(ts, eid, type)] with type in A/B/C."""
    return [
        [ts, eid, [t == "A", t == "B", t == "C", t == "A", t == "C"]]
        for ts, eid, t in rows
    ]


def _brute_opt(rows):
    """Greedy A -> B? -> C (transcribing _compile_quantifier_batch):
    per A anchor prefer the earliest-chain A-B-C, else A-C."""
    out = []
    for ts0, eid, t in rows:
        if t != "A":
            continue
        hit = None
        bs = sorted(
            ts for ts, _e, tt in rows
            if tt == "B" and ts0 < ts <= ts0 + BOUND
        )
        if bs:
            cs = sorted(
                ts for ts, _e, tt in rows
                if tt == "C" and bs[0] < ts <= ts0 + BOUND
            )
            if cs:
                hit = (eid, (ts0, bs[0], cs[0]))
        if hit is None:
            cs = sorted(
                ts for ts, _e, tt in rows
                if tt == "C" and ts0 < ts <= ts0 + BOUND
            )
            if cs:
                hit = (eid, (ts0, cs[0]))
        if hit:
            out.append(hit)
    return sorted(out)


def _drive(chunks, wms):
    """Feed event chunks through the kernel with the given watermark
    after each chunk, then a final far-future watermark; return the
    sorted decided (anchor_eid, steps) pairs."""
    per_var = [[], []]
    pend: list = []
    done: list = []
    decided = []
    specs = _opt_specs()
    for chunk, wm in zip(chunks, wms):
        per_var, pend, done, out = advance_variants(
            per_var, pend, done, chunk, wm, specs, BOUND, "preference"
        )
        decided += out
    per_var, pend, done, out = advance_variants(
        per_var, pend, done, [], 10_000_000, specs, BOUND, "preference"
    )
    decided += out
    assert pend == [] and done == [] and per_var == [[], []]
    return sorted((eid, r["steps"]) for eid, r in decided)


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),
        st.sampled_from(["A", "B", "C"]),
    ),
    min_size=0,
    max_size=16,
)


@settings(max_examples=300, deadline=None)
@given(events_strategy)
def test_variants_kernel_matches_brute_force(seq):
    rows = sorted(
        [(ts, eid, t) for eid, (ts, t) in enumerate(seq)],
        key=lambda r: (r[0], r[1]),
    )
    got = _drive([_opt_flags(rows)], [max((r[0] for r in rows), default=0)])
    assert got == _brute_opt(rows)


@settings(max_examples=300, deadline=None)
@given(
    events_strategy,
    st.lists(st.integers(min_value=0, max_value=16), max_size=4),
)
def test_variants_kernel_chunking_invariance(seq, cuts):
    """Micro-batch boundaries (and the watermark schedule they imply)
    are semantically invisible: any split of the ordered stream
    produces the same decisions as one shot."""
    rows = sorted(
        [(ts, eid, t) for eid, (ts, t) in enumerate(seq)],
        key=lambda r: (r[0], r[1]),
    )
    flags = _opt_flags(rows)
    one_shot = _drive([flags], [max((r[0] for r in rows), default=0)])

    bounds = sorted({c for c in cuts if c <= len(flags)})
    chunks, prev = [], 0
    for c in bounds + [len(flags)]:
        chunks.append(flags[prev:c])
        prev = c
    # watermark after each chunk = its last event's ts (monotone)
    wms, wm = [], 0
    for ch in chunks:
        if ch:
            wm = ch[-1][0]
        wms.append(wm)
    assert _drive(chunks, wms) == one_shot


def test_earliest_mode_decides_immediately():
    """PERMUTE winner rule: a seen candidate can never be beaten — the
    kernel emits it without waiting for the other ordering to die."""
    specs = _opt_specs()
    # C precedes B: rank 2 (A->C) completes at ts 5 while rank 1 is
    # still ALIVE (B bound at 10, waiting for a later C).
    # earliest-mode must emit the completed candidate immediately.
    flags = _opt_flags([(0, 0, "A"), (5, 1, "C"), (10, 2, "B")])
    per_var, pend, done, out = advance_variants(
        [[], []], [], [], flags, 10, specs, BOUND, "earliest"
    )
    assert len(out) == 1 and out[0][1]["k"] == 2
    assert pend == [] and [d[1] for d in done] == [0]
    assert len(per_var[0]) == 1  # rank 1 still alive, now moot
    # preference mode on the same input must HOLD (rank 1 alive)
    per_var, pend, done, out = advance_variants(
        [[], []], [], [], flags, 10, _opt_specs(), BOUND, "preference"
    )
    assert out == [] and len(pend) == 1


def test_stream_optional_under_rocksdb_state_store(spark):
    """The variant runner's JSON state payload must round-trip through
    the RocksDB state store provider (the 100 TB deployment choice)
    exactly as through the default HDFS-backed one."""
    conf = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf, None)
    spark.conf.set(
        conf,
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider",
    )
    try:
        rows = [
            (1, 0, "signup", 1.0), (1, 10, "error", 1.0),
            (1, 20, "purchase", 1.0),
            (2, 0, "signup", 1.0), (2, 15, "purchase", 1.0),
        ]
        g, w = _stream_vs_batch(spark, rows, OPTIONAL_SQL, "signup")
        assert g == w and len(g) == 2
    finally:
        if prev is None:
            spark.conf.unset(conf)
        else:
            spark.conf.set(conf, prev)


def test_variants_handle_out_of_order_arrival_within_watermark(spark, tmp_path):
    """Production arrival shape: the purchase ARRIVES in an earlier
    micro-batch than the signup (files reversed), both inside a 30-min
    watermark delay — event-time order must win inside the shared
    buffer before the variant kernels run, and the greedy decision
    must still pick the with-B chain. Sentinel signups flush the
    watermark past the anchor deadline."""
    import shutil

    def mk(rows, sid):
        return spark.createDataFrame(
            [
                (sid + i, t, u, ty, 1.0, "{}")
                for i, (u, t, ty) in enumerate(rows)
            ],
            SCHEMA.replace("event_id long, ts", "event_id long, ts"),
        )

    t0 = T0
    src = str(tmp_path / "ooo")
    # arrival order: purchase(t0+20m) -> error(t0+10m) -> signup(t0)
    # -> sentinels; all content events within the 30-min delay
    mk([(1, t0 + dt.timedelta(minutes=20), "purchase")], 0).coalesce(
        1
    ).write.parquet(src)
    mk([(1, t0 + dt.timedelta(minutes=10), "error")], 10).coalesce(
        1
    ).write.mode("append").parquet(src)
    mk([(1, t0, "signup")], 20).coalesce(1).write.mode("append").parquet(src)
    mk([(9, t0 + dt.timedelta(hours=10), "signup")], 30).coalesce(
        1
    ).write.mode("append").parquet(src)
    mk([(9, t0 + dt.timedelta(hours=20), "signup")], 40).coalesce(
        1
    ).write.mode("append").parquet(src)
    import glob

    order = []
    for f in glob.glob(src + "/part*"):
        ids = [r.event_id for r in spark.read.parquet(f).collect()]
        order.append((min(ids), f))
    order.sort()
    now = 1_700_000_000
    for i, (_, f) in enumerate(order):
        os.utime(f, (now + 3600 * i,) * 2)

    sdf = (
        spark.readStream.schema(
            spark.read.parquet(src).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from spark_cep_spark.streaming import harness

    got = harness.run_available_now(
        match_recognize(sdf, OPTIONAL_SQL, watermark="30 minutes"), "append"
    ).filter("key <> 9")
    rows = got.collect()
    assert len(rows) == 1
    assert rows[0]["variant"] == "A->B->C"
    assert rows[0]["t_B"] == t0 + dt.timedelta(minutes=10)


# ---------------------------------------------------------------------------
# Kernel property tests for the RELUCTANT decision under strict
# contiguity (A => B?? => C): rank 1 = the skip variant A=>C.


def _rel_specs():
    return [
        {
            "off": 0,
            "n": 2,
            "contig": ["relaxed", "strict"],
            "row": lambda b, env: {
                "_td": b[-1][0],
                "steps": tuple(e[0] for e in b),
                "k": 2,
            },
        },
        {
            "off": 2,
            "n": 3,
            "contig": ["relaxed", "strict", "strict"],
            "row": lambda b, env: {
                "_td": b[-1][0],
                "steps": tuple(e[0] for e in b),
                "k": 3,
            },
        },
    ]


def _rel_flags(rows):
    return [
        [ts, eid, [t == "A", t == "C", t == "A", t == "B", t == "C"]]
        for ts, eid, t in rows
    ]


def _brute_reluctant(rows):
    """Strict-chain reluctant A => B?? => C: per anchor, prefer the
    A=>C chain (immediately-next event is C), else A=>B=>C."""
    out = []
    for i, (ts0, eid, t) in enumerate(rows):
        if t != "A":
            continue
        nxt = rows[i + 1] if i + 1 < len(rows) else None
        nxt2 = rows[i + 2] if i + 2 < len(rows) else None
        if nxt and nxt[2] == "C" and nxt[0] <= ts0 + BOUND:
            out.append((eid, (ts0, nxt[0])))
        elif (
            nxt
            and nxt2
            and nxt[2] == "B"
            and nxt2[2] == "C"
            and nxt[0] <= ts0 + BOUND
            and nxt2[0] <= ts0 + BOUND
        ):
            out.append((eid, (ts0, nxt[0], nxt2[0])))
    return sorted(out)


def _drive_rel(chunks, wms):
    per_var = [[], []]
    pend: list = []
    done: list = []
    decided = []
    specs = _rel_specs()
    for chunk, wm in zip(chunks, wms):
        per_var, pend, done, out = advance_variants(
            per_var, pend, done, chunk, wm, specs, BOUND, "preference"
        )
        decided += out
    per_var, pend, done, out = advance_variants(
        per_var, pend, done, [], 10_000_000, specs, BOUND, "preference"
    )
    decided += out
    return sorted((eid, r["steps"]) for eid, r in decided)


rel_strategy = st.lists(
    st.sampled_from(["A", "B", "C"]), min_size=0, max_size=14
)


@settings(max_examples=300, deadline=None)
@given(rel_strategy)
def test_reluctant_kernel_matches_brute_force(seq):
    # unique ascending ts (one per index) — strict semantics need a
    # total event order, matching the Spark tests' construction
    rows = [(i * 2, i, t) for i, t in enumerate(seq)]
    got = _drive_rel(
        [_rel_flags(rows)], [max((r[0] for r in rows), default=0)]
    )
    assert got == _brute_reluctant(rows)


@settings(max_examples=300, deadline=None)
@given(
    rel_strategy,
    st.lists(st.integers(min_value=0, max_value=14), max_size=4),
)
def test_reluctant_kernel_chunking_invariance(seq, cuts):
    rows = [(i * 2, i, t) for i, t in enumerate(seq)]
    flags = _rel_flags(rows)
    one_shot = _drive_rel(
        [flags], [max((r[0] for r in rows), default=0)]
    )
    bounds = sorted({c for c in cuts if c <= len(flags)})
    chunks, prev = [], 0
    for c in bounds + [len(flags)]:
        chunks.append(flags[prev:c])
        prev = c
    wms, wm = [], 0
    for ch in chunks:
        if ch:
            wm = ch[-1][0]
        wms.append(wm)
    assert _drive_rel(chunks, wms) == one_shot


def test_stream_group_times_equals_batch(spark):
    """Quantified group `(A -> B){1,2}` on a stream: the flattened
    arity variants ride the same preference runner."""
    sql = """
PATTERN ( S -> (A -> B){1,2} )
WITHIN 2 HOURS
DEFINE S AS event_type = 'signup',
       A AS event_type = 'view',
       B AS event_type = 'click'
"""
    rows = [
        (1, 0, "signup", 1.0), (1, 5, "view", 1.0), (1, 10, "click", 1.0),
        (1, 15, "view", 1.0), (1, 20, "click", 1.0),
        (2, 0, "signup", 1.0), (2, 5, "view", 1.0), (2, 10, "click", 1.0),
        (3, 0, "signup", 1.0),
    ]
    g, w = _stream_vs_batch(spark, rows, sql, "signup")
    assert g == w and len(g) == 2
    variants = {r[0]: r[-1] for r in g}
    assert variants[1] == "S->A_r1->B_r1->A_r2->B_r2"
    assert variants[2] == "S->A_r1->B_r1"


# ---------------------------------------------------------------------------
# Streaming AFTER MATCH SKIP policies (advance_skip_select +
# compile_stream(skip_policy=...)).

from spark_cep_spark.streaming.nfa import advance_skip_select  # noqa: E402


def _brute_skip(entries, inclusive):
    """One-shot greedy recurrence over all matches in (start, marker,
    tiebreak) order — the batch selectors' definition."""
    kept, last = [], None
    for s, mk, tb, payload in sorted(entries, key=lambda m: m[:3]):
        if last is None or (s >= last if inclusive else s > last):
            last = mk
            kept.append(payload)
    return kept


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 10)),
        min_size=0,
        max_size=12,
    ),
    st.lists(st.integers(min_value=0, max_value=12), max_size=4),
    st.booleans(),
)
def test_skip_select_kernel_chunking_invariance(raw, cuts, inclusive):
    """Any arrival-order chunking of the match stream yields the batch
    recurrence's selection. The stream model mirrors the NFA's
    contract: a match ENDS within its anchor window (end - start <=
    bound), matches arrive in completion order, the watermark after a
    chunk is the max completion seen, and a chunk boundary never
    splits two matches completing at the same watermark (the NFA
    emits them in one batch)."""
    B = 10
    entries = [
        [s, s + d, i, ["p", i]] for i, (s, d) in enumerate(raw)
    ]
    want = _brute_skip(entries, inclusive)

    arrival = sorted(entries, key=lambda m: (m[1], m[2]))
    valid = [
        c
        for c in range(1, len(arrival))
        if arrival[c - 1][1] < arrival[c][1]
    ]
    bounds = sorted({valid[c % len(valid)] for c in cuts} if valid else set())
    chunks, prev = [], 0
    for c in bounds + [len(arrival)]:
        chunks.append(arrival[prev:c])
        prev = c
    pending, marker, got = [], None, []
    wm = 0
    for ch in chunks:
        if ch:
            wm = max(wm, max(m[1] for m in ch))
        pending, marker, kept = advance_skip_select(
            pending, marker, ch, wm, B, inclusive=inclusive
        )
        got += kept
    pending, marker, kept = advance_skip_select(
        pending, marker, [], 10_000, B, inclusive=inclusive
    )
    got += kept
    assert pending == [] and got == want


def test_stream_skip_past_equals_batch_selector(spark, tmp_path):
    """compile_stream(skip_policy='skip_past_last_row') over multiple
    micro-batches equals the batch pipeline (compile_batch +
    select_non_overlapping) — including a held decision: the second
    anchor's match completes EARLIER than the first anchor's, so the
    selector must wait for the first before deciding."""
    from spark_cep_spark.operators.cep import (
        Pattern,
        select_non_overlapping,
        select_skip_to,
    )
    from spark_cep_spark.streaming.nfa import compile_stream
    from spark_cep_spark.streaming import harness

    t0 = T0
    m = lambda k: t0 + dt.timedelta(minutes=k)
    data = [
        # u1: anchor A at 0 completes at 50; anchor B at 10 completes
        # at 20 (earlier!) but overlaps A's window — skip-past keeps A
        # only; emit-all keeps both
        (0, m(0), 1, "view", 1.0, "{}"),
        (1, m(10), 1, "view", 1.0, "{}"),
        (2, m(15), 1, "click", 1.0, "{}"),
        (3, m(20), 1, "purchase", 1.0, "{}"),
        (4, m(45), 1, "click", 1.0, "{}"),
        (5, m(50), 1, "purchase", 1.0, "{}"),
        # u2: two disjoint funnels -> both kept
        (6, m(0), 2, "view", 1.0, "{}"),
        (7, m(5), 2, "click", 1.0, "{}"),
        (8, m(10), 2, "purchase", 1.0, "{}"),
        (9, m(200), 2, "view", 1.0, "{}"),
        (10, m(205), 2, "click", 1.0, "{}"),
        (11, m(210), 2, "purchase", 1.0, "{}"),
    ]
    tails = [
        (100, m(5000), 9, "view", 1.0, "{}"),
        (101, m(10000), 9, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(data + tails, SCHEMA)
    d = str(tmp_path / "files")
    half = len(data) // 2
    chunks = [data[:half], data[half:], tails[:1], tails[1:]]
    for i, ch in enumerate(chunks):
        spark.createDataFrame(ch, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"f{i}"))
        time.sleep(1.05)
    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by("purchase", "event_type = 'purchase'")
        .within("1 HOUR")
    )
    batch = pat.compile_batch(df)
    for policy, selector in [
        ("skip_past_last_row",
         lambda mdf: select_non_overlapping(mdf, "t_view", "t_purchase")),
        (("skip_to_last", "click"),
         lambda mdf: select_skip_to(mdf, "t_view", "t_click")),
    ]:
        sdf = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(d, "f*"))
        )
        got = harness.run_available_now(
            compile_stream(
                pat, sdf, watermark="0 seconds", skip_policy=policy
            ),
            "append",
        ).filter("key <> 9")
        want = selector(batch).filter("key <> 9")
        g = sorted(tuple(r) for r in got.collect())
        w = sorted(tuple(r) for r in want.select(*got.columns).collect())
        assert g == w, policy
        assert len(g) == (3 if policy == "skip_past_last_row" else 3)


def test_stream_after_match_dialect_equals_batch(spark):
    """The AFTER MATCH clause through match_recognize on a stream
    (routes to compile_stream's skip_policy) equals the batch text
    query."""
    sql = """
PATTERN ( A -> B -> C )
WITHIN 1 HOUR
DEFINE A AS event_type = 'view',
       B AS event_type = 'click',
       C AS event_type = 'purchase'
AFTER MATCH SKIP PAST LAST ROW
"""
    rows = [
        (1, 0, "view", 1.0), (1, 10, "view", 1.0), (1, 15, "click", 1.0),
        (1, 20, "purchase", 1.0), (1, 45, "click", 1.0),
        (1, 50, "purchase", 1.0),
        (2, 0, "view", 1.0), (2, 5, "click", 1.0), (2, 10, "purchase", 1.0),
    ]
    g, w = _stream_vs_batch(spark, rows, sql, "view")
    assert g == w and len(g) == 2  # u1 keeps only the first anchor


def test_stream_permute3_equals_batch(spark):
    """Three-element PERMUTE = 6 parallel ordering NFAs in one keyed
    state; earliest-completion winner matches batch."""
    sql = """
PATTERN ( S -> PERMUTE(A, B, C) )
WITHIN 2 HOURS
DEFINE S AS event_type = 'signup',
       A AS event_type = 'view',
       B AS event_type = 'click',
       C AS event_type = 'purchase'
"""
    rows = [
        (1, 0, "signup", 1.0), (1, 5, "view", 1.0), (1, 10, "click", 1.0),
        (1, 15, "purchase", 1.0),
        (2, 0, "signup", 1.0), (2, 5, "purchase", 1.0), (2, 10, "view", 1.0),
        (2, 15, "click", 1.0),
        (3, 0, "signup", 1.0), (3, 5, "click", 1.0), (3, 10, "view", 1.0),
        (4, 0, "signup", 1.0), (4, 5, "view", 1.0),
    ]
    g, w = _stream_vs_batch(spark, rows, sql, "signup")
    assert g == w and len(g) == 2
    orders = {r[0]: r[-1] for r in g}
    assert orders[1] == "A->B->C" and orders[2] == "C->A->B"


def test_rows_per_match_composes_on_streams(spark, tmp_path):
    """ALL ROWS PER MATCH is a pure projection+union, so it composes
    on the STREAMING match output unchanged (no extra stateful op)."""
    from spark_cep_spark.operators.cep import Pattern, rows_per_match
    from spark_cep_spark.streaming.nfa import compile_stream
    from spark_cep_spark.streaming import harness

    data = [
        (0, T0, 1, "view", 1.0, "{}"),
        (1, T0 + dt.timedelta(minutes=5), 1, "click", 1.0, "{}"),
        (2, T0 + dt.timedelta(minutes=10), 1, "purchase", 1.0, "{}"),
        (3, T0 + dt.timedelta(minutes=500), 9, "view", 1.0, "{}"),
    ]
    d = str(tmp_path / "f")
    spark.createDataFrame(data, SCHEMA).orderBy("ts").coalesce(
        1
    ).write.parquet(d)
    sdf = spark.readStream.schema(
        spark.read.parquet(d).schema
    ).parquet(d)
    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by("purchase", "event_type = 'purchase'")
        .within("1 HOUR")
    )
    stream_rows = rows_per_match(
        compile_stream(pat, sdf, watermark="0 seconds", emit_ids=True),
        ["view", "click", "purchase"],
    )
    assert stream_rows.isStreaming
    got = sorted(
        (r["seq_no"], r["step"], r["event_id"])
        for r in harness.run_available_now(stream_rows, "append").collect()
    )
    assert got == [(1, "view", 0), (2, "click", 1), (3, "purchase", 2)]


# ------------------------------------------------------------------
# round 6: alternation (A | B) through the variant machinery
# ------------------------------------------------------------------

ALT_SQL = """
PATTERN ( A -> (B | C) -> D )
WITHIN 2 HOURS
DEFINE A AS event_type = 'signup',
       B AS event_type = 'error',
       C AS event_type = 'click',
       D AS event_type = 'purchase'
"""


def test_alternation_stream_equals_batch(spark):
    rows = [
        # user 1: only the C branch completes
        (1, 0, "signup", 1.0), (1, 5, "click", 1.0),
        (1, 10, "purchase", 1.0),
        # user 2: BOTH branches complete -> B (declared first) wins
        (2, 0, "signup", 1.0), (2, 3, "error", 1.0), (2, 5, "click", 1.0),
        (2, 10, "purchase", 1.0),
        # user 3: no middle step -> no match
        (3, 0, "signup", 1.0), (3, 10, "purchase", 1.0),
    ]
    g, w = _stream_vs_batch(spark, rows, ALT_SQL, "purchase")
    assert g == w and len(g) == 2
    got_variants = sorted(x[-1] for x in g)
    assert got_variants == ["A->B->D", "A->C->D"]


def test_alternation_composes_with_optional(spark):
    """(B | C) and a later D? in ONE pattern: 4 variants through the
    shared cross-product, greedy preference (branch order outranks
    the optional, declaration-first)."""
    sql = """
    PATTERN ( A -> (B | C) -> E? -> D )
    WITHIN 2 HOURS
    DEFINE A AS event_type = 'signup',
           B AS event_type = 'error',
           C AS event_type = 'click',
           E AS event_type = 'view',
           D AS event_type = 'purchase'
    """
    from spark_cep_spark.operators.cep_sql import expand_quantifier_sql

    assert [d for d, _ in expand_quantifier_sql(sql)] == [
        "A->B->E->D", "A->B->D", "A->C->E->D", "A->C->D",
    ]
    rows = [
        (1, 0, "signup", 1.0), (1, 2, "click", 1.0), (1, 4, "view", 1.0),
        (1, 9, "purchase", 1.0),
    ]
    g, w = _stream_vs_batch(spark, rows, sql, "purchase")
    assert g == w and len(g) == 1
    assert g[0][-1] == "A->C->E->D"


@pytest.mark.parametrize(
    "pattern, msg",
    [
        ("( (A | B) -> D )", "first step cannot be an alternation"),
        ("( A -> (B | C) -> (B | C) )", "only one alternation"),
        ("( A -> (B | C?) -> D )", "plain step names"),
        ("( A -> (B | B) -> D )", "duplicate step name"),
    ],
)
def test_malformed_alternation_rejected(pattern, msg):
    from spark_cep_spark.operators.cep_sql import expand_quantifier_sql

    with pytest.raises(ValueError, match=msg):
        expand_quantifier_sql(
            f"PATTERN {pattern} WITHIN 1 HOUR "
            "DEFINE A AS true, B AS true, C AS true, D AS true"
        )


def test_rows_per_match_running_composes_on_streams(spark, tmp_path):
    """RUNNING/FINAL measures in ALL ROWS mode are prefix arithmetic
    inside the unpivot array — still a pure projection, so they too
    compose on the streaming match output (a cumulative-window
    formulation would be rejected on a stream)."""
    from spark_cep_spark.operators.cep import (
        Pattern,
        rows_per_match_running,
    )
    from spark_cep_spark.streaming.nfa import compile_stream
    from spark_cep_spark.streaming import harness

    data = [
        (0, T0, 1, "view", 2.0, "{}"),
        (1, T0 + dt.timedelta(minutes=5), 1, "click", None, "{}"),
        (2, T0 + dt.timedelta(minutes=10), 1, "purchase", 3.5, "{}"),
        (3, T0 + dt.timedelta(minutes=500), 9, "view", 1.0, "{}"),
    ]
    d = str(tmp_path / "f")
    spark.createDataFrame(data, SCHEMA).orderBy("ts").coalesce(
        1
    ).write.parquet(d)
    sdf = spark.readStream.schema(
        spark.read.parquet(d).schema
    ).parquet(d)
    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by("purchase", "event_type = 'purchase'")
        .within("1 HOUR")
    )
    for s in ("view", "click", "purchase"):
        pat.measure(f"v_{s}", f"{s}.value")
    stream_rows = rows_per_match_running(
        compile_stream(pat, sdf, watermark="0 seconds", emit_ids=True),
        ["view", "click", "purchase"],
    )
    assert stream_rows.isStreaming
    got = sorted(
        (r["seq_no"], r["step"], r["rv"], r["run_sum"], r["fin_sum"])
        for r in harness.run_available_now(stream_rows, "append").collect()
    )
    # NULL click value: rv is NULL, the running sum skips it (SQL SUM)
    assert got == [
        (1, "view", 200, 200, 550),
        (2, "click", None, 200, 550),
        (3, "purchase", 350, 550, 550),
    ]


# ---------------------------------------------------------------------------
# Round-6d: SKIP TO FIRST / kleene-target skips / explicit NEXT ROW


def test_stream_skip_to_first_kleene_equals_batch(spark, tmp_path):
    """compile_stream(skip_policy=('skip_to_first', kleene_step)) over
    multiple micro-batches equals the batch selector resuming at
    t_<step>_first — including a signup BETWEEN a kept anchor and its
    run entry, which FIRST must drop."""
    from spark_cep_spark.operators.cep import Pattern, select_skip_to
    from spark_cep_spark.streaming.nfa import compile_stream
    from spark_cep_spark.streaming import harness

    m = lambda k: T0 + dt.timedelta(minutes=k)
    data = [
        # u1: signup@0, signup@5 (before the run entry at 10 -> FIRST
        # drops it), errors 10..12 (the run), signup@20 (>= entry ->
        # kept), errors 30..31
        (0, m(0), 1, "signup", 1.0, "{}"),
        (1, m(5), 1, "signup", 1.0, "{}"),
        (2, m(10), 1, "error", 1.0, "{}"),
        (3, m(11), 1, "error", 1.0, "{}"),
        (4, m(12), 1, "error", 1.0, "{}"),
        (5, m(20), 1, "signup", 1.0, "{}"),
        (6, m(30), 1, "error", 1.0, "{}"),
        (7, m(31), 1, "error", 1.0, "{}"),
    ]
    tails = [
        (100, m(5000), 9, "signup", 1.0, "{}"),
        (101, m(10000), 9, "signup", 1.0, "{}"),
    ]
    df = spark.createDataFrame(data + tails, SCHEMA)
    d = str(tmp_path / "files")
    half = len(data) // 2
    for i, ch in enumerate([data[:half], data[half:], tails[:1], tails[1:]]):
        spark.createDataFrame(ch, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(d, f"f{i}"))
        time.sleep(1.05)
    pat = (
        Pattern.begin("s", "event_type = 'signup'")
        .one_or_more("err", "event_type = 'error'")
        .within("1 HOUR")
    )
    sdf = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "f*"))
    )
    got = harness.run_available_now(
        compile_stream(
            pat, sdf, watermark="0 seconds",
            skip_policy=("skip_to_first", "err"),
        ),
        "append",
    ).filter("key <> 9")
    want = select_skip_to(
        pat.compile_batch(df), "t_s", "t_err_first"
    ).filter("key <> 9")
    g = sorted(tuple(r) for r in got.collect())
    w = sorted(tuple(r) for r in want.select(*got.columns).collect())
    assert g == w
    # anchors kept: signup@0 (first), signup@20 (>= entry 10);
    # signup@5 dropped (< entry 10 of the kept match)
    assert [r[1] for r in g] == [0, 5]


def test_stream_dialect_skip_last_kleene_equals_batch(spark):
    """AFTER MATCH SKIP TO LAST <kleene step> through match_recognize
    on a stream equals the batch text query, on the overlapping
    anchor/run predicate shape where LAST is distinctive."""
    sql = """
PATTERN ( v -> c+ )
WITHIN 1 HOUR
DEFINE v AS event_type = 'click' AND value > 50,
       c AS event_type = 'click'
AFTER MATCH SKIP TO LAST c
"""
    rows = [
        # u1: high-value click@0 anchors run {5,6,7}; the high-value
        # click@6 INSIDE the run is < resume (7) -> dropped under
        # LAST; click@7's own anchor candidacy: 7 >= 7 -> kept
        (1, 0, "click", 60.0),
        (1, 5, "click", 10.0),
        (1, 6, "click", 70.0),
        (1, 7, "click", 80.0),
        (1, 20, "click", 10.0),
        (1, 21, "click", 10.0),
        (2, 0, "click", 90.0),
        (2, 3, "click", 1.0),
    ]
    g, w = _stream_vs_batch(spark, rows, sql, "v")
    assert g == w and len(g) >= 2


def test_skip_to_next_row_is_the_default(spark):
    """The explicit SKIP TO NEXT ROW spelling parses and equals the
    same query with no AFTER MATCH clause (emit every match)."""
    rows = [
        (i, T0 + dt.timedelta(minutes=mm), u, t, 1.0, "{}")
        for i, (u, mm, t) in enumerate(
            [
                (1, 0, "view"), (1, 2, "view"), (1, 5, "click"),
                (1, 8, "purchase"), (2, 0, "view"), (2, 1, "click"),
                (2, 2, "purchase"),
            ]
        )
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    base = """
PATTERN ( a -> b -> c )
WITHIN 1 HOUR
DEFINE a AS event_type = 'view',
       b AS event_type = 'click',
       c AS event_type = 'purchase'
"""
    got = match_recognize(df, base + "AFTER MATCH SKIP TO NEXT ROW")
    want = match_recognize(df, base)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.select(*got.columns).collect())
    )
    assert got.count() == 3  # both u1 views match; u2's one view


def test_skip_to_first_rejects_anchor_target(spark):
    rows = [(0, T0, 1, "view", 1.0, "{}")]
    df = spark.createDataFrame(rows, SCHEMA)
    sql = """
PATTERN ( a -> b )
WITHIN 1 HOUR
DEFINE a AS event_type = 'view', b AS event_type = 'click'
AFTER MATCH SKIP TO FIRST a
"""
    with pytest.raises(ValueError, match="anchor"):
        match_recognize(df, sql)


def test_skip_first_equals_last_on_plain_step(spark):
    """On a single-binding step the two spellings coincide — pinned
    so a future kernel change cannot silently split them."""
    rows = [
        (i, T0 + dt.timedelta(minutes=mm), u, t, 1.0, "{}")
        for i, (u, mm, t) in enumerate(
            [
                (1, 0, "view"), (1, 5, "click"), (1, 6, "view"),
                (1, 9, "click"), (1, 30, "view"), (1, 35, "click"),
            ]
        )
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    base = """
PATTERN ( a -> b )
WITHIN 1 HOUR
DEFINE a AS event_type = 'view', b AS event_type = 'click'
"""
    first = match_recognize(df, base + "AFTER MATCH SKIP TO FIRST b")
    last = match_recognize(df, base + "AFTER MATCH SKIP TO LAST b")
    assert sorted(map(tuple, first.collect())) == sorted(
        map(tuple, last.select(*first.columns).collect())
    )


def test_stream_exclusion_equals_batch(spark):
    """{- step -} exclusion through match_recognize on a stream equals
    the batch text query — the post-explode filter composes on the
    stateful operator's output."""
    sql = """
PATTERN ( v -> {- c -} -> p )
WITHIN 1 HOUR
DEFINE v AS event_type = 'view',
       c AS event_type = 'click',
       p AS event_type = 'purchase'
ALL ROWS PER MATCH
"""
    rows = [
        (1, 0, "view", 1.0), (1, 5, "click", 1.0), (1, 10, "purchase", 1.0),
        (2, 0, "view", 1.0), (2, 3, "click", 1.0), (2, 7, "purchase", 1.0),
        (2, 30, "view", 1.0),  # no click/purchase after -> no match
    ]
    g, w = _stream_vs_batch(spark, rows, sql, "v")
    assert g == w
    # two matches, each emitting only the v and p rows (seq_no 1, 3)
    assert len(g) == 4
    assert {r[3] for r in g} == {"v", "p"}
    assert {r[2] for r in g} == {1, 3}


def test_exclusion_requires_all_rows_mode(spark):
    from spark_cep_spark.operators.cep_sql import parse_pattern_sql

    base = """
PATTERN ( v -> {- c -} )
WITHIN 1 HOUR
DEFINE v AS event_type = 'view', c AS event_type = 'click'
"""
    with pytest.raises(ValueError, match="requires ALL ROWS"):
        parse_pattern_sql(base)
    # an excluded name that is not a defined step fails at step lookup
    # (the marker leaves a plain token behind)
    with pytest.raises(ValueError, match="no DEFINE entry"):
        parse_pattern_sql(
            """
PATTERN ( v -> {- z -} -> c )
WITHIN 1 HOUR
DEFINE v AS event_type = 'view', c AS event_type = 'click'
ALL ROWS PER MATCH
"""
        )
    with pytest.raises(ValueError, match="every step"):
        parse_pattern_sql(
            """
PATTERN ( {- v -} -> {- c -} )
WITHIN 1 HOUR
DEFINE v AS event_type = 'view', c AS event_type = 'click'
ALL ROWS PER MATCH
"""
        )
    with pytest.raises(ValueError, match="negated"):
        parse_pattern_sql(
            """
PATTERN ( v -> c -> {- !x -} )
WITHIN 1 HOUR
DEFINE v AS event_type = 'view', c AS event_type = 'click',
       x AS event_type = 'error'
ALL ROWS PER MATCH
"""
        )
    with pytest.raises(ValueError, match="malformed .. step .. exclusion"):
        parse_pattern_sql(
            """
PATTERN ( v -> {- -} -> c )
WITHIN 1 HOUR
DEFINE v AS event_type = 'view', c AS event_type = 'click'
ALL ROWS PER MATCH
"""
        )


# ---------------------------------------------------------------------------
# Round-6e: ^ / $ partition anchors (batch-only)


ANCHOR_SQL = """
PATTERN ( ^ v -> p )
WITHIN 1 HOUR
DEFINE v AS event_type = 'view',
       p AS event_type = 'purchase'
"""


def test_anchor_start_only_first_row_anchors(spark):
    rows = [
        # u1: first event IS a view -> anchors; second view must not
        (0, T0, 1, "view", 1.0, "{}"),
        (1, T0 + dt.timedelta(minutes=5), 1, "view", 1.0, "{}"),
        (2, T0 + dt.timedelta(minutes=10), 1, "purchase", 1.0, "{}"),
        # u2: first event is a click -> no match even though a view
        # follows before the purchase
        (3, T0, 2, "click", 1.0, "{}"),
        (4, T0 + dt.timedelta(minutes=1), 2, "view", 1.0, "{}"),
        (5, T0 + dt.timedelta(minutes=2), 2, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = match_recognize(df, ANCHOR_SQL).collect()
    assert [(r["key"], r["anchor_id"]) for r in out] == [(1, 0)]


def test_anchor_end_requires_final_row_binding(spark):
    sql = """
PATTERN ( p -> x $ )
WITHIN 1 HOUR
DEFINE p AS event_type = 'purchase',
       x AS event_type = 'error'
"""
    rows = [
        # u1: purchase -> error is the LAST event -> match
        (0, T0, 1, "purchase", 1.0, "{}"),
        (1, T0 + dt.timedelta(minutes=5), 1, "error", 1.0, "{}"),
        # u2: purchase -> error, but a later view exists -> no match
        (2, T0, 2, "purchase", 1.0, "{}"),
        (3, T0 + dt.timedelta(minutes=5), 2, "error", 1.0, "{}"),
        (4, T0 + dt.timedelta(minutes=9), 2, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = match_recognize(df, sql).collect()
    assert [(r["key"], r["anchor_id"]) for r in out] == [(1, 0)]


def test_anchors_rejected_on_stream_and_with_expansion(spark, tmp_path):
    df = spark.createDataFrame([(0, T0, 1, "view", 1.0, "{}")], SCHEMA)
    d = str(tmp_path / "s")
    df.write.parquet(d)
    sdf = spark.readStream.schema(df.schema).parquet(d)
    with pytest.raises(ValueError, match="partition anchors"):
        match_recognize(sdf, ANCHOR_SQL, watermark="0 seconds")
    with pytest.raises(ValueError, match="not supported with"):
        match_recognize(
            df,
            """
PATTERN ( ^ v -> c? -> p )
WITHIN 1 HOUR
DEFINE v AS event_type = 'view', c AS event_type = 'click',
       p AS event_type = 'purchase'
""",
        )
    with pytest.raises(ValueError, match="very start / end"):
        match_recognize(
            df,
            """
PATTERN ( v -> ^ p )
WITHIN 1 HOUR
DEFINE v AS event_type = 'view', p AS event_type = 'purchase'
""",
        )


def test_anchor_end_composes_with_skip_policy(spark):
    """$ filters matches BEFORE the skip selector: with SKIP PAST LAST
    ROW, the kept match must be the $-valid one even when an earlier
    (non-$) match would have been kept by the greedy scan."""
    sql = """
PATTERN ( p -> x $ )
WITHIN 1 HOUR
DEFINE p AS event_type = 'purchase',
       x AS event_type = 'error'
AFTER MATCH SKIP PAST LAST ROW
"""
    rows = [
        # u1: p@0 -> x@5 (not final), p@10 -> x@20 (final row).
        # Without $, greedy skip-past keeps (0,5) and drops (10,20)
        # [overlap-free, so actually both; the point: (0,5) is NOT
        # $-valid and must not appear at all].
        (0, T0, 1, "purchase", 1.0, "{}"),
        (1, T0 + dt.timedelta(minutes=5), 1, "error", 1.0, "{}"),
        (2, T0 + dt.timedelta(minutes=10), 1, "purchase", 1.0, "{}"),
        (3, T0 + dt.timedelta(minutes=20), 1, "error", 1.0, "{}"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = match_recognize(df, sql).collect()
    assert [(r["key"], r["anchor_id"]) for r in out] == [(1, 2)]
