"""Semantic tests for operators/graph.py on hand-built graphs where
the right answer is known by inspection (the fixture-derived oracle
checks are in tools/check_oracle.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _tri_counts(spark, edges):
    """Run the triangle kernel on an explicit edge list by monkey-free
    composition: rebuild the same plan graph_triangles builds, but from
    a literal edge DataFrame."""
    import spark_cep_spark.operators.graph as G

    df = spark.createDataFrame(edges, "u long, v long")
    orig = G.cooccurrence_edges
    G.cooccurrence_edges = lambda s, d: df
    try:
        out = G.graph_triangles(spark, "unused")
        return {r["node"]: r["n_tri"] for r in out.collect()}
    finally:
        G.cooccurrence_edges = orig


def test_triangle_counts_on_known_graph(spark):
    # K4 on {1,2,3,4} (4 triangles, every node in 3) plus a pendant
    # node 5 (never in a triangle)
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    counts = _tri_counts(spark, k4)
    assert counts == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_triangle_with_tail(spark):
    counts = _tri_counts(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    assert counts == {1: 1, 2: 1, 3: 1}


def test_triangle_free_graph_has_no_rows(spark):
    # a path and a star are triangle-free
    counts = _tri_counts(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12)])
    assert counts == {}


def test_pagerank_fixed_point_star_center_dominates(spark):
    import spark_cep_spark.operators.graph as G

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "u long, v long"
    )
    orig = G.cooccurrence_edges
    G.cooccurrence_edges = lambda s, d: star
    try:
        pr = {r["node"]: r["pr_fixed"] for r in G.graph_pagerank(spark, "x").collect()}
    finally:
        G.cooccurrence_edges = orig
    # center of the star outranks every leaf; leaves are symmetric
    leaves = {pr[i] for i in range(1, 6)}
    assert len(leaves) == 1
    assert pr[0] > pr[1]
    # total mass stays ~1.0 (integer truncation loses < 1e-6 per node)
    total = sum(pr.values())
    assert abs(total - 10**12) < 100 * len(pr)


def test_transitions_count_ordered_pairs(spark):
    import spark_cep_spark.operators.graph as G
    from spark_cep_spark.io import _INPUT_CACHE

    import datetime as dt

    rows = [
        # user 1: a -> b -> b
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "a", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 0, 1, 0), 1, "b", 1.0, "{}"),
        (3, dt.datetime(2024, 1, 1, 0, 2, 0), 1, "b", 1.0, "{}"),
        # user 2: b -> a
        (4, dt.datetime(2024, 1, 1, 0, 0, 0), 2, "b", 1.0, "{}"),
        (5, dt.datetime(2024, 1, 1, 0, 3, 0), 2, "a", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    orig = G.table
    G.table = lambda s, d, n: df
    try:
        out = {
            (r["prev_type"], r["next_type"]): r["n"]
            for r in G.graph_transitions(spark, "x").collect()
        }
    finally:
        G.table = orig
    assert out == {("a", "b"): 1, ("b", "b"): 1, ("b", "a"): 1}


def test_streaming_transitions_equal_batch(spark):
    """Per-key last-event state over multiple micro-batches emits the
    same transition multiset as the batch graph_transitions."""
    import spark_cep_spark.operators.graph as G
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.streaming.nfa import transition_stream

    import datetime as dt
    import glob
    import os

    sf_dir = "/root/testdata/sf0.001"
    staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=6)
    # far-future sentinel (lone event for a user outside the fixture:
    # emits no transition itself) flushes the watermark past the real
    # tail — without it the last-millisecond event never matures and
    # one transition is legitimately still buffered at stream end
    sentinel = spark.createDataFrame(
        [(10**9, dt.datetime(2025, 1, 1), -1, "view", 0.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    sentinel.coalesce(1).write.mode("append").parquet(staged)
    newest = max(glob.glob(os.path.join(staged, "part-*")), key=os.path.getmtime)
    os.utime(newest, (1_700_000_000 + 10_000 * 3600,) * 2)
    stream = harness.events_stream(spark, staged, max_files_per_trigger=2)
    got = harness.run_available_now(
        transition_stream(stream, watermark="0 seconds"), "append"
    )
    g = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in got.groupBy("prev_type", "next_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    w = {
        (r["prev_type"], r["next_type"]): r["n"]
        for r in G.graph_transitions(spark, sf_dir).collect()
    }
    assert g == w


def test_transition_kernel_chunking_invariance():
    from spark_cep_spark.streaming.nfa import advance_transitions

    evs = [[i * 10, i, t] for i, t in enumerate("abcabbca")]
    _, whole = advance_transitions(None, evs)
    for cut in range(len(evs) + 1):
        st, out1 = advance_transitions(None, evs[:cut])
        st, out2 = advance_transitions(st, evs[cut:])
        assert out1 + out2 == whole


def test_transition_kernel_matches_pairwise_reference():
    """Independent referee for advance_transitions: the expected edge
    list is built from zip(sorted, sorted[1:]) wholesale — not the
    kernel's fold — so a shared state-threading bug cannot hide."""
    from spark_cep_spark.streaming.nfa import advance_transitions

    import random

    rng = random.Random(7)
    for _ in range(50):
        n = rng.randint(0, 20)
        evs = sorted(
            [[rng.randint(0, 100) * 1000, i, rng.choice("abc")] for i in range(n)]
        )
        want = [
            [b[0], b[1], a[2], b[2]] for a, b in zip(evs, evs[1:])
        ]
        st, got = advance_transitions(None, evs)
        assert got == want
        assert (st is None) == (n == 0)
