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
