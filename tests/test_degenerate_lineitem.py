"""Degenerate-lineitem sweep: the graph family (and other lineitem
readers) against an EMPTY lineitem table and one with NULL keys — the
same crash-class discipline as the corpus/events sweeps."""

from __future__ import annotations

import os
import shutil

import pytest

LINEITEM_KEYS = [
    "graph_degrees",
    "graph_triangles",
    "graph_pagerank",
    "graph_jaccard_neighbors",
    "agg_global",
    "agg_collect",
    "project_filter",
    "win_frame_rows",
    # round-6b: BFS + star joins over empty/degenerate lineitem
    "graph_khop_bfs",
    "graph_shortest_path",
    "join_star_q5",
    "join_star_q10",
    "join_star_q18",
    # round-6d: the TPC-H pack's lineitem readers
    "tpch_q2",
    "tpch_q4",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    # round-6f: bloom semi-join reduction (NULL l_orderkey must fall
    # out of the probe the same way it falls out of the join)
    "join_bloom_pruned",
    "graph_components",
    # round-7: LPA communities + the compaction maintenance job
    "graph_label_propagation",
    "layout_compaction",
]


def _make_dir(spark, tmp_path_factory, rows, name):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp(name)
    for f in os.listdir(src):
        if f != "lineitem.parquet":
            os.symlink(os.path.join(src, f), dst / f)
    cols = spark.read.parquet(os.path.join(src, "lineitem.parquet")).schema
    df = spark.createDataFrame(rows, cols)
    out = str(dst / "_o")
    df.coalesce(1).write.parquet(out)
    part = next(p for p in os.listdir(out) if p.endswith(".parquet"))
    shutil.move(os.path.join(out, part), dst / "lineitem.parquet")
    shutil.rmtree(out)
    return str(dst)


@pytest.fixture(scope="module")
def empty_lineitem_dir(spark, tmp_path_factory):
    return _make_dir(spark, tmp_path_factory, [], "empty_li")


@pytest.fixture(scope="module")
def nullkey_lineitem_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    base = spark.read.parquet(os.path.join(src, "lineitem.parquet")).limit(8)
    rows = base.collect()
    import copy

    degen = []
    for i, r in enumerate(rows):
        d = r.asDict()
        if i % 3 == 0:
            d["l_partkey"] = None
        if i % 4 == 0:
            d["l_orderkey"] = None
        degen.append(tuple(d.values()))
    spark_rows = degen
    return _make_dir(spark, tmp_path_factory, spark_rows, "null_li")


@pytest.mark.parametrize("key", LINEITEM_KEYS)
def test_operator_survives_empty_lineitem(spark, empty_lineitem_dir, key):
    import __spark_entry__ as entry

    n = entry.queries()[key](spark, empty_lineitem_dir).count()
    assert n >= 0


@pytest.mark.parametrize("key", LINEITEM_KEYS)
def test_operator_survives_null_keys(spark, nullkey_lineitem_dir, key):
    import __spark_entry__ as entry

    n = entry.queries()[key](spark, nullkey_lineitem_dir).count()
    assert n >= 0
