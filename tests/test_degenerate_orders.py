"""Degenerate-orders sweep: the orders-table twin of the lineitem /
events / corpus sweeps. Orders feed the join family, the SQL surface,
windows, and the TPC-H pack; real order feeds contain NULL keys, NULL
prices, NULL dates, and duplicate order ids — none of which the
fixture generator produces. Every enrolled key must run (not
necessarily return rows) over an EMPTY orders table and a NULL-ridden
one.
"""

from __future__ import annotations

import os
import shutil

import pytest

ORDERS_KEYS = [
    # relational / aggregate readers
    "case_when",
    "limit_topk",
    "sample",
    "agg_distinct",
    "agg_cube",
    "sort_multi",
    # window readers
    "win_rank",
    "win_analytic",
    "win_frame_rows",
    "win_topk_per_group",
    "win_percentiles",
    "win_pareto_share",
    "win_share_of_total",
    # joins (orders side degenerate, other sides normal)
    "join_inner_equi",
    "join_left",
    "join_full",
    "join_semi",
    "join_anti",
    "join_bloom_pruned",
    "join_star_q18",
    # round-9: the Deequ suite (orders-side uniqueness/FK checks)
    "profile_expectations",
    # SQL surface
    "sql_cte",
    "sql_subqueries",
    "sql_subquery_correlated",
    "sql_qualify",
    "sql_pivot",
    "sql_exists_flag",
    # TPC-H orders readers
    "tpch_q4",
    "tpch_q13",
    "tpch_q22",
    # merge family builds its base/updates from orders
    "merge_upsert",
    "merge_scd2",
    "merge_snapshot_diff",
    "merge_incremental_agg",
    "rollup_wow",
    "join_scd2_pit",
]


def _make_dir(spark, tmp_path_factory, rows, name):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp(name)
    for f in os.listdir(src):
        if f != "orders.parquet":
            os.symlink(os.path.join(src, f), dst / f)
    cols = spark.read.parquet(os.path.join(src, "orders.parquet")).schema
    df = spark.createDataFrame(rows, cols)
    out = str(dst / "_o")
    df.coalesce(1).write.parquet(out)
    part = next(p for p in os.listdir(out) if p.endswith(".parquet"))
    shutil.move(os.path.join(out, part), dst / "orders.parquet")
    shutil.rmtree(out)
    return str(dst)


@pytest.fixture(scope="module")
def empty_orders_dir(spark, tmp_path_factory):
    return _make_dir(spark, tmp_path_factory, [], "empty_orders")


@pytest.fixture(scope="module")
def nullkey_orders_dir(spark, tmp_path_factory):
    """8 real rows degraded: NULL custkey / orderkey / totalprice /
    orderdate / status, plus one duplicated orderkey."""
    src = "/root/testdata/sf0.001"
    base = spark.read.parquet(os.path.join(src, "orders.parquet")).limit(8)
    rows = base.collect()
    degen = []
    for i, r in enumerate(rows):
        d = r.asDict()
        if i % 3 == 0:
            d["o_custkey"] = None
        if i % 4 == 0:
            d["o_orderkey"] = None
        if i % 5 == 1:
            d["o_totalprice"] = None
        if i % 5 == 2:
            d["o_orderdate"] = None
        if i % 7 == 3:
            d["o_orderstatus"] = None
        degen.append(tuple(d.values()))
    if degen:
        degen.append(degen[-1])  # duplicate full row (dup orderkey)
    return _make_dir(spark, tmp_path_factory, degen, "null_orders")


@pytest.mark.parametrize("key", ORDERS_KEYS)
def test_operator_survives_empty_orders(spark, empty_orders_dir, key):
    import __spark_entry__ as entry

    n = entry.queries()[key](spark, empty_orders_dir).count()
    assert n >= 0


@pytest.mark.parametrize("key", ORDERS_KEYS)
def test_operator_survives_null_orders(spark, nullkey_orders_dir, key):
    import __spark_entry__ as entry

    n = entry.queries()[key](spark, nullkey_orders_dir).count()
    assert n >= 0
