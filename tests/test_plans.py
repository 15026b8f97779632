"""Plan-shape assertions (the 100 TB posture, SURVEY §4): pushdown,
broadcast, window group limits, take-ordered — verified from
explain('formatted') so regressions in plan quality fail loudly.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

import spark_cep_spark
from spark_cep_spark.plans.scale import explode_salts, salt_skewed


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module", autouse=True)
def _load():
    spark_cep_spark.load_all()


def _q(spark, key, sf="/root/testdata/sf0.001"):
    return spark_cep_spark.QUERIES[key](spark, sf)


def test_filter_pushdown_reaches_parquet(spark):
    p = plan_of(_q(spark, "project_filter"))
    assert "PushedFilters: [" in p
    assert "IsNotNull(l_quantity)" in p or "GreaterThanOrEqual(l_quantity" in p


def test_column_pruning(spark):
    p = plan_of(_q(spark, "scan_parquet"))
    # full projection here, but limit_topk must prune to 2 columns
    p2 = plan_of(_q(spark, "limit_topk"))
    assert "o_orderkey" in p2 and "o_orderpriority" not in p2


def test_broadcast_join_in_dim_join(spark):
    p = plan_of(_q(spark, "join_broadcast"))
    assert "BroadcastHashJoin" in p


def test_topk_uses_take_ordered(spark):
    p = plan_of(_q(spark, "limit_topk"))
    assert "TakeOrderedAndProject" in p


def test_window_topk_group_limit(spark):
    p = plan_of(_q(spark, "win_topk_per_group"))
    # Spark 3.5+/4.x pushes rn<=k into WindowGroupLimit
    assert "WindowGroupLimit" in p


def test_q1_partial_aggregation(spark):
    p = plan_of(_q(spark, "agg_group"))
    # partial (map-side) + final hash aggregate
    assert p.count("HashAggregate") >= 2


def test_salting_helpers(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    salted = salt_skewed(df, "k", n_salts=4)
    assert "_salt" in salted.columns
    dim = spark.range(3).withColumnRenamed("id", "k")
    exploded = explode_salts(dim, n_salts=4)
    assert exploded.count() == 12
    j = salted.join(exploded, ["k", "_salt"])
    assert j.count() == 3  # keys 0,1,2 match across all salts exactly once
