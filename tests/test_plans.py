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


def test_bucketed_join_elides_shuffle(spark, sf_dir, tmp_path):
    """The co-located-join contract: both sides bucketed on the join
    key → sort-merge join with NO shuffle exchange in the plan (the
    repeated-big-join layout for 100 TB). Broadcast is disabled so the
    assertion can't be satisfied the easy way."""
    from spark_cep_spark.io import table
    from spark_cep_spark.plans.scale import write_bucketed

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(o, "t_orders_b", ["o_orderkey"], 8, str(tmp_path / "o"))
    write_bucketed(li, "t_lineitem_b", ["l_orderkey"], 8, str(tmp_path / "l"))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob, lb = spark.table("t_orders_b"), spark.table("t_lineitem_b")
        j = ob.join(lb, ob.o_orderkey == lb.l_orderkey)
        p = plan_of(j)
        assert "SortMergeJoin" in p
        assert "Exchange hashpartitioning" not in p
        # and the layout is semantically invisible:
        assert j.count() == o.join(li, o.o_orderkey == li.l_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_salting_helpers(spark):
    df = spark.range(100).withColumnRenamed("id", "k")
    salted = salt_skewed(df, "k", n_salts=4)
    assert "_salt" in salted.columns
    dim = spark.range(3).withColumnRenamed("id", "k")
    exploded = explode_salts(dim, n_salts=4)
    assert exploded.count() == 12
    j = salted.join(exploded, ["k", "_salt"])
    assert j.count() == 3  # keys 0,1,2 match across all salts exactly once


def test_lsh_dedup_has_no_cartesian_stage(spark):
    """The whole point of banding: candidate generation is an
    equi-join on (band_id, band_key), never an all-pairs product."""
    p = plan_of(_q(spark, "dedup_minhash_lsh"))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_surprisal_broadcasts_vocab(spark):
    """The vocabulary-frequency join must be broadcast (map-side), not
    a corpus shuffle."""
    p = plan_of(_q(spark, "text_surprisal"))
    assert "BroadcastHashJoin" in p


def test_end_to_end_pipeline_single_corpus_scan_shape(spark):
    """The flagship composition: decontamination gram set is broadcast,
    dedup is ONE window over (sig, elig) — no cartesian anywhere."""
    p = plan_of(_q(spark, "pipeline_end_to_end"))
    assert "CartesianProduct" not in p
    assert "BroadcastHashJoin" in p  # eval-gram semi-join + rate table
    assert p.count("Window") >= 1  # the (sig, elig) keep-first window


def test_quality_filter_is_pure_projection(spark):
    """No shuffle exchange at all — scan-speed at any size."""
    p = plan_of(_q(spark, "pipeline_quality_filter"))
    assert "Exchange" not in p


def test_static_partition_pruning(spark, tmp_path):
    """A filter on the partition column prunes partitions at the scan:
    the file index only lists the matching directory. Fixtures aren't
    partitioned, so this pins the posture on a partitioned copy — the
    layout a 100 TB events table would actually use."""
    from spark_cep_spark.io import table

    out = str(tmp_path / "events_by_type")
    table(spark, "/root/testdata/sf0.001", "events").write.partitionBy(
        "event_type"
    ).parquet(out)
    df = spark.read.parquet(out).filter("event_type = 'error'").select(
        "event_id"
    )
    p = plan_of(df)
    assert "PartitionFilters: [isnotnull(event_type" in p
    # the pruned scan must not enumerate other types' files
    n = df.count()
    full = spark.read.parquet(out).count()
    assert 0 < n < full


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """DPP: a selective filter on the dim side prunes the partitioned
    fact side at RUNTIME (subquery-duplicated or broadcast-reused) —
    the join pattern that makes star-schema scans affordable at scale."""
    from spark_cep_spark.io import table

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "orders_by_status")
    table(spark, sf, "orders").write.partitionBy("o_orderstatus").parquet(out)
    fact = spark.read.parquet(out)
    # the dim filter must NOT be statically inferable onto the join
    # column (a literal `status = 'F'` gets constraint-propagated into
    # a STATIC partition filter — also correct, but that's the other
    # test); an aggregate-derived filter forces the runtime subquery
    dim = (
        table(spark, sf, "orders")
        .groupBy("o_orderstatus")
        .count()
        .filter("count < 500")  # fixture statuses: F=493 P=493 O=514
        .select("o_orderstatus")
    )
    joined = fact.join(dim, "o_orderstatus").select("o_orderkey")
    p = plan_of(joined)
    assert "dynamicpruning" in p.lower()
    assert joined.count() > 0


def test_hive_partitioned_scan_prunes_partitions(spark):
    p = plan_of(_q(spark, "scan_hive_partitioned"))
    assert "PartitionFilters: [" in p
    assert "lang IN (en,de)" in p or "lang#" in p.split("PartitionFilters")[1][:200]


def test_rolling_median_single_window_pass(spark):
    # one shuffle on user_id serves the frame collect; no extra
    # exchange between the median and MAD projections
    p = plan_of(_q(spark, "win_rolling_median"))
    assert p.count("Exchange") <= 2  # input read + the window hashpartition
    assert "Window" in p
