"""Round-6d TPC-H pack: semantic cross-checks against independent
brute-force recomputations (pandas / alternative Spark formulations)
plus plan-shape pins for the properties that matter at 100 TB —
pushdown/pruning on Q6, the semi-join shape of Q4's EXISTS, and the
TakeOrderedAndProject top-k on Q21. The value-level gate is
tools/check_oracle.py (all 15 keys exact-pass vs DuckDB)."""

from __future__ import annotations

import pandas as pd
import pytest

from conftest import SF_SMOKE


def _run(key, spark, sf_dir=SF_SMOKE):
    import __spark_entry__ as entry

    return entry.queries()[key](spark, sf_dir)


def _pdf(spark, sf_dir, name):
    return pd.read_parquet(f"{sf_dir}/{name}.parquet")


def test_q6_matches_pandas_brute_force(spark):
    li = _pdf(spark, SF_SMOKE, "lineitem")
    disc_pp = (li.l_discount * 100).round().astype("int64")
    mask = (
        (li.l_shipdate >= "1996-01-01")
        & (li.l_shipdate < "1997-01-01")
        & disc_pp.between(5, 7)
        & (li.l_quantity < 24)
    )
    expect_rev = int(
        ((li.l_extendedprice * 100).round().astype("int64") * disc_pp)[mask].sum()
    )
    row = _run("tpch_q6", spark).collect()[0]
    assert row["revenue_e4"] == expect_rev
    assert row["n_items"] == int(mask.sum())


def test_q4_semi_join_counts_orders_once(spark):
    """EXISTS must count each order once no matter how many late
    lines it has — cross-check against a distinct-orderkey join."""
    li = _pdf(spark, SF_SMOKE, "lineitem")
    o = _pdf(spark, SF_SMOKE, "orders")
    o = o[(o.o_orderdate >= "1996-07-01") & (o.o_orderdate < "1996-10-01")]
    j = li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    late_orders = j[j.l_shipdate > j.o_orderdate + pd.Timedelta(days=30)][
        "o_orderkey"
    ].unique()
    expect = (
        o[o.o_orderkey.isin(late_orders)]
        .groupby("o_orderpriority")
        .size()
        .to_dict()
    )
    got = {r["priority"]: r["n_orders"] for r in _run("tpch_q4", spark).collect()}
    assert got == expect


def test_q13_histogram_accounts_for_every_customer(spark):
    out = _run("tpch_q13", spark).collect()
    n_cust = _pdf(spark, SF_SMOKE, "customer").shape[0]
    assert sum(r["custdist"] for r in out) == n_cust


def test_q15_winner_has_max_revenue(spark):
    out = _run("tpch_q15", spark).collect()
    assert len(out) >= 1
    li = _pdf(spark, SF_SMOKE, "lineitem")
    li = li[(li.l_shipdate >= "1996-01-01") & (li.l_shipdate < "1996-04-01")]
    rev = (li.l_extendedprice * 100).round().astype("int64") * (
        (1 - li.l_discount) * 100
    ).round().astype("int64")
    per_supp = rev.groupby(li.l_suppkey).sum()
    assert {r["total_revenue_e4"] for r in out} == {int(per_supp.max())}
    assert {r["s_suppkey"] for r in out} == set(
        per_supp[per_supp == per_supp.max()].index
    )


def test_q17_threshold_is_exact_fifth_of_avg(spark):
    li = _pdf(spark, SF_SMOKE, "lineitem")
    p = _pdf(spark, SF_SMOKE, "part")
    stats = li.groupby("l_partkey").l_quantity.agg(["sum", "count"])
    j = li.merge(stats, left_on="l_partkey", right_index=True).merge(
        p[p.p_brand == "Brand#3"], left_on="l_partkey", right_on="p_partkey"
    )
    small = j[j.l_quantity.astype("int64") * 5 * j["count"] < j["sum"]]
    row = _run("tpch_q17", spark).collect()[0]
    assert row["n_small"] == len(small)
    assert row["small_qty_cents"] == int(
        (small.l_extendedprice * 100).round().astype("int64").sum()
    )


def test_q21_unique_late_supplier_semantics(spark):
    """An order contributes iff ≥2 distinct suppliers and exactly one
    distinct late supplier — brute-forced per order."""
    li = _pdf(spark, SF_SMOKE, "lineitem")
    o = _pdf(spark, SF_SMOKE, "orders")
    s = _pdf(spark, SF_SMOKE, "supplier")
    j = li.merge(o[o.o_orderstatus == "F"], left_on="l_orderkey", right_on="o_orderkey")
    j["late"] = j.l_shipdate > j.o_orderdate + pd.Timedelta(days=60)
    waits: dict[str, int] = {}
    for _, grp in j.groupby("l_orderkey"):
        supps = set(grp.l_suppkey)
        late = set(grp[grp.late].l_suppkey)
        if len(supps) >= 2 and len(late) == 1:
            name = s[s.s_suppkey == next(iter(late))].s_name.iloc[0]
            waits[name] = waits.get(name, 0) + 1
    expect = sorted(waits.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["s_name"], r["numwait"]) for r in _run("tpch_q21", spark).collect()]
    assert got == expect


def test_q22_threshold_and_lapsed_filter(spark):
    c = _pdf(spark, SF_SMOKE, "customer")
    o = _pdf(spark, SF_SMOKE, "orders")
    c = c[c.c_nationkey.isin([1, 3, 5, 7, 9, 11, 13])].copy()
    c["cents"] = (c.c_acctbal * 100).round().astype("int64")
    pos = c[c.c_acctbal > 0]
    recent = set(o[o.o_orderdate >= "1999-01-01"].o_custkey)
    keep = c[
        (c.cents * len(pos) > pos.cents.sum()) & ~c.c_custkey.isin(recent)
    ]
    expect = (
        keep.groupby("c_nationkey")
        .agg(numcust=("c_custkey", "size"), tot=("cents", "sum"))
        .to_dict("index")
    )
    got = {
        r["cntry"]: (r["numcust"], r["totacctbal_cents"])
        for r in _run("tpch_q22", spark).collect()
    }
    assert got == {
        int(k): (v["numcust"], int(v["tot"])) for k, v in expect.items()
    }


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_scan_is_pruned_and_pushed(spark):
    plan = _executed_plan(_run("tpch_q6", spark))
    # Column pruning: the lineitem scan must read only the 4 needed cols.
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}
    # Predicate pushdown: quantity filter reaches the parquet scan.
    assert "PushedFilters: [" in plan and "l_quantity" in plan.split(
        "PushedFilters: ["
    )[1].split("]")[0]


def test_q4_plans_exists_as_semi_join(spark):
    plan = _executed_plan(_run("tpch_q4", spark))
    assert "LeftSemi" in plan


def test_q21_topk_is_take_ordered(spark):
    plan = _executed_plan(_run("tpch_q21", spark))
    assert "TakeOrderedAndProject" in plan


def test_agg_regression_sums_accumulate_in_decimal(spark):
    """The quadratic-term sums must accumulate as decimal(38,0) — a
    revert to long overflows ANSI Spark around 10^6 rows of 10^7-cent
    values (caught live by the 8x fact probe)."""
    import __spark_entry__ as entry

    df = entry.queries()["agg_regression"](spark, SF_SMOKE)
    # walk the analyzed plan: the partial-aggregate schema carries the
    # sum buffers; assert via the logical plan string that the cast to
    # decimal(38,0) wraps the squared terms
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "decimal(38,0)" in plan


def test_target_encode_singleton_category_is_null(spark, tmp_path):
    """A category with one member has no leave-one-out peers — the
    encoding must be NULL, not a division by zero (n-1 = 0)."""
    import os
    import shutil

    src = SF_SMOKE
    d = tmp_path / "fix"
    d.mkdir()
    for f in os.listdir(src):
        if f != "customer.parquet":
            os.symlink(os.path.join(src, f), d / f)
    rows = [
        (1, "c1", 0, 100.0, "SOLO"),
        (2, "c2", 0, 10.0, "PAIR"),
        (3, "c3", 0, 30.0, "PAIR"),
    ]
    cdf = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    )
    out_dir = str(d / "_c")
    cdf.coalesce(1).write.parquet(out_dir)
    part = next(p for p in os.listdir(out_dir) if p.endswith(".parquet"))
    shutil.move(os.path.join(out_dir, part), d / "customer.parquet")
    shutil.rmtree(out_dir)
    got = {
        r["c_custkey"]: r["loo_mean_acctbal"]
        for r in _run("feat_target_encode", spark, str(d)).collect()
    }
    assert got[1] is None          # singleton: no peers
    assert got[2] == 30.0          # the other PAIR member's balance
    assert got[3] == 10.0


def test_fn_hof_null_and_empty_text_parity(spark):
    """NULL text → every HOF output NULL (Spark size/aggregate on a
    NULL array and DuckDB list_* agree); empty string → one empty
    token. Pinned cross-engine with an inline DuckDB run — the
    degenerate sweep is count-only and cannot see a value divergence."""
    import duckdb
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a the bb")], "doc_id long, text string"
    )
    words = F.split("text", " ")
    got = [
        tuple(r)
        for r in df.select(
            "doc_id",
            F.size(words).cast("long"),
            F.size(F.filter(words, lambda w: F.length(w) > 4)).cast("long"),
            F.aggregate(
                words,
                F.lit(0).cast("long"),
                lambda a, w: a + F.length(w).cast("long"),
            ),
            F.exists(words, lambda w: w == "the"),
            F.array_join(F.slice(words, 1, 3), "_"),
        )
        .orderBy("doc_id")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE d AS SELECT * FROM (VALUES (1, NULL), (2, ''), "
        "(3, 'a the bb')) t(doc_id, text)"
    )
    want = con.execute(
        """
        SELECT doc_id, CAST(len(string_split(text,' ')) AS BIGINT),
               CAST(len(list_filter(string_split(text,' '),
                                    w -> len(w) > 4)) AS BIGINT),
               CAST(list_sum(list_transform(string_split(text,' '),
                                            w -> len(w))) AS BIGINT),
               len(list_filter(string_split(text,' '),
                               w -> w = 'the')) > 0,
               array_to_string(string_split(text,' ')[1:3], '_')
        FROM d ORDER BY doc_id
        """
    ).fetchall()
    assert got == [tuple(w) for w in want]


def test_sample_fixed_k_uses_window_group_limit(spark):
    """rank <= k per source must execute as WindowGroupLimit
    (per-partition top-k heaps before the shuffle) — a 100 TB stratum
    must never funnel through one partition."""
    plan = _executed_plan(_run("corpus_sample_fixed_k", spark))
    assert "WindowGroupLimit" in plan


def test_q2_min_balance_suppliers(spark):
    """Every returned (part, supplier) must have the part's minimal
    ASIA-supplier balance, with ties all kept — brute-forced."""
    li = _pdf(spark, SF_SMOKE, "lineitem")
    p = _pdf(spark, SF_SMOKE, "part")
    s = _pdf(spark, SF_SMOKE, "supplier")
    n = _pdf(spark, SF_SMOKE, "nation")
    r = _pdf(spark, SF_SMOKE, "region")
    asia = n.merge(r[r.r_name == "ASIA"], left_on="n_regionkey",
                   right_on="r_regionkey")
    sa = s.merge(asia, left_on="s_nationkey", right_on="n_nationkey")
    sa["cents"] = (sa.s_acctbal * 100).round().astype("int64")
    rel = li[["l_partkey", "l_suppkey"]].drop_duplicates()
    pk = p[(p.p_type == "LARGE") & (p.p_size <= 10)]
    cand = pk.merge(rel, left_on="p_partkey", right_on="l_partkey").merge(
        sa, left_on="l_suppkey", right_on="s_suppkey"
    )
    expect = set()
    for part, grp in cand.groupby("p_partkey"):
        m = grp.cents.min()
        for _, row in grp[grp.cents == m].iterrows():
            expect.add((int(row.cents), row.s_name, row.n_name, int(part)))
    got = {
        (r2["s_acctbal_cents"], r2["s_name"], r2["n_name"], r2["p_partkey"])
        for r2 in _run("tpch_q2", spark).collect()
    }
    assert got == set(sorted(expect, key=lambda t: (-t[0], t[2], t[1], t[3]))[:100])


def test_q11_fraction_threshold_exact(spark):
    li = _pdf(spark, SF_SMOKE, "lineitem")
    p = _pdf(spark, SF_SMOKE, "part")
    s = _pdf(spark, SF_SMOKE, "supplier")
    n = _pdf(spark, SF_SMOKE, "nation")
    r = _pdf(spark, SF_SMOKE, "region")
    asia = n.merge(r[r.r_name == "ASIA"], left_on="n_regionkey",
                   right_on="r_regionkey")
    sup = set(s.merge(asia, left_on="s_nationkey",
                      right_on="n_nationkey").s_suppkey)
    j = li[li.l_suppkey.isin(sup)].merge(p, left_on="l_partkey",
                                         right_on="p_partkey")
    j["v"] = (j.p_retailprice * 100).round().astype("int64") * j.l_quantity.astype("int64")
    pv = j.groupby("l_partkey").v.sum()
    total = int(pv.sum())
    expect = {(int(k), int(v)) for k, v in pv.items() if v * 1000 > total}
    got = {
        (r2["p_partkey"], r2["value_cents"])
        for r2 in _run("tpch_q11", spark).collect()
    }
    assert got == expect and len(got) > 0
