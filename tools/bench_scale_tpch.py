"""Scaling probe for the FACT-side analytical operators (the TPC-H
pack, star joins, regression/profile aggregates) — the lineitem/orders
twin of bench_scale_docs.py / bench_scale_events.py.

Stages an amplified copy of the sf0.1 lineitem AND orders tables: N
exact copies with l_orderkey/o_orderkey shifted per copy — N× more
ORDERS against the SAME dimension tables (customer/part/supplier/
nation/region symlinked unamplified), which is how a warehouse
actually grows: facts scale with time, dimensions don't. This is the
axis that stresses the fact⋈fact orderkey shuffles, the per-order
aggregates (Q4/Q18/Q21's per-order state), and the decorrelated
per-part aggregate joins (Q17).

The point is the GROWTH FACTOR: every probed op should scale
~linearly (≲2-3× wall-clock at 8× data on fixed local cores means the
plan parallelizes; super-linear means a per-key stage is quadratic or
a global structure is being rebuilt).

Usage: python tools/bench_scale_tpch.py [--mult 8] [--sf-dir DIR]
Writes a markdown table to stdout (recorded in SCALE.md).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

OPS = [
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
    "join_star_q5",
    "join_star_q10",
    "join_star_q18",
    # round-6f: bloom semi-join reduction (bitset rebuild is part of
    # the measured cost — it must stay sublinear in fact rows)
    "join_bloom_pruned",
    # round-6g: snapshot-diff CDC derivation (one co-partitioned FOJ)
    "merge_snapshot_diff",
    "join_scd2_pit",
    "graph_components",
    "graph_label_propagation",
    # round-8: 4-round min-plus relaxation (one join + one min-agg
    # per round over the amplified edge set)
    "graph_shortest_path",
    "win_pareto_share",
    "win_share_of_total",
    "merge_incremental_agg",
    "rollup_wow",
    "agg_regression",
    "profile_columns",
    "feat_target_encode",
    # round-9: the Deequ-style constraint suite (one fused aggregation
    # per table + one broadcast anti-join)
    "profile_expectations",
    # round-9: hashed feature cross (broadcast dim join + projection)
    "feat_hashed_cross",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--scratch", default="/root/repo/.tmp/scale_tpch")
    ap.add_argument("--only", default=None, help="comma-separated OPS subset")
    args = ap.parse_args()
    if args.only:
        only = args.only.split(",")
        unknown = sorted(set(only) - set(OPS))
        if unknown:
            # fail LOUDLY: a typo would otherwise filter OPS to empty
            # and the probe would exit 0 having measured nothing
            raise SystemExit(f"--only keys not in OPS: {unknown}")
        OPS[:] = [k for k in OPS if k in only]

    import spark_cep_spark
    from pyspark.sql import functions as F
    from spark_cep_spark.io import table
    from spark_cep_spark.session import get_spark

    spark_cep_spark.load_all()
    spark = get_spark("scale-tpch")

    li = table(spark, args.sf_dir, "lineitem")
    o = table(spark, args.sf_dir, "orders")
    n1 = li.count()

    shutil.rmtree(args.scratch, ignore_errors=True)
    big_dir = os.path.join(args.scratch, "big")
    os.makedirs(big_dir)

    def amplify(df, key_shifts: dict) -> "F.DataFrame":
        copies = []
        for i in range(args.mult):
            c = df
            for col in key_shifts:
                c = c.withColumn(
                    col, (F.col(col) + F.lit(i * 1_000_000_000)).cast("long")
                )
            copies.append(c)
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        return big

    amplify(li, {"l_orderkey": 1}).repartition(16).write.mode(
        "overwrite"
    ).parquet(os.path.join(big_dir, "lineitem.parquet"))
    amplify(o, {"o_orderkey": 1}).repartition(16).write.mode(
        "overwrite"
    ).parquet(os.path.join(big_dir, "orders.parquet"))
    nN = args.mult * n1

    from spark_cep_spark.schemas import TABLES

    for name in TABLES:
        if name in ("lineitem", "orders"):
            continue
        dst = os.path.join(big_dir, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(args.sf_dir, f"{name}.parquet"), dst)

    def run(key: str, sf_dir: str) -> float:
        fn = spark_cep_spark.QUERIES[key]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    print(
        f"| op | {n1} lineitems (s) | {nN} lineitems (s) "
        f"| growth (x{args.mult} facts) |"
    )
    print("| --- | --- | --- | --- |")
    for key in OPS:
        run(key, args.sf_dir)  # warm
        t1 = min(run(key, args.sf_dir), run(key, args.sf_dir))
        tN = min(run(key, big_dir), run(key, big_dir))
        print(f"| {key} | {t1:.2f} | {tN:.2f} | {tN / t1:.1f}x |")

    shutil.rmtree(args.scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
