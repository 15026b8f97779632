"""Scaling probe for the EVENT-side operators (CEP / sessionization /
windows / graph) — the events twin of bench_scale_docs.py (round-5
verdict item 6).

Stages an amplified copy of the sf0.1 events table: N exact copies
with user_id and event_id shifted per copy — N× more KEYS at the same
per-key density, which is how an event stream actually grows (users
scale with data; per-user history does not). This is exactly the axis
that stresses the CEP joins' key cardinality and, streaming-side, the
NFA's per-key state map. The point is the GROWTH FACTOR: every probed
op should scale ~linearly (≲2× wall-clock at 8× data on fixed local
cores means the plan parallelizes; super-linear means a per-key stage
is quadratic or a global structure is being rebuilt).

Also probes the STREAMING variant-NFA path (bench.py's
`stream_bench` pattern: match_recognize over an AvailableNow file
stream) at 1× and N×, since batch twins alone would hide a streaming
kernel regression.

Usage: python tools/bench_scale_events.py [--mult 8] [--sf-dir DIR]
Writes a markdown table to stdout (recorded in SCALE.md).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

# batch twins that read ONLY the events table
OPS = [
    "cep_seq",
    "cep_kleene",
    "cep_gap_timeout",
    "cep_funnel_steps",
    "sql_match_recognize",
    "win_sessionize",
    "win_streak",
    "win_anomaly_zscore",
    "win_rolling_corr",
    "win_cusum",
    "cep_trend_runs",
    "cep_vshape",
    "win_rolling_median",
    "win_holt",
    "agg_entropy",
    "stream_tumbling",
    "stream_trending",
    "graph_transitions",
    "graph_pagerank",
    # round-6b: nav CEP (lag pre-projection + per-step joins),
    # RUNNING/FINAL unpivot, heavy hitters, path agg, windowed top-k
    "cep_sql_prev",
    "cep_measures_running",
    # round-10: classic ALL ROWS + universal RUNNING/FINAL measures
    "cep_sql_final_running",
    # round-10: leading Kleene (A+ -> B) on the kleene-agg kernel
    "cep_sql_leading_kleene",
    # round-10: MEASURES through the PERMUTE winner struct
    "cep_sql_permute_measures",
    # round-10: two quantified groups (cross-product variants)
    "cep_sql_two_groups",
    "cep_sql_leading_kleene_rows",
    # round-10: multi-query rule pack (one scan / one state)
    "cep_multi_pattern",
    # round-11: mixed chain + run-agg pack (one scan / one state)
    "cep_multi_rules_mixed",
    # round-11: PERMUTE -> terminal (suffix rides the winner struct)
    "cep_sql_permute_confirm",
    "agg_heavy_hitters",
    "agg_path_string",
    "stream_topk",
    "stream_session_dynamic",
    "cep_sql_multikey",
    # round-6c: skip-numbered matches, per-row classifier unpivot,
    # fixed-grid drift (one hash agg / spine-bounded window)
    "cep_sql_match_number",
    "cep_sql_classifier",
    "agg_psi",
    "agg_ks",
    "stream_drift_psi",
    # round-6f: bitmap exact distinct (bucketed partials), z-order
    # tiling, chained-stateful distinct twin, LTTB per-key kernel
    "agg_bitmap_distinct",
    "scan_zorder",
    "stream_distinct_users",
    "rollup_lttb",
    # round-6g: bitmap retention (day-pair intersection via bit algebra)
    "agg_bitmap_retention",
    "stream_retention",
    "stream_wau",
    "cep_funnel_latency",
    "cep_run_agg",
    "cep_sql_run_agg",
    "rollup_twap",
    "feat_scale",
    "agg_hll_union",
    # round-8: terminal-confirm form of the kleene-agg kernel,
    # then the {n,m}-bounded and composite-key forms
    "cep_sql_run_agg_confirm",
    "cep_sql_run_agg_times",
    "cep_sql_run_agg_multikey",
    # round-8: lag-correlation (one shuffle, 3 lags), dow seasonal
    # index (two hash aggs)
    "win_acf",
    "rollup_seasonal",
    "cep_sql_run_agg_corr",
    "win_pacf",
    "agg_log2_quantile",
    "rollup_ohlc_multi",
    "profile_skew",
    # round-9: ALL ROWS emit_rows face (per-row output), exclusion
    # variant, per-key match numbering, MIN/MAX combine form, and the
    # O(1)-state temporal (as-of) enrichment join
    "cep_sql_run_agg_measures",
    "cep_sql_run_agg_exclusion",
    "cep_sql_run_agg_match_number",
    "cep_sql_run_agg_peak",
    "stream_asof_enrich",
    "stream_asof_ttl",
    "stream_dq_monitor",
    "win_decay_score",
]

STREAM_NFA_SQL = """
PATTERN ( S -> V{1,3} -> P )
WITHIN 2 HOURS
PARTITION BY user_id
DEFINE S AS event_type = 'signup',
       V AS event_type = 'view',
       P AS event_type = 'purchase'
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--scratch", default="/root/repo/.tmp/scale_events")
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
    spark = get_spark("scale-events")

    e = table(spark, args.sf_dir, "events")
    n1 = e.count()

    shutil.rmtree(args.scratch, ignore_errors=True)
    os.makedirs(args.scratch)
    big_dir = os.path.join(args.scratch, "big")
    os.makedirs(big_dir)
    copies = [
        e.withColumn(
            "event_id", (F.col("event_id") + F.lit(i * 100_000_000)).cast("long")
        ).withColumn(
            "user_id", (F.col("user_id") + F.lit(i * 10_000_000)).cast("long")
        )
        for i in range(args.mult)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(16).write.mode("overwrite").parquet(
        os.path.join(big_dir, "events.parquet")
    )
    nN = args.mult * n1

    # ops that go through load_tables (e.g. the SQL surface) need the
    # other fixture tables present — symlink them unamplified
    from spark_cep_spark.schemas import TABLES

    for name in TABLES:
        if name == "events":
            continue
        dst = os.path.join(big_dir, f"{name}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(args.sf_dir, f"{name}.parquet"), dst)

    def run(key: str, sf_dir: str) -> float:
        fn = spark_cep_spark.QUERIES[key]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    print(f"| op | {n1} events (s) | {nN} events (s) | growth (x{args.mult} data) |")
    print("| --- | --- | --- | --- |")
    for key in OPS:
        run(key, args.sf_dir)  # warm
        t1 = min(run(key, args.sf_dir), run(key, args.sf_dir))
        tN = run(key, big_dir)
        tN = min(tN, run(key, big_dir))
        print(f"| {key} | {t1:.2f} | {tN:.2f} | {tN / t1:.1f}x |")

    # streaming variant-NFA probe: drain the staged stream in 2
    # micro-batches at each scale; report wall and events/s growth
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.operators.cep_sql import match_recognize

    def stream_nfa(sf_dir: str, n_events: int) -> float:
        staged = harness.stage_events_files_sorted(spark, sf_dir, n_files=8)
        best = None
        for _ in range(2):
            sdf = harness.events_stream(spark, staged, max_files_per_trigger=4)
            t0 = time.perf_counter()
            harness.run_available_now(
                match_recognize(sdf, STREAM_NFA_SQL, watermark="0 seconds"),
                "append",
            ).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return best

    t1 = stream_nfa(args.sf_dir, n1)
    tN = stream_nfa(big_dir, nN)
    print(
        f"| stream_nfa_variants | {t1:.2f} ({n1 / t1:.0f} ev/s) "
        f"| {tN:.2f} ({nN / tN:.0f} ev/s) | {tN / t1:.1f}x |"
    )


if __name__ == "__main__":
    main()
