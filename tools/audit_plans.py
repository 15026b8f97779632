"""Physical-plan audit over every registered query — the ".explain and
iterate" loop, mechanized (the scale review the brief asks for per
operator).

For each queries() entry, builds the DataFrame at --sf-dir (planning
only, no execution) and extracts from the formatted plan:
  - number of shuffle Exchanges (each is a full network pass at scale)
  - broadcast exchanges/joins
  - whole-stage-codegen spans (JVM hot path) vs Python eval nodes
  - smells: BatchEvalPython (row-at-a-time Python UDF in the hot path),
    CartesianProduct / BroadcastNestedLoop on ops that shouldn't need
    one, parquet scans with no ReadSchema pruning.

Writes PLANS.md (summary table + flagged plans) so plan regressions
show up in review diffs.

Usage: python tools/audit_plans.py [--sf-dir DIR] [--only k1,k2]
"""

from __future__ import annotations

import argparse
import re
import sys

sys.path.insert(0, "/root/repo")

# Ops whose semantics legitimately need a nested-loop / cartesian join.
NESTED_LOOP_OK = {
    "join_cross",
    "join_theta_range",
    "join_interval",
    "sim_topk",
    "emb_mrl_eval",  # broadcast 20-query set x candidates (the sim_topk
    # shape) + a 4-row truncation-level broadcast onto 20 top-1 rows
    "sim_knn_class",
    "sim_maxsim",  # same broadcast query-set x candidates scan as sim_topk
    "dedup_embed",
    "sql_recursive_cte",  # same all-pairs edge generation as dedup_embed
    # (toy-scale face; scale path is LSH-bucketed candidates)
    "sql_subqueries",  # uncorrelated scalar subquery broadcast
    "text_surprisal",  # 1-row total-count scalar broadcast (cross join
    # with a single-row aggregate — build side is constant-size)
    "corpus_mix",  # same 1-row N_total broadcast into the rate table
    "pipeline_end_to_end",  # same 1-row winner-total broadcast
    "corpus_epochs",  # same 1-row N_total broadcast
    "text_tfidf",  # same 1-row corpus-count broadcast into tf·idf
    "rollup_interpolate",  # hour-spine x event-type grid: both sides are
    # generated/aggregated to O(hours)/O(types) rows — the cross join
    # materializes the grid, never data-sized input
    "corpus_token_budget",  # 1-row c_min quality-threshold broadcast
    # (the exact pre-filter that BOUNDS the global running-sum window
    # — same constant-size-build-side shape as text_surprisal)
    "text_bm25_topk",  # 1-row (N, avgdl) scalar broadcast into the
    # query-term-bounded postings — same shape as text_surprisal
    "agg_heavy_hitters",  # 1-row grand-total broadcast into the per-key
    # counts (frequency > n/k threshold) — same constant-size build
    # side as text_surprisal
    "profile_expectations",  # 1-row orphan-count x 1-row total cross
    # join (both sides single-row aggregates — the Deequ FK check)
    "pipeline_e2e",  # inherits pipeline_dsir_weights' 256-row lambda x
    # 1-row totals broadcast cross join (fixed bucket space)
    "sim_rrf_hybrid",  # inherits text_bm25_topk's 1-row scalar
    # broadcast on its lexical branch (the semantic branch is pure
    # equi-joins on exact-integer components)
    "sim_mmr_rerank",  # same broadcast query-set x candidates scan as
    # sim_topk; the MMR stage itself only ever sees 32 pruned rows/query
    "sim_range_search",  # same broadcast query-set x candidates scan;
    # radius filter composes with the scan (no window at all)
    "stream_drift_psi",  # 1-row reference-distribution broadcast into
    # the per-day bin-count rows — same constant-size build side as
    # text_surprisal (the reference is the bin grid, never data-sized)
    "tpch_q22",  # 1-row (sum_pos, n_pos) threshold broadcast — the
    # exact cross-multiplied avg-balance test; same constant-size
    # build side as text_surprisal
    "text_collocations",  # 1-row N_total broadcast into the
    # min-count-pruned bigram table — same shape as text_surprisal
    "text_bigram_kn",  # 1-row distinct-bigram-type total T broadcast
    # into the top-200-bounded pair table — same constant-size build
    # side as text_surprisal (T is the KN continuation denominator)
    "pipeline_dedup_eval",  # the final precision/recall row combines
    # three 1-row count aggregates — all build sides constant-size
    "tpch_q11",  # 1-row regional-total broadcast into the per-part
    # value table (the cross-multiplied 0.1% fraction test)
    "win_pareto_share",  # 1-row (max, total) scalar broadcast feeding
    # the value-range bucket id — same constant-size build side as
    # text_surprisal; the point of the op is avoiding the global window
    "pipeline_dsir_weights",  # 1-row (target-total, raw-total) scalar
    # broadcast into the 256-row bucket table — same constant-size
    # build side as text_surprisal; the lambda table itself joins back
    # as a bounded 256-row broadcast equi-join
    "sim_bq_hamming",  # 10-signature query set broadcast against the
    # one-long-column corpus scan (the sim_topk shape); candidate cost
    # is one xor+popcount per row
    "sim_bq_rerank",  # the same 10-signature broadcast scan for the
    # Hamming shortlist; the re-rank stage is bounded equi-joins over
    # 50 ids/query
    "join_bloom_pruned",  # 1-row bitset-array broadcast into the fact
    # probe (element_at on a shared array; a LITERAL array would be
    # CreateArray rebuilt per row — the 8x probe caught that live).
    # Build side is <= 2^17 longs by construction (the m cap).
}
# Ops where Python execution is the point (pandas/arrow surfaces).
PYTHON_OK = {
    "udf_surface",
    "udaf_grouped",
    "grouped_map",
    "map_in_pandas",
    "map_in_arrow",  # Arrow-native batch map — the §2.12 surface itself
    "udtf_tokens",
    "sim_topk_pandas",
    "sim_topk_arrow",  # the zero-copy Arrow BLAS face of the same op
    "multimodal_ingest",
    "sim_ann_ivf",
    "sim_ann_lsh",  # Arrow-batched numpy matmul bucketing (one BLAS call/batch)
    "multimodal_decode",  # Arrow-batched decode/frame-sample pipeline
    "cep_skip_past",  # sequential skip-policy scan over MATCHES (not events)
    "cep_skip_to_last",  # same sequential policy, different resume point
    "cep_skip_to_first",  # same sequential policy, run-entry resume point
    "cep_sql_skip_last_kleene",  # the dialect's SKIP TO LAST on a kleene
    # target compiles to the same sequential selector over MATCHES
    "cep_sql_match_number",  # the dialect's AFTER MATCH SKIP PAST LAST
    # ROW compiles to the same sequential selector over MATCHES; the
    # MATCH_NUMBER window itself is JVM-side
    "cep_alert_throttle",  # same sequential policy, over ALERTS
    "win_ewma",  # inherently sequential per-key recurrence (EWMA)
    "win_cusum",  # same shape: CUSUM signal-and-restart recurrence —
    # no window frame expresses it; keys parallelize, state = 2 floats
    "dedup_near_arrow",  # Arrow-batched per-doc minhash (no shingle explode)
    "sim_ann_pq",  # Arrow-batched ADC scan over 8-byte codes — the point
    # of PQ is that this stage is bandwidth-bound, not compute-bound
    "sim_ann_ivfpq",  # IVF x PQ composed: the same Arrow-batched ADC
    # scan, further bounded to each query's nprobe cells
    "sim_ann_ivfpq_index",  # the persistent face of the same ADC scan —
    # partition-pruned to the probed cells, column-pruned to the codes
    "sim_ann_ivfpq_delete",  # same ADC scan + one broadcast anti-join
    # against the O(deleted) tombstone table (after partition pruning)
    "sim_index_stream_ingest",  # same ADC scan over bulk + epoch-dir
    # streamed rows; ingest itself is the _encode Arrow pass per batch
    "emb_covariance",  # mapInPandas partial Gram (one BLAS X^T.X per
    # Arrow batch) — the shuffle-minimal alternative to an n x d
    # self-join; shuffle carries only partitions x d^2 partial rows
    "sim_mmr_rerank",  # greedy argmax chain over the 32 PRUNED
    # candidates per query — inherently sequential (each pick changes
    # the next score); cost independent of corpus size
    "win_holt",  # coupled level+trend recurrence, win_ewma's shape:
    # no window frame expresses it; keys parallelize, state = 2 floats
    "cep_run_agg",  # running-aggregate kleene extension — whether row
    # i binds depends on the ACCEPTED prefix (no window frame
    # expresses it); batch face = the same pure kernel the streaming
    # face uses, per key (win_ewma/win_cusum tier-(b) class)
    "cep_sql_run_agg",  # the same advance_kleene_agg kernel reached
    # from MATCH_RECOGNIZE text (round 7) — anchor/candidate predicates
    # evaluate JVM-side into booleans; only the prefix-dependent
    # aggregate check crosses into Python (5 narrow columns, O(1) state)
    "cep_sql_run_count",  # the COUNT-cap form of the same kernel path
    "cep_sql_leading_kleene",  # PATTERN (A+ -> B) — the same kernel
    # with a trivially-true bind and min_n=0 (round 10); the run scan
    # is prefix-dependent (SKIP PAST LAST ROW consumes rows), which no
    # window frame expresses — same JVM/Python split as its siblings
    "cep_sql_leading_kleene_rows",  # the ALL ROWS face of the same
    # scan (emit_rows) — identical kernel, wider emission only
    "cep_multi_rules_mixed",  # mixed rule pack (round 11): the chain
    # half is a pure join-agg plan; the run-agg half is the SAME
    # advance_kleene_agg Python kernel as cep_sql_run_agg — identical
    # JVM/Python split, unioned with typed-NULL padding
    "cep_sql_run_agg_confirm",  # the terminal-confirm (A -> B+ -> C)
    # form of the same kernel path (round 8) — identical JVM/Python
    # split, one extra JVM-side boolean column
    "cep_sql_run_agg_times",  # the {n,m}-bounded form — same kernel,
    # bounds live in the closure (zero extra state or columns)
    "cep_sql_run_agg_multikey",  # the composite-PARTITION BY form —
    # same kernel; the pair key only refines the shuffle hash
    "cep_sql_run_agg_corr",  # the mixed agg+anchor-correlation form —
    # same kernel; two more narrow JVM columns cross the boundary
    "cep_sql_run_agg_measures",  # the emit_rows (ALL ROWS) face of the
    # same kernel path (round 9) — identical JVM/Python split; the
    # per-row output is the mode's contract, state O(rows-per-match)
    # bounded by the WITHIN deadline
    "cep_sql_run_agg_exclusion",  # same emit_rows face + the shared
    # filter_excluded_rows emission filter (2 rows/match out)
    "cep_sql_run_agg_match_number",  # same kernel + the per-key match
    # counter (assign_match_numbers) — one integer of extra state
    "cep_sql_run_agg_peak",  # the MIN/MAX combine form — same kernel,
    # the accumulator update closure changes, nothing else
    "win_decay_score",  # time-decayed integer recurrence (halve per
    # idle hour) — prefix-dependent like win_ewma, no window frame
    # expresses it; ONE (user) shuffle, O(1) integer state
    "rollup_lttb",  # LTTB's choose-per-bucket recurrence is genuinely
    # sequential per key (each kept point changes the next triangle) —
    # the documented tier-(b) applyInPandas integer kernel; one (user)
    # shuffle, O(1) kernel state, output k rows per key
}
# Ops that intentionally demonstrate the row-at-a-time UDF/UDTF surface
# (SURVEY §2.12) — everything else must stay off BatchEvalPython.
ROW_PYTHON_OK = {"udf_surface", "udtf_tokens"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("--out", default="/root/repo/PLANS.md")
    args = ap.parse_args()

    import spark_cep_spark
    from spark_cep_spark.session import get_spark

    spark_cep_spark.load_all()
    spark = get_spark("plan-audit", cpus=8, shuffle_partitions=8)

    keys = sorted(spark_cep_spark.QUERIES)
    if args.only:
        keys = [k for k in args.only.split(",") if k in spark_cep_spark.QUERIES]

    rows = []
    flagged: list[tuple[str, list[str], str]] = []
    for key in keys:
        try:
            df = spark_cep_spark.QUERIES[key](spark, args.sf_dir)
            # Execute so AQE finalizes THIS DataFrame's queryExecution —
            # the audited plan is the one that actually ran (runtime
            # broadcasts, coalesced exchanges, codegen assignment).
            df.collect()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # pragma: no cover - audit robustness
            rows.append((key, "-", "-", "-", "-", f"PLAN ERROR: {exc}"))
            continue
        # The formatted output = tree summary (with "== Final Plan ==" /
        # "== Initial Plan ==" subtrees under AQE) + numbered node
        # details covering BOTH. Count structure from the FINAL tree —
        # the plan that actually ran.
        tree = plan.split("\n\n")[0]
        tree = re.split(r"== Initial Plan ==", tree)[0]
        n_exch = len(re.findall(r"\bExchange\b", tree))
        n_bcast = len(re.findall(r"BroadcastExchange", tree))
        n_wsc = len(set(re.findall(r"codegen id : (\d+)", plan)))
        py_re = (
            r"BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas"
            r"|MapInPandas|FlatMapGroupsInPandasWithState|PythonUDTF"
        )
        n_py = len(re.findall(py_re, tree))
        smells = []
        if "BatchEvalPython" in tree and key not in ROW_PYTHON_OK:
            smells.append("row-at-a-time PythonUDF")
        if (
            re.search(r"CartesianProduct|BroadcastNestedLoopJoin", tree)
            and key not in NESTED_LOOP_OK
        ):
            smells.append("nested-loop join")
        if n_py and key not in PYTHON_OK:
            smells.append("unexpected Python stage")
        rows.append(
            (key, n_exch, n_bcast, n_wsc, n_py, "; ".join(smells) or "ok")
        )
        if smells:
            flagged.append((key, smells, plan))

    with open(args.out, "w") as f:
        f.write(
            "# PLANS — physical-plan audit (generated by tools/audit_plans.py)\n\n"
            f"Final adaptive plans at `{args.sf_dir}` — each query was\n"
            "executed to a noop sink so AQE's runtime re-planning\n"
            "(broadcast conversion, partition coalescing) is included.\n"
            "Columns: shuffle exchanges / broadcast exchanges /\n"
            "whole-stage-codegen spans / Python stages.\n\n"
            "| key | exch | bcast | codegen | python | verdict |\n"
            "| --- | --- | --- | --- | --- | --- |\n"
        )
        for r in rows:
            f.write("| " + " | ".join(str(x) for x in r) + " |\n")
        if flagged:
            f.write("\n## Flagged plans\n")
            for key, smells, plan in flagged:
                f.write(f"\n### {key} — {', '.join(smells)}\n\n```\n")
                f.write(plan[:4000])
                f.write("\n```\n")
    n_smell = len(flagged)
    print(f"{len(rows)} plans audited, {n_smell} flagged -> {args.out}")
    for key, smells, _ in flagged:
        print(f"  FLAG {key}: {'; '.join(smells)}")


if __name__ == "__main__":
    main()
