"""Query/oracle registry — the driver-facing contract surface.

Every operator from SURVEY.md §2 registers here as
    @register("key", oracle="<DuckDB SQL>")
    def key(spark, sf_dir) -> DataFrame: ...

`__spark_entry__.py` re-exports QUERIES/ORACLES. Keys with oracle=None
get the driver's weaker rows-only check (non-SQL-expressible ops).

Column-name discipline (driver hashes sort columns by name): every
computed column is aliased identically in the Spark plan and the oracle
SQL. Float discipline: aggregate outputs that accumulate (sum/avg/
stddev) are rounded on BOTH sides so engine-order float noise cannot
flip the hash.

STANDING ORACLE RULES (learned from round-1 driver failures — the
driver's value-hash is representation-sensitive, not `==`-tolerant):
  1. DuckDB ``sum()`` over any INTEGER-typed argument returns HUGEINT,
     which pandas materializes as float64 while Spark returns int64 —
     ALWAYS wrap integer-argument sums in ``CAST(sum(...) AS BIGINT)``
     in the oracle SQL (windowed sums included).
  2. No query may output a list/array/map-typed column — the driver's
     canonicalizer crashes on numpy arrays. Emit arrays as canonical
     strings (``array_join`` / ``array_to_string``), scaling floats to
     exact integers first (float→string formatting differs across
     engines). ``tools/check_oracle.py`` hard-errors on these.
  3. Match dtype KIND (int vs float) and prefer matching width (cast
     Spark ``size()``/INT outputs to BIGINT when the oracle emits
     BIGINT) — ``tools/check_oracle.py`` fails kind mismatches and
     warns on width mismatches.

DRIVER WINDOW: the driver checks only the FIRST 50 registered keys per
round (registration order). ``DRIVER_PRIORITY`` below pins the window;
keys absent from it follow in module-import order. Round 5 window =
the 34 keys with ZERO driver evidence after rounds 1-4 (the round-4
``NEXT_ROTATION`` list — graph family, sessionization, edit-distance
dedup, as-of tolerance, MaxSim, round-4b CEP additions — plus the new
``cep_optional_measures``), then the two r4-green keys whose
quantifier-expansion machinery changed this round, then a backfill of
§2 contract keys whose only evidence is round 1.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

_LOADED = False


def register(key: str, oracle: Optional[str] = None):
    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate query key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are inside the function to avoid circular imports at
    # package-import time.
    from spark_cep_spark.sources import readers  # noqa: F401
    from spark_cep_spark.operators import (  # noqa: F401
        relational,
        joins,
        aggregates,
        windows,
        cep,
        cep_sql,
        llm_dedup,
        llm_similarity,
        llm_text,
        llm_multimodal,
        llm_pipeline,
        sql_surface,
        graph,
    )
    from spark_cep_spark.functions import families, udfs  # noqa: F401
    from spark_cep_spark.streaming import windows as stream_windows  # noqa: F401

    _reorder_for_driver_window()
    _LOADED = True


# The first 50 keys the driver will check this round, in order. See the
# module docstring ("DRIVER WINDOW") for the selection rationale.
DRIVER_PRIORITY: list[str] = [
    # (a) the 33 round-4 NEXT_ROTATION keys (zero driver evidence;
    # all exact-pass tools/check_oracle.py locally)
    "text_vocab",
    "text_tfidf",
    "fn_regexp",
    "fn_format",
    "agg_ohlc",
    "agg_median",
    "stream_trending",
    "graph_transitions",
    "graph_degrees",
    "graph_triangles",
    "graph_pagerank",
    "dedup_edit_nn",
    "pipeline_scrub_boilerplate",
    "rollup_interpolate",
    "pipeline_dedup_keep_best",
    "agg_argminmax",
    "corpus_sample_weighted",
    "win_running_distinct",
    "join_asof_tolerance",
    "cep_reluctant_optional",
    "cep_sql_reluctant",
    "sim_maxsim",
    "cep_gap_timeout",
    "win_sessionize",
    "stream_sessionize",
    "agg_mode",
    "win_period_delta",
    "corpus_token_budget",
    "corpus_dedup_stats",
    "sql_match_recognize",
    "agg_conditional",
    "pipeline_incremental_dedup",
    "dedup_edit_banded",
    # (b) NEW in round 5: MEASURES lifted through the quantifier
    # expansion (verdict item 6)
    "cep_optional_measures",
    # (c) r4-green keys whose quantifier-expansion code path changed
    # in round 5 (measures lift + streaming variant runner wiring)
    "cep_sql_optional",
    "cep_sql_permute",
    # (d) backfill: §2 contract keys whose only driver evidence is
    # round 1 — most load-bearing first
    "join_inner_equi",
    "join_broadcast",
    "join_asof",
    "join_interval",
    "join_anti",
    "agg_global",
    "agg_group",
    "agg_grouping_sets",
    "win_rank",
    "win_topk_per_group",
    "scan_parquet",
    "project_filter",
    "sort_multi",
    "set_union",
]

# Keys to rotate into DRIVER_PRIORITY next round: first the four
# operators NEW in round 5 (local exact-pass via check_oracle), then
# the §2 keys whose only driver evidence remains round 1.
NEXT_ROTATION: list[str] = [
    "text_bigram_lm",
    "join_asof_nearest",
    "agg_weighted",
    "win_lag_ignore_nulls",
    "cep_group_times",
    "cep_skip_to_last",
    "cep_all_rows",
    "scan_csv_json",
    "scan_orc",
    "case_when",
    "distinct_select",
    "limit_topk",
    "sample",
    "set_union_all",
    "set_intersect",
    "set_except",
    "merge_upsert",
    "join_left",
    "join_right",
    "join_full",
    "join_semi",
    "join_theta_range",
    "join_cross",
    "join_skew_salted",
    "join_interval_banded",
    "agg_approx",
    "agg_stats",
    "having",
    "agg_pivot",
    "fn_explode",
    "rollup_hypertable",
    "agg_histogram",
    "rollup_gapfill",
    "agg_sketches",
    "agg_unpivot",
    "win_analytic",
    "win_frame_range",
    "win_percentiles",
    "win_ewma",
    "cep_seq",
]


def _reorder_for_driver_window() -> None:
    """Rebuild QUERIES/ORACLES so DRIVER_PRIORITY keys come first (in
    listed order), then everything else in registration order. dict()
    preserves insertion order, which is what the driver iterates."""
    missing = [k for k in DRIVER_PRIORITY if k not in QUERIES]
    if missing:
        raise ValueError(f"DRIVER_PRIORITY keys not registered: {missing}")
    ordered = list(DRIVER_PRIORITY) + [
        k for k in QUERIES if k not in set(DRIVER_PRIORITY)
    ]
    for d in (QUERIES, ORACLES):
        snapshot = dict(d)
        d.clear()
        d.update({k: snapshot[k] for k in ordered if k in snapshot})
