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
keys absent from it follow in module-import order. Round 4 window =
the 24 keys with zero driver evidence after rounds 1-3 (20 oracle-
backed + 4 rows-only), then keys whose code changed in rounds 3-4,
then a backfill of §2 contract keys whose only evidence is round 1.
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
    # (a) the 20 oracle-backed keys with ZERO driver evidence after
    # rounds 1-3 (the whole CEP correlation/measures arc, the newest
    # text/pipeline operators, the sql_* surface, fn extras, and the
    # stream-stream left join)
    "cep_seq_ids",
    "cep_seq_corr",
    "cep_seq_measures",
    "cep_strict_next",
    "cep_funnel_abandon",
    "cep_times",
    "cep_kleene_measures",
    "cep_skip_past",
    "cep_sql_match",
    "text_repetition",
    "text_ngrams",
    "text_redact",
    "pipeline_decontaminate",
    "sql_subqueries",
    "sql_subquery_correlated",
    "sql_lateral_explode",
    "fn_bitwise",
    "fn_struct",
    "fn_url",
    "stream_stream_left_join",
    # (b) the 4 rows-only keys with zero driver evidence (ANN paths
    # have no SQL oracle by nature; decode has no media fixture)
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sim_ann_pq",
    "multimodal_decode",
    # (c') operators NEW in round 4 (text_fingerprint/dedup_near left
    # the window: r03 already re-proved them under guarded semantics)
    "dedup_minhash_lsh",
    "text_surprisal",
    "text_boilerplate",
    "pipeline_quality_filter",
    "corpus_mix",
    "stream_dedup_near",
    "pipeline_end_to_end",
    "text_entropy",
    "corpus_epochs",
    "stream_sliding_panes",
    "cep_alert_throttle",
    "fn_try",
    "sql_recursive_cte",
    "emb_dim_stats",
    "corpus_shuffle",
    "text_perplexity",
    "dedup_containment",
    "corpus_interleave",
    "cep_permute",
    "cep_sql_permute",
    "cep_optional",
    "cep_times_range",
    "cep_sql_optional",
    "text_chunk",
    "emb_kmeans",
    "dedup_semantic",
]

# Keys registered after the round-4 window filled (locally exact-pass
# via tools/check_oracle.py): rotate these into DRIVER_PRIORITY at the
# start of round 5, ahead of any backfill.
NEXT_ROTATION: list[str] = [
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
