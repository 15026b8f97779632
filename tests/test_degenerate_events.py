"""Degenerate-events sweep: the events-family twin of the degenerate-
corpus sweep — every registered operator that reads the events table
must survive NULL timestamps / users / types / values, duplicate event
ids, exact timestamp ties, and single-event keys. Real event streams
contain all of these; none of the fixture generators produce them.
"""

from __future__ import annotations

import datetime
import os
import shutil

import pytest

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + datetime.timedelta(minutes=minutes)


DEGENERATE_EVENTS = [
    # (event_id, ts, user_id, event_type, value, props)
    (0, None, 1, "view", 1.0, "{}"),            # NULL event time
    (1, _ts(0), None, "view", 2.0, "{}"),       # NULL key
    (2, _ts(0), 1, None, None, None),           # NULL type/value/props
    (3, _ts(0), 1, "view", 3.0, "{}"),          # exact tie with 4/5
    (4, _ts(0), 1, "click", 4.0, "{}"),
    (5, _ts(0), 1, "purchase", 5.0, "{}"),
    (None, _ts(0), 1, "purchase", 6.0, "{}"),   # NULL id ON the tie —
    # the sort-order class the round-7 kernel faces normalize (NULL->0
    # pre-sort on batch+streaming, coalesce(event_id,0) in the oracles)
    (7, _ts(5), 1, "error", -1.0, ""),          # duplicate id below
    (7, _ts(6), 1, "error", 0.0, ""),           # duplicate event_id
    (8, _ts(7), 1, "error", 1e308, "{}"),       # extreme value
    (9, _ts(1), 2, "view", 0.0, "x"),           # single-event user 2
    (10, _ts(1), 3, "error", None, '{"k":1}'),  # NULL value spike input
    (11, _ts(2), 3, "error", -5.0, "{}"),
    (12, _ts(3), 3, "error", -5.0, "{}"),       # identical values
    (13, _ts(4), 3, "error", -5.0, "{}"),
]

EVENTS_KEYS = [
    "agg_conditional",
    "agg_mode", "win_period_delta", "win_sessionize", "stream_sessionize",
    "cep_gap_timeout", "sql_match_recognize",
    "rollup_interpolate", "agg_argminmax", "win_running_distinct",
    "join_asof_tolerance", "graph_transitions", "cep_reluctant_optional",
    "cep_sql_reluctant",
    "agg_ohlc", "stream_trending", "cep_optional", "cep_times_range",
    "cep_sql_optional",
    "agg_approx", "agg_histogram", "agg_sketches", "agg_stats",
    "cep_absence", "cep_alert_throttle", "cep_funnel_abandon",
    "cep_kleene", "cep_kleene_measures", "cep_kleene_plus", "cep_seq",
    "cep_seq_corr", "cep_seq_ids", "cep_seq_measures", "cep_skip_past",
    "cep_sql_match", "cep_strict_next", "cep_threshold", "cep_times",
    "fn_json", "fn_map", "fn_math", "fn_struct", "grouped_map",
    "join_asof", "join_interval", "join_interval_banded",
    "join_skew_salted", "rollup_gapfill", "rollup_hypertable", "sample",
    "stream_dedup", "stream_session", "stream_sliding",
    "stream_sliding_panes", "stream_static_join", "stream_stream_join",
    "stream_stream_left_join", "stream_tumbling", "text_redact",
    "udaf_grouped", "udf_surface", "win_ewma", "win_frame_range",
    # round-5 additions over the events table
    "join_asof_nearest", "win_lag_ignore_nulls", "cep_group_times",
    "cep_skip_to_last", "cep_all_rows", "cep_optional_measures",
    # round-6 additions over the events table
    "cep_funnel_steps", "win_streak", "win_anomaly_zscore",
    "win_rolling_corr", "rollup_retention_cohort", "win_cusum",
    "cep_trend_runs", "cep_vshape", "win_rolling_median", "agg_entropy",
        "win_holt", "cep_sql_subset", "win_time_range",
    # round-6b additions over the events table
    "cep_sql_prev", "cep_sql_next", "cep_measures_running",
    "agg_heavy_hitters", "agg_path_string", "stream_topk",
    "cep_sql_multikey", "cep_sql_string_key", "cep_sql_all_rows",
    "stream_session_dynamic", "win_drawdown",
    # round-6c
    "cep_sql_match_number", "cep_sql_classifier",
    "agg_psi", "agg_ks", "stream_drift_psi",
    # round-6d/6e
    "cep_skip_to_first", "cep_sql_skip_last_kleene", "cep_sql_exclusion",
    "cep_sql_anchor_start", "cep_sql_anchor_end",
    "agg_ttest", "agg_chi2", "fn_variant",
    # round-6f
    "agg_bitmap_distinct", "scan_zorder", "stream_distinct_users",
    "rollup_lttb",
    # round-6g
    "agg_bitmap_retention", "stream_retention", "stream_wau",
    "cep_funnel_latency", "cep_run_agg",
    # round-7
    "cep_sql_run_agg", "rollup_twap", "feat_scale", "agg_hll_union",
    "cep_sql_run_count",
    # round-8
    "cep_sql_run_agg_confirm", "cep_sql_run_agg_times",
    "cep_sql_run_agg_multikey", "win_acf", "rollup_seasonal",
    "cep_sql_run_agg_corr", "win_pacf", "agg_log2_quantile",
    "stream_log2_quantile", "rollup_ohlc_multi", "profile_skew",
    # round-9
    "cep_sql_run_agg_measures", "cep_sql_run_agg_exclusion",
    "cep_sql_run_agg_match_number", "cep_sql_run_agg_peak",
    "stream_asof_enrich", "stream_asof_ttl", "stream_dq_monitor",
    "win_decay_score",
    # round-10
    "cep_sql_final_running", "cep_sql_leading_kleene",
    "cep_sql_permute_measures", "cep_sql_two_groups",
    "cep_sql_leading_kleene_rows", "cep_multi_pattern",
    # round-11
    "cep_multi_rules_mixed", "cep_sql_permute_confirm",
]


@pytest.fixture(scope="module")
def degenerate_events_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("degenerate_events_sf")
    for f in os.listdir(src):
        if f != "events.parquet":
            os.symlink(os.path.join(src, f), dst / f)
    df = spark.createDataFrame(
        DEGENERATE_EVENTS,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = str(dst / "_ev_out")
    df.coalesce(1).write.parquet(out)
    part = next(p for p in os.listdir(out) if p.endswith(".parquet"))
    shutil.move(os.path.join(out, part), dst / "events.parquet")
    shutil.rmtree(out)
    return str(dst)


@pytest.mark.parametrize("key", EVENTS_KEYS)
def test_operator_survives_degenerate_events(
    spark, degenerate_events_dir, key
):
    import __spark_entry__ as entry

    n = entry.queries()[key](spark, degenerate_events_dir).count()
    assert n >= 0


EMPTY_SWEEP_KEYS = [
    "agg_conditional",
    "agg_mode", "win_period_delta", "win_sessionize", "stream_sessionize",
    "cep_gap_timeout",
    "rollup_interpolate", "agg_argminmax", "win_running_distinct",
    "join_asof_tolerance", "graph_transitions", "cep_reluctant_optional",
    "agg_ohlc", "stream_trending", "cep_optional", "cep_times_range",
    "stream_tumbling", "stream_session", "cep_seq", "cep_alert_throttle",
    "rollup_gapfill", "rollup_hypertable", "join_asof", "join_interval",
    "win_frame_range", "win_ewma", "agg_histogram", "cep_kleene_plus",
    # round-6
    "cep_funnel_steps", "win_streak", "win_anomaly_zscore",
    "win_rolling_corr", "rollup_retention_cohort", "win_cusum",
    "cep_trend_runs", "cep_vshape", "win_rolling_median", "agg_entropy",
        "win_holt", "cep_sql_subset", "win_time_range",
    # round-6b
    "cep_sql_prev", "cep_sql_next", "cep_measures_running",
    "agg_heavy_hitters", "agg_path_string", "stream_topk",
    "cep_sql_multikey", "cep_sql_string_key", "cep_sql_all_rows",
    "stream_session_dynamic", "win_drawdown",
    # round-6c
    "cep_sql_match_number", "cep_sql_classifier",
    "agg_psi", "agg_ks", "stream_drift_psi",
    # round-6d/6e
    "cep_skip_to_first", "cep_sql_skip_last_kleene", "cep_sql_exclusion",
    "cep_sql_anchor_start", "cep_sql_anchor_end",
    "agg_ttest", "agg_chi2", "fn_variant",
    # round-6f
    "agg_bitmap_distinct", "scan_zorder", "stream_distinct_users",
    "rollup_lttb",
    # round-6g
    "agg_bitmap_retention", "stream_retention", "stream_wau",
    "cep_funnel_latency", "cep_run_agg",
    # round-7
    "cep_sql_run_agg", "rollup_twap", "feat_scale", "agg_hll_union",
    "cep_sql_run_count",
    # round-8
    "cep_sql_run_agg_confirm", "cep_sql_run_agg_times",
    "cep_sql_run_agg_multikey", "win_acf", "rollup_seasonal",
    "cep_sql_run_agg_corr", "win_pacf", "agg_log2_quantile",
    "stream_log2_quantile", "rollup_ohlc_multi", "profile_skew",
    # round-9
    "cep_sql_run_agg_measures", "cep_sql_run_agg_exclusion",
    "cep_sql_run_agg_match_number", "cep_sql_run_agg_peak",
    "stream_asof_enrich", "stream_asof_ttl", "stream_dq_monitor",
    "win_decay_score",
    # round-10
    "cep_sql_final_running", "cep_sql_leading_kleene",
    "cep_sql_permute_measures", "cep_sql_two_groups",
    "cep_sql_leading_kleene_rows", "cep_multi_pattern",
    # round-11
    "cep_multi_rules_mixed", "cep_sql_permute_confirm",
]


@pytest.fixture(scope="module")
def empty_events_dir(spark, tmp_path_factory):
    """sf0.001 with a ZERO-ROW events table — aggregates over nothing,
    gapfill spines from NULL min/max, pattern matching with no input."""
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("empty_events_sf")
    for f in os.listdir(src):
        if f != "events.parquet":
            os.symlink(os.path.join(src, f), dst / f)
    df = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = str(dst / "_ev_out")
    df.coalesce(1).write.parquet(out)
    part = next(p for p in os.listdir(out) if p.endswith(".parquet"))
    shutil.move(os.path.join(out, part), dst / "events.parquet")
    shutil.rmtree(out)
    return str(dst)


@pytest.mark.parametrize("key", EMPTY_SWEEP_KEYS)
def test_operator_survives_empty_events(spark, empty_events_dir, key):
    import __spark_entry__ as entry

    n = entry.queries()[key](spark, empty_events_dir).count()
    assert n >= 0
