"""Round-8 batteries.

NULL-id-on-ts-tie ordering parity (VERDICT r7 "What's wrong" #1):
Spark window ORDER BY sorts NULL FIRST, DuckDB NULLS LAST, pandas NaN
LAST — so a NULL event_id tied on a timestamp silently flips the tie
order between an engine and its oracle unless BOTH order by
coalesce(event_id, 0) (the streaming kernels' NULL->0 convention,
established for the run_agg family in round 7). Round 8 swept the ~45
remaining oracle texts + Spark windows + applyInPandas sorts; this
battery runs every swept family over a fixture RICH in NULL-id ties
(3 users x 40 events, 3 exact-timestamp NULL-id ties per user with
divergent values, so recurrences/selections/paths/navigation all
change if the tie order flips) and asserts the driver-faithful
frames_equal parity plus non-empty output.
"""

from __future__ import annotations

import datetime as ddt
import os
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/tools")

from check_oracle import frames_equal, normalize  # noqa: E402

from spark_cep_spark.registry import ORACLES, QUERIES, load_all  # noqa: E402

load_all()

T0 = ddt.datetime(2026, 5, 4, 8, 0, 0)


def _fixture_rows():
    """3 users x ~40 events. Per user: a CEP-complete sequence
    (signup -> views -> clicks -> purchases -> errors), one value
    spike (anomaly/cusum), multi-day span (twap/wau day boundaries),
    and THREE exact-ts ties where one side has a NULL event_id and a
    very different value — the order-sensitive probe."""
    rows = []
    eid = 100
    for u in (1, 2, 3):
        t = T0 + ddt.timedelta(hours=u)
        seq = [
            ("signup", 10.0),
            ("view", 20.0 + u),
            ("view", 30.0),
            ("click", 25.0),
            ("view", 40.0),
            ("purchase", 60.0),
            ("error", 500.0),  # spike
            ("view", 22.0),
            ("click", 28.0),
            ("view", 26.0),
            ("purchase", 65.0),
            ("view", 24.0),
            ("click", 27.0),
            ("view", 23.0),
            ("error", 21.0),
            ("error", 33.0),  # run of >=3 consecutive errors —
            ("error", 34.0),  # cep_kleene; the i==15 NULL-id tie
            ("purchase", 61.0),  # lands INSIDE the run
            ("view", 25.5),
            ("click", 24.5),
            ("view", 26.5),
        ]
        for i, (et, v) in enumerate(seq):
            # gaps >35min at i%7==0 exercise sessionize boundaries;
            # a day hop mid-sequence exercises twap day rollup
            t += ddt.timedelta(minutes=40 if i % 7 == 0 else 3)
            if i == 13:
                t += ddt.timedelta(days=1)
            rows.append((eid, t, u, et, v, '{"k": %d}' % i))
            eid += 1
            # ties 1-3: NULL-id row at the SAME timestamp with a very
            # different value (and a different type for tie 2) — if an
            # engine orders the tie differently from its oracle, the
            # ewma/cusum/holt recurrence, lttb/twap segment, dedup
            # winner, path string, and prev/next navigation all flip.
            if i in (2, 8, 15):
                tie_type = {2: "view", 8: "click", 15: "error"}[i]
                rows.append((None, t, u, tie_type, 900.0 + i, "{}"))
    return rows


@pytest.fixture(scope="module")
def tie_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("null_tie"))
    df = spark.createDataFrame(
        _fixture_rows(),
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
    return d


# every swept family, representative keys; all must yield >0 rows on
# this fixture so the parity is exercised, not vacuous
TIE_KEYS = [
    # operators/windows.py (Spark window + applyInPandas kernels)
    "win_ewma",
    "win_cusum",
    "win_holt",
    "win_rolling_median",
    "win_sessionize",
    "win_time_range",
    "win_drawdown",
    "win_lag_ignore_nulls",
    # operators/aggregates.py
    "rollup_twap",
    "rollup_lttb",
    "agg_path_string",
    # operators/cep.py (rn window, struct-min, greedy-scan tiebreak)
    "cep_seq",
    "cep_seq_ids",
    "cep_kleene",
    "cep_skip_to_last",
    # operators/cep_sql.py (nav window, match numbering)
    "cep_sql_prev",
    "cep_sql_match_number",
    "cep_sql_classifier",
    # operators/graph.py
    "graph_transitions",
    # functions/udfs.py
    "grouped_map",
    # streaming/windows.py batch twins
    "stream_dedup",
    "stream_sessionize",
    "stream_topk",
]


@pytest.mark.parametrize("key", TIE_KEYS)
def test_null_id_tie_parity(spark, tie_dir, key):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tie_dir}/events.parquet/*.parquet')"
        )
        sdf = QUERIES[key](spark, tie_dir).toPandas()
        odf = con.execute(ORACLES[key]).fetchdf()
    finally:
        con.close()
    a, b = normalize(sdf), normalize(odf)
    ok, why, _warns = frames_equal(a, b, tol=0.0)
    assert ok, (key, why)
    assert len(a) > 0, f"{key}: parity vacuous — fixture yields no rows"


def test_tie_fixture_order_actually_matters(spark, tie_dir):
    """Referee for the battery itself: flipping the tie order (NULLS
    LAST instead of the NULL->0 convention) must change at least one
    checked key's output on this fixture — otherwise the battery can't
    catch the class it exists for. win_ewma's recurrence reads the
    tied 900.x value either before or after its same-ts partner."""
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tie_dir}/events.parquet/*.parquet')"
        )
        good = ORACLES["win_ewma"]
        assert "coalesce(event_id, 0)" in good
        flipped = good.replace(
            "coalesce(event_id, 0)", "event_id NULLS LAST"
        )
        a = normalize(con.execute(good).fetchdf())
        b = normalize(con.execute(flipped).fetchdf())
    finally:
        con.close()
    ok, _why, _ = frames_equal(a, b, tol=0.0)
    assert not ok, "tie order does not affect win_ewma on this fixture"


def test_count_over_column_rejected_pointed(spark, tie_dir):
    """COUNT(B.col) in a DEFINE run-cap is REJECTED with a pointed
    error (round-8 ADVICE): the kernel's cap counts bound ROWS, so
    silently accepting COUNT(B.col) would give it COUNT(B.*) semantics
    while SQL's COUNT(col) skips NULLs — a lie, not a feature."""
    from spark_cep_spark.operators.cep_sql import match_recognize
    from spark_cep_spark.operators.relational import table

    events = table(spark, tie_dir, "events")
    with pytest.raises(ValueError, match=r"COUNT.*column.*COUNT\(B"):
        match_recognize(
            events,
            """
            PATTERN ( A -> B+ )
            WITHIN 7 DAYS
            DEFINE A AS event_type = 'signup',
                   B AS event_type = 'view' AND COUNT(B.value) <= 3
            PARTITION BY user_id
            ORDER BY ts
            """,
        )
