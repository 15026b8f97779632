"""Distribution-drift operators (operators/drift.py): PSI and binned
two-sample KS — identity and extreme-drift fixtures with exact
expected values, plus the streaming face (per-day PSI against a
static reference) equal to its batch twin under AvailableNow."""

from __future__ import annotations

import datetime as dt

import pytest

from spark_cep_spark.io import table
from spark_cep_spark.operators.drift import (
    agg_ks,
    agg_psi,
    drift_psi_day,
    drift_reference,
    stream_drift_psi,
)
from spark_cep_spark.streaming import harness

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
T0 = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(minutes=i), u, "view", v, "{}")
            for i, (u, v) in enumerate(rows)
        ],
        SCHEMA,
    )


def test_psi_zero_for_identical_cohorts(spark, sf_dir, tmp_path, monkeypatch):
    """Even (ref) and odd (cur) users with identical value multisets:
    every bin has p == q, so each term is exactly 0.0."""
    rows = [(0, 10.0), (0, 60.0), (0, 120.0), (1, 10.0), (1, 60.0), (1, 120.0)]
    df = _events(spark, rows)
    d = str(tmp_path / "sf")
    import os

    os.makedirs(d, exist_ok=True)
    src = os.path.join(sf_dir, "")
    for f in os.listdir(sf_dir):
        if f != "events.parquet":
            os.symlink(os.path.join(sf_dir, f), os.path.join(d, f))
    df.coalesce(1).write.parquet(os.path.join(d, "_ev"))
    part = next(
        p for p in os.listdir(os.path.join(d, "_ev")) if p.endswith(".parquet")
    )
    os.rename(
        os.path.join(d, "_ev", part), os.path.join(d, "events.parquet")
    )
    out = {r["event_type"]: r for r in agg_psi(spark, d).collect()}
    assert out["view"]["psi"] == 0.0
    assert out["view"]["ref_n"] == 3 and out["view"]["cur_n"] == 3
    ks = {r["event_type"]: r for r in agg_ks(spark, d).collect()}
    assert ks["view"]["ks"] == 0.0


def test_ks_one_for_disjoint_supports(spark, tmp_path, sf_dir):
    """Reference entirely in the bottom bin, current entirely in the
    top bin: the ECDFs separate completely, D = 1.0 exactly (the
    integer cross-multiplied max hits rt*ct)."""
    import os

    rows = [(0, 1.0), (0, 2.0), (1, 480.0), (1, 470.0), (1, 460.0)]
    df = _events(spark, rows)
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    for f in os.listdir(sf_dir):
        if f != "events.parquet":
            os.symlink(os.path.join(sf_dir, f), os.path.join(d, f))
    df.coalesce(1).write.parquet(os.path.join(d, "_ev"))
    part = next(
        p for p in os.listdir(os.path.join(d, "_ev")) if p.endswith(".parquet")
    )
    os.rename(
        os.path.join(d, "_ev", part), os.path.join(d, "events.parquet")
    )
    ks = {r["event_type"]: r for r in agg_ks(spark, d).collect()}
    assert ks["view"]["ks"] == 1.0
    psi = {r["event_type"]: r for r in agg_psi(spark, d).collect()}
    assert psi["view"]["psi"] > 0.25  # far past the alert threshold


def test_psi_fixture_bounds(spark, sf_dir):
    """On the real fixture: PSI finite and non-negative per type, KS
    in [0, 1], cohort counts partition the non-null rows."""
    import math

    psi = agg_psi(spark, sf_dir).collect()
    assert len(psi) == 5
    for r in psi:
        assert r["psi"] >= 0.0 and math.isfinite(r["psi"])
    ks = agg_ks(spark, sf_dir).collect()
    for r in ks:
        assert 0.0 <= r["ks"] <= 1.0
    total = (
        table(spark, sf_dir, "events")
        .filter("value IS NOT NULL")
        .count()
    )
    assert sum(r["ref_n"] + r["cur_n"] for r in psi) == total


def test_drift_psi_stream_equals_batch(spark, sf_dir):
    """The streaming face: per-day PSI over a watermarked stream
    against the static reference equals the registered batch twin —
    one stateful windowed aggregation, then a stateless broadcast
    join + the fixed-order PSI projection."""
    staged = harness.stage_events_files(spark, sf_dir, n_files=8)
    stream = harness.events_stream(
        spark, staged, max_files_per_trigger=2
    ).withWatermark("ts", "35 days")
    ref = drift_reference(table(spark, sf_dir, "events"))
    got = harness.run_available_now(
        drift_psi_day(stream, ref), "complete"
    )
    want = stream_drift_psi(spark, sf_dir)
    cols = ["day", "n_day", "psi"]
    g = got.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
    w = want.select(*cols).toPandas().sort_values(cols).reset_index(drop=True)
    assert g.equals(w)
    assert len(g) > 1


def test_ttest_zero_for_identical_cohorts(spark, sf_dir, tmp_path):
    """Even and odd cohorts with identical value multisets: means are
    equal so t == 0.0 exactly; equal variances and sizes give the
    textbook dof = 2(n-1)."""
    import os

    from spark_cep_spark.operators.drift import agg_ttest

    rows = [(0, 10.0), (0, 60.0), (0, 120.0), (1, 10.0), (1, 60.0), (1, 120.0)]
    df = _events(spark, rows)
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    for f in os.listdir(sf_dir):
        if f != "events.parquet":
            os.symlink(os.path.join(sf_dir, f), os.path.join(d, f))
    df.coalesce(1).write.parquet(os.path.join(d, "_ev"))
    part = next(
        p for p in os.listdir(os.path.join(d, "_ev")) if p.endswith(".parquet")
    )
    os.rename(os.path.join(d, "_ev", part), os.path.join(d, "events.parquet"))
    out = {r["event_type"]: r for r in agg_ttest(spark, d).collect()}
    assert out["view"]["t_stat"] == 0.0
    assert out["view"]["dof"] == 4.0  # equal var + equal n: 2(n-1)
    assert out["view"]["n1"] == 3 and out["view"]["n2"] == 3


def test_ttest_drops_undersized_cohorts(spark, sf_dir, tmp_path):
    """A cohort with one row has no variance — the group must drop,
    not divide by zero."""
    import os

    from spark_cep_spark.operators.drift import agg_ttest

    rows = [(0, 10.0), (0, 60.0), (1, 50.0)]  # odd cohort: 1 row
    df = _events(spark, rows)
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    for f in os.listdir(sf_dir):
        if f != "events.parquet":
            os.symlink(os.path.join(sf_dir, f), os.path.join(d, f))
    df.coalesce(1).write.parquet(os.path.join(d, "_ev"))
    part = next(
        p for p in os.listdir(os.path.join(d, "_ev")) if p.endswith(".parquet")
    )
    os.rename(os.path.join(d, "_ev", part), os.path.join(d, "events.parquet"))
    assert agg_ttest(spark, d).count() == 0


def test_chi2_zero_for_identical_cohorts(spark, sf_dir, tmp_path):
    """Identical cohort multisets: observed == expected in every cell,
    chi2 == 0.0 exactly; 3 distinct values land in 3 bins → dof 2."""
    import os

    from spark_cep_spark.operators.drift import agg_chi2

    rows = [(0, 10.0), (0, 60.0), (0, 120.0), (1, 10.0), (1, 60.0), (1, 120.0)]
    df = _events(spark, rows)
    d = str(tmp_path / "sf")
    os.makedirs(d, exist_ok=True)
    for f in os.listdir(sf_dir):
        if f != "events.parquet":
            os.symlink(os.path.join(sf_dir, f), os.path.join(d, f))
    df.coalesce(1).write.parquet(os.path.join(d, "_ev"))
    part = next(
        p for p in os.listdir(os.path.join(d, "_ev")) if p.endswith(".parquet")
    )
    os.rename(os.path.join(d, "_ev", part), os.path.join(d, "events.parquet"))
    out = {r["event_type"]: r for r in agg_chi2(spark, d).collect()}
    assert out["view"]["chi2"] == 0.0
    assert out["view"]["dof"] == 2
