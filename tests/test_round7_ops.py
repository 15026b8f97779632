"""Round-7 regression tests.

Covers the round-6 verdict's action items:
  1. win_rolling_corr signed-zero normalization (the one red row in
     CORRECTNESS_r06 — DuckDB's round(c,4) emitted -0.0 where Spark
     emitted +0.0; bit-level driver hash diverged).
  2. tools/check_oracle.values_equal bit-exact zero compare, so this
     defect class fails locally instead of in a driver round.
"""

import math


def test_values_equal_distinguishes_signed_zero():
    """The driver's value-hash is bit-level: -0.0 != +0.0. The local
    gate must agree (STANDING ORACLE RULE 4, registry.py)."""
    from tools.check_oracle import values_equal

    assert values_equal(0.0, 0.0)
    assert values_equal(-0.0, -0.0)
    assert not values_equal(-0.0, 0.0)
    assert not values_equal(0.0, -0.0)
    # nested containers recurse
    assert not values_equal((1, -0.0), (1, 0.0))
    # tolerance mode still treats them as equal (fuzzy gate unaffected)
    assert values_equal(-0.0, 0.0, tol=1e-9)


def test_rolling_corr_emits_no_negative_zero(spark, sf_dir):
    """Both the Spark face and the DuckDB oracle of win_rolling_corr
    normalize signed zero (round(c,4) + 0.0): no emitted trend_corr may
    carry a negative sign bit at zero, on either engine."""
    import duckdb

    from spark_cep_spark.registry import ORACLES, QUERIES, load_all

    load_all()
    rows = QUERIES["win_rolling_corr"](spark, sf_dir).collect()
    assert rows, "fixture produced no full 30-row frames"
    for r in rows:
        v = r["trend_corr"]
        if v is not None and v == 0.0:
            assert math.copysign(1.0, v) == 1.0, "Spark emitted -0.0"

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    oracle_rows = con.execute(ORACLES["win_rolling_corr"]).fetchall()
    assert len(oracle_rows) == len(rows)
    for row in oracle_rows:
        v = row[3]
        if v is not None and v == 0.0:
            assert math.copysign(1.0, v) == 1.0, "oracle emitted -0.0"
    con.close()


def test_trendcorr_kernel_normalizes_signed_zero():
    """The streaming kernel face must fold -0.0 the same way as the
    batch face, else streaming==batch breaks at the bit level."""
    from spark_cep_spark.streaming.nfa import advance_trendcorr

    # With x = [0,1,2]ms the corr sign is sign(y3 - y1); a tiny negative
    # y3-y1 against a large middle spread gives corr ≈ -8.7e-13, which
    # round(·,4) turns into -0.0 absent normalization (verified: the
    # un-normalized kernel emits copysign -1.0 on this exact fixture).
    rows = [
        [0, 0, 0.0],
        [1_000_000, 1, 1000.0],
        [2_000_000, 2, -1e-9],
    ]
    _, alerts = advance_trendcorr([], rows, window=3)
    assert len(alerts) == 1, "expected exactly one full-window emission"
    c = alerts[0][2]
    assert c == 0.0
    assert math.copysign(1.0, c) == 1.0, "kernel emitted -0.0"
