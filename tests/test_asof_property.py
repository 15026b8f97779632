"""Property-based verification of the generic as-of join
(operators/joins.py:asof_join) against pandas merge_asof — the
independent reference implementation with published semantics
(backward search, allow_exact_matches ↔ strict).

Right sides are generated unique per (key, ts): both implementations
document tie-breaking among duplicate right timestamps as
order-dependent, so duplicates are excluded from the property (the
documented caveat, not a bug being hidden).
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spark_cep_spark.operators.joins import asof_join

row = st.tuples(st.integers(0, 3), st.integers(0, 40))  # (key, t)


@st.composite
def sides(draw):
    left = draw(st.lists(row, min_size=1, max_size=25))
    right_keys = draw(st.sets(row, min_size=0, max_size=25))  # unique (key, t)
    right = [(k, t, 100 * k + t) for k, t in sorted(right_keys)]
    return left, right


@pytest.mark.parametrize("strict", [False, True])
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=sides())
def test_asof_join_matches_pandas_merge_asof(spark, strict, data):
    left_rows, right_rows = data
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)], "key long, t long, lid long"
    )
    right = spark.createDataFrame(right_rows, "key long, t long, val long")

    got = (
        asof_join(left, right, by="key", left_on="t", right_on="t", strict=strict)
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)[["key", "t", "lid", "t_asof", "val_asof"]]
    )

    lp = pd.DataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left_rows)], columns=["key", "t", "lid"]
    ).sort_values("t", kind="stable")
    rp = pd.DataFrame(right_rows, columns=["key", "t", "val"]).sort_values(
        "t", kind="stable"
    )
    rp["t_right"] = rp["t"]
    if len(rp):
        want = pd.merge_asof(
            lp,
            rp,
            on="t",
            by="key",
            allow_exact_matches=not strict,
            suffixes=("", "_r"),
        ).rename(columns={"t_right": "t_asof", "val": "val_asof"})
    else:
        want = lp.assign(t_asof=pd.array([None] * len(lp), dtype="Int64"),
                         val_asof=pd.array([None] * len(lp), dtype="Int64"))
    want = want.sort_values("lid").reset_index(drop=True)[
        ["key", "t", "lid", "t_asof", "val_asof"]
    ]

    for c in ["t_asof", "val_asof"]:
        got[c] = got[c].astype("Int64")
        want[c] = want[c].astype("Int64")
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
