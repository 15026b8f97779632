"""Property-based verification of the round-6 kernels (SURVEY §5.4
style: pure functions vs literal brute-force transcriptions, no
SparkSession — hundreds of cases in seconds).

- advance_zscore (streaming/nfa.py): the rolling-z-score streaming
  kernel must equal a direct transcription of the batch frame
  definition (trailing 20 rows excluding current, count-of-rows
  history guard, nulls occupy slots but never score) under EVERY
  micro-batch chunking of the same ordered stream.
- the ntile closed form used by _distributed_ntile: tile assignment
  from (global_rank, n, k) must equal SQL ntile's
  floor-division-with-remainder rule for all (n, k).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_cep_spark.streaming.nfa import advance_zscore


def zscore_brute(rows, window=20, min_hist=10, thresh=3.0):
    out, hist = [], []
    for ts, eid, v in rows:
        ring = hist[-window:]
        vals = [x for x in ring if x is not None]
        if len(ring) >= min_hist and len(vals) >= 2 and v is not None:
            mu = sum(vals) / len(vals)
            sd = (sum((x - mu) ** 2 for x in vals) / (len(vals) - 1)) ** 0.5
            if sd > 1e-9 and abs(v - mu) > thresh * sd:
                out.append([eid, ts, v, round((v - mu) / sd, 4)])
        hist.append(v)
    return out


values = st.one_of(
    st.none(),
    st.floats(
        min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
    ),
    st.just(0.0),
    st.floats(min_value=900, max_value=1000),  # planted outliers
)


@settings(max_examples=200, deadline=None)
@given(
    vs=st.lists(values, min_size=0, max_size=80),
    cuts=st.lists(st.integers(min_value=0, max_value=80), max_size=4),
)
def test_zscore_kernel_brute_force_and_chunking(vs, cuts):
    rows = [[i * 1_000, i, v] for i, v in enumerate(vs)]
    want = zscore_brute(rows)

    _, whole = advance_zscore([], [r[:] for r in rows])
    assert whole == want

    bounds = sorted({c for c in cuts if c <= len(rows)})
    ring, got = [], []
    prev = 0
    for b in bounds + [len(rows)]:
        ring, alerts = advance_zscore(ring, [r[:] for r in rows[prev:b]])
        got.extend(alerts)
        prev = b
    assert got == want


def ntile_sql(rank, n, k):
    """SQL ntile's rule: first n%k tiles have floor(n/k)+1 rows."""
    q, r = divmod(n, k)
    fat = r * (q + 1)
    if rank <= fat:
        return (rank - 1) // (q + 1) + 1
    return r + (rank - fat - 1) // max(q, 1) + 1


@settings(max_examples=300, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=5000),
    k=st.integers(min_value=1, max_value=64),
)
def test_ntile_closed_form_partitions_correctly(n, k):
    """The closed form must produce k' = min(n, k) non-empty tiles with
    sizes differing by at most 1, larger tiles first, covering ranks
    1..n in order — the defining properties of SQL ntile."""
    tiles = [ntile_sql(r, n, k) for r in range(1, n + 1)]
    assert tiles == sorted(tiles)
    from collections import Counter

    sizes = Counter(tiles)
    if n == 0:
        assert not sizes
        return
    assert set(sizes) == set(range(1, min(n, k) + 1))
    counts = [sizes[t] for t in sorted(sizes)]
    assert max(counts) - min(counts) <= 1
    assert counts == sorted(counts, reverse=True)
    assert sum(counts) == n


# ------------------------------------------------------------------
# trend-run kernel vs brute force; CUSUM kernel vs brute force
# ------------------------------------------------------------------


def trendruns_brute(rows):
    """Literal transcription of the batch gaps-and-islands definition:
    per-event direction vs previous non-null value, maximal
    same-direction segments, emit segments of >= 2 transitions."""
    pts = [(ts, v) for ts, _e, v in rows if v is not None]
    dirs = []
    for i in range(1, len(pts)):
        a, b = pts[i - 1][1], pts[i][1]
        dirs.append((pts[i - 1], pts[i], 1 if b > a else (-1 if b < a else 0)))
    out, i = [], 0
    while i < len(dirs):
        d = dirs[i][2]
        j = i
        while j < len(dirs) and dirs[j][2] == d:
            j += 1
        n = j - i
        if d != 0 and n >= 2:
            start_pt, end_pt = dirs[i][0], dirs[j - 1][1]
            out.append(
                [d, start_pt[0], end_pt[0], n,
                 round(end_pt[1] - start_pt[1], 6)]
            )
        i = j
    return out


run_values = st.one_of(
    st.none(), st.integers(min_value=0, max_value=5).map(float)
)


@settings(max_examples=300, deadline=None)
@given(
    vs=st.lists(run_values, min_size=0, max_size=60),
    cuts=st.lists(st.integers(min_value=0, max_value=60), max_size=3),
)
def test_trendruns_kernel_brute_force_and_chunking(vs, cuts):
    from spark_cep_spark.streaming.nfa import advance_trendruns

    rows = [[i * 1000, i, v] for i, v in enumerate(vs)]
    want = trendruns_brute(rows)
    _, whole = advance_trendruns(None, [r[:] for r in rows])
    # the kernel holds the OPEN tail run; brute force closes at end of
    # data — whole must be a prefix of want missing at most the tail
    assert whole == want[: len(whole)]
    assert len(want) - len(whole) <= 1
    if len(want) != len(whole):
        # the held run really is still open: its last point is the
        # final non-null value
        d, s, e, n, delta = want[-1]
        assert e == max(ts for ts, _e2, v in rows if v is not None)

    bounds = sorted({c for c in cuts if c <= len(rows)})
    stt, got = None, []
    prev = 0
    for b in bounds + [len(rows)]:
        stt, part = advance_trendruns(stt, [r[:] for r in rows[prev:b]])
        got.extend(part)
        prev = b
    assert got == whole


@settings(max_examples=200, deadline=None)
@given(
    vs=st.lists(
        st.one_of(
            st.none(),
            st.floats(min_value=0, max_value=120, allow_nan=False),
        ),
        min_size=0,
        max_size=60,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=60), max_size=3),
)
def test_cusum_kernel_brute_force_and_chunking(vs, cuts):
    from spark_cep_spark.streaming.nfa import advance_cusum

    rows = [[i * 1000, i, v] for i, v in enumerate(vs)]
    s_hi = s_lo = 0.0
    want = []
    for ts, eid, v in rows:
        if v is None:
            continue
        s_hi = max(0.0, s_hi + (v - 50.0 - 5.0))
        s_lo = max(0.0, s_lo + (50.0 - v - 5.0))
        a = 1 if (s_hi > 25.0 or s_lo > 25.0) else 0
        want.append([eid, ts, v, s_hi, s_lo, a])
        if a:
            s_hi = s_lo = 0.0
    _, whole = advance_cusum(None, [r[:] for r in rows], 50.0)
    assert whole == want

    bounds = sorted({c for c in cuts if c <= len(rows)})
    stt, got = None, []
    prev = 0
    for b in bounds + [len(rows)]:
        stt, part = advance_cusum(stt, [r[:] for r in rows[prev:b]], 50.0)
        got.extend(part)
        prev = b
    assert got == whole


def vshape_brute(rows):
    """Brute-force Vs: pair each closed down run with the closed up run
    that starts at its end (the shared trough)."""
    runs = trendruns_brute(rows)
    out = []
    for i, (d, s, e, n, delta) in enumerate(runs):
        if d != -1:
            continue
        for d2, s2, e2, n2, delta2 in runs[i + 1:]:
            if s2 == e:
                if d2 == 1:
                    out.append([s, e, e2, n, n2, delta, delta2])
                break
    return out


@settings(max_examples=300, deadline=None)
@given(
    vs=st.lists(run_values, min_size=0, max_size=60),
    cuts=st.lists(st.integers(min_value=0, max_value=60), max_size=3),
)
def test_vshape_kernel_brute_force_and_chunking(vs, cuts):
    from spark_cep_spark.streaming.nfa import advance_vshape

    rows = [[i * 1000, i, v] for i, v in enumerate(vs)]
    want = vshape_brute(rows)
    _, whole = advance_vshape(None, [r[:] for r in rows])
    # the kernel never closes the tail run, so the V whose up leg is
    # the data's final run may still be pending — at most one missing,
    # and what IS emitted must be a prefix of the brute-force list
    assert whole == want[: len(whole)]
    assert len(want) - len(whole) <= 1

    bounds = sorted({c for c in cuts if c <= len(rows)})
    stt, got = None, []
    prev = 0
    for b in bounds + [len(rows)]:
        stt, part = advance_vshape(stt, [r[:] for r in rows[prev:b]])
        got.extend(part)
        prev = b
    assert got == whole


@settings(max_examples=300, deadline=None)
@given(
    vs=st.lists(
        st.one_of(
            st.none(),
            st.floats(min_value=-50, max_value=50, allow_nan=False),
        ),
        min_size=0,
        max_size=60,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=60), max_size=3),
)
def test_rollmedian_kernel_brute_force_and_chunking(vs, cuts):
    from spark_cep_spark.streaming.nfa import advance_rollmedian

    rows = [[i * 1000, i, v] for i, v in enumerate(vs)]

    def med(vals):
        n = len(vals)
        if n == 0:
            return None
        s = sorted(vals)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0

    want = []
    for i, (ts, eid, v) in enumerate(rows):
        frame = [r[2] for r in rows[max(0, i - 10): i + 1] if r[2] is not None]
        m = med(frame)
        d = med([abs(x - m) for x in frame]) if m is not None else None
        o = bool(
            v is not None and m is not None and len(frame) >= 7
            and d > 1e-12 and abs(v - m) > 3 * 1.4826 * d
        )
        want.append([eid, ts, v, m, d, o])

    _, whole = advance_rollmedian(None, [r[:] for r in rows])
    assert whole == want

    bounds = sorted({c for c in cuts if c <= len(rows)})
    stt, got = None, []
    prev = 0
    for b in bounds + [len(rows)]:
        stt, part = advance_rollmedian(stt, [r[:] for r in rows[prev:b]])
        got.extend(part)
        prev = b
    assert got == whole


@settings(max_examples=300, deadline=None)
@given(
    vs=st.lists(
        st.floats(min_value=-50, max_value=50, allow_nan=False),
        min_size=0,
        max_size=60,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=60), max_size=3),
)
def test_holt_kernel_brute_force_and_chunking(vs, cuts):
    from spark_cep_spark.streaming.nfa import advance_holt

    rows = [[i * 1000, i, v] for i, v in enumerate(vs)]
    want = []
    l = b = None
    for ts, eid, x in rows:
        if l is None:
            l, b = x, 0.0
        else:
            l2 = 0.5 * x + 0.5 * (l + b)
            b = 0.3 * (l2 - l) + 0.7 * b
            l = l2
        want.append([eid, ts, x, l, b, l + b])
    _, whole = advance_holt(None, [r[:] for r in rows])
    assert whole == want

    bounds = sorted({c for c in cuts if c <= len(rows)})
    stt, got = None, []
    prev = 0
    for bn in bounds + [len(rows)]:
        stt, part = advance_holt(stt, [r[:] for r in rows[prev:bn]])
        got.extend(part)
        prev = bn
    assert got == whole


# ------------------------------------------------------------------
# emb_pca_power kernel (pca_power_top_component) — pure numpy, no Spark
# ------------------------------------------------------------------


def test_pca_power_known_eigenvector():
    import numpy as np
    from spark_cep_spark.operators.llm_similarity import (
        pca_power_top_component,
    )

    # diagonal covariance: top component is the axis of max variance
    cov = np.diag([1.0, 5.0, 2.0])
    v, lam = pca_power_top_component(cov)
    assert abs(abs(v[1]) - 1.0) < 1e-9 and abs(lam - 5.0) < 1e-9
    # sign convention: first nonzero component positive
    assert v[np.flatnonzero(v)[0]] > 0


def test_pca_power_rayleigh_dominates_axes_and_determinism():
    import numpy as np
    from spark_cep_spark.operators.llm_similarity import (
        pca_power_top_component,
    )

    rng = np.random.RandomState(7)
    a = rng.randn(50, 8)
    cov = np.cov(a, rowvar=False, bias=True)
    v1, lam1 = pca_power_top_component(cov)
    v2, lam2 = pca_power_top_component(cov)
    assert (v1 == v2).all() and lam1 == lam2  # bit-identical reruns
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-12
    # the Rayleigh quotient dominates every coordinate axis variance
    assert lam1 >= cov.diagonal().max() - 1e-12
    # and matches eigh's top eigenvalue
    w = np.linalg.eigh(cov)[0][-1]
    assert abs(lam1 - w) < 1e-9
