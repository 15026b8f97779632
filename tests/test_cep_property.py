"""Property-based verification of the CEP NFA core (SURVEY §5.4).

advance_nfa (streaming/nfa.py) is the pure matching kernel inside the
stateful streaming operator. Hypothesis checks it against a brute-force
matcher that literally implements the batch compiler's definition
(operators/cep.py: per anchor, bind each step to the EARLIEST event
with ts strictly after the previous step and within anchor+bound), and
checks micro-batch invariance: feeding the same ordered stream in any
chunking yields identical matches. No SparkSession involved — thousands
of cases run in seconds.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spark_cep_spark.streaming.nfa import (
    advance_absence,
    advance_nfa,
    advance_nfa_full,
)

N_TYPES = 3  # event types 0..2; pattern = type0 -> type1 [-> type2]


def brute_force(events, n_steps, bound):
    """Direct transcription of Pattern.compile_batch semantics."""
    matches = []
    for ts0, eid, m in events:
        if not m[0]:
            continue
        bound_ts = [ts0]
        ok = True
        for step in range(1, n_steps):
            cands = [
                ts
                for ts, _e, mm in events
                if mm[step] and ts > bound_ts[-1] and ts <= ts0 + bound
            ]
            if not cands:
                ok = False
                break
            bound_ts.append(min(cands))
        if ok:
            matches.append((eid, bound_ts))
    return sorted(matches)


@st.composite
def event_streams(draw):
    n = draw(st.integers(min_value=0, max_value=18))
    rows = []
    for eid in range(n):
        ts = draw(st.integers(min_value=0, max_value=30))
        typ = draw(st.integers(min_value=0, max_value=N_TYPES - 1))
        rows.append((ts, eid, typ))
    rows.sort()
    return rows


def with_flags(rows, steps):
    return [(ts, eid, [typ == s for s in steps]) for ts, eid, typ in rows]


@given(
    rows=event_streams(),
    steps=st.lists(
        st.integers(min_value=0, max_value=N_TYPES - 1), min_size=2, max_size=3
    ),
    bound=st.integers(min_value=1, max_value=25),
)
@settings(max_examples=400, deadline=None)
def test_nfa_matches_brute_force(rows, steps, bound):
    events = with_flags(rows, steps)
    _, matches = advance_nfa([], events, len(steps), bound)
    assert sorted(matches) == brute_force(events, len(steps), bound)


@given(
    rows=event_streams(),
    steps=st.lists(
        st.integers(min_value=0, max_value=N_TYPES - 1), min_size=2, max_size=3
    ),
    bound=st.integers(min_value=1, max_value=25),
    cuts=st.lists(st.integers(min_value=0, max_value=18), max_size=4),
)
@settings(max_examples=400, deadline=None)
def test_nfa_chunking_invariance(rows, steps, bound, cuts):
    """Micro-batch boundaries are semantically invisible: any split of
    the ordered stream through the incremental kernel equals one shot.
    (Partial matches carry across chunks via the state argument — this
    is exactly what applyInPandasWithState persists between batches.)"""
    events = with_flags(rows, steps)
    _, want = advance_nfa([], events, len(steps), bound)

    bounds = sorted({c for c in cuts if c <= len(events)})
    chunks, prev = [], 0
    for c in bounds + [len(events)]:
        chunks.append(events[prev:c])
        prev = c
    partials, got = [], []
    for ch in chunks:
        partials, m = advance_nfa(partials, ch, len(steps), bound)
        got.extend(m)
    assert sorted(got) == sorted(want)


# ---------------------------------------------------------------------------
# Generalized kernel (advance_nfa_full): strict / relaxed / terminal
# negation, against a literal transcription of compile_batch


def _last(bound_entry):
    """Last-bound ts of an entry: [ts, eid] or [f_ts, f_eid, l_ts,
    l_eid, count]."""
    return bound_entry[2] if len(bound_entry) == 5 else bound_entry[0]


def env_from_bound(events, bound_ts, env_names):
    """Rebuild the kernel's env (bound values per referenced step) from
    a brute-force binding: plain entries [ts, eid] → that event's value
    dict; kleene entries [f_ts, f_eid, l_ts, l_eid, n] → the one-pass
    aggregate state [first, last, min, max, sum, count] over the run's
    members (everything between entry and close matches by
    construction — a non-matching event would have closed the run)."""
    env = {}
    if not env_names:
        return env
    by_eid = {e[1]: e for e in events}
    for si, entry in enumerate(bound_ts):
        nm = env_names[si] if si < len(env_names) else None
        if not nm:
            continue
        if len(entry) == 5:
            lo, hi = (entry[0], entry[1]), (entry[2], entry[3])
            vals = [e[3][0] for e in events if lo <= (e[0], e[1]) <= hi]
            env[nm] = {
                "value": [
                    vals[0],
                    vals[-1],
                    min(vals),
                    max(vals),
                    sum(vals),
                    len(vals),
                ]
            }
        else:
            env[nm] = {"value": by_eid[entry[1]][3][0]}
    return env


def brute_force_full(
    events, contig, bound, wm, corr_idx=None, corr_fn=None, env_names=None,
    gaps=None,
):
    """Transcription of Pattern.compile_batch over the full (ts, eid)-
    ordered key sequence: relaxed = earliest (ts, position) qualifying
    follower; strict = the next sequence position binds or the match
    dies; kleene = earliest qualifying entry then the maximal
    immediately-consecutive matching run truncated at the bound (a
    TERMINAL run emits only once provably closed: a next-position event
    exists, or the deadline passed the watermark); absent (terminal) =
    no qualifying follower in (t_last, t_anchor+bound], emitted only
    once the deadline passed the watermark.

    Cross-step correlation: corr_idx names one step whose binding
    additionally requires corr_fn(cand_vals, env) — the kernel's exact
    predicate signature, with env rebuilt from the partial binding via
    env_from_bound. Events then carry a 4th element [value]. corr_idx
    may be the absent step (a killer must also satisfy it)."""
    n_pos = len(contig) - 1 if contig[-1] == "absent" else len(contig)
    has_neg = n_pos < len(contig)

    def _gap_ok(step, ts, last_ts):
        return gaps is None or gaps[step] is None or ts <= last_ts + gaps[step]

    def _corr(step, j, bound_ts):
        if corr_idx is None or step != corr_idx:
            return True
        return corr_fn(
            {"value": events[j][3][0]},
            env_from_bound(events, bound_ts, env_names),
        )

    out = []
    for idx, ev in enumerate(events):
        ts0, eid, m = ev[0], ev[1], ev[2]
        if not m[0]:
            continue
        bound_ts, last_pos, ok = [[ts0, eid]], idx, True
        for step in range(1, n_pos):
            if contig[step] == "strict":
                nxt = last_pos + 1
                if (
                    nxt < len(events)
                    and events[nxt][2][step]
                    and events[nxt][0] <= ts0 + bound
                    and _gap_ok(step, events[nxt][0], _last(bound_ts[-1]))
                    and _corr(step, nxt, bound_ts)
                ):
                    bound_ts.append([events[nxt][0], events[nxt][1]])
                    last_pos = nxt
                else:
                    ok = False
                    break
            elif contig[step] == "kleene":
                cands = [
                    (e[0], j)
                    for j, e in enumerate(events)
                    if e[2][step]
                    and e[0] > _last(bound_ts[-1])
                    and e[0] <= ts0 + bound
                ]
                if not cands:
                    ok = False
                    break
                t, j = min(cands)
                first, f_eid, count, last_pos = t, events[j][1], 1, j
                last, l_eid = t, f_eid
                while (
                    last_pos + 1 < len(events)
                    and events[last_pos + 1][2][step]
                    and events[last_pos + 1][0] <= ts0 + bound
                ):
                    last_pos += 1
                    last, l_eid = events[last_pos][0], events[last_pos][1]
                    count += 1
                bound_ts.append([first, f_eid, last, l_eid, count])
            else:
                cands = [
                    (e[0], j)
                    for j, e in enumerate(events)
                    if e[2][step]
                    and e[0] > _last(bound_ts[-1])
                    and e[0] <= ts0 + bound
                    and _gap_ok(step, e[0], _last(bound_ts[-1]))
                    and _corr(step, j, bound_ts)
                ]
                if not cands:
                    ok = False
                    break
                t, j = min(cands)
                bound_ts.append([t, events[j][1]])
                last_pos = j
        if not ok:
            continue
        if contig[n_pos - 1] == "kleene" and n_pos == len(contig):
            # terminal run: emitted only once provably closed
            closed = last_pos + 1 < len(events) or ts0 + bound <= wm
            if not closed:
                continue
        if has_neg:
            if ts0 + bound > wm:
                continue  # absence not yet provable
            killed = any(
                e[2][n_pos]
                and _last(bound_ts[-1]) < e[0] <= ts0 + bound
                and _gap_ok(n_pos, e[0], _last(bound_ts[-1]))
                and _corr(n_pos, j, bound_ts)
                for j, e in enumerate(events)
            )
            if killed:
                continue
        out.append((eid, bound_ts))
    return sorted(out)


@st.composite
def contiguities(draw):
    n = draw(st.integers(min_value=2, max_value=3))
    contig = ["relaxed"] + [
        draw(st.sampled_from(["relaxed", "strict", "kleene"]))
        for _ in range(n - 1)
    ]
    if draw(st.booleans()):
        contig.append("absent")
    return contig


@given(
    rows=event_streams(),
    contig=contiguities(),
    bound=st.integers(min_value=1, max_value=25),
    wm=st.integers(min_value=0, max_value=60),
)
@settings(max_examples=600, deadline=None)
def test_full_nfa_matches_brute_force(rows, contig, bound, wm):
    steps = [(i * 7 + 3) % N_TYPES for i in range(len(contig))]
    events = [e for e in with_flags(rows, steps) if e[0] <= wm]
    _, got = advance_nfa_full([], events, contig, bound, wm)
    assert sorted(got) == brute_force_full(events, contig, bound, wm)


@given(
    rows=event_streams(),
    contig=contiguities(),
    bound=st.integers(min_value=1, max_value=25),
    wms=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=5),
)
@settings(max_examples=600, deadline=None)
def test_full_nfa_chunking_invariance(rows, contig, bound, wms):
    """Any monotone watermark schedule through the incremental kernel
    equals one shot at the final watermark — micro-batch boundaries and
    timer firings are semantically invisible for every contiguity mix."""
    steps = [(i * 7 + 3) % N_TYPES for i in range(len(contig))]
    events = with_flags(rows, steps)
    wms = sorted(set(wms))
    final_wm = wms[-1]
    matured_all = [e for e in events if e[0] <= final_wm]
    _, want = advance_nfa_full([], matured_all, contig, bound, final_wm)

    partials, got, fed = [], [], set()
    for wm in wms:
        chunk = sorted(e for e in events if e[0] <= wm and e[1] not in fed)
        fed.update(e[1] for e in chunk)
        partials, m = advance_nfa_full(partials, chunk, contig, bound, wm)
        got.extend(m)
    assert sorted(got) == sorted(want)


# ---------------------------------------------------------------------------
# Cross-step correlation (where clauses): kernel vs brute force

_OPS = {
    ">": lambda a, b: a > b,
    "<": lambda a, b: a < b,
    ">=": lambda a, b: a >= b,
    "==": lambda a, b: a == b,
}


def _corr_setup(rows, contig, values, op_name, ci_seed):
    """Pick a correlation-eligible step (non-kleene, non-anchor —
    possibly the absent step) and build the kernel-side corr/env
    arrays plus valued events. Returns None if the contiguity mix has
    no eligible step."""
    eligible = [i for i in range(1, len(contig)) if contig[i] != "kleene"]
    if not eligible:
        return None
    ci = eligible[ci_seed % len(eligible)]
    op = _OPS[op_name]
    steps = [(i * 7 + 3) % N_TYPES for i in range(len(contig))]
    events = [
        (ts, eid, [typ == s for s in steps], [values[eid % len(values)]])
        for ts, eid, typ in rows
    ]
    corr = [None] * len(contig)
    corr[ci] = lambda cand, env: op(cand["value"], env["a"]["value"])
    env_names = [None] * len(contig)
    env_names[0] = "a"
    return ci, op, events, corr, env_names


@given(
    rows=event_streams(),
    contig=contiguities(),
    bound=st.integers(min_value=1, max_value=25),
    wm=st.integers(min_value=0, max_value=60),
    values=st.lists(
        st.integers(min_value=0, max_value=4), min_size=1, max_size=6
    ),
    op_name=st.sampled_from(sorted(_OPS)),
    ci_seed=st.integers(min_value=0, max_value=7),
)
@settings(max_examples=600, deadline=None)
def test_full_nfa_corr_matches_brute_force(
    rows, contig, bound, wm, values, op_name, ci_seed
):
    """Correlated binding (cand.value OP anchor.value on one step —
    relaxed, strict, or the negation step) against the brute-force
    transcription of the batch compiler's join-condition semantics."""
    setup = _corr_setup(rows, contig, values, op_name, ci_seed)
    if setup is None:
        return
    ci, op, events, corr, env_names = setup
    events = [e for e in events if e[0] <= wm]
    _, got = advance_nfa_full(
        [],
        events,
        contig,
        bound,
        wm,
        corr=corr,
        val_cols=("value",),
        env_names=env_names,
    )
    want = brute_force_full(
        events,
        contig,
        bound,
        wm,
        corr_idx=ci,
        corr_fn=corr[ci],
        env_names=env_names,
    )
    assert sorted(got) == want


@given(
    rows=event_streams(),
    contig=contiguities(),
    bound=st.integers(min_value=1, max_value=25),
    wms=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=5),
    values=st.lists(
        st.integers(min_value=0, max_value=4), min_size=1, max_size=6
    ),
    op_name=st.sampled_from(sorted(_OPS)),
    ci_seed=st.integers(min_value=0, max_value=7),
)
@settings(max_examples=400, deadline=None)
def test_full_nfa_corr_chunking_invariance(
    rows, contig, bound, wms, values, op_name, ci_seed
):
    """Correlation state (the env of bound values) must survive
    micro-batch boundaries: any watermark schedule equals one shot."""
    setup = _corr_setup(rows, contig, values, op_name, ci_seed)
    if setup is None:
        return
    _ci, _op, events, corr, env_names = setup
    kw = {"corr": corr, "val_cols": ("value",), "env_names": env_names}
    wms = sorted(set(wms))
    final_wm = wms[-1]
    matured_all = [e for e in events if e[0] <= final_wm]
    _, want = advance_nfa_full([], matured_all, contig, bound, final_wm, **kw)

    partials, got, fed = [], [], set()
    for wm in wms:
        chunk = sorted(e for e in events if e[0] <= wm and e[1] not in fed)
        fed.update(e[1] for e in chunk)
        partials, m = advance_nfa_full(partials, chunk, contig, bound, wm, **kw)
        got.extend(m)
    assert sorted(got) == sorted(want)


# ---------------------------------------------------------------------------
# Run aggregates (agg(K.col) over Kleene runs): kernel env state and
# correlated binding vs the brute force + env_from_bound recomputation

from spark_cep_spark.streaming.nfa import _AGG_IDX  # noqa: E402


def _runagg_setup(rows, contig, values, op_name, agg_name, seed):
    """Pick a kleene step and a later non-kleene step correlating on
    one of its run aggregates. None if the contiguity mix has no such
    pair."""
    kis = [i for i, c in enumerate(contig) if c == "kleene"]
    if not kis:
        return None
    ki = kis[seed % len(kis)]
    later = [i for i in range(ki + 1, len(contig)) if contig[i] != "kleene"]
    if not later:
        return None
    ci = later[seed % len(later)]
    op = _OPS[op_name]
    if agg_name == "avg":
        acc = lambda stt: stt[4] / stt[5]  # noqa: E731
    else:
        ai = _AGG_IDX[agg_name]
        acc = lambda stt: stt[ai]  # noqa: E731
    fn = lambda cand, env: op(cand["value"], acc(env["K"]["value"]))  # noqa: E731
    steps = [(i * 7 + 3) % N_TYPES for i in range(len(contig))]
    events = [
        (ts, eid, [typ == s for s in steps], [values[eid % len(values)]])
        for ts, eid, typ in rows
    ]
    corr = [None] * len(contig)
    corr[ci] = fn
    env_names = [None] * len(contig)
    env_names[ki] = "K"
    run_cols = [None] * len(contig)
    run_cols[ki] = ["value"]
    return ci, events, corr, env_names, run_cols


@given(
    rows=event_streams(),
    contig=contiguities(),
    bound=st.integers(min_value=1, max_value=25),
    wm=st.integers(min_value=0, max_value=60),
    values=st.lists(
        st.integers(min_value=0, max_value=4), min_size=1, max_size=6
    ),
    op_name=st.sampled_from(sorted(_OPS)),
    agg_name=st.sampled_from(["first", "last", "min", "max", "sum", "count", "avg"]),
    seed=st.integers(min_value=0, max_value=7),
)
@settings(max_examples=600, deadline=None)
def test_full_nfa_run_agg_corr_matches_brute_force(
    rows, contig, bound, wm, values, op_name, agg_name, seed
):
    """A later step correlating on a Kleene run's aggregate (all seven
    aggregate kinds) — kernel one-pass run state vs brute force with
    aggregates recomputed from the full run membership."""
    setup = _runagg_setup(rows, contig, values, op_name, agg_name, seed)
    if setup is None:
        return
    ci, events, corr, env_names, run_cols = setup
    events = [e for e in events if e[0] <= wm]
    _, got = advance_nfa_full(
        [],
        events,
        contig,
        bound,
        wm,
        corr=corr,
        val_cols=("value",),
        env_names=env_names,
        run_cols=run_cols,
    )
    want = brute_force_full(
        events,
        contig,
        bound,
        wm,
        corr_idx=ci,
        corr_fn=corr[ci],
        env_names=env_names,
    )
    assert sorted(got) == want


@given(
    rows=event_streams(),
    contig=contiguities(),
    bound=st.integers(min_value=1, max_value=25),
    wm=st.integers(min_value=0, max_value=60),
    values=st.lists(
        st.integers(min_value=0, max_value=4), min_size=1, max_size=6
    ),
)
@settings(max_examples=400, deadline=None)
def test_full_nfa_run_agg_env_matches_recomputation(
    rows, contig, bound, wm, values
):
    """Every emitted match's env (measures input) must equal the
    aggregate state recomputed from the run's full membership — for
    every kleene position, including terminal runs closed by the
    watermark."""
    kis = [i for i, c in enumerate(contig) if c == "kleene"]
    if not kis:
        return
    steps = [(i * 7 + 3) % N_TYPES for i in range(len(contig))]
    events = [
        (ts, eid, [typ == s for s in steps], [values[eid % len(values)]])
        for ts, eid, typ in rows
        if ts <= wm
    ]
    env_names = [
        f"K{i}" if c == "kleene" else None for i, c in enumerate(contig)
    ]
    env_names[0] = "A"  # plain-step env capture alongside runs
    run_cols = [["value"] if c == "kleene" else None for c in contig]
    _, got = advance_nfa_full(
        [],
        events,
        contig,
        bound,
        wm,
        val_cols=("value",),
        env_names=env_names,
        emit_env=True,
        run_cols=run_cols,
    )
    for _eid, bound_ts, env in got:
        assert env == env_from_bound(events, bound_ts, env_names)


@given(
    rows=event_streams(),
    steps=st.lists(
        st.integers(min_value=0, max_value=N_TYPES - 1), min_size=2, max_size=3
    ),
    bound=st.integers(min_value=1, max_value=25),
)
@settings(max_examples=300, deadline=None)
def test_full_nfa_relaxed_equals_legacy_kernel(rows, steps, bound):
    """All-relaxed patterns: the generalized kernel and the original
    advance_nfa are the same machine."""
    events = with_flags(rows, steps)
    _, legacy = advance_nfa([], events, len(steps), bound)
    _, full = advance_nfa_full(
        [], events, ["relaxed"] * len(steps), bound, 10**9
    )
    # full-kernel entries are [ts, eid]; legacy carries ts only
    full_ts = [(eid, [e[0] for e in bound_ts]) for eid, bound_ts in full]
    assert sorted(full_ts) == sorted(legacy)


# ---------------------------------------------------------------------------
# Absence kernel (cep_absence streaming face)


def brute_force_absence(events, wm, bound):
    """NOT EXISTS transcription: anchor emits iff no killer in
    (anchor_ts, anchor_ts+bound] AND its deadline has passed the
    watermark (otherwise a killer could still arrive)."""
    out = []
    for ts, eid, is_anchor, _ in events:
        if not is_anchor or ts + bound > wm:
            continue
        killed = any(
            k_ts
            for k_ts, _e, _a, is_killer in events
            if is_killer and ts < k_ts <= ts + bound
        )
        if not killed:
            out.append([ts, eid])
    return sorted(out)


@st.composite
def absence_streams(draw):
    n = draw(st.integers(min_value=0, max_value=18))
    rows = []
    for eid in range(n):
        ts = draw(st.integers(min_value=1, max_value=30))
        is_anchor = draw(st.booleans())
        is_killer = draw(st.booleans())
        rows.append([ts, eid, is_anchor, is_killer])
    rows.sort()
    return rows


@given(
    rows=absence_streams(),
    bound=st.integers(min_value=1, max_value=25),
    wm=st.integers(min_value=0, max_value=60),
)
@settings(max_examples=400, deadline=None)
def test_absence_matches_brute_force(rows, bound, wm):
    matured = [e for e in rows if e[0] <= wm]
    _, got = advance_absence([], matured, wm, bound)
    assert sorted(got) == brute_force_absence(matured, wm, bound)


@given(
    rows=absence_streams(),
    bound=st.integers(min_value=1, max_value=25),
    wms=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=5),
)
@settings(max_examples=400, deadline=None)
def test_absence_chunking_invariance(rows, bound, wms):
    """Feeding the stream under any monotone watermark schedule emits
    the same set as one shot at the final watermark (what makes the
    micro-batch + timer execution correct)."""
    wms = sorted(set(wms))
    final_wm = wms[-1]
    matured_all = [e for e in rows if e[0] <= final_wm]
    _, want = advance_absence([], matured_all, final_wm, bound)

    pending, got = [], []
    fed_ids = set()
    for wm in wms:
        chunk = sorted(e for e in rows if e[0] <= wm and e[1] not in fed_ids)
        fed_ids.update(e[1] for e in chunk)
        pending, em = advance_absence(pending, chunk, wm, bound)
        got.extend(em)
    assert sorted(got) == sorted(want)


# ---------------------------------------------------------------------------
# Kleene kernel (cep_kleene streaming face)


def brute_force_kleene(events, min_len):
    """Gaps-and-islands transcription: maximal runs of consecutive
    matches, emitted only when CLOSED by a non-matching event."""
    out, run = [], None
    for ts, _eid, m in events:
        if m:
            run = [ts, ts, 1] if run is None else [run[0], ts, run[2] + 1]
        else:
            if run is not None and run[2] >= min_len:
                out.append(run)
            run = None
    return sorted(out)


@st.composite
def kleene_streams(draw):
    n = draw(st.integers(min_value=0, max_value=20))
    rows = []
    for eid in range(n):
        ts = draw(st.integers(min_value=1, max_value=30))
        rows.append([ts, eid, draw(st.booleans())])
    rows.sort()
    return rows


@given(rows=kleene_streams(), min_len=st.integers(min_value=1, max_value=4))
@settings(max_examples=300, deadline=None)
def test_kleene_matches_brute_force(rows, min_len):
    from spark_cep_spark.streaming.nfa import advance_kleene

    _, got = advance_kleene(None, rows, min_len)
    assert sorted(got) == brute_force_kleene(rows, min_len)


@given(
    rows=kleene_streams(),
    min_len=st.integers(min_value=1, max_value=4),
    cuts=st.lists(st.integers(min_value=0, max_value=20), max_size=4),
)
@settings(max_examples=300, deadline=None)
def test_kleene_chunking_invariance(rows, min_len, cuts):
    from spark_cep_spark.streaming.nfa import advance_kleene

    _, want = advance_kleene(None, rows, min_len)
    bounds = sorted({c for c in cuts if c <= len(rows)})
    run, got, prev = None, [], 0
    for c in bounds + [len(rows)]:
        run, em = advance_kleene(run, rows[prev:c], min_len)
        got.extend(em)
        prev = c
    assert sorted(got) == sorted(want)


# ---------------------------------------------------------------------------
# Threshold kernel (cep_threshold streaming face)


def brute_force_threshold(events, factor, n_trail, min_trail):
    """ROWS BETWEEN n_trail PRECEDING AND 1 PRECEDING transcription."""
    out = []
    for i, (ts, eid, v) in enumerate(events):
        frame = events[max(0, i - n_trail): i]
        if len(frame) >= min_trail:
            avg = sum(x[2] for x in frame) / len(frame)
            if v > factor * avg:
                out.append([ts, eid, v, avg])
    return sorted(out)


@st.composite
def value_streams(draw):
    n = draw(st.integers(min_value=0, max_value=20))
    rows = []
    ts = 0
    for eid in range(n):
        ts += draw(st.integers(min_value=1, max_value=3))  # strictly increasing
        rows.append([ts, eid, float(draw(st.integers(min_value=0, max_value=20)))])
    return rows


@given(rows=value_streams(), factor=st.sampled_from([1.5, 3.0]))
@settings(max_examples=300, deadline=None)
def test_threshold_matches_brute_force(rows, factor):
    from spark_cep_spark.streaming.nfa import advance_threshold

    _, got = advance_threshold([], rows, factor, 5, 3)
    assert sorted(got) == brute_force_threshold(rows, factor, 5, 3)


@given(
    rows=value_streams(),
    factor=st.sampled_from([1.5, 3.0]),
    cuts=st.lists(st.integers(min_value=0, max_value=20), max_size=4),
)
@settings(max_examples=300, deadline=None)
def test_threshold_chunking_invariance(rows, factor, cuts):
    from spark_cep_spark.streaming.nfa import advance_threshold

    _, want = advance_threshold([], rows, factor, 5, 3)
    bounds = sorted({c for c in cuts if c <= len(rows)})
    tail, got, prev = [], [], 0
    for c in bounds + [len(rows)]:
        tail, em = advance_threshold(tail, rows[prev:c], factor, 5, 3)
        got.extend(em)
        prev = c
    assert sorted(got) == sorted(want)


def test_checkpoint_state_upgrade_and_incompatible_detection():
    """Versioned NFA checkpoint payloads: v1 partials ([bound,
    open_run], no env) upgrade in place; the pre-v1 shape
    ([anchor_eid, [ts...]] — int first element) must fail with a clear
    incompatible-checkpoint error, not a TypeError inside the kernel."""
    import pytest

    from spark_cep_spark.streaming.nfa import _upgrade_partials

    # v1: [bound, open_run] → env {} appended
    v1 = [[[[100, 7]], False], [[[100, 7], [200, 8, 250, 9, 3]], True]]
    up = _upgrade_partials(v1, "test")
    assert [len(p) for p in up] == [3, 3]
    assert all(p[2] == {} for p in up)
    # already-v2 partials pass through untouched
    v2 = [[[[100, 7]], False, {"view": {"value": 1.0}}]]
    assert _upgrade_partials(v2, "test") == v2
    # pre-v1: [anchor_eid, [ts...]] → loud failure
    with pytest.raises(ValueError, match="incompatible NFA checkpoint"):
        _upgrade_partials([[7, [100, 200]]], "test")


@st.composite
def where_clauses(draw):
    """Random restricted-grammar correlation clauses over steps p
    (current), v and c (bound), with values drawn from ints and NULL."""
    refs = ["p.value", "p.flag", "v.value", "c.flag"]

    def atom():
        a, b = draw(st.sampled_from(refs)), draw(st.sampled_from(refs))
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]))
        if draw(st.booleans()):
            b = str(draw(st.integers(min_value=-3, max_value=3)))
        return f"{a} {op} {b}"

    expr = atom()
    for _ in range(draw(st.integers(min_value=0, max_value=3))):
        conn = draw(st.sampled_from(["AND", "OR"]))
        nxt = atom()
        if draw(st.booleans()):
            expr = f"NOT ({expr}) {conn} {nxt}"
        else:
            expr = f"({expr}) {conn} {nxt}"
    vals = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))
    env = {
        "p": {"value": draw(vals), "flag": draw(vals)},
        "v": {"value": draw(vals)},
        "c": {"flag": draw(vals)},
    }
    return expr, env


@given(wc=where_clauses())
@settings(max_examples=300, deadline=None)
def test_where_compiler_matches_sql_three_valued_logic(wc):
    """The NFA's compiled where-predicate must agree with real SQL
    evaluation (DuckDB) of the same clause under NULLs — full Kleene
    three-valued logic, with top-level UNKNOWN not satisfying the
    step. This is the differential guard for the batch F.expr parity
    (both engines implement standard SQL 3VL)."""
    import duckdb

    from spark_cep_spark.streaming.nfa import _compile_where_py

    expr, env = wc
    fn = _compile_where_py(expr, "p")
    cand = env["p"]
    bound_env = {k: v for k, v in env.items() if k != "p"}
    got = fn(cand, bound_env)

    sql = expr
    for step, cols in env.items():
        for col, val in cols.items():
            lit = "NULL" if val is None else str(val)
            sql = sql.replace(f"{step}.{col}", lit)
    want = duckdb.sql(f"SELECT ({sql})").fetchone()[0]
    assert got == (want is True), (expr, env, sql, got, want)


@st.composite
def agg_where_clauses(draw):
    """Random where clauses referencing Kleene-run aggregates
    first/last/min/max/sum/avg/count(K.value) — with NULL run members
    — alongside the current step p.value. The run state is built
    through the kernel's own _run_init/_run_extend fold."""
    members = draw(
        st.lists(
            st.one_of(st.none(), st.integers(min_value=-3, max_value=3)),
            min_size=1,
            max_size=6,
        )
    )
    aggs = ["first", "last", "min", "max", "sum", "avg", "count"]

    def atom():
        a = f"{draw(st.sampled_from(aggs))}(K.value)"
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "=", "<>"]))
        b = draw(
            st.sampled_from(
                [f"{draw(st.sampled_from(aggs))}(K.value)", "p.value"]
                + [str(i) for i in range(-3, 4)]
            )
        )
        return f"{a} {op} {b}"

    expr = atom()
    for _ in range(draw(st.integers(min_value=0, max_value=2))):
        conn = draw(st.sampled_from(["AND", "OR"]))
        nxt = atom()
        if draw(st.booleans()):
            expr = f"NOT ({expr}) {conn} {nxt}"
        else:
            expr = f"({expr}) {conn} {nxt}"
    p_val = draw(st.one_of(st.none(), st.integers(min_value=-3, max_value=3)))
    return expr, members, p_val


@given(wc=agg_where_clauses())
@settings(max_examples=300, deadline=None)
def test_agg_where_compiler_matches_sql_three_valued_logic(wc):
    """Kleene-run aggregate refs under NULL members must agree with
    real SQL aggregate semantics (DuckDB): first/last are positional
    (NULL included), min/max/sum/count skip NULLs, sum over an
    all-NULL run is NULL, avg = sum/count is NULL on a 0 count
    (division catches in _cmp3), and every comparison then combines
    per 3VL."""
    import duckdb

    from spark_cep_spark.streaming.nfa import (
        _compile_where_py,
        _run_extend,
        _run_init,
    )

    expr, members, p_val = wc
    state = _run_init(members[0])
    for v in members[1:]:
        state = _run_extend(state, v)
    env = {"K": {"value": state}}
    fn = _compile_where_py(expr, "p")
    got = fn({"value": p_val}, env)

    # DuckDB ground truth: aggregate the same run with real SQL
    # aggregates, then evaluate the clause with the results inlined.
    vals = ", ".join(
        f"({i}, {'NULL' if v is None else v})" for i, v in enumerate(members)
    )
    agg_row = duckdb.sql(
        "SELECT first(v ORDER BY i) AS f, last(v ORDER BY i) AS l, "
        "min(v) AS mn, max(v) AS mx, sum(v) AS s, count(v) AS c "
        f"FROM (VALUES {vals}) t(i, v)"
    ).fetchone()
    f, l, mn, mx, s, c = agg_row

    def lit(x):
        return "NULL" if x is None else str(x)

    sql = expr
    # avg as exact double division of the integer sum/count so both
    # engines do the identical IEEE operation (a decimal literal would
    # be parsed as DECIMAL and compare differently)
    sql = sql.replace("avg(K.value)", f"(CAST({lit(s)} AS DOUBLE) / {lit(c)})")
    for name, v in [
        ("first", f), ("last", l), ("min", mn),
        ("max", mx), ("sum", s), ("count", c),
    ]:
        sql = sql.replace(f"{name}(K.value)", lit(v))
    sql = sql.replace("p.value", lit(p_val))
    want = duckdb.sql(f"SELECT ({sql})").fetchone()[0]
    assert got == (want is True), (expr, members, p_val, sql, got, want)


@given(
    ts_list=st.lists(st.integers(min_value=0, max_value=300), max_size=25),
    cooldown=st.integers(min_value=1, max_value=60),
    cuts=st.lists(st.integers(min_value=0, max_value=25), max_size=4),
)
@settings(max_examples=300, deadline=None)
def test_throttle_kernel_chunking_invariance(ts_list, cooldown, cuts):
    """The throttle recurrence must be micro-batch-invariant and match
    the brute-force greedy suppression."""
    from spark_cep_spark.streaming.nfa import advance_throttle

    alerts = [[ts, i] for i, ts in enumerate(sorted(ts_list))]

    # brute force greedy
    want, cool = [], None
    for ts, aid in alerts:
        if cool is None or ts > cool:
            want.append([ts, aid])
            cool = ts + cooldown

    _, one_shot = advance_throttle(None, alerts, cooldown)
    assert one_shot == want

    bounds = sorted({c for c in cuts if c <= len(alerts)})
    state, got = None, []
    prev = 0
    for c in bounds + [len(alerts)]:
        state, kept = advance_throttle(state, alerts[prev:c], cooldown)
        got.extend(kept)
        prev = c
    assert got == want


def test_where_compiler_binds_bare_boolean_literals():
    """TRUE/FALSE/NULL literals are whitelisted by corr_plan and must
    be bound by the compilers (an unrewritten TRUE was a NameError in
    the streaming worker — round-4 review)."""
    from spark_cep_spark.streaming.nfa import _compile_where_py

    fn = _compile_where_py("c.value > v.value OR TRUE", "c")
    assert fn({"value": None}, {"v": {"value": None}}) is True
    fn2 = _compile_where_py("FALSE AND c.value > 0", "c")
    assert fn2({"value": 5}, {}) is False
    fn3 = _compile_where_py("c.value = NULL", "c")
    assert fn3({"value": 5}, {}) is False  # UNKNOWN does not satisfy


def test_measure_compiler_uses_three_valued_logic():
    """A NULL in one disjunct must not void the whole boolean measure
    (batch F.expr returns TRUE for UNKNOWN OR TRUE)."""
    from spark_cep_spark.streaming.nfa import _compile_measure_py

    fn = _compile_measure_py("v.value > c.value OR c.value > 0")
    assert fn({"v": {"value": None}, "c": {"value": 5}}) is True
    # arithmetic NULL still yields NULL
    fn2 = _compile_measure_py("v.value + c.value")
    assert fn2({"v": {"value": None}, "c": {"value": 5}}) is None


def test_py_serializes_timestamps_as_microseconds():
    """Correlation refs to timestamp columns must round-trip the JSON
    state payload (a raw pd.Timestamp crashed state.update)."""
    import json

    import pandas as pd

    from spark_cep_spark.streaming.nfa import _py

    t = pd.Timestamp("2024-01-01 00:00:00.123456")
    v = _py(t)
    assert isinstance(v, int)
    json.dumps(v)  # must not raise
    assert _py(pd.Timestamp("2024-01-01 00:00:00.123457")) == v + 1
    assert _py(pd.NaT) is None


def test_duplicate_step_names_rejected():
    import pytest as _pytest

    from spark_cep_spark.operators.cep import Pattern

    p = (
        Pattern.begin("a", "event_type = 'view'")
        .followed_by("a", "event_type = 'click'")
        .within("1 HOURS")
    )
    with _pytest.raises(ValueError, match="duplicate step name"):
        p.corr_plan()


def test_carried_column_name_collision_rejected():
    import pytest as _pytest

    from spark_cep_spark.operators.cep import Pattern

    # step 'err' with max(err.value) carries _v_err_max_value; a plain
    # step 'err_max' whose col 'value' is referenced carries the SAME
    # string
    p = (
        Pattern.begin("a", "event_type = 'view'")
        .one_or_more("err", "event_type = 'error'")
        .followed_by("err_max", "event_type = 'click'")
        .followed_by(
            "z",
            "event_type = 'purchase'",
            where="z.value > max(err.value) AND z.value > err_max.value",
        )
        .within("1 HOURS")
    )
    with _pytest.raises(ValueError, match="collision"):
        p.corr_plan()


# ---------------------------------------------------------------------------
# Per-step gap deadlines (Step.gap): kernel vs brute force


@st.composite
def gapped_contiguities(draw):
    """Contiguity mixes WITHOUT kleene (gaps are rejected on runs),
    plus a per-step gap list (None or a small deadline)."""
    n = draw(st.integers(min_value=2, max_value=3))
    contig = ["relaxed"] + [
        draw(st.sampled_from(["relaxed", "strict"])) for _ in range(n - 1)
    ]
    if draw(st.booleans()):
        contig.append("absent")
    gaps = [None] + [
        draw(st.one_of(st.none(), st.integers(min_value=1, max_value=12)))
        for _ in range(len(contig) - 1)
    ]
    return contig, gaps


@given(
    rows=event_streams(),
    cg=gapped_contiguities(),
    bound=st.integers(min_value=1, max_value=25),
    wm=st.integers(min_value=0, max_value=60),
)
@settings(max_examples=400, deadline=None)
def test_full_nfa_gaps_match_brute_force(rows, cg, bound, wm):
    contig, gaps = cg
    steps = [(i * 7 + 3) % N_TYPES for i in range(len(contig))]
    events = [e for e in with_flags(rows, steps) if e[0] <= wm]
    _, got = advance_nfa_full([], events, contig, bound, wm, gaps=gaps)
    assert sorted(got) == brute_force_full(
        events, contig, bound, wm, gaps=gaps
    )


@given(
    rows=event_streams(),
    cg=gapped_contiguities(),
    bound=st.integers(min_value=1, max_value=25),
    wms=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=5),
)
@settings(max_examples=400, deadline=None)
def test_full_nfa_gaps_chunking_invariance(rows, cg, bound, wms):
    contig, gaps = cg
    steps = [(i * 7 + 3) % N_TYPES for i in range(len(contig))]
    events = with_flags(rows, steps)
    wms = sorted(set(wms))
    final_wm = wms[-1]
    matured_all = [e for e in events if e[0] <= final_wm]
    _, want = advance_nfa_full(
        [], matured_all, contig, bound, final_wm, gaps=gaps
    )
    partials, got, fed = [], [], set()
    for wm in wms:
        chunk = sorted(e for e in events if e[0] <= wm and e[1] not in fed)
        fed.update(e[1] for e in chunk)
        partials, m = advance_nfa_full(
            partials, chunk, contig, bound, wm, gaps=gaps
        )
        got.extend(m)
    assert sorted(got) == sorted(want)


# ---------------------------------------------------------------------------
# Sessionize kernel: brute force + chunking invariance under random input


def brute_force_sessions(ts_list, gap, wm):
    """Independent reference sessionizer, deliberately NOT the kernel's
    fold: split points come from pairwise diffs of the sorted list
    (gaps-and-islands, the batch win_sessionize formulation) and
    segments are materialized wholesale — so a shared off-by-one in the
    kernel's gap or watermark-close comparison cannot hide."""
    ts_sorted = sorted(ts_list)
    if not ts_sorted:
        return None, []
    # boundary BEFORE index i iff the silence before it exceeds gap
    boundaries = [0] + [
        i
        for i in range(1, len(ts_sorted))
        if ts_sorted[i] - ts_sorted[i - 1] > gap
    ] + [len(ts_sorted)]
    segments = [
        ts_sorted[a:b] for a, b in zip(boundaries, boundaries[1:])
    ]
    sessions = [[seg[0], seg[-1], len(seg)] for seg in segments]
    # the last session stays OPEN unless the watermark proves no
    # extension can arrive
    if sessions and not (sessions[-1][1] + gap < wm):
        return sessions[-1], sessions[:-1]
    return None, sessions


@given(
    ts=st.lists(st.integers(min_value=0, max_value=300), min_size=0, max_size=40),
    gap=st.integers(min_value=1, max_value=50),
    wms=st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=5),
)
@settings(max_examples=400, deadline=None)
def test_sessionize_kernel_matches_brute_force(ts, gap, wms):
    from spark_cep_spark.streaming.nfa import advance_sessionize

    wms = sorted(set(wms))
    final_wm = wms[-1]
    evs = sorted([[t, i] for i, t in enumerate(ts)])
    matured_all = [e for e in evs if e[0] <= final_wm]
    want_state, want = brute_force_sessions(
        [e[0] for e in matured_all], gap, final_wm
    )
    # one shot
    st_, got = advance_sessionize(None, matured_all, gap, final_wm)
    assert got == want and st_ == want_state
    # incremental through a monotone watermark schedule
    state, got_inc, fed = None, [], set()
    for wm in wms:
        chunk = sorted(e for e in evs if e[0] <= wm and e[1] not in fed)
        fed.update(e[1] for e in chunk)
        state, c = advance_sessionize(state, chunk, gap, wm)
        got_inc.extend(c)
    assert got_inc == want and state == want_state


@given(
    rows=event_streams(),
    contig=contiguities(),
    bound=st.integers(min_value=1, max_value=25),
    wm=st.integers(min_value=0, max_value=60),
    values=st.lists(
        st.integers(min_value=0, max_value=4), min_size=1, max_size=6
    ),
    op_name=st.sampled_from(sorted(_OPS)),
    ci_seed=st.integers(min_value=0, max_value=7),
    gap_seed=st.lists(
        st.one_of(st.none(), st.integers(min_value=1, max_value=12)),
        min_size=4,
        max_size=4,
    ),
)
@settings(max_examples=400, deadline=None)
def test_full_nfa_corr_and_gaps_match_brute_force(
    rows, contig, bound, wm, values, op_name, ci_seed, gap_seed
):
    """Correlation AND per-step gaps together: a step may require both
    the bind-time value predicate and the per-transition deadline —
    the two conjuncts must compose identically in the kernel and the
    brute-force referee (gaps are independent of the env machinery,
    but only a combined run proves the conjunction order can't drop
    one)."""
    setup = _corr_setup(rows, contig, values, op_name, ci_seed)
    if setup is None:
        return
    ci, op, events, corr, env_names = setup
    # per-step gaps: never on the anchor, never on a kleene step
    gaps = [None] + [
        None if contig[i] == "kleene" else gap_seed[(i - 1) % len(gap_seed)]
        for i in range(1, len(contig))
    ]
    if all(g is None for g in gaps):
        gaps = None
    events = [e for e in events if e[0] <= wm]
    _, got = advance_nfa_full(
        [],
        events,
        contig,
        bound,
        wm,
        corr=corr,
        val_cols=("value",),
        env_names=env_names,
        gaps=gaps,
    )
    want = brute_force_full(
        events,
        contig,
        bound,
        wm,
        corr_idx=ci,
        corr_fn=corr[ci],
        env_names=env_names,
        gaps=gaps,
    )
    assert sorted(got) == want
