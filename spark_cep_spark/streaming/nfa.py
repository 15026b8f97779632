"""Streaming CEP: the Pattern NFA over applyInPandasWithState
(SURVEY §2.10, §7 M3 — the batch compiler in operators/cep.py is the
executable spec this is tested against).

Design
------
- Step predicates are evaluated JVM-side BEFORE the stateful operator
  (each event gets boolean columns m0..mk) — Python never parses SQL,
  and predicate evaluation stays in whole-stage codegen.
- Per key (user), the state holds (a) a buffer of events not yet
  matured past the watermark, (b) open partial matches. Each batch:
  new events are buffered; events with ts <= watermark are processed
  IN EVENT-TIME ORDER (the watermark guarantees no earlier event can
  still arrive, so order-sensitive semantics are safe); completed
  matches are emitted.
- Skip-till-next-match, earliest-bind: processing matured events in ts
  order and binding the first qualifying event per open partial is
  exactly the earliest-match policy of the batch compiler.
- An event-time timeout re-invokes the function when the watermark
  passes the earliest buffered event, so buffered events flush even if
  the key receives no further input.

Scale: state per key is O(buffered horizon + open partials within the
pattern's time bound) — bounded by the watermark delay and .within().
Keys shard across executors by the groupBy; RocksDB state store holds
the serialized state at 100 TB.
"""

from __future__ import annotations

import ast
import datetime
import json
import re
from typing import TYPE_CHECKING, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from spark_cep_spark.streaming.bucketed import bucketed_stateful_apply

if TYPE_CHECKING:  # only for typing; avoid circular import
    from spark_cep_spark.operators.cep import Pattern

_US_PER_MS = 1000


class _CodecProfiler:
    """Env-gated timing shim around the state codec (SCALE.md's NFA
    state-codec profile, round-6 verdict item 6). When
    SPARK_GRAFT_PROFILE_CODEC is set BEFORE the SparkSession starts
    (local-mode Python workers inherit the env), the module-global
    `json` is replaced with this proxy: every loads/dumps in the
    stateful operators is timed and the per-process running totals are
    flushed to /tmp/spark_graft_codec_<pid>.json every 20 calls.
    tools/profile_state_codec.py deletes the counter files between
    measured drains; a missing file RESETS this worker's totals
    (Python workers are reused across queries, so without the reset a
    measured drain would report the warm run's cumulative codec time
    too — review catch). Zero overhead when the env var is absent
    (the plain module is used); up to 19 trailing calls per worker
    stay unflushed, a documented under-count far inside the decision
    margin."""

    def __init__(self, mod):
        self._mod = mod
        self._t = 0.0
        self._n = 0
        self._bytes = 0
        self._flushed = False

    def _path(self):
        import os as _os

        return f"/tmp/spark_graft_codec_{_os.getpid()}.json"

    def _tick(self, dt, nbytes):
        import os as _os

        # reset only when a PREVIOUSLY FLUSHED file has vanished (the
        # profiler's between-drain clear) — checking bare existence
        # would re-reset on every call before the first flush and the
        # counter could never reach the flush threshold
        if self._flushed and not _os.path.exists(self._path()):
            self._t = 0.0
            self._n = 0
            self._bytes = 0
            self._flushed = False
        self._t += dt
        self._n += 1
        self._bytes += nbytes
        if self._n % 20 == 0:
            with open(self._path(), "w") as f:
                self._mod.dump(
                    {
                        "sec": self._t,
                        "calls": self._n,
                        "bytes": self._bytes,
                    },
                    f,
                )
            self._flushed = True

    def loads(self, s):
        import time as _time

        t0 = _time.perf_counter()
        out = self._mod.loads(s)
        self._tick(_time.perf_counter() - t0, len(s))
        return out

    def dumps(self, obj):
        import time as _time

        t0 = _time.perf_counter()
        out = self._mod.dumps(obj)
        self._tick(_time.perf_counter() - t0, len(out))
        return out


import os as _os_codec_gate  # noqa: E402

if _os_codec_gate.environ.get("SPARK_GRAFT_PROFILE_CODEC"):
    json = _CodecProfiler(json)  # type: ignore[assignment]


def _interval_to_ms(bound: str) -> int:
    """'24 HOURS' / '30 MINUTES' / '7 DAYS' → milliseconds."""
    qty_s, unit = bound.strip().split()
    qty = float(qty_s)
    unit = unit.upper().rstrip("S")
    factor = {
        "SECOND": 1_000,
        "MINUTE": 60_000,
        "HOUR": 3_600_000,
        "DAY": 86_400_000,
    }[unit]
    return int(qty * factor)


def _py(x):
    """Pandas/numpy scalar → JSON-serializable Python value (state is
    a JSON payload; NaN/NaT → None, which makes every comparison
    unsatisfied — SQL three-valued logic). Timestamps are carried as
    integer microseconds: comparisons between two timestamp refs keep
    their ordering, and the value round-trips through json.dumps
    (a raw pd.Timestamp crashed state.update — round-4 review)."""
    if pd.isna(x):
        return None
    if isinstance(x, pd.Timestamp):
        return x.value // 1_000  # ns -> us
    if isinstance(x, datetime.datetime):
        return int(x.timestamp() * 1_000_000)
    return x.item() if hasattr(x, "item") else x


def advance_nfa(
    partials: list,
    matured: list,
    n_steps: int,
    bound_us: int,
) -> tuple[list, list]:
    """The NFA core, pure and incremental: feed matured events (in
    event-time order) through the open partial matches.

    partials: [[anchor_eid, [t0_us..ti_us]], ...] open partial matches
    matured:  [[ts_us, eid, [m0..mk]], ...] events whose ts has passed
              the watermark, sorted ascending
    Returns (partials', matches) where matches = [(anchor_eid, [t0..tn])].

    Semantics = the batch compiler's (operators/cep.py): skip-till-next-
    match, earliest-bind, strict ts ordering between steps, whole match
    within anchor_ts + bound. Chunking invariance — feeding events in
    any split of the same ordered stream yields identical matches — is
    property-tested (tests/test_cep_property.py), which is what makes
    micro-batch boundaries semantically invisible.
    """
    matches = []
    for ts, eid, m in matured:
        # advance open partials first (an event may both extend a
        # partial and anchor a new one)
        kept = []
        for anchor_eid, bound_ts in partials:
            nxt = len(bound_ts)
            if ts > bound_ts[0] + bound_us:
                continue  # expired
            if ts > bound_ts[-1] and m[nxt]:
                bound_ts = bound_ts + [ts]
                if len(bound_ts) == n_steps:
                    matches.append((anchor_eid, bound_ts))
                    continue
            kept.append([anchor_eid, bound_ts])
        partials = kept
        if m[0]:
            partials.append([eid, [ts]])
    return partials, matches


def _cmp3(fa, op: str, fb):
    """SQL three-valued comparison: evaluate each operand expression
    (a NULL operand inside arithmetic raises TypeError → NULL), then
    compare — any NULL operand makes the comparison UNKNOWN (None),
    including NULL = NULL (Python would say True)."""
    try:
        a = fa()
    except (TypeError, ZeroDivisionError):
        return None
    try:
        b = fb()
    except (TypeError, ZeroDivisionError):
        return None
    if a is None or b is None:
        return None
    try:
        return _CMP_OPS[op](a, b)
    except TypeError:
        return None


_CMP_OPS = {
    "==": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
}


def _and3(*vs):
    """Kleene AND over True/False/None (UNKNOWN)."""
    if any(v is False for v in vs):
        return False
    if any(v is None for v in vs):
        return None
    return True


def _or3(*vs):
    """Kleene OR over True/False/None (UNKNOWN)."""
    if any(v is True for v in vs):
        return True
    if any(v is None for v in vs):
        return None
    return False


def _not3(v):
    return None if v is None else not v


class _ThreeValTransform(ast.NodeTransformer):
    """Rewrite a restricted boolean expression for SQL three-valued
    logic: comparisons route through _cmp3 (operands deferred in
    lambdas so NULL arithmetic is caught per-comparison), and/or/not
    become the Kleene combinators. The grammar (enforced by
    Pattern.corr_plan) guarantees booleans appear only at comparison /
    and / or / not level, never inside arithmetic."""

    def visit_BoolOp(self, node: ast.BoolOp):
        values = [self.visit(v) for v in node.values]
        name = "_and3" if isinstance(node.op, ast.And) else "_or3"
        return ast.Call(
            func=ast.Name(id=name, ctx=ast.Load()), args=values, keywords=[]
        )

    def visit_UnaryOp(self, node: ast.UnaryOp):
        if isinstance(node.op, ast.Not):
            return ast.Call(
                func=ast.Name(id="_not3", ctx=ast.Load()),
                args=[self.visit(node.operand)],
                keywords=[],
            )
        return node  # arithmetic unary (e.g. -x): leave untouched

    def visit_Compare(self, node: ast.Compare):
        # pairwise expansion keeps chained comparisons (a < b < c) SQL-true
        _OPMAP = {
            ast.Eq: "==",
            ast.NotEq: "!=",
            ast.Lt: "<",
            ast.LtE: "<=",
            ast.Gt: ">",
            ast.GtE: ">=",
        }
        operands = [node.left] + node.comparators
        calls = []
        for left, op, right in zip(operands, node.ops, operands[1:]):
            calls.append(
                ast.Call(
                    func=ast.Name(id="_cmp3", ctx=ast.Load()),
                    args=[
                        _lambda0(left),
                        ast.Constant(value=_OPMAP[type(op)]),
                        _lambda0(right),
                    ],
                    keywords=[],
                )
            )
        if len(calls) == 1:
            return calls[0]
        return ast.Call(
            func=ast.Name(id="_and3", ctx=ast.Load()), args=calls, keywords=[]
        )


def _lambda0(body: ast.expr) -> ast.Lambda:
    return ast.Lambda(
        args=ast.arguments(
            posonlyargs=[], args=[], kwonlyargs=[], kw_defaults=[], defaults=[]
        ),
        body=body,
    )


def _compile_where_py(where: str, cur_name: str):
    """Compile a correlation clause to a Python predicate
    fn(cand_vals: dict, env: dict[step, dict]) -> bool for the NFA
    kernel — the Python twin of operators.cep._translate_where_sql
    (batch). The restricted grammar (comparison / arithmetic / AND /
    OR / NOT / abs, every column step-qualified — enforced by
    Pattern.corr_plan) is what keeps the two translations provably
    aligned; the batch compiler is the spec, and the fixture parity
    test compares the two end-to-end.

    NULL handling is FULL SQL three-valued logic, matching the batch
    F.expr semantics: each comparison with a NULL operand is UNKNOWN,
    and/or/not combine per Kleene logic (NULL OR TRUE = TRUE — a NULL
    in one disjunct must not veto another), and a top-level UNKNOWN
    does not satisfy the step."""
    from spark_cep_spark.operators.cep import _WHERE_REF

    def repl(mo: re.Match) -> str:
        s, c = mo.group(1), mo.group(2)
        return f"__c[{c!r}]" if s == cur_name else f"__e[{s!r}][{c!r}]"

    expr = _WHERE_REF.sub(repl, _sub_agg_refs_py(where))
    expr = _sql_keywords_to_py(expr)
    tree = ast.parse(expr.strip(), mode="eval")
    tree = ast.fix_missing_locations(_ThreeValTransform().visit(tree))
    code = compile(tree, "<where>", "eval")

    def fn(cand: dict, env: dict) -> bool:
        # __c/__e go in GLOBALS: the deferred-operand lambdas resolve
        # free names through the eval's globals, not its locals.
        result = eval(  # noqa: S307 — grammar restricted by corr_plan
            code,
            {
                "__builtins__": {},
                "abs": abs,
                "_cmp3": _cmp3,
                "_and3": _and3,
                "_or3": _or3,
                "_not3": _not3,
                "__c": cand,
                "__e": env,
            },
        )
        return result is True

    return fn


def _sql_keywords_to_py(expr: str) -> str:
    """Shared keyword rewrite for the where/measure compilers: SQL
    connectives to Python, and TRUE/FALSE/NULL literals to Python
    constants (corr_plan whitelists the bare literals, so the
    compilers MUST bind them — an unrewritten TRUE is a NameError
    inside the streaming worker, found in round-4 review)."""
    expr = re.sub(r"(?i)\bAND\b", " and ", expr)
    expr = re.sub(r"(?i)\bOR\b", " or ", expr)
    expr = re.sub(r"(?i)\bNOT\b", " not ", expr)
    expr = re.sub(r"(?i)\bTRUE\b", " True ", expr)
    expr = re.sub(r"(?i)\bFALSE\b", " False ", expr)
    expr = re.sub(r"(?i)\bNULL\b", " None ", expr)
    expr = expr.replace("<>", "!=")
    expr = re.sub(r"(?<![<>!=])=(?!=)", "==", expr)
    return expr


def _compile_measure_py(expr: str):
    """Compile a MEASURES expression to fn(env) -> value for the NFA —
    the Python twin of operators.cep._translate_measure_sql. Every ref
    targets a bound step recorded in env (validated by corr_plan).
    A NULL arithmetic operand yields NULL (TypeError → None); boolean
    sub-expressions evaluate under the SAME three-valued logic as the
    where compiler (the _ThreeValTransform pass — without it a NULL in
    one disjunct voided the whole measure where batch F.expr returns
    TRUE, found in round-4 review)."""
    from spark_cep_spark.operators.cep import _WHERE_REF

    py = _WHERE_REF.sub(
        lambda mo: f"__e[{mo.group(1)!r}][{mo.group(2)!r}]",
        _sub_agg_refs_py(expr),
    )
    py = _sql_keywords_to_py(py)
    tree = ast.parse(py.strip(), mode="eval")
    tree = ast.fix_missing_locations(_ThreeValTransform().visit(tree))
    code = compile(tree, "<measure>", "eval")

    def fn(env: dict):
        try:
            return eval(  # noqa: S307 — grammar restricted by corr_plan
                code,
                {
                    "__builtins__": {},
                    "abs": abs,
                    "least": _least_sql,
                    "greatest": _greatest_sql,
                    "_cmp3": _cmp3,
                    "_and3": _and3,
                    "_or3": _or3,
                    "_not3": _not3,
                    "__e": env,
                },
            )
        except (TypeError, ZeroDivisionError):
            return None

    return fn


def _least_sql(*xs):
    """SQL least(): NULL-skipping min (Spark/DuckDB semantics) — the
    subset min() expansion target. All-NULL -> NULL."""
    vs = [x for x in xs if x is not None]
    return min(vs) if vs else None


def _greatest_sql(*xs):
    """SQL greatest(): NULL-skipping max."""
    vs = [x for x in xs if x is not None]
    return max(vs) if vs else None


# run-aggregate state per tracked column: [first, last, min, max, sum,
# count] — every slot one-pass mergeable; first/last include NULLs
# (positional), min/max/sum/count skip them (SQL semantics)
_AGG_IDX = {"first": 0, "last": 1, "min": 2, "max": 3, "sum": 4, "count": 5}


def _run_init(v):
    if v is None:
        return [None, None, None, None, None, 0]
    return [v, v, v, v, v, 1]


def _run_extend(st: list, v) -> list:
    if v is None:
        return [st[0], None, st[2], st[3], st[4], st[5]]
    return [
        st[0],
        v,
        v if st[2] is None else min(st[2], v),
        v if st[3] is None else max(st[3], v),
        v if st[4] is None else st[4] + v,
        st[5] + 1,
    ]


def _sub_agg_refs_py(expr: str) -> str:
    """Rewrite run-aggregate refs agg(K.col) to env accessors — the
    Python twin of operators.cep._sub_agg_refs. avg reads sum/count
    (division by a 0 count yields NULL via the caller's except)."""
    from spark_cep_spark.operators.cep import _AGG_REF

    def repl(mo: re.Match) -> str:
        agg, s, c = mo.group(1).lower(), mo.group(2), mo.group(3)
        base = f"__e[{s!r}][{c!r}]"
        if agg == "avg":
            return f"({base}[4] / {base}[5])"
        return f"{base}[{_AGG_IDX[agg]}]"

    return _AGG_REF.sub(repl, expr)


# Checkpoint payload version for the partials-carrying NFA states
# (compile_stream / multi-pattern). v2 = {"v": 2, "buf": ...,
# "partials"/"p": [[bound, open_run, env], ...]}. A payload without
# "v" is the v1 era: [bound, open_run] 2-element partials (upgraded by
# appending an empty env) — while the PRE-v1 shape [anchor_eid,
# [ts...]] (int first element) recorded no per-step event ids and
# cannot be reconstructed: restoring it must fail loudly, not
# TypeError deep inside the kernel.
_STATE_VERSION = 2


def _upgrade_partials(partials: list, where: str) -> list:
    out = []
    for p in partials:
        if p and not isinstance(p[0], list):
            raise ValueError(
                f"incompatible NFA checkpoint state ({where}): the "
                "pre-upgrade [anchor_eid, [ts...]] format cannot be "
                "restored — restart the query from a fresh checkpoint"
            )
        out.append(p if len(p) == 3 else [p[0], p[1], {}])
    return out


def _last_pos(bound: list) -> tuple[int, int]:
    """(ts, eid) of the most recently bound event: a plain entry is
    [ts, eid], a kleene entry [first_ts, first_eid, last_ts, last_eid,
    count] — the run's last event is the binding position."""
    e = bound[-1]
    return (e[0], e[1]) if len(e) == 2 else (e[2], e[3])


def advance_nfa_full(
    partials: list,
    matured: list,
    contig: list,
    bound_us: int,
    wm_us: int,
    corr: list | None = None,
    val_cols: tuple = (),
    env_names: list | None = None,
    emit_env: bool = False,
    run_cols: list | None = None,
    gaps: list | None = None,
) -> tuple[list, list]:
    """The generalized NFA kernel: relaxed (followed_by), strict
    (next), greedy Kleene-plus (one_or_more) and terminal negation
    (not_followed_by), matching Pattern.compile_batch exactly (the
    executable spec).

    partials: [[bound, open_run, env], ...] where bound holds one entry
              per bound step — [ts_us, eid] for plain steps,
              [first_us, first_eid, last_us, last_eid, count] for a
              kleene step. Entries carry the bound event's id so (a)
              strict steps and run extension can identify "the key's
              immediately-next event" under ts ties, and (b) matches
              name the exact events they bound (emit_ids). open_run
              marks a kleene run still absorbing consecutive events. A
              partial with all positive steps bound and run closed is
              pending negation (only when contig ends with 'absent').
              env maps referenced step name → that bound event's value
              dict (cross-step correlation; {} when unused).
    matured:  [[ts_us, eid, [m0..mk]], ...] sorted by (ts, eid), plus
              a 4th element [v per val_cols] when correlation is on —
              for strict/kleene patterns this MUST include
              non-matching events (they kill strict partials and close
              runs).
    contig:   per-step contiguity ('relaxed' | 'strict' | 'kleene' |
              'absent'); 'absent' may only be last, 'kleene' never
              first (validated by Pattern).
    corr:     optional per-step correlation predicates
              fn(cand_vals, env) -> bool (None per step without one);
              a step binds only if its m-flag AND its corr predicate
              hold. val_cols names the columns of matured[i][3];
              env_names[i] is step i's name if a later corr — or a
              MEASURES expression — reads its values (its binding is
              then recorded in env), else None. emit_env=True widens
              matches to (anchor_eid, bound, env) so the caller can
              evaluate measures over the bound values. run_cols[i]
              (kleene steps only) lists columns whose one-pass
              aggregate state ([first, last, min, max, sum, count] per
              col) the run maintains in env — read back via
              agg(step.col) refs in later wheres and measures.
    Returns (partials', matches), matches = [(anchor_eid, bound)] over
    POSITIVE steps only (compile_batch likewise emits nothing for the
    absent step), anchor_eid = bound[0][1].

    Semantics per step kind, transcribing compile_batch:
    - relaxed: bind the earliest event with ts strictly after the
      previous step's ts, matching, within anchor+bound.
    - strict: the event at the key's next (ts, eid) position either
      matches (and is in bound) and binds, or the partial dies.
    - kleene: entry is relaxed; the run then greedily absorbs the
      key's immediately-consecutive matching events while in bound.
      The event that fails to extend CLOSES the run and is immediately
      offered to the following step (or the negation check). A run
      still open at the bound's edge closes when the watermark passes
      the deadline — only then is "no further extension" provable.
    - absent: the completed positives survive only if no matching
      event lies in (t_last, t_anchor + bound]; emission waits until
      the watermark passes t_anchor + bound (only then can no killer
      still arrive) — same discipline as advance_absence.
    """
    n_pos = len(contig) - 1 if contig[-1] == "absent" else len(contig)
    has_neg = n_pos < len(contig)
    matches = []

    def _in_gap(i: int, ts: int, last_ts: int) -> bool:
        """Per-transition deadline (Step.gap): step i's event must fall
        within gaps[i] of the previous binding; None = unconstrained.
        Mirrors compile_batch's `cand_ts <= prev_t + INTERVAL gap`."""
        return gaps is None or gaps[i] is None or ts <= last_ts + gaps[i]

    def _emit(bound: list, env: dict):
        return (bound[0][1], bound, env) if emit_env else (bound[0][1], bound)

    # hoisted per-event hooks (closure creation inside the event loop
    # would tax the ~1M events/s kernel even with no correlation); vd
    # is threaded via a one-slot cell
    _cell = [None]  # vd of the event being processed

    if corr or env_names:

        def _ok(i: int, m: list, env: dict) -> bool:
            if not m[i]:
                return False
            f = corr[i] if corr else None
            return f is None or f(_cell[0], env)

        def _bind_env(env: dict, i: int) -> dict:
            if env_names and env_names[i]:
                return {**env, env_names[i]: _cell[0]}
            return env

    else:

        def _ok(i: int, m: list, env: dict) -> bool:
            return m[i]

        def _bind_env(env: dict, i: int) -> dict:
            return env

    for ev in matured:
        ts, eid, m = ev[0], ev[1], ev[2]
        vd = dict(zip(val_cols, ev[3])) if val_cols else None
        _cell[0] = vd

        kept = []
        for bound, open_run, env in partials:
            t0 = bound[0][0]
            if open_run:
                k = len(bound) - 1
                if (ts, eid) > (bound[k][2], bound[k][3]):
                    # this IS the run's immediately-next event:
                    # extend, or close and fall through
                    if m[k] and ts <= t0 + bound_us:
                        e = bound[k]
                        env2 = env
                        if run_cols and run_cols[k]:
                            nm = env_names[k]
                            env2 = {
                                **env,
                                nm: {
                                    c: _run_extend(env[nm][c], vd[c])
                                    for c in run_cols[k]
                                },
                            }
                        kept.append(
                            [
                                bound[:k] + [[e[0], e[1], ts, eid, e[4] + 1]],
                                True,
                                env2,
                            ]
                        )
                        continue
                    open_run = False
                    if len(bound) == n_pos and not has_neg:
                        matches.append(_emit(bound, env))
                        continue
                else:
                    kept.append([bound, open_run, env])
                    continue
            nxt = len(bound)
            if nxt == n_pos:
                # pending negation: killed by a matching follower in
                # (t_last, t_anchor + bound]
                if (
                    has_neg
                    and _ok(n_pos, m, env)
                    and ts > _last_pos(bound)[0]
                    and ts <= t0 + bound_us
                    and _in_gap(n_pos, ts, _last_pos(bound)[0])
                ):
                    continue
                kept.append([bound, False, env])
                continue
            if ts > t0 + bound_us:
                continue  # expired before completing
            kind = contig[nxt]
            if kind == "strict":
                if (ts, eid) > _last_pos(bound):
                    # this IS the key's immediately-next event:
                    # bind or die (predicate AND correlation AND gap)
                    if _ok(nxt, m, env) and _in_gap(
                        nxt, ts, _last_pos(bound)[0]
                    ):
                        bound = bound + [[ts, eid]]
                        if len(bound) == n_pos and not has_neg:
                            matches.append(_emit(bound, _bind_env(env, nxt)))
                            continue
                        kept.append([bound, False, _bind_env(env, nxt)])
                    continue
                kept.append([bound, False, env])
            elif kind == "kleene":
                if ts > _last_pos(bound)[0] and m[nxt]:
                    env2 = env
                    if run_cols and run_cols[nxt]:
                        env2 = {
                            **env,
                            env_names[nxt]: {
                                c: _run_init(vd[c]) for c in run_cols[nxt]
                            },
                        }
                    kept.append(
                        [bound + [[ts, eid, ts, eid, 1]], True, env2]
                    )
                else:
                    kept.append([bound, False, env])
            elif (
                ts > _last_pos(bound)[0]
                and _ok(nxt, m, env)
                and _in_gap(nxt, ts, _last_pos(bound)[0])
            ):
                bound = bound + [[ts, eid]]
                if len(bound) == n_pos and not has_neg:
                    matches.append(_emit(bound, _bind_env(env, nxt)))
                    continue
                kept.append([bound, False, _bind_env(env, nxt)])
            else:
                kept.append([bound, False, env])
        partials = kept
        if _ok(0, m, {}):
            partials.append([[[ts, eid]], False, _bind_env({}, 0)])
    # watermark pass: close runs whose deadline passed, emit matured
    # negation / terminal-run completions, expire dead partials
    out = []
    for bound, open_run, env in partials:
        deadline = bound[0][0] + bound_us
        if open_run and deadline <= wm_us:
            open_run = False  # no in-bound extension can ever arrive
        if len(bound) == n_pos and not open_run:
            if deadline <= wm_us:
                # no-negation case only reachable for a terminal kleene
                # run closed by the watermark (event-closed runs
                # emitted in-loop); negation case = absence now proven
                matches.append(_emit(bound, env))
                continue
            out.append([bound, open_run, env])
            continue
        if deadline <= wm_us:
            continue  # incomplete and past deadline — can never finish
        if (
            not open_run
            and gaps is not None
            and len(bound) < n_pos
            and contig[len(bound)] == "relaxed"
            and gaps[len(bound)] is not None
            and wm_us >= _last_pos(bound)[0] + gaps[len(bound)]
        ):
            # the next relaxed transition's per-step gap deadline has
            # passed the watermark: every future matured event has
            # ts > wm >= last_bound_ts + gap, so the transition is
            # provably dead — free the state now instead of holding it
            # until the whole-match bound expires (this is what makes
            # cep_gap_timeout's "gaps free state earlier" claim true
            # on the relaxed path, not just the strict one)
            continue
        out.append([bound, open_run, env])
    return out, matches


def advance_kleene(
    run: list | None,
    matured: list,
    min_len: int,
) -> tuple[list | None, list]:
    """Kleene-plus kernel (cep_kleene's streaming face), pure and
    incremental: track the open run of CONSECUTIVE matching events per
    key; a non-matching event closes the run, emitting it if long
    enough.

    run:     [start_us, end_us, len] of the open run, or None
    matured: [[ts_us, eid, is_match], ...] sorted ascending — must
             include NON-matching events (they are what break runs), so
             the streaming wrapper never filters them out.
    Returns (run', emissions) with emissions = [[start, end, len]].
    An open run is not emitted — it could still grow (batch's
    end-of-data flush corresponds to stream end, which never arrives);
    state per key is O(1) regardless.
    """
    emissions = []
    for ts, _eid, is_match in matured:
        if is_match:
            if run is None:
                run = [ts, ts, 1]
            else:
                run = [run[0], ts, run[2] + 1]
        else:
            if run is not None and run[2] >= min_len:
                emissions.append(run)
            run = None
    return run, emissions


def kleene_stream(
    events_stream: DataFrame,
    predicate: str,
    min_len: int = 3,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming Kleene-plus: emit (key, run_start, run_end, run_len)
    for every maximal run of ≥min_len consecutive predicate-matching
    events in the key's event-time sequence, as soon as the run is
    broken by a non-matching event below the watermark."""
    prepared = events_stream.withWatermark(time_col, watermark).select(
        F.col(key_col).alias("key"),
        F.col(time_col).alias("ts"),
        F.col(id_col).alias("eid"),
        F.expr(predicate).cast("boolean").alias("is_match"),
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("run_start", T.TimestampType()),
            T.StructField("run_end", T.TimestampType()),
            T.StructField("run_len", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "run": None}
        buf, run = st["buf"], st["run"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                # batch .tolist() + zip: ~10x cheaper than per-row .iloc
                for ts, eid, m in zip(
                    ts_us.tolist(),
                    pdf["eid"].tolist(),
                    pdf["is_match"].tolist(),
                ):
                    buf.append([int(ts), int(eid), bool(m)])

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort()
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        run, emissions = advance_kleene(run, matured, min_len)

        if buf or run is not None:
            state.update((json.dumps({"buf": buf, "run": run}),))
            if buf:
                state.setTimeoutTimestamp(
                    max(
                        min(e[0] for e in buf) // _US_PER_MS + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        elif state.exists:
            state.remove()

        if emissions:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(emissions),
                    "run_start": pd.to_datetime([r[0] for r in emissions], unit="us"),
                    "run_end": pd.to_datetime([r[1] for r in emissions], unit="us"),
                    "run_len": [r[2] for r in emissions],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_threshold(
    tail: list,
    matured: list,
    factor: float = 3.0,
    n_trail: int = 5,
    min_trail: int = 3,
) -> tuple[list, list]:
    """Spike-detection kernel (cep_threshold's streaming face): emit an
    event when its value exceeds factor × the average of the previous
    ≤n_trail events of the key (at least min_trail required).

    tail:    [[ts_us, value], ...] the key's last ≤n_trail events
    matured: [[ts_us, eid, value], ...] sorted ascending
    Returns (tail', emissions), emissions = [[ts, eid, value, trail_avg]].
    Emission is decided purely from the past, so an event emits the
    moment it matures — no closed/open-window asymmetry with batch.
    State per key is O(n_trail).
    """
    emissions = []
    for ts, eid, value in matured:
        if len(tail) >= min_trail:
            avg = sum(v for _, v in tail) / len(tail)
            if value > factor * avg:
                emissions.append([ts, eid, value, avg])
        tail.append([ts, value])
        if len(tail) > n_trail:
            tail.pop(0)
    return tail, emissions


def threshold_stream(
    events_stream: DataFrame,
    factor: float = 3.0,
    n_trail: int = 5,
    min_trail: int = 3,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming spike detection over per-key rolling state — output
    (key, event_id, ts, value, trail_avg) matches cep_threshold."""
    prepared = events_stream.withWatermark(time_col, watermark).select(
        F.col(key_col).alias("key"),
        F.col(time_col).alias("ts"),
        F.col(id_col).alias("eid"),
        F.col(value_col).alias("value"),
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("trail_avg", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "tail": []}
        buf, tail = st["buf"], st["tail"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                # batch .tolist() + zip: ~10x cheaper than per-row .iloc
                for ts, eid, v in zip(
                    ts_us.tolist(),
                    pdf["eid"].tolist(),
                    pdf["value"].tolist(),
                ):
                    buf.append([int(ts), int(eid), float(v)])

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort()
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        tail, emissions = advance_threshold(tail, matured, factor, n_trail, min_trail)

        if buf:
            state.update((json.dumps({"buf": buf, "tail": tail}),))
            state.setTimeoutTimestamp(
                max(
                    min(e[0] for e in buf) // _US_PER_MS + 1,
                    state.getCurrentWatermarkMs() + 1,
                )
            )
        elif tail:
            state.update((json.dumps({"buf": [], "tail": tail}),))
        elif state.exists:
            state.remove()

        if emissions:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(emissions),
                    "event_id": [e[1] for e in emissions],
                    "ts": pd.to_datetime([e[0] for e in emissions], unit="us"),
                    "value": [e[2] for e in emissions],
                    "trail_avg": [e[3] for e in emissions],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_absence(
    pending: list,
    matured: list,
    wm_us: int,
    bound_us: int,
) -> tuple[list, list]:
    """Absence-detection kernel (cep_absence's streaming face), pure and
    incremental.

    pending: [[anchor_ts_us, anchor_eid], ...] anchors awaiting their
             deadline
    matured: [[ts_us, eid, is_anchor, is_killer], ...] sorted ascending
    Returns (pending', emissions) where emissions = [[anchor_ts, eid]]
    for anchors whose (anchor_ts, anchor_ts + bound] window passed the
    watermark with no killer — exactly the batch anti-join's NOT EXISTS
    (operators/cep.py cep_absence). Emission waits for the watermark
    because only then can no killer with ts <= deadline still arrive.
    """
    for ts, eid, is_anchor, is_killer in matured:
        if is_killer:
            pending = [p for p in pending if not (p[0] < ts <= p[0] + bound_us)]
        if is_anchor:
            pending.append([ts, eid])
    emissions = [p for p in pending if p[0] + bound_us <= wm_us]
    pending = [p for p in pending if p[0] + bound_us > wm_us]
    return pending, emissions


def absence_stream(
    events_stream: DataFrame,
    anchor_pred: str,
    absent_pred: str,
    bound: str,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming negation: anchor NOT followed by a matching event
    within `bound`, per key — per-key state + event-time timer (the
    timer wakes the key when the earliest deadline passes the
    watermark, so silence on a key still produces emissions).

    Output: (key, anchor_id, t_anchor). An anchor emits only once its
    full window has passed the watermark; anchors whose window is still
    open when the stream pauses remain pending (they are not yet
    provably unmatched).
    """
    bound_ms = _interval_to_ms(bound)

    prepared = (
        events_stream.withWatermark(time_col, watermark)
        .select(
            F.col(key_col).alias("key"),
            F.col(time_col).alias("ts"),
            F.col(id_col).alias("eid"),
            F.expr(anchor_pred).cast("boolean").alias("is_anchor"),
            F.expr(absent_pred).cast("boolean").alias("is_killer"),
        )
        .filter("is_anchor OR is_killer")
    )

    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("anchor_id", T.LongType()),
            T.StructField("t_anchor", T.TimestampType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "pending": []}
        buf, pending = st["buf"], st["pending"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                # batch .tolist() + zip: ~10x cheaper than per-row .iloc
                for ts, eid, a, k in zip(
                    ts_us.tolist(),
                    pdf["eid"].tolist(),
                    pdf["is_anchor"].tolist(),
                    pdf["is_killer"].tolist(),
                ):
                    buf.append([int(ts), int(eid), bool(a), bool(k)])

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort()
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        pending, emissions = advance_absence(
            pending, matured, wm_us, bound_ms * _US_PER_MS
        )

        if buf or pending:
            state.update((json.dumps({"buf": buf, "pending": pending}),))
            nxt_us = min(
                [e[0] for e in buf] + [p[0] + bound_ms * _US_PER_MS for p in pending]
            )
            state.setTimeoutTimestamp(
                max(nxt_us // _US_PER_MS + 1, state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()

        if emissions:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(emissions),
                    "anchor_id": [eid for _, eid in emissions],
                    "t_anchor": pd.to_datetime([ts for ts, _ in emissions], unit="us"),
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_nav(
    nav_tail: list,
    matured: list,
    navs: list,
    nav_cols: list,
    nav_k: int,
    base: int,
) -> tuple[list, list]:
    """Pure navigation kernel: refine the m-flags of PREV-navigation
    steps against the key's previous physical rows, in release order.

    nav_tail — the last ≤ nav_k released rows' nav values (oldest
    first); matured — entries [ts, eid, flags, vals?, navvals] with
    navvals at index `base`; navs — [(step_idx, (fn, cols, k, has_next))].
    Returns (new_tail, stripped_entries). Chunking-invariant by
    construction: the tail after processing a prefix is exactly the
    state a later chunk resumes from (property-tested in
    tests/test_cep_nav.py)."""
    for e in matured:
        navv = e[base]
        cur = dict(zip(nav_cols, navv))
        env = {
            f"__PREVROW{j}": (
                dict(zip(nav_cols, nav_tail[-j]))
                if len(nav_tail) >= j
                else {c: None for c in nav_cols}
            )
            for j in range(1, nav_k + 1)
        }
        for i, (fn, _carry, _mk, _hn) in navs:
            if e[2][i]:
                e[2][i] = fn(cur, env)
        nav_tail.append(navv)
    return nav_tail[-nav_k:], [e[:base] for e in matured]


def compile_stream(
    pattern: "Pattern",
    events_stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    watermark: str = "10 minutes",
    filter_nonmatching: bool = True,
    emit_ids: bool = False,
    skip_policy: str | tuple | None = None,
    emit_match_number: bool = False,
) -> DataFrame:
    """Compile a Pattern to a streaming DataFrame of matches — all
    contiguity modes (followed_by / next / one_or_more /
    not_followed_by), same semantics as Pattern.compile_batch.

    skip_policy (Flink-CEP AfterMatchSkipStrategy, streaming face of
    the batch selectors): None = emit every match (skip-to-next-row,
    the default); "skip_past_last_row" = greedy non-overlapping
    (select_non_overlapping's recurrence); ("skip_to_last", step) /
    ("skip_to_first", step) = resume at the kept match's <step>
    binding (select_skip_to) — on a one_or_more target, LAST resumes
    at the run's final row and FIRST at its entry row. The
    recurrence needs matches in START order but the NFA completes
    them in END order, so matches are held until their anchor's
    whole-match window passes the watermark (at which point no
    earlier-starting match can still appear) — state is the held
    matches within one window plus one marker integer per key
    (advance_skip_select, property-tested).

    Output schema mirrors Pattern.compile_batch: (key, anchor_id,
    t_<step>... as timestamps) over the POSITIVE steps (a negation step
    contributes no timestamp; its matches emit only once the anchor's
    full window passes the watermark — before that no absence is
    provable). emit_ids=True adds id_<step> columns naming the exact
    bound events (exact join-back under timestamp ties), matching
    compile_batch(emit_ids=True).

    emit_match_number=True appends a `match_no` long column — the
    SQL-standard MATCH_NUMBER(): matches numbered 1, 2, ... per key
    in START order. Without a skip policy the NFA completes matches
    in END order, so completions are held until their whole-match
    window passes the watermark (advance_match_number, the same
    maturity rule advance_skip_select uses); with a skip policy the
    selector already releases kept matches matured and in start
    order, so numbering is a bare counter. The counter is one
    integer of per-key state that persists after the window drains —
    numbering never restarts for a key.
    """
    steps = pattern.steps
    n_steps = len(steps)
    if n_steps == 0:
        raise ValueError("empty pattern")
    if pattern.time_bound is None:
        raise ValueError("pattern needs .within(bound)")
    for s in steps[:-1]:
        if s.contiguity == "absent":
            raise ValueError("not_followed_by must be the last step")
    if steps[0].contiguity != "relaxed":
        raise ValueError("pattern must start with begin()")
    bound_ms = _interval_to_ms(pattern.time_bound)
    contig = [s.contiguity for s in steps]
    for s in steps:
        if s.gap is not None and s.contiguity == "kleene":
            raise ValueError("gap= is not supported on one_or_more steps")
    gaps_us = (
        [
            _interval_to_ms(s.gap) * _US_PER_MS if s.gap else None
            for s in steps
        ]
        if any(s.gap for s in steps)
        else None
    )
    pos_steps = steps[:-1] if contig[-1] == "absent" else steps
    navs = [
        (i, getattr(s, "nav_py", None)) for i, s in enumerate(steps)
    ]
    navs = [(i, n) for i, n in navs if n is not None]
    nav_cols: list[str] = []
    nav_k = 0
    if navs:
        if any(n[3] for _i, n in navs):
            raise ValueError(
                "NEXT navigation is not supported on streaming input "
                "(it needs row lookahead)"
            )
        nav_cols = sorted({c for _i, n in navs for c in n[1]})
        nav_k = max(n[2] for _i, n in navs)
        # PREV navigates PHYSICAL rows: every event (matching or not)
        # is part of the navigation sequence, so none may be dropped.
        # The kernel keeps the key's last k released rows (nav tail)
        # in state — indefinitely, like dropDuplicates' keys: the next
        # event's PREV must see them no matter how much later it comes.
        filter_nonmatching = False
    if any(c in ("strict", "kleene") for c in contig):
        # a strict partial is killed — and a kleene run closed — by
        # whatever event sits at the key's next sequence position:
        # non-matching events carry semantics and must reach the NFA
        filter_nonmatching = False
    skip_inclusive = False
    skip_resume_idx: int | None = None  # None -> marker = match end
    skip_resume_first = False  # kleene target: run's first vs last row
    if skip_policy is not None:
        if skip_policy == "skip_past_last_row":
            pass
        elif (
            isinstance(skip_policy, tuple)
            and len(skip_policy) == 2
            and skip_policy[0] in ("skip_to_last", "skip_to_first")
        ):
            kind = skip_policy[0]
            names = [s.name for s in pos_steps]
            if skip_policy[1] not in names:
                raise ValueError(
                    f"{kind}: unknown step {skip_policy[1]!r}"
                )
            skip_resume_idx = names.index(skip_policy[1])
            if skip_resume_idx == 0:
                raise ValueError(
                    f"{kind} cannot target the anchor step "
                    "(the scan would not advance)"
                )
            # a one_or_more target is legal (standard MATCH_RECOGNIZE
            # allows skipping to a quantified variable): FIRST resumes
            # at the run's entry row, LAST at its final row — both
            # strictly after the anchor, so the scan always advances
            skip_resume_first = kind == "skip_to_first"
            skip_inclusive = True
        else:
            raise ValueError(f"unknown skip_policy: {skip_policy!r}")

    corr_plan = pattern.corr_plan()
    has_corr = any(w is not None for w in corr_plan["wheres"])
    val_cols = tuple(corr_plan["all_cols"])  # non-empty iff where/measures
    corr_fns = None
    env_names = None
    if val_cols:
        env_names = [
            s.name
            if (s.name in corr_plan["refs"] or s.name in corr_plan["run_refs"])
            else None
            for s in steps
        ]
    run_cols = None
    if corr_plan["run_refs"]:
        run_cols = [
            sorted({c for _a, c in corr_plan["run_refs"].get(s.name, [])})
            or None
            for s in steps
        ]
    if has_corr:
        corr_fns = [
            _compile_where_py(w, steps[i].name) if w else None
            for i, w in enumerate(corr_plan["wheres"])
        ]
    measures = list(pattern.measures)
    measure_fns = [(a, _compile_measure_py(e)) for a, e in measures]
    measure_fields: list[T.StructField] = []
    if measures:
        # infer each measure's Spark type by planning the batch-side
        # translation over an empty frame of the carried columns
        from spark_cep_spark.operators.cep import _translate_measure_sql

        ev_types = {f.name: f.dataType for f in events_stream.schema.fields}

        def _carried_type(agg: str, dt_: T.DataType) -> T.DataType:
            # mirror Spark's aggregate result types (F.sum widens
            # integrals to long and float to double; F.avg is double)
            if agg == "count":
                return T.LongType()
            if agg == "avg":
                return T.DoubleType()
            if agg == "sum":
                if isinstance(
                    dt_,
                    (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
                ):
                    return T.LongType()
                if isinstance(dt_, T.FloatType):
                    return T.DoubleType()
            return dt_

        probe_fields = [
            T.StructField(f"_v_{s}_{c}", ev_types[c])
            for s, cols in corr_plan["refs"].items()
            for c in cols
        ] + [
            T.StructField(f"_v_{s}_{a}_{c}", _carried_type(a, ev_types[c]))
            for s, acs in corr_plan["run_refs"].items()
            for a, c in acs
        ]
        probe = events_stream.sparkSession.createDataFrame(
            [], T.StructType(probe_fields)
        )
        measure_fields = list(
            probe.selectExpr(
                *[
                    f"{_translate_measure_sql(e)} AS {a}"
                    for a, e in measures
                ]
            ).schema.fields
        )

    flags = [
        F.expr(
            s.stream_predicate
            if getattr(s, "nav_py", None) is not None
            else s.predicate
        )
        .cast("boolean")
        .alias(f"m{i}")
        for i, s in enumerate(steps)
    ]
    prepared = events_stream.withWatermark(time_col, watermark).select(
        F.col(key_col).alias("key"),
        F.col(time_col).alias("ts"),
        F.col(id_col).alias("eid"),
        *flags,
        *[F.col(c).alias(f"v_{c}") for c in val_cols],
        *[F.col(c).alias(f"nv_{c}") for c in nav_cols],
    )
    if filter_nonmatching:
        # Events matching no step never affect the NFA — drop them early
        # (JVM-side, shrinks the shuffle AND the state). CAVEAT: Catalyst
        # pushes this filter below the watermark node, so the watermark
        # then advances only on MATCHING events. Pass
        # filter_nonmatching=False if non-matching traffic must drive
        # the event clock (costs shuffle volume, not correctness).
        prepared = prepared.filter(" OR ".join(f"m{i}" for i in range(n_steps)))

    out_fields = [
        # the key keeps its INPUT type (long user ids, string symbols,
        # or a struct for a composite PARTITION BY — the dialect's
        # multi-column keys arrive as one synthesized struct column)
        T.StructField("key", events_stream.schema[key_col].dataType),
        T.StructField("anchor_id", T.LongType()),
    ]
    for s in pos_steps:
        if s.contiguity == "kleene":
            out_fields += [
                T.StructField(f"t_{s.name}_first", T.TimestampType()),
                T.StructField(f"t_{s.name}_last", T.TimestampType()),
                T.StructField(f"{s.name}_count", T.LongType()),
            ]
            if emit_ids:
                out_fields += [
                    T.StructField(f"id_{s.name}_first", T.LongType()),
                    T.StructField(f"id_{s.name}_last", T.LongType()),
                ]
        else:
            out_fields.append(T.StructField(f"t_{s.name}", T.TimestampType()))
            if emit_ids:
                out_fields.append(T.StructField(f"id_{s.name}", T.LongType()))
    out_fields += measure_fields
    if emit_match_number:
        out_fields.append(T.StructField("match_no", T.LongType()))
    out_schema = T.StructType(out_fields)
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
            if st.get("v") != _STATE_VERSION:
                st["partials"] = _upgrade_partials(
                    st.get("partials", []), "compile_stream"
                )
        else:
            st = {"buf": [], "partials": []}
        buf = st["buf"]  # [[ts_us, eid, [m0..mk]], ...] not yet matured
        partials = st["partials"]  # [[bound, open_run, env], ...] (see advance_nfa_full)
        skip_pending, skip_marker = st.get("skip", [[], None])
        nav_tail = st.get("nav_tail", [])  # last nav_k released rows' nav vals
        mn_pending, mn_next = st.get("mn", [[], 1])

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                # batch .tolist() + zip: ~10x cheaper than per-row .iloc
                cols = [ts_us.tolist(), pdf["eid"].tolist()]
                cols += [pdf[f"m{i}"].tolist() for i in range(n_steps)]
                cols += [pdf[f"v_{c}"].tolist() for c in val_cols]
                cols += [pdf[f"nv_{c}"].tolist() for c in nav_cols]
                n_v = len(val_cols)
                for row in zip(*cols):
                    entry = [
                        int(row[0]),
                        int(row[1]),
                        [bool(x) for x in row[2 : 2 + n_steps]],
                    ]
                    if val_cols:
                        entry.append(
                            [
                                _py(x)
                                for x in row[2 + n_steps : 2 + n_steps + n_v]
                            ]
                        )
                    if nav_cols:
                        entry.append(
                            [_py(x) for x in row[2 + n_steps + n_v :]]
                        )
                    buf.append(entry)

        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * _US_PER_MS
        buf.sort()
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        if nav_cols and matured:
            # refine the m-flags of navigation steps against the key's
            # previous physical rows, in release order — the exact
            # rows the batch lag column sees (buf.sort == (ts, eid))
            base = 3 + (1 if val_cols else 0)
            nav_tail, matured = advance_nav(
                nav_tail, matured, navs, nav_cols, nav_k, base
            )

        partials, matches = advance_nfa_full(
            partials,
            matured,
            contig,
            bound_ms * _US_PER_MS,
            wm_us,
            corr=corr_fns,
            val_cols=val_cols,
            env_names=env_names,
            emit_env=bool(measures),
            run_cols=run_cols,
            gaps=gaps_us,
        )

        if skip_policy is not None:
            # hold completions until their whole-match window passes
            # the watermark, then run the greedy AFTER MATCH SKIP
            # recurrence in start order (see advance_skip_select)
            entries = []
            for mt in matches:
                b = mt[1]
                marker = (
                    _last_pos(b)[0]
                    if skip_resume_idx is None
                    else (
                        # plain binding [ts, eid] -> ts; kleene binding
                        # [first_ts, first_eid, last_ts, ...] -> first
                        # or last ts per the policy's FIRST/LAST target
                        b[skip_resume_idx][0]
                        if (
                            skip_resume_first
                            or len(b[skip_resume_idx]) == 2
                        )
                        else b[skip_resume_idx][2]
                    )
                )
                entries.append([b[0][0], marker, mt[0], list(mt)])
            skip_pending, skip_marker, matches = advance_skip_select(
                skip_pending,
                skip_marker,
                entries,
                wm_us,
                bound_ms * _US_PER_MS,
                inclusive=skip_inclusive,
            )

        mn_numbers: list | None = None
        if emit_match_number:
            if skip_policy is not None:
                # the skip selector already released kept matches
                # matured AND in start order — number in place
                mn_numbers = list(range(mn_next, mn_next + len(matches)))
                mn_next += len(matches)
            else:
                entries = [
                    [mt[1][0][0], mt[0], list(mt)] for mt in matches
                ]
                mn_pending, mn_next, numbered = advance_match_number(
                    mn_pending,
                    mn_next,
                    entries,
                    wm_us,
                    bound_ms * _US_PER_MS,
                )
                mn_numbers = [no for no, _mt in numbered]
                matches = [mt for _no, mt in numbered]

        if (
            buf
            or partials
            or skip_pending
            or mn_pending
            or (nav_cols and nav_tail)
            or (emit_match_number and mn_next > 1)
        ):
            payload = {"v": _STATE_VERSION, "buf": buf, "partials": partials}
            if skip_policy is not None:
                payload["skip"] = [skip_pending, skip_marker]
            if nav_cols:
                payload["nav_tail"] = nav_tail
            if emit_match_number:
                payload["mn"] = [mn_pending, mn_next]
            state.update((json.dumps(payload),))
            # wake up when the watermark passes the earliest pending work
            # (a bare nav tail or match counter needs no wakeup — it
            # only waits for data)
            pending = (
                [e[0] for e in buf]
                + [p[0][0][0] + bound_ms * _US_PER_MS for p in partials]
                + [m[0] + bound_ms * _US_PER_MS for m in skip_pending]
                + [m[0] + bound_ms * _US_PER_MS for m in mn_pending]
            )
            if pending:
                state.setTimeoutTimestamp(
                    max(min(pending) // _US_PER_MS + 1, wm_ms + 1)
                )
        elif state.exists:
            state.remove()  # nothing pending — free the key's state

        if matches:
            bts = [mt[1] for mt in matches]
            cols: dict[str, list] = {
                "key": [key[0]] * len(matches),
                "anchor_id": [mt[0] for mt in matches],
            }
            for i, s in enumerate(pos_steps):
                if s.contiguity == "kleene":
                    cols[f"t_{s.name}_first"] = pd.to_datetime(
                        [bt[i][0] for bt in bts], unit="us"
                    )
                    cols[f"t_{s.name}_last"] = pd.to_datetime(
                        [bt[i][2] for bt in bts], unit="us"
                    )
                    cols[f"{s.name}_count"] = [bt[i][4] for bt in bts]
                    if emit_ids:
                        cols[f"id_{s.name}_first"] = [bt[i][1] for bt in bts]
                        cols[f"id_{s.name}_last"] = [bt[i][3] for bt in bts]
                else:
                    cols[f"t_{s.name}"] = pd.to_datetime(
                        [bt[i][0] for bt in bts], unit="us"
                    )
                    if emit_ids:
                        cols[f"id_{s.name}"] = [bt[i][1] for bt in bts]
            for alias, fn in measure_fns:
                cols[alias] = [fn(mt[2]) for mt in matches]
            if emit_match_number:
                cols["match_no"] = mn_numbers
            yield pd.DataFrame(cols)

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def compile_stream_multi(
    patterns: dict[str, "Pattern"],
    events_stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Evaluate MANY patterns over ONE pass of the stream — the
    reference family's deployment shape (a registry of continuous
    queries against a shared stream [PK]). One shuffle on the key, one
    state store entry per key, one Python worker invocation per
    micro-batch amortized across every registered pattern; running N
    patterns as N compile_stream queries would cost N× all three.

    All per-pattern features participate (contiguity modes,
    correlation, run aggregates, measures). Output is normalized
    across patterns: (pattern, key, anchor_id, t_anchor, t_last,
    match) where match is a JSON object {step: binding} — a plain
    entry binds {"ts": us, "id": eid}, a kleene entry
    {"first_ts": .., "first_id": .., "last_ts": .., "last_id": ..,
    "count": n} — plus {"measures": {alias: value}} when the pattern
    declares measures. The per-pattern TYPED face stays
    compile_stream; this face trades column typing for shared-scan
    economics.
    """
    if not patterns:
        raise ValueError("no patterns")
    specs = []
    all_cols: set = set()
    any_sk = False
    for pidx, (pname, pat) in enumerate(patterns.items()):
        steps = pat.steps
        if not steps:
            raise ValueError(f"{pname}: empty pattern")
        if pat.time_bound is None:
            raise ValueError(f"{pname}: pattern needs .within(bound)")
        for s in steps[:-1]:
            if s.contiguity == "absent":
                raise ValueError(f"{pname}: not_followed_by must be last")
        if steps[0].contiguity != "relaxed":
            raise ValueError(f"{pname}: pattern must start with begin()")
        if any(getattr(s, "nav_py", None) is not None for s in steps):
            raise ValueError(
                f"{pname}: PREV/NEXT navigation is not supported in the "
                "multi-pattern face (its batch predicate references "
                "pre-projected nav columns the shared scan does not "
                "carry) — run a navigation pattern through "
                "compile_stream / match_recognize"
            )
        for s in steps:
            if s.gap is not None and s.contiguity == "kleene":
                raise ValueError(
                    f"{pname}: gap= is not supported on one_or_more steps"
                )
        plan = pat.corr_plan()
        all_cols |= set(plan["all_cols"])
        contig = [s.contiguity for s in steps]
        any_sk = any_sk or any(c in ("strict", "kleene") for c in contig)
        specs.append(
            {
                "name": pname,
                "steps": steps,
                "contig": contig,
                "n": len(steps),
                "bound_us": _interval_to_ms(pat.time_bound) * _US_PER_MS,
                "gaps": (
                    [
                        _interval_to_ms(s.gap) * _US_PER_MS if s.gap else None
                        for s in steps
                    ]
                    if any(s.gap for s in steps)
                    else None
                ),
                "plan": plan,
                "measures": [
                    (a, _compile_measure_py(e)) for a, e in pat.measures
                ],
            }
        )
    val_cols = tuple(sorted(all_cols))
    off = 0
    for sp in specs:
        sp["off"] = off
        off += sp["n"]
        plan = sp["plan"]
        sp["corr"] = (
            [
                _compile_where_py(w, sp["steps"][i].name) if w else None
                for i, w in enumerate(plan["wheres"])
            ]
            if any(w is not None for w in plan["wheres"])
            else None
        )
        sp["env_names"] = (
            [
                s.name
                if (s.name in plan["refs"] or s.name in plan["run_refs"])
                else None
                for s in sp["steps"]
            ]
            if val_cols
            else None
        )
        sp["run_cols"] = (
            [
                sorted({c for _a, c in plan["run_refs"].get(s.name, [])})
                or None
                for s in sp["steps"]
            ]
            if plan["run_refs"]
            else None
        )
    n_flags = off

    # transport only UNIQUE step predicates (rule packs repeat them
    # across rules) — the per-group serializer pays per column; the
    # kernel layout is re-expanded per event in `process` (same
    # discipline as compile_stream_variants)
    flag_texts: list[str] = []
    flag_of: dict[str, int] = {}
    expand_idx: list[int] = []
    for sp in specs:
        for s in sp["steps"]:
            j = flag_of.get(s.predicate)
            if j is None:
                j = flag_of[s.predicate] = len(flag_texts)
                flag_texts.append(s.predicate)
            expand_idx.append(j)
    n_uniq = len(flag_texts)
    full_layout = expand_idx == list(range(n_flags))
    flags = [
        F.expr(p).cast("boolean").alias(f"m_{j}")
        for j, p in enumerate(flag_texts)
    ]
    prepared = events_stream.withWatermark(time_col, watermark).select(
        F.col(key_col).alias("key"),
        F.col(time_col).alias("ts"),
        F.col(id_col).alias("eid"),
        *flags,
        *[F.col(c).alias(f"v_{c}") for c in val_cols],
    )
    if not any_sk:
        # an event matching NO step of ANY pattern is globally inert
        prepared = prepared.filter(
            " OR ".join(f"m_{i}" for i in range(n_uniq))
        )

    out_schema = T.StructType(
        [
            T.StructField("pattern", T.StringType()),
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("anchor_id", T.LongType()),
            T.StructField("t_anchor", T.TimestampType()),
            T.StructField("t_last", T.TimestampType()),
            T.StructField("match", T.StringType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def _match_json(sp: dict, bound: list, env: dict | None) -> str:
        doc: dict = {}
        for i, s in enumerate(sp["steps"]):
            if i >= len(bound):
                break  # absent step binds nothing
            e = bound[i]
            if len(e) == 5:
                doc[s.name] = {
                    "first_ts": e[0],
                    "first_id": e[1],
                    "last_ts": e[2],
                    "last_id": e[3],
                    "count": e[4],
                }
            else:
                doc[s.name] = {"ts": e[0], "id": e[1]}
        if sp["measures"]:
            doc["measures"] = {a: fn(env) for a, fn in sp["measures"]}
        return json.dumps(doc)

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
            if st.get("v") != _STATE_VERSION:
                st["p"] = {
                    name: _upgrade_partials(ps, f"multi_pattern[{name}]")
                    for name, ps in st.get("p", {}).items()
                }
        else:
            st = {"buf": [], "p": {sp["name"]: [] for sp in specs}}
        buf = st["buf"]
        per_pat = st["p"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                # batch .tolist() + zip: ~10x cheaper than per-row .iloc
                cols = [ts_us.tolist(), pdf["eid"].tolist()]
                cols += [pdf[f"m_{i}"].tolist() for i in range(n_uniq)]
                cols += [pdf[f"v_{c}"].tolist() for c in val_cols]
                for row in zip(*cols):
                    uf = [bool(x) for x in row[2 : 2 + n_uniq]]
                    entry = [
                        int(row[0]),
                        int(row[1]),
                        uf if full_layout else [uf[j] for j in expand_idx],
                    ]
                    if val_cols:
                        entry.append(
                            [_py(x) for x in row[2 + n_uniq :]]
                        )
                    buf.append(entry)

        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * _US_PER_MS
        buf.sort()
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        rows = []
        for sp in specs:
            o, n = sp["off"], sp["n"]
            matured_p = [
                [e[0], e[1], e[2][o : o + n]] + ([e[3]] if val_cols else [])
                for e in matured
            ]
            partials, matches = advance_nfa_full(
                per_pat.get(sp["name"], []),
                matured_p,
                sp["contig"],
                sp["bound_us"],
                wm_us,
                corr=sp["corr"],
                val_cols=val_cols,
                env_names=sp["env_names"],
                emit_env=bool(sp["measures"]),
                run_cols=sp["run_cols"],
                gaps=sp["gaps"],
            )
            per_pat[sp["name"]] = partials
            for mt in matches:
                bound = mt[1]
                env = mt[2] if len(mt) > 2 else None
                rows.append(
                    (
                        sp["name"],
                        key[0],
                        mt[0],
                        bound[0][0],
                        _last_pos(bound)[0],
                        _match_json(sp, bound, env),
                    )
                )

        if buf or any(per_pat.values()):
            state.update(
                (json.dumps({"v": _STATE_VERSION, "buf": buf, "p": per_pat}),)
            )
            nxt_us = min(
                [e[0] for e in buf]
                + [
                    p[0][0][0] + sp["bound_us"]
                    for sp in specs
                    for p in per_pat[sp["name"]]
                ]
            )
            state.setTimeoutTimestamp(max(nxt_us // _US_PER_MS + 1, wm_ms + 1))
        elif state.exists:
            state.remove()

        if rows:
            yield pd.DataFrame(
                {
                    "pattern": [r[0] for r in rows],
                    "key": [r[1] for r in rows],
                    "anchor_id": [r[2] for r in rows],
                    "t_anchor": pd.to_datetime([r[3] for r in rows], unit="us"),
                    "t_last": pd.to_datetime([r[4] for r in rows], unit="us"),
                    "match": [r[5] for r in rows],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_skip_select(
    pending: list,
    last_marker: int | None,
    new_matches: list,
    wm_us: int,
    bound_us: int,
    inclusive: bool = False,
) -> tuple[list, int | None, list]:
    """Streaming AFTER MATCH SKIP selection kernel (pure,
    chunking-invariant): the greedy sequential recurrence of
    select_non_overlapping / select_skip_to, run incrementally over a
    match stream.

    Matches do NOT emit from the NFA in start order (an
    earlier-anchored match can complete later), but the recurrence
    must scan in start order — so a match is HELD until no
    earlier-starting match can still appear: every anchor at ts <=
    start resolves by its deadline ts + bound, so once
    `start + bound_us <= wm_us` (after the NFA advanced at this wm)
    the prefix of matches up to `start` is complete and the
    recurrence may consume it. State = the held matches within one
    whole-match window + ONE marker integer.

    pending:     [[start_us, marker_us, tiebreak, payload]] held
                 matches (payload = the NFA match tuple, opaque);
                 marker = end for SKIP PAST, resume-step binding for
                 SKIP TO — it is both the secondary sort key and the
                 recurrence update, matching the batch selectors'
                 (start, end/resume, tiebreak) order exactly
    last_marker: the recurrence state — the last kept match's marker
    new_matches: same shape, this batch's NFA completions
    inclusive:   False = keep iff start >  last_marker (SKIP PAST
                 LAST ROW); True = keep iff start >= last_marker
                 (SKIP TO LAST <var> — the resume row may anchor)

    Returns (pending', last_marker', kept_payloads).
    """
    pending = pending + [list(m) for m in new_matches]
    ready = [m for m in pending if m[0] + bound_us <= wm_us]
    pending = [m for m in pending if m[0] + bound_us > wm_us]
    ready.sort(key=lambda m: (m[0], m[1], m[2]))
    kept = []
    for m in ready:
        ok = (
            last_marker is None
            or (m[0] >= last_marker if inclusive else m[0] > last_marker)
        )
        if ok:
            last_marker = m[1]
            kept.append(m[3])
    return pending, last_marker, kept


def advance_match_number(
    pending: list,
    next_no: int,
    new_matches: list,
    wm_us: int,
    bound_us: int,
) -> tuple[list, int, list]:
    """Streaming MATCH_NUMBER() kernel (pure, chunking-invariant):
    assign each match its sequential number within the key, in START
    order — the SQL-standard MATCH_NUMBER() semantics (Flink/Trino
    MATCH_RECOGNIZE number matches in the order they begin within a
    partition).

    The NFA completes matches in END order, so — exactly like
    advance_skip_select — a match is HELD until no earlier-starting
    match can still appear: once `start + bound_us <= wm_us` every
    anchor at-or-before `start` has resolved, the prefix is complete,
    and numbers may be assigned. State = the held matches within one
    whole-match window + ONE counter integer per key (the counter
    alone persists after the window drains, like dropDuplicates'
    keys, so numbering never restarts).

    pending:     [[start_us, tiebreak_eid, payload]] held matches
                 (payload = the NFA match tuple, opaque)
    next_no:     the next number to assign (1 on first call)
    new_matches: same shape, this batch's NFA completions

    Returns (pending', next_no', [(no, payload), ...]) with the
    released matches in (start, tiebreak) order.
    """
    pending = pending + [list(m) for m in new_matches]
    ready = [m for m in pending if m[0] + bound_us <= wm_us]
    pending = [m for m in pending if m[0] + bound_us > wm_us]
    ready.sort(key=lambda m: (m[0], m[1]))
    out = []
    for m in ready:
        out.append((next_no, m[2]))
        next_no += 1
    return pending, next_no, out


class KleeneAggRuleSpec:
    """A running-aggregate rule inside a multi-query pack (round 11):
    everything the variant multiplexer needs to drive
    advance_kleene_agg ALONGSIDE chain NFAs in one keyed state.
    Built by cep_sql.match_recognize_all for DEFINE-aggregate rules —
    the threshold half of a mixed funnel+threshold alerting pack.

    step_preds: [(step_name, predicate_sql)] in kernel order
    (anchor, candidate[, confirm]) — each predicate a plain Spark SQL
    boolean, evaluated JVM-side into the pack's shared flag columns.
    out_spec: [(column, kind)] with the ONE-ROW kinds of
    kleene_agg_out_fields (t_anchor / n / n1 / s / avg / t_conf).
    val_col: the aggregate's input column (joins the pack's shared
    value projection) or None; integral picks int vs float
    conversion — the exact-arithmetic discipline of the standalone
    faces. bound_us is the rule's OWN WITHIN (mode='all' keeps
    per-rule deadlines)."""

    def __init__(
        self,
        step_preds: list,
        bound_us: int,
        bind,
        out_spec: list,
        integral: bool,
        val_col: str | None = None,
        confirm: bool = False,
        min_n: int = 1,
        max_n: int | None = None,
        combine=None,
    ):
        if confirm != (len(step_preds) == 3):
            raise ValueError("confirm rules carry exactly 3 step_preds")
        self.step_preds = step_preds
        self.bound_us = bound_us
        self.bind = bind
        self.out_spec = out_spec
        self.integral = integral
        self.val_col = val_col
        self.confirm = confirm
        self.min_n = min_n
        self.max_n = max_n
        self.combine = combine


# ONE-ROW kernel record ([anchor_us, n, s(, conf_us)]) → payload value,
# per out_spec kind — the variant-pack face of kleene_agg_out_columns
# (kept in lockstep; timestamps stay integer µs, the emitter converts)
_KA_ROW_MAKERS = {
    "t_anchor": lambda r: r[0],
    "t_conf": lambda r: r[3],
    "n": lambda r: r[1],
    "n1": lambda r: r[1] + 1,  # leading Kleene: anchor included
    "s": lambda r: r[2],
    "avg": lambda r: r[2] / r[1],
}


def advance_variants(
    per_var: list,
    pend: list,
    done: list,
    matured: list,
    wm_us: int,
    specs: list,
    bound_us: int,
    mode: str,
    val_cols: tuple = (),
) -> tuple[list, list, list, list]:
    """The variant-alternation kernel (pure, chunking-invariant —
    property-tested like advance_nfa_full, which it composes): run k
    pattern variants as parallel NFAs and decide, per anchor, the ONE
    winning match.

    per_var: per-variant partials lists (advance_nfa_full state)
    pend:    [[t0, eid, {str(rank): row}], ...] completed matches
             held for the preference decision (rank 1 = most
             preferred; rows are the caller's payload dicts and must
             carry '_td' = the match's last-bound ts)
    done:    [[t0, eid], ...] anchors already decided — suppresses
             straggler completions until wm passes t0 + bound
    matured: [[ts, eid, [m-flags across ALL variants], vals?], ...]
             sorted; each variant reads its own flag slice via
             spec['off']/spec['n']
    specs:   per-variant dicts: off, n, contig, gaps, corr,
             env_names, run_cols, emit_env, row (fn(bound, env) ->
             payload dict)
    mode:    'preference' — winner = lowest rank that completes; a
             completed match waits while ANY lower-rank variant still
             holds a live partial for the same anchor (it could still
             complete and steal the win). 'earliest' — winner = min
             (t_done, rank); since every candidate's t_done <= wm and
             any future completion binds ts > wm, a seen candidate is
             unbeatable and the decision emits immediately. 'all'
             (round 10, the MULTI-QUERY face) — no winner at all:
             every variant is an INDEPENDENT rule and every completed
             match emits immediately (advance_nfa_full emits each
             match exactly once, so no suppression state is needed —
             pend/done stay empty); variants may then carry their OWN
             .within() bounds (sp['bound_us'] overrides). Round 11:
             mode='all' specs may also be kleene-agg rules
             (sp['kind'] == 'kleene_agg', built from
             KleeneAggRuleSpec) — each drives advance_kleene_agg on
             its flag slice + value column with its own state slot
             ([st] or []), so a mixed funnel+threshold pack runs as
             ONE scan and ONE keyed state.

    Returns (per_var', pend', done', decided_rows) with decided_rows
    = [(anchor_eid, payload_row), ...].
    """
    done_set = {(d[0], d[1]) for d in done}
    by_anchor: dict = {(p[0], p[1]): p[2] for p in pend}
    decided_all: list = []
    for rank, sp in enumerate(specs, start=1):
        if sp.get("kind") == "kleene_agg":
            # a running-aggregate rule rides the SAME matured rows:
            # its anchor/candidate/confirm predicates occupy a flag
            # slice like any chain's steps, its value column the
            # shared val tuple; state slot = the kernel's single open
            # run (or empty). Only legal under mode='all' (no winner
            # coordination — enforced at compile).
            o, n = sp["off"], sp["n"]
            vi = sp.get("val_idx")
            conv = int if sp["integral"] else float
            matured_v = []
            for e in matured:
                fl = e[2][o : o + n]
                v = e[3][vi] if vi is not None else 0
                matured_v.append(
                    [
                        e[0],
                        e[1],
                        fl[0],
                        fl[1],
                        None if v is None else conv(v),
                        fl[2] if sp["confirm"] else False,
                    ]
                )
            slot = per_var[rank - 1]
            st, recs = advance_kleene_agg(
                slot[0] if slot else None,
                matured_v,
                wm_us,
                sp["bind"],
                sp["bound_us"],
                confirm=sp["confirm"],
                min_n=sp["min_n"],
                max_n=sp["max_n"],
                combine=sp["combine"],
            )
            per_var[rank - 1] = [st] if st is not None else []
            for rec in recs:
                # the kernel's ONE-ROW record carries no anchor eid —
                # anchor_id emits NULL, matching the batch face
                decided_all.append((None, sp["row"](rec)))
            continue
        o, n = sp["off"], sp["n"]
        matured_v = [
            [e[0], e[1], e[2][o : o + n]] + ([e[3]] if val_cols else [])
            for e in matured
        ]
        partials, matches = advance_nfa_full(
            per_var[rank - 1],
            matured_v,
            sp["contig"],
            sp.get("bound_us", bound_us),
            wm_us,
            corr=sp.get("corr"),
            val_cols=val_cols,
            env_names=sp.get("env_names"),
            emit_env=sp.get("emit_env", False),
            run_cols=sp.get("run_cols"),
            gaps=sp.get("gaps"),
        )
        per_var[rank - 1] = partials
        for mt in matches:
            b = mt[1]
            anchor = (b[0][0], b[0][1])
            env = mt[2] if len(mt) > 2 else None
            if mode == "all":
                decided_all.append((anchor[1], sp["row"](b, env)))
                continue
            if anchor in done_set:
                continue  # decision already emitted for this anchor
            by_anchor.setdefault(anchor, {})[str(rank)] = sp["row"](b, env)
    if mode == "all":
        return per_var, [], [], decided_all

    # which anchors does each variant still hold a live partial for?
    # (the only way a better-preference variant can steal a decision)
    alive: dict = {}
    for rank, plist in enumerate(per_var, start=1):
        for p in plist:
            alive.setdefault((p[0][0][0], p[0][0][1]), set()).add(rank)

    decided: list = []
    new_pend: list = []
    for (t0, eid), comp in by_anchor.items():
        ranks = sorted(int(r) for r in comp)
        if mode == "earliest":
            winner = min(ranks, key=lambda r: (comp[str(r)]["_td"], r))
        else:
            winner = ranks[0]
            if any(r < winner for r in alive.get((t0, eid), ())):
                new_pend.append([t0, eid, comp])
                continue  # a preferred variant can still complete
        decided.append((eid, comp[str(winner)]))
        done.append([t0, eid])
        done_set.add((t0, eid))
    # a done anchor needs suppressing only until its whole-match
    # deadline passes the watermark: after this round's kernel advance
    # at wm, no variant can produce a new completion for it
    done = [d for d in done if d[0] + bound_us > wm_us]
    return per_var, new_pend, done, decided


def compile_stream_variants(
    variants: list[tuple[str, "Pattern"]],
    events_stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    watermark: str = "10 minutes",
    mode: str = "preference",
    label_col: str = "variant",
    filter_nonmatching: bool = True,
) -> DataFrame:
    """Run an ALTERNATION of pattern variants as parallel NFAs per key
    and emit, per anchor, exactly ONE winner — the streaming face of
    the quantifier (`B?` / `B??` / `{n,m}` / `{n,m}?`) and PERMUTE
    expansions that were previously batch-only.

    variants: (desc, Pattern) in PREFERENCE order (the expansion
    already encodes greedy vs reluctant by ordering). All variants
    must share the anchor step and the .within() bound — true by
    construction for every expansion this serves (the first step
    cannot be quantified and WITHIN is a shared clause).

    mode='preference' (quantifiers): the winner is the LOWEST-rank
    variant that completes. A completed lower-preference match is
    HELD (in `pend`) while any higher-preference variant still has a
    live partial for the same anchor — only when every better variant
    is provably dead (its partial expired, was killed, or its gap
    deadline passed) does the held match emit. Because every kernel
    frees its partials no later than the anchor's whole-match
    deadline, each pending decision resolves by wm >= t_anchor +
    bound — state stays bounded by the within window, exactly like a
    single-pattern NFA.

    mode='earliest' (PERMUTE): the winner is the min (t_done,
    declaration_rank) completion. Matured events have ts <= wm, so
    any ALREADY-completed candidate has t_done <= wm, while any
    future completion must bind an event with ts > wm — strictly
    later. A candidate therefore can never be beaten once seen, and
    the decision emits IMMEDIATELY (pend never carries across
    batches in this mode).

    Anchors that have emitted are parked in `done` until the
    watermark passes their whole-match deadline, suppressing
    lower-preference completions that straggle in after the decision
    (e.g. a skip-variant completing after the with-variant emitted).

    Output schema: (key, anchor_id, union of every variant's t_/count
    columns in first-appearance order with typed NULLs for steps a
    variant does not bind, union of measure columns, label_col) —
    mirroring _compile_quantifier_batch so streaming == batch is
    directly assertable.

    Scale: ONE shuffle on the key, ONE state entry per key shared by
    all k variants (k <= 16 by the expansion cap), one Python worker
    call per micro-batch amortized across variants — k separate
    compile_stream queries would cost k× all three and could not
    coordinate the winner pick at all.
    """
    if mode not in ("preference", "earliest", "all"):
        raise ValueError(f"unknown mode {mode!r}")
    if not variants:
        raise ValueError("no variants")
    specs = []
    all_cols: set = set()
    any_sk = False
    bound_us_shared: int | None = None
    has_ka = any(isinstance(p, KleeneAggRuleSpec) for _d, p in variants)
    if has_ka and mode != "all":
        raise ValueError(
            "running-aggregate rules join a pack only under mode='all' "
            "(they are independent rules, not alternation variants)"
        )
    for desc, pat in variants:
        if isinstance(pat, KleeneAggRuleSpec):
            b_us = pat.bound_us
            if bound_us_shared is None:
                bound_us_shared = b_us
            else:
                bound_us_shared = max(bound_us_shared, b_us)
            if pat.val_col is not None:
                all_cols.add(pat.val_col)
            specs.append(
                {
                    "desc": desc,
                    "kind": "kleene_agg",
                    "n": len(pat.step_preds),
                    "flag_preds": [p for _n, p in pat.step_preds],
                    "bound_us": b_us,
                    "bind": pat.bind,
                    "confirm": pat.confirm,
                    "min_n": pat.min_n,
                    "max_n": pat.max_n,
                    "combine": pat.combine,
                    "integral": pat.integral,
                    "val_col": pat.val_col,
                    "out_spec": pat.out_spec,
                }
            )
            continue
        steps = pat.steps
        if not steps:
            raise ValueError(f"{desc}: empty pattern")
        if pat.time_bound is None:
            raise ValueError(f"{desc}: pattern needs .within(bound)")
        for s in steps[:-1]:
            if s.contiguity == "absent":
                raise ValueError(f"{desc}: not_followed_by must be last")
        if steps[0].contiguity != "relaxed":
            raise ValueError(f"{desc}: pattern must start with begin()")
        for s in steps:
            if s.gap is not None and s.contiguity == "kleene":
                raise ValueError(
                    f"{desc}: gap= is not supported on one_or_more steps"
                )
        b_us = _interval_to_ms(pat.time_bound) * _US_PER_MS
        if bound_us_shared is None:
            bound_us_shared = b_us
        elif b_us != bound_us_shared:
            if mode != "all":
                raise ValueError(
                    "variants must share the .within() bound "
                    f"({pat.time_bound} differs)"
                )
            # mode='all': independent rules keep their own deadlines;
            # the shared bound (used for timeout/suppression math)
            # becomes the MAX so no rule's window is cut short
            bound_us_shared = max(bound_us_shared, b_us)
        plan = pat.corr_plan()
        all_cols |= set(plan["all_cols"])
        contig = [s.contiguity for s in steps]
        any_sk = any_sk or any(c in ("strict", "kleene") for c in contig)
        specs.append(
            {
                "desc": desc,
                "steps": steps,
                "pos_steps": steps[:-1] if contig[-1] == "absent" else steps,
                "contig": contig,
                "n": len(steps),
                "gaps": (
                    [
                        _interval_to_ms(s.gap) * _US_PER_MS if s.gap else None
                        for s in steps
                    ]
                    if any(s.gap for s in steps)
                    else None
                ),
                "plan": plan,
                "measures": [
                    (a, _compile_measure_py(e)) for a, e in pat.measures
                ],
                "pat": pat,
                # mode='all' lets each rule keep its own deadline
                "bound_us": b_us,
            }
        )
    bound_us = bound_us_shared
    val_cols = tuple(sorted(all_cols))
    off = 0
    for sp in specs:
        sp["off"] = off
        off += sp["n"]
        if sp.get("kind") == "kleene_agg":
            sp["val_idx"] = (
                val_cols.index(sp["val_col"])
                if sp["val_col"] is not None
                else None
            )
            continue
        plan = sp["plan"]
        sp["corr"] = (
            [
                _compile_where_py(w, sp["steps"][i].name) if w else None
                for i, w in enumerate(plan["wheres"])
            ]
            if any(w is not None for w in plan["wheres"])
            else None
        )
        sp["env_names"] = (
            [
                s.name
                if (s.name in plan["refs"] or s.name in plan["run_refs"])
                else None
                for s in sp["steps"]
            ]
            if val_cols
            else None
        )
        sp["run_cols"] = (
            [
                sorted({c for _a, c in plan["run_refs"].get(s.name, [])})
                or None
                for s in sp["steps"]
            ]
            if plan["run_refs"]
            else None
        )
    n_flags = off

    # union output schema, first-appearance order across variants
    # (mirrors _compile_quantifier_batch's full_cols): per variant the
    # t_/count columns in step order, then its measure aliases
    union_types: dict[str, T.DataType] = {}
    union_cols: list[str] = []

    def _add(name: str, dt_: T.DataType, desc: str) -> None:
        if name not in union_types:
            union_types[name] = dt_
            union_cols.append(name)
        elif union_types[name] != dt_:
            raise ValueError(
                f"variant {desc!r} emits {name} as {dt_.simpleString()}, "
                f"an earlier variant emitted "
                f"{union_types[name].simpleString()}"
            )

    from spark_cep_spark.operators.cep import _translate_measure_sql

    ev_types = {f.name: f.dataType for f in events_stream.schema.fields}
    for sp in specs:
        if sp.get("kind") == "kleene_agg":
            for fld in kleene_agg_out_fields(
                sp["out_spec"], sp["integral"]
            ):
                _add(fld.name, fld.dataType, sp["desc"])
            continue
        for s in sp["pos_steps"]:
            if s.contiguity == "kleene":
                _add(f"t_{s.name}_first", T.TimestampType(), sp["desc"])
                _add(f"t_{s.name}_last", T.TimestampType(), sp["desc"])
                _add(f"{s.name}_count", T.LongType(), sp["desc"])
            else:
                _add(f"t_{s.name}", T.TimestampType(), sp["desc"])
        if sp["pat"].measures:
            plan = sp["plan"]

            def _carried_type(agg: str, dt_: T.DataType) -> T.DataType:
                if agg == "count":
                    return T.LongType()
                if agg == "avg":
                    return T.DoubleType()
                if agg == "sum":
                    if isinstance(
                        dt_,
                        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
                    ):
                        return T.LongType()
                    if isinstance(dt_, T.FloatType):
                        return T.DoubleType()
                return dt_

            probe_fields = [
                T.StructField(f"_v_{s}_{c}", ev_types[c])
                for s, cols in plan["refs"].items()
                for c in cols
            ] + [
                T.StructField(f"_v_{s}_{a}_{c}", _carried_type(a, ev_types[c]))
                for s, acs in plan["run_refs"].items()
                for a, c in acs
            ]
            probe = events_stream.sparkSession.createDataFrame(
                [], T.StructType(probe_fields)
            )
            for fld in probe.selectExpr(
                *[
                    f"{_translate_measure_sql(e)} AS {a}"
                    for a, e in sp["pat"].measures
                ]
            ).schema.fields:
                _add(fld.name, fld.dataType, sp["desc"])
    ts_cols = {
        c for c in union_cols if isinstance(union_types[c], T.TimestampType)
    }

    # Variant expansions repeat the SAME step predicates across
    # orderings (the bench's 3-variant quantifier ships 3 identical
    # (S, V, P) triples), and applyInPandasWithState's serializer
    # converts every column per GROUP — so redundant flag columns cost
    # groups x columns on both the Arrow boundary and the key shuffle
    # (guide §2.3 "project before the exchange" / §4.1 "pass only the
    # columns the function needs").  Transport only the UNIQUE
    # predicates; `process` re-expands each event's flag list to the
    # kernel's per-spec layout (one list-index pass per event), so
    # advance_variants and its property tests are untouched.
    flag_texts: list[str] = []
    flag_of: dict[str, int] = {}
    expand_idx: list[int] = []  # (spec, step) position -> unique index
    for sp in specs:
        for p in (
            sp["flag_preds"]
            if sp.get("kind") == "kleene_agg"
            else [s.predicate for s in sp["steps"]]
        ):
            j = flag_of.get(p)
            if j is None:
                j = flag_of[p] = len(flag_texts)
                flag_texts.append(p)
            expand_idx.append(j)
    n_uniq = len(flag_texts)
    full_layout = expand_idx == list(range(n_flags))  # nothing shared
    flags = [
        F.expr(p).cast("boolean").alias(f"m_{j}")
        for j, p in enumerate(flag_texts)
    ]
    prepared = events_stream.withWatermark(time_col, watermark).select(
        F.col(key_col).alias("key"),
        F.col(time_col).alias("ts"),
        F.col(id_col).alias("eid"),
        *flags,
        *[F.col(c).alias(f"v_{c}") for c in val_cols],
    )
    # a kleene-agg rule's watermark must advance on ALL traffic (the
    # 2-step shape EMITS on deadline close — parity with the
    # standalone kleene_agg_stream face, which never filters)
    if filter_nonmatching and not any_sk and not has_ka:
        # see compile_stream's CAVEAT: Catalyst pushes this filter
        # below the watermark node, so the watermark — which DRIVES
        # the pending-preference decisions here — advances only on
        # matching events. Pass filter_nonmatching=False when
        # non-matching traffic must drive the event clock.
        prepared = prepared.filter(
            " OR ".join(f"m_{i}" for i in range(n_uniq))
        )

    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("anchor_id", T.LongType()),
        ]
        + [T.StructField(c, union_types[c]) for c in union_cols]
        + [T.StructField(label_col, T.StringType())]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def _row(sp: dict, bound: list, env: dict | None) -> dict:
        row: dict = {}
        for i, s in enumerate(sp["pos_steps"]):
            e = bound[i]
            if s.contiguity == "kleene":
                row[f"t_{s.name}_first"] = e[0]
                row[f"t_{s.name}_last"] = e[2]
                row[f"{s.name}_count"] = e[4]
            else:
                row[f"t_{s.name}"] = e[0]
        for alias, fn in sp["measures"]:
            row[alias] = fn(env)
        row["_label"] = sp["desc"]
        row["_td"] = _last_pos(bound)[0]
        return row

    def _ka_row(sp: dict, rec: list) -> dict:
        row = {
            name: _KA_ROW_MAKERS[kind](rec)
            for name, kind in sp["out_spec"]
        }
        row["_label"] = sp["desc"]
        return row

    for sp in specs:
        if sp.get("kind") == "kleene_agg":
            sp["row"] = (lambda sp_: lambda rec: _ka_row(sp_, rec))(sp)
            continue
        sp["emit_env"] = bool(sp["measures"])
        sp["row"] = (lambda sp_: lambda b, env: _row(sp_, b, env))(sp)

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {
                "buf": [],
                "p": [[] for _ in specs],
                "pend": [],
                "done": [],
            }
        buf = st["buf"]
        per_var = st["p"]
        # pend: [[t0, eid, {str(rank): row}], ...] completed matches
        # awaiting the preference decision; done: [[t0, eid], ...]
        # anchors already emitted (suppress stragglers until deadline)
        pend = st["pend"]
        done = st["done"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                cols = [ts_us.tolist(), pdf["eid"].tolist()]
                cols += [pdf[f"m_{i}"].tolist() for i in range(n_uniq)]
                cols += [pdf[f"v_{c}"].tolist() for c in val_cols]
                for row in zip(*cols):
                    # re-expand transported unique flags to the
                    # kernel's per-(spec, step) layout
                    uf = [bool(x) for x in row[2 : 2 + n_uniq]]
                    entry = [
                        int(row[0]),
                        int(row[1]),
                        uf if full_layout else [uf[j] for j in expand_idx],
                    ]
                    if val_cols:
                        entry.append([_py(x) for x in row[2 + n_uniq :]])
                    buf.append(entry)

        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * _US_PER_MS
        buf.sort()
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        per_var, pend, done, out_rows = advance_variants(
            per_var,
            pend,
            done,
            matured,
            wm_us,
            specs,
            bound_us,
            mode,
            val_cols=val_cols,
        )

        if buf or pend or done or any(per_var):
            state.update(
                (
                    json.dumps(
                        {
                            "buf": buf,
                            "p": per_var,
                            "pend": pend,
                            "done": done,
                        }
                    ),
                )
            )
            # partial wakeups use the OWNING spec's bound (mode='all'
            # lets rules differ): a short-WITHIN rule's last partial
            # must not keep the key's state until the longest rule's
            # horizon. pend/done only exist in the shared-bound modes.
            nxt_us = min(
                [e[0] for e in buf]
                + [
                    (
                        p[3]  # kleene-agg slot: the open run's deadline
                        if sp.get("kind") == "kleene_agg"
                        else p[0][0][0] + sp.get("bound_us", bound_us)
                    )
                    for sp, plist in zip(specs, per_var)
                    for p in plist
                ]
                + [p[0] + bound_us for p in pend]
                + [d[0] + bound_us for d in done]
            )
            state.setTimeoutTimestamp(max(nxt_us // _US_PER_MS + 1, wm_ms + 1))
        elif state.exists:
            state.remove()

        if out_rows:
            cols: dict[str, list] = {
                "key": [key[0]] * len(out_rows),
                "anchor_id": [eid for eid, _ in out_rows],
            }
            for c in union_cols:
                vals = [r.get(c) for _, r in out_rows]
                cols[c] = (
                    pd.to_datetime(
                        [v if v is not None else pd.NaT for v in vals],
                        unit="us",
                    )
                    if c in ts_cols
                    else vals
                )
            cols[label_col] = [r["_label"] for _, r in out_rows]
            yield pd.DataFrame(cols)

    # round 12: group by a hash bucket of the key instead of the key —
    # Spark's per-group state protocol was the measured drain floor
    # (1,500-12,000 tiny groups per batch); `process` runs unchanged
    # per key inside each bucket (streaming/bucketed.py)
    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_throttle(
    last_cool_end: int | None, alerts: list, cooldown_us: int
) -> tuple[int | None, list]:
    """Alert-throttle kernel (cep_alert_throttle's streaming face):
    greedy cooldown suppression over a (ts-ordered) chunk of per-key
    alerts. State is ONE integer (the open cooldown's end, or None) —
    the recurrence is chunking-invariant, so micro-batch boundaries
    are semantically invisible (property-tested like advance_nfa).

    alerts: [[ts_us, alert_id], ...]; returns (state', kept)."""
    kept = []
    for ts, aid in alerts:
        if last_cool_end is None or ts > last_cool_end:
            kept.append([ts, aid])
            last_cool_end = ts + cooldown_us
    return last_cool_end, kept


def alert_throttle_stream(
    events_stream: DataFrame,
    factor: float = 3.0,
    n_trail: int = 5,
    min_trail: int = 3,
    cooldown: str = "30 minutes",
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming face of cep_alert_throttle: spike detection AND
    cooldown suppression in ONE keyed state (the spike tail plus the
    open cooldown's end — O(n_trail) + one integer per key). Output
    (key, event_id, ts, value, trail_avg) matches the batch operator
    up to trail_avg rounding."""
    cooldown_us = _interval_to_ms(cooldown) * _US_PER_MS

    prepared = events_stream.withWatermark(time_col, watermark).select(
        F.col(key_col).alias("key"),
        F.col(time_col).alias("ts"),
        F.col(id_col).alias("eid"),
        F.col(value_col).alias("value"),
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("trail_avg", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "tail": [], "cool": None}
        buf, tail, cool = st["buf"], st["tail"], st["cool"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                # batch .tolist() + zip: ~10x cheaper than per-row .iloc
                for ts, eid, v in zip(
                    ts_us.tolist(),
                    pdf["eid"].tolist(),
                    pdf["value"].tolist(),
                ):
                    buf.append([int(ts), int(eid), float(v)])

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort()
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        tail, spikes = advance_threshold(
            tail, matured, factor, n_trail, min_trail
        )
        kept = []
        for ts, eid, value, avg in spikes:
            if cool is None or ts > cool:
                kept.append([ts, eid, value, avg])
                cool = ts + cooldown_us

        if buf or tail or cool is not None:
            state.update(
                (json.dumps({"buf": buf, "tail": tail, "cool": cool}),)
            )
            if buf:
                state.setTimeoutTimestamp(
                    max(
                        min(e[0] for e in buf) // _US_PER_MS + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        elif state.exists:
            state.remove()

        if kept:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(kept),
                    "event_id": [e[1] for e in kept],
                    "ts": pd.to_datetime([e[0] for e in kept], unit="us"),
                    "value": [e[2] for e in kept],
                    "trail_avg": [e[3] for e in kept],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_transitions(
    last: list | None, events: list
) -> tuple[list | None, list]:
    """Transition kernel (graph_transitions' streaming face): fold a
    ts-ordered chunk of one user's events into (prev_type, next_type)
    pairs. State is the single last-seen event [ts_us, eid, etype] —
    the recurrence is chunking-invariant, so micro-batch boundaries
    are semantically invisible (property-tested like advance_nfa).

    events: [[ts_us, eid, etype], ...]; returns (state', transitions)
    where transitions = [[ts_us, eid, prev_type, next_type], ...] (one
    per event that HAS a predecessor)."""
    out = []
    for ev in events:
        if last is not None:
            out.append([ev[0], ev[1], last[2], ev[2]])
        last = ev
    return last, out


def transition_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming face of graph_transitions: per-key last-event state
    (ONE event per key — O(1) state however long the stream runs)
    emits a (prev_type, next_type) edge per matured event. Downstream
    a stateless groupBy(prev,next).count() — or stream_trending's
    incremental counts — turns the edge stream into the live
    transition matrix; the batch twin aggregates the same pairs."""
    prepared = (
        events_stream.withWatermark(time_col, watermark)
        # an event without a timestamp or key cannot be sequenced —
        # NaT would otherwise turn into int64 garbage in the kernel
        .filter(F.col(time_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(time_col).alias("ts"),
            F.col(id_col).alias("eid"),
            F.col(type_col).alias("etype"),
        )
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("prev_type", T.StringType()),
            T.StructField("next_type", T.StringType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "last": None}
        buf, last = st["buf"], st["last"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                for ts, eid, et in zip(
                    ts_us.tolist(), pdf["eid"].tolist(), pdf["etype"].tolist()
                ):
                    # eid orders ties; a null id cannot be sequenced.
                    # etype stays None (NOT the string "None") so the
                    # emitted edge matches the batch twin's SQL NULL
                    if eid is None or pd.isna(eid):
                        continue
                    buf.append(
                        [int(ts), int(eid), None if pd.isna(et) else str(et)]
                    )

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        # key on (ts, eid): the 3rd element may be None and must
        # never participate in comparisons
        buf.sort(key=lambda e: (e[0], e[1]))
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        last, edges = advance_transitions(last, matured)

        if buf or last is not None:
            state.update((json.dumps({"buf": buf, "last": last}),))
            if buf:
                state.setTimeoutTimestamp(
                    max(
                        min(e[0] for e in buf) // _US_PER_MS + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        elif state.exists:
            state.remove()

        if edges:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(edges),
                    "event_id": [e[1] for e in edges],
                    "ts": pd.to_datetime([e[0] for e in edges], unit="us"),
                    "prev_type": [e[2] for e in edges],
                    "next_type": [e[3] for e in edges],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_sessionize(
    open_sess: list | None, events: list, gap_us: int, wm_us: int
) -> tuple[list | None, list]:
    """Sessionization kernel (stream_sessionize's streaming face):
    fold a ts-ordered chunk of one key's events into closed sessions.
    State is the single open session [start_us, last_us, n] — a >gap
    silence between consecutive events closes it, and the watermark
    closes it once no in-gap event can still arrive (wm > last + gap).
    Chunking-invariant (property-tested): micro-batch boundaries and
    timer firings are semantically invisible.

    events: [[ts_us, eid], ...]; returns (state', closed) with
    closed = [[start_us, end_us, n], ...]."""
    closed = []
    for ts, _eid in events:
        if open_sess is None:
            open_sess = [ts, ts, 1]
        elif ts - open_sess[1] > gap_us:
            closed.append(open_sess)
            open_sess = [ts, ts, 1]
        else:
            open_sess = [open_sess[0], ts, open_sess[2] + 1]
    if open_sess is not None and open_sess[1] + gap_us < wm_us:
        closed.append(open_sess)
        open_sess = None
    return open_sess, closed


def sessionize_stream(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming face of stream_sessionize: per-key open-session state
    (O(1) per key), sessions emitted the moment they provably close.
    Output (key, session_start, session_end, n_events) matches the
    batch twin's per-session rows (session_id is a batch-side running
    count — the streaming face identifies sessions by their start)."""
    gap_us = _interval_to_ms(gap) * _US_PER_MS

    prepared = (
        events_stream.withWatermark(time_col, watermark)
        # same null discipline as transition_stream
        .filter(F.col(time_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(time_col).alias("ts"),
            F.col(id_col).alias("eid"),
        )
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("session_start", T.TimestampType()),
            T.StructField("session_end", T.TimestampType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "open": None}
        buf, open_sess = st["buf"], st["open"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                for ts, eid in zip(ts_us.tolist(), pdf["eid"].tolist()):
                    if eid is None or pd.isna(eid):  # see transition_stream
                        continue
                    buf.append([int(ts), int(eid)])

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort()
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        open_sess, closed = advance_sessionize(
            open_sess, matured, gap_us, wm_us
        )

        if buf or open_sess is not None:
            state.update((json.dumps({"buf": buf, "open": open_sess}),))
            # wake when the open session's close becomes provable, or
            # when the earliest buffered event matures
            pend = [e[0] for e in buf]
            if open_sess is not None:
                pend.append(open_sess[1] + gap_us)
            state.setTimeoutTimestamp(
                max(min(pend) // _US_PER_MS + 1, state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()

        if closed:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(closed),
                    "session_start": pd.to_datetime(
                        [c[0] for c in closed], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [c[1] for c in closed], unit="us"
                    ),
                    "n_events": [c[2] for c in closed],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_zscore(
    ring: list,
    matured: list,
    window: int = 20,
    min_hist: int = 10,
    thresh: float = 3.0,
) -> tuple[list, list]:
    """Pure rolling-z-score kernel (streaming face of
    operators/windows.anomaly_zscore), chunking-invariant by
    construction: `ring` is the key's last ≤`window` [value-or-None]
    entries in (ts, id) order; `matured` is the next batch of
    [ts_us, eid, value-or-None] rows, already (ts, id)-sorted.

    Per matured row, mirror the batch frame EXACTLY: n_hist = len(ring)
    (rows, including null values — count(*) semantics), mean/stddev
    over the ring's non-null values (avg/stddev ignore nulls), score
    only when n_hist >= min_hist, sd > 1e-9 and |v-mu| > thresh·sd,
    then push the row's value (null included) and trim to `window`.
    Returns (ring, alerts) with alerts = [eid, ts_us, value, z]."""
    alerts = []
    for ts_us, eid, v in matured:
        vals = [x for x in ring if x is not None]
        n = len(vals)
        if len(ring) >= min_hist and n >= 2 and v is not None:
            mu = sum(vals) / n
            var = sum((x - mu) ** 2 for x in vals) / (n - 1)
            sd = var ** 0.5
            if sd > 1e-9 and abs(v - mu) > thresh * sd:
                alerts.append([eid, ts_us, v, round((v - mu) / sd, 4)])
        ring.append(v)
        if len(ring) > window:
            ring.pop(0)
    return ring, alerts


def anomaly_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming face of win_anomaly_zscore: per-key rolling baseline
    (the last 20 values) kept in keyed state, alerts emitted the
    micro-batch their event matures past the watermark — the
    continuous-metrics 3σ alerting operator.

    State per key is EXACTLY window(=20) floats plus the not-yet-
    mature buffer (bounded by the watermark delay) — O(users) keys ×
    O(1) payload; a production deployment adds a key TTL for users
    that go silent forever, which only RELEASES state (the baseline
    restarts cold, as any TTL'd detector does)."""
    prepared = (
        events_stream.withWatermark(time_col, watermark)
        .filter(F.col(time_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(time_col).alias("ts"),
            F.col(id_col).alias("eid"),
            F.col(value_col).alias("val"),
        )
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("z", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "ring": []}
        buf, ring = st["buf"], st["ring"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                for ts, eid, v in zip(
                    ts_us.tolist(), pdf["eid"].tolist(), pdf["val"].tolist()
                ):
                    if eid is None or pd.isna(eid):
                        continue
                    buf.append(
                        [
                            int(ts),
                            int(eid),
                            None if v is None or pd.isna(v) else float(v),
                        ]
                    )

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort(key=lambda e: (e[0], e[1]))
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        ring, alerts = advance_zscore(ring, matured)

        if buf or ring:
            state.update((json.dumps({"buf": buf, "ring": ring}),))
            if buf:
                state.setTimeoutTimestamp(
                    max(
                        min(e[0] for e in buf) // _US_PER_MS + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        elif state.exists:
            state.remove()

        if alerts:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(alerts),
                    "event_id": [a[0] for a in alerts],
                    "ts": pd.to_datetime([a[1] for a in alerts], unit="us"),
                    "value": [a[2] for a in alerts],
                    "z": [a[3] for a in alerts],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_trendcorr(
    ring: list, matured: list, window: int = 30
) -> tuple[list, list]:
    """Pure rolling-correlation kernel (streaming face of
    operators/windows.win_rolling_corr), chunking-invariant: `ring` is
    the key's last ≤`window` [ts_us, value-or-None] rows in (ts, id)
    order; `matured` is the next (ts, id)-sorted batch of
    [ts_us, eid, value-or-None].

    Mirrors the batch frame exactly: the frame INCLUDES the current
    row (-29..current), a score emits only for FULL windows
    (count(*) == window), corr is over (value, epoch-milliseconds)
    with nulls occupying frame slots but excluded from the moments
    (Spark corr ignores null pairs). Numerics: time is centered on
    the frame's mean before any product — epoch-ms magnitudes
    (~1.7e12) would otherwise cancel catastrophically in Σx²-(Σx)²/n;
    centered two-pass agrees with Spark's stable incremental moments
    to well within the round(4) emitted."""
    alerts = []
    for ts_us, eid, v in matured:
        ring.append([ts_us, v])
        if len(ring) > window:
            ring.pop(0)
        if len(ring) == window:
            pairs = [
                (t // 1000, x) for t, x in ring if x is not None
            ]
            n = len(pairs)
            if n >= 2:
                mx = sum(p[0] for p in pairs) / n
                my = sum(p[1] for p in pairs) / n
                sxy = sum((p[0] - mx) * (p[1] - my) for p in pairs)
                sxx = sum((p[0] - mx) ** 2 for p in pairs)
                syy = sum((p[1] - my) ** 2 for p in pairs)
                if sxx > 0 and syy > 0:
                    c = sxy / (sxx * syy) ** 0.5
                    # + 0.0 folds IEEE -0.0 to +0.0, matching the batch
                    # face's signed-zero normalization (windows.py
                    # rolling_corr) so streaming==batch stays bit-exact.
                    alerts.append([eid, ts_us, round(c, 4) + 0.0])
    return ring, alerts


def trendcorr_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming face of win_rolling_corr: per-key trailing-30-event
    trend correlation in keyed state — the drift-direction signal,
    emitted continuously. State per key = exactly 30 (ts, value)
    pairs + the watermark-bounded buffer."""
    prepared = (
        events_stream.withWatermark(time_col, watermark)
        .filter(F.col(time_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(time_col).alias("ts"),
            F.col(id_col).alias("eid"),
            F.col(value_col).alias("val"),
        )
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("trend_corr", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "ring": []}
        buf, ring = st["buf"], st["ring"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                for ts, eid, v in zip(
                    ts_us.tolist(), pdf["eid"].tolist(), pdf["val"].tolist()
                ):
                    if eid is None or pd.isna(eid):
                        continue
                    buf.append(
                        [
                            int(ts),
                            int(eid),
                            None if v is None or pd.isna(v) else float(v),
                        ]
                    )

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort(key=lambda e: (e[0], e[1]))
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        ring, alerts = advance_trendcorr(ring, matured)

        if buf or ring:
            state.update((json.dumps({"buf": buf, "ring": ring}),))
            if buf:
                state.setTimeoutTimestamp(
                    max(
                        min(e[0] for e in buf) // _US_PER_MS + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        elif state.exists:
            state.remove()

        if alerts:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(alerts),
                    "event_id": [a[0] for a in alerts],
                    "ts": pd.to_datetime([a[1] for a in alerts], unit="us"),
                    "trend_corr": [a[2] for a in alerts],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_cusum(
    state: list | None,
    matured: list,
    mu: float,
    k: float = 5.0,
    h: float = 25.0,
) -> tuple[list, list]:
    """Pure two-sided CUSUM kernel (streaming face of
    operators/windows.win_cusum against a FIXED reference baseline —
    a stream cannot know the full-history mean upfront): state is
    [s_hi, s_lo] (None = fresh key); matured is the next
    (ts, id)-sorted batch of [ts_us, eid, value-or-None]. Null values
    are skipped (the batch twin's null policy). Alarm (either side
    exceeding h) emits and restarts both accumulators. Returns
    (state, alerts) with alerts = [eid, ts_us, value, s_hi, s_lo,
    alarm] PER ROW (the chart emits every point; `alarm` flags the
    changepoints) — O(1) state: two floats."""
    s_hi, s_lo = (0.0, 0.0) if state is None else state
    out = []
    for ts_us, eid, v in matured:
        if v is None:
            continue
        s_hi = max(0.0, s_hi + (v - mu - k))
        s_lo = max(0.0, s_lo + (mu - v - k))
        a = 1 if (s_hi > h or s_lo > h) else 0
        out.append([eid, ts_us, v, s_hi, s_lo, a])
        if a:
            s_hi = s_lo = 0.0
    return [s_hi, s_lo], out


def cusum_stream(
    events_stream: DataFrame,
    mu: float,
    k: float = 5.0,
    h: float = 25.0,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming two-sided CUSUM control chart per key against the
    reference baseline `mu` — the O(1)-state drift/changepoint alarm
    (per-key state is literally two floats plus the watermark-bounded
    buffer; the cheapest possible stateful streaming operator)."""
    prepared = (
        events_stream.withWatermark(time_col, watermark)
        .filter(F.col(time_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(time_col).alias("ts"),
            F.col(id_col).alias("eid"),
            F.col(value_col).alias("val"),
        )
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("s_hi", T.DoubleType()),
            T.StructField("s_lo", T.DoubleType()),
            T.StructField("alarm", T.IntegerType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "s": None}
        buf, s = st["buf"], st["s"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                for ts, eid, v in zip(
                    ts_us.tolist(), pdf["eid"].tolist(), pdf["val"].tolist()
                ):
                    if eid is None or pd.isna(eid):
                        continue
                    buf.append(
                        [
                            int(ts),
                            int(eid),
                            None if v is None or pd.isna(v) else float(v),
                        ]
                    )

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort(key=lambda e: (e[0], e[1]))
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        s, rows = advance_cusum(s, matured, mu, k, h)

        if buf or s != [0.0, 0.0] or rows:
            state.update((json.dumps({"buf": buf, "s": s}),))
            if buf:
                state.setTimeoutTimestamp(
                    max(
                        min(e[0] for e in buf) // _US_PER_MS + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        elif state.exists:
            state.remove()

        if rows:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(rows),
                    "event_id": [r[0] for r in rows],
                    "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
                    "value": [r[2] for r in rows],
                    "s_hi": [r[3] for r in rows],
                    "s_lo": [r[4] for r in rows],
                    "alarm": [r[5] for r in rows],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_trendruns(
    state: list | None, matured: list
) -> tuple[list | None, list]:
    """Pure maximal-monotone-run kernel (streaming face of
    operators/cep.cep_trend_runs): state is
    [prev_ts, prev_v, dir, n_steps, run_start_ts, run_start_v]
    (None = fresh key); matured is the next (ts, id)-sorted batch of
    [ts_us, eid, value-or-None] (nulls skipped — the batch twin's
    filter). A run EMITS the moment an event breaks it (direction
    change, equal value) — runs are event-closed, never time-closed,
    so per-key state is O(1) and the open tail run simply waits for
    its breaking event. Emits [direction(+1/-1), start_ts_us,
    end_ts_us, n_steps, delta] for runs of >= 2 transitions."""
    out = []
    st = state
    for ts, _eid, v in matured:
        if v is None:
            continue
        if st is None:
            st = [ts, v, 0, 0, ts, v]
            continue
        prev_ts, prev_v, d, n, rs_ts, rs_v = st
        d_new = 1 if v > prev_v else (-1 if v < prev_v else 0)
        if d_new == d and d != 0:
            st = [ts, v, d, n + 1, rs_ts, rs_v]
        else:
            if d != 0 and n >= 2:
                out.append([d, rs_ts, prev_ts, n, round(prev_v - rs_v, 6)])
            if d_new != 0:
                st = [ts, v, d_new, 1, prev_ts, prev_v]
            else:
                st = [ts, v, 0, 0, ts, v]
    return st, out


def trendruns_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming face of cep_trend_runs: maximal strictly-monotone
    runs per key, emitted when broken. O(1) keyed state (six scalars
    + the watermark-bounded buffer)."""
    prepared = (
        events_stream.withWatermark(time_col, watermark)
        .filter(F.col(time_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(time_col).alias("ts"),
            F.col(id_col).alias("eid"),
            F.col(value_col).alias("val"),
        )
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("direction", T.StringType()),
            T.StructField("start_ts", T.TimestampType()),
            T.StructField("end_ts", T.TimestampType()),
            T.StructField("n_steps", T.LongType()),
            T.StructField("delta", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "run": None}
        buf, run = st["buf"], st["run"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                for ts, eid, v in zip(
                    ts_us.tolist(), pdf["eid"].tolist(), pdf["val"].tolist()
                ):
                    if eid is None or pd.isna(eid):
                        continue
                    buf.append(
                        [
                            int(ts),
                            int(eid),
                            None if v is None or pd.isna(v) else float(v),
                        ]
                    )

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort(key=lambda e: (e[0], e[1]))
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        run, rows = advance_trendruns(run, matured)

        if buf or run is not None:
            state.update((json.dumps({"buf": buf, "run": run}),))
            if buf:
                state.setTimeoutTimestamp(
                    max(
                        min(e[0] for e in buf) // _US_PER_MS + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        elif state.exists:
            state.remove()

        if rows:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(rows),
                    "direction": [
                        "up" if r[0] == 1 else "down" for r in rows
                    ],
                    "start_ts": pd.to_datetime(
                        [r[1] for r in rows], unit="us"
                    ),
                    "end_ts": pd.to_datetime(
                        [r[2] for r in rows], unit="us"
                    ),
                    "n_steps": [r[3] for r in rows],
                    "delta": [r[4] for r in rows],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_vshape(
    state: list | None, matured: list
) -> tuple[list, list]:
    """Pure V-shape kernel (streaming face of operators/cep.cep_vshape)
    layered ON the trend-run kernel: state is [trendruns_state,
    pending_down_run]; each run advance_trendruns closes feeds the
    adjacency check — a closed DOWN run is held (one tuple), and the
    next closed UP run emits a V iff it starts at the held run's end
    (the shared trough — exactly the batch join condition; runs close
    in event order per key, so holding only the LAST down run is
    sufficient). Emits [start_ts, trough_ts, end_ts, down_steps,
    up_steps, drop_delta, rebound_delta]."""
    tr_state, pend_down = state if state is not None else (None, None)
    tr_state, runs = advance_trendruns(tr_state, matured)
    out = []
    for d, s_ts, e_ts, n, delta in runs:
        if d == -1:
            pend_down = [s_ts, e_ts, n, delta]
        else:
            if pend_down is not None and pend_down[1] == s_ts:
                out.append(
                    [pend_down[0], s_ts, e_ts, pend_down[2], n,
                     pend_down[3], delta]
                )
            pend_down = None
    return [tr_state, pend_down], out


def vshape_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming V-shape detection per key (drawdown-and-rebound
    alarms as they complete). State = the trend-run scalars + at most
    one held down-run tuple — still O(1) per key."""
    prepared = (
        events_stream.withWatermark(time_col, watermark)
        .filter(F.col(time_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(time_col).alias("ts"),
            F.col(id_col).alias("eid"),
            F.col(value_col).alias("val"),
        )
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("start_ts", T.TimestampType()),
            T.StructField("trough_ts", T.TimestampType()),
            T.StructField("end_ts", T.TimestampType()),
            T.StructField("down_steps", T.LongType()),
            T.StructField("up_steps", T.LongType()),
            T.StructField("drop_delta", T.DoubleType()),
            T.StructField("rebound_delta", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "v": None}
        buf, vstate = st["buf"], st["v"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                for ts, eid, v in zip(
                    ts_us.tolist(), pdf["eid"].tolist(), pdf["val"].tolist()
                ):
                    if eid is None or pd.isna(eid):
                        continue
                    buf.append(
                        [
                            int(ts),
                            int(eid),
                            None if v is None or pd.isna(v) else float(v),
                        ]
                    )

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort(key=lambda e: (e[0], e[1]))
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        vstate, vees = advance_vshape(vstate, matured)

        if buf or vstate != [None, None]:
            state.update((json.dumps({"buf": buf, "v": vstate}),))
            if buf:
                state.setTimeoutTimestamp(
                    max(
                        min(e[0] for e in buf) // _US_PER_MS + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        elif state.exists:
            state.remove()

        if vees:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(vees),
                    "start_ts": pd.to_datetime(
                        [r[0] for r in vees], unit="us"
                    ),
                    "trough_ts": pd.to_datetime(
                        [r[1] for r in vees], unit="us"
                    ),
                    "end_ts": pd.to_datetime(
                        [r[2] for r in vees], unit="us"
                    ),
                    "down_steps": [r[3] for r in vees],
                    "up_steps": [r[4] for r in vees],
                    "drop_delta": [r[5] for r in vees],
                    "rebound_delta": [r[6] for r in vees],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_rollmedian(
    ring: list | None, matured: list
) -> tuple[list, list]:
    """Pure rolling-median/MAD kernel (streaming face of
    operators/windows.win_rolling_median), chunking-invariant: `ring`
    holds the key's last <=10 [value-or-None] entries in (ts, id)
    order (ROW positions — nulls occupy slots, mirroring the batch
    ROWS BETWEEN 10 PRECEDING AND CURRENT ROW frame); per matured row
    the frame's non-null values (ring + current) feed the exact
    median / MAD, with the Hampel gate n>=7, mad>1e-12,
    |v-med| > 3*1.4826*mad. Median/MAD are element picks and one
    two-value average — bit-identical to the batch array expressions.
    Emits [eid, ts_us, value, med, mad, outlier] with med/mad RAW
    (the wrapper rounds JVM-side so HALF_UP matches the batch op)."""
    ring = ring if ring is not None else []

    def med_of(vals: list) -> float | None:
        n = len(vals)
        if n == 0:
            return None
        if n % 2 == 1:
            return vals[n // 2]
        return (vals[n // 2 - 1] + vals[n // 2]) / 2.0

    out = []
    for ts_us, eid, v in matured:
        vals = sorted(x for x in ring if x is not None)
        if v is not None:
            vals = sorted(vals + [v])
        med = med_of(vals)
        mad = (
            med_of(sorted(abs(x - med) for x in vals))
            if med is not None
            else None
        )
        outlier = bool(
            v is not None
            and med is not None
            and len(vals) >= 7
            and mad > 1e-12
            and abs(v - med) > 3 * 1.4826 * mad
        )
        out.append([eid, ts_us, v, med, mad, outlier])
        ring.append(v)
        if len(ring) > 10:
            ring.pop(0)
    return ring, out


def rollmedian_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming face of win_rolling_median: per-key 10-slot ring in
    keyed state, every matured event emitted with its robust
    median/MAD smoothing and Hampel outlier flag. State is O(frame)
    per key by construction."""
    prepared = (
        events_stream.withWatermark(time_col, watermark)
        .filter(F.col(time_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(time_col).alias("ts"),
            F.col(id_col).alias("eid"),
            F.col(value_col).alias("val"),
        )
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("med_raw", T.DoubleType()),
            T.StructField("mad_raw", T.DoubleType()),
            T.StructField("is_outlier", T.BooleanType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "ring": []}
        buf, ring = st["buf"], st["ring"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                for ts, eid, v in zip(
                    ts_us.tolist(), pdf["eid"].tolist(), pdf["val"].tolist()
                ):
                    if eid is None or pd.isna(eid):
                        continue
                    buf.append(
                        [
                            int(ts),
                            int(eid),
                            None if v is None or pd.isna(v) else float(v),
                        ]
                    )

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort(key=lambda e: (e[0], e[1]))
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        ring, rows = advance_rollmedian(ring, matured)

        if buf or ring:
            state.update((json.dumps({"buf": buf, "ring": ring}),))
            if buf:
                state.setTimeoutTimestamp(
                    max(
                        min(e[0] for e in buf) // _US_PER_MS + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        elif state.exists:
            state.remove()

        if rows:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(rows),
                    "event_id": [r[0] for r in rows],
                    "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
                    "value": [r[2] for r in rows],
                    "med_raw": [r[3] for r in rows],
                    "mad_raw": [r[4] for r in rows],
                    "is_outlier": [r[5] for r in rows],
                }
            )

    raw = bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )
    return raw.select(
        "key",
        "event_id",
        "ts",
        "value",
        F.round("med_raw", 6).alias("roll_med"),
        F.round("mad_raw", 6).alias("roll_mad"),
        "is_outlier",
    )


def advance_holt(
    state: list | None, matured: list
) -> tuple[list, list]:
    """Pure Holt level+trend kernel (streaming face of
    operators/windows.win_holt), chunking-invariant: state = [l, b]
    (two floats — None until the key's first event), matured =
    [ts_us, eid, value] rows in (ts, id) order. The recurrence is
    written operation-for-operation identically to the batch pandas
    loop (and its recursive-CTE oracle), so doubles agree
    bit-for-bit; a NaN/None value poisons the level exactly like the
    batch loop (float NaN propagation, no special-casing). Emits
    [eid, ts_us, value, level, trend, forecast]."""
    l, b = state if state is not None else (None, None)
    out = []
    for ts_us, eid, v in matured:
        x = float("nan") if v is None else v
        if l is None:
            l, b = x, 0.0
        else:
            l2 = 0.5 * x + 0.5 * (l + b)
            b = 0.3 * (l2 - l) + 0.7 * b
            l = l2
        out.append([eid, ts_us, v, l, b, l + b])
    return [l, b], out


def holt_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming face of win_holt: per-key double-exponential
    smoothing with O(1) state (level + trend floats), every matured
    event emitted with its one-step-ahead forecast — the continuous
    drift monitor."""
    prepared = (
        events_stream.withWatermark(time_col, watermark)
        .filter(F.col(time_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(time_col).alias("ts"),
            F.col(id_col).alias("eid"),
            F.col(value_col).alias("val"),
        )
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("level", T.DoubleType()),
            T.StructField("trend", T.DoubleType()),
            T.StructField("forecast", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "lb": None}
        buf, lb = st["buf"], st["lb"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                for ts, eid, v in zip(
                    ts_us.tolist(), pdf["eid"].tolist(), pdf["val"].tolist()
                ):
                    if eid is None or pd.isna(eid):
                        continue
                    buf.append(
                        [
                            int(ts),
                            int(eid),
                            None if v is None or pd.isna(v) else float(v),
                        ]
                    )

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort(key=lambda e: (e[0], e[1]))
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        lb, rows = advance_holt(lb, matured)
        if lb == [None, None]:
            lb = None

        if buf or lb is not None:
            state.update((json.dumps({"buf": buf, "lb": lb}),))
            if buf:
                state.setTimeoutTimestamp(
                    max(
                        min(e[0] for e in buf) // _US_PER_MS + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        elif state.exists:
            state.remove()

        if rows:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(rows),
                    "event_id": [r[0] for r in rows],
                    "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
                    "value": [r[2] for r in rows],
                    "level": [r[3] for r in rows],
                    "trend": [r[4] for r in rows],
                    "forecast": [r[5] for r in rows],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_ewma(
    state: float | None, matured: list
) -> tuple[float | None, list]:
    """Pure EWMA kernel (streaming face of operators/windows.win_ewma):
    state is the key's last smoothed value (None = fresh key); matured
    is the next (ts, id)-sorted batch of [ts_us, eid, value-or-None].
    The recurrence is written with the SAME literal coefficients as
    the batch pandas scan and the recursive-CTE oracle
    (y = 0.3·x + 0.7·y_prev — note 0.7 as a literal, NOT 1−0.3, which
    is 0.7000000000000001 in IEEE754) so all three faces agree
    bit-for-bit. A null value becomes NaN and poisons the tail exactly
    like the batch pandas column arithmetic. O(1) state: one float.
    Chunking-invariant by construction (the state after a prefix is
    the value the next chunk resumes from — property-tested)."""
    prev = state
    out = []
    for ts_us, eid, v in matured:
        x = float("nan") if v is None else v
        prev = x if prev is None else 0.3 * x + 0.7 * prev
        out.append([eid, ts_us, v, prev])
    return prev, out


def ewma_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming per-key EWMA — the standard monitoring smoother as a
    stateful operator: rows buffer until the watermark passes (the
    recurrence needs event-time order; late data within the watermark
    slots into place), then fold through advance_ewma. Per-key state
    is ONE float plus the watermark-bounded buffer."""
    prepared = (
        events_stream.withWatermark(time_col, watermark)
        .filter(F.col(time_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(time_col).alias("ts"),
            F.col(id_col).alias("eid"),
            F.col(value_col).alias("val"),
        )
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ewma", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "p": None}
        buf, p = st["buf"], st["p"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                for ts, eid, v in zip(
                    ts_us.tolist(), pdf["eid"].tolist(), pdf["val"].tolist()
                ):
                    if eid is None or pd.isna(eid):
                        continue
                    buf.append(
                        [
                            int(ts),
                            int(eid),
                            None if v is None or pd.isna(v) else float(v),
                        ]
                    )

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort(key=lambda e: (e[0], e[1]))
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        p, rows = advance_ewma(p, matured)

        if buf or p is not None:
            state.update((json.dumps({"buf": buf, "p": p}),))
            if buf:
                state.setTimeoutTimestamp(
                    max(
                        min(e[0] for e in buf) // _US_PER_MS + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        elif state.exists:
            state.remove()

        if rows:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(rows),
                    "event_id": [r[0] for r in rows],
                    "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
                    "value": [r[2] for r in rows],
                    "ewma": [r[3] for r in rows],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_drawdown(
    state: list | None, matured: list
) -> tuple[list, list]:
    """Pure max-drawdown kernel (streaming face of
    operators/windows.win_drawdown): state is [run_max, max_dd] in
    exact cents (None = fresh key); matured is the next
    (ts, id)-sorted batch of [ts_us, eid, cents-or-None]. Null values
    are skipped (the batch twin's filter). Emits every point with its
    running max, current drawdown, and the running max drawdown —
    exact integer arithmetic end to end, O(1) state: two ints.
    Chunking-invariant by construction (property-tested)."""
    rm, mdd = (None, 0) if state is None else state
    out = []
    for ts_us, eid, cents in matured:
        if cents is None:
            continue
        rm = cents if rm is None else max(rm, cents)
        dd = cents - rm
        mdd = min(mdd, dd)
        out.append([eid, ts_us, cents, rm, dd, mdd])
    return [rm, mdd], out


def drawdown_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming per-key max drawdown — the loss-monitoring analytic
    as a continuous chart: every event emits its level, running peak,
    current drawdown and worst drawdown so far (the final row per key
    equals win_drawdown's whole-history aggregate). Exact cents; two
    ints of per-key state plus the watermark-bounded buffer."""
    prepared = (
        events_stream.withWatermark(time_col, watermark)
        .filter(F.col(time_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(time_col).alias("ts"),
            F.col(id_col).alias("eid"),
            F.round(F.col(value_col) * 100).cast("long").alias("cents"),
        )
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("cents", T.LongType()),
            T.StructField("run_max", T.LongType()),
            T.StructField("drawdown", T.LongType()),
            T.StructField("max_drawdown", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "s": None}
        buf, s = st["buf"], st["s"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                for ts, eid, c in zip(
                    ts_us.tolist(), pdf["eid"].tolist(), pdf["cents"].tolist()
                ):
                    if eid is None or pd.isna(eid):
                        continue
                    buf.append(
                        [
                            int(ts),
                            int(eid),
                            None if c is None or pd.isna(c) else int(c),
                        ]
                    )

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort(key=lambda e: (e[0], e[1]))
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        s, rows = advance_drawdown(s, matured)

        if buf or s != [None, 0]:
            state.update((json.dumps({"buf": buf, "s": s}),))
            if buf:
                state.setTimeoutTimestamp(
                    max(
                        min(e[0] for e in buf) // _US_PER_MS + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        elif state.exists:
            state.remove()

        if rows:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(rows),
                    "event_id": [r[0] for r in rows],
                    "ts": pd.to_datetime([r[1] for r in rows], unit="us"),
                    "cents": [r[2] for r in rows],
                    "run_max": [r[3] for r in rows],
                    "drawdown": [r[4] for r in rows],
                    "max_drawdown": [r[5] for r in rows],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_retention(
    state: int | None, matured: list
) -> tuple[int | None, list]:
    """Pure day-over-day retention kernel (streaming face of
    streaming/windows.stream_retention): state is the key's last
    active UTC day index (None = never seen); matured is the next
    (ts, id)-sorted batch of [ts_us, eid]. Emits one mark per NEW
    active day: [day_idx, returning, new] where returning=1 iff the
    day is exactly last+1 (consecutive-day retention) and new=1 iff
    the key was never active before — a lapsed reactivation (gap > 1
    day) is neither. O(1) state: one int. Chunking-invariant by
    construction (property-tested)."""
    last = state
    out = []
    for ts_us, _eid in matured:
        d = ts_us // 86_400_000_000
        if last is None:
            out.append([d, 0, 1])
            last = d
        elif d > last:
            out.append([d, 1 if d == last + 1 else 0, 0])
            last = d
    return last, out


def retention_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming per-user activity marks — the incremental layout of
    daily-active/returning/new-user analytics: each user emits at most
    one (day, returning, new) mark per active day, and the per-day
    rollup of the marks equals stream_retention's batch aggregate.
    Per-key state is ONE integer (last active day) plus the
    watermark-bounded buffer — the cheapest possible exact-retention
    state, vs. the bitmap batch spelling (agg_bitmap_retention) that
    re-aggregates history every run."""
    prepared = (
        events_stream.withWatermark(time_col, watermark)
        .filter(F.col(time_col).isNotNull() & F.col(key_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            F.col(time_col).alias("ts"),
            F.col(id_col).alias("eid"),
        )
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("day", T.TimestampType()),
            T.StructField("returning", T.IntegerType()),
            T.StructField("new", T.IntegerType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "s": None}
        buf, s = st["buf"], st["s"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                for ts, eid in zip(ts_us.tolist(), pdf["eid"].tolist()):
                    if eid is None or pd.isna(eid):
                        continue
                    buf.append([int(ts), int(eid)])

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort(key=lambda e: (e[0], e[1]))
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        s, rows = advance_retention(s, matured)

        if buf or s is not None:
            state.update((json.dumps({"buf": buf, "s": s}),))
            if buf:
                state.setTimeoutTimestamp(
                    max(
                        min(e[0] for e in buf) // _US_PER_MS + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        elif state.exists:
            state.remove()

        if rows:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(rows),
                    "day": pd.to_datetime(
                        [r[0] * 86_400_000_000 for r in rows], unit="us"
                    ),
                    "returning": [r[1] for r in rows],
                    "new": [r[2] for r in rows],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


_RUN_AGG_WITHIN_US = 7 * 86_400 * 1_000_000


def advance_run_agg(
    state: list | None, matured: list, wm_us: int
) -> tuple[list | None, list]:
    """Pure running-aggregate kleene kernel — the standard
    MATCH_RECOGNIZE DEFINE-aggregate semantics, reachable both as the
    standalone cep_run_agg operator and (round 7) from MATCH_RECOGNIZE
    text via cep_sql_run_agg: PATTERN (A -> B+) where
    A = signup anchors a run and each candidate B = view binds iff,
    INCLUDING itself, value ≤ 1.5 × the run's running average
    (standard MATCH_RECOGNIZE DEFINE-aggregate semantics, RUNNING,
    current row included) — in exact cross-multiplied integers:
    2·cents·(n+1) ≤ 3·(sum+cents).  The run force-closes at
    anchor + 7 days (WITHIN), at a failing B row, or never on ignored
    rows (other event types / NULL values — relaxed matching).  A
    match emits [anchor_us, n_b, sum_b_cents] when ≥ 1 row bound.

    state: None (idle) or [n, sum, anchor_us, deadline_us] for the
    open run; matured: (ts, id)-sorted [ts_us, eid, etype, cents];
    wm_us closes runs whose deadline has passed even with no further
    events (the wrapper sets an event-time timer at the deadline).
    O(1) state; chunking-invariant given monotone wm (property-
    tested).

    Since round 7 this is one instantiation of the generic
    advance_kleene_agg (the MATCH_RECOGNIZE dialect compiles
    DEFINE-aggregate text to the same kernel — cep_sql_run_agg):
    anchor/candidate booleans are evaluated here, the bind predicate
    is the exact cross-multiplied 3/2 average cap."""
    rows = [
        [ts, eid, et == "signup", et == "view", c]
        for ts, eid, et, c in matured
    ]
    return advance_kleene_agg(
        state, rows, wm_us, _run_agg_bind, _RUN_AGG_WITHIN_US
    )


def _run_agg_bind(n: int, s: int, c: int) -> bool:
    """cents ≤ 1.5 × running avg INCLUDING the candidate, exact
    cross-multiplied integers: 2·c·(n+1) ≤ 3·(s+c)."""
    return 2 * c * (n + 1) <= 3 * (s + c)


def advance_kleene_agg(
    state: list | None,
    matured: list,
    wm_us: int,
    bind,
    within_us: int,
    confirm: bool = False,
    min_n: int = 1,
    max_n: int | None = None,
    corr=None,
    emit_rows: bool = False,
    combine=None,
) -> tuple[list | None, list]:
    """Generic running-aggregate kleene kernel — PATTERN (A -> B+)
    WITHIN <bound> where each candidate B binds iff `bind(n, s, v)`
    holds with the run's current count/sum and the candidate's value
    (standard MATCH_RECOGNIZE DEFINE-aggregate semantics: RUNNING, the
    current row included).  This is the single kernel behind BOTH the
    standalone cep_run_agg operator and the SQL dialect's
    DEFINE-aggregate compilation (cep_sql.py _compile_run_agg); the
    batch face applies it per key via applyInPandas, the streaming
    face via applyInPandasWithState — one source of truth.

    matured: (ts, id)-sorted [ts_us, eid, is_anchor, is_cand, val]
    rows — the anchor/candidate predicates are evaluated JVM-side
    (plain Spark SQL booleans) so only the run-dependent aggregate
    check runs in Python.  Row handling: an anchor row opens a run
    when idle; a candidate row with non-NULL val either extends the
    run (bind true) or closes it (bind false, the failing row is
    consumed — it cannot anchor the next match); every other row is
    ignored (relaxed contiguity).  The run force-closes past
    anchor + within_us; a close emits [anchor_us, n, s] when ≥ 1 row
    bound.

    confirm=True switches to the terminal-confirm shape
    PATTERN (A -> B+ -> C) (round-8 verdict item 3): rows carry a
    sixth element is_conf, and a match exists ONLY when a confirm row
    arrives while the run is open with ≥ 1 bound B — emitting
    [anchor_us, n, s, conf_ts_us] and consuming the C row (SKIP PAST
    LAST ROW).  Greedy B+ first: a row that both bind-extends and
    confirms extends; a bind-FAILING row that also confirms closes
    the match (the NFA's B+ branch dies, its C branch completes).  A
    confirm row with n == 0 is skipped (relaxed contiguity — B+ needs
    ≥ 1 row, so A·C alone is not a match and noise rows don't kill
    partials).  Deadline/watermark expiry and bind-failing rows kill
    the run WITHOUT emitting — an unconfirmed run is not a match.

    min_n / max_n are the {n,m} quantifier bounds of the Kleene step
    (round-8 generality notch: PATTERN (A -> B{2,4}) with a
    DEFINE-aggregate).  Semantics, derived from the greedy NFA:
    min_n gates EVERY emission (a run closing with fewer bound rows
    than the quantifier's minimum is not a match and dies silently);
    max_n saturates B — in the 2-step shape the match completes AT
    the max-th binding row (greedy: nothing more can bind, the
    pattern ends — emit immediately and consume through that row),
    while in the confirm shape the run stays open awaiting C, and
    candidate rows arriving while saturated are noise (no live
    B-extension branch exists, so their bind predicate is never
    evaluated — neither binding nor failing).  A confirm row with
    n < min_n is likewise noise (C cannot match before B{min}
    completes), UNLESS it is also a bind-failing candidate, in which
    case the candidate branch consumes it and the run dies (existing
    failing-row rule).  Defaults (1, None) are exactly B+.

    corr (round-8) carries an anchor-correlation conjunct
    (B.col CMP A.col): rows extend to [..., is_conf, bx, ay], the
    anchor's ay is captured into the state when the run opens (an
    anchor row with NULL ay cannot open — SQL 3VL), and a candidate
    additionally needs corr(bx, ay) to bind; a candidate with NULL bx
    is a NON-candidate (noise), mirroring the coalesce(pred, FALSE)
    discipline of the JVM-side predicates.  A candidate failing
    EITHER the aggregate bind or the anchor comparison is a failing
    row (consumed, run dies).

    emit_rows=True (round-9, the ALL ROWS PER MATCH face) switches the
    emission from one record per match to one record PER BOUND ROW of
    each emitted match: state gains a trailing row buffer (the match's
    rows are unknown-complete until the match closes, so FINAL measures
    force buffering — O(rows-per-match) state, bounded by the WITHIN
    deadline), and each emission record is
    [row_ts_us, row_eid, cls, n_run, s_run, n_final, s_final,
    anchor_us, conf_us|None] where cls ∈ {0: anchor, 1: bound
    candidate, 2: confirm} and (n_run, s_run) are the RUNNING
    count/sum AT that row (0/0 on the anchor row; == final on the
    confirm row — SQL-standard RUNNING vs FINAL semantics).  WHICH
    matches emit is unchanged — the flag only widens what a match
    emission contains, so the two faces share every close rule.

    combine (round-9, the MIN/MAX DEFINE forms) replaces the
    accumulator's update rule: default None keeps the exact running
    SUM (st[1] += v); a callable folds st[1] = combine(st[1], v) with
    the FIRST bound value seeding the accumulator (min/max over an
    empty run is undefined, so the seed is v itself — for sum the
    seed v equals 0 + v, which is why one rule serves all forms).
    The bind predicate still receives (n, s, v) and computes its own
    RUNNING view including v.

    state: None (idle) or [n, acc, anchor_us, deadline_us(, ay)
    (, rows_buf)] — confirm adds no state, corr adds the one anchor
    value, emit_rows appends the row buffer LAST.  O(1) state without
    emit_rows; chunking-invariant given monotone wm (property-tested)."""
    st = None if state is None else list(state)
    out = []

    def _emit(conf_rec=None):
        """One match emission — per-match record, or per-row records
        (+ the confirm row) under emit_rows."""
        if not emit_rows:
            rec = [st[2], st[0], st[1]]
            if conf_rec is not None:
                rec.append(conf_rec[0])
            out.append(rec)
            return
        n_fin, s_fin = st[0], st[1]
        conf_us = conf_rec[0] if conf_rec is not None else None
        recs = st[-1] if conf_rec is None else st[-1] + [conf_rec]
        for r in recs:
            out.append(
                [r[0], r[1], r[2], r[3], r[4], n_fin, s_fin, st[2], conf_us]
            )

    for row in matured:
        ts, eid, is_a, is_c, v = row[:5]
        is_conf = confirm and row[5]
        if corr is not None:
            bx, ay_row = row[6], row[7]
            if is_c and bx is None:
                is_c = False
        if st is not None and ts > st[3]:
            if not confirm and st[0] >= min_n:
                _emit()
            st = None
        sat = st is not None and max_n is not None and st[0] >= max_n
        if st is None:
            if is_a and (corr is None or ay_row is not None):
                st = [0, 0, ts, ts + within_us]
                if corr is not None:
                    st.append(ay_row)
                if emit_rows:
                    st.append([[ts, eid, 0, 0, 0]])
        elif (
            is_c
            and v is not None
            and not sat
            and bind(st[0], st[1], v)
            and (corr is None or corr(bx, st[4]))
        ):
            st[0] += 1
            if combine is None:
                st[1] += v
            else:
                st[1] = v if st[0] == 1 else combine(st[1], v)
            if emit_rows:
                st[-1].append([ts, eid, 1, st[0], st[1]])
            if not confirm and max_n is not None and st[0] == max_n:
                # greedy completion: B is saturated and the 2-step
                # pattern has nowhere to extend — the match ends at
                # this row (SKIP PAST LAST ROW consumes through it)
                _emit()
                st = None
        elif is_conf and st[0] >= min_n:
            _emit([ts, eid, 2, st[0], st[1]])
            st = None
        elif is_c and v is not None and not sat:
            # bind false: the failing row is consumed, the run dies —
            # unconfirmed / sub-min runs emit nothing
            if not confirm and st[0] >= min_n:
                _emit()
            st = None
    # strictly-less: the event path accepts ts == deadline, so a
    # watermark landing exactly on the deadline must NOT close the run
    # (a tie event can still arrive in the next chunk) — closing on <=
    # broke chunking invariance at the boundary (code-review catch,
    # reproduced: whole [[0,3,300]] vs chunked [[0,2,200]]).
    if st is not None and st[3] < wm_us:
        if not confirm and st[0] >= min_n:
            _emit()
        st = None
    return st, out


def run_agg_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming face of operators/cep.cep_run_agg: the running-
    aggregate kleene kernel behind applyInPandasWithState.  Per-key
    state = the open run's [n, sum, anchor, deadline] (four ints)
    plus the watermark buffer; the event-time timer is set at
    min(buffered ts, open-run DEADLINE) so a run with no further
    events still closes and emits when the watermark passes
    anchor + 7 days — the WITHIN-bound emission no batch recompute
    can deliver at streaming latency."""
    prepared = (
        events_stream.withWatermark(time_col, watermark)
        .filter(
            F.col(time_col).isNotNull()
            & F.col(key_col).isNotNull()
            & (F.col("value").isNull() | (F.abs("value") <= 1e9))
        )
        .select(
            F.col(key_col).alias("key"),
            F.col(time_col).alias("ts"),
            F.col(id_col).alias("eid"),
            F.col("event_type").alias("et"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("anchor_ts", T.TimestampType()),
            T.StructField("n_b", T.LongType()),
            T.StructField("sum_b_cents", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "s": None}
        buf, s = st["buf"], st["s"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                for ts, eid, et, c in zip(
                    ts_us.tolist(),
                    pdf["eid"].tolist(),
                    pdf["et"].tolist(),
                    pdf["cents"].tolist(),
                ):
                    # NULL event_id maps to 0 (sort tie-break only) —
                    # the batch face keeps such rows; dropping them
                    # here would diverge streaming from batch.
                    buf.append(
                        [
                            int(ts),
                            0 if eid is None or pd.isna(eid) else int(eid),
                            None if et is None else str(et),
                            None if c is None or pd.isna(c) else int(c),
                        ]
                    )

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort(key=lambda e: (e[0], e[1]))
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        s, rows = advance_run_agg(s, matured, wm_us)

        if buf or s is not None:
            state.update((json.dumps({"buf": buf, "s": s}),))
            timers = []
            if buf:
                timers.append(min(e[0] for e in buf) // _US_PER_MS + 1)
            if s is not None:
                # wake at the open run's deadline to close + emit
                timers.append(s[3] // _US_PER_MS + 1)
            state.setTimeoutTimestamp(
                max(min(timers), state.getCurrentWatermarkMs() + 1)
            )
        elif state.exists:
            state.remove()

        if rows:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(rows),
                    "anchor_ts": pd.to_datetime(
                        [r[0] for r in rows], unit="us"
                    ),
                    "n_b": [r[1] for r in rows],
                    "sum_b_cents": [r[2] for r in rows],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def kleene_agg_out_fields(out_spec: list, integral: bool) -> list:
    """Output StructFields for a kleene-agg out_spec — shared by the
    batch (applyInPandas) and streaming (applyInPandasWithState)
    faces so their schemas can never drift.  out_spec entries are
    (column name, kind) with kind ∈ {'t_anchor', 't_conf', 'n', 's',
    'avg'}: the anchor / confirm timestamps, the bound-row count, the
    exact running sum (long for integral inputs, double otherwise),
    and the sum/count average (always double).  The emit_rows (ALL
    ROWS PER MATCH) face adds: 'row_ts'/'row_eid' (the bound row
    itself), 'cls' (the classifier step name), and the RUNNING twins
    'rn'/'rs'/'ravg' (count/sum/avg AT the row — NULL sum/avg on the
    anchor row, where zero rows have bound)."""
    kind_t = {
        "t_anchor": T.TimestampType(),
        "t_conf": T.TimestampType(),
        "n": T.LongType(),
        # anchor-INCLUSIVE bound-row count — the leading-Kleene
        # (A+ -> B) face, where the anchor is the +'s first binding
        "n1": T.LongType(),
        "s": T.LongType() if integral else T.DoubleType(),
        "avg": T.DoubleType(),
        "row_ts": T.TimestampType(),
        "row_eid": T.LongType(),
        "cls": T.StringType(),
        "rn": T.LongType(),
        "rn1": T.LongType(),
        "rs": T.LongType() if integral else T.DoubleType(),
        "ravg": T.DoubleType(),
        "mn": T.LongType(),
    }
    return [T.StructField(name, kind_t[kind]) for name, kind in out_spec]


def assign_match_numbers(rows: list, emit_rows: bool, start: int) -> int:
    """Append MATCH_NUMBER() (1-based, per key, in match-close order)
    to each emission record IN PLACE and return the updated counter.
    Call BEFORE filter_excluded_rows — an excluded anchor row must
    still advance the numbering.  SKIP PAST LAST ROW runs never
    overlap, so close order == anchor order == the standard's
    numbering.  The counter lives in the caller (batch: 0 per
    partition; streaming: persisted in the state payload so numbers
    keep increasing across micro-batches — chunking-invariant)."""
    mn = start
    if emit_rows:
        for r in rows:
            if r[2] == 0:  # each match's records lead with its anchor
                mn += 1
            r.append(mn)
    else:
        for r in rows:
            mn += 1
            r.append(mn)
    return mn


def filter_excluded_rows(rows: list, exclude_cls: tuple) -> list:
    """Drop emit_rows records whose classifier code is excluded —
    the {- step -} ALL ROWS semantics (excluded rows vanish from the
    OUTPUT but still feed the measures, which were accumulated before
    this filter).  One helper so the batch and streaming faces cannot
    drift."""
    if not exclude_cls:
        return rows
    return [r for r in rows if r[2] not in exclude_cls]


def kleene_agg_out_columns(
    rows: list,
    out_spec: list,
    emit_rows: bool = False,
    cls_names: tuple = (),
) -> dict:
    """Materialize kernel emission rows ([anchor_us, n, s] or
    [anchor_us, n, s, conf_us]; under emit_rows [row_ts, row_eid, cls,
    n_run, s_run, n_fin, s_fin, anchor_us, conf_us]) into
    {column name: values} per the out_spec — the single row→column
    mapping both faces use.  'avg' divides the EXACT accumulators
    (Python int/int true division is correctly rounded, identical to
    the oracle's double division for magnitudes < 2^53 — the cents
    domain bound guarantees that).  RUNNING sum/avg are NULL when no
    row has bound yet (SQL: aggregate over the empty set)."""
    if emit_rows:
        makers = {
            "row_ts": lambda r: r[0],
            "row_eid": lambda r: r[1],
            "cls": lambda r: cls_names[r[2]],
            "rn": lambda r: r[3],
            # anchor-inclusive running count (leading Kleene: the
            # anchor IS the +'s first binding, so its row counts 1)
            "rn1": lambda r: r[3] + 1,
            "rs": lambda r: r[4] if r[3] else None,
            "ravg": lambda r: r[4] / r[3] if r[3] else None,
            "n": lambda r: r[5],
            "n1": lambda r: r[5] + 1,
            "s": lambda r: r[6],
            "avg": lambda r: r[6] / r[5],
            "t_anchor": lambda r: r[7],
            "t_conf": lambda r: r[8],
            # assign_match_numbers appends mn LAST (only when requested)
            "mn": lambda r: r[-1],
        }
    else:
        makers = {
            "t_anchor": lambda r: r[0],
            "t_conf": lambda r: r[3],
            "n": lambda r: r[1],
            "n1": lambda r: r[1] + 1,  # leading Kleene: anchor included
            "s": lambda r: r[2],
            "avg": lambda r: r[2] / r[1],
            "mn": lambda r: r[-1],
        }
    data = {}
    for name, kind in out_spec:
        vals = [makers[kind](r) for r in rows]
        if kind in ("t_anchor", "t_conf", "row_ts"):
            vals = pd.to_datetime(vals, unit="us")
        data[name] = vals
    return data


def kleene_agg_stream(
    prepared: DataFrame,
    bind,
    within_us: int,
    out_spec: list,
    integral: bool,
    confirm: bool = False,
    min_n: int = 1,
    max_n: int | None = None,
    key_cols: tuple = ("key",),
    corr=None,
    corr_convs: tuple | None = None,
    emit_rows: bool = False,
    exclude_cls: tuple = (),
    cls_names: tuple = (),
    combine=None,
) -> DataFrame:
    """Streaming face of the dialect's DEFINE-aggregate compilation
    (cep_sql.py _compile_run_agg): the generic advance_kleene_agg
    kernel behind applyInPandasWithState.

    `prepared` must already carry the watermark and the projection
    (key, ts, eid, __is_a, __is_c, __v[, __is_conf when confirm]) —
    the anchor/candidate/confirm predicates are plain Spark SQL
    booleans evaluated JVM-side, so the Python boundary moves a few
    narrow columns, not the event row.  out_spec = [(name, kind)]
    per kleene_agg_out_fields (MEASURES compile to renames of the
    kernel's fixed outputs — no extra state);
    `integral` converts __v via int() (arbitrary-precision sums —
    the exact-arithmetic path) vs float().  Key and value dtypes are
    derived from the input schema (a string key flows through
    unchanged — round-6 ADVICE: never hard-code the key's LongType).

    Per-key state = the open run's [n, sum, anchor, deadline] plus
    the watermark buffer (JSON payload, same codec as the NFA); the
    event-time timer is min(buffered ts, open-run deadline) so a run
    with no further events still closes when the watermark passes
    anchor + within_us (and, in the 2-step shape, emits).

    min_n / max_n are the Kleene step's {n,m} quantifier bounds
    (advance_kleene_agg semantics).  key_cols generalizes the
    partition key to a composite PARTITION BY (round-8): `prepared`
    carries one projected column per key part, the state op groups
    by all of them, and the output leads with them in order — each
    part's dtype derived from the input (round-6 ADVICE)."""
    fields = [
        T.StructField(c, prepared.schema[c].dataType) for c in key_cols
    ]
    fields += kleene_agg_out_fields(out_spec, integral)
    out_schema = T.StructType(fields)
    state_schema = T.StructType([T.StructField("payload", T.StringType())])
    conv = int if integral else float
    wants_mn = any(k == "mn" for _, k in out_spec)

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "s": None}
        buf, s = st["buf"], st["s"]
        mn = st.get("mn", 0)

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                n_rows = len(pdf)
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                confs = (
                    pdf["__is_conf"].tolist()
                    if "__is_conf" in pdf.columns
                    else [False] * n_rows
                )
                if corr is not None:
                    bxc, ayc = corr_convs
                    bxs = [
                        None if x is None or pd.isna(x) else bxc(x)
                        for x in pdf["__bx"].tolist()
                    ]
                    ays = [
                        None if x is None or pd.isna(x) else ayc(x)
                        for x in pdf["__ay"].tolist()
                    ]
                else:
                    bxs = ays = [None] * n_rows
                for ts, eid, ia, ic, v, cf, bx, ay in zip(
                    ts_us.tolist(),
                    pdf["eid"].tolist(),
                    pdf["__is_a"].tolist(),
                    pdf["__is_c"].tolist(),
                    pdf["__v"].tolist(),
                    confs,
                    bxs,
                    ays,
                ):
                    # NULL event_id maps to 0 (sort tie-break only) —
                    # the batch face keeps such rows; dropping them
                    # here would diverge streaming from batch.
                    buf.append(
                        [
                            int(ts),
                            0 if eid is None or pd.isna(eid) else int(eid),
                            bool(ia),
                            bool(ic),
                            None if v is None or pd.isna(v) else conv(v),
                            bool(cf),
                            bx,
                            ay,
                        ]
                    )

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort(key=lambda e: (e[0], e[1]))
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        s, rows = advance_kleene_agg(
            s, matured, wm_us, bind, within_us, confirm=confirm,
            min_n=min_n, max_n=max_n, corr=corr, emit_rows=emit_rows,
            combine=combine,
        )
        if wants_mn:
            mn = assign_match_numbers(rows, emit_rows, mn)
        if emit_rows:
            rows = filter_excluded_rows(rows, exclude_cls)
        else:
            # ONE-ROW records carry the accumulator at r[2], not a
            # classifier code — the parser guarantees exclusion only
            # under ALL ROWS; enforce the invariant locally
            assert not exclude_cls, "exclusion requires ALL ROWS PER MATCH"

        if buf or s is not None or (wants_mn and mn):
            # MATCH_NUMBER keeps one tiny row per ever-matching key
            # alive (the counter must survive idleness — the honest
            # cost of per-key numbering on an unbounded stream)
            state.update((json.dumps({"buf": buf, "s": s, "mn": mn}),))
            timers = []
            if buf:
                timers.append(min(e[0] for e in buf) // _US_PER_MS + 1)
            if s is not None:
                # wake at the open run's deadline to close + emit
                timers.append(s[3] // _US_PER_MS + 1)
            if timers:
                state.setTimeoutTimestamp(
                    max(min(timers), state.getCurrentWatermarkMs() + 1)
                )
        elif state.exists:
            state.remove()

        if rows:
            data = {c: [key[i]] * len(rows) for i, c in enumerate(key_cols)}
            data.update(
                kleene_agg_out_columns(
                    rows, out_spec, emit_rows=emit_rows, cls_names=cls_names
                )
            )
            yield pd.DataFrame(data)

    return prepared.groupBy(*key_cols).applyInPandasWithState(
        process,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


_DAY_US = 86_400_000_000


def advance_twap(
    state: dict | None, matured: list, wm_us: int
) -> tuple[dict | None, list]:
    """Pure per-key TWAP kernel (streaming face of
    operators/aggregates.rollup_twap): last-observation-carried-forward
    segments within each UTC day, day rows emitted once the watermark
    passes the day boundary.

    state: None or {'last': [day, ts_us, cents] | None,
    'days': [[day, n_segments, span_us, num], ...]} (num = sum of
    cents x dt products — Python arbitrary-precision ints, JSON-safe);
    matured: (ts, id)-sorted [ts_us, eid, cents] rows (NULL-value rows
    are filtered JVM-side, matching the batch face's filter).

    A day closes when wm_us >= (day+1)*86400e6: matured rows satisfy
    ts <= wm, and a tie row at exactly the boundary belongs to the
    NEXT day, so no segment of a closed day can still grow — the
    boundary condition that keeps the kernel chunking-invariant
    (property-tested). Emission = [day, n_segments, span_us, num]
    for days with span > 0; single-event days emit nothing (the batch
    face's HAVING span > 0)."""
    st = {"last": None, "days": []} if state is None else state
    days = {d: [n, sp, nm] for d, n, sp, nm in st["days"]}
    last = st["last"]
    for ts, _eid, cents in matured:
        d = ts // _DAY_US
        if last is not None and last[0] == d:
            acc = days.setdefault(d, [0, 0, 0])
            dt = ts - last[1]
            acc[0] += 1
            acc[1] += dt
            acc[2] += last[2] * dt
        last = [d, ts, cents]
    out = []
    for d in sorted(days):
        if (d + 1) * _DAY_US <= wm_us:
            n, sp, nm = days.pop(d)
            if sp > 0:
                out.append([d, n, sp, nm])
            if last is not None and last[0] == d:
                last = None  # a closed day's tail can't open segments
    st = {"last": last, "days": [[d, *days[d]] for d in sorted(days)]}
    if st["last"] is None and not st["days"]:
        st = None
    return st, out


def twap_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming face of rollup_twap: per-key daily time-weighted
    averages behind applyInPandasWithState. Value rows filter and
    project JVM-side (the batch face's exact filter: non-null ts/key/
    value, |value| <= 1e9, cents = round(value*100)); per-key state =
    the open days' [n, span, num] accumulators plus the last
    observation and the watermark buffer; the event-time timer fires
    at min(buffered ts, earliest open day's end) so a day with no
    further events still emits when the watermark crosses midnight."""
    prepared = (
        events_stream.withWatermark(time_col, watermark)
        .filter(
            F.col(time_col).isNotNull()
            & F.col(key_col).isNotNull()
            & F.col("value").isNotNull()
            & (F.abs("value") <= 1e9)
        )
        .select(
            F.col(key_col).alias("key"),
            F.col(time_col).alias("ts"),
            F.col(id_col).alias("eid"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    out_schema = T.StructType(
        [
            # derive from the input: a string/non-long PARTITION BY key
            # flows through unchanged (round-6 ADVICE — never
            # hard-code the key's LongType)
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("day", T.DateType()),
            T.StructField("n_segments", T.LongType()),
            T.StructField("span_us", T.LongType()),
            T.StructField("twap", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "s": None}
        buf, s = st["buf"], st["s"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                for ts, eid, c in zip(
                    ts_us.tolist(),
                    pdf["eid"].tolist(),
                    pdf["cents"].tolist(),
                ):
                    buf.append(
                        [
                            int(ts),
                            0 if eid is None or pd.isna(eid) else int(eid),
                            int(c),
                        ]
                    )

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        buf.sort(key=lambda e: (e[0], e[1]))
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        s, rows = advance_twap(s, matured, wm_us)

        if buf or s is not None:
            state.update((json.dumps({"buf": buf, "s": s}),))
            timers = []
            if buf:
                timers.append(min(e[0] for e in buf) // _US_PER_MS + 1)
            if s is not None and s["days"]:
                # wake when the earliest open day's boundary passes
                timers.append(
                    (s["days"][0][0] + 1) * _DAY_US // _US_PER_MS + 1
                )
            if timers:
                state.setTimeoutTimestamp(
                    max(min(timers), state.getCurrentWatermarkMs() + 1)
                )
            # no timer when state is only the trailing observation (an
            # empty-accumulator day emits nothing at close; the next
            # event or query end resolves it)
        elif state.exists:
            state.remove()

        if rows:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(rows),
                    "day": [
                        pd.Timestamp(r[0] * 86400, unit="s").date()
                        for r in rows
                    ],
                    "n_segments": [r[1] for r in rows],
                    "span_us": [r[2] for r in rows],
                    # same arithmetic as the batch face: exact-int
                    # num -> nearest double, one division chain
                    "twap": [
                        round(float(r[3]) / float(r[2]) / 100.0, 6)
                        for r in rows
                    ],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )


def advance_asof_enrich(
    state: list | None,
    matured: list,
    wm_us: int,
    ttl_us: int | None = None,
) -> tuple[list | None, list]:
    """Pure per-key temporal-join kernel (streaming face of
    stream_asof_enrich — the Flink event-time temporal table join /
    DuckDB ASOF JOIN shape): enrich each FACT row with the latest
    DIMENSION observation at-or-before it in (ts, eid) order.

    state: None or [dim_ts_us, dim_eid, dim_val] — the single latest
    valid dimension observation (O(1): LOCF needs no history);
    matured: (ts, id)-sorted [ts_us, eid, is_dim, val] rows.  A
    dimension row with NULL val is ignored (the batch twin's
    ignorenulls=True last()); a fact row emits
    [ts_us, eid, dim_val | None, age_us | None] where age_us is the
    exact integer event-time staleness of the joined value.  wm_us is
    unused (LOCF has no deadline) but kept for kernel-signature
    uniformity; chunking-invariance is trivial — state is the last
    observation, emission is per-fact-row immediate.

    ttl_us (round-9, the Flink temporal-join TTL): an observation
    older than ttl_us at the fact's event time no longer joins — the
    fact emits NULLs, exactly as if no observation existed (stale
    reference data must not silently enrich).  The observation stays
    in state (a LATER dim update refreshes it), so the check is pure
    arithmetic — no state churn, still O(1)."""
    st = None if state is None else list(state)
    out = []
    for ts, eid, is_dim, val in matured:
        if is_dim:
            if val is not None:
                st = [ts, eid, val]
        elif st is None or (
            ttl_us is not None and ts - st[0] > ttl_us
        ):
            out.append([ts, eid, None, None])
        else:
            out.append([ts, eid, st[2], ts - st[0]])
    return st, out


def asof_enrich_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    time_col: str = "ts",
    id_col: str = "event_id",
    dim_type: str = "view",
    fact_type: str = "purchase",
    watermark: str = "10 minutes",
    ttl_us: int | None = None,
) -> DataFrame:
    """Streaming temporal join behind applyInPandasWithState: the
    watermark buffer totally orders each key's rows by (ts, eid), so
    a fact row always sees every dimension update at-or-before it —
    the correctness Structured Streaming's built-in stream-stream
    join cannot give for LOCF enrichment (it joins on equality within
    a time bound, not latest-at-or-before).  Per-key state = ONE
    dimension observation + the watermark buffer; the event-time
    timer fires at the earliest buffered row so enrichment latency is
    one watermark, never a window length."""
    prepared = (
        events_stream.withWatermark(time_col, watermark)
        .filter(
            F.col(time_col).isNotNull()
            & F.col(key_col).isNotNull()
            & (F.col("value").isNull() | (F.abs("value") <= 1e9))
            & F.col("event_type").isin(dim_type, fact_type)
        )
        .select(
            F.col(key_col).alias("key"),
            F.col(time_col).alias("ts"),
            F.col(id_col).alias("eid"),
            (F.col("event_type") == dim_type).alias("is_dim"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    out_schema = T.StructType(
        [
            T.StructField("key", prepared.schema["key"].dataType),
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_id", T.LongType()),
            T.StructField(f"{dim_type}_cents", T.LongType()),
            T.StructField("age_us", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("payload", T.StringType())])

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = json.loads(state.get[0])
        else:
            st = {"buf": [], "s": None}
        buf, s = st["buf"], st["s"]

        if not state.hasTimedOut:
            for pdf in pdfs:
                if len(pdf) == 0:
                    continue
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                for ts, eid, isd, c in zip(
                    ts_us.tolist(),
                    pdf["eid"].tolist(),
                    pdf["is_dim"].tolist(),
                    pdf["cents"].tolist(),
                ):
                    buf.append(
                        [
                            int(ts),
                            0 if eid is None or pd.isna(eid) else int(eid),
                            bool(isd),
                            None if c is None or pd.isna(c) else int(c),
                        ]
                    )

        wm_us = state.getCurrentWatermarkMs() * _US_PER_MS
        # third key: on an exact (ts, eid) tie — reachable when two
        # NULL event_ids both map to 0 — the DIMENSION row orders
        # before the fact (a same-instant observation is visible to
        # the fact), deterministically on every face (review catch)
        buf.sort(key=lambda e: (e[0], e[1], not e[2]))
        matured = [e for e in buf if e[0] <= wm_us]
        buf = [e for e in buf if e[0] > wm_us]

        s, rows = advance_asof_enrich(s, matured, wm_us, ttl_us=ttl_us)

        if buf or s is not None:
            state.update((json.dumps({"buf": buf, "s": s}),))
            if buf:
                state.setTimeoutTimestamp(
                    max(
                        min(e[0] for e in buf) // _US_PER_MS + 1,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
        elif state.exists:
            state.remove()

        if rows:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(rows),
                    "ts": pd.to_datetime([r[0] for r in rows], unit="us"),
                    "event_id": [r[1] for r in rows],
                    f"{dim_type}_cents": [r[2] for r in rows],
                    "age_us": [r[3] for r in rows],
                }
            )

    return bucketed_stateful_apply(
        prepared, process, out_schema, state_schema, "append"
    )
