"""SQL-string CEP syntax (SURVEY §8.4) — MATCH_RECOGNIZE-shaped text
queries compiling to the Pattern builder.

Spark has no MATCH_RECOGNIZE clause; the reference family exposed CEP
through SQL text [PK]. This module closes that gap with a small,
unambiguous dialect that compiles to `operators.cep.Pattern` — so the
text surface inherits BOTH compilers for free: the batch DataFrame
plan (oracle-checkable) and the streaming NFA (applyInPandasWithState).

Dialect (clauses in any order, case-insensitive keywords):

    PATTERN ( V -> C -> !P )
    WITHIN 6 HOURS
    DEFINE V AS event_type = 'view',
           C AS event_type = 'click',
           P AS event_type = 'purchase'
    PARTITION BY user_id
    ORDER BY ts

PARTITION BY accepts a COLUMN LIST (round 6b): `PARTITION BY a, b`
compiles against one synthesized struct key on both engines (struct
equality in the batch joins, struct grouping key in the stateful
operator) and the output carries flattened key_<col> columns. Not
combinable with quantifier/group/PERMUTE expansion.

Output mode (round 6b): `ONE ROW PER MATCH` (the default) emits one
row per match; `ALL ROWS PER MATCH` emits one row PER BOUND EVENT
(key, anchor_id, seq_no, step, ts, event_id) via emit_ids + the
rows_per_match unpivot — on both engines. Not combinable with
MEASURES (a measure is a whole-match value; compose
rows_per_match_running on the default output for per-row
RUNNING/FINAL sums), one_or_more steps, or expansion.

Connectors (Flink-CEP contiguity modes, spelled infix):
    A -> B    relaxed followed-by (skip-till-next-match)  — Pattern.followed_by
    A => B    strict next (the key's immediately-next event) — Pattern.next
    A -> !B   terminal negation (no B within the bound)   — Pattern.not_followed_by
    A -> B{3} bounded repetition (Pattern.times): the connector sets the
              run's contiguity — `->` binds the 3 earliest qualifying
              events in order, `=>` the 3 immediately-consecutive next
              events; output gets one timestamp column per sub-step
    A -> B+   greedy Kleene-plus (Pattern.one_or_more): earliest entry,
              then the maximal immediately-consecutive matching run;
              output columns t_B_first, t_B_last, B_count
    A -> B?   optional step (greedy, both engines): expansion into the
              with/without variants, with-B preferred whenever it
              matches; a skipped step emits t_B = NULL and the winning
              spelling lands in the `variant` column. Batch: variant
              union + winner groupBy; streaming: the variants run as
              parallel NFAs in one keyed state and a lower-preference
              completion is held only while a better variant is still
              alive for the anchor (compile_stream_variants)
    A -> B{n,m}  range repetition (greedy, both engines): expansion
              into the {m}..{n} arities, longest preferred; unbound
              tail sub-steps emit NULL
    A => B??  reluctant optional (both engines): the without-B variant
              is preferred — only meaningful under strict (`=>`)
              contiguity; with `->` the skip branch always wins (see
              cep_reluctant_optional's docstring)
    A => B{n,m}?  reluctant range: ascending arities, shortest preferred
    (A -> B){n} / {n,m}  quantified GROUP (MATCH_RECOGNIZE sub-pattern
              repetition, round 5): the parenthesized chain repeats —
              repeat r's steps become `<name>_r<r>` columns, `{n,m}`
              expands into greedy descending-arity variants riding the
              same winner machinery as step quantifiers (both
              engines). One group per pattern, plain inner steps, no
              correlation inside the group, no mixing with other
              quantifiers in a `{n,m}` group.
    A -> (B | C) -> D  alternation group (round 6, both engines): the
              slot matches EITHER branch, first-declared branch
              preferred when several complete for one anchor (SQL
              first-match-in-alternation); the unbound branch's
              column is NULL and the winning spelling lands in
              `variant`. Alternation is one more options slot in the
              quantifier expansion, so it composes with `?`/`{n,m}`
              in the same pattern (shared 16-variant cap). One
              alternation group per pattern, plain branch names, not
              the first step (the anchor must be fixed).
    SUBSET U = (A, B)  (round 6) — union pattern variables: MEASURES
              may aggregate across steps with first/last/min/max/
              sum(U.col). Pure parse-time expansion to member-
              expressed refs (sum -> a + sum(b), min -> least(...)),
              so both engines and the streaming variant NFAs inherit
              subsets with zero new kernel state. count/avg over a
              subset are rejected with a pointed error.
    DEFINE B AS ... AND B.col <= 1.5 * AVG(B.col)   running-aggregate
              DEFINE on a Kleene (+) step (round 7, standard
              MATCH_RECOGNIZE DEFINE-aggregate semantics: RUNNING,
              current row included; both engines). Supported forms:
              `B.col CMP [k *] AVG|SUM(B.col)`, `SUM(B.col) CMP k`,
              `COUNT(B.*)|COUNT(*) CMP k` — the factor/bound is kept
              as an exact rational so integer columns never divide
              (cross-multiplied bind predicate). Compiles to the
              shared advance_kleene_agg kernel (run extension depends
              on the accepted prefix — no window frame expresses it):
              anchor/candidate predicates evaluate JVM-side, only the
              aggregate check runs in Python with O(1) per-key state.
              PATTERN (A -> B+) or (A -> B+ -> C) (terminal-confirm,
              round 8: a match exists only when a C row arrives while
              the run is open with ≥1 bound B — greedy B+ first, the
              C row is consumed, unconfirmed runs die unemitted) with
              an explicit AFTER MATCH SKIP PAST LAST ROW; one
              aggregate conjunct per step.  MEASURES over the
              kernel's outputs compile to renames (round 8):
              SUM|COUNT|AVG(B.col) and A.<order col> /
              C.<order col>; other measures / navigation / composite
              keys / anchors are rejected with pointed errors
              (default output columns: key, t_<A>,
              <B>_count[, <B>_sum_<col>][, t_<C>]).
    AFTER MATCH SKIP PAST LAST ROW / SKIP TO NEXT ROW /
    SKIP TO FIRST <step> / SKIP TO LAST <step>  (round 5; FIRST +
              kleene targets + explicit NEXT ROW round 6d)
              match-selection policy on BOTH engines: batch composes
              the greedy selectors (select_non_overlapping /
              select_skip_to) after the match plan; streaming passes
              skip_policy to compile_stream, whose held-until-window-
              closed recurrence (advance_skip_select) equals the batch
              selection exactly. FIRST/LAST may target a one_or_more
              step: scanning resumes at the kept run's entry / final
              row respectively (on a plain step the spellings
              coincide). SKIP TO NEXT ROW is the explicit spelling of
              the default emit-every-match policy. Not combinable
              with quantifier/group/PERMUTE expansion.
    ^ A -> B $   partition anchors (round 6e, standard
              MATCH_RECOGNIZE; BATCH ONLY — a stream has no partition
              end and its "first row" depends on query start time, the
              NEXT-lookahead class of trap, pointed error): ^ pins the
              anchor step to the key's first row (per-key row_number
              pre-projection ANDed into the anchor predicate), $ pins
              the final positive step's binding to the key's last row
              (per-key max-timestamp equality filter, applied before
              any skip policy). Usable separately or together; not
              combinable with quantifier/group/PERMUTE expansion.
    {- B -}   row exclusion (round 6d, standard MATCH_RECOGNIZE): the
              step still gates matching but its bound rows are omitted
              from the ALL ROWS PER MATCH output (the only mode where
              per-event rows exist — required, pointed error
              otherwise). seq_no keeps the step's pattern ordinal
              (exclusion removes rows, it does not renumber). A plain
              post-explode filter, identical on both engines. Cannot
              exclude a negated step (binds no rows) or every step.
    A -[30 MINUTES]-> B   gapped connector (also =[...]=>): B must fall
              within the bracketed interval OF A's binding — the
              per-transition deadline (Step.gap); on a negated step it
              narrows the kill window (timeout detection). Not
              supported on quantified ({n}/+) steps.
    PREV(col[, k]) / NEXT(col[, k])  physical-row navigation inside a
              DEFINE conjunct (standard MATCH_RECOGNIZE): the value of
              <col> on the row k positions before/after the candidate
              row in (ORDER BY, event_id) order within the partition —
              unqualified column names only (the current row's columns
              also stay unqualified in a nav conjunct). Batch
              pre-projects one per-key lag/lead column per distinct
              ref; streaming evaluates PREV conjuncts in the NFA
              kernel against the key's last-k released rows (nav
              tail, kept in state — k rows per key, indefinitely).
              NEXT is batch-only (a stream cannot look ahead; Flink's
              MATCH_RECOGNIZE likewise rejects NEXT — pointed error).
              A missing row navigates to NULL: the comparison is
              UNKNOWN and the step does not bind. Restricted to the
              correlation grammar (comparisons, arithmetic,
              AND/OR/NOT, abs). Not combinable with cross-step refs
              in the SAME conjunct, nor with quantifier/group/PERMUTE
              expansion.

DEFINE predicates are ordinary Spark SQL boolean expressions over the
event columns — the full expression language comes from Spark's own
parser, not ours; this parser only handles the pattern algebra. The
standard MATCH_RECOGNIZE spelling differs (juxtaposition = strict,
regex quantifiers) — we use explicit connectors because our default
semantics is skip-till-next-match and silent strictness flips would be
a correctness trap.

Cross-step correlation (MATCH_RECOGNIZE's defining feature) is
supported exactly as in standard DEFINE clauses — a step's expression
may reference other steps' columns by step name:

    DEFINE V AS event_type = 'view',
           P AS event_type = 'purchase' AND P.value > V.value

Top-level AND-conjuncts containing a step-qualified reference are
routed to the Pattern step's `where=` (bind-time correlation, both
engines); the remaining conjuncts stay the per-event predicate
(JVM-evaluated m-flags). Inside a correlation conjunct EVERY column
must be step-qualified (Pattern.corr_plan's restricted grammar).
Correlation is not supported on quantified ({n}/+) steps.

A MEASURES clause (standard MATCH_RECOGNIZE) projects computed output
columns from the bound events' values:

    MEASURES P.value - V.value AS uplift, C.value AS click_val

Same step-qualified grammar; may reference any positive non-kleene
step. Both engines emit the columns (batch via carried values, the
streaming NFA via the match's env of bound values).

Scale: identical to the Pattern builder's (one window shuffle for
strict sequence numbers, per-step equi-join + min-agg on the key) —
the text layer adds zero execution surface.
"""

from __future__ import annotations

import math
import operator as _op
import re
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.operators.cep import Pattern, _RUN_AGG_ORACLE, _WHERE_REF
from spark_cep_spark.registry import register

_CLAUSE_KEYWORDS = (
    "PATTERN",
    "WITHIN",
    "DEFINE",
    "SUBSET",
    "MEASURES",
    "PARTITION BY",
    "ORDER BY",
    "AFTER MATCH",
    "ALL ROWS PER MATCH",
    "ONE ROW PER MATCH",
)


@dataclass
class ParsedPatternQuery:
    pattern: Pattern
    key_col: str
    time_col: str
    # None | "skip_past_last_row" | ("skip_to_last", step_name) —
    # parsed from the AFTER MATCH clause
    skip: object = None
    # ordered (direction, col, k) PREV/NEXT navigation specs — batch
    # pre-projects one lag/lead column per spec; streaming rejects
    # 'next' (lookahead) and evaluates 'prev' in the NFA kernel
    nav: tuple = ()
    # non-empty iff PARTITION BY listed several columns: key_col is
    # then the synthesized struct '__mr_key' and the output's struct
    # key is flattened back to key_<col> columns by match_recognize
    key_cols: tuple = ()
    # True iff the ALL ROWS PER MATCH output mode was requested —
    # match_recognize compiles with emit_ids and unpivots each match
    # to one row per bound event (rows_per_match)
    all_rows: bool = False
    # aliases for the SQL-standard per-match functions, parsed out of
    # MEASURES: `MATCH_NUMBER() AS alias` numbers matches 1, 2, ...
    # per key in start order (both output modes, both engines);
    # `CLASSIFIER() AS alias` names the pattern variable each output
    # row bound (ALL ROWS PER MATCH only — it renames the unpivot's
    # step column)
    match_number_alias: str | None = None
    classifier_alias: str | None = None
    # step names whose bound rows are omitted from the ALL ROWS PER
    # MATCH output ({- step -} exclusion markers; sorted, de-duped)
    excluded: tuple = ()
    # ^ / $ partition anchors (batch-only): ^ pins the anchor step to
    # the key's first row (the first step's predicate is rewritten to
    # AND __mr_rn = 1 — match_recognize pre-projects __mr_rn); $ pins
    # the final positive step's binding to the key's last row
    # (post-compile equality filter against the per-key max timestamp)
    anchor_start: bool = False
    anchor_end: bool = False
    # universal-set aggregate MEASURES parsed from the SQL text:
    # (alias, 'RUNNING'|'FINAL', 'sum'|'count'|'count_star'|'avg',
    # col|None) — the column UNQUALIFIED, so the aggregate ranges over
    # ALL bound rows of the match (the standard's universal row
    # pattern variable). Values ride the match as hidden
    # __arm_<col>__<step> measure carries; under ALL ROWS PER MATCH
    # each output row carries the as-of-that-row (RUNNING) or
    # whole-match (FINAL) value (rows_per_match_measures), under ONE
    # ROW PER MATCH the two coincide on the single output row.
    universal_measures: tuple = ()
    # {n,m} bounds the kleene-agg kernel runs under when run_agg is
    # set WITHOUT an explicit _rewrite_run_agg_bounds rewrite: (1,
    # None) = plain B+; a leading Kleene (A+ -> B) sets (0, None) —
    # the anchor itself is the +'s first binding, so an empty
    # candidate run (single-A match) is legal
    run_agg_bounds: tuple = (1, None)
    # non-None iff a Kleene (+) step carries a running-aggregate
    # DEFINE conjunct (RunAggSpec): (anchor_step, kleene_step, spec).
    # match_recognize then compiles via the advance_kleene_agg kernel
    # (shared batch/streaming) instead of the declarative plan — run
    # extension depends on the accepted prefix, which no window frame
    # or gaps-and-islands pass expresses.
    run_agg: tuple | None = None


def _mask_literals(text: str) -> str:
    """Blank out single-quoted SQL string literals (preserving length)
    so clause keywords / commas inside them never act as delimiters."""

    def blank(m: re.Match) -> str:
        return "'" + " " * (len(m.group(0)) - 2) + "'"

    return re.sub(r"'(?:[^']|'')*'", blank, text)


def _split_clauses(text: str) -> dict[str, str]:
    masked = _mask_literals(text)
    kw_alt = "|".join(k.replace(" ", r"\s+") for k in _CLAUSE_KEYWORDS)
    hits = [
        (m.start(), m.end(), re.sub(r"\s+", " ", m.group(0).upper()))
        for m in re.finditer(rf"\b({kw_alt})\b", masked, re.I)
    ]
    if not hits:
        raise ValueError("no CEP clauses found (expected PATTERN/DEFINE/...)")
    head = text[: hits[0][0]].strip()
    if head:
        raise ValueError(f"unexpected text before first clause: {head!r}")
    clauses: dict[str, str] = {}
    for i, (_, end, kw) in enumerate(hits):
        body_end = hits[i + 1][0] if i + 1 < len(hits) else len(text)
        if kw in clauses:
            raise ValueError(f"duplicate {kw} clause")
        clauses[kw] = text[end:body_end].strip()
    return clauses


def _split_top_level_commas(text: str) -> list[str]:
    parts, depth, start = [], 0, 0
    masked = _mask_literals(text)
    for i, ch in enumerate(masked):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(text[start:i])
            start = i + 1
    parts.append(text[start:])
    return [p.strip() for p in parts if p.strip()]


_STEP_TOKEN = re.compile(r"^(!?)([A-Za-z_][A-Za-z_0-9]*)(?:\{(\d+)\}|(\+))?$")

# connector tokens: plain `->` / `=>`, or gapped `-[30 MINUTES]->` /
# `=[30 MINUTES]=>` (per-transition deadline — Step.gap)
_CONNECTOR_SPLIT = r"(-\[[^\]]*\]->|=\[[^\]]*\]=>|->|=>)"
_GAPPED_CONN = re.compile(r"^([-=])\[([^\]]*)\]\1>$")


def _parse_connector(conn: str) -> tuple[str, str | None]:
    """-> / => / gapped form -> (base_connector, gap_interval_or_None)."""
    m = _GAPPED_CONN.match(conn)
    if m:
        gap = m.group(2).strip()
        if not gap:
            raise ValueError(f"empty gap interval in connector {conn!r}")
        return ("->" if m.group(1) == "-" else "=>"), gap
    if conn in ("->", "=>"):
        return conn, None
    raise ValueError(f"expected -> or => connector, got {conn!r}")


def _split_top_level_and(expr: str) -> list[str]:
    """Split a boolean expression at top-level ANDs (outside parens and
    string literals) — the granularity at which per-event predicate and
    cross-step correlation conjuncts are separated."""
    masked = _mask_literals(expr)
    up = masked.upper()
    parts, depth, start, i = [], 0, 0, 0

    def _is_word_char(c: str) -> bool:
        return c.isalnum() or c == "_"

    while i < len(masked):
        ch = masked[i]
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and up.startswith("AND", i)
            and (i == 0 or not _is_word_char(masked[i - 1]))
            and (i + 3 >= len(masked) or not _is_word_char(masked[i + 3]))
        ):
            parts.append(expr[start:i])
            start = i + 3
            i += 3
            continue
        i += 1
    parts.append(expr[start:])
    return [p.strip() for p in parts if p.strip()]


# PREV(col[, k]) / NEXT(col[, k]) — physical-row navigation inside a
# DEFINE conjunct (standard MATCH_RECOGNIZE row-pattern navigation:
# the value of <col> on the row k positions before/after the current
# candidate row in (ORDER BY, event_id) order within the partition).
_NAV_RE = re.compile(
    r"\b(PREV|NEXT)\s*\(\s*([A-Za-z_]\w*)\s*(?:,\s*(\d+)\s*)?\)", re.I
)

_NAV_ALLOWED_BARE = {"and", "or", "not", "abs", "true", "false", "null"}


def _nav_out_col(direction: str, col: str, k: int) -> str:
    """Name of the batch-side pre-projected lag/lead column."""
    return f"__nav_{direction}_{col}_{k}"


def _rewrite_nav_conjunct(conj: str):
    """Rewrite one navigation conjunct into its two engine forms.

    Returns (batch_sql, py_expr, specs):
      batch_sql — nav calls replaced by the pre-projected lag/lead
                  column names (__nav_prev_<col>_<k>); current-row
                  columns stay bare. An ordinary Spark SQL predicate
                  once match_recognize projects the nav columns.
      py_expr   — the same conjunct in the correlation grammar: nav
                  calls become __PREVROWk.col / __NEXTROWk.col and
                  bare current-row columns become CUR.col, compilable
                  by the NFA's _compile_where_py (full SQL 3VL — a
                  missing previous row is NULL, so a comparison with
                  it is UNKNOWN and the step does not bind, exactly
                  like the batch lag column at a partition start).
      specs     — set of (direction, col, k) navigation references.

    Grammar is the correlation grammar (comparisons, arithmetic,
    AND/OR/NOT, abs — no other function calls), which is what keeps
    the batch SQL and the kernel's Python evaluation provably aligned.
    """
    masked = _mask_literals(conj)
    batch_parts, py_parts, specs = [], [], set()
    last = 0
    # splice by masked-text spans so a 'PREV(' inside a string literal
    # never rewrites (masking preserves offsets)
    for mo in _NAV_RE.finditer(masked):
        d = mo.group(1).lower()
        col = conj[mo.start(2): mo.end(2)]
        k = int(mo.group(3)) if mo.group(3) else 1
        if k < 1:
            raise ValueError(
                f"{mo.group(1)}({col}, {k}): navigation offset must be >= 1"
            )
        specs.add((d, col, k))
        batch_parts.append(conj[last: mo.start()] + _nav_out_col(d, col, k))
        py_parts.append(
            conj[last: mo.start()] + f"__{d.upper()}ROW{k}.{col}"
        )
        last = mo.end()
    batch_sql = "".join(batch_parts) + conj[last:]
    py_expr = "".join(py_parts) + conj[last:]
    # qualify bare current-row identifiers as CUR.<col> for the python
    # form, and validate the restricted grammar
    pmasked = _mask_literals(py_expr)
    bad = re.search(
        r"(?i)\b(is|in|like|between|case|cast|exists)\b", pmasked
    )
    if bad:
        raise ValueError(
            f"'{bad.group(0)}' inside a navigation conjunct — the "
            "PREV/NEXT grammar is restricted to comparisons, "
            "arithmetic, AND/OR/NOT and abs() so the batch plan and "
            "the streaming kernel agree"
        )
    out: list[str] = []
    last = 0
    for mo in re.finditer(r"[A-Za-z_]\w*", pmasked):
        tok = mo.group(0)
        s, e = mo.span()
        if s > 0 and pmasked[s - 1] == ".":
            continue  # the .col of a qualified ref
        if tok.lower() in _NAV_ALLOWED_BARE:
            continue
        if e < len(pmasked) and pmasked[e] == ".":
            continue  # a qualifier (__PREVROWk / __NEXTROWk)
        if pmasked[e:].lstrip().startswith("("):
            raise ValueError(
                f"function call '{tok}(...)' inside a navigation "
                "conjunct — the PREV/NEXT grammar is restricted to "
                "comparisons, arithmetic, AND/OR/NOT and abs() so the "
                "batch plan and the streaming kernel agree"
            )
        out.append(py_expr[last:s] + f"CUR.{tok}")
        last = e
    py_expr = "".join(out) + py_expr[last:]
    return batch_sql, py_expr, specs


def _split_define(
    expr: str, step_names: set[str]
) -> tuple[str, str | None, list[str]]:
    """Separate a DEFINE expression into (per-event predicate,
    correlation where-clause, navigation conjuncts): an AND-conjunct
    mentioning any step-qualified column goes to the where (validated
    further by Pattern.corr_plan); one containing PREV()/NEXT() goes
    to the navigation list; the rest stays the predicate.
    All-correlation expressions get the always-true predicate."""
    conjs = _split_top_level_and(expr)
    wrap = (lambda c: f"({c})") if len(conjs) > 1 else (lambda c: c)
    pred, corr, navs = [], [], []
    for c in conjs:
        masked = _mask_literals(c)
        has_nav = _NAV_RE.search(masked) is not None
        has_ref = any(
            q in step_names
            for q, _ in _WHERE_REF.findall(_NAV_RE.sub(" ", masked))
        )
        # star-form aggregates (COUNT(B.*) / COUNT(*)) carry no
        # _WHERE_REF-shaped column ref but are step-bound all the same
        # — classify as correlation so the Kleene DEFINE-aggregate
        # path (or the pointed quantified-correlation error) sees them
        # instead of Spark's analyzer choking on the bare star.
        if not has_ref:
            m_star = re.search(
                r"(?i)\bCOUNT\s*\(\s*(?:([A-Za-z_]\w*)\s*\.\s*)?\*\s*\)",
                masked,
            )
            if m_star and (
                m_star.group(1) is None or m_star.group(1) in step_names
            ):
                has_ref = True
        if has_nav and has_ref:
            raise ValueError(
                f"conjunct {c.strip()!r} mixes PREV/NEXT navigation "
                "with a cross-step reference — navigation compares "
                "against physical rows, correlation against bound "
                "steps; split them into separate AND-conjuncts"
            )
        if has_nav:
            navs.append(c.strip())
        elif has_ref:
            corr.append(wrap(c))
        else:
            pred.append(wrap(c))
    return (
        " AND ".join(pred) if pred else "true",
        " AND ".join(corr) if corr else None,
        navs,
    )


@dataclass(frozen=True)
class RunAggSpec:
    """One running-aggregate DEFINE conjunct on a Kleene (+) step,
    parsed into the exact cross-multiplied form the kernel evaluates
    (the factor/bound is carried as the exact rational p/q so integer
    columns stay in arbitrary-precision integer arithmetic end to
    end — the oracle discipline's cross-multiply rule).

    form: 'cur_vs_avg'  — B.col CMP (p/q) * AVG(B.col)
          'cur_vs_sum'  — B.col CMP (p/q) * SUM(B.col)
          'sum_cap'     — SUM(B.col) CMP p/q
          'count_cap'   — COUNT(B.*) / COUNT(*) / COUNT(B.col) CMP p/q
    col: the aggregated column (None for COUNT(*) / COUNT(B.*));
    RUNNING semantics, the current candidate row included (SQL
    standard: DEFINE sees the row being tested)."""

    form: str
    col: str | None
    cmp: str
    p: int
    q: int


_RA_NUM = r"(\d+(?:\.\d+)?)"
_RA_CMP = r"(<=|>=|<|>)"
_RA_SELF_RE = re.compile(
    rf"^\s*([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s*{_RA_CMP}\s*"
    rf"(?:{_RA_NUM}\s*\*\s*)?"
    rf"(AVG|SUM|MIN|MAX)\s*\(\s*([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s*\)"
    rf"(?:\s*\*\s*{_RA_NUM})?\s*$",
    re.I,
)
_RA_CAP_RE = re.compile(
    rf"^\s*(SUM|COUNT)\s*\(\s*(?:([A-Za-z_]\w*)\s*\.\s*"
    rf"([A-Za-z_]\w*|\*)|(\*))\s*\)\s*{_RA_CMP}\s*{_RA_NUM}\s*$",
    re.I,
)


def _parse_run_agg_conjunct(conj: str, var: str) -> RunAggSpec | None:
    """Parse one DEFINE conjunct on Kleene step `var` into a
    RunAggSpec, or return None when it is not aggregate-shaped (the
    caller then raises the general correlation-on-quantified error).
    Malformed aggregate shapes (wrong variable, mismatched columns,
    both factor positions) raise pointed ValueErrors."""
    from fractions import Fraction

    masked = _mask_literals(conj)
    m = _RA_SELF_RE.match(masked)
    if m:
        lvar, lcol, cmp_, f1, agg, avar, acol, f2 = m.groups()
        if f1 and f2:
            raise ValueError(
                f"DEFINE aggregate conjunct {conj.strip()!r}: the "
                "factor may appear on one side of the aggregate only"
            )
        if lvar != var or avar != var:
            raise ValueError(
                f"DEFINE aggregate conjunct {conj.strip()!r}: both "
                f"references must use the step's own variable {var!r} "
                "(RUNNING aggregate over the step's bound rows)"
            )
        if lcol != acol:
            raise ValueError(
                f"DEFINE aggregate conjunct {conj.strip()!r}: the "
                f"compared column and the aggregated column must match "
                f"(got {lcol!r} vs {acol!r} — one accumulator per run)"
            )
        fr = Fraction(f1 or f2 or "1")
        if fr <= 0:
            raise ValueError(
                f"DEFINE aggregate conjunct {conj.strip()!r}: the "
                "factor must be positive (cross-multiplication flips "
                "the inequality otherwise)"
            )
        form = {
            "AVG": "cur_vs_avg",
            "SUM": "cur_vs_sum",
            "MIN": "cur_vs_min",
            "MAX": "cur_vs_max",
        }[agg.upper()]
        return RunAggSpec(
            form, lcol, cmp_, fr.numerator, fr.denominator
        )
    m = _RA_CAP_RE.match(masked)
    if m:
        agg, avar, acol, star, cmp_, num = m.groups()
        agg = agg.upper()
        if avar is not None and avar != var:
            raise ValueError(
                f"DEFINE aggregate conjunct {conj.strip()!r}: the "
                f"aggregate must range over the step's own variable "
                f"{var!r}"
            )
        if agg == "SUM" and (star or acol == "*"):
            raise ValueError(
                f"DEFINE aggregate conjunct {conj.strip()!r}: SUM "
                "needs a column (SUM(*) is not defined)"
            )
        if agg == "COUNT" and not (star or acol == "*"):
            # COUNT(B.col) would have to skip NULL-col candidate rows
            # (SQL COUNT ignores NULLs) while the kernel counts bound
            # ROWS — silently accepting it would give it COUNT(B.*)
            # semantics. Reject rather than mislead (round-8 ADVICE).
            raise ValueError(
                f"DEFINE aggregate conjunct {conj.strip()!r}: COUNT "
                "over a column is not supported — the run cap counts "
                "bound rows; use COUNT(B.*) or COUNT(*) (to gate on "
                "non-NULL values, add `B.col IS NOT NULL` to DEFINE)"
            )
        fr = Fraction(num)
        col = None if (star or acol == "*") else acol
        form = "sum_cap" if agg == "SUM" else "count_cap"
        return RunAggSpec(form, col, cmp_, fr.numerator, fr.denominator)
    # not aggregate-shaped at all?  Only claim it when an AVG/SUM/COUNT
    # call over the variable appears — else let the caller's general
    # correlation error fire.
    if re.search(
        rf"\b(AVG|SUM|COUNT|MIN|MAX)\s*\(\s*{re.escape(var)}\s*\.",
        masked,
        re.I,
    ):
        raise ValueError(
            f"DEFINE aggregate conjunct {conj.strip()!r} is not of a "
            "supported form: <B.col CMP [k *] AVG|SUM|MIN|MAX(B.col)>, "
            "<SUM(B.col) CMP k>, or <COUNT(B.*)|COUNT(*) CMP k> "
            "(CMP one of < <= > >=, k an unsigned numeric literal)"
        )
    return None


_RA_OPS = {
    "<": _op.lt,
    "<=": _op.le,
    ">": _op.gt,
    ">=": _op.ge,
}


def _compile_run_agg_bind(spec: RunAggSpec):
    """Compile a RunAggSpec into the kernel's bind(n, s, v) predicate.
    All forms are cross-multiplied by the positive q (and, for the
    average, by the positive n+1), so integer inputs never divide —
    the exact-arithmetic discipline the oracles rely on.  For the
    MIN/MAX forms, `s` is the run's min/max accumulator (the kernel's
    combine closure — see _run_agg_combine) and the RUNNING view
    including the candidate is min/max(s, v) with v itself when the
    run is empty."""
    op = _RA_OPS[spec.cmp]
    p, q = spec.p, spec.q
    if spec.form == "cur_vs_avg":
        # v CMP (p/q)·(s+v)/(n+1)  ⟺  q·v·(n+1) CMP p·(s+v)
        return lambda n, s, v: op(q * v * (n + 1), p * (s + v))
    if spec.form == "cur_vs_sum":
        # v CMP (p/q)·(s+v)  ⟺  q·v CMP p·(s+v)
        return lambda n, s, v: op(q * v, p * (s + v))
    if spec.form == "cur_vs_min":
        # v CMP (p/q)·min_run  ⟺  q·v CMP p·min(s, v) (v when empty)
        return lambda n, s, v: op(q * v, p * (v if n == 0 else min(s, v)))
    if spec.form == "cur_vs_max":
        # v CMP (p/q)·max_run  ⟺  q·v CMP p·max(s, v) (v when empty)
        return lambda n, s, v: op(q * v, p * (v if n == 0 else max(s, v)))
    if spec.form == "sum_cap":
        # (s+v) CMP p/q  ⟺  q·(s+v) CMP p
        return lambda n, s, v: op(q * (s + v), p)
    # count_cap: (n+1) CMP p/q  ⟺  q·(n+1) CMP p
    return lambda n, s, v: op(q * (n + 1), p)


def _run_agg_combine(spec: RunAggSpec):
    """The kernel accumulator-update closure for a RunAggSpec: None
    (exact running sum, the default +=) for the sum/avg/count family,
    min/max for the round-9 MIN/MAX forms.  One accumulator per run —
    the documented kernel restriction — so forms cannot mix."""
    if spec.form == "cur_vs_min":
        return min
    if spec.form == "cur_vs_max":
        return max
    return None


@dataclass(frozen=True)
class RunCorrSpec:
    """One anchor-correlation conjunct alongside a running-aggregate
    DEFINE: `B.b_col CMP A.a_col` (either orientation in the text —
    a reversed spelling is normalized by flipping CMP).  The anchor
    row's a_col value is captured when the run opens (O(1) state);
    each candidate's b_col is compared against it in the kernel.
    SQL 3VL: a NULL operand makes the DEFINE non-true — an anchor row
    with NULL a_col cannot open a run, a candidate with NULL b_col is
    a non-candidate (noise), mirroring the coalesce(pred, FALSE)
    discipline of the JVM-side predicates."""

    b_col: str
    cmp: str
    a_col: str


_AC_CMP = r"(<=|>=|<>|!=|=|<|>)"
_AC_FLIP = {"<": ">", ">": "<", "<=": ">=", ">=": "<=", "=": "=",
            "<>": "<>", "!=": "!="}
_AC_OPS = {
    "<": _op.lt, "<=": _op.le, ">": _op.gt, ">=": _op.ge,
    "=": _op.eq, "<>": _op.ne, "!=": _op.ne,
}


def _parse_anchor_corr_conjunct(
    conj: str, var: str, anchor: str
) -> RunCorrSpec | None:
    """Parse one `B.col CMP A.col` / `A.col CMP B.col` conjunct on
    Kleene step `var` with anchor step `anchor`, or None when the
    conjunct is not of that shape (the caller then raises the general
    correlation-on-quantified error)."""
    m = re.match(
        rf"^\s*([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s*{_AC_CMP}\s*"
        rf"([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s*$",
        _mask_literals(conj),
    )
    if not m:
        return None
    lvar, lcol, cmp_, rvar, rcol = m.groups()
    if lvar == var and rvar == anchor:
        return RunCorrSpec(lcol, cmp_, rcol)
    if lvar == anchor and rvar == var:
        return RunCorrSpec(rcol, _AC_FLIP[cmp_], lcol)
    return None


def parse_pattern_sql(text: str) -> ParsedPatternQuery:
    """Parse the dialect above into a Pattern + partition/order columns.

    Raises ValueError with a pointed message on every malformed input —
    this is a user-facing surface; silent misparses become silent wrong
    matches.
    """
    clauses = _split_clauses(text)
    for required in ("PATTERN", "DEFINE", "WITHIN"):
        if required not in clauses:
            raise ValueError(f"missing {required} clause")

    pat_body = clauses["PATTERN"].strip()
    if not (pat_body.startswith("(") and pat_body.endswith(")")):
        raise ValueError("PATTERN clause must be parenthesized: PATTERN ( ... )")
    pat_body = pat_body[1:-1].strip()

    # {- step -} row exclusion (standard MATCH_RECOGNIZE, round 6d):
    # the step still participates in matching but its bound rows are
    # omitted from the ALL ROWS PER MATCH output. Strip the markers
    # here, validate once the step list is known (end of function).
    excluded: set[str] = set()
    def _collect_excl(m: "re.Match") -> str:
        # keep a negation marker / quantifier suffix in the token so
        # step parsing sees it; record the bare name (the negated-step
        # check then fires the pointed "cannot exclude negated step"
        # error).  The suffix form ({- B+ -}, {- B{2,4} -}) is the
        # run-agg composition: the Kleene step matches and aggregates
        # but its bound rows are omitted from the ALL ROWS output.
        excluded.add(m.group(2))
        return f" {m.group(1)}{m.group(2)}{m.group(3) or ''} "
    pat_body = re.sub(
        r"\{-\s*(!?)([A-Za-z_]\w*)"
        r"(\+|\{\s*\d+\s*(?:,\s*\d*\s*)?\})?\s*-\}",
        _collect_excl,
        pat_body,
    )
    if "{-" in pat_body or "-}" in pat_body:
        raise ValueError(
            "malformed {- step -} exclusion in the PATTERN clause "
            "(want {- NAME -} around a plain step name)"
        )

    # ^ / $ partition anchors (standard MATCH_RECOGNIZE, round 6e):
    # ^ pins the anchor step to the key's FIRST row, $ pins the final
    # positive step's binding to the key's LAST row. Strip the markers
    # here; match_recognize enforces them (batch only — a stream has
    # no partition end, and its "first row" depends on when the query
    # started, the same class of trap as NEXT's lookahead).
    anchor_start = anchor_end = False
    if pat_body.startswith("^"):
        anchor_start = True
        pat_body = pat_body[1:].strip()
    if pat_body.endswith("$"):
        anchor_end = True
        pat_body = pat_body[:-1].strip()
    if "^" in pat_body or "$" in pat_body:
        raise ValueError(
            "^ / $ anchors are only valid at the very start / end of "
            "the PATTERN clause"
        )

    defines: dict[str, str] = {}
    for item in _split_top_level_commas(clauses["DEFINE"]):
        m = re.match(r"^([A-Za-z_][A-Za-z_0-9]*)\s+AS\s+(.+)$", item, re.I | re.S)
        if not m:
            raise ValueError(f"malformed DEFINE entry: {item!r} (want NAME AS expr)")
        name, expr = m.group(1), m.group(2).strip()
        if name in defines:
            raise ValueError(f"step {name} defined twice")
        defines[name] = expr

    # Tokenize the pattern algebra: NAME (connector [!]NAME)*
    toks = [t for t in re.split(_CONNECTOR_SPLIT + r"|\s+", pat_body) if t]
    if not toks:
        raise ValueError("empty PATTERN")
    seen: set[str] = set()

    def lookup(tok: str, first: bool) -> tuple[str, bool, int, bool, bool]:
        m = _STEP_TOKEN.match(tok)
        if not m:
            raise ValueError(f"bad pattern token: {tok!r}")
        neg, name = m.group(1) == "!", m.group(2)
        braced = m.group(3) is not None
        reps = int(m.group(3)) if m.group(3) else 1
        plus = m.group(4) == "+"
        if reps < 1:
            raise ValueError(f"step {name}: quantifier must be >= 1")
        if neg and (braced or plus):
            raise ValueError(f"step {name}: a negated step cannot be quantified")
        if first and neg:
            raise ValueError("pattern cannot start with a negated step")
        # a leading + step is legal since round 10 — the caller routes
        # PATTERN (A+ -> B) to the kleene-agg kernel (anchor = the
        # run's first row, trivially-true bind, B = terminal confirm)
        if name.startswith("__lk_"):
            raise ValueError(
                f"step name {name!r}: the __lk_ prefix is reserved "
                "(internal leading-Kleene step naming)"
            )
        if name not in defines:
            raise ValueError(f"step {name} has no DEFINE entry")
        if name in seen:
            raise ValueError(f"step {name} appears twice in PATTERN")
        seen.add(name)
        return name, neg, reps, plus, braced

    step_names = set(defines)
    split3 = {n: _split_define(e, step_names) for n, e in defines.items()}

    # navigation conjuncts: compile both engine forms per step (see
    # _rewrite_nav_conjunct) — the batch predicate references the
    # pre-projected lag/lead columns, the streaming predicate drops
    # the nav conjuncts (the kernel re-applies them via nav_py)
    split: dict[str, tuple[str, str | None]] = {}
    nav_map: dict[str, tuple] = {}
    all_nav_specs: set = set()
    for n, (pred, where, navs) in split3.items():
        if not navs:
            split[n] = (pred, where)
            continue
        from spark_cep_spark.streaming.nfa import _compile_where_py

        batch_conjs, py_conjs, specs = [], [], set()
        for c in navs:
            b, p, sp = _rewrite_nav_conjunct(c)
            batch_conjs.append(f"({b})")
            py_conjs.append(f"({p})")
            specs |= sp
        all_nav_specs |= specs
        batch_pred = " AND ".join(
            ([f"({pred})"] if pred != "true" else []) + batch_conjs
        )
        py_all = " AND ".join(py_conjs)
        fn = _compile_where_py(py_all, "CUR")
        cur_cols = set(re.findall(r"\bCUR\.([A-Za-z_]\w*)", py_all))
        carry = sorted(cur_cols | {c for _d, c, _k in specs})
        max_prev = max(
            [k for d, _c, k in specs if d == "prev"], default=0
        )
        has_next = any(d == "next" for d, _c, _k in specs)
        split[n] = (batch_pred, where)
        nav_map[n] = (pred, (fn, carry, max_prev, has_next))

    name, _, reps, plus0, braced = lookup(toks[0], first=True)
    f_pred, f_where = split[name]
    if f_where:
        raise ValueError(
            f"step {name}: the first step cannot correlate "
            "(no earlier step to reference)"
        )
    leading_kleene = plus0
    run_agg_info: tuple | None = None
    if leading_kleene:
        # PATTERN (A+ -> B) — the classic "run then terminal" spelling
        # (round 10): the run's FIRST row anchors the match (fixing the
        # WITHIN window), every further A row binds (relaxed — ignored
        # rows between members, like every kernel run), and the first
        # B row inside the deadline confirms and emits.  Compiles to
        # the SAME advance_kleene_agg kernel as the DEFINE-aggregate
        # family with a trivially-true bind (count_cap n+1 >= 1) and
        # min_n=0 (the anchor itself is the +'s first binding, so an
        # empty candidate run — a single-A match — is legal).  The
        # kernel is SKIP PAST LAST ROW by construction, so the policy
        # must be spelled explicitly (the run-agg section enforces it).
        if braced:
            raise ValueError(
                f"step {name}: a leading Kleene step cannot also "
                "carry a {n} quantifier"
            )
        if name in nav_map:
            raise ValueError(
                "PREV/NEXT navigation is not supported on a leading "
                "Kleene step (the kernel scans runs, not fixed offsets)"
            )
        if len(toks) != 3:
            raise ValueError(
                "a leading Kleene step supports exactly "
                "PATTERN (A+ -> B) — the run, then ONE plain terminal "
                f"step (got {len(toks)} pattern tokens)"
            )
        conn0, gap0 = _parse_connector(toks[1])
        if conn0 != "->" or gap0:
            raise ValueError(
                "a leading Kleene step takes the relaxed -> connector "
                "to its terminal (strict/gapped connectors have no "
                "kernel spelling — the run consumes rows greedily)"
            )
        b_name0, negb, repsb, plusb, bracedb = lookup(toks[2], first=False)
        if negb or plusb or bracedb or repsb != 1:
            raise ValueError(
                f"step {b_name0}: the terminal of a leading Kleene "
                "run must be a plain step (no quantifier/negation)"
            )
        b_pred0, b_where0 = split[b_name0]
        if b_where0:
            raise ValueError(
                f"step {b_name0}: the terminal of a leading Kleene "
                "run cannot carry correlation or aggregate conjuncts "
                "(fold the condition into the step's own predicate)"
            )
        if b_name0 in nav_map:
            raise ValueError(
                "PREV/NEXT navigation is not supported on the "
                "terminal of a leading Kleene run"
            )
        pattern = Pattern.begin(name, f_pred)
        pattern.one_or_more(f"__lk_{name}", f_pred)
        pattern.followed_by(b_name0, b_pred0)
        run_agg_info = (
            f"__lk_{name}",
            RunAggSpec("count_cap", None, ">=", 1, 1),
            None,
        )
        rest: list = []
    else:
        # a quantified first step expands exactly like Pattern.times,
        # with the leading sub-step as the anchor; an EXPLICIT {k}
        # always uses sub-step naming ({1} included) so arities are
        # schema-compatible (^ pins only the LEADING binding to the
        # key's first row — later reps follow their ordinary
        # contiguity)
        first_pred = (
            f"({f_pred}) AND __mr_rn = 1" if anchor_start else f_pred
        )
        pattern = Pattern.begin(f"{name}_1" if braced else name, first_pred)
        for i in range(2, reps + 1):
            pattern.followed_by(f"{name}_{i}", f_pred)
        rest = toks[1:]
    if len(rest) % 2:
        raise ValueError("pattern must alternate step, connector, step, ...")
    for i, (conn, tok) in enumerate(zip(rest[::2], rest[1::2])):
        conn, gap = _parse_connector(conn)
        name, neg, reps, plus, braced = lookup(tok, first=False)
        pred, where = split[name]
        if where and plus and not braced:
            # A running-aggregate DEFINE on a Kleene step — the SQL
            # standard's DEFINE-aggregate feature (RUNNING semantics,
            # current row included) — compiles to the shared
            # advance_kleene_agg kernel.  Exactly ONE aggregate
            # conjunct (one accumulator per run) plus, since round 8,
            # at most one ANCHOR-correlation conjunct
            # (B.col CMP A.col — the anchor row's value is O(1) extra
            # run state) are supported; any other self/cross-step
            # correlation keeps the pointed rejection below.
            a_name0 = pattern.steps[0].name
            conjs = [
                c[1:-1] if c.startswith("(") and c.endswith(")") else c
                for c in _split_top_level_and(where)
            ]
            specs, corrs, others = [], [], []
            for c in conjs:
                s = _parse_run_agg_conjunct(c, name)
                if s is not None:
                    specs.append(s)
                    continue
                ac = _parse_anchor_corr_conjunct(c, name, a_name0)
                if ac is not None:
                    corrs.append(ac)
                    continue
                others.append(c)
            if specs and not others:
                if len(specs) > 1:
                    raise ValueError(
                        f"step {name}: at most one running-aggregate "
                        "conjunct per Kleene step (one accumulator "
                        "per run)"
                    )
                if len(corrs) > 1:
                    raise ValueError(
                        f"step {name}: at most one anchor-correlation "
                        "conjunct alongside a running-aggregate DEFINE "
                        "(the kernel carries one anchor value per run)"
                    )
                run_agg_info = (
                    name, specs[0], corrs[0] if corrs else None
                )
                where = None
        if where and (plus or braced):
            raise ValueError(
                f"step {name}: correlation is not supported on "
                "quantified ({n}/+) steps (a RUNNING-aggregate DEFINE "
                "over the kleene variable itself — e.g. "
                "B.col <= 1.5 * AVG(B.col), optionally AND-ed with "
                "one anchor comparison B.col CMP A.col — compiles "
                "natively; other correlation is available as the "
                "cep_run_agg operator, operators/cep.py)"
            )
        if gap and (plus or braced):
            raise ValueError(
                f"step {name}: a gapped connector is not supported on "
                "quantified ({n}/+) steps"
            )
        if neg:
            if i * 2 + 2 != len(rest):
                raise ValueError("a negated step must be the last step")
            if conn == "=>":
                raise ValueError("strict negation (=> !X) is not supported")
            pattern.not_followed_by(name, pred, where=where, gap=gap)
        elif plus:
            if conn == "=>":
                raise ValueError("a + step takes -> (its entry is relaxed)")
            pattern.one_or_more(name, pred)
        elif braced:
            # the connector sets the run's INTERNAL contiguity: => means
            # events 2..n are each the key's immediately-next event
            # (entry relaxed, like a + step), -> the n earliest
            # qualifying events in order. An explicit {k} always uses
            # sub-step naming ({1} included: t_<name>_1), keeping every
            # arity of a {n,m} expansion schema-compatible.
            pattern.times(
                name,
                pred,
                reps,
                contiguity="strict" if conn == "=>" else "relaxed",
            )
        elif conn == "=>":
            pattern.next(name, pred, where=where, gap=gap)
        else:
            pattern.followed_by(name, pred, where=where, gap=gap)
    unused = set(defines) - seen
    if unused:
        raise ValueError(f"DEFINE entries never used in PATTERN: {sorted(unused)}")

    if nav_map:
        # attach the streaming-side forms to the Step objects (the
        # builder received the batch predicate); quantified sub-steps
        # are named <name>_<i> and inherit their root's navigation
        for s in pattern.steps:
            info = nav_map.get(s.name)
            if info is None and "_" in s.name:
                root, _, idx = s.name.rpartition("_")
                if idx.isdigit():
                    info = nav_map.get(root)
            if info is not None:
                s.stream_predicate, s.nav_py = info

    if "SUBSET" in clauses:
        # SUBSET U = (A, B), W = (C, D) — union pattern variables,
        # declared before MEASURES so the expansion sees them
        for item in _split_top_level_commas(clauses["SUBSET"]):
            m = re.match(
                r"^([A-Za-z_]\w*)\s*=\s*\(\s*([A-Za-z_]\w*"
                r"(?:\s*,\s*[A-Za-z_]\w*)*)\s*\)\s*$",
                item,
            )
            if not m:
                raise ValueError(
                    f"malformed SUBSET entry: {item!r} "
                    "(want NAME = (STEP, STEP, ...))"
                )
            pattern.subset(
                m.group(1),
                [x.strip() for x in m.group(2).split(",")],
            )

    match_number_alias: str | None = None
    classifier_alias: str | None = None
    measure_prefixes: dict[str, str] = {}
    # (alias, prefix, agg, col|None) universal-set aggregates — see
    # ParsedPatternQuery.universal_measures
    universal_specs: list[tuple] = []
    if "MEASURES" in clauses:
        for item in _split_top_level_commas(clauses["MEASURES"]):
            m = re.match(r"^(.+?)\s+AS\s+([A-Za-z_]\w*)\s*$", item, re.I | re.S)
            if not m:
                raise ValueError(
                    f"malformed MEASURES entry: {item!r} (want expr AS alias)"
                )
            expr, alias = m.group(1).strip(), m.group(2)
            # A FINAL/RUNNING semantics prefix (SQL standard): peel it
            # off before the generic measure validator (which reads
            # column refs) and remember it. The run-agg section maps
            # it to a kind; the classic path serves it on universal
            # aggregates (below), and on step-qualified ONE-ROW
            # measures it peels to a no-op (the output row is the
            # match's last, where RUNNING == FINAL).
            pm = re.match(r"^(FINAL|RUNNING)\s+(.+)$", expr, re.I | re.S)
            prefix: str | None = None
            if pm:
                prefix = pm.group(1).upper()
                measure_prefixes[alias] = prefix
                expr = pm.group(2).strip()
            if run_agg_info is not None:
                # COUNT(B.*) (standard): the generic validator only
                # reads agg(step.col) forms — carry the star as a
                # sentinel column; the run-agg section maps it back
                expr = re.sub(
                    r"\bCOUNT\s*\(\s*([A-Za-z_]\w*)\s*\.\s*\*\s*\)",
                    r"count(\1.__star)",
                    expr,
                    flags=re.I,
                )
                if run_agg_info[0].startswith("__lk_"):
                    # leading Kleene: the USER variable for the run is
                    # the anchor step's name (A of A+); retarget its
                    # COUNT onto the internal kleene step so the
                    # generic validator sees a kleene aggregate — the
                    # run-agg section maps it to the anchor-inclusive
                    # count (kind n1)
                    a0 = pattern.steps[0].name
                    expr = re.sub(
                        rf"\bcount\(\s*{re.escape(a0)}\.__star\s*\)",
                        f"count(__lk_{a0}.__star)",
                        expr,
                        flags=re.I,
                    )
            # the SQL-standard per-match functions are handled by the
            # compiler, not the measure machinery (they are positional,
            # not value aggregates)
            if re.fullmatch(r"MATCH_NUMBER\s*\(\s*\)", expr, re.I):
                if prefix is not None:
                    raise ValueError(
                        f"{prefix} is not applicable to MATCH_NUMBER() "
                        "(a positional per-match function, not a value "
                        "aggregate)"
                    )
                if match_number_alias is not None:
                    raise ValueError("MATCH_NUMBER() listed twice")
                match_number_alias = alias
                continue
            if re.fullmatch(r"CLASSIFIER\s*\(\s*\)", expr, re.I):
                if prefix is not None:
                    raise ValueError(
                        f"{prefix} is not applicable to CLASSIFIER() "
                        "(a positional per-match function, not a value "
                        "aggregate)"
                    )
                if classifier_alias is not None:
                    raise ValueError("CLASSIFIER() listed twice")
                classifier_alias = alias
                continue
            if run_agg_info is None:
                # universal-set aggregate: agg over an UNQUALIFIED
                # column (or *) ranges over ALL bound rows of the
                # match — the RUNNING/FINAL surface on the classic
                # (non-run-agg) path
                mu = re.fullmatch(
                    r"(SUM|COUNT|AVG|MIN|MAX)\s*\(\s*"
                    r"(\*|[A-Za-z_]\w*)\s*\)",
                    expr,
                    re.I,
                )
                if mu:
                    agg, col = mu.group(1).upper(), mu.group(2)
                    if alias.startswith("__arm_"):
                        raise ValueError(
                            f"measure alias {alias!r}: the __arm_ "
                            "prefix is reserved for the universal-"
                            "aggregate value carries"
                        )
                    if col == "*":
                        if agg != "COUNT":
                            raise ValueError(
                                f"measure {alias!r}: {agg}(*) — only "
                                "COUNT takes the * form"
                            )
                        universal_specs.append(
                            (alias, prefix or "RUNNING", "count_star", None)
                        )
                        continue
                    # MIN/MAX fold through least()/greatest(), which
                    # skip NULLs identically on both engines (all-NULL
                    # → NULL) — exact, no arithmetic at all
                    universal_specs.append(
                        (alias, prefix or "RUNNING", agg.lower(), col)
                    )
                    continue
            pattern.measure(alias, expr)

    if universal_specs:
        aliases = [a for a, *_ in universal_specs]
        if len(set(aliases)) != len(aliases):
            dup = sorted({a for a in aliases if aliases.count(a) > 1})
            raise ValueError(f"MEASURES alias listed twice: {dup}")
        reserved = {"key", "anchor_id", "seq_no", "step", "ts", "event_id"}
        for s in pattern.steps:
            reserved |= {f"t_{s.name}", f"id_{s.name}"}
        # MATCH_NUMBER()/CLASSIFIER() aliases surface as output columns
        # too — a universal aggregate reusing one would silently emit
        # duplicate columns after the unpivot/rename
        reserved |= {
            a for a in (match_number_alias, classifier_alias) if a
        }
        bad = sorted(set(aliases) & reserved)
        if bad:
            raise ValueError(
                f"measure alias(es) {bad} collide with output columns"
            )
        pos_steps = [s for s in pattern.steps if s.contiguity != "absent"]
        if any(s.contiguity == "kleene" for s in pos_steps):
            raise ValueError(
                "a universal-set aggregate MEASURE (SUM/COUNT/AVG over "
                "an unqualified column) requires a fixed chain — "
                "aggregate a one_or_more run as agg(<step>.<col>) "
                "instead"
            )
        # ride each referenced column through the match as one hidden
        # measure per (col, step) — the compile target
        # (rows_per_match_measures / the ONE-ROW fold) reads them back
        for c in sorted({c for _a, _p, _g, c in universal_specs if c}):
            for s in pos_steps:
                pattern.measure(f"__arm_{c}__{s.name}", f"{s.name}.{c}")
    pattern.within(clauses["WITHIN"])
    pattern.corr_plan()  # surface correlation/measure errors at parse time
    key_raw = clauses.get("PARTITION BY", "user_id").strip() or "user_id"
    key_cols = tuple(c.strip() for c in key_raw.split(","))
    time_col = clauses.get("ORDER BY", "ts").strip() or "ts"
    for col, label in (
        *((c, "PARTITION BY") for c in key_cols),
        (time_col, "ORDER BY"),
    ):
        if not re.match(r"^[A-Za-z_][A-Za-z_0-9]*$", col):
            raise ValueError(f"{label} must name a column, got {col!r}")
    if len(set(key_cols)) != len(key_cols):
        raise ValueError("PARTITION BY lists a column twice")
    # a composite key compiles against ONE synthesized struct column
    # (match_recognize projects it and flattens the output back to
    # key_<col> columns); single-column keys keep the plain path
    key_col = key_cols[0] if len(key_cols) == 1 else "__mr_key"
    skip = None
    if "AFTER MATCH" in clauses:
        body = re.sub(r"\s+", " ", clauses["AFTER MATCH"].strip())
        kinds = {s.name: s.contiguity for s in pattern.steps}
        pos_names = [
            s.name for s in pattern.steps if s.contiguity != "absent"
        ]
        if re.fullmatch(r"SKIP PAST LAST ROW", body, re.I):
            skip = "skip_past_last_row"
        elif re.fullmatch(r"SKIP TO NEXT ROW", body, re.I):
            # the explicit spelling of the default policy (standard
            # MATCH_RECOGNIZE): emit every match, scan resumes at the
            # row after the kept match's anchor
            skip = None
        else:
            m2 = re.fullmatch(
                r"SKIP TO (FIRST|LAST) ([A-Za-z_]\w*)", body, re.I
            )
            if not m2:
                raise ValueError(
                    f"malformed AFTER MATCH clause: {body!r} (want SKIP "
                    "PAST LAST ROW, SKIP TO NEXT ROW, or SKIP TO "
                    "FIRST/LAST <step>)"
                )
            which, tgt = m2.group(1).upper(), m2.group(2)
            if tgt not in kinds:
                raise ValueError(f"AFTER MATCH: unknown step {tgt!r}")
            if kinds[tgt] == "absent":
                raise ValueError(
                    "AFTER MATCH cannot skip to a negated step"
                )
            if pos_names and tgt == pos_names[0]:
                raise ValueError(
                    f"AFTER MATCH SKIP TO {which} cannot target the "
                    "anchor step (the scan would not advance)"
                )
            # a one_or_more target is legal: FIRST resumes at the
            # run's entry row, LAST at its final row (on a plain step
            # the two spellings coincide — one bound row)
            skip = (
                "skip_to_first" if which == "FIRST" else "skip_to_last",
                tgt,
            )
    for kw in ("ALL ROWS PER MATCH", "ONE ROW PER MATCH"):
        if kw in clauses and clauses[kw]:
            raise ValueError(
                f"{kw} takes no arguments, got {clauses[kw]!r}"
            )
    if "ALL ROWS PER MATCH" in clauses and "ONE ROW PER MATCH" in clauses:
        raise ValueError("specify at most one rows-per-match mode")
    all_rows = "ALL ROWS PER MATCH" in clauses
    if classifier_alias is not None and not all_rows:
        raise ValueError(
            "CLASSIFIER() requires ALL ROWS PER MATCH (in ONE ROW "
            "mode every output row is a whole match, so there is no "
            "per-row pattern variable to name)"
        )
    if all_rows and run_agg_info is None:
        # Both restrictions lift on the DEFINE-aggregate path (round
        # 9): the kleene-agg kernel's emit_rows face carries the
        # per-row RUNNING state, so FINAL/RUNNING MEASURES and a
        # one_or_more step compose there — see the run_agg branch.
        # Universal-set aggregates (RUNNING/FINAL SUM/COUNT/AVG over
        # an unqualified column, round 10) compose HERE too, via
        # rows_per_match_measures — only step-QUALIFIED measures
        # remain whole-match-only.
        user_step_measures = [
            a for a, _e in pattern.measures if not a.startswith("__arm_")
        ]
        if user_step_measures:
            raise ValueError(
                "step-qualified MEASURES are not supported with ALL "
                "ROWS PER MATCH in the dialect beyond CLASSIFIER()/"
                "MATCH_NUMBER() (a step-qualified measure is a "
                "whole-match value; universal-set aggregates — "
                "RUNNING/FINAL SUM/COUNT/COUNT(*)/AVG/MIN/MAX "
                "with the column unqualified — evaluate per row, or "
                "compose rows_per_match_running on the ONE ROW output)"
            )
        for s in pattern.steps:
            if s.contiguity == "kleene":
                raise ValueError(
                    "ALL ROWS PER MATCH is not supported with a "
                    "one_or_more step (a run has no fixed per-row "
                    "schema; the default mode emits the run's "
                    "first/last/count columns)"
                )
    if excluded:
        if not all_rows:
            raise ValueError(
                "{- step -} exclusion requires ALL ROWS PER MATCH "
                "(in ONE ROW mode each output row is a whole match — "
                "there are no per-event rows to exclude)"
            )
        step_kinds = {s.name: s.contiguity for s in pattern.steps}
        positive = [
            s.name for s in pattern.steps if s.contiguity != "absent"
        ]
        for x in sorted(excluded):
            if x not in step_kinds:
                raise ValueError(f"exclusion of unknown step {x!r}")
            if step_kinds[x] == "absent":
                raise ValueError(
                    f"cannot exclude negated step {x!r} (a negated "
                    "step binds no rows to exclude)"
                )
        if excluded >= set(positive):
            raise ValueError(
                "the exclusion list covers every step — the ALL ROWS "
                "output would always be empty"
            )

    run_agg: tuple | None = None
    if run_agg_info is not None:
        # The DEFINE-aggregate path compiles to the sequential
        # advance_kleene_agg kernel, whose scan shape is exactly
        # PATTERN (A -> B+) or (A -> B+ -> C) WITHIN <bound> with
        # SKIP PAST LAST ROW — reject everything the kernel does not
        # express, pointedly.
        b_name, spec, corr = run_agg_info
        lk = b_name.startswith("__lk_")  # leading Kleene (A+ -> B)
        if lk and excluded:
            raise ValueError(
                "{- step -} exclusion is not supported with a leading "
                "Kleene step (excluding the run would empty the "
                "output's A rows; excluding the terminal leaves a "
                "bare count — filter the output instead)"
            )
        if len(pattern.steps) not in (2, 3):
            raise ValueError(
                "a running-aggregate DEFINE supports exactly "
                "PATTERN (A -> B+) or (A -> B+ -> C) — one plain "
                "anchor step, the aggregate Kleene step, then at most "
                "one plain terminal-confirm step (got "
                f"{len(pattern.steps)} steps)"
            )
        a_name = pattern.steps[0].name
        if pattern.steps[1].name != b_name:
            raise ValueError(
                f"the aggregate Kleene step {b_name!r} must "
                "immediately follow the anchor: PATTERN (A -> B+) or "
                "(A -> B+ -> C)"
            )
        conf_name: str | None = None
        if len(pattern.steps) == 3:
            c_step = pattern.steps[2]
            if c_step.contiguity != "relaxed":
                raise ValueError(
                    f"the terminal-confirm step {c_step.name!r} of a "
                    "running-aggregate pattern takes the relaxed -> "
                    "connector and cannot be negated (the kernel scans "
                    "forward for the FIRST confirming row; => strict "
                    "contiguity would race the run's own candidates)"
                )
            if c_step.where is not None:
                raise ValueError(
                    f"the terminal-confirm step {c_step.name!r} cannot "
                    "carry a correlation clause with a "
                    "running-aggregate DEFINE (the kernel keeps one "
                    "accumulator — fold the condition into the step's "
                    "own predicate)"
                )
            if c_step.gap is not None:
                raise ValueError(
                    f"the terminal-confirm step {c_step.name!r} cannot "
                    "carry a gapped connector with a running-aggregate "
                    "DEFINE (the WITHIN bound is the only deadline the "
                    "kernel tracks)"
                )
            conf_name = c_step.name
        # MEASURES over the kernel's outputs compile to renames (no
        # extra state): COUNT(B.col) / COUNT(B.*) → the bound-row
        # count (every bound row has a non-NULL value by the bind
        # rule, so SQL's NULL-skipping COUNT agrees), SUM(B.col) → the
        # exact running sum, AVG(B.col) → sum/count as double,
        # A.<order col> / C.<order col> → the anchor / confirm
        # timestamps.  An optional FINAL/RUNNING prefix (round 9)
        # selects the semantics under ALL ROWS PER MATCH: RUNNING (the
        # SQL-standard default) is the aggregate AT each output row,
        # FINAL the whole-match value on every row; in ONE ROW PER
        # MATCH mode the output row is the match's last, where the two
        # coincide — both prefixes are accepted and equal there.
        run_measures: list[tuple[str, str]] = []
        _m_agg = re.compile(
            r"^\s*(SUM|COUNT|AVG|MIN|MAX)\s*\(\s*"
            r"([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*|\*)\s*\)\s*$",
            re.I,
        )
        # which MEASURES aggregates the one-accumulator kernel can
        # serve, per DEFINE form ('s' = the accumulator itself)
        _form_aggs = {
            "cur_vs_min": {"MIN": "s", "COUNT": "n"},
            "cur_vs_max": {"MAX": "s", "COUNT": "n"},
        }.get(spec.form, {"SUM": "s", "COUNT": "n", "AVG": "avg"})
        if lk:
            # the run carries no value accumulator (trivial count
            # bind); the only run aggregate is the anchor-INCLUSIVE
            # bound-row count (the anchor is the +'s first binding)
            _form_aggs = {"COUNT": "n1"}
        _m_ref = re.compile(
            r"^\s*([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s*$"
        )
        for alias, expr in pattern.measures:
            m_agg = _m_agg.match(expr)
            m_ref = _m_ref.match(expr)
            if m_agg:
                prefix = measure_prefixes.get(alias, "")
                agg, stp, col = (
                    m_agg.group(1).upper(),
                    m_agg.group(2),
                    m_agg.group(3),
                )
                if stp != b_name:
                    if lk:
                        # never leak the internal __lk_ step name —
                        # the user's run variable is the anchor's
                        raise ValueError(
                            f"measure {alias!r}: a leading Kleene run "
                            "carries no value accumulator — only "
                            f"COUNT({a_name}.*) (the bound-row count, "
                            f"anchor included) and {a_name}/"
                            f"{conf_name}.{time_col} references are "
                            "available"
                        )
                    raise ValueError(
                        f"measure {alias!r}: {agg} must range over the "
                        f"aggregate Kleene step {b_name!r}"
                    )
                if col in ("*", "__star"):
                    if agg != "COUNT":
                        raise ValueError(
                            f"measure {alias!r}: {agg}({stp}.*) — only "
                            "COUNT takes the .* form"
                        )
                else:
                    if spec.col is None:
                        raise ValueError(
                            f"measure {alias!r}: the COUNT-cap DEFINE "
                            "form carries no value column — use "
                            f"COUNT({b_name}.*) for the bound-row count"
                        )
                    if col != spec.col:
                        raise ValueError(
                            f"measure {alias!r}: the kernel carries one "
                            f"accumulator, over {b_name}.{spec.col} (got "
                            f"{stp}.{col})"
                        )
                if agg not in _form_aggs:
                    raise ValueError(
                        f"measure {alias!r}: {agg} is not available "
                        f"with this DEFINE form — the kernel carries "
                        f"ONE accumulator ({spec.form}); supported: "
                        f"{', '.join(sorted(_form_aggs))}"
                    )
                kind = _form_aggs[agg]
                if all_rows and prefix != "FINAL":
                    # bare aggregate = RUNNING under ALL ROWS (standard)
                    kind = {
                        "s": "rs", "n": "rn", "avg": "ravg", "n1": "rn1",
                    }[kind]
            elif m_ref:
                stp, col = m_ref.group(1), m_ref.group(2)
                if stp == a_name:
                    kind = "t_anchor"
                elif conf_name is not None and stp == conf_name:
                    kind = "t_conf"
                else:
                    raise ValueError(
                        f"measure {alias!r}: a plain step reference "
                        "must name the anchor or the terminal-confirm "
                        f"step (got {stp!r})"
                    )
                if col != time_col:
                    raise ValueError(
                        f"measure {alias!r}: only the ORDER BY column "
                        f"{time_col!r} of a bound step is available "
                        f"(the kernel carries timestamps, not rows; "
                        f"got {stp}.{col})"
                    )
            else:
                disp = a_name if lk else b_name
                raise ValueError(
                    f"measure {alias!r} ({expr!r}) is not of a "
                    "supported running-aggregate form: "
                    f"{'|'.join(sorted(_form_aggs))}"
                    f"({disp}.{spec.col or '*'}), "
                    f"{a_name}.{time_col}"
                    + (f", or {conf_name}.{time_col}" if conf_name else "")
                )
            run_measures.append((alias, kind))
        # ALL ROWS PER MATCH, CLASSIFIER(), {- step -} exclusion, and
        # MATCH_NUMBER() all compose with the run-agg path since round
        # 9 (the kernel's emit_rows face + the faces' per-key match
        # counter); SUBSET/navigation/anchors have no kernel spelling.
        if match_number_alias is not None:
            run_measures.append((match_number_alias, "mn"))
        for bad, what in (
            (pattern.subsets, "SUBSET"),
            (all_nav_specs, "PREV/NEXT navigation"),
            (anchor_start or anchor_end, "^/$ anchors"),
        ):
            if bad:
                _disp = a_name if lk else b_name
                raise ValueError(
                    f"{what} is not supported with a running-aggregate "
                    "DEFINE (the kernel emits the fixed columns key, "
                    f"t_{a_name}, {_disp}_count"
                    + (f", {_disp}_sum_{spec.col}" if spec.col else "")
                    + (f", t_{conf_name}" if conf_name else "")
                    + " — MEASURES may rename/select them)"
                )
        if skip != "skip_past_last_row":
            raise ValueError(
                "a running-aggregate DEFINE requires AFTER MATCH SKIP "
                "PAST LAST ROW spelled explicitly — the kernel's "
                "single-scan runs never overlap (a failing candidate "
                "row is consumed and cannot anchor the next match), "
                "which is PAST LAST ROW semantics, not the default "
                "SKIP TO NEXT ROW's overlapping matches"
            )
        run_agg = (
            a_name, b_name, spec, conf_name, run_measures, corr
        )
    return ParsedPatternQuery(
        pattern=pattern,
        key_col=key_col,
        time_col=time_col,
        skip=skip,
        nav=tuple(sorted(all_nav_specs)),
        key_cols=key_cols if len(key_cols) > 1 else (),
        all_rows=all_rows,
        match_number_alias=match_number_alias,
        classifier_alias=classifier_alias,
        excluded=tuple(sorted(excluded)),
        anchor_start=anchor_start,
        anchor_end=anchor_end,
        universal_measures=tuple(universal_specs),
        run_agg_bounds=(0, None) if leading_kleene else (1, None),
        run_agg=run_agg,
    )


_PERMUTE_RE = re.compile(r"PERMUTE\s*\(([^)]*)\)", re.I)


def expand_permute_sql(text: str):
    """Detect a trailing `PERMUTE(A, B, ...)` group in the PATTERN
    clause and expand it into the n! variant texts (the standard
    rewrite: PERMUTE ≡ alternation of all orderings). Returns
    None when the text has no PERMUTE, else a list of
    (ordering, variant_text) pairs in declaration-first order —
    the tie-break order for the winner pick."""
    from itertools import permutations

    m = _PERMUTE_RE.search(text)
    if m is None:
        return None
    if _PERMUTE_RE.search(text, m.end()):
        raise ValueError("only one PERMUTE group is supported")
    # round 11: a trailing plain '-> step' chain AFTER the group is
    # legal SQL:2016 (`PERMUTE(a, b) -> confirm`) — each ordering
    # variant keeps the suffix verbatim (the splice below carries
    # text[m.end():]); anything fancier after the group stays a
    # pointed error
    mt = re.match(
        r"((?:\s*->\s*[A-Za-z_]\w*)*)\s*\)", text[m.end() :]
    )
    if mt is None:
        raise ValueError(
            "after a PERMUTE group the PATTERN clause may only "
            "continue with a plain '-> step' chain (no quantifiers, "
            "negation, or a second group)"
        )
    suffix = re.findall(r"[A-Za-z_]\w*", mt.group(1))
    names = [t.strip() for t in m.group(1).split(",") if t.strip()]
    if len(names) < 2:
        raise ValueError("PERMUTE needs at least two step names")
    if len(names) > 3:
        # n! orderings must fit the shared 16-variant expansion cap
        # (the streaming runner holds one NFA per variant per key —
        # 4! = 24 > 16 would blow per-key state on BOTH engines).
        raise ValueError(
            f"PERMUTE of {len(names)} steps yields "
            f"{math.factorial(len(names))} ordering variants — the "
            "expansion is capped at 16 (max 3 steps)"
        )
    for n in names:
        if not re.match(r"^[A-Za-z_]\w*$", n):
            raise ValueError(
                f"PERMUTE steps must be plain step names, got {n!r} "
                "(no !/{{n}}/+ inside a PERMUTE group)"
            )
    if len(set(names)) != len(names):
        raise ValueError("duplicate step name inside PERMUTE")
    if len(set(suffix)) != len(suffix) or set(suffix) & set(names):
        raise ValueError(
            "steps after a PERMUTE group must be distinct and must "
            "not repeat a permuted step name"
        )
    return [
        (perm, text[: m.start()] + " -> ".join(perm) + text[m.end() :])
        for perm in permutations(names)
    ]


_GROUP_RE = re.compile(r"\(([^()]*)\)\s*\{(\d+)(?:\s*,\s*(\d+))?\}")


def expand_group_sql(text: str):
    """Detect quantified GROUPs `( ... ){n}` / `( ... ){n,m}` inside
    the PATTERN clause (MATCH_RECOGNIZE sub-pattern quantification,
    e.g. `(A -> B){2}` = the A-B pair twice) and expand them into flat
    step chains — repeat r's steps are renamed `<name>_r<r>` (each a
    timestamp column), repeats join with the relaxed `->` connector,
    and each repeat's DEFINE entries are duplicated under the renamed
    steps. `{n}` yields one chain; `{n,m}` yields the greedy
    descending-arity variants, which ride the SAME winner-pick
    machinery as step quantifiers on both engines (union + preference
    groupBy batch-side, the variant NFA runner streaming-side).
    SEVERAL groups (round 10; previously a pointed error) expand to
    the cross product of their arity ranges in leftmost-greedy order
    (the leading group's arity dominates the preference, regex
    greedy-quantifier semantics), still under the 8-variant cap.

    Returns None when the text has no quantified group, else a list
    of (desc, variant_text) pairs (singleton when every group is an
    exact `{n}`). Restrictions (pointed errors, not silent misreads):
    no nesting; plain step names inside (no ?/{k}/+/!); step names
    distinct across groups (repeats of two groups would otherwise
    rename onto the same `<name>_r<r>` columns); group steps may not
    carry correlation clauses (each repeat binds independently — a
    cross-repeat correlation would silently read the wrong repeat);
    MEASURES may not reference group steps (no single binding)."""
    clauses = _split_clauses(text)
    body = clauses.get("PATTERN", "").strip()
    if not (body.startswith("(") and body.endswith(")")):
        return None
    inner_pat = body[1:-1]
    matches = list(_GROUP_RE.finditer(inner_pat))
    if not matches:
        return None
    groups = []  # (match, names, conns, lo, hi)
    n_variants = 1
    for m in matches:
        lo = int(m.group(2))
        hi = int(m.group(3)) if m.group(3) else lo
        if lo < 1:
            raise ValueError("group {n[,m]} needs n >= 1")
        if hi < lo:
            raise ValueError("group {n,m} needs m >= n")
        if hi - lo > 7 or hi > 8:
            raise ValueError(
                "group expansion capped at 8 repeats/variants"
            )
        toks = [
            t
            for t in re.split(_CONNECTOR_SPLIT + r"|\s+", m.group(1))
            if t
        ]
        if not toks or len(toks) % 2 == 0:
            raise ValueError("group must be step (connector step)*")
        names = toks[::2]
        conns = toks[1::2]
        for n in names:
            if not re.match(r"^[A-Za-z_]\w*$", n):
                raise ValueError(
                    f"group steps must be plain step names, got {n!r} "
                    "(no !/?/{k}/+ inside a quantified group)"
                )
        for c in conns:
            _parse_connector(c)  # validates; gapped connectors carry
        if len(set(names)) != len(names):
            raise ValueError("duplicate step name inside group")
        n_variants *= hi - lo + 1
        groups.append((m, names, conns, lo, hi))
    all_names = [n for _m, ns, _c, _l, _h in groups for n in ns]
    if len(set(all_names)) != len(all_names):
        dup = sorted({n for n in all_names if all_names.count(n) > 1})
        raise ValueError(
            f"step name(s) {dup} appear in more than one quantified "
            "group — repeats would rename onto the same columns"
        )
    if n_variants > 8:
        raise ValueError("group expansion capped at 8 repeats/variants")

    # A group was detected, so this text will be expanded rather than
    # handed to parse_pattern_sql first — run the same required-clause
    # validation here so a malformed group query gets the dialect's
    # pointed ValueError, not a raw KeyError/AttributeError.
    for required in ("DEFINE", "WITHIN"):
        if required not in clauses:
            raise ValueError(f"missing {required} clause")

    defines = {}
    for item in _split_top_level_commas(clauses["DEFINE"]):
        nm = re.match(r"^([A-Za-z_]\w*)\s+AS\s+", item, re.I)
        if not nm:
            raise ValueError(
                f"malformed DEFINE entry: {item!r} (want NAME AS expr)"
            )
        defines[nm.group(1)] = item
    step_names = set(defines)
    for n in all_names:
        if n not in defines:
            raise ValueError(f"group step {n} has no DEFINE entry")
        expr = re.sub(
            r"^([A-Za-z_]\w*)\s+AS\s+", "", defines[n], flags=re.I
        )
        if any(
            q in step_names
            for q, _c in _WHERE_REF.findall(_mask_literals(expr))
        ):
            raise ValueError(
                f"group step {n}: correlation clauses are not supported "
                "inside a quantified group (each repeat binds "
                "independently)"
            )
    if "MEASURES" in clauses:
        for item in _split_top_level_commas(clauses["MEASURES"]):
            hit = {
                q
                for q, _c in _WHERE_REF.findall(_mask_literals(item))
            } & set(all_names)
            if hit:
                raise ValueError(
                    f"measure {item.strip()!r} references group step(s) "
                    f"{sorted(hit)} — a quantified group's steps have "
                    "no single binding"
                )

    def _chain(names: list, conns: list, k: int) -> str:
        parts: list[str] = []
        for r in range(1, k + 1):
            if parts:
                parts.append("->")
            for i, n in enumerate(names):
                if i:
                    parts.append(conns[i - 1])
                parts.append(f"{n}_r{r}")
        return " ".join(parts)

    import itertools

    # leftmost-greedy cross product: the leading group's arity ranks
    # first (descending), then the next, ... — regex greedy semantics
    arity_ranges = [
        range(h, l - 1, -1) for _m, _ns, _cs, l, h in groups
    ]
    variants = []
    for ks in itertools.product(*arity_ranges):
        # splice every group's flat chain in, right-to-left so the
        # earlier matches' spans stay valid
        new_pat = inner_pat
        for (m, names, conns, _l, _h), k in sorted(
            zip(groups, ks), key=lambda t: -t[0][0].start()
        ):
            new_pat = (
                new_pat[: m.start()]
                + _chain(names, conns, k)
                + new_pat[m.end() :]
            )
        new_pat = new_pat.strip()
        kept = [
            item
            for nm, item in defines.items()
            if nm not in set(all_names)
        ]
        dup = [
            re.sub(
                r"^([A-Za-z_]\w*)(\s+AS\s+)",
                lambda mo: f"{mo.group(1)}_r{r}{mo.group(2)}",
                defines[n],
                flags=re.I,
            )
            for (_m, names, _cs, _l, _h), k in zip(groups, ks)
            for r in range(1, k + 1)
            for n in names
        ]
        vtext = f"PATTERN ( {new_pat} )\nWITHIN {clauses['WITHIN']}\n"
        vtext += "DEFINE " + ",\n       ".join(kept + dup)
        if "MEASURES" in clauses:
            vtext += f"\nMEASURES {clauses['MEASURES']}"
        for kw in ("PARTITION BY", "ORDER BY"):
            if kw in clauses:
                vtext += f"\n{kw} {clauses[kw]}"
        desc = re.sub(r"\s+", "", new_pat)
        variants.append((desc, vtext))
    return variants


_QUANT_TOKEN = re.compile(
    r"^([A-Za-z_]\w*)(?:(\?\??)|\{(\d+),(\d+)\}(\?)?)$"
)

# `(A | B | C)` — a parenthesized alternation of plain step names NOT
# followed by a quantifier (a trailing `{` is a quantified group,
# handled by _GROUP_RE)
_ALT_RE = re.compile(r"\(\s*([^()|]+(?:\|[^()|]+)+)\s*\)(?!\s*\{)")
_ALT_PLACEHOLDER = "__ALT__"


def expand_quantifier_sql(text: str):
    """Detect `B?` (optional step) / `B{n,m}` (range repetition) /
    `(A | B)` alternation tokens in the PATTERN clause and expand the
    query into its fixed-shape variant texts — the standard rewrite
    (`A B? C` ≡ `A B C | A C`, `B{n,m}` ≡ `B{m} | ... | B{n}`, an
    alternation group IS its branch list), GREEDY preference order:
    the first variant keeps every optional present at its maximal
    arity, and the declaration-first cross-product order makes
    earlier quantifiers outrank later ones. Alternation preference is
    declaration order (first alternative preferred — SQL
    first-match-in-alternation), and because alternation is just
    another options slot it composes freely with `?`/`{n,m}` in the
    same pattern under the shared 16-variant cap. Returns None when
    the text has none of these tokens, else a list of
    (desc, variant_text) pairs where desc is the variant's
    connector-joined step spelling (the `variant` output column). A
    skipped step's DEFINE entry is dropped from the variant so each
    variant parses standalone."""
    from itertools import product

    clauses = _split_clauses(text)
    body = clauses.get("PATTERN", "").strip()
    if not (body.startswith("(") and body.endswith(")")):
        # let parse_pattern_sql produce its pointed error
        return None
    inner = body[1:-1].strip()

    alt_names: list[str] | None = None
    if "PERMUTE" not in inner.upper():
        am = _ALT_RE.search(inner)
        if am is not None:
            if _ALT_RE.search(inner, am.end()):
                raise ValueError(
                    "only one alternation group is supported"
                )
            alt_names = [n.strip() for n in am.group(1).split("|")]
            for n in alt_names:
                if not re.match(r"^[A-Za-z_]\w*$", n):
                    raise ValueError(
                        "alternation branches must be plain step "
                        f"names, got {n!r} (no ?/{{n}}/+/! inside "
                        "an alternation group)"
                    )
            if len(set(alt_names)) != len(alt_names):
                raise ValueError("duplicate step name inside alternation")
            inner = (
                inner[: am.start()]
                + f" {_ALT_PLACEHOLDER} "
                + inner[am.end() :]
            ).strip()

    toks = [t for t in re.split(_CONNECTOR_SPLIT + r"|\s+", inner) if t]
    if alt_names is None and not any(_QUANT_TOKEN.match(t) for t in toks):
        return None
    # token stream = step (connector step)*; walk steps with their
    # PRECEDING connector so an absent optional drops its connector
    if not toks or re.fullmatch(_CONNECTOR_SPLIT, toks[0]):
        raise ValueError("PATTERN must start with a step")
    steps: list[tuple[str | None, str]] = [(None, toks[0])]
    rest = toks[1:]
    if len(rest) % 2:
        raise ValueError("pattern must alternate step, connector, step, ...")
    for conn, tok in zip(rest[::2], rest[1::2]):
        steps.append((conn, tok))

    options: list[list[tuple[str | None, str | None]]] = []
    ranged_names: set[str] = set()
    for i, (conn, tok) in enumerate(steps):
        if tok == _ALT_PLACEHOLDER:
            if i == 0:
                raise ValueError(
                    "the first step cannot be an alternation "
                    "(it anchors the match window)"
                )
            options.append([(conn, nm) for nm in alt_names])
            continue
        m = _QUANT_TOKEN.match(tok)
        if m is None:
            options.append([(conn, tok)])
            continue
        name, opt, lo, hi, rng_rel = (
            m.group(1), m.group(2), m.group(3), m.group(4), m.group(5),
        )
        if i == 0:
            raise ValueError(
                f"step {name}: the first step cannot be optional/ranged "
                "(it anchors the match window)"
            )
        if opt:
            # `B?` greedy prefers the with-B variant; `B??` reluctant
            # flips the pair — the winner picker is declaration-order,
            # so preference IS the expansion order
            pair = [(conn, name), (conn, None)]
            options.append(pair[::-1] if opt == "??" else pair)
        else:
            lo_i, hi_i = int(lo), int(hi)
            if lo_i < 1:
                raise ValueError(f"step {name}: {{n,m}} needs n >= 1")
            if hi_i <= lo_i:
                raise ValueError(f"step {name}: {{n,m}} needs m > n")
            if hi_i - lo_i > 7:
                raise ValueError(
                    f"step {name}: {{n,m}} span capped at 8 variants"
                )
            # every arity keeps the explicit {k} spelling — {1} included
            # — so sub-step columns are t_<name>_1..k in EVERY variant
            # and lower arities are schema-subsets of the maximal one.
            # `{n,m}` greedy = descending arity; `{n,m}?` reluctant =
            # ascending (shortest preferred)
            ks = range(hi_i, lo_i - 1, -1) if not rng_rel else range(
                lo_i, hi_i + 1
            )
            ranged_names.add(name)
            options.append([(conn, f"{name}{{{k}}}") for k in ks])
    variants = []
    n_variants = 1
    for opts in options:
        n_variants *= len(opts)
    if n_variants > 16:
        raise ValueError(
            f"quantifier expansion yields {n_variants} variants (max 16)"
        )
    # MEASURES lift through the expansion: each measure item travels
    # into exactly the variants where every step it references is
    # BOUND — a variant that skips a referenced optional step drops
    # the item, and _compile_quantifier_batch pads the column with a
    # typed NULL (SQL semantics: a measure over an unbound step is
    # NULL). A ranged ({n,m}) step expands into k sub-steps, so a
    # single `B.col` ref has no binding to resolve to — rejected with
    # a pointed error rather than silently misread.
    measure_items: list[tuple[str, set[str]]] = []
    if "MEASURES" in clauses:
        define_names = {
            re.match(r"^([A-Za-z_]\w*)", item).group(1)
            for item in _split_top_level_commas(clauses["DEFINE"])
        }
        for item in _split_top_level_commas(clauses["MEASURES"]):
            refs = {
                q
                for q, _c in _WHERE_REF.findall(_mask_literals(item))
                if q in define_names
            }
            hit = refs & ranged_names
            if hit:
                raise ValueError(
                    f"measure {item.strip()!r} references ranged step(s) "
                    f"{sorted(hit)} — a {{n,m}} step expands into "
                    "sub-steps with no single binding to reference"
                )
            measure_items.append((item.strip(), refs))
    for combo in product(*options):
        parts: list[str] = []
        used: set[str] = set()
        for conn, tok in combo:
            if tok is None:
                continue
            if parts:
                parts.append(conn if conn else "->")
            parts.append(tok)
            sm = _STEP_TOKEN.match(tok)
            if sm:  # garbage tokens fall through to parse's pointed error
                used.add(sm.group(2))
        desc = "".join(parts)
        kept_defines = [
            item
            for item in _split_top_level_commas(clauses["DEFINE"])
            if re.match(r"^([A-Za-z_]\w*)", item).group(1) in used
        ]
        vtext = f"PATTERN ( {' '.join(parts)} )\nWITHIN {clauses['WITHIN']}\n"
        vtext += "DEFINE " + ",\n       ".join(kept_defines)
        kept_measures = [
            item for item, refs in measure_items if refs <= used
        ]
        if kept_measures:
            vtext += "\nMEASURES " + ",\n         ".join(kept_measures)
        for kw in ("PARTITION BY", "ORDER BY"):
            if kw in clauses:
                vtext += f"\n{kw} {clauses[kw]}"
        variants.append((desc, vtext))
    return variants


def _compile_quantifier_batch(df: DataFrame, variants) -> DataFrame:
    """Union the expanded variant plans and keep, per anchor, the
    FIRST variant (declaration/greedy order) that matched — greedy
    quantifier semantics, implemented as one groupBy taking the min
    over a (rank, ...) struct. Branch schemas differ (a skipped step
    has no t_ column); every branch is padded to the first — maximal —
    variant's schema with typed NULLs, so the output schema is
    variant-independent.

    Scale: each variant is the proven per-key join-agg chain over the
    same key layout; the greedy pick is ONE extra groupBy on the
    shared (key, anchor, t_anchor) columns — no text columns travel."""
    from pyspark.sql import functions as F

    # two passes: compile every variant, then pad each to the UNION
    # schema (in order of first appearance). Greedy expansions put the
    # maximal variant first, but reluctant (`??` / `{n,m}?`) order the
    # minimal variant first — the union schema covers both directions.
    compiled = []
    full_schema: dict[str, str] = {}
    full_cols: list[str] = []
    for desc, vtext in variants:
        parsed = parse_pattern_sql(vtext)
        for a, _e in parsed.pattern.measures:
            # same guard as the PERMUTE path: the winner machinery
            # adds its own label/internal columns
            if a == "variant" or a.startswith("_"):
                raise ValueError(
                    f"measure alias {a!r} collides with a variant "
                    "output/internal column (variant and _-prefixed "
                    "names are reserved here)"
                )
        bdf = parsed.pattern.compile_batch(
            df, key_col=parsed.key_col, time_col=parsed.time_col
        )
        for c, t in bdf.dtypes:
            if c not in full_schema:
                full_schema[c] = t
                full_cols.append(c)
            elif full_schema[c] != t:
                raise ValueError(
                    f"variant {desc!r} emits {c} as {t}, earlier variant "
                    f"emitted {full_schema[c]}"
                )
        compiled.append(bdf)
    branches = []
    for rk, bdf in enumerate(compiled, start=1):
        for c in full_cols:
            if c not in bdf.columns:
                bdf = bdf.withColumn(c, F.lit(None).cast(full_schema[c]))
        branches.append(
            bdf.select(*full_cols).withColumn("_rk", F.lit(rk))
        )
    allb = branches[0]
    for b in branches[1:]:
        allb = allb.unionByName(b)
    group_cols = full_cols[:3]  # key, anchor_id, t_<anchor>
    rest_cols = full_cols[3:]
    best = allb.groupBy(*group_cols).agg(
        F.min(
            F.struct(
                F.col("_rk").alias("rk"),
                *[F.col(c).alias(c) for c in rest_cols],
            )
        ).alias("_m")
    )
    label = F.lit(None).cast("string")
    for rk, (desc, _) in reversed(list(enumerate(variants, start=1))):
        label = F.when(F.col("_m.rk") == rk, desc).otherwise(label)
    return best.select(
        *group_cols,
        *[F.col(f"_m.{c}").alias(c) for c in rest_cols],
        label.alias("variant"),
    )


def _run_agg_num_conv(df: DataFrame, col: str, what: str):
    """int/float converter for a numeric input column, with the
    shared pointed errors (one dispatch for the aggregate value AND
    the correlation operands — used by _compile_run_agg and the
    round-11 rule-pack spec builder)."""
    from pyspark.sql import types as T

    if col not in df.columns:
        raise ValueError(
            f"{what} column {col!r} is not a column of the input "
            f"({df.columns})"
        )
    t = df.schema[col].dataType
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int
    if isinstance(t, (T.FloatType, T.DoubleType)):
        return float
    raise ValueError(
        f"{what} column {col!r} must be integer or float typed "
        f"(got {t.simpleString()}; cast decimals explicitly to "
        "pick the arithmetic)"
    )


def _run_agg_pack_spec(
    df: DataFrame,
    parsed: "ParsedPatternQuery",
    min_n: int = 1,
    max_n: int | None = None,
):
    """Build the streaming KleeneAggRuleSpec for ONE running-aggregate
    rule inside a multi-query pack (match_recognize_all, round 11) —
    the same bind/combine/out_spec derivation as _compile_run_agg's
    ONE-ROW default path, packaged for the variant multiplexer's
    mode='all' state (streaming/nfa.py advance_variants)."""
    from spark_cep_spark.streaming.nfa import (
        KleeneAggRuleSpec,
        _interval_to_ms,
    )

    a_name, b_name, spec, conf_name, _run_measures, _corr = parsed.run_agg
    a_step, b_step = parsed.pattern.steps[:2]
    conf_step = (
        parsed.pattern.steps[2] if conf_name is not None else None
    )
    confirm = conf_step is not None
    val_col = spec.col
    integral = (
        _run_agg_num_conv(df, val_col, "DEFINE aggregate") is int
        if val_col is not None
        else True
    )
    acc_label = {"cur_vs_min": "min", "cur_vs_max": "max"}.get(
        spec.form, "sum"
    )
    if b_name.startswith("__lk_"):
        # leading Kleene (A+ -> B): anchor-inclusive count under the
        # user variable; the confirm timestamp always exists
        out_spec = [
            (f"t_{a_name}", "t_anchor"),
            (f"{a_name}_count", "n1"),
            (f"t_{conf_name}", "t_conf"),
        ]
    else:
        out_spec = [(f"t_{a_name}", "t_anchor"), (f"{b_name}_count", "n")]
        if val_col is not None:
            out_spec.append((f"{b_name}_{acc_label}_{val_col}", "s"))
        if confirm:
            out_spec.append((f"t_{conf_name}", "t_conf"))
    step_preds = [
        (a_name, a_step.predicate),
        (b_name, b_step.predicate),
    ]
    if confirm:
        step_preds.append((conf_name, conf_step.predicate))
    return KleeneAggRuleSpec(
        step_preds,
        _interval_to_ms(parsed.pattern.time_bound) * 1000,
        _compile_run_agg_bind(spec),
        out_spec,
        integral,
        val_col=val_col,
        confirm=confirm,
        min_n=min_n,
        max_n=max_n,
        combine=_run_agg_combine(spec),
    )


def _compile_run_agg(
    df: DataFrame,
    parsed: ParsedPatternQuery,
    watermark: str = "10 minutes",
    min_n: int = 1,
    max_n: int | None = None,
) -> DataFrame:
    """Compile a running-aggregate MATCH_RECOGNIZE query (PATTERN
    (A -> B+) or (A -> B+ -> C) with a DEFINE aggregate on B) for
    either engine via the shared advance_kleene_agg kernel.

    Spark-first split: the anchor/candidate/confirm predicates and
    the value column are evaluated JVM-side into narrow columns (key,
    ts, eid, __is_a, __is_c, __v[, __is_conf]) — filters and the
    projection reach the scan; only the run-dependent aggregate check
    (inexpressible as a window frame: whether a row binds depends on
    which earlier rows bound) crosses into Python, with O(1) per-key
    state.  Batch runs the kernel per key via applyInPandas (wm =
    +inf force-closes open runs at partition end — in the confirm
    shape unconfirmed runs just die); streaming via
    kleene_agg_stream's applyInPandasWithState with the deadline
    timer.  MEASURES compile to renames/selections of the kernel's
    fixed outputs (parse_pattern_sql validated them into (alias,
    kind) pairs) — no extra kernel state.

    100 TB shape: ONE key shuffle into an O(rows-per-key) scan with
    O(1) state — the same tier-(b) class as win_ewma/cep_run_agg;
    keys parallelize, no driver state.  Integer value columns run in
    arbitrary-precision integers (the cross-multiplied bind never
    divides); float columns accumulate in the fixed (ts, eid) order,
    identical on both engines.

    min_n / max_n carry a {n,m} quantifier on the Kleene step
    (rewritten to B+ by _rewrite_run_agg_bounds; semantics in
    advance_kleene_agg).  A composite PARTITION BY (parsed.key_cols)
    projects one narrow column per key part named key_<col> — both
    faces group by all parts, the output leads with them (the
    non-run-agg path's _flatten_key naming)."""
    import pandas as pd
    from pyspark.sql import types as T

    from spark_cep_spark.streaming.nfa import (
        _interval_to_ms,
        advance_kleene_agg,
        assign_match_numbers,
        filter_excluded_rows,
        kleene_agg_out_columns,
        kleene_agg_out_fields,
        kleene_agg_stream,
    )

    a_name, b_name, spec, conf_name, run_measures, corr = (
        parsed.run_agg
    )
    all_rows = parsed.all_rows
    # leading Kleene: anchor and candidates are the SAME user variable
    # (A of A+), so CLASSIFIER() names both 'A' — never the internal
    # __lk_ step name
    cls_names = (
        (a_name, a_name, conf_name or "")
        if b_name.startswith("__lk_")
        else (a_name, b_name, conf_name or "")
    )
    excl_codes = tuple(
        code
        for step, code in ((a_name, 0), (b_name, 1), (conf_name, 2))
        if step is not None and step in parsed.excluded
    )
    a_step, b_step = parsed.pattern.steps[:2]
    conf_step = parsed.pattern.steps[2] if conf_name is not None else None
    confirm = conf_step is not None
    bind = _compile_run_agg_bind(spec)
    combine = _run_agg_combine(spec)
    acc_label = {"cur_vs_min": "min", "cur_vs_max": "max"}.get(
        spec.form, "sum"
    )
    within_us = _interval_to_ms(parsed.pattern.time_bound) * 1000
    key_col, time_col = parsed.key_col, parsed.time_col

    def _num_conv(col: str, what: str):
        return _run_agg_num_conv(df, col, what)

    val_col = spec.col
    integral = (
        _num_conv(val_col, "DEFINE aggregate") is int
        if val_col is not None
        else True
    )

    corr_fn = None
    if corr is not None:
        bx_conv = _num_conv(corr.b_col, "anchor-correlation")
        ay_conv = _num_conv(corr.a_col, "anchor-correlation")
        corr_fn = _AC_OPS[corr.cmp]

    if all_rows:
        # ALL ROWS PER MATCH: every output row IS a bound event — lead
        # with the row's own (ts, event_id), then CLASSIFIER() if
        # requested, then the measures (default: the RUNNING count/sum
        # twins, the standard's bare-aggregate semantics).
        reserved = {"ts", "event_id"} | (
            {f"key_{c}" for c in parsed.key_cols}
            if parsed.key_cols
            else {"key"}
        )
        for alias in [parsed.classifier_alias] + [
            a for a, _ in run_measures
        ]:
            if alias is None:
                continue
            if alias in reserved:
                raise ValueError(
                    f"measure alias {alias!r} collides with an ALL "
                    "ROWS PER MATCH output column (the per-row mode "
                    f"always emits {sorted(reserved)}) — pick another "
                    "alias"
                )
            reserved.add(alias)  # also rejects two measures sharing one
        out_spec = [("ts", "row_ts"), ("event_id", "row_eid")]
        if parsed.classifier_alias is not None:
            out_spec.append((parsed.classifier_alias, "cls"))
        if run_measures:
            out_spec.extend(run_measures)
        elif b_name.startswith("__lk_"):
            # leading Kleene: the default per-row measure is the
            # anchor-INCLUSIVE running count under the user variable
            out_spec.append((f"{a_name}_count", "rn1"))
        else:
            out_spec.append((f"{b_name}_count", "rn"))
            if val_col is not None:
                out_spec.append(
                    (f"{b_name}_{acc_label}_{val_col}", "rs")
                )
    elif run_measures:
        out_spec = list(run_measures)
    elif b_name.startswith("__lk_"):
        # leading Kleene (A+ -> B): the run's user variable is the
        # anchor's name; the count is anchor-INCLUSIVE (n1), and the
        # confirm timestamp always exists (the shape requires B)
        out_spec = [
            (f"t_{a_name}", "t_anchor"),
            (f"{a_name}_count", "n1"),
            (f"t_{conf_name}", "t_conf"),
        ]
    else:
        out_spec = [(f"t_{a_name}", "t_anchor"), (f"{b_name}_count", "n")]
        if val_col is not None:
            out_spec.append((f"{b_name}_{acc_label}_{val_col}", "s"))
        if confirm:
            out_spec.append((f"t_{conf_name}", "t_conf"))
    # duplicate output names collapse silently in the column dict
    # (ONE ROW mode included — review catch): fail pointedly instead
    names_seen: set[str] = set()
    for nm, _ in out_spec:
        if nm in names_seen:
            raise ValueError(
                f"two MEASURES share the output alias {nm!r} — "
                "aliases must be unique"
            )
        names_seen.add(nm)

    if df.isStreaming:
        df = df.withWatermark(time_col, watermark)
    id_col = "event_id" if "event_id" in df.columns else None
    if parsed.key_cols:
        key_out = tuple(f"key_{c}" for c in parsed.key_cols)
        key_proj = [
            F.col(c).alias(o) for c, o in zip(parsed.key_cols, key_out)
        ]
        key_notnull = F.lit(True)
        for c in parsed.key_cols:
            key_notnull = key_notnull & F.col(c).isNotNull()
    else:
        key_out = ("key",)
        key_proj = [F.col(key_col).alias("key")]
        key_notnull = F.col(key_col).isNotNull()
    proj = [
        *key_proj,
        F.col(time_col).alias("ts"),
        # NULL id -> 0 at the source: both faces previously filled 0
        # pre-sort Python-side; hoisting the coalesce JVM-side lets the
        # batch face sort on eid directly (sortWithinPartitions below)
        F.coalesce(
            (F.col(id_col) if id_col else F.lit(0)).cast("long"), F.lit(0)
        ).alias("eid"),
        # NULL predicate results are non-binding rows (SQL 3VL)
        F.coalesce(F.expr(a_step.predicate), F.lit(False)).alias("__is_a"),
        F.coalesce(F.expr(b_step.predicate), F.lit(False)).alias("__is_c"),
        (
            F.col(val_col) if val_col is not None else F.lit(0).cast("long")
        ).alias("__v"),
    ]
    if confirm or corr is not None:
        # the kernel's row layout is positional: __is_conf always
        # precedes __bx/__ay, so corr without confirm still carries
        # the (all-False) confirm column
        proj.append(
            (
                F.coalesce(F.expr(conf_step.predicate), F.lit(False))
                if confirm
                else F.lit(False)
            ).alias("__is_conf")
        )
    if corr is not None:
        proj.append(F.col(corr.b_col).alias("__bx"))
        proj.append(F.col(corr.a_col).alias("__ay"))
    prepared = df.filter(
        key_notnull & F.col(time_col).isNotNull()
    ).select(*proj)

    if df.isStreaming:
        return kleene_agg_stream(
            prepared, bind, within_us, out_spec, integral,
            confirm=confirm, min_n=min_n, max_n=max_n, key_cols=key_out,
            corr=corr_fn,
            corr_convs=(bx_conv, ay_conv) if corr is not None else None,
            emit_rows=all_rows, exclude_cls=excl_codes,
            cls_names=cls_names, combine=combine,
        )

    conv = int if integral else float
    fields = [
        T.StructField(c, prepared.schema[c].dataType) for c in key_out
    ]
    fields += kleene_agg_out_fields(out_spec, integral)
    out_schema = T.StructType(fields)
    names = [f.name for f in fields]
    want_mn = any(k == "mn" for _, k in out_spec)
    if not all_rows:
        # in ONE ROW mode records are [anchor_us, n, s(...)] — r[2] is
        # the accumulator, not a classifier code; the parser guarantees
        # exclusion only under ALL ROWS, enforce locally
        assert not excl_codes, "exclusion requires ALL ROWS PER MATCH"

    # Batch face: ONE hash shuffle on the key, keys laid out
    # contiguously and (ts, eid)-sorted inside each partition, then a
    # mapInPandas pass that runs the kernel once per key run.  This
    # replaced groupBy().applyInPandas (round 11): per-GROUP pandas
    # dispatch (frame build + per-group sort + per-group output frame)
    # measured ~6 ms/group — 7,487 (user, week) groups cost 44 CPU-s
    # of pure overhead in cep_sql_run_agg_multikey; iterating key runs
    # inside Arrow batches pays that once per BATCH instead.  Same
    # exchange count (the groupBy shuffled identically), same kernel,
    # same per-key record order — outputs are row-for-row identical.
    n_key = len(key_out)

    def fn_map(pdfs: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        pend_key: tuple | None = None
        pend_rows: list = []
        out_keys: list = []  # one key tuple per emission record
        out_recs: list = []

        def flush():
            if pend_key is None or not pend_rows:
                return
            # wm = +inf: batch sees the whole key run, so every open
            # run force-closes at key end (same sentinel as cep_run_agg)
            _, out = advance_kleene_agg(
                None, pend_rows, 1 << 62, bind, within_us,
                confirm=confirm, min_n=min_n, max_n=max_n, corr=corr_fn,
                emit_rows=all_rows, combine=combine,
            )
            if want_mn:
                assign_match_numbers(out, all_rows, 0)
            if all_rows:
                out = filter_excluded_rows(out, excl_codes)
            if out:
                out_keys.extend([pend_key] * len(out))
                out_recs.extend(out)

        def emit() -> "pd.DataFrame":
            # key values are the exact objects pandas delivered
            # (int / datetime.date / str) — Arrow casts them back to
            # the input key dtypes; kernel columns via the shared
            # row->column mapping both faces use
            data = {
                c: [kt[i] for kt in out_keys]
                for i, c in enumerate(key_out)
            }
            data.update(
                kleene_agg_out_columns(
                    out_recs, out_spec, emit_rows=all_rows,
                    cls_names=cls_names,
                )
            )
            return pd.DataFrame(data, columns=names)

        for pdf in pdfs:
            n_rows = len(pdf)
            if not n_rows:
                continue
            ts_l = (
                pdf["ts"].astype("datetime64[us]").astype("int64").tolist()
            )
            eid_l = pdf["eid"].tolist()
            ia_l = pdf["__is_a"].tolist()
            ic_l = pdf["__is_c"].tolist()
            v_l = pdf["__v"].tolist()
            cf_l = (
                pdf["__is_conf"].tolist()
                if "__is_conf" in pdf.columns
                else [False] * n_rows
            )
            if corr_fn is not None:
                bx_l = [
                    None if pd.isna(x) else bx_conv(x)
                    for x in pdf["__bx"].tolist()
                ]
                ay_l = [
                    None if pd.isna(x) else ay_conv(x)
                    for x in pdf["__ay"].tolist()
                ]
            else:
                bx_l = ay_l = [None] * n_rows
            key_l = list(zip(*[pdf[c].tolist() for c in key_out]))
            for i in range(n_rows):
                k = key_l[i]
                if k != pend_key:
                    flush()
                    pend_key, pend_rows = k, []
                pend_rows.append(
                    [
                        ts_l[i],
                        int(eid_l[i]),
                        bool(ia_l[i]),
                        bool(ic_l[i]),
                        None if pd.isna(v_l[i]) else conv(v_l[i]),
                        bool(cf_l[i]),
                        bx_l[i],
                        ay_l[i],
                    ]
                )
            if out_recs:
                yield emit()
                out_keys, out_recs = [], []
        flush()
        if out_recs:
            yield emit()

    return (
        prepared.repartition(*[F.col(c) for c in key_out])
        .sortWithinPartitions(*key_out, "ts", "eid")
        .mapInPandas(fn_map, out_schema)
    )


_RA_BOUNDS_TOKEN = re.compile(
    r"^([A-Za-z_]\w*)\{\s*(\d+)\s*(?:(,)\s*(\d+)?\s*)?\}$"
)


def _rewrite_run_agg_bounds(text: str):
    """Detect a {n} / {n,m} / {n,} quantifier on a step whose DEFINE
    entry carries a running-aggregate conjunct — PATTERN
    (A -> B{2,4}) with DEFINE B AS ... SUM(B.cents) <= k — and
    rewrite the step to its B+ spelling, returning (new_text, min_n,
    max_n) for _compile_run_agg (max_n None = unbounded).  Returns
    None when the pattern has no such step, so plain quantifiers keep
    the variant-expansion path and a quantified CORRELATED step keeps
    its pointed rejection.  Bounds semantics live in
    advance_kleene_agg: min gates every emission, max saturates B
    (greedy completion in the 2-step shape, noise-while-awaiting-C in
    the confirm shape).

    The rewrite is purely syntactic (same clause text, one token
    swapped), so every other run-agg validation — step shape, SKIP
    policy, MEASURES forms — runs on the rewritten text unchanged."""
    masked = _mask_literals(text)
    pm = re.search(r"PATTERN\s*\(([^()]*)\)", masked, re.I)
    if pm is None:
        # parenthesized sub-groups (PERMUTE, alternation) or a missing
        # PATTERN clause: not the run-agg shape — let the normal
        # paths handle (and reject) it
        return None
    body = text[pm.start(1) : pm.end(1)]
    toks = [t for t in re.split(_CONNECTOR_SPLIT + r"|\s+", body) if t]
    hits = [
        (i, m)
        for i, t in enumerate(toks)
        if (m := _RA_BOUNDS_TOKEN.match(t)) is not None
    ]
    if not hits:
        return None
    try:
        clauses = _split_clauses(text)
        defines: dict[str, str] = {}
        for item in _split_top_level_commas(clauses.get("DEFINE", "")):
            dm = re.match(
                r"^([A-Za-z_]\w*)\s+AS\s+(.+)$", item, re.I | re.S
            )
            if dm:
                defines[dm.group(1)] = dm.group(2).strip()
    except ValueError:
        return None

    def is_agg(name: str) -> bool:
        expr = defines.get(name)
        if expr is None:
            return False
        try:
            _pred, where, navs = _split_define(expr, set(defines))
        except ValueError:
            return False
        if navs or not where:
            return False
        conjs = [
            c[1:-1] if c.startswith("(") and c.endswith(")") else c
            for c in _split_top_level_and(where)
        ]
        try:
            return any(
                _parse_run_agg_conjunct(c, name) is not None for c in conjs
            )
        except ValueError:
            # aggregate-SHAPED but malformed: route through the
            # run-agg parse so its pointed error fires
            return True

    agg_hits = [(i, m) for i, m in hits if is_agg(m.group(1))]
    if not agg_hits:
        return None
    if len(agg_hits) > 1:
        raise ValueError(
            "at most one quantified running-aggregate step per "
            "pattern (one accumulator per run)"
        )
    i, m = agg_hits[0]
    name, lo_s, comma, hi_s = m.groups()
    min_n = int(lo_s)
    max_n = None if comma and hi_s is None else int(hi_s or lo_s)
    if min_n < 1:
        raise ValueError(
            f"step {name}: a running-aggregate quantifier needs "
            "min >= 1 ({0,m} would allow an empty run — an anchor "
            "with no bound rows is not a match)"
        )
    if max_n is not None and max_n < min_n:
        raise ValueError(
            f"step {name}: quantifier bounds must satisfy min <= max "
            f"(got {{{min_n},{max_n}}})"
        )
    toks[i] = f"{name}+"
    new_body = " ".join(toks)
    new_text = text[: pm.start(1)] + new_body + text[pm.end(1) :]
    return new_text, min_n, max_n


def _unpivot_all_rows(out: DataFrame, parsed: ParsedPatternQuery) -> DataFrame:
    """Shared batch/streaming ALL ROWS PER MATCH tail: unpivot each
    match to one row per bound event (plus universal-aggregate measure
    columns when declared), then apply {- step -} exclusion and the
    CLASSIFIER() rename. Exclusion filters AFTER the unpivot, so
    RUNNING values on kept rows still count excluded rows (standard:
    exclusion affects output rows only, not aggregation)."""
    from spark_cep_spark.operators.cep import (
        rows_per_match,
        rows_per_match_measures,
    )

    steps = [
        s.name for s in parsed.pattern.steps if s.contiguity != "absent"
    ]
    carry = (
        (parsed.match_number_alias,) if parsed.match_number_alias else ()
    )
    if parsed.universal_measures:
        out = rows_per_match_measures(
            out, steps, list(parsed.universal_measures), carry=carry
        )
    else:
        out = rows_per_match(out, steps, carry=carry)
    if parsed.excluded:
        out = out.filter(~F.col("step").isin(*parsed.excluded))
    if parsed.classifier_alias:
        out = out.withColumnRenamed("step", parsed.classifier_alias)
    return out


def _fold_universal_one_row(
    out: DataFrame, parsed: ParsedPatternQuery
) -> DataFrame:
    """ONE ROW PER MATCH face of the universal-set aggregate MEASURES:
    the single output row is the match's LAST row, where RUNNING ==
    FINAL, so every spec folds to the whole-match value — computed
    from the hidden __arm_ carries (then dropped) with the SAME
    left-fold arithmetic as the ALL-ROWS face, so the two modes and
    both engines agree bit-for-bit."""
    from spark_cep_spark.operators.cep import universal_run_exprs

    steps = [
        s.name for s in parsed.pattern.steps if s.contiguity != "absent"
    ]
    for alias, run in universal_run_exprs(
        steps, list(parsed.universal_measures)
    ):
        out = out.withColumn(alias, run[-1])
    return out.drop(*[c for c in out.columns if c.startswith("__arm_")])


def match_recognize(df: DataFrame, text: str, **stream_kwargs) -> DataFrame:
    """Run a SQL-text CEP query against a batch OR streaming DataFrame.

    Batch → Pattern.compile_batch (oracle-checkable plan); streaming →
    the NFA via compile_stream (stream_kwargs: watermark=...). One text,
    both engines — the continuous-query promise of the reference [PK].

    A trailing `PERMUTE(A, B)` group (standard MATCH_RECOGNIZE) is
    supported by expansion: every ordering compiles to its own Pattern
    plan. Batch: the branches union and per match anchor the
    earliest-COMPLETING ordering wins (ties prefer declaration order —
    first-match-in-alternation semantics), emitted as `permute_order`.
    Streaming: the orderings run as parallel NFAs in ONE keyed state
    (compile_stream_variants, mode='earliest') — a completed ordering
    can never be beaten by a still-open one (future events sit past
    the watermark), so the winner emits immediately.

    `?`/`{n,m}` quantifiers likewise run on BOTH engines: batch via
    the variant union + greedy winner groupBy, streaming via
    compile_stream_variants (mode='preference') — a lower-preference
    completion is held only while a higher-preference variant still
    has a live partial for the same anchor, so greedy/reluctant
    semantics match the batch compiler exactly (property-tested).
    """
    # a {n}/{n,m}/{n,} quantifier on a DEFINE-aggregate step routes to
    # the run-agg kernel with bounds BEFORE variant expansion sees the
    # brace (expansion would try B{m}|...|B{n} variants, whose braced
    # steps reject aggregate DEFINEs) — plain quantified steps fall
    # through to the expansion machinery unchanged
    rab = _rewrite_run_agg_bounds(text)
    if rab is not None:
        text, ra_min, ra_max = rab
        parsed = parse_pattern_sql(text)
        assert parsed.run_agg is not None
        return _compile_run_agg(
            df, parsed, min_n=ra_min, max_n=ra_max, **stream_kwargs
        )
    # ^ / $ anchors bypass the expansion detectors entirely (their
    # tokenizers do not know the anchor markers); anchor+expansion
    # combinations are rejected here by a syntax scan
    _pb = _mask_literals(_split_clauses(text).get("PATTERN", "").strip())
    _has_anchor = _pb.startswith("(") and _pb.endswith(")") and (
        _pb[1:-1].strip().startswith("^") or _pb[1:-1].strip().endswith("$")
    )
    if _has_anchor:
        inner = _pb[1:-1].strip().lstrip("^").rstrip("$")
        if re.search(r"\?|\{\s*\d|\||\(", inner) or re.search(
            r"\bPERMUTE\b", inner, re.I
        ):
            raise ValueError(
                "^ / $ anchors are not supported with "
                "quantifier/group/PERMUTE expansion"
            )
    grp = expand_group_sql(text) if not _has_anchor else None
    if grp is not None or (
        not _has_anchor
        and (
            expand_permute_sql(text) is not None
            or expand_quantifier_sql(text) is not None
        )
    ):
        cl = _split_clauses(text)
        if "AFTER MATCH" in cl:
            raise ValueError(
                "AFTER MATCH skip policies are not supported with "
                "quantifier/group/PERMUTE expansion (the policy would "
                "have to run across variants)"
            )
        if _NAV_RE.search(_mask_literals(text)):
            raise ValueError(
                "PREV/NEXT navigation is not supported with "
                "quantifier/group/PERMUTE expansion (each variant "
                "would navigate a different row sequence)"
            )
        if re.search(r"[\^$]", _mask_literals(cl.get("PATTERN", ""))):
            raise ValueError(
                "^ / $ anchors are not supported with "
                "quantifier/group/PERMUTE expansion"
            )
        if "," in cl.get("PARTITION BY", ""):
            raise ValueError(
                "a multi-column PARTITION BY is not supported with "
                "quantifier/group/PERMUTE expansion"
            )
        if "ALL ROWS PER MATCH" in cl:
            raise ValueError(
                "ALL ROWS PER MATCH is not supported with "
                "quantifier/group/PERMUTE expansion (variants bind "
                "different step sets, so there is no single per-row "
                "schema)"
            )
        if re.search(
            r"\b(?:CLASSIFIER|MATCH_NUMBER)\s*\(",
            _mask_literals(text),
            re.I,
        ):
            raise ValueError(
                "CLASSIFIER()/MATCH_NUMBER() are not supported with "
                "quantifier/group/PERMUTE expansion (each variant "
                "would number its matches independently)"
            )
        if re.search(
            r"\b(?:SUM|COUNT|AVG|MIN|MAX)\s*\(\s*(?:\*|[A-Za-z_]\w*)\s*\)",
            _mask_literals(cl.get("MEASURES", "")),
            re.I,
        ):
            raise ValueError(
                "universal-set aggregate MEASURES (SUM/COUNT/AVG over "
                "an unqualified column) are not supported with "
                "quantifier/group/PERMUTE expansion (variants bind "
                "different step sets, so the per-row fold has no "
                "single spelling)"
            )
    if grp is not None:
        if len(grp) == 1:
            # exact {n}: one flat chain — recurse so any remaining
            # step quantifiers / PERMUTE in the flattened text keep
            # their normal handling
            return match_recognize(df, grp[0][1], **stream_kwargs)
        if any(
            expand_quantifier_sql(v) is not None
            or expand_permute_sql(v) is not None
            for _, v in grp
        ):
            raise ValueError(
                "a {n,m} group cannot be combined with step "
                "quantifiers or PERMUTE in the same pattern"
            )
        if df.isStreaming:
            return _compile_variants_stream(
                df, grp, mode="preference", label_col="variant",
                **stream_kwargs,
            )
        return _compile_quantifier_batch(df, grp)
    expanded = expand_permute_sql(text)
    if expanded is not None:
        if df.isStreaming:
            return _compile_variants_stream(
                df,
                [("->".join(perm), vtext) for perm, vtext in expanded],
                mode="earliest",
                label_col="permute_order",
                **stream_kwargs,
            )
        return _compile_permute_batch(df, expanded)
    quant = expand_quantifier_sql(text)
    if quant is not None:
        if df.isStreaming:
            return _compile_variants_stream(
                df, quant, mode="preference", label_col="variant",
                **stream_kwargs,
            )
        return _compile_quantifier_batch(df, quant)
    parsed = parse_pattern_sql(text)
    if parsed.run_agg is not None:
        mn0, mx0 = parsed.run_agg_bounds
        return _compile_run_agg(
            df, parsed, min_n=mn0, max_n=mx0, **stream_kwargs
        )
    if parsed.key_cols:
        # composite key: ONE synthesized struct column carries the
        # whole PARTITION BY tuple through either engine (struct
        # equality in the batch joins, struct grouping key in the
        # stateful operator); the output flattens it back below
        df = df.withColumn("__mr_key", F.struct(*parsed.key_cols))

    def _flatten_key(out: DataFrame) -> DataFrame:
        if not parsed.key_cols:
            return out
        return out.select(
            *[
                F.col(f"key.{c}").alias(f"key_{c}")
                for c in parsed.key_cols
            ],
            *[c for c in out.columns if c != "key"],
        )

    if df.isStreaming:
        if any(d == "next" for d, _c, _k in parsed.nav):
            raise ValueError(
                "NEXT navigation needs row lookahead and is not "
                "supported on streaming input (Flink's MATCH_RECOGNIZE "
                "likewise rejects NEXT); restructure the condition as "
                "PREV on the later step, or run the query in batch mode"
            )
        if parsed.anchor_start or parsed.anchor_end:
            raise ValueError(
                "^ / $ partition anchors are not supported on "
                "streaming input (a stream has no partition end, and "
                "its first row depends on when the query started); "
                "run the query in batch mode"
            )
        from spark_cep_spark.streaming.nfa import compile_stream

        out = compile_stream(
            parsed.pattern,
            df,
            key_col=parsed.key_col,
            time_col=parsed.time_col,
            skip_policy=parsed.skip,
            emit_ids=parsed.all_rows,
            emit_match_number=parsed.match_number_alias is not None,
            **stream_kwargs,
        )
        if parsed.match_number_alias:
            out = out.withColumnRenamed(
                "match_no", parsed.match_number_alias
            )
        if parsed.all_rows:
            out = _unpivot_all_rows(out, parsed)
        elif parsed.universal_measures:
            out = _fold_universal_one_row(out, parsed)
        return _flatten_key(out)
    if parsed.nav:
        # pre-project the lag/lead columns the rewritten predicates
        # reference — one per-key window sort, the same (ts, event_id)
        # order the streaming kernel's buffer uses, so both engines
        # navigate the identical row sequence
        order = [F.col(parsed.time_col)] + (
            # NULL id ties sort as 0 (kernel/oracle convention)
            [F.coalesce(F.col("event_id"), F.lit(0))]
            if "event_id" in df.columns
            else []
        )
        w = W.partitionBy(parsed.key_col).orderBy(*order)
        for d, col, k in parsed.nav:
            fn = F.lag if d == "prev" else F.lead
            df = df.withColumn(
                _nav_out_col(d, col, k), fn(F.col(col), k).over(w)
            )
    if parsed.anchor_start:
        # ^ : pre-project the per-key row number the rewritten anchor
        # predicate references (same (ts, event_id) order as nav)
        order = [F.col(parsed.time_col)] + (
            [F.coalesce(F.col("event_id"), F.lit(0))]
            if "event_id" in df.columns
            else []
        )
        df = df.withColumn(
            "__mr_rn",
            F.row_number().over(
                W.partitionBy(parsed.key_col).orderBy(*order)
            ),
        )
    out = parsed.pattern.compile_batch(
        df,
        key_col=parsed.key_col,
        time_col=parsed.time_col,
        emit_ids=parsed.all_rows,
    )
    if parsed.anchor_end:
        # $ : the final positive step must bind the key's LAST row —
        # a per-key max-timestamp aggregate joined back on the key
        # ((key, ts) is the dialect's row identity; ties broken by the
        # NFA's (ts, event_id) order can only matter when two rows
        # share a timestamp, which the equality then admits both of).
        # Applied BEFORE any skip policy so the selector sees only
        # $-valid matches.
        pos_steps_all = [
            s for s in parsed.pattern.steps if s.contiguity != "absent"
        ]
        last_s = pos_steps_all[-1]
        end_col = (
            f"t_{last_s.name}_last"
            if last_s.contiguity == "kleene"
            else f"t_{last_s.name}"
        )
        last_ts = df.groupBy(
            F.col(parsed.key_col).alias("__ae_key")
        ).agg(F.max(parsed.time_col).alias("__ae_last"))
        out = (
            out.join(last_ts, F.col("__ae_key") == F.col("key"))
            .filter(F.col(end_col) == F.col("__ae_last"))
            .drop("__ae_key", "__ae_last")
        )
    if parsed.skip is not None:
        from spark_cep_spark.operators.cep import (
            select_non_overlapping,
            select_skip_to,
        )

        pos = [
            s for s in parsed.pattern.steps if s.contiguity != "absent"
        ]
        anchor = pos[0].name
        if parsed.skip == "skip_past_last_row":
            last = pos[-1]
            end_col = (
                f"t_{last.name}_last"
                if last.contiguity == "kleene"
                else f"t_{last.name}"
            )
            out = select_non_overlapping(out, f"t_{anchor}", end_col)
        else:
            kind, tgt = parsed.skip
            tstep = next(s for s in pos if s.name == tgt)
            if tstep.contiguity == "kleene":
                resume = (
                    f"t_{tgt}_first"
                    if kind == "skip_to_first"
                    else f"t_{tgt}_last"
                )
            else:
                resume = f"t_{tgt}"
            out = select_skip_to(out, f"t_{anchor}", resume)
    if parsed.match_number_alias:
        # MATCH_NUMBER(): matches numbered 1, 2, ... per key in START
        # order (t_anchor, anchor_id — the streaming kernel's exact
        # release order). A per-key window: its input is the key's
        # MATCHES (already collapsed from events), so the partition is
        # bounded the same way the match output itself is.
        pos0 = next(
            s for s in parsed.pattern.steps if s.contiguity != "absent"
        )
        wmn = W.partitionBy("key").orderBy(
            f"t_{pos0.name}", F.coalesce(F.col("anchor_id"), F.lit(0))
        )
        out = out.withColumn(
            parsed.match_number_alias,
            F.row_number().over(wmn).cast("long"),
        )
    if parsed.all_rows:
        out = _unpivot_all_rows(out, parsed)
    elif parsed.universal_measures:
        out = _fold_universal_one_row(out, parsed)
    return _flatten_key(out)


def match_recognize_all(
    df: DataFrame, rules: list, **stream_kwargs
) -> DataFrame:
    """SQL-text face of the multi-query rule pack
    (operators/cep.match_all_patterns): rules = [(name, sql_text),
    ...] — each text a dialect query, all evaluated over ONE scan
    and, on a stream, ONE keyed state, every rule's matches labeled
    `pattern_name`.  Each rule keeps its own WITHIN bound.

    Round 11: a rule may be a RUNNING-AGGREGATE query (PATTERN
    (A -> B+[ -> C]) with a DEFINE aggregate, {n,m} bounds included)
    — the threshold half of a real funnel+threshold alerting pack.
    Batch: the rule compiles through _compile_run_agg and unions with
    the chain rules (typed-NULL padding; its anchor_id is NULL — the
    kernel's ONE-ROW record carries no anchor event id). Streaming:
    the rule rides the SAME variant multiplexer state as the chains
    (advance_variants kind='kleene_agg') — still one scan, one keyed
    state, one Python call per micro-batch.

    Restrictions (pointed): rules must share PARTITION BY / ORDER BY
    (one shuffle key); no ALL ROWS / MEASURES / nav / anchors / skip
    policies / expansion / anchor-correlation inside a rule — each of
    those shapes its own output schema or state machine, which the
    shared union-schema emission cannot represent. Compose those as
    standalone queries."""

    def _reject(name, what):
        raise ValueError(
            f"rule {name!r}: {what} is not supported inside a "
            "multi-query rule pack (it shapes its own output "
            "schema or state machine) — run it as a "
            "standalone query"
        )

    parsed_rules = []  # (name, parsed, (min_n, max_n) | None)
    for name, text_ in rules:
        rab = _rewrite_run_agg_bounds(text_)
        ra_min, ra_max = 1, None
        if rab is not None:
            text_, ra_min, ra_max = rab
        p = parse_pattern_sql(text_)
        if p.run_agg is not None:
            if rab is None:
                ra_min, ra_max = p.run_agg_bounds
            _a, _b, _spec, _conf, run_measures, corr = p.run_agg
            # no skip rejection here: a running-aggregate rule REQUIRES
            # the explicit SKIP PAST LAST ROW spelling (parser rule) —
            # exactly the kernel's non-overlapping-runs semantics
            for bad, what in (
                (p.all_rows, "ALL ROWS PER MATCH"),
                (run_measures, "MEASURES"),
                (corr, "an anchor-correlation DEFINE"),
                (p.key_cols, "a composite PARTITION BY"),
                (p.match_number_alias or p.classifier_alias,
                 "MATCH_NUMBER()/CLASSIFIER()"),
            ):
                if bad:
                    _reject(name, what)
            parsed_rules.append((name, p, (ra_min, ra_max)))
            continue
        for bad, what in (
            (p.all_rows, "ALL ROWS PER MATCH"),
            (p.pattern.measures, "MEASURES"),
            (p.universal_measures, "MEASURES"),
            (p.nav, "PREV/NEXT navigation"),
            (p.anchor_start or p.anchor_end, "^/$ anchors"),
            (p.skip, "an AFTER MATCH skip policy"),
            (p.key_cols, "a composite PARTITION BY"),
            (p.match_number_alias or p.classifier_alias,
             "MATCH_NUMBER()/CLASSIFIER()"),
        ):
            if bad:
                _reject(name, what)
        parsed_rules.append((name, p, None))
    names = [n for n, _p, _b in parsed_rules]
    if len(set(names)) != len(names):
        raise ValueError("rule names must be unique")
    keys = {p.key_col for _n, p, _b in parsed_rules}
    times = {p.time_col for _n, p, _b in parsed_rules}
    if len(keys) != 1 or len(times) != 1:
        raise ValueError(
            "rules disagree on PARTITION BY / ORDER BY — a rule pack "
            "shares ONE shuffle key"
        )
    key_col, time_col = keys.pop(), times.pop()
    if df.isStreaming:
        from spark_cep_spark.streaming.nfa import compile_stream_variants

        return compile_stream_variants(
            [
                (
                    n,
                    p.pattern
                    if rb is None
                    else _run_agg_pack_spec(df, p, *rb),
                )
                for n, p, rb in parsed_rules
            ],
            df,
            key_col=key_col,
            time_col=time_col,
            mode="all",
            label_col="pattern_name",
            **stream_kwargs,
        )
    from spark_cep_spark.operators.cep import union_label_pack

    return union_label_pack(
        [
            (
                n,
                p.pattern.compile_batch(
                    df, key_col=key_col, time_col=time_col
                )
                if rb is None
                else _compile_run_agg(df, p, min_n=rb[0], max_n=rb[1]),
            )
            for n, p, rb in parsed_rules
        ]
    )


def _compile_variants_stream(
    df: DataFrame, variants, mode: str, label_col: str, **stream_kwargs
) -> DataFrame:
    """Parse each expanded variant text and hand the alternation to
    the NFA's variant runner (one keyed state, winner pick per anchor
    — see compile_stream_variants for the decision semantics)."""
    from spark_cep_spark.streaming.nfa import compile_stream_variants

    parsed = [(desc, parse_pattern_sql(vtext)) for desc, vtext in variants]
    key_cols = {p.key_col for _, p in parsed}
    time_cols = {p.time_col for _, p in parsed}
    if len(key_cols) != 1 or len(time_cols) != 1:
        raise ValueError("variants disagree on PARTITION BY / ORDER BY")
    # MEASURES compose with PERMUTE since round 10 on BOTH engines:
    # batch carries the winner ordering's measure values through the
    # earliest-completion struct (_compile_permute_batch); streaming
    # evaluates each ordering's measure env in its own NFA and the
    # winner emits its values (compile_stream_variants).
    return compile_stream_variants(
        [(desc, p.pattern) for desc, p in parsed],
        df,
        key_col=key_cols.pop(),
        time_col=time_cols.pop(),
        mode=mode,
        label_col=label_col,
        **stream_kwargs,
    )


def _compile_permute_batch(df: DataFrame, expanded) -> DataFrame:
    """Union the n! expanded plans and keep, per anchor, the earliest-
    completing ordering (min over a (t_done, declaration_rank) struct).
    MEASURES (round 10) ride the same struct as trailing fields — the
    winner ordering's values, decided strictly by (t_done, rank), with
    per-ordering values (a measure may reference permuted steps, whose
    bindings differ by ordering) carried, never compared.
    Scale: each branch is the proven per-key join-agg chain; the winner
    pick is one extra groupBy on the shared (key, anchor) columns."""
    from pyspark.sql import functions as F

    perm_names = sorted(expanded[0][0])
    # round 11: steps AFTER the permuted group (`PERMUTE(a,b) ->
    # confirm`) — different orderings may bind DIFFERENT suffix rows,
    # so the suffix t_ columns must ride the winner struct (carried,
    # never grouped on), and the completion time is the FINAL step of
    # the whole pattern, not the ordering's last permuted step
    suffix_names: list[str] = []
    measure_aliases: list[str] = []
    branches = []
    for rk, (perm, vtext) in enumerate(expanded, start=1):
        parsed = parse_pattern_sql(vtext)
        if rk == 1:
            step_names = [s.name for s in parsed.pattern.steps]
            last_perm = max(step_names.index(n) for n in perm)
            suffix_names = step_names[last_perm + 1 :]
            measure_aliases = [a for a, _e in parsed.pattern.measures]
            # Pattern.measure already rejects t_/id_/key/anchor_id
            # collisions; the PERMUTE machinery adds its own columns
            for a in measure_aliases:
                if a == "permute_order" or a.startswith("_"):
                    raise ValueError(
                        f"measure alias {a!r} collides with a PERMUTE "
                        "output/internal column (permute_order and "
                        "_-prefixed names are reserved here)"
                    )
        bdf = parsed.pattern.compile_batch(
            df, key_col=parsed.key_col, time_col=parsed.time_col
        )
        done_name = suffix_names[-1] if suffix_names else perm[-1]
        branches.append(
            bdf.withColumn("_t_done", F.col(f"t_{done_name}")).withColumn(
                "_rk", F.lit(rk)
            )
        )
    allb = branches[0]
    for b in branches[1:]:
        allb = allb.unionByName(b)
    carried_names = perm_names + suffix_names
    carried = {f"t_{n}" for n in carried_names} | set(measure_aliases)
    group_cols = [
        c
        for c in branches[0].columns
        if c not in carried and not c.startswith("_")
    ]
    struct_fields = (
        [
            F.col("_t_done").alias("td"),
            F.col("_rk").alias("rk"),
        ]
        + [F.col(f"t_{n}").alias(f"t_{n}") for n in carried_names]
        + [F.col(a).alias(a) for a in measure_aliases]
    )
    best = allb.groupBy(*group_cols).agg(
        F.min(F.struct(*struct_fields)).alias("_m")
    )
    order_label = F.lit(None).cast("string")
    for rk, (perm, _) in reversed(list(enumerate(expanded, start=1))):
        order_label = F.when(
            F.col("_m.rk") == rk, "->".join(perm)
        ).otherwise(order_label)
    return best.select(
        *group_cols,
        *[F.col(f"_m.t_{n}").alias(f"t_{n}") for n in carried_names],
        *[F.col(f"_m.{a}").alias(a) for a in measure_aliases],
        order_label.alias("permute_order"),
    )


# ---------------------------------------------------------------------------
# Registered query: all three connectors through the text surface


@register(
    "cep_sql_match",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0))
               AS rn
      FROM events
    ),
    s2 AS (  -- strict step: signup whose immediately-next event is high-value
      SELECT a.user_id, a.event_id, a.ts AS t_s, b.ts AS t_h
      FROM e a
      JOIN e b ON b.user_id = a.user_id AND b.rn = a.rn + 1
      WHERE a.event_type = 'signup' AND b.value > 50
        AND b.ts <= a.ts + INTERVAL 12 HOUR
    )
    SELECT s2.user_id AS key, s2.event_id AS anchor_id, s2.t_s, s2.t_h
    FROM s2
    WHERE NOT EXISTS (  -- terminal negation: no error within the bound
      SELECT 1 FROM e x
      WHERE x.event_type = 'error' AND x.user_id = s2.user_id
        AND x.ts > s2.t_h AND x.ts <= s2.t_s + INTERVAL 12 HOUR
    )
    """,
)
def cep_sql_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text CEP exercising strict (=>) and negation (!) connectors:
    signup whose IMMEDIATELY next event has value > 50, with no error
    following within 12h. Compiles through parse_pattern_sql →
    Pattern.compile_batch — the oracle transcribes the same semantics
    as window-rank join + NOT EXISTS."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( s => h -> !x )
        WITHIN 12 HOURS
        DEFINE s AS event_type = 'signup',
               h AS value > 50,
               x AS event_type = 'error'
        PARTITION BY user_id
        ORDER BY ts
        """,
    )


@register(
    "cep_sql_anchor_start",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, coalesce(event_id, 0)) AS rn
      FROM events
    ),
    a AS (SELECT user_id, event_id, ts FROM e
          WHERE rn = 1 AND event_type = 'view'),
    m AS (
      SELECT a.user_id, a.event_id, a.ts AS t_v, min(p.ts) AS t_p
      FROM a JOIN events p
        ON p.user_id = a.user_id AND p.event_type = 'purchase'
       AND p.ts > a.ts AND p.ts <= a.ts + INTERVAL 7 DAY
      GROUP BY a.user_id, a.event_id, a.ts
    )
    SELECT user_id AS key, event_id AS anchor_id, t_v, t_p FROM m
    """,
)
def cep_sql_anchor_start(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ^ partition anchor (round 6e): first-touch attribution —
    users whose VERY FIRST event is a view that converts to a purchase
    within 7 days. ^ rewrites the anchor predicate to AND __mr_rn = 1
    over a per-key row_number pre-projection, so only the key's first
    row can anchor; everything downstream is the ordinary funnel
    plan. Batch-only (pointed streaming error — a stream's "first
    row" depends on query start)."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( ^ v -> p )
        WITHIN 7 DAYS
        DEFINE v AS event_type = 'view',
               p AS event_type = 'purchase'
        PARTITION BY user_id
        ORDER BY ts
        """,
    )


@register(
    "cep_sql_anchor_end",
    oracle="""
    WITH last_row AS (
      SELECT user_id, max(ts) AS t_last FROM events GROUP BY user_id
    ),
    a AS (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'purchase'),
    m AS (
      SELECT a.user_id, a.event_id, a.ts AS t_p, min(x.ts) AS t_x
      FROM a JOIN events x
        ON x.user_id = a.user_id AND x.event_type = 'error'
       AND x.ts > a.ts AND x.ts <= a.ts + INTERVAL 7 DAY
      GROUP BY a.user_id, a.event_id, a.ts
    )
    SELECT m.user_id AS key, m.event_id AS anchor_id, m.t_p, m.t_x
    FROM m JOIN last_row lr
      ON lr.user_id = m.user_id AND m.t_x = lr.t_last
    """,
)
def cep_sql_anchor_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The $ partition anchor (round 6e): churn signature — a purchase
    whose following error is the user's LAST recorded event (the
    history ends on the failure). $ filters the compiled matches to
    those whose final positive binding equals the key's max timestamp
    (one per-key aggregate join, applied before any skip policy).
    Batch-only, like ^."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( p -> x $ )
        WITHIN 7 DAYS
        DEFINE p AS event_type = 'purchase',
               x AS event_type = 'error'
        PARTITION BY user_id
        ORDER BY ts
        """,
    )


@register(
    "cep_sql_skip_last_kleene",
    oracle="""
    WITH RECURSIVE
    e AS (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0)) AS rn
      FROM events
    ),
    m AS (
      SELECT user_id, ts, rn,
             rn - row_number() OVER (PARTITION BY user_id ORDER BY ts, rn) AS isl
      FROM e WHERE event_type = 'click'
    ),
    a AS (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'click' AND value > 50),
    entry AS (
      SELECT a.user_id, a.event_id, a.ts AS t_v, min(m.rn) AS e_rn
      FROM a JOIN m ON m.user_id = a.user_id
                   AND m.ts > a.ts AND m.ts <= a.ts + INTERVAL 24 HOUR
      GROUP BY a.user_id, a.event_id, a.ts
    ),
    matches AS (
      SELECT entry.user_id, entry.event_id, entry.t_v,
             min(m2.ts) AS t_c_first, max(m2.ts) AS t_c_last,
             count(*) AS c_count
      FROM entry
      JOIN m em ON em.user_id = entry.user_id AND em.rn = entry.e_rn
      JOIN m m2 ON m2.user_id = entry.user_id AND m2.isl = em.isl
               AND m2.rn >= entry.e_rn
               AND m2.ts <= entry.t_v + INTERVAL 24 HOUR
      GROUP BY entry.user_id, entry.event_id, entry.t_v
    ),
    numbered AS (
      SELECT user_id, event_id, t_v, t_c_first, t_c_last, c_count,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY t_v, t_c_last, coalesce(event_id, 0)) AS rn
      FROM matches
    ),
    sel AS (
      SELECT user_id, event_id, t_v, t_c_first, t_c_last, c_count,
             rn, true AS kept, t_c_last AS last_resume
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.user_id, n.event_id, n.t_v, n.t_c_first, n.t_c_last,
             n.c_count, n.rn, n.t_v >= s.last_resume AS kept,
             CASE WHEN n.t_v >= s.last_resume THEN n.t_c_last
                  ELSE s.last_resume END AS last_resume
      FROM sel s JOIN numbered n
        ON n.user_id = s.user_id AND n.rn = s.rn + 1
    )
    SELECT user_id AS key, event_id AS anchor_id,
           t_v, t_c_first, t_c_last, c_count
    FROM sel WHERE kept
    """,
)
def cep_sql_skip_last_kleene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dialect's AFTER MATCH SKIP TO LAST targeting a Kleene-plus
    step (round 6d — newly legal): a HIGH-VALUE click followed by its
    maximal consecutive click run, the next kept anchor resuming
    at-or-after the kept RUN's final click. The anchor predicate
    overlaps the run's on purpose — that is the shape where LAST is
    distinct from both FIRST (668 vs 616 kept at sf0.01; FIRST is
    vacuous when every anchor is itself a run candidate) and SKIP
    PAST LAST ROW (469 — exclusive vs LAST's inclusive resume).
    Exercises the full text path — parse, kleene compile, and the
    selector composition that picks t_<step>_last as the resume
    marker for a one_or_more target. The oracle replays islands + the
    inclusive recurrence in a recursive CTE."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( v -> c+ )
        WITHIN 24 HOURS
        DEFINE v AS event_type = 'click' AND value > 50,
               c AS event_type = 'click'
        PARTITION BY user_id
        ORDER BY ts
        AFTER MATCH SKIP TO LAST c
        """,
    )


@register(
    "cep_sql_permute",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
         cp2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_v, min(c.ts) AS t_c
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
           GROUP BY v.user_id, v.event_id, v.ts),
         cp3 AS (
           SELECT cp2.user_id, cp2.event_id, cp2.t_v, cp2.t_c,
                  min(p.ts) AS t_p
           FROM cp2 JOIN p ON p.user_id = cp2.user_id
                          AND p.ts > cp2.t_c
                          AND p.ts <= cp2.t_v + INTERVAL 24 HOUR
           GROUP BY cp2.user_id, cp2.event_id, cp2.t_v, cp2.t_c),
         pc2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_v, min(p.ts) AS t_p
           FROM v JOIN p ON p.user_id = v.user_id
                        AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 24 HOUR
           GROUP BY v.user_id, v.event_id, v.ts),
         pc3 AS (
           SELECT pc2.user_id, pc2.event_id, pc2.t_v, pc2.t_p,
                  min(c.ts) AS t_c
           FROM pc2 JOIN c ON c.user_id = pc2.user_id
                          AND c.ts > pc2.t_p
                          AND c.ts <= pc2.t_v + INTERVAL 24 HOUR
           GROUP BY pc2.user_id, pc2.event_id, pc2.t_v, pc2.t_p),
         branches AS (
           SELECT user_id, event_id, t_v, t_c, t_p, t_p AS t_done, 1 AS rk
           FROM cp3
           UNION ALL
           SELECT user_id, event_id, t_v, t_c, t_p, t_c AS t_done, 2 AS rk
           FROM pc3),
         best AS (
           SELECT user_id, event_id, t_v,
                  min({'td': t_done, 'rk': rk, 'tc': t_c, 'tp': t_p}) AS m
           FROM branches GROUP BY user_id, event_id, t_v)
    SELECT user_id AS key, event_id AS anchor_id, t_v AS t_V,
           m.tc AS t_C, m.tp AS t_P,
           CASE WHEN m.rk = 1 THEN 'C->P' ELSE 'P->C' END AS permute_order
    FROM best
    """,
)
def cep_sql_permute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMUTE through the SQL-text surface — same semantics as
    cep_permute (view anchor, click and purchase in either order
    within 24h) but entering via the MATCH_RECOGNIZE-shaped dialect,
    proving the text layer's expansion path end-to-end."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( V -> PERMUTE(C, P) )
        WITHIN 24 HOURS
        DEFINE V AS event_type = 'view',
               C AS event_type = 'click',
               P AS event_type = 'purchase'
        """,
    )


@register(
    "cep_sql_two_groups",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'view'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts FROM events
               WHERE event_type = 'purchase'),
         s1 AS (
           SELECT a.user_id, a.event_id, a.ts AS t0,
                  (SELECT min(c.ts) FROM c
                   WHERE c.user_id = a.user_id AND c.ts > a.ts
                     AND c.ts <= a.ts + INTERVAL 24 HOUR) AS tc1
           FROM v a),
         s2 AS (
           SELECT *, (SELECT min(v2.ts) FROM v v2
                      WHERE v2.user_id = s1.user_id AND v2.ts > s1.tc1
                        AND v2.ts <= s1.t0 + INTERVAL 24 HOUR) AS tv2
           FROM s1),
         s3 AS (
           SELECT *, (SELECT min(c2.ts) FROM c c2
                      WHERE c2.user_id = s2.user_id AND c2.ts > s2.tv2
                        AND c2.ts <= s2.t0 + INTERVAL 24 HOUR) AS tc2
           FROM s2),
         s4 AS (
           SELECT *,
                  (SELECT min(pp.ts) FROM p pp
                   WHERE pp.user_id = s3.user_id AND pp.ts > s3.tc2
                     AND pp.ts <= s3.t0 + INTERVAL 24 HOUR) AS pa1,
                  (SELECT min(pp.ts) FROM p pp
                   WHERE pp.user_id = s3.user_id AND pp.ts > s3.tc1
                     AND pp.ts <= s3.t0 + INTERVAL 24 HOUR) AS pb1
           FROM s3),
         s5 AS (
           SELECT *,
                  (SELECT min(pp.ts) FROM p pp
                   WHERE pp.user_id = s4.user_id AND pp.ts > s4.pa1
                     AND pp.ts <= s4.t0 + INTERVAL 24 HOUR) AS pa2,
                  (SELECT min(pp.ts) FROM p pp
                   WHERE pp.user_id = s4.user_id AND pp.ts > s4.pb1
                     AND pp.ts <= s4.t0 + INTERVAL 24 HOUR) AS pb2
           FROM s4),
         w AS (
           SELECT *, CASE
             WHEN tv2 IS NOT NULL AND tc2 IS NOT NULL
                  AND pa1 IS NOT NULL AND pa2 IS NOT NULL THEN 1
             WHEN tv2 IS NOT NULL AND tc2 IS NOT NULL
                  AND pa1 IS NOT NULL THEN 2
             WHEN tc1 IS NOT NULL AND pb1 IS NOT NULL
                  AND pb2 IS NOT NULL THEN 3
             WHEN tc1 IS NOT NULL AND pb1 IS NOT NULL THEN 4 END AS rk
           FROM s5)
    SELECT user_id AS key, event_id AS anchor_id,
           t0 AS t_V_r1, tc1 AS t_C_r1,
           CASE WHEN rk IN (1, 2) THEN tv2 END AS t_V_r2,
           CASE WHEN rk IN (1, 2) THEN tc2 END AS t_C_r2,
           CASE WHEN rk IN (1, 2) THEN pa1 ELSE pb1 END AS t_P_r1,
           CASE WHEN rk = 1 THEN pa2 WHEN rk = 3 THEN pb2 END AS t_P_r2,
           CASE rk WHEN 1 THEN 'V_r1->C_r1->V_r2->C_r2->P_r1->P_r2'
                   WHEN 2 THEN 'V_r1->C_r1->V_r2->C_r2->P_r1'
                   WHEN 3 THEN 'V_r1->C_r1->P_r1->P_r2'
                   ELSE 'V_r1->C_r1->P_r1' END AS variant
    FROM w WHERE rk IS NOT NULL
    """,
)
def cep_sql_two_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO quantified groups in one pattern — PATTERN
    ( (V -> C){1,2} -> (P){1,2} ) (round-10 verdict item 3c;
    previously 'only one quantified group is supported'): the groups'
    arity ranges expand to their CROSS PRODUCT of flat chains in
    leftmost-greedy preference order (the leading group's arity
    dominates — regex greedy-quantifier semantics), riding the SAME
    variant winner-pick machinery as single groups on both engines
    (union + preference struct-min batch, the variant NFA runner
    streaming). The oracle replays each variant as a correlated
    min-chain and picks the first complete variant per anchor."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( (V -> C){1,2} -> (P){1,2} )
        WITHIN 24 HOURS
        DEFINE V AS event_type = 'view',
               C AS event_type = 'click',
               P AS event_type = 'purchase'
        """,
    )


@register(
    "cep_sql_permute_measures",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts, value FROM events
               WHERE event_type = 'view'),
         c AS (SELECT user_id, event_id, ts, value FROM events
               WHERE event_type = 'click'),
         p AS (SELECT user_id, event_id, ts, value FROM events
               WHERE event_type = 'purchase'),
         cp2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_v, v.value AS v_v,
                  min({'ts': c.ts, 'id0': coalesce(c.event_id, 0), 'id': c.event_id, 'val': c.value}) AS mc
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
           GROUP BY v.user_id, v.event_id, v.ts, v.value),
         cp3 AS (
           SELECT cp2.user_id, cp2.event_id, cp2.t_v, cp2.v_v, cp2.mc,
                  min({'ts': p.ts, 'id0': coalesce(p.event_id, 0), 'id': p.event_id, 'val': p.value}) AS mp
           FROM cp2 JOIN p ON p.user_id = cp2.user_id
                          AND p.ts > cp2.mc.ts
                          AND p.ts <= cp2.t_v + INTERVAL 24 HOUR
           GROUP BY cp2.user_id, cp2.event_id, cp2.t_v, cp2.v_v, cp2.mc),
         pc2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_v, v.value AS v_v,
                  min({'ts': p.ts, 'id0': coalesce(p.event_id, 0), 'id': p.event_id, 'val': p.value}) AS mp
           FROM v JOIN p ON p.user_id = v.user_id
                        AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 24 HOUR
           GROUP BY v.user_id, v.event_id, v.ts, v.value),
         pc3 AS (
           SELECT pc2.user_id, pc2.event_id, pc2.t_v, pc2.v_v, pc2.mp,
                  min({'ts': c.ts, 'id0': coalesce(c.event_id, 0), 'id': c.event_id, 'val': c.value}) AS mc
           FROM pc2 JOIN c ON c.user_id = pc2.user_id
                          AND c.ts > pc2.mp.ts
                          AND c.ts <= pc2.t_v + INTERVAL 24 HOUR
           GROUP BY pc2.user_id, pc2.event_id, pc2.t_v, pc2.v_v, pc2.mp),
         branches AS (
           SELECT user_id, event_id, t_v, v_v, mc.ts AS t_c, mp.ts AS t_p,
                  mc.val AS c_val, mp.val AS p_val, mp.ts AS t_done, 1 AS rk
           FROM cp3
           UNION ALL
           SELECT user_id, event_id, t_v, v_v, mc.ts, mp.ts,
                  mc.val, mp.val, mc.ts AS t_done, 2 AS rk
           FROM pc3),
         best AS (
           SELECT user_id, event_id, t_v, v_v,
                  min({'td': t_done, 'rk': rk, 'tc': t_c, 'tp': t_p, 'cv': c_val, 'pv': p_val}) AS m
           FROM branches GROUP BY user_id, event_id, t_v, v_v)
    SELECT user_id AS key, event_id AS anchor_id, t_v AS t_V,
           m.tc AS t_C, m.tp AS t_P,
           m.pv - v_v AS uplift, m.cv AS click_val,
           CASE WHEN m.rk = 1 THEN 'C->P' ELSE 'P->C' END AS permute_order
    FROM best
    """,
)
def cep_sql_permute_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURES composed with PERMUTE (round-10 verdict item 3b;
    previously a pointed error on both engines): the winner ordering's
    bound values feed the measures — here the purchase-vs-view uplift
    and the click's value, with click/purchase bindable in EITHER
    order within 24h.  Batch: each ordering compiles and computes its
    own measure columns; the earliest-completion struct-min carries
    the winner's values as trailing fields (decided strictly by
    (t_done, rank) — values never influence the pick).  Streaming:
    each ordering's NFA evaluates its own measure env and the winner
    emits (compile_stream_variants mode='earliest').  The oracle
    mirrors with value-carrying struct-min bindings per ordering (the
    cep_measures_running convention) and the same winner struct."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( V -> PERMUTE(C, P) )
        WITHIN 24 HOURS
        DEFINE V AS event_type = 'view',
               C AS event_type = 'click',
               P AS event_type = 'purchase'
        MEASURES P.value - V.value AS uplift, C.value AS click_val
        """,
    )


@register(
    "cep_sql_optional",
    oracle="""
    WITH s AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'signup'),
         e AS (SELECT user_id, ts FROM events WHERE event_type = 'error'),
         p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
         b1a AS (
           SELECT s.user_id, s.event_id, s.ts AS t_signup, min(e.ts) AS t_error
           FROM s JOIN e ON e.user_id = s.user_id
                        AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL 24 HOUR
           GROUP BY s.user_id, s.event_id, s.ts),
         b1 AS (
           SELECT b1a.user_id, b1a.event_id, b1a.t_signup, b1a.t_error,
                  min(p.ts) AS t_purchase
           FROM b1a JOIN p ON p.user_id = b1a.user_id
                          AND p.ts > b1a.t_error
                          AND p.ts <= b1a.t_signup + INTERVAL 24 HOUR
           GROUP BY b1a.user_id, b1a.event_id, b1a.t_signup, b1a.t_error),
         b2 AS (
           SELECT s.user_id, s.event_id, s.ts AS t_signup, min(p.ts) AS t_purchase
           FROM s JOIN p ON p.user_id = s.user_id
                        AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 24 HOUR
           GROUP BY s.user_id, s.event_id, s.ts)
    SELECT user_id AS key, event_id AS anchor_id,
           t_signup, t_error, t_purchase,
           'signup->error->purchase' AS variant
    FROM b1
    UNION ALL
    SELECT b2.user_id AS key, b2.event_id AS anchor_id, b2.t_signup,
           CAST(NULL AS TIMESTAMP) AS t_error, b2.t_purchase,
           'signup->purchase' AS variant
    FROM b2
    WHERE NOT EXISTS (SELECT 1 FROM b1
                      WHERE b1.user_id = b2.user_id
                        AND b1.event_id = b2.event_id)
    """,
)
def cep_sql_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optional step through the SQL-text surface — same semantics as
    cep_optional (signup → error? → purchase, greedy: the with-error
    variant wins whenever it matches) but entering via the dialect's
    `E?` token, proving the quantifier-expansion path end-to-end. The
    winning variant's connector-joined spelling is emitted as
    `variant`."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( signup -> error? -> purchase )
        WITHIN 24 HOURS
        DEFINE signup AS event_type = 'signup',
               error AS event_type = 'error',
               purchase AS event_type = 'purchase'
        """,
    )


@register(
    "cep_optional_measures",
    oracle="""
    WITH s AS (SELECT user_id, event_id, ts, value FROM events
               WHERE event_type = 'signup'),
         e AS (SELECT user_id, event_id, ts, value FROM events
               WHERE event_type = 'error'),
         p AS (SELECT user_id, event_id, ts, value FROM events
               WHERE event_type = 'purchase'),
         b1a AS (
           SELECT s.user_id, s.event_id, s.ts AS t_signup,
                  s.value AS v_s,
                  min({'ts': e.ts, 'id0': coalesce(e.event_id, 0), 'id': e.event_id, 'v': e.value}) AS me
           FROM s JOIN e ON e.user_id = s.user_id
                        AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL 24 HOUR
           GROUP BY s.user_id, s.event_id, s.ts, s.value),
         b1 AS (
           SELECT b1a.user_id, b1a.event_id, b1a.t_signup, b1a.v_s,
                  b1a.me, min({'ts': p.ts, 'id0': coalesce(p.event_id, 0), 'id': p.event_id,
                               'v': p.value}) AS mp
           FROM b1a JOIN p ON p.user_id = b1a.user_id
                          AND p.ts > b1a.me.ts
                          AND p.ts <= b1a.t_signup + INTERVAL 24 HOUR
           GROUP BY b1a.user_id, b1a.event_id, b1a.t_signup, b1a.v_s,
                    b1a.me),
         b2 AS (
           SELECT s.user_id, s.event_id, s.ts AS t_signup,
                  s.value AS v_s,
                  min({'ts': p.ts, 'id0': coalesce(p.event_id, 0), 'id': p.event_id, 'v': p.value}) AS mp
           FROM s JOIN p ON p.user_id = s.user_id
                        AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 24 HOUR
           GROUP BY s.user_id, s.event_id, s.ts, s.value)
    SELECT user_id AS key, event_id AS anchor_id, t_signup,
           me.ts AS t_error, mp.ts AS t_purchase,
           mp.v - v_s AS uplift, me.v AS err_val,
           'signup->error->purchase' AS variant
    FROM b1
    UNION ALL
    SELECT b2.user_id AS key, b2.event_id AS anchor_id, b2.t_signup,
           CAST(NULL AS TIMESTAMP) AS t_error, b2.mp.ts AS t_purchase,
           b2.mp.v - b2.v_s AS uplift, CAST(NULL AS DOUBLE) AS err_val,
           'signup->purchase' AS variant
    FROM b2
    WHERE NOT EXISTS (SELECT 1 FROM b1
                      WHERE b1.user_id = b2.user_id
                        AND b1.event_id = b2.event_id)
    """,
)
def cep_optional_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURES lifted through the quantifier expansion (round-4
    verdict item 6): the optional-step funnel additionally emits
    uplift (purchase minus signup value) in BOTH variants and the
    bound error's value — NULL when the greedy pick skipped B. Each
    measure item travels into exactly the variants binding every step
    it references; the union pads the rest with typed NULLs, and the
    greedy winner groupBy carries the measure columns inside its
    min-struct. Values bind via the deterministic (ts, event_id)
    struct-min, mirrored by the oracle's named-struct mins."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( signup -> error? -> purchase )
        WITHIN 24 HOURS
        MEASURES purchase.value - signup.value AS uplift,
                 error.value AS err_val
        DEFINE signup AS event_type = 'signup',
               error AS event_type = 'error',
               purchase AS event_type = 'purchase'
        """,
    )


@register(
    "cep_group_times",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'view'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         s2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t1, min(c.ts) AS t2
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 6 HOUR
           GROUP BY v.user_id, v.event_id, v.ts),
         s3 AS (
           SELECT s2.*, min(v2.ts) AS t3
           FROM s2 JOIN v v2 ON v2.user_id = s2.user_id
                            AND v2.ts > s2.t2
                            AND v2.ts <= s2.t1 + INTERVAL 6 HOUR
           GROUP BY ALL),
         s4 AS (
           SELECT s3.*, min(c2.ts) AS t4
           FROM s3 JOIN c c2 ON c2.user_id = s3.user_id
                            AND c2.ts > s3.t3
                            AND c2.ts <= s3.t1 + INTERVAL 6 HOUR
           GROUP BY ALL)
    SELECT user_id AS key, event_id AS anchor_id,
           t1 AS t_view_r1, t2 AS t_click_r1,
           t3 AS t_view_r2, t4 AS t_click_r2,
           'view_r1->click_r1->view_r2->click_r2' AS variant
    FROM s4
    UNION ALL
    SELECT s2.user_id AS key, s2.event_id AS anchor_id,
           s2.t1, s2.t2,
           CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
           'view_r1->click_r1' AS variant
    FROM s2
    WHERE NOT EXISTS (SELECT 1 FROM s4
                      WHERE s4.user_id = s2.user_id
                        AND s4.event_id = s2.event_id)
    """,
)
def cep_group_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified GROUP repetition through the SQL-text surface
    (MATCH_RECOGNIZE sub-pattern quantification, round 5): the
    view-click PAIR once or twice — `(view -> click){1,2}` — greedy,
    so the two-repeat chain wins whenever it completes and the
    one-repeat fallback pads the second repeat's columns with NULLs.
    Expansion flattens each arity into a plain step chain
    (`view_r1 -> click_r1 -> ...`) riding the proven per-key join-agg
    plan; the winner pick is the same (key, anchor) preference
    groupBy as step quantifiers, and the STREAMING face rides the
    variant NFA runner unchanged."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( (view -> click){1,2} )
        WITHIN 6 HOURS
        DEFINE view AS event_type = 'view',
               click AS event_type = 'click'
        """,
    )


@register(
    "cep_sql_reluctant",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0))
               AS rn
      FROM events
    ),
    without_b AS (
      SELECT a.user_id AS key, a.event_id AS anchor_id,
             a.ts AS t_signup, c.ts AS t_purchase
      FROM e a JOIN e c ON c.user_id = a.user_id AND c.rn = a.rn + 1
      WHERE a.event_type = 'signup' AND c.event_type = 'purchase'
        AND c.ts <= a.ts + INTERVAL 6 HOUR
    ),
    with_b AS (
      SELECT a.user_id AS key, a.event_id AS anchor_id,
             a.ts AS t_signup, b.ts AS t_click, c.ts AS t_purchase
      FROM e a
      JOIN e b ON b.user_id = a.user_id AND b.rn = a.rn + 1
      JOIN e c ON c.user_id = a.user_id AND c.rn = a.rn + 2
      WHERE a.event_type = 'signup' AND b.event_type = 'click'
        AND c.event_type = 'purchase'
        AND b.ts <= a.ts + INTERVAL 6 HOUR
        AND c.ts <= a.ts + INTERVAL 6 HOUR
    )
    SELECT key, anchor_id, t_signup, t_purchase,
           CAST(NULL AS TIMESTAMP) AS t_click,
           'signup=>purchase' AS variant
    FROM without_b
    UNION ALL
    SELECT w.key, w.anchor_id, w.t_signup, w.t_purchase, w.t_click,
           'signup=>click=>purchase' AS variant
    FROM with_b w
    WHERE NOT EXISTS (SELECT 1 FROM without_b o
                      WHERE o.key = w.key AND o.anchor_id = w.anchor_id)
    """,
)
def cep_sql_reluctant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reluctant optional through the SQL-text surface: the `B??`
    token under strict (`=>`) connectors — same semantics as
    cep_reluctant_optional (prefer skipping the optional; see that
    docstring for why relaxed-contiguity reluctant collapses), entering
    via the dialect so the flipped expansion order and the
    union-schema padding are proven end-to-end. `{n,m}?` (ascending-
    arity reluctant ranges) rides the same expansion path."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( signup => click?? => purchase )
        WITHIN 6 HOURS
        DEFINE signup AS event_type = 'signup',
               click AS event_type = 'click',
               purchase AS event_type = 'purchase'
        """,
    )


@register(
    "cep_sql_alternation",
    oracle="""
    WITH s AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'signup'),
         e AS (SELECT user_id, ts FROM events WHERE event_type = 'error'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
         b1a AS (
           SELECT s.user_id, s.event_id, s.ts AS t_signup, min(e.ts) AS t_error
           FROM s JOIN e ON e.user_id = s.user_id
                        AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL 24 HOUR
           GROUP BY s.user_id, s.event_id, s.ts),
         b1 AS (
           SELECT b1a.user_id, b1a.event_id, b1a.t_signup, b1a.t_error,
                  min(p.ts) AS t_purchase
           FROM b1a JOIN p ON p.user_id = b1a.user_id
                          AND p.ts > b1a.t_error
                          AND p.ts <= b1a.t_signup + INTERVAL 24 HOUR
           GROUP BY b1a.user_id, b1a.event_id, b1a.t_signup, b1a.t_error),
         b2a AS (
           SELECT s.user_id, s.event_id, s.ts AS t_signup, min(c.ts) AS t_click
           FROM s JOIN c ON c.user_id = s.user_id
                        AND c.ts > s.ts AND c.ts <= s.ts + INTERVAL 24 HOUR
           GROUP BY s.user_id, s.event_id, s.ts),
         b2 AS (
           SELECT b2a.user_id, b2a.event_id, b2a.t_signup, b2a.t_click,
                  min(p.ts) AS t_purchase
           FROM b2a JOIN p ON p.user_id = b2a.user_id
                          AND p.ts > b2a.t_click
                          AND p.ts <= b2a.t_signup + INTERVAL 24 HOUR
           GROUP BY b2a.user_id, b2a.event_id, b2a.t_signup, b2a.t_click)
    SELECT user_id AS key, event_id AS anchor_id, t_signup, t_error,
           CAST(NULL AS TIMESTAMP) AS t_click, t_purchase,
           'signup->error->purchase' AS variant
    FROM b1
    UNION ALL
    SELECT b2.user_id AS key, b2.event_id AS anchor_id, b2.t_signup,
           CAST(NULL AS TIMESTAMP) AS t_error, b2.t_click, b2.t_purchase,
           'signup->click->purchase' AS variant
    FROM b2
    WHERE NOT EXISTS (SELECT 1 FROM b1
                      WHERE b1.user_id = b2.user_id
                        AND b1.event_id = b2.event_id)
    """,
)
def cep_sql_alternation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE alternation through the SQL dialect: `signup ->
    (error | click) -> purchase` — the middle step matches EITHER
    branch, first-declared branch preferred when both complete for the
    same anchor (SQL first-match-in-alternation). The unbound branch's
    timestamp column is NULL; the winning spelling is emitted as
    `variant`. Alternation expands through the SAME variant machinery
    as the quantifiers (round 6: `(A | B)` is just another options
    slot in expand_quantifier_sql, so it composes with `?`/`{n,m}`
    under the shared 16-variant cap and runs on BOTH engines —
    streaming via compile_stream_variants mode='preference').

    100 TB shape: identical to cep_sql_optional — each branch is the
    per-key join-agg chain, the winner pick one anti-join on the
    shared (key, anchor) partitioning."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( signup -> (error | click) -> purchase )
        WITHIN 24 HOURS
        DEFINE signup AS event_type = 'signup',
               error AS event_type = 'error',
               click AS event_type = 'click',
               purchase AS event_type = 'purchase'
        """,
    )


@register(
    "cep_sql_subset",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts, value, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0)) AS rn
      FROM events
    ),
    m AS (
      SELECT user_id, ts, rn, value,
             rn - row_number() OVER (PARTITION BY user_id ORDER BY ts, rn) AS isl
      FROM e WHERE event_type = 'error'
    ),
    a AS (SELECT user_id, event_id, ts, value FROM events
          WHERE event_type = 'signup'),
    entry AS (
      SELECT a.user_id, a.event_id, a.ts AS t_s, a.value AS v_s,
             min(m.rn) AS e_rn
      FROM a JOIN m ON m.user_id = a.user_id
                   AND m.ts > a.ts AND m.ts <= a.ts + INTERVAL 7 DAY
      GROUP BY a.user_id, a.event_id, a.ts, a.value
    )
    SELECT entry.user_id AS key, entry.event_id AS anchor_id, entry.t_s,
           min(m2.ts) AS t_err_first, max(m2.ts) AS t_err_last,
           count(*) AS err_count,
           entry.v_s AS u_first,
           arg_max(m2.value, m2.rn) AS u_last,
           least(entry.v_s, min(m2.value)) AS u_min,
           round(entry.v_s + sum(m2.value), 6) AS u_sum_r
    FROM entry
    JOIN m em ON em.user_id = entry.user_id AND em.rn = entry.e_rn
    JOIN m m2 ON m2.user_id = entry.user_id AND m2.isl = em.isl
             AND m2.rn >= entry.e_rn
             AND m2.ts <= entry.t_s + INTERVAL 7 DAY
    GROUP BY entry.user_id, entry.event_id, entry.t_s, entry.v_s
    """,
)
def cep_sql_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE SUBSET clause (union pattern variables):
    `SUBSET U = (s, err)` makes U a variable spanning the signup AND
    its error run, so MEASURES can aggregate across steps —
    first/last/min/sum(U.value). The expansion happens at parse time
    (each subset aggregate rewrites to member-expressed refs:
    sum(U.value) -> s.value + sum(err.value), min -> least(...)), so
    BOTH engines run only the machinery they already have — no new
    kernel state, and the streaming variant NFAs inherit subsets for
    free. NULL note (documented deviation): the sum expansion
    propagates NULL from any member via engine arithmetic, identical
    across engines, unlike row-skipping SQL-standard sum.

    The sum measure is rounded on both sides (float discipline); the
    oracle transcribes the same gaps-and-islands run arithmetic as
    cep_kleene_measures plus the subset combinations."""
    events = table(spark, sf_dir, "events")
    df = match_recognize(
        events,
        """
        PATTERN ( s -> err+ )
        WITHIN 7 DAYS
        SUBSET U = (s, err)
        DEFINE s AS event_type = 'signup',
               err AS event_type = 'error'
        MEASURES first(U.value) AS u_first,
                 last(U.value) AS u_last,
                 min(U.value) AS u_min,
                 sum(U.value) AS u_sum
        PARTITION BY user_id
        ORDER BY ts
        """,
    )
    return df.withColumn("u_sum_r", F.round("u_sum", 6)).drop("u_sum")


@register(
    "cep_sql_prev",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type, value,
             lag(value) OVER (PARTITION BY user_id
                              ORDER BY ts, coalesce(event_id, 0)) AS pv
      FROM events),
    d AS (SELECT user_id, event_id, ts FROM e
          WHERE event_type = 'click' AND value < pv),
    r AS (SELECT user_id, ts FROM e
          WHERE event_type = 'click' AND value > 1.5 * pv)
    SELECT d.user_id AS key, d.event_id AS anchor_id, d.ts AS t_d,
           min(r.ts) AS t_r
    FROM d JOIN r ON r.user_id = d.user_id
                AND r.ts > d.ts AND r.ts <= d.ts + INTERVAL 2 HOUR
    GROUP BY d.user_id, d.event_id, d.ts
    """,
)
def cep_sql_prev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREV() physical-row navigation in DEFINE (standard
    MATCH_RECOGNIZE: the value of the row k positions before the
    candidate in partition order) — a dip-then-rebound detector: a
    click whose value dropped vs the user's previous row, followed
    within 2h by a click at >1.5x its own previous row. Batch
    pre-projects ONE per-key lag column per nav ref (O(1)-frame
    window, same (ts, event_id) order the streaming kernel's buffer
    uses); the streaming NFA re-evaluates the nav conjunct against a
    bounded per-key nav tail (last k released rows). Both engines run
    the same text — see tests/test_cep_nav.py for the stream==batch
    property."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( d -> r )
        WITHIN 2 HOURS
        DEFINE d AS event_type = 'click' AND value < PREV(value),
               r AS event_type = 'click' AND value > 1.5 * PREV(value)
        PARTITION BY user_id
        ORDER BY ts
        """,
    )


@register(
    "cep_sql_next",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type, value,
             lead(value) OVER (PARTITION BY user_id
                               ORDER BY ts, coalesce(event_id, 0)) AS nv
      FROM events),
    a AS (SELECT user_id, event_id, ts FROM e
          WHERE event_type = 'view' AND value >= 2 * nv),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
    SELECT a.user_id AS key, a.event_id AS anchor_id, a.ts AS t_a,
           min(p.ts) AS t_p
    FROM a JOIN p ON p.user_id = a.user_id
                AND p.ts > a.ts AND p.ts <= a.ts + INTERVAL 6 HOUR
    GROUP BY a.user_id, a.event_id, a.ts
    """,
)
def cep_sql_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEXT() forward navigation in DEFINE: a view whose immediately
    following row (any type) halves the value, followed by a purchase
    within 6h. Batch-only feature by design: NEXT needs row lookahead,
    which a stream cannot provide without holding every event until
    its successor arrives — Flink's MATCH_RECOGNIZE likewise rejects
    NEXT. On streaming input match_recognize raises a pointed
    ValueError (tested); the batch plan is a lead() pre-projection,
    exactly mirroring cep_sql_prev's lag."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( a -> p )
        WITHIN 6 HOURS
        DEFINE a AS event_type = 'view' AND value >= 2 * NEXT(value),
               p AS event_type = 'purchase'
        PARTITION BY user_id
        ORDER BY ts
        """,
    )


@register(
    "cep_sql_multikey",
    oracle="""
    WITH e AS (SELECT user_id, event_type, event_id, ts FROM events
               WHERE value > 80)
    SELECT a.user_id AS key_user_id, a.event_type AS key_event_type,
           a.event_id AS anchor_id, a.ts AS t_a, min(b.ts) AS t_b
    FROM e a JOIN e b ON b.user_id = a.user_id
                     AND b.event_type = a.event_type
                     AND b.ts > a.ts
                     AND b.ts <= a.ts + INTERVAL 12 HOUR
    GROUP BY a.user_id, a.event_type, a.event_id, a.ts
    """,
)
def cep_sql_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite PARTITION BY (standard MATCH_RECOGNIZE allows any
    partition column list): two high-value events of the SAME type
    for the same user within 12h — the (entity, sub-stream) keying
    every multi-tenant monitor needs. One synthesized struct column
    carries the tuple through both engines (struct equality in the
    batch joins, struct grouping key in applyInPandasWithState — the
    NFA's output key field takes the input's type), flattened back to
    key_<col> columns at the end. Not combinable with
    quantifier/group/PERMUTE expansion (pointed error)."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( a -> b )
        WITHIN 12 HOURS
        DEFINE a AS value > 80,
               b AS value > 80
        PARTITION BY user_id, event_type
        ORDER BY ts
        """,
    )


@register(
    "cep_sql_string_key",
    oracle="""
    WITH e AS (SELECT event_type, event_id, ts FROM events
               WHERE value > 95)
    SELECT a.event_type AS key, a.event_id AS anchor_id,
           a.ts AS t_a, min(b.ts) AS t_b
    FROM e a JOIN e b ON b.event_type = a.event_type
                     AND b.ts > a.ts
                     AND b.ts <= a.ts + INTERVAL 1 HOUR
    GROUP BY a.event_type, a.event_id, a.ts
    """,
)
def cep_sql_string_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-numeric partition key: burst detection per EVENT TYPE
    (two >95-value events of one type within an hour, across all
    users) — partitioning a pattern by a categorical column is
    routine in monitoring, and the NFA's key field historically
    assumed long. The dynamic key typing added for composite keys
    makes a plain string PARTITION BY work on both engines; the
    streaming face is pinned in tests/test_cep_nav.py."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( a -> b )
        WITHIN 1 HOURS
        DEFINE a AS value > 95,
               b AS value > 95
        PARTITION BY event_type
        ORDER BY ts
        """,
    )


@register(
    "cep_sql_all_rows",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'view'),
         c AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'click'),
         s2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_v,
                  min({'ts': c.ts, 'id0': coalesce(c.event_id, 0), 'id': c.event_id}) AS mc
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts
                        AND c.ts <= v.ts + INTERVAL 3 HOUR
           GROUP BY v.user_id, v.event_id, v.ts)
    SELECT user_id AS key, event_id AS anchor_id,
           CAST(1 AS BIGINT) AS seq_no, 'v' AS step, t_v AS ts, event_id
    FROM s2
    UNION ALL
    SELECT user_id, event_id, CAST(2 AS BIGINT), 'c', mc.ts, mc.id
    FROM s2
    """,
)
def cep_sql_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ALL ROWS PER MATCH output mode as a DIALECT CLAUSE
    (standard MATCH_RECOGNIZE spelling — previously only the
    rows_per_match helper face): one output row per bound event with
    (seq_no, step, ts, event_id). Compiles as emit_ids + the unpivot
    on BOTH engines; rejected with pointed errors for MEASURES (a
    measure is whole-match — see rows_per_match_running), one_or_more
    steps, and quantifier/PERMUTE expansion."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( v -> c )
        WITHIN 3 HOURS
        DEFINE v AS event_type = 'view',
               c AS event_type = 'click'
        ALL ROWS PER MATCH
        PARTITION BY user_id
        ORDER BY ts
        """,
    )


@register(
    "cep_sql_final_running",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts, value FROM events
               WHERE event_type = 'view'),
         c AS (SELECT user_id, event_id, ts, value FROM events
               WHERE event_type = 'click'),
         p AS (SELECT user_id, event_id, ts, value FROM events
               WHERE event_type = 'purchase'),
         s2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_view,
                  v.value AS v1,
                  min({'ts': c.ts, 'id0': coalesce(c.event_id, 0), 'id': c.event_id, 'val': c.value})
                    AS mc
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 6 HOUR
           GROUP BY v.user_id, v.event_id, v.ts, v.value),
         s3 AS (
           SELECT s2.user_id, s2.event_id, s2.t_view, s2.v1, s2.mc,
                  min({'ts': p.ts, 'id0': coalesce(p.event_id, 0), 'id': p.event_id, 'val': p.value})
                    AS mp
           FROM s2 JOIN p ON p.user_id = s2.user_id
                         AND p.ts > s2.mc.ts
                         AND p.ts <= s2.t_view + INTERVAL 6 HOUR
           GROUP BY s2.user_id, s2.event_id, s2.t_view, s2.v1, s2.mc),
         r AS (
           SELECT user_id, event_id AS anchor_id, t_view, mc, mp,
                  v1, mc.val AS v2, mp.val AS v3,
                  CAST(CASE WHEN v1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS c1,
                  CAST(CASE WHEN v1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
                    + CAST(CASE WHEN mc.val IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS c2,
                  CAST(CASE WHEN v1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
                    + CAST(CASE WHEN mc.val IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
                    + CAST(CASE WHEN mp.val IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS c3,
                  coalesce(v1, 0) AS s1,
                  coalesce(v1, 0) + coalesce(mc.val, 0) AS s2,
                  coalesce(v1, 0) + coalesce(mc.val, 0) + coalesce(mp.val, 0) AS s3
           FROM s3)
    SELECT user_id AS key, anchor_id, CAST(1 AS BIGINT) AS seq_no,
           'v' AS step, t_view AS ts, anchor_id AS event_id,
           CASE WHEN c1 > 0 THEN s1 END AS run_sum,
           CASE WHEN c3 > 0 THEN s3 END AS fin_sum,
           c1 AS n_so_far,
           CAST(3 AS BIGINT) AS n_rows,
           CASE WHEN c1 > 0 THEN s1 / c1 END AS avg_so_far,
           v1 AS min_so_far,
           greatest(greatest(v1, v2), v3) AS max_fin
    FROM r
    UNION ALL
    SELECT user_id, anchor_id, CAST(2 AS BIGINT), 'c', mc.ts, mc.id,
           CASE WHEN c2 > 0 THEN s2 END,
           CASE WHEN c3 > 0 THEN s3 END,
           c2, CAST(3 AS BIGINT),
           CASE WHEN c2 > 0 THEN s2 / c2 END,
           least(v1, v2),
           greatest(greatest(v1, v2), v3)
    FROM r
    UNION ALL
    SELECT user_id, anchor_id, CAST(3 AS BIGINT), 'p', mp.ts, mp.id,
           CASE WHEN c3 > 0 THEN s3 END,
           CASE WHEN c3 > 0 THEN s3 END,
           c3, CAST(3 AS BIGINT),
           CASE WHEN c3 > 0 THEN s3 / c3 END,
           least(least(v1, v2), v3),
           greatest(greatest(v1, v2), v3)
    FROM r
    """,
)
def cep_sql_final_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FINAL/RUNNING MEASURES prefixes on the CLASSIC (non-run-agg)
    ALL ROWS PER MATCH path as SQL TEXT (round 10 — previously only
    the rows_per_match_running helper face / the run-agg kernel):
    universal-set aggregates SUM/COUNT/COUNT(*)/AVG over an
    UNQUALIFIED column range over all bound rows of the match,
    RUNNING (the ALL-ROWS default) as of each output row, FINAL over
    the whole match. Compiles to hidden per-step value carries + the
    rows_per_match_measures unpivot — the prefix arithmetic is a
    left-fold INSIDE the array-of-structs (no window, no extra
    shuffle, streams unchanged); the oracle spells the identical
    coalesce-fold so double sums agree bit-for-bit. SQL NULL
    semantics: SUM/AVG over zero non-NULL values so far is NULL,
    COUNT skips NULLs, COUNT(*) counts bound rows, MIN/MAX fold
    through least()/greatest() (NULL-skipping on both engines)."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( v -> c -> p )
        WITHIN 6 HOURS
        DEFINE v AS event_type = 'view',
               c AS event_type = 'click',
               p AS event_type = 'purchase'
        MEASURES RUNNING SUM(value) AS run_sum,
                 FINAL SUM(value) AS fin_sum,
                 RUNNING COUNT(value) AS n_so_far,
                 FINAL COUNT(*) AS n_rows,
                 RUNNING AVG(value) AS avg_so_far,
                 RUNNING MIN(value) AS min_so_far,
                 FINAL MAX(value) AS max_fin
        ALL ROWS PER MATCH
        PARTITION BY user_id
        ORDER BY ts
        """,
    )


@register(
    "cep_sql_exclusion",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'view'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'purchase'),
         s2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_v, min(c.ts) AS t_c
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts
                        AND c.ts <= v.ts + INTERVAL 24 HOUR
           GROUP BY v.user_id, v.event_id, v.ts),
         s3 AS (
           SELECT s2.user_id, s2.event_id, s2.t_v,
                  min({'ts': p.ts, 'id0': coalesce(p.event_id, 0), 'id': p.event_id}) AS mp
           FROM s2 JOIN p ON p.user_id = s2.user_id
                         AND p.ts > s2.t_c
                         AND p.ts <= s2.t_v + INTERVAL 24 HOUR
           GROUP BY s2.user_id, s2.event_id, s2.t_v)
    SELECT user_id AS key, event_id AS anchor_id,
           CAST(1 AS BIGINT) AS seq_no, 'v' AS step, t_v AS ts, event_id
    FROM s3
    UNION ALL
    SELECT user_id, event_id, CAST(3 AS BIGINT), 'p', mp.ts, mp.id
    FROM s3
    """,
)
def cep_sql_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{- step -} row exclusion (standard MATCH_RECOGNIZE, round 6d):
    the funnel's click step still GATES the match (a view with no
    click never emits) but its rows are omitted from the ALL ROWS PER
    MATCH output — the classic use is hiding bookkeeping steps from
    per-event output. seq_no keeps the step's pattern ordinal (1 and
    3 — the standard's behavior: exclusion removes rows, it does not
    renumber). Compiles as the plain ALL ROWS unpivot plus a
    post-explode filter, so it works identically on the streaming
    engine (the filter composes on the stateful operator's output)."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( v -> {- c -} -> p )
        WITHIN 24 HOURS
        DEFINE v AS event_type = 'view',
               c AS event_type = 'click',
               p AS event_type = 'purchase'
        ALL ROWS PER MATCH
        PARTITION BY user_id
        ORDER BY ts
        """,
    )


@register(
    "cep_sql_match_number",
    oracle="""
    WITH RECURSIVE
    v AS (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'view'),
    p AS (SELECT user_id, ts FROM events
          WHERE event_type = 'purchase'),
    s2 AS (
      SELECT v.user_id, v.event_id, v.ts AS t_v, min(p.ts) AS t_p
      FROM v JOIN p ON p.user_id = v.user_id
                   AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 6 HOUR
      GROUP BY v.user_id, v.event_id, v.ts
    ),
    numbered AS (
      SELECT user_id, event_id, t_v, t_p,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY t_v, t_p, coalesce(event_id, 0)) AS rn
      FROM s2
    ),
    sel AS (
      SELECT user_id, event_id, t_v, t_p, rn,
             true AS kept, t_p AS last_end
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.user_id, n.event_id, n.t_v, n.t_p, n.rn,
             n.t_v > s.last_end AS kept,
             CASE WHEN n.t_v > s.last_end THEN n.t_p
                  ELSE s.last_end END AS last_end
      FROM sel s JOIN numbered n
        ON n.user_id = s.user_id AND n.rn = s.rn + 1
    )
    SELECT user_id AS key, event_id AS anchor_id, t_v, t_p,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY t_v) AS BIGINT) AS match_seq
    FROM sel WHERE kept
    """,
)
def cep_sql_match_number(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_NUMBER() as a MEASURES item (SQL-standard
    MATCH_RECOGNIZE): each kept view→purchase match numbered 1, 2, ...
    per user in start order, under AFTER MATCH SKIP PAST LAST ROW.
    Batch = one per-key row_number over the MATCH output (bounded:
    the window's input is already collapsed to matches); streaming =
    a one-integer-per-key counter over the skip selector's in-order
    releases (compile_stream emit_match_number — see
    advance_match_number for the no-skip holding variant). The oracle
    replays the greedy recurrence, then numbers kept matches the same
    way; kept starts are strictly increasing per key, so the ordering
    is unambiguous."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( v -> p )
        WITHIN 6 HOURS
        DEFINE v AS event_type = 'view',
               p AS event_type = 'purchase'
        MEASURES MATCH_NUMBER() AS match_seq
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    )


@register(
    "cep_sql_classifier",
    oracle="""
    WITH c AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'click'),
         p AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'purchase'),
         s2 AS (
           SELECT c.user_id, c.event_id, c.ts AS t_c,
                  min({'ts': p.ts, 'id0': coalesce(p.event_id, 0), 'id': p.event_id}) AS mp
           FROM c JOIN p ON p.user_id = c.user_id
                        AND p.ts > c.ts
                        AND p.ts <= c.ts + INTERVAL 4 HOUR
           GROUP BY c.user_id, c.event_id, c.ts),
         n AS (
           SELECT user_id, event_id, t_c, mp,
                  CAST(row_number() OVER (PARTITION BY user_id
                                          ORDER BY t_c, coalesce(event_id, 0))
                       AS BIGINT) AS match_seq
           FROM s2)
    SELECT user_id AS key, event_id AS anchor_id, match_seq,
           CAST(1 AS BIGINT) AS seq_no, 'c' AS var_name,
           t_c AS ts, event_id
    FROM n
    UNION ALL
    SELECT user_id, event_id, match_seq, CAST(2 AS BIGINT), 'p',
           mp.ts, mp.id
    FROM n
    """,
)
def cep_sql_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASSIFIER() + MATCH_NUMBER() in ALL ROWS PER MATCH (the
    SQL-standard per-row functions): every bound event of each
    click→purchase match as its own row, labeled with the pattern
    variable it bound (CLASSIFIER → var_name) and its match's
    per-user sequence number (MATCH_NUMBER → match_seq, start order,
    emit-all mode — ties on start broken by anchor id on both
    engines). CLASSIFIER rides the rows_per_match unpivot's step
    column; MATCH_NUMBER is carried match-level through the unpivot
    onto every row of its match."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( c -> p )
        WITHIN 4 HOURS
        DEFINE c AS event_type = 'click',
               p AS event_type = 'purchase'
        MEASURES CLASSIFIER() AS var_name,
                 MATCH_NUMBER() AS match_seq
        ALL ROWS PER MATCH
        PARTITION BY user_id
        ORDER BY ts
        """,
    )


@register("cep_sql_run_agg", oracle=_RUN_AGG_ORACLE)
def cep_sql_run_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL standard's DEFINE-aggregate feature reached FROM
    MATCH_RECOGNIZE text (closing the round-6 verdict's last
    dialect/engine asymmetry): PATTERN (A -> B+) WITHIN 7 DAYS where
    each candidate B binds iff cents ≤ 1.5 × the run's RUNNING
    average including itself — the exact semantics of the standalone
    cep_run_agg operator (operators/cep.py), now compiled from
    `DEFINE B AS ... AND B.cents <= 1.5 * AVG(B.cents)` to the SAME
    advance_kleene_agg kernel on both engines (batch applyInPandas
    here; kleene_agg_stream's applyInPandasWithState for streams).
    Same recursive-CTE oracle as cep_run_agg: one text, one kernel,
    one brute-force walk of the definition.

    100 TB shape: anchor/candidate predicates evaluated JVM-side into
    booleans (the Python boundary moves 5 narrow columns), then ONE
    (user) shuffle into an O(rows-per-key) scan with O(1) state."""
    e = (
        table(spark, sf_dir, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & (F.col("value").isNull() | (F.abs("value") <= 1e9))
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    out = match_recognize(
        e,
        """
        PATTERN ( A -> B+ )
        WITHIN 7 DAYS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'view' AND B.cents <= 1.5 * AVG(B.cents)
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    )
    return out.select(
        F.col("key").alias("user_id"),
        F.col("t_A").alias("anchor_ts"),
        F.col("B_count").alias("n_b"),
        F.col("B_sum_cents").alias("sum_b_cents"),
    )


_RUN_COUNT_ORACLE = """
    WITH RECURSIVE ev AS (
      SELECT user_id, coalesce(event_type, '') AS et,
             epoch_us(ts) AS tus,
             -- coalesce(event_id, 0): the kernel faces map NULL
             -- event_id to 0 pre-sort; DuckDB's default is NULLS LAST
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, coalesce(event_id, 0)) AS rn
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ),
    mx AS (SELECT user_id, max(rn) AS mxrn FROM ev GROUP BY user_id),
    walk AS (
      SELECT user_id, 0 AS rn, FALSE AS in_run,
             CAST(0 AS BIGINT) AS n,
             CAST(NULL AS BIGINT) AS anchor, CAST(NULL AS BIGINT) AS dl,
             CAST(NULL AS BIGINT) AS em_anchor, CAST(NULL AS BIGINT) AS em_n
      FROM mx
      UNION ALL
      SELECT w.user_id, e.rn,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN e.et = 'signup'
                  WHEN e.et = 'purchase' AND w.n + 1 > 3 THEN FALSE
                  ELSE TRUE END,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'purchase' AND w.n + 1 <= 3 THEN w.n + 1
                  WHEN e.et = 'purchase' THEN CAST(0 AS BIGINT)
                  ELSE w.n END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' THEN e.tus
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'purchase' AND w.n + 1 > 3
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.anchor END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' THEN e.tus + 604800000000
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'purchase' AND w.n + 1 > 3
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.dl END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0
                  THEN w.anchor
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'purchase'
                       AND w.n + 1 > 3
                  THEN w.anchor END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0 THEN w.n
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'purchase'
                       AND w.n + 1 > 3
                  THEN w.n END
      FROM walk w JOIN ev e
        ON e.user_id = w.user_id AND e.rn = w.rn + 1
    ),
    closes AS (
      SELECT user_id, em_anchor AS anchor, em_n AS n
      FROM walk WHERE em_anchor IS NOT NULL
      UNION ALL
      SELECT w.user_id, w.anchor, w.n
      FROM walk w JOIN mx ON mx.user_id = w.user_id AND w.rn = mx.mxrn
      WHERE w.in_run AND w.n > 0
    )
    SELECT user_id, make_timestamp(anchor) AS anchor_ts, n AS n_b
    FROM closes
"""


@register("cep_sql_run_count", oracle=_RUN_COUNT_ORACLE)
def cep_sql_run_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COUNT-cap form of the DEFINE-aggregate grammar, oracle-backed
    (cep_sql_run_agg covers the AVG form; the sum_cap/count_cap forms
    were fixture-tested only — this key gives count_cap hash evidence):
    PATTERN (A -> B+) WITHIN 7 DAYS where a purchase binds iff it is at
    most the run's THIRD (COUNT(B.*) <= 3, RUNNING, current row
    included) — the standard bounded-repetition-with-relaxed-gaps shape
    a plain B{1,3} cannot express (times() binds contiguous runs; this
    counts across ignored interleaved events). A fourth purchase closes
    the match and is consumed; the oracle replays the walk as a
    recursive CTE (the _RUN_AGG_ORACLE structure minus the sum
    state)."""
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
    )
    out = match_recognize(
        e,
        """
        PATTERN ( A -> B+ )
        WITHIN 7 DAYS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'purchase' AND COUNT(B.*) <= 3
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    )
    return out.select(
        F.col("key").alias("user_id"),
        F.col("t_A").alias("anchor_ts"),
        F.col("B_count").alias("n_b"),
    )


_LEADING_KLEENE_ORACLE = """
    WITH RECURSIVE ev AS (
      SELECT user_id, event_type AS et, epoch_us(ts) AS tus,
             -- only A/B rows walk: other rows are noise to the kernel
             -- (relaxed runs; a noise row past the deadline closes the
             -- run but cannot open one, so skipping it is exact)
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, coalesce(event_id, 0)) AS rn
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IN ('view', 'purchase')
    ),
    mx AS (SELECT user_id, max(rn) AS mxrn FROM ev GROUP BY user_id),
    walk AS (
      SELECT user_id, 0 AS rn, FALSE AS in_run,
             CAST(0 AS BIGINT) AS n,
             CAST(NULL AS BIGINT) AS anchor, CAST(NULL AS BIGINT) AS dl,
             CAST(NULL AS BIGINT) AS em_anchor,
             CAST(NULL AS BIGINT) AS em_n, CAST(NULL AS BIGINT) AS em_conf
      FROM mx
      UNION ALL
      SELECT w.user_id, e.rn,
             -- fresh (idle or past the deadline): a view re-anchors;
             -- open + in bound: a view binds, a purchase confirms
             CASE WHEN (NOT w.in_run) OR (e.tus > w.dl)
                  THEN e.et = 'view'
                  WHEN e.et = 'view' THEN TRUE
                  ELSE FALSE END,
             CASE WHEN (NOT w.in_run) OR (e.tus > w.dl)
                  THEN CASE WHEN e.et = 'view' THEN CAST(1 AS BIGINT)
                            ELSE CAST(0 AS BIGINT) END
                  WHEN e.et = 'view' THEN w.n + 1
                  ELSE CAST(0 AS BIGINT) END,
             CASE WHEN (NOT w.in_run) OR (e.tus > w.dl)
                  THEN CASE WHEN e.et = 'view' THEN e.tus END
                  WHEN e.et = 'view' THEN w.anchor END,
             CASE WHEN (NOT w.in_run) OR (e.tus > w.dl)
                  THEN CASE WHEN e.et = 'view'
                            THEN e.tus + 21600000000 END
                  WHEN e.et = 'view' THEN w.dl END,
             CASE WHEN w.in_run AND e.tus <= w.dl AND e.et = 'purchase'
                  THEN w.anchor END,
             CASE WHEN w.in_run AND e.tus <= w.dl AND e.et = 'purchase'
                  THEN w.n END,
             CASE WHEN w.in_run AND e.tus <= w.dl AND e.et = 'purchase'
                  THEN e.tus END
      FROM walk w JOIN ev e
        ON e.user_id = w.user_id AND e.rn = w.rn + 1
    )
    SELECT user_id AS key, make_timestamp(em_anchor) AS t_A,
           em_n AS A_count, make_timestamp(em_conf) AS t_B
    FROM walk WHERE em_anchor IS NOT NULL
"""


@register("cep_sql_leading_kleene", oracle=_LEADING_KLEENE_ORACLE)
def cep_sql_leading_kleene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A LEADING Kleene step — PATTERN (A+ -> B), the classic
    "run then terminal" spelling (round-10 verdict item 3a; previously
    a pointed parse error): the run's FIRST view anchors the match and
    fixes the WITHIN window, every further view binds (relaxed — noise
    rows between members ignored), and the first purchase inside the
    deadline confirms, emitting (t_A, A_count anchor-INCLUSIVE, t_B)
    with SKIP PAST LAST ROW non-overlap. Compiles to the SAME
    advance_kleene_agg kernel as the DEFINE-aggregate family with a
    trivially-true bind and min_n=0 (a single-view run is legal); an
    unconfirmed run (deadline expiry) emits nothing, and the
    deadline-crossing row itself can re-anchor. The oracle replays the
    scan as a recursive walk over the A/B subsequence."""
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
    )
    return match_recognize(
        e,
        """
        PATTERN ( A+ -> B )
        WITHIN 6 HOURS
        DEFINE A AS event_type = 'view',
               B AS event_type = 'purchase'
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    )


_LEADING_KLEENE_ROWS_ORACLE = """
    WITH RECURSIVE ev AS (
      SELECT user_id, event_type AS et, epoch_us(ts) AS tus, ts,
             coalesce(event_id, 0) AS eid0,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, coalesce(event_id, 0)) AS rn
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IN ('view', 'purchase')
    ),
    mx AS (SELECT user_id, max(rn) AS mxrn FROM ev GROUP BY user_id),
    walk AS (
      SELECT user_id, 0 AS rn, FALSE AS in_run,
             CAST(0 AS BIGINT) AS n,
             CAST(NULL AS BIGINT) AS anchor, CAST(NULL AS BIGINT) AS dl,
             CAST(NULL AS BIGINT) AS arn,
             CAST(NULL AS BIGINT) AS em_anchor,
             CAST(NULL AS BIGINT) AS em_n,
             CAST(NULL AS BIGINT) AS em_conf,
             CAST(NULL AS BIGINT) AS em_arn,
             CAST(NULL AS BIGINT) AS em_crn
      FROM mx
      UNION ALL
      SELECT w.user_id, e.rn,
             CASE WHEN (NOT w.in_run) OR (e.tus > w.dl)
                  THEN e.et = 'view'
                  WHEN e.et = 'view' THEN TRUE
                  ELSE FALSE END,
             CASE WHEN (NOT w.in_run) OR (e.tus > w.dl)
                  THEN CASE WHEN e.et = 'view' THEN CAST(1 AS BIGINT)
                            ELSE CAST(0 AS BIGINT) END
                  WHEN e.et = 'view' THEN w.n + 1
                  ELSE CAST(0 AS BIGINT) END,
             CASE WHEN (NOT w.in_run) OR (e.tus > w.dl)
                  THEN CASE WHEN e.et = 'view' THEN e.tus END
                  WHEN e.et = 'view' THEN w.anchor END,
             CASE WHEN (NOT w.in_run) OR (e.tus > w.dl)
                  THEN CASE WHEN e.et = 'view'
                            THEN e.tus + 21600000000 END
                  WHEN e.et = 'view' THEN w.dl END,
             CASE WHEN (NOT w.in_run) OR (e.tus > w.dl)
                  THEN CASE WHEN e.et = 'view' THEN e.rn END
                  WHEN e.et = 'view' THEN w.arn END,
             CASE WHEN w.in_run AND e.tus <= w.dl AND e.et = 'purchase'
                  THEN w.anchor END,
             CASE WHEN w.in_run AND e.tus <= w.dl AND e.et = 'purchase'
                  THEN w.n END,
             CASE WHEN w.in_run AND e.tus <= w.dl AND e.et = 'purchase'
                  THEN e.tus END,
             CASE WHEN w.in_run AND e.tus <= w.dl AND e.et = 'purchase'
                  THEN w.arn END,
             CASE WHEN w.in_run AND e.tus <= w.dl AND e.et = 'purchase'
                  THEN e.rn END
      FROM walk w JOIN ev e
        ON e.user_id = w.user_id AND e.rn = w.rn + 1
    ),
    m AS (
      SELECT user_id, em_anchor, em_n, em_conf, em_arn, em_crn,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY em_arn) AS BIGINT) AS mn
      FROM walk WHERE em_anchor IS NOT NULL
    )
    SELECT m.user_id AS key, e.ts, e.eid0 AS event_id,
           CAST(row_number() OVER (PARTITION BY m.user_id, m.em_arn
                                   ORDER BY e.rn) AS BIGINT) AS n_so_far,
           m.em_n AS n_total, 'A' AS cls,
           make_timestamp(m.em_anchor) AS t_first,
           make_timestamp(m.em_conf) AS t_b, m.mn
    FROM m JOIN ev e
      ON e.user_id = m.user_id AND e.rn >= m.em_arn
     AND e.rn < m.em_crn AND e.et = 'view'
    UNION ALL
    SELECT m.user_id, e.ts, e.eid0, m.em_n, m.em_n, 'B',
           make_timestamp(m.em_anchor), make_timestamp(m.em_conf), m.mn
    FROM m JOIN ev e
      ON e.user_id = m.user_id AND e.rn = m.em_crn
"""


@register(
    "cep_sql_leading_kleene_rows", oracle=_LEADING_KLEENE_ROWS_ORACLE
)
def cep_sql_leading_kleene_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL ROWS PER MATCH face of the leading Kleene (A+ -> B): one
    output row per bound event — every view of the run plus the
    confirming purchase — with the anchor-INCLUSIVE RUNNING count
    (COUNT(A.*) under ALL ROWS is RUNNING by the standard; the anchor
    row counts 1), the FINAL count on every row, CLASSIFIER() (anchor
    and candidates are both 'A' — the internal kleene step never
    leaks), the anchor/confirm timestamps, and MATCH_NUMBER().  Rides
    the kernel's emit_rows face unchanged — WHICH matches emit is
    identical to cep_sql_leading_kleene; the oracle extends the same
    recursive walk with the anchor/confirm row numbers and joins the
    bound rows back."""
    e = (
        table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id", "event_type")
    )
    return match_recognize(
        e,
        """
        PATTERN ( A+ -> B )
        WITHIN 6 HOURS
        DEFINE A AS event_type = 'view',
               B AS event_type = 'purchase'
        MEASURES COUNT(A.*) AS n_so_far,
                 FINAL COUNT(A.*) AS n_total,
                 CLASSIFIER() AS cls,
                 A.ts AS t_first, B.ts AS t_b,
                 MATCH_NUMBER() AS mn
        ALL ROWS PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    )


_RUN_AGG_CONFIRM_ORACLE = """
    WITH RECURSIVE ev AS (
      SELECT user_id,
             coalesce(event_type, '') AS et,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) AS tus,
             -- coalesce(event_id, 0): DuckDB sorts NULL LAST, the
             -- kernel faces map NULL event_id to 0 BEFORE sorting
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, coalesce(event_id, 0)) AS rn
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND (value IS NULL OR abs(value) <= 1e9)
    ),
    mx AS (SELECT user_id, max(rn) AS mxrn FROM ev GROUP BY user_id),
    walk AS (
      SELECT user_id, 0 AS rn, FALSE AS in_run,
             CAST(0 AS BIGINT) AS n, CAST(0 AS BIGINT) AS s,
             CAST(NULL AS BIGINT) AS anchor, CAST(NULL AS BIGINT) AS dl,
             CAST(NULL AS BIGINT) AS em_anchor,
             CAST(NULL AS BIGINT) AS em_n, CAST(NULL AS BIGINT) AS em_s,
             CAST(NULL AS BIGINT) AS em_conf
      FROM mx
      UNION ALL
      SELECT w.user_id, e.rn,
             -- in_run: greedy B+ first (bind-extend), then the C
             -- confirm closes, then a bind-failing B kills; deadline
             -- expiry / idle re-anchors on a signup
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN e.et = 'signup'
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND 2 * e.cents * (w.n + 1) <= 3 * (w.s + e.cents)
                  THEN TRUE
                  WHEN e.et = 'purchase' AND w.n > 0 THEN FALSE
                  WHEN e.et = 'view' AND e.cents IS NOT NULL THEN FALSE
                  ELSE TRUE END,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND 2 * e.cents * (w.n + 1) <= 3 * (w.s + e.cents)
                  THEN w.n + 1
                  WHEN e.et = 'purchase' AND w.n > 0
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(0 AS BIGINT)
                  ELSE w.n END,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND 2 * e.cents * (w.n + 1) <= 3 * (w.s + e.cents)
                  THEN w.s + e.cents
                  WHEN e.et = 'purchase' AND w.n > 0
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(0 AS BIGINT)
                  ELSE w.s END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' THEN e.tus
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND 2 * e.cents * (w.n + 1) <= 3 * (w.s + e.cents)
                  THEN w.anchor
                  WHEN e.et = 'purchase' AND w.n > 0
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.anchor END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' THEN e.tus + 604800000000
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND 2 * e.cents * (w.n + 1) <= 3 * (w.s + e.cents)
                  THEN w.dl
                  WHEN e.et = 'purchase' AND w.n > 0
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.dl END,
             -- emissions: ONLY a confirm row inside the deadline with
             -- n >= 1 emits — deadline expiry and bind-failing rows
             -- kill the run unemitted (an unconfirmed run is not a
             -- match), and there is no partition-end close
             CASE WHEN w.in_run AND e.tus <= w.dl
                       AND e.et = 'purchase' AND w.n > 0
                  THEN w.anchor END,
             CASE WHEN w.in_run AND e.tus <= w.dl
                       AND e.et = 'purchase' AND w.n > 0
                  THEN w.n END,
             CASE WHEN w.in_run AND e.tus <= w.dl
                       AND e.et = 'purchase' AND w.n > 0
                  THEN w.s END,
             CASE WHEN w.in_run AND e.tus <= w.dl
                       AND e.et = 'purchase' AND w.n > 0
                  THEN e.tus END
      FROM walk w JOIN ev e
        ON e.user_id = w.user_id AND e.rn = w.rn + 1
    )
    SELECT user_id, make_timestamp(em_anchor) AS anchor_ts,
           make_timestamp(em_conf) AS confirm_ts,
           em_n AS n_b, em_s AS run_total
    FROM walk WHERE em_anchor IS NOT NULL
"""


@register("cep_sql_run_agg_confirm", oracle=_RUN_AGG_CONFIRM_ORACLE)
def cep_sql_run_agg_confirm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The terminal-confirm DEFINE-aggregate shape (round-8 verdict
    item 3): PATTERN (A -> B+ -> C) WITHIN 7 DAYS — a signup opens the
    run, views bind while cents ≤ 1.5 × the RUNNING average (current
    row included, exact cross-multiplied integers), and the match
    exists ONLY if a purchase arrives while the run is open with ≥ 1
    bound view (the run-ends-with-a-purchase funnel shape).  Deadline
    expiry and bind-failing views kill the run UNEMITTED — the
    semantic difference from cep_sql_run_agg, whose every run closes.
    MEASURES (also round 8) rename the kernel's outputs: the anchor /
    confirm timestamps and the run's COUNT/SUM — compiled as pure
    selections, no extra kernel state.  Same advance_kleene_agg
    kernel on both engines (confirm=True flag; batch applyInPandas
    here, kleene_agg_stream's applyInPandasWithState for streams);
    the oracle replays the definition as a recursive-CTE walk.

    100 TB shape: identical to cep_sql_run_agg — predicates JVM-side
    into narrow booleans, ONE (user) shuffle into an O(rows-per-key)
    scan with O(1) state."""
    e = (
        table(spark, sf_dir, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & (F.col("value").isNull() | (F.abs("value") <= 1e9))
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    out = match_recognize(
        e,
        """
        PATTERN ( A -> B+ -> C )
        WITHIN 7 DAYS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'view' AND B.cents <= 1.5 * AVG(B.cents),
               C AS event_type = 'purchase'
        MEASURES A.ts AS anchor_ts,
                 C.ts AS confirm_ts,
                 COUNT(B.cents) AS n_b,
                 SUM(B.cents) AS run_total
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    )
    return out.select(
        F.col("key").alias("user_id"),
        "anchor_ts",
        "confirm_ts",
        "n_b",
        "run_total",
    )


_RUN_AGG_TIMES_ORACLE = """
    WITH RECURSIVE ev AS (
      SELECT user_id,
             coalesce(event_type, '') AS et,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) AS tus,
             -- coalesce(event_id, 0): the kernel faces map NULL
             -- event_id to 0 pre-sort; DuckDB's default is NULLS LAST
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, coalesce(event_id, 0)) AS rn
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND (value IS NULL OR abs(value) <= 1e9)
    ),
    mx AS (SELECT user_id, max(rn) AS mxrn FROM ev GROUP BY user_id),
    walk AS (
      SELECT user_id, 0 AS rn, FALSE AS in_run,
             CAST(0 AS BIGINT) AS n, CAST(0 AS BIGINT) AS s,
             CAST(NULL AS BIGINT) AS anchor, CAST(NULL AS BIGINT) AS dl,
             CAST(NULL AS BIGINT) AS em_anchor,
             CAST(NULL AS BIGINT) AS em_n, CAST(NULL AS BIGINT) AS em_s
      FROM mx
      UNION ALL
      SELECT w.user_id, e.rn,
             -- in_run': greedy completion at the 4th bind closes the
             -- run; a cap-failing candidate is consumed and kills it
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN e.et = 'signup'
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000 AND w.n + 1 = 4
                  THEN FALSE
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000
                  THEN TRUE
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN FALSE
                  ELSE TRUE END,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000 AND w.n + 1 = 4
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000
                  THEN w.n + 1
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(0 AS BIGINT)
                  ELSE w.n END,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000 AND w.n + 1 = 4
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000
                  THEN w.s + e.cents
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(0 AS BIGINT)
                  ELSE w.s END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' THEN e.tus
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000 AND w.n + 1 = 4
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (w.s + e.cents <= 25000)
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.anchor END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' THEN e.tus + 604800000000
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000 AND w.n + 1 = 4
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (w.s + e.cents <= 25000)
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.dl END,
             -- emissions: deadline close (n >= 2), greedy completion
             -- at the 4th bind, cap-fail close (n >= 2)
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n >= 2
                  THEN w.anchor
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000 AND w.n + 1 = 4
                  THEN w.anchor
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (w.s + e.cents <= 25000) AND w.n >= 2
                  THEN w.anchor END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n >= 2 THEN w.n
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000 AND w.n + 1 = 4
                  THEN w.n + 1
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (w.s + e.cents <= 25000) AND w.n >= 2
                  THEN w.n END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n >= 2 THEN w.s
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000 AND w.n + 1 = 4
                  THEN w.s + e.cents
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (w.s + e.cents <= 25000) AND w.n >= 2
                  THEN w.s END
      FROM walk w JOIN ev e
        ON e.user_id = w.user_id AND e.rn = w.rn + 1
    ),
    closes AS (
      SELECT user_id, em_anchor AS anchor, em_n AS n, em_s AS s
      FROM walk WHERE em_anchor IS NOT NULL
      UNION ALL
      SELECT w.user_id, w.anchor, w.n, w.s
      FROM walk w JOIN mx ON mx.user_id = w.user_id AND w.rn = mx.mxrn
      WHERE w.in_run AND w.n >= 2
    )
    SELECT user_id, make_timestamp(anchor) AS anchor_ts,
           n AS n_b, s AS sum_b_cents
    FROM closes
"""


@register("cep_sql_run_agg_times", oracle=_RUN_AGG_TIMES_ORACLE)
def cep_sql_run_agg_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{n,m} quantifier bounds on the DEFINE-aggregate Kleene step
    (round-8 generality notch past the r7 verdict's item-3 list):
    PATTERN (A -> B{2,4}) WITHIN 7 DAYS where views bind while the
    running sum stays within the cap (SUM(B.cents) <= 25000, RUNNING
    — current row included, exact integers).  Greedy-NFA bounds
    semantics (advance_kleene_agg): the 4th bind COMPLETES the match
    at that row (nothing more can bind — SKIP PAST LAST ROW consumes
    through it); a run closing with fewer than 2 bound rows is not a
    match and dies silently; cap-failing candidates are consumed and
    close the run (emitting iff >= 2 bound).  The {2,4} token is
    rewritten to B+ by _rewrite_run_agg_bounds BEFORE variant
    expansion sees the brace, so the same kernel runs on both engines
    with (min_n, max_n) = (2, 4); the oracle replays the definition
    as a recursive-CTE walk with the bounds inlined.

    100 TB shape: identical to cep_sql_run_agg — predicates JVM-side
    into narrow booleans, ONE (user) shuffle into an O(rows-per-key)
    scan with O(1) state; bounds add ZERO state (two ints in the
    closure)."""
    e = (
        table(spark, sf_dir, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & (F.col("value").isNull() | (F.abs("value") <= 1e9))
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    out = match_recognize(
        e,
        """
        PATTERN ( A -> B{2,4} )
        WITHIN 7 DAYS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'view' AND SUM(B.cents) <= 25000
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    )
    return out.select(
        F.col("key").alias("user_id"),
        F.col("t_A").alias("anchor_ts"),
        F.col("B_count").alias("n_b"),
        F.col("B_sum_cents").alias("sum_b_cents"),
    )


_RUN_AGG_MULTIKEY_ORACLE = """
    WITH RECURSIVE ev AS (
      SELECT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS wk,
             coalesce(event_type, '') AS et,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) AS tus,
             row_number() OVER (
                 PARTITION BY user_id, CAST(date_trunc('week', ts) AS DATE)
                 ORDER BY ts, coalesce(event_id, 0)) AS rn
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND (value IS NULL OR abs(value) <= 1e9)
    ),
    mx AS (SELECT user_id, wk, max(rn) AS mxrn
           FROM ev GROUP BY user_id, wk),
    walk AS (
      SELECT user_id, wk, 0 AS rn, FALSE AS in_run,
             CAST(0 AS BIGINT) AS n, CAST(0 AS BIGINT) AS s,
             CAST(NULL AS BIGINT) AS anchor, CAST(NULL AS BIGINT) AS dl,
             CAST(NULL AS BIGINT) AS em_anchor,
             CAST(NULL AS BIGINT) AS em_n, CAST(NULL AS BIGINT) AS em_s
      FROM mx
      UNION ALL
      SELECT w.user_id, w.wk, e.rn,
             -- bind: cents <= 2 x RUNNING AVG incl. itself, i.e.
             -- cents * (n+1) <= 2 * (s + cents), exact integers
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN e.et = 'signup'
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (e.cents * (w.n + 1)
                                <= 2 * (w.s + e.cents))
                  THEN FALSE
                  ELSE TRUE END,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND e.cents * (w.n + 1) <= 2 * (w.s + e.cents)
                  THEN w.n + 1
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(0 AS BIGINT)
                  ELSE w.n END,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND e.cents * (w.n + 1) <= 2 * (w.s + e.cents)
                  THEN w.s + e.cents
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(0 AS BIGINT)
                  ELSE w.s END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' THEN e.tus
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (e.cents * (w.n + 1)
                                <= 2 * (w.s + e.cents))
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.anchor END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' THEN e.tus + 259200000000
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (e.cents * (w.n + 1)
                                <= 2 * (w.s + e.cents))
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.dl END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0
                  THEN w.anchor
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (e.cents * (w.n + 1)
                                <= 2 * (w.s + e.cents))
                       AND w.n > 0
                  THEN w.anchor END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0 THEN w.n
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (e.cents * (w.n + 1)
                                <= 2 * (w.s + e.cents))
                       AND w.n > 0
                  THEN w.n END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0 THEN w.s
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (e.cents * (w.n + 1)
                                <= 2 * (w.s + e.cents))
                       AND w.n > 0
                  THEN w.s END
      FROM walk w JOIN ev e
        ON e.user_id = w.user_id AND e.wk = w.wk AND e.rn = w.rn + 1
    ),
    closes AS (
      SELECT user_id, wk, em_anchor AS anchor, em_n AS n, em_s AS s
      FROM walk WHERE em_anchor IS NOT NULL
      UNION ALL
      SELECT w.user_id, w.wk, w.anchor, w.n, w.s
      FROM walk w JOIN mx ON mx.user_id = w.user_id AND mx.wk = w.wk
                         AND w.rn = mx.mxrn
      WHERE w.in_run AND w.n > 0
    )
    SELECT user_id, wk, make_timestamp(anchor) AS anchor_ts,
           n AS n_b, s AS sum_b_cents
    FROM closes
"""


@register("cep_sql_run_agg_multikey", oracle=_RUN_AGG_MULTIKEY_ORACLE)
def cep_sql_run_agg_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite PARTITION BY with a DEFINE-aggregate (the last
    restriction on the r7 verdict's item-3 list): runs are scoped to
    (user_id, ISO week) — PATTERN (A -> B+) WITHIN 3 DAYS, views
    binding while cents <= 2 x the RUNNING average including
    themselves (exact cross-multiplied integers).  The dialect
    projects one narrow column per key part (key_user_id, key_wk),
    both faces group by the pair, and each part's dtype derives from
    the input (wk is a DATE) — the same advance_kleene_agg kernel,
    zero per-key-part state growth.

    100 TB shape: the composite key only REFINES the shuffle hash —
    same single exchange, more and finer groups (better skew posture
    than user_id alone: a hot user splits across weeks)."""
    e = (
        table(spark, sf_dir, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & (F.col("value").isNull() | (F.abs("value") <= 1e9))
        )
        .select(
            "user_id",
            F.date_trunc("week", F.col("ts")).cast("date").alias("wk"),
            "ts",
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    out = match_recognize(
        e,
        """
        PATTERN ( A -> B+ )
        WITHIN 3 DAYS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'view' AND B.cents <= 2 * AVG(B.cents)
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id, wk
        ORDER BY ts
        """,
    )
    return out.select(
        F.col("key_user_id").alias("user_id"),
        F.col("key_wk").alias("wk"),
        F.col("t_A").alias("anchor_ts"),
        F.col("B_count").alias("n_b"),
        F.col("B_sum_cents").alias("sum_b_cents"),
    )


_RUN_AGG_CORR_ORACLE = """
    WITH RECURSIVE ev AS (
      SELECT user_id,
             coalesce(event_type, '') AS et,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) AS tus,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, coalesce(event_id, 0)) AS rn
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND (value IS NULL OR abs(value) <= 1e9)
    ),
    mx AS (SELECT user_id, max(rn) AS mxrn FROM ev GROUP BY user_id),
    walk AS (
      SELECT user_id, 0 AS rn, FALSE AS in_run,
             CAST(0 AS BIGINT) AS n, CAST(0 AS BIGINT) AS s,
             CAST(NULL AS BIGINT) AS anchor, CAST(NULL AS BIGINT) AS dl,
             CAST(NULL AS BIGINT) AS ac,
             CAST(NULL AS BIGINT) AS em_anchor,
             CAST(NULL AS BIGINT) AS em_n, CAST(NULL AS BIGINT) AS em_s
      FROM mx
      UNION ALL
      SELECT w.user_id, e.rn,
             -- open: signup WITH a non-NULL cents (NULL anchor value
             -- cannot open — 3VL); bind: view, cents <= 1.5 x RUNNING
             -- avg incl. itself AND cents >= the anchor's cents
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN e.et = 'signup' AND e.cents IS NOT NULL
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents * (w.n + 1)
                                  <= 3 * (w.s + e.cents)
                                AND e.cents >= w.ac)
                  THEN FALSE
                  ELSE TRUE END,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND 2 * e.cents * (w.n + 1) <= 3 * (w.s + e.cents)
                       AND e.cents >= w.ac
                  THEN w.n + 1
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(0 AS BIGINT)
                  ELSE w.n END,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND 2 * e.cents * (w.n + 1) <= 3 * (w.s + e.cents)
                       AND e.cents >= w.ac
                  THEN w.s + e.cents
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(0 AS BIGINT)
                  ELSE w.s END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' AND e.cents IS NOT NULL
                  THEN e.tus
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents * (w.n + 1)
                                  <= 3 * (w.s + e.cents)
                                AND e.cents >= w.ac)
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.anchor END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' AND e.cents IS NOT NULL
                  THEN e.tus + 604800000000
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents * (w.n + 1)
                                  <= 3 * (w.s + e.cents)
                                AND e.cents >= w.ac)
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.dl END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' AND e.cents IS NOT NULL
                  THEN e.cents
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents * (w.n + 1)
                                  <= 3 * (w.s + e.cents)
                                AND e.cents >= w.ac)
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.ac END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0
                  THEN w.anchor
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents * (w.n + 1)
                                  <= 3 * (w.s + e.cents)
                                AND e.cents >= w.ac)
                       AND w.n > 0
                  THEN w.anchor END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0 THEN w.n
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents * (w.n + 1)
                                  <= 3 * (w.s + e.cents)
                                AND e.cents >= w.ac)
                       AND w.n > 0
                  THEN w.n END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0 THEN w.s
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents * (w.n + 1)
                                  <= 3 * (w.s + e.cents)
                                AND e.cents >= w.ac)
                       AND w.n > 0
                  THEN w.s END
      FROM walk w JOIN ev e
        ON e.user_id = w.user_id AND e.rn = w.rn + 1
    ),
    closes AS (
      SELECT user_id, em_anchor AS anchor, em_n AS n, em_s AS s
      FROM walk WHERE em_anchor IS NOT NULL
      UNION ALL
      SELECT w.user_id, w.anchor, w.n, w.s
      FROM walk w JOIN mx ON mx.user_id = w.user_id AND w.rn = mx.mxrn
      WHERE w.in_run AND w.n > 0
    )
    SELECT user_id, make_timestamp(anchor) AS anchor_ts,
           n AS n_b, s AS sum_b_cents
    FROM closes
"""


@register("cep_sql_run_agg_corr", oracle=_RUN_AGG_CORR_ORACLE)
def cep_sql_run_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed aggregate + anchor-correlation DEFINE — the LAST entry on
    the r7 verdict's item-3 restriction list: PATTERN (A -> B+)
    WITHIN 7 DAYS where a view binds iff BOTH the running-aggregate
    condition (cents <= 1.5 x RUNNING avg incl. itself, exact
    cross-multiplied integers) AND the anchor comparison
    (B.cents >= A.cents — at least the signup's own cents) hold.  The
    anchor row's value is O(1) extra run state captured at open; SQL
    3VL pins NULLs (a signup with NULL cents cannot open, a view with
    NULL cents is a non-candidate).  Same advance_kleene_agg kernel
    on both engines (corr closure); the oracle replays the definition
    as a recursive-CTE walk carrying the anchor value.

    100 TB shape: identical to cep_sql_run_agg — the two correlation
    operands ride as two more narrow JVM-projected columns across the
    Arrow boundary; ONE (user) shuffle, O(1) per-key state."""
    e = (
        table(spark, sf_dir, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & (F.col("value").isNull() | (F.abs("value") <= 1e9))
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )
    out = match_recognize(
        e,
        """
        PATTERN ( A -> B+ )
        WITHIN 7 DAYS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'view'
                    AND B.cents <= 1.5 * AVG(B.cents)
                    AND B.cents >= A.cents
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    )
    return out.select(
        F.col("key").alias("user_id"),
        F.col("t_A").alias("anchor_ts"),
        F.col("B_count").alias("n_b"),
        F.col("B_sum_cents").alias("sum_b_cents"),
    )


# Shared recursive-CTE walk for the ALL ROWS PER MATCH run-agg keys
# (cep_sql_run_agg_measures / cep_sql_run_agg_exclusion): replays
# PATTERN (A -> B+ -> C) WITHIN 7 DAYS with the sum-cap bind
# (SUM(B.cents) <= 25000) and carries PER-ROW columns -- row_cls
# (0 anchor / 1 bound / 2 confirm / NULL non-binding), the RUNNING
# (row_n, row_s) at the row, and row_anc (the rn of the run's anchor
# row, a per-user-unique run id) -- so emitted matches can join their
# own rows back without anchor-timestamp collisions.  {body} is the
# key-specific final SELECT over `out`.
_RUN_AGG_ROWS_ORACLE_TMPL = """
    WITH RECURSIVE ev AS (
      SELECT user_id,
             coalesce(event_type, '') AS et,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) AS tus,
             -- coalesce(event_id, 0): the kernel faces map NULL
             -- event_id to 0 pre-sort; DuckDB's default is NULLS LAST
             coalesce(event_id, 0) AS eid,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, coalesce(event_id, 0)) AS rn
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND (value IS NULL OR abs(value) <= 1e9)
    ),
    mx AS (SELECT user_id, max(rn) AS mxrn FROM ev GROUP BY user_id),
    walk AS (
      SELECT user_id, 0 AS rn, FALSE AS in_run,
             CAST(0 AS BIGINT) AS n, CAST(0 AS BIGINT) AS s,
             CAST(NULL AS BIGINT) AS anc, CAST(NULL AS BIGINT) AS dl,
             CAST(NULL AS BIGINT) AS tus, CAST(NULL AS BIGINT) AS eid,
             CAST(NULL AS BIGINT) AS row_cls,
             CAST(NULL AS BIGINT) AS row_n, CAST(NULL AS BIGINT) AS row_s,
             CAST(NULL AS BIGINT) AS row_anc
      FROM mx
      UNION ALL
      SELECT w.user_id, e.rn,
             -- state: idle/expired re-anchors on a signup; greedy B+
             -- bind-extend first, then C confirm closes, then a
             -- bind-failing B kills (unemitted)
             CASE WHEN (NOT w.in_run) OR e.tus > w.dl
                  THEN e.et = 'signup'
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000
                  THEN TRUE
                  WHEN e.et = 'purchase' AND w.n > 0 THEN FALSE
                  WHEN e.et = 'view' AND e.cents IS NOT NULL THEN FALSE
                  ELSE TRUE END,
             CASE WHEN (NOT w.in_run) OR e.tus > w.dl
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000
                  THEN w.n + 1
                  WHEN e.et = 'purchase' AND w.n > 0
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(0 AS BIGINT)
                  ELSE w.n END,
             CASE WHEN (NOT w.in_run) OR e.tus > w.dl
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000
                  THEN w.s + e.cents
                  WHEN e.et = 'purchase' AND w.n > 0
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(0 AS BIGINT)
                  ELSE w.s END,
             CASE WHEN ((NOT w.in_run) OR e.tus > w.dl)
                       AND e.et = 'signup' THEN e.rn
                  WHEN (NOT w.in_run) OR e.tus > w.dl
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000
                  THEN w.anc
                  WHEN e.et = 'purchase' AND w.n > 0
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.anc END,
             CASE WHEN ((NOT w.in_run) OR e.tus > w.dl)
                       AND e.et = 'signup' THEN e.tus + 604800000000
                  WHEN (NOT w.in_run) OR e.tus > w.dl
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000
                  THEN w.dl
                  WHEN e.et = 'purchase' AND w.n > 0
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.dl END,
             e.tus, e.eid,
             -- per-row classifier: anchor / bound / confirm rows only
             CASE WHEN ((NOT w.in_run) OR e.tus > w.dl)
                       AND e.et = 'signup' THEN CAST(0 AS BIGINT)
                  WHEN (NOT w.in_run) OR e.tus > w.dl
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000
                  THEN CAST(1 AS BIGINT)
                  WHEN e.et = 'purchase' AND w.n > 0
                  THEN CAST(2 AS BIGINT) END,
             -- RUNNING count/sum AT the row (0/0 on the anchor row;
             -- == final on the confirm row)
             CASE WHEN ((NOT w.in_run) OR e.tus > w.dl)
                       AND e.et = 'signup' THEN CAST(0 AS BIGINT)
                  WHEN (NOT w.in_run) OR e.tus > w.dl
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000
                  THEN w.n + 1
                  WHEN e.et = 'purchase' AND w.n > 0
                  THEN w.n END,
             CASE WHEN ((NOT w.in_run) OR e.tus > w.dl)
                       AND e.et = 'signup' THEN CAST(0 AS BIGINT)
                  WHEN (NOT w.in_run) OR e.tus > w.dl
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000
                  THEN w.s + e.cents
                  WHEN e.et = 'purchase' AND w.n > 0
                  THEN w.s END,
             -- the run id (anchor rn) this row belongs to
             CASE WHEN ((NOT w.in_run) OR e.tus > w.dl)
                       AND e.et = 'signup' THEN e.rn
                  WHEN (NOT w.in_run) OR e.tus > w.dl
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 25000
                  THEN w.anc
                  WHEN e.et = 'purchase' AND w.n > 0
                  THEN w.anc END
      FROM walk w JOIN ev e
        ON e.user_id = w.user_id AND e.rn = w.rn + 1
    ),
    m AS (
      SELECT user_id, row_anc AS mid, row_n AS n_fin, row_s AS s_fin
      FROM walk WHERE row_cls = 2
    ),
    out AS (
      SELECT w.user_id, w.tus, w.eid, w.row_cls, w.row_n, w.row_s,
             m.n_fin, m.s_fin
      FROM walk w JOIN m
        ON m.user_id = w.user_id AND w.row_anc = m.mid
      WHERE w.row_cls IS NOT NULL
    )
    {body}
"""


def _run_agg_rows_input(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "events")
        .filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & (F.col("value").isNull() | (F.abs("value") <= 1e9))
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )


@register(
    "cep_sql_run_agg_measures",
    oracle=_RUN_AGG_ROWS_ORACLE_TMPL.format(
        body="""
    SELECT user_id, make_timestamp(tus) AS ts, eid AS event_id,
           row_n AS n_so_far,
           CASE WHEN row_n > 0 THEN row_s END AS sum_so_far,
           s_fin AS total, n_fin AS n_total
    FROM out
    """
    ),
)
def cep_sql_run_agg_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FINAL vs RUNNING MEASURES composed with the DEFINE-aggregate
    path under ALL ROWS PER MATCH (round-9 verdict item 4 -- the last
    MATCH_RECOGNIZE semantics a SQL-standard user hits): PATTERN
    (A -> B+ -> C) WITHIN 7 DAYS with the sum-cap bind, emitting one
    row PER BOUND EVENT of each confirmed match.  RUNNING COUNT/SUM
    are the aggregate AT each row (0/NULL on the anchor -- SQL's
    aggregate-over-empty-set -- and == FINAL on the confirm row);
    FINAL COUNT/SUM repeat the whole-match value on every row.  Same
    advance_kleene_agg kernel, emit_rows face: WHICH matches emit is
    byte-identical to the ONE ROW mode, the flag only widens the
    emission to the buffered per-row records (state grows to
    O(rows-per-match), bounded by the WITHIN deadline -- the honest
    cost of FINAL semantics, which are unknowable until the match
    closes).  The oracle replays the walk with per-row running
    columns and joins emitted matches back to their rows by anchor-rn
    run id (never by anchor timestamp -- two same-ts anchors of one
    user would collide).

    100 TB shape: identical to cep_sql_run_agg_confirm -- predicates
    JVM-side into narrow booleans, ONE (user) shuffle into an
    O(rows-per-key) scan; output is ~match-length x larger than ONE
    ROW mode, which is the user's explicit ask with ALL ROWS."""
    out = match_recognize(
        _run_agg_rows_input(spark, sf_dir),
        """
        PATTERN ( A -> B+ -> C )
        WITHIN 7 DAYS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'view' AND SUM(B.cents) <= 25000,
               C AS event_type = 'purchase'
        MEASURES RUNNING COUNT(B.cents) AS n_so_far,
                 RUNNING SUM(B.cents) AS sum_so_far,
                 FINAL SUM(B.cents) AS total,
                 FINAL COUNT(B.cents) AS n_total
        ALL ROWS PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    )
    return out.select(
        F.col("key").alias("user_id"),
        "ts",
        "event_id",
        "n_so_far",
        "sum_so_far",
        "total",
        "n_total",
    )


@register(
    "cep_sql_run_agg_exclusion",
    oracle=_RUN_AGG_ROWS_ORACLE_TMPL.format(
        body="""
    SELECT user_id, make_timestamp(tus) AS ts, eid AS event_id,
           CASE row_cls WHEN 0 THEN 'A' WHEN 2 THEN 'C' END AS cls,
           n_fin AS n_b, s_fin AS total
    FROM out WHERE row_cls IN (0, 2)
    """
    ),
)
def cep_sql_run_agg_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{- B+ -} exclusion composed with the DEFINE-aggregate path
    (round-9 verdict item 5 -- the one dialect composition previously
    rejected): PATTERN (A -> {- B+ -} -> C) under ALL ROWS PER MATCH
    emits only each confirmed match's anchor and confirm rows -- the
    Kleene step still matches, still drives the sum-cap aggregate
    (FINAL measures see it), but its bound rows are omitted from the
    output (standard MATCH_RECOGNIZE exclusion semantics).  The
    emission filter is ONE shared helper (filter_excluded_rows) on
    the kernel's per-row records, applied identically by the batch
    and streaming faces -- measures are accumulated before the
    filter, so excluding B never changes their values (test-pinned
    against cep_sql_run_agg_measures).  CLASSIFIER() labels the
    surviving rows.

    100 TB shape: same single-shuffle scan as the measures key; the
    exclusion makes the OUTPUT 2 rows per match regardless of match
    length -- the cheap face of ALL ROWS."""
    out = match_recognize(
        _run_agg_rows_input(spark, sf_dir),
        """
        PATTERN ( A -> {- B+ -} -> C )
        WITHIN 7 DAYS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'view' AND SUM(B.cents) <= 25000,
               C AS event_type = 'purchase'
        MEASURES CLASSIFIER() AS cls,
                 FINAL COUNT(B.cents) AS n_b,
                 FINAL SUM(B.cents) AS total
        ALL ROWS PER MATCH
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    )
    return out.select(
        F.col("key").alias("user_id"),
        "ts",
        "event_id",
        "cls",
        "n_b",
        "total",
    )


@register(
    "cep_sql_run_agg_match_number",
    oracle=_RUN_AGG_ROWS_ORACLE_TMPL.format(
        body="""
    SELECT user_id,
           CAST(row_number() OVER (PARTITION BY user_id
                                   ORDER BY row_anc) AS BIGINT) AS mn,
           make_timestamp(tus) AS confirm_ts,
           row_n AS n_b, row_s AS total
    FROM walk WHERE row_cls = 2
    """
    ),
)
def cep_sql_run_agg_match_number(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MATCH_NUMBER() composed with the DEFINE-aggregate path (round
    9 — the last per-match function the run-agg kernel lacked): each
    key's confirmed matches number 1, 2, 3... in close order (SKIP
    PAST LAST ROW runs never overlap, so close order == anchor order
    == the standard's numbering).  The faces share ONE helper
    (assign_match_numbers): the batch face numbers from 0 per
    partition; the streaming face persists the counter in the state
    payload so numbers keep increasing across micro-batches —
    chunking-invariance holds because emission order is maturation
    order.  The honest stream cost: a key that ever matched keeps one
    tiny state row alive (the counter must survive idleness).  The
    oracle numbers the recursive walk's emission rows by the
    anchor-rn run id.

    100 TB shape: identical to cep_sql_run_agg_confirm plus one
    integer per emission — predicates JVM-side, ONE (user) shuffle,
    O(1) state + the counter."""
    out = match_recognize(
        _run_agg_rows_input(spark, sf_dir),
        """
        PATTERN ( A -> B+ -> C )
        WITHIN 7 DAYS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'view' AND SUM(B.cents) <= 25000,
               C AS event_type = 'purchase'
        MEASURES MATCH_NUMBER() AS mn,
                 C.ts AS confirm_ts,
                 COUNT(B.cents) AS n_b,
                 SUM(B.cents) AS total
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    )
    return out.select(
        F.col("key").alias("user_id"),
        "mn",
        "confirm_ts",
        "n_b",
        "total",
    )


_RUN_AGG_PEAK_ORACLE = """
    WITH RECURSIVE ev AS (
      SELECT user_id,
             coalesce(event_type, '') AS et,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) AS tus,
             -- coalesce(event_id, 0): the kernel faces map NULL
             -- event_id to 0 pre-sort; DuckDB's default is NULLS LAST
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, coalesce(event_id, 0)) AS rn
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND (value IS NULL OR abs(value) <= 1e9)
    ),
    mx AS (SELECT user_id, max(rn) AS mxrn FROM ev GROUP BY user_id),
    walk AS (
      -- state s = the run's MAX accumulator; bind (p/q = 1/2,
      -- cross-multiplied): 2*v >= max_run including v (v alone when
      -- the run is empty)
      SELECT user_id, 0 AS rn, FALSE AS in_run,
             CAST(0 AS BIGINT) AS n, CAST(0 AS BIGINT) AS s,
             CAST(NULL AS BIGINT) AS anchor, CAST(NULL AS BIGINT) AS dl,
             CAST(NULL AS BIGINT) AS em_anchor,
             CAST(NULL AS BIGINT) AS em_n, CAST(NULL AS BIGINT) AS em_s
      FROM mx
      UNION ALL
      SELECT w.user_id, e.rn,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN e.et = 'signup'
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents >=
                                CASE WHEN w.n = 0 THEN e.cents
                                     ELSE greatest(w.s, e.cents) END)
                  THEN FALSE
                  ELSE TRUE END,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND 2 * e.cents >=
                           CASE WHEN w.n = 0 THEN e.cents
                                ELSE greatest(w.s, e.cents) END
                  THEN w.n + 1
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(0 AS BIGINT)
                  ELSE w.n END,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND 2 * e.cents >=
                           CASE WHEN w.n = 0 THEN e.cents
                                ELSE greatest(w.s, e.cents) END
                  THEN CASE WHEN w.n = 0 THEN e.cents
                            ELSE greatest(w.s, e.cents) END
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(0 AS BIGINT)
                  ELSE w.s END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' THEN e.tus
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents >=
                                CASE WHEN w.n = 0 THEN e.cents
                                     ELSE greatest(w.s, e.cents) END)
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.anchor END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' THEN e.tus + 604800000000
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents >=
                                CASE WHEN w.n = 0 THEN e.cents
                                     ELSE greatest(w.s, e.cents) END)
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.dl END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0
                  THEN w.anchor
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents >=
                                CASE WHEN w.n = 0 THEN e.cents
                                     ELSE greatest(w.s, e.cents) END)
                       AND w.n > 0
                  THEN w.anchor END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0 THEN w.n
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents >=
                                CASE WHEN w.n = 0 THEN e.cents
                                     ELSE greatest(w.s, e.cents) END)
                       AND w.n > 0
                  THEN w.n END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0 THEN w.s
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents >=
                                CASE WHEN w.n = 0 THEN e.cents
                                     ELSE greatest(w.s, e.cents) END)
                       AND w.n > 0
                  THEN w.s END
      FROM walk w JOIN ev e
        ON e.user_id = w.user_id AND e.rn = w.rn + 1
    ),
    closes AS (
      SELECT user_id, em_anchor AS anchor, em_n AS n, em_s AS s
      FROM walk WHERE em_anchor IS NOT NULL
      UNION ALL
      SELECT w.user_id, w.anchor, w.n, w.s
      FROM walk w JOIN mx ON mx.user_id = w.user_id AND w.rn = mx.mxrn
      WHERE w.in_run AND w.n > 0
    )
    SELECT user_id, make_timestamp(anchor) AS anchor_ts,
           n AS n_b, s AS peak_cents
    FROM closes
"""


@register("cep_sql_run_agg_peak", oracle=_RUN_AGG_PEAK_ORACLE)
def cep_sql_run_agg_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MIN/MAX DEFINE-aggregate forms (round 9 — the last
    aggregate family the one-accumulator kernel lacked): PATTERN
    (A -> B+) WITHIN 7 DAYS where a view binds iff its cents stay
    within half of the run's RUNNING PEAK including itself
    (`B.cents >= 0.5 * MAX(B.cents)`) — the drawdown-bounded run
    every monitoring stack wants ("alert when the metric halves from
    its high").  The kernel's accumulator update is now a pluggable
    combine closure (sum by default, min/max here — one accumulator
    per run, the documented restriction, so forms cannot mix);
    MEASURES gains MAX(B.col)/MIN(B.col) mapped to the accumulator,
    and the factor stays an exact cross-multiplied fraction (0.5 =
    1/2 — never a float compare).  The oracle replays the walk with a
    greatest() accumulator.

    100 TB shape: identical to cep_sql_run_agg — predicates JVM-side,
    ONE (user) shuffle, O(1) state."""
    out = match_recognize(
        _run_agg_rows_input(spark, sf_dir),
        """
        PATTERN ( A -> B+ )
        WITHIN 7 DAYS
        DEFINE A AS event_type = 'signup',
               B AS event_type = 'view'
                    AND B.cents >= 0.5 * MAX(B.cents)
        AFTER MATCH SKIP PAST LAST ROW
        PARTITION BY user_id
        ORDER BY ts
        """,
    )
    return out.select(
        F.col("key").alias("user_id"),
        F.col("t_A").alias("anchor_ts"),
        F.col("B_count").alias("n_b"),
        F.col("B_max_cents").alias("peak_cents"),
    )


_MULTI_RULES_MIXED_ORACLE = """
    WITH RECURSIVE ev AS (
      SELECT user_id, coalesce(event_type, '') AS et,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) AS tus, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, coalesce(event_id, 0)) AS rn
      FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND (value IS NULL OR abs(value) <= 1e9)
    ),
    fun AS (
      SELECT v.user_id, v.event_id, v.tus AS t_v, min(c.tus) AS t_c
      FROM ev v JOIN ev c
        ON c.user_id = v.user_id AND c.et = 'click'
       AND c.tus > v.tus AND c.tus <= v.tus + 21600000000
      WHERE v.et = 'view'
      GROUP BY v.user_id, v.event_id, v.tus
    ),
    mx AS (SELECT user_id, max(rn) AS mxrn FROM ev GROUP BY user_id),
    walk AS (
      SELECT user_id, 0 AS rn, FALSE AS in_run,
             CAST(0 AS BIGINT) AS n, CAST(0 AS BIGINT) AS s,
             CAST(NULL AS BIGINT) AS anchor, CAST(NULL AS BIGINT) AS dl,
             CAST(NULL AS BIGINT) AS em_anchor,
             CAST(NULL AS BIGINT) AS em_n, CAST(NULL AS BIGINT) AS em_s
      FROM mx
      UNION ALL
      SELECT w.user_id, e.rn,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN e.et = 'signup'
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (w.s + e.cents <= 20000)
                  THEN FALSE
                  ELSE TRUE END,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 20000
                  THEN w.n + 1
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(0 AS BIGINT)
                  ELSE w.n END,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND w.s + e.cents <= 20000
                  THEN w.s + e.cents
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(0 AS BIGINT)
                  ELSE w.s END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' THEN e.tus
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (w.s + e.cents <= 20000)
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.anchor END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' THEN e.tus + 86400000000
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (w.s + e.cents <= 20000)
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.dl END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0
                  THEN w.anchor
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (w.s + e.cents <= 20000) AND w.n > 0
                  THEN w.anchor END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0 THEN w.n
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (w.s + e.cents <= 20000) AND w.n > 0
                  THEN w.n END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0 THEN w.s
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (w.s + e.cents <= 20000) AND w.n > 0
                  THEN w.s END
      FROM walk w JOIN ev e
        ON e.user_id = w.user_id AND e.rn = w.rn + 1
    ),
    closes AS (
      SELECT user_id, em_anchor AS anchor, em_n AS n, em_s AS s
      FROM walk WHERE em_anchor IS NOT NULL
      UNION ALL
      SELECT w.user_id, w.anchor, w.n, w.s
      FROM walk w JOIN mx ON mx.user_id = w.user_id AND w.rn = mx.mxrn
      WHERE w.in_run AND w.n > 0
    )
    SELECT user_id AS key, event_id AS anchor_id,
           make_timestamp(t_v) AS t_v, make_timestamp(t_c) AS t_c,
           CAST(NULL AS TIMESTAMP) AS t_a,
           CAST(NULL AS BIGINT) AS b_count,
           CAST(NULL AS BIGINT) AS b_sum_cents,
           'funnel' AS pattern_name
    FROM fun
    UNION ALL
    SELECT user_id, CAST(NULL AS BIGINT), CAST(NULL AS TIMESTAMP),
           CAST(NULL AS TIMESTAMP), make_timestamp(anchor), n, s,
           'spend_cap'
    FROM closes
"""


@register("cep_multi_rules_mixed", oracle=_MULTI_RULES_MIXED_ORACLE)
def cep_multi_rules_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIXED multi-query rule pack (round 11): one CHAIN rule and one
    RUNNING-AGGREGATE rule evaluated over ONE scan and — on a stream —
    ONE keyed state (advance_variants mode='all' multiplexes the chain
    NFA and the kleene-agg kernel side by side).  This is the shape a
    real alerting deployment runs: a funnel rule (view -> click WITHIN
    6 HOURS) next to a threshold rule (signup anchors a run of views
    while the RUNNING spend stays <= $200; the run closes on the
    breaking row, the deadline, or end-of-input).  Previously the pack
    rejected DEFINE-aggregate rules with a pointed error — the
    round-10 verdict's top feature order.

    Batch: each rule's proven compile path (join-agg chain /
    advance_kleene_agg applyInPandas) unioned with typed-NULL padding
    (union_label_pack); the run-agg rule's anchor_id is NULL — its
    ONE-ROW kernel record carries no anchor event id.  Streaming: one
    shuffle, one state entry per key, one Python call per micro-batch
    for BOTH rules; each keeps its own WITHIN deadline (per-spec
    bound_us and wakeup horizon).

    Oracle: UNION ALL of the funnel join-agg and the recursive-CTE
    replay of the sum-cap walk — each half the established oracle of
    its standalone family (cep_multi_pattern / cep_sql_run_agg).

    100 TB shape: the pack pays the scan, shuffle, and Python-boundary
    machinery ONCE for k rules; per-key state = one chain-partials
    list + one O(1) open-run slot, each bounded by its own WITHIN."""
    return match_recognize_all(
        _run_agg_rows_input(spark, sf_dir),
        [
            (
                "funnel",
                """
                PATTERN ( v -> c )
                WITHIN 6 HOURS
                DEFINE v AS event_type = 'view',
                       c AS event_type = 'click'
                PARTITION BY user_id
                ORDER BY ts
                """,
            ),
            (
                "spend_cap",
                """
                PATTERN ( a -> b+ )
                WITHIN 24 HOURS
                DEFINE a AS event_type = 'signup',
                       b AS event_type = 'view' AND SUM(b.cents) <= 20000
                AFTER MATCH SKIP PAST LAST ROW
                PARTITION BY user_id
                ORDER BY ts
                """,
            ),
        ],
    )


@register(
    "cep_sql_permute_confirm",
    oracle="""
    WITH cl AS (SELECT user_id, event_id, ts FROM events
                WHERE value >= 20),
         pu AS (SELECT user_id, event_id, ts FROM events
                WHERE value <= 60),
         er AS (SELECT user_id, ts FROM events
                WHERE event_type = 'error'),
         o1a AS (
           SELECT a.user_id, a.event_id, a.ts AS t_c, min(b.ts) AS t_p
           FROM cl a JOIN pu b ON b.user_id = a.user_id
                              AND b.ts > a.ts
                              AND b.ts <= a.ts + INTERVAL 12 HOUR
           GROUP BY a.user_id, a.event_id, a.ts),
         o1 AS (
           SELECT o1a.user_id, o1a.event_id, o1a.t_c, o1a.t_p,
                  min(e.ts) AS t_e
           FROM o1a JOIN er e ON e.user_id = o1a.user_id
                             AND e.ts > o1a.t_p
                             AND e.ts <= o1a.t_c + INTERVAL 12 HOUR
           GROUP BY o1a.user_id, o1a.event_id, o1a.t_c, o1a.t_p),
         o2a AS (
           SELECT a.user_id, a.event_id, a.ts AS t_p, min(b.ts) AS t_c
           FROM pu a JOIN cl b ON b.user_id = a.user_id
                              AND b.ts > a.ts
                              AND b.ts <= a.ts + INTERVAL 12 HOUR
           GROUP BY a.user_id, a.event_id, a.ts),
         o2 AS (
           SELECT o2a.user_id, o2a.event_id, o2a.t_c, o2a.t_p,
                  min(e.ts) AS t_e
           FROM o2a JOIN er e ON e.user_id = o2a.user_id
                             AND e.ts > o2a.t_c
                             AND e.ts <= o2a.t_p + INTERVAL 12 HOUR
           GROUP BY o2a.user_id, o2a.event_id, o2a.t_c, o2a.t_p),
         branches AS (
           SELECT user_id, event_id, t_c, t_p, t_e, 1 AS rk FROM o1
           UNION ALL
           SELECT user_id, event_id, t_c, t_p, t_e, 2 AS rk FROM o2),
         best AS (
           SELECT user_id, event_id,
                  min({'td': t_e, 'rk': rk, 'tc': t_c, 'tp': t_p,
                       'te': t_e}) AS m
           FROM branches GROUP BY user_id, event_id)
    SELECT user_id AS key, event_id AS anchor_id,
           m.tc AS t_C, m.tp AS t_P, m.te AS t_E,
           CASE WHEN m.rk = 1 THEN 'C->P' ELSE 'P->C' END
             AS permute_order
    FROM best
    """,
)
def cep_sql_permute_confirm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`PERMUTE(...) -> terminal` (round 11, verdict item 3): the
    trailing-terminal composition — the most common PERMUTE spelling
    after bare PERMUTE — previously a pointed error ("PERMUTE group
    must be the last element").  The n! expansion machinery composes
    naturally: each ordering variant keeps the suffix chain verbatim
    (`PERMUTE(C,P) -> E` expands to `C->P->E` and `P->C->E`), the
    completion time becomes the FINAL step of the whole pattern, and
    the suffix t_ columns ride the winner struct (different orderings
    may bind DIFFERENT confirm rows, so they are carried, never
    grouped on — the round-11 _compile_permute_batch change).
    OVERLAPPING step predicates (value >= 20 / value <= 60) make the
    two orderings share anchor events, so the (t_done, rank) winner
    pick is genuinely exercised.  Streaming rides the existing
    variant NFA (mode='earliest') untouched — its _td was already the
    last bound step.  The ≤3-step / 16-variant expansion cap stands.

    100 TB shape: n! (≤6) proven join-agg branches + ONE winner-pick
    groupBy on (key, anchor) — branch count fixed by the pattern."""
    events = table(spark, sf_dir, "events")
    return match_recognize(
        events,
        """
        PATTERN ( PERMUTE(C, P) -> E )
        WITHIN 12 HOURS
        DEFINE C AS value >= 20,
               P AS value <= 60,
               E AS event_type = 'error'
        PARTITION BY user_id
        ORDER BY ts
        """,
    )
