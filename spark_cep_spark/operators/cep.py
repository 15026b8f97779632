"""CEP pattern matching (SURVEY §2.10) — the "complex event" core.

Spark has no MATCH_RECOGNIZE; this module provides a Flink-CEP-shaped
`Pattern` builder that compiles to a batch DataFrame plan (this file)
and to a streaming NFA over applyInPandasWithState
(spark_cep_spark/streaming/nfa.py). The batch compiler is the
executable specification the NFA is property-tested against.

Semantics: skip-till-next-match with earliest-match policy — from each
anchor event, each subsequent step binds to the EARLIEST qualifying
event after the previous step and within the pattern's time bound.
This is deterministic (oracle-expressible as nested min-joins) and is
the standard relaxed-contiguity CEP semantics (cf. SASE/Flink-CEP
literature, HYPERSONIC [PAPERS.md:5]).

Scale: each step is an equi-join on the key column followed by a
min-aggregation over the match columns — shuffle on user key only, no
unbounded pair blowup beyond (anchors × step-candidates) within a key.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.operators.grouped import keyed_partition_apply
from spark_cep_spark.registry import register

# step-qualified column reference inside a correlation clause: `view.value`
_WHERE_REF = re.compile(r"\b([A-Za-z_]\w*)\.([A-Za-z_]\w*)\b")

# aggregate over a Kleene run's bound events: `max(err.value)` — the
# MATCH_RECOGNIZE aggregate-over-pattern-variable form. Only valid on
# one_or_more steps; plain steps are referenced directly.
_RUN_AGGS = ("first", "last", "min", "max", "sum", "avg", "count")
_AGG_REF = re.compile(
    r"\b(" + "|".join(_RUN_AGGS) + r")\s*\(\s*"
    r"([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*\)",
    re.I,
)


def _sub_agg_refs(expr: str) -> str:
    """Rewrite run-aggregate refs agg(K.col) → the carried
    _v_<K>_<agg>_<col> column (shared by where and measure
    translation; must run BEFORE the plain-ref pass)."""
    return _AGG_REF.sub(
        lambda mo: f"_v_{mo.group(2)}_{mo.group(1).lower()}_{mo.group(3)}",
        expr,
    )


def _translate_where_sql(where: str, cur_name: str) -> str:
    """Rewrite a correlation clause for the batch join condition:
    current-step refs → the candidate's _c_<col> columns, earlier-step
    refs → the carried _v_<step>_<col> columns, run aggregates → the
    carried _v_<step>_<agg>_<col> columns."""

    def repl(mo: re.Match) -> str:
        s, c = mo.group(1), mo.group(2)
        return f"_c_{c}" if s == cur_name else f"_v_{s}_{c}"

    return _WHERE_REF.sub(repl, _sub_agg_refs(where))


def _translate_measure_sql(expr: str) -> str:
    """Rewrite a MEASURES expression over the carried _v_ columns —
    every ref is to an already-bound step (validated by corr_plan)."""
    return _WHERE_REF.sub(
        lambda mo: f"_v_{mo.group(1)}_{mo.group(2)}", _sub_agg_refs(expr)
    )


@dataclass
class Step:
    name: str
    predicate: str  # SQL boolean expression over the event columns
    contiguity: str = "relaxed"  # relaxed | strict | absent
    where: str | None = None  # cross-step correlation (SASE-style); every
    # column ref must be step-qualified: "purchase.value > view.value"
    gap: str | None = None  # optional per-step max gap (SQL interval
    # body, e.g. "30 MINUTES"): this step's event must fall within gap
    # of the PREVIOUS step's binding — tighter than the whole-match
    # .within() bound. On an absent step the gap bounds the negation
    # window instead (no killer within gap of the last positive step).
    stream_predicate: str | None = None  # set by the SQL dialect when the
    # DEFINE entry uses PREV()/NEXT() row navigation: `predicate` then
    # references the batch-side pre-projected __nav_* lag/lead columns
    # (which do not exist on a stream), and this field holds the
    # navigation-free conjuncts the streaming m-flag projection uses.
    nav_py: object = None  # (fn, cur_cols, prev_cols, max_k) — the
    # Python twin of the navigation conjuncts, evaluated by the NFA
    # kernel against the key's previous physical rows (nav tail).


@dataclass
class Pattern:
    """Pattern.begin('v', "event_type='view'")
             .followed_by('c', "event_type='click'")
             .followed_by('p', "event_type='purchase'")
             .within('1 hour')

    Flink-CEP-shaped contiguity modes:
      followed_by    — relaxed (skip-till-next-match)
      next           — strict (the key's immediately-next event)
      not_followed_by — terminal negation (no qualifying event within
                        the bound; must be the last step)
    """

    steps: list[Step] = field(default_factory=list)
    time_bound: str | None = None  # SQL interval literal body, e.g. "1 HOUR"
    measures: list = field(default_factory=list)  # [(alias, expr)], see measure()
    subsets: dict = field(default_factory=dict)  # {union var: [member steps]}

    @staticmethod
    def begin(name: str, predicate: str) -> "Pattern":
        return Pattern(steps=[Step(name, predicate)])

    def followed_by(
        self,
        name: str,
        predicate: str,
        where: str | None = None,
        gap: str | None = None,
    ) -> "Pattern":
        """Relaxed contiguity. `where` adds a SASE-style cross-step
        correlation clause evaluated at bind time — a SQL boolean over
        STEP-QUALIFIED column refs only, e.g.
        "click.value > 2 * view.value" (current step's columns
        qualified by its own name; earlier steps' by theirs). The step
        binds the earliest event satisfying predicate AND where.
        Restricted grammar (so batch SQL and the streaming kernel agree):
        comparisons, arithmetic, AND/OR/NOT, abs() — no SQL functions,
        no BETWEEN/LIKE/IN. NULL in any comparison → not satisfied.
        `gap` (SQL interval body, e.g. "30 MINUTES") additionally
        requires this step's event within gap of the previous step's
        binding — the per-transition deadline Esper/Siddhi expose,
        tighter than the whole-match .within()."""
        self.steps.append(Step(name, predicate, where=where, gap=gap))
        return self

    def next(
        self,
        name: str,
        predicate: str,
        where: str | None = None,
        gap: str | None = None,
    ) -> "Pattern":
        """Strict contiguity: binds only if the key's IMMEDIATELY next
        event (by (ts, id) order) satisfies the predicate (AND the
        correlation clause, if given) — otherwise the partial dies.
        With `gap`, the next event must also fall within gap of the
        previous binding or the partial dies."""
        self.steps.append(
            Step(name, predicate, contiguity="strict", where=where, gap=gap)
        )
        return self

    def not_followed_by(
        self,
        name: str,
        predicate: str,
        where: str | None = None,
        gap: str | None = None,
    ) -> "Pattern":
        """Terminal negation: the partial match survives only if NO
        qualifying event (predicate AND where) follows within the
        time bound. With `gap`, the negation window is narrowed to
        (t_last, t_last + gap] ∩ (t_last, t_anchor + bound] — 'no B
        within 30 minutes OF THE LAST STEP', the timeout-detection
        shape."""
        self.steps.append(
            Step(name, predicate, contiguity="absent", where=where, gap=gap)
        )
        return self

    def times(
        self, name: str, predicate: str, n: int, contiguity: str = "relaxed"
    ) -> "Pattern":
        """Bounded repetition (Flink-CEP `times(n)`): the step must
        match n times. Compiles by EXPANSION into n sub-steps
        `name_1..name_n` (each a timestamp column in the output), so
        both engines — batch plan and streaming NFA — inherit it with
        zero new kernel code. contiguity='relaxed' binds the n earliest
        qualifying events in order; 'strict' requires the n events to be
        the key's immediately-consecutive events (a bounded Kleene run:
        the run's ENTRY is relaxed — like one_or_more and Flink's
        times(n).consecutive() — then events 2..n must each be the
        key's immediately-next event. Round-4 review: the first
        sub-step previously inherited strict contiguity against the
        PREVIOUS pattern step, wrongly demanding the run start
        immediately after it).
        """
        if n < 1:
            raise ValueError(f"times(n) needs n >= 1, got {n}")
        if contiguity not in ("relaxed", "strict"):
            raise ValueError(f"times contiguity must be relaxed|strict: {contiguity}")
        for i in range(1, n + 1):
            step_contig = "relaxed" if i == 1 else contiguity
            self.steps.append(Step(f"{name}_{i}", predicate, step_contig))
        return self

    def one_or_more(self, name: str, predicate: str) -> "Pattern":
        """Greedy Kleene-plus (Flink-CEP `oneOrMore`): binds the
        EARLIEST qualifying event after the previous step, then
        greedily consumes the maximal run of IMMEDIATELY-CONSECUTIVE
        further matching events (truncated at the pattern bound). An
        event consumed by the run is not available to later steps —
        greedy-run-wins, the standard policy. Contributes THREE output
        columns: t_<name>_first, t_<name>_last, <name>_count. Cannot be
        the first step (the anchor fixes the time window)."""
        if not self.steps:
            raise ValueError("one_or_more cannot be the first step")
        self.steps.append(Step(name, predicate, contiguity="kleene"))
        return self

    def within(self, bound: str) -> "Pattern":
        self.time_bound = bound
        return self

    def subset(self, name: str, members: list[str]) -> "Pattern":
        """MATCH_RECOGNIZE SUBSET clause: declare a union pattern
        variable over existing steps, usable in MEASURES with the run
        aggregates — first/last/min/max/sum(U.col). Declare subsets
        BEFORE the measures that reference them; expansion happens at
        measure() time, so both engines (batch SQL and the streaming
        NFA) see only ordinary step-qualified refs.

        Expansion semantics (members in pattern order): first/last
        take the first/last member's value (first(K.col)/last(K.col)
        for a kleene member), sum adds the members' contributions,
        min/max fold through least()/greatest() (NULL-skipping on both
        engines). count/avg are rejected with a pointed error —
        compose count(member.col) instead. NULL note: sum propagates
        NULL from any member (engine arithmetic), unlike row-wise SQL
        sum which skips NULL rows — document'd deviation, identical
        across BOTH engines here."""
        if not re.match(r"^[A-Za-z_]\w*$", name):
            raise ValueError(f"bad subset name: {name!r}")
        step_names = [st.name for st in self.steps]
        if name in step_names or name in self.subsets:
            raise ValueError(
                f"subset name '{name}' collides with a step/subset"
            )
        if not members:
            raise ValueError(f"subset '{name}' needs at least one member")
        kinds = {st.name: st.contiguity for st in self.steps}
        for m in members:
            if m not in step_names:
                raise ValueError(
                    f"subset '{name}' member '{m}' is not a declared step"
                )
            if kinds[m] == "absent":
                raise ValueError(
                    f"subset '{name}' member '{m}' is negated — it "
                    "never binds an event"
                )
        # pattern order, duplicates rejected
        if len(set(members)) != len(members):
            raise ValueError(f"subset '{name}' lists a member twice")
        self.subsets[name] = sorted(members, key=step_names.index)
        return self

    def _expand_subset_refs(self, expr: str, desc: str) -> str:
        """Rewrite agg(U.col) over subset vars into member-expressed
        aggregates (see subset()); bare U.col refs are rejected."""
        if not self.subsets:
            return expr
        kinds = {st.name: st.contiguity for st in self.steps}

        def member_term(m: str, agg: str, col: str) -> str:
            if kinds[m] == "kleene":
                return f"{agg}({m}.{col})"
            return f"{m}.{col}"

        def repl(mo: re.Match) -> str:
            agg, u, col = mo.group(1).lower(), mo.group(2), mo.group(3)
            if u not in self.subsets:
                return mo.group(0)
            ms = self.subsets[u]
            if agg in ("count", "avg"):
                raise ValueError(
                    f"{desc}: {agg}({u}.{col}) — count/avg over a "
                    "SUBSET are not supported; compose "
                    f"count(<member>.{col}) per member instead"
                )
            if agg == "first":
                return member_term(ms[0], "first", col)
            if agg == "last":
                return member_term(ms[-1], "last", col)
            terms = [member_term(m, agg, col) for m in ms]
            if len(terms) == 1:
                return terms[0]
            if agg == "sum":
                return "(" + " + ".join(terms) + ")"
            fn = "least" if agg == "min" else "greatest"
            return f"{fn}(" + ", ".join(terms) + ")"

        out = _AGG_REF.sub(repl, expr)
        # any remaining bare subset ref is an error (a union var has
        # no single value)
        for mo in _WHERE_REF.finditer(_AGG_REF.sub(" ", out)):
            if mo.group(1) in self.subsets:
                raise ValueError(
                    f"{desc} references subset '{mo.group(1)}' without "
                    "an aggregate (use first/last/min/max/sum)"
                )
        return out

    def measure(self, alias: str, expr: str) -> "Pattern":
        """MATCH_RECOGNIZE-style MEASURES projection: an output column
        `alias` computed from bound events' values, e.g.
        measure("uplift", "purchase.value - view.value"). Same
        restricted, fully step-qualified grammar as `where=`; may
        reference any positive non-kleene step (including the last).
        Both engines emit it: batch computes over the carried _v_
        columns, the streaming NFA over the match's env of bound
        values."""
        if not re.match(r"^[A-Za-z_]\w*$", alias):
            raise ValueError(f"bad measure alias: {alias!r}")
        self.measures.append(
            (alias, self._expand_subset_refs(expr, f"measure {alias!r}"))
        )
        return self

    def corr_plan(self) -> dict:
        """Parse + validate every step's correlation clause (shared by
        the batch compiler and the streaming NFA, so both enforce
        identical rules). Returns:
          wheres   — [str | None] per step
          cur_refs — [set of cols referencing the step's own event]
          refs     — {earlier step name: sorted cols later wheres read}
                     (these values must be CARRIED through the match)
          all_cols — sorted union of every referenced column
        """
        names = [s.name for s in self.steps]
        if len(set(names)) != len(names):
            dup = sorted({n for n in names if names.count(n) > 1})
            raise ValueError(
                f"duplicate step name(s) {dup}: step names must be "
                "unique — refs resolve by name, and duplicate names "
                "silently bind to the first occurrence"
            )
        kinds = {s.name: s.contiguity for s in self.steps}
        wheres: list = []
        cur_refs: list = []
        refs: dict[str, set] = {}
        run_refs: dict[str, set] = {}
        _ALLOWED_BARE = {
            "and", "or", "not", "abs", "true", "false",
            "least", "greatest",  # subset min/max expansion targets
        }

        def _scan(expr: str, desc: str, i_pos: int | None, cur_name: str | None):
            """Collect refs of one where/measure expression. i_pos set
            (a where): refs must target the current or earlier steps;
            None (a measure): any positive step. Returns the current-
            step cols (wheres only)."""
            cur: set = set()
            for agg, ref_step, col in _AGG_REF.findall(expr):
                if ref_step not in names:
                    raise ValueError(f"unknown step '{ref_step}' in {desc}")
                if kinds[ref_step] != "kleene":
                    raise ValueError(
                        f"{desc}: {agg}({ref_step}.{col}) aggregates a "
                        f"non-one_or_more step — reference "
                        f"{ref_step}.{col} directly"
                    )
                if i_pos is not None and names.index(ref_step) >= i_pos:
                    raise ValueError(
                        f"{desc} references step '{ref_step}' that is "
                        "not strictly earlier"
                    )
                run_refs.setdefault(ref_step, set()).add((agg.lower(), col))
            stripped = _AGG_REF.sub(" ", expr)
            for ref_step, col in _WHERE_REF.findall(stripped):
                if ref_step not in names:
                    raise ValueError(
                        f"unknown step '{ref_step}' in {desc} (all "
                        "column refs must be step-qualified)"
                    )
                if i_pos is not None and names.index(ref_step) > i_pos:
                    raise ValueError(
                        f"{desc} references later step '{ref_step}'"
                    )
                if ref_step == cur_name:
                    cur.add(col)
                    continue
                if kinds[ref_step] == "kleene":
                    raise ValueError(
                        f"{desc} references one_or_more step "
                        f"'{ref_step}' without an aggregate (a run has "
                        "no single value — use first/last/min/max/sum/"
                        "avg/count(step.col))"
                    )
                if kinds[ref_step] == "absent":
                    raise ValueError(
                        f"{desc} references negated step '{ref_step}' "
                        "(it never binds an event)"
                    )
                refs.setdefault(ref_step, set()).add(col)
            # any bare identifier left after stripping refs is a
            # misspelled/unqualified column — fail at compile, not run
            residue = _WHERE_REF.sub(" ", stripped)
            for tok in re.findall(r"[A-Za-z_]\w*", residue):
                if tok.lower() not in _ALLOWED_BARE:
                    raise ValueError(
                        f"unqualified identifier '{tok}' in {desc} — "
                        "qualify every column as <step>.<col>"
                    )
            return cur

        for i, s in enumerate(self.steps):
            wheres.append(s.where)
            if s.where is None:
                cur_refs.append(set())
                continue
            if s.contiguity == "kleene":
                raise ValueError(
                    f"one_or_more step '{s.name}' cannot carry a "
                    "correlation clause (a run has no single value)"
                )
            if i == 0:
                raise ValueError(
                    "the anchor step cannot correlate (fold the "
                    "condition into its predicate)"
                )
            cur_refs.append(_scan(s.where, f"where of '{s.name}'", i, s.name))
        # MEASURES refs: any positive non-kleene step (incl. the last);
        # their values join the carry set exactly like where-refs
        reserved = {"key", "anchor_id"}
        for s in self.steps:
            reserved |= {
                f"t_{s.name}",
                f"id_{s.name}",
                f"t_{s.name}_first",
                f"t_{s.name}_last",
                f"id_{s.name}_first",
                f"id_{s.name}_last",
                f"{s.name}_count",
            }
        for alias, expr in self.measures:
            if alias in reserved:
                raise ValueError(
                    f"measure alias {alias!r} collides with an output column"
                )
            _scan(expr, f"measure {alias!r}", None, None)
        # carried-column names are underscore-joined (_v_<step>[_<agg>]
        # _<col>) — different (step, agg, col) splits can produce the
        # SAME string (step 'err' + max(value) vs step 'err_max' +
        # value). Fail at compile time instead of a silent misread.
        carried = [
            f"_v_{s}_{c}" for s, cols in refs.items() for c in sorted(cols)
        ] + [
            f"_v_{s}_{a}_{c}"
            for s, acs in run_refs.items()
            for a, c in sorted(acs)
        ]
        if len(set(carried)) != len(carried):
            dup = sorted({n for n in carried if carried.count(n) > 1})
            raise ValueError(
                f"carried-column name collision {dup}: rename the "
                "involved step or column (underscore-joined hidden "
                "columns must be unique)"
            )
        return {
            "wheres": wheres,
            "cur_refs": cur_refs,
            "refs": {k: sorted(v) for k, v in refs.items()},
            "run_refs": {k: sorted(v) for k, v in run_refs.items()},
            "all_cols": sorted(
                set().union(
                    *cur_refs,
                    *[set(v) for v in refs.values()],
                    *[{c for _a, c in v} for v in run_refs.values()],
                )
            ),
        }

    # -- batch compiler ----------------------------------------------------
    def compile_batch(
        self,
        events: DataFrame,
        key_col: str = "user_id",
        time_col: str = "ts",
        id_col: str = "event_id",
        emit_ids: bool = False,
    ) -> DataFrame:
        """Compile to a batch DataFrame of matches.

        Output: (key, anchor_id, t_<step> for every step) — one row per
        anchor event that completes the whole sequence. emit_ids=True
        adds id_<step> columns naming the exact event each step bound
        (deterministic min-(ts, id) tie-break, matching the streaming
        NFA) — the exact join-back handle when timestamps tie.

        Correlation (`where` on a step): values a later step reads are
        carried as hidden _v_<step>_<col> columns; a referenced step
        binds via the lexicographic (ts, event_id) struct-min so the
        carried value is the one deterministic tie-break winner — the
        same event the streaming NFA binds.
        """
        if not self.steps:
            raise ValueError("empty pattern")
        if self.time_bound is None:
            raise ValueError("pattern needs .within(bound) for bounded state")
        for s in self.steps[:-1]:
            if s.contiguity == "absent":
                raise ValueError("not_followed_by must be the last step")
        if self.steps[0].contiguity != "relaxed":
            raise ValueError("pattern must start with begin()")
        corr = self.corr_plan()
        refs = corr["refs"]  # step name -> cols later wheres read

        bound = F.expr(f"INTERVAL {self.time_bound}")
        has_strict = any(s.contiguity == "strict" for s in self.steps)
        has_kleene = any(s.contiguity == "kleene" for s in self.steps)
        if self.steps[0].contiguity == "kleene":
            raise ValueError("one_or_more cannot be the first step")
        if has_strict or has_kleene:
            # Strict contiguity and Kleene runs need each event's
            # per-key sequence number — ONE window shuffle on the key,
            # shared by every step of the pattern.
            rn = F.row_number().over(
                # NULL id ties sort as 0 — the streaming kernel's and
                # the DuckDB oracles' convention (coalesce(event_id,0));
                # Spark's bare NULLS-FIRST would flip the tie order
                W.partitionBy(key_col).orderBy(
                    time_col, F.coalesce(F.col(id_col), F.lit(0))
                )
            )
            events = events.withColumn("_rn", rn)

        first = self.steps[0]
        sel = [
            F.col(key_col).alias("key"),
            F.col(id_col).alias("anchor_id"),
            F.col(time_col).alias(f"t_{first.name}"),
        ]
        if emit_ids:
            sel.append(F.col(id_col).alias(f"id_{first.name}"))
        for c in refs.get(first.name, []):
            sel.append(F.col(c).alias(f"_v_{first.name}_{c}"))
        if has_strict:
            sel.append(F.col("_rn").alias("_prev_rn"))
        cur = events.filter(F.expr(first.predicate)).select(*sel)
        t_anchor = f"t_{first.name}"
        prev_t = t_anchor
        for idx, step in enumerate(self.steps[1:], start=1):
            in_bound = F.col("cand_ts") <= F.col(t_anchor) + bound
            if step.contiguity == "kleene":
                # Maximal consecutive runs = gaps-and-islands over the
                # predicate's events; entry = earliest member after the
                # previous binding, run = the island suffix from there,
                # truncated at the anchor bound.
                raggs = [
                    (a, c)
                    for a, c in corr["run_refs"].get(step.name, [])
                ]  # aggregates later wheres/measures read off this run
                rcols = sorted({c for _a, c in raggs})
                w_m = W.partitionBy("cand_key").orderBy("cand_ts", "cand_rn")
                mem_sel = [
                    F.col(key_col).alias("cand_key"),
                    F.col(time_col).alias("cand_ts"),
                    F.col("_rn").alias("cand_rn"),
                ]
                if emit_ids:
                    mem_sel.append(F.col(id_col).alias("cand_eid"))
                mem_sel += [F.col(c).alias(f"_c_{c}") for c in rcols]
                mem = (
                    events.filter(F.expr(step.predicate))
                    .select(*mem_sel)
                    .withColumn(
                        "isl", F.col("cand_rn") - F.row_number().over(w_m)
                    )
                )
                group_cols = cur.columns
                entry_cond = (
                    (F.col("key") == F.col("cand_key"))
                    & (F.col("cand_ts") > F.col(prev_t))
                    & in_bound
                )
                struct_cols = ["cand_ts", "cand_rn"] + (
                    ["cand_eid"] if emit_ids else []
                )
                # run-member values trail the unique (ts, rn) prefix in
                # both structs: _e carries the run's FIRST values, _l
                # its LAST — they never influence which row wins
                val_fields = [F.col(f"_c_{c}").alias(f"v_{c}") for c in rcols]
                entry = (
                    cur.join(mem, entry_cond)
                    .groupBy(*group_cols)
                    .agg(
                        F.min(
                            F.struct(
                                *[F.col(x) for x in struct_cols],
                                F.col("isl"),
                                *val_fields,
                            )
                        ).alias("_e")
                    )
                )
                run_cond = (
                    (F.col("key") == F.col("cand_key"))
                    & (F.col("isl") == F.col("_e.isl"))
                    & (F.col("cand_rn") >= F.col("_e.cand_rn"))
                    & in_bound
                )
                agg_exprs = [
                    F.max(
                        F.struct(*[F.col(x) for x in struct_cols], *val_fields)
                    ).alias("_l"),
                    F.count(F.lit(1)).alias(f"{step.name}_count"),
                ]
                run_v_cols: list[str] = []
                for a, c in raggs:
                    if a in ("first", "last"):
                        continue  # extracted from _e/_l below
                    vname = f"_v_{step.name}_{a}_{c}"
                    agg_exprs.append(getattr(F, a)(F.col(f"_c_{c}")).alias(vname))
                    run_v_cols.append(vname)
                cur = (
                    entry.join(mem, run_cond)
                    .groupBy(*group_cols, "_e")
                    .agg(*agg_exprs)
                    .withColumn(f"t_{step.name}_first", F.col("_e.cand_ts"))
                    .withColumn(f"t_{step.name}_last", F.col("_l.cand_ts"))
                )
                for a, c in raggs:
                    if a in ("first", "last"):
                        vname = f"_v_{step.name}_{a}_{c}"
                        src = "_e" if a == "first" else "_l"
                        cur = cur.withColumn(vname, F.col(f"{src}.v_{c}"))
                        run_v_cols.append(vname)
                id_cols = []
                if emit_ids:
                    cur = cur.withColumn(
                        f"id_{step.name}_first", F.col("_e.cand_eid")
                    ).withColumn(f"id_{step.name}_last", F.col("_l.cand_eid"))
                    id_cols = [f"id_{step.name}_first", f"id_{step.name}_last"]
                if has_strict:
                    cur = cur.drop("_prev_rn").withColumn(
                        "_prev_rn", F.col("_l.cand_rn")
                    )
                cur = cur.drop("_e", "_l")
                # column order: first/last/count(/ids) as documented
                cur = cur.select(
                    *[c for c in group_cols if c != "_prev_rn"],
                    *(["_prev_rn"] if has_strict else []),
                    f"t_{step.name}_first",
                    f"t_{step.name}_last",
                    f"{step.name}_count",
                    *id_cols,
                    *run_v_cols,
                )
                prev_t = f"t_{step.name}_last"
                continue
            carried = refs.get(step.name, [])  # cols later steps read
            cand_sel = [
                F.col(key_col).alias("cand_key"),
                F.col(time_col).alias("cand_ts"),
            ]
            if has_strict:
                cand_sel.append(F.col("_rn").alias("cand_rn"))
            if emit_ids or carried:
                cand_sel.append(F.col(id_col).alias("cand_eid"))
            for c in sorted(set(corr["cur_refs"][idx]) | set(carried)):
                cand_sel.append(F.col(c).alias(f"_c_{c}"))
            cand = events.filter(F.expr(step.predicate)).select(*cand_sel)
            if step.contiguity == "strict":
                cond = (
                    (F.col("key") == F.col("cand_key"))
                    & (F.col("cand_rn") == F.col("_prev_rn") + 1)
                    & in_bound
                )
            else:
                cond = (
                    (F.col("key") == F.col("cand_key"))
                    & (F.col("cand_ts") > F.col(prev_t))
                    & in_bound
                )
            if step.gap is not None:
                # per-transition deadline: within gap of the previous
                # step's binding (for absent: narrows the kill window)
                cond = cond & (
                    F.col("cand_ts")
                    <= F.col(prev_t) + F.expr(f"INTERVAL {step.gap}")
                )
            if step.where:
                cond = cond & F.expr(_translate_where_sql(step.where, step.name))
            if step.contiguity == "absent":
                # survives only if no qualifying follower exists
                cur = cur.join(cand, cond, "left_anti")
                break  # validated: absent is terminal
            group_cols = cur.columns
            if has_strict or emit_ids or carried:
                # earliest-match policy via lexicographic struct-min:
                # (ts, rn) min ≡ min ts with deterministic tie-break
                # (rn order == (ts, id) order); cand_eid rides along to
                # name the bound event when emit_ids; carried values
                # trail the (unique) (ts, rn/eid) prefix, so they never
                # influence WHICH event wins — they are the winner's
                struct_cols = (
                    [F.col("cand_ts")]
                    + ([F.col("cand_rn")] if has_strict else [])
                    + (
                        # eid0 = coalesce(id, 0) ORDERS the tie (the
                        # kernel/oracle NULL->0 convention — Spark's
                        # struct compare sorts a NULL field FIRST,
                        # DuckDB's LAST); the raw cand_eid after it
                        # only NAMES the winner (round-8 parity catch)
                        [
                            F.coalesce(F.col("cand_eid"), F.lit(0)).alias(
                                "eid0"
                            ),
                            F.col("cand_eid"),
                        ]
                        if (emit_ids or carried)
                        else []
                    )
                    + [F.col(f"_c_{c}").alias(f"v_{c}") for c in carried]
                )
                cur = (
                    cur.join(cand, cond)
                    .groupBy(*group_cols)
                    .agg(F.min(F.struct(*struct_cols)).alias("_m"))
                    .withColumn(f"t_{step.name}", F.col("_m.cand_ts"))
                )
                if emit_ids:
                    cur = cur.withColumn(
                        f"id_{step.name}", F.col("_m.cand_eid")
                    )
                for c in carried:
                    cur = cur.withColumn(
                        f"_v_{step.name}_{c}", F.col(f"_m.v_{c}")
                    )
                if has_strict:
                    cur = (
                        cur.withColumn("_next_rn", F.col("_m.cand_rn"))
                        .drop("_m", "_prev_rn")
                        .withColumnRenamed("_next_rn", "_prev_rn")
                    )
                else:
                    cur = cur.drop("_m")
            else:
                cur = (
                    cur.join(cand, cond)
                    # earliest-match policy: bind the first qualifying event
                    .groupBy(*group_cols)
                    .agg(F.min("cand_ts").alias(f"t_{step.name}"))
                )
            prev_t = f"t_{step.name}"
        for alias, expr in self.measures:
            cur = cur.withColumn(alias, F.expr(_translate_measure_sql(expr)))
        internal = [
            c for c in cur.columns if c.startswith("_v_") or c == "_prev_rn"
        ]
        return cur.drop(*internal) if internal else cur


# ---------------------------------------------------------------------------
# Registered CEP queries over the events fixture


@register(
    "cep_seq",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
         s2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_view, min(c.ts) AS t_click
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
           GROUP BY v.user_id, v.event_id, v.ts
         ),
         s3 AS (
           SELECT s2.user_id, s2.event_id, s2.t_view, s2.t_click, min(p.ts) AS t_purchase
           FROM s2 JOIN p ON p.user_id = s2.user_id
                         AND p.ts > s2.t_click AND p.ts <= s2.t_view + INTERVAL 24 HOUR
           GROUP BY s2.user_id, s2.event_id, s2.t_view, s2.t_click
         )
    SELECT user_id AS key, event_id AS anchor_id, t_view, t_click, t_purchase
    FROM s3
    """,
)
def cep_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel detection: view → click → purchase within 24h per user,
    via the Pattern builder's batch compiler."""
    events = table(spark, sf_dir, "events")
    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by("purchase", "event_type = 'purchase'")
        .within("24 HOURS")
    )
    return pat.compile_batch(events)


@register(
    "cep_seq_ids",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
         s2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_view,
                  min({'ts': c.ts, 'id0': coalesce(c.event_id, 0), 'id': c.event_id}) AS mc
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
           GROUP BY v.user_id, v.event_id, v.ts
         ),
         s3 AS (
           SELECT s2.user_id, s2.event_id, s2.t_view, s2.mc,
                  min({'ts': p.ts, 'id0': coalesce(p.event_id, 0), 'id': p.event_id}) AS mp
           FROM s2 JOIN p ON p.user_id = s2.user_id
                         AND p.ts > s2.mc.ts AND p.ts <= s2.t_view + INTERVAL 24 HOUR
           GROUP BY s2.user_id, s2.event_id, s2.t_view, s2.mc
         )
    SELECT user_id AS key, event_id AS anchor_id,
           t_view, event_id AS id_view,
           mc.ts AS t_click, mc.id AS id_click,
           mp.ts AS t_purchase, mp.id AS id_purchase
    FROM s3
    """,
)
def cep_seq_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cep_seq with per-step EVENT-ID capture (emit_ids=True): each
    id_<step> column names the exact event the step bound, under the
    deterministic lexicographic-(ts, event_id) earliest-match policy —
    the exact join-back-to-attributes handle when timestamps tie.
    Oracle: DuckDB min over a named struct {'ts','id0','id'} is the
    same lexicographic min as Spark's min(struct(ts, eid0, id)) —
    id0 = coalesce(id, 0) carries the tie so a NULL id orders as 0
    on both engines (round-8 NULL-tie sweep)."""
    events = table(spark, sf_dir, "events")
    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by("purchase", "event_type = 'purchase'")
        .within("24 HOURS")
    )
    return pat.compile_batch(events, emit_ids=True)


@register(
    "cep_seq_corr",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
         s2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_view, v.value AS v_view,
                  min({'ts': c.ts, 'id0': coalesce(c.event_id, 0), 'id': c.event_id, 'v': c.value}) AS mc
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
           GROUP BY v.user_id, v.event_id, v.ts, v.value
         ),
         s3 AS (
           SELECT s2.user_id, s2.event_id, s2.t_view, s2.mc, min(p.ts) AS t_purchase
           FROM s2 JOIN p ON p.user_id = s2.user_id
                         AND p.ts > s2.mc.ts AND p.ts <= s2.t_view + INTERVAL 24 HOUR
                         AND p.value > s2.v_view AND p.value > s2.mc.v
           GROUP BY s2.user_id, s2.event_id, s2.t_view, s2.mc
         )
    SELECT user_id AS key, event_id AS anchor_id,
           t_view, mc.ts AS t_click, t_purchase
    FROM s3
    """,
)
def cep_seq_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SASE-style cross-step value correlation: the funnel completes
    only with a purchase whose value exceeds BOTH the anchor view's
    and the bound click's value. Earlier-step values are carried
    through the match (hidden _v_ columns batch-side, the env dict in
    the streaming NFA); the referenced click binds via the
    deterministic (ts, event_id) struct-min so the carried value is
    well-defined under timestamp ties. Oracle carries the same values
    through DuckDB named-struct mins."""
    events = table(spark, sf_dir, "events")
    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by(
            "purchase",
            "event_type = 'purchase'",
            where="purchase.value > view.value AND purchase.value > click.value",
        )
        .within("24 HOURS")
    )
    return pat.compile_batch(events)


@register(
    "cep_seq_measures",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'),
         s2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_view, v.value AS v_view,
                  min({'ts': c.ts, 'id0': coalesce(c.event_id, 0), 'id': c.event_id, 'v': c.value}) AS mc
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
           GROUP BY v.user_id, v.event_id, v.ts, v.value
         ),
         s3 AS (
           SELECT s2.user_id, s2.event_id, s2.t_view, s2.v_view, s2.mc,
                  min({'ts': p.ts, 'id0': coalesce(p.event_id, 0), 'id': p.event_id, 'v': p.value}) AS mp
           FROM s2 JOIN p ON p.user_id = s2.user_id
                         AND p.ts > s2.mc.ts AND p.ts <= s2.t_view + INTERVAL 24 HOUR
                         AND p.value > s2.v_view
           GROUP BY s2.user_id, s2.event_id, s2.t_view, s2.v_view, s2.mc
         )
    SELECT user_id AS key, event_id AS anchor_id,
           t_view, mc.ts AS t_click, mp.ts AS t_purchase,
           mp.v - v_view AS uplift, mc.v AS click_val
    FROM s3
    """,
)
def cep_seq_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style MEASURES projection: the correlated funnel
    additionally emits computed columns from the bound events' values
    (uplift = purchase minus view value; the bound click's value).
    Values are carried through the match (hidden _v_ columns / NFA
    env); the measure-referenced purchase step binds via the
    deterministic (ts, event_id) struct-min so the emitted value is
    exact under ties — mirrored in the oracle's named-struct mins."""
    events = table(spark, sf_dir, "events")
    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by(
            "purchase",
            "event_type = 'purchase'",
            where="purchase.value > view.value",
        )
        .within("24 HOURS")
        .measure("uplift", "purchase.value - view.value")
        .measure("click_val", "click.value")
    )
    return pat.compile_batch(events)


@register(
    "cep_absence",
    oracle="""
    SELECT s.user_id, s.event_id AS signup_id, s.ts AS signup_ts
    FROM events s
    WHERE s.event_type = 'signup'
      AND NOT EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase'
          AND p.user_id = s.user_id
          AND p.ts > s.ts AND p.ts <= s.ts + INTERVAL 7 DAY
      )
    """,
)
def cep_absence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negation pattern: signup NOT followed by purchase within 7 days.
    Batch encoding: left-anti join with time predicate; streaming
    encoding: per-key state + event-time timer (streaming/nfa.py)."""
    e = table(spark, sf_dir, "events")
    s = e.filter(F.col("event_type") == "signup").alias("s")
    p = e.filter(F.col("event_type") == "purchase").alias("p")
    return (
        s.join(
            p,
            (F.col("p.user_id") == F.col("s.user_id"))
            & (F.col("p.ts") > F.col("s.ts"))
            & (F.col("p.ts") <= F.col("s.ts") + F.expr("INTERVAL 7 DAYS")),
            "left_anti",
        )
        .select(
            F.col("s.user_id").alias("user_id"),
            F.col("s.event_id").alias("signup_id"),
            F.col("s.ts").alias("signup_ts"),
        )
    )


@register(
    "cep_kleene",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0)) AS rn_all
      FROM events
    ), err AS (
      SELECT user_id, event_id, ts, rn_all,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0)) AS rn_err
      FROM seq WHERE event_type = 'error'
    )
    SELECT user_id, min(ts) AS run_start, max(ts) AS run_end, count(*) AS run_len
    FROM err
    GROUP BY user_id, rn_all - rn_err
    HAVING count(*) >= 3
    """,
)
def cep_kleene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleene-plus: runs of ≥3 CONSECUTIVE errors in a user's event
    sequence — gaps-and-islands (row_number difference trick)."""
    e = table(spark, sf_dir, "events")
    w_all = W.partitionBy("user_id").orderBy("ts", F.coalesce(F.col("event_id"), F.lit(0)))
    seq = e.withColumn("rn_all", F.row_number().over(w_all))
    err = seq.filter(F.col("event_type") == "error").withColumn(
        "rn_err", F.row_number().over(w_all)
    )
    return (
        err.groupBy("user_id", (F.col("rn_all") - F.col("rn_err")).alias("island"))
        .agg(
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
            F.count(F.lit(1)).alias("run_len"),
        )
        .filter(F.col("run_len") >= 3)
        .drop("island")
    )


@register(
    "cep_threshold",
    oracle="""
    WITH t AS (
      SELECT user_id, event_id, ts, value,
             avg(value) OVER w AS trail_avg,
             count(*) OVER w AS trail_n
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0)
                   ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, ts, value, round(trail_avg, 6) AS trail_avg
    FROM t
    WHERE trail_n >= 3 AND value > 3 * trail_avg
    """,
)
def cep_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spike detection: value > 3× the user's trailing average (previous
    5 events, ≥3 required) — rolling-state predicate; streaming twin is
    a running aggregate in keyed state."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", F.coalesce(F.col("event_id"), F.lit(0))).rowsBetween(-5, -1)
    t = e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.avg("value").over(w).alias("trail_avg_raw"),
        F.count(F.lit(1)).over(w).alias("trail_n"),
    )
    return (
        t.filter((F.col("trail_n") >= 3) & (F.col("value") > 3 * F.col("trail_avg_raw")))
        .select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.round(F.col("trail_avg_raw"), 6).alias("trail_avg"),
        )
    )


@register(
    "cep_strict_next",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0))
               AS rn
      FROM events
    )
    SELECT a.user_id AS key, a.event_id AS anchor_id,
           a.ts AS t_e1, b.ts AS t_e2
    FROM e a
    JOIN e b ON b.user_id = a.user_id AND b.rn = a.rn + 1
    WHERE a.event_type = 'error' AND b.event_type = 'error'
      AND b.ts <= a.ts + INTERVAL 1 HOUR
    """,
)
def cep_strict_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-contiguity CEP (`Pattern.next`): error whose key's
    IMMEDIATELY next event is also an error within 1h — relaxed
    followed_by would also match error→view→error, strict must not.
    One window shuffle assigns per-key sequence numbers; the step join
    is then an ordinary equi-join on (key, rn+1). Streaming twin: a
    length-2 consecutive run in kleene_stream's per-key counter state."""
    e = table(spark, sf_dir, "events")
    return (
        Pattern.begin("e1", "event_type = 'error'")
        .next("e2", "event_type = 'error'")
        .within("1 HOUR")
        .compile_batch(e)
    )


@register(
    "cep_funnel_abandon",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'view'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
         s2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_view, min(c.ts) AS t_click
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 6 HOUR
           GROUP BY v.user_id, v.event_id, v.ts
         )
    SELECT s2.user_id AS key, s2.event_id AS anchor_id, s2.t_view, s2.t_click
    FROM s2
    WHERE NOT EXISTS (
      SELECT 1 FROM p
      WHERE p.user_id = s2.user_id
        AND p.ts > s2.t_click AND p.ts <= s2.t_view + INTERVAL 6 HOUR
    )
    """,
)
def cep_funnel_abandon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel abandonment (`Pattern.not_followed_by`): view → click
    completed, then NO purchase within the bound — the negation step
    compiles to a left-anti join (absence at scale = anti-join, never a
    per-row subquery)."""
    e = table(spark, sf_dir, "events")
    return (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .not_followed_by("purchase", "event_type = 'purchase'")
        .within("6 HOUR")
        .compile_batch(e)
    )


@register(
    "cep_times",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         s1 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_v, min(c.ts) AS t_click_1
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
           GROUP BY v.user_id, v.event_id, v.ts
         ),
         s2 AS (
           SELECT s1.*, min(c.ts) AS t_click_2
           FROM s1 JOIN c ON c.user_id = s1.user_id
                         AND c.ts > s1.t_click_1 AND c.ts <= s1.t_v + INTERVAL 24 HOUR
           GROUP BY s1.user_id, s1.event_id, s1.t_v, s1.t_click_1
         ),
         s3 AS (
           SELECT s2.*, min(c.ts) AS t_click_3
           FROM s2 JOIN c ON c.user_id = s2.user_id
                         AND c.ts > s2.t_click_2 AND c.ts <= s2.t_v + INTERVAL 24 HOUR
           GROUP BY s2.user_id, s2.event_id, s2.t_v, s2.t_click_1, s2.t_click_2
         )
    SELECT user_id AS key, event_id AS anchor_id, t_v,
           t_click_1, t_click_2, t_click_3
    FROM s3
    """,
)
def cep_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded repetition (`Pattern.times`): a view followed by THREE
    clicks (the three earliest, in order) within 24h. times(n) expands
    to n relaxed sub-steps, so the plan stays the per-step
    equi-join + min-agg chain — no new execution machinery, and the
    oracle is the same chained min-join transcribed in SQL."""
    events = table(spark, sf_dir, "events")
    return (
        Pattern.begin("v", "event_type = 'view'")
        .times("click", "event_type = 'click'", 3)
        .within("24 HOURS")
        .compile_batch(events)
    )


@register(
    "cep_kleene_plus",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, ts, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0)) AS rn
      FROM events
    ),
    m AS (
      SELECT user_id, ts, rn,
             rn - row_number() OVER (PARTITION BY user_id ORDER BY ts, rn) AS isl
      FROM e WHERE event_type = 'error'
    ),
    a AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup'),
    entry AS (
      SELECT a.user_id, a.event_id, a.ts AS t_s, min(m.rn) AS e_rn
      FROM a JOIN m ON m.user_id = a.user_id
                   AND m.ts > a.ts AND m.ts <= a.ts + INTERVAL 7 DAY
      GROUP BY a.user_id, a.event_id, a.ts
    )
    SELECT entry.user_id AS key, entry.event_id AS anchor_id, entry.t_s,
           min(m2.ts) AS t_err_first, max(m2.ts) AS t_err_last,
           count(*) AS err_count
    FROM entry
    JOIN m em ON em.user_id = entry.user_id AND em.rn = entry.e_rn
    JOIN m m2 ON m2.user_id = entry.user_id AND m2.isl = em.isl
             AND m2.rn >= entry.e_rn
             AND m2.ts <= entry.t_s + INTERVAL 7 DAY
    GROUP BY entry.user_id, entry.event_id, entry.t_s
    """,
)
def cep_kleene_plus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy Kleene-plus inside a sequence (`Pattern.one_or_more`):
    signup followed by the earliest error and its maximal consecutive
    error run within 7 days. The plan is gaps-and-islands (one window
    shuffle) + entry min-join + run aggregation — the oracle transcribes
    the identical island arithmetic in SQL."""
    events = table(spark, sf_dir, "events")
    return (
        Pattern.begin("s", "event_type = 'signup'")
        .one_or_more("err", "event_type = 'error'")
        .within("7 DAYS")
        .compile_batch(events)
    )


@register(
    "cep_kleene_measures",
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
    a AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup'),
    entry AS (
      SELECT a.user_id, a.event_id, a.ts AS t_s, min(m.rn) AS e_rn
      FROM a JOIN m ON m.user_id = a.user_id
                   AND m.ts > a.ts AND m.ts <= a.ts + INTERVAL 7 DAY
      GROUP BY a.user_id, a.event_id, a.ts
    )
    SELECT entry.user_id AS key, entry.event_id AS anchor_id, entry.t_s,
           min(m2.ts) AS t_err_first, max(m2.ts) AS t_err_last,
           count(*) AS err_count,
           max(m2.value) AS err_max,
           arg_min(m2.value, m2.rn) AS err_first,
           arg_max(m2.value, m2.rn) AS err_last,
           count(m2.value) AS err_n,
           round(sum(m2.value), 6) AS err_sum_r
    FROM entry
    JOIN m em ON em.user_id = entry.user_id AND em.rn = entry.e_rn
    JOIN m m2 ON m2.user_id = entry.user_id AND m2.isl = em.isl
             AND m2.rn >= entry.e_rn
             AND m2.ts <= entry.t_s + INTERVAL 7 DAY
    GROUP BY entry.user_id, entry.event_id, entry.t_s
    """,
)
def cep_kleene_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over a Kleene run (MATCH_RECOGNIZE agg-over-variable):
    the error run's max/first/last/count/sum emitted as measures. The
    run aggregation rides the same gaps-and-islands pass that builds
    the run — zero extra shuffles. The sum is rounded on BOTH sides
    (registry float discipline: engine-order float addition must not
    flip the hash); the other aggregates are order-free exact."""
    events = table(spark, sf_dir, "events")
    df = (
        Pattern.begin("s", "event_type = 'signup'")
        .one_or_more("err", "event_type = 'error'")
        .within("7 DAYS")
        .measure("err_max", "max(err.value)")
        .measure("err_first", "first(err.value)")
        .measure("err_last", "last(err.value)")
        .measure("err_n", "count(err.value)")
        .measure("err_sum", "sum(err.value)")
        .compile_batch(events)
    )
    return df.withColumn("err_sum_r", F.round("err_sum", 6)).drop("err_sum")


def select_non_overlapping(
    matches: DataFrame,
    start_col: str,
    end_col: str,
    key_col: str = "key",
    tiebreak_col: str = "anchor_id",
) -> DataFrame:
    """AFTER MATCH SKIP PAST LAST ROW (MATCH_RECOGNIZE / Flink-CEP
    match-selection policy) as a composable operator: from a per-key
    set of matches, keep the greedy non-overlapping subset — scan in
    (start, end) order, keep a match iff its start lies strictly after
    the last kept match's end. The default emission policy (every
    anchor matches: skip-to-next-row) composes with this selector to
    give the non-overlapping policy.

    A running-maximum-with-conditional-update recurrence is not
    expressible in window SQL, so this is a Python scan — over
    MATCHES, not events (typically orders of magnitude fewer). It
    runs as ONE mapInPandas pass per PARTITION over key-sorted rows
    (scan state resets at key boundaries), NOT per-key applyInPandas:
    with millions of small keys the per-group pandas overhead of a
    grouped apply dominates and grows super-linearly in key count
    (measured 4.1x at the 8x-keys events probe; this shape restored
    ~linear), while one frame per partition costs the same one
    shuffle + linear scan regardless of key cardinality."""
    return _greedy_scan(
        matches,
        key_col,
        # tiebreak_col makes equal-(start, end) ordering deterministic —
        # without it the kept match under a tie is partition-order luck.
        # NULL ids sort as 0 (kernel/oracle convention, round-8 sweep).
        [start_col, end_col, F.coalesce(F.col(tiebreak_col), F.lit(0))],
        start_col,
        end_col,
        inclusive=False,
    )


def _greedy_scan(
    matches: DataFrame,
    key_col: str,
    sort_cols: list,
    start_col: str,
    marker_col: str,
    inclusive: bool,
) -> DataFrame:
    """Shared partition-wise greedy AFTER-MATCH-SKIP recurrence:
    hash-partition by key, sort within partitions on (key, sort_cols),
    then one sequential pass whose state (current key, last kept
    marker) carries across the Arrow chunk boundaries of a partition
    — equivalent to the per-key scan, without per-key scheduling."""
    import pandas as pd  # local: keep module import-light

    schema = matches.schema

    def scan(chunks):
        sentinel = object()
        cur_key, last = sentinel, None
        for pdf in chunks:
            if len(pdf) == 0:
                continue
            keep = []
            for k, s, m in zip(
                pdf[key_col], pdf[start_col], pdf[marker_col]
            ):
                if cur_key is sentinel or k != cur_key:
                    cur_key, last = k, None
                ok = last is None or (
                    s >= last if inclusive else s > last
                )
                keep.append(ok)
                if ok:
                    last = m
            yield pdf[pd.Series(keep, index=pdf.index)]

    return (
        matches.repartition(key_col)
        .sortWithinPartitions(key_col, *sort_cols)
        .mapInPandas(scan, schema=schema)
    )


def select_skip_to(
    matches: DataFrame,
    start_col: str,
    resume_col: str,
    key_col: str = "key",
    tiebreak_col: str = "anchor_id",
) -> DataFrame:
    """AFTER MATCH SKIP TO LAST <var> (the third MATCH_RECOGNIZE
    match-selection policy, between emit-all and SKIP PAST LAST ROW):
    after a kept match, scanning resumes AT the row its <var> step
    bound — the next kept match's anchor must start at-or-after that
    binding (`>=`, the resume row itself may anchor). Progress is
    structural: a step binding is strictly after the anchor, so the
    resume point strictly advances per kept match and the scan cannot
    loop (the standard's SKIP-TO-own-anchor error case cannot arise
    for a later step).

    Same shape as select_non_overlapping: a sequential recurrence over
    MATCHES (not events), run as one partition-wise key-sorted
    mapInPandas scan (see _greedy_scan — per-key grouped apply
    overhead is super-linear in key count)."""
    return _greedy_scan(
        matches,
        key_col,
        [start_col, resume_col, F.coalesce(F.col(tiebreak_col), F.lit(0))],
        start_col,
        resume_col,
        inclusive=True,
    )


@register(
    "cep_skip_to_last",
    oracle="""
    WITH RECURSIVE
    v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    s2 AS (
      SELECT v.user_id, v.event_id, v.ts AS t_view, min(c.ts) AS t_click
      FROM v JOIN c ON c.user_id = v.user_id
                   AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
      GROUP BY v.user_id, v.event_id, v.ts
    ),
    s3 AS (
      SELECT s2.user_id, s2.event_id, s2.t_view, s2.t_click,
             min(p.ts) AS t_purchase
      FROM s2 JOIN p ON p.user_id = s2.user_id
                    AND p.ts > s2.t_click
                    AND p.ts <= s2.t_view + INTERVAL 24 HOUR
      GROUP BY s2.user_id, s2.event_id, s2.t_view, s2.t_click
    ),
    numbered AS (
      SELECT user_id, event_id, t_view, t_click, t_purchase,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY t_view, t_click, coalesce(event_id, 0)) AS rn
      FROM s3
    ),
    sel AS (
      SELECT user_id, event_id, t_view, t_click, t_purchase, rn,
             true AS kept, t_click AS last_resume
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.user_id, n.event_id, n.t_view, n.t_click, n.t_purchase,
             n.rn, n.t_view >= s.last_resume AS kept,
             CASE WHEN n.t_view >= s.last_resume THEN n.t_click
                  ELSE s.last_resume END AS last_resume
      FROM sel s JOIN numbered n
        ON n.user_id = s.user_id AND n.rn = s.rn + 1
    )
    SELECT user_id AS key, event_id AS anchor_id,
           t_view, t_click, t_purchase
    FROM sel WHERE kept
    """,
)
def cep_skip_to_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel under AFTER MATCH SKIP TO LAST click: after a kept
    match, the next anchor may start at-or-after the kept match's
    CLICK binding (overlap with the purchase tail is allowed — a
    policy strictly between emit-all and SKIP PAST LAST ROW). The
    oracle replays the identical recurrence with a recursive CTE."""
    events = table(spark, sf_dir, "events")
    matches = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by("purchase", "event_type = 'purchase'")
        .within("24 HOURS")
        .compile_batch(events)
    )
    return select_skip_to(matches, "t_view", "t_click")


@register(
    "cep_skip_to_first",
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
      FROM e WHERE event_type = 'error'
    ),
    a AS (SELECT user_id, event_id, ts FROM events
          WHERE event_type = 'signup'),
    entry AS (
      SELECT a.user_id, a.event_id, a.ts AS t_s, min(m.rn) AS e_rn
      FROM a JOIN m ON m.user_id = a.user_id
                   AND m.ts > a.ts AND m.ts <= a.ts + INTERVAL 7 DAY
      GROUP BY a.user_id, a.event_id, a.ts
    ),
    matches AS (
      SELECT entry.user_id, entry.event_id, entry.t_s,
             min(m2.ts) AS t_err_first, max(m2.ts) AS t_err_last,
             count(*) AS err_count
      FROM entry
      JOIN m em ON em.user_id = entry.user_id AND em.rn = entry.e_rn
      JOIN m m2 ON m2.user_id = entry.user_id AND m2.isl = em.isl
               AND m2.rn >= entry.e_rn
               AND m2.ts <= entry.t_s + INTERVAL 7 DAY
      GROUP BY entry.user_id, entry.event_id, entry.t_s
    ),
    numbered AS (
      SELECT user_id, event_id, t_s, t_err_first, t_err_last, err_count,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY t_s, t_err_first, coalesce(event_id, 0)) AS rn
      FROM matches
    ),
    sel AS (
      SELECT user_id, event_id, t_s, t_err_first, t_err_last, err_count,
             rn, true AS kept, t_err_first AS last_resume
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.user_id, n.event_id, n.t_s, n.t_err_first, n.t_err_last,
             n.err_count, n.rn, n.t_s >= s.last_resume AS kept,
             CASE WHEN n.t_s >= s.last_resume THEN n.t_err_first
                  ELSE s.last_resume END AS last_resume
      FROM sel s JOIN numbered n
        ON n.user_id = s.user_id AND n.rn = s.rn + 1
    )
    SELECT user_id AS key, event_id AS anchor_id,
           t_s, t_err_first, t_err_last, err_count
    FROM sel WHERE kept
    """,
)
def cep_skip_to_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AFTER MATCH SKIP TO FIRST on a one_or_more target (round 6d —
    the policy×quantifier combination round 5 rejected): signup
    followed by its maximal consecutive error run, resuming at the
    kept run's FIRST row. Genuinely selective here (1787 raw matches
    → 964 kept at sf0.01): signups falling between a kept anchor and
    its run entry are dropped. With disjoint anchor/run predicates no
    anchor can sit strictly INSIDE a run (it would split the island),
    so FIRST's keep-set coincides with LAST's on this pattern — the
    spelling where they diverge is an anchor predicate overlapping
    the run's (see cep_sql_skip_last_kleene, which pins that shape).
    The selector is the same single mapInPandas recurrence over
    MATCHES (select_skip_to) with the run's entry timestamp as the
    resume marker; the oracle replays the identical recurrence with a
    recursive CTE over the island-derived matches."""
    events = table(spark, sf_dir, "events")
    matches = (
        Pattern.begin("s", "event_type = 'signup'")
        .one_or_more("err", "event_type = 'error'")
        .within("7 DAYS")
        .compile_batch(events)
    )
    return select_skip_to(matches, "t_s", "t_err_first")


def rows_per_match(
    matches: DataFrame,
    steps: list[str],
    key_col: str = "key",
    anchor_col: str = "anchor_id",
    carry: tuple = (),
) -> DataFrame:
    """ALL ROWS PER MATCH (MATCH_RECOGNIZE's per-event output mode)
    for fixed-chain matches: unpivot each match's t_<step>/id_<step>
    columns into one row PER BOUND EVENT — (key, anchor_id, seq_no,
    step, ts, event_id). Encoded as ONE array-of-structs explode (not
    a union of per-step selects): a single whole-stage-codegen pass,
    no shuffle — and, critically, it composes on STREAMING match
    output, where a self-union of the stateful operator would be
    rejected as multiple applyInPandasWithStates in one query.
    `carry` names extra match-level columns replicated onto every
    row of their match (e.g. a MATCH_NUMBER() column)."""
    entries = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("seq_no"),
                F.lit(s).alias("step"),
                F.col(f"t_{s}").alias("ts"),
                F.col(f"id_{s}").alias("event_id"),
            )
            for i, s in enumerate(steps, start=1)
        ]
    )
    return matches.select(
        key_col, anchor_col, *carry, F.explode(entries).alias("_e")
    ).select(key_col, anchor_col, *carry, "_e.*")


@register(
    "cep_all_rows",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'view'),
         c AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'click'),
         p AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'purchase'),
         s2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_view,
                  min({'ts': c.ts, 'id0': coalesce(c.event_id, 0), 'id': c.event_id}) AS mc
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 6 HOUR
           GROUP BY v.user_id, v.event_id, v.ts),
         s3 AS (
           SELECT s2.user_id, s2.event_id, s2.t_view, s2.mc,
                  min({'ts': p.ts, 'id0': coalesce(p.event_id, 0), 'id': p.event_id}) AS mp
           FROM s2 JOIN p ON p.user_id = s2.user_id
                         AND p.ts > s2.mc.ts
                         AND p.ts <= s2.t_view + INTERVAL 6 HOUR
           GROUP BY s2.user_id, s2.event_id, s2.t_view, s2.mc)
    SELECT user_id AS key, event_id AS anchor_id,
           CAST(1 AS BIGINT) AS seq_no, 'view' AS step,
           t_view AS ts, event_id
    FROM s3
    UNION ALL
    SELECT user_id, event_id, CAST(2 AS BIGINT), 'click',
           mc.ts, mc.id
    FROM s3
    UNION ALL
    SELECT user_id, event_id, CAST(3 AS BIGINT), 'purchase',
           mp.ts, mp.id
    FROM s3
    """,
)
def cep_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL ROWS PER MATCH through the funnel: every matched event as
    its own output row with (seq_no, step, ts, event_id) — the
    per-event audit/debug view MATCH_RECOGNIZE offers next to the
    default ONE ROW PER MATCH. Built from compile_batch(emit_ids=True)
    (deterministic (ts, id) struct-min bindings) + the rows_per_match
    unpivot; the oracle carries the same ids via named-struct mins."""
    events = table(spark, sf_dir, "events")
    matches = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by("purchase", "event_type = 'purchase'")
        .within("6 HOURS")
        .compile_batch(events, emit_ids=True)
    )
    return rows_per_match(matches, ["view", "click", "purchase"])


def rows_per_match_running(
    matches: DataFrame,
    steps: list[str],
    key_col: str = "key",
    anchor_col: str = "anchor_id",
) -> DataFrame:
    """ALL ROWS PER MATCH with RUNNING and FINAL measure semantics
    (standard MATCH_RECOGNIZE: a measure in ALL ROWS mode evaluates
    as of each row — RUNNING — unless wrapped in FINAL, which sees the
    whole match). Expects the per-step cents value carried as
    v_<step> (Pattern.measure('v_<s>', '<s>.value')); emits one row
    per bound event with rv (that row's value in exact cents,
    nullable), run_sum (RUNNING sum(value), NULL-skipping like SQL
    SUM via coalesce-0), and fin_sum (FINAL sum(value)).

    The running prefix is computed INSIDE the array-of-structs before
    the explode — plain column arithmetic over the match row, no
    window — so unlike a cumulative-window formulation it needs no
    extra shuffle AND composes on STREAMING match output (a
    non-time window would be rejected on a stream)."""
    rv = [
        F.round(F.col(f"v_{s}") * 100).cast("long") for s in steps
    ]
    run: list = []
    acc = None
    for x in rv:
        acc = F.coalesce(x, F.lit(0)) if acc is None else acc + F.coalesce(
            x, F.lit(0)
        )
        run.append(acc)
    fin = run[-1]
    entries = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("seq_no"),
                F.lit(s).alias("step"),
                F.col(f"t_{s}").alias("ts"),
                F.col(f"id_{s}").alias("event_id"),
                rv[i - 1].alias("rv"),
                run[i - 1].alias("run_sum"),
                fin.alias("fin_sum"),
            )
            for i, s in enumerate(steps, start=1)
        ]
    )
    return matches.select(
        key_col, anchor_col, F.explode(entries).alias("_e")
    ).select(key_col, anchor_col, "_e.*")


def universal_run_exprs(
    steps: list[str], specs: list[tuple]
) -> list[tuple[str, list]]:
    """Per-spec, per-position Column expressions for the SQL-text
    universal-set aggregate MEASURES (`RUNNING/FINAL SUM(col)`,
    `COUNT(col)`, `COUNT(*)`, `AVG(col)` — the column UNQUALIFIED, so
    the aggregate ranges over ALL bound rows of the match, the
    standard's universal row-pattern variable). Position i carries the
    aggregate over rows 1..i (RUNNING) or 1..n (FINAL). Inputs are the
    hidden per-step carries ``__arm_<col>__<step>`` that
    parse_pattern_sql registers as measures; arithmetic is a plain
    left-fold in declared step order — the oracle spells the identical
    coalesce-fold, so double sums agree bit-for-bit (same IEEE ops,
    same order). SQL NULL semantics: SUM/AVG over zero non-NULL values
    so far is NULL (a when-guard on the running non-NULL count), COUNT
    skips NULLs, COUNT(*) counts bound rows, MIN/MAX fold through
    least()/greatest() (NULL-skipping identically on both engines).

    specs: (alias, prefix 'RUNNING'|'FINAL', agg, col|None)."""
    n = len(steps)
    out: list[tuple[str, list]] = []
    for alias, prefix, agg, col in specs:
        if agg == "count_star":
            run = [F.lit(i).cast("long") for i in range(1, n + 1)]
        elif agg in ("min", "max"):
            # least()/greatest() skip NULLs identically on both
            # engines (all-NULL → NULL) — an exact fold, no arithmetic
            fn = F.least if agg == "min" else F.greatest
            vals = [F.col(f"__arm_{col}__{s}") for s in steps]
            acc = None
            run = []
            for x in vals:
                acc = x if acc is None else fn(acc, x)
                run.append(acc)
        else:
            vals = [F.col(f"__arm_{col}__{s}") for s in steps]
            cnts: list = []
            sums: list = []
            c_acc = None
            s_acc = None
            for x in vals:
                c1 = (
                    F.when(x.isNotNull(), F.lit(1))
                    .otherwise(F.lit(0))
                    .cast("long")
                )
                c_acc = c1 if c_acc is None else c_acc + c1
                s1 = F.coalesce(x, F.lit(0))
                s_acc = s1 if s_acc is None else s_acc + s1
                cnts.append(c_acc)
                sums.append(s_acc)
            if agg == "count":
                run = cnts
            elif agg == "sum":
                run = [
                    F.when(c > 0, s) for c, s in zip(cnts, sums)
                ]
            else:  # avg — one double division, same operands both engines
                run = [
                    F.when(c > 0, s.cast("double") / c)
                    for c, s in zip(cnts, sums)
                ]
        if prefix == "FINAL":
            run = [run[-1]] * n
        out.append((alias, run))
    return out


def rows_per_match_measures(
    matches: DataFrame,
    steps: list[str],
    specs: list[tuple],
    key_col: str = "key",
    anchor_col: str = "anchor_id",
    carry: tuple = (),
) -> DataFrame:
    """ALL ROWS PER MATCH with universal-set RUNNING/FINAL aggregate
    MEASURES (the SQL-text dialect's `MEASURES RUNNING SUM(col) AS a,
    FINAL SUM(col) AS b` spelling on a fixed chain). Generalizes
    rows_per_match_running: any bare column, SUM/COUNT/COUNT(*)/AVG,
    per-measure RUNNING or FINAL semantics — same design, the prefix
    arithmetic happens INSIDE the array-of-structs before the explode
    (plain column arithmetic, no window, no extra shuffle) so it
    composes on STREAMING match output unchanged. `{- step -}`
    exclusion filters AFTER this unpivot, so running values on the
    kept rows still count excluded rows (standard semantics: exclusion
    affects output rows only, not aggregation)."""
    alias_runs = universal_run_exprs(steps, specs)
    entries = F.array(
        *[
            F.struct(
                F.lit(i).cast("long").alias("seq_no"),
                F.lit(s).alias("step"),
                F.col(f"t_{s}").alias("ts"),
                F.col(f"id_{s}").alias("event_id"),
                *[run[i - 1].alias(a) for a, run in alias_runs],
            )
            for i, s in enumerate(steps, start=1)
        ]
    )
    return matches.select(
        key_col, anchor_col, *carry, F.explode(entries).alias("_e")
    ).select(key_col, anchor_col, *carry, "_e.*")


def match_all_patterns(
    df: DataFrame,
    rules: list,
    key_col: str = "user_id",
    time_col: str = "ts",
    **stream_kwargs,
) -> DataFrame:
    """MULTI-QUERY pattern matching (round 10): run SEVERAL
    independent CEP rules over ONE scan and — on a stream — ONE keyed
    state, emitting EVERY rule's matches labeled by `pattern_name`.
    This is the continuous multi-query promise of the reference
    family: an alerting deployment runs its whole rule pack as one
    stateful operator instead of k separate jobs.

    rules: [(name, Pattern), ...] — fully independent (no winner
    coordination); each keeps its OWN .within() bound.  Batch: the
    union of each rule's compile_batch output, padded to the union
    schema with typed NULLs (a rule emits NULL for steps it does not
    declare).  Streaming: compile_stream_variants(mode='all') — the
    same variant NFA multiplexer the quantifier/PERMUTE expansions
    use, minus the winner pick: k rules share one shuffle, one state
    entry per key, one Python worker call per micro-batch; k separate
    compile_stream queries would cost k× all three (and Spark rejects
    multiple applyInPandasWithStates in one query anyway).

    100 TB shape: state per key = the union of each rule's partials,
    each bounded by its own WITHIN deadline — identical to running
    the rules separately, with the per-event and per-batch machinery
    paid ONCE."""
    names = [n for n, _p in rules]
    if len(set(names)) != len(names):
        raise ValueError("rule names must be unique")
    if df.isStreaming:
        from spark_cep_spark.streaming.nfa import compile_stream_variants

        return compile_stream_variants(
            rules,
            df,
            key_col=key_col,
            time_col=time_col,
            mode="all",
            label_col="pattern_name",
            **stream_kwargs,
        )
    return union_label_pack(
        [
            (
                name,
                pat.compile_batch(df, key_col=key_col, time_col=time_col),
            )
            for name, pat in rules
        ]
    )


def union_label_pack(
    compiled: list, label_col: str = "pattern_name"
) -> DataFrame:
    """Union per-rule batch plans into ONE labeled pack output:
    union schema in first-appearance order, typed-NULL padding for
    columns a rule does not emit, same-name/different-type collisions
    rejected pointedly. Shared by match_all_patterns (chain packs)
    and cep_sql.match_recognize_all (round 11: mixed chain +
    running-aggregate packs)."""
    full_schema: dict[str, str] = {}
    full_cols: list[str] = []
    for name, bdf in compiled:
        for c, t in bdf.dtypes:
            if c not in full_schema:
                full_schema[c] = t
                full_cols.append(c)
            elif full_schema[c] != t:
                raise ValueError(
                    f"rule {name!r} emits {c} as {t}, an earlier rule "
                    f"emitted {full_schema[c]}"
                )
    out = None
    for name, bdf in compiled:
        for c in full_cols:
            if c not in bdf.columns:
                bdf = bdf.withColumn(c, F.lit(None).cast(full_schema[c]))
        b = bdf.select(*full_cols).withColumn(label_col, F.lit(name))
        out = b if out is None else out.unionByName(b)
    return out


@register(
    "cep_multi_pattern",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'view'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts FROM events
               WHERE event_type = 'purchase'),
         s AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'signup'),
         x AS (SELECT user_id, ts FROM events WHERE event_type = 'error'),
         f2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_view, min(c.ts) AS t_click
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 6 HOUR
           GROUP BY v.user_id, v.event_id, v.ts),
         f3 AS (
           SELECT f2.user_id, f2.event_id, f2.t_view, f2.t_click,
                  min(p.ts) AS t_purchase
           FROM f2 JOIN p ON p.user_id = f2.user_id
                         AND p.ts > f2.t_click
                         AND p.ts <= f2.t_view + INTERVAL 6 HOUR
           GROUP BY f2.user_id, f2.event_id, f2.t_view, f2.t_click),
         churn AS (
           SELECT s.user_id, s.event_id, s.ts AS t_signup, min(x.ts) AS t_error
           FROM s JOIN x ON x.user_id = s.user_id
                        AND x.ts > s.ts AND x.ts <= s.ts + INTERVAL 6 HOUR
           GROUP BY s.user_id, s.event_id, s.ts),
         quick AS (
           SELECT v.user_id, v.event_id, v.ts AS t_view, min(p.ts) AS t_purchase
           FROM v JOIN p ON p.user_id = v.user_id
                        AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
           GROUP BY v.user_id, v.event_id, v.ts)
    SELECT user_id AS key, event_id AS anchor_id, t_view, t_click,
           t_purchase, CAST(NULL AS TIMESTAMP) AS t_signup,
           CAST(NULL AS TIMESTAMP) AS t_error, 'funnel' AS pattern_name
    FROM f3
    UNION ALL
    SELECT user_id, event_id, CAST(NULL AS TIMESTAMP),
           CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
           t_signup, t_error, 'churn_risk'
    FROM churn
    UNION ALL
    SELECT user_id, event_id, t_view, CAST(NULL AS TIMESTAMP),
           t_purchase, CAST(NULL AS TIMESTAMP), CAST(NULL AS TIMESTAMP),
           'quick_buy'
    FROM quick
    """,
)
def cep_multi_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three independent alert rules — the 6h view→click→purchase
    funnel, a 6h signup→error churn signal, and a 1h view→purchase
    quick-buy — evaluated as ONE multi-query pass (match_all_patterns):
    one scan batch-side, one keyed state + one shuffle streaming-side,
    every rule's matches labeled by pattern_name.  Rules keep their
    OWN WITHIN bounds (6h/6h/1h here — mode='all' lifts the shared-
    bound restriction the winner-pick modes need)."""
    events = table(spark, sf_dir, "events")
    rules = [
        (
            "funnel",
            Pattern.begin("view", "event_type = 'view'")
            .followed_by("click", "event_type = 'click'")
            .followed_by("purchase", "event_type = 'purchase'")
            .within("6 HOURS"),
        ),
        (
            "churn_risk",
            Pattern.begin("signup", "event_type = 'signup'")
            .followed_by("error", "event_type = 'error'")
            .within("6 HOURS"),
        ),
        (
            "quick_buy",
            Pattern.begin("view", "event_type = 'view'")
            .followed_by("purchase", "event_type = 'purchase'")
            .within("1 HOURS"),
        ),
    ]
    return match_all_patterns(events, rules)


@register(
    "cep_measures_running",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts, value FROM events
               WHERE event_type = 'view'),
         c AS (SELECT user_id, event_id, ts, value FROM events
               WHERE event_type = 'click'),
         p AS (SELECT user_id, event_id, ts, value FROM events
               WHERE event_type = 'purchase'),
         s2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_view,
                  v.value AS v_view,
                  min({'ts': c.ts, 'id0': coalesce(c.event_id, 0), 'id': c.event_id, 'val': c.value})
                    AS mc
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 6 HOUR
           GROUP BY v.user_id, v.event_id, v.ts, v.value),
         s3 AS (
           SELECT s2.user_id, s2.event_id, s2.t_view, s2.v_view, s2.mc,
                  min({'ts': p.ts, 'id0': coalesce(p.event_id, 0), 'id': p.event_id, 'val': p.value})
                    AS mp
           FROM s2 JOIN p ON p.user_id = s2.user_id
                         AND p.ts > s2.mc.ts
                         AND p.ts <= s2.t_view + INTERVAL 6 HOUR
           GROUP BY s2.user_id, s2.event_id, s2.t_view, s2.v_view,
                    s2.mc),
         r AS (
           SELECT user_id, event_id AS anchor_id, t_view, mc, mp,
                  CAST(round(v_view * 100) AS BIGINT) AS rv1,
                  CAST(round(mc.val * 100) AS BIGINT) AS rv2,
                  CAST(round(mp.val * 100) AS BIGINT) AS rv3
           FROM s3)
    SELECT user_id AS key, anchor_id, CAST(1 AS BIGINT) AS seq_no,
           'view' AS step, t_view AS ts, anchor_id AS event_id,
           rv1 AS rv, coalesce(rv1, 0) AS run_sum,
           coalesce(rv1, 0) + coalesce(rv2, 0) + coalesce(rv3, 0)
             AS fin_sum
    FROM r
    UNION ALL
    SELECT user_id, anchor_id, CAST(2 AS BIGINT), 'click',
           mc.ts, mc.id, rv2, coalesce(rv1, 0) + coalesce(rv2, 0),
           coalesce(rv1, 0) + coalesce(rv2, 0) + coalesce(rv3, 0)
    FROM r
    UNION ALL
    SELECT user_id, anchor_id, CAST(3 AS BIGINT), 'purchase',
           mp.ts, mp.id, rv3,
           coalesce(rv1, 0) + coalesce(rv2, 0) + coalesce(rv3, 0),
           coalesce(rv1, 0) + coalesce(rv2, 0) + coalesce(rv3, 0)
    FROM r
    """,
)
def cep_measures_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUNNING vs FINAL measure semantics in ALL ROWS PER MATCH: each
    funnel row carries its own value (exact cents), the RUNNING sum
    as of that row, and the FINAL whole-match sum — the
    MATCH_RECOGNIZE semantics distinction (RUNNING is the default in
    ALL ROWS mode; FINAL sees the completed match). Values ride the
    match via Pattern MEASURES carries; the prefix arithmetic happens
    inside the unpivot array so no window and no extra shuffle."""
    events = table(spark, sf_dir, "events")
    pat = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by("purchase", "event_type = 'purchase'")
        .within("6 HOURS")
    )
    for s in ("view", "click", "purchase"):
        pat.measure(f"v_{s}", f"{s}.value")
    matches = pat.compile_batch(events, emit_ids=True)
    return rows_per_match_running(
        matches, ["view", "click", "purchase"]
    )


@register(
    "cep_skip_past",
    oracle="""
    WITH RECURSIVE
    v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
    s2 AS (
      SELECT v.user_id, v.event_id, v.ts AS t_view, min(c.ts) AS t_click
      FROM v JOIN c ON c.user_id = v.user_id
                   AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
      GROUP BY v.user_id, v.event_id, v.ts
    ),
    s3 AS (
      SELECT s2.user_id, s2.event_id, s2.t_view, s2.t_click, min(p.ts) AS t_purchase
      FROM s2 JOIN p ON p.user_id = s2.user_id
                    AND p.ts > s2.t_click AND p.ts <= s2.t_view + INTERVAL 24 HOUR
      GROUP BY s2.user_id, s2.event_id, s2.t_view, s2.t_click
    ),
    numbered AS (
      SELECT user_id, event_id, t_view, t_click, t_purchase,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY t_view, t_purchase, coalesce(event_id, 0)) AS rn
      FROM s3
    ),
    sel AS (
      SELECT user_id, event_id, t_view, t_click, t_purchase, rn,
             true AS kept, t_purchase AS last_end
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.user_id, n.event_id, n.t_view, n.t_click, n.t_purchase, n.rn,
             n.t_view > s.last_end AS kept,
             CASE WHEN n.t_view > s.last_end THEN n.t_purchase
                  ELSE s.last_end END AS last_end
      FROM sel s JOIN numbered n
        ON n.user_id = s.user_id AND n.rn = s.rn + 1
    )
    SELECT user_id AS key, event_id AS anchor_id, t_view, t_click, t_purchase
    FROM sel WHERE kept
    """,
)
def cep_skip_past(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The view→click→purchase funnel under AFTER MATCH SKIP PAST LAST
    ROW: every-anchor matches (cep_seq) composed with greedy
    non-overlapping selection — the next kept match must start after
    the previous one's purchase. The oracle replays the identical
    greedy recurrence with a recursive CTE (an EXACT check of a
    sequential policy no window function can express)."""
    events = table(spark, sf_dir, "events")
    matches = (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'")
        .followed_by("purchase", "event_type = 'purchase'")
        .within("24 HOURS")
        .compile_batch(events)
    )
    return select_non_overlapping(matches, "t_view", "t_purchase")


@register(
    "cep_alert_throttle",
    oracle="""
    WITH RECURSIVE
    spikes AS (
      SELECT user_id, event_id, ts, value, trail_avg, trail_n FROM (
        SELECT user_id, event_id, ts, value,
               avg(value) OVER w AS trail_avg,
               count(*) OVER w AS trail_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0)
                     ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING)) t
      WHERE trail_n >= 3 AND value > 3 * trail_avg
    ),
    numbered AS (
      SELECT user_id, event_id, ts, value, trail_avg,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, coalesce(event_id, 0)) AS rn
      FROM spikes
    ),
    sel AS (
      SELECT user_id, event_id, ts, value, trail_avg, rn,
             true AS kept, ts + INTERVAL 30 MINUTE AS cool_end
      FROM numbered WHERE rn = 1
      UNION ALL
      SELECT n.user_id, n.event_id, n.ts, n.value, n.trail_avg, n.rn,
             n.ts > s.cool_end AS kept,
             CASE WHEN n.ts > s.cool_end THEN n.ts + INTERVAL 30 MINUTE
                  ELSE s.cool_end END AS cool_end
      FROM sel s JOIN numbered n
        ON n.user_id = s.user_id AND n.rn = s.rn + 1
    )
    SELECT user_id, event_id, ts, value, round(trail_avg, 6) AS trail_avg
    FROM sel WHERE kept
    """,
)
def cep_alert_throttle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alert throttling / suppression — the alerting-side CEP policy
    every production deployment needs: from the cep_threshold spike
    stream, emit at most ONE alert per user per 30-minute cooldown
    (an alert opens a cooldown; spikes inside it are suppressed; the
    next alert is the first spike strictly after it ends). This is
    the same greedy sequential recurrence as AFTER MATCH SKIP PAST —
    composed from select_non_overlapping with the cooldown as the
    interval end — and the oracle replays it with a recursive CTE
    (EXACT check of a policy no window function expresses).

    Scale: the sequential scan runs over ALERTS, not events (orders of
    magnitude fewer), keys parallelize, per-key state is one
    timestamp. Streaming face = the same recurrence in keyed state
    (threshold_stream's tail state + a last-alert timestamp)."""
    e = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", F.coalesce(F.col("event_id"), F.lit(0))).rowsBetween(-5, -1)
    spikes = (
        e.select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.avg("value").over(w).alias("trail_avg_raw"),
            F.count(F.lit(1)).over(w).alias("trail_n"),
        )
        .filter(
            (F.col("trail_n") >= 3)
            & (F.col("value") > 3 * F.col("trail_avg_raw"))
        )
        .select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.col("ts").alias("alert_start"),
            F.expr("ts + INTERVAL 30 MINUTES").alias("cool_end"),
            F.round(F.col("trail_avg_raw"), 6).alias("trail_avg"),
        )
    )
    kept = select_non_overlapping(
        spikes, "alert_start", "cool_end", key_col="user_id",
        tiebreak_col="event_id",
    )
    return kept.select("user_id", "event_id", "ts", "value", "trail_avg")


@register(
    "cep_permute",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
         cp2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_view, min(c.ts) AS t_click
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 24 HOUR
           GROUP BY v.user_id, v.event_id, v.ts),
         cp3 AS (
           SELECT cp2.user_id, cp2.event_id, cp2.t_view, cp2.t_click,
                  min(p.ts) AS t_purchase
           FROM cp2 JOIN p ON p.user_id = cp2.user_id
                          AND p.ts > cp2.t_click
                          AND p.ts <= cp2.t_view + INTERVAL 24 HOUR
           GROUP BY cp2.user_id, cp2.event_id, cp2.t_view, cp2.t_click),
         pc2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_view, min(p.ts) AS t_purchase
           FROM v JOIN p ON p.user_id = v.user_id
                        AND p.ts > v.ts AND p.ts <= v.ts + INTERVAL 24 HOUR
           GROUP BY v.user_id, v.event_id, v.ts),
         pc3 AS (
           SELECT pc2.user_id, pc2.event_id, pc2.t_view, pc2.t_purchase,
                  min(c.ts) AS t_click
           FROM pc2 JOIN c ON c.user_id = pc2.user_id
                          AND c.ts > pc2.t_purchase
                          AND c.ts <= pc2.t_view + INTERVAL 24 HOUR
           GROUP BY pc2.user_id, pc2.event_id, pc2.t_view, pc2.t_purchase),
         branches AS (
           SELECT user_id, event_id, t_view, t_click, t_purchase,
                  t_purchase AS t_done, 1 AS rk
           FROM cp3
           UNION ALL
           SELECT user_id, event_id, t_view, t_click, t_purchase,
                  t_click AS t_done, 2 AS rk
           FROM pc3),
         best AS (
           SELECT user_id, event_id, t_view,
                  min({'td': t_done, 'rk': rk,
                       'tc': t_click, 'tp': t_purchase}) AS m
           FROM branches GROUP BY user_id, event_id, t_view)
    SELECT user_id AS key, event_id AS anchor_id, t_view,
           m.tc AS t_click, m.tp AS t_purchase,
           CASE WHEN m.rk = 1 THEN 'click_first' ELSE 'purchase_first' END
             AS branch
    FROM best
    """,
)
def cep_permute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMUTE step matching (SQL MATCH_RECOGNIZE `PATTERN
    (V PERMUTE(C, P))`): after a view anchor, a click AND a purchase
    must both occur within 24h — in EITHER order. Implemented by
    expansion, the standard rewrite (PERMUTE(a, b) ≡ alternation of
    the n! orderings): each ordering compiles through the existing
    Pattern batch plan, the branches union, and per anchor the
    earliest-COMPLETING ordering wins (min over a (t_done, branch)
    struct — deterministic under ties, first-declared branch
    preferred), which is exactly first-match semantics over the
    alternation.

    100 TB shape: n! compiled branches share the same per-key
    shuffled layout (each is the proven earliest-match join-agg
    chain); the final winner pick is one more groupBy on the same
    (key, anchor) key. Expansion is exponential in the permuted step
    count — fine for the 2-4 steps real patterns permute, and each
    branch is a plan Catalyst can optimize independently."""
    events = table(spark, sf_dir, "events")
    orderings = [
        ("click_first", ["click", "purchase"], 1),
        ("purchase_first", ["purchase", "click"], 2),
    ]
    branches = []
    for name, steps, rk in orderings:
        pat = Pattern.begin("view", "event_type = 'view'")
        for s in steps:
            pat = pat.followed_by(s, f"event_type = '{s}'")
        df = pat.within("24 HOURS").compile_batch(events)
        done_col = f"t_{steps[-1]}"
        branches.append(
            df.withColumn("t_done", F.col(done_col)).withColumn(
                "rk", F.lit(rk)
            )
        )
    allb = branches[0].unionByName(branches[1])
    best = (
        allb.groupBy("key", "anchor_id", "t_view")
        .agg(
            F.min(
                F.struct(
                    F.col("t_done").alias("td"),
                    F.col("rk").alias("rk"),
                    F.col("t_click").alias("tc"),
                    F.col("t_purchase").alias("tp"),
                )
            ).alias("m")
        )
    )
    return best.select(
        "key",
        "anchor_id",
        "t_view",
        F.col("m.tc").alias("t_click"),
        F.col("m.tp").alias("t_purchase"),
        F.when(F.col("m.rk") == 1, "click_first")
        .otherwise("purchase_first")
        .alias("branch"),
    )


@register(
    "cep_optional",
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
           t_signup, t_error, t_purchase
    FROM b1
    UNION ALL
    SELECT b2.user_id AS key, b2.event_id AS anchor_id, b2.t_signup,
           CAST(NULL AS TIMESTAMP) AS t_error, b2.t_purchase
    FROM b2
    WHERE NOT EXISTS (SELECT 1 FROM b1
                      WHERE b1.user_id = b2.user_id
                        AND b1.event_id = b2.event_id)
    """,
)
def cep_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optional step (MATCH_RECOGNIZE `B?`, greedy): signup → error? →
    purchase within 24h. The standard rewrite: `A B? C` ≡ alternation
    of (A B C | A C) with the WITH-B branch preferred (greedy — the
    quantified variant wins whenever it matches at all, regardless of
    which branch completes earlier; the reluctant variant `B??` would
    flip the preference, which here is just swapping the anti-join
    side). A skipped optional emits t_error = NULL, so the output
    schema is branch-independent.

    100 TB shape: both branches are the proven per-key earliest-match
    join-agg chain over the SAME key layout; the greedy preference is
    ONE left-anti join on (key, anchor_id) — AQE broadcasts the
    with-branch match set when it is small, and no text/value columns
    travel through the preference step."""
    events = table(spark, sf_dir, "events")
    with_e = (
        Pattern.begin("signup", "event_type = 'signup'")
        .followed_by("error", "event_type = 'error'")
        .followed_by("purchase", "event_type = 'purchase'")
        .within("24 HOURS")
        .compile_batch(events)
    )
    without_e = (
        Pattern.begin("signup", "event_type = 'signup'")
        .followed_by("purchase", "event_type = 'purchase'")
        .within("24 HOURS")
        .compile_batch(events)
    )
    skipped = without_e.join(
        with_e.select("key", "anchor_id"), ["key", "anchor_id"], "left_anti"
    ).withColumn("t_error", F.lit(None).cast("timestamp"))
    return with_e.unionByName(skipped.select(*with_e.columns))


@register(
    "cep_times_range",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'view'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         r1 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_view, min(c.ts) AS t1
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 12 HOUR
           GROUP BY v.user_id, v.event_id, v.ts),
         r2 AS (
           SELECT r1.user_id, r1.event_id, r1.t_view, r1.t1, min(c.ts) AS t2
           FROM r1 JOIN c ON c.user_id = r1.user_id
                         AND c.ts > r1.t1 AND c.ts <= r1.t_view + INTERVAL 12 HOUR
           GROUP BY r1.user_id, r1.event_id, r1.t_view, r1.t1),
         r3 AS (
           SELECT r2.user_id, r2.event_id, r2.t_view, r2.t1, r2.t2,
                  min(c.ts) AS t3
           FROM r2 JOIN c ON c.user_id = r2.user_id
                         AND c.ts > r2.t2 AND c.ts <= r2.t_view + INTERVAL 12 HOUR
           GROUP BY r2.user_id, r2.event_id, r2.t_view, r2.t1, r2.t2)
    SELECT user_id AS key, event_id AS anchor_id, t_view,
           t1 AS t_click_1, t2 AS t_click_2, t3 AS t_click_3,
           CAST(3 AS BIGINT) AS reps
    FROM r3
    UNION ALL
    SELECT r2.user_id AS key, r2.event_id AS anchor_id, r2.t_view,
           r2.t1 AS t_click_1, r2.t2 AS t_click_2,
           CAST(NULL AS TIMESTAMP) AS t_click_3, CAST(2 AS BIGINT) AS reps
    FROM r2
    WHERE NOT EXISTS (SELECT 1 FROM r3
                      WHERE r3.user_id = r2.user_id
                        AND r3.event_id = r2.event_id)
    """,
)
def cep_times_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range repetition (MATCH_RECOGNIZE `B{n,m}`, greedy): view →
    click{2,3} within 12h. Rewrite: alternation of the fixed-arity
    expansions times(3) | times(2), LONGEST preferred (greedy). Under
    relaxed contiguity the k-chain binds the k earliest qualifying
    clicks, so the 2-chain is always a prefix of the 3-chain when both
    exist — the greedy pick is exactly "keep the 3-match, emit the
    2-match only where no third click fits the bound", i.e. one
    left-anti join. The unbound tail sub-step emits NULL; `reps` names
    the arity that matched.

    100 TB shape: the m-n+1 branches share one per-key layout (each is
    the earliest-match join-agg chain); preference is one anti join on
    (key, anchor_id). Expansion is linear in m, and m is small by
    construction in real patterns."""
    events = table(spark, sf_dir, "events")
    b3 = (
        Pattern.begin("view", "event_type = 'view'")
        .times("click", "event_type = 'click'", 3)
        .within("12 HOURS")
        .compile_batch(events)
    )
    b2 = (
        Pattern.begin("view", "event_type = 'view'")
        .times("click", "event_type = 'click'", 2)
        .within("12 HOURS")
        .compile_batch(events)
    )
    b3 = b3.withColumn("reps", F.lit(3).cast("long"))
    b2only = (
        b2.join(b3.select("key", "anchor_id"), ["key", "anchor_id"], "left_anti")
        .withColumn("t_click_3", F.lit(None).cast("timestamp"))
        .withColumn("reps", F.lit(2).cast("long"))
    )
    return b3.unionByName(b2only.select(*b3.columns))


@register(
    "cep_reluctant_optional",
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
    SELECT key, anchor_id, t_signup, CAST(NULL AS TIMESTAMP) AS t_click,
           t_purchase, false AS took_optional
    FROM without_b
    UNION ALL
    SELECT w.key, w.anchor_id, w.t_signup, w.t_click, w.t_purchase,
           true AS took_optional
    FROM with_b w
    WHERE NOT EXISTS (SELECT 1 FROM without_b o
                      WHERE o.key = w.key AND o.anchor_id = w.anchor_id)
    """,
)
def cep_reluctant_optional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELUCTANT optional (MATCH_RECOGNIZE `B??`) under STRICT
    contiguity: signup (click??) purchase within 6h — prefer the
    skip-B branch, take signup→click→purchase only where
    signup→purchase is not adjacent. The rewrite is cep_optional's
    alternation with the anti-join side swapped (reluctant = prefer
    the shorter branch).

    Semantic note, documented because it is easy to get wrong: under
    RELAXED contiguity (skip-till-next-match), reluctant quantifiers
    COLLAPSE — `A B?? C` always skips B (any C completing the with-B
    branch completes the without-B branch earlier or equally, since
    the B binding only delays the C search), and `B{n,m}?` always
    matches n. Strict contiguity is the one regime where the
    preference changes the match set, so that is the face exposed
    here; the greedy duals are cep_optional / cep_times_range.

    100 TB shape: identical to cep_optional — two strict-chain
    compiles over one per-key rn layout, preference = one anti join
    on (key, anchor_id)."""
    events = table(spark, sf_dir, "events")
    with_b = (
        Pattern.begin("signup", "event_type = 'signup'")
        .next("click", "event_type = 'click'")
        .next("purchase", "event_type = 'purchase'")
        .within("6 HOURS")
        .compile_batch(events)
    )
    without_b = (
        Pattern.begin("signup", "event_type = 'signup'")
        .next("purchase", "event_type = 'purchase'")
        .within("6 HOURS")
        .compile_batch(events)
    )
    skipped = without_b.select(
        "key",
        "anchor_id",
        "t_signup",
        F.lit(None).cast("timestamp").alias("t_click"),
        "t_purchase",
        F.lit(False).alias("took_optional"),
    )
    took = (
        with_b.join(
            without_b.select("key", "anchor_id"),
            ["key", "anchor_id"],
            "left_anti",
        )
        .withColumn("took_optional", F.lit(True))
        .select(*skipped.columns)
    )
    return skipped.unionByName(took)


@register(
    "cep_gap_timeout",
    oracle="""
    WITH v AS (SELECT user_id, event_id, ts FROM events
               WHERE event_type = 'view'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
         p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase'),
         s2 AS (
           SELECT v.user_id, v.event_id, v.ts AS t_view, min(c.ts) AS t_click
           FROM v JOIN c ON c.user_id = v.user_id
                        AND c.ts > v.ts
                        AND c.ts <= v.ts + INTERVAL 24 HOUR
                        AND c.ts <= v.ts + INTERVAL 30 MINUTE
           GROUP BY v.user_id, v.event_id, v.ts)
    SELECT s2.user_id AS key, s2.event_id AS anchor_id, s2.t_view, s2.t_click
    FROM s2
    WHERE NOT EXISTS (
      SELECT 1 FROM p
      WHERE p.user_id = s2.user_id
        AND p.ts > s2.t_click
        AND p.ts <= s2.t_view + INTERVAL 24 HOUR
        AND p.ts <= s2.t_click + INTERVAL 1 HOUR
    )
    """,
)
def cep_gap_timeout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-transition gap deadlines (Esper/Siddhi `within` between
    steps, vs the whole-match window): a view followed by a click
    within 30 MINUTES OF THE VIEW (not just anywhere in the 24h match
    window), then NO purchase within 1 hour OF THE CLICK — the cart-
    timeout / SLA-breach detector. The whole-match .within(24h) still
    bounds NFA state retention; the gaps tighten each transition.

    100 TB shape: identical to cep_funnel_abandon — the gap is one
    extra AND-conjunct on each step's equi-join, no new join or
    shuffle; streaming-side it is one integer compare in the kernel
    (state is freed EARLIER, never later, since gaps only shrink
    windows)."""
    e = table(spark, sf_dir, "events")
    return (
        Pattern.begin("view", "event_type = 'view'")
        .followed_by("click", "event_type = 'click'", gap="30 MINUTES")
        .not_followed_by("purchase", "event_type = 'purchase'", gap="1 HOUR")
        .within("24 HOURS")
        .compile_batch(e)
    )


def _funnel_next_step(
    e: DataFrame,
    prev: DataFrame,
    prev_t: str,
    etype: str,
    out_t: str,
    carry: list,
) -> DataFrame:
    """One funnel hop (shared by cep_funnel_steps / cep_funnel_latency):
    join the etype-filtered events to the per-user previous-step row,
    keep events strictly after the previous binding and within 7 days
    of the user's first signup, bind the EARLIEST eligible event, and
    carry the listed earlier binding times forward (one row per user in
    `prev`, so min() just propagates them)."""
    s = e.filter(F.col("event_type") == etype).select(
        "user_id", F.col("ts").alias("_ts")
    )
    return (
        s.join(prev, "user_id")
        .filter(
            (F.col("_ts") > F.col(prev_t))
            & (F.col("_ts") <= F.col("t1") + F.expr("INTERVAL 7 DAYS"))
        )
        .groupBy("user_id")
        .agg(
            F.min("_ts").alias(out_t),
            *[F.min(c).alias(c) for c in carry],
        )
    )


@register(
    "cep_funnel_steps",
    oracle="""
    WITH u1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    u2 AS (
      SELECT e.user_id, min(e.ts) AS t2, min(u1.t1) AS t1
      FROM events e JOIN u1 ON e.user_id = u1.user_id
      WHERE e.event_type = 'view'
        AND e.ts > u1.t1 AND e.ts <= u1.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id
    ),
    u3 AS (
      SELECT e.user_id, min(e.ts) AS t3, min(u2.t1) AS t1
      FROM events e JOIN u2 ON e.user_id = u2.user_id
      WHERE e.event_type = 'click'
        AND e.ts > u2.t2 AND e.ts <= u2.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id
    ),
    u4 AS (
      SELECT e.user_id, min(e.ts) AS t4
      FROM events e JOIN u3 ON e.user_id = u3.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > u3.t3 AND e.ts <= u3.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id
    ),
    counts AS (
      SELECT 1 AS step, 'signup' AS step_name,
             CAST((SELECT count(*) FROM u1) AS BIGINT) AS n_users
      UNION ALL SELECT 2, 'view', CAST((SELECT count(*) FROM u2) AS BIGINT)
      UNION ALL SELECT 3, 'click', CAST((SELECT count(*) FROM u3) AS BIGINT)
      UNION ALL SELECT 4, 'purchase',
                CAST((SELECT count(*) FROM u4) AS BIGINT)
    )
    SELECT step, step_name, n_users,
           round(n_users * 1.0 /
                 first_value(n_users) OVER (ORDER BY step), 6)
             AS pct_of_first,
           round(n_users * 1.0 /
                 lag(n_users) OVER (ORDER BY step), 6) AS pct_of_prev
    FROM counts
    """,
)
def cep_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion rollup (the product-analytics FUNNEL(...)
    every event platform ships): how many users complete each prefix
    of signup → view → click → purchase, each step strictly after the
    previous and the whole chain within 7 days of the user's FIRST
    signup, with per-step conversion rates. Earliest-completion
    semantics (each step binds its earliest eligible event), i.e. the
    same chained min-join this file's Pattern compiler emits —
    aggregated per USER rather than per match anchor.

    100 TB shape: step k is a (user)-keyed join of the step-k-filtered
    events (predicate pushed to the scan) against the step-(k-1)
    per-user row, immediately re-aggregated to one row per user —
    every intermediate is bounded by |users|, never |events|, and all
    four hops share one user-hash partitioning which AQE reuses. The
    final 4-row union + window is driver-trivial at any scale."""
    e = table(spark, sf_dir, "events")

    u1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )

    u2 = _funnel_next_step(e, u1, "t1", "view", "t2", ["t1"])
    u3 = _funnel_next_step(e, u2, "t2", "click", "t3", ["t1"])
    u4 = _funnel_next_step(e, u3, "t3", "purchase", "t4", ["t1"])

    counts = None
    for step, (name, df) in enumerate(
        [("signup", u1), ("view", u2), ("click", u3), ("purchase", u4)], 1
    ):
        row = df.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(step).cast("int").alias("step"),
            F.lit(name).alias("step_name"),
            "n_users",
        )
        counts = row if counts is None else counts.unionByName(row)

    w = W.orderBy("step")
    return counts.select(
        "step",
        "step_name",
        "n_users",
        F.round(
            F.col("n_users") * 1.0 / F.first("n_users").over(w), 6
        ).alias("pct_of_first"),
        F.round(
            F.col("n_users") * 1.0 / F.lag("n_users").over(w), 6
        ).alias("pct_of_prev"),
    )


def _trend_runs(e: DataFrame) -> DataFrame:
    """Maximal monotone runs per user (shared by cep_trend_runs /
    cep_vshape): one (user, (ts, id)) window pass computes the
    per-event direction vs the previous event, a second running count
    on the SAME partitioning assigns run ids (gaps-and-islands), and
    the per-run rollup rides the same shuffle. Output one row per
    maximal run of >= 2 same-direction transitions."""
    w = W.partitionBy("user_id").orderBy("ts", F.coalesce(F.col("event_id"), F.lit(0)))
    prev_v = F.lag("value").over(w)
    prev_ts = F.lag("ts").over(w)
    d = (
        e.filter(F.col("value").isNotNull())
        .select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.when(prev_v.isNull(), F.lit(0))
            .when(F.col("value") > prev_v, F.lit(1))
            .when(F.col("value") < prev_v, F.lit(-1))
            .otherwise(F.lit(0))
            .alias("dir"),
            prev_ts.alias("prev_ts"),
            prev_v.alias("prev_v"),
        )
    )
    chg = F.when(
        F.lag("dir").over(w).isNull()
        | (F.lag("dir").over(w) != F.col("dir")),
        F.lit(1),
    ).otherwise(F.lit(0))
    runs = d.withColumn(
        "run_id",
        F.sum(chg).over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        runs.filter(F.col("dir") != 0)
        .groupBy("user_id", "run_id", "dir")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_steps"),
            F.min("prev_ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.min(F.struct("ts", "prev_v")).alias("_s"),
            F.max(F.struct("ts", "value")).alias("_e"),
        )
        .filter(F.col("n_steps") >= 2)
        .select(
            "user_id",
            F.when(F.col("dir") == 1, "up").otherwise("down").alias(
                "direction"
            ),
            "start_ts",
            "end_ts",
            "n_steps",
            F.round(
                F.col("_e.value") - F.col("_s.prev_v"), 6
            ).alias("delta"),
        )
    )


@register(
    "cep_trend_runs",
    oracle="""
    WITH d AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER w AS prev_ts,
             lag(value) OVER w AS prev_v,
             CASE WHEN lag(value) OVER w IS NULL THEN 0
                  WHEN value > lag(value) OVER w THEN 1
                  WHEN value < lag(value) OVER w THEN -1
                  ELSE 0 END AS dir
      FROM events WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0))
    ),
    c AS (
      SELECT *,
             CASE WHEN lag(dir) OVER w2 IS NULL
                    OR lag(dir) OVER w2 <> dir
                  THEN 1 ELSE 0 END AS chg
      FROM d
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0))
    ),
    seg AS (
      SELECT *,
             CAST(sum(chg)
                  OVER (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0)
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS run_id
      FROM c
    ),
    runs AS (
      SELECT user_id, run_id, dir,
             CAST(count(*) AS BIGINT) AS n_steps,
             min(prev_ts) AS start_ts,
             max(ts) AS end_ts,
             min({'ts': ts, 'prev_v': prev_v}) AS _s,
             max({'ts': ts, 'value': value}) AS _e
      FROM seg WHERE dir <> 0
      GROUP BY user_id, run_id, dir
    )
    SELECT user_id,
           CASE WHEN dir = 1 THEN 'up' ELSE 'down' END AS direction,
           start_ts, end_ts, n_steps,
           round(_e.value - _s.prev_v, 6) AS delta
    FROM runs WHERE n_steps >= 2
    """,
)
def cep_trend_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotone trend-run detection (the MATCH_RECOGNIZE
    `B AS B.value > PREV(B.value)` pattern, i.e. Flink's
    strictly-rising run): per user, every MAXIMAL strictly-increasing
    or strictly-decreasing run of >= 2 consecutive transitions
    (>= 3 points), with its time span, length, and net move — the
    building block the V/W-shape and breakout detectors compose on.
    Equal values and nulls break runs (direction 0 is never a run).

    100 TB shape: classic gaps-and-islands — ONE (user, (ts, id))
    shuffle serves the direction lag, the run-id running count
    (O(1)-state frame), and the per-run rollup. No joins, no second
    shuffle, state bounded by the window frame."""
    return _trend_runs(table(spark, sf_dir, "events"))


@register(
    "cep_vshape",
    oracle="""
    WITH d AS (
      SELECT user_id, event_id, ts, value,
             lag(ts) OVER w AS prev_ts,
             lag(value) OVER w AS prev_v,
             CASE WHEN lag(value) OVER w IS NULL THEN 0
                  WHEN value > lag(value) OVER w THEN 1
                  WHEN value < lag(value) OVER w THEN -1
                  ELSE 0 END AS dir
      FROM events WHERE value IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0))
    ),
    c AS (
      SELECT *,
             CASE WHEN lag(dir) OVER w2 IS NULL
                    OR lag(dir) OVER w2 <> dir
                  THEN 1 ELSE 0 END AS chg
      FROM d
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0))
    ),
    seg AS (
      SELECT *,
             CAST(sum(chg)
                  OVER (PARTITION BY user_id ORDER BY ts, coalesce(event_id, 0)
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS run_id
      FROM c
    ),
    runs AS (
      SELECT user_id, run_id, dir,
             CAST(count(*) AS BIGINT) AS n_steps,
             min(prev_ts) AS start_ts,
             max(ts) AS end_ts,
             min({'ts': ts, 'prev_v': prev_v}) AS _s,
             max({'ts': ts, 'value': value}) AS _e
      FROM seg WHERE dir <> 0
      GROUP BY user_id, run_id, dir
    ),
    good AS (SELECT * FROM runs WHERE n_steps >= 2)
    SELECT dn.user_id,
           dn.start_ts, dn.end_ts AS trough_ts, up.end_ts,
           dn.n_steps AS down_steps, up.n_steps AS up_steps,
           round(dn._e.value - dn._s.prev_v, 6) AS drop_delta,
           round(up._e.value - up._s.prev_v, 6) AS rebound_delta
    FROM good dn
    JOIN good up ON up.user_id = dn.user_id
                AND up.start_ts = dn.end_ts
                AND dn.dir = -1 AND up.dir = 1
    """,
)
def cep_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V-shape detection (the canonical MATCH_RECOGNIZE example:
    `A+ B+` with A falling, B rising): a maximal strictly-decreasing
    run of >= 2 transitions immediately followed — sharing its trough
    point — by a strictly-increasing run of >= 2 transitions. Emits
    the V's span, both leg lengths, and both leg deltas (drawdown /
    rebound).

    100 TB shape: the runs table (one gaps-and-islands pass, see
    cep_trend_runs) self-joins once on (user, trough-ts) — an
    equi-join on the same user-keyed partitioning, matching only
    adjacent down→up run pairs. No cartesian anything; cost ~ |runs|,
    which is already a compressed summary of the stream."""
    runs = _trend_runs(table(spark, sf_dir, "events"))
    dn = runs.filter(F.col("direction") == "down").select(
        "user_id",
        F.col("start_ts"),
        F.col("end_ts").alias("trough_ts"),
        F.col("n_steps").alias("down_steps"),
        F.col("delta").alias("drop_delta"),
    )
    up = runs.filter(F.col("direction") == "up").select(
        F.col("user_id").alias("u2"),
        F.col("start_ts").alias("u_start"),
        F.col("end_ts"),
        F.col("n_steps").alias("up_steps"),
        F.col("delta").alias("rebound_delta"),
    )
    return dn.join(
        up,
        (dn.user_id == up.u2) & (dn.trough_ts == up.u_start),
    ).select(
        "user_id",
        "start_ts",
        "trough_ts",
        "end_ts",
        "down_steps",
        "up_steps",
        "drop_delta",
        "rebound_delta",
    )


@register(
    "cep_funnel_latency",
    oracle="""
    WITH u1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    u2 AS (
      SELECT e.user_id, min(e.ts) AS t2, min(u1.t1) AS t1
      FROM events e JOIN u1 ON e.user_id = u1.user_id
      WHERE e.event_type = 'view'
        AND e.ts > u1.t1 AND e.ts <= u1.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id
    ),
    u3 AS (
      SELECT e.user_id, min(e.ts) AS t3, min(u2.t1) AS t1,
             min(u2.t2) AS t2
      FROM events e JOIN u2 ON e.user_id = u2.user_id
      WHERE e.event_type = 'click'
        AND e.ts > u2.t2 AND e.ts <= u2.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id
    ),
    u4 AS (
      SELECT e.user_id, min(e.ts) AS t4, min(u3.t1) AS t1,
             min(u3.t2) AS t2, min(u3.t3) AS t3
      FROM events e JOIN u3 ON e.user_id = u3.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > u3.t3 AND e.ts <= u3.t1 + INTERVAL 7 DAY
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT 1 AS step, 'signup->view' AS hop,
             epoch_us(t2) - epoch_us(t1) AS us FROM u4
      UNION ALL
      SELECT 2, 'view->click', epoch_us(t3) - epoch_us(t2) FROM u4
      UNION ALL
      SELECT 3, 'click->purchase', epoch_us(t4) - epoch_us(t3) FROM u4
      UNION ALL
      SELECT 4, 'total', epoch_us(t4) - epoch_us(t1) FROM u4
    )
    SELECT step, hop, CAST(count(*) AS BIGINT) AS n,
           CAST(min(us) AS BIGINT) AS min_us,
           round(quantile_cont(us, 0.5), 6) AS med_us,
           round(quantile_cont(us, 0.9), 6) AS p90_us,
           CAST(max(us) AS BIGINT) AS max_us
    FROM lat GROUP BY step, hop
    """,
)
def cep_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: for users completing the WHOLE
    signup → view → click → purchase funnel (cep_funnel_steps'
    earliest-completion semantics, same chained min-join but carrying
    EVERY step's binding time forward), the per-hop latency
    distribution — n, min, median, p90, max — plus the end-to-end
    total. THE question a funnel dashboard answers after the
    conversion rate: where do converting users stall?

    Latencies are exact integer microseconds (epoch_us diffs);
    percentiles are linearly interpolated on both engines
    (percentile ↔ quantile_cont, the agg_median precedent), rounded
    to 6 places.  100 TB shape: identical to cep_funnel_steps — four
    user-keyed hops, each bounded by |users|, one shared hash
    partitioning; the 4-hop unpivot and the per-hop aggregate are
    |converters|-sized."""
    e = table(spark, sf_dir, "events")

    u1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )

    u2 = _funnel_next_step(e, u1, "t1", "view", "t2", ["t1"])
    u3 = _funnel_next_step(e, u2, "t2", "click", "t3", ["t1", "t2"])
    u4 = _funnel_next_step(e, u3, "t3", "purchase", "t4", ["t1", "t2", "t3"])

    # ONE computation of u4, fanned to 4 rows/user by an Expand node
    # (stack) — a 4-way union of u4 projections would re-plan the
    # whole 3-hop join chain per branch (code-review catch).
    us = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    lat = u4.select(
        us("t1").alias("u1"), us("t2").alias("u2"),
        us("t3").alias("u3"), us("t4").alias("u4"),
    ).select(
        F.expr(
            "stack(4,"
            " 1, 'signup->view',    u2 - u1,"
            " 2, 'view->click',     u3 - u2,"
            " 3, 'click->purchase', u4 - u3,"
            " 4, 'total',           u4 - u1) AS (step, hop, us)"
        )
    )
    return lat.groupBy("step", "hop").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("us").alias("min_us"),
        F.round(F.expr("percentile(us, 0.5)"), 6).alias("med_us"),
        F.round(F.expr("percentile(us, 0.9)"), 6).alias("p90_us"),
        F.max("us").alias("max_us"),
    )


_RUN_AGG_ORACLE = """
    WITH RECURSIVE ev AS (
      SELECT user_id,
             coalesce(event_type, '') AS et,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_us(ts) AS tus,
             -- coalesce(event_id, 0): DuckDB sorts NULL LAST, the
             -- kernel faces map NULL event_id to 0 BEFORE sorting —
             -- a NULL id tied on ts must order identically everywhere
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
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN e.et = 'signup'
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents * (w.n + 1)
                                <= 3 * (w.s + e.cents))
                  THEN FALSE
                  ELSE TRUE END,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND 2 * e.cents * (w.n + 1) <= 3 * (w.s + e.cents)
                  THEN w.n + 1
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(0 AS BIGINT)
                  ELSE w.n END,
             CASE WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(0 AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND 2 * e.cents * (w.n + 1) <= 3 * (w.s + e.cents)
                  THEN w.s + e.cents
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                  THEN CAST(0 AS BIGINT)
                  ELSE w.s END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' THEN e.tus
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents * (w.n + 1)
                                <= 3 * (w.s + e.cents))
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.anchor END,
             CASE WHEN ((NOT w.in_run) OR (w.in_run AND e.tus > w.dl))
                       AND e.et = 'signup' THEN e.tus + 604800000000
                  WHEN (NOT w.in_run) OR (w.in_run AND e.tus > w.dl)
                  THEN CAST(NULL AS BIGINT)
                  WHEN e.et = 'view' AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents * (w.n + 1)
                                <= 3 * (w.s + e.cents))
                  THEN CAST(NULL AS BIGINT)
                  ELSE w.dl END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0
                  THEN w.anchor
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents * (w.n + 1)
                                <= 3 * (w.s + e.cents))
                       AND w.n > 0
                  THEN w.anchor END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0 THEN w.n
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents * (w.n + 1)
                                <= 3 * (w.s + e.cents))
                       AND w.n > 0
                  THEN w.n END,
             CASE WHEN w.in_run AND e.tus > w.dl AND w.n > 0 THEN w.s
                  WHEN w.in_run AND e.tus <= w.dl AND e.et = 'view'
                       AND e.cents IS NOT NULL
                       AND NOT (2 * e.cents * (w.n + 1)
                                <= 3 * (w.s + e.cents))
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


@register("cep_run_agg", oracle=_RUN_AGG_ORACLE)
def cep_run_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-aggregate kleene matching — the standard
    MATCH_RECOGNIZE DEFINE-aggregate feature as its own operator
    (since round 7 the SAME semantics are reachable from
    MATCH_RECOGNIZE text too — cep_sql_run_agg compiles
    `DEFINE B AS ... AVG(B.cents)` to the shared kernel):
    PATTERN (A -> B+) WITHIN 7 DAYS where each candidate B
    binds iff value ≤ 1.5 × the run's RUNNING average including
    itself (2·cents·(n+1) ≤ 3·(sum+cents), exact cross-multiplied
    integers).  Run extension depends on the accepted prefix — no
    window frame expresses it — so the batch face applies the SAME
    pure kernel the streaming face uses (advance_run_agg,
    streaming/nfa.py) per key via applyInPandas: kernel = single
    source of truth, this oracle = the brute-force recursive-CTE walk
    of the definition.

    100 TB shape: one (user) shuffle into an O(rows-per-key) scan
    with O(1) state — the win_ewma/win_cusum tier-(b) class; keys
    parallelize, no driver state."""
    import pandas as pd

    from spark_cep_spark.streaming.nfa import advance_run_agg

    # cents domain bounded against adversarial readings — sized for the
    # ORACLE's cross-multiplication 2·cents·(n+1) (±1e9 dollars = ±1e11
    # cents keeps 3·sum within BIGINT for runs of ~10^7 rows), not just
    # for the cast (the rollup_lttb ±1e12 bound would let the DuckDB
    # walk overflow on long runs — code-review catch); mirrored in the
    # oracle.
    e = table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & (F.col("value").isNull() | (F.abs("value") <= 1e9))
    ).select(
        "user_id", "ts", "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # NULL event_id → 0 BEFORE the sort (the streaming wrapper's
        # order): a NaN sorting LAST on a timestamp tie would order
        # the two faces differently — review catch, cep_sql_run_agg
        pdf = pdf.assign(event_id=pdf["event_id"].fillna(0)).sort_values(
            ["ts", "event_id"]
        )
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        rows = [
            [int(t), int(i), et,
             None if pd.isna(c) else int(c)]
            for t, i, et, c in zip(
                ts_us.tolist(), pdf["event_id"].tolist(),
                pdf["event_type"].tolist(), pdf["cents"].tolist(),
            )
        ]
        _, out = advance_run_agg(None, rows, 1 << 62)
        uid = pdf["user_id"].iloc[0] if len(pdf) else None
        return pd.DataFrame(
            {
                "user_id": [uid] * len(out),
                "anchor_ts": pd.to_datetime([r[0] for r in out], unit="us"),
                "n_b": [r[1] for r in out],
                "sum_b_cents": [r[2] for r in out],
            }
        )

    return keyed_partition_apply(
        e,
        "user_id",
        fn,
        "user_id long, anchor_ts timestamp, n_b long, sum_b_cents long",
    )
