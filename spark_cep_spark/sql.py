"""Continuous SQL over stream tables — the spark-cep user surface
(SURVEY §0: "continuous SQL queries over event streams").

The reference registered stream tables and re-executed a parsed SQL
query per micro-batch [PK]. On Spark 4 this needs NO custom parser or
per-batch re-binding: a streaming DataFrame registered as a temp view
is directly queryable with spark.sql(...), and the result is itself a
streaming DataFrame planned incrementally by the engine. This module
is the thin registry + lifecycle wrapper that packages that as the
reference-shaped API:

    eng = StreamSQL(spark)
    eng.register_stream("events_s", stream_df)       # stream table
    eng.register_table("nation", nation_df)          # static table
    q = eng.query(
        "SELECT window(ts, '1 hour').start AS h, count(*) AS n "
        "FROM events_s GROUP BY window(ts, '1 hour')",
        sink="memory", name="hourly", output_mode="complete")
    ...
    eng.stop_all()

`INSERT INTO <sink>` of the reference maps to sink= ('memory',
'parquet:<path>', or a foreachBatch callable).
"""

from __future__ import annotations

import os
import re
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

SCRATCH = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".tmp")


class StreamSQL:
    """Registry of stream + static tables with continuous-SQL queries."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._queries: dict[str, StreamingQuery] = {}

    # -- registration ------------------------------------------------------
    def register_stream(self, name: str, stream_df: DataFrame) -> None:
        if not stream_df.isStreaming:
            raise ValueError(f"{name}: not a streaming DataFrame")
        stream_df.createOrReplaceTempView(name)

    def register_table(self, name: str, df: DataFrame) -> None:
        if df.isStreaming:
            raise ValueError(f"{name}: is streaming; use register_stream")
        df.createOrReplaceTempView(name)

    # -- continuous query lifecycle ---------------------------------------
    def sql(self, query: str) -> DataFrame:
        """Plan a (possibly streaming) SQL query against the registry."""
        return self.spark.sql(query)

    def query(
        self,
        sql: str,
        sink: str | Callable = "memory",
        name: str | None = None,
        output_mode: str = "append",
        trigger_available_now: bool = False,
        checkpoint: str | None = None,
    ) -> StreamingQuery:
        """Start a continuous query: SQL → sink (the reference's
        `SELECT ... INSERT INTO sink` loop, exactly-once per epoch)."""
        df = self.spark.sql(sql)
        if not df.isStreaming:
            raise ValueError("query is fully static — use .sql() instead")
        name = name or f"cq_{uuid.uuid4().hex[:8]}"
        # fresh checkpoint per start unless the caller pins one: a reused
        # checkpoint resumes the OLD query's source offsets/paths —
        # exactly-once restart is opt-in via checkpoint=, not accidental
        ckpt = checkpoint or os.path.join(
            SCRATCH, "checkpoints", f"{name}_{uuid.uuid4().hex[:8]}"
        )

        if callable(sink):
            writer = df.writeStream.foreachBatch(sink)
        elif sink == "memory":
            writer = df.writeStream.format("memory").queryName(name)
        elif sink.startswith("parquet:"):
            writer = df.writeStream.format("parquet").option(
                "path", sink.split(":", 1)[1]
            )
        else:
            raise ValueError(f"unknown sink: {sink}")

        writer = writer.outputMode(output_mode).option("checkpointLocation", ckpt)
        if trigger_available_now:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
        self._queries[name] = q
        return q

    def pattern_query(
        self,
        stream_name: str,
        pattern,
        sink: str | Callable = "memory",
        name: str | None = None,
        watermark: str = "10 minutes",
        **pattern_kwargs,
    ) -> StreamingQuery:
        """Run a CEP Pattern as a continuous query over a registered
        stream table (the MATCH_RECOGNIZE-shaped entry point: SQL names
        the stream, the Pattern builder supplies the pattern clause —
        step predicates themselves are SQL expressions).

            eng.pattern_query(
                "events_s",
                Pattern.begin("view", "event_type = 'view'")
                       .followed_by("buy", "event_type = 'purchase'")
                       .within("1 HOUR"),
                sink="memory", name="funnels")

        `pattern` may also be SQL text in the operators.cep_sql dialect
        (PATTERN/WITHIN/DEFINE clauses) — the fully-textual continuous
        CEP query of the reference [PK]. Text patterns route through
        match_recognize, so the quantifier (`B?`/`{n,m}`/`??`) and
        PERMUTE expansions get their streaming faces here too (the
        variant NFA runner), not just plain step chains.
        """
        from spark_cep_spark.streaming.nfa import compile_stream

        stream_df = self.spark.table(stream_name)
        if not stream_df.isStreaming:
            raise ValueError(f"{stream_name}: not a registered stream table")
        if isinstance(pattern, str):
            from spark_cep_spark.operators.cep_sql import match_recognize

            matches = match_recognize(
                stream_df, pattern, watermark=watermark, **pattern_kwargs
            )
        else:
            matches = compile_stream(
                pattern, stream_df, watermark=watermark, **pattern_kwargs
            )
        name = name or f"cep_{uuid.uuid4().hex[:8]}"
        ckpt = os.path.join(SCRATCH, "checkpoints", f"{name}_{uuid.uuid4().hex[:8]}")
        if callable(sink):
            writer = matches.writeStream.foreachBatch(sink)
        elif sink == "memory":
            writer = matches.writeStream.format("memory").queryName(name)
        elif sink.startswith("parquet:"):
            writer = matches.writeStream.format("parquet").option(
                "path", sink.split(":", 1)[1]
            )
        else:
            raise ValueError(f"unknown sink: {sink}")
        writer = writer.outputMode("append").option("checkpointLocation", ckpt)
        q = writer.trigger(availableNow=True).start()
        self._queries[name] = q
        return q

    def results(self, name: str) -> DataFrame:
        """Memory-sink results of a named continuous query."""
        return self.spark.table(name)

    def stop(self, name: str) -> None:
        if name in self._queries:
            self._queries.pop(name).stop()

    def stop_all(self) -> None:
        for name in list(self._queries):
            self.stop(name)


# ---------------------------------------------------------------------------
# Embedded MATCH_RECOGNIZE in ordinary SQL statements

_MR_CALL = re.compile(
    r"MATCH_RECOGNIZE\s*\(\s*([A-Za-z_]\w*)\s*,\s*\$\$(.*?)\$\$\s*\)",
    re.IGNORECASE | re.DOTALL,
)


def sql_with_match_recognize(spark: SparkSession, text: str) -> DataFrame:
    """Run a SQL statement whose FROM clause may call

        MATCH_RECOGNIZE(<table_or_view>, $$ <PATTERN/WITHIN/DEFINE> $$)

    — the standard-SQL shape (table-valued pattern matching inside a
    larger query) on top of the operators.cep_sql dialect. Each call is
    compiled (batch plan or streaming NFA, depending on the source) and
    substituted as a temp view; the surrounding statement — joins,
    aggregates, WHERE, anything Spark SQL accepts — then runs over the
    match relations with full Catalyst optimization. The dialect text
    is dollar-quoted ($$...$$) because it contains ordinary SQL string
    literals.

    Scale: zero new execution surface — the MR call compiles to the
    same Pattern plan as match_recognize(); the outer statement is
    plain Spark SQL over its output."""
    from spark_cep_spark.operators.cep_sql import match_recognize

    out = []
    views = []
    last = 0
    try:
        for m in _MR_CALL.finditer(text):
            src, clause = m.group(1), m.group(2)
            view = f"_mr_{uuid.uuid4().hex[:8]}"
            match_recognize(spark.table(src), clause).createOrReplaceTempView(
                view
            )
            views.append(view)
            out.append(text[last : m.start()])
            out.append(view)
            last = m.end()
        if not out:
            raise ValueError("no MATCH_RECOGNIZE(table, $$...$$) call found")
        out.append(text[last:])
        return spark.sql("".join(out))
    finally:
        # the returned DataFrame holds its own resolved plan — the
        # scaffolding views are dropped so repeated calls (a serving
        # StreamSQL engine) never accumulate catalog entries
        for v in views:
            spark.catalog.dropTempView(v)


def _top_level_keyword(text: str, word: str) -> list[int]:
    """Offsets of `word` at paren-depth 0, outside string literals and
    outside SQL comments (case-insensitive, whole-word). Skipping
    ``-- line`` and ``/* block */`` comments matters: a 'qualify' or
    'limit' inside a comment would otherwise mis-trigger the QUALIFY
    rewrite and split the statement at the wrong offset (round-6
    ADVICE)."""
    hits: list[int] = []
    depth = 0
    in_str: str | None = None
    i, n, w = 0, len(text), len(word)
    low = text.lower()
    word = word.lower()
    while i < n:
        ch = text[i]
        if in_str:
            if ch == in_str:
                in_str = None
        elif ch == "-" and low.startswith("--", i):
            j = low.find("\n", i)
            i = n if j == -1 else j + 1
            continue
        elif ch == "/" and low.startswith("/*", i):
            j = low.find("*/", i + 2)
            if j == -1:
                raise ValueError("unterminated /* block comment in SQL text")
            i = j + 2
            continue
        elif ch in ("'", '"'):
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and low.startswith(word, i)
            and (i == 0 or not (low[i - 1].isalnum() or low[i - 1] == "_"))
            and (
                i + w >= n
                or not (low[i + w].isalnum() or low[i + w] == "_")
            )
        ):
            hits.append(i)
            i += w
            continue
        i += 1
    return hits


def sql_with_qualify(spark: SparkSession, text: str) -> DataFrame:
    """Run a SQL statement that uses the QUALIFY clause (filter on
    window-function results, Snowflake/DuckDB/BigQuery dialect) on
    Spark, which has no native QUALIFY.

    Rewrite: ``SELECT ... QUALIFY <pred> [ORDER BY ...] [LIMIT n]``
    becomes ``SELECT * FROM ( SELECT ... ) __qualify__ WHERE <pred>
    [ORDER BY ...] [LIMIT n]`` — exactly the standard's semantics
    (QUALIFY evaluates after window functions) because the window
    expressions are computed in the inner SELECT and the predicate
    sees their aliases.  The supported dialect therefore requires the
    predicate to reference SELECT-list ALIASES, not inline OVER()
    expressions — the portable spelling that also runs unchanged on
    DuckDB — and raises a pointed error otherwise.

    The rewrite is what Catalyst wants anyway: a rank/row_number alias
    filtered with `<= k` collapses Filter-over-Window into
    WindowGroupLimit (per-partition top-k heap, no full sort of each
    partition's rows), the same plan shape pinned for
    win_topk_per_group — QUALIFY is front-end sugar, not a new engine
    path."""
    q = _top_level_keyword(text, "qualify")
    if not q:
        return spark.sql(text)
    if len(q) > 1:
        raise ValueError(
            "only one top-level QUALIFY clause is supported (nested "
            "QUALIFY belongs to a subquery — parenthesize it)"
        )
    start = q[0]
    tail_marks = [
        p
        for kw in ("order", "limit")
        for p in _top_level_keyword(text, kw)
        if p > start
    ]
    end = min(tail_marks) if tail_marks else len(text)
    pred = text[start + len("qualify"):end].strip()
    if not pred:
        raise ValueError("empty QUALIFY predicate")
    if re.search(r"\bover\s*\(", pred, re.I):
        raise ValueError(
            "QUALIFY predicate must reference a SELECT-list alias, not "
            "an inline OVER() expression — alias the window function "
            "in the SELECT list and filter on the alias (the spelling "
            "that is also portable to DuckDB/Snowflake)"
        )
    inner = text[:start].strip()
    tail = text[end:].strip()
    rewritten = (
        f"SELECT * FROM ( {inner} ) __qualify__ WHERE {pred}"
        + (f" {tail}" if tail else "")
    )
    return spark.sql(rewritten)
