"""Behavioral tests for the pipeline/sql_surface/scale additions —
properties the DuckDB hash check can't express (invariance, physical
rewrites, plan shape).
"""

from __future__ import annotations

from pyspark.sql import functions as F

import spark_cep_spark
from tests.conftest import SF_SMOKE


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(spark):
    """Salting is a pure physical rewrite: result must be identical to
    the unsalted join, and invariant to the salt fan-out."""
    spark_cep_spark.load_all()
    from spark_cep_spark.io import table
    from spark_cep_spark.plans.scale import explode_salts

    e = table(spark, SF_SMOKE, "events")
    dim = e.groupBy("event_type").agg((F.max("value") * 0.5).alias("thresh"))
    plain = (
        e.join(dim, "event_type")
        .filter(F.col("value") > F.col("thresh"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )
    got = spark_cep_spark.QUERIES["join_skew_salted"](spark, SF_SMOKE)
    assert _sorted_rows(got) == _sorted_rows(plain)
    # a different fan-out must not change the result
    n = 7
    salted = e.withColumn("_salt", F.pmod(F.xxhash64("event_id"), F.lit(n)).cast("int"))
    alt = (
        salted.join(explode_salts(dim, n), ["event_type", "_salt"])
        .filter(F.col("value") > F.col("thresh"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_above"))
    )
    assert _sorted_rows(alt) == _sorted_rows(plain)


def test_rollup_levels_are_consistent(spark):
    """Hour-grain counts must sum to their day-grain row, and day rows
    to the grand total — the rollup invariant."""
    spark_cep_spark.load_all()
    df = spark_cep_spark.QUERIES["rollup_hypertable"](spark, SF_SMOKE).collect()
    hours = [r for r in df if r["lvl"] == 0]
    days = {r["day"]: r["n_events"] for r in df if r["lvl"] == 1}
    total = [r for r in df if r["lvl"] == 3]
    assert len(total) == 1
    assert sum(r["n_events"] for r in hours) == total[0]["n_events"]
    by_day: dict = {}
    for r in hours:
        by_day[r["day"]] = by_day.get(r["day"], 0) + r["n_events"]
    assert by_day == days


def test_stratified_sample_is_stable_under_growth(spark):
    """Hash sampling: appending new documents must not change the
    keep/drop decision of any existing document (the property
    `df.sample` does NOT have — its decisions shift with partitioning
    and row order)."""
    spark_cep_spark.load_all()
    from spark_cep_spark.io import table
    from spark_cep_spark.operators.llm_pipeline import _hash_bucket

    rate = F.when(F.col("lang") == "en", F.lit(20)).otherwise(F.lit(80))

    def kept(d):
        return {
            r["doc_id"]
            for r in d.withColumn("b", _hash_bucket("doc_id"))
            .filter(F.col("b") < rate)
            .select("doc_id")
            .collect()
        }

    d = table(spark, SF_SMOKE, "documents")
    grown = d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    original_ids = {r["doc_id"] for r in d.select("doc_id").collect()}
    assert kept(d) == {i for i in kept(grown) if i in original_ids}


def test_corpus_pack_fill_bound(spark):
    """No pack may contain more tokens than the boundary plus one
    max-length document (a doc joins the pack where it STARTS)."""
    spark_cep_spark.load_all()
    from spark_cep_spark.io import table

    d = table(spark, SF_SMOKE, "documents")
    max_tok = d.select(F.max(F.size(F.split("text", " ")))).first()[0]
    packs = spark_cep_spark.QUERIES["corpus_pack"](spark, SF_SMOKE).collect()
    assert packs
    for r in packs:
        assert r["tokens"] <= 2048 + max_tok


def test_emb_quantize_bounds(spark):
    """Quantized checksum is bounded by ±127×dim and saturation count
    by dim."""
    spark_cep_spark.load_all()
    rows = spark_cep_spark.QUERIES["emb_quantize"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert -127 * 64 <= r["qsum"] <= 127 * 64
        assert 0 <= r["n_sat"] <= 64


def test_sql_surface_parses_through_catalyst(spark):
    """The SQL-string queries build real plans (semi-join rewrite for
    EXISTS/IN) — assert the physical plan shows a semi join, not a
    per-row subquery."""
    spark_cep_spark.load_all()
    df = spark_cep_spark.QUERIES["sql_subqueries"](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_redact_masks_all_digits(spark):
    spark_cep_spark.load_all()
    rows = spark_cep_spark.QUERIES["text_redact"](spark, SF_SMOKE).collect()
    assert rows
    import re

    for r in rows[:200]:
        assert not re.search(r"[0-9]", r["redacted"])
        assert r["n_digit_chars"] >= 0


def test_interval_join_banded_equals_naive_range_join(spark):
    """The banded equi-join rewrite returns exactly the naive range
    join's pairs (dense random data incl. bucket-boundary times), and
    its plan joins on equi-keys — no BroadcastNestedLoop."""
    import random

    from pyspark.sql import functions as F

    from spark_cep_spark.operators.joins import interval_join_banded

    rng = random.Random(7)
    base = 1_700_000_000_000_000  # µs epoch
    W = 300 * 1_000_000  # 5-minute band
    rows = [
        (k, base + rng.randrange(0, 4 * W))
        for k in (1, 2)
        for _ in range(60)
    ] + [(1, base + i * W) for i in range(4)]  # exact boundaries
    df = spark.createDataFrame(rows, "k long, us long").withColumn(
        "ts", F.timestamp_micros(F.col("us"))
    )
    a = df.select("k", F.col("ts").alias("a_ts"))
    b = df.select("k", F.col("ts").alias("b_ts"))
    banded = interval_join_banded(a, b, ["k"], "a_ts", "b_ts", 0, W)
    naive = (
        a.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.k") == F.col("y.k"))
            & (F.col("b_ts") > F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 5 MINUTES")),
        )
        .select(F.col("x.k").alias("k"), "a_ts", "b_ts")
    )
    got = sorted(map(tuple, banded.select("k", "a_ts", "b_ts").collect()))
    want = sorted(map(tuple, naive.collect()))
    assert got == want and len(got) > 0
    plan = banded._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "_bkt" in plan


def test_text_repetition_flags_degenerate_docs(spark):
    """Repetition metrics on constructed docs: an all-same-word doc
    scores maximal ratios, an all-distinct doc scores zero — and the
    metrics are exactly computable by hand."""
    spark_cep_spark.load_all()
    import os
    import tempfile

    from spark_cep_spark.operators.llm_text import text_repetition

    rows = [
        (1, "a a a a", "en", "s", 7),       # degenerate: 1 word repeated
        (2, "a b c d", "en", "s", 7),       # all distinct
        (3, "a b a b", "en", "s", 7),       # bigrams: ab,ba,ab → 1 dup of 3
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as tmp:
        sf = os.path.join(tmp)
        df.write.parquet(os.path.join(sf, "documents.parquet"))
        got = {r.doc_id: r for r in text_repetition(spark, sf).collect()}
    assert got[1].top_word_ratio == 1.0 and got[1].dup_word_ratio == 0.75
    assert got[1].dup_bigram_ratio == round(1 - 1 / 3, 6)
    assert got[2].top_word_ratio == 0.25 and got[2].dup_word_ratio == 0.0
    assert got[2].dup_bigram_ratio == 0.0
    assert got[3].n_distinct == 2
    assert got[3].dup_bigram_ratio == round(1 - 2 / 3, 6)


def test_decontaminate_finds_planted_overlap(spark):
    """A training doc sharing a 5-gram with a benchmark doc (doc_id %
    7 == 0) is flagged with the exact distinct-gram count; disjoint
    docs are not flagged; short docs (<5 words) never produce grams."""
    spark_cep_spark.load_all()
    import os
    import tempfile

    from spark_cep_spark.operators.llm_pipeline import pipeline_decontaminate

    bench = "alpha beta gamma delta epsilon zeta"  # doc 0: benchmark
    rows = [
        (0, bench, "en", "s", 9),
        # doc 1: contains the benchmark's first 5-gram once
        (1, "x y alpha beta gamma delta epsilon q r", "en", "s", 9),
        # doc 2: disjoint vocabulary
        (2, "one two three four five six seven", "en", "s", 9),
        # doc 3: shares both benchmark 5-grams
        (3, bench + " tail", "en", "s", 9),
        # doc 4: too short for any 5-gram
        (4, "alpha beta gamma", "en", "s", 9),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as tmp:
        sf = os.path.join(tmp)
        df.write.parquet(os.path.join(sf, "documents.parquet"))
        got = {r.doc_id: r.n_shared for r in pipeline_decontaminate(spark, sf).collect()}
    assert got == {1: 1, 3: 2}


def test_end_to_end_pipeline_stage_counts_monotonic(spark, sf_dir):
    """Each stage can only shed documents: input >= quality >=
    decontaminated >= deduped >= mixed, per language — and the corpus
    is non-trivially filtered at every stage on the fixture."""
    import __spark_entry__ as entry

    rows = entry.queries()["pipeline_end_to_end"](spark, sf_dir).collect()
    assert rows, "no languages in audit"
    for r in rows:
        assert (
            r["n_input"]
            >= r["n_quality"]
            >= r["n_decontam"]
            >= r["n_dedup"]
            >= r["n_mixed"]
            >= 0
        ), r
    total = {k: sum(r[k] for r in rows) for k in rows[0].asDict() if k != "lang"}
    assert total["n_mixed"] > 0  # something survives
    assert total["n_mixed"] < total["n_input"]  # something was filtered


def test_corpus_shuffle_is_a_deterministic_permutation(spark):
    """global_pos must be exactly 1..N (a permutation — no gaps, no
    ties), shard consistent with md5 bucketing, and a re-run must give
    byte-identical order (the resumable-training property)."""
    spark_cep_spark.load_all()
    q = spark_cep_spark.QUERIES["corpus_shuffle"]
    got = q(spark, SF_SMOKE).collect()
    n = len(got)
    assert sorted(r.global_pos for r in got) == list(range(1, n + 1))
    # order is (shard asc, key asc): positions within a shard form a
    # contiguous block
    by_shard = {}
    for r in got:
        by_shard.setdefault(r.shard, []).append(r.global_pos)
    flat = []
    for shard in sorted(by_shard):
        ps = sorted(by_shard[shard])
        assert ps == list(range(ps[0], ps[0] + len(ps)))
        flat.extend(ps)
    assert flat == list(range(1, n + 1))
    again = q(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_emb_dim_stats_covers_every_dimension(spark):
    spark_cep_spark.load_all()
    rows = spark_cep_spark.QUERIES["emb_dim_stats"](spark, SF_SMOKE).collect()
    dims = sorted(r.dim for r in rows)
    assert dims == list(range(1, len(dims) + 1))  # every dim, 1-based
    for r in rows:
        assert r.vmin <= r.mean <= r.vmax
        assert r.std is None or r.std >= 0


def test_recursive_cte_bfs_invariants(spark):
    """Seeds at hop 0; every non-seed reached row must have a
    neighbour one hop closer (BFS frontier property); hops bounded by
    the recursion depth guard."""
    spark_cep_spark.load_all()
    rows = spark_cep_spark.QUERIES["sql_recursive_cte"](spark, SF_SMOKE).collect()
    hops = {r.vec_id: r.hops for r in rows}
    assert all(0 <= h <= 3 for h in hops.values())
    seeds = {v for v, h in hops.items() if h == 0}
    assert seeds and all(v % 20 == 0 for v in seeds)
    edges = spark.table("nn_edges").collect()  # view left by the query
    nbrs = {}
    for e in edges:
        nbrs.setdefault(e.dst, set()).add(e.src)
    for v, h in hops.items():
        if h > 0:
            assert any(hops.get(u) == h - 1 for u in nbrs.get(v, ()))


def test_containment_detects_planted_subset(spark):
    """A short doc that is an exact excerpt of a long doc must show
    containment 1.0 toward it; the long doc's containment of the short
    one must be the (much lower) exact shingle ratio; unrelated docs
    never pair."""
    spark_cep_spark.load_all()
    import os
    import tempfile

    from spark_cep_spark.operators.llm_dedup import dedup_containment

    long_doc = " ".join(f"tok{i}" for i in range(30))
    excerpt = " ".join(f"tok{i}" for i in range(10, 18))  # 8 tokens inside
    rows = [
        (0, long_doc, "en", "s", len(long_doc)),
        (1, excerpt, "en", "s", len(excerpt)),
        (2, "zebra yak xray walrus vulture toucan", "en", "s", 36),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as tmp:
        df.write.parquet(os.path.join(tmp, "documents.parquet"))
        got = {
            (r.doc_a, r.doc_b): (r.containment, r.n_shared, r.n_a)
            for r in dedup_containment(spark, tmp).collect()
        }
    # excerpt: 8 tokens -> 6 distinct shingles, all present in long doc
    assert got[(1, 0)] == (1.0, 6, 6)
    # long doc: 30 tokens -> 28 shingles, 6 shared = 0.214286 < 0.5 cut
    assert (0, 1) not in got
    assert not any(2 in pair for pair in got)


def test_interleave_mixes_sources_smoothly(spark):
    """Stride-scheduling property: in every prefix of the global
    order, each source's document count tracks its proportional share
    to within a couple of documents (no source clumping), and
    global_pos is a permutation."""
    spark_cep_spark.load_all()
    rows = sorted(
        spark_cep_spark.QUERIES["corpus_interleave"](spark, SF_SMOKE).collect(),
        key=lambda r: r.global_pos,
    )
    n = len(rows)
    assert [r.global_pos for r in rows] == list(range(1, n + 1))
    totals = {}
    for r in rows:
        totals[r.source] = totals.get(r.source, 0) + 1
    seen = {s: 0 for s in totals}
    for i, r in enumerate(rows, start=1):
        seen[r.source] += 1
        for s, cnt in seen.items():
            expected = i * totals[s] / n
            assert abs(cnt - expected) <= 2 + totals[s] * 0.02, (
                f"source {s} drifted at prefix {i}: {cnt} vs {expected:.1f}"
            )
