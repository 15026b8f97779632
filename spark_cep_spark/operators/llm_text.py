"""Text analysis operators for LLM-data pipelines (SURVEY §2.11):
language-ID heuristic, quality scoring, token counting, sentiment,
document fingerprinting. All JVM-side expressions (split / higher-order
functions / regex) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.registry import register


@register(
    "text_stats",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
           round(avg(n_chars), 4) AS avg_chars,
           count(DISTINCT source) AS n_sources,
           min(n_chars) AS min_chars, max(n_chars) AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus stats per language: doc counts, token/char distributions."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(n_tokens), 4).alias("avg_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.countDistinct("source").alias("n_sources"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "text_tokens",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[a-z0-9]+')) AS re_tokens,
           len(regexp_extract_all(text, '[aeiou]')) AS n_vowels,
           n_chars
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex word pieces."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[a-z0-9]+"), 0))
        .cast("long")
        .alias("re_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[aeiou]"), 0))
        .cast("long")
        .alias("n_vowels"),
        "n_chars",
    )


@register(
    "text_quality",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           n_chars,
           round(len(string_split(text, ' ')) * 1.0 / n_chars, 6) AS tok_per_char,
           round(len(list_filter(string_split(text, ' '),
                                 t -> t = 'a' OR t = 'the')) * 1.0
                 / len(string_split(text, ' ')), 6) AS stopword_ratio,
           CASE WHEN n_chars < 150 THEN 'short'
                WHEN n_chars < 300 THEN 'medium'
                ELSE 'long' END AS len_bucket
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token density, stopword ratio, length bucket —
    the filter features a pretraining pipeline gates on."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    stop = F.size(F.filter(toks, lambda t: (t == "a") | (t == "the")))
    return d.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        "n_chars",
        F.round(n_tokens * F.lit(1.0) / F.col("n_chars"), 6).alias("tok_per_char"),
        F.round(stop * F.lit(1.0) / n_tokens, 6).alias("stopword_ratio"),
        F.when(F.col("n_chars") < 150, "short")
        .when(F.col("n_chars") < 300, "medium")
        .otherwise("long")
        .alias("len_bucket"),
    )


@register(
    "text_lang_id",
    oracle="""
    SELECT doc_id, lang,
           CASE WHEN contains(text, 'the') THEN 'en'
                WHEN contains(text, 'stream') THEN 'xx'
                ELSE 'und' END AS lang_pred,
           (CASE WHEN contains(text, 'the') THEN 'en'
                 WHEN contains(text, 'stream') THEN 'xx'
                 ELSE 'und' END = lang) AS is_match
    FROM documents
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword/n-gram presence vote). The
    fixture corpus shares one vocabulary across langs, so accuracy is
    meaningless here — the operator shape (deterministic rule cascade
    over token presence) is what's exercised; swap the rules for real
    per-language stopword lists in production."""
    d = table(spark, sf_dir, "documents")
    pred = (
        F.when(F.col("text").contains("the"), "en")
        .when(F.col("text").contains("stream"), "xx")
        .otherwise("und")
    )
    return d.select(
        "doc_id", "lang", pred.alias("lang_pred"), (pred == F.col("lang")).alias("is_match")
    )


@register(
    "text_sentiment",
    oracle="""
    SELECT doc_id,
           CAST(list_sum(list_transform(string_split(text, ' '),
                t -> CASE t WHEN 'fast' THEN 2 WHEN 'slow' THEN -2
                            WHEN 'big' THEN 1 WHEN 'small' THEN -1
                            WHEN 'merge' THEN 1 WHEN 'filter' THEN -1
                            ELSE 0 END)) AS BIGINT) AS score,
           CASE WHEN list_sum(list_transform(string_split(text, ' '),
                t -> CASE t WHEN 'fast' THEN 2 WHEN 'slow' THEN -2
                            WHEN 'big' THEN 1 WHEN 'small' THEN -1
                            WHEN 'merge' THEN 1 WHEN 'filter' THEN -1
                            ELSE 0 END)) > 0 THEN 'pos'
                WHEN list_sum(list_transform(string_split(text, ' '),
                t -> CASE t WHEN 'fast' THEN 2 WHEN 'slow' THEN -2
                            WHEN 'big' THEN 1 WHEN 'small' THEN -1
                            WHEN 'merge' THEN 1 WHEN 'filter' THEN -1
                            ELSE 0 END)) < 0 THEN 'neg'
                ELSE 'neutral' END AS polarity
    FROM documents
    """,
)
def text_sentiment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon-based polarity: per-token integer scores summed over the
    doc (exact integer arithmetic → exact oracle). Expressed as a
    higher-order transform/aggregate so the lexicon is evaluated
    JVM-side; for big lexicons, the equivalent broadcast-join over
    exploded tokens is provided as `sentiment_join` below."""
    d = table(spark, sf_dir, "documents")
    lex = (
        F.when(F.col("t") == "fast", 2)
        .when(F.col("t") == "slow", -2)
        .when(F.col("t") == "big", 1)
        .when(F.col("t") == "small", -1)
        .when(F.col("t") == "merge", 1)
        .when(F.col("t") == "filter", -1)
        .otherwise(0)
    )
    score = F.aggregate(
        F.transform(
            F.split("text", " "),
            lambda t: (
                F.when(t == "fast", 2)
                .when(t == "slow", -2)
                .when(t == "big", 1)
                .when(t == "small", -1)
                .when(t == "merge", 1)
                .when(t == "filter", -1)
                .otherwise(0)
            ),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("long")
    _ = lex  # documented alternative path below
    return d.select(
        "doc_id",
        score.alias("score"),
        F.when(score > 0, "pos").when(score < 0, "neg").otherwise("neutral").alias(
            "polarity"
        ),
    )


LEXICON = [("fast", 2), ("slow", -2), ("big", 1), ("small", -1), ("merge", 1), ("filter", -1)]


def sentiment_join(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Broadcast-lexicon variant: explode tokens ⋈ broadcast(lexicon) →
    re-aggregate. The right shape when the lexicon is 100k+ entries
    (too big for a CASE expression)."""
    lex = F.broadcast(spark.createDataFrame(LEXICON, "tok string, s int"))
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    return (
        toks.join(lex, "tok", "left")
        .groupBy("doc_id")
        .agg(F.coalesce(F.sum("s"), F.lit(0)).cast("long").alias("score"))
    )


@register(
    "text_fingerprint",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CASE WHEN len(toks) >= 3 THEN list_aggregate(
             list_transform(range(1, len(toks) - 1),
                            i -> md5(concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))),
             'min') END AS fingerprint,
           greatest(len(toks) - 2, 0) AS n_shingles
    FROM t
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: min-hash over 3-token shingles (rolling-
    window content signature à la winnowing). Identical docs ⇒ identical
    fingerprints; fingerprint equality is a cheap near-dup prefilter.

    Docs shorter than one shingle (< 3 tokens) have no content window
    to fingerprint: they stay in the output with a NULL fingerprint and
    n_shingles = 0 (the guard matters — unguarded ``sequence(1,
    size-2)`` runs DESCENDING for short docs and feeds invalid indices
    to ``element_at``, a crash on any real web corpus)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    shingles = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.md5(
                F.concat_ws(
                    " ",
                    F.element_at(toks, i),
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                )
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    return d.select(
        "doc_id",
        F.array_min(shingles).alias("fingerprint"),
        F.greatest(F.size(toks) - 2, F.lit(0)).cast("long").alias("n_shingles"),
    )


@register(
    "corpus_split",
    oracle="""
    SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
    FROM (
      SELECT n_chars,
             CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END AS split
      FROM (
        SELECT n_chars,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) % 100 AS b
        FROM documents
      ) h
    ) s
    GROUP BY split
    """,
)
def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by content-independent
    key hash — the standard training-data-pipeline split that stays
    stable as the corpus grows (a doc's split never changes when other
    docs are added, unlike fraction sampling). md5 on the id so the
    assignment is reproducible everywhere (and oracle-checkable —
    Spark's xxhash64 has no DuckDB twin); pure per-row projection, no
    shuffle except the final tiny audit aggregate."""
    d = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("long")
        % 100
    )
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        d.select(F.col("n_chars"), split.alias("split"))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_chars").alias("chars"))
    )


@register(
    "corpus_pack",
    oracle="""
    WITH t AS (
      SELECT doc_id, doc_id % 8 AS shard,
             len(string_split(text, ' ')) AS tok
      FROM documents
    ),
    placed AS (
      SELECT shard, tok,
             sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) - tok AS start_off
      FROM t
    )
    SELECT shard, CAST(start_off // 2048 AS BIGINT) AS pack_id,
           count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS tokens
    FROM placed
    GROUP BY shard, pack_id
    """,
)
def corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: shard the corpus, then within each
    shard lay documents end-to-end in doc_id order and cut a pack
    boundary every 2048 tokens — each doc joins the pack where it
    starts. Per-shard windows keep the packing embarrassingly parallel
    (no global sort: at 100 TB shards ≈ shuffle partitions, each packed
    independently), deterministic, and incremental-friendly (append-only
    shards never repack old docs). Emits the per-pack audit (doc count,
    token fill)."""
    d = table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(F.split("text", " ")).alias("tok"),
    )
    w = W.partitionBy("shard").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    placed = t.withColumn("start_off", F.sum("tok").over(w) - F.col("tok"))
    return (
        placed.select(
            "shard", F.floor(F.col("start_off") / 2048).alias("pack_id"), "tok"
        )
        .groupBy("shard", "pack_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("tok").alias("tokens"))
    )


@register(
    "text_repetition",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    wc AS (
      SELECT doc_id, u AS word, count(*) AS c
      FROM (SELECT doc_id, unnest(w) AS u FROM t)
      GROUP BY doc_id, u
    ),
    ws AS (
      SELECT doc_id, count(*) AS n_distinct, max(c) AS top_cnt
      FROM wc GROUP BY doc_id
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                                   i -> array_to_string(w[i:i+1], ' '))) AS g
      FROM t
    ),
    bs AS (
      SELECT doc_id, count(*) AS n_bi, count(DISTINCT g) AS d_bi
      FROM bg GROUP BY doc_id
    )
    SELECT t.doc_id,
           len(t.w) AS n_words,
           ws.n_distinct,
           round(CAST(ws.top_cnt AS DOUBLE) / len(t.w), 6) AS top_word_ratio,
           round(1 - CAST(ws.n_distinct AS DOUBLE) / len(t.w), 6) AS dup_word_ratio,
           round(1 - CAST(bs.d_bi AS DOUBLE) / bs.n_bi, 6) AS dup_bigram_ratio
    FROM t
    JOIN ws USING (doc_id)
    LEFT JOIN bs USING (doc_id)
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: the share
    of the doc taken by its most frequent word, the duplicate-word
    ratio, and the duplicate-bigram ratio — the standard filters for
    boilerplate / degenerate repetition in training corpora (cf. Rae et
    al. 2021 "Scaling Language Models", repetition heuristics).

    Shape for 100 TB: explode → (doc_id, token) hash aggregate with
    map-side partial combine, then a per-doc aggregate and a
    co-keyed join — no per-row Python anywhere. Tokens within a doc
    land in one partition only for the final per-doc rollup; the wide
    (doc, token) stage is uniformly keyed, skew-free.

    One-word docs have no bigrams: they keep their word-level signals
    and get a NULL dup_bigram_ratio (LEFT join against the bigram
    aggregate; the bigram transform is guarded so ``sequence(1,
    size-1)`` never runs descending on a single-token doc)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    words = d.select("doc_id", F.explode("w").alias("word"))
    ws = (
        words.groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_cnt"),
        )
    )
    bigrams = F.when(
        F.size("w") >= 2,
        F.expr("transform(sequence(1, size(w) - 1), i -> concat_ws(' ', slice(w, i, 2)))"),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    bg = d.select("doc_id", F.explode(bigrams).alias("g"))
    bs = bg.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bi"), F.countDistinct("g").alias("d_bi")
    )
    base = d.select("doc_id", F.size("w").cast("long").alias("n_words"))
    return (
        base.join(ws, "doc_id")
        .join(bs, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "n_distinct",
            F.round(F.col("top_cnt").cast("double") / F.col("n_words"), 6).alias(
                "top_word_ratio"
            ),
            F.round(
                F.lit(1) - F.col("n_distinct").cast("double") / F.col("n_words"), 6
            ).alias("dup_word_ratio"),
            F.round(
                F.lit(1) - F.col("d_bi").cast("double") / F.col("n_bi"), 6
            ).alias("dup_bigram_ratio"),
        )
    )


@register(
    "text_surprisal",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
         freq AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
         tot AS (SELECT count(*) AS n FROM tok)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(ln(n * 1.0 / c)), 6) AS avg_surprisal
    FROM tok JOIN freq USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def text_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram surprisal per document — the deterministic stand-in for
    LM-perplexity quality filtering (docs whose tokens are corpus-rare
    score high; boilerplate/stopword salad scores low). avg over the
    doc of ln(N_total / count(token)).

    100 TB shape: the token-frequency table is vocabulary-sized (≪
    corpus), so it BROADCASTS to the token stream — the corpus is
    scanned once; the only corpus-sized shuffle is the per-doc
    aggregate, keyed uniformly by doc_id. The N_total scalar rides the
    same broadcast (1-row cross join)."""
    d = table(spark, sf_dir, "documents")
    # three consumers (freq, total, the scoring join) — persist the
    # token explode so the corpus tokenizes once
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).persist()
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = tok.agg(F.count(F.lit(1)).alias("n"))
    return (
        tok.join(F.broadcast(freq), "tok")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.avg(F.log(F.col("n") * 1.0 / F.col("c"))), 6).alias(
                "avg_surprisal"
            ),
        )
    )


@register(
    "text_boilerplate",
    oracle="""
    WITH g AS (SELECT DISTINCT doc_id,
                      unnest(CASE WHEN len(w) >= 5 THEN list_transform(
                               range(1, len(w) - 3),
                               i -> concat_ws(' ', w[i], w[i+1], w[i+2],
                                              w[i+3], w[i+4]))
                             ELSE [] END) AS gram
               FROM (SELECT doc_id, string_split(text, ' ') AS w
                     FROM documents)),
         df AS (SELECT gram, count(*) AS n_docs FROM g GROUP BY gram),
         per_doc AS (
           SELECT g.doc_id,
                  count(*) AS n_grams,
                  CAST(sum(CASE WHEN df.n_docs >= 3 THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_common
           FROM g JOIN df USING (gram)
           GROUP BY g.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
           coalesce(p.n_common, 0) AS n_common,
           round(p.n_common * 1.0 / p.n_grams, 6) AS boilerplate_ratio
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate score (C4/RefinedWeb-style): the
    fraction of a doc's distinct 5-grams that appear in >= 3 distinct
    documents — headers, footers, templates and licence blocks score
    near 1, original prose near 0. Docs too short for a 5-gram stay in
    the output with 0 grams and a NULL ratio (the guarded-gram
    pattern; see text_fingerprint).

    100 TB shape: one (doc, gram) explode keyed by gram hash (uniform
    — no skew because grams are distinct per doc), the document-
    frequency aggregate, then a per-doc rollup keyed by doc_id. The
    gram->doc_freq table is NOT broadcast (it is corpus-sized); both
    joins are equi-shuffles on their keys."""
    from spark_cep_spark.operators.llm_pipeline import grams_expr

    d = table(spark, sf_dir, "documents")
    # two consumers (the doc-frequency aggregate and the per-doc join)
    # — persist the gram explode so the corpus tokenizes once
    g = (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .select(
            "doc_id",
            F.explode(F.array_distinct(grams_expr("w", 5))).alias("gram"),
        )
    ).persist()
    df_counts = g.groupBy("gram").agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        g.join(df_counts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("n_docs") >= 3, 1).otherwise(0))
            .cast("long")
            .alias("n_common"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_common", F.lit(0)).alias("n_common"),
            F.round(F.col("n_common") * 1.0 / F.col("n_grams"), 6).alias(
                "boilerplate_ratio"
            ),
        )
    )


@register(
    "text_entropy",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(string_split_regex(text, '')) AS c
      FROM documents WHERE len(text) > 0
    ),
    cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c),
    n AS (SELECT doc_id, CAST(sum(k) AS BIGINT) AS n FROM cnt GROUP BY doc_id)
    SELECT cnt.doc_id,
           n.n AS n_chars_counted,
           round(-sum((k * 1.0 / n.n) * ln(k * 1.0 / n.n)), 6) AS char_entropy
    FROM cnt JOIN n USING (doc_id)
    GROUP BY cnt.doc_id, n.n
    """,
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy per document — the cheap
    gibberish/binary-blob detector (natural language sits in a narrow
    entropy band; base64 blobs and aaaa-spam fall far outside it).

    Shape: explode to (doc, char) — uniform keys — one count
    aggregate, one per-doc entropy rollup. Empty docs are excluded on
    both sides (no chars to measure)."""
    d = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    ch = d.select("doc_id", F.explode(F.split("text", "")).alias("c"))
    # two consumers (the per-doc total and the entropy join) — persist
    # the char-count aggregate so the char explode runs once
    cnt = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("k")).persist()
    n = cnt.groupBy("doc_id").agg(F.sum("k").cast("long").alias("n"))
    p = F.col("k") * 1.0 / F.col("n")
    return (
        cnt.join(n, "doc_id")
        .groupBy("doc_id", F.col("n").alias("n_chars_counted"))
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("char_entropy"))
    )


@register(
    "text_perplexity",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    pairs AS (
      SELECT doc_id,
             unnest(CASE WHEN len(w) >= 2 THEN list_transform(
                      range(1, len(w)), i -> concat_ws(' ', w[i], w[i+1]))
                    ELSE [] END) AS g
      FROM w),
    toks AS (SELECT doc_id, g, split_part(g, ' ', 1) AS w1 FROM pairs),
    c2 AS (SELECT g, count(*) AS c2 FROM toks GROUP BY g),
    c1 AS (SELECT w1, count(*) AS c1 FROM toks GROUP BY w1),
    scored AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             avg(ln(c1.c1 * 1.0 / c2.c2)) AS nll
      FROM toks t JOIN c2 USING (g) JOIN c1 USING (w1)
      GROUP BY t.doc_id)
    SELECT d.doc_id,
           coalesce(s.n_bigrams, 0) AS n_bigrams,
           round(s.nll, 6) AS avg_nll,
           round(exp(s.nll), 6) AS ppl
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
)
def text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM perplexity per document (CCNet-style perplexity
    filtering, one model class up from text_surprisal's unigram):
    P(w2|w1) = c(w1 w2) / c(w1·) from corpus-wide bigram counts, doc
    score = exp(mean negative log-likelihood). Repetitive/templated
    text scores near ppl 1; incoherent token salad scores high. Docs
    too short for a bigram stay in the output with NULL scores (the
    guarded-gram convention, cf. text_fingerprint).

    Scoring the training corpus itself means every scored bigram has a
    positive count — no smoothing branch, so both engines compute
    identical exact-integer ratios. 100 TB shape: bigram explode via
    the shared guarded-gram builder; the bigram-count and prefix-count
    tables are corpus-derived (NOT broadcast — bigram vocabulary grows
    with the corpus); both scoring joins are uniform equi-shuffles on
    the gram/prefix keys, then one per-doc rollup. The corpus
    tokenizes once (persisted explode, three consumers)."""
    from spark_cep_spark.operators.llm_pipeline import grams_expr

    d = table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .select("doc_id", F.explode(grams_expr("w", 2)).alias("g"))
        .withColumn("w1", F.expr("split_part(g, ' ', 1)"))
    ).persist()
    c2 = toks.groupBy("g").agg(F.count(F.lit(1)).alias("c2"))
    c1 = toks.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    scored = (
        toks.join(c2, "g")
        .join(c1, "w1")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.avg(F.log(F.col("c1") * 1.0 / F.col("c2"))).alias("nll"),
        )
    )
    return (
        d.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round("nll", 6).alias("avg_nll"),
            F.round(F.exp("nll"), 6).alias("ppl"),
        )
    )


@register(
    "text_chunk",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    x AS (
      SELECT doc_id, toks,
             unnest(range(1, len(toks) + 1, 24)) AS start
      FROM t
    )
    SELECT doc_id,
           CAST((start - 1) / 24 AS BIGINT) AS chunk_idx,
           CAST(start AS BIGINT) AS start_tok,
           CAST(len(list_slice(toks, start, start + 31)) AS BIGINT) AS n_tok,
           array_to_string(list_slice(toks, start, start + 31), ' ')
             AS chunk_text
    FROM x
    """,
)
def text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap — the pretraining/RAG
    windowing op: each document becomes ceil(n/stride) chunks of up to
    32 whitespace tokens starting every 24 (8-token overlap), so no
    token is more than one window from a chunk boundary. Trailing
    partial chunks are kept (a doc shorter than one window emits one
    chunk = itself), so content is never dropped.

    100 TB shape: pure per-row expression work — split, sequence,
    posexplode, slice, array_join, all JVM builtins inside one
    whole-stage-codegen pass; no shuffle at all, and the ~32/24 output
    amplification is streamed, never materialized per-doc. Chunk ids
    are derived (doc_id, chunk_idx), not a global counter, so the op
    is embarrassingly parallel at any scale."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(24))
    e = d.select("doc_id", toks.alias("toks"), F.posexplode(starts))
    chunk = F.slice("toks", F.col("col"), 32)
    return e.select(
        "doc_id",
        F.col("pos").cast("long").alias("chunk_idx"),
        F.col("col").cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_tok"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


@register(
    "text_vocab",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    counts AS (
      SELECT token,
             count(*) AS tf,
             count(DISTINCT doc_id) AS df
      FROM tok GROUP BY token
    )
    SELECT token, tf, df, CAST(rank AS BIGINT) AS rank FROM (
      SELECT token, tf, df,
             row_number() OVER (ORDER BY tf DESC, token) AS rank
      FROM counts) t
    WHERE rank <= 256
    """,
)
def text_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary induction: the top-256 corpus tokens by term
    frequency (ties → lexicographic), with document frequency — the
    seed table for a tokenizer build or stopword list.

    100 TB shape: explode → partial-agg groupBy(token) is the word-
    count plan: the shuffle carries (token, partial tf, partial df)
    pairs, bounded by vocabulary size per partition, never raw text.
    The final top-256 is `orderBy(...).limit(256)` — Spark plans that
    as TakeOrderedAndProject (per-partition bounded heap + driver
    merge of 256-row heads), so no partition ever sorts the full
    vocabulary; a rank *window* here would move all 10^8-10^9 distinct
    tokens of a web corpus to ONE partition (WindowExec warns exactly
    this), which is why ranks are assigned only over the 256
    survivors. Zipf skew on hot tokens is absorbed by the map-side
    combine — the hot key arrives pre-summed from each partition."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    top = counts.orderBy(F.col("tf").desc(), F.col("token")).limit(256)
    w = W.orderBy(F.col("tf").desc(), F.col("token"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("token", "tf", "df", "rank")
    )


@register(
    "text_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, count(*) AS tf
      FROM tok GROUP BY doc_id, token
    ),
    df AS (
      SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             round(tf.tf * ln(n.n_docs * 1.0 / df.df), 6) AS tfidf
      FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    )
    SELECT doc_id, token, tf, df, tfidf, CAST(rk AS BIGINT) AS rk FROM (
      SELECT doc_id, token, tf, df, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, token) AS rk
      FROM scored) t
    WHERE rk <= 10
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: each document's top-10 terms by
    tf·ln(N/df), rank ties broken on the ROUNDED score then token so
    both engines order identically (raw doubles may differ by an ulp
    across libm implementations).

    100 TB shape: two word-count aggs (per-doc tf, corpus df) that
    share the exploded layout; the df table is vocabulary-sized, so
    the score join broadcasts it; N arrives as a broadcast 1-row
    crossJoin, not a driver-side action embedded in the plan. The
    per-doc top-10 is WindowGroupLimit — partial top-k per partition,
    never a full per-doc sort."""
    d = table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs") * F.lit(1.0) / F.col("df")),
                6,
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 10)
        .select("doc_id", "token", "tf", "df", "tfidf", "rk")
    )


@register(
    "text_bigram_lm",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    big AS (
      SELECT ts[g.i] AS w1, ts[g.i + 1] AS w2
      FROM tok, unnest(generate_series(1, len(ts) - 1)) AS g(i)),
    n2 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
      FROM big GROUP BY w1, w2),
    n1 AS (
      SELECT w1, CAST(count(*) AS BIGINT) AS n_first FROM big GROUP BY w1)
    SELECT n2.w1, n2.w2, n2.n_pair, n1.n_first,
           round(n2.n_pair * 1.0 / n1.n_first, 6) AS cond_p
    FROM n2 JOIN n1 ON n2.w1 = n1.w1
    ORDER BY n2.n_pair DESC, n2.w1, n2.w2
    LIMIT 200
    """,
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based bigram language model (the n-gram LM table a
    quality/perplexity pipeline trains on, upgrading text_perplexity's
    unigram proxy): corpus bigram counts with the MLE conditional
    P(w2 | w1) = n(w1 w2) / n(w1 ·), top-200 bigrams by frequency
    (ties lexicographic — deterministic on both engines).

    100 TB shape: bigrams come from zipping each token array with its
    own tail — one whole-stage-codegen projection, no self-join on
    exploded tokens (which would shuffle corpus-sized token tables).
    The two counts are word-count aggregates (map-side partial on
    Zipf-skewed heads); the n2⋈n1 join carries NO broadcast hint — a
    web-scale corpus has 10^8-10^9 distinct tokens, so a forced
    broadcast of the unigram table would OOM exactly when the operator
    matters; AQE broadcasts when the post-agg unigram table is actually
    small and shuffle-joins on w1 (both sides already partitioned by
    w1 from their groupBys) when it is not. The final top-200 is
    orderBy+limit — TakeOrderedAndProject (bounded per-partition
    heaps), NEVER a rank window over all distinct bigrams (the
    text_vocab lesson)."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    pairs = F.arrays_zip(
        F.expr("slice(split(text, ' '), 1, size(split(text, ' ')) - 1)").alias(
            "w1"
        ),
        F.expr("slice(split(text, ' '), 2, size(split(text, ' ')) - 1)").alias(
            "w2"
        ),
    )
    big = d.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    n2 = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_pair")
    )
    n1 = big.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("n_first")
    )
    return (
        n2.join(n1, "w1")
        .select(
            "w1",
            "w2",
            "n_pair",
            "n_first",
            F.round(F.col("n_pair") * 1.0 / F.col("n_first"), 6).alias(
                "cond_p"
            ),
        )
        .orderBy(F.col("n_pair").desc(), "w1", "w2")
        .limit(200)
    )


# (query_id, query text) — fixed retrieval queries over the fixture
# vocabulary; literals in BOTH the Spark plan and the oracle SQL
_BM25_QUERIES = [
    (1, "fast table scan"),
    (2, "window agg batch"),
    (3, "customer order join"),
]
_BM25_K1, _BM25_B, _BM25_TOPK = 1.2, 0.75, 5


def _bm25_queries_sql() -> str:
    rows = ", ".join(f"({i}, '{q}')" for i, q in _BM25_QUERIES)
    return f"(VALUES {rows}) AS q(query_id, qtext)"


def bm25_oracle_ctes() -> str:
    """The BM25 ranking as a reusable oracle CTE chain (ends with
    `bm25_ranked(query_id, doc_id, score, rk)`), shared by
    text_bm25_topk's oracle and sim_rrf_hybrid's."""
    return f"""
    d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM d),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             avg(CAST(dl AS DOUBLE)) AS avgdl
      FROM dl
    ),
    qterm AS (
      SELECT query_id, unnest(string_split(qtext, ' ')) AS term
      FROM {_bm25_queries_sql()}
    ),
    tf AS (
      SELECT d.doc_id, t.term, CAST(count(*) AS BIGINT) AS tf
      FROM d, LATERAL (SELECT unnest(w) AS term) t
      WHERE t.term IN (SELECT DISTINCT term FROM qterm)
      GROUP BY d.doc_id, t.term
    ),
    df AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    bm25_scored AS (
      SELECT q.query_id, tf.doc_id,
             sum(
               ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0)
               * tf.tf * ({_BM25_K1} + 1.0)
               / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                  + {_BM25_B} * dl.dl / stats.avgdl))
             ) AS score
      FROM qterm q
      JOIN tf ON tf.term = q.term
      JOIN df ON df.term = q.term
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY q.query_id, tf.doc_id
    ),
    bm25_ranked AS (
      SELECT query_id, doc_id, round(score, 6) AS score,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY round(score, 6) DESC, doc_id)
               AS rk
      FROM bm25_scored
    )"""


@register(
    "text_bm25_topk",
    oracle=f"""
    WITH {bm25_oracle_ctes()}
    SELECT query_id, CAST(rk AS BIGINT) AS rk, doc_id, score
    FROM bm25_ranked WHERE rk <= {_BM25_TOPK}
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 full-text retrieval (Robertson/Lucene formulation, k1=1.2,
    b=0.75, idf = ln((N-df+0.5)/(df+0.5)+1)): top-5 documents per
    query for a fixed query set — the lexical half of every hybrid
    retrieval / RAG data pipeline, expressed as pure relational
    algebra.

    100 TB shape: the exploded token stream is FILTERED TO QUERY TERMS
    before any aggregation (predicate on the generator output — the
    per-(doc,term) tf table is bounded by |query vocabulary| × docs
    containing those terms, never the full posting list); df and the
    (N, avgdl) scalars are tiny aggregates joined back by broadcast;
    the per-query ranking is rank-on-ROUNDED-score (both engines rank
    identical 6dp values — ulp-level ln/division drift cannot flip an
    order) with WindowGroupLimit keeping only top-5 per partition.
    ONE shuffle of query-term postings + one broadcast join chain."""
    return bm25_ranked(spark, sf_dir, _BM25_TOPK)


def bm25_ranked(spark: SparkSession, sf_dir: str, topk: int) -> DataFrame:
    """BM25 core shared by text_bm25_topk and sim_rrf_hybrid:
    (query_id, rk, doc_id, score) for the fixed _BM25_QUERIES, top-k
    per query. See text_bm25_topk's docstring for the scale shape."""
    d = table(spark, sf_dir, "documents")
    qdf = spark.createDataFrame(_BM25_QUERIES, "query_id int, qtext string")
    qterm = qdf.select(
        "query_id", F.explode(F.split("qtext", " ")).alias("term")
    )
    terms = [t for _, q in _BM25_QUERIES for t in q.split(" ")]

    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term").isin(terms))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dl = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))

    k1, b = F.lit(_BM25_K1), F.lit(_BM25_B)
    contrib = (
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            + 1.0
        )
        * F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        qterm.join(tf, "term")
        .join(F.broadcast(df_t), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.select(
            "query_id",
            F.row_number().over(w).cast("long").alias("rk"),
            "doc_id",
            "score",
        )
        .filter(F.col("rk") <= topk)
    )


@register(
    "text_perplexity_bigram",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    big AS (
      SELECT doc_id,
             unnest(w[1:len(w)-1]) AS w1,
             unnest(w[2:len(w)]) AS w2
      FROM t WHERE len(w) >= 2
    ),
    n2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
           FROM big GROUP BY w1, w2),
    n1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS n_first
           FROM big GROUP BY w1)
    SELECT big.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln(n1.n_first * 1.0 / n2.n_pair)), 6) AS avg_nll,
           round(exp(avg(ln(n1.n_first * 1.0 / n2.n_pair))), 4) AS ppl
    FROM big
    JOIN n2 ON n2.w1 = big.w1 AND n2.w2 = big.w2
    JOIN n1 ON n1.w1 = big.w1
    GROUP BY big.doc_id
    """,
)
def text_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM perplexity (the Gopher/CCNet-style
    quality signal, upgrading text_surprisal's unigram model): score
    each document's bigrams under the corpus-trained MLE conditional
    P(w2|w1) = n(w1 w2)/n(w1 ·); emit mean negative log-likelihood
    and its exp (the perplexity). High ppl = improbable word
    transitions = boilerplate/gibberish candidates for pruning.

    100 TB shape: bigrams come from zipping each token array with its
    own tail (ONE codegen projection — never a positional self-join
    of exploded tokens); the pair counts are one map-side-combinable
    word-count aggregate, the unigram counts its w1-rollup; the score
    join is ONE equi-join on the bigram key, co-partitioned with the
    groupBy that built it (AQE reuses the partitioning). No broadcast
    hints — the
    bigram vocabulary of a web corpus does not fit an executor (the
    text_bigram_lm lesson). Per-doc avg-of-ln is rounded at 6dp on
    both engines (summation-order ulps)."""
    d = table(spark, sf_dir, "documents")
    pairs = F.arrays_zip(
        F.expr("slice(split(text, ' '), 1, size(split(text, ' ')) - 1)").alias(
            "w1"
        ),
        F.expr("slice(split(text, ' '), 2, size(split(text, ' ')) - 1)").alias(
            "w2"
        ),
    )
    big = d.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )
    n2 = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_pair")
    )
    # n(w1 ·) is the w1-rollup of the pair counts — summing n_pair
    # over a w1 window of the ALREADY-AGGREGATED n2 table gives the
    # same number as re-counting the raw bigram stream, without a
    # second explode+shuffle of it; carrying n_first on the n2 row
    # also folds the two score joins (on (w1,w2) and on w1) into one.
    # Skew-safe: the window partition is bounded by |vocab|, not by
    # corpus size (hot-word mass was collapsed by the n2 aggregate).
    n2j = n2.withColumn(
        "n_first", F.sum("n_pair").over(W.partitionBy("w1"))
    )
    nll = F.log(F.col("n_first") * 1.0 / F.col("n_pair"))
    return (
        big.join(n2j, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(F.avg(nll), 6).alias("avg_nll"),
            F.round(F.exp(F.avg(nll)), 4).alias("ppl"),
        )
    )


@register(
    "text_feat_hash",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS tok
      FROM documents
    )
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(tok), 1, 6) AS INTEGER) % 256
                AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS tf
    FROM tok WHERE tok <> ''
    GROUP BY doc_id, bucket
    """,
)
def text_feat_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the hashing trick): token -> md5-derived bucket
    in [0, 256) -> per-document term frequency. The fixed-width bucket
    space replaces an unbounded vocabulary join — the standard way to
    featurise a web-scale corpus for a linear quality classifier
    without materialising (or broadcasting) a vocab.

    md5 is the cross-engine-identical hash (same convention as the
    dedup family); real deployments would use the cheaper murmur3.

    Scale: explode -> one hash aggregation on (doc_id, bucket), both
    map-side combinable; output is bounded at docs x 256 rows
    regardless of vocabulary size — that bound is the point."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(
            F.filter(
                F.split(F.coalesce("text", F.lit("")), " "),
                lambda t: t != "",
            )
        ).alias("tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 6), 16, 10).cast("long") % 256
    )
    return tok.groupBy(
        "doc_id", bucket.alias("bucket")
    ).agg(F.count(F.lit(1)).cast("long").alias("tf"))


@register(
    "pipeline_bpe_pairs",
    oracle="""
    WITH words AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      FROM documents
    ),
    pairs AS (
      SELECT substring(w, CAST(i AS INTEGER), 2) AS pair
      FROM words, unnest(range(1, length(w))) AS t(i)
    )
    SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM pairs
    GROUP BY pair ORDER BY cnt DESC, pair LIMIT 50
    """,
)
def pipeline_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training merge step at corpus scale: count every
    adjacent character pair inside every word and rank the merge
    candidates (top-50 by count, pair tie-break) — the inner loop of
    byte-pair-encoding tokenizer training, which at 100 TB is THE
    dominant cost of building a tokenizer. Pure built-ins: regexp
    word split -> explode, pair enumeration via
    transform(sequence(...)) (whole-stage codegen, no Python), one
    hash aggregate on a ~26^2-key space (map-side combine collapses
    each partition to <=676 rows), TakeOrderedAndProject for the
    top-50 — no single-partition stage anywhere."""
    docs = table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(w) - 1),"
                " i -> substring(w, i, 2))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(50)
    )


_BPE_MERGES = 32


def _bpe_oracle_chain_parts(
    n_merges: int, src: str = "documents"
) -> list:
    """CTE parts of the BPE oracle chain, without the WITH keyword —
    so pipeline_e2e can splice the chain after its own CTEs with a
    different source relation (the filtered survivor set)."""
    parts = [
        "ws AS MATERIALIZED (SELECT unnest(regexp_extract_all(lower(text),"
        f" '[a-z]+')) AS w FROM {src})",
        "w0 AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS freq,"
        " list_transform(range(1, length(w)+1),"
        " i -> substring(w, CAST(i AS INTEGER), 1)) AS syms"
        " FROM ws GROUP BY w)",
    ]
    for k in range(n_merges):
        parts.append(
            f"p{k} AS MATERIALIZED (SELECT pr[1] AS a, pr[2] AS b,"
            " CAST(sum(freq) AS BIGINT) AS cnt FROM"
            " (SELECT freq, unnest(list_transform(range(1, len(syms)),"
            " i -> [syms[CAST(i AS INTEGER)],"
            " syms[CAST(i AS INTEGER)+1]])) AS pr"
            f" FROM w{k} WHERE len(syms) >= 2)"
            " GROUP BY pr[1], pr[2])"
        )
        parts.append(
            f"t{k} AS MATERIALIZED (SELECT a, b, cnt FROM p{k}"
            " ORDER BY cnt DESC, a, b LIMIT 1)"
        )
        parts.append(
            f"w{k+1} AS MATERIALIZED (SELECT w{k}.w, w{k}.freq,"
            f" CASE WHEN t.a IS NULL OR len(w{k}.syms) < 2"
            f" THEN w{k}.syms"
            f" ELSE list_reduce(list_transform(w{k}.syms, s -> [s]),"
            " (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = t.a"
            " AND x[1] = t.b"
            " THEN list_concat(acc[1:len(acc)-1], [t.a || t.b])"
            " ELSE list_concat(acc, x) END)"
            f" END AS syms FROM w{k} LEFT JOIN t{k} t ON TRUE)"
        )
    return parts


def _bpe_oracle_chain(n_merges: int, src: str = "documents") -> str:
    """The WITH-chain both BPE oracles share: w0 = the distinct-word
    table (freq + character symbols), then n_merges unrolled stages of
    (pair count → top-1 pick → greedy left-to-right merge).  Generated
    by the same Python loop that drives the Spark trainer — the
    _SPARK_MORTON16 discipline: one spelling, two engines.  The merge
    fold is DuckDB list_reduce over singleton lists (the accumulator
    seed is the first symbol), bit-identical to Spark's aggregate()
    fold from an empty array; LEFT JOIN ON TRUE keeps stages total
    when a round finds no pair (t.a IS NULL → no-op)."""
    return "WITH " + ",\n".join(_bpe_oracle_chain_parts(n_merges, src))


def _bpe_merge_table_oracle(n_merges: int) -> str:
    selects = [
        f"SELECT CAST({k + 1} AS BIGINT) AS step, a AS lhs, b AS rhs,"
        f" a || b AS merged, cnt AS pair_cnt FROM t{k}"
        for k in range(n_merges)
    ]
    return (
        _bpe_oracle_chain(n_merges)
        + "\nSELECT * FROM ("
        + " UNION ALL ".join(selects)
        + ")"
    )


def _bpe_tokens_oracle(n_merges: int) -> str:
    return (
        _bpe_oracle_chain(n_merges)
        + f""",
    dw AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                  '[a-z]+')) AS w FROM documents),
    dwc AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS cnt
            FROM dw GROUP BY doc_id, w)
    SELECT d.doc_id,
           CAST(sum(d.cnt * len(f.syms)) AS BIGINT) AS n_tokens
    FROM dwc d JOIN w{n_merges} f ON f.w = d.w
    GROUP BY d.doc_id"""
    )


def bpe_train_words(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = _BPE_MERGES,
    docs: DataFrame | None = None,
):
    """Train a BPE tokenizer at corpus scale (round-8 verdict item 5 —
    pipeline_bpe_pairs iterated to the artifact an LLM pipeline
    ships): returns (final word table (w, freq, syms), merge list
    [(step, lhs, rhs, merged, pair_cnt)]).

    Distributed shape: the ONLY corpus-scale work is the initial
    word-frequency aggregation (map-side combinable); the n_merges
    training rounds run over the DISTINCT-WORD table (vocabulary-
    sized — millions of rows at 100 TB, not the corpus), each round
    one pair aggregation (map-side combinable, key space ≤ current
    vocab²) + a 1-row driver collect of the winning pair (bounded by
    contract) + one JVM-side aggregate() fold applying the merge.
    The word table is eagerly localCheckpoint-ed per round (lineage
    would otherwise chain n_merges folds and recompute O(n²) of
    them), releasing the previous round's blocks — the round-8
    ADVICE discipline.  Tie-break everywhere: (count DESC, lhs, rhs),
    identical in both engines."""
    if docs is None:
        docs = table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
        ).alias("w")
    )
    wf = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .withColumn(
            "syms",
            F.expr(
                "transform(sequence(1, length(w)), "
                "i -> substring(w, i, 1))"
            ),
        )
    )
    wf = wf.localCheckpoint(eager=True)
    merges: list[tuple] = []
    for step in range(1, n_merges + 1):
        top = (
            wf.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms) - 1), "
                        "i -> struct(element_at(syms, i) AS a, "
                        "element_at(syms, i + 1) AS b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        m = a + b
        merges.append((step, a, b, m, cnt))
        # tokens are [a-z]+ so the literals are quote-safe
        nxt = wf.withColumn(
            "syms",
            F.expr(
                "aggregate(syms, CAST(array() AS array<string>), "
                "(acc, x) -> CASE WHEN size(acc) > 0 "
                f"AND element_at(acc, -1) = '{a}' AND x = '{b}' "
                f"THEN concat(slice(acc, 1, size(acc) - 1), "
                f"array('{m}')) "
                "ELSE concat(acc, array(x)) END)"
            ),
        ).localCheckpoint(eager=True)
        wf.unpersist()
        wf = nxt
    return wf, merges


@register(
    "pipeline_bpe_train",
    oracle=_bpe_merge_table_oracle(_BPE_MERGES),
)
def pipeline_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained-tokenizer MERGE TABLE: 32 BPE merge rounds over the
    corpus (greedy left-to-right application, (count DESC, lhs, rhs)
    tie-break), emitted as (step, lhs, rhs, merged, pair_cnt) — the
    ordered merge list IS the tokenizer artifact a BPE implementation
    loads.  The oracle replays all 32 rounds as an unrolled WITH chain
    generated by the same Python loop (list_reduce fold ==
    aggregate() fold, both engines bit-identical — tested on the
    odd-run [a,a,a,a,a] case where naive string replace diverges)."""
    merges = bpe_train_words(spark, sf_dir)[1]
    return spark.createDataFrame(
        merges,
        "step long, lhs string, rhs string, merged string, "
        "pair_cnt long",
    )


@register(
    "pipeline_bpe_tokens",
    oracle=_bpe_tokens_oracle(_BPE_MERGES),
)
def pipeline_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the FINAL trained vocab — the
    number every training-data pipeline actually budgets by (context
    packing, per-source token quotas, dedup cost models).  Train the
    32-merge tokenizer, then join each document's word frequencies
    against the vocabulary's final per-word token length: one
    corpus-scale (doc_id, w) aggregation + one vocabulary join (AQE
    broadcasts the vocab side at our SFs; at 100 TB it is a plain
    shuffle join on w, still vocabulary-bounded on the right)."""
    return bpe_doc_tokens(
        spark, table(spark, sf_dir, "documents"), _BPE_MERGES
    )


def bpe_doc_tokens(
    spark: SparkSession, docs: DataFrame, n_merges: int = _BPE_MERGES
) -> DataFrame:
    """Per-document (doc_id, n_tokens) under a tokenizer trained on
    THE SAME docs frame — shared by pipeline_bpe_tokens (whole corpus)
    and pipeline_e2e (the filtered survivor set, fewer merges)."""
    wf, _ = bpe_train_words(spark, None, n_merges=n_merges, docs=docs)
    dwc = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("w"),
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    tl = wf.select("w", F.size("syms").cast("long").alias("tlen"))
    return (
        dwc.join(tl, "w")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("tlen")).alias("n_tokens"))
    )


@register(
    "text_readability",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT)
               AS c,
             CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS w,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS BIGINT) AS s
      FROM documents
    )
    SELECT doc_id,
           CAST(floor((471 * c * s + 50 * w * w - 2143 * w * s) * 10000
                      * 1.0 / (100 * w * s)) AS BIGINT) AS ari_e4
    FROM f WHERE w > 0
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automated Readability Index per document — the syllable-free
    readability score (4.71*chars/word + 0.5*words/sentence - 21.43),
    so it is exactly computable with no phonetic heuristic drift. A
    quality-filter feature alongside text_quality: very low ARI =
    fragment soup, very high = run-on boilerplate. Single narrow
    projection over the corpus scan (no shuffle). Emitted as an exact
    1e-4 fixed-point integer: the formula is carried as one integer
    rational (471*c*s + 50*w^2 - 2143*w*s) / (100*w*s), scaled and
    floored after a SINGLE IEEE division — two different multi-step
    float expression trees rounded at the end diverged in the last
    ulp (found by the oracle gate), one correctly-rounded division of
    exactly-representable integers cannot."""
    docs = table(spark, sf_dir, "documents")
    c = F.length(F.regexp_replace("text", r"\s", "")).cast("long")
    w = F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)")).cast("long")
    s = F.greatest(
        F.size(F.expr(r"regexp_extract_all(text, '[.!?]+', 0)")),
        F.lit(1),
    ).cast("long")
    num = (
        F.lit(471) * c * s + F.lit(50) * w * w - F.lit(2143) * w * s
    ) * F.lit(10000)
    den = F.lit(100) * w * s
    return docs.filter(w > 0).select(
        "doc_id",
        F.floor(num.cast("double") / den.cast("double"))
        .cast("long")
        .alias("ari_e4"),
    )


@register(
    "text_zipf_fit",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    counts AS (
      SELECT token, count(*) AS tf FROM tok GROUP BY token
    ),
    top AS (
      SELECT token, tf,
             row_number() OVER (ORDER BY tf DESC, token) AS rank
      FROM counts
      ORDER BY tf DESC, token LIMIT 200
    ),
    xy AS (
      SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(tf AS DOUBLE)) AS y
      FROM top
    ),
    s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sxx
      FROM xy
    )
    SELECT CAST(n AS BIGINT) AS n,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
                 / n, 6) AS intercept
    FROM s
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus frequency distribution: least-squares
    slope/intercept of ln(tf) vs ln(rank) over the top-200 tokens — a
    one-row distributional-health check (natural language sits near
    slope -1; a scraped corpus full of boilerplate or spam drifts
    far off it). Plan: the text_vocab word-count shape (explode →
    map-side-combined count, TakeOrderedAndProject top-200), then a
    rank window over ONLY the 200 survivors and one global aggregate
    of the 5 regression sums — the closed-form normal equations are
    spelled identically in the oracle so both engines share the same
    arithmetic path before the shared round(6)."""
    d = table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("token"))
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    top = counts.orderBy(F.col("tf").desc(), F.col("token")).limit(200)
    w = W.orderBy(F.col("tf").desc(), F.col("token"))
    xy = top.withColumn("rank", F.row_number().over(w)).select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("tf").cast("double")).alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@register(
    "corpus_ngram_novelty",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             md5(array_to_string(list_slice(t, CAST(i AS INTEGER),
                                            CAST(i AS INTEGER) + 4), ' '))
               AS h
      FROM tok, unnest(range(1, len(t) - 3)) AS u(i)
      WHERE len(t) >= 5
    ),
    firsts AS (SELECT h, min(doc_id) AS fd FROM sh GROUP BY h),
    per AS (
      SELECT sh.doc_id,
             CAST(count(*) AS BIGINT) AS n_shingles,
             CAST(sum(CASE WHEN f.fd = sh.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel
      FROM sh JOIN firsts f ON f.h = sh.h
      GROUP BY sh.doc_id
    )
    SELECT doc_id, n_shingles, n_novel,
           round(n_novel * 1.0 / n_shingles, 6) AS novel_frac
    FROM per
    """,
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty (the RefinedWeb/Gopher-style
    redundancy census): the fraction of a doc's distinct 5-gram word
    shingles whose FIRST corpus occurrence (min doc_id) is this doc —
    low novelty flags near-template documents even when no single
    pair crosses a dedup threshold. Docs under 5 tokens have no
    shingles and are excluded (both engines' WHERE len >= 5).

    100 TB shape: shingles are md5-hashed BEFORE the shuffle (the
    llm_dedup convention — 32-hex keys, never raw 5-gram text), the
    first-occurrence table is one min-aggregate over distinct
    (hash, doc) pairs, and the join back is hash-partitioned on the
    same key, so the whole op is two shuffles of fixed-width rows."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    sh = (
        d.filter(F.size(toks) >= 5)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - 4),
                    lambda i: F.md5(
                        F.array_join(F.slice(toks, i, 5), " ")
                    ),
                )
            ).alias("h"),
        )
        .distinct()
    )
    firsts = sh.groupBy("h").agg(F.min("doc_id").alias("fd"))
    per = (
        sh.join(firsts, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("fd") == F.col("doc_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per.select(
        "doc_id",
        "n_shingles",
        "n_novel",
        F.round(
            F.col("n_novel") * F.lit(1.0) / F.col("n_shingles"), 6
        ).alias("novel_frac"),
    )


@register(
    "text_collocations",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    big AS (
      SELECT ts[g.i] AS w1, ts[g.i + 1] AS w2
      FROM tok, unnest(generate_series(1, len(ts) - 1)) AS g(i)),
    n2 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
      FROM big GROUP BY w1, w2),
    n1l AS (
      SELECT w1, CAST(count(*) AS BIGINT) AS n_left FROM big GROUP BY w1),
    n1r AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS n_right FROM big GROUP BY w2),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM big)
    SELECT n2.w1, n2.w2, n2.n_pair,
           n2.n_pair * tot.n_total AS lift_num,
           n1l.n_left * n1r.n_right AS lift_den,
           round(CAST(n2.n_pair * tot.n_total AS DOUBLE)
                 / CAST(n1l.n_left * n1r.n_right AS DOUBLE), 6) AS lift
    FROM n2
    JOIN n1l ON n1l.w1 = n2.w1
    JOIN n1r ON n1r.w2 = n2.w2
    CROSS JOIN tot
    WHERE n2.n_pair >= 5
    ORDER BY n2.n_pair DESC, n2.w1, n2.w2
    LIMIT 100
    """,
)
def text_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining (PMI-family): bigrams whose observed count
    exceeds what the marginals predict — lift = N·c(w1,w2) /
    (c(w1,·)·c(·,w2)), the exponent argument of PMI (log lift), which
    is monotone in PMI so ranking and thresholds carry over. The lift
    is emitted BOTH as an exact integer rational (lift_num/lift_den —
    no cross-engine libm log in the hash) and as the rounded double
    quotient of those two exact integers (IEEE division of identical
    inputs is deterministic).

    100 TB shape: bigrams via the array-zip projection (no exploded
    token self-join), three word-keyed aggregates with map-side
    partials, NO broadcast hints on the marginal joins (10^8+ distinct
    tokens at web scale — AQE decides; all three sides are already
    hash-partitioned by their join key from the groupBys), N as a
    broadcast 1-row aggregate, min-count 5 prunes the Zipf tail before
    the joins, and the top-100 is TakeOrderedAndProject."""
    d = table(spark, sf_dir, "documents")
    pairs = F.arrays_zip(
        F.expr("slice(split(text, ' '), 1, size(split(text, ' ')) - 1)").alias(
            "w1"
        ),
        F.expr("slice(split(text, ' '), 2, size(split(text, ' ')) - 1)").alias(
            "w2"
        ),
    )
    big = d.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    n2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_pair"))
    n1l = big.groupBy("w1").agg(F.count(F.lit(1)).alias("n_left"))
    n1r = big.groupBy("w2").agg(F.count(F.lit(1)).alias("n_right"))
    tot = big.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        n2.filter(F.col("n_pair") >= 5)
        .join(n1l, "w1")
        .join(n1r, "w2")
        .join(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "n_pair",
            (F.col("n_pair") * F.col("n_total")).alias("lift_num"),
            (F.col("n_left") * F.col("n_right")).alias("lift_den"),
            F.round(
                (F.col("n_pair") * F.col("n_total")).cast("double")
                / (F.col("n_left") * F.col("n_right")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_pair"), "w1", "w2")
        .limit(100)
    )


@register(
    "text_rep_signals",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
      FROM documents
    ),
    base AS (
      SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n_words FROM t
    ),
    big AS (
      SELECT doc_id,
             unnest(w[1:len(w)-1]) || ' ' || unnest(w[2:len(w)]) AS bg
      FROM base WHERE len(w) >= 2
    ),
    bcnt AS (
      SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS c
      FROM big GROUP BY doc_id, bg
    ),
    btop AS (
      SELECT doc_id, bg, c FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY c DESC, bg) AS rk
        FROM bcnt
      ) WHERE rk = 1
    ),
    g5 AS (
      SELECT doc_id, CAST(i AS BIGINT) AS pos,
             array_to_string(
               w[CAST(i AS INTEGER):CAST(i + 4 AS INTEGER)], ' ') AS g
      FROM base, unnest(range(1, len(w) - 3)) AS r(i)
      WHERE len(w) >= 5
    ),
    d5 AS (
      SELECT doc_id, g FROM g5 GROUP BY doc_id, g HAVING count(*) >= 2
    ),
    pos5 AS (
      SELECT g5.doc_id, g5.pos FROM g5 JOIN d5 USING (doc_id, g)
    ),
    cov0 AS (
      SELECT doc_id,
             least(5, pos - coalesce(
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos),
               pos - 5)) AS d
      FROM pos5
    ),
    cov AS (
      SELECT doc_id, CAST(sum(d) AS BIGINT) AS covered
      FROM cov0 GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_words,
           btop.bg AS top_bigram,
           coalesce(btop.c, 0) AS top2_cnt,
           round(coalesce(btop.c, 0) * 1.0
                 / greatest(b.n_words - 1, 1), 6) AS top2_frac,
           coalesce(cov.covered, 0) AS dup5_words,
           round(coalesce(cov.covered, 0) * 1.0 / b.n_words, 6)
             AS dup5_frac
    FROM base b
    LEFT JOIN btop USING (doc_id)
    LEFT JOIN cov USING (doc_id)
    """,
)
def text_rep_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition signals (Rae et al 2021
    §A1.1 — the rules that drop keyboard-mash and boilerplate-looped
    pages before training): per document, (a) the most frequent word
    bigram and the fraction of bigram slots it occupies (Gopher's
    top-n-gram-fraction family, word-slot variant since the fixture
    text is unpunctuated), and (b) the fraction of word positions
    covered by 5-grams that occur MORE THAN ONCE in the document
    (Gopher's duplicate-n-gram-character-fraction, word-position
    variant) — coverage is a true union, overlapping occurrences never
    double-count a word (the pipeline_substring_dedup window-union
    trick: sum(least(5, pos - prev_pos)) over the duplicate-gram
    positions).

    100 TB shape: everything is per-document — the bigram/5-gram
    explodes shuffle on (doc_id, gram) with map-side combine, the
    top-1 and coverage windows partition BY DOCUMENT (bounded by doc
    length, never corpus size), and the three joins are doc-keyed.
    Exact integers end to end; the two emitted fractions are single
    IEEE divisions of exact BIGINTs, deterministic on both engines.
    Ties for the top bigram break lexicographically (smallest wins) —
    pinned so the hash cannot flip on count ties."""
    d = table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.split(F.coalesce("text", F.lit("")), " ").alias("w"),
    ).select(
        "doc_id", "w", F.size("w").cast("long").alias("n_words")
    )
    pairs = F.arrays_zip(
        F.expr("slice(w, 1, size(w) - 1)").alias("w1"),
        F.expr("slice(w, 2, size(w) - 1)").alias("w2"),
    )
    big = (
        base.filter(F.col("n_words") >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("p.w1"), F.col("p.w2")).alias("bg"),
        )
    )
    bcnt = big.groupBy("doc_id", "bg").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_top = W.partitionBy("doc_id").orderBy(F.desc("c"), "bg")
    btop = (
        bcnt.withColumn("rk", F.row_number().over(w_top))
        .filter(F.col("rk") == 1)
        .select("doc_id", F.col("bg").alias("top_bigram"), "c")
    )
    g5 = (
        base.filter(F.col("n_words") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 4), "
                    "i -> struct(CAST(i AS BIGINT) AS pos, "
                    "array_join(slice(w, i, 5), ' ') AS g))"
                )
            ).alias("x"),
        )
        .select("doc_id", "x.pos", "x.g")
    )
    d5 = (
        g5.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c5"))
        .filter(F.col("c5") >= 2)
        .select("doc_id", "g")
    )
    w_pos = W.partitionBy("doc_id").orderBy("pos")
    cov = (
        g5.join(d5, ["doc_id", "g"])
        .select(
            "doc_id",
            F.least(
                F.lit(5),
                F.col("pos")
                - F.coalesce(
                    F.lag("pos").over(w_pos), F.col("pos") - 5
                ),
            ).alias("dcov"),
        )
        .groupBy("doc_id")
        .agg(F.sum("dcov").cast("long").alias("covered"))
    )
    return (
        base.select("doc_id", "n_words")
        .join(btop, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "top_bigram",
            F.coalesce("c", F.lit(0)).cast("long").alias("top2_cnt"),
            F.round(
                F.coalesce("c", F.lit(0))
                * 1.0
                / F.greatest(F.col("n_words") - 1, F.lit(1)),
                6,
            ).alias("top2_frac"),
            F.coalesce("covered", F.lit(0)).cast("long").alias("dup5_words"),
            F.round(
                F.coalesce("covered", F.lit(0)) * 1.0 / F.col("n_words"),
                6,
            ).alias("dup5_frac"),
        )
    )


# Gopher's stopword-presence rule uses {the, be, to, of, and, that,
# have, with}; the synthetic fixture vocabulary only contains 'the',
# which would make the >=2 rule vacuously false everywhere — this is
# the same rule SHAPE over a corpus-adapted lexicon (documented; a
# real deployment swaps the list back).
_GOPHER_STOPWORDS = "the a data value table row"


@register(
    "text_gopher_rules",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(coalesce(text, ''), ' '),
                         x -> x <> '') AS w
      FROM documents
    ),
    s AS (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(w, x -> length(x))),
                           0) AS BIGINT) AS sum_len,
             CAST(len(list_filter(string_split('{_GOPHER_STOPWORDS}', ' '),
                                  s -> list_contains(w, s)))
                  AS BIGINT) AS n_stop_hits
      FROM t
    )
    SELECT doc_id, n_words, sum_len,
           round(sum_len * 1.0 / greatest(n_words, 1), 6)
             AS mean_word_len,
           n_stop_hits,
           n_words BETWEEN 10 AND 100000 AS word_count_ok,
           (2 * n_words <= sum_len AND sum_len <= 10 * n_words)
             AS mean_len_ok,
           n_stop_hits >= 2 AS stop_ok,
           (n_words BETWEEN 10 AND 100000
            AND 2 * n_words <= sum_len AND sum_len <= 10 * n_words
            AND n_stop_hits >= 2) AS keep
    FROM s
    """,
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule filter (Rae et al 2021 §A1.1): per document,
    the word count bound, the mean-word-length band, and the
    stopword-presence rule (>= 2 distinct stopwords — corpus-adapted
    lexicon, see _GOPHER_STOPWORDS), each as its own flag plus the
    combined keep verdict — the standard cheap-heuristic gate run over
    a whole crawl before any model-based scoring.

    100 TB shape: one whole-stage-codegen projection per document —
    no explode, no join, no shuffle at all (the plan is scan ->
    project). The mean-word-length band is evaluated in EXACT
    cross-multiplied integers (2·n <= sum_len <= 10·n), never a float
    compare; the emitted mean is one IEEE division of exact BIGINTs
    for display only."""
    return gopher_stats(table(spark, sf_dir, "documents"))


def gopher_stats(d: DataFrame, carry: tuple = ()) -> DataFrame:
    """The Gopher rule evaluation over an arbitrary documents frame —
    shared by text_gopher_rules, pipeline_e2e's first stage, and the
    corpus-intake faces (ONE spelling of the stopword/band
    expressions).  `carry` names extra input columns replicated onto
    the output UNCHANGED — on a STREAMING input this is the only
    legal way to keep (ts, text) next to the flags: joining the
    projection back to its own source would plan as a stateful
    stream-stream self-join with unbounded state (round-10 review
    catch), where this stays one pure projection."""
    stop_arr = F.split(F.lit(_GOPHER_STOPWORDS), " ")
    w = F.filter(
        F.split(F.coalesce("text", F.lit("")), " "), lambda x: x != ""
    )
    s = d.select(
        "doc_id",
        *carry,
        F.size(w).cast("long").alias("n_words"),
        F.coalesce(
            F.expr(
                "aggregate(transform(filter(split(coalesce(text, ''), ' '), "
                "x -> x != ''), x -> length(x)), 0L, (a, x) -> a + x)"
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("sum_len"),
        F.size(
            F.filter(stop_arr, lambda st: F.array_contains(w, st))
        )
        .cast("long")
        .alias("n_stop_hits"),
    )
    wc_ok = (F.col("n_words") >= 10) & (F.col("n_words") <= 100000)
    ml_ok = (2 * F.col("n_words") <= F.col("sum_len")) & (
        F.col("sum_len") <= 10 * F.col("n_words")
    )
    st_ok = F.col("n_stop_hits") >= 2
    return s.select(
        "doc_id",
        *carry,
        "n_words",
        "sum_len",
        F.round(
            F.col("sum_len") * 1.0 / F.greatest("n_words", F.lit(1)), 6
        ).alias("mean_word_len"),
        "n_stop_hits",
        wc_ok.alias("word_count_ok"),
        ml_ok.alias("mean_len_ok"),
        st_ok.alias("stop_ok"),
        (wc_ok & ml_ok & st_ok).alias("keep"),
    )


@register(
    "text_bigram_kn",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    big AS (
      SELECT ts[g.i] AS w1, ts[g.i + 1] AS w2
      FROM tok, unnest(generate_series(1, len(ts) - 1)) AS g(i)),
    n2 AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
      FROM big GROUP BY w1, w2),
    n1 AS (
      SELECT w1, CAST(count(*) AS BIGINT) AS n_first FROM big GROUP BY w1),
    fw AS (
      SELECT w1, CAST(count(*) AS BIGINT) AS n1p_fw FROM n2 GROUP BY w1),
    bw AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS n1p_bw FROM n2 GROUP BY w2),
    tt AS (SELECT CAST(count(*) AS BIGINT) AS t FROM n2)
    SELECT n2.w1, n2.w2, n2.n_pair,
           round(CAST(n1p_bw AS DOUBLE) / t, 6) AS p_cont,
           round(CAST((4 * n_pair - 3) * t + 3 * n1p_fw * n1p_bw AS DOUBLE)
                 / CAST(4 * t * n_first AS DOUBLE), 6) AS p_kn
    FROM n2
    JOIN n1 ON n2.w1 = n1.w1
    JOIN fw ON n2.w1 = fw.w1
    JOIN bw ON n2.w2 = bw.w2
    CROSS JOIN tt
    ORDER BY n2.n_pair DESC, n2.w1, n2.w2
    LIMIT 200
    """,
)
def text_bigram_kn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram LM (Kneser & Ney 1995; the
    smoothing KenLM-class quality models use, upgrading
    text_bigram_lm's raw MLE): with absolute discount D = 0.75,
      P_KN(w2|w1) = (c(w1,w2) − D)/c(w1·)
                    + D·N₁₊(w1·)/c(w1·) · N₁₊(·w2)/N₁₊(··)
    — the continuation probability P_cont(w2) rewards words that
    follow MANY histories, not merely frequent ones (the 'San
    Francisco' correction).  Exact-arithmetic spelling: with D = 3/4
    and every count ≥ 1 the discount never clamps, so the whole
    expression folds to ONE integer-valued fraction
      ((4·c₁₂ − 3)·T + 3·N₁₊fw·N₁₊bw) / (4·T·c₁),
    divided once as double on both engines — no intermediate float
    products to diverge (RULE 5 class).  Top-200 by pair count, ties
    lexicographic.  Count products stay within BIGINT while
    T·c₁₂ < 2⁶¹ (documented bound; a 10⁹-type corpus with 10⁹-count
    heads needs the decimal(38,0) widening, the win_pareto_share
    lesson).

    100 TB shape: bigrams from the tail-zip projection (no token
    self-join); FOUR map-side-combinable aggregates; the type total T
    is a 1-row broadcast scalar; fw/bw re-aggregate the ALREADY
    unique n2 table (type counts, not corpus scans); final top-200 is
    TakeOrderedAndProject — bounded per-partition heaps, never a
    global rank window."""
    d = table(spark, sf_dir, "documents")
    pairs = F.arrays_zip(
        F.expr(
            "slice(split(text, ' '), 1, size(split(text, ' ')) - 1)"
        ).alias("w1"),
        F.expr(
            "slice(split(text, ' '), 2, size(split(text, ' ')) - 1)"
        ).alias("w2"),
    )
    big = d.select(F.explode(pairs).alias("p")).select("p.w1", "p.w2")
    n2 = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_pair")
    )
    n1 = big.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("n_first")
    )
    fw = n2.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("n1p_fw")
    )
    bw = n2.groupBy("w2").agg(
        F.count(F.lit(1)).cast("long").alias("n1p_bw")
    )
    tt = n2.agg(F.count(F.lit(1)).cast("long").alias("t"))
    return (
        n2.join(n1, "w1")
        .join(fw, "w1")
        .join(bw, "w2")
        .crossJoin(F.broadcast(tt))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.col("n1p_bw").cast("double") / F.col("t"), 6
            ).alias("p_cont"),
            F.round(
                (
                    (4 * F.col("n_pair") - 3) * F.col("t")
                    + 3 * F.col("n1p_fw") * F.col("n1p_bw")
                ).cast("double")
                / (4 * F.col("t") * F.col("n_first")).cast("double"),
                6,
            ).alias("p_kn"),
        )
        .orderBy(F.col("n_pair").desc(), "w1", "w2")
        .limit(200)
    )
