"""Training-data pipeline compositions (SURVEY §2.11 extensions).

The single-purpose LLM ops (llm_dedup, llm_text, llm_similarity) are
the primitives; this module adds the composed / corpus-management
operators a real pretraining pipeline runs: stratified sampling for
language mixes, n-gram statistics, redaction, embedding centroids and
int8 quantization, and the end-to-end clean-corpus pipeline
(dedup → quality filter → split).

Scale posture: every op here is a projection or a single keyed
aggregate — no op introduces more than one shuffle, nothing collects to
the driver, and the sampling/split decisions are pure per-row hash
functions (stable as the corpus grows; see SCALE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.registry import register


def _hash_bucket(col: str, n: int = 100):
    """Deterministic per-row bucket in [0, n): first 6 hex digits of
    md5 of the id — engine-portable (same trick as corpus_split)."""
    return (
        F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 6), 16, 10)
        .cast("bigint") % n
    )


_HASH_BUCKET_SQL = (
    "CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 6)) AS BIGINT) % {n}"
)


def grams_expr(col: str = "w", n: int = 5):
    """Guarded word n-gram array over a token-array column — the ONE
    definition of the gram window (round-2's crash class was an
    unguarded sequence(1, size-k) going descending on short docs; every
    gram site must share this guard)."""
    return F.when(
        F.size(col) >= n,
        F.expr(
            f"transform(sequence(1, size({col}) - {n - 1}),"
            f" i -> concat_ws(' ', slice({col}, i, {n})))"
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))


def grams_sql_case(col: str = "w", n: int = 5) -> str:
    """DuckDB twin of grams_expr (CASE-guarded list_transform)."""
    parts = ", ".join(f"{col}[i+{j}]" for j in range(n))
    return (
        f"CASE WHEN len({col}) >= {n} THEN list_transform("
        f"range(1, len({col}) - {n - 2}), i -> concat_ws(' ', {parts})) "
        f"ELSE [] END"
    )


@register(
    "corpus_sample_stratified",
    oracle=f"""
    WITH t AS (
      SELECT lang, n_chars,
             {_HASH_BUCKET_SQL.format(col="doc_id", n=100)} AS b
      FROM documents
    )
    SELECT lang,
           count(*) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS chars_kept
    FROM t
    WHERE b < (CASE WHEN lang = 'en' THEN 20 ELSE 80 END)
    GROUP BY lang
    """,
)
def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling for a training language mix: keep 20% of
    the dominant language (en) and 80% of everything else, decided by a
    per-doc md5 bucket. Hash sampling (vs `df.sample`) is deterministic,
    join-free, and stable under corpus growth — a doc's keep/drop never
    changes when new files arrive, so incremental pipeline runs are
    consistent. One projection + one small aggregate; no shuffle of the
    full corpus."""
    d = table(spark, sf_dir, "documents")
    rate = F.when(F.col("lang") == "en", F.lit(20)).otherwise(F.lit(80))
    return (
        d.withColumn("b", _hash_bucket("doc_id"))
        .filter(F.col("b") < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("chars_kept"),
        )
    )


@register(
    "text_ngrams",
    oracle="""
    WITH t AS (
      SELECT string_split(text, ' ') AS toks FROM documents
    ),
    b AS (
      SELECT unnest(list_transform(
               list_zip(toks[1:len(toks) - 1], toks[2:len(toks)]),
               x -> x[1] || ' ' || x[2])) AS bigram
      FROM t
    )
    SELECT bigram, count(*) AS cnt
    FROM b
    GROUP BY bigram
    ORDER BY cnt DESC, bigram
    LIMIT 20
    """,
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus bigrams. Bigrams are built JVM-side with a
    higher-order function over the token array (no Python, no
    self-join): slice off the last token and zip each with its
    successor. The only shuffle is the count aggregate; the top-20 is a
    TakeOrderedAndProject (no global sort materialized). Deterministic
    tie-break on the bigram string keeps the LIMIT oracle-stable."""
    d = table(spark, sf_dir, "documents")
    b = d.select(
        F.explode(
            F.expr(
                "transform(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),"
                " (t, i) -> concat(t, ' ', element_at(split(text, ' '), i + 2)))"
            )
        ).alias("bigram")
    )
    return (
        b.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("bigram"))
        .limit(20)
    )


@register(
    "text_redact",
    oracle="""
    SELECT event_id,
           regexp_replace(
             regexp_replace(props,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>',
               'g'),
             '[0-9]+', '#', 'g') AS redacted,
           len(props) - len(regexp_replace(props, '[0-9]', '', 'g'))
             AS n_digit_chars
    FROM events
    WHERE props IS NOT NULL
    """,
)
def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-class redaction as a pure projection: mask email-shaped
    spans, then collapse digit runs (phone/SSN/account stand-ins) to
    '#', and report how many digit characters were scrubbed per record.
    Runs over events.props (the fixture corpus has no synthetic PII, so
    digits are the live pattern; the email branch exercises the
    alternation). regexp_replace is JVM regex inside codegen — at
    100 TB this is scan-speed, no shuffle at all."""
    e = table(spark, sf_dir, "events")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    return e.filter(F.col("props").isNotNull()).select(
        "event_id",
        F.regexp_replace(
            F.regexp_replace(F.col("props"), email, "<EMAIL>"), r"[0-9]+", "#"
        ).alias("redacted"),
        (
            F.length("props")
            - F.length(F.regexp_replace(F.col("props"), r"[0-9]", ""))
        ).cast("long").alias("n_digit_chars"),
    )


@register(
    "emb_centroid",
    oracle="""
    SELECT label, i.i AS dim,
           round(avg(embedding[i.i + 1]), 6) AS centroid
    FROM embeddings, range(64) i(i)
    GROUP BY label, dim
    """,
)
def emb_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding space (the reduce step of
    k-means / class prototypes). posexplode keeps the dim index
    JVM-side; the aggregate shuffles (label, dim) pairs — 640 keys
    regardless of corpus size, so the reduce side is O(labels×dims) and
    the map side does all the work as partial aggregates. Rounded on
    both sides (accumulation-order float discipline)."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("label", F.col("dim").cast("bigint").alias("dim"))
        .agg(F.round(F.avg("v"), 6).alias("centroid"))
    )


@register(
    "emb_quantize",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               v -> CAST(least(127, greatest(-127, round(v * 127))) AS INT))
               AS qv
      FROM embeddings
    )
    SELECT vec_id,
           CAST(list_sum(qv) AS BIGINT) AS qsum,
           CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT) AS n_sat
    FROM q
    """,
)
def emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column (the
    storage/ANN-memory optimization: 4 bytes/dim → 1). Emits a per-
    vector checksum (sum of quantized components — exact integers, so
    the oracle hash is order-proof) and the saturation count. The
    transform/aggregate lambdas are Catalyst higher-order functions —
    whole-stage codegen, zero Python, no shuffle: at 100 TB this is a
    pure map over the scan."""
    e = table(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        F.expr(
            "transform(embedding,"
            " v -> CAST(least(127, greatest(-127, round(v * 127))) AS INT))"
        ).alias("qv"),
    )
    return q.select(
        "vec_id",
        F.expr("CAST(aggregate(qv, 0L, (a, x) -> a + x) AS BIGINT)").alias("qsum"),
        F.expr("CAST(size(filter(qv, x -> abs(x) = 127)) AS BIGINT)").alias("n_sat"),
    )


@register(
    "pipeline_corpus_clean",
    oracle=f"""
    WITH dedup AS (
      SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents
    ),
    filtered AS (
      SELECT doc_id, lang, n_chars,
             len(string_split(text, ' ')) AS n_tok
      FROM dedup
      WHERE rn = 1
        AND n_chars BETWEEN 100 AND 400
        AND len(string_split(text, ' ')) >= 20
    ),
    split AS (
      SELECT lang, n_tok,
             CASE WHEN {_HASH_BUCKET_SQL.format(col="doc_id", n=100)} < 90
                  THEN 'train' ELSE 'val' END AS split
      FROM filtered
    )
    SELECT lang, split, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tokens
    FROM split
    GROUP BY lang, split
    """,
)
def pipeline_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end corpus-cleaning pipeline in one plan: exact dedup
    (keep lowest doc_id per text) → quality gate (length + token-count
    bounds) → deterministic 90/10 train/val split (md5 bucket) → per
    (lang, split) audit. One shuffle for the dedup window (partitioned
    by text hash — uniform, skew-free), then projections, then the
    final small aggregate; Catalyst pipelines the filter into the
    window's output without rematerializing. This is the flagship
    'would survive 100 TB' composition: no driver collection, no
    fraction sampling, no global sort."""
    d = table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy("text").orderBy("doc_id"))
    filtered = (
        d.withColumn("rn", rn)
        .withColumn("n_tok", F.size(F.split("text", " ")))
        .filter(
            (F.col("rn") == 1)
            & F.col("n_chars").between(100, 400)
            & (F.col("n_tok") >= 20)
        )
    )
    split = filtered.withColumn(
        "split",
        F.when(_hash_bucket("doc_id") < 90, F.lit("train")).otherwise(F.lit("val")),
    )
    return split.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("tokens")
    )


@register(
    "pipeline_decontaminate",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(w) - 3),
                                   i -> array_to_string(w[i:i+4], ' '))) AS gram
      FROM t
      WHERE len(w) >= 5
    ),
    ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 7 = 0),
    tr AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 7 <> 0)
    SELECT tr.doc_id, count(DISTINCT tr.gram) AS n_shared
    FROM tr
    JOIN ev USING (gram)
    GROUP BY tr.doc_id
    """,
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word 5-gram with a held-out benchmark set (here the deterministic
    doc_id % 7 == 0 slice stands in for the eval suite), reporting how
    many distinct benchmark 5-grams each contaminated doc contains —
    the standard n-gram-overlap contamination check run before
    training (cf. GPT-3 appx. C / PaLM-style 8-gram decontamination;
    5-grams here because fixture docs are 10-99 words).

    Shape for 100 TB: the benchmark gram set is small by construction
    (eval suites are tiny next to a training corpus), so it BROADCASTS
    to every executor and the check is a map-side semi-join over the
    exploded training grams — the corpus is scanned once, never
    shuffled on text. Dedup of (doc, gram) pairs before counting keys
    the only shuffle by gram hash — uniform, skew-free."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    g = d.select("doc_id", F.explode(grams_expr("w", 5)).alias("gram"))
    ev = g.filter(F.col("doc_id") % 7 == 0).select("gram").distinct()
    # no pre-distinct on the training side: countDistinct already
    # dedups per doc, and the broadcast semi-join runs map-side — so
    # only grams that HIT the benchmark set ever reach a shuffle,
    # instead of shuffling every (doc, gram) pair once to dedup it.
    tr = g.filter(F.col("doc_id") % 7 != 0).select("doc_id", "gram")
    return (
        tr.join(F.broadcast(ev), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared"))
    )


@register(
    "pipeline_quality_filter",
    oracle="""
    SELECT doc_id,
           keep,
           CASE WHEN reasons = '' THEN NULL ELSE reasons END AS reasons
    FROM (
      SELECT doc_id,
             n_chars BETWEEN 100 AND 400
               AND len(string_split(text, ' ')) >= 20
               AND lang IN ('en', 'de', 'fr', 'es') AS keep,
             concat_ws(',',
               CASE WHEN n_chars < 100 THEN 'too_short' END,
               CASE WHEN n_chars > 400 THEN 'too_long' END,
               CASE WHEN len(string_split(text, ' ')) < 20
                    THEN 'low_token_count' END,
               CASE WHEN lang NOT IN ('en', 'de', 'fr', 'es')
                    THEN 'lang_excluded' END) AS reasons
      FROM documents) t
    """,
)
def pipeline_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate with drop-reason logging — real pipelines never
    silently drop: every document gets keep/drop plus the comma-joined
    list of rules it violated (audit trail for filter-rate dashboards
    and threshold tuning). Pure projection: no shuffle at any scale;
    the downstream keep-filter pushes to the scan."""
    d = table(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    langs = ["en", "de", "fr", "es"]
    keep = (
        F.col("n_chars").between(100, 400)
        & (n_tok >= 20)
        & F.col("lang").isin(langs)
    )
    reasons = F.concat_ws(
        ",",
        F.when(F.col("n_chars") < 100, "too_short"),
        F.when(F.col("n_chars") > 400, "too_long"),
        F.when(n_tok < 20, "low_token_count"),
        F.when(~F.col("lang").isin(langs), "lang_excluded"),
    )
    return d.select(
        "doc_id",
        keep.alias("keep"),
        F.when(reasons == "", None).otherwise(reasons).alias("reasons"),
    )


@register(
    "corpus_mix",
    oracle=f"""
    WITH tot AS (SELECT count(*) AS n FROM documents),
         rates AS (
           SELECT lang, count(*) AS n_lang, any_value(tot.n) AS n
           FROM documents CROSS JOIN tot GROUP BY lang),
         kept AS (
           SELECT d.lang
           FROM documents d JOIN rates r ON d.lang = r.lang
           WHERE {_HASH_BUCKET_SQL.format(col="d.doc_id", n=1000000)}
                   * 20 * r.n_lang
                 < least(20 * r.n_lang,
                         (CASE d.lang WHEN 'en' THEN 8 ELSE 3 END) * r.n)
                   * 1000000)
    SELECT lang, count(*) AS n_kept
    FROM kept
    GROUP BY lang
    """,
)
def corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven mixture sampling: hit a TARGET language share
    (en 40% = 8/20, others 15% = 3/20 each) regardless of the corpus's
    actual skew. Unlike corpus_sample_stratified (fixed per-group
    rates), the keep rate is computed FROM the data: rate(lang) =
    min(1, target_share x N_total / N_lang) — oversampled languages
    are thinned toward the target, under-represented ones are kept
    whole (capped at 1: this op never upsamples; repeat-epoch
    upweighting belongs to the training loader).

    The keep decision `bucket < rate * 1e6` is evaluated in EXACT
    integer arithmetic — bucket * 20 * n_lang < min(20 * n_lang,
    share_num * N) * 1e6 — because the float path (floor of a double
    product) computes DIFFERENT floors in Spark vs the oracle engine
    for some count combinations (double(0.15)*N/n vs exact-decimal
    division straddle an integer; found in round-4 review, verified
    by brute force). Integers are bit-identical everywhere.

    Scale shape: the rate table is |langs| rows — computed by one
    small aggregate and BROADCAST back; the keep decision is a pure
    per-row md5-bucket comparison (deterministic, stable as the corpus
    grows — a doc's fate never changes when new files arrive, so
    incremental runs are consistent). The corpus is scanned once, no
    corpus-sized shuffle before the final per-lang audit aggregate."""
    d = table(spark, sf_dir, "documents")
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    stats = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_lang"))
        .join(F.broadcast(tot))
    )
    share_num = F.when(F.col("lang") == "en", F.lit(8)).otherwise(F.lit(3))
    return (
        d.join(F.broadcast(stats), "lang")
        .filter(
            _hash_bucket("doc_id", 1_000_000) * 20 * F.col("n_lang")
            < F.least(20 * F.col("n_lang"), share_num * F.col("n"))
            * 1_000_000
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


def _e2e_oracle() -> str:
    from spark_cep_spark.operators.llm_dedup import minhash_sig_sql

    g5 = grams_sql_case("w", 5)
    bucket = _HASH_BUCKET_SQL.format(col="f.doc_id", n=1000000)
    return f"""
    WITH corpus AS (SELECT * FROM documents WHERE doc_id % 7 != 0),
         ev_grams AS (
           SELECT DISTINCT unnest({g5}) AS gram
           FROM (SELECT string_split(text, ' ') AS w
                 FROM documents WHERE doc_id % 7 = 0)),
         doc_grams AS (
           SELECT DISTINCT doc_id, unnest({g5}) AS gram
           FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus)),
         contam AS (SELECT DISTINCT dg.doc_id
                    FROM doc_grams dg JOIN ev_grams USING (gram)),
         sigs AS ({minhash_sig_sql("corpus")}),
         flags AS (
           SELECT c.doc_id, c.lang,
                  (c.n_chars BETWEEN 100 AND 400
                   AND len(string_split(c.text, ' ')) >= 20) AS q,
                  (c.n_chars BETWEEN 100 AND 400
                   AND len(string_split(c.text, ' ')) >= 20
                   AND ct.doc_id IS NULL) AS elig,
                  s.sig
           FROM corpus c
           LEFT JOIN contam ct ON ct.doc_id = c.doc_id
           LEFT JOIN sigs s ON s.doc_id = c.doc_id),
         winners AS (
           SELECT *,
                  elig AND row_number() OVER (
                    PARTITION BY sig, elig ORDER BY doc_id) = 1 AS winner
           FROM flags),
         lang_w AS (SELECT lang, count(*) AS n_lang
                    FROM winners WHERE winner GROUP BY lang),
         tot_w AS (SELECT count(*) AS n_tot FROM winners WHERE winner),
         final AS (
           SELECT f.*,
                  f.winner AND {bucket} * 20 * lw.n_lang
                    < least(20 * lw.n_lang,
                            (CASE f.lang WHEN 'en' THEN 8 ELSE 3 END)
                              * tw.n_tot) * 1000000 AS mixed
           FROM winners f
           LEFT JOIN lang_w lw ON f.lang = lw.lang
           CROSS JOIN tot_w tw)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_input,
           CAST(sum(CASE WHEN q THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
           CAST(sum(CASE WHEN elig THEN 1 ELSE 0 END) AS BIGINT) AS n_decontam,
           CAST(sum(CASE WHEN winner THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
           CAST(sum(CASE WHEN mixed THEN 1 ELSE 0 END) AS BIGINT) AS n_mixed
    FROM final
    GROUP BY lang
    """


@register("pipeline_end_to_end", oracle=_e2e_oracle())
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship training-data composition, ONE plan end to end:
    quality gate -> benchmark decontamination -> minhash near-dedup
    (keep-first per signature) -> mixture sampling toward a target
    language share — with a per-language audit of survivors at every
    stage (n_input / n_quality / n_decontam / n_dedup / n_mixed).
    Every real pretraining pipeline runs exactly this chain and audits
    exactly these counts.

    Single-pass shape: per-doc stage FLAGS are computed in one scan
    (quality = projection; decontamination = broadcast semi-join of
    the tiny eval-gram set against exploded corpus grams; dedup
    winner = row_number over (sig, eligible); mix = md5-bucket vs
    broadcast winner counts in EXACT integer arithmetic — the float
    floor(rate*1e6) path diverges between engines, see corpus_mix),
    and the flags relation is persisted before fan-out so its three
    consumers (per-lang winner counts, the winner total, the final
    audit) share one computation instead of re-running the signature
    aggregate and dedup window. The only corpus-sized shuffles are the
    signature aggregate, the flags<-sigs doc_id join, and the
    (sig, eligible) window — each keyed uniformly. At 100 TB:
    identical plan with the persist traded for a checkpoint (or
    recompute, if executor memory is tighter than recompute cost)."""
    from pyspark.sql import Window as W

    from spark_cep_spark.operators.llm_dedup import _minhash_signature

    d = table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 7 != 0)
    ev = d.filter(F.col("doc_id") % 7 == 0)

    ev_grams = (
        ev.select(F.split("text", " ").alias("w"))
        .select(F.explode(grams_expr("w", 5)).alias("gram"))
        .distinct()
    )
    corpus_grams = (
        corpus.select("doc_id", F.split("text", " ").alias("w"))
        .select("doc_id", F.explode(grams_expr("w", 5)).alias("gram"))
    )
    contaminated = (
        corpus_grams.join(F.broadcast(ev_grams), "gram")
        .select("doc_id")
        .distinct()
        .withColumn("contam", F.lit(True))
    )

    n_tok = F.size(F.split("text", " "))
    flags = (
        corpus.select(
            "doc_id",
            "lang",
            (F.col("n_chars").between(100, 400) & (n_tok >= 20)).alias("q"),
        )
        .join(contaminated, "doc_id", "left")
        .join(_minhash_signature(corpus), "doc_id", "left")
        .withColumn("elig", F.col("q") & F.col("contam").isNull())
    )
    w = W.partitionBy("sig", "elig").orderBy("doc_id")
    # three consumers below (lang_w, tot_w, final audit) — persist so
    # the signature aggregate + dedup window run once, not three times
    flags = flags.withColumn(
        "winner", F.col("elig") & (F.row_number().over(w) == 1)
    ).persist()

    lang_w = flags.filter("winner").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_lang")
    )
    tot_w = flags.agg(
        F.sum(F.when(F.col("winner"), 1).otherwise(0)).alias("n_tot")
    )
    stats = lang_w.join(F.broadcast(tot_w))
    share_num = F.when(F.col("lang") == "en", F.lit(8)).otherwise(F.lit(3))
    flags = flags.join(F.broadcast(stats), "lang", "left").withColumn(
        "mixed",
        F.col("winner")
        & (
            _hash_bucket("doc_id", 1_000_000) * 20 * F.col("n_lang")
            < F.least(20 * F.col("n_lang"), share_num * F.col("n_tot"))
            * 1_000_000
        ),
    )

    def n(c):
        return F.sum(F.when(F.col(c), 1).otherwise(0)).cast("long")

    return flags.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_input"),
        n("q").alias("n_quality"),
        n("elig").alias("n_decontam"),
        n("winner").alias("n_dedup"),
        n("mixed").alias("n_mixed"),
    )


@register(
    "corpus_epochs",
    oracle="""
    WITH per AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
         tot AS (SELECT count(*) AS n FROM documents),
         x AS (SELECT lang, n_docs, tot.n,
                      (CASE lang WHEN 'en' THEN 8 ELSE 3 END) * tot.n AS num
               FROM per CROSS JOIN tot)
    SELECT lang,
           n_docs,
           num // 20 AS n_needed,
           (num + 20 * n_docs - 1) // (20 * n_docs) AS n_epochs,
           round(num / (20.0 * n_docs
                        * ((num + 20 * n_docs - 1) // (20 * n_docs))), 6)
             AS epoch_keep_rate
    FROM x
    """,
)
def corpus_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The upsampling twin of corpus_mix: per-language epoch plan to
    hit a target mixture share (en 40% = 8/20, others 15% = 3/20) when
    a language is UNDER-represented — n_epochs = ceil(needed /
    available) full passes, thinned inside the last-epoch boundary by
    epoch_keep_rate (the repeat-factor table a training loader
    consumes; cf. data mixing by repeat sampling in published LM data
    recipes).

    floor/ceil are computed in EXACT integer arithmetic (num = 8|3 x
    N twentieths; floor = num DIV 20, ceil = (num + d - 1) DIV d) —
    floor/ceil of a double share*N can straddle an integer differently
    across engines (same defect class as corpus_mix, round-4 review).
    The only float, epoch_keep_rate, is one double division of
    identical integers on both sides, then rounded.

    Pure |langs|-row arithmetic off one aggregate — the corpus itself
    is never shuffled; the loader applies the plan at read time."""
    d = table(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = d.agg(F.count(F.lit(1)).alias("n"))
    num = F.when(F.col("lang") == "en", F.lit(8)).otherwise(F.lit(3)) * F.col(
        "n"
    )
    return (
        per.join(F.broadcast(tot))
        .withColumn("num", num)
        .select(
            "lang",
            "n_docs",
            F.expr("num DIV 20").alias("n_needed"),
            F.expr("(num + 20 * n_docs - 1) DIV (20 * n_docs)").alias(
                "n_epochs"
            ),
            F.round(
                F.col("num")
                / (
                    20.0
                    * F.col("n_docs")
                    * F.expr("(num + 20 * n_docs - 1) DIV (20 * n_docs)")
                ),
                6,
            ).alias("epoch_keep_rate"),
        )
    )


@register(
    "emb_dim_stats",
    oracle="""
    WITH ex AS (
      SELECT generate_subscripts(embedding, 1) AS i,
             unnest(CAST(embedding AS DOUBLE[])) AS v
      FROM embeddings)
    SELECT CAST(i AS BIGINT) AS dim,
           round(avg(v), 6) AS mean,
           round(stddev_samp(v), 6) AS std,
           round(min(v), 6) AS vmin,
           round(max(v), 6) AS vmax
    FROM ex GROUP BY dim
    """,
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension distribution statistics over the embedding corpus
    (mean/std/min/max per coordinate) — the diagnostics pass before
    whitening, scalar quantization range selection, or dead-dimension
    pruning in an embedding pipeline.

    Shape: posexplode keeps the dim index JVM-side; the aggregate
    shuffles (dim) keys — at most |dims| reduce keys regardless of
    corpus size, so partial (map-side) aggregation does all the work
    and the reduce side is O(dims). Accumulation-order float
    discipline: avg/std rounded on both sides; min/max are exact."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select(F.posexplode("embedding").alias("pos", "v0"))
        .select(
            (F.col("pos") + 1).cast("bigint").alias("dim"),
            F.col("v0").cast("double").alias("v"),
        )
        .groupBy("dim")
        .agg(
            F.round(F.avg("v"), 6).alias("mean"),
            F.round(F.stddev_samp("v"), 6).alias("std"),
            F.round(F.min("v"), 6).alias("vmin"),
            F.round(F.max("v"), 6).alias("vmax"),
        )
    )


@register(
    "corpus_shuffle",
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             md5(concat('shuffle:', CAST(doc_id AS VARCHAR))) AS k
      FROM documents),
    sharded AS (
      SELECT doc_id, k,
             CAST(('0x' || substr(k, 1, 6)) AS BIGINT) % 8 AS shard
      FROM keyed)
    SELECT doc_id, shard,
           CAST(row_number() OVER (ORDER BY shard, k, doc_id) AS BIGINT)
             AS global_pos
    FROM sharded
    """,
)
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every document gets
    a pseudo-random but reproducible (shard, global_pos) so a training
    loader can stream the corpus in a fixed shuffled order from any
    worker without coordination (re-runs give byte-identical order —
    the property data-loading recipes need for resumable training).

    100 TB shape — this is the scale-literate distributed total order,
    NOT a single-partition row_number: the md5 sort key buckets docs
    into shards (uniform — 6 hex digits mod n), each shard orders
    independently under a PARTITIONED window, and global positions
    come from adding per-shard offsets computed off an n_shards-row
    size table (driver-scale metadata, broadcast back). No stage ever
    sees more than one shard's rows in one partition. The oracle's
    single ORDER BY (shard, k, doc_id) is semantically identical."""
    from pyspark.sql.window import Window

    n_shards = 8
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string"))).alias(
            "k"
        ),
    )
    d = d.withColumn(
        "shard",
        F.conv(F.substring("k", 1, 6), 16, 10).cast("bigint") % n_shards,
    )
    in_shard = F.row_number().over(
        Window.partitionBy("shard").orderBy("k", "doc_id")
    )
    pos = d.withColumn("in_shard", in_shard)
    # per-shard offsets: an n_shards-row aggregate; the cumulative
    # window runs over <= n_shards rows (metadata-scale, not data-scale)
    sizes = d.groupBy("shard").agg(F.count(F.lit(1)).alias("n"))
    offsets = sizes.withColumn(
        "offset",
        F.coalesce(
            F.sum("n").over(
                Window.orderBy("shard").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("shard", "offset")
    return (
        pos.join(F.broadcast(offsets), "shard")
        .select(
            "doc_id",
            "shard",
            (F.col("offset") + F.col("in_shard")).cast("bigint").alias(
                "global_pos"
            ),
        )
    )


@register(
    "corpus_interleave",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, coalesce(source, '') AS src,
             md5(concat('interleave:', CAST(doc_id AS VARCHAR))) AS k
      FROM documents),
    sharded AS (
      SELECT doc_id, src, k,
             CAST(('0x' || substr(k, 1, 6)) AS BIGINT) % 8 AS shard
      FROM keyed),
    ranked AS (
      SELECT doc_id, src, shard,
             row_number() OVER (PARTITION BY src ORDER BY shard, k, doc_id)
               AS src_rank,
             count(*) OVER (PARTITION BY src) AS n_src
      FROM sharded),
    vt AS (
      SELECT doc_id, src, src_rank, src_rank * 1.0 / n_src AS vtime
      FROM ranked)
    SELECT doc_id, src AS source,
           CAST(src_rank AS BIGINT) AS src_rank,
           round(vtime, 6) AS vtime,
           CAST(row_number() OVER (ORDER BY vtime, src, src_rank) AS BIGINT)
             AS global_pos
    FROM vt
    """,
)
def corpus_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride-scheduled source interleaving: a deterministic global
    training order in which every source appears at a uniform rate
    proportional to its size throughout the epoch (doc i of a source
    with n docs gets virtual time i/n; sorting by virtual time yields
    the smooth mixture a training loader wants — no "all of source A,
    then all of B" clumping, no RNG).

    100 TB shape: two applications of the bucketed distributed total
    order (cf. corpus_shuffle — no data-scale single-partition
    window): within-source rank comes from a PARTITION BY
    (source, md5-shard) window plus a per-(source, shard) offset table
    (|sources| x 8 rows, broadcast); the global position buckets the
    uniform virtual time into deciles — bucketing by floor(vt*10) is
    order-consistent with vt, so per-decile windows plus a 10-row
    offset table reproduce the oracle's single ORDER BY exactly.
    vtime is one double division of identical integers on both
    engines, so ordering cannot diverge."""
    from pyspark.sql.window import Window

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce("source", F.lit("")).alias("src"),
        F.md5(
            F.concat(F.lit("interleave:"), F.col("doc_id").cast("string"))
        ).alias("k"),
    )
    d = d.withColumn(
        "shard", F.conv(F.substring("k", 1, 6), 16, 10).cast("bigint") % 8
    )
    # within-source rank via (src, shard) buckets + per-source offsets
    w_in = Window.partitionBy("src", "shard").orderBy("k", "doc_id")
    pos = d.withColumn("in_shard", F.row_number().over(w_in))
    sizes = d.groupBy("src", "shard").agg(F.count(F.lit(1)).alias("n"))
    w_off = (
        Window.partitionBy("src")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = sizes.withColumn(
        "off", F.coalesce(F.sum("n").over(w_off), F.lit(0))
    ).select("src", "shard", "off")
    n_src = d.groupBy("src").agg(F.count(F.lit(1)).alias("n_src"))
    ranked = (
        pos.join(F.broadcast(offsets), ["src", "shard"])
        .withColumn("src_rank", (F.col("off") + F.col("in_shard")).cast("long"))
        .join(F.broadcast(n_src), "src")
        .withColumn("vtime", F.col("src_rank") * 1.0 / F.col("n_src"))
    )
    # global position via virtual-time deciles + a 10-row offset table
    ranked = ranked.withColumn(
        "vb", F.least(F.lit(9), F.floor(F.col("vtime") * 10)).cast("int")
    )
    w_g = Window.partitionBy("vb").orderBy("vtime", "src", "src_rank")
    gpos = ranked.withColumn("in_vb", F.row_number().over(w_g))
    vb_sizes = ranked.groupBy("vb").agg(F.count(F.lit(1)).alias("vn"))
    w_vb = Window.orderBy("vb").rowsBetween(Window.unboundedPreceding, -1)
    vb_off = vb_sizes.withColumn(
        "voff", F.coalesce(F.sum("vn").over(w_vb), F.lit(0))
    ).select("vb", "voff")
    return (
        gpos.join(F.broadcast(vb_off), "vb")
        .select(
            "doc_id",
            F.col("src").alias("source"),
            "src_rank",
            F.round("vtime", 6).alias("vtime"),
            (F.col("voff") + F.col("in_vb")).cast("long").alias("global_pos"),
        )
    )


# --------------------------------------------------------------------
# boilerplate scrubbing — remove spans repeated across documents
# --------------------------------------------------------------------

_SCRUB_CHUNK = 3  # tokens per non-overlapping chunk
_SCRUB_DF = 2  # chunks seen in >= this many distinct docs are dropped


@register(
    "pipeline_scrub_boilerplate",
    oracle=f"""
    WITH chunks AS (
      SELECT doc_id, i,
             array_to_string(w[(i*{_SCRUB_CHUNK}+1):((i+1)*{_SCRUB_CHUNK})], ' ')
               AS chunk
      FROM (SELECT doc_id, string_split(text, ' ') AS w
            FROM documents WHERE length(text) > 0) t,
           unnest(range(0, CAST(ceil(len(w) / {_SCRUB_CHUNK}.0) AS BIGINT)))
             AS u(i)),
    df AS (SELECT chunk, count(DISTINCT doc_id) AS n_docs
           FROM chunks GROUP BY chunk),
    kept AS (
      SELECT c.doc_id, c.i, c.chunk
      FROM chunks c JOIN df ON df.chunk = c.chunk
      WHERE df.n_docs < {_SCRUB_DF}),
    rebuilt AS (
      SELECT doc_id,
             string_agg(chunk, ' ' ORDER BY i) AS clean_text,
             CAST(count(*) AS BIGINT) AS n_kept
      FROM kept GROUP BY doc_id),
    totals AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks
      FROM chunks GROUP BY doc_id)
    SELECT d.doc_id,
           coalesce(r.clean_text, '') AS clean_text,
           coalesce(t.n_chunks, 0) AS n_chunks,
           coalesce(t.n_chunks, 0) - coalesce(r.n_kept, 0) AS n_dropped
    FROM documents d
    LEFT JOIN totals t ON t.doc_id = d.doc_id
    LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
    """,
)
def pipeline_scrub_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate REMOVAL (the destructive sibling of
    text_boilerplate's score): split each doc into non-overlapping
    3-token chunks, compute each chunk's document frequency across the
    corpus, drop chunks appearing in >= 2 distinct docs (headers,
    footers, licence blocks), and reassemble the surviving chunks in
    order. Every doc stays in the output — fully-scrubbed docs emit
    clean_text = '' with n_dropped = n_chunks, so downstream length
    filters (pipeline_corpus_clean) see them.

    100 TB shape: one (doc, chunk) explode -> document-frequency hash
    aggregate keyed by the chunk (hash the chunk string at real scale
    so the shuffle moves 16-byte keys) -> one equi-join back -> per-doc
    reassembly via collect_list over (pos, chunk) structs, sorted
    in-memory per doc (docs are KB-sized; the sort is array_sort, not
    a shuffle). No all-pairs stage anywhere."""
    d = table(spark, sf_dir, "documents")
    k = _SCRUB_CHUNK
    w = F.split("text", " ")
    n_chunks_expr = F.ceil(F.size(w) / F.lit(float(k))).cast("long")
    chunks = (
        d.filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks_expr - 1),
                    lambda i: F.struct(
                        i.alias("i"),
                        F.concat_ws(
                            " ", F.slice(w, i * k + 1, k)
                        ).alias("chunk"),
                    ),
                )
            ).alias("c"),
        )
        .select("doc_id", F.col("c.i").alias("i"), F.col("c.chunk").alias("chunk"))
    ).persist()
    df_counts = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    kept = chunks.join(df_counts, "chunk").filter(
        F.col("n_docs") < _SCRUB_DF
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "chunk"))),
                lambda s: s["chunk"],
            ),
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
    )
    totals = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks")
    )
    return (
        d.select("doc_id")
        .join(totals, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            (
                F.coalesce("n_chunks", F.lit(0))
                - F.coalesce("n_kept", F.lit(0))
            ).cast("long").alias("n_dropped"),
        )
    )


@register(
    "corpus_sample_weighted",
    oracle="""
    SELECT doc_id, source, n_chars,
           round(least(1.0, n_chars / 400.0), 6) AS keep_p
    FROM (
      SELECT doc_id, source, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
                  AS BIGINT) AS u,
             CAST(floor(least(1.0, n_chars / 400.0) * 16777216) AS BIGINT)
               AS thr
      FROM documents) t
    WHERE u < thr
    """,
)
def corpus_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted Bernoulli downsampling: keep each doc with
    probability proportional to a quality proxy (here the length score
    min(1, n_chars/400) — substitute any per-doc score column), decided
    by a deterministic content-independent hash. The keep decision is
    an exact integer compare (24-bit hash vs floor(p * 2^24)) so both
    engines agree bit-for-bit and a doc's fate never changes as the
    corpus grows — the property fraction-based sample() lacks.

    100 TB shape: pure per-row projection + filter, no shuffle at all;
    the sampler composes with any upstream score (text_quality,
    text_perplexity) as a column swap."""
    d = table(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("long")
    p = F.least(F.lit(1.0), F.col("n_chars") / 400.0)
    thr = F.floor(p * 16777216).cast("long")
    return (
        d.select(
            "doc_id",
            "source",
            "n_chars",
            F.round(p, 6).alias("keep_p"),
            u.alias("u"),
            thr.alias("thr"),
        )
        .filter(F.col("u") < F.col("thr"))
        .drop("u", "thr")
    )


@register(
    "corpus_token_budget",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             n_chars
      FROM documents),
    ranked AS (
      SELECT *,
             CAST(sum(n_tokens) OVER (
               ORDER BY n_chars DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_tokens
      FROM scored)
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM ranked WHERE cum_tokens <= 10000
    """,
)
def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget selection: fill a fixed training-token budget
    (10k here) with the best documents first — quality proxy =
    n_chars, ties by doc_id, greedy running token sum, keep while the
    cumulative total fits. The standard budgeted-pretraining cut
    ("train on the best N tokens"), expressed as one sort + running
    sum + filter.

    100 TB shape: a budget cut is a global decision, but the global
    running-sum window must NOT see the whole corpus (unpartitioned
    WindowExec = every row on one partition). The executed plan
    pre-filters with an EXACT quality threshold: (1) groupBy(n_chars)
    token sums — the shuffle carries one row per distinct quality
    value, corpus-size-independent; (2) an exclusive running sum over
    that tiny distinct-quality table finds the lowest n_chars whose
    strictly-better docs total < budget; (3) only docs at-or-above
    that threshold enter the sort + running-sum window. Proof the cut
    is unchanged: a doc with n_chars = c has cum_tokens >= (tokens of
    all strictly-better docs) + 1, so if tokens_above(c) >= budget it
    can never satisfy cum_tokens <= budget — every dropped doc was
    provably outside the cut, and survivors keep their exact order.
    The windowed row count is bounded by budget + the boundary quality
    group (each doc carries >= 1 token), not by corpus size.
    Differential-tested against the naive single-window plan
    (tests/test_round5_ops.py)."""
    d = table(spark, sf_dir, "documents")
    budget = 10000
    scored = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        "n_chars",
    )
    per_q = scored.groupBy("n_chars").agg(
        F.sum("n_tokens").alias("bucket_tokens")
    )
    wq = W.orderBy(F.col("n_chars").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    c_min = (
        per_q.withColumn(
            "tokens_above",
            F.coalesce(F.sum("bucket_tokens").over(wq), F.lit(0)),
        )
        .filter(F.col("tokens_above") < budget)
        .agg(F.min("n_chars").alias("c_min"))
    )
    candidates = (
        scored.crossJoin(F.broadcast(c_min))
        .filter(F.col("n_chars") >= F.col("c_min"))
        .drop("c_min")
    )
    w = (
        W.orderBy(F.col("n_chars").desc(), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        candidates.withColumn(
            "cum_tokens", F.sum("n_tokens").over(w).cast("long")
        )
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


@register(
    "corpus_dedup_stats",
    oracle="""
    WITH marked AS (
      SELECT source,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
               AS rn
      FROM documents)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dups,
           round(count(*) FILTER (WHERE rn > 1) * 1.0 / count(*), 6)
             AS dup_rate
    FROM marked GROUP BY source
    """,
)
def corpus_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication report (the dataset-card number): a doc
    is a dup if an earlier doc_id has byte-identical text (keep-first,
    matching dedup_exact). One hash-window pass + one aggregate —
    the audit that tells you WHICH source to renegotiate before you
    spend cluster time deduping it.

    100 TB shape: same as dedup_exact — the window runs on 16-byte
    md5 keys; per-source rollup is a tiny aggregate."""
    d = table(spark, sf_dir, "documents")
    w = W.partitionBy(F.md5("text")).orderBy("doc_id")
    marked = d.select(
        "source", F.row_number().over(w).alias("rn")
    )
    return marked.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dups"),
        F.round(
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("dup_rate"),
    )


@register(
    "pipeline_mix_temperature",
    oracle="""
    WITH per_src AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    p AS (
      SELECT *, pow(n_tokens, 0.5) AS raw,
             sum(pow(n_tokens, 0.5)) OVER () AS denom
      FROM per_src
    )
    SELECT source, n_docs, n_tokens,
           round(n_tokens * 1.0 /
                 CAST(sum(n_tokens) OVER () AS BIGINT), 6) AS natural_share,
           round(raw / denom, 6) AS temp_share,
           CAST(round(1000000 * raw / denom) AS BIGINT) AS docs_per_million
    FROM p
    """,
)
def pipeline_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus mixing weights (the multilingual /
    multi-source sampling rule from the mT5 line of work: sample
    source i with probability ∝ n_i^α, here α=0.5): per source, the
    natural token share, the temperature-flattened share, and the
    resulting docs-per-million sampling budget. α<1 up-weights small
    sources so the head domains don't drown the tail — the standard
    pretraining-mix knob.

    100 TB shape: one map-side-combinable aggregate collapses the
    corpus to |sources| rows (token counts as exact BIGINTs); the
    pow/normalize arithmetic runs on that tiny table (the unpartitioned
    windows here see |sources| rows, not corpus rows). Shares are the
    same IEEE pow+division on both engines, rounded to 6dp."""
    d = table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " ")))
        .cast("long")
        .alias("n_tokens"),
    )
    w = W.partitionBy()
    raw = F.pow(F.col("n_tokens"), 0.5)
    denom = F.sum(raw).over(w)
    return per_src.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens") * 1.0 / F.sum("n_tokens").over(w).cast("long"),
            6,
        ).alias("natural_share"),
        F.round(raw / denom, 6).alias("temp_share"),
        F.round(F.lit(1_000_000) * raw / denom)
        .cast("long")
        .alias("docs_per_million"),
    )


_DECILE_STOPWORDS = "the a of and to in is for on with"


def _distributed_ntile(
    df: DataFrame,
    order_cols: list[str],
    n_tiles: int,
    out_col: str,
    n_range_parts: int = 32,
) -> DataFrame:
    """Exact ntile(n) over a global (order_cols) total order WITHOUT a
    single-partition window: range-partition on the order columns
    (sampled boundaries — Spark's distributed sort primitive), compute
    each row's global rank as (partition offset + local row_number),
    and apply ntile's assignment rule (first n%k tiles get one extra
    row) in closed form. The only driver-side data is the per-range-
    partition row counts (n_range_parts integers — bounded by
    contract). Output = input columns + `out_col` (long, 1-based)."""
    # persist pins the sampled range boundaries: repartitionByRange
    # re-samples per ACTION (fresh RDD ids → fresh sample seeds), so
    # without the cache the offsets job and the output job could see
    # different partitionings and mis-assign ranks. The persisted
    # projection is order_cols + ids only (~tens of bytes/row),
    # MEMORY_AND_DISK, and exactly the determinism anchor a
    # distributed sort-rank needs.
    from pyspark import StorageLevel

    r = (
        df.repartitionByRange(n_range_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        row["_pid"]: row["n"]
        for row in r.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_total = sum(counts.values())
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = df.sparkSession.createDataFrame(
        offsets, "_pid int, _offset long"
    )
    q, rem = divmod(n_total, n_tiles)
    wl = W.partitionBy("_pid").orderBy(*order_cols)
    g = (
        r.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "_grank", F.col("_offset") + F.row_number().over(wl)
        )
    )
    # ntile rule: ranks 1..rem*(q+1) fall in the first rem (fat)
    # tiles of size q+1; the rest in size-q tiles. q == 0 (n < k)
    # means every row is its own tile and the first branch covers all.
    fat_span = rem * (q + 1)
    tile = F.when(
        F.col("_grank") <= fat_span,
        (F.col("_grank") - 1) / (q + 1),
    ).otherwise(
        rem + (F.col("_grank") - fat_span - 1) / F.greatest(F.lit(q), F.lit(1))
    )
    return g.withColumn(
        out_col, (F.floor(tile) + 1).cast("long")
    ).drop("_pid", "_offset", "_grank")


@register(
    "corpus_quality_deciles",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, n_chars,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
             CAST(len(list_filter(string_split(text, ' '),
                  t -> list_contains(string_split('{_DECILE_STOPWORDS}', ' '),
                                     t))) AS BIGINT) AS n_stop
      FROM documents
    ),
    ranked AS (
      SELECT *, n_stop * 1.0 / n_tok AS stop_ratio,
             ntile(10) OVER (ORDER BY n_stop * 1.0 / n_tok, doc_id)
               AS decile
      FROM scored WHERE n_tok > 0
    )
    SELECT decile, CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(stop_ratio), 6) AS avg_stop_ratio,
           round(min(stop_ratio), 6) AS min_stop_ratio,
           round(max(stop_ratio), 6) AS max_stop_ratio,
           CAST(sum(n_tok) AS BIGINT) AS tokens
    FROM ranked GROUP BY decile
    """,
)
def corpus_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score decile table: rank every document by a cheap
    quality proxy (stopword ratio — fluent text has more function
    words) and roll up per-decile doc/token counts and score ranges —
    the table you read to pick a data-pruning threshold before
    committing to a filtered pretraining corpus.

    100 TB shape: the score is a whole-stage-codegen projection (no
    UDF), and the EXACT global rank is computed DISTRIBUTEDLY — never
    `ntile() OVER (ORDER BY ...)`, which funnels the whole corpus
    through one partition (the text_vocab lesson, round 4). Instead:
    range-partition on (score, doc_id) (a sampled-boundary total
    ordering, the sortBy machinery), count rows per range partition
    (a bounded |partitions|-row collect, documented), and turn the
    per-partition row_number plus the partition's global offset into
    the exact ntile bucket with ntile's floor-division-with-remainder
    rule — identical assignment to the oracle's ntile, proven by the
    hash match. Every step is bounded: the widest window is one range
    partition. The ratio is an exact two-BIGINT IEEE division,
    deterministic on both engines before the display rounding."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.split(F.lit(_DECILE_STOPWORDS), " ")
    n_tok = F.size(toks).cast("long")
    n_stop = F.size(
        F.filter(toks, lambda t: F.array_contains(stop_arr, t))
    ).cast("long")
    scored = d.select(
        "doc_id",
        n_tok.alias("n_tok"),
        n_stop.alias("n_stop"),
    ).filter(F.col("n_tok") > 0)
    ratio = F.col("n_stop") * 1.0 / F.col("n_tok")
    ranked = _distributed_ntile(
        scored.select(
            "doc_id", "n_tok", ratio.alias("stop_ratio")
        ),
        order_cols=["stop_ratio", "doc_id"],
        n_tiles=10,
        out_col="decile",
    )
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("stop_ratio"), 6).alias("avg_stop_ratio"),
        F.round(F.min("stop_ratio"), 6).alias("min_stop_ratio"),
        F.round(F.max("stop_ratio"), 6).alias("max_stop_ratio"),
        F.sum("n_tok").cast("long").alias("tokens"),
    )


@register(
    "pipeline_line_dedup",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_filter(string_split(coalesce(text, ''), ' '),
                         t -> t <> '') AS toks
      FROM documents
    ),
    ch AS (
      SELECT doc_id, u.grp AS grp, u.chunk AS chunk
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 range(0, CAST(ceil(len(toks) / 4.0) AS BIGINT)),
                 g -> {'grp': g,
                       'chunk': array_to_string(
                          list_slice(toks, g * 4 + 1, g * 4 + 4), ' ')}
               )) AS u
        FROM d
      )
    ),
    occ AS (
      SELECT doc_id, grp, chunk,
             row_number() OVER (PARTITION BY chunk
                                ORDER BY doc_id, grp) AS occ
      FROM ch
    ),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_chunks,
             CAST(count(*) FILTER (WHERE occ = 1) AS BIGINT) AS n_kept,
             coalesce(string_agg(chunk, ' ' ORDER BY grp)
                        FILTER (WHERE occ = 1), '') AS clean_text
      FROM occ GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.clean_text, '') AS clean_text,
           coalesce(a.n_chunks, 0) AS n_chunks,
           coalesce(a.n_kept, 0) AS n_kept,
           coalesce(a.n_chunks - a.n_kept, 0) AS n_dropped
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
)
def pipeline_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide line-level exact dedup, keep-FIRST (the C4 /
    RefinedWeb recipe: a repeated line survives only at its first
    corpus occurrence, ordered by (doc_id, position) — unlike
    pipeline_scrub_boilerplate, which deletes EVERY occurrence of a
    frequent chunk). Docs are whitespace token soup here, so "line" =
    non-overlapping 4-token chunk; every doc stays in the output
    (fully-deduped docs emit clean_text = '').

    Scale shape: chunking is pure array expressions per doc (no
    shuffle); the global first-occurrence claim is ONE shuffle keyed
    by the chunk (at real scale hash the chunk to 16 bytes and carry
    the hash, never the chunk text, through the shuffle); the winner
    re-joins the chunk stream on that key; reassembly is a per-doc
    array_sort over KB-sized docs. Exactly the scrub_boilerplate
    topology with min-struct in place of a distinct-count."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    nch = F.ceil(F.size(toks) / 4).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), nch - 1),
        lambda g: F.concat_ws(" ", F.slice(toks, g * 4 + 1, 4)),
    )
    ch = d.select(
        "doc_id",
        F.posexplode_outer(F.when(nch > 0, chunks)).alias("grp", "chunk"),
    )
    first = ch.filter(F.col("chunk").isNotNull()).groupBy("chunk").agg(
        F.min(F.struct("doc_id", "grp")).alias("fo")
    )
    kept = (
        ch.filter(F.col("chunk").isNotNull())
        .join(first, "chunk")
        .select(
            "doc_id",
            "grp",
            "chunk",
            (
                (F.col("fo.doc_id") == F.col("doc_id"))
                & (F.col("fo.grp") == F.col("grp"))
            ).alias("keep"),
        )
    )
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("grp", "chunk"))
                    )
                ),
                lambda s: s["chunk"],
            ),
        ).alias("clean_text"),
    )
    return d.select("doc_id").join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce(F.col("n_chunks") - F.col("n_kept"), F.lit(0))
        .cast("long")
        .alias("n_dropped"),
    )


@register(
    "pipeline_dataset_card",
    oracle="""
    WITH d AS (
      SELECT source, lang, coalesce(text, '') AS text
      FROM documents
    ),
    h AS (
      SELECT md5(text) AS th, count(*) AS n
      FROM d GROUP BY md5(text)
    ),
    per AS (
      SELECT d.source, d.lang, d.text,
             CAST(len(list_filter(string_split(d.text, ' '),
                                  t -> t <> '')) AS BIGINT) AS toks,
             CAST(length(d.text) AS BIGINT) AS chars,
             CASE WHEN h.n > 1 THEN 1 ELSE 0 END AS is_dup
      FROM d JOIN h ON h.th = md5(d.text)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS n_tokens,
           CAST(sum(chars) AS BIGINT) AS n_chars,
           round(sum(toks) / count(*), 2) AS avg_tokens,
           round(CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                      AS BIGINT) / count(*), 4) AS en_share,
           round(CAST(sum(is_dup) AS BIGINT) / count(*), 4) AS dup_rate
    FROM per GROUP BY source
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card — the governance rollup every training
    corpus ships with (datasheet / data-statement style): document and
    token counts, average length, language share, exact-duplicate
    rate. One line per source, suitable for the mixing decisions
    corpus_mix / pipeline_mix_temperature consume.

    Exactness: every numerator/denominator is an exact BIGINT; the
    three ratios are single divisions rounded on both engines.

    Scale: one md5-keyed aggregation for the duplicate census (16-byte
    shuffle keys, the dedup_exact shape), one join back on the hash,
    one map-side-combinable rollup keyed by source. Token counts are
    computed inline by array expressions — no explode, no second pass
    over the text."""
    d = table(spark, sf_dir, "documents").select(
        "source", "lang", F.coalesce("text", F.lit("")).alias("text")
    )
    h = d.groupBy(F.md5("text").alias("th")).agg(
        F.count(F.lit(1)).alias("n")
    )
    per = d.join(h, F.md5(d.text) == h.th).select(
        "source",
        "lang",
        F.size(
            F.filter(F.split("text", " "), lambda t: t != "")
        )
        .cast("long")
        .alias("toks"),
        F.length("text").cast("long").alias("chars"),
        F.when(F.col("n") > 1, F.lit(1)).otherwise(F.lit(0)).alias("is_dup"),
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("toks").cast("long").alias("n_tokens"),
        F.sum("chars").cast("long").alias("n_chars"),
        F.round(F.sum("toks") / F.count(F.lit(1)), 2).alias("avg_tokens"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long")
            / F.count(F.lit(1)),
            4,
        ).alias("en_share"),
        F.round(
            F.sum("is_dup").cast("long") / F.count(F.lit(1)), 4
        ).alias("dup_rate"),
    )


@register(
    "corpus_sample_fixed_k",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, source, n_chars, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
    ORDER BY source, rk
    """,
)
def corpus_sample_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-stratum sampling: exactly k (= 5) docs per
    source, chosen by md5(doc_id) order — a deterministic
    hash-shuffled draw, so the sample is reproducible across runs and
    engines and UNIFORM within each stratum (the hash is
    content-independent). The per-source pick is rank-over-window +
    rk <= k, which Spark 4 executes as WindowGroupLimit: each
    partition keeps only its top-k heap per source BEFORE the
    shuffle, so a 100 TB stratum never funnels through one partition
    — the same bounded shape as win_topk_per_group. Complements
    corpus_sample_weighted (Bernoulli, variable size) when the
    contract is exact-k per source (eval sets, human-review draws)."""
    d = table(spark, sf_dir, "documents")
    rk = F.row_number().over(
        W.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), "doc_id"
        )
    )
    return (
        d.select("doc_id", "source", "n_chars", rk.cast("long").alias("rk"))
        .filter(F.col("rk") <= 5)
        .orderBy("source", "rk")
    )


def _distributed_ntile_by(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    n_tiles: int,
    out_col: str,
    n_range_parts: int = 32,
) -> DataFrame:
    """Per-GROUP exact ntile(n) without a per-group single-partition
    window — the grouped generalization of _distributed_ntile (which
    is global). PARTITION BY <group> ORDER BY <order_cols> windows are
    bounded by rows-per-group, which at corpus scale is NOT bounded
    (one language can be most of the crawl); instead: range-partition
    on (group, order_cols), collect per-(partition, group) row counts
    (bounded by n_range_parts x |groups| — groups are dimension-sized
    by contract: languages, sources), derive each row's per-group
    global rank as offset + local row_number (the local window spans
    one range partition), and apply ntile's fat-tile rule with the
    GROUP's total as columns. Identical assignment to
    `ntile(n) OVER (PARTITION BY group ORDER BY ...)`."""
    from pyspark import StorageLevel

    r = (
        df.repartitionByRange(n_range_parts, group_col, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rows = (
        r.groupBy("_pid", group_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    per_group: dict = {}
    for row in rows:
        per_group.setdefault(row[group_col], []).append(
            (row["_pid"], row["n"])
        )
    offs, tots = [], []
    for key, lst in per_group.items():
        acc = 0
        for pid, n in sorted(lst):
            offs.append((key, pid, acc))
            acc += n
        tots.append((key, acc))
    spark = df.sparkSession
    from pyspark.sql import types as T

    # group dtype derived from the input (a long/date group key flows
    # through unchanged), and the joins are NULL-SAFE: SQL's
    # PARTITION BY treats NULL as its own partition, so a null-unsafe
    # equi-join here would silently DROP every NULL-group row while
    # the oracle's ntile keeps them (review catch)
    gtype = df.schema[group_col].dataType
    off_df = spark.createDataFrame(
        offs,
        T.StructType(
            [
                T.StructField("_g", gtype, True),
                T.StructField("_pid", T.IntegerType(), False),
                T.StructField("_offset", T.LongType(), False),
            ]
        ),
    )
    tot_df = spark.createDataFrame(
        tots,
        T.StructType(
            [
                T.StructField("_g2", gtype, True),
                T.StructField("_gn", T.LongType(), False),
            ]
        ),
    )
    wl = W.partitionBy("_pid", group_col).orderBy(*order_cols)
    g = (
        r.join(
            F.broadcast(off_df),
            (r["_pid"] == off_df["_pid"])
            & r[group_col].eqNullSafe(off_df["_g"]),
        )
        .drop(off_df["_pid"])
        .drop("_g")
        .join(
            F.broadcast(tot_df),
            F.col(group_col).eqNullSafe(tot_df["_g2"]),
        )
        .drop("_g2")
        .withColumn("_grank", F.col("_offset") + F.row_number().over(wl))
    )
    q = F.floor(F.col("_gn") / n_tiles)
    rem = F.col("_gn") % n_tiles
    fat_span = rem * (q + 1)
    tile = F.when(
        F.col("_grank") <= fat_span, (F.col("_grank") - 1) / (q + 1)
    ).otherwise(
        rem
        + (F.col("_grank") - fat_span - 1) / F.greatest(q, F.lit(1))
    )
    out = g.withColumn(out_col, (F.floor(tile) + 1).cast("long")).drop(
        "_pid", "_offset", "_grank", "_gn"
    )
    # Materialize the ranked output NOW (localCheckpoint pins it and
    # cuts the lineage back to r), then release r: unpersisting the
    # range-partitioned input lazily would re-sample range boundaries
    # on the next evaluation and mis-assign ranks, while never
    # unpersisting leaks cached partitions across a full-registry
    # sweep (round-8 ADVICE). The checkpoint blocks are GC-reclaimed
    # with the returned frame, unlike the forever-persist they replace.
    out = out.localCheckpoint(eager=True)
    r.unpersist()
    return out


@register(
    "pipeline_ccnet_buckets",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
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
           FROM big GROUP BY w1),
    scored AS (
      SELECT big.doc_id,
             round(avg(ln(n1.n_first * 1.0 / n2.n_pair)), 6) AS avg_nll
      FROM big
      JOIN n2 ON n2.w1 = big.w1 AND n2.w2 = big.w2
      JOIN n1 ON n1.w1 = big.w1
      GROUP BY big.doc_id
    ),
    ranked AS (
      SELECT s.doc_id, t.lang, s.avg_nll,
             CAST(ntile(3) OVER (PARTITION BY t.lang
                                 ORDER BY s.avg_nll, s.doc_id)
                  AS BIGINT) AS bucket_id
      FROM scored s JOIN t ON t.doc_id = s.doc_id
    )
    SELECT doc_id, lang, avg_nll, bucket_id,
           CASE bucket_id WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ranked
    """,
)
def pipeline_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al 2019): score
    every document under the corpus bigram LM (text_perplexity_bigram's
    avg negative log-likelihood) and split EACH LANGUAGE into
    head / middle / tail perplexity tertiles — the standard
    quality-stratified corpus layout (train on head+middle, sample the
    tail) that keeps per-language quality comparable instead of letting
    high-resource languages define "fluent".

    Cross-engine determinism: the tertile ORDER key is the ROUNDED
    avg_nll — the exact column text_perplexity_bigram already proves
    hash-identical across engines — with doc_id tie-break, so the
    ranking can never flip on libm ulps. The per-lang tertile is the
    grouped two-phase distributed ntile (_distributed_ntile_by): never
    a per-language single-partition window (one language can be most
    of a crawl).

    100 TB shape: LM counts are map-side-combinable word aggregates,
    score joins are co-partitioned equi-joins (no broadcast hints —
    web-corpus bigram vocab exceeds an executor), and the bucket
    assignment adds one range shuffle plus a |partitions|x|langs|
    bounded collect."""
    return ccnet_buckets_df(spark, table(spark, sf_dir, "documents"))


def ccnet_buckets_df(spark: SparkSession, d: DataFrame) -> DataFrame:
    """CCNet bucketing over an arbitrary documents frame — shared by
    pipeline_ccnet_buckets and pipeline_e2e (the LM is trained on the
    SAME frame it scores, so the e2e stage retrains on survivors)."""
    pairs = F.arrays_zip(
        F.expr("slice(split(text, ' '), 1, size(split(text, ' ')) - 1)")
        .alias("w1"),
        F.expr("slice(split(text, ' '), 2, size(split(text, ' ')) - 1)")
        .alias("w2"),
    )
    big = d.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", "p.w1", "p.w2"
    )
    n2 = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("n_pair")
    )
    n1 = big.groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("n_first")
    )
    nll = F.log(F.col("n_first") * 1.0 / F.col("n_pair"))
    scored = (
        big.join(n2, ["w1", "w2"])
        .join(n1, "w1")
        .groupBy("doc_id")
        .agg(F.round(F.avg(nll), 6).alias("avg_nll"))
        .join(d.select("doc_id", "lang"), "doc_id")
    )
    ranked = _distributed_ntile_by(
        scored,
        group_col="lang",
        order_cols=["avg_nll", "doc_id"],
        n_tiles=3,
        out_col="bucket_id",
    )
    return ranked.select(
        "doc_id",
        "lang",
        "avg_nll",
        "bucket_id",
        F.when(F.col("bucket_id") == 1, "head")
        .when(F.col("bucket_id") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


_DSIR_TARGET_SOURCE = "src0"


@register(
    "pipeline_dsir_weights",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, source,
             CAST(CAST('0x' || substr(md5(t), 1, 6) AS INTEGER) % 256
                  AS BIGINT) AS bucket
      FROM (
        SELECT doc_id, source,
               unnest(list_filter(string_split(coalesce(text, ''), ' '),
                                  x -> x <> '')) AS t
        FROM documents
      )
    ),
    bc AS (
      SELECT bucket,
             CAST(1 + sum(CASE WHEN source = '{_DSIR_TARGET_SOURCE}'
                          THEN 1 ELSE 0 END) AS BIGINT) AS t_b,
             CAST(1 + sum(CASE WHEN source <> '{_DSIR_TARGET_SOURCE}'
                          THEN 1 ELSE 0 END) AS BIGINT) AS r_b
      FROM tok GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(256 + sum(t_b - 1) AS BIGINT) AS tt,
             CAST(256 + sum(r_b - 1) AS BIGINT) AS rt
      FROM bc
    ),
    lam AS (
      SELECT bucket,
             ln(t_b * 1.0 / tt) - ln(r_b * 1.0 / rt) AS lam
      FROM bc, tot
    ),
    dc AS (
      SELECT doc_id, source, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM tok GROUP BY doc_id, source, bucket
    ),
    folded AS (
      SELECT doc_id, source,
             CAST(sum(cnt) AS BIGINT) AS n_toks,
             list_sum(list_transform(
               list_sort(list(ROW(bucket, cnt * lam.lam))),
               x -> x[2])) AS w
      FROM dc JOIN lam USING (bucket)
      GROUP BY doc_id, source
    )
    SELECT doc_id, source, n_toks,
           round(w, 6) + 0.0 AS weight,
           source = '{_DSIR_TARGET_SOURCE}' AS is_target
    FROM folded
    """,
)
def pipeline_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al 2023, Data Selection via
    Importance Resampling): score every document by how target-like
    its hashed unigram features are — weight(doc) = sum over feature
    buckets of count_b(doc) x [ln p_target(b) - ln p_raw(b)], Laplace
    +1 smoothing, 256 md5 feature buckets (the text_feat_hash
    convention) — the standard cheap way to upsample domain-relevant
    web data toward a target corpus (here: source {_DSIR_TARGET_SOURCE}
    as the target domain).

    Cross-engine float discipline: the per-bucket log-ratio is
    ln(exact-int ratio) spelled identically on both engines; the
    per-document sum folds the (bucket-sorted) contribution array
    left-to-right on BOTH engines (F.aggregate / list_sum), so the
    accumulation order is fixed and only libm ulps remain — rounded
    6dp, signed zero normalized (+ 0.0, RULE 4: a near-neutral doc's
    weight rounds to zero from either side).

    100 TB shape: token explode -> (doc, bucket) counts (map-side
    combinable, bounded at docs x 256), the 256-row lambda table is a
    broadcast BY CONSTRUCTION (fixed bucket space — that bound is the
    hashing trick's point), one doc-keyed fold. No vocabulary join,
    no driver state beyond 256 rows."""
    return dsir_weights_df(spark, table(spark, sf_dir, "documents"))


def dsir_weights_df(spark: SparkSession, d: DataFrame) -> DataFrame:
    """DSIR weights over an arbitrary documents frame — shared by
    pipeline_dsir_weights and pipeline_e2e (the target/raw bucket
    statistics are estimated on the SAME frame being weighted)."""
    tok = d.select(
        "doc_id",
        "source",
        F.explode(
            F.filter(
                F.split(F.coalesce("text", F.lit("")), " "),
                lambda t: t != "",
            )
        ).alias("t"),
    ).select(
        "doc_id",
        "source",
        (F.conv(F.substring(F.md5("t"), 1, 6), 16, 10).cast("long") % 256)
        .alias("bucket"),
    )
    is_t = F.col("source") == _DSIR_TARGET_SOURCE
    bc = tok.groupBy("bucket").agg(
        (1 + F.sum(F.when(is_t, 1).otherwise(0))).cast("long").alias("t_b"),
        (1 + F.sum(F.when(~is_t, 1).otherwise(0))).cast("long").alias("r_b"),
    )
    tot = bc.agg(
        (256 + F.sum(F.col("t_b") - 1)).cast("long").alias("tt"),
        (256 + F.sum(F.col("r_b") - 1)).cast("long").alias("rt"),
    )
    lam = bc.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log(F.col("t_b") * 1.0 / F.col("tt"))
            - F.log(F.col("r_b") * 1.0 / F.col("rt"))
        ).alias("lam"),
    )
    dc = tok.groupBy("doc_id", "source", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    folded = (
        dc.join(F.broadcast(lam), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("cnt").cast("long").alias("n_toks"),
            F.expr(
                "aggregate(array_sort(collect_list("
                "struct(bucket, cnt * lam AS contrib))), "
                "CAST(0.0 AS DOUBLE), (a, x) -> a + x.contrib)"
            ).alias("w"),
        )
    )
    return folded.select(
        "doc_id",
        "source",
        "n_toks",
        (F.round("w", 6) + F.lit(0.0)).alias("weight"),
        (F.col("source") == _DSIR_TARGET_SOURCE).alias("is_target"),
    )


_E2E_BPE_MERGES = 8


def _e2e_oracle() -> str:
    """Composed oracle for pipeline_e2e: gopher keep -> exact dedup ->
    simhash near-dedup -> (ccnet buckets + dsir weights + bpe token
    counts, each recomputed ON THE SURVIVOR SET).  Every stage CTE is
    the already-proven stage oracle's text re-sourced to the previous
    stage's output (simhash fingerprint CTEs and the BPE chain are
    literally the SAME generated fragments the stage keys use —
    _SIMHASH_FP_CTES / _bpe_oracle_chain_parts — so the trickiest
    expressions cannot drift)."""
    from spark_cep_spark.operators.llm_dedup import _SIMHASH_FP_CTES
    from spark_cep_spark.operators.llm_text import (
        _GOPHER_STOPWORDS,
        _bpe_oracle_chain_parts,
    )

    n = _E2E_BPE_MERGES
    parts = [
        # stage 1: gopher rules (text_gopher_rules oracle, keep only)
        "gt AS (SELECT doc_id, list_filter(string_split(coalesce(text,"
        " ''), ' '), x -> x <> '') AS w FROM documents)",
        "gs AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,"
        " CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0)"
        " AS BIGINT) AS sum_len,"
        f" CAST(len(list_filter(string_split('{_GOPHER_STOPWORDS}', ' '),"
        " s -> list_contains(w, s))) AS BIGINT) AS n_stop_hits FROM gt)",
        "gk AS (SELECT doc_id FROM gs WHERE n_words BETWEEN 10 AND 100000"
        " AND 2 * n_words <= sum_len AND sum_len <= 10 * n_words"
        " AND n_stop_hits >= 2)",
        "d1 AS (SELECT d.* FROM documents d JOIN gk USING (doc_id))",
        # stage 2: exact dedup keep-first (dedup_exact oracle)
        "ex AS (SELECT doc_id FROM (SELECT doc_id, row_number() OVER"
        " (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM d1)"
        " WHERE rn = 1)",
        "d2 AS (SELECT d1.* FROM d1 JOIN ex USING (doc_id))",
        # stage 3: simhash near-dedup keep-first (dedup_simhash
        # fingerprint CTEs, re-sourced)
        _SIMHASH_FP_CTES.format(src="d2").strip().rstrip(","),
        "nr AS (SELECT doc_id FROM (SELECT doc_id, row_number() OVER"
        " (PARTITION BY simhash ORDER BY doc_id) AS rn FROM fp)"
        " WHERE rn = 1)",
        "surv AS (SELECT d2.* FROM d2 JOIN nr USING (doc_id))",
        # stage 4: ccnet buckets on survivors (pipeline_ccnet_buckets
        # oracle, c-prefixed)
        "ct AS (SELECT doc_id, lang, string_split(text, ' ') AS w"
        " FROM surv)",
        "cbig AS (SELECT doc_id, unnest(w[1:len(w)-1]) AS w1,"
        " unnest(w[2:len(w)]) AS w2 FROM ct WHERE len(w) >= 2)",
        "cn2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair"
        " FROM cbig GROUP BY w1, w2)",
        "cn1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS n_first"
        " FROM cbig GROUP BY w1)",
        "cscored AS (SELECT cbig.doc_id,"
        " round(avg(ln(cn1.n_first * 1.0 / cn2.n_pair)), 6) AS avg_nll"
        " FROM cbig JOIN cn2 ON cn2.w1 = cbig.w1 AND cn2.w2 = cbig.w2"
        " JOIN cn1 ON cn1.w1 = cbig.w1 GROUP BY cbig.doc_id)",
        "cranked AS (SELECT s.doc_id, t.lang, s.avg_nll,"
        " CAST(ntile(3) OVER (PARTITION BY t.lang"
        " ORDER BY s.avg_nll, s.doc_id) AS BIGINT) AS bucket_id"
        " FROM cscored s JOIN ct t ON t.doc_id = s.doc_id)",
        # stage 5: dsir weights on survivors (pipeline_dsir_weights
        # oracle, d-prefixed)
        "dtok AS (SELECT doc_id, source,"
        " CAST(CAST('0x' || substr(md5(t), 1, 6) AS INTEGER) % 256"
        " AS BIGINT) AS bucket FROM (SELECT doc_id, source,"
        " unnest(list_filter(string_split(coalesce(text, ''), ' '),"
        " x -> x <> '')) AS t FROM surv))",
        f"dbc AS (SELECT bucket, CAST(1 + sum(CASE WHEN source ="
        f" '{_DSIR_TARGET_SOURCE}' THEN 1 ELSE 0 END) AS BIGINT) AS t_b,"
        f" CAST(1 + sum(CASE WHEN source <> '{_DSIR_TARGET_SOURCE}'"
        " THEN 1 ELSE 0 END) AS BIGINT) AS r_b FROM dtok GROUP BY bucket)",
        "dtot AS (SELECT CAST(256 + sum(t_b - 1) AS BIGINT) AS tt,"
        " CAST(256 + sum(r_b - 1) AS BIGINT) AS rt FROM dbc)",
        "dlam AS (SELECT bucket, ln(t_b * 1.0 / tt) - ln(r_b * 1.0 / rt)"
        " AS lam FROM dbc, dtot)",
        "ddc AS (SELECT doc_id, source, bucket,"
        " CAST(count(*) AS BIGINT) AS cnt FROM dtok"
        " GROUP BY doc_id, source, bucket)",
        "dfolded AS (SELECT doc_id, source, CAST(sum(cnt) AS BIGINT)"
        " AS n_toks, list_sum(list_transform(list_sort(list(ROW(bucket,"
        " cnt * dlam.lam))), x -> x[2])) AS w FROM ddc"
        " JOIN dlam USING (bucket) GROUP BY doc_id, source)",
        # stage 6: BPE tokenizer trained on survivors + per-doc counts
        # (pipeline_bpe_tokens oracle chain, re-sourced)
        *_bpe_oracle_chain_parts(n, src="surv"),
        "bdw AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),"
        " '[a-z]+')) AS w FROM surv)",
        "bdwc AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS cnt"
        " FROM bdw GROUP BY doc_id, w)",
        "btk AS (SELECT d.doc_id, CAST(sum(d.cnt * len(f.syms))"
        f" AS BIGINT) AS n_tokens FROM bdwc d JOIN w{n} f ON f.w = d.w"
        " GROUP BY d.doc_id)",
    ]
    return (
        "WITH "
        + ",\n".join(parts)
        + """
    SELECT r.doc_id, r.lang, r.avg_nll, r.bucket_id,
           CASE r.bucket_id WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           f.source, f.n_toks, round(f.w, 6) + 0.0 AS weight,
           k.n_tokens
    FROM cranked r
    JOIN dfolded f USING (doc_id)
    JOIN btk k USING (doc_id)
    """
    )


@register("pipeline_e2e", oracle=_e2e_oracle())
def pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus pipeline integration (round-9 verdict item
    7) — the artifact an LLM data team actually ships, as ONE key:
    gopher quality rules -> exact dedup (md5 keep-first) -> simhash
    near-dedup (16-bit md5 fingerprint keep-first) -> on the SURVIVOR
    set: ccnet perplexity tertiles per language + dsir importance
    weights + a freshly-trained BPE tokenizer's per-document token
    counts.  One row per surviving document with its bucket, weight,
    and token budget.  Every stage is the registered stage operator's
    own code (gopher_stats / exact_keepers / simhash_md5_fp /
    ccnet_buckets_df / dsir_weights_df / bpe_doc_tokens — shared
    functions, not copies), and the oracle is the composition of the
    stage oracles re-sourced stage-to-stage — so a schema or
    convention drift ANYWHERE in the chain fails this one key (the
    cross-stage regression canary).

    The downstream stages recompute their statistics ON SURVIVORS
    (LM, dsir bucket ratios, BPE merges) — the real pipeline
    semantics: filtering first changes what the models see.  BPE uses
    8 merges here (tokenizer size is a config; the 32-merge artifact
    is pipeline_bpe_train's contract) to keep the composed key's
    latency in the driver-gate budget.

    100 TB shape: the filter stages are one codegen projection + two
    16-byte-key shuffles (hash/fingerprint, never text); survivors
    materialize ONCE (eager localCheckpoint — the BPE trainer's 8
    rounds and three stage scans must not re-run the dedup lineage);
    downstream stages keep their own documented postures.  No stage
    sees pre-filter data, so the whole chain's cost tracks the KEPT
    fraction — the reason real pipelines order cheap filters first."""
    from spark_cep_spark.operators.llm_dedup import (
        exact_keepers,
        simhash_md5_fp,
    )
    from spark_cep_spark.operators.llm_text import (
        bpe_doc_tokens,
        gopher_stats,
    )

    d = table(spark, sf_dir, "documents")
    kept = d.join(
        gopher_stats(d).filter("keep").select("doc_id"), "doc_id"
    )
    kept = kept.join(exact_keepers(kept).select("doc_id"), "doc_id")
    wn = W.partitionBy("simhash").orderBy("doc_id")
    near = (
        simhash_md5_fp(kept)
        .withColumn("rn", F.row_number().over(wn))
        .filter(F.col("rn") == 1)
        .select("doc_id")
    )
    # materialize survivors once: the BPE trainer alone launches
    # n_merges jobs over this frame (eager checkpoint = the
    # _distributed_ntile_by discipline; blocks GC with the frame)
    surv = kept.join(near, "doc_id").localCheckpoint(eager=True)
    cc = ccnet_buckets_df(spark, surv)
    dw = dsir_weights_df(spark, surv).select(
        "doc_id", "source", "n_toks", "weight"
    )
    tk = bpe_doc_tokens(spark, surv, n_merges=_E2E_BPE_MERGES)
    return (
        cc.join(dw, "doc_id")
        .join(tk, "doc_id")
        .select(
            "doc_id",
            "lang",
            "avg_nll",
            "bucket_id",
            "bucket",
            "source",
            "n_toks",
            "weight",
            "n_tokens",
        )
    )


# ---------------------------------------------------------------------------
# Streaming corpus intake (round 10): the 24/7 ingest composition —
# quality gate -> near-dedup -> per-window accept/reject counters.


def corpus_intake_flags(d: DataFrame) -> DataFrame:
    """Per-document intake verdicts over a (doc_id, text, ts) frame:
    the Gopher keep flag (gopher_stats — the ONE shared spelling),
    and for quality survivors the minhash-signature keep-first dedup
    verdict (deterministic winner: lowest doc_id per signature — the
    stream_dedup_near batch-twin convention). Returns one row per
    input document with (doc_id, ts, n_words, keep, acc): acc = the
    document enters the corpus (quality-passed AND dedup winner).

    100 TB shape: quality is a pure codegen projection; dedup costs
    the signature aggregate (one doc-keyed shuffle; the Arrow
    signature path in SCALE.md removes the shingle explode) plus one
    signature-keyed window — both on the quality SURVIVOR set only."""
    from spark_cep_spark.operators.llm_dedup import _minhash_signature
    from spark_cep_spark.operators.llm_text import gopher_stats

    # quality flags ride the SAME projection (carry=) — no self-join,
    # one source scan (round-10 review catch)
    flags = gopher_stats(
        d.select("doc_id", "ts", "text"), carry=("ts", "text")
    ).select("doc_id", "ts", "text", "n_words", "keep")
    surv = flags.filter(F.col("keep"))
    wk = W.partitionBy("sig").orderBy("doc_id")
    kept = (
        _minhash_signature(surv.select("doc_id", "text"))
        .withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.lit(True).alias("acc"))
    )
    return (
        flags.drop("text")
        .join(kept, "doc_id", "left")
        .select(
            "doc_id",
            "ts",
            "n_words",
            "keep",
            F.coalesce("acc", F.lit(False)).alias("acc"),
        )
    )


def corpus_intake_agg(d: DataFrame) -> DataFrame:
    """Per-minute intake counters over the flagged documents: volume,
    quality rejects, duplicate rejects, accepted docs, and the
    accepted word volume — the ONE dashboard row an ingest team
    watches. Exact integer counters only (no float discipline)."""
    fl = corpus_intake_flags(d)
    return (
        fl.groupBy(F.date_trunc("minute", F.col("ts")).alias("win_start"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_quality_reject"),
            F.sum(F.when(F.col("keep") & ~F.col("acc"), 1).otherwise(0))
            .cast("long")
            .alias("n_dup_reject"),
            F.sum(F.when(F.col("acc"), 1).otherwise(0))
            .cast("long")
            .alias("n_accepted"),
            F.sum(F.when(F.col("acc"), F.col("n_words")).otherwise(0))
            .cast("long")
            .alias("accepted_words"),
        )
    )


def _intake_oracle() -> str:
    """Composed oracle: the gopher CTEs re-sourced to the ts-stamped
    documents (pipeline_e2e's fragments), the minhash signature SQL
    re-sourced to the survivor set (minhash_sig_sql — the stage key's
    own generated text), keep-first per signature, then the per-minute
    counter rollup."""
    from spark_cep_spark.operators.llm_dedup import minhash_sig_sql
    from spark_cep_spark.operators.llm_text import _GOPHER_STOPWORDS

    return f"""
    WITH d0 AS (
      SELECT doc_id, text,
             make_timestamp((1700000000 + doc_id) * 1000000) AS ts
      FROM documents
    ),
    gt AS (SELECT doc_id, list_filter(string_split(coalesce(text, ''),
                  ' '), x -> x <> '') AS w FROM d0),
    gs AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(w, x -> length(x))),
                           0) AS BIGINT) AS sum_len,
             CAST(len(list_filter(string_split('{_GOPHER_STOPWORDS}',
                                               ' '),
                                  s -> list_contains(w, s)))
                  AS BIGINT) AS n_stop_hits
           FROM gt),
    gk AS (SELECT doc_id, n_words,
             (n_words BETWEEN 10 AND 100000
              AND 2 * n_words <= sum_len AND sum_len <= 10 * n_words
              AND n_stop_hits >= 2) AS keep
           FROM gs),
    surv AS (SELECT d0.doc_id, d0.text FROM d0
             JOIN gk USING (doc_id) WHERE gk.keep),
    sigs AS ({minhash_sig_sql("surv")}),
    kept AS (SELECT doc_id FROM (
               SELECT doc_id, row_number() OVER
                      (PARTITION BY sig ORDER BY doc_id) AS rn
               FROM sigs) WHERE rn = 1),
    fl AS (SELECT d0.doc_id, d0.ts, gk.n_words, gk.keep,
                  kept.doc_id IS NOT NULL AS acc
           FROM d0 JOIN gk USING (doc_id)
           LEFT JOIN kept USING (doc_id))
    SELECT date_trunc('minute', ts) AS win_start,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quality_reject,
           CAST(sum(CASE WHEN keep AND NOT acc THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dup_reject,
           CAST(sum(CASE WHEN acc THEN 1 ELSE 0 END) AS BIGINT)
             AS n_accepted,
           CAST(sum(CASE WHEN acc THEN n_words ELSE 0 END) AS BIGINT)
             AS accepted_words
    FROM fl
    GROUP BY date_trunc('minute', ts)
    """


@register("stream_corpus_intake", oracle=_intake_oracle())
def stream_corpus_intake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus intake — the composition a data-ingest team
    runs 24/7 (round-10 verdict item 4): a continuously-deduped,
    quality-filtered document stream with per-minute accept/reject
    counters.  Stages, each already proven standalone: the Gopher
    quality gate (text_gopher_rules), minhash-signature near-dedup
    keep-first (stream_dedup_near), and a dq_monitor-style windowed
    counter rollup.  This batch twin stamps the SAME deterministic
    arrival time the streaming harness uses (ts = epoch 1700000000 +
    doc_id seconds, stage_documents_files) so the two faces window
    identically; the streaming faces are corpus_intake_stream (the
    accepted-docs product, signature dedup within the watermark) and
    corpus_intake_counters_stream (the dedup-independent counter
    feed — a streaming dedup drops rows, it cannot flag them, so the
    per-window duplicate count is the batch twin's column; tests pin
    the accepted signature set + count against the batch twin, and
    cross-restart first-arrival-wins via kill-and-resume)."""
    d = table(spark, sf_dir, "documents").withColumn(
        "ts", F.expr("timestamp_seconds(1700000000 + doc_id)")
    )
    return corpus_intake_agg(d)


def corpus_intake_stream(
    docs_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming face, the intake PRODUCT: quality gate (pure codegen
    projection — streaming-legal), then per-doc Arrow minhash
    signatures, then signature dedup within the watermark
    (near_dedup_sig_stream — bounded state: one signature per unique
    surviving doc per watermark horizon).  Emits (doc_id, ts, sig) of
    accepted documents; the first ARRIVAL per signature wins, so under
    out-of-order arrival the winner may differ from the batch twin's
    lowest-doc_id (the documented stream_dedup_near invariant — the
    accepted COUNT per signature is identical)."""
    from spark_cep_spark.operators.llm_dedup import near_dedup_sig_stream
    from spark_cep_spark.operators.llm_text import gopher_stats

    # flags computed ON the stream projection (carry=) — a join back
    # to the same source would be a stateful stream-stream self-join
    # with unbounded state on a 24/7 run (round-10 review catch)
    surv = (
        gopher_stats(
            docs_stream.select("doc_id", "ts", "text"),
            carry=("ts", "text"),
        )
        .filter(F.col("keep"))
        .select("doc_id", "ts", "text")
    )
    return near_dedup_sig_stream(surv, watermark=watermark)


def corpus_intake_counters_stream(
    docs_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming face, the COUNTER feed: the dedup-independent intake
    counters as ONE map-side-combinable windowed aggregation (the
    dq_monitor pattern) — volume, quality rejects, quality-passed
    docs and their word volume per minute.  Duplicate rejects need
    the dedup verdict, which a streaming drop cannot flag — that
    column lives on the batch twin (run it over the landed bronze
    layer); every column here is exact under ANY arrival order."""
    from spark_cep_spark.operators.llm_text import gopher_stats

    fl = gopher_stats(
        docs_stream.select("doc_id", "ts", "text"), carry=("ts",)
    ).select("doc_id", "ts", "n_words", "keep").withWatermark(
        "ts", watermark
    )
    return (
        fl.groupBy(F.window("ts", "1 minute").alias("win"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.when(~F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_quality_reject"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_quality_pass"),
            F.sum(F.when(F.col("keep"), F.col("n_words")).otherwise(0))
            .cast("long")
            .alias("quality_pass_words"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "n_docs",
            "n_quality_reject",
            "n_quality_pass",
            "quality_pass_words",
        )
    )
