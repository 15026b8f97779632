"""Deduplication operators for LLM-data pipelines (SURVEY §2.11).

Family: exact (hash groupBy), MinHash signature match, n-gram Jaccard,
SimHash, embedding-cosine near-dup. All hash primitives are md5-based
so the DuckDB oracle can reproduce signatures bit-for-bit (Spark's
xxhash64 has no DuckDB twin — md5's lexicographic order is just as
uniform for min-hashing).

100 TB posture: every operator here is a groupBy/join on a hash or
signature key — shuffle-partitionable, no driver-side state. The
Jaccard pair join is the only quadratic-risk op; at scale it must be
preceded by LSH banding (dedup_near's signature buckets serve exactly
that role — candidate pairs come from band buckets, Jaccard verifies).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.registry import register

N_MINHASH = 6  # permutations; md5(seed:token) min per seed


@register(
    "dedup_exact",
    oracle="""
    SELECT doc_id, text_hash FROM (
        SELECT doc_id, md5(text) AS text_hash,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents) t
    WHERE rn = 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup, keep-first by doc_id. One shuffle on the text hash;
    at 100 TB hash first (md5/xxhash64) so the shuffle moves 16-byte
    keys, never full documents."""
    return exact_keepers(table(spark, sf_dir, "documents"))


def exact_keepers(d: DataFrame) -> DataFrame:
    """(doc_id, text_hash) of the kept (lowest-doc_id) copy per exact
    text — shared by dedup_exact and pipeline_e2e's dedup stage."""
    w = W.partitionBy("text_hash").orderBy("doc_id")
    return (
        d.select("doc_id", F.md5("text").alias("text_hash"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def _doc_shingles(d: DataFrame) -> DataFrame:
    """(doc_id, sh) — DISTINCT 3-token shingles per document.

    Shingles (not single tokens) are essential on a small-vocabulary
    corpus: token SETS collide for most long documents, while 3-gram
    shingle sets are near-unique per text — signatures then collide
    only for genuinely near-identical docs.
    """
    toks = F.split("text", " ")
    # The >= 3 filter already excludes short docs, but the expression is
    # guarded anyway: unguarded sequence(1, size-2) runs DESCENDING for
    # <3-token docs (Spark sequence(1,0) == [1,0]) and would crash
    # element_at if Catalyst ever evaluated it before the filter.
    shingles = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS array<string>)"))
    return (
        d.filter(F.size(toks) >= 3)
        .select("doc_id", F.explode(F.array_distinct(shingles)).alias("sh"))
    )


def _minhash_hashes(d: DataFrame) -> DataFrame:
    """(doc_id, h0..h{N-1}) — per-seed min(md5(seed:shingle))."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"h{i}")
        for i in range(N_MINHASH)
    ]
    return _doc_shingles(d).groupBy("doc_id").agg(*aggs)


def _minhash_signature(d: DataFrame) -> DataFrame:
    """(doc_id, sig) — sig = concat of the per-seed minhashes."""
    return _minhash_hashes(d).select(
        "doc_id",
        F.concat_ws("|", *[F.col(f"h{i}") for i in range(N_MINHASH)]).alias("sig"),
    )


def shingles_sql(rel: str = "documents") -> str:
    """DuckDB SQL for (doc_id, sh) distinct 3-token shingles of `rel`
    (any relation with doc_id + text)."""
    return f"""
            SELECT DISTINCT doc_id, unnest(list_transform(
                     range(1, len(toks) - 1),
                     i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))) AS sh
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM {rel})
            WHERE len(toks) >= 3
"""


def minhash_hashes_sql(rel: str = "documents") -> str:
    return """
          SELECT doc_id, {aggs}
          FROM ({shingles}) t
          GROUP BY doc_id
""".format(
        shingles=shingles_sql(rel),
        aggs=", ".join(
            f"min(md5(concat('{i}:', sh))) AS h{i}" for i in range(N_MINHASH)
        ),
    )


def minhash_sig_sql(rel: str = "documents") -> str:
    return """
        SELECT doc_id,
               concat_ws('|', {cols}) AS sig
        FROM ({hashes}) s
""".format(
        cols=", ".join(f"h{i}" for i in range(N_MINHASH)),
        hashes=minhash_hashes_sql(rel),
    )


_SHINGLES_SQL = shingles_sql()
_MINHASH_HASHES_SQL = minhash_hashes_sql()
_MINHASH_SIG_SQL = minhash_sig_sql()


@register(
    "dedup_near",
    oracle=f"""
    WITH sigs AS ({_MINHASH_SIG_SQL})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.doc_id < b.doc_id
    """,
)
def dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup via MinHash: token shingles → 6-permutation signature →
    docs bucketed by full signature; pairs sharing a bucket are
    near-duplicate candidates. Pure SQL-expressible minhash (md5 seeds),
    so the oracle reproduces it exactly (SURVEY §2.11).

    At 100 TB: band the signature (e.g. 2 hashes/band × 3 bands), join
    per band, then Jaccard-verify candidates (dedup_jaccard below)."""
    d = table(spark, sf_dir, "documents")
    # both sides of the self-join consume the signature aggregate —
    # persist so the shingle explode + minhash run once, not twice
    sigs = _minhash_signature(d).persist()
    a = sigs.alias("a")
    b = sigs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )


def minhash_signature_arrow(d: DataFrame) -> DataFrame:
    """The 100 TB signature path SCALE.md prescribes: signatures
    computed per document INSIDE an Arrow-batched mapInPandas — no
    shingle explode, no shuffle of the (doc x shingle) intermediate;
    the only shuffled data is (doc_id, sig). Hash-identical to
    _minhash_signature (same md5(seed:shingle) min per seed), so the
    two paths are interchangeable under the same oracle. At real scale
    swap hashlib.md5 for a vectorized 64-bit hash; the md5 here keeps
    bit-parity with the SQL-expressible variant."""
    import hashlib

    import pandas as pd

    def sig_batch(it):
        for pdf in it:
            ids, sigs = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                if text is None:  # NULL text: no shingles, drop — same
                    continue      # as the SQL variant's size>=3 filter
                toks = text.split(" ")
                if len(toks) < 3:
                    continue
                shingles = {
                    " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                }
                encoded = [sh.encode() for sh in shingles]
                mins = [
                    min(
                        hashlib.md5(b"%d:" % seed + sh).hexdigest()
                        for sh in encoded
                    )
                    for seed in range(N_MINHASH)
                ]
                ids.append(doc_id)
                sigs.append("|".join(mins))
            yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    return d.select("doc_id", "text").mapInPandas(
        sig_batch, "doc_id long, sig string"
    )


@register(
    "dedup_near_arrow",
    oracle=f"""
    WITH sigs AS ({_MINHASH_SIG_SQL})
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.doc_id < b.doc_id
    """,
)
def dedup_near_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_near through the Arrow signature path — same oracle as
    dedup_near, proving the scale variant is drop-in equivalent."""
    d = table(spark, sf_dir, "documents")
    # persist: the Arrow signature pass is the expensive stage and the
    # self-join would otherwise run the Python workers twice
    sigs = minhash_signature_arrow(d).persist()
    a = sigs.alias("a")
    b = sigs.alias("b")
    return a.join(
        b,
        (F.col("a.sig") == F.col("b.sig")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))


@register(
    "dedup_jaccard",
    oracle="""
    WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
                 FROM documents),
         cnt AS (SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id),
         pair AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS shared
                  FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
                  GROUP BY a.doc_id, b.doc_id)
    SELECT pair.da AS doc_a, pair.db AS doc_b,
           round(pair.shared * 1.0 / (ca.n + cb.n - pair.shared), 6) AS jaccard
    FROM pair
    JOIN cnt ca ON ca.doc_id = pair.da
    JOIN cnt cb ON cb.doc_id = pair.db
    WHERE pair.shared * 1.0 / (ca.n + cb.n - pair.shared) >= 0.8
    """,
)
def dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram (token-set) Jaccard similarity ≥ 0.8 pairs via the
    token-inverted-index join. Quadratic in docs-per-token — at scale
    this runs ONLY on LSH candidate pairs, never all-pairs."""
    t = 0.8
    d = table(spark, sf_dir, "documents")
    # three consumers of the token explode (cnt, freq, the ranked
    # join — round 11 moved verification onto per-doc token arrays,
    # off the exploded index) — persist so it tokenizes once
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    ).persist()
    cnt = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))

    # Prefix filter (EXACT, output-preserving — the PPJoin bound): two
    # sets with J >= t must share a token among each one's first
    # n - ceil(t*n) + 1 tokens under a GLOBAL token order. Ordering by
    # ascending global frequency puts the RAREST tokens in the prefix,
    # so candidate generation joins only on rare tokens — this is what
    # collapses the quadratic token join at scale (common stopwords
    # never generate candidates).
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    w = W.partitionBy("doc_id").orderBy("freq", "tok")
    ranked = (
        tok.join(freq, "tok")
        .join(cnt, "doc_id")
        .withColumn("rk", F.row_number().over(w))
    )
    prefix = ranked.filter(
        F.col("rk") <= F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1
    ).select("doc_id", "tok", "n")

    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size filter: J >= t implies t*|B| <= |A| (and vice versa)
            & (F.col("a.n") * F.lit(t) <= F.col("b.n"))
            & (F.col("b.n") * F.lit(t) <= F.col("a.n")),
        )
        # only the pair ids survive the dedup shuffle (na/nb are
        # recovered as size(toks) after the array join — same count
        # as cnt.n by construction)
        .select(
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
        )
        .distinct()
    )

    # Exact verification on the candidate set only — each pair joins
    # to the two docs' token ARRAYS (one row per doc) and the overlap
    # is size(array_intersect(...)), evaluated in whole-stage codegen.
    # The previous spelling re-joined candidates through the EXPLODED
    # token table twice and re-aggregated: |cand| x tokens-per-doc
    # intermediate rows plus a pair-keyed hash aggregate — on the
    # near-dup-dense fixture 6.5M candidate pairs ballooned to ~150M
    # join rows (verify alone 36 s at sf0.1; whole op 28.6 -> 8.3 s
    # after).  Same integers (shared, na, nb) per pair, so the output
    # is value-identical; at scale the pair->doc-set joins are plain
    # hash joins on doc_id, never wider than the candidate stream.
    sets = d.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    pair = (
        cand.join(
            sets.select(
                F.col("doc_id").alias("da"), F.col("toks").alias("ta")
            ),
            "da",
        )
        .join(
            sets.select(
                F.col("doc_id").alias("db"), F.col("toks").alias("tb")
            ),
            "db",
        )
        .select(
            "da",
            "db",
            F.size("ta").alias("na"),
            F.size("tb").alias("nb"),
            F.size(F.array_intersect("ta", "tb")).alias("shared"),
        )
    )
    jac = F.col("shared") * 1.0 / (F.col("na") + F.col("nb") - F.col("shared"))
    return pair.filter(jac >= t).select(
        F.col("da").alias("doc_a"),
        F.col("db").alias("doc_b"),
        F.round(jac, 6).alias("jaccard"),
    )


def simhash64(df: DataFrame, text_col: str = "text") -> DataFrame:
    """SimHash fingerprint (64-bit) per row, built from xxhash64 token
    hashes entirely with JVM-side expressions (no UDF): for each bit,
    sum ±1 over tokens and take the sign.

    Spark-only hash → no DuckDB oracle; unit tests assert identical
    texts ⇒ identical simhash and near-identical texts ⇒ small Hamming
    distance. Spark-side this is the scalable near-dup primitive:
    near-dups are found by exact-match on rotated simhash prefixes.
    """
    toks = F.array_distinct(F.split(F.col(text_col), " "))
    # bit_i = sign(sum over tokens of (2*((xxhash64(tok)>>i)&1)-1)) > 0
    bits = [
        F.when(
            F.aggregate(
                toks,
                F.lit(0),
                lambda acc, t: acc
                + (F.shiftright(F.xxhash64(t), i).bitwiseAND(F.lit(1)) * 2 - 1).cast(
                    "int"
                ),
            )
            > 0,
            F.lit(1),
        ).otherwise(F.lit(0))
        for i in range(16)  # 16 bits is plenty for fixture-scale tests
    ]
    fp = reduce(
        lambda acc, pair: acc + pair[1] * (2 ** pair[0]), enumerate(bits), F.lit(0)
    )
    return df.withColumn("simhash", fp.cast("long"))


_N_SIMHASH_BITS = 16


def simhash_md5_fp(d: DataFrame) -> DataFrame:
    """(doc_id, simhash) — the md5-prefix 16-bit SimHash fingerprint,
    DuckDB-reproducible bit for bit (the oracle twin is
    _SIMHASH_FP_CTES) — shared by dedup_simhash and pipeline_e2e's
    near-dedup stage.  The xxhash64 variant (simhash64) is the faster
    Spark-only primitive; THIS one exists to be oracle-checkable."""
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("tok")
    )
    hv = F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("int")
    votes = tok.select("doc_id", hv.alias("hv")).groupBy("doc_id").agg(
        *[
            F.sum(
                F.shiftright(F.col("hv"), i).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"s{i}")
            for i in range(_N_SIMHASH_BITS)
        ]
    )
    fp_terms = [
        F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(_N_SIMHASH_BITS)
    ]
    return votes.select(
        "doc_id", sum(fp_terms[1:], fp_terms[0]).cast("long").alias("simhash")
    )


# The fingerprint CTEs, source-parameterized so pipeline_e2e can run
# them over its survivor set — ONE spelling of the md5 bit-vote terms.
_SIMHASH_FP_CTES = """
    tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM {src}),
    h AS (SELECT doc_id,
                 CAST(concat('0x', substring(md5(tok), 1, 4)) AS INTEGER) AS hv
          FROM tok),
    fp AS (SELECT doc_id, {terms} AS simhash FROM h GROUP BY doc_id)
""".replace(
    "{terms}",
    " + ".join(
        f"(CASE WHEN sum(2 * ((hv >> {i}) & 1) - 1) > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(_N_SIMHASH_BITS)
    ),
)

_SIMHASH_ORACLE = (
    "WITH "
    + _SIMHASH_FP_CTES.format(src="documents")
    + """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(a.simhash AS BIGINT) AS simhash
    FROM fp a JOIN fp b ON a.simhash = b.simhash AND a.doc_id < b.doc_id
"""
)


@register("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: pairs of docs with IDENTICAL 16-bit simhash,
    built from md5-prefix token hashes so DuckDB reproduces every bit
    (the xxhash64 variant above, simhash64, is the faster scale
    primitive — unit-tested instead). Shape: per-token explode →
    groupBy(doc) partial-summed bit votes → self-join on fingerprint —
    the shuffle carries 16-byte hashes and fingerprints, never text."""
    d = table(spark, sf_dir, "documents")
    # self-join: persist so the token explode + bit-vote aggregate run
    # once, not once per join side
    fp = simhash_md5_fp(d).persist()
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.simhash") == F.col("b.simhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("simhash"),
        )
    )


@register(
    "dedup_embed",
    oracle="""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])), 6) AS cosine
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
                           CAST(b.embedding AS DOUBLE[])) >= 0.4
    """,
)
def dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (unit-norm fixture ⇒ cosine ≡
    dot). Brute-force all-pairs here; the 100 TB path buckets by LSH
    random-hyperplane sign-prefix first (same shape as dedup_simhash)."""
    e = table(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    dot = F.aggregate(
        F.zip_with(
            F.col("a.embedding"),
            F.col("b.embedding"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn("cos_raw", dot)
        .filter(F.col("cos_raw") >= 0.4)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(F.col("cos_raw"), 6).alias("cosine"),
        )
    )


def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 20,
    algorithm: str = "two_phase",
) -> DataFrame:
    """Connected components (the cluster step of every near-dup
    pipeline: pairs → duplicate GROUPS → one kept doc per group).

    algorithm='two_phase' (default): the small-star/large-star
    algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — converges in O(log n) rounds on ANY graph,
    including pathological chains where plain label propagation needs
    diameter rounds. algorithm='label_prop' keeps the simple min-label
    propagation (rounds = diameter; fine for shallow dedup graphs,
    retained as the differential-testing twin).

    Both are pure DataFrame loops: each round is a bounded number of
    shuffle joins/aggregates on the edge list, localCheckpoint truncates
    lineage, and the driver holds only a convergence counter — no data
    ever collects to the driver."""
    if algorithm == "label_prop":
        labels = _cc_label_prop(edges, vertices, id_col, max_iters)
    elif algorithm == "two_phase":
        labels, _rounds = _cc_two_phase(edges, vertices, id_col, max_iters)
    else:
        raise ValueError(f"unknown algorithm: {algorithm}")
    return labels


def _cc_label_prop(
    edges: DataFrame, vertices: DataFrame, id_col: str, max_iters: int
) -> DataFrame:
    sym = edges.select(
        F.col("src").alias("n"), F.col("dst").alias("m")
    ).unionByName(edges.select(F.col("dst").alias("n"), F.col("src").alias("m")))
    labels = vertices.select(F.col(id_col).alias("n"), F.col(id_col).alias("label"))
    labels = labels.localCheckpoint()
    for _ in range(max_iters):
        neigh = (
            sym.join(labels, "n")
            .groupBy(F.col("m").alias("n"))
            .agg(F.min("label").alias("nlabel"))
        )
        new = (
            labels.join(neigh, "n", "left")
            .select("n", F.least("label", "nlabel").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new.alias("a")
            .join(labels.alias("b"), "n")
            .filter(F.col("a.label") != F.col("b.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select(F.col("n").alias(id_col), F.col("label").alias("cluster_rep"))


def _cc_two_phase(
    edges: DataFrame, vertices: DataFrame, id_col: str, max_iters: int
) -> tuple[DataFrame, int]:
    """Small-star/large-star rounds until the edge set is a fixed point
    (then it IS the star forest: every edge points child → component
    min). Returns (labels, rounds) — rounds exposed so tests can assert
    the O(log n) bound.

    Invariant kept throughout: edges canonical with u > v, no
    self-loops, distinct. large-star hangs every strictly-larger
    neighbor of u under min(Γ(u) ∪ u); small-star re-hangs u and its
    smaller neighbors under their min. Each emission strictly shrinks
    the potential Σ(u - label) — convergence is monotone."""
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    rounds = 0
    e_count = e.count()  # carried across rounds: e is always the
    # previous round's (checkpointed) small, so its cardinality is
    # already known — re-counting it cost one job per round
    for _ in range(max_iters):
        rounds += 1
        # large-star: per node u over the SYMMETRIZED neighborhood,
        # m = min(Γ(u) ∪ {u}); emit (v, m) for neighbors v > u
        sym = e.select("u", "v").unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", "u").alias("m"))
        )
        large = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star: canonical edges all have v < u, so per node u,
        # m = min(Γ<(u)); emit (u, m) plus (v, m) for the other
        # smaller neighbors
        mins2 = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins2.select("u", F.col("m").alias("v")))
            .distinct()
            .localCheckpoint()
        )
        # fixpoint test: both sides are DISTINCT by construction, so
        # equal cardinality + (small ⊆ e, via an empty anti-join) ⇔
        # set equality.  subtract() paid an extra distinct + full
        # shuffle per round; the anti-join streams and isEmpty()
        # short-circuits at the first witness.  Same boolean, exact.
        small_count = small.count()
        converged = (
            small_count == e_count
            and small.join(e, ["u", "v"], "left_anti").isEmpty()
        )
        e, e_count = small, small_count
        if converged:
            break
    # star forest → labels; roots and isolated vertices label themselves
    child_labels = e.groupBy("u").agg(F.min("v").alias("label"))
    labels = (
        vertices.select(F.col(id_col).alias("n"))
        .join(child_labels.withColumnRenamed("u", "n"), "n", "left")
        .select("n", F.coalesce("label", "n").alias("label"))
    )
    return (
        labels.select(F.col("n").alias(id_col), F.col("label").alias("cluster_rep")),
        rounds,
    )


# Shared recursive-CTE transitive closure over LSH-band edges — the
# oracle twin of connected_components over the md5-band graph. Ends in
# a `clusters(doc_id, cluster_rep)` relation.
_CLUSTER_CTE = """
    WITH RECURSIVE
    docs AS (SELECT doc_id, md5(text) AS fp FROM documents),
    bands AS (
      SELECT doc_id, 1 AS idx, substr(fp, 1, 3) AS b FROM docs
      UNION ALL SELECT doc_id, 2, substr(fp, 9, 3) FROM docs
      UNION ALL SELECT doc_id, 3, substr(fp, 17, 3) FROM docs
      UNION ALL SELECT doc_id, 4, substr(fp, 25, 3) FROM docs
    ),
    edges AS (
      SELECT DISTINCT x.doc_id AS src, y.doc_id AS dst
      FROM bands x JOIN bands y ON x.idx = y.idx AND x.b = y.b
      WHERE x.doc_id <> y.doc_id
    ),
    reach AS (
      SELECT doc_id AS node, doc_id AS label FROM docs
      UNION
      SELECT e.dst AS node, r.label FROM reach r JOIN edges e ON e.src = r.node
    ),
    clusters AS (
      SELECT node AS doc_id, min(label) AS cluster_rep
      FROM reach GROUP BY node
    )
"""


def _cluster_edges(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Spark twin of _CLUSTER_CTE's `edges`: docs sharing any md5 band.

    Round 12 (guide §2.1, the graph_triangles corner-explode pattern):
    the band table was a 4-way UNION of projections of the md5 scan —
    Catalyst re-plans the scan per branch, and the self-join reads the
    union on BOTH sides, so the text scan + md5 ran 8x.  posexplode
    builds all 4 bands in ONE pass (idx values unchanged vs the
    unioned F.lit(i + 1): pos 0..3 shifted +1), and .persist() shares
    the one band build across both join sides — the same edge SET
    reaches the distinct, so downstream CC output is unchanged.

    Returns (edges, bands); connected_components eagerly checkpoints
    the edge list on entry, so callers unpersist `bands` right after
    it returns (the round-8 never-leak-a-persist discipline)."""
    bands = (
        d.select("doc_id", F.md5("text").alias("fp"))
        .select(
            "doc_id",
            F.posexplode(
                F.array(
                    *[F.substring("fp", 1 + 8 * i, 3) for i in range(4)]
                )
            ).alias("idx", "b"),
        )
        .select("doc_id", (F.col("idx") + 1).alias("idx"), "b")
        .persist()
    )
    x, y = bands.alias("x"), bands.alias("y")
    edges = (
        x.join(y, (F.col("x.idx") == F.col("y.idx")) & (F.col("x.b") == F.col("y.b")))
        .filter(F.col("x.doc_id") != F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("src"), F.col("y.doc_id").alias("dst"))
        .distinct()
    )
    return edges, bands


@register(
    "dedup_cluster",
    oracle=_CLUSTER_CTE
    + """
    SELECT doc_id, cluster_rep FROM clusters
    """,
)
def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: LSH-band edges (docs sharing any
    md5 band) → connected components → per-doc cluster representative
    (min doc_id). This is the step between "candidate pairs" and "keep
    one per group" in a production dedup pipeline; the oracle computes
    the same transitive closure with a recursive CTE — an exact check
    of an ITERATIVE distributed algorithm. The fixture graph has
    multi-hop chains (clusters up to 9 docs), so propagation genuinely
    iterates."""
    d = table(spark, sf_dir, "documents")
    edges, bands = _cluster_edges(d)
    out = connected_components(edges, d, "doc_id")
    bands.unpersist()
    return out


@register(
    "pipeline_dedup_keep_best",
    oracle=_CLUSTER_CTE
    + """
    , scored AS (
      SELECT c.cluster_rep, c.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY c.cluster_rep
                                ORDER BY d.n_chars DESC, c.doc_id) AS rn,
             count(*) OVER (PARTITION BY c.cluster_rep) AS n_members
      FROM clusters c JOIN documents d ON d.doc_id = c.doc_id)
    SELECT cluster_rep, doc_id AS kept_doc_id,
           CAST(n_members AS BIGINT) AS n_members,
           n_chars AS kept_n_chars
    FROM scored WHERE rn = 1
    """,
)
def pipeline_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-then-keep-best: the production form of near-dedup.
    dedup_cluster's LSH-band connected components assign every doc a
    cluster; this keeps ONE representative per cluster — the longest
    doc (ties to the smallest doc_id), the standard keep-the-most-
    complete-variant heuristic (truncated mirrors and snippets lose to
    the full text they duplicate).

    100 TB shape: CC is the O(log n)-round two-phase algorithm, the
    keep-best step is one windowed top-1 per cluster key
    (WindowGroupLimit pushes the rank-1 filter below the sort at
    scale) — no new quadratic stage on top of the candidate graph."""
    d = table(spark, sf_dir, "documents")
    edges, bands = _cluster_edges(d)
    clusters = connected_components(edges, d, "doc_id")
    bands.unpersist()
    scored = clusters.join(d.select("doc_id", "n_chars"), "doc_id")
    w = W.partitionBy("cluster_rep").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    wc = W.partitionBy("cluster_rep")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(wc).cast("long"))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_rep",
            F.col("doc_id").alias("kept_doc_id"),
            "n_members",
            F.col("n_chars").alias("kept_n_chars"),
        )
    )


# --------------------------------------------------------------------------
# Banded MinHash-LSH with Jaccard verification — the canonical scalable
# near-dedup pipeline (signature -> bands -> candidate pairs -> verify)

N_BANDS = 3  # 3 bands x 2 rows over the 6 minhashes

_LSH_BANDS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, {b} AS band_id, md5(concat(h{2 * b}, '|', h{2 * b + 1})) AS band_key"
    f" FROM hashes"
    for b in range(N_BANDS)
)


@register(
    "dedup_minhash_lsh",
    oracle=f"""
    WITH hashes AS ({_MINHASH_HASHES_SQL}),
         bands AS ({_LSH_BANDS_SQL}),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM bands a JOIN bands b
                    ON a.band_id = b.band_id AND a.band_key = b.band_key
                   AND a.doc_id < b.doc_id),
         sh AS ({_SHINGLES_SQL}),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         verified AS (
           SELECT c.doc_a, c.doc_b, count(*) AS shared
           FROM cand c
           JOIN sh sa ON sa.doc_id = c.doc_a
           JOIN sh sb ON sb.doc_id = c.doc_b AND sb.sh = sa.sh
           GROUP BY c.doc_a, c.doc_b)
    SELECT v.doc_a, v.doc_b,
           round(v.shared * 1.0 / (ca.n + cb.n - v.shared), 6) AS jaccard
    FROM verified v
    JOIN cnt ca ON ca.doc_id = v.doc_a
    JOIN cnt cb ON cb.doc_id = v.doc_b
    WHERE v.shared * 1.0 / (ca.n + cb.n - v.shared) >= 0.7
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH near-dedup, end to end: 6 minhashes -> 3
    bands x 2 rows -> candidate pairs share at least one band bucket ->
    exact shingle-Jaccard >= 0.7 verification on candidates ONLY.

    This is the shape that scales to 100 TB where dedup_near (full-
    signature equality) is too strict and dedup_jaccard (token-inverted
    index) touches too many pairs: banding bounds the candidate count
    (P[candidate] = 1-(1-J^r)^b, steep around the 0.7 threshold), the
    verify join runs only on band-bucket collisions, and every stage is
    an equi-shuffle on a hash key — no all-pairs product anywhere.
    Band buckets can skew if a bucket collects many docs; at scale cap
    bucket size (drop buckets > N docs: they are near-identical spam
    clusters better handled by dedup_exact) — not needed at fixture
    scale."""
    d = table(spark, sf_dir, "documents")
    # The tokenize + shingle + explode subtree is this operator's most
    # expensive map stage and has FOUR consumers shuffling on different
    # keys (the minhash aggregate, the per-doc count, and both sides of
    # the verify join) — persist it so it runs once, not four times. At
    # real scale: MEMORY_AND_DISK (or a checkpoint) on the shingle
    # relation, or recompute if executor memory is the tighter budget.
    sh = _doc_shingles(d).persist()
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"h{i}")
        for i in range(N_MINHASH)
    ]
    hashes = sh.groupBy("doc_id").agg(*aggs)
    bands = hashes.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.md5(
                            F.concat(
                                F.col(f"h{2 * b}"), F.lit("|"), F.col(f"h{2 * b + 1}")
                            )
                        ).alias("band_key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")

    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa, sb = sh.alias("sa"), sh.alias("sb")
    shared = (
        cand.join(sa, F.col("sa.doc_id") == F.col("doc_a"))
        .join(
            sb,
            (F.col("sb.doc_id") == F.col("doc_b"))
            & (F.col("sb.sh") == F.col("sa.sh")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ca = cnt.alias("ca")
    cb = cnt.alias("cb")
    jac = F.col("shared") / (F.col("ca.n") + F.col("cb.n") - F.col("shared"))
    return (
        shared.join(ca, F.col("ca.doc_id") == F.col("doc_a"))
        .join(cb, F.col("cb.doc_id") == F.col("doc_b"))
        .filter(jac >= 0.7)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# Streaming near-dedup: minhash signature dedup with bounded state

@register(
    "stream_dedup_near",
    oracle=f"""
    WITH sigs AS ({_MINHASH_SIG_SQL})
    SELECT doc_id, sig FROM (
      SELECT doc_id, sig,
             row_number() OVER (PARTITION BY sig ORDER BY doc_id) AS rn
      FROM sigs) t
    WHERE rn = 1
    """,
)
def stream_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the STREAMING near-dedup: keep-first document per
    minhash signature (deterministic winner so the oracle hash is
    stable; the streaming face keeps an arbitrary first-arrival winner
    — tests assert count equality, the weaker invariant streaming
    semantics guarantee).

    Streaming face: near_dedup_sig_stream below — per-doc signatures
    inside mapInPandas (no shingle shuffle, streaming-legal), then
    dropDuplicatesWithinWatermark on the signature, so dedup state is
    BOUNDED: a signature expires once the watermark passes it. At
    100 TB/day this is the only tractable online near-dedup — state
    holds one 96-byte signature per unique doc per watermark horizon,
    never the text."""
    sigs = _minhash_signature(table(spark, sf_dir, "documents"))
    w = W.partitionBy("sig").orderBy("doc_id")
    return (
        sigs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def near_dedup_sig_stream(
    docs_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming near-dedup face: (doc_id, ts, sig) via Arrow-batched
    per-doc minhash, then signature dedup within the watermark. Input
    must carry an event-time `ts` column (stage_documents_files adds
    one)."""
    import hashlib

    import pandas as pd

    def sig_batch(it):
        for pdf in it:
            out = {"doc_id": [], "ts": [], "sig": []}
            for doc_id, ts, text in zip(
                pdf["doc_id"], pdf["ts"], pdf["text"]
            ):
                if text is None:
                    continue
                toks = text.split(" ")
                if len(toks) < 3:
                    continue
                shingles = {
                    " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                }
                encoded = [sh.encode() for sh in shingles]
                mins = [
                    min(
                        hashlib.md5(b"%d:" % seed + sh).hexdigest()
                        for sh in encoded
                    )
                    for seed in range(N_MINHASH)
                ]
                out["doc_id"].append(doc_id)
                out["ts"].append(ts)
                out["sig"].append("|".join(mins))
            yield pd.DataFrame(out)

    sigs = docs_stream.select("doc_id", "ts", "text").mapInPandas(
        sig_batch, "doc_id long, ts timestamp, sig string"
    )
    return sigs.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["sig"]
    )


@register(
    "dedup_edit_nn",
    oracle="""
    WITH blocked AS (
      SELECT doc_id, text,
             concat(string_split(text, ' ')[1], '|',
                    CAST(length(text) // 64 AS VARCHAR)) AS blk
      FROM documents),
    pairs AS (
      SELECT a.doc_id, b.doc_id AS nn_doc_id,
             CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
      FROM blocked a JOIN blocked b
        ON a.blk = b.blk AND a.doc_id <> b.doc_id),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY edit_dist, nn_doc_id) AS rn
      FROM pairs)
    SELECT doc_id, nn_doc_id, edit_dist FROM ranked WHERE rn = 1
    """,
)
def dedup_edit_nn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance nearest neighbor within blocking buckets — the
    fuzzy-dedup primitive for OCR noise / template variants that
    token-set methods (MinHash, SimHash) miss because they ignore
    character-level edits. Block key = (first token, length(text)//64):
    a candidate pair must agree on both, so Levenshtein — O(n*m) per
    pair — runs only inside blocks, never all-pairs. Emits each doc's
    nearest in-block neighbor (ties broken by doc_id); docs alone in
    their block have no candidate and drop out.

    100 TB posture: the block join is a plain equi-shuffle on the block
    key; block sizes are bounded by construction (prefix+length double
    filter), and at real scale the block key would add a third
    component (e.g. a MinHash band) to cap the quadratic-in-block
    verify. Levenshtein evaluates JVM-side (built-in), no Python.

    Engine note: Spark's levenshtein counts CODEPOINT edits (the right
    text semantics); DuckDB's counts BYTES, so the oracle parity holds
    on ASCII corpora only (the fixture domain) — pinned explicitly in
    tests/test_unicode_corpus.py."""
    d = table(spark, sf_dir, "documents")
    blocked = d.select(
        "doc_id",
        "text",
        F.concat_ws(
            "|",
            F.split("text", " ").getItem(0),
            F.expr("CAST(length(text) div 64 AS STRING)"),
        ).alias("blk"),
    )
    a = blocked.alias("a")
    b = blocked.alias("b")
    # Candidate pairs first, Levenshtein AFTER a round-robin
    # repartition: the block equi-join computes each block's pairs in
    # one task, so evaluating the O(n*m) distance inside the join
    # serializes on the largest block (measured 102 s -> 8 s at sf0.1).
    # Shuffling the pair texts costs ~MBs; the distance then runs on
    # every core.
    pairs = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("b.doc_id").alias("nn_doc_id"),
            F.col("a.text").alias("text_a"),
            F.col("b.text").alias("text_b"),
        )
        .repartition(64)
        .select(
            "doc_id",
            "nn_doc_id",
            F.levenshtein(F.col("text_a"), F.col("text_b"))
            .cast("long")
            .alias("edit_dist"),
        )
    )
    w = W.partitionBy("doc_id").orderBy("edit_dist", "nn_doc_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "dedup_containment",
    oracle="""
    WITH sh AS (
      SELECT DISTINCT doc_id,
             unnest(CASE WHEN len(w) >= 3 THEN list_transform(
                      range(1, len(w) - 1),
                      i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
                    ELSE [] END) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM sh a JOIN sh b
        ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY doc_a, doc_b)
    SELECT i.doc_a, i.doc_b, i.n_shared,
           CAST(sa.n AS BIGINT) AS n_a,
           round(i.n_shared * 1.0 / sa.n, 6) AS containment
    FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
    WHERE i.n_shared * 2 >= sa.n
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment (Broder): for an ordered pair
    (a, b), |S_a ∩ S_b| / |S_a| over distinct 3-shingles — the
    quote/subset detector Jaccard misses (a short doc fully embedded
    in a long one has high containment but low Jaccard). Emits pairs
    with containment >= 0.5; docs too short for a shingle have no
    shingle set and cannot be contained (excluded, matching the
    guarded-gram convention).

    100 TB shape: same bucket-then-verify skeleton as dedup_jaccard —
    the intersection count comes from ONE equi-join on the shingle key
    (never an all-pairs comparison), grouped by the ordered pair; the
    per-doc size table joins on doc_id. At real scale the shingle join
    adds the standard guards: stop-shingle removal (document-frequency
    cap bounds the fan-out of template shingles, cf. the prefix filter
    in dedup_jaccard) and the threshold pushed into a HAVING on the
    exact integer count (n_shared * 2 >= n_a), which is how it is
    expressed here — no float compare decides membership."""
    d = table(spark, sf_dir, "documents")
    from spark_cep_spark.operators.llm_pipeline import grams_expr

    sh = (
        d.select("doc_id", F.split("text", " ").alias("w"))
        .select(
            "doc_id",
            F.explode(F.array_distinct(grams_expr("w", 3))).alias("shingle"),
        )
    ).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .filter(F.col("n_shared") * 2 >= F.col("n"))
        .select(
            "doc_a",
            "doc_b",
            "n_shared",
            F.col("n").cast("long").alias("n_a"),
            F.round(F.col("n_shared") * 1.0 / F.col("n"), 6).alias(
                "containment"
            ),
        )
    )


@register(
    "pipeline_incremental_dedup",
    oracle=f"""
    WITH hashes AS (
      SELECT doc_id, md5(text) AS h FROM documents),
    first_hash AS (
      SELECT h, min(doc_id) AS first_id FROM hashes GROUP BY h),
    sigs AS ({minhash_sig_sql()}),
    first_sig AS (
      SELECT sig, min(doc_id) AS first_id FROM sigs GROUP BY sig),
    new_docs AS (
      SELECT h.doc_id, h.h, s.sig
      FROM hashes h
      LEFT JOIN sigs s ON s.doc_id = h.doc_id
      WHERE h.doc_id >= 400)
    SELECT n.doc_id,
           CASE WHEN fh.first_id < n.doc_id THEN 'exact_dup'
                WHEN fs.first_id < n.doc_id THEN 'near_dup'
                ELSE 'kept' END AS verdict,
           CASE WHEN fh.first_id < n.doc_id THEN fh.first_id
                WHEN fs.first_id < n.doc_id THEN fs.first_id END AS dup_of
    FROM new_docs n
    LEFT JOIN first_hash fh ON fh.h = n.h
    LEFT JOIN first_sig fs ON fs.sig = n.sig
    """,
)
def pipeline_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (daily-ingest) dedup: new documents (doc_id >= 400
    — the batch boundary stands in for an ingest date) are checked
    against the EXISTING corpus and against earlier docs in their own
    batch: byte-identical text -> 'exact_dup', same MinHash signature
    -> 'near_dup', else 'kept'; dup_of names the earliest holder.
    Exact beats near. Docs too short for a signature can only be
    exact dups (guarded-gram convention).

    100 TB shape: the production form indexes the existing corpus's
    (hash, first_id) and (sig, first_id) tables ONCE and keeps them as
    compact parquet (16-byte keys); each ingest batch joins against
    them and appends its own survivors — this operator is that
    join-and-classify step, expressed over the fixture's id split.
    Nothing rescans old text; both lookups are equi-joins on hashes."""
    d = table(spark, sf_dir, "documents")
    # hashes and sigs each feed two consumers (the first-holder
    # aggregate and the new-batch projection) — persist so the md5
    # scan and the shingle-explode minhash run once
    hashes = d.select("doc_id", F.md5("text").alias("h")).persist()
    first_hash = hashes.groupBy("h").agg(F.min("doc_id").alias("fh_id"))
    sigs = _minhash_signature(d).persist()
    first_sig = sigs.groupBy("sig").agg(F.min("doc_id").alias("fs_id"))
    # hashes already carries every doc_id — no re-scan of documents.
    # Both holder joins are LEFT so NULL-text docs (NULL hash key
    # matches nothing) are still CLASSIFIED (as kept), never dropped.
    new_docs = hashes.filter(F.col("doc_id") >= 400).join(
        sigs, "doc_id", "left"
    )
    j = (
        new_docs.join(first_hash, "h", "left")
        .join(first_sig, "sig", "left")
    )
    exact = F.col("fh_id") < F.col("doc_id")
    near = F.col("fs_id") < F.col("doc_id")
    return j.select(
        "doc_id",
        F.when(exact, "exact_dup")
        .when(near, "near_dup")
        .otherwise("kept")
        .alias("verdict"),
        F.when(exact, F.col("fh_id")).when(near, F.col("fs_id")).alias(
            "dup_of"
        ),
    )


@register(
    "dedup_edit_banded",
    oracle=f"""
    WITH hashes AS ({minhash_hashes_sql()}),
    bands AS ({_LSH_BANDS_SQL}),
    docs AS (SELECT doc_id, text FROM documents),
    pairs AS (
      SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS nn_doc_id
      FROM bands x JOIN bands y
        ON x.band_id = y.band_id AND x.band_key = y.band_key
       AND x.doc_id <> y.doc_id),
    scored AS (
      SELECT p.doc_id, p.nn_doc_id,
             CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist
      FROM pairs p
      JOIN docs a ON a.doc_id = p.doc_id
      JOIN docs b ON b.doc_id = p.nn_doc_id),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY doc_id ORDER BY edit_dist, nn_doc_id) AS rn
      FROM scored)
    SELECT doc_id, nn_doc_id, edit_dist FROM ranked WHERE rn = 1
    """,
)
def dedup_edit_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance NN with MinHash-band candidate generation — the
    SCALE PATH the blocked variant's posture notes prescribe (and the
    8x probe demanded): candidates are docs sharing any LSH band
    (2 minhashes x 3 bands, dedup_minhash_lsh's generator), so the
    quadratic Levenshtein verify runs only on near-duplicate-ish
    pairs, never on every same-prefix/same-length pair. Semantics:
    each doc's nearest banded candidate by codepoint edit distance
    (ties to doc_id); docs with no band collision drop out — at scale
    that IS the point (almost everything has no near-dup).

    Same execution lesson as dedup_edit_nn: pairs are generated by
    the band equi-join, then round-robin repartitioned BEFORE the
    O(n*m) distance so the largest band group cannot serialize the
    stage."""
    d = table(spark, sf_dir, "documents")
    hashes = _minhash_hashes(d).persist()
    bands = reduce(
        DataFrame.unionByName,
        [
            hashes.select(
                "doc_id",
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws("|", F.col(f"h{2 * b}"), F.col(f"h{2 * b + 1}"))
                ).alias("band_key"),
            )
            for b in range(N_BANDS)
        ],
    )
    x, y = bands.alias("x"), bands.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.band_id") == F.col("y.band_id"))
            & (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") != F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_id"),
            F.col("y.doc_id").alias("nn_doc_id"),
        )
        .distinct()
    )
    docs = d.select("doc_id", "text")
    scored = (
        pairs.join(docs, "doc_id")
        .join(
            docs.select(
                F.col("doc_id").alias("nn_doc_id"),
                F.col("text").alias("text_b"),
            ),
            "nn_doc_id",
        )
        .repartition(64)
        .select(
            "doc_id",
            "nn_doc_id",
            F.levenshtein(F.col("text"), F.col("text_b"))
            .cast("long")
            .alias("edit_dist"),
        )
    )
    w = W.partitionBy("doc_id").orderBy("edit_dist", "nn_doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "pipeline_substring_dedup",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id, CAST(i AS INTEGER) AS pos,
             md5(array_to_string(list_slice(t, CAST(i AS INTEGER),
                                            CAST(i AS INTEGER) + 7), ' '))
               AS h
      FROM tok, unnest(range(1, len(t) - 6)) AS u(i)
      WHERE len(t) >= 8
    ),
    firsts AS (SELECT h, min(doc_id) AS fd FROM sh GROUP BY h),
    dup AS (
      SELECT sh.doc_id, sh.pos
      FROM sh JOIN firsts f ON f.h = sh.h
      WHERE sh.doc_id > f.fd
    ),
    inc AS (
      SELECT doc_id, pos,
             least(8, pos - lag(pos) OVER (PARTITION BY doc_id
                                           ORDER BY pos)) AS raw
      FROM dup
    ),
    cov AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_spans,
             CAST(sum(coalesce(raw, 8)) AS BIGINT) AS dup_tokens
      FROM inc GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
           coalesce(cov.dup_spans, 0) AS dup_spans,
           coalesce(cov.dup_tokens, 0) AS dup_tokens,
           round(coalesce(cov.dup_tokens, 0) * 1.0 / len(t.t), 6)
             AS dup_frac
    FROM tok t LEFT JOIN cov ON cov.doc_id = t.doc_id
    WHERE len(t.t) >= 1
    """,
)
def pipeline_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-SPAN census — the position-aware
    exact-substring dedup of "Deduplicating Training Data Makes
    Language Models Better" (Lee et al. 2022), re-expressed for Spark:
    instead of a corpus suffix array, every 8-token shingle (stride 1)
    is md5-hashed with its POSITION; a shingle whose first corpus
    occurrence (min doc_id) lies in an earlier document marks its
    8-token window as duplicated, and per doc the overlapping marked
    windows are unioned into exact covered-token counts
    (sum of least(8, pos - prev_pos)) — the number of tokens a
    keep-first span-removal pass would delete. Output per doc:
    n_tokens, dup_spans, dup_tokens, dup_frac.

    vs corpus_ngram_novelty: novelty counts DISTINCT shingles;
    this op keeps positions and unions overlapping windows, so
    dup_tokens is the actual removable-span mass, not a shingle tally.

    100 TB shape: the stride-1 explode is the op's inherent 8x cost
    (the suffix-array equivalent pays the same); shingles are hashed
    BEFORE the shuffle (fixed-width keys, never raw text); the
    first-occurrence doc is min(doc_id) OVER the shingle-hash
    partition — one shuffle of the shingle stream, evaluated on the
    same pass that feeds the dup filter, instead of a separate
    min-aggregate plus a join back (which would hash every shingle
    TWICE: md5 is the dominant per-row cost here); the span-union
    window is per-document (bounded by doc length). Skew-safe: h is
    a hash, so the partition is uniform. Two fixed-width shuffles +
    one per-doc window."""
    d = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    k = 8
    sh = d.filter(F.size(toks) >= k).select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("pos"),
                    F.md5(F.array_join(F.slice(toks, i, k), " ")).alias(
                        "h"
                    ),
                ),
            )
        ).alias("s"),
    ).select("doc_id", "s.pos", "s.h")
    dup = (
        sh.withColumn(
            "fd", F.min("doc_id").over(W.partitionBy("h"))
        )
        .filter(F.col("doc_id") > F.col("fd"))
        .select("doc_id", "pos")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    inc = dup.select(
        "doc_id",
        F.coalesce(
            F.least(F.lit(k), F.col("pos") - F.lag("pos").over(w)),
            F.lit(k),
        ).alias("inc"),
    )
    cov = inc.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("dup_spans"),
        F.sum("inc").cast("long").alias("dup_tokens"),
    )
    base = d.filter(F.size(toks) >= 1).select(
        "doc_id", F.size(toks).cast("long").alias("n_tokens")
    )
    return (
        base.join(cov, "doc_id", "left")
        .fillna(0, ["dup_spans", "dup_tokens"])
        .select(
            "doc_id",
            "n_tokens",
            "dup_spans",
            "dup_tokens",
            F.round(
                F.col("dup_tokens") * F.lit(1.0) / F.col("n_tokens"), 6
            ).alias("dup_frac"),
        )
    )


@register(
    "pipeline_dedup_eval",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
         cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         truth AS (
           SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b
           FROM sh sa JOIN sh sb
             ON sb.sh = sa.sh AND sa.doc_id < sb.doc_id
           GROUP BY sa.doc_id, sb.doc_id
           HAVING count(*) * 1.0
                  / ((SELECT n FROM cnt WHERE doc_id = sa.doc_id)
                     + (SELECT n FROM cnt WHERE doc_id = sb.doc_id)
                     - count(*)) >= 0.7
         ),
         hashes AS ({_MINHASH_HASHES_SQL}),
         bands AS ({_LSH_BANDS_SQL}),
         cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                  FROM bands a JOIN bands b
                    ON a.band_id = b.band_id AND a.band_key = b.band_key
                   AND a.doc_id < b.doc_id),
         hit AS (SELECT c.doc_a FROM cand c
                 JOIN truth t ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b)
    SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_cand,
           CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_hit,
           round((SELECT count(*) FROM hit) * 1.0
                 / (SELECT count(*) FROM cand), 6) AS precision_,
           round((SELECT count(*) FROM hit) * 1.0
                 / (SELECT count(*) FROM truth), 6) AS recall_
    """,
)
def pipeline_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH quality evaluation — the tuning harness for the banded
    near-dedup pipeline: precision and recall of dedup_minhash_lsh's
    band-bucket CANDIDATE generation against exact ground truth
    (pairs with shingle-Jaccard ≥ 0.7; pairs sharing no shingle have
    J = 0, so the truth set is computable with a shingle
    inverted-index join, never an all-pairs product). A recall below
    1-(1-0.7^r)^b tells you the band geometry is dropping true dups;
    a low precision quantifies the wasted verify work.

    Scale posture: this is an EVAL operator — you run it on a bounded
    sample corpus (corpus_sample_fixed_k composes as the sampler) to
    pick (bands, rows), then run the production pipeline at full
    scale; the truth join's hot-shingle cost is the inherent price of
    exact ground truth and is why it stays on the sample. All counts
    exact BIGINTs; the two ratios are single rounded divisions."""
    d = table(spark, sf_dir, "documents")
    sh = _doc_shingles(d).persist()
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    sa, sb = sh.alias("sa"), sh.alias("sb")
    shared = (
        sa.join(
            sb,
            (F.col("sb.sh") == F.col("sa.sh"))
            & (F.col("sa.doc_id") < F.col("sb.doc_id")),
        )
        .groupBy(
            F.col("sa.doc_id").alias("doc_a"),
            F.col("sb.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ca, cb = cnt.alias("ca"), cnt.alias("cb")
    truth = (
        shared.join(ca, F.col("ca.doc_id") == F.col("doc_a"))
        .join(cb, F.col("cb.doc_id") == F.col("doc_b"))
        .filter(
            F.col("shared")
            / (F.col("ca.n") + F.col("cb.n") - F.col("shared"))
            >= 0.7
        )
        .select("doc_a", "doc_b")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")))).alias(f"h{i}")
        for i in range(N_MINHASH)
    ]
    hashes = sh.groupBy("doc_id").agg(*aggs)
    bands = hashes.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.md5(
                            F.concat(
                                F.col(f"h{2 * b}"),
                                F.lit("|"),
                                F.col(f"h{2 * b + 1}"),
                            )
                        ).alias("band_key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    hit = cand.join(truth, ["doc_a", "doc_b"], "left_semi")
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    n_hit = hit.agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_truth.join(F.broadcast(n_cand))
        .join(F.broadcast(n_hit))
        .select(
            "n_truth",
            "n_cand",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_cand"), 6).alias("precision_"),
            F.round(F.col("n_hit") / F.col("n_truth"), 6).alias("recall_"),
        )
    )
