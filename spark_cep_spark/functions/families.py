"""Scalar function families (SURVEY §2.8): one wide projection per
family so a single oracle hash covers many functions.

All functions here are JVM-side built-ins inside whole-stage codegen —
no Python UDFs in any of these paths.

Dialect parity notes (verified against DuckDB 1.0.0):
- DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all.
- DuckDB ceil/floor return DOUBLE (Spark: LONG) → cast both to BIGINT.
- DuckDB date_trunc('month') returns DATE (Spark: TIMESTAMP) → to_date.
- DuckDB log() is log10; natural log is ln() (Spark F.log is natural).
- No initcap in DuckDB → covered by unit tests instead of the oracle.
- Spark sha2(…, 256) ≡ DuckDB sha256; xxhash64/crc32/hash are
  Spark-specific → unit-tested, excluded from the oracle projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.registry import register


@register(
    "fn_string",
    oracle="""
    SELECT c_custkey,
           concat(c_name, '|', c_mktsegment) AS cat,
           upper(c_name) AS up, lower(c_mktsegment) AS lo,
           substring(c_name, 1, 8) AS sub8,
           trim(c_name) AS trimmed,
           lpad(c_mktsegment, 12, '*') AS padded,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
           length(c_name) AS name_len,
           instr(c_name, '1') AS pos1,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS vowelled,
           left(c_name, 4) AS l4, right(c_name, 3) AS r3,
           repeat(c_mktsegment, 2) AS doubled,
           reverse(c_mktsegment) AS rev
    FROM customer
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.concat(F.col("c_name"), F.lit("|"), F.col("c_mktsegment")).alias("cat"),
        F.upper("c_name").alias("up"),
        F.lower("c_mktsegment").alias("lo"),
        F.substring("c_name", 1, 8).alias("sub8"),
        F.trim("c_name").alias("trimmed"),
        F.lpad("c_mktsegment", 12, "*").alias("padded"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        F.length("c_name").cast("long").alias("name_len"),
        F.instr(F.col("c_name"), "1").cast("long").alias("pos1"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("vowelled"),
        F.substring("c_name", 1, 4).alias("l4"),
        F.expr("right(c_name, 3)").alias("r3"),
        F.repeat("c_mktsegment", 2).alias("doubled"),
        F.reverse("c_mktsegment").alias("rev"),
    )


@register(
    "fn_date",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr, month(o_orderdate) AS mo,
           day(o_orderdate) AS dom, hour(o_orderdate) AS hr,
           quarter(o_orderdate) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           o_orderdate + INTERVAL 30 DAY AS plus30,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
           CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP) AS od,
           date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
           (year(o_orderdate) * 12 + month(o_orderdate)) AS month_index
    FROM orders
    """,
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dom"),
        F.hour(d).cast("long").alias("hr"),
        F.quarter(d).cast("long").alias("qtr"),
        # DATE-typed outputs are cast to TIMESTAMP on BOTH sides: engines
        # surface DATE differently to the comparator (date vs datetime64).
        F.date_trunc("month", d).alias("month_start"),
        (d + F.expr("INTERVAL 30 DAYS")).alias("plus30"),
        F.unix_timestamp(d).alias("epoch_s"),
        F.to_date(d).cast("timestamp").alias("od"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.to_date(d))
        .cast("long")
        .alias("days_to_2002"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        (F.year(d) * 12 + F.month(d)).cast("long").alias("month_index"),
    )


@register(
    "fn_math",
    oracle="""
    SELECT event_id,
           round(value, 2) AS r2,
           abs(value - 50) AS dist50,
           CAST(ceil(value) AS BIGINT) AS c,
           CAST(floor(value) AS BIGINT) AS f,
           round(pow(value, 2), 6) AS sq,
           CASE WHEN value >= 0 THEN round(sqrt(value), 6) END AS rt,
           round(exp(value / 100), 6) AS e,
           CASE WHEN value > 0 THEN round(ln(value), 6) END AS lg,
           CAST(sign(value - 50) AS INT) AS sgn,
           greatest(value, 50.0) AS hi,
           least(value, 50.0) AS lo,
           CAST(floor(value) AS BIGINT) % 7 AS m7
    FROM events
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    v = F.col("value")
    return e.select(
        "event_id",
        F.round(v, 2).alias("r2"),
        F.abs(v - 50).alias("dist50"),
        F.ceil(v).cast("long").alias("c"),
        F.floor(v).cast("long").alias("f"),
        F.round(F.pow(v, 2), 6).alias("sq"),
        # domain guards mirrored in the oracle: Spark yields NULL/NaN
        # outside the domain where DuckDB raises (ln(0), sqrt(<0))
        F.when(v >= 0, F.round(F.sqrt(v), 6)).alias("rt"),
        F.round(F.exp(v / 100), 6).alias("e"),
        F.when(v > 0, F.round(F.log(v), 6)).alias("lg"),
        F.signum(v - 50).cast("int").alias("sgn"),
        F.greatest(v, F.lit(50.0)).alias("hi"),
        F.least(v, F.lit(50.0)).alias("lo"),
        # explicit floor: DuckDB CAST(double AS BIGINT) rounds, Spark truncates
        (F.floor(v).cast("long") % 7).alias("m7"),
    )


@register(
    "fn_array",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS first_elem,
           array_to_string(
             list_transform(embedding[1:4],
                            x -> CAST(round(CAST(x AS DOUBLE) * 100000, 0) AS BIGINT)),
             ',') AS head4,
           round(list_sum(CAST(embedding AS DOUBLE[])), 5) AS vec_sum,
           round(CAST(embedding[1] AS DOUBLE) * CAST(embedding[1] AS DOUBLE), 8) AS first_sq,
           list_contains(embedding, embedding[3]) AS has_third
    FROM embeddings
    """,
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions incl. higher-order aggregate (dot-product infra
    for §2.11 similarity). Spark aggregate() sums left-to-right exactly
    like DuckDB list_sum; rounded anyway for safety."""
    em = table(spark, sf_dir, "embeddings")
    arr = F.col("embedding")
    return em.select(
        "vec_id",
        F.size(arr).cast("long").alias("dim"),
        F.element_at(arr, 1).alias("first_elem"),
        # emitted as a STRING of integer-scaled elements: the driver's
        # hasher cannot canonicalize list columns (round-1 ERR class),
        # and float->string formatting differs across engines, so each
        # element is scaled to an exact integer before joining.
        F.array_join(
            F.transform(
                F.slice(arr, 1, 4),
                lambda x: F.round(x.cast("double") * 100000, 0)
                .cast("long")
                .cast("string"),
            ),
            ",",
        ).alias("head4"),
        F.round(
            F.aggregate(
                arr, F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            5,
        ).alias("vec_sum"),
        F.round(
            F.element_at(arr, 1).cast("double") * F.element_at(arr, 1).cast("double"),
            8,
        ).alias("first_sq"),
        F.array_contains(arr, F.element_at(arr, 3)).alias("has_third"),
    )


@register(
    "fn_map",
    oracle="""
    SELECT event_id, 'type' AS mk, event_type AS mv FROM events
    UNION ALL
    SELECT event_id, 'user' AS mk, CAST(user_id AS VARCHAR) AS mv FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map create/explode: builds a MAP column then explodes it back to
    scalars (the oracle sees only the scalar result — DuckDB's MAP
    dialect differs, the semantics compared are identical)."""
    e = table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    exploded = e.select("event_id", F.explode(m).alias("mk", "mv"))
    return exploded


@register(
    "fn_json",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS INT) AS k_int,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_int2,
           (props->>'$.k') IS NOT NULL AS has_k,
           (props->>'$.missing') IS NULL AS no_missing
    FROM events
    """,
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props ('{"k": <int>}' fixture).
    from_json with explicit schema (oracle-comparable) — Spark 4's
    VariantType intentionally not used here (SURVEY §1.2)."""
    e = table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k_int"),
        parsed.getField("k").alias("k_int2"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
        F.get_json_object("props", "$.missing").isNull().alias("no_missing"),
    )


@register(
    "fn_null",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'P') AS status_np,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
           (nullif(o_orderstatus, 'P') IS NULL) AS was_p,
           isnan('nan'::DOUBLE) AS always_nan,
           CASE WHEN isnan('nan'::DOUBLE) THEN -1.0 ELSE 0.0 END AS nan_repl,
           ifnull(nullif(o_orderpriority, '5-LOW'), 'LOW') AS prio_filled
    FROM orders
    """,
)
def fn_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL handling: nullif/coalesce/nvl/isnan/nanvl. The fixture has
    no physical NULLs, so NULLIF synthesizes them deterministically."""
    o = table(spark, sf_dir, "orders")
    status_np = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    nan = F.lit(float("nan"))
    return o.select(
        "o_orderkey",
        status_np.alias("status_np"),
        F.coalesce(status_np, F.lit("PENDING")).alias("status_filled"),
        status_np.isNull().alias("was_p"),
        F.isnan(nan).alias("always_nan"),
        F.nanvl(nan, F.lit(-1.0)).alias("nan_repl"),
        F.nvl(F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")), F.lit("LOW")).alias(
            "prio_filled"
        ),
    )


@register(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           md5(concat(lang, ':', source)) AS key_md5
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-stable hashes (md5/sha256) — the dedup
    infrastructure (§2.11 uses md5 for minhash signatures so the oracle
    can reproduce them). Spark-only hashes (xxhash64, crc32, hash) are
    exercised in unit tests."""
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2(F.col("text"), 256).alias("text_sha256"),
        F.md5(F.concat(F.col("lang"), F.lit(":"), F.col("source"))).alias("key_md5"),
    )


@register(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey << 3 AS shl3,
           o_orderkey >> 2 AS shr2,
           o_orderkey & 255 AS lo_byte,
           o_orderkey | 4096 AS with_flag,
           xor(o_orderkey, 21845) AS xored,
           CAST(bit_count(o_orderkey) AS INT) AS popcnt,
           ~o_orderkey AS flipped
    FROM orders
    """,
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise family (hash/bucket/flag arithmetic — the LSH bucket and
    SimHash substrate). All codegen-side; bit_count cast to INT on both
    engines (DuckDB returns TINYINT)."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        k.bitwiseAND(F.lit(255)).alias("lo_byte"),
        k.bitwiseOR(F.lit(4096)).alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).alias("xored"),
        F.bit_count(k).alias("popcnt"),
        F.bitwise_not(k).alias("flipped"),
    )


@register(
    "fn_struct",
    oracle="""
    SELECT e.event_id,
           e.s.uid AS uid,
           e.s.kind AS kind,
           e.s.vx2 AS vx2
    FROM (SELECT event_id,
                 {'uid': user_id, 'kind': event_type, 'vx2': value * 2} AS s
          FROM events) e
    """,
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRUCT create + field access round-trip (nested types are the
    multimodal-column substrate §1.2). Output is re-flattened to scalar
    columns so the hash compare stays dialect-neutral."""
    e = table(spark, sf_dir, "events")
    nested = e.select(
        "event_id",
        F.struct(
            F.col("user_id").alias("uid"),
            F.col("event_type").alias("kind"),
            (F.col("value") * 2).alias("vx2"),
        ).alias("s"),
    )
    return nested.select(
        "event_id",
        F.col("s.uid").alias("uid"),
        F.col("s.kind").alias("kind"),
        F.col("s.vx2").alias("vx2"),
    )


@register(
    "fn_url",
    oracle="""
    WITH t AS (
      SELECT 'https://data.example.com:8443/supplier/' || s_suppkey
             || '?id=' || s_suppkey || '&nation=' || s_nationkey
             || '#detail' AS url
      FROM supplier
    )
    SELECT url,
           regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, '[?&]id=([^&#]*)', 1) AS id_param,
           regexp_extract(url, '#(.*)$', 1) AS fragment,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM t
    """,
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family (`parse_url` — log/clickstream analytics
    staple in the reference family's event pipelines). URLs are built
    from fixture columns, then every component is extracted JVM-side;
    the oracle decomposes the same URLs with RFC-shaped regexes, so the
    hash check pins Spark's parse_url component semantics. Pure
    projection — scan-speed at any scale."""
    s = table(spark, sf_dir, "supplier")
    t = s.select(
        F.concat(
            F.lit("https://data.example.com:8443/supplier/"),
            F.col("s_suppkey").cast("string"),
            F.lit("?id="),
            F.col("s_suppkey").cast("string"),
            F.lit("&nation="),
            F.col("s_nationkey").cast("string"),
            F.lit("#detail"),
        ).alias("url")
    )
    return t.select(
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("id_param"),
        F.parse_url("url", F.lit("REF")).alias("fragment"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


@register(
    "fn_try",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber = 4 THEN NULL
                ELSE round(l_extendedprice / (l_linenumber - 4), 6) END
             AS safe_ratio,
           CASE WHEN l_orderkey > 7 THEN NULL
                ELSE l_orderkey + 9223372036854775800 END AS safe_add,
           TRY_CAST(concat(CAST(l_linenumber AS VARCHAR),
                           CASE WHEN l_orderkey % 2 = 0 THEN 'x' ELSE '' END)
                    AS INTEGER) AS safe_int
    FROM lineitem
    WHERE l_orderkey < 200
    """,
)
def fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe TRY function family — the error-tolerant arithmetic a
    production pipeline needs under ANSI mode: try_divide (÷0 → NULL
    instead of error), try_add (bigint overflow → NULL), try_cast
    (malformed string → NULL). The oracle expresses the identical
    semantics with guards/TRY_CAST since DuckDB errors where Spark's
    TRY returns NULL. Pure projection — codegen, no shuffle."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.try_divide("l_extendedprice", F.col("l_linenumber") - 4), 6
        ).alias("safe_ratio"),
        F.try_add("l_orderkey", F.lit(9223372036854775800)).alias("safe_add"),
        F.expr(
            "try_cast(concat(cast(l_linenumber AS string),"
            " CASE WHEN l_orderkey % 2 = 0 THEN 'x' ELSE '' END) AS INT)"
        ).alias("safe_int"),
    )


@register(
    "fn_regexp",
    oracle="""
    SELECT p_partkey,
           regexp_matches(p_name, '[aeiou]{2}') AS has_double_vowel,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           len(regexp_extract_all(p_name, '[aeiou]+')) AS n_vowel_runs,
           array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',')
             AS all_words,
           split_part(p_name, ' ', 2) AS second_word,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS masked
    FROM part
    """,
)
def fn_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp function family: match test, capture-group extract,
    extract-all, split_part, character-class replace — all JVM regex
    (codegen'd), the pattern-heavy slice of ETL cleansing."""
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_name").rlike("[aeiou]{2}").alias("has_double_vowel"),
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all(F.col("p_name"), F.lit(r"[aeiou]+"), 0))
        .cast("long")
        .alias("n_vowel_runs"),
        F.array_join(
            F.regexp_extract_all(F.col("p_name"), F.lit(r"[a-z]+"), 0), ","
        ).alias("all_words"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias(
            "second_word"
        ),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("masked"),
    )


@register(
    "fn_format",
    oracle="""
    SELECT o_orderkey,
           printf('%08d', o_orderkey) AS fmt_key,
           concat_ws('-', o_orderstatus, o_orderpriority) AS tag,
           chr(CAST(65 + o_orderkey % 26 AS INT)) AS letter,
           ascii(o_orderstatus) AS status_code,
           rpad(o_orderpriority, 15, '.') AS padded,
           repeat('*', CAST(o_orderkey % 5 AS INT)) AS stars
    FROM orders
    """,
)
def fn_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String formatting family: printf-style templates, separator
    concat, chr/ascii, padding, repetition — report/export shaping.
    Integer-only printf directives keep both engines' C-style
    formatters bit-identical (float %f rounding modes differ between
    the JVM and fmt, so money formatting belongs in round()+cast)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.format_string("%08d", F.col("o_orderkey")).alias("fmt_key"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("tag"),
        F.char(F.lit(65) + F.col("o_orderkey") % 26).alias("letter"),
        F.ascii("o_orderstatus").alias("status_code"),
        F.rpad(F.col("o_orderpriority"), 15, ".").alias("padded"),
        F.expr("repeat('*', CAST(o_orderkey % 5 AS INT))").alias("stars"),
    )




@register(
    "fn_hof",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           CAST(len(list_filter(string_split(text, ' '),
                                w -> len(w) > 4)) AS BIGINT) AS n_long,
           CAST(list_sum(list_transform(string_split(text, ' '),
                                        w -> len(w))) AS BIGINT)
             AS total_len,
           len(list_filter(string_split(text, ' '),
                           w -> w = 'the')) > 0 AS has_the,
           array_to_string(string_split(text, ' ')[1:3], '_') AS first3
    FROM documents
    ORDER BY doc_id
    """,
)
def fn_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (filter / transform+aggregate /
    exists / slice with lambdas) — the Spark surface that keeps
    per-element array logic INSIDE Catalyst instead of a Python UDF:
    every lambda here compiles to codegen'd expressions over the
    word array, so the whole row is one projection, no serialization
    boundary. The aggregate accumulates exact integers (word
    lengths); the DuckDB twin spells the same lambdas with
    list_filter/list_transform/list_sum."""
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.size(F.filter(words, lambda w: F.length(w) > 4))
        .cast("long")
        .alias("n_long"),
        F.aggregate(
            words,
            F.lit(0).cast("long"),
            lambda acc, w: acc + F.length(w).cast("long"),
        ).alias("total_len"),
        F.exists(words, lambda w: w == "the").alias("has_the"),
        F.array_join(F.slice(words, 1, 3), "_").alias("first3"),
    ).orderBy("doc_id")


@register(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k_long,
           CAST(props->>'$.k' AS DOUBLE) AS k_dbl,
           (props->>'$.missing') IS NULL AS no_missing,
           json(props)::VARCHAR AS vjson
    FROM events
    ORDER BY event_id
    """,
)
def fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType — the engine-native semi-structured path
    (binary-encoded, shreddable, ~an order faster to re-extract than
    per-access JSON string parsing): parse_json once, then typed
    variant_get extractions, missing-path NULL semantics
    (try_variant_get), and to_json round-trip (whose compact
    normalized form the oracle mirrors with DuckDB's json()
    normalizer). At 100 TB the win is parse-once-extract-many and
    columnar shredding; the JSON-string twin (fn_json) re-parses per
    extraction."""
    e = table(spark, sf_dir, "events")
    v = e.select("event_id", F.parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.expr("variant_get(v, '$.k', 'long')").alias("k_long"),
        F.expr("variant_get(v, '$.k', 'double')").alias("k_dbl"),
        F.expr("try_variant_get(v, '$.missing', 'long') IS NULL").alias(
            "no_missing"
        ),
        F.to_json("v").alias("vjson"),
    ).orderBy("event_id")
