"""Unicode-corpus oracle parity: every text operator must agree with
its DuckDB oracle on non-ASCII input — CJK, accents, astral-plane
emoji (surrogate pairs in UTF-16 JVM strings vs UTF-8 DuckDB), combining
marks, RTL script, and embedded tab/newline whitespace.

The driver fixture is ASCII-only, so an engine divergence in length
semantics (code points vs code units), regex classes, or string split
would pass the gate silently and bite the first real multilingual
corpus. This test runs the same compare the driver does (reusing
tools/check_oracle's normalize + frames_equal) over a unicode fixture.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo/tools")
from check_oracle import frames_equal, normalize  # noqa: E402

UNICODE_DOCS = [
    (0, "hello 世界 tokens here", "en", "s"),           # CJK
    (1, "café naïve résumé test", "fr", "s"),           # latin accents
    (2, "emoji \U0001F600 \U0001F680 mix", "en", "s"),  # astral plane
    (3, "é combining acute here", "en", "s"),     # combining mark
    (4, "مرحبا rtl text here", "ar", "s"),              # RTL script
    (5, "tab\tand\nnewline mix", "en", "s"),            # embedded ws
    (6, "ＡＢＣ fullwidth ｆｏｒｍｓ", "en", "s"),        # fullwidth forms
    (7, "ß ς ﬁ casefold edge", "de", "s"),              # case-fold edges
]

# text-family keys with a SQL oracle (prefix families that read text)
KEYS = [
    "text_stats",
    "text_tokens",
    "text_quality",
    "text_lang_id",
    "text_entropy",
    "text_fingerprint",
    "text_ngrams",
    "text_redact",
    "text_repetition",
    "text_surprisal",
    "text_perplexity",
    "text_boilerplate",
    "udtf_tokens",
    "dedup_exact",
    "dedup_near",
    "dedup_jaccard",
    "dedup_simhash",
    "dedup_containment",
    "corpus_shuffle",
    "corpus_interleave",
    "pipeline_corpus_clean",
    "stream_corpus_intake",
    "pipeline_scrub_boilerplate",
    "pipeline_dedup_keep_best",
    "pipeline_substring_dedup",
    "corpus_token_budget",
    "corpus_dedup_stats",
    # round-6
    "pipeline_mix_temperature",
    "corpus_quality_deciles",
    "text_bm25_topk",
    "sim_rrf_hybrid",
    "text_perplexity_bigram",
    # round-6d/6e: zipped-bigram lift, md5-ordered sampling, HOF
    # lambdas, Arrow-native token counts — all unicode-sensitive paths
    "text_collocations",
    "corpus_sample_fixed_k",
    "fn_hof",
    "map_in_arrow",
    # round-7: Gopher repetition/rules, CCNet buckets, DSIR weights —
    # all tokenize raw text, so the unicode path is load-bearing
    "text_rep_signals",
    "text_gopher_rules",
    "pipeline_ccnet_buckets",
    "pipeline_dsir_weights",
    # round-8: BPE training tokenizes raw text ([a-z]+ after lower()),
    # so the unicode path (mixed scripts, combining marks, emoji) must
    # neither crash nor diverge from the oracle's extraction
    "pipeline_bpe_train",
    "pipeline_bpe_tokens",
    # round-8: KN smoothing zips raw-text token tails — the bigram
    # extraction must agree with the oracle's 1-based list slicing on
    # multi-byte scripts
    "text_bigram_kn",
]


@pytest.fixture(scope="module")
def unicode_dir(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("unicode_sf")
    for f in os.listdir(src):
        if f != "documents.parquet":
            os.symlink(os.path.join(src, f), dst / f)
    rows = [(i, t, l, s, len(t)) for i, t, l, s in UNICODE_DOCS]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(dst / "_o")
    df.coalesce(1).write.parquet(out)
    part = next(p for p in os.listdir(out) if p.endswith(".parquet"))
    shutil.move(os.path.join(out, part), dst / "documents.parquet")
    shutil.rmtree(out)
    return str(dst)


@pytest.fixture(scope="module")
def duck(unicode_dir):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{unicode_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("key", KEYS)
def test_unicode_oracle_parity(spark, unicode_dir, duck, key):
    import __spark_entry__ as entry

    sdf = entry.queries()[key](spark, unicode_dir).toPandas()
    odf = duck.execute(entry.oracle_sql()[key]).fetchdf()
    a, b = normalize(sdf), normalize(odf)
    ok, why, _warns = frames_equal(a, b, tol=0.0)
    assert ok, f"{key}: {why}"


def test_edit_nn_levenshtein_is_codepoint_based_unlike_duckdb(spark):
    """Documented engine divergence (found by review, kept explicit):
    Spark's levenshtein counts CODEPOINT edits while DuckDB's counts
    BYTE edits, so dedup_edit_nn's oracle parity holds only on ASCII
    corpora (the fixture domain). The op itself uses the codepoint
    semantics — the right one for text. dedup_edit_nn is therefore
    excluded from the oracle-parity KEYS above; this test pins the
    Spark-side semantics on multibyte input instead."""
    import duckdb

    from pyspark.sql import functions as F

    row = (
        spark.range(1)
        .select(F.levenshtein(F.lit("café x"), F.lit("cafe x")).alias("d"))
        .first()
    )
    assert row["d"] == 1  # one codepoint substitution
    assert duckdb.sql(
        "SELECT levenshtein('café x', 'cafe x')"
    ).fetchone()[0] == 2  # é is two UTF-8 bytes — byte-based
