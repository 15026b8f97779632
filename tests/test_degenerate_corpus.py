"""Degenerate-corpus sweep: every text/dedup/similarity/pipeline
operator must survive a corpus containing empty, 1-word, 2-word, and
all-same-word documents (any real web-scale training corpus has them).

Round-2 verdict found two crash bugs in this class (unguarded
``sequence(1, size(w)-k)`` runs DESCENDING when ``size(w) <= k`` and
feeds invalid indices to slice/element_at). This test pins the fix for
the whole operator family: a fixture dir whose documents.parquet is
nothing but degenerate docs is run through every registered llm_* key.
"""

from __future__ import annotations

import os
import shutil

import pytest

DEGENERATE_DOCS = [
    # (doc_id, text) — lang/source/n_chars filled in below
    (0, ""),                         # empty text -> split gives [""]
    (1, "word"),                     # 1 token: no bigram, no shingle
    (2, "two words"),                # 2 tokens: bigram but no 3-shingle
    (3, "three tokens here"),        # exactly one 3-shingle
    (4, "same same same same"),      # all-identical tokens
    (5, "a b c d e"),                # 5 tokens: exactly one 5-gram
    (6, "x"),                        # duplicate-of-1-shaped single token
    (7, "word"),                     # exact dup of doc 1
    (8, "  "),                       # whitespace only -> ['', '', '']
    (9, "one two three four five six seven eight nine ten"),  # normal
    (10, None),                      # NULL text (real corpora have them)
]

# Every registry key that consumes the documents/embeddings tables —
# the operator family the round-2 crashes lived in.
LLM_PREFIXES = (
    "dedup_", "sim_", "text_", "corpus_", "pipeline_", "emb_",
    "multimodal_",
)


@pytest.fixture(scope="module")
def degenerate_dir(spark, tmp_path_factory):
    """sf0.001 with documents.parquet replaced by the degenerate corpus."""
    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("degenerate_sf")
    for f in os.listdir(src):
        if f != "documents.parquet":
            os.symlink(os.path.join(src, f), dst / f)
    rows = [
        (doc_id, text, "en", "synthetic", len(text) if text is not None else None)
        for doc_id, text in DEGENERATE_DOCS
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    # coalesce(1): tiny fixture, single file keeps reads deterministic
    tmp_out = str(dst / "_docs_out")
    df.coalesce(1).write.parquet(tmp_out)
    part = next(
        p for p in os.listdir(tmp_out) if p.endswith(".parquet")
    )
    shutil.move(os.path.join(tmp_out, part), dst / "documents.parquet")
    shutil.rmtree(tmp_out)
    return str(dst)


EXTRA_DOC_KEYS = (  # doc-table keys outside the llm_* prefixes
    "udtf_tokens",
    "map_in_pandas",
    "stream_dedup_near",
    "fn_hof",  # round 6d: HOF lambdas over the word array
    "map_in_arrow",  # round 6d: Arrow-native batch map over text
    "stream_corpus_intake",  # round 10: quality+dedup+counter intake
)


def _llm_keys():
    import __spark_entry__ as entry

    return sorted(
        k
        for k in entry.queries()
        if k.startswith(LLM_PREFIXES) or k in EXTRA_DOC_KEYS
    )


@pytest.mark.parametrize("key", _llm_keys())
def test_operator_survives_degenerate_docs(spark, degenerate_dir, key):
    import __spark_entry__ as entry

    fn = entry.queries()[key]
    # must not raise; row count may legitimately be 0 (e.g. no near-dup
    # pairs exist among 10 degenerate docs)
    n = fn(spark, degenerate_dir).count()
    assert n >= 0


def test_fingerprint_keeps_short_docs_with_null_fingerprint(
    spark, degenerate_dir
):
    """Docs shorter than one shingle stay in the output (NULL
    fingerprint, 0 shingles) — the drop-vs-null choice is explicit and
    matches the oracle's CASE WHEN."""
    import __spark_entry__ as entry

    rows = {
        r["doc_id"]: r
        for r in entry.queries()["text_fingerprint"](
            spark, degenerate_dir
        ).collect()
    }
    assert len(rows) == len(DEGENERATE_DOCS)  # nothing dropped
    for short_id in (0, 1, 2, 6, 7):
        assert rows[short_id]["fingerprint"] is None
        assert rows[short_id]["n_shingles"] == 0
    assert rows[3]["fingerprint"] is not None
    assert rows[3]["n_shingles"] == 1


def test_repetition_one_word_doc_has_null_bigram_ratio(
    spark, degenerate_dir
):
    import __spark_entry__ as entry

    rows = {
        r["doc_id"]: r
        for r in entry.queries()["text_repetition"](
            spark, degenerate_dir
        ).collect()
    }
    assert rows[1]["dup_bigram_ratio"] is None  # no bigrams to measure
    assert rows[4]["dup_bigram_ratio"] is not None  # "same same same same"
