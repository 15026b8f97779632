"""Invariants for the chunking / clustering training-data ops:
text_chunk window coverage, emb_kmeans partition sanity and
determinism, dedup_semantic drop-rule properties."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_chunk_covers_every_token(spark):
    """Chunk windows tile each document: starts are 1, 25, 49, ...;
    consecutive chunks overlap by 8; the last chunk reaches the final
    token; rebuilt text from stride-slices equals the original."""
    from spark_cep_spark.io import table
    from pyspark.sql import functions as F

    chunks = entry.queries()["text_chunk"](spark, SF)
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in table(spark, SF, "documents").collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_idx"])
        toks = docs[doc_id]
        assert [r["chunk_idx"] for r in rs] == list(range(len(rs)))
        rebuilt: list[str] = []
        for r in rs:
            assert r["start_tok"] == 1 + 24 * r["chunk_idx"]
            got = r["chunk_text"].split(" ") if r["chunk_text"] else []
            want = toks[r["start_tok"] - 1 : r["start_tok"] - 1 + 32]
            assert got == want and r["n_tok"] == len(want)
            rebuilt.extend(got[: 24] if r is not rs[-1] else got)
        assert rebuilt == toks


def test_kmeans_partitions_all_rows(spark):
    rows = entry.queries()["emb_kmeans"](spark, SF).collect()
    assert len(rows) == 500
    clusters = {r["cluster"] for r in rows}
    assert clusters <= set(range(8))
    assert len(clusters) >= 2, "degenerate single-cluster fit"
    assert all(r["dist2"] >= 0.0 for r in rows)
    # unit vectors: squared distance to any centroid is <= 4 + eps
    assert all(r["dist2"] <= 4.0 + 1e-6 for r in rows)


def test_kmeans_deterministic(spark):
    a = sorted(map(tuple, entry.queries()["emb_kmeans"](spark, SF).collect()))
    b = sorted(map(tuple, entry.queries()["emb_kmeans"](spark, SF).collect()))
    assert a == b


def test_semantic_dedup_drop_rule(spark):
    """Every dropped row names a lower-id keeper in the same cluster
    with cosine >= tau, and the keeper is the LOWEST such id."""
    from pyspark.sql import functions as F
    from spark_cep_spark.io import table
    from spark_cep_spark.operators.llm_similarity import kmeans_fit_assign

    dropped = entry.queries()["dedup_semantic"](spark, SF).collect()
    a2 = kmeans_fit_assign(table(spark, SF, "embeddings"))
    info = {
        r["vec_id"]: (r["_m"]["cl"], list(r["embedding"]))
        for r in a2.collect()
    }
    import math

    def cos(u, v):
        return sum(float(a) * float(b) for a, b in zip(u, v))

    for r in dropped:
        j, i, sim = r["vec_id"], r["kept_id"], r["sim"]
        assert i < j
        cl_j, v_j = info[j]
        cl_i, v_i = info[i]
        assert cl_i == cl_j
        assert sim >= 0.35
        assert math.isclose(cos(v_i, v_j), sim, abs_tol=1e-5)
        # i is the lowest same-cluster id above threshold
        for i2, (cl2, v2) in info.items():
            if i2 < i and cl2 == cl_j and cos(v2, v_j) >= 0.35:
                pytest.fail(f"lower keeper {i2} exists for {j}")


def test_semantic_dedup_empty_when_threshold_unreachable(spark):
    """All-orthogonal embeddings produce zero drops (no false dupes)."""
    from spark_cep_spark.operators.llm_similarity import (
        kmeans_fit_assign,
        _dot,
    )
    from pyspark.sql import functions as F

    dim = 16
    rows = [(i, [1.0 if d == i % dim else 0.0 for d in range(dim)], 0)
            for i in range(12)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    a2 = kmeans_fit_assign(df, k=4).select(
        "vec_id",
        F.col("_m.cl").alias("cl"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    i, j = a2.alias("i"), a2.alias("j")
    cand = i.join(
        j,
        (F.col("i.cl") == F.col("j.cl"))
        & (F.col("i.vec_id") < F.col("j.vec_id")),
    ).filter(_dot(F.col("i.v"), F.col("j.v")) >= 0.35)
    # identical basis vectors DO collide (i, i+dim share a direction);
    # restricting to the first dim rows leaves only orthogonal pairs
    assert (
        cand.filter((F.col("i.vec_id") < dim) & (F.col("j.vec_id") < dim))
        .count()
        == 0
    )


# ---------------------------------------------------------------------------
# Property: chunking any corpus (empty strings included) matches the
# plain-Python windowing reference.

from hypothesis import given, settings, strategies as st  # noqa: E402


@pytest.fixture(scope="module")
def spark_holder(spark):
    return spark


token = st.text(alphabet="abcxyz", min_size=1, max_size=4)
doc = st.lists(token, min_size=0, max_size=80).map(" ".join)


def _py_chunks(text, size=32, stride=24):
    toks = text.split(" ")  # '' splits to [''] — one 1-token chunk
    out = []
    for idx, start in enumerate(range(0, len(toks), stride)):
        w = toks[start : start + size]
        out.append((idx, start + 1, len(w), " ".join(w)))
    return out


@settings(max_examples=20, deadline=None)
@given(st.lists(doc, min_size=0, max_size=6))
def test_chunk_matches_python_reference(spark_holder, texts):
    spark = spark_holder
    from spark_cep_spark.operators.llm_text import text_chunk
    import os, tempfile

    with tempfile.TemporaryDirectory() as d:
        df = spark.createDataFrame(
            [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        out = os.path.join(d, "documents.parquet")
        tmp = os.path.join(d, "_out")
        df.coalesce(1).write.parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        os.rename(os.path.join(tmp, part), out)
        got: dict[int, list] = {}
        for r in text_chunk(spark, d).collect():
            got.setdefault(r["doc_id"], []).append(
                (r["chunk_idx"], r["start_tok"], r["n_tok"], r["chunk_text"])
            )
        for i, t in enumerate(texts):
            assert sorted(got.get(i, [])) == _py_chunks(t), f"doc {i}: {t!r}"
