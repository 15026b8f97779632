"""LLM-pipeline operator tests (SURVEY §2.11): dedup invariants at the
scale tier that actually contains duplicates (sf0.1), similarity path
equivalence, multimodal plumbing.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.operators.llm_dedup import simhash64
from spark_cep_spark.operators.llm_multimodal import (
    assets_from_documents,
    decode_asset,
    decode_assets,
)
from spark_cep_spark.operators.llm_similarity import topk_matmul

SF_BENCH = "/root/testdata/sf0.1"


def test_exact_dedup_finds_the_8_fixture_dups(spark):
    """FIXTURES.md: sf0.1 has 5000 docs, 4992 distinct texts."""
    import spark_cep_spark

    spark_cep_spark.load_all()
    kept = spark_cep_spark.QUERIES["dedup_exact"](spark, SF_BENCH)
    assert kept.count() == 4992


def test_dedup_idempotent(spark):
    import spark_cep_spark

    spark_cep_spark.load_all()
    kept = spark_cep_spark.QUERIES["dedup_exact"](spark, SF_BENCH)
    docs = table(spark, SF_BENCH, "documents")
    once = docs.join(kept.select("doc_id"), "doc_id")
    # dedup of the deduped set removes nothing
    rehash = once.select("doc_id", F.md5("text").alias("h"))
    assert rehash.select("h").distinct().count() == once.count()


def test_simhash_identical_texts_collide(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "x y z w q")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.simhash for r in simhash64(df).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_minhash_dup_texts_same_signature(spark):
    from spark_cep_spark.operators.llm_dedup import _minhash_signature

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta eps zeta")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.sig for r in _minhash_signature(df).collect()}
    assert sigs[1] == sigs[2] != sigs[3]


def test_pandas_topk_matches_sql_topk_ranks(spark):
    """numpy matmul path must produce the same neighbor SET+ranks as the
    SQL fold path (sims may differ in last ulp only)."""
    import spark_cep_spark

    spark_cep_spark.load_all()
    sf = "/root/testdata/sf0.01"
    sql_rows = spark_cep_spark.QUERIES["sim_topk"](spark, sf).collect()
    np_rows = spark_cep_spark.QUERIES["sim_topk_pandas"](spark, sf).collect()
    key = lambda rows: sorted((r.qid, r.rk, r.neighbor_id) for r in rows)
    assert key(sql_rows) == key(np_rows)


def test_topk_matmul_multi_partition(spark):
    """Partial-topk-per-batch + final window must survive candidate
    repartitioning (the 100 TB shape)."""
    e = table(spark, "/root/testdata/sf0.01", "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    one = topk_matmul(spark, q, e.coalesce(1), k=5).collect()
    many = topk_matmul(spark, q, e.repartition(7), k=5).collect()
    key = lambda rows: sorted((r.qid, r.rk, r.neighbor_id) for r in rows)
    assert key(one) == key(many)


def test_lsh_recall_on_planted_near_duplicates(spark):
    """LSH contract: ≥90% of queries recover their planted twin as the
    top-1 neighbor while scoring only same-bucket candidates. Uses the
    SAME probe tools/check_oracle.py gates on (no drift)."""
    from spark_cep_spark.operators.llm_similarity import planted_recall_probe

    hits, total = planted_recall_probe(spark, "sim_ann_lsh")
    assert hits >= 0.9 * total


def test_ivf_recall_on_planted_near_duplicates(spark):
    """IVF contract: a twin at cos 0.95 lands in the same (or a probed)
    KMeans cell — ≥90% top-1 recall with nprobe=4 of 16 cells, i.e.
    scoring ~1/4 of the corpus per query."""
    from spark_cep_spark.operators.llm_similarity import planted_recall_probe

    hits, total = planted_recall_probe(spark, "sim_ann_ivf")
    assert hits >= 0.9 * total


def test_multimodal_roundtrip(spark, sf_dir):
    d = table(spark, sf_dir, "documents").limit(20)
    a = assets_from_documents(d)
    back = a.select(
        "doc_id", F.decode(F.col("asset.bytes"), "UTF-8").alias("text2")
    ).join(d, "doc_id")
    assert back.filter(F.col("text2") != F.col("text")).count() == 0


def test_decode_asset_stub_contract():
    with pytest.raises(NotImplementedError):
        decode_asset(b"xx", "image/png", fake=False)
    f = decode_asset(b"abc", "image/png", fake=True)
    assert f["n_bytes"] == 3


def test_decode_assets_distributed_fake(spark, sf_dir):
    d = table(spark, sf_dir, "documents").limit(50)
    feats = decode_assets(assets_from_documents(d), fake=True)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(r.n_bytes > 0 for r in rows)


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    approx = e.agg(F.approx_count_distinct("user_id", 0.01).alias("a")).first().a
    exact = e.select("user_id").distinct().count()
    assert abs(approx - exact) <= max(2, 0.05 * exact)


def test_connected_components_chain(spark):
    """A path graph a-b-c-d plus an isolated vertex must collapse to
    one cluster (multi-hop propagation) and one singleton."""
    from spark_cep_spark.operators.llm_dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    verts = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 99]], "doc_id long")
    got = {r["doc_id"]: r["cluster_rep"] for r in connected_components(edges, verts).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_multimodal_frame_and_resize_pipeline(spark, sf_dir):
    from spark_cep_spark.io import table
    from spark_cep_spark.operators.llm_multimodal import (
        assets_from_documents,
        decode_assets,
        frame_sample,
        resize_features,
        size_bucket_repartition,
    )

    d = table(spark, sf_dir, "documents").limit(50)
    assets = assets_from_documents(d)
    # size-bucket repartition is a pure physical rewrite
    re_assets = size_bucket_repartition(assets, n_partitions=4)
    assert re_assets.count() == assets.count()
    # resize never exceeds max_side and preserves integer dims
    rz = resize_features(decode_assets(re_assets, fake=True), max_side=100)
    for r in rz.collect():
        assert r["out_w"] <= 100 and r["out_h"] <= 100
    # frame fan-out: deterministic, >= 1 frame per asset, idempotent
    f1 = frame_sample(re_assets, every_n=10).groupBy("doc_id").count()
    f2 = frame_sample(assets, every_n=10).groupBy("doc_id").count()
    a = {r["doc_id"]: r["count"] for r in f1.collect()}
    b = {r["doc_id"]: r["count"] for r in f2.collect()}
    assert a == b and len(a) == 50 and all(v >= 1 for v in a.values())


def test_connected_components_two_phase_equals_label_prop(spark):
    """Differential check of the two CC algorithms on a graph mixing
    chains, a clique, a star, and singletons."""
    from spark_cep_spark.operators.llm_dedup import connected_components

    edge_list = (
        [(i, i + 1) for i in range(0, 8)]          # chain 0..8
        + [(20, 21), (20, 22), (20, 23)]           # star at 20
        + [(30, 31), (31, 32), (30, 32), (32, 33)] # clique + tail
        + [(40, 41)]
    )
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    verts = spark.createDataFrame(
        [(i,) for i in range(0, 50)], "doc_id long"
    )
    two = {
        (r["doc_id"], r["cluster_rep"])
        for r in connected_components(edges, verts, algorithm="two_phase").collect()
    }
    prop = {
        (r["doc_id"], r["cluster_rep"])
        for r in connected_components(edges, verts, algorithm="label_prop").collect()
    }
    assert two == prop


def test_connected_components_two_phase_logn_rounds_on_long_chain(spark):
    """The pathological case SURVEY §8.3 flagged: a 64-node path needs
    ~diameter rounds under label propagation but O(log n) under
    small-star/large-star — assert both the answer and the bound."""
    from spark_cep_spark.operators.llm_dedup import _cc_two_phase

    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    verts = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    labels, rounds = _cc_two_phase(edges, verts, "doc_id", max_iters=20)
    got = {r["doc_id"]: r["cluster_rep"] for r in labels.collect()}
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 10  # ~2·log2(64) with slack; diameter would be 63


def test_hll_sketch_union_accuracy(spark, sf_dir):
    """Merged per-group HLL sketches estimate the GLOBAL distinct count
    within HLL error bounds — the re-aggregatable rollup contract."""
    from spark_cep_spark.operators.aggregates import agg_sketches

    est = agg_sketches(spark, sf_dir).first()
    exact = (
        table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert abs(est.est_total_users - exact) <= max(2, 0.05 * exact)
    assert est.n_types == 5


def test_pq_recall_on_planted_near_duplicates(spark):
    """PQ contract: ADC over 8-byte codes shortlists the planted twin
    (cos ≈ 0.95) and exact re-ranking returns it as top-1 for ≥90% of
    queries — while the scan itself touches only quantized codes."""
    from spark_cep_spark.operators.llm_similarity import planted_recall_probe

    hits, total = planted_recall_probe(spark, "sim_ann_pq")
    assert hits >= 0.9 * total


def test_minhash_lsh_catches_near_dup_that_full_signature_misses(
    spark, tmp_path
):
    """The reason dedup_minhash_lsh exists: a single-token edit that
    flips SOME minhash seeds breaks full-signature equality
    (dedup_near's bucket), but banding (3 bands x 2 rows) still pairs
    the docs as long as one band survives, and the exact Jaccard
    verify confirms them. Doc 3 = doc 1 with token 12 changed: seeds
    h2/h3/h4 flip (verified constant — md5 is deterministic), band 0
    survives, true 3-shingle Jaccard = 25/31 ~= 0.806."""
    import __spark_entry__ as entry

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four"
    )
    toks = base.split()
    near = toks.copy()
    near[12] = "CHANGED"
    rows = [
        (1, base, "en", "t", len(base)),
        (2, base, "en", "t", len(base)),          # exact dup of 1
        (3, " ".join(near), "en", "t", len(base)),  # near dup of 1
    ]
    d = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    fx = str(tmp_path / "lsh_fx")
    import os
    import shutil

    os.makedirs(fx)
    out = str(tmp_path / "docs_out")
    d.coalesce(1).write.parquet(out)
    part = next(p for p in os.listdir(out) if p.endswith(".parquet"))
    shutil.move(os.path.join(out, part), os.path.join(fx, "documents.parquet"))

    full_sig_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in entry.queries()["dedup_near"](spark, fx).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in entry.queries()["dedup_minhash_lsh"](spark, fx).collect()
    }
    # full-signature equality sees only the exact pair
    assert full_sig_pairs == {(1, 2)}
    # banding sees the exact pair (J=1.0) AND the near pair
    assert set(lsh) == {(1, 2), (1, 3), (2, 3)}
    assert lsh[(1, 2)] == 1.0
    assert abs(lsh[(1, 3)] - round(25 / 31, 6)) < 1e-9
