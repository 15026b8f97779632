"""Similarity search over embeddings (SURVEY §2.11).

Fixture vectors are unit-L2-norm (FIXTURES.md) ⇒ cosine ≡ dot product.

Two execution paths:
- SQL path (oracle-checkable): higher-order functions zip_with +
  aggregate — pure JVM expressions, exact mirror of DuckDB
  list_dot_product.
- numpy path (the throughput path, `sim_topk_pandas`): broadcast the
  query matrix, mapInPandas over candidate batches, one BLAS matmul per
  Arrow batch. This is the shape that survives 100 TB: candidates
  stream through executors, queries stay in memory, top-k via partial
  heaps then a final groupBy.

Scale beyond brute force: IVF — cluster candidates (KMeans fit on a
sample), probe nearest cells only; LSH — random-hyperplane sign
buckets. Both reduce the candidate set per query by orders of
magnitude; bucket assignment is itself a dot-product mapInPandas pass.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_cep_spark.io import table
from spark_cep_spark.registry import register


def _dot(a, b):
    """Exact sequential dot product as a JVM-side expression (matches
    DuckDB list_dot_product fold order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _write_tiny_table(spark, rows, schema: str, path: str) -> None:
    """Write a driver-built metadata table (centroids/codebooks: tens
    of rows) as ONE parquet file.  `createDataFrame(list).coalesce(1)`
    slices the list into defaultParallelism Python partitions and then
    runs ALL of them sequentially inside the single coalesced task —
    ~150 ms of Python-worker dispatch x 32 slices = ~5 s per write
    (measured round 12, guide §4.1: the boundary is per-PARTITION, not
    per-row).  A single-slice parallelize keeps one Python partition
    end to end: same file, same rows, ~0.5 s."""
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    ).write.mode("overwrite").parquet(path)


def valid_vectors(df: DataFrame, vec_col: str = "embedding", dim=None) -> DataFrame:
    """Drop malformed vectors BEFORE any Arrow/numpy stage: NULL
    embeddings, empty arrays, wrong-dimension (ragged) vectors, and
    vectors containing NULL or non-finite elements. Real embedding
    stores contain all of these (failed encoder calls, schema drift);
    ``np.array(list(col))`` hard-crashes on ragged/None input, so the
    numpy-backed paths (matmul/LSH/IVF/PQ) would die on one bad row.

    Pure Catalyst expressions — the filter runs JVM-side inside the
    scan stage, costs one pass over the array, and pushes nothing to
    Python. The SQL-path ops (sim_topk, dedup_embed, ...) don't need
    it: 3VL NULL propagation drops malformed rows for free."""
    c = F.col(vec_col)
    cond = c.isNotNull() & (F.size(c) > 0)
    if dim is not None:
        cond = cond & (F.size(c) == F.lit(int(dim)))
    finite = lambda x: x.isNull() | F.isnan(x.cast("double")) | (
        F.abs(x.cast("double")) == float("inf")
    )
    return df.filter(cond & ~F.exists(c, finite))


def _valid_rows(rows, vec_idx: int = 1, dim=None):
    """Driver-side twin of valid_vectors for collected query/sample
    rows (bounded by contract). Returns (rows, dim)."""
    import math

    out, d = [], dim
    for r in rows:
        v = r[vec_idx]
        if v is None or len(v) == 0:
            continue
        if any(x is None or not math.isfinite(x) for x in v):
            continue
        if d is None:
            d = len(v)
        if len(v) != d:
            continue
        out.append(r)
    return out, d


@register(
    "sim_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
         scored AS (
           SELECT q.qid, e.vec_id,
                  list_dot_product(CAST(q.qe AS DOUBLE[]),
                                   CAST(e.embedding AS DOUBLE[])) AS sim_raw
           FROM q CROSS JOIN embeddings e
           WHERE e.vec_id <> q.qid
         )
    SELECT qid, vec_id AS neighbor_id, round(sim_raw, 6) AS sim, rk FROM (
        SELECT qid, vec_id, sim_raw,
               row_number() OVER (PARTITION BY qid ORDER BY sim_raw DESC, vec_id) AS rk
        FROM scored) t
    WHERE rk <= 10
    """,
)
def sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for query vectors (vec_id < 10)."""
    e = table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
        )
    )
    scored = (
        q.crossJoin(e)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", _dot(F.col("qe"), F.col("embedding")).alias("sim_raw"))
    )
    w = W.partitionBy("qid").orderBy(F.col("sim_raw").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 10)
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.round("sim_raw", 6).alias("sim"),
            "rk",
        )
    )


@register(
    "sim_knn_class",
    oracle="""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 50),
         scored AS (
           SELECT q.qid, e.vec_id, e.label,
                  list_dot_product(CAST(q.qe AS DOUBLE[]),
                                   CAST(e.embedding AS DOUBLE[])) AS sim_raw
           FROM q CROSS JOIN embeddings e
           WHERE e.vec_id <> q.qid
         ),
         nn AS (
           SELECT qid, label FROM (
             SELECT qid, label,
                    row_number() OVER (PARTITION BY qid ORDER BY sim_raw DESC, vec_id) AS rk
             FROM scored) t
           WHERE rk <= 10
         ),
         votes AS (SELECT qid, label, count(*) AS c FROM nn GROUP BY qid, label)
    SELECT qid, label AS pred_label FROM (
        SELECT qid, label,
               row_number() OVER (PARTITION BY qid ORDER BY c DESC, label) AS r
        FROM votes) t
    WHERE r = 1
    """,
)
def sim_knn_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classification: majority label of the 10 nearest neighbors
    (ties → smallest label; fully deterministic)."""
    e = table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < 50).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
        )
    )
    scored = (
        q.crossJoin(e)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid", "vec_id", "label", _dot(F.col("qe"), F.col("embedding")).alias("sim_raw")
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("sim_raw").desc(), F.col("vec_id"))
    nn = scored.withColumn("rk", F.row_number().over(w).cast("long")).filter(F.col("rk") <= 10)
    votes = nn.groupBy("qid", "label").agg(F.count(F.lit(1)).alias("c"))
    wv = W.partitionBy("qid").orderBy(F.col("c").desc(), F.col("label"))
    return (
        votes.withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") == 1)
        .select("qid", F.col("label").alias("pred_label"))
    )


def topk_matmul(
    spark: SparkSession,
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Throughput ANN baseline: numpy matmul per Arrow batch.

    Queries are collected to the driver (bounded: the query set is the
    small side by contract) and broadcast; candidates stream through
    mapInPandas. Each batch emits its LOCAL top-k per query; a final
    window over (query, partial top-k) yields the global top-k — the
    same partial-then-final shape Spark uses for TakeOrdered.
    """
    import numpy as np

    qrows, dim = _valid_rows(queries.select(id_col, vec_col).collect())
    if not qrows:
        return spark.createDataFrame(
            [], "qid long, neighbor_id long, sim double, rk long"
        )
    candidates = valid_vectors(candidates, vec_col, dim)
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)  # (Q, D)
    bq = spark.sparkContext.broadcast((qids, qmat))

    def score_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, mat = bq.value
        for pdf in batches:
            cand_ids = pdf[id_col].to_numpy(dtype=np.int64)
            cmat = np.array(list(pdf[vec_col]), dtype=np.float64)  # (C, D)
            sims = cmat @ mat.T  # (C, Q)
            out = []
            for j in range(len(ids)):
                col = sims[:, j]
                mask = cand_ids != ids[j]
                cids, csims = cand_ids[mask], col[mask]
                if len(cids) > k:
                    idx = np.argpartition(-csims, k)[:k]
                    cids, csims = cids[idx], csims[idx]
                out.append(
                    pd.DataFrame(
                        {"qid": ids[j], "neighbor_id": cids, "sim_raw": csims}
                    )
                )
            yield pd.concat(out, ignore_index=True)

    partial = candidates.select(id_col, vec_col).mapInPandas(
        score_batches, "qid long, neighbor_id long, sim_raw double"
    )
    w = W.partitionBy("qid").orderBy(F.col("sim_raw").desc(), F.col("neighbor_id"))
    return (
        partial.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("qid", "neighbor_id", F.round("sim_raw", 6).alias("sim"), "rk")
    )


@register(
    "sim_topk_pandas",
    # Same oracle as sim_topk: the BLAS matmul reproduces the sequential
    # fold bit-for-bit on the 64-dim fixture vectors (verified at
    # sf0.001/0.01/0.1 — ranked sets AND rounded sims identical).
    oracle="""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
         scored AS (
           SELECT q.qid, e.vec_id,
                  list_dot_product(CAST(q.qe AS DOUBLE[]),
                                   CAST(e.embedding AS DOUBLE[])) AS sim_raw
           FROM q CROSS JOIN embeddings e
           WHERE e.vec_id <> q.qid
         )
    SELECT qid, vec_id AS neighbor_id, round(sim_raw, 6) AS sim, rk FROM (
        SELECT qid, vec_id, sim_raw,
               row_number() OVER (PARTITION BY qid ORDER BY sim_raw DESC, vec_id) AS rk
        FROM scored) t
    WHERE rk <= 10
    """,
)
def sim_topk_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numpy/BLAS variant of sim_topk (same queries, same oracle).
    The throughput path at scale: queries broadcast, candidates stream
    through mapInPandas, one matmul per Arrow batch."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return topk_matmul(spark, q, e, k=10)


# ---------------------------------------------------------------------------
# ANN scale path: random-hyperplane LSH bucketing.
#
# Brute force is a crossJoin — O(Q·C) dot products and a full shuffle of
# the C×Q score matrix. The LSH route replaces it with an EQUI-join on
# (table, bucket): each side computes L b-bit sign signatures (one per
# hash table), explodes to (id, t, bucket), and only same-bucket pairs
# are ever scored. At 100 TB the crossJoin is impossible; the bucketed
# join is an ordinary shuffle on (t, bucket) whose fan-in is tunable via
# (b, L): recall for a pair at angle θ is 1-(1-(1-θ/π)^b)^L.

def _plane_matrix(n_tables: int, n_planes: int, dim: int, seed: int):
    """Deterministic hyperplanes (fixed seed → reproducible buckets)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_tables, n_planes, dim))


def lsh_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    planes,  # (L, b, dim) ndarray
) -> DataFrame:
    """(id, vec, t, bucket) — one row per hash table. All L×b sign bits
    come from ONE numpy matmul per Arrow batch (planes broadcast with
    the closure): at any scale the bucketing pass is a single linear
    scan of the vectors, the same BLAS kernel as topk_matmul."""
    import numpy as np

    L, b, _dim = planes.shape
    flat = planes.reshape(L * b, -1)  # (L*b, dim)
    weights = (1 << np.arange(b)).astype(np.int64)  # bit -> bucket value

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)  # (N, dim)
            bits = (mat @ flat.T > 0).reshape(len(pdf), L, b)  # (N, L, b)
            buckets = bits @ weights  # (N, L)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy().repeat(L),
                    vec_col: [v for v in pdf[vec_col] for _ in range(L)],
                    "t": np.tile(np.arange(L, dtype=np.int32), len(pdf)),
                    "bucket": buckets.ravel(),
                }
            )

    vec_type = dict(df.dtypes)[vec_col]
    return df.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} long, {vec_col} {vec_type}, t int, bucket long"
    )


def topk_lsh(
    spark: SparkSession,
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_tables: int = 8,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: LSH candidate generation + exact rescoring.

    Same output schema as topk_matmul/sim_topk; neighbors missing a
    shared bucket with the query are simply absent (that is the
    approximation). Rescoring uses the exact JVM dot product, so every
    returned sim is exact — only the candidate set is approximate.
    """
    queries = valid_vectors(queries, vec_col, dim)
    candidates = valid_vectors(candidates, vec_col, dim)
    planes = _plane_matrix(n_tables, n_planes, dim, seed)
    qb = lsh_buckets(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qe")),
        "qid",
        "qe",
        planes,
    )
    cb = lsh_buckets(candidates.select(id_col, vec_col), id_col, vec_col, planes)
    pairs = (
        qb.join(cb, ["t", "bucket"])
        .filter(F.col(id_col) != F.col("qid"))
        .dropDuplicates(["qid", id_col])
    )
    scored = pairs.select(
        "qid",
        F.col(id_col).alias("neighbor_id"),
        _dot(F.col("qe"), F.col(vec_col)).alias("sim_raw"),
    )
    w = W.partitionBy("qid").orderBy(F.col("sim_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("qid", "neighbor_id", F.round("sim_raw", 6).alias("sim"), "rk")
    )


# ---------------------------------------------------------------------------
# ANN scale path 2: IVF (inverted-file) — KMeans cells + nprobe.
#
# LSH is data-oblivious; IVF adapts to the data distribution: cluster
# the corpus (distributed MLlib KMeans fit), store each vector in its
# nearest-centroid cell, and probe only the nprobe cells closest to
# each query. Candidate volume per query ≈ nprobe/n_cells of the
# corpus. The cell assignment is a tiny dimension join; the scan of
# probed cells is an equi-join on cell id — same shuffle shape as LSH.

def topk_ivf(
    spark: SparkSession,
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF: exact rescoring inside probed cells.

    The KMeans fit is the one driver-coordinated step (MLlib, seeded →
    deterministic); at 100 TB it runs on a sample. Everything after is
    joins: candidates carry a `cell` column (JVM-side assignment via
    the model), queries explode to their nprobe nearest cells, and the
    probe is an equi-join on cell.
    """
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # KMeans requires fixed-dimension finite vectors; infer the corpus
    # dim as the MODAL vector length (one tiny aggregate — a ragged
    # minority must not decide the dimension), then filter both sides
    # JVM-side (see valid_vectors).
    probe = (
        valid_vectors(candidates, vec_col)
        .groupBy(F.size(vec_col).alias("d"))
        .count()
        .orderBy(F.desc("count"), "d")
        .first()
    )
    if probe is None:
        return spark.createDataFrame(
            [], "qid long, neighbor_id long, sim double, rk long"
        )
    dim = probe.d
    candidates = valid_vectors(candidates, vec_col, dim)
    queries = valid_vectors(queries, vec_col, dim)

    cand_vec = candidates.select(
        id_col, vec_col, array_to_vector(F.col(vec_col).cast("array<double>")).alias("_fv")
    )
    model = KMeans(k=n_cells, seed=seed, featuresCol="_fv", predictionCol="cell").fit(
        cand_vec.select("_fv")
    )
    cb = model.transform(cand_vec).select(id_col, vec_col, "cell")

    centers = np.array(model.clusterCenters())  # (n_cells, D)
    bc = spark.sparkContext.broadcast(centers)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        C = bc.value
        for pdf in batches:
            qmat = np.array(list(pdf["qe"]), dtype=np.float64)  # (Q, D)
            # nearest cells by euclidean distance (KMeans metric)
            d2 = ((qmat[:, None, :] - C[None, :, :]) ** 2).sum(-1)  # (Q, cells)
            near = np.argsort(d2, axis=1)[:, :nprobe]
            yield pd.DataFrame(
                {
                    "qid": pdf["qid"].to_numpy().repeat(nprobe),
                    "qe": [v for v in pdf["qe"] for _ in range(nprobe)],
                    "cell": near.ravel().astype("int32"),
                }
            )

    qb = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qe")
    ).mapInPandas(probe, "qid long, qe array<double>, cell int")

    scored = (
        qb.join(cb, "cell")
        .filter(F.col(id_col) != F.col("qid"))
        .select(
            "qid",
            F.col(id_col).alias("neighbor_id"),
            _dot(F.col("qe"), F.col(vec_col)).alias("sim_raw"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("sim_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("qid", "neighbor_id", F.round("sim_raw", 6).alias("sim"), "rk")
    )


@register("sim_ann_ivf")  # approximate candidate set → rows-only
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over the fixture (same queries as sim_topk). Recall
    contract asserted on planted near-duplicates in tests, like LSH."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return topk_ivf(spark, q, e, k=10)


@register("sim_ann_lsh")  # approximate candidate set → rows-only
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN over the fixture (same queries as sim_topk).
    Fixture vectors are near-uniform on the sphere (no cluster
    structure), the hardest case for LSH — recall guarantees are
    asserted in tests on planted near-duplicates instead
    (tests/test_llm_ops.py)."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return topk_lsh(spark, q, e, k=10)


# ---------------------------------------------------------------------------
# ANN scale path 3: PQ (product quantization) — the memory-bound route.
#
# LSH/IVF bound WHICH candidates get scored; PQ bounds the BYTES per
# candidate: each vector is stored as n_sub codeword ids (64 float32
# dims = 256 B → 8 B at 8 sub-quantizers, a 32× compression) and
# scoring is n_sub table lookups instead of a dim-length dot product
# (ADC — asymmetric distance computation; Jégou et al. 2011). At
# 100 TB the candidate scan is bandwidth-bound, which is exactly the
# cost PQ compresses away; codebooks are KB-sized and broadcast. The
# ADC pass emits a per-query shortlist that is exactly re-ranked
# against the raw vectors (an equi-join on id touching only shortlist
# rows), so returned sims are exact — only the shortlist is
# approximate, the same contract as topk_lsh.


def _train_codebooks(sample, n_sub: int, n_codes: int, seed: int, iters: int = 15):
    """Per-subspace Lloyd's k-means on a bounded driver-side sample —
    the standard PQ recipe (codebooks are n_sub×n_codes×dsub floats,
    KBs; the corpus itself never moves for training)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    n, dim = sample.shape
    dsub = dim // n_sub
    books = np.empty((n_sub, n_codes, dsub))
    for s in range(n_sub):
        x = sample[:, s * dsub : (s + 1) * dsub]
        centers = x[rng.choice(n, n_codes, replace=False)].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for c in range(n_codes):
                m = assign == c
                if m.any():
                    centers[c] = x[m].mean(0)
        books[s] = centers
    return books


def topk_pq(
    spark: SparkSession,
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_sub: int = 8,
    n_codes: int = 16,
    shortlist: int = 50,
    seed: int = 7,
    train_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via PQ codes + ADC scan + exact re-ranking.

    Same output schema as topk_matmul/topk_lsh/topk_ivf. Distributed
    shape: train on a bounded sample (driver), broadcast codebooks,
    encode + ADC-score candidates in mapInPandas (each batch touches
    only the 8-byte codes), global per-query shortlist via window,
    then ONE equi-join back to the raw vectors re-ranks the shortlist
    exactly — the only rows whose full vectors ever move."""
    import numpy as np

    qrows, dim = _valid_rows(queries.select(id_col, vec_col).collect())
    if not qrows:
        return spark.createDataFrame(
            [], "qid long, neighbor_id long, sim double, rk long"
        )
    candidates = valid_vectors(candidates, vec_col, dim)
    sample_rows = (
        candidates.select(vec_col).orderBy(id_col).limit(train_cap).collect()
    )
    sample = np.array([r[0] for r in sample_rows], dtype=np.float64)
    books = _train_codebooks(sample, n_sub, n_codes, seed)
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)  # (Q, D)
    dsub = qmat.shape[1] // n_sub
    # ADC tables: tables[q, s, c] = q_s · book[s, c]
    tables = np.einsum(
        "qsd,scd->qsc", qmat.reshape(len(qids), n_sub, dsub), books
    )
    bc = spark.sparkContext.broadcast((qids, tables, books))

    def adc_scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, tabs, bks = bc.value
        sub_idx = np.arange(n_sub)
        for pdf in batches:
            cand_ids = pdf[id_col].to_numpy(dtype=np.int64)
            cmat = np.array(list(pdf[vec_col]), dtype=np.float64)
            csub = cmat.reshape(len(pdf), n_sub, dsub)
            # encode: nearest codeword per subspace (the stored 8-byte code)
            d2 = ((csub[:, :, None, :] - bks[None, :, :, :]) ** 2).sum(-1)
            codes = d2.argmin(-1)  # (C, n_sub)
            out = []
            for j in range(len(ids)):
                approx = tabs[j][sub_idx[None, :], codes].sum(1)  # (C,)
                mask = cand_ids != ids[j]
                cids, appr = cand_ids[mask], approx[mask]
                if len(cids) > shortlist:
                    idx = np.argpartition(-appr, shortlist)[:shortlist]
                    cids, appr = cids[idx], appr[idx]
                out.append(
                    pd.DataFrame({"qid": ids[j], "neighbor_id": cids, "approx": appr})
                )
            yield pd.concat(out, ignore_index=True)

    partial = candidates.select(id_col, vec_col).mapInPandas(
        adc_scan, "qid long, neighbor_id long, approx double"
    )
    wa = W.partitionBy("qid").orderBy(F.col("approx").desc(), F.col("neighbor_id"))
    short = (
        partial.withColumn("ra", F.row_number().over(wa))
        .filter(F.col("ra") <= shortlist)
        .select("qid", "neighbor_id")
    )
    qdf = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qe")
    )
    rescored = (
        short.join(
            candidates.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ce")
            ),
            "neighbor_id",
        )
        .join(F.broadcast(qdf), "qid")
        .select("qid", "neighbor_id", _dot(F.col("qe"), F.col("ce")).alias("sim_raw"))
    )
    w = W.partitionBy("qid").orderBy(F.col("sim_raw").desc(), F.col("neighbor_id"))
    return (
        rescored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("qid", "neighbor_id", F.round("sim_raw", 6).alias("sim"), "rk")
    )


@register("sim_ann_pq")  # approximate shortlist → rows-only
def sim_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN over the fixture (same queries as sim_topk). Recall
    contract asserted on planted near-duplicates in tests, like
    LSH/IVF; returned sims are exact (shortlist re-ranked)."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return topk_pq(spark, q, e, k=10)


def planted_recall_probe(
    spark: SparkSession, method: str
) -> tuple[int, int]:
    """Recall gate for the three rows-only ANN keys, shared by the
    pytest contracts (tests/test_llm_ops.py) and
    tools/check_oracle.py's rows-only path, so an ANN recall
    regression fails the LOCAL driver-mimic gate, not just pytest.

    Builds the planted corpus the tests use — 300 seeded-uniform unit
    vectors plus near-duplicate twins (cos ≈ 0.95) of the first 30,
    ids 1000+i (the fixture's own vectors are near-uniform, i.e. have
    no true neighbors to recall) — and counts how many twin queries
    recover their base vector as the top-1 neighbor. Returns
    (hits, n_queries); the contract everywhere is hits >= 0.9·n."""
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.normal(size=(300, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    twins = base[:30] + 0.04 * rng.normal(size=(30, 64))
    twins /= np.linalg.norm(twins, axis=1, keepdims=True)
    rows = [(i, v.tolist()) for i, v in enumerate(base)] + [
        (1000 + i, v.tolist()) for i, v in enumerate(twins)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter(F.col("vec_id") >= 1000)

    def _index_probe():
        # build on the base corpus, APPEND the twins against the
        # stored quantizers, serve from disk — the full persistent
        # lifecycle under the same recall gate
        import shutil
        import tempfile

        path = tempfile.mkdtemp(prefix="ivfpq_recall_")
        try:
            idx = IvfPqIndex.build(
                spark, df.filter(F.col("vec_id") < 1000), path
            )
            idx.append(q)
            return IvfPqIndex.load(spark, path).query(
                q, k=1, nprobe=4
            ).collect()
        finally:
            shutil.rmtree(path, ignore_errors=True)

    def _delete_probe():
        # build on base + 30 distractors' worth of deletions: after
        # tombstoning ids 200–229 AND compacting, the twin queries
        # must still recover their bases (none of which are deleted)
        # and no deleted id may surface — recall survives deletion
        import shutil
        import tempfile

        path = tempfile.mkdtemp(prefix="ivfpq_del_")
        try:
            idx = IvfPqIndex.build(
                spark, df.filter(F.col("vec_id") < 1000), path
            )
            idx.append(q)
            idx.delete(
                df.filter(
                    (F.col("vec_id") >= 200) & (F.col("vec_id") < 230)
                ).select("vec_id")
            )
            idx.compact()
            got = IvfPqIndex.load(spark, path).query(
                q, k=1, nprobe=4
            ).collect()
            assert all(
                not (200 <= r.neighbor_id < 230) for r in got
            ), "deleted id surfaced in query results"
            return got
        finally:
            shutil.rmtree(path, ignore_errors=True)

    def _stream_probe():
        # stream-ingest the twins (multi-epoch AvailableNow) into the
        # stored index, then serve — the continuous-indexing face
        # under the same recall gate
        import shutil
        import tempfile

        path = tempfile.mkdtemp(prefix="ivfpq_stream_")
        stage = tempfile.mkdtemp(prefix="ivfpq_stage_")
        try:
            idx = IvfPqIndex.build(
                spark, df.filter(F.col("vec_id") < 1000), path
            )
            q.repartition(3).write.mode("overwrite").parquet(stage)
            stream = (
                spark.readStream.schema(
                    "vec_id long, embedding array<double>"
                )
                .option("maxFilesPerTrigger", 1)
                .parquet(stage)
            )
            idx.stream_ingest(
                stream, checkpoint=stage + "_ckpt"
            ).awaitTermination()
            return IvfPqIndex.load(spark, path).query(
                q, k=1, nprobe=4
            ).collect()
        finally:
            shutil.rmtree(path, ignore_errors=True)
            shutil.rmtree(stage, ignore_errors=True)
            shutil.rmtree(stage + "_ckpt", ignore_errors=True)

    fn = {
        "sim_ann_lsh": lambda: topk_lsh(spark, q, df, k=1).collect(),
        "sim_ann_ivf": lambda: topk_ivf(
            spark, q, df, k=1, n_cells=16, nprobe=4
        ).collect(),
        "sim_ann_pq": lambda: topk_pq(spark, q, df, k=1).collect(),
        "sim_ann_ivfpq": lambda: topk_ivfpq(
            spark, q, df, k=1, n_cells=16, nprobe=4
        ).collect(),
        "sim_ann_ivfpq_index": _index_probe,
        "sim_ann_ivfpq_delete": _delete_probe,
        "sim_index_stream_ingest": _stream_probe,
    }[method]
    got = fn()
    hits = sum(
        1 for r in got if r.rk == 1 and r.neighbor_id == r.qid - 1000
    )
    return hits, 30


def kmeans_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    add_one: float = 0.0,
) -> DataFrame:
    """One k-means assignment pass as a pure JVM expression: for each
    row, argmin over k centroids of the squared-L2 surrogate
    |c|^2 (+ add_one) - 2·x·c, tie-broken by cluster id (min over a
    (dist, cluster) struct). With unit-norm inputs add_one=1.0 makes
    `dist` the true squared distance.

    100 TB shape: centroids are a KB-size driver-side list compiled
    into literal arrays (the broadcast-variable pattern without a
    Python UDF) — the whole pass is one whole-stage-codegen projection
    over the scan, no shuffle, no Python. k·dim multiply-adds per row
    is the same FLOP count any BLAS assignment would do."""
    structs = []
    for j, c in enumerate(centroids):
        carr = F.array(*[F.lit(float(x)) for x in c])
        nrm = 0.0
        for x in c:
            nrm += float(x) * float(x)
        d = F.lit(nrm + add_one) - F.lit(2.0) * _dot(F.col(vec_col), carr)
        structs.append(
            F.struct(d.alias("d"), F.lit(j).cast("long").alias("cl"))
        )
    return emb.withColumn("_m", F.array_min(F.array(*structs)))


def kmeans_fit_assign(emb: DataFrame, k: int = 8) -> DataFrame:
    """Deterministic k-means fit (init = embeddings of the k smallest
    valid vec_ids, one Lloyd update with 6-decimal-rounded centroids)
    + the final assignment pass. Returns the input columns plus `_m`
    (struct d=squared L2, cl=cluster). Malformed vectors (NULL /
    ragged / non-finite — valid_vectors) are dropped before any
    arithmetic, like the other numpy/expression vector paths. Driver-
    side collects are the k init rows and the k·dim rounded means —
    bounded by contract."""
    cand = (
        emb.orderBy("vec_id").limit(8 * k).select("vec_id", "embedding").collect()
    )  # bounded over-fetch; validation may discard some
    rows, dim = _valid_rows(cand, vec_idx=1)
    if not rows:
        return emb.limit(0).withColumn(
            "_m",
            F.struct(
                F.lit(0.0).alias("d"), F.lit(0).cast("long").alias("cl")
            ),
        )
    emb = valid_vectors(emb, dim=dim)
    c0 = [[float(x) for x in r.embedding] for r in rows[:k]]
    k = len(c0)
    a1 = kmeans_assign(emb, c0)
    upd = (
        a1.select(
            F.col("_m.cl").alias("cl"),
            F.posexplode(F.col("embedding").cast("array<double>")),
        )
        .groupBy("cl", "pos")
        .agg(F.avg("col").alias("cv"))
        .collect()
    )  # bounded: k*dim rows
    c1 = [[0.0] * len(c0[0]) for _ in range(k)]
    for r in upd:
        c1[r.cl][r.pos] = round(r.cv, 6)
    return kmeans_assign(emb, c1, add_one=1.0)


@register(
    "emb_kmeans",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
         first8 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8),
         c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, v AS c
                FROM first8),
         n0 AS (SELECT cl, c, list_dot_product(c, c) AS nrm FROM c0),
         a1 AS (
           SELECT e.vec_id, e.v,
                  min({'d': n0.nrm - 2 * list_dot_product(e.v, n0.c),
                       'cl': n0.cl}) AS m
           FROM e CROSS JOIN n0
           GROUP BY e.vec_id, e.v),
         u1 AS (
           SELECT cl, pos, round(avg(val), 6) AS cv
           FROM (SELECT m.cl AS cl, unnest(v) AS val,
                        unnest(range(1, len(v) + 1)) AS pos
                 FROM a1)
           GROUP BY cl, pos),
         c1 AS (SELECT cl, list(cv ORDER BY pos) AS c FROM u1 GROUP BY cl),
         n1 AS (SELECT cl, c, list_dot_product(c, c) AS nrm FROM c1),
         a2 AS (
           SELECT e.vec_id,
                  min({'d': n1.nrm + 1.0 - 2 * list_dot_product(e.v, n1.c),
                       'cl': n1.cl}) AS m
           FROM e CROSS JOIN n1
           GROUP BY e.vec_id)
    SELECT vec_id, m.cl AS cluster, round(m.d, 6) AS dist2 FROM a2
    """,
)
def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (k=8) with DETERMINISTIC semantics so the
    whole trajectory is oracle-checkable: init = the embeddings of the
    k smallest vec_ids (no RNG), one Lloyd update with centroid
    coordinates ROUNDED to 6 decimals (pinning the floats both engines
    iterate from — the same discipline as the repo's other float
    oracles), then a final assignment emitting (vec_id, cluster,
    squared L2 distance). The rounding also bounds cross-engine sum-
    order drift in the avg() before it can compound across passes.

    100 TB shape: the scalable half of k-means is exactly what this
    plan does — centroids broadcast (k·dim doubles, KB-size), each
    assignment is a shuffle-free codegen projection over one scan, and
    the update is posexplode → partial-agg groupBy(cluster, pos) whose
    shuffle carries only k·dim partial (sum, count) pairs per
    partition, not vectors. Driver-side collects are the k init rows
    and the k·dim rounded means — bounded by contract, independent of
    row count. More Lloyd passes = repeating the same two stages."""
    a2 = kmeans_fit_assign(table(spark, sf_dir, "embeddings"))
    return a2.select(
        "vec_id",
        F.col("_m.cl").alias("cluster"),
        F.round(F.col("_m.d"), 6).alias("dist2"),
    )


@register(
    "dedup_semantic",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
         first8 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8),
         c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl, v AS c
                FROM first8),
         n0 AS (SELECT cl, c, list_dot_product(c, c) AS nrm FROM c0),
         a1 AS (
           SELECT e.vec_id, e.v,
                  min({'d': n0.nrm - 2 * list_dot_product(e.v, n0.c),
                       'cl': n0.cl}) AS m
           FROM e CROSS JOIN n0
           GROUP BY e.vec_id, e.v),
         u1 AS (
           SELECT cl, pos, round(avg(val), 6) AS cv
           FROM (SELECT m.cl AS cl, unnest(v) AS val,
                        unnest(range(1, len(v) + 1)) AS pos
                 FROM a1)
           GROUP BY cl, pos),
         c1 AS (SELECT cl, list(cv ORDER BY pos) AS c FROM u1 GROUP BY cl),
         n1 AS (SELECT cl, c, list_dot_product(c, c) AS nrm FROM c1),
         a2 AS (
           SELECT e.vec_id, e.v,
                  min({'d': n1.nrm + 1.0 - 2 * list_dot_product(e.v, n1.c),
                       'cl': n1.cl}) AS m
           FROM e CROSS JOIN n1
           GROUP BY e.vec_id, e.v),
         cand AS (
           SELECT a.vec_id AS i, b.vec_id AS j,
                  list_dot_product(a.v, b.v) AS cos
           FROM a2 a JOIN a2 b
             ON a.m.cl = b.m.cl AND a.vec_id < b.vec_id
           WHERE list_dot_product(a.v, b.v) >= 0.35)
    SELECT j AS vec_id, m.i AS kept_id, round(m.c, 6) AS sim
    FROM (SELECT j, min({'i': i, 'c': cos}) AS m FROM cand GROUP BY j) t
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-dedup that bounds
    the pairwise search by k-means cluster — embed, cluster, then
    compare only WITHIN each cluster and drop all but the lowest-id
    member of each cosine-≥τ pair (τ=0.35 here; unit-norm fixture, so
    cosine ≡ dot). Output = the dropped rows with their keeper and the
    similarity that killed them. Clustering is the deterministic
    oracle-checkable kmeans_fit_assign, so the whole pipeline — fit,
    assign, pair, drop — hash-matches the DuckDB replay end-to-end.

    100 TB shape: this is THE trick that makes embedding dedup scale —
    the O(n²) all-pairs never happens; pairs exist only inside a
    cluster (n²/k per cluster in expectation), reached by ONE
    hash-shuffle on cluster id. Skewed/huge clusters are the known
    failure mode; the production knob is raising k (n/k rows per
    cluster stays bounded), and the assignment pass stays shuffle-free
    either way. The final keep-lowest pick is a groupBy on the dropped
    id — same layout the pair join already produced."""
    emb = table(spark, sf_dir, "embeddings")
    a2 = kmeans_fit_assign(emb).select(
        "vec_id",
        F.col("_m.cl").alias("cl"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    i, j = a2.alias("i"), a2.alias("j")
    cos = _dot(F.col("i.v"), F.col("j.v"))
    cand = (
        i.join(
            j,
            (F.col("i.cl") == F.col("j.cl"))
            & (F.col("i.vec_id") < F.col("j.vec_id")),
        )
        .select(
            F.col("i.vec_id").alias("i"),
            F.col("j.vec_id").alias("j"),
            cos.alias("cos"),
        )
        .filter(F.col("cos") >= 0.35)
    )
    best = cand.groupBy("j").agg(
        F.min(F.struct(F.col("i").alias("i"), F.col("cos").alias("c"))).alias(
            "m"
        )
    )
    return best.select(
        F.col("j").alias("vec_id"),
        F.col("m.i").alias("kept_id"),
        F.round(F.col("m.c"), 6).alias("sim"),
    )


# --------------------------------------------------------------------
# MaxSim late interaction (multi-vector retrieval)
# --------------------------------------------------------------------

_MS_SUB = 4  # sub-vectors per embedding
_MS_DIM = 16  # dims per sub-vector (4 x 16 = the fixture's 64)


def _maxsim_oracle() -> str:
    """Programmatically unrolled MaxSim: score = sum over query
    sub-vectors of the max dot product against any candidate
    sub-vector — identical expression shape to the Spark plan so the
    doubles agree bit-for-bit before the final round."""

    def sub(col: str, i: int) -> str:
        lo, hi = i * _MS_DIM + 1, (i + 1) * _MS_DIM
        return f"(CAST({col} AS DOUBLE[]))[{lo}:{hi}]"

    terms = []
    for i in range(_MS_SUB):
        dots = ", ".join(
            f"list_dot_product({sub('q.qe', i)}, {sub('e.embedding', j)})"
            for j in range(_MS_SUB)
        )
        terms.append(f"greatest({dots})")
    score = " + ".join(terms)
    return f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
               WHERE vec_id < 5),
         scored AS (
           SELECT q.qid, e.vec_id, {score} AS score_raw
           FROM q CROSS JOIN embeddings e
           WHERE e.vec_id <> q.qid)
    SELECT qid, vec_id AS neighbor_id, round(score_raw, 6) AS maxsim, rk
    FROM (
        SELECT qid, vec_id, score_raw,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY score_raw DESC, vec_id) AS rk
        FROM scored) t
    WHERE rk <= 5
    """


@register("sim_maxsim", oracle=_maxsim_oracle())
def sim_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (ColBERT-style MaxSim) retrieval: each vector
    is treated as 4 sub-vectors of 16 dims (the fixture is
    single-vector, so sub-vectors are slices — with a true multi-vector
    column the slices become the token vectors); score(q, d) =
    sum over query sub-vectors of the best-matching candidate
    sub-vector. MaxSim rewards local agreement a single pooled dot
    product averages away — the standard retrieval-quality upgrade
    over bi-encoders.

    100 TB shape: same as sim_topk — broadcast the (small by contract)
    query set, stream candidates, per-pair score is a fixed 16-dot
    expression evaluated JVM-side, top-k per query via window rank
    (WindowGroupLimit). The numpy escalation (one batched einsum per
    Arrow batch, exactly sim_topk_pandas' skeleton) applies unchanged
    when the sub-vector count grows."""
    e = table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
        )
    )

    def sub(col, i):
        return F.slice(F.col(col), i * _MS_DIM + 1, _MS_DIM)

    score = None
    for i in range(_MS_SUB):
        best = F.greatest(
            *[_dot(sub("qe", i), sub("embedding", j)) for j in range(_MS_SUB)]
        )
        score = best if score is None else score + best
    scored = (
        q.crossJoin(e)
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", score.alias("score_raw"))
    )
    w = W.partitionBy("qid").orderBy(F.col("score_raw").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 5)
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.round("score_raw", 6).alias("maxsim"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


_RRF_C, _RRF_LEX_K, _RRF_PRF_N, _RRF_SEM_K, _RRF_OUT_K = 60, 20, 3, 20, 10


def _rrf_oracle() -> str:
    from spark_cep_spark.operators.llm_text import bm25_oracle_ctes

    return f"""
    WITH {bm25_oracle_ctes()},
    lex AS (
      SELECT query_id, doc_id, CAST(rk AS BIGINT) AS r_lex
      FROM bm25_ranked WHERE rk <= {_RRF_LEX_K}
    ),
    s AS (
      SELECT vec_id AS doc_id,
             generate_subscripts(embedding, 1) AS i,
             CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                  AS BIGINT) AS si
      FROM embeddings
    ),
    prf AS (
      SELECT lex.query_id, s.i, CAST(sum(s.si) AS BIGINT) AS ci
      FROM lex JOIN s ON s.doc_id = lex.doc_id
      WHERE lex.r_lex <= {_RRF_PRF_N}
      GROUP BY lex.query_id, s.i
    ),
    dots AS (
      SELECT prf.query_id, s.doc_id,
             CAST(sum(prf.ci * s.si) AS BIGINT) AS dot_int
      FROM s JOIN prf ON prf.i = s.i
      GROUP BY prf.query_id, s.doc_id
    ),
    sem AS (
      SELECT query_id, doc_id,
             CAST(row_number() OVER (PARTITION BY query_id
                                     ORDER BY dot_int DESC, doc_id)
                  AS BIGINT) AS r_sem
      FROM dots
      QUALIFY r_sem <= {_RRF_SEM_K}
    ),
    fused AS (
      SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
             coalesce(lex.doc_id, sem.doc_id) AS doc_id,
             lex.r_lex, sem.r_sem,
             round(coalesce(1.0 / ({_RRF_C} + lex.r_lex), 0)
                   + coalesce(1.0 / ({_RRF_C} + sem.r_sem), 0), 6)
               AS rrf
      FROM lex FULL OUTER JOIN sem
        ON lex.query_id = sem.query_id AND lex.doc_id = sem.doc_id
    )
    SELECT query_id,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, doc_id)
                AS BIGINT) AS rk,
           doc_id, rrf, r_lex, r_sem
    FROM fused
    QUALIFY rk <= {_RRF_OUT_K}
    """


@register("sim_rrf_hybrid", oracle=_rrf_oracle())
def sim_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (the standard
    lexical+semantic RAG retriever): for each fixed BM25 query, fuse
    (a) the BM25 top-20 lexical ranking with (b) a semantic ranking
    from pseudo-relevance feedback — the query vector is the sum of
    the BM25 top-3 documents' embeddings (classic PRF: the engine has
    no text-to-vector model, the top lexical hits ARE the semantic
    query), scoring all documents by dot product. Final score per doc
    = Σ 1/(60 + rank_r) over the rankings that retrieved it (RRF,
    Cormack et al.), top-10 emitted with both source ranks.

    Cross-engine determinism is EXACT-INTEGER end to end on the
    semantic side: embedding components scale to round(v·1e6) BIGINTs,
    the PRF vector is an integer SUM (no division — ranking is
    scale-invariant), and every dot product is a BIGINT Σ ci·si
    (|values| ≤ 3e12·64 ≪ 2^63) — both engines rank identical
    integers, no float order anywhere before the final 1/(60+rank)
    arithmetic over small exact ints.

    100 TB shape: the lexical side is bm25_ranked (query-term-bounded
    postings); the PRF vector is 64 BIGINTs per query (broadcast); the
    semantic pass is the brute-force candidate scan — by design here
    (RRF needs a FULL ranking to fuse); swap in sim_ann_ivf/lsh for
    the candidate set at scale, same fusion tail. The fusion itself is
    a (query, doc)-keyed outer join of two top-k tables — trivially
    small."""
    from spark_cep_spark.operators.llm_text import bm25_ranked

    lex = (
        bm25_ranked(spark, sf_dir, _RRF_LEX_K)
        .select("query_id", "doc_id", F.col("rk").alias("r_lex"))
    )
    # malformed vectors (NULL / ragged / non-finite) are dropped before
    # the integer scaling — round(NaN*1e6) cannot cast to BIGINT, and
    # every other vector path applies the same valid_vectors policy
    e = valid_vectors(table(spark, sf_dir, "embeddings"))
    s = e.select(
        F.col("vec_id").alias("doc_id"),
        F.posexplode("embedding").alias("i0", "v"),
    ).select(
        "doc_id",
        (F.col("i0") + 1).alias("i"),  # 1-based like generate_subscripts
        F.round(F.col("v").cast("double") * 1_000_000)
        .cast("long")
        .alias("si"),
    )
    prf = (
        lex.filter(F.col("r_lex") <= _RRF_PRF_N)
        .join(s, "doc_id")
        .groupBy("query_id", "i")
        .agg(F.sum("si").cast("long").alias("ci"))
    )
    dots = (
        s.join(F.broadcast(prf), "i")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("ci") * F.col("si")).cast("long").alias("dot_int"))
    )
    wsem = W.partitionBy("query_id").orderBy(
        F.col("dot_int").desc(), "doc_id"
    )
    sem = (
        dots.select(
            "query_id",
            "doc_id",
            F.row_number().over(wsem).cast("long").alias("r_sem"),
        )
        .filter(F.col("r_sem") <= _RRF_SEM_K)
    )
    fused = (
        lex.withColumnRenamed("query_id", "lq")
        .withColumnRenamed("doc_id", "ld")
        .join(
            sem.withColumnRenamed("query_id", "sq").withColumnRenamed(
                "doc_id", "sd"
            ),
            (F.col("lq") == F.col("sq")) & (F.col("ld") == F.col("sd")),
            "full_outer",
        )
        .select(
            F.coalesce("lq", "sq").alias("query_id"),
            F.coalesce("ld", "sd").alias("doc_id"),
            "r_lex",
            "r_sem",
            F.round(
                F.coalesce(
                    1.0 / (_RRF_C + F.col("r_lex")), F.lit(0.0)
                )
                + F.coalesce(
                    1.0 / (_RRF_C + F.col("r_sem")), F.lit(0.0)
                ),
                6,
            ).alias("rrf"),
        )
    )
    wout = W.partitionBy("query_id").orderBy(F.col("rrf").desc(), "doc_id")
    return (
        fused.select(
            "query_id",
            F.row_number().over(wout).cast("long").alias("rk"),
            "doc_id",
            "rrf",
            "r_lex",
            "r_sem",
        )
        .filter(F.col("rk") <= _RRF_OUT_K)
    )


@register(
    "emb_covariance",
    oracle="""
    WITH u AS (
      SELECT vec_id, s.i AS i, s.xi AS xi
      FROM (
        SELECT vec_id,
               unnest(list_transform(
                 range(0, len(embedding)),
                 k -> {'i': k,
                       'xi': CAST(floor(CAST(embedding[k + 1] AS DOUBLE)
                                        * 1000 + 0.5) AS BIGINT)}
               )) AS s
        FROM embeddings WHERE embedding IS NOT NULL
      )
    ),
    p AS (
      SELECT u1.i AS i, u2.i AS j,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(u1.xi) AS BIGINT) AS sxi,
             CAST(sum(u2.xi) AS BIGINT) AS sxj,
             CAST(sum(u1.xi * u2.xi) AS BIGINT) AS sxy
      FROM u u1 JOIN u u2
        ON u1.vec_id = u2.vec_id AND u1.i <= u2.i
      GROUP BY u1.i, u2.i
    )
    SELECT i, j,
           -- + 0.0 folds IEEE -0.0 (tiny negative covariances round to
           -- the negative zero) to +0.0 — STANDING ORACLE RULE 4
           round((n * sxy - sxi * sxj) * 1.0 / n / n / 1e6, 6) + 0.0 AS cov
    FROM p
    """,
)
def emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population covariance matrix of the embedding dimensions — the
    d x d summary behind whitening, PCA initialisation, and
    drift-vs-reference monitoring of an embedding pipeline. Emitted as
    (i, j, cov) upper-triangle rows (d=64 -> 2080 rows), never an
    array column.

    Exact-integer discipline across engines: each float32 component is
    quantised to a BIGINT (floor(x*1000 + 0.5) — identical
    round-half-up on both sides), so every partial sum (Sx_i, Sx_i*x_j,
    n) is EXACT integer arithmetic; the single final expression
    (n*Sxy - Sx_i*Sx_j)/n^2/1e6 is the same IEEE op chain on both
    engines. No accumulation-order noise by construction. (At 1e13+
    rows the int64 Sxy headroom runs out — switch the partials to
    float64 and accept ~1e-9 noise, or widen to decimal.)

    Scale: the d^2 blow-up happens INSIDE each Arrow batch as one BLAS
    X^T.X (mapInPandas) — the shuffle moves only (num_partitions x
    d^2) partial rows, then one tiny hash aggregation. The oracle's
    n*d self-join topology is precisely what this plan avoids."""
    import numpy as np

    # valid_vectors(dim=64): np.stack dies on ragged/None vectors; the
    # driver fixture is clean so the oracle's IS NOT NULL matches.
    e = valid_vectors(
        table(spark, sf_dir, "embeddings").select("embedding"), dim=64
    )
    d_schema = (
        "n long, sx array<long>, sxy array<long>"
    )

    def partials(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["embedding"].to_numpy())
            q = np.floor(m.astype(np.float64) * 1000 + 0.5).astype(
                np.int64
            )
            yield pd.DataFrame(
                {
                    "n": [int(q.shape[0])],
                    "sx": [q.sum(axis=0).tolist()],
                    "sxy": [(q.T @ q).ravel().tolist()],
                }
            )

    p = e.mapInPandas(partials, d_schema)
    flat = p.select(
        "n",
        F.posexplode("sxy").alias("idx", "pxy"),
        F.col("sx"),
    ).select(
        "n",
        "idx",
        "pxy",
        F.element_at("sx", (F.col("idx") / 64).cast("int") + 1).alias("pi"),
        F.element_at("sx", (F.col("idx") % 64).cast("int") + 1).alias("pj"),
    )
    g = flat.groupBy("idx").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("pxy").cast("long").alias("sxy"),
        F.sum("pi").cast("long").alias("sxi"),
        F.sum("pj").cast("long").alias("sxj"),
    )
    return (
        g.select(
            (F.col("idx") / 64).cast("long").alias("i"),
            (F.col("idx") % 64).cast("long").alias("j"),
            (
                F.round(
                    (F.col("n") * F.col("sxy") - F.col("sxi") * F.col("sxj"))
                    * 1.0
                    / F.col("n")
                    / F.col("n")
                    / 1e6,
                    6,
                )
                # + 0.0 normalizes IEEE signed zero (RULE 4, registry.py)
                + F.lit(0.0)
            ).alias("cov"),
        )
        .filter(F.col("i") <= F.col("j"))
    )


@register(
    "sim_mmr_rerank",
    oracle="""
    WITH RECURSIVE
    qv AS (
      SELECT vec_id AS qid,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
             ) AS v
      FROM embeddings WHERE vec_id < 8 AND embedding IS NOT NULL
    ),
    cv AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
             ) AS v
      FROM embeddings WHERE vec_id >= 8 AND embedding IS NOT NULL
    ),
    rel AS (
      SELECT qid, vec_id, v, ip,
             row_number() OVER (PARTITION BY qid
                                ORDER BY ip DESC, vec_id) AS rk
      FROM (
        SELECT q.qid, c.vec_id, c.v,
               CAST(list_sum(list_transform(range(1, len(q.v) + 1),
                    k -> q.v[k] * c.v[k])) AS BIGINT) AS ip
        FROM qv q, cv c
      )
    ),
    cand AS (SELECT qid, vec_id, v, ip FROM rel WHERE rk <= 32),
    pair AS (
      SELECT a.qid, a.vec_id AS a_id, b.vec_id AS b_id,
             CAST(list_sum(list_transform(range(1, len(a.v) + 1),
                  k -> a.v[k] * b.v[k])) AS BIGINT) AS ip
      FROM cand a JOIN cand b
        ON a.qid = b.qid AND a.vec_id <> b.vec_id
    ),
    sel AS (
      SELECT qid, 0 AS step, CAST([] AS BIGINT[]) AS picked FROM qv
      UNION ALL
      SELECT sel.qid, sel.step + 1,
             list_append(sel.picked, (
               SELECT c.vec_id FROM cand c
               WHERE c.qid = sel.qid
                 AND NOT list_contains(sel.picked, c.vec_id)
               ORDER BY 7 * c.ip - 3 * coalesce((
                         SELECT max(p.ip) FROM pair p
                         WHERE p.qid = c.qid AND p.a_id = c.vec_id
                           AND list_contains(sel.picked, p.b_id)), 0)
                        DESC,
                        c.vec_id
               LIMIT 1))
      FROM sel WHERE sel.step < 5
    )
    SELECT s.qid, CAST(s.step AS BIGINT) AS rank,
           s.picked[s.step] AS vec_id,
           round((7 * c.ip - 3 * coalesce((
                    SELECT max(p.ip) FROM pair p
                    WHERE p.qid = s.qid AND p.a_id = s.picked[s.step]
                      AND list_contains(
                            list_slice(s.picked, 1, s.step - 1), p.b_id)),
                    0)) / 1e7, 6) AS mmr
    FROM sel s JOIN cand c
      ON c.qid = s.qid AND c.vec_id = s.picked[s.step]
    WHERE s.step >= 1
    """,
)
def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance reranking — the standard RAG
    diversification step: per query (vec_id < 8), fetch the top-32
    most-relevant candidates, then greedily select 5 maximising
    0.7*relevance - 0.3*max-similarity-to-already-selected (scored as
    the integer 7*rel - 3*maxsim; DuckDB parses 0.7 as exact DECIMAL,
    so the only way both engines agree bit-for-bit is to keep the
    score in integers and divide once at output), so near-
    duplicate passages don't crowd the context window.

    Cross-engine exactness: components quantise to BIGINTs
    (floor(x*1000+0.5), the emb_covariance convention), every dot
    product is a sum of integers < 2^53 — EXACT in either engine's
    arithmetic regardless of accumulation order — and the greedy
    argmax chain (the fragile part: one flipped comparison reorders
    every later pick) therefore runs on identical doubles; ties break
    on vec_id. The oracle replays the same greedy walk with a
    recursive CTE.

    Scale shape: queries broadcast (bounded by contract); relevance is
    one candidate scan with codegen'd integer dots; MMR itself only
    ever touches m=32 candidates per query (m^2 pair sims inside an
    Arrow batch), so reranking cost is independent of corpus size —
    the pruned-candidate structure IS the scale story."""
    import numpy as np

    # ragged/NaN guard for the Arrow->numpy kernel; no-op on the clean
    # driver fixture, so the oracle's IS NOT NULL filter is equivalent.
    e = valid_vectors(table(spark, sf_dir, "embeddings"), dim=64)
    qz = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1000 + 0.5).cast("long"),
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("qid"), qz.alias("qv")
        )
    )
    c = e.filter(F.col("vec_id") >= 8).select("vec_id", qz.alias("cv"))
    ip = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    scored = q.crossJoin(c).select("qid", "vec_id", "cv", ip.alias("ip"))
    w = W.partitionBy("qid").orderBy(F.col("ip").desc(), F.col("vec_id"))
    cand = (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 32)
        .select("qid", "vec_id", "cv", "ip")
    )

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id", kind="mergesort")
        ids = pdf["vec_id"].to_numpy()
        rel = pdf["ip"].to_numpy().astype(np.int64)
        m = np.stack(pdf["cv"].to_numpy()).astype(np.int64)
        sims = m @ m.T
        picked: list[int] = []
        rows = []
        for step in range(1, min(5, len(ids)) + 1):
            best = None
            for i in range(len(ids)):
                if i in picked:
                    continue
                maxip = (
                    int(max(sims[i][j] for j in picked)) if picked else 0
                )
                score = 7 * int(rel[i]) - 3 * maxip
                key = (-score, ids[i])
                if best is None or key < best[0]:
                    best = (key, i, score)
            _, bi, bscore = best
            picked.append(bi)
            rows.append(
                (
                    int(pdf["qid"].iloc[0]),
                    step,
                    int(ids[bi]),
                    bscore / 1e7,
                )
            )
        return pd.DataFrame(
            rows, columns=["qid", "rank", "vec_id", "mmr_raw"]
        )

    out = cand.groupBy("qid").applyInPandas(
        mmr, "qid long, rank long, vec_id long, mmr_raw double"
    )
    # round JVM-side: F.round is HALF_UP like the oracle's round();
    # Python's round() is banker's and flips ...5 boundaries.
    return out.select(
        "qid", "rank", "vec_id", F.round("mmr_raw", 6).alias("mmr")
    )


@register(
    "emb_outlier",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)
             ) AS v
      FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64
    ),
    u AS (
      SELECT s.i AS i, s.xi AS xi FROM (
        SELECT unnest(list_transform(range(0, len(v)),
                 k -> {'i': k, 'xi': v[k + 1]})) AS s
        FROM q
      )
    ),
    stats AS (
      SELECT i,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(xi) AS BIGINT) AS sx,
             CAST(sum(xi * xi) AS BIGINT) AS sxx
      FROM u GROUP BY i
    ),
    dims AS (
      SELECT i, n, sx,
             CAST(n * sxx - sx * sx AS DOUBLE) / n / n AS var_
      FROM stats
    ),
    dimlists AS (
      SELECT list(n ORDER BY i) AS ns,
             list(sx ORDER BY i) AS sxs,
             list(var_ ORDER BY i) AS vars
      FROM dims
    ),
    scored AS (
      SELECT q.vec_id,
             round(list_sum(list_transform(range(0, 64), k ->
               CASE WHEN vars[k + 1] > 1e-12
                    THEN (CAST(q.v[k + 1] * ns[k + 1] - sxs[k + 1]
                               AS DOUBLE) / ns[k + 1])
                         * (CAST(q.v[k + 1] * ns[k + 1] - sxs[k + 1]
                                 AS DOUBLE) / ns[k + 1])
                         / vars[k + 1]
                    ELSE 0.0 END)), 6) AS score
      FROM q, dimlists
    )
    SELECT vec_id, score, rk FROM (
      SELECT vec_id, score,
             row_number() OVER (ORDER BY score DESC, vec_id) AS rk
      FROM scored) t
    WHERE rk <= 50
    """,
)
def emb_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding outlier census — diagonal-Mahalanobis distance of
    each vector from the corpus centroid (sum over dims of
    ((x_i - mean_i)/std_i)^2), top-50. The standard screen for
    corrupt/degenerate embeddings (encoder failures, zero vectors,
    scale drift) before they poison ANN indexes or SemDeDup clusters.

    Exactness: per-dim moments are exact BIGINTs on quantised
    components (the emb_covariance convention); the per-dim z^2 terms
    are the same IEEE op chain on both engines and are summed in DIM
    ORDER (F.aggregate and list_sum both fold left-to-right), so the
    64-term accumulation is order-identical — then rounded, and the
    top-50 rank runs on the ROUNDED score with vec_id ties.

    Scale: one partial-combinable aggregation for the 64 moment rows,
    broadcast back as a literal array (centroid-as-literal, the
    emb_kmeans pattern), one codegen'd projection pass, TakeOrdered
    top-50. No self-join, no window over the full table."""
    e = valid_vectors(
        table(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        dim=64,
    )
    qz = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1000 + 0.5).cast("long"),
    )
    q = e.select("vec_id", qz.alias("v"))
    u = q.select(F.posexplode("v").alias("i", "xi"))
    stats = (
        u.groupBy("i")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("xi").cast("long").alias("sx"),
            F.sum(F.col("xi") * F.col("xi")).cast("long").alias("sxx"),
        )
        .collect()
    )  # bounded: exactly 64 moment rows (d is fixed by contract)
    byd = {r["i"]: r for r in stats}
    ns = [int(byd[i]["n"]) for i in range(64)]
    sxs = [int(byd[i]["sx"]) for i in range(64)]
    vars_ = [
        (byd[i]["n"] * byd[i]["sxx"] - byd[i]["sx"] * byd[i]["sx"])
        * 1.0
        / byd[i]["n"]
        / byd[i]["n"]
        for i in range(64)
    ]
    n_arr = F.array(*[F.lit(x) for x in ns])
    sx_arr = F.array(*[F.lit(x) for x in sxs])
    var_arr = F.array(*[F.lit(x) for x in vars_])

    # z_k^2 = ((x_k*n - sx)/n)^2 / var, summed left-to-right over dims
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(63)),
        F.lit(0.0),
        lambda acc, k: acc
        + F.when(
            F.element_at(var_arr, k + 1) > 1e-12,
            (
                (
                    F.element_at(F.col("v"), k + 1)
                    * F.element_at(n_arr, k + 1)
                    - F.element_at(sx_arr, k + 1)
                )
                * 1.0
                / F.element_at(n_arr, k + 1)
            )
            * (
                (
                    F.element_at(F.col("v"), k + 1)
                    * F.element_at(n_arr, k + 1)
                    - F.element_at(sx_arr, k + 1)
                )
                * 1.0
                / F.element_at(n_arr, k + 1)
            )
            / F.element_at(var_arr, k + 1),
        ).otherwise(F.lit(0.0)),
    )
    scored = q.select("vec_id", F.round(score, 6).alias("score"))
    w = W.orderBy(F.col("score").desc(), F.col("vec_id"))
    return (
        scored.orderBy(F.col("score").desc(), F.col("vec_id"))
        .limit(50)
        .withColumn("rk", F.row_number().over(w).cast("long"))
    )


@register(
    "sim_range_search",
    oracle="""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qe FROM embeddings
      WHERE vec_id < 10
    ),
    scored AS (
      SELECT q.qid, e.vec_id,
             list_dot_product(CAST(q.qe AS DOUBLE[]),
                              CAST(e.embedding AS DOUBLE[])) AS sim_raw
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.qid
    )
    SELECT qid, vec_id AS neighbor_id, round(sim_raw, 6) AS sim
    FROM scored
    WHERE round(sim_raw, 6) >= 0.35
    """,
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius (range) similarity search — ALL candidates with cosine
    >= tau (0.35) per query, the epsilon-neighborhood query that
    complements sim_topk's k-NN (dedup wants "everything closer than
    tau", not "the 10 closest"). Threshold applied to the ROUNDED
    score so an ulp of engine noise cannot flip membership at the
    boundary.

    Scale: same broadcast-queries x candidate-scan shape as sim_topk,
    but with NO window at all — the filter composes with the scan and
    the output is bounded by the data's neighborhood density, not by
    a rank. The LSH/IVF candidate pruning (sim_ann_*) slots in front
    unchanged when the corpus outgrows the full scan."""
    e = table(spark, sf_dir, "embeddings")
    q = F.broadcast(
        e.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
        )
    )
    scored = (
        q.crossJoin(e)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("qe"), F.col("embedding")), 6
            ).alias("sim"),
        )
    )
    return scored.filter(F.col("sim") >= 0.35)


class IvfIndex:
    """Persistent IVF index — the build-once / query-many surface the
    per-call `topk_ivf` lacks (a production vector store amortises the
    KMeans fit and cell assignment across thousands of queries).

    Layout on disk (plain parquet, no side formats):
      <path>/cells/        candidate rows partitioned BY CELL — a
                           query probing nprobe cells triggers a
                           PARTITION-PRUNED scan (plan-test-pinned):
                           the other cells' files are never listed,
                           which is the whole point at 100 TB
      <path>/centroids/    (cell, centroid array) — n_cells rows, the
                           broadcast-sized routing table

    Query = route each query to its nprobe nearest centroids
    (driver-side over the tiny centroid table), partition-pruned scan
    of exactly those cells, exact rescoring, per-query top-k. Same
    deterministic contract as topk_ivf (seeded KMeans, rank on
    (sim desc, id)); build+query equals the one-shot topk_ivf
    bit-for-bit."""

    def __init__(self, spark: SparkSession, path: str,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.vec_col = vec_col

    @staticmethod
    def build(
        spark: SparkSession,
        candidates: DataFrame,
        path: str,
        n_cells: int = 16,
        seed: int = 7,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfIndex":
        import os

        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        probe = (
            valid_vectors(candidates, vec_col)
            .groupBy(F.size(vec_col).alias("d"))
            .count()
            .orderBy(F.desc("count"), "d")
            .first()
        )
        if probe is None:
            raise ValueError("no valid vectors to index")
        candidates = valid_vectors(candidates, vec_col, probe.d)
        cand_vec = candidates.select(
            id_col,
            vec_col,
            array_to_vector(
                F.col(vec_col).cast("array<double>")
            ).alias("_fv"),
        )
        model = KMeans(
            k=n_cells, seed=seed, featuresCol="_fv", predictionCol="cell"
        ).fit(cand_vec.select("_fv"))
        (
            model.transform(cand_vec)
            .select(id_col, vec_col, "cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(os.path.join(path, "cells"))
        )
        centers = [
            (int(i), [float(x) for x in c])
            for i, c in enumerate(model.clusterCenters())
        ]
        _write_tiny_table(
            spark, centers, "cell int, centroid array<double>",
            os.path.join(path, "centroids"),
        )
        return IvfIndex(spark, path, id_col, vec_col)

    @staticmethod
    def load(spark: SparkSession, path: str,
             id_col: str = "vec_id", vec_col: str = "embedding") -> "IvfIndex":
        return IvfIndex(spark, path, id_col, vec_col)

    def query(
        self, queries: DataFrame, k: int = 10, nprobe: int = 4
    ) -> DataFrame:
        import os

        import numpy as np

        # routing table: n_cells rows — bounded driver collect
        cents = (
            self.spark.read.parquet(os.path.join(self.path, "centroids"))
            .orderBy("cell")
            .collect()
        )
        C = np.array([r["centroid"] for r in cents], dtype=np.float64)
        cells = [int(r["cell"]) for r in cents]
        qrows, dim = _valid_rows(
            queries.select(self.id_col, self.vec_col).collect()
        )
        if not qrows or C.shape[0] == 0:
            return self.spark.createDataFrame(
                [], "qid long, neighbor_id long, sim double, rk long"
            )
        qmat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
        d2 = ((qmat[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        near = np.argsort(d2, axis=1)[:, :nprobe]
        route = [
            (int(r[0]), [float(x) for x in r[1]], cells[int(ci)])
            for r, row in zip(qrows, near)
            for ci in row
        ]
        qb = self.spark.createDataFrame(
            route, "qid long, qe array<double>, cell int"
        )
        probed = sorted({c for _, _, c in route})
        cand = self.spark.read.parquet(
            os.path.join(self.path, "cells")
        ).filter(F.col("cell").isin(probed))  # partition-pruned scan
        scored = (
            qb.join(cand, "cell")
            .filter(F.col(self.id_col) != F.col("qid"))
            .select(
                "qid",
                F.col(self.id_col).alias("neighbor_id"),
                _dot(F.col("qe"), F.col(self.vec_col)).alias("sim_raw"),
            )
        )
        w = W.partitionBy("qid").orderBy(
            F.col("sim_raw").desc(), F.col("neighbor_id")
        )
        return (
            scored.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= k)
            .select(
                "qid",
                "neighbor_id",
                F.round("sim_raw", 6).alias("sim"),
                "rk",
            )
        )


def _pca_power_partials(spark: SparkSession, sf_dir: str, dim: int = 64):
    """Distributed exact-integer second-moment partials for PCA: one
    (n, sx[d], sxy[d*d]) row per Arrow batch (the emb_covariance
    quantisation — floor(x*1000+0.5) int64 — so the aggregate is
    accumulation-order-free), reduced to a SINGLE global row."""
    import numpy as np

    e = valid_vectors(
        table(spark, sf_dir, "embeddings").select("embedding"), dim=dim
    )

    def partials(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            m = np.stack(pdf["embedding"].to_numpy())
            q = np.floor(m.astype(np.float64) * 1000 + 0.5).astype(
                np.int64
            )
            yield pd.DataFrame(
                {
                    "n": [int(q.shape[0])],
                    "sx": [q.sum(axis=0).tolist()],
                    "sxy": [(q.T @ q).ravel().tolist()],
                }
            )

    p = e.mapInPandas(partials, "n long, sx array<long>, sxy array<long>")
    # ONE sum over posexploded (idx, val) rows — slot 0 is n, slots
    # 1..d are sx, slots d+1..d+d^2 are sxy.  The previous spelling
    # (one F.sum per array element: 4,161 aggregate expressions for
    # d=64) cost ~25 s of pure Catalyst planning/codegen on a
    # millisecond of data; exploding to narrow rows plans ONE
    # aggregate and the map-side partial agg collapses each task to
    # <= d^2+d+1 rows before the (only) shuffle — the emb_covariance
    # shape.  Integer sums are associative, so the reduced values are
    # bit-identical to the wide-aggregate spelling.
    flat = p.select(
        F.posexplode(
            F.concat(F.array(F.col("n")), F.col("sx"), F.col("sxy"))
        ).alias("idx", "val")
    )
    # bounded-by-contract collect: exactly d^2 + d + 1 int64 rows
    # (d=64 -> ~33 KB) — the model-sized result of the distributed
    # pass, same class as the kmeans centroid collect
    slots = [0] * (1 + dim + dim * dim)
    for r in flat.groupBy("idx").agg(F.sum("val").alias("s")).collect():
        slots[r["idx"]] = r["s"] or 0
    n = slots[0]
    if not n:  # zero valid vectors (empty/degenerate table)
        return 0, np.zeros((dim, dim))
    sx = np.array(slots[1 : 1 + dim], dtype=np.float64)
    sxy = np.array(slots[1 + dim :], dtype=np.float64).reshape(dim, dim)
    cov = (n * sxy - np.outer(sx, sx)) / (n * n * 1e6)
    return n, cov


def pca_power_top_component(cov, iters: int = 1000):
    """Deterministic power iteration for the top eigenpair of a small
    dense covariance: fixed all-ones init, fixed iteration count (1000 — enough for
    eigen-gaps down to ~0.5% at 1e-4 accuracy),
    first-nonzero-positive sign convention — same ints in, same
    floats out on every machine (no RNG, no convergence branch)."""
    import numpy as np

    dim = cov.shape[0]
    v = np.ones(dim, dtype=np.float64) / np.sqrt(dim)
    for _ in range(iters):
        w = cov @ v
        nrm = float(np.linalg.norm(w))
        if nrm == 0.0:
            break
        v = w / nrm
    for x in v:
        if x != 0.0:
            if x < 0.0:
                v = -v
            break
    lam = float(v @ cov @ v)
    return v, lam


@register("emb_pca_power")
def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding cloud by distributed
    power iteration: Spark reduces the corpus to ONE exact-integer
    second-moment row (the same mapInPandas BLAS partials as
    emb_covariance — the shuffle carries d^2 ints per partition, never
    vectors), the d x d covariance is rebuilt exactly, and the 64x64
    power iteration runs where a 33 KB matrix belongs — in the driver,
    deterministically (fixed init/iterations/sign). Output: one row
    per dimension (i, loading, eigval, explained) — the PCA drift/
    whitening primitive for embedding pipelines. Rows-only by nature
    (an eigenvector has no SQL spelling); the checker's quality probe
    (pca_quality_probe) gates |cos| vs numpy's eigh at 0.9999 and the
    pytest property suite pins Rayleigh dominance + determinism."""
    import numpy as np

    n, cov = _pca_power_partials(spark, sf_dir)
    v, lam = pca_power_top_component(cov)
    total_var = float(np.trace(cov))
    explained = lam / total_var if total_var > 0 else 0.0
    rows = [
        (i, round(float(v[i]), 9), round(lam, 9), round(explained, 9))
        for i in range(cov.shape[0])
    ]
    return spark.createDataFrame(
        rows, "i int, loading double, eigval double, explained double"
    )


def pca_quality_probe(spark: SparkSession, sf_dir: str):
    """check_oracle rows-only gate: |cos(power-iteration v, eigh v)|
    must exceed 0.9999 on the fixture covariance. Returns (cos, 1.0)
    shaped like the ANN recall probes."""
    import numpy as np

    _n, cov = _pca_power_partials(spark, sf_dir)
    v, _lam = pca_power_top_component(cov)
    wvals, wvecs = np.linalg.eigh(cov)
    ref = wvecs[:, -1]
    return abs(float(v @ ref)), 1.0


def topk_matmul_arrow(
    spark: SparkSession,
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """topk_matmul's zero-copy sibling: mapInArrow instead of
    mapInPandas. The pandas path pays `np.array(list(column))` — a
    per-row list materialization — to build the (C, D) matrix; here
    the Arrow ListArray's flat values buffer reshapes into the matrix
    directly (one allocation for the float32→float64 widening, zero
    per-row work). Bit-identical output (same BLAS matmul, same
    partial-then-global top-k); measured ~12% faster end-to-end at
    sf0.1 and the gap grows with candidate count — this is the
    variant bench.py's knn headline runs."""
    import numpy as np
    import pyarrow as pa

    qrows, dim = _valid_rows(queries.select(id_col, vec_col).collect())
    if not qrows:
        return spark.createDataFrame(
            [], "qid long, neighbor_id long, sim double, rk long"
        )
    candidates = valid_vectors(candidates, vec_col, dim)
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)
    bq = spark.sparkContext.broadcast((qids, qmat))

    def score(batches):
        ids, mat = bq.value
        mt = mat.T
        for b in batches:
            cand_ids = (
                b.column(id_col)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64, copy=False)
            )
            col = b.column(vec_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = col.flatten().to_numpy(zero_copy_only=False)
            cmat = flat.reshape(len(cand_ids), dim).astype(
                np.float64, copy=False
            )
            sims = cmat @ mt
            for j in range(len(ids)):
                cs = sims[:, j]
                mask = cand_ids != ids[j]
                cids, csims = cand_ids[mask], cs[mask]
                if len(cids) > k:
                    idx = np.argpartition(-csims, k)[:k]
                    cids, csims = cids[idx], csims[idx]
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.full(len(cids), ids[j]), pa.int64()),
                        pa.array(cids, pa.int64()),
                        pa.array(csims, pa.float64()),
                    ],
                    ["qid", "neighbor_id", "sim_raw"],
                )

    partial = candidates.select(id_col, vec_col).mapInArrow(
        score, "qid long, neighbor_id long, sim_raw double"
    )
    w = W.partitionBy("qid").orderBy(
        F.col("sim_raw").desc(), F.col("neighbor_id")
    )
    return (
        partial.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(
            "qid", "neighbor_id", F.round("sim_raw", 6).alias("sim"), "rk"
        )
    )


@register(
    "sim_topk_arrow",
    # identical semantics (and oracle) to sim_topk / sim_topk_pandas
    oracle="""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
         scored AS (
           SELECT q.qid, e.vec_id,
                  list_dot_product(CAST(q.qe AS DOUBLE[]),
                                   CAST(e.embedding AS DOUBLE[])) AS sim_raw
           FROM q CROSS JOIN embeddings e
           WHERE e.vec_id <> q.qid
         )
    SELECT qid, vec_id AS neighbor_id, round(sim_raw, 6) AS sim, rk FROM (
      SELECT qid, vec_id, sim_raw,
             row_number() OVER (PARTITION BY qid
                                ORDER BY sim_raw DESC, vec_id) AS rk
      FROM scored) t
    WHERE rk <= 10
    """,
)
def sim_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered face of topk_matmul_arrow (same queries and oracle
    as sim_topk/sim_topk_pandas — three implementations, one
    semantics: codegen'd F.aggregate fold, pandas BLAS, Arrow
    zero-copy BLAS)."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return topk_matmul_arrow(spark, q, e, k=10)


def topk_ivfpq(
    spark: SparkSession,
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    n_sub: int = 8,
    n_codes: int = 16,
    shortlist: int = 50,
    seed: int = 7,
    train_cap: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via IVF + PQ composed — the FAISS IVFPQ
    serving shape (Jégou et al 2011): the coarse quantizer bounds
    WHICH candidates are touched (nprobe of n_cells KMeans cells),
    the product quantizer bounds the BYTES per touched candidate
    (ADC over n_sub codeword ids instead of the raw vector), and the
    per-query shortlist is exactly re-ranked against the raw vectors
    so returned sims are exact — only the shortlist is approximate,
    the same contract as topk_lsh/topk_ivf/topk_pq.

    Distributed shape: ONE KMeans fit (seeded, sample-trainable) +
    one bounded codebook train; candidates carry a `cell` column;
    queries broadcast with their ADC tables AND their probed-cell
    sets; one mapInPandas pass scores each candidate batch against
    only the queries probing its cells; global shortlist window; one
    id equi-join re-ranks. At 100 TB: the scan touches nprobe/n_cells
    of the corpus and 8 bytes per touched row — multiplicative
    savings, which is why this is the standard billion-scale layout.
    Simplification vs the paper: PQ encodes raw vectors, not
    cell residuals (documented; residual encoding is a second
    broadcast of the centers away)."""
    import numpy as np

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    qrows, dim = _valid_rows(queries.select(id_col, vec_col).collect())
    if not qrows:
        return spark.createDataFrame(
            [], "qid long, neighbor_id long, sim double, rk long"
        )
    candidates = valid_vectors(candidates, vec_col, dim)

    cand_vec = candidates.select(
        id_col,
        vec_col,
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("_fv"),
    )
    model = KMeans(
        k=n_cells, seed=seed, featuresCol="_fv", predictionCol="cell"
    ).fit(cand_vec.select("_fv"))
    cb = model.transform(cand_vec).select(id_col, vec_col, "cell")
    centers = np.array(model.clusterCenters())  # (n_cells, D)

    sample_rows = (
        candidates.select(vec_col).orderBy(id_col).limit(train_cap).collect()
    )
    sample = np.array([r[0] for r in sample_rows], dtype=np.float64)
    books = _train_codebooks(sample, n_sub, n_codes, seed)

    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([r[1] for r in qrows], dtype=np.float64)  # (Q, D)
    dsub = qmat.shape[1] // n_sub
    tables = np.einsum(
        "qsd,scd->qsc", qmat.reshape(len(qids), n_sub, dsub), books
    )
    # per-query probed cells (nearest centers by euclidean — the
    # KMeans metric), computed once on the bounded query set
    d2c = ((qmat[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
    probed = np.argsort(d2c, axis=1)[:, :nprobe]  # (Q, nprobe)
    bc = spark.sparkContext.broadcast((qids, tables, books, probed))

    def adc_scan(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        ids, tabs, bks, prb = bc.value
        sub_idx = np.arange(n_sub)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cand_ids = pdf[id_col].to_numpy(dtype=np.int64)
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            cmat = np.array(list(pdf[vec_col]), dtype=np.float64)
            csub = cmat.reshape(len(pdf), n_sub, dsub)
            d2 = ((csub[:, :, None, :] - bks[None, :, :, :]) ** 2).sum(-1)
            codes = d2.argmin(-1)  # (C, n_sub)
            out = []
            for j in range(len(ids)):
                # IVF gate: only candidates in this query's probed cells
                mask = np.isin(cells, prb[j]) & (cand_ids != ids[j])
                if not mask.any():
                    continue
                cids = cand_ids[mask]
                approx = tabs[j][sub_idx[None, :], codes[mask]].sum(1)
                if len(cids) > shortlist:
                    idx = np.argpartition(-approx, shortlist)[:shortlist]
                    cids, approx = cids[idx], approx[idx]
                out.append(
                    pd.DataFrame(
                        {"qid": ids[j], "neighbor_id": cids, "approx": approx}
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = cb.mapInPandas(
        adc_scan, "qid long, neighbor_id long, approx double"
    )
    wa = W.partitionBy("qid").orderBy(
        F.col("approx").desc(), F.col("neighbor_id")
    )
    short = (
        partial.withColumn("ra", F.row_number().over(wa))
        .filter(F.col("ra") <= shortlist)
        .select("qid", "neighbor_id")
    )
    qdf = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("qe"),
    )
    rescored = (
        short.join(
            candidates.select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("ce"),
            ),
            "neighbor_id",
        )
        .join(F.broadcast(qdf), "qid")
        .select(
            "qid",
            "neighbor_id",
            _dot(F.col("qe"), F.col("ce")).alias("sim_raw"),
        )
    )
    w = W.partitionBy("qid").orderBy(
        F.col("sim_raw").desc(), F.col("neighbor_id")
    )
    return (
        rescored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("qid", "neighbor_id", F.round("sim_raw", 6).alias("sim"), "rk")
    )


@register("sim_ann_ivfpq")  # approximate shortlist → rows-only
def sim_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composed ANN over the fixture (same queries as sim_topk)
    — the billion-scale serving layout. Recall contract asserted on
    planted near-duplicates (tests + check_oracle's rows-only gate);
    returned sims are exact (shortlist re-ranked)."""
    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    return topk_ivfpq(spark, q, e, k=10)


class IvfPqIndex:
    """Persistent IVF×PQ index — the production ending of
    `topk_ivfpq` (round-8 verdict item 4): quantizers are trained and
    the corpus encoded ONCE, then the stored index serves queries and
    absorbs appends without rebuild — the FAISS IVFADC serving layout
    (Jégou et al 2011) on plain parquet.

    Layout (no side formats):
      <path>/cells/      (vec_id, embedding, codes) partitioned BY
                         CELL.  A query probing nprobe cells triggers
                         a PARTITION-PRUNED scan (plan-test-pinned);
                         the ADC pass selects only (vec_id, codes)
                         so parquet column pruning keeps the bytes
                         per touched row at the n_sub code ids — IVF
                         bounds WHICH rows, PQ bounds the BYTES, the
                         same two multiplicative savings the one-shot
                         operator composes, now amortized across
                         queries.  The raw vector rides in the same
                         row group but is only read for the exact
                         re-rank of the per-query shortlist.
      <path>/centroids/  (cell, centroid) — n_cells rows, the
                         broadcast-sized routing table.
      <path>/codebooks/  (sub, code, center) — n_sub×n_codes rows,
                         the PQ tables (KBs).

    One encode kernel (`_encode`) serves BOTH build and append, so a
    vector is assigned the same cell and codes whether it arrived in
    the initial bulk load or later — build(all, train=base) equals
    build(base)+append(rest) bit-for-bit (test-pinned).  Append never
    re-trains: new vectors are quantized against the STORED
    centroids/codebooks and their files land inside the existing cell
    partitions — the incremental-ingest shape of
    pipeline_incremental_dedup.  (Re-training on drifted data is a
    rebuild, by design — same as FAISS.)"""

    def __init__(self, spark: SparkSession, path: str,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.spark = spark
        self.path = path
        self.id_col = id_col
        self.vec_col = vec_col

    # -- shared quantization kernel -------------------------------------
    def _load_tables(self):
        import os

        import numpy as np

        cents = (
            self.spark.read.parquet(os.path.join(self.path, "centroids"))
            .orderBy("cell")
            .collect()
        )
        cells = np.array([r["cell"] for r in cents], dtype=np.int64)
        C = np.array([r["centroid"] for r in cents], dtype=np.float64)
        bk = (
            self.spark.read.parquet(os.path.join(self.path, "codebooks"))
            .orderBy("sub", "code")
            .collect()
        )
        n_sub = 1 + max(r["sub"] for r in bk)
        n_codes = 1 + max(r["code"] for r in bk)
        books = np.array([r["center"] for r in bk], dtype=np.float64)
        books = books.reshape(n_sub, n_codes, -1)
        return cells, C, books

    def _encode(self, df: DataFrame, cells, C, books) -> DataFrame:
        """Assign (cell, codes) to every vector via one Arrow-batched
        mapInPandas pass against the broadcast centroids/codebooks —
        the single quantization path build and append both use.
        Deterministic: np.argmin takes the FIRST minimum on exact
        ties, matching the build-time encoding."""
        import numpy as np

        id_col, vec_col = self.id_col, self.vec_col
        n_sub, _, dsub = books.shape
        dim = C.shape[1]
        bc = self.spark.sparkContext.broadcast((cells, C, books))
        df = valid_vectors(df, vec_col, dim).select(id_col, vec_col)

        def enc(batches):
            cl, cen, bks = bc.value
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array(list(pdf[vec_col]), dtype=np.float64)
                d2 = ((X[:, None, :] - cen[None, :, :]) ** 2).sum(-1)
                cell = cl[d2.argmin(1)]
                xs = X.reshape(len(pdf), n_sub, dsub)
                dc = ((xs[:, :, None, :] - bks[None, :, :, :]) ** 2).sum(-1)
                codes = dc.argmin(-1)  # (N, n_sub)
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        vec_col: pdf[vec_col],
                        "codes": [
                            [int(c) for c in row] for row in codes
                        ],
                        "cell": cell,
                    }
                )

        return df.mapInPandas(enc, self._cells_schema())

    # -- lifecycle -------------------------------------------------------
    @staticmethod
    def build(
        spark: SparkSession,
        candidates: DataFrame,
        path: str,
        train_df: DataFrame | None = None,
        n_cells: int = 16,
        n_sub: int = 8,
        n_codes: int = 16,
        seed: int = 7,
        train_cap: int = 4096,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IvfPqIndex":
        """Train the coarse quantizer (seeded KMeans) and the PQ
        codebooks on `train_df` (default: the candidates themselves),
        then encode + store `candidates`.  Passing an explicit
        train_df pins the quantizers to a base corpus so later
        appends are bit-for-bit reproducible against a bulk load."""
        import os

        import numpy as np
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        train = candidates if train_df is None else train_df
        probe = (
            valid_vectors(train, vec_col)
            .groupBy(F.size(vec_col).alias("d"))
            .count()
            .orderBy(F.desc("count"), "d")
            .first()
        )
        if probe is None:
            raise ValueError("no valid vectors to train on")
        dim = probe.d
        if dim % n_sub:
            raise ValueError(f"dim {dim} not divisible by n_sub {n_sub}")
        # degenerate-corpus guard: never ask the quantizers for more
        # cells/codes than there are valid training vectors (Spark
        # KMeans needs k>1 and the PQ sampler draws without
        # replacement)
        n_train = int(probe["count"])
        n_cells = max(1, min(n_cells, n_train))
        n_codes = max(1, min(n_codes, n_train))
        train = valid_vectors(train, vec_col, dim)
        if n_cells == 1:
            # Spark KMeans requires k > 1; the k=1 centroid is the mean
            m = train.select(
                *[
                    F.avg(F.col(vec_col)[i]).alias(f"m{i}")
                    for i in range(dim)
                ]
            ).first()
            centers = [(0, [float(m[i]) for i in range(dim)])]
        else:
            model = KMeans(
                k=n_cells, seed=seed, featuresCol="_fv",
                predictionCol="cell",
            ).fit(
                train.select(
                    array_to_vector(
                        F.col(vec_col).cast("array<double>")
                    ).alias("_fv")
                )
            )
            centers = [
                (int(i), [float(x) for x in c])
                for i, c in enumerate(model.clusterCenters())
            ]
        _write_tiny_table(
            spark, centers, "cell int, centroid array<double>",
            os.path.join(path, "centroids"),
        )
        # bounded driver-side PQ training sample (first train_cap by
        # id — deterministic), the standard PQ recipe
        sample_rows = (
            train.select(vec_col).orderBy(id_col).limit(train_cap).collect()
        )
        sample = np.array([r[0] for r in sample_rows], dtype=np.float64)
        books = _train_codebooks(sample, n_sub, n_codes, seed)
        book_rows = [
            (int(s), int(c), [float(x) for x in books[s, c]])
            for s in range(n_sub)
            for c in range(n_codes)
        ]
        _write_tiny_table(
            spark, book_rows, "sub int, code int, center array<double>",
            os.path.join(path, "codebooks"),
        )
        idx = IvfPqIndex(spark, path, id_col, vec_col)
        cl, C, bks = idx._load_tables()
        idx._encode(candidates, cl, C, bks).write.mode(
            "overwrite"
        ).partitionBy("cell").parquet(os.path.join(path, "cells"))
        return idx

    @staticmethod
    def load(spark: SparkSession, path: str,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> "IvfPqIndex":
        return IvfPqIndex(spark, path, id_col, vec_col)

    def append(self, new_candidates: DataFrame) -> "IvfPqIndex":
        """Quantize new vectors against the STORED centroids/codebooks
        (no re-train, no rescan of existing rows — the incremental-
        ingest shape) and append their files inside the existing cell
        partitions."""
        import os

        cl, C, bks = self._load_tables()
        self._encode(new_candidates, cl, C, bks).write.mode(
            "append"
        ).partitionBy("cell").parquet(os.path.join(self.path, "cells"))
        return self

    def _cells_schema(self) -> str:
        """The canonical cell-row schema _encode emits."""
        return (
            f"{self.id_col} long, {self.vec_col} array<double>, "
            "codes array<int>, cell int"
        )

    def _read_cells(self) -> DataFrame:
        """All indexed rows: the bulk/append `cells/` table plus the
        streaming epochs under `cells_stream/epoch_id=N/`
        (ivfpq_stream_ingest).  Both sides expose (id, vec, codes,
        cell) and are partitioned by cell, so a filter on `cell`
        partition-prunes each read (at any partition depth — the
        epoch_id level doesn't interfere).

        Both reads carry the EXPLICIT canonical schema, which (a)
        skips schema inference, so FILELESS directories — a
        compaction that dropped every row, or an epoch whose batch
        was entirely invalid vectors — read as empty frames instead
        of crashing (code-review catch: a delete-everything compact
        must not brick the index), and (b) costs no driver-side file
        walk or per-epoch union; discovered partition columns not in
        the schema (epoch_id) are appended and dropped by the
        select."""
        import os

        cols = [self.id_col, self.vec_col, "codes", "cell"]
        schema = self._cells_schema()
        cells = (
            self.spark.read.schema(schema)
            .parquet(os.path.join(self.path, "cells"))
            .select(*cols)
        )
        spath = os.path.join(self.path, "cells_stream")
        if os.path.isdir(spath):
            cells = cells.unionAll(
                self.spark.read.schema(schema)
                .parquet(spath)
                .select(*cols)
            )
        return cells

    def _tombstones(self) -> DataFrame | None:
        """The stored tombstone set (one id column named like id_col),
        or None when nothing was ever deleted."""
        import os

        tpath = os.path.join(self.path, "tombstones")
        if not os.path.isdir(tpath):
            return None
        t = self.spark.read.parquet(tpath)
        return t if t.limit(1).first() is not None else None

    def delete(self, ids: DataFrame) -> "IvfPqIndex":
        """Logical delete: append the ids to a tombstone table (the
        LSM-style delete marker — O(deleted), never touches the cell
        files).  Queries exclude tombstoned rows from both the ADC
        pass and the re-rank; compact() makes the delete physical.
        `ids` is any DataFrame whose first column holds the ids."""
        import os

        ids.select(
            F.col(ids.columns[0]).cast("long").alias(self.id_col)
        ).distinct().write.mode("append").parquet(
            os.path.join(self.path, "tombstones")
        )
        return self

    def compact(self) -> "IvfPqIndex":
        """Physical maintenance: rewrite the cell files without the
        tombstoned rows AND fold any streaming-ingested epochs
        (`cells_stream/`) into the main layout, then clear the
        tombstone table / stream area — query results are bit-for-bit
        identical before and after (test-pinned; compaction is a pure
        storage operation).

        100 TB shape: one partition-parallel anti-join against the
        broadcast-small tombstone set + a partitioned rewrite — the
        layout_compaction pattern; queries during the rewrite are the
        caller's concern (no catalog here by design).

        SINGLE-WRITER contract: the rename swap below is
        crash-RECOVERABLE but not atomic — between the two renames
        `cells/` does not exist, so compact() must not run
        concurrently with queries on the same index, and recovery
        after a crash INSIDE the swap window is one manual rename
        (`mv cells_old cells` if the new layout was not yet moved in,
        else `mv cells_compact cells`); exactly one complete layout
        is on disk at every step."""
        import os
        import shutil

        tomb = self._tombstones()
        spath = os.path.join(self.path, "cells_stream")
        has_stream = os.path.isdir(spath)
        if tomb is None and not has_stream:
            return self
        cells_path = os.path.join(self.path, "cells")
        live = self._read_cells().withColumn(
            "cell", F.col("cell").cast("int")
        )
        if tomb is not None:
            live = live.join(
                F.broadcast(tomb), on=self.id_col, how="left_anti"
            )
        tmp = cells_path + "_compact"
        live.write.mode("overwrite").partitionBy("cell").parquet(tmp)
        # Crash-safe swap: keep a complete cells/ layout on disk at
        # every step (old aside -> new in place -> drop old), so a
        # crash mid-swap leaves either the old or the new layout
        # recoverable by rename — never a missing cells/ directory.
        old = cells_path + "_old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(cells_path, old)
        os.rename(tmp, cells_path)
        shutil.rmtree(old)
        if has_stream:
            shutil.rmtree(spath)
        if tomb is not None:
            shutil.rmtree(os.path.join(self.path, "tombstones"))
        return self

    def stream_ingest(
        self, embeddings_stream: DataFrame, checkpoint: str
    ):
        """Streaming ingest into the stored index (the continuous-
        indexing face): each micro-batch is quantized against the
        STORED centroids/codebooks — the exact `_encode` kernel bulk
        build and batch append use, so a vector gets the same (cell,
        codes) whichever path delivered it — and written to its OWN
        `cells_stream/epoch_id=N/` directory (partitioned by cell
        inside).  Exactly-once: a replayed epoch OVERWRITES its own
        epoch directory — including the empty case, where the direct-
        path overwrite truncates a failed attempt's stale rows (the
        dynamic_rules_stream pattern, streaming/windows.py).  Queries
        see streamed rows immediately via _read_cells; compact()
        folds the epochs into the main layout.

        Returns the started StreamingQuery (caller picks the
        trigger via the stream; tests use AvailableNow)."""
        import os as _os

        cl, C, bks = self._load_tables()
        spath = _os.path.join(self.path, "cells_stream")

        def ingest(batch_df: DataFrame, epoch_id: int) -> None:
            self._encode(batch_df, cl, C, bks).write.mode(
                "overwrite"
            ).partitionBy("cell").parquet(
                _os.path.join(spath, f"epoch_id={epoch_id}")
            )

        return (
            embeddings_stream.writeStream.foreachBatch(ingest)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # -- serving ----------------------------------------------------------
    def query(
        self,
        queries: DataFrame,
        k: int = 10,
        nprobe: int = 4,
        shortlist: int = 50,
    ) -> DataFrame:
        """Serve top-k from the stored index: route each query to its
        nprobe nearest stored centroids (driver-side over the tiny
        routing table), ADC-score ONLY the probed cells reading ONLY
        (id, codes) — partition + column pruned — then exactly
        re-rank the per-query shortlist against the raw vectors.
        Same deterministic contract as topk_ivfpq (rank on
        (sim desc, id)); returned sims are exact."""
        import os

        import numpy as np

        cl, C, books = self._load_tables()
        n_sub, n_codes, dsub = books.shape
        # queries must match the INDEX dim — a ragged/other-dim query
        # row is dropped like any invalid vector
        qrows, dim = _valid_rows(
            queries.select(self.id_col, self.vec_col).collect(),
            dim=int(C.shape[1]),
        )
        if not qrows or C.shape[0] == 0:
            return self.spark.createDataFrame(
                [], "qid long, neighbor_id long, sim double, rk long"
            )
        qids = np.array([r[0] for r in qrows], dtype=np.int64)
        qmat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
        tables = np.einsum(
            "qsd,scd->qsc", qmat.reshape(len(qids), n_sub, dsub), books
        )
        d2c = ((qmat[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        probed = cl[np.argsort(d2c, axis=1)[:, :nprobe]]  # (Q, nprobe)
        bc = self.spark.sparkContext.broadcast((qids, tables, probed))
        probed_union = sorted({int(c) for row in probed for c in row})
        id_col, vec_col = self.id_col, self.vec_col

        # ADC pass: partition-pruned to the probed cells, column-
        # pruned to (id, codes, cell) — the raw vectors never move.
        # Tombstoned rows are excluded by a broadcast anti-join (the
        # filter composes AFTER partition pruning, so the pruned scan
        # is unchanged; the tombstone side is O(deleted), tiny).
        tomb = self._tombstones()
        cand = (
            self._read_cells()
            .filter(F.col("cell").isin(probed_union))
            .select(id_col, "codes", "cell")
        )
        if tomb is not None:
            cand = cand.join(
                F.broadcast(tomb), on=id_col, how="left_anti"
            )

        def adc_scan(batches):
            ids, tabs, prb = bc.value
            sub_idx = np.arange(n_sub)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                cand_ids = pdf[id_col].to_numpy(dtype=np.int64)
                cells = pdf["cell"].to_numpy(dtype=np.int64)
                codes = np.array(list(pdf["codes"]), dtype=np.int64)
                out = []
                for j in range(len(ids)):
                    mask = np.isin(cells, prb[j]) & (cand_ids != ids[j])
                    if not mask.any():
                        continue
                    cids = cand_ids[mask]
                    approx = tabs[j][
                        sub_idx[None, :], codes[mask]
                    ].sum(1)
                    if len(cids) > shortlist:
                        idx = np.argpartition(-approx, shortlist)[
                            :shortlist
                        ]
                        cids, approx = cids[idx], approx[idx]
                    out.append(
                        pd.DataFrame(
                            {
                                "qid": ids[j],
                                "neighbor_id": cids,
                                "approx": approx,
                            }
                        )
                    )
                if out:
                    yield pd.concat(out, ignore_index=True)

        partial = cand.mapInPandas(
            adc_scan, "qid long, neighbor_id long, approx double"
        )
        wa = W.partitionBy("qid").orderBy(
            F.col("approx").desc(), F.col("neighbor_id")
        )
        short = (
            partial.withColumn("ra", F.row_number().over(wa))
            .filter(F.col("ra") <= shortlist)
            .select("qid", "neighbor_id")
        )
        qdf = self.spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in
             zip(qids, qmat)],
            "qid long, qe array<double>",
        )
        raw = self._read_cells().select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("ce"),
        )
        rescored = (
            short.join(raw, "neighbor_id")
            .join(F.broadcast(qdf), "qid")
            .select(
                "qid",
                "neighbor_id",
                _dot(F.col("qe"), F.col("ce")).alias("sim_raw"),
            )
        )
        w = W.partitionBy("qid").orderBy(
            F.col("sim_raw").desc(), F.col("neighbor_id")
        )
        return (
            rescored.withColumn("rk", F.row_number().over(w).cast("long"))
            .filter(F.col("rk") <= k)
            .select(
                "qid",
                "neighbor_id",
                F.round("sim_raw", 6).alias("sim"),
                "rk",
            )
        )


@register("sim_ann_ivfpq_index")  # approximate shortlist → rows-only
def sim_ann_ivfpq_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persistent IVF×PQ serving face end-to-end (round-8 verdict
    item 4): build the stored index on the base corpus (vec_id ≥ 100,
    quantizers trained there), APPEND the 10–99 cohort against the
    stored tables (no re-train), and serve the standard vec_id < 10
    queries from disk — exercising build, incremental ingest, and the
    partition+column-pruned ADC query in one key.  Rows-only by
    nature (approximate shortlist); the planted-near-dup recall gate
    in tools/check_oracle.py covers it like the other ANN keys, and
    the bit-for-bit append==bulk contract is test-pinned."""
    import tempfile

    e = table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") >= 100)
    if valid_vectors(base, "embedding").limit(1).first() is None:
        # degenerate corpus with no trainable base — no index, no hits
        return spark.createDataFrame(
            [], "qid long, neighbor_id long, sim double, rk long"
        )
    path = tempfile.mkdtemp(prefix="ivfpq_idx_")
    idx = IvfPqIndex.build(spark, base, path)
    idx.append(
        e.filter((F.col("vec_id") >= 10) & (F.col("vec_id") < 100))
    )
    q = e.filter(F.col("vec_id") < 10)
    return IvfPqIndex.load(spark, path).query(q, k=10)


@register("sim_ann_ivfpq_delete")  # approximate shortlist → rows-only
def sim_ann_ivfpq_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delete + compaction on the persistent IVF×PQ index — the
    remaining lifecycle face after build/append/query: tombstone a
    cohort (LSM-style logical delete, O(deleted), cell files
    untouched), verify queries exclude it, then COMPACT (physical
    partitioned rewrite minus the tombstones) and serve the standard
    queries from the compacted index.  Tombstone-vs-compacted
    equality and deleted-id exclusion are test-pinned
    (tests/test_round8_ops.py); the planted-near-dup recall gate in
    tools/check_oracle.py runs the same lifecycle (delete 30
    distractors + compact) and requires recall to survive.  Rows-only
    by nature (approximate shortlist).

    100 TB shape: delete is an O(deleted) append; query adds ONE
    broadcast anti-join after the partition-pruned ADC scan; compact
    is a partition-parallel anti-join + rewrite (the
    layout_compaction pattern) — nothing rescans more than once."""
    import tempfile

    e = table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") >= 100)
    if valid_vectors(base, "embedding").limit(1).first() is None:
        return spark.createDataFrame(
            [], "qid long, neighbor_id long, sim double, rk long"
        )
    path = tempfile.mkdtemp(prefix="ivfpq_del_")
    idx = IvfPqIndex.build(spark, base, path)
    idx.delete(
        base.filter(F.col("vec_id") % 10 == 0).select("vec_id")
    )
    idx.compact()
    q = e.filter(F.col("vec_id") < 10)
    return IvfPqIndex.load(spark, path).query(q, k=10)


@register("sim_index_stream_ingest")  # approximate shortlist → rows-only
def sim_index_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous indexing: the 10–99 cohort arrives as a STREAM
    (multi-epoch AvailableNow) and is quantized into the stored
    IVF×PQ index by the exactly-once foreachBatch face — each epoch
    owns and overwrites its own cells_stream/epoch_id=N/ directory
    (the dynamic_rules_stream idempotency pattern), so a replayed
    micro-batch can never duplicate vectors.  Queries then serve from
    bulk + streamed rows together.  stream-ingest == batch append
    bit-for-bit is test-pinned (same _encode kernel, same quantizers);
    the planted recall gate runs the same lifecycle.  Rows-only by
    nature (approximate shortlist).

    100 TB shape: per-epoch cost is ONE Arrow-batched encode pass over
    the micro-batch against broadcast quantizers + a partitioned
    write; queries add partition-pruned scans over the epoch dirs
    (compact() folds them into the main layout when they accumulate —
    the small-file story is layout_compaction's)."""
    import tempfile

    e = table(spark, sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") >= 100)
    if valid_vectors(base, "embedding").limit(1).first() is None:
        return spark.createDataFrame(
            [], "qid long, neighbor_id long, sim double, rk long"
        )
    path = tempfile.mkdtemp(prefix="ivfpq_si_")
    stage = tempfile.mkdtemp(prefix="ivfpq_si_stage_")
    idx = IvfPqIndex.build(spark, base, path)
    cohort = e.filter(
        (F.col("vec_id") >= 10) & (F.col("vec_id") < 100)
    ).select("vec_id", "embedding")
    cohort.repartition(4).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    idx.stream_ingest(stream, checkpoint=stage + "_ckpt").awaitTermination()
    q = e.filter(F.col("vec_id") < 10)
    return IvfPqIndex.load(spark, path).query(q, k=10)


@register(
    "emb_mrl_eval",
    oracle="""
    WITH e AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(round(x * 1000000) AS BIGINT)) AS ei
      FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64
        -- element validity must gate on BOTH sides: Spark's aggregate
        -- fold poisons a dot to NULL on one NULL element while
        -- DuckDB's conditional sum would skip it (and a NaN element
        -- raises in DuckDB's CAST) — review catch
        AND len(list_filter(embedding,
                            x -> x IS NULL OR isnan(x))) = 0
    ),
    q AS (SELECT vec_id AS qid, ei AS qi FROM e WHERE vec_id < 20),
    pr AS (
      SELECT q.qid, e.vec_id AS cid,
             unnest(q.qi) AS a, unnest(e.ei) AS b,
             unnest(range(1, 65)) AS i
      FROM q CROSS JOIN e
      WHERE e.vec_id <> q.qid
    ),
    dots AS (
      SELECT qid, cid,
             CAST(sum(CASE WHEN i <= 8  THEN a * b END) AS BIGINT) AS d8,
             CAST(sum(CASE WHEN i <= 16 THEN a * b END) AS BIGINT) AS d16,
             CAST(sum(CASE WHEN i <= 32 THEN a * b END) AS BIGINT) AS d32,
             CAST(sum(a * b) AS BIGINT) AS d64
      FROM pr GROUP BY qid, cid
    ),
    tops AS (
      -- max over ROW(dot, -cid) = highest dot, ties to SMALLEST cid
      -- (struct comparison is lexicographic; same spelling as Spark's
      -- max(struct(dot, -cid)))
      SELECT qid,
             -(max(ROW(d8,  -cid))[2]) AS t8,
             -(max(ROW(d16, -cid))[2]) AS t16,
             -(max(ROW(d32, -cid))[2]) AS t32,
             -(max(ROW(d64, -cid))[2]) AS t64
      FROM dots GROUP BY qid
    ),
    lv AS (
      SELECT * FROM (VALUES (CAST(8 AS BIGINT), 1), (16, 2), (32, 3),
                            (64, 4)) AS t(trunc_dim, ord)
    )
    SELECT lv.trunc_dim,
           CAST(count(*) AS BIGINT) AS n_queries,
           CAST(sum(CASE lv.trunc_dim
                    WHEN 8  THEN CAST(t8  = t64 AS INT)
                    WHEN 16 THEN CAST(t16 = t64 AS INT)
                    WHEN 32 THEN CAST(t32 = t64 AS INT)
                    ELSE 1 END) AS BIGINT) AS n_agree,
           round(sum(CASE lv.trunc_dim
                     WHEN 8  THEN CAST(t8  = t64 AS INT)
                     WHEN 16 THEN CAST(t16 = t64 AS INT)
                     WHEN 32 THEN CAST(t32 = t64 AS INT)
                     ELSE 1 END) * 1.0 / count(*), 6) AS agree_frac
    FROM tops CROSS JOIN lv
    GROUP BY lv.trunc_dim
    """,
)
def emb_mrl_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation evaluation (Kusupati et al 2022 — the
    MRL serving question): if we keep only the first d of 64 embedding
    dimensions, how often does the top-1 neighbor survive? For d in
    {8, 16, 32, 64}: top-1 by TRUNCATED dot product vs top-1 by the
    full vector, agreement fraction over 20 query vectors — the table
    you read before shipping truncated embeddings to a cheaper index.

    Exactness: components quantize to 1e6-scaled BIGINTs (the sim_rrf
    convention; float32 -> float64 is exact, round is the shared
    half-away spelling), every truncated dot is an exact integer
    PREFIX SUM of the same per-position products, and top-1 ties
    break on the smallest neighbor id — so the argmax chain runs on
    identical integers in both engines.

    100 TB shape: the 20-query side broadcasts (bounded by contract);
    the candidate scan computes all four prefix dots in ONE pass over
    each vector (4 slice-folds of the same array — no explode, no
    per-dim rescan); one (qid) top-1 aggregate. Cost is the exact
    brute-force scan sim_topk already budgets; the d<64 columns ride
    along free."""
    e = table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
        & (F.size("embedding") == 64)
        # mirror the oracle's element gate (NULL poisons the fold,
        # NaN casts diverge across engines)
        & ~F.exists(
            "embedding", lambda x: x.isNull() | F.isnan(x)
        )
    ).select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * 1000000).cast("long"),
        ).alias("ei"),
    )
    q = F.broadcast(
        e.filter(F.col("vec_id") < 20).select(
            F.col("vec_id").alias("qid"), F.col("ei").alias("qi")
        )
    )

    def pdot(d: int):
        return F.aggregate(
            F.zip_with(
                F.slice("qi", 1, d), F.slice("ei", 1, d),
                lambda a, b: a * b,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    dots = (
        q.crossJoin(e)
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("cid"),
            pdot(8).alias("d8"),
            pdot(16).alias("d16"),
            pdot(32).alias("d32"),
            pdot(64).alias("d64"),
        )
    )
    tops = dots.groupBy("qid").agg(
        *[
            (
                -F.max(
                    F.struct(F.col(c), (-F.col("cid")).alias("nc"))
                )["nc"]
            ).alias(f"t{c[1:]}")
            for c in ("d8", "d16", "d32", "d64")
        ]
    )
    lv = spark.createDataFrame(
        [(8,), (16,), (32,), (64,)], "trunc_dim long"
    )
    agree = {
        8: (F.col("t8") == F.col("t64")).cast("int"),
        16: (F.col("t16") == F.col("t64")).cast("int"),
        32: (F.col("t32") == F.col("t64")).cast("int"),
        64: F.lit(1),
    }
    agree_col = (
        F.when(F.col("trunc_dim") == 8, agree[8])
        .when(F.col("trunc_dim") == 16, agree[16])
        .when(F.col("trunc_dim") == 32, agree[32])
        .otherwise(agree[64])
    )
    return (
        tops.crossJoin(F.broadcast(lv))
        .groupBy("trunc_dim")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.sum(agree_col).cast("long").alias("n_agree"),
            F.round(
                F.sum(agree_col) * 1.0 / F.count(F.lit(1)), 6
            ).alias("agree_frac"),
        )
    )


def _bq_sigs(spark: SparkSession, sf_dir: str):
    """Shared binary-quantization substrate for sim_bq_hamming /
    sim_bq_rerank: the element-validity-gated 64-dim corpus `e` and
    its one-int64 sign-bit signature table `sig` (bit i set iff
    embedding[i] > 0, packed by one aggregate HOF — the trickiest
    expression in this family lives HERE once; its oracle twin needs
    the min-long special case at bit 63)."""
    e = table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
        & (F.size("embedding") == 64)
        & (
            F.size(
                F.filter(
                    "embedding",
                    lambda x: x.isNull() | F.isnan(x),
                )
            )
            == 0
        )
    )
    sig = e.select(
        "vec_id",
        F.expr(
            "aggregate(sequence(0, 63), CAST(0 AS BIGINT), "
            "(acc, i) -> acc | IF(embedding[i] > CAST(0 AS DOUBLE), "
            "shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))"
        ).alias("sig"),
    )
    return e, sig


@register(
    "sim_bq_hamming",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding
      FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64
        AND len(list_filter(embedding,
                            x -> x IS NULL OR isnan(x))) = 0
    ),
    sig AS (
      -- bit 63 spelled as the min-long literal: DuckDB's << checks
      -- overflow at 1 << 63 where Spark's shiftleft wraps (Java)
      SELECT vec_id,
             coalesce(bit_or(CASE WHEN x > 0 THEN
                      CASE WHEN i = 64
                           THEN CAST(-9223372036854775807 - 1 AS BIGINT)
                           ELSE (CAST(1 AS BIGINT) << (i - 1)) END
                      END), 0) AS sig
      FROM (SELECT vec_id, unnest(embedding) AS x,
                   unnest(range(1, 65)) AS i
            FROM e)
      GROUP BY vec_id
    ),
    q AS (SELECT vec_id AS qid, sig AS qsig FROM sig WHERE vec_id < 10),
    scored AS (
      SELECT q.qid, s.vec_id AS neighbor_id,
             CAST(bit_count(xor(q.qsig, s.sig)) AS BIGINT) AS hamming
      FROM q CROSS JOIN sig s
      WHERE s.vec_id <> q.qid
    ),
    ranked AS (
      SELECT qid, neighbor_id, hamming,
             CAST(row_number() OVER (PARTITION BY qid
                                     ORDER BY hamming, neighbor_id)
                  AS BIGINT) AS rk
      FROM scored
    )
    SELECT qid, neighbor_id, hamming, rk FROM ranked WHERE rk <= 10
    """,
)
def sim_bq_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary quantization + Hamming top-k — the 32×-compression ANN
    trick modern vector stores ship (sign-bit quantization, public:
    Jégou et al's BQ lineage / Qdrant-class BQ): with dim = 64 each
    vector packs into ONE int64 (bit i set iff embedding[i] > 0), and
    candidate distance is bit_count(xor(sig_q, sig_c)) — whole-stage
    codegen end to end, no floats move after the one-time packing.
    Top-10 per query (vec_id < 10), ties by neighbor id — fully
    deterministic, so unlike the float-scoring ANN keys this one has
    an EXACT SQL oracle.  Element validity gates on BOTH sides (a
    NULL/NaN element row drops — the emb_mrl_eval discipline).

    100 TB shape: packing is one aggregate-HOF projection (64 bit-ops
    per row, ~8 B out per vector — 32× smaller than int8, 256× vs
    float64); the query side is 10 signatures (vec_id < 10) BROADCAST
    against the corpus scan (the sim_topk shape, allowlisted), so the scan reads
    ONE long column; rank is a bounded per-query top-k.  The exact
    re-rank composes downstream like topk_ivfpq's shortlist stage."""
    _, sig = _bq_sigs(spark, sf_dir)
    q = sig.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("sig").alias("qsig")
    )
    scored = (
        sig.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.bit_count(F.col("qsig").bitwiseXOR(F.col("sig")))
            .cast("long")
            .alias("hamming"),
        )
    )
    w = W.partitionBy("qid").orderBy("hamming", "neighbor_id")
    return (
        scored.withColumn(
            "rk", F.row_number().over(w).cast("long")
        )
        .filter(F.col("rk") <= 10)
        .select("qid", "neighbor_id", "hamming", "rk")
    )


@register(
    "sim_bq_rerank",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding
      FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64
        AND len(list_filter(embedding,
                            x -> x IS NULL OR isnan(x))) = 0
    ),
    sig AS (
      SELECT vec_id,
             coalesce(bit_or(CASE WHEN x > 0 THEN
                      CASE WHEN i = 64
                           THEN CAST(-9223372036854775807 - 1 AS BIGINT)
                           ELSE (CAST(1 AS BIGINT) << (i - 1)) END
                      END), 0) AS sig
      FROM (SELECT vec_id, unnest(embedding) AS x,
                   unnest(range(1, 65)) AS i
            FROM e)
      GROUP BY vec_id
    ),
    q AS (SELECT vec_id AS qid, sig AS qsig FROM sig WHERE vec_id < 10),
    short AS (
      SELECT qid, neighbor_id FROM (
        SELECT q.qid, s.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.qid
                 ORDER BY bit_count(xor(q.qsig, s.sig)), s.vec_id
               ) AS rh
        FROM q CROSS JOIN sig s
        WHERE s.vec_id <> q.qid) t
      WHERE rh <= 50
    ),
    rescored AS (
      SELECT sh.qid, sh.neighbor_id,
             list_dot_product(CAST(qe.embedding AS DOUBLE[]),
                              CAST(ce.embedding AS DOUBLE[])) AS sim_raw
      FROM short sh
      JOIN e qe ON qe.vec_id = sh.qid
      JOIN e ce ON ce.vec_id = sh.neighbor_id
    )
    SELECT qid, neighbor_id, round(sim_raw, 6) AS sim, rk FROM (
      SELECT qid, neighbor_id, sim_raw,
             row_number() OVER (PARTITION BY qid
                                ORDER BY sim_raw DESC, neighbor_id) AS rk
      FROM rescored) t
    WHERE rk <= 10
    """,
)
def sim_bq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full binary-quantization serving pattern: Hamming
    shortlist (top-50 by bit_count(xor), ties by id — exact integers,
    so the CANDIDATE SET is deterministic) → exact cosine re-rank of
    the shortlist (the sim_topk dot-product discipline) → top-10.
    This is the two-stage recall/precision trade every BQ deployment
    ships: the cheap stage touches one int64 per candidate, the
    expensive stage touches 50 raw vectors per query — and unlike the
    float-bucketed ANN keys, BOTH stages are deterministic, so the
    composition keeps an EXACT SQL oracle.

    100 TB shape: stage 1 is the sim_bq_hamming scan (one long column,
    xor+popcount in codegen, 10-signature broadcast); stage 2 joins
    50 ids/query back to the raw vectors by key — the shortlist bound
    makes the expensive stage's cost INDEPENDENT of corpus size."""
    e, sig = _bq_sigs(spark, sf_dir)
    q = sig.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("sig").alias("qsig")
    )
    wh = W.partitionBy("qid").orderBy("hamming", "neighbor_id")
    short = (
        sig.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("neighbor_id"),
            F.bit_count(F.col("qsig").bitwiseXOR(F.col("sig"))).alias(
                "hamming"
            ),
        )
        .withColumn("rh", F.row_number().over(wh))
        .filter(F.col("rh") <= 50)
        .select("qid", "neighbor_id")
    )
    qe = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    ce = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
    )
    rescored = (
        short.join(F.broadcast(qe), "qid")
        .join(ce, "neighbor_id")
        .select("qid", "neighbor_id", _dot(F.col("qv"), F.col("cv")).alias("sim_raw"))
    )
    w = W.partitionBy("qid").orderBy(F.col("sim_raw").desc(), "neighbor_id")
    return (
        rescored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 10)
        .select(
            "qid",
            "neighbor_id",
            F.round("sim_raw", 6).alias("sim"),
            "rk",
        )
    )
