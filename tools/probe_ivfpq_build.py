"""Decompose IvfPqIndex.build's wall (VERDICT r11 item 5): where do
sim_ann_ivfpq_index's 12-16 s go, and is the KMeans training input
re-read per iteration (the graph-lineage defect class) or already
cached?

Stages timed separately on the bench corpus (sf0.1, vec_id >= 100):
  probe     — the dimension-probe first()
  kmeans    — KMeans(k=16, seed=7).fit on the unpersisted prep (as
              shipped) vs on an explicitly persisted prep: if MLlib
              already persists internally (handlePersistence), the
              two match and centroids are bit-identical.
  pq_sample — the bounded orderBy+limit collect
  encode    — _encode + partitioned write

Usage: python tools/probe_ivfpq_build.py [--reps 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import functions as F

    from spark_cep_spark.io import table
    from spark_cep_spark.operators.llm_similarity import (
        IvfPqIndex,
        valid_vectors,
    )
    from spark_cep_spark.session import get_spark

    spark = get_spark("probe_ivfpq")
    e = table(spark, args.sf_dir, "embeddings")
    base = e.filter(F.col("vec_id") >= 100)
    base.count()  # warm input

    def t(fn):
        t0 = time.perf_counter()
        r = fn()
        return time.perf_counter() - t0, r

    for rep in range(args.reps):
        dt, probe = t(
            lambda: valid_vectors(base, "embedding")
            .groupBy(F.size("embedding").alias("d"))
            .count()
            .orderBy(F.desc("count"), "d")
            .first()
        )
        print(f"rep{rep} probe     {dt:6.2f}s (d={probe.d} n={probe['count']})")
        train = valid_vectors(base, "embedding", probe.d)
        prep = train.select(
            array_to_vector(F.col("embedding").cast("array<double>")).alias(
                "_fv"
            )
        )
        dt, m1 = t(
            lambda: KMeans(
                k=16, seed=7, featuresCol="_fv", predictionCol="cell"
            ).fit(prep)
        )
        print(f"rep{rep} kmeans    {dt:6.2f}s (unpersisted prep, as shipped)")
        prep_p = prep.persist()
        prep_p.count()
        dt, m2 = t(
            lambda: KMeans(
                k=16, seed=7, featuresCol="_fv", predictionCol="cell"
            ).fit(prep_p)
        )
        prep_p.unpersist()
        print(f"rep{rep} kmeans    {dt:6.2f}s (pre-persisted prep)")
        c1 = np.array([np.asarray(c) for c in m1.clusterCenters()])
        c2 = np.array([np.asarray(c) for c in m2.clusterCenters()])
        print(
            f"rep{rep} centroids bit-identical: "
            f"{np.array_equal(c1, c2)}"
        )
        dt, rows = t(
            lambda: train.select("embedding")
            .orderBy("vec_id")
            .limit(4096)
            .collect()
        )
        print(f"rep{rep} pq_sample {dt:6.2f}s ({len(rows)} rows)")
        path = tempfile.mkdtemp(prefix="probe_ivfpq_")
        dt, _ = t(lambda: IvfPqIndex.build(spark, base, path))
        print(f"rep{rep} FULL build {dt:5.2f}s")


if __name__ == "__main__":
    main()
