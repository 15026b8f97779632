"""Scaling probe for the document-pipeline operators.

Stages an amplified copy of the sf0.1 documents table (N exact copies
with shifted doc_ids — near-dup structure preserved, corpus N× larger)
and times the heavyweight LLM operators at 1× and N×. The point is the
GROWTH FACTOR, not the absolute number: a bucket-then-verify operator
whose runtime grows ~linearly with the corpus is scale-safe; anything
super-linear means a candidate-generation stage is quadratic and would
not survive 100 TB.

Usage: python tools/bench_scale_docs.py [--mult 8] [--sf-dir DIR]
Writes a markdown table to stdout (recorded in SCALE.md).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

OPS = [
    "stream_corpus_intake",
    "text_rep_signals",
    "text_gopher_rules",
    "pipeline_ccnet_buckets",
    "pipeline_dsir_weights",
    "dedup_exact",
    "dedup_near",
    "dedup_minhash_lsh",
    "text_surprisal",
    "text_boilerplate",
    "pipeline_end_to_end",
    # round-4b additions
    "pipeline_scrub_boilerplate",
    "pipeline_dedup_keep_best",
    "pipeline_incremental_dedup",
    "corpus_dedup_stats",
    # round-5: the two de-windowed scale fixes + the bigram LM
    "text_vocab",
    "corpus_token_budget",
    "text_bigram_lm",
    # round-8: KN smoothing (same bigram zip + two extra type aggs)
    "text_bigram_kn",
    # round-6: decile rank (distributed ntile), mix weights, BM25,
    # hybrid RRF (embeddings stay 1x — the lexical side is what grows)
    "corpus_quality_deciles",
    "pipeline_mix_temperature",
    "text_bm25_topk",
    "sim_rrf_hybrid",
    "text_perplexity_bigram",
    # round-6b: line dedup (chunk-keyed shuffle), hashing-trick TF,
    # per-source datasheet rollup
    "pipeline_line_dedup",
    "text_feat_hash",
    "pipeline_dataset_card",
    # round-6b: BPE pair counts, ARI projection, Zipf fit,
    # shingle-novelty census (two md5-keyed shuffles)
    "pipeline_bpe_pairs",
    "text_readability",
    "text_zipf_fit",
    "corpus_ngram_novelty",
    # round-6c: positional shingle census (two md5-keyed shuffles +
    # per-doc span-union window)
    "pipeline_substring_dedup",
    # round-8: iterated BPE training (corpus-scale word agg once, then
    # 32 vocabulary-sized rounds) + token counts under the final vocab
    "pipeline_bpe_train",
    "pipeline_bpe_tokens",
    # round-9: the composed gopher->dedup->ccnet/dsir/bpe chain — the
    # cross-stage regression canary; survivors materialize once
    "pipeline_e2e",
    # dedup_edit_nn is deliberately NOT probed at 8x: pairs grow
    # quadratically within blocks (measured: >15 min at 40k docs vs
    # 11 s at 5k — the hazard SCALE.md documents; at real scale the
    # block key gains a MinHash band component first)
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--scratch", default="/root/repo/.tmp/scale_docs")
    ap.add_argument("--only", default=None,
                    help="comma-separated OPS subset")
    args = ap.parse_args()
    ops = OPS
    if args.only:
        only = [k for k in args.only.split(",") if k]
        unknown = sorted(set(only) - set(OPS))
        if unknown:
            # fail LOUDLY: a typo would otherwise filter OPS to empty
            raise SystemExit(f"--only keys not in OPS: {unknown}")
        ops = only

    import spark_cep_spark
    from pyspark.sql import functions as F
    from spark_cep_spark.io import table
    from spark_cep_spark.session import get_spark

    spark_cep_spark.load_all()
    spark = get_spark("scale-docs")

    d = table(spark, args.sf_dir, "documents")
    n1 = d.count()

    shutil.rmtree(args.scratch, ignore_errors=True)
    os.makedirs(args.scratch)
    big_dir = os.path.join(args.scratch, "big")
    os.makedirs(big_dir)
    copies = [
        d.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(i * 10_000_000)).cast("long")
        )
        for i in range(args.mult)
    ]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.repartition(16).write.mode("overwrite").parquet(
        os.path.join(big_dir, "documents.parquet")
    )
    nN = args.mult * n1

    # ops that also read other tables (e.g. sim_rrf_hybrid's embedding
    # branch) find them unamplified via symlink
    from spark_cep_spark.schemas import TABLES

    for name in TABLES:
        if name == "documents":
            continue
        dst_p = os.path.join(big_dir, f"{name}.parquet")
        if not os.path.exists(dst_p):
            os.symlink(os.path.join(args.sf_dir, f"{name}.parquet"), dst_p)

    def run(key: str, sf_dir: str) -> float:
        fn = spark_cep_spark.QUERIES[key]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    print(f"| op | {n1} docs (s) | {nN} docs (s) | growth (x{args.mult} data) |")
    print("| --- | --- | --- | --- |")
    for key in ops:
        run(key, args.sf_dir)  # warm
        t1 = min(run(key, args.sf_dir), run(key, args.sf_dir))
        tN = run(key, big_dir)
        tN = min(tN, run(key, big_dir))
        print(f"| {key} | {t1:.2f} | {tN:.2f} | {tN / t1:.1f}x |")


if __name__ == "__main__":
    main()
