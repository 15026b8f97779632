"""Dump .explain("formatted") for round-12-touched queries.

Usage:
  python tools/dump_plans_r12.py --out plans/r12 --suffix after
  SPARK_GRAFT_STREAM_BUCKETS=1 python tools/dump_plans_r12.py \
      --out plans/r12 --suffix before --only ''   # stream plan only

The streaming `before` plan needs no worktree: SPARK_GRAFT_STREAM_BUCKETS=1
selects the pre-round per-key groupBy path verbatim (streaming/
bucketed.py's A/B lever).  Batch `before` plans come from a worktree of
the pre-round commit via --src, as in rounds 10-11.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

BATCH_KEYS: list[str] = [
    # filled in as round-12 batch changes land
]

STREAM_NFA_SQL = """
PATTERN ( S -> V{1,3} -> P )
WITHIN 2 HOURS
PARTITION BY user_id
DEFINE S AS event_type = 'signup',
       V AS event_type = 'view',
       P AS event_type = 'purchase'
"""


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/repo")
    ap.add_argument("--out", default="plans/r12")
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None, help="comma-separated key subset")
    ap.add_argument(
        "--no-stream", action="store_true", help="skip the streaming NFA plan"
    )
    args = ap.parse_args()

    sys.path.insert(0, args.src)
    import spark_cep_spark
    from spark_cep_spark.session import get_spark

    spark_cep_spark.load_all()
    spark = get_spark("plans_r12")
    os.makedirs(args.out, exist_ok=True)

    keys = BATCH_KEYS if args.only is None else [
        k for k in args.only.split(",") if k
    ]
    for key in keys:
        fn = spark_cep_spark.QUERIES.get(key)
        if fn is None:
            print(f"skip {key} (absent in this tree)")
            continue
        df = fn(spark, args.sf_dir)
        path = os.path.join(args.out, f"{key}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df))
        print(f"wrote {path}")

    if args.no_stream:
        return

    # streaming NFA (the bench's nfa_variants query)
    from spark_cep_spark.operators.cep_sql import match_recognize
    from spark_cep_spark.streaming import harness

    staged = harness.stage_events_files_sorted(spark, args.sf_dir, n_files=8)
    sdf = harness.events_stream(spark, staged, max_files_per_trigger=4)
    out = match_recognize(sdf, STREAM_NFA_SQL, watermark="0 seconds")
    path = os.path.join(args.out, f"stream_nfa_variants_{args.suffix}.txt")
    with open(path, "w") as f:
        f.write(explain_str(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
