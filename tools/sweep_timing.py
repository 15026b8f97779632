"""Isolated wall-clock sweep over every registered batch query.

One warm session, every queries() key timed to the noop sink
(best-of-2 after one warm run — the bench.py methodology applied to
the whole registry), sorted slowest-first. This is the
straggler-finder: any key whose isolated time is far above its
family's band gets an .explain read and a same-session A/B before any
code changes (host noise swings isolated points up to 3x — see
OPTIMIZATION_r11.md "Host noise").

Usage: python tools/sweep_timing.py [--sf-dir DIR] [--only k1,k2]
                                    [--reps 2] [--no-warm-cache]
Writes a markdown table to stdout.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument(
        "--no-warm-cache",
        action="store_true",
        help="skip the bench-style input repartition+persist warm-up",
    )
    args = ap.parse_args()

    if not args.no_warm_cache:
        os.environ["SPARK_GRAFT_CACHE_INPUTS"] = "1"

    import spark_cep_spark
    from spark_cep_spark.session import get_spark
    from spark_cep_spark.io import load_tables

    spark_cep_spark.load_all()
    qs = dict(spark_cep_spark.QUERIES)
    if args.only:
        keep = set(args.only.split(","))
        qs = {k: v for k, v in qs.items() if k in keep}

    spark = get_spark("sweep_timing")
    for df in load_tables(spark, args.sf_dir).values():
        df.count()

    rows: list[tuple[str, float]] = []
    for key in sorted(qs):
        fn = qs[key]
        spark.sparkContext.setJobDescription(f"sweep:{key}")
        try:
            def once() -> float:
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                return time.perf_counter() - t0

            once()  # warm
            best = min(once() for _ in range(args.reps))
            rows.append((key, best))
            print(f". {key:32s} {best:7.2f}s", file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 - report and continue
            rows.append((key, float("nan")))
            print(f"E {key:32s} {type(exc).__name__}: {exc}", file=sys.stderr)

    # valid timings slowest-first; errored keys (NaN) sink to the bottom
    rows.sort(key=lambda r: -r[1] if r[1] == r[1] else 1e9)
    print("| key | best-of-%d (s) |" % args.reps)
    print("| --- | --- |")
    for key, secs in rows:
        print(f"| {key} | {secs:.2f} |")


if __name__ == "__main__":
    main()
