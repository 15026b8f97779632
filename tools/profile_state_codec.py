"""Profile the NFA state codec's share of an end-to-end streaming drain
(round-6 verdict item 6: SCALE.md claimed "swap JSON for binary if
profiles show it hot" — this is the profile).

Mechanism: SPARK_GRAFT_PROFILE_CODEC is exported BEFORE the
SparkSession starts, so every local-mode Python worker imports
streaming/nfa.py with its module-global `json` wrapped in
_CodecProfiler — each loads/dumps in the stateful operators is timed
and the per-process totals land in /tmp/spark_graft_codec_<pid>.json.
This script then drains the bench's variant-NFA query (the heaviest
state payload: buffered rows + partial-match sets for 3 parallel
orderings) and the windowed ewma face (small payloads), and reports
codec seconds vs drain wall.

Interpretation note: codec seconds are summed ACROSS worker processes
while the drain wall is elapsed time over 32 parallel workers, so
share = codec_sec / (wall x workers_busy) in the limit; the honest
upper bound reported here is codec_sec / wall (as if serialized on one
core) — if even THAT is under the 20% swap threshold, the JSON codec
is not hot.

Usage: python tools/profile_state_codec.py [--sf-dir ...] [--mult N]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["SPARK_GRAFT_PROFILE_CODEC"] = "1"

STREAM_NFA_SQL = """
PATTERN ( S -> V{1,3} -> P )
WITHIN 2 HOURS
PARTITION BY user_id
DEFINE S AS event_type = 'signup',
       V AS event_type = 'view',
       P AS event_type = 'purchase'
"""


def _clear_counters() -> None:
    for f in glob.glob("/tmp/spark_graft_codec_*.json"):
        os.remove(f)


def _read_counters() -> dict:
    tot = {"sec": 0.0, "calls": 0, "bytes": 0}
    for f in glob.glob("/tmp/spark_graft_codec_*.json"):
        try:
            with open(f) as fh:
                d = json.load(fh)
        except (OSError, ValueError):
            continue
        for k in tot:
            tot[k] += d[k]
    return tot


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from spark_cep_spark.session import get_spark
    from spark_cep_spark.streaming import harness
    from spark_cep_spark.operators.cep_sql import match_recognize
    from spark_cep_spark.streaming.nfa import ewma_stream

    spark = get_spark("codec-profile")
    staged = harness.stage_events_files_sorted(spark, args.sf_dir, n_files=8)
    n_events = spark.read.parquet(staged).count()

    def drain(build, mode) -> float:
        sdf = harness.events_stream(spark, staged, max_files_per_trigger=4)
        t0 = time.perf_counter()
        harness.run_available_now(build(sdf), mode).count()
        return time.perf_counter() - t0

    print(f"| op | events | drain wall (s) | codec (s, all workers) "
          f"| calls | MB | codec share (1-core upper bound) |")
    print("| --- | --- | --- | --- | --- | --- | --- |")
    for name, build, mode in (
        (
            "nfa_variants",
            lambda s: match_recognize(
                s, STREAM_NFA_SQL, watermark="0 seconds"
            ),
            "append",
        ),
        (
            "ewma_stream",
            lambda s: ewma_stream(s, watermark="0 seconds"),
            "append",
        ),
    ):
        drain(build, mode)  # warm
        _clear_counters()
        wall = drain(build, mode)
        c = _read_counters()
        share = c["sec"] / wall if wall else 0.0
        print(
            f"| {name} | {n_events} | {wall:.2f} | {c['sec']:.3f} "
            f"| {c['calls']} | {c['bytes'] / 1e6:.1f} "
            f"| {share * 100:.1f}% |"
        )


if __name__ == "__main__":
    main()
