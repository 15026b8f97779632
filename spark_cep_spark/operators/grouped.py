"""Per-key pandas kernels without per-group dispatch.

`groupBy(key).applyInPandas(fn)` pays a per-GROUP toll twice: Spark's
grouped-map serializer converts every column per group on both sides
of the Arrow boundary, and each `fn` call starts from a freshly built
pandas frame.  For kernels applied per key over MANY small keys (the
EWMA/CUSUM/Holt/LTTB/run-agg tier: ~ms of work per group), that toll
dominates — measured round 11: the SQL run-agg family dropped 2–5x
at the 8x probe when moved off applyInPandas.

`keyed_partition_apply` keeps the identical distribution contract —
ONE hash shuffle on the key, every key processed exactly once by the
UNCHANGED per-group `fn` — but lays keys out contiguously
(`repartition(key) + sortWithinPartitions(key)`) and slices each key
run out of whole Arrow batches inside `mapInPandas`.  Per-group cost
falls to a frame slice; Arrow conversion is paid per BATCH.

Semantics preserved exactly:
- `fn` still receives ALL rows of one key (runs spanning Arrow batch
  boundaries are carried and re-joined before `fn` sees them) in a
  plain pandas frame, and may return any number of rows.
- NULL keys form ONE group (pandas `!=` is True for NaN vs NaN, so
  boundaries are detected null-safely), matching groupBy.
- Row order within a group is as arbitrary as applyInPandas' — every
  caller's `fn` sorts internally, which this helper relies on NOT
  changing.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def keyed_partition_apply(
    df: DataFrame,
    key_col: str,
    fn: "Callable",
    out_schema: str,
) -> DataFrame:
    """groupBy(key_col).applyInPandas(fn, out_schema), restructured as
    a key-sorted mapInPandas — same shuffle, same `fn`, same output."""
    import pandas as pd

    def fn_map(pdfs: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        carry: "pd.DataFrame | None" = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            k = pdf[key_col]
            kprev = k.shift()
            # null-safe boundary: NaN != NaN is True, so mask it out
            change = (k != kprev) & ~(k.isna() & kprev.isna())
            change.iloc[0] = False  # row 0 opens the first run, not a cut
            cuts = change.to_numpy().nonzero()[0]
            starts = [0, *cuts]
            ends = [*cuts, len(pdf)]
            # hold back the final run — it may continue in the next batch
            carry = pdf.iloc[starts[-1] :]
            # reset_index: applyInPandas handed fn a zero-based frame;
            # keep that contract for index-sensitive kernels
            outs = [
                fn(pdf.iloc[s:e].reset_index(drop=True))
                for s, e in zip(starts[:-1], ends[:-1])
            ]
            outs = [o for o in outs if len(o)]
            if outs:
                yield pd.concat(outs, ignore_index=True)
        if carry is not None and len(carry):
            out = fn(carry.reset_index(drop=True))
            if len(out):
                yield out

    return (
        df.repartition(F.col(key_col))
        .sortWithinPartitions(key_col)
        .mapInPandas(fn_map, out_schema)
    )
