"""Continuously-maintained aggregate tables (SURVEY §0 north star:
"continuous SQL queries over event streams" whose results land in a
queryable sink — the reference family's `SELECT ... INSERT INTO sink`
loop with incremental window aggregation [PK]).

Structured Streaming already maintains the aggregate STATE
incrementally; what the reference's sink loop adds is a continuously
UPSERTED result table. This module composes the two modern primitives:

    update-mode aggregation   → per micro-batch, only the (key, agg)
                                rows whose values changed
    foreachBatch MERGE        → upsert those rows into a parquet target
                                (anti-join out stale keys, union new)

so the target parquet is always the current aggregate over everything
ingested — readable mid-stream by any batch consumer, exactly-once
across restarts (foreachBatch re-delivery overwrites the same keys
idempotently).

Crash-safety: each state is written to its own versioned directory
(`{target}__v_*`) and `target` is a SYMLINK atomically re-pointed at
the new version (symlink created aside, then rename(2) over the old
link — a single atomic step, so readers always see either the old or
the new complete state, never a missing or half directory). If a crash
lands between steps, recovery on the next merge re-links the newest
version that carries Spark's `_SUCCESS` marker; recovering to either
side of the swap is correct because the un-committed micro-batch is
re-delivered and the key-merge is idempotent.

Scale: each batch touches only changed keys (update mode); the merge
cost is target-scan + anti-join, the standard parquet-upsert shape. On
a real deployment the target would be a Delta/Iceberg table whose
MERGE INTO does the same thing transactionally; plain parquet +
directory swap keeps this repo dependency-free and test-runnable.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def _recover_link(target: str) -> None:
    """If `target` is missing but versioned state directories exist, a
    crash hit between 'write new version' and 'repoint link' (or a
    legacy real-directory state was mid-migration). Re-link the newest
    COMPLETE version — only directories carrying Spark's `_SUCCESS`
    marker qualify (a crash mid-write leaves no marker). Either side of
    the interrupted swap is a correct recovery point: the un-committed
    micro-batch re-delivers and the merge is key-idempotent."""
    if os.path.lexists(target):
        return
    done = [
        d
        for d in glob.glob(f"{target}__v_*")
        if os.path.isdir(d) and os.path.exists(os.path.join(d, "_SUCCESS"))
    ]
    if not done:
        return
    newest = max(done, key=os.path.getmtime)
    _point_link(target, newest)


def _point_link(target: str, version_dir: str) -> None:
    """Atomically (re)point the `target` symlink at `version_dir`:
    create the link aside, then rename(2) it over the old one — the one
    atomic step of the swap. Readers never observe a missing target."""
    tmp = f"{target}__lnk_{uuid.uuid4().hex[:8]}"
    os.symlink(os.path.basename(version_dir), tmp)
    os.rename(tmp, target)


def merge_into_parquet(batch_df: DataFrame, target: str, keys: list[str]) -> None:
    """Upsert batch_df into the parquet table at `target` by key:
    current rows whose key appears in the batch are replaced, everything
    else kept. `target` is a symlink to the current versioned directory
    (see module docstring: the repoint is the single atomic step, and a
    crash at any point is recoverable)."""
    spark = batch_df.sparkSession
    _recover_link(target)
    if os.path.lexists(target):
        if not os.path.islink(target):
            # legacy real-directory state: migrate to versioned+symlink.
            # A crash between these two steps is healed by _recover_link
            # (the renamed directory already carries _SUCCESS).
            legacy = f"{target}__v_legacy_{uuid.uuid4().hex[:8]}"
            os.rename(target, legacy)
            _point_link(target, legacy)
        tgt = spark.read.parquet(target)
        merged = tgt.join(
            batch_df.select(*keys).distinct(), keys, "left_anti"
        ).unionByName(batch_df)
    else:
        merged = batch_df
    new_dir = f"{target}__v_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(new_dir)
    _point_link(target, new_dir)
    # best-effort GC: superseded versions and half-written crash
    # leftovers — everything but the new current (readers mid-scan on
    # posix keep their open files; new readers resolve the new link)
    keep = os.path.realpath(new_dir)
    for d in glob.glob(f"{target}__v_*"):
        if os.path.realpath(d) != keep:
            shutil.rmtree(d, ignore_errors=True)


def materialize_aggregate(
    agg_stream: DataFrame,
    keys: list[str],
    target: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Run an update-mode streaming aggregation into a continuously
    upserted parquet table. `agg_stream` is any streaming aggregation
    DataFrame (groupBy().agg(...), windowed or keyed); `keys` identify
    its rows for the upsert.

    The reference shape this re-creates [PK]:
        SELECT key, agg(...) FROM stream GROUP BY key INSERT INTO sink
    with the incremental-aggregation speedup native to the engine.
    """

    def upsert(batch_df: DataFrame, _batch_id: int) -> None:
        merge_into_parquet(batch_df, target, keys)

    writer = (
        agg_stream.writeStream.foreachBatch(upsert)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
