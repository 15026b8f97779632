"""Bucketed stateful apply — amortize applyInPandasWithState's
per-GROUP protocol over many keys (guide §4.1/§4.2, the streaming twin
of operators/grouped.keyed_partition_apply).

Measured (round 11, tools/profile_state_worker.py): a NOOP stateful
process drains the bench's NFA stream within ~30% of the real NFA —
the cost is Spark's per-group machinery itself (per-group Arrow
conversion, state-protocol rows, JVM grouping and state-store ops),
paid once per (key, micro-batch).  The bench stream has only 1,500
distinct keys at 1x / 12,000 at 8x with ~10-70 events each per batch:
group dispatch dominates kernel work by an order of magnitude.

`bucketed_stateful_apply` keeps the per-key kernels and `process`
functions UNTOUCHED but groups by `pmod(xxhash64(key), B)` instead of
the key, so Spark's per-group toll is paid B times per batch instead
of n_keys times.  Inside each bucket a `_KeyState` shim replays the
exact GroupState contract per key:

- rows are split per key (null-safe) and each key's slice is handed to
  the original `process(key_tuple, [pdf], shim)`;
- per-key timeouts are kept in the bucket state; the BUCKET's Spark
  timeout is the MIN over its keys, and a key's timeout fires in
  exactly the micro-batch Spark would have fired it (timeout_ts <
  current event-time watermark — Spark's strict "advances beyond"
  semantics; setTimeoutTimestamp still enforces ts > watermark);
- a key with data is invoked with hasTimedOut=False even when its
  timeout has also expired (Spark's guarantee); a stored key with no
  data is invoked with hasTimedOut=True only when its timeout expired;
  untouched keys' opaque state payloads are carried through WITHOUT
  re-encoding (the outer bucket dict is JSON; inner payloads stay
  strings).

Results are invariant to B — bucketing only changes which Spark group
a key's (unchanged) computation runs in, never what it computes, so
the streaming == batch equivalence suites pin it.

Scale posture: B defaults to 4x the cluster's default parallelism
(env-overridable via SPARK_GRAFT_STREAM_BUCKETS) — enough buckets to
spread over the state-store partitions with low Poisson skew, few
enough that per-group overhead stays amortized.  State per bucket is
the sum of its keys' states (bounded: each per-key state is bounded by
the pattern's WITHIN window).  `SPARK_GRAFT_STREAM_BUCKETS=1` disables
bucketing (plain groupBy(key) — the A/B lever).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupStateTimeout

_NO_TIMEOUT = None


class _KeyState:
    """GroupState look-alike for ONE key inside a bucket.

    Implements exactly the surface the engine's process() functions
    use: exists / get / getOption / update / remove / hasTimedOut /
    getCurrentWatermarkMs / setTimeoutTimestamp."""

    __slots__ = ("_val", "_timed_out", "_wm_ms", "_timeout_ms", "_removed")

    def __init__(self, val, timed_out: bool, wm_ms: int):
        self._val = val  # tuple | None
        self._timed_out = timed_out
        self._wm_ms = wm_ms
        self._timeout_ms = _NO_TIMEOUT
        self._removed = False

    @property
    def exists(self) -> bool:
        return self._val is not None

    @property
    def get(self):
        if self._val is None:
            raise ValueError("State is either not defined or has already been removed")
        return self._val

    @property
    def getOption(self):
        return self._val

    @property
    def hasTimedOut(self) -> bool:
        return self._timed_out

    def getCurrentWatermarkMs(self) -> int:
        return self._wm_ms

    def update(self, new_value) -> None:
        if new_value is None:
            raise ValueError("'None' is not a valid state value")
        self._val = tuple(new_value)
        self._removed = False

    def remove(self) -> None:
        self._val = None
        self._removed = True
        self._timeout_ms = _NO_TIMEOUT

    def setTimeoutTimestamp(self, ts_ms: int) -> None:
        # mirrors GroupStateImpl's contract (callers already obey it)
        if ts_ms <= self._wm_ms:
            raise ValueError(
                "Timeout timestamp must be larger than current watermark"
            )
        self._timeout_ms = int(ts_ms)


def _canon_key(v, dt: T.DataType):
    """pandas cell -> the Python value Spark would pass as the group
    key (None for null; int for integral types even when pandas
    widened the column to float64 to hold NaNs)."""
    import pandas as pd

    if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
        return None
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return int(v)
    if isinstance(dt, T.StringType):
        return str(v)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return float(v)
    return v


def bucketed_stateful_apply(
    prepared: DataFrame,
    process,
    out_schema: T.StructType,
    state_schema: T.StructType,
    output_mode: str,
    key_field: str = "key",
    n_buckets: int | None = None,
) -> DataFrame:
    """prepared.groupBy(key_field).applyInPandasWithState(process, ...)
    with EventTimeTimeout, restructured to group by a hash bucket of
    the key — same per-key calls, same results, B groups instead of
    n_keys."""
    import pandas as pd

    if n_buckets is None:
        n_buckets = int(os.environ.get("SPARK_GRAFT_STREAM_BUCKETS", "0")) or (
            4 * prepared.sparkSession.sparkContext.defaultParallelism
        )
    if n_buckets <= 1:
        return prepared.groupBy(key_field).applyInPandasWithState(
            process,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode=output_mode,
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )

    key_dt = prepared.schema[key_field].dataType
    n_state_fields = len(state_schema.fields)

    def bucket_process(
        _bkey: tuple, pdfs: Iterator["pd.DataFrame"], state
    ) -> Iterator["pd.DataFrame"]:
        wm_ms = state.getCurrentWatermarkMs()
        # bucket state: {"k": [key, ...], "t": [timeout_ms|None, ...],
        # "p": [[payload_field, ...], ...]} — inner payloads are the
        # per-key process's own state tuples (JSON strings mostly),
        # carried opaque.
        if state.exists:
            st = json.loads(state.get[0])
            keys, touts, payloads = st["k"], st["t"], st["p"]
        else:
            keys, touts, payloads = [], [], []
        slot = {k if isinstance(k, (int, str)) else tuple(k): i
                for i, k in enumerate(keys)}

        # split incoming rows per key (null-safe; dtypes preserved)
        per_key_pdfs: dict = {}
        if not state.hasTimedOut:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                for kv, grp in pdf.groupby(key_field, dropna=False, sort=False):
                    k = _canon_key(kv, key_dt)
                    per_key_pdfs.setdefault(k, []).append(grp)

        outs: list = []

        def run_key(k, kpdfs, timed_out: bool) -> None:
            i = slot.get(k)
            shim = _KeyState(
                tuple(payloads[i]) if i is not None else None,
                timed_out,
                wm_ms,
            )
            for out in process((k,), iter(kpdfs), shim):
                if len(out):
                    outs.append(out)
            if shim._val is None:
                if i is not None:
                    # mark dead; compacted below
                    payloads[i] = None
                    touts[i] = _NO_TIMEOUT
            else:
                val = list(shim._val)
                if len(val) != n_state_fields:
                    raise ValueError(
                        f"state tuple arity {len(val)} != schema "
                        f"{n_state_fields}"
                    )
                if i is None:
                    slot[k] = len(keys)
                    keys.append(k)
                    payloads.append(val)
                    touts.append(shim._timeout_ms)
                else:
                    payloads[i] = val
                    touts[i] = shim._timeout_ms

        for k, kpdfs in per_key_pdfs.items():
            run_key(k, kpdfs, False)
        # Stored keys with no data this batch whose timeout is due.
        # Spark fires EventTimeTimeout strictly AFTER the watermark
        # passes the timestamp (tout < wm); we additionally fire
        # tout == wm one batch EARLY — safe because every kernel is
        # chunking-invariant (advancing at wm then wm' ≡ advancing at
        # wm', property-tested), and necessary so the bucket's next
        # Spark timeout (min over keys, which must be > wm) can always
        # be the exact ms a per-key timeout would fire at; firing LATE
        # could drop a final-batch emission.
        for i in range(len(keys)):
            if (
                payloads[i] is not None
                and keys[i] not in per_key_pdfs
                and touts[i] is not _NO_TIMEOUT
                and touts[i] <= wm_ms
            ):
                run_key(keys[i], [], True)

        live = [i for i, p in enumerate(payloads) if p is not None]
        if live:
            state.update(
                (
                    json.dumps(
                        {
                            "k": [keys[i] for i in live],
                            "t": [touts[i] for i in live],
                            "p": [payloads[i] for i in live],
                        }
                    ),
                )
            )
            next_t = min(
                (touts[i] for i in live if touts[i] is not _NO_TIMEOUT),
                default=_NO_TIMEOUT,
            )
            if next_t is not _NO_TIMEOUT:
                state.setTimeoutTimestamp(max(next_t, wm_ms + 1))
        elif state.exists:
            state.remove()

        if outs:
            yield pd.concat(outs, ignore_index=True) if len(outs) > 1 else outs[0]

    bucketed = prepared.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key_field)), F.lit(n_buckets))
    )
    return bucketed.groupBy("_bucket").applyInPandasWithState(
        bucket_process,
        outputStructType=out_schema,
        stateStructType=T.StructType(
            [T.StructField("payload", T.StringType())]
        ),
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
