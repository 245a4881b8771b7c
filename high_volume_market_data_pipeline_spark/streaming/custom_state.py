"""Custom stateful streaming operator via applyInPandasWithState.

Built-in streaming aggregations cover windowed/keyed aggregates; anything
with BESPOKE state transitions (running totals that survive across
micro-batches, counters with custom reset rules, online model state) needs
the arbitrary-state API: ``groupBy(key).applyInPandasWithState(fn,
output_schema, state_schema, mode, timeout)``.

This module implements the canonical shape: per-key running totals that
persist in the state store across micro-batches, emitting one updated
snapshot row per key per batch. The handler receives Arrow-batched pandas
frames (never per-row Python) and a GroupState handle; state is a plain
tuple matching ``state_schema``.

Scale notes:
- state is partitioned by the grouping key across the state store (RocksDB
  in production configs); per-batch cost is O(keys touched in that batch);
- the watermark bounds how late data may arrive; ``timeout_sessions``
  shows EventTimeTimeout eviction (idle keys close and emit once),
  ``running_user_totals`` uses NoTimeout (totals live for the stream's
  lifetime);
- output mode "append" emits only the per-batch snapshots, so downstream
  sinks see an incremental change log of the running totals.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(
    sdf: DataFrame,
    key: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming per-key running (count, sum) maintained in arbitrary state;
    one snapshot row per key per micro-batch that touches the key."""

    def update(
        key_tuple: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        batch_rows = 0
        for pdf in pdfs:
            batch_rows += len(pdf)
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key_tuple[0]],
                "n_events": [n],
                "total_value": [total],
                "batch_rows": [batch_rows],
            }
        )

    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id bigint, n_events bigint, "
                "total_value double, batch_rows bigint"
            ),
            stateStructType="n bigint, total double",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def timeout_sessions(
    sdf: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom sessionization with EVENT-TIME TIMEOUT eviction: a key's
    session stays open in state while events keep arriving within
    ``gap_seconds``; when the watermark passes (last event + gap), Spark
    invokes the handler with ``state.hasTimedOut`` and the CLOSED session
    emits exactly once.

    This is the piece the built-in ``session_window`` (streaming/windows.py)
    hides: here the eviction contract is explicit — emission happens in
    the timed-out branch, not on data arrival, so a session row can never
    be emitted early or twice. State per key is three integers; the
    timeout timestamp re-arms on every batch that touches the key.
    Built-in session windows remain the right default; this operator is
    the template for session state that needs custom payloads (e.g.
    per-session feature vectors) that ``session_window`` cannot carry."""

    def update(
        key_tuple: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key_tuple[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        start_us, end_us, n = (
            state.get if state.exists else (None, None, 0)
        )
        for pdf in pdfs:
            ts_us = pdf[ts_col].astype("int64") // 1000  # ns → µs
            lo, hi = int(ts_us.min()), int(ts_us.max())
            start_us = lo if start_us is None else min(start_us, lo)
            end_us = hi if end_us is None else max(end_us, hi)
            n += len(pdf)
        state.update((start_us, end_us, n))
        # re-arm: close when the WATERMARK passes last-event + gap
        state.setTimeoutTimestamp(end_us // 1000 + gap_seconds * 1000)
        yield pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "session_start": pd.Series([], dtype="datetime64[us]"),
                "session_end": pd.Series([], dtype="datetime64[us]"),
                "n_events": pd.Series([], dtype="int64"),
            }
        )

    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(key)
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id bigint, session_start timestamp, "
                "session_end timestamp, n_events bigint"
            ),
            stateStructType="start_us bigint, end_us bigint, n bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def running_user_totals_tws(
    sdf: DataFrame,
    key: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Spark 4 twin of :func:`running_user_totals` on the
    ``transformWithStateInPandas`` API (the designated successor of
    ``applyInPandasWithState``): a ``StatefulProcessor`` with a typed
    ``ValueState`` instead of a raw state tuple.

    Same observable semantics as the legacy operator — one (count, sum)
    snapshot row per key per micro-batch — so both are pinned by the same
    batch-equivalence test. Requires the RocksDB state-store provider
    (set per-query in tests; that is also the production configuration,
    where RocksDB keeps state off-heap and incremental-checkpoints to the
    checkpoint location).

    ENVIRONMENT GATE: the transformWithState protocol talks to the JVM
    state server over protobuf; ``google.protobuf`` is not installed in
    this container (and installs are disallowed), so executing the returned
    stream here fails in Spark's driver worker. The operator is complete
    and the test runs wherever protobuf is present (it skips otherwise);
    ``running_user_totals`` (applyInPandasWithState) is the executable
    twin in this environment.
    """
    try:  # fail fast with a clear message instead of a worker crash
        import google.protobuf  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "transformWithStateInPandas requires google.protobuf, which is "
            "not installed in this environment; use running_user_totals "
            "(applyInPandasWithState) instead"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState(
                "totals", "n bigint, total double"
            )

        def handleInputRows(
            self, key_tuple: Any, rows: Iterator[pd.DataFrame], timer_values
        ) -> Iterator[pd.DataFrame]:
            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            batch_rows = 0
            for pdf in rows:
                batch_rows += len(pdf)
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key_tuple[0]],
                    "n_events": [n],
                    "total_value": [total],
                    "batch_rows": [batch_rows],
                }
            )

        def close(self) -> None:
            pass

    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(key)
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=(
                "user_id bigint, n_events bigint, "
                "total_value double, batch_rows bigint"
            ),
            outputMode="append",
            timeMode="none",
        )
    )
