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
    one snapshot row per key per micro-batch that touches the key.

    ``key`` must be a bigint column (enforced, like timeout_sessions —
    the output schema is typed and a mismatched handler value fails only
    at runtime inside the streaming query); the output key column keeps
    the input column name."""
    from pyspark.sql.types import LongType

    if not isinstance(sdf.schema[key].dataType, LongType):
        raise TypeError(
            f"running_user_totals requires a bigint key column; {key!r} is "
            f"{sdf.schema[key].dataType.simpleString()}"
        )

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
                key: [key_tuple[0]],
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
                f"{key} bigint, n_events bigint, "
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
    """Custom sessionization with EVENT-TIME TIMEOUT eviction: per key,
    events merge into gap-separated session INTERVALS held in state; when
    the watermark passes (last event + gap) — the key has gone idle — the
    handler fires with ``state.hasTimedOut`` and every buffered session
    emits exactly once, finalized (no event still admissible under the
    watermark can extend or bridge them).

    State is a LIST of disjoint intervals, not one (start, end) pair:
    events arriving more than ``gap_seconds`` apart — even inside one
    micro-batch — form separate sessions, and a late-but-valid event can
    still bridge two buffered intervals before eviction (the same merge
    semantics as the built-in ``session_window``). Emission happens ONLY
    in the timed-out branch, so a session can never emit early or twice;
    the cost is that sessions of a continuously-active key buffer until
    its first idle gap. Built-in session windows remain the right
    default; this operator is the template for session state that needs
    custom payloads (e.g. per-session feature vectors) that
    ``session_window`` cannot carry.

    ``key`` must be a bigint column (enforced — the output schema is
    typed); the output key column keeps the input column name."""
    from pyspark.sql.types import LongType

    if not isinstance(sdf.schema[key].dataType, LongType):
        raise TypeError(
            f"timeout_sessions requires a bigint key column; {key!r} is "
            f"{sdf.schema[key].dataType.simpleString()}"
        )
    gap_us = gap_seconds * 1_000_000

    def _merge(
        intervals: list[tuple[int, int, int]], ts_sorted: list[int]
    ) -> list[tuple[int, int, int]]:
        """Merge sorted event times into the sorted interval list,
        gap-splitting: intervals within gap_us of each other coalesce."""
        merged = sorted(intervals + [(t, t, 1) for t in ts_sorted])
        out: list[tuple[int, int, int]] = []
        for s, e, n in merged:
            if out and s - out[-1][1] <= gap_us:
                ps, pe, pn = out[-1]
                out[-1] = (ps, max(pe, e), pn + n)
            else:
                out.append((s, e, n))
        return out

    def update(
        key_tuple: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            starts, ends, ns = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    key: [key_tuple[0]] * len(starts),
                    "session_start": [
                        pd.Timestamp(s, unit="us") for s in starts
                    ],
                    "session_end": [pd.Timestamp(e, unit="us") for e in ends],
                    "n_events": list(ns),
                }
            )
            return
        intervals: list[tuple[int, int, int]] = []
        if state.exists:
            starts, ends, ns = state.get
            intervals = list(zip(starts, ends, ns))
        for pdf in pdfs:
            ts_us = sorted(pdf[ts_col].astype("int64") // 1000)  # ns → µs
            intervals = _merge(intervals, ts_us)
        state.update(
            (
                [s for s, _, _ in intervals],
                [e for _, e, _ in intervals],
                [n for _, _, n in intervals],
            )
        )
        # re-arm: close when the WATERMARK passes last-event + gap
        state.setTimeoutTimestamp(intervals[-1][1] // 1000 + gap_seconds * 1000)
        yield pd.DataFrame(
            {
                key: pd.Series([], dtype="int64"),
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
                f"{key} bigint, session_start timestamp, "
                "session_end timestamp, n_events bigint"
            ),
            stateStructType=(
                "starts array<bigint>, ends array<bigint>, ns array<bigint>"
            ),
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
    from pyspark.sql.types import LongType

    if not isinstance(sdf.schema[key].dataType, LongType):
        raise TypeError(
            f"running_user_totals_tws requires a bigint key column; "
            f"{key!r} is {sdf.schema[key].dataType.simpleString()}"
        )
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
                    key: [key_tuple[0]],
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
                f"{key} bigint, n_events bigint, "
                "total_value double, batch_rows bigint"
            ),
            outputMode="append",
            timeMode="none",
        )
    )
