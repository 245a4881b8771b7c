"""Stream-stream joins: watermarked, time-bounded equi-joins.

An unbounded stream⋈stream join would need infinite state on both sides;
Structured Streaming makes it tractable with (a) watermarks on BOTH inputs
and (b) a time-range predicate tying the two event times together — state
for a row is dropped once the other side's watermark passes the bound.

The canonical use is attribution: match each conversion to the triggering
action within a window (click → purchase ≤ N hours later). State size is
O(rows inside the time bound), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_gap: str = "2 hours",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on ``key`` where the right event lands within
    (left_ts, left_ts + max_gap]. Both sides MUST carry distinct timestamp
    column names. Watermarks bound both join-state buffers.

    ``how="leftOuter"`` emits a null-padded row for each unmatched left
    event once the watermark passes its time bound (state eviction is
    what makes streaming outer joins well-defined) — exercised in
    tests/test_streaming.py::
    test_interval_join_left_outer_emits_unmatched_after_eviction."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") > F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_gap}")
        )
    )
    return lw.alias("l").join(rw.alias("r"), cond, how)
