"""Windowed streaming aggregations: tumbling / sliding / session.

Each takes an event-time column + watermark delay and returns the
transformed streaming DataFrame (composable — caller picks the sink).
Watermarks bound state: at scale the store holds only windows newer than
(max event time − delay); late rows beyond it are dropped (the batch
MERGE reconciliation path covers them, reference K3 analogue).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    sdf: DataFrame,
    ts_col: str,
    window_len: str,
    group_by: Sequence[str],
    aggs: Sequence[Column],
    watermark: str = "10 minutes",
) -> DataFrame:
    """Non-overlapping event-time windows (epoch-aligned)."""
    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len), *group_by)
        .agg(*aggs)
    )


def sliding_window_agg(
    sdf: DataFrame,
    ts_col: str,
    window_len: str,
    slide: str,
    group_by: Sequence[str],
    aggs: Sequence[Column],
    watermark: str = "10 minutes",
) -> DataFrame:
    """Overlapping windows: each event lands in window_len/slide windows."""
    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_len, slide), *group_by)
        .agg(*aggs)
    )


def session_window_agg(
    sdf: DataFrame,
    ts_col: str,
    gap: str,
    group_by: Sequence[str],
    aggs: Sequence[Column],
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based session windows: a session closes after ``gap`` of
    inactivity per group key (dynamic, data-driven windows — state merges
    adjacent sessions as rows arrive)."""
    return (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), *group_by)
        .agg(*aggs)
    )
