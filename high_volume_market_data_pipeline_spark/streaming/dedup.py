"""Streaming deduplication — the streaming analogue of batch W1
(bronze_to_silver_crypto.py:76-83).

``dropDuplicates`` on a streaming DataFrame keeps the FIRST arrival per key;
``withWatermark`` bounds the key state: keys older than the watermark are
evicted (a duplicate arriving later than the delay passes through — the
batch MERGE reconciliation catches it, same contract as the reference's
dedup-then-MERGE Silver stage).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def streaming_dedup(
    sdf: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    return sdf.withWatermark(ts_col, watermark).dropDuplicates(list(keys))
