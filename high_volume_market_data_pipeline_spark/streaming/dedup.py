"""Streaming deduplication — the streaming analogue of batch W1
(bronze_to_silver_crypto.py:76-83).

``dropDuplicates`` on a streaming DataFrame keeps the FIRST arrival per key;
``withWatermark`` bounds the key state: keys older than the watermark are
evicted (a duplicate arriving later than the delay passes through — the
batch MERGE reconciliation catches it, same contract as the reference's
dedup-then-MERGE Silver stage).
"""

from __future__ import annotations

import warnings

from collections.abc import Sequence

from pyspark.sql import DataFrame


def streaming_dedup(
    sdf: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
    within_watermark: bool = False,
) -> DataFrame:
    """``within_watermark=True`` uses dropDuplicatesWithinWatermark
    (Spark 3.5+): the event-time column need NOT be part of the key, and a
    duplicate arriving within the watermark delay of the first copy is
    dropped even if its timestamp differs — the right semantics when
    retries re-send the same logical record with a fresh timestamp. Plain
    dropDuplicates needs exact key equality (ts included) forever-unique."""
    marked = sdf.withWatermark(ts_col, watermark)
    if within_watermark:
        return marked.dropDuplicatesWithinWatermark(list(keys))
    subset = list(keys)
    if ts_col not in subset:
        # Spark only EVICTS dropDuplicates state when the event-time
        # column is part of the dedup subset — without it every key is
        # retained forever (unbounded state on a long-running stream) and
        # the watermark-eviction contract above is silently false. Plain
        # dropDuplicates is exact-dup semantics, so ts belongs in the key
        # anyway — but widening the subset is a SEMANTIC change for a
        # caller deduping on keys alone (same key, different ts now passes
        # through), so surface it instead of doing it silently; callers
        # who want ts-insensitive dedup want within_watermark=True.
        warnings.warn(
            f"streaming_dedup: '{ts_col}' added to the dedup subset "
            f"{subset} so watermark eviction can bound state — rows with "
            "an equal key but a different timestamp are NOT duplicates "
            "under this subset; pass within_watermark=True for "
            "timestamp-insensitive dedup",
            stacklevel=2,
        )
        subset.append(ts_col)
    return marked.dropDuplicates(subset)
