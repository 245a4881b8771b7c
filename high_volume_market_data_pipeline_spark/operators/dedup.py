"""Window-based deduplication (SURVEY.md §2.6 W1, §2.3 P5).

Parity target: the Silver dedup — row_number over
Window.partitionBy("id","last_updated").orderBy(desc("_ingested_at")), keep
row 1 (bronze_to_silver_crypto.py:76-83).

Scale notes: one shuffle on the key columns; with skewed keys AQE's skew
handling splits oversized partitions. For exact full-row dedup prefer
``dedup_exact`` (hash aggregate, map-side partials) over a window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_ROW_NUMBER = "_row_number"


def dedup_keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Keep exactly one row per key, the first under ``order_by``.

    W1 semantics generalized: the reference orders by desc(_ingested_at) so
    "latest ingest wins"; callers pass e.g. [F.desc("_ingested_at"),
    F.desc("event_id")] — include a unique tiebreaker for determinism
    (SURVEY §7.3: the reference's ties are arbitrary; we pin them).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(_ROW_NUMBER, F.row_number().over(w))
        .filter(F.col(_ROW_NUMBER) == 1)
        .drop(_ROW_NUMBER)
    )


def dedup_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal via hash aggregate (dropDuplicates).

    Cheaper than a window when no "which copy wins" ordering is needed:
    Catalyst plans a partial+final hash aggregate (map-side combine shrinks
    the shuffle), vs. a window's full sort per partition.
    """
    return df.dropDuplicates(list(subset) if subset else None)
