"""Streaming sinks: foreachBatch upsert — the streaming analogue of the
reference's partition-scoped overwrite / MERGE (K2/K3,
extract_crypto_data.py:226-241, bronze_to_silver_crypto.py:96-108).

foreachBatch hands each micro-batch to a batch function, so the batch
sink library (sinks/) is reused verbatim — one upsert implementation for
both batch and streaming paths.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def foreach_batch_upsert(
    sdf: DataFrame,
    target_path: str,
    keys: Sequence[str],
    order_col: str,
    checkpoint: str,
    partition_by: str | None = None,
) -> StreamingQuery:
    """Upsert each micro-batch into a parquet target: latest row per key
    wins (merge_upsert's union+dedup+rewrite — the same observable
    semantics as a Delta MERGE; see sinks/merge.py)."""
    from high_volume_market_data_pipeline_spark.sinks.merge import merge_upsert

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(
            batch_df,
            target_path,
            keys=list(keys),
            order_col=order_col,
            partition_by=partition_by,
        )

    return (
        sdf.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def foreach_batch_apply(
    sdf: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint: str,
) -> StreamingQuery:
    """General foreachBatch escape hatch (custom batch-side logic)."""
    return (
        sdf.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
