"""Streaming data-quality monitoring: the batch expectation operator
(operators/quality.check_expectations) applied per micro-batch through
foreachBatch, appending a violation ledger a dashboard or circuit-breaker
tails.

One batch function serves both worlds (the streaming/sink.py pattern): the
per-batch report is a handful of rows (one per rule), so the ledger append
costs nothing next to the stream itself; gating logic (kill the stream or
quarantine a batch when a rule fails) belongs in the caller's handler via
``on_violation``.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from high_volume_market_data_pipeline_spark.operators.quality import (
    check_expectations,
)


def monitor_expectations(
    sdf: DataFrame,
    rules: Mapping[str, Column],
    log_path: str,
    checkpoint: str,
    on_violation: Callable[[DataFrame, int], None] | None = None,
    trigger: Mapping[str, object] | None = None,
) -> StreamingQuery:
    """Evaluate ``rules`` on every micro-batch and append one row per rule
    to the parquet ledger at ``log_path`` (batch_id, rule, n_rows,
    n_violations, passed). ``on_violation`` (if given) is called with the
    failing rules frame and the batch id — raise there to fail the stream,
    or divert the batch to quarantine.

    ``trigger`` passes through to ``writeStream.trigger(**trigger)``:
    default ``{"availableNow": True}`` drains what's there and stops (the
    testable batch-equivalence mode); pass
    ``{"processingTime": "30 seconds"}`` to run as a long-lived continuous
    monitor."""
    trigger_kwargs = dict(trigger) if trigger else {"availableNow": True}

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        report = check_expectations(batch_df, rules).withColumn(
            "batch_id", F.lit(batch_id)
        )
        report.persist()
        try:
            report.write.mode("append").parquet(log_path)
            if on_violation is not None:
                failing = report.filter(~F.col("passed"))
                if failing.limit(1).count() > 0:
                    on_violation(failing, batch_id)
        finally:
            report.unpersist()

    return (
        sdf.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(**trigger_kwargs)
        .start()
    )
