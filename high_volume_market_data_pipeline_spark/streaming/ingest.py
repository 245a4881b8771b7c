"""Streaming sources + the run-to-completion harness.

File-based `readStream` is the production pattern for replayable ingestion
(each micro-batch picks up newly-arrived files; `maxFilesPerTrigger`
throttles). `availableNow` processes the current backlog then stops —
giving deterministic end-state runs for the correctness gate.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream over a parquet directory (streams require an explicit
    schema — no inference job at stream start)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def run_to_memory_sink(
    sdf: DataFrame,
    output_mode: str = "complete",
    query_name: str | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink; return the materialized result as a batch DataFrame.

    Memory sink is a test/verification surface only — production sinks are
    foreachBatch/parquet (streaming/sink.py). The unique query name keeps
    repeated runs in one session from colliding.
    """
    name = query_name or f"q_{uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sdf.sparkSession.table(name)
