"""Streaming behavior tests beyond the end-state oracle: multi-batch
arrival, streaming dedup across batches, foreachBatch upsert sink."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from high_volume_market_data_pipeline_spark.streaming import (
    read_parquet_stream,
    run_to_memory_sink,
    streaming_dedup,
    tumbling_window_agg,
)
from high_volume_market_data_pipeline_spark.streaming.sink import (
    foreach_batch_upsert,
)

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("seq", LongType()),
        StructField("ts", TimestampType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
        path
    )


def _ts(spark, s):
    return spark.sql(f"SELECT timestamp'{s}' t").collect()[0].t


def test_streaming_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    t1 = _ts(spark, "2024-01-01 10:00:00")
    _write_batch(spark, src, [(1, 1, t1), (1, 2, t1), (2, 1, t1)])
    sdf = read_parquet_stream(spark, src, SCHEMA, max_files_per_trigger=1)
    deduped = streaming_dedup(sdf, ["k", "ts"], "ts", "1 hour")
    out = run_to_memory_sink(deduped, output_mode="append")
    rows = out.collect()
    # one row per (k, ts): first arrival wins
    assert {r.k for r in rows} == {1, 2}
    assert len(rows) == 2


def test_tumbling_window_multi_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    t1 = _ts(spark, "2024-01-01 10:15:00")
    t2 = _ts(spark, "2024-01-01 11:45:00")
    _write_batch(spark, src, [(1, 1, t1), (2, 2, t1)])
    _write_batch(spark, src, [(3, 3, t2)])
    sdf = read_parquet_stream(spark, src, SCHEMA, max_files_per_trigger=1)
    agg = tumbling_window_agg(
        sdf, "ts", "1 hour", [], [F.count(F.lit(1)).alias("n")]
    )
    out = run_to_memory_sink(agg, output_mode="complete")
    got = {
        (r["window"].start.isoformat(), r.n) for r in out.collect()
    }
    assert got == {("2024-01-01T10:00:00", 2), ("2024-01-01T11:00:00", 1)}


def test_foreach_batch_upsert_sink(spark, tmp_path):
    src = str(tmp_path / "src")
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")
    t1 = _ts(spark, "2024-01-01 10:00:00")
    t2 = _ts(spark, "2024-01-01 10:30:00")
    _write_batch(spark, src, [(1, 1, t1), (2, 1, t1)])
    _write_batch(spark, src, [(1, 2, t2)])  # upsert k=1 with newer seq
    sdf = read_parquet_stream(spark, src, SCHEMA, max_files_per_trigger=1)
    q = foreach_batch_upsert(sdf, target, keys=["k"], order_col="seq", checkpoint=ckpt)
    q.awaitTermination()
    rows = {(r.k, r.seq) for r in spark.read.parquet(target).collect()}
    assert rows == {(1, 2), (2, 1)}
