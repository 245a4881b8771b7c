"""Streaming over the versioned table (sources/table_datasource.py):
snapshot-then-tail semantics, structural change-commit skipping, restart
from checkpoint, hive-partitioned deltas, and the vacuum-horizon error.

The source parses the manifest-log format directly (it runs in Spark's
python plan-runner process, which cannot import this package — see the
module docstring), so these tests double as the format-agreement pin:
every fixture is written by sinks/history.py and read back by the
DataSource's own log parser.
"""

from __future__ import annotations

import os

import pytest

from high_volume_market_data_pipeline_spark.sinks.history import (
    VersionedParquetTable,
)
from high_volume_market_data_pipeline_spark.sources.table_datasource import (
    register_table_stream,
)


def _drain_to_parquet(spark, root: str, out: str, ckpt: str) -> list:
    sdf = spark.readStream.format("table_stream").option("root", root).load()
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sorted(tuple(r) for r in spark.read.parquet(out).collect())


def test_snapshot_then_appends_skipping_change_commits(spark, tmp_path):
    """The initial snapshot streams in full, each append streams exactly
    its delta, a COMPACT in the middle is skipped (its rows were already
    emitted), and a restart from the same checkpoint emits only commits
    newer than the last drained offset."""
    register_table_stream(spark)
    t = VersionedParquetTable(str(tmp_path / "tbl"))
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"))
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    t.compact(spark)
    t.append(spark.createDataFrame([(4, "d")], "id long, s string"))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    rows = _drain_to_parquet(spark, t.root, out, ckpt)
    assert rows == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]

    t.append(spark.createDataFrame([(5, "e")], "id long, s string"))
    rows = _drain_to_parquet(spark, t.root, out, ckpt)
    assert rows == [(1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]


def test_partitioned_deltas_fill_partition_columns(spark, tmp_path):
    """Hive-partitioned delta files carry their partition value in the
    DIR NAME, not the file; the pyarrow scan must fill it back per the
    planned schema."""
    register_table_stream(spark)
    t = VersionedParquetTable(str(tmp_path / "ptbl"))
    t.write(
        spark.createDataFrame(
            [(1, "a", 0), (2, "b", 1)], "id long, s string, p long"
        ),
        partition_by="p",
    )
    t.append(
        spark.createDataFrame([(3, "c", 1)], "id long, s string, p long"),
        partition_by="p",
    )
    rows = _drain_to_parquet(
        spark, t.root, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    assert [(r[0], r[1], int(r[2])) for r in rows] == [
        (1, "a", 0),
        (2, "b", 1),
        (3, "c", 1),
    ]


def test_change_commit_raises_unless_skipped(spark, tmp_path):
    """skip_change_commits=false turns an overwrite into a stream error
    (Delta's default posture): re-emitting a rewritten snapshot would
    duplicate every row downstream."""
    register_table_stream(spark)
    t = VersionedParquetTable(str(tmp_path / "ctbl"))
    t.write(spark.createDataFrame([(1, "a")], "id long, s string"))
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string"))
    sdf = (
        spark.readStream.format("table_stream")
        .option("root", t.root)
        .option("skip_change_commits", "false")
        .load()
    )
    q = (
        sdf.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="rewrites existing"):
        q.awaitTermination()


def test_vacuumed_parent_raises_with_hint(spark, tmp_path):
    """A stream lagging behind the vacuum horizon must fail loudly on
    resume (deriving version v's delta needs manifest v-1), never
    silently re-emit shared dirs."""
    register_table_stream(spark)
    t = VersionedParquetTable(str(tmp_path / "vtbl"))
    t.write(spark.createDataFrame([(1, "a")], "id long, s string"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    assert _drain_to_parquet(spark, t.root, out, ckpt) == [(1, "a")]

    # the stream sleeps while the table advances past its vacuum horizon
    t.append(spark.createDataFrame([(2, "b")], "id long, s string"))
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    t.vacuum(keep_last=1, orphan_grace_seconds=0.0)  # retires v0 and v1

    sdf = spark.readStream.format("table_stream").option("root", t.root).load()
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="vacuum"):
        q.awaitTermination()


def test_starting_version_tails_from_later_snapshot(spark, tmp_path):
    """starting_version=N emits N's full state first, then only commits
    after N — the Delta startingVersion contract."""
    register_table_stream(spark)
    t = VersionedParquetTable(str(tmp_path / "stbl"))
    t.write(spark.createDataFrame([(1, "a")], "id long, s string"))
    t.append(spark.createDataFrame([(2, "b")], "id long, s string"))
    t.append(spark.createDataFrame([(3, "c")], "id long, s string"))
    sdf = (
        spark.readStream.format("table_stream")
        .option("root", t.root)
        .option("starting_version", "1")
        .load()
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        sdf.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    # version 1 = snapshot {1,2} (emitted in full), version 2 adds 3
    assert rows == [(1, "a"), (2, "b"), (3, "c")]


def test_schema_evolution_null_fills_via_head_schema(spark, tmp_path):
    """A merge-schema append adds a column; the stream plans against the
    HEAD schema, so rows from pre-evolution files come back with the new
    column null (pyarrow casts each file to the planned schema)."""
    register_table_stream(spark)
    t = VersionedParquetTable(str(tmp_path / "etbl"))
    t.write(spark.createDataFrame([(1, "a")], "id long, s string"))
    t.append(
        spark.createDataFrame([(2, "b", 0.5)], "id long, s string, q double"),
        merge_schema=True,
    )
    rows = _drain_to_parquet(
        spark, t.root, str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    assert rows == [(1, "a", None), (2, "b", 0.5)]
