"""S8 — versioned parquet table: history, time travel, restore, vacuum.

Reference parity: view_delta_history.py:44-72 (history DataFrame, newest
first), README time-travel claims; M5 existence probe.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.sinks.history import (
    VersionedParquetTable,
)


@pytest.fixture()
def table(tmp_path):
    return VersionedParquetTable(str(tmp_path / "tbl"))


def _df(spark, n, tag):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def test_versions_and_time_travel(spark, table):
    assert not table.exists()
    v0 = table.write(_df(spark, 5, "a"), "WRITE")
    v1 = table.write(_df(spark, 8, "b"), "MERGE")
    assert (v0, v1) == (0, 1)
    assert table.exists()

    assert table.read(spark).count() == 8
    assert table.read(spark, version=0).count() == 5
    assert table.read(spark, version=0).select("tag").distinct().collect()[0][0] == "a"

    ts0 = table._manifests()[0]["timestamp"]
    assert table.read(spark, as_of_ts=ts0).count() == 5


def test_history_newest_first(spark, table):
    table.write(_df(spark, 3, "a"), "WRITE", {"mode": "overwrite"})
    table.write(_df(spark, 4, "b"), "OPTIMIZE")
    hist = table.history(spark).collect()
    assert [r["version"] for r in hist] == [1, 0]
    assert [r["operation"] for r in hist] == ["OPTIMIZE", "WRITE"]


def test_restore_recommits_old_snapshot(spark, table):
    table.write(_df(spark, 5, "a"), "WRITE")
    table.write(_df(spark, 9, "b"), "WRITE")
    v2 = table.restore(spark, 0)
    assert v2 == 2
    assert table.read(spark).count() == 5
    assert table.history(spark).collect()[0]["operation"] == "RESTORE"


def test_vacuum_retires_below_horizon(spark, table):
    for i in range(4):
        table.write(_df(spark, i + 1, f"t{i}"), "WRITE")
    removed = table.vacuum(keep_last=2)
    assert sorted(removed) == [0, 1]
    assert table.read(spark).count() == 4
    assert table.read(spark, version=2).count() == 3
    with pytest.raises((ValueError, FileNotFoundError)):
        table.read(spark, version=0)


def test_merge_upsert_versioned_transactional(spark, table):
    """K3 through the manifest log: MERGE commits a new version — source
    wins on key collisions, unmatched rows survive, and the pre-merge
    state stays time-travelable (the transactional behavior the reference
    gets from Delta MERGE, bronze_to_silver_crypto.py:96-108)."""
    from high_volume_market_data_pipeline_spark.sinks.merge import (
        merge_upsert_versioned,
    )

    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 10)], "id int, val string, seq int"
    )
    v0 = merge_upsert_versioned(base, table, keys=["id"], order_col="seq")
    update = spark.createDataFrame(
        [(2, "B2", 20), (3, "c", 20)], "id int, val string, seq int"
    )
    v1 = merge_upsert_versioned(update, table, keys=["id"], order_col="seq")
    assert (v0, v1) == (0, 1)

    now = {(r["id"], r["val"]) for r in table.read(spark).collect()}
    assert now == {(1, "a"), (2, "B2"), (3, "c")}
    before = {(r["id"], r["val"]) for r in table.read(spark, version=0).collect()}
    assert before == {(1, "a"), (2, "b")}
    assert table.history(spark).collect()[0]["operation"] == "MERGE"


def test_crashed_writer_leaves_current_version_intact(spark, table):
    table.write(_df(spark, 5, "a"), "WRITE")
    # Simulate a writer that died after the snapshot dir, before the
    # manifest: readers must still see v0; vacuum cleans the orphan.
    orphan = os.path.join(table.root, "_v00000042")
    _df(spark, 2, "zz").write.parquet(orphan)
    assert table.latest_version() == 0
    assert table.read(spark).count() == 5
    removed = table.vacuum(keep_last=1)
    assert 42 in removed
    assert not os.path.exists(orphan)
