"""Bucketed tables: pre-shuffled storage for co-located, exchange-free joins.

At 100 TB the dominant cost of a fact⋈fact join is shuffling both sides.
Writing both tables bucketed by the join key with the SAME bucket count
stores them pre-partitioned: Spark's scan reports the bucketing as the
output partitioning, and the join plans with NO Exchange on either side
(asserted in tests/test_skew_bucketing.py).

Bucketing lives in the session catalog (saveAsTable — path-based parquet
has nowhere to record bucket metadata). Bucket count rule of thumb: total
table size / target partition size (128 MB), rounded to a power of two,
and IDENTICAL on both sides of the intended join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) managed table.
    Sorting within buckets additionally removes the Sort from sort-merge
    joins and enables efficient range scans within each bucket file."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — preserves bucketing metadata (a path read would not)."""
    return spark.table(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
