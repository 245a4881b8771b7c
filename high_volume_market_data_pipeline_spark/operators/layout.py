"""Physical-layout operators (SURVEY.md §2.8 L1–L3).

Parity targets: repartition("partition_date") so window + groupBy share one
exchange (silver_to_gold_crypto_stats.py:67-69); coalesce(1) on tiny outputs
(:145-146); cache+count lineage barrier (main_pipeline.py:273-274).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copartition_by(df: DataFrame, columns: Sequence[str], n: int | None = None) -> DataFrame:
    """L1: hash-repartition on columns so subsequent window+agg on the same
    key run partition-local off one shuffle (Catalyst reuses the exchange)."""
    cols = [F.col(c) for c in columns]
    return df.repartition(n, *cols) if n else df.repartition(*cols)


def compact_output(df: DataFrame, n: int = 1) -> DataFrame:
    """L2: coalesce small final outputs to limit file count. Only for
    known-small results — coalesce(1) on a big result serializes the write."""
    return df.coalesce(n)


def materialize(df: DataFrame) -> DataFrame:
    """L3: cache + count barrier — break lineage so downstream stages don't
    recompute upstream (the reference's Silver pin, main_pipeline.py:273-274)."""
    df = df.cache()
    df.count()
    return df


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Fan a narrow input out to at least ``min_partitions`` (default: the
    cluster's defaultParallelism) before CPU-dense per-row work.

    At scale this is a no-op — a 100 TB scan already yields thousands of
    input splits — but a small/single-file input otherwise pins an expensive
    expression stage (md5 shingling, feature extraction) to one core.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
