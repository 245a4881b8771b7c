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


def data_scoped_shuffle(spark, input_partitions: int, floor: int = 8):
    """L4 (r13): context manager that sizes shuffle partitions to the
    DATA for an eager, below-session-scale region, and turns AQE off for
    it (with floor-sized shuffles nothing can skew and nothing needs
    re-planning, but under AQE every exchange materializes as its own
    Spark job — at micro-batch/model scale the per-job driver round-trip
    IS the cost; measured on the r13 lifecycle rows: 77→42 and 35→16
    jobs per run). ``input_partitions`` is the input's own scan layout —
    thousands of splits at 100 TB leave the session conf and AQE
    untouched, so the scoping is scale-adaptive, never a local-mode
    constant. Both settings are restored on exit; only wrap code that
    MATERIALIZES inside the region (a lazily returned frame plans at
    whatever conf its consumer runs under)."""
    from contextlib import contextmanager

    @contextmanager
    def scope():
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        target = max(floor, min(int(prev_parts), input_partitions))
        changed = target < int(prev_parts)
        if changed:
            spark.conf.set("spark.sql.shuffle.partitions", str(target))
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            yield
        finally:
            if changed:
                spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
                spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)

    return scope()


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
