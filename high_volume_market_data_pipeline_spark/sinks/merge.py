"""MERGE upsert (K3) — Delta when available, parquet-native otherwise.

Reference semantics (bronze_to_silver_crypto.py:96-108): MERGE ON composite
key, whenMatchedUpdateAll + whenNotMatchedInsertAll — i.e. the source row
wins for existing keys, new keys are inserted.

Parquet fallback: union(target, source) → keep-latest window dedup (source
preferred via a precedence column, then ``order_col`` desc) → rewrite via
temp-dir swap. Same observable end state; the swap is not transactional
(Delta's log is the real answer — the fallback documents the gap rather
than faking it).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.operators.dedup import dedup_keep_latest

_PRECEDENCE = "_merge_precedence"


def _delta_available(spark: SparkSession) -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def merge_upsert(
    source: DataFrame,
    target_path: str,
    keys: list[str],
    order_col: str,
    partition_by: str | None = None,
) -> None:
    """Upsert ``source`` into the table at ``target_path`` on ``keys``."""
    spark = source.sparkSession
    if _delta_available(spark):
        _merge_delta(spark, source, target_path, keys)
        return
    _merge_parquet(spark, source, target_path, keys, order_col, partition_by)


def _merge_delta(
    spark: SparkSession, source: DataFrame, target_path: str, keys: list[str]
) -> None:
    from delta.tables import DeltaTable

    if not DeltaTable.isDeltaTable(spark, target_path):
        source.write.format("delta").save(target_path)
        return
    target = DeltaTable.forPath(spark, target_path)
    cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
    (
        target.alias("t")
        .merge(source.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )


def _merge_parquet(
    spark: SparkSession,
    source: DataFrame,
    target_path: str,
    keys: list[str],
    order_col: str,
    partition_by: str | None,
) -> None:
    writer_cols = source.columns

    def write_to(df: DataFrame, path: str) -> None:
        w = df.select(*writer_cols).write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(path)

    if not os.path.exists(target_path):
        write_to(source, target_path)
        return
    target = spark.read.parquet(target_path)
    merged = dedup_keep_latest(
        target.withColumn(_PRECEDENCE, F.lit(0)).unionByName(
            source.withColumn(_PRECEDENCE, F.lit(1))
        ),
        keys,
        [F.desc(_PRECEDENCE), F.desc(order_col)],
    )
    # Crash-safe swap: park the old table aside BEFORE promoting the new
    # one and delete it only after the promotion rename succeeded. A crash
    # at any point leaves either the old table in place or the old copy in
    # ``__old_*`` — never a state where the ``__merge_*`` temp is the only
    # surviving copy (which vacuum would then delete: data loss).
    tmp = f"{target_path}__merge_{uuid.uuid4().hex[:8]}"
    write_to(merged, tmp)
    old = f"{target_path}__old_{uuid.uuid4().hex[:8]}"
    os.rename(target_path, old)
    try:
        os.rename(tmp, target_path)
    except OSError:
        os.rename(old, target_path)  # roll back; tmp left for vacuum
        raise
    shutil.rmtree(old)
