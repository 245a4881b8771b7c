"""Projection / cast / enrichment operators (SURVEY.md §2.3 P1–P3).

Parity targets in the reference:
- P1 typed projection with casts: bronze_to_silver_crypto.py:62-71
- P2 projection with rename/cast: fast_pipeline.py:33-38
- P3 enrichment chain (_ingested_at, null-fill, partition_date derivation):
  extract_crypto_data.py:177-193

All are pure Column expressions (whole-stage-codegen friendly); at 100 TB the
cast/derive work rides inside the scan stage with zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def select_columns(df: DataFrame, *columns: str | Column) -> DataFrame:
    """P2: plain column projection (column pruning reaches the scan)."""
    return df.select(*columns)


def project_cast(df: DataFrame, casts: dict[str, str]) -> DataFrame:
    """P1: re-type named columns in place, keeping all other columns.

    ``casts`` maps column name → Spark type DDL string (e.g. "decimal(18,8)",
    "timestamp"). Mirrors the silver typed projection
    (bronze_to_silver_crypto.py:62-71) as a general operator.
    """
    exprs = [
        F.col(c).cast(casts[c]).alias(c) if c in casts else F.col(c)
        for c in df.columns
    ]
    return df.select(*exprs)


def safe_cast(col: Column | str, to_type: str, default=None) -> Column:
    """try_cast-with-default: engine-side analogue of the reference's
    driver-side _safe_str/_safe_float/_safe_int coercers
    (extract_crypto_data.py:129-151). Invalid input → ``default`` instead of
    failing the job (ANSI-off Spark already nulls; we add the default fill).
    """
    c = F.col(col) if isinstance(col, str) else col
    casted = c.try_cast(to_type)
    if default is None:
        return casted
    return F.coalesce(casted, F.lit(default).cast(to_type))


def enrich_ingestion(
    df: DataFrame,
    ts_col: str = "last_updated",
    ingested_at_col: str = "_ingested_at",
    partition_col: str = "partition_date",
    ingestion_time: Column | None = None,
) -> DataFrame:
    """P3: the reference's enrichment chain (extract_crypto_data.py:177-193).

    Adds ``_ingested_at`` (defaults to current_timestamp), null-fills the
    event-time column from ingestion time, and derives the partition date
    FROM THE DATA (to_date(ts)), never the wall clock — this keeps partition
    pruning correct for late/backfilled data at scale.

    ``ingestion_time`` may be passed as a literal for deterministic tests.
    """
    ingest = ingestion_time if ingestion_time is not None else F.current_timestamp()
    return (
        df.withColumn(ingested_at_col, ingest)
        .withColumn(
            ts_col,
            F.coalesce(
                F.col(ts_col),
                F.date_format(F.col(ingested_at_col), "yyyy-MM-dd'T'HH:mm:ss"),
            ),
        )
        .withColumn(partition_col, F.to_date(F.col(ts_col)))
    )
