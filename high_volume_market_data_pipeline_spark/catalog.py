"""Table loading for the driver's TPC-H-ish testdata (TESTDATA.md).

Thin, declarative ``spark.read.parquet`` wrappers — filters/column pruning are
left to Catalyst so pushdown reaches the scan (``PushedFilters`` /
``ReadSchema`` in .explain). Mirrors the reference's layer scans S6/S7
(bronze_to_silver_crypto.py:55-58, check_bronze_data.py:21-22) generalized to
any named table in a scale-factor directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one testdata table (S7: spark.read.parquet).

    ``events.ts`` has shipped in two physical encodings across testdata
    generations: TIMESTAMP(NANOS) (vectorized reader rejects it → read
    nanos-as-long and truncate to micros) and TIMESTAMP(MICROS) without
    isAdjustedToUTC (Spark reads TIMESTAMP_NTZ, which disallows long casts
    and differs from every downstream operator's LTZ assumption). Both are
    normalized here to a session-TZ (UTC) TimestampType so operators and
    DuckDB oracles agree; keep the normalization at read time, not in the
    session config.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` works too."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def register_catalog_tables(
    spark: SparkSession, sf_dir: str, database: str = "hvmdp"
) -> list[str]:
    """K6: persistent catalog registration (main_pipeline.py:189-218
    analogue): CREATE DATABASE IF NOT EXISTS → external tables over the
    parquet locations → verified SHOW TABLES. Works against the default
    in-memory catalog or a configured Hive metastore alike
    (session.build_metastore_session for the persistent Derby-backed one)."""
    # events.parquet is TIMESTAMP(NANOS): schema inference at CREATE TABLE
    # needs the same legacy conf load_table uses.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        spark.sql(f"DROP TABLE IF EXISTS {database}.{name}")
        spark.sql(
            f"CREATE TABLE {database}.{name} USING PARQUET "
            f"LOCATION '{path}'"
        )
    registered = [
        r.tableName for r in spark.sql(f"SHOW TABLES IN {database}").collect()
    ]
    missing = set(TABLES) - set(registered)
    if missing:
        raise RuntimeError(f"catalog registration incomplete: missing {missing}")
    return registered
