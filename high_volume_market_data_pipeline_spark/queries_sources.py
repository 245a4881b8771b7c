"""Queries exercising the custom Python DataSource (S1 scale path).

The synthetic paged feed is md5-derived (sources/api_datasource.py), so
DuckDB can REGENERATE the exact rows in SQL — giving the custom source a
full hash-checked oracle, not just a rows-only smoke: `'0x' || first 16
md5 hex chars` cast to UBIGINT equals Python's
``int.from_bytes(md5(...).digest()[:8], "big")`` bit-for-bit, and every
derived field is integer arithmetic on that value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.registry import query
from high_volume_market_data_pipeline_spark.sources.api_datasource import (
    register_paged_feed,
)

_PAGES = 20
_PAGE_SIZE = 100
_SEED = 7


@query(
    "paged_feed_rollup",
    oracle=f"""
    WITH k AS (SELECT unnest(range(0, {_PAGES * _PAGE_SIZE})) AS k),
    h AS (
      SELECT k,
             CAST(('0x' || substr(md5('{_SEED}|' || CAST(k AS VARCHAR)), 1, 16))
                  AS UBIGINT) AS h
      FROM k
    ), r AS (
      SELECT (k // {_PAGE_SIZE}) + 1 AS page,
             lower(lpad(hex(h % 16777215), 6, '0')) AS sym,
             CAST(h % 10000000 AS DOUBLE) / 1000.0 AS price,
             CAST((h // 7) % 1000000000000 AS BIGINT) AS market_cap,
             CAST((h // 11) % 1000000000 AS BIGINT) AS volume
      FROM h
    )
    SELECT page,
           COUNT(*) AS n_coins,
           COUNT(DISTINCT sym) AS n_symbols,
           CAST(SUM(market_cap) AS BIGINT) AS total_market_cap,
           CAST(SUM(volume) AS BIGINT) AS total_volume,
           CAST(SUM(CAST(floor(price * 1000) AS BIGINT)) AS BIGINT)
             AS price_millis
    FROM r
    GROUP BY page
    ORDER BY page
    """,
)
def paged_feed_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page rollup over the custom ``paged_feed`` DataSource — the
    reference's paged market feed (extract_crypto_data.py:79-107)
    re-expressed as a partition-parallel Spark 4 Python DataSource: each
    page is an InputPartition, so ingestion fans out across executors
    instead of serializing on the driver. (``sf_dir`` is unused — the
    source IS the input; the oracle regenerates the same md5-derived feed
    in SQL.)

    Determinism: every field is integer arithmetic on an md5-derived
    uint64 (bit-identical in both engines); the only double, price, is a
    single exact-int-to-double cast and division, re-quantized to integer
    milli-units before summing.

    Bench note: the first Python-DataSource read in a session pays a
    ~10 s one-time bootstrap (Python runner + plan-side source pickling);
    warm runs are ~1.2 s (measured 11.6/1.27/1.12 s back-to-back). The
    bench records the cold number — a fixed cost, not a per-page one."""
    register_paged_feed(spark)
    feed = (
        spark.read.format("paged_feed")
        .option("pages", _PAGES)
        .option("page_size", _PAGE_SIZE)
        .option("seed", _SEED)
        .load()
    )
    return (
        feed.groupBy("page")
        .agg(
            F.count(F.lit(1)).alias("n_coins"),
            F.count_distinct("symbol").alias("n_symbols"),
            F.sum("market_cap").alias("total_market_cap"),
            F.sum("total_volume").alias("total_volume"),
            F.sum(F.floor(F.col("current_price") * 1000).cast("bigint")).alias(
                "price_millis"
            ),
        )
        .orderBy("page")
    )
