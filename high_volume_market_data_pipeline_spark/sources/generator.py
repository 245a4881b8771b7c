"""Deterministic synthetic market-data generator (S4+S5+J1+J2).

Re-expresses the reference's stress generator (data_generator.py:236-298):
a coin catalogue × dense hourly timestamp grid, with log-normal price/cap/
volume jitter — but fully engine-side and SEED-DETERMINISTIC (F.randn(seed)),
where the reference's was wall-clock anchored and unseeded (SURVEY §7.3).

Scale shape: `spark.range(hours)` (S4) is a lazy dense series generated
per-partition; the catalogue is a broadcast cross join (J1+J2,
data_generator.py:271) so the big side never shuffles. Volume = coins ×
days × 24 rows materializes nowhere until the sink.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Compact deterministic "catalogue" (the reference hardcodes 250 coins,
# data_generator.py:32-192; we synthesize ids so n_coins is unbounded).
_BASE_PRICE_MAX = 50_000.0
_BASE_CAP_MAX = 1e12


def coin_catalogue(spark: SparkSession, n_coins: int) -> DataFrame:
    """S5 equivalent: n synthetic coins with deterministic base stats."""
    return spark.range(n_coins).select(
        F.concat(F.lit("coin-"), F.col("id")).alias("id"),
        F.concat(F.lit("c"), F.col("id")).alias("symbol"),
        F.concat(F.lit("Coin "), F.col("id")).alias("name"),
        # deterministic pseudo-random base stats from the coin index
        (F.pmod(F.xxhash64(F.col("id")), F.lit(10_000)) / 10_000.0
         * _BASE_PRICE_MAX + 0.01).alias("base_price"),
        (F.pmod(F.xxhash64(F.col("id") + 1), F.lit(10_000)) / 10_000.0
         * _BASE_CAP_MAX + 1e6).alias("base_market_cap"),
    )


def hourly_grid(
    spark: SparkSession, days: int, end: datetime | None = None
) -> DataFrame:
    """S4: dense hourly UTC timestamp series ending at ``end`` (default a
    fixed anchor — NOT wall clock — for reproducibility)."""
    if end is None:
        end = datetime(2024, 6, 30, 23, 0, 0, tzinfo=timezone.utc)
    hours_total = days * 24
    end_epoch = int(end.timestamp()) // 3600 * 3600
    return spark.range(hours_total).select(
        F.from_unixtime(
            F.lit(end_epoch) - (F.lit(hours_total - 1) - F.col("id")) * 3600
        ).cast("timestamp").alias("last_updated_ts")
    )


def generate_market_data(
    spark: SparkSession,
    n_coins: int = 200,
    days: int = 30,
    seed: int = 42,
    end: datetime | None = None,
) -> DataFrame:
    """Bronze-shaped rows: coins × hours with log-normal jitter
    (data_generator.py:276-292 semantics, seeded).

    current_price = base_price · exp(N(0, 0.08))
    market_cap    = base_cap   · exp(N(0, 0.05))  (long)
    total_volume  = base_cap · 0.05 · exp(N(0, 0.4)) (long)
    """
    coins = coin_catalogue(spark, n_coins)
    hours = hourly_grid(spark, days, end)
    grid = (
        hours.crossJoin(F.broadcast(coins))
        if n_coins <= 10_000
        else hours.crossJoin(coins)
    )
    return grid.select(
        "id",
        "symbol",
        "name",
        (F.col("base_price") * F.exp(F.randn(seed) * 0.08)).alias(
            "current_price"
        ),
        (F.col("base_market_cap") * F.exp(F.randn(seed + 1) * 0.05))
        .cast("long")
        .alias("market_cap"),
        (F.col("base_market_cap") * 0.05 * F.exp(F.randn(seed + 2) * 0.4))
        .cast("long")
        .alias("total_volume"),
        F.date_format("last_updated_ts", "yyyy-MM-dd'T'HH:mm:ss").alias(
            "last_updated"
        ),
    )
