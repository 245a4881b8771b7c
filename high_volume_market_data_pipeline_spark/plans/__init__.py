"""Pipeline assembly layer (SURVEY.md §3 — the medallion orchestration)."""

from high_volume_market_data_pipeline_spark.plans.medallion import (
    MedallionPaths,
    run_bronze,
    run_gold,
    run_gold_incremental,
    run_medallion,
    run_silver,
)
from high_volume_market_data_pipeline_spark.plans.streaming_medallion import (
    run_streaming_medallion,
    stream_bronze,
    stream_silver,
)

__all__ = [
    "MedallionPaths",
    "run_bronze",
    "run_gold",
    "run_gold_incremental",
    "run_medallion",
    "run_silver",
    "run_streaming_medallion",
    "stream_bronze",
    "stream_silver",
]
