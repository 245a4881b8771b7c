"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001 (smoke).
``queries()`` / ``oracle_sql()`` — operator surface verified against the
DuckDB oracle at sf0.01 (see SURVEY.md §2 inventory; implementations live in
``high_volume_market_data_pipeline_spark``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from high_volume_market_data_pipeline_spark.queries import (  # noqa: E402
    ORACLE_SQL,
    QUERIES,
    gold_daily_topk_stats,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return gold_daily_topk_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL oracle per query (omitted ⇒ rows-only check)."""
    return dict(ORACLE_SQL)
