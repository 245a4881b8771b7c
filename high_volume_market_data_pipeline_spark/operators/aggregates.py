"""Grouped aggregation / distinct (SURVEY.md §2.5 A1–A3).

Parity target: groupBy("partition_date").agg(sum, avg)
(silver_to_gold_crypto_stats.py:77-84); distinct partition enumeration
(main_pipeline.py:278-281).

Scale notes: declarative groupBy lets Catalyst plan partial (map-side) +
final hash aggregation — the shuffle carries per-partition partials, not raw
rows. ``approx_`` variants are included for the 100 TB path where exact
distinct would shuffle every value.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_agg(
    df: DataFrame,
    group_by: Sequence[str | Column],
    aggs: Sequence[Column],
) -> DataFrame:
    """A1: groupBy + named aggregate expressions (alias every agg)."""
    return df.groupBy(*group_by).agg(*aggs)


def distinct_values(df: DataFrame, *columns: str) -> DataFrame:
    """A2: distinct projection (hash aggregate, map-side combined)."""
    return df.select(*columns).distinct()


def approx_distinct_count(
    df: DataFrame, column: str, rsd: float = 0.05, alias: str = "approx_count"
) -> DataFrame:
    """HyperLogLog++ distinct count — sketch merge instead of a value
    shuffle; the scale-path replacement for countDistinct on wide keys."""
    return df.agg(F.approx_count_distinct(column, rsd).alias(alias))


def cube_agg(
    df: DataFrame, dims: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """CUBE over dims (multi-granularity rollup in one shuffle)."""
    return df.cube(*dims).agg(*aggs)


def rollup_agg(
    df: DataFrame, dims: Sequence[str], aggs: Sequence[Column]
) -> DataFrame:
    """ROLLUP over dims (hierarchical subtotals)."""
    return df.rollup(*dims).agg(*aggs)


def pivot_agg(
    df: DataFrame,
    group_by: Sequence[str],
    pivot_col: str,
    pivot_values: Sequence[str],
    agg: Column,
) -> DataFrame:
    """Pivot: one output column per ``pivot_values`` entry.

    Always pass explicit ``pivot_values`` — without them Spark runs an extra
    distinct-collect job over the pivot column, a full scan at scale.
    """
    return df.groupBy(*group_by).pivot(pivot_col, list(pivot_values)).agg(agg)


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "metric",
    value_name: str = "value",
) -> DataFrame:
    """Unpivot/melt wide columns to (metric, value) rows via the built-in
    ``unpivot`` (Expand node: no shuffle, rows×len(value_cols) output)."""
    return df.unpivot(list(ids), list(value_cols), var_name, value_name)
