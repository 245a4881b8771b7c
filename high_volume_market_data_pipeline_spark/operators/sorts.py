"""Sorts, limits, global top-K (SURVEY.md §2.7 O1–O4) and set ops.

Parity targets: orderBy("partition_date") on the Gold aggregate
(silver_to_gold_crypto_stats.py:83); orderBy(desc).limit(1)
(fast_pipeline.py:43).

Scale notes: sort+limit compiles to TakeOrderedAndProject — each task keeps a
K-row heap and only K rows per partition reach the driver/final stage; never
a full global sort. Full global sorts (O1) are range-partitioned (sampled
boundaries), reserved for final, small outputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def global_sort(df: DataFrame, *order_by: Column | str) -> DataFrame:
    """O1: total order via range partitioning. Use on final/small outputs."""
    return df.orderBy(*order_by)


def top_k_global(df: DataFrame, k: int, *order_by: Column | str) -> DataFrame:
    """O2: global top-K — Catalyst plans TakeOrderedAndProject (per-partition
    heaps, no full sort). Pass a unique tiebreaker for determinism."""
    return df.orderBy(*order_by).limit(k)


def union_all(*dfs: DataFrame) -> DataFrame:
    """UNION ALL by column NAME (resilient to column order drift). The
    idiomatic multi-batch concatenation the reference does driver-side with
    list.extend (extract_crypto_data.py:100)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
