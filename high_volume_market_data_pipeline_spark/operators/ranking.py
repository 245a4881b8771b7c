"""Per-group ranking / top-K (SURVEY.md §2.6 W2, §2.3 P4).

Parity target: volume_rank = rank() over
Window.partitionBy("partition_date").orderBy(desc("total_volume")) then
filter(rank <= 10) (silver_to_gold_crypto_stats.py:71-75). Note the reference
uses rank(), which admits >K rows on ties — preserved here; use
``row_number_top_k_per_group`` for exactly-K.

Scale notes: a single shuffle on the group key; the rank filter is applied
before any downstream agg so only K·groups rows flow on. If a later
aggregation uses the SAME key, Catalyst reuses the exchange (the reference
encodes this with an explicit repartition, L1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _topk(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_fn,
    rank_col: str,
    keep_rank: bool,
) -> DataFrame:
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    out = df.withColumn(rank_col, rank_fn().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)


def rank_top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
    keep_rank: bool = False,
) -> DataFrame:
    """W2: rank()-based top-K per group (ties may admit > K rows)."""
    return _topk(df, group_by, order_by, k, F.rank, rank_col, keep_rank)


def row_number_top_k_per_group(
    df: DataFrame,
    group_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "row_num",
    keep_rank: bool = False,
) -> DataFrame:
    """Exactly-K variant (row_number): pass a deterministic tiebreaker in
    ``order_by`` or tie resolution is arbitrary."""
    return _topk(df, group_by, order_by, k, F.row_number, rank_col, keep_rank)
