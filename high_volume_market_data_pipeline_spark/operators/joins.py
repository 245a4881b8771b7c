"""Join operators (SURVEY.md §2.4 J1–J3, generalized).

The reference only has a cross join with a conditional broadcast hint
(data_generator.py:271) and Delta MERGE's internal equi-join
(bronze_to_silver_crypto.py:102-104); the library exposes the full verified
set the oracle queries need: inner/left/right/full/semi/anti equi-joins,
explicit broadcast variants, and cross join.

Scale notes: small dimension sides are broadcast (no shuffle of the fact
table); large-large joins shuffle on the key — pre-bucketing or an explicit
repartition on the join key lets consecutive joins reuse one exchange. AQE
converts to broadcast at runtime when a side turns out small, and splits
skewed partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """General equi-join; physical strategy left to Catalyst/AQE."""
    return left.join(right, on=on, how=how)


def broadcast_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """J2: force-broadcast the right side (known-small dimension).

    At 100 TB the fact side never shuffles for dimension joins — this is the
    single biggest join win and the reference anticipates it
    (silver_to_gold_crypto_stats.py:68 comment; data_generator.py:271 hint).
    """
    return left.join(F.broadcast(right), on=on, how=how)


def cross_join(left: DataFrame, right: DataFrame) -> DataFrame:
    """J1: cartesian product (dense-series construction). Broadcast the
    small side before calling when applicable (J2)."""
    return left.crossJoin(right)


def semi_join(
    left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column
) -> DataFrame:
    """EXISTS: keep left rows with a match; right columns never materialize
    (smaller shuffle than inner+distinct)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(
    left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column
) -> DataFrame:
    """NOT EXISTS: keep left rows without a match."""
    return left.join(right, on=on, how="left_anti")
