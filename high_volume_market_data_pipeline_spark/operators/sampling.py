"""Deterministic hash-based sampling operators for dataset curation.

A 100 TB curation pipeline cannot sample with engine RNG: `rand()` changes
with partitioning, retries, and cluster size, so a re-run (or an incremental
append) would move documents in and out of the sample. Every operator here
derives its decision from md5 over the row's stable key — the same bytes
hash the same in any engine and on any cluster layout, giving:

- reproducible samples across runs and engines (bit-identical DuckDB twins),
- stable membership under table growth (a doc's fate never depends on what
  other rows arrived),
- pure map-side execution for rate sampling / splitting (zero shuffle), and
  a single keyed shuffle for per-group caps.

The reference has no sampling surface (its generator uses seeded `randn`
for data synthesis, data_generator.py:281-287 — a different problem); these
operators are part of the mandated LLM-training-data extension.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5 of the key's string
    form (first 8 hex chars → long). Identical bytes → identical bucket in
    any engine; DuckDB twin in `queries_dedup._hex_to_int_sql`."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % n_buckets
    )


def hash_rate_sample(
    df: DataFrame,
    key: str,
    rate_pct: int | Mapping[str, int],
    stratum: str | None = None,
    default_pct: int = 0,
) -> DataFrame:
    """Keep each row iff hash_bucket(key) < its rate (percent, 0-100).

    With a mapping + ``stratum`` column this is stratified sampling: each
    stratum gets its own retention rate (how a mixing recipe up/down-weights
    languages or sources). Purely map-side — the filter rides the scan, no
    shuffle, and membership is per-row independent, so it composes with any
    downstream operator without a barrier."""
    bucket = hash_bucket(F.col(key))
    if isinstance(rate_pct, Mapping):
        if stratum is None:
            raise ValueError("stratified rates require a stratum column")
        rate: Column = F.lit(default_pct)
        for value, pct in sorted(rate_pct.items()):
            rate = F.when(F.col(stratum) == value, F.lit(pct)).otherwise(rate)
    else:
        rate = F.lit(int(rate_pct))
    return df.filter(bucket < rate)


def group_cap_sample(
    df: DataFrame,
    group_cols: Sequence[str],
    key: str,
    cap: int,
    rank_col: str = "rk",
    n_salt: int | None = None,
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by md5(key) rank — a
    deterministic uniform draw without an RNG (hash order is independent of
    row content and arrival order). One shuffle on the group columns;
    row_number evaluates as a per-partition streaming top-cap.

    For heavily skewed groups (English at web scale) pass ``n_salt``: phase
    one caps within (group, md5-salt) sub-partitions — n_salt tasks share a
    dominant group's scan instead of one hot task — and phase two re-ranks
    only the surviving ≤ n_salt×cap rows per group. The per-salt top-cap is
    a superset of the global top-cap (every globally-kept row ranks ≤ cap
    inside its own salt too), so the result is IDENTICAL to the unsalted
    path; only the shuffle layout changes. Same two-phase pattern as
    operators/skew.py."""
    rank_key = [F.md5(F.col(key).cast("string")), F.col(key)]
    if n_salt is not None and n_salt > 1:
        salt = hash_bucket(F.col(key), n_salt)
        w1 = Window.partitionBy(*group_cols, salt).orderBy(*rank_key)
        df = df.withColumn("_salt_rk", F.row_number().over(w1)).filter(
            F.col("_salt_rk") <= cap
        ).drop("_salt_rk")
    w = Window.partitionBy(*group_cols).orderBy(*rank_key)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= cap
    )


def hash_split(
    df: DataFrame,
    key: str,
    fractions: Mapping[str, int],
    split_col: str = "split",
) -> DataFrame:
    """Label every row with a split name by md5 bucket; ``fractions`` maps
    name → percent and must sum to 100. A document's split never depends on
    partitioning, row order, or cluster size, so re-runs and incremental
    appends land it identically — the property ``randomSplit`` does NOT
    give you on a growing table. Map-side only.

    Bucket ranges are assigned in SORTED split-name order (not dict
    insertion order): ``{'train': 90, 'val': 5, 'test': 5}`` and
    ``{'val': 5, 'test': 5, 'train': 90}`` produce the same labelling, so
    callers that build the mapping dynamically cannot silently relabel
    every row between runs."""
    total = sum(fractions.values())
    if total != 100:
        raise ValueError(f"split fractions must sum to 100, got {total}")
    bucket = hash_bucket(F.col(key))
    edge = 0
    label: Column | None = None
    for name in sorted(fractions):
        edge += fractions[name]
        label = (
            F.when(bucket < edge, name)
            if label is None
            else label.when(bucket < edge, name)
        )
    return df.withColumn(split_col, label)
