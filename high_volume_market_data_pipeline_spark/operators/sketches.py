"""Mergeable distinct-count sketches (Apache DataSketches HLL, built into
Spark ≥ 3.5 as ``hll_sketch_agg`` / ``hll_union_agg``).

This is the incremental-analytics shape ``approx_count_distinct`` cannot
express: ``approx_count_distinct`` returns a NUMBER per group, which is not
mergeable — re-slicing (daily → monthly, per-source → global) forces a full
rescan of the fact table. A persisted SKETCH column is mergeable state: the
daily rollup is computed once per day at ingest, and any coarser distinct
count is a union over the (tiny) sketch table. At 100 TB this turns
"distinct users last quarter" from a quarter-scan into a sum over ~90 rows
per group.

Union exactness: an HLL register holds the max rank observed per bucket, so
``union(sketch(A), sketch(B))`` has *identical register state* to
``sketch(A ∪ B)`` at the same lgConfigK — the merged estimate is exactly
equal, not just close (pinned in tests/test_analytics.py). Estimates are
deterministic functions of the data (no RNG), but the sketch
implementation is DataSketches-specific, so queries exposing estimates are
rows-only for the cross-engine gate with accuracy asserted in pytest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12  # 2^12 registers ≈ 1.6 kB/sketch, ~2.5% relative error


def hll_rollup(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    lgk: int = DEFAULT_LGK,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Fine-grained sketch table: one HLL sketch of ``item_col`` per group.
    This is the state you persist; one shuffle on the group keys."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(item_col), F.lit(lgk)).alias(sketch_col)
    )


def hll_merge(
    df: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Coarsen a sketch table: union sketches per (coarser) group. Input
    rows are sketch-sized, so this shuffle is tiny regardless of the fact
    table's size — the whole point of persisting sketches."""
    return df.groupBy(*group_cols).agg(
        F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    )


def hll_estimate(sketch: Column) -> Column:
    """Distinct-count estimate of a sketch column (long)."""
    return F.hll_sketch_estimate(sketch)


DEFAULT_TOPK_TRACKED = 10_000  # counter budget; exact while distinct ≤ this


def topk_rollup(
    df: DataFrame,
    group_cols: list[str],
    item_col: str,
    max_tracked: int = DEFAULT_TOPK_TRACKED,
    sketch_col: str = "topk_state",
) -> DataFrame:
    """Fine-grained frequency-sketch table: one ``approx_top_k`` state per
    group (Spark 4's accumulate/combine/estimate trio — the heavy-hitters
    twin of :func:`hll_rollup`). The state you persist at ingest; any
    coarser "top items" question becomes a combine over sketch-sized rows
    instead of a fact rescan. Counts are EXACT while a group's distinct
    items stay ≤ ``max_tracked`` (counters only shed under overflow), and
    combine SUMS per-item counts, so merged state stays exact under the
    same bound — which is what lets the rollup query keep a full SQL
    oracle."""
    return df.groupBy(*group_cols).agg(
        F.expr(
            f"approx_top_k_accumulate({item_col}, {int(max_tracked)})"
        ).alias(sketch_col)
    )


def topk_merge(
    df: DataFrame,
    group_cols: list[str],
    max_tracked: int = DEFAULT_TOPK_TRACKED,
    sketch_col: str = "topk_state",
) -> DataFrame:
    """Coarsen a frequency-sketch table: combine states per (coarser)
    group. ``max_tracked`` must match the accumulate side — the combined
    state's capacity is a parameter of the merge, not inherited."""
    return df.groupBy(*group_cols).agg(
        F.expr(
            f"approx_top_k_combine({sketch_col}, {int(max_tracked)})"
        ).alias(sketch_col)
    )


def topk_estimate_rows(
    df: DataFrame,
    k: int,
    sketch_col: str = "topk_state",
    item_alias: str = "item",
    count_alias: str = "cnt",
) -> DataFrame:
    """Explode a sketch column into (item, cnt) rows — the top ``k`` BY
    THE SKETCH'S OWN ORDER, which breaks count ties arbitrarily; callers
    wanting deterministic output should request k ≥ the tracked item
    count and rank themselves (see heavy_hitter_users)."""
    other = [c for c in df.columns if c != sketch_col]
    return df.select(
        *other,
        F.explode(
            F.expr(f"approx_top_k_estimate({sketch_col}, {int(k)})")
        ).alias("_e"),
    ).select(
        *other,
        F.col("_e.item").alias(item_alias),
        F.col("_e.count").alias(count_alias),
    )
