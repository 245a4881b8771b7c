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
