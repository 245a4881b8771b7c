"""Time-series gap-filling: dense calendar spine + forward fill.

A hypertable-style engine answers "value as of every day, carrying the last
observation forward" — the missing piece between sparse event aggregates and
the dense series a forecast/feature pipeline consumes. Spark has no native
gap-fill; this composes it from built-ins:

1. spine: distinct keys × ``sequence(min_day, max_day)`` exploded — the
   cross join is keys × a ONE-ROW bounds frame (broadcast), so it is O(keys)
   work, never a data-sized cartesian;
2. left join observations onto the spine (shuffle sized to the spine, which
   is keys × days — tiny next to the fact table that produced the aggregate);
3. ``last(value, ignorenulls=True)`` over an unbounded-preceding row frame
   per key = forward fill. One window, one shuffle already co-partitioned
   with the join above.

Scale notes: the per-key series must fit one task's frame scan — daily
granularity means even a century is 36.5k rows per key, so the window is
never the bottleneck; the spine row count (keys × days) is the real knob —
gap-fill hourly-per-user at 100 TB would be keys-explosive, so callers pick
key/grain such that keys × grain-steps stays ≪ fact rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def calendar_spine(observed: DataFrame, key_col: str, day_col: str) -> DataFrame:
    """Dense (key, day) grid spanning the observed global [min, max] day
    range, for every distinct key in ``observed``."""
    bounds = observed.agg(
        F.min(day_col).alias("_d0"), F.max(day_col).alias("_d1")
    )
    keys = observed.select(key_col).distinct()
    # bounds is one row: broadcast makes the cross join a map-side append of
    # two columns, not a shuffle.
    return keys.crossJoin(F.broadcast(bounds)).select(
        key_col,
        F.explode(F.sequence(F.col("_d0"), F.col("_d1"))).alias(day_col),
    )


def forward_fill(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    default: Column | None = None,
) -> DataFrame:
    """Replace nulls in ``value_col`` with the last non-null value at or
    before each row within its key (``default`` for leading nulls)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = F.last(value_col, ignorenulls=True).over(w)
    if default is not None:
        filled = F.coalesce(filled, default)
    return df.withColumn(value_col, filled)


def gapfill_daily(
    observed: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
    default: Column | None = None,
    gap_flag_col: str | None = None,
) -> DataFrame:
    """Sparse (key, day, value) aggregate → dense daily series with forward
    fill. With ``gap_flag_col``, marks spine-only rows 1 (observed rows 0).

    ``observed`` has THREE consumers (bounds agg, key distinct, the spine
    join) — persisted so the upstream pipeline that produced the sparse
    aggregate (typically a fact-table scan + shuffle) runs once, not three
    times; the cached frame is only keys × observed-days rows."""
    observed = observed.persist(StorageLevel.MEMORY_AND_DISK)
    spine = calendar_spine(observed, key_col, day_col)
    joined = spine.join(observed, [key_col, day_col], "left")
    if gap_flag_col is not None:
        joined = joined.withColumn(
            gap_flag_col, F.col(value_col).isNull().cast("int")
        )
    return forward_fill(joined, key_col, day_col, value_col, default=default)
