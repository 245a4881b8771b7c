"""As-of join and range (interval) join — market-data operators Spark lacks
as builtins (SURVEY.md §4 extension candidates: "as-of-join … can be
expressed with window + union"; range join via "bucketed equi-join
pre-filter"). Both are compositions of existing DataFrame ops (option (a) of
the custom-operator ladder), so Catalyst still owns the physical plan.

As-of join (backward, inclusive): for each left row (key, t), attach the
most recent right row with the same key and right_ts ≤ t.

Implementation: tag + union + keep-last-non-null window:
    one shuffle on the key, a per-key sort, no join at all — the classic
    scalable as-of shape. A sort-merge join approach would shuffle both
    sides too but then needs per-row backward scans; the union-window form
    is O(n log n) per key partition, skew-safe under AQE.

Range join: equi-join on overlapping bucket ids + exact post-filter —
turns an inequality join (which Spark would otherwise plan as
broadcast-nested-loop, quadratic) into a hash shuffle join whose fan-out is
interval_len/bucket_len per row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"  # 0 = right (sorts first on ts ties → inclusive match)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    prefix: str = "asof_",
    direction: str = "backward",
    tolerance: float | None = None,
) -> DataFrame:
    """Inclusive as-of join; unmatched left rows keep nulls (left-join
    semantics). Right value columns arrive as ``prefix+name``;
    ``prefix+right_ts`` carries the matched timestamp.

    ``direction="backward"`` (default) attaches the most recent right row
    with right_ts ≤ t; ``"forward"`` the earliest with right_ts ≥ t (the
    same union+window plan with the per-key sort reversed — still one
    shuffle, no join). ``tolerance`` (seconds for timestamps, plain units
    for numerics) nulls out a match farther than that from the left
    timestamp — pandas ``merge_asof`` semantics: the NEAREST match is
    found first, then dropped if stale, never replaced by a farther
    in-tolerance row.

    ``direction="nearest"`` picks whichever of the backward/forward match
    is closer in time (ties → backward, like pandas); it chains the two
    directional passes, so it costs two key-shuffles where each direction
    alone costs one."""
    if direction == "nearest":
        return _asof_nearest(
            left, right, key, left_ts, right_ts, right_values, prefix,
            tolerance,
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    keys = [key] if isinstance(key, str) else list(key)
    lcols = left.columns
    carried = [right_ts, *right_values]

    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in carried],
    )
    tagged_right = right.select(
        *[F.col(k) for k in keys],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in keys
        ],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"_r_{c}") for c in carried],
    )

    unioned = tagged_left.unionByName(tagged_right)
    # Backward scans time ascending; forward scans descending. Either way
    # right rows (_SIDE=0) sort before left rows at equal ts, so an exact
    # tie is an inclusive match.
    ts_order = (
        F.col("_asof_ts") if direction == "backward" else F.col("_asof_ts").desc()
    )
    # Trailing _r_* sort keys: two right rows with the SAME (key, ts) would
    # otherwise resolve by partition-internal order — nondeterministic in a
    # distributed engine. With them, the largest carried tuple wins the tie,
    # every run (left rows carry all-null _r_* and are unaffected).
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, _SIDE, *[F.col(f"_r_{c}") for c in carried])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *lcols,
        F.col(_SIDE),
        F.col("_asof_ts"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in carried
        ],
    )
    out = filled.filter(F.col(_SIDE) == 1)
    if tolerance is not None:
        matched = F.col(f"{prefix}{right_ts}").cast("double")
        delta = F.abs(F.col("_asof_ts").cast("double") - matched)
        keep = delta <= F.lit(float(tolerance))
        out = out.select(
            *lcols,
            F.col(_SIDE),
            F.col("_asof_ts"),
            *[
                F.when(keep, F.col(f"{prefix}{c}")).alias(f"{prefix}{c}")
                for c in carried
            ],
        )
    return out.drop(_SIDE, "_asof_ts")


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_values: Sequence[str],
    prefix: str,
    tolerance: float | None,
) -> DataFrame:
    """Nearest-match as-of: the backward fill's output (left frame +
    ``_b_*``) feeds the forward pass directly — no re-join on row
    identity, so left rows need no unique key — then the closer candidate
    wins per row (exact tie → backward, pandas' rule)."""
    keys = [key] if isinstance(key, str) else list(key)
    lcols = left.columns
    carried = [right_ts, *right_values]

    bwd = asof_join(
        left, right, key, left_ts, right_ts, right_values,
        prefix="_b_", direction="backward",
    )
    # The backward result IS the left frame plus _b_* columns, so the
    # forward pass runs on it directly — no re-join on row identity (left
    # rows need no unique key).
    both = asof_join(
        bwd, right, key, left_ts, right_ts, right_values,
        prefix="_f_", direction="forward",
    )
    t = F.col(left_ts).cast("double")
    b_ts = F.col(f"_b_{right_ts}").cast("double")
    f_ts = F.col(f"_f_{right_ts}").cast("double")
    use_f = f_ts.isNotNull() & (b_ts.isNull() | ((f_ts - t) < (t - b_ts)))
    chosen = [
        F.when(use_f, F.col(f"_f_{c}"))
        .otherwise(F.col(f"_b_{c}"))
        .alias(f"{prefix}{c}")
        for c in carried
    ]
    out = both.select(*lcols, *chosen)
    if tolerance is not None:
        matched = F.col(f"{prefix}{right_ts}").cast("double")
        keep = F.abs(t - matched) <= F.lit(float(tolerance))
        out = out.select(
            *lcols,
            *[
                F.when(keep, F.col(f"{prefix}{c}")).alias(f"{prefix}{c}")
                for c in carried
            ],
        )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: Column,
    start: Column,
    end: Column,
    bucket_len: int,
) -> DataFrame:
    """Interval join: left rows whose ``point`` ∈ [start, end) of a right
    interval. ``point/start/end`` must be castable to long (epoch seconds,
    ids…); ``bucket_len`` trades join fan-out (interval/bucket_len rows per
    right interval) against bucket selectivity — set it near the median
    interval length."""
    lb = left.withColumn("_bucket", (point.cast("long") / bucket_len).cast("long"))
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (start.cast("long") / bucket_len).cast("long"),
                ((end.cast("long") - 1) / bucket_len).cast("long"),
            )
        ),
    )
    return (
        lb.join(rb, "_bucket")
        .filter((point >= start) & (point < end))
        .drop("_bucket")
    )
