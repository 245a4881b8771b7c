"""Skew-mitigation operators: salted aggregation and salted join.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin, on in our session
factory) handles most skew at runtime; these operators are the explicit
plan-level tool for the cases AQE can't fix:

- salted_grouped_agg: a HOT GROUPING KEY concentrates one reducer. Split
  each key into ``n_salts`` sub-keys, partially aggregate, then re-aggregate
  the partials — the hot key's work spreads over n reducers and the second
  shuffle carries only n rows per key. Only valid for aggregates that
  decompose (sum/count/min/max; avg = sum+count recombined by the caller).
  NOTE: Spark's partial (map-side) aggregation already solves this when the
  upstream is many map tasks; explicit salting matters when the input
  arrives PRE-SHUFFLED on the hot key (e.g. after a join on that key), so
  map-side combine can't help.

- salted_join: a hot JOIN KEY on the probe side. Replicate each build-side
  row ``n_salts`` times (one per salt), give probe rows a deterministic salt
  in [0, n), join on (key, salt): the hot key's probe rows land on n
  reducers instead of one. Build side grows n× — use for large⋈large where
  the build side is too big to broadcast but n× its hot keys is still cheap.

Both are RESULT-IDENTICAL to their unsalted forms (verified against plain
SQL oracles) — only the physical distribution changes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def _deterministic_salt(unique_col: str | Column, n_salts: int) -> Column:
    """Stable per-row salt from a unique column — deterministic reruns
    (F.rand salting breaks replay/retry determinism at scale)."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int")


def salted_grouped_agg(
    df: DataFrame,
    group_by: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    salt_from: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over salted sub-keys.

    ``partial_aggs`` aggregate within (group_by, salt); ``final_aggs``
    re-aggregate the partial columns within group_by. Aliases must line up:
    e.g. partial ``sum(x) AS s`` → final ``sum(s) AS total_x``.
    """
    salted = df.withColumn(_SALT, _deterministic_salt(salt_from, n_salts))
    partial = salted.groupBy(*group_by, _SALT).agg(*partial_aggs)
    return partial.groupBy(*group_by).agg(*final_aggs)


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the probe side salted and the build side replicated
    ``n_salts``× so a hot probe key spreads over n reducers."""
    p = probe.withColumn(_SALT, _deterministic_salt(salt_from, n_salts))
    b = build.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    return p.join(b, [key, _SALT], how).drop(_SALT)
