"""Data-profiling and data-quality expectation operators.

The reference's correctness assurance is operational (SURVEY §5: inspection
scripts, defensive guards, a SHOW TABLES probe) — a general engine makes
those checks first-class, declarative, and one-pass:

- ``column_stats``: per-column profile (count / nulls / distinct / min /
  max / mean) computed in a SINGLE aggregation pass — the input scans once
  no matter how many columns are profiled (the multi-metric agg is one
  partial+final hash aggregate; compare one job per column, the naive
  loop). This is the ANALYZE-style stats pass that feeds size estimates,
  quality dashboards, and schema-drift alerts.
- ``check_expectations``: declarative row-level constraints evaluated as
  SUM(CASE WHEN NOT p) counters in one pass — the violation report a
  pipeline gates a publish on (the engine-side analogue of the reference's
  driver-side safe-cast defaults, extract_crypto_data.py:129-151: instead
  of silently coercing bad rows, count and surface them).
- ``check_referential``: FK orphan count via left-anti join — distributed,
  broadcastable when the dimension is small.

All counters are exact integers → bit-identical cross-engine oracles.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def column_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One-pass numeric column profile → one row per column:
    (col_name, n, n_null, n_distinct, min, max, mean) with min/max/mean as
    doubles.

    n_distinct is exact (count_distinct inside the same agg — Spark plans
    a single expand+aggregate); swap for approx_count_distinct when
    profiling at 100 TB where a ~2% estimate is acceptable and the expand
    is not.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__null"),
            F.count_distinct(col).alias(f"{c}__distinct"),
            F.min(col).cast("double").alias(f"{c}__min"),
            F.max(col).cast("double").alias(f"{c}__max"),
            F.round(
                F.sum(col.cast("decimal(28,4)")).cast("double") / F.count(col),
                6,
            ).alias(f"{c}__mean"),
        ]
    one = df.agg(*aggs)
    stacked = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col("_n").alias("n"),
                        F.col(f"{c}__null").alias("n_null"),
                        F.col(f"{c}__distinct").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_value"),
                        F.col(f"{c}__max").alias("max_value"),
                        F.col(f"{c}__mean").alias("mean_value"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.*")


def check_expectations(
    df: DataFrame, rules: Mapping[str, Column]
) -> DataFrame:
    """Evaluate named row-level expectations in one aggregation pass →
    one row per rule: (rule, n_rows, n_violations, pass). A null predicate
    result counts as a violation (unknown ≠ satisfied — ANSI three-valued
    logic would silently pass NULLs otherwise). A zero-row input reports
    0 violations and passed=TRUE per rule — SUM over no rows is NULL, and
    a publish gate reading a NULL ``passed`` would behave unexpectedly
    (the same agg runs per micro-batch in streaming/quality, where empty
    batches are routine)."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, cond in rules.items():
        aggs.append(
            F.coalesce(
                F.sum(
                    F.when(F.coalesce(cond, F.lit(False)), 0).otherwise(1)
                ),
                F.lit(0),
            ).alias(f"{name}__viol")
        )
    one = df.agg(*aggs)
    stacked = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col("_n").alias("n_rows"),
                        F.col(f"{name}__viol").alias("n_violations"),
                        (F.col(f"{name}__viol") == 0).alias("passed"),
                    )
                    for name in rules
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.*")


def observed(
    df: DataFrame, name: str, metrics: Mapping[str, Column]
) -> tuple[DataFrame, "Observation"]:
    """Attach named one-pass metrics to a DataFrame via ``df.observe`` —
    Spark evaluates them as a side effect of whatever action next consumes
    the frame, so instrumentation costs ZERO extra jobs and zero extra
    scans.

    This is the engine-side replacement for the reference's pattern of
    running a separate ``count()`` action purely to log row counts
    (extract_crypto_data.py:173, main_pipeline.py:274 — each a full
    re-scan of the input): observe piggybacks the counters onto the write
    itself. At 100 TB a redundant count job is a second pass over the
    table; an observation is free.

    Returns ``(observed_df, observation)``; read ``observation.get`` after
    an action has run. Metrics must be aggregate expressions (count/sum/
    min/max/...), per Spark's observe contract."""
    from pyspark.sql import Observation

    obs = Observation(name)
    named = [c.alias(n) for n, c in metrics.items()]
    return df.observe(obs, *named), obs


def write_observed(
    df: DataFrame,
    path: str,
    metrics: Mapping[str, Column],
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> dict:
    """Write ``df`` and return ingest metrics from the SAME pass — the
    one-job bronze-ingest instrumentation (rows written, null-key counts,
    value ranges) the reference spends an extra count job on. The returned
    dict is the observation result after the write action completes."""
    obs_df, obs = observed(df, f"write:{path}", metrics)
    w = obs_df.write.mode(mode).format(fmt)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
    return dict(obs.get)


def check_referential(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
) -> DataFrame:
    """FK integrity: rows of ``fact`` whose key has no match in ``dim``
    (left-anti join; Catalyst broadcasts small dims). Returns the orphan
    rows — count it for a gate, inspect it for triage."""
    return fact.join(
        dim.select(F.col(dim_key).alias(fact_key)).distinct(),
        on=fact_key,
        how="left_anti",
    )
