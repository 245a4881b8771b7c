"""As-of / range join queries over `events` — oracle-checked against
DuckDB's native ASOF JOIN and a plain inequality join respectively (our
Spark implementations are compositions; the oracles are the first-class SQL
forms, so parity here validates the composition semantics, tie handling
included)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.catalog import load_table
from high_volume_market_data_pipeline_spark.operators.asof import (
    asof_join,
    range_join,
)
from high_volume_market_data_pipeline_spark.registry import query


@query(
    "asof_last_purchase_per_click",
    oracle="""
    SELECT c.event_id,
           c.user_id,
           c.ts,
           p.ts AS asof_ts,
           p.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    ORDER BY c.event_id
    """,
)
def asof_last_purchase_per_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's most recent purchase at-or-before the
    click (backward-inclusive as-of; clicks before any purchase keep
    nulls). Union+window implementation — one shuffle on user_id, no join."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), "value"
    )
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="p_ts",
        right_values=["value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_p_ts").alias("asof_ts"),
        F.col("asof_value").alias("asof_value"),
    ).orderBy("event_id")


@query(
    "range_join_events_to_windows",
    oracle="""
    WITH windows AS (
      SELECT CAST(i AS BIGINT) AS window_id,
             TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i * 6) HOUR AS w_start,
             TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i * 6 + 2) HOUR AS w_end
      FROM range(0, 120) t(i)
    )
    SELECT w.window_id, e.event_id, e.event_type
    FROM events e JOIN windows w
      ON e.ts >= w.w_start AND e.ts < w.w_end
    ORDER BY w.window_id, e.event_id
    """,
)
def range_join_events_to_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: events falling inside 2-hour maintenance windows that
    start every 6 hours. Bucketed equi-join (1 h buckets) + exact filter —
    a hash join instead of the broadcast-nested-loop Spark would plan for
    the raw inequality."""
    ev = load_table(spark, sf_dir, "events")
    base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    windows = spark.range(120).select(
        F.col("id").alias("window_id"),
        F.timestamp_add("HOUR", (F.col("id") * 6).cast("int"), base).alias("w_start"),
        F.timestamp_add("HOUR", (F.col("id") * 6 + 2).cast("int"), base).alias("w_end"),
    )
    joined = range_join(
        ev.select("event_id", "event_type", "ts"),
        windows,
        point=F.col("ts"),
        start=F.col("w_start"),
        end=F.col("w_end"),
        bucket_len=3600,
    )
    return joined.select("window_id", "event_id", "event_type").orderBy(
        "window_id", "event_id"
    )


@query(
    "asof_next_purchase_within_hour",
    oracle="""
    SELECT c.event_id,
           c.user_id,
           c.ts,
           CASE WHEN p.ts IS NOT NULL
                 AND abs(epoch(c.ts) - epoch(p.ts)) <= 3600.0
                THEN p.ts END AS next_ts,
           CASE WHEN p.ts IS NOT NULL
                 AND abs(epoch(c.ts) - epoch(p.ts)) <= 3600.0
                THEN p.value END AS next_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    ORDER BY c.event_id
    """,
)
def asof_next_purchase_within_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of with tolerance (pandas merge_asof parity): for every
    click, the user's EARLIEST purchase at-or-after the click, nulled when
    it lags more than an hour — conversion-attribution shape. Same
    union+window plan as the backward query with the per-key sort
    reversed; the tolerance is a post-filter on the matched timestamp
    (nearest-then-drop, never replaced by a farther in-window row), so
    both engines agree bit-exactly: the epoch delta is the same
    micros/1e6 double on both sides."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), "value"
    )
    out = asof_join(
        clicks,
        purchases,
        key="user_id",
        left_ts="ts",
        right_ts="p_ts",
        right_values=["value"],
        direction="forward",
        tolerance=3600.0,
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_p_ts").alias("next_ts"),
        F.col("asof_value").alias("next_value"),
    ).orderBy("event_id")
