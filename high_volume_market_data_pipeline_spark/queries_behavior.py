"""Behavioral analytics over the events stream: ordered funnels and cohort
retention — the product-analytics shapes a market-data/clickstream consumer
runs downstream of the reference's gold layer (SURVEY §2 extension surface,
same family as sessionize_events_batch / stream_click_attribution).

Both queries are single-key window/rollup plans: the fact table shuffles
once on user_id, every later stage operates on rollup-sized frames, and all
arithmetic is integer/timestamp-exact — no float risk under the driver's
value-hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.catalog import load_table
from high_volume_market_data_pipeline_spark.registry import query


@query(
    "event_funnel_stages",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, ts, event_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) OVER w AS rv
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), c AS (
      SELECT user_id, event_type, ts, event_id, rv,
             MIN(CASE WHEN event_type = 'click' AND rv IS NOT NULL
                      THEN ts END) OVER w AS rc
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS s1,
             MAX(CASE WHEN event_type = 'click' AND rv IS NOT NULL
                      THEN 1 ELSE 0 END) AS s2,
             MAX(CASE WHEN event_type = 'purchase' AND rc IS NOT NULL
                      THEN 1 ELSE 0 END) AS s3
      FROM c GROUP BY user_id
    )
    SELECT stage, n_users FROM (
      SELECT '1_view' AS stage, CAST(SUM(s1) AS BIGINT) AS n_users
      FROM per_user
      UNION ALL
      SELECT '2_view_click', CAST(SUM(s2) AS BIGINT) FROM per_user
      UNION ALL
      SELECT '3_view_click_purchase', CAST(SUM(s3) AS BIGINT) FROM per_user
    )
    ORDER BY stage
    """,
)
def event_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel (view → click → purchase): a user counts
    for a stage only if its steps happened in order (a click counts only
    when SOME view precedes it at-or-before its timestamp; a purchase only
    after such a click).

    The order constraint is two running-min window passes over the SAME
    user_id partitioning — Catalyst plans one Exchange for both windows
    and the per-user rollup, so the funnel costs a single shuffle of the
    fact table regardless of scale; no self-joins (the naive
    events×events-per-step plan would be quadratic per user). Ties break
    on (ts, event_id) identically in both engines; a view and click at
    the exact same timestamp count as ordered iff the view's (ts,
    event_id) sorts first — the same inclusive-tie rule as asof_join."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rv = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    e = ev.withColumn("rv", rv)
    rc = F.min(
        F.when(
            (F.col("event_type") == "click") & F.col("rv").isNotNull(),
            F.col("ts"),
        )
    ).over(w)
    c = e.withColumn("rc", rc)
    per_user = c.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "view", 1).otherwise(0)
        ).alias("s1"),
        F.max(
            F.when(
                (F.col("event_type") == "click") & F.col("rv").isNotNull(), 1
            ).otherwise(0)
        ).alias("s2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & F.col("rc").isNotNull(),
                1,
            ).otherwise(0)
        ).alias("s3"),
    )
    totals = per_user.agg(
        F.sum("s1").alias("n1"), F.sum("s2").alias("n2"), F.sum("s3").alias("n3")
    )
    stages = totals.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("1_view").alias("stage"), F.col("n1").alias("n_users")
                ),
                F.struct(
                    F.lit("2_view_click").alias("stage"),
                    F.col("n2").alias("n_users"),
                ),
                F.struct(
                    F.lit("3_view_click_purchase").alias("stage"),
                    F.col("n3").alias("n_users"),
                ),
            )
        ).alias("s")
    )
    return stages.select("s.stage", "s.n_users").orderBy("stage")


@query(
    "weekly_cohort_retention",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS week
      FROM events
    ), cohort AS (
      SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
    )
    SELECT c.cohort_week,
           uw.week - c.cohort_week AS week_offset,
           COUNT(*) AS n_users
    FROM uw JOIN cohort c USING (user_id)
    GROUP BY 1, 2
    ORDER BY cohort_week, week_offset
    """,
)
def weekly_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention grid: users bucketed by their first active epoch
    week, counted again at each later week they return — the classic
    retention triangle. Weeks are integer epoch-week numbers (no calendar
    /timezone arithmetic to disagree on).

    Plan: distinct (user, week) prunes the fact table to the activity
    matrix first (one shuffle), the per-user MIN is a rollup of that
    matrix re-used via join rather than a second fact scan, and the final
    grid is cohort×offset-sized. COUNT(*) not COUNT(DISTINCT): (user,
    week) is already unique, so the expensive distinct-agg is avoided."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.expr("(CAST(ts AS BIGINT) div 604800)").alias("week"),
    ).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )
