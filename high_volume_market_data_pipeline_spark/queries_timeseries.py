"""Time-series gap-fill queries (driver north-star extension).

The reference's hypertable surface (rollups over time buckets) stops at
SPARSE aggregates; a downstream consumer (forecasting, feature windows)
needs DENSE series. `gapfill_nation_daily_revenue` is the canonical shape:
sparse big-order revenue per nation-day → calendar spine → forward fill.

Determinism notes (driver value-hash gate): revenue goes through the exact
decimal sum (`dsum`) before the double cast; the spine is integer date
arithmetic; the forward-fill window frame is ROWS UNBOUNDED PRECEDING with
a total (key, day) order — all bit-identical across Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.catalog import load_table
from high_volume_market_data_pipeline_spark.operators.joins import (
    broadcast_join,
    equi_join,
)
from high_volume_market_data_pipeline_spark.operators.aggregates import grouped_agg
from high_volume_market_data_pipeline_spark.operators.timeseries import gapfill_daily
from high_volume_market_data_pipeline_spark.registry import dsum, dsum_sql, query


@query(
    "gapfill_nation_daily_revenue",
    oracle=f"""
    WITH f AS (
      SELECT n_name AS nation, CAST(o_orderdate AS DATE) AS day, o_totalprice
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_totalprice > 400000
    ), a AS (
      SELECT nation, day, {dsum_sql("o_totalprice")} AS revenue
      FROM f GROUP BY 1, 2
    ), b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM a),
    k AS (SELECT DISTINCT nation FROM a),
    spine AS (
      SELECT nation, CAST(u AS DATE) AS day
      FROM k, b,
           unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
                                  INTERVAL 1 DAY)) AS s(u)
    )
    SELECT spine.nation, spine.day,
           COALESCE(last_value(a.revenue IGNORE NULLS) OVER (
             PARTITION BY spine.nation ORDER BY spine.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
             AS revenue,
           CAST(a.revenue IS NULL AS INT) AS is_gap
    FROM spine LEFT JOIN a ON spine.nation = a.nation AND spine.day = a.day
    ORDER BY spine.nation, spine.day
    """,
)
def gapfill_nation_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill + forward-fill: sparse daily big-order revenue per nation →
    dense calendar series, gaps carried forward (0.0 before the first
    observation), spine-only days flagged.

    The selective filter runs before any join (pushed to the scan); nation
    is a broadcast dim; the spine/fill machinery (operators/timeseries.py)
    touches only the post-aggregation frame — keys × days, not fact rows.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    j = equi_join(orders, cust, orders.o_custkey == cust.c_custkey)
    j = broadcast_join(j, nation, F.col("c_nationkey") == nation.n_nationkey)
    sparse = grouped_agg(
        j.select(
            F.col("n_name").alias("nation"),
            F.to_date("o_orderdate").alias("day"),
            "o_totalprice",
        ),
        ["nation", "day"],
        [dsum(F.col("o_totalprice")).alias("revenue")],
    )
    dense = gapfill_daily(
        sparse,
        key_col="nation",
        day_col="day",
        value_col="revenue",
        default=F.lit(0.0),
        gap_flag_col="is_gap",
    )
    return dense.select("nation", "day", "revenue", "is_gap").orderBy(
        "nation", "day"
    )


@query(
    "ewma_event_rate",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ), w AS (
      SELECT bucket_ts, event_type, n_events,
             list(n_events) OVER (
               PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN 31 PRECEDING AND CURRENT ROW) AS arr
      FROM hourly
    )
    SELECT bucket_ts, event_type, n_events,
           list_sum(list_transform(arr,
               (x, i) -> x * pow(2.0, CAST(i - len(arr) AS DOUBLE))))
           / list_sum(list_transform(arr,
               (x, i) -> pow(2.0, CAST(i - len(arr) AS DOUBLE))))
             AS ewma
    FROM w
    ORDER BY event_type, bucket_ts
    """,
)
def ewma_event_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (α=0.5) of hourly event counts
    per event_type over the trailing 32 observed buckets.

    The reference's rollup surface stops at plain windowed means
    (transform_gold_analytics.py's daily aggregates); EWMA is the smoothing
    a monitoring/forecasting consumer layers on top. Window input is the
    hourly ROLLUP (≤ |types|·hours rows), so the smoothing pass is free at
    any fact-table scale — one shuffle for the rollup, one for the per-type
    window.

    Cross-engine determinism is by construction, not luck: α=1/2 makes
    every weight 2^-k (exactly representable), counts are integers ≤ 2^11,
    so every term n·2^-k and every partial sum is an exact dyadic rational
    within the 52-bit mantissa — summation ORDER cannot change the result
    (unlike general double sums), and the final division is a single
    correctly-rounded IEEE op. DuckDB's lambda index is 1-based while
    Spark's is 0-based; both sides normalize the newest-element weight to
    2^0 (older terms halve from there), identical term-for-term."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_ts"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    win = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(-31, Window.currentRow)
    )
    arr = F.collect_list("n_events").over(win)
    w = hourly.select("bucket_ts", "event_type", "n_events", arr.alias("arr"))
    m = F.size("arr")
    # Spark lambda index is 0-based: element j of m gets weight 2^(j+1-m),
    # matching DuckDB's 1-based 2^(i-m): newest term always weighs 2^-1.
    num = F.aggregate(
        F.transform(
            "arr",
            lambda x, i: x * F.pow(F.lit(2.0), (i + 1 - m).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    den = F.aggregate(
        F.transform(
            "arr",
            lambda x, i: F.pow(F.lit(2.0), (i + 1 - m).cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return w.select(
        "bucket_ts",
        "event_type",
        "n_events",
        (num / den).alias("ewma"),
    ).orderBy("event_type", "bucket_ts")


@query(
    "ohlc_resample_events",
    oracle=f"""
    WITH e AS (
      SELECT event_type,
             (CAST(floor(epoch(ts)) AS BIGINT) // 14400) * 14400 AS bucket_s,
             value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type,
                            (CAST(floor(epoch(ts)) AS BIGINT) // 14400)
               ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (
               PARTITION BY event_type,
                            (CAST(floor(epoch(ts)) AS BIGINT) // 14400)
               ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, bucket_s,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           COUNT(*) AS n_events,
           {dsum_sql("value")} AS total_value
    FROM e
    GROUP BY 1, 2
    ORDER BY event_type, bucket_s
    """,
)
def ohlc_resample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resample: open/high/low/close of `value` per (event_type,
    4-hour bucket) — the reference's core market-data downsample shape
    (transform_gold_analytics.py's daily OHLC rollups) generalized to any
    bucket width.

    First/last within a bucket tiebreak on (ts, event_id) via two
    row_number windows; both windows and the final groupBy hash on the
    SAME (event_type, bucket) keys, so Catalyst plans ONE exchange for all
    three — the rollup costs a single shuffle of the fact table, exactly
    what a 100-TB resample must be. Bucket is integer epoch-seconds
    arithmetic (no tz/halfway risk); high/low/open/close are exact value
    picks; total_value goes through the exact decimal sum."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # timestamp→long truncates to whole seconds (floor for post-epoch),
    # matching the oracle's floor(epoch(ts)); `div` keeps it integer math.
    bucket = F.expr("(CAST(ts AS BIGINT) div 14400) * 14400")
    e = ev.select(
        "event_type",
        bucket.alias("bucket_s"),
        "value",
        "ts",
        "event_id",
    )
    wa = Window.partitionBy("event_type", "bucket_s").orderBy("ts", "event_id")
    wd = Window.partitionBy("event_type", "bucket_s").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    e = e.select(
        "event_type",
        "bucket_s",
        "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return (
        e.groupBy("event_type", "bucket_s")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
        .orderBy("event_type", "bucket_s")
    )


@query(
    "event_rate_anomalies",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ), w AS (
      SELECT bucket_ts, event_type, n_events,
             SUM(n_events) OVER win AS s,
             SUM(n_events * n_events) OVER win AS s2,
             COUNT(n_events) OVER win AS cnt
      FROM hourly
      WINDOW win AS (
        PARTITION BY event_type ORDER BY bucket_ts
        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING
      )
    )
    SELECT bucket_ts, event_type, n_events,
           FLOOR((s / 24.0) * 1e6) / 1e6 AS trailing_mean,
           FLOOR(((n_events - s / 24.0)
                  / sqrt((s2 - s * s / 24.0) / 24.0)) * 1e6) / 1e6
             AS z_score
    FROM w
    WHERE cnt = 24 AND (s2 - s * s / 24.0) > 0
      AND abs((n_events - s / 24.0)
              / sqrt((s2 - s * s / 24.0) / 24.0)) >= 2
    ORDER BY event_type, bucket_ts
    """,
)
def event_rate_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly detection: hourly counts per event_type scored
    against the trailing 24 observed buckets' mean/std; |z| ≥ 2 flags.

    The monitoring-over-aggregates shape (volume-drop / spike alerting on
    an ingest feed). One shuffle for the hourly rollup, one for the
    per-type window — the window input is the ROLLUP (≤ |types|·hours
    rows), not the raw events, so the alert pass costs nothing at 100 TB.

    Determinism: counts are integers, so the trailing moment sums (Σn,
    Σn²) are engine-exact, the derived mean/variance are identical IEEE
    doubles, and the z comparison agrees bit-for-bit — the same
    moment-sum trick as stats_quantity_price (built-in stddev is NOT
    cross-engine reproducible). Outputs floor-quantize to 1e-6 (ROUND on
    integer-ratio doubles hits halfway cases systematically; floor has no
    rounding mode)."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_ts"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    win = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(-24, -1)
    )
    n = F.col("n_events")
    w = hourly.select(
        "bucket_ts",
        "event_type",
        "n_events",
        F.sum(n).over(win).alias("s"),
        F.sum(n * n).over(win).alias("s2"),
        F.count(n).over(win).alias("cnt"),
    )
    mean = F.col("s") / 24.0
    var = (F.col("s2") - F.col("s") * F.col("s") / 24.0) / 24.0
    z = (n - mean) / F.sqrt(var)
    return (
        w.filter(
            (F.col("cnt") == 24)
            & ((F.col("s2") - F.col("s") * F.col("s") / 24.0) > 0)
            & (F.abs(z) >= 2)
        )
        .select(
            "bucket_ts",
            "event_type",
            "n_events",
            (F.floor(mean * 1e6) / 1e6).alias("trailing_mean"),
            (F.floor(z * 1e6) / 1e6).alias("z_score"),
        )
        .orderBy("event_type", "bucket_ts")
    )


@query(
    "vwap_monthly_lineitem",
    oracle=f"""
    SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
           l_returnflag,
           {dsum_sql("l_extendedprice")} AS notional,
           {dsum_sql("l_quantity")} AS volume,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             AS vwap,
           COUNT(*) AS n_lines
    FROM lineitem
    GROUP BY 1, 2
    ORDER BY ship_month, l_returnflag
    """,
)
def vwap_monthly_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VWAP — THE market-data aggregate (the reference's gold layer
    computes its daily analogue over trade candles): volume-weighted
    average price per (ship month, return flag), with the notional and
    volume legs alongside.

    Determinism: both legs are exact decimal sums cast once to double
    (summation-order-free), and the VWAP is a single correctly-rounded
    IEEE division of those two doubles — bit-identical across engines,
    no quantization needed. One partial+final aggregation, nothing else:
    the canonical map-side-combine rollup at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    notional = F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast(
        "double"
    )
    volume = F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
    return (
        li.groupBy(
            F.to_date(F.date_trunc("month", "l_shipdate")).alias("ship_month"),
            "l_returnflag",
        )
        .agg(
            notional.alias("notional"),
            volume.alias("volume"),
            (notional / volume).alias("vwap"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("ship_month", "l_returnflag")
    )
