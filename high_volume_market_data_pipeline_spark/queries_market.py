"""Market-microstructure analytics (reference-domain extension).

The reference is a crypto market-data pipeline whose gold layer stops at
per-day sum/avg rollups (`silver_to_gold_crypto_stats.py:77-84`); this
module adds the standard next tier of market analytics a trading / risk
consumer computes over the same feed: interval-weighted TWAP, peak-to-
trough drawdown, Bollinger bands, and RSI. All four run on the `events`
feed (ts, key, value) — the same (instrument, timestamp, price) shape as
the reference's crypto snapshots.

Every query is driver-hash deterministic by construction:

- prices quantize to integer thousandths (``floor(value*1000)`` — the same
  double multiply + floor is bit-identical in Spark and DuckDB, whatever
  the result), so all moment/weight sums are exact integer arithmetic
  with no summation-order dependence;
- the only floating-point ops on derived values are single correctly-
  rounded IEEE ops (one division, one sqrt) applied to identical inputs;
- outputs floor-quantize to 1e-6 (ROUND on constructed ratios hits
  halfway cases systematically — NOTES.md round-2 rule 4).

Scale notes: every query aggregates the fact table once on its natural
keys; the window passes run over hourly ROLLUPS (≤ |keys|·hours rows), so
the analytic tier is free at 100 TB — the single fact-table shuffle
dominates, exactly as it must.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.catalog import load_table
from high_volume_market_data_pipeline_spark.registry import query

# Quantized price: integer thousandths. 490.02 * 1000 may land on either
# side of an integer in IEEE — but BOTH engines compute the identical
# double product and floor, so the quantization is bit-identical even
# where it is not the "true" rounding. Max |q| ~ 5e5 on testdata keeps
# every product/sum below 2^53 (documented per query).
_Q = "CAST(floor(value * 1000) AS BIGINT)"


def _q(col: F.Column) -> F.Column:
    return F.floor(col * 1000).cast("bigint")


def _floor6(col: F.Column) -> F.Column:
    return F.floor(col * F.lit(1e6)) / F.lit(1e6)


# Hourly closes per event_type: last value in each hour, tiebreak
# (ts, event_id) desc — the shared "price series" input for the
# Bollinger / RSI windows (same rn_d idiom as ohlc_resample_events).
_CLOSES_SQL = f"""
    closes AS (
      SELECT event_type, bucket_ts, value AS close, {_Q} AS q
      FROM (
        SELECT event_type, date_trunc('hour', ts) AS bucket_ts, value,
               ROW_NUMBER() OVER (
                 PARTITION BY event_type, date_trunc('hour', ts)
                 ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      )
      WHERE rn = 1
    )
"""


def _hourly_closes(ev: DataFrame) -> DataFrame:
    wd = Window.partitionBy("event_type", "bucket_ts").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("bucket_ts"),
            "ts",
            "event_id",
            "value",
        )
        .withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            "bucket_ts",
            F.col("value").alias("close"),
            _q(F.col("value")).alias("q"),
        )
    )


def twap_daily(
    ev: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Interval-weighted TWAP per (key, day) — the operator behind
    twap_user_daily, reusable on any (key, ts, id, value) frame and
    hypothesis-pinned against a pure-Python reference in
    tests/test_market.py."""
    w = Window.partitionBy(key_col, "day").orderBy(ts_col, id_col)
    e = ev.select(
        key_col,
        F.to_date(ts_col).alias("day"),
        ts_col,
        id_col,
        F.col(ts_col).cast("bigint").alias("epoch_s"),
        _q(F.col(value_col)).alias("qv"),
    ).withColumn("w_s", F.lead("epoch_s").over(w) - F.col("epoch_s"))
    agg = e.groupBy(key_col, "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("qv") * F.col("w_s")).alias("num"),
        F.sum("w_s").alias("den"),
    )
    twap = (
        F.col("num").cast("double") / F.col("den").cast("double")
    ) / F.lit(1000.0)
    return (
        agg.filter(F.col("den") > 0)
        .select(
            key_col, "day", "n_events", _floor6(twap).alias("twap_value")
        )
        .orderBy(key_col, "day")
    )


def max_drawdown(
    ev: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Running-peak max drawdown per key — the operator behind
    max_drawdown_user, hypothesis-pinned in tests/test_market.py.

    Total over any (key, ts, id, value) input: the relative-drawdown term
    is only defined while the running peak is positive (a peak of 0 would
    divide by zero, a negative peak flips the ratio's sign) — rows before
    the first positive peak contribute no term, and a key whose values
    never go positive reports NULL max_drawdown."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    p = ev.select(key_col, ts_col, id_col, value_col).withColumn(
        "peak", F.max(value_col).over(w)
    )
    dd = F.when(
        F.col("peak") > 0,
        (F.col("peak") - F.col(value_col)) / F.col("peak"),
    )
    return (
        p.select(key_col, value_col, dd.alias("dd"))
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(value_col).alias("peak_value"),
            _floor6(F.max("dd")).alias("max_drawdown"),
        )
        .orderBy(key_col)
    )



@query(
    "twap_user_daily",
    oracle="""
    WITH e AS (
      SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
             CAST(floor(value * 1000) AS BIGINT) AS qv
      FROM events
    ), w AS (
      SELECT user_id, day, qv,
             lead(epoch_s) OVER (
               PARTITION BY user_id, day ORDER BY ts, event_id
             ) - epoch_s AS w_s
      FROM e
    )
    SELECT user_id, day, COUNT(*) AS n_events,
           FLOOR(((CAST(SUM(qv * w_s) AS DOUBLE)
                   / CAST(SUM(w_s) AS DOUBLE)) / 1000.0) * 1e6) / 1e6
             AS twap_value
    FROM w
    GROUP BY user_id, day
    HAVING SUM(w_s) > 0
    ORDER BY user_id, day
    """,
)
def twap_user_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per (user, day): each observation is
    weighted by the seconds it remained current (gap to the next event in
    the same day; the day's last observation carries no weight). TWAP is
    the execution-quality benchmark the reference's plain `avg(price)`
    gold rollup (`silver_to_gold_crypto_stats.py:80-82`) approximates only
    when arrivals are uniform — on an irregular feed the interval
    weighting is the correct answer.

    One shuffle on (user, day) serves both the lead() window and the
    aggregation (same keys → Catalyst reuses the exchange). Determinism:
    weights are integer epoch-second gaps (timestamp→long truncates
    exactly like floor(epoch(ts))), prices are integer thousandths, so
    both sum legs are exact integer math (per-term |qv·w| ≤ 5e5·86400 ≈
    4e10, far under 2^53); the TWAP is one division of two exact doubles.
    Single-observation and same-second days (zero total weight) are
    excluded on both sides."""
    return twap_daily(load_table(spark, sf_dir, "events"))


@query(
    "max_drawdown_user",
    oracle="""
    WITH p AS (
      SELECT user_id, value,
             MAX(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM events
    )
    SELECT user_id, COUNT(*) AS n_events,
           MAX(value) AS peak_value,
           FLOOR(MAX(CASE WHEN peak > 0 THEN (peak - value) / peak END)
                 * 1e6) / 1e6 AS max_drawdown
    FROM p
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def max_drawdown_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum peak-to-trough drawdown of `value` per user over the full
    feed — the risk statistic a market consumer derives from the
    reference's price history that no plain groupBy rollup can express
    (it needs the running-peak window).

    One shuffle on user_id serves both the running-max window and the
    final aggregation. Determinism: the running peak is a pure selection
    over stored doubles (no arithmetic), each drawdown is one subtraction
    and one division of identical doubles, and the per-user max is again
    a selection — every engine sees bit-identical candidates, so the
    argmax cannot diverge. Output floor-quantizes to 1e-6."""
    return max_drawdown(load_table(spark, sf_dir, "events"))


@query(
    "bollinger_breakouts",
    oracle=f"""
    WITH {_CLOSES_SQL}, w AS (
      SELECT event_type, bucket_ts, close, q,
             SUM(q) OVER win AS s,
             SUM(q * q) OVER win AS s2,
             COUNT(q) OVER win AS cnt
      FROM closes
      WINDOW win AS (
        PARTITION BY event_type ORDER BY bucket_ts
        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, bucket_ts, close,
           FLOOR((CAST(s AS DOUBLE) / 20.0) / 1000.0 * 1e6) / 1e6
             AS band_mean,
           FLOOR(((CAST(s AS DOUBLE) / 20.0
                   + 2 * sqrt(CAST(20 * s2 - s * s AS DOUBLE) / 400.0))
                  / 1000.0) * 1e6) / 1e6 AS band_upper,
           FLOOR(((CAST(s AS DOUBLE) / 20.0
                   - 2 * sqrt(CAST(20 * s2 - s * s AS DOUBLE) / 400.0))
                  / 1000.0) * 1e6) / 1e6 AS band_lower,
           CAST(abs(q - CAST(s AS DOUBLE) / 20.0)
                > 2 * sqrt(CAST(20 * s2 - s * s AS DOUBLE) / 400.0) AS INT)
             AS is_breakout
    FROM w
    WHERE cnt = 20
    ORDER BY event_type, bucket_ts
    """,
)
def bollinger_breakouts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (20-bucket rolling mean ± 2σ) over hourly closes
    per event_type, flagging closes outside the band — the volatility
    envelope a market monitor layers on the reference's OHLC tier.

    The window input is the hourly close ROLLUP, not the fact table, so
    the band pass costs |types|·hours rows at any scale; the close
    extraction itself shares one (type, hour) exchange with its window
    (same idiom as ohlc_resample_events). Determinism: closes quantize to
    integer thousandths, the rolling Σq/Σq² are exact integers (q² ≤
    2.5e11, ×20 buckets ≈ 5e12 < 2^53; 20·s2 − s² stays ≤ ~1e14), the
    variance is one exact-integer-to-double cast and division, σ is one
    correctly-rounded sqrt, and the breakout comparison runs in the
    quantized domain on both sides — built-in stddev is NOT cross-engine
    reproducible (NOTES.md), which is exactly why the moment-sum form is
    used."""
    ev = load_table(spark, sf_dir, "events")
    closes = _hourly_closes(ev)
    win = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(-19, Window.currentRow)
    )
    q = F.col("q")
    w = closes.select(
        "event_type",
        "bucket_ts",
        "close",
        "q",
        F.sum(q).over(win).alias("s"),
        F.sum(q * q).over(win).alias("s2"),
        F.count(q).over(win).alias("cnt"),
    )
    mean_q = F.col("s").cast("double") / F.lit(20.0)
    var_q = (F.lit(20) * F.col("s2") - F.col("s") * F.col("s")).cast(
        "double"
    ) / F.lit(400.0)
    sigma_q = F.sqrt(var_q)
    return (
        w.filter(F.col("cnt") == 20)
        .select(
            "event_type",
            "bucket_ts",
            "close",
            _floor6(mean_q / F.lit(1000.0)).alias("band_mean"),
            _floor6((mean_q + 2 * sigma_q) / F.lit(1000.0)).alias(
                "band_upper"
            ),
            _floor6((mean_q - 2 * sigma_q) / F.lit(1000.0)).alias(
                "band_lower"
            ),
            (F.abs(q - mean_q) > 2 * sigma_q).cast("int").alias(
                "is_breakout"
            ),
        )
        .orderBy("event_type", "bucket_ts")
    )


@query(
    "rsi_event_types",
    oracle=f"""
    WITH {_CLOSES_SQL}, d AS (
      SELECT event_type, bucket_ts, close,
             q - lag(q) OVER (
               PARTITION BY event_type ORDER BY bucket_ts) AS delta
      FROM closes
    ), f AS (
      SELECT event_type, bucket_ts, close,
             SUM(GREATEST(delta, 0)) OVER win AS g,
             SUM(GREATEST(-delta, 0)) OVER win AS l,
             COUNT(delta) OVER win AS cnt
      FROM d
      WHERE delta IS NOT NULL
      WINDOW win AS (
        PARTITION BY event_type ORDER BY bucket_ts
        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, bucket_ts, close,
           FLOOR(((100.0 * CAST(g AS DOUBLE)) / CAST(g + l AS DOUBLE))
                 * 1e6) / 1e6 AS rsi_14
    FROM f
    WHERE cnt = 14 AND g + l > 0
    ORDER BY event_type, bucket_ts
    """,
)
def rsi_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """14-period RSI over hourly closes per event_type (Wilder's simple-
    average form: RSI = 100·gains/(gains+losses) over the trailing 14
    deltas) — the momentum oscillator tier above the reference's rollups.

    Same rollup-then-window shape as the Bollinger query: the fact table
    shuffles once into hourly closes; the lag/sum windows run over the
    tiny close series. Determinism: deltas are exact integer differences
    of quantized closes, the trailing gain/loss sums are exact integers
    (|Σ| ≤ 14·5e5·1e3 = 7e9), and the RSI is one multiply and one divide
    on exactly-representable doubles. Warm-up rows (fewer than 14 deltas)
    and flat stretches (gains+losses = 0) are excluded on both sides."""
    ev = load_table(spark, sf_dir, "events")
    closes = _hourly_closes(ev)
    wlag = Window.partitionBy("event_type").orderBy("bucket_ts")
    d = closes.withColumn(
        "delta", F.col("q") - F.lag("q").over(wlag)
    ).filter(F.col("delta").isNotNull())
    win = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(-13, Window.currentRow)
    )
    delta = F.col("delta")
    f = d.select(
        "event_type",
        "bucket_ts",
        "close",
        F.sum(F.greatest(delta, F.lit(0))).over(win).alias("g"),
        F.sum(F.greatest(-delta, F.lit(0))).over(win).alias("l"),
        F.count(delta).over(win).alias("cnt"),
    )
    rsi = (F.lit(100.0) * F.col("g").cast("double")) / (
        F.col("g") + F.col("l")
    ).cast("double")
    return (
        f.filter((F.col("cnt") == 14) & (F.col("g") + F.col("l") > 0))
        .select(
            "event_type", "bucket_ts", "close", _floor6(rsi).alias("rsi_14")
        )
        .orderBy("event_type", "bucket_ts")
    )


@query(
    "event_type_correlations",
    oracle="""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
             COUNT(*) AS n_events
      FROM events GROUP BY 1, 2
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.n_events AS x, b.n_events AS y
      FROM hourly a
      JOIN hourly b
        ON a.bucket_ts = b.bucket_ts AND a.event_type < b.event_type
    ), m AS (
      SELECT type_a, type_b,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM pairs GROUP BY 1, 2
    )
    SELECT type_a, type_b, n,
           FLOOR((CAST(n * sxy - sx * sy AS DOUBLE)
                  / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                     * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) * 1e6) / 1e6
             AS pearson_r
    FROM m
    WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    ORDER BY type_a, type_b
    """,
)
def event_type_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of hourly event rates between event
    types — the cross-instrument correlation matrix every market risk
    consumer computes, done scale-safely: the fact table rolls up ONCE to
    (hour, type) counts, and the pair join runs over that tiny rollup
    (hours × types rows), never over raw events.

    Built-in ``corr`` is NOT cross-engine reproducible (float accumulation
    order — NOTES.md); here every moment (n, Σx, Σy, Σxy, Σx², Σy²) is an
    exact integer sum over integer counts, so both engines derive the
    correlation from identical integers via two correctly-rounded sqrts,
    one multiply, one divide — bit-identical, then floor-quantized.
    Co-observation semantics: only hours where BOTH types fired enter a
    pair's moments (inner join on the rollup); degenerate (zero-variance)
    pairs are excluded on both sides."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("bucket_ts"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n_events"))
    a = hourly.select(
        F.col("bucket_ts").alias("bts"),
        F.col("event_type").alias("type_a"),
        F.col("n_events").alias("x"),
    )
    b = hourly.select(
        F.col("bucket_ts").alias("bts"),
        F.col("event_type").alias("type_b"),
        F.col("n_events").alias("y"),
    )
    pairs = a.join(b, "bts").filter(F.col("type_a") < F.col("type_b"))
    x, y = F.col("x"), F.col("y")
    m = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov_n = (n * sxy - sx * sy).cast("double")
    var_x = (n * sxx - sx * sx).cast("double")
    var_y = (n * syy - sy * sy).cast("double")
    r = cov_n / (F.sqrt(var_x) * F.sqrt(var_y))
    return (
        m.filter((n * sxx - sx * sx > 0) & (n * syy - sy * sy > 0))
        .select("type_a", "type_b", "n", _floor6(r).alias("pearson_r"))
        .orderBy("type_a", "type_b")
    )


@query(
    "value_histogram",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 25.0) AS BIGINT) AS bin,
           FLOOR(CAST(floor(value / 25.0) AS BIGINT) * 25.0 * 1e6) / 1e6
             AS bin_low,
           COUNT(*) AS n,
           CAST(SUM(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
             AS value_millis
    FROM events
    GROUP BY 1, 2
    ORDER BY event_type, bin
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event_type (25-unit bins) — the
    distribution profile behind outlier fences, binned features, and the
    reference gold layer's summary stats. One partial+final aggregation;
    bins are floor-of-identical-double integers, per-bin mass an exact
    integer milli-unit sum."""
    ev = load_table(spark, sf_dir, "events")
    bin_ = F.floor(F.col("value") / F.lit(25.0)).cast("bigint")
    return (
        ev.groupBy("event_type", bin_.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_q(F.col("value"))).alias("value_millis"),
        )
        .select(
            "event_type",
            "bin",
            _floor6(F.col("bin") * F.lit(25.0)).alias("bin_low"),
            "n",
            "value_millis",
        )
        .orderBy("event_type", "bin")
    )
