"""Invariant tests for the market-microstructure family (the exact values
are pinned by the DuckDB oracles in test_oracle_parity; these pin the
mathematical contracts that must hold on ANY input)."""

from __future__ import annotations

from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.catalog import load_table
from high_volume_market_data_pipeline_spark.queries import QUERIES

from .conftest import SF_DIR


def test_twap_bounded_by_daily_value_range(spark):
    twap = QUERIES["twap_user_daily"](spark, SF_DIR)
    ev = load_table(spark, SF_DIR, "events")
    bounds = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    j = twap.join(bounds, ["user_id", "day"])
    # the true weighted mean lies inside [lo, hi]; the operator floor-
    # quantizes each value to thousandths BEFORE weighting (< 1e-3 loss,
    # downward only) and floor-quantizes the output to 1e-6, so the TWAP
    # can sit up to 1e-3 + 1e-6 below lo but never above hi
    bad = j.filter(
        (F.col("twap_value") < F.col("lo") - (1e-3 + 1e-6))
        | (F.col("twap_value") > F.col("hi"))
    )
    assert bad.count() == 0
    assert twap.count() > 0


def test_max_drawdown_in_unit_interval_and_peak_exact(spark):
    dd = QUERIES["max_drawdown_user"](spark, SF_DIR)
    rows = dd.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.max_drawdown < 1.0
    ev = load_table(spark, SF_DIR, "events")
    raw = ev.groupBy("user_id").agg(
        F.max("value").alias("true_peak"), F.count(F.lit(1)).alias("true_n")
    )
    j = dd.join(raw, "user_id")
    assert (
        j.filter(
            (F.col("peak_value") != F.col("true_peak"))
            | (F.col("n_events") != F.col("true_n"))
        ).count()
        == 0
    )


def test_bollinger_band_ordering_and_breakout_consistency(spark):
    b = QUERIES["bollinger_breakouts"](spark, SF_DIR)
    rows = b.collect()
    assert rows
    for r in rows:
        assert r.band_lower <= r.band_mean <= r.band_upper
        assert r.is_breakout in (0, 1)
        if r.is_breakout == 1:
            # flag is computed in the quantized domain; bands are floor-
            # quantized — allow the 1e-3 quantization granularity
            assert (
                r.close > r.band_upper - 2e-3 or r.close < r.band_lower + 2e-3
            )


def test_rsi_range_and_warmup_exclusion(spark):
    r = QUERIES["rsi_event_types"](spark, SF_DIR)
    rows = r.collect()
    assert rows
    for row in rows:
        assert 0.0 <= row.rsi_14 <= 100.0
    # warm-up exclusion: per event_type, the RSI series must start 14
    # deltas (15 closes) after the close series starts
    closes = QUERIES["bollinger_breakouts"](spark, SF_DIR)  # same rollup keys
    n_closes = (
        closes.groupBy("event_type").count().withColumnRenamed("count", "nb")
    )
    n_rsi = r.groupBy("event_type").count().withColumnRenamed("count", "nr")
    j = {
        row.event_type: (row.nb, row.nr)
        for row in n_closes.join(n_rsi, "event_type").collect()
    }
    # bollinger rows = closes - 19 warmup; rsi rows = closes - 14 warmup
    # (deltas start one later) => nr - nb == 5 whenever both series exist
    for et, (nb, nr) in j.items():
        assert nr - nb == 5, (et, nb, nr)


# ---- hypothesis: operators vs pure-Python references on random inputs ----

from datetime import datetime, timedelta
from math import floor

from hypothesis import given, settings
from hypothesis import strategies as st

_BASE = datetime(2024, 1, 1)

# (key, seconds offset within 2 days, price in cents). Cents range dips
# below zero on purpose: the drawdown operator's contract is total over
# any value column (zero/negative running peaks yield NULL terms, not
# inf/NaN) and the reference must exercise that branch.
_events = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.integers(0, 2 * 86400 - 1),
        st.integers(-10_000, 50_000),
    ),
    min_size=1,
    max_size=30,
)


def _frame(spark, evs):
    rows = [
        (k, i, _BASE + timedelta(seconds=s), cents / 100.0)
        for i, (k, s, cents) in enumerate(evs)
    ]
    return spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, ts timestamp, value double"
    )


def _py_twap(evs):
    """Pure-Python replica of twap_daily with the identical float ops."""
    by_day = {}
    for i, (k, s, cents) in enumerate(evs):
        ts = _BASE + timedelta(seconds=s)
        by_day.setdefault((k, ts.date()), []).append(
            (ts, i, int(s), floor((cents / 100.0) * 1000))
        )
    out = {}
    for (k, day), rows in by_day.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        num = den = 0
        for (_, _, e0, q), (_, _, e1, _) in zip(rows, rows[1:]):
            num += q * (e1 - e0)
            den += e1 - e0
        if den > 0:
            out[(k, day)] = (
                len(rows),
                floor(((float(num) / float(den)) / 1000.0) * 1e6) / 1e6,
            )
    return out


def _py_drawdown(evs):
    by_key = {}
    for i, (k, s, cents) in enumerate(evs):
        by_key.setdefault(k, []).append(
            (_BASE + timedelta(seconds=s), i, cents / 100.0)
        )
    out = {}
    for k, rows in by_key.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        peak, worst = float("-inf"), None
        for _, _, v in rows:
            peak = max(peak, v)
            if peak > 0:  # drawdown term undefined for peak <= 0
                d = (peak - v) / peak
                worst = d if worst is None else max(worst, d)
        out[k] = (
            len(rows),
            max(r[2] for r in rows),
            None if worst is None else floor(worst * 1e6) / 1e6,
        )
    return out


@given(_events)
@settings(max_examples=12, deadline=None)
def test_twap_daily_matches_python_reference(spark, evs):
    from high_volume_market_data_pipeline_spark.queries_market import (
        twap_daily,
    )

    got = {
        (r.user_id, r.day): (r.n_events, r.twap_value)
        for r in twap_daily(_frame(spark, evs)).collect()
    }
    assert got == _py_twap(evs)


@given(_events)
@settings(max_examples=12, deadline=None)
def test_max_drawdown_matches_python_reference(spark, evs):
    from high_volume_market_data_pipeline_spark.queries_market import (
        max_drawdown,
    )

    got = {
        r.user_id: (r.n_events, r.peak_value, r.max_drawdown)
        for r in max_drawdown(_frame(spark, evs)).collect()
    }
    assert got == _py_drawdown(evs)


def test_event_type_correlations_match_numpy_reference(spark):
    """Independent recomputation: build the hourly (bucket, type) count
    matrix in pandas and compute Pearson with numpy over co-observed
    hours — a different formula path than both the Spark moment sums and
    the DuckDB oracle. Agreement must hold to the 1e-6 quantization."""
    import numpy as np

    ev = load_table(spark, SF_DIR, "events").select("ts", "event_type")
    pdf = ev.toPandas()
    pdf["bucket"] = pdf["ts"].dt.floor("h")
    counts = pdf.groupby(["bucket", "event_type"]).size().unstack()
    got = {
        (r.type_a, r.type_b): (r.n, r.pearson_r)
        for r in QUERIES["event_type_correlations"](spark, SF_DIR).collect()
    }
    assert got
    for (ta, tb), (n, r_spark) in got.items():
        both = counts[[ta, tb]].dropna()
        assert n == len(both)
        x, y = both[ta].to_numpy(float), both[tb].to_numpy(float)
        r_np = np.corrcoef(x, y)[0, 1]
        # floor-quantized Spark value vs full-precision numpy: within 1 ulp
        # of the 1e-6 grid
        assert abs(r_spark - r_np) <= 1.5e-6, (ta, tb, r_spark, r_np)
