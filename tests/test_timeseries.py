"""Gap-fill operator semantics + TF-IDF sanity (extension surface)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.operators.timeseries import (
    calendar_spine,
    gapfill_daily,
)


def _d(s: str) -> datetime.date:
    return datetime.date.fromisoformat(s)


def test_calendar_spine_covers_global_range(spark):
    obs = spark.createDataFrame(
        [("a", _d("2024-01-03")), ("b", _d("2024-01-01"))],
        "k string, day date",
    )
    got = {(r["k"], r["day"].isoformat()) for r in calendar_spine(obs, "k", "day").collect()}
    # Range is GLOBAL min..max (both keys span 01-01..01-03).
    assert got == {
        (k, f"2024-01-0{i}") for k in ("a", "b") for i in (1, 2, 3)
    }


def test_gapfill_forward_fills_and_flags(spark):
    obs = spark.createDataFrame(
        [
            ("a", _d("2024-01-01"), 10.0),
            ("a", _d("2024-01-04"), 40.0),
            ("b", _d("2024-01-02"), 5.0),
        ],
        "k string, day date, v double",
    )
    out = gapfill_daily(
        obs, "k", "day", "v", default=F.lit(0.0), gap_flag_col="is_gap"
    )
    rows = {
        (r["k"], r["day"].isoformat()): (r["v"], r["is_gap"])
        for r in out.collect()
    }
    assert len(rows) == 8  # 2 keys x 4 days
    assert rows[("a", "2024-01-01")] == (10.0, 0)
    assert rows[("a", "2024-01-02")] == (10.0, 1)  # carried forward
    assert rows[("a", "2024-01-03")] == (10.0, 1)
    assert rows[("a", "2024-01-04")] == (40.0, 0)
    assert rows[("b", "2024-01-01")] == (0.0, 1)   # leading gap -> default
    assert rows[("b", "2024-01-02")] == (5.0, 0)
    assert rows[("b", "2024-01-03")] == (5.0, 1)


def test_gapfill_plan_has_no_data_sized_cartesian(spark):
    """The only nested-loop join allowed is the 1-row bounds broadcast; the
    observation join must be a real equi-join."""
    obs = spark.createDataFrame(
        [("a", _d("2024-01-01"), 1.0)], "k string, day date, v double"
    )
    plan = (
        gapfill_daily(obs, "k", "day", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_tfidf_ranks_rare_terms_above_common(spark):
    """A term appearing in one doc must outrank an equally-frequent term
    appearing in every doc."""
    from high_volume_market_data_pipeline_spark.queries_text import tfidf_top_terms
    import os
    import tempfile

    docs = spark.createDataFrame(
        [
            (0, "zebra zebra common common common", "en", "s", 30),
            (1, "common common common filler filler", "en", "s", 30),
            (2, "common common common other other", "en", "s", 30),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(os.path.join(tmp, "documents.parquet"))
        out = tfidf_top_terms(spark, tmp).collect()
    top0 = [r for r in out if r["doc_id"] == 0 and r["term_rank"] == 1][0]
    assert top0["token"] == "zebra"  # df=1 beats df=3 at equal-ish tf
    assert top0["df"] == 1


def _events_df(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # two 4h buckets for type "t": bucket 0 has a tie on ts (event_id
        # breaks it), bucket 1 is a singleton.
        (1, base + dt.timedelta(minutes=5), 7, "t", 10.0, "{}"),
        (2, base + dt.timedelta(minutes=5), 7, "t", 30.0, "{}"),
        (3, base + dt.timedelta(hours=3), 8, "t", 5.0, "{}"),
        (4, base + dt.timedelta(hours=5), 8, "t", 99.0, "{}"),
        (5, base + dt.timedelta(hours=1), 9, "u", 1.0, "{}"),
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_ohlc_resample_semantics(spark, tmp_path):
    from high_volume_market_data_pipeline_spark.queries_timeseries import (
        ohlc_resample_events,
    )

    _events_df(spark).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        (r["event_type"], r["bucket_s"]): r
        for r in ohlc_resample_events(spark, str(tmp_path)).collect()
    }
    b0 = out[("t", 1704067200 // 14400 * 14400)]
    # tie on ts at +5min: event_id 1 < 2, so open=10.0; close is the last
    # row of the bucket (+3h, value 5.0).
    assert (b0["open"], b0["high"], b0["low"], b0["close"]) == (
        10.0, 30.0, 5.0, 5.0,
    )
    assert b0["n_events"] == 3 and b0["total_value"] == 45.0
    b1 = out[("t", (1704067200 + 5 * 3600) // 14400 * 14400)]
    assert (b1["open"], b1["close"], b1["n_events"]) == (99.0, 99.0, 1)
    assert ("u", 1704067200 // 14400 * 14400) in out


def test_ohlc_plans_single_exchange(spark, tmp_path):
    """Both row_number windows and the groupBy hash on the same keys — the
    whole rollup must cost ONE shuffle of the fact table."""
    from high_volume_market_data_pipeline_spark.queries_timeseries import (
        ohlc_resample_events,
    )

    _events_df(spark).write.parquet(str(tmp_path / "events.parquet"))
    plan = (
        ohlc_resample_events(spark, str(tmp_path))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one hashpartitioning exchange for window+agg, one rangepartitioning
    # for the final orderBy — no third.
    assert plan.count("Exchange hashpartitioning") == 1


def test_ewma_event_rate_exact_halving(spark, tmp_path):
    """With two observed buckets of counts a then b, ewma = (a/2 + b)/1.5 —
    exact dyadic arithmetic, no tolerance needed."""
    import datetime as dt

    from high_volume_market_data_pipeline_spark.queries_timeseries import (
        ewma_event_rate,
    )

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    eid = 0
    for k in range(4):  # hour 0: 4 events
        eid += 1
        rows.append((eid, base + dt.timedelta(minutes=k), 1, "t", 1.0, "{}"))
    for k in range(2):  # hour 1: 2 events
        eid += 1
        rows.append(
            (eid, base + dt.timedelta(hours=1, minutes=k), 1, "t", 1.0, "{}")
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = sorted(
        ewma_event_rate(spark, str(tmp_path)).collect(),
        key=lambda r: r["bucket_ts"],
    )
    assert [r["n_events"] for r in out] == [4, 2]
    assert out[0]["ewma"] == 4.0
    # weights (oldest->newest) = 1/2, 1: (4*0.5 + 2*1) / 1.5
    assert out[1]["ewma"] == (4 * 0.5 + 2 * 1.0) / 1.5
