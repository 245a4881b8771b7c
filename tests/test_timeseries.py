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
