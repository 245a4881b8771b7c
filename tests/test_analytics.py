"""Tests for the extended analytics queries beyond oracle parity:
approximation error bounds and physical-plan shape (the plans we'd want at
100 TB, asserted so regressions surface in CI, not in production)."""

from __future__ import annotations

from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.queries_analytics import (
    approx_distinct_users,
    revenue_by_nation_q5,
    shipping_priority_q3,
    user_peak_event,
)
from tests.conftest import SF_DIR


def test_approx_distinct_within_error(spark):
    """HLL++ at rsd=0.02 must land within 5% of the exact distinct count."""
    from high_volume_market_data_pipeline_spark.catalog import load_table

    approx = {
        r["event_type"]: r["approx_users"]
        for r in approx_distinct_users(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r["event_type"]: r["exact"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(1, 0.05 * n), (et, approx[et], n)


def test_q3_plans_top_k_not_full_sort(spark):
    """Global top-10 must plan as TakeOrderedAndProject (heap per partition
    + driver merge), never a full global sort of the aggregate."""
    plan = shipping_priority_q3(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan


def test_q5_broadcasts_dims(spark):
    """nation/region joins must be broadcast — a shuffle join on a 5-row dim
    at 100 TB wastes a full exchange of the fact table."""
    plan = revenue_by_nation_q5(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_user_peak_event_is_hash_agg_not_window(spark):
    """Arg-max via max(struct) must plan as a partial+final aggregate
    (SortAggregate — struct max isn't hash-aggregable), not a window sort:
    the shuffle then carries one partial row per (user, task), and windows
    can't partial-aggregate map-side."""
    plan = user_peak_event(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan, plan
    assert "Window" not in plan, plan


def test_approx_percentiles_rank_accuracy(spark):
    """The sketch returns a real data point whose RANK must sit within the
    accuracy bound of the target quantile (value distance is the wrong
    metric: exact percentile interpolates, the sketch doesn't, and the gap
    between adjacent order statistics can be large in small groups)."""
    from high_volume_market_data_pipeline_spark.catalog import load_table
    from high_volume_market_data_pipeline_spark.queries_analytics import (
        approx_value_percentiles,
    )

    approx = {
        r["event_type"]: (r["p50"], r["p95"], r["p99"])
        for r in approx_value_percentiles(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    values = {}
    for r in ev.select("event_type", "value").collect():
        values.setdefault(r["event_type"], []).append(r["value"])
    for et, targets in approx.items():
        vs = sorted(values[et])
        n = len(vs)
        for q, a in zip((0.5, 0.95, 0.99), targets):
            rank_frac = sum(1 for v in vs if v <= a) / n
            # accuracy=10000 ⇒ rank error ≤ 1/10000, plus 1/n discreteness
            assert abs(rank_frac - q) <= 1 / 10_000 + 1.5 / n, (
                et, q, a, rank_frac, n,
            )
