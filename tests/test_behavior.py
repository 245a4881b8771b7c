"""Funnel ordering semantics + cohort retention grid."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq

from high_volume_market_data_pipeline_spark.queries_behavior import (
    event_funnel_stages,
    weekly_cohort_retention,
)


def _write_events(tmp_path, rows):
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))


def test_funnel_requires_step_order(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # u1: full ordered funnel
        (1, at(0), 1, "view", 0.0, "{}"),
        (2, at(1), 1, "click", 0.0, "{}"),
        (3, at(2), 1, "purchase", 0.0, "{}"),
        # u2: purchase BEFORE click -> stage 3 must NOT count
        (4, at(0), 2, "view", 0.0, "{}"),
        (5, at(2), 2, "click", 0.0, "{}"),
        (6, at(1), 2, "purchase", 0.0, "{}"),
        # u3: click before any view -> stages 2,3 must NOT count
        (7, at(0), 3, "click", 0.0, "{}"),
        (8, at(1), 3, "view", 0.0, "{}"),
        # u4: no view at all
        (9, at(0), 4, "purchase", 0.0, "{}"),
    ]
    _write_events(tmp_path, rows)
    out = {r["stage"]: r["n_users"] for r in event_funnel_stages(spark, str(tmp_path)).collect()}
    assert out == {
        "1_view": 3,                 # u1, u2, u3
        "2_view_click": 2,           # u1, u2 (u3's click precedes its view)
        "3_view_click_purchase": 1,  # u1 only
    }


def test_funnel_tie_is_inclusive(spark, tmp_path):
    """view and click at the same timestamp count as ordered iff the view's
    (ts, event_id) sorts first."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0, 1, "click", 0.0, "{}"),   # same ts, later event_id: ordered
        (4, t0, 2, "click", 0.0, "{}"),   # same ts, EARLIER event_id than view
        (5, t0, 2, "view", 0.0, "{}"),
    ]
    _write_events(tmp_path, rows)
    out = {r["stage"]: r["n_users"] for r in event_funnel_stages(spark, str(tmp_path)).collect()}
    assert out["2_view_click"] == 1


def test_funnel_single_shuffle_plan(spark, tmp_path):
    _write_events(tmp_path, [(1, dt.datetime(2024, 1, 1), 1, "view", 0.0, "{}")])
    plan = (
        event_funnel_stages(spark, str(tmp_path))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both windows + the per-user rollup share the user_id partitioning;
    # the stage totals collapse to a single-row agg after.
    assert plan.count("Exchange hashpartitioning") == 1


def test_cohort_retention_offsets(spark, tmp_path):
    week = 604800
    base = dt.datetime(1970, 1, 1)

    def wk(n):
        return base + dt.timedelta(seconds=n * week + 10)

    rows = [
        (1, wk(0), 1, "view", 0.0, "{}"),
        (2, wk(1), 1, "view", 0.0, "{}"),   # returns week 1
        (3, wk(0), 2, "view", 0.0, "{}"),   # never returns
        (4, wk(1), 3, "view", 0.0, "{}"),   # later cohort
        (5, wk(3), 3, "view", 0.0, "{}"),
        (6, wk(3), 3, "click", 0.0, "{}"),  # same week twice: one row
    ]
    _write_events(tmp_path, rows)
    out = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in weekly_cohort_retention(spark, str(tmp_path)).collect()
    }
    assert out == {
        (0, 0): 2,
        (0, 1): 1,
        (1, 0): 1,
        (1, 2): 1,
    }
