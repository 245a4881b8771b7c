"""As-of join semantics: direction, tie inclusivity, tolerance, no-join plan."""

from __future__ import annotations

from high_volume_market_data_pipeline_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("u", 10.0, "L1"), ("u", 25.0, "L2"), ("v", 10.0, "L3")],
        "k string, t double, tag string",
    )
    right = spark.createDataFrame(
        [("u", 10.0, 100.0), ("u", 20.0, 200.0), ("u", 40.0, 400.0)],
        "k string, rt double, val double",
    )
    return left, right


def test_asof_backward_inclusive_and_unmatched(spark):
    left, right = _frames(spark)
    out = {
        r["tag"]: (r["asof_rt"], r["asof_val"])
        for r in asof_join(
            left, right, key="k", left_ts="t", right_ts="rt",
            right_values=["val"],
        ).collect()
    }
    assert out["L1"] == (10.0, 100.0)   # exact tie matches (inclusive)
    assert out["L2"] == (20.0, 200.0)   # most recent at-or-before 25
    assert out["L3"] == (None, None)    # key v has no right rows


def test_asof_forward_picks_earliest_at_or_after(spark):
    left, right = _frames(spark)
    out = {
        r["tag"]: (r["asof_rt"], r["asof_val"])
        for r in asof_join(
            left, right, key="k", left_ts="t", right_ts="rt",
            right_values=["val"], direction="forward",
        ).collect()
    }
    assert out["L1"] == (10.0, 100.0)   # tie is inclusive forward too
    assert out["L2"] == (40.0, 400.0)   # next at-or-after 25
    assert out["L3"] == (None, None)


def test_asof_tolerance_nulls_stale_match_not_replaces(spark):
    left, right = _frames(spark)
    # Backward from t=25: nearest is rt=20 (delta 5). With tolerance 3 the
    # match must become NULL — not fall back to a farther row.
    out = {
        r["tag"]: (r["asof_rt"], r["asof_val"])
        for r in asof_join(
            left, right, key="k", left_ts="t", right_ts="rt",
            right_values=["val"], tolerance=3.0,
        ).collect()
    }
    assert out["L1"] == (10.0, 100.0)   # delta 0 within tolerance
    assert out["L2"] == (None, None)    # delta 5 > 3 -> dropped
    # boundary: tolerance exactly equal to delta keeps the match
    out2 = {
        r["tag"]: r["asof_rt"]
        for r in asof_join(
            left, right, key="k", left_ts="t", right_ts="rt",
            right_values=["val"], tolerance=5.0,
        ).collect()
    }
    assert out2["L2"] == 20.0


def test_asof_plan_has_no_join(spark):
    """The union+window form must not contain any join operator — one
    shuffle on the key is the whole cost."""
    left, right = _frames(spark)
    plan = (
        asof_join(
            left, right, key="k", left_ts="t", right_ts="rt",
            right_values=["val"], direction="forward", tolerance=1.0,
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_nearest_picks_closer_side_tie_backward(spark):
    left, right = _frames(spark)
    # L2 at t=25: backward rt=20 (d=5), forward rt=40 (d=15) -> backward.
    out = {
        r["tag"]: r["asof_rt"]
        for r in asof_join(
            left, right, key="k", left_ts="t", right_ts="rt",
            right_values=["val"], direction="nearest",
        ).collect()
    }
    assert out["L1"] == 10.0
    assert out["L2"] == 20.0
    assert out["L3"] is None
    # exact-tie case: candidates equidistant -> backward wins (pandas rule)
    l2 = spark.createDataFrame([("u", 30.0, "X")], "k string, t double, tag string")
    out2 = asof_join(
        l2, right, key="k", left_ts="t", right_ts="rt",
        right_values=["val"], direction="nearest",
    ).collect()[0]
    assert out2["asof_rt"] == 20.0  # 20 and 40 both d=10 -> backward
