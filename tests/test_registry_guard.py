"""Driver-contract output-schema guard.

Round-3 lesson (CORRECTNESS_r03.json): the driver's correctness
canonicalizer pandas-sorts the raw result frame and crashes with
``TypeError: unhashable type: 'list'`` on array cells — so oracle-backed
(driver-hashed) queries must never emit array/map/struct columns. The
guard is ``registry.assert_driver_safe_schema``; this module pins that it
rejects complex-typed outputs and that every registered oracle-backed
query passes it at sf0.001.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.registry import (
    ORACLE_SQL,
    QUERIES,
    assert_driver_safe_schema,
)

SF_DIR = "/root/testdata/sf0.001"


def test_guard_rejects_array_typed_output(spark):
    df = spark.range(3).select(
        F.col("id"), F.array(F.col("id"), F.col("id") + 1).alias("arr")
    )
    with pytest.raises(TypeError, match="complex-typed"):
        assert_driver_safe_schema(df, "fixture")


def test_guard_rejects_map_and_struct(spark):
    m = spark.range(1).select(
        F.create_map(F.lit("k"), F.col("id")).alias("m")
    )
    s = spark.range(1).select(F.struct("id").alias("s"))
    with pytest.raises(TypeError):
        assert_driver_safe_schema(m, "fixture_map")
    with pytest.raises(TypeError):
        assert_driver_safe_schema(s, "fixture_struct")


def test_guard_accepts_scalar_output(spark):
    df = spark.range(1).select("id", F.lit("x").alias("s"))
    assert_driver_safe_schema(df, "fixture_ok")


@pytest.mark.parametrize(
    "name", sorted(set(QUERIES) & set(ORACLE_SQL))
)
def test_oracle_backed_queries_have_driver_safe_schemas(spark, name):
    """Every driver-hashed query's output schema is scalar-only. Building
    the DataFrame is plan analysis for batch queries; streaming queries run
    their tiny sf0.001 micro-batch, which keeps this sweep cheap while
    exercising the real registered surface."""
    df = QUERIES[name](spark, SF_DIR)
    assert_driver_safe_schema(df, name)
