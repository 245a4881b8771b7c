"""Data-profiling / data-quality queries (operators/quality.py) — the
declarative, one-pass engine form of the reference's operational checks
(SURVEY §5: inspection scripts and defensive guards)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.catalog import load_table
from high_volume_market_data_pipeline_spark.operators.quality import (
    check_expectations,
    check_referential,
    column_stats,
)
from high_volume_market_data_pipeline_spark.registry import query

_PROFILE_COLS = ("o_custkey", "o_orderkey", "o_totalprice")


def _profile_col_sql(c: str) -> str:
    return f"""
    SELECT '{c}' AS col_name,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           COUNT(DISTINCT {c}) AS n_distinct,
           CAST(MIN({c}) AS DOUBLE) AS min_value,
           CAST(MAX({c}) AS DOUBLE) AS max_value,
           ROUND(CAST(SUM(CAST({c} AS DECIMAL(28,4))) AS DOUBLE)
                 / COUNT({c}), 6) AS mean_value
    FROM orders
    """


@query(
    "profile_orders_columns",
    oracle=" UNION ALL ".join(_profile_col_sql(c) for c in _PROFILE_COLS)
    + " ORDER BY col_name",
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style numeric profile of three orders columns in ONE
    aggregation pass (single scan + partial+final agg regardless of column
    count; the oracle's per-column UNION scans three times — the operator
    is strictly better). Mean goes through the exact-decimal sum
    (registry rule) so it is summation-order independent."""
    orders = load_table(spark, sf_dir, "orders")
    return column_stats(orders, list(_PROFILE_COLS)).orderBy("col_name")


@query(
    "dq_orders_expectations",
    oracle="""
    SELECT 'orderdate_not_null' AS rule, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_violations,
           SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) = 0
             AS passed
    FROM orders
    UNION ALL
    SELECT 'positive_price', COUNT(*),
           CAST(SUM(CASE WHEN NOT (o_totalprice > 0) OR o_totalprice IS NULL
               THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN NOT (o_totalprice > 0) OR o_totalprice IS NULL
               THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'price_under_400k', COUNT(*),
           CAST(SUM(CASE WHEN NOT (o_totalprice <= 400000)
                    OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN NOT (o_totalprice <= 400000)
                    OR o_totalprice IS NULL THEN 1 ELSE 0 END) = 0
    FROM orders
    UNION ALL
    SELECT 'known_status', COUNT(*),
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                    OR o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                    OR o_orderstatus IS NULL THEN 1 ELSE 0 END) = 0
    FROM orders
    ORDER BY rule
    """,
)
def dq_orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations in one pass: four named constraints become
    SUM(CASE) counters inside a single aggregate (one scan for any number
    of rules); NULL predicate results count as violations, so ANSI
    three-valued logic can't silently pass bad rows. price_under_400k is
    deliberately violated by the data — the report shows real counts, not
    a wall of zeros."""
    orders = load_table(spark, sf_dir, "orders")
    return check_expectations(
        orders,
        {
            "orderdate_not_null": F.col("o_orderdate").isNotNull(),
            "positive_price": F.col("o_totalprice") > 0,
            "price_under_400k": F.col("o_totalprice") <= 400000,
            "known_status": F.col("o_orderstatus").isin("O", "F", "P"),
        },
    ).orderBy("rule")


@query(
    "fk_orphan_lineitems",
    oracle="""
    SELECT COUNT(*) AS n_orphans,
           COUNT(DISTINCT l_orderkey) AS n_orphan_keys
    FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey
    )
    """,
)
def fk_orphan_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity gate: lineitem rows whose order key has no
    parent order (left-anti join; the distinct dim side broadcasts). The
    testdata is clean — the gate proves 0, which is exactly what a publish
    step asserts before promoting a table."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    orphans = check_referential(lineitem, "l_orderkey", orders, "o_orderkey")
    return orphans.agg(
        F.count(F.lit(1)).alias("n_orphans"),
        F.count_distinct("l_orderkey").alias("n_orphan_keys"),
    )
