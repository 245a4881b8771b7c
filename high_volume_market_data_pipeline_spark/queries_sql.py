"""SQL-string query path: `spark.sql(...)` over registered views.

The reference's only SQL-string usage is catalog DDL (SURVEY §3 note); a
general engine must also take whole queries as SQL. The query below is
written in the ANSI intersection of Spark SQL and DuckDB, so the SAME text
is both the Spark implementation and the oracle — the strongest possible
parity statement for the SQL surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from high_volume_market_data_pipeline_spark.catalog import register_views
from high_volume_market_data_pipeline_spark.registry import query

_PEAK_DAY_SQL = """
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                  AS DOUBLE) AS rev
      FROM lineitem
      GROUP BY d
    ), ranked AS (
      SELECT d, rev,
             ROW_NUMBER() OVER (
               PARTITION BY year(d) * 100 + month(d)
               ORDER BY rev DESC, d
             ) AS rn
      FROM daily
    )
    SELECT d AS peak_day, rev AS peak_revenue
    FROM ranked WHERE rn = 1
    ORDER BY peak_day
"""


@query("sql_peak_revenue_day", oracle=_PEAK_DAY_SQL)
def sql_peak_revenue_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best revenue day per month, expressed as ONE SQL string executed
    verbatim by both engines (spark.sql over registered views ≡ DuckDB)."""
    register_views(spark, sf_dir)
    return spark.sql(_PEAK_DAY_SQL)


_GROUPING_SETS_SQL = """
    SELECT o_orderstatus,
           o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_price,
           GROUPING(o_orderstatus) AS g_status,
           GROUPING(o_orderpriority) AS g_priority
    FROM orders
    GROUP BY GROUPING SETS (
      (o_orderstatus, o_orderpriority),
      (o_orderstatus),
      (o_orderpriority),
      ()
    )
    ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
"""


@query("sql_grouping_sets_orders", oracle=_GROUPING_SETS_SQL)
def sql_grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind rollup/cube —
    §2.5's grouping-analytics family): four arbitrary grouping combinations
    in ONE pass with GROUPING() disambiguating real nulls from subtotal
    rows. Spark expands the sets with a single Expand node over one
    shuffle — same cost shape as the rollup/cube operators; the SQL text
    runs verbatim on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)
