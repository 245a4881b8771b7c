"""Named, oracle-verified queries — the driver contract surface.

Each entry here pairs a Spark implementation (built from the operator
library) with an ANSI-SQL oracle that DuckDB runs on the same parquet
tables. Registry pattern: ``@query(name, oracle=...)`` adds to QUERIES /
ORACLE_SQL which ``__spark_entry__`` re-exports.

Determinism rules (so the driver's order-insensitive value-hash matches):
- alias every computed column identically in Spark and SQL;
- round double aggregates (sum/avg over floats) to pin last-ulp
  summation-order differences;
- rank() ties follow identical double comparisons in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.catalog import load_table
from high_volume_market_data_pipeline_spark.operators import (
    anti_join,
    broadcast_join,
    cross_join,
    dedup_keep_latest,
    distinct_values,
    equi_join,
    except_distinct,
    intersect_distinct,
    global_sort,
    grouped_agg,
    rank_top_k_per_group,
    semi_join,
    top_k_global,
    union_all,
)
from high_volume_market_data_pipeline_spark.operators.aggregates import rollup_agg
from high_volume_market_data_pipeline_spark.operators.projection import (
    project_cast,
    safe_cast,
)

from high_volume_market_data_pipeline_spark.registry import (
    ORACLE_SQL,
    QUERIES,
    _DEC,
    davg,
    dsum,
    query,
)


# ---------------------------------------------------------------------------
# Flagship: the reference's Gold question re-expressed on lineitem
# (W2 rank top-K per day + P4 filter + A1 sum/avg + O1 sort;
#  silver_to_gold_crypto_stats.py:52-85 → SURVEY §7.2 step 2)
# ---------------------------------------------------------------------------


@query(
    "gold_daily_topk_stats",
    oracle="""
    WITH ranked AS (
      SELECT CAST(l_shipdate AS DATE) AS ship_date,
             l_extendedprice * (1 - l_discount) AS revenue,
             l_extendedprice,
             RANK() OVER (
               PARTITION BY CAST(l_shipdate AS DATE)
               ORDER BY l_extendedprice * (1 - l_discount) DESC
             ) AS rnk
      FROM lineitem
    )
    SELECT ship_date,
           CAST(SUM(CAST(revenue AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice), 6) AS avg_price,
           COUNT(*) AS n_items
    FROM ranked
    WHERE rnk <= 10
    GROUP BY ship_date
    ORDER BY ship_date
    """,
)
def gold_daily_topk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per ship-day: rank line items by revenue, keep top-10 (rank() tie
    semantics, same as the reference's volume_rank), then sum/avg."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.to_date("l_shipdate").alias("ship_date"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        "l_extendedprice",
    )
    top = rank_top_k_per_group(li, ["ship_date"], [F.desc("revenue")], k=10)
    gold = grouped_agg(
        top,
        ["ship_date"],
        [
            dsum(F.col("revenue")).alias("total_revenue"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            F.count(F.lit(1)).alias("n_items"),
        ],
    )
    return global_sort(gold, "ship_date")


# ---------------------------------------------------------------------------
# W1 — dedup keep-latest (bronze_to_silver_crypto.py:76-83 analogue on events)
# ---------------------------------------------------------------------------


@query(
    "dedup_keep_latest_events",
    oracle="""
    WITH numbered AS (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type, ts
               ORDER BY event_id DESC
             ) AS rn
      FROM events
    )
    SELECT event_id, ts, user_id, event_type, value, props
    FROM numbered WHERE rn = 1
    """,
)
def dedup_keep_latest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-key dedup keeping the latest copy: (user_id, event_type, ts)
    key, max event_id wins — mirrors (id, last_updated) keep-latest
    _ingested_at with a deterministic tiebreaker (SURVEY §7.3)."""
    ev = load_table(spark, sf_dir, "events")
    return dedup_keep_latest(
        ev, ["user_id", "event_type", "ts"], [F.desc("event_id")]
    ).select("event_id", "ts", "user_id", "event_type", "value", "props")


# ---------------------------------------------------------------------------
# P1/P3 — typed projection + enrichment (cast chain, data-derived partition)
# ---------------------------------------------------------------------------


@query(
    "events_typed_enrichment",
    oracle="""
    SELECT event_id,
           CAST(ts AS DATE) AS partition_date,
           CAST(CAST(value AS DECIMAL(18, 8)) AS DOUBLE) AS value_dec,
           event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    """,
)
def events_typed_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 typed casts (decimal re-type as in the Silver projection,
    bronze_to_silver_crypto.py:62-71) + P3 data-derived partition date +
    JSON field extraction with safe cast."""
    ev = load_table(spark, sf_dir, "events")
    ev = project_cast(ev, {"value": "decimal(18,8)"})
    return ev.select(
        "event_id",
        F.to_date("ts").alias("partition_date"),
        F.col("value").cast("double").alias("value_dec"),
        "event_type",
        safe_cast(F.get_json_object("props", "$.k"), "bigint").alias("prop_k"),
    )


# ---------------------------------------------------------------------------
# A1 — grouped aggregation, TPC-H Q1 pricing-summary shape
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 generalized (TPC-H Q1 shape): partial+final hash agg — the shuffle
    carries one partial row per (flag,status,task), not 6M raw rows."""
    li = load_table(spark, sf_dir, "lineitem")
    out = grouped_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        [
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        ],
    )
    return global_sort(out, "l_returnflag", "l_linestatus")


# ---------------------------------------------------------------------------
# J-series — joins
# ---------------------------------------------------------------------------


@query(
    "cross_join_dense_grid",
    oracle="""
    SELECT n.n_name, r.r_name
    FROM nation n CROSS JOIN region r
    """,
)
def cross_join_dense_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J2: cartesian grid with the small side broadcast — the dense-series
    construction pattern (data_generator.py:271)."""
    nation = load_table(spark, sf_dir, "nation").select("n_name")
    region = load_table(spark, sf_dir, "region").select("r_name")
    return cross_join(nation, F.broadcast(region))


@query(
    "broadcast_dim_join",
    oracle="""
    SELECT r.r_name AS region_name,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
)
def broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 generalized: fact ⋈ broadcast(dim) ⋈ broadcast(dim) — zero fact
    shuffles for the joins; only the final small agg shuffles."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = broadcast_join(
        broadcast_join(
            customer, nation, customer.c_nationkey == nation.n_nationkey
        ),
        region,
        F.col("n_regionkey") == region.r_regionkey,
    )
    out = grouped_agg(
        joined.select(F.col("r_name").alias("region_name"), "c_acctbal"),
        ["region_name"],
        [
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("c_acctbal")).alias("total_acctbal"),
        ],
    )
    return global_sort(out, "region_name")


@query(
    "customer_order_revenue",
    oracle="""
    SELECT c.c_custkey,
           c.c_name,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c.c_custkey
    """,
)
def customer_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized J3: large-large equi-join chain. orders⋈lineitem shuffle
    on orderkey, then agg; customer side broadcasts when small (AQE decides
    at runtime on a cluster)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    joined = equi_join(
        equi_join(li, orders, li.l_orderkey == orders.o_orderkey),
        customer,
        F.col("o_custkey") == customer.c_custkey,
    )
    out = grouped_agg(
        joined,
        ["c_custkey", "c_name"],
        [
            F.countDistinct("o_orderkey").alias("n_orders"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
        ],
    )
    return global_sort(out, "c_custkey")


@query(
    "customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): right columns never shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return global_sort(
        semi_join(customer, orders, "c_custkey").select("c_custkey", "c_name"),
        "c_custkey",
    )


@query(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return global_sort(
        anti_join(customer, orders, "c_custkey").select("c_custkey", "c_name"),
        "c_custkey",
    )


# ---------------------------------------------------------------------------
# A2 / O-series — distinct, sorts, top-K, union
# ---------------------------------------------------------------------------


@query(
    "distinct_order_priorities",
    oracle="SELECT DISTINCT o_orderpriority FROM orders ORDER BY o_orderpriority",
)
def distinct_order_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: distinct projection (main_pipeline.py:278-281 analogue)."""
    orders = load_table(spark, sf_dir, "orders")
    return global_sort(distinct_values(orders, "o_orderpriority"), "o_orderpriority")


@query(
    "top1_order_by_price",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
    """,
)
def top1_order_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: global top-1 (fast_pipeline.py:43) with deterministic tiebreak;
    plans as TakeOrderedAndProject, not a full sort."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return top_k_global(orders, 1, F.desc("o_totalprice"), "o_orderkey")


@query(
    "top10_orders_by_price",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def top10_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return top_k_global(orders, 10, F.desc("o_totalprice"), "o_orderkey")


@query(
    "union_high_low_value_events",
    oracle="""
    SELECT event_id, event_type, 'high' AS bucket FROM events WHERE value > 900
    UNION ALL
    SELECT event_id, event_type, 'low' AS bucket FROM events WHERE value < 100
    ORDER BY event_id
    """,
)
def union_high_low_value_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by name — multi-batch concatenation done engine-side
    (vs. the reference's driver-side list.extend, extract_crypto_data.py:100)."""
    ev = load_table(spark, sf_dir, "events")
    high = ev.filter(F.col("value") > 900).select(
        "event_id", "event_type", F.lit("high").alias("bucket")
    )
    low = ev.filter(F.col("value") < 100).select(
        "event_id", "event_type", F.lit("low").alias("bucket")
    )
    return global_sort(union_all(high, low), "event_id")


@query(
    "set_ops_user_cohorts",
    oracle="""
    WITH clickers AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    ), purchasers AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    )
    SELECT 'click_and_purchase' AS cohort, COUNT(*) AS n_users
    FROM (SELECT * FROM clickers INTERSECT SELECT * FROM purchasers)
    UNION ALL
    SELECT 'click_no_purchase' AS cohort, COUNT(*) AS n_users
    FROM (SELECT * FROM clickers EXCEPT SELECT * FROM purchasers)
    ORDER BY cohort
    """,
)
def set_ops_user_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT cohort sizing: users who both clicked and
    purchased vs. clicked but never purchased. Set ops plan as distinct
    aggregates feeding left-semi / left-anti hash joins on user_id — the
    whole cohort computation stays distributed (one shuffle per distinct +
    a keyed join), vs. collecting id sets to the driver. AQE broadcasts a
    side that turns out small."""
    ev = load_table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    purchasers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    both = intersect_distinct(clickers, purchasers).agg(
        F.count(F.lit(1)).alias("n_users")
    ).select(F.lit("click_and_purchase").alias("cohort"), "n_users")
    only = except_distinct(clickers, purchasers).agg(
        F.count(F.lit(1)).alias("n_users")
    ).select(F.lit("click_no_purchase").alias("cohort"), "n_users")
    return union_all(both, only).orderBy("cohort")


# ---------------------------------------------------------------------------
# Window analytics beyond the reference (extension surface)
# ---------------------------------------------------------------------------


@query(
    "running_user_value",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value,
           LAG(event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           ) AS prev_event_type
    FROM events
    """,
)
def running_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window (rowsBetween) + lag — analytic surface the
    reference never uses (SURVEY §2.6 note); one shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast(_DEC)).over(frame).cast("double").alias("running_value"),
        F.lag("event_type").over(w).alias("prev_event_type"),
    )


@query(
    "rollup_order_status",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals — multi-granularity in one shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    out = rollup_agg(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        [
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        ],
    )
    return out.orderBy(
        F.col("o_orderstatus").asc_nulls_first(),
        F.col("o_orderpriority").asc_nulls_first(),
    )


# Extension query modules self-register on import (registry pattern).
from high_volume_market_data_pipeline_spark import queries_text  # noqa: E402,F401
from high_volume_market_data_pipeline_spark import queries_dedup  # noqa: E402,F401
from high_volume_market_data_pipeline_spark import queries_similarity  # noqa: E402,F401
from high_volume_market_data_pipeline_spark import queries_streaming  # noqa: E402,F401
from high_volume_market_data_pipeline_spark import queries_asof  # noqa: E402,F401
from high_volume_market_data_pipeline_spark import queries_multimodal  # noqa: E402,F401
from high_volume_market_data_pipeline_spark import queries_analytics  # noqa: E402,F401
from high_volume_market_data_pipeline_spark import queries_sql  # noqa: E402,F401
from high_volume_market_data_pipeline_spark import queries_history  # noqa: E402,F401
from high_volume_market_data_pipeline_spark import queries_curation  # noqa: E402,F401
from high_volume_market_data_pipeline_spark import queries_timeseries  # noqa: E402,F401
from high_volume_market_data_pipeline_spark import queries_quality  # noqa: E402,F401
from high_volume_market_data_pipeline_spark import queries_behavior  # noqa: E402,F401
from high_volume_market_data_pipeline_spark import queries_market  # noqa: E402,F401
from high_volume_market_data_pipeline_spark import queries_sources  # noqa: E402,F401
