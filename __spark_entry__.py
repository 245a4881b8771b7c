"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001 (smoke).
``queries()`` / ``oracle_sql()`` — operator surface verified against the
DuckDB oracle at sf0.01 (see SURVEY.md §2 inventory; implementations live in
``high_volume_market_data_pipeline_spark``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from high_volume_market_data_pipeline_spark.queries import (  # noqa: E402
    ORACLE_SQL,
    QUERIES,
    gold_daily_topk_stats,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return gold_daily_topk_stats(spark, "/root/testdata/sf0.001")


# The driver's correctness run records only the FIRST 50 registered entries,
# so the 50-slot window rotates per round. Round 2 recorded the 50
# operator-distinct head queries; round 3 the next 50 (2 array-output
# crashes, fixed in r4 via registry.assert_driver_safe_schema); round 4 the
# late-r3 additions + 26 r2-green family representatives. Round 5's head =
# the 12 late-r4 tail queries with no driver row from ANY round (8
# oracle-backed + 4 rows-only — the NOTES.md promotion set) + the 2
# queries whose code CHANGED this round (ngram_jaccard_adaptive is new;
# embedding_near_dup switched to auto-planes, so its r4 row no longer
# covers it) + all 23 queries whose most recent green row is r2 + 13
# family-diverse backfills whose most recent green row is r3. With this
# rotation the union r2 ∪ r3 ∪ r4 ∪ r5 covers every oracle-backed query;
# every query, head and tail, is also verified locally by
# tools/verify_correctness.py at sf0.01 AND sf0.1 each round. Never demote
# a query whose only green row is the current window.
_HEAD = [
    # --- never driver-recorded (r5 promotion set, NOTES.md) ---
    "segment_mode_median",          # exact mode + median aggregates
    "winsorized_value_stats",       # winsorized robust stats
    "heavy_hitter_users",           # approx_top_k heavy hitters
    "heavy_hitter_daily_rollup",    # accumulate/combine daily rollup
    "session_chains_recursive",     # recursive-CTE session lineage
    "substring_dup_spans",          # exact substring-span dedup
    "quality_weighted_sample",      # deterministic weighted sampling
    "embedding_random_projection",  # JL projection, scalar outputs
    "hll_incremental_distinct",     # mergeable HLL sketch table (rows-only)
    "knn_pq_adc",                   # PQ ANN, ADC + re-rank (rows-only)
    "knn_ivf_pq",                   # IVF-PQ residual ANN (rows-only)
    "stream_distinct_sketch_state", # streaming HLL fold (rows-only)
    # --- new or behavior-changed this round ---
    "ngram_jaccard_adaptive",       # adaptive width + prefix block key
    "embedding_near_dup",           # now auto-planes over full corpus
    "stream_incremental_dedup_admission",  # streaming SignatureStore
    "knn_lsh_bucketed",             # now auto-planes (rows-only)
    # --- most recent green row is r2 (all 23) ---
    "cheapest_supplier_per_part",
    "context_window_chunks",
    "doc_quality_and_lang",
    "doc_repetition_stats",
    "dq_orders_expectations",
    "embedding_quantize_stats",
    "event_rate_anomalies",
    "gapfill_nation_daily_revenue",
    "order_counts_pivot",
    "order_value_percentiles",
    "orders_above_customer_avg",
    "part_metrics_unpivot",
    "parts_sales_coverage",
    "priority_count_q4",
    "returned_top_customers_q10",
    "revenue_by_nation_q5",
    "salted_event_value_agg",
    "shipping_priority_q3",
    "stratified_lang_sample",
    "stream_sliding_counts",
    "stream_static_nation_counts",
    "trailing_hour_user_stats",
    "user_peak_event",
    # --- family-diverse backfill, most recent green row is r3 ---
    "knn_ivf_cells",                # IVF ANN family
    "curation_funnel",              # composite curation plan
    "sessionize_events_batch",      # gaps-and-islands sessionization
    "stream_dedup_events",          # streaming dedup-in-watermark
    "table_history_ops",            # S8 history scan (rows-only)
    "hypertable_rollup",            # time-bucket rollup
    "market_share_q8",              # deep join tree
    "large_volume_customers_q18",   # big-side groupBy + semi join
    "doc_fingerprints",             # rolling-hash fingerprints
    "pii_redact_documents",         # regex redaction
    "hash_split_train_val",         # md5 split sampling
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Priority-ordered so the driver's 50-entry correctness window records
    the round-3 promotion set (_HEAD); the tail holds the queries already
    driver-green in CORRECTNESS_r02.json plus two approximate rows-only
    entries (knn_lsh_bucketed, approx_value_percentiles — both pinned by
    recall/percentile tests in pytest)."""
    head = {n: QUERIES[n] for n in _HEAD}
    tail = {n: f for n, f in QUERIES.items() if n not in head}
    return {**head, **tail}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL oracle per query (omitted ⇒ rows-only check)."""
    return dict(ORACLE_SQL)
