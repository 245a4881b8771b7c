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
# operator-distinct head queries (50/50 green); round 3 recorded the next 50
# (48 sane; 2 array-output queries crashed the driver canonicalizer — fixed
# this round by stringifying collections at the output boundary, see
# registry.assert_driver_safe_schema). Round 4's head = the 21 oracle-backed
# queries with no driver row from any prior round (late-r3 additions) + the
# 2 re-registered array fixes + 3 rows-only queries never driver-run + 26
# per-operator-family representatives that are only r2-green, so no family's
# most recent hard row goes stale. With this rotation the union
# r2 ∪ r3 ∪ r4 covers every oracle-backed query at least once; every query,
# head and tail, is also verified locally by tools/verify_correctness.py at
# sf0.01 AND sf0.1 each round.
_HEAD = [
    # the two round-3 driver-red rows, re-registered with stringified
    # (scalar-only) outputs — must come first to confirm the fix
    "label_centroid_embeddings",    # centroid as int-1e-7 micro-unit string
    "user_event_type_sets",         # comma-joined sorted set string
    # late-r3 market microstructure family — never driver-recorded
    "twap_user_daily",
    "max_drawdown_user",
    "bollinger_breakouts",
    "rsi_event_types",
    "event_type_correlations",
    "vwap_monthly_lineitem",
    "ohlc_resample_events",
    "ewma_event_rate",
    # late-r3 analytics / asof / behavior — never driver-recorded
    "exact_percentiles_order_price",
    "asof_next_purchase_within_hour",
    "event_funnel_stages",
    "weekly_cohort_retention",
    "dedup_keep_best_quality",
    "paged_feed_rollup",
    "source_reliability",
    "stream_quality_ledger",
    "table_version_changes",
    "lang_confusion_matrix",
    "value_histogram",
    # rows-only queries with no driver row from any round (weak check,
    # but proves they run under the driver environment)
    "incremental_dedup_admission",
    "knn_lsh_bucketed",
    "approx_value_percentiles",
    # per-operator-family representatives, currently r2-green only
    "gold_daily_topk_stats",        # W2 rank-topK + P4 filters
    "dedup_keep_latest_events",     # W1 keep-latest window
    "events_typed_enrichment",      # P1-P3 projections/enrichment
    "pricing_summary",              # A1 grouped agg (TPC-H Q1)
    "cross_join_dense_grid",        # J1 cross join
    "top10_orders_by_price",        # O2 global top-K
    "union_high_low_value_events",  # set ops: union
    "set_ops_user_cohorts",         # set ops: intersect/except
    "rollup_order_status",          # ROLLUP grouping analytics
    "text_stats",                   # text feature family
    "tfidf_top_terms",              # TF-IDF
    "exact_dedup_documents",        # exact dedup
    "minhash_lsh_near_dup",         # MinHash + banded LSH
    "simhash_documents",            # SimHash
    "dedup_clusters",               # near-dup connected components
    "ngram_jaccard_blocked",        # exact n-gram Jaccard twin
    "knn_bruteforce_cosine",        # brute-force kNN baseline
    "embedding_near_dup",           # sign-LSH embedding near-dup
    "stream_tumbling_hourly",       # streaming windowed agg
    "stream_session_windows",       # streaming session windows
    "stream_click_attribution",     # stream-stream interval join
    "asof_last_purchase_per_click", # as-of join
    "range_join_events_to_windows", # range join
    "multimodal_byte_features",     # binary-column feature family
    "benchmark_contamination",      # curation screen
    "user_event_run_features",      # applyInPandas grouped-map path
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
