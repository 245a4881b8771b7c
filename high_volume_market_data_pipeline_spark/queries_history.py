"""S8 — table history / time travel surface as a driver query.

Mirrors the reference's ``view_delta_history.py:44-72`` workflow: write a
table, upsert into it, restore an old version, then read the history log
newest-first. Timestamps are wall-clock, so the check is rows-only (no
DuckDB oracle — the operation log is engine metadata, not SQL state); the
version/operation/row-count columns ARE deterministic and pytest pins the
time-travel reads (tests/test_history.py).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.catalog import load_table
from high_volume_market_data_pipeline_spark.registry import query
from high_volume_market_data_pipeline_spark.sinks.history import (
    VersionedParquetTable,
)


@query("table_history_ops")
def table_history_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v0 full write → v1 partial overwrite-style write → v2 restore(0);
    returns (version, operation, n_rows) newest-first — the
    ``DeltaTable.history()`` read path over the parquet-native log."""
    root = os.path.join(tempfile.gettempdir(), "hvmdp_history_demo")
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root)

    # A thin slice is enough — the query exercises the log/commit/travel
    # machinery, not bulk write throughput (stress.py covers that).
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )
    table.write(orders, "WRITE", {"mode": "overwrite"})
    table.write(
        orders.filter(F.col("o_orderstatus") == "O"),
        "MERGE",
        {"keys": "o_orderkey"},
    )
    table.restore(spark, 0)

    hist = table.history(spark)
    counts = [
        (v, table.read(spark, version=v).count())
        for v in [r["version"] for r in hist.select("version").collect()]
    ]
    counts_df = spark.createDataFrame(counts, "version BIGINT, n_rows BIGINT")
    return (
        hist.join(counts_df, "version")
        .select("version", "operation", "n_rows")
        .orderBy(F.desc("version"))
    )


@query("curation_funnel")
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation (plans/curation.py): profile →
    quality gate → exact dedup → near-dup cluster keep-one, reported as
    the survival funnel. Rows-only gate: the assembly is pinned by
    tests/test_curation.py and every component by its own oracle query
    (text_stats, exact_dedup_documents, minhash_lsh_near_dup,
    dedup_clusters)."""
    from high_volume_market_data_pipeline_spark.plans.curation import (
        curate_documents,
    )

    # Deterministic id-stratified half: the funnel exercises every stage
    # at half the LSH/clustering cost; full-corpus dedup is already
    # benchmarked by dedup_clusters/minhash_lsh_near_dup.
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 2 == 0
    )
    _, report = curate_documents(docs)
    rows = [
        ("0_input", report.n_input),
        ("1_quality_gate", report.n_quality),
        ("2_exact_dedup", report.n_exact),
        ("3_near_dedup", report.n_near),
    ]
    return spark.createDataFrame(rows, "stage STRING, n_docs BIGINT")
