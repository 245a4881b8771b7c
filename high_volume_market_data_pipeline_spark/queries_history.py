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
    """v0 full write → v1 MERGE-style write → v2 delta-file APPEND →
    v3 COMPACT (folds the append chain to one snapshot) → v4 restore(0);
    returns (version, operation, n_rows) newest-first — the
    ``DeltaTable.history()`` read path over the parquet-native log, now
    covering the add-files append shape end-to-end."""
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
    table.append(
        orders.filter(F.col("o_orderstatus") == "F"), "APPEND"
    )
    table.compact(spark)
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


@query(
    "table_version_changes",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders WHERE o_orderkey % 100 = 0
    ),
    v0 AS (SELECT * FROM base WHERE o_orderkey % 7 <> 0),
    v1 AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
                  ELSE o_totalprice END AS o_totalprice
      FROM base WHERE o_orderkey % 11 <> 0
    )
    SELECT o_orderkey, o_custkey, o_totalprice, _change_type FROM (
      SELECT v0.o_orderkey, v0.o_custkey, v0.o_totalprice,
             'delete' AS _change_type
      FROM v0 LEFT JOIN v1 USING (o_orderkey) WHERE v1.o_orderkey IS NULL
      UNION ALL
      SELECT v1.o_orderkey, v1.o_custkey, v1.o_totalprice, 'insert'
      FROM v1 LEFT JOIN v0 USING (o_orderkey) WHERE v0.o_orderkey IS NULL
      UNION ALL
      SELECT v0.o_orderkey, v0.o_custkey, v0.o_totalprice,
             'update_preimage'
      FROM v0 JOIN v1 USING (o_orderkey)
      WHERE v0.o_totalprice <> v1.o_totalprice
         OR v0.o_custkey <> v1.o_custkey
      UNION ALL
      SELECT v1.o_orderkey, v1.o_custkey, v1.o_totalprice,
             'update_postimage'
      FROM v0 JOIN v1 USING (o_orderkey)
      WHERE v0.o_totalprice <> v1.o_totalprice
         OR v0.o_custkey <> v1.o_custkey
    )
    ORDER BY o_orderkey, _change_type
    """,
)
def table_version_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed readout between two committed versions — the
    row-level diff Delta's ``table_changes()`` serves, reconstructed from
    snapshots by ``VersionedParquetTable.changes`` (keyed full-outer diff;
    see sinks/history.py for the scale argument).

    Unlike table_history_ops (wall-clock metadata ⇒ rows-only), the CHANGE
    SET is pure SQL state: v0/v1 derive deterministically from orders
    (drop keys %7=0, re-add them in v1, delete keys %11=0, bump price
    +1.0 — IEEE-exact — on keys %5=0), so the oracle recomputes the same
    diff relationally and the driver hash pins insert/delete/update
    classification AND pre/post images end-to-end through the versioned
    write→commit→read→diff machinery."""
    root = os.path.join(tempfile.gettempdir(), "hvmdp_cdf_demo")
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root)

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    table.write(base.filter(F.col("o_orderkey") % 7 != 0), "WRITE")
    v1 = base.filter(F.col("o_orderkey") % 11 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    table.write(v1, "MERGE", {"keys": "o_orderkey"})

    return table.changes(spark, 0, 1, key_cols=["o_orderkey"]).orderBy(
        "o_orderkey", "_change_type"
    )


@query(
    "table_changes_incremental",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           o_totalprice,
           (o_orderkey // 100) % 4 AS bucket,
           'insert' AS _change_type
    FROM orders
    WHERE o_orderkey % 100 = 0
      AND o_orderkey % 3 = 1
      AND (o_orderkey // 100) % 4 = 2
    ORDER BY o_orderkey
    """,
)
def table_changes_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDF down an APPEND lineage — the metadata-pruned fast path of
    ``VersionedParquetTable.changes``: the child version shares the
    parent's data dirs, so the diff scans only the delta dir with a
    pushed PartitionFilter for the touched partition (pytest pins the
    plan; this query pins the VALUES through the driver hash). v0 is a
    deterministic orders slice partitioned by ``bucket``; the appended
    delta is a disjoint-key slice confined to bucket 2, so the change
    set is exactly those rows as inserts — pure SQL state the oracle
    recomputes relationally."""
    root = os.path.join(tempfile.gettempdir(), "hvmdp_cdf_incr_demo")
    shutil.rmtree(root, ignore_errors=True)
    table = VersionedParquetTable(root)

    base = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            (F.expr("o_orderkey div 100") % 4).alias("bucket"),
        )
    )
    table.write(
        base.filter(F.col("o_orderkey") % 3 == 0), "WRITE",
        partition_by="bucket",
    )
    table.append(
        base.filter(
            (F.col("o_orderkey") % 3 == 1) & (F.col("bucket") == 2)
        ),
        "APPEND",
        partition_by="bucket",
    )
    return table.changes(spark, 0, 1, key_cols=["o_orderkey"]).orderBy(
        "o_orderkey"
    )
