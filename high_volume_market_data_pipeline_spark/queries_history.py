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


@query(
    "table_history_ops",
    oracle="""
    WITH slice AS (
      SELECT * FROM orders WHERE o_orderkey % 100 = 0
    ), c AS (
      SELECT count(*) AS all_n,
             count(*) FILTER (WHERE o_orderstatus = 'O') AS o_n,
             count(*) FILTER (WHERE o_orderstatus = 'F') AS f_n
      FROM slice
    )
    SELECT version, operation, n_rows FROM (
      SELECT CAST(4 AS BIGINT) AS version, 'RESTORE' AS operation,
             all_n AS n_rows FROM c
      UNION ALL SELECT 3, 'COMPACT', o_n + f_n FROM c
      UNION ALL SELECT 2, 'APPEND', o_n + f_n FROM c
      UNION ALL SELECT 1, 'MERGE', o_n FROM c
      UNION ALL SELECT 0, 'WRITE', all_n FROM c
    ) ORDER BY version DESC
    """,
)
def table_history_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """v0 full write → v1 MERGE-style write → v2 delta-file APPEND →
    v3 COMPACT (folds the append chain to one snapshot) → v4 restore(0);
    returns (version, operation, n_rows) newest-first — the
    ``DeltaTable.history()`` read path over the parquet-native log, now
    covering the add-files append shape end-to-end. FULL-ORACLE since
    r10: every output column is a pure function of the orders slice and
    the fixed commit script (versions and operations literal, per-version
    counts relational), so the driver hash pins write → commit log →
    time-travel reads → history() end-to-end — the wall-clock timestamp
    column history() also carries is deliberately NOT selected."""
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


def _curation_funnel_oracle() -> str:
    """The funnel's four stage counts, recomputed relationally in DuckDB
    by composing the SAME verified oracle fragments its components use:
    the quality-gate formula from text_stats/doc_quality_and_lang, the
    md5 content fingerprint from exact_dedup_documents, and the minhash
    signature/banding/recursive-components chain from minhash_lsh_near_dup
    and dedup_clusters — run over the gated, exact-deduped survivor set
    instead of raw documents. Every constant (stopword list, 64-token
    length knee, round-6, threshold 0.5, band cap 1000) mirrors the
    Spark defaults; the minhash fragments are generated from the same
    module constants, so a knob drift breaks both sides together."""
    from high_volume_market_data_pipeline_spark.queries_dedup import (
        _BANDS_SQL,
        _SIG_SQL,
        shingles_cte,
    )

    stop = "['the', 'a', 'of', 'and', 'to', 'in', 'is', 'it']"
    quality = (
        "ROUND(0.5 * (len(list_filter(toks, t -> list_contains("
        + stop
        + ", t))) / CAST(len(toks) AS DOUBLE))"
        " + 0.4 * least(len(toks) / 64.0, 1.0)"
        " + 0.1 * (1.0 - (length(text) - length(regexp_replace(text,"
        " '[.,!?;:]', '', 'g'))) / CAST(length(text) AS DOUBLE)), 6)"
    )
    return f"""
    WITH RECURSIVE
    slice AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
    ), prof AS (
      SELECT doc_id, text,
             regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM slice
    ), gated AS (
      SELECT doc_id, text FROM prof
      WHERE len(toks) >= 5 AND {quality} >= 0.2
    ), fp AS (
      SELECT doc_id, text,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
      FROM gated
    ), keepers AS (
      SELECT f, MIN(doc_id) AS kept FROM fp GROUP BY f
    ), exact AS (
      SELECT fp.doc_id, fp.text
      FROM fp JOIN keepers ON fp.f = keepers.f AND fp.doc_id = keepers.kept
    ),
    {shingles_cte("exact")},
    sig AS (
      SELECT doc_id, {_SIG_SQL} AS sig FROM sh
    ), banded AS (
      SELECT doc_id, sig, unnest({_BANDS_SQL}) AS band_key FROM sig
    ), counted AS (
      SELECT *, COUNT(*) OVER (PARTITION BY band_key) AS bn FROM banded
    ), kept_b AS (
      SELECT * FROM counted WHERE bn <= 1000
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM kept_b a JOIN kept_b b USING (band_key)
      WHERE a.doc_id < b.doc_id
    ), strong AS (
      SELECT p.id_a, p.id_b
      FROM cand p
      JOIN sig sa ON sa.doc_id = p.id_a
      JOIN sig sb ON sb.doc_id = p.id_b
      WHERE len(list_filter(range(1, 9), i -> sa.sig[i] = sb.sig[i])) / 8.0
            >= 0.5
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM strong
      UNION
      SELECT id_b AS src, id_a AS dst FROM strong
    ), reach(id, r) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, rr.r FROM edges e JOIN reach rr ON rr.id = e.dst
    ), comp AS (
      SELECT id, MIN(r) AS component FROM reach GROUP BY id
    ), counts AS (
      SELECT (SELECT count(*) FROM slice) AS n_input,
             (SELECT count(*) FROM gated) AS n_quality,
             (SELECT count(*) FROM exact) AS n_exact,
             (SELECT count(*) FROM exact)
               - (SELECT count(*) FROM comp WHERE id <> component) AS n_near
    )
    SELECT stage, n_docs FROM (
      SELECT '0_input' AS stage, n_input AS n_docs FROM counts
      UNION ALL SELECT '1_quality_gate', n_quality FROM counts
      UNION ALL SELECT '2_exact_dedup', n_exact FROM counts
      UNION ALL SELECT '3_near_dedup', n_near FROM counts
    ) ORDER BY stage
    """


@query("curation_funnel", oracle=_curation_funnel_oracle())
def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data curation (plans/curation.py): profile →
    quality gate → exact dedup → near-dup cluster keep-one, reported as
    the survival funnel. FULL-ORACLE since r10 (was rows-only): the four
    stage counts are recomputed relationally in DuckDB by composing the
    components' own verified oracle fragments — the hash now pins the
    ASSEMBLY (stage order, gate knobs, survivor wiring), not just each
    component in isolation; tests/test_curation.py still pins the
    corpus-level outputs."""
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
