"""Curation pipeline: funnel monotonicity, determinism, and semantics.

The pipeline composes already-oracle-verified components (text profile,
exact dedup, LSH pairs, connected components); these tests pin the
ASSEMBLY: stage order, keep-one-per-cluster semantics, and that the
curated set is a pure function of the input.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from high_volume_market_data_pipeline_spark.catalog import load_table
from high_volume_market_data_pipeline_spark.plans.curation import (
    curate_documents,
    profile_documents,
    quality_gate,
)
from tests.conftest import SF_DIR


def test_funnel_is_monotone_and_deterministic(spark):
    docs = load_table(spark, SF_DIR, "documents")
    curated, report = curate_documents(docs)
    assert report.n_input >= report.n_quality >= report.n_exact >= report.n_near
    assert report.n_near > 0
    assert report.stages == ["quality_gate", "exact_dedup", "near_dedup"]
    # Determinism: same input → identical surviving id set.
    curated2, report2 = curate_documents(docs)
    ids1 = {r[0] for r in curated.select("doc_id").collect()}
    ids2 = {r[0] for r in curated2.select("doc_id").collect()}
    assert ids1 == ids2
    assert report2.n_near == report.n_near


def test_exact_duplicates_collapse_to_min_id(spark):
    rows = [(1, "the same exact text here"), (2, "the same exact text here"),
            (7, "another unique document text")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curated, report = curate_documents(docs, min_tokens=1, min_quality=0.0)
    ids = sorted(r[0] for r in curated.select("doc_id").collect())
    assert ids == [1, 7]
    assert report.n_exact == 2


def test_profile_columns_ride_in_scan_stage(spark):
    docs = load_table(spark, SF_DIR, "documents")
    profiled = profile_documents(docs)
    plan = profiled._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0  # pure column exprs, no shuffle
    gated = quality_gate(profiled, min_tokens=5)
    assert gated.count() <= docs.count()


def test_context_window_chunks_overlap_and_tail(spark):
    """Windows advance by the stride (overlap = W - S) and the last chunk
    clamps at the document end instead of padding or dropping."""
    import os
    import tempfile

    from high_volume_market_data_pipeline_spark.queries_curation import (
        context_window_chunks,
    )

    text = " ".join(f"w{i}" for i in range(1, 41))  # 40 tokens
    docs = spark.createDataFrame(
        [(7, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as tmp:
        docs.write.parquet(os.path.join(tmp, "documents.parquet"))
        rows = context_window_chunks(spark, tmp).collect()
    # starts at 1 and 25 (stride 24); 40 tokens => second window is 16 long
    assert [(r["chunk_id"], r["start"], r["chunk_tokens"]) for r in rows] == [
        (0, 1, 32),
        (1, 25, 16),
    ]
    first, second = rows[0]["chunk_text"].split(), rows[1]["chunk_text"].split()
    assert first == [f"w{i}" for i in range(1, 33)]
    assert second == [f"w{i}" for i in range(25, 41)]
    # 8-token overlap between consecutive windows
    assert first[-8:] == second[:8]
