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


def test_hash_rate_sample_is_stable_and_map_side(spark):
    """Membership is a pure function of the key — independent of row order,
    partitioning, and the rest of the table — and the plan has no shuffle."""
    from high_volume_market_data_pipeline_spark.operators import (
        hash_rate_sample,
    )

    docs = load_table(spark, SF_DIR, "documents")
    rates = {"en": 25, "de": 60, "es": 70, "fr": 70, "zh": 90}
    kept = hash_rate_sample(docs, "doc_id", rates, stratum="lang")
    ids = {r[0] for r in kept.select("doc_id").collect()}
    # Repartitioned + subsetted input keeps exactly the same members.
    shuffled = docs.filter(F.col("doc_id") % 3 == 0).repartition(7)
    ids_sub = {
        r[0]
        for r in hash_rate_sample(shuffled, "doc_id", rates, stratum="lang")
        .select("doc_id")
        .collect()
    }
    assert ids_sub == {i for i in ids if i % 3 == 0}
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # filter rides the scan


def test_group_cap_sample_enforces_cap(spark):
    from high_volume_market_data_pipeline_spark.operators import (
        group_cap_sample,
    )

    docs = load_table(spark, SF_DIR, "documents")
    capped = group_cap_sample(docs, ["lang"], "doc_id", 7)
    per_lang = capped.groupBy("lang").count().collect()
    assert all(r["count"] <= 7 for r in per_lang)
    # Groups with >= 7 docs fill the cap exactly.
    big = {
        r["lang"]
        for r in docs.groupBy("lang").count().filter("count >= 7").collect()
    }
    assert {r["lang"] for r in per_lang if r["count"] == 7} == big


def test_hash_split_fractions_and_validation(spark):
    import pytest

    from high_volume_market_data_pipeline_spark.operators import hash_split

    docs = load_table(spark, SF_DIR, "documents")
    labelled = hash_split(docs, "doc_id", {"train": 90, "val": 5, "test": 5})
    counts = dict(
        (r["split"], r["count"])
        for r in labelled.groupBy("split").count().collect()
    )
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    assert counts["train"] > counts["val"] + counts["test"]
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"train": 50, "val": 10})


def test_set_ops_match_python_sets(spark):
    from high_volume_market_data_pipeline_spark.operators import (
        except_distinct,
        intersect_distinct,
    )

    a = spark.createDataFrame([(i,) for i in [1, 2, 2, 3, 5]], "v long")
    b = spark.createDataFrame([(i,) for i in [2, 3, 4]], "v long")
    assert {r[0] for r in intersect_distinct(a, b).collect()} == {2, 3}
    assert {r[0] for r in except_distinct(a, b).collect()} == {1, 5}


def test_curation_with_embedding_stage(spark):
    """Semantic near-dup edges union with the MinHash edges into one
    clustering pass: the joint funnel never keeps more docs than the
    text-only funnel, the stage is recorded, and the result is
    deterministic."""
    from high_volume_market_data_pipeline_spark.plans.curation import (
        curate_documents,
    )

    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    text_only, rep0 = curate_documents(docs)
    joint, rep1 = curate_documents(
        docs, embeddings=emb, cosine_threshold=0.3, lsh_planes=2
    )
    assert rep1.stages == [
        "quality_gate", "exact_dedup", "embedding_pairs", "near_dedup",
    ]
    assert rep1.n_near <= rep0.n_near
    assert rep1.n_near < rep1.n_exact  # threshold 0.3 really drops docs
    joint2, rep2 = curate_documents(
        docs, embeddings=emb, cosine_threshold=0.3, lsh_planes=2
    )
    ids1 = {r[0] for r in joint.select("doc_id").collect()}
    ids2 = {r[0] for r in joint2.select("doc_id").collect()}
    assert ids1 == ids2 and rep2.n_near == rep1.n_near
