"""Training-data curation pipeline — the LLM-data counterpart of the
medallion assembly (plans/medallion.py maps the reference's Bronze→Silver→
Gold; this maps raw documents → clean training corpus).

Stages, all built from the engine's verified components:

1. PROFILE   — token/char/quality/language columns (functions/text) —
               pure column expressions riding inside the scan stage;
2. FILTER    — quality + language + length gates (data-dependent knobs);
3. EXACT     — fingerprint dedup keeping the min id (dedup/exact);
4. NEAR      — MinHash→LSH candidate pairs → connected components →
               keep one doc per cluster (dedup/minhash + clustering);
5. EMIT      — curated corpus + a per-stage survival report.

Scale notes: the text bytes shuffle exactly ONCE (the LSH band explode);
every other stage is either scan-local (profile/filter), a key-only
aggregation (exact dedup groups fingerprints, not text), or graph-sized
(components over the pair set). Keep-decisions join back on ids — at
100 TB the heavy columns stay parked in parquet until the final
semi-join re-read.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.dedup.clustering import (
    connected_components,
)
from high_volume_market_data_pipeline_spark.dedup.exact import exact_dedup
from high_volume_market_data_pipeline_spark.dedup.minhash import (
    lsh_candidate_pairs,
)
from high_volume_market_data_pipeline_spark.functions.text import (
    bpe_ish_token_count,
    char_count,
    lang_id,
    quality_score,
    token_count,
)


@dataclass
class CurationReport:
    """Row counts after each stage (the curation funnel)."""

    n_input: int = 0
    n_quality: int = 0
    n_exact: int = 0
    n_near: int = 0
    stages: list[str] = field(default_factory=list)


def profile_documents(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Stage 1: append token/char/quality/language columns (JVM column
    exprs only — no shuffle, rides in the scan stage)."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_bpe_tokens": bpe_ish_token_count(t),
            "n_chars": char_count(t),
            "quality": quality_score(t),
            "lang": lang_id(t),
        }
    )


def quality_gate(
    df: DataFrame,
    min_tokens: int = 5,
    min_quality: float = 0.2,
    langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """Stage 2: drop short/junk documents (predicates push to the scan)."""
    out = df.filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("quality") >= min_quality)
    )
    if langs:
        out = out.filter(F.col("lang").isin(*langs))
    return out


def curate_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    min_quality: float = 0.2,
    langs: tuple[str, ...] | None = None,
    jaccard_threshold: float = 0.5,
    embeddings: DataFrame | None = None,
    embedding_id_col: str = "vec_id",
    embedding_col: str = "embedding",
    cosine_threshold: float = 0.9,
    lsh_planes: int = 4,
    embedding_dim: int | None = None,
) -> tuple[DataFrame, CurationReport]:
    """Full curation: returns (curated profiled corpus, funnel report).

    Deterministic end to end: exact dedup keeps min id per fingerprint;
    near-dup clustering keeps the min id per connected component — so the
    surviving set is a pure function of the input, never of partitioning.

    With ``embeddings`` (one vector per doc id), semantic near-dups join
    the candidate edge set: vectors of surviving docs get a sign-LSH
    bucket, per-bucket cosine pairs ≥ ``cosine_threshold`` union with the
    MinHash pairs, and ONE connected-components pass clusters both edge
    kinds — a paraphrased copy and a token-level copy collapse into the
    same component. The embedding side never goes all-pairs: the bucket
    join keeps it per-block quadratic, same discipline as the text LSH.
    """
    from high_volume_market_data_pipeline_spark.operators.quality import (
        observed,
    )

    report = CurationReport()
    # The input count piggybacks on the quality gate's materialization via
    # df.observe (CollectMetrics sits upstream of the filter, so the SAME
    # job that builds the gated cache also counts the raw input) — the
    # standalone docs.count() this replaces was a full extra scan of the
    # corpus, a second 100-TB pass bought purely for a report line.
    docs_obs, input_obs = observed(
        docs, "curation_input", {"n": F.count(F.lit(1))}
    )

    profiled = profile_documents(docs_obs, text_col)
    gated = quality_gate(profiled, min_tokens, min_quality, langs).persist()
    report.n_quality = gated.count()
    report.n_input = input_obs.get["n"]
    report.stages.append("quality_gate")

    kept_exact = exact_dedup(gated, text_col, id_col).select(
        F.col("kept_id").alias(id_col)
    )
    exact_survivors = gated.join(kept_exact, id_col, "leftsemi").persist()
    report.n_exact = exact_survivors.count()
    report.stages.append("exact_dedup")
    gated.unpersist()

    pairs = lsh_candidate_pairs(exact_survivors, text_col, id_col).filter(
        F.col("est_jaccard") >= jaccard_threshold
    ).select("id_a", "id_b")
    if embeddings is not None:
        from high_volume_market_data_pipeline_spark.dedup.embedding import (
            embedding_near_dup_pairs,
        )
        from high_volume_market_data_pipeline_spark.similarity.knn import (
            random_hyperplane_buckets,
        )

        surviving_vecs = embeddings.join(
            exact_survivors.select(F.col(id_col).alias(embedding_id_col)),
            embedding_id_col,
            "leftsemi",
        )
        # dim=None probes the data's vector length (default) — a hardcoded
        # wrong dim would NULL every dot product and silently collapse all
        # vectors into one bucket (an all-pairs quadratic with no error).
        bucketed = random_hyperplane_buckets(
            surviving_vecs,
            vec_col=embedding_col,
            n_planes=lsh_planes,
            dim=embedding_dim,
        )
        epairs = embedding_near_dup_pairs(
            bucketed,
            vec_col=embedding_col,
            id_col=embedding_id_col,
            block_col="bucket",
            threshold=cosine_threshold,
        ).select(
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
        )
        pairs = pairs.unionByName(epairs).distinct()
        report.stages.append("embedding_pairs")

    clusters = connected_components(pairs)
    drop = clusters.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    curated = exact_survivors.join(drop, id_col, "left_anti")
    report.n_near = curated.count()
    report.stages.append("near_dedup")
    exact_survivors.unpersist()

    return curated, report
