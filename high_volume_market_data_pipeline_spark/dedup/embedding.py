"""Embedding-cosine near-duplicate pairs.

Blocked brute force: restrict pair generation to a blocking key (label,
LSH bucket, or an id-stratified sample) so the quadratic stays per-block.
Cosine is computed in double via zip_with+aggregate — a sequential fold,
deterministic, JVM-side.

Scale path: for all-pairs at 100 TB use similarity.knn's LSH bucketing as
the blocker; this module's block join is the verify stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.functions.vectors import cosine_similarity


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str | None = None,
    threshold: float = 0.9,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine ≥ threshold, id_a < id_b.

    With ``block_col`` the join is an equi-join on the block (shuffle on
    block key, quadratic only within block); without it, a full cross join —
    only for small/sampled inputs.
    """
    vecs = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        *([F.col(block_col)] if block_col else []),
    )
    a = vecs.select(
        *([F.col(block_col)] if block_col else []),
        F.col(id_col).alias("id_a"),
        F.col("v").alias("v_a"),
    )
    b = vecs.select(
        *([F.col(block_col)] if block_col else []),
        F.col(id_col).alias("id_b"),
        F.col("v").alias("v_b"),
    )
    joined = a.join(b, on=block_col) if block_col else a.crossJoin(b)
    cos = cosine_similarity(F.col("v_a"), F.col("v_b"))
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
