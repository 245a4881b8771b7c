"""Approximate/exact nearest-neighbor search over an embedding column.

Two tiers (driver mandate):
- ``brute_force_knn``: exact cosine top-k — broadcast the (small) query set
  against the corpus, score every pair, per-query top-k via window. The
  correctness baseline; at scale the corpus never shuffles (queries are the
  broadcast side) and top-k prunes before any collect.
- ``lsh_bucketed_knn``: random-hyperplane (sign-LSH) bucketing — corpus and
  queries bucketed by sign-bit key; candidate scoring only within a bucket
  (multi-probe: queries also probe 1-bit-flip neighbors to cut misses).
  The 100 TB path: shuffle is keyed by bucket, quadratic work is per-bucket.

Hyperplanes are derived deterministically from md5 (seeded), so results are
reproducible run-to-run and testable without a stored model.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.functions.vectors import (
    as_double,
    cosine_similarity,
)


def brute_force_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, cosine, knn_rank), excluding
    self-matches; rank ties broken by neighbor id (deterministic)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("_cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), "neighbor_id")
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("_cos"), 6).alias("cosine"),
            "knn_rank",
        )
    )


def _hyperplane(dim: int, plane: int, seed: int = 42) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane from md5 bytes."""
    vals: list[float] = []
    i = 0
    while len(vals) < dim:
        h = hashlib.md5(f"{seed}:{plane}:{i}".encode()).digest()
        for byte in h:
            vals.append((byte - 127.5) / 127.5)
            if len(vals) == dim:
                break
        i += 1
    return vals


def random_hyperplane_buckets(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Append a sign-LSH bucket key: bit p = 1 iff v·hyperplane_p ≥ 0."""
    v = as_double(F.col(vec_col))
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, p, seed)])
        d = F.aggregate(
            F.zip_with(v, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    key = bits[0]
    for b in bits[1:]:
        key = key + b
    return df.withColumn(out_col, key.cast("int"))


def lsh_bucketed_knn(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 4,
    dim: int = 64,
    seed: int = 42,
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket.

    Multi-probe: each query also probes every 1-bit-flip neighbor bucket,
    trading (n_planes+1)× candidate fan-out for much better recall — the
    standard fix for sign-LSH boundary misses, without touching the
    corpus-side layout. Defaults (4 planes ⇒ 16 buckets, 5 probes) give
    recall ≈0.6 on unstructured random vectors — the worst case; clustered
    real embeddings do much better. Raise n_planes as the corpus grows:
    candidate count per query scales ~n/2^planes · (planes+1).
    """
    c = random_hyperplane_buckets(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("cv"),
        ),
        "cv",
        n_planes,
        dim,
        seed,
    )
    q = random_hyperplane_buckets(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
        ),
        "qv",
        n_planes,
        dim,
        seed,
    )
    probes = [F.col("bucket")]
    if multi_probe:
        probes += [
            F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
        ]
    q = q.withColumn("bucket", F.explode(F.array(*probes)))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("qv"), F.col("cv")).alias("_cos"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos"), "neighbor_id")
    return (
        scored.withColumn("knn_rank", F.row_number().over(w))
        .filter(F.col("knn_rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round(F.col("_cos"), 6).alias("cosine"),
            "knn_rank",
        )
    )
