"""Exact n-gram Jaccard similarity — the verification stage after LSH.

Jaccard(A, B) = |distinct(A) ∩ distinct(B)| / |distinct(A) ∪ distinct(B)|
over word n-gram shingle sets, computed with array builtins
(array_intersect/array_union on distinct arrays) — integer-exact, so the
SQL oracle matches bit-for-bit.

Scale note: run this on CANDIDATE pairs only (LSH output), never all pairs;
the join back to shingle arrays ships each document's shingles once per
candidate pair, so prune candidates first (est_jaccard threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.dedup.minhash import (
    DEFAULT_SHINGLE,
    word_shingles,
)


def ngram_jaccard(
    pairs: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle: int = DEFAULT_SHINGLE,
    hashed: bool = False,
) -> DataFrame:
    """Attach exact ``jaccard`` to (id_a, id_b) candidate pairs.

    ``hashed=True`` replaces each shingle string with the first-8-hex-chars
    of its md5 as a long BEFORE the pair join: the shingle sets shrink from
    ~25 bytes/element to 8, so the per-pair shuffle ships ~3× fewer bytes
    and the intersect/union compare longs instead of strings (measured ~4×
    on the blocked standalone query). Jaccard over the hashed sets equals
    Jaccard over the strings up to 32-bit collisions — negligible at
    ~10²-element sets — and md5 keeps the engine-exact DuckDB twin."""
    from high_volume_market_data_pipeline_spark.operators.layout import (
        ensure_parallelism,
    )

    docs = ensure_parallelism(docs)
    sh_arr = F.array_distinct(word_shingles(F.col(text_col), shingle))
    if hashed:
        sh_arr = F.array_distinct(
            F.transform(
                sh_arr,
                lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast(
                    "long"
                ),
            )
        )
    sh = docs.select(F.col(id_col), sh_arr.alias("sh"))
    out = (
        pairs.join(sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return out.select(
        "id_a",
        "id_b",
        *[c for c in pairs.columns if c not in ("id_a", "id_b")],
        F.round(inter / union, 6).alias("jaccard"),
    )
