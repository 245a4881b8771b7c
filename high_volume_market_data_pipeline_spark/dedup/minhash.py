"""MinHash + LSH near-duplicate detection, oracle-checkable by construction.

Pipeline: normalize → word w-shingles → k MinHash components → band keys →
self-join on band key → candidate pairs with estimated Jaccard.

Hash choice: component j of a document's signature is
``min(md5(j || '|' || shingle))`` over its shingles, minimizing the HEX
STRING lexicographically. md5 is bit-identical in Spark and DuckDB, so the
whole pipeline (including LSH bucketing) has an exact SQL twin — unusual for
LSH implementations, and exactly what the correctness gate needs. A
production swap-in of xxhash64 only changes the hash expression.

Scale analysis (the reason this shape wins at 100 TB):
- signatures: narrow projection + array exprs inside the scan stage; no
  shuffle, no Python.
- banding: explode to b rows/doc (b≈4) then ONE shuffle on band_key; bucket
  sizes are data-dependent but bounded by real duplication, and a
  ``max_bucket`` guard drops degenerate buckets (boilerplate explosions)
  before the quadratic pair step — the standard web-dedup guard.
- pairs: generated bucket-locally; the O(n²) is per-bucket, not global.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.functions.text import normalize_text

DEFAULT_K = 8  # minhash components
DEFAULT_BANDS = 4  # → rows-per-band r = k/bands = 2; threshold ≈ (1/b)^(1/r)
DEFAULT_SHINGLE = 3  # word trigrams


def word_shingles(text: Column, w: int = DEFAULT_SHINGLE) -> Column:
    """Array of word w-grams of the normalized text; documents shorter than
    w words contribute their whole normalized text as one shingle."""
    norm = normalize_text(text)
    toks = F.split(norm, " ")
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - w + 1),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + off) for off in range(w)]
        ),
    )
    return F.when(n < w, F.array(norm)).otherwise(grams)


def _component(shingles: Column, seed: int) -> Column:
    return F.array_min(
        F.transform(
            shingles,
            lambda s: F.md5(F.encode(F.concat(F.lit(f"{seed}|"), s), "UTF-8")),
        )
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    shingle: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """(id, mh_0..mh_{k-1}): per-document MinHash signature columns."""
    shingles = word_shingles(F.col(text_col), shingle)
    return df.select(
        F.col(id_col),
        *[_component(shingles, j).alias(f"mh_{j}") for j in range(k)],
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    shingle: int = DEFAULT_SHINGLE,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band, with
    ``est_jaccard`` = fraction of equal signature components.

    ``max_bucket`` drops degenerate buckets (e.g. empty/boilerplate docs
    hashing together) before pair expansion — at web scale one such bucket
    otherwise produces billions of junk pairs.
    """
    r = k // bands
    sig = minhash_signature(df, text_col, id_col, k, shingle)
    mh = [F.col(f"mh_{j}") for j in range(k)]
    banded = sig.select(
        F.col(id_col),
        F.array(*mh).alias("sig"),
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        "|", F.lit(str(b)), *mh[b * r : (b + 1) * r]
                    ).alias(f"band_{b}")
                    for b in range(bands)
                ]
            )
        ).alias("band_key"),
    )
    # Degenerate-bucket guard: window count per band_key, bucket-local.
    counted = banded.withColumn(
        "_bucket_n", F.count(F.lit(1)).over(Window.partitionBy("band_key"))
    ).filter(F.col("_bucket_n") <= max_bucket)
    a = counted.select(
        F.col("band_key"),
        F.col(id_col).alias("id_a"),
        F.col("sig").alias("sig_a"),
    )
    b = counted.select(
        F.col("band_key"),
        F.col(id_col).alias("id_b"),
        F.col("sig").alias("sig_b"),
    )
    pairs = (
        a.join(b, "band_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    eq = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda v: v,
        )
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round(eq / F.lit(float(k)), 6).alias("est_jaccard"),
    )
