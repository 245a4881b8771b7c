"""MinHash + LSH near-duplicate detection, oracle-checkable by construction.

Pipeline: normalize → word w-shingles → k MinHash components → band keys →
self-join on band key → candidate pairs with estimated Jaccard.

Hash choice: each shingle is md5-hashed ``ceil(k/4)`` times (seed-prefixed),
and each 128-bit digest is sliced into four 8-hex-char (32-bit) component
hashes; component j of a document's signature is the LEXICOGRAPHIC MIN of
slice ``j%4`` of hash-pass ``j//4`` over its shingles. Fixed-width lowercase
hex makes lexicographic = numeric order, and md5 is bit-identical in Spark
and DuckDB, so the whole pipeline (including LSH bucketing) has an exact SQL
twin — unusual for LSH implementations, and exactly what the correctness
gate needs. A production swap-in of xxhash64 only changes the hash exprs.

Performance note (why the expression shape is unusual): Catalyst's
CollapseProject inlines projection expressions into every downstream use,
and higher-order functions (transform/array_min) are interpreted with no
common-subexpression elimination — a naive "one md5 pass per component"
formulation evaluates the full shingle pipeline 16× per row (measured 60×
slower at sf0.1). Two fixes here:
  1. ``_bind`` evaluates an expression ONCE per row by wrapping it in a
     single-element ``transform(array(x), v -> body(v))`` — inside the
     lambda, ``v`` is a materialized value, not a re-evaluated tree.
  2. k components derive from ceil(k/4) md5 passes (digest slicing), not k.

Scale analysis (the reason this shape wins at 100 TB):
- signatures: narrow projection + array exprs inside the scan stage; no
  shuffle, no Python; persisted (MEMORY_AND_DISK) because both the window
  count and the self-join re-read them — id + k×8 chars per row, tiny
  relative to the input text.
- banding: explode to b rows/doc (b≈4) then ONE shuffle on band_key; bucket
  sizes are data-dependent but bounded by real duplication, and a
  ``max_bucket`` guard drops degenerate buckets (boilerplate explosions)
  before the quadratic pair step — the standard web-dedup guard.
- pairs: generated bucket-locally; the O(n²) is per-bucket, not global.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from high_volume_market_data_pipeline_spark.functions.expr import bind_once as _bind
from high_volume_market_data_pipeline_spark.functions.text import normalize_text

DEFAULT_K = 8  # minhash components
DEFAULT_BANDS = 4  # → rows-per-band r = k/bands = 2; threshold ≈ (1/b)^(1/r)
DEFAULT_SHINGLE = 3  # word trigrams
_SLICES_PER_MD5 = 4  # 32 hex chars / 8 per component


def word_shingles(
    text: Column, w: int = DEFAULT_SHINGLE, normalized: bool = False
) -> Column:
    """Array of word w-grams of the normalized text; documents shorter than
    w words contribute their whole normalized text as one shingle.

    The token array is bound ONCE per row (bind_once): the gram lambda
    references it w times per gram, and an unbound reference would
    re-evaluate split(regexp_replace(...)) for every element_at — w × n
    regex passes per document (the CollapseProject/no-CSE trap; measured
    8× on the w=8 contamination screen).

    Pass ``normalized=True`` when ``text`` is ALREADY the output of
    normalize_text: normalization is idempotent, so re-applying it only
    wastes a full lower+regex pass per document (it was the hot stage in
    dedup/spans before this flag existed)."""

    def build(toks: Column) -> Column:
        n = F.size(toks)
        grams = F.transform(
            F.sequence(F.lit(1), n - w + 1),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + off) for off in range(w)]
            ),
        )
        # array_join(toks, " ") round-trips the normalized text exactly
        # (split/join share the single-space delimiter).
        return F.when(n < w, F.array(F.array_join(toks, " "))).otherwise(grams)

    toks = text if normalized else normalize_text(text)
    return _bind(F.split(toks, " "), build)


def signature_column(
    text: Column, k: int = DEFAULT_K, shingle: int = DEFAULT_SHINGLE
) -> Column:
    """array<string> of k MinHash components for one text column, evaluated
    in a single pass per row (see module docstring for the expression shape)."""
    n_pass = -(-k // _SLICES_PER_MD5)

    # Factory helpers: F.transform treats a 2-arg lambda as (element, index),
    # so loop variables MUST be captured via enclosing scope, never via
    # default args — a default-arg lambda silently receives the array index.
    def slice_min(hashes: Column, start: int) -> Column:
        return F.array_min(
            F.transform(hashes, lambda h: F.substring(h, start, 8))
        )

    def md5_pass(sh: Column, seed: int) -> Column:
        prefix = f"{seed}|"
        return F.transform(
            sh,
            lambda s: F.md5(F.encode(F.concat(F.lit(prefix), s), "UTF-8")),
        )

    def from_hashes(hv: Column) -> Column:
        # hv: array of n_pass arrays of md5 hex digests (one per shingle)
        return F.array(
            *[
                slice_min(
                    F.element_at(hv, j // _SLICES_PER_MD5 + 1),
                    1 + 8 * (j % _SLICES_PER_MD5),
                )
                for j in range(k)
            ]
        )

    def from_shingles(sh: Column) -> Column:
        hv = F.array(*[md5_pass(sh, p) for p in range(n_pass)])
        return _bind(hv, from_hashes)

    return _bind(word_shingles(text, shingle), from_shingles)


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    shingle: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """(id, sig: array<string> length k) per-document MinHash signature."""
    return df.select(
        F.col(id_col),
        signature_column(F.col(text_col), k, shingle).alias("sig"),
    )


def band_keys_column(
    k: int, bands: int, sig_col: str = "sig"
) -> Column:
    """array<string> of the ``bands`` LSH band keys derived from a
    length-``k`` signature column — THE banding rule, defined once: the
    persisted SignatureStore's band_key values and the pair paths' probe
    keys are equi-joined, so two private copies of this expression would
    silently desynchronize on any future change (recall loss, no
    error)."""
    r = k // bands
    return F.array(
        *[
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[F.element_at(sig_col, b * r + i + 1) for i in range(r)],
            )
            for b in range(bands)
        ]
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    shingle: int = DEFAULT_SHINGLE,
    max_bucket: int = 1000,
    cache_registry: list | None = None,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band, with
    ``est_jaccard`` = fraction of equal signature components.

    ``max_bucket`` drops degenerate buckets (e.g. empty/boilerplate docs
    hashing together) before pair expansion — at web scale one such bucket
    otherwise produces billions of junk pairs.

    The signature frame is persisted: the bucket-count window and both sides
    of the band self-join consume it, and without a materialization barrier
    Spark would recompute the md5 pipeline for each consumer. A long-lived
    driver calling this repeatedly (an ingest service) should pass
    ``cache_registry`` (a list): the persisted frame is appended to it so
    the caller can ``unpersist()`` once its downstream results are
    materialized — otherwise each call leaks one cached block set for the
    session's lifetime.

    ``signatures`` — a precomputed, already-materialized (id_col, sig)
    frame — skips the signature pipeline entirely; pass it when the
    caller needs the same signatures for OTHER joins too (the
    SignatureStore's store probe and append), rather than fishing the
    internal cache back out of the registry.
    """
    from high_volume_market_data_pipeline_spark.operators.layout import (
        ensure_parallelism,
    )

    if signatures is not None:
        sig = signatures
    else:
        sig = minhash_signature(
            ensure_parallelism(df), text_col, id_col, k, shingle
        ).persist(StorageLevel.MEMORY_AND_DISK)
        if cache_registry is not None:
            cache_registry.append(sig)
    banded = sig.select(
        F.col(id_col),
        F.col("sig"),
        F.explode(band_keys_column(k, bands)).alias("band_key"),
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
