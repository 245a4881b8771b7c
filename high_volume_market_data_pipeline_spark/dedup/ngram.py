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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.dedup.minhash import (
    DEFAULT_SHINGLE,
    word_shingles,
)


PREFIX_CHARS = 32

# Committed recall bar for the ADAPTIVE block key, measured against the
# exact width-8 twin on scale data (pair recall at the jaccard>=0.3
# output, BENCH_SCALE ngram_recall rows; pinned by
# tests/test_dedup_similarity.test_adaptive_recall_meets_committed_floor
# against the newest committed sweep artifact). History: the original
# single (exact-count, head-prefix) key measured 0.796 at sf1 and the
# 0.75 floor was accepted as a layering trade; the round-8 miss
# diagnosis showed 100% of dropped true pairs differed in TOKEN COUNT
# (none in prefix), and the shifted coarse-count OR keys (w1/w2 in
# block_pairs_with_knobs) recover exactly that failure mode — measured
# recall 1.0 at sf1 (227,131/227,131 pairs) at 1.6x the prior adaptive
# runtime and 2.5% candidate overhead, still ~5x under the exact
# quadratic twin. The floor sits below the measured 1.0 to absorb
# corpus drift, not to excuse regressions.
ADAPTIVE_RECALL_FLOOR = 0.95


def resolve_block_knobs(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    block_tokens: int = 8,
    target_block_rows: int | None = None,
) -> tuple[int, int]:
    """Resolve the adaptive block knobs (width, n_prefix_buckets) from
    corpus stats — the exact integer arithmetic token_block_pairs applies
    (and the DuckDB oracle replicates). Exposed so the scale sweep can
    RECORD which regime each tier lands in: width > 1 / b = 1 below the
    floor, width = 1 / b > 1 once the content-prefix key takes over.
    One tiny agg job (count, #langs, token-count range); returns the
    fixed (block_tokens, 1) when ``target_block_rows`` is None or the
    stats degrade (empty corpus / all-NULL text)."""
    from high_volume_market_data_pipeline_spark.functions.text import (
        token_count,
    )

    width = block_tokens
    n_prefix_buckets = 1
    if target_block_rows is not None:
        stats = docs.select(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(lang_col).alias("langs"),
            (
                F.max(token_count(F.col(text_col)))
                - F.min(token_count(F.col(text_col)))
                + 1
            ).alias("nt_range"),
        ).first()
        # nt_range aggregates to NULL when every text is NULL (token_count
        # of NULL is NULL) — degrade to the fixed width instead of None
        # arithmetic on the driver
        if stats and stats["n"] and stats["nt_range"] is not None:
            spread = max(1, stats["langs"] * stats["nt_range"])
            width = max(
                1,
                min(
                    block_tokens,
                    int(target_block_rows * spread // stats["n"]),
                ),
            )
            n_prefix_buckets = max(
                1, int(stats["n"] // (spread * target_block_rows))
            )
    return width, n_prefix_buckets


def token_block_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    block_tokens: int = 8,
    target_block_rows: int | None = None,
) -> DataFrame:
    """Deterministic candidate pairs (id_a < id_b) from a cheap
    (language, token-count bucket) block — the standalone exact-Jaccard
    front end (near-dups rarely differ by ``block_tokens``+ tokens).

    Scale knob: a FIXED bucket width is quadratic in corpus size (each
    block's occupancy grows ∝ n, so pair volume grows ∝ n² — measured 84×
    on 10× data at width 8, BASELINE.md). Pass ``target_block_rows`` to
    make the width shrink with corpus size instead: expected rows per
    block ≈ n·width/spread (spread = #langs · token-count range, one tiny
    agg job), so width = clamp(target·spread/n, 1, block_tokens) holds
    block occupancy ≈ target as n grows and pair volume collapses toward
    ∝ n·target (linear).

    Past the width-1 floor a SECOND block key takes over: a content-prefix
    md5 bucket (mod ``n_prefix_buckets``), OR-constructed over TWO prefix
    positions — head (first ``PREFIX_CHARS`` trimmed chars) and
    mid-document (``PREFIX_CHARS`` chars from position len/2) — a pair is
    a candidate if EITHER position co-blocks it (see
    ``block_pairs_with_knobs``). The bucket count n_prefix_buckets =
    max(1, n // (spread·target)) is 1 exactly while width > 1 (n ≤
    spread·target / 2 there), so the key is constant until it is needed
    and splits residual occupancy back to ≈ target once width floors —
    integer arithmetic only, so a SQL oracle reproduces both knobs
    exactly. Recall trade of each key is explicit: width buckets drop
    near-dups whose token counts differ by ≥ width; prefix buckets drop
    near-dups whose text diverges at BOTH probed positions (a single
    head-only key measured 0.796 pair recall at the 200k tier; the OR
    construction recovers prefix-edited near-dups — current number in the
    newest BENCH_SCALE ngram_recall row). The registered width-8 query
    pins the fixed config (its DuckDB oracle embeds the literal);
    ``ngram_jaccard_adaptive`` registers this adaptive path with a full
    oracle."""
    width, n_prefix_buckets = resolve_block_knobs(
        docs,
        text_col=text_col,
        lang_col=lang_col,
        block_tokens=block_tokens,
        target_block_rows=target_block_rows,
    )
    return block_pairs_with_knobs(
        docs,
        width,
        n_prefix_buckets,
        id_col=id_col,
        text_col=text_col,
        lang_col=lang_col,
    )


def block_pairs_with_knobs(
    docs: DataFrame,
    width: int,
    n_prefix_buckets: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """The block-key pair join with EXPLICIT (width, prefix-bucket) knobs —
    the deterministic back half of ``token_block_pairs``. Exposed so the
    scale sweep can replay a tier's RESOLVED knobs on a document
    subsample (a pair's co-block fate depends only on its two docs, so
    subsample recall with production knobs estimates full-corpus recall
    unbiasedly — the sf10 exact twin is a measured quadratic and can only
    be afforded on a stratum)."""
    from high_volume_market_data_pipeline_spark.functions.text import (
        token_count,
    )

    lang_s = F.col(lang_col).cast("string")
    nt = token_count(F.col(text_col))
    base = F.concat_ws(
        "|", lang_s, F.floor(nt / width).cast("long").cast("string")
    )
    if n_prefix_buckets > 1:
        # OR-construction over FOUR block keys (LSH-banding logic applied
        # to blocking) — a pair is a candidate if ANY key co-blocks it.
        # Each key targets one measured failure mode of a single
        # (count-bucket, prefix-bucket) key:
        #   h/m — exact count bucket × head / MID prefix bucket: the mid
        #     probe recovers pairs whose edit is inside the first
        #     PREFIX_CHARS characters (title lines, boilerplate).
        #   w1/w2 — SHIFTED COARSE count grids (width 8·w, the second
        #     offset by 4·w) × head prefix: the sf1 miss diagnosis showed
        #     100% of dropped true pairs differ in token count (none in
        #     prefix), i.e. the exact-count bucket was the whole recall
        #     gap; two grids offset by half a cell guarantee any pair
        #     within |Δnt| ≤ 4·w shares a bucket in one of them (the
        #     shifted-grid lemma), which covered 100% of the measured
        #     misses at sf1.
        # Occupancy stays ≈ target per key: the coarse grids hold 8× the
        # count-values per cell, so their prefix modulus is scaled 8× —
        # candidate volume is ≤ 4 linear key families, never quadratic.
        # Kind markers keep the four key spaces disjoint.
        trimmed = F.trim(F.col(text_col))

        def bucket(prefix: Column, modulus: int) -> Column:
            return (
                F.conv(F.substring(F.md5(prefix), 1, 8), 16, 10).cast("long")
                % F.lit(modulus)
            ).cast("string")

        mid_pos = (F.floor(F.length(trimmed) / 2) + 1).cast("int")
        head_pref = F.substring(trimmed, 1, PREFIX_CHARS)
        mid_pref = F.substring(trimmed, mid_pos, F.lit(PREFIX_CHARS))
        coarse = 8 * width
        nt_c1 = F.floor(nt / coarse).cast("long").cast("string")
        nt_c2 = F.floor((nt + 4 * width) / coarse).cast("long").cast("string")
        b8 = 8 * n_prefix_buckets
        keys = F.array(
            F.concat_ws(
                "|", base, F.lit("h"), bucket(head_pref, n_prefix_buckets)
            ),
            F.concat_ws(
                "|", base, F.lit("m"), bucket(mid_pref, n_prefix_buckets)
            ),
            F.concat_ws(
                "|", lang_s, nt_c1, F.lit("w1"), bucket(head_pref, b8)
            ),
            F.concat_ws(
                "|", lang_s, nt_c2, F.lit("w2"), bucket(head_pref, b8)
            ),
        )
        d = docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(keys).alias("blk"),
        )
        return (
            d.select(F.col("doc_id").alias("id_a"), "blk")
            .join(d.select(F.col("doc_id").alias("id_b"), "blk"), "blk")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            # a pair co-blocked by several keys must emit once, not N times
            .distinct()
        )
    d = docs.select(
        F.col(id_col).alias("doc_id"), base.alias("blk")
    )
    return (
        d.select(F.col("doc_id").alias("id_a"), "blk")
        .join(d.select(F.col("doc_id").alias("id_b"), "blk"), "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
    )


def blocked_ngram_jaccard(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    block_tokens: int = 8,
    target_block_rows: int | None = None,
    shingle: int = DEFAULT_SHINGLE,
    hashed: bool = False,
) -> DataFrame:
    """token_block_pairs + ngram_jaccard FUSED for the single-block-key
    regime (n_prefix_buckets == 1, i.e. every config until the adaptive
    width floors at 1): one scan of the corpus computes (id, blk,
    shingle-set) and the block self-join carries the shingle sets
    directly, so the exact-Jaccard compare happens in the same stage as
    the pair generation.

    Why (guide §2.3/§8, r12): the two-phase shape evaluated the text
    pipeline up to four times (the block key on both sides of the pair
    self-join, the shingle+md5 pipeline on both sides of the attach
    joins — 8 parquet scans in the executed plan) and shipped the
    shingle arrays through TWO id-equi-joins after already shuffling the
    pair ids. Fused, the heavy arrays move through exactly ONE exchange
    (the block key) and the corpus is scanned once per join side (2
    scans). Jaccard values are bit-identical: same shingle arrays, same
    intersect/union counts, same JVM round.

    The multi-key regime (n_prefix_buckets > 1) keeps the two-phase
    shape deliberately: there a pair can be co-blocked by up to four
    keys and must be deduplicated BEFORE the expensive compare —
    id-only dedup then re-attach is cheaper than shipping shingle sets
    per co-blocking key and deduplicating array-laden rows."""
    from high_volume_market_data_pipeline_spark.operators.layout import (
        ensure_parallelism,
    )
    from high_volume_market_data_pipeline_spark.functions.text import (
        token_count,
    )

    width, n_prefix_buckets = resolve_block_knobs(
        docs,
        text_col=text_col,
        lang_col=lang_col,
        block_tokens=block_tokens,
        target_block_rows=target_block_rows,
    )
    if n_prefix_buckets > 1:
        pairs = block_pairs_with_knobs(
            docs,
            width,
            n_prefix_buckets,
            id_col=id_col,
            text_col=text_col,
            lang_col=lang_col,
        )
        return ngram_jaccard(
            pairs, docs, text_col, id_col, shingle, hashed
        )
    blk = F.concat_ws(
        "|",
        F.col(lang_col).cast("string"),
        F.floor(token_count(F.col(text_col)) / width)
        .cast("long")
        .cast("string"),
    )
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
    d = ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"), blk.alias("blk"), sh_arr.alias("sh")
    )
    out = (
        d.select("blk", F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
        .join(
            d.select(
                "blk", F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b")
            ),
            "blk",
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return out.select(
        "id_a", "id_b", F.round(inter / union, 6).alias("jaccard")
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
