"""Substring-level span removal — the remediation half of exact substring
dedup (the analysis half is queries_dedup.substring_dup_spans).

Document-level dedup keeps or drops whole documents; the Lee et al. (2022)
result ("Deduplicating Training Data Makes Language Models Better") is that
the verbatim PASSAGES duplicated across otherwise-unique documents (license
headers, templates, boilerplate) are what a training corpus needs scrubbed.
``drop_duplicated_spans`` removes them while keeping exactly one copy:

- a word ``w``-gram is *duplicated* if it occurs in ≥ 2 distinct docs;
- its *owner* is the smallest doc_id containing it (deterministic);
- every NON-owner doc drops the tokens covered by that gram.

So the first (min-id) document keeps its text verbatim and later documents
lose only the shared spans — re-running on the cleaned corpus is a no-op
(the spans are gone). All set logic runs on 32-bit md5 slices of the grams
(never gram strings through a shuffle — NOTES.md rule), positions are
integer token indexes, and the rebuilt text is the space-join of surviving
tokens in order: fully deterministic, no RNG, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.dedup.minhash import (
    word_shingles,
)
from high_volume_market_data_pipeline_spark.functions.text import (
    normalize_text,
)


def drop_duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 8,
    out_col: str = "clean_text",
) -> DataFrame:
    """(id, clean_text, n_tokens, n_dropped) per document.

    Cost shape: one gram explode (rows ≈ total tokens), one groupBy(hash)
    for the duplicated-gram owners, one join back, one token-index
    explode for the removal set, one anti-join, one per-doc re-assembly
    window. The only wide shuffles carry (hash, owner) pairs and (doc,
    token-index) pairs — never text."""
    norm = docs.select(
        F.col(id_col).alias("doc_id"), normalize_text(F.col(text_col)).alias("_norm")
    )
    toks = norm.select(
        "doc_id",
        F.posexplode(F.split(F.col("_norm"), " ")).alias("tok_idx", "tok"),
    )
    grams = norm.select(
        "doc_id",
        F.posexplode(
            word_shingles(F.col("_norm"), w, normalized=True)
        ).alias("pos", "gram"),
    ).select(
        "doc_id",
        "pos",
        F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10)
        .cast("long")
        .alias("hh"),
    )
    owners = (
        grams.groupBy("hh")
        .agg(
            F.countDistinct("doc_id").alias("nd"),
            F.min("doc_id").alias("owner"),
        )
        .filter(F.col("nd") >= 2)
        .select("hh", "owner")
    )
    # gram instances a non-owner doc must scrub, expanded to token indexes
    # [pos, pos + w - 1] (short docs — text shorter than w tokens — hash
    # as one whole-text gram at pos 0; the sequence is clamped by the
    # anti-join since out-of-range indexes match no token row)
    foreign = (
        grams.join(owners, "hh")
        .filter(F.col("doc_id") > F.col("owner"))
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(w - 1))
            ).alias("tok_idx"),
        )
        .distinct()
    )
    kept = toks.join(foreign, ["doc_id", "tok_idx"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("tok_idx", "tok"))),
                lambda s: s.tok,
            ),
        ).alias(out_col),
        F.count(F.lit(1)).alias("_kept"),
    )
    totals = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col(out_col), F.lit("")).alias(out_col),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("_kept"), F.lit(0))).alias(
                "n_dropped"
            ),
        )
    )
