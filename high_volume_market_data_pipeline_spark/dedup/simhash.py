"""SimHash content signatures (32-bit) for hamming-space near-dup.

Per document: hash each token to a 32-bit integer (first 8 hex chars of
md5 → int), then for each bit position take the sign of Σ(±1) across tokens
(+1 if the bit is set). Documents differing in a few words land within small
hamming distance.

Implementation is one explode + one groupBy with 32 conditional-sum
aggregates — all integer arithmetic, bit-identical in the SQL oracle. At
scale this is a single shuffle keyed by doc id carrying 32 ints per token
group (partial aggregation collapses tokens map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.functions.text import tokens

BITS = 32


def _token_hash32(tok) -> F.Column:
    """First 8 hex chars of md5 → 32-bit int (conv base16→base10)."""
    return F.conv(F.substring(F.md5(F.encode(tok, "UTF-8")), 1, 8), 16, 10).cast(
        "long"
    )


def simhash32(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, simhash): 32-bit SimHash of the whitespace tokens."""
    from high_volume_market_data_pipeline_spark.operators.layout import (
        ensure_parallelism,
    )

    df = ensure_parallelism(df)
    toked = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    ).withColumn("h", _token_hash32(F.col("tok")))
    bit_sums = [
        F.sum(
            F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"s_{i}")
        for i in range(BITS)
    ]
    agg = toked.groupBy(id_col).agg(*bit_sums)
    simhash = None
    for i in range(BITS):
        bit = F.when(F.col(f"s_{i}") > 0, F.lit(2**i)).otherwise(F.lit(0))
        simhash = bit if simhash is None else simhash + bit
    return agg.select(F.col(id_col), simhash.cast("long").alias("simhash"))


def hamming32(a, b) -> F.Column:
    """Hamming distance between two 32-bit signatures (bit_count of XOR)."""
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))
