"""Exact deduplication via content fingerprint + hash aggregate.

Scale path: groupBy(md5(normalized_text)) is a partial+final hash aggregate —
the shuffle carries one (fingerprint, min_id) pair per distinct document per
task, not full text. At 100 TB this is the cheapest possible exact dedup:
one shuffle of ~32-byte keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.functions.text import fingerprint


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "min",
) -> DataFrame:
    """One row per distinct normalized text; the kept row is the min (or
    max) id — deterministic winner, unlike dropDuplicates.

    Returns (fingerprint, kept_id, n_copies); join back on id to recover
    full rows without shuffling text bytes.
    """
    agg_fn = F.min if keep == "min" else F.max
    return df.select(
        fingerprint(F.col(text_col)).alias("fingerprint"), F.col(id_col)
    ).groupBy("fingerprint").agg(
        agg_fn(id_col).alias("kept_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )
