"""Multimodal query: binary-asset feature extraction, oracle-checked.

The payload is the document's UTF-8 bytes (the container has no image
codecs), but the operator chain — binary column + metadata struct →
mapInPandas Arrow batches → typed feature rows — is exactly the production
multimodal shape, and the deterministic byte features are SQL-expressible,
so even the pandas-UDF path gets a value-hash oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from high_volume_market_data_pipeline_spark.catalog import load_table
from high_volume_market_data_pipeline_spark.multimodal import (
    byte_features,
    decode_bmp,
    synthetic_bmp_assets,
    to_binary_assets,
)
from high_volume_market_data_pipeline_spark.registry import query


@query(
    "multimodal_byte_features",
    oracle="""
    SELECT doc_id AS asset_id,
           strlen(text) AS n_bytes,
           ascii(substr(text, 1, 1)) AS first_byte,
           ascii(substr(text, length(text), 1)) AS last_byte
    FROM documents
    ORDER BY asset_id
    """,
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary assets → Arrow-batched mapInPandas feature extraction.
    (documents are ASCII, so byte peeks equal DuckDB's ascii()/octet_length
    — the oracle validates the pandas plumbing end to end.)"""
    # No ensure_parallelism here: the pandas byte peeks are cheap enough
    # that local Python-worker spin-up outweighs the fan-out; a real decode
    # stage (expensive per row) SHOULD fan out first (binary_ops docstring).
    docs = load_table(spark, sf_dir, "documents")
    assets = to_binary_assets(docs)
    return byte_features(assets).orderBy("asset_id")


@query(
    "image_decode_stats",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(4 + doc_id % 9 AS INT) AS width,
             CAST(3 + doc_id % 5 AS INT) AS height,
             CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT)
               AS channels
      FROM documents
    )
    SELECT doc_id AS asset_id, width, height, channels,
           (n // 256) * 32640 + (n % 256) * (n % 256 - 1) // 2
             AS sum_pixels,
           TRUE AS ok
    FROM (SELECT *, CAST(width AS BIGINT) * height * channels AS n
          FROM dims)
    ORDER BY asset_id
    """,
)
def image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode without a codec library: deterministic BMP files
    (true headers, 4-byte row padding, bottom-up rows, palette) are
    generated per document and decoded by the pure-numpy parser in
    ``multimodal.bmp`` — width/height/channels from the header, exact
    pixel-byte sum from the grid. The fixture pixels follow i mod 256, so
    DuckDB checks the full decode (dimensions AND pixel sum) in
    closed-form integer SQL with no image library on the oracle side."""
    docs = load_table(spark, sf_dir, "documents")
    assets = synthetic_bmp_assets(docs)
    return decode_bmp(assets).orderBy("asset_id")
