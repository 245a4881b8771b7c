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
    synthetic_palette_bmp_assets,
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


@query(
    "image_decode_palette_stats",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             CAST(4 + doc_id % 9 AS INT) AS width,
             CAST(3 + doc_id % 5 AS INT) AS height
      FROM documents
    ), sized AS (
      SELECT *,
             CAST(width AS BIGINT) * height AS n,
             (doc_id % 7 = 3 AND CAST(width AS BIGINT) * height >= 65)
               AS bad
      FROM dims
    )
    SELECT doc_id AS asset_id,
           CASE WHEN bad THEN NULL ELSE width END AS width,
           CASE WHEN bad THEN NULL ELSE height END AS height,
           CAST(CASE WHEN bad THEN NULL ELSE 3 END AS INT) AS channels,
           CASE WHEN bad THEN NULL ELSE 3 * n * n END AS sum_pixels,
           NOT bad AS ok
    FROM sized
    ORDER BY asset_id
    """,
)
def image_decode_palette_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLORED-palette BMP decode, oracle-checked: the fixtures store
    pixel INDEX k at position k under palette entry k = (k, 2k+1, 3k+2),
    so the decoded RGB sum is 3n² in closed form (n = w·h ≤ 84, no index
    wrap) — a decoder that skips the color table (raw-index sum
    n(n-1)/2) or collapses to gray (channels=1) hash-misses. Docs with
    doc_id % 7 == 3 declare a SHORT 64-entry table: those whose max index
    overruns it must report ok=false with NULL stats (per-row validation,
    never a batch failure). Complements ``image_decode_stats``, whose
    identity-gray fixtures cannot observe the palette arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    assets = synthetic_palette_bmp_assets(docs)
    return decode_bmp(assets).orderBy("asset_id")
