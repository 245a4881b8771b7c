"""Multimodal plumbing tests: schema shapes, frame sampling, decode gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from high_volume_market_data_pipeline_spark.catalog import load_table
from high_volume_market_data_pipeline_spark.multimodal import (
    decode_image,
    frame_sample,
    to_binary_assets,
)

from .conftest import SF_DIR


def test_binary_assets_schema(spark):
    assets = to_binary_assets(load_table(spark, SF_DIR, "documents"))
    assert dict(assets.dtypes) == {
        "asset_id": "bigint",
        "content": "binary",
        "meta": "struct<format:string,n_bytes:int>",
    }
    row = assets.filter(F.col("asset_id") == 0).collect()[0]
    assert row.meta.n_bytes == len(row.content)


def test_frame_sample_slices_payload(spark):
    assets = to_binary_assets(load_table(spark, SF_DIR, "documents")).limit(5)
    frames = frame_sample(assets, n_frames=4).collect()
    assert len(frames) == 20
    by_asset = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r)
    for rows in by_asset.values():
        assert [r.frame_idx for r in sorted(rows, key=lambda r: r.frame_idx)] == [0, 1, 2, 3]
        assert all(len(r.frame) > 0 for r in rows)


def test_decode_image_is_gated(spark):
    assets = to_binary_assets(load_table(spark, SF_DIR, "documents"))
    with pytest.raises(NotImplementedError, match="mapInPandas plumbing"):
        decode_image(assets)
