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


def test_binary_file_source_feeds_byte_features(spark, tmp_path):
    """binaryFile scan → multimodal pipeline end to end: per-file rows with
    opaque content, glob + size pushdown, and the features UDF consuming
    the scan's output directly."""
    from high_volume_market_data_pipeline_spark.multimodal.binary_ops import (
        byte_features,
    )
    from high_volume_market_data_pipeline_spark.sources import (
        read_binary_files,
    )

    blobs = {"a.img": b"\x01payload-a\x7f", "b.img": b"\x02pb\x7e",
             "skip.txt": b"not-an-image", "big.img": b"x" * 4096}
    for name, blob in blobs.items():
        (tmp_path / name).write_bytes(blob)

    df = read_binary_files(spark, str(tmp_path), glob="*.img", max_bytes=1024)
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.img", "b.img"}  # glob and size filter applied
    assert bytes(rows["a.img"]["content"]) == blobs["a.img"]
    assert rows["b.img"]["length"] == len(blobs["b.img"])

    assets = df.select(
        F.xxhash64("path").alias("asset_id"), "content"
    )
    feats = {
        r["n_bytes"]: (r["first_byte"], r["last_byte"])
        for r in byte_features(assets).collect()
    }
    assert feats == {len(blobs["a.img"]): (0x01, 0x7F),
                     len(blobs["b.img"]): (0x02, 0x7E)}


def test_resize_raw_nearest_neighbor_exact(spark):
    import numpy as np

    from high_volume_market_data_pipeline_spark.multimodal.binary_ops import (
        resize_raw,
    )

    grid = np.arange(16, dtype=np.uint8).reshape(4, 4)
    bad = b"\x00\x01\x02"  # length != w*h
    df = spark.createDataFrame(
        [(1, bytes(grid.tobytes()), 4, 4), (2, bad, 4, 4)],
        "asset_id long, content binary, width int, height int",
    )
    out = {r["asset_id"]: r for r in resize_raw(df, 2, 2).collect()}
    ys = (np.arange(2) * 4) // 2
    want = grid[np.ix_(ys, ys)].tobytes()
    assert bytes(out[1]["content"]) == want
    assert (out[1]["width"], out[1]["height"], out[1]["ok"]) == (2, 2, True)
    assert out[2]["content"] is None and out[2]["ok"] is False


def test_resize_raw_upscale_and_downscale_roundtrip_shape(spark):
    import numpy as np

    from high_volume_market_data_pipeline_spark.multimodal.binary_ops import (
        resize_raw,
    )

    grid = np.full((3, 5), 7, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytes(grid.tobytes()), 5, 3)],
        "asset_id long, content binary, width int, height int",
    )
    up = resize_raw(df, 10, 6).collect()[0]
    assert len(bytes(up["content"])) == 60 and set(bytes(up["content"])) == {7}


def test_byte_features_arrow_equals_pandas_path(spark):
    """mapInArrow buffer-math features must match the mapInPandas path
    byte-for-byte, including empty payloads."""
    from high_volume_market_data_pipeline_spark.catalog import load_table
    from high_volume_market_data_pipeline_spark.multimodal.binary_ops import (
        byte_features,
        byte_features_arrow,
        to_binary_assets,
    )
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents")
    assets = to_binary_assets(docs)
    # union in empty, 1-byte, and NULL payloads (edge offsets + validity)
    edge = spark.createDataFrame(
        [(90001, bytearray(b""), ("text/plain", 0)),
         (90002, bytearray(b"Z"), ("text/plain", 1)),
         (90003, None, ("text/plain", 0))],
        "asset_id bigint, content binary, meta struct<format:string,n_bytes:int>",
    )
    assets = assets.unionByName(edge)
    a = {r.asset_id: r for r in byte_features_arrow(assets).collect()}
    b = {r.asset_id: r for r in byte_features(assets).collect()}
    assert set(a) == set(b) and len(a) > 0
    for k in a:
        assert a[k] == b[k], (a[k], b[k])
    assert a[90001].n_bytes == 0 and a[90001].first_byte == -1
    assert a[90002].first_byte == ord("Z") == a[90002].last_byte
    assert a[90003].n_bytes is None and a[90003].first_byte is None
