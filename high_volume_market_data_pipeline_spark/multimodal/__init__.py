"""Multimodal (image/audio/video) column handling — driver north-star.

Opaque ``binary`` content columns + typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas``. The image/audio codecs are NOT in this
container, so the decode step is stubbed (NotImplementedError or a
deterministic fake, clearly marked) while the Spark-side plumbing — schema,
batch shape, partition preservation — is real and tested.
"""

from high_volume_market_data_pipeline_spark.multimodal.binary_ops import (
    byte_features,
    byte_features_arrow,
    decode_image,
    frame_sample,
    resize_raw,
    to_binary_assets,
)
from high_volume_market_data_pipeline_spark.multimodal.bmp import (
    decode_bmp,
    encode_bmp,
    synthetic_bmp_assets,
    synthetic_palette_bmp_assets,
)

__all__ = [
    "byte_features",
    "byte_features_arrow",
    "decode_bmp",
    "decode_image",
    "encode_bmp",
    "frame_sample",
    "resize_raw",
    "synthetic_bmp_assets",
    "synthetic_palette_bmp_assets",
    "to_binary_assets",
]
