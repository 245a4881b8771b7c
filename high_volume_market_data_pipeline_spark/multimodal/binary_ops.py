"""Binary-column operators over mapInPandas (Arrow batch transfer).

Pattern notes for the 100 TB path:
- content stays an opaque ``binary`` column; metadata travels alongside in
  a typed struct so planning-relevant fields (format, size) are pruned /
  filtered WITHOUT touching payload bytes (columnar pruning means a filter
  on meta.format never reads content pages);
- per-batch Python cost is amortized by Arrow: mapInPandas receives an
  iterator of pandas DataFrames (one per Arrow batch), not rows;
- heavy decode stages should run AFTER repartitioning to spread payload
  bytes evenly (binary sizes are skewed; AQE can't split a single huge
  row).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Real decoders are not in this container; the plumbing is exercised with
# deterministic byte-level fakes. Swap `_HAVE_PIL` paths for real codecs.
try:  # pragma: no cover - not installed here
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def to_binary_assets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Testdata adapter: treat each document's UTF-8 bytes as an opaque
    payload with typed metadata — the schema shape real image/audio tables
    use: (id, content binary, meta struct<format,n_bytes>)."""
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.encode(F.col(text_col), "UTF-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("format"),
            F.octet_length(F.col(text_col)).alias("n_bytes"),
        ).alias("meta"),
    )


def byte_features(df: DataFrame) -> DataFrame:
    """Deterministic per-asset byte features via mapInPandas:
    (asset_id, n_bytes, first_byte, last_byte).

    This is the feature-extraction plumbing: Arrow batches in, vectorized
    pandas ops, narrow typed schema out. A real image featurizer replaces
    the byte peeks with model inference over the same batch loop."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            # NULL payloads propagate as NULL features (pandas nullable
            # dtypes); empty payloads report 0 / -1 / -1.
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": content.map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                    "first_byte": content.map(
                        lambda b: None if b is None else (b[0] if len(b) else -1)
                    ).astype("Int32"),
                    "last_byte": content.map(
                        lambda b: None if b is None else (b[-1] if len(b) else -1)
                    ).astype("Int32"),
                }
            )

    return df.mapInPandas(
        extract,
        schema="asset_id bigint, n_bytes bigint, first_byte int, last_byte int",
    )


def byte_features_arrow(df: DataFrame) -> DataFrame:
    """The same features as ``byte_features`` via ``mapInArrow`` — one
    level lower than pandas: the handler receives pyarrow RecordBatches
    and reads the binary column's offsets/data buffers directly with
    numpy (zero copies, no per-value Python objects, no pandas boxing).

    For opaque-payload columns this is the honest hot path: a pandas
    round-trip materializes every blob as a Python ``bytes`` object just
    to call ``len`` on it, while the Arrow buffers already hold lengths
    as an int32 offsets array. Equality with the pandas path is pinned in
    tests/test_multimodal.py; prefer this variant when the per-batch work
    is buffer math, and the pandas variant when a Python library (codec,
    model) needs materialized objects anyway."""
    import numpy as np
    import pyarrow as pa

    def extract(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            idx = batch.schema.get_field_index("content")
            if idx < 0:  # get_field_index returns -1, and column(-1)
                # would silently pick the LAST column — fail loudly instead
                raise KeyError(
                    f"byte_features_arrow: no 'content' column in "
                    f"{batch.schema.names}"
                )
            content = batch.column(idx)
            # binary array layout: buffers = [validity, offsets, data].
            # Offset width depends on the Arrow type: binary ⇒ int32,
            # large_binary ⇒ int64 (Spark ships the latter when
            # spark.sql.execution.arrow.useLargeVarTypes=true) — reading
            # int64 offsets as int32 silently yields garbage lengths, so
            # select the dtype from the type and reject anything else.
            if pa.types.is_binary(content.type):
                off_dtype = np.int32
            elif pa.types.is_large_binary(content.type):
                off_dtype = np.int64
            else:
                raise TypeError(
                    f"byte_features_arrow: 'content' must be binary/"
                    f"large_binary, got {content.type}"
                )
            off = np.frombuffer(content.buffers()[1], dtype=off_dtype)[
                content.offset : content.offset + len(content) + 1
            ].astype(np.int64)
            dbuf = content.buffers()[2]
            data = (
                np.frombuffer(dbuf, dtype=np.uint8).astype(np.int32)
                if dbuf is not None
                else np.empty(0, np.int32)
            )  # int32 up-cast before np.where: mixing uint8 with -1 breaks
            # under NumPy 2's NEP-50 promotion (OverflowError)
            valid = np.asarray(content.is_valid())  # NULL ≠ empty
            lens = off[1:] - off[:-1]
            nonempty = lens > 0
            safe_first = np.minimum(off[:-1], max(len(data) - 1, 0))
            safe_last = np.maximum(off[1:] - 1, 0)
            first = np.where(
                nonempty,
                data[safe_first] if len(data) else -1,
                -1,
            ).astype(np.int32)
            last = np.where(
                nonempty,
                data[safe_last] if len(data) else -1,
                -1,
            ).astype(np.int32)
            mask = ~valid
            aid_idx = batch.schema.get_field_index("asset_id")
            if aid_idx < 0:  # same loud-failure rule as 'content' above
                raise KeyError(
                    f"byte_features_arrow: no 'asset_id' column in "
                    f"{batch.schema.names}"
                )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(aid_idx),
                    pa.array(lens, type=pa.int64(), mask=mask),
                    pa.array(first, type=pa.int32(), mask=mask),
                    pa.array(last, type=pa.int32(), mask=mask),
                ],
                ["asset_id", "n_bytes", "first_byte", "last_byte"],
            )

    return df.mapInArrow(
        extract,
        schema="asset_id bigint, n_bytes bigint, first_byte int, last_byte int",
    )


def decode_image(df: DataFrame, content_col: str = "content") -> DataFrame:
    """STUB: image decode (bytes → height/width/pixels). Requires a codec
    library absent from this container; raises until one is installed.
    The mapInPandas signature below is the real production shape."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL/pillow, not present in this "
            "environment; byte_features() demonstrates the identical "
            "mapInPandas plumbing with a deterministic fake"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        import io

        for pdf in batches:
            dims = pdf[content_col].map(lambda b: Image.open(io.BytesIO(b)).size)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": dims.map(lambda s: s[0]),
                    "height": dims.map(lambda s: s[1]),
                }
            )

    return df.mapInPandas(decode, schema="asset_id bigint, width int, height int")


def frame_sample(
    df: DataFrame, n_frames: int = 4, content_col: str = "content"
) -> DataFrame:
    """STUB video frame sampling: deterministically slices the payload into
    ``n_frames`` equal chunks (a real implementation seeks keyframes; the
    explode-to-frames schema and batch loop are the production shape)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_chunks = [], [], []
            for asset_id, blob in zip(pdf["asset_id"], pdf[content_col]):
                step = max(1, len(blob) // n_frames)
                for i in range(n_frames):
                    out_ids.append(asset_id)
                    out_idx.append(i)
                    out_chunks.append(bytes(blob[i * step : (i + 1) * step]))
            yield pd.DataFrame(
                {"asset_id": out_ids, "frame_idx": out_idx, "frame": out_chunks}
            )

    return df.mapInPandas(
        sample, schema="asset_id bigint, frame_idx int, frame binary"
    )


def resize_raw(
    df: DataFrame,
    out_w: int,
    out_h: int,
    content_col: str = "content",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """REAL nearest-neighbor resize over raw single-channel byte buffers
    (row-major width×height grids) — numpy-only, so unlike decode_image
    this path executes in this container. Codec-backed images decode to
    exactly this representation, making resize_raw the post-decode stage
    of the production chain (decode → resize → featurize).

    Nearest-neighbor index math is integer-exact (src = i*src_dim //
    out_dim), so outputs are bit-deterministic. Rows whose payload length
    does not equal width*height yield ok=false with a NULL payload rather
    than poisoning the batch — per-row validation, not per-batch failure.
    """
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = None  # per-(h,w) cache of gather indexes across the batch
        cache: dict[tuple[int, int], tuple] = {}
        for pdf in batches:
            ids, blobs, oks = [], [], []
            for asset_id, blob, w, h in zip(
                pdf["asset_id"], pdf[content_col], pdf[width_col], pdf[height_col]
            ):
                ids.append(asset_id)
                if w is None or h is None or w <= 0 or h <= 0 or len(blob) != w * h:
                    blobs.append(None)
                    oks.append(False)
                    continue
                key = (int(h), int(w))
                if key not in cache:
                    ys = (np.arange(out_h) * key[0]) // out_h
                    xs = (np.arange(out_w) * key[1]) // out_w
                    cache[key] = (ys, xs)
                ys, xs = cache[key]
                grid = np.frombuffer(blob, dtype=np.uint8).reshape(key)
                blobs.append(grid[np.ix_(ys, xs)].tobytes())
                oks.append(True)
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "content": blobs,
                    "width": out_w,
                    "height": out_h,
                    "ok": oks,
                }
            )

    return df.mapInPandas(
        resize,
        schema="asset_id bigint, content binary, width int, height int,"
        " ok boolean",
    )
