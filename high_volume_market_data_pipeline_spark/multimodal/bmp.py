"""Pure-numpy BMP encode/decode — a REAL image decode path with no codec
library (the container has no PIL): BMP's uncompressed BI_RGB frames are a
fixed header + a row-padded pixel grid, i.e. header parse + buffer reshape,
which numpy does exactly. The PIL-gated ``decode_image`` in binary_ops
stays the route for compressed codecs (JPEG/PNG); this module makes the
decode STAGE itself executable and testable in this environment.

Supported: 8-bit paletted (the color table is APPLIED: an all-gray palette
yields (h, w) intensities / channels=1, a colored palette yields (h, w, 3)
RGB / channels=3) and 24-bit BGR (channels=3), bottom-up or top-down,
BITMAPINFOHEADER (40-byte DIB) or larger, BI_RGB (no compression). Exactly
the subset a deterministic pipeline fixture needs; anything else — including
a pixel index outside the declared color table — reports ok=false per row
(never a batch failure — same per-row validation contract as ``resize_raw``).

Layout facts the decoder must honor (the classic BMP gotchas):
- every pixel ROW is padded to a 4-byte boundary on disk;
- a POSITIVE DIB height means bottom-up row order (the first disk row is
  the bottom image row); negative height means top-down;
- 24-bit pixels are B,G,R order, not RGB; palette entries are B,G,R,0;
- the pixel array starts at the offset named at byte 10, NOT right after
  the headers (the palette and gap bytes sit in between);
- colors_used == 0 in an 8-bit DIB means a FULL 256-entry palette.

Pickling contract: the public ``encode_bmp`` / ``decode_bmp_bytes`` are
built inside a factory so their ``__qualname__`` contains ``<locals>`` and
cloudpickle serializes them BY VALUE into the mapInPandas closures. A plain
module-level def pickles BY REFERENCE — Python workers then re-import this
repo package, which only resolves when the worker cwd (inherited from the
driver) happens to be the repo root. The kernels may only reference stdlib/
site-packages modules (struct, numpy) — importable from any cwd.

No reference counterpart (multimodal extension mandated by the driver).
"""

from __future__ import annotations

import struct

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

_FILE_FMT = "<2sIHHI"  # magic, file size, res1, res2, px offset (14 bytes)
# size, w, h, planes, bpp, compression, image size, x/y ppm, colors used,
# colors important (40 bytes)
_DIB_FMT = "<IiiHHIIiiII"


def _build_bmp_kernels():
    """Build the byte-level codec pair as <locals> closures so cloudpickle
    ships them by value inside Arrow kernels (module docstring, Pickling
    contract). Everything they touch is a closure constant or a stdlib/
    site-packages module — no repo-package name reaches the workers."""
    file_fmt, dib_fmt = _FILE_FMT, _DIB_FMT
    file_sz, dib_sz = struct.calcsize(_FILE_FMT), struct.calcsize(_DIB_FMT)

    def encode_bmp(
        pixels: "np.ndarray", palette: "np.ndarray | None" = None
    ) -> bytes:
        """Encode a (h, w) uint8 index/grayscale or (h, w, 3) uint8 RGB
        array as a standard bottom-up BI_RGB BMP (8-bit paletted, or
        24-bit BGR). For 2-D input, ``palette`` is an optional (k, 3)
        uint8 RGB color table written verbatim (``colors_used`` = k, the
        short-table form); None keeps the 256-entry identity-gray table.
        Byte-deterministic — the fixture generator for the decode
        queries and tests."""
        px = np.asarray(pixels, dtype=np.uint8)
        if px.ndim == 2:
            h, w = px.shape
            bpp = 8
            if palette is None:
                pal_rgb = np.repeat(
                    np.arange(256, dtype=np.uint8), 3
                ).reshape(256, 3)
            else:
                pal_rgb = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
            palette_n = pal_rgb.shape[0]
            rows = px
        elif px.ndim == 3 and px.shape[2] == 3:
            h, w = px.shape[:2]
            bpp, palette_n = 24, 0
            pal_rgb = np.empty((0, 3), dtype=np.uint8)
            rows = px[:, :, ::-1].reshape(h, w * 3)  # RGB -> disk BGR
        else:
            raise ValueError(
                f"encode_bmp: expected (h,w) or (h,w,3), got {px.shape}"
            )
        row_bytes = rows.shape[1]
        stride = (row_bytes + 3) & ~3  # rows pad to 4-byte boundaries
        padded = np.zeros((h, stride), dtype=np.uint8)
        padded[:, :row_bytes] = rows
        body = padded[::-1].tobytes()  # bottom-up: last image row first
        pal_disk = np.zeros((palette_n, 4), dtype=np.uint8)
        if palette_n:
            pal_disk[:, :3] = pal_rgb[:, ::-1]  # RGB -> disk BGRA, alpha 0
        px_offset = file_sz + dib_sz + palette_n * 4
        head = struct.pack(file_fmt, b"BM", px_offset + len(body), 0, 0, px_offset)
        dib = struct.pack(
            dib_fmt, dib_sz, w, h, 1, bpp, 0, len(body), 2835, 2835, palette_n, 0
        )
        return head + dib + pal_disk.tobytes() + body

    def decode_bmp_bytes(blob: bytes) -> "tuple[np.ndarray, int] | None":
        """Parse one BMP payload → (pixel array, channels), or None when the
        payload is not a BMP this decoder supports (wrong magic, compressed,
        unsupported bpp, truncated, or an 8-bit index outside the declared
        color table — per-row validation, never raise). 8-bit applies the
        palette: all-gray tables return (h, w) intensities, colored tables
        return (h, w, 3); 24-bit returns (h, w, 3). Color output is RGB."""
        if blob is None or len(blob) < file_sz + dib_sz:
            return None
        magic, _, _, _, px_offset = struct.unpack_from(file_fmt, blob, 0)
        if magic != b"BM":
            return None
        (dib_size, w, h, planes, bpp, comp, _isz, _xp, _yp, colors_used, _ci) = (
            struct.unpack_from(dib_fmt, blob, file_sz)
        )
        if dib_size < dib_sz or planes != 1 or comp != 0:
            return None
        if bpp not in (8, 24) or w <= 0 or h == 0:
            return None
        palette = None
        if bpp == 8:
            palette_n = colors_used if colors_used else 256
            pal_off = file_sz + dib_size  # table sits right after the DIB
            if palette_n > 256 or len(blob) < pal_off + palette_n * 4:
                return None
            palette = (
                np.frombuffer(blob, dtype=np.uint8, count=palette_n * 4,
                              offset=pal_off)
                .reshape(palette_n, 4)[:, 2::-1]  # disk BGR -> RGB
                .copy()
            )
        top_down = h < 0
        h = abs(h)
        row_bytes = w * (bpp // 8)
        stride = (row_bytes + 3) & ~3
        need = px_offset + stride * h
        if len(blob) < need:
            return None
        grid = (
            np.frombuffer(blob, dtype=np.uint8, count=stride * h,
                          offset=px_offset)
            .reshape(h, stride)[:, :row_bytes]
        )
        if not top_down:
            grid = grid[::-1]
        if bpp == 24:
            return grid.reshape(h, w, 3)[:, :, ::-1].copy(), 3  # BGR -> RGB
        if int(grid.max(initial=0)) >= palette.shape[0]:
            return None  # index beyond the color table: corrupt paletted file
        mapped = palette[grid]  # (h, w, 3) RGB intensities, table applied
        if bool((palette[:, 0] == palette[:, 1]).all()) and bool(
            (palette[:, 1] == palette[:, 2]).all()
        ):
            return mapped[:, :, 0].copy(), 1  # gray table: single channel
        return mapped.copy(), 3

    return encode_bmp, decode_bmp_bytes


encode_bmp, decode_bmp_bytes = _build_bmp_kernels()


def decode_bmp(
    df: DataFrame, content_col: str = "content", id_col: str = "asset_id"
) -> DataFrame:
    """Real image decode over mapInPandas Arrow batches: BMP bytes →
    (asset_id, width, height, channels, sum_pixels, ok). ``sum_pixels``
    is the exact int64 sum over decoded pixel values (padding excluded) —
    the downstream-checkable witness that the decoder read the grid, not
    just the header. Undecodable rows yield ok=false with NULL stats.

    The production chain is decode → resize_raw → featurize; this stage
    replaces the PIL-gated ``decode_image`` for uncompressed frames."""
    decode = decode_bmp_bytes  # <locals> closure: cloudpickle ships by value

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, cs, sums, oks = [], [], [], [], [], []
            for asset_id, blob in zip(pdf[id_col], pdf[content_col]):
                ids.append(asset_id)
                parsed = decode(blob)
                if parsed is None:
                    ws.append(None), hs.append(None), cs.append(None)
                    sums.append(None), oks.append(False)
                    continue
                px, channels = parsed
                hs.append(px.shape[0])
                ws.append(px.shape[1])
                cs.append(channels)
                sums.append(int(px.astype(np.int64).sum()))
                oks.append(True)
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "channels": pd.array(cs, dtype="Int32"),
                    "sum_pixels": pd.array(sums, dtype="Int64"),
                    "ok": oks,
                }
            )

    return df.mapInPandas(
        run,
        schema="asset_id bigint, width int, height int, channels int,"
        " sum_pixels bigint, ok boolean",
    )


def synthetic_bmp_assets(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic BMP fixtures keyed on the id — REAL encoded files
    (padding, palette, bottom-up rows), synthetic pixels: width/height/
    channels from id arithmetic and pixel byte i ≡ i mod 256 in row-major
    RGB/gray order. Both the dimensions and the pixel sum then have
    closed-form integer SQL (the DuckDB oracle for the decode query):

        n = w*h*channels
        sum = (n // 256) * 32640 + (n % 256) * (n % 256 - 1) // 2

    so a value-hash oracle can check a mapInPandas DECODE path end to
    end without an image library on the oracle side."""
    encode = encode_bmp  # <locals> closure: cloudpickle ships by value

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 4 + i % 9, 3 + i % 5
                channels = 1 if i % 2 == 0 else 3
                n = w * h * channels
                flat = (np.arange(n, dtype=np.int64) % 256).astype(np.uint8)
                px = flat.reshape((h, w) if channels == 1 else (h, w, 3))
                blobs.append(encode(px))
            yield pd.DataFrame({"asset_id": pdf[id_col], "content": blobs})

    return df.select(id_col).mapInPandas(
        gen, schema="asset_id bigint, content binary"
    )


def synthetic_palette_bmp_assets(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic COLORED-palette BMP fixtures — the oracle twin for
    the palette-application arithmetic (``decode_bmp_bytes`` maps indices
    through the color table; the identity-gray fixtures above cannot
    distinguish a decoder that skips the table). Per id: an 8-bit file
    with w = 4+i%9, h = 3+i%5 (so n = w·h ≤ 84 < 256 — no index wrap),
    pixel index k at position k, and palette entry k = (k, 2k+1, 3k+2):
    decoded RGB sum is Σ(6k+3) = 3n² in closed-form SQL, and a decoder
    that summed raw indices (n(n-1)/2) or returned gray would hash-miss.
    Docs with i % 7 == 3 declare a SHORT 64-entry table, so files whose
    max index ≥ 64 exercise the out-of-table → ok=false path — also
    SQL-expressible (i%7=3 AND n ≥ 65)."""
    encode = encode_bmp  # <locals> closure: cloudpickle ships by value

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = []
            for i in pdf[id_col]:
                i = int(i)
                w, h = 4 + i % 9, 3 + i % 5
                idx = (np.arange(w * h, dtype=np.int64) % 256).astype(
                    np.uint8
                ).reshape(h, w)
                palette_n = 64 if i % 7 == 3 else 256
                k = np.arange(palette_n, dtype=np.int64)
                palette = np.stack(
                    [k % 256, (2 * k + 1) % 256, (3 * k + 2) % 256], axis=1
                ).astype(np.uint8)
                blobs.append(encode(idx, palette))
            yield pd.DataFrame({"asset_id": pdf[id_col], "content": blobs})

    return df.select(id_col).mapInPandas(
        gen, schema="asset_id bigint, content binary"
    )
