"""Pure-numpy BMP decode: round-trips, the padding/bottom-up/BGR gotchas,
and per-row rejection of payloads the decoder does not support."""

from __future__ import annotations

import numpy as np
import pytest

from high_volume_market_data_pipeline_spark.multimodal.bmp import (
    decode_bmp,
    decode_bmp_bytes,
    encode_bmp,
    synthetic_bmp_assets,
)


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 8])  # every padding residue
@pytest.mark.parametrize("channels", [1, 3])
def test_roundtrip_all_padding_residues(w, channels):
    h = 3
    shape = (h, w) if channels == 1 else (h, w, 3)
    rng = np.random.default_rng(w * 10 + channels)
    px = rng.integers(0, 256, size=shape, dtype=np.uint8)
    got, ch = decode_bmp_bytes(encode_bmp(px))
    assert ch == channels
    np.testing.assert_array_equal(got, px)


def test_bottom_up_vs_top_down_row_order():
    """A positive DIB height stores rows bottom-up; flipping the sign to
    negative (top-down) must flip the decoded image — proving the decoder
    honors row order instead of accidentally double-flipping."""
    px = np.arange(12, dtype=np.uint8).reshape(4, 3)
    blob = bytearray(encode_bmp(px))
    got, _ = decode_bmp_bytes(bytes(blob))
    np.testing.assert_array_equal(got, px)
    # byte 22 = DIB height (int32 LE); negate it without touching pixels
    import struct

    (h,) = struct.unpack_from("<i", blob, 22)
    struct.pack_into("<i", blob, 22, -h)
    flipped, _ = decode_bmp_bytes(bytes(blob))
    np.testing.assert_array_equal(flipped, px[::-1])


def test_bgr_channel_order_on_disk():
    """24-bit BMP stores B,G,R: a pure-red image's first pixel byte on
    disk must be 0 (blue), and the decode must return RGB."""
    px = np.zeros((1, 1, 3), dtype=np.uint8)
    px[0, 0] = (200, 10, 30)
    blob = encode_bmp(px)
    offset = int.from_bytes(blob[10:14], "little")
    assert list(blob[offset : offset + 3]) == [30, 10, 200]  # B,G,R
    got, _ = decode_bmp_bytes(blob)
    np.testing.assert_array_equal(got, px)


@pytest.mark.parametrize(
    "blob",
    [
        None,
        b"",
        b"PNG\x89 not a bmp at all, padded to header length....." * 3,
        encode_bmp(np.zeros((4, 4), dtype=np.uint8))[:-8],  # truncated grid
    ],
)
def test_unsupported_payloads_return_none(blob):
    assert decode_bmp_bytes(blob) is None


def test_decode_bmp_dataframe_per_row_validation(spark):
    """The mapInPandas stage decodes good rows and marks bad rows
    ok=false with NULL stats — one poisoned payload never fails a batch."""
    good = encode_bmp((np.arange(24, dtype=np.int64) % 256).astype(
        np.uint8
    ).reshape(4, 6))
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a bmp")), (3, None)],
        "asset_id long, content binary",
    )
    rows = {r["asset_id"]: r for r in decode_bmp(df).collect()}
    assert rows[1]["ok"] and (rows[1]["width"], rows[1]["height"]) == (6, 4)
    assert rows[1]["channels"] == 1
    assert rows[1]["sum_pixels"] == sum(i % 256 for i in range(24))
    for bad in (2, 3):
        assert rows[bad]["ok"] is False
        assert rows[bad]["sum_pixels"] is None


def test_synthetic_assets_match_closed_form(spark):
    """The fixture generator + decoder agree with the closed-form integer
    stats the DuckDB oracle computes — the exact contract the registered
    query relies on."""
    ids = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    decoded = decode_bmp(synthetic_bmp_assets(ids)).collect()
    assert len(decoded) == 40 and all(r["ok"] for r in decoded)
    for r in decoded:
        i = r["asset_id"]
        w, h = 4 + i % 9, 3 + i % 5
        ch = 1 if i % 2 == 0 else 3
        n = w * h * ch
        assert (r["width"], r["height"], r["channels"]) == (w, h, ch)
        assert r["sum_pixels"] == (n // 256) * 32640 + (n % 256) * (n % 256 - 1) // 2


def test_colored_palette_applied_as_rgb():
    """An 8-bit BMP with a NON-gray color table must decode to (h, w, 3)
    RGB intensities — raw palette indexes are wrong pixel values for any
    palette that is not identity gray (the r8 ADVICE finding)."""
    import struct

    px = np.arange(12, dtype=np.uint8).reshape(3, 4) * 10
    blob = bytearray(encode_bmp(px))
    pal = np.zeros((256, 4), dtype=np.uint8)
    pal[:, 0] = np.arange(256)  # B = i
    pal[:, 1] = 255 - np.arange(256)  # G = 255 - i
    pal[:, 2] = np.arange(256) // 2  # R = i // 2
    blob[54 : 54 + 1024] = pal.tobytes()
    got, ch = decode_bmp_bytes(bytes(blob))
    assert ch == 3 and got.shape == (3, 4, 3)
    np.testing.assert_array_equal(got[:, :, 0], px // 2)  # R
    np.testing.assert_array_equal(got[:, :, 1], 255 - px)  # G
    np.testing.assert_array_equal(got[:, :, 2], px)  # B
    # and a truncated color table: indexes beyond colors_used are corrupt
    struct.pack_into("<I", blob, 46, 4)  # DIB colors_used = 4, px max = 110
    assert decode_bmp_bytes(bytes(blob)) is None
    small = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    blob2 = bytearray(encode_bmp(small))
    struct.pack_into("<I", blob2, 46, 4)  # 4-entry gray table covers 0..3
    got2, ch2 = decode_bmp_bytes(bytes(blob2))
    assert ch2 == 1
    np.testing.assert_array_equal(got2, small)


def test_kernels_pickle_by_value_for_foreign_cwd_workers():
    """The codec pair must deserialize WITHOUT importing this repo package
    — Python workers inherit the driver cwd, and a driver launched outside
    the repo root cannot re-import repo modules referenced by name. The
    factory gives the kernels <locals> qualnames so cloudpickle ships them
    by value (the r8 image_decode_stats portability defect)."""
    from pyspark import cloudpickle

    assert "<locals>" in encode_bmp.__qualname__
    assert "<locals>" in decode_bmp_bytes.__qualname__
    payload = cloudpickle.dumps((encode_bmp, decode_bmp_bytes))
    # Reconstructing must not import the repo package: hide it and load.
    import subprocess
    import sys

    with open("/tmp/_bmp_kernel_payload.pkl", "wb") as f:
        f.write(payload)
    code = (
        "import sys\n"
        "sys.path = [p for p in sys.path if 'repo' not in p]\n"
        "sys.modules.pop('high_volume_market_data_pipeline_spark', None)\n"
        "from pyspark import cloudpickle\n"
        "import numpy as np\n"
        "enc, dec = cloudpickle.load(open('/tmp/_bmp_kernel_payload.pkl','rb'))\n"
        "px = (np.arange(24) % 256).astype(np.uint8).reshape(4, 6)\n"
        "got, ch = dec(enc(px))\n"
        "assert ch == 1 and (got == px).all()\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd="/tmp", capture_output=True, text=True
    )
    assert proc.returncode == 0, proc.stderr


def test_custom_palette_encode_decode_and_short_table_overrun():
    """encode_bmp(palette=...) writes the given RGB table verbatim with
    colors_used set to its length; decode maps indices through it, and
    an index at-or-past the declared table length is per-row invalid."""
    k = np.arange(64, dtype=np.int64)
    palette = np.stack(
        [k % 256, (2 * k + 1) % 256, (3 * k + 2) % 256], axis=1
    ).astype(np.uint8)
    idx = np.arange(12, dtype=np.uint8).reshape(3, 4)
    px, channels = decode_bmp_bytes(encode_bmp(idx, palette))
    assert channels == 3 and px.shape == (3, 4, 3)
    assert (px.reshape(-1, 3) == palette[idx.reshape(-1)]).all()
    # Σ(6k+3) over k=0..n-1 = 3n² — the closed form the oracle uses
    n = idx.size
    assert int(px.astype(np.int64).sum()) == 3 * n * n

    # max index 63 is the last valid entry; 64 overruns the short table
    ok_edge = np.full((2, 2), 63, dtype=np.uint8)
    assert decode_bmp_bytes(encode_bmp(ok_edge, palette)) is not None
    bad = np.full((2, 2), 64, dtype=np.uint8)
    assert decode_bmp_bytes(encode_bmp(bad, palette)) is None
