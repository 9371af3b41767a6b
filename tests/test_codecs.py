"""Pure-Python image codec tests (multimodal/codecs.py) + the real
(fake=False) decode/resize paths through the Spark blob operators."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from sparkstreaming_spark.multimodal.codecs import (
    PNG_MAGIC,
    decode_bmp,
    decode_image,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_png,
    encode_ppm,
    resize_nearest,
)


def _rand(h, w, c, seed):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


def test_ppm_roundtrip_rgb_and_grey():
    rgb = _rand(7, 5, 3, 1)
    assert np.array_equal(decode_ppm(encode_ppm(rgb)), rgb)
    grey = _rand(4, 9, 1, 2)
    assert np.array_equal(decode_ppm(encode_ppm(grey)), grey)


def test_ppm_comment_and_magic_dispatch():
    rgb = _rand(2, 2, 3, 3)
    raw = encode_ppm(rgb)
    commented = b"P6\n# a comment\n2 2\n255\n" + raw.split(b"255\n", 1)[1]
    assert np.array_equal(decode_image(commented), rgb)


def test_bmp_roundtrip_with_padding():
    # width 3 -> 9-byte rows padded to 12: exercises stride handling
    rgb = _rand(5, 3, 3, 4)
    assert np.array_equal(decode_bmp(encode_bmp(rgb)), rgb)
    assert np.array_equal(decode_image(encode_bmp(rgb)), rgb)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(channels):
    img = _rand(6, 4, channels, channels)
    assert np.array_equal(decode_png(encode_png(img)), img)


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Build a PNG applying the given per-row filter types FORWARD using
    the spec's filtering equations — independent of the decoder's
    unfiltering code, so roundtrip equality is a real check."""
    h, w, nch = img.shape
    bpp = nch
    scan = bytearray()
    prev = np.zeros(w * nch, dtype=np.int32)
    for y in range(h):
        cur = img[y].reshape(-1).astype(np.int32)
        ft = filters[y]
        out = np.empty_like(cur)
        for i in range(len(cur)):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = (cur[i] - pred) & 0xFF
        scan += bytes([ft]) + out.astype(np.uint8).tobytes()
        prev = cur

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scan)))
        + chunk(b"IEND", b"")
    )


def test_png_all_five_filters_unfilter_correctly():
    img = _rand(5, 6, 3, 7)
    data = _png_with_filters(img, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(data), img)


def test_png_rejects_unsupported():
    img = _rand(2, 2, 3, 8)
    data = bytearray(encode_png(img))
    data[24] = 16  # bit depth byte in IHDR
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(bytes(data))
    with pytest.raises(ValueError, match="unsupported image format"):
        decode_image(b"GIF89a....")


def test_resize_nearest_shapes_and_identity():
    img = _rand(8, 8, 3, 9)
    assert np.array_equal(resize_nearest(img, 8, 8), img)
    small = resize_nearest(img, 4, 2)
    assert small.shape == (4, 2, 3)
    assert np.array_equal(small, img[::2][:, ::4])


def test_spark_real_decode_features_over_pixels(spark):
    """fake=False end-to-end in mapInPandas: features computed over the
    DECODED pixels of a real PNG, not its compressed file bytes."""
    from sparkstreaming_spark.multimodal import decode_blob_features

    img = np.full((4, 4, 3), 200, dtype=np.uint8)
    png = encode_png(img)
    df = spark.createDataFrame([(1, bytearray(png))], "doc_id long, blob binary")
    row = decode_blob_features(df, "doc_id", "blob", fake=False).first()
    assert row.n_bytes == len(png)
    assert row.mean_byte == 200.0  # pixel mean, not byte mean
    assert sum(row.byte_hist) == 4 * 4 * 3
    assert row.byte_hist[200 // 16] == 48


def test_spark_real_resize_roundtrips_as_ppm(spark):
    from sparkstreaming_spark.multimodal.blobs import resize_blob

    img = _rand(16, 16, 3, 10)
    df = spark.createDataFrame(
        [(1, bytearray(encode_ppm(img))), (2, bytearray(encode_png(img)))],
        "doc_id long, blob binary",
    )
    rows = resize_blob(df, "doc_id", "blob", out_len=8, fake=False).collect()
    for r in rows:
        out = decode_ppm(bytes(r.resized))
        assert out.shape == (8, 8, 3)
        assert np.array_equal(out, resize_nearest(img, 8, 8))
