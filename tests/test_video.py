"""AVI mux/demux + real frame sampling (multimodal/video.py) and the
fake=False path of sample_blob_frames."""

from __future__ import annotations

import numpy as np
import pytest

from sparkstreaming_spark.multimodal.video import (
    decode_avi_frames,
    encode_avi_rgb,
    sample_avi_frames,
)


def _frames(n=5, h=9, w=11, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)


def test_avi_roundtrip_exact():
    """Uncompressed DIB is lossless: decode(encode(x)) == x bit-exactly,
    including odd widths that exercise the 4-byte row stride padding."""
    for w in (11, 12, 13, 16):
        f = _frames(w=w)
        dec, fps = decode_avi_frames(encode_avi_rgb(f, fps=24))
        assert fps == 24.0
        assert np.array_equal(dec, f), f"w={w}"


def test_avi_rejects_non_avi():
    with pytest.raises(ValueError):
        decode_avi_frames(b"RIFF\x00\x00\x00\x00WAVE")


def test_sample_avi_frames_uniform():
    f = _frames(n=10)
    stats = sample_avi_frames(encode_avi_rgb(f), n_samples=4)
    assert [s["frame_idx"] for s in stats] == [0, 2, 5, 7]
    for s in stats:
        expect = float(f[s["frame_idx"], :, :, 0].astype("float64").mean())
        assert abs(s["px_mean"] - expect) < 1e-6


def test_sample_blob_frames_real_avi(spark):
    """fake=False must demux real AVI blobs: n_frames rows per blob,
    frame md5s matching the source arrays."""
    import hashlib

    from pyspark.sql import functions as F  # noqa: F401

    from sparkstreaming_spark.multimodal.blobs import sample_blob_frames

    f1, f2 = _frames(n=8, seed=1), _frames(n=6, seed=2)
    df = spark.createDataFrame(
        [(1, bytearray(encode_avi_rgb(f1))), (2, bytearray(encode_avi_rgb(f2)))],
        "id bigint, blob binary",
    )
    rows = sample_blob_frames(df, "id", n_frames=4, fake=False).collect()
    assert len(rows) == 8
    got = {(r.id, r.frame_idx): r.frame_md5 for r in rows}
    for j in range(4):
        assert got[(1, j)] == hashlib.md5(f1[j * 8 // 4].tobytes()).hexdigest()
        assert got[(2, j)] == hashlib.md5(f2[j * 6 // 4].tobytes()).hexdigest()


def test_compressed_avi_raises():
    """An inter-frame fourcc (H264) must hit the documented codec
    boundary; MJPG no longer raises there (jpeg.py decodes it) — but an
    MJPG stream whose chunks are not actual JPEGs fails loudly, not
    silently."""
    data = bytearray(encode_avi_rgb(_frames(n=2)))
    # biCompression lives 16 bytes into the strf body
    strf_at = bytes(data).find(b"strf")
    body = strf_at + 8
    data[body + 16 : body + 20] = b"H264"
    with pytest.raises(NotImplementedError):
        decode_avi_frames(bytes(data))
    data[body + 16 : body + 20] = b"MJPG"
    with pytest.raises(ValueError, match="JPEG"):
        decode_avi_frames(bytes(data))


def test_avi_top_down_dib_decodes_upright():
    """Negative biHeight = top-down DIB: rows are stored in display
    order and must NOT be flipped. Built by storing pre-flipped rows
    (so the payload is literally top-down) and patching biHeight to -h
    in the strf BITMAPINFOHEADER."""
    import struct

    f = _frames(n=3, h=6, w=8)
    data = bytearray(encode_avi_rgb(f[:, ::-1], fps=10))
    i = data.index(b"strf")
    # BITMAPINFOHEADER: biSize(4) biWidth(4) biHeight(4) at body+8
    (bh,) = struct.unpack_from("<i", data, i + 8 + 8)
    assert bh == 6
    struct.pack_into("<i", data, i + 8 + 8, -bh)
    dec, _fps = decode_avi_frames(bytes(data))
    assert np.array_equal(dec, f)
