"""Baseline JPEG codec (multimodal/jpeg.py) and MJPEG-in-AVI decode."""

from __future__ import annotations

import numpy as np
import pytest

from sparkstreaming_spark.multimodal.jpeg import decode_jpeg, encode_jpeg


def _gradient(h=24, w=40):
    i = np.arange(h).reshape(-1, 1)
    j = np.arange(w).reshape(1, -1)
    return np.stack(
        [
            np.minimum(4 * i + 2 * j, 255),
            np.minimum(3 * i + 3 * j, 255),
            np.minimum(2 * i + 5 * j, 255),
        ],
        axis=2,
    ).astype(np.uint8)


@pytest.mark.parametrize("sub", [(1, 1), (2, 1), (2, 2)])
@pytest.mark.parametrize("ri", [0, 2])
def test_roundtrip_all_modes(sub, ri):
    """Every (subsampling, restart) combination decodes back close to the
    source: smooth gradients survive quantization with ≤5 absolute error
    at q90."""
    img = _gradient(21, 37)  # odd dims exercise edge padding/cropping
    dec = decode_jpeg(
        encode_jpeg(img, 90, subsampling=sub, restart_interval=ri)
    )
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 5, (sub, ri, err.max())


def test_flat_image_is_exact():
    """A uniform image has only a DC coefficient — decode is bit-exact."""
    flat = np.full((16, 16, 3), 128, np.uint8)
    assert np.array_equal(decode_jpeg(encode_jpeg(flat, 85)), flat)


def test_quality_monotone():
    """Lower quality → coarser quantization → error can only grow (on a
    fixed busy image)."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    errs = []
    for q in (95, 75, 40, 10):
        dec = decode_jpeg(encode_jpeg(img, q))
        errs.append(np.abs(dec.astype(int) - img.astype(int)).mean())
    assert errs == sorted(errs), errs


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n")
    # flip the SOF0 marker to SOF2 (progressive) → named rejection
    enc = bytearray(encode_jpeg(_gradient(8, 8), 90))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(bytes(enc))


def test_mjpeg_avi_roundtrip():
    """MJPG AVI: mux per-frame JPEGs, demux through decode_avi_frames —
    fps and frame count exact, pixels within codec tolerance."""
    from sparkstreaming_spark.multimodal.video import (
        decode_avi_frames,
        encode_avi_mjpeg,
    )

    base = _gradient(24, 32)
    frames = np.stack(
        [np.minimum(base.astype(int) + 9 * f, 255) for f in range(5)]
    ).astype(np.uint8)
    dec, fps = decode_avi_frames(encode_avi_mjpeg(frames, fps=15, quality=92))
    assert fps == 15.0
    assert dec.shape == frames.shape
    assert np.abs(dec.astype(int) - frames.astype(int)).max() <= 4


def test_mjpeg_avi_through_blob_pipeline(spark):
    """sample_blob_frames(fake=False) now decodes MJPG AVIs: the blob
    column carries a compressed clip and the Spark pass reports real
    per-frame stats."""
    from sparkstreaming_spark.multimodal.blobs import sample_blob_frames
    from sparkstreaming_spark.multimodal.video import encode_avi_mjpeg

    import hashlib

    flat = np.full((4, 16, 16, 3), 77, np.uint8)
    avi = encode_avi_mjpeg(flat, fps=10, quality=90)
    df = spark.createDataFrame(
        [(1, bytearray(avi))], "doc_id bigint, blob binary"
    )
    rows = sample_blob_frames(
        df, "doc_id", blob_col="blob", n_frames=2, fake=False
    ).collect()
    assert len(rows) == 2
    # a flat frame is DC-only → JPEG decode is bit-exact → known md5
    want = hashlib.md5(flat[0].tobytes()).hexdigest()
    for r in rows:
        assert r.n_bytes == 16 * 16 * 3
        assert r.frame_md5 == want
