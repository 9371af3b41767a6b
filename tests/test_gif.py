"""GIF codec tests (multimodal/gif.py): LZW roundtrips, width-bump and
dictionary-reset coverage, interlace, external conformance sample."""

import base64
import struct

import numpy as np
import pytest

from sparkstreaming_spark.multimodal.gif import (
    _INTERLACE_PASSES,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_rgb,
    encode_gif,
)


def _noise(shape, n_colors, seed=0):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n_colors, shape).astype(np.uint8)
    pal = rng.integers(0, 256, (n_colors, 3)).astype(np.uint8)
    return idx, pal


@pytest.mark.parametrize("shape,colors", [
    ((1, 1), 1),
    ((7, 13), 2),
    ((33, 47), 16),
    ((60, 61), 100),   # non-power-of-2 palette
    ((80, 90), 256),   # 12-bit codes + dictionary reset
])
def test_roundtrip(shape, colors):
    idx, pal = _noise(shape, colors, seed=colors)
    blob = encode_gif(idx, pal)
    didx, dpal = decode_gif(blob)
    assert np.array_equal(didx, idx)
    assert np.array_equal(dpal[: len(pal)], pal)
    assert np.array_equal(decode_gif_rgb(blob), dpal[idx])


def test_repetitive_image_compresses():
    idx = np.tile(np.arange(16, dtype=np.uint8), (64, 16))
    pal = np.arange(48, dtype=np.uint8).reshape(16, 3)
    blob = encode_gif(idx, pal)
    assert np.array_equal(decode_gif(blob)[0], idx)
    assert len(blob) < idx.size // 4  # LZW earns >4x on periodic data


def test_lzw_dictionary_reset_beyond_4096():
    # unique-ish pixel stream long enough to overflow the 12-bit table
    idx = (np.arange(30000) * 37 % 256).astype(np.uint8)
    payload = _lzw_encode(idx, 8)
    out = _lzw_decode(payload, 8, len(idx))
    assert np.array_equal(out, idx)


def test_interlaced_image_decodes():
    idx, pal = _noise((29, 16), 8, seed=3)
    blob = bytearray(encode_gif(idx, pal))
    # rewrite the image as interlaced: permute rows into pass order and
    # set the interlace flag in the image descriptor
    h = idx.shape[0]
    order = [y for start, step in _INTERLACE_PASSES for y in range(start, h, step)]
    reordered = idx[order]
    inter = bytearray(encode_gif(reordered, pal))
    # image descriptor starts right after header(6)+lsd(7)+gct(3*8)
    desc_off = 6 + 7 + 3 * 8
    assert inter[desc_off] == 0x2C
    inter[desc_off + 9] |= 0x40  # packed byte: interlace flag
    didx, _ = decode_gif(bytes(inter))
    assert np.array_equal(didx, idx)
    _ = blob


def test_extensions_are_skipped():
    idx, pal = _noise((5, 5), 4, seed=9)
    blob = encode_gif(idx, pal)
    # splice a graphic-control extension between screen and image
    gce = b"\x21\xf9\x04\x01\x00\x00\x00\x00"
    cut = 6 + 7 + 3 * 4
    spliced = blob[:cut] + gce + blob[cut:]
    didx, _ = decode_gif(spliced)
    assert np.array_equal(didx, idx)


def test_local_color_table_wins():
    idx, pal = _noise((4, 4), 4, seed=2)
    blob = bytearray(encode_gif(idx, pal))
    desc_off = 6 + 7 + 3 * 4
    # enable a local color table (size bits 2 -> 4 entries) after descriptor
    blob[desc_off + 9] |= 0x80 | 0x01
    lct = np.flipud(np.zeros((4, 3), dtype=np.uint8) + np.arange(4)[:, None]).astype(np.uint8)
    spliced = bytes(blob[: desc_off + 10]) + lct.tobytes() + bytes(blob[desc_off + 10 :])
    didx, dpal = decode_gif(spliced)
    assert np.array_equal(didx, idx)
    assert np.array_equal(dpal, lct)


def test_external_conformance_1x1_transparent():
    ext = base64.b64decode(
        "R0lGODlhAQABAIAAAP///wAAACH5BAEAAAAALAAAAAABAAEAAAICRAEAOw=="
    )
    idx, pal = decode_gif(ext)
    assert idx.shape == (1, 1) and idx[0, 0] == 0
    assert tuple(pal[0]) == (255, 255, 255)


def test_rejects_non_gif_and_truncated():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"\x89PNG\r\n\x1a\n")
    idx, pal = _noise((10, 10), 16, seed=1)
    blob = encode_gif(idx, pal)
    with pytest.raises(ValueError):
        decode_gif(blob[: len(blob) // 2] + b"\x00\x3b")


def test_palette_validation():
    with pytest.raises(ValueError, match="palette"):
        encode_gif(np.full((2, 2), 5, dtype=np.uint8),
                   np.zeros((4, 3), dtype=np.uint8))


def test_header_fields():
    idx, pal = _noise((17, 23), 16, seed=4)
    blob = encode_gif(idx, pal)
    assert blob[:6] == b"GIF89a"
    w, h = struct.unpack("<HH", blob[6:10])
    assert (w, h) == (23, 17)
    assert blob[-1] == 0x3B


# ------------------------------------------------------------ animation


def _anim_pal():
    return np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)


def test_animation_roundtrip_frame_count_and_delays():
    from sparkstreaming_spark.multimodal.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    f = np.zeros((4, 5), np.uint8)
    blob = encode_gif_animation(
        [f, f + 1, f + 2], _anim_pal(), delays_cs=[5, 10, 15], loop=3
    )
    out = decode_gif_frames(blob)
    assert (out["width"], out["height"]) == (5, 4)
    assert out["loop"] == 3
    assert [fr["delay_cs"] for fr in out["frames"]] == [5, 10, 15]
    assert np.array_equal(out["frames"][1]["rgb"][0, 0], [255, 0, 0])


def test_animation_subrect_composes_over_previous():
    from sparkstreaming_spark.multimodal.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    base = np.full((6, 6), 1, np.uint8)          # all red
    patch = np.full((2, 3), 2, np.uint8)          # green rect
    blob = encode_gif_animation(
        [base, patch], _anim_pal(), offsets=[(0, 0), (2, 1)], disposals=[1, 1]
    )
    frames = decode_gif_frames(blob)["frames"]
    c2 = frames[1]["rgb"]
    assert np.array_equal(c2[2:4, 1:4], np.full((2, 3, 3), [0, 255, 0]))
    assert np.array_equal(c2[0, 0], [255, 0, 0])  # untouched area persists


def test_disposal_3_restores_previous_canvas():
    from sparkstreaming_spark.multimodal.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    base = np.full((4, 4), 1, np.uint8)
    flash = np.full((2, 2), 3, np.uint8)
    after = np.full((1, 1), 2, np.uint8)
    blob = encode_gif_animation(
        [base, flash, after],
        _anim_pal(),
        offsets=[(0, 0), (1, 1), (0, 0)],
        disposals=[1, 3, 1],
    )
    frames = decode_gif_frames(blob)["frames"]
    assert np.array_equal(frames[1]["rgb"][1, 1], [0, 0, 255])   # flash drawn
    # flash region restored to base before frame 3
    assert np.array_equal(frames[2]["rgb"][1, 1], [255, 0, 0])
    assert np.array_equal(frames[2]["rgb"][0, 0], [0, 255, 0])


def test_disposal_2_restores_background():
    from sparkstreaming_spark.multimodal.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    base = np.full((4, 4), 1, np.uint8)
    blip = np.full((2, 2), 2, np.uint8)
    tail = np.full((1, 1), 3, np.uint8)
    blob = encode_gif_animation(
        [base, blip, tail],
        _anim_pal(),
        offsets=[(0, 0), (0, 0), (3, 3)],
        disposals=[1, 2, 1],
        background=0,
    )
    frames = decode_gif_frames(blob)["frames"]
    # after frame 2's disposal the blip rect is background black
    assert np.array_equal(frames[2]["rgb"][0, 0], [0, 0, 0])
    assert np.array_equal(frames[2]["rgb"][3, 0], [255, 0, 0])  # outside rect


def test_transparent_index_preserves_underlying_pixels():
    from sparkstreaming_spark.multimodal.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    base = np.full((3, 3), 1, np.uint8)
    over = np.array([[2, 0], [0, 2]], np.uint8)   # 0 is transparent
    blob = encode_gif_animation(
        [base, over],
        _anim_pal(),
        offsets=[(0, 0), (1, 1)],
        transparents=[None, 0],
    )
    c2 = decode_gif_frames(blob)["frames"][1]["rgb"]
    assert np.array_equal(c2[1, 1], [0, 255, 0])   # drawn
    assert np.array_equal(c2[1, 2], [255, 0, 0])   # transparent -> base red
    assert np.array_equal(c2[2, 1], [255, 0, 0])
    assert np.array_equal(c2[2, 2], [0, 255, 0])


def test_first_frame_decode_agrees_with_single_image_api():
    from sparkstreaming_spark.multimodal.gif import (
        decode_gif_frames,
        decode_gif_rgb,
        encode_gif_animation,
    )

    rng = np.random.default_rng(7)
    f0 = rng.integers(0, 4, (5, 7)).astype(np.uint8)
    blob = encode_gif_animation([f0, f0], _anim_pal())
    assert np.array_equal(
        decode_gif_frames(blob)["frames"][0]["rgb"], decode_gif_rgb(blob)
    )


def test_animation_validates_rects_and_lists():
    from sparkstreaming_spark.multimodal.gif import encode_gif_animation

    f = np.zeros((4, 4), np.uint8)
    with pytest.raises(ValueError, match="exceeds"):
        encode_gif_animation([f], _anim_pal(), offsets=[(3, 3)], screen=(5, 5))
    with pytest.raises(ValueError, match="match the frame count"):
        encode_gif_animation([f, f], _anim_pal(), delays_cs=[1])


def test_lzw_dictionary_reset_roundtrip():
    # >4096 distinct-ish codes force the 12-bit dictionary reset mid-stream
    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(160, 160)).astype(np.uint8)
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    idx, _ = decode_gif(encode_gif(img, pal))
    assert np.array_equal(idx, img)


def test_lzw_code_zero_prefix_roundtrip():
    # prefix code 0 is falsy — regression guard for the int-keyed
    # encoder's no-prefix sentinel
    import numpy as np

    img = np.zeros((40, 40), dtype=np.uint8)
    img[0, 1] = 1
    pal = np.stack([np.arange(256)] * 3, axis=1).astype(np.uint8)
    idx, _ = decode_gif(encode_gif(img, pal))
    assert np.array_equal(idx, img)
