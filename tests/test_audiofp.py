"""Acoustic fingerprint (dedup/audiofp.py): fixed-point table
correctness, determinism, sensitivity structure, FLAC-roundtrip
invariance (lossless codec must not move the fingerprint)."""

import math

import numpy as np
import pytest

from sparkstreaming_spark.dedup.audiofp import (
    AFP_COS,
    AFP_SCALE,
    AFP_SIN,
    N_SAMPLES,
    _COS,
    audio_fingerprint64,
)


def _clip(base: int, r: int = 0) -> np.ndarray:
    f = np.arange(16).reshape(-1, 1)
    b = np.arange(8).reshape(1, -1)
    a = (
        40
        + ((base * (b + 3) + f * (1 + (base + b) % 3)) * 7) % 97
        + r * ((b * 5 + base) % 3 - 1)
    )
    n = np.arange(128)
    noise = (n * n * (1 + base % 5)) % 31
    raw = a @ _COS.T
    return ((raw + (1 << 20)) // 16 - (1 << 16) + noise).astype(np.int16).reshape(-1)


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_table_values():
    for n, b in ((0, 0), (13, 2), (127, 7)):
        assert AFP_COS[n][b] == round(
            AFP_SCALE * math.cos(2 * math.pi * (b + 1) * n / 128)
        )
        assert AFP_SIN[n][b] == round(
            AFP_SCALE * math.sin(2 * math.pi * (b + 1) * n / 128)
        )


def test_deterministic_and_64bit():
    x = _clip(9)
    h1, h2 = audio_fingerprint64(x), audio_fingerprint64(x.copy())
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)


def test_variant_nudge_small_distance():
    # the doc_id%3 amplitude nudge used by doc_audio_neardup
    assert _ham(audio_fingerprint64(_clip(5, 0)), audio_fingerprint64(_clip(5, 2))) <= 6


def test_different_profiles_far_apart():
    assert _ham(audio_fingerprint64(_clip(0)), audio_fingerprint64(_clip(11))) >= 8


def test_flac_roundtrip_preserves_fingerprint():
    from sparkstreaming_spark.multimodal.flac import decode_flac, encode_flac

    x = _clip(3, 1)
    dec, rate = decode_flac(encode_flac(x, 16000, blocksize=256))
    assert rate == 16000
    assert np.array_equal(dec, x)
    assert audio_fingerprint64(dec) == audio_fingerprint64(x)


def test_rejects_wrong_length():
    with pytest.raises(ValueError):
        audio_fingerprint64(np.zeros(100, dtype=np.int16))
    assert N_SAMPLES == 2048
