"""WAV decode / resample / Spark audio-feature pass
(multimodal/audio.py)."""

from __future__ import annotations

import numpy as np
import pytest

from sparkstreaming_spark.multimodal.audio import (
    decode_wav,
    encode_wav,
    resample_linear,
)


def _sine(rate: int, seconds: float, hz: float = 440.0) -> np.ndarray:
    t = np.arange(int(rate * seconds)) / rate
    return np.sin(2 * np.pi * hz * t)


def test_wav_roundtrip_16bit():
    rate = 8000
    x = _sine(rate, 0.1)
    data = encode_wav((x * 32767).astype("int16"), rate)
    y, got_rate = decode_wav(data)
    assert got_rate == rate
    assert len(y) == len(x)
    assert float(np.max(np.abs(y - x))) < 1e-3  # 16-bit quantization


def test_resample_halves_and_doubles():
    rate = 8000
    x = _sine(rate, 0.05)
    down = resample_linear(x, rate, 4000)
    up = resample_linear(x, rate, 16000)
    assert len(down) == len(x) // 2
    assert len(up) == len(x) * 2
    # linear resample preserves a smooth signal closely
    back = resample_linear(down, 4000, 8000)
    assert float(np.mean(np.abs(back[: len(x)] - x))) < 0.05


def test_decode_wav_rejects_unsupported_width():
    with pytest.raises(Exception):
        decode_wav(b"RIFF....WAVE")


def test_audio_features_on_spark(spark):
    """End-to-end: WAV blobs through the Arrow decode pass — exact
    sample counts, rates, and resample lengths per row."""
    from sparkstreaming_spark.multimodal.audio import audio_features

    rows = []
    for i, (rate, secs) in enumerate([(8000, 0.10), (16000, 0.05), (44100, 0.02)]):
        x = (_sine(rate, secs) * 32767).astype("int16")
        rows.append((i, bytearray(encode_wav(x, rate))))
    df = spark.createDataFrame(rows, "id bigint, blob binary")
    got = {
        r.id: r
        for r in audio_features(df, "id", "blob", target_rate=16000).collect()
    }
    assert got[0].sample_rate == 8000
    assert got[0].n_samples == 800
    assert got[0].n_resampled == 1600
    assert got[1].sample_rate == 16000
    assert got[1].n_resampled == got[1].n_samples  # already at target
    assert got[2].sample_rate == 44100
    assert abs(got[2].duration_s - 0.02) < 1e-3
    for r in got.values():
        assert 0.5 < r.rms < 0.8  # sine RMS ≈ 0.707
        assert 0.9 < r.peak <= 1.0


def test_band_energy_matches_numpy(spark):
    """The Spark mapInPandas band energies must equal a direct NumPy
    computation on the same samples — and a pure low-frequency sine must
    concentrate its energy in the bottom band."""
    import numpy as np

    from sparkstreaming_spark.multimodal.audio import (
        audio_band_energy,
        encode_wav,
    )

    rate, n_fft, n_bands = 16000, 256, 8
    t = np.arange(rate // 2, dtype="float64") / rate
    x = np.sin(2 * np.pi * 220.0 * t)  # bin ~3.5 of 129 → band 0
    pcm = (x * 32767).astype("int16")
    df = spark.createDataFrame(
        [(0, bytearray(encode_wav(pcm, rate)))], "id bigint, blob binary"
    )
    row = audio_band_energy(df, "id", "blob", n_fft=n_fft, n_bands=n_bands).collect()[0]

    samples = pcm.astype("float64") / 32768.0
    n_frames = len(samples) // n_fft
    frames = samples[: n_frames * n_fft].reshape(n_frames, n_fft)
    spec = (np.abs(np.fft.rfft(frames, axis=1)) ** 2).mean(axis=0)
    n_bins = n_fft // 2 + 1
    edges = [round(i * n_bins / n_bands) for i in range(n_bands + 1)]
    expect = [
        round(float(np.log10(spec[edges[b]:edges[b + 1]].mean() + 1e-12)), 6)
        for b in range(n_bands)
    ]
    got = [getattr(row, f"band{b}") for b in range(n_bands)]
    assert got == expect
    assert row.n_frames == n_frames
    assert got[0] == max(got)  # 220 Hz lives in the bottom band


def test_band_energy_empty_blob_is_zero_frames(spark):
    df = spark.createDataFrame([(0, bytearray(b""))], "id bigint, blob binary")
    from sparkstreaming_spark.multimodal.audio import audio_band_energy

    row = audio_band_energy(df, "id", "blob", fake=True).collect()[0]
    assert row.n_frames == 0
    assert row.band0 == 0.0


def test_ima_adpcm_roundtrip_snr():
    """The compressed-audio codec contract (the PNG-closes-the-image-slot
    pattern): encode a sine to IMA-ADPCM WAV (fmt 0x11), decode it back —
    exact length/rate, ~4:1 size vs PCM, and SNR well above the ~25 dB
    a correct IMA implementation yields on a tonal signal."""
    from sparkstreaming_spark.multimodal.audio import (
        decode_wav_ima_adpcm,
        encode_wav_ima_adpcm,
    )

    rate = 16000
    x = _sine(rate, 0.5)
    pcm16 = (x * 10000).astype("int64")
    wav = encode_wav_ima_adpcm(pcm16, rate)
    assert len(wav) < 2 * len(pcm16) / 3.5  # genuinely compressed
    y, got_rate = decode_wav_ima_adpcm(wav)
    assert got_rate == rate
    assert len(y) == len(pcm16)
    orig = pcm16 / 32768.0
    err = y - orig
    snr = 10 * np.log10(float((orig**2).mean()) / float((err**2).mean()))
    assert snr > 25.0, f"IMA-ADPCM SNR too low: {snr:.1f} dB"


def test_decode_wav_dispatches_adpcm():
    """decode_wav must fall through to the ADPCM path for fmt-0x11 WAVs
    (the stdlib wave module refuses compressed containers)."""
    from sparkstreaming_spark.multimodal.audio import encode_wav_ima_adpcm

    rate = 8000
    pcm16 = (_sine(rate, 0.1) * 12000).astype("int64")
    y, got_rate = decode_wav(encode_wav_ima_adpcm(pcm16, rate))
    assert got_rate == rate
    assert len(y) == len(pcm16)


def test_adpcm_block_boundary_lengths():
    """Lengths that are off-by-one around the 505-samples-per-block
    boundary must roundtrip exactly (header sample + nibble padding)."""
    from sparkstreaming_spark.multimodal.audio import (
        decode_wav_ima_adpcm,
        encode_wav_ima_adpcm,
    )

    spb = (256 - 4) * 2 + 1
    for n in (1, spb - 1, spb, spb + 1, 2 * spb):
        pcm = (np.arange(n) % 200 * 50 - 5000).astype("int64")
        y, _ = decode_wav_ima_adpcm(encode_wav_ima_adpcm(pcm, 8000))
        assert len(y) == n, (n, len(y))


def test_audio_features_on_adpcm_blobs(spark):
    """End-to-end Spark pass over COMPRESSED blobs: audio_features
    decodes fmt-0x11 WAVs through the same Arrow mapInPandas path."""
    from sparkstreaming_spark.multimodal.audio import (
        audio_features,
        encode_wav_ima_adpcm,
    )

    rate = 8000
    rows = [
        (1, bytearray(encode_wav_ima_adpcm(
            (_sine(rate, 0.2) * 9000).astype("int64"), rate))),
        (2, bytearray(encode_wav_ima_adpcm(
            (_sine(rate, 0.1, hz=880.0) * 6000).astype("int64"), rate))),
    ]
    df = spark.createDataFrame(rows, "id bigint, blob binary")
    got = {r.id: r for r in audio_features(df, "id", target_rate=rate).collect()}
    assert got[1].sample_rate == rate
    assert got[1].n_samples == int(rate * 0.2)
    assert got[2].n_samples == int(rate * 0.1)
    assert 0.1 < got[1].rms < 0.3  # ~9000/32768 sine rms ≈ 0.194
