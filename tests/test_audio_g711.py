"""G.711 μ-law / A-law codec tests (multimodal/audio.py, WAV fmt 6/7)."""

import numpy as np
import pytest

from sparkstreaming_spark.multimodal.audio import (
    alaw_decode,
    alaw_encode,
    decode_wav,
    decode_wav_g711,
    encode_wav_g711,
    ulaw_decode,
    ulaw_encode,
)


def test_alaw_code_roundtrip_all_256():
    b = np.arange(256, dtype=np.uint8)
    assert np.array_equal(alaw_encode(alaw_decode(b)), b)


def test_ulaw_code_roundtrip_all_but_negative_zero():
    b = np.arange(256, dtype=np.uint8)
    re = ulaw_encode(ulaw_decode(b))
    mismatch = np.nonzero(re != b)[0]
    # 0x7F is μ-law "negative zero": decodes to 0, canonicalizes to 0xFF
    assert list(mismatch) == [0x7F]
    assert re[0x7F] == 0xFF


def test_quantization_error_bounds():
    x = np.linspace(-32768, 32767, 20001).astype(np.int16)
    err_u = np.abs(ulaw_decode(ulaw_encode(x)).astype(int) - x.astype(int))
    err_a = np.abs(alaw_decode(alaw_encode(x)).astype(int) - x.astype(int))
    # segment-companded log PCM: coarse at full scale, fine near zero
    assert err_u.max() <= 1024 and err_a.max() <= 512
    near_zero = np.abs(x.astype(int)) < 100
    assert err_u[near_zero].max() <= 8
    assert err_a[near_zero].max() <= 16


def test_idempotent_requantization():
    """Re-encoding an already-companded signal is lossless (fixpoint)."""
    rng = np.random.default_rng(3)
    x = rng.integers(-32768, 32767, 4000).astype(np.int16)
    for enc, dec in [(ulaw_encode, ulaw_decode), (alaw_encode, alaw_decode)]:
        once = dec(enc(x))
        twice = dec(enc(once))
        assert np.array_equal(once, twice)


@pytest.mark.parametrize("law,tag", [("ulaw", 7), ("alaw", 6)])
def test_wav_container_roundtrip(law, tag):
    t = np.arange(8000)
    x = (5000 * np.sin(2 * np.pi * 200 * t / 8000)).astype(np.int16)
    blob = encode_wav_g711(x, 8000, law)
    dec, rate = decode_wav(blob)  # dispatch through the generic entry
    assert rate == 8000 and len(dec) == len(x)
    # companding noise well under 1% full scale for a mid-level tone
    assert np.abs(dec * 32768 - x).max() <= 256


def test_g711_rejects_other_tags():
    from sparkstreaming_spark.multimodal.audio import encode_wav_ima_adpcm

    blob = encode_wav_ima_adpcm(np.zeros(100, dtype=np.int16), 8000)
    with pytest.raises(NotImplementedError, match="not G.711"):
        decode_wav_g711(blob)


def test_odd_length_payload_padded():
    x = np.zeros(101, dtype=np.int16)
    blob = encode_wav_g711(x, 8000, "alaw")
    dec, _ = decode_wav(blob)
    assert len(dec) == 101  # fact chunk truncates the pad byte


def test_audio_features_decodes_flac_blobs(spark):
    """decode_audio dispatch: a mixed WAV+FLAC blob column flows through
    the same Arrow feature pass."""
    import numpy as np
    import pandas as pd

    from sparkstreaming_spark.multimodal.audio import (
        audio_features,
        encode_wav,
    )
    from sparkstreaming_spark.multimodal.flac import encode_flac

    t = np.arange(8000)
    x = (6000 * np.sin(2 * np.pi * 220 * t / 8000)).astype(np.int16)
    rows = [(1, encode_wav(x, 8000)), (2, encode_flac(x, 8000))]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "blob"]))
    out = {r["id"]: r.asDict() for r in
           audio_features(df, "id", "blob", target_rate=8000).collect()}
    assert out[1]["n_samples"] == out[2]["n_samples"] == len(x)
    assert out[1]["sample_rate"] == out[2]["sample_rate"] == 8000
    # FLAC is lossless: identical rms/peak to the PCM original
    assert out[1]["rms"] == out[2]["rms"]
    assert out[1]["peak"] == out[2]["peak"]
