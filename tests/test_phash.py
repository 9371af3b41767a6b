"""Perceptual image hash (dedup/phash.py): integer-DCT determinism,
sensitivity structure, and the band-join-equals-brute-force recall
contract the oracle relies on."""

import numpy as np
import pandas as pd
import pytest

from sparkstreaming_spark.dedup.phash import (
    DCT_SCALE,
    DCT_TABLE,
    phash64,
    phash_near_dup_pairs,
)


def _img(seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(64, 64)).astype(np.int64)


def _smooth(seed: int) -> np.ndarray:
    i = np.arange(64).reshape(-1, 1)
    j = np.arange(64).reshape(1, -1)
    return ((i * (2 + seed % 3) + j * (3 + seed % 5) + (i * j) // 16) % 256).astype(
        np.int64
    )


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_dct_table_values():
    # spot-check the fixed-point basis against its defining formula
    import math

    assert DCT_TABLE[0][0] == DCT_SCALE  # cos(0) = 1
    for x, u in ((3, 2), (17, 7), (31, 1)):
        want = round(DCT_SCALE * math.cos((2 * x + 1) * u * math.pi / 64))
        assert DCT_TABLE[x][u] == want


def test_hash_deterministic_and_64bit():
    g = _img(7)
    h1, h2 = phash64(g), phash64(g.copy())
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)


def test_identical_images_hamming_zero():
    assert _ham(phash64(_smooth(1)), phash64(_smooth(1))) == 0


def test_small_perturbation_small_distance():
    g = _smooth(4)
    p = g.copy()
    p[8:16, 8:16] = (p[8:16, 8:16] + 5) % 256  # one 8x8 tile nudged
    assert _ham(phash64(g), phash64(p)) <= 6


def test_different_images_far_apart():
    assert _ham(phash64(_smooth(0)), phash64(_smooth(7))) >= 10


def test_constant_shift_changes_only_dc():
    # +k on every pixel (no wraparound) moves ONLY the DC coefficient
    g = np.clip(_smooth(2), 0, 200)
    assert _ham(phash64(g), phash64(g + 30)) <= 1


def test_rejects_wrong_shape():
    with pytest.raises(ValueError):
        phash64(np.zeros((32, 32), dtype=np.int64))


def test_band_join_equals_brute_force(spark):
    # the oracle's recall contract: banded pairing == all-pairs at
    # hamming <= bands-1 (pigeonhole)
    hashes = {}
    for s in range(12):
        g = _smooth(s)
        hashes[2 * s] = phash64(g)
        p = g.copy()
        p[0:8, 0:8] = (p[0:8, 0:8] + 3) % 256
        hashes[2 * s + 1] = phash64(p)
    fp = spark.createDataFrame(
        pd.DataFrame(
            [(k, v) for k, v in hashes.items()], columns=["doc_id", "phash"]
        )
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in phash_near_dup_pairs(fp, "doc_id", "phash", 3, 4).collect()
    }
    want = {}
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = _ham(hashes[a], hashes[b])
            if d <= 3:
                want[(a, b)] = d
    assert got == want
    assert want  # fixture actually produces near-dup pairs


def test_band_join_guard():
    with pytest.raises(ValueError):
        phash_near_dup_pairs(None, max_hamming=4, bands=4)
