"""Perceptual image hash (dedup/phash.py): integer-DCT determinism,
sensitivity structure, and the band-join-equals-brute-force recall
contract the oracle relies on."""

import numpy as np
import pandas as pd
import pytest

from sparkstreaming_spark.dedup.phash import (
    DCT_SCALE,
    DCT_TABLE,
    banded_pair_candidates,
    dhash64,
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


def test_dhash_deterministic_and_64bit():
    g = _img(3)
    h1, h2 = dhash64(g), dhash64(g.copy())
    assert h1 == h2
    assert -(1 << 63) <= h1 < (1 << 63)


def test_dhash_matches_defining_formula():
    # independent replay: 8x8 grid of 4x4 block sums over the 32x32
    # block means, bit r*8+c = g[r][c] > g[r][(c+1) % 8]
    g = _img(11)
    m = (g[0::2, 0::2] + g[0::2, 1::2] + g[1::2, 0::2] + g[1::2, 1::2]) // 4
    want = 0
    for r in range(8):
        for c in range(8):
            s1 = int(m[4 * r : 4 * r + 4, 4 * c : 4 * c + 4].sum())
            c2 = (c + 1) % 8
            s2 = int(m[4 * r : 4 * r + 4, 4 * c2 : 4 * c2 + 4].sum())
            if s1 > s2:
                want |= 1 << (r * 8 + c)
    if want >= 1 << 63:
        want -= 1 << 64
    assert dhash64(g) == want


def test_dhash_local_edit_flips_at_most_two_bits():
    # the composite detector's load-bearing property: an edit confined
    # to ONE 8x8 source tile (one 4x4 grid cell) can only flip the two
    # comparisons that touch that cell
    g = _smooth(5)
    for tile in ((0, 0), (3, 4), (7, 7)):
        p = g.copy()
        r0, c0 = tile[0] * 8, tile[1] * 8
        p[r0 : r0 + 8, c0 : c0 + 8] = (p[r0 : r0 + 8, c0 : c0 + 8] + 97) % 256
        assert _ham(dhash64(g), dhash64(p)) <= 2


def test_banded_pair_join_equals_brute_force(spark):
    # band-PAIR pigeonhole: 8x8-bit slices joined on all C(8,2) 16-bit
    # pair keys == all-pairs at hamming <= bands-2 = 6
    hashes = {}
    for s in range(12):
        g = _smooth(s)
        hashes[2 * s] = phash64(g)
        p = g.copy()
        p[0:8, 0:8] = (p[0:8, 0:8] + 3) % 256
        p[8:16, 0:8] = (p[8:16, 0:8] + 2) % 256
        hashes[2 * s + 1] = phash64(p)
    fp = spark.createDataFrame(
        pd.DataFrame(
            [(k, v) for k, v in hashes.items()], columns=["doc_id", "phash"]
        )
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in banded_pair_candidates(fp, "doc_id", "phash", 6, 8).collect()
    }
    want = {}
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = _ham(hashes[a], hashes[b])
            if d <= 6:
                want[(a, b)] = d
    assert got == want
    assert want


def test_banded_pair_carry_columns(spark):
    # secondary hashes ride the explode and come back paired
    fp = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1, 2], "phash": [0, 1], "dhash": [10, 20]}
        )
    )
    rows = banded_pair_candidates(
        fp, "doc_id", "phash", 6, 8, carry=("dhash",)
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b, r.hamming) == (1, 2, 1)
    assert (r.dhash_a, r.dhash_b) == (10, 20)


def test_banded_pair_guard():
    with pytest.raises(ValueError):
        banded_pair_candidates(None, max_hamming=7, bands=8)


def test_banded_pair_join_random_hashes_property(spark):
    # brute-force equality on RANDOM 64-bit hashes (not just the smooth
    # image fixtures): pigeonhole recall must be exact at hamming <= 6
    rng = np.random.RandomState(99)
    base = rng.randint(-(2**63), 2**63 - 1, size=20, dtype=np.int64)
    hashes = {}
    for i, h in enumerate(base):
        hashes[2 * i] = int(h)
        flips = rng.choice(64, size=rng.randint(0, 7), replace=False)
        # flip bits in the UNSIGNED domain, then view as signed int64
        # (xor on a negative python int escapes the 64-bit range)
        m = int(h) & (2**64 - 1)
        for f in flips:
            m ^= 1 << int(f)
        if m >= 2**63:
            m -= 2**64
        hashes[2 * i + 1] = m
    fp = spark.createDataFrame(
        pd.DataFrame(
            [(k, v) for k, v in hashes.items()], columns=["doc_id", "phash"]
        )
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in banded_pair_candidates(fp, "doc_id", "phash", 6, 8).collect()
    }
    want = {}
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = _ham(hashes[a], hashes[b])
            if d <= 6:
                want[(a, b)] = d
    assert got == want
    assert want
