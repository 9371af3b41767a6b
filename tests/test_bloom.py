"""Bloom membership gate (dedup/bloom.py): no false negatives, bounded
false positives, bitmap/semantics invariants."""

import pandas as pd
import pytest

from sparkstreaming_spark.dedup.bloom import bloom_build_words, bloom_gate


def _df(spark, vals, col="key"):
    return spark.createDataFrame(pd.DataFrame({col: vals}))


def test_no_false_negatives(spark):
    corpus_vals = [f"member-{i}" for i in range(200)]
    corpus = _df(spark, corpus_vals)
    out = bloom_gate(corpus, "key", _df(spark, corpus_vals), "key").collect()
    assert all(r["bloom_hit"] for r in out)


def test_false_positive_rate_is_bounded(spark):
    corpus = _df(spark, [f"member-{i}" for i in range(200)])
    probe = _df(spark, [f"outsider-{i}" for i in range(2000)])
    out = bloom_gate(corpus, "key", probe, "key", m=4096, k=3).collect()
    fp = sum(1 for r in out if r["bloom_hit"])
    # design rate ~ (1 - e^(-3*200/4096))^3 ~ 0.25%; allow 10x headroom
    assert fp <= 50, fp


def test_bitmap_is_bounded_and_deterministic(spark):
    corpus = _df(spark, [f"member-{i}" for i in range(500)])
    w1 = bloom_build_words(corpus, "key", m=4096, k=3)
    w2 = bloom_build_words(corpus, "key", m=4096, k=3)
    assert w1 == w2
    assert len(w1) == 4096 // 32
    assert all(0 <= w < (1 << 32) for w in w1)
    # different salt -> different bitmap
    w3 = bloom_build_words(corpus, "key", m=4096, k=3, salt="other")
    assert w3 != w1


def test_m_must_be_word_aligned(spark):
    with pytest.raises(ValueError, match="multiple of 32"):
        bloom_build_words(_df(spark, ["x"]), "key", m=100)


def test_adaptive_bits_floor_and_growth():
    from sparkstreaming_spark.dedup.bloom import adaptive_bits

    # small corpora stay at the floor (oracle-stable)
    assert adaptive_bits(0) == 16384
    assert adaptive_bits(1600) == 16384
    # past the floor: ~10 bits/key, 32-bit word aligned
    assert adaptive_bits(1639) == 16416  # 16390 -> next multiple of 32
    m = adaptive_bits(130_000)
    assert m >= 1_300_000 and m % 32 == 0
    # custom floor honored
    assert adaptive_bits(10, floor_m=4096) == 4096
