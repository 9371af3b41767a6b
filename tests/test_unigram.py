"""Unigram-LM tokenizer (textstats/unigram.py): Viterbi semantics, EM
parity against a pure-Python reference, encode losslessness."""

import math

import pandas as pd
import pytest

from sparkstreaming_spark.textstats.unigram import (
    MICRO,
    train_unigram_vocab,
    unigram_encode_counts,
    viterbi_segment,
)


def test_viterbi_prefers_higher_probability():
    lp = {"ab": -1 * MICRO, "a": -3 * MICRO, "b": -3 * MICRO}
    assert viterbi_segment("ab", lp, 6) == ["ab"]
    lp = {"ab": -7 * MICRO, "a": -3 * MICRO, "b": -3 * MICRO}
    assert viterbi_segment("ab", lp, 6) == ["a", "b"]


def test_viterbi_tie_prefers_longer_trailing_piece():
    # "abc" as a|bc vs ab|c with equal totals -> smaller split start of
    # the final piece wins: a|bc
    lp = {"a": -2 * MICRO, "bc": -2 * MICRO, "ab": -2 * MICRO,
          "c": -2 * MICRO, "b": -5 * MICRO}
    assert viterbi_segment("abc", lp, 6) == ["a", "bc"]


def test_viterbi_unknown_chars_fall_back_to_unk():
    lp = {"a": -1 * MICRO}
    assert viterbi_segment("axa", lp, 6) == ["a", "x", "a"]


def test_byte_fallback_spells_unknown_chars_as_bytes():
    from sparkstreaming_spark.textstats.unigram import (
        byte_pieces,
        decode_pieces,
    )

    lp = {"a": -1 * MICRO, "ab": -1 * MICRO}
    # ASCII unknown char -> one byte piece
    assert viterbi_segment("az", lp, 6, byte_fallback=True) == [
        "a", "<0x7A>"]
    # multi-byte unknown char -> its UTF-8 bytes, in order
    assert byte_pieces("é") == ["<0xC3>", "<0xA9>"]
    seg = viterbi_segment("abé", lp, 6, byte_fallback=True)
    assert seg == ["ab", "<0xC3>", "<0xA9>"]
    assert decode_pieces(seg) == "abé"
    # without the flag the old single-char UNK behavior is unchanged
    assert viterbi_segment("az", lp, 6) == ["a", "z"]


def test_byte_fallback_never_beats_trained_pieces():
    # a trained piece always outranks its byte spelling (BYTE_LP is
    # below every trained log-prob by construction of the penalty)
    lp = {"a": -19 * MICRO}
    assert viterbi_segment("aa", lp, 6, byte_fallback=True) == ["a", "a"]


def test_encode_counts_byte_fallback(spark):
    import pandas as pd

    from sparkstreaming_spark.textstats.unigram import (
        train_unigram_vocab,
        unigram_encode_counts,
    )

    train = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["abc abc ab"]})
    )
    vocab = train_unigram_vocab(train, "text", vocab_size=8, iters=1)
    score = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["abc xq", "ab"]})
    )
    out = {r["id"]: r.asDict()
           for r in unigram_encode_counts(
               score, "doc_id", "text", vocab, byte_fallback=True
           ).collect()}
    # 'xq' has no trained chars -> 2 byte pieces; still lossless
    assert out[1]["lossless"] is True and out[2]["lossless"] is True


def test_viterbi_respects_max_len():
    lp = {"abcdefgh": 0, "ab": -1 * MICRO, "cd": -1 * MICRO,
          "ef": -1 * MICRO, "gh": -1 * MICRO}
    assert viterbi_segment("abcdefgh", lp, 2) == ["ab", "cd", "ef", "gh"]


from sparkstreaming_spark.suite.refimpl import (  # noqa: E402
    reference_unigram_em as _reference_em,
)


def test_train_matches_pure_python_reference(spark):
    rows = []
    corpus = (["the table holds values"] * 5
              + ["query the table"] * 3
              + ["values join fast"] * 2)
    for i, t in enumerate(corpus):
        rows.append((i, t))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = train_unigram_vocab(df, "text", vocab_size=64, max_len=6, iters=2)
    wc = {}
    for t in corpus:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    exp = _reference_em(wc, 64, 6, 2)
    assert got == exp


def test_frequent_words_become_single_pieces(spark):
    rows = [(i, "tokenizer " * 8) for i in range(6)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    # "tokenizer" has 45 substrings, all tied at the word count: the
    # seed's (weight DESC, piece ASC) order needs room for the 't'-
    # prefixed full word to survive the top-K cut
    vocab = train_unigram_vocab(df, "text", vocab_size=64, max_len=9,
                                iters=2)
    pieces = {p for p, _, _ in vocab}
    assert "tokenizer" in pieces
    out = unigram_encode_counts(df, "doc_id", "text", vocab, max_len=9)
    r = out.collect()[0]
    assert r["n_pieces"] == r["n_words"]  # every word is one piece
    assert r["lossless"]


def test_encode_lossless_and_bounded_on_mixed_text(spark):
    rows = [(1, "alpha beta gamma"), (2, "unseenword zz alpha")]
    train = spark.createDataFrame(
        pd.DataFrame([rows[0]], columns=["doc_id", "text"])
    )
    vocab = train_unigram_vocab(train, "text", vocab_size=16, iters=1)
    both = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    out = {r["id"]: r.asDict()
           for r in unigram_encode_counts(both, "doc_id", "text",
                                          vocab).collect()}
    for r in out.values():
        assert r["lossless"]
        assert r["n_words"] <= r["n_pieces"] <= r["n_chars_tok"]
    # doc 2's unseen word segments via UNK chars but stays lossless
    assert out[2]["n_pieces"] > out[2]["n_words"]


def test_empty_corpus_raises(spark):
    df = spark.createDataFrame([], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        train_unigram_vocab(df, "text")
