"""Distributed BPE learner vs a pure-Python reference implementation
(textstats/bpe.py)."""

from __future__ import annotations

from sparkstreaming_spark.suite.refimpl import reference_bpe as _reference_bpe


def test_bpe_matches_reference_on_classic_corpus(spark):
    word_counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    rows = [(w + " ") * c for w, c in word_counts.items()]
    df = spark.createDataFrame([(t,) for t in rows], "text string")

    from sparkstreaming_spark.textstats.bpe import learn_bpe

    got = learn_bpe(df, "text", n_merges=8)
    want = _reference_bpe(word_counts, 8)
    assert got == want, f"\ngot:  {got}\nwant: {want}"
    # sanity: the classic first merge for this corpus is e+s (count 9)
    assert got[0][:2] == ("e", "s") and got[0][2] == 9


def test_bpe_repeated_symbol_greedy_leftmost(spark):
    """'aaaa' must merge greedily left-to-right: (a,a)x2 per word, and
    the produced 'aa' must not chain-fuse with the next single 'a' in
    the same round."""
    df = spark.createDataFrame([("aaaa aaaa aaaa",)], "text string")

    from sparkstreaming_spark.textstats.bpe import learn_bpe

    got = learn_bpe(df, "text", n_merges=2)
    want = _reference_bpe({"aaaa": 3}, 2)
    assert got == want
    # counting is over OVERLAPPING adjacent positions (3 per word x 3
    # words), the textbook behavior; merging is non-overlapping greedy
    assert got[0] == ("a", "a", 9)
    # round 2: words are now [aa, aa, </w>]; (aa,aa) and (aa,</w>) tie
    # at 3 and '<' sorts before 'a', so the deterministic winner is
    # (aa, </w>)
    assert got[1][:2] == ("aa", "</w>")


def test_bpe_encode_paths_agree_and_match_reference(spark):
    """Expression-fold path == Arrow-UDF path == pure-Python reference,
    on a corpus whose learned merges force multi-char fusions."""
    from sparkstreaming_spark.textstats.bpe import (
        _encode_word_py,
        bpe_encode_words,
        learn_bpe,
    )

    rows = [(1, "low lower lowest low low"), (2, "new newer newest new")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = [(a, b) for a, b, _ in learn_bpe(df, "text", n_merges=6)]
    assert merges, "expected at least one merge"

    vocab = spark.createDataFrame(
        [("low",), ("lowest",), ("newer",), ("banana",), ("x",)], ["word"]
    )
    expr = {
        r.word: r.symbols
        for r in bpe_encode_words(vocab, merges, use_arrow=False).collect()
    }
    arrow = {
        r.word: r.symbols
        for r in bpe_encode_words(vocab, merges, use_arrow=True).collect()
    }
    ranks = {m: i for i, m in enumerate(merges)}
    for w in expr:
        ref = _encode_word_py(w, ranks)
        assert expr[w] == ref, (w, expr[w], ref)
        assert arrow[w] == ref, (w, arrow[w], ref)


def test_bpe_encode_counts_shape(spark):
    from sparkstreaming_spark.textstats.bpe import bpe_encode_counts

    df = spark.createDataFrame([(1, "aa ab aa"), (2, "")], ["doc_id", "text"])
    out = {r.id: (r.n_words, r.n_bpe_tokens) for r in bpe_encode_counts(
        df, "doc_id", "text", [("a", "a")]
    ).collect()}
    # 'aa' -> ['aa','</w>'] (2), 'ab' -> ['a','b','</w>'] (3)
    assert out[1] == (3, 7)
    assert 2 not in out  # empty doc has no words -> no row
