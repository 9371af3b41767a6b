"""WordPiece tokenizer (textstats/wordpiece.py): greedy longest-match
semantics, UNK coverage equivalence, vocab construction, and the
dictionary-join encode."""

from __future__ import annotations

import pandas as pd

from sparkstreaming_spark.textstats.wordpiece import (
    UNK_PIECE,
    build_wordpiece_vocab,
    wordpiece_encode_counts,
    wordpiece_segment,
)


def test_greedy_longest_match_first():
    vocab = {"un", "##able", "##a", "##b", "##l", "##e", "u", "##n",
             "unb", "##ble"}
    # longest match at position 0 is 'unb', then '##ble' wins over
    # '##b'+'##l'+'##e'
    assert wordpiece_segment("unable", vocab, 6) == ["un", "##able"]
    assert wordpiece_segment("unble", vocab, 6) == ["unb", "##le"] or \
        wordpiece_segment("unble", vocab, 6) == ["unb", "##l", "##e"]


def test_greedy_is_bert_order_not_optimal():
    # greedy takes 'ab' then fails on '##c' absence → whole word UNK,
    # even though 'a'+'##bc' would segment — the BERT semantics
    vocab = {"ab", "a", "##bc", "##a", "##b"}
    assert wordpiece_segment("abc", vocab, 6) == [UNK_PIECE]


def test_unk_iff_unseen_char():
    # full char coverage in both forms → UNK exactly when a char is
    # outside the covered set
    chars = set("abc")
    vocab = set(chars) | {"##" + c for c in chars}
    assert wordpiece_segment("cab", vocab, 4) == ["c", "##a", "##b"]
    assert wordpiece_segment("cax", vocab, 4) == [UNK_PIECE]
    assert wordpiece_segment("xab", vocab, 4) == [UNK_PIECE]


def test_vocab_has_both_char_forms(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["ab ba cc"]})
    )
    vocab = build_wordpiece_vocab(df, "text", vocab_size=4, max_len=4)
    for c in "abc":
        assert c in vocab and "##" + c in vocab


def test_encode_counts_and_lossless(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["abab cd abab", "cd zz"],
            }
        )
    )
    # train only on doc 1 → charset {a,b,c,d}; 'zz' must be UNK
    vocab = build_wordpiece_vocab(
        df.filter("doc_id = 1"), "text", vocab_size=8, max_len=4
    )
    out = {
        r["id"]: r.asDict()
        for r in wordpiece_encode_counts(
            df, "doc_id", "text", vocab
        ).collect()
    }
    assert out[1]["n_words"] == 3 and out[1]["n_unk"] == 0
    assert out[1]["lossless"] is True
    assert out[2]["n_words"] == 2 and out[2]["n_unk"] == 1
    assert out[2]["lossless"] is True
    # UNK words contribute exactly one piece
    assert out[2]["n_pieces"] >= 2


def test_word_pattern_restricts_training(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "text": ["aa bb zz"]})
    )
    vocab = build_wordpiece_vocab(
        df, "text", vocab_size=8, max_len=4, word_pattern="^[a-b]+$"
    )
    assert "z" not in vocab and "##z" not in vocab
    assert wordpiece_segment("zz", set(vocab), 4) == [UNK_PIECE]
