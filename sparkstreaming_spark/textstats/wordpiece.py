"""WordPiece tokenizer (BERT's greedy longest-match-first encode, Wu
et al. 2016 / Devlin et al. 2019) — the third tokenizer family next to
BPE (textstats/bpe.py) and unigram-LM (textstats/unigram.py).

Vocabulary: frequency-ranked word-initial pieces plus '##'-prefixed
continuation pieces (the BERT convention), built in ONE in-row
substring explode + aggregate over the DISTINCT-word frequency table —
the same staging as unigram.py's substring seed. Every character seen
in the training corpus is retained in both forms ('c' and '##c'), so
encode coverage is exact: a word fails to segment (→ [UNK]) iff it
contains a character the training corpus never saw. That equivalence
is what makes the UNK count ORACLE-EXACT in SQL — greedy matching is
a DP the oracle can't replay, but "contains an unseen char" is one
regex per word (see suite/enrich.py::doc_wordpiece_encode).

Encode rides the dictionary-join shape (the unigram_encode_counts
precedent): greedy longest-match runs once per DISTINCT word in one
Arrow pass, occurrences hash-join back, per-doc aggregate. At 100 TB
the Python cost is |distinct words|, not corpus tokens.

Reference parity: no tokenizer surface in the reference; north-star
extension (SURVEY §6).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize
from .unigram import word_freq_table

UNK_PIECE = "[UNK]"


def _wordpiece_pieces(wf: DataFrame, max_len: int) -> DataFrame:
    """(piece, weight) for every word-initial substring ('xy') and
    continuation substring ('##yz') up to max_len content chars,
    weighted by word frequency — pure codegen explode over the
    DISTINCT-word table."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.length("word") - 1),
            lambda s: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_len), F.length("word") - s),
                ),
                lambda l: F.when(
                    s == 0, F.col("word").substr(s + 1, l)
                ).otherwise(
                    F.concat(F.lit("##"), F.col("word").substr(s + 1, l))
                ),
            ),
        )
    )
    return (
        wf.select("wcount", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wcount").alias("weight"))
    )


def build_wordpiece_vocab(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 256,
    max_len: int = 6,
    word_pattern: str | None = None,
) -> list[str]:
    """Frequency-ranked WordPiece vocabulary: top `vocab_size` pieces by
    (weight DESC, piece ASC) plus full character coverage ('c' and
    '##c' for every character seen). `word_pattern` optionally
    restricts the training words (an alphabet cap — lets a query
    exercise the [UNK] path deterministically). Deterministic; driver
    state is vocab-sized."""
    wf = word_freq_table(df, text_col)
    if word_pattern is not None:
        wf = wf.filter(F.col("word").rlike(word_pattern))
    wf = wf.persist()
    top = (
        _wordpiece_pieces(wf, max_len)
        .orderBy(F.col("weight").desc(), "piece")
        .limit(vocab_size)
        .collect()
    )
    if not top:
        raise ValueError("empty corpus: nothing to build a vocabulary from")
    # full coverage: BOTH forms for every distinct character, wherever
    # it appeared (a char seen only word-initially still needs '##c',
    # else the UNK ⇔ unseen-char equivalence the oracle relies on breaks)
    chars = {
        r["c"]
        for r in wf.select(
            F.explode(F.split("word", "")).alias("c")
        )
        .filter(F.col("c") != "")
        .distinct()
        .collect()
    }
    vocab = {r["piece"] for r in top}
    for c in chars:
        vocab.add(c)
        vocab.add("##" + c)
    return sorted(vocab)


def wordpiece_segment(
    word: str, vocab: set[str], max_len: int
) -> list[str]:
    """Greedy longest-match-first (the BERT WordpieceTokenizer loop):
    at each position take the longest vocab piece (continuation pieces
    carry the '##' prefix); any unmatched position → the whole word is
    [UNK]. With full char coverage this happens iff the word contains
    a character absent from the training corpus."""
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        j = min(n, i + max_len)
        match = None
        while j > i:
            cand = word[i:j] if i == 0 else "##" + word[i:j]
            if cand in vocab:
                match = cand
                break
            j -= 1
        if match is None:
            return [UNK_PIECE]
        out.append(match)
        i = j
    return out


def wordpiece_encode_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: list[str],
    max_len: int = 6,
) -> DataFrame:
    """Encode with a FROZEN WordPiece vocabulary via the dictionary
    join: → (id, n_words, n_chars_tok, n_pieces, n_unk, lossless)
    where `lossless` asserts every NON-UNK word's pieces (with '##'
    stripped) concatenate back to the word."""
    spark = df.sparkSession
    bset = spark.sparkContext.broadcast(set(vocab))
    # one corpus tokenize pass (lazy localCheckpoint): the exploded
    # stream feeds both the distinct-word dictionary and the join below
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize(text_col)).alias("word"),
    ).localCheckpoint(eager=False)
    dw = toks.select("word").distinct()

    def encode(batches, _max_len=max_len):
        for pdf in batches:
            vs = bset.value
            rows = []
            for word in pdf["word"]:
                word = str(word)
                seg = wordpiece_segment(word, vs, _max_len)
                unk = seg == [UNK_PIECE]
                rows.append(
                    {
                        "word": word,
                        "n_pieces": len(seg),
                        "unk": unk,
                        "ok": unk
                        or "".join(p.removeprefix("##") for p in seg)
                        == word,
                    }
                )
            yield pd.DataFrame(rows)

    enc = dw.mapInPandas(
        encode, "word string, n_pieces bigint, unk boolean, ok boolean"
    )
    return (
        toks.join(enc, "word")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("word")).alias("n_chars_tok"),
            F.sum("n_pieces").alias("n_pieces"),
            F.sum(F.when(F.col("unk"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_unk"),
            F.min("ok").alias("lossless"),
        )
    )
