"""Distributed unigram-LM tokenizer training (SentencePiece's unigram
algorithm, Kudo 2018 — the other standard subword tokenizer next to
BPE, textstats/bpe.py): seed a substring vocabulary from corpus
statistics, then EM — E-step Viterbi-segments every DISTINCT word
under the current piece log-probs, M-step recounts pieces from the
best segmentations — and encode with the frozen vocabulary.

Why this shape scales (100 TB): like BPE, the corpus only matters
through the WORD FREQUENCY table — one tokenize pass, one shuffle.
Seeding explodes substrings of distinct words IN-ROW (pure codegen
sequence/transform — no Python) and takes the top-K pieces with one
vocab-sized aggregate + bounded collect (K <= a few thousand rows).
Each EM round is ONE Arrow pass over the distinct-word table (the
Viterbi DP is genuinely imperative — the one justified Python step)
plus a vocab-sized count aggregate; the model dict rides to executors
as a broadcast. Encoding pays the same per-DISTINCT-word cost via the
dictionary-join shape (bpe.py's convention), never per occurrence.

Determinism: piece log-probs are integer MICRO-NATS, so Viterbi
comparisons are exact integer comparisons; ties prefer the longer
trailing piece (smaller split point), making the segmentation unique.
Seed selection orders by (weight DESC, piece ASC). The EM dynamics are
iterative/order-dependent → no SQL oracle (the BPE precedent);
exactness is pinned by a pure-Python reference EM parity test, and the
encode query ships an ORACLED losslessness/bounds contract (pieces
rejoin to the word, n_pieces within [n_words, n_chars]).

Reference parity: the reference has no tokenizer surface
(FileReconstitution.scala:7-12 strips punctuation); north-star
extension work.
"""

from __future__ import annotations

import math

import pandas as pd  # module-level so pandas_udf hints resolve

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize

MICRO = 1_000_000
# unknown characters segment as single-char pieces at a fixed penalty
UNK_LP = -20 * MICRO
# byte-fallback pieces (SentencePiece --byte_fallback): an unknown
# character expands to its UTF-8 bytes as <0xNN> pieces, each at
# BYTE_LP — below any trained piece, so bytes never outcompete them
BYTE_LP = -25 * MICRO


def byte_pieces(ch: str) -> list[str]:
    """SentencePiece byte-fallback spelling of one character:
    '<0xNN>' per UTF-8 byte."""
    return [f"<0x{b:02X}>" for b in ch.encode("utf-8")]


def viterbi_segment(
    word: str, lp: dict[str, int], max_len: int,
    byte_fallback: bool = False,
) -> list[str]:
    """Best segmentation of `word` under integer micro-nat piece
    log-probs: maximize the sum; ties prefer the longer trailing piece
    (smaller split start). Characters absent from the vocab fall back
    to single-char UNK pieces at UNK_LP, so every word segments —
    unless `byte_fallback`, where an unknown character instead costs
    BYTE_LP per UTF-8 byte and the backtrace spells it as <0xNN>
    pieces (SentencePiece's --byte_fallback; lossless for any input,
    no UNK token in the output alphabet)."""
    n = len(word)
    NEG = None
    best: list[int | None] = [NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0
    for e in range(1, n + 1):
        for s in range(max(0, e - max_len), e):
            piece = word[s:e]
            p = lp.get(piece)
            if p is None:
                if e - s > 1:
                    continue
                p = (BYTE_LP * len(piece.encode("utf-8"))
                     if byte_fallback else UNK_LP)
            if best[s] is None:
                continue
            cand = best[s] + p
            # ties: strict '>' plus ascending-s iteration means the
            # FIRST (smallest-s, i.e. longest trailing piece) candidate
            # wins — a later equal-score candidate always has larger s,
            # so no explicit tie clause is needed (pinned by tests/
            # test_unigram.py::test_viterbi_tie_prefers_longer_trailing_piece)
            if best[e] is None or cand > best[e]:
                best[e] = cand
                back[e] = s
    out = []
    e = n
    while e > 0:
        s = back[e]
        piece = word[s:e]
        if byte_fallback and piece not in lp:
            out.extend(reversed(byte_pieces(piece)))
        else:
            out.append(piece)
        e = s
    return out[::-1]


def word_freq_table(df: DataFrame, text_col: str) -> DataFrame:
    """(word, wcount) over the corpus — the single corpus-sized pass."""
    return (
        df.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcount"))
    )


def _substring_weights(wf: DataFrame, max_len: int) -> DataFrame:
    """(piece, weight) for every substring of every distinct word up to
    max_len, weighted by word frequency — in-row codegen explode."""
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.length("word") - 1),
            lambda s: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_len), F.length("word") - s),
                ),
                # Column.substr accepts Column args (F.substring is
                # literal-only)
                lambda l: F.col("word").substr(s + 1, l),
            ),
        )
    )
    return (
        wf.select("wcount", F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wcount").alias("weight"))
    )


def _logp_from_counts(counts: dict[str, int]) -> dict[str, int]:
    total = sum(counts.values())
    return {
        p: round(math.log(c / total) * MICRO) for p, c in counts.items()
    }


def train_unigram_vocab(
    df: DataFrame,
    text_col: str,
    vocab_size: int = 512,
    max_len: int = 6,
    iters: int = 2,
) -> list[tuple[str, int, int]]:
    """Train the unigram vocabulary: substring seed → `iters` EM rounds.
    → [(piece, count, lp_micro)] sorted by (count DESC, piece ASC),
    single characters always retained (full coverage). Driver state is
    vocab-sized throughout."""
    spark = df.sparkSession
    wf = word_freq_table(df, text_col).persist()
    seed_rows = (
        _substring_weights(wf, max_len)
        .orderBy(F.col("weight").desc(), "piece")
        .limit(vocab_size)
        .collect()
    )
    if not seed_rows:
        raise ValueError("empty corpus: nothing to train on")
    chars = {
        r["piece"]: int(r["weight"])
        for r in _substring_weights(wf, 1).collect()
    }
    counts = {r["piece"]: int(r["weight"]) for r in seed_rows}
    for c, w in chars.items():  # coverage: every seen char stays a piece
        counts.setdefault(c, w)

    for _ in range(iters):
        lp = _logp_from_counts(counts)
        blp = spark.sparkContext.broadcast(lp)

        def estep(batches, _max_len=max_len):
            for pdf in batches:
                model = blp.value
                pieces, weights = [], []
                for word, wc in zip(pdf["word"], pdf["wcount"]):
                    for piece in viterbi_segment(str(word), model,
                                                 _max_len):
                        pieces.append(piece)
                        weights.append(int(wc))
                yield pd.DataFrame({"piece": pieces, "wcount": weights})

        counts_df = (
            wf.mapInPandas(estep, "piece string, wcount bigint")
            .groupBy("piece")
            .agg(F.sum("wcount").alias("c"))
        )
        new_counts = {
            r["piece"]: int(r["c"]) for r in counts_df.collect()
        }
        for c, w in chars.items():  # chars never pruned (coverage)
            new_counts.setdefault(c, 1)
        counts = new_counts
    lp = _logp_from_counts(counts)
    return sorted(
        ((p, c, lp[p]) for p, c in counts.items()),
        key=lambda t: (-t[1], t[0]),
    )


def decode_pieces(seg: list[str]) -> str:
    """Invert a segmentation, resolving <0xNN> byte-fallback pieces —
    the losslessness witness for byte_fallback encodes."""
    buf = bytearray()
    for p in seg:
        if len(p) == 6 and p.startswith("<0x") and p.endswith(">"):
            buf.append(int(p[3:5], 16))
        else:
            buf.extend(p.encode("utf-8"))
    return buf.decode("utf-8")


def unigram_encode_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    vocab: list[tuple[str, int, int]],
    max_len: int = 6,
    byte_fallback: bool = False,
) -> DataFrame:
    """Encode every document with a FROZEN unigram vocabulary — the
    dictionary-join shape: Viterbi runs once per DISTINCT word (one
    Arrow pass over the word table), then occurrences join back.
    → (id, n_words, n_chars_tok, n_pieces, lossless) where lossless
    asserts every word's pieces (byte-fallback pieces decoded back)
    concatenate back to it."""
    spark = df.sparkSession
    lp = {p: l for p, _, l in vocab}
    blp = spark.sparkContext.broadcast(lp)
    # one corpus tokenize pass (lazy localCheckpoint): the exploded
    # stream feeds both the distinct-word dictionary and the join below
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokenize(text_col)).alias("word")
    ).localCheckpoint(eager=False)
    dw = toks.select("word").distinct()

    def encode(batches, _max_len=max_len, _bf=byte_fallback):
        for pdf in batches:
            model = blp.value
            rows = []
            for word in pdf["word"]:
                word = str(word)
                seg = viterbi_segment(word, model, _max_len,
                                      byte_fallback=_bf)
                ok = (decode_pieces(seg) == word
                      if _bf else "".join(seg) == word)
                rows.append(
                    {
                        "word": word,
                        "n_pieces": len(seg),
                        "ok": ok,
                    }
                )
            yield pd.DataFrame(rows)

    enc = dw.mapInPandas(encode, "word string, n_pieces bigint, ok boolean")
    return (
        toks.join(enc, "word")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("word")).alias("n_chars_tok"),
            F.sum("n_pieces").alias("n_pieces"),
            F.min("ok").alias("lossless"),
        )
    )
