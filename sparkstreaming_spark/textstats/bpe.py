"""Distributed BPE (byte-pair-encoding) vocabulary learning — the
tokenizer-training step of an LLM data pipeline, run as a sequence of
vocab-sized DataFrame aggregates.

Why this shape scales: classic BPE (Sennrich et al., 2016 — public
algorithm) iterates "count adjacent symbol pairs, merge the most
frequent". The corpus only matters through the WORD FREQUENCY table, so
the 100 TB text is touched exactly once (tokenize → word counts, one
shuffle); every merge round then runs on the distinct-word table
(vocab-sized, millions of rows at web scale — a small DataFrame), with

  - pair counting: explode over per-word adjacent symbol pairs with the
    word's count as weight → groupBy(pair).sum — partial-agg combines
    map-side, the shuffle is |distinct pairs|;
  - argmax: orderBy + limit 1 → ONE row to the driver per round (the
    same bounded-scalar posture as kmeans/connected-components);
  - merge application: a pure codegen'd `aggregate` fold over each
    word's symbol array (greedy leftmost, the reference semantics) —
    no Python, no shuffle.

The word table is persisted and replaced each round; lineage is
truncated via localCheckpoint every few rounds so 50+ merge plans don't
stack. Iterative and order-dependent → no SQL oracle; correctness is
pinned by the classic planted-corpus unit test (known merge sequence).
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas_udf can resolve deferred hints

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize

END = "</w>"


def _merge_pair_expr(symbols: Column, a: str, b: str) -> Column:
    """Greedy leftmost merge of adjacent (a, b) → 'ab' inside a symbol
    array, as one codegen'd fold: push each symbol; when the incoming
    symbol is `b` and the last pushed is an UNFUSED `a`, replace the
    last element with the fused pair. The `fused` flag stops "aaa" from
    chain-merging with the pair it just produced (reference greedy
    semantics: scan left to right over ORIGINAL positions)."""
    merged = a + b
    return F.aggregate(
        symbols,
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(False).alias("fused"),
        ),
        lambda acc, s: F.when(
            (s == F.lit(b))
            & (F.size(acc["out"]) > 0)
            & (F.element_at(acc["out"], -1) == F.lit(a))
            & ~acc["fused"],
            F.struct(
                F.concat(
                    F.slice(acc["out"], 1, F.size(acc["out"]) - 1),
                    F.array(F.lit(merged)),
                ).alias("out"),
                F.lit(True).alias("fused"),
            ),
        ).otherwise(
            F.struct(
                F.concat(acc["out"], F.array(s)).alias("out"),
                F.lit(False).alias("fused"),
            )
        ),
        lambda acc: acc["out"],
    )


def word_symbol_table(df: DataFrame, text_col: str) -> DataFrame:
    """One corpus pass → (word, n, symbols): distinct-word counts with
    each word exploded into characters + the end-of-word marker."""
    words = (
        df.select(F.explode(tokenize(F.col(text_col))).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    chars = F.split(F.col("word"), "")
    return words.select(
        "word",
        "n",
        F.concat(
            F.filter(chars, lambda c: c != F.lit("")), F.array(F.lit(END))
        ).alias("symbols"),
    )


def learn_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int = 10,
    checkpoint_every: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn `n_merges` BPE merges → [(left, right, pair_count), ...] in
    merge order. Ties break lexicographically (count desc, pair asc) so
    the sequence is deterministic on any partitioning/engine."""
    vocab = word_symbol_table(df, text_col).persist()
    merges: list[tuple[str, str, int]] = []
    # ONE Spark job per merge round: the argmax action below is also what
    # materializes the current round's persisted/checkpointed vocab (a
    # cached frame's partitions are written the first time any job
    # computes them), so no separate count() job is needed. The PARENT
    # vocab must stay cached until that argmax has run — it is the input
    # the new vocab's one-fold lineage reads — hence the deferred
    # unpersist. The old eager-count shape paid 2 jobs per round
    # (measured 54 jobs / 115 stages for 10 merges at sf0.1; this shape
    # halves the per-round job count).
    prev: DataFrame | None = None
    for i in range(n_merges):
        pairs = vocab.select(
            "n",
            F.explode(
                F.zip_with(
                    F.slice(F.col("symbols"), 1, F.size("symbols") - 1),
                    F.slice(F.col("symbols"), 2, F.size("symbols") - 1),
                    lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                )
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("p.a"), F.asc("p.b"))
            .limit(1)
            .collect()
        )
        # vocab is materialized now — its parent can release its blocks
        if prev is not None:
            prev.unpersist()
            prev = None
        if not top or top[0]["cnt"] < 2:
            break
        a, b, cnt = top[0]["p"]["a"], top[0]["p"]["b"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        new_vocab = vocab.withColumn(
            "symbols", _merge_pair_expr(F.col("symbols"), a, b)
        )
        if (i + 1) % checkpoint_every == 0:
            # lazy: the next round's argmax writes the checkpoint blocks
            new_vocab = new_vocab.localCheckpoint(eager=False)
        else:
            new_vocab = new_vocab.persist()
        prev = vocab
        vocab = new_vocab
    if prev is not None:
        prev.unpersist()
    vocab.unpersist()
    return merges


def bpe_merge_table(
    df: DataFrame, text_col: str, n_merges: int = 10
) -> DataFrame:
    """learn_bpe as a DataFrame: (rank, left, right, merged, pair_count)."""
    spark = df.sparkSession
    merges = learn_bpe(df, text_col, n_merges)
    rows = [
        (i + 1, a, b, a + b, cnt) for i, (a, b, cnt) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string, pair_count bigint"
    )


def _encode_word_py(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference encoder: apply merges in rank order, greedy leftmost —
    identical semantics to _merge_pair_expr, used by the Arrow path."""
    symbols = list(word) + [END]
    for (a, b), _rank in sorted(ranks.items(), key=lambda kv: kv[1]):
        out: list[str] = []
        fused = False
        for s in symbols:
            if s == b and out and out[-1] == a and not fused:
                out[-1] = a + b
                fused = True
            else:
                out.append(s)
                fused = False
        symbols = out
    return symbols


def bpe_encode_words(
    vocab: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    use_arrow: bool | None = None,
) -> DataFrame:
    """vocab + (symbols array<string>) with the learned merges applied.

    Encoding runs over the DISTINCT-WORD table only (vocab-sized — the
    corpus-wide memoization real tokenizers rely on), never per corpus
    row. Two equivalent paths:
    - expression: n_merges nested codegen'd folds — zero Python, right
      for bounded merge lists (plan depth grows with the list);
    - Arrow (`use_arrow=True`, default when len(merges) > 32): one
      mapInPandas-style pandas UDF over the vocab table with the merge
      ranks broadcast — right for real 30k+ merge vocabularies.
    """
    if use_arrow is None:
        use_arrow = len(merges) > 32
    if not use_arrow:
        chars = F.split(F.col(word_col), "")
        sym = F.concat(
            F.filter(chars, lambda c: c != F.lit("")), F.array(F.lit(END))
        )
        for a, b in merges:
            sym = _merge_pair_expr(sym, a, b)
        return vocab.withColumn("symbols", sym)

    from pyspark.sql.functions import pandas_udf

    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}

    @pandas_udf("array<string>")
    def encode(words: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for w in words:
            if w not in cache:
                cache[w] = _encode_word_py(w, ranks)
            out.append(cache[w])
        return pd.Series(out)

    return vocab.withColumn("symbols", encode(F.col(word_col)))


def bpe_encode_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    use_arrow: bool | None = None,
) -> DataFrame:
    """(id, n_words, n_bpe_tokens) per document under the learned merges.

    Shape: explode words (narrow) → distinct-word dictionary encoded once
    (bpe_encode_words) → hash join words→dictionary (AQE broadcasts when
    the vocab is small; at web scale both sides hash-partition on the
    8-byte-ish word key) → one groupBy(id) partial agg. The corpus text
    is scanned once; the O(|word| * n_merges) encode cost is paid
    per DISTINCT word, not per occurrence."""
    # materialize the exploded occurrence stream ONCE (lazy
    # localCheckpoint): it feeds the distinct-word dictionary AND the
    # occurrence join below — without it the corpus tokenize+explode
    # subtree is evaluated once per consumer (2 full corpus passes)
    words = df.select(
        F.col(id_col).alias("id"),
        F.explode(tokenize(F.col(text_col))).alias("word"),
    ).filter(F.length("word") > 0).localCheckpoint(eager=False)
    enc = bpe_encode_words(
        words.select("word").distinct(), merges, use_arrow=use_arrow
    ).select("word", F.size("symbols").cast("bigint").alias("n_sym"))
    return (
        words.join(enc, "word")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("n_bpe_tokens"),
        )
    )
