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
    vocab.count()  # materialize the single corpus pass
    merges: list[tuple[str, str, int]] = []
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
        if not top or top[0]["cnt"] < 2:
            break
        a, b, cnt = top[0]["p"]["a"], top[0]["p"]["b"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        new_vocab = vocab.withColumn(
            "symbols", _merge_pair_expr(F.col("symbols"), a, b)
        )
        if (i + 1) % checkpoint_every == 0:
            new_vocab = new_vocab.localCheckpoint(eager=True)
        else:
            new_vocab = new_vocab.persist()
            new_vocab.count()
        vocab.unpersist()
        vocab = new_vocab
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
