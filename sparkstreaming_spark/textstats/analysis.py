"""Text analysis: language-ID, quality scoring, document fingerprinting.

All pure built-in expressions (no Python UDFs). Generalizes the
reference's single text op (Helper.removePunctuation,
FileReconstitution.scala:7-12) into the analyzers an LLM-data pipeline
runs before training-data selection.

Structure rule (hard-won, see functions/text.py::shingles_from_tokens):
every array that later expressions reference more than once — token
arrays, shingle arrays, hash arrays, per-language scores — is
materialized as a COLUMN in its own select. Interpreted higher-order
expressions re-evaluate nested subexpressions per reference/lambda call;
staging turns that into a row read and keeps the pipeline linear in
input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    BPE_ISH_RE,
    PUNCT_RE,
    md5_64,
    shingles_from_tokens,
    tokenize,
)

# Tiny per-language stopword sets — the classic cheap n-gram/stopword
# heuristic. Ordered dict: ties resolve to the earlier language.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"),
    "es": ("el", "la", "los", "las", "de", "que", "es", "un", "una", "por"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "que", "pour", "dans"),
}


def _stop_hits(toks: str | Column, words: tuple[str, ...]) -> Column:
    """Occurrence count of stopwords in a token-array column."""
    t = F.col(toks) if isinstance(toks, str) else toks
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(t, lambda x: F.array_contains(arr, x)))


def add_langid(df: DataFrame, text_col: str, out_col: str = "predicted") -> DataFrame:
    """Append a predicted-language column: argmax of per-language stopword
    hits ('und' when all zero; ties → STOPWORDS order). Three staged
    selects: tokens → score columns → CASE over score attributes."""
    staged = df.withColumn("__toks", tokenize(text_col))
    for lang, words in STOPWORDS.items():
        staged = staged.withColumn(f"__s_{lang}", _stop_hits("__toks", words))
    langs = list(STOPWORDS)
    best = None
    for i, lang in enumerate(langs):
        cond = F.col(f"__s_{lang}") > 0
        for j, other in enumerate(langs):
            if i == j:
                continue
            s, o = F.col(f"__s_{lang}"), F.col(f"__s_{other}")
            cond = cond & ((s > o) if j < i else (s >= o))
        best = F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
    out = staged.withColumn(out_col, best.otherwise(F.lit("und")))
    return out.drop("__toks", *[f"__s_{lang}" for lang in langs])


def add_quality_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Append quality signals + composite score ∈ [0,1]: char length,
    whitespace/BPE-ish token counts, punctuation ratio, English-stopword
    ratio, mean token length. Composite mirrors the usual heuristic
    filters in spirit: reward length and stopword presence, penalize
    punctuation density."""
    c = F.col(text_col)
    staged = df.withColumns(
        {
            "__toks": tokenize(text_col),
            "n_chars": F.length(c).cast("bigint"),
            "n_bpe_tokens": F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_RE), 0)).cast(
                "bigint"
            ),
            "__punct_cnt": F.size(F.regexp_extract_all(c, F.lit(PUNCT_RE), 0)),
        }
    ).withColumns(
        {
            "n_tokens": F.size("__toks").cast("bigint"),
            "__stop_hits": _stop_hits("__toks", STOPWORDS["en"]),
            "__tok_len_sum": F.aggregate(
                "__toks", F.lit(0), lambda acc, t: acc + F.length(t)
            ),
        }
    ).withColumns(
        {
            "punct_ratio": F.round(
                F.when(F.col("n_chars") > 0, F.col("__punct_cnt") / F.col("n_chars"))
                .otherwise(F.lit(0.0)),
                6,
            ),
            "stop_ratio": F.round(
                F.when(F.col("n_tokens") > 0, F.col("__stop_hits") / F.col("n_tokens"))
                .otherwise(F.lit(0.0)),
                6,
            ),
            "mean_token_len": F.round(
                F.when(
                    F.col("n_tokens") > 0, F.col("__tok_len_sum") / F.col("n_tokens")
                ).otherwise(F.lit(0.0)),
                6,
            ),
        }
    )
    raw_punct = F.when(
        F.col("n_chars") > 0, F.col("__punct_cnt") / F.col("n_chars")
    ).otherwise(F.lit(0.0))
    raw_stop = F.when(
        F.col("n_tokens") > 0, F.col("__stop_hits") / F.col("n_tokens")
    ).otherwise(F.lit(0.0))
    score = (
        0.4 * F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0))
        + 0.3 * (F.lit(1.0) - F.least(raw_punct * 5, F.lit(1.0)))
        + 0.3 * F.least(raw_stop * 3, F.lit(1.0))
    )
    return staged.withColumn("quality_score", F.round(score, 6)).drop(
        "__toks", "__punct_cnt", "__stop_hits", "__tok_len_sum"
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (rolling-hash scheme of the MOSS
    paper): hash every k-gram shingle, take the min hash of each sliding
    window of `window` consecutive hashes, dedup → fingerprint set.
    Tokens → shingles → hashes are each staged columns (the hash array is
    referenced per sliding window)."""
    staged = (
        df.select(
            F.col(id_col).cast("bigint").alias("doc_id"),
            tokenize(text_col).alias("__toks"),
        )
        .select("doc_id", shingles_from_tokens("__toks", k).alias("__sh"))
        .select(
            "doc_id", F.transform("__sh", lambda s: md5_64(s)).alias("__hs")
        )
    )
    n_win = F.size("__hs") - F.lit(window - 1)
    mins = F.when(n_win < 1, F.array().cast("array<bigint>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n_win, F.lit(1))),
                lambda i: F.array_min(F.slice("__hs", i, window)),
            )
        )
    )
    # explode_outer + null filter: plain explode makes the optimizer infer
    # size(mins) > 0 and push the full expression chain into a per-row
    # filter (see dedup/minhash.py::_explode_shingles)
    return (
        staged.select("doc_id", F.explode_outer(mins).alias("fp"))
        .filter(F.col("fp").isNotNull())
    )


def add_repetition_signals(
    df: DataFrame, text_col: str, n: int = 2, id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - `n_ngrams` / `distinct_ngram_ratio`: how much of the doc is
      repeated word n-grams (1.0 = no repetition),
    - `top_ngram_share`: fraction of all n-gram occurrences taken by the
      single most frequent n-gram.

    The distinct ratio is computed INSIDE the row (array_distinct on the
    materialized shingle array — no shuffle at all); only the
    top-n-gram mode needs an explode + two partial-aggregated groupBys,
    keyed by doc so the shuffle is as wide as the corpus, never wider.
    Repetition filters are the standard corpus-quality gate (Gopher §A1.3
    heuristics) — high repeated-n-gram share ⇒ boilerplate/spam.
    """
    staged = df.withColumn("__toks", tokenize(text_col)).withColumn(
        "__sh", shingles_from_tokens("__toks", n)
    )
    base = staged.withColumns(
        {
            "n_ngrams": F.size("__sh").cast("bigint"),
            "distinct_ngram_ratio": F.round(
                F.when(
                    F.size("__sh") > 0,
                    F.size(F.array_distinct("__sh")) / F.size("__sh"),
                ).otherwise(F.lit(1.0)),
                6,
            ),
        }
    ).drop("__toks")

    per_gram = (
        base.select(id_col, F.explode_outer("__sh").alias("g"))
        .filter(F.col("g").isNotNull())
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top_share = per_gram.groupBy(id_col).agg(
        F.round(F.max("c") / F.sum("c"), 6).alias("top_ngram_share")
    )
    return (
        base.drop("__sh")
        .join(top_share, id_col, "left")
        .withColumn(
            "top_ngram_share",
            F.coalesce("top_ngram_share", F.lit(0.0)),
        )
    )


def add_unigram_logprob(
    df: DataFrame, text_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """CCNet-style LM quality filter, approximated with the corpus's own
    unigram model: per-doc mean log p(token), where p = corpus frequency.
    Gibberish / rare-token-dense docs score sharply lower; natural text
    clusters near the corpus entropy. Complements the heuristic
    (add_quality_scores) and repetition (add_repetition_signals) filters
    as the third standard quality family.

    Two corpus passes (vocab build, scoring join) — the vocab frame is
    |vocabulary| rows with map-side partial counts, broadcast when it
    fits and a plain shuffle join when a web-scale vocab doesn't.
    Returns (doc_id, n_tokens, avg_logprob) for docs with ≥1 token.
    """
    from pyspark.sql import Window

    # The exploded token stream feeds the vocab build AND the scoring
    # join — checkpoint it so tokenization runs once, not once per
    # consumer (the same persisted-pairs posture as the bigram/KN LMs
    # below). The corpus total folds into an unpartitioned window over
    # the vocab-BOUNDED frame (sketched_bigram_lm's pattern), removing
    # the separate total-collect action: same float, zero extra pass.
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"), tokenize(text_col).alias("__toks")
        )
        .select("doc_id", F.explode("__toks").alias("token"))
        .localCheckpoint(eager=False)
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy())
    probs = F.broadcast(
        vocab.select(
            "token", F.log(F.col("cnt") / total.cast("double")).alias("lp")
        )
    )
    return (
        toks.join(probs, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
    )


def add_bigram_logprob(
    df: DataFrame, text_col: str, id_col: str = "doc_id"
) -> DataFrame:
    """Bigram-LM quality score: per-doc mean log p(w2 | w1) under the
    corpus's own bigram model (MLE: count(w1 w2) / count(w1 ·), where the
    denominator counts w1 as a bigram PREFIX so the conditional sums to 1).
    The second member of the LM-quality family next to
    add_unigram_logprob — bigram surprisal separates shuffled-token
    gibberish from natural text that unigram frequency alone scores
    identically.

    Plan shape: one tokenize pass → adjacent-pair zip (codegen'd
    slice/zip_with, no explode-then-self-join), PERSISTED because it
    feeds both the model build and the scoring join. The bigram count
    table is the only pair-sized aggregate; the prefix denominator is
    derived FROM it (cp(w1) = Σ cb over w1's bigrams — a vocab-sized
    aggregate, never a second pass over the pairs), and the two model
    columns come back as ONE join on the bigram key. Model tables are
    |bigram vocab| rows; broadcast when they fit, hash join when a
    web-scale vocab doesn't (Spark picks by size — no hint pinned here on
    purpose). Returns (doc_id, n_bigrams, avg_logprob) for docs with >= 2
    tokens; round(…, 6) in BOTH engines absorbs double accumulation-order
    differences per the suite convention.
    """
    from pyspark.storagelevel import StorageLevel

    toks = df.select(
        F.col(id_col).alias("doc_id"), tokenize(text_col).alias("__toks")
    )
    n = F.greatest(F.size("__toks") - 1, F.lit(0))  # slice len >= 0
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice("__toks", 1, n),
                F.slice(F.col("__toks"), 2, n),
                lambda a, b: F.struct(
                    a.alias("w1"), F.concat_ws(" ", a, b).alias("bigram")
                ),
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.bigram").persist(StorageLevel.MEMORY_AND_DISK)
    bigram_cnt = pairs.groupBy("bigram").agg(
        F.count(F.lit(1)).alias("cb"),
        F.first("w1").alias("w1"),  # every row of a bigram shares its prefix
    )
    prefix_cnt = bigram_cnt.groupBy("w1").agg(F.sum("cb").alias("cp"))
    model = bigram_cnt.join(prefix_cnt, "w1").select("bigram", "cb", "cp")
    return (
        pairs.join(model, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log(F.col("cb") / F.col("cp"))), 6).alias(
                "avg_logprob"
            ),
        )
    )
