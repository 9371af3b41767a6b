"""Text analysis: language-ID, quality scoring, document fingerprinting.

All pure built-in expressions (codegen-resident). Generalizes the
reference's single text op (Helper.removePunctuation,
FileReconstitution.scala:7-12) into the analyzers an LLM-data pipeline
runs before training-data selection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    BPE_ISH_RE,
    PUNCT_RE,
    bpe_ish_token_count,
    md5_64,
    shingles,
    token_count,
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


def _stop_hits(toks: Column, words: tuple[str, ...]) -> Column:
    """Occurrence count of stopwords in the token array (multiplicity kept)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def langid_expr(text_col: str | Column) -> Column:
    """Predicted language code by max stopword-hit count; 'und' when no
    stopword from any set appears. Deterministic tie-break: dict order."""
    toks = tokenize(text_col)
    scores = {lang: _stop_hits(toks, words) for lang, words in STOPWORDS.items()}
    best = None
    for lang in STOPWORDS:
        cond = None
        for other in STOPWORDS:
            if other == lang:
                continue
            ge = (
                scores[lang] > scores[other]
                if list(STOPWORDS).index(other) < list(STOPWORDS).index(lang)
                else scores[lang] >= scores[other]
            )
            cond = ge if cond is None else cond & ge
        clause = (scores[lang] > 0) & cond
        best = F.when(clause, F.lit(lang)) if best is None else best.when(clause, F.lit(lang))
    return best.otherwise(F.lit("und"))


def quality_score_exprs(text_col: str | Column) -> dict[str, Column]:
    """Quality signals + composite score ∈ [0,1].

    Signals: char length, whitespace tokens, BPE-ish tokens, punctuation
    ratio, English-stopword ratio, mean token length. Composite mirrors
    the usual heuristic filters (Gopher-style) in spirit: reward length
    and stopword presence, penalize punctuation density.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokenize(c)
    n_chars = F.length(c).cast("bigint")
    n_tokens = token_count(c)
    n_bpe = bpe_ish_token_count(c)
    punct_cnt = F.size(F.regexp_extract_all(c, F.lit(PUNCT_RE), 0))
    punct_ratio = F.when(n_chars > 0, punct_cnt / n_chars).otherwise(F.lit(0.0))
    stop_hits = _stop_hits(toks, STOPWORDS["en"])
    stop_ratio = F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(F.lit(0.0))
    mean_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t)) / n_tokens,
    ).otherwise(F.lit(0.0))
    score = (
        0.4 * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + 0.3 * (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0)))
        + 0.3 * F.least(stop_ratio * 3, F.lit(1.0))
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "n_bpe_tokens": n_bpe,
        "punct_ratio": F.round(punct_ratio, 6),
        "stop_ratio": F.round(stop_ratio, 6),
        "mean_token_len": F.round(mean_tok_len, 6),
        "quality_score": F.round(score, 6),
    }


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, window: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (rolling-hash scheme of the MOSS
    paper): hash every k-gram shingle, take the min hash of each sliding
    window of `window` consecutive hashes, dedup → fingerprint set.

    Array-expression implementation: sequence + transform + slice +
    array_min, all codegen; one exploded row per selected fingerprint.
    """
    hashes = F.transform(shingles(text_col, k), lambda s: md5_64(s))
    n_win = F.size(hashes) - F.lit(window - 1)
    mins = F.when(n_win < 1, F.array().cast("array<bigint>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n_win, F.lit(1))),
                lambda i: F.array_min(F.slice(hashes, i, window)),
            )
        )
    )
    return df.select(
        F.col(id_col).cast("bigint").alias("doc_id"),
        F.explode(mins).alias("fp"),
    )
