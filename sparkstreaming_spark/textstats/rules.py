"""Published rule-set quality filters: Gopher rules (Rae et al. 2021,
"Scaling Language Models: ... Gopher", §A1.1 quality heuristics), C4
line-level cleaning (Raffel et al. 2020, §2.2), and FineWeb's three
added heuristics (Penedo et al. 2024). These are the most-replicated
heuristic filters in LLM pretraining pipelines; the engine exposes each
as a named operator with its canonical thresholds so a curation run can
state "Gopher-filtered" and mean it.

Scale shape — the whole point of the implementation: every rule is an
IN-ROW expression (split / filter / aggregate higher-order functions,
regexp counts), so both operators compile to a single Catalyst Project
with ZERO shuffles and zero Python — a narrow map over a 100 TB corpus
that scales purely by input splits. (The upstream raw-text split is
intentionally on the RAW text: Gopher/C4 rules inspect punctuation and
casing that the suite's normalized tokenizer strips.)

Reference parity: no text surface in the reference beyond
punctuation-strip (FileReconstitution.scala:7-12 → functions/text.py);
this is north-star curation extension work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the 8 canonical Gopher "stop words" used for the must-contain rule
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    carry_cols: tuple[str, ...] = (),
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """→ (id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
    ellipsis_ratio, alpha_ratio, stop_hits, rule booleans..., gopher_ok).

    Defaults are the paper's published thresholds. Ratios are rounded
    to 6 dp BEFORE comparison so the pass booleans are cross-engine
    deterministic at the thresholds."""
    raw = F.col(text_col)
    out = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in carry_cols],
        F.split(F.lower(raw), r"\s+").alias("__words"),
        F.split(raw, "\n").alias("__lines"),
        (F.size(F.regexp_extract_all(raw, F.lit(r"[#…]"), 0))
         + F.size(F.regexp_extract_all(raw, F.lit(r"\.\.\."), 0))
         ).alias("__symbols"),
    ).withColumns(
        {
            "__words": F.filter("__words", lambda w: w != ""),
            "__nlines": F.greatest(F.size("__lines"), F.lit(1)),
        }
    ).withColumns(
        {
            "n_words": F.size("__words").cast("bigint"),
            "__alpha_words": F.size(
                F.filter("__words", lambda w: w.rlike("[a-z]"))
            ),
            "__len_sum": F.aggregate(
                "__words", F.lit(0), lambda acc, w: acc + F.length(w)
            ),
            "__bullets": F.size(
                F.filter("__lines", lambda l: F.trim(l).rlike(r"^[-*•]"))
            ),
            "__ellipsis_ends": F.size(
                F.filter(
                    "__lines",
                    lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$"),
                )
            ),
            "__stop_hits": F.size(
                F.array_intersect(
                    F.array_distinct("__words"),
                    F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
                )
            ),
        }
    ).withColumns(
        {
            "mean_word_len": F.round(
                F.when(F.col("n_words") > 0,
                       F.col("__len_sum") / F.col("n_words"))
                .otherwise(F.lit(0.0)), 6),
            "symbol_ratio": F.round(
                F.when(F.col("n_words") > 0,
                       F.col("__symbols") / F.col("n_words"))
                .otherwise(F.lit(0.0)), 6),
            "bullet_ratio": F.round(F.col("__bullets") / F.col("__nlines"), 6),
            "ellipsis_ratio": F.round(
                F.col("__ellipsis_ends") / F.col("__nlines"), 6),
            "alpha_ratio": F.round(
                F.when(F.col("n_words") > 0,
                       F.col("__alpha_words") / F.col("n_words"))
                .otherwise(F.lit(0.0)), 6),
            "stop_hits": F.col("__stop_hits").cast("int"),
        }
    ).withColumns(
        {
            "ok_word_count": (F.col("n_words") >= min_words)
            & (F.col("n_words") <= max_words),
            "ok_word_len": (F.col("mean_word_len") >= min_mean_word_len)
            & (F.col("mean_word_len") <= max_mean_word_len),
            "ok_symbols": F.col("symbol_ratio") <= max_symbol_ratio,
            "ok_bullets": F.col("bullet_ratio") <= max_bullet_ratio,
            "ok_ellipsis": F.col("ellipsis_ratio") <= max_ellipsis_ratio,
            "ok_alpha": F.col("alpha_ratio") >= min_alpha_ratio,
            "ok_stopwords": F.col("stop_hits") >= min_stop_hits,
        }
    )
    rule_cols = ["ok_word_count", "ok_word_len", "ok_symbols", "ok_bullets",
                 "ok_ellipsis", "ok_alpha", "ok_stopwords"]
    acc = F.col(rule_cols[0])
    for rc in rule_cols[1:]:
        acc = acc & F.col(rc)
    return out.withColumn("gopher_ok", acc).select(
        "id", *carry_cols, "n_words", "mean_word_len", "symbol_ratio",
        "bullet_ratio", "ellipsis_ratio", "alpha_ratio", "stop_hits",
        *rule_cols, "gopher_ok",
    )


def c4_line_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_line_words: int = 4,
) -> DataFrame:
    """C4 cleaning, line level: keep lines that end in terminal
    punctuation (.!?" or ”), have >= `min_line_words` words, and do not
    contain '{', 'lorem ipsum', or 'javascript' (case-insensitive) —
    the published heuristic set. → (id, n_lines, n_kept, cleaned_len,
    cleaned) with kept lines re-joined in original order.

    In-row `filter` + `array_join`: no explode, no shuffle — the line
    order is preserved for free because the array never leaves the row."""

    def keep(line):
        t = F.trim(line)
        lo = F.lower(t)
        return (
            t.rlike(r'[.!?"”]$')
            & (F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
               >= min_line_words)
            & ~lo.contains("{")
            & ~lo.contains("lorem ipsum")
            & ~lo.contains("javascript")
        )

    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, keep)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept"),
        F.length(F.array_join(kept, "\n")).cast("bigint").alias("cleaned_len"),
        F.array_join(kept, "\n").alias("cleaned"),
    )


def fineweb_line_rules(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_punct_end_ratio: float = 0.12,
    max_dup_char_ratio: float = 0.10,
    max_short_line_ratio: float = 0.67,
    short_line_chars: int = 30,
) -> DataFrame:
    """FineWeb's three added line-level heuristics (Penedo et al. 2024,
    on top of the C4/Gopher sets): drop documents whose lines rarely
    end in punctuation, whose characters concentrate in duplicated
    lines, or that are mostly short lines. → (id, n_lines,
    punct_end_ratio, dup_char_ratio, short_line_ratio, rule booleans,
    fineweb_ok).

    In-row like the sibling filters (zero shuffle, zero Python). The
    duplicated-line scan is a nested higher-order filter — O(L²) in the
    LINE count of one document, which is bounded by page size, not
    corpus size; ratios round to 6 dp before comparison for
    cross-engine determinism."""
    lines = F.split(F.col(text_col), "\n")
    out = df.select(
        F.col(id_col).alias("id"),
        lines.alias("__lines"),
    ).withColumns(
        {
            "n_lines": F.size("__lines").cast("bigint"),
            "__punct_ends": F.size(
                F.filter("__lines", lambda l: F.rtrim(l).rlike(r"[.!?\"']$"))
            ),
            "__short": F.size(
                F.filter("__lines", lambda l: F.length(l) < short_line_chars)
            ),
            "__total_chars": F.aggregate(
                "__lines", F.lit(0), lambda acc, l: acc + F.length(l)
            ),
        }
    ).withColumn(
        "__dup_chars",
        F.aggregate(
            F.expr(
                "filter(__lines, l -> size(filter(__lines, x -> x = l)) > 1)"
            ),
            F.lit(0),
            lambda acc, l: acc + F.length(l),
        ),
    ).withColumns(
        {
            "punct_end_ratio": F.round(
                F.col("__punct_ends") / F.greatest("n_lines", F.lit(1)), 6
            ),
            "dup_char_ratio": F.round(
                F.when(
                    F.col("__total_chars") > 0,
                    F.col("__dup_chars") / F.col("__total_chars"),
                ).otherwise(F.lit(0.0)),
                6,
            ),
            "short_line_ratio": F.round(
                F.col("__short") / F.greatest("n_lines", F.lit(1)), 6
            ),
        }
    ).withColumns(
        {
            "ok_punct_end": F.col("punct_end_ratio") >= min_punct_end_ratio,
            "ok_dup_chars": F.col("dup_char_ratio") <= max_dup_char_ratio,
            "ok_short_lines": F.col("short_line_ratio") <= max_short_line_ratio,
        }
    )
    return out.withColumn(
        "fineweb_ok",
        F.col("ok_punct_end") & F.col("ok_dup_chars") & F.col("ok_short_lines"),
    ).select(
        "id", "n_lines", "punct_end_ratio", "dup_char_ratio",
        "short_line_ratio", "ok_punct_end", "ok_dup_chars",
        "ok_short_lines", "fineweb_ok",
    )
