"""Text functions — all pure built-in expressions (JVM-side, codegen'd).

Generalizes the reference's only text op, `Helper.removePunctuation`
(FileReconstitution.scala:7-12: strip `[^a-zA-Z0-9\\s]`, lowercase) into
the normalization/tokenization layer the LLM-pipeline operators build on.
No Python UDFs here: at 100 TB every function below runs inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PUNCT_RE = r"[^a-zA-Z0-9\s]"
# BPE-ish word/number/punct-run segmentation (GPT-2-style classes, no \p{L}
# unicode props so the same regex runs in DuckDB for the oracle).
BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: str | Column) -> Column:
    """Lowercase + strip punctuation (reference F5, FileReconstitution.scala:8-11)."""
    return F.lower(F.regexp_replace(_c(col), PUNCT_RE, ""))


def tokenize(col: str | Column) -> Column:
    """Whitespace tokenization of normalized text → array<string>.
    Empty input yields an empty array (split of '' returns [''])."""
    trimmed = F.trim(normalize_text(col))
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def token_count(col: str | Column) -> Column:
    return F.size(tokenize(col)).cast("bigint")


def bpe_ish_token_count(col: str | Column) -> Column:
    """Token count under a BPE-ish regex segmentation (letters runs, digit
    runs, punctuation runs) — the standard cheap LLM-token estimator."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_ISH_RE), 0)).cast("bigint")


def shingles_from_tokens(toks: str | Column, n: int) -> Column:
    """Word n-gram shingles over an ALREADY-MATERIALIZED token-array
    column → array<string>. Fewer than n tokens yields an empty array.

    IMPORTANT (the lesson behind this API): `toks` must be a bound column
    (a real attribute from a previous select), NOT a nested expression.
    Higher-order functions run interpreted, and an expression argument is
    RE-EVALUATED on every lambda invocation — inlining `tokenize(text)`
    here made shingling O(tokens × text_length) regex work per document
    (~50× wall-clock on the dedup pipelines). With a materialized column
    the lambda reads the row value. Catalyst's CollapseProject keeps the
    projection boundary because the attribute is referenced more than
    once.
    """
    t = F.col(toks) if isinstance(toks, str) else toks
    return F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(t) - F.lit(n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        )
    )


def shingles(col: str | Column, n: int) -> Column:
    """Word n-gram shingles straight from a text column. Convenience for
    one-shot use on SMALL inputs — composes tokenize inline, which
    re-evaluates per lambda call (see shingles_from_tokens). Pipelines
    must stage `tokenize` into its own select and use
    `shingles_from_tokens`."""
    return shingles_from_tokens(tokenize(col), n)


def md5_64(col: str | Column) -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5.

    Chosen over xxhash64 because md5 is byte-identical in DuckDB, letting
    hash-based operators (minhash, exact-dedup keys) keep a SQL oracle.
    """
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("bigint")


def chunk_tokens(
    toks: str | Column, chunk_size: int, overlap: int = 0
) -> Column:
    """Overlapping token-window chunks over an ALREADY-MATERIALIZED token
    array → array<struct<chunk_idx int, chunk string>> — the standard
    pre-embedding chunking step of an LLM pipeline (stride =
    chunk_size − overlap; the final partial window is kept).

    Same staging rule as shingles_from_tokens: pass a bound column, not a
    nested expression — interpreted lambdas re-evaluate expression
    arguments per call.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    t = F.col(toks) if isinstance(toks, str) else toks
    # windows: ceil(max(size - overlap, 1) / stride), integer arithmetic
    # so it folds into codegen. Guard size<=0 explicitly — sequence(0, -1)
    # would produce a DESCENDING sequence, not an empty one.
    n_chunks = F.floor(
        (F.greatest(F.size(t) - F.lit(overlap), F.lit(1)) + F.lit(stride - 1))
        / F.lit(stride)
    ).cast("int")
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - F.lit(1)),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.concat_ws(
                " ", F.slice(t, i * F.lit(stride) + F.lit(1), chunk_size)
            ).alias("chunk"),
        ),
    )
    empty = F.array().cast("array<struct<chunk_idx:int,chunk:string>>")
    return F.when(F.size(t) <= 0, empty).otherwise(windows)
