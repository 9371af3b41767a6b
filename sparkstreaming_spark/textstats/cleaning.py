"""PII scrubbing — the redaction stage of a training-data pipeline.

Pure `regexp_replace`/`regexp_extract_all` built-ins (JVM-side, inside
whole-stage codegen — a narrow projection with zero shuffle, so it
scales linearly to any corpus size). Patterns use only portable regex
constructs (character classes, bounded quantifiers, word boundaries)
that behave identically in Java regex (Spark) and RE2 (DuckDB), keeping
the oracle exact.

The reference has no cleaning surface beyond punctuation stripping
(FileReconstitution.scala:7-12); this generalizes that single rewrite
into the configurable scrub pass every corpus pipeline runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Portable across Java regex and RE2 (no lookaround, no backrefs).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9()\s.-]{6,}[0-9]",
}


def redact_pii(
    col: str | Column, patterns: dict[str, str] | None = None
) -> Column:
    """Replace every PII match with a [TYPE] tag, applied in declaration
    order (email before phone so digits inside an address-like token are
    claimed by the more specific pattern first)."""
    c = F.col(col) if isinstance(col, str) else col
    for name, pat in (patterns or PII_PATTERNS).items():
        c = F.regexp_replace(c, pat, f"[{name.upper()}]")
    return c


def pii_counts(
    col: str | Column, patterns: dict[str, str] | None = None
) -> dict[str, Column]:
    """Per-row match counts, one column per PII type."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        f"n_{name}": F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast(
            "bigint"
        )
        for name, pat in (patterns or PII_PATTERNS).items()
    }


def scrub(
    df: DataFrame,
    text_col: str,
    out_col: str = "clean_text",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Append redacted text + per-type match counts."""
    out = df.withColumn(out_col, redact_pii(text_col, patterns))
    return out.withColumns(pii_counts(text_col, patterns))


def nfc_normalize(col: str | Column) -> Column:
    """Unicode NFC normalization — compose decomposed sequences (e.g.
    'e' + U+0301 combining acute → 'é' U+00E9) before hashing/dedup, so
    byte-different but canonically-equal texts collide.

    Spark has no built-in unicode-normalize expression, so this is a
    genuine Arrow-batched Pandas-UDF case (the sanctioned slow path):
    `pandas.Series.str.normalize` runs stdlib `unicodedata.normalize`
    per Arrow batch — a narrow 1→1 projection, no shuffle, scales
    linearly. DuckDB's `nfc_normalize` (utf8proc) implements the same
    published canonical-composition tables, which keeps the differential
    oracle bit-exact.
    """
    from pyspark.sql.functions import pandas_udf

    # lambda form: `from __future__ import annotations` stringifies type
    # hints, which the pandas_udf signature inspector rejects.
    _nfc = pandas_udf(lambda s: s.str.normalize("NFC"), "string")
    c = F.col(col) if isinstance(col, str) else col
    return _nfc(c)


# HTML/markup stripping — the boilerplate-removal stage that precedes
# quality scoring when the corpus arrives as web extracts. Same design
# contract as the PII pass: pure regexp built-ins, codegen'd, zero
# shuffle, patterns portable across Java regex and RE2.
MARKUP_TAG_RE = r"<[^>]+>"
# decode order matters: &amp; LAST, so double-encoded text ("&amp;lt;")
# decodes one level per pass exactly like an HTML parser's first pass
MARKUP_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_markup(col: str | Column) -> Column:
    """Markup → plain text: drop tags, decode the common entities,
    collapse whitespace. Numeric entities other than &#39; are left
    as-is (decoding arbitrary codepoints needs chr(), not a rewrite —
    callers who need it add an Arrow-batched pass)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, MARKUP_TAG_RE, " ")
    for ent, plain in MARKUP_ENTITIES:
        c = F.regexp_replace(c, ent, plain)
    return F.trim(F.regexp_replace(c, r"\s+", " "))
