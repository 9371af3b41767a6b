from .analysis import (
    STOPWORDS,
    langid_expr,
    quality_score_exprs,
    winnow_fingerprints,
)

__all__ = [
    "STOPWORDS",
    "langid_expr",
    "quality_score_exprs",
    "winnow_fingerprints",
]
