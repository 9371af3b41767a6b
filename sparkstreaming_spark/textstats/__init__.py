from .analysis import (
    STOPWORDS,
    add_langid,
    add_quality_scores,
    winnow_fingerprints,
)

__all__ = [
    "STOPWORDS",
    "add_langid",
    "add_quality_scores",
    "winnow_fingerprints",
]
