from .text import (
    bpe_ish_token_count,
    normalize_text,
    shingles,
    token_count,
    tokenize,
)
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "bpe_ish_token_count",
    "cosine_similarity",
    "dot",
    "l2_norm",
    "normalize_text",
    "shingles",
    "token_count",
    "tokenize",
]
