from .exact import exact_dedup
from .minhash import candidate_pairs, lsh_bands, minhash_near_dup_pairs, minhash_signatures
from .ngram import ngram_jaccard_pairs
from .simhash import simhash_fingerprints, simhash_near_dup_pairs
from .embedding import embedding_near_dup_pairs
from .substr import substr_dedup_apply, substr_dedup_stats, substr_dup_spans
from .bloom import bloom_gate

__all__ = [
    "bloom_gate",
    "substr_dedup_apply",
    "substr_dedup_stats",
    "substr_dup_spans",
    "candidate_pairs",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "lsh_bands",
    "minhash_near_dup_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "simhash_fingerprints",
    "simhash_near_dup_pairs",
]
