"""LLM-training-data operators (BASELINE.json north-star extensions).

Beyond the reference's banking surface: the operations a large-scale
training-data pipeline needs — deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard, embedding cosine), similarity search
(brute-force + IVF-bucketed ANN), text analysis (language-ID, quality
scoring, token counting, fingerprinting), and multimodal binary-column
plumbing. All built on DataFrame-native expressions; hashing uses md5
(identical across engines) so every operator is DuckDB-oracle-checkable.
"""

from .text import (
    tokens,
    token_count,
    punct_ratio,
    stopword_ratio,
    quality_score,
    lang_id,
    fingerprint,
)
from .dedup import (
    exact_dedup_groups,
    shingles,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash16,
)
from .similarity import cosine_pairs, brute_force_topk

__all__ = [
    "tokens",
    "token_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_id",
    "fingerprint",
    "exact_dedup_groups",
    "shingles",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash16",
    "cosine_pairs",
    "brute_force_topk",
]
