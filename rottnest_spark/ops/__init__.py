from rottnest_spark.ops.dedup import (
    embedding_cosine_pairs,
    embedding_cosine_pairs_ivf,
    exact_dup_groups,
    lsh_bucket_stats,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

__all__ = [
    "exact_dup_groups",
    "minhash_lsh_pairs",
    "lsh_bucket_stats",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "embedding_cosine_pairs",
    "embedding_cosine_pairs_ivf",
]
