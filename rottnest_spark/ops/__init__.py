from rottnest_spark.ops.dedup import (
    connected_components,
    embedding_cosine_pairs,
    embedding_cosine_pairs_ivf,
    exact_dup_groups,
    keep_group_representatives,
    lsh_bucket_stats,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

__all__ = [
    "exact_dup_groups",
    "connected_components",
    "keep_group_representatives",
    "minhash_lsh_pairs",
    "lsh_bucket_stats",
    "simhash_pairs",
    "ngram_jaccard_pairs",
    "embedding_cosine_pairs",
    "embedding_cosine_pairs_ivf",
]
