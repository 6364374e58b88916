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

# round 3 additions
from rottnest_spark.ops.dedup import (
    incremental_neardedup,
    minhash_band_table,
    semantic_dedup,
)
from rottnest_spark.ops.export import verify_shards, write_token_shards
from rottnest_spark.ops.merge import (
    latest_changes,
    merge_changes,
    snapshot_diff,
    table_diff,
)
from rottnest_spark.ops.rag import rag_retrieve

__all__ += [
    "minhash_band_table",
    "incremental_neardedup",
    "semantic_dedup",
    "merge_changes",
    "latest_changes",
    "table_diff",
    "snapshot_diff",
    "write_token_shards",
    "verify_shards",
    "rag_retrieve",
]
