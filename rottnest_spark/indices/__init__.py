from rottnest_spark.indices.base import BRUTE_FORCE, SparkIndex
from rottnest_spark.indices.bloom import BloomIndex
from rottnest_spark.indices.sketches import (
    QuantileSketchIndex,
    StatsSketchIndex,
    ThetaSketchIndex,
)
from rottnest_spark.indices.substring import SubstringIndex
from rottnest_spark.indices.suffix import SuffixArrayIndex

__all__ = [
    "BRUTE_FORCE",
    "BloomIndex",
    "QuantileSketchIndex",
    "SparkIndex",
    "StatsSketchIndex",
    "SubstringIndex",
    "SuffixArrayIndex",
    "ThetaSketchIndex",
]


def index_from_config(index_type: str, config: dict | None):
    """Reconstruct an index instance from a catalog entry's (index_type,
    config) — the inverse of SparkIndex.config(). Constructor kwargs are
    filtered by signature, so informational config keys (tokenizer id,
    miner regex, k1/b) pass through harmlessly. Raises KeyError for an
    unknown type (custom SparkIndex subclasses must be passed as instances
    where an index object is expected)."""
    import inspect

    from rottnest_spark.indices.bloom import BloomIndex
    from rottnest_spark.indices.bm25 import BM25Index
    from rottnest_spark.indices.exact import ExactIndex
    from rottnest_spark.indices.fuzzy import FuzzyIndex
    from rottnest_spark.indices.logcloud import LogIndex
    from rottnest_spark.indices.vamana import VamanaIndex
    from rottnest_spark.indices.vector import VectorIndex

    registry = {
        "substring": SubstringIndex,
        "suffix": SuffixArrayIndex,
        "exact": ExactIndex,
        "bm25": BM25Index,
        "bloom": BloomIndex,
        "fuzzy": FuzzyIndex,
        "logcloud": LogIndex,
        "vector": VectorIndex,
        "vamana": VamanaIndex,
        "hll_stats": StatsSketchIndex,
        "kll_quantiles": QuantileSketchIndex,
        "theta_keys": ThetaSketchIndex,
    }
    cls = registry[index_type]
    params = inspect.signature(cls.__init__).parameters
    kwargs = {k: v for k, v in (config or {}).items() if k in params}
    return cls(**kwargs)
