from rottnest_spark.indices.base import BRUTE_FORCE, SparkIndex
from rottnest_spark.indices.bloom import BloomIndex
from rottnest_spark.indices.sketches import (
    QuantileSketchIndex,
    StatsSketchIndex,
    ThetaSketchIndex,
)
from rottnest_spark.indices.substring import SubstringIndex

__all__ = [
    "BRUTE_FORCE",
    "BloomIndex",
    "QuantileSketchIndex",
    "SparkIndex",
    "StatsSketchIndex",
    "SubstringIndex",
    "ThetaSketchIndex",
]
