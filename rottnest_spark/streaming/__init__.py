from rottnest_spark.streaming.incremental import stream_index_maintenance
from rottnest_spark.streaming.aggregate import (
    sliding_event_counts,
    windowed_event_counts,
)
from rottnest_spark.streaming.joins import attribution_join, last_touch
from rottnest_spark.streaming.rollup import (
    read_rollup,
    refresh_buckets,
    stream_rollup_maintenance,
)
from rottnest_spark.streaming.sessions import session_stats, run_session_stream_to_memory
from rottnest_spark.streaming.stateful import distinct_stream, run_streaming_dedup

__all__ = [
    "stream_index_maintenance",
    "windowed_event_counts",
    "sliding_event_counts",
    "session_stats",
    "attribution_join",
    "last_touch",
    "run_session_stream_to_memory",
    "distinct_stream",
    "run_streaming_dedup",
    "stream_rollup_maintenance",
    "refresh_buckets",
    "read_rollup",
]

# round 3 additions
from rottnest_spark.streaming.anomaly import anomaly_stream, run_streaming_anomaly
from rottnest_spark.streaming.cdc import stream_merge_maintenance
from rottnest_spark.streaming.heavyhitters import (
    heavy_hitters_stream,
    run_streaming_heavy_hitters,
)
from rottnest_spark.streaming.ingest import (
    stream_ingest_dedup,
    stream_ingest_neardedup,
)

__all__ += [
    "stream_merge_maintenance",
    "anomaly_stream",
    "run_streaming_anomaly",
    "heavy_hitters_stream",
    "run_streaming_heavy_hitters",
    "stream_ingest_dedup",
    "stream_ingest_neardedup",
]
