from rottnest_spark.streaming.incremental import stream_index_maintenance
from rottnest_spark.streaming.aggregate import windowed_event_counts

__all__ = ["stream_index_maintenance", "windowed_event_counts"]
