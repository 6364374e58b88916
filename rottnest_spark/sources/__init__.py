from rottnest_spark.sources.reader import read_parquet

__all__ = [
    "read_parquet",
    "DeltaSnapshotLake",
    "delta_live_files",
    "IcebergSnapshotLake",
    "iceberg_live_files",
]


def __getattr__(name):
    # lazy: delta/iceberg import core.lake, which imports sources.reader —
    # eager re-export here would be a circular import
    if name in ("DeltaSnapshotLake", "delta_live_files"):
        from rottnest_spark.sources import delta

        return getattr(delta, name)
    if name in ("IcebergSnapshotLake", "iceberg_live_files"):
        from rottnest_spark.sources import iceberg

        return getattr(iceberg, name)
    raise AttributeError(name)
