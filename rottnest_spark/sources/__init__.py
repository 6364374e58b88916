from rottnest_spark.sources.reader import read_parquet

__all__ = [
    "read_parquet",
    "DeltaSnapshotLake",
    "DeltaWritableLake",
    "delta_live_files",
    "delta_write",
    "IcebergSnapshotLake",
    "IcebergWritableLake",
    "iceberg_live_files",
    "iceberg_write",
]

_LAZY = {
    "DeltaSnapshotLake": "delta",
    "delta_live_files": "delta",
    "delta_known_files": "delta",
    "IcebergSnapshotLake": "iceberg",
    "iceberg_live_files": "iceberg",
    "iceberg_history_files": "iceberg",
    "delta_write": "delta_write",
    "delta_commit": "delta_write",
    "delta_convert": "delta_write",
    "delta_checkpoint": "delta_write",
    "iceberg_write": "iceberg_write",
    "iceberg_commit": "iceberg_write",
    "iceberg_convert": "iceberg_write",
    "DeltaWritableLake": "writable",
    "IcebergWritableLake": "writable",
}


def __getattr__(name):
    # lazy: these modules import core.lake, which imports sources.reader —
    # eager re-export here would be a circular import
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(f"rottnest_spark.sources.{_LAZY[name]}")
        return getattr(mod, name)
    raise AttributeError(name)
