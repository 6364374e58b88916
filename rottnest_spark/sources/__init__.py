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
    "DeltaChangesCursor",
    "IcebergChangesCursor",
    "CursorCheckpoint",
    "delta_snapshot_diff",
    "iceberg_snapshot_diff",
    "sync_table",
    "sync_all",
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
    "DeltaChangesCursor": "changes",
    "IcebergChangesCursor": "changes",
    "CursorCheckpoint": "changes",
    "delta_snapshot_diff": "changes",
    "iceberg_snapshot_diff": "changes",
    "sync_table": "changes",
    "sync_all": "changes",
    "delta_column_mapping": "delta",
}


def __getattr__(name):
    # lazy: these modules import core.lake, which imports sources.reader —
    # eager re-export here would be a circular import
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(f"rottnest_spark.sources.{_LAZY[name]}")
        return getattr(mod, name)
    raise AttributeError(name)
