from rottnest_spark.sources.reader import read_parquet

__all__ = ["read_parquet"]
