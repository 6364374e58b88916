from rottnest_spark.core.lake import ParquetLake

__all__ = ["ParquetLake"]
