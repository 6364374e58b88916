"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query (index-accelerated substring search) on
                /root/testdata/sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2 inventory +
                LLM-pipeline extras), (spark, sf_dir) -> DataFrame.
oracle_sql()  — matching DuckDB SQL per query (omitted only for genuinely
                non-SQL-expressible ops, which get a rows-only check).

Implementation lives in rottnest_spark/entrypoints.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rottnest_spark import entrypoints as ep  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: substring search through the full index lifecycle."""
    return ep.q_substring_search(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(ep.QUERIES)


def oracle_sql() -> dict[str, str]:
    # static SQL plus the dynamic decode-metric oracles (media_quality /
    # media_quality_jpeg), whose fixture pixel tables materialize at call
    # time — see entrypoints.dynamic_oracles
    return {**ep.ORACLES, **ep.dynamic_oracles()}
