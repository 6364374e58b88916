"""Row provenance on ESCAPED paths (round 11 bug fix): Spark lays out
a partition value containing a space as `p=NOT%20SPECIFIED` ON DISK,
and `_metadata.file_path` then tags rows with the URI-encoded form
(`%2520...`) — every join of tags against manifest/log paths missed,
so row-level DML on such tables failed with a phantom
"concurrent writer removed data files" (Iceberg) or silently
mis-applied DVs (Delta). sources/reader.uri_path_col percent-decodes
tags byte-exactly, JVM-side ('+' survives — url_decode() would eat
it; multibyte UTF-8 sequences reassemble through unhex/binary).
"""

import pyspark.sql.functions as F
import pytest

from rottnest_spark.sources.delta import DeltaSnapshotLake
from rottnest_spark.sources.delta_write import delta_upsert, delta_write
from rottnest_spark.sources.iceberg import IcebergSnapshotLake
from rottnest_spark.sources.iceberg_write import (
    iceberg_delete_rows,
    iceberg_write,
)

pytestmark = pytest.mark.usefixtures("spark")


def _src(spark):
    return spark.range(24).selectExpr(
        "id AS k",
        "CASE WHEN id % 3 = 0 THEN 'NOT SPECIFIED' "
        "WHEN id % 3 = 1 THEN 'a+b' ELSE 'plain' END AS p",
        "CAST(id * 2 AS bigint) AS v",
    )


def test_uri_path_col_decodes_exactly(spark):
    from rottnest_spark.sources.reader import uri_path_col, uri_path_str

    rows = spark.createDataFrame(
        [
            ("file:/t/p=NOT%2520SPECIFIED/x.parquet",),
            ("file:/t/p=a+b/x.parquet",),  # literal + survives
            ("file:/t/p=%E4%B8%AD/x.parquet",),  # multibyte UTF-8
            ("/t/plain/x.parquet",),
        ],
        "u string",
    ).select(uri_path_col(F.col("u")).alias("p"))
    got = [r.p for r in rows.collect()]
    want = [
        "/t/p=NOT%20SPECIFIED/x.parquet",
        "/t/p=a+b/x.parquet",
        "/t/p=中/x.parquet",
        "/t/plain/x.parquet",
    ]
    assert got == want
    assert [uri_path_str(u) for u in (
        "file:/t/p=NOT%2520SPECIFIED/x.parquet",
    )] == ["/t/p=NOT%2520SPECIFIED/x.parquet".replace("%2520", "%20")]


def test_iceberg_delete_on_escaped_partition_dirs(spark, tmp_path):
    t = str(tmp_path / "t")
    iceberg_write(_src(spark), t, partition_by=["p"])
    iceberg_delete_rows(spark, t, F.col("v") % 8 == 0)
    got = IcebergSnapshotLake(spark, t, t + "_ix").read()
    a = sorted((r.k, r.p, r.v) for r in got.collect())
    b = sorted(
        (r.k, r.p, r.v)
        for r in _src(spark).filter("v % 8 <> 0").collect()
    )
    assert a == b


def test_delta_dv_upsert_on_escaped_partition_dirs(spark, tmp_path):
    t = str(tmp_path / "t")
    delta_write(_src(spark), t, partition_by=["p"])
    ch = spark.range(0, 24, 6).selectExpr(
        "id AS k",
        "CASE WHEN id % 3 = 0 THEN 'NOT SPECIFIED' "
        "WHEN id % 3 = 1 THEN 'a+b' ELSE 'plain' END AS p",
        "CAST(0 AS bigint) AS v",
    )
    delta_upsert(spark, ch, t, ["k"])
    got = DeltaSnapshotLake(spark, t, str(tmp_path / "ix")).read()
    rows = {r.k: r.v for r in got.collect()}
    assert len(rows) == 24
    for k in range(24):
        assert rows[k] == (0 if k % 6 == 0 else k * 2)
