import pytest

from rottnest_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("rottnest-tests", cpus=8, shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture()
def docs_lake_dir(spark, sf_dir, tmp_path):
    """documents split into 5 files — multi-file lake for pruning tests."""
    out = str(tmp_path / "docs_lake")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(5)
        .write.parquet(out)
    )
    return out
