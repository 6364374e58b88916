"""LogCloud analog: tiered search ≡ case-sensitive contains full scan,
type-masked variable pruning, template tier, compaction."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark import ParquetLake
from rottnest_spark.indices import BRUTE_FORCE
from rottnest_spark.indices.logcloud import LogIndex, digit_tokens, type_bitmask


@pytest.fixture(scope="module")
def events_lake(spark, sf_dir, tmp_path_factory):
    from rottnest_spark.sources.reader import read_parquet

    out = str(tmp_path_factory.mktemp("ev") / "lake")
    (
        read_parquet(spark, [f"{sf_dir}/events.parquet"])
        .repartition(5)
        .write.parquet(out)
    )
    return out


def oracle_ids(spark, lake_dir, q):
    return sorted(
        r[0]
        for r in spark.read.parquet(lake_dir)
        .filter(F.contains("props", F.lit(q)))
        .select("event_id")
        .collect()
    )


def _ids(df):
    return sorted(r[0] for r in df.select("event_id").collect())


def test_search_equals_full_scan(spark, events_lake, tmp_path):
    lake = ParquetLake(spark, events_lake, str(tmp_path / "idx"))
    idx = LogIndex()
    lake.build_index(idx, "props")
    for q in ['"k": 87', "87", '{"k": 5}', "no4040such", '"k":']:
        got = _ids(lake.search(idx, "props", q))
        assert got == oracle_ids(spark, events_lake, q), q


def test_template_tier_brute_forces(spark, events_lake, tmp_path):
    idx = LogIndex()
    # no digit token → cannot prune → flag-0 brute force
    assert idx.search(spark, [], '"k":') is BRUTE_FORCE
    assert idx.explain_query('"k":')["tier"] == "brute_force"
    assert idx.explain_query('"k": 87')["tier"] == "variables"


def test_absent_value_prunes_to_zero(spark, events_lake, tmp_path):
    lake = ParquetLake(spark, events_lake, str(tmp_path / "idx"))
    idx = LogIndex()
    lake.build_index(idx, "props")
    entry = lake.catalog.entries_for("logcloud", "props")[0]
    assert idx.search(spark, [entry["index_path"]], "zz40404zz").count() == 0


def test_type_bitmask_matches_reference_classes(spark):
    assert type_bitmask("123") == 1
    assert type_bitmask("1a") == 3      # digit + hex-lower
    assert type_bitmask("1aG") == 1 | 2 | 16
    assert type_bitmask("deadBEEF1") == 1 | 2 | 4
    assert digit_tokens('x9 y "k": 87') == ["87", "x9"]


def test_compaction_preserves_search(spark, events_lake, tmp_path):
    lake = ParquetLake(spark, events_lake, str(tmp_path / "idx"))
    idx = LogIndex()
    lake.build_index(idx, "props", binpack_row_threshold=1)
    assert len(lake.catalog.entries_for("logcloud", "props")) > 1
    q = '"k": 87'
    before = _ids(lake.search(idx, "props", q))
    lake.compact_indices(idx, "props", row_threshold=10_000_000)
    after = _ids(lake.search(idx, "props", q))
    assert before == after == oracle_ids(spark, events_lake, q)
