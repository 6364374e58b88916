"""Delta TYPE WIDENING reads (PROTOCOL.md Type Widening, reader feature
`typeWidening` — round 9): files written before a widen physically carry
the NARROWER type (int32 under a now-long column, float32 under double).
Scans pin the log's schemaString so Spark's parquet reader up-casts per
file; inference would type the table from whichever footer it samples.

Contracts pinned:
- read() surfaces every row at the WIDENED type with correct values
  across mixed narrow/wide files;
- DML (deletion-vector DELETE) and snapshot diffs scan through the same
  pinned schema, so predicates on widened columns match;
- index build + the predicate search family (search / search_many /
  conj / disj / count_matches) WORK (round 10): their scans route
  through the read-schema pin, so results equal brute force on the
  widened types; top-K paths (via `.files`) still refuse loudly;
- the feature composes with deletionVectors in readerFeatures.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rottnest_spark.sources.delta import DeltaSnapshotLake, delta_live_files

SCHEMA_STRING = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
            {"name": "s", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
)


def _commit(log: str, version: int, lines: list[dict]):
    with open(os.path.join(log, f"{version:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(ln) for ln in lines) + "\n")


@pytest.fixture()
def wtable(tmp_path):
    """Two narrow pre-widen files (int32/float32) + one wide file
    (int64/float64), schemaString already widened, typeWidening in the
    reader features."""
    table = tmp_path / "wt"
    log = table / "_delta_log"
    log.mkdir(parents=True)
    pq.write_table(
        pa.table(
            {
                "k": pa.array([1, 2, 3], pa.int32()),
                "v": pa.array([1.5, 2.5, 3.5], pa.float32()),
                "s": pa.array(["a", "b", "c"]),
            }
        ),
        str(table / "narrow-0.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "k": pa.array([4, 5], pa.int32()),
                "v": pa.array([4.5, 5.5], pa.float32()),
                "s": pa.array(["d", "e"]),
            }
        ),
        str(table / "narrow-1.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "k": pa.array([6, 7], pa.int64()),
                "v": pa.array([6.5, 7.5], pa.float64()),
                "s": pa.array(["f", "g"]),
            }
        ),
        str(table / "wide-0.parquet"),
    )
    _commit(
        str(log),
        0,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["typeWidening", "deletionVectors"],
                    "writerFeatures": ["typeWidening", "deletionVectors"],
                }
            },
            {
                "metaData": {
                    "id": "w-1",
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": SCHEMA_STRING,
                    "partitionColumns": [],
                    "configuration": {},
                }
            },
            {"add": {"path": "narrow-0.parquet", "dataChange": True}},
            {"add": {"path": "narrow-1.parquet", "dataChange": True}},
        ],
    )
    _commit(
        str(log), 1, [{"add": {"path": "wide-0.parquet", "dataChange": True}}]
    )
    return str(table)


WANT = {
    (1, 1.5, "a"), (2, 2.5, "b"), (3, 3.5, "c"),
    (4, 4.5, "d"), (5, 5.5, "e"), (6, 6.5, "f"), (7, 7.5, "g"),
}


def test_read_widens_per_file(spark, wtable, tmp_path):
    lake = DeltaSnapshotLake(spark, wtable, str(tmp_path / "ix"))
    df = lake.read()
    assert dict(df.dtypes) == {"k": "bigint", "v": "double", "s": "string"}
    assert {(r.k, r.v, r.s) for r in df.collect()} == WANT
    assert len(delta_live_files(wtable)) == 3


def test_dml_scans_through_widened_schema(spark, wtable, tmp_path):
    """A DV DELETE whose predicate spans narrow AND wide files: the
    pinned-schema scan matches both; the read then reflects it."""
    from rottnest_spark.sources.delta_write import delta_delete_rows

    delta_delete_rows(spark, wtable, "k % 2 = 0")
    lake = DeltaSnapshotLake(spark, wtable, str(tmp_path / "ix"))
    got = {(r.k, r.v, r.s) for r in lake.read().collect()}
    assert got == {t for t in WANT if t[0] % 2 == 1}


def test_diff_feed_carry_widened_values(spark, wtable, tmp_path):
    from rottnest_spark.sources.changes import delta_snapshot_diff

    diff = delta_snapshot_diff(spark, wtable, 0, 1)
    ins = {
        (r.k, r.v, r.s)
        for r in diff.filter("_change_type = 'insert'").collect()
    }
    assert ins == {(6, 6.5, "f"), (7, 7.5, "g")}
    assert dict(diff.select("k", "v", "s").dtypes) == {
        "k": "bigint", "v": "double", "s": "string",
    }


def test_index_build_and_search_on_widened_table(spark, wtable, tmp_path):
    """Round 10: build_index() and predicate search() WORK on widened
    tables — the scans route through the read-schema pin
    (sources/reader.py read_schema_pin), so narrow pre-widen files
    up-cast to the widened type at build AND refine time. Search on the
    widened column (keys span narrow and wide files) equals the brute
    force read() filter."""
    from rottnest_spark.indices.exact import ExactIndex

    lake = DeltaSnapshotLake(spark, wtable, str(tmp_path / "ix"))
    idx = ExactIndex()
    created = lake.build_index(idx, "k")
    assert created, "build produced no index"
    for key, want in ((2, {(2, 2.5, "b")}), (6, {(6, 6.5, "f")})):
        got = {(r.k, r.v, r.s) for r in lake.search(idx, "k", key).collect()}
        brute = {
            (r.k, r.v, r.s)
            for r in lake.read().filter(f"k = {key}").collect()
        }
        assert got == brute == want, (key, got, brute)
    # a string-column substring search composes with the widen pin too
    from rottnest_spark.indices.substring import SubstringIndex

    sidx = SubstringIndex()
    lake.build_index(sidx, "s")
    got = {r.s for r in lake.search(sidx, "s", "f").collect()}
    assert got == {"f"}


def test_index_build_search_on_widened_dv_table(spark, wtable, tmp_path):
    """Widening composes with deletion vectors: after a DV DELETE, the
    search result applies the delete state AND the widened types."""
    from rottnest_spark.indices.exact import ExactIndex
    from rottnest_spark.sources.delta_write import delta_delete_rows

    delta_delete_rows(spark, wtable, "k IN (2, 6)")
    lake = DeltaSnapshotLake(spark, wtable, str(tmp_path / "ix"))
    idx = ExactIndex()
    lake.build_index(idx, "k")
    assert lake.search(idx, "k", 2).count() == 0  # row-deleted
    got = {(r.k, r.v) for r in lake.search(idx, "k", 3).collect()}
    assert got == {(3, 3.5)}


def test_unrouted_paths_still_refuse_loudly(spark, wtable, tmp_path):
    """Paths not yet routed through the widen pin (top-K via `.files`,
    batched search_many) keep the loud refusal."""
    lake = DeltaSnapshotLake(spark, wtable, str(tmp_path / "ix"))
    with pytest.raises(ValueError, match="widening"):
        lake.files
    with pytest.raises(ValueError, match="widening"):
        lake._search_files()


def test_search_variants_on_widened_table(spark, wtable, tmp_path):
    """search_many / conj / disj / count_matches route through the widen
    pin too (round 10) — each equals its brute-force twin."""
    from rottnest_spark.indices.exact import ExactIndex
    from rottnest_spark.indices.substring import SubstringIndex

    lake = DeltaSnapshotLake(spark, wtable, str(tmp_path / "ix"))
    idx = ExactIndex()
    lake.build_index(idx, "k")
    assert lake.count_matches(idx, "k", 2) == 1
    many = lake.search_many(idx, "k", [2, 6, 99])
    got = {(r["__query__"], r["k"]) for r in many.collect()}
    assert got == {("2", 2), ("6", 6)} or got == {(2, 2), (6, 6)}
    sidx = SubstringIndex()
    lake.build_index(sidx, "s")
    conj = {r.s for r in lake.search_conj([(sidx, "s", "f")]).collect()}
    assert conj == {"f"}
    disj = {
        r.s
        for r in lake.search_disj(
            [(sidx, "s", "f"), (sidx, "s", "b")]
        ).collect()
    }
    assert disj == {"f", "b"}
