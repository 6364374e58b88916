"""Iceberg metadata writer (S8 round-trip): snapshots written here must
replay through sources/iceberg.py — convert, append, rewrite, snapshot
history, version-hint pointer, and index builds over the live snapshot."""

import glob
import os

import pyspark.sql.functions as F
import pytest

from rottnest_spark.sources.iceberg import (
    IcebergSnapshotLake,
    iceberg_history_files,
    iceberg_live_files,
)
from rottnest_spark.sources.iceberg_write import (
    iceberg_commit,
    iceberg_convert,
    iceberg_write,
)

DAY_MS = 86_400_000


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    out = str(tmp_path / "itable")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 300)
        .repartition(3)
        .write.parquet(out)
    )
    return out


def test_convert_and_replay(spark, table):
    sid = iceberg_convert(table)
    assert sid == 1
    live = iceberg_live_files(table)
    assert sorted(live) == sorted(
        os.path.abspath(f) for f in glob.glob(table + "/*.parquet")
    )
    hint = open(os.path.join(table, "metadata", "version-hint.text")).read()
    assert hint.strip() == "1"
    with pytest.raises(ValueError, match="already"):
        iceberg_convert(table)


def test_commit_add_remove_and_history(spark, sf_dir, table):
    iceberg_convert(table, timestamp_ms=10 * DAY_MS)
    extra = table + "_extra"
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") >= 300)
        .coalesce(1)
        .write.parquet(extra)
    )
    import shutil

    new_file = os.path.join(table, "part-extra.parquet")
    shutil.move(glob.glob(extra + "/*.parquet")[0], new_file)
    shutil.rmtree(extra)
    sid2 = iceberg_commit(
        table, add=[new_file], timestamp_ms=11 * DAY_MS
    )
    assert sid2 == 2
    assert os.path.abspath(new_file) in iceberg_live_files(table)

    victim = sorted(iceberg_live_files(table))[0]
    iceberg_commit(table, remove=[victim], timestamp_ms=12 * DAY_MS)
    live = iceberg_live_files(table)
    assert victim not in live and os.path.exists(victim)
    # history window: all three snapshots inside 3 days → victim kept
    hist = iceberg_history_files(table, history_days=3)
    assert victim in hist
    # tight window: only the current snapshot → victim gone
    hist0 = iceberg_history_files(table, history_days=0.5)
    assert victim not in hist0
    # removing an unknown file is refused
    with pytest.raises(ValueError, match="not in the snapshot"):
        iceberg_commit(table, remove=["/nope.parquet"])


def test_snapshot_lake_over_own_metadata(spark, table, tmp_path, sf_dir):
    from rottnest_spark.indices import SubstringIndex

    iceberg_convert(table)
    lake = IcebergSnapshotLake(spark, table, str(tmp_path / "idx"))
    idx = SubstringIndex()
    assert lake.build_index(idx, "text")
    q = "merge sort"
    got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    want = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter((F.col("doc_id") < 300) & F.contains(F.lower("text"), F.lit(q)))
        .collect()
    )
    assert got == want
    victim = sorted(iceberg_live_files(table))[0]
    iceberg_commit(table, remove=[victim])
    after = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    assert set(after) <= set(want) and len(after) < len(want)


def test_concurrent_snapshot_commits_all_land(spark, sf_dir, table, tmp_path):
    """6 processes append concurrently with OCC retry: every add lands,
    metadata versions stay unique and contiguous."""
    import subprocess
    import sys
    import shutil

    iceberg_convert(table)
    extras = []
    for i in range(6):
        p = str(tmp_path / f"x{i}")
        (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") == 300 + i)
            .coalesce(1)
            .write.parquet(p)
        )
        dst = os.path.join(table, f"part-x{i}.parquet")
        shutil.move(glob.glob(p + "/*.parquet")[0], dst)
        shutil.rmtree(p)
        extras.append(dst)
    code = (
        "import sys\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "from rottnest_spark.sources.iceberg_write import iceberg_commit_retry\n"
        f"print(iceberg_commit_retry({table!r}, add=[sys.argv[1]]))\n"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, f],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for f in extras
    ]
    for p in procs:
        _, err = p.communicate(timeout=120)
        assert p.returncode == 0, err.decode()[-400:]
    live = set(iceberg_live_files(table))
    assert {os.path.abspath(f) for f in extras} <= live
    import re

    versions = sorted(
        int(re.match(r"v(\d+)", os.path.basename(f)).group(1))
        for f in glob.glob(table + "/metadata/v*.metadata.json")
    )
    assert versions == list(range(1, len(versions) + 1))


def test_iceberg_write_dataframe_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "iw")
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    sid = iceberg_write(df, out)
    assert sid == 1
    assert spark.read.parquet(*iceberg_live_files(out)).count() == 100
    sid2 = iceberg_write(df.limit(20), out, mode="append")
    assert sid2 == 2
    assert spark.read.parquet(*iceberg_live_files(out)).count() == 120
    with pytest.raises(ValueError, match="already"):
        iceberg_write(df, out)


# -- identity-partitioned tables (round 5) -----------------------------------


def test_partitioned_write_spec_and_manifests(spark, sf_dir, tmp_path):
    """iceberg_write(partition_by=) records the identity spec in metadata
    and TYPED partition values in the manifests' r102 record; data files
    are hive-laid and physically lack the partition column."""
    import json

    import pyarrow.parquet as pq

    from rottnest_spark.sources.avro_lite import read_ocf
    from rottnest_spark.sources.iceberg import (
        iceberg_live_adds,
        iceberg_partition_columns,
    )

    out = str(tmp_path / "ptable")
    src = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") < 400)
        .select("doc_id", "lang", "text")
    )
    iceberg_write(src, out, partition_by=["lang"])

    assert iceberg_partition_columns(out) == ["lang"]
    md = json.loads(
        open(sorted(glob.glob(os.path.join(out, "metadata", "v*.metadata.json")))[-1]).read()
    )
    assert md["partition-spec"][0] == {
        "name": "lang", "transform": "identity",
        "source-id": 2, "field-id": 1000,
    }
    assert md["default-spec-id"] == 0
    # schema includes the partition column even though files lack it
    names = [f["name"] for f in md["schema"]["fields"]]
    assert names == ["doc_id", "lang", "text"]

    adds = iceberg_live_adds(out)
    assert adds and all(
        isinstance(pv.get("lang"), str) for pv in adds.values()
    )
    f0 = sorted(adds)[0]
    assert "lang=" in f0
    assert "lang" not in pq.ParquetFile(f0).schema_arrow.names
    # manifest partition record is spec-shaped (r102 with a lang field)
    man = sorted(glob.glob(os.path.join(out, "metadata", "manifest-*.avro")))[-1]
    schema, entries = read_ocf(man)
    dfields = {
        f["name"] for f in schema["fields"] if f["name"] == "data_file"
    }
    assert dfields and all(
        "partition" in e["data_file"] for e in entries
    )


def test_partitioned_read_reconstructs_columns(spark, sf_dir, tmp_path):
    from rottnest_spark.sources.iceberg import iceberg_live_adds

    out = str(tmp_path / "ptable")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    iceberg_write(docs.filter("doc_id < 200"), out, partition_by=["lang"])
    iceberg_write(
        docs.filter("doc_id >= 200 AND doc_id < 420"), out, mode="append"
    )
    lake = IcebergSnapshotLake(spark, out, str(tmp_path / "idx"))
    want = docs.filter("doc_id < 420")
    got = lake.read()
    assert sorted(got.columns) == sorted(want.columns)
    assert (
        got.groupBy("lang").count().orderBy("lang").collect()
        == want.groupBy("lang").count().orderBy("lang").collect()
    )
    # subset read keeps reconstruction exact
    adds = iceberg_live_adds(out)
    one = next(iter(adds.values()))["lang"]
    subset = [f for f, pv in adds.items() if pv["lang"] == one]
    sub = lake.read(files=subset)
    assert sub.select("lang").distinct().collect()[0][0] == one
    assert sub.count() == want.filter(F.col("lang") == one).count()


def test_partitioned_typed_long_partition(spark, tmp_path):
    """A LONG partition column round-trips typed (manifest carries avro
    long, not a string)."""
    from rottnest_spark.sources.iceberg import iceberg_live_adds

    out = str(tmp_path / "ptable")
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(30)], "id long, bucket long, val string"
    )
    iceberg_write(df, out, partition_by=["bucket"])
    adds = iceberg_live_adds(out)
    assert adds and all(
        isinstance(pv["bucket"], int) for pv in adds.values()
    )
    lake = IcebergSnapshotLake(spark, out, str(tmp_path / "idx"))
    got = lake.read()
    assert dict(got.dtypes)["bucket"] == "bigint"
    assert got.filter("bucket = 1").count() == 10


def test_partitioned_writable_lake_guards(spark, sf_dir, tmp_path):
    """FULL DML surface on a partitioned Iceberg table: hive-staged
    appends commit typed values; compact/delete/merge rewrite within
    partition dirs and every commit's manifest partition records stay
    correct."""
    from rottnest_spark.indices.exact import ExactIndex
    from rottnest_spark.sources.iceberg import iceberg_live_adds
    from rottnest_spark.sources.writable import IcebergWritableLake

    out = str(tmp_path / "ptable")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    iceberg_write(docs.filter("doc_id < 150"), out, partition_by=["lang"])
    lake = IcebergWritableLake(spark, out, str(tmp_path / "idx"))
    new_files = lake.append(docs.filter("doc_id >= 150 AND doc_id < 260"))
    assert new_files and all("lang=" in f for f in new_files)
    assert lake.read().count() == docs.filter("doc_id < 260").count()

    def pvals_consistent():
        adds = iceberg_live_adds(out)
        assert adds
        for f, pv in adds.items():
            seg = [s for s in f.split("/") if s.startswith("lang=")]
            assert len(seg) == 1
            assert pv.get("lang") == seg[0].split("=", 1)[1]

    pvals_consistent()
    before = sorted(
        (r["doc_id"], r["lang"]) for r in lake.read().collect()
    )

    # per-partition compaction, content unchanged
    compacted = lake.compact_files(target_rows=10**9)
    assert compacted and all("lang=" in f for f in compacted)
    pvals_consistent()
    assert sorted(
        (r["doc_id"], r["lang"]) for r in lake.read().collect()
    ) == before

    # row-level delete inside partition dirs
    idx = ExactIndex()
    lake.build_index(idx, "doc_id")
    rep = lake.delete_matching(idx, "doc_id", 42)
    assert rep["n_deleted"] == 1
    pvals_consistent()
    assert lake.read().filter("doc_id = 42").count() == 0

    # CDC merge with partition-column-carrying changeset
    langs = sorted(
        r[0] for r in lake.read().select("lang").distinct().collect()
    )
    changes = spark.createDataFrame(
        [
            (7, langs[0], "updated-text", 1, "U"),
            (9_999, langs[-1], "inserted-text", 1, "U"),
        ],
        "doc_id long, lang string, text string, seq long, op string",
    )
    mrep = lake.merge_into(changes, "doc_id")
    assert mrep["new_files"] and all("lang=" in f for f in mrep["new_files"])
    pvals_consistent()
    after = lake.read()
    assert [
        r["text"] for r in after.filter("doc_id = 7").collect()
    ] == ["updated-text"]
    assert after.filter("doc_id = 9999").count() == 1

    with pytest.raises(ValueError, match="conflicts"):
        iceberg_write(
            docs.filter("doc_id >= 260 AND doc_id < 280"),
            out,
            mode="append",
            partition_by=["doc_id"],
        )
