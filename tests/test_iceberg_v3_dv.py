"""Iceberg v3 puffin deletion-vector READ (round 8).

Conformance strategy: a v2 table with parquet positional deletes and a
v3 twin whose SAME deleted positions live in puffin deletion-vector
blobs (hand-committed through `iceberg_v3_dv_commit`, the same public
specs a v3 engine writes: iceberg.apache.org/spec/#deletion-vectors +
puffin-spec). Every consumer — read(), indexed search, snapshot diff,
change-feed cursor, cross-format replication — must produce identical
rows on the twins. The reference has nothing here: it refuses any
delete-bearing table (reference backends/iceberg.py:279-280).
"""

import os

import pytest

from rottnest_spark.indices.exact import ExactIndex
from rottnest_spark.sources.iceberg import IcebergSnapshotLake
from rottnest_spark.sources.iceberg_write import (
    iceberg_delete_rows,
    iceberg_upsert,
    iceberg_v3_dv_commit,
    iceberg_write,
)

pytestmark = pytest.mark.usefixtures("spark")


def _data(spark):
    return spark.range(300).selectExpr(
        "id AS doc_id",
        "concat('w', cast(id % 9 AS string)) AS lang",
        "id * 3 AS n_chars",
    )


def _positions_of(spark, table, predicate):
    """{data file: [row positions]} matching a predicate — built from a
    tagged scan, the same positions a DELETE would tombstone."""
    import pyspark.sql.functions as F

    from rottnest_spark.sources.iceberg import (
        _current_metadata,
        snapshot_state_from_metadata,
    )

    files = sorted(
        snapshot_state_from_metadata(_current_metadata(table), table)["data"]
    )
    rows = (
        spark.read.parquet(*files)
        .withColumns(
            {
                "f": F.regexp_replace(
                    F.col("_metadata.file_path"), "^file:/+", "/"
                ),
                "p": F.col("_metadata.row_index"),
            }
        )
        .filter(predicate)
        .select("f", "p")
        .collect()
    )
    out: dict[str, list] = {}
    for r in rows:
        out.setdefault(r.f, []).append(r.p)
    return out


@pytest.fixture()
def twins(spark, tmp_path):
    """(v2 table with parquet pos-deletes, v3 table with puffin DVs)
    holding identical logical rows."""
    v2 = str(tmp_path / "v2")
    v3 = str(tmp_path / "v3")
    for t in (v2, v3):
        iceberg_write(_data(spark).repartition(3), t)
    iceberg_delete_rows(spark, v2, "doc_id % 7 = 0")
    iceberg_v3_dv_commit(v3, _positions_of(spark, v3, "doc_id % 7 = 0"))
    return v2, v3


def _rows(lake):
    return sorted(map(tuple, lake.read().collect()))


def test_v3_dv_read_equals_v2_twin(spark, twins):
    v2, v3 = twins
    l2 = IcebergSnapshotLake(spark, v2, v2 + "_i")
    l3 = IcebergSnapshotLake(spark, v3, v3 + "_i")
    assert _rows(l3) == _rows(l2)
    assert len(_rows(l3)) == 300 - len([i for i in range(300) if i % 7 == 0])


def test_v3_dv_search_equals_v2_twin(spark, twins):
    v2, v3 = twins
    out = {}
    for tag, path in (("v2", v2), ("v3", v3)):
        lake = IcebergSnapshotLake(
            spark, path, path + "_ix", brute_force_threshold=1
        )
        idx = ExactIndex()
        lake.build_index(idx, "doc_id")
        out[tag] = sorted(
            map(tuple, lake.search(idx, "doc_id", 13).collect())
        )
        out[tag + "_deleted"] = lake.search(idx, "doc_id", 14).count()
    assert out["v3"] == out["v2"] and len(out["v2"]) == 1
    assert out["v3_deleted"] == out["v2_deleted"] == 0  # 14 % 7 == 0


def test_v3_dv_files_property_refuses(spark, twins):
    _, v3 = twins
    lake = IcebergSnapshotLake(spark, v3, v3 + "_i")
    with pytest.raises(ValueError, match="delete source"):
        lake.files


def test_v3_dv_snapshot_diff(spark, twins):
    from rottnest_spark.sources.changes import iceberg_snapshot_diff

    _, v3 = twins
    diff = iceberg_snapshot_diff(spark, v3, 1, 2)
    rows = diff.collect()
    assert all(r._change_type == "delete" for r in rows)
    assert sorted(r.doc_id for r in rows) == [
        i for i in range(300) if i % 7 == 0
    ]


def test_v3_dv_merge_and_carry_forward(spark, tmp_path):
    """Second DV commit: touched file's positions UNION (one DV per file
    survives), untouched files' DVs carry forward to the old puffin."""
    t = str(tmp_path / "m")
    iceberg_write(_data(spark).repartition(3), t)
    iceberg_v3_dv_commit(t, _positions_of(spark, t, "doc_id < 5"))
    iceberg_v3_dv_commit(t, _positions_of(spark, t, "doc_id >= 295"))
    lake = IcebergSnapshotLake(spark, t, t + "_i")
    got = sorted(r.doc_id for r in lake.read().collect())
    assert got == list(range(5, 295))
    # both puffin files are referenced by the current snapshot
    from rottnest_spark.sources.iceberg import (
        _current_metadata,
        snapshot_state_from_metadata,
    )

    st = snapshot_state_from_metadata(_current_metadata(t), t)
    assert len(st["dvs"]) >= 2
    assert len({d["puffin"] for d in st["dvs"].values()}) == 2


def test_v3_dv_feed_and_replication(spark, twins, tmp_path):
    """The round-7 refusal narrows: a v3 DV source now REPLICATES —
    cursor polls feed the destination the same rows as the v2 twin."""
    from rottnest_spark.sources.changes import IcebergChangesCursor, sync_table
    from rottnest_spark.sources.delta_write import delta_convert
    from rottnest_spark.sources.writable import DeltaWritableLake

    v2, v3 = twins
    mirrors = {}
    for tag, src in (("v2", v2), ("v3", v3)):
        dst = str(tmp_path / f"dst_{tag}")
        spark.createDataFrame(
            [], "doc_id long, lang string, n_chars long"
        ).coalesce(1).write.parquet(dst)
        delta_convert(dst)
        dlake = DeltaWritableLake(spark, dst, dst + "_idx")
        cur = IcebergChangesCursor(
            spark, src, str(tmp_path / f"ck_{tag}")
        )
        sync_table(cur, dlake, "doc_id")
        mirrors[tag] = sorted(
            map(tuple, dlake.read().select("doc_id", "n_chars").collect())
        )
    assert mirrors["v3"] == mirrors["v2"] and len(mirrors["v3"]) > 0


def test_v3_dml_still_refuses(spark, twins):
    _, v3 = twins
    with pytest.raises(ValueError, match="format-version"):
        iceberg_delete_rows(spark, v3, "doc_id = 1")
    with pytest.raises(ValueError, match="format-version"):
        iceberg_upsert(
            spark,
            spark.createDataFrame(
                [(1, "x", 3)], "doc_id long, lang string, n_chars long"
            ),
            v3,
            ["doc_id"],
        )


def test_v3_expire_keeps_referenced_puffin(spark, tmp_path):
    from rottnest_spark.sources.iceberg_write import iceberg_expire_snapshots

    t = str(tmp_path / "e")
    iceberg_write(_data(spark).repartition(2), t)
    iceberg_v3_dv_commit(t, _positions_of(spark, t, "doc_id < 10"))
    deleted = iceberg_expire_snapshots(t, keep_last=1)
    puffins = [f for f in os.listdir(t) if f.endswith(".puffin")]
    assert puffins, "live puffin file vacuumed away"
    assert not any(p.endswith(".puffin") for p in deleted)
    lake = IcebergSnapshotLake(spark, t, t + "_i")
    assert sorted(r.doc_id for r in lake.read().collect()) == list(
        range(10, 300)
    )


def test_v4_still_refuses(spark, tmp_path):
    import json

    t = str(tmp_path / "v4")
    iceberg_write(_data(spark).coalesce(1), t)
    meta = os.path.join(t, "metadata")
    metas = sorted(
        f for f in os.listdir(meta) if f.endswith(".metadata.json")
    )
    md = json.loads(open(os.path.join(meta, metas[-1])).read())
    md["format-version"] = 4
    with open(os.path.join(meta, "v99.metadata.json"), "w") as fh:
        json.dump(md, fh)
    with open(os.path.join(meta, "version-hint.text"), "w") as fh:
        fh.write("99")
    lake = IcebergSnapshotLake(spark, t, t + "_i")
    with pytest.raises(ValueError, match="format-version 4"):
        lake.read()


# --- iceberg_v3_delete_rows: the DISTRIBUTED v3 DELETE ----------------------


def test_v3_delete_rows_matches_v2_twin(spark, tmp_path):
    """Predicate delete via executor-written puffin DVs ≡ the v2
    parquet-positional delete of the same predicate."""
    from rottnest_spark.sources.iceberg_write import iceberg_v3_delete_rows

    v2 = str(tmp_path / "d2")
    v3 = str(tmp_path / "d3")
    for t in (v2, v3):
        iceberg_write(_data(spark).repartition(3), t)
    iceberg_delete_rows(spark, v2, "doc_id % 7 = 0")
    iceberg_v3_delete_rows(spark, v3, "doc_id % 7 = 0")
    a = {r.doc_id for r in IcebergSnapshotLake(spark, v2, v2 + "_i").read().collect()}
    b = {r.doc_id for r in IcebergSnapshotLake(spark, v3, v3 + "_i").read().collect()}
    assert a == b == {i for i in range(300) if i % 7 != 0}


def test_v3_delete_rows_merges_and_carries(spark, tmp_path):
    """Second delete: overlapping files get ONE merged DV (spec's
    at-most-one rule), files untouched by it carry their original DV
    forward, and the union of both predicates is gone."""
    from rottnest_spark.sources.iceberg import (
        _current_metadata,
        snapshot_state_from_metadata,
    )
    from rottnest_spark.sources.iceberg_write import iceberg_v3_delete_rows

    t = str(tmp_path / "m3")
    iceberg_write(_data(spark).repartition(3), t)
    iceberg_v3_delete_rows(spark, t, "doc_id % 7 = 0")
    iceberg_v3_delete_rows(spark, t, "doc_id < 30")
    got = {
        r.doc_id
        for r in IcebergSnapshotLake(spark, t, t + "_i").read().collect()
    }
    assert got == {i for i in range(300) if i % 7 != 0 and i >= 30}
    st = snapshot_state_from_metadata(_current_metadata(t), t)
    # at most one DV per data file
    assert len(st["dvs"]) == len({os.path.abspath(k) for k in st["dvs"]})
    for d in st["dvs"].values():
        assert d["puffin"].endswith(".puffin")


def test_v3_delete_rows_nothing_matched_keeps_snapshot(spark, tmp_path):
    from rottnest_spark.sources.iceberg import _current_metadata
    from rottnest_spark.sources.iceberg_write import iceberg_v3_delete_rows

    t = str(tmp_path / "n3")
    iceberg_write(_data(spark), t)
    before = _current_metadata(t)["current-snapshot-id"]
    assert iceberg_v3_delete_rows(spark, t, "doc_id < 0") == before
    assert _current_metadata(t)["current-snapshot-id"] == before


def test_v3_delete_rows_feeds_and_diffs(spark, tmp_path):
    """The distributed delete flows through the cursor feed like the
    fixture-committed DVs do."""
    from rottnest_spark.sources.changes import IcebergChangesCursor
    from rottnest_spark.sources.iceberg import _current_metadata
    from rottnest_spark.sources.iceberg_write import iceberg_v3_delete_rows

    t = str(tmp_path / "f3")
    iceberg_write(_data(spark).repartition(3), t)
    cur = IcebergChangesCursor(spark, t, str(tmp_path / "ck"))
    cur.ack(_current_metadata(t)["current-snapshot-id"])
    iceberg_v3_delete_rows(spark, t, "doc_id % 50 = 0")
    feed, end = cur.poll()
    rows = {(r.doc_id, r._change_type) for r in feed.collect()}
    assert rows == {(i, "delete") for i in range(0, 300, 50)}
    cur.ack(end)


def test_v3_delete_rows_driver_never_collects_positions(spark, tmp_path, monkeypatch):
    """The pack_bins discipline: the only .collect() in the delete is
    descriptor-scale — monkeypatch DataFrame.collect to record row
    shapes and assert no position- or bitmap-carrying frame ever lands
    on the driver."""
    from rottnest_spark.sources.iceberg_write import iceberg_v3_delete_rows

    t = str(tmp_path / "g3")
    iceberg_write(_data(spark).repartition(3), t)

    seen = []
    df_cls = type(spark.range(1))  # the concrete (classic) DataFrame class
    orig = df_cls.collect

    def spy(self):
        rows = orig(self)
        seen.append((tuple(self.columns), len(rows)))
        return rows

    monkeypatch.setattr(df_cls, "collect", spy)
    iceberg_v3_delete_rows(spark, t, "doc_id % 7 = 0")
    monkeypatch.undo()
    assert seen, "the descriptor collect must happen"
    for cols, _n in seen:
        assert "pos" not in cols and "blob" not in cols, cols
        assert "puffin" in cols  # descriptor frame only


# --- iceberg_v3_upsert: keyed MERGE in the v3 DV shape ----------------------


def test_v3_upsert_updates_and_inserts(spark, tmp_path):
    from rottnest_spark.sources.iceberg_write import iceberg_v3_upsert

    t = str(tmp_path / "u3")
    iceberg_write(_data(spark).repartition(3), t)
    lake = IcebergSnapshotLake(spark, t, t + "_i")
    before = {r.doc_id: r.n_chars for r in lake.read().collect()}
    changes = spark.createDataFrame(
        [(k, "xx", -1) for k in (0, 7, 150)] + [(9_000_001, "xx", -2)],
        "doc_id long, lang string, n_chars long",
    )
    iceberg_v3_upsert(spark, changes, t, ["doc_id"])
    after = {r.doc_id: r.n_chars for r in lake.read().collect()}
    assert len(after) == len(before) + 1
    assert after[0] == after[7] == after[150] == -1
    assert after[9_000_001] == -2
    assert after[1] == before[1]  # untouched keys intact


def test_v3_upsert_merges_onto_existing_dvs_and_feeds(spark, tmp_path):
    """Upsert after a delete: re-deleted files merge DVs (at most one per
    file), and the cursor feed reports the old versions out + new in."""
    from rottnest_spark.sources.changes import IcebergChangesCursor
    from rottnest_spark.sources.iceberg import (
        _current_metadata,
        snapshot_state_from_metadata,
    )
    from rottnest_spark.sources.iceberg_write import (
        iceberg_v3_delete_rows,
        iceberg_v3_upsert,
    )

    t = str(tmp_path / "uf3")
    iceberg_write(_data(spark).repartition(3), t)
    iceberg_v3_delete_rows(spark, t, "doc_id % 7 = 0")
    cur = IcebergChangesCursor(spark, t, str(tmp_path / "ck"))
    cur.ack(_current_metadata(t)["current-snapshot-id"])
    changes = spark.createDataFrame(
        [(1, "zz", -5), (2, "zz", -6)], "doc_id long, lang string, n_chars long"
    )
    iceberg_v3_upsert(spark, changes, t, ["doc_id"])
    got = {
        r.doc_id: r.n_chars
        for r in IcebergSnapshotLake(spark, t, t + "_i").read().collect()
    }
    assert got[1] == -5 and got[2] == -6
    assert 7 not in got  # the earlier delete still applies
    st = snapshot_state_from_metadata(_current_metadata(t), t)
    assert len(st["dvs"]) >= 1
    feed, end = cur.poll()
    rows = {(r.doc_id, r.n_chars, r._change_type) for r in feed.collect()}
    assert (1, -5, "insert") in rows and (2, -6, "insert") in rows
    assert (1, 3, "delete") in rows and (2, 6, "delete") in rows
    cur.ack(end)


def test_v3_upsert_pure_inserts_and_duplicate_keys(spark, tmp_path):
    from rottnest_spark.sources.iceberg import (
        _current_metadata,
        snapshot_state_from_metadata,
    )
    from rottnest_spark.sources.iceberg_write import iceberg_v3_upsert

    t = str(tmp_path / "pi3")
    iceberg_write(_data(spark), t)
    inserts = spark.createDataFrame(
        [(9_000_000 + i, "yy", i) for i in range(5)],
        "doc_id long, lang string, n_chars long",
    )
    iceberg_v3_upsert(spark, inserts, t, ["doc_id"])
    lake = IcebergSnapshotLake(spark, t, t + "_i")
    assert lake.read().count() == 305
    # no keys matched: no DVs were written
    assert snapshot_state_from_metadata(_current_metadata(t), t)["dvs"] == {}

    dup = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2)], "doc_id long, lang string, n_chars long"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        iceberg_v3_upsert(spark, dup, t, ["doc_id"])


# --- iceberg_v3_rewrite_deletes: DV compaction -------------------------------


def test_v3_rewrite_materializes_dvs_and_reopens_topk(spark, tmp_path):
    from rottnest_spark.sources.changes import iceberg_snapshot_diff
    from rottnest_spark.sources.iceberg import (
        _current_metadata,
        snapshot_state_from_metadata,
    )
    from rottnest_spark.sources.iceberg_write import (
        iceberg_v3_delete_rows,
        iceberg_v3_rewrite_deletes,
    )

    t = str(tmp_path / "rw3")
    iceberg_write(_data(spark).repartition(3), t)
    pre_snap = iceberg_v3_delete_rows(spark, t, "doc_id % 7 = 0")
    lake = IcebergSnapshotLake(spark, t, t + "_i")
    before = _rows(lake)
    with pytest.raises(ValueError, match="delete source"):
        lake.files  # top-K path refuses while DVs are live
    snap = iceberg_v3_rewrite_deletes(spark, t)
    assert _rows(lake) == before  # rewrite is row-invisible
    assert lake.files  # ...and the top-K path accepts again
    st = snapshot_state_from_metadata(_current_metadata(t), t)
    assert st["dvs"] == {}
    # row-level net diff across the rewrite cancels to zero
    assert iceberg_snapshot_diff(spark, t, pre_snap, snap, net=True).count() == 0


def test_v3_rewrite_noop_and_untouched_files_kept(spark, tmp_path):
    from rottnest_spark.sources.iceberg import (
        _current_metadata,
        snapshot_state_from_metadata,
    )
    from rottnest_spark.sources.iceberg_write import (
        iceberg_v3_delete_rows,
        iceberg_v3_rewrite_deletes,
    )

    t = str(tmp_path / "nt3")
    iceberg_write(_data(spark).repartition(3), t)
    before_files = set(
        snapshot_state_from_metadata(_current_metadata(t), t)["data"]
    )
    # no DVs: rewrite is a no-op returning the current snapshot
    cur = _current_metadata(t)["current-snapshot-id"]
    assert iceberg_v3_rewrite_deletes(spark, t) == cur

    # delete rows confined to a doc_id range that lives in a subset of
    # files; untouched files must keep their exact paths
    iceberg_v3_delete_rows(spark, t, "doc_id < 3")
    iceberg_v3_rewrite_deletes(spark, t)
    after = set(snapshot_state_from_metadata(_current_metadata(t), t)["data"])
    st_dv = snapshot_state_from_metadata(_current_metadata(t), t)["dvs"]
    assert st_dv == {}
    assert before_files & after, "every file rewritten — untouched set lost"


def test_v3_rewrite_after_upsert(spark, tmp_path):
    from rottnest_spark.sources.iceberg_write import (
        iceberg_v3_rewrite_deletes,
        iceberg_v3_upsert,
    )

    t = str(tmp_path / "ru3")
    iceberg_write(_data(spark).repartition(3), t)
    changes = spark.createDataFrame(
        [(5, "xx", -1), (9_000_000, "xx", -2)],
        "doc_id long, lang string, n_chars long",
    )
    iceberg_v3_upsert(spark, changes, t, ["doc_id"])
    lake = IcebergSnapshotLake(spark, t, t + "_i")
    before = {r.doc_id: r.n_chars for r in lake.read().collect()}
    iceberg_v3_rewrite_deletes(spark, t)
    after = {r.doc_id: r.n_chars for r in lake.read().collect()}
    assert after == before
    assert after[5] == -1 and after[9_000_000] == -2
    assert lake.files


def test_v3_append_keeps_dvs_and_feeds(spark, tmp_path):
    """Plain append on a DV-bearing v3 table: new rows in, existing
    deletes still applied, the feed step is insert-only."""
    from rottnest_spark.sources.changes import IcebergChangesCursor
    from rottnest_spark.sources.iceberg import _current_metadata
    from rottnest_spark.sources.iceberg_write import (
        iceberg_v3_append,
        iceberg_v3_delete_rows,
    )

    t = str(tmp_path / "ap3")
    iceberg_write(_data(spark).repartition(3), t)
    iceberg_v3_delete_rows(spark, t, "doc_id % 7 = 0")
    cur = IcebergChangesCursor(spark, t, str(tmp_path / "ck"))
    cur.ack(_current_metadata(t)["current-snapshot-id"])

    new = spark.range(1000, 1005).selectExpr(
        "id AS doc_id", "'zz' AS lang", "id AS n_chars"
    )
    stage = os.path.join(t, "extra")
    new.coalesce(1).write.parquet(stage)
    files = [
        os.path.join(stage, f)
        for f in os.listdir(stage)
        if f.endswith(".parquet")
    ]
    iceberg_v3_append(t, files)

    got = sorted(
        r.doc_id
        for r in IcebergSnapshotLake(spark, t, t + "_i").read().collect()
    )
    assert got == [i for i in range(300) if i % 7 != 0] + list(
        range(1000, 1005)
    )
    feed, end = cur.poll()
    rows = {(r.doc_id, r._change_type) for r in feed.collect()}
    assert rows == {(i, "insert") for i in range(1000, 1005)}
    cur.ack(end)
