"""CDC merge: pure-DataFrame apply (ops/merge.py) and file-pruned
copy-on-write MERGE INTO (ParquetLake.merge_into)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from rottnest_spark.core.lake import ParquetLake
from rottnest_spark.ops.merge import latest_changes, merge_changes


def _mk_changes(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, v string, seq bigint, op string"
    )


@pytest.fixture()
def target(spark):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k bigint, v string"
    )


def test_latest_change_per_key_wins(spark):
    ch = _mk_changes(
        spark,
        [
            (1, "old", 1, "U"),
            (1, "new", 2, "U"),
            (2, "x", 1, "U"),
            (2, None, 2, "D"),
        ],
    )
    final = {r["k"]: (r["v"], r["op"]) for r in
             latest_changes(ch, ["k"], "seq").collect()}
    assert final == {1: ("new", "U"), 2: (None, "D")}


def test_merge_changes_upsert_delete_insert(spark, target):
    ch = _mk_changes(
        spark,
        [
            (3, "updated", 1, "U"),   # update existing
            (5, None, 1, "D"),        # delete existing
            (42, "inserted", 1, "I"), # insert new key
        ],
    )
    out = {r["k"]: r["v"] for r in
           merge_changes(target, ch, ["k"]).collect()}
    assert out[3] == "updated"
    assert 5 not in out
    assert out[42] == "inserted"
    assert len(out) == 10  # 10 - 1 delete + 1 insert
    # untouched rows pass through
    assert out[0] == "v0" and out[9] == "v9"


def test_merge_changes_delete_then_reinsert(spark, target):
    ch = _mk_changes(spark, [(7, None, 1, "D"), (7, "back", 2, "U")])
    out = {r["k"]: r["v"] for r in
           merge_changes(target, ch, ["k"]).collect()}
    assert out[7] == "back"


@pytest.fixture()
def keyed_lake(spark, tmp_path):
    """4 key-range-disjoint files (0-99, 100-199, ...) — the clustered
    layout footer pruning needs."""
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    for part in range(4):
        df = spark.createDataFrame(
            [(part * 100 + i, f"v{part * 100 + i}") for i in range(100)],
            "k bigint, v string",
        ).coalesce(1)
        df.write.parquet(str(tmp_path / f"stage{part}"))
        src = glob.glob(str(tmp_path / f"stage{part}" / "part-*.parquet"))[0]
        os.replace(src, os.path.join(data_dir, f"part{part}.parquet"))
    return ParquetLake(spark, data_dir, str(tmp_path / "idx"))


def test_merge_into_rewrites_only_touched_files(spark, keyed_lake):
    before = {f: os.path.getmtime(f) for f in keyed_lake.files}
    ch = _mk_changes(
        spark,
        [
            (5, "upd5", 1, "U"),      # file 0
            (150, None, 1, "D"),      # file 1
            (9999, "new", 1, "I"),    # outside every range: pure insert
        ],
    )
    stats = keyed_lake.merge_into(ch, "k")
    # files 2 and 3 hold keys 200-399: no change key in range → untouched
    assert stats["pruned"] == 2
    untouched = [f for f in before if os.path.exists(f)]
    assert len(untouched) == 2
    assert all(os.path.getmtime(f) == before[f] for f in untouched)
    out = {r["k"]: r["v"] for r in keyed_lake.read().collect()}
    assert out[5] == "upd5"
    assert 150 not in out
    assert out[9999] == "new"
    assert len(out) == 400  # 400 - 1 delete + 1 insert

    # result identical to the pure-DataFrame merge over the original data
    assert out[0] == "v0" and out[399] == "v399"


def test_merge_into_matches_full_recompute(spark, keyed_lake):
    original = keyed_lake.read()
    ch = _mk_changes(
        spark,
        [(k, f"u{k}", 1, "U") for k in (3, 101, 250, 399)]
        + [(k, None, 1, "D") for k in (7, 205)]
        + [(1000, "i1000", 1, "I")],
    )
    expected = sorted(
        (r["k"], r["v"])
        for r in merge_changes(original, ch, ["k"]).collect()
    )
    keyed_lake.merge_into(ch, "k")
    got = sorted((r["k"], r["v"]) for r in keyed_lake.read().collect())
    assert got == expected


def test_merge_into_pure_insert_appends(spark, keyed_lake):
    n_before = len(keyed_lake.files)
    ch = _mk_changes(spark, [(5000, "late", 1, "I")])
    stats = keyed_lake.merge_into(ch, "k")
    assert stats["rewritten"] == []
    assert stats["pruned"] == n_before
    out = {r["k"]: r["v"] for r in keyed_lake.read().collect()}
    assert out[5000] == "late" and len(out) == 401


def test_merge_into_search_still_exact_after_merge(spark, keyed_lake):
    """Index entries over replaced files go stale, not wrong: search after
    a merge returns the merged truth (stale candidates dropped, new files
    scanned in-situ)."""
    from rottnest_spark.indices.exact import ExactIndex

    idx = ExactIndex()
    keyed_lake.build_index(idx, "k")
    ch = _mk_changes(spark, [(150, None, 1, "D"), (155, "upd", 1, "U")])
    keyed_lake.merge_into(ch, "k")
    assert keyed_lake.search(idx, "k", 150).count() == 0
    got = keyed_lake.search(idx, "k", 155).collect()
    assert len(got) == 1 and got[0]["v"] == "upd"
    # untouched file still served by its (live) index entry
    assert keyed_lake.search(idx, "k", 250).count() == 1


def test_stream_merge_maintenance(spark, keyed_lake, tmp_path):
    """Change files land -> the lake converges to the merged state; a
    second drain with no new files is a no-op (checkpointed)."""
    import os

    from rottnest_spark.streaming.cdc import stream_merge_maintenance

    ch_dir = str(tmp_path / "changes")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ch_dir)
    schema = "k bigint, v string, seq bigint, op string"
    _mk_changes(
        spark, [(5, "s-upd", 1, "U"), (150, None, 1, "D")]
    ).coalesce(1).write.mode("append").parquet(ch_dir)
    stats = stream_merge_maintenance(
        spark, ch_dir, schema, keyed_lake, "k", ckpt
    )
    assert len(stats) == 1 and len(stats[0]["rewritten"]) == 2
    out = {r["k"]: r["v"] for r in keyed_lake.read().collect()}
    assert out[5] == "s-upd" and 150 not in out and len(out) == 399

    # drain again: committed batch is not re-delivered
    stats2 = stream_merge_maintenance(
        spark, ch_dir, schema, keyed_lake, "k", ckpt
    )
    assert stats2 == []

    # a later change file supersedes the first (seq monotone)
    _mk_changes(spark, [(5, "s-upd2", 2, "U")]).coalesce(1).write.mode(
        "append"
    ).parquet(ch_dir)
    stream_merge_maintenance(spark, ch_dir, schema, keyed_lake, "k", ckpt)
    out2 = {r["k"]: r["v"] for r in keyed_lake.read().collect()}
    assert out2[5] == "s-upd2" and len(out2) == 399


def test_refresh_indices_after_merge(spark, keyed_lake):
    """refresh_indices reconstructs each index from its catalog config,
    vacuums entries orphaned by the merge, and covers the merged files —
    the one-call upkeep for the post-merge lake."""
    from rottnest_spark.indices.exact import ExactIndex

    idx = ExactIndex()
    keyed_lake.build_index(idx, "k")
    keyed_lake.merge_into(
        _mk_changes(spark, [(5, "upd", 1, "U"), (350, None, 1, "D")]), "k"
    )
    report = keyed_lake.refresh_indices()
    assert report["vacuumed"]  # entries over the 2 replaced files
    assert report["built"].get("exact:k")
    # full coverage again: no unindexed remainder
    assert not keyed_lake.maintenance_report()["unindexed"]["exact:k"]
    # and the refreshed index serves exact results
    got = keyed_lake.search(idx, "k", 5).collect()
    assert len(got) == 1 and got[0]["v"] == "upd"
    assert keyed_lake.search(idx, "k", 350).count() == 0


def test_append_then_refresh(spark, keyed_lake):
    new = spark.createDataFrame(
        [(500 + i, f"n{i}") for i in range(10)], "k bigint, v string"
    )
    files = keyed_lake.append(new)
    assert len(files) >= 1 and all(os.path.exists(f) for f in files)
    assert keyed_lake.read().count() == 410
    # unindexed until refresh; search stays exact via in-situ scan
    from rottnest_spark.indices.exact import ExactIndex

    idx = ExactIndex()
    keyed_lake.build_index(idx, "k")
    assert keyed_lake.search(idx, "k", 505).count() == 1


def test_delete_matching_prunes_and_deletes(spark, keyed_lake):
    from rottnest_spark.indices.exact import ExactIndex

    idx = ExactIndex()
    keyed_lake.build_index(idx, "k")
    before = set(keyed_lake.files)
    st = keyed_lake.delete_matching(idx, "k", (150, 160))
    assert st == {"rewritten": 1, "pruned": 3, "n_deleted": 11}
    out = keyed_lake.read()
    assert out.count() == 389
    assert out.filter((F.col("k") >= 150) & (F.col("k") <= 160)).count() == 0
    # only the one touched file churned
    assert len(before & set(keyed_lake.files)) == 3


def test_delete_matching_substring_predicate(spark, tmp_path):
    from rottnest_spark.indices.substring import SubstringIndex

    df = spark.createDataFrame(
        [(i, "purge me please" if i % 10 == 0 else f"keep row {i}")
         for i in range(100)],
        "id bigint, text string",
    )
    data = str(tmp_path / "d")
    df.repartition(2).write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "i"))
    sub = SubstringIndex()
    lake.build_index(sub, "text")
    st = lake.delete_matching(sub, "text", "purge me")
    assert st["n_deleted"] == 10
    assert lake.read().count() == 90
    assert lake.search(sub, "text", "purge me").count() == 0


def test_delete_matching_no_match_leaves_files(spark, keyed_lake):
    from rottnest_spark.indices.exact import ExactIndex

    idx = ExactIndex()
    keyed_lake.build_index(idx, "k")
    before = {f: os.path.getmtime(f) for f in keyed_lake.files}
    st = keyed_lake.delete_matching(idx, "k", 99999)
    assert st["n_deleted"] == 0 and st["rewritten"] == 0
    assert {f: os.path.getmtime(f) for f in keyed_lake.files} == before


def test_merge_changes_partial_update_cols(spark):
    from rottnest_spark.ops.merge import merge_changes

    target = spark.createDataFrame(
        [(1, "a1", "b1"), (2, "a2", "b2"), (3, "a3", "b3")],
        "k bigint, a string, b string",
    )
    ch = spark.createDataFrame(
        [
            (2, "aX", "bX", 1, "U"),   # only b may change
            (3, None, None, 1, "D"),
            (9, "a9", "b9", 1, "I"),   # insert takes the full payload
        ],
        "k bigint, a string, b string, seq bigint, op string",
    )
    got = {
        r["k"]: (r["a"], r["b"])
        for r in merge_changes(target, ch, ["k"], update_cols=["b"]).collect()
    }
    assert got == {
        1: ("a1", "b1"),
        2: ("a2", "bX"),  # a kept from target, b updated
        9: ("a9", "b9"),
    }


def test_merge_into_empty_changes_is_noop(spark, keyed_lake):
    ch = _mk_changes(spark, []).limit(0) if False else spark.createDataFrame(
        [], "k bigint, v string, seq bigint, op string"
    )
    stats = keyed_lake.merge_into(ch, "k")
    assert stats["rewritten"] == [] and stats["new_files"] == []
    assert keyed_lake.read().count() == 400


def test_merge_into_null_key_rejected(spark, keyed_lake):
    """A NULL merge key has no row identity — merge_into must refuse it
    (the check rides the prune's bounded key collect, so both the
    bounded path and the oversized fall-back path must raise)."""
    ch = _mk_changes(spark, [(1, "x", 1, "U"), (None, "y", 1, "U")])
    with pytest.raises(ValueError, match="NULL values in key"):
        keyed_lake.merge_into(ch, "k")
    # oversized batch: the fall-back path re-checks nulls explicitly
    with pytest.raises(ValueError, match="NULL values in key"):
        keyed_lake.merge_into(ch, "k", max_change_keys=1)
    # lake unchanged by the refused merges
    assert keyed_lake.read().count() == 400


def test_merge_into_all_deletes_removes_file(spark, keyed_lake):
    """Deleting every key of one file leaves 3 files and 300 rows."""
    ch = _mk_changes(spark, [(k, None, 1, "D") for k in range(100, 200)])
    keyed_lake.merge_into(ch, "k")
    assert keyed_lake.read().count() == 300
    got = {r["k"] for r in keyed_lake.read().select("k").collect()}
    assert not any(100 <= k < 200 for k in got)


def test_delete_matching_rowgroup_granular_index(spark, tmp_path):
    """delete_matching widens row-group candidates to files correctly."""
    import pyarrow.parquet as papq

    from rottnest_spark.indices.exact import ExactIndex

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(2000)], "k bigint, v string"
    )
    data = str(tmp_path / "d")
    os.makedirs(data)
    df.coalesce(1).write.parquet(str(tmp_path / "s"))
    src = glob.glob(str(tmp_path / "s" / "part-*.parquet"))[0]
    papq.write_table(
        papq.read_table(src), os.path.join(data, "f.parquet"),
        row_group_size=256,
    )
    lake = ParquetLake(spark, data, str(tmp_path / "i"))
    idx = ExactIndex(granularity="row_group")
    lake.build_index(idx, "k")
    st = lake.delete_matching(idx, "k", (500, 520))
    assert st["n_deleted"] == 21
    assert lake.read().count() == 1979


def test_merge_into_partial_update_cols(spark, keyed_lake):
    ch = spark.createDataFrame(
        [(5, "IGNORED", 1, "U")], "k bigint, v string, seq bigint, op string"
    )
    # v is NOT an update target -> row keeps its target value
    keyed_lake.merge_into(ch, "k", update_cols=[])
    out = {r["k"]: r["v"] for r in keyed_lake.read().collect()}
    assert out[5] == "v5" and len(out) == 400


# -- time travel -------------------------------------------------------------


@pytest.fixture()
def hist_lake(spark, tmp_path):
    data_dir = str(tmp_path / "data")
    os.makedirs(data_dir)
    for part in range(4):
        df = spark.createDataFrame(
            [(part * 100 + i, f"v{part * 100 + i}") for i in range(100)],
            "k bigint, v string",
        ).coalesce(1)
        df.write.parquet(str(tmp_path / f"stage{part}"))
        src = glob.glob(str(tmp_path / f"stage{part}" / "part-*.parquet"))[0]
        os.replace(src, os.path.join(data_dir, f"part{part}.parquet"))
    return ParquetLake(
        spark, data_dir, str(tmp_path / "idx"), retain_history=True
    )


def test_time_travel_across_merge_and_delete(spark, hist_lake):
    from rottnest_spark.indices.exact import ExactIndex

    # op 1: merge (update + delete)
    hist_lake.merge_into(
        _mk_changes(spark, [(5, "upd", 1, "U"), (150, None, 1, "D")]), "k"
    )
    # op 2: predicate delete
    idx = ExactIndex()
    hist_lake.build_index(idx, "k")
    hist_lake.delete_matching(idx, "k", (200, 210))
    assert hist_lake.snapshots() == [0, 1]

    # live state reflects both ops
    live = {r["k"]: r["v"] for r in hist_lake.read().collect()}
    assert live[5] == "upd" and 150 not in live and 205 not in live
    assert len(live) == 388

    # snapshot 0 = original table
    s0 = {r["k"]: r["v"] for r in hist_lake.as_of(0).read().collect()}
    assert len(s0) == 400 and s0[5] == "v5" and s0[150] == "v150"

    # snapshot 1 = after merge, before delete
    s1 = {r["k"]: r["v"] for r in hist_lake.as_of(1).read().collect()}
    assert len(s1) == 399 and s1[5] == "upd" and 150 not in s1 and s1[205] == "v205"


def test_vacuum_history_bounds_retention(spark, hist_lake):
    hist_lake.merge_into(_mk_changes(spark, [(5, "a", 1, "U")]), "k")
    hist_lake.merge_into(_mk_changes(spark, [(5, "b", 2, "U")]), "k")
    assert hist_lake.snapshots() == [0, 1]
    removed = hist_lake.vacuum_history(keep_last=1)
    assert hist_lake.snapshots() == [1]
    # newest snapshot still reconstructs; oldest is gone
    assert {r["v"] for r in hist_lake.as_of(1).read().filter(
        F.col("k") == 5
    ).collect()} == {"a"}
    with pytest.raises(FileNotFoundError):
        hist_lake.as_of(0)
    assert removed  # something was actually reclaimed


def test_table_diff_roundtrip_law(spark):
    from rottnest_spark.ops.merge import merge_changes, table_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], "k bigint, v string"
    )
    diff = table_diff(old, new, ["k"])
    ops = {(r["k"], r["op"]) for r in diff.collect()}
    assert ops == {(2, "U"), (3, "D"), (4, "U")}  # unchanged key 1 absent
    merged = sorted(
        (r["k"], r["v"]) for r in merge_changes(old, diff, ["k"]).collect()
    )
    assert merged == sorted((r["k"], r["v"]) for r in new.collect())


def test_snapshot_diff_prunes_to_changed_files(spark, hist_lake):
    from rottnest_spark.ops.merge import merge_changes, snapshot_diff

    hist_lake.merge_into(
        _mk_changes(spark, [(5, "upd", 1, "U"), (150, None, 1, "D"),
                            (9999, "new", 1, "I")]), "k"
    )
    diff = snapshot_diff(hist_lake, 0, None, "k")
    ops = {(r["k"], r["op"]) for r in diff.collect()}
    assert ops == {(5, "U"), (150, "D"), (9999, "U")}
    # the law: merge the derived feed onto the old snapshot -> live state
    merged = sorted(
        (r["k"], r["v"])
        for r in merge_changes(
            hist_lake.as_of(0).read(), diff, ["k"]
        ).collect()
    )
    live = sorted((r["k"], r["v"]) for r in hist_lake.read().collect())
    assert merged == live


def test_merge_into_empty_lake_is_pure_insert(spark, tmp_path):
    data = str(tmp_path / "empty_lake")
    os.makedirs(data)
    lake = ParquetLake(spark, data, str(tmp_path / "idx"))
    st = lake.merge_into(
        _mk_changes(spark, [(1, "a", 1, "I"), (2, None, 1, "D")]), "k"
    )
    assert len(st["new_files"]) >= 1
    out = {r["k"]: r["v"] for r in lake.read().collect()}
    assert out == {1: "a"}  # the delete of an absent key is a no-op
