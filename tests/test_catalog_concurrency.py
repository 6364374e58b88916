"""Concurrent-writer catalog safety: mutations serialize under the flock,
and racing build commits resolve to disjoint coverage (never a lost
update, never a double-covered file)."""

import multiprocessing as mp
import os

from rottnest_spark.core.catalog import IndexCatalog


def _rec(name: str, files: list[str]) -> dict:
    return {
        "index_name": name,
        "index_type": "exact",
        "column_name": "k",
        "index_path": f"/tmp/idx/{name}",
        "file_paths": files,
        "record_counts": [1] * len(files),
        "rows_indexed": len(files),
        "config": "{}",
    }


def _worker(args):
    cat_dir, wid, n = args
    cat = IndexCatalog(cat_dir)
    for i in range(n):
        cat.append(_rec(f"w{wid}_{i}", [f"/data/w{wid}_{i}.parquet"]))
    return wid


def test_concurrent_appends_lose_nothing(tmp_path):
    """8 processes x 8 appends race the read-modify-write; the flock must
    serialize them — without it this reliably drops entries."""
    cat_dir = str(tmp_path / "cat")
    n_proc, n_each = 8, 8
    with mp.Pool(n_proc) as pool:
        pool.map(_worker, [(cat_dir, w, n_each) for w in range(n_proc)])
    cat = IndexCatalog(cat_dir)
    names = {e["index_name"] for e in cat.entries()}
    assert len(names) == n_proc * n_each
    cat.validate()


def test_commit_build_resolves_coverage_race(tmp_path):
    """Two builds that planned overlapping file sets: the second commit
    keeps only still-uncovered files; a fully-covered commit returns []
    and writes nothing."""
    cat = IndexCatalog(str(tmp_path / "cat"))
    a = cat.commit_build(_rec("a", ["/d/1.parquet", "/d/2.parquet"]))
    assert a == ["/d/1.parquet", "/d/2.parquet"]
    # overlapping commit: only the new file survives
    b = cat.commit_build(
        _rec("b", ["/d/2.parquet", "/d/3.parquet"])
    )
    assert b == ["/d/3.parquet"]
    # fully-covered commit: lost the race entirely, no entry written
    c = cat.commit_build(_rec("c", ["/d/1.parquet", "/d/3.parquet"]))
    assert c == []
    names = {e["index_name"] for e in cat.entries()}
    assert names == {"a", "b"}
    cat.validate()  # disjoint coverage invariant holds
    # record_counts trimmed in lockstep with file_paths
    eb = [e for e in cat.entries() if e["index_name"] == "b"][0]
    assert eb["file_paths"] == ["/d/3.parquet"]
    assert eb["record_counts"] == [1] and eb["rows_indexed"] == 1


def test_lock_file_invisible_to_lake_listing(tmp_path):
    cat = IndexCatalog(str(tmp_path / "cat"))
    cat.append(_rec("x", ["/d/x.parquet"]))
    assert os.path.exists(str(tmp_path / "cat" / ".lock"))
    # dot-prefixed: the lake's file listing convention skips it
    assert all(
        not os.path.basename(p).startswith(".lock")
        for p in [str(tmp_path / "cat" / "catalog.parquet")]
    )
