"""Storage abstraction for lake file management.

Everything the lake does to its files OUTSIDE of Spark jobs — listing
live data files, publishing staged outputs, retiring replaced files,
manifest read/write, vacuum deletes — goes through this interface, so a
non-POSIX lake (S3/GCS/HDFS via their Python clients) only has to supply
one object instead of patching two dozen `os.*` call sites. This mirrors
the role of the reference's storage utilities (backends/s3_utils.py:
11-109): the engine's planning/commit logic is storage-agnostic; only the
byte transport differs.

Spark itself still reads/writes Parquet through its own Hadoop FS layer
(s3a:// etc.) — this interface covers the lake's METADATA plane: listing,
commit/rename protocols, manifests, retention. The `rename` method is
the commit primitive; on stores without atomic rename (S3), implement it
as copy+delete and rely on the manifest protocol (`repair_files`) for
crash consistency — the protocol was designed to tolerate non-atomic
multi-file swaps from the start.

The default `LocalFS` is plain os/shutil, preserving the exact semantics
the lifecycle tests have always run against.
"""

from __future__ import annotations

import fnmatch
import os
import re
import shutil


def canon_path(p: str) -> str:
    """Canonical form of a lake path for set/join comparisons: file: URIs
    lose the scheme, other URI-schemed paths (s3a://, hdfs://, ...) pass
    through UNTOUCHED — os.path.abspath would mangle them to
    <cwd>/s3a:/... — and plain paths become absolute. Every boundary
    where metadata-derived paths (os.path.join(table_path, rel),
    _rebase outputs — relative whenever table_path is relative) meet
    Spark's `_metadata.file_path` tags (always absolute URIs) must
    normalize through this, or joins silently miss: deleted rows
    resurrect, diffs drop rows, conflict guards compare unrelated keys."""
    if "://" in p:
        return re.sub(r"^file:/+", "/", p) if p.startswith("file:") else p
    return os.path.abspath(p)


def make_task_put():
    """Returns put(path, data) -> None — an EXECUTOR-side byte writer for
    the lake's DATA plane (deletion-vector bins, per-task payloads),
    self-contained (stdlib + pyarrow only, no module refs) so cloudpickle
    ships it by value and executors never need this package importable —
    the repo convention of roaring.make_dv_encoder.

    Why a separate seam from LakeFS: LakeFS drives the METADATA plane
    from the driver, and its remote implementation (HadoopFS) wraps JVM
    gateway handles that cannot pickle into tasks. Data-plane bytes
    written inside tasks follow the same plane Spark's own parquet
    writes use: URI-schemed paths go through pyarrow.fs (s3://, gs://,
    hdfs:// — credentials from the standard env/config chain); plain
    local paths publish atomically via temp-file + os.replace, so
    concurrent task attempts (speculation, retries) overwrite each other
    whole-file and readers never observe partial bytes."""
    import os as _os
    import re as _re

    def put(path: str, data: bytes) -> None:
        if "://" in path and not path.startswith("file:"):
            from pyarrow import fs as _pafs

            filesystem, p = _pafs.FileSystem.from_uri(path)
            with filesystem.open_output_stream(p) as fh:
                fh.write(data)
            return
        p = _re.sub(r"^file:/+", "/", path)
        d = _os.path.dirname(p)
        if d:
            _os.makedirs(d, exist_ok=True)
        tmp = f"{p}.__task__{_os.getpid()}_{_os.urandom(4).hex()}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        _os.replace(tmp, p)

    return put


class LakeFS:
    """Interface: override every method for a remote store."""

    def list_files(self, root: str) -> list[str]:
        """All regular files under `root`, recursive, sorted."""
        raise NotImplementedError

    def listdir(self, path: str) -> list[str]:
        raise NotImplementedError

    def glob(self, pattern: str) -> list[str]:
        """Non-recursive glob (the lake only uses `dir/*.ext` and
        `dir/prefix*` shapes), sorted."""
        raise NotImplementedError

    def exists(self, path: str) -> bool:
        raise NotImplementedError

    def isdir(self, path: str) -> bool:
        raise NotImplementedError

    def makedirs(self, path: str) -> None:
        raise NotImplementedError

    def rename(self, src: str, dst: str) -> None:
        """Publish/replace primitive. Atomic on POSIX; copy+delete on
        object stores (manifest protocol covers the non-atomic window)."""
        raise NotImplementedError

    def remove(self, path: str) -> None:
        raise NotImplementedError

    def rmtree(self, path: str) -> None:
        raise NotImplementedError

    def read_text(self, path: str) -> str:
        raise NotImplementedError

    def write_text(self, path: str, text: str) -> None:
        raise NotImplementedError

    def read_bytes(self, path: str) -> bytes:
        raise NotImplementedError

    def write_bytes(self, path: str, data: bytes) -> None:
        raise NotImplementedError

    def create_exclusive(self, path: str, data: bytes) -> None:
        """Atomic put-if-absent: create `path` with `data`, raising
        FileExistsError if it already exists. The RENAME-FREE commit
        primitive — on POSIX this is O_CREAT|O_EXCL; on S3 it is a
        conditional PUT (If-None-Match: *); both are native operations, so
        commit protocols built on this (the versioned index catalog, the
        Delta/Iceberg log writers) work on object stores with no atomic
        rename."""
        raise NotImplementedError

    def getsize(self, path: str) -> int:
        raise NotImplementedError

    def getmtime(self, path: str) -> float:
        raise NotImplementedError


class LocalFS(LakeFS):
    """POSIX implementation — the default, and the reference semantics
    for every lifecycle test."""

    def list_files(self, root: str) -> list[str]:
        out: list[str] = []
        for r, _dirs, fnames in os.walk(root):
            for fn in fnames:
                out.append(os.path.join(r, fn))
        return sorted(out)

    def listdir(self, path: str) -> list[str]:
        return sorted(os.listdir(path))

    def glob(self, pattern: str) -> list[str]:
        d, pat = os.path.split(pattern)
        if not self.isdir(d):
            return []
        return sorted(
            os.path.join(d, n)
            for n in os.listdir(d)
            if fnmatch.fnmatch(n, pat)
        )

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def rename(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def remove(self, path: str) -> None:
        os.remove(path)

    def rmtree(self, path: str) -> None:
        shutil.rmtree(path, ignore_errors=True)

    def read_text(self, path: str) -> str:
        with open(path) as fh:
            return fh.read()

    def write_text(self, path: str, text: str) -> None:
        # temp + os.replace: checkpoint/manifest writers (CursorCheckpoint
        # docstring) rely on write_text never leaving a torn file behind —
        # a crash mid-write must expose either the old content or the new,
        # not a truncated prefix
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as fh:
            fh.write(text)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, path)

    def read_bytes(self, path: str) -> bytes:
        with open(path, "rb") as fh:
            return fh.read()

    def write_bytes(self, path: str, data: bytes) -> None:
        with open(path, "wb") as fh:
            fh.write(data)

    def create_exclusive(self, path: str, data: bytes) -> None:
        with open(path, "xb") as fh:  # O_CREAT|O_EXCL
            fh.write(data)

    def getsize(self, path: str) -> int:
        return os.path.getsize(path)

    def getmtime(self, path: str) -> float:
        return os.path.getmtime(path)


class HadoopFS(LakeFS):
    """LakeFS over Spark's JVM Hadoop FileSystem — the SAME code path an
    `s3a://` / `hdfs://` / `abfs://` deployment takes (the reference's
    most-used deployment is S3, src/formats/readers/aws_reader.rs:72-133).
    Constructed from the live SparkSession so it shares Spark's Hadoop
    configuration (credentials, endpoints).

    Paths with the `file:` scheme are returned as plain local paths, so a
    lake driven through HadoopFS over local storage behaves identically to
    LocalFS while exercising the Hadoop transport end-to-end — that is the
    in-sandbox integration test for the object-store path.

    `create_exclusive` maps to `FileSystem.create(overwrite=false)`:
    atomic create on HDFS/local; on S3A it is the conditional-create path
    (existence check + conditional PUT on recent Hadoop), the same
    primitive S3A committers rely on.

    `rename` uses FileSystem.rename — on S3A that is copy+delete under
    the hood, which is exactly why the lake's commit protocols (versioned
    catalog snapshots, swap manifests + repair_files) never rely on its
    atomicity."""

    def __init__(self, spark):
        self._jvm = spark.sparkContext._jvm
        self._conf = spark.sparkContext._jsc.hadoopConfiguration()

    # -- plumbing -----------------------------------------------------------

    def _jpath(self, p: str):
        return self._jvm.org.apache.hadoop.fs.Path(p)

    def _fs(self, p: str):
        jp = self._jpath(p)
        return jp.getFileSystem(self._conf), jp

    @staticmethod
    def _to_str(jpath) -> str:
        uri = jpath.toUri()
        if uri.getScheme() in (None, "file"):
            return uri.getPath()
        return jpath.toString()

    # -- interface ----------------------------------------------------------

    def list_files(self, root: str) -> list[str]:
        fs, jp = self._fs(root)
        if not fs.exists(jp):
            return []
        out = []
        it = fs.listFiles(jp, True)
        while it.hasNext():
            out.append(self._to_str(it.next().getPath()))
        return sorted(out)

    def listdir(self, path: str) -> list[str]:
        fs, jp = self._fs(path)
        return sorted(st.getPath().getName() for st in fs.listStatus(jp))

    def glob(self, pattern: str) -> list[str]:
        fs, jp = self._fs(pattern)
        stats = fs.globStatus(jp)
        if stats is None:
            return []
        return sorted(self._to_str(st.getPath()) for st in stats)

    def exists(self, path: str) -> bool:
        fs, jp = self._fs(path)
        return bool(fs.exists(jp))

    def isdir(self, path: str) -> bool:
        fs, jp = self._fs(path)
        return bool(fs.exists(jp) and fs.getFileStatus(jp).isDirectory())

    def makedirs(self, path: str) -> None:
        fs, jp = self._fs(path)
        fs.mkdirs(jp)

    def rename(self, src: str, dst: str) -> None:
        fs, jsrc = self._fs(src)
        jdst = self._jpath(dst)
        if fs.exists(jdst):  # os.replace semantics (LocalFS parity)
            fs.delete(jdst, False)
        if not fs.rename(jsrc, jdst):
            raise OSError(f"hadoop rename failed: {src} -> {dst}")

    def remove(self, path: str) -> None:
        fs, jp = self._fs(path)
        if not fs.delete(jp, False):
            raise FileNotFoundError(path)

    def rmtree(self, path: str) -> None:
        fs, jp = self._fs(path)
        if fs.exists(jp):
            fs.delete(jp, True)

    def read_bytes(self, path: str) -> bytes:
        fs, jp = self._fs(path)
        stream = fs.open(jp)
        try:
            baos = self._jvm.java.io.ByteArrayOutputStream()
            self._jvm.org.apache.hadoop.io.IOUtils.copyBytes(
                stream, baos, 65536, False
            )
            return bytes(baos.toByteArray())
        finally:
            stream.close()

    def read_text(self, path: str) -> str:
        return self.read_bytes(path).decode()

    def _write_stream(self, path: str, data: bytes, overwrite: bool) -> None:
        fs, jp = self._fs(path)
        try:
            stream = fs.create(jp, overwrite)
        except Exception as exc:  # py4j wraps FileAlreadyExistsException
            if "AlreadyExists" in str(exc) or "already exists" in str(exc):
                raise FileExistsError(path) from None
            raise
        try:
            stream.write(bytearray(data))
        finally:
            stream.close()

    def write_text(self, path: str, text: str) -> None:
        self._write_stream(path, text.encode(), overwrite=True)

    def write_bytes(self, path: str, data: bytes) -> None:
        self._write_stream(path, data, overwrite=True)

    def create_exclusive(self, path: str, data: bytes) -> None:
        self._write_stream(path, data, overwrite=False)
        # S3A maps create(overwrite=false) to exists-check-then-PUT, which
        # is only atomic when fs.s3a conditional writes are active (Hadoop
        # 3.4.1+, `fs.s3a.create.conditional.enabled`, default on). The
        # read-back below is BEST-EFFORT NARROWING of the race window on
        # stores without that — NOT a closure: writer A can GET its own
        # bytes before writer B's overwriting PUT lands, and both return
        # success. True put-if-absent requires the store's conditional
        # create; on stores without it, treat concurrent commits to the
        # same table as unsupported rather than relying on this check.
        scheme = path.split("://", 1)[0] if "://" in path else "file"
        if scheme not in ("file",):
            if self.read_bytes(path) != data:
                raise FileExistsError(
                    f"{path}: post-write verification found different "
                    "bytes — a concurrent writer won this version"
                )

    def getsize(self, path: str) -> int:
        fs, jp = self._fs(path)
        return int(fs.getFileStatus(jp).getLen())

    def getmtime(self, path: str) -> float:
        fs, jp = self._fs(path)
        return fs.getFileStatus(jp).getModificationTime() / 1000.0


class RecordingFS(LocalFS):
    """LocalFS that records every interface call — the fake-store test
    double proving lifecycle operations route through the abstraction
    (and a template for real remote implementations: override the same
    methods RecordingFS intercepts)."""

    def __init__(self):
        self.calls: list[tuple] = []

    def _rec(self, op: str, *args) -> None:
        self.calls.append((op, *args))

    def list_files(self, root):
        self._rec("list_files", root)
        return super().list_files(root)

    def glob(self, pattern):
        self._rec("glob", pattern)
        return super().glob(pattern)

    def rename(self, src, dst):
        self._rec("rename", src, dst)
        return super().rename(src, dst)

    def remove(self, path):
        self._rec("remove", path)
        return super().remove(path)

    def rmtree(self, path):
        self._rec("rmtree", path)
        return super().rmtree(path)

    def write_text(self, path, text):
        self._rec("write_text", path)
        return super().write_text(path, text)

    def create_exclusive(self, path, data):
        self._rec("create_exclusive", path)
        return super().create_exclusive(path, data)

    def ops(self, name: str) -> list[tuple]:
        return [c for c in self.calls if c[0] == name]


class FakeObjectStoreFS(LakeFS):
    """Object-store-semantics conformance double, backed by a local
    directory so Spark jobs can still read/write the data files.

    Emulates what S3-class stores actually provide — and withhold:

    - **no atomic rename**: `rename` is copy-then-delete (the S3A
      emulation) and records itself, so tests can assert a commit
      protocol never *depends* on rename, let alone its atomicity;
    - **no directories**: `makedirs` is a no-op; writing ``a/b/c``
      implicitly creates the prefix (keys, not dirs);
    - **conditional PUT**: `create_exclusive` is an exists-check + write
      under the store's own mutex (If-None-Match: *), NOT POSIX
      O_CREAT|O_EXCL — the primitive the rename-free versioned commits
      are designed for;
    - **strong list-after-write** (S3 since 2020), with an optional
      `list_lag` knob that hides the `lag_hidden` most-recent writes
      from listings (exists/read stay strong) to probe protocols under
      the older eventual-consistency model.

    Not a LocalFS subclass on purpose: the catalog's flock fast path must
    skip itself (OCC-only mode) exactly as it would against s3a://.
    """

    def __init__(self, root: str | None = None, list_lag: int = 0):
        import tempfile

        self.root = root or tempfile.mkdtemp(prefix="fake-object-store-")
        self.calls: list[tuple] = []
        self.list_lag = list_lag
        self._recent: list[str] = []  # newest-last write order
        import threading

        self._mutex = threading.Lock()

    def _rec(self, op: str, *args) -> None:
        self.calls.append((op, *args))

    def ops(self, name: str) -> list[tuple]:
        return [c for c in self.calls if c[0] == name]

    def _visible(self, paths: list[str]) -> list[str]:
        if not self.list_lag:
            return paths
        hidden = set(self._recent[-self.list_lag:])
        return [p for p in paths if p not in hidden]

    def _mark_written(self, path: str) -> None:
        self._recent.append(path)

    # -- listing (key-prefix semantics) --------------------------------
    def list_files(self, root):
        self._rec("list_files", root)
        out = []
        for dirpath, _dirs, files in os.walk(root):
            out.extend(os.path.join(dirpath, f) for f in files)
        return self._visible(sorted(out))

    def listdir(self, path):
        self._rec("listdir", path)
        return sorted(os.listdir(path)) if os.path.isdir(path) else []

    def glob(self, pattern):
        self._rec("glob", pattern)
        import glob as _glob

        return self._visible(sorted(_glob.glob(pattern)))

    def exists(self, path):
        return os.path.exists(path)

    def isdir(self, path):
        # a "directory" exists iff some key carries the prefix
        return os.path.isdir(path)

    def makedirs(self, path):
        # object stores have no directories; keys create their prefixes.
        # The local backing store materializes them lazily in _parents().
        self._rec("makedirs", path)

    def _parents(self, path: str) -> None:
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)

    def _put(self, path: str, data: bytes) -> None:
        """Atomic object PUT: a real store's PUT is all-or-nothing — a
        concurrent GET sees either the whole object or none of it, never
        a partial body. The local backing emulates that with a temp-file
        write + os.replace (an emulation detail, NOT a rename the code
        under test gets to rely on — it is not recorded as one)."""
        self._parents(path)
        tmp = f"{path}.__put__{os.getpid()}_{id(data)}"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, path)
        self._mark_written(path)

    # -- mutation -------------------------------------------------------
    def rename(self, src, dst):
        """S3A-style emulation: COPY then DELETE — visible intermediate
        state, no atomicity. Recorded so tests can forbid it entirely
        on commit paths."""
        self._rec("rename", src, dst)
        self._parents(dst)
        with open(src, "rb") as s, open(dst, "wb") as d:
            d.write(s.read())
        os.remove(src)
        self._mark_written(dst)

    def remove(self, path):
        self._rec("remove", path)
        os.remove(path)

    def rmtree(self, path):
        self._rec("rmtree", path)
        import shutil

        shutil.rmtree(path, ignore_errors=True)

    # -- bytes ----------------------------------------------------------
    def read_text(self, path):
        with open(path) as fh:
            return fh.read()

    def read_bytes(self, path):
        with open(path, "rb") as fh:
            return fh.read()

    def write_text(self, path, text):
        self._rec("write_text", path)
        self._put(path, text.encode())

    def write_bytes(self, path, data):
        self._rec("write_bytes", path)
        self._put(path, data)

    def create_exclusive(self, path, data):
        """Conditional PUT (If-None-Match: *): the store's own atomic
        check-and-put, not POSIX O_EXCL — losing writers get
        FileExistsError, the signal the OCC retry loops consume; winners
        publish atomically like any PUT (readers never see partials)."""
        self._rec("create_exclusive", path)
        with self._mutex:
            if os.path.exists(path):
                raise FileExistsError(path)
            self._put(path, data)

    def getsize(self, path):
        return os.path.getsize(path)

    def getmtime(self, path):
        return os.path.getmtime(path)
