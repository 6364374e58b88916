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
import shutil


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
        with open(path, "w") as fh:
            fh.write(text)

    def getsize(self, path: str) -> int:
        return os.path.getsize(path)

    def getmtime(self, path: str) -> float:
        return os.path.getmtime(path)


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

    def ops(self, name: str) -> list[tuple]:
        return [c for c in self.calls if c[0] == name]
