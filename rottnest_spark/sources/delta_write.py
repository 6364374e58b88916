"""Minimal Delta Lake log WRITER — upgrading the S8 Delta backend from
read-only snapshot listing to a round-trip backend (the reference's
backends/delta.py:12-96 is read-only; this exceeds it).

Emits the public Delta transaction-log JSON protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md): commit files
`_delta_log/NNNNNNNNNNNNNNNNNNNN.json` of newline-delimited actions —
`protocol` + `metaData` in commit 0, `add` / `remove` for data-file
changes — plus optional single-part parquet checkpoints with a
`_last_checkpoint` pointer. `sources/delta.py` (and any spec-conforming
Delta reader) replays these.

Scope notes, stated rather than hidden:
- single-writer: version allocation is max-existing + 1 with an
  exclusive-create (`open(..., "x")`) commit, so two racing writers
  cannot BOTH claim a version — the loser gets FileExistsError and
  retries (object stores: put-if-absent, same contract);
- hive-layout partitioned tables supported (round 5): partitionValues
  parse from `col=value/` path segments at commit time, metaData carries
  partitionColumns + a schema that includes them; rewriting DML on
  partitioned format-backed lakes is refused up front (see
  sources/writable.py) rather than committing wrong partition values;
- checkpoints carry `protocol`/`metaData`/`add` rows (what a reader
  needs to reconstruct the snapshot without older commits).
"""

from __future__ import annotations

from collections.abc import Callable

import json
import os
import time
import uuid

from rottnest_spark.core.fs import LakeFS, LocalFS
from rottnest_spark.core.tuning import cluster_for_hive_write
from rottnest_spark.sources.reader import uri_path_col as _uri_path

PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}


def _log_dir(table_path: str) -> str:
    return os.path.join(table_path, "_delta_log")


def _schema_string(parquet_file: str) -> str:
    """Spark-JSON schemaString derived from the parquet footer (what the
    metaData action requires)."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    return from_arrow_schema(pq.ParquetFile(parquet_file).schema_arrow).json()


def _is_delta(log_dir: str, fs: LakeFS) -> bool:
    """A table is Delta if it has commits OR a checkpoint — a checkpointed
    table whose pre-checkpoint commits were vacuumed is still valid."""
    if fs.glob(os.path.join(log_dir, "*.json")):
        return True
    return bool(
        fs.exists(os.path.join(log_dir, "_last_checkpoint"))
        or fs.glob(os.path.join(log_dir, "*.checkpoint.parquet"))
    )


def _next_version(log_dir: str, fs: LakeFS) -> int:
    from rottnest_spark.sources.delta import _checkpoint_parts

    versions = [
        int(os.path.basename(p).split(".")[0])
        for p in fs.glob(os.path.join(log_dir, "*.json"))
    ]
    cp_version, _ = _checkpoint_parts(log_dir, fs)
    versions.append(cp_version)  # -1 when absent
    return max(versions) + 1


def _hive_partition_values(
    table_path: str, f: str, partition_columns: list[str]
) -> dict:
    """Parse `col=value` path segments (Spark/Hive layout) into the add
    action's partitionValues map. `__HIVE_DEFAULT_PARTITION__` is the
    hive null sentinel -> JSON null. Raises when a declared partition
    column is missing from the path — a file landed outside the layout
    (e.g. a root-level rewrite on a partitioned table) would otherwise
    be committed with silently-wrong partition values."""
    from urllib.parse import unquote

    rel = os.path.relpath(f, table_path)
    got: dict = {}
    for seg in rel.split(os.sep)[:-1]:
        if "=" in seg:
            k, _, v = seg.partition("=")
            got[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
    missing = [c for c in partition_columns if c not in got]
    if missing:
        raise ValueError(
            f"data file {rel!r} lacks hive path segments for partition "
            f"column(s) {missing} — cannot derive partitionValues"
        )
    return {c: got[c] for c in partition_columns}


def _add_action(
    table_path: str,
    f: str,
    partition_columns: list[str] | None = None,
    fs: LakeFS | None = None,
) -> dict:
    fs = fs or LocalFS()
    rel = os.path.relpath(f, table_path)
    pvals = (
        _hive_partition_values(table_path, f, partition_columns)
        if partition_columns
        else {}
    )
    return {
        "add": {
            "path": rel,
            "partitionValues": pvals,
            "size": fs.getsize(f),
            "modificationTime": int(fs.getmtime(f) * 1000),
            "dataChange": True,
        }
    }


def _num_rows(path: str, fs: LakeFS) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    return pq.ParquetFile(
        pa.BufferReader(fs.read_bytes(path))
    ).metadata.num_rows


def _stamp_row_tracking(
    log_dir: str, version: int, actions: list[dict], fs: LakeFS
) -> list[dict]:
    """ROW TRACKING hook on every commit (PROTOCOL.md Row Tracking):
    when `delta.enableRowTracking` is set, each add action carries a
    baseRowId — PRESERVED for re-adds of a live file (DV attachments
    re-commit the same path; losing the id there would re-mint every
    row on every delete) and freshly assigned past the
    rowIdHighWaterMark for new files — plus defaultRowCommitVersion,
    and the `delta.rowTracking` domainMetadata action advances the
    mark in the SAME commit. No-op (zero extra log reads beyond the
    metaData lookup) when the property is off."""
    from rottnest_spark.sources.delta import (
        delta_row_id_state,
        delta_row_tracking_enabled,
        delta_table_meta,
    )

    table_path = os.path.dirname(log_dir)
    has_adds = any("add" in a for a in actions)
    if not has_adds:
        return actions
    try:
        meta = delta_table_meta(table_path, fs=fs)
    except ValueError:
        return actions  # commit 0 of a fresh table — no prior metaData
    if not meta or not delta_row_tracking_enabled(meta):
        return actions
    state, hwm = delta_row_id_state(table_path, fs=fs)
    by_rel = {
        os.path.relpath(p, table_path): v for p, v in state.items()
    }
    if hwm is None:
        hwm = -1
        for p, (base, _v) in state.items():
            hwm = max(hwm, base + _num_rows(p, fs) - 1)
    next_id = hwm + 1
    out = []
    for a in actions:
        if "add" not in a:
            out.append(a)
            continue
        rec = dict(a["add"])
        prior = by_rel.get(rec["path"])
        if rec.get("baseRowId") is not None:
            pass  # already stamped (retry loops re-submit actions)
        elif prior is not None:
            rec["baseRowId"] = prior[0]
            if prior[1] is not None:
                rec["defaultRowCommitVersion"] = prior[1]
        else:
            rec["baseRowId"] = next_id
            rec["defaultRowCommitVersion"] = version
            next_id += _num_rows(
                os.path.join(table_path, rec["path"]), fs
            )
        out.append({"add": rec})
    if next_id - 1 != hwm:
        out.append(
            {
                "domainMetadata": {
                    "domain": "delta.rowTracking",
                    "configuration": json.dumps(
                        {"rowIdHighWaterMark": next_id - 1}
                    ),
                    "removed": False,
                }
            }
        )
    return out


def _write_commit(
    log_dir: str, version: int, actions: list[dict], fs: LakeFS
) -> int:
    """Exclusive-create the commit file — the Delta single-version-wins
    contract. Raises FileExistsError on a concurrent writer's win."""
    fs.makedirs(log_dir)
    actions = _stamp_row_tracking(log_dir, version, actions, fs)
    path = os.path.join(log_dir, f"{version:020d}.json")
    body = "".join(json.dumps(a) + "\n" for a in actions)
    # put-if-absent through the FS seam: O_CREAT|O_EXCL locally, the
    # store's conditional PUT (with post-write verification) remotely —
    # the same rename-free discipline as the versioned index catalog.
    fs.create_exclusive(path, body.encode())
    return version


def delta_convert(
    table_path: str,
    fs: LakeFS | None = None,
    partition_columns: list[str] | None = None,
    schema_string: str | None = None,
) -> int:
    """Convert a plain parquet directory into a Delta table: commit 0 =
    protocol + metaData + one add per existing data file (Delta's
    CONVERT TO DELTA). Returns the committed version (0). Refuses if a
    log already exists.

    `partition_columns` converts a hive-layout directory: each add's
    partitionValues parse from its `col=value/` path segments. The
    schemaString must then include the partition columns (data files do
    NOT carry them physically) — pass `schema_string` (Spark
    StructType.json()) with the true types; without it, hive convention
    applies and partition columns are appended as strings."""
    fs = fs or LocalFS()
    log_dir = _log_dir(table_path)
    partition_columns = list(partition_columns or [])
    if _is_delta(log_dir, fs):
        raise ValueError(f"{table_path} already has a _delta_log")
    data = [
        f
        for f in fs.list_files(table_path)
        # segment check, not substring: a TABLE PATH containing
        # "_delta_log" in some parent dir name must not hide every file
        if f.endswith(".parquet")
        and "_delta_log"
        not in os.path.relpath(f, table_path).split(os.sep)
    ]
    if not data:
        raise ValueError(f"{table_path} has no parquet data files to convert")
    ss = schema_string or _schema_string(data[0])
    if partition_columns and schema_string is None:
        s = json.loads(ss)
        have = {f["name"] for f in s["fields"]}
        for c in partition_columns:
            if c not in have:
                s["fields"].append(
                    {
                        "name": c,
                        "type": "string",
                        "nullable": True,
                        "metadata": {},
                    }
                )
        ss = json.dumps(s)
    meta = {
        "metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": ss,
            "partitionColumns": partition_columns,
            "configuration": {},
            "createdTime": int(time.time() * 1000),
        }
    }
    actions = [{"protocol": PROTOCOL}, meta]
    actions += [
        _add_action(table_path, f, partition_columns) for f in sorted(data)
    ]
    return _write_commit(log_dir, 0, actions, fs)


def delta_commit(
    table_path: str,
    add: list[str] | None = None,
    remove: list[str] | None = None,
    fs: LakeFS | None = None,
) -> int:
    """Commit a data-file change set (paths under `table_path`). Returns
    the new version. add+remove in ONE commit is the atomic rewrite form
    (compaction, copy-on-write merge)."""
    fs = fs or LocalFS()
    log_dir = _log_dir(table_path)
    if not _is_delta(log_dir, fs):
        raise ValueError(
            f"{table_path} is not a Delta table — delta_convert it first"
        )
    from rottnest_spark.sources.delta import delta_partition_columns

    pcols = delta_partition_columns(table_path, fs=fs)
    now = int(time.time() * 1000)
    actions: list[dict] = []
    for f in sorted(add or []):
        actions.append(_add_action(table_path, f, pcols, fs=fs))
    for f in sorted(remove or []):
        actions.append(
            {
                "remove": {
                    "path": os.path.relpath(f, table_path),
                    "deletionTimestamp": now,
                    "dataChange": True,
                }
            }
        )
    if not actions:
        raise ValueError("empty commit — nothing to add or remove")
    return _write_commit(log_dir, _next_version(log_dir, fs), actions, fs)


def delta_commit_retry(
    table_path: str,
    add: list[str] | None = None,
    remove: list[str] | None = None,
    fs: LakeFS | None = None,
    max_retries: int = 20,
) -> int:
    """Optimistic-concurrency commit: on losing a version race
    (FileExistsError from the exclusive create), re-read the log and
    retry at the next version — with Delta's conflict semantics:

    - pure ADDs always retry blindly (appends commute);
    - REMOVEs revalidate against the winner's snapshot first: if a file
      this commit wants to remove is no longer live, a concurrent writer
      removed (rewrote) it — retrying blindly would corrupt the table,
      so a ConcurrentDeleteError-style ValueError is raised for the
      caller to re-plan its rewrite.
    """
    fs = fs or LocalFS()
    last: Exception | None = None
    for _ in range(max_retries):
        try:
            return delta_commit(table_path, add=add, remove=remove, fs=fs)
        except FileExistsError as exc:
            last = exc
            if remove:
                from rottnest_spark.core.fs import canon_path
                from rottnest_spark.sources.delta import delta_live_files

                live = {
                    canon_path(p)
                    for p in delta_live_files(
                        table_path, fs=fs, on_deletes="ignore"
                    )
                }
                gone = [f for f in remove if canon_path(f) not in live]
                if gone:
                    raise ValueError(
                        "concurrent writer removed files this commit "
                        f"also removes: {gone} — re-plan the rewrite"
                    ) from exc
    raise TimeoutError(
        f"could not claim a commit version after {max_retries} retries"
    ) from last


def delta_checkpoint(table_path: str, fs: LakeFS | None = None) -> int:
    """Write a single-part parquet checkpoint of the current snapshot +
    the `_last_checkpoint` pointer. Readers then replay only commits
    after it; commits <= the checkpoint version become vacuumable."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rottnest_spark.sources.delta import delta_live_files

    fs = fs or LocalFS()
    log_dir = _log_dir(table_path)
    commits = fs.glob(os.path.join(log_dir, "*.json"))
    if not _is_delta(log_dir, fs):
        raise ValueError(f"{table_path} is not a Delta table")
    from rottnest_spark.sources.delta import _checkpoint_parts

    prior_cp_version, prior_cp_files = _checkpoint_parts(log_dir, fs)
    version = max(
        [int(os.path.basename(p).split(".")[0]) for p in commits]
        + [prior_cp_version]
    )
    from rottnest_spark.sources.delta import _delta_live_state

    live_state = _delta_live_state(table_path, fs=fs)
    live = sorted(live_state)

    # reconstruct protocol/metaData from the log (commit 0 or a prior cp)
    meta = proto = None
    for c in sorted(commits):
        for line in fs.read_text(c).splitlines():
            if not line.strip():
                continue
            a = json.loads(line)
            meta = a.get("metaData", meta)
            proto = a.get("protocol", proto)
    if meta is None and prior_cp_files:
        from rottnest_spark.sources.delta import (
            _is_v2_checkpoint,
            _v2_checkpoint_actions,
        )

        for cp in prior_cp_files:
            if _is_v2_checkpoint(cp):
                for a in _v2_checkpoint_actions(fs, log_dir, cp):
                    meta = a.get("metaData", meta)
                    proto = a.get("protocol", proto)
                continue
            t = pq.read_table(pa.BufferReader(fs.read_bytes(cp)))
            for col, cur in (("metaData", meta), ("protocol", proto)):
                if col in t.column_names:
                    for rec in t.column(col).to_pylist():
                        if rec:
                            if col == "metaData":
                                meta = meta or rec
                            else:
                                proto = proto or rec
    live_pvals = {p: pv for p, (pv, _) in live_state.items()}
    # row tracking must SURVIVE the checkpoint the same way DVs do —
    # baseRowId columns + the domainMetadata high-water-mark row
    from rottnest_spark.sources.delta import (
        delta_row_id_state,
        delta_row_tracking_enabled,
        delta_table_meta,
    )

    row_ids: dict = {}
    row_hwm = None
    if delta_row_tracking_enabled(delta_table_meta(table_path, fs=fs)):
        row_ids, row_hwm = delta_row_id_state(table_path, fs=fs)
    adds = [
        {
            "path": os.path.relpath(f, table_path),
            # spec-required field; the AUTHORITATIVE values come from the
            # log's add actions (partitioned tables carry real maps here)
            "partitionValues": live_pvals.get(f, {}),
            "size": fs.getsize(f),
            "modificationTime": int(fs.getmtime(f) * 1000),
            "dataChange": False,
            # deletion vectors MUST survive the checkpoint — dropping one
            # would resurrect its deleted rows once the pre-checkpoint
            # commits are vacuumed
            "deletionVector": live_state[f][1],
            "baseRowId": row_ids.get(f, (None, None))[0],
            "defaultRowCommitVersion": row_ids.get(f, (None, None))[1],
        }
        for f in live
    ]
    # remove TOMBSTONES survive into the checkpoint (as in the Delta
    # protocol): a logically-removed file must stay distinguishable from
    # a brand-new one after pre-checkpoint commits are vacuumed
    from rottnest_spark.sources.delta import delta_known_files

    removed = sorted(set(delta_known_files(table_path, fs=fs)) - set(live))
    tombs = [
        {
            "path": os.path.relpath(f, table_path),
            "deletionTimestamp": int(time.time() * 1000),
            "dataChange": False,
        }
        for f in removed
    ]
    n = len(adds) + len(tombs) + 2
    # explicit Arrow types: empty maps ({} partitionValues/configuration)
    # are not inferable from python dicts, and the Delta checkpoint schema
    # requires those fields present — dropping them (the old strip_empty)
    # made checkpoints unreadable by spec-conforming third-party readers
    str_map = pa.map_(pa.string(), pa.string())
    proto_t = pa.struct(
        [
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            # table-features form (reader v3/writer v7, e.g. after a
            # deletionVectors upgrade) — null for legacy protocols
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ]
    )
    meta_t = pa.struct(
        [
            ("id", pa.string()),
            ("name", pa.string()),
            ("description", pa.string()),
            (
                "format",
                pa.struct([("provider", pa.string()), ("options", str_map)]),
            ),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", str_map),
            ("createdTime", pa.int64()),
        ]
    )
    dv_t = pa.struct(
        [
            ("storageType", pa.string()),
            ("pathOrInlineDv", pa.string()),
            ("offset", pa.int32()),
            ("sizeInBytes", pa.int32()),
            ("cardinality", pa.int64()),
        ]
    )
    add_t = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", str_map),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("deletionVector", dv_t),
            ("baseRowId", pa.int64()),
            ("defaultRowCommitVersion", pa.int64()),
        ]
    )
    remove_t = pa.struct(
        [
            ("path", pa.string()),
            ("deletionTimestamp", pa.int64()),
            ("dataChange", pa.bool_()),
        ]
    )
    if meta is not None:
        # spec: format/partitionColumns/configuration are required keys
        meta.setdefault("format", {"provider": "parquet", "options": {}})
        meta["format"].setdefault("options", {})
        meta.setdefault("partitionColumns", [])
        meta.setdefault("configuration", {})
    arrays = {
        "protocol": pa.array([proto] + [None] * (n - 1), type=proto_t),
        "metaData": pa.array([None, meta] + [None] * (n - 2), type=meta_t),
        "add": pa.array(
            [None, None] + adds + [None] * len(tombs), type=add_t
        ),
    }
    if tombs:
        arrays["remove"] = pa.array(
            [None] * (2 + len(adds)) + tombs, type=remove_t
        )
    if row_hwm is not None:
        # one domainMetadata row carries the row-tracking high-water
        # mark through the checkpoint (protocol: checkpoints must
        # include live domain metadata)
        dm_t = pa.struct(
            [
                ("domain", pa.string()),
                ("configuration", pa.string()),
                ("removed", pa.bool_()),
            ]
        )
        dm = {
            "domain": "delta.rowTracking",
            "configuration": json.dumps({"rowIdHighWaterMark": row_hwm}),
            "removed": False,
        }
        n += 1
        arrays = {
            k: pa.concat_arrays(
                [v, pa.array([None], type=v.type)]
            )
            for k, v in arrays.items()
        }
        arrays["domainMetadata"] = pa.array(
            [None] * (n - 1) + [dm], type=dm_t
        )
    tbl = pa.table(arrays)
    cp_path = os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")
    buf = pa.BufferOutputStream()
    pq.write_table(tbl, buf)
    fs.write_bytes(cp_path, buf.getvalue().to_pybytes())
    fs.write_text(
        os.path.join(log_dir, "_last_checkpoint"),
        json.dumps({"version": version, "size": n}),
    )
    return version


def delta_write(
    df,
    table_path: str,
    mode: str = "error",
    fs: LakeFS | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Write a DataFrame as a new Delta table (mode='error'; the dir must
    not already be a table) or append to one (mode='append'): stage the
    parquet under a temp subdir, move the part files in, commit the adds.
    Returns the committed version.

    `partition_by` creates/extends a hive-layout PARTITIONED table: data
    files land under `col=value/` subdirs without the partition columns
    physically (Spark partitionBy semantics), add actions carry real
    partitionValues, and metaData records partitionColumns + the FULL
    schema (from `df`, so partition columns keep their true types). On
    append the argument is optional — the table's own partitionColumns
    apply; passing a CONFLICTING spec raises."""
    assert mode in ("error", "append")
    fs = fs or LocalFS()
    log_dir = _log_dir(table_path)
    exists = _is_delta(log_dir, fs)
    if mode == "error" and exists:
        raise ValueError(f"{table_path} is already a Delta table")
    if mode == "append" and not exists:
        raise ValueError(f"{table_path} is not a Delta table")
    if exists:
        df = _mapped_write_frame(df, table_path, fs, "append")
    pcols = list(partition_by or [])
    if exists:
        from rottnest_spark.sources.delta import delta_partition_columns

        table_pcols = delta_partition_columns(table_path, fs=fs)
        if partition_by is not None and pcols != table_pcols:
            raise ValueError(
                f"partition_by={pcols} conflicts with the table's "
                f"partitionColumns={table_pcols}"
            )
        pcols = table_pcols
    stage = os.path.join(table_path, f"_staged_{uuid.uuid4().hex[:12]}")
    if pcols:
        cluster_for_hive_write(df, pcols).write.partitionBy(
            *pcols
        ).parquet(stage)
    else:
        df.write.parquet(stage)
    moved = []
    for f in fs.list_files(stage):
        rel = os.path.relpath(f, stage)
        segs = rel.split(os.sep)
        if not segs[-1].endswith(".parquet") or segs[-1].startswith(
            ("_", ".")
        ):
            continue
        # keep the hive partition dirs; uniquify only the leaf name
        dst = os.path.join(
            table_path, *segs[:-1], f"part-{uuid.uuid4().hex}.parquet"
        )
        fs.makedirs(os.path.dirname(dst))
        fs.rename(f, dst)
        moved.append(dst)
    fs.rmtree(stage)
    if not exists:
        return delta_convert(
            table_path,
            fs=fs,
            partition_columns=pcols,
            schema_string=df.schema.json() if pcols else None,
        )
    # OCC retry: a pure-add append conflicts with nothing and must win
    # through version races with concurrent writers
    return delta_commit_retry(table_path, add=moved, fs=fs)


#: bitmaps at or under this size are stored INLINE in the log
#: (storageType "i", Z85); larger ones land in a shared
#: deletion_vector_<uuid>.bin sibling file (storageType "u")
DV_INLINE_MAX_BYTES = 512


def _mapped_write_frame(df, table_path: str, fs: LakeFS, op: str):
    """DML staging adapter for column-mapped tables (round 8): the
    caller's LOGICAL-named frame becomes the PHYSICAL write frame
    (nested renames via positional struct casts; ID mode stamps
    parquet.field.id into the staged footers). Identity on unmapped
    tables. Partitioned+mapped requires the partition columns' physical
    names to equal their logical names (round 11 — the alignment the
    upgrade convention pins and the rename/drop writers preserve), so
    partitionValues keys and hive segments stay correct."""
    from rottnest_spark.sources.delta import (
        _cm_mode,
        check_partition_mapping_aligned,
        delta_table_meta,
        to_physical_frame,
    )

    meta = delta_table_meta(table_path, fs=fs)
    if not _cm_mode(meta):
        return df
    check_partition_mapping_aligned(meta, f"{op} on {table_path}")
    return to_physical_frame(df, meta)


def _mapped_tagged_scan(spark, table_path: str, data_files, fs: LakeFS):
    """One provenance-tagged scan of the table's data files with LOGICAL
    column names: physical schema injection + field-id resolution when
    mapped (ID mode), the plain tagged read otherwise. Tag columns
    file_path/pos survive the rename untouched — DML predicates and key
    joins then speak the user's (logical) vocabulary while the DV commit
    keeps addressing physical positions."""
    from pyspark.sql import functions as F

    from rottnest_spark.sources.delta import (
        _cm_mode,
        delta_physical_schema,
        delta_protocol,
        delta_table_meta,
        to_logical_frame,
    )
    from rottnest_spark.sources.reader import _scan

    meta = delta_table_meta(table_path, fs=fs)
    proto = delta_protocol(table_path, fs=fs)
    norm = lambda c: F.regexp_replace(c, "^file:/+", "/")  # noqa: E731
    tagged = _scan(
        spark,
        sorted(data_files),
        delta_physical_schema(meta, proto=proto),
        _cm_mode(meta) == "id",
    ).withColumns(
        {
            "file_path": _uri_path(F.col("_metadata.file_path")),
            "pos": F.col("_metadata.row_index"),
        }
    )
    return to_logical_frame(tagged, meta)


def delta_delete_rows(
    spark,
    table_path: str,
    predicate,
    fs: LakeFS | None = None,
) -> int:
    """Row-level DELETE as merge-on-read DELETION VECTORS (the Delta
    protocol's DV form — what Databricks-written tables carry): each
    affected data file gets a roaring bitmap of its deleted row
    positions; data files are untouched. Small bitmaps inline into the
    log (Z85), larger ones share one `deletion_vector_<uuid>.bin`.
    Readers (ours or any DV-capable engine) anti-join the positions;
    `delta_rewrite_deletes` compacts them back into plain data files.

    Returns the committed version, or the current one when nothing
    matches. `predicate` is a Column or SQL string over the table's
    LOGICAL column names — identical to physical except under column
    mapping, where the scan translates (round 8: both name and id
    modes). Partition columns are path-encoded, not scannable here.

    Plan shape: one predicate-pushed scan for new positions, one
    executor-side decode of existing vectors, one applyInPandas encode
    per affected file, one per-task .bin write — the driver handles
    DESCRIPTORS only (storageType/offset/cardinality rows), never
    bitmaps or row positions."""
    from pyspark.sql import functions as F

    from rottnest_spark.sources.delta import _delta_live_state

    fs = fs or LocalFS()
    state = _delta_live_state(table_path, fs=fs)
    if not state:
        raise ValueError(f"{table_path} has no live data files")

    new_pairs = (
        _mapped_tagged_scan(spark, table_path, sorted(state), fs)
        .filter(
            predicate if not isinstance(predicate, str) else F.expr(predicate)
        )
        .select("file_path", "pos")
    )
    return _delta_commit_dvs(spark, table_path, new_pairs, fs)


def _delta_commit_dvs(
    spark,
    table_path: str,
    new_pairs,
    fs: LakeFS,
    extra_adds: list[str] | Callable[[], list[str]] | None = None,
) -> int:
    """Shared DV-commit tail: merge `new_pairs` (file_path, pos) with any
    existing vectors, encode one roaring bitmap per affected file
    executor-side, store inline (small) or in per-task shared .bin files
    written EXECUTOR-side (the driver never holds a bitmap), and commit
    the remove+re-add(+DV) pairs — plus `extra_adds` (plain new data
    files, the upsert's inserts) — in ONE atomic version."""
    from pyspark.sql import functions as F

    from rottnest_spark.sources.delta import (
        delta_live_dvs,
        dv_positions_df,
    )
    from rottnest_spark.sources.roaring import make_dv_encoder

    from rottnest_spark.core.fs import canon_path

    # canon the state keys up front: `affected`/descriptor keys come from
    # `_metadata.file_path` (always absolute) while delta_live_dvs keys
    # are relative whenever table_path is — unnormalized, the conflict
    # guard below would compare unrelated keys and retry blindly past a
    # concurrent DV writer (resurrecting its deleted rows)
    dvs = {
        canon_path(p): dv
        for p, dv in delta_live_dvs(table_path, fs=fs).items()
    }
    existing = (
        dv_positions_df(spark, table_path, dvs)
        if dvs
        else None
    )
    if existing is not None:
        fresh = new_pairs.join(existing, ["file_path", "pos"], "left_anti")
    else:
        fresh = new_pairs

    # full post-delete position set per affected file (existing ∪ new):
    # the carried positions are selected by a DISTRIBUTED semi-join on
    # the fresh files (not a driver-collected isin list)
    union = fresh
    if existing is not None:
        union = fresh.unionByName(
            existing.join(
                fresh.select("file_path").distinct(), "file_path", "left_semi"
            )
        )
    encode = make_dv_encoder()

    def encode_group(pdf):
        import pandas as _pd

        return _pd.DataFrame(
            {
                "file_path": [pdf["file_path"].iloc[0]],
                "bitmap": [encode(pdf["pos"].to_numpy())],
                "cardinality": [int(pdf["pos"].nunique())],
            }
        )

    encoded = union.groupBy("file_path").applyInPandas(
        encode_group, "file_path string, bitmap binary, cardinality long"
    )

    # bitmaps never reach the driver: each TASK packs its partition's
    # large bitmaps into ONE shared .bin (DV file layout: version byte,
    # then per-DV length+payload+CRC at increasing offsets), writes it
    # executor-side through the task data-plane writer, and emits
    # DESCRIPTOR rows only — a DELETE spanning 10⁶ files collects 10⁶
    # descriptor-sized rows, not 10⁶ bitmaps. Small bitmaps inline (Z85)
    # as before. The bin name is a content-derived uuid, so task retries
    # and speculative twins rewrite the same path with the same bytes;
    # orphan bins from failed attempts are unreferenced and reclaimed by
    # delta_vacuum_table.
    from rottnest_spark.core.fs import make_task_put
    from rottnest_spark.sources.roaring import Z85_CHARS

    put = make_task_put()
    inline_max = DV_INLINE_MAX_BYTES
    bin_dir = canon_path(table_path)
    z85_chars = Z85_CHARS  # captured by value — the closure stays module-free

    def pack_bins(batches):
        import hashlib as _hashlib
        import posixpath as _pp
        import struct as _struct
        import uuid as _uuid
        import zlib as _zlib

        import pandas as _pd

        def _z85(b: bytes) -> str:
            out = []
            for i in range(0, len(b), 4):
                v = int.from_bytes(b[i : i + 4], "big")
                chunk = []
                for _ in range(5):
                    v, r = divmod(v, 85)
                    chunk.append(z85_chars[r])
                out.extend(reversed(chunk))
            return "".join(out)

        rows: list[list] = []  # file_path, storage, poi, offset, size, card
        bin_parts: list[bytes] = []
        bin_offset = 1  # after the format-version byte
        h = _hashlib.md5()
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                bm = bytes(r.bitmap)
                if len(bm) <= inline_max:
                    padded = bm + b"\x00" * (-len(bm) % 4)  # Z85: len%4==0
                    rows.append(
                        [r.file_path, "i", _z85(padded), None, len(bm),
                         int(r.cardinality)]
                    )
                else:
                    wrapped = (
                        _struct.pack(">i", len(bm))
                        + bm
                        + _struct.pack(">I", _zlib.crc32(bm) & 0xFFFFFFFF)
                    )
                    h.update(r.file_path.encode())
                    h.update(bm)
                    rows.append(
                        [r.file_path, "u", None, bin_offset, len(bm),
                         int(r.cardinality)]
                    )
                    bin_parts.append(wrapped)
                    bin_offset += len(wrapped)
        if bin_parts:
            bid = _uuid.UUID(bytes=h.digest())
            put(
                _pp.join(bin_dir, f"deletion_vector_{bid}.bin"),
                b"\x01" + b"".join(bin_parts),
            )
            enc = _z85(bid.bytes)
            for row in rows:
                if row[1] == "u":
                    row[2] = enc
        yield _pd.DataFrame(
            rows,
            columns=[
                "file_path", "storage", "path_or_inline", "offset", "size",
                "cardinality",
            ],
        )

    desc_rows = encoded.mapInPandas(
        pack_bins,
        "file_path string, storage string, path_or_inline string, "
        "offset int, size int, cardinality long",
    ).collect()  # descriptor-scale: one small row per affected file

    if callable(extra_adds):
        # late-resolved adds: the caller staged its insert files on a
        # worker thread CONCURRENT with the DV pipeline above (guide
        # §2.6); join it here, before anything commits
        extra_adds = extra_adds()

    descriptors: dict[str, dict] = {}
    for r in desc_rows:
        d = {
            "storageType": r.storage,
            "pathOrInlineDv": r.path_or_inline,
            "sizeInBytes": int(r.size),
            "cardinality": int(r.cardinality),
        }
        if r.storage == "u":
            d["offset"] = int(r.offset)
        descriptors[r.file_path] = d
    affected = sorted(descriptors)
    if not affected and not extra_adds:
        return _next_version(_log_dir(table_path), fs) - 1
    if not affected:  # pure inserts: a plain add commit
        return delta_commit_retry(table_path, add=extra_adds, fs=fs)

    # one commit: remove + re-add each affected file with its DV attached
    # (protocol: attaching a DV is a remove/add pair of the same path)
    from rottnest_spark.sources.delta import delta_partition_columns

    pcols = delta_partition_columns(table_path, fs=fs)
    now = int(time.time() * 1000)
    # DVs are a table FEATURE (protocol reader v3 / writer v7) — announce
    # it in the same commit, MERGED with the current protocol: replacing
    # it would silently drop features another engine declared (e.g.
    # timestampNtz), making spec-conforming readers misread that data
    from rottnest_spark.sources.delta import delta_protocol

    cur = delta_protocol(table_path, fs=fs) or {}
    reader_feats = sorted(
        set(cur.get("readerFeatures") or []) | {"deletionVectors"}
    )
    writer_feats = sorted(
        set(cur.get("writerFeatures") or []) | {"deletionVectors"}
    )
    actions: list[dict] = [
        {
            "protocol": {
                "minReaderVersion": max(
                    3, int(cur.get("minReaderVersion") or 1)
                ),
                "minWriterVersion": max(
                    7, int(cur.get("minWriterVersion") or 1)
                ),
                "readerFeatures": reader_feats,
                "writerFeatures": writer_feats,
            }
        }
    ]
    for f in sorted(affected):
        actions.append(
            {
                "remove": {
                    "path": os.path.relpath(f, table_path),
                    "deletionTimestamp": now,
                    "dataChange": True,
                }
            }
        )
        add = _add_action(table_path, f, pcols, fs=fs)
        add["add"]["deletionVector"] = descriptors[f]
        actions.append(add)
    for f in sorted(extra_adds or []):  # the upsert's inserted rows
        actions.append(_add_action(table_path, f, pcols, fs=fs))
    log_dir = _log_dir(table_path)
    # the descriptors were computed against THIS dv state; a concurrent
    # DV writer changing any affected file's vector between now and our
    # winning commit would be silently overwritten (its deleted rows
    # resurrected) if we retried blindly
    base_dvs = {f: dvs.get(f) for f in affected}
    last: Exception | None = None
    for _ in range(20):
        try:
            return _write_commit(log_dir, _next_version(log_dir, fs), actions, fs)
        except FileExistsError as exc:
            last = exc
            from rottnest_spark.sources.delta import (
                delta_live_dvs as _live_dvs,
            )
            from rottnest_spark.sources.delta import delta_live_files

            live = {
                canon_path(p)
                for p in delta_live_files(
                    table_path, fs=fs, on_deletes="ignore"
                )
            }
            gone = [f for f in affected if f not in live]
            fresh_dvs = {
                canon_path(p): dv
                for p, dv in _live_dvs(table_path, fs=fs).items()
            }
            changed = [
                f
                for f in affected
                if f in live and fresh_dvs.get(f) != base_dvs.get(f)
            ]
            if changed:
                raise ValueError(
                    "concurrent writer changed deletion vectors on files "
                    f"this commit also rewrites: {changed[:3]} — re-run "
                    "against the new snapshot (retrying would resurrect "
                    "the other writer's deleted rows)"
                ) from exc
            if gone:
                raise ValueError(
                    "concurrent writer rewrote files this DELETE targets: "
                    f"{gone} — re-run the delete against the new snapshot"
                ) from exc
    raise TimeoutError("could not claim a commit version") from last


def delta_rewrite_deletes(
    spark,
    table_path: str,
    fs: LakeFS | None = None,
) -> int:
    """Compact deletion vectors back into plain data files: rewrite ONLY
    the files that carry a DV (untouched files keep their bytes and their
    indexes), drop the vectors, one commit. After this the index layer
    accepts the table again (`DeltaSnapshotLake.files` refuses DV-bearing
    snapshots). Orphaned .bin vector files are reclaimed by vacuum.

    Hive layouts are preserved: rewritten files land in the same
    partition directory, so the add actions' partitionValues parse from
    the path as before."""
    from rottnest_spark.sources.delta import (
        _cm_mode,
        apply_deletion_vectors,
        delta_live_dvs,
        delta_physical_schema,
        delta_table_meta,
        stamp_physical_frame,
    )
    from rottnest_spark.sources.reader import _scan

    fs = fs or LocalFS()
    dvs = delta_live_dvs(table_path, fs=fs)
    if not dvs:
        return _next_version(_log_dir(table_path), fs) - 1
    affected = sorted(dvs)
    by_dir: dict[str, list[str]] = {}
    for f in affected:
        by_dir.setdefault(os.path.dirname(f), []).append(f)
    # column-mapped tables rewrite physical-for-physical (no rename
    # round-trip), but ID mode must read by field id and re-stamp
    # parquet.field.id into the rewritten footers
    meta = delta_table_meta(table_path, fs=fs)
    phys_schema = delta_physical_schema(meta)
    id_mode = _cm_mode(meta) == "id"
    added = []
    for d, group in sorted(by_dir.items()):
        stage = os.path.join(table_path, f"_staged_{uuid.uuid4().hex[:12]}")
        live = apply_deletion_vectors(
            spark,
            _scan(spark, sorted(group), phys_schema, id_mode),
            table_path,
            {f: dvs[f] for f in group},
        )
        if id_mode:
            live = stamp_physical_frame(live, meta)
        live.write.parquet(stage)
        for f in fs.list_files(stage):
            leaf = os.path.basename(f)
            if not leaf.endswith(".parquet") or leaf.startswith(("_", ".")):
                continue
            dst = os.path.join(d, f"part-{uuid.uuid4().hex}.parquet")
            fs.rename(f, dst)
            added.append(dst)
        fs.rmtree(stage)
    return delta_commit_retry(
        table_path, add=added, remove=affected, fs=fs
    )


def delta_vacuum_table(
    table_path: str,
    older_than_sec: float = 7 * 86400.0,
    fs: LakeFS | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Physical-file VACUUM of the table directory (the Delta VACUUM
    command's semantics): delete data files and deletion-vector bins that
    are NOT referenced by the current snapshot and whose modification
    time is at least `older_than_sec` old. Returns the deleted (or, with
    `dry_run`, the would-be-deleted) paths.

    The retention window is the time-travel safety valve — readers of a
    recent historical version still find their files. Passing 0 is the
    RETENTION-CHECK-DISABLED mode (tests, known-idle tables); like the
    real command, it can break concurrent time travel. The log itself is
    never touched (delta_checkpoint + log cleanup govern that); index
    files are ParquetLake.vacuum's job."""
    import time as _time

    from rottnest_spark.sources.delta import _delta_live_state

    from rottnest_spark.core.fs import canon_path

    fs = fs or LocalFS()
    state = _delta_live_state(table_path, fs=fs)
    # canon-normalize the keep set AND every candidate below — a
    # relative table_path would otherwise make every live file look
    # unreferenced and vacuum would delete the current snapshot
    # (canon_path, not abspath: URI-schemed table paths must not mangle)
    keep = {canon_path(p) for p in state}
    for _, dv in state.values():
        if dv and dv.get("storageType") in ("u", "p"):
            pi = dv["pathOrInlineDv"]
            if dv["storageType"] == "p":
                keep.add(
                    canon_path(
                        pi
                        if os.path.isabs(pi) or "://" in pi
                        else os.path.join(table_path, pi)
                    )
                )
            else:
                import uuid as _uuid

                from rottnest_spark.sources.roaring import z85_decode

                prefix, enc = pi[:-20], pi[-20:]
                keep.add(
                    canon_path(
                        os.path.join(
                            table_path,
                            prefix,
                            "deletion_vector_"
                            f"{_uuid.UUID(bytes=z85_decode(enc))}.bin",
                        )
                    )
                )
    cutoff = _time.time() - older_than_sec
    victims = []
    for f in fs.list_files(table_path):
        rel = os.path.relpath(f, table_path)
        parts = rel.split(os.sep)
        if "_delta_log" in parts or any(
            s.startswith(("_", ".")) for s in parts[:-1]
        ):
            continue
        leaf = parts[-1]
        is_data = leaf.endswith(".parquet") and not leaf.startswith(("_", "."))
        is_dv = leaf.startswith("deletion_vector_") and leaf.endswith(".bin")
        if not (is_data or is_dv):
            continue
        if canon_path(f) in keep:
            continue
        try:
            if fs.getmtime(f) > cutoff:
                continue
        except OSError:
            continue
        victims.append(f)
        if not dry_run:
            fs.remove(f)
    return sorted(victims)


def delta_add_column(
    table_path: str,
    name: str,
    spark_type: str,
    fs: LakeFS | None = None,
) -> int:
    """ADD COLUMN as a metaData-only commit (Delta schema evolution:
    the protocol's table schema is the latest metaData action's
    schemaString; a new version carrying an updated metaData changes it
    with ZERO data files touched). Pre-evolution files physically lack
    the column; reads surface null for their rows — the snapshot scan
    pins the schemaString, so the fill is deterministic per file rather
    than left to footer-sample inference. Delta (without the
    defaultColumns writer feature) has no read-time default values, so
    null IS the spec's answer — contrast iceberg_add_column's
    initial-default. `spark_type` is a Spark DDL string ('bigint',
    'decimal(10,2)', 'struct<a:int>'). Returns the committed version.

    Refuses on column-mapped tables (a new field needs a fresh mapping
    id + physicalName consistent with the table's columnMapping.maxId
    bookkeeping, which this writer does not track) and on duplicate
    names."""
    from pyspark.sql.types import _parse_datatype_string

    from rottnest_spark.sources.delta import (
        column_mapping_from_meta,
        delta_table_meta,
    )

    fs = fs or LocalFS()
    meta = delta_table_meta(table_path, fs=fs)
    if not meta or not meta.get("schemaString"):
        raise ValueError(
            f"{table_path} has no metaData schemaString — cannot evolve"
        )
    schema = json.loads(meta["schemaString"])
    # `name` may be a DOT PATH ('info.city' — round 11): the field lands
    # inside an existing struct; old files lack it physically and the
    # pinned-schemaString scan surfaces null for their rows
    siblings, leaf = _walk_delta_parent(schema, name)
    if any(f["name"] == leaf for f in siblings):
        raise ValueError(f"column {name!r} already exists")
    try:
        dtype = _parse_datatype_string(spark_type)
    except Exception as exc:
        raise ValueError(
            f"unparseable Spark type {spark_type!r}: {exc}"
        ) from None
    new_field = {
        "name": leaf,
        "type": dtype.jsonValue(),
        "nullable": True,  # a required add would break existing rows
        "metadata": {},
    }
    new_meta = {**meta}
    if column_mapping_from_meta(meta):
        # mapped table (round 11): the new field gets a FRESH mapping —
        # a minted col-<uuid> physicalName (no existing file carries it,
        # so the name is free) and id = maxColumnId + 1, with the
        # configuration's maxColumnId bookkeeping advanced past every id
        # this add consumed (nested struct fields each take one)
        cfg = dict(meta.get("configuration") or {})
        counter = [int(cfg.get("delta.columnMapping.maxColumnId") or 0)]
        new_field = _stamp_mapping(new_field, counter, preserve_names=False)
        cfg["delta.columnMapping.maxColumnId"] = str(counter[0])
        new_meta["configuration"] = cfg
    siblings.append(new_field)
    new_meta["schemaString"] = json.dumps(schema)
    log_dir = os.path.join(table_path, "_delta_log")
    return _write_commit(
        log_dir, _next_version(log_dir, fs), [{"metaData": new_meta}], fs
    )


def _walk_delta_parent(schema: dict, path: str) -> tuple[list, str]:
    """Navigate a dot path ('a.b.c') through STRUCT types of a Delta
    schemaString JSON (in place), returning (parent's fields list, leaf
    name) — the shared seam of the nested-path evolution writers
    (round 11, mirroring iceberg_write._walk_to_parent). Struct-only:
    array/map element paths, missing segments, and primitives mid-path
    refuse loudly."""
    segs = path.split(".")
    fields = schema.setdefault("fields", [])
    for i, seg in enumerate(segs[:-1]):
        field = next((f for f in fields if f["name"] == seg), None)
        if field is None:
            raise ValueError(
                f"path {path!r}: no column {seg!r} at "
                f"{'.'.join(segs[:i]) or 'top level'} "
                f"({[f['name'] for f in fields]})"
            )
        t = field.get("type")
        if isinstance(t, str):
            raise ValueError(
                f"path {path!r}: {'.'.join(segs[: i + 1])!r} is a "
                f"primitive ({t}) — cannot navigate further"
            )
        if t.get("type") != "struct":
            raise ValueError(
                f"path {path!r}: {'.'.join(segs[: i + 1])!r} is a "
                f"{t.get('type')} — nested evolution addresses struct "
                "fields only (array/map element paths are not supported)"
            )
        fields = t.setdefault("fields", [])
    return fields, segs[-1]


def _stamp_mapping(field: dict, counter: list[int], preserve_names: bool):
    """Stamp delta.columnMapping.{id, physicalName} on a schemaString
    FIELD and (recursively) every struct field nested under its type.
    `counter` is the running maxColumnId (mutated in place; each field
    consumes the next id). `preserve_names=True` keeps the current name
    as the physicalName — the UPGRADE convention: existing data files
    carry plain column names, so resolution only works if physical ==
    current logical at upgrade time. False mints col-<uuid> names (new
    columns have no files, so the fresh name is free — and survives a
    later rename/drop/re-add without colliding with stale file data)."""

    def walk_type(t):
        if isinstance(t, str):
            return t
        kind = t.get("type")
        if kind == "struct":
            return {
                "type": "struct",
                "fields": [walk_field(f) for f in t.get("fields", [])],
            }
        if kind == "array":
            return {**t, "elementType": walk_type(t["elementType"])}
        if kind == "map":
            return {
                **t,
                "keyType": walk_type(t["keyType"]),
                "valueType": walk_type(t["valueType"]),
            }
        return t

    def walk_field(f):
        counter[0] += 1
        md = dict(f.get("metadata") or {})
        md["delta.columnMapping.id"] = counter[0]
        md["delta.columnMapping.physicalName"] = (
            f["name"] if preserve_names else f"col-{uuid.uuid4()}"
        )
        return {**f, "metadata": md, "type": walk_type(f["type"])}

    return walk_field(field)


def _mapping_protocol(proto: dict | None) -> dict:
    """The protocol action a columnMapping upgrade must commit, MERGED
    with the table's current protocol (PROTOCOL.md: column mapping needs
    reader v2 / writer v5 on legacy protocols; on table-features
    protocols it is the `columnMapping` reader+writer feature)."""
    proto = dict(proto or PROTOCOL)
    mrv = int(proto.get("minReaderVersion") or 1)
    mwv = int(proto.get("minWriterVersion") or 2)
    if (
        mrv >= 3
        or proto.get("readerFeatures") is not None
        or proto.get("writerFeatures") is not None
    ):
        return {
            "minReaderVersion": max(mrv, 3),
            "minWriterVersion": max(mwv, 7),
            "readerFeatures": sorted(
                set(proto.get("readerFeatures") or []) | {"columnMapping"}
            ),
            "writerFeatures": sorted(
                set(proto.get("writerFeatures") or []) | {"columnMapping"}
            ),
        }
    return {
        "minReaderVersion": max(mrv, 2),
        "minWriterVersion": max(mwv, 5),
    }


def delta_enable_column_mapping(
    table_path: str, fs: LakeFS | None = None
) -> int:
    """Upgrade an unmapped table to columnMapping.mode=name (the
    precondition for RENAME/DROP COLUMN — PROTOCOL.md column mapping):
    one commit carrying the merged protocol upgrade and a metaData whose
    every field (at any nesting depth) is stamped with a mapping id and
    physicalName == its current name, so every existing data file keeps
    resolving by name. Idempotent: an already-mapped table returns the
    current version untouched. `id` mode is refused — existing footers
    carry no parquet field ids, so an id-mode upgrade could not resolve
    old files. Partitioned tables upgrade too (round 11): the
    preserve-names convention keeps every partition column's
    physicalName equal to its logical name, so partitionValues keys and
    hive segments stay valid — and the rename/drop writers refuse
    partition columns, preserving that alignment forever."""
    from rottnest_spark.sources.delta import (
        _cm_mode,
        delta_protocol,
        delta_table_meta,
    )

    fs = fs or LocalFS()
    meta = delta_table_meta(table_path, fs=fs)
    if not meta or not meta.get("schemaString"):
        raise ValueError(
            f"{table_path} has no metaData schemaString — cannot evolve"
        )
    log_dir = os.path.join(table_path, "_delta_log")
    if _cm_mode(meta):
        return _next_version(log_dir, fs) - 1  # already mapped: no-op
    schema = json.loads(meta["schemaString"])
    counter = [0]
    schema["fields"] = [
        _stamp_mapping(f, counter, preserve_names=True)
        for f in schema.get("fields", [])
    ]
    cfg = dict(meta.get("configuration") or {})
    cfg["delta.columnMapping.mode"] = "name"
    cfg["delta.columnMapping.maxColumnId"] = str(counter[0])
    new_meta = {
        **meta,
        "schemaString": json.dumps(schema),
        "configuration": cfg,
    }
    actions = [
        {"protocol": _mapping_protocol(delta_protocol(table_path, fs=fs))},
        {"metaData": new_meta},
    ]
    return _write_commit(log_dir, _next_version(log_dir, fs), actions, fs)


def delta_enable_row_tracking(
    table_path: str, fs: LakeFS | None = None
) -> int:
    """Enable ROW TRACKING (PROTOCOL.md — the Delta twin of Iceberg v3
    row lineage): ONE commit carrying the protocol upgraded with the
    `rowTracking` + `domainMetadata` writer features (legacy writer
    capabilities carried into the feature list), the metaData with
    `delta.enableRowTracking=true`, a re-ADD of every live file with
    its assigned baseRowId range (dataChange=false — partitionValues
    and deletionVector descriptors carried verbatim; zero data files
    touched), and the `delta.rowTracking` domainMetadata high-water
    mark. Idempotent. Partitioned tables are refused (the lineage read
    needs physical row positions). Returns the committed version."""
    from rottnest_spark.sources.delta import (
        _delta_live_state,
        delta_protocol,
        delta_row_tracking_enabled,
        delta_table_meta,
    )

    fs = fs or LocalFS()
    log_dir = _log_dir(table_path)
    meta = delta_table_meta(table_path, fs=fs)
    if not meta or not meta.get("schemaString"):
        raise ValueError(
            f"{table_path} has no metaData schemaString — cannot enable"
        )
    if delta_row_tracking_enabled(meta):
        return _next_version(log_dir, fs) - 1  # already on: no-op
    if meta.get("partitionColumns"):
        raise ValueError(
            f"{table_path}: row tracking on a PARTITIONED table — the "
            "lineage read needs physical row positions; unsupported"
        )
    proto = dict(delta_protocol(table_path, fs=fs) or PROTOCOL)
    legacy_writer = (
        {"appendOnly", "invariants"}
        if int(proto.get("minWriterVersion") or 2) >= 2
        and proto.get("writerFeatures") is None
        else set()
    )
    new_proto: dict = {
        "minReaderVersion": int(proto.get("minReaderVersion") or 1),
        "minWriterVersion": max(
            7, int(proto.get("minWriterVersion") or 2)
        ),
        "writerFeatures": sorted(
            set(proto.get("writerFeatures") or [])
            | {"rowTracking", "domainMetadata"}
            | legacy_writer
        ),
    }
    if proto.get("readerFeatures") is not None or int(
        proto.get("minReaderVersion") or 1
    ) >= 3:
        new_proto["minReaderVersion"] = max(
            3, int(proto.get("minReaderVersion") or 1)
        )
        new_proto["readerFeatures"] = sorted(
            set(proto.get("readerFeatures") or [])
        )
    cfg = dict(meta.get("configuration") or {})
    cfg["delta.enableRowTracking"] = "true"
    new_meta = {**meta, "configuration": cfg}
    version = _next_version(log_dir, fs)
    state = _delta_live_state(table_path, fs=fs)
    actions: list[dict] = [
        {"protocol": new_proto},
        {"metaData": new_meta},
    ]
    next_id = 0
    for f in sorted(state):
        pvals, dv = state[f]
        rel = os.path.relpath(f, table_path)
        actions.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": dict(pvals or {}),
                    "size": fs.getsize(f),
                    "modificationTime": int(fs.getmtime(f) * 1000),
                    "dataChange": False,
                    "deletionVector": dv,
                    "baseRowId": next_id,
                    "defaultRowCommitVersion": version,
                }
            }
        )
        next_id += _num_rows(f, fs)
    actions.append(
        {
            "domainMetadata": {
                "domain": "delta.rowTracking",
                "configuration": json.dumps(
                    {"rowIdHighWaterMark": next_id - 1}
                ),
                "removed": False,
            }
        }
    )
    return _write_commit(log_dir, version, actions, fs)


def delta_rename_column(
    table_path: str, old: str, new: str, fs: LakeFS | None = None
) -> int:
    """RENAME COLUMN: a metaData-only commit changing the field's
    LOGICAL name while its physicalName (what the parquet files carry)
    stays fixed — which is why column mapping is the protocol's
    precondition; an unmapped table is upgraded first
    (delta_enable_column_mapping). Old files keep resolving through the
    unchanged physical name; DML keeps working through the logical↔
    physical adapters (_mapped_write_frame / _mapped_tagged_scan).
    `old` may be a DOT PATH into struct fields ('info.city' — round 11;
    every nesting depth carries its own physicalName, so the same
    metaData-only mechanics apply); `new` is always a SIMPLE name
    within the same parent."""
    from rottnest_spark.sources.delta import delta_table_meta

    fs = fs or LocalFS()
    if "." in new:
        raise ValueError(
            f"new name {new!r} must be a simple name — a rename cannot "
            "move a field between structs"
        )
    delta_enable_column_mapping(table_path, fs=fs)
    meta = delta_table_meta(table_path, fs=fs)
    schema = json.loads(meta["schemaString"])
    siblings, leaf = _walk_delta_parent(schema, old)
    names = [f["name"] for f in siblings]
    if leaf not in names:
        raise ValueError(f"column {old!r} does not exist ({names})")
    if new in names:
        raise ValueError(f"column {new!r} already exists beside {old!r}")
    if old in (meta.get("partitionColumns") or []):
        raise ValueError(f"cannot rename partition column {old!r}")
    siblings[:] = [
        {**f, "name": new} if f["name"] == leaf else f for f in siblings
    ]
    new_meta = {**meta, "schemaString": json.dumps(schema)}
    log_dir = os.path.join(table_path, "_delta_log")
    return _write_commit(
        log_dir, _next_version(log_dir, fs), [{"metaData": new_meta}], fs
    )


#: Delta typeWidening (stable feature) widenings this writer commits:
#: integer chain, float→double, decimal precision growth at fixed scale
#: — the value space only widens, so old narrow files read losslessly
#: through the pinned-schemaString up-cast the reader already does.
_WIDENINGS = {
    ("byte", "short"), ("byte", "integer"), ("byte", "long"),
    ("short", "integer"), ("short", "long"),
    ("integer", "long"),
    ("float", "double"),
}


def _widening_legal(old: str, new: str) -> bool:
    if (old, new) in _WIDENINGS:
        return True
    import re as _re

    mo = _re.fullmatch(r"decimal\((\d+),(\d+)\)", old or "")
    mn = _re.fullmatch(r"decimal\((\d+),(\d+)\)", new or "")
    if mo and mn:
        return int(mn.group(2)) == int(mo.group(2)) and int(
            mn.group(1)
        ) >= int(mo.group(1))
    return False


def delta_widen_column(
    table_path: str,
    name: str,
    new_spark_type: str,
    fs: LakeFS | None = None,
) -> int:
    """WIDEN a column's type as a metaData-only commit (the Delta
    `typeWidening` table feature): one commit carries the protocol
    upgraded with the feature (reader+writer, table-features form) and
    a metaData whose schemaString holds the wide type — old narrow
    files keep reading through the pinned-schemaString up-cast the
    round-9 read side already does; no data file is rewritten. The
    field records the protocol's `delta.typeChanges` bookkeeping
    (fromType/toType/tableVersion). Widen-only (integer chain,
    float→double, decimal precision growth at fixed scale) — anything
    lossy refuses. Returns the committed version."""
    from pyspark.sql.types import _parse_datatype_string

    from rottnest_spark.sources.delta import delta_protocol, delta_table_meta

    fs = fs or LocalFS()
    meta = delta_table_meta(table_path, fs=fs)
    if not meta or not meta.get("schemaString"):
        raise ValueError(
            f"{table_path} has no metaData schemaString — cannot evolve"
        )
    schema = json.loads(meta["schemaString"])
    # `name` may be a DOT PATH ('info.n' — round 11): the typeChanges
    # bookkeeping and the pinned-schemaString up-cast both operate on
    # the full schema tree
    siblings, leaf = _walk_delta_parent(schema, name)
    field = next((f for f in siblings if f["name"] == leaf), None)
    if field is None:
        raise ValueError(
            f"column {name!r} does not exist "
            f"({[f['name'] for f in siblings]})"
        )
    old = field.get("type")
    if not isinstance(old, str):
        raise ValueError(
            f"column {name!r} has non-primitive type {old!r} — widening "
            "is defined on primitive types only"
        )
    try:
        new = _parse_datatype_string(new_spark_type).jsonValue()
    except Exception as exc:
        raise ValueError(
            f"unparseable Spark type {new_spark_type!r}: {exc}"
        ) from None
    if not isinstance(new, str):
        raise ValueError(f"{new_spark_type!r} is not a primitive type")
    if old == new:
        raise ValueError(f"column {name!r} is already {new!r}")
    if not _widening_legal(old, new):
        raise ValueError(
            f"{old!r} → {new!r} is not a legal type widening (integer "
            "chain, float→double, decimal precision growth at fixed "
            "scale) — refusing; a lossy cast committed to metadata "
            "corrupts every later read"
        )
    log_dir = os.path.join(table_path, "_delta_log")
    version = _next_version(log_dir, fs)
    md = dict(field.get("metadata") or {})
    md["delta.typeChanges"] = list(md.get("delta.typeChanges") or []) + [
        {"fromType": old, "toType": new, "tableVersion": version}
    ]
    field["type"] = new
    field["metadata"] = md
    new_meta = {**meta, "schemaString": json.dumps(schema)}
    proto = dict(delta_protocol(table_path, fs=fs) or PROTOCOL)
    # lifting a LEGACY protocol to table-features form must carry the
    # legacy capability over explicitly: reader v2's only capability is
    # column mapping, which v3 signals via the feature list
    legacy_cm = (
        {"columnMapping"}
        if int(proto.get("minReaderVersion") or 1) == 2
        and proto.get("readerFeatures") is None
        else set()
    )
    proto = {
        "minReaderVersion": max(int(proto.get("minReaderVersion") or 1), 3),
        "minWriterVersion": max(int(proto.get("minWriterVersion") or 2), 7),
        "readerFeatures": sorted(
            set(proto.get("readerFeatures") or [])
            | {"typeWidening"}
            | legacy_cm
        ),
        "writerFeatures": sorted(
            set(proto.get("writerFeatures") or [])
            | {"typeWidening"}
            | legacy_cm
        ),
    }
    return _write_commit(
        log_dir,
        version,
        [{"protocol": proto}, {"metaData": new_meta}],
        fs,
    )


def delta_drop_column(
    table_path: str, name: str, fs: LakeFS | None = None
) -> int:
    """DROP COLUMN: a metaData-only commit removing the field from the
    schemaString — no data file is rewritten; the physical column stays
    in old files and mapped reads simply stop projecting it. Column
    mapping is the precondition (same reason as rename: without it, a
    later re-ADD of the same name would resurrect the stale file data);
    an unmapped table is upgraded first. `name` may be a DOT PATH into
    struct fields (round 11); the last remaining column/struct-field
    and partition columns are refused."""
    from rottnest_spark.sources.delta import delta_table_meta

    fs = fs or LocalFS()
    delta_enable_column_mapping(table_path, fs=fs)
    meta = delta_table_meta(table_path, fs=fs)
    schema = json.loads(meta["schemaString"])
    siblings, leaf = _walk_delta_parent(schema, name)
    names = [f["name"] for f in siblings]
    if leaf not in names:
        raise ValueError(f"column {name!r} does not exist ({names})")
    if name in (meta.get("partitionColumns") or []):
        raise ValueError(f"cannot drop partition column {name!r}")
    if len(names) == 1:
        raise ValueError(
            "cannot drop the last column of a table"
            if "." not in name
            else f"cannot drop {name!r} — it is the last field of its "
            "struct (an empty struct type is unreadable); drop the "
            "struct column instead"
        )
    siblings[:] = [f for f in siblings if f["name"] != leaf]
    new_meta = {**meta, "schemaString": json.dumps(schema)}
    log_dir = os.path.join(table_path, "_delta_log")
    return _write_commit(
        log_dir, _next_version(log_dir, fs), [{"metaData": new_meta}], fs
    )


def delta_upsert(
    spark,
    df,
    table_path: str,
    key_cols: list[str],
    fs: LakeFS | None = None,
) -> int:
    """Keyed CDC UPSERT with deletion vectors — the Databricks
    "MERGE with DVs" shape: ONE snapshot marks every old row whose key
    appears in `df` as deleted (roaring bitmaps, data files untouched)
    and appends the change rows as new files. Reads the table ONCE
    (a broadcast key semi-join locates positions) and writes ONLY the
    changes — versus copy-on-write MERGE, which rewrites every touched
    file. Last-write-wins per key; `df` must be key-unique.

    Delta has no equality deletes, so the position scan is inherent to
    the format (contrast iceberg_upsert's zero-scan shape); the win here
    is on the WRITE side."""
    from pyspark.sql import functions as F

    from rottnest_spark.sources.delta import _delta_live_state

    fs = fs or LocalFS()
    from rottnest_spark.sources.delta import delta_schema
    from rottnest_spark.sources.iceberg_write import _align_frame_types

    tschema = delta_schema(table_path, fs=fs)
    if tschema is not None:
        df = _align_frame_types(
            df,
            {f.name: f.dataType.simpleString() for f in tschema.fields},
            "delta_upsert",
        )
    # pin the change batch: the staged write and the key semi-join build
    # side both consume it — one scan of the caller's source instead of
    # two (batch-scale rows)
    df = df.localCheckpoint(eager=True)
    staged_df = _mapped_write_frame(df, table_path, fs, "UPSERT")
    state = _delta_live_state(table_path, fs=fs)
    if not state:
        raise ValueError(f"{table_path} has no live data files")
    data_files = sorted(state)

    # stage + publish the change rows (hive-laid when partitioned)
    from rottnest_spark.sources.delta import delta_partition_columns

    pcols = delta_partition_columns(table_path, fs=fs)
    clash = [c for c in key_cols if c in pcols]
    if clash:
        raise ValueError(
            f"key columns {clash} are partition columns — the key match "
            "runs on PHYSICAL data-file columns, which hive-laid files "
            "lack for partitions; key on a physical column instead"
        )
    stage = os.path.join(table_path, f"_staged_{uuid.uuid4().hex[:12]}")

    def _stage_and_publish() -> list[str]:
        if pcols:
            cluster_for_hive_write(staged_df, pcols).write.partitionBy(
                *pcols
            ).parquet(stage)
        else:
            staged_df.write.parquet(stage)
        moved = []
        for f in fs.list_files(stage):
            segs = os.path.relpath(f, stage).split(os.sep)
            leaf = segs[-1]
            if not leaf.endswith(".parquet") or leaf.startswith(("_", ".")):
                continue
            dst = os.path.join(
                table_path, *segs[:-1], f"upserted_{uuid.uuid4().hex}.parquet"
            )
            fs.makedirs(os.path.dirname(dst))
            fs.rename(f, dst)
            moved.append(dst)
        fs.rmtree(stage)
        if not moved:
            raise ValueError(
                "empty upsert — the change DataFrame has no rows"
            )
        return moved

    keys = df.select(*key_cols).distinct()
    # tagged scan with LOGICAL names (mapped tables translate at the
    # scan; tag columns resolve on the scan relation, before the join)
    tagged = _mapped_tagged_scan(spark, table_path, data_files, fs)
    matched = tagged.join(F.broadcast(keys), key_cols, "left_semi").select(
        "file_path", "pos"
    )
    # the staged write reads only the PINNED batch; the DV pipeline reads
    # the (immutable) current table state — run them as concurrent jobs
    # (guide §2.6), joined inside _delta_commit_dvs before the commit.
    # Published-but-uncommitted files on a DV failure stay invisible to
    # the log and are reclaimed by delta_vacuum_table, the same
    # crash-window semantics the sequential order already had.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as _pool:
        _fut = _pool.submit(_stage_and_publish)
        try:
            return _delta_commit_dvs(
                spark, table_path, matched, fs, extra_adds=_fut.result
            )
        except Exception as exc:
            try:
                _fut.result()
            except Exception as side:
                # keep the stage+publish chain's failure diagnosable
                # instead of swallowing it behind the DV pipeline's error
                if side is not exc:
                    exc.add_note(
                        f"concurrent stage+publish also failed: {side!r}"
                    )
            raise


def delta_cleanup_log(
    table_path: str,
    older_than_sec: float = 30 * 86400.0,
    fs: LakeFS | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Delete commit files a checkpoint has superseded (Delta's log
    retention): only commits with version <= the latest checkpoint are
    candidates — the replay reconstructs every later state from the
    checkpoint + surviving commits. The age window protects concurrent
    time-travel readers of pre-checkpoint versions, mirroring
    delta_vacuum_table's retention stance. Returns the deleted (or
    would-be-deleted) commit paths."""
    import time as _time

    from rottnest_spark.sources.delta import _checkpoint_parts

    fs = fs or LocalFS()
    log_dir = _log_dir(table_path)
    cp_version, _ = _checkpoint_parts(log_dir, fs)
    if cp_version < 0:
        return []  # nothing checkpointed: every commit is load-bearing
    cutoff = _time.time() - older_than_sec
    victims = []
    for f in sorted(fs.glob(os.path.join(log_dir, "*.json"))):
        if int(os.path.basename(f).split(".")[0]) > cp_version:
            continue
        try:
            if fs.getmtime(f) > cutoff:
                continue
        except OSError:
            continue
        victims.append(f)
        if not dry_run:
            fs.remove(f)
    return victims
