"""Row-level snapshot diff for format-backed tables — the incremental
consumer's contract: "which ROWS entered or left the table between
version A and version B?".

Neither the reference nor its backends expose this (its incrementality
is file-granular: index files that appeared since last run,
backends/iceberg.py:98-254). With merge-on-read state now first-class
(Iceberg positional deletes, Delta deletion vectors), row-level diffs
are derivable from METADATA + the delete state alone — no change-data
files, no full-table value comparison:

- a data file only in B: its surviving rows (B's deletes applied) are
  INSERTS;
- a data file only in A: its surviving rows under A's deletes are
  DELETES (they left the snapshot);
- a file in both with changed delete state: positions deleted in B but
  not A are row DELETES; positions un-deleted (a rewrite path that never
  occurs with this repo's writers, but spec-possible) are re-INSERTS;
- files in both with identical delete state contribute NOTHING — the
  diff's scan cost is proportional to the CHANGED files, not the table.

`net=True` additionally cancels rewrite noise: a copy-on-write
compaction re-adds identical rows under new paths, which the file-level
diff reports as delete+insert pairs; multiset value comparison
(`exceptAll` both ways, changed rows only) nets those to zero. This is
SNAPSHOT-DIFF semantics (net row movement), not a per-commit change
feed — intermediate states between A and B are invisible by design.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rottnest_spark.core.fs import canon_path

_CHANGE_COL = "_change_type"


def _norm(c):
    return F.regexp_replace(c, "^file:/+", "/")


def _tagged_scan(spark, files):
    from rottnest_spark.sources.reader import read_parquet_tagged

    return read_parquet_tagged(spark, sorted(files))


def _rows_minus_positions(spark, files, pos_df, scan=None):
    """Rows of `files` with deleted positions removed (pos_df may be
    None). Keeps the __path/__pos tags for further joins. Scans go
    through the shared tagged reader (nanosecond-timestamp-safe)."""
    df = (scan or (lambda fl: _tagged_scan(spark, fl)))(files)
    if pos_df is not None:
        df = df.join(pos_df, ["__path", "__pos"], "left_anti")
    return df


def _restrict(spark, pos_df, files):
    """Positions limited to `files` — a broadcast semi-join against the
    (metadata-scale) file list, not an isin over thousands of literals."""
    if pos_df is None:
        return None
    from rottnest_spark.core.smalldf import local_df

    fl = local_df(spark, [(str(f),) for f in sorted(files)], "__path string")
    return pos_df.join(F.broadcast(fl), "__path", "left_semi")


def _pin_pos(pos_df):
    """Pin a deleted-positions frame (delete-scale rows). snapshot_diff
    references each side's positions from up to four plan branches (the
    only-side anti-join and both exceptAll directions), and the equality
    /DV position projections embed a data-file scan — left lazy, that
    scan re-executes once per branch. One eager localCheckpoint makes it
    run exactly once (the same pinning replicate_changes applies to the
    whole feed, measured 3x there)."""
    return None if pos_df is None else pos_df.localCheckpoint(eager=True)


def _changed_from_pos(spark, pos_a, pos_b) -> set[str]:
    """EXACT common-file bound for snapshot_diff, from the two PINNED
    position frames: a common file can contribute change rows only if
    its (path, pos) multiset differs between the sides, i.e. its path
    appears in the symmetric exceptAll difference. Replaces the
    metadata-walk bound (_iceberg_changed_common), which re-scanned data
    files to project delta equality deletes — with the sides already
    materialized, the difference is a delete-scale job, and the set it
    returns is tighter (a delete file replaced by an identical re-coding
    of the same positions no longer forces a scan of its data file).
    The collect is bounded by the number of files with changed delete
    state — metadata scale."""
    if pos_a is None and pos_b is None:
        return set()
    if pos_a is None or pos_b is None:
        # one side has no delete state: every pair on the other side IS
        # a difference — skip the exceptAll shuffles
        delta = (pos_b if pos_a is None else pos_a).select("__path").distinct()
    else:
        delta = (
            pos_a.exceptAll(pos_b)
            .unionByName(pos_b.exceptAll(pos_a))
            .select("__path")
            .distinct()
        )
    return {canon_path(r["__path"]) for r in delta.collect()}


def snapshot_diff(
    spark,
    files_a: set[str],
    pos_a,
    files_b: set[str],
    pos_b,
    net: bool = False,
    changed_common: set[str] | None = None,
    tagged_scan=None,
):
    """Shared diff core: (file sets, deleted-position DataFrames tagged
    __path/__pos or None) for states A and B → one DataFrame of the data
    columns + `_change_type` ('insert' | 'delete').

    `changed_common` (when the caller can compute it from metadata)
    bounds the common-file branch to files whose DELETE STATE actually
    changed — without it, any delete state forces a scan of every
    common file just to semi-join a handful of changed positions.

    `tagged_scan` (files → DataFrame tagged __path/__pos) overrides the
    default scan — column-mapped Delta tables inject their physical
    schema / field-id resolution here."""
    scan = tagged_scan or (lambda fl: _tagged_scan(spark, fl))
    only_a, only_b, common = (
        files_a - files_b,
        files_b - files_a,
        files_a & files_b,
    )
    if changed_common is not None:
        common = common & changed_common
    parts = []
    if only_b:
        parts.append(
            _rows_minus_positions(
                spark, only_b, _restrict(spark, pos_b, only_b), scan
            ).withColumn(_CHANGE_COL, F.lit("insert"))
        )
    if only_a:
        parts.append(
            _rows_minus_positions(
                spark, only_a, _restrict(spark, pos_a, only_a), scan
            ).withColumn(_CHANGE_COL, F.lit("delete"))
        )
    if common and (pos_a is not None or pos_b is not None):
        ca = _restrict(spark, pos_a, common)
        cb = _restrict(spark, pos_b, common)
        zero = spark.createDataFrame([], "__path string, __pos long")
        ca = ca if ca is not None else zero
        cb = cb if cb is not None else zero
        newly_deleted = cb.exceptAll(ca)
        resurrected = ca.exceptAll(cb)
        base = scan(common)
        parts.append(
            base.join(newly_deleted, ["__path", "__pos"], "left_semi")
            .withColumn(_CHANGE_COL, F.lit("delete"))
        )
        parts.append(
            base.join(resurrected, ["__path", "__pos"], "left_semi")
            .withColumn(_CHANGE_COL, F.lit("insert"))
        )
    if not parts:
        schema_src = sorted(files_a | files_b)
        if not schema_src:
            raise ValueError("both snapshots are empty — nothing to diff")
        return (
            scan([schema_src[0]])
            .withColumn(_CHANGE_COL, F.lit(""))
            .drop("__path", "__pos")
            .limit(0)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.drop("__path", "__pos")
    if net:
        cols = [c for c in out.columns if c != _CHANGE_COL]
        ins = out.filter(F.col(_CHANGE_COL) == "insert").select(*cols)
        dels = out.filter(F.col(_CHANGE_COL) == "delete").select(*cols)
        out = ins.exceptAll(dels).withColumn(
            _CHANGE_COL, F.lit("insert")
        ).unionByName(
            dels.exceptAll(ins).withColumn(_CHANGE_COL, F.lit("delete"))
        )
    return out


def delta_snapshot_diff(
    spark,
    table_path: str,
    from_version: int,
    to_version: int | None = None,
    fs=None,
    net: bool = False,
):
    """Row-level diff of a Delta table between two log versions
    (inclusive replay, deletion vectors honored on both sides)."""
    from rottnest_spark.sources.delta import (
        _delta_live_state,
        dv_positions_df,
    )

    def state(v):
        if v is not None and v < 0:
            # pre-creation: the empty table — lets a feed start BEFORE
            # commit 0 so the initial rows arrive as inserts
            return set(), None, {}
        st = _delta_live_state(table_path, v, fs)
        # canon both sides of every downstream join/compare: state keys
        # are relative whenever table_path is, __path row tags never are
        files = {canon_path(p) for p in st}
        dvs = {canon_path(p): dv for p, (_, dv) in st.items() if dv}
        pos = (
            dv_positions_df(spark, table_path, dvs).select(
                _norm(F.col("file_path")).alias("__path"),
                F.col("pos").alias("__pos"),
            )
            if dvs
            else None
        )
        return files, _pin_pos(pos), dvs

    files_a, pos_a, dvs_a = state(from_version)
    files_b, pos_b, dvs_b = state(to_version)
    # exact metadata-level bound on the common-file scan: only files
    # whose deletion-vector DESCRIPTOR differs can have position diffs
    changed = {
        f
        for f in files_a & files_b
        if dvs_a.get(f) != dvs_b.get(f)
    }
    return _delta_logical_names(
        snapshot_diff(
            spark, files_a, pos_a, files_b, pos_b, net=net,
            changed_common=changed,
            tagged_scan=_delta_mapped_scan(spark, table_path, fs),
        ),
        table_path,
        fs,
    )


def _delta_logical_names(df, table_path: str, fs):
    """Rename a diff/feed frame's physical data columns to their logical
    names on column-mapped tables (both modes, nested included);
    identity otherwise. The tag columns (_change_type, _commit_*) pass
    through untouched."""
    from rottnest_spark.sources.delta import (
        delta_table_meta,
        to_logical_frame,
    )

    return to_logical_frame(df, delta_table_meta(table_path, fs=fs))


def _delta_mapped_scan(spark, table_path: str, fs):
    """snapshot_diff `tagged_scan` override for column-mapped OR
    type-widened Delta tables: physical read schema + field-id
    resolution (ID mode), or the pinned widened schemaString. None when
    the table needs neither (the shared default scan applies)."""
    from rottnest_spark.sources.delta import (
        _cm_mode,
        delta_physical_schema,
        delta_protocol,
        delta_table_meta,
    )
    from rottnest_spark.sources.reader import read_parquet_tagged

    meta = delta_table_meta(table_path, fs=fs)
    schema = delta_physical_schema(
        meta, proto=delta_protocol(table_path, fs=fs)
    )
    if schema is None:
        return None
    fid = _cm_mode(meta) == "id"
    return lambda fl: read_parquet_tagged(
        spark, sorted(fl), schema=schema, field_id=fid
    )


def _iceberg_pos_side(spark, md, st, table_path):
    """Deleted-position DataFrame (__path/__pos) for one snapshot state:
    positional delete pairs ∪ the equality deletes' positional
    projection, DEDUPLICATED — a row can be both positionally deleted
    and eq-matched (the eq projection scans raw files), and a duplicated
    (path, pos) would survive exceptAll against the other side's single
    copy, emitting a spurious change row."""
    from rottnest_spark.sources.iceberg import (
        equality_delete_positions,
        position_delete_pairs_df,
    )

    pairs = position_delete_pairs_df(
        spark, st, md.get("location", ""), table_path
    )
    pos = (
        pairs.select(
            F.col("__del_path").alias("__path"),
            F.col("__del_pos").alias("__pos"),
        )
        if pairs is not None
        else None
    )
    if st["eq_deletes"]:
        # the eq projection embeds a DATA-FILE scan — pin it so the
        # branches of snapshot_diff don't re-run the scan (pure
        # positional pairs stay lazy: their decode is delete-file-scale
        # and an eager pin would only add action latency)
        eqpos = equality_delete_positions(spark, st, md).select(
            F.col("__path"), F.col("__pos")
        )
        pos = _pin_pos(
            (eqpos if pos is None else pos.unionByName(eqpos)).distinct()
        )
    return pos


def _iceberg_defaults_scan(spark, md):
    """tagged_scan override for v3 tables with `initial-default` fields:
    pre-evolution files scan missing-column-filled so diff/feed rows
    carry the spec default, not NULL (sources/iceberg.py
    scan_with_initial_defaults — the same hook column-mapped Delta uses).
    None when the table has no defaults (snapshot_diff's base scan)."""
    from rottnest_spark.sources.iceberg import (
        initial_default_fields,
        scan_with_initial_defaults,
    )

    dmap = initial_default_fields(md)
    if not dmap:
        return None
    return lambda fl: scan_with_initial_defaults(spark, fl, dmap, tagged=True)


def iceberg_snapshot_diff(
    spark,
    table_path: str,
    from_snapshot_id: int,
    to_snapshot_id: int | None = None,
    fs=None,
    net: bool = False,
):
    """Row-level diff of an Iceberg table between two snapshot ids
    (positional delete files honored on both sides)."""
    from rottnest_spark.sources.iceberg import (
        _current_metadata,
        _snapshot_state,
        delete_pairs_df,
    )

    md = _current_metadata(table_path, fs)
    by_id = {s["snapshot-id"]: s for s in md.get("snapshots", [])}

    def state(sid):
        if sid is None:
            sid = md.get("current-snapshot-id")
        if sid not in by_id:
            raise ValueError(f"snapshot {sid} not in the snapshot log")
        st = _snapshot_state(md, by_id[sid], table_path, fs)
        # canon: _rebase outputs are relative whenever table_path is,
        # while the pos side's __path values are always absolute
        return (
            {canon_path(p) for p in st["data"]},
            _iceberg_pos_side(spark, md, st, table_path),
            st,
        )

    files_a, pos_a, st_a = state(from_snapshot_id)
    files_b, pos_b, st_b = state(to_snapshot_id)
    # bound the common-file scan to files whose pinned position state
    # actually differs (exact — see _changed_from_pos)
    changed = _changed_from_pos(spark, pos_a, pos_b)
    return snapshot_diff(
        spark, files_a, pos_a, files_b, pos_b, net=net,
        changed_common=changed,
        tagged_scan=_iceberg_defaults_scan(spark, md),
    )


def delta_changes_feed(
    spark,
    table_path: str,
    from_version: int,
    to_version: int | None = None,
    fs=None,
):
    """Per-commit row-level change feed: one DataFrame of every row that
    entered/left in each version step (from_version, from_version+1],
    ..., tagged `_commit_version` — the CDC shape incremental consumers
    replay in order. Each step diffs only that commit's changed files,
    so total work is proportional to total change volume, not versions ×
    table size."""
    from rottnest_spark.sources.delta import _delta_live_state

    if to_version is None:
        import os as _os

        from rottnest_spark.core.fs import LocalFS
        from rottnest_spark.sources.delta_write import (
            _log_dir,
            _next_version,
        )

        to_version = _next_version(_log_dir(table_path), fs or LocalFS()) - 1
    if to_version <= from_version:
        raise ValueError(
            f"nothing to feed: versions ({from_version}, {to_version}]"
        )
    from_version = max(from_version, -1)

    # ONE incremental log pass supplies every version's state (a
    # per-step delta_snapshot_diff would replay the whole log per
    # version: O(V²) in log work)
    from rottnest_spark.sources.delta import (
        _delta_states_range,
        dv_positions_df,
    )

    def as_side(st):
        files = {canon_path(p) for p in st}
        dvs = {canon_path(p): dv for p, (_, dv) in st.items() if dv}
        pos = (
            dv_positions_df(spark, table_path, dvs).select(
                _norm(F.col("file_path")).alias("__path"),
                F.col("pos").alias("__pos"),
            )
            if dvs
            else None
        )
        # NOT pinned: dv decode is delete-scale with no data-file scan,
        # and an eager pin per version side would serialize K blocking
        # jobs at feed construction (measured: first delta_change_feed
        # run 16 s pinned vs 5 s lazy)
        return files, pos, dvs

    parts = []
    prev = None
    ordinal = 0
    mapped_scan = _delta_mapped_scan(spark, table_path, fs)
    for v, st in _delta_states_range(
        table_path, from_version, to_version, fs=fs
    ):
        side = as_side(st)
        if prev is not None:
            if prev[0] or side[0]:  # both file-less = an empty step
                # the same metadata-level changed_common bound as
                # delta_snapshot_diff: without it, any DV-bearing step
                # scans EVERY common file just to semi-join a handful of
                # changed positions — O(table) per commit (caught by
                # tools/feed_scale_probe.py: 30 s/poll at sf10 for a
                # 200-row change, vs ∝-changes with the bound)
                changed = {
                    f
                    for f in prev[0] & side[0]
                    if prev[2].get(f) != side[2].get(f)
                }
                step = snapshot_diff(
                    spark, prev[0], prev[1], side[0], side[1],
                    changed_common=changed,
                    tagged_scan=mapped_scan,
                )
                parts.append(
                    step.withColumn("_commit_version", F.lit(v))
                    .withColumn("_commit_ordinal", F.lit(int(ordinal)))
                )
            ordinal += 1
        prev = side
    if not parts:
        raise ValueError(
            f"nothing to feed: versions ({from_version}, {to_version}]"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return _delta_logical_names(out, table_path, fs)


class CursorCheckpoint:
    """THE durable-position primitive every incremental consumer shares
    (Delta cursor, Iceberg cursor — one tested implementation instead of
    per-cursor hand-rolled text files, which is how crash-window bugs
    get in). One integer value, written atomically through the FS seam
    (whole-object PUT on object stores, temp+replace locally via the
    store's own write_text), read back on restart.

    With `monotonic=True`, `advance()` refuses to move the position
    numerically BACKWARD — an at-least-once consumer accidentally acking
    a stale poll result must not regress durable progress. Use it only
    where the checkpointed value is itself ordered (Delta versions);
    Iceberg snapshot ids are spec-random, so that cursor leaves the
    guard off and relies on poll()'s own rollback detection."""

    def __init__(self, path: str, fs=None, monotonic: bool = False):
        from rottnest_spark.core.fs import LocalFS

        self.path = path
        self.fs = fs or LocalFS()
        self.monotonic = monotonic

    def read(self) -> int | None:
        if self.fs.exists(self.path):
            text = self.fs.read_text(self.path).strip()
            try:
                return int(text)
            except ValueError:
                # a torn write on a store whose write_text is not atomic
                # (LocalFS IS temp+replace; object-store PUTs are whole
                # or absent) can leave garbage — an at-least-once
                # consumer restarting from pre-creation only re-delivers,
                # never loses, so warn and treat as absent
                import warnings

                warnings.warn(
                    f"checkpoint {self.path} is unparseable "
                    f"({text[:40]!r}) — treating as pre-creation; the "
                    "consumer will re-deliver from the start",
                    stacklevel=2,
                )
                return None
        return None

    def advance(self, value: int) -> None:
        if self.monotonic:
            cur = self.read()
            if cur is not None and int(value) < cur:
                raise ValueError(
                    f"checkpoint {self.path} is at {cur}; refusing to "
                    f"regress to {value} — ack only values poll() returned"
                )
        self.fs.write_text(self.path, str(int(value)))


class DeltaChangesCursor:
    """Durable incremental-consumption cursor: `poll()` returns the
    change feed since the last acknowledged version (None when caught
    up) and `ack(version)` persists progress — the at-least-once
    consumer loop over `delta_changes_feed`, checkpointed through the
    shared CursorCheckpoint primitive the same way Structured Streaming
    checkpoints its offsets."""

    def __init__(self, spark, table_path: str, checkpoint_path: str, fs=None):
        from rottnest_spark.core.fs import LocalFS

        self.spark = spark
        self.table_path = table_path
        self.fs = fs or LocalFS()
        self._ckpt = CursorCheckpoint(
            checkpoint_path, fs=self.fs, monotonic=True
        )

    def position(self) -> int:
        pos = self._ckpt.read()
        # pre-creation: commit 0's rows feed as inserts
        return -1 if pos is None else pos

    def poll(self, max_versions: int | None = None):
        """(feed DataFrame tagged _commit_version, feed's END version) or
        (None, current position) when caught up.

        `max_versions` BOUNDS one poll's width: the feed covers at most
        that many version steps and the returned end version is what to
        ack — the consumer loop then catches up over multiple polls. A
        cursor that slept through 10⁴ commits would otherwise assemble a
        10⁴-branch union plan in a single poll; capped, plan width stays
        constant and progress is still monotone through the loop."""
        return self._poll_from(self.position(), max_versions)

    def _poll_from(self, pos: int, max_versions: int | None = None):
        """`poll` from an EXPLICIT position (no checkpoint read): the
        pipelined consumer loop (`sync_all`) prefetches step N+1's feed
        from step N's returned end version before step N is acked."""
        b = self._bounds_from(pos, max_versions)
        if b is None:
            return None, pos
        return self._feed(*b), b[1]

    def _bounds_from(self, pos: int, max_versions: int | None = None):
        """(from, to) version bounds of the next consumer step, or None
        when caught up — the METADATA-ONLY half of a poll (one log-dir
        listing, no DataFrame construction), so `sync_all` can discover
        every pending step's bounds up front and build/pin the feeds
        concurrently."""
        from rottnest_spark.sources.delta_write import _log_dir, _next_version

        latest = _next_version(_log_dir(self.table_path), self.fs) - 1
        if max_versions is not None:
            latest = min(latest, pos + max(1, int(max_versions)))
        if latest <= pos:
            return None
        return pos, latest

    def _feed(self, pos: int, latest: int):
        """Construct the feed for explicit `_bounds_from` bounds."""
        return delta_changes_feed(
            self.spark, self.table_path, pos, latest, fs=self.fs
        )

    def ack(self, version: int) -> None:
        self._ckpt.advance(int(version))


def iceberg_changes_feed(
    spark,
    table_path: str,
    from_snapshot_id: int | None,
    to_snapshot_id: int | None = None,
    fs=None,
):
    """Per-snapshot row-level change feed for an Iceberg table, tagged
    `_commit_snapshot_id` + `_commit_ordinal` (the feed's own 0-based
    step index — spec snapshot ids are random 64-bit longs, so ORDER
    comes from the metadata's append-ordered snapshot list, never from
    ids or caller-supplied timestamps). `from_snapshot_id` None (or any
    id not in the log) means PRE-CREATION: the first snapshot's
    surviving rows arrive as inserts. Each snapshot's state is built
    ONCE (per-snapshot manifest walks keep the loop linear); steps
    whose both sides are file-less are skipped (an empty table stays an
    empty feed step, not an error)."""
    from rottnest_spark.sources.iceberg import (
        _current_metadata,
        _snapshot_state,
    )

    md = _current_metadata(table_path, fs)
    snaps = md.get("snapshots", [])
    if not snaps:
        raise ValueError(f"{table_path} has no snapshots")
    ids = [s["snapshot-id"] for s in snaps]  # append order per the spec
    if to_snapshot_id is None:
        to_snapshot_id = md.get("current-snapshot-id")
    start = ids.index(from_snapshot_id) if from_snapshot_id in ids else -1
    end = ids.index(to_snapshot_id)
    if end <= start:
        raise ValueError(
            f"nothing to feed: snapshots ({from_snapshot_id}, "
            f"{to_snapshot_id}]"
        )

    def side(i):
        if i < 0:
            return set(), None, None
        st = _snapshot_state(md, snaps[i], table_path, fs)
        return (
            {canon_path(p) for p in st["data"]},
            _iceberg_pos_side(spark, md, st, table_path),
            st,
        )

    parts = []
    schema_probe: str | None = None
    prev = side(start)
    for ordinal, i in enumerate(range(start + 1, end + 1)):
        cur = side(i)
        if schema_probe is None:
            for f in sorted(prev[0] | cur[0]):
                schema_probe = f
                break
        if not prev[0] and not cur[0]:
            prev = cur
            continue  # both sides file-less: an empty step, not an error
        changed = _changed_from_pos(spark, prev[1], cur[1])
        step = snapshot_diff(
            spark, prev[0], prev[1], cur[0], cur[1],
            changed_common=changed,
            tagged_scan=_iceberg_defaults_scan(spark, md),
        )
        parts.append(
            step.withColumn(
                "_commit_snapshot_id", F.lit(int(ids[i]))
            ).withColumn("_commit_ordinal", F.lit(int(ordinal)))
        )
        prev = cur
    if not parts:
        if schema_probe is None:
            raise ValueError(
                "every snapshot in the range is empty — nothing to diff"
            )
        from rottnest_spark.sources.reader import read_parquet_tagged

        probe_scan = _iceberg_defaults_scan(spark, md) or (
            lambda fl: read_parquet_tagged(spark, fl)
        )
        return (
            probe_scan([schema_probe])
            .drop("__path", "__pos")
            .withColumn(_CHANGE_COL, F.lit(""))
            .withColumn("_commit_snapshot_id", F.lit(0).cast("long"))
            .withColumn("_commit_ordinal", F.lit(0))
            .limit(0)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


class IcebergChangesCursor:
    """Durable incremental consumer over `iceberg_changes_feed` — the
    Delta cursor's twin, checkpointing the last acknowledged snapshot
    id through the shared CursorCheckpoint (absent = pre-creation).

    Snapshot ids are spec-random (order comes only from the metadata's
    append-ordered list), so the checkpoint's numeric monotonic guard
    stays OFF; poll()'s rollback detection is the regression defense."""

    def __init__(self, spark, table_path: str, checkpoint_path: str, fs=None):
        from rottnest_spark.core.fs import LocalFS

        self.spark = spark
        self.table_path = table_path
        self.fs = fs or LocalFS()
        self._ckpt = CursorCheckpoint(checkpoint_path, fs=self.fs)

    def position(self) -> int | None:
        return self._ckpt.read()  # None = pre-creation

    def poll(self, max_versions: int | None = None):
        """(feed DataFrame tagged _commit_snapshot_id, END snapshot id)
        or (None, position) when caught up. `max_versions` bounds one
        poll to that many snapshot steps (see DeltaChangesCursor.poll —
        same constant-plan-width catch-up loop)."""
        return self._poll_from(self.position(), max_versions)

    def _poll_from(self, pos, max_versions: int | None = None):
        """`poll` from an EXPLICIT position — see
        DeltaChangesCursor._poll_from."""
        b = self._bounds_from(pos, max_versions)
        if b is None:
            return None, pos
        return self._feed(*b), b[1]

    def _bounds_from(self, pos, max_versions: int | None = None):
        """(from, to) snapshot-id bounds of the next consumer step, or
        None when caught up — the metadata-only half of a poll (see
        DeltaChangesCursor._bounds_from)."""
        from rottnest_spark.sources.iceberg import _current_metadata

        md = _current_metadata(self.table_path, self.fs)
        latest = md.get("current-snapshot-id")
        if latest in (None, -1) or latest == pos:
            return None
        ids = [s["snapshot-id"] for s in md.get("snapshots", [])]
        if pos is not None and (
            pos in ids and latest in ids and ids.index(latest) <= ids.index(pos)
        ):
            # the table rolled back behind our acked position — report
            # caught-up until it moves forward again, never crash
            return None
        if max_versions is not None and latest in ids:
            start = ids.index(pos) if pos in ids else -1
            end = min(ids.index(latest), start + max(1, int(max_versions)))
            latest = ids[end]
            if end <= start:
                return None
        return pos, latest

    def _feed(self, pos, latest):
        """Construct the feed for explicit `_bounds_from` bounds."""
        return iceberg_changes_feed(
            self.spark, self.table_path, pos, latest, fs=self.fs
        )

    def ack(self, snapshot_id: int) -> None:
        self._ckpt.advance(int(snapshot_id))


def replicate_changes(feed, lake, key_col: str, version_col: str) -> dict:
    """Apply a change-feed DataFrame (`_change_type` + `version_col`
    tags, full rows) to a destination lake as ONE idempotent MERGE —
    cross-format table replication: any feed source (Delta versions,
    Iceberg snapshots) into any writable destination (plain ParquetLake,
    DeltaWritableLake, IcebergWritableLake), each poll one copy-on-write
    commit on the destination.

    The feed's per-commit granularity collapses to final-state-per-key
    inside merge_into (latest `version_col` wins; a delete followed by a
    re-insert at a higher version lands as the re-insert)."""
    return lake.merge_into(
        _stage_feed(feed, version_col),
        key_col,
        seq_col="__seq__",
        op_col="__op__",
    )


def _stage_feed(feed, version_col: str):
    """Tag a change feed with `__op__`/`__seq__` and PIN it (eager
    localCheckpoint): merge_into walks the change set several times
    (latest-wins collapse, touched-file pruning, the rewrite itself),
    and each walk would otherwise recompute the whole snapshot-diff
    chain — measured 3x the poll cost per decade in
    tools/feed_scale_probe.py before pinning."""
    from pyspark.sql import functions as F

    seq_src = (
        "_commit_ordinal" if "_commit_ordinal" in feed.columns else version_col
    )
    changes = feed.withColumn(
        "__op__",
        F.when(F.col("_change_type") == "delete", F.lit("D")).otherwise(
            F.lit("I")
        ),
    ).withColumn("__seq__", F.col(seq_src).cast("long"))
    # within one version a key may carry delete+insert (an upsert step):
    # rank deletes below inserts at the same version so the insert wins
    drop_cols = [
        c
        for c in ("_change_type", version_col, "_commit_ordinal")
        if c in changes.columns
    ]
    changes = changes.withColumn(
        "__seq__",
        F.col("__seq__") * 2 + (F.col("__op__") == "I").cast("long"),
    ).drop(*drop_cols)
    return changes.localCheckpoint(eager=True)


def sync_table(
    cursor, lake, key_col: str, max_versions: int | None = None
) -> dict | None:
    """One consumer step: poll the cursor, MERGE the new changes into
    the destination lake, acknowledge. Returns merge stats, or None when
    caught up. Loop it (or drive it from a scheduler) and the
    destination tracks the source table commit-by-commit — at-least-once
    with idempotent merges, the cross-format replication loop.
    `max_versions` caps one step's feed width (constant plan size during
    a long catch-up; the loop still converges)."""
    feed, latest = cursor.poll(max_versions=max_versions)
    if feed is None:
        return None
    version_col = (
        "_commit_snapshot_id"
        if "_commit_snapshot_id" in feed.columns
        else "_commit_version"
    )
    stats = replicate_changes(feed, lake, key_col, version_col)
    cursor.ack(latest)
    return stats


def sync_all(
    cursor, lake, key_col: str, max_versions: int | None = None
) -> list[dict]:
    """Drain the cursor: poll + MERGE + ack repeatedly until caught up —
    `while sync_table(...)` as one call, with the consumer steps
    PIPELINED (guide §2.6): step N+1's poll (a driver metadata walk)
    and feed pin (the eager localCheckpoint `_stage_feed` takes — the
    expensive source-scan jobs of a step) run on a worker thread while
    step N's merge runs on the caller's thread.

    Correctness is the sequential loop's, by construction:
    - the feed depends only on the SOURCE table (already committed when
      the poll observes it) and the start position, which is known the
      moment step N's poll returns — never on the destination merge;
    - merges still apply strictly in order, each `ack` lands only after
      its own merge, and a failed merge discards the prefetched feed
      without acking anything (at-least-once, like the plain loop).

    Reader-flag caveat (sources/reader._scan): the prefetch constructs
    and EXECUTES source scans concurrently with the merge's destination
    scans, and the nanos/field-id parquet flags are session-wide. Every
    supported sync pairing reads plain Spark-written parquet on both
    sides (both flags false on both threads), so the overlap is safe;
    a nanosecond-timestamped or column-mapped SOURCE would need the
    sequential loop (`while sync_table(...)`) instead.

    Shape: step BOUNDS come from `_bounds_from` (metadata-only, one
    listing per step, main thread); feed construction + pin go to a
    2-worker pool with at most 3 steps in flight (constant memory on a
    10⁴-commit catch-up, exactly like max_versions' constant plan
    width), because the expensive halves of consecutive steps — the
    eq-delete position pins inside feed construction and the
    `_stage_feed` checkpoint — are independent of each other once the
    bounds are known."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    def prep(lo, hi):
        feed = cursor._feed(lo, hi)
        version_col = (
            "_commit_snapshot_id"
            if "_commit_snapshot_id" in feed.columns
            else "_commit_version"
        )
        return _stage_feed(feed, version_col)

    out: list[dict] = []
    with ThreadPoolExecutor(max_workers=2) as pool:
        pending: deque = deque()  # [(pinned-changes future, end position)]
        pos = cursor.position()
        caught_up = False

        def discover() -> None:
            nonlocal pos, caught_up
            while not caught_up and len(pending) < 3:
                b = cursor._bounds_from(pos, max_versions=max_versions)
                if b is None:
                    caught_up = True
                    return
                pending.append((pool.submit(prep, *b), b[1]))
                pos = b[1]

        discover()
        try:
            while pending:
                fut, latest = pending.popleft()
                changes = fut.result()
                discover()  # top up so later pins overlap this merge
                stats = lake.merge_into(
                    changes, key_col, seq_col="__seq__", op_col="__op__"
                )
                cursor.ack(latest)
                out.append(stats)
        finally:
            # a failed merge/prep must not leave workers running into a
            # half-acked cursor state: drop everything not yet merged
            for fut, _ in pending:
                fut.cancel()
    return out
