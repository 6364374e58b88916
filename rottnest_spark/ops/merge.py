"""CDC merge: apply an insert/update/delete changeset to a keyed table
(MERGE INTO semantics), as one declarative plan.

This is part of the beyond-the-reference lakehouse surface (the reference's
lakes are append-only — files enter via index build and leave via vacuum,
`python/rottnest/backends/utils.py`); a training-data lake additionally
needs upserts (refreshed crawls, label fixes) and deletes (takedowns,
opt-outs). Semantics follow the public Delta/Iceberg MERGE model:
copy-on-write, latest change per key wins.

Scale notes (100 TB):
- `latest_changes` is a `max_by` aggregation, not a window: partial
  aggregation runs map-side, so the shuffle carries one row per key, and
  there is no per-partition sort.
- `merge_changes` is one shuffled join between target and the (usually
  tiny) change set; Spark/AQE broadcasts the change side when it fits,
  making the apply a scan-speed map job over the target.
- File-granular copy-on-write lives in `ParquetLake.merge_into`
  (core/lake.py): footer zone maps prune the rewrite to only the files
  whose key range intersects the changeset, so a 100-row CDC batch
  rewrites a handful of files, never the lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Op codes in the change feed. Anything not DELETE is an upsert (the
#: insert/update distinction collapses under copy-on-write apply).
DELETE_OP = "D"


def latest_changes(
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Collapse a CDC feed to its final state per key: the row with the
    highest `seq_col` wins. One partial-aggregatable `max_by` — no window
    sort, one row per key crosses the shuffle.

    Ties on (key, seq) are broken by op (DELETE loses), then by the full
    row struct, so the result is deterministic even on malformed feeds.
    """
    others = [c for c in changes.columns if c not in key_cols]
    pick = F.max_by(
        F.struct(*[F.col(c) for c in others]),
        F.struct(
            F.col(seq_col),
            # deterministic tie-breaks: prefer the non-delete, then the
            # lexicographically largest payload
            (F.col(op_col) != DELETE_OP).cast("int"),
            *[F.col(c) for c in others],
        ),
    ).alias("__final__")
    agg = changes.groupBy(*key_cols).agg(pick)
    return agg.select(
        *key_cols, *[F.col(f"__final__.{c}").alias(c) for c in others]
    )


def merge_changes(
    target: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    update_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a CDC changeset to `target` and return the merged table:
    rows whose key has a change are replaced by the latest change payload
    (or dropped when that change is a DELETE); unchanged rows pass
    through; changes for unseen keys become inserts.

    The change schema is the target schema + `seq_col` + `op_col`.
    Plan shape: one `max_by` agg over the changes, one left-anti join
    (broadcast when the change set is small — the common CDC case), one
    union. The target is scanned exactly once.

    `update_cols` enables PARTIAL updates (the Delta `UPDATE SET c1, c2`
    form): update rows overwrite only the listed columns of existing
    rows and keep the target's values elsewhere; inserts and deletes are
    unaffected. The plan becomes target LEFT JOIN changes (change side
    broadcastable) + inserts via an anti-join against the target's
    column-pruned key projection — the wide target still scans once.
    """
    final = latest_changes(changes, key_cols, seq_col, op_col)
    if update_cols is None:
        keep = target.join(final.select(*key_cols), key_cols, "left_anti")
        upserts = final.filter(F.col(op_col) != DELETE_OP).select(
            *target.columns
        )
        return keep.unionByName(upserts)

    bad = set(update_cols) & set(key_cols)
    assert not bad, f"key columns cannot be update targets: {sorted(bad)}"
    f = final.withColumn("__in_f__", F.lit(True))
    f = f.select(
        *key_cols,
        "__in_f__",
        F.col(op_col).alias("__op__"),
        *[F.col(c).alias(f"__new_{c}__") for c in update_cols],
    )
    joined = target.join(f, key_cols, "left_outer").filter(
        ~F.coalesce(F.col("__op__") == DELETE_OP, F.lit(False))
    )
    existing = joined.select(
        *[
            (
                F.when(F.col("__in_f__"), F.col(f"__new_{c}__"))
                .otherwise(F.col(c))
                .alias(c)
                if c in update_cols
                else F.col(c)
            )
            for c in target.columns
        ]
    )
    inserts = (
        final.filter(F.col(op_col) != DELETE_OP)
        .join(target.select(*key_cols), key_cols, "left_anti")
        .select(*target.columns)
    )
    return existing.unionByName(inserts)


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    seq: int = 1,
    op_col: str = "op",
    seq_col: str = "seq",
) -> DataFrame:
    """The inverse of merge_changes: the CDC changeset turning `old` into
    `new` — DELETE for keys only in old, upsert (U) for keys only in new
    or whose payload differs. Law (tested):
    merge_changes(old, table_diff(old, new), keys) ≡ new.

    One full-outer join on the keys; payload comparison is a null-safe
    struct equality (codegen)."""
    others = [c for c in old.columns if c not in key_cols]
    o = old.select(
        *key_cols,
        F.struct(*[F.col(c) for c in others]).alias("__old__"),
        F.lit(True).alias("__in_o__"),
    )
    n = new.select(
        *key_cols,
        F.struct(*[F.col(c) for c in others]).alias("__new__"),
        F.lit(True).alias("__in_n__"),
    )
    j = o.join(n, key_cols, "full_outer")
    deletes = j.filter(F.col("__in_n__").isNull()).select(
        *key_cols,
        *[F.col(f"__old__.{c}").alias(c) for c in others],
        F.lit(seq).alias(seq_col),
        F.lit(DELETE_OP).alias(op_col),
    )
    upserts = (
        j.filter(
            F.col("__in_n__").isNotNull()
            & (
                F.col("__in_o__").isNull()
                | ~F.col("__old__").eqNullSafe(F.col("__new__"))
            )
        )
        .select(
            *key_cols,
            *[F.col(f"__new__.{c}").alias(c) for c in others],
            F.lit(seq).alias(seq_col),
            F.lit("U").alias(op_col),
        )
    )
    return deletes.unionByName(upserts)


def snapshot_diff(lake, sid_a: int, sid_b: int | None, key_col: str) -> DataFrame:
    """CDC feed between two time-travel snapshots of a lake (sid_b=None
    means the live state) — the change-data-FEED side of CDC, derived
    from storage instead of a transaction log.

    Scale: data files are IMMUTABLE (every rewrite publishes new names),
    so files whose ORIGINAL path appears in both snapshots cannot differ
    and are skipped entirely; the diff join runs only over the symmetric
    difference — proportional to what changed, never to the lake."""
    import json
    import os

    lake_dir = lake.data_dir

    def manifest_files(sid):
        if sid is None:
            return lake.files
        with open(
            os.path.join(lake_dir, "_snapshots", f"{sid:06d}.json")
        ) as fh:
            return json.load(fh)["files"]

    fa, fb = manifest_files(sid_a), manifest_files(sid_b)
    only_a = sorted(set(fa) - set(fb))
    only_b = sorted(set(fb) - set(fa))

    def resolve(paths):
        out = []
        for f in paths:
            if os.path.exists(f):
                out.append(f)
            else:
                h = os.path.join(
                    lake_dir, "_history", os.path.relpath(f, lake_dir)
                )
                if not os.path.exists(h):
                    raise FileNotFoundError(
                        f"{f} reclaimed by vacuum_history()"
                    )
                out.append(h)
        return out

    from rottnest_spark.sources.reader import read_parquet

    if not only_a and not only_b:
        empty = lake.read(lake.files[:1]).limit(0)
        return table_diff(empty, empty, [key_col])
    base = lake.read(lake.files[:1]).limit(0)
    old = read_parquet(lake.spark, resolve(only_a)) if only_a else base
    new = read_parquet(lake.spark, resolve(only_b)) if only_b else base
    return table_diff(old, new, [key_col])
