"""Lake parquet reader.

Spark's vectorized reader rejects TIMESTAMP(NANOS) parquet columns
(PARQUET_TYPE_ILLEGAL) — common in pandas/arrow-written lakes (e.g. the
events fixture). We read them via the legacy nanos-as-long session flag and
rebuild a microsecond TimestampType column (`div 1000` truncation — the same
µs truncation DuckDB applies to nanosecond parquet, keeping oracles aligned).

Only a footer peek of ONE file decides whether conversion applies: the lake
invariant (append-only, uniform schema) matches the reference's
schema-on-read stance (column located by name, src/formats/parquet.rs:271-280).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_NANOS_FLAG = "spark.sql.legacy.parquet.nanosAsLong"
_FIELD_ID_FLAG = "spark.sql.parquet.fieldId.read.enabled"

# -- read-schema pin (round 10: index build/search on type-widened
# Delta tables). A lake that KNOWS the table's schema (Delta
# typeWidening: files written pre-widen physically carry the narrow
# type; the log's schemaString is authoritative) scopes a pin around
# its scan-producing calls; every read_parquet/read_parquet_tagged/
# row-group fetch inside the scope reads AT the pinned schema (Spark's
# parquet up-cast widens int32→long, float→double, decimal rescale
# per file). Plans capture the schema at construction, so the pin only
# needs to cover DataFrame CONSTRUCTION, not collection.
import contextlib as _contextlib
import contextvars as _contextvars

_SCHEMA_PIN = _contextvars.ContextVar("rottnest_read_schema_pin", default=None)


@_contextlib.contextmanager
def read_schema_pin(schema):
    """Scope an explicit read schema over every lake parquet scan built
    inside the context (no-op when schema is None)."""
    tok = _SCHEMA_PIN.set(schema)
    try:
        yield
    finally:
        _SCHEMA_PIN.reset(tok)


def pinned_read_schema():
    return _SCHEMA_PIN.get()


def _scan(spark, files, schema, field_id):
    """One shared spark.read entry: optional explicit schema (column-
    mapped tables address PHYSICAL names/field ids), optional parquet
    field-id resolution (Delta column-mapping ID mode — the schema then
    carries parquet.field.id metadata and Spark matches by id, erroring
    on files without ids rather than falling back to names). Both flags
    set explicitly BOTH ways, like the nanos flag: stale session state
    must never change how an unrelated later read resolves columns.

    CONCURRENCY (r11 ADVICE / r12 measurement): both flags are
    session-wide AND captured at EXECUTION time (the scan's hadoopConf
    is built at first action; verified empirically — a flag flipped
    between construction and collect changes the resolution, and the
    per-read `.option(...)` form is ignored by Spark 4.1). Scans that
    need a non-default value (field_id=True mapped tables, nanos
    sources) must therefore not EXECUTE concurrently with another
    thread setting the flags — the engine's threaded sections
    (sync_all prefetch, build/upsert overlaps) all read plain
    Spark-written parquet where both flags are false on every thread."""
    spark.conf.set(_FIELD_ID_FLAG, "true" if field_id else "false")
    r = spark.read.schema(schema) if schema is not None else spark.read
    return r.parquet(*files)


def nanos_ts_columns(file: str) -> list[str]:
    """Columns Spark cannot decode: INT64 + logical TIMESTAMP(NANOS).

    Must inspect the PHYSICAL parquet type: Spark-written INT96 timestamps
    are reported by pyarrow's *arrow* schema as timestamp[ns] too, but Spark
    reads INT96 natively — flagging those would mis-convert valid columns.
    """
    import pyarrow.parquet as pq

    schema = pq.ParquetFile(file).schema
    out = []
    for i in range(len(schema)):
        col = schema.column(i)
        lt = col.logical_type
        if (
            col.physical_type == "INT64"
            and lt is not None
            and lt.type == "TIMESTAMP"
            and "timeUnit=nanoseconds" in str(lt)
        ):
            out.append(col.name)
    return out


def read_parquet(
    spark: SparkSession,
    files: list[str],
    columns: list[str] | None = None,
    schema=None,
    field_id: bool = False,
) -> DataFrame:
    """spark.read.parquet with transparent nanosecond-timestamp handling.

    NOTE: truncation (not rounding) to µs; pre-1970 nanos would truncate
    toward zero instead of flooring — acceptable for log/event data.
    """
    if schema is None:
        schema = _SCHEMA_PIN.get()
    ns_cols = nanos_ts_columns(files[0])
    # Set the flag EXPLICITLY both ways: a stale true from an earlier read
    # would make a later non-ns read silently decode ns columns (present in
    # other files of the list but not files[0]) as raw bigint; with the flag
    # false Spark fails loudly (PARQUET_TYPE_ILLEGAL) on such mixed lakes.
    spark.conf.set(_NANOS_FLAG, "true" if ns_cols else "false")
    df = _scan(spark, files, schema, field_id)
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    if columns:
        df = df.select(*columns)
    return df


def uri_path_col(c):
    """OS path from a `_metadata.file_path` URI Column (round 11): strip
    the file: scheme and PERCENT-DECODE byte-exactly. Spark tags rows
    with a URI — a dir Spark itself laid out as `p=NOT%20SPECIFIED`
    (its escaping of a space in a partition VALUE) tags as
    `...%2520SPECIFIED...`, so the un-decoded tag never matches the
    manifest/log path and every join against it silently (or loudly)
    misses. `url_decode()` is NOT usable: it speaks
    x-www-form-urlencoded and would eat literal '+' path chars. Pure
    JVM: split on '%', rebuild as BINARY (unhex each escape, UTF-8
    bytes between), decode once — multibyte sequences survive."""
    p = F.regexp_replace(c, "^file:/+", "/")
    parts = F.split(p, "%")
    tail = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
    decoded = F.decode(
        F.aggregate(
            tail,
            F.encode(F.element_at(parts, 1), "UTF-8"),
            lambda acc, x: F.concat(
                acc,
                F.unhex(F.substring(x, 1, 2)),
                F.encode(F.substring(x, 3, 2147483647), "UTF-8"),
            ),
        ),
        "UTF-8",
    )
    return F.when(p.contains("%"), decoded).otherwise(p)


def uri_path_str(p: str) -> str:
    """Driver-side twin of uri_path_col for collected tag values."""
    import re as _re
    from urllib.parse import unquote

    out = _re.sub(r"^file:/+", "/", p)
    return unquote(out) if "%" in out else out


def read_parquet_tagged(
    spark: SparkSession,
    files: list[str],
    schema=None,
    field_id: bool = False,
) -> DataFrame:
    """`read_parquet` variant that keeps row provenance: every row is
    tagged `__path` (normalized absolute file path) and `__pos`
    (file-global row index) from Spark's `_metadata` column, tagged
    BEFORE any projection (metadata columns resolve only on the scan
    relation). One shared implementation of the nanos-flag dance — the
    merge-on-read row filters (delta/iceberg `_base_read`), the
    candidate fetch (core/refine.py) and the snapshot diff
    (sources/changes.py) all build on it."""
    if schema is None:
        schema = _SCHEMA_PIN.get()
    ns_cols = nanos_ts_columns(files[0])
    spark.conf.set(_NANOS_FLAG, "true" if ns_cols else "false")
    df = _scan(spark, files, schema, field_id).withColumns(
        {
            "__path": uri_path_col(F.col("_metadata.file_path")),
            "__pos": F.col("_metadata.row_index"),
        }
    )
    for c in ns_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df
