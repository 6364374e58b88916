"""Parquet physical-layout extraction — the analog of the reference's
`get_parquet_layout` (src/formats/parquet.rs:244-419) and the `.meta`
page-layout table (backends/utils.py:83-97).

Granularity difference (SURVEY §7.1): the reference's pruning unit (uid) is a
Parquet *data page*; Spark has no page API, so ours is **(file_path,
row_group)**. `row_group = -1` means "whole file" (used by indexes built with
the native vectorized reader, where per-row-group provenance isn't available
but per-file provenance is, via the `_metadata.file_path` column). Both
granularities are correct because the exact refine step removes false
positives — a coarser unit only costs extra rows scanned, never wrong answers.

Layout extraction is distributed: one Spark task per batch of files, each
doing a footer-only pyarrow metadata read. At 100 TB / ~100k files this is a
metadata-only pass that parallelizes across the cluster, mirroring the
reference's per-file async footer decode.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LAYOUT_SCHEMA = (
    "file_path string, row_group int, num_rows bigint, row_start bigint"
)

WHOLE_FILE = -1  # sentinel row_group meaning "the entire file"


def extract_layout(spark: SparkSession, files: list[str]) -> DataFrame:
    """One row per (file, row_group): num_rows + cumulative row offset.

    The cumulative offset mirrors the reference's per-page row-offset window
    aggregation (backends/utils.py:76-81).

    NOTE (repo convention): executor-side functions are defined as *closures*
    so cloudpickle serializes them by value — the package then doesn't have
    to be importable on executors (the driver contract hands us a foreign
    SparkSession with an unknown worker PYTHONPATH).
    """

    def layout_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # executor-side imports only
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for path in pdf["file_path"]:
                md = pq.ParquetFile(path).metadata
                row_start = 0
                for rg in range(md.num_row_groups):
                    n = md.row_group(rg).num_rows
                    rows.append((path, rg, n, row_start))
                    row_start += n
            yield pd.DataFrame(
                rows, columns=["file_path", "row_group", "num_rows", "row_start"]
            )

    # Parallelize straight into the task count (footer reads are tiny and
    # IO-bound): a default-sliced local relation plus a repartition paid
    # one Python round trip per slice AND a shuffle (core/smalldf.py).
    from rottnest_spark.core.smalldf import local_df

    n_part = max(1, min(len(files), 64))
    files_df = local_df(
        spark, [(f,) for f in files], "file_path string", slices=n_part
    )
    return files_df.mapInPandas(layout_batches, LAYOUT_SCHEMA)


def rows_with_rg_provenance(
    spark: SparkSession, files: list[str], column: str, with_pos: bool = False
) -> DataFrame:
    """(file_path, row_group, <column>) — one output row per data row, read
    via pyarrow row-group reads inside mapInPandas.

    This is the build-side S1 analog: Spark's native reader only exposes
    per-FILE provenance (`_metadata.file_path`), so indexes built on it can
    prune at file granularity only. This reader tags every row with its row
    group, letting an index prune *within* large files — the Spark
    equivalent of the reference's page-uid granularity. One task per batch
    of row groups; Arrow-batched decode of exactly one column."""
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    import pyarrow as pa

    arrow_field = pq.ParquetFile(files[0]).schema_arrow.field(column)
    if pa.types.is_timestamp(arrow_field.type) and arrow_field.type.unit == "ns":
        arrow_field = arrow_field.with_type(
            pa.timestamp("us", tz=arrow_field.type.tz)
        )
    # read-schema pin (type-widened Delta tables): the probed file may
    # carry the NARROW pre-widen type while other files are wide — type
    # the output by the pinned schema and cast each row-group batch up
    from pyspark.sql.pandas.types import to_arrow_type

    from rottnest_spark.sources.reader import pinned_read_schema

    _pin = pinned_read_schema()
    target_arrow = None
    if _pin is not None and column in _pin.fieldNames():
        target_arrow = to_arrow_type(_pin[column].dataType)
        arrow_field = arrow_field.with_type(target_arrow)
    col_type = from_arrow_schema(pa.schema([arrow_field]))[0].dataType.simpleString()
    pos_part = "pos int, " if with_pos else ""
    schema = f"file_path string, row_group int, {pos_part}{column} {col_type}"
    add_pos = with_pos

    def read_units(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # executor-side
        import pyarrow as pa
        import pyarrow.parquet as pq

        def us_fields(schema):
            fs = []
            for f in schema:
                if pa.types.is_timestamp(f.type) and f.type.unit == "ns":
                    f = f.with_type(pa.timestamp("us", tz=f.type.tz))
                fs.append(f)
            return pa.schema(fs)

        for pdf in batches:
            for path, group in pdf.groupby("file_path"):
                pf = pq.ParquetFile(path)
                for rg in group["row_group"]:
                    tbl = pf.read_row_group(int(rg), columns=[column])
                    # ns->us truncation (safe=False): matches read_parquet
                    tbl = tbl.cast(us_fields(tbl.schema), safe=False)
                    if target_arrow is not None:
                        tbl = tbl.cast(
                            pa.schema(
                                [tbl.schema.field(0).with_type(target_arrow)]
                            )
                        )
                    out = tbl.to_pandas()
                    if add_pos:
                        out.insert(0, "pos", range(len(out)))
                    out.insert(0, "row_group", int(rg))
                    out.insert(0, "file_path", path)
                    yield out

    units = extract_layout(spark, files).select("file_path", "row_group")
    n_part = max(1, min(len(files) * 4, 64))
    return units.repartition(n_part).mapInPandas(read_units, schema)


def file_row_counts(spark: SparkSession, files: list[str]) -> dict[str, int]:
    """Driver-side {file_path: num_rows} for binpack planning (catalog-scale,
    not data-scale: one small row per file).

    Fast path: read each footer directly with pyarrow — a parquet footer is
    a few KB, so this is one metadata GET per file with no Spark job (the
    reference's layout scan is likewise driver-orchestrated metadata I/O,
    backends/utils.py:83-97). Falls back to the distributed layout scan for
    filesystems pyarrow can't open (e.g. exotic Hadoop-only schemes)."""
    try:
        import pyarrow.parquet as papq

        return {f: papq.ParquetFile(f).metadata.num_rows for f in files}
    except Exception:
        rows = (
            extract_layout(spark, files)
            .groupBy("file_path")
            .sum("num_rows")
            .collect()
        )
        return {r[0]: r[1] for r in rows}


def footer_zone_candidates(
    spark: SparkSession, files: list[str], column: str, lo, hi,
    prefix: bool = False,
) -> DataFrame:
    """VIRTUAL zone maps: candidate (file, row_group) units whose Parquet
    FOOTER min/max statistics for `column` intersect [lo, hi] — no index
    build, no data scan, just footers (the reference's virtual mode,
    backends/utils.py:110-126, done one better: it re-scans the key column
    to compute per-stride min/max; the footer already has them per row
    group).

    Soundness: a row group with missing/unusable statistics is ALWAYS a
    candidate; the caller's exact refine keeps results correct. The footer
    reads distribute over files (metadata-scale mapInPandas, same pattern
    as extract_layout).

    `prefix=True` treats `lo` as a string prefix (hi ignored): a unit
    survives iff max >= lo AND min truncated to len(lo) chars <= lo —
    the unbounded-above prefix range has no finite hi, so the range test
    would wrongly drop keys extending any chosen bound."""

    def zone_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as pd  # executor-side imports only
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for path in pdf["file_path"]:
                md = pq.ParquetFile(path).metadata
                try:
                    ci = [
                        md.schema.column(i).name
                        for i in range(md.num_columns)
                    ].index(column)
                except ValueError:
                    # column absent from this file: nothing to match
                    continue
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ci).statistics
                    keep = True
                    if st is not None and st.has_min_max:
                        try:
                            if prefix:
                                mn = st.min
                                keep = not (
                                    isinstance(mn, str)
                                    and (mn[: len(lo)] > lo or st.max < lo)
                                )
                            else:
                                keep = not (st.min > hi or st.max < lo)
                        except TypeError:
                            keep = True  # incomparable stats: sound default
                    if keep:
                        rows.append((path, rg))
            yield pd.DataFrame(rows, columns=["file_path", "row_group"])

    from rottnest_spark.core.smalldf import local_df

    n_part = max(1, min(len(files), 64))
    files_df = local_df(
        spark, [(f,) for f in files], "file_path string", slices=n_part
    )
    return files_df.mapInPandas(
        zone_batches, "file_path string, row_group int"
    )


def footer_key_ranges(
    spark: SparkSession, files: list[str], column: str
) -> dict[str, tuple]:
    """Driver-side {file_path: (min, max)} for `column` from Parquet FOOTER
    statistics (metadata-scale — one footer GET per file, same discipline
    as file_row_counts). A file with missing/unusable stats maps to
    (None, None), which callers must treat as "could contain anything"
    (sound default). Used by ParquetLake.merge_into to prune the
    copy-on-write rewrite to files whose key range can intersect the
    changeset."""
    import pyarrow.parquet as papq

    out: dict[str, tuple] = {}
    for f in files:
        md = papq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        try:
            ci = names.index(column)
        except ValueError:
            out[f] = (None, None)
            continue
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out[f] = (lo, hi)
    return out
