"""Z-order (Morton-curve) data layout rewrite: cluster a table on N columns
at once so per-file zone maps (min/max) prune multi-column predicates.

A sort on (a, b) gives perfect pruning on `a` and none on `b`; interleaving
the bits of both ranks gives every file a tight min/max box on BOTH columns
— the standard multi-dimensional clustering trick (Delta OPTIMIZE ZORDER BY,
Iceberg sort orders). The reference's zone-map aggregation (A2,
`indices/uuid_index.py` min/max per page) is the probe side; this op is the
write side that makes those zone maps selective.

Scale notes (100 TB):
- the z-value is a pure codegen expression (shift/mask/or — no UDF), so the
  rewrite is scan + RangePartitioner sample + shuffle + per-partition sort:
  exactly one wide stage regardless of column count;
- `repartitionByRange` on the z-value gives each output file a contiguous
  z-range, which is what turns footer min/max into a bounding box;
- normalization is uniform min/max binning: heavy skew degrades toward a
  single-column sort on the skewed column — rank-normalize upstream (e.g.
  percent_rank) if a column is pathologically skewed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    cols_with_bounds: list[tuple[str, float, float]], bits: int = 12
) -> Column:
    """Morton code over uniformly-binned columns: `bits` bits per column,
    bit b of column i lands at position b*ncols + i. Pure codegen
    (cast/arith/shift/or), no Python on the hot path."""
    n = len(cols_with_bounds)
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits overflows a signed long")
    top = (1 << bits) - 1
    quantized: list[Column] = []
    for name, lo, hi in cols_with_bounds:
        if hi > lo:
            scaled = (F.col(name).cast("double") - F.lit(float(lo))) * F.lit(
                top / (hi - lo)
            )
        else:  # constant column: contributes zero bits
            scaled = F.lit(0.0)
        quantized.append(
            F.least(
                F.lit(top).cast("long"),
                F.greatest(F.lit(0).cast("long"), scaled.cast("long")),
            )
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(quantized):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return z


def zorder_write(
    df: DataFrame,
    cols: list[str],
    out_dir: str,
    n_files: int,
    bits: int = 12,
) -> list[tuple[str, float, float]]:
    """Rewrite `df` into `n_files` parquet files clustered on the Morton
    curve over `cols`. Returns the (col, min, max) bounds used (persist them
    if later increments must share the same binning).

    Two jobs: a driver-scalar bounds aggregate, then the single wide
    rewrite (sample → range-shuffle on z → sort-within-partition → write).
    """
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    bounds = [(c, row[f"lo_{i}"], row[f"hi_{i}"]) for i, c in enumerate(cols)]
    z = zorder_key(bounds, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.parquet(out_dir)
    )
    return bounds


#: past this many files the zone-map footer walk distributes executor-side
#: (with a session) — a driver loop is O(files) GET round-trips serialized
#: on one node at object-storage latency
_ZONES_DRIVER_MAX = 64


def _stat_enc(v):
    """JSON-safe encoding of a parquet footer statistic. int/float/str/
    bool/None pass through; date/timestamp/decimal/binary get a type
    tag so the distributed footer walk round-trips the SAME native
    values the driver walk returns (behavior must not flip at the
    _ZONES_DRIVER_MAX knee)."""
    import datetime as _dt
    from decimal import Decimal as _Dec

    if isinstance(v, bytes):
        return {"$t": "bytes", "v": v.hex()}
    if isinstance(v, _dt.datetime):  # before date: datetime IS a date
        return {"$t": "ts", "v": v.isoformat()}
    if isinstance(v, _dt.date):
        return {"$t": "date", "v": v.isoformat()}
    if isinstance(v, _Dec):
        return {"$t": "dec", "v": str(v)}
    return v


def _stat_dec(v):
    import datetime as _dt
    from decimal import Decimal as _Dec

    if isinstance(v, dict) and "$t" in v:
        t, raw = v["$t"], v["v"]
        if t == "bytes":
            return bytes.fromhex(raw)
        if t == "ts":
            return _dt.datetime.fromisoformat(raw)
        if t == "date":
            return _dt.date.fromisoformat(raw)
        if t == "dec":
            return _Dec(raw)
    return v


def _zone_of_footer(f: str, cols: list[str]) -> dict:
    import pyarrow.parquet as pq

    md = pq.ParquetFile(f).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    zones: dict[str, tuple] = {}
    for c in cols:
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[c]).statistics
            if st is None or not st.has_min_max:
                continue  # empty row group / stats-less writer
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        zones[c] = (lo, hi)  # (None, None) = unknown, never prunable
    return {"file": f, **{c: zones[c] for c in cols}}


def file_zone_maps(
    files: list[str], cols: list[str], spark=None
) -> list[dict]:
    """Per-file min/max for `cols` from parquet footers — the zone maps
    a scan planner prunes with. Small lists walk footers on the driver
    (metadata-scale); past _ZONES_DRIVER_MAX files with a `spark`
    session the walk distributes (mapInPandas over the path list, one
    short JSON row per file collected back — the
    _missing_defaults_by_file pattern)."""
    if spark is None or len(files) <= _ZONES_DRIVER_MAX:
        return [_zone_of_footer(f, cols) for f in files]
    cols = list(cols)

    def probe(batches):
        import json as _json

        import pandas as _pd

        for pdf in batches:
            out = []
            for p in pdf["p"]:
                z = _zone_of_footer(p, cols)
                out.append(
                    _json.dumps(
                        {
                            k: (
                                [_stat_enc(v[0]), _stat_enc(v[1])]
                                if isinstance(v, tuple)
                                else v
                            )
                            for k, v in z.items()
                        }
                    )
                )
            yield _pd.DataFrame({"z": out})

    import json as _json

    from rottnest_spark.core.smalldf import local_df

    paths = local_df(
        spark, [(f,) for f in sorted(files)], "p string",
        slices=min(len(files), 64),
    )
    rows = (
        paths.mapInPandas(probe, "z string")
        .collect()  # one short row per file — descriptor-scale
    )
    by_file = {}
    for r in rows:
        z = _json.loads(r.z)
        by_file[z["file"]] = {
            k: (
                (_stat_dec(v[0]), _stat_dec(v[1]))
                if isinstance(v, list)
                else v
            )
            for k, v in z.items()
        }
    return [by_file[f] for f in files]


def prunable_files(
    files: list[str],
    predicates: dict[str, tuple[float, float]],
    spark=None,
) -> tuple[list[str], list[str]]:
    """Split files into (candidates, pruned) for a conjunctive box predicate
    {col: (lo, hi)} using footer zone maps — the planner-side measure of how
    much a layout rewrite bought. Pass `spark` to distribute the footer
    walk past _ZONES_DRIVER_MAX files."""
    zones = file_zone_maps(files, list(predicates), spark=spark)
    cand, pruned = [], []
    for zinfo in zones:
        ok = all(
            zinfo[c][0] is None  # unknown zone: must stay a candidate
            or not (zinfo[c][1] < lo or zinfo[c][0] > hi)
            for c, (lo, hi) in predicates.items()
        )
        (cand if ok else pruned).append(zinfo["file"])
    return cand, pruned
