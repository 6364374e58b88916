"""Generate a synthetic scaled dataset: 10x a source dir via union-multiply
with key-shifted replicas (join keys shifted consistently across fact/dim
pairs so TPC-H joins keep their selectivity). One physical Parquet file
per table (the lake fixtures are single files; per-file footer ops need
real files, not directories).

Decades chain: each run multiplies its source by 10, with key strides
scaled by the source's own decade so replica key ranges never collide.

Usage:
    python tools/make_sf1.py [out_dir]                      # sf0.1 -> sf1
    python tools/make_sf1.py /tmp/testdata_sf10 \
        --src /tmp/testdata_sf1 --stride-scale 10           # sf1 -> sf10
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 10

# per-table key columns shifted by replica * offset; base offsets chosen far
# above the sf0.1 key ranges so replicas never collide. The SAME logical key
# domain (orderkey in orders+lineitem, partkey in part+lineitem, ...) uses
# the SAME stride, so shifted replicas keep their join partners.
SHIFTS: dict[str, dict[str, int]] = {
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "customer": {"c_custkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "events": {"event_id": 100_000_000, "user_id": 10_000_000},
    "documents": {"doc_id": 10_000_000},
    "embeddings": {"vec_id": 10_000_000},
}
# dims stay single-copy (region/nation are enums, replicating them would
# break the join semantics)
SINGLE = {"region", "nation"}


def shifted(tbl: pa.Table, shifts: dict[str, int], i: int) -> pa.Table:
    if i == 0 or not shifts:
        return tbl
    for col, off in shifts.items():
        idx = tbl.schema.get_field_index(col)
        arr = pc.add(tbl.column(idx), pa.scalar(off * i, pa.int64()))
        arr = pc.cast(arr, tbl.schema.field(idx).type)
        tbl = tbl.set_column(idx, tbl.schema.field(idx), arr)
    return tbl


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="/tmp/testdata_sf1")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--stride-scale",
        type=int,
        default=1,
        help="multiply key strides by this (10 when the source is itself a "
        "10x product of sf0.1, so replicas of the wider key range still "
        "never collide)",
    )
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    tables = [
        os.path.splitext(f)[0]
        for f in sorted(os.listdir(args.src))
        if f.endswith(".parquet")
    ]
    for t in tables:
        src = pq.read_table(os.path.join(args.src, f"{t}.parquet"))
        dst = os.path.join(args.out_dir, f"{t}.parquet")
        n = 1 if t in SINGLE else COPIES
        shifts = {
            c: off * args.stride_scale
            for c, off in SHIFTS.get(t, {}).items()
        }
        writer = pq.ParquetWriter(dst, src.schema)
        for i in range(n):
            writer.write_table(
                shifted(src, shifts, i), row_group_size=1 << 20
            )
        writer.close()
        print(f"{t}: {src.num_rows} x {n} -> {pq.ParquetFile(dst).metadata.num_rows}")


if __name__ == "__main__":
    main()
