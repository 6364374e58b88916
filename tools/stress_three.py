"""Stress the three r11 hash-mismatch gate queries: N reps in one
session, diffing every cell against the DuckDB oracle.

Usage: python tools/stress_three.py [reps] [sf_dir] [cpus]
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.check_correctness import TABLES, norm_cell, table_hash  # noqa: E402

NAMES = [
    "iceberg_v3_defaults_read",
    "iceberg_schema_evolution",
    "delta_schema_evolution",
]


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    cpus = sys.argv[3] if len(sys.argv) > 3 else "32"

    import duckdb

    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stress-three")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    expect = {}
    for name in NAMES:
        cur = con.execute(oracles[name])
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        expect[name] = (cols, rows, table_hash(cols, rows))

    bad = 0
    for rep in range(reps):
        for name in NAMES:
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
            d_cols, d_rows, d_hash = expect[name]
            ok = table_hash(s_cols, s_rows) == d_hash
            print(
                f"rep{rep:02d} {name:28s} {'OK' if ok else 'FAIL'}"
                f" {time.time()-t0:.1f}s",
                flush=True,
            )
            if not ok:
                bad += 1
                ix = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                s_lines = sorted(
                    "|".join(norm_cell(r[i]) for i in ix) for r in s_rows
                )
                dix = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                d_lines = sorted(
                    "|".join(norm_cell(r[i]) for i in dix) for r in d_rows
                )
                for a, b in zip(s_lines, d_lines):
                    if a != b:
                        print(f"    spark: {a}\n    duck : {b}", flush=True)
    print("TOTAL FAILURES:", bad)
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
