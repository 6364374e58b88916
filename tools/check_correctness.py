"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at a given sf dir; compare row count,
column names, and an order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    import datetime
    import math

    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    """Order-insensitive: sort columns by name, then sort stringified rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    import hashlib

    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry_mod
    from rottnest_spark import get_spark

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    spark = get_spark("correctness-check")
    spark.sparkContext.setLogLevel("ERROR")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        spark_cols = df.columns
        spark_rows = [tuple(r) for r in df.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows={len(spark_rows):6d}  (rows-only, no oracle)  {t_spark:.1f}s")
            continue
        t0 = time.time()
        cur = con.execute(oracles[name])
        duck_cols = [d[0] for d in cur.description]
        duck_rows = cur.fetchall()
        t_duck = time.time() - t0
        ok_cols = sorted(spark_cols) == sorted(duck_cols)
        ok_rows = len(spark_rows) == len(duck_rows)
        ok_hash = table_hash(spark_cols, spark_rows) == table_hash(duck_cols, duck_rows)
        status = "OK " if (ok_cols and ok_rows and ok_hash) else "FAIL"
        print(
            f"  {name:28s} {status} rows={len(spark_rows)}/{len(duck_rows)} "
            f"cols={'=' if ok_cols else spark_cols + duck_cols} hash={'=' if ok_hash else '!'} "
            f"spark={t_spark:.1f}s duck={t_duck:.2f}s"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_cols and ok_rows:
                order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
                s_lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in spark_rows)
                d_order = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
                d_lines = sorted("|".join(norm_cell(r[i]) for i in d_order) for r in duck_rows)
                diffs = [(a, b) for a, b in zip(s_lines, d_lines) if a != b][:3]
                for a, b in diffs:
                    print(f"      spark: {a}\n      duck : {b}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
