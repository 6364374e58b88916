"""Reproduce the r11 driver correctness gate: run the exact 50-query
sample in CORRECTNESS_r11.json order in ONE session at sf0.01 and
hash-compare each against its DuckDB oracle.

Usage: python tools/gate_order_repro.py [vanilla|graft] [sf_dir] [reps]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.check_correctness import TABLES, table_hash  # noqa: E402


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "vanilla"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    import duckdb

    import __spark_entry__ as entry_mod

    if mode == "graft":
        from rottnest_spark import get_spark

        spark = get_spark("gate-order-repro")
    else:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[32]")
            .appName("gate-order-repro")
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    order = list(
        json.load(open(os.path.join(REPO, "CORRECTNESS_r11.json")))
    )
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for rep in range(reps):
        for name in order:
            fn = qs[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
            t_spark = time.time() - t0
            cur = con.execute(oracles[name])
            duck_cols = [d[0] for d in cur.description]
            duck_rows = cur.fetchall()
            ok = (
                sorted(spark_cols) == sorted(duck_cols)
                and len(spark_rows) == len(duck_rows)
                and table_hash(spark_cols, spark_rows)
                == table_hash(duck_cols, duck_rows)
            )
            print(
                f"  rep{rep} {name:32s} {'OK ' if ok else 'FAIL'} "
                f"rows={len(spark_rows)}/{len(duck_rows)} {t_spark:.1f}s",
                flush=True,
            )
            if not ok:
                failures.append((rep, name))
                order_ix = sorted(
                    range(len(spark_cols)), key=lambda i: spark_cols[i]
                )
                from tools.check_correctness import norm_cell

                s_lines = sorted(
                    "|".join(norm_cell(r[i]) for i in order_ix)
                    for r in spark_rows
                )
                d_ix = sorted(
                    range(len(duck_cols)), key=lambda i: duck_cols[i]
                )
                d_lines = sorted(
                    "|".join(norm_cell(r[i]) for i in d_ix)
                    for r in duck_rows
                )
                for a, b in zip(s_lines, d_lines):
                    if a != b:
                        print(f"      spark: {a}\n      duck : {b}")
    print("FAILURES:", failures)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
