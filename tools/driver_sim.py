"""Driver-environment simulation: run every contract query on a VANILLA
SparkSession (no PYTHONPATH insurance for workers) from any cwd.

Catches the closure-pickling bug class: executor code that references
module-level functions pickles them by reference and fails with
ModuleNotFoundError on workers that cannot import this package — exactly
the sessions the driver contract uses. Run from a non-repo cwd:

    cd /tmp && python /root/repo/tools/driver_sim.py
"""

import sys, traceback; sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]").appName("driver-sim-all")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
fails = []
for name, fn in e.queries().items():
    try:
        n = fn(spark, "/root/testdata/sf0.001").count()
        print(f"  {name}: {n}")
    except Exception as ex:
        fails.append(name)
        print(f"  {name}: FAIL {str(ex)[:120]}")
print("FAILURES:" if fails else "ALL-OK", fails)
