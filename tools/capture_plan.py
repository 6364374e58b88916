"""Capture .explain("formatted") for declared queries into plans/<tag>/.

Usage: python tools/capture_plan.py <tag> <suffix> [sf_dir] <query> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query. For lifecycle
queries that return a collected LocalTableScan the plan shows only the
materialized result; the interesting internal plans for those are captured
by the entrypoints' own plan hooks (docs/PLANS.md) — this tool is for the
live-DataFrame queries.
"""

from __future__ import annotations

import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir, rest = rest[0], rest[1:]

    from contextlib import redirect_stdout

    import __spark_entry__ as entry_mod
    from rottnest_spark import get_spark

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    for name in rest:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
