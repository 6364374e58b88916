"""X9 line-prefix timestamp parse + backfill semantics
(reference src/lava/logcloud/logcloud_rex.rs:303-341)."""

import datetime

from rottnest_spark.ops.logparse import parse_line_timestamps


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_parse_backfill_and_validity_window(spark):
    rows = [
        (0, "A", "2024-01-01 10:00:00 ok line"),
        (1, "A", "garbage no timestamp here"),       # backfilled from 0
        (2, "A", "1999-12-31 23:59:59 pre-window"),  # invalid year → backfill
        (3, "A", "2024-01-01 11:00:00 ok again"),
        (4, "A", "2051-06-01 00:00:00 post-window"), # invalid year → backfill
        (5, "B", "no valid line before me"),         # other partition → NULL
        (6, "B", "2024-02-02 09:00:00 first valid"),
    ]
    df = spark.createDataFrame(rows, "id long, src string, line string")
    out = parse_line_timestamps(
        df, "line", order_col="id", partition_cols=["src"]
    )
    got = {r["id"]: r["line_ts"] for r in out.collect()}
    assert got[0] == _ts("2024-01-01 10:00:00")
    assert got[1] == _ts("2024-01-01 10:00:00")
    assert got[2] == _ts("2024-01-01 10:00:00")
    assert got[3] == _ts("2024-01-01 11:00:00")
    assert got[4] == _ts("2024-01-01 11:00:00")
    assert got[5] is None  # nothing valid earlier in its partition
    assert got[6] == _ts("2024-02-02 09:00:00")


def test_global_window_when_unpartitioned(spark):
    rows = [(0, "2024-03-03 03:00:00 x"), (1, "corrupt")]
    df = spark.createDataFrame(rows, "id long, line string")
    out = parse_line_timestamps(df, "line", order_col="id")
    got = {r["id"]: r["line_ts"] for r in out.collect()}
    assert got[1] == _ts("2024-03-03 03:00:00")
