"""Log-line timestamp extraction — X9, the analog of the reference's
chrono-based prefix parse + invalid backfill
(src/lava/logcloud/logcloud_rex.rs:303-341).

Real log lakes often carry the event time only inside the line text
("2024-01-05 12:33:01 ERROR ..."). The reference parses a fixed-width
prefix per line, treats timestamps outside a validity window (2000–2050)
as garbage, and backfills each invalid/corrupt line with the most recent
valid timestamp above it. This module is the Spark-native equivalent:

- the parse is `try_to_timestamp(substring(line, 1, n), fmt)` — pure
  codegen expressions, no Python in the hot path; malformed prefixes
  yield NULL instead of failing the job (ANSI-safe);
- the backfill is `last(ts, ignorenulls=True)` over a window ordered by
  the caller's line order. Scale note: pass `partition_cols` (e.g. the
  provenance file column) so the window is per-file — log order is only
  meaningful within a file, and an unpartitioned window funnels all rows
  through one task. Without partition_cols the window is global (small
  tables / single files only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: reference validity window (logcloud_rex.rs:326-331): years outside
#: [2000, 2050) are treated as parse garbage and backfilled
VALID_LO = "2000-01-01 00:00:00"
VALID_HI = "2050-01-01 00:00:00"


def parse_line_timestamps(
    df: DataFrame,
    line_col: str,
    order_col: str,
    partition_cols: list[str] | None = None,
    prefix_len: int = 19,
    fmt: str = "yyyy-MM-dd HH:mm:ss",
    out_col: str = "line_ts",
) -> DataFrame:
    """Add `out_col`: the timestamp parsed from the first `prefix_len`
    chars of `line_col`, with invalid/out-of-window values backfilled
    from the previous valid line (by `order_col`, within
    `partition_cols` when given).

    Lines before the first valid timestamp keep NULL — the reference has
    no earlier value to copy either; downstream range filters drop them.
    """
    parsed = F.try_to_timestamp(
        F.substring(F.col(line_col), 1, prefix_len), F.lit(fmt)
    )
    valid = F.when(
        (parsed >= F.lit(VALID_LO).cast("timestamp"))
        & (parsed < F.lit(VALID_HI).cast("timestamp")),
        parsed,
    )
    w = (
        Window.partitionBy(*partition_cols)
        if partition_cols
        else Window.partitionBy()
    )
    w = w.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(
        out_col, F.last(valid, ignorenulls=True).over(w)
    )
