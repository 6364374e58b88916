"""Relational operators Spark's DataFrame API lacks as primitives.

asof_join — the classic time-series "latest right row at or before each
left row" join, expressed as a composition of built-in operators (union +
window), not a UDF:

    sort key = (ts, side, tiebreak) within each join key;
    right rows sort BEFORE left rows at equal ts (>= semantics);
    last(right_payload, ignorenulls) over an unbounded-preceding window
    gives every left row its most recent right match;
    one shuffle (the window partitionBy), no range explosion.

This is the standard scale-out formulation: a naive non-equi join
(l.key = r.key AND l.ts >= r.ts) explodes to O(|L|x|R| per key) before
aggregation, while the union+window form is O(|L|+|R|) rows through one
exchange, and skewed keys are handled by AQE like any other window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tiebreak: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach `payload` columns of the right row with the
    greatest right_ts <= left_ts within the same key (backward as-of).

    Ties on right_ts are resolved deterministically: the row with the
    greatest `tiebreak` wins (required when right_ts is not unique per key
    — nondeterministic match payloads would break reproducibility).
    how='inner' drops unmatched left rows; 'left' keeps them with nulls.
    """
    assert how in ("inner", "left")
    r = right
    if tiebreak is not None:
        rn = Window.partitionBy(right_on, right_ts).orderBy(F.desc(tiebreak))
        r = (
            r.withColumn("__rn__", F.row_number().over(rn))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )
    r_side = r.select(
        F.col(right_on).alias("__key__"),
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__side__"),
        F.struct(*[F.col(c) for c in payload]).alias("__payload__"),
        *[F.lit(None).alias(f"__l_{c}__") for c in left.columns],
    )
    l_side = left.select(
        F.col(left_on).alias("__key__"),
        F.col(left_ts).alias("__ts__"),
        F.lit(1).alias("__side__"),
        F.lit(None)
        .cast(r_side.schema["__payload__"].dataType)
        .alias("__payload__"),
        *[F.col(c).alias(f"__l_{c}__") for c in left.columns],
    )
    w = (
        Window.partitionBy("__key__")
        .orderBy("__ts__", "__side__")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = r_side.unionByName(l_side).withColumn(
        "__match__", F.last("__payload__", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side__") == 1).select(
        *[F.col(f"__l_{c}__").alias(c) for c in left.columns],
        *[F.col("__match__").getField(c).alias(c) for c in payload],
    )
    if how == "inner":
        out = out.filter(F.col(payload[0]).isNotNull())
    return out
