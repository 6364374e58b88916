"""Hybrid retrieval — reciprocal-rank fusion (RRF) of heterogeneous
rankers (BM25 lexical + vector KNN being the canonical pair).

RRF (Cormack et al.): fused(d) = Σ_r 1/(k0 + rank_r(d)). Rank-based
fusion needs no score calibration between rankers, which is why it's the
default hybrid mode in production search engines.

Scale shape: each ranker's output is already a top-N list (N ~ 10²), so
fusion is driver-free DataFrame algebra over tiny inputs — the heavy
lifting stays in the rankers, which are index-accelerated. Determinism:
ranks come from row_number over (score, id), and each doc contributes at
most one term per ranker, so the fused double is order-independent
(IEEE addition is commutative; only associativity isn't — ≤2 terms here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked(df: DataFrame, id_col: str, order_cols: list) -> DataFrame:
    """(id, rnk): 1-based dense ranking by the given order (ties must be
    broken by id in order_cols for cross-engine determinism)."""
    w = Window.orderBy(*order_cols)
    return df.select(
        F.col(id_col).alias("id"), F.row_number().over(w).alias("rnk")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int,
    k0: int = 60,
    round_to: int = 6,
) -> DataFrame:
    """Fuse (id, rnk) DataFrames into the top-k (id, rrf) list."""
    u = rankings[0]
    for r in rankings[1:]:
        u = u.unionByName(r)
    return (
        u.groupBy("id")
        .agg(
            F.round(
                F.sum(F.lit(1.0) / (F.lit(float(k0)) + F.col("rnk"))), round_to
            ).alias("rrf")
        )
        .orderBy(F.desc("rrf"), F.asc("id"))
        .limit(k)
    )
