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


def mmr_rerank(
    candidates: DataFrame,
    id_col: str,
    score_col: str,
    vec_col: str,
    k: int,
    lam: float = 0.7,
) -> list[tuple]:
    """Maximal-Marginal-Relevance rerank of a top-N candidate set: greedily
    pick k items maximizing lam·relevance − (1−lam)·max-cosine-to-selected,
    trading a little relevance for diversity (the standard fix for
    near-duplicate-saturated retrieval results).

    MMR is inherently sequential over k picks, so it runs driver-side on
    the COLLECTED top-N (N is retrieval-scale, ≤ a few hundred — the same
    altitude as the reference's global top-K stage). Scores are min-max
    normalized first so `lam` means the same thing across score families
    (BM25, RRF, −distance). Deterministic: ties break on id.

    Returns [(id, mmr_score), ...] in pick order."""
    import numpy as np

    rows = candidates.select(id_col, score_col, vec_col).collect()
    if not rows:
        return []
    ids = [r[id_col] for r in rows]
    rel = np.array([float(r[score_col]) for r in rows])
    v = np.array([r[vec_col] for r in rows], dtype=np.float64)
    v = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
    lo, hi = rel.min(), rel.max()
    rel = (rel - lo) / (hi - lo) if hi > lo else np.ones_like(rel)
    sim = v @ v.T
    picked: list[int] = []
    out: list[tuple] = []
    remaining = set(range(len(ids)))
    for _ in range(min(k, len(ids))):
        best, best_score = None, None
        for i in sorted(remaining, key=lambda i: (ids[i],)):
            penalty = max((sim[i][j] for j in picked), default=0.0)
            s = lam * rel[i] - (1.0 - lam) * penalty
            if best_score is None or s > best_score + 1e-12:
                best, best_score = i, s
        picked.append(best)
        remaining.discard(best)
        out.append((ids[best], round(float(best_score), 6)))
    return out
