"""Deterministic sampling, splitting, and batch-packing for training data.

Every operator here is reproducible BY CONSTRUCTION (hash arithmetic on
stable ids, never RNG state), so reruns, retries, and other engines produce
identical row sets — the property training pipelines actually need from
"random" sampling. Hashes derive from md5 (cross-engine parity with the
DuckDB oracles, same discipline as ops/dedup.py).

- hash_sample          keep a deterministic ~fraction of rows per seed
- split_column         train/val/test assignment by weighted hash buckets
- stratified_sample    per-stratum fractions (e.g. downsample by language)
- pack_sequences       greedy-by-order token-budget batching via a window
                       cumsum; partition_col bounds the window state so
                       packing parallelizes (one packer per partition value)

Scale notes: the first three are narrow per-row projections/filters — they
compose with any scan for free. pack_sequences is a window over
(partition_col, order): with a real partition column (source, shard, date)
state is per-group and distributes; without one it degrades to a single
ordered reducer — callers at scale must pass partition_col (documented).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

BUCKETS = 1_000_000  # hash-bucket resolution: fraction granularity 1e-6


def _bucket(id_col: str, seed: str) -> Column:
    """Uniform deterministic bucket in [0, BUCKETS) from md5(seed:id)."""
    return (
        F.expr(
            f"cast(conv(substr(md5(concat('{seed}', ':', cast({id_col} AS string))), "
            f"1, 12), 16, 10) AS bigint)"
        )
        % BUCKETS
    )


def hash_sample(
    df: DataFrame, id_col: str, fraction: float, seed: str = "sample"
) -> DataFrame:
    """Deterministic ~fraction subset: row kept iff its hash bucket falls
    below fraction. Stable across runs/engines; disjoint seeds give
    independent samples."""
    return df.filter(_bucket(id_col, seed) < int(fraction * BUCKETS))


def hash_sample_n(
    df: DataFrame, id_col: str, n: int, seed: str = "sample"
) -> DataFrame:
    """Deterministic EXACT-size uniform sample without replacement: the n
    smallest hash buckets (ties broken by id). Compiles to
    TakeOrderedAndProject — no global sort; same reproducibility contract
    as hash_sample, with an exact count instead of an expected fraction."""
    return (
        df.withColumn("__b__", _bucket(id_col, seed))
        .orderBy("__b__", id_col)
        .limit(n)
        .drop("__b__")
    )


def split_column(
    df: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: str = "split",
) -> DataFrame:
    """Adds `split`: weighted assignment (e.g. {'train': .9, 'val': .05,
    'test': .05}) by hash bucket — every row lands in exactly one split,
    membership independent of row order and partitioning."""
    total = sum(weights.values())
    expr = None
    acc = 0.0
    b = _bucket(id_col, seed)
    items = sorted(weights.items())  # deterministic boundary order
    for name, w in items[:-1]:
        acc += w / total
        cond = b < int(acc * BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling (the 'rebalance languages /
    sources' op). Strata missing from `fractions` keep default_fraction."""
    b = _bucket(id_col, seed)
    thr = None
    for k, frac in sorted(fractions.items()):
        cond = F.col(strata_col) == k
        lim = F.lit(int(frac * BUCKETS))
        thr = F.when(cond, lim) if thr is None else thr.when(cond, lim)
    thr = (
        F.lit(int(default_fraction * BUCKETS))
        if thr is None
        else thr.otherwise(F.lit(int(default_fraction * BUCKETS)))
    )
    return df.filter(b < thr)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    partition_col: str | None = None,
) -> DataFrame:
    """Assign rows (ordered by id within each partition) to consecutive
    batches by chunking the cumulative token stream into budget-sized
    ranges: batch_id = floor((cumsum - n_tokens) / budget).

    This is the window-expressible (hence distributed) packing: a batch's
    total is <= budget + (its first row's tokens - 1), i.e. only the
    boundary-straddling row can overshoot. True greedy-reset packing needs
    sequential state per partition and cannot be a window — when the hard
    cap matters more than parallelism, run this per partition_col and
    post-split oversized batches.

    Returns df + `batch_id` (per partition_col value when given). At scale
    ALWAYS pass partition_col: without it the window is one global ordered
    reducer."""
    part = [partition_col] if partition_col else []
    w = (
        Window.partitionBy(*part)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(n_tokens_col).over(w)
    return df.withColumn(
        "batch_id",
        F.floor((cum - F.col(n_tokens_col)) / F.lit(budget)).cast("long"),
    )


def cluster_balanced_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    rows_per_centroid: int = 256,
    cap_per_cluster: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """Diversity (cluster-balanced) sampling over an embedding column: train
    k-means centroids on a bounded sample, assign every row to its nearest
    centroid, then keep at most `cap_per_cluster` rows per cluster — chosen
    by deterministic hash order, so reruns keep the SAME rows.

    This flattens the cluster-size distribution: over-represented regions of
    embedding space (boilerplate, templates, near-duplicates that survived
    dedup) are downsampled while the long tail is kept whole — the standard
    diversity pass of a training-data pipeline after dedup.

    cap_per_cluster=None returns every row with its `cluster_id` (pure
    clustering). Default cap = the mean cluster size (n/k), i.e. "no cluster
    may exceed its fair share".

    Scale: training reads a bounded driver sample (k·40 rows max, k ≤ 4096);
    assignment is one GEMM pass over Arrow batches; the cap is one window
    rank per cluster — a single shuffle on cluster_id. Deterministic given
    `seed` (hash order, not RNG)."""
    import numpy as np

    from rottnest_spark.indices.vector import _lloyd_gemm

    feat = df.persist()
    n = feat.count()
    k = max(1, min(n // rows_per_centroid, 4096, n))
    target = k * 40
    frac = min(1.0, (target * 1.2) / max(n, 1))
    # hash-selected, id-ordered training sample (not df.sample +
    # partition-order collect): the clustering — hence which rows the cap
    # keeps — is a function of the data alone, reproducible across
    # partitionings/engines and recomputable by an external oracle
    base = feat.select(F.col(id_col).alias("__sid__"), F.col(vec_col).alias("v"))
    sample_df = (
        hash_sample(base, "__sid__", frac, seed=f"diversity:{seed}")
        if frac < 1.0
        else base
    )
    x = np.array(
        [r["v"] for r in sample_df.orderBy("__sid__").collect()],
        dtype=np.float64,
    )
    if len(x) < k:
        x = np.array(
            [r["v"] for r in base.orderBy("__sid__").limit(k).collect()],
            dtype=np.float64,
        )
    cents = _lloyd_gemm(x, k, iters=10, seed=seed)
    bc = df.sparkSession.sparkContext.broadcast(cents)
    cols = df.columns

    # self-contained closure (executors may not import the package)
    def assign(batches):
        import numpy as np
        import pandas as pd

        cc = bc.value
        cn = (cc * cc).sum(axis=1)
        for pdf in batches:
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            out = pdf[cols].copy()
            out["cluster_id"] = (
                (cn[None, :] - 2.0 * (v @ cc.T)).argmin(axis=1).astype("int32")
            )
            yield out

    from pyspark.sql.types import IntegerType

    schema = feat.select(*cols).schema.add("cluster_id", IntegerType())
    clustered = feat.mapInPandas(assign, schema)
    if cap_per_cluster is None:
        cap_per_cluster = max(1, n // len(cents))
    w = Window.partitionBy("cluster_id").orderBy(
        _bucket(id_col, f"cluster:{seed}"), F.col(id_col)
    )
    return (
        clustered.withColumn("__rk__", F.row_number().over(w))
        .filter(F.col("__rk__") <= cap_per_cluster)
        .drop("__rk__")
    )


def pack_sequences_greedy(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    partition_col: str,
) -> DataFrame:
    """HARD-CAP greedy packing: walk each partition's rows in id order,
    start a new batch whenever adding the row would exceed `budget`. Unlike
    `pack_sequences` (window cumsum chunking, batches may overshoot by one
    straddling row), no batch exceeds the budget unless a single row alone
    does (that row gets its own batch).

    Greedy reset is inherently sequential, so it runs as one
    `applyInPandas` per `partition_col` group — state never crosses groups,
    which is what makes it distribute. The partition column is REQUIRED:
    packing 100 TB in one sequential stream is a design error, shard first
    (source, date, shard id).

    Returns df + `batch_id` (dense per partition value, starting at 0).
    Deterministic: same input → same batches."""
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [f for f in df.schema.fields] + [StructField("batch_id", LongType())]
    )
    b = int(budget)
    order_col, tok_col = id_col, n_tokens_col

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        batch_ids = []
        cur, used = 0, 0
        for t in pdf[tok_col]:
            t = int(t)
            if used and used + t > b:
                cur += 1
                used = 0
            batch_ids.append(cur)
            used += t
        pdf["batch_id"] = pd.Series(batch_ids, dtype="int64")
        return pdf

    return df.groupBy(partition_col).applyInPandas(pack, out_schema)


def mixture_by_tokens(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    n_tokens_col: str,
    budgets: dict[str, int],
    seed: str = "mix",
) -> DataFrame:
    """Token-budget dataset mixing: per stratum (source, language, domain),
    keep documents in deterministic hash order until the stratum's TOKEN
    budget is reached — the mixing knob training recipes actually specify
    ("20B tokens of code, 5B of forums"), as opposed to per-document
    fractions.

    A document is kept iff its stratum has a budget and the cumulative
    token count of all hash-earlier documents in the stratum is still under
    that budget — so the budget overshoots by at most one boundary
    document, and membership is reproducible and engine-independent (pure
    hash + window arithmetic, no RNG).

    Scale: one shuffle (window partitioned by stratum, ordered by hash
    bucket); strata are independent so skewed strata parallelize across
    their partitions' tasks no worse than the underlying window."""
    b = _bucket(id_col, seed)
    w = (
        Window.partitionBy(strata_col)
        .orderBy(b.asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prior = F.coalesce(F.sum(n_tokens_col).over(w), F.lit(0))
    budget = None
    for k, v in sorted(budgets.items()):
        cond = F.col(strata_col) == k
        budget = (
            F.when(cond, F.lit(int(v)))
            if budget is None
            else budget.when(cond, F.lit(int(v)))
        )
    budget = F.lit(0) if budget is None else budget.otherwise(F.lit(0))
    return (
        df.withColumn("__prior__", prior)
        .filter(F.col("__prior__") < budget)
        .drop("__prior__")
    )


def quality_weighted_sample(
    df: DataFrame, id_col: str, weight_col: str, seed: str = "qsample"
) -> DataFrame:
    """Deterministic quality-weighted downsampling: row kept with
    probability min(weight, 1) — the curation move of keeping high-quality
    documents with certainty and tail-quality ones proportionally, without
    a random number generator (hash bucket < weight·BUCKETS, reproducible
    across runs/engines/partitionings, same contract as hash_sample).

    Weights are per-row columns, so any quality signal composes: model
    scores, unigram_logprob percentile, length priors. One codegen filter,
    no shuffle."""
    accept = F.least(F.col(weight_col).cast("double"), F.lit(1.0))
    return df.filter(
        _bucket(id_col, seed) < F.floor(accept * F.lit(BUCKETS))
    )
