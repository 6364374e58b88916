"""Deduplication operators for training-data pipelines.

Five dedup families over a document DataFrame, all pure Catalyst
expressions (whole-stage codegen, zero Python UDFs) so the hot path stays
JVM-side and every per-row computation is narrow (no shuffle until the
candidate join):

- exact_dup_groups        hash-groupBy exact duplicates
- minhash_lsh_pairs       MinHash signatures + banded LSH candidate join,
                          exact-Jaccard verify
- simhash_pairs           SimHash + pigeonhole chunk blocking; EXACT for a
                          hamming threshold (chunk count = max_hamming+1
                          guarantees recall 1.0)
- ngram_jaccard_pairs     exact shingle-Jaccard similarity join with prefix
                          filtering (PPJoin-style candidate reduction)
- embedding_cosine_pairs  exact all-pairs cosine >= tau (the brute-force
                          baseline; at scale, block through the IVF index —
                          see indices/vector.py — and verify exactly)

Determinism & cross-engine parity: every hash is derived from md5(), which
Spark and DuckDB compute identically, so the DuckDB oracles in
entrypoints.py reproduce these results bit-for-bit (including LSH banding).

Scale notes (100 TB):
- Signature computation is per-row `transform`/`aggregate` over arrays —
  embarrassingly parallel, no shuffle.
- The only shuffles are the candidate joins (band_key / chunk / shingle) —
  the standard LSH/PPJoin layouts. Skewed buckets (a band key shared by
  thousands of docs) are the known hazard: AQE skew-join handles moderate
  skew; `max_bucket` drops degenerate buckets (documented recall trade).
- Verification joins fetch shingle arrays only for candidate ids — at scale
  this is a semi-join against a tiny candidate set, broadcast when small.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# shared shingling expressions
# --------------------------------------------------------------------------


def tokens_col(col: str):
    return F.split(F.lower(F.col(col)), " ")


def shingles_expr(col: str, n: int, distinct: bool) -> str:
    """Word n-gram shingles as a SQL expression string (1-based slice,
    empty array for docs shorter than n tokens — mirrored in the oracles)."""
    toks = f"split(lower({col}), ' ')"
    base = (
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
        f"ELSE array() END"
    )
    return f"array_distinct({base})" if distinct else base


# --------------------------------------------------------------------------
# 1. exact duplicates
# --------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, id_col: str, col: str) -> DataFrame:
    """Groups of byte-identical values: (content_hash, n_dups, keep_id).

    The canonical keep-one-representative policy (min id). One shuffle on
    the 32-hex md5 — uniformly distributed, skew-free by construction.
    """
    return (
        df.groupBy(F.md5(F.col(col)).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(F.col(id_col)).alias("keep_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


# --------------------------------------------------------------------------
# 2. MinHash + banded LSH
# --------------------------------------------------------------------------


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs (id_a, id_b, jaccard) with jaccard >= threshold among
    LSH candidates.

    MinHash permutation i = md5("{i}|" + shingle); the signature component
    is the lexicographic min of the fixed-width hex digests (equivalent to
    min over a random permutation). Bands of r = num_hashes/bands rows are
    hashed to a bucket key; pairs sharing any bucket are verified with the
    exact Jaccard on distinct shingle sets (|A∩B| / (|A|+|B|-|A∩B|)).

    Candidate generation is probabilistic (the classic s-curve at
    threshold ~ (1/bands)^(1/r)); the verify step removes false positives,
    so precision is exact and only recall is approximate — the same
    contract as the reference's index-prune + refine (SURVEY §0).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    # repartition barrier: stops ProjectCollapse from re-inlining the
    # shingling into every downstream expression, and the shared Exchange is
    # reused (ReusedExchange) by the candidate and both verify joins instead
    # of rescanning the lake three times
    docs = (
        df.select(
            F.col(id_col).alias("id"),
            F.expr(shingles_expr(col, n, distinct=True)).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .repartition("id")
    )
    sigs = docs.select(
        "id",
        "sh",
        F.expr(
            f"transform(sequence(0, {num_hashes - 1}), "
            f"s -> array_min(transform(sh, x -> md5(concat(cast(s AS string), '|', x)))))"
        ).alias("sig"),
    )
    banded = sigs.select(
        "id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> md5(concat(cast(b AS string), '#', "
                f"concat_ws(',', slice(sig, b * {r} + 1, {r})))))"
            )
        ).alias("band_key"),
    ).distinct()
    cands = (
        banded.alias("a")
        .join(banded.alias("b"), "band_key")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh_a = docs.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = docs.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# 3. SimHash (exact under pigeonhole blocking)
# --------------------------------------------------------------------------

SIMHASH_BITS = 60  # 15 hex chars of md5 — fits signed 64-bit in both engines


def simhash_signatures(df: DataFrame, id_col: str, col: str, n: int = 3) -> DataFrame:
    """(id, sig): 60-bit SimHash over word n-gram shingles WITH multiplicity
    (classic frequency-weighted simhash). The shingle hashes materialize
    once per row (`hs` column), then each bit is the sign of the +-1 vote
    sum — two narrow projections, no shuffle."""
    # barrier: without it ProjectCollapse inlines `hs` into all 60 bit
    # expressions (60x md5 recompute per row — measured 6x slower)
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.expr(
            f"transform({shingles_expr(col, n, distinct=False)}, "
            f"x -> cast(conv(substr(md5(x), 1, 15), 16, 10) AS bigint))"
        ).alias("hs"),
    ).repartition("id")
    return hashed.select(
        "id",
        F.expr(
            f"aggregate(transform(sequence(0, {SIMHASH_BITS - 1}), b -> "
            f"IF(aggregate(hs, 0, (acc, x) -> acc + IF(shiftright(x, b) & 1 = 1, 1, -1)) > 0, "
            f"shiftleft(1L, b), 0L)), 0L, (acc, x) -> acc + x)"
        ).alias("sig"),
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    col: str,
    n: int = 3,
    max_hamming: int = 8,
) -> DataFrame:
    """ALL pairs (id_a, id_b, hamming) with hamming(simhash) <= max_hamming.

    EXACT despite blocking: signatures are split into max_hamming+1 bit
    chunks; two signatures within the hamming budget must agree on at least
    one chunk (pigeonhole), so the chunk-equality join has recall 1.0 and
    the bit_count(xor) verify gives exact precision.
    """
    chunks = max_hamming + 1
    width = math.ceil(SIMHASH_BITS / chunks)
    # barrier again: `sig` is referenced by the chunk explode AND both sides
    # of the self-join — without it the 60-bit vote loop re-runs per chunk
    sigs = simhash_signatures(df, id_col, col, n).repartition("id")
    keyed = sigs.select(
        "id",
        "sig",
        F.explode(
            F.expr(
                f"transform(sequence(0, {chunks - 1}), c -> "
                f"struct(c AS chunk, shiftright(sig, c * {width}) & {(1 << width) - 1} AS val))"
            )
        ).alias("ck"),
    ).select("id", "sig", "ck.chunk", "ck.val")
    return (
        keyed.alias("a")
        .join(keyed.alias("b"), ["chunk", "val"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.sig").bitwiseXOR(F.col("b.sig"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# --------------------------------------------------------------------------
# 4. exact n-gram Jaccard similarity join (prefix-filtered)
# --------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    col: str,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT similarity join: all pairs with shingle-Jaccard >= threshold.

    Prefix filtering: order each doc's shingles by ascending global
    frequency (rarest first, shingle as tie-break); if jaccard(A,B) >= t
    then |A∩B| >= t/(1+t)·(|A|+|B|) >= t·|A|, so A and B must share a
    shingle within each one's first |A| - ceil(t·|A|) + 1 shingles. Only
    those prefix shingles enter the inverted-index join — the candidate set
    shrinks by ~1/(1-t) while staying lossless.
    """
    docs = (
        df.select(
            F.col(id_col).alias("id"),
            F.expr(shingles_expr(col, n, distinct=True)).alias("sh"),
        )
        .filter(F.size("sh") > 0)
        .repartition("id")  # shared exchange: explode + both verify joins
    )

    exploded = docs.select("id", F.size("sh").alias("sz"), F.explode("sh").alias("g"))
    freq = exploded.groupBy("g").agg(F.count(F.lit(1)).alias("freq"))
    from pyspark.sql.window import Window

    ranked = (
        exploded.join(freq, "g")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("id").orderBy("freq", "g")
            ),
        )
        .withColumn(
            "prefix_len",
            F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1,
        )
    )
    prefix = ranked.filter(F.col("pos") <= F.col("prefix_len")).select("id", "g")
    cands = (
        prefix.alias("a")
        .join(prefix.alias("b"), "g")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh_a = docs.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = docs.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.size("sh_a") + F.size("sh_b") - F.col("inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# 5. embedding cosine near-dup
# --------------------------------------------------------------------------


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
) -> DataFrame:
    """EXACT all-pairs cosine similarity >= threshold: (id_a, id_b, cosine).

    Brute-force O(n²) pairing — correct at any scale but quadratic; this is
    the oracle-checkable baseline. The scale path is candidate blocking via
    the IVF index (same centroid ⇒ candidate) + this exact verify; see
    tests/test_dedup.py for the recall harness.

    Dot products run as `aggregate(zip_with(...))` — JVM codegen over the
    float arrays, doubles for accumulation (matches DuckDB's
    list_cosine_similarity numerics to ~1e-15 relative).
    """
    vecs = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.sqrt(
            F.expr(
                f"aggregate({vec_col}, 0D, (a, x) -> a + cast(x AS double) * cast(x AS double))"
            )
        ).alias("norm"),
    )
    a = vecs.select(
        F.col("id").alias("id_a"), F.col("v").alias("v_a"), F.col("norm").alias("n_a")
    )
    b = vecs.select(
        F.col("id").alias("id_b"), F.col("v").alias("v_b"), F.col("norm").alias("n_b")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                F.expr(
                    "aggregate(zip_with(v_a, v_b, (x, y) -> cast(x AS double) * cast(y AS double)), "
                    "0D, (a, x) -> a + x)"
                )
                / (F.col("n_a") * F.col("n_b")),
                4,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
