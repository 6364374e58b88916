"""Deterministic sampling/splitting/packing properties."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark.ops import sampling


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_hash_sample_deterministic_and_proportional(spark, docs):
    n = docs.count()
    a = {r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", 0.3).collect()}
    b = {r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", 0.3).collect()}
    assert a == b
    assert 0.2 * n < len(a) < 0.4 * n
    # a smaller fraction with the same seed is a subset (nested samples)
    c = {r["doc_id"] for r in sampling.hash_sample(docs, "doc_id", 0.1).collect()}
    assert c <= a
    # a different seed gives a different (roughly independent) sample
    d = {
        r["doc_id"]
        for r in sampling.hash_sample(docs, "doc_id", 0.3, seed="other").collect()
    }
    assert d != a


def test_split_column_partitions(spark, docs):
    out = sampling.split_column(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    n = docs.count()
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert sum(counts.values()) == n  # every row in exactly one split
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_stratified_fractions(spark, docs):
    out = sampling.stratified_sample(
        docs, "doc_id", "lang", {"en": 1.0, "de": 0.0}, default_fraction=0.5
    )
    got = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    full = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert got["en"] == full["en"]  # fraction 1.0 keeps everything
    assert "de" not in got          # fraction 0.0 drops the stratum
    for lang in ("fr", "es", "zh"):
        assert 0 < got[lang] < full[lang]


def test_pack_sequences_budget_bound(spark, docs):
    budget = 500
    d = docs.select(
        "doc_id", "source", F.expr("size(split(lower(text),' '))").alias("nt")
    )
    out = sampling.pack_sequences(d, "doc_id", "nt", budget, "source")
    per_batch = (
        out.groupBy("source", "batch_id")
        .agg(F.sum("nt").alias("tot"), F.min("nt").alias("first_min"), F.max("nt").alias("mx"))
        .collect()
    )
    assert len(per_batch) > 1
    for r in per_batch:
        # chunked-cumsum bound: only the straddling first row can overshoot
        assert r["tot"] <= budget + r["mx"] - 1
    # batch ids start at 0 per source and are contiguous
    for src_row in out.groupBy("source").agg(
        F.min("batch_id").alias("lo"),
        F.max("batch_id").alias("hi"),
        F.countDistinct("batch_id").alias("n"),
    ).collect():
        assert src_row["lo"] == 0
        assert src_row["n"] == src_row["hi"] + 1


def test_hash_sample_n_exact_and_deterministic(spark, docs):
    a = sorted(r["doc_id"] for r in sampling.hash_sample_n(docs, "doc_id", 37).collect())
    b = sorted(r["doc_id"] for r in sampling.hash_sample_n(docs, "doc_id", 37).collect())
    assert a == b and len(a) == 37
    # nested: top-10 is a subset of top-37 (same hash order)
    c = sorted(r["doc_id"] for r in sampling.hash_sample_n(docs, "doc_id", 10).collect())
    assert set(c) <= set(a)


def test_empty_lake_raises_clearly(spark, tmp_path):
    from rottnest_spark import ParquetLake
    from rottnest_spark.indices.substring import SubstringIndex

    empty = tmp_path / "nothing"
    empty.mkdir()
    lake = ParquetLake(spark, str(empty), str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="no data files"):
        lake.read()


def test_pack_sequences_greedy_hard_cap(spark, sf_dir):
    """Greedy packing: no batch exceeds the budget (unless one row alone
    does), rows stay in id order within batches, deterministic."""
    import pyspark.sql.functions as F

    from rottnest_spark.ops.sampling import pack_sequences_greedy

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id",
            "source",
            F.greatest(
                (F.col("n_chars") / 4).cast("long"), F.lit(1)
            ).alias("n_tok"),
        )
    )
    budget = 500
    out = pack_sequences_greedy(docs, "doc_id", "n_tok", budget, "source")
    per_batch = (
        out.groupBy("source", "batch_id")
        .agg(F.sum("n_tok").alias("tot"), F.count("*").alias("n"))
        .collect()
    )
    assert per_batch
    for r in per_batch:
        assert r["tot"] <= budget or r["n"] == 1, r
    # deterministic
    a = sorted(
        (r["doc_id"], r["batch_id"])
        for r in out.select("doc_id", "batch_id").collect()
    )
    out2 = pack_sequences_greedy(docs, "doc_id", "n_tok", budget, "source")
    b = sorted(
        (r["doc_id"], r["batch_id"])
        for r in out2.select("doc_id", "batch_id").collect()
    )
    assert a == b
    # id-ordered within batch: batch ids are nondecreasing in id order
    import itertools

    rows = sorted(
        (r["source"], r["doc_id"], r["batch_id"])
        for r in out.collect()
    )
    for _, grp in itertools.groupby(rows, key=lambda r: r[0]):
        bids = [g[2] for g in grp]
        assert bids == sorted(bids)


def test_mixture_by_tokens_budget_and_determinism(spark, sf_dir):
    """Per-stratum token budgets: kept tokens <= budget + one boundary doc;
    unbudgeted strata drop entirely; deterministic."""
    import pyspark.sql.functions as F

    from rottnest_spark.ops.sampling import mixture_by_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "n_tokens", F.size(F.split(F.lower("text"), " "))
    )
    budgets = {"src0": 600, "src1": 150}
    out = mixture_by_tokens(docs, "doc_id", "source", "n_tokens", budgets)
    per = {
        r["source"]: (r["tok"], r["mx"])
        for r in out.groupBy("source")
        .agg(F.sum("n_tokens").alias("tok"), F.max("n_tokens").alias("mx"))
        .collect()
    }
    assert set(per) <= set(budgets)
    for s, (tok, mx) in per.items():
        assert tok <= budgets[s] + mx, (s, tok, mx)
        assert tok > 0
    a = sorted(r[0] for r in out.select("doc_id").collect())
    b = sorted(
        r[0]
        for r in mixture_by_tokens(
            docs, "doc_id", "source", "n_tokens", budgets
        ).select("doc_id").collect()
    )
    assert a == b and a


# -- token-shard export + manifest verification ------------------------------


def test_write_and_verify_token_shards(spark, tmp_path):
    import json
    import os

    from rottnest_spark.ops.export import verify_shards, write_token_shards

    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", 10 + (i % 7)) for i in range(200)],
        "doc_id bigint, source string, n_tokens bigint",
    )
    out = str(tmp_path / "shards")
    man = write_token_shards(
        docs, "doc_id", "n_tokens", out, shard_tokens=300,
        partition_col="source",
    )
    assert man["total_docs"] == 200
    assert man["total_tokens"] == sum(10 + (i % 7) for i in range(200))
    assert man["n_shards"] >= 3  # at least one per source
    # every shard stays near the budget (window-packing bound:
    # <= budget + first-row tokens - 1)
    assert all(s["n_tokens"] <= 300 + 16 for s in man["shards"].values())
    # round-trip: no data lost, manifest verifies clean
    assert spark.read.parquet(out).count() == 200
    assert verify_shards(spark, out, "doc_id", "n_tokens") == []

    # tamper with one shard -> exactly that shard flagged
    sid, meta = next(iter(man["shards"].items()))
    mpath = os.path.join(out, "_manifest.json")
    m = json.load(open(mpath))
    m["shards"][sid]["checksum"] += 1
    json.dump(m, open(mpath, "w"))
    assert verify_shards(spark, out, "doc_id", "n_tokens") == [sid]
