"""Bloom membership index: exact-equality search parity, zero false
negatives, pruning on high-cardinality string keys, lifecycle (compaction,
vacuum), saturation escape, row-group granularity."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark import ParquetLake
from rottnest_spark.indices.base import BRUTE_FORCE
from rottnest_spark.indices.bloom import BloomIndex


@pytest.fixture(scope="module")
def docs_lake(spark, sf_dir, tmp_path_factory):
    """documents split into 6 files with a synthetic UUID-ish string key
    `uid` — high-cardinality, unclustered: the zone-map-hostile case Bloom
    is for."""
    out = str(tmp_path_factory.mktemp("bloom") / "lake")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn(
            "uid", F.concat(F.lit("doc-"), F.md5(F.col("doc_id").cast("string")))
        )
        .repartition(6)
        .write.parquet(out)
    )
    return out


def _ids(df):
    return sorted(r[0] for r in df.select("doc_id").collect())


def probe_key(spark, docs_lake):
    return (
        spark.read.parquet(docs_lake)
        .select("uid")
        .orderBy("uid")
        .limit(1)
        .collect()[0][0]
    )


def test_search_equals_full_scan(spark, docs_lake, tmp_path):
    lake = ParquetLake(spark, docs_lake, str(tmp_path / "idx"))
    idx = BloomIndex()
    lake.build_index(idx, "uid")
    q = probe_key(spark, docs_lake)
    for key in [q, "no-such-doc-id"]:
        got = _ids(lake.search(idx, "uid", key))
        want = _ids(
            spark.read.parquet(docs_lake).filter(F.col("uid") == key)
        )
        assert got == want, key


def test_no_false_negatives_and_prunes(spark, docs_lake, tmp_path):
    """Every present key's unit is a candidate (definitive 'no' only), and
    a point probe prunes to ~1 of the 6 files (FPR ~0 at this scale)."""
    lake = ParquetLake(spark, docs_lake, str(tmp_path / "idx"))
    idx = BloomIndex()
    lake.build_index(idx, "uid")
    entry = lake.catalog.entries()[0]
    paths = [entry["index_path"]]
    q = probe_key(spark, docs_lake)
    cands = idx.search(spark, paths, q)
    assert cands is not BRUTE_FORCE
    def norm(p: str) -> str:
        return p.split("://", 1)[-1].lstrip("/")

    cand_files = {norm(r["file_path"]) for r in cands.collect()}
    true_files = {
        norm(r[0])
        for r in spark.read.parquet(docs_lake)
        .filter(F.col("uid") == q)
        .select(F.input_file_name())
        .collect()
    }
    assert true_files <= cand_files  # no false negatives
    assert len(cand_files) <= 2  # prunes most of the 6 files

    # absent key: with m=2^23 over ~100 keys/file, FPR ≈ 0 → empty
    assert idx.search(spark, paths, "definitely-absent").count() == 0


def test_compaction_preserves_search(spark, docs_lake, tmp_path):
    lake = ParquetLake(spark, docs_lake, str(tmp_path / "idx"))
    idx = BloomIndex()
    lake.build_index(idx, "uid", binpack_row_threshold=1)
    assert len(lake.catalog.entries()) > 1
    q = probe_key(spark, docs_lake)
    before = _ids(lake.search(idx, "uid", q))
    lake.compact_indices(idx, "uid", row_threshold=10_000_000)
    assert len(lake.catalog.entries_for("bloom", "uid")) == 1
    after = _ids(lake.search(idx, "uid", q))
    assert before == after and before


def test_saturated_filter_escapes_to_brute_force(spark, docs_lake, tmp_path):
    """A deliberately tiny filter (m=64 bits for ~500 keys) saturates;
    search must declare itself useless rather than pass everything."""
    lake = ParquetLake(spark, docs_lake, str(tmp_path / "idx"))
    idx = BloomIndex(m_bits=64, k_hashes=2)
    lake.build_index(idx, "uid")
    paths = [e["index_path"] for e in lake.catalog.entries_for("bloom", "uid")]
    assert idx.search(spark, paths, "anything") is BRUTE_FORCE
    # lake.search stays exact through the escape
    q = probe_key(spark, docs_lake)
    got = _ids(lake.search(idx, "uid", q))
    want = _ids(spark.read.parquet(docs_lake).filter(F.col("uid") == q))
    assert got == want


def test_row_group_granularity(spark, sf_dir, tmp_path):
    """row_group units: candidates carry real row-group ids and search
    still equals the full scan."""
    import pyarrow.parquet as pq

    import os

    with_uid = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn(
            "uid", F.concat(F.lit("doc-"), F.md5(F.col("doc_id").cast("string")))
        )
        .toPandas()
    )
    import pyarrow as pa

    rg_dir = str(tmp_path / "rg_lake")
    os.makedirs(rg_dir)
    pq.write_table(
        pa.Table.from_pandas(with_uid, preserve_index=False),
        os.path.join(rg_dir, "docs.parquet"),
        row_group_size=64,
    )
    lake = ParquetLake(spark, rg_dir, str(tmp_path / "idx"))
    idx = BloomIndex(granularity="row_group")
    lake.build_index(idx, "uid")
    q = probe_key(spark, rg_dir)
    paths = [e["index_path"] for e in lake.catalog.entries_for("bloom", "uid")]
    cands = idx.search(spark, paths, q).collect()
    assert cands and all(r["row_group"] >= 0 for r in cands)
    total_units = (
        spark.read.parquet(paths[0] + "/meta").count()
    )
    assert len(cands) < total_units  # sub-file pruning happened
    got = _ids(lake.search(idx, "uid", q))
    want = _ids(spark.read.parquet(rg_dir).filter(F.col("uid") == q))
    assert got == want


def test_config_guard_blocks_mismatched_probe(spark, docs_lake, tmp_path):
    """An index built with one geometry must not serve a probe configured
    with another (positions differ → silent wrong pruning)."""
    lake = ParquetLake(spark, docs_lake, str(tmp_path / "idx"))
    lake.build_index(BloomIndex(m_bits=1 << 23), "uid")
    q = probe_key(spark, docs_lake)
    with pytest.raises(Exception):
        lake.search(BloomIndex(m_bits=1 << 20), "uid", q).collect()


def test_vacuum_reclaims_bloom(spark, docs_lake, tmp_path):
    lake = ParquetLake(spark, docs_lake, str(tmp_path / "idx"))
    idx = BloomIndex()
    lake.build_index(idx, "uid")
    assert lake.vacuum() == []  # everything live


def test_streaming_maintenance_covers_new_files(spark, sf_dir, tmp_path):
    """BloomIndex slots into the streaming incremental-build path: a drain
    indexes existing files; appended files get indexed by the next drain;
    search stays exact throughout."""
    from rottnest_spark.streaming.incremental import stream_index_maintenance

    out = str(tmp_path / "lake")
    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn(
            "uid", F.concat(F.lit("doc-"), F.md5(F.col("doc_id").cast("string")))
        )
    )
    base.limit(300).repartition(2).write.parquet(out)
    lake = ParquetLake(spark, out, str(tmp_path / "idx"))
    idx = BloomIndex()
    created = stream_index_maintenance(
        spark, lake, idx, "uid", str(tmp_path / "ckpt")
    )
    assert created
    # append new files -> drain again -> only the delta indexed
    base.limit(400).repartition(2).write.mode("append").parquet(out)
    lake2 = ParquetLake(spark, out, str(tmp_path / "idx"))
    created2 = stream_index_maintenance(
        spark, lake2, idx, "uid", str(tmp_path / "ckpt")
    )
    assert created2
    q = probe_key(spark, out)
    got = _ids(lake2.search(idx, "uid", q))
    want = _ids(spark.read.parquet(out).filter(F.col("uid") == q))
    assert got == want and got


def test_bloom_in_conjunctive_search(spark, sf_dir, tmp_path):
    """BloomIndex composes with ExactIndex zone maps in search_conj: the
    bloom prunes by key membership, the zone map by range; refine applies
    both predicates -> exact conjunction."""
    from rottnest_spark.indices.exact import ExactIndex

    out = str(tmp_path / "lake")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .withColumn(
            "uid", F.concat(F.lit("doc-"), F.md5(F.col("doc_id").cast("string")))
        )
        .repartition(4)
        .write.parquet(out)
    )
    lake = ParquetLake(spark, out, str(tmp_path / "idx"))
    b, e = BloomIndex(), ExactIndex()
    lake.build_index(b, "uid")
    lake.build_index(e, "n_chars")
    q = probe_key(spark, out)
    row = (
        spark.read.parquet(out).filter(F.col("uid") == q).collect()[0]
    )
    lo, hi = row["n_chars"] - 5, row["n_chars"] + 5
    got = _ids(
        lake.search_conj([(b, "uid", q), (e, "n_chars", (lo, hi))])
    )
    want = _ids(
        spark.read.parquet(out).filter(
            (F.col("uid") == q) & F.col("n_chars").between(lo, hi)
        )
    )
    assert got == want and got
