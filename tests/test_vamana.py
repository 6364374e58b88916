"""Vamana graph ANN (I17): kernel properties (connectivity, degree bound,
search quality), end-to-end recall through the lake, compaction."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from rottnest_spark import ParquetLake
from rottnest_spark.indices.vamana import (
    VamanaIndex,
    _beam_search_arrays,
    _vamana_build_arrays,
)
from rottnest_spark.indices.vector import knn_topk

K = 10


def test_kernel_graph_properties():
    rng = np.random.default_rng(7)
    x = rng.normal(size=(400, 16))
    R, L = 16, 32
    adj, medoid = _vamana_build_arrays(x, R=R, L=L, alpha=1.2, seed=1)
    assert all(len(a) <= R for a in adj)
    assert all(i not in a for i, a in enumerate(adj))
    # every node reachable from the medoid (BFS) — beam search can find it
    seen, frontier = {medoid}, [medoid]
    while frontier:
        nxt = []
        for p in frontier:
            for j in adj[p]:
                if j not in seen:
                    seen.add(j)
                    nxt.append(j)
        frontier = nxt
    assert len(seen) == len(x)


def test_kernel_search_recall():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(500, 16))
    adj, medoid = _vamana_build_arrays(x, R=24, L=48, alpha=1.2, seed=2)
    hits = 0
    for qi in range(20):
        q = x[qi] + rng.normal(scale=0.01, size=16)
        idxs, dists = _beam_search_arrays(x, adj, medoid, q, L=48)
        want = np.argsort(((x - q) ** 2).sum(axis=1))[:K]
        hits += len(set(idxs[:K]) & set(want))
        assert dists == sorted(dists)
    assert hits / (20 * K) >= 0.9, hits / (20 * K)


def test_kernel_degenerate_sizes():
    for n in (1, 2, 3):
        x = np.arange(n * 4, dtype=float).reshape(n, 4)
        adj, medoid = _vamana_build_arrays(x, R=8, L=8, alpha=1.2, seed=0)
        assert len(adj) == n and 0 <= medoid < n
        idxs, _ = _beam_search_arrays(x, adj, medoid, x[0], L=8)
        assert set(idxs) == set(range(n))


@pytest.fixture(scope="module")
def emb_lake(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("vamana") / "lake")
    (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .repartition(4)
        .write.parquet(out)
    )
    return out


@pytest.fixture(scope="module")
def query_vec(spark, sf_dir):
    return [
        float(x)
        for x in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") == 0)
        .collect()[0]["embedding"]
    ]


def _exact_ids(spark, emb_lake, q, k):
    rows = spark.read.parquet(emb_lake).select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.array([r["embedding"] for r in rows], dtype=float)
    d = np.sqrt(((mat - np.array(q)) ** 2).sum(axis=1)).round(4)
    return [ids[i] for i in sorted(range(len(ids)), key=lambda i: (d[i], ids[i]))[:k]]


def test_lake_knn_recall_and_determinism(spark, emb_lake, query_vec, tmp_path):
    lake = ParquetLake(spark, emb_lake, str(tmp_path / "idx"))
    idx = VamanaIndex(rows_per_cluster=128, nprobes=4, refine=64)
    assert lake.build_index(idx, "embedding")
    got = knn_topk(lake, idx, "embedding", query_vec, K, "vec_id")
    rows1 = [(r["vec_id"], r["dist"]) for r in got.collect()]
    assert len(rows1) == K
    want = set(_exact_ids(spark, emb_lake, query_vec, K))
    recall = len({i for i, _ in rows1} & want) / K
    assert recall >= 0.8, recall
    # deterministic: a second identical search returns identical rows
    rows2 = [
        (r["vec_id"], r["dist"])
        for r in knn_topk(lake, idx, "embedding", query_vec, K, "vec_id").collect()
    ]
    assert rows1 == rows2
    # reranked distances are the EXACT fp32 distances (match brute force)
    exact = {
        r["vec_id"]: r["dist"]
        for r in knn_topk(
            lake, idx, "embedding", query_vec, K, "vec_id", exact=True
        ).collect()
    }
    for i, d in rows1:
        if i in exact:
            assert d == exact[i]


def test_unindexed_files_still_searched(spark, emb_lake, tmp_path, query_vec):
    """Lake with no index: knn_topk falls back to the exact scan."""
    lake = ParquetLake(spark, emb_lake, str(tmp_path / "idx"))
    idx = VamanaIndex()
    got = [r["vec_id"] for r in knn_topk(lake, idx, "embedding", query_vec, K, "vec_id").collect()]
    assert got == _exact_ids(spark, emb_lake, query_vec, K)


def test_compaction_preserves_recall(spark, emb_lake, tmp_path, query_vec):
    lake = ParquetLake(spark, emb_lake, str(tmp_path / "idx"))
    idx = VamanaIndex(rows_per_cluster=64, nprobes=8, refine=64)
    lake.build_index(idx, "embedding", binpack_row_threshold=1)
    assert len(lake.catalog.entries_for("vamana", "embedding")) > 1
    before = [r["vec_id"] for r in knn_topk(lake, idx, "embedding", query_vec, K, "vec_id").collect()]
    assert lake.compact_indices(idx, "embedding", row_threshold=10_000_000)
    assert len(lake.catalog.entries_for("vamana", "embedding")) == 1
    after = [r["vec_id"] for r in knn_topk(lake, idx, "embedding", query_vec, K, "vec_id").collect()]
    want = set(_exact_ids(spark, emb_lake, query_vec, K))
    assert len(set(after) & want) / K >= 0.8
    # compaction only renumbers clusters — same graphs, same candidates
    assert set(after) == set(before)
    lake.catalog.validate()


def test_knn_topk_many_loops_per_query(spark, emb_lake, tmp_path, query_vec):
    """Batched KNN over a graph index (no postings table) must fall back
    to per-query beam searches with identical results."""
    from rottnest_spark.indices.vector import knn_topk_many

    lake = ParquetLake(spark, emb_lake, str(tmp_path / "idx"))
    idx = VamanaIndex(rows_per_cluster=128, nprobes=4, refine=64)
    lake.build_index(idx, "embedding")
    q2 = [v + 0.01 for v in query_vec]
    res = knn_topk_many(
        lake, idx, "embedding", {"a": query_vec, "b": q2}, K, "vec_id"
    )
    for name, vec in [("a", query_vec), ("b", q2)]:
        got = sorted(
            r["vec_id"]
            for r in res.filter(F.col("__query__") == name).collect()
        )
        want = sorted(
            r["vec_id"]
            for r in knn_topk(lake, idx, "embedding", vec, K, "vec_id").collect()
        )
        assert got == want, name


def test_build_is_run_to_run_deterministic(spark, emb_lake, tmp_path):
    """Two builds over the same lake produce identical graphs — the
    training sample is a content-hash filter, not df.sample (which is not
    reproducible across actions)."""
    fps = []
    for i in range(2):
        lake = ParquetLake(spark, emb_lake, str(tmp_path / f"idx{i}"))
        idx = VamanaIndex(rows_per_cluster=128, nprobes=4, kmeans_sample_fraction=0.6)
        lake.build_index(idx, "embedding")
        p = lake.catalog.entries_for("vamana", "embedding")[0]["index_path"]
        cents = sorted(map(str, spark.read.parquet(p + "/centroids").collect()))
        graph = sorted(
            map(
                str,
                spark.read.parquet(p + "/graph")
                .select("cluster_id", "node_id", "pos", "neighbors")
                .collect(),
            )
        )
        fps.append((tuple(cents), tuple(graph)))
    assert fps[0] == fps[1]


def test_index_from_config_roundtrip():
    from rottnest_spark.indices import index_from_config

    idx = VamanaIndex(rows_per_cluster=256, nprobes=2, R=16, L=32)
    back = index_from_config("vamana", idx.config())
    assert isinstance(back, VamanaIndex)
    assert back.config() == idx.config()
