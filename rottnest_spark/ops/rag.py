"""RAG retrieval composition: chunk → embed → cosine top-k, end-to-end.

The embedder is the repo's documented deterministic stub convention (this
container ships no model libraries; see also the BM25 expansion embedder,
indices/bm25.py): component j of embed(t) is an md5-derived uniform in
[0, 1) — reproducible on any engine, replicable in ANSI SQL, and a
one-function swap point for a real encoder. What this module actually
exercises is the SPARK-SIDE pipeline a real RAG prep needs: overlapping
chunking with provenance, a per-chunk embedding projection that stays in
whole-stage codegen (the embedding lives in `dim` plain double columns,
not an interpreted-HOF array), and a scan-wide top-k
(TakeOrderedAndProject, no global sort).

Scale: one pass over chunks; the query vector is `dim` literals folded
into the projection. For corpus-scale serving, build the IVF/PQ index
over the same embedding columns (indices/vector.py) — this brute-force
path is the exactness baseline, the same contract as vector_knn_exact.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMBED_DIM = 16
EMBED_PREFIX = "emb"
_MOD = 1000


def hash_embed_col(text_col: Column, j: int, prefix: str = EMBED_PREFIX) -> Column:
    """Component j of the deterministic embedding, as a codegen Column."""
    h = F.md5(F.concat(F.lit(f"{prefix}:{j}:"), text_col))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _MOD
    ) / float(_MOD)


def hash_embed_py(text: str, dim: int = EMBED_DIM, prefix: str = EMBED_PREFIX) -> list[float]:
    """Driver-side mirror of hash_embed_col (bit-identical)."""
    out = []
    for j in range(dim):
        h = hashlib.md5(f"{prefix}:{j}:{text}".encode()).hexdigest()
        out.append((int(h[:8], 16) % _MOD) / float(_MOD))
    return out


def rag_retrieve(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query: str,
    k: int = 10,
    chunk_tokens: int = 64,
    overlap: int = 16,
    dim: int = EMBED_DIM,
    embed_col_fn=None,
    embed_py_fn=None,
) -> DataFrame:
    """Top-k chunks by cosine similarity to `query`, with document
    provenance: (doc id, chunk_id, n_chunk_tokens, score). Deterministic
    ties broken by (id, chunk_id).

    EMBEDDER SWAP CONTRACT (the one-function upgrade path to a real
    encoder): pass `embed_col_fn(text_col, j) -> Column` (component j of
    the chunk embedding, any codegen-able expression — or a Pandas-UDF
    column for a real model) and `embed_py_fn(text) -> list[float]` (the
    driver-side query embedding, same dimensionality). Swapping the
    embedder changes SCORES only: schema, plan shape (projection +
    TakeOrderedAndProject), chunking, tie-breaking and determinism
    machinery are embedder-independent — proven by
    tests/test_embedder_contract.py."""
    from rottnest_spark.ops.textstats import chunk_documents

    embed_col_fn = embed_col_fn or hash_embed_col
    embed_py_fn = embed_py_fn or (lambda t: hash_embed_py(t, dim))
    chunks = chunk_documents(
        docs, id_col, text_col, chunk_tokens=chunk_tokens, overlap=overlap
    )
    qv = embed_py_fn(query)
    if len(qv) != dim:
        raise ValueError(
            f"embed_py_fn returned dim {len(qv)}, expected {dim}"
        )
    comps = [embed_col_fn(F.col("chunk_text"), j) for j in range(dim)]
    dot = sum((c * F.lit(qv[j]) for j, c in enumerate(comps)), F.lit(0.0))
    nu = sum((c * c for c in comps), F.lit(0.0))
    nq = sum(v * v for v in qv)
    score = F.round(dot / F.sqrt(nu * F.lit(nq)), 4)
    return (
        chunks.select(
            id_col, "chunk_id", "n_chunk_tokens", score.alias("score")
        )
        .orderBy(F.desc("score"), F.asc(id_col), F.asc("chunk_id"))
        .limit(k)
    )
