"""Embedder swap contract (X2/X7 quality-parity harness).

The container ships no model libraries, so the repo's embedders are
documented md5 stubs. These tests prove the CONTRACT that makes the stub
swappable for a real encoder with one function pair:

- swapping the embedder changes scores/weights ONLY — schema, plan shape,
  determinism, tie-breaking and clipping are embedder-independent;
- retrieval against the swapped embedder is EXACT: the Spark top-k equals
  an independent brute-force cosine computed outside Spark (recall 1.0),
  for any embedder respecting the signature.
"""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from rottnest_spark.ops.rag import hash_embed_py, rag_retrieve

DIM = 16


# a deliberately different (still deterministic) embedder pair
def alt_embed_py(text: str) -> list[float]:
    out = []
    for j in range(DIM):
        h = hashlib.sha256(f"alt:{j}:{text}".encode()).hexdigest()
        out.append((int(h[:8], 16) % 997) / 997.0)
    return out


def alt_embed_col(text_col, j):
    h = F.sha2(F.concat(F.lit(f"alt:{j}:"), text_col), 256)
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % 997
    ) / 997.0


@pytest.fixture()
def docs(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )


QUERY = "spark merge sort window"


def _plan_ops(df) -> set[str]:
    """Physical operator names, stripped of ids/details."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        m.group(1)
        for m in re.finditer(r"^[\s:+*\-(\d)]*([A-Za-z]+)", plan, re.M)
    }


def test_rag_swap_changes_only_scores(spark, docs):
    base = rag_retrieve(docs, "doc_id", "text", QUERY, k=10)
    alt = rag_retrieve(
        docs, "doc_id", "text", QUERY, k=10,
        embed_col_fn=alt_embed_col, embed_py_fn=alt_embed_py,
    )
    # schema identical
    assert base.schema == alt.schema
    # plan shape identical: same physical operator set, and the embedder
    # stays JVM-side (no Python eval nodes) for both
    ops_b, ops_a = _plan_ops(base), _plan_ops(alt)
    assert ops_b == ops_a
    assert not any("Python" in o for o in ops_a)
    # determinism: repeated runs bit-identical per embedder
    r1 = [tuple(r) for r in alt.collect()]
    r2 = [
        tuple(r)
        for r in rag_retrieve(
            docs, "doc_id", "text", QUERY, k=10,
            embed_col_fn=alt_embed_col, embed_py_fn=alt_embed_py,
        ).collect()
    ]
    assert r1 == r2
    # scores (and hence ranking) differ between embedders — the swap is real
    assert [tuple(r) for r in base.collect()] != r1


def test_rag_swapped_embedder_is_exact(spark, docs):
    """Recall 1.0 vs independent brute-force cosine under the ALT
    embedder — the retrieval machinery is exact for any embedder."""
    from rottnest_spark.ops.textstats import chunk_documents

    k = 10
    got = rag_retrieve(
        docs, "doc_id", "text", QUERY, k=k,
        embed_col_fn=alt_embed_col, embed_py_fn=alt_embed_py,
    ).collect()

    chunks = chunk_documents(
        docs, "doc_id", "text", chunk_tokens=64, overlap=16
    ).select("doc_id", "chunk_id", "chunk_text").collect()
    qv = alt_embed_py(QUERY)
    nq = math.sqrt(sum(v * v for v in qv))

    def cos(text):
        e = alt_embed_py(text)
        dot = sum(a * b for a, b in zip(e, qv))
        ne = math.sqrt(sum(a * a for a in e))
        return round(dot / (ne * nq), 4)

    oracle = sorted(
        ((cos(r["chunk_text"]), r["doc_id"], r["chunk_id"]) for r in chunks),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:k]
    assert [(r["score"], r["doc_id"], r["chunk_id"]) for r in got] == [
        (pytest.approx(s, abs=1e-4), d, c) for s, d, c in oracle
    ]


def test_rag_dim_mismatch_raises(spark, docs):
    with pytest.raises(ValueError, match="dim"):
        rag_retrieve(
            docs, "doc_id", "text", QUERY, k=5,
            embed_py_fn=lambda t: [0.0] * 3,  # wrong dimensionality
        ).collect()


def test_expand_query_swap_keeps_invariants(spark, docs):
    from rottnest_spark.indices.bm25 import (
        EMB_DIM,
        expand_query,
        tokenize_query,
    )

    vocab = docs.select(
        F.explode(F.split(F.lower("text"), r"[^a-z0-9]+")).alias("token")
    ).filter(F.length("token") > 2)

    def alt_tok_embed(token: str) -> list[float]:
        return [
            (int(hashlib.sha256(f"t:{j}:{token}".encode()).hexdigest()[:8], 16)
             % 512) - 255.5
            for j in range(EMB_DIM)
        ]

    def alt_tok_col(col_name):
        return F.expr(
            f"transform(sequence(0, {EMB_DIM - 1}), i -> "
            f"cast(conv(substr(sha2(concat('t:', cast(i AS STRING), ':', "
            f"{col_name}), 256), 1, 8), 16, 10) % 512 AS double) - 255.5)"
        )

    base = expand_query(spark, "merge sort", vocab, expansion_tokens=5)
    alt = expand_query(
        spark, "merge sort", vocab, expansion_tokens=5,
        embed_token_fn=alt_tok_embed, embed_col_fn=alt_tok_col,
    )
    qtoks = set(tokenize_query("merge sort"))
    for weights in (base, alt):
        # original tokens always at full weight; everything clipped [0,1]
        assert all(weights[t] == 1.0 for t in qtoks)
        assert all(0.0 <= w <= 1.0 for w in weights.values())
        assert len(weights) <= 5 + len(qtoks)
    # the swap really changed the expansion neighborhood or its weights
    assert base != alt
