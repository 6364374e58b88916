"""Text analysis: behavioral properties on constructed rows + fixture."""

import pytest
from pyspark.sql import functions as F

from rottnest_spark.ops import textstats


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "the cat sat on the mat and it is a cat"),
        (2, "der hund ist nicht ein hund und der ist"),
        (3, "x7f 09a!!! ### $$$ %%% ^^^ &&& *** ((("),
        (4, "le chat est dans la maison et le chat est pour"),
        (5, "short"),
    ]
    return spark.createDataFrame(rows, ["id", "text"])


def test_token_stats_counts(spark, tiny):
    r = {x["id"]: x for x in textstats.token_stats(tiny, "id", "text").collect()}
    assert r[1]["n_tokens_ws"] == 11
    assert r[1]["n_chars"] == len("the cat sat on the mat and it is a cat")
    # BPE pieces split punctuation runs into single symbols
    assert r[3]["n_tokens_bpe"] > r[3]["n_tokens_ws"]


def test_quality_signals_keep_logic(spark, tiny):
    r = {x["id"]: x for x in textstats.quality_signals(tiny, "id", "text").collect()}
    assert not r[5]["keep"]  # too short
    assert not r[3]["keep"]  # punct-heavy, no stopwords
    assert r[3]["punct_ratio"] > 0.2
    assert r[1]["stopword_ratio"] > 0.2


def test_lang_id_profiles(spark, tiny):
    r = {x["id"]: x for x in textstats.lang_id(tiny, "id", "text").collect()}
    assert r[1]["pred_lang"] == "en"
    assert r[2]["pred_lang"] == "de"
    assert r[4]["pred_lang"] == "fr"
    assert r[3]["pred_lang"] == "und"
    zh = spark.createDataFrame([(9, "这是一个中文文档 的 例子")], ["id", "text"])
    assert textstats.lang_id(zh, "id", "text").collect()[0]["pred_lang"] == "zh"


def test_fingerprints_whitespace_invariance_and_neardup(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "Alpha  beta   gamma delta epsilon zeta eta theta"),
            (3, "alpha beta gamma delta epsilon zeta eta IOTA"),
        ],
        ["id", "text"],
    )
    r = {x["id"]: x for x in textstats.fingerprints(df, "id", "text").collect()}
    # content_fp ignores case/extra whitespace
    assert r[1]["content_fp"] == r[2]["content_fp"]
    assert r[1]["content_fp"] != r[3]["content_fp"]
    # near-dup docs share most of the bottom-k sketch
    a, b = set(r[1]["winnow_fp"].split(":")), set(r[3]["winnow_fp"].split(":"))
    assert len(a & b) >= 2


def test_on_fixture_no_nulls(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for fn in (
        textstats.token_stats,
        textstats.quality_signals,
        textstats.lang_id,
        textstats.fingerprints,
    ):
        out = fn(docs, "doc_id", "text")
        null_rows = out.filter(
            " OR ".join(f"{c} IS NULL" for c in out.columns)
        ).count()
        assert null_rows == 0, fn.__name__


def test_chunk_documents_coverage_and_overlap(spark, sf_dir):
    """Chunks reconstruct the document: consecutive chunks overlap by the
    configured amount and their union covers every token in order."""
    import pyspark.sql.functions as F

    from rottnest_spark.ops.textstats import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    ct, ov = 32, 8
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=ct, overlap=ov)
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_text"].split(" "))
        )
    src = {
        r["doc_id"]: r["text"].lower().split(" ") for r in docs.collect()
    }
    stride = ct - ov
    for doc_id, chunks in by_doc.items():
        chunks.sort()
        toks = src[doc_id]
        for cid, ctoks in chunks:
            want = toks[cid * stride : cid * stride + ct]
            assert ctoks == want, (doc_id, cid)
        # full coverage: last chunk reaches the end
        last_cid, last = chunks[-1]
        assert last_cid * stride + len(last) == len(toks)
        # every chunk except possibly the last is full-size
        assert all(len(c) == ct for _, c in chunks[:-1])


def test_unigram_logprob_orders_quality(spark, sf_dir):
    """Common-token docs score higher than rare-token docs; counts match."""
    import math

    from rottnest_spark.ops.textstats import unigram_logprob

    rows = [
        (1, "the the the the"),       # most common token
        (2, "zzzuncommon qqqrare"),   # singletons
        (3, "the zzzuncommon"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_logprob(df, "doc_id", "text").collect()}
    total = 8
    assert out[1]["n_tokens"] == 4
    assert abs(out[1]["unigram_logprob"] - round(math.log(5 / total), 4)) < 1e-9
    assert out[1]["unigram_logprob"] > out[3]["unigram_logprob"] > out[2]["unigram_logprob"]
