"""Property-based tests for the round-4b components: the §0 invariant for
the suffix-array index under generated needles, and wordpiece laws (UDF ≡
driver tokenization, vocab-closure of outputs, greedy determinism)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rottnest_spark import ParquetLake
from rottnest_spark.indices.suffix import SuffixArrayIndex
from rottnest_spark.indices.tokenizers import WordPieceTokenizer

WORDS = st.sampled_from(
    "merge sort spark window table value part hash batch ba so x zzqq".split()
)


@pytest.fixture(scope="module")
def sfx_lake(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("propsfx") / "lake")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(4)
        .write.parquet(out)
    )
    lake = ParquetLake(spark, out, out + "_idx")
    idx = SuffixArrayIndex(prefix_len=8)
    lake.build_index(idx, "text")
    return lake, idx, out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=st.lists(WORDS, min_size=1, max_size=3).map(" ".join))
def test_suffix_search_equals_full_scan(spark, sfx_lake, q):
    """§0 invariant for arbitrary needles — including sub-gram-width ones
    and needles longer than prefix_len (truncated-probe soundness)."""
    lake, idx, out = sfx_lake
    got = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    want = sorted(
        r["doc_id"]
        for r in spark.read.parquet(out)
        .filter(F.contains(F.lower("text"), F.lit(q.lower())))
        .select("doc_id")
        .collect()
    )
    assert got == want, q


VOCAB = [
    "[UNK]", "a", "ab", "abc", "##b", "##c", "##bc", "b", "bc", "c",
    ",", ".", "x", "##x", "xy", "##y",
]
TEXTS = st.text(alphabet="abcxy,. ", min_size=0, max_size=24)


@settings(max_examples=50, deadline=None)
@given(s=TEXTS)
def test_wordpiece_outputs_closed_over_vocab(s):
    """Every emitted piece is a vocab entry (or [UNK]); continuations
    carry ## and never start a word; tokenization is deterministic."""
    tok = WordPieceTokenizer(VOCAB)
    out = tok.tokenize(s)
    assert out == tok.tokenize(s)
    vocab = set(VOCAB)
    for t in out:
        assert t in vocab, (s, t)
    # lossless-rejoin law: without [UNK], merging pieces (strip ##, new
    # word at each non-## piece) reproduces the basic pretokenization
    if "[UNK]" not in out:
        from rottnest_spark.indices.tokenizers import _basic_pretokenize

        rejoined = "".join(
            t[2:] if t.startswith("##") else " " + t for t in out
        ).split()
        assert rejoined == _basic_pretokenize(s), (s, out)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(TEXTS, min_size=1, max_size=5))
def test_wordpiece_udf_equals_driver(spark, texts):
    tok = WordPieceTokenizer(VOCAB)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    got = {
        r["id"]: list(r["toks"])
        for r in df.select(
            "id", tok.tokens_col(F.col("text")).alias("toks")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == tok.tokenize(t), t
