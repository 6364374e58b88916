"""X2 tokenizer contract: BM25's tokenizer is pluggable, its identity is
enforced by the catalog config guard, and exactness (indexed top-K ≡
full-scan scoring) holds for ANY tokenizer — wordpiece included."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark import ParquetLake
from rottnest_spark.indices.bm25 import BM25Index, bm25_topk
from rottnest_spark.indices.tokenizers import (
    RegexTokenizer,
    WordPieceTokenizer,
)

#: classic BERT wordpiece demo vocab + pieces for the fixture's word salad
TOY_VOCAB = [
    "[UNK]", "un", "##aff", "##able", "hello", ",", ".", "run", "##ning",
    "merge", "sort", "hash", "join", "window", "spark", "table", "batch",
    "part", "##s", "key", "value", "row", "scan", "fast", "slow", "agg",
    "the", "a", "line",
]


def test_wordpiece_reference_example():
    tok = WordPieceTokenizer(TOY_VOCAB)
    # the canonical example from the public BERT implementation
    assert tok.tokenize("unaffable") == ["un", "##aff", "##able"]
    # punctuation splits into its own tokens; case folds
    assert tok.tokenize("Hello, RUNning.") == [
        "hello", ",", "run", "##ning", ".",
    ]
    # unmatchable word -> [UNK] for the WHOLE word (not partial pieces)
    assert tok.tokenize("unzzz") == ["[UNK]"]
    # greedy longest-match-first: "parts" = "part" + "##s"
    assert tok.tokenize("parts") == ["part", "##s"]


def test_wordpiece_ident_tracks_vocab():
    a = WordPieceTokenizer(TOY_VOCAB)
    b = WordPieceTokenizer(TOY_VOCAB[:-1])
    assert a.ident != b.ident
    assert a.ident == WordPieceTokenizer(list(reversed(TOY_VOCAB))).ident


def test_tokens_col_agrees_with_driver_tokenize(spark):
    tok = WordPieceTokenizer(TOY_VOCAB)
    texts = [
        "unaffable hello",
        "Merge Sort, fast!",
        "the parts running",
        "",
        None,
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id int, text string"
    )
    got = {
        r["id"]: list(r["toks"])
        for r in df.select("id", tok.tokens_col(F.col("text")).alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == (tok.tokenize(t) if t is not None else []), t


def test_bm25_wordpiece_end_to_end(spark, tmp_path):
    """Indexed top-K under a wordpiece tokenizer equals the self-contained
    full-scan scoring (BM25Index.brute_force) — the tokenizer changes
    stats and scores, never the exactness machinery."""
    docs = [
        (0, "unaffable hello parts"),
        (1, "merge sort fast table"),
        (2, "hello hello running spark"),
        (3, "the a line value row"),
        (4, "batch parts key scan slow"),
        (5, "sort merge join window"),
    ]
    data = str(tmp_path / "d")
    spark.createDataFrame(docs, "doc_id int, text string").repartition(
        2
    ).write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "i"))
    tok = WordPieceTokenizer(TOY_VOCAB)
    idx = BM25Index(tokenizer=tok)
    assert lake.build_index(idx, "text")
    # index config records the wordpiece ident
    entry = lake.catalog.entries_for("bm25", "text")[0]
    assert tok.ident in entry["config"]

    q = "hello parts"
    got = bm25_topk(lake, idx, "text", q, k=3, id_col="doc_id")
    got_rows = {r["doc_id"]: r["score"] for r in got.collect()}

    # recompute with full-scan stats under the SAME tokenizer
    from rottnest_spark.indices.bm25 import derive_stats, score_rows

    raw = spark.read.parquet(data)
    stats = derive_stats(raw, "text", tok.query_tokens(q), tok_col_fn=tok.tokens_col)
    scored = score_rows(
        raw, "text", tok.query_tokens(q), *stats,
        id_col="doc_id", k=3, tok_col_fn=tok.tokens_col,
    )
    want_rows = {r["doc_id"]: r["score"] for r in scored.collect()}
    assert got_rows == want_rows
    # wordpiece semantics visible: doc 0 matches "parts" via part+##s and
    # so does doc 4 — both must be in the candidate/scored universe
    assert {0, 4} <= set(
        r["doc_id"]
        for r in bm25_topk(lake, idx, "text", "parts", k=6, id_col="doc_id").collect()
    )


def test_tokenizer_mismatch_fails_config_guard(spark, tmp_path):
    docs = [(0, "hello world"), (1, "merge sort")]
    data = str(tmp_path / "d")
    spark.createDataFrame(docs, "doc_id int, text string").coalesce(
        1
    ).write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "i"))
    wp = BM25Index(tokenizer=WordPieceTokenizer(TOY_VOCAB))
    lake.build_index(wp, "text")
    with pytest.raises(ValueError, match="config"):
        bm25_topk(lake, BM25Index(), "text", "hello", k=2, id_col="doc_id")


def test_index_from_config_roundtrip_and_wordpiece_guard():
    from rottnest_spark.indices import index_from_config

    back = index_from_config("bm25", BM25Index().config())
    assert isinstance(back.tokenizer, RegexTokenizer)
    assert back.config() == BM25Index().config()
    wp_cfg = BM25Index(tokenizer=WordPieceTokenizer(TOY_VOCAB)).config()
    with pytest.raises(ValueError, match="Tokenizer instance"):
        index_from_config("bm25", wp_cfg)
