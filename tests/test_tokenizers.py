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


def test_wordpiece_vocab_file_roundtrips_through_catalog(tmp_path):
    """The reference accepts a tokenizer artifact file
    (src/lava/tokenizer_utils.rs:14-80); building from a vocab.txt path
    records that path in the catalog config so index_from_config can
    reconstruct the tokenizer — and the md5 ident guard rejects a vocab
    file that changed since build."""
    from rottnest_spark.indices import index_from_config

    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(TOY_VOCAB) + "\n")
    tok = WordPieceTokenizer(str(vocab_file))
    assert tok.ident == WordPieceTokenizer(TOY_VOCAB).ident  # path ≡ list
    cfg = BM25Index(tokenizer=tok).config()
    assert cfg["tokenizer_vocab_path"] == str(vocab_file)

    back = index_from_config("bm25", cfg)
    assert isinstance(back.tokenizer, WordPieceTokenizer)
    assert back.tokenizer.ident == tok.ident
    assert back.tokenizer.tokenize("unaffable") == ["un", "##aff", "##able"]

    # vocab file mutated since build → loud refusal, never silent mis-score
    vocab_file.write_text("\n".join(TOY_VOCAB[:-3]) + "\n")
    with pytest.raises(ValueError, match="vocab file changed"):
        index_from_config("bm25", cfg)


def test_maintenance_skips_unreconstructable_combo(spark, tmp_path):
    """ADVICE round-4: one WordPiece BM25 index (vocab supplied as a list,
    so not reconstructable) must NOT make refresh_indices()/optimize()
    fail — the combo is skipped with a report entry and every other combo
    still gets maintained."""
    from rottnest_spark.indices.exact import ExactIndex

    docs = [(i, f"hello doc {i} merge sort") for i in range(8)]
    data = str(tmp_path / "d")
    spark.createDataFrame(docs, "doc_id int, text string").repartition(
        2
    ).write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "i"))
    lake.build_index(BM25Index(tokenizer=WordPieceTokenizer(TOY_VOCAB)), "text")
    lake.build_index(ExactIndex(), "doc_id")

    # churn: append new rows so both combos have uncovered files
    lake.append(spark.createDataFrame(
        [(100, "new row merge"), (101, "another hello")],
        "doc_id int, text string",
    ))
    with pytest.warns(UserWarning, match="bm25:text"):
        rep = lake.refresh_indices()
    assert "bm25:text" in rep["skipped"]
    assert "exact:doc_id" in rep["built"]  # the healthy combo refreshed

    rep2 = lake.optimize(target_rows=1_000_000)
    assert "bm25:text" in rep2["skipped"]

    # and with a vocab FILE the same flow round-trips with no skips
    vocab_file = tmp_path / "vocab.txt"
    vocab_file.write_text("\n".join(TOY_VOCAB) + "\n")
    data2 = str(tmp_path / "d2")
    spark.createDataFrame(docs, "doc_id int, text string").repartition(
        2
    ).write.parquet(data2)
    lake2 = ParquetLake(spark, data2, str(tmp_path / "i2"))
    lake2.build_index(
        BM25Index(tokenizer=WordPieceTokenizer(str(vocab_file))), "text"
    )
    lake2.append(spark.createDataFrame(
        [(200, "fresh hello parts")], "doc_id int, text string"
    ))
    rep3 = lake2.refresh_indices()
    assert rep3["skipped"] == {}
    assert "bm25:text" in rep3["built"]
    # the refreshed index answers queries (probe-compatible rebuild)
    got = bm25_topk(
        lake2,
        BM25Index(tokenizer=WordPieceTokenizer(str(vocab_file))),
        "text", "hello", k=9, id_col="doc_id",
    )
    assert 200 in {r["doc_id"] for r in got.collect()}


def _tokenizer_json(path, vocab, **model_extra):
    """Write a minimal HF-format tokenizer.json (model.vocab map)."""
    import json

    doc = {
        "version": "1.0",
        "model": {
            "type": "WordPiece",
            "unk_token": "[UNK]",
            "continuing_subword_prefix": "##",
            "max_input_chars_per_word": 100,
            "vocab": {t: i for i, t in enumerate(vocab)},
            **model_extra,
        },
    }
    with open(path, "w") as fh:
        json.dump(doc, fh)
    return str(path)


def test_tokenizer_json_loads_and_matches_vocab_txt(tmp_path):
    """The HF tokenizer.json export tokenizes identically to the same
    vocab given as a list / vocab.txt (mirrors the reference accepting a
    serialized HF tokenizer, src/lava/tokenizer_utils.rs:14-80)."""
    p = _tokenizer_json(tmp_path / "tokenizer.json", TOY_VOCAB)
    tj = WordPieceTokenizer(p)
    tv = WordPieceTokenizer(TOY_VOCAB, max_chars=100)
    for s in ["unaffable", "Hello, RUNning.", "unzzz", "parts merge sort"]:
        assert tj.tokenize(s) == tv.tokenize(s)
    assert tj.vocab_path == p  # round-trips through the catalog config
    assert tj.max_chars == 100  # model knob honored
    # non-WordPiece models refuse loudly
    import json

    bad = tmp_path / "bpe.json"
    with open(bad, "w") as fh:
        json.dump({"model": {"type": "BPE", "vocab": {"a": 0}}}, fh)
    with pytest.raises(ValueError, match="WordPiece"):
        WordPieceTokenizer(str(bad))
    # knobs change behavior AND identity
    p2 = _tokenizer_json(
        tmp_path / "t2.json", TOY_VOCAB, continuing_subword_prefix="++"
    )
    t2 = WordPieceTokenizer(p2)
    assert t2.tokenize("unaffable") == ["[UNK]"]  # '##aff' absent under ++
    assert t2.ident != tj.ident


def test_bm25_tokenizer_json_end_to_end(spark, tmp_path):
    """build + search with a tokenizer.json artifact hash-matches the
    full-scan scoring, and the artifact round-trips through the catalog
    (ident guard catches a swapped file)."""
    p = _tokenizer_json(tmp_path / "tokenizer.json", TOY_VOCAB)
    docs = [
        (0, "unaffable hello parts"),
        (1, "merge sort fast table"),
        (2, "hello hello running spark"),
        (3, "batch parts key scan slow"),
    ]
    data = str(tmp_path / "d")
    spark.createDataFrame(docs, "doc_id int, text string").repartition(
        2
    ).write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "i"))
    tok = WordPieceTokenizer(p)
    idx = BM25Index(tokenizer=tok)
    assert lake.build_index(idx, "text")
    entry = lake.catalog.entries_for("bm25", "text")[0]
    assert tok.ident in entry["config"]
    assert "tokenizer.json" in entry["config"]  # artifact path persisted

    q = "hello parts"
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(lake, idx, "text", q, k=3, id_col="doc_id").collect()
    }
    from rottnest_spark.indices.bm25 import derive_stats, score_rows

    raw = spark.read.parquet(data)
    stats = derive_stats(
        raw, "text", tok.query_tokens(q), tok_col_fn=tok.tokens_col
    )
    want = {
        r["doc_id"]: r["score"]
        for r in score_rows(
            raw, "text", tok.query_tokens(q), *stats,
            id_col="doc_id", k=3, tok_col_fn=tok.tokens_col,
        ).collect()
    }
    assert got == want

    # maintenance-time reload works from the persisted ident + artifact;
    # the md5 guard rejects a swapped artifact
    import json as _json

    cfg = _json.loads(entry["config"])
    reloaded = BM25Index(
        tokenizer=cfg["tokenizer"], tokenizer_vocab_path=p
    )
    assert reloaded.tokenizer.ident == tok.ident
    _tokenizer_json(tmp_path / "tokenizer.json", TOY_VOCAB[:-1])
    with pytest.raises(ValueError):
        BM25Index(tokenizer=cfg["tokenizer"], tokenizer_vocab_path=p)


# --- byte-level BPE (GPT-2 family tokenizer.json) ---------------------------


def _bpe_json(path, merges, vocab=None, pre_type="ByteLevel", mtype="BPE"):
    """Minimal HF-format BPE tokenizer.json (model.merges + ByteLevel)."""
    import json

    doc = {
        "model": {
            "type": mtype,
            "vocab": {v: i for i, v in enumerate(vocab or [])},
            "merges": merges,
        },
        "pre_tokenizer": {"type": pre_type},
    }
    with open(path, "w") as fh:
        json.dump(doc, fh)
    return str(path)


#: GPT-2-style merge ladder: "hello" assembles fully, " world" (Ġworld)
#: assembles fully, "spark" stays characters (no merges for it)
BPE_MERGES = [
    "h e", "he l", "hel l", "hell o",
    "Ġ w", "Ġw o", "Ġwo r", "Ġwor l", "Ġworl d",
]


def test_bpe_reference_example(tmp_path):
    from rottnest_spark.indices.tokenizers import BPETokenizer

    p = _bpe_json(tmp_path / "bpe.json", BPE_MERGES)
    tok = BPETokenizer(p)
    # space maps to Ġ (GPT-2 byte map); merges assemble the two words
    assert tok.tokenize("hello world") == ["hello", "Ġworld"]
    # unmergeable word stays per-character; leading space sticks to it
    assert tok.tokenize("hello spark") == ["hello", "Ġ", "s", "p", "a", "r", "k"]
    # case-sensitive: no lowercase step in byte-level BPE
    assert tok.tokenize("Hello") == ["H", "e", "l", "l", "o"]
    # non-ascii round-trips through the byte map without KeyError
    assert tok.tokenize("café")


def test_bpe_merges_list_pairs_format(tmp_path):
    """Newer HF exports serialize merges as [a, b] pairs, not 'a b'."""
    from rottnest_spark.indices.tokenizers import BPETokenizer

    p = _bpe_json(
        tmp_path / "bpe.json", [m.split(" ") for m in BPE_MERGES]
    )
    tok = BPETokenizer(p)
    assert tok.tokenize("hello world") == ["hello", "Ġworld"]


def test_bpe_tokens_col_agrees_with_driver(spark, tmp_path):
    from rottnest_spark.indices.tokenizers import BPETokenizer

    p = _bpe_json(tmp_path / "bpe.json", BPE_MERGES)
    tok = BPETokenizer(p)
    texts = ["hello world", "Hello spark!", None, "", "world hello world"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i int, text string"
    )
    got = {
        r.i: r.toks
        for r in df.select("i", tok.tokens_col("text").alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == (tok.tokenize(t) if t is not None else [])


def test_bpe_refusals(tmp_path):
    from rottnest_spark.indices.tokenizers import (
        BPETokenizer,
        tokenizer_from_json,
    )

    with pytest.raises(ValueError, match="ByteLevel"):
        BPETokenizer(
            _bpe_json(tmp_path / "ms.json", BPE_MERGES, pre_type="Metaspace")
        )
    with pytest.raises(ValueError, match="BPE"):
        BPETokenizer(
            _bpe_json(tmp_path / "u.json", BPE_MERGES, mtype="Unigram")
        )
    with pytest.raises(ValueError, match="merges"):
        BPETokenizer(_bpe_json(tmp_path / "e.json", []))
    with pytest.raises(ValueError, match="unsupported"):
        tokenizer_from_json(
            _bpe_json(tmp_path / "u2.json", BPE_MERGES, mtype="Unigram")
        )


def test_tokenizer_from_json_dispatch(tmp_path):
    from rottnest_spark.indices.tokenizers import (
        BPETokenizer,
        tokenizer_from_json,
    )

    bpe = tokenizer_from_json(_bpe_json(tmp_path / "b.json", BPE_MERGES))
    assert isinstance(bpe, BPETokenizer)
    wp = tokenizer_from_json(_tokenizer_json(tmp_path / "w.json", TOY_VOCAB))
    assert isinstance(wp, WordPieceTokenizer)


def test_bpe_ident_tracks_merges(tmp_path):
    from rottnest_spark.indices.tokenizers import BPETokenizer

    a = BPETokenizer(_bpe_json(tmp_path / "a.json", BPE_MERGES))
    b = BPETokenizer(_bpe_json(tmp_path / "b.json", BPE_MERGES[:-1]))
    c = BPETokenizer(_bpe_json(tmp_path / "c.json", BPE_MERGES))
    assert a.ident != b.ident
    assert a.ident == c.ident  # content-addressed, not path-addressed
    assert a.ident.startswith("bpe:")


def test_bm25_bpe_end_to_end(spark, tmp_path):
    """build + search with a BPE tokenizer.json hash-matches the
    full-scan scoring, and the artifact round-trips through the catalog
    with the md5 ident guard."""
    from rottnest_spark.indices.tokenizers import BPETokenizer

    p = _bpe_json(tmp_path / "tokenizer.json", BPE_MERGES)
    docs = [
        (0, "hello world"),
        (1, "world world spark"),
        (2, "hello spark table"),
        (3, "merge sort window"),
    ]
    data = str(tmp_path / "d")
    spark.createDataFrame(docs, "doc_id int, text string").repartition(
        2
    ).write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "i"))
    tok = BPETokenizer(p)
    idx = BM25Index(tokenizer=tok)
    assert lake.build_index(idx, "text")
    entry = lake.catalog.entries_for("bm25", "text")[0]
    assert tok.ident in entry["config"]
    assert "tokenizer.json" in entry["config"]

    q = "hello world"
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(lake, idx, "text", q, k=3, id_col="doc_id").collect()
    }
    from rottnest_spark.indices.bm25 import derive_stats, score_rows

    raw = spark.read.parquet(data)
    stats = derive_stats(
        raw, "text", tok.query_tokens(q), tok_col_fn=tok.tokens_col
    )
    want = {
        r["doc_id"]: r["score"]
        for r in score_rows(
            raw, "text", tok.query_tokens(q), *stats,
            id_col="doc_id", k=3, tok_col_fn=tok.tokens_col,
        ).collect()
    }
    assert got == want

    # maintenance reload from persisted ident + artifact; swapped-file guard
    import json as _json

    cfg = _json.loads(entry["config"])
    reloaded = BM25Index(tokenizer=cfg["tokenizer"], tokenizer_vocab_path=p)
    assert reloaded.tokenizer.ident == tok.ident
    _bpe_json(tmp_path / "tokenizer.json", BPE_MERGES[:-1])
    with pytest.raises(ValueError):
        BM25Index(tokenizer=cfg["tokenizer"], tokenizer_vocab_path=p)
