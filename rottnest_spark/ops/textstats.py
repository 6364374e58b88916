"""Text-analysis operators for training-data pipelines.

Four operator families over a (id, text) DataFrame, all single-pass
Catalyst expressions (no UDFs, no shuffle — every one is a narrow
projection, so they compose with any scan for free at 100 TB):

- token_stats       whitespace token count, BPE-ish regex piece count,
                    char count, mean token length
- quality_signals   Gopher-style filter signals: punctuation ratio, digit
                    ratio, English-stopword ratio, mean word length, plus a
                    boolean `keep` under documented thresholds
- lang_id           stopword-profile language ID (en/de/fr/es) + CJK char
                    detection (zh); deterministic fixed precedence on ties
- fingerprints      (a) content_fp: md5 of whitespace-normalized lowercase
                    text (exact-dup key robust to spacing); (b) winnow_fp:
                    bottom-k sketch of word 4-gram md5 hashes (k smallest,
                    sorted, joined) — near-dup docs share most sketch
                    elements; a SQL-friendly stand-in for rolling-hash
                    winnowing with the same downstream use

Everything is md5/regex-based so the DuckDB oracles in entrypoints.py
reproduce results exactly (note: DuckDB regexp_replace needs the 'g' flag
to match Spark's global-by-default behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# small public stopword profiles; enough signal for a coarse heuristic ID
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "que", "por"],
}
# BPE-ish pieces: alphanumeric runs OR single non-space symbols — the same
# shape a byte-level BPE pre-tokenizer produces before merges
BPE_PIECE_RE = "[a-z0-9]+|[^a-z0-9\\s]"
MIN_CHARS, MIN_MEAN_LEN, MAX_MEAN_LEN = 50, 2.0, 12.0
MIN_STOPWORD_RATIO, MAX_PUNCT_RATIO = 0.02, 0.2
WINNOW_K, WINNOW_N = 4, 4


def _toks(col: str) -> str:
    return f"split(lower({col}), ' ')"


def token_stats(df: DataFrame, id_col: str, col: str) -> DataFrame:
    toks = _toks(col)
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(f"size({toks})").alias("n_tokens_ws"),
        # double the backslash: Spark SQL string literals consume one level
        F.expr(
            f"size(regexp_extract_all(lower({col}), "
            f"'{BPE_PIECE_RE.replace(chr(92), chr(92) * 2)}', 0))"
        ).alias("n_tokens_bpe"),
        F.length(col).alias("n_chars"),
        F.round(
            F.expr(
                f"aggregate({toks}, 0, (a, t) -> a + length(t)) / size({toks})"
            ),
            4,
        ).alias("mean_token_len"),
    )


def quality_signals(df: DataFrame, id_col: str, col: str) -> DataFrame:
    """Gopher-rule-style keep/drop signals. `keep` thresholds documented in
    module constants; every ratio is also returned so downstream pipelines
    can re-threshold without recompute."""
    toks = _toks(col)
    sw = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    punct = (
        f"length(regexp_replace(lower({col}), '[a-z0-9 ]', '')) / length({col})"
    )
    digit = f"length(regexp_replace({col}, '[^0-9]', '')) / length({col})"
    stop = (
        f"size(filter({toks}, t -> array_contains(array({sw}), t))) / size({toks})"
    )
    mean_len = f"aggregate({toks}, 0, (a, t) -> a + length(t)) / size({toks})"
    out = df.select(
        F.col(id_col).alias("id"),
        F.length(col).alias("n_chars"),
        F.round(F.expr(punct), 4).alias("punct_ratio"),
        F.round(F.expr(digit), 4).alias("digit_ratio"),
        F.round(F.expr(stop), 4).alias("stopword_ratio"),
        F.round(F.expr(mean_len), 4).alias("mean_word_len"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_chars") >= MIN_CHARS)
        & (F.col("mean_word_len") >= MIN_MEAN_LEN)
        & (F.col("mean_word_len") <= MAX_MEAN_LEN)
        & (F.col("stopword_ratio") >= MIN_STOPWORD_RATIO)
        & (F.col("punct_ratio") <= MAX_PUNCT_RATIO),
    )


def lang_id(df: DataFrame, id_col: str, col: str) -> DataFrame:
    """Heuristic language ID: fraction of tokens in each language's
    stopword profile; CJK codepoint ratio decides zh. Deterministic tie
    precedence en > de > fr > es; 'und' when no profile reaches 2%."""
    toks = _toks(col)
    scores = {}
    for lang, words in STOPWORDS.items():
        sw = ", ".join(f"'{w}'" for w in words)
        scores[lang] = (
            f"size(filter({toks}, t -> array_contains(array({sw}), t)))"
            f" / size({toks})"
        )
    cjk = (
        f"length(regexp_replace({col}, '[^\\\\u4e00-\\\\u9fff]', ''))"
        f" / length({col})"
    )
    base = df.select(
        F.col(id_col).alias("id"),
        *[F.round(F.expr(expr), 4).alias(f"s_{lang}") for lang, expr in scores.items()],
        F.round(F.expr(cjk), 4).alias("s_zh"),
    )
    best = F.greatest(*[F.col(f"s_{lang}") for lang in STOPWORDS])
    pred = (
        F.when(F.col("s_zh") > 0.3, F.lit("zh"))
        .when(best < 0.02, F.lit("und"))
        .when(F.col("s_en") == best, F.lit("en"))
        .when(F.col("s_de") == best, F.lit("de"))
        .when(F.col("s_fr") == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return base.withColumn("pred_lang", pred)


REP_N = 3  # word n-gram size for the repetition signal
MAX_REP_RATIO = 0.2  # Gopher-style duplicate-3-gram cut


def repetition_signals(df: DataFrame, id_col: str, col: str) -> DataFrame:
    """Intra-document repetition (the Gopher 'repetition' filters' core
    signal): fraction of word 3-grams that are duplicates within the doc.
    Boilerplate, keyword-stuffed, and looping generations score high.

    Shape: bind the words array ONCE behind a repartition barrier, then a
    flat position explode + codegen'd slice/concat projection and one
    combine-enabled groupBy. An expression-only version (transform lambdas
    referencing the split inline) re-tokenizes per gram position — no CSE
    inside HOF lambdas — and measured ~10x slower at sf0.1."""
    spark = df.sparkSession
    words = df.select(
        F.col(id_col).alias("id"),
        F.expr(f"filter(split(lower({col}), '[^a-z0-9]+'), x -> x != '')").alias(
            "w"
        ),
    ).repartition(spark.sparkContext.defaultParallelism)
    grams = (
        words.filter(F.size("w") >= REP_N)
        .select(
            "id",
            "w",
            F.explode(
                F.sequence(F.lit(1), F.size("w") - F.lit(REP_N - 1))
            ).alias("i"),
        )
        .select(
            "id", F.concat_ws(" ", F.slice(F.col("w"), F.col("i"), REP_N)).alias("g")
        )
    )
    agg = grams.groupBy("id").agg(
        F.count(F.lit(1)).cast("int").alias("n_grams"),
        F.count_distinct("g").cast("int").alias("n_distinct_grams"),
    )
    n_grams = F.coalesce("n_grams", F.lit(0))
    n_distinct = F.coalesce("n_distinct_grams", F.lit(0))
    ratio = F.when(n_grams > 0, F.round(1.0 - n_distinct / n_grams, 4)).otherwise(
        F.lit(0.0)
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(agg, "id", "left")
        .select(
            "id",
            n_grams.alias("n_grams"),
            n_distinct.alias("n_distinct_grams"),
            ratio.alias("rep_ratio"),
            (ratio <= MAX_REP_RATIO).alias("keep_repetition"),
        )
    )


def fingerprints(df: DataFrame, id_col: str, col: str) -> DataFrame:
    """content_fp = md5 of the whitespace-normalized text; winnow_fp = the
    WINNOW_K smallest md5s of the WINNOW_N-word shingles (winnowing sketch).

    The normalized string and its word array are bound behind a repartition
    barrier first: with them inline, the transform lambda's slice() carries
    the whole split and the text is re-normalized/tokenized per shingle
    position (no CSE inside HOF lambdas — the repo's measured O(len²)
    pitfall)."""
    spark = df.sparkSession
    norm = f"trim(regexp_replace(lower({col}), '\\\\s+', ' '))"
    bound = df.select(
        F.col(id_col).alias("id"),
        F.expr(norm).alias("__norm__"),
        F.expr(f"split({norm}, ' ')").alias("__w__"),
    ).repartition(spark.sparkContext.defaultParallelism)
    shingles = (
        f"CASE WHEN size(__w__) >= {WINNOW_N} THEN "
        f"transform(sequence(1, size(__w__) - {WINNOW_N - 1}), "
        f"i -> concat_ws(' ', slice(__w__, i, {WINNOW_N}))) "
        f"ELSE array(__norm__) END"
    )
    winnow = (
        f"concat_ws(':', slice(array_sort(transform({shingles}, x -> md5(x))), "
        f"1, {WINNOW_K}))"
    )
    return bound.select(
        "id",
        F.expr("md5(__norm__)").alias("content_fp"),
        F.expr(winnow).alias("winnow_fp"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    col: str,
    chunk_tokens: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the prep step
    of an embedding/RAG pipeline (each chunk gets embedded and indexed with
    provenance back to its document).

    Whitespace tokenization (the repo's shingler convention); chunk i
    covers tokens [i·stride, i·stride + chunk_tokens), stride =
    chunk_tokens − overlap. The last chunk may be shorter; a document
    shorter than one chunk yields exactly one chunk. Emits
    (id, chunk_id, n_chunk_tokens, chunk_text).

    Pure codegen: split → explode(sequence) over chunk starts → slice +
    concat_ws. Rows fan out ~len/stride per doc with only the chunk text
    carried (the token array is consumed by the projection, not stored),
    so the op composes with any downstream embed/index pass at scale."""
    stride = chunk_tokens - overlap
    assert stride > 0, "overlap must be smaller than chunk_tokens"
    toks = F.split(F.lower(F.col(col)), " ")
    n = F.size(toks)
    # chunk starts: 1, 1+stride, ... ; at least one chunk even when empty
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1)
    ).cast("int")
    return (
        df.select(
            F.col(id_col),
            toks.alias("__tk__"),
            F.explode(
                F.sequence(F.lit(0), n_chunks - F.lit(1))
            ).alias("chunk_id"),
        )
        .select(
            id_col,
            "chunk_id",
            F.slice(
                F.col("__tk__"),
                F.col("chunk_id") * F.lit(stride) + F.lit(1),
                chunk_tokens,
            ).alias("__chunk__"),
        )
        .select(
            id_col,
            "chunk_id",
            F.size("__chunk__").alias("n_chunk_tokens"),
            F.concat_ws(" ", "__chunk__").alias("chunk_text"),
        )
    )


def unigram_logprob(
    df: DataFrame, id_col: str, col: str, round_to: int = 4
) -> DataFrame:
    """Corpus-unigram log-probability score per document (the CCNet-style
    statistical quality signal: documents whose tokens are improbable under
    the corpus unigram LM are gibberish/boilerplate outliers; well-formed
    text scores near the corpus mean).

    score = mean over the document's tokens of ln P(token), with
    P(token) = corpus_count(token) / corpus_total. Every token in the
    corpus has a count ≥ 1, so no smoothing is needed for self-scoring.

    Two aggregations: (1) corpus token counts (map-side combined groupBy),
    (2) per-doc mean of ln P after an equi-join of exploded tokens to the
    count table — both plain shuffles on the token key, no UDFs. At 100 TB
    the count table is vocabulary-scale; Spark broadcast-joins it when
    small and shuffle-joins otherwise — either plan is correct."""
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.lower(F.col(col)), " ")).alias("tok")
    )
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).persist()
    # corpus total from a NARROW scan (sum of per-doc token counts) — no
    # second pass over the persisted count table, no recomputed explode
    total = df.select(
        F.sum(F.size(F.split(F.lower(F.col(col)), " "))).alias("t")
    ).collect()[0]["t"]
    scored = toks.join(counts, "tok").select(
        id_col, (F.log(F.col("c") / F.lit(float(total)))).alias("lp")
    )
    return scored.groupBy(id_col).agg(
        F.round(F.avg("lp"), round_to).alias("unigram_logprob"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
