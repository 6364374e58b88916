"""Train/eval decontamination — flag training documents that share word
n-grams with an evaluation/benchmark corpus.

The standard pretraining hygiene pass (the n-gram-overlap method used for
GPT-3/PaLM-style decontamination): any training document containing a
long-enough n-gram from the eval set is suspect — near-duplicates of eval
items inflate benchmark scores without real capability.

100 TB shape:
- eval corpora are small (10²–10⁶ items): their distinct gram set is
  BROADCAST — the training corpus is never shuffled;
- the corpus side is one scan: explode gram positions (flat codegen
  `concat_ws(slice(...))`, no interpreted lambda per gram), broadcast hash
  join against the eval grams, partial-agg count per doc;
- output is one row per training doc (overlap count + flag), so the
  result is corpus-row-scale, not gram-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _words(col):
    """Lower-cased alnum word array, same tokenization as BM25/textstats."""
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda x: x != F.lit("")
    )


def _word_ngrams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, g): every word n-gram of every row, flat-position explode.

    The repartition is a materialization barrier: without it
    ProjectCollapse re-inlines the split into every downstream slice()
    and the text is re-tokenized per gram position (no CSE inside HOF
    lambdas — measured O(len²) blowup)."""
    words = df.select(
        F.col(id_col).alias("id"), _words(F.col(text_col)).alias("w")
    ).repartition(df.sparkSession.sparkContext.defaultParallelism)
    return (
        words.filter(F.size("w") >= n)
        .select(
            "id",
            "w",
            F.explode(F.sequence(F.lit(1), F.size("w") - F.lit(n - 1))).alias(
                "i"
            ),
        )
        .select(
            "id",
            F.concat_ws(" ", F.slice(F.col("w"), F.col("i"), n)).alias("g"),
        )
    )


def ngram_overlap(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    eval_text_col: str | None = None,
    n: int = 5,
    min_hits: int = 1,
) -> DataFrame:
    """One row per training doc: (id, n_overlap, contaminated).

    n_overlap = distinct eval n-grams the doc contains; contaminated =
    n_overlap >= min_hits. Docs with zero overlap are included (count 0) so
    the output is a complete audit, not a hit list."""
    eval_grams = (
        _word_ngrams(eval_df, id_col, eval_text_col or text_col, n)
        .select("g")
        .distinct()
    )
    hits = (
        _word_ngrams(train, id_col, text_col, n)
        .join(F.broadcast(eval_grams), "g", "semi")
        .groupBy("id")
        .agg(F.count_distinct("g").alias("n_overlap"))
    )
    return (
        train.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )
