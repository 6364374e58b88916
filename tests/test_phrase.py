"""Token-boundary phrase search over the shared substring index."""

import pytest
from pyspark.sql import functions as F

from rottnest_spark.core.lake import ParquetLake
from rottnest_spark.indices.substring import PhraseSearch, SubstringIndex


@pytest.fixture()
def phrase_df(spark):
    rows = [
        (0, "quick merge sort beats bubble"),
        (1, "we emerge sorted and happy"),      # substring hit, phrase miss
        (2, "Merge,  SORT! (punctuated)"),      # boundaries + case
        (3, "merge join and sort merge"),       # tokens present, not adjacent
        (4, "mergesort as one word"),           # no boundary at all
        (5, None),
    ]
    return spark.createDataFrame(rows, "id bigint, text string")


def test_phrase_token_boundaries(phrase_df):
    got = sorted(
        r["id"]
        for r in PhraseSearch()
        .brute_force(phrase_df, "text", "merge sort", None)
        .collect()
    )
    assert got == [0, 2]


def test_phrase_vs_substring_semantics(phrase_df):
    """'emerge sorted' contains the substring 'merge sort' but not the
    phrase — the two predicates genuinely differ."""
    sub = sorted(
        r["id"]
        for r in SubstringIndex()
        .brute_force(phrase_df, "text", "merge sort", None)
        .collect()
    )
    assert 1 in sub and 1 not in (0, 2)


def test_phrase_probe_grams_union_of_tokens():
    p = PhraseSearch()
    grams = p.query_grams("merge sort")
    assert "mer" in grams and "sor" in grams
    # the boundary-crossing gram of the raw string must NOT be required
    # (tokens may be separated by arbitrary non-alphanumerics)
    assert "e s" not in grams
    # short tokens contribute no grams; all-short phrase → BRUTE_FORCE path
    assert p.query_grams("a of to") == []


def test_phrase_search_through_lake(spark, tmp_path, phrase_df):
    data = str(tmp_path / "data")
    phrase_df.repartition(2).write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "idx"))
    lake.build_index(SubstringIndex(), "text")
    got = sorted(
        r["id"] for r in lake.search(PhraseSearch(), "text", "merge sort").collect()
    )
    assert got == [0, 2]
    # absence proof: a phrase with an unseen token touches no data
    assert lake.search(PhraseSearch(), "text", "zzzgram sort").count() == 0


def test_skip_chars_normalization(spark, tmp_path):
    """F7: with a SKIP set, punctuation variations don't break containment
    — build and probe normalize identically (knob recorded in config)."""
    rows = [
        (0, "foo, bar baz"),
        (1, "foo bar qux"),
        (2, "FOO.BAR"),
        (3, "unrelated text entirely"),
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    data = str(tmp_path / "data")
    df.coalesce(1).write.parquet(data)
    from rottnest_spark.core.lake import ParquetLake

    lake = ParquetLake(spark, data, str(tmp_path / "idx"))
    idx = SubstringIndex(skip_chars=",. ")
    lake.build_index(idx, "text")
    got = sorted(r["id"] for r in lake.search(idx, "text", "foo bar").collect())
    assert got == [0, 1, 2]  # "foo, bar", "foo bar", "FOO.BAR" all normalize
    # default index is unchanged: punctuation is significant
    plain = SubstringIndex()
    got_plain = sorted(
        r["id"] for r in plain.brute_force(df, "text", "foo bar", None).collect()
    )
    assert got_plain == [1]


def test_phrase_and_disj_null_semantics(spark, tmp_path):
    """NULL text rows never match a phrase, and never surface through an
    OR of predicates (SQL three-valued logic: null OR false -> filtered)."""
    from rottnest_spark.core.lake import ParquetLake
    from rottnest_spark.indices.exact import ExactIndex

    df = spark.createDataFrame(
        [(0, "merge sort here", 1), (1, None, 2), (2, "nothing", None)],
        "id bigint, text string, grp bigint",
    )
    got = sorted(
        r["id"]
        for r in PhraseSearch().brute_force(df, "text", "merge sort", None).collect()
    )
    assert got == [0]
    data = str(tmp_path / "d")
    df.coalesce(1).write.parquet(data)
    lake = ParquetLake(spark, data, str(tmp_path / "i"))
    sub, ex = SubstringIndex(), ExactIndex()
    lake.build_index(sub, "text")
    lake.build_index(ex, "grp")
    got2 = sorted(
        r["id"]
        for r in lake.search_disj(
            [(sub, "text", "merge sort"), (ex, "grp", 2)]
        ).collect()
    )
    assert got2 == [0, 1]  # null text row still matches via its grp
