"""Regex-accelerated search (required-literal extraction) + PII redaction."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark import ParquetLake
from rottnest_spark.indices.base import BRUTE_FORCE
from rottnest_spark.indices.substring import (
    RegexSearch,
    SubstringIndex,
    required_literal_runs,
)
from rottnest_spark.ops.redact import pii_counts, redact


@pytest.mark.parametrize(
    "pattern,want",
    [
        (r"merge\s+sort", ["merge", "sort"]),
        (r"(foo)?bar", ["bar"]),            # optional group ignored
        (r"foo|bar", None),                  # top-level alternation: nothing required
        (r"ab+c", ["ab", "c"]),             # repeats break the run
        (r"ab*c", ["a", "c"]),
        (r"colou?r", ["colo", "r"]),
        (r"a\.b", ["a.b"]),                 # escaped metachar is a literal
        (r"x{2,3}y", ["x", "y"]),
        (r"x{0,3}y", ["y"]),
        (r"[0-9]+\.[0-9]", ["."]),
        (r"(a(b|c))d", ["d"]),              # nested group + inner | ignored
        (r"\bword\b", ["word"]),
        (r"^abc$", ["abc"]),
        (r"merge\s+(sort|join)", ["merge"]),
        (r".*", []),
    ],
)
def test_required_literal_runs(pattern, want):
    assert required_literal_runs(pattern) == want


def test_extraction_is_safe_on_random_matches():
    """Property: for strings that MATCH the pattern, every extracted run is
    contained — checked against concrete matching strings per pattern."""
    import re

    cases = {
        r"ab+c": ["abc", "abbbbc", "xxabbcyy"],
        r"colou?r": ["color", "colour", "my colour!"],
        r"(foo)?bar": ["bar", "foobar"],
        r"merge\s+(sort|join)": ["merge  join", "a merge\tsort b"],
        r"x{2,3}y": ["xxy", "xxxy"],
    }
    for pattern, matches in cases.items():
        runs = required_literal_runs(pattern)
        for s in matches:
            assert re.search(pattern, s), (pattern, s)
            for r in runs:
                assert r in s, (pattern, s, r)


def test_regex_search_equals_rlike_scan(spark, docs_lake_dir, tmp_path):
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    lake.build_index(SubstringIndex(), "text")  # regex reuses this index
    rx = RegexSearch()
    df = spark.read.parquet(docs_lake_dir)
    for pattern in [r"merge\s+sort", r"spark\s+(window|group)", r"zz+q"]:
        got = sorted(
            r["doc_id"]
            for r in lake.search(rx, "text", pattern).select("doc_id").collect()
        )
        want = sorted(
            r["doc_id"]
            for r in df.filter(F.col("text").rlike(pattern))
            .select("doc_id")
            .collect()
        )
        assert got == want, pattern


def test_regex_absent_literal_prunes_everything(spark, docs_lake_dir, tmp_path):
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    lake.build_index(SubstringIndex(), "text")
    rx = RegexSearch()
    paths = [
        e["index_path"] for e in lake.catalog.entries_for("substring", "text")
    ]
    cands = rx.search(spark, paths, r"qqzz\d+")
    assert cands is not BRUTE_FORCE and cands.count() == 0


def test_regex_wildcard_pattern_goes_brute_force(spark, docs_lake_dir, tmp_path):
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    lake.build_index(SubstringIndex(), "text")
    rx = RegexSearch()
    assert rx.search(spark, [], r"\d+\s\d+") is BRUTE_FORCE
    # and the lake still answers exactly via the scan path
    got = lake.search(rx, "text", r"sort\s+slow").count()
    want = (
        spark.read.parquet(docs_lake_dir)
        .filter(F.col("text").rlike(r"sort\s+slow"))
        .count()
    )
    assert got == want


def test_redact_and_counts(spark):
    rows = [
        (1, "write to alice.smith@corp.example.org today"),
        (2, "call +1 (555) 123-4567 or 555 987 6543"),
        (3, "server at 192.168.0.17 responded"),
        (4, "nothing sensitive here at all"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    c = {r["id"]: r for r in pii_counts(df, "doc_id", "text").collect()}
    assert c[1]["n_email"] == 1 and c[1]["has_pii"]
    assert c[2]["n_phone"] == 2 and c[2]["has_pii"]
    assert c[3]["n_ipv4"] == 1 and c[3]["has_pii"]
    assert not c[4]["has_pii"]
    red = {r["id"]: r["redacted"] for r in redact(df, "doc_id", "text").collect()}
    assert "[EMAIL]" in red[1] and "alice" not in red[1]
    assert red[2].count("[PHONE]") == 2 and "4567" not in red[2]
    assert "[IPV4]" in red[3] and "192.168" not in red[3]
    assert red[4] == rows[3][1]


def test_regex_config_mismatch_raises(spark, docs_lake_dir, tmp_path):
    """RegexSearch must honor the same build/probe config guard as the
    substring index it reuses."""
    lake = ParquetLake(spark, docs_lake_dir, str(tmp_path / "idx"))
    lake.build_index(SubstringIndex(gram=3), "text")
    with pytest.raises(ValueError, match="config"):
        lake.search(RegexSearch(gram=4), "text", r"merge\s+sort").collect()
