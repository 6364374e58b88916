"""Property-based tests (hypothesis): the §0 invariant under generated
queries, and pure-function laws the engines must share."""

import re

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rottnest_spark import ParquetLake
from rottnest_spark.indices.logcloud import type_bitmask
from rottnest_spark.indices.substring import SubstringIndex
from rottnest_spark.ops.dedup import _mh_coeffs, _MH_MOD

# words drawn from the fixture vocabulary + noise that is NOT in any doc
WORDS = st.sampled_from(
    "merge sort spark window table value part hash batch zzqq qxj notinvocab".split()
)


@pytest.fixture(scope="module")
def sub_lake(spark, docs_lake_dir_module):
    lake = ParquetLake(spark, docs_lake_dir_module, docs_lake_dir_module + "_idx")
    idx = SubstringIndex()
    lake.build_index(idx, "text")
    return lake, idx


@pytest.fixture(scope="module")
def docs_lake_dir_module(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("propdocs") / "lake")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .repartition(4)
        .write.parquet(out)
    )
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=st.lists(WORDS, min_size=1, max_size=3).map(" ".join))
def test_substring_search_equals_full_scan(spark, sub_lake, q):
    """§0 invariant for arbitrary word-combination queries (including ones
    matching nothing and ones shorter than the gram size)."""
    lake, idx = sub_lake
    got = sorted(
        r["doc_id"] for r in lake.search(idx, "text", q).select("doc_id").collect()
    )
    want = sorted(
        r["doc_id"]
        for r in lake.read()
        .filter(F.contains(F.lower("text"), F.lit(q.lower())))
        .select("doc_id")
        .collect()
    )
    assert got == want


@given(s=st.text(max_size=40))
def test_type_bitmask_is_union_of_char_classes(s):
    """bitmask(s) == OR of bitmask(c) for each char (reference
    logcloud_common.rs:9-24 classifies per char)."""
    acc = 0
    for c in s:
        acc |= type_bitmask(c)
    assert type_bitmask(s) == acc


@given(s=st.text(min_size=1, max_size=40))
def test_type_bitmask_superset_rule(s):
    """Any substring's type is a subset of the whole string's type — the
    property the logcloud search tiering relies on."""
    whole = type_bitmask(s)
    for i in range(len(s)):
        for j in range(i + 1, min(i + 8, len(s)) + 1):
            sub = type_bitmask(s[i:j])
            assert sub & whole == sub


@given(h=st.integers(min_value=0, max_value=_MH_MOD - 1))
def test_minhash_family_stays_in_range(h):
    ca, cb = _mh_coeffs(32)
    for a, b in zip(ca, cb):
        v = (a * h + b) % _MH_MOD
        assert 0 <= v < _MH_MOD
        assert a * h + b < 1 << 63  # no signed-64 overflow on either engine


@given(
    f1=st.floats(min_value=0.0, max_value=1.0),
    f2=st.floats(min_value=0.0, max_value=1.0),
)
@settings(max_examples=20, deadline=None)
def test_hash_sample_nesting_property(f1, f2):
    """Smaller fraction with the same seed is always a subset (pure bucket
    arithmetic — checked without Spark)."""
    from rottnest_spark.ops.sampling import BUCKETS

    import hashlib

    lo, hi = sorted((f1, f2))
    for i in range(200):
        h = int(
            hashlib.md5(f"sample:{i}".encode()).hexdigest()[:12], 16
        ) % BUCKETS
        if h < int(lo * BUCKETS):
            assert h < int(hi * BUCKETS)
