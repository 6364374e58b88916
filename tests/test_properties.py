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


# ---- round-3 operator laws ------------------------------------------------

EVENT_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),          # user
        st.integers(min_value=0, max_value=50),         # minute offset
        st.sampled_from(["view", "click", "buy"]),      # type
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=EVENT_ROWS)
def test_funnel_matches_python_oracle(spark, rows):
    """Distributed funnel == per-user sequential scan; counts never
    increase along the funnel."""
    from rottnest_spark.ops.analytics import funnel

    data = [
        (u, f"2024-01-01 10:{m:02d}:00", t) for (u, m, t) in rows
    ]
    df = spark.createDataFrame(
        data, "user_id long, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    steps = ["view", "click", "buy"]
    got = {
        r["step"]: r["n_users"]
        for r in funnel(df, "user_id", "ts", "event_type", steps).collect()
    }

    # python oracle: earliest qualifying time per stage, strictly increasing
    def reaches(events, steps):
        count = [0] * len(steps)
        by_user = {}
        for u, ts, t in sorted(data):
            by_user.setdefault(u, []).append((ts, t))
        for u, evs in by_user.items():
            evs.sort()
            t_prev = None
            for i, s in enumerate(steps):
                cand = [
                    ts for ts, t in evs
                    if t == s and (t_prev is None or ts > t_prev)
                ]
                if not cand:
                    break
                t_prev = min(cand)
                count[i] += 1
        return count

    want = reaches(data, steps)
    assert [got.get(s, 0) for s in steps] == want
    assert all(
        got.get(steps[i], 0) >= got.get(steps[i + 1], 0)
        for i in range(len(steps) - 1)
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),   # join key
            st.integers(min_value=0, max_value=99),  # payload / salt source
        ),
        min_size=0,
        max_size=30,
    ),
    dims=st.lists(
        st.integers(min_value=0, max_value=6), min_size=0, max_size=8
    ),
    salts=st.integers(min_value=1, max_value=5),
)
def test_salted_join_equals_plain_join(spark, pairs, dims, salts):
    from rottnest_spark.ops.colocate import salted_join

    big = spark.createDataFrame(
        [(k, p) for k, p in pairs] or [(99, 0)], "k long, payload long"
    )
    small = spark.createDataFrame(
        [(k, k * 10) for k in set(dims)] or [(98, 0)], "k long, dim long"
    )
    got = sorted(
        map(tuple, salted_join(big, small, ["k"], "payload", salts).collect())
    )
    want = sorted(map(tuple, big.join(small, ["k"]).collect()))
    assert got == want


@pytest.fixture(scope="module")
def bloom_lake(spark, docs_lake_dir_module):
    from rottnest_spark.indices.bloom import BloomIndex

    lake = ParquetLake(
        spark, docs_lake_dir_module, docs_lake_dir_module + "_bloomidx"
    )
    idx = BloomIndex(m_bits=1 << 16, k_hashes=4)
    lake.build_index(idx, "doc_id")
    paths = [
        e["index_path"] for e in lake.catalog.entries_for("bloom", "doc_id")
    ]
    present = {
        r[0]
        for r in spark.read.parquet(docs_lake_dir_module)
        .select("doc_id")
        .collect()
    }
    return spark, idx, paths, present, docs_lake_dir_module


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(key=st.integers(min_value=-100, max_value=2000))
def test_bloom_never_false_negative(bloom_lake, key):
    """For ANY key: if present, the bloom candidates include every file
    holding it (search through the lake equals the full scan)."""
    spark, idx, paths, present, lake_dir = bloom_lake
    cands = idx.search(spark, paths, key)
    from rottnest_spark.indices.base import BRUTE_FORCE

    if key in present:
        assert cands is BRUTE_FORCE or cands.count() >= 1
    # exactness through refine regardless of membership
    got = (
        spark.read.parquet(lake_dir)
        .filter(F.col("doc_id") == key)
        .count()
    )
    assert got == (1 if key in present else 0)


# -- CDC merge laws ----------------------------------------------------------

_OPS = st.sampled_from(["U", "D", "I"])


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    changes=st.lists(
        st.tuples(st.integers(0, 30), _OPS, st.integers(1, 5)),
        min_size=1,
        max_size=25,
    )
)
def test_merge_changes_equals_sequential_apply(spark, changes):
    """merge_changes(target, feed) ≡ applying the feed one change at a
    time in seq order (ties: latest_changes' documented tie-break) — the
    defining law of latest-wins CDC."""
    from rottnest_spark.ops.merge import merge_changes

    target_rows = {k: f"v{k}" for k in range(0, 20)}
    # make (key, seq) unique like a real CDC feed: keep the LAST change
    # per (key, seq) slot in feed order (upstream log compaction)
    slot: dict = {}
    for k, op, seq in changes:
        slot[(k, seq)] = op
    feed = [
        (k, f"p{k}s{seq}" if op != "D" else None, seq, op)
        for (k, seq), op in slot.items()
    ]
    # sequential reference apply, seq ascending (stable within equal seq
    # is irrelevant once (key, seq) is unique)
    state = dict(target_rows)
    for k, v, seq, op in sorted(feed, key=lambda r: r[2]):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    target = spark.createDataFrame(
        [(k, v) for k, v in target_rows.items()], "k bigint, v string"
    )
    ch = spark.createDataFrame(feed, "k bigint, v string, seq bigint, op string")
    got = {
        r["k"]: r["v"] for r in merge_changes(target, ch, ["k"]).collect()
    }
    assert got == state
