"""LogCloud analog: tiered search ≡ case-sensitive contains full scan,
type-masked variable pruning, template tier, compaction."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark import ParquetLake
from rottnest_spark.indices import BRUTE_FORCE
from rottnest_spark.indices.logcloud import LogIndex, digit_tokens, type_bitmask


@pytest.fixture(scope="module")
def events_lake(spark, sf_dir, tmp_path_factory):
    from rottnest_spark.sources.reader import read_parquet

    out = str(tmp_path_factory.mktemp("ev") / "lake")
    (
        read_parquet(spark, [f"{sf_dir}/events.parquet"])
        .repartition(5)
        .write.parquet(out)
    )
    return out


def oracle_ids(spark, lake_dir, q):
    return sorted(
        r[0]
        for r in spark.read.parquet(lake_dir)
        .filter(F.contains("props", F.lit(q)))
        .select("event_id")
        .collect()
    )


def _ids(df):
    return sorted(r[0] for r in df.select("event_id").collect())


def test_search_equals_full_scan(spark, events_lake, tmp_path):
    lake = ParquetLake(spark, events_lake, str(tmp_path / "idx"))
    idx = LogIndex()
    lake.build_index(idx, "props")
    for q in ['"k": 87', "87", '{"k": 5}', "no4040such", '"k":']:
        got = _ids(lake.search(idx, "props", q))
        assert got == oracle_ids(spark, events_lake, q), q


def test_template_tier_brute_forces(spark, events_lake, tmp_path):
    idx = LogIndex()
    # no digit token → cannot prune → flag-0 brute force
    assert idx.search(spark, [], '"k":') is BRUTE_FORCE
    assert idx.explain_query('"k":')["tier"] == "brute_force"
    assert idx.explain_query('"k": 87')["tier"] == "variables"


def test_absent_value_prunes_to_zero(spark, events_lake, tmp_path):
    lake = ParquetLake(spark, events_lake, str(tmp_path / "idx"))
    idx = LogIndex()
    lake.build_index(idx, "props")
    entry = lake.catalog.entries_for("logcloud", "props")[0]
    assert idx.search(spark, [entry["index_path"]], "zz40404zz").count() == 0


def test_type_bitmask_matches_reference_classes(spark):
    assert type_bitmask("123") == 1
    assert type_bitmask("1a") == 3      # digit + hex-lower
    assert type_bitmask("1aG") == 1 | 2 | 16
    assert type_bitmask("deadBEEF1") == 1 | 2 | 4
    assert digit_tokens('x9 y "k": 87') == ["87", "x9"]


def test_compaction_preserves_search(spark, events_lake, tmp_path):
    lake = ParquetLake(spark, events_lake, str(tmp_path / "idx"))
    idx = LogIndex()
    lake.build_index(idx, "props", binpack_row_threshold=1)
    assert len(lake.catalog.entries_for("logcloud", "props")) > 1
    q = '"k": 87'
    before = _ids(lake.search(idx, "props", q))
    lake.compact_indices(idx, "props", row_threshold=10_000_000)
    after = _ids(lake.search(idx, "props", q))
    assert before == after == oracle_ids(spark, events_lake, q)


def test_dict_tier_routing_stays_correct(spark, events_lake, tmp_path):
    """Aggressive dict routing (dict_frac=0) sends every variable to the
    dict tier -> search degrades to brute force but stays exact."""
    lake = ParquetLake(spark, events_lake, str(tmp_path / "idx"))
    idx = LogIndex(dict_frac=0.0)
    lake.build_index(idx, "props")
    entry = lake.catalog.entries_for("logcloud", "props")[0]
    # every digit token dict-routed -> flag-0 brute force
    assert idx.search(spark, [entry["index_path"]], '"k": 87') is BRUTE_FORCE
    for q in ['"k": 87', "no4040such"]:
        got = _ids(lake.search(idx, "props", q))
        assert got == oracle_ids(spark, events_lake, q), q


def test_dict_tier_shrinks_variables_table(spark, events_lake, tmp_path):
    """With default routing, near-ubiquitous values leave variables/."""
    lake0 = ParquetLake(spark, events_lake, str(tmp_path / "i0"))
    full = LogIndex(dict_frac=1.0)  # cap > total units -> nothing routed
    lake0.build_index(full, "props")
    e0 = lake0.catalog.entries_for("logcloud", "props")[0]
    n_full = spark.read.parquet(f"{e0['index_path']}/variables").count()

    lake1 = ParquetLake(spark, events_lake, str(tmp_path / "i1"))
    routed = LogIndex(dict_frac=0.4)
    lake1.build_index(routed, "props")
    e1 = lake1.catalog.entries_for("logcloud", "props")[0]
    n_routed = spark.read.parquet(f"{e1['index_path']}/variables").count()
    n_dict = spark.read.parquet(f"{e1['index_path']}/dict").count()
    assert n_dict > 0 and n_routed < n_full
    # and search is still exact
    q = '"k": 87'
    got = _ids(lake1.search(routed, "props", q))
    assert got == oracle_ids(spark, events_lake, q)


def test_search_many_equals_per_query(spark, sf_dir, tmp_path):
    """Batched LogIndex probe == N independent searches (incl. a
    non-anchorable query that must brute-force in both paths)."""
    import pyspark.sql.functions as F

    from rottnest_spark import ParquetLake
    from rottnest_spark.indices.logcloud import LogIndex

    out = str(tmp_path / "ev")
    spark.read.parquet(f"{sf_dir}/events.parquet").repartition(4).write.parquet(out)
    lake = ParquetLake(spark, out, str(tmp_path / "idx"))
    idx = LogIndex()
    lake.build_index(idx, "props")
    queries = ['"k": 87', '"k": 12', "nodigits"]
    batched = lake.search_many(idx, "props", queries).collect()
    by_q = {}
    for r in batched:
        by_q.setdefault(r["__query__"], set()).add(r["event_id"])
    for q in queries:
        want = {
            r["event_id"]
            for r in spark.read.parquet(out)
            .filter(F.contains("props", F.lit(q)))
            .collect()
        }
        assert by_q.get(q, set()) == want, q


# -- value-gram tier (round 11, the `.hawaii` analog) -----------------------
# The events fixture's 2-digit values are ubiquitous (all dict-routed,
# variables/ trivially empty), so the tier needs a log corpus with
# HIGH-CARDINALITY variables: synthetic lines carrying a per-row session
# id (~4k distinct type-1 values), a small user id space, and a constant
# year token that dict-routes.


@pytest.fixture(scope="module")
def synth_log_lake(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("lg") / "lake")
    (
        spark.range(4000)
        .selectExpr(
            "id AS line_id",
            "concat('ts=2024 lvl=INFO sess_', cast(10000 + id AS string),"
            " ' user u', cast(id % 37 AS string),"
            " ' op', cast(id % 1000 AS string)) AS line",
        )
        .repartition(6)
        .write.parquet(out)
    )
    return out


def _line_oracle(spark, lake_dir, q):
    return sorted(
        r[0]
        for r in spark.read.parquet(lake_dir)
        .filter(F.contains("line", F.lit(q)))
        .select("line_id")
        .collect()
    )


def _line_ids(df):
    return sorted(r[0] for r in df.select("line_id").collect())


def test_gram_tier_search_equals_full_scan(spark, synth_log_lake, tmp_path):
    """With the tier forced on (gram_tier_min=0 covers every vtype),
    search stays ≡ the case-sensitive contains oracle across token
    shapes — rare session ids, multi-token queries, absent values, and
    sub-GRAM tokens (which bypass the tier)."""
    lake = ParquetLake(spark, synth_log_lake, str(tmp_path / "idx"))
    idx = LogIndex(gram_tier_min=0)
    lake.build_index(idx, "line")
    for q in ["sess_10107", "u13 op", "sess_19999", "op998", "u7 "]:
        got = _line_ids(lake.search(idx, "line", q))
        assert got == _line_oracle(spark, synth_log_lake, q), q


def test_gram_tier_narrowing_ratio(spark, synth_log_lake, tmp_path):
    """The measured pruning-ratio win the tier exists for: on a rare
    session-id query the gram candidates are a tiny fraction of the
    compatible values a contains() scan must examine."""
    lake = ParquetLake(spark, synth_log_lake, str(tmp_path / "idx"))
    idx = LogIndex(gram_tier_min=0)
    lake.build_index(idx, "line")
    entry = lake.catalog.entries_for("logcloud", "line")[0]
    paths = [entry["index_path"]]
    covered = idx._covered_types(spark, paths)
    assert covered  # threshold 0: every vtype with variables is covered
    stats = idx.narrowing_stats(spark, paths, "sess_10107")
    assert "10107" in stats
    s = stats["10107"]
    # ~4k compatible digit-bearing values; the gram tier narrows to ≤1%
    assert s["compatible_values"] >= 1000
    assert s["gram_candidates"] <= max(1, 0.01 * s["compatible_values"]), s


def test_gram_tier_default_threshold_uncovered(spark, synth_log_lake, tmp_path):
    """At the default cardinality threshold (4096) this corpus's vtypes
    stay UNcovered — coverage is an optimization gate, never a
    semantics one: search falls back to the contains scan and stays
    exact."""
    lake = ParquetLake(spark, synth_log_lake, str(tmp_path / "idx"))
    idx = LogIndex()  # default gram_tier_min=4096 > every vtype here
    lake.build_index(idx, "line")
    entry = lake.catalog.entries_for("logcloud", "line")[0]
    assert idx._covered_types(spark, [entry["index_path"]]) == set()
    q = "sess_10107"
    assert _line_ids(lake.search(idx, "line", q)) == _line_oracle(
        spark, synth_log_lake, q
    )


def test_gram_tier_multi_entry_coverage_intersects(spark, tmp_path):
    """Two entries of the SAME config but different data volume: the big
    entry clears the cardinality threshold, the small one does not —
    search-time coverage is the INTERSECTION (the small entry's values
    contributed no grams, so a union would be an incomplete candidate
    source) and search stays exact. Compaction then REGENERATES the
    tier from the merged variables, restoring coverage."""
    out = str(tmp_path / "lake")
    mk = lambda lo, hi, parts: (  # noqa: E731
        spark.range(lo, hi)
        .selectExpr(
            "id AS line_id",
            "concat('sess_', cast(10000 + id AS string), ' x') AS line",
        )
        .repartition(parts)
    )
    mk(0, 3900, 5).write.parquet(out)
    lake = ParquetLake(spark, out, str(tmp_path / "idx"))
    idx = LogIndex(gram_tier_min=500)
    lake.build_index(idx, "line")
    mk(3900, 4000, 1).write.parquet(out, mode="append")
    lake.build_index(idx, "line")  # second entry: 100 values < 500
    entries = lake.catalog.entries_for("logcloud", "line")
    assert len(entries) == 2
    paths = [e["index_path"] for e in entries]
    per_entry = [idx._covered_types(spark, [p]) for p in paths]
    assert per_entry[0] and not per_entry[1]  # big covered, small not
    assert idx._covered_types(spark, paths) == set()  # intersection
    q = "sess_13950"  # lives in the UNcovered entry
    assert _line_ids(lake.search(idx, "line", q)) == _line_oracle(
        spark, out, q
    )
    comp = str(tmp_path / "compacted")
    idx.compact(spark, paths, comp)
    assert idx._covered_types(spark, [comp])  # regenerated: 4000 > 500
    cand = idx.search(spark, [comp], q)
    from rottnest_spark.indices import BRUTE_FORCE

    assert cand is not BRUTE_FORCE and cand.count() >= 1
