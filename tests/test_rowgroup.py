"""Row-group granularity: sub-file pruning (the reference's page-uid analog).

A multi-row-group lake is written with pyarrow (row_group_size=64); the
row_group-granular indexes must (a) return exactly the full-scan oracle and
(b) actually prune to a subset of row groups inside the files.
"""

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from rottnest_spark import ParquetLake
from rottnest_spark.core.layout import WHOLE_FILE, extract_layout
from rottnest_spark.indices.exact import ExactIndex
from rottnest_spark.indices.substring import SubstringIndex


MARKER = "zqxjkvmark"  # rare trigram source — the pruning probe


@pytest.fixture(scope="module")
def rg_lake(spark, sf_dir, tmp_path_factory):
    """2 files x ~4 row groups each over documents; a rare marker string is
    appended to two docs (the fixture vocabulary is so small that every
    natural trigram occurs in every 64-row group — pruning needs a gram
    that doesn't)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out = tmp_path_factory.mktemp("rg") / "lake"
    out.mkdir()
    tbl = pq.read_table(f"{sf_dir}/documents.parquet")
    doc_id = tbl["doc_id"]
    marked = pc.if_else(
        pc.is_in(doc_id, value_set=pa.array([42, 420])),
        pc.binary_join_element_wise(tbl["text"], f" {MARKER}", " "),
        tbl["text"],
    )
    tbl = tbl.set_column(tbl.schema.get_field_index("text"), "text", marked)
    half = tbl.num_rows // 2
    pq.write_table(tbl.slice(0, half), str(out / "a.parquet"), row_group_size=64)
    pq.write_table(tbl.slice(half), str(out / "b.parquet"), row_group_size=64)
    return str(out)


def test_layout_sees_row_groups(spark, rg_lake):
    import glob

    files = sorted(glob.glob(rg_lake + "/*.parquet"))
    layout = extract_layout(spark, files).collect()
    assert len(layout) > len(files)  # multiple row groups per file
    assert all(r["row_group"] >= 0 for r in layout)


def test_substring_rg_search_equals_oracle_and_prunes(spark, rg_lake, tmp_path):
    lake = ParquetLake(spark, rg_lake, str(tmp_path / "idx"))
    idx = SubstringIndex(granularity="row_group")
    lake.build_index(idx, "text")

    for q in ("merge sort", MARKER):
        got = sorted(
            r["doc_id"]
            for r in lake.search(idx, "text", q).select("doc_id").collect()
        )
        want = sorted(
            r["doc_id"]
            for r in spark.read.parquet(rg_lake)
            .filter(F.contains(F.lower("text"), F.lit(q)))
            .select("doc_id")
            .collect()
        )
        assert got == want and len(got) > 0, q
    q = MARKER

    # pruning is sub-file: candidates are real row groups, strictly fewer
    # than the total unit count
    entry = lake.catalog.entries_for("substring", "text")[0]
    cands = idx.search(spark, [entry["index_path"]], q).collect()
    assert all(r["row_group"] != WHOLE_FILE for r in cands)
    import glob

    total_units = len(
        extract_layout(spark, sorted(glob.glob(rg_lake + "/*.parquet"))).collect()
    )
    assert 0 < len(cands) < total_units


def test_exact_rg_zone_maps_prune(spark, rg_lake, tmp_path):
    lake = ParquetLake(spark, rg_lake, str(tmp_path / "idx"))
    idx = ExactIndex(granularity="row_group")
    lake.build_index(idx, "doc_id")

    key = 123
    got = [r["doc_id"] for r in lake.search(idx, "doc_id", key).collect()]
    assert got == [key]

    # doc_id is ordered in the fixture -> a point key should hit one unit
    entry = lake.catalog.entries_for("exact", "doc_id")[0]
    cands = idx.search(spark, [entry["index_path"]], key).collect()
    assert len(cands) == 1 and cands[0]["row_group"] != WHOLE_FILE


def test_rg_compaction_preserves_search(spark, rg_lake, tmp_path):
    lake = ParquetLake(spark, rg_lake, str(tmp_path / "idx"))
    idx = SubstringIndex(granularity="row_group")
    lake.build_index(idx, "text", binpack_row_threshold=1)
    assert len(lake.catalog.entries_for("substring", "text")) > 1
    q = "merge sort"
    before = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    lake.compact_indices(idx, "text", row_threshold=10_000_000)
    after = sorted(r["doc_id"] for r in lake.search(idx, "text", q).collect())
    assert before == after and len(before) > 0


def test_rg_fetch_handles_nanos_timestamps(spark, sf_dir, tmp_path):
    """Row-group candidate fetch must downcast ns timestamps (arrow cast is
    safe-mode by default and refuses the truncation)."""
    out = tmp_path / "ev_rg"
    out.mkdir()
    pq.write_table(
        pq.read_table(f"{sf_dir}/events.parquet"),
        str(out / "events.parquet"),
        row_group_size=256,
    )
    lake = ParquetLake(spark, str(out), str(tmp_path / "idx"))
    idx = SubstringIndex(granularity="row_group")
    lake.build_index(idx, "props")
    q = '"k": 87'
    got = sorted(
        r["event_id"] for r in lake.search(idx, "props", q).collect()
    )
    want = sorted(
        r["event_id"]
        for r in lake.read()
        .filter(F.contains(F.lower("props"), F.lit(q)))
        .collect()
    )
    assert got == want and len(got) > 0


def test_explain_search_reports_pruning(spark, rg_lake, tmp_path):
    lake = ParquetLake(spark, rg_lake, str(tmp_path / "idx"))
    idx = SubstringIndex(granularity="row_group")
    lake.build_index(idx, "text")
    info = lake.explain_search(idx, "text", MARKER)
    assert info["decision"] == "index_scan"
    assert 0 < info["n_candidates"] < info["total_units"]
    assert 0 < info["pruning_ratio"] < 1
    # sub-gram query -> flag-0 brute force
    assert lake.explain_search(idx, "text", "ab")["decision"] == "brute_force_flag"


def test_bm25_and_logcloud_rg_granularity(spark, sf_dir, tmp_path):
    """BM25 and LogCloud at row_group granularity: search == oracle and
    candidates carry real row groups."""
    from rottnest_spark.indices.bm25 import BM25Index, bm25_topk
    from rottnest_spark.indices.logcloud import LogIndex

    out = tmp_path / "ev_rg2"
    out.mkdir()
    pq.write_table(
        pq.read_table(f"{sf_dir}/events.parquet"),
        str(out / "events.parquet"),
        row_group_size=256,
    )
    lake = ParquetLake(spark, str(out), str(tmp_path / "idx"))

    # dict_frac=1.0: at 256-row units the probe value is near-ubiquitous and
    # default routing would (correctly) flag brute force; disable routing to
    # assert the row-group candidate shape
    lidx = LogIndex(granularity="row_group", dict_frac=1.0)
    lake.build_index(lidx, "props")
    q = '"k": 87'
    got = sorted(r["event_id"] for r in lake.search(lidx, "props", q).collect())
    want = sorted(
        r["event_id"]
        for r in lake.read().filter(F.contains("props", F.lit(q))).collect()
    )
    assert got == want and len(got) > 0
    entry = lake.catalog.entries_for("logcloud", "props")[0]
    cands = lidx.search(spark, [entry["index_path"]], q).collect()
    assert all(r["row_group"] != WHOLE_FILE for r in cands)

    bidx = BM25Index(granularity="row_group")
    lake.build_index(bidx, "props")
    top = bm25_topk(lake, bidx, "props", "87", 5, "event_id").collect()
    assert len(top) == 5
    scores = [r["score"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_conjunctive_multi_index_search(spark, sf_dir, tmp_path):
    """X9 composition: log containment AND time range, candidate sets
    intersected across a LogIndex and an ExactIndex(ts) at rg granularity."""
    from rottnest_spark.indices.logcloud import LogIndex

    out = tmp_path / "ev_conj"
    out.mkdir()
    pq.write_table(
        pq.read_table(f"{sf_dir}/events.parquet"),
        str(out / "events.parquet"),
        row_group_size=256,
    )
    lake = ParquetLake(spark, str(out), str(tmp_path / "idx"))
    lidx = LogIndex(granularity="row_group", dict_frac=1.0)
    tidx = ExactIndex(granularity="row_group")
    lake.build_index(lidx, "props")
    lake.build_index(tidx, "ts")

    full = lake.read()
    lo, hi = [
        r[0]
        for r in full.selectExpr(
            "min(ts) + INTERVAL 2 DAYS", "min(ts) + INTERVAL 4 DAYS"
        ).collect()[0:1]
    ][0], full.selectExpr("min(ts) + INTERVAL 4 DAYS").collect()[0][0]

    q = '"k": 87'
    got = sorted(
        r["event_id"]
        for r in lake.search_conj(
            [(lidx, "props", q), (tidx, "ts", (lo, hi))]
        ).collect()
    )
    want = sorted(
        r["event_id"]
        for r in full.filter(
            F.contains("props", F.lit(q)) & F.col("ts").between(lo, hi)
        ).collect()
    )
    assert got == want and len(got) > 0
    # the time window alone must prune row groups (events are time-ordered)
    entry = lake.catalog.entries_for("exact", "ts")[0]
    cands = tidx.search(spark, [entry["index_path"]], (lo, hi)).collect()
    total = extract_layout(spark, [str(out / "events.parquet")]).count()
    assert 0 < len(cands) < total
    # structured decision report mirrors the executed plan
    diag = lake.explain_search_conj([(lidx, "props", q), (tidx, "ts", (lo, hi))])
    assert diag["n_specs"] == 2
    assert diag["n_constraining_specs"] >= 1
    assert diag["decision"] == "index_scan"
    assert 0 < diag["n_candidates"] < total + 1
    assert diag["n_unconstrained_files"] == 0
