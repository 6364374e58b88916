"""Streaming: incremental index maintenance + watermarked window agg."""

import pyspark.sql.functions as F
import pytest

from rottnest_spark import ParquetLake
from rottnest_spark.indices.substring import SubstringIndex
from rottnest_spark.sources.reader import read_parquet
from rottnest_spark.streaming import (
    stream_index_maintenance,
    windowed_event_counts,
)
from rottnest_spark.streaming.aggregate import run_stream_to_memory


def _write_half(spark, sf_dir, out, first: bool):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half = docs.filter(
        (F.col("doc_id") % 2 == 0) if first else (F.col("doc_id") % 2 == 1)
    )
    half.repartition(2).write.mode("append").parquet(out)


def test_incremental_maintenance_drains_new_files(spark, sf_dir, tmp_path):
    lake_dir = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    _write_half(spark, sf_dir, lake_dir, first=True)

    lake = ParquetLake(spark, lake_dir, str(tmp_path / "idx"))
    idx = SubstringIndex()
    created1 = stream_index_maintenance(spark, lake, idx, "text", ckpt)
    assert created1
    covered1 = {
        f for e in lake.catalog.entries_for("substring", "text") for f in e["file_paths"]
    }
    assert covered1 == set(lake.files)

    # second drop of files → second drain indexes only the delta
    _write_half(spark, sf_dir, lake_dir, first=False)
    created2 = stream_index_maintenance(spark, lake, idx, "text", ckpt)
    assert created2
    covered2 = {
        f for e in lake.catalog.entries_for("substring", "text") for f in e["file_paths"]
    }
    assert covered2 == set(lake.files) and len(covered2) > len(covered1)

    # search over the maintained index == full-scan oracle
    q = "merge sort"
    got = sorted(
        r["doc_id"] for r in lake.search(idx, "text", q).select("doc_id").collect()
    )
    want = sorted(
        r["doc_id"]
        for r in spark.read.parquet(lake_dir)
        .filter(F.contains(F.lower("text"), F.lit(q)))
        .select("doc_id")
        .collect()
    )
    assert got == want and len(got) > 0

    # a third drain with no new files is a no-op
    assert stream_index_maintenance(spark, lake, idx, "text", ckpt) == []


def test_windowed_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    src = str(tmp_path / "ev_stream")
    ev = read_parquet(spark, [f"{sf_dir}/events.parquet"])
    ev.repartition(4).write.parquet(src)
    static = spark.read.parquet(src)

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(static).collect()
    }
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in run_stream_to_memory(
            spark, src, static.schema, "win_counts_t"
        ).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_sliding_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    from rottnest_spark.streaming.aggregate import sliding_event_counts

    src = str(tmp_path / "ev_slide")
    ev = read_parquet(spark, [f"{sf_dir}/events.parquet"])
    ev.repartition(4).write.parquet(src)
    static = spark.read.parquet(src)

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in sliding_event_counts(static).collect()
    }
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in run_stream_to_memory(
            spark, src, static.schema, "slide_counts_t",
            agg_fn=sliding_event_counts,
        ).collect()
    }
    assert streamed == batch and len(batch) > 0
    # every tumbling hour has 4 hopping windows covering it: the hopping
    # result must be a strict superset of the tumbling one in window count
    assert len(batch) > len(
        {r["window_start"] for r in windowed_event_counts(static).collect()}
    )


def test_stateful_dedup_across_batches(spark, sf_dir, tmp_path):
    """applyInPandasWithState: duplicates arriving in a LATER drain are
    suppressed by persisted state (per-batch dropDuplicates cannot do this)."""
    from rottnest_spark.streaming.stateful import run_streaming_dedup

    src = str(tmp_path / "src")
    ev = read_parquet(spark, [f"{sf_dir}/events.parquet"]).select(
        "event_id", "user_id", "props"
    )
    first = ev.filter("event_id % 2 = 0")
    first.repartition(2).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema
    args = (spark, src, schema, str(tmp_path / "ck"), "user_id", "event_id",
            "props", str(tmp_path / "sink"))

    out1 = run_streaming_dedup(*args)
    want1 = first.select("user_id", F.md5("props")).distinct().count()
    assert out1.count() == want1

    # second drop REPLAYS the first half plus the rest
    ev.repartition(2).write.mode("append").parquet(src)
    out2 = run_streaming_dedup(*args)
    want_all = ev.select("user_id", F.md5("props")).distinct().count()
    assert out2.count() == want_all  # replayed rows stayed suppressed
    assert out2.select("key", "content_hash").distinct().count() == want_all


def test_snapshot_lake_streaming_maintenance(spark, sf_dir, tmp_path):
    """Delta snapshot lake: the file stream is only the new-file trigger —
    coverage follows the SNAPSHOT (catalog anti-join vs lake.files), so
    snapshot-removed files discovered on disk are never indexed."""
    import glob
    import json
    import os
    import shutil

    import pyspark.sql.functions as F

    from rottnest_spark.sources.delta import DeltaSnapshotLake

    table = tmp_path / "dtable"
    log = table / "_delta_log"
    log.mkdir(parents=True)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    parts = {}
    for i, cond in enumerate(["doc_id % 2 = 0", "doc_id % 2 = 1"]):
        name = f"part-{i:05d}.parquet"
        docs.filter(cond).coalesce(1).write.parquet(str(table / f"_t{i}"))
        src = glob.glob(str(table / f"_t{i}" / "*.parquet"))[0]
        shutil.move(src, str(table / name))
        shutil.rmtree(str(table / f"_t{i}"))
        parts[i] = name

    def commit(version, adds=(), removes=()):
        lines = [json.dumps({"add": {"path": p, "dataChange": True}}) for p in adds]
        lines += [json.dumps({"remove": {"path": p, "dataChange": True}}) for p in removes]
        with open(os.path.join(str(log), f"{version:020d}.json"), "w") as fh:
            fh.write("\n".join(lines) + "\n")

    commit(0, adds=[parts[0]])
    lake = DeltaSnapshotLake(spark, str(table), str(tmp_path / "idx"))
    idx = SubstringIndex()
    ckpt = str(tmp_path / "ckpt")
    created1 = stream_index_maintenance(
        spark, lake, idx, "text", ckpt, path=str(log), trigger_format="text"
    )
    assert created1
    covered = {
        f
        for e in lake.catalog.entries_for("substring", "text")
        for f in e["file_paths"]
    }
    # part-1 exists on disk but is NOT in the snapshot → not indexed
    assert covered == {os.path.join(str(table), parts[0])}

    commit(1, adds=[parts[1]])
    created2 = stream_index_maintenance(
        spark, lake, idx, "text", ckpt, path=str(log), trigger_format="text"
    )
    assert created2
    q = "merge sort"
    got = sorted(
        r["doc_id"] for r in lake.search(idx, "text", q).select("doc_id").collect()
    )
    want = sorted(
        r["doc_id"]
        for r in spark.read.parquet(
            *[os.path.join(str(table), p) for p in parts.values()]
        )
        .filter(F.contains(F.lower("text"), F.lit(q)))
        .select("doc_id")
        .collect()
    )
    assert got == want and len(got) > 0


def test_session_stats_stream_equals_batch(spark, sf_dir, tmp_path):
    """F.session_window: streaming (complete mode, AvailableNow) reproduces
    the batch plan exactly — same operator both modes."""
    from rottnest_spark.streaming.sessions import (
        run_session_stream_to_memory,
        session_stats,
    )

    src = str(tmp_path / "ev_sessions")
    ev = read_parquet(spark, [f"{sf_dir}/events.parquet"])
    ev.repartition(4).write.parquet(src)
    static = spark.read.parquet(src)

    def key(rows):
        return sorted(
            (r["user_id"], str(r["session_start"]), r["n_events"], r["sum_value"])
            for r in rows
        )

    batch = key(session_stats(static).collect())
    streamed = key(
        run_session_stream_to_memory(
            spark, src, static.schema, "session_stats_t"
        ).collect()
    )
    assert len(batch) > 0
    # streaming casts ts NTZ->LTZ (UTC session): compare on rendered values
    assert streamed == batch


def test_attribution_join_stream_equals_batch(spark, sf_dir, tmp_path):
    """Watermarked stream-stream interval join (click -> purchase within
    1h): streaming emits exactly the batch pairs. Source files are written
    time-sorted so watermark-driven state cleanup never races arrival
    order (the production contract for file replays)."""
    from rottnest_spark.streaming.joins import (
        attribution_join,
        last_touch,
        run_attribution_stream_to_memory,
    )

    src = str(tmp_path / "ev_attr")
    ev = read_parquet(spark, [f"{sf_dir}/events.parquet"])
    ev.orderBy("ts").coalesce(1).write.parquet(src)
    static = spark.read.parquet(src)

    batch_pairs = attribution_join(
        static.filter(F.col("event_type") == "click"),
        static.filter(F.col("event_type") == "purchase"),
    )

    def key(rows):
        return sorted(
            (r["user_id"], r["conv_id"], str(r["conv_ts"]), str(r["trig_ts"]))
            for r in rows
        )

    streamed = run_attribution_stream_to_memory(
        spark, src, static.schema, "attr_pairs_t"
    )
    assert len(key(batch_pairs.collect())) > 0
    assert key(streamed.collect()) == key(batch_pairs.collect())

    # last-touch collapse: one row per conversion, trigger = max qualifying
    lt = last_touch(batch_pairs).collect()
    assert len(lt) == batch_pairs.select("conv_id").distinct().count()
    by_conv = {}
    for r in batch_pairs.collect():
        by_conv.setdefault(r["conv_id"], []).append(r["trig_ts"])
    for r in lt:
        assert r["attributed_trig_ts"] == max(by_conv[r["conv_id"]])


def test_stream_ingest_dedup_against_lake_index(spark, sf_dir, tmp_path):
    """Dedup-at-ingest: a stream of new docs is filtered against the
    lake's exact-index key set; intra-stream duplicates drop too."""
    import pyspark.sql.functions as F

    from rottnest_spark import ParquetLake
    from rottnest_spark.indices.exact import ExactIndex
    from rottnest_spark.streaming.ingest import (
        keys_already_in_lake,
        stream_ingest_dedup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lake_dir = str(tmp_path / "lake")
    docs.filter(F.col("doc_id") < 250).repartition(2).write.parquet(lake_dir)
    lake = ParquetLake(spark, lake_dir, str(tmp_path / "idx"))
    lake.build_index(ExactIndex(), "doc_id")

    # stream payload: ids 200-299 (overlap 200-249 with the lake) + an
    # intra-stream duplicate of 260
    incoming = docs.filter(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 300)
    ).select("doc_id", "source")
    dup = incoming.filter(F.col("doc_id") == 260)
    src = str(tmp_path / "stream_src")
    incoming.unionByName(dup).repartition(3).write.parquet(src)

    stream = spark.readStream.schema(incoming.schema).parquet(src)
    deduped = stream_ingest_dedup(stream, "doc_id", lake, "doc_id")
    q = (
        deduped.writeStream.format("memory")
        .queryName("ingest_dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted(
        r["doc_id"] for r in spark.table("ingest_dedup_t").collect()
    )
    assert got == list(range(250, 300))  # lake overlap + stream dup removed

    # unindexed lake refuses (silent pass-through would be a data bug)
    lake2 = ParquetLake(spark, lake_dir, str(tmp_path / "idx2"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exact index"):
        keys_already_in_lake(lake2, "doc_id")


def test_streaming_anomaly_state_carries(spark, tmp_path):
    """An outlier in batch 2 is judged against batch 1's learned baseline
    (cross-batch state), and normal values never flag."""
    import os

    from rottnest_spark.streaming.anomaly import run_streaming_anomaly

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    sink = str(tmp_path / "out")
    os.makedirs(src)
    schema = "event_type string, event_id bigint, value double"
    base = [("a", i, 100.0 + (i % 5)) for i in range(40)]
    spark.createDataFrame(base, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out1 = run_streaming_anomaly(spark, src, schema, ckpt, sink, "event_type")
    assert out1.count() == 0  # tight cluster: nothing flags

    batch2 = [("a", 100, 102.0), ("a", 101, 500.0), ("a", 102, 101.0)]
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out2 = run_streaming_anomaly(spark, src, schema, ckpt, sink, "event_type")
    flagged = [r["event_id"] for r in out2.collect()]
    assert flagged == [101]
    assert out2.collect()[0]["score"] > 3.0


def test_streaming_heavy_hitters_across_batches(spark, tmp_path):
    """An item frequent ACROSS batches but not dominant within any single
    batch still surfaces (cross-batch MG state), with the n/m error
    bound holding against exact counts."""
    import os

    from rottnest_spark.streaming.heavyhitters import (
        run_streaming_heavy_hitters,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ck")
    os.makedirs(src)
    schema = "g string, item string"
    # two batches: 'hot' appears 30x total (15 per batch) among 60 noise
    # items that each appear once
    for b in range(2):
        rows = [("a", "hot")] * 15 + [("a", f"noise{b}_{i}") for i in range(30)]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        got = run_streaming_heavy_hitters(
            spark, src, schema, ckpt, "g", "item", capacity=8
        )
    by_item = {r[1]: r for r in got}
    assert "hot" in by_item
    key, item, est, n_total = by_item["hot"]
    assert n_total == 90
    true = 30
    assert est <= true <= est + n_total // 8  # MG bound
    # 'hot' leads the summary
    assert max(r[2] for r in got) == est
