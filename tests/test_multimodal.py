"""Multimodal plumbing: determinism, batch-shape invariance, stub gating."""

import numpy as np
import pytest

from rottnest_spark.ops import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    return mm.synthesize_media(spark, 64, partitions=4)


def test_synthesis_deterministic(spark):
    a = sorted(
        (r["media_id"], bytes(r["payload"]))
        for r in mm.synthesize_media(spark, 32, partitions=2).collect()
    )
    b = sorted(
        (r["media_id"], bytes(r["payload"]))
        for r in mm.synthesize_media(spark, 32, partitions=7).collect()
    )
    assert a == b


def test_decode_matches_meta(spark, media):
    meta = {r["media_id"]: r["meta"] for r in media.collect()}
    for r in mm.decode_meta(media).collect():
        assert r["height"] == meta[r["media_id"]]["height"]
        assert r["width"] == meta[r["media_id"]]["width"]


def test_features_partition_invariant(spark, media):
    one = {
        r["media_id"]: list(r["features"])
        for r in mm.media_features(media.repartition(1)).collect()
    }
    many = {
        r["media_id"]: list(r["features"])
        for r in mm.media_features(media.repartition(13)).collect()
    }
    assert one == many
    v = np.array(next(iter(one.values())))
    assert len(v) == mm.HIST_BINS
    assert abs(v.sum() - 1.0) < 1e-3  # L1-normalized over payload bytes


def test_resize_shapes(spark, media):
    out = mm.resize_media(media, 4, 6)
    for r in mm.decode_meta(out).collect():
        assert (r["height"], r["width"]) == (4, 6)


def test_frame_sample_counts(spark, media):
    meta = {r["media_id"]: r["meta"] for r in media.collect()}
    counts: dict = {}
    for r in mm.frame_sample(media, every_n=2).collect():
        counts[r["media_id"]] = counts.get(r["media_id"], 0) + 1
    for mid, n in counts.items():
        h = meta[mid]["height"]
        assert n == (h + 1) // 2


def test_real_codec_raises():
    with pytest.raises(NotImplementedError):
        mm.decode_pixels(b"\xff\xd8\xff\xe0 fake jpeg header")
