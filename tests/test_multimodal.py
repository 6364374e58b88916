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
    # MP4 payloads (frame decode) are the remaining documented stub
    with pytest.raises(NotImplementedError):
        mm.decode_pixels(b"\x00\x00\x00\x18ftypisom not a pixel codec")


# -- real codecs (round 4b): BMP + PCM WAV decode for real -------------------


def test_bmp_roundtrip_exact():
    import numpy as np

    from rottnest_spark.ops.multimodal import decode_pixels, encode_bmp

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(11, 7), dtype=np.uint8)  # odd width: padding
    payload = encode_bmp(px)
    assert payload[:2] == b"BM"
    got = decode_pixels(payload)
    # gray pixels: luma of (v,v,v) == v (exact roundtrip)
    assert got.shape == px.shape
    assert (got == px).all()


def test_wav_roundtrip_exact():
    import numpy as np

    from rottnest_spark.ops.multimodal import decode_pixels, encode_wav

    t = np.arange(800)
    samples = (np.sin(t / 10.0) * 20000).astype(np.int16)
    payload = encode_wav(samples, rate=8000)
    got = decode_pixels(payload)
    assert got.shape == (800, 1)
    assert (got[:, 0] == samples.astype(np.int32)).all()


def test_decode_meta_over_real_bmp(spark):
    """The decode pipeline stage handles REAL BMP payloads mixed with the
    FAKE fixture codec in one batch."""
    import numpy as np

    from rottnest_spark.ops.multimodal import decode_meta, encode_bmp

    rows = []
    for i in range(6):
        px = np.full((4 + i, 5), i * 10, dtype=np.uint8)
        rows.append((i, "image", bytearray(encode_bmp(px))))
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    out = {r["media_id"]: r for r in decode_meta(df).collect()}
    for i in range(6):
        assert out[i]["height"] == 4 + i and out[i]["width"] == 5
        assert out[i]["pixel_sum"] == (4 + i) * 5 * i * 10


def test_unsupported_codec_raises_clearly():
    import pytest as _pytest

    from rottnest_spark.ops.multimodal import decode_pixels

    # PNG and baseline JPEG decode for real now; MP4 frames remain stubbed
    with _pytest.raises(NotImplementedError, match="MP4"):
        decode_pixels(b"\x00\x00\x00\x18ftypisom container, not pixels")
    # a truncated PNG/JPEG is a parse error, not an unsupported codec
    with _pytest.raises(ValueError, match="IHDR"):
        decode_pixels(b"\x89PNG\r\n\x1a\n....")
    with _pytest.raises(ValueError, match="SOF|SOS"):
        decode_pixels(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame
    # progressive (SOF2) DECODES now (round 7); a headers-only SOF2 with
    # no scan is a parse error, and the truly-unsupported modes
    # (arithmetic coding) keep the documented refusal
    with _pytest.raises(ValueError, match="SOF|SOS"):
        decode_pixels(
            b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        )
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        decode_pixels(
            b"\xff\xd8\xff\xc9\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        )


def test_media_quality_signals(spark):
    """Decode-based curation signals: image brightness/contrast/entropy/
    extremes and audio rms/zcr/clipping, hand-checked values."""
    import numpy as np

    from rottnest_spark.ops.multimodal import (
        encode_bmp,
        encode_wav,
        media_quality,
    )

    flat = np.full((10, 10), 128, dtype=np.uint8)        # zero contrast
    blown = np.full((10, 10), 255, dtype=np.uint8)       # all extreme
    quiet = np.zeros(400, dtype=np.int16)                # silent audio
    clipped = np.full(400, 32767, dtype=np.int16)        # fully clipped
    rows = [
        (0, "image", bytearray(encode_bmp(flat))),
        (1, "image", bytearray(encode_bmp(blown))),
        (2, "audio", bytearray(encode_wav(quiet))),
        (3, "audio", bytearray(encode_wav(clipped))),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r["media_id"]: r for r in media_quality(df).collect()}
    assert out[0]["brightness"] == 128.0 and out[0]["contrast"] == 0.0
    assert out[0]["entropy"] == 0.0 and out[0]["extreme_frac"] == 0.0
    assert out[1]["extreme_frac"] == 1.0
    assert out[2]["rms"] == 0.0 and out[2]["clip_frac"] == 0.0
    assert out[3]["clip_frac"] == 1.0 and out[3]["rms"] == 32767.0
    assert out[2]["n_samples"] == 400 and out[2]["brightness"] is None
    assert out[0]["rms"] is None


def test_wav_8bit_signed_recentering(spark):
    """Round-4 ADVICE: 8-bit PCM is stored unsigned centered at 128; the
    decoder must re-center so rms has no ~128 DC offset, zcr flips sign,
    and clip_frac triggers at the 8-bit rails."""
    import numpy as np

    from rottnest_spark.ops.multimodal import (
        decode_pixels,
        encode_wav,
        media_quality,
    )

    t = np.arange(400)
    sine = (np.sin(t / 5.0) * 100).round().astype(np.int32)  # ±100, 8-bit safe
    clipped8 = np.where(t % 2 == 0, 127, -128).astype(np.int32)
    silent8 = np.zeros(400, dtype=np.int32)

    # exact roundtrip: signed in == signed out
    got = decode_pixels(encode_wav(sine, rate=8000, bits=8))
    assert got.shape == (400, 1)
    assert (got[:, 0] == sine).all()

    rows = [
        (0, "audio", bytearray(encode_wav(sine, bits=8))),
        (1, "audio", bytearray(encode_wav(clipped8, bits=8))),
        (2, "audio", bytearray(encode_wav(silent8, bits=8))),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = {r["media_id"]: r for r in media_quality(df).collect()}
    want_rms = float(np.sqrt((sine.astype(float) ** 2).mean()))
    assert abs(out[0]["rms"] - want_rms) < 1e-9      # no 128 DC offset
    assert out[0]["zcr"] > 0.0                        # sign actually flips
    assert out[0]["clip_frac"] == 0.0                 # ±100 is not clipped
    assert out[1]["clip_frac"] == 1.0                 # rails at ±(127/128)
    assert out[2]["rms"] == 0.0 and out[2]["clip_frac"] == 0.0


def test_png_roundtrip_gray_and_rgb():
    """Real PNG decode via stdlib zlib (round-4 verdict item 4): exact
    roundtrip for gray, BT.601 luma for RGB — same convention as BMP."""
    import numpy as np

    from rottnest_spark.ops.multimodal import decode_pixels, encode_png

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(13, 9), dtype=np.uint8)
    assert (decode_pixels(encode_png(gray)) == gray).all()

    rgb = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    got = decode_pixels(encode_png(rgb, color="rgb"))
    want = (
        0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    ).astype(np.uint8)
    assert got.shape == (6, 5)
    assert (got == want).all()


def test_png_all_scanline_filters_decode():
    """Hand-filter scanlines with every spec filter (1 sub, 2 up,
    3 average, 4 paeth) and assert the decoder reconstructs the original
    pixels — the part a naive 'unzip only' decoder gets wrong."""
    import struct
    import zlib

    import numpy as np

    from rottnest_spark.ops.multimodal import decode_pixels

    rng = np.random.default_rng(11)
    h, w, ch = 5, 7, 3
    px = rng.integers(0, 256, size=(h, w * ch), dtype=np.int32)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y, ftype in enumerate([1, 2, 3, 4, 0]):
        line = px[y]
        filt = np.empty(w * ch, dtype=np.int32)
        for i in range(w * ch):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ftype == 0:
                filt[i] = line[i]
            elif ftype == 1:
                filt[i] = (line[i] - a) % 256
            elif ftype == 2:
                filt[i] = (line[i] - b) % 256
            elif ftype == 3:
                filt[i] = (line[i] - (a + b) // 2) % 256
            else:
                filt[i] = (line[i] - paeth(a, b, c)) % 256
        raw += bytes([ftype]) + bytes(filt.astype(np.uint8))
        prev = line

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    got = decode_pixels(payload)
    rgb = px.reshape(h, w, ch).astype(np.float32)
    want = (
        0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    ).astype(np.uint8)
    assert (got == want).all()


def test_png_through_media_quality(spark):
    """media_quality covers a PNG payload end-to-end (executor decode)."""
    import numpy as np

    from rottnest_spark.ops.multimodal import encode_png, media_quality

    flat = np.full((12, 10), 200, dtype=np.uint8)
    rows = [(0, "image", bytearray(encode_png(flat)))]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    out = media_quality(df).collect()[0]
    assert out["brightness"] == 200.0 and out["contrast"] == 0.0
    assert out["entropy"] == 0.0


def test_png_unsupported_variants_raise():
    import struct
    import zlib

    import numpy as np

    from rottnest_spark.ops.multimodal import decode_pixels

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    # 16-bit depth
    p = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0))
    )
    import pytest as _pytest

    with _pytest.raises(NotImplementedError, match="PNG variant"):
        decode_pixels(p)
    # interlaced
    p = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1))
    )
    with _pytest.raises(NotImplementedError, match="PNG variant"):
        decode_pixels(p)


# -- baseline JPEG (round 5): ITU-T T.81 in pure struct+numpy ----------------


def test_jpeg_roundtrip_gray():
    """Encode->decode error bounded by quantization: near-exact at q=100
    (all-ones tables), small at q=90 on smooth content."""
    import numpy as np

    from rottnest_spark.ops.jpegcodec import decode_jpeg_luma, encode_jpeg

    rng = np.random.default_rng(11)
    noise = rng.integers(0, 256, size=(32, 40), dtype=np.uint8)
    d = decode_jpeg_luma(encode_jpeg(noise, quality=100))
    assert d.shape == (32, 40)
    assert np.abs(d.astype(int) - noise.astype(int)).max() <= 1

    yy, xx = np.mgrid[0:48, 0:64]
    smooth = (128 + 80 * np.sin(yy / 9) * np.cos(xx / 11)).astype(np.uint8)
    d = decode_jpeg_luma(encode_jpeg(smooth, quality=90))
    err = np.abs(d.astype(int) - smooth.astype(int))
    assert err.mean() < 1.5 and err.max() <= 8


def test_jpeg_dc_only_exact():
    """A flat image is DC-only: reconstruction is exact at any quality
    whose quantized DC survives rounding — validates quant/dequant, the
    DC huffman path, and the IDCT normalization in isolation."""
    import numpy as np

    from rottnest_spark.ops.jpegcodec import decode_jpeg_luma, encode_jpeg

    px = np.full((16, 24), 130, dtype=np.uint8)
    d = decode_jpeg_luma(encode_jpeg(px, quality=95))
    assert (d == px).all()


def test_jpeg_color_and_subsampling():
    """YCbCr 4:4:4 and 4:2:0 MCU layouts both decode to the BT.601 luma
    of the source; 4:2:0 exercises multi-block-per-MCU bitstream walk,
    restart markers exercise the RSTn/DC-reset path."""
    import numpy as np

    from rottnest_spark.ops.jpegcodec import decode_jpeg_luma, encode_jpeg

    yy, xx = np.mgrid[0:40, 0:56]
    base = (128 + 70 * np.sin(yy / 7) * np.cos(xx / 9)).astype(np.uint8)
    rgb = np.stack([base, 255 - base, np.roll(base, 5, 1)], axis=-1)
    luma = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    for kw in (
        {"subsample": (1, 1)},
        {"subsample": (2, 2)},
        {"subsample": (2, 2), "restart_interval": 2},
        {"subsample": (2, 1)},
    ):
        d = decode_jpeg_luma(encode_jpeg(rgb, quality=90, **kw))
        assert d.shape == luma.shape
        err = np.abs(d.astype(float) - luma)
        assert err.mean() < 2.0, (kw, err.mean())


def test_jpeg_odd_dimensions():
    """Non-multiple-of-8 (and of-16 for 4:2:0) dims: edge blocks padded at
    encode, cropped at decode."""
    import numpy as np

    from rottnest_spark.ops.jpegcodec import decode_jpeg_luma, encode_jpeg

    rng = np.random.default_rng(5)
    for h, w in ((9, 13), (17, 31), (45, 57)):
        smooth = np.tile(
            np.linspace(20, 230, w).astype(np.uint8), (h, 1)
        )
        d = decode_jpeg_luma(encode_jpeg(smooth, quality=92))
        assert d.shape == (h, w)
        assert np.abs(d.astype(int) - smooth.astype(int)).mean() < 2.0


def test_jpeg_through_media_quality(spark):
    """REAL JPEG payloads through the executor-side decode path
    (mapInPandas -> closure-shipped T.81 decoder): quality signals match
    the source statistics."""
    import numpy as np

    from rottnest_spark.ops.jpegcodec import encode_jpeg
    from rottnest_spark.ops.multimodal import media_quality

    rows = []
    expected = {}
    for i in range(6):
        yy, xx = np.mgrid[0 : 24 + i, 0:32]
        px = (128 + (40 + 5 * i) * np.sin(yy / 5) * np.cos(xx / 7)).astype(
            np.uint8
        )
        rows.append((i, "image", bytearray(encode_jpeg(px, quality=93))))
        expected[i] = (float(px.mean()), float(px.std()))
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    out = {r["media_id"]: r for r in media_quality(df).collect()}
    for i, (mean, std) in expected.items():
        assert abs(out[i]["brightness"] - mean) < 1.5
        assert abs(out[i]["contrast"] - std) < 1.5


def test_mp4_container_meta(spark):
    """MP4 container metadata parses for real (ISO BMFF box walk) even
    though frame decode stays stubbed — driver parse + executor
    mapInPandas both checked."""
    from rottnest_spark.ops.multimodal import (
        encode_mp4_meta,
        mp4_meta,
        parse_mp4_meta,
    )

    b = encode_mp4_meta(12.5, 640, 360)
    info = parse_mp4_meta(b)
    assert info["brand"] == "isom"
    assert info["duration"] / info["timescale"] == 12.5
    assert (info["width"], info["height"]) == (640, 360)
    assert info["handlers"] == ["vide"]

    rows = [
        (i, "video", bytearray(encode_mp4_meta(3.0 + i, 320 + 16 * i, 240)))
        for i in range(4)
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    out = {r["media_id"]: r for r in mp4_meta(df).collect()}
    for i in range(4):
        assert out[i]["duration_sec"] == 3.0 + i
        assert out[i]["width"] == 320 + 16 * i
        assert out[i]["n_tracks"] == 1
        assert out[i]["handlers"] == "vide"


def test_mp4_tkhd_spec_offsets_external_fixture():
    """Round-trip against a hand-laid-out ISO 14496-12 moov built field by
    field from the spec's box tables (independent of encode_mp4_meta), the
    way ffmpeg/phone muxers emit it: v0 mvhd, one v0 audio tkhd
    (width=height=0) and one v1 video tkhd. Guards the §8.3.2 offsets —
    width sits at body+76 (v0) / body+88 (v1), NOT +80/+100."""
    import struct

    from rottnest_spark.ops.multimodal import parse_mp4_meta

    def box(tag, body):
        return struct.pack(">I", 8 + len(body)) + tag + body

    ftyp = box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom")
    # mvhd v0: version+flags, creation, modification, timescale, duration,
    # rate, volume+reserved, reserved[2], matrix[9], pre_defined[6], next_id
    mvhd = box(
        b"mvhd",
        struct.pack(">I", 0)
        + struct.pack(">IIII", 0, 0, 90000, 90000 * 7)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 3),
    )

    unity = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    # audio track: tkhd v0 — width/height zero, per spec for sound tracks
    tkhd_a = box(
        b"tkhd",
        struct.pack(">I", 7)
        + struct.pack(">IIIII", 0, 0, 1, 0, 90000 * 7)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0x0100, 0)
        + unity
        + struct.pack(">II", 0, 0),
    )
    hdlr_a = box(
        b"hdlr", struct.pack(">I", 0) + b"\x00" * 4 + b"soun" + b"\x00" * 13
    )
    trak_a = box(b"trak", tkhd_a + box(b"mdia", hdlr_a))
    # video track: tkhd v1 — 64-bit times/duration (8+8+4+4+8 = 32 bytes)
    tkhd_v = box(
        b"tkhd",
        struct.pack(">I", (1 << 24) | 7)
        + struct.pack(">QQII Q".replace(" ", ""), 0, 0, 2, 0, 90000 * 7)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + unity
        + struct.pack(">II", 1920 << 16, 1080 << 16),
    )
    hdlr_v = box(
        b"hdlr", struct.pack(">I", 0) + b"\x00" * 4 + b"vide" + b"\x00" * 13
    )
    trak_v = box(b"trak", tkhd_v + box(b"mdia", hdlr_v))
    payload = ftyp + box(b"moov", mvhd + trak_a + trak_v)

    info = parse_mp4_meta(payload)
    assert info["brand"] == "mp42"
    assert info["timescale"] == 90000
    assert info["duration"] == 90000 * 7
    assert info["n_tracks"] == 2
    assert (info["width"], info["height"]) == (1920, 1080)
    assert info["handlers"] == ["soun", "vide"]


def test_mjpeg_mp4_sample_table_roundtrip():
    """Sample-table round trip: stsd/stsz/stsc/stco resolve every frame's
    exact byte range, frames decode via the T.81 decoder, and the
    container-metadata parser reads the same file."""
    import numpy as np

    from rottnest_spark.ops.jpegcodec import decode_jpeg_luma, encode_jpeg
    from rottnest_spark.ops.multimodal import (
        encode_mjpeg_mp4,
        mp4_frames,
        parse_mp4_meta,
        parse_mp4_samples,
    )

    frames = []
    for i in range(7):
        yy, xx = np.mgrid[0:16, 0:24]
        frames.append(
            encode_jpeg(((yy * 5 + xx * 3 + i * 11) % 256).astype(np.uint8))
        )
    mp4 = encode_mjpeg_mp4(frames, 24, 16, fps=5)

    meta = parse_mp4_meta(mp4)
    assert (meta["width"], meta["height"]) == (24, 16)
    assert meta["handlers"] == ["vide"]
    assert meta["duration"] / meta["timescale"] == 7 / 5

    st = parse_mp4_samples(mp4)
    assert st["codec"] == "jpeg"
    assert st["n_samples"] == 7
    assert st["sizes"] == [len(f) for f in frames]
    # every sampled byte range is the exact original JPEG
    for i, raw in mp4_frames(mp4, every_n=3):
        assert raw == frames[i]
        px = decode_jpeg_luma(raw)
        assert px.shape == (16, 24)
    assert [i for i, _ in mp4_frames(mp4, every_n=3)] == [0, 3, 6]


def test_video_frame_stats_executor_decode(spark):
    """video_frame_stats decodes only the sampled frames on executors;
    brightness tracks the frames' known means; a non-MJPEG codec reports
    decoded=false instead of failing the batch."""
    import numpy as np

    from rottnest_spark.ops.jpegcodec import decode_jpeg_luma, encode_jpeg
    from rottnest_spark.ops.multimodal import (
        encode_mjpeg_mp4,
        mp4_frames,
        video_frame_stats,
    )

    rows = []
    want = {}
    for mid in range(6):
        n = 3 + mid % 3
        frames = []
        for i in range(n):
            yy, xx = np.mgrid[0:16, 0:16]
            frames.append(
                encode_jpeg(((yy + xx) * 4 + mid * 7 + i * 13).astype(np.uint8) % 256)
            )
        mp4 = encode_mjpeg_mp4(frames, 16, 16)
        idxs = list(range(0, n, 2))
        want[mid] = (
            n,
            len(idxs),
            round(
                float(
                    np.mean(
                        [decode_jpeg_luma(frames[i]).mean() for i in idxs]
                    )
                ),
                2,
            ),
        )
        rows.append((mid, bytearray(mp4)))
    # a fake avc1 video: same container skeleton, codec not decodable here
    bogus = encode_mjpeg_mp4([b"\x00" * 32], 8, 8)
    bogus = bogus.replace(b"jpeg", b"avc1", 1)
    rows.append((99, bytearray(bogus)))

    df = spark.createDataFrame(rows, "media_id long, payload binary").repartition(4)
    out = {r["media_id"]: r for r in video_frame_stats(df, every_n=2).collect()}
    for mid, (n, ns, bright) in want.items():
        r = out[mid]
        assert (r["n_frames"], r["n_sampled"]) == (n, ns)
        assert r["all_decoded"] is True
        assert abs(r["mean_brightness"] - bright) < 0.01
    assert out[99]["codec"] == "avc1"
    assert out[99]["all_decoded"] is False
    assert out[99]["mean_brightness"] is None


# --- progressive JPEG (SOF2, round 7) ----------------------------------------


def test_progressive_equals_baseline_decode():
    """THE progressive law: both encoders quantize identically, so the
    progressive decode must equal the baseline decode PIXEL-EXACTLY —
    any scan-sequencing, EOB-run, or refinement-bit bug surfaces as a
    mismatch. Covers successive approximation depths 0-2, multi-band
    spectral selection, and non-multiple-of-8 dims."""
    import numpy as np

    from rottnest_spark.ops.jpegcodec import (
        decode_jpeg_luma,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:23, 0:31]
    images = [
        (128 + 60 * np.sin(yy / 4.0) * np.cos(xx / 6.0)).astype(np.uint8),
        rng.integers(0, 256, (16, 24), dtype=np.uint8),
        np.full((9, 12), 77, np.uint8),
        np.where(
            (np.add.outer(np.arange(24), np.arange(24)) % 2).astype(bool),
            255, 0,
        ).astype(np.uint8),
    ]
    plans = [
        dict(dc_al=1, ac_al=1, bands=((1, 5), (6, 63))),
        dict(dc_al=2, ac_al=2, bands=((1, 2), (3, 20), (21, 63))),
        dict(dc_al=0, ac_al=0, bands=((1, 63),)),
    ]
    for px in images:
        for q in (30, 90):
            base = decode_jpeg_luma(encode_jpeg(px, quality=q))
            for plan in plans:
                prog = decode_jpeg_luma(
                    encode_jpeg_progressive(px, quality=q, **plan)
                )
                assert np.array_equal(base, prog), (px.shape, q, plan)


def test_progressive_is_sof2_and_multiscan():
    import numpy as np

    from rottnest_spark.ops.jpegcodec import encode_jpeg_progressive

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    payload = encode_jpeg_progressive(px, dc_al=1, ac_al=1)
    assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
    assert payload.count(b"\xff\xda") >= 5  # DC first/refine + AC scans


def test_progressive_through_executor_media_quality(spark):
    """The SOF2 path must ship inside the by-value decoder closure: score
    progressive payloads through media_quality's mapInPandas and compare
    against the same images' baseline scores."""
    import numpy as np

    from rottnest_spark.ops import multimodal
    from rottnest_spark.ops.jpegcodec import encode_jpeg, encode_jpeg_progressive

    rows = []
    for mid in range(12):
        yy, xx = np.mgrid[0 : 16 + mid % 4, 0:24]
        px = (128 + (20 + mid) * np.sin(yy / 3.0 + mid)).astype(np.uint8)
        enc = encode_jpeg_progressive if mid % 2 else encode_jpeg
        rows.append((mid, "image", bytearray(enc(px, quality=90))))
        rows.append(
            (100 + mid, "image", bytearray(encode_jpeg(px, quality=90)))
        )
    media = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    ).repartition(4, "media_id")
    got = {
        r.media_id: (r.brightness, r.contrast, r.entropy)
        for r in multimodal.media_quality(media).collect()
    }
    for mid in range(12):
        if mid % 2 == 0:
            assert got[mid] == got[100 + mid]  # identical payloads
        else:
            # progressive vs baseline of the SAME image: identical
            # quantized coefficients -> identical decoded stats
            assert got[mid] == got[100 + mid], mid


def test_arithmetic_and_lossless_still_refuse():
    import numpy as np
    import pytest as _pytest

    from rottnest_spark.ops.jpegcodec import decode_jpeg_luma, encode_jpeg

    payload = bytearray(encode_jpeg(np.zeros((8, 8), np.uint8)))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC9  # arithmetic sequential
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg_luma(bytes(payload))
