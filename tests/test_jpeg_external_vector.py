"""External JPEG test vector: a baseline byte stream hand-assembled from the
ITU-T T.81 spec ALONE — segment framing per B.2, canonical Huffman code
assignment per Annex C, entropy coding per F.1.2, the Annex K.1 luminance
quantization table — decoded by the repo codec and compared against pixels
derived by a test-local direct IDCT (Annex A.3.3 arithmetic, naive cosine
loops). Nothing here imports or reuses encode_jpeg, so the decoder's
correctness no longer rests on encode/decode cross-consistency (the
round-7 semi-circularity note on media_quality_jpeg's oracle).

Layout of the vector: 8x16 grayscale, one component, two vertical MCUs —
exercising marker parse, DQT dequantization (a REAL table, not all-ones),
custom DHT canonical code assignment, magnitude-category coefficient
coding (F.1.2.1), AC run-length + EOB, DC prediction across blocks, IDCT,
level shift, and clamping.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from rottnest_spark.ops.jpegcodec import decode_jpeg_luma

# T.81 Figure A.6 zigzag: ZZ[k] = raster index of the k-th zigzag element
ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# T.81 Annex K, Table K.1 — the published luminance quantization table
# (raster order).
QT_K1 = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]


class _BitWriter:
    """F.1.2.3 bit packing: MSB-first, 0x00 stuffed after every 0xFF,
    1-padded to a byte boundary at the end of the scan."""

    def __init__(self) -> None:
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.bytes.append(self.acc)
                if self.acc == 0xFF:
                    self.bytes.append(0x00)
                self.acc, self.n = 0, 0

    def flush(self) -> bytes:
        while self.n:
            self.put(1, 1)  # pad with 1-bits (F.1.2.3)
        return bytes(self.bytes)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Annex C code assignment: codes of ascending length, value = previous
    code + 1, left-shifted when the length grows."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _category(v: int) -> tuple[int, int]:
    """F.1.2.1 magnitude category + appended bits (negatives are encoded
    as v - 1 in cat-bit two's-complement)."""
    if v == 0:
        return 0, 0
    cat = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _segment(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


# custom tables, small enough that the canonical assignment can be verified
# by hand against Annex C: DC categories 0..2 at length 2 (codes 00/01/10),
# then one category per length (110, 1110, 11110, 111110); AC symbols
# EOB/(0,1)/(0,2) at length 2 and (0,3) at length 3
DC_BITS = [0, 3, 1, 1, 1, 1] + [0] * 10
DC_VALS = [0, 1, 2, 3, 4, 5, 6]
AC_BITS = [0, 3, 1] + [0] * 13
AC_VALS = [0x00, 0x01, 0x02, 0x03]


def _build_stream(blocks: list[dict[int, int]], height: int) -> bytes:
    """Assemble SOI / DQT(K.1) / SOF0 / DHT x2 / SOS / entropy / EOI for an
    8-wide, 1-component image; `blocks` lists each 8x8 block's quantized
    coefficients keyed by ZIGZAG index."""
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    w = _BitWriter()
    pred = 0
    for blk in blocks:
        dc = blk.get(0, 0)
        cat, cbits = _category(dc - pred)
        pred = dc
        code, ln = dc_codes[cat]
        w.put(code, ln)
        if cat:
            w.put(cbits, cat)
        last_nz = max((k for k in blk if k > 0 and blk[k]), default=0)
        k = 1
        while k <= last_nz:
            v = blk.get(k, 0)
            assert v != 0, "test vector uses run-length 0 symbols only"
            cat, cbits = _category(v)
            code, ln = ac_codes[cat]  # symbol (run=0, size=cat)
            w.put(code, ln)
            w.put(cbits, cat)
            k += 1
        if last_nz < 63:
            code, ln = ac_codes[0x00]  # EOB
            w.put(code, ln)
    entropy = w.flush()

    dqt = _segment(0xDB, bytes([0x00]) + bytes(QT_K1[ZZ[k]] for k in range(64)))
    sof0 = _segment(
        0xC0,
        bytes([8]) + height.to_bytes(2, "big") + (8).to_bytes(2, "big")
        + bytes([1, 1, 0x11, 0]),
    )
    dht_dc = _segment(0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    dht_ac = _segment(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    sos = _segment(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + dqt + sof0 + dht_dc + dht_ac + sos + entropy + b"\xff\xd9"
    )


def _ref_idct_block(zz_coeffs: dict[int, int]) -> np.ndarray:
    """A.3.3 inverse DCT, written as the spec's literal double sum with
    math.cos — an implementation path disjoint from the codec's
    separable-matrix einsum."""
    F = np.zeros((8, 8))
    for k, v in zz_coeffs.items():
        r = ZZ[k]
        F[r // 8, r % 8] = v * QT_K1[r]
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * F[u, v]
                        * math.cos((2 * y + 1) * u * math.pi / 16)
                        * math.cos((2 * x + 1) * v * math.pi / 16)
                    )
            out[y, x] = s / 4.0
    return np.clip(np.round(out + 128.0), 0, 255).astype(np.uint8)


def test_dc_only_block_hand_computed():
    """Flat block, fully hand-derivable: quantized DC=3, Q(0,0)=16 →
    F(0,0)=48; IDCT of a DC-only block is F00/8 = 6.0 everywhere →
    pixel 134. No reference implementation involved — the expected value
    is the Annex A arithmetic worked by hand."""
    payload = _build_stream([{0: 3}], height=8)
    px = decode_jpeg_luma(payload)
    assert px.shape == (8, 8)
    assert (px == 134).all()


def test_two_block_vector_matches_direct_idct():
    """Two vertical MCUs: block 1 carries DC + two AC coefficients, block 2
    is DC-only via a NEGATIVE prediction delta (3 → 1, diff -2 encoded as
    category 2 bits '01'). Expected pixels from the test-local naive IDCT."""
    b1 = {0: 3, 1: 1, 2: -2}  # zigzag 1 = (0,1), zigzag 2 = (1,0)
    b2 = {0: 1}
    payload = _build_stream([b1, b2], height=16)
    px = decode_jpeg_luma(payload)
    assert px.shape == (16, 8)
    np.testing.assert_array_equal(px[:8], _ref_idct_block(b1))
    np.testing.assert_array_equal(px[8:], _ref_idct_block(b2))
    # spot literal values (hand-derived): block 2 is flat at
    # round(128 + 1*16/8) = 130
    assert (px[8:] == 130).all()


def test_byte_stuffing_round_trip():
    """A coefficient pattern whose entropy bytes include 0xFF forces the
    F.1.2.3 stuff byte — the decoder must unstuff, not resync.
    Entropy bytes for this vector: e0 3e ff 00 73 (the ff is data, the 00
    is the stuff byte)."""
    blocks = [{0: -15}, {0: 48, 1: 7}]
    payload = _build_stream(blocks, height=16)
    assert b"\xff\x00" in payload.split(b"\xff\xda")[1], (
        "vector must actually exercise byte stuffing"
    )
    px = decode_jpeg_luma(payload)
    assert px.shape == (16, 8)
    for i, blk in enumerate(blocks):
        np.testing.assert_array_equal(px[8 * i : 8 * i + 8], _ref_idct_block(blk))


def test_truncated_vector_fails_loudly():
    payload = _build_stream([{0: 3}], height=8)
    with pytest.raises(Exception):
        decode_jpeg_luma(payload[: len(payload) // 2])
