"""RoaringBitmapArray codec for Delta Lake deletion vectors — the public
on-disk format only (Delta PROTOCOL.md "Deletion Vector Format" +
RoaringFormatSpec https://github.com/RoaringBitmap/RoaringFormatSpec).

A Delta deletion vector stores the DELETED row indexes of one data file
as a "RoaringBitmapArray": 64-bit values bucketed by their upper 32 bits,
one standard 32-bit Roaring bitmap per bucket, serialized in the
"portable" layout:

    int32 LE magic 1681511377
    int64 LE number of 32-bit bitmaps
    per bitmap: the standard Roaring portable serialization
        int16 cookie (12346 no-run / 12347 run-capable) ...
        containers: array (sorted uint16s) / bitset (1024 uint64 words) /
        run (count + [start, len-1] pairs)

and wrapped in the DV FILE layout:

    byte 0: format version (1)
    at `offset`: int32 BE length, <length bytes of bitmap>, int32 BE
    CRC-32 checksum of those bytes

Inline DVs ("storageType": "i") carry Z85-encoded bitmap bytes directly
in the log; UUID DVs ("u") name a `deletion_vector_<uuid>.bin` sibling
file via a Z85-encoded UUID; "p" is an absolute path.

DECODE lives inside `make_dv_decoder()` as a self-contained closure
(repo convention, core/layout.py:33 — cloudpickle ships it by value so
executors never need the package importable); module-level wrappers
delegate to one shared instance for driver-side use and tests. ENCODE runs
executor-side too (the delete writer serializes one bitmap per affected
file inside applyInPandas, and per-task .bin packing writes them — the
driver only ever sees descriptors). Decode cost is numpy-vectorized per container, linear in
container count rather than cardinality.
"""

from __future__ import annotations

import struct

import numpy as np

PORTABLE_MAGIC = 1681511377
SERIAL_COOKIE_NO_RUN = 12346
SERIAL_COOKIE_RUN = 12347

#: ZeroMQ Z85 alphabet (the Delta protocol's inline/UUID DV encoding)
Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)


def make_dv_decoder():
    """Returns decode(data: bytes, offset: int|None) -> np.ndarray of
    uint64 deleted row indexes, plus z85_decode as an attribute. Fully
    self-contained closure: struct/zlib/numpy only, no package refs.

    `offset=None` decodes a bare serialized bitmap (inline DVs);
    an int offset applies the DV FILE layout (length + CRC) first."""
    import struct as _struct
    import zlib as _zlib

    import numpy as _np

    # module constants bound to LOCALS at factory time: the closure must
    # reference no module globals, or cloudpickle would pickle them by
    # module reference and executors would need the package importable
    _z85_index = {c: i for i, c in enumerate(Z85_CHARS)}
    _no_run, _run = SERIAL_COOKIE_NO_RUN, SERIAL_COOKIE_RUN
    _magic = PORTABLE_MAGIC

    def z85_decode(s: str) -> bytes:
        if len(s) % 5:
            raise ValueError(f"Z85 length {len(s)} not a multiple of 5")
        out = bytearray()
        for i in range(0, len(s), 5):
            v = 0
            for c in s[i : i + 5]:
                v = v * 85 + _z85_index[c]
            out += v.to_bytes(4, "big")
        return bytes(out)

    def _decode32(buf, pos):
        (cookie16,) = _struct.unpack_from("<H", buf, pos)
        if cookie16 == _run:
            (n,) = _struct.unpack_from("<H", buf, pos + 2)
            n += 1
            pos += 4
            nrb = (n + 7) // 8
            run_flags = _np.unpackbits(
                _np.frombuffer(buf, _np.uint8, nrb, pos),
                bitorder="little",
            )[:n].astype(bool)
            pos += nrb
            has_offsets = n >= 4  # NO_OFFSET_THRESHOLD
        else:
            (cookie32,) = _struct.unpack_from("<I", buf, pos)
            if cookie32 != _no_run:
                raise ValueError(f"not a roaring bitmap (cookie {cookie32})")
            (n,) = _struct.unpack_from("<I", buf, pos + 4)
            pos += 8
            run_flags = _np.zeros(n, bool)
            has_offsets = True
        desc = _np.frombuffer(buf, _np.uint16, 2 * n, pos).reshape(-1, 2)
        keys = desc[:, 0].astype(_np.uint32)
        cards = desc[:, 1].astype(_np.int64) + 1
        pos += 4 * n
        if has_offsets:
            pos += 4 * n  # offset header — sequential decode skips it
        parts = []
        for i in range(n):
            base = keys[i] << 16
            if run_flags[i]:
                (n_runs,) = _struct.unpack_from("<H", buf, pos)
                pos += 2
                runs = _np.frombuffer(
                    buf, _np.uint16, 2 * n_runs, pos
                ).reshape(-1, 2)
                pos += 4 * n_runs
                vals = (
                    _np.concatenate(
                        [
                            _np.arange(s, s + ln + 1, dtype=_np.uint32)
                            for s, ln in runs
                        ]
                    )
                    if n_runs
                    else _np.empty(0, _np.uint32)
                )
            elif cards[i] > 4096:  # bitset container
                words = _np.frombuffer(buf, _np.uint64, 1024, pos)
                pos += 8192
                bits = _np.unpackbits(
                    words.view(_np.uint8), bitorder="little"
                )
                vals = _np.nonzero(bits)[0].astype(_np.uint32)
            else:  # array container
                vals = _np.frombuffer(
                    buf, _np.uint16, int(cards[i]), pos
                ).astype(_np.uint32)
                pos += 2 * int(cards[i])
            parts.append(base + vals)
        values = (
            _np.concatenate(parts) if parts else _np.empty(0, _np.uint32)
        )
        return values, pos

    def decode(data: bytes, offset: int | None = None) -> "object":
        buf = memoryview(data)
        if offset is not None:  # DV file layout: length + payload + CRC
            (length,) = _struct.unpack_from(">i", buf, offset)
            payload = bytes(buf[offset + 4 : offset + 4 + length])
            (crc,) = _struct.unpack_from(">I", buf, offset + 4 + length)
            if _zlib.crc32(payload) & 0xFFFFFFFF != crc:
                raise ValueError(
                    f"deletion vector CRC mismatch at offset {offset}"
                )
            buf = memoryview(payload)
        magic, n_bitmaps = _struct.unpack_from("<iq", buf, 0)
        if magic != _magic:
            raise ValueError(
                f"bad RoaringBitmapArray magic {magic}"
            )
        pos = 12
        parts = []
        for _ in range(n_bitmaps):
            (key,) = _struct.unpack_from("<I", buf, pos)
            pos += 4
            vals, pos = _decode32(buf, pos)
            parts.append(
                (_np.uint64(key) << _np.uint64(32)) + vals.astype(_np.uint64)
            )
        return (
            _np.concatenate(parts) if parts else _np.empty(0, _np.uint64)
        )

    decode.z85_decode = z85_decode
    return decode


_DECODE = make_dv_decoder()


def z85_decode(s: str) -> bytes:
    return _DECODE.z85_decode(s)


def z85_encode(b: bytes) -> str:
    """Bytes → Z85 (input length must be a multiple of 4)."""
    if len(b) % 4:
        raise ValueError(f"Z85 input length {len(b)} not a multiple of 4")
    out = []
    for i in range(0, len(b), 4):
        v = int.from_bytes(b[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def roaring64_decode(data: bytes) -> np.ndarray:
    """Serialized RoaringBitmapArray → sorted uint64 row indexes."""
    return _DECODE(data)


def dv_decode_at(data: bytes, offset: int) -> np.ndarray:
    """Row indexes of the DV stored at `offset` inside DV file bytes
    (CRC-verified)."""
    return _DECODE(data, offset)


def make_dv_encoder():
    """Returns encode(positions) -> serialized RoaringBitmapArray bytes.
    Self-contained closure (struct/numpy only) so the delete writer can
    encode bitmaps EXECUTOR-side (one applyInPandas group per file —
    driver memory stays bitmap-scale, never position-scale).

    Container choice: array (card ≤ 4096) else bitset — run containers
    are never EMITTED (optional per the spec; decoders must accept them,
    writers need not produce them)."""
    import struct as _struct

    import numpy as _np

    _magic, _no_run = PORTABLE_MAGIC, SERIAL_COOKIE_NO_RUN

    def _encode32(values):
        out = bytearray()
        hi = (values >> 16).astype(_np.uint32)
        keys, starts = _np.unique(hi, return_index=True)
        bounds = list(starts) + [len(values)]
        out += _struct.pack("<I", _no_run)
        out += _struct.pack("<I", len(keys))
        cards = [bounds[i + 1] - bounds[i] for i in range(len(keys))]
        for k, c in zip(keys, cards):
            out += _struct.pack("<HH", int(k), c - 1)
        off = len(out) + 4 * len(keys)  # offset header: required, no-run
        for c in cards:
            out += _struct.pack("<I", off)
            off += 2 * c if c <= 4096 else 8192
        for i, c in enumerate(cards):
            lows = (values[bounds[i] : bounds[i + 1]] & 0xFFFF).astype(
                _np.uint16
            )
            if c <= 4096:
                out += lows.tobytes()
            else:
                bits = _np.zeros(65536, _np.uint8)
                bits[lows] = 1
                out += _np.packbits(bits, bitorder="little").tobytes()
        return bytes(out)

    def encode(positions) -> bytes:
        values = _np.unique(_np.asarray(positions, _np.uint64))
        hi = (values >> _np.uint64(32)).astype(_np.uint32)
        keys, starts = _np.unique(hi, return_index=True)
        bounds = list(starts) + [len(values)]
        out = bytearray(_struct.pack("<iq", _magic, len(keys)))
        for i, k in enumerate(keys):
            lows = (
                values[bounds[i] : bounds[i + 1]] & _np.uint64(0xFFFFFFFF)
            ).astype(_np.uint32)
            out += _struct.pack("<I", int(k))
            out += _encode32(lows)
        return bytes(out)

    return encode


_ENCODE = make_dv_encoder()


def roaring64_encode(positions) -> bytes:
    """Row indexes (any int iterable/array) → serialized
    RoaringBitmapArray (sorted, deduplicated)."""
    return _ENCODE(positions)


def dv_file_bytes(bitmap: bytes) -> bytes:
    """Wrap one serialized bitmap in the Delta DV FILE layout (format
    version byte, BE length, payload, BE CRC-32). The bitmap lands at
    offset 1 — the add action's `offset` field."""
    import zlib

    return (
        b"\x01"
        + struct.pack(">i", len(bitmap))
        + bitmap
        + struct.pack(">I", zlib.crc32(bitmap) & 0xFFFFFFFF)
    )
