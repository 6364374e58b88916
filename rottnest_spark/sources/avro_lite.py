"""Minimal Apache Avro Object Container File codec — just enough to read
(and, for tests, write) Iceberg manifest-list / manifest files without
fastavro (not in this environment).

Implements the public Avro 1.11 spec (binary encoding + OCF framing):
- zigzag varint ints/longs, IEEE LE float/double, length-prefixed
  bytes/string, records (field order), enums (index), fixed, unions
  (branch index), arrays/maps (blocked, negative-count blocks carry a byte
  size), named-type references;
- OCF: magic `Obj\\x01`, file-metadata map (avro.schema / avro.codec),
  16-byte sync marker, then (count, byte-size, payload, sync) blocks;
  codecs: null + deflate (raw zlib).

The decoder is schema-driven (the writer schema embedded in the file), so
it reads manifests written by any engine; logical types are returned as
their underlying primitives — Iceberg's planner only needs paths, ints and
status enums.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# -- binary primitives -------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    """Zigzag varint (spec: int/long share the encoding)."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: io.BytesIO, v: int) -> None:
    v = (v << 1) ^ (v >> 63)
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


# -- schema-driven value codec ----------------------------------------------


class _Env(dict):
    """Named-type registry (record/enum/fixed can be referenced by name)."""


def _resolve(schema, env: _Env):
    if isinstance(schema, str) and schema in env:
        return env[schema]
    return schema


def _register(schema: dict, env: _Env) -> None:
    name = schema.get("name")
    if name:
        ns = schema.get("namespace")
        env[name] = schema
        if ns:
            env[f"{ns}.{name}"] = schema


def read_value(schema, buf: io.BytesIO, env: _Env):
    schema = _resolve(schema, env)
    if isinstance(schema, list):  # union: branch index then value
        idx = _read_long(buf)
        return read_value(schema[idx], buf, env)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            _register(schema, env)
            return {
                f["name"]: read_value(f["type"], buf, env)
                for f in schema["fields"]
            }
        if t == "enum":
            _register(schema, env)
            return schema["symbols"][_read_long(buf)]
        if t == "fixed":
            _register(schema, env)
            return buf.read(schema["size"])
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:  # negative count: a byte size follows (skippable)
                    n = -n
                    _read_long(buf)
                for _ in range(n):
                    out.append(read_value(schema["items"], buf, env))
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_long(buf)
                for _ in range(n):
                    k = _read_bytes(buf).decode()
                    out[k] = read_value(schema["values"], buf, env)
        return read_value(t, buf, env)  # e.g. {"type": "string", ...}
    # primitives
    if schema == "null":
        return None
    if schema == "boolean":
        return buf.read(1) == b"\x01"
    if schema in ("int", "long"):
        return _read_long(buf)
    if schema == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "string":
        return _read_bytes(buf).decode()
    raise ValueError(f"unsupported Avro schema: {schema!r}")


def write_value(schema, value, out: io.BytesIO, env: _Env) -> None:
    schema = _resolve(schema, env)
    if isinstance(schema, list):  # union: pick the first matching branch
        for i, branch in enumerate(schema):
            if _matches(branch, value, env):
                _write_long(out, i)
                write_value(branch, value, out, env)
                return
        raise ValueError(f"no union branch for {value!r} in {schema!r}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            _register(schema, env)
            for f in schema["fields"]:
                write_value(f["type"], value[f["name"]], out, env)
            return
        if t == "enum":
            _register(schema, env)
            _write_long(out, schema["symbols"].index(value))
            return
        if t == "fixed":
            _register(schema, env)
            out.write(value)
            return
        if t == "array":
            if value:
                _write_long(out, len(value))
                for v in value:
                    write_value(schema["items"], v, out, env)
            _write_long(out, 0)
            return
        if t == "map":
            if value:
                _write_long(out, len(value))
                for k, v in value.items():
                    _write_bytes(out, k.encode())
                    write_value(schema["values"], v, out, env)
            _write_long(out, 0)
            return
        write_value(t, value, out, env)
        return
    if schema == "null":
        return
    if schema == "boolean":
        out.write(b"\x01" if value else b"\x00")
        return
    if schema in ("int", "long"):
        _write_long(out, int(value))
        return
    if schema == "float":
        out.write(struct.pack("<f", value))
        return
    if schema == "double":
        out.write(struct.pack("<d", value))
        return
    if schema == "bytes":
        _write_bytes(out, value)
        return
    if schema == "string":
        _write_bytes(out, value.encode())
        return
    raise ValueError(f"unsupported Avro schema: {schema!r}")


def _matches(schema, value, env: _Env) -> bool:
    schema = _resolve(schema, env)
    if schema == "null":
        return value is None
    if value is None:
        return False
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return isinstance(value, dict)
        if t == "enum":
            return isinstance(value, str)
        if t == "array":
            return isinstance(value, list)
        if t == "map":
            return isinstance(value, dict)
        if t == "fixed":
            return isinstance(value, bytes)
        return _matches(t, value, env)
    if schema == "boolean":
        return isinstance(value, bool)
    if schema in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if schema in ("float", "double"):
        return isinstance(value, (int, float))
    if schema == "bytes":
        return isinstance(value, bytes)
    if schema == "string":
        return isinstance(value, str)
    return False


# -- object container file ---------------------------------------------------


def read_ocf(path: str, fs=None) -> tuple[dict, list]:
    """(writer_schema, records) from an Avro Object Container File.
    `fs` (a LakeFS) routes the byte read for remote stores; default is a
    plain local read."""
    if fs is not None:
        data = fs.read_bytes(path)
    else:
        with open(path, "rb") as fh:
            data = fh.read()
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    env = _Env()
    meta = read_value({"type": "map", "values": "bytes"}, buf, env)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"{path}: unsupported Avro codec {codec!r}")
    sync = buf.read(16)
    records: list = []
    while buf.tell() < len(data):
        n = _read_long(buf)
        size = _read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        block = io.BytesIO(payload)
        for _ in range(n):
            records.append(read_value(schema, block, _Env()))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch (corrupt block)")
    return schema, records


def write_ocf(
    path: str, schema: dict, records: list, codec: str = "null", fs=None
) -> None:
    """Write an OCF (tests + tooling). One block; null or deflate codec.
    `fs` (a LakeFS) routes the byte write for remote stores."""
    body = io.BytesIO()
    for rec in records:
        write_value(schema, rec, body, _Env())
    payload = body.getvalue()
    if codec == "deflate":
        payload = zlib.compress(payload)[2:-4]  # raw deflate per spec
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    write_value({"type": "map", "values": "bytes"}, meta, out, _Env())
    sync = b"\x00" * 8 + b"rottnest"  # any 16 bytes; constant keeps it simple
    out.write(sync)
    _write_long(out, len(records))
    _write_long(out, len(payload))
    out.write(payload)
    out.write(sync)
    if fs is not None:
        fs.write_bytes(path, out.getvalue())
    else:
        with open(path, "wb") as fh:
            fh.write(out.getvalue())
