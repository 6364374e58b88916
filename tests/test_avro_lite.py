"""avro_lite: spec conformance (golden bytes computed by hand from the
Avro 1.11 spec — independent of our own writer) + round-trips."""

import io

import pytest

from rottnest_spark.sources.avro_lite import (
    _Env,
    read_ocf,
    read_value,
    write_ocf,
    write_value,
)


def test_zigzag_golden():
    # spec examples: 0→00, -1→01, 1→02, -2→03, 2→04, -64→7f, 64→80 01
    cases = {0: b"\x00", -1: b"\x01", 1: b"\x02", -2: b"\x03", 2: b"\x04",
             -64: b"\x7f", 64: b"\x80\x01"}
    for v, enc in cases.items():
        assert read_value("long", io.BytesIO(enc), _Env()) == v
        out = io.BytesIO()
        write_value("long", v, out, _Env())
        assert out.getvalue() == enc


def test_record_golden_bytes():
    """{"a": 3, "b": "hi"} under record(a long, b string):
    zigzag(3)=0x06; "hi" = len zigzag(2)=0x04 + b'hi'."""
    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "a", "type": "long"}, {"name": "b", "type": "string"}],
    }
    assert read_value(schema, io.BytesIO(b"\x06\x04hi"), _Env()) == {
        "a": 3,
        "b": "hi",
    }


def test_union_and_array_golden():
    # union [null, long] value 7 → branch idx zigzag(1)=0x02 then zigzag(7)=0x0e
    assert read_value(["null", "long"], io.BytesIO(b"\x02\x0e"), _Env()) == 7
    # array<long> [1,2] → count 0x04, items 0x02 0x04, terminator 0x00
    schema = {"type": "array", "items": "long"}
    assert read_value(schema, io.BytesIO(b"\x04\x02\x04\x00"), _Env()) == [1, 2]
    # negative block count: -2 → 0x03, then byte-size (2 → 0x04), items, 0x00
    assert read_value(schema, io.BytesIO(b"\x03\x04\x02\x04\x00"), _Env()) == [1, 2]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip_nested(tmp_path, codec):
    schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": ["null", "long"]},
            {
                "name": "data_file",
                "type": {
                    "type": "record",
                    "name": "data_file_r",
                    "fields": [
                        {"name": "content", "type": "int"},
                        {"name": "file_path", "type": "string"},
                        {"name": "file_format", "type": "string"},
                        {"name": "record_count", "type": "long"},
                        {
                            "name": "tags",
                            "type": {"type": "map", "values": "string"},
                        },
                        {
                            "name": "split_offsets",
                            "type": ["null", {"type": "array", "items": "long"}],
                        },
                    ],
                },
            },
        ],
    }
    recs = [
        {
            "status": 1,
            "snapshot_id": 42,
            "data_file": {
                "content": 0,
                "file_path": "data/x.parquet",
                "file_format": "PARQUET",
                "record_count": 1000,
                "tags": {"k": "v"},
                "split_offsets": [4, 1024],
            },
        },
        {
            "status": 2,
            "snapshot_id": None,
            "data_file": {
                "content": 0,
                "file_path": "data/y.parquet",
                "file_format": "PARQUET",
                "record_count": 5,
                "tags": {},
                "split_offsets": None,
            },
        },
    ]
    p = str(tmp_path / f"t_{codec}.avro")
    write_ocf(p, schema, recs, codec=codec)
    got_schema, got = read_ocf(p)
    assert got == recs
    assert got_schema["name"] == "manifest_entry"


_REC_SCHEMA = {
    "type": "record",
    "name": "prop_rec",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "maybe", "type": ["null", "long"]},
        {"name": "xs", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "string"}},
        {"name": "b", "type": "boolean"},
        {"name": "d", "type": "double"},
    ],
}


def test_property_roundtrip(tmp_path):
    """Hypothesis: arbitrary values under the manifest-like schema survive
    write→read bit-exactly (the hand-rolled codec's safety net)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    longs = st.integers(min_value=-(2**62), max_value=2**62)
    texts = st.text(max_size=20)
    recs = st.fixed_dictionaries(
        {
            "i": longs,
            "s": texts,
            "maybe": st.one_of(st.none(), longs),
            "xs": st.lists(longs, max_size=5),
            "m": st.dictionaries(texts, texts, max_size=4),
            "b": st.booleans(),
            "d": st.floats(allow_nan=False, allow_infinity=False),
        }
    )

    @settings(max_examples=30, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(rows=st.lists(recs, max_size=8))
    def check(rows):
        import os
        import uuid

        p = str(tmp_path / f"prop_{uuid.uuid4().hex}.avro")
        try:
            write_ocf(p, _REC_SCHEMA, rows, codec="deflate")
            _, got = read_ocf(p)
            assert got == rows
        finally:
            if os.path.exists(p):
                os.remove(p)

    check()


def test_unknown_codec_refused(tmp_path):
    p = str(tmp_path / "t.avro")
    write_ocf(p, {"type": "record", "name": "r", "fields": []}, [{}])
    data = open(p, "rb").read().replace(b"null", b"zstd")
    open(p, "wb").write(data)
    with pytest.raises(ValueError, match="codec"):
        read_ocf(p)
