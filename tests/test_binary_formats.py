"""Property-based round trips for the two hand-rolled binary containers
(Avro OCF in avro_file.py, Puffin in puffin.py).  Neither module touches
Spark, so these run fast and shake the encoders with adversarial values
— negative zigzag longs, empty/unicode strings, null unions, random
binary payloads — beyond what the fixture-driven tests reach."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_ruby_spark.avro_file import read_ocf, write_ocf
from iceberg_ruby_spark.puffin import (
    footer_size,
    read_puffin,
    write_puffin,
)

_SCHEMA = {
    "type": "record",
    "name": "row",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "flag", "type": "boolean"},
        {"name": "name", "type": ["null", "string"], "default": None},
        {"name": "payload", "type": ["null", "bytes"], "default": None},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "long"}},
    ],
}

_row = st.fixed_dictionaries(
    {
        "id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "flag": st.booleans(),
        "name": st.one_of(st.none(), st.text(max_size=40)),
        "payload": st.one_of(st.none(), st.binary(max_size=64)),
        "score": st.floats(allow_nan=False, width=64),
        "tags": st.lists(
            st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=8
        ),
    }
)


@settings(max_examples=60, deadline=None)
@given(rows=st.lists(_row, max_size=25), codec=st.sampled_from(["null", "deflate"]))
def test_ocf_roundtrip(rows, codec):
    meta = {"k": "v", "n": "42"}
    data = write_ocf(_SCHEMA, rows, metadata=meta, codec=codec)
    schema, back, file_meta = read_ocf(data)
    assert schema["name"] == "row"
    assert back == rows
    assert file_meta["k"] == b"v" and file_meta["n"] == b"42"


_blob = st.fixed_dictionaries(
    {
        "type": st.sampled_from(["t-a", "t-b", "t-c"]),
        "fields": st.lists(st.integers(min_value=1, max_value=500), max_size=4),
        "snapshot-id": st.integers(min_value=0, max_value=2**62),
        "sequence-number": st.integers(min_value=0, max_value=10_000),
        "payload": st.binary(max_size=128),
        "properties": st.dictionaries(
            st.text(min_size=1, max_size=8), st.text(max_size=8), max_size=3
        ),
    }
)


@settings(max_examples=60, deadline=None)
@given(blobs=st.lists(_blob, max_size=8), props=st.dictionaries(st.text(min_size=1, max_size=8), st.text(max_size=8), max_size=3))
def test_puffin_roundtrip(blobs, props):
    data = write_puffin(blobs, props)
    assert data[:4] == b"PFA1" and data[-4:] == b"PFA1"
    back, file_props = read_puffin(data)
    assert file_props == props
    assert len(back) == len(blobs)
    for orig, got in zip(blobs, back):
        assert got["payload"] == orig["payload"]
        assert got["type"] == orig["type"]
        assert got["fields"] == orig["fields"]
        assert got["snapshot-id"] == orig["snapshot-id"]
        assert got["properties"] == orig["properties"]
    # footer size arithmetic holds for any payload mix
    assert 0 < footer_size(data) < len(data)
