"""Pure-Python Apache Avro binary encoding + Object Container Files.

Iceberg manifests and manifest lists are Avro OCF files (Iceberg table
spec, "Manifests"); the reference gets spec-compliant metadata for free
by delegating commits to iceberg-rust
(``/root/reference/ext/iceberg/src/table.rs:62-125``) which writes Avro
via the apache-avro crate.  This environment has no Python avro package
and no ``spark-avro`` jar, so this module implements the (public, small)
Avro 1.11 binary spec directly:

- zig-zag varint ``int``/``long``; IEEE754 little-endian float/double;
  length-prefixed ``bytes``/``string``; ``fixed`` raw; ``enum`` as index;
  ``record`` as field concatenation; ``array``/``map`` as counted blocks
  with a 0 terminator (negative counts carry a block byte size); ``union``
  as zig-zag branch index then value.
- OCF: magic ``Obj\\x01``, file-metadata map (``avro.schema``,
  ``avro.codec``, arbitrary app keys — Iceberg puts ``schema``,
  ``partition-spec``, ``format-version`` … here), 16-byte sync marker,
  then data blocks of (record count, byte length, payload, sync).
  Codecs: ``null`` and ``deflate`` (raw DEFLATE, ``zlib`` wbits=-15).

Reading uses the embedded writer schema (no reader-schema resolution —
we always read files we or another Iceberg engine wrote whole).  The
JVM-side round-trip test (tests/test_avro_manifests.py) decodes files
written here with ``org.apache.avro``'s DataFileReader from Spark's own
classpath — an independent decoder, so an encoding bug cannot hide.
"""

from __future__ import annotations

import io as _io
import json
import os
import struct
import zlib
from typing import Any, Iterable, Optional

MAGIC = b"Obj\x01"

# --------------------------------------------------------------------------
# binary primitives
# --------------------------------------------------------------------------


def _zigzag(n: int) -> int:
    # Python ints are arbitrary-width, so the usual (n << 1) ^ (n >> 63)
    # trick is wrong for negatives — use the direct formula.
    return (n << 1) if n >= 0 else ((-n) << 1) - 1


def _unzigzag(n: int) -> int:
    return (n >> 1) if (n & 1) == 0 else -((n + 1) >> 1)


def _encode_long(out: _io.BytesIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        if len(b) != n:
            raise ValueError("avro: truncated input")
        self.pos += n
        return b

    def read_long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                return _unzigzag(acc)
            shift += 7

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


# --------------------------------------------------------------------------
# schema-driven encode / decode
# --------------------------------------------------------------------------


def _type_name(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _encode(out: _io.BytesIO, schema: Any, value: Any, names: dict[str, Any]) -> None:
    t = _type_name(schema)
    if isinstance(schema, str) and schema in names:
        _encode(out, names[schema], value, names)
        return
    if t == "null":
        if value is not None:
            raise TypeError(f"avro: expected null, got {value!r}")
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
        return
    if t in ("int", "long"):
        _encode_long(out, int(value))
        return
    if t == "float":
        out.write(struct.pack("<f", float(value)))
        return
    if t == "double":
        out.write(struct.pack("<d", float(value)))
        return
    if t == "bytes":
        if isinstance(value, str):
            value = value.encode("utf-8")
        _encode_long(out, len(value))
        out.write(bytes(value))
        return
    if t == "string":
        b = value.encode("utf-8") if isinstance(value, str) else bytes(value)
        _encode_long(out, len(b))
        out.write(b)
        return
    if t == "fixed":
        b = bytes(value)
        if len(b) != schema["size"]:
            raise TypeError(f"avro: fixed size {schema['size']} != {len(b)}")
        out.write(b)
        return
    if t == "enum":
        _encode_long(out, schema["symbols"].index(value))
        return
    if t == "union":
        idx = _union_branch(schema, value)
        _encode_long(out, idx)
        _encode(out, schema[idx], value, names)
        return
    if t == "record":
        _register(schema, names)
        for f in schema["fields"]:
            if f["name"] not in value and "default" in f:
                fv = f["default"]
            else:
                fv = value.get(f["name"])
            _encode(out, f["type"], fv, names)
        return
    if t == "array":
        items = list(value or [])
        if items:
            _encode_long(out, len(items))
            for it in items:
                _encode(out, schema["items"], it, names)
        _encode_long(out, 0)
        return
    if t == "map":
        entries = dict(value or {})
        if entries:
            _encode_long(out, len(entries))
            for k, v in entries.items():
                b = str(k).encode("utf-8")
                _encode_long(out, len(b))
                out.write(b)
                _encode(out, schema["values"], v, names)
        _encode_long(out, 0)
        return
    raise TypeError(f"avro: unsupported schema {schema!r}")


def _union_branch(union: list, value: Any) -> int:
    """Pick the union branch for a Python value.  Iceberg unions are always
    ``["null", X]`` (optional fields), so None→null and anything else→X;
    the general fallback matches by type tag."""
    for i, s in enumerate(union):
        if _type_name(s) == "null" and value is None:
            return i
    if value is None:
        raise TypeError("avro: None for non-nullable union")
    for i, s in enumerate(union):
        if _type_name(s) != "null":
            return i
    raise TypeError(f"avro: no branch for {value!r} in {union!r}")


def _register(schema: Any, names: dict[str, Any]) -> None:
    if isinstance(schema, dict):
        n = schema.get("name")
        if n and schema.get("type") in ("record", "enum", "fixed"):
            names.setdefault(n, schema)


def _decode(r: _Reader, schema: Any, names: dict[str, Any]) -> Any:
    t = _type_name(schema)
    if isinstance(schema, str) and schema in names:
        return _decode(r, names[schema], names)
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) == b"\x01"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read(r.read_long())
    if t == "string":
        return r.read(r.read_long()).decode("utf-8")
    if t == "fixed":
        return r.read(schema["size"])
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "union":
        return _decode(r, schema[r.read_long()], names)
    if t == "record":
        _register(schema, names)
        return {f["name"]: _decode(r, f["type"], names) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                return out
            if n < 0:
                n = -n
                r.read_long()  # block byte size — skip
            for _ in range(n):
                out.append(_decode(r, schema["items"], names))
    if t == "map":
        out_m: dict[str, Any] = {}
        while True:
            n = r.read_long()
            if n == 0:
                return out_m
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read(r.read_long()).decode("utf-8")
                out_m[k] = _decode(r, schema["values"], names)
    raise TypeError(f"avro: unsupported schema {schema!r}")


# --------------------------------------------------------------------------
# object container files
# --------------------------------------------------------------------------

_META_SCHEMA = {"type": "map", "values": "bytes"}


def write_ocf(
    schema: dict[str, Any],
    records: Iterable[dict[str, Any]],
    metadata: Optional[dict[str, str]] = None,
    codec: str = "deflate",
    sync: Optional[bytes] = None,
) -> bytes:
    """Serialize ``records`` under ``schema`` into one OCF byte string.
    Manifests are single-digit-KB to low-MB — one data block is fine (the
    spec allows any blocking; readers stream blocks regardless)."""
    names: dict[str, Any] = {}
    body = _io.BytesIO()
    count = 0
    for rec in records:
        _encode(body, schema, rec, names)
        count += 1
    payload = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        payload = comp.compress(payload) + comp.flush()
    elif codec != "null":
        raise ValueError(f"avro: unsupported codec {codec!r}")

    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    for k, v in (metadata or {}).items():
        meta[k] = v.encode() if isinstance(v, str) else bytes(v)
    sync = sync or os.urandom(16)
    out = _io.BytesIO()
    out.write(MAGIC)
    _encode(out, _META_SCHEMA, meta, {})
    out.write(sync)
    if count:
        _encode_long(out, count)
        _encode_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    return out.getvalue()


def read_ocf(data: bytes) -> tuple[dict[str, Any], list[dict[str, Any]], dict[str, bytes]]:
    """→ (writer schema, records, file metadata)."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError("avro: bad magic")
    meta = _decode(r, _META_SCHEMA, {})
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = r.read(16)
    records: list[dict[str, Any]] = []
    names: dict[str, Any] = {}
    while not r.at_end():
        n = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"avro: unsupported codec {codec!r}")
        br = _Reader(block)
        for _ in range(n):
            records.append(_decode(br, schema, names))
        if r.read(16) != sync:
            raise ValueError("avro: sync marker mismatch")
    return schema, records, meta
