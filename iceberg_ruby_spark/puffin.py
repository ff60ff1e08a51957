"""Puffin file format — the binary statistics container Iceberg tables
reference from ``statistics`` metadata entries.

Implements the Apache Iceberg Puffin spec structure (``puffin-spec.md``):

- file = Magic, Blob₁ … Blobₙ, Footer
- footer = Magic, FooterPayload (UTF-8 JSON FileMetadata, uncompressed
  here → flags 0), FooterPayloadSize (int32 LE), Flags (4 bytes),
  Magic
- FileMetadata = ``{"blobs": [BlobMetadata...], "properties": {...}}``
  with each BlobMetadata carrying ``type``, ``fields``, ``snapshot-id``,
  ``sequence-number``, ``offset``, ``length``, optional
  ``compression-codec`` and ``properties``.

The reference surfaces exactly these fields through iceberg-rust
(``ext/iceberg/src/statistics.rs:14-71``: blob type / fields / snapshot
id / sequence number / properties).  Blob kinds written:

- ``apache-datasketches-theta-v1`` — one per column whose type has an
  Iceberg single-value serialization: a REAL compact theta sketch
  (``theta_sketch.py``, built from scratch off the public DataSketches
  formats and held byte-identical to datasketches-java 6.2.0 in
  tests/test_theta_sketch.py), so external engines can deserialize and
  UNION these with their own; the Iceberg-conventional ``"ndv"`` blob
  property carries the estimate.
- ``iceberg-ruby-spark-ndv-v1`` — fallback for columns without a
  single-value serialization (arrays, maps, binary): payload = the NDV
  as an int64 LE with the same ``"ndv"`` property.
- ``iceberg-ruby-spark-stats-json-v1`` — the engine's full stats
  document as JSON, so ``read_statistics`` round-trips.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Optional

from iceberg_ruby_spark.errors import InvalidDataError

MAGIC = b"PFA1"


def write_puffin(
    blobs: list[dict[str, Any]],
    file_properties: Optional[dict[str, str]] = None,
) -> bytes:
    """Serialize blobs into a Puffin file.

    Each input dict: ``{"type": str, "fields": [int], "snapshot-id": int,
    "sequence-number": int, "payload": bytes, "properties": {str: str}}``.
    Returns the complete file bytes; blob offsets/lengths are computed
    here and recorded in the footer's FileMetadata."""
    out = bytearray(MAGIC)
    metas = []
    for b in blobs:
        payload: bytes = b["payload"]
        metas.append(
            {
                "type": b["type"],
                "fields": b.get("fields", []),
                "snapshot-id": b.get("snapshot-id"),
                "sequence-number": b.get("sequence-number"),
                "offset": len(out),
                "length": len(payload),
                "properties": b.get("properties", {}),
            }
        )
        out += payload
    footer_payload = json.dumps(
        {"blobs": metas, "properties": dict(file_properties or {})}
    ).encode("utf-8")
    out += MAGIC
    out += footer_payload
    out += struct.pack("<i", len(footer_payload))
    out += b"\x00\x00\x00\x00"  # flags: footer payload not compressed
    out += MAGIC
    return bytes(out)


def footer_size(data: bytes) -> int:
    """Size of the footer section (trailing Magic..Magic), the value
    table metadata records as ``file-footer-size-in-bytes``."""
    payload_size = struct.unpack("<i", data[-12:-8])[0]
    return 4 + payload_size + 4 + 4 + 4


def read_puffin(data: bytes) -> tuple[list[dict[str, Any]], dict[str, str]]:
    """Parse a Puffin file → (blobs-with-payloads, file properties)."""
    if data[:4] != MAGIC or data[-4:] != MAGIC:
        raise InvalidDataError("not a Puffin file (bad magic)")
    flags = data[-8:-4]
    if flags != b"\x00\x00\x00\x00":
        raise InvalidDataError(f"unsupported Puffin footer flags: {flags!r}")
    payload_size = struct.unpack("<i", data[-12:-8])[0]
    payload_end = len(data) - 12
    footer_payload = data[payload_end - payload_size : payload_end]
    if data[payload_end - payload_size - 4 : payload_end - payload_size] != MAGIC:
        raise InvalidDataError("corrupt Puffin footer (missing inner magic)")
    meta = json.loads(footer_payload.decode("utf-8"))
    blobs = []
    for bm in meta.get("blobs", []):
        off, ln = bm["offset"], bm["length"]
        blobs.append({**bm, "payload": data[off : off + ln]})
    return blobs, meta.get("properties", {})


NDV_BLOB_TYPE = "iceberg-ruby-spark-ndv-v1"
THETA_BLOB_TYPE = "apache-datasketches-theta-v1"
STATS_JSON_BLOB_TYPE = "iceberg-ruby-spark-stats-json-v1"


def stats_to_puffin(
    stats: dict[str, Any],
    field_ids: dict[str, Optional[int]],
    sequence_number: int,
    sketches: Optional[dict[str, bytes]] = None,
) -> bytes:
    """The engine's stats document as a Puffin file: one NDV blob per
    column (a compact theta sketch where ``sketches`` provides one, the
    int64 fallback otherwise) plus the full JSON document blob (see
    module docstring)."""
    sid = stats["snapshot-id"]
    sketches = sketches or {}
    blobs = [
        {
            "type": THETA_BLOB_TYPE if c in sketches else NDV_BLOB_TYPE,
            "fields": [field_ids.get(c)],
            "snapshot-id": sid,
            "sequence-number": sequence_number,
            "payload": sketches.get(c) or struct.pack("<q", int(col["ndv"])),
            "properties": {"ndv": str(col["ndv"])},
        }
        for c, col in stats["columns"].items()
    ]
    blobs.append(
        {
            "type": STATS_JSON_BLOB_TYPE,
            "fields": sorted(
                (i for i in field_ids.values() if i is not None)
            ),
            "snapshot-id": sid,
            "sequence-number": sequence_number,
            "payload": json.dumps(stats).encode("utf-8"),
            "properties": {},
        }
    )
    return write_puffin(blobs, {"created-by": "iceberg_ruby_spark"})


def stats_from_puffin(data: bytes) -> dict[str, Any]:
    """Inverse of :func:`stats_to_puffin` (reads the JSON document blob)."""
    blobs, _ = read_puffin(data)
    for b in blobs:
        if b["type"] == STATS_JSON_BLOB_TYPE:
            return json.loads(b["payload"].decode("utf-8"))
    raise InvalidDataError("Puffin file carries no engine stats blob")
