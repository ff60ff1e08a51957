"""A from-scratch Iceberg SPEC reader used only to verify interop.

Reconstructs a table's live rows using NOTHING but spec artifacts:

- the Avro manifest list + manifests, decoded by the JVM's own
  ``org.apache.avro`` DataFileReader (an independent decoder — none of
  this repo's Avro code runs);
- the manifest metadata's ``schema`` / ``partition-spec`` JSON documents
  (spec-defined keys, not the engine's ``x-irs`` extras, which are
  deliberately ignored here);
- parquet data files column-mapped BY FIELD-ID from the footers (not by
  name — the point: renamed columns must still bind);
- positional deletes applied from spec ``(file_path, pos)`` columns,
  where ``pos`` is the row ordinal in the data file;
- equality deletes applied by field-id with Iceberg's sequence-number
  rule (a delete at sequence N applies to data files with data
  sequence < N);
- identity-partition columns reconstructed from the manifest partition
  tuples (Spark's layout stores them in the directory, not the file —
  exactly why the spec puts the tuple in the manifest).

If this reader and the engine agree row-for-row, an external Iceberg
implementation reading the same metadata would too.
"""

from __future__ import annotations

import json

import pyarrow.parquet as pq


def _jvm_read(spark, path):
    jvm = spark._jvm
    reader = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    try:
        meta = {
            k: reader.getMetaString(k)
            for k in ("schema", "partition-spec", "partition-spec-id", "content")
            if reader.getMetaString(k) is not None
        }
        records = []
        while reader.hasNext():
            records.append(json.loads(str(reader.next())))
        return records, meta
    finally:
        reader.close()


# reserved field ids of the materialized v3 row-lineage columns
_ROW_ID_FID = 2147483540
_LAST_SEQ_FID = 2147483539


def read_spec_rows(
    spark, manifest_list_path: str, with_lineage: bool = False
) -> list[dict]:
    """All live rows of the snapshot the manifest list describes.

    ``with_lineage=True`` adds ``_row_id`` per the v3 spec rules using
    ONLY spec artifacts: a row's id is the file's ``first_row_id``
    (manifest field 142) plus its position, unless the file carries a
    materialized ``_row_id`` column (reserved field id 2147483540, from a
    lineage-preserving rewrite) with a non-null cell."""
    list_records, _ = _jvm_read(spark, manifest_list_path)

    data_files = []   # (path, data_seq, partition_tuple, identity_fields)
    pos_deletes = []  # path
    eq_deletes = []   # (path, delete_seq, equality_ids)
    name_by_fid: dict[int, str] = {}

    for mf in list_records:
        recs, meta = _jvm_read(spark, mf["manifest_path"])
        schema_doc = json.loads(meta["schema"])
        for f in schema_doc.get("fields", []):
            name_by_fid[f["id"]] = f["name"]
        spec_doc = json.loads(meta.get("partition-spec", "[]"))
        identity_fields = [
            (p["name"], p["source-id"])
            for p in spec_doc
            if p.get("transform") == "identity"
        ]
        for r in recs:
            seq = r["sequence_number"]
            if seq is None:
                seq = mf["sequence_number"]  # ADDED entries inherit
            d = r["data_file"]
            if d["content"] == 0:
                data_files.append(
                    (
                        d["file_path"],
                        seq,
                        d.get("partition") or {},
                        identity_fields,
                        d.get("first_row_id"),
                    )
                )
            elif d["content"] == 1:
                # v3 manifests carry the deletion-vector blob coordinates
                # in spec fields 143-145; v2 positional entries have none
                coords = None
                if d.get("referenced_data_file") is not None:
                    coords = (
                        d["referenced_data_file"],
                        d["content_offset"],
                        d["content_size_in_bytes"],
                    )
                pos_deletes.append((d["file_path"], coords))
            else:
                eq_deletes.append((d["file_path"], seq, d.get("equality_ids") or []))

    def _decode_dv_blob(spark, data, offset, length):
        """Decode one deletion-vector-v1 blob (len BE + magic D1D33964 +
        portable roaring + crc) with the JVM's own Roaring64NavigableMap —
        independent of the engine's encoder."""
        b = data[offset : offset + length]
        vec_len = int.from_bytes(b[:4], "big")
        assert b[4:8] == b"\xd1\xd39d"
        jvm = spark._jvm
        nm = jvm.org.roaringbitmap.longlong.Roaring64NavigableMap()
        nm.deserializePortable(
            jvm.java.io.DataInputStream(
                jvm.java.io.ByteArrayInputStream(bytearray(b[8 : 4 + vec_len]))
            )
        )
        out = []
        it = nm.iterator()
        while it.hasNext():
            out.append(it.next())
        return out

    dead: dict[str, set[int]] = {}
    for path, coords in pos_deletes:
        if path.endswith(".puffin"):
            with open(path, "rb") as f:
                data = f.read()
            # the PUFFIN FOOTER is a spec artifact too (Magic + JSON
            # FileMetadata + size + flags + Magic) — parsed either as the
            # v2 discovery path or as a cross-check of the v3 coordinates
            assert data[-4:] == b"PFA1" and data[:4] == b"PFA1"
            payload_size = int.from_bytes(data[-12:-8], "little")
            footer = json.loads(data[-12 - payload_size : -12])
            if coords is not None:
                # v3: fetch EXACTLY the one vector the manifest entry's
                # fields 143-145 address — no footer parse needed to read;
                # the footer must agree (cross-check) on both the blob
                # coordinates and the referenced file
                ref, offset, length = coords
                twin = [
                    blob
                    for blob in footer["blobs"]
                    if blob["offset"] == offset and blob["length"] == length
                ]
                assert len(twin) == 1, "manifest DV coordinates not in footer"
                assert twin[0]["type"] == "deletion-vector-v1"
                assert twin[0]["properties"]["referenced-data-file"] == ref
                for v in _decode_dv_blob(spark, data, offset, length):
                    dead.setdefault(ref, set()).add(v)
                continue
            # v2 metadata (no coordinate slots): discover every blob from
            # the footer
            for blob in footer["blobs"]:
                if blob["type"] != "deletion-vector-v1":
                    continue
                ref = blob["properties"]["referenced-data-file"]
                for v in _decode_dv_blob(spark, data, blob["offset"], blob["length"]):
                    dead.setdefault(ref, set()).add(v)
            continue
        t = pq.read_table(path)
        for fp, pos in zip(t.column("file_path").to_pylist(), t.column("pos").to_pylist()):
            dead.setdefault(fp, set()).add(pos)

    eq_tuples = []  # (delete_seq, {fid: value} per key row)
    for path, dseq, fids in eq_deletes:
        t = pq.read_table(path)
        cols = {}
        for field in pq.read_schema(path):
            fid = int(field.metadata[b"PARQUET:field_id"])
            cols[fid] = t.column(field.name).to_pylist()
        n = t.num_rows
        for i in range(n):
            eq_tuples.append((dseq, {fid: cols[fid][i] for fid in fids}))

    rows = []
    for path, dseq, partition, identity_fields, first_row_id in data_files:
        sch = pq.read_schema(path)
        t = pq.read_table(path)
        col_by_fid = {
            int(f.metadata[b"PARQUET:field_id"]): t.column(f.name).to_pylist()
            for f in sch
            if f.metadata and b"PARQUET:field_id" in f.metadata
        }
        # identity partition values come from the manifest tuple (the
        # avro record field name is the sanitized partition name)
        part_by_fid = {}
        for pname, source_id in identity_fields:
            if pname in partition:
                part_by_fid[source_id] = partition[pname]
        materialized_ids = col_by_fid.get(_ROW_ID_FID)
        for idx in range(t.num_rows):
            if idx in dead.get(path, set()):
                continue
            # project the TABLE SCHEMA's fields only — files may carry
            # reserved columns (materialized row lineage in rewritten
            # files) that a plain read must not surface
            vals = {
                fid: col[idx]
                for fid, col in col_by_fid.items()
                if fid in name_by_fid
            }
            vals.update(part_by_fid)
            if any(
                del_seq > dseq and all(vals.get(fid) == v for fid, v in key.items())
                for del_seq, key in eq_tuples
            ):
                continue
            out = {name_by_fid.get(fid, str(fid)): v for fid, v in vals.items()}
            if with_lineage:
                # spec v3 rule: a non-null materialized cell wins; a null
                # cell (or no column) inherits first_row_id + position
                rid = materialized_ids[idx] if materialized_ids else None
                if rid is None and first_row_id is not None:
                    rid = first_row_id + idx
                out["_row_id"] = rid
            rows.append(out)
    return rows
