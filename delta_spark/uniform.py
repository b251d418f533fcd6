"""UniForm: Iceberg metadata generation over the Delta table.

Role model: the reference's metadata-only conversion
(iceberg/src/main/scala/org/apache/spark/sql/delta/icebergShaded/
IcebergConverter.scala, IcebergConversionTransaction.scala,
IcebergSchemaUtils.scala).  A UniForm table stays a normal Delta table;
after each commit we (best-effort, like the reference's async convert)
materialize Iceberg v2 table metadata under ``<table>/metadata/`` so an
Iceberg filesystem-table reader (HadoopTables layout: ``vN.metadata.json``
+ ``version-hint.text``) sees the same data files.

What we compute (matching the reference, re-expressed in Python):

* schema conversion with stable field ids taken from Delta column-mapping
  ids (IcebergSchemaUtils.IcebergSchemaUtilsIdMapping); tables without
  column mapping fall back to sequentially assigned "name mapping" ids
  (IcebergSchemaUtilsNameMapping) and we publish
  ``schema.name-mapping.default`` so Iceberg readers can resolve parquet
  columns written without field ids.
* ``delta-version`` / ``delta-timestamp`` snapshot properties for
  conversion tracking (IcebergConverter.scala:60-72).
* incremental conversion: append-only commit ranges become a new
  manifest appended to the previous manifest list; anything else
  (removes, metadata/protocol changes) triggers a full rewrite —
  IcebergConversionTransaction's append vs rewrite txn types.
* validation mirroring IcebergCompat.scala: deletion vectors must not
  be in play for converted snapshots.

Manifests and manifest lists are Avro object-container files written by
the self-contained codec below (no third-party Avro dependency; the
binary encoding follows the Avro 1.11 spec directly).

Scale note: conversion is metadata-only — cost is O(#files changed)
JSON/Avro encoding on the driver, never a data scan or shuffle.  At
100 TB the per-commit append path touches only the newly added files;
full rewrites happen only on schema change / deletes, same as the
reference.
"""

from __future__ import annotations

import io
import json
import os
import re
import struct
import time
import uuid
from typing import Any, Optional

import pyspark.sql.types as T

from .actions import AddFile, Metadata
from .util import decode_log_path
from .schema import (
    COLUMN_MAPPING_ID_KEY,
    COLUMN_MAPPING_MAX_ID_KEY,
    column_mapping_mode,
    physical_name,
)

UNIFORM_FORMATS_KEY = "delta.universalFormat.enabledFormats"
ICEBERG_COMPAT_V2_KEY = "delta.enableIcebergCompatV2"
ICEBERG_COMPAT_V3_KEY = "delta.enableIcebergCompatV3"
DV_ENABLED_KEY = "delta.enableDeletionVectors"


class UniFormValidationError(Exception):
    pass


# --------------------------------------------------------------------------
# Minimal Avro object-container codec (spec: https://avro.apache.org/docs/)
# --------------------------------------------------------------------------


def _zigzag(n: int) -> bytes:
    n = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _AvroEncoder:
    def __init__(self) -> None:
        self.buf = bytearray()

    def long(self, n: int) -> None:
        self.buf += _zigzag(int(n))

    def bytes_(self, b: bytes) -> None:
        self.long(len(b))
        self.buf += b

    def string(self, s: str) -> None:
        self.bytes_(s.encode("utf-8"))

    def boolean(self, v: bool) -> None:
        self.buf.append(1 if v else 0)

    def float_(self, v: float) -> None:
        self.buf += struct.pack("<f", v)

    def double(self, v: float) -> None:
        self.buf += struct.pack("<d", v)

    def write_datum(self, schema: Any, value: Any) -> None:
        """Encode ``value`` against an Avro ``schema`` (parsed JSON form)."""
        if isinstance(schema, list):  # union — branch index, then datum
            if value is None and "null" in schema:
                self.long(schema.index("null"))
                return
            for i, branch in enumerate(schema):
                if branch != "null":
                    self.long(i)
                    self.write_datum(branch, value)
                    return
            raise ValueError(f"no union branch for {value!r} in {schema}")
        if isinstance(schema, dict):
            t = schema["type"]
            if t == "record":
                for f in schema["fields"]:
                    self.write_datum(f["type"], (value or {}).get(f["name"]))
                return
            if t == "array":
                items = value or []
                if items:
                    self.long(len(items))
                    for it in items:
                        self.write_datum(schema["items"], it)
                self.long(0)
                return
            if t == "map":
                entries = value or {}
                if entries:
                    self.long(len(entries))
                    for k, v in entries.items():
                        self.string(k)
                        self.write_datum(schema["values"], v)
                self.long(0)
                return
            if t == "fixed":
                assert len(value) == schema["size"]
                self.buf += value
                return
            # primitive carrying a logicalType annotation
            self.write_datum(t, value)
            return
        if schema in ("long", "int"):
            self.long(value)
        elif schema == "string":
            self.string(value)
        elif schema == "bytes":
            self.bytes_(value)
        elif schema == "boolean":
            self.boolean(value)
        elif schema == "double":
            self.double(value)
        elif schema == "float":
            self.float_(value)
        elif schema == "null":
            pass
        else:
            raise ValueError(f"unsupported avro type {schema!r}")


class _AvroDecoder:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def long(self) -> int:
        shift = 0
        acc = 0
        while True:
            b = self.data[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def bytes_(self) -> bytes:
        n = self.long()
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def string(self) -> str:
        return self.bytes_().decode("utf-8")

    def read_datum(self, schema: Any) -> Any:
        if isinstance(schema, list):
            return self.read_datum(schema[self.long()])
        if isinstance(schema, dict):
            t = schema["type"]
            if t == "record":
                return {f["name"]: self.read_datum(f["type"])
                        for f in schema["fields"]}
            if t == "array":
                out = []
                while True:
                    n = self.long()
                    if n == 0:
                        return out
                    if n < 0:  # block with byte-size prefix
                        self.long()
                        n = -n
                    out.extend(self.read_datum(schema["items"])
                               for _ in range(n))
            if t == "map":
                out = {}
                while True:
                    n = self.long()
                    if n == 0:
                        return out
                    if n < 0:
                        self.long()
                        n = -n
                    for _ in range(n):
                        k = self.string()
                        out[k] = self.read_datum(schema["values"])
            if t == "fixed":
                out = self.data[self.pos:self.pos + schema["size"]]
                self.pos += schema["size"]
                return out
            return self.read_datum(t)
        if schema in ("long", "int"):
            return self.long()
        if schema == "string":
            return self.string()
        if schema == "bytes":
            return self.bytes_()
        if schema == "boolean":
            b = self.data[self.pos]
            self.pos += 1
            return bool(b)
        if schema == "double":
            v = struct.unpack_from("<d", self.data, self.pos)[0]
            self.pos += 8
            return v
        if schema == "float":
            v = struct.unpack_from("<f", self.data, self.pos)[0]
            self.pos += 4
            return v
        if schema == "null":
            return None
        raise ValueError(f"unsupported avro type {schema!r}")


_AVRO_MAGIC = b"Obj\x01"


def write_avro_file(path: str, schema: dict, records: list[dict],
                    metadata: Optional[dict[str, str]] = None) -> int:
    """Write an Avro object-container file (null codec); returns byte size."""
    schema_json = json.dumps(schema)
    sync = uuid.uuid4().bytes
    header = _AvroEncoder()
    header.buf += _AVRO_MAGIC
    meta = {"avro.schema": schema_json, "avro.codec": "null"}
    for k, v in (metadata or {}).items():
        meta[k] = v
    header.long(len(meta))
    for k, v in meta.items():
        header.string(k)
        header.bytes_(v.encode("utf-8"))
    header.long(0)
    header.buf += sync

    body = _AvroEncoder()
    for rec in records:
        body.write_datum(schema, rec)

    out = bytes(header.buf)
    if records:
        block = _AvroEncoder()
        block.long(len(records))
        block.long(len(body.buf))
        out += bytes(block.buf) + bytes(body.buf) + sync
    with open(path, "wb") as fh:
        fh.write(out)
    return len(out)


def read_avro_file(path: str) -> tuple[dict, list[dict]]:
    """Read back an Avro container file written by any null/deflate writer."""
    import zlib

    with open(path, "rb") as fh:
        data = fh.read()
    assert data[:4] == _AVRO_MAGIC, "not an avro file"
    dec = _AvroDecoder(data)
    dec.pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n = dec.long()
        if n == 0:
            break
        if n < 0:
            dec.long()
            n = -n
        for _ in range(n):
            k = dec.string()
            meta[k] = dec.bytes_()
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = data[dec.pos:dec.pos + 16]
    dec.pos += 16
    records: list[dict] = []
    while dec.pos < len(data):
        count = dec.long()
        size = dec.long()
        block = data[dec.pos:dec.pos + size]
        dec.pos += size
        assert data[dec.pos:dec.pos + 16] == sync, "sync marker mismatch"
        dec.pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bdec = _AvroDecoder(block)
        for _ in range(count):
            records.append(bdec.read_datum(schema))
    return schema, records


# --------------------------------------------------------------------------
# Delta schema -> Iceberg schema JSON (IcebergSchemaUtils.scala role)
# --------------------------------------------------------------------------


class _FieldIdAllocator:
    """Ids for nested pseudo-fields (list element / map key / value /
    nested struct members) above the column-mapping high-watermark; for
    un-mapped tables every field gets a sequential "name mapping" id."""

    def __init__(self, start: int) -> None:
        self.next_id = start

    def alloc(self) -> int:
        self.next_id += 1
        return self.next_id


def _iceberg_primitive(dt: T.DataType) -> str:
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType):
        return "timestamptz"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision}, {dt.scale})"
    if hasattr(T, "VariantType") and isinstance(dt, T.VariantType):
        return "variant"
    raise UniFormValidationError(f"cannot convert Delta type {dt} to Iceberg")


def _convert_type(dt: T.DataType, alloc: _FieldIdAllocator,
                  field_ids: bool) -> Any:
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            fid = _field_id(f, alloc, field_ids)
            fields.append({
                "id": fid,
                "name": f.name,
                "required": not f.nullable,
                "type": _convert_type(f.dataType, alloc, field_ids),
            })
        return {"type": "struct", "fields": fields}
    if isinstance(dt, T.ArrayType):
        return {
            "type": "list",
            "element-id": alloc.alloc(),
            "element": _convert_type(dt.elementType, alloc, field_ids),
            "element-required": not dt.containsNull,
        }
    if isinstance(dt, T.MapType):
        return {
            "type": "map",
            "key-id": alloc.alloc(),
            "key": _convert_type(dt.keyType, alloc, field_ids),
            "value-id": alloc.alloc(),
            "value": _convert_type(dt.valueType, alloc, field_ids),
            "value-required": not dt.valueContainsNull,
        }
    return _iceberg_primitive(dt)


def _field_id(f: T.StructField, alloc: _FieldIdAllocator,
              field_ids: bool) -> int:
    md = f.metadata or {}
    if field_ids and COLUMN_MAPPING_ID_KEY in md:
        return int(md[COLUMN_MAPPING_ID_KEY])
    return alloc.alloc()


def convert_schema(metadata: Metadata,
                   schema: T.StructType) -> tuple[dict, int, list[dict]]:
    """Returns (iceberg schema JSON, last-column-id, name-mapping list)."""
    mode = column_mapping_mode(metadata.configuration)
    id_mapping = mode != "none"
    max_id = int(metadata.configuration.get(COLUMN_MAPPING_MAX_ID_KEY, "0"))
    alloc = _FieldIdAllocator(max_id if id_mapping else 0)
    struct = _convert_type(schema, alloc, id_mapping)
    struct["schema-id"] = 0
    struct["identifier-field-ids"] = []
    name_mapping = []
    for f, ice in zip(schema.fields, struct["fields"]):
        names = [physical_name(f)]
        if f.name not in names:
            names.append(f.name)
        name_mapping.append({"field-id": ice["id"], "names": names})
    return struct, alloc.next_id, name_mapping


# --------------------------------------------------------------------------
# Partition values: Delta string partitionValues -> typed Avro datums
# --------------------------------------------------------------------------


def _avro_partition_type(dt: T.DataType) -> Any:
    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
        return "int"
    if isinstance(dt, T.LongType):
        return "long"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros",
                "adjust-to-utc": True}
    if isinstance(dt, T.DecimalType):
        return {"type": "bytes", "logicalType": "decimal",
                "precision": dt.precision, "scale": dt.scale}
    return "string"


def _avro_partition_value(dt: T.DataType, raw: Optional[str]) -> Any:
    if raw is None:
        return None
    import datetime
    import decimal

    if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType, T.LongType)):
        return int(raw)
    if isinstance(dt, T.BooleanType):
        return raw.lower() == "true"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(raw)
    if isinstance(dt, T.DateType):
        return (datetime.date.fromisoformat(raw)
                - datetime.date(1970, 1, 1)).days
    if isinstance(dt, T.TimestampType):
        ts = datetime.datetime.fromisoformat(raw)
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=datetime.timezone.utc)
        return int(ts.timestamp() * 1_000_000)
    if isinstance(dt, T.DecimalType):
        unscaled = int(decimal.Decimal(raw).scaleb(dt.scale))
        n = max(1, (unscaled.bit_length() + 8) // 8)
        return unscaled.to_bytes(n, "big", signed=True)
    return raw


# --------------------------------------------------------------------------
# Manifest / manifest-list schemas (Iceberg spec, v2 format)
# --------------------------------------------------------------------------


def _manifest_entry_schema(partition_fields: list[dict]) -> dict:
    return {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 4},
            {"name": "data_file", "field-id": 2, "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string",
                     "field-id": 101},
                    {"name": "partition", "field-id": 102, "type": {
                        "type": "record", "name": "r102",
                        "fields": partition_fields}},
                    {"name": "record_count", "type": "long",
                     "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long",
                     "field-id": 104},
                    # Iceberg format v3 additions: row lineage + DV
                    # DeleteFiles that point into a blob of another file
                    {"name": "first_row_id", "type": ["null", "long"],
                     "default": None, "field-id": 142},
                    {"name": "referenced_data_file",
                     "type": ["null", "string"],
                     "default": None, "field-id": 143},
                    {"name": "content_offset", "type": ["null", "long"],
                     "default": None, "field-id": 144},
                    {"name": "content_size_in_bytes",
                     "type": ["null", "long"],
                     "default": None, "field-id": 145},
                ]}},
        ]}


_MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ]}


# --------------------------------------------------------------------------
# Converter
# --------------------------------------------------------------------------


def uniform_iceberg_enabled(configuration: dict[str, str]) -> bool:
    formats = (configuration or {}).get(UNIFORM_FORMATS_KEY, "")
    return "iceberg" in [f.strip() for f in formats.split(",")]


def compat_v3_enabled(configuration: dict[str, str]) -> bool:
    return (configuration or {}).get(
        ICEBERG_COMPAT_V3_KEY, "false").lower() == "true"


def validate_uniform_config(configuration: dict[str, str],
                            prev_configuration: Optional[dict] = None) -> None:
    """IcebergCompat.scala checks. V2: DVs incompatible with UniForm
    (CheckDeletionVectorDisabled). V3 (IcebergCompatV3): DVs allowed —
    they convert to Iceberg format-v3 deletion vectors — but at most
    one compat version may be enabled (CheckOnlySingleVersionEnabled),
    V3 cannot be disabled once on (CheckCannotDisableCompat), and
    ALTER-enabling V3 on a table that already has row tracking is
    refused (CheckNoRowTrackingBeforeUpgradeV3 — pre-existing files
    carry row ids assigned outside V3 conversion)."""
    cfg = configuration or {}
    v3 = compat_v3_enabled(cfg)
    if v3 and cfg.get(ICEBERG_COMPAT_V2_KEY, "false").lower() == "true":
        raise UniFormValidationError(
            "icebergCompatV2 and icebergCompatV3 cannot both be enabled "
            "(IcebergCompat: CheckOnlySingleVersionEnabled)")
    if prev_configuration is not None:
        prev = prev_configuration
        if compat_v3_enabled(prev) and not v3:
            raise UniFormValidationError(
                "icebergCompatV3 cannot be disabled once enabled "
                "(IcebergCompat: CheckCannotDisableCompat)")
        if (v3 and not compat_v3_enabled(prev)
                and prev.get("delta.enableRowTracking",
                             "false").lower() == "true"):
            raise UniFormValidationError(
                "enabling icebergCompatV3 on a table with row tracking "
                "already enabled is not supported; disable row tracking "
                "first (IcebergCompat: CheckNoRowTrackingBeforeUpgradeV3)")
    v3_newly_on = v3 and (prev_configuration is None
                          or not compat_v3_enabled(prev_configuration))
    if v3_newly_on and cfg.get("delta.columnMapping.mode",
                               "none") not in ("name", "id"):
        # iceberg-compat-v3 RFC writer requirements: Iceberg field ids
        # must be stable across renames, which only column mapping
        # provides — a V3 table without it can violate the spec
        # external Iceberg engines rely on. Enforced only at the
        # ENABLEMENT transition: a pre-existing V3 table written before
        # this requirement keeps committing (bricking it on upgrade
        # would be worse than its already-shipped deviation).
        raise UniFormValidationError(
            "icebergCompatV3 requires column mapping (set "
            "delta.columnMapping.mode=name or id): Iceberg field ids "
            "are derived from the column mapping ids "
            "(iceberg-compat-v3 RFC writer requirements)")
    if not uniform_iceberg_enabled(cfg):
        return
    if cfg.get(DV_ENABLED_KEY, "false").lower() == "true":
        if not v3:
            raise UniFormValidationError(
                "UniForm (iceberg) requires deletion vectors to be disabled "
                "(IcebergCompat: icebergCompatDeletionVectorsShouldBeDisabled)"
                " — or enable delta.enableIcebergCompatV3, which converts "
                "them to Iceberg format-v3 deletion vectors")
        if cfg.get("delta_spark.dv.portable", "true").lower() == "false":
            raise UniFormValidationError(
                "icebergCompatV3 requires protocol-portable deletion "
                "vectors (delta_spark.dv.portable): Iceberg DeleteFiles "
                "point directly into the Delta DV blobs, so the legacy "
                "parquet-sidecar encoding cannot be referenced")


def metadata_dir(table_path: str) -> str:
    return os.path.join(table_path, "metadata")


def read_current_metadata(table_path: str) -> Optional[dict]:
    mdir = metadata_dir(table_path)
    hint = os.path.join(mdir, "version-hint.text")
    if not os.path.exists(hint):
        return None
    with open(hint) as fh:
        v = int(fh.read().strip())
    path = os.path.join(mdir, f"v{v}.metadata.json")
    with open(path) as fh:
        out = json.loads(fh.read())
    out["_metadata_version"] = v
    return out


def last_converted_delta_version(table_path: str) -> Optional[int]:
    meta = read_current_metadata(table_path)
    if meta is None:
        return None
    v = meta.get("properties", {}).get("delta-version")
    return int(v) if v is not None else None


def _num_records(f: AddFile) -> int:
    if f.stats:
        try:
            return int(json.loads(f.stats).get("numRecords") or 0)
        except (ValueError, TypeError):
            return 0
    return 0


def _append_only_range(log, start: int, end: int) -> Optional[list[AddFile]]:
    """AddFiles for commits (start..end] iff the range is append-only:
    no removes, no metadata/protocol changes, no deletion vectors."""
    added: list[AddFile] = []
    for v in range(start, end + 1):
        try:
            actions = log.read_commit_actions(v)
        except (OSError, FileNotFoundError):
            return None
        for kind, a in actions:
            if kind in ("remove", "metaData", "protocol"):
                return None
            if kind == "add":
                if a.deletionVector is not None:
                    return None
                added.append(a)
    return added


def convert_snapshot(log, snap=None) -> Optional[str]:
    """Convert a Delta snapshot to Iceberg metadata.  Returns the path of
    the new ``vN.metadata.json`` (None if already up to date)."""
    snap = snap or log.update()
    config = snap.configuration
    # steady-state validation (post-commit hook): the config is the
    # committed state, not a transition — pass it as its own
    # predecessor so transition-only checks (V3 enablement
    # requirements) don't re-fire on every append of a legacy table
    validate_uniform_config(config, prev_configuration=config)
    table_path = log.table_path
    mdir = metadata_dir(table_path)
    os.makedirs(mdir, exist_ok=True)

    prev = read_current_metadata(table_path)
    prev_delta_v = (int(prev["properties"]["delta-version"])
                    if prev and "delta-version" in prev.get("properties", {})
                    else None)
    if prev_delta_v is not None and prev_delta_v >= snap.version:
        return None  # already converted

    schema_json, last_column_id, name_mapping = convert_schema(
        Metadata(configuration=config), snap.schema)

    # identity partition spec over the table's partition columns
    part_cols = snap.partition_columns
    field_by_name = {f["name"]: f for f in schema_json["fields"]}
    spec_fields = []
    for i, c in enumerate(part_cols):
        spec_fields.append({
            "name": c, "transform": "identity",
            "source-id": field_by_name[c]["id"], "field-id": 1000 + i})
    part_types = {f.name: f.dataType for f in snap.schema.fields}
    avro_part_fields = [
        {"name": c, "type": ["null", _avro_partition_type(part_types[c])],
         "default": None, "field-id": 1000 + i}
        for i, c in enumerate(part_cols)]

    snapshot_id = snap.version  # stable delta-version <-> snapshot-id map
    seq = (prev.get("last-sequence-number", 0) + 1) if prev else 1
    now_ms = int(time.time() * 1000)
    entry_schema = _manifest_entry_schema(avro_part_fields)
    v3 = compat_v3_enabled(config)
    fmt_version = 3 if v3 else 2

    def _partition_of(f: AddFile) -> dict:
        return {c: _avro_partition_value(part_types[c],
                                         (f.partitionValues or {}).get(c))
                for c in part_cols}

    def write_manifest(files: list[AddFile], status: int) -> dict:
        mpath = os.path.join(mdir, f"{uuid.uuid4()}-m0.avro")
        recs = []
        rows = 0
        for f in files:
            if f.deletionVector is not None and not v3:
                raise UniFormValidationError(
                    "cannot convert a snapshot containing deletion vectors "
                    "to Iceberg (IcebergCompat) — enable "
                    "delta.enableIcebergCompatV3 for format-v3 DVs")
            nrec = _num_records(f)
            rows += nrec
            recs.append({
                "status": status,
                "snapshot_id": snapshot_id,
                "sequence_number": None,  # inherited from the manifest
                "file_sequence_number": None,
                "data_file": {
                    "content": 0,
                    "file_path": os.path.join(table_path,
                                              decode_log_path(f.path)),
                    "file_format": "PARQUET",
                    "partition": _partition_of(f),
                    "record_count": nrec,
                    "file_size_in_bytes": f.size,
                    # Iceberg v3 row lineage: Delta row tracking assigns
                    # every file a baseRowId — the same id space
                    # (DeltaToIcebergConvert.RowTracking.setNextRowId)
                    "first_row_id": f.baseRowId if v3 else None,
                    "referenced_data_file": None,
                    "content_offset": None,
                    "content_size_in_bytes": None,
                }})
        size = write_avro_file(
            mpath, entry_schema, recs,
            metadata={"schema": json.dumps(schema_json),
                      "partition-spec": json.dumps(spec_fields),
                      "partition-spec-id": "0",
                      "format-version": str(fmt_version),
                      "content": "data"})
        return {
            "manifest_path": mpath, "manifest_length": size,
            "partition_spec_id": 0, "content": 0,
            "sequence_number": seq, "min_sequence_number": seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(files) if status == 1 else 0,
            "existing_files_count": len(files) if status == 0 else 0,
            "deleted_files_count": 0,
            "added_rows_count": rows if status == 1 else 0,
            "existing_rows_count": rows if status == 0 else 0,
            "deleted_rows_count": 0,
        }

    def write_delete_manifest(dv_files: list[AddFile]) -> dict:
        """Iceberg format-v3 deletion vectors: each Delta DV blob is
        referenced IN PLACE — a position-delete DeleteFile with
        file_format PUFFIN whose content_offset/content_size point at
        the blob inside the Delta `deletion_vector_*.bin` file. Delta's
        on-disk framing (int32-BE size | portable RoaringBitmapArray |
        int32-BE CRC, offset at the size field) is byte-identical to
        the Iceberg v3 DV blob contract, so no data is rewritten
        (DeltaToIcebergConvert.scala:108 dvToDeleteFile,
        DeletionVectorStore.getTotalSizeOfDVFieldsInFile)."""
        from delta_spark import dv as dv_mod

        mpath = os.path.join(mdir, f"{uuid.uuid4()}-m0.avro")
        recs = []
        rows = 0
        for f in dv_files:
            d = f.deletionVector
            st = d.get("storageType")
            if st not in ("u", "p") or d.get("offset") is None:
                raise UniFormValidationError(
                    f"icebergCompatV3 can only reference on-disk "
                    f"deletion vectors (storageType 'u'/'p' with an "
                    f"offset); found {st!r}")
            offset = int(d["offset"])
            size = int(d["sizeInBytes"])
            card = int(d.get("cardinality", 0))
            content_size = 4 + size + 4  # size field + blob + CRC
            rows += card
            recs.append({
                "status": 1,
                "snapshot_id": snapshot_id,
                "sequence_number": None,
                "file_sequence_number": None,
                "data_file": {
                    "content": 1,  # position deletes
                    "file_path": dv_mod.absolute_dv_path(table_path, d),
                    "file_format": "PUFFIN",
                    "partition": _partition_of(f),
                    "record_count": card,
                    "file_size_in_bytes": offset + content_size,
                    "first_row_id": None,
                    "referenced_data_file": os.path.join(
                        table_path, decode_log_path(f.path)),
                    "content_offset": offset,
                    "content_size_in_bytes": content_size,
                }})
        size = write_avro_file(
            mpath, entry_schema, recs,
            metadata={"schema": json.dumps(schema_json),
                      "partition-spec": json.dumps(spec_fields),
                      "partition-spec-id": "0",
                      "format-version": str(fmt_version),
                      "content": "deletes"})
        return {
            "manifest_path": mpath, "manifest_length": size,
            "partition_spec_id": 0, "content": 1,
            "sequence_number": seq, "min_sequence_number": seq,
            "added_snapshot_id": snapshot_id,
            "added_files_count": len(dv_files),
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": rows,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }

    operation = "overwrite"
    manifests: list[dict] = []
    incremental = None
    if prev is not None and prev_delta_v is not None:
        incremental = _append_only_range(log, prev_delta_v + 1, snap.version)
    if incremental is not None:
        # append txn: reuse previous manifest-list entries, add one manifest
        operation = "append"
        prev_snap = next((s for s in prev.get("snapshots", [])
                          if s["snapshot-id"] == prev["current-snapshot-id"]),
                         None)
        if prev_snap:
            _, old = read_avro_file(prev_snap["manifest-list"])
            manifests.extend(old)
        if incremental:
            manifests.append(write_manifest(incremental, status=1))
        added_files, added_rows = (len(incremental),
                                   sum(_num_records(f) for f in incremental))
        # totals count DATA manifests only: a carried-over V3 delete
        # manifest's added_rows_count is a DV cardinality, not rows
        data_manifests = [m for m in manifests if m.get("content", 0) == 0]
        total_files = sum(m["added_files_count"] + m["existing_files_count"]
                          for m in data_manifests)
        total_rows = sum(m["added_rows_count"] + m["existing_rows_count"]
                         for m in data_manifests)
    else:
        live = snap.all_files
        if live:
            manifests.append(write_manifest(live, status=1))
        added_files = total_files = len(live)
        added_rows = total_rows = sum(_num_records(f) for f in live)
        if v3:
            dv_files = [f for f in live if f.deletionVector is not None]
            if dv_files:
                manifests.append(write_delete_manifest(dv_files))

    mlist_path = os.path.join(mdir, f"snap-{snapshot_id}-1-{uuid.uuid4()}.avro")
    write_avro_file(mlist_path, _MANIFEST_FILE_SCHEMA, manifests,
                    metadata={"snapshot-id": str(snapshot_id),
                              "sequence-number": str(seq),
                              "parent-snapshot-id":
                                  str(prev["current-snapshot-id"])
                                  if prev else "null",
                              "format-version": str(fmt_version)})

    snapshot_entry = {
        "snapshot-id": snapshot_id,
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": mlist_path,
        "summary": {
            "operation": operation,
            "added-data-files": str(added_files),
            "added-records": str(added_rows),
            "total-data-files": str(total_files),
            "total-records": str(total_rows),
        },
        "schema-id": 0,
    }
    if v3:
        # row lineage (Iceberg v3): files carry explicit first_row_id
        # from Delta's baseRowId space; the snapshot records the range
        # base it consumed
        added_first = [f.baseRowId for f in
                       (incremental if incremental else snap.all_files)
                       if f.baseRowId is not None]
        snapshot_entry["first-row-id"] = min(added_first) if added_first else 0
        snapshot_entry["added-rows"] = added_rows
    if prev:
        snapshot_entry["parent-snapshot-id"] = prev["current-snapshot-id"]

    snapshots = [s for s in (prev.get("snapshots", []) if prev else [])]
    snapshots.append(snapshot_entry)
    snapshot_log = [s for s in (prev.get("snapshot-log", []) if prev else [])]
    snapshot_log.append({"timestamp-ms": now_ms, "snapshot-id": snapshot_id})

    meta_version = (prev["_metadata_version"] + 1) if prev else 1
    table_uuid = (prev["table-uuid"] if prev
                  else str(uuid.uuid5(uuid.NAMESPACE_URL, snap.metadata.id)))
    properties = {
        "delta-version": str(snap.version),
        "delta-timestamp": str(now_ms),
        "schema.name-mapping.default": json.dumps(name_mapping),
        "write.format.default": "parquet",
    }
    if prev_delta_v is not None:
        properties["base-delta-version"] = str(prev_delta_v)

    metadata_json = {
        "format-version": fmt_version,
        "table-uuid": table_uuid,
        "location": table_path,
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": last_column_id,
        "current-schema-id": 0,
        "schemas": [schema_json],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
        "last-partition-id": 1000 + len(spec_fields) - 1 if spec_fields
        else 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": properties,
        "current-snapshot-id": snapshot_id,
        "snapshots": snapshots,
        "snapshot-log": snapshot_log[-50:],
        "metadata-log": ([{"timestamp-ms": now_ms,
                           "metadata-file": os.path.join(
                               mdir, f"v{prev['_metadata_version']}"
                                     ".metadata.json")}]
                         if prev else []),
    }
    if v3:
        # next-row-id: one past Delta's row-id high watermark, so
        # engines appending through Iceberg would not collide with
        # Delta-assigned ranges (setNextRowId role)
        hwm = -1
        for f in snap.all_files:
            if f.baseRowId is not None:
                hwm = max(hwm, f.baseRowId + max(_num_records(f), 1) - 1)
        metadata_json["next-row-id"] = hwm + 1
    out_path = os.path.join(mdir, f"v{meta_version}.metadata.json")
    tmp = out_path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(json.dumps(metadata_json, indent=2))
    os.replace(tmp, out_path)
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write(str(meta_version))
    return out_path


def maybe_convert(log, snap) -> None:
    """Post-commit hook entry: convert when UniForm iceberg is enabled."""
    if uniform_iceberg_enabled(snap.configuration):
        convert_snapshot(log, snap)


def read_iceberg_files(table_path: str) -> list[dict]:
    """All live data-file entries per the current Iceberg metadata (test
    helper; mirrors the reference's UniFormIcebergVerifier)."""
    meta = read_current_metadata(table_path)
    if meta is None:
        return []
    cur = next(s for s in meta["snapshots"]
               if s["snapshot-id"] == meta["current-snapshot-id"])
    _, manifests = read_avro_file(cur["manifest-list"])
    out = []
    for m in manifests:
        if m.get("content", 0) != 0:
            continue  # delete manifests listed via read_iceberg_deletes
        _, entries = read_avro_file(m["manifest_path"])
        out.extend(e["data_file"] for e in entries
                   if e["status"] in (0, 1))
    return out


def read_iceberg_deletes(table_path: str) -> list[dict]:
    """All live DeleteFile entries (content=1 manifests) per the
    current Iceberg metadata — format-v3 deletion vectors."""
    meta = read_current_metadata(table_path)
    if meta is None:
        return []
    cur = next(s for s in meta["snapshots"]
               if s["snapshot-id"] == meta["current-snapshot-id"])
    _, manifests = read_avro_file(cur["manifest-list"])
    out = []
    for m in manifests:
        if m.get("content", 0) != 1:
            continue
        _, entries = read_avro_file(m["manifest_path"])
        out.extend(e["data_file"] for e in entries
                   if e["status"] in (0, 1))
    return out


# --------------------------------------------------------------------------
# CONVERT TO DELTA from an Iceberg filesystem table
# (ConvertToDeltaCommand iceberg input, commands/convert/IcebergTable.scala
# role: schema + partition spec from vN.metadata.json, file list from the
# current snapshot's manifests — no data rewrite, no directory listing)
# --------------------------------------------------------------------------


def _spark_type_from_iceberg(t: Any) -> T.DataType:
    """Inverse of _convert_type for the types our writer emits."""
    if isinstance(t, dict):
        k = t.get("type")
        if k == "struct":
            return T.StructType([
                T.StructField(f["name"], _spark_type_from_iceberg(f["type"]),
                              not f.get("required", False))
                for f in t["fields"]])
        if k == "list":
            return T.ArrayType(_spark_type_from_iceberg(t["element"]),
                               not t.get("element-required", False))
        if k == "map":
            return T.MapType(_spark_type_from_iceberg(t["key"]),
                             _spark_type_from_iceberg(t["value"]),
                             not t.get("value-required", False))
        raise UniFormValidationError(f"unsupported Iceberg type {t!r}")
    m = {"boolean": T.BooleanType, "int": T.IntegerType, "long": T.LongType,
         "float": T.FloatType, "double": T.DoubleType, "date": T.DateType,
         "timestamptz": T.TimestampType, "timestamp": T.TimestampNTZType,
         "string": T.StringType, "binary": T.BinaryType}
    if t in m:
        return m[t]()
    dm = re.fullmatch(r"decimal\(\s*(\d+)\s*,\s*(\d+)\s*\)", t)
    if dm:
        return T.DecimalType(int(dm.group(1)), int(dm.group(2)))
    if t == "variant" and hasattr(T, "VariantType"):
        return T.VariantType()
    raise UniFormValidationError(f"unsupported Iceberg type {t!r}")


def _delta_partition_string(dt: T.DataType, v: Any) -> Optional[str]:
    """Typed Iceberg partition datum → Delta partitionValues string
    (inverse of _avro_partition_value)."""
    import datetime
    import decimal as _dec

    if v is None:
        return None
    if isinstance(dt, T.DateType):
        return (datetime.date(1970, 1, 1)
                + datetime.timedelta(days=int(v))).isoformat()
    if isinstance(dt, T.TimestampType):
        ts = (datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
              + datetime.timedelta(microseconds=int(v)))
        return ts.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(dt, T.BooleanType):
        return "true" if v else "false"
    if isinstance(dt, T.DecimalType):
        unscaled = int.from_bytes(v, "big", signed=True)
        return str(_dec.Decimal(unscaled).scaleb(-dt.scale))
    return str(v)


def convert_iceberg_to_delta(spark, iceberg_path: str,
                             delta_path: Optional[str] = None):
    """CONVERT TO DELTA over an Iceberg filesystem table: the current
    ``vN.metadata.json`` supplies schema + identity partition spec, the
    current snapshot's manifest list supplies the live files (with
    record counts → numRecords stats). Commit 0 references the data
    files in place — nothing is rewritten, nothing is listed; at 100 TB
    this is a metadata-only operation like the reference's
    ConvertToDeltaCommand iceberg path."""
    from delta_spark.actions import Format, Protocol
    from delta_spark.log import DeltaLog
    from delta_spark.transaction import OptimisticTransaction
    from delta_spark.util import current_time_millis, schema_to_json

    meta = read_current_metadata(iceberg_path)
    if meta is None:
        raise UniFormValidationError(
            f"no Iceberg metadata (metadata/version-hint.text) under {iceberg_path}")
    ice_schema = next((s for s in meta.get("schemas", [])
                       if s.get("schema-id") == meta.get("current-schema-id")),
                      meta.get("schema"))
    schema = _spark_type_from_iceberg(
        {"type": "struct", "fields": ice_schema["fields"]})
    field_by_id = {f["id"]: f for f in ice_schema["fields"]}

    spec = next((s for s in meta.get("partition-specs", [])
                 if s.get("spec-id") == meta.get("default-spec-id")),
                {"fields": []})
    part_cols: list[str] = []
    part_types: list[T.DataType] = []
    for pf in spec.get("fields", []):
        if pf.get("transform", "identity") != "identity":
            raise UniFormValidationError(
                f"unsupported partition transform {pf['transform']!r} "
                "(only identity)")
        src = field_by_id[pf["source-id"]]
        part_cols.append(src["name"])
        part_types.append(_spark_type_from_iceberg(src["type"]))

    target = delta_path or iceberg_path
    log = DeltaLog.for_table(target)
    if log.table_exists():
        raise UniFormValidationError(f"delta table already exists at {target}")
    root = os.path.normpath(iceberg_path)
    # Iceberg format-v3 deletion vectors convert back to Delta DV
    # descriptors IN PLACE: the DeleteFile's (content_offset,
    # content_size) window over the puffin/DV file is byte-identical to
    # Delta's blob framing, so an absolute-path ('p') descriptor simply
    # points at it
    dv_by_data: dict[str, dict] = {}
    for de in read_iceberg_deletes(iceberg_path):
        if (de.get("file_format") or "").upper() != "PUFFIN" \
                or de.get("referenced_data_file") is None:
            raise UniFormValidationError(
                "only deletion-vector DeleteFiles (PUFFIN, "
                "referenced_data_file) can convert to Delta")
        dv_by_data[os.path.normpath(de["referenced_data_file"])] = {
            "storageType": "p",
            "pathOrInlineDv": de["file_path"],
            "offset": int(de["content_offset"]),
            # content_size = 4-byte size field + blob + 4-byte CRC
            "sizeInBytes": int(de["content_size_in_bytes"]) - 8,
            "cardinality": int(de["record_count"]),
        }
    adds = []
    for df_entry in read_iceberg_files(iceberg_path):
        p = df_entry["file_path"]
        ap = os.path.normpath(p)
        rel = (os.path.relpath(ap, os.path.normpath(target))
               if ap.startswith(root + os.sep) and target == iceberg_path
               else ap)
        pvals = {}
        part = df_entry.get("partition") or {}
        for c, dt in zip(part_cols, part_types):
            pvals[c] = _delta_partition_string(dt, part.get(c))
        try:
            size = os.path.getsize(ap)
        except OSError:
            size = int(df_entry.get("file_size_in_bytes") or 0)
        adds.append(AddFile(
            path=rel, partitionValues=pvals, size=size,
            modificationTime=current_time_millis(), dataChange=True,
            deletionVector=dv_by_data.get(ap),
            stats=json.dumps({"numRecords": int(df_entry["record_count"])})))

    # Iceberg parquet files resolve columns by field id (mandatory in
    # the Iceberg spec), so the converted Delta table uses ID column
    # mapping with delta.columnMapping.id = the Iceberg field id —
    # the reference's ConvertToDeltaCommand does the same. physicalName
    # falls back to the Iceberg field name for files without ids.
    from delta_spark.schema import (
        COLUMN_MAPPING_ID_KEY,
        COLUMN_MAPPING_PHYSICAL_KEY,
    )

    mapped_fields = []
    max_fid = 0
    for f in schema.fields:
        ice = next((x for x in ice_schema["fields"]
                    if x["name"] == f.name), None)
        md = dict(f.metadata or {})
        if ice is not None:
            md[COLUMN_MAPPING_ID_KEY] = int(ice["id"])
            md[COLUMN_MAPPING_PHYSICAL_KEY] = f.name
            max_fid = max(max_fid, int(ice["id"]))
        mapped_fields.append(
            T.StructField(f.name, f.dataType, f.nullable, md))
    schema = T.StructType(mapped_fields)

    metadata = Metadata(
        format=Format(), schemaString=schema_to_json(schema),
        partitionColumns=part_cols,
        configuration={"delta.columnMapping.mode": "id",
                       "delta.columnMapping.maxColumnId": str(max_fid)},
        createdTime=current_time_millis())
    feats = ["columnMapping"]
    if dv_by_data:
        feats = ["columnMapping", "deletionVectors"]
        proto = Protocol(3, 7, readerFeatures=feats, writerFeatures=feats)
    else:
        proto = Protocol(2, 5)
    txn = OptimisticTransaction(log)
    txn.commit([proto, metadata] + adds, "CONVERT",
               {"sourceFormat": "iceberg",
                "numFiles": str(len(adds)),
                "partitionedBy": json.dumps(part_cols)})
    from delta_spark.table import DeltaTable
    return DeltaTable.forPath(spark, target)
