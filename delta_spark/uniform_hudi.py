"""UniForm Hudi leg: expose a Delta table's current snapshot as an
Apache Hudi copy-on-write table by writing Hudi timeline metadata next
to the data files — the data parquet is shared, never rewritten.

Reference behavior (hudi/src/main/scala/org/apache/spark/sql/delta/hudi/):

- ``HudiConverter.scala:50`` — conversion state is tracked in the last
  completed Hudi commit's extra metadata under ``delta-version`` /
  ``delta-timestamp``; a snapshot already converted is a no-op.
- ``HudiConversionTransaction.scala:138-150`` — every conversion is a
  Hudi REPLACE_COMMIT: AddFiles become write statuses, RemoveFiles
  become ``partitionToReplacedFileIds`` entries, and the commit carries
  the sync metadata map.
- ``HudiTransactionUtils.scala:34-57`` (``convertAddFile``) — fileId is
  the file NAME, the registered path gets Hudi's external-file marker
  (``<path>_<instantTime>_hudiext``) so Hudi can parse a commit time
  out of files it did not write itself, numWrites = numLogicalRecords,
  fileSizeInBytes = the Delta file size.
- ``HudiTransactionUtils.scala:107-134`` (``initializeHudiTable``) —
  COPY_ON_WRITE, hive-style partitioning, populateMetaFields=false,
  keygenerator class chosen by partition-field count.
- ``HudiSchemaUtils.scala:33-92`` — Delta schema → Avro schema mapping
  (nullable fields become ``["null", T]`` unions, date → int/date,
  timestamp → long/timestamp-micros, decimal → bytes/decimal).

The reference drives the Apache Hudi client library for the actual
timeline file I/O; that library is a JVM dependency this engine does
not take, so the timeline files (``hoodie.properties``, the
``<instant>.replacecommit[.requested|.inflight]`` triplet with
HoodieReplaceCommitMetadata JSON) are written directly in the same
layout. The Hudi *metadata table* (``.hoodie/metadata``) is not
produced — the reference itself treats metadata-table update failures
as non-fatal ("should not lead to data corruption",
HudiConversionTransaction.scala:161-172); listing-based Hudi readers
work from the timeline alone.
"""

from __future__ import annotations

import json
import os
import re
import time
import zlib
from typing import Any, Optional

import pyspark.sql.types as T

from delta_spark.actions import AddFile
from delta_spark.uniform import UNIFORM_FORMATS_KEY, DV_ENABLED_KEY, _num_records

HUDI_DIR = ".hoodie"
DELTA_VERSION_PROPERTY = "delta-version"        # HudiConverter.scala:50
DELTA_TIMESTAMP_PROPERTY = "delta-timestamp"    # HudiConverter.scala:51
EXTERNAL_FILE_MARKER = "_hudiext"               # ExternalFilePathUtil
_INSTANT_RE = re.compile(r"^(\d{17})\.replacecommit$")


class HudiConversionError(RuntimeError):
    pass


def uniform_hudi_enabled(configuration: dict[str, str]) -> bool:
    formats = (configuration or {}).get(UNIFORM_FORMATS_KEY, "")
    return "hudi" in [f.strip() for f in formats.split(",")]


def validate_hudi_config(configuration: dict[str, str]) -> None:
    """Hudi shares Iceberg's compat surface: deletion vectors cannot be
    represented in a COW timeline (UniversalFormat.scala enforceHudi
    dependencies)."""
    if not uniform_hudi_enabled(configuration):
        return
    if (configuration or {}).get(DV_ENABLED_KEY, "false").lower() == "true":
        raise HudiConversionError(
            "UniForm (hudi) requires deletion vectors to be disabled")


# --------------------------------------------------------------------------
# Schema: Delta → Avro (HudiSchemaUtils.convertDeltaSchemaToHudiSchema)
# --------------------------------------------------------------------------


def avro_schema(schema: T.StructType) -> dict:
    """Avro record schema for the table (HudiSchemaUtils.scala:33):
    nullable → union with null; records named by field path."""

    def atomic(dt: T.DataType) -> Any:
        if isinstance(dt, T.StringType):
            return "string"
        if isinstance(dt, T.LongType):
            return "long"
        if isinstance(dt, (T.IntegerType, T.ShortType, T.ByteType)):
            return "int"
        if isinstance(dt, T.FloatType):
            return "float"
        if isinstance(dt, T.DoubleType):
            return "double"
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, T.BinaryType):
            return "bytes"
        if isinstance(dt, T.DecimalType):
            return {"type": "bytes", "logicalType": "decimal",
                    "precision": dt.precision, "scale": dt.scale}
        if isinstance(dt, T.DateType):
            return {"type": "int", "logicalType": "date"}
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            return {"type": "long", "logicalType": "timestamp-micros"}
        raise HudiConversionError(f"cannot convert Delta type {dt} to Hudi")

    def transform(dt: T.DataType, nullable: bool, path: str) -> Any:
        if isinstance(dt, T.StructType):
            out: Any = {
                "type": "record", "name": path.replace(".", "_"),
                "fields": [
                    {"name": f.name,
                     "type": transform(f.dataType, f.nullable,
                                       f"{path}.{f.name}")}
                    for f in dt.fields]}
        elif isinstance(dt, T.ArrayType):
            out = {"type": "array",
                   "items": transform(dt.elementType, dt.containsNull, path)}
        elif isinstance(dt, T.MapType):
            # avro maps are string-keyed (HudiSchemaUtils maps valueType only)
            out = {"type": "map",
                   "values": transform(dt.valueType, dt.valueContainsNull,
                                       path)}
        else:
            out = atomic(dt)
        return ["null", out] if nullable else out

    return transform(schema, False, "root")


# --------------------------------------------------------------------------
# Timeline primitives
# --------------------------------------------------------------------------


def hudi_dir(table_path: str) -> str:
    return os.path.join(table_path, HUDI_DIR)


def _instant_of(ms: int) -> str:
    """yyyyMMddHHmmssSSS in UTC (HoodieInstantTimeGenerator;
    HudiConversionTransaction.convertInstantToCommit)."""
    secs, millis = divmod(int(ms), 1000)
    return time.strftime("%Y%m%d%H%M%S", time.gmtime(secs)) + f"{millis:03d}"


def _completed_instants(table_path: str) -> list[str]:
    d = hudi_dir(table_path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        m = _INSTANT_RE.match(name)
        if m:
            out.append(m.group(1))
    return sorted(out)


def _read_commit(table_path: str, instant: str) -> dict:
    with open(os.path.join(hudi_dir(table_path),
                           f"{instant}.replacecommit")) as fh:
        return json.load(fh)


def last_converted_delta_version(table_path: str) -> Optional[int]:
    """HudiConverter.loadLastDeltaVersionConverted: the delta-version
    extra metadata of the latest completed instant."""
    instants = _completed_instants(table_path)
    if not instants:
        return None
    meta = _read_commit(table_path, instants[-1])
    v = (meta.get("extraMetadata") or {}).get(DELTA_VERSION_PROPERTY)
    return int(v) if v is not None else None


def _init_table_properties(table_path: str, name: str,
                           partition_fields: list[str]) -> None:
    """``hoodie.properties`` (HudiTransactionUtils.initializeHudiTable):
    COW, hive-style partitioning, no Hudi meta fields in the data files
    (populateMetaFields=false — the parquet is Delta's, unmodified)."""
    d = hudi_dir(table_path)
    path = os.path.join(d, "hoodie.properties")
    if os.path.exists(path):
        return
    os.makedirs(d, exist_ok=True)
    if not partition_fields:
        keygen = "org.apache.hudi.keygen.NonpartitionedKeyGenerator"
    elif len(partition_fields) > 1:
        keygen = "org.apache.hudi.keygen.CustomKeyGenerator"
    else:
        keygen = "org.apache.hudi.keygen.SimpleKeyGenerator"
    props = {
        "hoodie.table.name": name,
        "hoodie.table.type": "COPY_ON_WRITE",
        "hoodie.table.version": "6",
        "hoodie.timeline.layout.version": "1",
        "hoodie.table.base.file.format": "PARQUET",
        "hoodie.populate.meta.fields": "false",
        "hoodie.datasource.write.hive_style_partitioning": "true",
        "hoodie.table.keygenerator.class": keygen,
        "hoodie.timeline.timezone": "UTC",
        "hoodie.archivelog.folder": "archived",
        "hoodie.table.payload.class":
            "org.apache.hudi.common.model.HoodieAvroPayload",
    }
    if partition_fields:
        props["hoodie.table.partition.fields"] = ",".join(partition_fields)
    body = "".join(f"{k}={v}\n" for k, v in sorted(props.items()))
    body += f"hoodie.table.checksum={zlib.crc32(body.encode())}\n"
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write("#Updated at " + _instant_of(int(time.time() * 1000)) + "\n")
        fh.write(body)
    os.replace(tmp, path)


def _partition_path(add_path: str, table_path: str) -> str:
    """Relative partition directory of a file
    (HudiTransactionUtils.getPartitionPath): '' for unpartitioned.
    Hudi metadata records ON-DISK names, so the URL-encoded log path is
    decoded first."""
    from delta_spark.util import decode_log_path

    p = decode_log_path(add_path)
    if p.startswith("/") or "://" in p:
        root = table_path.rstrip("/") + "/"
        if p.startswith(root):
            p = p[len(root):]
        else:
            p = os.path.basename(p)
    d = os.path.dirname(p)
    return d


def _write_stat(f: AddFile, table_path: str, instant: str) -> tuple[str, dict]:
    """(partitionPath, HoodieWriteStat JSON) for an AddFile
    (HudiTransactionUtils.convertAddFile)."""
    from delta_spark.util import decode_log_path

    part = _partition_path(f.path, table_path)
    file_name = os.path.basename(decode_log_path(f.path))
    rel = file_name if not part else f"{part}/{file_name}"
    nrec = _num_records(f)
    return part, {
        "fileId": file_name,
        # external-file marker: lets Hudi parse the commit time of a
        # base file it did not name itself
        "path": f"{rel}_{instant}{EXTERNAL_FILE_MARKER}",
        "prevCommit": "null",
        "numWrites": nrec,
        "numDeletes": 0,
        "numUpdateWrites": 0,
        "numInserts": nrec,
        "totalWriteBytes": f.size,
        "totalWriteErrors": 0,
        "partitionPath": part or None,
        "totalLogRecords": 0,
        "totalLogFilesCompacted": 0,
        "totalLogSizeCompacted": 0,
        "totalUpdatedRecordsCompacted": 0,
        "totalLogBlocks": 0,
        "totalCorruptLogBlock": 0,
        "totalRollbackBlocks": 0,
        "fileSizeInBytes": f.size,
        "minEventTime": None,
        "maxEventTime": None,
    }


def _changes_since(log, start: int, end: int):
    """(adds, removes) across commits (start..end] RECONCILED per path
    (a file added and later removed inside the range must surface only
    as a remove — otherwise it would be re-registered AND replaced in
    one replacecommit and the replace-first replay would leave it
    live). Within one commit removes apply before adds, matching the
    protocol's add-wins rule for same-path DV updates. Returns None
    when any backing commit file is gone (log cleaned → full replace)."""
    last: dict[str, tuple[str, Any]] = {}
    for v in range(start, end + 1):
        try:
            actions = log.read_commit_actions(v)
        except (OSError, FileNotFoundError):
            return None
        ordered = ([x for x in actions if x[0] == "remove"]
                   + [x for x in actions if x[0] == "add"])
        for kind, a in ordered:
            last[a.path] = (kind, a)
    adds = [a for kind, a in last.values() if kind == "add"]
    removes = [a for kind, a in last.values() if kind == "remove"]
    return adds, removes


def convert_snapshot(log, snap=None) -> Optional[str]:
    """Write one Hudi REPLACE_COMMIT covering the Delta changes since
    the last conversion (HudiConversionTransaction.commit). Returns the
    completed instant file path, or None when already up to date."""
    snap = snap or log.update()
    config = snap.configuration
    if not uniform_hudi_enabled(config):
        return None
    validate_hudi_config(config)
    table_path = log.table_path

    last_v = last_converted_delta_version(table_path)
    if last_v is not None and last_v >= snap.version:
        return None

    name = (snap.metadata.name if getattr(snap.metadata, "name", None)
            else os.path.basename(os.path.normpath(table_path)) or "table")
    part_cols = snap.partition_columns
    _init_table_properties(table_path, name, part_cols)

    replaced: dict[str, list[str]] = {}
    if last_v is None:
        # first conversion: replace-the-world with the live file set
        adds, removes = list(snap.all_files), []
    else:
        delta = _changes_since(log, last_v + 1, snap.version)
        if delta is None:
            # commits expired from the log — full restatement; replace
            # every fileId the Hudi timeline currently tracks
            adds, removes = list(snap.all_files), []
            replaced = {p: sorted(ids)
                        for p, ids in live_file_groups(table_path).items()}
        else:
            adds, removes = delta
    for f in adds:
        if f.deletionVector is not None:
            raise HudiConversionError(
                "cannot convert a snapshot containing deletion vectors to Hudi")

    instant = _instant_of(snap.timestamp or int(time.time() * 1000))
    existing = _completed_instants(table_path)
    while existing and instant <= existing[-1]:
        instant = f"{int(instant) + 1:017d}"  # keep the timeline monotonic

    part_to_stats: dict[str, list[dict]] = {}
    for f in adds:
        part, stat = _write_stat(f, table_path, instant)
        part_to_stats.setdefault(part, []).append(stat)
    from delta_spark.util import decode_log_path as _dlp

    for r in removes:
        part = _partition_path(r.path, table_path)
        replaced.setdefault(part, []).append(os.path.basename(_dlp(r.path)))

    commit_meta = {
        "partitionToWriteStats": part_to_stats,
        "partitionToReplaceFileIds": replaced,
        "compacted": False,
        "operationType": "BULK_INSERT",
        "extraMetadata": {
            "schema": json.dumps(avro_schema(snap.schema)),
            DELTA_VERSION_PROPERTY: str(snap.version),
            DELTA_TIMESTAMP_PROPERTY: str(snap.timestamp),
        },
    }

    d = hudi_dir(table_path)
    # requested → inflight → completed, like the Hudi client's state
    # transitions (HudiConversionTransaction.scala:138-141)
    open(os.path.join(d, f"{instant}.replacecommit.requested"), "w").close()
    open(os.path.join(d, f"{instant}.replacecommit.inflight"), "w").close()
    final = os.path.join(d, f"{instant}.replacecommit")
    tmp = final + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(commit_meta, fh, indent=2)
    os.replace(tmp, final)
    # metadata table refresh is best-effort, AFTER the data commit —
    # the reference wraps the same step in a non-fatal catch
    # (HudiConversionTransaction.scala:161-172: "should not lead to
    # data corruption"); listing-based readers never need it
    try:
        write_metadata_table(log, snap, instant)
    except Exception:
        pass
    return final


def maybe_convert(log, snap) -> None:
    """Post-commit hook entry (mirrors uniform.maybe_convert)."""
    if uniform_hudi_enabled(snap.configuration):
        convert_snapshot(log, snap)


# --------------------------------------------------------------------------
# Timeline replay (the reader half — lets tests verify round-trips the
# way a listing-based Hudi reader would resolve the latest file slices)
# --------------------------------------------------------------------------


def live_file_groups(table_path: str) -> dict[str, set]:
    """partitionPath → live fileIds after replaying every completed
    replacecommit in instant order."""
    groups: dict[str, set] = {}
    for instant in _completed_instants(table_path):
        meta = _read_commit(table_path, instant)
        for part, ids in (meta.get("partitionToReplaceFileIds") or {}).items():
            if part in groups:
                groups[part].difference_update(ids)
        for part, stats in (meta.get("partitionToWriteStats") or {}).items():
            groups.setdefault(part, set()).update(s["fileId"] for s in stats)
    return groups


def read_hudi_files(table_path: str) -> list[str]:
    """Relative data-file paths of the current Hudi snapshot: latest
    file slice per live file group, external marker stripped."""
    live = live_file_groups(table_path)
    # latest registered path per fileId wins (timeline order)
    latest: dict[tuple[str, str], str] = {}
    for instant in _completed_instants(table_path):
        meta = _read_commit(table_path, instant)
        for part, stats in (meta.get("partitionToWriteStats") or {}).items():
            for s in stats:
                path = s["path"]
                suffix = f"_{instant}{EXTERNAL_FILE_MARKER}"
                if path.endswith(suffix):
                    path = path[: -len(suffix)]
                latest[(part, s["fileId"])] = path
    out = [p for (part, fid), p in latest.items() if fid in live.get(part, ())]
    return sorted(out)


# --------------------------------------------------------------------------
# Hudi metadata table (.hoodie/metadata) — the files index
# --------------------------------------------------------------------------
#
# The reference updates the metadata table through the Hudi client
# (HudiConversionTransaction.scala:152-172) and explicitly treats a
# metadata-table failure as non-fatal ("should not lead to data
# corruption"). This engine writes the same STRUCTURE directly:
#
#   .hoodie/metadata/.hoodie/hoodie.properties    (MOR metadata table)
#   .hoodie/metadata/.hoodie/<instant>.deltacommit[.requested|.inflight]
#   .hoodie/metadata/files/files-0000_<instant>.parquet
#
# with HoodieMetadataRecord-shaped rows: key = partition path ('.' for
# the table root, matching HoodieTableMetadataUtil's empty-partition
# convention), type 1 = the __all_partitions__ record, type 2 =
# per-partition filesystemMetadata (physical file name → size,
# isDeleted). DEVIATION (documented in README): base files are parquet,
# not HFile — the HFile writer lives in HBase client libs this engine
# does not take. Readers that require HFile fall back to listing (the
# default Hudi behavior when the metadata table is unreadable);
# everything else (timeline, record schema, partition layout) matches.

METADATA_DIR = os.path.join(HUDI_DIR, "metadata")
ALL_PARTITIONS_KEY = "__all_partitions__"


def _mdt_timeline_dir(table_path: str) -> str:
    return os.path.join(table_path, METADATA_DIR, ".hoodie")


def _init_metadata_table(table_path: str, name: str) -> None:
    d = _mdt_timeline_dir(table_path)
    os.makedirs(d, exist_ok=True)
    props = os.path.join(d, "hoodie.properties")
    if os.path.exists(props):
        return
    with open(props, "w") as fh:
        fh.write(
            "#Properties saved on metadata table init\n"
            f"hoodie.table.name={name}_metadata\n"
            "hoodie.table.type=MERGE_ON_READ\n"
            "hoodie.table.version=6\n"
            "hoodie.table.base.file.format=PARQUET\n"   # deviation: HFile
            "hoodie.table.recordkey.fields=key\n"
            "hoodie.populate.meta.fields=false\n"
            "hoodie.table.keygenerator.class="
            "org.apache.hudi.keygen.NonpartitionedKeyGenerator\n")


def write_metadata_table(log, snap, instant: str) -> Optional[str]:
    """Refresh the files partition of the metadata table to `snap`'s
    live file set under the given (data-table) instant. Returns the
    completed deltacommit path. Full refresh per conversion — the
    reference appends incremental deltacommits through the Hudi client;
    a restatement is equivalent for readers and needs no MOR compaction
    machinery."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from delta_spark.util import decode_log_path as _dlp

    table_path = log.table_path
    name = (snap.metadata.name if getattr(snap.metadata, "name", None)
            else os.path.basename(os.path.normpath(table_path)) or "table")
    _init_metadata_table(table_path, name)

    by_part: dict[str, dict[str, int]] = {}
    for f in snap.all_files:
        part = _partition_path(f.path, table_path) or "."
        by_part.setdefault(part, {})[
            os.path.basename(_dlp(f.path))] = int(f.size or 0)

    keys = [ALL_PARTITIONS_KEY] + sorted(by_part)
    types = [1] + [2] * len(by_part)
    fsmeta = [[{"name": p, "size": 0, "isDeleted": False}
               for p in sorted(by_part)]] + [
        [{"name": n, "size": sz, "isDeleted": False}
         for n, sz in sorted(by_part[p].items())]
        for p in sorted(by_part)]
    schema = pa.schema([
        ("key", pa.string()), ("type", pa.int32()),
        ("filesystemMetadata", pa.list_(pa.struct([
            ("name", pa.string()), ("size", pa.int64()),
            ("isDeleted", pa.bool_())])))])
    files_dir = os.path.join(table_path, METADATA_DIR, "files")
    os.makedirs(files_dir, exist_ok=True)
    base = os.path.join(files_dir, f"files-0000_{instant}.parquet")
    pq.write_table(pa.Table.from_pydict(
        {"key": keys, "type": types, "filesystemMetadata": fsmeta},
        schema=schema), base + ".tmp")
    os.replace(base + ".tmp", base)

    d = _mdt_timeline_dir(table_path)
    open(os.path.join(d, f"{instant}.deltacommit.requested"), "w").close()
    open(os.path.join(d, f"{instant}.deltacommit.inflight"), "w").close()
    final = os.path.join(d, f"{instant}.deltacommit")
    with open(final + ".tmp", "w") as fh:
        json.dump({"operationType": "UPSERT_PREPPED",
                   "partitionToWriteStats": {
                       "files": [{"fileId": "files-0000",
                                  "path": os.path.basename(base)}]}}, fh)
    os.replace(final + ".tmp", final)
    return final


def read_metadata_table_listing(table_path: str) -> dict[str, dict[str, int]]:
    """File listings from the metadata table (what a Hudi reader with
    hoodie.metadata.enable=true resolves instead of listing the
    filesystem): partitionPath → {file name: size} at the latest
    completed metadata deltacommit."""
    import pyarrow.parquet as pq

    d = _mdt_timeline_dir(table_path)
    try:
        instants = sorted(
            n[:-len(".deltacommit")] for n in os.listdir(d)
            if n.endswith(".deltacommit"))
    except FileNotFoundError:
        return {}
    if not instants:
        return {}
    base = os.path.join(table_path, METADATA_DIR, "files",
                        f"files-0000_{instants[-1]}.parquet")
    out: dict[str, dict[str, int]] = {}
    for row in pq.read_table(base).to_pylist():
        if row["type"] != 2:
            continue
        out[row["key"]] = {e["name"]: e["size"]
                           for e in row["filesystemMetadata"]
                           if not e["isDeleted"]}
    return out
