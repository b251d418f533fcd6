"""AMT — Adaptive Metadata Tree (`adaptiveMetadata-preview`).

The table's checkpoint state lives in an Iceberg-V4-style manifest tree
under ``<table>/metadata/`` and is committed INLINE as a ``checkpoint``
action in the commit JSON (reference: spark/.../delta/amt/ — actions
AMTSingleAction/Tracking/DeletionVector/ManifestInfo (amt/actions.scala),
AMTWriteHelper.writeFullMaterialization, IncrementalAMTWriter
.writeIncremental, AMTCheckpointProvider, AMTWriterManager cadence;
feature definition TableFeature.scala:922 — requires catalogManaged,
rowTracking, domainMetadata, deletionVectors, columnMapping).

Layout:

- **Root manifest** (parquet): one row per entry — live ``DATA``
  entries held directly in the root, ``DATA_MANIFEST`` pointers to leaf
  manifests, and ``DATA`` tombstones (tracking.status=DELETED) kept for
  CDF parity.
- **Leaf manifests** (parquet): ``DATA`` entries only. Never rewritten:
  deletions are masked by the pointer's ``manifest_info.dv`` — an MDV
  (manifest deletion vector, portable 64-bit RoaringBitmapArray of dead
  row positions, same codec as data DVs — delta_spark/dv.py).
- **Checkpoint action** (actions.scala:1738): carried inline in the
  commit JSON with the ContentRoot pointer and the inline non-content
  state (protocol, metadata, domainMetadata, txns). The commit ALSO
  carries its file actions inline (includeActionsInCommitJson), so
  linear log replay never needs the tree — the tree is the bootstrap
  (read state without replaying history) and the log-cleanup ceiling.
- **Back references** (actions.scala:1143): an AddFile reconstructed
  from a LEAF carries ``backReference = {manifest, pos}``; a later
  RemoveFile of that file carries it too, so the next incremental tree
  masks the leaf position without reading the leaf.

Iceberg V4 field ids are stamped onto the manifest parquet schema
(amt/actions.scala field-spec table) so an Iceberg-V4-aware reader can
resolve columns by id.

Deviations (documented): no deferred OPTIMIZE CHECKPOINT maintenance
commits — full rewrites happen inline on the triggering commit (the
tree still describes that commit's version); `content_stats`,
`key_metadata` and `split_offsets` are carried as nulls (Delta stats
stay in ``AddFile.stats``, which the tree preserves verbatim in
``tracking``-adjacent columns is NOT needed since adds are rebuilt from
the entries); manifests are read driver-side (they are metadata-scale:
leaves are bounded by ``delta_spark.amt.entriesPerLeaf``).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any, Optional

import pyarrow as pa
import pyarrow.parquet as pq

from delta_spark.actions import (
    AddFile,
    DomainMetadata,
    Metadata,
    Protocol,
    RemoveFile,
    SetTransaction,
)

FEATURE = "adaptiveMetadata-preview"
REQUIRED_FEATURES = ("catalogManaged", "rowTracking", "domainMetadata",
                     "deletionVectors", "columnMapping")
METADATA_DIR = "metadata"                       # FileNames.AMT_METADATA_DIR_NAME

# content_type codes (AMTSingleAction.ContentType, Iceberg V4)
DATA = 0
DATA_MANIFEST = 3
FORMAT_VERSION_V4 = 4

# tracking.status codes (Tracking.Status, Iceberg V4)
ST_EXISTING = 0
ST_ADDED = 1
ST_DELETED = 2

ENTRIES_PER_LEAF_PROP = "delta_spark.amt.entriesPerLeaf"
DEFAULT_ENTRIES_PER_LEAF = 100_000
FULL_REWRITE_MULTIPLIER = 4     # fullRewriteCheckpointIntervalMultiplier role
LARGE_COMMIT_ACTIONS = 10_000   # inline-AMT threshold for big commits


# ------------------------------------------------------------ schema ----

def _fid(i: int) -> dict:
    return {b"PARQUET:field_id": str(i).encode()}


def _manifest_schema() -> pa.Schema:
    """AMTSingleAction with the Iceberg V4 field ids stamped
    (amt/actions.scala topLevelFields / nested field-spec tables)."""
    tracking = pa.struct([
        pa.field("status", pa.int32(), nullable=False, metadata=_fid(0)),
        pa.field("snapshot_id", pa.int64(), metadata=_fid(1)),
        pa.field("sequence_number", pa.int64(), metadata=_fid(3)),
        pa.field("file_sequence_number", pa.int64(), metadata=_fid(4)),
        pa.field("dv_snapshot_id", pa.int64(), metadata=_fid(5)),
        pa.field("first_row_id", pa.int64(), metadata=_fid(142)),
        pa.field("deleted_positions", pa.binary(), metadata=_fid(6)),
        pa.field("replaced_positions", pa.binary(), metadata=_fid(7)),
    ])
    deletion_vector = pa.struct([
        pa.field("location", pa.string(), nullable=False, metadata=_fid(155)),
        pa.field("offset", pa.int64(), nullable=False, metadata=_fid(144)),
        pa.field("size_in_bytes", pa.int64(), nullable=False,
                 metadata=_fid(145)),
        pa.field("cardinality", pa.int64(), nullable=False,
                 metadata=_fid(156)),
    ])
    manifest_info = pa.struct([
        pa.field("added_files_count", pa.int64(), nullable=False,
                 metadata=_fid(504)),
        pa.field("existing_files_count", pa.int64(), nullable=False,
                 metadata=_fid(505)),
        pa.field("deleted_files_count", pa.int64(), nullable=False,
                 metadata=_fid(506)),
        pa.field("replaced_files_count", pa.int64(), nullable=False,
                 metadata=_fid(520)),
        pa.field("added_rows_count", pa.int64(), nullable=False,
                 metadata=_fid(512)),
        pa.field("existing_rows_count", pa.int64(), nullable=False,
                 metadata=_fid(513)),
        pa.field("deleted_rows_count", pa.int64(), nullable=False,
                 metadata=_fid(514)),
        pa.field("replaced_rows_count", pa.int64(), nullable=False,
                 metadata=_fid(521)),
        pa.field("min_sequence_number", pa.int64(), nullable=False,
                 metadata=_fid(516)),
        pa.field("dv", pa.binary(), metadata=_fid(522)),
        pa.field("dv_cardinality", pa.int64(), metadata=_fid(523)),
    ])
    partition = pa.struct([
        pa.field("values", pa.map_(pa.string(), pa.string())),
    ])
    return pa.schema([
        pa.field("content_type", pa.int32(), nullable=False,
                 metadata=_fid(134)),
        pa.field("format_version", pa.int32(), nullable=False,
                 metadata=_fid(157)),
        pa.field("location", pa.string(), nullable=False, metadata=_fid(100)),
        pa.field("file_format", pa.string(), nullable=False,
                 metadata=_fid(101)),
        pa.field("tracking", tracking, nullable=False, metadata=_fid(147)),
        pa.field("deletion_vector", deletion_vector, metadata=_fid(148)),
        pa.field("spec_id", pa.int32(), metadata=_fid(141)),
        pa.field("partition", partition, metadata=_fid(102)),
        pa.field("sort_order_id", pa.int32(), metadata=_fid(140)),
        pa.field("record_count", pa.int64(), nullable=False,
                 metadata=_fid(103)),
        pa.field("file_size_in_bytes", pa.int64(), nullable=False,
                 metadata=_fid(104)),
        # Delta-side carry: the AddFile's stats/DV/rowid fields, so the
        # reconstructed AddFile is lossless. Stamped with ids outside
        # the Iceberg reserved range.
        pa.field("delta_add_json", pa.string(), metadata=_fid(100010)),
        pa.field("manifest_info", manifest_info, metadata=_fid(150)),
        pa.field("key_metadata", pa.binary(), metadata=_fid(131)),
        pa.field("split_offsets", pa.list_(
            pa.field("element", pa.int64(), metadata=_fid(133))),
            metadata=_fid(132)),
    ])


_SCHEMA = _manifest_schema()


# ------------------------------------------------------------ helpers ----

def checkpoint_enabled(protocol) -> bool:
    return bool(protocol and FEATURE in (protocol.writerFeatures or []))


def check_enablement(protocol, configuration: dict) -> None:
    """Enablement gate (TableFeature.scala:925 requiredFeatures + the
    id-column-mapping check OptimisticTransaction enforces)."""
    feats = set(protocol.readerFeatures or []) | set(
        protocol.writerFeatures or [])
    missing = [f for f in REQUIRED_FEATURES if f not in feats]
    if missing:
        raise ValueError(
            f"{FEATURE} requires table features {missing} to be enabled "
            f"first (TableFeature.scala AdaptiveMetadataTableFeature."
            f"requiredFeatures)")
    if (configuration or {}).get("delta.columnMapping.mode") != "id":
        raise ValueError(
            f"{FEATURE} requires delta.columnMapping.mode = 'id' "
            f"(Iceberg V4 manifests reference columns by field id)")


def metadata_dir(table_path: str) -> str:
    return os.path.join(table_path, METADATA_DIR)


def _entry_from_add(add: AddFile, status: int,
                    backref_strip: bool = True) -> dict:
    """One DATA entry for an AddFile. The full AddFile JSON rides along
    in delta_add_json so reconstruction is lossless (stats, DV
    descriptor, row-tracking fields); the backReference is stripped —
    it is a property of WHERE the entry lives, re-derived on read."""
    d = add.to_json()["add"]
    if backref_strip:
        d.pop("backReference", None)
    return {
        "content_type": DATA,
        "format_version": FORMAT_VERSION_V4,
        "location": add.path,
        "file_format": "parquet",
        "tracking": {"status": status, "snapshot_id": None,
                     "sequence_number": None, "file_sequence_number": None,
                     "dv_snapshot_id": None, "first_row_id": add.baseRowId,
                     "deleted_positions": None, "replaced_positions": None},
        "deletion_vector": None,
        "spec_id": None,
        "partition": {"values": list((add.partitionValues or {}).items())},
        "sort_order_id": None,
        "record_count": add.num_records or 0,
        "file_size_in_bytes": add.size or 0,
        "delta_add_json": json.dumps(d, separators=(",", ":")),
        "manifest_info": None,
        "key_metadata": None,
        "split_offsets": None,
    }


def _pointer_entry(location: str, size: int, n_entries: int, n_rows: int,
                   mdv: Optional[bytes], mdv_card: int) -> dict:
    return {
        "content_type": DATA_MANIFEST,
        "format_version": FORMAT_VERSION_V4,
        "location": location,
        "file_format": "parquet",
        "tracking": {"status": ST_EXISTING, "snapshot_id": None,
                     "sequence_number": None, "file_sequence_number": None,
                     "dv_snapshot_id": None, "first_row_id": None,
                     "deleted_positions": None, "replaced_positions": None},
        "deletion_vector": None,
        "spec_id": None,
        "partition": {"values": []},
        "sort_order_id": None,
        "record_count": n_rows,
        "file_size_in_bytes": size,
        "delta_add_json": None,
        "manifest_info": {
            "added_files_count": 0, "existing_files_count": n_entries,
            "deleted_files_count": 0, "replaced_files_count": 0,
            "added_rows_count": 0, "existing_rows_count": n_rows,
            "deleted_rows_count": 0, "replaced_rows_count": 0,
            "min_sequence_number": 0,
            "dv": mdv, "dv_cardinality": mdv_card,
        },
        "key_metadata": None,
        "split_offsets": None,
    }


def _write_manifest(table_path: str, rows: list[dict]) -> tuple[str, int]:
    """Write one manifest parquet under <table>/metadata/; returns
    (table-root-relative location, size). Locations are raw literal
    strings (NOT url-encoded), per the Iceberg V4 manifest path rules
    (AMTUtils.relativizeManifestPathToTableRoot)."""
    d = metadata_dir(table_path)
    os.makedirs(d, exist_ok=True)
    name = f"manifest-{uuid.uuid4()}.parquet"
    path = os.path.join(d, name)
    cols = {f.name: [r.get(f.name) for r in rows] for f in _SCHEMA}
    pq.write_table(pa.Table.from_pydict(cols, schema=_SCHEMA),
                   path + ".tmp")
    os.replace(path + ".tmp", path)
    return f"{METADATA_DIR}/{name}", os.path.getsize(path)


def _read_manifest(table_path: str, location: str) -> list[dict]:
    return pq.read_table(
        os.path.join(table_path, location)).to_pylist()


def _add_from_entry(entry: dict, manifest_loc: Optional[str],
                    pos: Optional[int]) -> AddFile:
    add = AddFile.from_json(json.loads(entry["delta_add_json"]))
    if manifest_loc is not None:
        add.backReference = {"manifest": manifest_loc, "pos": pos}
    return add


class AMTCheckpoint:
    """The inline `checkpoint` action (actions.scala:1738) as written
    into / parsed from the commit JSON."""

    def __init__(self, d: dict):
        self.d = d

    def to_json(self) -> dict:
        return {"checkpoint": self.d}

    @property
    def version(self) -> int:
        return int(self.d["version"])

    @property
    def content_root(self) -> dict:
        return self.d["contentRoot"]


# ------------------------------------------------------------ writer ----

def _entries_per_leaf(configuration: dict) -> int:
    try:
        return max(1, int((configuration or {}).get(
            ENTRIES_PER_LEAF_PROP, DEFAULT_ENTRIES_PER_LEAF)))
    except (TypeError, ValueError):
        return DEFAULT_ENTRIES_PER_LEAF


def _checkpoint_dict(version: int, root_loc: str, root_size: int,
                     incremental: bool, last_full: int,
                     protocol: Protocol, metadata: Metadata,
                     domains, txns) -> dict:
    return {
        "version": version,
        "contentRoot": {
            "path": root_loc, "sizeInBytes": root_size,
            "tags": {"isIncremental": str(incremental).lower(),
                     "lastManifestCommitWithFullRewrite": str(last_full)},
        },
        "protocol": protocol.to_json()["protocol"],
        "metaData": metadata.to_json()["metaData"],
        "domainMetadata": [d.to_json()["domainMetadata"] for d in domains],
        "txns": [t.to_json()["txn"] for t in txns],
        "sidecars": [],
    }


def write_full(log, state, version: int) -> dict:
    """Full materialization (AMTWriteHelper.writeFullMaterialization):
    cluster the live file set into leaves of entriesPerLeaf, write a
    root of pointers (a single-leaf tree promotes the leaf to the
    root), return the checkpoint-action dict. `state` is the POST-commit
    replayed state (Snapshot-like: active/tombstones/protocol/metadata/
    domain_metadata/set_transactions)."""
    per_leaf = _entries_per_leaf(state.metadata.configuration
                                 if state.metadata else {})
    adds = sorted(state.active.values(), key=lambda a: a.path)
    root_rows: list[dict] = []
    if len(adds) <= per_leaf:
        root_rows.extend(_entry_from_add(a, ST_ADDED) for a in adds)
    else:
        for i in range(0, len(adds), per_leaf):
            chunk = adds[i:i + per_leaf]
            rows = [_entry_from_add(a, ST_EXISTING) for a in chunk]
            loc, size = _write_manifest(log.table_path, rows)
            root_rows.append(_pointer_entry(
                loc, size, len(chunk),
                sum(a.num_records or 0 for a in chunk), None, 0))
    root_loc, root_size = _write_manifest(log.table_path, root_rows)
    return _checkpoint_dict(
        version, root_loc, root_size, incremental=False, last_full=version,
        protocol=state.protocol, metadata=state.metadata,
        domains=state.domain_metadata.values(),
        txns=state.set_transactions.values())


def write_incremental(log, prev: AMTCheckpoint, state, version: int,
                      mdv_removes: list[RemoveFile],
                      commit_removes: list[RemoveFile]) -> dict:
    """Incremental rewrite (IncrementalAMTWriter.writeIncremental):
    carry the previous tree's leaf pointers forward patching their MDVs
    with every leaf position removed since the old tree (`mdv_removes`
    = window + this commit, IncrementalAMTWriter step 3.a), hold
    net-new live files in the root (spilling fresh leaves when over the
    cap), and keep root tombstones for THIS COMMIT's no-backref removes
    only (`commit_removes`, step 3.b — window removes already emitted
    their CDF in their own commits)."""
    from delta_spark.dv import deserialize_rbm_array, serialize_rbm_array

    table_path = log.table_path
    prev_root = _read_manifest(table_path, prev.content_root["path"])
    per_leaf = _entries_per_leaf(state.metadata.configuration
                                 if state.metadata else {})

    # MDV masking: every with-backref remove since the old tree
    mdv_new: dict[str, set[int]] = {}
    for r in mdv_removes:
        br = r.backReference
        if br:
            mdv_new.setdefault(br["manifest"], set()).add(int(br["pos"]))

    pointers: list[dict] = []
    leaf_live: dict[str, int] = {}   # location -> live entries remaining
    for row in prev_root:
        if row["content_type"] != DATA_MANIFEST:
            continue
        mi = dict(row["manifest_info"])
        dead = set()
        if mi.get("dv"):
            dead.update(int(x) for x in deserialize_rbm_array(mi["dv"]))
        dead |= mdv_new.get(row["location"], set())
        mi["dv"] = bytes(serialize_rbm_array(sorted(dead))) if dead else None
        mi["dv_cardinality"] = len(dead)
        new_row = dict(row)
        new_row["manifest_info"] = mi
        pointers.append(new_row)
        leaf_live[row["location"]] = (mi["existing_files_count"] or 0) - len(dead)

    # net-new live adds = post-commit active files NOT resident in a leaf
    root_adds = [a for a in state.active.values() if a.backReference is None]
    root_adds.sort(key=lambda a: a.path)

    # root tombstones (CDF parity): this commit's no-backref removes
    tombstones = [r for r in commit_removes if not r.backReference]

    root_rows: list[dict] = list(pointers)
    if len(root_adds) > per_leaf:
        for i in range(0, len(root_adds), per_leaf):
            chunk = root_adds[i:i + per_leaf]
            rows = [_entry_from_add(a, ST_EXISTING) for a in chunk]
            loc, size = _write_manifest(table_path, rows)
            root_rows.append(_pointer_entry(
                loc, size, len(chunk),
                sum(a.num_records or 0 for a in chunk), None, 0))
    else:
        root_rows.extend(_entry_from_add(a, ST_ADDED) for a in root_adds)
    for r in tombstones:
        stub = AddFile(path=r.path,
                       partitionValues=dict(r.partitionValues or {}),
                       size=r.size or 0)
        row = _entry_from_add(stub, ST_DELETED)
        root_rows.append(row)

    root_loc, root_size = _write_manifest(table_path, root_rows)
    last_full = int(prev.content_root.get("tags", {}).get(
        "lastManifestCommitWithFullRewrite", prev.version))
    return _checkpoint_dict(
        version, root_loc, root_size, incremental=True, last_full=last_full,
        protocol=state.protocol, metadata=state.metadata,
        domains=state.domain_metadata.values(),
        txns=state.set_transactions.values())


# ------------------------------------------------------------ reader ----

def load_state(log, ckpt: dict):
    """AMTCheckpointProvider role: reconstruct the full action set the
    tree describes. Returns (adds, protocol, metadata, domains, txns);
    leaf-resident AddFiles carry their backReference."""
    from delta_spark.dv import deserialize_rbm_array

    table_path = log.table_path
    cp = AMTCheckpoint(ckpt)
    root = _read_manifest(table_path, cp.content_root["path"])
    adds: list[AddFile] = []
    for row in root:
        if row["content_type"] == DATA:
            if row["tracking"]["status"] == ST_DELETED:
                continue                      # tombstone (CDF parity only)
            adds.append(_add_from_entry(row, None, None))
        elif row["content_type"] == DATA_MANIFEST:
            mi = row["manifest_info"] or {}
            dead = set()
            if mi.get("dv"):
                dead.update(int(x) for x in deserialize_rbm_array(mi["dv"]))
            for pos, entry in enumerate(_read_manifest(table_path,
                                                       row["location"])):
                if pos in dead or entry["content_type"] != DATA:
                    continue
                if entry["tracking"]["status"] == ST_DELETED:
                    continue
                adds.append(_add_from_entry(entry, row["location"], pos))
        else:
            raise ValueError(
                f"unsupported AMT content_type {row['content_type']}")
    protocol = Protocol(
        minReaderVersion=ckpt["protocol"].get("minReaderVersion", 3),
        minWriterVersion=ckpt["protocol"].get("minWriterVersion", 7),
        readerFeatures=ckpt["protocol"].get("readerFeatures"),
        writerFeatures=ckpt["protocol"].get("writerFeatures"))
    metadata = Metadata.from_json(ckpt["metaData"])
    domains = [DomainMetadata.from_json(d)
               for d in ckpt.get("domainMetadata") or []]
    txns = [SetTransaction.from_json(t) for t in ckpt.get("txns") or []]
    return adds, protocol, metadata, domains, txns


def find_latest_checkpoint(log, upto: int) -> Optional[tuple[int, dict]]:
    """Newest commit ≤ `upto` carrying an inline checkpoint action.

    Scans backward — bounded by the checkpoint cadence on AMT tables —
    with two cost guards for 100-TB-shaped logs: a memo on the DeltaLog
    (`_amt_last`, maintained by the bootstrap and the commit hook)
    truncates the scan at the last known tree, and each candidate
    commit is substring-probed for the action key before paying a full
    JSON parse (a large commit json holds 10⁵+ add lines; parsing them
    all just to learn there is no checkpoint action would dominate the
    commit path)."""
    memo = getattr(log, "_amt_last", None)
    if memo is not None and memo[0] > upto:
        memo = None
    floor = memo[0] if memo is not None else -1
    versions = [v for v in log.list_commit_versions()
                if floor < v <= upto]
    for v in reversed(versions):
        try:
            content = log.store.read(log.commit_source(v))
        except OSError:
            return None
        if '"checkpoint"' not in content:
            continue
        for kind, a in log.read_commit_actions(v):
            if kind == "checkpoint":
                log._amt_last = (v, a)
                return v, a
    if memo is not None:
        return memo
    return None


def removes_between(log, start: int, end: int) -> list[RemoveFile]:
    """All RemoveFile actions in commits [start, end] (the MDV-masking
    window of an incremental rewrite)."""
    out: list[RemoveFile] = []
    for v in range(start, end + 1):
        try:
            for kind, a in log.read_commit_actions(v):
                if kind == "remove":
                    out.append(a)
        except OSError:
            continue
    return out
