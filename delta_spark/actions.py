"""Transaction-log actions.

The action algebra and JSON wire format follow the Delta protocol
(reference: PROTOCOL.md "Actions"; spark/.../actions/actions.scala:215
for the sealed trait, :900 AddFile, :1171 RemoveFile, :1264 Metadata,
:232 Protocol, :675 SetTransaction, :1233 AddCDCFile, :693
DomainMetadata, :1415 CommitInfo). Field names match the protocol
exactly so our logs are structurally recognizable; replay semantics are
implemented in delta_spark.snapshot (InMemoryLogReplay.scala:37-56).

Each commit file `_delta_log/<version 020d>.json` is JSON-lines, one
action per line, wrapped in a single-key envelope:
{"add": {...}} | {"remove": {...}} | {"metaData": {...}} |
{"protocol": {...}} | {"txn": {...}} | {"cdc": {...}} |
{"commitInfo": {...}} | {"domainMetadata": {...}}
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import dataclass, field, asdict
from typing import Any, Optional


def _drop_none(d: dict) -> dict:
    return {k: v for k, v in d.items() if v is not None}


@dataclass
class Protocol:
    """Client gating (actions.scala:232). We implement reader v1 / writer v2
    semantics (append + invariants); table features are carried through."""

    minReaderVersion: int = 1
    minWriterVersion: int = 2
    readerFeatures: Optional[list[str]] = None
    writerFeatures: Optional[list[str]] = None

    def to_json(self) -> dict:
        return {"protocol": _drop_none(asdict(self))}


# ------------------------------------------------------ client gating ----
# Table features this engine implements (TableFeature.scala:550-1457,
# PROTOCOL.md "Reader Requirements"/"Writer Requirements"): clients MUST
# fail closed on a protocol they don't fully understand — reading past
# an unknown reader feature risks wrong results (e.g. ignoring deletion
# vectors), writing past an unknown writer feature corrupts the table.

MAX_READER_VERSION = 3
MAX_WRITER_VERSION = 7

SUPPORTED_READER_FEATURES = frozenset({
    "deletionVectors", "columnMapping", "timestampNtz",
    "typeWidening", "typeWidening-preview",
    "variantType", "variantType-preview",
    "variantShredding", "variantShredding-preview",
    "v2Checkpoint", "vacuumProtocolCheck",
    # GEOMETRY/GEOGRAPHY columns (TableFeature.scala:687; the -dev name
    # is the reference's private-preview spelling of the same feature)
    "geospatial", "geospatial-dev",
    # engine-local non-standard DV encoding (fail-closed marker for
    # external readers; we of course read it ourselves)
    "delta-spark.dvParquetSidecar",
    # catalog-managed tables (PROTOCOL.md "Catalog-Managed Tables"):
    # reads consult the managing catalog (catalog_managed.py implements
    # the reader rules; snapshots fail closed if no catalog state is
    # discoverable for the table)
    "catalogManaged",
    # table redirects (redirect.py, TableRedirect.scala): forPath on a
    # REDIRECT-READY source resolves to the destination; the writer-only
    # flavor (redirectWriterOnly-preview) is deliberately ABSENT from
    # the writer list — we fail closed on writes, stay open for reads
    "redirectReaderWriter-preview",
    # Adaptive Metadata Tree (TableFeature.scala:922 AdaptiveMetadata-
    # TableFeature; amt/ module): the table's checkpoint state lives in
    # an Iceberg-V4-style manifest tree committed INLINE as a
    # `checkpoint` action (delta_spark/amt.py). Requires catalogManaged,
    # rowTracking, domainMetadata, deletionVectors and columnMapping
    # (id mode) — validated at enablement (amt.check_enablement).
    "adaptiveMetadata-preview",
})

SUPPORTED_WRITER_FEATURES = SUPPORTED_READER_FEATURES | {
    "appendOnly", "invariants", "checkConstraints", "generatedColumns",
    "allowColumnDefaults", "changeDataFeed", "identityColumns",
    "rowTracking", "domainMetadata", "icebergCompatV1", "icebergCompatV2",
    "icebergCompatV3", "collations", "collations-preview",
    "materializePartitionColumns",
    "inCommitTimestamp", "clustering", "checkpointProtection",
    "coordinatedCommits-preview", "coordinatedCommits",
}


# Preview/dev spellings that gate the SAME semantics as a GA feature.
# The reference registers them as DISTINCT features with identical
# behavior (TableFeature.scala:797 variantType-preview, :843
# variantShredding-preview, :688 geospatial-dev, typeWidening-preview,
# collations-preview): a table declaring only the preview name must
# satisfy a metadata requirement for the GA name — force-adding the GA
# feature on the next write would churn the protocol of every
# reference-written preview table.
FEATURE_ALIASES = {
    "variantType": ("variantType-preview",),
    "variantShredding": ("variantShredding-preview",),
    "typeWidening": ("typeWidening-preview",),
    "geospatial": ("geospatial-dev",),
    "collations": ("collations-preview",),
    "coordinatedCommits": ("coordinatedCommits-preview",),
}


# PROTOCOL.md legacy version → implied features. When a legacy
# protocol is upgraded to the table-features form (writer 7 / reader
# 3), these must be denormalized into the explicit lists or the
# upgrade silently DROPS capabilities an external reader checks for
# (reference Protocol.implicitlySupportedFeatures, actions.scala).
LEGACY_WRITER_FEATURES = {
    2: ("appendOnly", "invariants"),
    3: ("checkConstraints",),
    4: ("changeDataFeed", "generatedColumns"),
    5: ("columnMapping",),
    6: ("identityColumns",),
}
LEGACY_READER_FEATURES = {2: ("columnMapping",)}


def implied_legacy_features(p: "Protocol") -> tuple[set, set]:
    """Features implied by a protocol's LEGACY version numbers (empty
    for legs that already carry an explicit feature list)."""
    r = set() if p.readerFeatures is not None else {
        f for v, fs in LEGACY_READER_FEATURES.items()
        if p.minReaderVersion >= v for f in fs}
    w = set() if p.writerFeatures is not None else {
        f for v, fs in LEGACY_WRITER_FEATURES.items()
        if p.minWriterVersion >= v for f in fs}
    return r, w


# legacy features → the (reader, writer) versions that imply them
LEGACY_FEATURE_VERSIONS = {
    "appendOnly": (1, 2), "invariants": (1, 2),
    "checkConstraints": (1, 3),
    "changeDataFeed": (1, 4), "generatedColumns": (1, 4),
    "columnMapping": (2, 5),
    "identityColumns": (1, 6),
}


def merge_protocol(cur: "Protocol", reader_feats: set = frozenset(),
                   writer_feats: set = frozenset(),
                   min_reader: int = 1, min_writer: int = 1) -> "Protocol":
    """The canonical protocol upgrade (Protocol.merge +
    denormalizedNormalized role): raise versions monotonically and stay
    in the weakest form that satisfies every requirement — a legacy
    protocol asked only for legacy features just bumps versions; any
    native feature (or an explicit 7 request, or a cur already in
    feature form) converts to the feature-vector form, carrying the
    implied legacy features of both cur and any requested legacy
    version. Reader features that are themselves legacy (columnMapping)
    keep the legacy reader version 2 with no readerFeatures list —
    reader 3 only when a native reader feature demands it. Reader-writer
    features must appear in BOTH input sets."""
    if min_reader > MAX_READER_VERSION or min_writer > MAX_WRITER_VERSION:
        # the reference rejects unknown protocol versions at SET time
        # (DeltaErrors InvalidProtocolVersionException) — committing
        # one would permanently brick the table for this client
        raise ValueError(
            f"unsupported protocol version ({min_reader}, {min_writer}); "
            f"this client supports up to ({MAX_READER_VERSION}, "
            f"{MAX_WRITER_VERSION})")
    reader_feats, writer_feats = set(reader_feats), set(writer_feats)
    # versions implied by requested LEGACY features
    leg_r = max((LEGACY_FEATURE_VERSIONS[f][0] for f in writer_feats
                 if f in LEGACY_FEATURE_VERSIONS), default=1)
    leg_w = max((LEGACY_FEATURE_VERSIONS[f][1] for f in writer_feats
                 if f in LEGACY_FEATURE_VERSIONS), default=1)
    minr = max(cur.minReaderVersion, min_reader, leg_r)
    minw = max(cur.minWriterVersion, min_writer, leg_w)
    native = {f for f in (reader_feats | writer_feats)
              if f not in LEGACY_FEATURE_VERSIONS}
    # reader 3 is only meaningful in the feature form (PROTOCOL.md:
    # readerFeatures exists iff minReaderVersion >= 3) — an explicit
    # reader-3 request forces the conversion rather than committing a
    # spec-invalid (3, <7, None, None) protocol
    to_features = (bool(native) or minw >= 7 or minr >= 3
                   or cur.writerFeatures is not None)
    if not to_features:
        # legacy normalized form: the version bump alone implies every
        # requested legacy feature
        if minr == cur.minReaderVersion and minw == cur.minWriterVersion:
            return cur
        return Protocol(minr, minw, cur.readerFeatures, cur.writerFeatures)
    # feature-vector form: implied features of cur, of any requested
    # legacy VERSION (reference denormalizes the whole version), plus
    # the requested features themselves
    impl_r, impl_w = implied_legacy_features(cur)
    req_r, req_w = implied_legacy_features(
        Protocol(min_reader if min_reader < 3 else 1,
                 min_writer if min_writer < 7 else 1))
    new_r = set(cur.readerFeatures or []) | impl_r | req_r | reader_feats
    new_w = (set(cur.writerFeatures or []) | impl_w | req_w
             | writer_feats | new_r)
    minw = max(minw, 7)
    # weakest reader form: if every reader feature is legacy-implied by
    # some reader version <= 2, keep that legacy reader version with no
    # readerFeatures list (reference keeps (2,7) for columnMapping-only
    # tables); a native reader feature or explicit reader-3 request
    # forces the list
    native_r = {f for f in new_r if f not in LEGACY_FEATURE_VERSIONS}
    if native_r or min_reader >= 3 or cur.readerFeatures is not None:
        minr = max(minr, 3)
        return Protocol(minr, minw, sorted(new_r), sorted(new_w) or None)
    leg_need = max((LEGACY_FEATURE_VERSIONS[f][0] for f in new_r), default=1)
    minr = max(minr, leg_need)
    return Protocol(minr, minw, None, sorted(new_w) or None)


class InvalidProtocolVersionException(Exception):
    """The table requires a newer protocol version than this client."""


class UnsupportedTableFeatureException(Exception):
    """The table requires a feature this client does not implement."""


def check_read_protocol(p: Optional["Protocol"]) -> None:
    """Reader gate (Protocol action semantics, actions.scala:232)."""
    if p is None:
        return
    if p.minReaderVersion > MAX_READER_VERSION:
        raise InvalidProtocolVersionException(
            f"table requires reader version {p.minReaderVersion}; "
            f"this client supports up to {MAX_READER_VERSION}")
    unknown = set(p.readerFeatures or []) - SUPPORTED_READER_FEATURES
    if unknown:
        raise UnsupportedTableFeatureException(
            f"table requires reader features {sorted(unknown)} "
            "this client does not implement")


def check_write_protocol(p: Optional["Protocol"]) -> None:
    """Writer gate — a writer must also satisfy the reader gate."""
    if p is None:
        return
    check_read_protocol(p)
    if p.minWriterVersion > MAX_WRITER_VERSION:
        raise InvalidProtocolVersionException(
            f"table requires writer version {p.minWriterVersion}; "
            f"this client supports up to {MAX_WRITER_VERSION}")
    unknown = set(p.writerFeatures or []) - SUPPORTED_WRITER_FEATURES
    if unknown:
        raise UnsupportedTableFeatureException(
            f"table requires writer features {sorted(unknown)} "
            "this client does not implement")


@dataclass
class Format:
    provider: str = "parquet"
    options: dict[str, str] = field(default_factory=dict)


@dataclass
class Metadata:
    """Table schema + partitioning + configuration (actions.scala:1264).

    ``schemaString`` is a Spark StructType JSON (SURVEY §1.2) — identical
    by construction since we run on Spark.
    """

    id: str = field(default_factory=lambda: str(uuid.uuid4()))
    name: Optional[str] = None
    description: Optional[str] = None
    format: Format = field(default_factory=Format)
    schemaString: str = "{}"
    partitionColumns: list[str] = field(default_factory=list)
    configuration: dict[str, str] = field(default_factory=dict)
    createdTime: Optional[int] = None

    def to_json(self) -> dict:
        d = asdict(self)
        return {"metaData": _drop_none(d)}

    @staticmethod
    def from_json(d: dict) -> "Metadata":
        fmt = d.get("format") or {}
        return Metadata(
            id=d.get("id", ""),
            name=d.get("name"),
            description=d.get("description"),
            format=Format(provider=fmt.get("provider", "parquet"), options=fmt.get("options", {}) or {}),
            schemaString=d.get("schemaString", "{}"),
            partitionColumns=list(d.get("partitionColumns", []) or []),
            configuration=dict(d.get("configuration", {}) or {}),
            createdTime=d.get("createdTime"),
        )


@dataclass
class AddFile:
    """A data file in the table (actions.scala:900). ``path`` is relative
    to the table root (URL-encoded per protocol) or an absolute URI
    (shallow clones). ``stats`` is the per-file JSON stats blob
    (stats/StatisticsCollection.scala:85-111)."""

    path: str
    partitionValues: dict[str, Optional[str]] = field(default_factory=dict)
    size: int = 0
    modificationTime: int = 0
    dataChange: bool = True
    stats: Optional[str] = None
    tags: Optional[dict[str, str]] = None
    # deletion vector descriptor (DeletionVectorDescriptor.scala;
    # PROTOCOL.md:1025). Our storageType 'q' = parquet row-index set
    # under _deletion_vectors/ (engine-native encoding; the protocol's
    # RoaringBitmap formats are 'u'/'i'/'p')
    deletionVector: Optional[dict] = None
    baseRowId: Optional[int] = None
    defaultRowCommitVersion: Optional[int] = None
    clusteringProvider: Optional[str] = None
    # AMT (adaptiveMetadata-preview, actions.scala:1143 BackReference):
    # {"manifest": <leaf rel path>, "pos": <row index>} when this file's
    # entry lives in an AMT leaf manifest — lets a later RemoveFile mask
    # the leaf position via an MDV without re-reading the leaf
    backReference: Optional[dict] = None

    def to_json(self) -> dict:
        d = _drop_none(asdict(self))
        # maxRowIndex is an in-memory validation field only — it must
        # never reach the log (actions.scala:1077-1081)
        if "deletionVector" in d and isinstance(d["deletionVector"], dict):
            d["deletionVector"].pop("maxRowIndex", None)
        return {"add": d}

    @staticmethod
    def from_json(d: dict) -> "AddFile":
        return AddFile(
            path=d["path"],
            partitionValues=dict(d.get("partitionValues", {}) or {}),
            size=int(d.get("size", 0) or 0),
            modificationTime=int(d.get("modificationTime", 0) or 0),
            dataChange=bool(d.get("dataChange", True)),
            stats=d.get("stats"),
            tags=d.get("tags"),
            deletionVector=d.get("deletionVector"),
            baseRowId=d.get("baseRowId"),
            defaultRowCommitVersion=d.get("defaultRowCommitVersion"),
            clusteringProvider=d.get("clusteringProvider"),
            backReference=d.get("backReference"),
        )

    @property
    def dv_cardinality(self) -> int:
        return int(self.deletionVector.get("cardinality", 0)) if self.deletionVector else 0

    def remove(self, data_change: bool = True, timestamp: Optional[int] = None) -> "RemoveFile":
        return RemoveFile(
            path=self.path,
            deletionTimestamp=timestamp if timestamp is not None else int(time.time() * 1000),
            dataChange=data_change,
            partitionValues=dict(self.partitionValues),
            size=self.size,
            backReference=self.backReference,
        )

    @property
    def parsed_stats(self) -> Optional[dict]:
        if not self.stats:
            return None
        try:
            return json.loads(self.stats)
        except (ValueError, TypeError):
            return None

    @property
    def num_records(self) -> Optional[int]:
        st = self.parsed_stats
        if st is None:
            return None
        return st.get("numRecords")


@dataclass
class RemoveFile:
    """Tombstone cancelling a prior AddFile (actions.scala:1171); retained
    until the retention window expires so VACUUM and streaming readers
    can see it."""

    path: str
    deletionTimestamp: Optional[int] = None
    dataChange: bool = True
    extendedFileMetadata: Optional[bool] = None
    partitionValues: Optional[dict[str, Optional[str]]] = None
    size: Optional[int] = None
    backReference: Optional[dict] = None    # AMT leaf position (amt.py)

    def to_json(self) -> dict:
        return {"remove": _drop_none(asdict(self))}

    @staticmethod
    def from_json(d: dict) -> "RemoveFile":
        return RemoveFile(
            path=d["path"],
            deletionTimestamp=d.get("deletionTimestamp"),
            dataChange=bool(d.get("dataChange", True)),
            extendedFileMetadata=d.get("extendedFileMetadata"),
            partitionValues=d.get("partitionValues"),
            size=d.get("size"),
            backReference=d.get("backReference"),
        )


@dataclass
class AddCDCFile:
    """Change-data file for CDF readers (actions.scala:1233). CDC files
    live under ``_change_data/`` and are invisible to normal scans."""

    path: str
    partitionValues: dict[str, Optional[str]] = field(default_factory=dict)
    size: int = 0
    tags: Optional[dict[str, str]] = None

    def to_json(self) -> dict:
        return {"cdc": _drop_none(asdict(self))}

    @staticmethod
    def from_json(d: dict) -> "AddCDCFile":
        return AddCDCFile(
            path=d["path"],
            partitionValues=dict(d.get("partitionValues", {}) or {}),
            size=int(d.get("size", 0) or 0),
            tags=d.get("tags"),
        )


@dataclass
class SetTransaction:
    """Idempotent-writer watermark (actions.scala:675) — the streaming
    sink's exactly-once mechanism: (appId, version) skips replayed
    microbatches."""

    appId: str
    version: int
    lastUpdated: Optional[int] = None

    def to_json(self) -> dict:
        return {"txn": _drop_none(asdict(self))}

    @staticmethod
    def from_json(d: dict) -> "SetTransaction":
        return SetTransaction(appId=d["appId"], version=int(d["version"]), lastUpdated=d.get("lastUpdated"))


@dataclass
class DomainMetadata:
    """Named configuration domain (actions.scala:693); used e.g. for
    clustered-table metadata (clustering/ClusteringMetadataDomain.scala)."""

    domain: str
    configuration: str = "{}"
    removed: bool = False

    def to_json(self) -> dict:
        return {"domainMetadata": asdict(self)}

    @staticmethod
    def from_json(d: dict) -> "DomainMetadata":
        return DomainMetadata(
            domain=d["domain"], configuration=d.get("configuration", "{}"), removed=bool(d.get("removed", False))
        )


@dataclass
class CommitInfo:
    """Operation provenance (actions.scala:1415); surfaced by DESCRIBE
    HISTORY (commands/DescribeDeltaHistoryCommand.scala:61)."""

    timestamp: int = field(default_factory=lambda: int(time.time() * 1000))
    operation: str = "WRITE"
    operationParameters: dict[str, Any] = field(default_factory=dict)
    readVersion: Optional[int] = None
    isolationLevel: Optional[str] = None
    isBlindAppend: Optional[bool] = None
    operationMetrics: dict[str, Any] = field(default_factory=dict)
    userMetadata: Optional[str] = None
    engineInfo: str = "delta_spark/0.1.0"
    txnId: str = field(default_factory=lambda: str(uuid.uuid4()))
    # PROTOCOL.md In-Commit Timestamps: when the ICT feature is active
    # the authoritative commit time is THIS dedicated field (the plain
    # `timestamp` stays the wall clock) — external readers look here
    inCommitTimestamp: Optional[int] = None

    def to_json(self) -> dict:
        d = asdict(self)
        # protocol serializes operationParameters values as JSON strings
        d["operationParameters"] = {k: v if isinstance(v, str) else json.dumps(v)
                                    for k, v in self.operationParameters.items()}
        return {"commitInfo": _drop_none(d)}

    @staticmethod
    def from_json(d: dict) -> "CommitInfo":
        return CommitInfo(
            timestamp=int(d.get("timestamp", 0) or 0),
            operation=d.get("operation", "UNKNOWN"),
            operationParameters=d.get("operationParameters", {}) or {},
            readVersion=d.get("readVersion"),
            isolationLevel=d.get("isolationLevel"),
            isBlindAppend=d.get("isBlindAppend"),
            operationMetrics=d.get("operationMetrics", {}) or {},
            userMetadata=d.get("userMetadata"),
            engineInfo=d.get("engineInfo", ""),
            txnId=d.get("txnId", ""),
            inCommitTimestamp=(int(d["inCommitTimestamp"])
                               if d.get("inCommitTimestamp") is not None
                               else None),
        )


Action = Any  # union of the dataclasses above


def action_to_json_line(action: Action) -> str:
    return json.dumps(action.to_json(), separators=(",", ":"))


def parse_action_line(line: str) -> tuple[str, Any]:
    """Parse one JSON-lines action → (kind, action object).

    kind ∈ {add, remove, metaData, protocol, txn, cdc, commitInfo,
    domainMetadata, unknown}. Unknown keys are preserved as raw dicts so
    a newer writer's log doesn't crash us (forward compatibility,
    mirroring SingleAction's one-of tolerance, actions.scala:1879).
    """
    d = json.loads(line)
    if "add" in d:
        return "add", AddFile.from_json(d["add"])
    if "remove" in d:
        return "remove", RemoveFile.from_json(d["remove"])
    if "metaData" in d:
        return "metaData", Metadata.from_json(d["metaData"])
    if "protocol" in d:
        p = d["protocol"]
        return "protocol", Protocol(
            minReaderVersion=p.get("minReaderVersion", 1),
            minWriterVersion=p.get("minWriterVersion", 2),
            readerFeatures=p.get("readerFeatures"),
            writerFeatures=p.get("writerFeatures"),
        )
    if "txn" in d:
        return "txn", SetTransaction.from_json(d["txn"])
    if "cdc" in d:
        return "cdc", AddCDCFile.from_json(d["cdc"])
    if "commitInfo" in d:
        return "commitInfo", CommitInfo.from_json(d["commitInfo"])
    if "domainMetadata" in d:
        return "domainMetadata", DomainMetadata.from_json(d["domainMetadata"])
    if "checkpoint" in d:
        # inline AMT manifest-commit checkpoint (adaptiveMetadata-
        # preview, actions.scala:1738). Redundant with the commit's own
        # inline actions during linear replay (includeActionsInCommitJson
        # is always true) — consumed only by the AMT bootstrap (amt.py)
        return "checkpoint", d["checkpoint"]
    return "unknown", d
