"""Delta Sharing wire protocol — profiles, capabilities, NDJSON lines.

Public protocol per delta-io/delta-sharing PROTOCOL.md. Two response
formats ride the same endpoints:

- ``parquet`` (classic): lines ``{"protocol":{"minReaderVersion":1}}``,
  ``{"metaData":{...schemaString, partitionColumns...}}``,
  ``{"file":{"url","id","partitionValues","size","stats",...}}``.
  Only representable for tables a plain parquet reader can serve
  (no deletion vectors, no column mapping, minReaderVersion 1).
- ``delta`` (delta-format sharing): lines wrap real delta actions —
  ``{"protocol":{"deltaProtocol":{...}}}``,
  ``{"metaData":{"deltaMetadata":{...},"version","size","numFiles"}}``,
  ``{"file":{"id","deltaSingleAction":{...},"version","timestamp",
  "expirationTimestamp"}}`` — mirroring the reference's
  sharing/.../model.scala:49-217 (DeltaSharingSingleAction envelope).

Format negotiation uses the ``delta-sharing-capabilities`` header:
``responseformat=parquet,delta;readerfeatures=deletionvectors,...``
(reference DeltaSharingUtils.scala: DELTA_SHARING_CAPABILITIES_HEADER).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Optional

RESPONSE_FORMAT_PARQUET = "parquet"
RESPONSE_FORMAT_DELTA = "delta"

CAPABILITIES_HEADER = "delta-sharing-capabilities"
TABLE_VERSION_HEADER = "delta-table-version"

# Reader features delta_spark's own reader can process when a shared
# table arrives in delta response format; sent by the client, used by
# the server to decide whether the table is servable to this client
# (reference DeltaSharingUtils.SUPPORTED_READER_FEATURES).
CLIENT_READER_FEATURES = (
    "deletionVectors",
    "columnMapping",
    "timestampNtz",
    "typeWidening",
    "typeWidening-preview",
    "variantType",
    "variantType-preview",
    "v2Checkpoint",
    "generatedColumns",
    "allowColumnDefaults",
    "identityColumns",
    "invariants",
    "checkConstraints",
    "appendOnly",
    "changeDataFeed",
    "domainMetadata",
    "inCommitTimestamp",
    "vacuumProtocolCheck",
    "rowTracking",
    "collations-preview",
    "geoTypes-preview",
)


class DeltaSharingError(Exception):
    """Client-visible sharing failure (HTTP error body carried along)."""

    def __init__(self, message: str, status: int = 400):
        super().__init__(message)
        self.status = status


@dataclass
class DeltaSharingProfile:
    """A share-provider credentials file
    (PROTOCOL.md "Profile File Format"; reference client
    DeltaSharingProfile). ``endpoint`` includes any URL prefix.

    Version 1 = static bearer token; version 2 = OAuth client
    credentials (``type: oauth_client_credentials`` with
    tokenEndpoint/clientId/clientSecret — the public connector's
    OAuthClientCredentialsAuthProvider)."""

    endpoint: str
    bearer_token: Optional[str] = None
    share_credentials_version: int = 1
    expiration_time: Optional[str] = None
    type: Optional[str] = None
    token_endpoint: Optional[str] = None
    client_id: Optional[str] = None
    client_secret: Optional[str] = None
    scope: Optional[str] = None

    @staticmethod
    def from_json(d: dict) -> "DeltaSharingProfile":
        ver = int(d.get("shareCredentialsVersion", 1))
        if ver > 2:
            raise DeltaSharingError(
                f"shareCredentialsVersion {ver} is not supported; "
                "this client supports version 1 and 2")
        if "endpoint" not in d:
            raise DeltaSharingError("profile must carry 'endpoint'")
        if ver == 2:
            kind = d.get("type")
            if kind != "oauth_client_credentials":
                raise DeltaSharingError(
                    f"unsupported version-2 profile type {kind!r}; this "
                    "client supports 'oauth_client_credentials'")
            missing = [k for k in ("tokenEndpoint", "clientId",
                                   "clientSecret") if k not in d]
            if missing:
                raise DeltaSharingError(
                    f"oauth profile is missing {missing}")
            return DeltaSharingProfile(
                endpoint=d["endpoint"].rstrip("/"),
                share_credentials_version=2,
                type=kind,
                token_endpoint=d["tokenEndpoint"],
                client_id=d["clientId"],
                client_secret=d["clientSecret"],
                scope=d.get("scope"),
            )
        if "bearerToken" not in d:
            raise DeltaSharingError(
                "profile must carry 'endpoint' and 'bearerToken'")
        return DeltaSharingProfile(
            endpoint=d["endpoint"].rstrip("/"),
            bearer_token=d["bearerToken"],
            share_credentials_version=ver,
            expiration_time=d.get("expirationTime"),
        )

    @staticmethod
    def read_from_file(path: str) -> "DeltaSharingProfile":
        with open(path, "r", encoding="utf-8") as f:
            return DeltaSharingProfile.from_json(json.load(f))

    def to_json(self) -> dict:
        d = {
            "shareCredentialsVersion": self.share_credentials_version,
            "endpoint": self.endpoint,
        }
        if self.share_credentials_version == 2:
            d.update({"type": self.type,
                      "tokenEndpoint": self.token_endpoint,
                      "clientId": self.client_id,
                      "clientSecret": self.client_secret})
            if self.scope:
                d["scope"] = self.scope
            return d
        d["bearerToken"] = self.bearer_token
        if self.expiration_time:
            d["expirationTime"] = self.expiration_time
        return d


@dataclass
class ParsedTablePath:
    """``profile#share.schema.table`` (reference client
    ParsedDeltaSharingTablePath)."""

    profile_file: str
    share: str
    schema: str
    table: str


def parse_table_path(path: str) -> ParsedTablePath:
    if "#" not in path:
        raise DeltaSharingError(
            f"expected 'profile#share.schema.table', got {path!r}")
    profile, _, rest = path.partition("#")
    parts = rest.split(".")
    if len(parts) != 3 or not all(parts) or not profile:
        raise DeltaSharingError(
            f"expected 'profile#share.schema.table', got {path!r}")
    return ParsedTablePath(profile, parts[0], parts[1], parts[2])


# ------------------------------------------------------- capabilities ----


@dataclass
class Capabilities:
    """Parsed delta-sharing-capabilities header."""

    response_formats: tuple[str, ...] = (RESPONSE_FORMAT_PARQUET,)
    reader_features: frozenset[str] = frozenset()

    @staticmethod
    def parse(header: Optional[str]) -> "Capabilities":
        if not header:
            return Capabilities()
        formats: list[str] = []
        feats: set[str] = set()
        for part in header.split(";"):
            k, _, v = part.strip().partition("=")
            k = k.strip().lower()
            if k == "responseformat":
                formats = [x.strip().lower() for x in v.split(",") if x.strip()]
            elif k == "readerfeatures":
                feats = {x.strip().lower() for x in v.split(",") if x.strip()}
        return Capabilities(
            response_formats=tuple(formats) or (RESPONSE_FORMAT_PARQUET,),
            reader_features=frozenset(feats),
        )

    def header_value(self) -> str:
        parts = ["responseformat=" + ",".join(self.response_formats)]
        if self.reader_features:
            parts.append("readerfeatures=" + ",".join(sorted(self.reader_features)))
        return ";".join(parts)


# ------------------------------------------------------- NDJSON lines ----


def _drop_none(d: dict) -> dict:
    return {k: v for k, v in d.items() if v is not None}


def parquet_protocol_line(min_reader_version: int = 1) -> str:
    return json.dumps({"protocol": {"minReaderVersion": min_reader_version}})


def parquet_metadata_line(metadata, version: Optional[int] = None,
                          size: Optional[int] = None,
                          num_files: Optional[int] = None) -> str:
    """``metadata`` is a delta_spark actions.Metadata."""
    d = {
        "id": metadata.id,
        "name": metadata.name,
        "description": metadata.description,
        "format": {"provider": "parquet"},
        "schemaString": metadata.schemaString,
        "partitionColumns": list(metadata.partitionColumns),
        "configuration": _shared_configuration(metadata.configuration),
        "version": version,
        "size": size,
        "numFiles": num_files,
    }
    return json.dumps({"metaData": _drop_none(d)})


def _shared_configuration(configuration: dict) -> dict:
    """Only CDF enablement crosses the wire in classic metadata
    (PROTOCOL.md: configuration carries enableChangeDataFeed)."""
    out = {}
    if str(configuration.get("delta.enableChangeDataFeed", "")).lower() == "true":
        out["enableChangeDataFeed"] = "true"
    return out


def parquet_file_line(url: str, file_id: str, partition_values: dict,
                      size: int, stats: Optional[str] = None,
                      version: Optional[int] = None,
                      timestamp: Optional[int] = None,
                      expiration_timestamp: Optional[int] = None) -> str:
    d = {
        "url": url,
        "id": file_id,
        "partitionValues": {k: v for k, v in partition_values.items()},
        "size": size,
        "stats": stats,
        "version": version,
        "timestamp": timestamp,
        "expirationTimestamp": expiration_timestamp,
    }
    return json.dumps({"file": _drop_none(d)})


def parquet_change_line(kind: str, url: str, file_id: str,
                        partition_values: dict, size: int,
                        version: int, timestamp: int,
                        stats: Optional[str] = None,
                        expiration_timestamp: Optional[int] = None) -> str:
    """A CDF action in classic format: kind is 'add' | 'cdf' | 'remove'
    (PROTOCOL.md "Change Data Feed Actions")."""
    d = {
        "url": url,
        "id": file_id,
        "partitionValues": {k: v for k, v in partition_values.items()},
        "size": size,
        "stats": stats,
        "version": version,
        "timestamp": timestamp,
        "expirationTimestamp": expiration_timestamp,
    }
    return json.dumps({kind: _drop_none(d)})


def delta_protocol_line(protocol_action, version: Optional[int] = None) -> str:
    """Wraps a delta Protocol action (model.scala:75 DeltaSharingProtocol)."""
    d = {"deltaProtocol": protocol_action.to_json()["protocol"]}
    if version is not None:
        d["version"] = version
    return json.dumps({"protocol": d})


def delta_metadata_line(metadata, version: Optional[int] = None,
                        size: Optional[int] = None,
                        num_files: Optional[int] = None) -> str:
    """Wraps a delta Metadata action (model.scala:91 DeltaSharingMetadata)."""
    d = {
        "version": version,
        "size": size,
        "numFiles": num_files,
        "deltaMetadata": metadata.to_json()["metaData"],
    }
    return json.dumps({"metaData": _drop_none(d)})


def delta_file_line(file_id: str, single_action: dict,
                    version: Optional[int] = None,
                    timestamp: Optional[int] = None,
                    expiration_timestamp: Optional[int] = None,
                    deletion_vector_file_id: Optional[str] = None) -> str:
    """Wraps one delta single action ({"add":...}|{"remove":...}|
    {"cdc":...}) — model.scala:121 DeltaSharingFileAction."""
    d = {
        "id": file_id,
        "version": version,
        "timestamp": timestamp,
        "expirationTimestamp": expiration_timestamp,
        "deletionVectorFileId": deletion_vector_file_id,
        "deltaSingleAction": single_action,
    }
    return json.dumps({"file": _drop_none(d)})
