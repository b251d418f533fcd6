"""Delta Sharing client — REST access plus Spark load entry points.

Mirrors the public surface of the delta-sharing python connector
(``delta_sharing.load_as_spark`` / ``load_table_changes_as_spark`` /
``SharingClient``) and the reference Spark connector's read paths
(sharing/.../DeltaSharingDataSource.scala:52).

Architecture — the faked-log design, same as the reference:

The reference client does not reimplement a reader for shared tables.
It CONSTRUCTS a delta log from the server's NDJSON response and lets
the ordinary delta path read it (DeltaSharingLogFileSystem.scala:969
"constructs local delta log based on delta actions returned from
delta sharing server"). This client does exactly that with real files:
each query materializes ``<cache>/<key>/_delta_log/`` plus the
downloaded data files, and hands the directory to delta_spark's
ordinary reader — so deletion vectors, column mapping, CDF semantics,
and schema handling are inherited, not duplicated.

Scale note: downloads run through a bounded thread pool against
presigned URLs and are content-addressed by file id, so repeated
queries of an unchanged table re-download nothing. On a real cluster
the same materialization would land on shared storage once and be read
by every executor; the sharing data plane (presigned object-store
URLs) is the horizontally-scalable part, identical to the reference.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile
import threading
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Optional
from urllib.parse import quote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from delta_spark.actions import (
    AddCDCFile,
    AddFile,
    Metadata,
    Protocol,
    RemoveFile,
    action_to_json_line,
    check_read_protocol,
)
from delta_spark.log import DeltaLog
from delta_spark.reader import read_snapshot
from delta_spark.sharing import filters as F
from delta_spark.sharing import protocol as proto
from delta_spark.sharing.protocol import (
    DeltaSharingError,
    DeltaSharingProfile,
    RESPONSE_FORMAT_DELTA,
    RESPONSE_FORMAT_PARQUET,
    parse_table_path,
)

_DOWNLOAD_THREADS = 16


# ----------------------------------------------------------- listing ----


@dataclass(frozen=True)
class Share:
    name: str


@dataclass(frozen=True)
class SchemaRef:
    name: str
    share: str


@dataclass(frozen=True)
class TableRef:
    name: str
    schema: str
    share: str

    @property
    def fqn(self) -> str:
        return f"{self.share}.{self.schema}.{self.table_name}"

    @property
    def table_name(self) -> str:
        return self.name


class RestClient:
    """urllib-based Delta Sharing REST client (reference:
    delta-sharing client DeltaSharingRestClient)."""

    def __init__(self, profile: DeltaSharingProfile, num_retries: int = 3,
                 response_format: Optional[str] = None):
        self.profile = profile
        self.num_retries = num_retries
        self._response_format = response_format
        # OAuth (version-2 profiles): cached access token + expiry ms
        self._oauth_token: Optional[str] = None
        self._oauth_token_exp_ms: int = 0

    # ------------------------------------------------------ plumbing ----

    def _bearer(self) -> str:
        """Current bearer: the static v1 token, or a cached OAuth
        access token fetched via the client-credentials grant and
        refreshed 60 s before expiry (the public connector's
        OAuthClientCredentialsAuthProvider flow)."""
        if self.profile.share_credentials_version != 2:
            return self.profile.bearer_token
        now = int(time.time() * 1000)
        if self._oauth_token and now < self._oauth_token_exp_ms - 60_000:
            return self._oauth_token
        from urllib.parse import urlencode

        form = {"grant_type": "client_credentials",
                "client_id": self.profile.client_id,
                "client_secret": self.profile.client_secret}
        if self.profile.scope:
            form["scope"] = self.profile.scope
        req = urllib.request.Request(
            self.profile.token_endpoint, data=urlencode(form).encode(),
            method="POST",
            headers={"Content-Type": "application/x-www-form-urlencoded"})
        try:
            with urllib.request.urlopen(req, timeout=60) as resp:
                tok = json.loads(resp.read())
        except urllib.error.HTTPError as e:
            raise DeltaSharingError(
                f"oauth token request failed ({e.code}): "
                f"{e.read().decode(errors='replace')[:200]}", e.code) from None
        except urllib.error.URLError as e:
            raise DeltaSharingError(
                f"cannot reach token endpoint "
                f"{self.profile.token_endpoint}: {e}", 503) from e
        self._oauth_token = tok["access_token"]
        self._oauth_token_exp_ms = now + int(tok.get("expires_in", 3600)) * 1000
        return self._oauth_token

    def _check_expiration(self) -> None:
        exp = self.profile.expiration_time
        if not exp:
            return
        import datetime as _dt

        raw = exp.replace("T", " ").replace("Z", "+00:00")
        ts = _dt.datetime.fromisoformat(raw)
        now = (_dt.datetime.now(_dt.timezone.utc) if ts.tzinfo
               else _dt.datetime.now())
        if ts < now:
            raise DeltaSharingError(
                "the bearer token in the profile has expired "
                f"({exp}); contact your share provider for a new profile",
                401)

    def _capabilities_header(self) -> str:
        if self._response_format == RESPONSE_FORMAT_PARQUET:
            return "responseformat=parquet"
        if self._response_format == RESPONSE_FORMAT_DELTA:
            feats = ",".join(f.lower() for f in proto.CLIENT_READER_FEATURES)
            return f"responseformat=delta;readerfeatures={feats}"
        feats = ",".join(f.lower() for f in proto.CLIENT_READER_FEATURES)
        return f"responseformat=parquet,delta;readerfeatures={feats}"

    def _request(self, method: str, path: str,
                 body: Optional[dict] = None,
                 params: Optional[dict] = None
                 ) -> tuple[dict, bytes]:
        self._check_expiration()
        url = self.profile.endpoint + path
        if params:
            pairs = [f"{k}={quote(str(v))}" for k, v in params.items()
                     if v is not None]
            if pairs:
                url += "?" + "&".join(pairs)
        data = json.dumps(body).encode() if body is not None else None
        last_err: Optional[Exception] = None
        for attempt in range(self.num_retries + 1):
            req = urllib.request.Request(url, data=data, method=method)
            req.add_header("Authorization", f"Bearer {self._bearer()}")
            req.add_header(proto.CAPABILITIES_HEADER,
                           self._capabilities_header())
            if data is not None:
                req.add_header("Content-Type", "application/json")
            try:
                with urllib.request.urlopen(req, timeout=120) as resp:
                    return dict(resp.headers), resp.read()
            except urllib.error.HTTPError as e:
                msg = e.read().decode(errors="replace")
                try:
                    msg = json.loads(msg).get("message", msg)
                except Exception:
                    pass
                err = DeltaSharingError(
                    f"{method} {path} failed ({e.code}): {msg}", e.code)
                if e.code in (429, 500, 502, 503) and attempt < self.num_retries:
                    last_err = err
                    time.sleep(0.1 * (2 ** attempt))
                    continue
                raise err from None
            except urllib.error.URLError as e:
                if attempt < self.num_retries:
                    last_err = e
                    time.sleep(0.1 * (2 ** attempt))
                    continue
                raise DeltaSharingError(
                    f"cannot reach sharing server at "
                    f"{self.profile.endpoint}: {e}", 503) from e
        raise DeltaSharingError(f"request failed: {last_err}", 503)

    def _paged(self, path: str, params: Optional[dict] = None) -> list[dict]:
        out: list[dict] = []
        token = None
        while True:
            p = dict(params or {})
            if token:
                p["pageToken"] = token
            _, body = self._request("GET", path, params=p)
            d = json.loads(body)
            out.extend(d.get("items", []))
            token = d.get("nextPageToken")
            if not token:
                return out

    # ------------------------------------------------------- listing ----

    def list_shares(self) -> list[dict]:
        return self._paged("/shares")

    def get_share(self, share: str) -> dict:
        _, body = self._request("GET", f"/shares/{quote(share)}")
        return json.loads(body)["share"]

    def list_schemas(self, share: str) -> list[dict]:
        return self._paged(f"/shares/{quote(share)}/schemas")

    def list_tables(self, share: str, schema: str) -> list[dict]:
        return self._paged(
            f"/shares/{quote(share)}/schemas/{quote(schema)}/tables")

    def list_all_tables(self, share: str) -> list[dict]:
        return self._paged(f"/shares/{quote(share)}/all-tables")

    # -------------------------------------------------------- tables ----

    def _table_path(self, share: str, schema: str, table: str) -> str:
        return (f"/shares/{quote(share)}/schemas/{quote(schema)}"
                f"/tables/{quote(table)}")

    def query_table_version(self, share: str, schema: str, table: str,
                            starting_timestamp: Optional[str] = None) -> int:
        headers, _ = self._request(
            "GET", self._table_path(share, schema, table) + "/version",
            params={"startingTimestamp": starting_timestamp})
        return int(_ci_header(headers, proto.TABLE_VERSION_HEADER))

    def query_table_metadata(self, share: str, schema: str, table: str,
                             version: Optional[int] = None,
                             timestamp: Optional[str] = None
                             ) -> "SharingResponse":
        headers, body = self._request(
            "GET", self._table_path(share, schema, table) + "/metadata",
            params={"version": version, "timestamp": timestamp})
        return SharingResponse.parse(headers, body)

    def query_table(self, share: str, schema: str, table: str,
                    predicate_hints: Optional[list[str]] = None,
                    json_predicate_hints: Optional[str] = None,
                    limit_hint: Optional[int] = None,
                    version: Optional[int] = None,
                    timestamp: Optional[str] = None,
                    starting_version: Optional[int] = None,
                    ending_version: Optional[int] = None,
                    max_files: Optional[int] = None
                    ) -> "SharingResponse":
        """Snapshot / version-range query. With ``max_files`` the
        server paginates via endStreamAction cursors; pages are
        drained transparently here (the page token pins the snapshot
        version, so every page reads the same table state)."""
        body: dict = {}
        if predicate_hints:
            body["predicateHints"] = predicate_hints
        if json_predicate_hints:
            body["jsonPredicateHints"] = json_predicate_hints
        if limit_hint is not None:
            body["limitHint"] = limit_hint
        if version is not None:
            body["version"] = version
        if timestamp is not None:
            body["timestamp"] = timestamp
        if starting_version is not None:
            body["startingVersion"] = starting_version
        if ending_version is not None:
            body["endingVersion"] = ending_version
        if max_files is not None:
            body["maxFiles"] = max_files
        path = self._table_path(share, schema, table) + "/query"
        headers, resp = self._request("POST", path, body=body)
        out = SharingResponse.parse(headers, resp)
        while out.next_page_token:
            body["pageToken"] = out.next_page_token
            body.pop("version", None)
            body.pop("timestamp", None)
            headers, resp = self._request("POST", path, body=body)
            page = SharingResponse.parse(headers, resp)
            out.files.extend(page.files)
            out.next_page_token = page.next_page_token
        return out

    def query_table_changes(self, share: str, schema: str, table: str,
                            starting_version: Optional[int] = None,
                            ending_version: Optional[int] = None,
                            starting_timestamp: Optional[str] = None,
                            ending_timestamp: Optional[str] = None,
                            include_historical_metadata: bool = False
                            ) -> "SharingResponse":
        headers, body = self._request(
            "GET", self._table_path(share, schema, table) + "/changes",
            params={
                "startingVersion": starting_version,
                "endingVersion": ending_version,
                "startingTimestamp": starting_timestamp,
                "endingTimestamp": ending_timestamp,
                "includeHistoricalMetadata":
                    "true" if include_historical_metadata else None,
            })
        return SharingResponse.parse(headers, body)


def _ci_header(headers: dict, name: str) -> str:
    for k, v in headers.items():
        if k.lower() == name.lower():
            return v
    raise DeltaSharingError(f"server response missing {name} header", 500)


# ------------------------------------------------- response parsing ----


@dataclass
class WireFile:
    """One file action off the wire, normalized across both formats."""

    kind: str                      # 'add' | 'cdf' | 'remove'
    url: str
    id: str
    partition_values: dict
    size: int
    stats: Optional[str] = None
    version: Optional[int] = None
    timestamp: Optional[int] = None
    expiration_timestamp: Optional[int] = None
    delta_action: Optional[dict] = None   # delta format: the raw single action
    deletion_vector_url: Optional[str] = None
    deletion_vector_file_id: Optional[str] = None


class SharingResponse:
    """Parsed NDJSON response: protocol, metadata (+historical), files."""

    def __init__(self) -> None:
        self.format: str = RESPONSE_FORMAT_PARQUET
        self.version: Optional[int] = None
        self.protocol: Optional[dict] = None
        self.metadata: Optional[dict] = None
        self.historical_metadata: list[tuple[int, dict]] = []
        self.historical_protocols: list[tuple[int, dict]] = []
        self.files: list[WireFile] = []
        self.next_page_token: Optional[str] = None

    @staticmethod
    def parse(headers: dict, body: bytes) -> "SharingResponse":
        r = SharingResponse()
        caps = _ci_header_opt(headers, proto.CAPABILITIES_HEADER)
        if caps and "responseformat=delta" in caps.replace(" ", "").lower():
            r.format = RESPONSE_FORMAT_DELTA
        ver = _ci_header_opt(headers, proto.TABLE_VERSION_HEADER)
        r.version = int(ver) if ver is not None else None
        for line in body.decode().splitlines():
            if not line.strip():
                continue
            d = json.loads(line)
            if "protocol" in d:
                r._take_protocol(d["protocol"])
            elif "metaData" in d:
                r._take_metadata(d["metaData"])
            elif "endStreamAction" in d:
                r.next_page_token = d["endStreamAction"].get("nextPageToken")
            elif "file" in d and r.format == RESPONSE_FORMAT_DELTA:
                r.files.append(_parse_delta_file(d["file"]))
            else:
                kind = next(iter(d))
                r.files.append(_parse_classic_file(kind, d[kind]))
        return r

    def _take_protocol(self, p: dict) -> None:
        hist_v = p.get("version")
        if self.protocol is None:
            self.protocol = p
        elif hist_v is not None:
            self.historical_protocols.append((int(hist_v), p))

    def _take_metadata(self, m: dict) -> None:
        if self.metadata is None:
            self.metadata = m
        else:
            v = m.get("version")
            self.historical_metadata.append(
                (int(v) if v is not None else -1, m))

    # ------------------------------------------------- schema access ----

    def spark_schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_string()))

    def schema_string(self) -> str:
        if self.metadata is None:
            raise DeltaSharingError("response carried no metadata", 500)
        if self.format == RESPONSE_FORMAT_DELTA:
            return self.metadata["deltaMetadata"]["schemaString"]
        return self.metadata["schemaString"]

    def partition_columns(self) -> list[str]:
        if self.metadata is None:
            return []
        if self.format == RESPONSE_FORMAT_DELTA:
            return list(self.metadata["deltaMetadata"]
                        .get("partitionColumns", []))
        return list(self.metadata.get("partitionColumns", []))


def _ci_header_opt(headers: dict, name: str) -> Optional[str]:
    for k, v in headers.items():
        if k.lower() == name.lower():
            return v
    return None


def _parse_classic_file(kind: str, d: dict) -> WireFile:
    if kind not in ("file", "add", "cdf", "remove"):
        raise DeltaSharingError(f"unexpected action {kind!r} in response", 500)
    return WireFile(
        kind="add" if kind == "file" else kind,
        url=d["url"],
        id=d["id"],
        partition_values=d.get("partitionValues", {}) or {},
        size=int(d.get("size", 0) or 0),
        stats=d.get("stats"),
        version=d.get("version"),
        timestamp=d.get("timestamp"),
        expiration_timestamp=d.get("expirationTimestamp"),
    )


def _parse_delta_file(d: dict) -> WireFile:
    single = d["deltaSingleAction"]
    kind = next(iter(single))
    inner = single[kind]
    mapped = {"add": "add", "cdc": "cdf", "remove": "remove"}.get(kind)
    if mapped is None:
        raise DeltaSharingError(
            f"unexpected deltaSingleAction {kind!r} in response", 500)
    dv = inner.get("deletionVector")
    dv_url = None
    if dv and dv.get("storageType") == "p" and "://" in dv.get(
            "pathOrInlineDv", ""):
        dv_url = dv["pathOrInlineDv"]
    return WireFile(
        kind=mapped,
        url=inner["path"],
        id=d["id"],
        partition_values=inner.get("partitionValues", {}) or {},
        size=int(inner.get("size", 0) or 0),
        stats=inner.get("stats"),
        version=d.get("version"),
        timestamp=d.get("timestamp"),
        expiration_timestamp=d.get("expirationTimestamp"),
        delta_action=single,
        deletion_vector_url=dv_url,
        deletion_vector_file_id=d.get("deletionVectorFileId"),
    )


# ----------------------------------------------------- materializer ----


_cache_root_lock = threading.Lock()
_default_cache_root: Optional[str] = None


def _cache_root(override: Optional[str] = None) -> str:
    global _default_cache_root
    if override:
        os.makedirs(override, exist_ok=True)
        return override
    with _cache_root_lock:
        if _default_cache_root is None:
            _default_cache_root = tempfile.mkdtemp(
                prefix="delta_sharing_cache_")
        return _default_cache_root


def _download_many(jobs: list[tuple[str, str]]) -> None:
    """(url, target_path) downloads through a bounded pool; idempotent
    by target existence."""
    todo = [(u, p) for u, p in jobs if not os.path.exists(p)]
    if not todo:
        return

    def fetch(job: tuple[str, str]) -> None:
        url, target = job
        os.makedirs(os.path.dirname(target), exist_ok=True)
        tmp = target + f".tmp{os.getpid()}.{threading.get_ident()}"
        try:
            with urllib.request.urlopen(url, timeout=300) as resp, \
                    open(tmp, "wb") as out:
                shutil.copyfileobj(resp, out, length=1 << 20)
            os.replace(tmp, target)
        finally:
            if os.path.exists(tmp):
                try:
                    os.remove(tmp)
                except OSError:
                    pass

    with ThreadPoolExecutor(max_workers=min(_DOWNLOAD_THREADS,
                                            len(todo))) as pool:
        list(pool.map(fetch, todo))  # propagate the first failure


def _classic_metadata_to_action(m: dict) -> Metadata:
    cfg = {}
    if str((m.get("configuration") or {}).get(
            "enableChangeDataFeed", "")).lower() == "true":
        cfg["delta.enableChangeDataFeed"] = "true"
    return Metadata(
        id=m.get("id") or "shared",
        name=m.get("name"),
        description=m.get("description"),
        schemaString=m["schemaString"],
        partitionColumns=list(m.get("partitionColumns", []) or []),
        configuration=cfg,
    )


def _delta_metadata_to_action(m: dict) -> Metadata:
    return Metadata.from_json(m["deltaMetadata"])


def _response_protocol(resp: SharingResponse) -> Protocol:
    if resp.format == RESPONSE_FORMAT_DELTA:
        p = Protocol(**{k: v for k, v in resp.protocol["deltaProtocol"].items()
                        if k in ("minReaderVersion", "minWriterVersion",
                                 "readerFeatures", "writerFeatures")})
    else:
        p = Protocol(minReaderVersion=int(
            (resp.protocol or {}).get("minReaderVersion", 1)))
    # fail closed exactly like a direct read of an unsupported table
    check_read_protocol(p)
    return p


def _dir_partition_columns(resp: SharingResponse) -> list[str]:
    """Partition columns as they appear in partitionValues keys (and
    therefore in the hive-style directory layout delta_spark's reader
    parses via basePath): logical names normally, PHYSICAL names under
    column mapping (PROTOCOL.md: partitionValues keys are physical)."""
    cols = resp.partition_columns()
    if not cols or resp.format != RESPONSE_FORMAT_DELTA:
        return cols
    fields = json.loads(resp.schema_string()).get("fields", [])
    phys = {f.get("name"): (f.get("metadata") or {}).get(
        "delta.columnMapping.physicalName", f.get("name"))
        for f in fields}
    return [phys.get(c, c) for c in cols]


def _rel_data_path(wf: WireFile, part_cols: list[str]) -> str:
    """Local relative path for a wire file. CDC parquet files carry
    every column physically, so they stay flat under _change_data/;
    data files get the hive-style partition directories the reader's
    basePath partition parsing expects (matching the source layout)."""
    if wf.kind == "cdf":
        return f"_change_data/{wf.id}.parquet"
    if part_cols:
        from delta_spark.util import partition_path

        prefix = partition_path(wf.partition_values, part_cols)
        return f"shared/{prefix}/{wf.id}.parquet"
    return f"shared/{wf.id}.parquet"


class Materializer:
    """Builds the faked local delta table for a response (the role of
    DeltaSharingLogFileSystem + DeltaSharingUtils' constructed log)."""

    def __init__(self, cache_dir: Optional[str] = None):
        self.root = _cache_root(cache_dir)
        self._part_cols: list[str] = []

    def _dir_for(self, key: str) -> str:
        return os.path.join(self.root,
                            hashlib.sha1(key.encode()).hexdigest()[:24])

    # -------------------------------------------------- snapshot query ----

    def snapshot_table(self, resp: SharingResponse, key: str) -> str:
        """Materialize a snapshot response as a one-commit delta table;
        returns the table path. Reuses an existing materialization of
        the same key (content-addressed by table/version/files)."""
        table_dir = self._dir_for(key)
        self._part_cols = _dir_partition_columns(resp)
        marker = os.path.join(table_dir, "_delta_log", ".materialized")
        if not os.path.exists(marker):
            if resp.format == RESPONSE_FORMAT_DELTA:
                protocol = _response_protocol(resp)
                meta = _delta_metadata_to_action(resp.metadata)
            else:
                protocol = _response_protocol(resp)
                meta = _classic_metadata_to_action(resp.metadata)
            actions: list = [protocol, meta]
            for wf in resp.files:
                if wf.kind != "add":
                    raise DeltaSharingError(
                        f"unexpected {wf.kind} action in snapshot response",
                        500)
                actions.append(self._add_action(table_dir, wf))
            self._write_commit(table_dir, 0, actions)
            self._fetch_data(table_dir, resp.files)
            with open(marker, "w", encoding="utf-8"):
                pass
        else:
            # data files are content-addressed; re-fetch any missing
            self._fetch_data(table_dir, resp.files)
        return table_dir

    def _add_action(self, table_dir: str, wf: WireFile) -> AddFile:
        from delta_spark.util import encode_log_path

        rel = encode_log_path(_rel_data_path(wf, self._part_cols))
        if wf.delta_action is not None:
            add = AddFile.from_json(wf.delta_action["add"])
            add.path = rel
            add.dataChange = True
            if add.deletionVector is not None:
                add.deletionVector = self._localize_dv(
                    table_dir, add.deletionVector, wf)
            # row tracking metadata survives (baseRowId etc.)
            return add
        return AddFile(
            path=rel,
            partitionValues=dict(wf.partition_values),
            size=wf.size,
            modificationTime=0,
            dataChange=True,
            stats=wf.stats,
        )

    def _localize_dv(self, table_dir: str, desc: dict,
                     wf: WireFile) -> dict:
        d = dict(desc)
        if d.get("storageType") == "i":
            return d
        url = wf.deletion_vector_url or d.get("pathOrInlineDv", "")
        if "://" not in url:
            raise DeltaSharingError(
                "delta-format response carried a non-inline deletion "
                "vector without a downloadable url", 500)
        # cache by the STABLE wire id, not the presigned url (whose
        # embedded expiry changes per request — url-keying would
        # re-download the same blob every query)
        dv_name = wf.deletion_vector_file_id or hashlib.sha1(
            url.split("?", 1)[0].encode()).hexdigest()
        local = os.path.join(table_dir, "deletion_vectors",
                             f"{dv_name}.bin")
        _download_many([(url, local)])
        d["storageType"] = "p"
        d["pathOrInlineDv"] = local
        return d

    def _fetch_data(self, table_dir: str, files: list[WireFile]) -> None:
        jobs = [(wf.url,
                 os.path.join(table_dir,
                              _rel_data_path(wf, self._part_cols)))
                for wf in files]
        _download_many(jobs)

    def _write_commit(self, table_dir: str, version: int, actions: list,
                      timestamp_ms: Optional[int] = None) -> None:
        log_dir = os.path.join(table_dir, "_delta_log")
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.join(log_dir, f"{version:020d}.json")
        if os.path.exists(path):
            return  # idempotent under concurrent materializations
        lines = []
        for a in actions:
            if isinstance(a, dict):
                lines.append(json.dumps(a))
            else:
                lines.append(action_to_json_line(a))
        # atomic publish: a tailing stream reader must never observe a
        # torn commit file
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(lines) + "\n")
        if timestamp_ms is not None:
            os.utime(tmp, (timestamp_ms / 1000.0, timestamp_ms / 1000.0))
        os.replace(tmp, path)

    # --------------------------------------------------- change query ----

    def changes_table(self, resp: SharingResponse, key: str,
                      start: int, end: int,
                      table_dir: Optional[str] = None) -> str:
        """Materialize a changes / version-range response as a delta
        table whose commit numbering mirrors the SOURCE table versions
        (empty filler commits up to `start`), so CDF and streaming
        reads over the faked table report the true _commit_version."""
        table_dir = table_dir or self._dir_for(key)
        self._part_cols = _dir_partition_columns(resp)
        marker = os.path.join(table_dir, "_delta_log", ".materialized")
        if os.path.exists(marker):
            self._fetch_data(table_dir, resp.files)
            return table_dir
        if resp.format == RESPONSE_FORMAT_DELTA:
            protocol = _response_protocol(resp)
            meta = _delta_metadata_to_action(resp.metadata)
        else:
            protocol = _response_protocol(resp)
            meta = _classic_metadata_to_action(resp.metadata)
            # a CDF response implies the feed is on at the start version
            meta.configuration["delta.enableChangeDataFeed"] = "true"

        by_version: dict[int, list] = {}
        ts_by_version: dict[int, int] = {}
        for wf in resp.files:
            v = int(wf.version if wf.version is not None else start)
            ts_by_version.setdefault(v, int(wf.timestamp or 0))
            by_version.setdefault(v, []).append(self._change_action(
                table_dir, wf))
        for v, m in resp.historical_metadata:
            if v < 0:
                continue
            act = (_delta_metadata_to_action(m)
                   if resp.format == RESPONSE_FORMAT_DELTA
                   else _classic_metadata_to_action(m))
            if resp.format == RESPONSE_FORMAT_PARQUET:
                act.configuration["delta.enableChangeDataFeed"] = "true"
            by_version.setdefault(v, []).insert(0, act)
        for v, p in resp.historical_protocols:
            # a mid-range protocol upgrade (say, DVs enabled) must land
            # in the faked log before the first action that needs it
            by_version.setdefault(v, []).insert(
                0, Protocol(**{k: x for k, x in p["deltaProtocol"].items()
                               if k in ("minReaderVersion",
                                        "minWriterVersion",
                                        "readerFeatures",
                                        "writerFeatures")}))

        # version 0 carries protocol+metadata; fillers keep the chain
        # contiguous; real actions land at their true versions.
        base: list = [protocol, meta]
        if start == 0:
            base.extend(by_version.pop(0, []))
        self._write_commit(table_dir, 0, base,
                           timestamp_ms=ts_by_version.get(0))
        for v in range(1, end + 1):
            acts = by_version.pop(v, None)
            if acts is None:
                acts = [{"commitInfo": {"operation": "SHARED-FILLER"}}]
            self._write_commit(table_dir, v, acts,
                               timestamp_ms=ts_by_version.get(v))
        self._fetch_data(table_dir, resp.files)
        with open(marker, "w", encoding="utf-8"):
            pass
        return table_dir

    def _change_action(self, table_dir: str, wf: WireFile):
        from delta_spark.util import encode_log_path

        rel = encode_log_path(_rel_data_path(wf, self._part_cols))
        if wf.delta_action is not None:
            kind = next(iter(wf.delta_action))
            inner = dict(wf.delta_action[kind])
            inner["path"] = rel
            if kind == "add":
                act = AddFile.from_json(inner)
                if act.deletionVector is not None:
                    act.deletionVector = self._localize_dv(
                        table_dir, act.deletionVector, wf)
                return act
            if kind == "remove":
                return RemoveFile.from_json(inner)
            return AddCDCFile.from_json(inner)
        if wf.kind == "add":
            return AddFile(path=rel,
                           partitionValues=dict(wf.partition_values),
                           size=wf.size, dataChange=True, stats=wf.stats)
        if wf.kind == "remove":
            return RemoveFile(path=rel, dataChange=True,
                              partitionValues=dict(wf.partition_values),
                              size=wf.size)
        return AddCDCFile(path=rel,
                          partitionValues=dict(wf.partition_values),
                          size=wf.size)

    # ----------------------------------------------------- streaming ----

    def stream_init_snapshot(self, resp: SharingResponse, table_dir: str,
                             remote_version: int) -> str:
        """Initial materialization for a tailing stream without
        startingVersion: the snapshot's files land in commit 0 and
        filler commits carry the chain up to the source's current
        version, so later appended commits keep SOURCE version numbers
        (the contract streaming offsets/checkpoints depend on —
        reference DeltaFormatSharingSource.scala:224 getStartingVersion
        'fetch the snapshot at the fromVersion').

        Crash/concurrency safety: commit 0 RECORDS the snapshot version
        it represents in its commitInfo, the filler chain is derived
        from whatever commit 0 actually landed (so a racing initializer
        whose snapshot was at a different version never writes a filler
        that swallows a source commit), and the completion marker is
        written last (a crashed half-init re-enters and heals — commit
        writes are skip-if-exists, data fetches content-addressed)."""
        self._part_cols = _dir_partition_columns(resp)
        marker = os.path.join(table_dir, "_delta_log", ".stream_init")
        if os.path.exists(marker):
            return table_dir
        commit0 = os.path.join(table_dir, "_delta_log",
                               "%020d.json" % 0)
        if not os.path.exists(commit0):
            protocol = _response_protocol(resp)
            meta = (_delta_metadata_to_action(resp.metadata)
                    if resp.format == RESPONSE_FORMAT_DELTA
                    else _classic_metadata_to_action(resp.metadata))
            actions: list = [
                {"commitInfo": {"operation": "SHARED-SNAPSHOT",
                                "snapshotVersion": remote_version}},
                protocol, meta]
            for wf in resp.files:
                actions.append(self._add_action(table_dir, wf))
            self._fetch_data(table_dir, resp.files)
            self._write_commit(table_dir, 0, actions)
        # the WINNER's recorded snapshot version bounds the fillers
        anchor = remote_version
        try:
            with open(commit0, "r", encoding="utf-8") as f:
                for line in f:
                    d = json.loads(line)
                    if "commitInfo" in d:
                        anchor = int(d["commitInfo"].get(
                            "snapshotVersion", remote_version))
                        break
        except (OSError, ValueError):
            pass
        for v in range(1, anchor + 1):
            self._write_commit(
                table_dir, v,
                [{"commitInfo": {"operation": "SHARED-FILLER"}}])
        with open(marker, "w", encoding="utf-8"):
            pass
        return table_dir

    def append_range(self, resp: SharingResponse, table_dir: str,
                     start: int, end: int) -> None:
        """Append commits [start, end] from a version-range query to an
        existing faked log. Data files are fetched BEFORE their commit
        becomes visible, so a concurrently-planning stream reader never
        plans a file that is still downloading."""
        self._part_cols = _dir_partition_columns(resp)
        by_version: dict[int, list] = {}
        ts_by_version: dict[int, int] = {}
        for wf in resp.files:
            v = int(wf.version if wf.version is not None else start)
            ts_by_version.setdefault(v, int(wf.timestamp or 0))
            by_version.setdefault(v, []).append(
                self._change_action(table_dir, wf))
        for v, m in resp.historical_metadata:
            if v < start:
                continue
            act = (_delta_metadata_to_action(m)
                   if resp.format == RESPONSE_FORMAT_DELTA
                   else _classic_metadata_to_action(m))
            by_version.setdefault(v, []).insert(0, act)
        for v, p in resp.historical_protocols:
            if v < start:
                continue
            by_version.setdefault(v, []).insert(
                0, Protocol(**{k: x for k, x in p["deltaProtocol"].items()
                               if k in ("minReaderVersion",
                                        "minWriterVersion",
                                        "readerFeatures",
                                        "writerFeatures")}))
        # the response header restates metadata as of `start`; write it
        # into the start commit only when it actually changed there,
        # so the stream's schema tracking sees real changes only
        head = (_delta_metadata_to_action(resp.metadata)
                if resp.format == RESPONSE_FORMAT_DELTA
                else _classic_metadata_to_action(resp.metadata))
        try:
            cur = DeltaLog.for_table(table_dir).update().metadata
        except Exception:
            cur = None
        if cur is not None and (
                cur.schemaString != head.schemaString
                or cur.partitionColumns != head.partitionColumns):
            acts = by_version.setdefault(start, [])
            if not any(isinstance(a, Metadata) for a in acts):
                acts.insert(0, head)
        self._fetch_data(table_dir, resp.files)
        for v in range(start, end + 1):
            acts = by_version.pop(v, None)
            if acts is None:
                acts = [{"commitInfo": {"operation": "SHARED-FILLER"}}]
            self._write_commit(table_dir, v, acts,
                               timestamp_ms=ts_by_version.get(v))


# --------------------------------------------------- spark loaders ----


def _client_for(url: str, response_format: Optional[str] = None
                ) -> tuple[RestClient, "ParsedPath"]:
    parsed = parse_table_path(url)
    profile = DeltaSharingProfile.read_from_file(parsed.profile_file)
    return RestClient(profile, response_format=response_format), parsed


def materialize_snapshot(client: RestClient, parsed,
                         version: Optional[int] = None,
                         timestamp: Optional[str] = None,
                         hints: Optional[str] = None,
                         limit: Optional[int] = None,
                         cache_dir: Optional[str] = None) -> str:
    """Query a table snapshot and materialize it as a local delta
    table; returns the table dir. Shared by load_as_spark and the
    delta_sharing_py batch DataSource reader."""

    def _query(pin_version=version, pin_timestamp=timestamp):
        return client.query_table(
            parsed.share, parsed.schema, parsed.table,
            json_predicate_hints=hints, limit_hint=limit,
            version=pin_version, timestamp=pin_timestamp)

    resp = _query()
    key = "|".join([
        client.profile.endpoint, parsed.share, parsed.schema, parsed.table,
        "snap", str(resp.version), resp.format,
        hashlib.sha1(("\n".join(sorted(wf.id for wf in resp.files))
                      + (hints or "") + str(limit)).encode()).hexdigest(),
    ])
    try:
        return Materializer(cache_dir).snapshot_table(resp, key)
    except urllib.error.HTTPError as e:
        if e.code != 403:
            raise
        # presigned urls expired mid-materialization (long multi-page
        # drains, slow links — the reference refreshes via
        # refreshToken); re-query for fresh urls and retry ONCE,
        # PINNED to the first response's snapshot version so the file
        # set still matches the partially-materialized key (a new
        # commit between the queries must not drift the snapshot).
        # Content-addressing makes the retry cheap: files already
        # landed are not re-downloaded.
        resp = _query(pin_version=resp.version, pin_timestamp=None)
        return Materializer(cache_dir).snapshot_table(resp, key)


ParsedPath = proto.ParsedTablePath


def load_as_spark(spark: SparkSession, url: str, *,
                  version: Optional[int] = None,
                  timestamp: Optional[str] = None,
                  limit: Optional[int] = None,
                  predicate: Optional[str] = None,
                  response_format: Optional[str] = None,
                  use_json_predicate_hints: bool = True,
                  v2_predicate_hints: bool = False,
                  cache_dir: Optional[str] = None) -> DataFrame:
    """Load a shared table as a Spark DataFrame
    (delta-sharing python's load_as_spark; reference connector batch
    path DeltaSharingDataSource.scala:219 createRelation).

    ``predicate`` (a SQL condition) is converted into
    jsonPredicateHints for server-side file skipping — partition
    conjuncts always, data-column conjuncts only under
    ``v2_predicate_hints`` — and is ALSO re-applied to the rows, since
    hints are advisory (DeltaSharingJsonPredicates.scala:41). ``limit``
    is sent as limitHint and re-applied exactly."""
    client, parsed = _client_for(url, response_format)
    hints = None
    if predicate and use_json_predicate_hints:
        meta = client.query_table_metadata(
            parsed.share, parsed.schema, parsed.table,
            version=version, timestamp=timestamp)
        hints = F.hints_from_predicate(
            predicate, meta.spark_schema(), meta.partition_columns(),
            include_data_filters=v2_predicate_hints)
    table_dir = materialize_snapshot(
        client, parsed, version=version, timestamp=timestamp,
        hints=hints, limit=limit, cache_dir=cache_dir)
    log = DeltaLog.for_table(table_dir)
    df = read_snapshot(spark, log.snapshot, predicate=predicate)
    if limit is not None:
        df = df.limit(limit)
    return df


def load_table_changes_as_spark(spark: SparkSession, url: str, *,
                                starting_version: Optional[int] = None,
                                ending_version: Optional[int] = None,
                                starting_timestamp: Optional[str] = None,
                                ending_timestamp: Optional[str] = None,
                                response_format: Optional[str] = None,
                                cache_dir: Optional[str] = None) -> DataFrame:
    """Load a shared table's change data feed
    (delta-sharing python's load_table_changes_as_spark; reference CDF
    path DeltaSharingCDFUtils.scala:40). Returns the standard CDF
    columns (_change_type, _commit_version, _commit_timestamp) computed
    by delta_spark's own CDF reader over the reconstructed log."""
    if starting_version is None and starting_timestamp is None:
        raise DeltaSharingError(
            "provide starting_version or starting_timestamp")
    client, parsed = _client_for(url, response_format)
    resp = client.query_table_changes(
        parsed.share, parsed.schema, parsed.table,
        starting_version=starting_version, ending_version=ending_version,
        starting_timestamp=starting_timestamp,
        ending_timestamp=ending_timestamp,
        include_historical_metadata=True)
    start = int(resp.version if resp.version is not None
                else (starting_version or 0))
    end = max([start] + [int(wf.version) for wf in resp.files
                         if wf.version is not None])
    if ending_version is not None:
        end = max(end, int(ending_version))
    key = "|".join([
        client.profile.endpoint, parsed.share, parsed.schema, parsed.table,
        "changes", str(start), str(end), resp.format,
        hashlib.sha1("\n".join(sorted(
            f"{wf.id}@{wf.version}" for wf in resp.files)).encode())
        .hexdigest(),
    ])
    table_dir = Materializer(cache_dir).changes_table(resp, key, start, end)
    from delta_spark.cdf import table_changes

    log = DeltaLog.for_table(table_dir)
    return table_changes(spark, log, starting_version=start,
                         ending_version=end)


# ------------------------------------------------------ SharingClient ----


class SharingClient:
    """Listing surface of the delta-sharing python connector."""

    def __init__(self, profile):
        if isinstance(profile, str):
            profile = DeltaSharingProfile.read_from_file(profile)
        self._client = RestClient(profile)

    def list_shares(self) -> list[Share]:
        return [Share(name=s["name"]) for s in self._client.list_shares()]

    def list_schemas(self, share: Share) -> list[SchemaRef]:
        name = share.name if isinstance(share, Share) else str(share)
        return [SchemaRef(name=s["name"], share=name)
                for s in self._client.list_schemas(name)]

    def list_tables(self, schema: SchemaRef) -> list[TableRef]:
        return [TableRef(name=t["name"], schema=schema.name,
                         share=schema.share)
                for t in self._client.list_tables(schema.share, schema.name)]

    def list_all_tables(self) -> list[TableRef]:
        out: list[TableRef] = []
        for s in self._client.list_shares():
            for t in self._client.list_all_tables(s["name"]):
                out.append(TableRef(name=t["name"], schema=t["schema"],
                                    share=t["share"]))
        return out
