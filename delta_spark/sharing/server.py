"""A file-backed Delta Sharing server over delta_spark tables.

Implements the public REST protocol (delta-io/delta-sharing
PROTOCOL.md) so any sharing client — including this package's own —
can list shares/schemas/tables and query table data, metadata, version
and change-data-feed over plain HTTP with bearer-token auth:

    GET  {p}/shares                                    (paginated)
    GET  {p}/shares/{share}
    GET  {p}/shares/{share}/schemas                    (paginated)
    GET  {p}/shares/{share}/schemas/{s}/tables         (paginated)
    GET  {p}/shares/{share}/all-tables                 (paginated)
    GET  {p}/.../tables/{t}/version?startingTimestamp=
    GET  {p}/.../tables/{t}/metadata[?version=|timestamp=]
    POST {p}/.../tables/{t}/query
    GET  {p}/.../tables/{t}/changes?startingVersion=...

Design notes (and the 100 TB story):

- The server is a THIN metadata tier: it reads the delta log (driver
  -side, bounded by file count not data size — the same planning work
  any reader does) and never touches row data. Data flows through
  self-contained presigned URLs (HMAC-signed path+expiry tokens served
  by `/files/`), so the data plane is stateless and horizontally
  scalable exactly like S3 presigned URLs in a production server.
- Server-side file skipping evaluates jsonPredicateHints against each
  file's partitionValues and min/max stats (filters.py), and limitHint
  cuts the file list by cumulative numRecords — both best-effort,
  mirroring the reference server the Scala client in
  sharing/.../DeltaSharingFileIndex.scala:100 queries.
- Response-format negotiation follows the capabilities header: the
  first client-accepted format that can represent the table wins;
  tables with reader features (DVs, column mapping...) require the
  ``delta`` format (model.scala:49) and a client advertising the
  needed readerfeatures, else the query fails with a clear 400.
- Engine-native 'q' deletion vectors (our parquet row-index encoding)
  are converted on the fly to protocol roaring blobs spooled under the
  server's scratch dir, so foreign clients only ever see on-protocol
  'p'/'u'/'i' DVs.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import os
import secrets
import tempfile
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, quote, unquote, urlparse

from delta_spark.actions import AddCDCFile, AddFile, Metadata, Protocol, RemoveFile
from delta_spark.log import DeltaLog
from delta_spark.sharing import filters as F
from delta_spark.sharing import protocol as proto
from delta_spark.sharing.protocol import (
    Capabilities,
    RESPONSE_FORMAT_DELTA,
    RESPONSE_FORMAT_PARQUET,
)


@dataclass
class SharingServerConfig:
    """share -> schema -> table-name -> table path, plus auth/expiry."""

    shares: dict = field(default_factory=dict)
    bearer_token: str = field(default_factory=lambda: secrets.token_hex(16))
    host: str = "127.0.0.1"
    port: int = 0  # 0 = ephemeral
    url_expiration_ms: int = 3_600_000
    # url prefix of the API (profile endpoints commonly carry one)
    prefix: str = "/delta-sharing"
    # OAuth client-credentials (shareCredentialsVersion 2 profiles):
    # client_id -> client_secret accepted by POST /oauth/token
    oauth_clients: dict = field(default_factory=dict)
    oauth_token_lifetime_ms: int = 3_600_000

    def add_table(self, share: str, schema: str, name: str, path: str) -> None:
        self.shares.setdefault(share, {}).setdefault(schema, {})[name] = path


class _Http(ThreadingHTTPServer):
    daemon_threads = True
    allow_reuse_address = True


class SharingServer:
    """Lifecycle wrapper: ``with SharingServer(cfg) as s: s.endpoint``."""

    def __init__(self, config: SharingServerConfig):
        self.config = config
        self._signing_key = secrets.token_bytes(32)
        self._spool = tempfile.mkdtemp(prefix="delta_sharing_dv_")
        self._spooled_dvs: dict[str, tuple[str, int, int]] = {}
        self._spool_lock = threading.Lock()
        handler = _make_handler(self)
        self._httpd = _Http((config.host, config.port), handler)
        self._thread: Optional[threading.Thread] = None

    # ------------------------------------------------------ lifecycle ----

    def start(self) -> "SharingServer":
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="delta-sharing-server",
            daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        import shutil

        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread:
            self._thread.join(timeout=10)
        shutil.rmtree(self._spool, ignore_errors=True)

    def __enter__(self) -> "SharingServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    @property
    def port(self) -> int:
        return self._httpd.server_address[1]

    @property
    def endpoint(self) -> str:
        return (f"http://{self.config.host}:{self.port}"
                f"{self.config.prefix}")

    def write_profile(self, path: str,
                      expiration_time: Optional[str] = None) -> str:
        """Write a client profile file for this server; returns path."""
        prof = {
            "shareCredentialsVersion": 1,
            "endpoint": self.endpoint,
            "bearerToken": self.config.bearer_token,
        }
        if expiration_time:
            prof["expirationTime"] = expiration_time
        with open(path, "w", encoding="utf-8") as f:
            json.dump(prof, f)
        return path

    def write_oauth_profile(self, path: str, client_id: str) -> str:
        """Write a shareCredentialsVersion-2 (OAuth client credentials)
        profile for a registered oauth client."""
        prof = {
            "shareCredentialsVersion": 2,
            "type": "oauth_client_credentials",
            "endpoint": self.endpoint,
            "tokenEndpoint": (f"http://{self.config.host}:{self.port}"
                              "/oauth/token"),
            "clientId": client_id,
            "clientSecret": self.config.oauth_clients[client_id],
        }
        with open(path, "w", encoding="utf-8") as f:
            json.dump(prof, f)
        return path

    # ------------------------------------------------------ oauth ----

    def issue_oauth_token(self, client_id: str, client_secret: str) -> dict:
        want = self.config.oauth_clients.get(client_id)
        if want is None or not hmac.compare_digest(want, client_secret):
            raise proto.DeltaSharingError("invalid_client", 401)
        lifetime = self.config.oauth_token_lifetime_ms
        exp = int(time.time() * 1000) + lifetime
        payload = json.dumps({"sub": client_id, "e": exp},
                             separators=(",", ":")).encode()
        tok = base64.urlsafe_b64encode(payload).decode().rstrip("=")
        sig = hmac.new(self._signing_key, payload,
                       hashlib.sha256).hexdigest()[:32]
        return {"access_token": f"{tok}.{sig}",
                "token_type": "bearer",
                "expires_in": lifetime // 1000}

    def check_oauth_token(self, token: str) -> bool:
        try:
            tok, _, sig = token.partition(".")
            payload = base64.urlsafe_b64decode(tok + "=" * (-len(tok) % 4))
            want = hmac.new(self._signing_key, payload,
                            hashlib.sha256).hexdigest()[:32]
            if not hmac.compare_digest(want, sig):
                return False
            d = json.loads(payload)
            return ("sub" in d
                    and int(d["e"]) >= int(time.time() * 1000))
        except Exception:
            return False

    # ------------------------------------------------- presigned urls ----

    def presign(self, abs_path: str, expiry_ms: Optional[int] = None) -> tuple[str, int]:
        """Self-contained presigned URL for an absolute file path:
        base64url({"p","e"}) + "." + hmac prefix. Stateless by design —
        any server replica holding the key can serve it."""
        exp = expiry_ms if expiry_ms is not None else (
            int(time.time() * 1000) + self.config.url_expiration_ms)
        payload = json.dumps({"p": abs_path, "e": exp},
                             separators=(",", ":")).encode()
        token = base64.urlsafe_b64encode(payload).decode().rstrip("=")
        sig = hmac.new(self._signing_key, payload,
                       hashlib.sha256).hexdigest()[:32]
        url = (f"http://{self.config.host}:{self.port}/files/"
               f"{token}.{sig}")
        return url, exp

    def open_presigned(self, token_and_sig: str) -> str:
        """Validate a presigned token; returns the absolute path or
        raises proto.DeltaSharingError (403 expired / 401 forged)."""
        try:
            token, _, sig = token_and_sig.partition(".")
            payload = base64.urlsafe_b64decode(token + "=" * (-len(token) % 4))
            want = hmac.new(self._signing_key, payload,
                            hashlib.sha256).hexdigest()[:32]
            if not hmac.compare_digest(want, sig):
                raise proto.DeltaSharingError("invalid signature", 401)
            d = json.loads(payload)
        except proto.DeltaSharingError:
            raise
        except Exception as e:
            raise proto.DeltaSharingError(f"bad token: {e}", 400) from e
        if int(d["e"]) < int(time.time() * 1000):
            raise proto.DeltaSharingError("presigned url expired", 403)
        return d["p"]

    # ------------------------------------------------------ table look ----

    def resolve_table(self, share: str, schema: str, table: str) -> str:
        try:
            return self.config.shares[share][schema][table]
        except KeyError:
            raise proto.DeltaSharingError(
                f"table '{share}.{schema}.{table}' does not exist, "
                "please contact your share provider for further information",
                404) from None

    # -------------------------------------------------- dv conversion ----

    def portable_dv(self, table_path: str, descriptor: dict
                    ) -> tuple[dict, Optional[str]]:
        """Return (wire descriptor, dv_file_abs_path_or_None).

        'i' inline descriptors pass through (no file). 'u'/'p' on-disk
        descriptors keep their offsets and point at the existing blob
        file. Engine-native 'q' converts once into a protocol roaring
        blob spooled server-side."""
        from delta_spark import dv as DV

        st = descriptor.get("storageType")
        if st == "i":
            return dict(descriptor), None
        if st in ("u", "p"):
            abs_path = DV.absolute_dv_path(table_path, descriptor)
            d = dict(descriptor)
            d["storageType"] = "p"
            # pathOrInlineDv is filled with the presigned URL by the
            # response builder (it needs per-request expiry).
            return d, abs_path
        if st == "q":
            key = json.dumps(descriptor, sort_keys=True)
            with self._spool_lock:
                hit = self._spooled_dvs.get(key)
                if hit is None:
                    rows = DV.descriptor_row_indexes(table_path, descriptor)
                    blob = DV.serialize_rbm_array(rows)
                    fname = os.path.join(
                        self._spool,
                        f"conv_{hashlib.sha1(key.encode()).hexdigest()}.bin")
                    (offset, size, _crc), = DV.write_dv_file(fname, [blob])
                    hit = (fname, offset, size)
                    self._spooled_dvs[key] = hit
            fname, offset, size = hit
            d = {
                "storageType": "p",
                "pathOrInlineDv": "",  # presigned later
                "offset": offset,
                "sizeInBytes": size,
                "cardinality": descriptor.get("cardinality", 0),
            }
            return d, fname
        raise proto.DeltaSharingError(
            f"unsupported deletion vector storageType {st!r}", 500)


# ---------------------------------------------------------- handlers ----


def _paginate(items: list, qs: dict) -> dict:
    max_results = None
    if qs.get("maxResults"):
        max_results = int(qs["maxResults"][0])
        if max_results <= 0:
            # a 0-size page would hand back the same cursor forever
            raise proto.DeltaSharingError(
                "maxResults must be a positive integer", 400)
    start = 0
    if qs.get("pageToken"):
        try:
            start = int(base64.urlsafe_b64decode(
                qs["pageToken"][0].encode()).decode())
        except Exception:
            raise proto.DeltaSharingError("invalid pageToken", 400)
    if max_results is None:
        page, nxt = items[start:], None
    else:
        page = items[start:start + max_results]
        nxt = (base64.urlsafe_b64encode(str(start + max_results).encode())
               .decode() if start + max_results < len(items) else None)
    out = {"items": page}
    if nxt:
        out["nextPageToken"] = nxt
    return out


def _pick_format(caps: Capabilities, needs_delta: bool,
                 table_reader_features: set) -> str:
    """First client-accepted format that can represent the table."""
    for fmt in caps.response_formats:
        if fmt == RESPONSE_FORMAT_PARQUET and not needs_delta:
            return RESPONSE_FORMAT_PARQUET
        if fmt == RESPONSE_FORMAT_DELTA:
            missing = {f for f in table_reader_features
                       if f.lower() not in caps.reader_features}
            if missing:
                raise proto.DeltaSharingError(
                    "table requires reader features the client does not "
                    f"support: {sorted(missing)}; advertise them in the "
                    f"{proto.CAPABILITIES_HEADER} header", 400)
            return RESPONSE_FORMAT_DELTA
    raise proto.DeltaSharingError(
        "table cannot be represented in the requested response format(s) "
        f"{list(caps.response_formats)}: it carries advanced reader "
        "features; request responseformat=delta with matching "
        "readerfeatures", 400)


def _needs_delta_format(snap) -> tuple[bool, set]:
    """Whether the snapshot is representable classically, plus the
    table's reader features (for the client capability check)."""
    p: Protocol = snap.protocol
    feats = set(p.readerFeatures or [])
    if p.minReaderVersion and p.minReaderVersion > 1:
        return True, feats
    return False, feats


class _TableRef:
    def __init__(self, server: SharingServer, share: str, schema: str,
                 name: str):
        self.share, self.schema, self.name = share, schema, name
        self.path = server.resolve_table(share, schema, name)
        self.log = DeltaLog.for_table(self.path)
        if not self.log.table_exists():
            raise proto.DeltaSharingError(
                f"table '{share}.{schema}.{name}' does not exist", 404)


def _make_handler(server: SharingServer):
    prefix = server.config.prefix.rstrip("/")

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        # quiet: BaseHTTPRequestHandler logs every request to stderr
        def log_message(self, fmt, *args):  # noqa: N802
            pass

        # ------------------------------------------------- plumbing ----

        def _send_json(self, obj: dict, status: int = 200,
                       headers: Optional[dict] = None) -> None:
            body = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _send_ndjson(self, lines: list[str], headers: dict) -> None:
            body = ("\n".join(lines) + "\n").encode()
            self.send_response(200)
            self.send_header("Content-Type",
                             "application/x-ndjson; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            for k, v in headers.items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def _error(self, e: Exception) -> None:
            if isinstance(e, proto.DeltaSharingError):
                self._send_json(
                    {"errorCode": str(e.status), "message": str(e)},
                    status=e.status)
            elif isinstance(e, ValueError):
                # engine-level validation (bad version/timestamp) -> 400
                self._send_json(
                    {"errorCode": "400", "message": str(e)}, status=400)
            else:
                self._send_json(
                    {"errorCode": "500", "message": f"{type(e).__name__}: {e}"},
                    status=500)

        def _authed(self) -> bool:
            auth = self.headers.get("Authorization", "")
            want = "Bearer " + server.config.bearer_token
            if hmac.compare_digest(auth, want):
                return True
            if auth.startswith("Bearer ") and server.check_oauth_token(
                    auth[len("Bearer "):]):
                return True
            self._send_json(
                {"errorCode": "401", "message": "unauthorized"},
                status=401)
            return False

        def _caps(self) -> Capabilities:
            return Capabilities.parse(
                self.headers.get(proto.CAPABILITIES_HEADER))

        # --------------------------------------------------- routing ----

        def do_GET(self) -> None:  # noqa: N802
            try:
                url = urlparse(self.path)
                qs = parse_qs(url.query)
                parts = [unquote(p) for p in url.path.split("/") if p]
                if parts and parts[0] == "files":
                    return self._serve_file(parts[1])
                parts = self._strip_prefix(url.path)
                if not self._authed():
                    return
                self._route_get(parts, qs)
            except BrokenPipeError:
                pass
            except Exception as e:  # noqa: BLE001 - becomes HTTP error
                try:
                    self._error(e)
                except BrokenPipeError:
                    pass

        def do_POST(self) -> None:  # noqa: N802
            try:
                url = urlparse(self.path)
                if url.path == "/oauth/token":
                    return self._oauth_token()
                parts = self._strip_prefix(url.path)
                if not self._authed():
                    return
                n = int(self.headers.get("Content-Length", "0") or "0")
                body = json.loads(self.rfile.read(n) or b"{}")
                if (len(parts) == 7 and parts[0] == "shares"
                        and parts[2] == "schemas" and parts[4] == "tables"
                        and parts[6] == "query"):
                    ref = _TableRef(server, parts[1], parts[3], parts[5])
                    return self._query(ref, body)
                raise proto.DeltaSharingError(f"no such endpoint {url.path}", 404)
            except BrokenPipeError:
                pass
            except Exception as e:  # noqa: BLE001
                try:
                    self._error(e)
                except BrokenPipeError:
                    pass

        def _oauth_token(self) -> None:
            """POST /oauth/token — the client-credentials grant
            (RFC 6749 §4.4, form-encoded) backing
            shareCredentialsVersion-2 profiles."""
            n = int(self.headers.get("Content-Length", "0") or "0")
            form = parse_qs(self.rfile.read(n).decode())
            if form.get("grant_type", [""])[0] != "client_credentials":
                raise proto.DeltaSharingError("unsupported_grant_type", 400)
            tok = server.issue_oauth_token(
                form.get("client_id", [""])[0],
                form.get("client_secret", [""])[0])
            self._send_json(tok)

        def _strip_prefix(self, path: str) -> list[str]:
            if prefix and path.startswith(prefix):
                path = path[len(prefix):]
            return [unquote(p) for p in path.split("/") if p]

        def _route_get(self, parts: list[str], qs: dict) -> None:
            cfg = server.config
            if parts == ["shares"]:
                items = [{"name": s} for s in sorted(cfg.shares)]
                return self._send_json(_paginate(items, qs))
            if len(parts) == 2 and parts[0] == "shares":
                if parts[1] not in cfg.shares:
                    raise proto.DeltaSharingError(
                        f"share '{parts[1]}' does not exist", 404)
                return self._send_json({"share": {"name": parts[1]}})
            if len(parts) == 3 and parts[0] == "shares" and parts[2] == "schemas":
                share = self._share(parts[1])
                items = [{"name": s, "share": parts[1]}
                         for s in sorted(share)]
                return self._send_json(_paginate(items, qs))
            if (len(parts) == 5 and parts[0] == "shares"
                    and parts[2] == "schemas" and parts[4] == "tables"):
                share = self._share(parts[1])
                if parts[3] not in share:
                    raise proto.DeltaSharingError(
                        f"schema '{parts[3]}' does not exist", 404)
                items = [{"name": t, "schema": parts[3], "share": parts[1]}
                         for t in sorted(share[parts[3]])]
                return self._send_json(_paginate(items, qs))
            if len(parts) == 3 and parts[0] == "shares" and parts[2] == "all-tables":
                share = self._share(parts[1])
                items = [{"name": t, "schema": sc, "share": parts[1]}
                         for sc in sorted(share)
                         for t in sorted(share[sc])]
                return self._send_json(_paginate(items, qs))
            if (len(parts) == 7 and parts[0] == "shares"
                    and parts[2] == "schemas" and parts[4] == "tables"):
                ref = _TableRef(server, parts[1], parts[3], parts[5])
                tail = parts[6]
                if tail == "version":
                    return self._version(ref, qs)
                if tail == "metadata":
                    return self._metadata(ref, qs)
                if tail == "changes":
                    return self._changes(ref, qs)
            raise proto.DeltaSharingError("no such endpoint", 404)

        def _share(self, name: str) -> dict:
            if name not in server.config.shares:
                raise proto.DeltaSharingError(
                    f"share '{name}' does not exist", 404)
            return server.config.shares[name]

        # ------------------------------------------------ data plane ----

        def _serve_file(self, token: str) -> None:
            abs_path = server.open_presigned(token)
            try:
                size = os.path.getsize(abs_path)
            except OSError:
                raise proto.DeltaSharingError("file not found", 404)
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(size))
            self.end_headers()
            with open(abs_path, "rb") as f:
                while True:
                    chunk = f.read(1 << 20)
                    if not chunk:
                        break
                    self.wfile.write(chunk)

        # ------------------------------------------------- endpoints ----

        def _resolve_version(self, ref: _TableRef, version, timestamp) -> int:
            if version is not None and timestamp is not None:
                raise proto.DeltaSharingError(
                    "please either provide 'version' or 'timestamp'", 400)
            if version is not None:
                v = int(version)
                ref.log.check_version_exists(v)
                return v
            if timestamp is not None:
                try:
                    return ref.log.version_for_time_travel(
                        _parse_ts_ms(timestamp))
                except ValueError as e:
                    raise proto.DeltaSharingError(str(e), 400) from e
            return ref.log.latest_version()

        def _version(self, ref: _TableRef, qs: dict) -> None:
            st = qs.get("startingTimestamp", [None])[0]
            if st is None:
                v = ref.log.latest_version()
            else:
                # earliest version at-or-after the timestamp (streaming
                # start semantics, not time-travel's latest-at-or-before)
                v = _version_at_or_after(ref.log, _parse_ts_ms(st))
            self._send_json({}, headers={proto.TABLE_VERSION_HEADER: str(v)})

        def _metadata(self, ref: _TableRef, qs: dict) -> None:
            v = self._resolve_version(
                ref, qs.get("version", [None])[0],
                qs.get("timestamp", [None])[0])
            snap = ref.log.snapshot_at(v)
            fmt = _pick_format(self._caps(), *_needs_delta_format(snap))
            lines = self._header_lines(snap, v, fmt)
            self._send_ndjson(lines, {
                proto.TABLE_VERSION_HEADER: str(v),
                proto.CAPABILITIES_HEADER: f"responseformat={fmt}",
            })

        def _header_lines(self, snap, version: int, fmt: str) -> list[str]:
            n_files = len(snap.all_files)
            total = sum(f.size for f in snap.all_files)
            if fmt == RESPONSE_FORMAT_PARQUET:
                return [
                    proto.parquet_protocol_line(1),
                    proto.parquet_metadata_line(
                        snap.metadata, version=version, size=total,
                        num_files=n_files),
                ]
            return [
                proto.delta_protocol_line(snap.protocol),
                proto.delta_metadata_line(
                    snap.metadata, version=version, size=total,
                    num_files=n_files),
            ]

        def _query(self, ref: _TableRef, body: dict) -> None:
            if body.get("startingVersion") is not None:
                return self._query_range(ref, body)
            page_token = body.get("pageToken")
            if page_token:
                v, start_idx, prior_records = _decode_page_token(page_token)
                ref.log.check_version_exists(v)
            else:
                v = self._resolve_version(
                    ref, body.get("version"), body.get("timestamp"))
                start_idx, prior_records = 0, 0
            snap = ref.log.snapshot_at(v)
            fmt = _pick_format(self._caps(), *_needs_delta_format(snap))

            tree = None
            hints = body.get("jsonPredicateHints")
            if hints:
                try:
                    tree = F.parse_hints(hints)
                except F.PredicateHintError:
                    tree = None  # advisory: degrade to no skipping
            # legacy predicateHints: SQL condition strings over
            # partition columns (PROTOCOL.md "SQL Expressions for
            # Filtering") — evaluated through the engine's own
            # data-skipping entry point, sound fallback to no skipping
            sql_keep: Optional[set] = None
            sql_hints = body.get("predicateHints")
            if sql_hints:
                try:
                    cond = " AND ".join(f"({h})" for h in sql_hints)
                    sql_keep = {f.path
                                for f in snap.files_for_scan(cond)}
                except Exception:
                    sql_keep = None  # advisory
            limit = body.get("limitHint")
            max_files = body.get("maxFiles")
            max_files = int(max_files) if max_files is not None else None
            if max_files is not None and max_files <= 0:
                raise proto.DeltaSharingError(
                    "maxFiles must be a positive integer", 400)

            # hints carry LOGICAL column names; under column mapping the
            # file's partitionValues / stats keys are PHYSICAL — only
            # the server knows the mapping, so translate before eval
            # (a name miss would silently disable skipping, never
            # wrongness, but the whole point of the hint is the skip)
            p2l = {}
            if snap.column_mapping_enabled:
                p2l = {p: l for l, p in snap.physical_map().items()}

            def _logical(d: Optional[dict]) -> Optional[dict]:
                if not p2l or not d:
                    return d
                return {p2l.get(k, k): v for k, v in d.items()}

            def _logical_stats(f: AddFile) -> Optional[dict]:
                st = f.parsed_stats
                if not p2l or not st:
                    return st
                return {k: (_logical(v) if isinstance(v, dict) else v)
                        for k, v in st.items()}

            # deterministic order so page tokens (indexes into the
            # surviving list) stay stable across page requests
            survivors = [f for f in sorted(snap.all_files,
                                           key=lambda f: f.path)
                         if F.file_survives(tree, _logical(f.partitionValues),
                                            _logical_stats(f))
                         and (sql_keep is None or f.path in sql_keep)]
            files = []
            seen_records = prior_records
            next_token = None
            for idx in range(start_idx, len(survivors)):
                if limit is not None and seen_records >= int(limit):
                    break
                f = survivors[idx]
                files.append(f)
                if limit is not None:
                    n = f.num_records
                    seen_records += n if n is not None else int(limit)
                    if seen_records >= int(limit):
                        break
                if max_files is not None and len(files) >= max_files:
                    if idx + 1 < len(survivors):
                        next_token = _encode_page_token(v, idx + 1,
                                                        seen_records)
                    break

            lines = self._header_lines(snap, v, fmt)
            for f in files:
                lines.append(self._file_line(ref, f, fmt))
            if next_token:
                # EndStreamAction (delta-sharing PROTOCOL.md paginated
                # queries): the last NDJSON line carries the cursor
                lines.append(json.dumps(
                    {"endStreamAction": {"nextPageToken": next_token}}))
            self._send_ndjson(lines, {
                proto.TABLE_VERSION_HEADER: str(v),
                proto.CAPABILITIES_HEADER: f"responseformat={fmt}",
            })

        def _file_line(self, ref: _TableRef, f: AddFile, fmt: str,
                       version: Optional[int] = None,
                       timestamp: Optional[int] = None) -> str:
            abs_path = _abs_file_path(ref.path, f.path)
            url, exp = server.presign(abs_path)
            fid = _file_id(ref.path, f.path)
            if fmt == RESPONSE_FORMAT_PARQUET:
                return proto.parquet_file_line(
                    url, fid, f.partitionValues, f.size, stats=f.stats,
                    version=version, timestamp=timestamp,
                    expiration_timestamp=exp)
            action = f.to_json()["add"]
            action["path"] = url
            dv_fid = None
            if f.deletionVector is not None:
                desc, dv_path = server.portable_dv(ref.path, f.deletionVector)
                if dv_path is not None:
                    dv_url, _ = server.presign(dv_path)
                    desc["pathOrInlineDv"] = dv_url
                    dv_fid = _file_id(ref.path, dv_path)
                action["deletionVector"] = desc
            return proto.delta_file_line(
                fid, {"add": action}, version=version, timestamp=timestamp,
                expiration_timestamp=exp, deletion_vector_file_id=dv_fid)

        def _query_range(self, ref: _TableRef, body: dict) -> None:
            start = int(body["startingVersion"])
            end = (int(body["endingVersion"])
                   if body.get("endingVersion") is not None
                   else ref.log.latest_version())
            ref.log.check_version_exists(start)
            snap = ref.log.snapshot_at(start)
            lines, fmt = self._emit_commit_range(
                ref, snap, start, end, cdf=False,
                include_historical_metadata=True)
            self._send_ndjson(lines, {
                proto.TABLE_VERSION_HEADER: str(start),
                proto.CAPABILITIES_HEADER: f"responseformat={fmt}",
            })

        def _changes(self, ref: _TableRef, qs: dict) -> None:
            def _one(name):
                return qs.get(name, [None])[0]

            sv, ev = _one("startingVersion"), _one("endingVersion")
            st, et = _one("startingTimestamp"), _one("endingTimestamp")
            if sv is None and st is None:
                raise proto.DeltaSharingError(
                    "provide startingVersion or startingTimestamp", 400)
            if sv is not None:
                start = int(sv)
            else:
                start = _version_at_or_after(ref.log, _parse_ts_ms(st))
            if ev is not None:
                end = int(ev)
            elif et is not None:
                end = ref.log.version_for_time_travel(_parse_ts_ms(et))
            else:
                end = ref.log.latest_version()
            if start > end:
                raise proto.DeltaSharingError(
                    f"startingVersion({start}) must not be after "
                    f"endingVersion({end})", 400)
            ref.log.check_version_exists(start)
            snap = ref.log.snapshot_at(start)
            cfg = snap.metadata.configuration if snap.metadata else {}
            if str(cfg.get("delta.enableChangeDataFeed", "")).lower() != "true":
                raise proto.DeltaSharingError(
                    "cdf is not enabled on table "
                    f"{ref.share}.{ref.schema}.{ref.name}", 400)
            inc_meta = (str(_one("includeHistoricalMetadata") or "")
                        .lower() == "true")
            lines, fmt = self._emit_commit_range(
                ref, snap, start, end, cdf=True,
                include_historical_metadata=inc_meta)
            self._send_ndjson(lines, {
                proto.TABLE_VERSION_HEADER: str(start),
                proto.CAPABILITIES_HEADER: f"responseformat={fmt}",
            })

        def _emit_commit_range(self, ref: _TableRef, start_snap, start: int,
                               end: int, cdf: bool,
                               include_historical_metadata: bool
                               ) -> tuple[list[str], str]:
            """Shared emitter for version-range queries and CDF changes;
            returns (lines, negotiated format).

            The response format is negotiated against the WHOLE range,
            not just the start snapshot: a mid-range protocol upgrade
            (say, deletion vectors enabled after `start`) makes commits
            the classic format cannot carry — a parquet emission would
            silently drop the DV and resurrect deleted rows — so any
            DV-carrying action or delta-requiring protocol in the range
            forces the delta format (or a clear 400 for a parquet-only
            client).

            Per commit: CDF mode uses ONLY the commit's cdc actions when
            any exist, else its dataChange add/removes — the same
            file-level selection CDCReader performs. Range (streaming)
            mode emits every file action."""
            commits = []
            needs_delta, feats = _needs_delta_format(start_snap)
            for v in range(start, end + 1):
                ts = ref.log._commit_timestamp(v)
                try:
                    actions = ref.log.read_commit_actions(v)
                except OSError as e:
                    raise proto.DeltaSharingError(
                        f"version {v} is not available: {e}", 400) from e
                commits.append((v, ts, actions))
                for k, a in actions:
                    if k in ("add", "remove") and getattr(
                            a, "deletionVector", None) is not None:
                        needs_delta = True
                    elif k == "protocol":
                        rng_feats = set(a.readerFeatures or [])
                        if (a.minReaderVersion or 1) > 1:
                            needs_delta = True
                        feats = feats | rng_feats
            fmt = _pick_format(self._caps(), needs_delta, feats)

            lines = self._header_lines(start_snap, start, fmt)
            for v, ts, actions in commits:
                adds = [a for k, a in actions if k == "add"]
                removes = [a for k, a in actions if k == "remove"]
                cdcs = [a for k, a in actions if k == "cdc"]
                metas = [a for k, a in actions if k == "metaData"]
                protos = [a for k, a in actions if k == "protocol"]
                if include_historical_metadata and v > start:
                    for m in metas:
                        lines.append(
                            proto.delta_metadata_line(m, version=v)
                            if fmt == RESPONSE_FORMAT_DELTA
                            else proto.parquet_metadata_line(m, version=v))
                    if fmt == RESPONSE_FORMAT_DELTA:
                        for p in protos:
                            lines.append(proto.delta_protocol_line(p, version=v))
                if cdf and cdcs:
                    emit_adds, emit_removes, emit_cdcs = [], [], cdcs
                elif cdf:
                    emit_adds = [a for a in adds if a.dataChange]
                    emit_removes = [r for r in removes if r.dataChange]
                    emit_cdcs = []
                else:
                    emit_adds, emit_removes, emit_cdcs = adds, removes, cdcs
                for a in emit_adds:
                    lines.append(self._change_line(ref, "add", a, fmt, v, ts))
                for c in emit_cdcs:
                    lines.append(self._change_line(ref, "cdf", c, fmt, v, ts))
                for r in emit_removes:
                    lines.append(self._change_line(ref, "remove", r, fmt, v, ts))
            return lines, fmt

        def _change_line(self, ref: _TableRef, kind: str, action, fmt: str,
                         version: int, timestamp: int) -> str:
            if kind == "add" and fmt != RESPONSE_FORMAT_PARQUET:
                return self._file_line(ref, action, fmt, version, timestamp)
            abs_path = _abs_file_path(ref.path, action.path)
            url, exp = server.presign(abs_path)
            fid = _file_id(ref.path, action.path)
            if fmt == RESPONSE_FORMAT_PARQUET:
                size = action.size or 0
                pv = getattr(action, "partitionValues", None) or {}
                stats = getattr(action, "stats", None)
                return proto.parquet_change_line(
                    kind, url, fid, pv, size, version, timestamp,
                    stats=stats, expiration_timestamp=exp)
            single = action.to_json()
            inner = next(iter(single.values()))
            inner["path"] = url
            if kind == "remove" and inner.get("size") is None:
                try:
                    inner["size"] = os.path.getsize(abs_path)
                except OSError:
                    inner["size"] = 0
            return proto.delta_file_line(
                fid, single, version=version, timestamp=timestamp,
                expiration_timestamp=exp)

    return Handler


# ------------------------------------------------------------ helpers ----


def _encode_page_token(version: int, idx: int, records: int = 0) -> str:
    """Opaque query-pagination cursor: pins the snapshot VERSION so
    later pages read the same table state the first page did, the index
    into the deterministic surviving-file order, and the cumulative
    limitHint records already served (so the hint bounds the whole
    query, not each page)."""
    payload = json.dumps({"v": version, "i": idx, "r": records},
                         separators=(",", ":")).encode()
    return base64.urlsafe_b64encode(payload).decode().rstrip("=")


def _decode_page_token(token: str) -> tuple[int, int, int]:
    try:
        d = json.loads(base64.urlsafe_b64decode(
            token + "=" * (-len(token) % 4)))
        return int(d["v"]), int(d["i"]), int(d.get("r", 0))
    except Exception as e:
        raise proto.DeltaSharingError(f"invalid pageToken: {e}", 400) from e


def _abs_file_path(table_path: str, rel_or_abs: str) -> str:
    p = unquote(rel_or_abs)
    if p.startswith("file:") or "://" in rel_or_abs:
        parsed = urlparse(p)
        return unquote(parsed.path) if parsed.scheme else p
    if os.path.isabs(p):
        return p
    return os.path.join(table_path, p)


def _file_id(table_path: str, path: str) -> str:
    return hashlib.sha1(f"{table_path}|{path}".encode()).hexdigest()


def _version_at_or_after(log: DeltaLog, ts_millis: int) -> int:
    for cv, cts in log._monotonic_commit_timestamps():
        if cts >= ts_millis:
            return cv
    raise proto.DeltaSharingError(
        f"the provided timestamp ({ts_millis} ms) is after the latest "
        "commit of the table", 400)


def _parse_ts_ms(raw: str) -> int:
    """Accept epoch-millis or ISO-8601 timestamps."""
    s = str(raw).strip()
    if s.isdigit():
        return int(s)
    import datetime as _dt

    s2 = s.replace("T", " ").replace("Z", "+00:00")
    ts = _dt.datetime.fromisoformat(s2)
    # naive timestamps are interpreted in server-local time, the same
    # convention the engine's own TIMESTAMP AS OF resolution uses
    return int(ts.timestamp() * 1000)
