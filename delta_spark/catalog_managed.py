"""Catalog-managed tables: the catalog, not the filesystem, is the
source of truth for commits (PROTOCOL.md "Catalog-Managed Tables",
`catalogManaged` reader+writer table feature; reference
spark/src/main/scala/org/apache/spark/sql/delta/coordinatedcommits/
CatalogOwnedTableUtils.scala and PROTOCOL.md:1165-1434).

Protocol rules implemented here:

- **Commit protocol** (PROTOCOL.md:1282): writers stage the commit
  payload under ``_delta_log/_staged_commits/<v>.<uuid>.json`` (or hand
  the content to the catalog as an *inline commit*) and the catalog
  RATIFIES it atomically: version ``v`` is ratified at most once, and
  only after ``v-1`` (in-order).
- **Reading** (PROTOCOL.md:1260): readers must ask the catalog for its
  ratified commits first. The catalog's latest ratified version is
  AUTHORITATIVE — any published ``<v>.json`` beyond it is ignored, and
  for versions the catalog returns, the catalog's copy wins over a
  published file of the same version.
- **Publishing** (PROTOCOL.md:1340): ratified commits are copied
  in-order to classic ``_delta_log/<v>.json`` so plain maintenance
  (checkpoints, compaction) and external listings keep working.
  Publishing never un-ratifies: the catalog keeps its watermark.
- **Writer requirements** (PROTOCOL.md:1395): in-commit timestamps must
  be active (enforced at the transaction seam — enabling
  ``catalogManaged`` force-sets ``delta.enableInCommitTimestamps``),
  ``commitInfo.txnId`` must be present (always written by our
  CommitInfo), and writers must not do filesystem put-if-absent
  commits (transaction routes through :func:`ratify`).
- **Maintenance gating** (PROTOCOL.md:1352): checkpoints, log
  compaction and version checksums are always allowed but only over the
  PUBLISHED prefix; everything else (VACUUM, OPTIMIZE, REORG, metadata
  cleanup) is refused unless the managing catalog grants it
  (``delta_spark.catalogManaged.allowMaintenanceOps=true`` models the
  catalog's permission).

Two catalog clients (selected by the table property
``delta_spark.catalogManaged.catalog``):

- ``filesystem`` — durable, cross-process: ratification is atomic
  creation of ``_delta_log/_catalog_commits/<v>.json`` (the catalog's
  own storage; NOT part of the Delta log protocol surface) holding
  either a staged-file pointer or the inline commit content, plus a
  ``_latest`` watermark that survives publishing.
- ``in-memory`` — process-wide, models a catalog *server*; supports
  inline commits whose content only the catalog holds.
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass
from typing import Optional, Union

CATALOG_PROP = "delta_spark.catalogManaged.catalog"
AUTO_PUBLISH_PROP = "delta_spark.catalogManaged.autoPublish"
ALLOW_MAINTENANCE_PROP = "delta_spark.catalogManaged.allowMaintenanceOps"
# inline commits (PROTOCOL.md:1295 option 2): the commit content is
# handed to the catalog directly — no staged file is ever written
INLINE_PROP = "delta_spark.catalogManaged.inlineCommits"
FEATURE = "catalogManaged"
STATE_DIR = "_catalog_commits"  # filesystem catalog's private storage
STAGED_DIR = "_staged_commits"


class CatalogCommitConflict(Exception):
    """Version already ratified, or ratified out of order (retryable)."""


@dataclass
class RatifiedCommit:
    version: int
    timestamp: int
    # staged/published file path, or the inline commit content
    file_path: Optional[str] = None
    inline: Optional[str] = None


class CatalogManagedClient:
    """Client-side catalog component (PROTOCOL.md "Catalog Client").

    The Delta client defines this API (PROTOCOL.md:1171); the catalog
    implements atomic in-order ratification and serves the ratified
    tail + authoritative latest version back to readers."""

    def ratify(self, log_path: str, version: int, timestamp: int,
               staged_path: Optional[str] = None,
               inline: Optional[str] = None) -> RatifiedCommit:
        raise NotImplementedError

    def ratified(self, log_path: str) -> tuple[int, dict[int, RatifiedCommit]]:
        """(latest ratified version — authoritative, -1 if the catalog
        has no state for this table; unpublished ratified commits)."""
        raise NotImplementedError

    def mark_published(self, log_path: str, version: int) -> None:
        """Commits <= version are published; the catalog may stop
        serving their content (the watermark is kept forever)."""
        raise NotImplementedError

    def drop_table(self, log_path: str) -> None:
        """Forget all state for the table (the catalog-side half of
        DROP TABLE). Required before reusing the path for a NEW table:
        a stale latest-ratified watermark would otherwise act as a
        ceiling on the new table's versions. The filesystem catalog's
        state lives inside `_delta_log` and dies with the table; this
        matters for server-style catalogs (in-memory)."""
        raise NotImplementedError


class InMemoryCatalog(CatalogManagedClient):
    """Process-wide catalog modeling a catalog server: ratified commit
    content (staged pointers or inline payloads) lives in catalog
    memory until published."""

    def __init__(self):
        self._lock = threading.Lock()
        self._commits: dict[str, dict[int, RatifiedCommit]] = {}
        self._latest: dict[str, int] = {}

    def ratify(self, log_path, version, timestamp, staged_path=None,
               inline=None):
        with self._lock:
            latest = self._latest.get(log_path, -1)
            if version <= latest:
                raise CatalogCommitConflict(
                    f"version {version} already ratified (latest {latest})")
            # latest == -1 means no state: the catalog ADOPTS the table
            # at whatever version the upgrade commit lands (enabling
            # catalogManaged on an existing filesystem table); with
            # state, ratification is strictly in-order
            if latest >= 0 and version != latest + 1:
                raise CatalogCommitConflict(
                    f"cannot ratify {version}: {latest + 1} not ratified yet")
            c = RatifiedCommit(version, timestamp, staged_path, inline)
            self._commits.setdefault(log_path, {})[version] = c
            self._latest[log_path] = version
            return c

    def ratified(self, log_path):
        with self._lock:
            return (self._latest.get(log_path, -1),
                    dict(self._commits.get(log_path, {})))

    def mark_published(self, log_path, version):
        with self._lock:
            table = self._commits.get(log_path, {})
            for v in [v for v in table if v <= version]:
                del table[v]

    def drop_table(self, log_path):
        with self._lock:
            self._commits.pop(log_path, None)
            self._latest.pop(log_path, None)


class FileSystemCatalog(CatalogManagedClient):
    """Durable cross-process catalog: per-version ratification records
    under ``_delta_log/_catalog_commits/`` (put-if-absent = the atomic
    ratify), and a ``_latest`` watermark replaced atomically. The
    watermark outlives publishing, so the "ignore published versions
    beyond the latest ratified" reader rule stays enforceable."""

    def _dir(self, log_path: str) -> str:
        return os.path.join(log_path, STATE_DIR)

    def _record(self, log_path: str, version: int) -> str:
        return os.path.join(self._dir(log_path), "%020d.json" % version)

    def _watermark_path(self, log_path: str) -> str:
        return os.path.join(self._dir(log_path), "_latest")

    def _watermark(self, log_path: str) -> int:
        try:
            with open(self._watermark_path(log_path)) as f:
                return int(f.read().strip() or -1)
        except (OSError, ValueError):
            return -1

    def _record_versions(self, log_path: str) -> list[int]:
        try:
            names = os.listdir(self._dir(log_path))
        except FileNotFoundError:
            return []
        return sorted(int(n.split(".")[0]) for n in names
                      if n.endswith(".json") and n[0].isdigit())

    def latest(self, log_path: str) -> int:
        # a crash between record-create and watermark-replace leaves the
        # watermark one behind — the record is still the ratification
        versions = self._record_versions(log_path)
        return max(self._watermark(log_path),
                   versions[-1] if versions else -1)

    def ratify(self, log_path, version, timestamp, staged_path=None,
               inline=None):
        from delta_spark.log import (ConcurrentModificationException,
                                     LocalLogStore)

        latest = self.latest(log_path)
        if version <= latest:
            raise CatalogCommitConflict(
                f"version {version} already ratified (latest {latest})")
        # no state → adoption of an existing table at its upgrade
        # commit; with state, strictly in-order (see InMemoryCatalog)
        if latest >= 0 and version != latest + 1:
            raise CatalogCommitConflict(
                f"cannot ratify {version}: {latest + 1} not ratified yet")
        rec = {"timestamp": timestamp}
        if inline is not None:
            rec["inline"] = inline
        else:
            rec["stagedFile"] = os.path.basename(staged_path)
        try:
            LocalLogStore().write_atomic(self._record(log_path, version),
                                         json.dumps(rec))
        except ConcurrentModificationException as e:
            raise CatalogCommitConflict(str(e))
        # TOCTOU guard (found by the r10 full-suite race): the latest()
        # pre-check above can race a concurrent publisher's
        # mark_published record GC — this writer reads latest()=v-1,
        # the true winner of v ratifies+publishes+GCs its record, and
        # THEN our put-if-absent lands on the RESURRECTED slot, forking
        # v with different content. Discriminator: record GC only ever
        # happens after v is published to _delta_log/<v>.json (and
        # writers never put-if-absent classic files on a managed
        # table), so a published v with content != our payload proves
        # the slot is a ghost — withdraw and conflict. A successor
        # ratifying v+1 concurrently does NOT trip this (it publishes
        # nothing for v), so a legitimate ratification never withdraws.
        published = os.path.join(log_path, "%020d.json" % version)
        try:
            existing = open(published).read()
        except OSError:
            existing = None
        if existing is not None and existing != (
                inline if inline is not None else open(staged_path).read()):
            try:
                os.unlink(self._record(log_path, version))
            except OSError:
                pass
            raise CatalogCommitConflict(
                f"version {version} was already ratified and published "
                "(record reclaimed); refusing to re-ratify")
        # watermark advance is best-effort (latest() covers the gap)
        tmp = self._watermark_path(log_path) + ".tmp.%d" % os.getpid()
        try:
            with open(tmp, "w") as f:
                f.write(str(version))
            os.replace(tmp, self._watermark_path(log_path))
        except OSError:
            pass
        return RatifiedCommit(version, timestamp, staged_path, inline)

    def ratified(self, log_path):
        out: dict[int, RatifiedCommit] = {}
        d = self._dir(log_path)
        for v in self._record_versions(log_path):
            try:
                with open(os.path.join(d, "%020d.json" % v)) as f:
                    rec = json.load(f)
            except (OSError, ValueError):
                continue
            staged = (os.path.join(log_path, STAGED_DIR, rec["stagedFile"])
                      if "stagedFile" in rec else None)
            out[v] = RatifiedCommit(v, int(rec.get("timestamp", 0)),
                                    staged, rec.get("inline"))
        return self.latest(log_path), out

    def mark_published(self, log_path, version):
        # persist the watermark BEFORE unlinking records: ratify's
        # watermark advance is best-effort, so without this a crash
        # window could leave latest() covered only by a record we are
        # about to delete — the ceiling would regress and a published
        # version could be re-ratified with different content
        if self._watermark(log_path) < version:
            tmp = self._watermark_path(log_path) + ".tmp.%d" % os.getpid()
            try:
                os.makedirs(self._dir(log_path), exist_ok=True)
                with open(tmp, "w") as f:
                    f.write(str(version))
                os.replace(tmp, self._watermark_path(log_path))
            except OSError:
                return  # keep the records; publishing can retry later
        d = self._dir(log_path)
        for v in self._record_versions(log_path):
            if v <= version:
                try:
                    os.unlink(os.path.join(d, "%020d.json" % v))
                except OSError:
                    pass


    def drop_table(self, log_path):
        import shutil

        shutil.rmtree(self._dir(log_path), ignore_errors=True)


_IN_MEMORY = InMemoryCatalog()
CATALOGS: dict[str, CatalogManagedClient] = {
    "in-memory": _IN_MEMORY,
    "filesystem": FileSystemCatalog(),
}


def client_for(configuration: Optional[dict]) -> Optional[CatalogManagedClient]:
    name = (configuration or {}).get(CATALOG_PROP)
    if not name:
        return None
    try:
        return CATALOGS[str(name)]
    except KeyError:
        raise ValueError(f"unknown managing catalog {name!r}; "
                         f"known: {sorted(CATALOGS)}")


def is_catalog_managed(configuration: Optional[dict],
                       protocol=None) -> bool:
    if protocol is not None and FEATURE in (
            (protocol.readerFeatures or []) if protocol else []):
        return True
    return bool((configuration or {}).get(CATALOG_PROP))


def auto_publish(configuration: Optional[dict]) -> bool:
    return str((configuration or {}).get(
        AUTO_PUBLISH_PROP, "true")).lower() != "false"


def check_maintenance_allowed(configuration: Optional[dict],
                              protocol, operation: str) -> None:
    """Maintenance gate (PROTOCOL.md:1352): on a catalog-managed table,
    data/metadata maintenance (VACUUM, OPTIMIZE, REORG, log cleanup) is
    prohibited unless the managing catalog explicitly permits it.
    Checkpoints / log compaction / checksums are exempt (callers don't
    route them here)."""
    if not is_catalog_managed(configuration, protocol):
        return
    if str((configuration or {}).get(
            ALLOW_MAINTENANCE_PROP, "false")).lower() == "true":
        return
    raise PermissionError(
        f"{operation} is not allowed on a catalog-managed table unless "
        f"the managing catalog permits it (PROTOCOL.md catalog-managed "
        f"maintenance rules). Set {ALLOW_MAINTENANCE_PROP}=true in the "
        f"table properties if this client is allowed to run maintenance.")


def publish(log, catalog: CatalogManagedClient,
            upto: Optional[int] = None) -> int:
    """Publish ratified commits in-order to ``_delta_log/<v>.json``
    (PROTOCOL.md:1340 — v-1 before v; content is immutable so racing
    publishers are harmless). Returns the number of files written."""
    from delta_spark.log import ConcurrentModificationException

    _, commits = catalog.ratified(log.log_path)
    written = 0
    highest = None
    for v in sorted(commits):
        if upto is not None and v > upto:
            break
        c = commits[v]
        target = log.commit_file(v)
        try:
            payload = (c.inline if c.inline is not None
                       else open(c.file_path).read())
        except OSError:
            # Staged file unreadable. If the target is ALREADY in
            # _delta_log this version is published (the catalog may
            # retain ratified entries after staged files are cleaned
            # up) — skip the divergence comparison and keep advancing,
            # or mark_published would stall here forever. Only an
            # UNPUBLISHED version with an unreadable payload stops the
            # in-order loop.
            if os.path.exists(target):
                highest = v
                continue
            break
        if not os.path.exists(target):
            try:
                log.store.write_atomic(target, payload)
                written += 1
            except ConcurrentModificationException:
                pass  # someone else published it — fine, content is immutable
        else:
            # A <v>.json already on the filesystem must BE the ratified
            # content — anything else is a forked log (e.g. an orphaned
            # put-if-absent commit that bypassed the catalog). Verify
            # instead of silently skipping: mark_published below would
            # otherwise delete the authoritative copy and let the
            # divergent file win.
            try:
                existing = open(target).read()
            except OSError:
                existing = None
            if existing is not None and existing != payload:
                # Transient ghost window: a racing writer that landed on
                # a GC-resurrected record slot withdraws it on its own
                # post-check (FileSystemCatalog.ratify TOCTOU guard)
                # microseconds later — re-read the catalog a few times,
                # and only a record that is STILL ratified with
                # readable, different content is a genuine fork. An
                # unreadable record payload is NOT treated as a
                # withdrawal (tolerating it would let mark_published
                # cement the divergent published file).
                import time as _time

                resolved = False
                for attempt in range(3):
                    _, recheck = catalog.ratified(log.log_path)
                    cur = recheck.get(v)
                    if cur is None:
                        resolved = True  # ghost withdrawn
                        break
                    try:
                        cur_payload = (cur.inline if cur.inline is not None
                                       else open(cur.file_path).read())
                    except OSError:
                        cur_payload = None
                    if cur_payload == existing:
                        resolved = True  # re-ratified identical content
                        break
                    _time.sleep(0.02)
                if resolved:
                    highest = v
                    continue
                raise RuntimeError(
                    f"catalog-managed log divergence at version {v}: "
                    f"{target} exists with content different from the "
                    f"catalog-ratified commit; refusing to publish past "
                    f"it")
        highest = v
    if highest is not None:
        catalog.mark_published(log.log_path, highest)
    return written
