"""Coordinated commits: a commit coordinator owns the unbackfilled
tail of the log instead of filesystem put-if-absent.

Parity target (behavior, not code): the reference's coordinated-commits
preview — ``CommitCoordinatorClient`` (spark
``coordinatedcommits/CommitCoordinatorClient.scala``) with an
in-memory implementation (``InMemoryCommitCoordinator``) used by its
test suites. Flow (TableCommitCoordinatorClient.commit):

1. the writer stages the commit payload under
   ``_delta_log/_staged_commits/<version>.<uuid>.json`` (never racy —
   uuid-unique),
2. registers ``(version → staged file)`` with the coordinator, which
   *linearizes* writers: exactly one registration per version wins,
   the rest get a retryable conflict,
3. the winner backfills the staged content into the classic
   ``<version>.json`` so plain readers and checkpointing keep working.

Readers merge the coordinator's unbackfilled tail on top of the
backfilled listing (``DeltaLog.update`` does the merge), so a commit is
visible the moment registration succeeds — even if the writer crashed
before backfilling (the crash window a pure-listing reader would miss).

Opt-in via table property
``delta.coordinatedCommits.commitCoordinator-preview`` = a name in
:data:`COORDINATORS` (``in-memory`` — process-wide singleton, or
``filesystem`` — registration through atomic marker files in
``_delta_log/_commits/``, durable across processes).
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass
from typing import Optional

COORDINATOR_PROP = "delta.coordinatedCommits.commitCoordinator-preview"
BATCH_SIZE_PROP = "delta.coordinatedCommits.batchSize-preview"
# per-coordinator JSON conf (DeltaConfig.scala:959
# COORDINATED_COMMITS_COORDINATOR_CONF); the 'external' coordinator
# reads its file-backed table location from it: {"externalRoot": path}
COORDINATOR_CONF_PROP = "delta.coordinatedCommits.commitCoordinatorConf-preview"
STAGED_DIR = "_staged_commits"
MARKER_DIR = "_commits"


@dataclass
class Commit:
    version: int
    file_path: str  # absolute path of the file holding the commit's actions
    timestamp: int


class CommitConflictException(Exception):
    """Another writer registered this version first (retryable)."""


class CommitCoordinatorClient:
    """Interface: linearized registration + tail discovery."""

    def commit(self, log_path: str, version: int, staged_path: str,
               timestamp: int) -> Commit:
        raise NotImplementedError

    def get_commits(self, log_path: str, start_version: int = 0) -> list[Commit]:
        """Registered commits >= start_version that may not be
        backfilled yet, ascending."""
        raise NotImplementedError

    def register_backfill(self, log_path: str, version: int) -> None:
        """All commits <= ``version`` are now backfilled — the
        coordinator may drop them from its tracked tail (reference
        ``registerBackfill`` callback; keeps coordinator state bounded
        by the unbackfilled window, not table history)."""
        raise NotImplementedError


class InMemoryCommitCoordinator(CommitCoordinatorClient):
    """Process-wide coordinator (reference InMemoryCommitCoordinator):
    a lock-guarded per-table map. Models an external coordination
    service for single-process / test use."""

    def __init__(self):
        self._lock = threading.Lock()
        self._tables: dict[str, dict[int, Commit]] = {}
        self._backfilled: dict[str, int] = {}

    def commit(self, log_path, version, staged_path, timestamp):
        with self._lock:
            table = self._tables.setdefault(log_path, {})
            if version in table or version <= self._backfilled.get(log_path, -1):
                raise CommitConflictException(f"version {version} already committed")
            c = Commit(version, staged_path, timestamp)
            table[version] = c
            return c

    def get_commits(self, log_path, start_version=0):
        with self._lock:
            table = self._tables.get(log_path, {})
            return [table[v] for v in sorted(table) if v >= start_version]

    def register_backfill(self, log_path, version):
        with self._lock:
            table = self._tables.get(log_path, {})
            for v in [v for v in table if v <= version]:
                del table[v]
            # watermark: versions <= this can never be registered again
            # (without it, draining the tail would let a lagging writer
            # reuse an already-backfilled version number)
            self._backfilled[log_path] = max(
                self._backfilled.get(log_path, -1), version)


class FileSystemCommitCoordinator(CommitCoordinatorClient):
    """Durable coordinator for multi-process single-filesystem use:
    registration = atomic creation of ``_delta_log/_commits/<v>.json``
    (same put-if-absent primitive the classic path uses, but the
    marker is tiny and fixed-size — the coordinator, not LIST of the
    whole log, serves the tail)."""

    def _marker(self, log_path: str, version: int) -> str:
        return os.path.join(log_path, MARKER_DIR, "%020d.json" % version)

    def commit(self, log_path, version, staged_path, timestamp):
        from delta_spark.log import ConcurrentModificationException, LocalLogStore

        # a version whose classic file already exists was backfilled
        # (its marker is gone) — registration must still conflict
        if os.path.exists(os.path.join(log_path, "%020d.json" % version)):
            raise CommitConflictException(
                f"version {version} already backfilled")
        payload = json.dumps({"stagedFile": os.path.basename(staged_path),
                              "timestamp": timestamp})
        try:
            LocalLogStore().write_atomic(self._marker(log_path, version), payload)
        except ConcurrentModificationException as e:
            raise CommitConflictException(str(e))
        # TOCTOU guard (same hole class as FileSystemCatalog.ratify,
        # r10): between the already-backfilled pre-check above and the
        # marker put-if-absent, the true winner of this version can
        # register, backfill <v>.json, and have register_backfill
        # RECLAIM its marker — our put-if-absent then lands on the
        # resurrected slot and the commit would be acknowledged without
        # ever reaching the log (silent lost write). The classic file
        # is the discriminator: if it exists with content other than
        # our staged payload, withdraw the ghost marker and conflict
        # (retryable — the writer rebases like any commit race loser).
        classic = os.path.join(log_path, "%020d.json" % version)
        if os.path.exists(classic):
            try:
                ours = open(staged_path).read()
                theirs = open(classic).read()
            except OSError:
                ours = theirs = None
            if ours is None or ours != theirs:
                try:
                    os.unlink(self._marker(log_path, version))
                except OSError:
                    pass
                raise CommitConflictException(
                    f"version {version} was backfilled by a concurrent "
                    "writer while this registration was in flight")
        return Commit(version, staged_path, timestamp)

    def get_commits(self, log_path, start_version=0):
        d = os.path.join(log_path, MARKER_DIR)
        try:
            names = sorted(os.listdir(d))
        except FileNotFoundError:
            return []
        out = []
        for name in names:
            if not name.endswith(".json"):
                continue
            v = int(name.split(".")[0])
            if v < start_version:
                continue
            with open(os.path.join(d, name)) as f:
                rec = json.load(f)
            out.append(Commit(
                v, os.path.join(log_path, STAGED_DIR, rec["stagedFile"]),
                int(rec["timestamp"])))
        return out

    def register_backfill(self, log_path, version):
        d = os.path.join(log_path, MARKER_DIR)
        try:
            names = os.listdir(d)
        except FileNotFoundError:
            return
        for name in names:
            if not name.endswith(".json"):
                continue
            if int(name.split(".")[0]) <= version:
                try:
                    os.unlink(os.path.join(d, name))
                except OSError:
                    pass


class ExternalTableCommitCoordinator(CommitCoordinatorClient):
    """The DynamoDB commit-coordinator scheme (reference
    dynamodb-commit-coordinator/DynamoDBCommitCoordinatorClient.java)
    over a file-backed external table OUTSIDE the table's filesystem,
    durable across OS processes.

    The coordinator owns the table's head pointer: version N is
    accepted iff the exactly-one-winner conditional creation of N's
    record succeeds AND N-1 is the accepted head — the reference's
    conditional-update expression `latestVersion == attemptVersion - 1`
    (DynamoDBCommitCoordinatorClient.java:186). Losing to an existing
    record is RETRYABLE (someone committed first, :195); a continuity
    gap is NOT (:197). The unbackfilled tail is served from the
    records, and the table's path is pinned at onboarding (the
    pathCheck role). Records are keyed per table under
    ``external_root`` — the "DynamoDB table"; the conditional put is an
    ``O_CREAT|O_EXCL`` create, atomic across processes."""

    def __init__(self, root: str):
        self.root = root

    def _dir(self, log_path: str) -> str:
        import hashlib

        key = hashlib.sha1(os.path.abspath(log_path).encode()).hexdigest()
        return os.path.join(self.root, key)

    def _rec(self, log_path: str, version: int) -> str:
        return os.path.join(self._dir(log_path),
                            "version-%020d.json" % version)

    def _latest(self, log_path: str) -> Optional[int]:
        try:
            names = os.listdir(self._dir(log_path))
        except FileNotFoundError:
            return None
        vs = [int(n[len("version-"):-len(".json")]) for n in names
              if n.startswith("version-") and n.endswith(".json")]
        return max(vs) if vs else None

    def commit(self, log_path, version, staged_path, timestamp):
        d = self._dir(log_path)
        os.makedirs(d, exist_ok=True)
        latest = self._latest(log_path)
        if latest is not None:
            if version <= latest:
                # retryable: a winner already holds this (or a later)
                # version — the writer rebases and retries
                raise CommitConflictException(
                    f"version {version} already accepted by the "
                    f"coordinator (head {latest})")
            if version != latest + 1:
                raise ValueError(
                    f"commit version {version} is not valid; the "
                    f"coordinator's head is {latest} (expected "
                    f"{latest + 1}) — unretryable gap")
            with open(self._rec(log_path, latest)) as f:
                head = json.load(f)
            if os.path.abspath(head["logPath"]) != os.path.abspath(log_path):
                raise ValueError(
                    "coordinated-commits external record belongs to a "
                    f"different table path {head['logPath']!r} "
                    "(pathCheck)")
        # else: onboarding (registerTable role) — the first coordinated
        # commit pins the path and seeds the head pointer
        payload = json.dumps({
            "logPath": os.path.abspath(log_path),
            "stagedFile": os.path.basename(staged_path),
            "timestamp": int(timestamp), "backfilled": False})
        try:
            fd = os.open(self._rec(log_path, version),
                         os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise CommitConflictException(
                f"version {version} registered by a concurrent writer")
        with os.fdopen(fd, "w") as f:
            f.write(payload)
            f.flush()
            os.fsync(f.fileno())
        return Commit(version, staged_path, int(timestamp))

    def get_commits(self, log_path, start_version=0):
        d = self._dir(log_path)
        try:
            names = sorted(os.listdir(d))
        except FileNotFoundError:
            return []
        out = []
        for name in names:
            if not (name.startswith("version-") and name.endswith(".json")):
                continue
            v = int(name[len("version-"):-len(".json")])
            if v < start_version:
                continue
            try:
                with open(os.path.join(d, name)) as f:
                    rec = json.load(f)
            except (OSError, ValueError):
                continue
            if rec.get("backfilled"):
                continue
            out.append(Commit(
                v, os.path.join(log_path, STAGED_DIR, rec["stagedFile"]),
                int(rec["timestamp"])))
        return out

    def register_backfill(self, log_path, version):
        import uuid

        d = self._dir(log_path)
        try:
            names = os.listdir(d)
        except FileNotFoundError:
            return
        for name in names:
            if not (name.startswith("version-") and name.endswith(".json")):
                continue
            v = int(name[len("version-"):-len(".json")])
            if v > version:
                continue
            p = os.path.join(d, name)
            try:
                with open(p) as f:
                    rec = json.load(f)
                if rec.get("backfilled"):
                    continue
                rec["backfilled"] = True
                tmp = f"{p}.{uuid.uuid4().hex}.new"
                with open(tmp, "w") as f:
                    f.write(json.dumps(rec))
                os.replace(tmp, p)
            except (OSError, ValueError):
                continue


_IN_MEMORY = InMemoryCommitCoordinator()
COORDINATORS: dict[str, CommitCoordinatorClient] = {
    "in-memory": _IN_MEMORY,
    "filesystem": FileSystemCommitCoordinator(),
}
# "external" coordinators are built per externalRoot from the
# commitCoordinatorConf-preview JSON (DeltaConfig.scala:959) and cached
_EXTERNAL_CACHE: dict[str, ExternalTableCommitCoordinator] = {}


def batch_size(configuration: Optional[dict]) -> int:
    """Backfill batch size (AbstractBatchBackfillingCommitCoordinatorClient):
    every commit with version % batchSize == 0 triggers a batch backfill;
    1 (default) backfills every commit immediately."""
    try:
        return max(1, int((configuration or {}).get(BATCH_SIZE_PROP, "1")))
    except (TypeError, ValueError):
        return 1


def backfill_to(log, coordinator: CommitCoordinatorClient,
                upto: Optional[int] = None) -> int:
    """Backfill every registered-but-unbackfilled commit <= ``upto``
    (all of them when None) into classic ``<v>.json`` files, then tell
    the coordinator.  Returns the number of files written.  Used by the
    batch-backfill trigger and by the checkpoint hook — a checkpoint
    must only cover a fully-backfilled prefix of the log (the
    coordinator "owns" checkpointing under coordinated commits)."""
    from delta_spark.log import ConcurrentModificationException

    written = 0
    highest = None
    for c in coordinator.get_commits(log.log_path):
        if upto is not None and c.version > upto:
            break  # ascending
        target = log.commit_file(c.version)
        if not os.path.exists(target):
            try:
                with open(c.file_path) as fh:
                    payload = fh.read()
                log.store.write_atomic(target, payload)
                written += 1
            except ConcurrentModificationException:
                pass  # another writer backfilled it concurrently
            except OSError:
                pass  # staged file unreadable — handled below
        if not os.path.exists(target):
            # the watermark must NEVER advance past a hole:
            # register_backfill(highest) tells the coordinator to drop
            # everything <= highest, and a tracked-but-unbackfilled
            # commit above a hole would become unreachable — the
            # crash-window data loss the r10 fuzzer caught. Stop here;
            # the hole's staged content is still tracked for retry.
            break
        highest = c.version
    if highest is not None:
        coordinator.register_backfill(log.log_path, highest)
    return written


def coordinator_for(configuration: Optional[dict]) -> Optional[CommitCoordinatorClient]:
    name = (configuration or {}).get(COORDINATOR_PROP)
    if not name:
        return None
    if str(name) == "external":
        raw = (configuration or {}).get(COORDINATOR_CONF_PROP) or "{}"
        try:
            conf = json.loads(raw)
        except ValueError:
            raise ValueError(
                f"{COORDINATOR_CONF_PROP} must be JSON, got {raw!r}")
        root = conf.get("externalRoot")
        if not root:
            raise ValueError(
                f"the 'external' commit coordinator requires "
                f"{COORDINATOR_CONF_PROP} JSON with an 'externalRoot' "
                f"(the file-backed external table's location)")
        inst = _EXTERNAL_CACHE.get(root)
        if inst is None:
            inst = _EXTERNAL_CACHE[root] = ExternalTableCommitCoordinator(root)
        return inst
    try:
        return COORDINATORS[str(name)]
    except KeyError:
        raise ValueError(f"unknown commit coordinator {name!r}; "
                         f"known: {sorted(COORDINATORS) + ['external']}")
