"""LogStore: the put-if-absent seam under the transaction log.

The contract is the reference's
storage/src/main/java/io/delta/storage/LogStore.java:83-140
`write(path, actions, overwrite=false)` plus `read` / `listFrom`:

  1. **Conditional put.** `write_atomic(path, content)` makes the file
     visible atomically, all-or-nothing, and MUST raise
     ``ConcurrentModificationException`` if the path already exists —
     this single primitive is what linearizes concurrent committers.
  2. **Read-after-write.** A path whose `write_atomic` returned
     successfully is immediately visible to `read` and `list_dir` from
     every client. Eventual consistency here silently loses commits —
     it is the reason bare S3 (before conditional PUT) needed the
     DynamoDB scheme (reference storage-s3-dynamodb/).
  3. **Durability before visibility.** Once visible, the content never
     changes and never disappears (absent explicit deletes).

`check_logstore_contract` below validates a backend against the
contract with named violations; an S3/GCS/DynamoDB implementation plugs
in by subclassing LogStore and passing a factory to
``DeltaLog.store_factory``.
"""

from __future__ import annotations

import os
import tempfile
import threading
from typing import Optional


class DeltaConcurrentException(Exception):
    """Base of every concurrency conflict (delta.exceptions base role)."""


class ConcurrentModificationException(DeltaConcurrentException):
    """A concurrent writer committed the version we tried to write."""


class LogStoreContractViolation(AssertionError):
    """A backend failed the LogStore contract (named check in message)."""


class LogStore:
    """Abstract put-if-absent store (LogStore.java:83-140)."""

    def write_atomic(self, path: str, content: str) -> None:
        raise NotImplementedError

    def read(self, path: str) -> str:
        raise NotImplementedError

    def list_dir(self, path: str) -> list[str]:
        raise NotImplementedError


class LocalLogStore(LogStore):
    """Atomic put-if-absent on a local/posix filesystem.

    Write a temp file in the same directory, then `os.link` it into
    place — hard-link creation is atomic and fails with EEXIST.
    """

    def write_atomic(self, path: str, content: str) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp_commit_")
        try:
            with os.fdopen(fd, "w") as f:
                f.write(content)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, path)
            except FileExistsError:
                raise ConcurrentModificationException(path)
        finally:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    def read(self, path: str) -> str:
        with open(path, "r") as f:
            return f.read()

    def list_dir(self, path: str) -> list[str]:
        try:
            return sorted(os.listdir(path))
        except FileNotFoundError:
            return []


class InMemoryLogStore(LogStore):
    """Conditional-put store keeping committed JSON in process memory,
    overlaid on the local filesystem for everything written outside the
    store seam (parquet checkpoints, .crc, staged files).

    This is the shape of the reference's S3+DynamoDB scheme
    (storage-s3-dynamodb/ BaseExternalLogStore): the conditional write
    happens against an external table (here: a locked dict), while bulk
    bytes live on the object store (here: disk). It exists to prove the
    engine runs end-to-end against a non-filesystem conditional-write
    backend and to pin the seam with contract + fuzz tests.
    """

    def __init__(self):
        self._mem: dict[str, str] = {}
        self._lock = threading.Lock()

    def write_atomic(self, path: str, content: str) -> None:
        path = os.path.abspath(path)
        with self._lock:
            if path in self._mem or os.path.exists(path):
                raise ConcurrentModificationException(path)
            self._mem[path] = content

    def read(self, path: str) -> str:
        path = os.path.abspath(path)
        with self._lock:
            if path in self._mem:
                return self._mem[path]
        with open(path, "r") as f:
            return f.read()

    def list_dir(self, path: str) -> list[str]:
        path = os.path.abspath(path)
        try:
            names = set(os.listdir(path))
        except FileNotFoundError:
            names = set()
        with self._lock:
            for p in self._mem:
                if os.path.dirname(p) == path:
                    names.add(os.path.basename(p))
        return sorted(names)


class FaultInjectingLogStore(LogStore):
    """Wraps a conforming store and injects the failure modes a flaky
    network / object store produces, WITHOUT breaking the contract:

    - ``fail_before``: raise IOError before attempting the put (the
      commit definitely did not happen; a clean, retryable failure).
    - ``fail_after``: perform the put, then raise IOError (lost ack —
      the commit IS durable but the writer believes it failed; the
      protocol-safe outcome is a surfaced error with the version
      already committed, never a torn or duplicated commit).

    Probabilities are driven by an injected RNG for reproducibility.
    """

    def __init__(self, inner: LogStore, rng, fail_before: float = 0.0,
                 fail_after: float = 0.0):
        self.inner = inner
        self.rng = rng
        self.fail_before = fail_before
        self.fail_after = fail_after
        self.lost_acks: list[str] = []   # puts that succeeded but errored

    def write_atomic(self, path: str, content: str) -> None:
        if self.rng.random() < self.fail_before:
            raise IOError(f"injected: connection reset before put {path}")
        self.inner.write_atomic(path, content)
        if self.rng.random() < self.fail_after:
            self.lost_acks.append(path)
            raise IOError(f"injected: ack lost after put {path}")

    def read(self, path: str) -> str:
        return self.inner.read(path)

    def list_dir(self, path: str) -> list[str]:
        return self.inner.list_dir(path)


def check_logstore_contract(store: LogStore, workdir: str,
                            n_threads: int = 8, n_races: int = 20) -> None:
    """Validate a LogStore backend against the contract; raises
    LogStoreContractViolation naming the broken clause."""
    import uuid

    base = os.path.join(workdir, "contract_%s" % uuid.uuid4().hex[:8])
    os.makedirs(base, exist_ok=True)

    # clause 1+2: put-if-absent and read-after-write
    p = os.path.join(base, "00000000000000000000.json")
    store.write_atomic(p, "first")
    if store.read(p) != "first":
        raise LogStoreContractViolation("read-after-write: content mismatch")
    if os.path.basename(p) not in store.list_dir(base):
        raise LogStoreContractViolation("list-after-write: path not listed")
    try:
        store.write_atomic(p, "second")
    except ConcurrentModificationException:
        pass
    else:
        raise LogStoreContractViolation(
            "put-if-absent: overwrite of an existing path did not raise "
            "ConcurrentModificationException")
    if store.read(p) != "first":
        raise LogStoreContractViolation(
            "put-if-absent: losing write clobbered existing content")

    # clause 1 under contention: exactly one winner per path
    for race in range(n_races):
        path = os.path.join(base, "%020d.json" % (race + 1))
        winners: list[int] = []
        errs: list[Exception] = []
        barrier = threading.Barrier(n_threads)

        def attempt(i, path=path, winners=winners, errs=errs,
                    barrier=barrier):
            barrier.wait()
            try:
                store.write_atomic(path, "writer-%d" % i)
                winners.append(i)
            except ConcurrentModificationException:
                pass
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        ts = [threading.Thread(target=attempt, args=(i,))
              for i in range(n_threads)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        if errs:
            raise LogStoreContractViolation(
                f"race {race}: unexpected error {errs[0]!r}")
        if len(winners) != 1:
            raise LogStoreContractViolation(
                f"race {race}: {len(winners)} winners (must be exactly 1)")
        if store.read(path) != "writer-%d" % winners[0]:
            raise LogStoreContractViolation(
                f"race {race}: committed content is not the winner's")
        if os.path.basename(path) not in store.list_dir(base):
            raise LogStoreContractViolation(
                f"race {race}: winning path missing from listing")


class ExternalTableLogStore(LogStore):
    """The S3+DynamoDB commit scheme (reference storage-s3-dynamodb/
    BaseExternalLogStore.java / S3DynamoDBLogStore.java) re-expressed
    over a file-backed external table, durable ACROSS PROCESSES.

    Role mapping:

    - **Object store** (S3): the ordinary filesystem, used WITHOUT any
      atomicity assumption — targets are written via plain copies, as
      on an object store whose PUT cannot do if-absent.
    - **External table** (DynamoDB): a directory of entry files under
      ``external_root``; the conditional put (putExternalEntry
      overwrite=false, the scheme's linearization point) is an
      ``O_CREAT|O_EXCL`` create, which posix guarantees atomic across
      processes.

    Write protocol for N.json (BaseExternalLogStore.write):

    - Step 0: fail if N.json already exists in the filesystem.
    - Step 1: ensure N-1.json exists; if its external entry is
      incomplete, perform the recovery copy (fixDeltaLog).
    - Step 2: PREPARE — write the temp object T(N), then conditionally
      put the entry E(N, T(N), complete=false). A loser here gets
      ConcurrentModificationException (and first helps recover the
      winner's incomplete write, like fixDeltaLog on the read path).
    - Step 3: COMMIT — copy T(N) into N.json.
    - Step 4: ACKNOWLEDGE — overwrite E with complete=true and an
      expireTime (the 1-day TTL delay rationale in
      BaseExternalLogStore.java:70-104; `cleanup_expired` is the TTL
      reaper).

    A crash between steps 2-4 leaves an incomplete entry; any later
    read/listing of the log (or the next writer's step 1) completes the
    copy — exactly the scheme's recovery guarantee that a commit
    acknowledged to the external table is never lost.
    """

    EXPIRATION_DELAY_SECONDS = 24 * 3600

    def __init__(self, external_root: str):
        import re

        self.external_root = external_root
        self._path_lock = threading.Lock()      # PathLock role (per JVM)
        self._delta_re = re.compile(r"^\d{20}\.json$")

    # ------------------------------------------------ entry table ----

    def _table_path(self, path: str) -> Optional[str]:
        path = os.path.abspath(path)
        marker = os.sep + "_delta_log"
        idx = path.find(marker + os.sep)
        if idx < 0:
            return None
        return path[:idx]

    def _entry_path(self, table: str, rel: str) -> str:
        import hashlib

        key = hashlib.sha1(os.path.abspath(table).encode()).hexdigest()
        return os.path.join(self.external_root, key,
                            rel.replace(os.sep, "%2F") + ".entry")

    def _get_entry(self, table: str, rel: str) -> Optional[dict]:
        import json as _json

        try:
            with open(self._entry_path(table, rel)) as f:
                return _json.load(f)
        except (OSError, ValueError):
            return None

    def _put_entry_if_absent(self, table: str, rel: str, entry: dict) -> None:
        """The linearization point: DynamoDB conditional put ≈ O_EXCL
        entry-file creation (atomic across processes)."""
        import json as _json

        p = self._entry_path(table, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as f:
            f.write(_json.dumps(entry))
            f.flush()
            os.fsync(f.fileno())

    def _overwrite_entry(self, table: str, rel: str, entry: dict) -> None:
        import json as _json
        import uuid

        p = self._entry_path(table, rel)
        # unique temp per call: the winner's ACK and a concurrent
        # recoverer's ACK may overwrite the same entry at once (both
        # write complete=true — idempotent), so the rename source must
        # not be shared
        tmp = f"{p}.{uuid.uuid4().hex}.new"
        with open(tmp, "w") as f:
            f.write(_json.dumps(entry))
        os.replace(tmp, p)

    # --------------------------------------------------- recovery ----

    def _copy_object(self, src: str, dst: str) -> None:
        """T(N) -> N.json 'copy with overwrite=false'. os.link is the
        closest posix analogue (fails if dst exists); a FileExists here
        means a concurrent recovery already landed the SAME bytes."""
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(src, dst)
        except FileExistsError:
            pass

    def _fix(self, table: str, rel: str, entry: dict) -> None:
        """fixDeltaLog: complete an incomplete external entry — copy
        its temp object into place, then acknowledge."""
        with self._path_lock:
            target = os.path.join(table, rel)
            if not os.path.exists(target):
                if not os.path.exists(entry["tempPath"]):
                    raise OSError(
                        f"incomplete external entry for {target} whose "
                        f"temp object {entry['tempPath']} is gone — the "
                        f"commit cannot be recovered")
                self._copy_object(entry["tempPath"], target)
            import time as _time

            entry = dict(entry)
            entry["complete"] = True
            entry["expireTime"] = int(
                _time.time()) + self.EXPIRATION_DELAY_SECONDS
            self._overwrite_entry(table, rel, entry)

    def _recover_incomplete(self, table: str) -> None:
        """Complete every incomplete entry of the table (the reference
        recovers the LATEST entry on listFrom — sufficient there
        because DynamoDB queries newest-first and completion is
        monotone; scanning all pending entries is the same fixpoint)."""
        import hashlib

        key = hashlib.sha1(os.path.abspath(table).encode()).hexdigest()
        d = os.path.join(self.external_root, key)
        try:
            names = os.listdir(d)
        except FileNotFoundError:
            return
        for name in names:
            if not name.endswith(".entry"):
                continue
            rel = name[:-len(".entry")].replace("%2F", os.sep)
            entry = self._get_entry(table, rel)
            if entry and not entry.get("complete"):
                self._fix(table, rel, entry)

    def cleanup_expired(self, now: Optional[int] = None) -> int:
        """TTL reaper: drop COMPLETE entries past their expireTime
        (DynamoDB TTL role). Returns the number removed."""
        import json as _json
        import time as _time

        now = int(_time.time()) if now is None else now
        removed = 0
        for root, _dirs, names in os.walk(self.external_root):
            for name in names:
                if not name.endswith(".entry"):
                    continue
                p = os.path.join(root, name)
                try:
                    with open(p) as f:
                        e = _json.load(f)
                except (OSError, ValueError):
                    continue
                if e.get("complete") and (e.get("expireTime") or 0) < now:
                    try:
                        os.unlink(p)
                        removed += 1
                    except OSError:
                        pass
        return removed

    # ------------------------------------------------- LogStore ----

    def write_atomic(self, path: str, content: str) -> None:
        import uuid

        path = os.path.abspath(path)
        table = self._table_path(path)
        if table is None:
            # outside any _delta_log (scratch writes): plain O_EXCL
            return LocalLogStore().write_atomic(path, content)
        rel = os.path.relpath(path, table)
        name = os.path.basename(path)

        # Step 0: fail fast on an existing target (after entry TTL
        # expiry this is the only guard, per the 1-day-delay rationale)
        if os.path.exists(path):
            raise ConcurrentModificationException(path)

        # Step 1: ensure N-1.json exists / recover it
        # (BaseExternalLogStore.write step 1 — incomplete prev entries
        # are completed; a prev missing from the FILESYSTEM is fatal
        # whether or not the external table still remembers it, since
        # the log would have a hole at the tip)
        if self._delta_re.match(name):
            version = int(name.split(".")[0])
            if version > 0:
                prev_rel = os.path.join(
                    os.path.dirname(rel), "%020d.json" % (version - 1))
                prev_entry = self._get_entry(table, prev_rel)
                if prev_entry and not prev_entry.get("complete"):
                    self._fix(table, prev_rel, prev_entry)
                elif not os.path.exists(os.path.join(table, prev_rel)):
                    raise OSError(
                        f"previous commit {prev_rel} doesn't exist on "
                        f"the file system"
                        + (" but does in the external log store"
                           if prev_entry else ""))

        # Step 2: PREPARE — temp object, then the conditional entry put
        tmp_dir = os.path.join(os.path.dirname(path), ".tmp")
        os.makedirs(tmp_dir, exist_ok=True)
        temp_path = os.path.join(tmp_dir, f"{uuid.uuid4().hex}_{name}")
        with open(temp_path, "w") as f:
            f.write(content)
            f.flush()
            os.fsync(f.fileno())
        entry = {"tablePath": table, "fileName": rel,
                 "tempPath": temp_path, "complete": False,
                 "expireTime": None}
        try:
            self._put_entry_if_absent(table, rel, entry)
        except FileExistsError:
            # a winner owns this version; help complete it if it
            # crashed mid-write (fixDeltaLog on the contention path),
            # then surface the conflict
            cur = self._get_entry(table, rel)
            if cur and not cur.get("complete"):
                self._fix(table, rel, cur)
            try:
                os.unlink(temp_path)
            except OSError:
                pass
            raise ConcurrentModificationException(path)

        # Step 3: COMMIT — copy T(N) into N.json
        self._copy_object(temp_path, path)

        # Step 4: ACKNOWLEDGE — complete=true + TTL
        import time as _time

        entry["complete"] = True
        entry["expireTime"] = int(
            _time.time()) + self.EXPIRATION_DELAY_SECONDS
        self._overwrite_entry(table, rel, entry)

    def read(self, path: str) -> str:
        path = os.path.abspath(path)
        if not os.path.exists(path):
            table = self._table_path(path)
            if table is not None:
                rel = os.path.relpath(path, table)
                entry = self._get_entry(table, rel)
                if entry and not entry.get("complete"):
                    self._fix(table, rel, entry)
        with open(path, "r") as f:
            return f.read()

    def list_dir(self, path: str) -> list[str]:
        path = os.path.abspath(path)
        # recovery before listing (BaseExternalLogStore.listFrom): a
        # reader must see commits acknowledged to the external table
        # even if the committer crashed before the filesystem copy
        table = None
        if os.path.basename(path) == "_delta_log":
            table = os.path.dirname(path)
        else:
            table = self._table_path(path)
        if table is not None:
            self._recover_incomplete(table)
        try:
            names = [n for n in os.listdir(path) if n != ".tmp"]
        except FileNotFoundError:
            return []
        return sorted(names)
