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
