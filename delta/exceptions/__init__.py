"""Reference-compatible `delta.exceptions`
(python/delta/exceptions/__init__.py): the concurrency exception
hierarchy under the reference's names. `except` clauses written against
the reference catch the same engine conditions here."""

from delta_spark.log import DeltaConcurrentException as \
    DeltaConcurrentModificationException  # noqa: F401  (reference base name)
from delta_spark.transaction import (  # noqa: F401
    ConcurrentAppendException,
    ConcurrentDeleteDeleteException,
    ConcurrentDeleteReadException,
    ConcurrentTransactionException,
    ConcurrentWriteException,
    MetadataChangedException,
    ProtocolChangedException,
)

__all__ = [
    "DeltaConcurrentModificationException",
    "ConcurrentWriteException",
    "MetadataChangedException",
    "ProtocolChangedException",
    "ConcurrentAppendException",
    "ConcurrentDeleteReadException",
    "ConcurrentDeleteDeleteException",
    "ConcurrentTransactionException",
]
