"""Concurrency-exception surface matching the reference's
``delta.exceptions`` module (python/delta/exceptions/base.py:30-85):
users catch these around conflicting transactions. They alias the
classes raised by ``delta_spark.transaction``'s conflict checker, plus
``ConcurrentWriteException`` as the reference-named alias of the
low-level commit-file collision."""

from delta_spark.actions import (
    InvalidProtocolVersionException,
    UnsupportedTableFeatureException,
)
from delta_spark.log import (
    ConcurrentModificationException as ConcurrentWriteException,
)
from delta_spark.transaction import (
    ConcurrentAppendException,
    ConcurrentDeleteDeleteException,
    ConcurrentDeleteReadException,
    ConcurrentTransactionException,
    DeltaConcurrentException,
    MetadataChangedException,
    ProtocolChangedException,
)

__all__ = [
    "DeltaConcurrentException",
    "ConcurrentWriteException",
    "MetadataChangedException",
    "ProtocolChangedException",
    "ConcurrentAppendException",
    "ConcurrentDeleteReadException",
    "ConcurrentDeleteDeleteException",
    "ConcurrentTransactionException",
    "InvalidProtocolVersionException",
    "UnsupportedTableFeatureException",
]
