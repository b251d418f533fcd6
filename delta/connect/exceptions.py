"""Reference-compatible `delta.connect.exceptions`
(python/delta/connect/exceptions.py registers Delta's exception
classes with PySpark's Connect error conversion on import). Our
exceptions are plain Python classes raised client-side — the same
objects under either session kind — so this module just re-exports
the `delta.exceptions` surface plus the Connect-specific
DeltaConnectUnsupportedError."""

from delta.exceptions import *  # noqa: F401,F403
from delta.exceptions import __all__ as _base_all
from delta_spark.connect_compat import DeltaConnectUnsupportedError  # noqa: F401

__all__ = list(_base_all) + ["DeltaConnectUnsupportedError"]
