"""Reference-compatible `delta.connect.tables` module
(python/delta/connect/tables.py): same class surface as delta.tables —
in this engine one implementation serves classic and Connect sessions.
Signature parity against the REFERENCE CONNECT file is pinned by
tests/test_api_parity.py (the connect variant of the reference API is
a subset of the classic one, so the classic parity gate subsumes it;
the parity test asserts that subset relation explicitly)."""

from delta_spark.table import (  # noqa: F401
    DeltaMergeBuilder,
    DeltaOptimizeBuilder,
    DeltaTable,
    DeltaTableBuilder,
    IdentityGenerator,
)

__all__ = ["DeltaTable", "DeltaMergeBuilder", "DeltaTableBuilder",
           "DeltaOptimizeBuilder", "IdentityGenerator"]
