"""Reference-compatible `delta.tables` module (python/delta/tables.py):
the class surface is delta_spark's, signature parity is pinned by
tests/test_api_parity.py."""

from delta_spark.table import (  # noqa: F401
    DeltaMergeBuilder,
    DeltaOptimizeBuilder,
    DeltaTable,
    DeltaTableBuilder,
    IdentityGenerator,
)

__all__ = ["DeltaTable", "DeltaMergeBuilder", "DeltaTableBuilder",
           "DeltaOptimizeBuilder", "IdentityGenerator"]
