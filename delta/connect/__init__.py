"""Import-compat shim for the reference's Spark Connect Python package
(python/delta/connect/__init__.py): `from delta.connect import
DeltaTable` resolves to the same engine-backed class as `delta.tables`.

The reference's connect tier needs a separate class because its
classic DeltaTable is a py4j proxy and the connect one speaks protobuf
to a server plugin. delta_spark has no such split — the SAME
DataFrame-API implementation serves both session kinds, with the few
classic-only seams routed through delta_spark.connect_compat (which
degrades them or fails loudly under Connect; see DEVIATIONS.md for
the support matrix). Exercised by tests/test_connect.py.
"""

import delta.connect.exceptions  # noqa: F401  (reference import shape)
from delta.connect.tables import DeltaTable

__all__ = ["DeltaTable"]
