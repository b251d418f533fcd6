"""Drop-in import-compat shim for the public ``delta-sharing`` Python
connector (delta-io/delta-sharing python/delta_sharing/__init__.py): a
migrating user's ``import delta_sharing; delta_sharing.load_as_spark``
/ ``SharingClient`` call sites work verbatim, backed by
delta_spark.sharing. Exercised end-to-end by tests/test_sharing.py.
"""

from delta_sharing.delta_sharing import (
    SharingClient,
    get_table_metadata,
    get_table_protocol,
    get_table_version,
    load_as_pandas,
    load_as_spark,
    load_table_changes_as_pandas,
    load_table_changes_as_spark,
)
from delta_sharing.protocol import DeltaSharingProfile, Schema, Share, Table
from delta_sharing.version import __version__

__all__ = [
    "DeltaSharingProfile",
    "Schema",
    "Share",
    "SharingClient",
    "Table",
    "get_table_metadata",
    "get_table_protocol",
    "get_table_version",
    "load_as_pandas",
    "load_as_spark",
    "load_table_changes_as_pandas",
    "load_table_changes_as_spark",
    "__version__",
]
