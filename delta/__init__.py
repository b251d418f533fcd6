"""Drop-in import-compat shim for the reference Python package
(python/delta/__init__.py): a migrating user's `from delta.tables
import DeltaTable` / `configure_spark_with_delta_pip` work verbatim,
backed by delta_spark. Pinned by tests/test_api_parity.py."""

from delta.pip_utils import configure_spark_with_delta_pip
from delta.tables import DeltaTable
from delta.version import __version__

__all__ = ["DeltaTable", "configure_spark_with_delta_pip", "__version__"]
