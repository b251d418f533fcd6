"""Delta Sharing tier — an open-protocol server + client for sharing
delta_spark tables across organizational boundaries.

Re-expresses the reference's sharing connector
(sharing/src/main/scala/io/delta/sharing/spark/DeltaSharingDataSource.scala:52,
delta-io/delta-sharing PROTOCOL.md) Python/Spark-first:

- ``server``: a file-backed REST server implementing the Delta Sharing
  protocol (shares/schemas/tables listing, metadata, query, changes)
  over any delta_spark table, with server-side file skipping from
  jsonPredicateHints, limitHint, time travel, and both response
  formats (``parquet`` for basic tables, ``delta`` for tables with
  reader features such as deletion vectors / column mapping).
- ``client``: a urllib-based REST client plus ``load_as_spark`` /
  ``load_table_changes_as_spark`` entry points. The client
  reconstructs a faked local delta log from the server response — the
  reference's DeltaSharingLogFileSystem design
  (sharing/.../DeltaSharingLogFileSystem.scala:969) — and hands it to
  the ordinary delta_spark reader, so DV filtering, column mapping,
  CDF and time travel are inherited rather than re-implemented.
"""

from delta_spark.sharing.client import (
    SharingClient,
    load_as_spark,
    load_table_changes_as_spark,
)
from delta_spark.sharing.protocol import DeltaSharingProfile
from delta_spark.sharing.server import SharingServer, SharingServerConfig

__all__ = [
    "DeltaSharingProfile",
    "SharingClient",
    "SharingServer",
    "SharingServerConfig",
    "load_as_spark",
    "load_table_changes_as_spark",
]
