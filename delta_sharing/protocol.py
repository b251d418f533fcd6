"""Public-connector dataclasses (delta-sharing
python/delta_sharing/protocol.py): Share / Schema / Table /
DeltaSharingProfile with the same constructor shapes the connector
exposes, re-exported from delta_spark.sharing."""

from delta_spark.sharing.client import SchemaRef as Schema
from delta_spark.sharing.client import Share, TableRef as Table
from delta_spark.sharing.protocol import DeltaSharingProfile

__all__ = ["DeltaSharingProfile", "Schema", "Share", "Table"]
