"""delta_spark — a PySpark-native transactional table format engine.

A from-scratch rebuild of the capabilities of Delta Lake
(reference: delta-io/delta) on top of stock PySpark: ACID commits over
Parquet, snapshot isolation + time travel, DML (DELETE/UPDATE/MERGE),
layout optimization (OPTIMIZE / Z-ORDER), retention (VACUUM),
change-data-feed, streaming source/sink, schema evolution/constraints,
and stats-based data skipping — plus large-scale data-pipeline
operators (dedup, similarity search, text analysis) built Spark-first.

Everything data-path is expressed with the DataFrame API so Catalyst
(pushdown, pruning, AQE, whole-stage codegen) does the heavy lifting;
the transaction log is pure Python over the local filesystem
(LogStore abstraction mirrors reference storage/LogStore.java:83).
"""

from delta_spark.io import write_delta
from delta_spark.log import DeltaLog
from delta_spark.table import DeltaTable, IdentityGenerator
from delta_spark.session import get_spark, configure_spark
from delta_spark.sql import delta_sql

__version__ = "0.1.0"

__all__ = [
    "DeltaLog",
    "DeltaTable",
    "IdentityGenerator",
    "write_delta",
    "get_spark",
    "configure_spark",
    "delta_sql",
]
