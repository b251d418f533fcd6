"""Snapshot → DataFrame (reference DeltaLog.createRelation /
TahoeLogFileIndex → FileSourceScanExec path).

We hand Spark an *explicit pruned file list* plus the full table schema
(data + partition columns) and the table root as ``basePath`` so
Spark's own partition-discovery attaches typed partition columns. The
result is a single Parquet relation — predicate pushdown, column
pruning, vectorized reading and whole-stage codegen all apply exactly
as for a plain parquet read; our log-level pruning has already removed
irrelevant files before Catalyst ever sees the scan.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from delta_spark.actions import AddFile
from delta_spark.snapshot import Snapshot
from delta_spark.util import deserialize_partition_value


def _abs_path(table_path: str, f: AddFile) -> str:
    if f.path.startswith("/") or "://" in f.path:
        return f.path
    return os.path.join(table_path, f.path)


def read_files_df(
    spark: SparkSession,
    snapshot: Snapshot,
    files: Optional[list[AddFile]] = None,
) -> DataFrame:
    """Build a DataFrame over the given AddFiles (defaults to the whole
    snapshot)."""
    files = snapshot.all_files if files is None else files
    logical_schema = snapshot.schema
    if not files:
        return spark.createDataFrame([], logical_schema)
    mapped = snapshot.column_mapping_enabled
    if mapped:
        # files store physical names: read physically, alias back
        from delta_spark.schema import physical_schema as _phys

        schema = _phys(logical_schema)
        l2p = snapshot.physical_map()
        part_cols = [l2p.get(c, c) for c in snapshot.partition_columns]
    else:
        schema = logical_schema
        part_cols = snapshot.partition_columns

    rel_files = [f for f in files if not (f.path.startswith("/") or "://" in f.path)]
    abs_files = [f for f in files if f.path.startswith("/") or "://" in f.path]

    dfs = []
    if rel_files:
        paths = [_abs_path(snapshot.table_path, f) for f in rel_files]
        if part_cols:
            df = (spark.read.option("basePath", snapshot.table_path)
                  .schema(schema).parquet(*paths))
        else:
            df = spark.read.schema(schema).parquet(*paths)
        dfs.append(df.select(*[f.name for f in schema.fields]))
    if abs_files:
        # absolute paths (shallow clones): attach partition values as
        # typed literals per distinct partition tuple
        pset = set(part_cols)
        data_schema = T.StructType([f for f in schema.fields if f.name not in pset])
        ptypes = {f.name: f.dataType for f in schema.fields if f.name in pset}
        groups: dict[tuple, list[AddFile]] = {}
        for f in abs_files:
            key = tuple(f.partitionValues.get(c) for c in part_cols)
            groups.setdefault(key, []).append(f)
        for key, group in groups.items():
            df = spark.read.schema(data_schema).parquet(*[_abs_path(snapshot.table_path, f) for f in group])
            for c in part_cols:
                raw = group[0].partitionValues.get(c)
                val = deserialize_partition_value(raw, ptypes[c])
                df = df.withColumn(c, F.lit(val).cast(ptypes[c]))
            dfs.append(df.select(*[f.name for f in schema.fields]))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    if mapped:
        # physical → logical projection
        out = out.select(*[
            F.col(p.name).alias(l.name)
            for p, l in zip(schema.fields, logical_schema.fields)])
    return out


def read_snapshot(
    spark: SparkSession,
    snapshot: Snapshot,
    predicate: Optional[str] = None,
    limit: Optional[int] = None,
) -> DataFrame:
    """Snapshot scan with log-level pruning; the predicate is ALSO
    re-applied by Spark on the rows (skipping is file-granular)."""
    files = snapshot.files_for_scan(predicate, limit)
    df = read_files_df(spark, snapshot, files)
    if predicate:
        df = df.filter(predicate)
    if limit is not None:
        df = df.limit(limit)
    return df


def with_file_name(df: DataFrame) -> DataFrame:
    """Tag rows with their source file (MERGE/DML touched-file
    discovery uses input_file_name(), ClassicMergeExecutor.scala:72)."""
    return df.withColumn("__delta_file", F.input_file_name())
