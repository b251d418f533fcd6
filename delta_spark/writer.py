"""Transactional Parquet writing (reference
files/TransactionalWrite.scala:406 writeFiles).

Strategy: write the DataFrame with Spark's native Parquet writer into a
hidden staging directory inside the table (underscore-prefixed → both
invisible to our scans and protected from VACUUM, like `_delta_log`),
then hard-move the part files into their final Hive-style locations and
emit AddFile actions with footer-collected stats. Spark's part-file
names embed a per-job UUID, so names never collide across commits.

The data path stays fully distributed and codegen'd (it IS
`df.write.parquet`); only the O(#files) rename + footer pass runs on
the driver — the same asymptotics as the reference's driver-side
commit work.
"""

from __future__ import annotations

import os
import shutil
import uuid
from typing import Optional

from pyspark.sql import DataFrame, functions as F, types as T

from delta_spark.actions import AddFile
from delta_spark.stats import DEFAULT_NUM_INDEXED_COLS, collect_stats_parallel, file_mtime_ms
from delta_spark.util import (
    HIVE_DEFAULT_PARTITION,
    escape_partition_value,
    unescape_partition_value,
)


class SchemaMismatchError(Exception):
    pass


def normalize_df(df: DataFrame, schema: T.StructType, allow_missing_nullable: bool = False) -> DataFrame:
    """Project/cast the incoming DataFrame to the table schema
    (column-name resolution + implicit safe casts, the role of
    schema/ImplicitMetadataOperation + DeltaInsertCastSupport)."""
    by_name = {f.name.lower(): f for f in df.schema.fields}
    cols = []
    for field in schema.fields:
        src = by_name.get(field.name.lower())
        if src is None:
            if allow_missing_nullable and field.nullable:
                cols.append(F.lit(None).cast(field.dataType).alias(field.name))
                continue
            raise SchemaMismatchError(
                f"column {field.name!r} missing from written data; "
                f"data columns: {[f.name for f in df.schema.fields]}")
        c = F.col(src.name)
        if src.dataType != field.dataType:
            c = c.cast(field.dataType)
        cols.append(c.alias(field.name))
    extra = {f.name.lower() for f in df.schema.fields} - {f.name.lower() for f in schema.fields}
    if extra:
        raise SchemaMismatchError(
            f"data contains columns not in table schema: {sorted(extra)} "
            f"(use mergeSchema=True to evolve)")
    return df.select(*cols)


def write_files(
    df: DataFrame,
    table_path: str,
    partition_columns: list[str],
    indexed_cols: Optional[list[str]] = None,
    num_indexed_cols: int = DEFAULT_NUM_INDEXED_COLS,
    data_change: bool = True,
    target_file_rows: Optional[int] = None,
    shred_variant: bool = False,
    compression: Optional[str] = None,
    materialize_partitions: bool = False,
) -> list[AddFile]:
    """Write df's rows as new Parquet files under table_path; return
    AddFile actions (not yet committed). With `shred_variant`, variant
    columns are written SHREDDED (PROTOCOL.md:1934 variantShredding):
    Spark infers a typed_value schema per write and stores typed
    subcolumns alongside the binary value, so engines can project and
    push predicates into variant paths without decoding.

    With `materialize_partitions`
    (MaterializePartitionColumnsTableFeature): partition column values
    are ALSO stored physically in the data files — Spark's partitionBy
    strips them, so the write partitions by temporary duplicate columns
    and the relocation below renames the directory components back to
    the real column names; external readers that require partition
    columns in the parquet get them, the table layout is unchanged."""
    from delta_spark import geo as _geo
    from pyspark.sql import functions as F

    # validate BEFORE the parquet job: nested geo / disabled preview
    # conf must fail with the domain error, not a codegen crash
    _geo.validate_schema(df.schema, partition_columns, spark=df.sparkSession)
    df = _geo.wkb_out(df)  # geo columns land in parquet as WKB binary
    mat_map: dict[str, str] = {}
    if materialize_partitions and partition_columns:
        mat_map = {f"__mat_{i}": c for i, c in enumerate(partition_columns)}
        for tmp, c in mat_map.items():
            df = df.withColumn(tmp, F.col(f"`{c}`"))
        partition_columns_for_write = list(mat_map)
    else:
        partition_columns_for_write = partition_columns
    staging = os.path.join(table_path, f"_staging_{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if target_file_rows:
        # DeltaOptions maxRecordsPerFile: per-write row cap per file
        writer = writer.option("maxRecordsPerFile", int(target_file_rows))
    if compression:
        # DeltaOptions COMPRESSION: per-write parquet codec (Spark
        # validates the name — invalid codecs error before any file
        # lands)
        writer = writer.option("compression", compression)
    if partition_columns_for_write:
        writer = writer.partitionBy(*partition_columns_for_write)
    shred_confs = {"spark.sql.variant.writeShredding.enabled": "true",
                   "spark.sql.variant.inferShreddingSchema": "true",
                   # the parquet VARIANT logical-type annotation
                   # (PROTOCOL.md:1934) IS written — external
                   # annotation-requiring readers see real shredded
                   # variant. pyarrow<18 cannot parse such footers, so
                   # the stats pass detects the degradation and
                   # re-collects full bounds through a Spark scan
                   # (stats.collect_stats_spark) below
                   "spark.sql.parquet.variant.annotateLogicalType.enabled": "true"}
    saved: dict[str, Optional[str]] = {}
    conf = df.sparkSession.conf
    if shred_variant:
        for k, v in shred_confs.items():
            try:
                saved[k] = conf.get(k)
            except Exception:
                saved[k] = None
            conf.set(k, v)
    try:
        writer.parquet(staging)
    finally:
        for k, old in saved.items():
            try:
                if old is None:
                    conf.unset(k)
                else:
                    conf.set(k, old)
            except Exception:
                pass

    adds: list[AddFile] = []
    moved: list[tuple[str, dict]] = []  # (final_abs_path, partitionValues)
    for root, _dirs, files in os.walk(staging):
        for name in files:
            if not name.endswith(".parquet"):
                continue
            src = os.path.join(root, name)
            rel_dir = os.path.relpath(root, staging)
            rel_dir = "" if rel_dir == "." else rel_dir
            pvals: dict[str, Optional[str]] = {}
            if rel_dir:
                comps = []
                for comp in rel_dir.split(os.sep):
                    if "=" not in comp:
                        comps.append(comp)
                        continue
                    k, v = comp.split("=", 1)
                    k = unescape_partition_value(k)
                    if k in mat_map:
                        # materialized write: dir comps carry the temp
                        # duplicate's name — restore the real column in
                        # both the final layout and partitionValues
                        k = mat_map[k]
                        comp = f"{escape_partition_value(k)}={v}"
                    comps.append(comp)
                    pvals[k] = None if v == HIVE_DEFAULT_PARTITION else unescape_partition_value(v)
                rel_dir = os.sep.join(comps)
            final_dir = os.path.join(table_path, rel_dir) if rel_dir else table_path
            os.makedirs(final_dir, exist_ok=True)
            dst = os.path.join(final_dir, name)
            os.rename(src, dst)
            moved.append((dst, pvals))
    shutil.rmtree(staging, ignore_errors=True)

    stats_map = collect_stats_parallel([p for p, _ in moved], indexed_cols, num_indexed_cols)
    if shred_variant:
        # VARIANT-annotated footers degrade the pyarrow pass to
        # numRecords-only; re-collect full bounds via Spark, which
        # understands the annotation
        from delta_spark.stats import collect_stats_spark, is_degraded_stats

        degraded = [p for p, _ in moved
                    if is_degraded_stats(stats_map.get(p))]
        if degraded:
            upgraded = collect_stats_spark(
                df.sparkSession, degraded, indexed_cols, num_indexed_cols)
            for p in degraded:
                stats_map[p] = upgraded.get(os.path.normpath(p),
                                            stats_map[p])
    from delta_spark.util import encode_log_path

    for abs_path, pvals in moved:
        rel = os.path.relpath(abs_path, table_path).replace(os.sep, "/")
        adds.append(AddFile(
            path=encode_log_path(rel),
            partitionValues={c: pvals.get(c) for c in partition_columns},
            size=os.path.getsize(abs_path),
            modificationTime=file_mtime_ms(abs_path),
            dataChange=data_change,
            stats=stats_map.get(abs_path),
        ))
    return adds


def write_table_files(df: DataFrame, snapshot, data_change: bool = True) -> list[AddFile]:
    """Snapshot-aware write: applies column-mapping physical renames
    and partition-column translation, plus the table's stats config.
    All DML rewrite paths route through here."""
    from delta_spark.schema import logical_to_physical
    from delta_spark.stats import DEFAULT_NUM_INDEXED_COLS, stats_columns

    cfg = snapshot.configuration
    # NOT NULL + CHECK constraints bind to EVERY write, DML rewrites
    # included (DeltaInvariantCheckerExec role) — batch appends enforce
    # in write_delta, everything else lands here. ADD CONSTRAINT
    # validates existing rows first, so rewrites of untouched rows can
    # never trip this.
    from delta_spark.constraints import enforce_invariants

    df = enforce_invariants(df, snapshot.schema, cfg)
    try:
        num_indexed = int(cfg.get("delta.dataSkippingNumIndexedCols", DEFAULT_NUM_INDEXED_COLS))
    except (TypeError, ValueError):
        num_indexed = DEFAULT_NUM_INDEXED_COLS
    from delta_spark.stats import indexed_cols_for

    indexed_cols = indexed_cols_for(snapshot.schema, cfg, num_indexed)
    part_cols = snapshot.partition_columns
    if snapshot.column_mapping_enabled:
        from delta_spark.schema import physical_projection
        l2p = logical_to_physical(snapshot.schema)
        df = physical_projection(df, snapshot.schema)
        part_cols = [l2p.get(c, c) for c in part_cols]
        if indexed_cols is not None:
            indexed_cols = [l2p.get(c, c) for c in indexed_cols]
    return write_files(df, snapshot.table_path, part_cols,
                       indexed_cols=indexed_cols,
                       num_indexed_cols=num_indexed, data_change=data_change,
                       shred_variant=str(cfg.get(
                           "delta.enableVariantShredding", "false")).lower() == "true",
                       materialize_partitions=str(cfg.get(
                           "delta.enableMaterializePartitionColumnsFeature",
                           "false")).lower() == "true")


def write_cdc_files(df: DataFrame, table_path: str, snapshot=None,
                    already_physical: bool = False) -> list:
    """Write change-data rows (including the `_change_type` column) as
    CDC files under `_change_data/` (reference AddCDCFile; CDF files are
    invisible to normal scans — commands/cdc/CDCReader.scala:59).

    CDC files follow the SAME schema rules as data files (PROTOCOL.md
    "Change Data Files"): under column mapping they must carry
    physical column names at every nesting level, or an external CDF
    reader resolves nothing. Pass the table `snapshot` so the
    projection applies; `already_physical=True` skips it for callers
    whose DataFrame was projected upstream (write path inserts)."""
    from delta_spark.actions import AddCDCFile

    from delta_spark import geo as _geo

    if snapshot is not None and not already_physical \
            and snapshot.column_mapping_enabled:
        from delta_spark.schema import physical_projection
        df = physical_projection(df, snapshot.schema)

    staging = os.path.join(table_path, f"_staging_cdc_{uuid.uuid4().hex}")
    _geo.wkb_out(df).write.mode("overwrite").parquet(staging)
    cdc_dir = os.path.join(table_path, "_change_data")
    os.makedirs(cdc_dir, exist_ok=True)
    out = []
    for root, _dirs, files in os.walk(staging):
        for name in files:
            if not name.endswith(".parquet"):
                continue
            src = os.path.join(root, name)
            dst = os.path.join(cdc_dir, name)
            os.rename(src, dst)
            rel = os.path.relpath(dst, table_path).replace(os.sep, "/")
            from delta_spark.util import encode_log_path

            out.append(AddCDCFile(path=encode_log_path(rel),
                                  partitionValues={}, size=os.path.getsize(dst)))
    shutil.rmtree(staging, ignore_errors=True)
    return out
