"""Change Data Feed batch reads (reference commands/cdc/CDCReader.scala:59-79,
changesToDF :230; TVFs table_changes/table_changes_by_path
DeltaTableValueFunctions.scala:47).

Per commit in [start, end]:
  * commits carrying AddCDCFile actions → read those files as-is (they
    already contain `_change_type` incl. update_preimage/postimage)
  * otherwise AddFiles with dataChange=true → synthesized
    `_change_type='insert'`; RemoveFiles with dataChange=true → read
    the (still-present) removed files as `_change_type='delete'`
  * dataChange=false commits (OPTIMIZE) produce no changes
Every row gets `_commit_version` + `_commit_timestamp`.
"""

from __future__ import annotations

import datetime as _dt
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from delta_spark.log import DeltaLog
from delta_spark.reader import read_files_df

CDF_COLUMNS = ["_change_type", "_commit_version", "_commit_timestamp"]


def _cdf_disabled_versions(cfg: dict) -> bool:
    return str(cfg.get("delta.enableChangeDataFeed", "false")).lower() != "true"


def table_changes(spark: SparkSession, log: DeltaLog,
                  starting_version: Optional[int] = None,
                  ending_version: Optional[int] = None,
                  starting_timestamp_ms: Optional[int] = None,
                  ending_timestamp_ms: Optional[int] = None) -> DataFrame:
    latest = log.latest_version()
    if starting_version is None:
        if starting_timestamp_ms is None:
            raise ValueError("CDF read requires startingVersion or startingTimestamp")
        # startingTimestamp = "changes committed AT OR AFTER" (reference
        # DeltaDataSource/CDCReader timestamp resolution); a timestamp
        # past the last commit is an error, not an empty result
        # (DeltaErrors.timestampGreaterThanLatestCommit)
        try:
            starting_version = log.version_at_timestamp(
                starting_timestamp_ms, after=True)
        except ValueError:
            raise ValueError(
                f"The provided startingTimestamp ({starting_timestamp_ms} ms) "
                f"is after the latest commit of the table")
    if starting_version > latest:
        # DeltaErrors.startVersionAfterLatestVersion (:630)
        raise ValueError(
            f"Provided Start version({starting_version}) for reading change "
            f"data is invalid. Start version cannot be greater than the "
            f"latest version of the table({latest}).")
    if ending_version is None:
        # endingTimestamp = "changes committed at or before"
        ending_version = (log.version_at_timestamp(ending_timestamp_ms)
                          if ending_timestamp_ms is not None else latest)
    ending_version = min(ending_version, latest)
    if ending_version < starting_version:
        # DeltaErrors.endBeforeStartVersionInCDC (:620)
        raise ValueError(
            f"CDC range from start {starting_version} to end "
            f"{ending_version} was invalid. End cannot be before start.")

    snapshot = log.update()
    # CDF must have been recorded for the WHOLE range: the reference
    # checks the metadata at the start version and errors when CDF was
    # not enabled there (CDCReader.changesToDF:260
    # DeltaErrors.changeDataNotRecordedException) — silently returning
    # synthesized rows for a pre-enable range would fabricate history
    try:
        start_cfg = log.snapshot_at(starting_version).configuration
    except Exception:
        start_cfg = snapshot.configuration
    if _cdf_disabled_versions(start_cfg or {}):
        raise ValueError(
            f"Error getting change data for range [{starting_version}, "
            f"{ending_version}] as change data was not recorded for "
            f"version [{starting_version}]. Set "
            f"delta.enableChangeDataFeed=true before the range start.")
    schema = snapshot.schema
    dfs: list[DataFrame] = []

    from delta_spark.schema import physical_name

    end_map = {physical_name(f): f.name for f in schema.fields}

    def _shape(field) -> str:
        """Logical+physical name tree of a field — differs iff some
        nested field was renamed, dropped, added or retyped."""
        from pyspark.sql import types as T

        def walk(dt):
            if isinstance(dt, T.StructType):
                return [(f.name, physical_name(f), walk(f.dataType))
                        for f in dt.fields]
            if isinstance(dt, T.ArrayType):
                return ("array", walk(dt.elementType))
            if isinstance(dt, T.MapType):
                return ("map", walk(dt.keyType), walk(dt.valueType))
            return dt.simpleString()

        return repr((field.name, physical_name(field), walk(field.dataType)))

    def _check_compat(ver_snapshot) -> None:
        """CDF ranges must be schema-compatible with the END schema
        (CDCReader / DeltaColumnMappingUnsupportedSchemaIncompatible):
        a rename or drop inside the range is blocked with a clear
        error; purely ADDITIVE evolution aligns by null-filling."""
        vs = ver_snapshot.schema
        for f in vs.fields:
            phys = physical_name(f)
            if phys not in end_map:
                raise ValueError(
                    f"Change Data Feed range [{starting_version}, "
                    f"{ending_version}] spans a DROP of column {f.name!r}; "
                    "narrow the range to versions sharing a read-"
                    "compatible schema")
            if end_map[phys] != f.name:
                raise ValueError(
                    f"Change Data Feed range [{starting_version}, "
                    f"{ending_version}] spans a RENAME of column "
                    f"{f.name!r} -> {end_map[phys]!r}; narrow the range "
                    "to versions sharing a read-compatible schema")
            # NESTED fields carry mapping metadata too: any nested
            # rename/drop/add inside a shared column makes the range
            # incompatible (the reference's column-mapping CDF gate
            # blocks on any schema change across the range)
            ef = next(x for x in schema.fields if physical_name(x) == phys)
            if _shape(f) != _shape(ef):
                raise ValueError(
                    f"Change Data Feed range [{starting_version}, "
                    f"{ending_version}] spans a nested schema change in "
                    f"column {f.name!r}; narrow the range to versions "
                    "sharing a read-compatible schema")

    def _check_and_align(df: DataFrame, ver_snapshot) -> DataFrame:
        _check_compat(ver_snapshot)
        have = {f.name for f in ver_snapshot.schema.fields}
        return df.select(*[
            (F.col(f.name) if f.name in have
             else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in schema.fields])
    # ONE replay to just before the range, then advance INCREMENTALLY
    # per commit (CDCReader walks commits the same way) — per-version
    # snapshot_at here would replay the whole log O(range) times, the
    # scale killer for long change feeds on big tables
    rolling = (log.snapshot_at(starting_version - 1)
               if starting_version > 0 else None)
    for v in range(starting_version, ending_version + 1):
        actions = log.read_commit_actions(v)
        ts = _dt.datetime.utcfromtimestamp(log._commit_timestamp(v) / 1000.0)
        cdc_files = [a for k, a in actions if k == "cdc"]
        adds = [a for k, a in actions if k == "add" and a.dataChange]
        removes = [a for k, a in actions if k == "remove" and a.dataChange]
        # victims resolve against the PRE-commit state
        from delta_spark.util import canonical_log_path as _ckey

        victims = ([rolling.active[_ckey(r.path)] for r in removes
                    if _ckey(r.path) in rolling.active]
                   if rolling is not None and removes else [])
        prev_rolling = rolling
        if rolling is None:
            rolling = log.snapshot_at(v)
        else:
            rolling = rolling.clone_state()
            rolling.apply_actions(actions)
            rolling.version = v
        if (adds or removes or cdc_files) and \
                _cdf_disabled_versions(rolling.configuration or {}):
            # CDF was off when this commit happened: change data was
            # never recorded — synthesizing rows would fabricate
            # history (CDCReader per-commit
            # changeDataNotRecordedException)
            raise ValueError(
                f"Error getting change data for range "
                f"[{starting_version}, {ending_version}] as change data "
                f"was not recorded for version [{v}].")
        if cdc_files:
            _check_compat(rolling)
            cdc_schema = T.StructType(schema.fields + [T.StructField("_change_type", T.StringType())])
            from delta_spark import geo as _geo
            from delta_spark.util import decode_log_path

            _geo.assert_readable(spark, cdc_schema)

            paths = [os.path.join(log.table_path, decode_log_path(c.path))
                     for c in cdc_files]
            # CDC files store geo columns as WKB binary (writer seam)
            df = _geo.restore(
                spark.read.schema(_geo.binary_read_schema(cdc_schema))
                .parquet(*paths), cdc_schema)
            dfs.append(_stamp(df, v, ts))
            continue
        if adds:
            df = (_check_and_align(read_files_df(spark, rolling, adds),
                                   rolling)
                  .withColumn("_change_type", F.lit("insert")))
            dfs.append(_stamp(df, v, ts))
        if victims:
            df = (_check_and_align(
                      read_files_df(spark, prev_rolling, victims),
                      prev_rolling)
                  .withColumn("_change_type", F.lit("delete")))
            dfs.append(_stamp(df, v, ts))
    if not dfs:
        empty_schema = T.StructType(
            schema.fields + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.LongType()),
                T.StructField("_commit_timestamp", T.TimestampType()),
            ])
        return spark.createDataFrame([], empty_schema)
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _stamp(df: DataFrame, version: int, ts) -> DataFrame:
    return (df.withColumn("_commit_version", F.lit(version).cast("long"))
              .withColumn("_commit_timestamp", F.lit(ts).cast("timestamp")))
