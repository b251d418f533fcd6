"""WriteIntoDelta: the batch write command behind
`df.write.format("delta")` (reference commands/WriteIntoDelta.scala:81-141,
options DeltaOptions.scala:294-329).

Modes: append / overwrite / ignore / error; `replace_where` for
predicate-scoped overwrite; dynamic partition overwrite; mergeSchema /
overwriteSchema evolution; txnAppId/txnVersion idempotent writes.
"""

from __future__ import annotations

import json
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from delta_spark.actions import AddFile, Metadata, RemoveFile, SetTransaction
from delta_spark.constraints import (
    apply_generated_columns,
    apply_identity_columns,
    enforce_invariants,
)
from delta_spark.log import DeltaLog
from delta_spark.schema import (
    is_same_schema,
    merge_schemas,
    with_identity_watermark,
)
from delta_spark.stats import DEFAULT_NUM_INDEXED_COLS, stats_columns
from delta_spark.transaction import OptimisticTransaction, dml_transaction
from delta_spark.util import current_time_millis, schema_from_json, schema_to_json
from delta_spark.writer import normalize_df, write_files


class DeltaWriteError(Exception):
    pass


def _num_indexed_cols(configuration: dict[str, str]) -> int:
    try:
        return int(configuration.get("delta.dataSkippingNumIndexedCols", DEFAULT_NUM_INDEXED_COLS))
    except (TypeError, ValueError):
        return DEFAULT_NUM_INDEXED_COLS


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: Optional[list[str]] = None,
    replace_where: Optional[str] = None,
    replace_on: Optional[str] = None,
    replace_using: Optional[list[str]] = None,
    target_alias: Optional[str] = None,
    merge_schema: bool = False,
    overwrite_schema: bool = False,
    partition_overwrite_mode: str = "static",
    txn_app_id: Optional[str] = None,
    txn_version: Optional[int] = None,
    configuration: Optional[dict[str, str]] = None,
    user_metadata: Optional[str] = None,
    operation: Optional[str] = None,
    data_change: bool = True,
    max_records_per_file: Optional[int] = None,
    compression: Optional[str] = None,
) -> Optional[int]:
    """Run one transactional write; returns the committed version (None
    when skipped: mode=ignore on existing table, or replayed txn).
    ``data_change=False`` (DeltaOptions DATA_CHANGE_OPTION) marks the
    commit's file actions as rearrangement only — streaming sources
    skip it and it qualifies for SnapshotIsolation."""
    mode = mode.lower()
    if mode not in ("append", "overwrite", "ignore", "error", "errorifexists"):
        raise ValueError(f"unknown write mode {mode!r}")
    if (replace_on or replace_using) and replace_where:
        # WriteIntoDelta:258 — the three replacement criteria are
        # mutually exclusive
        raise ValueError("replaceWhere, replaceOn or replaceUsing cannot "
                         "be specified at the same time.")
    if replace_on and replace_using:
        raise ValueError("replaceWhere, replaceOn or replaceUsing cannot "
                         "be specified at the same time.")
    if (replace_on or replace_using) and mode != "overwrite":
        raise ValueError("replaceOn/replaceUsing require mode='overwrite'")
    if replace_where:
        # a subquery could evaluate differently between the
        # matched-data validation scan and the delete-selection scan
        # (DeltaSuite "replaceWhere blocks subquery")
        from delta_spark.predicates import reject_subquery

        reject_subquery(replace_where, "replaceWhere")
    if partition_overwrite_mode.lower() not in ("static", "dynamic"):
        # DeltaOptions.PARTITION_OVERWRITE_MODE: anything else is a
        # typo, not a mode — never silently treat it as static
        raise ValueError(
            f"invalid partitionOverwriteMode {partition_overwrite_mode!r}; "
            f"must be 'static' or 'dynamic'")
    if partition_overwrite_mode.lower() == "dynamic":
        # WriteIntoDelta.scala:210,223 — both pairs specify which data
        # to overwrite, so combining them is ambiguous
        if replace_where:
            raise ValueError(
                "'replaceWhere' cannot be used with dynamic partition "
                "overwrite")
        if overwrite_schema:
            raise ValueError(
                "'overwriteSchema' cannot be used with dynamic partition "
                "overwrite")
    source_for_replace = None
    if replace_on or replace_using:
        # the source is scanned for matching AND written: materialize
        # once (InsertReplaceOnMaterializeSource role)
        df = df.localCheckpoint(eager=True)
        source_for_replace = df
    log = DeltaLog.for_table(path)
    if not log.table_exists():
        # a literal `p@v3` / `p@yyyyMMddHHmmssSSS` path that is NOT a
        # table but whose base IS one is a time-travel spec — writing
        # would silently create a second table next to the real one
        # (DeltaHistoryManagerSuite "cannot time travel target tables
        # of insert/...")
        import re as _re

        m = _re.fullmatch(r"(.*)@(?:[vV]\d+|\d{17})", path)
        if m and DeltaLog.for_table(m.group(1)).table_exists():
            raise DeltaWriteError(
                f"cannot write to a time-travelled table ({path!r}); "
                f"writes must target the live table {m.group(1)!r}")
    # blind appends to a huge table never touch file state — with the
    # distributed-planning route the log is not replayed on the driver
    # at all (light snapshot; overwrite paths hydrate lazily)
    txn = dml_transaction(df.sparkSession, log)
    exists = txn.read_version >= 0 and txn.metadata is not None

    if exists and mode == "ignore":
        return None
    if exists and mode in ("error", "errorifexists"):
        raise DeltaWriteError(f"delta table already exists at {path}")

    # idempotent writes (DeltaOptions txnAppId/txnVersion, or the
    # spark.databricks.delta.write.txnAppId/.txnVersion session confs)
    from delta_spark.transaction import resolve_idempotent_txn

    txn_app_id, txn_version = resolve_idempotent_txn(
        df.sparkSession, txn_app_id, txn_version)
    if txn_app_id is not None and txn_version is not None:
        last = txn.txn_version(txn_app_id)
        if last is not None and last >= txn_version:
            return None

    actions: list = []
    spark = df.sparkSession

    if not exists:
        schema = df.schema
        part_cols = list(partition_by or [])
        for c in part_cols:
            if c not in [f.name for f in schema.fields]:
                raise DeltaWriteError(f"partition column {c!r} not in data")
        # clean duplicate-name error BEFORE the analyzer hits an
        # ambiguous reference (assertMetadata checkColumnNameDuplication)
        from delta_spark.schema import nested_field_names as _nfn

        seen: set = set()
        for n in _nfn(schema):
            if n.lower() in seen:
                raise DeltaWriteError(f"duplicate column name in schema: {n!r}")
            seen.add(n.lower())
        create_cfg = dict(configuration or {})
        from delta_spark.schema import assign_physical_names as _apn
        from delta_spark.schema import column_mapping_mode as _cmm
        if _cmm(create_cfg) in ("name", "id"):
            # creation-time column mapping: every field needs its stable
            # id + physical name NOW (DeltaColumnMapping
            # verifyAndUpdateMetadataChange on new tables) — otherwise a
            # later RENAME leaves physical==logical and the pre-rename
            # files stop resolving
            schema, max_id = _apn(schema, reuse_logical=False)
            create_cfg.setdefault("delta.columnMapping.maxColumnId",
                                  str(max_id))
        metadata = Metadata(
            schemaString=schema_to_json(schema),
            partitionColumns=part_cols,
            configuration=create_cfg,
            createdTime=current_time_millis(),
        )
        actions.append(metadata)
        table_schema = schema
    else:
        metadata = txn.metadata
        part_cols = list(metadata.partitionColumns)
        replacing_schema = mode == "overwrite" and overwrite_schema
        if partition_by and list(partition_by) != part_cols \
                and not replacing_schema:
            raise DeltaWriteError(
                f"partitioning {partition_by} does not match table partitioning {part_cols}")
        table_schema = schema_from_json(metadata.schemaString)
        if replacing_schema:
            # overwriteSchema replaces partitioning too
            # (ImplicitMetadataOperation isOverwriteMode +
            # canOverwriteSchema): the new spec is partition_by, or
            # unpartitioned when omitted — never the stale old columns,
            # which may not even exist in the new schema
            table_schema = df.schema
            metadata = Metadata(
                id=metadata.id, name=metadata.name, description=metadata.description,
                format=metadata.format, schemaString=schema_to_json(table_schema),
                partitionColumns=list(partition_by or []),
                configuration=metadata.configuration, createdTime=metadata.createdTime)
            part_cols = list(metadata.partitionColumns)
            actions.append(metadata)
        elif merge_schema:
            merged = merge_schemas(table_schema, df.schema)
            if not is_same_schema(merged, table_schema):
                table_schema = merged
                metadata = Metadata(
                    id=metadata.id, name=metadata.name, description=metadata.description,
                    format=metadata.format, schemaString=schema_to_json(merged),
                    partitionColumns=part_cols, configuration=metadata.configuration,
                    createdTime=metadata.createdTime)
                actions.append(metadata)

    cfg = dict(metadata.configuration) if not exists \
        else dict(txn.metadata.configuration)

    # ---- normalize + governance (defaults/generated/identity/invariants) ----
    from delta_spark.constraints import apply_default_columns

    out_df = apply_default_columns(df, table_schema)
    out_df = apply_generated_columns(out_df, table_schema)
    out_df, id_watermarks, id_generated = apply_identity_columns(out_df, table_schema)
    # missing NULLABLE table columns are always legal in a write —
    # reference ImplicitMetadataOperation: mergeSchemas(table, data) of
    # a subset-DataFrame equals the table schema, so isNewSchema=false
    # and the write proceeds (readers null-fill). Missing NOT NULL
    # columns still error below (nullability invariant role).
    out_df = normalize_df(out_df, table_schema, allow_missing_nullable=True)
    out_df = enforce_invariants(out_df, table_schema, cfg)
    if replace_where:
        # new rows must satisfy the replaceWhere predicate
        out_df = out_df.filter(
            F.when(~F.coalesce(F.expr(replace_where), F.lit(False)),
                   F.raise_error(F.lit(f"written data violates replaceWhere {replace_where!r}"))
                   .cast("boolean")).otherwise(F.lit(True)))

    if id_generated:
        # identity watermark must bound generated values → needs a max agg.
        # Materialize so the ids the agg sees are the ids written.
        out_df = out_df.localCheckpoint(eager=True)
        from delta_spark.schema import identity_info as _id_info

        infos = _id_info(table_schema)
        new_schema = table_schema
        for col, _ in id_watermarks.items():
            # directional: the most-advanced value is the MIN for a
            # negative INCREMENT BY step
            step = int(infos[col]["step"])
            agg = F.max if step > 0 else F.min
            mx = out_df.agg(agg(F.col(col)).alias("m")).collect()[0]["m"]
            if mx is not None:
                new_schema = with_identity_watermark(new_schema, col, int(mx))
        if actions and isinstance(actions[0], Metadata):
            actions[0].schemaString = schema_to_json(new_schema)
        else:
            m = txn.metadata
            actions.append(Metadata(
                id=m.id, name=m.name, description=m.description, format=m.format,
                schemaString=schema_to_json(new_schema), partitionColumns=part_cols,
                configuration=m.configuration, createdTime=m.createdTime))

    from delta_spark.schema import (
        assign_physical_names,
        column_mapping_mode,
        logical_to_physical,
    )

    write_part_cols = part_cols
    if column_mapping_mode(cfg) in ("name", "id"):
        if exists:
            # evolved columns need physical identities before writing;
            # post-upgrade columns get engine-generated names, never the
            # logical name — reusing it would resurrect a dropped
            # column's data still stored under that physical name
            from delta_spark.schema import max_field_id
            start = max(int(cfg.get("delta.columnMapping.maxColumnId", 0)),
                        max_field_id(table_schema))
            mapped_schema, max_id = assign_physical_names(
                table_schema, start_id=start, reuse_logical=False)
            if mapped_schema != table_schema:
                table_schema = mapped_schema
                m = actions[0] if actions and isinstance(actions[0], Metadata) else txn.metadata
                new_cfg = {**m.configuration,
                           "delta.columnMapping.maxColumnId": str(max_id)}
                new_meta = Metadata(
                    id=m.id, name=m.name, description=m.description, format=m.format,
                    schemaString=schema_to_json(mapped_schema), partitionColumns=part_cols,
                    configuration=new_cfg, createdTime=m.createdTime)
                if actions and isinstance(actions[0], Metadata):
                    actions[0] = new_meta
                else:
                    actions.insert(0, new_meta)
        # rename-out applies on CREATE too: creation-time mapping gets
        # engine-generated physical names, so logical != physical from
        # the very first file
        from delta_spark.schema import physical_projection
        l2p = logical_to_physical(table_schema)
        out_df = physical_projection(out_df, table_schema)
        write_part_cols = [l2p.get(c, c) for c in part_cols]

    if str(cfg.get("delta.autoOptimize.optimizeWrite", "false")).lower() == "true" \
            and write_part_cols:
        # optimized write (perf/DeltaOptimizedWriterExec.scala approx):
        # co-locate rows of one partition into one task so a write emits
        # one file per partition instead of one per task per partition
        out_df = out_df.repartition(*[F.col(c) for c in write_part_cols])

    from delta_spark.stats import indexed_cols_for

    indexed_cols = indexed_cols_for(table_schema, cfg, _num_indexed_cols(cfg))
    if indexed_cols is not None and column_mapping_mode(cfg) in ("name", "id"):
        indexed_cols = [l2p.get(c, c) for c in indexed_cols]
    adds = write_files(out_df, log.table_path, write_part_cols,
                       indexed_cols=indexed_cols,
                       num_indexed_cols=_num_indexed_cols(cfg),
                       data_change=data_change,
                       target_file_rows=max_records_per_file,
                       compression=compression,
                       shred_variant=str(cfg.get(
                           "delta.enableVariantShredding", "false")).lower() == "true",
                       materialize_partitions=str(cfg.get(
                           "delta.enableMaterializePartitionColumnsFeature",
                           "false")).lower() == "true")

    removes: list[RemoveFile] = []
    cdc_actions: list = []
    if mode == "overwrite" and exists:
        if replace_where:
            from delta_spark.commands.delete import cdf_enabled, delete_core

            cdf_on = cdf_enabled(cfg) and data_change
            removes, extra_adds, cdc_actions, _m = delete_core(
                spark, txn, replace_where, cfg, with_cdf=cdf_on)
            if not data_change:
                # rearrangement commits flip EVERY file action
                # (WriteIntoDelta rearrangeOnly) and never carry change
                # files — a stream must be able to skip the whole commit
                for a in removes:
                    a.dataChange = False
                for a in extra_adds:
                    a.dataChange = False
            adds += extra_adds
            if cdf_on:
                # the commit carries CDC files, so ALL its changes must
                # be in them: tag the newly-written rows as inserts
                # (copied rows of rewritten files are NOT changes)
                from delta_spark.writer import write_cdc_files

                cdc_actions = list(cdc_actions) + write_cdc_files(
                    out_df.withColumn("_change_type", F.lit("insert")),
                    log.table_path, txn.snapshot, already_physical=True)
        elif replace_on or replace_using:
            from delta_spark.commands.delete import cdf_enabled
            from delta_spark.commands.replace_on import (
                replace_on_core,
                replace_using_condition,
            )

            # match against the rows ACTUALLY INSERTED (out_df: after
            # defaults/generated/identity/null-fill), not the raw
            # query — a replaceUsing on a generated column must see the
            # computed values. Deterministic across the two scans: df
            # was checkpointed above, and the identity path checkpoints
            # out_df itself.
            source_for_replace = out_df
            cond = replace_on
            ta = target_alias
            if replace_using:
                ta = ta or "__tgt"
                cond = replace_using_condition(
                    list(replace_using),
                    [f.name for f in table_schema.fields],
                    source_for_replace.columns, ta)
            if not data_change:
                # replaceOn/Using DELETES data by definition — it can
                # never be a pure rearrangement
                raise DeltaWriteError(
                    "dataChange=false cannot be combined with "
                    "replaceOn/replaceUsing (the write removes rows)")
            cdf_on = cdf_enabled(cfg) and data_change
            removes, extra_adds, cdc_actions, _m = replace_on_core(
                spark, txn, source_for_replace, cond, ta, cfg,
                with_cdf=cdf_on)
            adds += extra_adds
            if cdf_on:
                from delta_spark.writer import write_cdc_files

                cdc_actions = list(cdc_actions) + write_cdc_files(
                    out_df.withColumn("_change_type", F.lit("insert")),
                    log.table_path, txn.snapshot, already_physical=True)
        elif partition_overwrite_mode.lower() == "dynamic":
            written_parts = {tuple(sorted(a.partitionValues.items())) for a in adds}
            for f in txn.snapshot.all_files:
                if tuple(sorted(f.partitionValues.items())) in written_parts:
                    removes.append(f.remove(data_change=data_change))
            txn.read_whole_table()
        else:
            removes = [f.remove(data_change=data_change)
                       for f in txn.snapshot.all_files]
            txn.read_whole_table()

    num_rows = sum(a.num_records or 0 for a in adds)
    metrics = {
        "numFiles": str(len(adds)),
        "numOutputRows": str(num_rows),
        "numOutputBytes": str(sum(a.size for a in adds)),
        "numRemovedFiles": str(len(removes)),
    }
    actions.extend(adds)
    actions.extend(removes)
    actions.extend(cdc_actions)
    if txn_app_id is not None and txn_version is not None:
        actions.append(SetTransaction(appId=txn_app_id, version=txn_version,
                                      lastUpdated=current_time_millis()))
    op = operation or ("CREATE TABLE AS SELECT" if not exists else "WRITE")
    params = {"mode": mode.capitalize(), "partitionBy": json.dumps(part_cols)}
    if replace_where:
        params["predicate"] = replace_where
    if replace_on:
        params["replaceOn"] = replace_on
    if replace_using:
        params["replaceUsing"] = json.dumps(list(replace_using))
    version = txn.commit(actions, op, params, metrics, user_metadata=user_metadata)
    _maybe_auto_compact(spark, log, cfg)
    return version


def _maybe_auto_compact(spark, log: DeltaLog, cfg: dict,
                        min_files: int = 16) -> None:
    """Post-commit auto compaction (hooks/AutoCompact.scala:117): when
    enabled and some partition accumulated > min_files small files, run
    a bounded compaction (half the normal target size, like the
    reference)."""
    if str(cfg.get("delta.autoOptimize.autoCompact", "false")).lower() != "true":
        return
    from delta_spark.commands.optimize import DEFAULT_MAX_FILE_SIZE, OptimizeBuilder

    snap = log.update()
    by_part: dict = {}
    small_cutoff = DEFAULT_MAX_FILE_SIZE // 8
    for f in snap.all_files:
        if f.size < small_cutoff:
            key = tuple(sorted(f.partitionValues.items()))
            by_part[key] = by_part.get(key, 0) + 1
    if any(n >= min_files for n in by_part.values()):
        try:
            OptimizeBuilder(spark, log).executeCompaction(
                max_file_size=DEFAULT_MAX_FILE_SIZE // 2)
        except Exception:
            pass  # best-effort, like the reference's hook

