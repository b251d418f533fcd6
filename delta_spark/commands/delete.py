"""DELETE FROM t WHERE p (reference commands/DeleteCommand.scala).

Three execution cases, cheapest first:
  1. no condition → drop every active file (metadata-only truncate)
  2. partition-only predicate → drop whole files whose partition values
     make the predicate provably TRUE (metadata-only, no data job)
  3. general predicate → (a) stats/partition pruning narrows candidate
     files, (b) one distributed job finds files with ≥1 matching row
     (input_file_name aggregation, same trick as
     ClassicMergeExecutor.findTouchedFiles), (c) one distributed job
     rewrites ONLY those files keeping rows where the predicate is not
     TRUE. Untouched files are never read or written.

CDF: when delta.enableChangeDataFeed=true, the matching rows are also
written under _change_data/ with _change_type='delete'
(commands/cdc/CDCReader.scala write-side contract).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import SparkSession, functions as F

from delta_spark import predicates as P
from delta_spark.actions import AddFile, RemoveFile
from delta_spark.log import DeltaLog
from delta_spark.reader import read_files_df
from delta_spark.stats import DEFAULT_NUM_INDEXED_COLS
from delta_spark.transaction import OptimisticTransaction, dml_transaction
from delta_spark.writer import write_cdc_files, write_table_files


def cdf_enabled(cfg: dict) -> bool:
    return str(cfg.get("delta.enableChangeDataFeed", "false")).lower() == "true"


def match_files_by_name(files: list[AddFile], spark_file_uris: list[str],
                        table_path: str = "") -> list[AddFile]:
    """Map input_file_name() URIs back to AddFiles by FULL normalized
    path. (Basenames are NOT unique: a partitioned write emits the same
    part-00000-<uuid> name into every partition directory.)"""
    import urllib.parse

    def norm(p: str) -> str:
        p = urllib.parse.unquote(p)
        if p.startswith("file:"):
            p = p[len("file:"):]
        while p.startswith("//"):
            p = p[1:]
        return os.path.normpath(p)

    from delta_spark.util import resolve_log_path

    by_path: dict[str, AddFile] = {}
    for f in files:
        by_path[norm(resolve_log_path(table_path, f.path))] = f
    out = []
    for uri in spark_file_uris:
        f = by_path.get(norm(uri))
        if f is not None:
            out.append(f)
    return out


def find_touched_files(spark: SparkSession, snapshot, candidates: list[AddFile],
                       condition: str) -> list[AddFile]:
    """Distributed scan for files containing ≥1 row matching the
    condition. Only file names travel back to the driver. File keys are
    captured BEFORE any DV anti-join (input_file_name() cannot be
    applied after a join — multiple sources)."""
    from delta_spark.reader import read_files_with_index

    if not candidates:
        return []
    df = read_files_with_index(spark, snapshot, candidates)
    touched = (df.filter(condition)
                 .select(F.col("__file_base").alias("f"))
                 .distinct()
                 .collect())
    return match_files_by_name(candidates, [r["f"] for r in touched], snapshot.table_path)


def delete_core(spark: SparkSession, txn: OptimisticTransaction,
                condition: Optional[str], cfg: dict, with_cdf: bool,
                ) -> tuple[list[RemoveFile], list[AddFile], list, dict]:
    snapshot = txn.snapshot
    part_cols = set(snapshot.partition_columns)
    num_indexed = int(cfg.get("delta.dataSkippingNumIndexedCols", DEFAULT_NUM_INDEXED_COLS))

    # case 1: full truncate
    if condition is None or condition.strip() == "" or condition.strip().lower() == "true":
        txn.read_whole_table()
        removes = [f.remove() for f in snapshot.all_files]
        metrics = {"numRemovedFiles": str(len(removes))}
        cdc = []
        if with_cdf and removes:
            all_df = read_files_df(spark, snapshot).withColumn("_change_type", F.lit("delete"))
            cdc = write_cdc_files(all_df, snapshot.table_path, snapshot)
        return removes, [], cdc, metrics

    # case 2: metadata-only partition delete
    ast = None
    try:
        ast = P.parse_predicate(condition)
    except P.UnsupportedPredicate:
        pass
    if ast is not None and P.references(ast) and P.references(ast) <= part_cols:
        txn.read_predicates.append(condition)
        removes = []
        kept_files = []
        for f in snapshot.all_files:
            r = P.eval_partition(ast, snapshot.typed_partition_values(f))
            if r is True:
                removes.append(f.remove())
                txn.read_files.add(f.path)
        cdc = []
        if with_cdf and removes:
            from delta_spark.util import canonical_log_path as _ckey

            victims = [snapshot.active[_ckey(r.path)] for r in removes]
            df = read_files_df(spark, snapshot, victims).withColumn("_change_type", F.lit("delete"))
            cdc = write_cdc_files(df, snapshot.table_path, snapshot)
        metrics = {"numRemovedFiles": str(len(removes))}
        return removes, [], cdc, metrics

    # case 3a: deletion-vector write (delta.enableDeletionVectors=true):
    # mark rows deleted WITHOUT rewriting the parquet files
    if str(cfg.get("delta.enableDeletionVectors", "false")).lower() == "true":
        return _dv_delete(spark, txn, condition, with_cdf)

    # case 3: scan + rewrite
    candidates = txn.files_for_scan(condition)
    touched = find_touched_files(spark, snapshot, candidates, condition)
    txn.read_files.update(f.path for f in touched)
    if not touched:
        return [], [], [], {"numRemovedFiles": "0", "numAddedFiles": "0"}
    if str(cfg.get("delta.enableRowTracking", "false")).lower() == "true":
        # survivors are UNMODIFIED rows: both stable id and commit
        # version ride along into the rewritten files
        from delta_spark.reader import read_files_with_stable_ids

        touched_df = read_files_with_stable_ids(spark, snapshot, touched)
    else:
        touched_df = read_files_df(spark, snapshot, touched)
    keep_df = touched_df.filter(~F.coalesce(F.expr(condition), F.lit(False)))
    adds = write_table_files(keep_df, snapshot)
    removes = [f.remove() for f in touched]
    cdc = []
    if with_cdf:
        deleted_df = (touched_df
                      .select(*[f.name for f in snapshot.schema.fields])
                      .filter(condition)
                      .withColumn("_change_type", F.lit("delete")))
        cdc = write_cdc_files(deleted_df, snapshot.table_path, snapshot)
    removed_rows = sum(f.num_records or 0 for f in touched)
    copied_rows = sum(a.num_records or 0 for a in adds)
    metrics = {
        "numRemovedFiles": str(len(removes)),
        "numAddedFiles": str(len(adds)),
        "numCopiedRows": str(copied_rows),
        "numDeletedRows": str(max(removed_rows - copied_rows, 0)),
    }
    return removes, adds, cdc, metrics


def mask_rows_with_dvs(spark: SparkSession, txn: OptimisticTransaction,
                       candidates: list[AddFile], matched):
    """Shared DV-DML core (DMLWithDeletionVectorsHelper.scala roles
    findTouchedFiles + processUnmodifiedData): given the (file_base,
    row_index) DataFrame of rows to mask, union each file's previous
    DV (older sets stay subsets — the read path relies on this), write
    the new sets, and return the `(adds, removes, newly_masked)`
    retargeting actions — DV-carrying re-adds for partially-masked
    files, plain removes for fully-masked ones. DELETE commits these
    as-is; UPDATE additionally writes the post-update rows as new
    files (UpdateCommand.scala:139)."""
    import uuid

    snapshot = txn.snapshot
    # union with existing DV rows of candidate files (per-file subsets)
    from delta_spark.reader import deleted_rows_df, file_key_of

    # Default is the PROTOCOL-conformant RoaringBitmapArray 'u' encoding
    # (PROTOCOL.md: valid storageTypes are u/i/p) so external readers
    # can consume the table. The legacy parquet-sidecar 'q' encoding is
    # opt-OUT only (delta_spark.dv.portable=false) and declares a
    # non-standard feature instead of deletionVectors (fail-closed for
    # foreign readers rather than misread).
    portable = str(snapshot.configuration.get(
        "delta_spark.dv.portable", "true")).lower() != "false"
    old_rows = deleted_rows_df(
        spark, snapshot, [f for f in candidates if f.deletionVector])
    all_rows = matched
    if old_rows is not None:
        all_rows = all_rows.unionByName(old_rows)
        if not portable:
            # the sidecar parquet and its count() aggregation see raw
            # rows — dedupe before both. The portable path instead
            # dedupes for free inside the per-file bitmap (np.unique),
            # skipping this extra exchange on repeat DV DML.
            all_rows = all_rows.distinct()
    desc_by_base: dict[str, dict] = {}
    if portable:
        # protocol RoaringBitmapArray format: each file's bitmap is
        # serialized executor-side (applyInPandas — only the compact
        # roaring blobs, not row indexes, cross to the driver), then
        # assembled into one deletion_vector_<uuid>.bin
        # (DeletionVectorStore.scala:217 layout).
        from delta_spark import dv as _dv

        def _ser(pdf):
            import numpy as _np
            import pandas as _pd

            from delta_spark.dv import serialize_rbm_array

            # unique BEFORE counting: the input may carry (matched ∪
            # previous-DV) overlaps — the bitmap is a set either way,
            # and cardinality/max must describe the set, not the rows
            uniq = _np.unique(pdf["row_index"].to_numpy())
            return _pd.DataFrame({
                "file_base": [pdf["file_base"].iloc[0]],
                "data": [serialize_rbm_array(uniq)],
                "cardinality": [len(uniq)],
                "max_row_index": [int(uniq[-1])]})

        blobs = (all_rows.groupBy("file_base")
                 .applyInPandas(_ser, "file_base string, data binary, "
                                      "cardinality long, max_row_index long")
                 .collect())
        if not blobs:
            return [], [], 0  # nothing to mask — don't write an empty DV file
        uid = uuid.uuid4()
        path = os.path.join(snapshot.table_path, _dv.dv_file_name(uid))
        ranges = _dv.write_dv_file(path, [r["data"] for r in blobs])
        counts = {}
        max_row_idx = {}
        for r, (off, size, _) in zip(blobs, ranges):
            counts[r["file_base"]] = r["cardinality"]
            max_row_idx[r["file_base"]] = r["max_row_index"]
            desc_by_base[r["file_base"]] = {
                "storageType": "u", "pathOrInlineDv": _dv.encode_uuid(uid),
                "offset": off, "sizeInBytes": size,
                "cardinality": int(r["cardinality"])}
    else:
        dv_rel = f"_deletion_vectors/dv_{uuid.uuid4().hex}"
        dv_abs = os.path.join(snapshot.table_path, dv_rel)
        all_rows.write.mode("overwrite").parquet(dv_abs)
        agg = (spark.read.parquet(dv_abs)
               .groupBy("file_base")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.max("row_index").alias("mri"))
               .collect())
        counts = {r["file_base"]: r["n"] for r in agg}
        max_row_idx = {r["file_base"]: r["mri"] for r in agg}

    adds: list[AddFile] = []
    removes: list[RemoveFile] = []
    deleted_rows = 0
    for f in candidates:
        base = file_key_of(snapshot.table_path, f)
        if base not in counts:
            continue
        card = counts[base]
        newly = card - f.dv_cardinality  # previous DV is a subset
        deleted_rows += max(newly, 0)
        if newly <= 0:
            continue  # no new deletions in this file
        txn.read_files.add(f.path)
        total = f.num_records
        # maxRowIndex validation (actions.scala:956-963): a DV row index
        # beyond the file's physical record count means the DV is
        # corrupt — fail the command, never commit it.  maxRowIndex is
        # transient and never serialized into the descriptor.
        mri = max_row_idx.get(base)
        if total is not None and mri is not None and mri + 1 > total:
            raise ValueError(
                f"deletion vector for {f.path} contains invalid row index "
                f"{mri} (file has {total} rows)")
        if total is not None and card >= total:
            removes.append(f.remove())  # fully deleted
            continue
        descriptor = desc_by_base[base] if portable else {
            "storageType": "q", "pathOrInlineDv": dv_rel,
            "cardinality": int(card)}
        # protocol: a DV update is remove(path, oldDvId) + add(path,
        # newDvId) — the tombstone retires the file's previous logical
        # incarnation (PROTOCOL.md Action Reconciliation; reference
        # DMLWithDeletionVectorsHelper.processUnmodifiedData). Without
        # it, streams mistake the commit for a blind append and
        # incremental checksums double-count the path.
        removes.append(f.remove())
        # the carried-over stats become WIDE bounds under a DV
        # (PROTOCOL.md stats.tightBounds; reference
        # DMLWithDeletionVectorsHelper updates the flag): min/max stay
        # sound for skipping, numRecords stays the physical count
        stats = f.stats
        if stats:
            try:
                d = json.loads(stats)
                if d.get("tightBounds", True):
                    d["tightBounds"] = False
                    stats = json.dumps(d)
            except (ValueError, TypeError):
                pass
        adds.append(AddFile(
            path=f.path, partitionValues=f.partitionValues, size=f.size,
            modificationTime=f.modificationTime, dataChange=True, stats=stats,
            deletionVector=descriptor,
            # the data file is unchanged — surviving rows keep their
            # row-tracking identity (a fresh baseRowId here would
            # silently renumber every remaining row)
            baseRowId=f.baseRowId,
            defaultRowCommitVersion=f.defaultRowCommitVersion,
            tags=f.tags, clusteringProvider=f.clusteringProvider))
    return adds, removes, deleted_rows


def _dv_delete(spark: SparkSession, txn: OptimisticTransaction, condition: str,
               with_cdf: bool):
    """Deletion-vector DELETE (commands/DMLWithDeletionVectorsHelper.scala):
    one job finds touched files + writes the (file, row_index) sets of
    the newly-deleted rows; touched AddFiles are re-committed with a DV
    descriptor pointing at the set. Fully-deleted files become plain
    removes. No data file is rewritten."""
    from delta_spark.reader import read_files_with_index

    snapshot = txn.snapshot
    candidates = txn.files_for_scan(condition)
    if not candidates:
        return [], [], [], {"numRemovedFiles": "0"}
    visible = read_files_with_index(spark, snapshot, candidates)
    matched = (visible.filter(condition)
               .select(F.col("__file_base").alias("file_base"),
                       F.col("__row_idx").alias("row_index")))
    adds, removes, deleted_rows = mask_rows_with_dvs(spark, txn, candidates, matched)

    cdc = []
    if with_cdf:
        schema_cols = [fl.name for fl in snapshot.schema.fields]
        deleted_df = (visible.filter(condition).select(*schema_cols)
                      .withColumn("_change_type", F.lit("delete")))
        cdc = write_cdc_files(deleted_df, snapshot.table_path, snapshot)
    metrics = {
        "numRemovedFiles": str(len(removes)),
        "numDeletionVectorsAdded": str(len(adds)),
        "numDeletedRows": str(deleted_rows),
    }
    return removes, adds, cdc, metrics


def purge_deletion_vectors(spark: SparkSession, log: DeltaLog) -> dict:
    """REORG TABLE ... APPLY (PURGE) (commands/DeltaReorgTableCommand.scala):
    rewrite DV-carrying files into plain files."""
    from delta_spark.reader import read_files_with_index
    from delta_spark.writer import write_table_files

    txn = OptimisticTransaction(log)
    snapshot = txn.snapshot
    from delta_spark import catalog_managed as CM

    CM.check_maintenance_allowed(snapshot.configuration,
                                 snapshot.protocol, "REORG PURGE")
    dv_files = [f for f in snapshot.all_files if f.deletionVector]
    if not dv_files:
        return {"numRewrittenFiles": "0"}
    if str(snapshot.configuration.get(
            "delta.enableRowTracking", "false")).lower() == "true":
        # dataChange=false rewrite: stable row ids ride along
        from delta_spark.reader import read_files_with_stable_ids

        visible = read_files_with_stable_ids(spark, snapshot, dv_files)
    else:
        visible = read_files_with_index(spark, snapshot, dv_files) \
            .drop("__file_base", "__row_idx")
    adds = write_table_files(visible, snapshot, data_change=False)
    removes = [f.remove(data_change=False) for f in dv_files]
    txn.read_files.update(f.path for f in dv_files)
    metrics = {"numRewrittenFiles": str(len(removes)), "numAddedFiles": str(len(adds))}
    txn.commit(list(adds) + list(removes), "REORG", {"applyPurge": "true"}, metrics)
    return metrics


def execute_delete(spark: SparkSession, log: DeltaLog, condition: Optional[str],
                   txn_app_id: Optional[str] = None,
                   txn_version: Optional[int] = None) -> Optional[int]:
    from delta_spark.predicates import reject_subquery

    reject_subquery(condition, "DELETE")
    from delta_spark.transaction import resolve_idempotent_txn

    txn_app_id, txn_version = resolve_idempotent_txn(
        spark, txn_app_id, txn_version)
    txn = dml_transaction(spark, log)
    if txn_app_id is not None and txn_version is not None:
        last = txn.txn_version(txn_app_id)
        if last is not None and last >= txn_version:
            return None  # replayed idempotent DML (DeltaOptions txn opts)
    cfg = txn.snapshot.configuration
    removes, adds, cdc, metrics = delete_core(spark, txn, condition, cfg, with_cdf=cdf_enabled(cfg))
    params = {"predicate": json.dumps([condition] if condition else [])}
    extra = []
    if txn_app_id is not None and txn_version is not None:
        from delta_spark.actions import SetTransaction
        from delta_spark.util import current_time_millis

        extra.append(SetTransaction(txn_app_id, txn_version, current_time_millis()))
    return txn.commit(list(adds) + list(removes) + list(cdc) + extra, "DELETE", params, metrics)
