"""INSERT-with-replacement writes: ``replaceOn`` / ``replaceUsing``
(reference WriteIntoDelta.scala:239 replaceOnOrUsingExprOpt,
DeltaInsertReplaceOnOrUsingCommand.scala, DeltaOptions REPLACE_ON_OPTION
/ REPLACE_USING_OPTION / TARGET_ALIAS_OPTION).

An overwrite that deletes EXACTLY the target rows matching ANY inserted
row (EXISTS semantics over a join condition between the table and the
new data) and appends all new rows — one atomic commit. Unlike MERGE,
every source row is inserted and duplicate source matches are fine (no
cardinality restriction); unlike replaceWhere, the replacement set is
defined by the DATA, not a static predicate.

Scale shape: phase 1 is a distributed left-semi join collecting only
DISTINCT FILE NAMES (bounded by file count, never rows); phase 2
rewrites only the touched files with a left-anti join. Untouched files
are never read. The source is scanned twice, so callers materialize it
first (InsertReplaceOnMaterializeSource role).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from delta_spark.actions import AddFile, RemoveFile
from delta_spark.commands.delete import match_files_by_name
from delta_spark.reader import read_files_df, read_files_with_index
from delta_spark.transaction import OptimisticTransaction
from delta_spark.writer import write_cdc_files, write_table_files

SOURCE_ALIAS = "__src"


def replace_using_condition(using_cols: list[str], table_cols: list[str],
                            source_cols: list[str],
                            target_alias: str) -> str:
    """Equality conjunction for ``replaceUsing`` — every listed column
    must exist in BOTH the table and the inserted data
    (DeltaInsertReplaceOnOrUsingCommand InsertReplaceUsing)."""
    tset = {c.lower() for c in table_cols}
    sset = {c.lower() for c in source_cols}
    missing = [c for c in using_cols
               if c.lower() not in tset or c.lower() not in sset]
    if missing:
        raise ValueError(
            f"replaceUsing columns {missing} must exist in both the "
            f"table and the inserted data")
    return " AND ".join(
        f"{target_alias}.`{c}` = {SOURCE_ALIAS}.`{c}`" for c in using_cols)


def replace_on_core(spark: SparkSession, txn: OptimisticTransaction,
                    source: DataFrame, condition: str,
                    target_alias: Optional[str], cfg: dict,
                    with_cdf: bool,
                    ) -> tuple[list[RemoveFile], list[AddFile], list, dict]:
    """Delete target rows with a source match under `condition`;
    returns (removes, survivor-adds, cdc, metrics). The caller writes
    the new data's AddFiles into the SAME commit."""
    snapshot = txn.snapshot
    # the replacement set depends on a join, not a static predicate —
    # conservatively conflicts with any concurrent change
    txn.read_whole_table()
    candidates = snapshot.all_files
    ta = target_alias or "__tgt"

    tgt_all = (read_files_with_index(spark, snapshot, candidates)
               .withColumnRenamed("__file_base", "__delta_file")
               .drop("__row_idx"))
    touched_names = [
        r["__delta_file"] for r in
        (tgt_all.alias(ta)
         .join(source.alias(SOURCE_ALIAS), F.expr(condition), "left_semi")
         .select("__delta_file").distinct().collect())]
    touched = match_files_by_name(candidates, touched_names,
                                  snapshot.table_path)
    txn.read_files.update(f.path for f in touched)
    if not touched:
        return [], [], [], {"numRemovedFiles": "0", "numAddedFiles": "0"}

    if str(cfg.get("delta.enableRowTracking", "false")).lower() == "true":
        # survivors are unmodified rows: stable ids ride along
        from delta_spark.reader import read_files_with_stable_ids

        touched_df = read_files_with_stable_ids(spark, snapshot, touched)
    else:
        touched_df = read_files_df(spark, snapshot, touched)
    keep_df = (touched_df.alias(ta)
               .join(source.alias(SOURCE_ALIAS), F.expr(condition),
                     "left_anti"))
    adds = write_table_files(keep_df, snapshot)
    removes = [f.remove() for f in touched]
    cdc: list = []
    if with_cdf:
        deleted_df = (touched_df.alias(ta)
                      .join(source.alias(SOURCE_ALIAS), F.expr(condition),
                            "left_semi")
                      .select(*[f.name for f in snapshot.schema.fields])
                      .withColumn("_change_type", F.lit("delete")))
        cdc = write_cdc_files(deleted_df, snapshot.table_path, snapshot)
    kept = sum(a.num_records or 0 for a in adds)
    was = sum(f.num_records or 0 for f in touched)
    metrics = {"numRemovedFiles": str(len(removes)),
               "numAddedFiles": str(len(adds)),
               "numDeletedRows": str(max(was - kept, 0))}
    return removes, adds, cdc, metrics
