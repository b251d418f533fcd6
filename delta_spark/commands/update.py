"""UPDATE t SET c = expr, ... WHERE p (reference
commands/UpdateCommand.scala:59,114,346).

Plan: stats/partition pruning → one job finding touched files → one job
rewriting ONLY those files with a per-column conditional projection
`CASE WHEN p THEN new_expr ELSE old END`. Rows not matching p are
copied verbatim; untouched files are untouched.

CDF emits update_preimage/update_postimage row pairs for matched rows
(UpdateCommand CDF path).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession, functions as F

from delta_spark.commands.delete import cdf_enabled, find_touched_files
from delta_spark.log import DeltaLog
from delta_spark.reader import read_files_df
from delta_spark.stats import DEFAULT_NUM_INDEXED_COLS
from delta_spark.transaction import OptimisticTransaction, dml_transaction
from delta_spark.writer import write_cdc_files, write_table_files


def execute_update(spark: SparkSession, log: DeltaLog, set_exprs: dict[str, str],
                   condition: Optional[str] = None) -> int:
    """set_exprs: {column: SQL expression} (UpdateExpressionsSupport —
    expressions may reference any table column)."""
    txn = dml_transaction(spark, log)
    snapshot = txn.snapshot
    cfg = snapshot.configuration
    num_indexed = int(cfg.get("delta.dataSkippingNumIndexedCols", DEFAULT_NUM_INDEXED_COLS))
    cond = condition if condition and condition.strip() else "true"

    schema_cols = [f.name for f in snapshot.schema.fields]
    bad = [c for c in set_exprs if c not in schema_cols]
    if bad:
        raise ValueError(f"SET targets not in table schema: {bad}")
    part_cols = set(snapshot.partition_columns)
    if part_cols & set(set_exprs):
        # reference also forbids updating partition columns via rewrite
        # shortcuts; support it by full-row rewrite (the projection below
        # handles it naturally since we re-partition on write)
        pass

    candidates = txn.files_for_scan(None if cond == "true" else cond)
    touched = find_touched_files(spark, snapshot, candidates, cond)
    txn.read_files.update(f.path for f in touched)
    if not touched:
        return txn.commit([], "UPDATE", {"predicate": cond}, {"numUpdatedRows": "0"})

    row_tracked = str(cfg.get("delta.enableRowTracking",
                              "false")).lower() == "true"
    if row_tracked:
        from delta_spark.reader import (
            materialized_row_commit_col,
            materialized_row_id_col,
            read_files_with_stable_ids,
        )

        touched_df = read_files_with_stable_ids(spark, snapshot, touched)
    else:
        touched_df = read_files_df(spark, snapshot, touched)
    cond_col = F.coalesce(F.expr(cond), F.lit(False))
    out_cols = [
        (F.when(cond_col, F.expr(set_exprs[c]).cast(touched_df.schema[c].dataType))
          .otherwise(F.col(c))).alias(c) if c in set_exprs else F.col(c)
        for c in schema_cols
    ]
    if row_tracked:
        # updated rows KEEP their stable row id but take the commit's
        # new row-commit-version (materialized column nulled → default)
        mat = materialized_row_id_col(snapshot)
        matv = materialized_row_commit_col(snapshot)
        if mat is not None:
            out_cols.append(touched_df[mat])
        if matv is not None:
            out_cols.append(
                F.when(cond_col, F.lit(None).cast("long"))
                .otherwise(touched_df[matv]).alias(matv))
    projected = touched_df.select(*out_cols)
    adds = write_table_files(projected, snapshot)
    removes = [f.remove() for f in touched]

    cdc = []
    if cdf_enabled(cfg):
        pre = touched_df.filter(cond_col).withColumn("_change_type", F.lit("update_preimage"))
        post = (touched_df.filter(cond_col)
                .select(*[(F.expr(set_exprs[c]).cast(touched_df.schema[c].dataType)).alias(c)
                          if c in set_exprs else F.col(c) for c in schema_cols])
                .withColumn("_change_type", F.lit("update_postimage")))
        cdc = write_cdc_files(pre.unionByName(post), snapshot.table_path)

    metrics = {
        "numRemovedFiles": str(len(removes)),
        "numAddedFiles": str(len(adds)),
    }
    params = {"predicate": cond}
    return txn.commit(list(adds) + list(removes) + list(cdc), "UPDATE", params, metrics)
