"""UPDATE t SET c = expr, ... WHERE p (reference
commands/UpdateCommand.scala:59,114,346).

Plan: stats/partition pruning → one job finding touched files → one job
rewriting ONLY those files with a per-column conditional projection
`CASE WHEN p THEN new_expr ELSE old END`. Rows not matching p are
copied verbatim; untouched files are untouched.

When `delta.enableDeletionVectors=true` the rewrite is replaced by the
DV path (UpdateCommand.scala:139 shouldWriteDeletionVectors): the
matched row positions are masked with deletion vectors in-place and
ONLY the post-update rows are written as new files — a 1-row update in
a 1 GB file costs KBs of DV plus one tiny file instead of a full
rewrite (the dominant UPDATE cost at scale).

CDF emits update_preimage/update_postimage row pairs for matched rows
(UpdateCommand CDF path).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession, functions as F

from pyspark.sql import types as T

from delta_spark.commands.delete import cdf_enabled, find_touched_files
from delta_spark.log import DeltaLog
from delta_spark.reader import read_files_df
from delta_spark.stats import DEFAULT_NUM_INDEXED_COLS
from delta_spark.transaction import OptimisticTransaction, dml_transaction
from delta_spark.writer import write_cdc_files, write_table_files


def _split_ident(k: str) -> list[str]:
    """Split a SET target on dots OUTSIDE backticks; unquote parts
    (`a b`.`c` → ['a b', 'c'])."""
    parts, cur, i, inq = [], "", 0, False
    while i < len(k):
        ch = k[i]
        if ch == "`":
            if inq and i + 1 < len(k) and k[i + 1] == "`":
                cur += "`"
                i += 2
                continue
            inq = not inq
            i += 1
            continue
        if ch == "." and not inq:
            parts.append(cur)
            cur = ""
            i += 1
            continue
        cur += ch
        i += 1
    parts.append(cur)
    return [p.strip() for p in parts]


def apply_generated_after_update(df: DataFrame, schema: T.StructType,
                                 upd: dict) -> DataFrame:
    """Post-update generated-column pass (UpdateExpressionsSupport:478:
    a generated column with no user expression is RECOMPUTED from the
    generation expression over the post-update row; recomputation on
    unchanged rows is an identity, so it applies uniformly). Explicitly
    assigned generated columns are validated against the expression,
    like the batch-write seam (constraints.apply_generated_columns)."""
    from delta_spark.schema import generation_expressions

    gens = generation_expressions(schema)
    if not gens:
        return df
    regen = {g: e for g, e in gens.items() if g not in upd}
    if regen:
        df = df.select(*[
            F.expr(regen[c]).cast(df.schema[c].dataType).alias(c)
            if c in regen else F.col(c)
            for c in df.columns])
    for g, e in gens.items():
        if g in upd:
            df = df.filter(
                F.when(~F.col(g).eqNullSafe(F.expr(e)),
                       F.raise_error(F.lit(
                           f"Updated value for generated column {g} does "
                           f"not match generation expression {e}"))
                       .cast("boolean"))
                .otherwise(F.lit(True)))
    return df


def resolve_set_exprs(set_exprs: dict[str, str],
                      schema: T.StructType) -> dict:
    """{SET target: SQL expr} → ({top-level column: new-value Column},
    {column: equivalent SQL text} or None when any target is a nested
    struct field — withField has no plain-SQL spelling). The SQL map
    feeds the one-string selectExpr projection in execute_update (same
    driver-overhead rationale as merge._value_column_sql).
    Targets resolve like Spark identifiers — optionally backquoted,
    case-insensitive — and dotted paths update ONE struct field in
    place, preserving its siblings (UpdateExpressionsSupport
    generateUpdateExpressions). Values are cast to the target field's
    declared type, matching the rewrite projection's old behavior."""
    assigns: dict[str, list] = {}
    by_fold = {f.name.lower(): f for f in schema.fields}
    for k, v in set_exprs.items():
        parts = _split_ident(k)
        f = by_fold.get(parts[0].lower())
        if f is None:
            raise ValueError(f"SET targets not in table schema: [{k!r}]")
        path, dt = [], f.dataType
        for p in parts[1:]:
            if not isinstance(dt, T.StructType):
                raise ValueError(
                    f"SET target {k!r}: {'.'.join([f.name] + path)} "
                    "is not a struct")
            nf = {x.name.lower(): x for x in dt.fields}.get(p.lower())
            if nf is None:
                raise ValueError(f"SET targets not in table schema: [{k!r}]")
            path.append(nf.name)
            dt = nf.dataType
        assigns.setdefault(f.name, []).append((tuple(path), v, dt))
    from delta_spark.schema import relax_nullability

    out = {}
    out_sql: dict[str, str] | None = {}
    for col, lst in assigns.items():
        whole = [a for a in lst if not a[0]]
        if whole and len(lst) > 1:
            raise ValueError(f"conflicting SET assignments to column {col!r}")
        if whole:
            out[col] = F.expr(whole[0][1]).cast(relax_nullability(whole[0][2]))
            if out_sql is not None:
                out_sql[col] = (f"CAST(({whole[0][1]}) AS "
                                f"{relax_nullability(whole[0][2]).simpleString()})")
            continue
        out_sql = None  # nested struct SET: withField has no SQL spelling
        seen: list = []
        e = F.col(col)
        for path, sql, dt in lst:
            # overlapping paths (equal OR prefix-nested, e.g. s.a and
            # s.a.b) are order-dependent last-wins — reject instead
            for prev in seen:
                n = min(len(prev), len(path))
                if prev[:n] == path[:n]:
                    raise ValueError(
                        f"conflicting SET assignments to column {col!r} "
                        f"fields {'.'.join(prev)} and {'.'.join(path)}")
            seen.append(path)
            e = e.withField(".".join(f"`{p}`" for p in path),
                            F.expr(sql).cast(relax_nullability(dt)))
        out[col] = e
    return out, out_sql


def execute_update(spark: SparkSession, log: DeltaLog, set_exprs: dict[str, str],
                   condition: Optional[str] = None) -> int:
    """set_exprs: {column: SQL expression} (UpdateExpressionsSupport —
    expressions may reference any table column)."""
    from delta_spark.predicates import reject_subquery

    reject_subquery(condition, "UPDATE")
    from delta_spark.transaction import resolve_idempotent_txn

    app, ver = resolve_idempotent_txn(spark)
    txn = dml_transaction(spark, log)
    if app is not None:
        last = txn.txn_version(app)
        if last is not None and last >= ver:
            return None  # replayed idempotent DML
        from delta_spark.actions import SetTransaction
        from delta_spark.util import current_time_millis

        txn._pending_set_transaction = SetTransaction(
            app, ver, current_time_millis())
    snapshot = txn.snapshot
    cfg = snapshot.configuration
    num_indexed = int(cfg.get("delta.dataSkippingNumIndexedCols", DEFAULT_NUM_INDEXED_COLS))
    cond = condition if condition and condition.strip() else "true"

    schema_cols = [f.name for f in snapshot.schema.fields]
    upd, upd_sqls = resolve_set_exprs(set_exprs, snapshot.schema)
    from delta_spark.schema import identity_info

    for c in set(upd) & set(identity_info(snapshot.schema)):
        # DeltaErrors.identityColumnUpdateNotSupported (:3069)
        raise ValueError(f"UPDATE on IDENTITY column {c!r} is not supported")
    part_cols = set(snapshot.partition_columns)
    if part_cols & set(upd):
        # reference also forbids updating partition columns via rewrite
        # shortcuts; support it by full-row rewrite (the projection below
        # handles it naturally since we re-partition on write)
        pass

    candidates = txn.files_for_scan(None if cond == "true" else cond)
    if str(cfg.get("delta.enableDeletionVectors", "false")).lower() == "true":
        return _dv_update(spark, txn, upd, cond, cfg, schema_cols,
                          candidates)
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
    mat = matv = None
    if row_tracked:
        # updated rows KEEP their stable row id but take the commit's
        # new row-commit-version (materialized column nulled → default)
        mat = materialized_row_id_col(snapshot)
        matv = materialized_row_commit_col(snapshot)
    selected = None
    if upd_sqls is not None:
        # one-string fast path: the whole rewrite projection as ONE
        # selectExpr call — text-identical CASE/CAST semantics to the
        # Column chain below, minus ~5 py4j round trips per column of
        # driver time (matters on wide tables; merge._value_column_sql
        # is the same trade). Falls through on any DDL type text the
        # parser rejects.
        def bq(name: str) -> str:
            return "`" + name.replace("`", "``") + "`"

        cond_sql = f"COALESCE(({cond}), FALSE)"
        texts = [
            (f"CASE WHEN {cond_sql} THEN {upd_sqls[c]} "
             f"ELSE {bq(c)} END AS {bq(c)}") if c in upd_sqls else bq(c)
            for c in schema_cols
        ]
        if mat is not None:
            texts.append(bq(mat))
        if matv is not None:
            texts.append(f"CASE WHEN {cond_sql} THEN CAST(NULL AS BIGINT) "
                         f"ELSE {bq(matv)} END AS {bq(matv)}")
        try:
            selected = touched_df.selectExpr(*texts)
        except Exception:
            selected = None
    if selected is None:
        out_cols = [
            (F.when(cond_col, upd[c])
              .otherwise(F.col(c))).alias(c) if c in upd else F.col(c)
            for c in schema_cols
        ]
        if mat is not None:
            out_cols.append(touched_df[mat])
        if matv is not None:
            out_cols.append(
                F.when(cond_col, F.lit(None).cast("long"))
                .otherwise(touched_df[matv]).alias(matv))
        selected = touched_df.select(*out_cols)
    projected = apply_generated_after_update(
        selected, snapshot.schema, upd)
    adds = write_table_files(projected, snapshot)
    removes = [f.remove() for f in touched]

    cdc = []
    if cdf_enabled(cfg):
        pre = touched_df.filter(cond_col).withColumn("_change_type", F.lit("update_preimage"))
        post = (apply_generated_after_update(
                    touched_df.filter(cond_col)
                    .select(*[upd[c].alias(c)
                              if c in upd else F.col(c) for c in schema_cols]),
                    snapshot.schema, upd)
                .withColumn("_change_type", F.lit("update_postimage")))
        cdc = write_cdc_files(pre.unionByName(post), snapshot.table_path, snapshot)

    metrics = {
        "numRemovedFiles": str(len(removes)),
        "numAddedFiles": str(len(adds)),
    }
    params = {"predicate": cond}
    return txn.commit(list(adds) + list(removes) + list(cdc), "UPDATE", params, metrics)


def _dv_update(spark: SparkSession, log_txn, upd: dict,
               cond: str, cfg: dict, schema_cols: list[str],
               candidates) -> int:
    """Deletion-vector UPDATE (UpdateCommand.scala:139): mask the
    matched row positions with DVs and write ONLY the updated rows as
    new files. Touched files keep their bytes; fully-updated files
    become plain removes (their rows all land in the new files). The
    matched-row scan is persisted so the DV job, the new-file write,
    and the CDF write share one pass over the candidates."""
    from delta_spark.commands.delete import mask_rows_with_dvs
    from delta_spark.reader import (
        _base_row_id_expr,
        materialized_row_commit_col,
        materialized_row_id_col,
        read_files_with_index,
    )

    txn = log_txn
    snapshot = txn.snapshot
    if not candidates:
        return txn.commit([], "UPDATE", {"predicate": cond},
                          {"numUpdatedRows": "0"})
    row_tracked = str(cfg.get("delta.enableRowTracking",
                              "false")).lower() == "true"
    visible = read_files_with_index(spark, snapshot, candidates,
                                    request_materialized_row_id=row_tracked)
    cond_col = F.coalesce(F.expr(cond), F.lit(False))
    matched = visible.filter(cond_col).persist()
    try:
        positions = matched.select(F.col("__file_base").alias("file_base"),
                                   F.col("__row_idx").alias("row_index"))
        dv_adds, removes, updated_rows = mask_rows_with_dvs(
            spark, txn, candidates, positions)
        if updated_rows == 0 and not removes:
            return txn.commit([], "UPDATE", {"predicate": cond},
                              {"numUpdatedRows": "0"})

        out_cols = [
            upd[c].alias(c) if c in upd else F.col(c)
            for c in schema_cols
        ]
        if row_tracked:
            # updated rows KEEP their stable id (materialized value,
            # else default baseRowId+position) and take the new
            # commit's row-commit-version (null → default)
            mat = materialized_row_id_col(snapshot)
            matv = materialized_row_commit_col(snapshot)
            if mat is not None:
                base = _base_row_id_expr(snapshot, candidates,
                                         "__file_base", "__row_idx")
                out_cols.append(F.coalesce(matched[mat], base).alias(mat))
            if matv is not None:
                out_cols.append(F.lit(None).cast("long").alias(matv))
        new_adds = write_table_files(
            apply_generated_after_update(matched.select(*out_cols),
                                         snapshot.schema, upd), snapshot)

        cdc = []
        if cdf_enabled(cfg):
            pre = (matched.select(*schema_cols)
                   .withColumn("_change_type", F.lit("update_preimage")))
            post = (apply_generated_after_update(
                        matched.select(*[upd[c].alias(c)
                                         if c in upd else F.col(c)
                                         for c in schema_cols]),
                        snapshot.schema, upd)
                    .withColumn("_change_type", F.lit("update_postimage")))
            cdc = write_cdc_files(pre.unionByName(post), snapshot.table_path, snapshot)
    finally:
        matched.unpersist()

    metrics = {
        "numRemovedFiles": str(len(removes)),
        "numDeletionVectorsAdded": str(len(dv_adds)),
        "numAddedFiles": str(len(new_adds)),
        "numUpdatedRows": str(updated_rows),
    }
    return txn.commit(list(dv_adds) + list(new_adds) + list(removes) + list(cdc),
                      "UPDATE", {"predicate": cond}, metrics)
