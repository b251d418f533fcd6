"""Named-table catalog: `DeltaTable.forName` / `saveAsTable` / named SQL.

Reference surface: python/delta/tables.py:404 (`DeltaTable.forName`),
catalog/AbstractDeltaCatalog.scala:81 (`createDeltaTable` — derives the
table location from the warehouse when none is given, hands the write
off to the path-based machinery), DeltaAnalysis.scala:1180 (resolution
of delta identifiers to their table files).

A metastore is, for delta's purposes, a durable map
qualified-name -> table location; everything else stays path-based.
Here that map is a JSON file under the Spark SQL warehouse directory
(`spark.sql.warehouse.dir`), written atomically (tmp + rename) and
re-read on every resolution, so separate processes sharing a warehouse
see each other's tables — the observable behavior a filesystem-backed
metastore gives a single-warehouse deployment. Managed tables (no
explicit location) live at `<warehouse>/<db>.db/<table>`
(`<warehouse>/<table>` for the default database), mirroring the Hive
layout.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from typing import Optional
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

CATALOG_FILE = "_delta_catalog.json"

_IDENT = r"[A-Za-z_][\w]*"


def warehouse_dir(spark: SparkSession) -> str:
    w = os.environ.get("DELTA_SPARK_WAREHOUSE")
    if not w:
        try:
            w = spark.conf.get("spark.sql.warehouse.dir")
        except Exception:
            w = None
    w = w or os.path.join(os.getcwd(), "spark-warehouse")
    u = urlparse(w)
    if u.scheme == "file":
        w = u.path
    return w


def qualify(name: str) -> tuple[str, str]:
    """'t' -> ('default','t'); 'db.t' -> ('db','t'); backticks stripped;
    lowercased (SQL identifiers are case-insensitive unquoted)."""
    parts = [p.strip("`").lower() for p in name.strip().split(".") if p.strip("`").strip()]
    if len(parts) == 3 and parts[0] == "spark_catalog":
        parts = parts[1:]
    if len(parts) == 1:
        return "default", parts[0]
    if len(parts) == 2:
        return parts[0], parts[1]
    raise ValueError(f"cannot parse table name {name!r}")


def _catalog_path(spark: SparkSession) -> str:
    return os.path.join(warehouse_dir(spark), CATALOG_FILE)


def catalog_map(spark: SparkSession) -> dict[str, str]:
    """The full name->path map (fresh read — the file is the truth)."""
    try:
        with open(_catalog_path(spark)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def _save(spark: SparkSession, mapping: dict[str, str]) -> None:
    p = _catalog_path(spark)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(p), prefix=".cat_")
    with os.fdopen(fd, "w") as f:
        json.dump(mapping, f, indent=0, sort_keys=True)
    os.replace(tmp, p)


class _catalog_lock:
    """Cross-process mutex for catalog read-modify-write (register /
    unregister): two concurrent writers must not lose each other's
    entries. flock on a sidecar lock file; reads stay lock-free (the
    rename publish is atomic)."""

    def __init__(self, spark: SparkSession):
        self.path = _catalog_path(spark) + ".lock"
        self.fd = None

    def __enter__(self):
        import fcntl

        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        self.fd = open(self.path, "a")
        fcntl.flock(self.fd, fcntl.LOCK_EX)
        return self

    def __exit__(self, *exc):
        import fcntl

        try:
            fcntl.flock(self.fd, fcntl.LOCK_UN)
        finally:
            self.fd.close()


def resolve(spark: SparkSession, name: str) -> Optional[str]:
    db, tbl = qualify(name)
    return catalog_map(spark).get(f"{db}.{tbl}")


def register_table(spark: SparkSession, name: str, path: str) -> None:
    db, tbl = qualify(name)
    with _catalog_lock(spark):
        m = catalog_map(spark)
        m[f"{db}.{tbl}"] = os.path.abspath(path)
        _save(spark, m)


def unregister_table(spark: SparkSession, name: str) -> Optional[str]:
    db, tbl = qualify(name)
    with _catalog_lock(spark):
        m = catalog_map(spark)
        path = m.pop(f"{db}.{tbl}", None)
        if path is not None:
            _save(spark, m)
    return path


def default_location(spark: SparkSession, name: str) -> str:
    db, tbl = qualify(name)
    w = warehouse_dir(spark)
    return os.path.join(w, tbl) if db == "default" else os.path.join(w, f"{db}.db", tbl)


def is_managed(spark: SparkSession, path: str) -> bool:
    return os.path.abspath(path).startswith(os.path.abspath(warehouse_dir(spark)) + os.sep)


def save_as_table(df: DataFrame, name: str, mode: str = "error", **kwargs) -> Optional[int]:
    """`df.write.format("delta").saveAsTable(name)` equivalent: resolve
    (or derive) the location, write through the normal path machinery,
    record the name."""
    from delta_spark.io import write_delta

    spark = df.sparkSession
    path = resolve(spark, name) or default_location(spark, name)
    v = write_delta(df, path, mode=mode, **kwargs)
    register_table(spark, name, path)
    return v


def drop_table(spark: SparkSession, name: str, purge: bool = True) -> bool:
    """DROP TABLE: unregister; managed tables (inside the warehouse)
    also lose their data, external ones keep it (Hive semantics,
    DeltaCatalog.dropTable)."""
    import shutil

    path = unregister_table(spark, name)
    if path is None:
        return False
    if purge and is_managed(spark, path) and os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    from delta_spark.log import DeltaLog
    DeltaLog.clear_cache()
    return True


def substitute_names(spark: SparkSession, statement: str) -> str:
    """Rewrite registered table names in a SQL text to delta.`path`
    references so the path-based verb handlers (sql.py) work on named
    tables; unknown names are left for spark.sql to resolve. Textual
    (same caveat as the verb regexes themselves): a registered name
    inside a string literal would be rewritten too."""
    mapping = catalog_map(spark)
    if not mapping:
        return statement
    for qname in sorted(mapping, key=len, reverse=True):
        path = mapping[qname]
        db, tbl = qname.split(".", 1)
        alts = [re.escape(qname)] + ([re.escape(tbl)] if db == "default" else [])
        for a in alts:
            # substitute only OUTSIDE backtick-quoted spans — a name
            # that happens to be a path segment of an already-inserted
            # delta.`path` reference must never be rewritten again
            parts = re.split(r"(`[^`]*`)", statement)
            for i in range(0, len(parts), 2):
                parts[i] = re.sub(
                    rf"(?i)(?<![\w.`'\"]){a}(?![\w.`'\"])",
                    f"delta.`{path}`", parts[i])
            statement = "".join(parts)
    return statement
