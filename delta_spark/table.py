"""DeltaTable: the user-facing API (mirrors the reference's Python
contract, python/delta/tables.py:39-1695, which is itself the public
surface of the Scala commands in spark/sql/delta/commands/).

Everything here delegates to the command modules; the SQL verbs
(VACUUM/OPTIMIZE/DESCRIBE HISTORY/...) route here from
delta_spark.sql's statement dispatcher.
"""

from __future__ import annotations

import datetime as _dt
import json
from dataclasses import dataclass
from typing import Optional, Union

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

from delta_spark.actions import Metadata, Protocol
from delta_spark.cdf import table_changes as _table_changes
from delta_spark.commands.delete import execute_delete
from delta_spark.commands.maintenance import (
    convert_to_delta,
    generate_symlink_manifest,
    restore,
    shallow_clone,
    truncate,
    vacuum,
)
from delta_spark.commands.merge import MergeBuilder
from delta_spark.commands.optimize import OptimizeBuilder
from delta_spark.commands.update import execute_update
from delta_spark.constraints import CONSTRAINT_PROP_PREFIX
from delta_spark.io import write_delta
from delta_spark.log import DeltaLog
from delta_spark.reader import read_snapshot
from delta_spark.schema import GENERATION_EXPRESSION_KEY
from delta_spark.transaction import OptimisticTransaction
from delta_spark.util import current_time_millis, schema_from_json, schema_to_json

# reference class names (python/delta/tables.py:847,1251) — aliases so
# `from delta.tables import DeltaMergeBuilder / DeltaOptimizeBuilder`
# call sites migrate by swapping only the package name
DeltaMergeBuilder = MergeBuilder
DeltaOptimizeBuilder = OptimizeBuilder


def _active_session(sparkSession: Optional[SparkSession]) -> SparkSession:
    """Reference builder factories default to the active session
    (python/delta/tables.py:508 create(cls, sparkSession=None))."""
    s = sparkSession or SparkSession.getActiveSession()
    if s is None:
        raise ValueError("could not resolve a SparkSession: pass "
                         "sparkSession explicitly or start one first")
    return s


def _cond_to_sql(condition: Union[str, Column, None]) -> Optional[str]:
    if condition is None or isinstance(condition, str):
        return condition
    # classic-mode Column → SQL text of the underlying expression.
    # Spark 4's java Column has no .expr(); the session-side converter
    # (SparkSession.expression) yields SQL the parser round-trips.
    try:
        spark = SparkSession.getActiveSession()
        return str(spark._jsparkSession.expression(condition._jc).sql())
    except Exception as e:  # pragma: no cover
        raise ValueError("pass conditions as SQL strings") from e


def _set_and_cond(a, b):
    """Accept BOTH argument orders for update-style calls: ours is
    (set, condition); the reference Python API (tables.py `update`,
    `whenMatchedUpdate`, ...) is (condition, set). The dict is
    unambiguous, so dispatch on it."""
    if isinstance(a, dict):
        return a, b
    if isinstance(b, dict):
        return b, a
    raise ValueError("a {column: expression} dict is required")


def _df_alias(df: DataFrame) -> Optional[str]:
    """Top-level alias of `df.alias("s")`, so
    `target.alias("t").merge(source.alias("s"), "t.k = s.k")` resolves
    like the reference API, where aliases ride on the DataFrames.
    Classic sessions read the analyzed plan via py4j; Connect frames
    carry the alias on the client-side plan object."""
    from delta_spark.connect_compat import connect_df_alias, is_connect

    if is_connect(df):
        return connect_df_alias(df)
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "SubqueryAlias":
            return str(plan.identifier().name())
    except Exception:
        pass
    return None


class DeltaTable:
    def __init__(self, spark: SparkSession, log: DeltaLog):
        self.spark = spark
        self.log = log

    # ------------------------------------------------------ factories ----
    # (parameter names mirror python/delta/tables.py so reference
    # keyword call sites migrate unchanged — pinned by
    # tests/test_api_parity.py)

    @classmethod
    def forPath(cls, sparkSession: SparkSession, path: str,
                hadoopConf: Optional[dict] = None) -> "DeltaTable":
        """Path-addressed table. Supports the reference's time-travel
        path suffixes (DeltaTimeTravelSpec.scala:88,98): `p@v123`
        (case-insensitive v) pins reads to version 123 and
        `p@yyyyMMddHHmmssSSS` (exactly 17 digits) pins to the last
        commit at/before that timestamp. A directory literally named
        with the suffix wins over the time-travel reading.

        Parameter names mirror python/delta/tables.py:439 so keyword
        call sites migrate unchanged. `hadoopConf` is accepted for
        signature parity but carries per-table JVM FileSystem
        credentials this engine has no seam for — passing a non-empty
        dict raises (set the equivalent session confs instead)."""
        import re as _re

        if hadoopConf:
            raise ValueError(
                "hadoopConf is not supported: per-table Hadoop options "
                "have no JVM seam here — set the equivalent "
                "spark.hadoop.* session confs instead (DEVIATIONS.md)")
        spark = sparkSession

        pinned = None
        pinned_ts = None
        m = _re.fullmatch(r"(.*)@[vV](\d+)", path)
        if m and not DeltaLog.for_table(path).table_exists():
            path, pinned = m.group(1), int(m.group(2))
        else:
            mt = _re.fullmatch(r"(.*)@(\d{17})", path)
            if mt and not DeltaLog.for_table(path).table_exists() \
                    and DeltaLog.for_table(mt.group(1)).table_exists():
                # resolve only when the base IS a table, so a missing
                # table still reports "not a delta table" below rather
                # than a timestamp-resolution error
                import datetime as _dt

                s = mt.group(2)
                ts = _dt.datetime.strptime(s[:14], "%Y%m%d%H%M%S").replace(
                    microsecond=int(s[14:]) * 1000, tzinfo=_dt.timezone.utc)
                path = mt.group(1)
                pinned_ts = int(ts.timestamp() * 1000)
        log = DeltaLog.for_table(path)
        if not log.table_exists():
            raise ValueError(f"{path} is not a delta table")
        # table redirect (redirect.py, TableRedirect.scala): a source in
        # REDIRECT-READY resolves to its destination — reads AND writes
        # route, INCLUDING time travel ("all types of queries would be
        # redirected"): the redirect resolves first, then the pinned
        # version/timestamp applies to the destination log — matching
        # the streaming/DataSource paths, which always route.
        from delta_spark import redirect as R

        dest = R.resolve_read_path(log.table_path,
                                   log.update().configuration)
        if dest is not None:
            dest_log = DeltaLog.for_table(dest)
            if not dest_log.table_exists():
                raise ValueError(
                    f"redirect destination {dest} is not a delta table")
            if R.resolve_read_path(dest_log.table_path,
                                   dest_log.update().configuration):
                raise R.RedirectStateError(
                    f"redirect chains are not allowed: {dest} "
                    f"redirects again")
            log = dest_log
        if pinned_ts is not None:
            pinned = log.version_for_time_travel(pinned_ts)
        dt = cls(spark, log)
        dt._pinned_version = pinned
        return dt

    @classmethod
    def forName(cls, sparkSession: SparkSession,
                tableOrViewName: str) -> "DeltaTable":
        """Resolve a registered table name (python/delta/tables.py:404;
        name->location resolution per AbstractDeltaCatalog.scala:81).
        Also accepts the delta.`path` spelling for symmetry."""
        import re as _re

        from delta_spark import catalog as C

        spark = sparkSession

        m = _re.fullmatch(r"\s*delta\.`(.+)`\s*", tableOrViewName)
        if m:
            return cls.forPath(spark, m.group(1))
        path = C.resolve(spark, tableOrViewName)
        if path is None:
            raise ValueError(
                f"table {tableOrViewName!r} is not registered in the delta catalog "
                f"({C.warehouse_dir(spark)}/{C.CATALOG_FILE})")
        return cls.forPath(spark, path)

    @classmethod
    def isDeltaTable(cls, sparkSession: SparkSession, identifier: str) -> bool:
        return DeltaLog.for_table(identifier).table_exists()

    # the builder factories default sparkSession to the active session,
    # same contract as python/delta/tables.py:508 (create(cls,
    # sparkSession=None))
    @classmethod
    def create(cls, sparkSession: Optional[SparkSession] = None
               ) -> "DeltaTableBuilder":
        return DeltaTableBuilder(_active_session(sparkSession), mode="create")

    @classmethod
    def createIfNotExists(cls, sparkSession: Optional[SparkSession] = None
                          ) -> "DeltaTableBuilder":
        return DeltaTableBuilder(_active_session(sparkSession),
                                 mode="createIfNotExists")

    @classmethod
    def replace(cls, sparkSession: Optional[SparkSession] = None
                ) -> "DeltaTableBuilder":
        return DeltaTableBuilder(_active_session(sparkSession),
                                 mode="replace")

    @classmethod
    def createOrReplace(cls, sparkSession: Optional[SparkSession] = None
                        ) -> "DeltaTableBuilder":
        return DeltaTableBuilder(_active_session(sparkSession),
                                 mode="createOrReplace")

    @classmethod
    def convertToDelta(cls, sparkSession: SparkSession, identifier: str,
                       partitionSchema: Optional[str] = None,
                       collect_stats: bool = True) -> "DeltaTable":
        return cls(sparkSession,
                   convert_to_delta(sparkSession, identifier,
                                    partitionSchema,
                                    collect_stats=collect_stats))

    @classmethod
    def createLike(cls, spark: SparkSession, source_path: str, target_path: str) -> "DeltaTable":
        """CREATE TABLE LIKE (commands/CreateDeltaTableLike.scala): new
        empty table copying the source's schema/partitioning/properties."""
        src = DeltaLog.for_table(source_path).update()
        if src.metadata is None:
            raise ValueError(f"{source_path} is not a delta table")
        log = DeltaLog.for_table(target_path)
        txn = OptimisticTransaction(log)
        if txn.read_version >= 0:
            raise ValueError(f"table already exists at {target_path}")
        m = src.metadata
        meta = Metadata(name=m.name, description=m.description, format=m.format,
                        schemaString=m.schemaString, partitionColumns=m.partitionColumns,
                        configuration=m.configuration, createdTime=current_time_millis())
        txn.commit([meta], "CREATE TABLE LIKE", {"source": source_path})
        return cls(spark, log)

    # ----------------------------------------------------------- reads ----

    def toDF(self, predicate: Optional[str] = None, limit: Optional[int] = None) -> DataFrame:
        pin = getattr(self, "_pinned_version", None)
        if self._plan_distributed():
            from delta_spark.reader import read_snapshot_distributed

            return read_snapshot_distributed(
                self.spark, self.log, predicate, limit, version=pin)
        snap = self.log.snapshot_at(pin) if pin is not None else self.log.update()
        return read_snapshot(self.spark, snap, predicate, limit)

    def _plan_distributed(self) -> bool:
        """Route scans through the distributed planning path
        (read_snapshot_distributed) when the log is too big to replay
        comfortably on the driver. ``delta_spark.scan.distributedPlanning``:
        ``auto`` (default — switch past
        ``delta_spark.scan.distributedPlanningThreshold`` actions,
        estimated from the free _last_checkpoint "size" field),
        ``always``, or ``never``."""
        from delta_spark.log import should_plan_distributed

        return should_plan_distributed(self.spark, self.log)

    def asOfVersion(self, version: int) -> DataFrame:
        """Time travel read (VERSION AS OF)."""
        if self._plan_distributed():
            from delta_spark.reader import read_snapshot_distributed

            self.log.check_version_exists(version)
            return read_snapshot_distributed(self.spark, self.log,
                                             version=version)
        return read_snapshot(self.spark, self.log.snapshot_at(version))

    def asOfTimestamp(self, ts: Union[str, _dt.datetime, int]) -> DataFrame:
        """Time travel read (TIMESTAMP AS OF)."""
        ms = _to_millis(ts)
        return self.asOfVersion(self.log.version_for_time_travel(ms))

    def table_changes(self, starting_version: Optional[int] = None,
                      ending_version: Optional[int] = None,
                      starting_timestamp: Union[str, _dt.datetime, int, None] = None,
                      ending_timestamp: Union[str, _dt.datetime, int, None] = None) -> DataFrame:
        """CDF batch read (option('readChangeFeed') / table_changes TVF)."""
        return _table_changes(
            self.spark, self.log, starting_version, ending_version,
            _to_millis(starting_timestamp) if starting_timestamp is not None else None,
            _to_millis(ending_timestamp) if ending_timestamp is not None else None)

    @property
    def version(self) -> int:
        return self.log.update().version

    # ------------------------------------------------------------- DML ----

    def _no_time_travel(self, op: str) -> None:
        """DeltaHistoryManagerSuite 'cannot time travel target tables of
        insert/delete/update/merge': a version-pinned handle (p@v /
        VERSION AS OF) is a read, never a DML target."""
        if getattr(self, "_pinned_version", None) is not None:
            raise ValueError(
                f"{op} on a time-travelled table is not allowed "
                f"(the table is pinned to version {self._pinned_version})")

    def delete(self, condition: Union[str, Column, None] = None) -> int:
        self._no_time_travel("DELETE")
        return execute_delete(self.spark, self.log, _cond_to_sql(condition))

    def update(self, condition: Union[str, Column, dict, None] = None,
               set: Union[dict, str, Column, None] = None) -> int:
        self._no_time_travel("UPDATE")
        set, condition = _set_and_cond(set, condition)
        set_sql = {k: (v if isinstance(v, str) else _cond_to_sql(v)) for k, v in set.items()}
        return execute_update(self.spark, self.log, set_sql, _cond_to_sql(condition))

    def merge(self, source: DataFrame, condition: Union[str, Column],
              source_alias: str = "source", target_alias: str = "target") -> MergeBuilder:
        self._no_time_travel("MERGE")
        if source_alias == "source":
            source_alias = _df_alias(source) or "source"
        return MergeBuilder(self.spark, self.log, source, _cond_to_sql(condition),
                            source_alias, target_alias)

    def alias(self, aliasName: str) -> "AliasedDeltaTable":
        # the alias view keeps the time-travel pin (reads and the DML
        # guard must survive `forPath(p@v).alias(...)`)
        return AliasedDeltaTable(self.spark, self.log, aliasName,
                                 getattr(self, "_pinned_version", None))

    # --------------------------------------------------------- utility ----

    def history(self, limit: Optional[int] = None) -> DataFrame:
        rows = self.log.history(limit)
        schema = T.StructType([
            T.StructField("version", T.LongType()),
            T.StructField("timestamp", T.TimestampType()),
            T.StructField("operation", T.StringType()),
            T.StructField("operationParameters", T.MapType(T.StringType(), T.StringType())),
            T.StructField("operationMetrics", T.MapType(T.StringType(), T.StringType())),
            T.StructField("readVersion", T.LongType()),
            T.StructField("isolationLevel", T.StringType()),
            T.StructField("isBlindAppend", T.BooleanType()),
            T.StructField("engineInfo", T.StringType()),
            T.StructField("userMetadata", T.StringType()),
        ])
        data = [(r["version"], _dt.datetime.utcfromtimestamp(r["timestamp"] / 1000.0),
                 r["operation"],
                 {k: str(v) for k, v in (r["operationParameters"] or {}).items()},
                 {k: str(v) for k, v in (r["operationMetrics"] or {}).items()},
                 r["readVersion"], r["isolationLevel"], r["isBlindAppend"],
                 r["engineInfo"], r["userMetadata"]) for r in rows]
        return self.spark.createDataFrame(data, schema)

    def detail(self) -> DataFrame:
        snap = self.log.update()
        m = snap.metadata
        schema = T.StructType([
            T.StructField("format", T.StringType()),
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("description", T.StringType()),
            T.StructField("location", T.StringType()),
            T.StructField("createdAt", T.TimestampType()),
            T.StructField("lastModified", T.TimestampType()),
            T.StructField("partitionColumns", T.ArrayType(T.StringType())),
            T.StructField("clusteringColumns", T.ArrayType(T.StringType())),
            T.StructField("numFiles", T.LongType()),
            T.StructField("sizeInBytes", T.LongType()),
            T.StructField("properties", T.MapType(T.StringType(), T.StringType())),
            T.StructField("minReaderVersion", T.IntegerType()),
            T.StructField("minWriterVersion", T.IntegerType()),
            T.StructField("tableFeatures", T.ArrayType(T.StringType())),
        ])
        # DescribeDeltaDetailsCommand:163 — explicit features plus the
        # legacy versions' implied ones, sorted
        from delta_spark.actions import implied_legacy_features

        impl_r, impl_w = implied_legacy_features(snap.protocol)
        features = sorted(impl_r | impl_w
                          | set(snap.protocol.readerFeatures or [])
                          | set(snap.protocol.writerFeatures or []))
        clustering = []
        dm = snap.domain_metadata.get("delta.clustering")
        if dm is not None:
            try:
                clustering = list(json.loads(dm.configuration)
                                  .get("clusteringColumns", []))
            except (ValueError, TypeError):
                pass
        row = (
            "delta", m.id if m else None, m.name if m else None,
            m.description if m else None, self.log.table_path,
            _dt.datetime.utcfromtimestamp((m.createdTime or 0) / 1000.0) if m and m.createdTime else None,
            _dt.datetime.utcfromtimestamp(snap.timestamp / 1000.0) if snap.timestamp else None,
            list(m.partitionColumns) if m else [], clustering,
            snap.num_files, snap.size_in_bytes,
            dict(m.configuration) if m else {},
            snap.protocol.minReaderVersion, snap.protocol.minWriterVersion,
            features,
        )
        return self.spark.createDataFrame([row], schema)

    def show_partitions(self) -> DataFrame:
        snap = self.log.update()
        pcols = snap.partition_columns
        if not pcols:
            raise ValueError("table is not partitioned")
        ptypes = {f.name: f.dataType for f in snap.schema.fields if f.name in set(pcols)}
        from delta_spark.util import deserialize_partition_value

        l2p = snap.physical_map()
        seen = {tuple(f.partitionValues.get(l2p.get(c, c)) for c in pcols) for f in snap.all_files}
        rows = [tuple(deserialize_partition_value(v, ptypes[c]) for c, v in zip(pcols, key))
                for key in seen]
        return self.spark.createDataFrame(rows, T.StructType(
            [T.StructField(c, ptypes[c]) for c in pcols]))

    def optimize(self) -> OptimizeBuilder:
        self._no_time_travel("OPTIMIZE")
        return OptimizeBuilder(self.spark, self.log)

    def vacuum(self, retentionHours: Optional[float] = None, dry_run: bool = False,
               inventory: Optional[DataFrame] = None) -> list[str]:
        self._no_time_travel("VACUUM")
        return vacuum(self.spark, self.log, retentionHours, dry_run,
                      inventory=inventory)

    def restoreToVersion(self, version: int) -> dict:
        self._no_time_travel("RESTORE")
        return restore(self.spark, self.log, version=version)

    def restoreToTimestamp(self, timestamp: Union[str, _dt.datetime, int]) -> dict:
        self._no_time_travel("RESTORE")
        return restore(self.spark, self.log,
                       timestamp_ms=_to_millis(timestamp))

    def clone(self, target: str, isShallow: bool = False,
              replace: bool = False, properties: Optional[dict] = None,
              version: Optional[int] = None) -> "DeltaTable":
        """Clone this table (reference python tables.py:732 `clone`):
        shallow (AddFiles point at source files) or deep (target owns
        re-written data), optionally replacing an existing target, with
        property overrides. Defaults to DEEP, matching the reference —
        a caller who vacuums the source afterwards must not break the
        clone unless they opted into isShallow=True."""
        if isShallow:
            shallow_clone(self.spark, self.log, target, version,
                          replace=replace, properties=properties)
        else:
            from delta_spark.commands.maintenance import deep_clone

            deep_clone(self.spark, self.log, target, version,
                       replace=replace, properties=properties)
        return DeltaTable.forPath(self.spark, target)

    def cloneAtVersion(self, version: int, target: str,
                       isShallow: bool = False, replace: bool = False,
                       properties: Optional[dict] = None) -> "DeltaTable":
        """Reference python tables.py:759 `cloneAtVersion`."""
        return self.clone(target, version=version, isShallow=isShallow,
                          replace=replace, properties=properties)

    def cloneAtTimestamp(self, timestamp: str, target: str,
                         isShallow: bool = False, replace: bool = False,
                         properties: Optional[dict] = None) -> "DeltaTable":
        """Reference python tables.py:789 `cloneAtTimestamp` — the
        source version is the last commit at/before the timestamp;
        future timestamps error (read-side strict resolution)."""
        v = self.log.version_for_time_travel(_to_millis(timestamp))
        return self.clone(target, version=v, isShallow=isShallow,
                          replace=replace, properties=properties)

    def truncate(self) -> int:
        self._no_time_travel("TRUNCATE")
        return truncate(self.spark, self.log)

    def reorgPurge(self) -> dict:
        """REORG TABLE ... APPLY (PURGE): materialize deletion vectors
        by rewriting the affected files."""
        self._no_time_travel("REORG")
        from delta_spark.commands.delete import purge_deletion_vectors

        return purge_deletion_vectors(self.spark, self.log)

    def upgradeUniform(self, iceberg_compat_version: int = 2) -> dict:
        """REORG TABLE ... APPLY (UPGRADE UNIFORM(ICEBERG_COMPAT_VERSION=N))
        (DeltaReorgTableCommand / DeltaSqlBase.g4 reorgTable): make the
        table Iceberg-readable — purge deletion vectors (an Iceberg
        reader cannot apply them), enable icebergCompatVN, and add
        'iceberg' to the UniForm formats so subsequent commits publish
        Iceberg metadata through the post-commit hook."""
        from delta_spark.commands.delete import purge_deletion_vectors
        from delta_spark.uniform import UNIFORM_FORMATS_KEY

        keys = {1: "delta.enableIcebergCompatV1",
                2: "delta.enableIcebergCompatV2",
                3: "delta.enableIcebergCompatV3"}
        if iceberg_compat_version not in keys:
            raise ValueError(
                f"unsupported ICEBERG_COMPAT_VERSION "
                f"{iceberg_compat_version} (supported: 1, 2, 3)")
        props = {keys[iceberg_compat_version]: "true"}
        metrics: dict = {}
        if iceberg_compat_version == 3:
            # V3 writer requirements include column mapping (Iceberg
            # field ids are the mapping ids); enable name mode first —
            # a separate commit, because it rewrites the schema's field
            # annotations
            cur = self.log.update().configuration
            if cur.get("delta.columnMapping.mode", "none") not in (
                    "name", "id"):
                self.enableColumnMapping("name")
        if iceberg_compat_version < 3:
            # an Iceberg v2 reader cannot apply Delta DVs — purge them
            # and keep DV creation off; V3 converts DVs to format-v3
            # DeleteFiles instead, so they stay
            metrics = purge_deletion_vectors(self.spark, self.log)
            props["delta.enableDeletionVectors"] = "false"
        cfg = self.log.update().configuration
        fmts = {f for f in (cfg.get(UNIFORM_FORMATS_KEY) or "").split(",")
                if f} | {"iceberg"}
        props[UNIFORM_FORMATS_KEY] = ",".join(sorted(fmts))
        self.setProperties(props)
        return metrics

    def generate(self, mode: str = "symlink_format_manifest") -> str:
        if mode != "symlink_format_manifest":
            raise ValueError(f"unsupported generate mode {mode!r}")
        return generate_symlink_manifest(self.spark, self.log)

    # --------------------------------------------------- table evolution ----

    def upgradeTableProtocol(self, readerVersion: int, writerVersion: int) -> int:
        from delta_spark.actions import merge_protocol

        txn = OptimisticTransaction(self.log)
        p = txn.snapshot.protocol
        if readerVersion < p.minReaderVersion or writerVersion < p.minWriterVersion:
            raise ValueError("protocol cannot be downgraded")
        # crossing into writer 7 denormalizes the legacy versions'
        # implied features into explicit lists (Protocol.merge role)
        new = merge_protocol(p, min_reader=readerVersion,
                             min_writer=writerVersion)
        return txn.commit([new], "UPGRADE PROTOCOL",
                          {"newProtocol": json.dumps({"minReaderVersion": new.minReaderVersion,
                                                      "minWriterVersion": new.minWriterVersion})})

    _DROPPABLE_READER_WRITER = {"deletionVectors", "typeWidening",
                                "variantType", "catalogManaged"}
    _DROPPABLE_WRITER = {"rowTracking", "inCommitTimestamp",
                         "icebergCompatV2"}

    # feature registry (TableFeature.scala): which protocol leg carries
    # each supported feature
    _READER_WRITER_FEATURES = {"deletionVectors", "typeWidening",
                               "variantType", "columnMapping",
                               "timestampNtz", "v2Checkpoint",
                               "vacuumProtocolCheck",
                               "adaptiveMetadata-preview"}
    _WRITER_FEATURES = {"appendOnly", "invariants", "checkConstraints",
                        "generatedColumns", "changeDataFeed",
                        "identityColumns", "rowTracking",
                        "domainMetadata", "icebergCompatV2",
                        "inCommitTimestamp", "clustering",
                        "checkpointProtection"}

    def addFeatureSupport(self, featureName: str) -> int:
        """io.delta.tables addFeatureSupport (python tables.py:608):
        upgrade to the table-features protocol and mark the named
        feature supported. Metadata-only commit."""
        if featureName in self._READER_WRITER_FEATURES:
            r_feats, w_feats = {featureName}, {featureName}
        elif featureName in self._WRITER_FEATURES:
            r_feats, w_feats = set(), {featureName}
        else:
            raise ValueError(f"unknown table feature {featureName!r}")
        from delta_spark.actions import merge_protocol

        txn = OptimisticTransaction(self.log)
        p = txn.snapshot.protocol or Protocol()
        new = merge_protocol(p, r_feats, w_feats)
        return txn.commit([new], "ADD FEATURE SUPPORT",
                          {"feature": featureName})

    def dropFeatureSupport(self, featureName: str,
                           truncateHistory: Optional[bool] = None) -> None:
        """Reference python tables.py:640 `dropFeatureSupport` — alias
        of :meth:`dropFeature` with the reference's parameter names."""
        self.dropFeature(featureName, truncate_history=bool(truncateHistory))

    def dropFeature(self, name: str, truncate_history: bool = False) -> int:
        """ALTER TABLE DROP FEATURE (AlterTableDropFeatureDeltaCommand):
        feature-specific cleanup (purge DVs / rewrite narrow files /
        refuse while variant columns remain), then protocol downgrade.
        Reader+writer features additionally need history protection —
        older versions still reference the feature — so they require
        ``truncate_history=True``, which checkpoints the current version
        and truncates the log behind it (the reference's two-phase
        TRUNCATE HISTORY flow, compressed: we truncate immediately
        instead of enforcing the 24 h wait)."""
        from delta_spark.util import current_time_millis

        p = self.log.update().protocol
        if (name not in (p.readerFeatures or [])
                and name not in (p.writerFeatures or [])):
            raise ValueError(f"feature {name!r} is not enabled on this table")
        if name == "deletionVectors":
            self.setProperties({"delta.enableDeletionVectors": "false"})
            self.reorgPurge()
        elif name == "typeWidening":
            self.unsetProperties(["delta.enableTypeWidening"])
            self._rewrite_all_files("DROP FEATURE typeWidening")
            self._strip_type_changes()
        elif name == "variantType":
            if '"variant"' in self.log.update().metadata.schemaString:
                raise ValueError("cannot drop variantType: the table "
                                 "still contains variant columns")
        elif name == "rowTracking":
            self.unsetProperties(["delta.enableRowTracking"])
            # RowTrackingUnBackfillCommand: strip baseRowId /
            # defaultRowCommitVersion from every AddFile so the
            # downgraded table carries no row-tracking state
            # (dataChange=false re-commits, the backfill in reverse)
            from dataclasses import replace as _replace

            txn0 = OptimisticTransaction(self.log)
            unback = [
                _replace(f, dataChange=False, baseRowId=None,
                         defaultRowCommitVersion=None)
                for f in txn0.snapshot.all_files
                if f.baseRowId is not None
                or f.defaultRowCommitVersion is not None]
            if unback:
                txn0.commit(unback, "UNBACKFILL", {})
        elif name == "inCommitTimestamp":
            self.unsetProperties(["delta.enableInCommitTimestamps"])
        elif name == "icebergCompatV2":
            self.unsetProperties(["delta.enableIcebergCompatV2"])
        elif name == "catalogManaged":
            # Handover flow (the ONLY legal way to un-manage a table —
            # OptimisticTransaction.commit refuses property-level drops
            # of the managing catalog): ONE commit, ratified by the
            # catalog itself (the owner at commit time), removes both
            # the management properties and the protocol feature —
            # split commits would either trip the fail-closed reader
            # gate (feature on protocol, catalog state gone) or land a
            # filesystem commit beyond the catalog's ratification
            # ceiling (invisible to readers). Then publish the entire
            # ratified tail so the filesystem log is a complete source
            # of truth, release the catalog's state, and truncate
            # history (the feature is reader+writer: older versions
            # still reference it).
            return self._drop_catalog_managed(truncate_history)
        else:
            raise ValueError(f"dropping feature {name!r} is not supported")

        truncated = False
        if name in self._DROPPABLE_READER_WRITER:
            if not truncate_history:
                raise ValueError(
                    f"dropping reader+writer feature {name!r} requires "
                    "truncate_history=True: historical versions still "
                    "reference it")
            snap = self.log.update()
            self.log.write_checkpoint(snap)
            # push the cutoff past every pre-drop commit
            self.log.cleanup_expired_logs(
                now_ms=current_time_millis()
                + self.log.log_retention_ms() + 60_000)
            truncated = True

        txn = OptimisticTransaction(self.log)
        p = txn.snapshot.protocol
        rf = [f for f in (p.readerFeatures or []) if f != name] or None
        wf = [f for f in (p.writerFeatures or []) if f != name] or None
        actions: list = []
        if truncated:
            # CheckpointProtectionTableFeature: after TRUNCATE HISTORY
            # the table keeps the checkpointProtection writer feature
            # and records the barrier — other writers must not clean up
            # metadata below it unless their surviving checkpoint sits
            # at/after the barrier (PreDowngradeTableFeatureCommand's
            # downgrade path)
            import dataclasses as _dc

            barrier = txn.snapshot.version + 1  # the downgrade commit
            wf = sorted(set(wf or []) | {"checkpointProtection"})
            m = txn.metadata
            actions.append(_dc.replace(m, configuration={
                **m.configuration,
                "delta.requireCheckpointProtectionBeforeVersion":
                    str(barrier)}))
        if rf is None and wf is None:
            mr, mw = self._legacy_protocol_versions(txn.snapshot)
        else:
            mr = (p.minReaderVersion if rf is not None
                  else self._legacy_protocol_versions(txn.snapshot)[0])
            mw = 7 if wf is not None else p.minWriterVersion
        actions.append(Protocol(mr, mw, rf, wf))
        v = txn.commit(actions, "DROP FEATURE", {"featureName": name})
        if truncated and v != barrier:
            # conflict retries landed the downgrade past the recorded
            # barrier — re-point it at the actual downgrade version so
            # every pre-downgrade commit stays protected
            self.setProperties(
                {"delta.requireCheckpointProtectionBeforeVersion": str(v)})
        return v

    def _drop_catalog_managed(self, truncate_history: bool) -> int:
        """catalogManaged handover (see dropFeature): one catalog-
        ratified commit removes the management properties AND the
        protocol feature, the ratified tail is published, the catalog
        record is released, and — the feature being reader+writer —
        history is truncated behind a fresh checkpoint with the
        checkpointProtection barrier recorded."""
        import dataclasses as _dc

        from delta_spark import catalog_managed as _CM
        from delta_spark.util import current_time_millis as _now

        if not truncate_history:
            raise ValueError(
                "dropping reader+writer feature 'catalogManaged' "
                "requires truncate_history=True: historical versions "
                "still reference it")
        snap = self.log.update()
        cat = _CM.client_for(snap.metadata.configuration)
        txn = OptimisticTransaction(self.log)
        txn._allow_catalog_handover = True
        m = txn.metadata
        p = txn.snapshot.protocol
        barrier = txn.snapshot.version + 1  # the handover commit
        rf = [f for f in (p.readerFeatures or [])
              if f != "catalogManaged"] or None
        wf = sorted(set(f for f in (p.writerFeatures or [])
                        if f != "catalogManaged") | {"checkpointProtection"})
        dropped = sorted(k for k in m.configuration
                         if k.startswith("delta_spark.catalogManaged."))
        newcfg = {k: v for k, v in m.configuration.items()
                  if not k.startswith("delta_spark.catalogManaged.")}
        newcfg["delta.requireCheckpointProtectionBeforeVersion"] = \
            str(barrier)
        mr = p.minReaderVersion if rf is not None \
            else self._legacy_protocol_versions(txn.snapshot)[0]
        v = txn.commit(
            [_dc.replace(m, configuration=newcfg), Protocol(mr, 7, rf, wf)],
            "DROP FEATURE",
            {"featureName": "catalogManaged",
             "droppedProperties": json.dumps(dropped)})
        if cat is not None:
            _CM.publish(self.log, cat, v)
            cat.drop_table(self.log.log_path)
        if v != barrier:
            # conflict retries moved the handover — re-point the
            # barrier at the actual version (now a plain fs commit)
            self.setProperties(
                {"delta.requireCheckpointProtectionBeforeVersion": str(v)})
        # TRUNCATE HISTORY: checkpoint the downgraded state and expire
        # everything behind it — pre-handover commits reference the
        # catalogManaged reader feature
        snap = self.log.update()
        self.log.write_checkpoint(snap)
        self.log.cleanup_expired_logs(
            now_ms=_now() + self.log.log_retention_ms() + 60_000)
        return v

    def _legacy_protocol_versions(self, snap) -> tuple[int, int]:
        """Minimal legacy protocol once no table features remain."""
        from delta_spark.schema import (
            column_mapping_mode,
            generation_expressions,
            identity_info,
        )

        schema = snap.schema
        cfg = snap.configuration
        mr, mw = 1, 2
        if any(k.startswith(CONSTRAINT_PROP_PREFIX) for k in cfg):
            mw = max(mw, 3)
        if generation_expressions(schema):
            mw = max(mw, 4)
        if column_mapping_mode(cfg) != "none":
            mr, mw = max(mr, 2), max(mw, 5)
        if identity_info(schema):
            mw = max(mw, 6)
        return mr, mw

    def _rewrite_all_files(self, operation: str) -> None:
        """Rewrite every data file at the current schema (REORG role):
        after this no file depends on widened-type up-casts."""
        from delta_spark.reader import read_files_with_index
        from delta_spark.writer import write_table_files

        txn = OptimisticTransaction(self.log)
        snap = txn.snapshot
        files = snap.all_files
        if not files:
            return
        df = (read_files_with_index(self.spark, snap, files)
              .drop("__file_base", "__row_idx"))
        adds = write_table_files(df, snap, data_change=False)
        removes = [f.remove(data_change=False) for f in files]
        txn.read_files.update(f.path for f in files)
        txn.commit(list(adds) + list(removes), operation,
                   {"rewriteAll": "true"},
                   {"numRewrittenFiles": str(len(removes))})

    def _strip_type_changes(self) -> int:
        from delta_spark.schema import TYPE_CHANGES_KEY

        def f(m):
            schema = schema_from_json(m.schemaString)
            fields = []
            for fl in schema.fields:
                md = {k: v for k, v in (fl.metadata or {}).items()
                      if k != TYPE_CHANGES_KEY}
                fields.append(T.StructField(fl.name, fl.dataType,
                                            fl.nullable, md))
            return T.StructType(fields)

        return self._update_schema(f, "UPDATE SCHEMA METADATA", {})

    def setProperties(self, props: dict[str, str]) -> int:
        """SET TBLPROPERTIES. `delta.columnMapping.mode` is not a plain
        property: flipping it without assigning field ids/physical
        names would leave a schema where the next ALTER hands every
        pre-existing column a fresh `col-<uuid>` physical name,
        silently orphaning all data in old files. Route the none→name
        upgrade through enableColumnMapping (ids + physical names +
        protocol bump) and reject other transitions, mirroring
        DeltaColumnMapping.allowMappingModeChange (only none→name)."""
        self._no_time_travel("SET TBLPROPERTIES")
        from delta_spark.schema import COLUMN_MAPPING_MODE_KEY, column_mapping_mode

        # protocol properties (delta.minReaderVersion/-WriterVersion,
        # delta.feature.<name>=supported) flow through the metadata
        # commit and are CONSUMED into the Protocol action by the
        # transaction seam (OptimisticTransaction._consume_protocol_props)
        # — they never land as plain table properties
        new_mode = props.get(COLUMN_MAPPING_MODE_KEY)
        if new_mode is not None:
            cur = column_mapping_mode(self.log.update().configuration)
            if new_mode != cur:
                if cur != "none" and new_mode == "none":
                    # RemoveColumnMappingCommand: rewrite with logical
                    # names, then apply the remaining plain properties
                    v = self.removeColumnMapping()
                    rest = {k: v2 for k, v2 in props.items()
                            if k != COLUMN_MAPPING_MODE_KEY}
                    if not rest:
                        return v
                    return self._update_metadata(
                        lambda m: {**m.configuration, **rest},
                        "SET TBLPROPERTIES",
                        {"properties": json.dumps(rest)})
                if cur != "none":
                    raise ValueError(
                        f"changing delta.columnMapping.mode from {cur!r} to "
                        f"{new_mode!r} is not supported")
                # one atomic commit: the mapping upgrade and the other
                # properties land together (a single SET TBLPROPERTIES
                # statement must not expose an intermediate version)
                rest = {k: v for k, v in props.items()
                        if k != COLUMN_MAPPING_MODE_KEY}
                return self.enableColumnMapping(new_mode, extra_props=rest)
        return self._update_metadata(lambda m: {**m.configuration, **props},
                                     "SET TBLPROPERTIES", {"properties": json.dumps(props)})

    def setTableComment(self, comment: Optional[str]) -> int:
        """COMMENT ON TABLE ... IS '...' (DeltaCatalog routes the
        'comment' property into Metadata.description;
        AlterTableSetPropertiesDeltaCommand). None clears it."""
        txn = OptimisticTransaction(self.log)
        m = txn.metadata
        if m is None:
            raise ValueError("table does not exist")
        new = Metadata(id=m.id, name=m.name, description=comment,
                       format=m.format, schemaString=m.schemaString,
                       partitionColumns=m.partitionColumns,
                       configuration=m.configuration, createdTime=m.createdTime)
        return txn.commit([new], "SET TBLPROPERTIES",
                          {"properties": json.dumps({"comment": comment})})

    def unsetProperties(self, keys: list[str]) -> int:
        return self._update_metadata(
            lambda m: {k: v for k, v in m.configuration.items() if k not in set(keys)},
            "UNSET TBLPROPERTIES", {"properties": json.dumps(keys)})

    def addCheckConstraint(self, name: str, expr: str) -> int:
        """ALTER TABLE ADD CONSTRAINT (Constraints.scala:66). Verifies
        existing rows satisfy the constraint first, like the reference."""
        viol = self.toDF().filter(~F.coalesce(F.expr(expr), F.lit(False))).limit(1).count()
        if viol:
            raise ValueError(f"existing rows violate CHECK constraint {name}: {expr}")
        return self._update_metadata(
            lambda m: {**m.configuration, CONSTRAINT_PROP_PREFIX + name.lower(): expr},
            "ADD CONSTRAINT", {"name": name, "expr": expr})

    def dropCheckConstraint(self, name: str) -> int:
        key = CONSTRAINT_PROP_PREFIX + name.lower()
        return self._update_metadata(
            lambda m: {k: v for k, v in m.configuration.items() if k != key},
            "DROP CONSTRAINT", {"name": name})

    def addColumns(self, fields: list[T.StructField],
                   positions: Optional[list] = None) -> int:
        """ALTER TABLE ADD COLUMNS (alterDeltaTableCommands.scala:113) —
        metadata-only; old files read the new columns as null.
        ``positions[i]`` places fields[i]: None (append), "first", or
        ("after", existing_col) — the grammar's FIRST/AFTER clauses."""
        positions = positions or [None] * len(fields)

        for fl in fields:
            if not fl.nullable:
                # alterDeltaTableCommands.scala:620 — existing rows have
                # no value for the new column, so NOT NULL cannot hold
                raise ValueError(
                    "Operation not supported: NOT NULL in ALTER TABLE "
                    f"ADD COLUMNS (column {fl.name})")

        def insert_into(fields_list, nf, pos):
            out = list(fields_list)
            if pos is None:
                out.append(nf)
            elif pos == "first":
                out.insert(0, nf)
            else:
                from delta_spark.util import split_column_path
                anchor = split_column_path(pos[1])[-1].lower()
                idx = next((i for i, x in enumerate(out)
                            if x.name.lower() == anchor), None)
                if idx is None:
                    raise ValueError(
                        f"AFTER column {pos[1]!r} does not exist")
                out.insert(idx + 1, nf)
            return out

        def f(m: Metadata):
            schema = schema_from_json(m.schemaString)
            for fl, pos in zip(fields, positions):
                from delta_spark.util import split_column_path
                parts = split_column_path(fl.name)
                leaf = parts[-1]
                siblings = self._sibling_names(schema, parts)
                if leaf.lower() in (n.lower() for n in siblings):
                    raise ValueError(f"column {fl.name} already exists")
                nf = T.StructField(leaf, fl.dataType, True, fl.metadata)
                if len(parts) == 1:
                    schema = T.StructType(
                        insert_into(schema.fields, nf, pos))
                else:
                    # dotted path: add INSIDE the parent struct
                    # (alterDeltaTableCommands nested ADD COLUMNS)
                    def graft(parent):
                        if not isinstance(parent.dataType, T.StructType):
                            raise ValueError(
                                f"column {parent.name!r} is not a struct")
                        return T.StructField(
                            parent.name,
                            T.StructType(insert_into(
                                parent.dataType.fields, nf, pos)),
                            parent.nullable, parent.metadata)
                    schema = self._edit_field_at(schema, parts[:-1], graft)
            return schema

        return self._update_schema(f, "ADD COLUMNS",
                                   {"columns": json.dumps([fl.name for fl in fields])})

    def enableColumnMapping(self, mode: str = "name",
                            extra_props: Optional[dict] = None) -> int:
        """Switch to NameMapping or IdMapping mode
        (DeltaColumnMapping.scala:107 `Set(IdMapping, NoMapping,
        NameMapping)`): every field gets a stable id + physical name =
        its current name, so no data files are rewritten. In id mode
        readers resolve parquet columns by field id (files written
        after the upgrade carry parquet field_ids; pre-upgrade files
        still resolve by physical name)."""
        from delta_spark.schema import (
            COLUMN_MAPPING_MODE_KEY,
            assign_physical_names,
        )

        if mode not in ("name", "id"):
            raise ValueError(f"unsupported column mapping mode {mode!r}")
        txn = OptimisticTransaction(self.log)
        m = txn.metadata
        if m is None:
            raise ValueError("table does not exist")
        if mode == "id" and txn.snapshot.all_files:
            # the reference only allows the none→name upgrade
            # (DeltaColumnMapping.allowMappingModeChange): id-mode
            # readers resolve by parquet field_id, which existing files
            # do not carry — they would read as all-NULL. Id mode is a
            # creation-time (or Iceberg-conversion) property.
            raise ValueError(
                "cannot switch a non-empty table to id column mapping: existing "
                "files carry no parquet field_ids. Create the table with "
                "delta.columnMapping.mode=id instead.")
        schema, max_id = assign_physical_names(schema_from_json(m.schemaString))
        cfg = {**m.configuration, **(extra_props or {}),
               COLUMN_MAPPING_MODE_KEY: mode,
               "delta.columnMapping.maxColumnId": str(max_id)}
        new = Metadata(id=m.id, name=m.name, description=m.description, format=m.format,
                       schemaString=schema_to_json(schema),
                       partitionColumns=m.partitionColumns,
                       configuration=cfg, createdTime=m.createdTime)
        p = txn.snapshot.protocol
        from delta_spark.actions import Protocol as _Protocol
        proto = _Protocol(max(p.minReaderVersion, 2), max(p.minWriterVersion, 5),
                          p.readerFeatures, p.writerFeatures)
        return txn.commit([proto, new], "SET TBLPROPERTIES",
                          {"properties": json.dumps(
                              {**(extra_props or {}),
                               COLUMN_MAPPING_MODE_KEY: mode})})

    def removeColumnMapping(self) -> int:
        """SET TBLPROPERTIES ('delta.columnMapping.mode'='none') on a
        mapped table (RemoveColumnMappingCommand.scala): rewrite every
        file with LOGICAL column names, strip the per-field mapping
        metadata, and drop the mapping properties — one commit whose
        file actions are dataChange=false (pure rearrangement; streams
        skip it). Fails if any logical name is parquet-hostile (those
        need mapping to exist at all)."""
        from delta_spark.schema import (
            COLUMN_MAPPING_MAX_ID_KEY,
            COLUMN_MAPPING_MODE_KEY,
            column_mapping_mode,
            drop_column_mapping_metadata,
        )
        from delta_spark.stats import stats_columns
        from delta_spark.writer import write_files

        txn = OptimisticTransaction(self.log)
        m = txn.metadata
        if m is None:
            raise ValueError("table does not exist")
        if column_mapping_mode(m.configuration) == "none":
            return self.log.update().version  # already unmapped: no-op
        snap = txn.snapshot
        new_schema = drop_column_mapping_metadata(
            schema_from_json(m.schemaString))
        # validate logical names BEFORE the full-table rewrite
        # (verifySchemaFieldNames) — failing at commit time would waste
        # the rewrite and strand uncommitted parquet files
        from delta_spark.schema import nested_field_names
        bad = [n for n in nested_field_names(new_schema)
               if any(ch in n for ch in " ,;{}()\n\t=")]
        if bad:
            raise ValueError(
                f"column names not allowed without column mapping "
                f"(parquet-invalid characters): {sorted(set(bad))}")
        txn.read_whole_table()
        data = read_snapshot(self.spark, snap)  # logical names
        cfg = {k: v for k, v in m.configuration.items()
               if k not in (COLUMN_MAPPING_MODE_KEY,
                            COLUMN_MAPPING_MAX_ID_KEY)}
        new_meta = Metadata(
            id=m.id, name=m.name, description=m.description,
            format=m.format, schemaString=schema_to_json(new_schema),
            partitionColumns=m.partitionColumns, configuration=cfg,
            createdTime=m.createdTime)
        adds = write_files(data, self.log.table_path,
                           list(m.partitionColumns),
                           indexed_cols=stats_columns(cfg),
                           data_change=False,
                           materialize_partitions=str(cfg.get(
                               "delta.enableMaterializePartitionColumnsFeature",
                               "false")).lower() == "true")
        removes = [f.remove(data_change=False) for f in snap.all_files]
        return txn.commit([new_meta] + adds + removes,
                          "REMOVE COLUMN MAPPING", {})

    @staticmethod
    def _edit_field_at(schema: T.StructType, parts: list[str], repl):
        """Rebuild `schema` with the StructField at the dotted path
        `parts` replaced by repl(field) (None drops it). Raises when
        the path is absent or traverses a non-struct. Matching is
        case-insensitive, like Spark resolution."""
        head, rest = parts[0], parts[1:]
        out, found = [], False
        for fl in schema.fields:
            if fl.name.lower() == head.lower():
                found = True
                if rest:
                    if not isinstance(fl.dataType, T.StructType):
                        raise ValueError(
                            f"column {head!r} is not a struct")
                    inner = DeltaTable._edit_field_at(
                        fl.dataType, rest, repl)
                    if not inner.fields:
                        raise ValueError(
                            f"cannot drop the last field of struct {head!r}")
                    out.append(T.StructField(
                        fl.name, inner, fl.nullable, fl.metadata))
                else:
                    nf = repl(fl)
                    if nf is not None:
                        out.append(nf)
            else:
                out.append(fl)
        if not found:
            raise ValueError(f"no such column {head!r}")
        return T.StructType(out)

    @staticmethod
    def _sibling_names(schema: T.StructType, parts: list[str]) -> list[str]:
        node = schema
        for p in parts[:-1]:
            match = [fl for fl in node.fields if fl.name.lower() == p.lower()]
            if not match:
                raise ValueError(f"no such column {p!r}")
            if not isinstance(match[0].dataType, T.StructType):
                raise ValueError(f"column {p!r} is not a struct")
            node = match[0].dataType
        return [fl.name for fl in node.fields]

    def renameColumn(self, old: str, new: str) -> int:
        """ALTER TABLE RENAME COLUMN — metadata-only under column
        mapping (auto-enabled on first use; id mode kept as-is).
        Dotted paths rename NESTED struct fields (`s.aa` → field `aa`
        inside struct `s`), matching the reference's nested RENAME
        COLUMN support — the field keeps its physicalName/id metadata,
        so no data rewrite at any level."""
        from delta_spark.schema import column_mapping_mode

        snap0 = self.log.update()
        from delta_spark.schema import expressions_referencing

        deps = expressions_referencing(snap0.schema, snap0.configuration, old)
        if deps:
            raise ValueError(
                f"cannot rename column {old!r}: referenced by "
                + "; ".join(deps))
        from delta_spark.util import split_column_path
        parts = split_column_path(old)
        new_leaf = split_column_path(new)[-1]
        # validate BEFORE the irreversible mapping upgrade: a rejected
        # rename must not leave the table protocol-bumped as a side
        # effect (the upgrade commits metadata + reader 2 / writer 5)
        siblings0 = self._sibling_names(snap0.schema, parts)
        if parts[-1].lower() not in (n.lower() for n in siblings0):
            raise ValueError(f"no such column {old!r}")
        if new_leaf.lower() != parts[-1].lower() and \
                new_leaf.lower() in (n.lower() for n in siblings0):
            raise ValueError(f"column {new_leaf!r} already exists")
        if column_mapping_mode(snap0.configuration) not in ("name", "id"):
            self.enableColumnMapping()

        def f(m: Metadata):
            schema = schema_from_json(m.schemaString)
            siblings = self._sibling_names(schema, parts)
            # case-insensitive collision check (Spark resolution is
            # case-insensitive by default); a case-only rename of the
            # same column is allowed
            if new_leaf.lower() != parts[-1].lower() and \
                    new_leaf.lower() in (n.lower() for n in siblings):
                raise ValueError(f"column {new_leaf!r} already exists")
            return self._edit_field_at(
                schema, parts,
                lambda fl: T.StructField(new_leaf, fl.dataType,
                                         fl.nullable, fl.metadata))
        # metadata.partitionColumns hold LOGICAL names — a renamed
        # partition column must follow, or partition pruning under the
        # new name silently stops engaging
        return self._update_schema(
            f, "RENAME COLUMN", {"from": old, "to": new},
            partition_fn=lambda pcs: [new_leaf if c == old else c
                                      for c in pcs])

    def changeColumnType(self, name: str, new_type) -> int:
        """ALTER TABLE CHANGE COLUMN ... TYPE — metadata-only type
        widening (TypeWidening.scala): old narrow Parquet files are
        served by Spark's widened-read support, no rewrite.  Requires
        ``delta.enableTypeWidening=true``."""
        from delta_spark.schema import (
            TYPE_WIDENING_PROP,
            is_widening_supported,
            record_type_change,
        )

        if isinstance(new_type, str):
            new_type = T._parse_datatype_string(new_type)
        snap = self.log.update()
        cfg = snap.configuration
        if str(cfg.get(TYPE_WIDENING_PROP, "false")).lower() != "true":
            raise ValueError(
                f"type widening requires {TYPE_WIDENING_PROP}=true")
        if name in snap.partition_columns:
            raise ValueError("cannot change the type of a partition column")

        def f(m):
            schema = schema_from_json(m.schemaString)
            fields = []
            found = False
            for fl in schema.fields:
                if fl.name == name:
                    found = True
                    if not is_widening_supported(fl.dataType, new_type):
                        raise ValueError(
                            f"unsupported type change for {name!r}: "
                            f"{fl.dataType.simpleString()} -> "
                            f"{new_type.simpleString()} (only widening "
                            "changes are allowed)")
                    fields.append(record_type_change(fl, new_type))
                else:
                    fields.append(fl)
            if not found:
                raise ValueError(f"no such column: {name}")
            return T.StructType(fields)

        return self._update_schema(
            f, "CHANGE COLUMN",
            {"column": name, "toType": new_type.simpleString()})

    def _alter_column_meta(self, name: str, field_fn, op_params: dict) -> int:
        """Shared ALTER COLUMN plumbing: resolve `name` case-
        insensitively, rewrite that one field via field_fn, commit a
        metadata-only CHANGE COLUMN."""
        def f(m: Metadata):
            schema = schema_from_json(m.schemaString)
            fields, found = [], False
            for fl in schema.fields:
                if fl.name.lower() == name.lower():
                    found = True
                    fields.append(field_fn(fl))
                else:
                    fields.append(fl)
            if not found:
                raise ValueError(f"no such column: {name}")
            return T.StructType(fields)

        return self._update_schema(f, "CHANGE COLUMN",
                                   {"column": name, **op_params})

    def setColumnNullability(self, name: str, nullable: bool) -> int:
        """ALTER TABLE ... ALTER COLUMN SET/DROP NOT NULL. DROP NOT
        NULL is metadata-only; SET NOT NULL first verifies no existing
        NULLs with a table scan (alterDeltaTableCommands.scala:1037
        verifyColumnChange), exactly like the reference."""
        if not nullable:
            if self.toDF().filter(F.col(name).isNull()).limit(1).count():
                raise ValueError(
                    f"cannot SET NOT NULL on {name!r}: existing rows "
                    "contain NULL values")
        return self._alter_column_meta(
            name,
            lambda fl: T.StructField(fl.name, fl.dataType, nullable, fl.metadata),
            {"nullable": json.dumps(nullable)})

    def setColumnDefault(self, name: str, expr: str) -> int:
        """ALTER TABLE ... ALTER COLUMN SET DEFAULT <expr>
        (DeltaColumnDefaults / protocol `allowColumnDefaults`; the
        feature is auto-added by the commit). The expression must be
        constant-foldable, matching Spark's default-column contract."""
        # validate it parses and evaluates without any input row
        self.spark.sql(f"SELECT {expr}").collect()

        def f(fl):
            md = dict(fl.metadata or {})
            md["CURRENT_DEFAULT"] = expr
            return T.StructField(fl.name, fl.dataType, fl.nullable, md)

        return self._alter_column_meta(name, f, {"default": expr})

    def dropColumnDefault(self, name: str) -> int:
        """ALTER TABLE ... ALTER COLUMN DROP DEFAULT."""
        def f(fl):
            md = dict(fl.metadata or {})
            md.pop("CURRENT_DEFAULT", None)
            return T.StructField(fl.name, fl.dataType, fl.nullable, md)

        return self._alter_column_meta(name, f, {"default": json.dumps(None)})

    def replaceColumns(self, fields: list[T.StructField]) -> int:
        """ALTER TABLE REPLACE COLUMNS (col_spec, ...) — reorder, add
        columns, change comments/nullability in one metadata commit
        (AlterTableReplaceColumnsDeltaCommand:1154). Existing columns
        keep their field metadata (mapping ids, generation exprs);
        types may only stay equal or widen (when enabled); identity
        tables are not supported (DeltaErrors
        identityColumnReplaceColumnsNotSupported); dropping requires
        DROP COLUMN."""
        from delta_spark.schema import (
            TYPE_WIDENING_PROP,
            identity_info,
            is_widening_supported,
            record_type_change,
        )

        snap = self.log.update()
        if identity_info(snap.schema):
            raise ValueError(
                "REPLACE COLUMNS is not supported on tables with "
                "IDENTITY columns")
        widening = str(snap.configuration.get(
            TYPE_WIDENING_PROP, "false")).lower() == "true"

        def f(m: Metadata):
            schema = schema_from_json(m.schemaString)
            old = {fl.name.lower(): fl for fl in schema.fields}
            new_names = {fl.name.lower() for fl in fields}
            if len(new_names) != len(fields):
                seen, dups = set(), []
                for fl in fields:
                    if fl.name.lower() in seen:
                        dups.append(fl.name)
                    seen.add(fl.name.lower())
                raise ValueError(
                    f"REPLACE COLUMNS has duplicate column names: {dups}")
            missing = [fl.name for fl in schema.fields
                       if fl.name.lower() not in new_names]
            if missing:
                raise ValueError(
                    f"REPLACE COLUMNS cannot drop columns {missing}; "
                    "use ALTER TABLE DROP COLUMN")
            out = []
            for fl in fields:
                ex = old.get(fl.name.lower())
                if ex is None:  # brand-new column
                    if not fl.nullable:
                        # alterDeltaTableCommands.scala:620 — existing
                        # rows cannot satisfy NOT NULL on a new column
                        raise ValueError(
                            "Operation not supported: NOT NULL on a "
                            f"new column in REPLACE COLUMNS ({fl.name})")
                    out.append(T.StructField(fl.name, fl.dataType, True,
                                             fl.metadata))
                    continue
                md = dict(ex.metadata or {})
                if fl.metadata and fl.metadata.get("comment"):
                    md["comment"] = fl.metadata["comment"]
                if fl.dataType == ex.dataType:
                    nf = T.StructField(ex.name, ex.dataType, fl.nullable, md)
                elif widening and is_widening_supported(ex.dataType, fl.dataType):
                    if ex.name in (m.partitionColumns or []):
                        # same policy as changeColumnType: partition
                        # values are stored as strings in file paths /
                        # partitionValues and retyped on read — a type
                        # change breaks that contract
                        raise ValueError(
                            "cannot change the type of a partition "
                            f"column {ex.name!r}")
                    nf = record_type_change(
                        T.StructField(ex.name, ex.dataType, fl.nullable, md),
                        fl.dataType)
                else:
                    raise ValueError(
                        f"REPLACE COLUMNS cannot change the type of "
                        f"{ex.name!r}: {ex.dataType.simpleString()} -> "
                        f"{fl.dataType.simpleString()}")
                if not fl.nullable and ex.nullable:
                    raise ValueError(
                        f"REPLACE COLUMNS cannot tighten nullability of "
                        f"{ex.name!r}; use ALTER COLUMN SET NOT NULL")
                out.append(nf)
            return T.StructType(out)

        return self._update_schema(
            f, "REPLACE COLUMNS",
            {"columns": json.dumps([fl.name for fl in fields])})

    def moveColumn(self, name: str, position) -> int:
        """ALTER TABLE ... ALTER COLUMN <c> FIRST / AFTER <other> —
        metadata-only reorder (AlterTableChangeColumnDeltaCommand
        position handling; parquet resolves by name/field-id, so no
        data moves)."""
        def f(m: Metadata):
            schema = schema_from_json(m.schemaString)
            fields = list(schema.fields)
            idx = next((i for i, fl in enumerate(fields)
                        if fl.name.lower() == name.lower()), None)
            if idx is None:
                raise ValueError(f"no such column: {name}")
            fl = fields.pop(idx)
            if position == "first":
                fields.insert(0, fl)
            else:
                anchor = position[1].lower()
                j = next((i for i, x in enumerate(fields)
                          if x.name.lower() == anchor), None)
                if j is None:
                    raise ValueError(
                        f"AFTER column {position[1]!r} does not exist")
                fields.insert(j + 1, fl)
            return T.StructType(fields)

        return self._update_schema(f, "CHANGE COLUMN",
                                   {"column": name,
                                    "position": json.dumps(list(position))
                                    if position != "first" else '"first"'})

    def setColumnComment(self, name: str, comment: str) -> int:
        """ALTER TABLE ... ALTER COLUMN COMMENT '<text>' (stored under
        the standard StructField `comment` metadata key)."""
        def f(fl):
            md = dict(fl.metadata or {})
            md["comment"] = comment
            return T.StructField(fl.name, fl.dataType, fl.nullable, md)

        return self._alter_column_meta(name, f, {"comment": comment})

    def dropColumn(self, name: str) -> int:
        """ALTER TABLE DROP COLUMN — metadata-only under column mapping
        (data remains in files; unreadable until REORG/PURGE rewrites).
        Refuses while a CHECK constraint or another column's generation
        expression references the column (the stored SQL text would
        dangle — SchemaUtils findDependentConstraints role)."""
        from delta_spark.schema import column_mapping_mode, expressions_referencing

        snap0 = self.log.update()
        deps = expressions_referencing(snap0.schema, snap0.configuration, name)
        if deps:
            raise ValueError(
                f"cannot drop column {name!r}: referenced by "
                + "; ".join(deps))
        from delta_spark.util import split_column_path
        parts = split_column_path(name)
        # validate BEFORE the irreversible mapping upgrade (see
        # renameColumn): a rejected drop must not bump the protocol
        siblings0 = self._sibling_names(snap0.schema, parts)
        if parts[-1].lower() not in (n.lower() for n in siblings0):
            raise ValueError(f"no such column {name!r}")
        if len(siblings0) == 1:
            raise ValueError("cannot drop the last column")
        if name in snap0.partition_columns:
            raise ValueError("cannot drop a partition column")
        if column_mapping_mode(snap0.configuration) not in ("name", "id"):
            self.enableColumnMapping()

        def f(m: Metadata):
            schema = schema_from_json(m.schemaString)
            if len(self._sibling_names(schema, parts)) == 1:
                raise ValueError("cannot drop the last column")
            return self._edit_field_at(schema, parts, lambda fl: None)
        return self._update_schema(f, "DROP COLUMNS", {"columns": json.dumps([name])})

    def syncIdentity(self) -> int:
        """ALTER TABLE ... SYNC IDENTITY (IdentityColumn.scala:53,
        grammar DeltaSqlBase.g4:94): advance each identity column's high
        watermark to the max value present in the table, so generation
        resumes past explicitly-inserted values. One metadata-only
        commit; the max is a stats-friendly distributed agg."""
        from delta_spark.schema import (
            IDENTITY_HIGH_WATERMARK_KEY,
            identity_info,
        )

        snap = self.log.update()
        info = identity_info(snap.schema)
        if not info:
            raise ValueError("table has no identity columns")
        # directional agg: the most-advanced value is the MIN for a
        # negative INCREMENT BY step
        row = self.toDF().agg(
            *[(F.max(c) if int(i["step"]) > 0 else F.min(c)).alias(c)
              for c, i in info.items()]).collect()[0].asDict()

        def f(m: Metadata):
            schema = schema_from_json(m.schemaString)
            fields = []
            for fl in schema.fields:
                if fl.name in info and row.get(fl.name) is not None:
                    md = dict(fl.metadata or {})
                    step = info[fl.name]["step"]
                    cur = md.get(IDENTITY_HIGH_WATERMARK_KEY)
                    new_hwm = int(row[fl.name])
                    # the watermark only ever advances in step direction
                    if cur is None or (new_hwm - int(cur)) * step > 0:
                        md[IDENTITY_HIGH_WATERMARK_KEY] = new_hwm
                    fields.append(T.StructField(fl.name, fl.dataType,
                                                fl.nullable, md))
                else:
                    fields.append(fl)
            return T.StructType(fields)

        return self._update_schema(f, "SYNC IDENTITY",
                                   {"columns": json.dumps(sorted(info))})

    def alterClusterBy(self, cols: Optional[list[str]]) -> int:
        """ALTER TABLE ... CLUSTER BY (cols) / CLUSTER BY NONE
        (alterDeltaTableCommands.scala clustering branch): swap the
        clustering columns in the `delta.clustering` metadata domain.
        Metadata-only; data is re-clustered by the next OPTIMIZE."""
        from delta_spark.actions import DomainMetadata

        txn = OptimisticTransaction(self.log)
        if txn.metadata is None:
            raise ValueError("table does not exist")
        names = {f.name for f in txn.snapshot.schema.fields}
        for c in cols or []:
            if c not in names:
                raise ValueError(f"unknown clustering column {c!r}")
        dm = DomainMetadata(
            domain="delta.clustering",
            configuration=json.dumps({"clusteringColumns": list(cols or [])}),
            removed=False)
        actions: list = [dm]
        if cols:
            # converting a plain table to clustered requires the
            # clustering + domainMetadata writer features
            # (ClusteredTableUtils.isSupported gate)
            from delta_spark.actions import merge_protocol

            p = txn.snapshot.protocol or Protocol()
            have = set(p.writerFeatures or [])
            if not {"clustering", "domainMetadata"} <= have:
                actions.insert(0, merge_protocol(
                    p, writer_feats={"clustering", "domainMetadata"}))
        return txn.commit(actions, "CLUSTER BY",
                          {"clusterBy": json.dumps(list(cols or []))})

    def _update_metadata(self, config_fn, op: str, params: dict) -> int:
        self._no_time_travel(op)
        txn = OptimisticTransaction(self.log)
        m = txn.metadata
        if m is None:
            raise ValueError("table does not exist")
        new_cfg = config_fn(m)
        new = Metadata(id=m.id, name=m.name, description=m.description, format=m.format,
                       schemaString=m.schemaString, partitionColumns=m.partitionColumns,
                       configuration=new_cfg, createdTime=m.createdTime)
        actions: list = [new]
        def _rt_on(cfg: dict) -> bool:
            # icebergCompatV3 force-enables row tracking at the commit
            # seam (RequireRowTracking autoSetValue), so enabling it IS
            # enabling row tracking for backfill purposes
            return (str(cfg.get("delta.enableRowTracking",
                                "false")).lower() == "true"
                    or str(cfg.get("delta.enableIcebergCompatV3",
                                   "false")).lower() == "true")

        enabling_row_tracking = (_rt_on(new_cfg)
                                 and not _rt_on(m.configuration or {}))
        if enabling_row_tracking:
            # RowTrackingBackfillCommand role: enabling row tracking on
            # a populated table re-commits every AddFile lacking a
            # baseRowId (dataChange=false, metadata-only) so id ranges
            # exist before the first read — otherwise every legacy file
            # would default to base 0 and ids would collide
            from dataclasses import replace as _replace

            actions.extend(
                _replace(f, dataChange=False, baseRowId=None)
                for f in txn.snapshot.all_files if f.baseRowId is None)
        return txn.commit(actions, op, params)

    def _update_schema(self, schema_fn, op: str, params: dict,
                       partition_fn=None) -> int:
        txn = OptimisticTransaction(self.log)
        m = txn.metadata
        if m is None:
            raise ValueError("table does not exist")
        new_schema = schema_fn(m)
        part_cols = (partition_fn(list(m.partitionColumns))
                     if partition_fn else m.partitionColumns)
        cfg = m.configuration
        from delta_spark.schema import (
            COLUMN_MAPPING_MAX_ID_KEY,
            assign_physical_names,
            column_mapping_mode,
            field_id,
        )
        if column_mapping_mode(cfg) in ("name", "id"):
            # columns introduced after the mapping upgrade must get
            # engine-generated physical names (DeltaColumnMapping
            # assignColumnIdAndPhysicalName) — reusing the logical name
            # would resurrect a previously dropped column's data still
            # present under that physical name in old files
            from delta_spark.schema import max_field_id
            start = max(int(cfg.get(COLUMN_MAPPING_MAX_ID_KEY, 0)),
                        max_field_id(new_schema))
            mapped, max_id = assign_physical_names(
                new_schema, start_id=start, reuse_logical=False)
            if mapped != new_schema:
                new_schema = mapped
                cfg = {**cfg, COLUMN_MAPPING_MAX_ID_KEY: str(max_id)}
        new = Metadata(id=m.id, name=m.name, description=m.description, format=m.format,
                       schemaString=schema_to_json(new_schema),
                       partitionColumns=part_cols,
                       configuration=cfg, createdTime=m.createdTime)
        return txn.commit([new], op, params)


class AliasedDeltaTable(DeltaTable):
    """`dt.alias("t").merge(src.alias-less, cond)` convenience matching
    the reference Python API's aliasing flow."""

    def __init__(self, spark: SparkSession, log: DeltaLog, alias_name: str,
                 pinned_version: Optional[int] = None):
        super().__init__(spark, log)
        self._alias = alias_name
        self._pinned_version = pinned_version

    def merge(self, source: DataFrame, condition: Union[str, Column],
              source_alias: str = "source", target_alias: Optional[str] = None) -> MergeBuilder:
        self._no_time_travel("MERGE")
        if source_alias == "source":
            source_alias = _df_alias(source) or "source"
        return MergeBuilder(self.spark, self.log, source, _cond_to_sql(condition),
                            source_alias, target_alias or self._alias)


@dataclass
class IdentityGenerator:
    """Identity column spec for DeltaTableBuilder.addColumn
    (python/delta/tables.py:1278): GENERATED ALWAYS AS IDENTITY
    (START WITH start INCREMENT BY step)."""
    start: int = 1
    step: int = 1

    def __post_init__(self):
        if int(self.step) == 0:
            raise ValueError("identity step cannot be 0")


class DeltaTableBuilder:
    """CREATE/REPLACE TABLE builder (io/delta/tables/DeltaTableBuilder.scala;
    python tables.py:1290-1623): columns, partitioning, properties,
    comments, GENERATED ALWAYS AS — commit 0 carries Protocol+Metadata."""

    def __init__(self, spark: SparkSession, mode: str):
        self.spark = spark
        self.mode = mode
        self._location: Optional[str] = None
        self._name: Optional[str] = None
        self._comment: Optional[str] = None
        self._fields: list[T.StructField] = []
        self._partition_cols: list[str] = []
        self._cluster_cols: list[str] = []
        self._properties: dict[str, str] = {}

    def tableName(self, identifier: str) -> "DeltaTableBuilder":
        self._name = identifier
        return self

    def location(self, location: str) -> "DeltaTableBuilder":
        self._location = location
        return self

    def comment(self, comment: str) -> "DeltaTableBuilder":
        self._comment = comment
        return self

    def addColumn(self, colName: str, dataType: Union[str, T.DataType],
                  nullable: bool = True,
                  generatedAlwaysAs: Union[str, "IdentityGenerator", None] = None,
                  generatedByDefaultAs: Optional["IdentityGenerator"] = None,
                  comment: Optional[str] = None, default: Optional[str] = None) -> "DeltaTableBuilder":
        """``generatedAlwaysAs`` takes a SQL expression (generated
        column) or an IdentityGenerator (GENERATED ALWAYS AS IDENTITY);
        ``generatedByDefaultAs`` takes an IdentityGenerator that allows
        explicit inserts (python/delta/tables.py:1398-1460)."""
        if isinstance(dataType, str):
            dataType = _parse_type(dataType)
        md = {}
        if generatedAlwaysAs is not None and generatedByDefaultAs is not None:
            raise ValueError(
                "generatedByDefaultAs and generatedAlwaysAs cannot both be set")
        gen = generatedAlwaysAs if isinstance(generatedAlwaysAs, IdentityGenerator) \
            else generatedByDefaultAs
        if gen is not None:
            from delta_spark.schema import (
                IDENTITY_ALLOW_EXPLICIT_KEY,
                IDENTITY_START_KEY,
                IDENTITY_STEP_KEY,
            )
            if not isinstance(dataType, T.LongType):
                raise ValueError("identity columns must be BIGINT")
            md[IDENTITY_START_KEY] = int(gen.start)
            md[IDENTITY_STEP_KEY] = int(gen.step)
            if gen is generatedByDefaultAs:
                md[IDENTITY_ALLOW_EXPLICIT_KEY] = True
        elif generatedAlwaysAs is not None:
            md[GENERATION_EXPRESSION_KEY] = generatedAlwaysAs
        if default is not None:
            from delta_spark.schema import DEFAULT_VALUE_KEY
            md[DEFAULT_VALUE_KEY] = default
        if comment is not None:
            md["comment"] = comment
        self._fields.append(T.StructField(colName, dataType, nullable, md))
        return self

    def clusterBy(self, *cols: str) -> "DeltaTableBuilder":
        """Clustered (liquid) table: clustering columns live in a
        metadata domain (clustering/ClusteringMetadataDomain.scala:1-42);
        OPTIMIZE uses them as Z-order dimensions."""
        self._cluster_cols = list(cols)
        return self

    def addColumns(self, cols: Union[T.StructType, list]) -> "DeltaTableBuilder":
        fields = cols.fields if isinstance(cols, T.StructType) else list(cols)
        self._fields.extend(fields)
        return self

    def partitionedBy(self, *cols: str) -> "DeltaTableBuilder":
        self._partition_cols = list(cols)
        return self

    def property(self, key: str, value: str) -> "DeltaTableBuilder":
        self._properties[key] = value
        return self

    def execute(self) -> DeltaTable:
        if not self._location:
            if not self._name:
                raise ValueError("tableName() or location() is required")
            # managed named table: resolve (or derive) the warehouse
            # location like DeltaCatalog.createDeltaTable
            from delta_spark import catalog as C
            self._location = (C.resolve(self.spark, self._name)
                              or C.default_location(self.spark, self._name))
        log = DeltaLog.for_table(self._location)
        exists = log.table_exists()
        if exists and self.mode == "create":
            raise ValueError(f"table already exists at {self._location}")
        if exists and self.mode == "createIfNotExists":
            return DeltaTable(self.spark, log)
        if not exists and self.mode == "replace":
            raise ValueError(f"cannot replace: no table at {self._location}")
        schema = T.StructType(self._fields)
        cm_mode = self._properties.get("delta.columnMapping.mode")
        if cm_mode in ("name", "id"):
            from delta_spark.schema import assign_physical_names
            schema, max_id = assign_physical_names(schema)
            self._properties.setdefault("delta.columnMapping.maxColumnId", str(max_id))
        meta = Metadata(
            name=self._name, description=self._comment,
            schemaString=schema_to_json(schema),
            partitionColumns=self._partition_cols,
            configuration=dict(self._properties),
            createdTime=current_time_millis())
        txn = OptimisticTransaction(log)
        actions: list = [meta]
        if self._cluster_cols:
            from delta_spark.actions import DomainMetadata
            actions.append(DomainMetadata(
                domain="delta.clustering",
                configuration=json.dumps({"clusteringColumns": self._cluster_cols})))
        if exists:  # replace: drop existing data
            txn.read_whole_table()
            actions += [f.remove() for f in txn.snapshot.all_files]
            meta.id = txn.metadata.id if txn.metadata else meta.id
            op = "REPLACE TABLE"
        else:
            op = "CREATE TABLE"
        txn.commit(actions, op, {"partitionBy": json.dumps(self._partition_cols),
                                 "properties": json.dumps(self._properties)})
        if self._name:
            from delta_spark import catalog as C
            C.register_table(self.spark, self._name, self._location)
        return DeltaTable(self.spark, log)


def _parse_type(s: str) -> T.DataType:
    return T._parse_datatype_string(s)


def _to_millis(ts: Union[str, _dt.datetime, int]) -> int:
    from delta_spark.util import to_millis

    return to_millis(ts)
