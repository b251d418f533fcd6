"""Optimistic concurrency: read → act → atomically commit → on
collision, classify conflicts and retry.

Mirrors the reference's OptimisticTransaction.scala (commit :1729,
doCommitRetryIteratively :2761, checkForConflicts :3230 →
ConflictChecker.scala:245) and the three isolation levels
(isolationLevels.scala:27,37,54): Serializable, WriteSerializable
(default), SnapshotIsolation.

Conflict classification against each winning commit:
  * protocol change            → ProtocolChangedException
  * metadata change            → MetadataChangedException
  * files added that match our read predicates (and we are not a blind
    append)                    → ConcurrentAppendException
  * files removed that we read → ConcurrentDeleteReadException
  * files removed that we also remove → ConcurrentDeleteDeleteException
  * same SetTransaction appId  → ConcurrentTransactionException
  * same DomainMetadata domain → ConcurrentDomainMetadataException
"""

from __future__ import annotations

import os
from typing import Any, Optional

from delta_spark import geo, predicates as P
from delta_spark.actions import (
    AddCDCFile,
    AddFile,
    CommitInfo,
    DomainMetadata,
    Metadata,
    Protocol,
    RemoveFile,
    SetTransaction,
    action_to_json_line,
)
from delta_spark.log import (
    ConcurrentModificationException,
    DeltaConcurrentException,
    DeltaLog,
)
from delta_spark.snapshot import Snapshot
from delta_spark.stats import parse_stats_view
from delta_spark.util import current_time_millis

SERIALIZABLE = "Serializable"
WRITE_SERIALIZABLE = "WriteSerializable"
SNAPSHOT_ISOLATION = "SnapshotIsolation"




class ConcurrentWriteException(DeltaConcurrentException):
    """Generic winning-write conflict (reference
    python/delta/exceptions/base.py:30): raised when a concurrent
    transaction wrote after this one read and no more specific
    classification applies — retry exhaustion and same-domain
    DomainMetadata races land here."""


class ProtocolChangedException(DeltaConcurrentException):
    pass


class MetadataChangedException(DeltaConcurrentException):
    pass


class ConcurrentAppendException(DeltaConcurrentException):
    pass


class ConcurrentDeleteReadException(DeltaConcurrentException):
    pass


class ConcurrentDeleteDeleteException(DeltaConcurrentException):
    pass


class ConcurrentTransactionException(DeltaConcurrentException):
    pass


MAX_RETRIES = 10


class WinningCommitSummary:
    """Lazy view of a winning commit for conflict classification
    (ConflictChecker.scala:120 WinningCommitSummary). The raw commit
    text is read once; each category access does a substring pre-probe
    (cheap C-level scan) and JSON-parses ONLY the matching lines, so a
    10^5-add winning commit (backfill, big append) costs O(#removes +
    #metadata-class lines) per retry instead of O(commit size) — the
    adds stream one line at a time, and only when the append check
    actually needs them. The full parse happens once, on the
    no-conflict absorb path. Stats blobs inside add lines are never
    parsed unless that add reaches the predicate check."""

    def __init__(self, log: DeltaLog, version: int):
        content = log.store.read(log.commit_source(version))
        self._lines = [ln for ln in content.splitlines() if ln.strip()]

    def iter_actions(self, kind: str):
        """Parsed actions of one kind, streaming. The substring probe
        can false-positive (a column literally named like an action
        key inside a stats blob), so every hit is confirmed by the
        parse."""
        from delta_spark.log import parse_action_line

        marker = f'"{kind}"'
        for ln in self._lines:
            if marker not in ln:
                continue
            k, a = parse_action_line(ln)
            if k == kind:
                yield a

    def parsed(self, kind: str) -> list:
        return list(self.iter_actions(kind))

    def any(self, kind: str) -> bool:
        return next(self.iter_actions(kind), None) is not None

    def all_actions(self) -> list[tuple[str, Any]]:
        from delta_spark.log import parse_action_line

        return [parse_action_line(ln) for ln in self._lines]


def _validate_checkpoint_interval(cfg: Optional[dict]) -> None:
    """DeltaConfigs.CHECKPOINT_INTERVAL: 'needs to be a positive
    integer'. Rejecting at metadata-commit time (SET TBLPROPERTIES /
    CREATE) beats silently never checkpointing, which would also
    disable expired-log cleanup and make every snapshot replay the
    full log."""
    raw = (cfg or {}).get("delta.checkpointInterval")
    if raw is None:
        return
    try:
        ok = int(str(raw).strip()) > 0
    except ValueError:
        ok = False
    if not ok:
        raise ValueError(
            f"delta.checkpointInterval needs to be a positive integer, "
            f"got {raw!r}")


class OptimisticTransaction:
    def __init__(self, log: DeltaLog, snapshot: Optional[Snapshot] = None,
                 spark=None):
        self.log = log
        self.snapshot = snapshot if snapshot is not None else log.update()
        self.read_version = self.snapshot.version
        self._spark = spark  # set on distributed-planning transactions
        # what we read, for conflict detection
        self.read_predicates: list[str] = []   # SQL predicate strings
        self.read_files: set[str] = set()      # paths we depend on
        self.read_whole_table_flag = False
        self._committed = False

    # ------------------------------------------------------ recording ----

    def files_for_scan(self, predicate: Optional[str] = None, limit: Optional[int] = None) -> list[AddFile]:
        if (self.snapshot.files_unloaded and self._spark is not None
                and predicate):
            # distributed candidate selection: state reconstruction +
            # stats pruning run executor-side; only the pruned
            # survivors are collected (DataSkippingReader.filesForScan)
            from delta_spark.log import addfiles_from_state_rows

            files = addfiles_from_state_rows(
                self.log.files_for_scan_df(
                    self._spark, predicate, version=self.read_version,
                    limit=limit).collect())
        else:
            files = self.snapshot.files_for_scan(predicate, limit)
        if predicate:
            self.read_predicates.append(predicate)
        else:
            self.read_whole_table_flag = True
        self.read_files.update(f.path for f in files)
        return files

    def read_whole_table(self) -> None:
        self.read_whole_table_flag = True
        self.read_files.update(self.snapshot.active.keys())

    def txn_version(self, app_id: str) -> Optional[int]:
        return self.snapshot.txn_version(app_id)

    @property
    def metadata(self) -> Optional[Metadata]:
        return self.snapshot.metadata

    # -------------------------------------------------------- commit ----

    def commit(self, actions: list[Any], operation: str,
               operation_parameters: Optional[dict] = None,
               operation_metrics: Optional[dict] = None,
               isolation_level: Optional[str] = None,
               user_metadata: Optional[str] = None) -> int:
        """Write the next version file; retry through conflicts.
        Returns the committed version."""
        if self._committed:
            raise RuntimeError("transaction already committed")
        pst = getattr(self, "_pending_set_transaction", None)
        if pst is not None and not any(
                isinstance(a, SetTransaction) and a.appId == pst.appId
                for a in actions):
            # idempotency marker attached by the DML entry point
            # (resolve_idempotent_txn) — recorded with whichever commit
            # the command ends up making, including 0-row commits
            actions = list(actions) + [pst]
        from delta_spark.actions import check_write_protocol

        # writer gate (PROTOCOL.md Writer Requirements): never commit to
        # a table whose protocol demands features we don't implement
        check_write_protocol(self.snapshot.protocol)
        actions = list(actions)
        self._validate(actions)

        is_blind_append = (
            not self.read_files
            and not self.read_whole_table_flag
            and all(isinstance(a, (AddFile, SetTransaction, CommitInfo, AddCDCFile)) for a in actions)
            and all(a.dataChange for a in actions if isinstance(a, AddFile))
        )
        data_change = any(
            (isinstance(a, (AddFile, RemoveFile)) and a.dataChange) for a in actions
        )
        if isolation_level is None:
            # dataChange=false commits (OPTIMIZE) only rearrange data →
            # SnapshotIsolation suffices (isolationLevels.scala:70)
            has_file_actions = any(isinstance(a, (AddFile, RemoveFile)) for a in actions)
            isolation_level = (
                SNAPSHOT_ISOLATION if (has_file_actions and not data_change) else WRITE_SERIALIZABLE
            )

        commit_meta = next((a for a in actions if isinstance(a, Metadata)), None)
        effective_cfg = (commit_meta.configuration if commit_meta is not None
                         else self.snapshot.configuration)

        from delta_spark import catalog_managed as CM
        from delta_spark import redirect as R
        from delta_spark.coordinator import coordinator_for

        if self.read_version >= 0:
            # table redirect state gate (redirect.check_commit): out of
            # a quiescent redirect state only the transition commit and
            # noRedirectRules-allowed operations may land on the source.
            # Evaluating once before the retry loop is sound because a
            # concurrent winner that changes redirect state necessarily
            # commits a Metadata action, and _check_conflicts raises
            # MetadataChangedException on any winning metaData — stale
            # redirect state is never absorbed into a retry.
            R.check_commit(self.snapshot.configuration, effective_cfg,
                           operation)
        # Commit OWNERSHIP is decided by the PRE-commit state: the table
        # IS catalog-managed / coordinated at commit time, so even a
        # commit that alters the management properties must go through
        # the current owner. Routing from the post-commit config would
        # let an UNSET-properties commit land via filesystem
        # put-if-absent while the catalog's ratified ceiling stays
        # behind — readers would ignore it, and a later ratified commit
        # could reuse the same version with different content (a forked
        # log). New tables (read_version < 0) take ownership from the
        # commit's own metadata.
        pre_cfg = self.snapshot.configuration if self.read_version >= 0 else {}
        pre_catalog = CM.client_for(pre_cfg)
        post_catalog = CM.client_for(effective_cfg)
        if (pre_catalog is not None and commit_meta is not None
                and (effective_cfg or {}).get(CM.CATALOG_PROP)
                != pre_cfg.get(CM.CATALOG_PROP)
                and not getattr(self, "_allow_catalog_handover", False)):
            raise ValueError(
                "cannot change or drop the managing catalog via table "
                "properties: the commit would bypass the catalog's "
                "ratification ceiling and fork the log. Use "
                "DeltaTable.dropFeature('catalogManaged') for the "
                "handover flow (publish + release).")
        catalog = pre_catalog if pre_catalog is not None else post_catalog
        pre_coord = coordinator_for(pre_cfg)
        post_coord = coordinator_for(effective_cfg)
        coordinator = pre_coord if pre_coord is not None else post_coord
        if catalog is not None and coordinator is not None:
            raise ValueError(
                "a table cannot be both catalog-managed and use "
                "coordinated commits: exactly one party may own the "
                "commit protocol")
        attempt_version = self.read_version + 1
        # AddFiles whose baseRowId WE assigned: must be re-assigned on a
        # retry, because an absorbed winner may have claimed the range
        auto_rowid: set[int] = set()
        for attempt in range(MAX_RETRIES + 1):
            # in-commit timestamps (PROTOCOL.md:1979): when enabled, the
            # commit timestamp is CommitInfo.timestamp, forced monotonic
            # w.r.t. the previous commit (clock skew cannot reorder
            # history). Recomputed per attempt: an absorbed winner's
            # timestamp moves the floor.
            ts = current_time_millis()
            ict_on = (str(self.snapshot.configuration.get(
                "delta.enableInCommitTimestamps", "false")).lower() == "true"
                or str((effective_cfg or {}).get(
                    "delta.enableInCommitTimestamps",
                    "false")).lower() == "true")
            if ict_on:
                ts = max(ts, (self.snapshot.timestamp or 0) + 1)
            commit_info = CommitInfo(
                # PROTOCOL.md ICT: the monotonic commit time goes in the
                # dedicated inCommitTimestamp field — external readers
                # resolve time travel from it, not from `timestamp`
                inCommitTimestamp=ts if ict_on else None,
                timestamp=ts,
                operation=operation,
                operationParameters=operation_parameters or {},
                readVersion=self.read_version if self.read_version >= 0 else None,
                isolationLevel=isolation_level,
                isBlindAppend=is_blind_append,
                operationMetrics=operation_metrics or {},
                userMetadata=user_metadata,
            )
            # row tracking (RowId.scala / PROTOCOL.md:1638): when
            # enabled, every committed AddFile gets a fresh baseRowId
            # range; recomputed per attempt so ranges never collide with
            # an absorbed winner's files
            if str((effective_cfg or {}).get(
                    "delta.enableRowTracking", "false")).lower() == "true":
                hwm = self._row_id_high_watermark()
                for a in actions:
                    if isinstance(a, AddFile) and (a.baseRowId is None
                                                   or id(a) in auto_rowid):
                        auto_rowid.add(id(a))
                        a.baseRowId = hwm + 1
                        hwm += max(a.num_records or 0, 1)
                        # default row commit version = the version this
                        # file lands in (PROTOCOL.md:1712); re-stamped
                        # per retry attempt alongside the id range
                        a.defaultRowCommitVersion = attempt_version

            amt_ck = self._maybe_write_amt(attempt_version, actions,
                                           effective_cfg)
            payload = "\n".join(
                action_to_json_line(a)
                for a in [commit_info] + actions
                + ([amt_ck] if amt_ck is not None else [])) + "\n"
            try:
                if catalog is not None:
                    self._catalog_managed_write(catalog, attempt_version,
                                                payload, ts, effective_cfg)
                elif coordinator is None:
                    self.log.store.write_atomic(self.log.commit_file(attempt_version), payload)
                else:
                    self._coordinated_write(coordinator, attempt_version,
                                            payload, ts, effective_cfg)
                    if post_coord is None and commit_meta is not None:
                        # coordinator downgrade commit: force-complete
                        # the filesystem log — after this version nobody
                        # consults the coordinator, so every registered
                        # commit must be backfilled NOW or it is lost
                        from delta_spark import coordinator as C
                        C.backfill_to(self.log, coordinator,
                                      attempt_version)
                self._committed = True
                if amt_ck is not None:
                    # the next snapshot must come from the AMT bootstrap
                    # so leaf-resident AddFiles carry backReferences
                    self.log._amt_last = (attempt_version, amt_ck.d)
                    self.log.invalidate()
                self._post_commit(attempt_version, actions)
                return attempt_version
            except ConcurrentModificationException:
                # a winner took this version — classify and maybe retry.
                # The summary is LAZY (WinningCommitSummary role,
                # ConflictChecker.scala:120): category checks are
                # substring probes + per-line parses over the raw
                # commit text, so a 10^5-add winning commit costs O(1)
                # parses unless the append check genuinely needs its
                # stats — and the full parse happens once, only on the
                # no-conflict absorb path.
                winning = WinningCommitSummary(self.log, attempt_version)
                self._check_conflicts(winning, actions, isolation_level, is_blind_append)
                attempt_version += 1
        raise ConcurrentWriteException(
            f"exceeded {MAX_RETRIES} commit retries")

    def _coordinated_write(self, coordinator, version: int, payload: str,
                           ts: int, cfg: Optional[dict] = None) -> None:
        """Coordinated-commit write (coordinator.py module docstring):
        stage under a uuid name (race-free), register with the
        coordinator (linearization point — losers get a conflict and
        re-enter the normal retry/conflict-check path), then backfill
        per the batch policy: batchSize 1 backfills the classic numbered
        file immediately; larger batches leave the tail with the
        coordinator and backfill every batchSize-th commit
        (AbstractBatchBackfillingCommitCoordinatorClient)."""
        import uuid as _uuid

        from delta_spark import coordinator as C

        staged = os.path.join(self.log.log_path, C.STAGED_DIR,
                              f"{version:020d}.{_uuid.uuid4().hex}.json")
        self.log.store.write_atomic(staged, payload)
        try:
            coordinator.commit(self.log.log_path, version, staged, ts)
        except C.CommitConflictException as e:
            try:
                os.unlink(staged)
            except OSError:
                pass
            raise ConcurrentModificationException(str(e))
        bs = C.batch_size(cfg)
        if bs <= 1:
            try:
                self.log.store.write_atomic(self.log.commit_file(version), payload)
            except ConcurrentModificationException:
                pass  # a concurrent reader/writer already backfilled it
            # backfill_to, NOT register_backfill(version): a PREDECESSOR
            # registered by a writer that died before ITS backfill may
            # still be marker-only, and advancing the watermark past it
            # would drop the only pointer to that commit (data loss —
            # caught by tests/test_recovery_fuzz.py crash-window fuzz).
            # backfill_to fills every hole <= version first and never
            # advances the watermark past one it cannot fill.
            C.backfill_to(self.log, coordinator, version)
        elif version % bs == 0:
            C.backfill_to(self.log, coordinator, version)

    def _catalog_managed_write(self, catalog, version: int, payload: str,
                               ts: int, cfg: Optional[dict] = None) -> None:
        """Catalog-managed commit (PROTOCOL.md:1282 "Commit Protocol",
        option 1): stage the payload under a uuid name, then have the
        managing catalog RATIFY it — the linearization point (at most
        once per version, in order). Losers re-enter the conflict-check
        retry path. Writers never do filesystem put-if-absent against
        the table (PROTOCOL.md:1404). Ratified commits are promptly
        published unless autoPublish is off (readers then get them from
        the catalog's unpublished tail)."""
        import uuid as _uuid

        from delta_spark import catalog_managed as CM

        inline = str((cfg or {}).get(CM.INLINE_PROP, "false")).lower() == "true"
        staged = None
        if not inline:
            staged = os.path.join(self.log.log_path, CM.STAGED_DIR,
                                  f"{version:020d}.{_uuid.uuid4().hex}.json")
            self.log.store.write_atomic(staged, payload)
        try:
            catalog.ratify(self.log.log_path, version, ts,
                           staged_path=staged,
                           inline=payload if inline else None)
        except CM.CatalogCommitConflict as e:
            if staged is not None:
                try:
                    os.unlink(staged)
                except OSError:
                    pass
            raise ConcurrentModificationException(str(e))
        if CM.auto_publish(cfg):
            CM.publish(self.log, catalog, version)

    def _row_id_high_watermark(self) -> int:
        hwm = -1
        for f in self.snapshot.active.values():
            if f.baseRowId is not None:
                hwm = max(hwm, f.baseRowId + max(f.num_records or 0, 1) - 1)
        return hwm

    def _validate(self, actions: list[Any]) -> None:
        metadatas = [a for a in actions if isinstance(a, Metadata)]
        # delta.appendOnly (DeltaConfigs.IS_APPEND_ONLY): deleting or
        # changing data is forbidden; rearrangement (dataChange=false,
        # e.g. OPTIMIZE) is fine
        cfg = (metadatas[0].configuration if metadatas
               else self.snapshot.configuration) or {}
        if str(cfg.get("delta.appendOnly", "false")).lower() == "true":
            if any(isinstance(a, RemoveFile) and a.dataChange
                   for a in actions):
                raise ValueError(
                    "This table is configured to only allow appends "
                    "(delta.appendOnly=true); DELETE/UPDATE/MERGE/"
                    "overwrite are not permitted")
        if metadatas:
            self._consume_protocol_props(actions, metadatas[0])
            metadatas = [a for a in actions if isinstance(a, Metadata)]
        # committing DomainMetadata requires the feature (PROTOCOL.md
        # domainMetadata writer feature; clustering domains additionally
        # need the clustering feature) — gate at THE seam so CLONE,
        # RESTORE, CLUSTER BY, and future paths can't write a
        # spec-invalid log
        live_domains = [a for a in actions
                        if isinstance(a, DomainMetadata) and not a.removed]
        if live_domains:
            from delta_spark.actions import merge_protocol

            need = {"domainMetadata"}
            if any(a.domain == "delta.clustering" for a in live_domains):
                need.add("clustering")
            cur = (next((a for a in actions if isinstance(a, Protocol)), None)
                   or self.snapshot.protocol or Protocol())
            if not need <= set(cur.writerFeatures or []):
                new = merge_protocol(cur, writer_feats=need)
                replaced = False
                for i, a in enumerate(actions):
                    if isinstance(a, Protocol):
                        actions[i] = new
                        replaced = True
                if not replaced:
                    actions.insert(0, new)
        if self.read_version < 0:
            # first commit must establish protocol+metadata (prepareCommit)
            if not metadatas:
                raise ValueError("first table commit must include Metadata")
            if not any(isinstance(a, Protocol) for a in actions):
                actions.insert(0, Protocol())
        if len(metadatas) > 1:
            raise ValueError("at most one Metadata action per commit")
        if metadatas:
            # IcebergCompat.scala: reject invalid UniForm property combos
            # before the commit becomes durable
            from . import uniform, uniform_hudi

            uniform.validate_uniform_config(
                metadatas[0].configuration,
                prev_configuration=(self.snapshot.configuration
                                    if self.read_version >= 0 else None))
            uniform_hudi.validate_hudi_config(metadatas[0].configuration)
            _validate_checkpoint_interval(metadatas[0].configuration)
            self._assert_metadata_names(metadatas[0])
            self._check_cdc_columns(metadatas[0])
            self._auto_enable_features(actions, metadatas[0])

    _CDC_RESERVED = ("_change_type", "_commit_version", "_commit_timestamp")

    def _check_cdc_columns(self, meta: Metadata) -> None:
        """CDCReader.checkMetadataChange (CDCReader.scala:700): a
        CDF-enabled table must not have columns shadowing the CDC read
        schema — reads would be ambiguous."""
        from delta_spark.commands.delete import cdf_enabled
        from delta_spark.util import schema_from_json

        if not cdf_enabled(meta.configuration or {}):
            return
        # case-insensitive: Spark resolves columns case-insensitively
        # by default, so '_Change_Type' collides just the same
        names = {f.name.lower() for f in
                 schema_from_json(meta.schemaString).fields}
        used = sorted(names & set(self._CDC_RESERVED))
        if used:
            if not cdf_enabled(self.snapshot.configuration or {}):
                raise ValueError(
                    f"unable to enable Change Data Capture on the table: "
                    f"it already contains reserved columns {used}")
            raise ValueError(
                f"columns {used} are reserved for the Change Data Feed; "
                f"rename them or disable delta.enableChangeDataFeed")

    def _consume_protocol_props(self, actions: list[Any],
                                meta: Metadata) -> None:
        """Protocol properties in a committed Metadata's configuration
        (delta.minReaderVersion / delta.minWriterVersion /
        delta.feature.<name>) are CONSUMED into the Protocol action and
        never stored as plain table properties
        (TableFeatureProtocolUtils.isTableProtocolProperty,
        Protocol.forNewTable). Covers CREATE-with-configuration and any
        metadata path that didn't pre-split them."""
        from delta_spark.actions import merge_protocol

        cfg = meta.configuration or {}
        MINR, MINW = "delta.minReaderVersion", "delta.minWriterVersion"
        proto_keys = [k for k in cfg
                      if k in (MINR, MINW) or k.startswith("delta.feature.")]
        if not proto_keys:
            return
        r_feats, w_feats = set(), set()
        from delta_spark.actions import (
            SUPPORTED_READER_FEATURES,
            SUPPORTED_WRITER_FEATURES,
        )
        for k in proto_keys:
            if not k.startswith("delta.feature."):
                continue
            name = k[len("delta.feature."):]
            if str(cfg[k]).strip().lower() not in ("supported", "enabled"):
                raise ValueError(
                    f"table property {k!r} only accepts 'supported', "
                    f"got {cfg[k]!r}")
            if name in SUPPORTED_READER_FEATURES:
                r_feats.add(name)
                w_feats.add(name)
            elif name in SUPPORTED_WRITER_FEATURES:
                w_feats.add(name)
            else:
                raise ValueError(f"unknown table feature {name!r}")
        try:
            minr = int(str(cfg.get(MINR, "1")).strip())
            minw = int(str(cfg.get(MINW, "1")).strip())
        except ValueError:
            raise ValueError(
                "delta.minReaderVersion/delta.minWriterVersion must be "
                "integers")
        cur = (next((a for a in actions if isinstance(a, Protocol)), None)
               or self.snapshot.protocol or Protocol())
        new = merge_protocol(cur, r_feats, w_feats,
                             min_reader=minr, min_writer=minw)
        unchanged = (
            new.minReaderVersion == cur.minReaderVersion
            and new.minWriterVersion == cur.minWriterVersion
            and set(new.readerFeatures or []) == set(cur.readerFeatures or [])
            and set(new.writerFeatures or []) == set(cur.writerFeatures or []))
        stripped = Metadata(
            id=meta.id, name=meta.name, description=meta.description,
            format=meta.format, schemaString=meta.schemaString,
            partitionColumns=meta.partitionColumns,
            configuration={k: v for k, v in cfg.items()
                           if k not in set(proto_keys)},
            createdTime=meta.createdTime)
        for i, a in enumerate(actions):
            if isinstance(a, Metadata):
                actions[i] = stripped
        if unchanged:
            # requirements already satisfied: don't emit a no-op
            # Protocol action (it would fail concurrent transactions
            # with ProtocolChangedException for nothing)
            return
        replaced = False
        for i, a in enumerate(actions):
            if isinstance(a, Protocol):
                actions[i] = new
                replaced = True
        if not replaced:
            actions.insert(0, new)

    def _assert_metadata_names(self, meta: Metadata) -> None:
        """OptimisticTransaction.assertMetadata (:1005): reject duplicate
        column names always, and — in NoMapping mode, where logical names
        ARE the parquet names — names with parquet-hostile characters
        (' ,;{}()\\n\\t=', SchemaUtils.checkSchemaFieldNames :1354).
        Column mapping lifts the character restriction because physical
        names are engine-generated."""
        from delta_spark.schema import column_mapping_mode, nested_field_names
        from delta_spark.util import schema_from_json

        schema = schema_from_json(meta.schemaString)
        names = nested_field_names(schema)
        seen: set[str] = set()
        for n in names:
            low = n.lower()
            if low in seen:
                raise ValueError(f"duplicate column name in schema: {n!r}")
            seen.add(low)
        if column_mapping_mode(meta.configuration or {}) != "none":
            return
        bad = [n for n in names + list(meta.partitionColumns or [])
               if any(ch in n for ch in " ,;{}()\n\t=")]
        if bad:
            raise ValueError(
                f"column names not allowed without column mapping "
                f"(parquet-invalid characters ' ,;{{}}()\\n\\t='): {sorted(set(bad))}; "
                "set delta.columnMapping.mode=name to use them")

    def _auto_enable_features(self, actions: list[Any], meta: Metadata) -> None:
        """Automatically-enabled table features (TableFeature.scala
        metadataRequiredFeatures role): committing a Metadata whose schema
        or configuration needs a feature upgrades the Protocol in the
        same commit."""
        reader_feats: set[str] = set()
        writer_feats: set[str] = set()
        schema_str = meta.schemaString or ""
        cfg = meta.configuration or {}
        if '"variant"' in schema_str:
            reader_feats.add("variantType")
            writer_feats.add("variantType")
        if '"timestamp_ntz"' in schema_str:
            reader_feats.add("timestampNtz")
            writer_feats.add("timestampNtz")
        if '"delta.typeChanges"' in schema_str:
            reader_feats.add("typeWidening")
            writer_feats.add("typeWidening")
        if '"CURRENT_DEFAULT"' in schema_str:
            # DEFAULT column expressions (writer-only feature: readers
            # see materialized values, only writers must apply defaults)
            writer_feats.add("allowColumnDefaults")
        if cfg.get("delta.redirectReaderWriter-preview"):
            # table redirect configuration present (any state): readers
            # must understand routing, so it's a reader+writer feature
            reader_feats.add("redirectReaderWriter-preview")
            writer_feats.add("redirectReaderWriter-preview")
        if cfg.get("delta.enableMaterializePartitionColumnsFeature",
                   "").lower() == "true":
            # partition column values also stored physically in data
            # files (MaterializePartitionColumnsTableFeature) — for
            # external readers that require them in the parquet
            writer_feats.add("materializePartitionColumns")
        if '"__COLLATIONS"' in schema_str:
            # cheap substring pre-filter, then a PARSED check — a user
            # comment mentioning __COLLATIONS must not permanently add
            # the feature (CollationsTableFeature, writer-only)
            from delta_spark.schema import collated_columns as _cc
            from delta_spark.util import schema_from_json as _sfj2

            if _cc(_sfj2(schema_str)):
                writer_feats.add("collations")
        if geo.schema_string_may_have_geo(schema_str):
            # GeoSpatialTableFeature (TableFeature.scala:697): auto-added
            # on geo columns, preview-conf-gated, envelope validated
            # (nested geo / geo partition cols / SRIDs) at this choke
            # point so CREATE, evolution, and ALTER all pass through it
            from pyspark.sql import SparkSession as _SS

            from delta_spark.util import schema_from_json as _sfj

            geo.validate_schema(_sfj(schema_str),
                                meta.partitionColumns or [],
                                spark=_SS.getActiveSession())
            reader_feats.add("geospatial")
            writer_feats.add("geospatial")
        if cfg.get("delta.enableDeletionVectors", "").lower() == "true":
            if cfg.get("delta_spark.dv.portable", "true").lower() == "false":
                # legacy parquet-sidecar DVs ('q' storageType) are NOT
                # protocol-valid — declare a non-standard feature so
                # external readers fail closed instead of misreading
                reader_feats.add("delta-spark.dvParquetSidecar")
                writer_feats.add("delta-spark.dvParquetSidecar")
            else:
                reader_feats.add("deletionVectors")
                writer_feats.add("deletionVectors")
        if cfg.get("delta.enableVariantShredding", "").lower() == "true":
            # shredded variant storage (PROTOCOL.md:1934): files carry
            # typed_value subcolumns readers must understand
            reader_feats.add("variantShredding")
            writer_feats.add("variantShredding")
        if cfg.get("delta.enableIcebergCompatV3", "").lower() == "true":
            # IcebergCompatV3 (IcebergCompat.scala:96): format-v3 output
            # with DV DeleteFiles and row lineage — requires row
            # tracking (RequireRowTracking autoSetValue="true"); the
            # forced property flows into the rowTracking block below
            writer_feats.add("icebergCompatV3")
            if cfg.get("delta.enableRowTracking", "").lower() != "true":
                meta.configuration = dict(cfg)
                meta.configuration["delta.enableRowTracking"] = "true"
                cfg = meta.configuration
            # iceberg-compat-v3 RFC writer requirements also mandate
            # materialized partition column values in the data files
            # (an Iceberg reader never re-derives them from paths);
            # column mapping is REQUIRED rather than forced — enabling
            # it needs schema rewriting, enforced in
            # uniform.check_iceberg_compat
            if cfg.get("delta.enableMaterializePartitionColumnsFeature",
                       "").lower() != "true":
                meta.configuration = dict(cfg)
                meta.configuration[
                    "delta.enableMaterializePartitionColumnsFeature"] = "true"
                cfg = meta.configuration
        if cfg.get("delta.enableRowTracking", "").lower() == "true":
            writer_feats.add("rowTracking")
            # stable row ids need a materialized column name assigned at
            # enable time (MaterializedRowTrackingColumn.scala:76 —
            # "_row-id-col-<uuid>"); rewrites persist stable ids under
            # this physical-only column and readers prefer it
            import uuid as _uuid

            mat_props = {
                "delta.rowTracking.materializedRowIdColumnName":
                    "_row-id-col-",
                "delta.rowTracking.materializedRowCommitVersionColumnName":
                    "_row-commit-version-col-",
            }
            if any(k not in cfg for k in mat_props):
                meta.configuration = dict(cfg)
                for k, prefix in mat_props.items():
                    if k not in meta.configuration:
                        meta.configuration[k] = f"{prefix}{_uuid.uuid4()}"
        if cfg.get("delta.enableInCommitTimestamps", "").lower() == "true":
            writer_feats.add("inCommitTimestamp")
        if cfg.get("delta_spark.catalogManaged.catalog"):
            # catalog-managed tables (PROTOCOL.md:1388): reader+writer
            # feature; writer requirements mandate ACTIVE in-commit
            # timestamps (published-file mtimes are meaningless — the
            # publish can happen any time after the commit), so enabling
            # the catalog force-enables ICT in the same metadata
            reader_feats.add("catalogManaged")
            writer_feats.add("catalogManaged")
            writer_feats.add("inCommitTimestamp")
            if cfg.get("delta.enableInCommitTimestamps", "").lower() != "true":
                meta.configuration = dict(cfg)
                meta.configuration["delta.enableInCommitTimestamps"] = "true"
                cfg = meta.configuration
        if cfg.get("delta.enableIcebergCompatV2", "").lower() == "true":
            writer_feats.add("icebergCompatV2")
        if cfg.get("delta.checkpointPolicy", "").lower() == "v2":
            reader_feats.add("v2Checkpoint")
            writer_feats.add("v2Checkpoint")
        # LEGACY features driven by metadata (the reference's
        # minProtocolComponentsFromMetadata): merge_protocol keeps the
        # weakest satisfying form — a plain version bump (e.g. column
        # mapping → (2,5)) for legacy protocols, explicit feature
        # entries once in the feature-vector form. Without these a
        # spec-compliant external client would use the table without
        # honoring the capability.
        if cfg.get("delta.columnMapping.mode", "none") != "none":
            reader_feats.add("columnMapping")
            writer_feats.add("columnMapping")
        if cfg.get("delta.enableChangeDataFeed", "").lower() == "true":
            writer_feats.add("changeDataFeed")
        if any(k.startswith("delta.constraints.") for k in cfg):
            writer_feats.add("checkConstraints")
        if '"delta.generationExpression"' in schema_str:
            writer_feats.add("generatedColumns")
        if '"delta.identity.start"' in schema_str:
            writer_feats.add("identityColumns")
        if not reader_feats and not writer_feats:
            return
        from delta_spark.actions import FEATURE_ALIASES, merge_protocol
        cur = (next((a for a in actions if isinstance(a, Protocol)), None)
               or self.snapshot.protocol or Protocol())
        # a table already declaring a preview/dev spelling of a feature
        # satisfies the GA requirement — don't force-add the GA name
        # (the reference's preview features gate identical semantics)
        have = set(cur.readerFeatures or []) | set(cur.writerFeatures or [])
        for ga, aliases in FEATURE_ALIASES.items():
            if any(a in have for a in aliases):
                reader_feats.discard(ga)
                writer_feats.discard(ga)
        if not reader_feats and not writer_feats:
            return
        new = merge_protocol(cur, reader_feats, writer_feats)
        if (new.minReaderVersion == cur.minReaderVersion
                and new.minWriterVersion == cur.minWriterVersion
                and set(new.readerFeatures or []) == set(cur.readerFeatures or [])
                and set(new.writerFeatures or []) == set(cur.writerFeatures or [])):
            return
        for i, a in enumerate(actions):
            if isinstance(a, Protocol):
                actions[i] = new
                return
        actions.insert(0, new)

    # ---------------------------------------------------- conflicts ----

    def _maybe_write_amt(self, version: int, actions: list[Any],
                         effective_cfg: Optional[dict]):
        """AMT inline-checkpoint hook (amt.py; AMTWriterManager role).
        Called per commit attempt (an absorbed winner changes the
        post-commit state, so the tree is rebuilt on retry). Returns the
        inline checkpoint action to append, or None.

        Cadence: the enablement commit writes the first (full) tree;
        afterwards a tree is written when checkpointInterval commits
        accumulated since the last one, or inline with a large commit
        (LARGE_COMMIT_ACTIONS). A full rewrite replaces the incremental
        chain every interval x FULL_REWRITE_MULTIPLIER commits.
        Deviation from the reference: full rewrites happen inline on the
        triggering commit rather than via a deferred OPTIMIZE CHECKPOINT
        maintenance commit."""
        from delta_spark import amt as AMT
        from delta_spark.util import canonical_log_path as _ck

        proto = next((a for a in actions if isinstance(a, Protocol)), None)
        post_proto = proto if proto is not None else self.snapshot.protocol
        if not AMT.checkpoint_enabled(post_proto):
            return None
        newly = not AMT.checkpoint_enabled(self.snapshot.protocol)
        if newly:
            AMT.check_enablement(post_proto, effective_cfg or {})

        # removes inherit the leaf residency of the file they tombstone
        for a in actions:
            if isinstance(a, RemoveFile) and a.backReference is None:
                res = self.snapshot.active.get(_ck(a.path))
                if res is not None and res.backReference:
                    a.backReference = dict(res.backReference)

        last = (None if newly
                else AMT.find_latest_checkpoint(self.log,
                                                self.snapshot.version))
        interval = self.log.checkpoint_interval
        try:
            interval = int((effective_cfg or {}).get(
                "delta.checkpointInterval", interval))
        except (TypeError, ValueError):
            pass
        big = len(actions) >= AMT.LARGE_COMMIT_ACTIONS
        if last is None:
            if not newly and not big:
                # feature on but no tree yet (e.g. cleaned log): rebuild
                # at the normal cadence only
                if version % max(interval, 1) != 0:
                    return None
            full = True
            prev = None
        else:
            last_v, ck = last
            prev = AMT.AMTCheckpoint(ck)
            if version - last_v < interval and not big:
                return None
            last_full = int(ck["contentRoot"].get("tags", {}).get(
                "lastManifestCommitWithFullRewrite", last_v))
            full = version - last_full >= interval * AMT.FULL_REWRITE_MULTIPLIER

        meta = self._post_meta(actions, version)
        if meta.protocol is None or meta.metadata is None:
            return None   # initial commits without full state: skip
        if full or prev is None:
            from delta_spark.log import should_plan_distributed
            if (self._spark is not None
                    and should_plan_distributed(self._spark, self.log)):
                # big-table path: leaf manifests are written from
                # executors over state_df, one per range partition
                # (AMTWriteHelper.scala:153-165); the driver only sees
                # the pointer rows
                ck_dict = AMT.write_full_distributed(
                    self.log, self._spark, meta, version, actions)
            else:
                post = self.snapshot.clone_state()
                post.apply_actions(self._as_kinds(actions))
                post.version = version
                ck_dict = AMT.write_full(self.log, post, version)
        else:
            window = AMT.window_file_actions(self.log, prev.version + 1,
                                             version - 1)
            ck_dict = AMT.write_incremental(
                self.log, prev, meta, version,
                window_actions=window,
                commit_actions=self._as_kinds(actions))
        return AMT.AMTCheckpoint(ck_dict)

    def _post_meta(self, actions: list[Any], version: int):
        """Metadata-class view of the post-commit state (protocol,
        metadata, domain metadata, txns) computed WITHOUT cloning or
        hydrating the snapshot's file state — the tree writers only
        need these O(1) rows, so a light (unhydrated) snapshot stays
        light through an AMT commit."""
        from types import SimpleNamespace

        snap = self.snapshot
        ns = SimpleNamespace(
            protocol=snap.protocol, metadata=snap.metadata,
            domain_metadata=dict(snap.domain_metadata),
            set_transactions=dict(snap.set_transactions), version=version)
        for a in actions:
            if isinstance(a, Protocol):
                ns.protocol = a
            elif isinstance(a, Metadata):
                ns.metadata = a
            elif isinstance(a, DomainMetadata):
                if a.removed:
                    ns.domain_metadata.pop(a.domain, None)
                else:
                    ns.domain_metadata[a.domain] = a
            elif isinstance(a, SetTransaction):
                ns.set_transactions[a.appId] = a
        return ns

    @staticmethod
    def _as_kinds(actions: list[Any]) -> list[tuple[str, Any]]:
        kinds = {AddFile: "add", RemoveFile: "remove", Metadata: "metaData",
                 Protocol: "protocol", SetTransaction: "txn",
                 DomainMetadata: "domainMetadata"}
        out = []
        for a in actions:
            k = kinds.get(type(a))
            if k is not None:
                out.append((k, a))
        return out

    def _check_conflicts(self, winning: "WinningCommitSummary", ours: list[Any],
                         isolation_level: str, is_blind_append: bool) -> None:
        """Conflict classification against the winning commit, cheapest
        category first with early exits (ConflictChecker.scala check
        order). File-action categories stream line-by-line off the
        summary — the (possibly huge) add set is touched only when the
        append check needs it, and never materialized as a list."""
        win_txns = winning.parsed("txn")
        win_domains = winning.parsed("domainMetadata")

        if winning.parsed("protocol"):
            raise ProtocolChangedException("concurrent protocol update")
        if winning.parsed("metaData"):
            raise MetadataChangedException("concurrent metadata update")

        # SetTransaction conflicts (idempotent writers)
        our_txn_ids = {a.appId for a in ours if isinstance(a, SetTransaction)}
        if our_txn_ids & {t.appId for t in win_txns}:
            raise ConcurrentTransactionException("concurrent SetTransaction for same appId")

        our_domains = {a.domain for a in ours if isinstance(a, DomainMetadata)}
        if our_domains & {d.domain for d in win_domains}:
            raise ConcurrentWriteException(
                "concurrent DomainMetadata for same domain")

        # Added files vs our reads (ConflictChecker.scala:643).
        # Under WriteSerializable a blind append by the winner doesn't
        # invalidate us unless we're Serializable.
        win_commit_info = winning.parsed("commitInfo")
        winner_blind = bool(win_commit_info and win_commit_info[0].isBlindAppend)
        check_appends = not (
            isolation_level == SNAPSHOT_ISOLATION
            or (isolation_level == WRITE_SERIALIZABLE and winner_blind)
        )
        # The reference's changedDataAddedFiles is NOT dataChange-filtered
        # (ConflictChecker.scala:182: all adds of a non-blind-append winner
        # count).  We carve out only the OPTIMIZE shape — dataChange=false
        # adds whose rows were already visible to us because the winner
        # simultaneously REMOVEs files from our read snapshot (a pure
        # rearrangement: same rows, new layout; the layout change still
        # conflicts through the REMOVE checks below when we read those
        # files).  A dataChange=false add at a brand-new path with no
        # corresponding remove (e.g. a third-party backfill) carries rows
        # we never saw and must conflict like any other append.
        has_removes = winning.any("remove")
        if check_appends and (self.read_whole_table_flag or self.read_predicates):

            def relevant_adds():
                for a in winning.iter_actions("add"):
                    if a.dataChange or not has_removes:
                        yield a

            if self.read_whole_table_flag:
                if next(relevant_adds(), None) is not None:
                    raise ConcurrentAppendException(
                        "files added by concurrent writer; whole table was read")
            else:
                schema = self.snapshot.data_schema
                part_cols = set(self.snapshot.partition_columns)
                asts = []
                for pred in self.read_predicates:
                    try:
                        asts.append((pred, P.parse_predicate(pred)))
                    except P.UnsupportedPredicate:
                        if next(relevant_adds(), None) is not None:
                            raise ConcurrentAppendException(
                                "files added; unverifiable read predicate")
                # one streaming pass over the winner's adds; stats are
                # parsed per line and the scan stops at the first hit
                for f in relevant_adds():
                    st = parse_stats_view(f.stats, schema)
                    for c in part_cols:
                        v = self.snapshot.typed_partition_values(f).get(c) if f.partitionValues else None
                        if v is not None:
                            st.min_values[c] = v
                            st.max_values[c] = v
                            st.null_count[c] = 0
                    for pred, ast in asts:
                        if P.might_contain(ast, st):
                            raise ConcurrentAppendException(f"concurrently added file matches read predicate {pred!r}")

        # Removed files vs our reads / removes (ConflictChecker.scala:677).
        # Keys are canonicalized like snapshot replay (read_files holds
        # snapshot.active keys, which are canonical). Streamed: one pass
        # over the remove lines, nothing materialized; the delete-read
        # conflict keeps its priority over delete-delete.
        from delta_spark.util import canonical_log_path as _ckey

        read_keys = {_ckey(p) for p in self.read_files}
        our_removed = {_ckey(a.path) for a in ours if isinstance(a, RemoveFile)}
        delete_delete = False
        for r in winning.iter_actions("remove"):
            key = _ckey(r.path)
            if key in read_keys:
                raise ConcurrentDeleteReadException("a file we read was concurrently deleted")
            if key in our_removed:
                delete_delete = True
        if delete_delete:
            raise ConcurrentDeleteDeleteException("a file we delete was concurrently deleted")

        # no conflict → absorb winner and retry on top of it. Work on a
        # CLONE: the current snapshot object may be the log's shared
        # cached snapshot — mutating it in place would leak the winner's
        # state into concurrent in-process readers of OUR read version
        # (snapshot-isolation violation).
        absorbed = self.snapshot.clone_state()
        absorbed.apply_actions(winning.all_actions())
        if win_commit_info:
            # ICT monotonicity floor must include the absorbed winner —
            # the winner's authoritative time is the dedicated
            # inCommitTimestamp field (an external writer's wall-clock
            # `timestamp` may be far BEHIND its monotonic ICT)
            ci = win_commit_info[0]
            win_ts = ci.inCommitTimestamp or ci.timestamp
            if win_ts:
                absorbed.timestamp = max(absorbed.timestamp or 0, win_ts)
        self.snapshot = absorbed

    # -------------------------------------------------- post-commit ----

    def _post_commit(self, version: int, actions: list[Any]) -> None:
        """Post-commit hooks. None of them may force a full driver
        replay on the blind-append fast path: the full snapshot is
        built LAZILY (only the hooks that genuinely need whole-table
        state — interval checkpoints, enabled UniForm conversions, a
        checksum whose predecessor is missing — pay for it)."""
        import json as _json
        import os as _os

        commit_meta = next((a for a in actions if isinstance(a, Metadata)),
                           None)
        cfg = (commit_meta.configuration if commit_meta is not None
               else self.snapshot.configuration) or {}
        _full: list = [None]

        def full_snap():
            if _full[0] is None:
                _full[0] = self.log.update()
            return _full[0]

        # checksum hook (Checksum.scala / ChecksumHook): per-version
        # .crc with aggregate state for fast detail() + validation.
        # Computed INCREMENTALLY from the predecessor checksum + this
        # commit's file actions (the reference's incremental CRC role) —
        # sound because the protocol requires a RemoveFile for every
        # replaced path, so adds-minus-removes is exact.
        try:
            adds = [a for a in actions if isinstance(a, AddFile)]
            removes = [a for a in actions if isinstance(a, RemoveFile)]
            crc = None
            prev_path = _os.path.join(self.log.log_path,
                                      "%020d.crc" % (version - 1))
            # bare metadata re-adds (row-tracking backfill: dataChange=
            # false adds with NO removes) replace live entries in place —
            # adds-minus-removes would double count them
            bare_readd = (adds and not removes
                          and any(not a.dataChange for a in adds))
            if version > 0 and not bare_readd and all(
                    r.size is not None for r in removes):
                try:
                    with open(prev_path) as fh:
                        prev = _json.load(fh)
                    crc = {
                        "tableSizeBytes": (prev["tableSizeBytes"]
                                           + sum(a.size for a in adds)
                                           - sum(r.size for r in removes)),
                        "numFiles": (prev["numFiles"] + len(adds)
                                     - len(removes)),
                        "numMetadata": 1,
                        "numProtocol": 1,
                    }
                except (OSError, ValueError, KeyError):
                    crc = None
            if crc is None:
                # pin the EXACT version: under concurrency update()
                # could reflect later commits, and an inflated value
                # here would poison every later incremental step
                snap = self.log.snapshot_at(version)
                crc = {
                    "tableSizeBytes": snap.size_in_bytes,
                    "numFiles": snap.num_files,
                    "numMetadata": 1,
                    "numProtocol": 1,
                }
            crc_path = _os.path.join(self.log.log_path, "%020d.crc" % version)
            with open(crc_path, "w") as fh:
                fh.write(_json.dumps(crc))
        except OSError:
            pass
        # UniForm hooks (IcebergConverter async convert role): best-
        # effort, a conversion failure never fails the Delta commit;
        # gated on the table config so disabled tables pay nothing
        try:
            from . import uniform

            if uniform.uniform_iceberg_enabled(cfg):
                uniform.maybe_convert(self.log, full_snap())
        except Exception:
            pass
        try:
            from . import uniform_hudi

            if uniform_hudi.uniform_hudi_enabled(cfg):
                uniform_hudi.maybe_convert(self.log, full_snap())
        except Exception:
            pass
        # delta.checkpointInterval overrides the default cadence
        # (DeltaConfigs.CHECKPOINT_INTERVAL, Checkpoints.scala hook)
        try:
            ckpt_interval = int(cfg.get(
                "delta.checkpointInterval", self.log.checkpoint_interval))
        except (TypeError, ValueError):
            ckpt_interval = self.log.checkpoint_interval
        if version > 0 and ckpt_interval > 0 and version % ckpt_interval == 0:
            try:
                # coordinator-owned checkpoints: a checkpoint may only
                # cover a fully-backfilled prefix of the log, so drain
                # the coordinator's tail first
                from delta_spark import coordinator as C
                from delta_spark.log import should_plan_distributed

                coord = C.coordinator_for(cfg)
                if coord is not None:
                    C.backfill_to(self.log, coord, version)
                # catalog-managed tables: a checkpoint may only cover
                # PUBLISHED versions (PROTOCOL.md:1352), so publish the
                # catalog's ratified tail first (publishing is always
                # permitted; it's the cleanup below that needs a grant)
                from delta_spark import catalog_managed as CM

                cm_client = CM.client_for(cfg)
                if cm_client is not None:
                    CM.publish(self.log, cm_client, version)
                wrote = False
                if (self._spark is not None
                        and should_plan_distributed(self._spark, self.log)):
                    # big-table path: the checkpoint is written as a
                    # Spark job — the driver never materializes the
                    # file state for it
                    wrote = self.log.write_checkpoint_distributed(
                        self._spark, version)
                if not wrote:
                    self.log.write_checkpoint(full_snap())
                # checkpointAndCleanUpDeltaLog (Checkpoints.scala): each
                # checkpoint also reclaims commit JSONs older than
                # delta.logRetentionDuration, unless opted out
                if str(cfg.get("delta.enableExpiredLogCleanup",
                               "true")).lower() == "true":
                    try:
                        CM.check_maintenance_allowed(
                            cfg, None, "metadata cleanup")
                    except PermissionError:
                        pass  # catalog didn't grant cleanup — skip, not fail
                    else:
                        self.log.cleanup_expired_logs()
            except Exception:
                # checkpointing is best-effort (CheckpointHook semantics)
                pass
        # minor log compaction hook (opt-in): every N commits, collapse
        # the trailing N jsons into one <s>.<e>.compacted.json so cold
        # replay between checkpoints is one read instead of N
        try:
            interval = int(cfg.get(
                "delta_spark.logCompaction.interval", "0"))
        except (TypeError, ValueError):
            interval = 0
        if interval > 1 and version > 0 and (version + 1) % interval == 0:
            try:
                self.log.compact_log(version - interval + 1, version)
            except Exception:
                pass  # best-effort, like checkpointing


def resolve_idempotent_txn(spark, app: Optional[str] = None,
                           ver: Optional[int] = None):
    """Effective (txnAppId, txnVersion) for idempotent writes and DML
    (DeltaSuite 'idempotent write'): explicit option values win; else
    the session confs spark.databricks.delta.write.txnAppId /
    .txnVersion apply to every write, INSERT, DELETE, UPDATE and MERGE.
    With ...write.txnVersion.autoReset.enabled the version conf is
    consumed on use, so a second command without a fresh version errors
    instead of being silently skipped. Setting only one of the pair is
    an error."""
    if app is not None or ver is not None:
        if app is None or ver is None:
            raise ValueError(
                "Invalid options for idempotent Delta writes: both "
                "txnAppId and txnVersion must be specified")
        return app, int(ver)

    def _get(key):
        # pass an explicit default: the no-default overload THROWS on a
        # missing key and converting the Java exception fetches a full
        # remote stack trace — ~40 ms per miss, ~0.2 s of pure driver
        # overhead on EVERY write/DML command (guide §1.2 per-task
        # work; the keys are unset in the common case)
        try:
            return spark.conf.get(key, None)
        except Exception:
            return None

    app = _get("spark.databricks.delta.write.txnAppId") \
        or _get("delta_spark.write.txnAppId")
    ver = _get("spark.databricks.delta.write.txnVersion") \
        or _get("delta_spark.write.txnVersion")
    auto = str(_get("spark.databricks.delta.write.txnVersion.autoReset.enabled")
               or "false").lower() == "true"
    if auto and ver is not None:
        for key in ("spark.databricks.delta.write.txnVersion",
                    "delta_spark.write.txnVersion"):
            try:
                spark.conf.unset(key)
            except Exception:
                pass
    if app is not None and ver is None and auto:
        # the version was consumed by the previous command: running
        # another without setting a fresh one is the mistake autoReset
        # exists to catch (DELTA_INVALID_IDEMPOTENT_WRITES_OPTIONS)
        raise ValueError(
            "Invalid options for idempotent Delta writes: both "
            "spark.databricks.delta.write.txnAppId and "
            "spark.databricks.delta.write.txnVersion must be specified "
            "for idempotent Delta writes")
    if app is None or ver is None:
        # half-set session confs without autoReset simply don't engage
        # idempotency (the reference's merge test sets txnAppId before
        # CREATE with no version — the create succeeds)
        return None, None
    return app, int(ver)


def dml_transaction(spark, log: DeltaLog) -> OptimisticTransaction:
    """Transaction for DML/maintenance whose snapshot hydrates file
    state lazily from the DISTRIBUTED log reconstruction when the table
    is big (same routing as scans — log.should_plan_distributed):
    predicate-scoped file selection collects only the pruned survivors
    (files_for_scan_df), and whole-state touches collect executor-parsed
    AddFiles instead of replaying JSON on the driver."""
    from delta_spark.log import should_plan_distributed

    if should_plan_distributed(spark, log):
        return OptimisticTransaction(
            log, snapshot=log.light_snapshot(spark=spark), spark=spark)
    return OptimisticTransaction(log)
