"""Streaming over a shared table — the delta_sharing_py source.

Re-expresses the reference's DeltaFormatSharingSource
(sharing/.../DeltaFormatSharingSource.scala:64: "fetch the pre-signed
urls and delta metadata from the delta sharing server, construct a
local delta log, and rely on a DeltaSource to do the streaming data
processing"): a thin sync layer polls the server per microbatch and
appends newly-committed versions to the faked local log — keeping
SOURCE version numbers, so checkpointed offsets stay meaningful — and
delegates every streaming concern (admission control, schema
tracking, CDF streaming, availableNow) to delta_spark's ordinary
DeltaStreamReader over that log.

Usage::

    from delta_spark.sharing.stream import read_stream_sharing
    df = read_stream_sharing(spark, "profile.json#share.schema.table",
                             maxFilesPerTrigger="10")

Scale note: the faked log and downloaded data files live under
``sharingCacheDir`` (default: a stable per-machine temp path). On a
multi-node cluster this MUST point at shared storage reachable by the
executors — the same requirement the reference satisfies with its
custom delta-sharing filesystem resolving presigned urls cluster-wide.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource

from delta_spark.log import DeltaLog
from delta_spark.sharing.client import (
    Materializer,
    RestClient,
    materialize_snapshot,
)
from delta_spark.sharing.protocol import (
    DeltaSharingError,
    DeltaSharingProfile,
    parse_table_path,
)
from delta_spark.streaming import DeltaStreamReader
from delta_spark.util import schema_from_json


def _stable_cache_dir(override: Optional[str] = None) -> str:
    """Streams need a cache location every process (driver, the
    DataSource planning worker, executors on this machine) resolves
    identically — unlike batch loads, which can use a private temp."""
    d = override or os.path.join(tempfile.gettempdir(),
                                 "delta_sharing_stream")
    os.makedirs(d, exist_ok=True)
    return d


class SharingStreamSync:
    """Keeps a faked local log in step with the shared table.

    Durability caveat: the reconstructed log IS the stream's notion of
    the table, and checkpointed offsets reference its version numbers
    (which mirror the source's). Because the materialization is
    content-addressed and idempotent, restarts on the same
    ``sharingCacheDir`` resume exactly. If the cache dir is LOST while
    a checkpoint still points into the initial snapshot (commit 0), a
    re-init would snapshot the source at its CURRENT version — a
    different commit-0 file set than the one the offset indexed — so
    resume that checkpoint only with the original cache dir, or start
    the query fresh (same rule the reference applies to its
    constructed-log state, DeltaSharingLogFileSystem.scala)."""

    def __init__(self, url: str, cache_dir: Optional[str] = None,
                 starting_version: Optional[int] = None,
                 response_format: Optional[str] = None):
        self.parsed = parse_table_path(url)
        profile = DeltaSharingProfile.read_from_file(self.parsed.profile_file)
        self.client = RestClient(profile, response_format=response_format)
        # the literal 'latest' is part of the wrapped reader's option
        # contract: tail only commits AFTER the current version
        if starting_version is not None and str(
                starting_version).lower() == "latest":
            self.starting_version = "latest"
        else:
            self.starting_version = (int(starting_version)
                                     if starting_version is not None
                                     else None)
        self.materializer = Materializer(_stable_cache_dir(cache_dir))
        # key by the table's immutable metadata id, NOT the endpoint: a
        # provider moving hosts/ports (or a profile regenerated with a
        # fresh token) must not reset the faked log a checkpointed
        # stream's offsets point into (see the durability caveat above)
        meta = self.client.query_table_metadata(
            self.parsed.share, self.parsed.schema, self.parsed.table)
        if meta.format == "delta":
            table_id = meta.metadata["deltaMetadata"].get("id", "")
        else:
            table_id = meta.metadata.get("id", "")
        key = "|".join([
            "table", table_id or
            f"{self.parsed.share}.{self.parsed.schema}.{self.parsed.table}",
            "stream", str(self.starting_version), response_format or "auto",
        ])
        self.table_dir = self.materializer._dir_for(key)

    # ---------------------------------------------------------- sync ----

    def _remote_version(self) -> int:
        return self.client.query_table_version(
            self.parsed.share, self.parsed.schema, self.parsed.table)

    def _local_version(self) -> int:
        log = DeltaLog.for_table(self.table_dir)
        if not log.table_exists():
            return -1
        return log.update().version

    def ensure_initialized(self) -> str:
        # gate on the COMPLETION markers, not on commit presence: a
        # crashed half-init leaves commits behind and must re-enter to
        # heal (every materialization step is idempotent)
        log_dir = os.path.join(self.table_dir, "_delta_log")
        if (os.path.exists(os.path.join(log_dir, ".stream_init"))
                or os.path.exists(os.path.join(log_dir, ".materialized"))):
            return self.table_dir
        if self.starting_version is None or self.starting_version == "latest":
            v = self._remote_version()
            if self.starting_version == "latest":
                # no initial snapshot: protocol+metadata only; the
                # wrapped reader's own 'latest' handling seeds past v
                resp = self.client.query_table_metadata(
                    self.parsed.share, self.parsed.schema,
                    self.parsed.table, version=v)
            else:
                resp = self.client.query_table(
                    self.parsed.share, self.parsed.schema,
                    self.parsed.table, version=v)
            self.materializer.stream_init_snapshot(resp, self.table_dir, v)
        else:
            sv = self.starting_version
            resp = self.client.query_table(
                self.parsed.share, self.parsed.schema, self.parsed.table,
                starting_version=sv)
            end = max([sv] + [int(wf.version) for wf in resp.files
                              if wf.version is not None])
            # protocol+metadata anchor the chain at commit 0; real
            # actions keep source version numbers
            self.materializer.changes_table(
                resp, key="", start=sv, end=end, table_dir=self.table_dir)
        return self.table_dir

    def sync(self) -> int:
        """One poll: append any new source commits; returns the local
        latest version afterwards."""
        local = self._local_version()
        if local < 0:
            self.ensure_initialized()
            local = self._local_version()
        remote = self._remote_version()
        if remote > local:
            resp = self.client.query_table(
                self.parsed.share, self.parsed.schema, self.parsed.table,
                starting_version=local + 1, ending_version=remote)
            self.materializer.append_range(
                resp, self.table_dir, local + 1, remote)
        return self._local_version()


class SharingStreamReader(DeltaStreamReader):
    """DeltaStreamReader over the faked log, with a server poll at
    every offset discovery (the getTableVersion RPC the reference
    source issues in latestOffset, DeltaFormatSharingSource.scala:312)."""

    def __init__(self, schema, options):
        url = options.get("path")
        if not url or "#" not in url:
            raise DeltaSharingError(
                "delta_sharing_py source requires path="
                "'profile#share.schema.table'")
        sync = SharingStreamSync(
            url,
            cache_dir=options.get("sharingcachedir"),
            starting_version=options.get("startingversion"),
            response_format=options.get("responseformat"),
        )
        sync.ensure_initialized()
        self._sharing_sync = sync
        inner = dict(options)
        inner["path"] = sync.table_dir
        super().__init__(schema, inner)

    def latestOffset(self) -> dict:  # noqa: N802
        self._sharing_sync.sync()
        return super().latestOffset()


class DeltaSharingPyDataSource(DataSource):
    """``spark.readStream.format("delta_sharing_py")
    .option("path", "profile#share.schema.table")`` — streaming read
    of a shared table (reference DeltaSharingDataSource.scala:59
    sourceSchema/createSource)."""

    @classmethod
    def name(cls) -> str:
        return "delta_sharing_py"

    def _client(self):
        parsed = parse_table_path(self.options["path"])
        profile = DeltaSharingProfile.read_from_file(parsed.profile_file)
        return RestClient(
            profile,
            response_format=self.options.get("responseformat")), parsed

    def _pinned(self) -> tuple[Optional[int], Optional[str]]:
        v = self.options.get("versionasof")
        t = self.options.get("timestampasof")
        return (int(v) if v is not None else None), t

    def _meta(self):
        client, parsed = self._client()
        v, t = self._pinned()
        return client.query_table_metadata(
            parsed.share, parsed.schema, parsed.table,
            version=v, timestamp=t)

    def schema(self):
        base = schema_from_json(self._meta().schema_string())
        if str(self.options.get("readchangefeed", "false")).lower() == "true":
            return T.StructType(base.fields + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.LongType()),
                T.StructField("_commit_timestamp", T.TimestampType()),
            ])
        return base

    def streamReader(self, schema):
        return SharingStreamReader(schema, self.options)

    def reader(self, schema):
        """``spark.read.format("delta_sharing_py")`` — materialize the
        snapshot (honoring versionAsOf/timestampAsOf), then serve it
        through the ordinary delta_py batch reader (the reference's
        DeltaSharingDataSource batch relation role)."""
        if str(self.options.get("readchangefeed", "false")).lower() == "true":
            raise NotImplementedError(
                "batch change-feed reads of a shared table go through "
                "delta_spark.sharing.load_table_changes_as_spark")
        from delta_spark.streaming import DeltaBatchReader

        client, parsed = self._client()
        v, t = self._pinned()
        table_dir = materialize_snapshot(
            client, parsed, version=v, timestamp=t,
            cache_dir=self.options.get("sharingcachedir"))
        inner = {k: val for k, val in self.options.items()
                 if k not in ("versionasof", "timestampasof")}
        inner["path"] = table_dir
        return DeltaBatchReader(schema, inner)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(DeltaSharingPyDataSource)


def read_stream_sharing(spark: SparkSession, url: str,
                        **options) -> DataFrame:
    register(spark)
    reader = spark.readStream.format("delta_sharing_py").option("path", url)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
