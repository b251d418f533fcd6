"""Function surface of the public delta-sharing connector
(delta-io/delta-sharing python/delta_sharing/delta_sharing.py),
backed by delta_spark.sharing.

``load_as_spark`` / ``load_table_changes_as_spark`` use the ACTIVE
SparkSession (the connector's contract: "a SparkSession must already
exist"); the pandas variants serve classic parquet-format tables with
pure pyarrow (no Spark needed), and fall back to Spark→pandas when the
table needs delta-format reader features (deletion vectors, column
mapping) and a session is available.
"""

from __future__ import annotations

import json
from typing import Optional

from delta_spark.sharing import client as _client
from delta_spark.sharing.protocol import (
    DeltaSharingError,
    DeltaSharingProfile,
    RESPONSE_FORMAT_PARQUET,
    parse_table_path,
)


def _active_spark():
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise AssertionError(
            "No active SparkSession — create one before calling the "
            "_as_spark loaders (the delta-sharing connector has the "
            "same requirement)")
    return spark


def load_as_spark(url: str, version: Optional[int] = None,
                  timestamp: Optional[str] = None):
    """Public-connector signature: the SparkSession is the active one."""
    return _client.load_as_spark(_active_spark(), url, version=version,
                                 timestamp=timestamp)


def load_table_changes_as_spark(url: str,
                                starting_version: Optional[int] = None,
                                ending_version: Optional[int] = None,
                                starting_timestamp: Optional[str] = None,
                                ending_timestamp: Optional[str] = None):
    return _client.load_table_changes_as_spark(
        _active_spark(), url,
        starting_version=starting_version, ending_version=ending_version,
        starting_timestamp=starting_timestamp,
        ending_timestamp=ending_timestamp)


def get_table_version(url: str,
                      starting_timestamp: Optional[str] = None) -> int:
    client, parsed = _client._client_for(url)
    return client.query_table_version(
        parsed.share, parsed.schema, parsed.table,
        starting_timestamp=starting_timestamp)


def get_table_metadata(url: str):
    """Returns the raw metaData dict of the response (classic shape
    when the table is classic-representable)."""
    client, parsed = _client._client_for(url)
    resp = client.query_table_metadata(parsed.share, parsed.schema,
                                       parsed.table)
    return resp.metadata


def get_table_protocol(url: str):
    client, parsed = _client._client_for(url)
    resp = client.query_table_metadata(parsed.share, parsed.schema,
                                       parsed.table)
    return resp.protocol


def load_as_pandas(url: str, limit: Optional[int] = None,
                   version: Optional[int] = None,
                   timestamp: Optional[str] = None,
                   jsonPredicateHints: Optional[str] = None):
    """Classic parquet-format tables read with pure pyarrow — no Spark
    required (the connector's pandas path). Feature tables (DVs,
    column mapping) need the delta format: served via Spark→toPandas
    when a session is active, otherwise a clear error."""
    import pandas as pd

    client, parsed = _client._client_for(url)
    resp = client.query_table(
        parsed.share, parsed.schema, parsed.table,
        json_predicate_hints=jsonPredicateHints, limit_hint=limit,
        version=version, timestamp=timestamp)
    if resp.format != RESPONSE_FORMAT_PARQUET:
        from pyspark.sql import SparkSession

        if SparkSession.getActiveSession() is None:
            raise DeltaSharingError(
                "this table requires delta-format reader features "
                "(deletion vectors / column mapping); reading it as "
                "pandas needs an active SparkSession")
        df = _client.load_as_spark(
            SparkSession.getActiveSession(), url, version=version,
            timestamp=timestamp, limit=limit)
        return df.toPandas()

    import pyarrow as pa
    import pyarrow.parquet as pq

    from delta_spark.util import deserialize_partition_value, schema_from_json

    schema = schema_from_json(resp.schema_string())
    part_cols = resp.partition_columns()
    key = "|".join([client.profile.endpoint, parsed.share, parsed.schema,
                    parsed.table, "pandas", str(resp.version)])
    mat = _client.Materializer()
    table_dir = mat._dir_for(key)
    mat._part_cols = part_cols
    mat._fetch_data(table_dir, resp.files)

    frames = []
    import os as _os

    for wf in resp.files:
        local = _os.path.join(table_dir,
                              _client._rel_data_path(wf, part_cols))
        pdf = pq.read_table(local).to_pandas()
        for c in part_cols:
            f = next(f for f in schema.fields if f.name == c)
            pdf[c] = deserialize_partition_value(
                wf.partition_values.get(c), f.dataType)
        frames.append(pdf)
    if frames:
        out = pd.concat(frames, ignore_index=True)
    else:
        out = pd.DataFrame({f.name: pd.Series(dtype="object")
                            for f in schema.fields})
    out = out[[f.name for f in schema.fields]]
    if limit is not None:
        out = out.head(limit)
    return out


def load_table_changes_as_pandas(url: str,
                                 starting_version: Optional[int] = None,
                                 ending_version: Optional[int] = None,
                                 starting_timestamp: Optional[str] = None,
                                 ending_timestamp: Optional[str] = None):
    """CDF needs commit-granular semantics (preimages, synthesized
    deletes) — served through the Spark CDF reader, then to pandas."""
    return load_table_changes_as_spark(
        url, starting_version=starting_version,
        ending_version=ending_version,
        starting_timestamp=starting_timestamp,
        ending_timestamp=ending_timestamp).toPandas()


class SharingClient(_client.SharingClient):
    """Listing surface (delta-sharing python's SharingClient)."""
