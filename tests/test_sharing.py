"""Delta Sharing tier: REST server + client end-to-end.

Modeled on the reference suites
sharing/src/test/scala/io/delta/sharing/spark/
DeltaSharingDataSourceDeltaSuite.scala (batch/DV/CM reads),
DeltaSharingCDFUtilsSuite.scala (CDF), and the delta-sharing python
connector's rest-client tests: every read through the sharing server
must equal the equivalent direct read of the source table.
"""

import json
import os
import time

import pytest
from pyspark.sql import functions as sf

from delta_spark.cdf import table_changes
from delta_spark.io import write_delta
from delta_spark.log import DeltaLog
from delta_spark.sharing import (
    SharingClient,
    SharingServer,
    SharingServerConfig,
    load_as_spark,
    load_table_changes_as_spark,
)
from delta_spark.sharing import filters as F
from delta_spark.sharing.client import RestClient
from delta_spark.sharing.protocol import (
    DeltaSharingError,
    DeltaSharingProfile,
    parse_table_path,
)
from delta_spark.table import DeltaTable


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


@pytest.fixture()
def served(tmp_path, spark):
    """A server sharing three tables: plain partitioned, dv-deleted,
    column-mapped — plus a profile file; yields (server, profile_path,
    {name: source_path})."""
    tables = {}

    plain = str(tmp_path / "plain")
    df = spark.range(0, 200).select(
        sf.col("id"),
        (sf.col("id") % 4).cast("int").alias("part"),
        (sf.col("id") * 2).alias("val"))
    write_delta(df, plain, partition_by=["part"],
                configuration={"delta.enableChangeDataFeed": "true"})
    write_delta(df.filter("id >= 200"), plain, mode="append")  # no-op commit
    tables["plain"] = plain

    dvt = str(tmp_path / "dvt")
    write_delta(spark.range(0, 100).select(
        sf.col("id"), (sf.col("id") % 3).alias("m")), dvt,
        configuration={"delta.enableDeletionVectors": "true"})
    DeltaTable.forPath(spark, dvt).delete("id % 10 = 3")  # DV delete
    tables["dvt"] = dvt

    cmt = str(tmp_path / "cmt")
    write_delta(spark.range(0, 50).select(
        sf.col("id"), sf.concat(sf.lit("v"), sf.col("id")).alias("s")), cmt)
    t = DeltaTable.forPath(spark, cmt)
    t.upgradeTableProtocol(2, 5)
    from delta_spark.sql import delta_sql

    delta_sql(spark, f"ALTER TABLE delta.`{cmt}` SET TBLPROPERTIES "
                     "('delta.columnMapping.mode' = 'name')")
    delta_sql(spark, f"ALTER TABLE delta.`{cmt}` RENAME COLUMN s TO str2")
    tables["cmt"] = cmt

    cfg = SharingServerConfig()
    for name, path in tables.items():
        cfg.add_table("share1", "default", name, path)
    cfg.add_table("share2", "other", "plain2", plain)
    with SharingServer(cfg) as server:
        profile = server.write_profile(str(tmp_path / "profile.json"))
        yield server, profile, tables
    DeltaLog.clear_cache()


# ------------------------------------------------------------ listing ----


def test_listing_pagination_and_auth(served):
    server, profile, _ = served
    client = RestClient(DeltaSharingProfile.read_from_file(profile))
    assert [s["name"] for s in client.list_shares()] == ["share1", "share2"]
    assert client.get_share("share1") == {"name": "share1"}
    assert [s["name"] for s in client.list_schemas("share1")] == ["default"]
    names = [t["name"] for t in client.list_tables("share1", "default")]
    assert names == ["cmt", "dvt", "plain"]
    allt = client.list_all_tables("share2")
    assert [(t["schema"], t["name"]) for t in allt] == [("other", "plain2")]

    # pagination: 2-at-a-time still yields all three
    _, body = client._request(
        "GET", "/shares/share1/schemas/default/tables",
        params={"maxResults": 2})
    page1 = json.loads(body)
    assert len(page1["items"]) == 2 and page1.get("nextPageToken")
    _, body = client._request(
        "GET", "/shares/share1/schemas/default/tables",
        params={"maxResults": 2, "pageToken": page1["nextPageToken"]})
    page2 = json.loads(body)
    assert [t["name"] for t in page1["items"] + page2["items"]] == names

    # bad token -> 401
    bad = RestClient(DeltaSharingProfile(
        endpoint=server.endpoint, bearer_token="wrong"))
    with pytest.raises(DeltaSharingError) as ei:
        bad.list_shares()
    assert ei.value.status == 401

    # unknown table -> 404 with provider-style message
    with pytest.raises(DeltaSharingError) as ei:
        client.query_table_version("share1", "default", "nope")
    assert ei.value.status == 404

    # SharingClient object surface
    sc = SharingClient(profile)
    shares = sc.list_shares()
    assert [s.name for s in shares] == ["share1", "share2"]
    schemas = sc.list_schemas(shares[0])
    tabs = sc.list_tables(schemas[0])
    assert {t.fqn for t in tabs} == {
        "share1.default.cmt", "share1.default.dvt", "share1.default.plain"}
    assert len(sc.list_all_tables()) == 4


def test_profile_validation(tmp_path):
    p = str(tmp_path / "bad.json")
    with open(p, "w") as f:
        json.dump({"shareCredentialsVersion": 99, "endpoint": "x",
                   "bearerToken": "y"}, f)
    with pytest.raises(DeltaSharingError, match="version 1"):
        DeltaSharingProfile.read_from_file(p)
    with pytest.raises(DeltaSharingError, match="share.schema.table"):
        parse_table_path("nohash")


# -------------------------------------------------------- batch reads ----


def test_parquet_format_snapshot_equals_direct(served, spark):
    server, profile, tables = served
    url = f"{profile}#share1.default.plain"
    shared = load_as_spark(spark, url)
    direct = DeltaTable.forPath(spark, tables["plain"]).toDF()
    assert _rows(shared, "id") == _rows(direct, "id")
    assert shared.schema == direct.schema


def test_predicate_hints_prune_server_side(served, spark):
    server, profile, tables = served
    client = RestClient(DeltaSharingProfile.read_from_file(profile))
    full = client.query_table("share1", "default", "plain")
    hinted = client.query_table(
        "share1", "default", "plain",
        json_predicate_hints=json.dumps({
            "op": "equal", "children": [
                {"op": "column", "name": "part", "valueType": "int"},
                {"op": "literal", "value": "2", "valueType": "int"}]}))
    assert 0 < len(hinted.files) < len(full.files)

    # end-to-end with a SQL predicate: pruned AND correct
    shared = load_as_spark(spark, f"{profile}#share1.default.plain",
                           predicate="part = 2")
    direct = (DeltaTable.forPath(spark, tables["plain"]).toDF()
              .filter("part = 2"))
    assert _rows(shared, "id") == _rows(direct, "id")

    # malformed hints degrade to full listing, never error
    messy = client.query_table("share1", "default", "plain",
                               json_predicate_hints="{not json")
    assert len(messy.files) == len(full.files)


def test_limit_hint(served, spark):
    server, profile, _ = served
    client = RestClient(DeltaSharingProfile.read_from_file(profile))
    full = client.query_table("share1", "default", "plain")
    limited = client.query_table("share1", "default", "plain", limit_hint=5)
    assert len(limited.files) < len(full.files)
    df = load_as_spark(spark, f"{profile}#share1.default.plain", limit=5)
    assert df.count() == 5


def test_time_travel(served, spark):
    server, profile, tables = served
    url = f"{profile}#share1.default.plain"
    v0 = load_as_spark(spark, url, version=0)
    direct_v0 = DeltaTable.forPath(spark, tables["plain"] + "@v0").toDF()
    assert _rows(v0, "id") == _rows(direct_v0, "id")

    client = RestClient(DeltaSharingProfile.read_from_file(profile))
    log = DeltaLog.for_table(tables["plain"])
    ts0 = log._commit_timestamp(0)
    resp = client.query_table("share1", "default", "plain", timestamp=str(ts0))
    assert resp.version == 0
    with pytest.raises(DeltaSharingError) as ei:
        client.query_table("share1", "default", "plain",
                           timestamp=str(int(time.time() * 1000) + 10**7))
    assert ei.value.status == 400
    with pytest.raises(DeltaSharingError):
        client.query_table("share1", "default", "plain", version=99)


def test_version_endpoint(served):
    server, profile, tables = served
    client = RestClient(DeltaSharingProfile.read_from_file(profile))
    latest = DeltaLog.for_table(tables["plain"]).latest_version()
    assert client.query_table_version("share1", "default", "plain") == latest
    # startingTimestamp before table creation -> earliest version
    assert client.query_table_version(
        "share1", "default", "plain", starting_timestamp="0") == 0


# ------------------------------------------- delta-format (features) ----


def test_dv_table_shared_in_delta_format(served, spark):
    server, profile, tables = served
    url = f"{profile}#share1.default.dvt"
    client = RestClient(DeltaSharingProfile.read_from_file(profile))
    resp = client.query_table("share1", "default", "dvt")
    assert resp.format == "delta"
    assert any(f.delta_action and
               f.delta_action["add"].get("deletionVector")
               for f in resp.files)
    shared = load_as_spark(spark, url)
    direct = DeltaTable.forPath(spark, tables["dvt"]).toDF()
    assert _rows(shared, "id") == _rows(direct, "id")
    assert shared.filter("id % 10 = 3").count() == 0


def test_column_mapped_table_shared_in_delta_format(served, spark):
    server, profile, tables = served
    shared = load_as_spark(spark, f"{profile}#share1.default.cmt")
    direct = DeltaTable.forPath(spark, tables["cmt"]).toDF()
    assert shared.columns == ["id", "str2"]
    assert _rows(shared, "id") == _rows(direct, "id")


def test_parquet_only_client_rejected_for_feature_table(served, spark):
    server, profile, _ = served
    client = RestClient(DeltaSharingProfile.read_from_file(profile),
                        response_format="parquet")
    with pytest.raises(DeltaSharingError) as ei:
        client.query_table("share1", "default", "dvt")
    assert ei.value.status == 400
    assert "responseformat=delta" in str(ei.value)


def test_forced_delta_format_for_simple_table(served, spark):
    server, profile, tables = served
    shared = load_as_spark(spark, f"{profile}#share1.default.plain",
                           response_format="delta")
    direct = DeltaTable.forPath(spark, tables["plain"]).toDF()
    assert _rows(shared, "id") == _rows(direct, "id")


# ---------------------------------------------------------------- cdf ----


def test_cdf_equals_direct(served, spark, tmp_path):
    server, profile, tables = served
    src = tables["plain"]
    # make some changes so the feed is non-trivial
    t = DeltaTable.forPath(spark, src)
    t.update("id = 7", {"val": "val + 1000"})
    t.delete("id = 8")
    url = f"{profile}#share1.default.plain"
    shared = load_table_changes_as_spark(spark, url, starting_version=0)
    direct = table_changes(spark, DeltaLog.for_table(src),
                           starting_version=0)
    cols = ["id", "part", "val", "_change_type", "_commit_version"]
    assert (_rows(shared.select(cols), "_commit_version", "id", "_change_type")
            == _rows(direct.select(cols), "_commit_version", "id",
                     "_change_type"))
    # _commit_timestamp carried over from the source commits
    sts = dict(shared.select("_commit_version", "_commit_timestamp")
               .distinct().collect())
    dts = dict(direct.select("_commit_version", "_commit_timestamp")
               .distinct().collect())
    assert sts == dts


def test_cdf_range_and_errors(served, spark):
    server, profile, tables = served
    url = f"{profile}#share1.default.plain"
    shared = load_table_changes_as_spark(
        spark, url, starting_version=1, ending_version=1)
    direct = table_changes(spark, DeltaLog.for_table(tables["plain"]),
                           starting_version=1, ending_version=1)
    assert shared.count() == direct.count()

    client = RestClient(DeltaSharingProfile.read_from_file(profile))
    with pytest.raises(DeltaSharingError, match="cdf is not enabled"):
        client.query_table_changes("share1", "default", "dvt",
                                   starting_version=0)
    with pytest.raises(DeltaSharingError, match="must not be after"):
        client.query_table_changes("share1", "default", "plain",
                                   starting_version=2, ending_version=1)


# ------------------------------------------------------ data plane ----


def test_presigned_url_expiry_and_forgery(served):
    server, profile, _ = served
    url, _exp = server.presign("/etc/hostname", expiry_ms=1)
    import urllib.error
    import urllib.request

    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(url)
    assert ei.value.code == 403

    url2, _ = server.presign("/etc/hostname")
    tampered = url2[:-4] + ("aaaa" if not url2.endswith("aaaa") else "bbbb")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(tampered)
    assert ei.value.code == 401


def test_expired_profile_rejected(served, tmp_path):
    server, _, _ = served
    p = server.write_profile(str(tmp_path / "expired.json"),
                             expiration_time="2020-01-01T00:00:00Z")
    client = RestClient(DeltaSharingProfile.read_from_file(p))
    with pytest.raises(DeltaSharingError, match="expired"):
        client.list_shares()


# ----------------------------------------------------- filters (unit) ----


def test_hint_conversion_from_sql():
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("part", T.IntegerType()),
        T.StructField("id", T.LongType()),
        T.StructField("s", T.StringType()),
    ])
    # partition-only conjunct converts; data conjunct dropped by default
    h = F.hints_from_predicate("part = 2 AND id > 5", schema, ["part"])
    tree = json.loads(h)
    assert tree["op"] == "equal"
    assert tree["children"][0] == {
        "op": "column", "name": "part", "valueType": "int"}
    # with the V2 gate both convert
    h2 = F.hints_from_predicate("part = 2 AND id > 5", schema, ["part"],
                                include_data_filters=True)
    assert json.loads(h2)["op"] == "and"
    # IN expands to or-of-equals
    h3 = F.hints_from_predicate("part IN (1, 2)", schema, ["part"])
    assert json.loads(h3)["op"] == "or"
    # unconvertible-only predicate -> None
    assert F.hints_from_predicate("s LIKE 'a%'", schema, ["part"]) is None


def test_stats_skipping_three_valued():
    stats = {"numRecords": 10, "minValues": {"id": 5}, "maxValues": {"id": 9},
             "nullCount": {"id": 0}}
    eq = {"op": "equal", "children": [
        {"op": "column", "name": "id", "valueType": "long"},
        {"op": "literal", "value": "3", "valueType": "long"}]}
    assert F.eval_stats(eq, stats) is False          # outside [5,9] -> skip
    eq["children"][1]["value"] = "7"
    assert F.eval_stats(eq, stats) is None           # may match -> keep
    isnull = {"op": "isNull", "children": [
        {"op": "column", "name": "id", "valueType": "long"}]}
    assert F.eval_stats(isnull, stats) is False      # nullCount 0 -> skip
    # not() over interval logic is always unknown
    assert F.eval_stats({"op": "not", "children": [eq]}, stats) is None
    # missing stats keep the file
    assert F.file_survives(eq, {}, None) is True


# ---------------------------------------------------------- streaming ----


def test_stream_sharing_tails_new_commits(served, spark, tmp_path):
    from delta_spark.sharing.stream import read_stream_sharing
    from delta_spark.streaming import write_stream

    server, profile, tables = served
    url = f"{profile}#share1.default.dvt"
    out_tbl = str(tmp_path / "sink_tbl")
    cache = str(tmp_path / "stream_cache")
    stream = read_stream_sharing(spark, url, sharingCacheDir=cache)
    q = write_stream(stream, out_tbl, str(tmp_path / "ckpt"),
                     query_id="shareq")
    q.awaitTermination(120)
    direct = DeltaTable.forPath(spark, tables["dvt"]).toDF()
    dt = DeltaTable.forPath(spark, out_tbl)
    assert dt.toDF().count() == direct.count()  # DV-filtered snapshot

    # new source commit -> a second availableNow pass picks only it up
    write_delta(spark.range(1000, 1010).select(
        sf.col("id"), (sf.col("id") % 3).alias("m")), tables["dvt"],
        mode="append")
    stream2 = read_stream_sharing(spark, url, sharingCacheDir=cache)
    q2 = write_stream(stream2, out_tbl, str(tmp_path / "ckpt"),
                      query_id="shareq")
    q2.awaitTermination(120)
    assert dt.toDF().count() == direct.count() + 10


def test_stream_sharing_starting_version(served, spark, tmp_path):
    from delta_spark.sharing.stream import read_stream_sharing

    server, profile, tables = served
    url = f"{profile}#share1.default.plain"
    cache = str(tmp_path / "stream_cache2")
    stream = read_stream_sharing(spark, url, sharingCacheDir=cache,
                                 startingVersion="1")
    q = (stream.writeStream.format("memory").queryName("share_sv")
         .option("checkpointLocation", str(tmp_path / "ckpt_sv"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) c FROM share_sv").collect()[0]["c"]
    # version 1 of 'plain' was an empty append; nothing to stream
    assert got == 0


# ------------------------------------------- delta_sharing shim parity ----


def test_delta_sharing_package_shim(served, spark):
    """`import delta_sharing` call sites from the public connector work
    verbatim (load_as_spark uses the ACTIVE session, pandas path needs
    no Spark for classic tables)."""
    import delta_sharing

    server, profile, tables = served
    url = f"{profile}#share1.default.plain"
    assert delta_sharing.get_table_version(url) == \
        DeltaLog.for_table(tables["plain"]).latest_version()
    meta = delta_sharing.get_table_metadata(url)
    assert json.loads(meta["schemaString"])["type"] == "struct"
    assert delta_sharing.get_table_protocol(url)["minReaderVersion"] == 1

    df = delta_sharing.load_as_spark(url)
    direct = DeltaTable.forPath(spark, tables["plain"]).toDF()
    assert df.count() == direct.count()

    pdf = delta_sharing.load_as_pandas(url)
    assert len(pdf) == direct.count()
    assert list(pdf.columns) == direct.columns
    # partition column values survive the pandas path
    assert sorted(pdf["part"].unique().tolist()) == [0, 1, 2, 3]

    # pandas path for a DV table routes through Spark and drops rows
    dv_pdf = delta_sharing.load_as_pandas(f"{profile}#share1.default.dvt")
    assert len(dv_pdf) == DeltaTable.forPath(
        spark, tables["dvt"]).toDF().count()

    ch = delta_sharing.load_table_changes_as_pandas(url, starting_version=0)
    assert set(ch.columns) >= {"_change_type", "_commit_version"}

    sc = delta_sharing.SharingClient(profile)
    assert [s.name for s in sc.list_shares()] == ["share1", "share2"]


def test_column_mapped_cdf_through_sharing(spark, tmp_path):
    """The gnarliest interaction from r8's bug family: CDC files under
    column mapping carry PHYSICAL names; a shared CDF read must decode
    them exactly like a direct read."""
    from delta_spark.sql import delta_sql

    src = str(tmp_path / "cm_cdf")
    write_delta(spark.range(0, 60).selectExpr("id", "id * 2 AS v"), src,
                configuration={"delta.enableChangeDataFeed": "true"})
    t = DeltaTable.forPath(spark, src)
    t.upgradeTableProtocol(2, 5)
    delta_sql(spark, f"ALTER TABLE delta.`{src}` SET TBLPROPERTIES "
                     "('delta.columnMapping.mode' = 'name')")
    delta_sql(spark, f"ALTER TABLE delta.`{src}` RENAME COLUMN v TO val")
    t.update("id % 5 = 0", {"val": "val + 100"})
    t.delete("id = 7")

    cfg = SharingServerConfig()
    cfg.add_table("s", "d", "t", src)
    with SharingServer(cfg) as server:
        profile = server.write_profile(str(tmp_path / "p.json"))
        url = f"{profile}#s.d.t"
        # the range must start after the RENAME (CDF refuses ranges
        # spanning a rename, same as a direct read — cdf.py:142)
        start = DeltaLog.for_table(src).latest_version() - 1
        shared = load_table_changes_as_spark(spark, url,
                                             starting_version=start)
        direct = table_changes(spark, DeltaLog.for_table(src),
                               starting_version=start)
        cols = ["id", "val", "_change_type", "_commit_version"]
        assert (_rows(shared.select(cols), "_commit_version", "id",
                      "_change_type")
                == _rows(direct.select(cols), "_commit_version", "id",
                         "_change_type"))
        # snapshot read too (mapped physical names + renamed column)
        snap = load_as_spark(spark, url)
        assert snap.columns == ["id", "val"]
        assert _rows(snap, "id") == _rows(
            DeltaTable.forPath(spark, src).toDF(), "id")
    DeltaLog.clear_cache()


def test_query_pagination(served, spark):
    """maxFiles pages through endStreamAction cursors; the union of
    pages equals the unpaginated listing and the version is pinned by
    the cursor (PROTOCOL.md paginated queries)."""
    server, profile, _ = served
    client = RestClient(DeltaSharingProfile.read_from_file(profile))
    full = client.query_table("share1", "default", "plain")
    assert len(full.files) > 2

    # transparent drain in the client
    paged = client.query_table("share1", "default", "plain", max_files=2)
    assert sorted(f.id for f in paged.files) == \
        sorted(f.id for f in full.files)

    # raw single page: at most maxFiles files + a cursor
    _, body = client._request(
        "POST", "/shares/share1/schemas/default/tables/plain/query",
        body={"maxFiles": 2})
    lines = [json.loads(l) for l in body.decode().splitlines() if l.strip()]
    kinds = [next(iter(d)) for d in lines]
    assert kinds.count("file") == 2
    assert kinds[-1] == "endStreamAction"
    token = lines[-1]["endStreamAction"]["nextPageToken"]
    _, body2 = client._request(
        "POST", "/shares/share1/schemas/default/tables/plain/query",
        body={"maxFiles": 1000, "pageToken": token})
    page2 = [json.loads(l) for l in body2.decode().splitlines() if l.strip()]
    ids2 = {d["file"]["id"] for d in page2 if "file" in d}
    ids1 = {d["file"]["id"] for d in lines if "file" in d}
    assert ids1.isdisjoint(ids2)
    assert len(ids1 | ids2) == len(full.files)

    with pytest.raises(DeltaSharingError, match="pageToken"):
        client._request(
            "POST", "/shares/share1/schemas/default/tables/plain/query",
            body={"pageToken": "garbage!!"})


def test_hint_skipping_under_column_mapping(spark, tmp_path):
    """Hints carry logical names; under column mapping the server
    translates them to the physical partitionValues/stats keys so
    skipping still fires (a silent name miss would only disable the
    optimization — this pins that it actually works)."""
    from delta_spark.sql import delta_sql

    src = str(tmp_path / "cm_part")
    write_delta(spark.range(0, 80).selectExpr(
        "id", "CAST(id % 4 AS INT) AS bucket"), src,
        partition_by=["bucket"])
    t = DeltaTable.forPath(spark, src)
    t.upgradeTableProtocol(2, 5)
    delta_sql(spark, f"ALTER TABLE delta.`{src}` SET TBLPROPERTIES "
                     "('delta.columnMapping.mode' = 'name')")
    delta_sql(spark, f"ALTER TABLE delta.`{src}` RENAME COLUMN bucket TO b")

    cfg = SharingServerConfig()
    cfg.add_table("s", "d", "t", src)
    with SharingServer(cfg) as server:
        profile = server.write_profile(str(tmp_path / "p.json"))
        client = RestClient(DeltaSharingProfile.read_from_file(profile))
        full = client.query_table("s", "d", "t")
        hinted = client.query_table(
            "s", "d", "t",
            json_predicate_hints=json.dumps({
                "op": "equal", "children": [
                    {"op": "column", "name": "b", "valueType": "int"},
                    {"op": "literal", "value": "2", "valueType": "int"}]}))
        assert 0 < len(hinted.files) < len(full.files)

        # and stats-based skipping on a data column (logical name 'id')
        v2 = client.query_table(
            "s", "d", "t",
            json_predicate_hints=json.dumps({
                "op": "greaterThan", "children": [
                    {"op": "column", "name": "id", "valueType": "long"},
                    {"op": "literal", "value": "1000", "valueType": "long"}]}))
        assert len(v2.files) == 0

        shared = load_as_spark(spark, f"{profile}#s.d.t", predicate="b = 2")
        assert shared.count() == 20
    DeltaLog.clear_cache()


def test_partition_value_encoding_edges(spark, tmp_path):
    """Special characters and NULLs in partition values survive the
    wire + hive-layout materialization round trip (escape_partition_
    value / encode_log_path interplay)."""
    src = str(tmp_path / "enc")
    df = spark.createDataFrame(
        [(1, "a b"), (2, "x=y"), (3, "s/t"), (4, None), (5, "100%")],
        "id int, k string")
    write_delta(df, src, partition_by=["k"])
    cfg = SharingServerConfig()
    cfg.add_table("s", "d", "t", src)
    with SharingServer(cfg) as server:
        profile = server.write_profile(str(tmp_path / "p.json"))
        shared = load_as_spark(spark, f"{profile}#s.d.t")
        direct = DeltaTable.forPath(spark, src).toDF()
        assert _rows(shared, "id") == _rows(direct, "id")
        # null-partition filter semantics intact
        assert shared.filter("k IS NULL").count() == 1
    DeltaLog.clear_cache()


def test_empty_table_and_empty_prune(served, spark, tmp_path):
    src = str(tmp_path / "empty")
    write_delta(spark.range(0).selectExpr("id", "id*2 AS v"), src)
    cfg = SharingServerConfig()
    cfg.add_table("s", "d", "t", src)
    with SharingServer(cfg) as server:
        profile = server.write_profile(str(tmp_path / "p.json"))
        shared = load_as_spark(spark, f"{profile}#s.d.t")
        assert shared.count() == 0
        assert shared.columns == ["id", "v"]
    # a predicate pruning every file of a non-empty table
    _, profile2, _ = served
    pruned = load_as_spark(spark, f"{profile2}#share1.default.plain",
                           predicate="part = 99")
    assert pruned.count() == 0
    DeltaLog.clear_cache()


def test_type_widened_table_through_sharing(spark, tmp_path):
    """Type widening (delta format: typeWidening reader feature) —
    narrow files must read back widened through the faked log."""
    from delta_spark.sql import delta_sql

    src = str(tmp_path / "wide")
    write_delta(spark.range(0, 10).selectExpr(
        "CAST(id AS INT) AS id", "CAST(id AS SMALLINT) AS v"), src,
        configuration={"delta.enableTypeWidening": "true"})
    delta_sql(spark, f"ALTER TABLE delta.`{src}` "
                     "ALTER COLUMN v TYPE INT")
    write_delta(spark.range(10, 20).selectExpr(
        "CAST(id AS INT) AS id", "CAST(id AS INT) AS v"), src,
        mode="append")
    cfg = SharingServerConfig()
    cfg.add_table("s", "d", "t", src)
    with SharingServer(cfg) as server:
        profile = server.write_profile(str(tmp_path / "p.json"))
        shared = load_as_spark(spark, f"{profile}#s.d.t")
        direct = DeltaTable.forPath(spark, src).toDF()
        assert shared.schema == direct.schema
        assert _rows(shared, "id") == _rows(direct, "id")
    DeltaLog.clear_cache()


def test_mid_range_protocol_upgrade_materializes(spark, tmp_path):
    """A protocol upgrade inside a changes range (DVs enabled at v1,
    DV delete at v2) must land in the faked log before the DV-carrying
    actions — historical protocol lines round-trip."""
    from delta_spark.sql import delta_sql

    src = str(tmp_path / "upg")
    write_delta(spark.range(0, 50).selectExpr("id", "id*2 AS v"), src,
                configuration={"delta.enableChangeDataFeed": "true"})
    delta_sql(spark, f"ALTER TABLE delta.`{src}` SET TBLPROPERTIES "
                     "('delta.enableDeletionVectors' = 'true')")
    DeltaTable.forPath(spark, src).delete("id % 5 = 0")

    cfg = SharingServerConfig()
    cfg.add_table("s", "d", "t", src)
    with SharingServer(cfg) as server:
        profile = server.write_profile(str(tmp_path / "p.json"))
        url = f"{profile}#s.d.t"
        shared = load_table_changes_as_spark(spark, url, starting_version=0)
        direct = table_changes(spark, DeltaLog.for_table(src),
                               starting_version=0)
        cols = ["id", "v", "_change_type", "_commit_version"]
        assert (_rows(shared.select(cols), "_commit_version", "id",
                      "_change_type")
                == _rows(direct.select(cols), "_commit_version", "id",
                         "_change_type"))
    DeltaLog.clear_cache()


def test_legacy_predicate_hints(served):
    """Classic predicateHints (SQL strings) prune through the engine's
    own files_for_scan; malformed hints degrade to the full listing."""
    server, profile, _ = served
    client = RestClient(DeltaSharingProfile.read_from_file(profile))
    full = client.query_table("share1", "default", "plain")
    hinted = client.query_table("share1", "default", "plain",
                                predicate_hints=["part = 1"])
    assert 0 < len(hinted.files) < len(full.files)
    junk = client.query_table("share1", "default", "plain",
                              predicate_hints=["?? not sql ??"])
    assert len(junk.files) == len(full.files)


def test_streaming_cdf_through_sharing(served, spark, tmp_path):
    """readChangeFeed=true on the sharing stream source: CDC actions in
    appended faked commits drive the ordinary streaming-CDF path."""
    from delta_spark.sharing.stream import read_stream_sharing

    server, profile, tables = served
    # fresh change on the CDF-enabled table
    t = DeltaTable.forPath(spark, tables["plain"])
    t.delete("id = 11")
    url = f"{profile}#share1.default.plain"
    cache = str(tmp_path / "cdf_stream_cache")
    stream = read_stream_sharing(spark, url, sharingCacheDir=cache,
                                 readChangeFeed="true",
                                 startingVersion="0")
    q = (stream.writeStream.format("memory").queryName("share_cdf")
         .option("checkpointLocation", str(tmp_path / "ckpt_cdf"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT _change_type, count(*) AS n FROM share_cdf "
        "GROUP BY _change_type ORDER BY _change_type").collect()
    direct = table_changes(spark, DeltaLog.for_table(tables["plain"]),
                           starting_version=0)
    want = sorted((r[0], r[1]) for r in direct
                  .groupBy("_change_type").count().collect())
    assert sorted((r[0], r[1]) for r in got) == want


def test_expired_urls_refresh_once(served, spark, tmp_path, monkeypatch):
    """Presigned urls that expire before the download completes trigger
    ONE pinned re-query for fresh urls (the refreshToken role)."""
    server, profile, tables = served
    # first query hands out already-expired urls; the re-query gets
    # valid ones — flip the server's expiry after the first /query
    server.config.url_expiration_ms = -1000
    calls = {"n": 0}
    real = RestClient.query_table

    def flip(self, *a, **k):
        calls["n"] += 1
        resp = real(self, *a, **k)
        server.config.url_expiration_ms = 3_600_000
        return resp

    monkeypatch.setattr(RestClient, "query_table", flip)
    df = load_as_spark(spark, f"{profile}#share1.default.plain",
                       cache_dir=str(tmp_path / "exp_cache"))
    assert calls["n"] == 2  # original + one refresh
    assert df.count() == DeltaTable.forPath(
        spark, tables["plain"]).toDF().count()


def test_pagination_pinned_across_concurrent_commit(served, spark):
    """A commit landing between pages must NOT leak into the paginated
    listing: the cursor pins the snapshot version."""
    server, profile, tables = served
    client = RestClient(DeltaSharingProfile.read_from_file(profile))
    before = client.query_table("share1", "default", "dvt")
    _, body = client._request(
        "POST", "/shares/share1/schemas/default/tables/dvt/query",
        body={"maxFiles": 1})
    lines = [json.loads(l) for l in body.decode().splitlines() if l.strip()]
    token = lines[-1]["endStreamAction"]["nextPageToken"]

    # concurrent commit grows the table between pages
    write_delta(spark.range(5000, 5020).select(
        sf.col("id"), (sf.col("id") % 3).alias("m")), tables["dvt"],
        mode="append")
    after = client.query_table("share1", "default", "dvt")
    assert len(after.files) > len(before.files)

    _, body2 = client._request(
        "POST", "/shares/share1/schemas/default/tables/dvt/query",
        body={"maxFiles": 1000, "pageToken": token})
    page2 = [json.loads(l) for l in body2.decode().splitlines() if l.strip()]
    ids = ({d["file"]["id"] for d in lines if "file" in d}
           | {d["file"]["id"] for d in page2 if "file" in d})
    assert ids == {f.id for f in before.files}  # old snapshot, complete


def test_oauth_client_credentials_profile(served, spark, tmp_path):
    """shareCredentialsVersion-2 profiles: the client fetches an access
    token via the client-credentials grant, caches it, and reads with
    it; bad secrets and expired tokens are refused."""
    server, _, tables = served
    server.config.oauth_clients["svc-reader"] = "s3cr3t"
    prof = server.write_oauth_profile(str(tmp_path / "oauth.json"),
                                      "svc-reader")
    client = RestClient(DeltaSharingProfile.read_from_file(prof))
    assert [s["name"] for s in client.list_shares()] == ["share1", "share2"]
    # token cached: a second call does not refetch (same token object)
    t1 = client._oauth_token
    client.list_shares()
    assert client._oauth_token == t1

    # full spark read through oauth auth
    df = load_as_spark(spark, f"{prof}#share1.default.plain",
                       cache_dir=str(tmp_path / "oauth_cache"))
    assert df.count() == DeltaTable.forPath(
        spark, tables["plain"]).toDF().count()

    # wrong secret -> invalid_client
    bad = DeltaSharingProfile.read_from_file(prof)
    bad.client_secret = "wrong"
    with pytest.raises(DeltaSharingError) as ei:
        RestClient(bad).list_shares()
    assert ei.value.status == 401

    # expired oauth tokens are refused at the API
    server.config.oauth_token_lifetime_ms = -1000
    stale = RestClient(DeltaSharingProfile.read_from_file(prof))
    with pytest.raises(DeltaSharingError) as ei:
        stale.list_shares()
    assert ei.value.status == 401
    server.config.oauth_token_lifetime_ms = 3_600_000

    # unsupported v2 type still rejected with a clear error
    with open(str(tmp_path / "badv2.json"), "w") as f:
        json.dump({"shareCredentialsVersion": 2, "type": "bearer_token",
                   "endpoint": "x"}, f)
    with pytest.raises(DeltaSharingError, match="oauth_client_credentials"):
        DeltaSharingProfile.read_from_file(str(tmp_path / "badv2.json"))


def test_batch_format_read(served, spark, tmp_path):
    """spark.read.format('delta_sharing_py') — batch format parity with
    the reference's deltaSharing source, incl. versionAsOf."""
    from delta_spark.sharing.stream import register

    server, profile, tables = served
    register(spark)
    url = f"{profile}#share1.default.plain"
    cache = str(tmp_path / "batch_cache")
    df = (spark.read.format("delta_sharing_py").option("path", url)
          .option("sharingCacheDir", cache).load())
    direct = DeltaTable.forPath(spark, tables["plain"]).toDF()
    assert df.count() == direct.count()
    assert sorted(df.columns) == sorted(direct.columns)

    v0 = (spark.read.format("delta_sharing_py").option("path", url)
          .option("versionAsOf", "0")
          .option("sharingCacheDir", cache).load())
    assert v0.count() == DeltaTable.forPath(
        spark, tables["plain"] + "@v0").toDF().count()


def test_server_fuzz_readers_race_writer(spark, tmp_path):
    """Concurrency fuzz: 4 reader threads issue snapshot queries,
    paginated drains, metadata and CDF reads while a writer commits to
    the source. Every response must be a CONSISTENT snapshot of a real
    version (file ids == that version's file ids), pagination must
    stay pinned, and nothing may 500."""
    import threading

    src = str(tmp_path / "fuzz")
    write_delta(spark.range(0, 40).selectExpr("id", "id % 4 AS b"), src,
                configuration={"delta.enableChangeDataFeed": "true"})
    cfg = SharingServerConfig()
    cfg.add_table("s", "d", "t", src)
    with SharingServer(cfg) as server:
        profile = server.write_profile(str(tmp_path / "p.json"))
        client_profile = DeltaSharingProfile.read_from_file(profile)
        stop = threading.Event()
        failures: list[str] = []

        def expected_ids(version):
            from delta_spark.sharing.server import _file_id

            DeltaLog.clear_cache()
            snap = DeltaLog.for_table(src).snapshot_at(version)
            return {_file_id(src, f.path) for f in snap.all_files}

        def reader(n):
            client = RestClient(client_profile)
            try:
                while not stop.is_set():
                    resp = client.query_table("s", "d", "t",
                                              max_files=2 if n % 2 else None)
                    got = {f.id for f in resp.files}
                    want = expected_ids(resp.version)
                    if got != want:
                        failures.append(
                            f"reader{n}: v{resp.version} files {len(got)} "
                            f"!= snapshot {len(want)}")
                        return
                    if n == 0:
                        client.query_table_metadata("s", "d", "t")
                    if n == 1:
                        ch = client.query_table_changes(
                            "s", "d", "t", starting_version=0,
                            ending_version=0)
                        if not any(f.kind == "add" for f in ch.files):
                            failures.append("reader1: empty v0 changes")
                            return
            except Exception as e:  # noqa: BLE001
                failures.append(f"reader{n}: {type(e).__name__}: {e}")

        def writer():
            for i in range(6):
                write_delta(
                    spark.range(100 * (i + 1), 100 * (i + 1) + 10)
                    .selectExpr("id", "id % 4 AS b"), src, mode="append")
            stop.set()

        threads = [threading.Thread(target=reader, args=(i,))
                   for i in range(4)] + [threading.Thread(target=writer)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not failures, failures

        # after the dust settles: a fresh read equals the final table
        DeltaLog.clear_cache()
        final = load_as_spark(spark, f"{profile}#s.d.t",
                              cache_dir=str(tmp_path / "fc"))
        assert final.count() == DeltaTable.forPath(spark, src).toDF().count()
    DeltaLog.clear_cache()


def test_typed_feature_tables_through_sharing(spark, tmp_path):
    """timestampNtz and variant tables need their reader features
    negotiated in delta format; values must round-trip exactly
    (reference DeltaSharingDataSourceTypeWideningSuite siblings)."""
    # timestamp_ntz
    ntz = str(tmp_path / "ntz")
    write_delta(spark.range(0, 12).selectExpr(
        "id",
        "CAST(timestamp'2024-05-01 10:30:00' + make_interval(0,0,0,0,0,0,id)"
        " AS TIMESTAMP_NTZ) AS ts"), ntz)
    # variant
    var = str(tmp_path / "var")
    write_delta(spark.range(0, 12).selectExpr(
        "id", "parse_json(concat('{\"a\": ', id, '}')) AS v"), var)

    cfg = SharingServerConfig()
    cfg.add_table("s", "d", "ntz", ntz)
    cfg.add_table("s", "d", "var", var)
    with SharingServer(cfg) as server:
        profile = server.write_profile(str(tmp_path / "p.json"))
        client = RestClient(DeltaSharingProfile.read_from_file(profile))
        assert client.query_table("s", "d", "ntz").format == "delta"

        shared_ntz = load_as_spark(spark, f"{profile}#s.d.ntz")
        direct_ntz = DeltaTable.forPath(spark, ntz).toDF()
        assert shared_ntz.schema == direct_ntz.schema
        assert _rows(shared_ntz, "id") == _rows(direct_ntz, "id")

        shared_var = load_as_spark(spark, f"{profile}#s.d.var")
        got = [tuple(r) for r in shared_var.selectExpr(
            "id", "variant_get(v, '$.a', 'long') AS a")
            .orderBy("id").collect()]
        assert got == [(i, i) for i in range(12)]

        # a parquet-only client is cleanly refused for both
        pq_only = RestClient(DeltaSharingProfile.read_from_file(profile),
                             response_format="parquet")
        with pytest.raises(DeltaSharingError):
            pq_only.query_table("s", "d", "ntz")
    DeltaLog.clear_cache()


def test_stream_resumes_across_server_restart(spark, tmp_path):
    """A checkpointed sharing stream must resume when the provider
    endpoint CHANGES (server restarted on a new port, profile
    regenerated): the faked-log cache is keyed by the table's
    immutable metadata id, not the endpoint."""
    from delta_spark.sharing.stream import read_stream_sharing
    from delta_spark.streaming import write_stream

    src = str(tmp_path / "resrc")
    write_delta(spark.range(0, 30).selectExpr("id", "id*2 AS v"), src)
    cache = str(tmp_path / "restart_cache")
    out = str(tmp_path / "resink")
    ck = str(tmp_path / "reck")

    cfg1 = SharingServerConfig()
    cfg1.add_table("s", "d", "t", src)
    with SharingServer(cfg1) as s1:
        p1 = s1.write_profile(str(tmp_path / "p1.json"))
        q = write_stream(
            read_stream_sharing(spark, f"{p1}#s.d.t", sharingCacheDir=cache),
            out, ck, query_id="restartq")
        q.awaitTermination(120)
    assert DeltaTable.forPath(spark, out).toDF().count() == 30

    write_delta(spark.range(30, 45).selectExpr("id", "id*2 AS v"), src,
                mode="append")

    # brand-new server: new ephemeral port, new bearer token, new
    # profile — same table
    cfg2 = SharingServerConfig()
    cfg2.add_table("s", "d", "t", src)
    with SharingServer(cfg2) as s2:
        p2 = s2.write_profile(str(tmp_path / "p2.json"))
        assert s2.port != s1.port or cfg2.bearer_token != cfg1.bearer_token
        q2 = write_stream(
            read_stream_sharing(spark, f"{p2}#s.d.t", sharingCacheDir=cache),
            out, ck, query_id="restartq")
        q2.awaitTermination(120)
    assert DeltaTable.forPath(spark, out).toDF().count() == 45
    DeltaLog.clear_cache()


def test_wire_shapes_for_foreign_clients(served):
    """Exact NDJSON field shapes a FOREIGN (non-delta_spark) client
    parses: classic protocol/metaData/file lines and the delta-format
    envelope (PROTOCOL.md; sharing/.../model.scala:49)."""
    server, profile, _ = served
    client = RestClient(DeltaSharingProfile.read_from_file(profile))

    # classic format
    headers, body = client._request(
        "POST", "/shares/share1/schemas/default/tables/plain/query",
        body={})
    lines = [json.loads(l) for l in body.decode().splitlines() if l.strip()]
    assert lines[0] == {"protocol": {"minReaderVersion": 1}}
    md = lines[1]["metaData"]
    assert md["format"] == {"provider": "parquet"}
    assert isinstance(md["schemaString"], str)
    assert md["partitionColumns"] == ["part"]
    assert md["configuration"] == {"enableChangeDataFeed": "true"}
    assert md["version"] >= 0 and md["numFiles"] == len(lines) - 2
    for line in lines[2:]:
        f = line["file"]
        assert set(f) >= {"url", "id", "partitionValues", "size",
                          "expirationTimestamp"}
        assert f["url"].startswith("http://")
        assert set(f["partitionValues"]) == {"part"}
    hv = {k.lower(): v for k, v in headers.items()}
    assert "delta-table-version" in hv
    assert "responseformat=parquet" in hv["delta-sharing-capabilities"]

    # delta format envelope
    _, body = client._request(
        "POST", "/shares/share1/schemas/default/tables/dvt/query",
        body={})
    lines = [json.loads(l) for l in body.decode().splitlines() if l.strip()]
    assert set(lines[0]["protocol"]) == {"deltaProtocol"}
    dm = lines[1]["metaData"]
    assert set(dm) >= {"deltaMetadata", "version", "size", "numFiles"}
    assert "schemaString" in dm["deltaMetadata"]
    for line in lines[2:]:
        f = line["file"]
        assert set(f) >= {"id", "deltaSingleAction", "expirationTimestamp"}
        add = f["deltaSingleAction"]["add"]
        assert add["path"].startswith("http://")
        if add.get("deletionVector"):
            dv = add["deletionVector"]
            assert dv["storageType"] in ("i", "p")
            if dv["storageType"] == "p":
                assert dv["pathOrInlineDv"].startswith("http://")
                assert line["file"]["deletionVectorFileId"]


def test_range_format_negotiated_against_whole_range(spark, tmp_path):
    """Review fix: a DV-carrying action AFTER the range start must
    force the delta format (a parquet emission would drop the DV and
    resurrect deleted rows) — and a parquet-only client is refused."""
    from delta_spark.sql import delta_sql

    src = str(tmp_path / "dvrange")
    write_delta(spark.range(0, 30).selectExpr("id", "id*2 AS v"), src)
    delta_sql(spark, f"ALTER TABLE delta.`{src}` SET TBLPROPERTIES "
                     "('delta.enableDeletionVectors' = 'true')")
    DeltaTable.forPath(spark, src).delete("id % 3 = 0")  # DV delete

    cfg = SharingServerConfig()
    cfg.add_table("s", "d", "t", src)
    with SharingServer(cfg) as server:
        profile = server.write_profile(str(tmp_path / "p.json"))
        client = RestClient(DeltaSharingProfile.read_from_file(profile))
        resp = client.query_table("s", "d", "t", starting_version=0)
        assert resp.format == "delta"
        dv_adds = [f for f in resp.files
                   if f.delta_action and "add" in f.delta_action
                   and f.delta_action["add"].get("deletionVector")]
        assert dv_adds, "the DV delete's add must carry its DV"
        pq = RestClient(DeltaSharingProfile.read_from_file(profile),
                        response_format="parquet")
        with pytest.raises(DeltaSharingError):
            pq.query_table("s", "d", "t", starting_version=0)
    DeltaLog.clear_cache()


def test_limit_hint_spans_pages(served):
    """Review fix: limitHint bounds the whole paginated query, not each
    page — the cursor carries the cumulative record count."""
    server, profile, _ = served
    client = RestClient(DeltaSharingProfile.read_from_file(profile))
    unlimited = client.query_table("share1", "default", "plain",
                                   max_files=1)
    limited = client.query_table("share1", "default", "plain",
                                 limit_hint=5, max_files=1)
    total = sum(json.loads(f.stats)["numRecords"] for f in limited.files
                if f.stats)
    # enough records for the hint, far fewer files than the full drain
    assert total >= 5
    assert len(limited.files) < len(unlimited.files)


def test_stream_starting_version_latest(served, spark, tmp_path):
    """Review fix: startingVersion='latest' tails only NEW commits."""
    from delta_spark.sharing.stream import read_stream_sharing
    from delta_spark.streaming import write_stream

    server, profile, tables = served
    url = f"{profile}#share1.default.dvt"
    cache = str(tmp_path / "latest_cache")
    out = str(tmp_path / "latest_sink")
    ck = str(tmp_path / "ck_latest")
    s1 = read_stream_sharing(spark, url, sharingCacheDir=cache,
                             startingVersion="latest")
    q = write_stream(s1, out, ck, query_id="latestq")
    q.awaitTermination(120)
    assert DeltaTable.forPath(spark, out).toDF().count() == 0

    write_delta(spark.range(9000, 9007).select(
        sf.col("id"), (sf.col("id") % 3).alias("m")), tables["dvt"],
        mode="append")
    s2 = read_stream_sharing(spark, url, sharingCacheDir=cache,
                             startingVersion="latest")
    q2 = write_stream(s2, out, ck, query_id="latestq")
    q2.awaitTermination(120)
    assert DeltaTable.forPath(spark, out).toDF().count() == 7


def test_stream_init_heals_after_partial_crash(served, spark, tmp_path):
    """Review fix: a crash between commit 0 and the filler chain (or
    the marker) re-enters and heals without double-emitting."""
    from delta_spark.sharing.stream import SharingStreamSync

    server, profile, tables = served
    url = f"{profile}#share1.default.dvt"
    cache = str(tmp_path / "heal_cache")
    sync = SharingStreamSync(url, cache_dir=cache)
    sync.ensure_initialized()
    log_dir = os.path.join(sync.table_dir, "_delta_log")
    # simulate the crash: completion marker + some fillers lost
    os.remove(os.path.join(log_dir, ".stream_init"))
    fillers = sorted(f for f in os.listdir(log_dir)
                     if f.endswith(".json") and int(f.split(".")[0]) > 0)
    if fillers:
        os.remove(os.path.join(log_dir, fillers[-1]))
    sync2 = SharingStreamSync(url, cache_dir=cache)
    sync2.ensure_initialized()
    assert os.path.exists(os.path.join(log_dir, ".stream_init"))
    # snapshot-version anchor respected: local latest == source latest
    assert sync2._local_version() == DeltaLog.for_table(
        tables["dvt"]).latest_version()
    # healed stream equals a DV-filtered direct read
    from delta_spark.reader import read_snapshot

    healed = read_snapshot(spark, DeltaLog.for_table(
        sync2.table_dir).update())
    assert healed.count() == DeltaTable.forPath(
        spark, tables["dvt"]).toDF().count()
    DeltaLog.clear_cache()


def test_cdf_timestamp_bounds(served, spark):
    """starting/ending_timestamp on the changes endpoint resolve to the
    same versions a direct timestamp-bounded CDF read uses."""
    server, profile, tables = served
    log = DeltaLog.for_table(tables["plain"])
    ts1 = log._commit_timestamp(1)
    url = f"{profile}#share1.default.plain"
    shared = load_table_changes_as_spark(
        spark, url, starting_timestamp=str(ts1), ending_timestamp=str(ts1))
    direct = table_changes(spark, log, starting_version=1,
                           ending_version=1)
    assert shared.count() == direct.count()
    # a future starting timestamp is refused like the direct read
    with pytest.raises(DeltaSharingError) as ei:
        load_table_changes_as_spark(
            spark, url, starting_timestamp=str(ts1 + 10**9))
    assert ei.value.status == 400


def test_cross_process_client(served, tmp_path):
    """A separate OS process (no Spark, pure-pyarrow pandas path) reads
    through the live server — the data plane is genuinely cross-process
    HTTP, not shared in-process state."""
    import subprocess
    import sys

    server, profile, _ = served
    script = tmp_path / "foreign_reader.py"
    script.write_text(
        "import sys\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "import delta_sharing\n"
        f"pdf = delta_sharing.load_as_pandas({profile!r} + '#share1.default.plain')\n"
        "print('ROWS=' + str(len(pdf)))\n"
        "print('PARTS=' + ','.join(str(x) for x in sorted(pdf['part'].unique())))\n")
    out = subprocess.run([sys.executable, str(script)], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ROWS=200" in out.stdout
    assert "PARTS=0,1,2,3" in out.stdout
