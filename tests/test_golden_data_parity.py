"""VALUE-level conformance against the reference's golden-table corpus
(connectors/golden-tables/src/main/resources/golden, written by the
reference implementation's GoldenTables.scala generator).

test_reference_fixtures.py checks row-count parity for a handful of
fixtures; this module compares every cell. The oracle side never
touches delta_spark: live files come from an independent naive
last-writer-wins replay of the raw JSON/checkpoint log, values are
decoded by DuckDB's parquet reader, partition values are re-typed from
the raw `partitionValues` strings per the Delta serialization spec,
and column-mapped tables get their physical→logical rename from the
schemaString metadata. A decode or replay bug in delta_spark therefore
cannot cancel out of both sides.

Covers the decode matrix the reference's DeltaDataReaderSuite and
kernel suites pin: all primitive types, nested structs, arrays (to 4
dimensions), maps (including struct/array values), decimals in all
four physical encodings (INT32/INT64/FIXED_LEN_BYTE_ARRAY/dictionary),
legacy parquet format, INT96/MICROS/MILLIS timestamps, TIMESTAMP_NTZ
(plain + id/name column mapping), date/timestamp partition columns
across seven writer time zones, and escaped characters in paths.
"""

from __future__ import annotations

import datetime
import decimal
import json
import math
import os
from urllib.parse import unquote

import duckdb
import pytest

from delta_spark.log import DeltaLog
from delta_spark.table import DeltaTable

GOLDEN = "/root/reference/connectors/golden-tables/src/main/resources/golden"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN), reason="golden tables absent")


# ---------------------------------------------------------------------------
# independent replay (no delta_spark): live adds + latest metaData
# ---------------------------------------------------------------------------

def _replay(table):
    import pyarrow.parquet as pq

    logdir = os.path.join(table, "_delta_log")
    names = sorted(n for n in os.listdir(logdir)
                   if n.endswith(".json") and n[:20].isdigit())
    ckpts = sorted(n for n in os.listdir(logdir)
                   if n.endswith(".checkpoint.parquet"))
    active, meta = {}, None
    start = 0
    if ckpts:
        ck = ckpts[-1]
        start = int(ck.split(".")[0]) + 1
        for row in pq.read_table(os.path.join(logdir, ck)).to_pylist():
            if row.get("add") and row["add"].get("path"):
                active[row["add"]["path"]] = row["add"]
            if row.get("remove") and row["remove"].get("path"):
                active.pop(row["remove"]["path"], None)
            if row.get("metaData") and row["metaData"].get("schemaString"):
                meta = row["metaData"]
    for n in names:
        if int(n[:20]) < start:
            continue
        with open(os.path.join(logdir, n)) as f:
            for line in f:
                if not line.strip():
                    continue
                d = json.loads(line)
                if "add" in d:
                    active[d["add"]["path"]] = d["add"]
                elif "remove" in d:
                    active.pop(d["remove"]["path"], None)
                elif "metaData" in d:
                    meta = d["metaData"]
    return active, meta


def _field_physical(f):
    return f.get("metadata", {}).get(
        "delta.columnMapping.physicalName", f["name"])


def _parse_partition_value(s, ftype):
    """Delta partition-value string → typed python value (PROTOCOL.md
    partition value serialization)."""
    if s is None:
        return None
    if isinstance(ftype, dict):   # struct/map/array can't be partition cols
        raise AssertionError("complex partition type")
    if ftype in ("integer", "long", "short", "byte"):
        return int(s)
    if ftype in ("float", "double"):
        return float(s)
    if ftype == "boolean":
        return s == "true"
    if ftype.startswith("decimal"):
        return decimal.Decimal(s)
    if ftype == "date":
        return datetime.date.fromisoformat(s)
    if ftype in ("timestamp", "timestamp_ntz"):
        t = s.replace("T", " ").replace("Z", "")
        for fmt in ("%Y-%m-%d %H:%M:%S.%f", "%Y-%m-%d %H:%M:%S"):
            try:
                return datetime.datetime.strptime(t, fmt)
            except ValueError:
                continue
        raise AssertionError(f"unparsed timestamp partition value {s!r}")
    if ftype == "binary":
        return s.encode("latin-1")
    return s  # string


def _coerce_widened(v, ftype):
    """Type widening (type-widening golden tables): files written
    BEFORE a widen carry the narrow physical type; the end logical
    schema governs what every engine serves. Coerce duck's narrow
    decode to the logical type the same way a widening-aware reader
    upcasts — int->decimal/double, date->timestamp — so value parity
    is judged at the end schema."""
    if isinstance(ftype, str):
        if ftype.startswith("decimal") and isinstance(v, int) \
                and not isinstance(v, bool):
            return decimal.Decimal(v)
        if ftype in ("double", "float") and isinstance(v, int) \
                and not isinstance(v, bool):
            return float(v)
        if ftype in ("timestamp", "timestamp_ntz") \
                and isinstance(v, datetime.date) \
                and not isinstance(v, datetime.datetime):
            return datetime.datetime(v.year, v.month, v.day)
    return v


def _rename_nested(v, ftype):
    """Recursively map PHYSICAL nested-field names (col-<uuid> under
    column mapping) back to logical ones in a duckdb-decoded value,
    guided by the logical schema type."""
    if v is None or not isinstance(ftype, dict):
        return _coerce_widened(v, ftype)
    t = ftype.get("type")
    if t == "struct":
        out = {}
        for f in ftype["fields"]:
            out[f["name"]] = _rename_nested(
                v.get(_field_physical(f)), f["type"])
        return out
    if t == "array":
        return [_rename_nested(x, ftype["elementType"]) for x in v]
    if t == "map":
        # arrow map values arrive as lists of (key, value) tuples
        return [( _rename_nested(k, ftype["keyType"]),
                  _rename_nested(x, ftype["valueType"])) for k, x in v]
    return v


def _duck_rows(table):
    """Oracle: live parquet files decoded by DuckDB, partition columns
    injected from the raw partitionValues strings, physical names
    mapped back to logical ones."""
    active, meta = _replay(table)
    schema = json.loads(meta["schemaString"])
    part_cols = meta.get("partitionColumns") or []
    fields = schema["fields"]
    by_name = {f["name"]: f for f in fields}
    data_fields = [f for f in fields if f["name"] not in part_cols]

    con = duckdb.connect()
    out = []
    cols = [f["name"] for f in fields]
    import pyarrow.parquet as pq
    for path, a in sorted(active.items()):
        assert not a.get("deletionVector"), "DV tables not covered here"
        fpath = os.path.join(table, unquote(path))
        # schema evolution: files written before a column was added
        # lack it physically — read what's present, NULL-fill the rest
        present = set(pq.read_schema(fpath).names)
        sel = ", ".join(
            f'"{_field_physical(f)}" AS "{f["name"]}"'
            if _field_physical(f) in present else f'NULL AS "{f["name"]}"'
            for f in data_fields)
        # Arrow, not fetchall(): maps with non-hashable (array) keys
        # can't round-trip through python dicts, and Arrow gives both
        # engines one uniform map representation (entry-tuple lists)
        arrow_rows = con.execute(
            f"SELECT {sel} FROM read_parquet('{fpath}')").arrow().to_pylist()
        rows = [tuple(d[f["name"]] for f in data_fields)
                for d in arrow_rows]
        pv = a.get("partitionValues") or {}
        # partitionValues is keyed by PHYSICAL name under column mapping
        phys_to_logical = {_field_physical(f): f["name"] for f in fields}
        typed = {}
        for k, v in pv.items():
            lname = phys_to_logical.get(k, k)
            typed[lname] = _parse_partition_value(v, by_name[lname]["type"])
        for r in rows:
            d = {f["name"]: _rename_nested(x, f["type"])
                 for f, x in zip(data_fields, r)}
            d.update(typed)
            out.append(tuple(d[c] for c in cols))
    return cols, out


# ---------------------------------------------------------------------------
# canonicalization: one normal form for both engines' row objects
# ---------------------------------------------------------------------------

def _norm(v):
    from pyspark.sql import Row

    if v is None:
        return None
    if isinstance(v, Row):
        v = v.asDict()
    if isinstance(v, dict):
        # structs → sorted [field, value] pairs (maps arrive as
        # entry-tuple lists from Arrow on both sides, handled by the
        # list branch — entry order comes from the same parquet file,
        # so it agrees between engines)
        pairs = [[json.dumps(_norm(k), sort_keys=True, default=str),
                  _norm(x)] for k, x in v.items()]
        return sorted(pairs, key=lambda p: p[0])
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        s = format(v, "f")
        if "." in s:
            s = s.rstrip("0").rstrip(".")
        return "dec:" + (s or "0")
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, datetime.datetime):
        if v.tzinfo is not None:   # spark→arrow stamps session tz (UTC)
            v = v.astimezone(datetime.timezone.utc)
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        json.dumps([_norm(r[i]) for i in idx], sort_keys=True, default=str)
        for r in rows)


KERNEL = "/root/reference/kernel/kernel-defaults/src/test/resources"


def _assert_table_parity(spark, name):
    table = name if os.path.isabs(name) else os.path.join(GOLDEN, name)
    DeltaLog.clear_cache()
    df = DeltaTable.forPath(spark, table).toDF()
    got_cols = df.columns
    got = [tuple(d[c] for c in got_cols) for d in df.toArrow().to_pylist()]
    want_cols, want = _duck_rows(table)
    assert sorted(got_cols) == sorted(want_cols), (got_cols, want_cols)
    cg, cw = _canon_rows(got_cols, got), _canon_rows(want_cols, want)
    assert len(cg) == len(cw), f"{name}: {len(cg)} vs {len(cw)} rows"
    mismatches = [(a, b) for a, b in zip(cg, cw) if a != b]
    assert not mismatches, f"{name}: first mismatch {mismatches[0]}"


# ---------------------------------------------------------------------------
# the decode matrix
# ---------------------------------------------------------------------------

ALL_TYPES_AND_DECIMALS = [
    "parquet-all-types",                    # 200 rows × 20 cols, all types
    "parquet-all-types-legacy-format",      # same, legacy parquet format
    "124-decimal-decode-bug",               # INT64-backed decimal(10,0)
    "125-iterator-bug",                     # empty + single-row commits
    "basic-decimal-table",                  # all 4 decimal encodings + part
    "basic-decimal-table-legacy",
    "decimal-various-scale-precision",      # precision 0..38 × scales
    # parquet-decimal-dictionaries-v1 ships log-only in the reference
    # repo (its data file was never committed) — unreadable by any
    # engine, so excluded
    "parquet-decimal-dictionaries-v2",
    "parquet-decimal-dictionaries",         # unsuffixed variant
]

DATA_READER = [
    "data-reader-primitives",
    "data-reader-array-primitives",
    "data-reader-array-complex-objects",    # 3d/4d arrays, maps in arrays
    "data-reader-map",
    "data-reader-nested-struct",
    "data-reader-nullable-field-invalid-schema-key",
    "data-reader-escaped-chars",            # special chars in partition path
    "data-reader-partition-values",         # 12 partition cols, all types
]

TIMESTAMPS = [
    "data-reader-date-types-UTC",
    "data-reader-date-types-Iceland",
    "data-reader-date-types-PST",
    "data-reader-date-types-JST",
    "data-reader-date-types-America/Los_Angeles",
    "data-reader-date-types-Etc/GMT+9",
    "data-reader-date-types-Asia/Beirut",
    "kernel-timestamp-INT96",
    "kernel-timestamp-TIMESTAMP_MICROS",
    "kernel-timestamp-TIMESTAMP_MILLIS",
    "kernel-timestamp-PST",
    "kernel-timestamp-partition-col-ISO8601",
    "data-reader-timestamp_ntz",
    "data-reader-timestamp_ntz-id-mode",    # column mapping: id
    "data-reader-timestamp_ntz-name-mode",  # column mapping: name
]

SNAPSHOTS = [
    "snapshot-data0", "snapshot-data1", "snapshot-data2",
    "snapshot-data2-deleted", "snapshot-data3",
    "snapshot-repartitioned", "snapshot-vacuumed",
    "time-travel-start", "time-travel-start-start20",
    "time-travel-start-start20-start40",
    "time-travel-partition-changes-a", "time-travel-partition-changes-b",
    "time-travel-schema-changes-a", "time-travel-schema-changes-b",
]

LOG_SHAPES = [
    "multi-part-checkpoint",          # checkpoint split into part files
    "only-checkpoint-files",          # no JSON commits after checkpoint
    "log-replay-latest-metadata-protocol",  # later Metadata/Protocol win
    "commit-info-containing-arbitrary-operationParams-types",
    "type-widening",                  # files narrower than end schema
    "type-widening-nested",
    "table-with-columnmapping-mode-id",
    "table-with-columnmapping-mode-name",
    "table-with-icebegCompatV2Enabled",
    "basic-with-vacuum-protocol-check-feature",
    "parquet-decimal-type",
    "data-skipping-basic-stats-all-types-checkpoint",
    "data-skipping-basic-stats-all-types-columnmapping-id",
    "data-skipping-basic-stats-all-types-columnmapping-name",
    "data-skipping-change-stats-collected-across-versions",
    "data-skipping-partition-and-data-column",
    "v2-checkpoint-json",             # v2 checkpoint manifest + sidecars
    "v2-checkpoint-parquet",
]


@pytest.mark.parametrize("name", ALL_TYPES_AND_DECIMALS)
def test_all_types_and_decimal_parity(spark, name):
    _assert_table_parity(spark, name)


@pytest.mark.parametrize("name", DATA_READER)
def test_data_reader_parity(spark, name):
    _assert_table_parity(spark, name)


@pytest.mark.parametrize("name", TIMESTAMPS)
def test_timestamp_parity(spark, name):
    _assert_table_parity(spark, name)


@pytest.mark.parametrize("name", SNAPSHOTS)
def test_snapshot_family_parity(spark, name):
    _assert_table_parity(spark, name)


@pytest.mark.parametrize("name", LOG_SHAPES)
def test_log_shape_parity(spark, name):
    _assert_table_parity(spark, name)


def test_primitives_known_values(spark):
    """Belt and braces for the generic harness: pin a few values of
    data-reader-primitives straight from the generator formula
    (GoldenTables.scala:541 createRow) so a bug shared by BOTH decode
    paths (e.g. a wrong live-file set feeding each side the same wrong
    files) still fails loudly."""
    table = os.path.join(GOLDEN, "data-reader-primitives")
    DeltaLog.clear_cache()
    rows = {r["as_int"]: r
            for r in DeltaTable.forPath(spark, table).toDF().collect()}
    assert set(rows) == set(range(10)) | {None}
    for i in range(10):
        r = rows[i]
        assert r["as_long"] == i and r["as_byte"] == i and r["as_short"] == i
        assert r["as_boolean"] == (i % 2 == 0)
        assert r["as_float"] == float(i) and r["as_double"] == float(i)
        assert r["as_string"] == str(i)
        assert bytes(r["as_binary"]) == bytes([i, i])
        assert r["as_big_decimal"] == decimal.Decimal(i)
    assert all(v is None for k, v in rows[None].asDict().items())


# ---------------------------------------------------------------------------
# log-robustness behaviors (DeltaLogSuite / ReadOnlyLogStoreSuite fixtures)
# ---------------------------------------------------------------------------

def test_corrupted_last_checkpoint_ignored(spark):
    """DeltaLogSuite 'handle corrupted _last_checkpoint': the hint file
    is EMPTY in this fixture — the reader must fall back to listing,
    find the real checkpoint, and serve the overwritten state (100
    rows from the final spark.range(100) overwrite)."""
    table = os.path.join(GOLDEN, "corrupted-last-checkpoint-kernel")
    assert os.path.getsize(
        os.path.join(table, "_delta_log", "_last_checkpoint")) == 0
    DeltaLog.clear_cache()
    df = DeltaTable.forPath(spark, table).toDF()
    assert sorted(r["id"] for r in df.collect()) == list(range(100))


def test_versions_not_contiguous_raises(spark):
    """DeltaLogSuite 'error - versions not contiguous': commit 1 was
    deleted from the log (0 and 2 remain, no checkpoint) — replay must
    refuse rather than silently skip the gap."""
    table = os.path.join(GOLDEN, "versions-not-contiguous")
    DeltaLog.clear_cache()
    with pytest.raises(Exception, match="contiguous|missing|gap|not found|Version"):
        DeltaLog.for_table(table).update().all_files


def test_no_delta_log_folder_raises(spark):
    table = os.path.join(GOLDEN, "no-delta-log-folder")
    DeltaLog.clear_cache()
    with pytest.raises(Exception, match="[Dd]elta|_delta_log|not exist"):
        DeltaTable.forPath(spark, table).toDF().count()


@pytest.mark.parametrize("suffix", ["normal-a", "normal-b",
                                    "special-a", "special-b"])
def test_canonicalized_paths(spark, suffix):
    """DeltaLogSuite 'paths should be canonicalized': the add uses an
    unqualified absolute path and the remove the same path with a
    file:/ or file:// scheme (percent-encoded special chars in the
    -special variants) — replay must recognize them as the SAME file,
    leaving an empty table."""
    table = os.path.join(GOLDEN, f"canonicalized-paths-{suffix}")
    DeltaLog.clear_cache()
    snap = DeltaLog.for_table(table).update()
    assert len(snap.all_files) == 0


def test_deltalog_get_changes(spark):
    """DeltaLogSuite 'getChanges - no data loss': three manually
    committed versions with known action mixes; read_commit_actions
    must surface every action type at the right version."""
    table = os.path.join(GOLDEN, "deltalog-getChanges")
    DeltaLog.clear_cache()
    log = DeltaLog.for_table(table)
    v0 = [k for k, _ in log.read_commit_actions(0)]
    v1 = [k for k, _ in log.read_commit_actions(1)]
    v2 = [k for k, _ in log.read_commit_actions(2)]
    assert "metaData" in v0 and "add" in v0
    assert "cdc" in v1 and "remove" in v1
    assert "protocol" in v2 and "txn" in v2
    acts1 = dict(log.read_commit_actions(1))
    assert acts1["cdc"].path == "fake/path/2"
    assert acts1["cdc"].partitionValues == {"partition_foo": "partition_bar"}
    assert acts1["remove"].path == "fake/path/1"


def test_log_store_fixtures_read_and_list(spark):
    """ReadOnlyLogStoreSuite fixtures: files 0/1 hold known lines
    (read), files 1..3 exist of 0..4 (listFrom semantics)."""
    from delta_spark.logstore import LocalLogStore

    store = LocalLogStore()
    t_read = os.path.join(GOLDEN, "log-store-read")
    assert store.read(os.path.join(t_read, "0")).splitlines() == ["zero", "none"]
    assert store.read(os.path.join(t_read, "1")).splitlines() == ["one"]

    t_list = os.path.join(GOLDEN, "log-store-listFrom")
    names = sorted(n for n in store.list_dir(t_list) if not n.startswith("_"))
    assert names == ["1", "2", "3"]


@pytest.mark.parametrize("missing", ["metadata", "protocol"])
def test_state_reconstruction_from_checkpoint_missing_action(spark, missing):
    """DeltaLogSuite 'checkpoint missing Protocol/Metadata should
    fail': the checkpoint lacks the action and no commit supplies it —
    snapshot construction must raise, not default."""
    table = os.path.join(
        GOLDEN, f"deltalog-state-reconstruction-from-checkpoint-missing-{missing}")
    DeltaLog.clear_cache()
    with pytest.raises(Exception, match="[Pp]rotocol|[Mm]etadata"):
        snap = DeltaLog.for_table(table).update()
        _ = snap.schema if missing == "metadata" else snap.all_files
        from delta_spark.actions import check_read_protocol
        check_read_protocol(snap)


HIVE = [
    "hive/deltatbl-non-partitioned", "hive/deltatbl-partitioned",
    "hive/deltatbl-deleted-path", "hive/deltatbl-incorrect-format-config",
    "hive/deltatbl-not-allow-write", "hive/deltatbl-schema-match",
    "hive/deltatbl-partition-prune",
    "hive/deltatbl-special-chars-in-partition-column",
    "hive/deltatbl-touch-files-needed-for-partitioned",
    "hive/deltatbl-map-types-correctly",       # full type matrix
    "hive/deltatbl-column-names-case-insensitive",
]


@pytest.mark.parametrize("name", HIVE)
def test_hive_connector_fixture_parity(spark, name):
    """The Hive-connector golden corpus (HiveConnectorSuite tables) —
    same cell-level parity harness."""
    _assert_table_parity(spark, name)


def test_spark_variant_checkpoint_values(spark):
    """spark-variant-checkpoint (kernel LastCheckpointHintSuite /
    ScanSuite): variants nested inside arrays, maps and structs, state
    served THROUGH a checkpoint (checkpointInterval=2 + two extra
    appends). Expected JSON follows the generator in the fixture's
    info.txt: row id carries {"key": id} everywhere, ids 0 and 1
    appear twice (the appended duplicates)."""
    table = os.path.join(GOLDEN, "spark-variant-checkpoint")
    DeltaLog.clear_cache()
    df = DeltaTable.forPath(spark, table).toDF()
    rows = (df.selectExpr(
        "id", "to_json(v) AS jv",
        "transform(array_of_variants, x -> to_json(x)) AS av",
        "to_json(struct_of_variants.v) AS sv",
        "to_json(map_of_variants[cast(id AS STRING)]) AS mv",
        "map_of_variants['nullKey'] IS NULL AS mnull",
        "transform(array_of_struct_of_variants, x -> to_json(x.v)) AS asv",
        "transform(struct_of_array_of_variants.v, x -> to_json(x)) AS sav")
        .collect())
    assert len(rows) == 102
    from collections import Counter
    counts = Counter(r["id"] for r in rows)
    assert counts[0] == 2 and counts[1] == 2
    assert sum(counts.values()) == 102 and set(counts) == set(range(100))
    for r in rows:
        want = '{"key":%d}' % r["id"]
        assert r["jv"] == want
        assert r["av"] == [want, None, want, None, want]
        assert r["sv"] == want
        assert r["mv"] == want and r["mnull"]
        assert r["asv"] == [want, None, None, want, None, want]
        assert r["sav"] == [None, want]


@pytest.mark.parametrize("name", [
    "data-skipping-basic-stats-all-types",
    "data-skipping-basic-stats-all-types-checkpoint",
    "data-skipping-basic-stats-all-types-columnmapping-id",
    "data-skipping-basic-stats-all-types-columnmapping-name",
])
def test_data_skipping_on_reference_stats(spark, name):
    """Stats written by the REFERENCE engine drive our file skipping —
    under column mapping the stats JSON keys are PHYSICAL names, so
    this pins the logical→physical stats translation in
    files_for_scan. The fixture holds one file with as_int ∈ {0, 1}."""
    table = os.path.join(GOLDEN, name)
    DeltaLog.clear_cache()
    snap = DeltaLog.for_table(table).update()
    assert len(snap.all_files) == 1
    assert len(snap.files_for_scan("as_int = 0")) == 1
    assert len(snap.files_for_scan("as_int > 100")) == 0
    assert len(snap.files_for_scan("as_long <= -5")) == 0
    assert len(snap.files_for_scan("as_string = '0'")) == 1


@pytest.mark.parametrize("name", ["collations-table",
                                  "collations-preview-table"])
def test_collations_fixture_metadata(spark, name):
    """The collations golden tables (writer features `collations` /
    `collations-preview`, __COLLATIONS field metadata, no data files):
    protocol must be accepted for read AND write gating, and the
    collation annotations must survive the schema round-trip."""
    table = os.path.join(GOLDEN, name)
    DeltaLog.clear_cache()
    snap = DeltaLog.for_table(table).update()
    from delta_spark.actions import check_read_protocol, check_write_protocol
    check_read_protocol(snap.protocol)
    check_write_protocol(snap.protocol)
    # __COLLATIONS metadata becomes Spark's NATIVE collated string type
    assert str(snap.schema["utf8_lcase_col"].dataType) == \
        "StringType('UTF8_LCASE')"
    assert str(snap.schema["unicode_col"].dataType) == \
        "StringType('UNICODE')"
    assert str(snap.schema["utf8_binary_col"].dataType) == "StringType()"
    assert DeltaTable.forPath(spark, table).toDF().count() == 0


KERNEL_TABLES = [
    "basic-with-checkpoint",                  # 30 files across a checkpoint
    "column-mapping-id",
    "data-reader-primitives-column-mapping-name",
    # 11 partition columns of every type, partitionValues keyed by
    # PHYSICAL name (name mapping)
    "data-reader-partition-values-column-mapping-name",
    "kernel-pagination-all-jsons",            # 15 commits, no checkpoint
    "kernel-pagination-multi-part-checkpoints",
    "kernel-pagination-single-checkpoint",
    "kernel-pagination-v2-checkpoint-json",   # v2 checkpoint manifests
    "kernel-pagination-v2-checkpoint-parquet",
]


@pytest.mark.skipif(not os.path.isdir(KERNEL), reason="kernel resources absent")
@pytest.mark.parametrize("name", KERNEL_TABLES)
def test_kernel_fixture_parity(spark, name):
    """The kernel-defaults test corpus (written by the reference's
    kernel suites) through the same cell-level parity harness —
    notably the pagination family's log shapes (json-only,
    multi-part, v2 json/parquet checkpoints)."""
    _assert_table_parity(spark, os.path.join(KERNEL, name))


def test_kernel_shredded_variant_preview_values(spark):
    """spark-shredded-variant-preview-delta (kernel corpus): the same
    generator as spark-variant-checkpoint but written with
    variantShredding-PREVIEW feature + percent-encoded data-file
    prefixes (test%file%prefix-...). Shredded typed_value subcolumns
    must reassemble at every nesting level."""
    table = os.path.join(KERNEL, "spark-shredded-variant-preview-delta")
    if not os.path.isdir(table):
        pytest.skip("kernel resources absent")
    DeltaLog.clear_cache()
    snap = DeltaLog.for_table(table).update()
    assert "variantShredding-preview" in (snap.protocol.readerFeatures or [])
    df = DeltaTable.forPath(spark, table).toDF()
    rows = (df.selectExpr(
        "id", "to_json(v) AS jv", "to_json(struct_of_variants.v) AS sv",
        "transform(struct_of_array_of_variants.v, x -> to_json(x)) AS sav")
        .collect())
    assert len(rows) == 102
    for r in rows:
        want = '{"key":%d}' % r["id"]
        assert r["jv"] == want and r["sv"] == want
        assert r["sav"] == [None, want]


@pytest.mark.parametrize("name", ["basic-dv-no-checkpoint",
                                  "basic-dv-with-checkpoint"])
def test_kernel_dv_tables(spark, name):
    """Kernel DV fixtures: a DV update commit REMOVES a path and
    RE-ADDS it with the deletion vector in the SAME commit — within a
    commit the add must win regardless of action order (the remove
    refers to the previous file entry). Expected count = physical rows
    of the live set minus DV cardinalities, from an in-test
    independent replay honoring the add-wins rule."""
    import pyarrow.parquet as pq

    table = os.path.join(KERNEL, name)
    if not os.path.isdir(table):
        pytest.skip("kernel resources absent")
    logdir = os.path.join(table, "_delta_log")
    active = {}
    for n in sorted(x for x in os.listdir(logdir)
                    if x.endswith(".json") and x[:20].isdigit()):
        adds, removes = {}, set()
        with open(os.path.join(logdir, n)) as f:
            for line in f:
                if not line.strip():
                    continue
                d = json.loads(line)
                if "add" in d:
                    adds[d["add"]["path"]] = d["add"]
                elif "remove" in d:
                    removes.add(d["remove"]["path"])
        for p in removes:       # removes first, adds win within a commit
            active.pop(p, None)
        active.update(adds)
    expected = 0
    n_dv = 0
    for p, a in active.items():
        phys = pq.ParquetFile(os.path.join(table, unquote(p))).metadata.num_rows
        dv = a.get("deletionVector")
        if dv:
            n_dv += 1
            phys -= dv["cardinality"]
        expected += phys
    assert n_dv >= 1
    DeltaLog.clear_cache()
    snap = DeltaLog.for_table(table).update()
    assert {f.path for f in snap.all_files} == set(active)
    assert DeltaTable.forPath(spark, table).toDF().count() == expected


def test_own_writes_decode_by_independent_stack(spark, tmp_path):
    """The reverse direction of this module: a table WRITTEN BY THIS
    ENGINE (id-mode column mapping, nested struct/array/map, decimals,
    timestamps, typed partition columns) must be fully decodable by
    the independent stack — naive log replay + DuckDB parquet decode +
    PROTOCOL.md partition-value parsing + schemaString physical
    renames. That is what a foreign Delta reader does, so cell-level
    agreement here means our files and log are standard, not merely
    self-consistent."""
    from delta_spark.io import write_delta

    t = str(tmp_path / "own_writes")
    df = spark.sql("""
        SELECT id,
               CAST(id % 3 AS INT) AS part_i,
               CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS part_s,
               named_struct('aa', CAST(id AS STRING),
                            'ac', named_struct('aca', CAST(id * 2 AS INT)))
                 AS s,
               array(CAST(id AS INT), NULL, CAST(id + 1 AS INT)) AS arr,
               map(CAST(id AS INT), CAST(id * 10 AS LONG)) AS m,
               CAST(id * 1.5 AS DECIMAL(10,2)) AS dec,
               timestamp_millis(1600000000000 + id * 1000) AS ts,
               CASE WHEN id % 7 = 0 THEN NULL
                    ELSE CAST(id AS DOUBLE) END AS dbl
        FROM range(0, 50)
    """)
    write_delta(df, t, partition_by=["part_i", "part_s"],
                configuration={"delta.columnMapping.mode": "id"})
    # a second commit so replay covers multi-commit state
    write_delta(df.filter("id < 5").selectExpr(
        "id + 100 AS id", "part_i", "part_s", "s", "arr", "m", "dec",
        "ts", "dbl"), t, mode="append")
    _assert_table_parity(spark, t)
