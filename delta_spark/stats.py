"""Per-file statistics collection (the table's "index").

Mirrors the stats schema of the reference
(stats/StatisticsCollection.scala:85-111): per file a JSON blob
{"numRecords": N, "minValues": {...}, "maxValues": {...},
 "nullCount": {...}} over the first ``num_indexed_cols`` leaf columns
(`delta.dataSkippingNumIndexedCols` semantics).

Collection strategy: read Parquet *footers* (row-group column
statistics) with pyarrow — no data pages are touched, so cost is
O(files), not O(rows). The reference instead hooks Spark's
WriteTaskStatsTracker (stats/DataSkippingStatsTracker.scala); footer
reads are the engine-agnostic equivalent and parallelize trivially
(thread pool here; a mapInPandas job over file paths at cluster scale).

String min/max are truncated to 32 chars; the truncated *max* has its
last char incremented so it stays an upper bound (the reference's
truncateMaxStringAgg trick).
"""

from __future__ import annotations

import datetime as _dt
import json
import math
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Optional

import pyarrow.parquet as pq
from pyspark.sql import types as T

from delta_spark.predicates import FileStatsView

DEFAULT_NUM_INDEXED_COLS = 32
STRING_PREFIX_LEN = 32

STATS_COLUMNS_PROP = "delta.dataSkippingStatsColumns"


def stats_columns(configuration: dict) -> "Optional[list[str]]":
    """Explicit stats-column list (`delta.dataSkippingStatsColumns`,
    DeltaConfigs.DATA_SKIPPING_STATS_COLUMNS): when set, stats are
    collected ONLY for these columns, overriding the first-N rule. At
    100 TB this is how wide tables keep footer-stats collection and
    checkpoint size proportional to the columns queries actually
    filter on."""
    raw = (configuration or {}).get(STATS_COLUMNS_PROP)
    if not raw or not str(raw).strip():
        return None
    return [c.strip().strip("`") for c in str(raw).split(",") if c.strip()]

_SKIPPING_TYPES = (
    "int8", "int16", "int32", "int64", "float", "double",
    "string", "large_string", "bool", "date32", "date64",
)


def _truncate_min(s: str) -> str:
    return s[:STRING_PREFIX_LEN]


def _truncate_max(s: str) -> Optional[str]:
    if len(s) <= STRING_PREFIX_LEN:
        return s
    t = s[:STRING_PREFIX_LEN]
    # increment the last incrementable char so t stays >= s
    for i in range(len(t) - 1, -1, -1):
        if ord(t[i]) < 0x10FFFF:
            return t[:i] + chr(ord(t[i]) + 1)
    return None  # cannot form an upper bound


def _json_safe(v: Any) -> Any:
    if isinstance(v, _dt.datetime):
        s = v.strftime("%Y-%m-%dT%H:%M:%S")
        if v.microsecond:
            s += ".%06d" % v.microsecond
        return s + ("Z" if v.tzinfo is not None else "")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return None  # binary min/max not indexed
    if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
        return None
    return v


def _footer_num_rows(file_path: str) -> int:
    """Extract FileMetaData.num_rows by raw Thrift-compact scanning.

    Fallback for footers pyarrow cannot parse (logical types newer than
    the linked parquet-cpp, e.g. VARIANT): thrift *skipping* never
    interprets logical types, so this works for any footer."""
    with open(file_path, "rb") as fh:
        fh.seek(-8, os.SEEK_END)
        tail = fh.read(8)
        if tail[4:] != b"PAR1":
            raise ValueError(f"{file_path}: not a parquet file")
        flen = int.from_bytes(tail[:4], "little")
        fh.seek(-8 - flen, os.SEEK_END)
        buf = fh.read(flen)

    pos = 0

    def varint() -> int:
        nonlocal pos
        shift = acc = 0
        while True:
            b = buf[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                return acc
            shift += 7

    def skip(ftype: int) -> None:
        nonlocal pos
        if ftype in (1, 2):       # bool packed in header elsewhere; in
            pass                   # containers it's 1 byte, handled below
        elif ftype == 3:
            pos += 1
        elif ftype in (4, 5, 6):
            varint()
        elif ftype == 7:
            pos += 8
        elif ftype == 8:
            n = varint()  # NB: varint() must run before touching pos
            pos += n
        elif ftype in (9, 10):
            head = buf[pos]
            pos += 1
            size = head >> 4
            if size == 15:
                size = varint()
            etype = head & 0x0F
            for _ in range(size):
                if etype in (1, 2):
                    pos += 1
                else:
                    skip(etype)
        elif ftype == 11:
            size = varint()
            if size:
                kv = buf[pos]
                pos += 1
                for _ in range(size):
                    skip(kv >> 4)
                    skip(kv & 0x0F)
        elif ftype == 12:
            skip_struct()
        else:
            raise ValueError(f"unknown thrift compact type {ftype}")

    def skip_struct() -> None:
        nonlocal pos
        fid = 0
        while True:
            head = buf[pos]
            pos += 1
            if head == 0:
                return
            delta = head >> 4
            ftype = head & 0x0F
            if delta:
                fid += delta
            else:
                z = varint()
                fid = (z >> 1) ^ -(z & 1)
            skip(ftype)

    # walk FileMetaData's top-level fields; num_rows is field 3 (i64)
    fid = 0
    while pos < len(buf):
        head = buf[pos]
        pos += 1
        if head == 0:
            break
        delta = head >> 4
        ftype = head & 0x0F
        if delta:
            fid += delta
        else:
            z = varint()
            fid = (z >> 1) ^ -(z & 1)
        if fid == 3 and ftype == 6:
            z = varint()
            return (z >> 1) ^ -(z & 1)
        skip(ftype)
    raise ValueError(f"{file_path}: num_rows not found in footer")


def indexed_cols_for(schema, cfg: dict,
                     num_indexed: int) -> Optional[list[str]]:
    """Effective stats-column list for a write: the explicit
    `delta.dataSkippingStatsColumns` list or the first-N write-order
    names, with collated columns excluded either way
    (StatisticsCollection skips them — binary-order bounds are wrong
    under a non-default collation). Returns None when no explicit list
    and nothing to exclude (collect_file_stats applies first-N
    itself). Shared by every write path so exclusions can't diverge."""
    from delta_spark.schema import collated_columns

    cols = stats_columns(cfg)
    coll = collated_columns(schema)
    if not coll:
        return cols
    if cols is None:
        return [f.name for f in schema.fields[:num_indexed]
                if f.name not in coll]
    return [c for c in cols if c not in coll]


def collect_file_stats(file_path: str, indexed_cols: Optional[list[str]] = None,
                       num_indexed_cols: int = DEFAULT_NUM_INDEXED_COLS) -> str:
    """Read one Parquet footer → stats JSON string."""
    try:
        md = pq.ParquetFile(file_path).metadata
    except OSError:
        # footer uses a logical type this pyarrow can't parse (VARIANT
        # etc.) — degrade to numRecords-only stats via raw thrift scan;
        # data skipping is disabled for the file, correctness unaffected
        return json.dumps({"numRecords": _footer_num_rows(file_path),
                           "tightBounds": False})
    schema = md.schema.to_arrow_schema()
    names = [f.name for f in schema]
    if indexed_cols is not None:
        target = [n for n in names if n in set(indexed_cols)]
    else:
        target = names[:num_indexed_cols]
    target_set = set(target)

    num_records = md.num_rows
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    nulls: dict[str, int] = {}
    has_stats: dict[str, bool] = {n: True for n in target}

    col_index = {md.schema.column(i).path: i for i in range(md.num_columns)}

    for name in target:
        ci = col_index.get(name)
        if ci is None:
            has_stats[name] = False
            continue
        for rg in range(md.num_row_groups):
            cc = md.row_group(rg).column(ci)
            st = cc.statistics
            if st is None or not st.has_null_count:
                has_stats[name] = False
                break
            nulls[name] = nulls.get(name, 0) + st.null_count
            if st.has_min_max:
                try:
                    mn, mx = st.min, st.max
                except Exception:
                    # pyarrow can't materialize stats for some types
                    # (e.g. decimals) — degrade to no bounds for the col
                    mins.pop(name, None)
                    maxs.pop(name, None)
                    has_stats[name] = False
                    break
                if name in mins:
                    mins[name] = mn if _lt(mn, mins[name]) else mins[name]
                    maxs[name] = mx if _lt(maxs[name], mx) else maxs[name]
                else:
                    mins[name], maxs[name] = mn, mx
            elif num_records - nulls.get(name, 0) > 0:
                # non-null values exist but no min/max → can't bound
                mins.pop(name, None)
                maxs.pop(name, None)
                has_stats[name] = False
                break

    out_min: dict[str, Any] = {}
    out_max: dict[str, Any] = {}
    out_null: dict[str, int] = {}
    for name in target:
        if not has_stats.get(name, False):
            continue
        out_null[name] = nulls.get(name, 0)
        if name in mins:
            mn = _json_safe(mins[name])
            mx = _json_safe(maxs[name])
            if isinstance(mn, str):
                mn = _truncate_min(mn)
            if isinstance(mx, str):
                mx = _truncate_max(mx)
            if mn is not None:
                out_min[name] = mn
            if mx is not None:
                out_max[name] = mx
    return json.dumps(
        {"numRecords": num_records, "minValues": out_min, "maxValues": out_max, "nullCount": out_null},
        separators=(",", ":"), default=str,
    )


def _lt(a, b) -> bool:
    try:
        return a < b
    except TypeError:
        return False


DISTRIBUTED_STATS_THRESHOLD = 2000


def collect_stats_parallel(paths: list[str], indexed_cols: Optional[list[str]] = None,
                           num_indexed_cols: int = DEFAULT_NUM_INDEXED_COLS) -> dict[str, str]:
    """path → stats JSON. Footers read driver-side through a thread
    pool for normal commits; commits touching thousands of files (bulk
    CONVERT of a huge table) shard the footer pass across executors as
    a mapInPandas job — same asymptotics as the reference's
    write-task-attached stats trackers."""
    if not paths:
        return {}
    if len(paths) > DISTRIBUTED_STATS_THRESHOLD:
        try:
            return _collect_stats_distributed(paths, indexed_cols, num_indexed_cols)
        except Exception:
            pass  # fall back to the driver pool
    workers = min(32, max(4, len(paths)))
    with ThreadPoolExecutor(max_workers=workers) as ex:
        results = ex.map(lambda p: collect_file_stats(p, indexed_cols, num_indexed_cols), paths)
    return dict(zip(paths, results))


def _collect_stats_distributed(paths: list[str], indexed_cols: Optional[list[str]],
                               num_indexed_cols: int) -> dict[str, str]:
    """Executor-side footer pass: ship the path list, read footers where
    the tasks run, return (path, stats-json) pairs."""
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise RuntimeError("no active session")

    cols = list(indexed_cols) if indexed_cols else None
    k = num_indexed_cols

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            out = [collect_file_stats(p, cols, k) for p in pdf["path"]]
            yield pd.DataFrame({"path": pdf["path"], "stats": out})

    df = spark.createDataFrame([(p,) for p in paths], "path string") \
        .repartition(max(2, len(paths) // 200))
    rows = df.mapInPandas(kernel, "path string, stats string").collect()
    return {r["path"]: r["stats"] for r in rows}


def is_degraded_stats(stats_json: Optional[str]) -> bool:
    """True for the numRecords-only fallback emitted when this
    pyarrow cannot parse the footer (VARIANT-annotated shredded
    files)."""
    if not stats_json:
        return False
    try:
        d = json.loads(stats_json)
    except ValueError:
        return False
    return d.get("tightBounds") is False and "minValues" not in d


def collect_stats_spark(spark, paths: list[str],
                        indexed_cols: Optional[list[str]] = None,
                        num_indexed_cols: int = DEFAULT_NUM_INDEXED_COLS
                        ) -> dict[str, str]:
    """Full stats via a Spark scan, for files whose footers the linked
    pyarrow cannot parse (parquet VARIANT logical-type annotation,
    PROTOCOL.md:1934): Spark's parquet reader understands the
    annotation, so one per-file aggregation keeps data skipping at
    full bounds instead of the numRecords-only degradation."""
    from urllib.parse import unquote, urlparse

    from pyspark.sql import functions as F

    if not paths:
        return {}
    df = spark.read.parquet(*paths)
    statable = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                T.FloatType, T.DoubleType, T.DecimalType, T.StringType,
                T.DateType, T.TimestampType, T.TimestampNTZType,
                T.BooleanType)
    prim = {f.name for f in df.schema.fields
            if isinstance(f.dataType, statable)}
    names = [f.name for f in df.schema.fields]
    pool = (indexed_cols if indexed_cols is not None
            else names[:num_indexed_cols])
    target = [n for n in pool if n in prim]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(target):
        aggs += [F.min(F.col(f"`{c}`")).alias(f"__mn{i}"),
                 F.max(F.col(f"`{c}`")).alias(f"__mx{i}"),
                 F.sum(F.col(f"`{c}`").isNull().cast("long"))
                 .alias(f"__nl{i}")]
    rows = (df.groupBy(F.input_file_name().alias("__f"))
            .agg(*aggs).collect())
    out: dict[str, str] = {}
    for r in rows:
        mins: dict[str, Any] = {}
        maxs: dict[str, Any] = {}
        nulls: dict[str, int] = {}
        for i, c in enumerate(target):
            nulls[c] = int(r[f"__nl{i}"] or 0)
            raw_mn, raw_mx = r[f"__mn{i}"], r[f"__mx{i}"]
            mn, mx = _json_safe(raw_mn), _json_safe(raw_mx)
            if isinstance(mn, str):
                mn = _truncate_min(mn)
            if isinstance(mx, str):
                mx = _truncate_max(mx)
            if raw_mn is not None and mn is not None:
                mins[c] = mn
            if raw_mx is not None and mx is not None:
                maxs[c] = mx
        u = urlparse(r["__f"])
        local = unquote(u.path) if u.scheme in ("file", "") else r["__f"]
        out[os.path.normpath(local)] = json.dumps(
            {"numRecords": int(r["__n"]), "minValues": mins,
             "maxValues": maxs, "nullCount": nulls},
            separators=(",", ":"), default=str)
    return out


def parse_stats_view(stats_json: Optional[str], schema: Optional[T.StructType] = None) -> FileStatsView:
    """Stats JSON blob → FileStatsView with values coerced for
    comparison (timestamps back to datetime)."""
    if not stats_json:
        return FileStatsView(None, {}, {}, {})
    try:
        d = json.loads(stats_json)
    except (ValueError, TypeError):
        return FileStatsView(None, {}, {}, {})
    types: dict[str, T.DataType] = {}
    if schema is not None:
        types = {f.name: f.dataType for f in schema.fields}

    def conv(m: Optional[dict]) -> dict:
        if not m:
            return {}
        out = {}
        for k, v in m.items():
            dt = types.get(k)
            if isinstance(v, str) and isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
                try:
                    out[k] = _dt.datetime.fromisoformat(v.replace("Z", "+00:00")).replace(tzinfo=None)
                    continue
                except ValueError:
                    pass
            if isinstance(v, str) and isinstance(dt, T.DateType):
                try:
                    out[k] = _dt.date.fromisoformat(v)
                    continue
                except ValueError:
                    pass
            out[k] = v
        return out

    return FileStatsView(d.get("numRecords"), conv(d.get("minValues")), conv(d.get("maxValues")),
                         d.get("nullCount") or {})


def file_mtime_ms(path: str) -> int:
    return int(os.stat(path).st_mtime * 1000)
