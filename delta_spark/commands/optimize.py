"""OPTIMIZE: bin-packing compaction + Z-ORDER multi-dimensional
clustering (reference commands/OptimizeTableCommand.scala:216-341,
groupFilesIntoBins :407; skipping/MultiDimClustering.scala,
MultiDimClusteringFunctions.scala:41 range_partition_id,
:58 interleave_bits; expressions/InterleaveBits.scala:40).

Compaction: per partition, greedily pack files smaller than
min_file_size into bins of ≤ max_file_size, rewrite each partition's
bins in ONE distributed job (`repartition(n_bins)`), commit
Add(dataChange=false) + Remove. Readers are unaffected (snapshot
isolation; conflict-free with appends since dataChange=false commits
take SnapshotIsolation).

Z-ORDER (scale design): per clustering column, compute ~`num_ranges`
range boundaries with a distributed sampled quantile pass
(approxQuantile — the PySpark analogue of RangePartitionId's sampling
partitioner), map each row to its range id with a codegen'd
aggregate-over-boundary-array expression (no UDF, no global window —
a global ntile() would serialize through one partition at 100 TB),
interleave the range-id bits into a single long z-key with shift/or
arithmetic, then repartitionByRange(z-key) + sortWithinPartitions so
each output file covers a tight z-curve segment → tight min/max stats
→ effective data skipping on all clustered dimensions.
"""

from __future__ import annotations

import json
import math
from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from delta_spark.actions import AddFile
from delta_spark.log import DeltaLog
from delta_spark.reader import read_files_df
from delta_spark.transaction import OptimisticTransaction, dml_transaction
from delta_spark.writer import write_table_files

DEFAULT_MAX_FILE_SIZE = 256 * 1024 * 1024   # reference default 1 GiB; smaller
DEFAULT_MIN_FILE_SIZE = 128 * 1024 * 1024   # suits local bench scale
DEFAULT_ZORDER_NUM_RANGES = 256              # reference default 1000
# files produced by a clustering OPTIMIZE are stamped with the cube
# they belong to (zorder/ZCubeInfo.scala ZCUBE_ID tag); a later
# incremental OPTIMIZE only touches files outside any cube — at 100 TB
# this is the difference between clustering the day's ingest and
# rewriting the whole table every run
ZCUBE_ID_TAG = "ZCUBE_ID"


class OptimizeBuilder:
    def __init__(self, spark: SparkSession, log: DeltaLog,
                 partition_filter: Optional[str] = None):
        self.spark = spark
        self.log = log
        self.partition_filter = partition_filter

    def where(self, partitionFilter: str) -> "OptimizeBuilder":
        self.partition_filter = partitionFilter
        return self

    def executeCompaction(self, max_file_size: int = DEFAULT_MAX_FILE_SIZE,
                          min_file_size: Optional[int] = None,
                          full: bool = False) -> dict:
        # clustered tables: OPTIMIZE re-clusters on the clustering
        # columns (OptimizeTableStrategy clustering branch) —
        # incrementally (only files not yet in a ZCube) unless FULL
        cols = self._clustering_columns()
        if cols:
            return _zorder(self.spark, self.log, cols, self.partition_filter,
                           max_file_size, DEFAULT_ZORDER_NUM_RANGES,
                           clustering=True, full=full)
        return _compact(self.spark, self.log, self.partition_filter,
                        max_file_size, min_file_size or max_file_size // 2)

    def executeFull(self, max_file_size: int = DEFAULT_MAX_FILE_SIZE) -> dict:
        """OPTIMIZE ... FULL: re-cluster every file of a clustered table,
        including files already inside a ZCube."""
        return self.executeCompaction(max_file_size=max_file_size, full=True)

    def _clustering_columns(self) -> list[str]:
        import json as _json

        dm = self.log.update().domain_metadata.get("delta.clustering")
        if dm is None:
            return []
        try:
            return list(_json.loads(dm.configuration).get("clusteringColumns", []))
        except (ValueError, TypeError):
            return []

    def executeZOrderBy(self, *cols: str,
                        max_file_size: int = DEFAULT_MAX_FILE_SIZE,
                        num_ranges: int = DEFAULT_ZORDER_NUM_RANGES) -> dict:
        return _zorder(self.spark, self.log, list(cols), self.partition_filter,
                       max_file_size, num_ranges)


def _file_rows(f: AddFile) -> int:
    """numRecords from the file's stats blob (0 when stats are absent)."""
    if not f.stats:
        return 0
    try:
        return int(json.loads(f.stats).get("numRecords") or 0)
    except (ValueError, TypeError):
        return 0


def _rewrite_input(spark: SparkSession, snapshot, files) -> DataFrame:
    """Rows to rewrite in a dataChange=false operation. On a
    row-tracked table the materialized stable-row-id column rides along
    so OPTIMIZE/ZORDER preserve row ids through the rewrite
    (PROTOCOL.md Writer Requirements for Row Tracking)."""
    if str(snapshot.configuration.get(
            "delta.enableRowTracking", "false")).lower() == "true":
        from delta_spark.reader import read_files_with_stable_ids

        return read_files_with_stable_ids(spark, snapshot, files)
    return read_files_df(spark, snapshot, files)


def _select_partitions(txn: OptimisticTransaction, partition_filter: Optional[str]):
    """Group candidate files by partition tuple, honoring the optional
    partition predicate (OPTIMIZE ... WHERE only allows partition cols).
    On a distributed-planning transaction a filtered OPTIMIZE selects
    its candidates executor-side — only the matching partitions'
    AddFiles reach the driver."""
    from delta_spark import predicates as P

    snapshot = txn.snapshot
    part_cols = snapshot.partition_columns
    if partition_filter:
        ast = P.parse_predicate(partition_filter)
        refs = P.references(ast)
        if not refs <= set(part_cols):
            raise ValueError("OPTIMIZE WHERE supports partition columns only")
        # distributed pre-prune, then the EXACT three-valued partition
        # check (pruning keeps unknowns conservatively; OPTIMIZE WHERE
        # must only rewrite partitions that definitely match). Read
        # tracking is scoped to the FINAL set — recording conservative
        # candidates would turn a concurrent delete of a non-matching
        # file into a spurious ConcurrentDeleteReadException.
        if txn._spark is not None and snapshot.files_unloaded:
            from delta_spark.log import addfiles_from_state_rows

            cand = addfiles_from_state_rows(
                txn.log.files_for_scan_df(
                    txn._spark, partition_filter,
                    version=txn.read_version).collect())
        else:
            cand = snapshot.files_for_scan(partition_filter)
        files = [f for f in cand
                 if P.eval_partition(
                     ast, snapshot.typed_partition_values(f)) is True]
        txn.read_predicates.append(partition_filter)
        txn.read_files.update(f.path for f in files)
    else:
        files = snapshot.all_files
    groups: dict[tuple, list[AddFile]] = {}
    for f in files:
        key = tuple(sorted((k, v) for k, v in f.partitionValues.items()))
        groups.setdefault(key, []).append(f)
    return groups


def _dv_ratio(f: AddFile) -> float:
    """Deleted-rows fraction of a file, from its DV cardinality and
    numRecords stats (OptimizeTableCommand maxDeletedRowsRatio)."""
    dv = f.deletionVector
    if not dv or not dv.get("cardinality"):
        return 0.0
    try:
        n = json.loads(f.stats or "{}").get("numRecords")
    except (TypeError, ValueError):
        n = None
    if not n:
        return 1.0  # DV present but no stats: assume worth rewriting
    return float(dv["cardinality"]) / float(n)


def _compact(spark: SparkSession, log: DeltaLog, partition_filter: Optional[str],
             max_file_size: int, min_file_size: int) -> dict:
    txn = dml_transaction(spark, log)
    snapshot = txn.snapshot
    from delta_spark import catalog_managed as CM

    CM.check_maintenance_allowed(snapshot.configuration,
                                 snapshot.protocol, "OPTIMIZE")
    try:
        max_dv_ratio = float(snapshot.configuration.get(
            "delta.optimize.maxDeletedRowsRatio", "0.05"))
    except (TypeError, ValueError):
        max_dv_ratio = 0.05
    adds: list[AddFile] = []
    removes = []
    n_bins = 0
    n_dv_purged = 0
    for _key, files in _select_partitions(txn, partition_filter).items():
        # candidates: small files + files whose DV deletes exceed the
        # ratio (their rewrite also materializes the DV — rows drop out
        # in read_files_df, so the new files carry no DV)
        dv_heavy = [f for f in files if _dv_ratio(f) > max_dv_ratio]
        small = {f.path: f for f in files if f.size < min_file_size}
        for f in dv_heavy:
            small[f.path] = f
        chosen = list(small.values())
        if not dv_heavy:
            if len(chosen) < 2:
                continue
            total = sum(f.size for f in chosen)
            bins = max(1, math.ceil(total / max_file_size))
            if bins >= len(chosen):
                continue  # repacking wouldn't reduce file count
        else:
            if not chosen:
                continue
            total = sum(f.size for f in chosen)
            bins = max(1, math.ceil(total / max_file_size))
        df = _rewrite_input(spark, snapshot, chosen)
        new = write_table_files(df.repartition(bins), snapshot, data_change=False)
        adds.extend(new)
        removes.extend(f.remove(data_change=False) for f in chosen)
        txn.read_files.update(f.path for f in chosen)
        n_bins += bins
        n_dv_purged += sum(1 for f in chosen if f.deletionVector)
    metrics = {
        "numRemovedFiles": str(len(removes)),
        "numAddedFiles": str(len(adds)),
        "numBatches": str(n_bins),
        "numDeletionVectorsRemoved": str(n_dv_purged),
    }
    if not adds and not removes:
        return {"version": txn.read_version, **metrics}
    v = txn.commit(list(adds) + list(removes), "OPTIMIZE",
                   {"predicate": json.dumps([partition_filter] if partition_filter else [])},
                   metrics)
    return {"version": v, **metrics}


def range_id_column(col: str, boundaries: list) -> Column:
    return range_id_column_from(F.col(col), boundaries)


def _searchsorted_rid(value: Column, boundaries: list) -> Column:
    """Range-id via an Arrow-batched pandas UDF doing a vectorized
    binary search (np.searchsorted) — the PySpark analogue of the
    reference's RangePartitionId expression, whose partitioner also
    binary-searches sampled bounds (expressions/RangePartitionId.scala:36).
    A SQL fold over the boundary array is interpreted per element
    (~100× slower at 256 ranges); searchsorted is O(log n) in C."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bounds = np.array(boundaries, dtype="float64")

    def _rid(s):
        v = s.to_numpy(dtype="float64", na_value=np.nan)
        out = np.searchsorted(bounds, v, side="right")
        out[np.isnan(v)] = 0
        return pd.Series(out.astype("int32"))

    # lambda form: `from __future__ import annotations` stringifies type
    # hints, which pandas_udf cannot introspect
    rid = pandas_udf(_rid, "int")
    return rid(value.cast("double"))


def interleave_bits(range_ids: list[Column], bits_per_col: int) -> Column:
    """Interleave the low `bits_per_col` bits of each range id into one
    long (expressions/InterleaveBits.scala:40) with pure shift/or
    arithmetic — stays inside whole-stage codegen."""
    k = len(range_ids)
    terms = None
    for b in range(bits_per_col):
        for i, rid in enumerate(range_ids):
            bit = F.shiftright(rid.cast("long"), b).bitwiseAND(F.lit(1))
            placed = F.shiftleft(bit, b * k + (k - 1 - i))
            terms = placed if terms is None else terms.bitwiseOR(placed)
    return terms if terms is not None else F.lit(0)


_SAMPLE_CAP_ROWS = 1_000_000


def _np_zkeys(V, all_bounds, bits: int):
    """numpy replica of range_id_column_from + interleave_bits over a
    sample matrix V (N × k, NaN = null): rid = searchsorted(bounds,
    side='right') with NaN→0 — exactly the WHEN-chain / Arrow
    searchsorted semantics — and bit b of rid i lands at position
    b·k + (k-1-i). Must stay in lockstep with the SQL expressions: the
    file boundaries derived from these sample keys are quantiles of
    the SAME distribution the full pass computes."""
    import numpy as np

    k = V.shape[1]
    z = np.zeros(len(V), dtype=np.int64)
    for i in range(k):
        v = V[:, i]
        bounds = np.asarray(all_bounds[i], dtype=np.float64)
        rid = np.searchsorted(bounds, v, side="right")
        rid[np.isnan(v)] = 0
        rid = rid.astype(np.int64)
        for b in range(bits):
            z |= ((rid >> b) & 1) << (b * k + (k - 1 - i))
    return z


_PARTITION_REPS: dict[int, Optional[list[int]]] = {}


def _reps_route_correctly(spark, reps: list[int], n: int) -> bool:
    """True iff `repartition(n, col)` actually sends a row carrying
    reps[p] to partition p, verified end-to-end with
    spark_partition_id() on a tiny n-row probe — the contract the
    routed ZORDER path depends on, asserted against the engine instead
    of assumed from its current implementation."""
    probe = spark.createDataFrame(
        [(int(v), p) for p, v in enumerate(reps)], "v long, p int")
    bad = (probe.repartition(n, F.col("v"))
           .select(F.spark_partition_id().alias("actual"), "p")
           .filter("actual <> p").count())
    return bad == 0


def _partition_reps(spark, n: int) -> Optional[list[int]]:
    """For each partition index p < n, a BIGINT v with
    pmod(hash(v), n) == p — i.e. `repartition(n, col)` routes rows
    carrying v exactly to partition p (DataFrame hash partitioning is
    pmod(murmur3(cols), n), the same function F.hash exposes). Lets a
    precomputed range id act as an EXACT range partitioner without
    repartitionByRange's extra sampling pass over the full input. The
    mapping is data-independent, so it is memoized per n for the
    process lifetime. The found set is then VALIDATED against a real
    `repartition(n, col)` probe (spark_partition_id() == p for all n
    rows); on mismatch — a Spark whose DataFrame hash partitioning is
    not pmod(F.hash, n) — this returns None (memoized) and the caller
    keeps the repartitionByRange path, trading the extra sampling pass
    for guaranteed layout rather than silently coarsening clustering."""
    if n in _PARTITION_REPS:
        return _PARTITION_REPS[n]
    found: dict[int, int] = {}
    start, batch = 0, max(64, 8 * n)
    while len(found) < n:
        rows = (spark.range(start, start + batch)
                .select("id", F.pmod(F.hash(F.col("id")), F.lit(n))
                        .alias("p")).collect())
        for r in rows:
            found.setdefault(r["p"], r["id"])
        start += batch
    reps: Optional[list[int]] = [found[p] for p in range(n)]
    if not _reps_route_correctly(spark, reps, n):
        reps = None
    _PARTITION_REPS[n] = reps
    return reps


def zorder_key(df: DataFrame, cols: list[str], num_ranges: int,
               n_out: Optional[int] = None,
               approx_rows: Optional[int] = None) -> tuple[DataFrame, str]:
    zdf, zcol, _ = _zorder_key_routed(df, cols, num_ranges, n_out,
                                      approx_rows)
    return zdf, zcol


def _zorder_key_routed(df: DataFrame, cols: list[str], num_ranges: int,
                       n_out: Optional[int] = None,
                       approx_rows: Optional[int] = None):
    """Attach a __zkey column; boundaries from ONE sampled quantile
    pass over every clustering column at once.

    When `approx_rows` is known (file stats), the quantile pass is a
    DRIVER-side sample: the narrow numeric projections of a ≤1M-row
    uniform sample are collected (Arrow), per-column range boundaries
    AND the z-key FILE boundaries both come from that one sample, and
    the third return value is the float64 file-boundary array — the
    caller routes rows to output files with one searchsorted instead
    of repartitionByRange, whose RangePartitioner pays an EXTRA
    sampling execution of the full input including the z-key
    computation (guide §2.4 remove shuffd passes: ZORDER drops from 3
    full-input executions to 1 full + 1 narrow sample scan). Quantile
    jitter at 1M samples moves range borders by O(1/√1M), far below
    file granularity. Without `approx_rows` the previous distributed
    approxQuantile path stands (no sample fraction can be derived
    without a row estimate) and the third return value is None.

    Two scale knobs, both rationalized by the fact that clustering
    quality is FILE-granular (min/max skipping reads whole files):

    - ``n_out`` caps the effective range count at 16 ranges per output
      file (floor 64): finer ids than that only reorder rows inside a
      file, which parquet row-group stats barely notice, while the
      boundary list and the per-row id computation scale with it. Small
      jobs thereby stay on the codegen'd WHEN-chain id path — no Python
      in the row pipeline at all.
    - ``approx_rows`` (when known from file stats) caps the quantile
      scan at a ~2M-row sample; quantile jitter moves range borders by
      O(1/sqrt(sample)) which is far below file granularity.

    Range ids are materialized as real columns BEFORE bit interleaving:
    interleave_bits references each id `bits` times, and inlining the
    boundary-fold expression there would blow up codegen by bits×."""
    if n_out is not None:
        num_ranges = min(num_ranges, max(64, 16 * n_out))
    bits = max(1, math.ceil(math.log2(num_ranges)))
    probs = [i / num_ranges for i in range(1, num_ranges)]

    def _numeric(c: str) -> Column:
        dt = df.schema[c].dataType.typeName()
        if dt in ("string", "binary"):
            # strings: range ids over a numeric surrogate (xxhash) keeps
            # the quantile pass numeric; clustering quality equals
            # hash-range clustering for strings
            return F.xxhash64(F.col(c)).cast("double")
        if dt in ("timestamp", "timestamp_ntz"):
            return F.unix_micros(F.col(c)).cast("double")
        if dt == "date":
            return F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
        return F.col(c).cast("double")

    nums = [_numeric(c) for c in cols]
    sample_src = df.select(*[n.alias(f"__v_{i}") for i, n in enumerate(nums)])
    file_bounds = None
    if approx_rows:
        import numpy as np

        if approx_rows > _SAMPLE_CAP_ROWS:
            sample_src = sample_src.sample(
                False, _SAMPLE_CAP_ROWS / approx_rows, seed=42)
        V = sample_src.toPandas().to_numpy(dtype="float64", na_value=float("nan"))
        all_bounds = []
        for i in range(len(cols)):
            col_v = V[:, i] if len(V) else np.array([], dtype="float64")
            valid = col_v[~np.isnan(col_v)]
            all_bounds.append(
                [float(x) for x in np.quantile(valid, probs)]
                if len(valid) and probs else [])
        if n_out is not None and n_out > 1 and len(V):
            zs = _np_zkeys(V, all_bounds, bits)
            file_bounds = np.quantile(
                zs, [i / n_out for i in range(1, n_out)]).astype("float64")
    else:
        all_bounds = sample_src.approxQuantile(
            [f"__v_{i}" for i in range(len(cols))], probs, 0.01)
    out = df
    rid_cols = []
    for idx, (num, bounds) in enumerate(zip(nums, all_bounds)):
        name = f"__rid_{idx}"
        out = out.withColumn(name, range_id_column_from(num, bounds))
        rid_cols.append(name)
    key = interleave_bits([F.col(n) for n in rid_cols], bits)
    return out.withColumn("__zkey", key).drop(*rid_cols), "__zkey", file_bounds


def range_id_column_from(value: Column, boundaries: list) -> Column:
    if not boundaries:
        return F.lit(0)
    if len(boundaries) <= 16:
        # tiny boundary lists: stay fully codegen'd with a WHEN chain.
        # NOT larger ones: interleave_bits references the rid column
        # bits× and CollapseProject inlines the chain into every
        # reference — a 63-term chain became a 750-term zkey expression
        # (measured 3x slower than the Arrow searchsorted, whose UDF
        # result is evaluated once per batch and never inlined).
        expr = F.lit(0)
        for b in boundaries:
            expr = expr + F.when(value >= F.lit(b), 1).otherwise(0)
        return expr
    return _searchsorted_rid(value, boundaries)


def _zorder(spark: SparkSession, log: DeltaLog, cols: list[str],
            partition_filter: Optional[str], max_file_size: int,
            num_ranges: int, clustering: bool = False,
            full: bool = True) -> dict:
    import uuid as _uuid

    txn = dml_transaction(spark, log)
    snapshot = txn.snapshot
    from delta_spark import catalog_managed as CM

    CM.check_maintenance_allowed(snapshot.configuration,
                                 snapshot.protocol, "OPTIMIZE ZORDER/CLUSTER")
    if not cols:
        raise ValueError("ZORDER BY requires at least one column")
    part_cols = set(snapshot.partition_columns)
    for c in cols:
        if c in part_cols:
            raise ValueError(f"cannot Z-ORDER BY partition column {c}")
        if c not in [f.name for f in snapshot.schema.fields]:
            raise ValueError(f"unknown Z-ORDER column {c}")
    adds: list[AddFile] = []
    removes = []
    for _key, files in _select_partitions(txn, partition_filter).items():
        if clustering and not full:
            # incremental: only files not yet in a cube (new ingest,
            # DML rewrites); files with a ZCUBE_ID are already ordered
            files = [f for f in files if not (f.tags or {}).get(ZCUBE_ID_TAG)]
            if len(files) < 2:
                continue
        total = sum(f.size for f in files)
        n_out = max(1, math.ceil(total / max_file_size))
        df = _rewrite_input(spark, snapshot, files)
        approx_rows = sum(_file_rows(f) for f in files) or None
        zdf, zcol, file_bounds = _zorder_key_routed(
            df, cols, num_ranges, n_out=n_out, approx_rows=approx_rows)
        reps_list = (_partition_reps(spark, n_out)
                     if n_out > 1 and file_bounds is not None else None)
        if n_out == 1:
            # one output file: range partitioning is vacuous, and
            # repartitionByRange would pay an extra full scan (its
            # RangePartitioner sampling pass) just to learn that
            clustered = (zdf.repartition(1)
                         .sortWithinPartitions(zcol).drop(zcol))
        elif reps_list is not None:
            # route each row to its output range with one searchsorted
            # over the sample-derived z-key file boundaries, carried by
            # a representative value that hash-partitions to exactly
            # that partition index (probe-VERIFIED per n_out in
            # _partition_reps) — the z-ordered layout of
            # repartitionByRange without its extra sampling execution
            # of the full input (the z-key UDF ran TWICE before this)
            import numpy as np
            import pandas as pd
            from pyspark.sql.functions import pandas_udf

            reps = np.array(reps_list, dtype="int64")
            fb = file_bounds

            def _route(s):
                z = s.to_numpy(dtype="float64", na_value=float("nan"))
                f = np.searchsorted(fb, z, side="right")
                return pd.Series(reps[f])

            route = pandas_udf(_route, "long")
            clustered = (zdf.withColumn("__zroute", route(F.col(zcol)))
                         .repartition(n_out, F.col("__zroute"))
                         .sortWithinPartitions(zcol)
                         .drop(zcol, "__zroute"))
        else:
            clustered = (zdf.repartitionByRange(n_out, F.col(zcol))
                         .sortWithinPartitions(zcol)
                         .drop(zcol))
        new = write_table_files(clustered, snapshot, data_change=False)
        if clustering:
            cube = str(_uuid.uuid4())
            for a in new:
                a.tags = dict(a.tags or {})
                a.tags[ZCUBE_ID_TAG] = cube
        adds.extend(new)
        removes.extend(f.remove(data_change=False) for f in files)
        txn.read_files.update(f.path for f in files)
    metrics = {"numRemovedFiles": str(len(removes)), "numAddedFiles": str(len(adds))}
    if not adds:
        return {"version": txn.read_version, **metrics}
    v = txn.commit(list(adds) + list(removes), "OPTIMIZE",
                   {"zOrderBy": json.dumps(cols),
                    **({"clusterBy": json.dumps(cols)} if clustering else {}),
                    **({"isFull": "true"} if clustering and full else {})},
                   metrics)
    return {"version": v, **metrics}
