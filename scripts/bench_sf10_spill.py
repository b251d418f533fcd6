"""sf10 spill-evidence tier (VERDICT r9 #7).

The sf3 tier (~16 GB hot set) still fits page cache AND executor
memory in the 128 GiB sandbox, so the heavy rows never demonstrate the
behavior that decides 100 TB viability: do the big sorts/aggregations
DEGRADE GRACEFULLY to disk when the working set exceeds executor
memory, or do they OOM / collapse to a straggler? This script runs the
heaviest families at 100x sf0.1 under a DELIBERATELY small JVM heap
(default 6g for 32 threads — far below the working set) and records
Spark's own spill counters (memoryBytesSpilled / diskBytesSpilled from
the stage REST API) per row, beside wall time.

Success criterion is NOT speed: it is spill bytes > 0 on the sort/agg
rows WITH every row completing and returning the same result counts a
roomy heap produces. That is the 1000-executor claim in miniature:
partitions stream through bounded memory, nothing needs the whole
dataset resident.

Usage:
  python scripts/gen_sf_scale.py 100 /tmp/sfgen_sf10   # once, ~2 min
  python scripts/bench_sf10_spill.py [data_dir] [out_json]

Writes BENCH_sf10.json (default) with one JSON object:
  {"sf": 10.0, "heap": "6g", "queries": {row: sec},
   "spill": {row: {"memoryBytesSpilled": n, "diskBytesSpilled": n,
                    "shuffle_write": n}}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DATA = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfgen_sf10"
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "BENCH_sf10.json")
HEAP = os.environ.get("SPARK_GRAFT_SF10_HEAP", "6g")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _rest(app_port: int, path: str):
    with urllib.request.urlopen(
            f"http://localhost:{app_port}/api/v1/{path}", timeout=10) as r:
        return json.loads(r.read())


def spill_totals(port: int) -> dict[str, int]:
    """Cumulative spill + shuffle-write across all completed stages."""
    apps = _rest(port, "applications")
    app = apps[0]["id"]
    tot = {"memoryBytesSpilled": 0, "diskBytesSpilled": 0,
           "shuffle_write": 0}
    for st in _rest(port, f"applications/{app}/stages?status=complete"):
        tot["memoryBytesSpilled"] += st.get("memoryBytesSpilled", 0)
        tot["diskBytesSpilled"] += st.get("diskBytesSpilled", 0)
        tot["shuffle_write"] += st.get("shuffleWriteBytes", 0)
    return tot


def main() -> None:
    if not os.path.isdir(DATA):
        raise SystemExit(
            f"{DATA} missing — run scripts/gen_sf_scale.py 100 {DATA} first")
    from pyspark.sql import SparkSession, functions as F

    from delta_spark.session import configure_spark

    builder = configure_spark(
        SparkSession.builder.appName("sf10_spill").master(f"local[{CPUS}]"))
    # AFTER configure_spark (it turns the UI off for the normal tiers;
    # this tier NEEDS the stage REST API for the spill counters)
    builder = (builder.config("spark.driver.memory", HEAP)
               .config("spark.ui.enabled", "true")
               .config("spark.ui.port", "4049"))
    spark = builder.getOrCreate()
    # the BOUND port, not the configured one: on a collision Spark
    # binds 4050+ with only a log warning, and reading the configured
    # port would attribute a FOREIGN app's spill counters to this bench
    ui_url = spark.sparkContext.uiWebUrl
    port = int(ui_url.rsplit(":", 1)[1]) if ui_url else 4049

    from delta_spark.io import write_delta
    from delta_spark.table import DeltaTable

    base = tempfile.mkdtemp(prefix="ds_sf10_")
    timings: dict[str, float] = {}
    spills: dict[str, dict[str, int]] = {}

    def tbl(name):
        return DeltaTable.forPath(spark, os.path.join(base, name))

    def run(name, fn):
        before = spill_totals(port)
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
        after = spill_totals(port)
        spills[name] = {k: after[k] - before[k] for k in after}
        print(name, timings[name], spills[name], flush=True)

    # ---- load: parquet -> delta (also the write-path pressure row) ----
    def load():
        for t in ("lineitem", "documents", "embeddings"):
            df = spark.read.parquet(os.path.join(DATA, f"{t}.parquet"))
            write_delta(df, os.path.join(base, t))
    run("load_delta", load)

    # ---- zorder: the global-sort family (repartitionByRange + sort) ---
    def zorder():
        tbl("lineitem").optimize().executeZOrderBy(
            "l_orderkey", "l_partkey", max_file_size=64 * 1024 * 1024)
    run("zorder", zorder)

    # ---- dedup family ---------------------------------------------------
    def mh():
        from delta_spark.ops.dedup import minhash_lsh_pairs
        print("  pairs:", minhash_lsh_pairs(
            tbl("documents").toDF(), threshold=0.5).count())
    run("dedup_minhash", mh)

    def exact_substr():
        from delta_spark.ops.dedup import duplicate_spans
        print("  spans:", duplicate_spans(tbl("documents").toDF(), k=8).count())
    run("exact_substr_spans", exact_substr)

    # ---- near-dup family (PRODUCTION recall: the configuration this
    # tier is meant to certify; the gate preset's cost is decomposed at
    # sf3 in BENCH_sf3) --------------------------------------------------
    def near_dups_prod():
        from delta_spark.ops.similarity import near_duplicates
        print("  pairs:", near_duplicates(
            tbl("embeddings").toDF(), threshold=0.8, method="lsh",
            target_miss="production").count())
    run("near_dups_lsh_prod", near_dups_prod)

    def near_dups_dupheavy():
        from delta_spark.ops.similarity import near_duplicates
        emb = tbl("embeddings").toDF().select("vec_id", "embedding")
        dup_vec = emb.select("embedding").first()["embedding"]
        dups = spark.range(100_000).select(
            (F.col("id") + 10_000_000).alias("vec_id"),
            F.lit(dup_vec).cast("array<float>").alias("embedding"))
        print("  rows:", near_duplicates(
            emb.unionByName(dups), threshold=0.95, method="lsh",
            target_miss="production", cluster_above=1000).count())
    run("near_dups_dupheavy", near_dups_dupheavy)

    out = {"sf": 10.0, "heap": HEAP, "cpus": CPUS,
           "queries": timings, "spill": spills,
           "note": ("100x sf0.1 under a deliberately small heap: the "
                    "claim is graceful degradation (spill > 0, rows "
                    "complete), not wall time. near-dup rows run the "
                    "production recall preset.")}
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
