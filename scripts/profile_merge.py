"""Line-attributed py4j profile of one steady-state MERGE (guide §1).

Counts every py4j round trip (send_command on both the ClientServer and
classic GatewayConnection paths), attributes each to the innermost
delta_spark/ frame on the Python stack, and times the whole command
plus its two Spark jobs. Run it before/after a driver-tax change to
verify the round-trip count actually moved.

Usage:
    python scripts/profile_merge.py [n_merges] [--dv]
Prints: total round trips, wall per merge, top (file:line, count,
seconds-inside-send) rows.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
import traceback
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

COUNTS: dict[str, int] = defaultdict(int)
SECS: dict[str, float] = defaultdict(float)
TOTAL = {"n": 0, "sec": 0.0}
ENABLED = {"on": False}


def _attr_frame() -> str:
    for f in reversed(traceback.extract_stack(limit=40)):
        fn = f.filename
        if "/delta_spark/" in fn or fn.endswith("bench.py"):
            return f"{os.path.relpath(fn, REPO)}:{f.lineno}"
    return "<other>"


def _patch():
    import py4j.clientserver as cs
    import py4j.java_gateway as jg

    for cls in (cs.ClientServerConnection, jg.GatewayConnection):
        orig = cls.send_command

        def send(self, *a, _orig=orig, **kw):
            if not ENABLED["on"]:
                return _orig(self, *a, **kw)
            t0 = time.perf_counter()
            try:
                return _orig(self, *a, **kw)
            finally:
                el = time.perf_counter() - t0
                key = _attr_frame()
                COUNTS[key] += 1
                SECS[key] += el
                TOTAL["n"] += 1
                TOTAL["sec"] += el

        cls.send_command = send


def main() -> None:
    n_merges = 3
    use_dv = "--dv" in sys.argv
    for a in sys.argv[1:]:
        if a.isdigit():
            n_merges = int(a)
    _patch()

    from delta_spark.datasets import load_table
    from delta_spark.log import DeltaLog
    from delta_spark.session import get_spark
    from delta_spark.table import DeltaTable

    spark = get_spark("merge_profile")
    scratch = tempfile.mkdtemp(prefix="merge_prof_")
    base = os.path.join(scratch, "orders")
    from delta_spark.io import write_delta
    write_delta(load_table(spark, SF_DIR, "orders"), base)

    merge_src = (load_table(spark, SF_DIR, "orders")
                 .filter("o_orderkey % 10 = 0")
                 .selectExpr(
                     "o_orderkey + CASE WHEN o_orderkey % 2 = 1 "
                     "THEN 900000000 ELSE 0 END AS o_orderkey",
                     "o_custkey", "o_orderstatus",
                     "o_totalprice * 2 AS o_totalprice",
                     "o_orderdate", "o_orderpriority"))

    walls = []
    for i in range(n_merges + 1):   # first one is warm-up, uncounted
        dest = os.path.join(scratch, f"orders_i{i}")
        shutil.rmtree(dest, ignore_errors=True)
        shutil.copytree(base, dest)
        os.sync()
        DeltaLog.clear_cache()
        d = DeltaTable.forPath(spark, dest)
        if use_dv:
            d.setProperties({"delta.enableDeletionVectors": "true"})
        if i == 1:
            ENABLED["on"] = True
        t0 = time.time()
        (d.merge(merge_src, "target.o_orderkey = source.o_orderkey")
         .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute())
        el = time.time() - t0
        if i >= 1:
            walls.append(el)
    ENABLED["on"] = False

    per = TOTAL["n"] / n_merges
    print(f"\nmerges timed: {n_merges}  dv={use_dv}")
    print(f"wall/merge: {sum(walls)/len(walls):.3f} s "
          f"(min {min(walls):.3f})")
    print(f"py4j round trips/merge: {per:.0f}  "
          f"({TOTAL['sec']/n_merges:.3f} s inside send_command)")
    rows = sorted(COUNTS.items(), key=lambda kv: -SECS[kv[0]])[:25]
    print(f"{'site':58s} {'calls/merge':>11s} {'sec/merge':>9s}")
    for k, c in rows:
        print(f"{k:58s} {c/n_merges:11.1f} {SECS[k]/n_merges:9.3f}")
    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
