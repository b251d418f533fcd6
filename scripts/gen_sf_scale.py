#!/usr/bin/env python3
"""Scale the driver-generated sf0.1 test data up by an integer factor
for LARGE-SCALE BENCH RUNS (BENCH_sf1): key-space-consistent
replication of /root/testdata/sf0.1 (read-only) into a scratch dir.

This is a bench fixture generator, NOT a correctness input: the
correctness gates always run on the driver's own testdata. Replication
rules keep the workload shape of the base data:

- region/nation: copied as-is (fixed-cardinality dims).
- customer/supplier/part/orders/lineitem: each replica r offsets every
  key column by r * (max_key + 1), so per-key join fan-out, match
  fractions and group cardinalities scale linearly with no cross-
  replica key collisions (the same trick dbgen uses across its
  parallel chunks).
- events: event_id/user_id offset; timestamps unchanged (10x density
  per hour bucket, the shape a 10x event stream actually has).
- documents: doc_id offset; for r>0 every word is salted with the
  replica id, so cross-replica texts are DISSIMILAR — without this,
  near-dup operators would see every document 10x duplicated and the
  bench would measure an artificial dup-explosion instead of a bigger
  corpus. Within-replica duplicate structure is preserved.
- embeddings: vec_id offset; vector rotated by r positions (norm
  preserved, cross-replica cosine decorrelated), label kept.

Usage: python scripts/gen_sf_scale.py [factor] [out_dir]
       (defaults: 10, /tmp/sfgen_sf1)
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from delta_spark.datasets import load_table
from delta_spark.session import get_spark

SRC = os.environ.get("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")

KEY_COLS = {
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {"l_orderkey": "orders", "l_partkey": "part",
                 "l_suppkey": "supplier"},
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfgen_sf1"
    spark = get_spark("gen_sf_scale")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)

    # one offset unit per key SPACE (o_custkey must move in lockstep
    # with c_custkey), = max over the owning table's key column
    spaces = {}
    for t, cols in KEY_COLS.items():
        df = load_table(spark, SRC, t)
        for col, space in cols.items():
            m = df.agg(F.max(col)).collect()[0][0]
            spaces[space] = max(spaces.get(space, 0), int(m) + 1)

    for t in ("region", "nation"):
        shutil.copy(os.path.join(SRC, f"{t}.parquet"),
                    os.path.join(out, f"{t}.parquet"))

    for t, cols in KEY_COLS.items():
        base = load_table(spark, SRC, t)
        reps = []
        for r in range(factor):
            rep = base
            for col, space in cols.items():
                rep = rep.withColumn(
                    col, (F.col(col) + F.lit(r * spaces[space]))
                    .cast(dict(base.dtypes)[col]))
            if t == "documents" and r > 0:
                rep = rep.withColumn(
                    "text",
                    F.array_join(
                        F.transform(F.split(F.col("text"), " "),
                                    lambda w: F.concat(w, F.lit(str(r)))),
                        " "))
            if t == "embeddings" and r > 0:
                n = F.size("embedding")
                rep = rep.withColumn(
                    "embedding",
                    F.concat(F.slice("embedding", r + 1, 4096),
                             F.slice("embedding", 1, r)))
            reps.append(rep)
        dfu = reps[0]
        for x in reps[1:]:
            dfu = dfu.unionByName(x)
        dfu.repartition(max(8, factor * 2)).write.mode("overwrite") \
            .parquet(os.path.join(out, f"{t}.parquet"))
        print(f"{t}: x{factor} written")
    print(f"done -> {out}")


if __name__ == "__main__":
    main()
