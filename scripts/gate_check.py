"""Local simulation of the driver's correctness gate: run every
queries() entry AND its oracle_sql() on the same sf dir, compare row
counts + normalized values. Usage:

    python scripts/gate_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entry
from delta_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6f}"
    return str(v)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("gate_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs, osql = entry.queries(), entry.oracle_sql()
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            cols = sorted(sdf.columns)
            srows = sorted(tuple(norm(r[c]) for c in cols) for r in sdf.collect())
        except Exception as ex:
            bad.append(name)
            print(f"FAIL {name}: spark error {str(ex).splitlines()[0][:140]}")
            continue
        if name not in osql:
            print(f"  ok {name}: {len(srows)} rows (no_oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            orows = sorted(tuple(norm(row[c]) for c in cols)
                           for row in con.execute(osql[name]).arrow().to_pylist())
        except Exception as ex:
            bad.append(name)
            print(f"FAIL {name}: oracle error {str(ex).splitlines()[0][:140]}")
            continue
        if srows == orows:
            print(f"  ok {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        else:
            bad.append(name)
            so, ss = set(orows), set(srows)
            print(f"FAIL {name}: spark {len(srows)} vs oracle {len(orows)}")
            print("   spark-only:", [r for r in srows if r not in so][:2])
            print("   oracle-only:", [r for r in orows if r not in ss][:2])
    print(f"\n{len(qs) - len(bad)}/{len(qs)} green" + (f"; FAILURES: {bad}" if bad else ""))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
