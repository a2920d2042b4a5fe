"""Round-rotation validation sweep: run the CURRENT 50-name registry
head at sf0.01 under a BARE SparkSession (none of session.get_spark's
confs — exactly the correctness driver's environment) and compare
oracled names bit-exactly against DuckDB; rows-only names must run and
return a stable schema. Usage:
    python tests/sweep_head.py [query ...]   # default: the full head
"""

import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
from pyspark.sql import SparkSession

from hudi_demo_spark.plans import ORACLES, QUERIES

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    return v


def _canon(rows, cols):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in idx) for r in rows)


def main():
    names = sys.argv[1:] or list(QUERIES)[:50]
    spark = SparkSession.builder.master("local[8]").appName(
        "head_sweep"
    ).getOrCreate()
    sf = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    fails = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: {type(ex).__name__}: {ex}", flush=True)
            fails += 1
            continue
        dt = time.time() - t0
        if name not in ORACLES:
            print(f"ok(rows-only) {name}: {len(srows)} rows "
                  f"{dt:.1f}s", flush=True)
            continue
        res = con.execute(ORACLES[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        ok = (
            sorted(scols) == sorted(ocols)
            and len(srows) == len(orows)
            and _canon(srows, scols) == _canon(orows, ocols)
        )
        if ok:
            print(f"ok {name}: {len(srows)} rows {dt:.1f}s", flush=True)
        else:
            fails += 1
            print(f"FAIL {name}: spark {len(srows)}x{sorted(scols)} vs "
                  f"oracle {len(orows)}x{sorted(ocols)}", flush=True)
    print(f"done: {len(names)} checked, {fails} failed", flush=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
