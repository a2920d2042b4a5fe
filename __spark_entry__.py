"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)`` — flagship: ingest sf0.001 lineitem through the
  lakehouse engine (insert → snapshot read) and run the Q1-style pricing
  summary over the engine read path.
- ``queries()`` — one entry per implemented operator from SURVEY.md §2
  plus the LLM-pipeline extensions (hudi_demo_spark.plans.queries).
- ``oracle_sql()`` — DuckDB-equivalent SQL for EVERY query, including the
  approximate operators (MinHash-LSH, SimHash, LSH-ANN, IVF-ANN), which
  use an engine-portable md5-derived hash so their signatures and
  candidate sets are reproducible in SQL.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: engine-managed ingest + pricing-summary query at sf0.001."""
    import shutil

    from hudi_demo_spark.engine import Engine
    from hudi_demo_spark.sources.readers import load_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    root = "/tmp/hudi_demo_spark_entry"
    shutil.rmtree(root, ignore_errors=True)
    eng = Engine(spark, root)
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").withColumn(
        "k", F.concat_ws("-", "l_orderkey", "l_linenumber")
    )
    eng.create_table("lineitem", record_key="k", partition_by="l_returnflag")
    eng.insert(li, "lineitem")
    snap = eng.read("lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        snap.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hudi_demo_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from hudi_demo_spark.plans import ORACLES

    return dict(ORACLES)
