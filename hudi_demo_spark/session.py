"""SparkSession factory with scale-appropriate defaults.

Local mode is a single JVM; on a real cluster the same config names
apply — AQE handles skew/coalescing at runtime, shuffle partitions are
sized for the local core count and should be raised (or left to AQE)
at cluster scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hudi_demo_spark",
    cpus: int | None = None,
    extra_conf: dict | None = None,
    hive: bool = False,
    metastore_dir: str | None = None,
) -> SparkSession:
    """`hive=True` enables Spark's built-in Hive catalog backed by an
    embedded Derby metastore at `metastore_dir` (default a stable
    per-user path) — table definitions synced via
    `Engine.sync_catalog(database=...)` then persist ACROSS
    SparkSessions and processes, the real Hive meta-sync (D5) instead
    of session-scoped temp views. On a cluster the same code points at
    a remote HMS via hive-site.xml; the Derby URL here is the local
    stand-in. Must be chosen BEFORE the JVM starts (static conf): a
    later get_spark(hive=True) in a process that already built a
    non-hive session returns that session unchanged."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # make this package importable in Spark's Python workers (data-source
    # planning/read workers import registered classes by module). Must be
    # in the env BEFORE the JVM starts — the local equivalent of shipping
    # the wheel with --py-files on a cluster.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # let Catalyst push filters into Python data sources (the
        # format("hudi") reader prunes partitions/files from them)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # partition-dir values stay strings (bootstrap dir parsing)
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        .config("spark.ui.enabled", "false")
        # per-process path: no collisions between users or concurrent runs
        .config(
            "spark.sql.warehouse.dir",
            f"/tmp/hudi_demo_spark_warehouse_{os.getuid()}_{os.getpid()}",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    if hive:
        ms = metastore_dir or f"/tmp/hudi_demo_spark_metastore_{os.getuid()}"
        os.makedirs(ms, exist_ok=True)
        builder = (
            builder.enableHiveSupport()
            .config(
                "javax.jdo.option.ConnectionURL",
                f"jdbc:derby:;databaseName={ms}/metastore_db;create=true",
            )
            # warehouse must be stable too, or managed-table paths and
            # database locations dangle across processes
            .config("spark.sql.warehouse.dir", f"{ms}/warehouse")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
