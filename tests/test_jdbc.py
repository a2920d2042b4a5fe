"""JDBC source operators (S9-S12) against a REAL embedded RDBMS —
Apache Derby, which ships with Spark. Mirrors the reference's shapes:
options-map load (common/.../DfUtils.scala:17-19), subquery-as-dbtable
pushdown (SyncCommentsAcrossClusters.scala:52,126-139), schema probe +
vectorized row fetch feeding the engine write path
(JavaClientHive2Hudi.java:524-563 — the Hive→Hudi ETL, row loop
replaced by one DataFrame)."""

import pytest
from pyspark.sql import functions as F

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    db = str(tmp_path_factory.mktemp("derby") / "db")
    url = f"jdbc:derby:{db};create=true"
    rows = [
        (1, "alice", 10.0, "2022-10-08"),
        (2, "bob", 20.0, "2022-10-08"),
        (3, "carol", 30.0, "2022-10-09"),
    ]
    df = spark.createDataFrame(
        rows, "id int, name string, price double, dt string"
    )
    (
        df.write.format("jdbc")
        .option("url", url).option("dbtable", "src")
        .option("driver", DRIVER).save()
    )
    return url


def test_jdbc_options_map_load(spark, derby):
    """S9: spark.read.format('jdbc').options(map).load()."""
    from hudi_demo_spark.sources.readers import jdbc_source

    df = jdbc_source(
        spark, {"url": derby, "dbtable": "src", "driver": DRIVER}
    )
    assert sorted(r["id"] for r in df.collect()) == [1, 2, 3]
    # S11: schema probe is free on the DataFrame
    assert dict(df.dtypes)["price"] == "double"


def test_jdbc_subquery_pushdown(spark, derby):
    """S10: whole query ships to the RDBMS via parenthesized dbtable
    (Derby folds unquoted identifiers to upper case; the pushed SQL is
    the RDBMS's dialect, exactly as in the reference's metastore
    query)."""
    from hudi_demo_spark.sources.readers import jdbc_subquery_source

    df = jdbc_subquery_source(
        spark,
        derby,
        'select "id", "name" from src where "price" > 15',
        driver=DRIVER,
    )
    assert sorted((r["id"], r["name"]) for r in df.collect()) == [
        (2, "bob"), (3, "carol"),
    ]


def test_jdbc_filter_pushdown_reaches_rdbms(spark, derby):
    """Catalyst pushes filters into the JDBC scan (PushedFilters in the
    plan) — the reference relies on this for the metastore queries."""
    import io
    from contextlib import redirect_stdout

    from hudi_demo_spark.sources.readers import jdbc_source

    df = jdbc_source(
        spark, {"url": derby, "dbtable": "src", "driver": DRIVER}
    ).filter(F.col("price") > 15).select("id")
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(True)
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "price" in plan.lower()
    assert sorted(r["id"] for r in df.collect()) == [2, 3]


def test_jdbc_to_engine_ingest(engine, spark, derby):
    """S12 + W6: the JavaClientHive2Hudi flow — JDBC table → inferred
    schema → keyed engine table → upsert → snapshot; the reference's
    row-by-row loop is one vectorized DataFrame."""
    from hudi_demo_spark.sources.readers import jdbc_source

    src = jdbc_source(
        spark, {"url": derby, "dbtable": "src", "driver": DRIVER}
    ).withColumn("seq", F.lit(1).cast("long"))
    engine.create_table(
        "jt", record_key="id", precombine="seq", partition_by="dt",
        schema=src.schema,
    )
    engine.upsert(src, "jt")
    engine.upsert(
        src.filter("id = 1").withColumn("price", F.lit(99.0))
        .withColumn("seq", F.lit(2).cast("long")),
        "jt",
    )
    got = {r["id"]: r["price"] for r in engine.read("jt").collect()}
    assert got == {1: 99.0, 2: 20.0, 3: 30.0}
