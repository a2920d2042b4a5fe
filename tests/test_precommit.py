"""Pre-commit validators (hoodie.precommit.validators analog): a SQL
quality gate over the CANDIDATE snapshot; violating writes abort before
publishing — readers never see the bad data, staged files are cleaned."""

import pathlib

import pytest
from pyspark.sql import functions as F  # noqa: F401

from hudi_demo_spark.engine.engine import PreCommitValidationError

SCHEMA = "id int, price double, ts long"


@pytest.mark.parametrize("table_type", ["cow", "mor"])
def test_validator_blocks_bad_writes(engine, spark, table_type):
    t = f"pv_{table_type}"
    engine.create_table(
        t, record_key="id", precombine="ts", table_type=table_type,
        props={
            "precommit.validator.sql":
                "SELECT id, price FROM __candidate WHERE price < 0"
        },
    )
    engine.insert(spark.createDataFrame([(1, 10.0, 1), (2, 20.0, 1)], SCHEMA), t)
    cfg = engine._resolve(t)
    n_files = len(list((pathlib.Path(cfg.path) / "data").rglob("*.parquet")))
    # an upsert introducing a negative price is REJECTED
    with pytest.raises(PreCommitValidationError, match="violations"):
        engine.upsert(spark.createDataFrame([(2, -5.0, 2)], SCHEMA), t)
    # nothing published, staged files cleaned, no inflight leftovers
    assert {r["id"]: r["price"] for r in engine.read(t).collect()} == {
        1: 10.0, 2: 20.0,
    }
    assert len(
        list((pathlib.Path(cfg.path) / "data").rglob("*.parquet"))
    ) == n_files
    from hudi_demo_spark.engine.timeline import Timeline

    assert Timeline(cfg.path).inflight() == []
    # a clean write passes, and the table stays writable
    engine.upsert(spark.createDataFrame([(2, 25.0, 3)], SCHEMA), t)
    assert {r["id"]: r["price"] for r in engine.read(t).collect()} == {
        1: 10.0, 2: 25.0,
    }
    # insert path gated too
    with pytest.raises(PreCommitValidationError):
        engine.insert(spark.createDataFrame([(3, -1.0, 1)], SCHEMA), t)
    assert engine.read(t).count() == 2
