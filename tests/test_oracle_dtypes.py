"""Oracle dtype hardening (round-7 driver red, `corpus_pack_offsets`):
DuckDB's windowed/plain `sum()` over integers yields HUGEINT, which
pandas `fetchdf()` downcasts to float64 — so a value-identical result
hash-mismatches against Spark's int64 (0.0 vs 0). Mechanically assert
that no oracle's comparison surface emits HUGEINT (or DECIMAL, the same
trap via fixed-point) — every such column must be wrapped in
CAST(... AS BIGINT/DOUBLE) in the oracle SQL.

Spark-free: pure DuckDB DESCRIBE over every registered oracle at
sf0.001 (DESCRIBE plans without executing, so this covers even the
expensive lifecycle oracles cheaply).
"""

import os

import duckdb
import pytest

from hudi_demo_spark.plans import ORACLES

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
BANNED = ("HUGEINT", "DECIMAL")


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_has_no_hugeint_or_decimal(ddb, name):
    sql = ORACLES[name].rstrip().rstrip(";")
    desc = ddb.execute(f"DESCRIBE ({sql})").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in desc
        if any(b in typ.upper() for b in BANNED)
    ]
    assert not bad, (
        f"{name}: oracle emits {bad} — pandas will downcast to float64 and "
        f"the driver's value hash will diverge from Spark's int64; wrap the "
        f"column(s) in CAST(... AS BIGINT) in the oracle SQL"
    )
