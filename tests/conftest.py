import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hudi_demo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("hudi_demo_spark_tests", cpus=8)
    yield s


@pytest.fixture
def engine(spark, tmp_path):
    from hudi_demo_spark import Engine

    return Engine(spark, tmp_path / "lake")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
