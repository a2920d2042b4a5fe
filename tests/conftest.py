import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hudi_demo_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow (endurance, hypothesis "
        "property sweeps, codec stress) — the default run is the fast "
        "set, sized to finish inside the CI/driver verify window",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running endurance/property/stress test — excluded "
        "from the default run; enable with --runslow or "
        "SPARK_GRAFT_SLOW=1",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get(
        "SPARK_GRAFT_SLOW"
    ) == "1":
        return
    skip = pytest.mark.skip(
        reason="slow: run with --runslow or SPARK_GRAFT_SLOW=1"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


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
