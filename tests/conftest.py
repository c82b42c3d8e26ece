import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("HIVE_SPARK_TEST_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from hive_spark import get_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    s = get_session(app_name="hive_spark_tests", master=f"local[{cpus}]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
