import glob
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_jobanalyzer_spark import get_spark  # noqa: E402

REFERENCE_TEST_DIR = "/root/reference/test"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="hja-tests", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def fixture_log1():
    paths = glob.glob(os.path.join(REFERENCE_TEST_DIR, "cvrsvc11*"))
    if not paths:
        pytest.skip("reference fixture log 1 not available")
    return paths[0]


@pytest.fixture(scope="session")
def fixture_log2():
    paths = glob.glob(os.path.join(REFERENCE_TEST_DIR, "ip-10-17-20-252*"))
    if not paths:
        pytest.skip("reference fixture log 2 not available")
    return paths[0]


@pytest.fixture(scope="session")
def sf_dir():
    if not os.path.isdir(TESTDATA):
        pytest.skip("testdata not available")
    return TESTDATA


@pytest.fixture(scope="session")
def duck(sf_dir):
    from tests.oracle_utils import duck_connect

    con = duck_connect(sf_dir)
    yield con
    con.close()
