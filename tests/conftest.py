import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SAFEDATA_SHUFFLE_PARTITIONS", "8")

SF_DIR = os.environ.get("SAFEDATA_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from safedata_pipeline_spark.session import get_spark

    s = get_spark(app_name="safedata-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
