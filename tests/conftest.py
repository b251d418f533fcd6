import os
import shutil
import tempfile

import pytest

from delta_spark.log import DeltaLog
from delta_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("delta_spark_tests", master="local[4]")
    # tests vacuum with tiny retention windows on purpose (the
    # reference's test utils disable the same safety check)
    s.conf.set("delta_spark.retentionDurationCheck.enabled", "false")
    yield s


@pytest.fixture()
def tmp_table(tmp_path):
    DeltaLog.clear_cache()
    p = str(tmp_path / "tbl")
    yield p
    DeltaLog.clear_cache()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
