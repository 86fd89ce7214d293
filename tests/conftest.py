from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from crypto_exchange_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture()
def tmpdir_path():
    p = tempfile.mkdtemp(prefix="cee_spark_test_")
    yield p
    shutil.rmtree(p, ignore_errors=True)


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
