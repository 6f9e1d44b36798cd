from __future__ import annotations

import os
import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from holcstore_spark import get_spark

    s = get_spark(app_name="holcstore-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_store_path():
    path = tempfile.mkdtemp(prefix="holc_test_")
    shutil.rmtree(path, ignore_errors=True)
    yield path
    shutil.rmtree(path, ignore_errors=True)
