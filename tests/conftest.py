from __future__ import annotations

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from near_duplicate_detection_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ndd-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_catalog_dir(tmp_path):
    d = str(tmp_path / "catalog")
    yield d
    shutil.rmtree(d, ignore_errors=True)
