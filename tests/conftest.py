from __future__ import annotations

import pytest

from ocrautomator_spark.spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="ocrautomator-tests", shuffle_partitions=8)
    yield s
    s.stop()
