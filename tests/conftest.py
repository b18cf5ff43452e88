from __future__ import annotations

import pytest

from lms_erp_data_integration_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # Small core count for test latency; configs identical to prod factory.
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
