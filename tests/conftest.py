from __future__ import annotations

import pytest

from healthcare_rcm_etl_pipeline_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hrcm-tests", cpus=8, shuffle_partitions=8, driver_memory="6g")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
