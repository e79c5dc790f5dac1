from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from iot_data_pipeline_spark.session import build_session

    s = build_session("pytest", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
