from __future__ import annotations

import pytest

from etl_tj_project_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("etl_tj_tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()
