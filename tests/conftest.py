from __future__ import annotations

import pytest

from binwatch_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("binwatch-spark-tests")
    yield spark
