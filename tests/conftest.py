from __future__ import annotations

import pytest

from polars_gdal_spark import register_gdal_source
from polars_gdal_spark.session import get_spark

REF_DATA = "/root/reference/test_data"
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    register_gdal_source(s)
    yield s
