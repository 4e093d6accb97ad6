from __future__ import annotations

import pytest

from python_etl_sample_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("python-etl-sample-spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
