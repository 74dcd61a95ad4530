import sys

import pytest

sys.path.insert(0, "/root/repo")

from benchmark_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=4, extra_conf={"spark.locality.wait": "0s"})
    s.sparkContext.setLogLevel("ERROR")
    yield s
