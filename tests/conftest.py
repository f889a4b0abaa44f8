import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))  # fuzzgen import
sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


@pytest.fixture(scope="session")
def spark():
    from rle_spark.engine import get_spark

    s = get_spark("rle-spark-tests", cpus=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
