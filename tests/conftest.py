import os

import numpy as np
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from imops_spark.session import get_spark

    s = get_spark(shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(autouse=True)
def seed():
    np.random.seed(1337)  # reference convention, tests/test_zoom.py:19
