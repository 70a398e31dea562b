import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))


@pytest.fixture(scope="session")
def spark():
    from sparklog.session import get_spark

    s = get_spark("local[4]", app="sparklog-tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
