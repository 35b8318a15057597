import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


@pytest.fixture(scope="session")
def spark():
    from batukh_spark.session import get_spark
    s = get_spark(app_name="batukh-tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
