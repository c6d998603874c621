import sys

import pytest

# the reference library is the Tier-V oracle (read-only import, never copied)
sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="session")
def spark():
    from trafaret_spark.session import get_spark
    s = get_spark("trafaret_spark-tests", cores=4, shuffle_partitions=4)
    yield s
