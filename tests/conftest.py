import pytest

from mds_provider_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mds-provider-spark-tests", parallelism=4, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
