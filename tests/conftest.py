import pytest

from exstream_implementation_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="exstream-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()
