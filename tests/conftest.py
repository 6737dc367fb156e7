import pytest


@pytest.fixture(scope="session")
def spark():
    from page_segmentation_spark.session import get_spark

    s = get_spark(app="pss-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()
