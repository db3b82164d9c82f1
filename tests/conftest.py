import pytest


@pytest.fixture(scope="session")
def spark():
    from lasutility_spark.engine.session import get_spark

    s = get_spark(cpus=4, app="tests", shuffle_partitions=8)
    yield s
    s.stop()
