import pytest


@pytest.fixture(scope="session")
def spark():
    from mitie_spark.session import get_spark

    s = get_spark("mitie_spark_tests", master="local[4]")
    yield s
    s.stop()
