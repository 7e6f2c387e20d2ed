import pytest

from webdq.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("local[4]", app_name="webdq-tests", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
