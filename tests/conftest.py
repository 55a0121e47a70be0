import pytest

from datasketches_rust_spark.session import make_local_session


@pytest.fixture(scope="session")
def spark():
    s = make_local_session(
        4,
        shuffle_partitions=8,
        app_name="datasketches-rust-spark-tests",
        driver_memory="4g",
    )
    yield s
    s.stop()
