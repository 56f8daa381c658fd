import pytest


@pytest.fixture(scope="session")
def spark():
    from kelos_on_kafka_spark.plans.session import get_spark

    s = get_spark(
        app_name="kelos-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    yield s
    s.stop()
