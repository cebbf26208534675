from __future__ import annotations

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="ferenda_spark_tests",
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={"spark.default.parallelism": "8"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
