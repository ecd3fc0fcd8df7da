from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from sher_look_spark.session import get_spark

    spark = get_spark("sher-look-spark-tests", master="local[4]", shuffle_partitions=8)
    yield spark
    spark.stop()
