import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from dbt_decodable_spark.session import get_spark

    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture()
def engine(spark):
    from dbt_decodable_spark.catalog import Engine

    eng = Engine(spark, namespace="t")
    yield eng
    eng.cleanup()
