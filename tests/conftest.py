import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_collection_modifyitems(config, items):
    """Two-tier suite (VERDICT r13 item 1): the multi-minute crash and
    equivalence sweeps are marked ``slow`` and DESELECTED by default so the
    plain ``python -m pytest tests/ -x -q`` the driver's verify gate runs
    finishes inside its capture window (~50 min for the full suite timed
    out at r13). Nothing is hidden:

    - ``SPARK_GRAFT_RUN_SLOW=1 pytest tests/`` runs the FULL suite (the
      end-of-round attestation the builder records);
    - an explicit ``-m`` expression (e.g. ``-m slow``) disables the
      default deselection entirely and is honored as given.
    """
    if os.environ.get("SPARK_GRAFT_RUN_SLOW") == "1":
        return
    if config.getoption("-m"):
        return
    deselected = [i for i in items if "slow" in i.keywords]
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = [i for i in items if "slow" not in i.keywords]


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
