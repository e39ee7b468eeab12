from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from hive_apache_ci_spark.session import get_spark

    s = get_spark("pytest")
    yield s


@pytest.fixture(scope="session")
def duck():
    from hive_apache_ci_spark.verify import duck_connect

    return duck_connect(SF_DIR)
