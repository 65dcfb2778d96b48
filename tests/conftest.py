from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pii_spark.session import get_spark

    s = get_spark(app="pii-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
