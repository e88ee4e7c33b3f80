from __future__ import annotations

import pytest

from database_per_keyword_analysis_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dpka-tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
