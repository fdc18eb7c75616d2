from __future__ import annotations

import pytest

from dumb_crawler_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="dcs-tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture()
def tmp_wh(tmp_path):
    return tmp_path / "wh"
