from __future__ import annotations

import pytest

from geneticalgorithmsusingmapreduce_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("gamr-tests", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"
SF_DIR_MED = "/root/testdata/sf0.01"
