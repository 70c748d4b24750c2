import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ocrd_segment_spark.session import build_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = build_session(app="tests", master="local[8]", arrow_batch=64)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
