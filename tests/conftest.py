from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from matrixprofile_spark.session import get_spark

    sp = get_spark("tests", cores=4, shuffle_partitions=8)
    yield sp
