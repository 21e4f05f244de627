from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="session")
def spark():
    from go_nonrat_annotation_pipeline_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=4)
    yield s
