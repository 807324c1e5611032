import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from langid_py_spark.spark.session import get_spark

    s = get_spark(cores=8, shuffle_partitions=8, app_name="langid_tests")
    yield s


@pytest.fixture(scope="session")
def fixture_path(spark) -> str:
    from langid_py_spark.fixtures.transcripts import ensure_transcripts

    return ensure_transcripts(spark, 0.001)
