import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


@pytest.fixture(scope="session")
def spark():
    from docprompt_spark.session import get_spark

    spark = get_spark(master="local[8]", app_name="tests", shuffle_partitions=8)
    yield spark
