import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from infoscience_imports_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_pages(spark):
    from infoscience_imports_spark.sources.synthetic import generate_web_pages

    return generate_web_pages(spark, 200, seed=42).cache()
