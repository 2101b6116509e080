from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crunchy_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="crunchy_tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def unit_fixtures(spark, tmp_path_factory):
    """Materialized unit-scale fixture tables (FIXTURES.md)."""
    from crunchy_spark import datagen

    out = str(tmp_path_factory.mktemp("fixtures_unit"))
    datagen.write_fixtures(spark, out, scale="unit")
    return out
