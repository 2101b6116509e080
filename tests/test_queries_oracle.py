"""Every queries() entry vs its DuckDB oracle at sf0.001 — the local
mirror of the driver's CORRECTNESS gate."""

import pytest

from crunchy_spark.queries import ORACLES, QUERIES
from tests.oracle_util import compare, duck_conn

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duck_conn(SF_DIR)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_oracle(spark, con, name):
    df = QUERIES[name](spark, SF_DIR)
    if name in ORACLES:
        compare(df, con, ORACLES[name], name)
    else:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0 and len(df.columns) > 0
