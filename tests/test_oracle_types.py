"""Guard: no DuckDB oracle may emit an exotic output type.

DuckDB widens integer aggregates: sum(BIGINT) -> HUGEINT (int128), and
integer arithmetic that touches a HUGEINT stays HUGEINT.  A HUGEINT
column round-trips fine through fetchall() (plain Python int) — which is
why the repo's order-insensitive mirror never noticed — but through an
Arrow/pandas fetch path it becomes decimal128/object/float64, so a
value-identical result can still hash differently from Spark's int64.
Round 3 shipped exactly this: host_ip_politeness, crawl_budget_alloc and
bigram_logprob_quality were value-correct yet driver-red because one
output column was HUGEINT (CORRECTNESS_r03.json).  Every such column now
carries an explicit ::BIGINT cast; this test pins the invariant for all
current and future oracles.
"""

import pytest

from crunchy_spark.queries import ORACLES
from tests.oracle_util import duck_conn

SF_DIR = "/root/testdata/sf0.001"

# Types that fetch identically through every DuckDB client path
# (fetchall, Arrow, pandas) AND map 1:1 onto a Spark DataFrame type.
ALLOWED = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "BOOLEAN",
    "DATE",
    "TIMESTAMP",
}


@pytest.fixture(scope="module")
def con():
    return duck_conn(SF_DIR)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_output_types(con, name):
    cur = con.sql(ORACLES[name])
    bad = {
        c: str(t)
        for c, t in zip(cur.columns, cur.types)
        if str(t) not in ALLOWED
    }
    assert not bad, (
        f"{name}: oracle emits non-portable output types {bad} — add an "
        f"explicit cast (::BIGINT for integer aggregates; DuckDB widens "
        f"sum(BIGINT) to HUGEINT, which hash-mismatches Spark int64 "
        f"through Arrow fetch paths)"
    )
