"""Every queries() entry vs its DuckDB oracle — the local mirror of the
driver's CORRECTNESS gate, at BOTH sf0.001 and sf0.01.

sf0.01 is the scale the driver actually checks at; round 3 proved that
a mirror running only at sf0.001 lets scale-dependent representation
gaps (float-sum boundaries, type widening) reach the driver unseen, so
the mirror now runs the driver's scale too.  A handful of quadratic-ish
pair ops cost >=5s each at sf0.01; they are EXPLICITLY listed and
skipped there (never silently), still fully checked at sf0.001.
"""

import pytest

from crunchy_spark.queries import ORACLES, QUERIES
from tests.oracle_util import compare, duck_conn

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

# Pair/component ops whose engine+oracle cost at sf0.01 is >=5s each
# (BENCH_r04 sf0.01 walls); checked at sf0.001 only, by explicit policy.
SLOW_AT_SF001 = {
    "neardup_components",
    "neardup_cluster_stats",
    "neardup_canonical_docs",
    "image_dup_canonical",
    "curation_keep_list",
    "dedup_layer_agreement",
    "dedup_tier_kappa",
    "incremental_neardup",
}


@pytest.fixture(scope="module", params=SF_DIRS, ids=["sf0.001", "sf0.01"])
def sf_con(request):
    return request.param, duck_conn(request.param)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_oracle(spark, sf_con, name):
    sf_dir, con = sf_con
    if sf_dir.endswith("sf0.01") and name in SLOW_AT_SF001:
        pytest.skip(f"{name}: >=5s pair op, checked at sf0.001 only (policy)")
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        compare(df, con, ORACLES[name], name)
    else:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0 and len(df.columns) > 0
