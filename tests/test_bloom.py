"""Bloom filter: no false negatives ever; filter_unseen == exact anti-join."""

from pyspark.sql import functions as F

from crunchy_spark.bloom import build_bloom, filter_unseen, merge_blooms, probe_bloom


def _keys(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], ["sha_int"])


def test_no_false_negatives(spark):
    seen_vals = [i * 7919 + 3 for i in range(5000)]
    seen = _keys(spark, seen_vals)
    bloom = build_bloom(seen)
    probed = probe_bloom(seen, bloom, 32)
    # every seen key must probe as maybe-seen
    assert probed.filter(~F.col("_maybe_seen")).count() == 0


def test_false_positive_rate_sane(spark):
    seen = _keys(spark, [i * 7919 + 3 for i in range(5000)])
    fresh = _keys(spark, [i * 104729 + 11 for i in range(5000, 10000)])
    bloom = build_bloom(seen)
    probed = probe_bloom(fresh, bloom, 32)
    fp = probed.filter(F.col("_maybe_seen")).count()
    assert fp / 5000 < 0.05  # 10 bits/key, k=7 => well under 5%


def test_filter_unseen_equals_exact(spark):
    seen = _keys(spark, range(0, 3000, 3))
    cand = _keys(spark, range(0, 2000))
    bloom = build_bloom(seen)
    with_bloom = {
        r[0] for r in filter_unseen(cand, seen, bloom=bloom, use_bloom=True).collect()
    }
    exact = {r[0] for r in cand.join(seen, "sha_int", "left_anti").collect()}
    assert with_bloom == exact


def test_merge_is_union(spark):
    a, b = _keys(spark, range(100)), _keys(spark, range(100, 200))
    merged = merge_blooms(build_bloom(a), build_bloom(b))
    both = _keys(spark, range(200))
    probed = probe_bloom(both, merged, 32)
    assert probed.filter(~F.col("_maybe_seen")).count() == 0
    assert merged.agg(F.sum("n_keys")).first()[0] == 200
