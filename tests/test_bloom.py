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


def test_segment_probe_is_union_of_segments(spark):
    """LSM-style: a list of differently-sized delta filters probes as
    'maybe seen if ANY segment says so', with no false negatives."""
    a = _keys(spark, range(0, 4000, 2))
    b = _keys(spark, range(1, 401, 2))  # much smaller delta
    segs = [
        build_bloom(a, m_bits=1 << 16),
        build_bloom(b, m_bits=1 << 14),
    ]
    # different per-segment widths actually in play
    wa = len(segs[0].first()["words"])
    wb = len(segs[1].first()["words"])
    assert wa != wb
    both = _keys(spark, list(range(0, 4000, 2)) + list(range(1, 401, 2)))
    probed = probe_bloom(both, segs, 32)
    assert probed.filter(~F.col("_maybe_seen")).count() == 0


def test_segment_filter_unseen_equals_exact(spark):
    seen_a = _keys(spark, range(0, 3000, 3))
    seen_b = _keys(spark, range(1, 1000, 3))
    seen = seen_a.unionByName(seen_b)
    cand = _keys(spark, range(0, 2000))
    segs = [build_bloom(seen_a), build_bloom(seen_b, m_bits=1 << 14)]
    with_bloom = {
        r[0] for r in filter_unseen(cand, seen, bloom=segs, use_bloom=True).collect()
    }
    exact = {r[0] for r in cand.join(seen, "sha_int", "left_anti").collect()}
    assert with_bloom == exact


def test_adaptive_m_bits_monotone_pow2():
    from crunchy_spark.bloom import adaptive_m_bits

    sizes = [adaptive_m_bits(n) for n in (0, 100, 10_000, 1_000_000, 10_000_000)]
    assert all(s & (s - 1) == 0 for s in sizes)  # powers of two
    assert sizes == sorted(sizes)
    assert sizes[0] == 1 << 14
    # ~10 bits/key at scale (within the pow2 rounding band)
    assert 10_000_000 * 10 / 32 <= sizes[-1] <= 10_000_000 * 40 / 32


def test_empty_segment_list_means_no_filter(spark):
    """probe_bloom([]) must behave as 'nothing seen yet', not crash —
    the public API accepts any list, including a pre-bootstrap empty
    one."""
    cand = _keys(spark, range(50))
    probed = probe_bloom(cand, [], 32)
    assert probed.filter(F.col("_maybe_seen")).count() == 0
    assert probed.count() == 50
