"""Cuckoo-filter URL-seen store (crunchy_spark/cuckoo.py): the
north_star's "Bloom/cuckoo" second option — same advisory contract as
bloom.py plus DELETION (TTL recrawl eviction). Pins: no false
negatives, FPR bound, deterministic build, pair-closure under the XOR
displacement, delete semantics, and filter_unseen equivalence with the
exact anti-join."""

import pytest
from pyspark.sql import functions as F

from crunchy_spark.cuckoo import (
    DEFAULT_M_BUCKETS,
    FP_MASK,
    SLOTS_PER_BUCKET,
    _g,
    build_cuckoo,
    delete_keys,
    filter_unseen_cuckoo,
    probe_cuckoo,
)

N_KEYS = 8000  # ~0.49 load at 1024 buckets x 16 slots


def _keys(spark, n, offset=0):
    """Deterministic sha-like int60 keys (same derivation family as the
    engine's url fingerprints)."""
    return spark.range(n).select(
        F.conv(
            F.substring(F.sha1(F.concat(F.lit("k"), (F.col("id") + offset))), 1, 15),
            16,
            10,
        )
        .cast("long")
        .alias("sha_int")
    )


@pytest.fixture(scope="module")
def built(spark):
    keys = _keys(spark, N_KEYS).localCheckpoint()
    filt, ovf = build_cuckoo(keys)
    return keys, filt.localCheckpoint(), ovf.localCheckpoint()


def test_no_false_negatives(spark, built):
    keys, filt, ovf = built
    probed = probe_cuckoo(keys, filt, ovf)
    assert probed.filter(~F.col("_maybe_seen")).count() == 0


def test_fpr_bounded(spark, built):
    _, filt, ovf = built
    fresh = _keys(spark, 20000, offset=10_000_000)
    hits = probe_cuckoo(fresh, filt, ovf).filter(F.col("_maybe_seen")).count()
    # theoretical ~ 2 * SLOTS / 2^FP_BITS ~ 0.8% at this load; allow 4x
    assert hits / 20000 < 0.03


def test_overflow_small_and_capacity_respected(spark, built):
    _, filt, ovf = built
    assert ovf.count() < 0.01 * N_KEYS  # ~half load: overflow ~ none
    over = filt.filter(F.size("fps") > SLOTS_PER_BUCKET).count()
    assert over == 0  # hard slot cap per bucket
    total = filt.select(F.sum(F.size("fps"))).first()[0] + ovf.count()
    assert total == N_KEYS  # every key stored exactly once


def test_build_deterministic(spark, built):
    keys, filt, _ = built
    filt2, _ = build_cuckoo(keys.repartition(7))  # different partitioning
    a = {tuple([r["bucket"], tuple(r["fps"])]) for r in filt.collect()}
    b = {tuple([r["bucket"], tuple(r["fps"])]) for r in filt2.collect()}
    assert a == b


def test_pair_closure_under_xor(spark):
    """b1 XOR g(fp) applied twice returns b1 for every (b1, fp) — the
    property that makes set-at-a-time deletion sound."""
    m = DEFAULT_M_BUCKETS
    d = (
        spark.range(5000)
        .select(
            (F.col("id") % m).cast("int").alias("b1"),
            (F.col("id") % FP_MASK + 1).cast("int").alias("fp"),
        )
        .withColumn("b2", F.col("b1").bitwiseXOR(_g(m)))
    )
    bad = d.filter(
        (F.col("b2") < 0)
        | (F.col("b2") >= m)
        | (F.col("b2").bitwiseXOR(_g(m)) != F.col("b1"))
    ).count()
    assert bad == 0


def test_delete_evicts_without_false_negatives(spark, built):
    keys, filt, ovf = built
    dels = keys.limit(1000).localCheckpoint()
    remaining = keys.join(dels, "sha_int", "left_anti")
    nf, no = delete_keys(filt, ovf, dels)
    nf = nf.localCheckpoint()
    no = no.localCheckpoint()
    # exactly one instance removed per deleted key
    total = nf.select(F.sum(F.size("fps"))).first()[0] + no.count()
    assert total == N_KEYS - 1000
    # remaining keys: still zero false negatives
    assert (
        probe_cuckoo(remaining, nf, no).filter(~F.col("_maybe_seen")).count() == 0
    )
    # deleted keys now report unseen except fingerprint-collision FPs
    still = probe_cuckoo(dels, nf, no).filter(F.col("_maybe_seen")).count()
    assert still / 1000 < 0.05


def test_filter_unseen_equals_exact_anti_join(spark, built):
    keys, filt, ovf = built
    # candidates: half seen, half new, plus extra columns that must ride
    cands = _keys(spark, 4000, offset=0).unionByName(
        _keys(spark, 4000, offset=10_000_000)
    ).withColumn("payload", F.col("sha_int") % 97)
    got = filter_unseen_cuckoo(cands, keys, filt, ovf)
    want = cands.join(keys, "sha_int", "left_anti")
    assert got.columns == cands.columns  # contract: same schema out
    assert got.count() == want.count() == 4000
    assert got.exceptAll(want).count() == 0


def test_non_pow2_buckets_rejected(spark):
    with pytest.raises(ValueError):
        build_cuckoo(_keys(spark, 10), m_buckets=1000)


def test_recrawl_ttl_eviction_flow(spark, built):
    """The end-to-end reason cuckoo exists: pages past their freshness
    TTL (recrawl_schedule decides which) are EVICTED from the seen
    filter and the seen table, and the very next scheduling round
    admits them again — impossible with the bloom bitmap short of a
    full rebuild."""
    keys, filt, ovf = built
    recrawl = keys.limit(500).localCheckpoint()  # TTL-expired slice
    nf, no = delete_keys(filt, ovf, recrawl)
    seen_after = keys.join(recrawl, "sha_int", "left_anti")
    brand_new = _keys(spark, 500, offset=50_000_000)
    cands = recrawl.unionByName(brand_new)
    admitted = filter_unseen_cuckoo(cands, seen_after, nf, no)
    # every TTL-expired page and every new page is schedulable again
    assert admitted.count() == 1000
    # while still-fresh pages stay deduped
    fresh_dup = keys.exceptAll(recrawl).limit(500)
    assert filter_unseen_cuckoo(fresh_dup, seen_after, nf, no).count() == 0


def test_incremental_insert_lifecycle(spark, built):
    """build -> insert delta -> delete TTL slice: the full mutable
    lifecycle, with exact instance accounting and zero false negatives
    at every step."""
    from crunchy_spark.cuckoo import insert_keys

    keys, filt, ovf = built
    delta = _keys(spark, 2000, offset=20_000_000).localCheckpoint()
    nf, no = insert_keys(filt, ovf, delta)
    nf, no = nf.localCheckpoint(), no.localCheckpoint()
    total = nf.select(F.sum(F.size("fps"))).first()[0] + no.count()
    assert total == N_KEYS + 2000  # every key stored exactly once
    assert nf.filter(F.size("fps") > SLOTS_PER_BUCKET).count() == 0
    both = keys.unionByName(delta)
    assert probe_cuckoo(both, nf, no).filter(~F.col("_maybe_seen")).count() == 0
    # incumbents were never displaced: untouched buckets identical
    before = {r["bucket"]: tuple(r["fps"]) for r in filt.collect()}
    after = {r["bucket"]: tuple(r["fps"]) for r in nf.collect()}
    for b, fps in before.items():
        assert set(fps) <= set(after.get(b, ()))  # supersets only
    # now evict the ORIGINAL keys' TTL slice from the merged filter
    dels = keys.limit(300).localCheckpoint()
    nf2, no2 = delete_keys(nf, no, dels)
    total2 = nf2.select(F.sum(F.size("fps"))).first()[0] + no2.count()
    assert total2 == N_KEYS + 2000 - 300
    survivors = both.join(dels, "sha_int", "left_anti")
    assert (
        probe_cuckoo(survivors, nf2, no2).filter(~F.col("_maybe_seen")).count()
        == 0
    )


def test_drop_in_for_bloom_in_scheduling_pipeline(spark):
    """The production seam: canonicalize -> fingerprint -> first-arrival
    dedup -> seen filter. With the SAME candidates and seen set, the
    cuckoo-backed filter_unseen must select exactly the rows the
    bloom-backed one does (both are advisory + exact anti-join, so the
    outputs are equal BY CONTRACT, not approximately)."""
    from crunchy_spark.bloom import build_bloom, filter_unseen
    from crunchy_spark.frontier import first_arrival
    from crunchy_spark.urlnorm import with_url_identity

    frontier = spark.range(3000).select(
        F.col("id").alias("seq"),
        F.concat(
            F.lit("https://h"),
            (F.col("id") % 40).cast("string"),
            F.lit(".crunchbase.com/organization/co-"),
            F.format_string("%06d", (F.col("id") / 2).cast("long")),
        ).alias("url"),
        (F.col("id") % 3).cast("int").alias("queue_rank"),
    )
    ident = with_url_identity(frontier, "url").select(
        "sha_int", "seq", "host", "queue_rank"
    )
    dedup = first_arrival(ident, "sha_int", ("seq",)).localCheckpoint()
    seen = dedup.filter(F.col("seq") % 5 == 0).select("sha_int").localCheckpoint()
    bloom = build_bloom(seen).localCheckpoint()
    cf, co = build_cuckoo(seen)
    cf, co = cf.localCheckpoint(), co.localCheckpoint()
    via_bloom = filter_unseen(dedup, seen, bloom=bloom)
    via_cuckoo = filter_unseen_cuckoo(dedup, seen, cf, co)
    assert sorted(via_bloom.columns) == sorted(via_cuckoo.columns)
    a = via_bloom.select("sha_int", "seq").collect()
    b = via_cuckoo.select("sha_int", "seq").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert len(a) > 0


def test_delete_at_high_load_with_nonempty_overflow(spark):
    """ADVICE r3 regression: at high load the overflow stash is
    NONEMPTY, and a TTL sweep that deletes overflow-resident keys must
    remove them from the stash ONLY — not also drain a bucket
    fingerprint from a colliding still-inserted key. The earlier code
    routed every delete through the bucket-drain math, so an
    overflow-resident delete double-deleted: its stash row AND one
    (fp, pair) instance belonging to some other key -> false negative.
    """
    m, slots = 64, SLOTS_PER_BUCKET  # capacity 1024
    keys = _keys(spark, 1400).localCheckpoint()  # ~1.37 load -> big stash
    filt, ovf = build_cuckoo(keys, m_buckets=m, slots=slots)
    filt, ovf = filt.localCheckpoint(), ovf.localCheckpoint()
    n_ovf = ovf.count()
    assert n_ovf > 0  # the regime the regression lives in
    # delete EXACTLY the overflow-resident keys
    nf, no = delete_keys(filt, ovf, ovf, m_buckets=m)
    nf, no = nf.localCheckpoint(), no.localCheckpoint()
    assert no.count() == 0
    # exact instance accounting: buckets untouched, stash emptied
    total = nf.select(F.sum(F.size("fps"))).first()[0]
    assert total == 1400 - n_ovf
    # zero false negatives for every still-inserted key
    remaining = keys.join(ovf, "sha_int", "left_anti")
    assert probe_cuckoo(remaining, nf, no, m_buckets=m).filter(
        ~F.col("_maybe_seen")
    ).count() == 0
    # mixed sweep: half stash keys + some bucket keys, same invariants
    filt2, ovf2 = build_cuckoo(keys, m_buckets=m, slots=slots)
    filt2, ovf2 = filt2.localCheckpoint(), ovf2.localCheckpoint()
    sweep = ovf2.limit(n_ovf // 2).unionByName(
        keys.join(ovf2, "sha_int", "left_anti").limit(100)
    ).localCheckpoint()
    nf2, no2 = delete_keys(filt2, ovf2, sweep, m_buckets=m)
    nf2, no2 = nf2.localCheckpoint(), no2.localCheckpoint()
    total2 = nf2.select(F.sum(F.size("fps"))).first()[0] + no2.count()
    assert total2 == 1400 - sweep.count()
    remaining2 = keys.join(sweep, "sha_int", "left_anti")
    assert probe_cuckoo(remaining2, nf2, no2, m_buckets=m).filter(
        ~F.col("_maybe_seen")
    ).count() == 0


def test_delete_duplicate_rows_set_semantic(spark, built):
    """Duplicate delete rows (same sha twice in one sweep) drain ONE
    fingerprint instance, not two — a second drain would evict a
    colliding key's fingerprint (ADVICE r3)."""
    keys, filt, ovf = built
    dels = keys.limit(200)
    dup_dels = dels.unionByName(dels).localCheckpoint()  # every key twice
    nf, no = delete_keys(filt, ovf, dup_dels)
    nf, no = nf.localCheckpoint(), no.localCheckpoint()
    total = nf.select(F.sum(F.size("fps"))).first()[0] + no.count()
    assert total == N_KEYS - 200
    remaining = keys.join(dels, "sha_int", "left_anti")
    assert probe_cuckoo(remaining, nf, no).filter(
        ~F.col("_maybe_seen")
    ).count() == 0


def test_probe_with_duplicated_overflow_rows(spark, built):
    """A sha duplicated in the overflow stash (double-insert / merged
    round deltas) must not fan candidate rows out through the probe's
    overflow join (ADVICE r3)."""
    keys, filt, ovf = built
    dup_ovf = ovf.unionByName(ovf).unionByName(
        keys.limit(50).select("sha_int")
    ).localCheckpoint()
    cands = keys.limit(500).withColumn("payload", F.col("sha_int") % 97)
    probed = probe_cuckoo(cands, filt, dup_ovf)
    assert probed.count() == 500  # one output row per candidate row
    assert probed.filter(~F.col("_maybe_seen")).count() == 0
