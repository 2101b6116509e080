"""Partitioned cuckoo-filter URL-seen store — the "Bloom/cuckoo" second
option named in the north_star, built set-at-a-time.

Why a second filter when bloom.py exists: a Bloom filter cannot FORGET.
A 10^10-URL frontier that re-crawls pages on a freshness TTL
(recrawl_schedule / etag_revalidate_plan decide WHICH) must also evict
those URLs from the seen filter or the scheduler will keep discarding
them as duplicates; with a Bloom bitmap the only eviction is a full
rebuild of the crawl history. A cuckoo filter (Fan, Andersen,
Kaminsky, Mitzenmacher: "Cuckoo Filter: Practically Better Than
Bloom", CoNEXT 2014) stores displaceable per-key FINGERPRINTS, so
deletion is exact-cost: remove one fingerprint instance. Same advisory
contract as bloom.py (false positives re-checked by the exact
anti-join; false negatives impossible for inserted keys), similar
memory (FP_BITS=12 -> ~1.5 bytes/key vs bloom's 1.25), plus delete.

Spark-first shape (not the RAM algorithm): the classic insert does a
random eviction WALK per key — serial, per-row, unusable on a cluster.
Here placement is ONE deterministic two-phase plan over the whole key
set (the "power of two choices" without the walk):

  phase 1: every key ranks within its primary bucket (row_number over
           b1, ordered by sha) — ranks <= SLOTS place in b1;
  phase 2: spilled keys rank within their ALTERNATE bucket, offset by
           the slots phase 1 already used there — fits place in b2;
  rest:    an exact overflow list (tiny below ~0.8 load; the analog of
           the stash in stashed-cuckoo variants).

Both phases are bucket-keyed windows + hash aggs (map-side combinable,
no Python); the filter materializes as one array<int> row per bucket,
exactly like bloom.py's word rows, so it broadcasts/bucket-joins the
same way and the PROBE is whole-stage-codegen: two array_contains
tests + an overflow join flag.

The partial-key XOR trick makes deletion safe set-at-a-time: b2 =
b1 XOR g(fp) means every key sharing (fp, either-bucket) lives in the
SAME unordered bucket pair {b1, b2}, so deletions group by
(pair, fp), drain the pair's instances min-first, and can never strand
a remaining key without a findable fingerprint (Fan et al. §3.2 —
deletion is only defined for keys actually inserted, same here).

Reference analog: the same vestigial dupefilter + Mongo existence
checks bloom.py cites (rabbitmq/dupefilter.py:35-44,
similar_companies.py:49-68); this variant adds the TTL-evict path the
reference performs implicitly by nightly Mongo TTL indexes.

At 10^10 keys the filter is ~15 GB of fingerprints. insert_keys /
delete_keys rewrite only TOUCHED buckets as DataFrames, but a
persisted filter must match that: store the bucket rows partitioned
by bucket RANGE (one file per range) and replace only the touched
files on commit — the Iceberg rewrite_data_files discipline the
snapshot store applies to the frontier. The bloom's append-only LSM
segments avoid that machinery at the cost of probe-walking a segment
list and compaction debt; which trade wins depends on whether the
workload ever deletes. This module is the delete-capable option; the
engine ships with the bloom default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FP_BITS = 12
FP_MASK = (1 << FP_BITS) - 1  # fingerprints in 1..4095 (0 = empty)
DEFAULT_M_BUCKETS = 1 << 10  # pow2 so bucket math is mask, not division
SLOTS_PER_BUCKET = 16  # wider than RAM cuckoo's 4: arrays are cheap here
_KNUTH = 2654435761  # multiplicative hash for g(fp)

CUCKOO_SCHEMA = "bucket int, fps array<int>"


def _fp(sha=None):
    """12-bit nonzero fingerprint from high sha bits (the low bits feed
    the bucket index — independent bit ranges, like bloom._indices)."""
    sha = F.col("sha_int") if sha is None else sha
    return (F.shiftright(sha, 40) % FP_MASK + 1).cast("int")


def _b1(m: int, sha=None):
    sha = F.col("sha_int") if sha is None else sha
    return F.pmod(sha, F.lit(m)).cast("int")


def _g(m: int, fp=None):
    """g(fp): bucket displacement derived ONLY from the fingerprint —
    the partial-key property deletion and probing rely on."""
    fp = F.col("fp") if fp is None else fp
    return F.pmod(fp.cast("long") * _KNUTH, F.lit(m)).cast("int")


def _check_m(m: int) -> None:
    # XOR of two values below a power of two stays below it — that is
    # what closes the {b1, b2} pair under displacement. A non-pow2 m
    # would need a reducing % that BREAKS the closure silently.
    if m & (m - 1):
        raise ValueError(f"m_buckets must be a power of two, got {m}")


def _with_slots(keys: DataFrame, m: int) -> DataFrame:
    _check_m(m)
    d = keys.withColumn("fp", _fp()).withColumn("b1", _b1(m))
    return d.withColumn("b2", F.col("b1").bitwiseXOR(_g(m)))


def build_cuckoo(
    keys: DataFrame,
    m_buckets: int = DEFAULT_M_BUCKETS,
    slots: int = SLOTS_PER_BUCKET,
) -> tuple[DataFrame, DataFrame]:
    """keys (sha_int) -> (filter rows (bucket, fps), overflow (sha_int)).

    One deterministic plan: two bucket-keyed ranking phases replace the
    per-key eviction walk (module docstring). Ordering inside a bucket
    is by sha_int so the build is a pure function of the key SET —
    partitioning and arrival order can't change the filter."""
    d = _with_slots(keys.select("sha_int"), m_buckets).localCheckpoint(
        eager=False
    )
    w1 = Window.partitionBy("b1").orderBy("sha_int")
    r1 = d.withColumn("rk1", F.row_number().over(w1))
    placed1 = r1.filter(F.col("rk1") <= slots).select(
        F.col("b1").alias("bucket"), "fp", "sha_int"
    )
    used = placed1.groupBy("bucket").agg(F.count("*").alias("used"))
    spill = r1.filter(F.col("rk1") > slots)
    w2 = Window.partitionBy("b2").orderBy("sha_int")
    r2 = (
        spill.join(used.withColumnRenamed("bucket", "b2"), "b2", "left")
        .withColumn("rk2", F.row_number().over(w2))
        .withColumn("cap2", F.lit(slots) - F.coalesce("used", F.lit(0)))
    )
    placed2 = r2.filter(F.col("rk2") <= F.col("cap2")).select(
        F.col("b2").alias("bucket"), "fp", "sha_int"
    )
    overflow = r2.filter(F.col("rk2") > F.col("cap2")).select("sha_int")
    filt = (
        placed1.unionByName(placed2)
        .groupBy("bucket")
        .agg(F.array_sort(F.collect_list("fp")).alias("fps"))
    )
    return filt, overflow


def probe_cuckoo(
    candidates: DataFrame,
    filt: DataFrame,
    overflow: DataFrame,
    m_buckets: int = DEFAULT_M_BUCKETS,
) -> DataFrame:
    """Adds `_maybe_seen`: fp present in either bucket, or exact
    overflow hit. JVM-only — two bucket equi-joins (auto-broadcast
    under the threshold, shuffle-hash above, exactly like bloom's word
    rows) + array_contains tests in codegen."""
    c = _with_slots(candidates, m_buckets)  # keeps all candidate columns
    f1 = filt.select(F.col("bucket").alias("b1"), F.col("fps").alias("_f1"))
    f2 = filt.select(F.col("bucket").alias("b2"), F.col("fps").alias("_f2"))
    # distinct: a sha duplicated in the stash (double-insert, merged
    # round deltas) must not fan candidate rows out through the join
    ovf = overflow.select("sha_int").distinct().withColumn("_ovf", F.lit(True))
    j = (
        c.join(f1, "b1", "left")
        .join(f2, "b2", "left")
        .join(ovf, "sha_int", "left")
    )
    maybe = (
        F.coalesce(F.array_contains("_f1", F.col("fp")), F.lit(False))
        | F.coalesce(F.array_contains("_f2", F.col("fp")), F.lit(False))
        | F.coalesce(F.col("_ovf"), F.lit(False))
    )
    return j.withColumn("_maybe_seen", maybe).drop(
        "fp", "b1", "b2", "_f1", "_f2", "_ovf"
    )


def delete_keys(
    filt: DataFrame,
    overflow: DataFrame,
    del_keys: DataFrame,
    m_buckets: int = DEFAULT_M_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """Remove one fingerprint instance per deleted key — the operation
    Bloom filters cannot do, and the reason this module exists (TTL
    recrawl eviction). O(affected buckets), never a rebuild: deletions
    group by (unordered bucket pair, fp) — the pair is CLOSED under the
    XOR displacement, so all instances of that fp serving those keys
    live in its two buckets — then each pair drains min(bucket)-first
    and only the touched buckets are rewritten. Overflow keys delete by
    exact sha anti-join. Deletion is SET-semantic (del_keys is
    de-duplicated): the engine's committed seen set is unique by sha,
    and a duplicated delete row must not drain a second fingerprint
    that belongs to a colliding key. Deleting a key never inserted is
    undefined (cuckoo-filter contract; it may evict a colliding key's
    fingerprint and raise the OTHER key's false-negative risk — the
    engine only ever deletes keys it committed)."""
    d0 = del_keys.select("sha_int").distinct()
    # Split against the overflow stash FIRST: a key whose instance
    # lives in overflow is removed from overflow ONLY. Routing it into
    # the bucket-drain math too would drain a fingerprint belonging to
    # a still-inserted key that shares its (fp, pair) — a false
    # negative for that key at high load, where overflow is nonempty
    # and TTL eviction sweeps hit it.
    ovf_keys = overflow.select("sha_int").distinct()
    d = _with_slots(d0.join(ovf_keys, "sha_int", "left_anti"), m_buckets)
    pairs = d.select(
        "fp",
        F.least("b1", "b2").alias("bmin"),
        F.greatest("b1", "b2").alias("bmax"),
    ).groupBy("bmin", "bmax", "fp").agg(F.count("*").alias("n_del"))
    # instances of the pair's fp currently in each side
    inst = filt.select("bucket", F.explode("fps").alias("fp"))
    cnt = inst.groupBy("bucket", "fp").agg(F.count("*").alias("cnt"))
    p = (
        pairs.join(
            cnt.select(
                F.col("bucket").alias("bmin"), "fp", F.col("cnt").alias("c1")
            ),
            ["bmin", "fp"],
            "left",
        )
        .join(
            cnt.select(
                F.col("bucket").alias("bmax"), "fp", F.col("cnt").alias("c2")
            ),
            ["bmax", "fp"],
            "left",
        )
        .withColumn("c1", F.coalesce("c1", F.lit(0)))
        .withColumn("c2", F.coalesce("c2", F.lit(0)))
    )
    # same-bucket pairs (b1 == b2) drain one side only
    p = p.withColumn(
        "rm1", F.least(F.col("n_del"), F.col("c1"))
    ).withColumn(
        "rm2",
        F.when(
            F.col("bmin") == F.col("bmax"), F.lit(0)
        ).otherwise(F.least(F.col("n_del") - F.col("rm1"), F.col("c2"))),
    )
    removals = (
        p.select(F.col("bmin").alias("bucket"), "fp", F.col("rm1").alias("n_rm"))
        .unionByName(
            p.select(F.col("bmax").alias("bucket"), "fp", F.col("rm2").alias("n_rm"))
        )
        .filter(F.col("n_rm") > 0)
        .groupBy("bucket", "fp")
        .agg(F.sum("n_rm").alias("n_rm"))
    )
    # rewrite ONLY touched buckets: explode -> drop n_rm instances -> refold
    touched = removals.select("bucket").distinct()
    keep_rows = (
        inst.join(touched, "bucket")
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("bucket", "fp").orderBy(F.lit(1))),
        )
        .join(removals, ["bucket", "fp"], "left")
        .filter(F.col("rk") > F.coalesce("n_rm", F.lit(0)))
        .groupBy("bucket")
        .agg(F.array_sort(F.collect_list("fp")).alias("fps"))
    )
    new_filt = (
        filt.join(touched, "bucket", "left_anti")
        .unionByName(keep_rows)
    )
    new_overflow = overflow.join(d0, "sha_int", "left_anti")
    return new_filt, new_overflow


def filter_unseen_cuckoo(
    candidates: DataFrame,
    seen: DataFrame,
    filt: DataFrame,
    overflow: DataFrame,
    m_buckets: int = DEFAULT_M_BUCKETS,
) -> DataFrame:
    """bloom.filter_unseen's linear single-anti-join shape with the
    cuckoo probe as the advisory prefilter: a candidate survives iff no
    seen row matches (sha equality AND _maybe_seen) — definitely-new
    rows short-circuit before any seen-table lookup, maybe-seen rows
    get the exact authoritative check. False positives can only cost a
    probe; false negatives are impossible for inserted keys."""
    seen_keys = seen.select("sha_int").hint("shuffle_hash")
    probed = probe_cuckoo(candidates, filt, overflow, m_buckets)
    cond = (probed["sha_int"] == seen_keys["sha_int"]) & probed["_maybe_seen"]
    return probed.join(seen_keys, cond, "left_anti").drop("_maybe_seen")


def insert_keys(
    filt: DataFrame,
    overflow: DataFrame,
    new_keys: DataFrame,
    m_buckets: int = DEFAULT_M_BUCKETS,
    slots: int = SLOTS_PER_BUCKET,
) -> tuple[DataFrame, DataFrame]:
    """Incremental insert of a round's NEW keys into an existing filter
    — the full lifecycle the bloom's append-only LSM segments
    approximate: one mutable filter, O(delta + touched buckets) per
    round, no per-round segment list for the probe to walk and no
    compaction debt. Same two-phase deterministic placement as
    build_cuckoo, but each phase ranks against the bucket's REMAINING
    capacity (slots - existing fingerprints); only buckets that
    actually receive a fingerprint are rewritten. Keys that fit
    neither bucket append to the exact overflow stash.

    Not bit-identical to rebuilding from the union (a fresh build
    ranks all keys together; incremental placement favors incumbents)
    — irrelevant to the contract: membership, FPR, slot caps, and
    delete semantics hold identically, which is what the tests pin."""
    _check_m(m_buckets)
    occ = filt.select("bucket", F.size("fps").alias("used"))
    d = _with_slots(new_keys.select("sha_int"), m_buckets).localCheckpoint(
        eager=False
    )
    w1 = Window.partitionBy("b1").orderBy("sha_int")
    r1 = (
        d.join(occ.withColumnRenamed("bucket", "b1"), "b1", "left")
        .withColumn("rk1", F.row_number().over(w1))
        .withColumn("cap1", F.lit(slots) - F.coalesce("used", F.lit(0)))
    )
    placed1 = r1.filter(F.col("rk1") <= F.col("cap1")).select(
        F.col("b1").alias("bucket"), "fp", "sha_int"
    )
    # capacity consumed in this round's phase 1, per bucket
    used1 = placed1.groupBy("bucket").agg(F.count("*").alias("u1"))
    spill = r1.filter(F.col("rk1") > F.col("cap1")).drop("used", "rk1", "cap1")
    w2 = Window.partitionBy("b2").orderBy("sha_int")
    r2 = (
        spill.join(occ.withColumnRenamed("bucket", "b2"), "b2", "left")
        .join(used1.withColumnRenamed("bucket", "b2"), "b2", "left")
        .withColumn("rk2", F.row_number().over(w2))
        .withColumn(
            "cap2",
            F.lit(slots)
            - F.coalesce("used", F.lit(0))
            - F.coalesce("u1", F.lit(0)),
        )
    )
    placed2 = r2.filter(F.col("rk2") <= F.col("cap2")).select(
        F.col("b2").alias("bucket"), "fp", "sha_int"
    )
    new_overflow = overflow.unionByName(
        r2.filter(F.col("rk2") > F.col("cap2")).select("sha_int")
    )
    adds = placed1.unionByName(placed2).select("bucket", "fp")
    touched = adds.select("bucket").distinct()
    merged = (
        filt.join(touched, "bucket")
        .select("bucket", F.explode("fps").alias("fp"))
        .unionByName(adds)
        .groupBy("bucket")
        .agg(F.array_sort(F.collect_list("fp")).alias("fps"))
    )
    new_filt = filt.join(touched, "bucket", "left_anti").unionByName(merged)
    return new_filt, new_overflow
