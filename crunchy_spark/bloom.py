"""Partitioned Bloom-bitmap URL-seen filter.

PySpark doesn't expose Catalyst's BloomFilterAggregate, so the bitmaps
are built as ``array<long>`` word columns by Arrow-vectorized
applyInPandas over sha_int keys, partitioned into buckets
(``pmod(sha_int, n_buckets)``) so each bitmap stays small and the whole
filter is broadcast/bucket-joinable. Merging two filters is a per-bucket
bitwise OR — exactly the "broadcast-mergeable bitmap columns" from the
north_star.

The PROBE is pure JVM: candidates equi-join their bucket's word array
(auto-broadcast at fixture scale — 32 buckets x 128 KiB = 4 MB; a
shuffle-hash bucket join at 10^10-key scale where the filter is ~12.5 GB)
and the k bit tests are whole-stage-codegen'd shift expressions. No
Python, no Arrow channel, no per-row anything in the hot path — the
Python side only ever builds/merges bitmaps (once per round, vectorized
numpy over the delta keys).

The bloom is ADVISORY ONLY: "definitely unseen" candidates skip the exact
anti-join; "maybe seen" candidates are confirmed with an exact left_anti
join on sha_int (false positives must never drop URLs — SURVEY.md §7.4).
Reference analog: the vestigial request-fingerprint dupefilter
(rabbitmq/dupefilter.py:35-44) + the Mongo existence checks
(similar_companies.py:49-68) — here collapsed into one scalable filter.

Sizing: bits_per_key=10, k=7 -> ~0.8% false-positive rate; at 10^10 keys
that's ~12.5 GB of bitmap split across buckets (each executor holds only
its buckets via the bucket join), with the exact anti-join only touching
the ~1% maybe-seen stragglers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_SCHEMA = "bucket int, words array<long>, n_keys long"
K_HASHES = 7
DEFAULT_N_BUCKETS = 32
DEFAULT_M_BITS = 1 << 20  # per-bucket bits (128 KiB) — fixture scale


def _indices(shas: np.ndarray, m_bits: int) -> np.ndarray:
    """(n, K_HASHES) bit indices via double hashing: h1 + i*h2 mod m.

    h1 skips the low 5 sha bits: buckets are pmod(sha, n_buckets) with
    n_buckets <= 32, so within a bucket the low 5 bits are (near-)
    constant — deriving h1 from them would pin the first probe bit to a
    1/32 slice of the pow2-width bitmap and inflate the effective FPR
    past the bits/key sizing math. Must stay in lockstep with
    _probe_tests."""
    h1 = (shas >> 5) & 0xFFFFFFFF
    h2 = ((shas >> 28) | 1) & 0xFFFFFFFF
    i = np.arange(K_HASHES, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def _bits_to_words(bits: np.ndarray) -> list[int]:
    """uint8 bitmap -> little-endian int64 words (bit g of the bitmap is
    bit g%64 of word g//64 — the layout the JVM probe expressions use)."""
    return bits.view("<u8").view(np.int64).tolist()


def adaptive_m_bits(
    n_keys: int, n_buckets: int = DEFAULT_N_BUCKETS, bits_per_key: int = 10
) -> int:
    """Per-bucket bitmap width sized to the key count (pow2, >= 2^14):
    round-delta blooms stay delta-sized instead of base-sized — the
    LSM/SSTable per-segment-filter discipline."""
    per_bucket = max(1, (n_keys * bits_per_key) // max(1, n_buckets))
    return 1 << max(14, per_bucket.bit_length())


def build_bloom(
    keys: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    m_bits: int = DEFAULT_M_BITS,
) -> DataFrame:
    """keys: DataFrame with a sha_int column -> one words row per bucket."""

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        shas = pdf["sha_int"].to_numpy(dtype=np.uint64)
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        idx = _indices(shas, m_bits).ravel()
        np.bitwise_or.at(bits, idx // 8, (1 << (idx % 8)).astype(np.uint8))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["_bucket"].iloc[0])],
                "words": [_bits_to_words(bits)],
                "n_keys": [len(pdf)],
            }
        )

    keyed = keys.select("sha_int").withColumn(
        "_bucket", F.pmod(F.col("sha_int"), F.lit(n_buckets)).cast("int")
    )
    return keyed.groupBy("_bucket").applyInPandas(make, schema=BLOOM_SCHEMA)


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-bucket bitwise OR of two filters (the mergeable-bitmap agg)."""

    def orit(pdf: pd.DataFrame) -> pd.DataFrame:
        acc: np.ndarray | None = None
        for words in pdf["words"]:
            arr = np.asarray(words, dtype=np.int64)
            acc = arr.copy() if acc is None else np.bitwise_or(acc, arr)
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "words": [acc.tolist()],
                "n_keys": [int(pdf["n_keys"].sum())],
            }
        )

    return a.unionByName(b).groupBy("bucket").applyInPandas(orit, schema=BLOOM_SCHEMA)


def probe_bloom(
    candidates: DataFrame, bloom: DataFrame | list[DataFrame], n_buckets: int
) -> DataFrame:
    """Adds a `_maybe_seen` column via JVM-only bucket join(s) + bit
    tests.

    ``bloom`` may be a single filter or a LIST of segment filters (the
    LSM/SSTable pattern: one delta bloom per crawl round, each sized to
    its own key count — see the engine's delta commits). A key is
    maybe-seen if ANY segment reports it; each segment gets its own
    bucket join + test column, so one candidate row flows through
    len(segments) sequential joins — no aggregate, no join-back, all
    whole-stage-codegen. The per-segment bitmap reaches executors once
    per bucket through its join (auto-broadcast under the threshold,
    shuffle-hash above); overall FPR ~ sum of per-segment FPRs, bounded
    by compaction folding segments back into one filter."""
    segments = bloom if isinstance(bloom, list) else [bloom]
    if not segments:
        # no filter committed yet: nothing can be seen; keep the column
        # contract so callers' branch logic works unchanged
        return candidates.withColumn("_maybe_seen", F.lit(False))
    # probe-side hashes computed ONCE per candidate row and shared by all
    # K tests of every segment (the per-test expression tree otherwise
    # re-derives both from sha_int — 4 shifts/masks times K times
    # segments, and Janino's generated code does not CSE across the
    # CASE WHEN branches; measured 2.2us/row before, ~0.1us after)
    ckeyed = candidates.withColumn(
        "_bucket", F.pmod(F.col("sha_int"), F.lit(n_buckets)).cast("int")
    ).withColumns(
        {
            "_h1": F.expr("shiftright(sha_int, 5) & 4294967295"),
            "_h2": F.expr("(shiftright(sha_int, 28) | 1) & 4294967295"),
        }
    )
    tests = []
    j = ckeyed
    for i, seg in enumerate(segments):
        b = seg.select(
            F.col("bucket").alias("_bucket"), F.col("words").alias(f"_w{i}")
        )
        j = j.join(b, "_bucket", "left")
        t = F.when(F.col(f"_w{i}").isNull(), F.lit(False)).otherwise(
            _probe_tests(f"_w{i}", _segment_m_bits(seg))
        )
        tests.append(t)
    maybe = tests[0]
    for t in tests[1:]:
        maybe = maybe | t
    return j.withColumn("_maybe_seen", maybe).drop(
        "_bucket", "_h1", "_h2", *[f"_w{i}" for i in range(len(segments))]
    )


def _segment_m_bits(seg: DataFrame) -> int | None:
    """A segment's bitmap width in bits, as a PLAN-TIME constant.

    Every constructor in this module (DEFAULT_M_BITS, adaptive_m_bits,
    merge_blooms of equal-width inputs) produces power-of-two widths, so
    the probe's `% m_bits` can compile to a bitmask instead of two int64
    divisions per test per row — the probe is the most-executed
    expression in the engine, and the div units are what it stalls on.
    One O(n_buckets)-row job per probe call fetches the width; returns
    None (dynamic-width fallback) for an empty or non-pow2 segment."""
    row = seg.select(F.size(F.col("words")).alias("n")).first()
    if row is None or row["n"] is None or row["n"] <= 0:
        return None
    m_bits = int(row["n"]) * 64
    return m_bits if (m_bits & (m_bits - 1)) == 0 else None


def _probe_tests(words_col: str = "words", m_bits: int | None = None) -> F.Column:
    """The K_HASHES AND-ed bit tests, mirroring _indices: idx_i =
    (_h1 + i*_h2) % m_bits, bit = (words[idx div 64] >> (idx % 64)) & 1,
    with _h1/_h2 precomputed by probe_bloom (h1 skips the bucket-
    correlated low 5 sha bits — see _indices).

    When ``m_bits`` is a known power of two (every filter this module
    builds), the index math is pure shift/mask: idx = h & (m_bits-1),
    word = idx >> 6, bit = idx & 63. Otherwise falls back to the
    dynamic-width pmod form (size(words)*64 per row).
    shiftright's arithmetic sign-fill is harmless — only bit 0 of the
    shifted value is read."""
    w = words_col
    tests = []
    for i in range(K_HASHES):
        if m_bits is not None:
            idx_sql = f"((_h1 + {i} * _h2) & {m_bits - 1})"
            word_ix = f"cast(shiftright({idx_sql}, 6) as int) + 1"
            bit_ix = f"cast(({idx_sql} & 63) as int)"
        else:
            idx_sql = f"pmod((_h1 + {i} * _h2), size({w}) * cast(64 as bigint))"
            word_ix = f"cast(({idx_sql}) div 64 as int) + 1"
            bit_ix = f"cast(({idx_sql}) % 64 as int)"
        tests.append(
            f"(shiftright(element_at({w}, {word_ix}), {bit_ix}) & 1) = 1"
        )
    return F.expr("(" + ") AND (".join(tests) + ")")


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: DataFrame | list[DataFrame] | None = None,
    use_bloom: bool = True,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> DataFrame:
    """Candidates not in the seen set (J11: bloom pre-filter + exact
    anti-join as the authoritative check)."""
    # no distinct(): left_anti ignores right-side key multiplicity, and the
    # engine's seen table is unique by construction — a distinct here would
    # add a full exchange of the seen set per round for nothing.
    # shuffle_hash hint: the seen side is the frontier's whole history —
    # far beyond broadcast size at 10^10 keys, and even locally the
    # broadcast hash build is a serial driver cost that caps scaling;
    # a shuffled hash join builds per-partition tables in parallel.
    seen_keys = seen.select("sha_int").hint("shuffle_hash")
    if not use_bloom or bloom is None:
        return candidates.join(seen_keys, "sha_int", "left_anti")
    # ONE anti-join with a compound condition instead of a plan branch:
    # left_anti keeps a row iff NO right row satisfies the condition, so
    #   _maybe_seen = false  -> condition false for every seen row -> kept
    #   _maybe_seen = true   -> kept iff sha_int not in seen (exact check)
    # — identical semantics to union(definitely_new, anti_join(maybe)),
    # but the plan stays LINEAR: no second consumer of the probed set, so
    # no materialization barrier. The branched form needed a DISK_ONLY
    # localCheckpoint of every probed row (write + 2x read of the whole
    # round, an extra job pass, and the round's biggest memory-bandwidth
    # consumer once cores stop being the bottleneck); the single join
    # replaces that with one hash probe per row whose equality key
    # (sha_int) is the SAME key the first_arrival aggregate upstream just
    # hash-partitioned on, so the left side reuses that exchange and only
    # the (10^2-10^3x smaller) seen keys shuffle. The bloom still does
    # its job inside the probe: a definitely-new row fails the
    # _maybe_seen conjunct before any seen-table lookup cost matters, and
    # the hash table itself is per-partition (shuffle_hash, built in
    # parallel — never a serial driver broadcast of the crawl history).
    probed = probe_bloom(candidates, bloom, n_buckets)
    cond = (probed["sha_int"] == seen_keys["sha_int"]) & probed["_maybe_seen"]
    return probed.join(seen_keys, cond, "left_anti").drop("_maybe_seen")
