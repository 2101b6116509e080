"""Partitioned Bloom-bitmap URL-seen filter.

PySpark doesn't expose Catalyst's BloomFilterAggregate, so the bitmaps are
built as binary columns by Arrow-vectorized applyInPandas over sha_int
keys, partitioned into buckets (pmod(sha_int, n_buckets)) so each bitmap
stays small and the whole filter is broadcast/cogroup-joinable. Merging
two filters is a per-bucket bitwise OR — exactly the "broadcast-mergeable
bitmap columns" from the north_star.

The bloom is ADVISORY ONLY: "definitely unseen" candidates skip the exact
anti-join; "maybe seen" candidates are confirmed with an exact left_anti
join on sha_int (false positives must never drop URLs — SURVEY.md §7.4).
Reference analog: the vestigial request-fingerprint dupefilter
(rabbitmq/dupefilter.py:35-44) + the Mongo existence checks
(similar_companies.py:49-68) — here collapsed into one scalable filter.

Sizing: bits_per_key=10, k=7 -> ~0.8% false-positive rate; at 10^10 keys
that's ~12.5 GB of bitmap split across buckets (each executor holds only
its buckets via the cogroup), with the exact anti-join only touching the
~1% maybe-seen stragglers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOOM_SCHEMA = "bucket int, bitmap binary, n_keys long"
K_HASHES = 7
DEFAULT_N_BUCKETS = 32
DEFAULT_M_BITS = 1 << 20  # per-bucket bits (128 KiB) — fixture scale


def _indices(shas: np.ndarray, m_bits: int) -> np.ndarray:
    """(n, K_HASHES) bit indices via double hashing: h1 + i*h2 mod m."""
    h1 = shas & 0xFFFFFFFF
    h2 = ((shas >> 28) | 1) & 0xFFFFFFFF
    i = np.arange(K_HASHES, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def build_bloom(
    keys: DataFrame,
    n_buckets: int = DEFAULT_N_BUCKETS,
    m_bits: int = DEFAULT_M_BITS,
) -> DataFrame:
    """keys: DataFrame with a sha_int column -> one bitmap row per bucket."""

    def make(pdf: pd.DataFrame) -> pd.DataFrame:
        shas = pdf["sha_int"].to_numpy(dtype=np.uint64)
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        idx = _indices(shas, m_bits).ravel()
        np.bitwise_or.at(bits, idx // 8, (1 << (idx % 8)).astype(np.uint8))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["_bucket"].iloc[0])],
                "bitmap": [bits.tobytes()],
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
        for buf in pdf["bitmap"]:
            arr = np.frombuffer(bytes(buf), dtype=np.uint8)
            acc = arr.copy() if acc is None else np.bitwise_or(acc, arr)
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0])],
                "bitmap": [acc.tobytes()],
                "n_keys": [int(pdf["n_keys"].sum())],
            }
        )

    return a.unionByName(b).groupBy("bucket").applyInPandas(orit, schema=BLOOM_SCHEMA)


def probe_bloom(candidates: DataFrame, bloom: DataFrame, n_buckets: int) -> DataFrame:
    """Adds a `_maybe_seen` column via cogrouped per-bucket probing (the
    bitmap crosses the Arrow channel once per bucket, not once per row)."""

    def probe(cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return pd.DataFrame({"sha_int": [], "_maybe_seen": []}).astype(
                {"sha_int": "int64", "_maybe_seen": "bool"}
            )
        shas = cand_pdf["sha_int"].to_numpy(dtype=np.uint64)
        if bloom_pdf.empty:
            maybe = np.zeros(len(shas), dtype=bool)
        else:
            bits = np.frombuffer(bytes(bloom_pdf["bitmap"].iloc[0]), dtype=np.uint8)
            idx = _indices(shas, int(len(bits) * 8))
            hit = (bits[idx // 8] >> (idx % 8).astype(np.uint8)) & 1
            maybe = hit.all(axis=1).astype(bool)
        return pd.DataFrame({"sha_int": shas.astype(np.int64), "_maybe_seen": maybe})

    ckeyed = candidates.select("sha_int").withColumn(
        "_bucket", F.pmod(F.col("sha_int"), F.lit(n_buckets)).cast("int")
    )
    verdict = (
        ckeyed.groupBy("_bucket")
        .cogroup(bloom.groupBy("bucket"))
        .applyInPandas(lambda c, b: probe(c, b), schema="sha_int long, _maybe_seen boolean")
    )
    return candidates.join(verdict, "sha_int", "left").withColumn(
        "_maybe_seen", F.coalesce(F.col("_maybe_seen"), F.lit(False))
    )


def filter_unseen(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: DataFrame | None = None,
    use_bloom: bool = True,
    n_buckets: int = DEFAULT_N_BUCKETS,
) -> DataFrame:
    """Candidates not in the seen set (J11: bloom pre-filter + exact
    anti-join as the authoritative check)."""
    seen_keys = seen.select("sha_int").distinct()
    if not use_bloom or bloom is None:
        return candidates.join(seen_keys, "sha_int", "left_anti")
    probed = probe_bloom(candidates, bloom, n_buckets)
    definitely_new = probed.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    maybe = probed.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    confirmed_new = maybe.join(seen_keys, "sha_int", "left_anti")
    return definitely_new.unionByName(confirmed_new)
