"""Banded perceptual-hash near-dup: exactness vs brute force, committed
fixture sync, and plan hygiene."""

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from crunchy_spark import datagen
from crunchy_spark.queries import (
    _IMAGES_META,
    PHASH_THRESH,
    phash_band_pairs,
)


def _meta_df(spark):
    return spark.read.parquet(_IMAGES_META).select("image_id", "phash")


def test_committed_fixture_matches_datagen():
    """fixtures/images_meta.parquet is exactly gen_images_pdf(256) minus
    bytes — the oracle and the engine read the same deterministic data."""
    committed = pq.read_table(_IMAGES_META).to_pandas()
    regen = datagen.gen_images_pdf(256).drop(columns=["bytes"])
    assert list(committed.columns) == list(regen.columns)
    for col in committed.columns:
        assert committed[col].tolist() == regen[col].tolist(), col


def test_fixture_has_neardup_structure():
    committed = pq.read_table(_IMAGES_META).to_pandas()
    ph = committed["phash"].tolist()
    close = sum(
        1
        for i in range(len(ph))
        for j in range(i + 1, len(ph))
        if bin(ph[i] ^ ph[j]).count("1") <= PHASH_THRESH
    )
    assert close >= 40  # designed pairs exist (55 at threshold 7)


def test_banded_equals_bruteforce(spark):
    """Pigeonhole exactness: 8 disjoint 8-bit bands generate every pair
    at Hamming <= 7, so banded == all-pairs at that threshold."""
    meta = _meta_df(spark)
    banded = {
        (r["a_id"], r["b_id"], r["hamming"])
        for r in phash_band_pairs(meta, PHASH_THRESH).collect()
    }
    a = meta.select(F.col("image_id").alias("a_id"), F.col("phash").alias("pa"))
    b = meta.select(F.col("image_id").alias("b_id"), F.col("phash").alias("pb"))
    brute = {
        (r["a_id"], r["b_id"], r["hamming"])
        for r in a.join(b, F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= PHASH_THRESH)
        .collect()
    }
    assert banded == brute
    assert len(banded) > 40


def test_banded_plan_has_no_cross_join(spark):
    plan = (
        phash_band_pairs(_meta_df(spark), PHASH_THRESH)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fixture_path_is_repo_relative():
    assert os.path.exists(_IMAGES_META)
