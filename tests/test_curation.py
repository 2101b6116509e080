"""Round-3 corpus-curation operators: connected-component semantics
(transitivity, singletons, convergence) and plan-shape guarantees
(PII scrub shuffle-free, decontamination probe broadcast)."""

import pytest
from pyspark.sql import functions as F

from crunchy_spark.queries import (
    QUERIES,
    _connected_components,
)

SF_DIR = "/root/testdata/sf0.001"


def _labels(spark, edges, nodes):
    e = spark.createDataFrame(edges, "u: long, v: long")
    n = spark.createDataFrame([(x,) for x in nodes], "node: long")
    out = _connected_components(n, e)
    return {r["node"]: r["comp"] for r in out.collect()}


def test_cc_transitive_chain(spark):
    # A-B and B-C near-dup pairs must land A, B, C in ONE component even
    # though (A, C) was never emitted as a pair — the property that makes
    # clustering more than pair listing.
    got = _labels(spark, [(1, 2), (2, 3)], [1, 2, 3, 9])
    assert got == {1: 1, 2: 1, 3: 1, 9: 9}


def test_cc_long_path_converges_in_log_rounds(spark):
    # a 33-node path is the worst case for plain min-propagation
    # (diameter rounds); pointer jumping must still converge inside the
    # helper's max_rounds=20 cap — and in far fewer rounds than 32.
    edges = [(i, i + 1) for i in range(32)]
    got = _labels(spark, edges, list(range(33)))
    assert set(got.values()) == {0}


def test_cc_two_clusters_and_singletons(spark):
    got = _labels(spark, [(10, 11), (11, 12), (20, 21)], [10, 11, 12, 20, 21, 30])
    assert got[10] == got[11] == got[12] == 10
    assert got[20] == got[21] == 20
    assert got[30] == 30


def test_neardup_components_cover_all_docs_once(spark):
    out = QUERIES["neardup_components"](spark, SF_DIR)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    # component id is always the min doc_id of its members
    bad = (
        out.groupBy("component_id")
        .agg(F.min("doc_id").alias("mn"))
        .filter(F.col("component_id") != F.col("mn"))
        .count()
    )
    assert bad == 0


def test_pii_redact_is_shuffle_free(spark):
    """The scrub must run at scan speed: scan -> project, no Exchange."""
    plan = (
        QUERIES["pii_redact"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_pii_redact_values(spark):
    rows = {
        r["doc_id"]: r
        for r in QUERIES["pii_redact"](spark, SF_DIR)
        .filter(F.col("doc_id").isin([0, 3, 5]))
        .collect()
    }
    # doc 0: contact block + alt phone (0 % 5 == 0) -> 1 email, 2 phones
    assert (rows[0]["n_emails"], rows[0]["n_phones"], rows[0]["n_ips"]) == (1, 2, 1)
    # doc 3: 3 % 4 == 3 -> no PII appended at all
    assert (rows[3]["n_emails"], rows[3]["n_phones"], rows[3]["n_ips"]) == (0, 0, 0)
    for pat in ("<EMAIL>", "<PHONE>", "<IP>"):
        assert pat in rows[0]["red_text"]
    assert "@mail.example.com" not in rows[0]["red_text"]
    assert "+44-202-555-0199" not in rows[0]["red_text"]


def test_decontaminate_broadcasts_probe_set(spark):
    plan = (
        QUERIES["benchmark_decontaminate"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan


def test_repetition_quality_metric_ranges_and_mix(spark):
    res = QUERIES["repetition_quality"](spark, SF_DIR)
    r = res.agg(
        F.min("dup_word_frac"), F.max("dup_word_frac"), F.sum(F.col("is_repetitive").cast("int"))
    ).collect()[0]
    assert 0.0 <= r[0] <= r[1] <= 1.0
    assert 0 < r[2] < res.count()  # mix of flagged and clean docs
