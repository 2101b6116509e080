"""Round-3 batch XII: link-graph analytics (anchor text, host degrees),
leakage-safe dataset splits, dedup cluster reporting, entropy gating,
and image recompression planning (each also oracle-checked in
test_queries_oracle.py — these pin the BEHAVIORAL invariants the hash
alone doesn't state)."""

import math
from collections import defaultdict

from pyspark.sql import functions as F

from crunchy_spark.queries import (
    ENTROPY_LOW,
    LINK_FANOUT,
    N_LINK_HOSTS,
    QUERIES,
    RECOMP_MIN_DIM,
    RECOMP_PNG_PIXELS,
    SPLIT_TEST_LT,
    SPLIT_VAL_LT,
    _link_edges,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_link_edges_shape(spark):
    docs = _docs(spark).select("doc_id", "text")
    n = docs.count()
    e = _link_edges(docs).collect()
    # every page emits LINK_FANOUT outlinks minus any self-link drops
    assert n * (LINK_FANOUT - 1) < len(e) <= n * LINK_FANOUT
    for r in e[:200]:
        assert r["src"] != r["dst"]
        assert 0 <= r["dst"] < n  # every dst is a real page id
        assert r["anchor"]  # docs have >= 10 tokens, k <= 3
        assert r["src_host"].startswith("h")


def test_anchor_text_agg_invariants(spark):
    rows = QUERIES["anchor_text_agg"](spark, SF).collect()
    docs_n = _docs(spark).count()
    # one row per linked-to target, and the affine fanout map touches
    # nearly every page
    assert len(rows) == len({r["doc_id"] for r in rows})
    assert len(rows) > 0.9 * docs_n
    for r in rows:
        assert 1 <= r["top_anchor_freq"] <= r["n_inlinks"]
        assert 1 <= r["n_anchors"] <= r["n_inlinks"]
        assert 1 <= r["n_src_hosts"] <= min(r["n_inlinks"], N_LINK_HOSTS)
    # anchors are source-page tokens: spot-check one target against a
    # recomputed edge set
    docs = _docs(spark).select("doc_id", "text")
    e = _link_edges(docs)
    t0 = rows[0]["doc_id"]
    anchors = [r["anchor"] for r in e.filter(F.col("dst") == t0).collect()]
    by_freq = defaultdict(int)
    for a in anchors:
        by_freq[a] += 1
    best = max(by_freq.items(), key=lambda kv: (kv[1], [-ord(c) for c in kv[0]]))
    # row_number tie-break is (freq desc, anchor asc)
    top = min(
        (a for a, f in by_freq.items() if f == max(by_freq.values()))
    )
    assert rows[0]["top_anchor"] == top
    assert rows[0]["top_anchor_freq"] == by_freq[top] == best[1]


def test_host_degree_stats_conservation(spark):
    rows = QUERIES["host_degree_stats"](spark, SF).collect()
    assert len(rows) <= N_LINK_HOSTS
    tot_out = sum(r["out_edges"] for r in rows)
    tot_in = sum(r["in_edges"] for r in rows)
    assert tot_out == tot_in  # every edge leaves one host and enters one
    for r in rows:
        assert r["out_hosts"] <= min(r["out_edges"], N_LINK_HOSTS)
        assert r["in_hosts"] <= min(r["in_edges"], N_LINK_HOSTS)


def test_dataset_split_leakage_safe(spark):
    rows = QUERIES["dataset_split_assign"](spark, SF).collect()
    n = len(rows)
    assert n == _docs(spark).count()
    split_of_fp: dict[int, str] = {}
    counts = defaultdict(int)
    for r in rows:
        assert 0 <= r["bucket"] < 100
        expected = (
            "test"
            if r["bucket"] < SPLIT_TEST_LT
            else "val" if r["bucket"] < SPLIT_VAL_LT else "train"
        )
        assert r["split"] == expected
        # leakage invariant: equal content hash => equal split
        prev = split_of_fp.setdefault(r["content_fp"], r["split"])
        assert prev == r["split"]
        counts[r["split"]] += 1
    # ~98/1/1 with hash noise at 500 docs
    assert counts["train"] > 0.9 * n
    assert counts["train"] + counts["val"] + counts["test"] == n
    # the fixture corpus HAS exact dup groups (designed); they co-locate
    fp_multi = defaultdict(set)
    for r in rows:
        fp_multi[r["content_fp"]].add(r["doc_id"])
    assert any(len(v) > 1 for v in fp_multi.values())


def test_neardup_cluster_stats_accounts_for_corpus(spark):
    rows = QUERIES["neardup_cluster_stats"](spark, SF).collect()
    n = _docs(spark).count()
    assert sum(r["n_docs"] for r in rows) == n  # histogram tiles the corpus
    for r in rows:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
    sizes = {r["cluster_size"] for r in rows}
    assert 1 in sizes and max(sizes) >= 2  # singletons plus real clusters
    # removal accounting: docs - clusters = rows dedup deletes
    n_clusters = sum(r["n_clusters"] for r in rows)
    removed = n - n_clusters
    assert removed > 0


def test_token_entropy_bounds_and_flags(spark):
    rows = QUERIES["token_entropy_quality"](spark, SF).collect()
    assert len(rows) == _docs(spark).count()
    for r in rows:
        assert r["n_distinct"] <= r["n_tokens"]
        assert r["entropy"] >= 0
        if r["n_distinct"] > 1:
            # H <= ln(n_distinct), so norm in (0, 1] (+rounding slack)
            assert 0 < r["norm_entropy"] <= 1.0001
            assert r["is_low_entropy"] == (r["norm_entropy"] < ENTROPY_LOW)
            # uniform-distribution cross-check on an all-distinct doc
            if r["n_distinct"] == r["n_tokens"]:
                assert abs(r["entropy"] - math.log(r["n_tokens"])) < 1e-3
                assert r["norm_entropy"] >= 0.999


def test_image_recompress_plan_partitions_and_saves(spark):
    rows = QUERIES["image_recompress_plan"](spark, SF).collect()
    meta = spark.read.parquet(
        "/root/repo/fixtures/images_meta.parquet"
    ).collect()
    assert len(rows) == len(meta)
    by_action = defaultdict(list)
    for r in rows:
        by_action[r["action"]].append(r)
        assert r["decoded_bytes"] == r["w"] * r["h"] * 3
        assert 0 <= r["est_stored_bytes"] <= r["decoded_bytes"]
    for r in by_action["drop_small"]:
        assert r["w"] < RECOMP_MIN_DIM or r["h"] < RECOMP_MIN_DIM
        assert r["est_stored_bytes"] == 0
    for r in by_action["recompress_jpeg"]:
        assert r["fmt"] == "png" and r["w"] * r["h"] >= RECOMP_PNG_PIXELS
    # fixture dims (32..128 x 32..64) must exercise every branch
    assert by_action["drop_small"] and by_action["recompress_jpeg"]
    assert by_action["keep"]
    # the plan must actually save IO vs storing everything as-is
    saved = sum(r["decoded_bytes"] - r["est_stored_bytes"] for r in rows)
    assert saved > 0


def test_batch12_oracles_at_driver_scale(spark):
    """Driver-gate mirror at sf0.01 for batch XII (the pytest oracle
    suite runs at sf0.001; ties/caps can differ between scales)."""
    from crunchy_spark.queries import ORACLES
    from tests.oracle_util import compare, duck_conn

    sf01 = "/root/testdata/sf0.01"
    con = duck_conn(sf01)
    for name in (
        "anchor_text_agg",
        "host_degree_stats",
        "dataset_split_assign",
        "neardup_cluster_stats",
        "token_entropy_quality",
        "image_recompress_plan",
    ):
        compare(QUERIES[name](spark, sf01), con, ORACLES[name], name)
