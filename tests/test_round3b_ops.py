"""Behavior tests for the round-3b batch (beyond the oracle equality
the driver checks): trap flags hit only the minted-URL templates,
mirror detection finds exactly the planted mirrors, budget allocation
is exact, DSIR excludes the target language, SemDedup's dup marks are
witnessed by a real lower-id cosine mate."""

import numpy as np
from pyspark.sql import functions as F

from crunchy_spark.queries import (
    BUDGET_TOTAL,
    DSIR_TARGET_LANG,
    DSIR_TOPK,
    SEMDEDUP_TAU,
    crawl_budget_alloc,
    dsir_select,
    mirror_host_detect,
    semdedup_prune,
    url_trap_detect,
)

SF = "/root/testdata/sf0.001"


def test_trap_templates_only(spark):
    rows = url_trap_detect(spark, SF).collect()
    traps = [r for r in rows if r.is_trap]
    assert traps, "trap hosts must be flagged"
    # every flagged template is the minted-per-order calendar pattern,
    # and every healthy 20-page template stays unflagged
    assert all(r.template == "/cal/N/day" for r in traps)
    assert all(not r.is_trap for r in rows if r.template == "/page/N")
    # trap evidence: ~every hit minted a fresh URL
    assert all(r.n_urls == r.n_hits for r in traps)


def test_mirror_pairs_are_planted(spark):
    rows = mirror_host_detect(spark, SF).collect()
    assert rows, "planted mirrors must be found"
    for r in rows:
        assert r.host_b == r.host_a + "m", r
        # the mirror serves a strict subset of the base host's docs
        assert r.n_shared == r.n_b
        assert 0 < r.jac < 1


def test_budget_alloc_exact(spark):
    rows = crawl_budget_alloc(spark, SF).collect()
    assert sum(r.alloc for r in rows) == BUDGET_TOTAL
    tot = sum(r.score_c for r in rows)
    for r in rows:
        base = BUDGET_TOTAL * r.score_c // tot
        assert r.alloc in (base, base + 1), r


def test_dsir_pool_and_rank(spark):
    df = dsir_select(spark, SF)
    rows = df.collect()
    assert 0 < len(rows) <= DSIR_TOPK
    assert sorted(r.rnk for r in rows) == list(range(1, len(rows) + 1))
    # no target-language doc may appear in the selected pool
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    target_ids = {
        r.doc_id
        for r in docs.filter(F.col("lang") == DSIR_TARGET_LANG).collect()
    }
    assert not target_ids & {r.doc_id for r in rows}
    # ranking is by (score desc, doc_id): verify monotone
    ordered = sorted(rows, key=lambda r: r.rnk)
    for a, b in zip(ordered, ordered[1:]):
        assert (a.score, -a.doc_id) >= (b.score, -b.doc_id)


def test_semdedup_dup_witness(spark):
    out = {r.vec_id: r for r in semdedup_prune(spark, SF).collect()}
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    assert set(out) == set(emb)  # one decision per vector
    dups = [v for v in out.values() if v.is_dup]
    assert dups, "corpus has cos>=tau cluster-mates; some must be pruned"

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    by_cluster: dict[int, list[int]] = {}
    for v in out.values():
        by_cluster.setdefault(v.cluster, []).append(v.vec_id)
    for v in dups:
        mates = [
            m for m in by_cluster[v.cluster] if m < v.vec_id
        ]
        assert any(
            round(cos(emb[v.vec_id], emb[m]), 4) >= SEMDEDUP_TAU for m in mates
        ), f"dup {v.vec_id} has no witnessing lower-id mate"
    # and kept rows have NO lower-id witness in their cluster
    kept = [v for v in out.values() if not v.is_dup]
    for v in kept[:50]:
        mates = [m for m in by_cluster[v.cluster] if m < v.vec_id]
        assert all(
            round(cos(emb[v.vec_id], emb[m]), 4) < SEMDEDUP_TAU for m in mates
        ), f"kept {v.vec_id} should have been marked dup"
