"""Plan-shape regression tests: the scale arguments in PLANS.md are
enforced, not just claimed — shuffle (Exchange) counts, broadcast
usage, TakeOrderedAndProject, and the absence of cartesian products
are asserted on the executed plans of the round-3 operators."""

import re

import pytest

from crunchy_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def _shuffles(plan: str) -> int:
    return len(
        re.findall(
            r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)", plan
        )
    )


# (query, max_shuffles, forbid_cartesian)
SHAPES = [
    ("events_asof_join", 1, True),
    ("stratified_sample", 0, True),
    ("corpus_mix_temperature", 2, True),
    ("caption_pixels_corr", 1, True),
    ("event_value_quantiles", 1, True),
    ("vocab_topk", 2, True),
    ("image_caption_quality_filter", 0, True),
    # aspect bucketing: per-row argmin projection + one map-side-
    # combinable agg — exactly one exchange, no joins at all
    ("aspect_bucket_batches", 1, True),
    # recrawl: lag window + agg both keyed on page — ONE exchange total
    ("recrawl_schedule", 1, True),
    # batch XII: link evidence aggs are dst/host-keyed (countDistinct
    # expands two-phase); splits/recompress are pure projections
    ("anchor_text_agg", 4, True),
    ("host_degree_stats", 4, True),
    ("dataset_split_assign", 0, True),
    ("token_entropy_quality", 2, True),
    ("image_recompress_plan", 0, True),
    # batch XIII: vocab/centroid/degree sides are bounded -> broadcast;
    # corpus-sized aggs stay keyed and map-side combinable
    ("oov_rate", 2, True),
    ("host_lang_mix", 2, True),
    ("link_priority_score", 7, True),
    # visible plan after the checkpointed cosine subtree: one label agg
    ("embedding_outlier_flag", 1, True),
    # link_priority_score's 7 plus one host-keyed window exchange
    ("frontier_next_fetch", 8, True),
    # KMV sketch diag: the only corpus-sized work is the distinct
    # (type, hash) agg + the evaluation-only exact pair join; the
    # pair skeleton is a types^2-bounded broadcast nested loop
    ("kmv_intersect_diag", 9, True),
    # chunking is a zero-exchange explode+projection; the holdout is
    # one dedup agg + one lang-keyed WindowGroupLimit rank
    ("chunk_split", 0, True),
    ("eval_holdout_sample", 2, True),
    # four doc-keyed joins of the constituent gate tables + 11-bin agg
    ("quality_calibration", 6, True),
    # ONE user-keyed window exchange (rank/count/agg all share it)
    ("user_engagement_ewma", 1, True),
    # ONE source-keyed window over the scored projection
    ("source_relative_quality", 1, True),
    # agreement table's plan + the 1-row four-count fold
    ("dedup_tier_kappa", 4, True),
    # K=3 user-keyed step aggregates + the distinct-user spine joins
    ("funnel_conversion", 6, True),
    # cohort assignment + (user, offset) distinct + cohort agg
    ("retention_cohorts", 5, True),
    # dedup'd host-edge table checkpointed; wedge+closing joins reuse it
    ("triangle_count_hosts", 1, True),
    # global top-K compiles to TakeOrderedAndProject — zero exchanges
    ("weighted_sample_aes", 0, True),
    # holdout mechanics + quota join (column-valued K: no WGL rewrite,
    # but the rank window stays lang-keyed)
    ("mix_rebalance_sample", 4, True),
    # census offsets + K-row bucket agg; the range exchange lives in
    # the checkpointed rank subtree (no SinglePartition anywhere)
    ("value_equidepth_buckets", 2, True),
    # ONE host-keyed agg collects ordered outcome arrays; the AIMD fold
    # is a Catalyst higher-order aggregate() — no Python stage, no join
    ("adaptive_crawl_delay", 1, True),
    # skip-pruned sitemap rows + broadcast robots policy + ONE host
    # window — a single exchange end to end (capstone composition)
    ("discovery_round_plan", 1, True),
]


def test_tfidf_df_never_rescans_corpus(spark):
    """df() aggregates over the tf table; the parquet scan of documents
    appears at most twice (tf branch + the count(*) for N), never a
    third time for df."""
    plan = _plan(spark, "tfidf_topk_terms")
    assert plan.count("Scan parquet") <= 2, plan
    assert "CartesianProduct" not in plan


def test_unigram_logprob_freq_join_not_cartesian(spark):
    plan = _plan(spark, "unigram_logprob_quality")
    assert "CartesianProduct" not in plan
    # the single-row total rides a broadcast
    assert "BroadcastExchange" in plan, plan
    # freq, total, and scoring all derive from the materialized tf
    # table — the corpus text is scanned and exploded exactly once
    assert plan.count("Scan parquet") <= 1, plan


@pytest.mark.parametrize("name,max_shuffles,no_cart", SHAPES)
def test_plan_shape(spark, name, max_shuffles, no_cart):
    plan = _plan(spark, name)
    assert _shuffles(plan) <= max_shuffles, plan
    if no_cart:
        assert "CartesianProduct" not in plan, plan


def test_asof_join_no_range_or_nested_loop(spark):
    """The as-of join must stay a single keyed window pass — no
    BroadcastNestedLoopJoin / range-join fallback ever."""
    plan = _plan(spark, "events_asof_join")
    assert "NestedLoop" not in plan
    assert "SortMergeJoin" not in plan and "HashJoin" not in plan
    assert plan.count("Window") >= 1


def test_bm25_topk_is_take_ordered(spark):
    plan = _plan(spark, "bm25_topk")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan
    # df() and the (N, avgdl) row ride broadcasts, never a shuffle join
    assert plan.count("BroadcastExchange") >= 2


def test_vocab_topk_never_globally_sorts_vocab(spark):
    plan = _plan(spark, "vocab_topk")
    assert "TakeOrderedAndProject" in plan, plan
    # the only Sort allowed is inside the tiny post-limit window
    assert "Exchange rangepartitioning" not in plan


def test_stratified_sample_pushes_scan_pruning(spark):
    """Zero exchanges AND the scan reads only the needed columns."""
    plan = _plan(spark, "stratified_sample")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"doc_id", "lang"}, cols


def test_url_trap_detect_single_agg_no_joins(spark):
    """Trap detection is one distinct-rewritten hash agg — no joins,
    no windows; exchanges only for the two-phase distinct count."""
    plan = _plan(spark, "url_trap_detect")
    assert "Join" not in plan, plan
    assert _shuffles(plan) <= 2, plan


def test_mirror_host_detect_no_cartesian(spark):
    """The host-pair join goes through the shingle equi-key (with the
    ubiquity cap), never a host x host product."""
    plan = _plan(spark, "mirror_host_detect")
    assert "CartesianProduct" not in plan, plan


def test_crawl_budget_alloc_windows_post_agg(spark):
    """Remainder ranking runs over the host-sized aggregate: the
    corpus is scanned once, and the single-row total rides a
    broadcast."""
    plan = _plan(spark, "crawl_budget_alloc")
    assert plan.count("Scan parquet") <= 1, plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoop" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dsir_select_take_ordered(spark):
    """The top-k cut is a TakeOrdered, never a global sort of the
    pool; the vocab join is a real join (no cartesian)."""
    plan = _plan(spark, "dsir_select")
    assert "TakeOrdered" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_semdedup_assignment_broadcasts_centroids(spark):
    """K-means assignment broadcasts the K centroid arrays; the
    corpus-side embeddings are never shuffled for it, and no plain
    cartesian product appears anywhere."""
    plan = _plan(spark, "semdedup_prune")
    assert "BroadcastNestedLoop" in plan or "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dup_span_single_explode(spark):
    """The window table is localCheckpointed: the documents parquet is
    scanned (and the K-gram array built) exactly once; the dup-gram agg
    and the flag-back join both read the materialized table. No
    cartesian anywhere."""
    plan = _plan(spark, "dup_span_detect")
    assert plan.count("Scan parquet") <= 1, plan
    assert "CartesianProduct" not in plan


def test_zipf_slope_vocab_window_only(spark):
    """One corpus-sized agg; rank window + regression never exchange
    more than twice; no joins at all."""
    plan = _plan(spark, "token_zipf_slope")
    assert _shuffles(plan) <= 2, plan
    assert "Join" not in plan, plan


def test_skew_diag_single_scan_topk(spark):
    """per_host is materialized (orders scanned once), totals ride a
    broadcast, final top-k is TakeOrderedAndProject — the hosts table
    is never globally sorted."""
    plan = _plan(spark, "skew_diagnostics")
    assert plan.count("Scan parquet") <= 1, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan


def test_pq_zero_shuffle_adc_topk(spark):
    """PQ is shuffle-free end-to-end: the dtable is a 1-row broadcast,
    ADC top-PQ_RERANK is TakeOrderedAndProject, and the re-rank joins
    the 32 survivor ids back by broadcast. The vec_id<>0 filter is
    pushed to the parquet scan."""
    plan = _plan(spark, "ann_pq_topk")
    assert _shuffles(plan) == 0, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Not(EqualTo(vec_id,0)" in plan, plan


def test_shard_plan_single_scan(spark):
    """per_host is materialized (orders scanned once); the rank window
    runs over the key-cardinality hosts table; totals ride a 1-row
    broadcast."""
    plan = _plan(spark, "frontier_shard_plan")
    assert plan.count("Scan parquet") <= 1, plan
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ivfpq_zero_shuffle_routed_adc(spark):
    """IVFPQ composes the IVF route and the PQ codes without adding a
    shuffle: probed cells and the dtable are broadcasts, ADC top-32 is
    TakeOrderedAndProject, re-rank joins survivors by broadcast."""
    plan = _plan(spark, "ann_ivfpq_topk")
    assert _shuffles(plan) == 0, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_host_hits_no_cartesian_broadcast_normalizers(spark):
    """HITS: edge joins against node-sized score tables are real joins
    (never cartesian); the 1-row L2 normalizers ride broadcasts. The
    localCheckpoint per half-step means the executed plan only shows
    the final join — iteration internals are checked by the oracle."""
    plan = _plan(spark, "host_hits")
    assert "CartesianProduct" not in plan


def test_bigram_logprob_single_corpus_scan(spark):
    """The tokenized corpus is localCheckpoint'd and feeds both
    explodes; the scoring subtree reads the materialized tfb table —
    no parquet re-scan of documents downstream of the checkpoint."""
    plan = _plan(spark, "bigram_logprob_quality")
    assert "CartesianProduct" not in plan
    # the 1-row grand total rides a broadcast
    assert "BroadcastExchange" in plan, plan
    # post-checkpoint there is no documents re-scan at all
    assert plan.count("Scan parquet") == 0, plan


# batch IX/X plan shapes: the scale claims in the docstrings, enforced
SHAPES_R3G = [
    # per-IP politeness: one corpus agg + ip-partitioned windows only
    ("host_ip_politeness", 2, True, True),
    # prototypes fold to ONE broadcast row; the only SinglePartition
    # exchange is that K-row fold — the corpus itself never shuffles
    ("zero_shot_label_match", 3, True, False),
    # index + manifest prune: range-sort machinery, broadcast block ids
    ("surt_prefix_lookup", 3, True, True),
    # functional-graph doubling: bounded joins over checkpointed maps
    ("redirect_resolve", 4, True, True),
]


@pytest.mark.parametrize("name,max_sh,no_cart,no_single", SHAPES_R3G)
def test_r3g_plan_shapes(spark, name, max_sh, no_cart, no_single):
    plan = _plan(spark, name)
    assert _shuffles(plan) <= max_sh, plan
    if no_cart:
        assert "CartesianProduct" not in plan, plan
    if no_single:
        assert "Exchange SinglePartition" not in plan, plan


def test_caption_lm_fluency_no_cartesian_single_corpus_scan(spark):
    """LM tables derive from ONE materialized tokenization of the
    reference corpus; the only SinglePartition exchange is the 1-row
    grand-total agg (pre-aggregated input), and no join degenerates to
    a cartesian product."""
    plan = _plan(spark, "caption_lm_fluency")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Scan parquet") <= 1, plan  # captions fixture only
    assert "BroadcastExchange" in plan, plan


def test_quality_ks_drift_windows_run_on_bounded_grid(spark):
    """The corpus collapses to the (score, source) grid before any
    window; the global cumulative window's SinglePartition exchange
    therefore carries grid-cardinality rows (bounded by 4dp rounding),
    never the corpus — and the dense grid is a broadcast expansion,
    not a cartesian product."""
    plan = _plan(spark, "quality_ks_drift")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
