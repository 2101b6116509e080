"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship crawl scheduling+dedup slice on sf0.001.
queries()     — every implemented operator from SURVEY.md §2 plus the
                training-data ops (dedup/minhash/simhash/ANN/text/quality)
                and multimodal image ops; see crunchy_spark/queries.py.
oracle_sql()  — DuckDB twins for every SQL-expressible query (binary
                image ops are rows-only by necessity).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from crunchy_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one crawl scheduling round — canonicalize (Arrow UDF) ->
    SHA-style fingerprint -> first-arrival dedup -> per-host politeness
    ranking — on /root/testdata/sf0.001."""
    return QUERIES["crawl_schedule_dedup"](spark, "/root/testdata/sf0.001")


# Rotation policy (the driver caps CORRECTNESS at 50 rows/round): the
# queries whose only evidence is the OLDEST round go first, then
# queries changed or added THIS round, then the recently-green rest —
# so every query's green row stays as fresh as the cap allows. This
# hand list is the deliberate round-3 order (r1-stale entries lead per
# the round-2 verdict); from round 4 on, queries() rotates ITSELF from
# the CORRECTNESS_r*.json files (stalest green evidence first — see
# _latest_green_round), so late additions such as ann_ivfpq_topk /
# bpe_merge_topk / incremental_neardup / boilerplate_strip /
# curation_keep_list (no driver row yet; pytest-oracled at sf0.001 and
# sf0.01) automatically head the round-4 run with no hand edit.
# Every query is also oracle-checked in pytest each run
# (tests/test_queries_oracle.py), so driver rows are corroboration.
_PRIORITY = [
    # evidence last recorded in round 1
    "crawl_schedule_dedup",
    "entity_match_tiers",
    "facet_cube",
    "filtered_facets",
    "fuzzy_match_topk",
    "graph_two_hop",
    "image_decode_stats",
    "image_resize",
    "json_extract_props",
    "orders_page_offset",
    # changed or added in round 3
    "redirect_resolve",
    "host_ip_politeness",
    "zero_shot_label_match",
    "surt_prefix_lookup",
    "caption_lm_fluency",
    "quality_ks_drift",
    "sitemap_diff",
    "canonical_resolve",
    "image_ingest_manifest",
    "dedup_layer_agreement",
    "host_hits",
    "bigram_logprob_quality",
    "image_keep_list",
    "robots_policy",
    "sitemap_extract",
    "url_trap_detect",
    "mirror_host_detect",
    "crawl_budget_alloc",
    "dsir_select",
    "semdedup_prune",
    "ccnet_quality_buckets",
    "clip_hard_negatives",
    "crossmodal_dup_classify",
    "caption_token_neardup",
    "image_caption_quality_filter",
    "image_dup_canonical",
    "events_asof_join",
    "stratified_sample",
    "corpus_mix_temperature",
    "bm25_topk",
    "caption_pixels_corr",
    "doc_pack_sequences",
    "vocab_topk",
    "event_value_quantiles",
    "fuzzy_ratio_topk",
    "graph_three_hop",
    "ann_ivf_topk",
    "neardup_components",
    "neardup_canonical_docs",
    "pii_redact",
    "repetition_quality",
    "ngram_topk_corpus",
    "benchmark_decontaminate",
    "approx_distinct_diag",
    "aspect_bucket_batches",
    "image_shard_pack",
    "unigram_logprob_quality",
    "tfidf_topk_terms",
    "host_pagerank",
    "recrawl_schedule",
    "dup_span_detect",
    "token_zipf_slope",
    "skew_diagnostics",
    "ann_pq_topk",
    "frontier_shard_plan",
]


def _latest_green_round(root: str | None = None) -> dict[str, int]:
    """{query_name: most recent round with a GREEN driver row} from the
    CORRECTNESS_r*.json files on disk. Green = all three match flags, or
    an explicit rows-only ``no_oracle`` row with a row count. A failed
    or errored row is NOT evidence — the query re-fronts next round so
    the fix gets a fresh row."""
    root = root or os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ) or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if green:
                latest[name] = max(latest.get(name, -1), rnd)
    return latest


def _ordered_names(evidence: dict[str, int], registered) -> list[str]:
    """Rotation order for the driver's capped correctness run.

    Round 4+ (some green row from round >= 3 exists): self-rotating —
    stalest green evidence first (never-checked / last-round-failed
    queries lead), so the 50-row cap sweeps the registry and every
    query's green row stays at most ceil(N/50) rounds old with no hand
    edit. Round 3 (only r01/r02 evidence): the deliberate hand order
    (_PRIORITY — r1-stale entries lead per the round-2 verdict)."""
    if max(evidence.values(), default=0) >= 3:
        return sorted(registered, key=lambda n: (evidence.get(n, -1), n))
    ordered = [k for k in _PRIORITY if k in registered]
    return ordered + [k for k in registered if k not in set(ordered)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: QUERIES[n] for n in _ordered_names(_latest_green_round(), QUERIES)}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
