"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship crawl scheduling+dedup slice on sf0.001.
queries()     — every implemented operator from SURVEY.md §2 plus the
                training-data ops (dedup/minhash/simhash/ANN/text/quality)
                and multimodal image ops; see crunchy_spark/queries.py.
oracle_sql()  — DuckDB twins for every SQL-expressible query (binary
                image ops are rows-only by necessity).
"""

from __future__ import annotations

import os
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


# queries with no CORRECTNESS row in round 1 (plus round-2 additions)
# go FIRST: if the driver ever caps or truncates its run, the rows we
# most need recorded are the ones not yet on file.
_PRIORITY = [
    "countif_diagnostics",
    "string_ops",
    "ua_choice",
    "union_dedup_tokens",
    "ngram_shingle_jaccard_pairs",
    "embedding_neardup_cosine",
    "media_frame_sample",
    "phash_hamming_neardup",
    "nation_customer_roster",
    "fuzzy_ratio_topk",
    "golden_record",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    ordered = {k: QUERIES[k] for k in _PRIORITY if k in QUERIES}
    ordered.update({k: v for k, v in QUERIES.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
