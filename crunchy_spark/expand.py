"""Frontier expansion: similar/competitor URLs back into the frontier.

Reference semantics:
- industry-interest gate before pushing expansion URLs
  (similar_companies.py:29-33) -> arrays_overlap against a broadcast list
- skip URLs already stored (similar_companies.py:49-68,
  discovery.py:80-86) -> left_anti join against the frontier/seen set
  (bloom pre-filter optional, see bloom.py)
- in-page URL dedup + self-exclusion (TracxnDataParser.py:179-199)
  -> posexplode + canonical dropDuplicates + filter
- crunchbase expansions come from the similar-companies continuation
  page (spiders/crunchy.py:216-228); tracxn competitor URLs come from
  the company page itself (TracxnDataParser.py:202-220)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import schemas
from .frontier import first_arrival, image_id_col, queue_rank_col
from .parse import is_continuation_col
from .urlnorm import with_url_identity


def continuation_rows(parsed: DataFrame, round_id: int, n_images: int) -> DataFrame:
    """One spider-queue (rank 0) row per fetched crunchbase company page:
    the similar-companies continuation request."""
    src = parsed.filter((F.col("site") == "crunchbase") & ~is_continuation_col())
    cont = src.select(
        F.concat(F.col("url_canon"), F.lit("/similar")).alias("url"),
        F.col("entry_point"),
        F.col("fetch_seq").alias("_parent_order"),
        F.lit(-1).alias("_pos"),
        F.lit(True).alias("_is_continuation"),
    )
    return _to_frontier_rows(cont, round_id, n_images)


def expansion_candidates(parsed: DataFrame, round_id: int, n_images: int,
                         interested: list[str]) -> DataFrame:
    """Similar/competitor URLs from continuation pages (cb) and company
    pages (tracxn), industry-gated, in parent-fetch-order."""
    src = parsed.filter(
        is_continuation_col() | (F.col("site") == "tracxn")
    ).filter(F.size(F.coalesce(F.col("similar_companies"), F.array())) > 0)
    gate = F.arrays_overlap(
        F.coalesce(F.col("industries"), F.array()),
        F.array(*[F.lit(i) for i in interested]),
    )
    src = src.filter(gate)
    exploded = src.select(
        F.col("url_canon").alias("_parent_canon"),
        F.col("fetch_seq").alias("_parent_order"),
        F.col("entry_point"),
        F.posexplode("similar_companies").alias("_pos", "url"),
    )
    exploded = exploded.withColumn("_is_continuation", F.lit(False))
    rows = _to_frontier_rows(exploded, round_id, n_images)
    # self-exclusion (don't re-enqueue the page that listed it)
    return rows.filter(
        F.col("url_canon") != F.coalesce(F.col("_parent_canon"), F.lit(""))
    ).drop("_parent_canon")


def _to_frontier_rows(cands: DataFrame, round_id: int, n_images: int) -> DataFrame:
    c = with_url_identity(cands, "url")
    c = c.filter(F.col("site") != "other")  # site validation discard (queue.py:155-168)
    # batch-level dedup keeping first by parent order (D4/D5 semantics);
    # map-side-combinable aggregate instead of a window sort
    c = first_arrival(c, "sha_int", ("_parent_order", "_pos"))
    return (
        c.withColumn(
            "queue_rank", queue_rank_col(F.col("site"), F.col("_is_continuation"))
        )
        .withColumn("image_id", image_id_col(F.col("sha_int"), n_images))
        .withColumn("status", F.lit("pending"))
        .withColumn("attempt", F.lit(0))
        .withColumn("round_added", F.lit(round_id))
        .withColumn("round_fetched", F.lit(None).cast("int"))
        .withColumn("fetch_seq", F.lit(None).cast("long"))
        .withColumn("reason", F.lit(None).cast("string"))
        .withColumn("priority", F.lit(0.0))
        .withColumn("state_round", F.lit(round_id))
    )


def assign_seq(new_rows: DataFrame, base_seq: int) -> DataFrame:
    """FIFO arrival index continuation: deterministic order by
    (parent fetch order, position in page) — parallel range-sorted rank
    (frontier.global_fifo_rank), no single-partition global window."""
    from .frontier import global_fifo_rank

    out = global_fifo_rank(
        new_rows, ("_parent_order", "_pos", "sha_int"), "seq", base=base_seq
    )
    return out.drop("_parent_order", "_pos", "_is_continuation").select(
        [f.name for f in schemas.FRONTIER.fields]
    )
