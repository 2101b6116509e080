"""Source/sink helpers (SURVEY.md §2.1).

Thin, typed wrappers over Spark's built-in readers/writers so every
reference source/sink has a named engine entry point:

- S1 seed ingestion            -> frontier.seeds_to_frontier
- S8 item sink                 -> item_sink (drop internals + append)
- S11/S12 upsert sinks         -> snapshot append + loop.items() MERGE view
- S13 kafka                    -> streaming.read_kafka_items (jar-gated)
- S15 CSV scan                 -> read_csv
- S16 raw dump sink            -> debug_dump (fetch_log analog)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# spider-internal keys dropped before the item sink
# (reference: DATABUCKET_SKIP_KEYS, pipelines.py:8-14)
INTERNAL_KEYS = ["_response", "delivery_tag", "queue"]


def read_csv(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """S15: CSV scan (reference: csv.reader audit, test.py:136-152).
    Explicit schema preferred; inferSchema only for ad-hoc use."""
    reader = spark.read.option("header", True)
    return reader.schema(schema).csv(path) if schema else reader.option(
        "inferSchema", True
    ).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Item JSON scan with fixed schema (no inference in the hot path)."""
    return spark.read.schema(schema).json(path)


def item_sink(items: DataFrame, out_path: str, partition_by: str = "site") -> None:
    """S8: databucket sink — drop crawl-internal keys, skip retry/unknown
    sources, append partitioned by source site (pipelines.py:102-152)."""
    cleaned = items.drop(*[c for c in INTERNAL_KEYS if c in items.columns])
    if "site" in cleaned.columns:
        cleaned = cleaned.filter(~F.col("site").isin("retry", "unknown"))
    cleaned.write.mode("append").partitionBy(partition_by).parquet(out_path)


def debug_dump(payloads: DataFrame, out_path: str) -> None:
    """S16: raw payload dump for extractor tests
    (DUMP_RAW_SCRAPED_DATA, spiders/crunchy.py:83-112). Bytes excluded —
    dump the identity + caption, keep the heavy column out of JSON."""
    cols = [c for c in payloads.columns if c != "bytes"]
    payloads.select(*cols).write.mode("overwrite").json(out_path)


def items_to_json_col(items: DataFrame) -> DataFrame:
    """F12: item dict <-> JSON round-trip (pipelines.py:11-14)."""
    payload_cols = [c for c in items.columns if c not in INTERNAL_KEYS]
    return items.withColumn("payload_json", F.to_json(F.struct(*payload_cols)))
