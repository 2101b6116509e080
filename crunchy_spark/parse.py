"""Parse stage: payload -> item rows (Arrow-vectorized mapInPandas).

Reference: XPath extraction of ~25 fields per page
(parser/CrunchbaseDataParser.py:18-82, TracxnDataParser.py:52-129) run
row-at-a-time in the Scrapy callback. Here the "page" is an image+caption
payload; parse = decode the image (PSNR-checkable vs the reference
decode), extract the caption, and surface the page_meta fields — one
mapInPandas pass per partition, bytes dropped on exit so the heavy
column never enters a shuffle.

Derived relational fields (funding_usd, founded_date, normalized_domain)
are added JVM-side afterwards via scalars.py — the UDF does only what
genuinely needs Python (the codec).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import codec, scalars

_DECODE_SCHEMA = (
    "url_sha1 string, img_w int, img_h int, img_mean double, "
    "caption_out string, phash_out long, decode_ok boolean"
)


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = []
        for sha, data, caption in zip(pdf["url_sha1"], pdf["bytes"], pdf["caption"]):
            try:
                arr, _ = codec.decode_image(bytes(data))
                rows.append(
                    (
                        sha,
                        arr.shape[1],
                        arr.shape[0],
                        float(arr.mean()),
                        caption,
                        codec.phash64(arr),
                        True,
                    )
                )
            except Exception:
                rows.append((sha, None, None, None, caption, None, False))
        yield pd.DataFrame(
            rows,
            columns=[
                "url_sha1", "img_w", "img_h", "img_mean",
                "caption_out", "phash_out", "decode_ok",
            ],
        )


def parse_fetched(
    payloads: DataFrame, round_id: int, slim: DataFrame | None = None
) -> DataFrame:
    """Parse successfully fetched payloads into the ITEM superset schema.

    Input: fetch_payloads output filtered to fetch_status=='fetched'.
    Continuation pages (url ends '/similar') yield no item — the caller
    splits them off for frontier expansion (reference: similar-companies
    continuation request, spiders/crunchy.py:216-228).

    ``slim``: optionally pass an already-materialized bytes-free copy of
    the same rows (loop.run_round checkpoints one) so the fetch join
    isn't recomputed for the metadata side — the bytes-bearing subtree
    then executes exactly once, feeding the decoder.
    """
    decode_in = payloads.select("url_sha1", "bytes", "caption")
    decoded = decode_in.mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)
    if slim is None:
        slim = payloads.drop("bytes")  # heavy column never shuffles
    joined = slim.join(decoded, "url_sha1", "inner")
    return (
        joined.withColumn("normalized_domain", scalars.normalized_domain_col(F.col("website")))
        .withColumn("funding_usd", scalars.funding_usd_col(F.col("funding")))
        .withColumn("founded_date", scalars.founded_date_col(F.col("founded")))
        .withColumn("round_fetched", F.lit(round_id))
        .withColumn("caption", F.col("caption_out"))
        .withColumn("phash", F.col("phash_out"))
        .drop("caption_out", "phash_out")
    )


def is_continuation_col():
    return F.col("url_canon").endswith("/similar") & (F.col("site") == "crunchbase")
