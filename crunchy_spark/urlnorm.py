"""URL canonicalization + fingerprinting.

Reference semantics being reimplemented (not ported):
- Tracxn canonical base: strip ``#``/``?``, force scheme+host, slug base
  (CrunchyCrawler/CrunchyCrawler/parser/TracxnDataParser.py:146-176,
  CrunchyRest/databucket/discovery.py:21-29)
- Crunchbase canonical: strip trailing slash / query / fragment
  (discovery.py:122-131, gather_data_from_crunchy.py:95,118)
- Fingerprint: SHA-1 over the canonicalized URL (scrapy request_fingerprint
  impl "2.7", rabbitmq/dupefilter.py:35-44, settings.py:195)

Canonical rule (RFC-3986-flavored, applied uniformly):
  strip whitespace; drop fragment and query; lowercase scheme and host;
  strip a leading ``www.``; drop default ports (:80 http, :443 https);
  resolve ``/./`` and ``/seg/../`` dot-segments; collapse ``//`` runs in
  the path; strip trailing slashes.

Everything is vectorized pandas string ops inside pandas UDFs — no
per-row Python (north_rule). The SHA-1 itself runs JVM-side via F.sha1.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

URL_PARTS_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)"


def canonicalize_series(s: pd.Series) -> pd.Series:
    """Vectorized canonicalization of a string Series of URLs."""
    s = s.fillna("").str.strip()
    ext = s.str.extract(URL_PARTS_RE)
    scheme = ext[0].str.lower()
    hostport = ext[1].fillna("").str.lower()
    hostport = hostport.str.replace(r"^www\.", "", regex=True)
    # default ports
    is_http, is_https = scheme.eq("http"), scheme.eq("https")
    hostport = hostport.mask(
        is_http & hostport.str.endswith(":80"), hostport.str.replace(r":80$", "", regex=True)
    )
    hostport = hostport.mask(
        is_https & hostport.str.endswith(":443"), hostport.str.replace(r":443$", "", regex=True)
    )
    path = ext[2].fillna("")
    # dot-segment resolution (bounded fixpoint, each pass vectorized)
    for _ in range(8):
        new = path.str.replace(r"/\./", "/", regex=True).str.replace(
            r"/(?!\.\./)[^/]+/\.\./", "/", regex=True
        )
        if new.equals(path):
            break
        path = new
    path = path.str.replace(r"/{2,}", "/", regex=True).str.replace(r"/+$", "", regex=True)
    out = scheme.fillna("") + "://" + hostport + path
    # rows that never matched the URL grammar pass through trimmed+lowered
    out = out.mask(ext[0].isna(), s.str.lower())
    return out.mask(s.eq(""), "")


def host_series(s: pd.Series) -> pd.Series:
    """Host (no port) of an already-canonical URL."""
    h = s.fillna("").str.extract(r"^[a-z][a-z0-9+.\-]*://([^/?#]*)")[0].fillna("")
    return h.str.replace(r":\d+$", "", regex=True)


canonicalize_udf = F.pandas_udf(canonicalize_series, T.StringType())
host_udf = F.pandas_udf(host_series, T.StringType())


def site_col(url: Column) -> Column:
    """Site routing predicate (reference: rabbitmq/queue.py:95-102,
    spiders/crunchy.py:40-47, api/views.py:7-12)."""
    return (
        F.when(url.contains("crunchbase.com"), F.lit("crunchbase"))
        .when(url.contains("tracxn.com"), F.lit("tracxn"))
        .otherwise(F.lit("other"))
    )


def sha1_col(canon: Column) -> Column:
    """SHA-1 hex of the canonical URL (JVM-side)."""
    return F.sha1(canon)


def sha_int_col(sha1_hex: Column) -> Column:
    """First 60 bits of the SHA-1 as a non-negative int64 partition/join key
    (reference analog: dupefilter fingerprint as the dedup identity)."""
    return F.conv(F.substring(sha1_hex, 1, 15), 16, 10).cast("long")


def with_url_identity(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add url_canon / host / site / url_sha1 / sha_int columns."""
    out = df.withColumn("url_canon", canonicalize_udf(F.col(url_col)))
    out = out.withColumn("host", host_udf(F.col("url_canon")))
    out = out.withColumn("site", site_col(F.col("url_canon")))
    out = out.withColumn("url_sha1", sha1_col(F.col("url_canon")))
    return out.withColumn("sha_int", sha_int_col(F.col("url_sha1")))


def canonicalize_one(url: str) -> str:
    """Single-URL convenience (tests / the serial reference simulator)."""
    return canonicalize_series(pd.Series([url])).iloc[0]
