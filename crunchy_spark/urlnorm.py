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
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

URL_PARTS_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)"
# pyarrow extract_regex needs named groups (RE2 syntax)
_URL_PARTS_RE_NAMED = (
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<hostport>[^/?#]*)(?P<path>[^?#]*)"
)


def _resolve_path_slow(path: pd.Series) -> pd.Series:
    """Dot-segment fixpoint + // collapse for the rare paths needing it."""
    for _ in range(8):
        new = path.str.replace(r"/\./", "/", regex=True).str.replace(
            r"/(?!\.\./)[^/]+/\.\./", "/", regex=True
        )
        if new.equals(path):
            break
        path = new
    return path.str.replace(r"/{2,}", "/", regex=True).str.replace(r"/+$", "", regex=True)


def canonicalize_series(s: pd.Series) -> pd.Series:
    """Vectorized canonicalization of a string Series of URLs.

    Hot path is pure pyarrow.compute kernels (RE2, zero Python-object
    churn — ~10x the pandas-object throughput, which matters because this
    UDF is the single most-executed operator in the engine). Only rows
    whose path contains dot-segments or ``//`` runs (vanishingly rare in
    crawl frontiers) fall back to the pandas fixpoint resolver.
    """
    arr = pc.utf8_trim_whitespace(
        pa.array(s.fillna("").astype(str), type=pa.string())
    )
    ext = pc.extract_regex(arr, _URL_PARTS_RE_NAMED)
    matched = ext.is_valid()
    scheme = pc.utf8_lower(pc.struct_field(ext, "scheme"))
    hostport = pc.utf8_lower(pc.struct_field(ext, "hostport"))
    hostport = pc.replace_substring_regex(hostport, r"^www\.", "", max_replacements=1)
    # default ports (scheme-conditional)
    hostport = pc.if_else(
        pc.equal(scheme, "http"),
        pc.replace_substring_regex(hostport, r":80$", "", max_replacements=1),
        pc.if_else(
            pc.equal(scheme, "https"),
            pc.replace_substring_regex(hostport, r":443$", "", max_replacements=1),
            hostport,
        ),
    )
    path = pc.struct_field(ext, "path")
    needs_slow = pc.match_substring_regex(path, r"/\.|//")
    fast_path = pc.replace_substring_regex(path, r"/+$", "")
    # NB: the trailing "" is the separator argument of join_element_wise
    out = pc.binary_join_element_wise(scheme, "://", hostport, fast_path, "")
    # rows that never matched the URL grammar pass through trimmed+lowered
    out = pc.if_else(matched, out, pc.utf8_lower(arr))
    result = out.to_pandas().astype("object")
    result.index = s.index
    slow_mask = pc.and_kleene(needs_slow, matched).fill_null(False).to_pandas().to_numpy()
    if slow_mask.any():
        sp = _resolve_path_slow(pd.Series(path.to_pandas()[slow_mask], dtype="object"))
        joined = (
            pd.Series(scheme.to_pandas()[slow_mask], dtype="object")
            + "://"
            + pd.Series(hostport.to_pandas()[slow_mask], dtype="object")
            + sp
        )
        result.iloc[slow_mask] = joined.to_numpy()
    return result


def host_series(s: pd.Series) -> pd.Series:
    """Host (no port) of an already-canonical URL."""
    arr = pa.array(s.fillna("").astype(str), type=pa.string())
    ext = pc.extract_regex(arr, r"^(?P<h>[a-z][a-z0-9+.\-]*)://(?P<host>[^/?#]*)")
    host = pc.struct_field(ext, "host")
    host = pc.replace_substring_regex(host, r":\d+$", "", max_replacements=1)
    host = pc.if_else(ext.is_valid(), host, "")
    out = host.to_pandas().astype("object")
    out.index = s.index
    return out


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


def host_col(canon: Column) -> Column:
    """Host (no port) of an already-canonical URL, JVM-side.

    The canonical form is regular enough for codegen'd regex — one fewer
    Python stage per identity subtree than routing it through host_udf
    (semantics identical to host_series; cross-checked in tests)."""
    h = F.regexp_extract(canon, r"^[a-z][a-z0-9+.\-]*://([^/?#]*)", 1)
    return F.regexp_replace(h, r":\d+$", "")


def with_url_identity(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add url_canon / host / site / url_sha1 / sha_int columns.

    One Arrow-vectorized UDF (canonicalize) + whole-stage-codegen'd JVM
    expressions for everything downstream of it."""
    out = df.withColumn("url_canon", canonicalize_udf(F.col(url_col)))
    out = out.withColumn("host", host_col(F.col("url_canon")))
    out = out.withColumn("site", site_col(F.col("url_canon")))
    out = out.withColumn("url_sha1", sha1_col(F.col("url_canon")))
    return out.withColumn("sha_int", sha_int_col(F.col("url_sha1")))


def canonicalize_one(url: str) -> str:
    """Single-URL convenience (tests / the serial reference simulator)."""
    return canonicalize_series(pd.Series([url])).iloc[0]
