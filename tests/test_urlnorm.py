"""Canonicalization unit tests (reference semantics:
TracxnDataParser.py:146-176, discovery.py:21-29,122-131)."""

import hashlib

import pandas as pd
import pytest

from crunchy_spark.urlnorm import canonicalize_one, canonicalize_series, host_series


@pytest.mark.parametrize(
    ("raw", "canon"),
    [
        ("https://crunchbase.com/organization/acme", "https://crunchbase.com/organization/acme"),
        ("https://crunchbase.com/organization/acme/", "https://crunchbase.com/organization/acme"),
        ("https://crunchbase.com/organization/acme?utm=x", "https://crunchbase.com/organization/acme"),
        ("https://crunchbase.com/organization/acme#frag", "https://crunchbase.com/organization/acme"),
        ("https://CRUNCHBASE.COM/organization/acme", "https://crunchbase.com/organization/acme"),
        ("https://www.crunchbase.com/organization/acme", "https://crunchbase.com/organization/acme"),
        ("https://crunchbase.com:443/organization/acme", "https://crunchbase.com/organization/acme"),
        ("http://crunchbase.com:80/a", "http://crunchbase.com/a"),
        ("http://crunchbase.com:8080/a", "http://crunchbase.com:8080/a"),
        ("https://crunchbase.com/a/./b", "https://crunchbase.com/a/b"),
        ("https://crunchbase.com/a/x/../b", "https://crunchbase.com/a/b"),
        ("https://crunchbase.com//a///b//", "https://crunchbase.com/a/b"),
        ("  https://crunchbase.com/a  ", "https://crunchbase.com/a"),
        ("https://crunchbase.com", "https://crunchbase.com"),
        ("https://crunchbase.com/", "https://crunchbase.com"),
        ("", ""),
    ],
)
def test_canonicalize(raw, canon):
    assert canonicalize_one(raw) == canon


def test_canonicalize_idempotent():
    urls = [
        "https://www.Tracxn.com/d/companies/co-1/__abc?q=1#f",
        "https://h0001.crunchbase.com/organization/co-2/",
    ]
    once = canonicalize_series(pd.Series(urls))
    twice = canonicalize_series(once)
    assert list(once) == list(twice)


def test_host_extraction():
    s = pd.Series(["https://h0001.crunchbase.com/organization/x", "https://tracxn.com:8443/y"])
    assert list(host_series(s)) == ["h0001.crunchbase.com", "tracxn.com"]


def test_noise_variants_collapse():
    from crunchy_spark.datagen import add_noise, url_for

    base = url_for(4)  # crunchbase url
    canon0 = canonicalize_one(base)
    for v in range(5):
        assert canonicalize_one(add_noise(base, v)) == canon0


def test_spark_identity_matches_python(spark):
    from pyspark.sql import functions as F

    from crunchy_spark.urlnorm import with_url_identity

    urls = ["https://www.crunchbase.com/organization/Acme/?u=1", "https://tracxn.com/d/companies/a/__b#x"]
    df = with_url_identity(spark.createDataFrame([(u,) for u in urls], ["url"]))
    rows = {r["url"]: r for r in df.collect()}
    for u in urls:
        canon = canonicalize_one(u)
        r = rows[u]
        assert r["url_canon"] == canon
        assert r["url_sha1"] == hashlib.sha1(canon.encode()).hexdigest()
        assert r["sha_int"] == int(hashlib.sha1(canon.encode()).hexdigest()[:15], 16)
        assert r["site"] in ("crunchbase", "tracxn")


def test_jvm_canonicalize_equals_arrow_udf(spark):
    """All three canonicalize flavors — codegen column, pandas UDF,
    Arrow-native UDF — must be BIT-IDENTICAL (the engine hot path uses
    the Arrow-native one). Checked over every canonical-rule feature,
    the datagen noise family, and adversarial junk."""
    from pyspark.sql import functions as F

    from crunchy_spark.datagen import add_noise, url_for
    from crunchy_spark.urlnorm import (
        canonicalize_arrow_udf,
        canonicalize_col,
        canonicalize_udf,
    )

    urls = [
        "https://crunchbase.com/organization/acme",
        "https://crunchbase.com/organization/acme/",
        "https://crunchbase.com/organization/acme?utm=x&b=2",
        "https://crunchbase.com/organization/acme#frag",
        "https://CRUNCHBASE.COM/Organization/Acme",
        "https://www.crunchbase.com/organization/acme",
        "https://wwwx.crunchbase.com/organization/acme",
        "https://crunchbase.com:443/organization/acme",
        "http://crunchbase.com:80/a",
        "http://crunchbase.com:8080/a",
        "HTTPS://WWW.Tracxn.com:443/d/../d/companies/./co-1//x/",
        "https://crunchbase.com/a/./b",
        "https://crunchbase.com/a/x/../b",
        "https://crunchbase.com/a/x/../../b/./c",
        "https://crunchbase.com//a///b//",
        "https://crunchbase.com/a/../../..",
        "  https://crunchbase.com/a  ",
        "https://crunchbase.com",
        "https://crunchbase.com/",
        "ftp://Example.com:21/Files/",
        "not a url at all",
        "nourl.example.com/path",
        "",
        None,
        "https://h.com/%7Euser/A%2Fb?x#y",
        "https://h.com/a?b=c?d=e",
        "https://h.com/#?",
        "://missing.scheme/x",
        "https://",
        "https:///path-no-host",
        # unicode-whitespace trim parity (pyarrow strips the full
        # White_Space set; the JVM path btrims the same charset)
        "\thttps://crunchbase.com/a\n",
        " https://x.com/b ",
        "https://y.com/c\r",
        "　https://z.com/d ",
    ] + [add_noise(url_for(i), v) for i in range(12) for v in range(5)]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = df.select(
        "url",
        canonicalize_col(F.col("url")).alias("jvm"),
        canonicalize_udf(F.col("url")).alias("pandas"),
        canonicalize_arrow_udf(F.col("url")).alias("arrow"),
    ).collect()
    diffs = [
        (r["url"], r["jvm"], r["pandas"], r["arrow"])
        for r in out
        if not (r["jvm"] == r["pandas"] == r["arrow"])
    ]
    assert not diffs, diffs


def test_jvm_and_udf_identity_paths_equal(spark):
    """with_url_identity is impl-invariant on the full identity
    subtree (canon, host, site, sha columns)."""
    from crunchy_spark.datagen import add_noise, url_for
    from crunchy_spark.urlnorm import with_url_identity

    urls = [add_noise(url_for(i), i % 5) for i in range(40)]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    a = with_url_identity(df, impl="arrow").orderBy("url").collect()
    b = with_url_identity(df, impl="pandas").orderBy("url").collect()
    c = with_url_identity(df, impl="jvm").orderBy("url").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b] == [tuple(r) for r in c]
