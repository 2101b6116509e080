"""Scalar functions vs the reference's own test corpora
(test_Currency.py:6-53, test_founded.py:10-42)."""

import datetime

import pytest
from pyspark.sql import functions as F

from crunchy_spark import scalars
from crunchy_spark.datagen import RATES


def _one(spark, col, value):
    return spark.createDataFrame([(value,)], ["v"]).select(col.alias("out")).first()["out"]


@pytest.mark.parametrize(
    ("raw", "code", "usd"),
    [
        ("$1.5M", "USD", 1.5e6),
        ("₹1M", "INR", 1e6 / RATES["INR"]),
        ("£179K", "GBP", 179e3 / RATES["GBP"]),
        ("₩8B", "KRW", 8e9 / RATES["KRW"]),
        ("CN¥13M", "CNY", 13e6 / RATES["CNY"]),
        ("CA$3.9M", "CAD", 3.9e6 / RATES["CAD"]),
        ("CZK13M", "CZK", 13e6 / RATES["CZK"]),
        ("SEK30M", "SEK", 30e6 / RATES["SEK"]),
        ("—", None, None),
        ("", None, None),
    ],
)
def test_currency(spark, raw, code, usd):
    got_code = _one(spark, scalars.currency_code_col(F.col("v")), raw)
    got_usd = _one(spark, scalars.funding_usd_col(F.col("v")), raw)
    assert got_code == code
    if usd is None:
        assert got_usd is None
    else:
        assert got_usd == pytest.approx(usd, abs=0.011)


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("2018", datetime.date(2018, 1, 1)),
        ("Aug2015", datetime.date(2015, 8, 1)),
        ("Jan1,2015", datetime.date(2015, 1, 1)),
        ("Nov30,2016", datetime.date(2016, 11, 30)),
        ("", None),
        ("garbage", None),
    ],
)
def test_founded(spark, raw, expected):
    assert _one(spark, scalars.founded_date_col(F.col("v")), raw) == expected


@pytest.mark.parametrize(
    ("url", "domain"),
    [
        ("https://www.acme.co.uk/about", "acme.co.uk"),
        ("https://sub.acme.com/x", "acme.com"),
        ("https://co-17.example.com/", "example.com"),
        ("acme.io", "acme.io"),
    ],
)
def test_normalized_domain(spark, url, domain):
    assert _one(spark, scalars.normalized_domain_col(F.col("v")), url) == domain


@pytest.mark.parametrize(
    ("name", "norm"),
    [
        ("Acme, Inc.", "acme"),
        ("Beta Corp", "beta"),
        ("  Gamma  LLC ", "gamma"),
        ("Delta-Zeta Ltd", "deltazeta"),
    ],
)
def test_name_normalize(spark, name, norm):
    assert _one(spark, scalars.normalized_name_col(F.col("v")), name) == norm


def test_token_sort_ratio(spark):
    df = spark.createDataFrame([("acme labs", "labs acme"), ("acme", "zzzz")], ["a", "b"])
    out = df.select(scalars.token_sort_ratio_udf("a", "b").alias("r")).collect()
    assert out[0]["r"] == pytest.approx(1.0)
    assert out[1]["r"] < 0.5


def test_founder_jaccard(spark):
    df = spark.createDataFrame(
        [(["a", "b"], ["b", "c"]), (["a"], ["a"]), ([], [])],
        "a: array<string>, b: array<string>",
    )
    rs = [r["j"] for r in df.select(scalars.founder_jaccard_col(F.col("a"), F.col("b")).alias("j")).collect()]
    assert rs == pytest.approx([1 / 3, 1.0, 0.0])


def test_slug_and_misc(spark):
    assert _one(spark, scalars.slug_col(F.col("v")), "Acme Labs!") == "acme_labs_"
    assert (
        _one(spark, scalars.strip_profile_suffix_col(F.col("v")), "Acme - Company Profile")
        == "Acme"
    )
    assert _one(spark, scalars.rstrip_slash_col(F.col("v")), "https://a.com/x//") == "https://a.com/x"
    assert (
        _one(spark, scalars.logo_rewrite_col(F.col("v")), "https://res.cloudinary.com/demo/l.png")
        == "https://images.crunchbase.com/demo/l.png"
    )


def test_backoff_bounded(spark):
    df = spark.createDataFrame([(i,) for i in range(12)], ["v"])
    vals = [r["b"] for r in df.select(scalars.backoff_col(F.col("v")).alias("b")).collect()]
    assert all(0.0 < v <= 300.0 for v in vals)
    # deterministic
    vals2 = [r["b"] for r in df.select(scalars.backoff_col(F.col("v")).alias("b")).collect()]
    assert vals == vals2
