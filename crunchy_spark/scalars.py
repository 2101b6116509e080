"""Scalar functions re-expressing the reference's pure-Python utils as
JVM-side column expressions (plus two vectorized pandas UDFs where Spark
lacks the primitive).

Reference implementations being matched (semantics, not code):
- currency parse/convert: CrunchyRest/databucket/utils/Currency.py:67-91 +
  gather_data_from_crunchy.py:41-86 (rates pinned here for determinism)
- founded-date parse:     CrunchyRest/databucket/utils/Founded.py:7-35
- domain normalize:       CrunchyRest/databucket/utils/domain.py:6-32 (tldextract)
- name normalize:         CrunchyRest/databucket/entity_resolver.py:27-31,53-73
- fuzzy name similarity:  entity_resolver.py:76-95 (fuzz.token_sort_ratio)
- slug builder:           CrunchyCrawler/.../spiders/crunchy.py:69-81
- backoff w/ jitter:      CrunchyRest/proxymanager/.../expire.py:150-162
"""

from __future__ import annotations

import difflib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .datagen import RATES

# ---------------------------------------------------------------------------
# currency  (F2)
# ---------------------------------------------------------------------------
_SYMBOL_TO_CODE = {
    "CN¥": "CNY", "CA$": "CAD", "$": "USD", "₹": "INR", "£": "GBP",
    "₩": "KRW", "¥": "JPY", "€": "EUR",
}
# longest-first so CN¥ wins over ¥, CA$ over $
_PREFIX_RE = r"^(CN¥|CA\$|[A-Z]{3}|[€£₹₩$¥])"
_AMOUNT_RE = r"([0-9]+(?:\.[0-9]+)?)"
_SUFFIX_RE = r"([KMB])\s*$"


def currency_code_col(funding: Column) -> Column:
    prefix = F.regexp_extract(F.trim(funding), _PREFIX_RE, 1)
    code = prefix
    for sym, c in _SYMBOL_TO_CODE.items():
        code = F.when(prefix == sym, F.lit(c)).otherwise(code)
    return F.when(F.length(code) == 3, code)


def funding_usd_col(funding: Column, rates: dict[str, float] | None = None) -> Column:
    """Parsed USD amount, null when unparseable (reference returns None)."""
    rates = rates or RATES
    f = F.trim(funding)
    amount = F.regexp_extract(f, _AMOUNT_RE, 1)
    amount = F.when(amount != "", amount.cast("double"))
    suffix = F.regexp_extract(f, _SUFFIX_RE, 1)
    mult = (
        F.when(suffix == "K", F.lit(1e3))
        .when(suffix == "M", F.lit(1e6))
        .when(suffix == "B", F.lit(1e9))
        .otherwise(F.lit(1.0))
    )
    code = currency_code_col(funding)
    rate_map = F.create_map(*[F.lit(x) for pair in rates.items() for x in pair])
    rate = rate_map[code]
    return F.round(amount * mult / rate, 2)


# ---------------------------------------------------------------------------
# founded date  (F3): formats '2018', 'Aug2015', 'Jan1,2015', 'Nov30,2016'
# ---------------------------------------------------------------------------
def founded_date_col(founded: Column) -> Column:
    c = F.trim(founded)
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("MMMd,yyyy")).cast("date"),
        F.try_to_timestamp(c, F.lit("MMMyyyy")).cast("date"),
        F.when(c.rlike(r"^(19|20)\d{2}$"), F.try_to_timestamp(c, F.lit("yyyy")).cast("date")),
    )


def founded_year_col(text: Column) -> Column:
    """Year extraction (F4): \\b(19|20)\\d{2}\\b (entity_resolver.py:136-147)."""
    y = F.regexp_extract(text, r"\b((19|20)\d{2})\b", 1)
    return F.when(y != "", y.cast("int"))


# ---------------------------------------------------------------------------
# domain normalize  (F1) — tldextract-lite: registered domain = last label
# before a known public suffix. Offline 2-level suffix list covers the
# fixture + reference corpus; production would broadcast the full PSL.
# ---------------------------------------------------------------------------
_TWO_LEVEL_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "com.au", "com.br", "co.in", "co.jp", "com.cn",
]


def normalized_domain_col(url: Column) -> Column:
    host = F.lower(F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#:]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(host == "", F.lower(F.trim(url))).otherwise(host)
    two_level = "|".join(s.replace(".", r"\.") for s in _TWO_LEVEL_SUFFIXES)
    reg2 = F.regexp_extract(host, rf"([^.]+\.(?:{two_level}))$", 1)
    reg1 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(reg2 != "", reg2).when(reg1 != "", reg1).otherwise(host)


# ---------------------------------------------------------------------------
# name normalize  (F5): lowercase, strip punctuation, drop legal suffixes
# ---------------------------------------------------------------------------
LEGAL_SUFFIXES = [
    "inc", "incorporated", "llc", "ltd", "limited", "corp", "corporation",
    "co", "company", "gmbh", "sa", "plc", "ag", "bv", "pvt", "pte", "srl",
]


def normalized_name_col(name: Column) -> Column:
    cleaned = F.regexp_replace(F.lower(F.trim(name)), r"[^a-z0-9\s]", "")
    toks = F.split(cleaned, r"\s+")
    suffixes = F.array(*[F.lit(s) for s in LEGAL_SUFFIXES])
    kept = F.filter(toks, lambda t: (t != "") & ~F.array_contains(suffixes, t))
    return F.array_join(kept, " ")


# ---------------------------------------------------------------------------
# fuzzy name similarity  (F6): token_sort_ratio, vectorized pandas UDF.
# rapidfuzz is not in the image; difflib.SequenceMatcher.ratio over
# sorted-token strings is the same statistic family (0..1).
# ---------------------------------------------------------------------------
def _token_sort_ratio(a: str, b: str) -> float:
    ta = " ".join(sorted((a or "").split()))
    tb = " ".join(sorted((b or "").split()))
    if not ta and not tb:
        return 0.0
    return difflib.SequenceMatcher(None, ta, tb).ratio()


@F.pandas_udf(T.DoubleType())
def token_sort_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    return pd.Series([_token_sort_ratio(x, y) for x, y in zip(a, b)])


# ---------------------------------------------------------------------------
# misc string ops
# ---------------------------------------------------------------------------
def slug_col(name: Column) -> Column:
    """Slug builder (F7): non-word -> '_', lowercase, 80-char cap."""
    return F.substring(F.lower(F.regexp_replace(name, r"[^\w\-]", "_")), 1, 80)


def strip_profile_suffix_col(title: Column) -> Column:
    """F10: .removesuffix('- Company Profile')."""
    return F.trim(F.regexp_replace(title, r"- Company Profile$", ""))


def rstrip_slash_col(url: Column) -> Column:
    """F11: trailing-slash trim."""
    return F.regexp_replace(F.trim(url), r"/+$", "")


def logo_rewrite_col(logo: Column) -> Column:
    """F17: cloudinary -> images.crunchbase.com prefix rewrite
    (migrate_crunchbase_logos.py:16-20)."""
    return F.regexp_replace(
        logo, r"^https://res\.cloudinary\.com/", "https://images.crunchbase.com/"
    )


def backoff_col(attempt: Column, base_s: float = 1.0, cap_s: float = 300.0) -> Column:
    """F16: capped exponential backoff with deterministic jitter
    (seeded via hash instead of random for replayability)."""
    raw = F.least(F.lit(cap_s), F.lit(base_s) * F.pow(F.lit(2.0), attempt.cast("double")))
    jitter = (F.pmod(F.xxhash64(attempt), F.lit(1000)) / 1000.0)
    return raw * (0.5 + 0.5 * jitter)


def founder_jaccard_col(a: Column, b: Column) -> Column:
    """U2: |a ∩ b| / |a ∪ b| over normalized founder arrays
    (entity_resolver.py:113-122)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
