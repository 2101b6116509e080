"""robots.txt parsing -> host-policy rows (north_star: "per-host
politeness buckets (crawl-delay, robots.txt cache)").

The reference deliberately skips robots (Readme.md:33 ROBOTSTXT_OBEY =
False); the graft keeps the policy columns first-class, so this module
closes the loop: fetched robots.txt payloads parse into (host,
crawl_delay_s, robots_allow) rows with pure column expressions —
regexp_extract / rlike, no per-row Python — and merge into the cached
host_policy table the scheduler broadcasts each round
(frontier.select_fetchable).

Parsing scope (deliberately small, like real crawlers' fast path): the
`User-agent: *` section's `Crawl-delay:` and whether it disallows the
whole site (`Disallow: /`). Anything unparseable falls back to the
default policy — a crawler must stay polite when robots.txt is odd.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the `User-agent: *` section runs until the next User-agent line (or
# EOF). (?s) lets . cross newlines; the lazy body + lookahead mirror how
# urllib.robotparser groups records.
_STAR_SECTION = r"(?s)user-agent:\s*\*\s*\n(.*?)(?=user-agent:|\Z)"
_CRAWL_DELAY = r"crawl-delay:\s*([0-9]+(?:\.[0-9]+)?)"
_DISALLOW_ALL = r"(?m)^\s*disallow:\s*/\s*$"


def parse_robots(
    robots: DataFrame,
    txt_col: str = "robots_txt",
    default_delay_s: float = 5.0,
) -> DataFrame:
    """(host, robots_txt) -> (host, crawl_delay_s, robots_allow).

    Null/empty robots.txt (fetch failed, file absent) => allow with the
    default delay — the standard permissive interpretation."""
    lower = F.lower(F.coalesce(F.col(txt_col), F.lit("")))
    section = F.regexp_extract(lower, _STAR_SECTION, 1)
    delay_str = F.regexp_extract(section, _CRAWL_DELAY, 1)
    delay = F.when(delay_str == "", F.lit(default_delay_s)).otherwise(
        delay_str.cast("double")
    )
    allow = ~section.rlike(_DISALLOW_ALL)
    return robots.select(
        "host",
        delay.alias("crawl_delay_s"),
        allow.alias("robots_allow"),
    )


def refresh_host_policy(
    host_policy: DataFrame, parsed: DataFrame
) -> DataFrame:
    """Merge freshly parsed robots rows into the cached policy table —
    parsed values win, unknown hosts keep (or get) defaults. This is the
    'robots.txt cache' refresh: an outer join keyed on host, exactly the
    MERGE an Iceberg-backed policy table would run."""
    p = parsed.select(
        F.col("host").alias("r_host"),
        F.col("crawl_delay_s").alias("r_delay"),
        F.col("robots_allow").alias("r_allow"),
    )
    j = host_policy.join(p, host_policy["host"] == p["r_host"], "full_outer")
    return j.select(
        F.coalesce(host_policy["host"], F.col("r_host")).alias("host"),
        F.coalesce(F.col("r_delay"), host_policy["crawl_delay_s"], F.lit(5.0)).alias(
            "crawl_delay_s"
        ),
        F.coalesce(host_policy["max_concurrent"], F.lit(1)).alias("max_concurrent"),
        F.coalesce(F.col("r_allow"), host_policy["robots_allow"], F.lit(True)).alias(
            "robots_allow"
        ),
        F.coalesce(host_policy["cloudflare"], F.lit(False)).alias("cloudflare"),
    )
