"""robots.txt -> host policy (pure column expressions)."""

from pyspark.sql import Row

from crunchy_spark import robots, schemas


def _parse(spark, texts):
    df = spark.createDataFrame(
        [Row(host=f"h{i}.example.com", robots_txt=t) for i, t in enumerate(texts)]
    )
    return {r["host"]: r for r in robots.parse_robots(df).collect()}


def test_crawl_delay_and_allow(spark):
    out = _parse(
        spark,
        [
            "User-agent: *\nCrawl-delay: 2\nDisallow: /private\n",
            "User-agent: *\nDisallow: /\n",
            "User-agent: googlebot\nCrawl-delay: 9\n\nUser-agent: *\nCrawl-delay: 1.5\n",
            "",
            None,
            "totally not robots syntax",
        ],
    )
    assert out["h0.example.com"]["crawl_delay_s"] == 2.0
    assert out["h0.example.com"]["robots_allow"] is True  # partial disallow != site ban
    assert out["h1.example.com"]["robots_allow"] is False  # Disallow: /
    # only the * section applies, fractional delay parsed
    assert out["h2.example.com"]["crawl_delay_s"] == 1.5
    # empty / null / garbage => permissive default
    for h in ("h3.example.com", "h4.example.com", "h5.example.com"):
        assert out[h]["crawl_delay_s"] == 5.0
        assert out[h]["robots_allow"] is True


def test_case_insensitive_directives(spark):
    out = _parse(spark, ["USER-AGENT: *\nCRAWL-DELAY: 7\nDISALLOW: /\n"])
    r = out["h0.example.com"]
    assert r["crawl_delay_s"] == 7.0 and r["robots_allow"] is False


def test_refresh_host_policy_merge(spark):
    policy = spark.createDataFrame(
        [
            ("a.com", 5.0, 1, True, False),
            ("b.com", 5.0, 2, True, True),
        ],
        schema=schemas.HOST_POLICY,
    )
    parsed = spark.createDataFrame(
        [
            Row(host="a.com", crawl_delay_s=2.0, robots_allow=False),  # update
            Row(host="c.com", crawl_delay_s=1.0, robots_allow=True),  # new host
        ]
    )
    out = {r["host"]: r for r in robots.refresh_host_policy(policy, parsed).collect()}
    assert out["a.com"]["crawl_delay_s"] == 2.0
    assert out["a.com"]["robots_allow"] is False
    assert out["a.com"]["max_concurrent"] == 1
    # untouched host keeps its policy (incl. cloudflare flag)
    assert out["b.com"]["crawl_delay_s"] == 5.0 and out["b.com"]["cloudflare"] is True
    # new host gets parsed values + defaults
    assert out["c.com"]["crawl_delay_s"] == 1.0
    assert out["c.com"]["max_concurrent"] == 1 and out["c.com"]["cloudflare"] is False


def test_parsed_policy_drives_selection(spark):
    """End-to-end: a robots-banned host is never selected; a
    robots-slowed host gets the smaller budget."""
    from pyspark.sql import functions as F

    from crunchy_spark import datagen
    from crunchy_spark.frontier import seeds_to_frontier, select_fetchable

    seeds = spark.createDataFrame(datagen.gen_frontier_seed_pdf(200))
    pending = seeds_to_frontier(seeds, n_images=100)
    hosts = [r["host"] for r in pending.select("host").distinct().collect()]
    banned = sorted(hosts)[0]
    parsed = robots.parse_robots(
        spark.createDataFrame(
            [Row(host=banned, robots_txt="User-agent: *\nDisallow: /\n")]
        )
    )
    base = spark.createDataFrame(
        [(h, 5.0, 1, True, False) for h in hosts], schema=schemas.HOST_POLICY
    )
    policy = robots.refresh_host_policy(base, parsed)
    sel = select_fetchable(pending, policy, round_seconds=10.0)
    assert sel.filter(F.col("host") == banned).count() == 0
    assert sel.count() > 0
