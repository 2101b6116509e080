"""Query registry: every SURVEY.md §2 operator re-expressed over the
driver's TPC-H-ish tables, each with a DuckDB oracle twin.

Conventions (driver compares row-count + schema + order-insensitive
value-hash at sf=0.01):
- every computed column aliased identically in Spark and SQL
- doubles rounded (2 or 4 dp) in BOTH engines
- timestamps compared as epoch seconds (TZ-proof)
- arrays never output directly (joined to strings)
- md5-based int64 fingerprints (DuckDB 1.0 lacks sha1; the engine's
  crawl path itself uses SHA-1, see urlnorm.py)

Reference operators covered per query are cited inline (file:line of
/root/reference).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import scalars

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _md5_int(col):
    """Cross-engine int64 content hash (F19 analog; engine uses sha1)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


_MD5_INT_SQL = "(('0x' || substr(md5({c}), 1, 15))::UBIGINT)::BIGINT"


# ===========================================================================
# A. Relational core (P/A/J/W/O/U operators of SURVEY.md §2)
# ===========================================================================
@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           round(avg(l_extendedprice), 4)                               AS avg_price,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE epoch(l_shipdate) <= 904694400
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """A1/A4-style hash agg with partial+final combine (TPC-H Q1 shape).
    Ref analog: facet counts public/views.py:294-346."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.unix_timestamp("l_shipdate") <= 904694400)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "top_revenue_orders",
    """
    WITH rev AS (
      SELECT o.o_orderkey, epoch(o.o_orderdate)::BIGINT AS order_epoch,
             round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
      GROUP BY 1, 2)
    SELECT * FROM rev ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def top_revenue_orders(spark, sf_dir):
    """J1-style equi joins + agg + deterministic top-k (Q3 shape).
    Broadcast of the dimension side is Catalyst-automatic."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", F.unix_timestamp("o_orderdate").alias("order_epoch"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@register(
    "nation_revenue",
    """
    SELECT n.n_name AS nation, r.r_name AS region,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           count(*) AS n_lineitems
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
    """,
)
def nation_revenue(spark, sf_dir):
    """J9 analog: chained multi-hop equi self/dimension joins
    (knowledgeGraph/db.py:76-96 3-hop Cypher)."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "event_facets",
    """
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
    FROM events GROUP BY event_type
    """,
)
def event_facets(spark, sf_dir):
    """A1: facet count (Mongo $unwind/$group pipeline,
    public/views.py:294-346)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, rnk FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders) WHERE rnk <= 3
    """,
)
def top3_orders_per_customer(spark, sf_dir):
    """W4/W6: top-k per group (candidate cap [:20] resolve_entities.py:155-157,
    best-match argmax :134-164)."""
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


@register(
    "orders_page",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def orders_page(spark, sf_dir):
    """W5/O1: sorted pagination, page_size 100 (public/views.py:25-29)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@register(
    "customers_without_orders",
    "SELECT c_custkey FROM customer c WHERE NOT EXISTS "
    "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
)
def customers_without_orders(spark, sf_dir):
    """D2/J3: left_anti existence dedup (similar_companies.py:49-68)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@register(
    "customers_with_orders_by_nation",
    """
    SELECT c_nationkey AS nationkey, count(*) AS n_customers
    FROM customer c WHERE EXISTS
      (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
)
def customers_with_orders_by_nation(spark, sf_dir):
    """J3: left_semi existence flag (gather_data_from_tracxy.py:113-119)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "nation_golden_merge",
    """
    WITH cn AS (SELECT c_nationkey AS nk, count(*) AS n_cust,
                       round(avg(c_acctbal), 4) AS cust_bal FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, count(*) AS n_supp,
                       round(avg(s_acctbal), 4) AS supp_bal FROM supplier GROUP BY 1)
    SELECT coalesce(cn.nk, sn.nk) AS nationkey,
           coalesce(n_cust, 0)  AS n_cust,
           coalesce(n_supp, 0)  AS n_supp,
           coalesce(cust_bal, supp_bal) AS preferred_bal
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
)
def nation_golden_merge(spark, sf_dir):
    """J6: golden-record full-outer merge with per-field source priority
    (entity_resolver.py:225-301 SOURCE_PRIORITY coalesce)."""
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"), F.round(F.avg("c_acctbal"), 4).alias("cust_bal"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("snk"))
        .agg(F.count("*").alias("n_supp"), F.round(F.avg("s_acctbal"), 4).alias("supp_bal"))
    )
    j = c.join(s, c.nk == s.snk, "full_outer")
    return j.select(
        F.coalesce("nk", "snk").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        F.coalesce("cust_bal", "supp_bal").alias("preferred_bal"),
    )


@register(
    "price_band_filter",
    """
    SELECT o_orderpriority, count(*) AS n
    FROM orders
    WHERE coalesce(o_totalprice, 0) >= 50000 AND coalesce(o_totalprice, 0) <= 150000
    GROUP BY 1
    """,
)
def price_band_filter(spark, sf_dir):
    """P6: numeric range predicate over coalesced columns
    (public/views.py:136-154 funding range)."""
    o = _t(spark, sf_dir, "orders")
    p = F.coalesce(F.col("o_totalprice"), F.lit(0))
    return (
        o.filter((p >= 50000) & (p <= 150000))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


@register(
    "regex_filter_docs",
    """
    SELECT lang, count(*) AS n
    FROM documents
    WHERE regexp_matches(lower(text), 'hash.*join|scan.*filter')
    GROUP BY lang
    """,
)
def regex_filter_docs(spark, sf_dir):
    """P4: case-insensitive regex OR filter (Mongo $regex,
    public/views.py:98-165)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.filter(F.lower("text").rlike("hash.*join|scan.*filter"))
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
    )


@register(
    "distinct_langs",
    "SELECT DISTINCT lang FROM documents",
)
def distinct_langs(spark, sf_dir):
    """A3: distinct + sort (public/views.py:244-265)."""
    return _t(spark, sf_dir, "documents").select("lang").distinct()


@register(
    "first_event_per_user",
    """
    SELECT user_id, event_id FROM (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events) WHERE rn = 1
    """,
)
def first_event_per_user(spark, sf_dir):
    """W2: FIFO-within-partition ordering (queue.py:64-76)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id")
    )


@register(
    "sources_except_en",
    """
    SELECT source FROM documents
    EXCEPT
    SELECT source FROM documents WHERE lang = 'en'
    """,
)
def sources_except_en(spark, sf_dir):
    """U3: set difference (exclude-list, public/views.py:256-263)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("source").subtract(
        d.filter(F.col("lang") == "en").select("source")
    )


@register(
    "token_overlap_gate",
    """
    SELECT source, count(*) AS n
    FROM documents
    WHERE list_has_any(string_split_regex(lower(text), '\\s+'), ['spark', 'shuffle'])
    GROUP BY source
    """,
)
def token_overlap_gate(spark, sf_dir):
    """P10/U1: arrays_overlap interest gate (similar_companies.py:29-33)."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), r"\s+")
    return (
        d.filter(F.arrays_overlap(toks, F.array(F.lit("spark"), F.lit("shuffle"))))
        .groupBy("source")
        .agg(F.count("*").alias("n"))
    )


@register(
    "token_jaccard_vs_probe",
    """
    SELECT doc_id,
           round(len(list_intersect(toks, ['hash','join','scan','filter','sort']))::DOUBLE
                 / len(list_distinct(list_concat(toks, ['hash','join','scan','filter','sort']))), 4)
           AS jac
    FROM (SELECT doc_id, list_distinct(string_split_regex(lower(text), '\\s+')) AS toks
          FROM documents)
    """,
)
def token_jaccard_vs_probe(spark, sf_dir):
    """U2: Jaccard via array_intersect/array_union
    (founder jaccard, entity_resolver.py:113-122)."""
    d = _t(spark, sf_dir, "documents")
    probe = F.array(*[F.lit(t) for t in ["hash", "join", "scan", "filter", "sort"]])
    toks = F.array_distinct(F.split(F.lower("text"), r"\s+"))
    jac = F.round(
        F.size(F.array_intersect(toks, probe)).cast("double")
        / F.size(F.array_union(toks, probe)),
        4,
    )
    return d.select("doc_id", jac.alias("jac"))


# ===========================================================================
# B. Crawl-domain scalar/scheduler operators over synthesized columns
#    (both engines synthesize the identical column, then apply the op)
# ===========================================================================
_NOISE_SQL = "['/', '?utm=x', '#frag', ''][(c_custkey % 4)::INT + 1]"
_HOSTV_SQL = "['WWW.Acme', 'acme', 'Sub.Acme'][(c_custkey % 3)::INT + 1]"
_URL_SQL = (
    f"'https://' || {_HOSTV_SQL} || (c_custkey % 50)::VARCHAR || '.com/org/c' "
    f"|| c_custkey::VARCHAR || {_NOISE_SQL}"
)
_CANON_SQL = (
    "rtrim(regexp_replace(regexp_replace(lower({u}), '[?#].*$', ''),"
    " '://www\\.', '://'), '/')"
)


def _synth_url_col():
    noise = F.element_at(
        F.array(F.lit("/"), F.lit("?utm=x"), F.lit("#frag"), F.lit("")),
        (F.col("c_custkey") % 4 + 1).cast("int"),
    )
    hostv = F.element_at(
        F.array(F.lit("WWW.Acme"), F.lit("acme"), F.lit("Sub.Acme")),
        (F.col("c_custkey") % 3 + 1).cast("int"),
    )
    return F.concat(
        F.lit("https://"), hostv, (F.col("c_custkey") % 50).cast("string"),
        F.lit(".com/org/c"), F.col("c_custkey").cast("string"), noise,
    )


@register(
    "url_canonicalize",
    f"""
    WITH u AS (SELECT c_custkey, {_URL_SQL} AS url FROM customer)
    SELECT c_custkey, url, {_CANON_SQL.format(u='url')} AS url_canon FROM u
    """,
)
def url_canonicalize(spark, sf_dir):
    """D6/D7: RFC-3986-flavored canonicalization via the engine's
    Arrow-native UDF (TracxnDataParser.py:146-176, discovery.py:122-131;
    flavor bake-off in BENCH_CANON.md); oracle mirrors the semantics in
    pure SQL."""
    from .urlnorm import canonicalize_arrow_udf

    c = _t(spark, sf_dir, "customer").select("c_custkey", _synth_url_col().alias("url"))
    return c.withColumn("url_canon", canonicalize_arrow_udf(F.col("url")))


@register(
    "url_fingerprint",
    f"""
    WITH u AS (SELECT c_custkey, {_URL_SQL} AS url FROM customer),
         cn AS (SELECT c_custkey, {_CANON_SQL.format(u='url')} AS url_canon FROM u)
    SELECT c_custkey, url_canon, {_MD5_INT_SQL.format(c='url_canon')} AS fp
    FROM cn
    """,
)
def url_fingerprint(spark, sf_dir):
    """F19/D1: fingerprint over canonical URL as int64 partition key
    (dupefilter.py:35-44; engine path uses SHA-1, oracle-compatible md5 here)."""
    from .urlnorm import canonicalize_arrow_udf

    c = _t(spark, sf_dir, "customer").select("c_custkey", _synth_url_col().alias("url"))
    c = c.withColumn("url_canon", canonicalize_arrow_udf(F.col("url")))
    return c.select("c_custkey", "url_canon", _md5_int(F.col("url_canon")).alias("fp"))


_FUNDING_SQL = (
    "['$1.5M','₹1M','£179K','₩8B','CN¥13M','CA$3.9M','CZK13M','SEK30M','—','']"
    "[(o_orderkey % 10)::INT + 1]"
)


@register(
    "currency_parse",
    f"""
    WITH f AS (SELECT o_orderkey, {_FUNDING_SQL} AS funding FROM orders),
    p AS (SELECT o_orderkey, funding,
        regexp_extract(trim(funding), '^(CN¥|CA\\$|[A-Z]{{3}}|[€£₹₩$¥])', 1) AS pre,
        regexp_extract(trim(funding), '([0-9]+(?:\\.[0-9]+)?)', 1) AS amt_s,
        regexp_extract(trim(funding), '([KMB])\\s*$', 1) AS suf FROM f),
    q AS (SELECT o_orderkey, funding, amt_s, suf,
        CASE pre WHEN 'CN¥' THEN 'CNY' WHEN 'CA$' THEN 'CAD' WHEN '$' THEN 'USD'
                 WHEN '₹' THEN 'INR' WHEN '£' THEN 'GBP' WHEN '₩' THEN 'KRW'
                 WHEN '¥' THEN 'JPY' WHEN '€' THEN 'EUR'
                 ELSE CASE WHEN length(pre)=3 THEN pre END END AS code FROM p)
    SELECT o_orderkey, funding, code,
        round((CASE WHEN amt_s='' THEN NULL ELSE amt_s::DOUBLE END)
          * (CASE suf WHEN 'K' THEN 1e3 WHEN 'M' THEN 1e6 WHEN 'B' THEN 1e9 ELSE 1.0 END)
          / (CASE code WHEN 'USD' THEN 1.0 WHEN 'EUR' THEN 0.92 WHEN 'GBP' THEN 0.79
                       WHEN 'INR' THEN 83.1 WHEN 'KRW' THEN 1330.0 WHEN 'CNY' THEN 7.2
                       WHEN 'CAD' THEN 1.36 WHEN 'CZK' THEN 23.0 WHEN 'SEK' THEN 10.4
                       WHEN 'JPY' THEN 150.0 END), 2) AS funding_usd
    FROM q
    """,
)
def currency_parse(spark, sf_dir):
    """F2: currency symbol/code/multiplier parse + pinned-rate conversion
    (utils/Currency.py:67-91, gather_data_from_crunchy.py:41-86)."""
    from .datagen import FUNDING_CORPUS

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.element_at(
            F.array(*[F.lit(x) for x in FUNDING_CORPUS]),
            (F.col("o_orderkey") % 10 + 1).cast("int"),
        ).alias("funding"),
    )
    return o.select(
        "o_orderkey",
        "funding",
        scalars.currency_code_col(F.col("funding")).alias("code"),
        scalars.funding_usd_col(F.col("funding")).alias("funding_usd"),
    )


_FOUNDED_SQL = (
    "['2018','Aug2015','Jan1,2015','Nov30,2016','','garbage'][(o_orderkey % 6)::INT + 1]"
)


@register(
    "founded_parse",
    f"""
    WITH f AS (SELECT o_orderkey, {_FOUNDED_SQL} AS founded FROM orders)
    SELECT o_orderkey, founded,
      strftime(coalesce(
        try_strptime(founded, '%b%d,%Y'),
        try_strptime(founded, '%b%Y'),
        CASE WHEN regexp_matches(founded, '^(19|20)\\d{{2}}$')
             THEN try_strptime(founded, '%Y') END), '%Y-%m-%d') AS founded_iso
    FROM f
    """,
)
def founded_parse(spark, sf_dir):
    """F3: multi-format founded-date parse, None on garbage
    (utils/Founded.py:7-35)."""
    from .datagen import FOUNDED_CORPUS

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.element_at(
            F.array(*[F.lit(x) for x in FOUNDED_CORPUS]),
            (F.col("o_orderkey") % 6 + 1).cast("int"),
        ).alias("founded"),
    )
    return o.select(
        "o_orderkey",
        "founded",
        F.date_format(scalars.founded_date_col(F.col("founded")), "yyyy-MM-dd").alias(
            "founded_iso"
        ),
    )


@register(
    "year_extract",
    """
    WITH t AS (SELECT c_custkey,
        'Founded in ' || (1990 + (c_custkey % 40))::VARCHAR || ' by team.' AS blurb
        FROM customer)
    SELECT c_custkey, regexp_extract(blurb, '\\b((19|20)\\d{2})\\b', 1)::INT AS yr FROM t
    """,
)
def year_extract(spark, sf_dir):
    """F4: year extraction regex (entity_resolver.py:136-147)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(
            F.lit("Founded in "),
            (F.lit(1990) + F.col("c_custkey") % 40).cast("string"),
            F.lit(" by team."),
        ).alias("blurb"),
    )
    return c.select("c_custkey", scalars.founded_year_col(F.col("blurb")).alias("yr"))


_LEGAL_SQL = "['inc','incorporated','llc','ltd','limited','corp','corporation','co','company','gmbh','sa','plc','ag','bv','pvt','pte','srl']"


@register(
    "name_normalize",
    f"""
    WITH t AS (SELECT c_custkey,
        ['Acme','Beta Labs','Gamma'][(c_custkey % 3)::INT + 1] || ' ' ||
        ['Inc.','LLC','Ltd','Corp','and Co'][(c_custkey % 5)::INT + 1] AS name
        FROM customer)
    SELECT c_custkey, name,
      array_to_string(list_filter(
        string_split_regex(trim(regexp_replace(lower(name), '[^a-z0-9\\s]', '', 'g')), '\\s+'),
        t -> t <> '' AND NOT list_contains({_LEGAL_SQL}, t)), ' ') AS norm
    FROM t
    """,
)
def name_normalize(spark, sf_dir):
    """F5: lowercase + punctuation strip + legal-suffix drop
    (entity_resolver.py:27-31,53-73)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(
            F.element_at(
                F.array(F.lit("Acme"), F.lit("Beta Labs"), F.lit("Gamma")),
                (F.col("c_custkey") % 3 + 1).cast("int"),
            ),
            F.lit(" "),
            F.element_at(
                F.array(F.lit("Inc."), F.lit("LLC"), F.lit("Ltd"), F.lit("Corp"), F.lit("and Co")),
                (F.col("c_custkey") % 5 + 1).cast("int"),
            ),
        ).alias("name"),
    )
    return c.select(
        "c_custkey", "name", scalars.normalized_name_col(F.col("name")).alias("norm")
    )


_SUFX_SQL = "(co\\.uk|org\\.uk|ac\\.uk|com\\.au|com\\.br|co\\.in|co\\.jp|com\\.cn)"


@register(
    "normalized_domain",
    f"""
    WITH t AS (SELECT c_custkey,
        'https://' || ['WWW.Acme','sub.Beta','gamma'][(c_custkey % 3)::INT + 1]
        || (c_custkey % 20)::VARCHAR
        || ['.com','.co.uk','.io'][((c_custkey % 9) // 3)::INT + 1] || '/about' AS url
        FROM customer),
    h AS (SELECT c_custkey, url,
        regexp_replace(lower(regexp_extract(url,
            '^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#:]*)', 1)), '^www\\.', '') AS host
        FROM t)
    SELECT c_custkey, url,
      CASE WHEN regexp_extract(host, '([^.]+\\.{_SUFX_SQL})$', 1) <> ''
             THEN regexp_extract(host, '([^.]+\\.{_SUFX_SQL})$', 1)
           WHEN regexp_extract(host, '([^.]+\\.[^.]+)$', 1) <> ''
             THEN regexp_extract(host, '([^.]+\\.[^.]+)$', 1)
           ELSE host END AS domain
    FROM h
    """,
)
def normalized_domain(spark, sf_dir):
    """F1: tldextract-style registered-domain normalization
    (utils/domain.py:6-32)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(
            F.lit("https://"),
            F.element_at(
                F.array(F.lit("WWW.Acme"), F.lit("sub.Beta"), F.lit("gamma")),
                (F.col("c_custkey") % 3 + 1).cast("int"),
            ),
            (F.col("c_custkey") % 20).cast("string"),
            F.element_at(
                F.array(F.lit(".com"), F.lit(".co.uk"), F.lit(".io")),
                (F.floor((F.col("c_custkey") % 9) / 3) + 1).cast("int"),
            ),
            F.lit("/about"),
        ).alias("url"),
    )
    return c.select(
        "c_custkey", "url", scalars.normalized_domain_col(F.col("url")).alias("domain")
    )


@register(
    "politeness_schedule",
    """
    WITH fr AS (SELECT o_orderkey AS seq, o_orderkey AS sha_int,
                       (o_orderkey % 3)::INT AS queue_rank,
                       'h' || (o_custkey % 20)::VARCHAR AS host
                FROM orders)
    SELECT host, seq, queue_rank FROM (
      SELECT host, seq, queue_rank,
             row_number() OVER (PARTITION BY host ORDER BY queue_rank, seq) AS rn
      FROM fr) WHERE rn <= 5
    """,
)
def politeness_schedule(spark, sf_dir):
    """W3: per-host politeness budget via the engine's scheduler pop
    (select_fetchable auto mode — the plan-time budget literal qualifies
    for InferWindowGroupLimit, so this compiles to a single window whose
    partial WindowGroupLimit caps every host per map partition before
    the exchange; hosts beyond the rewrite threshold fall back to the
    two-phase salted path). Oracle is the definitional single window.
    Reference: DOWNLOAD_DELAY/CONCURRENT_REQUESTS settings.py:122-130."""
    from .frontier import select_fetchable

    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("seq"),
        F.col("o_orderkey").alias("sha_int"),
        (F.col("o_orderkey") % 3).cast("int").alias("queue_rank"),
        F.concat(F.lit("h"), (F.col("o_custkey") % 20).cast("string")).alias("host"),
    )
    policy = (
        o.select("host")
        .distinct()
        .select(
            "host",
            F.lit(2.0).alias("crawl_delay_s"),
            F.lit(1).alias("max_concurrent"),
            F.lit(True).alias("robots_allow"),
            F.lit(False).alias("cloudflare"),
        )
    )
    sel = select_fetchable(o, policy, round_seconds=10.0, salt_k=4)
    return sel.select("host", "seq", "queue_rank")


@register(
    "backoff_schedule",
    """
    WITH a AS (SELECT o_orderkey, (o_orderkey % 6)::INT AS attempt FROM orders)
    SELECT o_orderkey, attempt,
      round(least(300.0, power(2.0, attempt)) *
            (0.5 + 0.5 * ((attempt * 2654435761) % 1000) / 1000.0), 4) AS delay_s
    FROM a
    """,
)
def backoff_schedule(spark, sf_dir):
    """F16: capped exponential backoff with deterministic jitter
    (expire.py:150-162; jitter seeded, not random, for replayability)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", (F.col("o_orderkey") % 6).cast("int").alias("attempt")
    )
    delay = F.round(
        F.least(F.lit(300.0), F.pow(F.lit(2.0), F.col("attempt")))
        * (0.5 + 0.5 * ((F.col("attempt") * 2654435761) % 1000) / 1000.0),
        4,
    )
    return o.select("o_orderkey", "attempt", delay.alias("delay_s"))


# ===========================================================================
# C. Training-data pipeline operators (dedup, text analysis, similarity)
# ===========================================================================
_TOKS_SQL = "list_distinct(string_split_regex(lower(text), '\\s+'))"


def _toks_col():
    return F.array_distinct(F.split(F.lower("text"), r"\s+"))


@register(
    "dedup_exact",
    f"""
    SELECT min(doc_id) AS canonical_id, count(*) AS n_dups,
           {_MD5_INT_SQL.format(c='text')} AS content_fp
    FROM documents GROUP BY content_fp
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on content fingerprint, keep min doc_id
    (training-data op; reference analog: Mongo upsert dedup by key,
    gather_data_from_crunchy.py:144-146)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.withColumn("content_fp", _md5_int(F.col("text")))
        .groupBy("content_fp")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_dups"))
        .select("canonical_id", "n_dups", "content_fp")
    )


def _minhash_select_sql(n_perm: int = 8) -> str:
    mins = ", ".join(
        f"min({_MD5_INT_SQL.format(c=f_seed)}) AS mh{i}"
        for i, f_seed in (
            (i, f"('{i}:' || tok)") for i in range(n_perm)
        )
    )
    return f"""
    SELECT doc_id, {mins}
    FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents)
    GROUP BY doc_id
    """


def _minhash_sigs(spark, sf_dir, n_perm: int = 8):
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_toks_col()).alias("tok"))
    aggs = [
        F.min(_md5_int(F.concat(F.lit(f"{i}:"), F.col("tok")))).alias(f"mh{i}")
        for i in range(n_perm)
    ]
    return tok.groupBy("doc_id").agg(*aggs)


@register("minhash_signatures", _minhash_select_sql(8))
def minhash_signatures(spark, sf_dir):
    """MinHash signatures (8 permutations via seeded md5 double-hashing)
    over unigram token sets — the shingle->minhash step of near-dup
    detection (SURVEY.md training-data ops; reference has only exact
    dedup, dupefilter.py:35-44)."""
    return _minhash_sigs(spark, sf_dir, 8)


_B0 = " || '_' || ".join(f"mh{i}::VARCHAR" for i in range(8))
_B1 = " || '_' || ".join(f"mh{i}::VARCHAR" for i in range(8, 16))


_SIG_AGREE_SQL = " + ".join(f"(sa.mh{i} = sb.mh{i})::INT" for i in range(16))


@register(
    "minhash_lsh_pairs",
    f"""
    WITH sig AS ({_minhash_select_sql(16)}),
    bands AS (
      SELECT doc_id, md5({_B0}) AS band FROM sig
      UNION ALL
      SELECT doc_id, md5({_B1}) AS band FROM sig),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
    agreed AS (
      SELECT c.a_id, c.b_id FROM cand c
      JOIN sig sa ON sa.doc_id = c.a_id
      JOIN sig sb ON sb.doc_id = c.b_id
      WHERE ({_SIG_AGREE_SQL}) >= 10),
    toks AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
    SELECT a_id, b_id,
           round(len(list_intersect(ta.toks, tb.toks))::DOUBLE
                 / len(list_distinct(list_concat(ta.toks, tb.toks))), 4) AS jac
    FROM agreed JOIN toks ta ON ta.doc_id = a_id JOIN toks tb ON tb.doc_id = b_id
    WHERE len(list_intersect(ta.toks, tb.toks))::DOUBLE
          / len(list_distinct(list_concat(ta.toks, tb.toks))) >= 0.9
    """,
)
def minhash_lsh_pairs(spark, sf_dir):
    """MinHash+LSH near-dup pairs: 16 permutations, 2 bands of 8 ->
    bucket-join -> signature-agreement prefilter (>= 10/16 matching
    minhashes, i.e. estimated Jaccard >= 0.625 — 16 int compares per pair
    instead of two array-set ops) -> verify true Jaccard >= 0.9. Only
    banded+agreed candidates are set-verified, never all O(n^2) pairs;
    on this intrinsically-similar corpus (median pairwise Jaccard 0.57)
    the bands alone pass ~19% of pairs and the agreement filter cuts the
    expensive verification to a sliver. The prefilter is part of the
    operator's definition (mirrored in the oracle), with a documented
    false-negative rate: a true J=0.9 pair has signature agreement ~
    Binomial(16, 0.9), so P(agreement <= 9) ~ 1.7e-4 — about 1 in 6,000
    borderline pairs dropped (at J=0.95 it is ~2e-6). The previous
    >= 12 cut lost ~0.5% of J=0.9 pairs; >= 10 keeps the verify-cost win
    while making the recall loss negligible."""
    sig = _minhash_sigs(spark, sf_dir, 16).localCheckpoint()

    def band(cols):
        return F.md5(F.concat_ws("_", *[F.col(c).cast("string") for c in cols]))

    b0 = sig.select("doc_id", band([f"mh{i}" for i in range(8)]).alias("band"))
    b1 = sig.select("doc_id", band([f"mh{i}" for i in range(8, 16)]).alias("band"))
    bands = b0.unionByName(b1)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    siga = sig.select(F.col("doc_id").alias("a_id"), *[F.col(f"mh{i}").alias(f"a{i}") for i in range(16)])
    sigb = sig.select(F.col("doc_id").alias("b_id"), *[F.col(f"mh{i}").alias(f"b{i}") for i in range(16)])
    cj = cand.join(siga, "a_id").join(sigb, "b_id")
    agree = None
    for i in range(16):
        t = (F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
        agree = t if agree is None else agree + t
    agreed = cj.filter(agree >= 10).select("a_id", "b_id")
    d = _t(spark, sf_dir, "documents").select("doc_id", _toks_col().alias("toks")).localCheckpoint()
    j = (
        agreed.join(d.select(F.col("doc_id").alias("a_id"), F.col("toks").alias("ta")), "a_id")
        .join(d.select(F.col("doc_id").alias("b_id"), F.col("toks").alias("tb")), "b_id")
    )
    jac = F.size(F.array_intersect("ta", "tb")).cast("double") / F.size(
        F.array_union("ta", "tb")
    )
    return (
        j.withColumn("jac_raw", jac)
        .filter(F.col("jac_raw") >= 0.9)
        .select("a_id", "b_id", F.round("jac_raw", 4).alias("jac"))
    )


def _simhash_sql(n_bits: int = 16) -> str:
    h = _MD5_INT_SQL.format(c="tok")
    sums = " + ".join(
        f"(CASE WHEN sum(CASE WHEN ({h} >> {i}) & 1 = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(n_bits)
    )
    return f"""
    SELECT doc_id, ({sums})::BIGINT AS simhash
    FROM (SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents)
    GROUP BY doc_id
    """


@register("simhash", _simhash_sql(16))
def simhash(spark, sf_dir):
    """SimHash document fingerprint (16-bit demo width): per-bit weighted
    sums of token hashes — near-dup family op."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(_toks_col()).alias("tok"))
    h = _md5_int(F.col("tok"))
    bit_sums = [
        F.sum(F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(
            f"b{i}"
        )
        for i in range(16)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for i in range(16):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


_EN_STOPS = ["the", "a", "key", "row"]
_DE_STOPS = ["small", "data", "line"]
_FR_STOPS = ["order", "query", "group"]


@register(
    "lang_id",
    f"""
    WITH s AS (
      SELECT doc_id, lang,
        len(list_filter({_TOKS_SQL}, t -> list_contains({_EN_STOPS!r}, t))) AS en_n,
        len(list_filter({_TOKS_SQL}, t -> list_contains({_DE_STOPS!r}, t))) AS de_n,
        len(list_filter({_TOKS_SQL}, t -> list_contains({_FR_STOPS!r}, t))) AS fr_n
      FROM documents)
    SELECT doc_id, lang,
      CASE WHEN en_n >= de_n AND en_n >= fr_n THEN 'en'
           WHEN de_n >= fr_n THEN 'de' ELSE 'fr' END AS pred_lang
    FROM s
    """.replace("'", "'").replace('["', "['").replace('"]', "']"),
)
def lang_id(spark, sf_dir):
    """Language-ID heuristic: stopword-membership scores + argmax
    (training-data op; deterministic across engines — the synthetic corpus
    shares vocab so accuracy is not the point, the operator is)."""
    d = _t(spark, sf_dir, "documents")
    toks = _toks_col()

    def score(stops):
        arr = F.array(*[F.lit(s) for s in stops])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    en, de, fr = score(_EN_STOPS), score(_DE_STOPS), score(_FR_STOPS)
    pred = (
        F.when((en >= de) & (en >= fr), F.lit("en"))
        .when(de >= fr, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return d.select("doc_id", "lang", pred.alias("pred_lang"))


@register(
    "quality_score",
    f"""
    WITH m AS (
      SELECT doc_id,
        length(text) AS n_chars_q,
        len(string_split_regex(lower(text), '\\s+')) AS n_toks,
        length(regexp_replace(text, '[^.!?,;]', '', 'g')) AS n_punct,
        len(list_filter(string_split_regex(lower(text), '\\s+'),
            t -> list_contains({_EN_STOPS!r}, t))) AS n_stop
      FROM documents)
    SELECT doc_id, n_chars_q, n_toks,
      round(0.3 * least(1.0, n_chars_q / 200.0)
          + 0.3 * (1.0 - n_punct::DOUBLE / greatest(n_chars_q, 1))
          + 0.4 * (n_stop::DOUBLE / greatest(n_toks, 1)), 4) AS qscore
    FROM m
    """.replace('["', "['").replace('"]', "']"),
)
def quality_score(spark, sf_dir):
    """Document quality scoring: length/punctuation/stopword ratios
    (training-data op)."""
    d = _t(spark, sf_dir, "documents")
    toks_all = F.split(F.lower("text"), r"\s+")
    stops = F.array(*[F.lit(s) for s in _EN_STOPS])
    n_chars = F.length("text")
    n_toks = F.size(toks_all)
    n_punct = F.length(F.regexp_replace(F.col("text"), r"[^.!?,;]", ""))
    n_stop = F.size(F.filter(toks_all, lambda t: F.array_contains(stops, t)))
    q = F.round(
        0.3 * F.least(F.lit(1.0), n_chars / 200.0)
        + 0.3 * (1.0 - n_punct.cast("double") / F.greatest(n_chars, F.lit(1)))
        + 0.4 * (n_stop.cast("double") / F.greatest(n_toks, F.lit(1))),
        4,
    )
    return d.select(
        "doc_id",
        n_chars.alias("n_chars_q"),
        n_toks.alias("n_toks"),
        q.alias("qscore"),
    )


@register(
    "token_count",
    """
    SELECT doc_id,
      len(string_split_regex(lower(text), '\\s+')) AS n_ws_tokens,
      len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_word_tokens
    FROM documents
    """,
)
def token_count(spark, sf_dir):
    """Token counting: whitespace split + BPE-ish regex token count
    (training-data op)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split(F.lower("text"), r"\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), F.lit(0))).alias(
            "n_word_tokens"
        ),
    )


@register(
    "doc_fingerprint",
    """
    WITH d AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
               FROM documents)
    SELECT d.doc_id,
      sum(gs.i * (ascii(substr(d.toks[gs.i], 1, 1)) * 31 + length(d.toks[gs.i])))::BIGINT AS fp
    FROM d, generate_series(1, 16) AS gs(i)
    WHERE gs.i <= len(d.toks)
    GROUP BY d.doc_id
    """,
)
def doc_fingerprint(spark, sf_dir):
    """Rolling/positional document fingerprint over the first 16 tokens
    (training-data op: cheap content identity)."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.slice(F.split(F.lower("text"), r"\s+"), 1, 16).alias("toks")
    )
    e = d.select("doc_id", F.posexplode("toks").alias("pos", "tok"))
    term = (F.col("pos") + 1) * (
        F.ascii(F.substring("tok", 1, 1)) * 31 + F.length("tok")
    )
    return e.groupBy("doc_id").agg(F.sum(term).cast("long").alias("fp"))


_TO_D = "list_transform({c}, x -> x::DOUBLE)"


@register(
    "ann_cosine_topk",
    f"""
    WITH q AS (SELECT {_TO_D.format(c='embedding')} AS qe FROM embeddings WHERE vec_id = 0),
    s AS (SELECT vec_id,
        round(list_dot_product({_TO_D.format(c='embedding')}, qe)
          / (sqrt(list_dot_product({_TO_D.format(c='embedding')}, {_TO_D.format(c='embedding')}))
             * sqrt(list_dot_product(qe, qe))), 4) AS cos_sim
      FROM embeddings, q WHERE vec_id <> 0)
    SELECT vec_id, cos_sim FROM s ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
)
def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k over the embedding column — the exact
    baseline for similarity search (training-data op). JVM-side
    zip_with/aggregate, no Python in the loop."""
    e = _t(spark, sf_dir, "embeddings")

    def to_d(c):
        return F.transform(c, lambda x: x.cast("double"))

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)

    q = e.filter(F.col("vec_id") == 0).select(to_d(F.col("embedding")).alias("qe"))
    j = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    emb = to_d(F.col("embedding"))
    sim = F.round(
        dot(emb, F.col("qe"))
        / (F.sqrt(dot(emb, emb)) * F.sqrt(dot(F.col("qe"), F.col("qe")))),
        4,
    )
    return (
        j.select("vec_id", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


_BUCKET_SQL = " || ".join(
    f"(CASE WHEN embedding[{8 * i + 1}] > 0 THEN '1' ELSE '0' END)" for i in range(8)
)

# multi-probe neighbor buckets: qb plus qb with bit i flipped, i=1..8
_PROBES_SQL = "\n      UNION ALL ".join(
    ["SELECT qe, qb AS pb FROM q"]
    + [
        f"""SELECT qe, substr(qb, 1, {i - 1})
            || (CASE WHEN substr(qb, {i}, 1) = '1' THEN '0' ELSE '1' END)
            || substr(qb, {i + 1}) AS pb FROM q"""
        for i in range(1, 9)
    ]
)


@register(
    "ann_lsh_bucket_topk",
    f"""
    WITH b AS (SELECT vec_id, {_TO_D.format(c='embedding')} AS emb,
                      ({_BUCKET_SQL}) AS bucket FROM embeddings),
    q AS (SELECT emb AS qe, bucket AS qb FROM b WHERE vec_id = 0),
    probes AS ({_PROBES_SQL}),
    s AS (SELECT vec_id,
        round(list_dot_product(emb, qe)
          / (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(qe, qe))), 4) AS cos_sim
      FROM b JOIN probes ON b.bucket = probes.pb WHERE vec_id <> 0)
    SELECT vec_id, cos_sim FROM s ORDER BY cos_sim DESC, vec_id LIMIT 5
    """,
)
def ann_lsh_bucket_topk(spark, sf_dir):
    """Multi-probe sign-bit LSH ANN: candidates come from the query's
    8-bit hyperoctant bucket PLUS its 8 Hamming-1 neighbor buckets
    (multi-probe LSH — the standard recall fix that keeps the bucket
    equi-join instead of widening to a scan). 9 probe keys replace the
    O(n) brute-force pass; expected candidates ~ 9n/256 ~ 3.5% of the
    corpus per query, and the exact cosine re-rank is O(candidates).
    The probe set broadcasts (9 rows), so the candidate join is a
    broadcast hash join against the bucketed corpus at any scale."""
    e = _t(spark, sf_dir, "embeddings")

    def to_d(c):
        return F.transform(c, lambda x: x.cast("double"))

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)

    bucket = F.concat(
        *[
            F.when(F.col("embedding").getItem(8 * i) > 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(8)
        ]
    )
    b = e.select("vec_id", to_d(F.col("embedding")).alias("emb"), bucket.alias("bucket"))
    q = b.filter(F.col("vec_id") == 0).select(
        F.col("emb").alias("qe"), F.col("bucket").alias("qb")
    )
    flip = lambda i: F.concat(  # noqa: E731
        F.substring("qb", 1, i - 1),
        F.when(F.substring("qb", i, 1) == "1", F.lit("0")).otherwise(F.lit("1")),
        F.substring("qb", i + 1, 8),
    )
    probes = q.select(
        "qe",
        F.explode(F.array(F.col("qb"), *[flip(i) for i in range(1, 9)])).alias("pb"),
    )
    j = b.filter(F.col("vec_id") != 0).join(
        F.broadcast(probes), F.col("bucket") == F.col("pb")
    )
    sim = F.round(
        dot(F.col("emb"), F.col("qe"))
        / (F.sqrt(dot(F.col("emb"), F.col("emb"))) * F.sqrt(dot(F.col("qe"), F.col("qe")))),
        4,
    )
    return (
        j.select("vec_id", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(5)
    )


# ---------------------------------------------------------------------------
# IVF coarse quantizer: 16 fixed, seeded, 8-sparse +/-1 centroid
# directions shared verbatim by Spark and the DuckDB oracle. Assignment
# is argmax centroid-dot; no iterative kmeans — deterministic, and at
# scale centroids would come from a sampled kmeans fit broadcast the
# same way.
# ---------------------------------------------------------------------------
def _ivf_spec(n_cells: int = 16, nnz: int = 8, dim: int = 64, seed: int = 11):
    import numpy as np

    rng = np.random.RandomState(seed)
    return [
        list(
            zip(
                rng.choice(dim, size=nnz, replace=False).tolist(),
                rng.choice([-1.0, 1.0], size=nnz).tolist(),
            )
        )
        for _ in range(n_cells)
    ]


_IVF_SPEC = _ivf_spec()


def _ivf_dot_cols(col: str = "embedding"):
    # Spark-SQL strings parsed JVM-side (one F.expr per cell) — the
    # Column-object construction alternative costs ~0.5s of py4j round
    # trips per call site; same left-assoc arithmetic either way.
    return [
        F.expr(
            " + ".join(
                f"({s:+.1f}D * CAST(element_at({col}, {d + 1}) AS DOUBLE))"
                for d, s in spec
            )
        )
        for spec in _IVF_SPEC
    ]


def _ivf_dots_sql() -> str:
    outs = []
    for spec in _IVF_SPEC:
        outs.append(
            " + ".join(
                f"({s:+.1f} * (embedding[{d + 1}]::DOUBLE))" for d, s in spec
            )
        )
    return "[" + ", ".join(outs) + "]"


IVF_NPROBE = 2  # cells searched per query (multi-probe, like LSH's)


def _ivf_cells(e: DataFrame) -> DataFrame:
    """(vec_id, emb:double[], cell) — coarse-quantizer cell assignment
    by argmax dot against the fixed seeded centroid directions. Ties
    resolve to the first max index, same as DuckDB's list_position."""
    dots = F.array(*_ivf_dot_cols())
    return e.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
        F.array_position(dots, F.array_max(dots)).alias("cell"),
    )


def _ivf_query_cells(e: DataFrame, nprobe: int = IVF_NPROBE) -> DataFrame:
    """(qe, qcell) — the query vector with its ``nprobe`` best cells by
    centroid dot (descending dot, position tiebreak): one row per
    probed cell, each carrying the query embedding so a single
    broadcast join both routes and scores."""
    q = e.filter(F.col("vec_id") == 0).select(
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("qe")
    )
    return (
        q.select("qe", F.posexplode(F.array(*_ivf_dot_cols("qe"))))
        .orderBy(F.desc("col"), "pos")
        .limit(nprobe)
        .select("qe", (F.col("pos") + 1).alias("qcell"))
    )


def _ivf_recall_stats(
    e: DataFrame, nprobe: int, query_ids: list[int]
) -> dict[str, float]:
    """Measured IVF quality on corpus ``e``: mean scanned fraction and
    mean recall@5 (vs exact cosine top-5) over ``query_ids``.

    All Spark-side: exact ground truth is a broadcast of the
    |query_ids| query vectors against the corpus (linear), probed cells
    a per-query top-``nprobe`` window. On a corpus whose neighbors are
    weakly similar (near-orthogonal random vectors), recall ~ scanned
    fraction for ANY coarse quantizer — the planted-cluster test in
    tests/test_ivf.py pins the same machinery at a 4-6x recall lift
    over chance scanning when neighbors are actually near."""
    cells = _ivf_cells(e)
    qs = cells.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"), F.col("emb").alias("qe")
    )

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)

    pairs = cells.join(F.broadcast(qs), F.col("vec_id") != F.col("qid"))
    sim = dot(F.col("emb"), F.col("qe")) / (
        F.sqrt(dot(F.col("emb"), F.col("emb"))) * F.sqrt(dot(F.col("qe"), F.col("qe")))
    )
    w5 = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "vec_id")
    top5 = (
        pairs.select("qid", "vec_id", "cell", sim.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w5))
        .filter(F.col("rnk") <= 5)
    )
    qdots = qs.select("qid", F.posexplode(F.array(*_ivf_dot_cols("qe"))))
    wp = Window.partitionBy("qid").orderBy(F.desc("col"), "pos")
    qcells = (
        qdots.withColumn("prnk", F.row_number().over(wp))
        .filter(F.col("prnk") <= nprobe)
        .select(F.col("qid").alias("pqid"), (F.col("pos") + 1).alias("qcell"))
    )
    hits = top5.join(
        qcells,
        (F.col("qid") == F.col("pqid")) & (F.col("cell") == F.col("qcell")),
        "left_semi",
    ).count()
    n_corpus = cells.count()
    scanned = (
        cells.join(
            F.broadcast(qcells), F.col("cell") == F.col("qcell")
        ).count()
    )
    nq = len(query_ids)
    return {
        "scanned_fraction": round(scanned / (n_corpus * nq), 4),
        "recall_at_5": round(hits / (5 * nq), 3),
    }


@register(
    "ann_ivf_topk",
    f"""
    WITH base AS (SELECT vec_id, {_TO_D.format(c='embedding')} AS emb,
                         {_ivf_dots_sql()} AS dots
                  FROM embeddings),
    cells AS (SELECT vec_id, emb,
                     list_position(dots, list_max(dots)) AS cell
              FROM base),
    q AS (SELECT emb AS qe, dots AS qdots FROM base WHERE vec_id = 0),
    qtop AS (SELECT qe, r.i AS qcell
             FROM q, range(1, {len(_IVF_SPEC) + 1}) r(i)
             ORDER BY qdots[r.i] DESC, r.i LIMIT {IVF_NPROBE}),
    s AS (SELECT vec_id,
        round(list_dot_product(emb, qe)
          / (sqrt(list_dot_product(emb, emb)) * sqrt(list_dot_product(qe, qe))), 4) AS cos_sim
      FROM cells JOIN qtop ON cells.cell = qtop.qcell
      WHERE vec_id <> 0)
    SELECT vec_id, cos_sim FROM s ORDER BY cos_sim DESC, vec_id LIMIT 5
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF-style ANN: a 16-cell coarse quantizer (argmax dot against
    fixed seeded centroid directions) partitions the corpus; the query
    probes its IVF_NPROBE=2 best cells by centroid dot, exact-cosine
    re-ranked. The inverted-file counterpart to the LSH route: cell id
    is a materializable partition key, so at scale the corpus is
    written bucketed by cell and a query touches nprobe partitions —
    the probed-cell list is a 2-row broadcast, so routing adds no
    shuffle. That story is EVIDENCED, not just claimed:
    tests/test_ivf.py::test_bucketed_cell_corpus_prunes_to_nprobe_buckets
    writes the corpus bucketBy(cell) and asserts the probe scan reads
    SelectedBucketsCount = nprobe out of 16 with identical results. Both engines compute the same argmax / top-nprobe over the
    same left-assoc double sums, so cell choice is bit-identical —
    ties resolve to the first max index (array_position/list_position)
    and the probe order ties break on cell position in both."""
    e = _t(spark, sf_dir, "embeddings")

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)

    cells = _ivf_cells(e)
    j = cells.filter(F.col("vec_id") != 0).join(
        F.broadcast(_ivf_query_cells(e)), F.col("cell") == F.col("qcell")
    )
    sim = F.round(
        dot(F.col("emb"), F.col("qe"))
        / (F.sqrt(dot(F.col("emb"), F.col("emb"))) * F.sqrt(dot(F.col("qe"), F.col("qe")))),
        4,
    )
    return (
        j.select("vec_id", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(5)
    )


@register(
    "embedding_norms",
    f"""
    SELECT vec_id, label,
      round(sqrt(list_dot_product({_TO_D.format(c='embedding')},
                                  {_TO_D.format(c='embedding')})), 4) AS l2
    FROM embeddings
    """,
)
def embedding_norms(spark, sf_dir):
    """Vector scalar op: L2 norm per embedding (JVM-side fold)."""
    e = _t(spark, sf_dir, "embeddings")

    def to_d(c):
        return F.transform(c, lambda x: x.cast("double"))

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)

    emb = to_d(F.col("embedding"))
    return e.select("vec_id", "label", F.round(F.sqrt(dot(emb, emb)), 4).alias("l2"))


@register(
    "event_sessions",
    """
    WITH g AS (
      SELECT user_id, event_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_new
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (SELECT user_id, event_id,
        sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g)
    SELECT user_id, max(session_id)::BIGINT AS n_sessions, count(*) AS n_events
    FROM s GROUP BY user_id
    """,
)
def event_sessions(spark, sf_dir):
    """Sessionization: lag-gap > 30min starts a new session (streaming
    analog of session_window; batch form here, see streaming tests)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    g = ev.withColumn(
        "is_new", F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0))
    )
    s = g.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return s.groupBy("user_id").agg(
        F.max("session_id").cast("long").alias("n_sessions"),
        F.count("*").alias("n_events"),
    )


@register(
    "event_windowed_counts",
    """
    SELECT (floor(epoch(ts) / 300) * 300)::BIGINT AS wstart, event_type,
           count(*) AS n, round(sum(value), 2) AS v
    FROM events GROUP BY 1, 2
    """,
)
def event_windowed_counts(spark, sf_dir):
    """T-ops: 5-minute tumbling-window aggregation (batch mirror of the
    Structured Streaming query in streaming.py; kafka/consumer.py:40-58)."""
    ev = _t(spark, sf_dir, "events")
    wstart = (F.floor(F.unix_timestamp("ts") / 300) * 300).cast("long")
    return ev.groupBy(wstart.alias("wstart"), F.col("event_type")).agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v")
    )


@register(
    "facet_cube",
    """
    SELECT coalesce(event_type, 'ALL') AS etype,
           coalesce(bucket, -1) AS bucket,
           count(*) AS n, round(sum(value), 2) AS v
    FROM (SELECT event_type, (user_id % 3)::INT AS bucket, value FROM events)
    GROUP BY CUBE(event_type, bucket)
    """,
)
def facet_cube(spark, sf_dir):
    """A9+: metrics rollup via CUBE — all (site,status)-style grouping-set
    combinations in one pass (the lineage/queue-depth monitoring rollup
    the reference polls per-queue, rabbitmq/manager.py:188-213, computed
    here as a single grouping-sets aggregate)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 3).cast("int").alias("bucket"), "value"
    )
    return (
        ev.cube("event_type", "bucket")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("etype"),
            F.coalesce("bucket", F.lit(-1)).alias("bucket"),
            "n",
            "v",
        )
    )


@register(
    "json_extract_props",
    """
    SELECT (regexp_extract(props, '"k":\\s*(\\d+)', 1)::INT % 10) AS k_mod, count(*) AS n
    FROM events GROUP BY 1
    """,
)
def json_extract_props(spark, sf_dir):
    """F12: JSON field extraction from the props payload
    (pipelines.py:11-14 item JSON round-trip)."""
    ev = _t(spark, sf_dir, "events")
    k = F.regexp_extract("props", r'"k":\s*(\d+)', 1).cast("int") % 10
    return ev.groupBy(k.alias("k_mod")).agg(F.count("*").alias("n"))


# ===========================================================================
# D. Entity resolution / golden record / graph traversal
# ===========================================================================
_CB_SQL = """
  SELECT c_custkey AS cb_id,
         'Comp ' || (c_custkey % 300)::VARCHAR AS cb_name,
         'd' || (c_custkey % 200)::VARCHAR || '.com' AS domain,
         1990 + (c_custkey % 30)::INT AS cb_year,
         round(c_acctbal, 2) AS cb_bal
  FROM customer
"""
_TX_SQL = """
  SELECT s_suppkey AS tx_id,
         'Comp ' || (s_suppkey % 300)::VARCHAR ||
            (CASE WHEN s_suppkey % 2 = 0 THEN ' Inc' ELSE '' END) AS tx_name,
         'd' || (s_suppkey % 200)::VARCHAR || '.com' AS domain,
         1990 + ((s_suppkey + (CASE WHEN s_suppkey % 7 = 0 THEN 1 ELSE 0 END)) % 30)::INT AS tx_year,
         round(s_acctbal, 2) AS tx_bal
  FROM supplier
"""


def _cb_side(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("cb_id"),
        F.concat(F.lit("Comp "), (F.col("c_custkey") % 300).cast("string")).alias("cb_name"),
        F.concat(F.lit("d"), (F.col("c_custkey") % 200).cast("string"), F.lit(".com")).alias(
            "domain"
        ),
        (F.lit(1990) + (F.col("c_custkey") % 30)).cast("int").alias("cb_year"),
        F.round("c_acctbal", 2).alias("cb_bal"),
    )


def _tx_side(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    suffix = F.when(F.col("s_suppkey") % 2 == 0, F.lit(" Inc")).otherwise(F.lit(""))
    yr_shift = F.when(F.col("s_suppkey") % 7 == 0, F.lit(1)).otherwise(F.lit(0))
    return s.select(
        F.col("s_suppkey").alias("tx_id"),
        F.concat(
            F.lit("Comp "), (F.col("s_suppkey") % 300).cast("string"), suffix
        ).alias("tx_name"),
        F.concat(F.lit("d"), (F.col("s_suppkey") % 200).cast("string"), F.lit(".com")).alias(
            "domain"
        ),
        (F.lit(1990) + ((F.col("s_suppkey") + yr_shift) % 30)).cast("int").alias("tx_year"),
        F.round("s_acctbal", 2).alias("tx_bal"),
    )


_NORM_NAME_SQL = (
    "array_to_string(list_filter(string_split_regex(trim(regexp_replace(lower({n}),"
    " '[^a-z0-9\\s]', '', 'g')), '\\s+'),"
    f" t -> t <> '' AND NOT list_contains({_LEGAL_SQL}, t)), ' ')"
)


@register(
    "entity_match_tiers",
    f"""
    WITH cb AS ({_CB_SQL}), tx AS ({_TX_SQL}),
    pairs AS (
      SELECT tx.tx_id, cb.cb_id,
        string_split_regex({_NORM_NAME_SQL.format(n='cb.cb_name')}, '\\s+') AS cbt,
        string_split_regex({_NORM_NAME_SQL.format(n='tx.tx_name')}, '\\s+') AS txt,
        CASE WHEN cb.cb_year = tx.tx_year THEN 1.0 ELSE 0.0 END AS year_eq
      FROM tx JOIN cb ON tx.domain = cb.domain),
    scored AS (
      SELECT tx_id, cb_id,
        round(0.5
          + 0.3 * (len(list_intersect(cbt, txt))::DOUBLE
                   / len(list_distinct(list_concat(cbt, txt))))
          + 0.2 * year_eq, 4) AS score
      FROM pairs)
    SELECT tx_id, cb_id, score,
      CASE WHEN score >= 0.8 THEN 'auto_merge'
           WHEN score >= 0.5 THEN 'review' ELSE 'no_match' END AS tier
    FROM scored
    """,
)
def entity_match_tiers(spark, sf_dir):
    """J4/J5: blocked entity-resolution join — stage-1 exact-domain
    blocking, composite score (0.5*domain + 0.3*name-jaccard + 0.2*year),
    0.80/0.50 tier thresholds (entity_resolver.py:34-35,155-200,
    resolve_entities.py:123-164)."""
    cb, tx = _cb_side(spark, sf_dir), _tx_side(spark, sf_dir)
    j = tx.join(cb, "domain")
    cbt = F.split(scalars.normalized_name_col(F.col("cb_name")), r"\s+")
    txt = F.split(scalars.normalized_name_col(F.col("tx_name")), r"\s+")
    name_jac = F.size(F.array_intersect(cbt, txt)).cast("double") / F.size(
        F.array_union(cbt, txt)
    )
    year_eq = F.when(F.col("cb_year") == F.col("tx_year"), 1.0).otherwise(0.0)
    score = F.round(F.lit(0.5) + 0.3 * name_jac + 0.2 * year_eq, 4)
    tier = (
        F.when(F.col("score") >= 0.8, F.lit("auto_merge"))
        .when(F.col("score") >= 0.5, F.lit("review"))
        .otherwise(F.lit("no_match"))
    )
    return j.select("tx_id", "cb_id", score.alias("score")).withColumn("tier", tier)


@register(
    "fuzzy_match_topk",
    f"""
    WITH cb AS ({_CB_SQL}), tx AS ({_TX_SQL}),
    cbn AS (SELECT cb_id, {_NORM_NAME_SQL.format(n='cb_name')} AS norm FROM cb),
    txn AS (SELECT tx_id, {_NORM_NAME_SQL.format(n='tx_name')} AS norm FROM tx),
    pairs AS (
      SELECT txn.tx_id, cbn.cb_id,
        round(len(list_intersect(string_split_regex(cbn.norm, '\\s+'),
                                 string_split_regex(txn.norm, '\\s+')))::DOUBLE
              / len(list_distinct(list_concat(string_split_regex(cbn.norm, '\\s+'),
                                              string_split_regex(txn.norm, '\\s+')))), 4)
          AS score
      FROM txn JOIN cbn ON substr(txn.norm, 1, 4) = substr(cbn.norm, 1, 4)),
    ranked AS (SELECT tx_id, cb_id, score,
                      row_number() OVER (PARTITION BY tx_id
                                         ORDER BY score DESC, cb_id) AS rnk
               FROM pairs)
    SELECT tx_id, cb_id, score, rnk FROM ranked WHERE rnk <= 20
    """,
)
def fuzzy_match_topk(spark, sf_dir):
    """J4 stage 2 + W4: blocked fuzzy candidate join — normalized-name
    4-char-prefix blocking (the regex-prefix block of
    resolve_entities.py:137-157), token-Jaccard scoring, top-20 per
    record ([:20] cap :155-157). The prefix equi-join keeps the pair
    space linear in block size — never a cross join."""
    cb = _cb_side(spark, sf_dir).select(
        "cb_id", scalars.normalized_name_col(F.col("cb_name")).alias("cbn")
    )
    tx = _tx_side(spark, sf_dir).select(
        "tx_id", scalars.normalized_name_col(F.col("tx_name")).alias("txn")
    )
    j = tx.join(cb, F.substring("txn", 1, 4) == F.substring("cbn", 1, 4))
    ta, tb = F.split(F.col("cbn"), r"\s+"), F.split(F.col("txn"), r"\s+")
    score = F.round(
        F.size(F.array_intersect(ta, tb)).cast("double") / F.size(F.array_union(ta, tb)),
        4,
    )
    w = Window.partitionBy("tx_id").orderBy(F.desc("score"), "cb_id")
    return (
        j.select("tx_id", "cb_id", score.alias("score"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 20)
    )


@register(
    "golden_record",
    f"""
    WITH cb AS ({_CB_SQL}), tx AS ({_TX_SQL}),
    agg_cb AS (SELECT domain, min(cb_name) AS cb_name, max(cb_bal) AS cb_bal,
                      min(cb_year) AS cb_year FROM cb GROUP BY domain),
    agg_tx AS (SELECT domain, min(tx_name) AS tx_name, max(tx_bal) AS tx_bal,
                      min(tx_year) AS tx_year FROM tx GROUP BY domain)
    SELECT coalesce(agg_cb.domain, agg_tx.domain) AS domain,
           coalesce(cb_name, tx_name) AS name,
           coalesce(tx_bal, cb_bal) AS funding_bal,
           coalesce(cb_year, tx_year) AS founded_year,
           CASE WHEN cb_name IS NOT NULL AND tx_name IS NOT NULL THEN 'both'
                WHEN cb_name IS NOT NULL THEN 'cb' ELSE 'tx' END AS provenance,
           'founded_year=' || (CASE WHEN cb_year IS NOT NULL THEN 'cb' ELSE 'tx' END)
             || '|funding_bal=' || (CASE WHEN tx_bal IS NOT NULL THEN 'tx' ELSE 'cb' END)
             || '|name=' || (CASE WHEN cb_name IS NOT NULL THEN 'cb' ELSE 'tx' END)
             AS field_sources
    FROM agg_cb FULL OUTER JOIN agg_tx ON agg_cb.domain = agg_tx.domain
    """,
)
def golden_record(spark, sf_dir):
    """J6: golden-record merge with per-field source priority — name from
    CB, funding from Tracxn, row provenance AND a per-field source map
    (entity_resolver.py:38-50,225-301 SOURCE_PRIORITY; the per-field
    dict is models.py:125 / entity_resolver.py:251-258). The map is a
    real MapType column; for the cross-engine compare it is rendered to
    a sorted 'k=v|k=v' string (repo convention for non-scalar output)."""
    cb = (
        _cb_side(spark, sf_dir)
        .groupBy("domain")
        .agg(
            F.min("cb_name").alias("cb_name"),
            F.max("cb_bal").alias("cb_bal"),
            F.min("cb_year").alias("cb_year"),
        )
    )
    tx = (
        _tx_side(spark, sf_dir)
        .groupBy("domain")
        .agg(
            F.min("tx_name").alias("tx_name"),
            F.max("tx_bal").alias("tx_bal"),
            F.min("tx_year").alias("tx_year"),
        )
    )
    j = cb.withColumnRenamed("domain", "cbd").join(
        tx.withColumnRenamed("domain", "txd"), F.col("cbd") == F.col("txd"), "full_outer"
    )
    prov = (
        F.when(F.col("cb_name").isNotNull() & F.col("tx_name").isNotNull(), F.lit("both"))
        .when(F.col("cb_name").isNotNull(), F.lit("cb"))
        .otherwise(F.lit("tx"))
    )
    # per-field provenance as a genuine MapType column...
    src = lambda c, hit, miss: F.when(F.col(c).isNotNull(), F.lit(hit)).otherwise(  # noqa: E731
        F.lit(miss)
    )
    field_map = F.create_map(
        F.lit("name"), src("cb_name", "cb", "tx"),
        F.lit("funding_bal"), src("tx_bal", "tx", "cb"),
        F.lit("founded_year"), src("cb_year", "cb", "tx"),
    )
    # ...rendered to a key-sorted string for the order-insensitive compare
    rendered = F.concat_ws(
        "|",
        F.transform(
            F.array_sort(F.map_entries(field_map)),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]),
        ),
    )
    return j.select(
        F.coalesce("cbd", "txd").alias("domain"),
        F.coalesce("cb_name", "tx_name").alias("name"),
        F.coalesce("tx_bal", "cb_bal").alias("funding_bal"),
        F.coalesce("cb_year", "tx_year").alias("founded_year"),
        prov.alias("provenance"),
        rendered.alias("field_sources"),
    )


@register(
    "graph_two_hop",
    """
    SELECT c.c_nationkey AS cust_nation, s.s_nationkey AS supp_nation,
           count(*) AS n_paths, count(DISTINCT s.s_suppkey) AS n_suppliers
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    GROUP BY 1, 2
    """,
)
def graph_two_hop(spark, sf_dir):
    """J8/J9: multi-hop graph traversal as chained equi-joins over edge
    tables (knowledgeGraph/db.py:15-96 Cypher patterns)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("cust_nation"),
            F.col("s_nationkey").alias("supp_nation"),
        )
        .agg(
            F.count("*").alias("n_paths"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )


# ===========================================================================
# E. Multimodal (image payload) operators. ALL decode ops carry FULL
#    value oracles against committed ground-truth fixtures
#    (images_decoded_meta.parquet for decode/resize/frame-sample,
#    images_tiles_meta.parquet for tile stats — produced once by the
#    stand-in codec, datagen.gen_images_*_meta_pdf): the engine
#    re-decodes the live bytes on every run; a hash match proves the
#    decode path still reproduces the committed truth.
# ===========================================================================
def _images_df(spark, n: int = 64):
    from . import datagen, schemas

    return spark.createDataFrame(datagen.gen_images_pdf(n), schema=schemas.IMAGES)


_IMAGES_DECODED_META = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "images_decoded_meta.parquet",
)


@register(
    "image_decode_stats",
    f"""
    SELECT fmt, count(*) AS n,
           round(avg(mean_px), 2) AS avg_mean,
           min(psnr_ok::INT) AS all_psnr_ok
    FROM read_parquet('{_IMAGES_DECODED_META}')
    GROUP BY fmt
    """,
)
def image_decode_stats(spark, sf_dir):
    """Multimodal decode: mapInPandas over binary image columns — per-fmt
    decode stats with the PSNR>=40dB invariant surfaced as a column
    (input_hint; parse.py is the engine's production path). The oracle
    aggregates the committed decoded-meta fixture; the engine decodes
    the live payload bytes — value-hash equality pins the decoder."""
    import pandas as pd

    from . import codec

    imgs = _images_df(spark, 64)

    def stats(it):
        for pdf in it:
            rows = []
            for iid, data, fmt, w, h in zip(
                pdf["image_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                arr, lossless = codec.decode_image(bytes(data))
                ref = codec.gen_pixels(int(iid[3:]), int(w), int(h))
                p = codec.psnr(ref, arr)
                rows.append((fmt, float(arr.mean()), bool(lossless or p >= 40.0)))
            yield pd.DataFrame(rows, columns=["fmt", "mean_px", "psnr_ok"])

    decoded = imgs.mapInPandas(stats, schema="fmt string, mean_px double, psnr_ok boolean")
    return decoded.groupBy("fmt").agg(
        F.count("*").alias("n"),
        F.round(F.avg("mean_px"), 2).alias("avg_mean"),
        F.min(F.col("psnr_ok").cast("int")).alias("all_psnr_ok"),
    )


@register(
    "image_resize",
    f"""
    SELECT image_id, out_w, out_h, out_mean
    FROM read_parquet('{_IMAGES_DECODED_META}')
    """,
)
def image_resize(spark, sf_dir):
    """Multimodal resize: vectorized batch resize to 16x16 via numpy
    striding inside mapInPandas (real Spark plumbing; PIL would slot in
    behind the same signature). Per-image value oracle over the
    committed decoded-meta fixture (codec.resize_small is the shared
    downsample both sides compute)."""
    import pandas as pd

    from . import codec

    imgs = _images_df(spark, 64)

    def resize(it):
        for pdf in it:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                arr, _ = codec.decode_image(bytes(data))
                small = codec.resize_small(arr)
                rows.append((iid, small.shape[1], small.shape[0], float(small.mean())))
            yield pd.DataFrame(rows, columns=["image_id", "out_w", "out_h", "out_mean"])

    return imgs.mapInPandas(
        resize, schema="image_id string, out_w int, out_h int, out_mean double"
    )


PHASH_BANDS = 8
PHASH_THRESH = PHASH_BANDS - 1  # pigeonhole-exact radius for 8 disjoint bands

_IMAGES_META = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "images_meta.parquet",
)


def phash_band_pairs(meta: DataFrame, threshold: int = PHASH_THRESH) -> DataFrame:
    """Near-dup pairs by perceptual-hash Hamming distance with multi-index
    banded blocking (no all-pairs join anywhere).

    The 64-bit phash splits into 8 disjoint 8-bit bands. Pigeonhole: a
    pair at Hamming distance <= 7 has fewer differing bits than bands, so
    at least one band is bit-identical — an equi-join on (band_id,
    band_val) generates every qualifying pair EXACTLY (this is
    multi-index hashing; radius covered = bands - 1). Candidates then
    verify with exact bit_count(xor) <= threshold, all JVM-side.

    At scale: the band join is a plain shuffle hash join keyed on
    (band_id, band_val); no task ever sees more than one band-bucket, and
    the phash column (8 bytes) is the only payload that rides the
    candidate shuffle. Replaces the reference's exact-URL dupefilter
    (rabbitmq/dupefilter.py:35-44) elevated to perceptual identity.
    """
    assert threshold < PHASH_BANDS, "pigeonhole guarantee requires threshold < bands"
    bands = meta.select(
        "image_id",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("phash", 8 * i).bitwiseAND(F.lit(255))
                    for i in range(PHASH_BANDS)
                ]
            )
        ).alias("band_id", "band_val"),
    )
    a = bands.select(F.col("image_id").alias("a_id"), "band_id", "band_val")
    b = bands.select(
        F.col("image_id").alias("b_id"),
        F.col("band_id").alias("band_id_b"),
        F.col("band_val").alias("band_val_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("band_id") == F.col("band_id_b"))
            & (F.col("band_val") == F.col("band_val_b"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .select("a_id", "b_id")
        .distinct()  # a close pair can share several bands
    )
    pa = meta.select(F.col("image_id").alias("a_id"), F.col("phash").alias("pa"))
    pb = meta.select(F.col("image_id").alias("b_id"), F.col("phash").alias("pb"))
    ham = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
    return (
        cand.join(pa, "a_id")
        .join(pb, "b_id")
        .select("a_id", "b_id", ham.alias("hamming"))
        .filter(F.col("hamming") <= threshold)
    )


@register(
    "phash_hamming_neardup",
    f"""
    WITH m AS (SELECT image_id, phash
               FROM read_parquet('{_IMAGES_META}')),
    bands AS (
      SELECT image_id, i AS band_id, (phash >> (8 * i)) & 255 AS band_val
      FROM m, unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS t(i)),
    cand AS (
      SELECT DISTINCT a.image_id AS a_id, b.image_id AS b_id
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                  AND a.image_id < b.image_id)
    SELECT a_id, b_id, bit_count(xor(ma.phash, mb.phash)) AS hamming
    FROM cand
    JOIN m ma ON ma.image_id = a_id
    JOIN m mb ON mb.image_id = b_id
    WHERE bit_count(xor(ma.phash, mb.phash)) <= {PHASH_THRESH}
    """,
)
def phash_hamming_neardup(spark, sf_dir):
    """Perceptual-hash near-dup pairs over the committed image-metadata
    fixture (fixtures/images_meta.parquet — the bytes-free projection of
    the deterministic image table, 256 images with ~55 designed near-dup
    pairs at Hamming 1..7). The fixture is checked against datagen in
    tests/test_datagen.py, and the banded plan is proven equal to the
    brute-force all-pairs definition in tests/test_engine.py.
    Ignores sf_dir: the phash universe is the image fixture, not the
    TPC-H-ish tables (same data for Spark and the DuckDB oracle)."""
    meta = spark.read.parquet(_IMAGES_META).select("image_id", "phash")
    return phash_band_pairs(meta, PHASH_THRESH)


# ===========================================================================
# F. Flagship: one crawl scheduling+dedup round as a single declarative
#    plan (canonicalize -> fingerprint -> dedup -> politeness-rank)
# ===========================================================================
@register(
    "crawl_schedule_dedup",
    f"""
    WITH u AS (SELECT o_orderkey AS seq,
                      'https://' || (CASE WHEN o_orderkey % 2 = 0 THEN 'WWW.' ELSE '' END)
                      || 'h' || (o_custkey % 40)::VARCHAR || '.crunchbase.com/organization/co-'
                      || (o_orderkey % 3000)::VARCHAR
                      || ['', '/', '?utm=x', '#frag'][(o_orderkey % 4)::INT + 1] AS url
               FROM orders),
    cn AS (SELECT seq, url, {_CANON_SQL.format(u='url')} AS url_canon FROM u),
    fp AS (SELECT seq, url_canon, {_MD5_INT_SQL.format(c='url_canon')} AS sha_int,
                  regexp_extract(url_canon, '://([^/]+)', 1) AS host FROM cn),
    dedup AS (SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY sha_int ORDER BY seq) AS rn
                             FROM fp) WHERE rn = 1),
    ranked AS (SELECT host, seq, sha_int,
                      row_number() OVER (PARTITION BY host ORDER BY seq) AS hr FROM dedup)
    SELECT host, seq, sha_int FROM ranked WHERE hr <= 10
    """,
)
def crawl_schedule_dedup(spark, sf_dir):
    """THE flagship slice: seed URLs -> canonicalize (Arrow-native
    UDF) -> fingerprint -> first-arrival dedup -> per-host politeness
    ranking -> fetchable set. One Catalyst plan, no per-row Python outside
    the Arrow-vectorized canonicalizer (north_rule). Full loop with
    snapshots lives in loop.py; parity in tests/test_parity.py."""
    from .urlnorm import canonicalize_arrow_udf

    o = _t(spark, sf_dir, "orders")
    noise = F.element_at(
        F.array(F.lit(""), F.lit("/"), F.lit("?utm=x"), F.lit("#frag")),
        (F.col("o_orderkey") % 4 + 1).cast("int"),
    )
    www = F.when(F.col("o_orderkey") % 2 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    url = F.concat(
        F.lit("https://"), www, F.lit("h"), (F.col("o_custkey") % 40).cast("string"),
        F.lit(".crunchbase.com/organization/co-"),
        (F.col("o_orderkey") % 3000).cast("string"), noise,
    )
    seeds = o.select(F.col("o_orderkey").alias("seq"), url.alias("url"))
    cn = seeds.withColumn("url_canon", canonicalize_arrow_udf(F.col("url")))
    fp = cn.select(
        "seq",
        "url_canon",
        _md5_int(F.col("url_canon")).alias("sha_int"),
        F.regexp_extract("url_canon", "://([^/]+)", 1).alias("host"),
    )
    wd = Window.partitionBy("sha_int").orderBy("seq")
    dedup = fp.withColumn("rn", F.row_number().over(wd)).filter(F.col("rn") == 1)
    wh = Window.partitionBy("host").orderBy("seq")
    ranked = dedup.withColumn("hr", F.row_number().over(wh)).filter(F.col("hr") <= 10)
    return ranked.select("host", "seq", "sha_int")


# ===========================================================================
# G. Remaining SURVEY §2 coverage: filtered facets ($all), offset
#    pagination, count_if diagnostics, union+dedup
# ===========================================================================
@register(
    "filtered_facets",
    f"""
    WITH d AS (SELECT doc_id, lang, {_TOKS_SQL} AS toks FROM documents)
    SELECT tok, count(*) AS n FROM (
      SELECT doc_id, unnest(toks) AS tok FROM d
      WHERE list_has_all(toks, ['hash', 'join']))
    GROUP BY tok
    """,
)
def filtered_facets(spark, sf_dir):
    """A2: facet count with an $all prefilter — documents containing ALL
    selected tokens, then per-token counts (public/views.py:318-346)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", _toks_col().alias("toks"))
    probe = F.array(F.lit("hash"), F.lit("join"))
    has_all = F.size(F.array_intersect(F.col("toks"), probe)) == F.size(probe)
    return (
        d.filter(has_all)
        .select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )


@register(
    "orders_page_offset",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 50 OFFSET 100
    """,
)
def orders_page_offset(spark, sf_dir):
    """W5: page-2 pagination with offset (public/views.py:19-29)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .offset(100)
        .limit(50)
        .select("o_orderkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@register(
    "countif_diagnostics",
    """
    SELECT c_nationkey AS nationkey,
           count(*) FILTER (WHERE c_acctbal > 0) AS n_positive,
           count(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS n_building,
           count(*) AS n_total
    FROM customer GROUP BY 1
    """,
)
def countif_diagnostics(spark, sf_dir):
    """A6: per-key conditional counts (merge-lookup diagnostics,
    gather_data_from_crunchy.py:150-169)."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count_if(F.col("c_acctbal") > 0).alias("n_positive"),
        F.count_if(F.col("c_mktsegment") == "BUILDING").alias("n_building"),
        F.count("*").alias("n_total"),
    )


@register(
    "string_ops",
    """
    WITH t AS (SELECT c_custkey,
        'Acme Labs #' || (c_custkey % 100)::VARCHAR AS name,
        'Acme ' || (c_custkey % 100)::VARCHAR || ' - Company Profile' AS title,
        'https://acme' || (c_custkey % 100)::VARCHAR || '.com/a//' AS url,
        'https://res.cloudinary.com/img' || (c_custkey % 50)::VARCHAR || '.png' AS logo,
        'small.png 1x large.png 2x' AS srcset,
        ['  Acme  ', '', ' builds ', 'rockets '] AS parts
      FROM customer)
    SELECT c_custkey,
      substr(lower(regexp_replace(name, '[^a-zA-Z0-9_\\-]', '_', 'g')), 1, 80) AS slug,
      trim(regexp_replace(title, '- Company Profile$', '')) AS title_clean,
      regexp_replace(trim(url), '/+$', '') AS url_clean,
      regexp_replace(logo, '^https://res\\.cloudinary\\.com/',
                     'https://images.crunchbase.com/') AS logo_url,
      regexp_extract(srcset, '([^\\s]+) 1x', 1) AS img_1x,
      array_to_string(list_filter(list_transform(parts, x -> trim(x)), x -> x <> ''), ' ')
        AS joined
    FROM t
    """,
)
def string_ops(spark, sf_dir):
    """F7/F8/F9/F10/F11/F17/P9 in one projection: slug builder
    (spiders/crunchy.py:69-81), srcset 1x pick (CrunchbaseDataParser.py:
    10-13), whitespace-join (:49-62), profile-suffix strip
    (TracxnDataParser.py:86-89), trailing-slash trim, logo prefix rewrite
    (migrate_crunchbase_logos.py:16-20)."""
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.concat(F.lit("Acme Labs #"), (F.col("c_custkey") % 100).cast("string")).alias("name"),
        F.concat(
            F.lit("Acme "), (F.col("c_custkey") % 100).cast("string"),
            F.lit(" - Company Profile"),
        ).alias("title"),
        F.concat(
            F.lit("https://acme"), (F.col("c_custkey") % 100).cast("string"), F.lit(".com/a//")
        ).alias("url"),
        F.concat(
            F.lit("https://res.cloudinary.com/img"),
            (F.col("c_custkey") % 50).cast("string"), F.lit(".png"),
        ).alias("logo"),
        F.lit("small.png 1x large.png 2x").alias("srcset"),
        F.array(F.lit("  Acme  "), F.lit(""), F.lit(" builds "), F.lit("rockets ")).alias(
            "parts"
        ),
    )
    # NB: F.transform(col, F.trim) would call two-arg trim(elem, index);
    # the explicit lambda keeps it the one-arg whitespace trim
    joined = F.array_join(
        F.filter(F.transform(F.col("parts"), lambda x: F.trim(x)), lambda x: x != ""), " "
    )
    return c.select(
        "c_custkey",
        scalars.slug_col(F.col("name")).alias("slug"),
        scalars.strip_profile_suffix_col(F.col("title")).alias("title_clean"),
        scalars.rstrip_slash_col(F.col("url")).alias("url_clean"),
        scalars.logo_rewrite_col(F.col("logo")).alias("logo_url"),
        F.regexp_extract("srcset", r"([^\s]+) 1x", 1).alias("img_1x"),
        joined.alias("joined"),
    )


_AGENTS_SQL = "['ua-firefox','ua-chrome','ua-safari','ua-edge','ua-opera']"


@register(
    "ua_choice",
    f"""
    SELECT c_custkey,
      {_AGENTS_SQL}[((c_custkey * 2654435761) % 5)::INT + 1] AS ua
    FROM customer
    """,
)
def ua_choice(spark, sf_dir):
    """F15: user-agent rotation as a seeded deterministic pick instead of
    random.choice (middlewares.py:19-23, agents.py:10-51) — replayable
    rounds require no wall-clock randomness."""
    agents = ["ua-firefox", "ua-chrome", "ua-safari", "ua-edge", "ua-opera"]
    c = _t(spark, sf_dir, "customer")
    pick = F.element_at(
        F.array(*[F.lit(a) for a in agents]),
        ((F.col("c_custkey") * 2654435761) % 5).cast("int") + 1,
    )
    return c.select("c_custkey", pick.alias("ua"))


@register(
    "ngram_shingle_jaccard_pairs",
    f"""
    WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
               FROM documents),
    sh AS (SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(toks)-2),
                 i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
           FROM t WHERE len(toks) >= 3),
    blk AS (SELECT doc_id, sh,
                   list_min(list_transform(sh, s -> {_MD5_INT_SQL.format(c='s')})) AS blk
            FROM sh)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           round(len(list_intersect(a.sh, b.sh))::DOUBLE
                 / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jac
    FROM blk a JOIN blk b ON a.blk = b.blk AND a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
    """,
)
def ngram_shingle_jaccard_pairs(spark, sf_dir):
    """N-gram (3-shingle) Jaccard near-dup pairs with 1-permutation
    min-shingle-hash blocking: only docs sharing their minimum shingle
    hash are compared (the classic bottom-1 MinHash block — identical
    near-dups always collide because they share the min shingle), then
    true shingle-Jaccard >= 0.8 verifies. Never O(n^2): the equi-join on
    the block key is a plain shuffle hash join at scale.

    Recall property (the block is part of the operator definition, and
    the oracle mirrors it): a single bottom-1 band collides with
    probability = the pair's true Jaccard, so a J=0.8 pair is found
    ~80% of the time and recall -> 1 as J -> 1 (exact dups always
    collide). For band-boosted recall at lower J the corpus-level
    operator is minhash_lsh_pairs (2x8 banding + agreement prefilter)."""
    d = _t(spark, sf_dir, "documents")
    d = d.select("doc_id", F.split(F.lower("text"), r"\s+").alias("toks")).filter(
        F.size("toks") >= 3
    )
    idx = F.sequence(F.lit(1), F.size("toks") - 2)
    sh = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("toks"), i),
                F.element_at(F.col("toks"), i + 1),
                F.element_at(F.col("toks"), i + 2),
            ),
        )
    )
    s = d.select("doc_id", sh.alias("sh"))
    blk = F.array_min(F.transform(F.col("sh"), lambda x: _md5_int(x)))
    # materialize: the shingle+md5 subtree feeds both sides of the
    # self-join; without it Spark computes the md5-per-shingle work twice
    # (localCheckpoint, so the blocks are GC-reclaimable — see bloom.py)
    s = s.withColumn("blk", blk).withColumn("n_sh", F.size("sh")).localCheckpoint()
    a = s.select(F.col("doc_id").alias("a_id"), F.col("sh").alias("sa"),
                 F.col("n_sh").alias("na"), "blk")
    b = s.select(F.col("doc_id").alias("b_id"), F.col("sh").alias("sb"),
                 F.col("n_sh").alias("nb"), F.col("blk").alias("blkb"))
    pairs = a.join(b, (F.col("blk") == F.col("blkb")) & (F.col("a_id") < F.col("b_id")))
    # size-ratio prefilter: jaccard >= 0.8 is impossible unless
    # 0.8 <= |A|/|B| <= 1.25 — cheap int compare before the set ops
    pairs = pairs.filter(
        (F.col("na") * 4 <= F.col("nb") * 5) & (F.col("nb") * 4 <= F.col("na") * 5)
    )
    jac = F.size(F.array_intersect("sa", "sb")).cast("double") / F.size(
        F.array_union("sa", "sb")
    )
    return (
        pairs.withColumn("jac_raw", jac)
        .filter(F.col("jac_raw") >= 0.8)
        .select("a_id", "b_id", F.round("jac_raw", 4).alias("jac"))
    )


# ---------------------------------------------------------------------------
# Banded sign-hyperplane LSH for embedding near-dup (b bands x r bits).
# 108 hyperplanes (12 bands x 9 bits), each a 4-sparse +/-1 projection
# of the 64-dim vector,
# drawn once from a seeded RNG at import so Spark and the DuckDB oracle
# share the exact same hyperplane bank. All arithmetic is DOUBLE with
# left-associated addition in BOTH engines, so the sign of a projection
# near zero is bit-identical across them.
# ---------------------------------------------------------------------------
EMB_LSH_BANDS = 12
EMB_LSH_BITS = 9  # bits per band


def _hyperplane_spec(
    n_bits: int = EMB_LSH_BANDS * EMB_LSH_BITS,
    nnz: int = 4,
    dim: int = 64,
    seed: int = 7,
):
    import numpy as np

    rng = np.random.RandomState(seed)
    spec = []
    for _ in range(n_bits):
        dims = rng.choice(dim, size=nnz, replace=False)
        signs = rng.choice([-1.0, 1.0], size=nnz)
        spec.append(list(zip(dims.tolist(), signs.tolist())))
    return spec


_HP_SPEC = _hyperplane_spec()


def _hp_band_cols():
    """12 band-value Columns (each packs EMB_LSH_BITS sign bits into an
    int). Built as Spark-SQL strings parsed JVM-side in 12 F.expr
    calls: constructing the 108 4-term projections as Column objects
    costs ~5s of driver-side py4j round trips (measured); the strings
    parse in ~0.1s. Arithmetic is unchanged — same left-assoc order,
    same double casts — so band values are bit-identical."""
    bands = []
    for b in range(EMB_LSH_BANDS):
        bits = []
        for j in range(EMB_LSH_BITS):
            terms = " + ".join(
                f"({s:+.1f}D * CAST(element_at(embedding, {d + 1}) AS DOUBLE))"
                for d, s in _HP_SPEC[EMB_LSH_BITS * b + j]
            )
            bits.append(f"(CASE WHEN ({terms}) > 0 THEN {1 << j} ELSE 0 END)")
        bands.append(F.expr(" + ".join(bits)))
    return bands


def _hp_band_sql() -> str:
    """The same 12 packed band values as DuckDB SQL expressions."""
    outs = []
    for b in range(EMB_LSH_BANDS):
        bits = []
        for j in range(EMB_LSH_BITS):
            terms = " + ".join(
                f"({s:+.1f} * (embedding[{d + 1}]::DOUBLE))"
                for d, s in _HP_SPEC[EMB_LSH_BITS * b + j]
            )
            bits.append(f"((CASE WHEN ({terms}) > 0 THEN 1 ELSE 0 END) * {1 << j})")
        outs.append("(" + " + ".join(bits) + ")")
    return ", ".join(f"{o} AS band{b}" for b, o in enumerate(outs))


def emb_lsh_candidates(e: DataFrame) -> DataFrame:
    """OR-of-bands LSH candidate pairs (a_id < b_id, distinct) — the
    block of embedding_neardup_cosine, exposed so bench.py can measure
    the candidate fraction vs all pairs."""
    # band values in their OWN projection (12 separate medium-sized
    # expressions), then a trivial posexplode over the column refs — with
    # all 108 bit expressions inlined into the Generate node's array the
    # generated Java exceeds Janino's 64KB method cap and the whole stage
    # falls back to interpreted evaluation; as Project expressions they
    # get split into sub-methods and stay codegen'd.
    bv = e.select(
        "vec_id", *[c.alias(f"_band{i}") for i, c in enumerate(_hp_band_cols())]
    )
    bands = bv.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.col(f"_band{i}") for i in range(EMB_LSH_BANDS)])
        ).alias("band_id", "band_val"),
    )
    a = bands.select(F.col("vec_id").alias("a_id"), "band_id", "band_val")
    b = bands.select(
        F.col("vec_id").alias("b_id"),
        F.col("band_id").alias("band_id_b"),
        F.col("band_val").alias("band_val_b"),
    )
    return (
        a.join(
            b,
            (F.col("band_id") == F.col("band_id_b"))
            & (F.col("band_val") == F.col("band_val_b"))
            & (F.col("a_id") < F.col("b_id")),
        )
        .select("a_id", "b_id")
        .distinct()
    )


@register(
    "embedding_neardup_cosine",
    f"""
    WITH bv AS (SELECT vec_id, {_hp_band_sql()} FROM embeddings),
    bands AS (SELECT vec_id,
                     unnest({list(range(EMB_LSH_BANDS))}) AS band_id,
                     unnest([{", ".join(f"band{b}" for b in range(EMB_LSH_BANDS))}]) AS band_val
              FROM bv),
    cand AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
             FROM bands a
             JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                         AND a.vec_id < b.vec_id),
    n AS (SELECT vec_id,
                 list_transform({_TO_D.format(c='embedding')},
                   x -> x / sqrt(list_dot_product({_TO_D.format(c='embedding')},
                                                  {_TO_D.format(c='embedding')}))) AS emb
          FROM embeddings),
    s AS (SELECT a_id, b_id, round(list_dot_product(na.emb, nb.emb), 4) AS cos_sim
          FROM cand JOIN n na ON na.vec_id = a_id JOIN n nb ON nb.vec_id = b_id)
    SELECT a_id, b_id, cos_sim FROM s WHERE cos_sim >= 0.35
    """,
)
def embedding_neardup_cosine(spark, sf_dir):
    """Embedding-cosine near-dup pairs via banded sign-hyperplane LSH:
    12 bands x 9 bits (108 seeded 4-sparse +/-1 hyperplanes), OR-of-bands
    candidate union, exact cosine verify >= 0.35.

    Scale shape: each vector explodes into 12 (band_id, band_val) keys;
    candidates come from an equi-join on that key — a plain shuffle hash
    join, never an all-pairs product. For near-orthogonal vectors a band
    collides with p ~ 2^-9, so expected candidates ~ 12/512 ~ 2.3% of
    all pairs at ANY corpus size (the old 4-bit/16-bucket scheme put
    n/16 vectors in each bucket — quadratic at scale; measured here:
    ~2.9% of all-pairs at sf0.01, logged by bench.py). Embedding arrays
    stay OUT of the candidate join: ids only, vectors re-joined for the
    O(candidates) verify with a codegen'd unrolled 64-term dot product.

    The block is part of the operator definition (oracle mirrors it, as
    with ngram_shingle_jaccard_pairs). Recall under the random-hyperplane
    model (P[bit agree] = 1 - theta/pi): ~97% for cos >= 0.9 pairs, ~41%
    at cos 0.6, ~14% at the 0.35 boundary — the production near-dup
    regime (cos -> 1) is where the banding is essentially lossless."""
    e = _t(spark, sf_dir, "embeddings")

    cand = emb_lsh_candidates(e)

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, t: acc + t
        )

    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    # norm computed ONCE per row in its own projection — inlining it in
    # the transform lambda would re-fold the 64-dim dot per element
    pre = e.select(
        "vec_id", emb_d.alias("emb0"), F.sqrt(dot(emb_d, emb_d)).alias("nrm")
    )
    norm = pre.select(
        "vec_id", F.transform("emb0", lambda x: x / F.col("nrm")).alias("emb")
    )
    na = norm.select(F.col("vec_id").alias("a_id"), F.col("emb").alias("ea"))
    nb = norm.select(F.col("vec_id").alias("b_id"), F.col("emb").alias("eb"))
    pairs = cand.join(na, "a_id").join(nb, "b_id")
    # unrolled 64-term dot: element_at chains stay inside whole-stage
    # codegen, unlike the interpreted higher-order aggregate() fold —
    # this is the O(candidates) inner loop, so codegen matters. Left-
    # assoc addition matches the oracle's list_dot_product fold order.
    dot_unrolled = F.expr(
        " + ".join(f"(element_at(ea, {i + 1}) * element_at(eb, {i + 1}))" for i in range(64))
    )
    return (
        pairs.withColumn("cos_sim", F.round(dot_unrolled, 4))
        .filter(F.col("cos_sim") >= 0.35)
        .select("a_id", "b_id", "cos_sim")
    )


@register(
    "media_frame_sample",
    f"""
    SELECT image_id, n_frames, n_sampled, sample_mean
    FROM read_parquet('{_IMAGES_DECODED_META}')
    """,
)
def media_frame_sample(spark, sf_dir):
    """Multimodal frame sampling (video analog): treat each decoded
    payload's rows as a frame sequence and sample every 4th frame via
    mapInPandas — deterministic stand-in decode per FIXTURES.md (a real
    video codec slots in behind the same batch-iterator signature; the
    Spark plumbing — binary column, Arrow batches, schema — is real).
    Full value oracle over the committed decoded-meta fixture: the
    engine re-decodes live bytes, the oracle reads the ground truth."""
    import pandas as pd

    from . import codec

    imgs = _images_df(spark, 64)

    def sample(it):
        for pdf in it:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                arr, _ = codec.decode_image(bytes(data))
                frames = arr[::4]  # every 4th row as a "frame"
                rows.append(
                    (iid, int(arr.shape[0]), int(frames.shape[0]), float(frames.mean()))
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "n_frames", "n_sampled", "sample_mean"]
            )

    return imgs.mapInPandas(
        sample,
        schema="image_id string, n_frames int, n_sampled int, sample_mean double",
    )


@register(
    "union_dedup_tokens",
    f"""
    SELECT tok, count(*) AS n FROM (
      SELECT DISTINCT doc_id, tok FROM (
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents WHERE lang = 'en'
        UNION ALL
        SELECT doc_id, unnest({_TOKS_SQL}) AS tok FROM documents WHERE source = 'src0'))
    GROUP BY tok
    """,
)
def union_dedup_tokens(spark, sf_dir):
    """U4: union of two extraction paths + dedup
    (TracxnDataParser.py:211-220 href union)."""
    d = _t(spark, sf_dir, "documents")
    a = d.filter(F.col("lang") == "en").select(
        "doc_id", F.explode(_toks_col()).alias("tok")
    )
    b = d.filter(F.col("source") == "src0").select(
        "doc_id", F.explode(_toks_col()).alias("tok")
    )
    return (
        a.unionByName(b)
        .distinct()
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
    )


@register(
    "nation_customer_roster",
    """
    SELECT n.n_name AS nation,
           array_to_string(list_sort(list_distinct(list(c.c_name))), '|') AS roster,
           count(*) AS n_high_balance
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal >= 9000.0
    GROUP BY n.n_name
    """,
)
def nation_customer_roster(spark, sf_dir):
    """A7/J7: 1-hop join + COLLECT aggregation — the reference's most
    common Cypher shape, `MATCH (c)-[:OF]->(n) RETURN n, COLLECT(DISTINCT
    c.name)` (knowledgeGraph/db.py:19-21,58,103). sort_array(collect_set)
    joined to a string per the repo's array-output convention; the filter
    bounds roster size so the collected array stays O(group slice), and
    the agg is a plain hash aggregate (collect_set partials combine
    map-side)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") >= 9000.0)
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.concat_ws("|", F.sort_array(F.collect_set("c_name"))).alias("roster"),
            F.count("*").alias("n_high_balance"),
        )
    )


FUZZY_CAND_CAP = 20  # per-record candidate cap, mirrors reference [:20]


def _fuzzy_block_pairs(part_df: DataFrame) -> DataFrame:
    """Blocked (pre-cap) candidate pairs for fuzzy_ratio_topk.

    Block key = (p_brand, first token of the sorted name): the sorted-name
    prefix grows with the name vocabulary (the reference's regex-prefix
    blocking, resolve_entities.py:137-157), so blocks shrink as data
    grows instead of staying 1/25th of the table the way a brand-only
    block does. Within a block, each record keeps only its
    FUZZY_CAND_CAP cheapest candidates — ranked by |len(a)-len(b)| (a
    lower bound on levenshtein, so the discarded tail is the least
    similar) with b_key as the deterministic tiebreak — before any
    edit-distance is computed: the reference's top-20 candidate cap
    (resolve_entities.py:155-157). Post-cap work is O(n * CAP)
    regardless of block skew."""
    p = part_df.select(
        "p_partkey",
        "p_brand",
        F.concat_ws(" ", F.sort_array(F.split("p_name", " "))).alias("sorted_name"),
        F.substring_index(
            F.concat_ws(" ", F.sort_array(F.split("p_name", " "))), " ", 1
        ).alias("blk"),
    )
    a = p.select(
        F.col("p_partkey").alias("a_key"),
        F.col("p_brand").alias("brand_a"),
        F.col("blk").alias("blk_a"),
        F.col("sorted_name").alias("name_a"),
    )
    b = p.select(
        F.col("p_partkey").alias("b_key"),
        F.col("p_brand").alias("brand_b"),
        F.col("blk").alias("blk_b"),
        F.col("sorted_name").alias("name_b"),
    )
    return a.join(
        b,
        (F.col("brand_a") == F.col("brand_b"))
        & (F.col("blk_a") == F.col("blk_b"))
        & (F.col("a_key") != F.col("b_key")),
    ).select("a_key", "b_key", "name_a", "name_b")


def _fuzzy_blocked(part_df: DataFrame) -> DataFrame:
    """Capped candidates: _fuzzy_block_pairs trimmed to FUZZY_CAND_CAP
    per a_key (see _fuzzy_block_pairs docstring for the rationale)."""
    pairs = _fuzzy_block_pairs(part_df)
    wc = Window.partitionBy("a_key").orderBy(
        F.abs(F.length("name_a") - F.length("name_b")), "b_key"
    )
    return (
        pairs.withColumn("crnk", F.row_number().over(wc))
        .filter(F.col("crnk") <= FUZZY_CAND_CAP)
        .drop("crnk")
    )


@register(
    "fuzzy_ratio_topk",
    """
    WITH p AS (SELECT p_partkey, p_brand,
                      array_to_string(list_sort(string_split(p_name, ' ')), ' ')
                        AS sorted_name
               FROM part),
    p2 AS (SELECT p_partkey, p_brand, sorted_name,
                  split_part(sorted_name, ' ', 1) AS blk
           FROM p),
    cand AS (
      SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
             a.sorted_name AS name_a, b.sorted_name AS name_b,
             row_number() OVER (
               PARTITION BY a.p_partkey
               ORDER BY abs(len(a.sorted_name) - len(b.sorted_name)), b.p_partkey
             ) AS crnk
      FROM p2 a JOIN p2 b
        ON a.p_brand = b.p_brand AND a.blk = b.blk
       AND a.p_partkey <> b.p_partkey),
    scored AS (
      SELECT a_key, b_key,
             round(100.0 * (1.0 - levenshtein(name_a, name_b)::DOUBLE
                   / greatest(len(name_a), len(name_b))), 1) AS ratio
      FROM cand WHERE crnk <= 20),
    ranked AS (SELECT a_key, b_key, ratio,
                      row_number() OVER (PARTITION BY a_key
                                         ORDER BY ratio DESC, b_key) AS rnk
               FROM scored)
    SELECT a_key, b_key, ratio, rnk FROM ranked WHERE rnk <= 3
    """,
)
def fuzzy_ratio_topk(spark, sf_dir):
    """F6 in the query surface: token_sort_ratio matching — sort the name
    tokens, rejoin, score the sorted strings with an edit-distance ratio
    100*(1 - lev/maxlen) — the construction of the reference's
    entity_resolver.py:76-95 (thefuzz token_sort_ratio) as used by the
    stage-2 resolver (resolve_entities.py:158-164). The ratio is defined
    identically in Spark (F.levenshtein) and DuckDB (levenshtein()) so
    the oracle is exact; scalars.token_sort_ratio_udf is the
    difflib-backed API twin for Python callers, kept off this hot path
    (JVM levenshtein codegen vs per-row Python).

    Blocking is (brand, sorted-name first token) + a per-record
    FUZZY_CAND_CAP candidate cap ranked by length difference (see
    _fuzzy_blocked) — both mirrored verbatim in the oracle, so the
    candidate set is identical across engines before scoring. Top-3 per
    part via an a_key-partitioned window (W4); the cap window and the
    rank window share the a_key hash partitioning, so the plan pays one
    shuffle for both."""
    ratio = F.round(
        100.0
        * (
            1.0
            - F.levenshtein("name_a", "name_b").cast("double")
            / F.greatest(F.length("name_a"), F.length("name_b"))
        ),
        1,
    )
    scored = _fuzzy_blocked(_t(spark, sf_dir, "part")).select(
        "a_key", "b_key", ratio.alias("ratio")
    )
    w = Window.partitionBy("a_key").orderBy(F.desc("ratio"), "b_key")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("a_key", "b_key", "ratio", "rnk")
    )


@register(
    "graph_three_hop",
    """
    WITH it AS (SELECT 'company:' || cast(p_partkey AS VARCHAR) AS c,
                       string_split(p_name, ' ') AS founders,
                       'industry:' || p_brand || '#' || p_type AS i
                FROM part),
    fc AS (SELECT DISTINCT c, 'founder:' || f AS f
           FROM it, unnest(founders) AS u(f)
           WHERE f IS NOT NULL AND f <> ''),
    ci AS (SELECT DISTINCT c, i FROM it)
    SELECT a.f AS founder, count(*) AS n_paths
    FROM fc a JOIN ci x ON a.c = x.c
              JOIN ci y ON x.i = y.i
              JOIN fc b ON y.c = b.c
    WHERE y.c <> a.c AND b.f <> a.f
    GROUP BY a.f
    """,
)
def graph_three_hop(spark, sf_dir):
    """J9: Founder -> Company -> Industry -> Company -> Founder path
    counts over the EXPORTED edge tables (graph.graph_edges), the
    reference's get_founders_by_founder Cypher traversal
    (knowledgeGraph/db.py:76-86) made aggregate.

    The edge table is built by the S14 exporter from an items-shaped
    frame synthesized off `part` (company = partkey, founders = name
    tokens, industry = brand#type), so the traversal exercises the real
    export path. The count itself never enumerates founder pairs:
    with deg(f,i) = #companies founded by f in industry i,
    nf(c) = #founders of c and M(i) = sum(nf(c) for c in i),
    inclusion-exclusion over the c2<>c1 and f2<>f constraints gives

      paths(f) = sum_i [ deg(f,i)*M(i) - sum_{c in f,i} nf(c)
                         - deg(f,i)^2 + deg(f,i) ]

    — three linear joins + group-bys (shuffle keyed on company, then
    (founder, industry), M broadcast), O(edges) at any scale, where the
    naive 4-way self-join is quadratic within each industry. The DuckDB
    oracle IS that naive enumeration, so the hash-match proves the
    algebra, not just the plumbing."""
    from .graph import graph_edges

    items = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("url_sha1"),
        F.split("p_name", " ").alias("founders"),
        F.array(F.concat_ws("#", "p_brand", "p_type")).alias("industries"),
        F.expr("cast(array() as array<string>)").alias("similar_companies"),
    )
    edges = graph_edges(items)
    fc = edges.filter(F.col("rel") == "FOUNDED_BY").select(
        F.col("src_id").alias("c"), F.col("dst_id").alias("f")
    )
    ci = edges.filter(F.col("rel") == "IN_INDUSTRY").select(
        F.col("src_id").alias("c"), F.col("dst_id").alias("i")
    )
    nf = fc.groupBy("c").agg(F.count("*").alias("nf"))
    m = (
        ci.join(nf, "c")
        .groupBy("i")
        .agg(F.sum("nf").alias("m_i"))
    )
    per_fi = (
        fc.join(ci, "c")
        .join(nf, "c")
        .groupBy("f", "i")
        .agg(F.count("*").alias("deg"), F.sum("nf").alias("s_nf"))
    )
    return (
        per_fi.join(F.broadcast(m), "i")
        .groupBy(F.col("f").alias("founder"))
        .agg(
            F.sum(
                F.col("deg") * F.col("m_i")
                - F.col("s_nf")
                - F.col("deg") * F.col("deg")
                + F.col("deg")
            ).alias("n_paths")
        )
    )


RECRAWL_MIN_S = 3600  # never recrawl faster than hourly
RECRAWL_MAX_S = 2_592_000  # 30 days: cap for never-changing pages


@register(
    "recrawl_schedule",
    f"""
    WITH o AS (
      SELECT user_id, ts, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events),
    s AS (
      SELECT user_id AS page_id, count(*) AS n_obs,
             sum(CASE WHEN prev IS NOT NULL AND value <> prev THEN 1 ELSE 0 END)
               AS n_changes,
             CAST(floor(epoch(max(ts))) AS BIGINT)
               - CAST(floor(epoch(min(ts))) AS BIGINT) AS span_s,
             CAST(floor(epoch(max(ts))) AS BIGINT) AS last_epoch
      FROM o GROUP BY 1)
    SELECT page_id, n_obs, n_changes::BIGINT AS n_changes,
           CASE WHEN n_changes > 0
                THEN least(greatest(
                       CAST(floor(span_s::DOUBLE / n_changes) AS BIGINT),
                       {RECRAWL_MIN_S}), {RECRAWL_MAX_S})
                ELSE {RECRAWL_MAX_S} END AS interval_s,
           last_epoch + CASE WHEN n_changes > 0
                THEN least(greatest(
                       CAST(floor(span_s::DOUBLE / n_changes) AS BIGINT),
                       {RECRAWL_MIN_S}), {RECRAWL_MAX_S})
                ELSE {RECRAWL_MAX_S} END AS next_fetch_epoch
    FROM s WHERE n_obs >= 2
    """,
)
def recrawl_schedule(spark, sf_dir):
    """Freshness-driven recrawl scheduling: per page, estimate the
    observed change interval (span / #changes, a change = consecutive
    observations with different values) and schedule the next fetch at
    last_seen + clamp(interval, 1h, 30d) — the incremental-crawl
    policy that decides which frontier URLs get re-enqueued, the
    counterpart to first-crawl priority (host_pagerank) and politeness
    (W3). The reference recrawls only on demand (requeue on fetch
    failure, spiders/crunchy.py:117-167); this is the principled
    steady-state policy a standing crawl needs.

    Scale shape: one lag window keyed (page, ts) — partition by page,
    never global — then one map-side-combinable agg on page; the clamp
    arithmetic is pure codegen. At 100 TB of fetch history the window
    partitions by page_id (bounded per-page history), and the output is
    page-sized, joinable straight back onto the frontier as its
    priority/when column."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.withColumn("prev", F.lag("value").over(w))
    changed = F.when(
        F.col("prev").isNotNull() & (F.col("value") != F.col("prev")), 1
    ).otherwise(0)
    s = o.groupBy(F.col("user_id").alias("page_id")).agg(
        F.count("*").alias("n_obs"),
        F.sum(changed).alias("n_changes"),
        (
            F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))
        ).alias("span_s"),
        F.unix_timestamp(F.max("ts")).alias("last_epoch"),
    )
    interval = F.when(
        F.col("n_changes") > 0,
        F.least(
            F.greatest(
                F.floor(F.col("span_s").cast("double") / F.col("n_changes")).cast(
                    "long"
                ),
                F.lit(RECRAWL_MIN_S).cast("long"),
            ),
            F.lit(RECRAWL_MAX_S).cast("long"),
        ),
    ).otherwise(F.lit(RECRAWL_MAX_S).cast("long"))
    return s.filter(F.col("n_obs") >= 2).select(
        "page_id",
        "n_obs",
        "n_changes",
        interval.alias("interval_s"),
        (F.col("last_epoch") + interval).alias("next_fetch_epoch"),
    )


PAGERANK_ITERS = 3
PAGERANK_D = 0.85


@register(
    "host_pagerank",
    f"""
    WITH j AS (SELECT l_suppkey, o_custkey, l_returnflag
               FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    edges AS (SELECT DISTINCT 's' || l_suppkey AS src, 'c' || o_custkey AS dst
              FROM j
              UNION ALL
              SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
              FROM j WHERE l_returnflag = 'R'),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
    deg AS (SELECT src AS node, count(*)::DOUBLE AS deg FROM edges GROUP BY 1),
    r0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
    d1 AS (SELECT coalesce(sum(r.r), 0) AS dang FROM r0 r
           LEFT JOIN deg USING (node) WHERE deg.deg IS NULL),
    c1 AS (SELECT e.dst AS node, sum(r.r / deg.deg) AS contrib
           FROM edges e JOIN r0 r ON e.src = r.node
                        JOIN deg ON e.src = deg.node GROUP BY 1),
    r1 AS (SELECT nodes.node,
                  0.15 / (SELECT n FROM nn)
                  + {PAGERANK_D} * (coalesce(c.contrib, 0)
                                    + (SELECT dang FROM d1) / (SELECT n FROM nn)) AS r
           FROM nodes LEFT JOIN c1 c USING (node)),
    d2 AS (SELECT coalesce(sum(r.r), 0) AS dang FROM r1 r
           LEFT JOIN deg USING (node) WHERE deg.deg IS NULL),
    c2 AS (SELECT e.dst AS node, sum(r.r / deg.deg) AS contrib
           FROM edges e JOIN r1 r ON e.src = r.node
                        JOIN deg ON e.src = deg.node GROUP BY 1),
    r2 AS (SELECT nodes.node,
                  0.15 / (SELECT n FROM nn)
                  + {PAGERANK_D} * (coalesce(c.contrib, 0)
                                    + (SELECT dang FROM d2) / (SELECT n FROM nn)) AS r
           FROM nodes LEFT JOIN c2 c USING (node)),
    d3 AS (SELECT coalesce(sum(r.r), 0) AS dang FROM r2 r
           LEFT JOIN deg USING (node) WHERE deg.deg IS NULL),
    c3 AS (SELECT e.dst AS node, sum(r.r / deg.deg) AS contrib
           FROM edges e JOIN r2 r ON e.src = r.node
                        JOIN deg ON e.src = deg.node GROUP BY 1),
    r3 AS (SELECT nodes.node,
                  0.15 / (SELECT n FROM nn)
                  + {PAGERANK_D} * (coalesce(c.contrib, 0)
                                    + (SELECT dang FROM d3) / (SELECT n FROM nn)) AS r
           FROM nodes LEFT JOIN c3 c USING (node))
    SELECT node, round(r, 6) AS pr FROM r3
    """,
)
def host_pagerank(spark, sf_dir):
    """Host-authority scoring for frontier prioritization: PAGERANK_ITERS
    power iterations of PageRank (d=0.85, dangling mass redistributed
    uniformly) over a data-derived link graph — the OPIC/PageRank
    priority every production crawler feeds back into its frontier
    ordering (the reference hardcodes a fixed per-queue priority —
    crunchbase vs tracxn routing, CrunchyCrawler/spiders/crunchy.py:202
    and frontier.QUEUE_RANK here; this is the principled score W1's
    3-level priority would consume as a fourth, data-driven level).

    The graph derives from lineitem⋈orders: supplier --ships--> customer
    edges, plus customer --returns--> supplier edges on l_returnflag='R'
    (so the graph has cycles AND dangling nodes — customers who never
    returned anything have no outlinks, exercising the dangling-mass
    term).

    Scale shape per iteration: ONE shuffle join of edges against the
    node-sized rank table keyed on src (both grow with data — never
    broadcast), one map-side-combinable sum keyed on dst, and two 1-row
    broadcast scalars (N, dangling mass) riding crossJoins like
    bm25_topk's corpus stats. Ranks are localCheckpoint'd per iteration
    so lineage/plan size stays O(1) in the iteration count — the same
    discipline as _connected_components. The DuckDB oracle unrolls the
    identical iterations as CTEs; round(,6) absorbs summation-order
    float noise (addends ~1e-4, error ~1e-15)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_suppkey", "o_custkey", "l_returnflag"
    )
    s_node = F.concat(F.lit("s"), F.col("l_suppkey"))
    c_node = F.concat(F.lit("c"), F.col("o_custkey"))
    ship = j.select(s_node.alias("src"), c_node.alias("dst")).distinct()
    ret = (
        j.filter(F.col("l_returnflag") == "R")
        .select(c_node.alias("src"), s_node.alias("dst"))
        .distinct()
    )
    edges = ship.unionByName(ret).localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint()
    )
    nn = nodes.agg(F.count("*").cast("double").alias("n"))
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").cast("double").alias("deg")
    )
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(PAGERANK_ITERS):
        dang = (
            ranks.join(deg, "node", "left")
            .filter(F.col("deg").isNull())
            .agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("dang"))
        )
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(deg.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("r") / F.col("deg")).alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(nn))
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(0.15) / F.col("n")
                    + F.lit(PAGERANK_D)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("dang") / F.col("n")
                    )
                ).alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.round("r", 6).alias("pr"))


# ===========================================================================
# D. Corpus-curation operators (round 3): near-dup clustering, PII
# redaction, repetition quality, boilerplate n-grams, decontamination.
# These extend the training-data block (§C) from per-pair evidence to the
# whole-corpus decisions an LLM-data pipeline actually ships: which doc
# survives dedup, which text is scrubbed, which doc is dropped for
# repetition or benchmark contamination.
# ===========================================================================


def _connected_components(vertices, edges, max_rounds: int = 20):
    """Distributed connected components: min-label propagation
    ("hash-to-min", Rastogi et al. 2013) plus pointer-jumping, so rounds
    are O(log diameter) rather than O(diameter). Each round is one
    shuffle keyed on `node` (the propagate) plus one self-join (the
    jump); `localCheckpoint` truncates lineage every round, which is
    what keeps an iterative DataFrame algorithm viable — without it the
    plan doubles per round. Edges are materialized once up front so the
    upstream pair-generation (LSH banding) never re-executes inside the
    loop. At 100 TB the alternative with the same guarantees is
    large-star/small-star (Kiveris et al. 2014); hash-to-min is chosen
    because dup clusters have tiny diameters, so it converges in 2-3
    rounds on real corpora while staying 100% DataFrame-native.

    vertices: DataFrame[node]; edges: DataFrame[u, v] undirected, u != v.
    Returns DataFrame[node, comp] with comp = min node id in component.
    """
    und = (
        edges.select("u", "v")
        .unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .repartition("u")
        .localCheckpoint()
    )
    labels = vertices.select("node", F.col("node").alias("comp")).localCheckpoint()

    def _jump(df: DataFrame) -> DataFrame:
        j = df.select(F.col("node").alias("jnode"), F.col("comp").alias("jcomp"))
        return df.join(j, df["comp"] == j["jnode"], "left").select(
            "node", F.coalesce("jcomp", "comp").alias("comp")
        )

    for _ in range(max_rounds):
        nbr = und.join(
            labels.withColumnRenamed("node", "v").withColumnRenamed("comp", "ncomp"), "v"
        ).select(F.col("u").alias("node"), F.col("ncomp").alias("comp"))
        new = labels.unionByName(nbr).groupBy("node").agg(F.min("comp").alias("comp"))
        # TWO pointer jumps per round (chain depth /4 per round) and ONE
        # action: the repeated propagate/jump subtrees are canonically
        # identical, so every self-join branch resolves to a
        # ReusedExchange of the same shuffle — the 4-way textual blowup
        # costs one execution. One localCheckpoint per round (not one
        # per step) because driver-side job latency, not data volume,
        # dominates iterative rounds; lineage still truncates per round.
        new = _jump(_jump(new)).localCheckpoint()
        # convergence probe over two checkpointed inputs — cheap scan
        changed = (
            new.join(labels.withColumnRenamed("comp", "old"), "node")
            .filter(F.col("comp") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            return labels
    raise RuntimeError(f"connected components did not converge in {max_rounds} rounds")


# The near-dup edge set IS minhash_lsh_pairs; its registered oracle text
# is reused verbatim as a CTE so the component oracle can never drift
# from the pair oracle.
_PAIRS_SQL = ORACLES["minhash_lsh_pairs"]


@register(
    "neardup_components",
    f"""
    WITH RECURSIVE pairs AS ({_PAIRS_SQL}),
    und AS (SELECT a_id AS u, b_id AS v FROM pairs
            UNION SELECT b_id, a_id FROM pairs),
    reach(u, v) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u)
    SELECT u AS doc_id, min(v) AS component_id FROM reach GROUP BY u
    """,
)
def neardup_components(spark, sf_dir):
    """Near-dup CLUSTERS from the MinHash-LSH pair stream: connected
    components over (a_id, b_id) edges, component id = min doc_id —
    i.e. the "keep one canonical doc per dup cluster" decision that
    pair-listing alone cannot make (A and B dups, B and C dups => keep
    only A). Every document appears; singletons map to themselves.

    Scale: pairs come from the banded LSH join (never all-pairs); the
    component step is hash-to-min + pointer jumping (O(log d) rounds,
    one keyed shuffle per round — see _connected_components). The
    DuckDB oracle computes the transitive closure of the SAME pair SQL
    with a recursive CTE, so the hash-match proves the clustering, not
    just the plumbing. Reference analog: entity_resolver merge groups
    (resolve_entities.py:225-301) collapse matched records the same
    way, row-at-a-time in Mongo."""
    pairs = (
        minhash_lsh_pairs(spark, sf_dir)
        .select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
        .localCheckpoint()
    )
    docs = _t(spark, sf_dir, "documents").select(F.col("doc_id").alias("node"))
    labels = _connected_components(docs, pairs)
    return labels.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component_id")
    )


# PII patterns — written to the RE2 ∩ java.util.regex common subset so
# the Spark engine and the DuckDB oracle compile the identical pattern.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+\d{1,2}-\d{3}-\d{3}-\d{4}"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# Deterministic PII augmentation: the synthetic corpus carries no PII, so
# both engines append the SAME doc_id-derived contact block to ~3/4 of
# docs (and a second phone to every 5th) before scrubbing — the counts
# then vary 0/1/2 and the redaction is exercised on real matches.
_PII_AUG_SQL = (
    "text || CASE WHEN doc_id % 4 <> 3 THEN ' contact user' || doc_id"
    " || '@mail.example.com or +1-' || (100 + doc_id % 900)"
    " || '-555-' || lpad(((doc_id * 7) % 10000)::VARCHAR, 4, '0')"
    " || ' ip 10.' || (doc_id % 256) || '.0.' || ((doc_id * 3) % 256)"
    " ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' alt +44-202-555-0199' ELSE '' END"
)


def _pii_aug_col():
    contact = F.concat(
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +1-"),
        (F.lit(100) + F.col("doc_id") % 900).cast("string"),
        F.lit("-555-"),
        F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 3) % 256).cast("string"),
    )
    return F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 4 != 3, contact).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" alt +44-202-555-0199")).otherwise(
            F.lit("")
        ),
    )


@register(
    "pii_redact",
    f"""
    WITH aug AS (SELECT doc_id, {_PII_AUG_SQL} AS t FROM documents)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(t,
               '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
               '{PII_PHONE_RE}', '<PHONE>', 'g'),
               '{PII_IP_RE}', '<IP>', 'g') AS red_text,
           len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS n_phones,
           len(regexp_extract_all(t, '{PII_IP_RE}')) AS n_ips
    FROM aug
    """,
)
def pii_redact(spark, sf_dir):
    """PII scrub for training corpora: count + redact emails, phone
    numbers and IPv4 addresses with <EMAIL>/<PHONE>/<IP> placeholders.
    Pure columnar regexp_replace / regexp_count — JVM-side, codegen'd,
    zero Python in the hot path, embarrassingly parallel (no shuffle at
    all: the plan is scan -> project). At 100 TB this runs at parquet
    scan speed. The redaction order (email, then phone, then IP) is part
    of the contract and mirrored in the oracle. Reference analog: none —
    the reference stores raw scraped text; this is the LLM-pipeline
    extension the graft calls for."""
    d = _t(spark, sf_dir, "documents").select("doc_id", _pii_aug_col().alias("t"))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE,
            "<PHONE>",
        ),
        PII_IP_RE,
        "<IP>",
    )
    return d.select(
        "doc_id",
        red.alias("red_text"),
        F.regexp_count(F.col("t"), F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(F.col("t"), F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(F.col("t"), F.lit(PII_IP_RE)).cast("long").alias("n_ips"),
    )


# Token list WITH duplicates (the §C ops use the _TOKS_SQL distinct set;
# repetition metrics need multiplicity and order).
_TOKS_RAW_SQL = "string_split_regex(lower(text), '\\s+')"


# Gopher-style repetition gates (Rae et al. 2021 §A1.1 use duplicate
# line/word and top-n-gram fractions; the synthetic corpus has no lines,
# so the word and bigram variants are the meaningful ones here).
REP_DUP_WORD_MAX = 0.5
REP_TOP_BIGRAM_MAX = 0.08


@register(
    "repetition_quality",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_RAW_SQL} AS toks FROM documents),
    base AS (SELECT doc_id, len(toks) AS n_tokens,
                    len(list_distinct(toks)) AS n_distinct FROM t),
    bg AS (SELECT doc_id,
                  unnest(list_transform(range(1, len(toks)),
                         i -> toks[i] || ' ' || toks[i + 1])) AS bg
           FROM t),
    top AS (SELECT doc_id, max(cnt) AS top_bg FROM
              (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY doc_id, bg)
            GROUP BY doc_id)
    SELECT b.doc_id, b.n_tokens, b.n_distinct,
           round(1 - b.n_distinct::DOUBLE / b.n_tokens, 4) AS dup_word_frac,
           round(coalesce(top.top_bg, 0)::DOUBLE
                 / greatest(b.n_tokens - 1, 1), 4) AS top_bigram_frac,
           (round(1 - b.n_distinct::DOUBLE / b.n_tokens, 4)
              > {REP_DUP_WORD_MAX}
            OR round(coalesce(top.top_bg, 0)::DOUBLE
                     / greatest(b.n_tokens - 1, 1), 4)
              > {REP_TOP_BIGRAM_MAX}) AS is_repetitive
    FROM base b LEFT JOIN top ON b.doc_id = top.doc_id
    """,
)
def repetition_quality(spark, sf_dir):
    """Gopher-style repetition quality gate: duplicate-word fraction
    (1 - distinct/total) and top-bigram fraction (most frequent bigram /
    all bigrams) per document, with the drop flag. The bigram path is
    explode -> two-level hash agg keyed on (doc_id, bigram) then doc_id
    — map-side combinable, no window, no sort; the scalar stats are a
    pure project over the token array. At 100 TB the only shuffle is the
    bigram count agg, keyed by doc so it cannot skew across docs.
    Rounding to 4 dp happens BEFORE the threshold compare in both
    engines so the flag can never straddle a float ulp."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), r"\s+").alias("toks")
    )
    base = d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    )
    bigrams = d.filter(F.size("toks") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 2),"
                " i -> concat(toks[i], ' ', toks[i + 1]))"
            )
        ).alias("bg"),
    )
    top = (
        bigrams.groupBy("doc_id", "bg")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_bg"))
    )
    dup_frac = F.round(
        F.lit(1) - F.col("n_distinct").cast("double") / F.col("n_tokens"), 4
    )
    bg_frac = F.round(
        F.coalesce(F.col("top_bg"), F.lit(0)).cast("double")
        / F.greatest(F.col("n_tokens") - 1, F.lit(1)),
        4,
    )
    return (
        base.join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            "n_distinct",
            dup_frac.alias("dup_word_frac"),
            bg_frac.alias("top_bigram_frac"),
            (
                (dup_frac > REP_DUP_WORD_MAX) | (bg_frac > REP_TOP_BIGRAM_MAX)
            ).alias("is_repetitive"),
        )
    )


def _ngram_rows(d: DataFrame, n: int) -> DataFrame:
    """doc_id, gram rows for word n-grams (order-preserving, with
    multiplicity). transform(sequence(...)) stays inside codegen; docs
    shorter than n contribute nothing."""
    parts = ", ".join(f"toks[i + {k}]" for k in range(n))
    return d.filter(F.size("toks") >= n).select(
        "doc_id",
        F.explode(
            F.expr(f"transform(sequence(0, size(toks) - {n}), i -> concat_ws(' ', {parts}))")
        ).alias("gram"),
    )


def _ngram_sql(n: int) -> str:
    parts = " || ' ' || ".join(f"toks[i + {k}]" for k in range(n))
    return (
        f"SELECT doc_id, unnest(list_transform(range(1, len(toks) - {n - 2}),"
        f" i -> {parts})) AS gram"
        f" FROM (SELECT doc_id, {_TOKS_RAW_SQL} AS toks FROM documents)"
    )


NGRAM_TOPK_N = 5
NGRAM_TOPK_K = 50


@register(
    "ngram_topk_corpus",
    f"""
    WITH g AS ({_ngram_sql(NGRAM_TOPK_N)})
    SELECT gram, count(*) AS total_count,
           count(DISTINCT doc_id) AS n_docs
    FROM g GROUP BY gram
    ORDER BY total_count DESC, gram
    LIMIT {NGRAM_TOPK_K}
    """,
)
def ngram_topk_corpus(spark, sf_dir):
    """Corpus-level boilerplate detector: the top-50 most frequent word
    5-grams across the whole corpus with total occurrences and
    document frequency — the scan that finds headers/footers/licence
    blurbs worth stripping before training. Plan: explode -> hash agg on
    gram (map-side partial, so each executor emits only its local
    distinct grams) -> TakeOrderedAndProject for the top-k; the full
    gram set is never sorted or collected. Ties at the boundary break
    on the gram string, so the result is a deterministic total order."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), r"\s+").alias("toks")
    )
    return (
        _ngram_rows(d, NGRAM_TOPK_N)
        .groupBy("gram")
        .agg(
            F.count("*").alias("total_count"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("total_count"), "gram")
        .limit(NGRAM_TOPK_K)
    )


DECON_NGRAM_N = 3  # real pipelines use 8-13; the synthetic corpus's
# ~40-word vocabulary makes 3 the density where overlap exists at all —
# the mechanism (probe-gram broadcast semi-join) is N-independent.
DECON_PROBE_MAX_ID = 10


@register(
    "benchmark_decontaminate",
    f"""
    WITH g AS ({_ngram_sql(DECON_NGRAM_N)}),
    probe AS (SELECT DISTINCT gram FROM g WHERE doc_id < {DECON_PROBE_MAX_ID}),
    corpus AS (SELECT doc_id, gram FROM g WHERE doc_id >= {DECON_PROBE_MAX_ID})
    SELECT c.doc_id, count(DISTINCT c.gram) AS n_shared_grams
    FROM corpus c JOIN probe p ON c.gram = p.gram
    GROUP BY c.doc_id
    """,
)
def benchmark_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training docs sharing any word
    n-gram with a held-out probe set (docs 0..9 stand in for the
    benchmark). The probe gram set is benchmark-sized — tiny relative
    to the corpus — so it is BROADCAST and the contamination check is a
    map-side semi-join at parquet-scan speed; the only shuffle is the
    per-doc distinct-gram count, keyed on doc_id. Returns the
    contaminated docs with their shared-gram counts; dropping them is a
    left-anti join against this output."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), r"\s+").alias("toks")
    )
    g = _ngram_rows(d, DECON_NGRAM_N)
    probe = (
        g.filter(F.col("doc_id") < DECON_PROBE_MAX_ID).select("gram").distinct()
    )
    corpus = g.filter(F.col("doc_id") >= DECON_PROBE_MAX_ID)
    return (
        corpus.join(F.broadcast(probe), "gram")
        .groupBy("doc_id")
        .agg(F.countDistinct("gram").alias("n_shared_grams"))
    )


# Reuse the registered quality oracle verbatim so the canonical-doc
# oracle can never drift from quality_score's definition.
_QSCORE_SQL = ORACLES["quality_score"]


@register(
    "neardup_canonical_docs",
    f"""
    WITH RECURSIVE pairs AS ({_PAIRS_SQL}),
    und AS (SELECT a_id AS u, b_id AS v FROM pairs
            UNION SELECT b_id, a_id FROM pairs),
    reach(u, v) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
    comp AS (SELECT u AS doc_id, min(v) AS component_id FROM reach GROUP BY u),
    q AS ({_QSCORE_SQL}),
    jq AS (SELECT c.component_id, q.doc_id, q.qscore
           FROM comp c JOIN q ON c.doc_id = q.doc_id),
    best AS (SELECT component_id, max(qscore) AS best_qscore,
                    count(*) AS n_members
             FROM jq GROUP BY component_id)
    SELECT b.component_id, min(j.doc_id) AS canonical_id,
           b.best_qscore, b.n_members
    FROM best b JOIN jq j ON j.component_id = b.component_id
                         AND j.qscore = b.best_qscore
    GROUP BY b.component_id, b.best_qscore, b.n_members
    """,
)
def neardup_canonical_docs(spark, sf_dir):
    """The dedup DECISION end-to-end: for every near-dup cluster
    (neardup_components) keep the highest-quality member
    (quality_score), ties broken by min doc_id — i.e. which doc
    survives into the training set and how many it replaces. The argmax
    is a single map-side-combinable max(struct(qscore, -doc_id))
    aggregate keyed by component — no window, no sort, one shuffle.
    Joining quality onto labels is component-keyed and cannot skew
    worse than the largest dup cluster, which the banding already
    bounds. Oracle: the same recursive-closure + quality CTEs with an
    equality-join argmax, so the hash-match pins cluster membership,
    the quality formula, AND the tie-break."""
    comp = neardup_components(spark, sf_dir).localCheckpoint()
    return _canonical_docs(spark, sf_dir, comp)


def _canonical_docs(spark, sf_dir, comp: DataFrame) -> DataFrame:
    """Quality-argmax canonical per component over a PROVIDED label
    table — shared by neardup_canonical_docs and curation_keep_list so
    a composed caller pays for the closure once."""
    q = quality_score(spark, sf_dir).select("doc_id", "qscore")
    jq = comp.join(q, "doc_id")
    best = jq.groupBy("component_id").agg(
        F.max(F.struct(F.col("qscore"), (-F.col("doc_id")).alias("neg"))).alias("b"),
        F.count("*").alias("n_members"),
    )
    return best.select(
        "component_id",
        (-F.col("b.neg")).alias("canonical_id"),
        F.col("b.qscore").alias("best_qscore"),
        "n_members",
    )


# ===========================================================================
# H. Cross-modal image+caption curation — operators over the input_hint
#    table itself (image_id, w, h, fmt, caption, phash). The committed
#    fixture now carries DESIGNED caption-duplicate structure
#    (datagen.caption_for: exact copies at idx%5==3, token-level
#    near-dups at idx%7==4) alongside the phash near-dup pairs, so
#    cross-modal dedup decisions are non-trivial and oracle-checkable.
# ===========================================================================
_CAPNORM = "lower(regexp_replace(trim(caption), '\\s+', ' ', 'g'))"


def _cap_norm():
    """Whitespace-collapsed lowercase caption — the dedup key a crawl
    pipeline uses so cosmetic whitespace/case edits don't defeat exact
    caption dedup (reference normalizes extracted text the same way
    before persisting, parser/CrunchbaseDataParser.py:18-82)."""
    return F.lower(F.regexp_replace(F.trim("caption"), r"\s+", " "))


@register(
    "crossmodal_dup_classify",
    f"""
    WITH m AS (SELECT image_id, phash, {_CAPNORM} AS cap
               FROM read_parquet('{_IMAGES_META}')),
    cap_pairs AS (
      SELECT a.image_id AS a_id, b.image_id AS b_id
      FROM m a JOIN m b ON a.cap = b.cap AND a.image_id < b.image_id),
    bands AS (
      SELECT image_id, i AS band_id, (phash >> (8 * i)) & 255 AS band_val
      FROM m, unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS t(i)),
    cand AS (
      SELECT DISTINCT a.image_id AS a_id, b.image_id AS b_id
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                  AND a.image_id < b.image_id),
    img_pairs AS (
      SELECT c.a_id, c.b_id
      FROM cand c
      JOIN m ma ON ma.image_id = c.a_id
      JOIN m mb ON mb.image_id = c.b_id
      WHERE bit_count(xor(ma.phash, mb.phash)) <= {PHASH_THRESH}),
    u AS (
      SELECT coalesce(c.a_id, i.a_id) AS a_id,
             coalesce(c.b_id, i.b_id) AS b_id,
             c.a_id IS NOT NULL AS caption_match,
             i.a_id IS NOT NULL AS image_match
      FROM cap_pairs c
      FULL OUTER JOIN img_pairs i ON c.a_id = i.a_id AND c.b_id = i.b_id)
    SELECT u.a_id, u.b_id,
           bit_count(xor(ma.phash, mb.phash)) AS hamming,
           u.caption_match, u.image_match,
           CASE WHEN u.caption_match AND u.image_match THEN 'both'
                WHEN u.image_match THEN 'image_only'
                ELSE 'caption_only' END AS dup_class
    FROM u
    JOIN m ma ON ma.image_id = u.a_id
    JOIN m mb ON mb.image_id = u.b_id
    """,
)
def crossmodal_dup_classify(spark, sf_dir):
    """Cross-modal duplicate classification over the image+caption
    table: every pair that is a duplicate in EITHER modality, labeled
    `both` / `image_only` / `caption_only`. This is the decision table
    a multimodal curation pipeline acts on — `both` rows are safe
    drops, `image_only` rows are re-captioned copies (keep one image,
    union the captions), `caption_only` rows are caption farming
    (suspect text, distinct art). Replaces the reference's single-
    modality exact-URL dupefilter (rabbitmq/dupefilter.py:35-44) with
    perceptual + textual identity.

    Scale shape: the caption side is an equi-join on the normalized
    caption value — a data-growing key (caption cardinality grows with
    the corpus), so blocks stay bounded and the join is a plain
    shuffle-hash join; no all-pairs anywhere. The image side reuses the
    pigeonhole-exact 8-band phash join (phash_band_pairs). The two
    pair sets meet in a full outer join keyed on (a_id, b_id) — ids
    only, 8-byte phashes re-joined afterward for the uniform hamming
    column. Ignores sf_dir (fixture universe, same data as oracle)."""
    m = (
        spark.read.parquet(_IMAGES_META)
        .select("image_id", "phash", _cap_norm().alias("cap"))
        .localCheckpoint()  # tiny dim read 4x (two pair sides + 2 phash joins)
    )
    a = m.select(F.col("image_id").alias("a_id"), F.col("cap").alias("cap_a"))
    b = m.select(F.col("image_id").alias("b_id"), F.col("cap").alias("cap_b"))
    cap_pairs = a.join(
        b, (F.col("cap_a") == F.col("cap_b")) & (F.col("a_id") < F.col("b_id"))
    ).select("a_id", "b_id", F.lit(True).alias("caption_match"))
    img_pairs = phash_band_pairs(
        m.select("image_id", "phash"), PHASH_THRESH
    ).select("a_id", "b_id", F.lit(True).alias("image_match"))
    u = cap_pairs.join(img_pairs, ["a_id", "b_id"], "full_outer")
    pa = m.select(F.col("image_id").alias("a_id"), F.col("phash").alias("pa"))
    pb = m.select(F.col("image_id").alias("b_id"), F.col("phash").alias("pb"))
    return (
        u.withColumn("caption_match", F.coalesce("caption_match", F.lit(False)))
        .withColumn("image_match", F.coalesce("image_match", F.lit(False)))
        .join(pa, "a_id")
        .join(pb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).alias("hamming"),
            "caption_match",
            "image_match",
            F.when(F.col("caption_match") & F.col("image_match"), F.lit("both"))
            .when(F.col("image_match"), F.lit("image_only"))
            .otherwise(F.lit("caption_only"))
            .alias("dup_class"),
        )
    )


@register(
    "caption_token_neardup",
    f"""
    WITH t AS (SELECT image_id, {_CAPNORM} AS cap,
                      list_distinct(string_split({_CAPNORM}, ' ')) AS toks
               FROM read_parquet('{_IMAGES_META}')),
    tb AS (SELECT image_id, cap, toks, list_min(toks) AS blk FROM t),
    p AS (SELECT a.image_id AS a_id, b.image_id AS b_id,
                 a.toks AS ta, b.toks AS tb_
          FROM tb a JOIN tb b
            ON a.blk = b.blk AND a.image_id < b.image_id AND a.cap <> b.cap),
    j AS (SELECT a_id, b_id,
                 round(len(list_intersect(ta, tb_))::DOUBLE
                       / len(list_distinct(list_concat(ta, tb_))), 4) AS jaccard
          FROM p)
    SELECT a_id, b_id, jaccard FROM j WHERE jaccard >= 0.6
    """,
)
def caption_token_neardup(spark, sf_dir):
    """Token-level caption NEAR-dup pairs (Jaccard >= 0.6, exact-equal
    captions excluded — those are crossmodal_dup_classify's rows): the
    text-side fuzzy dedup a caption corpus needs for 'same alt-text
    plus one boilerplate token' edits. Blocking is bottom-1 minhash
    with the identity permutation — the lexicographic MIN token of the
    distinct-token set — so each block is keyed by a data-growing
    value and the join is a plain shuffle-hash join. A pair sharing
    >= 60% of tokens shares its min token unless every one of the
    smallest tokens is among the edits; for suffix-style edits (the
    fixture's designed `+ photo` rows, J = 3/4) recall is exact since
    digit tokens sort below alpha tokens. The single-band recall
    caveat and the banded alternative are documented at
    ngram_shingle_jaccard_pairs (same scheme over document shingles).
    Jaccard via array_intersect/array_union sizes — JVM set ops, no
    UDF. Ignores sf_dir (fixture universe, same data as oracle)."""
    cap = _cap_norm()
    t = (
        spark.read.parquet(_IMAGES_META)
        .select(
            "image_id",
            cap.alias("cap"),
            F.array_distinct(F.split(cap, " ")).alias("toks"),
        )
        .withColumn("blk", F.array_min("toks"))
    )
    a = t.select(
        F.col("image_id").alias("a_id"),
        F.col("cap").alias("cap_a"),
        F.col("toks").alias("toks_a"),
        "blk",
    )
    b = t.select(
        F.col("image_id").alias("b_id"),
        F.col("cap").alias("cap_b"),
        F.col("toks").alias("toks_b"),
        F.col("blk").alias("blk_b"),
    )
    pairs = a.join(
        b,
        (F.col("blk") == F.col("blk_b"))
        & (F.col("a_id") < F.col("b_id"))
        & (F.col("cap_a") != F.col("cap_b")),
    )
    jac = F.round(
        F.size(F.array_intersect("toks_a", "toks_b"))
        / F.size(F.array_union("toks_a", "toks_b")),
        4,
    )
    return pairs.select("a_id", "b_id", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.6
    )


@register(
    "image_caption_quality_filter",
    f"""
    SELECT image_id,
           len(string_split({_CAPNORM}, ' ')) AS n_tokens,
           w * h AS pixels,
           round(greatest(w, h)::DOUBLE / least(w, h), 2) AS aspect,
           w * h >= 1536 AS res_ok,
           greatest(w, h)::DOUBLE / least(w, h) <= 3.0 AS aspect_ok,
           len(string_split({_CAPNORM}, ' ')) >= 3 AS caption_ok,
           (w * h >= 1536 AND greatest(w, h)::DOUBLE / least(w, h) <= 3.0
            AND len(string_split({_CAPNORM}, ' ')) >= 3) AS keep
    FROM read_parquet('{_IMAGES_META}')
    """,
)
def image_caption_quality_filter(spark, sf_dir):
    """LAION-style image+caption curation gates, per row: minimum
    resolution (w*h >= 1536 px), bounded aspect ratio (<= 3:1 — drops
    banner/sliver crops), minimum caption length (>= 3 tokens). Emits
    the per-gate flags AND the combined keep decision so downstream
    stats can attribute drops to a gate. Pure columnar scan->project —
    zero exchanges, whole-stage-codegen'd end to end, trivially
    partition-parallel at any scale; the gates are exactly the kind of
    cheap first-pass filter that runs BEFORE any pair-generating dedup
    so the expensive operators see a pre-shrunk corpus. Ignores sf_dir
    (fixture universe, same data as oracle)."""
    m = spark.read.parquet(_IMAGES_META)
    n_tokens = F.size(F.split(_cap_norm(), " "))
    pixels = F.col("w") * F.col("h")
    aspect = F.greatest("w", "h") / F.least("w", "h")
    return m.select(
        "image_id",
        n_tokens.alias("n_tokens"),
        pixels.alias("pixels"),
        F.round(aspect, 2).alias("aspect"),
        (pixels >= 1536).alias("res_ok"),
        (aspect <= 3.0).alias("aspect_ok"),
        (n_tokens >= 3).alias("caption_ok"),
        ((pixels >= 1536) & (aspect <= 3.0) & (n_tokens >= 3)).alias("keep"),
    )


# Reuse the registered phash pair oracle verbatim as a CTE so the image
# component oracle can never drift from the pair oracle (same trick as
# neardup_components over minhash_lsh_pairs).
_PHASH_PAIRS_SQL = ORACLES["phash_hamming_neardup"]


@register(
    "image_dup_canonical",
    f"""
    WITH RECURSIVE pairs AS ({_PHASH_PAIRS_SQL}),
    und AS (SELECT a_id AS u, b_id AS v FROM pairs
            UNION SELECT b_id, a_id FROM pairs),
    reach(u, v) AS (
      SELECT image_id, image_id FROM read_parquet('{_IMAGES_META}')
      UNION
      SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
    comp AS (SELECT u AS image_id, min(v) AS component_id FROM reach GROUP BY u),
    m AS (SELECT image_id, w * h AS pixels,
                 CAST(substr(image_id, 4) AS BIGINT) AS idnum
          FROM read_parquet('{_IMAGES_META}')),
    j AS (SELECT c.component_id, m.pixels, m.idnum
          FROM comp c JOIN m ON m.image_id = c.image_id),
    agg AS (SELECT component_id, count(*) AS n_members,
                   max(pixels) AS best_pixels
            FROM j GROUP BY component_id),
    pick AS (SELECT j.component_id, min(j.idnum) AS mid
             FROM j JOIN agg a ON a.component_id = j.component_id
                              AND j.pixels = a.best_pixels
             GROUP BY j.component_id)
    SELECT agg.component_id,
           'img' || lpad(pick.mid::VARCHAR, 10, '0') AS canonical_id,
           agg.best_pixels, agg.n_members
    FROM agg JOIN pick USING (component_id)
    """,
)
def image_dup_canonical(spark, sf_dir):
    """The image-side dedup DECISION end-to-end (analog of
    neardup_canonical_docs for the text side): cluster the banded phash
    near-dup pair stream into connected components, then keep the
    highest-RESOLUTION member per cluster (ties -> min image_id — the
    designed idx%4==1 near-dup pairs share dims, so the tie-break is
    exercised on every one). This is what a crawl pipeline actually
    ships: which fetched image survives into the corpus and how many
    perceptual copies it replaces.

    Scale shape: pairs from the pigeonhole-exact 8-band join (never
    all-pairs); components via hash-to-min + pointer jumping (O(log d)
    rounds, one keyed shuffle per round, _connected_components); the
    survivor pick is ONE map-side-combinable max(struct(pixels,
    -idnum)) aggregate keyed by component — no window, no sort. The
    DuckDB oracle recursively closes the SAME pair SQL and picks with
    an equality-join argmax, so the hash-match pins cluster membership,
    the resolution preference, AND the tie-break. Ignores sf_dir
    (fixture universe, same data as oracle)."""
    meta = spark.read.parquet(_IMAGES_META).select("image_id", "phash", "w", "h")
    pairs = (
        phash_band_pairs(meta.select("image_id", "phash"), PHASH_THRESH)
        .select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
        .localCheckpoint()
    )
    labels = _connected_components(
        meta.select(F.col("image_id").alias("node")), pairs
    )
    return _image_canonical(labels, _image_idnum(meta))


def _image_idnum(meta: DataFrame) -> DataFrame:
    """(image_id, w, h, ...) -> (node, pixels, idnum) for the survivor
    pick — idnum is the numeric tail of 'imgNNNNNNNNNN' ids."""
    return meta.select(
        F.col("image_id").alias("node"),
        (F.col("w") * F.col("h")).alias("pixels"),
        F.substring("image_id", 4, 10).cast("long").alias("idnum"),
    )


def _image_canonical(labels: DataFrame, m: DataFrame) -> DataFrame:
    """(node, comp) labels + (node, pixels, idnum) -> one survivor per
    component: max pixels, ties -> min idnum, via ONE map-side-
    combinable max(struct) agg — no window, no sort. Shared by
    image_dup_canonical and image_keep_list so the survivor rule cannot
    drift between the standalone op and the composed decision table."""
    j = labels.join(m, "node")
    best = j.groupBy(F.col("comp").alias("component_id")).agg(
        F.count("*").alias("n_members"),
        F.max(F.struct(F.col("pixels"), (-F.col("idnum")).alias("neg"))).alias("b"),
    )
    return best.select(
        "component_id",
        F.concat(
            F.lit("img"), F.lpad((-F.col("b.neg")).cast("string"), 10, "0")
        ).alias("canonical_id"),
        F.col("b.pixels").alias("best_pixels"),
        "n_members",
    )


@register(
    "image_keep_list",
    f"""
    WITH RECURSIVE
    pairs AS ({{PHASH_PAIRS_SQL}}),
    und AS (SELECT a_id AS u, b_id AS v FROM pairs
            UNION SELECT b_id, a_id FROM pairs),
    reach(u, v) AS (
      SELECT image_id, image_id FROM read_parquet('{_IMAGES_META}')
      UNION
      SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
    comp AS (SELECT u AS image_id, min(v) AS component_id FROM reach GROUP BY u),
    m AS (SELECT image_id, w * h AS pixels,
                 CAST(substr(image_id, 4) AS BIGINT) AS idnum,
                 {_CAPNORM} AS cap
          FROM read_parquet('{_IMAGES_META}')),
    jm AS (SELECT c.component_id, m.image_id, m.pixels, m.idnum
           FROM comp c JOIN m USING (image_id)),
    best AS (SELECT component_id, max(pixels) AS best_pixels
             FROM jm GROUP BY component_id),
    pick AS (SELECT jm.component_id, min(jm.idnum) AS canon_idnum
             FROM jm JOIN best b ON b.component_id = jm.component_id
                                AND jm.pixels = b.best_pixels
             GROUP BY jm.component_id),
    capmin AS (SELECT cap, min(idnum) AS cap_min FROM m GROUP BY cap),
    nd AS ({{CAP_ND_SQL}}),
    ndrop AS (SELECT DISTINCT b_id AS image_id FROM nd),
    q AS ({{QUAL_SQL}}),
    reasons AS (
      SELECT m.image_id,
             CASE
               WHEN m.idnum <> pick.canon_idnum THEN 'image_dup'
               WHEN m.idnum <> capmin.cap_min THEN 'caption_dup'
               WHEN ndrop.image_id IS NOT NULL THEN 'caption_neardup'
               WHEN NOT q.keep THEN 'low_quality'
               ELSE 'keep'
             END AS reason
      FROM m
      JOIN comp c ON c.image_id = m.image_id
      JOIN pick ON pick.component_id = c.component_id
      JOIN capmin ON capmin.cap = m.cap
      JOIN q ON q.image_id = m.image_id
      LEFT JOIN ndrop ON ndrop.image_id = m.image_id)
    SELECT image_id, reason, (reason = 'keep') AS keep FROM reasons
    """.replace("{PHASH_PAIRS_SQL}", _PHASH_PAIRS_SQL)
    .replace("{CAP_ND_SQL}", ORACLES["caption_token_neardup"])
    .replace("{QUAL_SQL}", ORACLES["image_caption_quality_filter"]),
)
def image_keep_list(spark, sf_dir):
    """THE multimodal curation decision a crawl pipeline ships (the
    image-side twin of curation_keep_list): one keep/drop verdict per
    image+caption row with a prioritized reason code — image_dup (not
    its phash-component's highest-resolution survivor,
    image_dup_canonical's rule via the shared _image_canonical helper)
    > caption_dup (not the min-id member of its exact normalized-
    caption group — re-used alt text / caption farming) >
    caption_neardup (the LARGER id of any caption_token_neardup pair:
    keep-first greedy by arrival order, the incremental_neardup
    convention) > low_quality (fails image_caption_quality_filter's
    LAION gates) > keep. Every constituent is a registered
    oracle-checked operator; the oracle composes the phash pair SQL,
    the caption near-dup SQL, and the quality SQL verbatim as CTEs, so
    the keep list cannot drift from its parts.

    Scale shape: strictly the union of its parts (each documented at
    its own registration — banded phash pairs, hash-to-min components,
    one max(struct) survivor agg, caption-keyed group min, bottom-1-
    blocked caption pairs, columnar quality gates) plus image_id-keyed
    joins to assemble the verdict — hash-partitioned throughout, the
    only per-group work bounded by the largest dup cluster. Ignores
    sf_dir (fixture universe, same data as oracle)."""
    meta = spark.read.parquet(_IMAGES_META).select("image_id", "phash", "w", "h")
    pairs = (
        phash_band_pairs(meta.select("image_id", "phash"), PHASH_THRESH)
        .select(F.col("a_id").alias("u"), F.col("b_id").alias("v"))
        .localCheckpoint()
    )
    labels = _connected_components(
        meta.select(F.col("image_id").alias("node")), pairs
    ).localCheckpoint()
    m = _image_idnum(meta)
    canon = _image_canonical(labels, m).select(
        "component_id",
        F.substring("canonical_id", 4, 10).cast("long").alias("canon_idnum"),
    )
    img = (
        labels.join(canon, labels["comp"] == canon["component_id"])
        .join(m, "node")
        .select(
            F.col("node").alias("image_id"),
            "idnum",
            "canon_idnum",
        )
    )
    cap = spark.read.parquet(_IMAGES_META).select(
        F.col("image_id"), _cap_norm().alias("cap")
    )
    capmin = (
        cap.join(m.withColumnRenamed("node", "image_id"), "image_id")
        .groupBy("cap")
        .agg(F.min("idnum").alias("cap_min"))
    )
    capj = cap.join(
        m.withColumnRenamed("node", "image_id").select("image_id", "idnum"),
        "image_id",
    ).join(capmin, "cap")
    ndrop = (
        caption_token_neardup(spark, sf_dir)
        .select(F.col("b_id").alias("image_id"))
        .distinct()
        .withColumn("nd_hit", F.lit(True))
    )
    q = image_caption_quality_filter(spark, sf_dir).select(
        "image_id", F.col("keep").alias("q_keep")
    )
    reason = (
        F.when(F.col("idnum") != F.col("canon_idnum"), F.lit("image_dup"))
        .when(F.col("idnum") != F.col("cap_min"), F.lit("caption_dup"))
        .when(F.col("nd_hit"), F.lit("caption_neardup"))
        .when(~F.col("q_keep"), F.lit("low_quality"))
        .otherwise(F.lit("keep"))
    )
    return (
        img.join(capj.select("image_id", "cap_min"), "image_id")
        .join(ndrop, "image_id", "left")
        .join(q, "image_id")
        .select("image_id", reason.alias("reason"))
        .withColumn("keep", F.col("reason") == "keep")
    )


# ===========================================================================
# I. Round-3: event-time as-of join, deterministic sampling, corpus
#    mixing, BM25 retrieval, cross-modal stats — the remaining pieces a
#    training-data pipeline needs between raw crawl output and a
#    training mix.
# ===========================================================================
@register(
    "events_asof_join",
    """
    WITH ev AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS us
      FROM events WHERE event_type IN ('click', 'purchase')),
    w AS (
      SELECT *,
        last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
          OVER (PARTITION BY user_id
                ORDER BY us, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS matched_event_id,
        last_value(CASE WHEN event_type = 'click' THEN us END IGNORE NULLS)
          OVER (PARTITION BY user_id
                ORDER BY us, CASE WHEN event_type = 'click' THEN 0 ELSE 1 END, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m_us
      FROM ev)
    SELECT event_id, user_id, us AS probe_us,
           matched_event_id, us - m_us AS gap_us
    FROM w WHERE event_type = 'purchase'
    """,
)
def events_asof_join(spark, sf_dir):
    """AS-OF join (event-time nearest-predecessor): for every purchase,
    the latest click by the same user at or before it, with the exact
    microsecond gap. Spark has no ASOF JOIN operator; the scalable
    re-expression is the union-and-carry-forward trick — tag both
    streams, sort once per user, and carry the last build-side row
    forward with last(ignorenulls) over an UNBOUNDED PRECEDING frame.

    Scale shape: ONE shuffle keyed on user_id (the window partition);
    no range join, no per-probe scan, no join explosion on hot users —
    cost is sort-within-partition, linear in events per user. Equal
    timestamps break build-before-probe then event_id, mirrored in the
    oracle. Epoch MICROSECONDS (unix_micros / epoch_us) keep every
    value an exact int64 cross-engine — no float rounding anywhere."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            # ts is TIMESTAMP_NTZ in the parquet; session TZ is pinned
            # UTC (session.py) so the cast is epoch-exact, matching
            # DuckDB's epoch_us over the same naive timestamps
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
    )
    is_click = F.col("event_type") == "click"
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", F.when(is_click, 0).otherwise(1), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.select(
        "*",
        F.last(F.when(is_click, F.struct("us", "event_id")), ignorenulls=True)
        .over(w)
        .alias("m"),
    )
    return carried.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("us").alias("probe_us"),
        F.col("m.event_id").alias("matched_event_id"),
        (F.col("us") - F.col("m.us")).alias("gap_us"),
    )


# Per-language sampling rates in permille — en is downsampled (it
# dominates web corpora), the rest kept at half. Deterministic hash-mod
# sampling (not df.sample): reproducible across cluster sizes, restarts,
# and engines, and a row's fate is a pure function of its key.
STRATA_PERMILLE = {"en": 100, "de": 500, "fr": 500, "es": 500, "zh": 500}


@register(
    "stratified_sample",
    f"""
    WITH h AS (
      SELECT doc_id, lang,
             {_MD5_INT_SQL.format(c="doc_id::VARCHAR")} % 1000 AS bucket
      FROM documents)
    SELECT doc_id, lang, bucket FROM h
    WHERE bucket < CASE lang WHEN 'en' THEN 100 ELSE 500 END
    """,
)
def stratified_sample(spark, sf_dir):
    """Stratified DETERMINISTIC sampling for corpus balancing: keep a
    per-language fraction of documents chosen by md5(doc_id) mod 1000 —
    the hash-mod discipline every reproducible data pipeline uses
    instead of rand()/df.sample (same rows survive on any cluster size,
    any retry, any engine; the decision is auditable per row).

    Scale shape: zero shuffles — scan -> hash -> filter, whole-stage
    codegen'd; the rate lookup is a CASE expression, not a join. At
    100 TB this is the first stage of mix construction and must cost
    one pass; it does."""
    rate = F.when(F.col("lang") == "en", F.lit(STRATA_PERMILLE["en"])).otherwise(
        F.lit(500)
    )
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (_md5_int(F.col("doc_id").cast("string")) % 1000).alias("bucket"),
    )
    return d.filter(F.col("bucket") < rate)


MIX_ALPHA_SQRT = True  # temperature tau=2 <=> sqrt weighting
MIX_TARGET = 100_000


@register(
    "corpus_mix_temperature",
    f"""
    WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    w AS (SELECT lang, n_docs, sqrt(n_docs::DOUBLE) AS wt,
                 sum(sqrt(n_docs::DOUBLE)) OVER () AS wsum
          FROM c)
    SELECT lang, n_docs,
           round(wt / wsum, 6) AS weight,
           floor({MIX_TARGET} * wt / wsum)::BIGINT AS quota
    FROM w
    """,
)
def corpus_mix_temperature(spark, sf_dir):
    """Temperature-weighted corpus mixing quotas (tau=2, i.e. sqrt
    weighting — the multilingual-sampling scheme of mT5/XLM-R): upweight
    low-resource languages relative to their raw counts, emit the
    per-language sampling quota for a {MIX_TARGET}-doc training mix.

    Scale shape: one map-side-combinable count per language, then a
    GLOBAL window — safe because it runs over the AGGREGATED table
    (cardinality = number of languages, bounded and tiny), never the
    raw corpus. floor() (not round) for the quota so the cross-engine
    value is exact at every boundary."""
    c = _t(spark, sf_dir, "documents").groupBy("lang").agg(
        F.count("*").alias("n_docs")
    )
    wsum = F.sum(F.sqrt(F.col("n_docs").cast("double"))).over(
        Window.partitionBy()
    )
    return c.select(
        "lang",
        "n_docs",
        F.round(F.sqrt(F.col("n_docs").cast("double")) / wsum, 6).alias("weight"),
        F.floor(MIX_TARGET * F.sqrt(F.col("n_docs").cast("double")) / wsum)
        .cast("long")
        .alias("quota"),
    )


BM25_QUERY = ("join", "vector", "scan")
BM25_K1, BM25_B, BM25_TOPK = 1.2, 0.75, 20


@register(
    "bm25_topk",
    f"""
    WITH d AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
               FROM documents),
    dd AS (SELECT doc_id, len(toks) AS dl, toks FROM d),
    g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dd),
    e AS (SELECT doc_id, dl, unnest(toks) AS tok FROM dd),
    tf AS (SELECT doc_id, dl, tok, count(*) AS tf FROM e
           WHERE tok IN ('join', 'vector', 'scan') GROUP BY 1, 2, 3),
    dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
    s AS (SELECT tf.doc_id,
                 ln(1 + (g.n_docs - dfq.df + 0.5) / (dfq.df + 0.5))
                 * tf.tf * ({BM25_K1} + 1)
                 / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * tf.dl / g.avgdl))
                 AS term
          FROM tf JOIN dfq USING (tok) CROSS JOIN g)
    SELECT doc_id, round(sum(term), 4) AS bm25
    FROM s GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOPK}
    """,
)
def bm25_topk(spark, sf_dir):
    """BM25 text retrieval over the documents table for a fixed token
    query — the lexical-search baseline every corpus pipeline keeps
    beside its embedding ANN (ann_cosine_topk's sparse twin).

    Scale shape: tokenize -> explode -> filter to query terms FIRST
    (the explode's output is pruned to |query| terms per doc before any
    shuffle), tf via hash agg, df from the tf table (tiny, broadcast),
    global (N, avgdl) as a broadcast single-row cross join, final top-k
    is TakeOrderedAndProject on the ROUNDED score + doc_id (both
    engines order identically, so the cutoff set is deterministic
    cross-engine). No global sort of the corpus anywhere."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), r"\s+").alias("toks")
    )
    dd = d.select("doc_id", F.size("toks").alias("dl"), "toks")
    g = dd.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    e = dd.select("doc_id", "dl", F.explode("toks").alias("tok")).filter(
        F.col("tok").isin(*BM25_QUERY)
    )
    # materialize tf: it feeds BOTH the df() aggregate and the scoring
    # join, and without it each branch re-scans and re-explodes the
    # corpus (no ReusedExchange across the branches — distinct attr
    # ids). tf is tiny by construction: <= n_docs * |query| rows.
    tf = (
        e.groupBy("doc_id", "dl", "tok")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint()
    )
    dfq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    term = (
        idf
        * F.col("tf")
        * (BM25_K1 + 1)
        / (
            F.col("tf")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        tf.join(F.broadcast(dfq), "tok")
        .crossJoin(F.broadcast(g))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term), 4).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), "doc_id").limit(BM25_TOPK)


@register(
    "caption_pixels_corr",
    f"""
    SELECT fmt, count(*) AS n,
           round(corr(len(string_split({_CAPNORM}, ' '))::DOUBLE,
                      (w * h)::DOUBLE), 4) AS tok_px_corr,
           round(avg(w * h), 2) AS avg_pixels
    FROM read_parquet('{_IMAGES_META}')
    GROUP BY fmt
    """,
)
def caption_pixels_corr(spark, sf_dir):
    """Cross-modal corpus diagnostics: per-format Pearson correlation
    between caption length (tokens) and image resolution (pixels), plus
    mean resolution — the sanity panel a curation run prints before
    gating (a strong negative correlation flags thumbnail farms with
    boilerplate captions). Single map-side-combinable aggregate over
    the image+caption table; corr/avg/count all fold per-partition.
    Ignores sf_dir (fixture universe, same data as oracle)."""
    m = spark.read.parquet(_IMAGES_META)
    n_tokens = F.size(F.split(_cap_norm(), " ")).cast("double")
    pixels = (F.col("w") * F.col("h")).cast("double")
    return m.groupBy("fmt").agg(
        F.count("*").alias("n"),
        F.round(F.corr(n_tokens, pixels), 4).alias("tok_px_corr"),
        F.round(F.avg(F.col("w") * F.col("h")), 2).alias("avg_pixels"),
    )


_IMAGES_TILES_META = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "images_tiles_meta.parquet",
)


@register(
    "image_tile_stats",
    f"""
    SELECT image_id, tile_id, t_w, t_h, t_mean, t_std
    FROM read_parquet('{_IMAGES_TILES_META}')
    """,
)
def image_tile_stats(spark, sf_dir):
    """Vision-training tiling: decode each image and emit per-quadrant
    (2x2 grid) dimensions and pixel stats — the patch-extraction shape
    (decode -> grid -> per-tile features) of a ViT-style preprocessing
    pipeline, with the deterministic stand-in codec behind the same
    mapInPandas signature PIL would use (codec.py).

    Scale shape: bytes are decoded and DROPPED inside one mapInPandas
    pass; only (image_id, tile_id, dims, stats) rows — never pixels —
    exit the stage, so nothing heavy ever shuffles. Tiles split
    floor/ceil so dimensions reassemble exactly (pytest invariant:
    tile areas sum to w*h, and the area-weighted tile means reassemble
    the full-image mean)."""
    import pandas as pd

    from . import codec

    imgs = _images_df(spark, 64)

    def tiles(it):
        for pdf in it:
            rows = []
            for iid, data in zip(pdf["image_id"], pdf["bytes"]):
                arr, _ = codec.decode_image(bytes(data))
                h, w = arr.shape[0], arr.shape[1]
                hs, ws = [(0, h // 2), (h // 2, h)], [(0, w // 2), (w // 2, w)]
                for ti, (y0, y1) in enumerate(hs):
                    for tj, (x0, x1) in enumerate(ws):
                        t = arr[y0:y1, x0:x1]
                        rows.append(
                            (
                                iid,
                                ti * 2 + tj,
                                x1 - x0,
                                y1 - y0,
                                round(float(t.mean()), 4),
                                round(float(t.std()), 4),
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "tile_id", "t_w", "t_h", "t_mean", "t_std"],
            )

    return imgs.mapInPandas(
        tiles,
        schema="image_id string, tile_id int, t_w int, t_h int, "
        "t_mean double, t_std double",
    )


PACK_BUDGET = 512  # tokens per packed training sequence


def _per_lang_cumsum_before(d: DataFrame, n_parts: int = 32) -> DataFrame:
    """Exclusive per-language running token sum ordered by doc_id,
    WITHOUT a per-language single-partition window (a whole language in
    one task is exactly the skew the engine's salted windows exist to
    avoid). Same two-phase discipline as frontier.global_fifo_rank:

    phase 1 — range-repartition by (lang, doc_id) + sort within
    partitions (Spark's parallel total sort), so each task holds a
    contiguous (lang, doc_id) slice;
    phase 2 — per-(partition, lang) subtotal census (n_parts x n_langs
    rows — the one documented driver .collect(), same exception as
    frontier.py:67) becomes a broadcast prefix-offset map, and the
    within-partition window (partitionBy(_pid, lang) — bounded by the
    slice, never the language) adds the local running sum.

    Returns d + [cum_before] where cum_before = sum of n_tok over all
    earlier doc_ids of the same lang (exclusive)."""
    ranged = d.repartitionByRange(n_parts, "lang", "doc_id").sortWithinPartitions(
        "lang", "doc_id"
    )
    # materialize: repartitionByRange samples to pick boundaries; the
    # census job and the cumsum job must see the SAME partitioning
    with_pid = ranged.withColumn("_pid", F.spark_partition_id()).localCheckpoint()
    census = (
        with_pid.groupBy("_pid", "lang").agg(F.sum("n_tok").alias("subtotal")).collect()
    )
    offsets: dict[tuple[int, str], int] = {}
    acc: dict[str, int] = {}
    for r in sorted(census, key=lambda r: (r["lang"], r["_pid"])):
        offsets[(r["_pid"], r["lang"])] = acc.get(r["lang"], 0)
        acc[r["lang"]] = acc.get(r["lang"], 0) + r["subtotal"]
    if not offsets:
        return d.withColumn("cum_before", F.lit(0).cast("long"))
    off_col = F.coalesce(
        F.element_at(
            F.create_map(
                *[
                    x
                    for (pid, lang), off in sorted(offsets.items())
                    for x in (
                        F.concat_ws("|", F.lit(str(pid)), F.lit(lang)),
                        F.lit(off),
                    )
                ]
            ),
            F.concat_ws("|", F.col("_pid").cast("string"), F.col("lang")),
        ),
        F.lit(0),
    )
    w = (
        Window.partitionBy("_pid", "lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    return with_pid.withColumn(
        "cum_before", (off_col + local).cast("long")
    ).drop("_pid")


@register(
    "doc_pack_sequences",
    f"""
    WITH d AS (SELECT doc_id, lang,
                      len(string_split_regex(lower(text), '\\s+'))::BIGINT AS n_tok
               FROM documents),
    c AS (SELECT *,
            coalesce(sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM d)
    SELECT doc_id, lang, n_tok,
           (cum_before // {PACK_BUDGET})::BIGINT AS seq_id,
           (cum_before % {PACK_BUDGET})::BIGINT AS offset_in_seq
    FROM c
    """,
)
def doc_pack_sequences(spark, sf_dir):
    """LLM training-sequence PACKING: assign every document a
    (per-language) packed-sequence id and byte... token offset under a
    fixed {PACK_BUDGET}-token budget — contiguous packing in (lang,
    doc_id) order, the deterministic sibling of greedy first-fit that
    training-data pipelines use when reproducibility beats the last few
    percent of fill (same doc -> same sequence on every cluster size).

    Scale shape: the per-language running sum is the two-phase
    range-sort + census-offset pattern (_per_lang_cumsum_before) — no
    single-partition window, no language-sized task; the oracle states
    the IDENTICAL semantics as one SQL window since DuckDB runs at
    oracle scale only."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split(F.lower("text"), r"\s+")).cast("long").alias("n_tok"),
    )
    c = _per_lang_cumsum_before(d)
    return c.select(
        "doc_id",
        "lang",
        "n_tok",
        F.expr(f"cum_before div {PACK_BUDGET}").alias("seq_id"),
        F.pmod(F.col("cum_before"), F.lit(PACK_BUDGET)).cast("long").alias(
            "offset_in_seq"
        ),
    )


VOCAB_TOPK = 256


@register(
    "vocab_topk",
    f"""
    WITH t AS (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
               FROM documents),
    c AS (SELECT tok, count(*) AS freq FROM t GROUP BY tok)
    SELECT tok, freq,
           row_number() OVER (ORDER BY freq DESC, tok) AS vocab_id
    FROM c ORDER BY vocab_id LIMIT {VOCAB_TOPK}
    """,
)
def vocab_topk(spark, sf_dir):
    """Tokenizer-vocabulary build: top-{VOCAB_TOPK} tokens by corpus
    frequency with dense ids in (freq DESC, tok) order — the dictionary
    stage of any tokenizer-training pipeline.

    Scale shape: partial+final hash agg on tok (map-side combinable),
    then TakeOrderedAndProject for the top-K — the full vocabulary is
    never globally sorted; the row_number window runs over the
    ALREADY-LIMITED K rows (one partition of {VOCAB_TOPK} rows by
    construction, not a corpus-sized funnel)."""
    c = (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    top = c.orderBy(F.desc("freq"), "tok").limit(VOCAB_TOPK)
    w = Window.orderBy(F.desc("freq"), "tok")
    return top.withColumn("vocab_id", F.row_number().over(w).cast("long"))


@register(
    "event_value_quantiles",
    """
    SELECT event_type, count(*) AS n,
           round(quantile_cont(value, 0.5), 4)  AS p50,
           round(quantile_cont(value, 0.9), 4)  AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
    """,
)
def event_value_quantiles(spark, sf_dir):
    """Exact interpolated quantiles per event type (the latency/size
    percentile panel of any pipeline dashboard). Spark's `percentile`
    and DuckDB's `quantile_cont` share the standard rank = p*(n-1)
    linear-interpolation definition, so the twin is exact. At 100 TB
    swap `percentile` for `approx_percentile` (t-digest; single-pass,
    mergeable) — kept exact here because the oracle must hash-match."""
    e = _t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.percentile("value", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 4).alias("p99"),
    )


@register("approx_distinct_diag")  # rows-only: HLL sketch has no DuckDB twin
def approx_distinct_diag(spark, sf_dir):
    """Sketch-based cardinality diagnostics: per event_type, HLL
    approx_count_distinct(user_id) beside the exact count and the
    relative error (rsd=0.02). At 100 TB the exact distinct is a full
    shuffle of every distinct key; the HLL sketch is single-pass,
    map-side mergeable, and constant-size per group — the only
    distinct-count a petabyte dashboard can afford. Rows-only by
    necessity (DuckDB's approx_count_distinct is a different sketch
    with different estimates); the error bound is pinned by
    tests/test_round3_ops.py::test_approx_distinct_error_bound."""
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .select(
            "event_type",
            "approx_users",
            "exact_users",
            F.round(
                F.abs(F.col("approx_users") - F.col("exact_users"))
                / F.col("exact_users"),
                4,
            ).alias("rel_err"),
        )
    )


# ===========================================================================
# K. Round-3 additions II — image training-batch prep (aspect bucketing,
#    shard packing) and corpus-statistics quality/retrieval scoring
# ===========================================================================
# SDXL-style aspect buckets as (w, h) ratio pairs; assignment is argmin
# |ln(w/h) - ln(bw/bh)| with ties to the FIRST bucket. The ln-ratio
# constants are formatted into BOTH engines from the same Python float
# (repr round-trips the exact double), so the argmin compares identical
# doubles cross-engine; every fixture ratio wins its bucket by a margin
# >= 0.11 nats, far above any 1-ulp libm divergence in ln(w/h).
ASPECT_BUCKETS = [(1, 1), (4, 3), (3, 4), (3, 2), (2, 3), (2, 1), (16, 9), (4, 1)]
_BUCKET_LNS = [__import__("math").log(bw / bh) for bw, bh in ASPECT_BUCKETS]
BATCH_SIZE = 8


@register(
    "aspect_bucket_batches",
    f"""
    WITH m AS (SELECT *,
        list_position(l, list_min(l)) AS bidx
      FROM (SELECT w, h,
              [{', '.join(f'abs(ln(w::DOUBLE / h::DOUBLE) - ({c!r}))' for c in _BUCKET_LNS)}] AS l
            FROM read_parquet('{_IMAGES_META}')))
    SELECT ([{', '.join(f"'{bw}:{bh}'" for bw, bh in ASPECT_BUCKETS)}])[bidx] AS bucket,
           count(*) AS n_images,
           ((count(*) + {BATCH_SIZE} - 1) // {BATCH_SIZE})::BIGINT AS n_batches,
           round(avg(w * h), 2) AS avg_pixels
    FROM m GROUP BY bidx
    """,
)
def aspect_bucket_batches(spark, sf_dir):
    """Aspect-ratio bucketing for vision training (the SDXL batching
    scheme): every image joins the bucket whose aspect ratio is nearest
    in log space, and batches are drawn within a bucket so no batch
    mixes shapes — emit per-bucket image counts, full-batch count at
    batch_size={BATCH_SIZE}, and mean resolution.

    Scale shape: bucket assignment is a pure per-row projection (an
    8-element literal array argmin, whole-stage codegen, zero UDF), then
    one map-side-combinable aggregate keyed on the bucket index — the
    bucket key has FIXED tiny cardinality by design, which is safe
    here precisely because it feeds an aggregate (partial combine
    collapses each partition to <= 8 rows before the exchange), never a
    pair join (contrast fuzzy_ratio_topk's blocking lesson).
    Ignores sf_dir (fixture universe, same data as oracle)."""
    m = spark.read.parquet(_IMAGES_META)
    lw = F.log(F.col("w").cast("double") / F.col("h").cast("double"))
    diffs = F.array(*[F.abs(lw - F.lit(c)) for c in _BUCKET_LNS])
    names = F.array(*[F.lit(f"{bw}:{bh}") for bw, bh in ASPECT_BUCKETS])
    return (
        m.select(
            F.element_at(names, F.array_position(diffs, F.array_min(diffs)).cast("int"))
            .alias("bucket"),
            "w",
            "h",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_images"),
            F.ceil(F.count("*") / BATCH_SIZE).cast("long").alias("n_batches"),
            F.round(F.avg(F.col("w") * F.col("h")), 2).alias("avg_pixels"),
        )
    )


SHARD_BUDGET = 262_144  # decoded bytes (w*h*3) per WebDataset-style shard


@register(
    "image_shard_pack",
    f"""
    WITH d AS (SELECT image_id, fmt, (w * h * 3)::BIGINT AS est_bytes
               FROM read_parquet('{_IMAGES_META}')),
    c AS (SELECT *,
            coalesce(sum(est_bytes) OVER (PARTITION BY fmt ORDER BY image_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM d)
    SELECT fmt, (cum_before // {SHARD_BUDGET})::BIGINT AS shard_id,
           count(*) AS n_images,
           sum(est_bytes)::BIGINT AS shard_bytes,
           min(image_id) AS first_id, max(image_id) AS last_id
    FROM c GROUP BY fmt, cum_before // {SHARD_BUDGET}
    """,
)
def image_shard_pack(spark, sf_dir):
    """WebDataset-style shard manifest for the image+caption table:
    images pack contiguously in (fmt, image_id) order under a
    {SHARD_BUDGET}-decoded-byte budget (est = w*h*3), one output row
    per shard with its size and id range — the manifest a distributed
    tar-shard writer needs to cut training shards deterministically
    (same image -> same shard at any cluster size).

    Scale shape: the per-format running sum reuses the two-phase
    range-sort + census-offset machinery (_per_lang_cumsum_before) —
    no single-partition window over the corpus; the oracle states the
    identical semantics as one SQL window at oracle scale. The final
    manifest agg is map-side combinable on (fmt, shard_id), and at
    write time shard_id doubles as the repartition key so each task
    streams exactly one tar. Ignores sf_dir (fixture universe)."""
    m = spark.read.parquet(_IMAGES_META).select(
        F.col("fmt").alias("lang"),
        F.col("image_id").alias("doc_id"),
        (F.col("w") * F.col("h") * 3).cast("long").alias("n_tok"),
    )
    c = _per_lang_cumsum_before(m)
    return (
        c.select(
            F.col("lang").alias("fmt"),
            F.col("doc_id").alias("image_id"),
            F.col("n_tok").alias("est_bytes"),
            F.expr(f"cum_before div {SHARD_BUDGET}").alias("shard_id"),
        )
        .groupBy("fmt", "shard_id")
        .agg(
            F.count("*").alias("n_images"),
            F.sum("est_bytes").alias("shard_bytes"),
            F.min("image_id").alias("first_id"),
            F.max("image_id").alias("last_id"),
        )
    )


UNIGRAM_OUTLIER = -8.0  # mean ln p(tok) below this flags a doc as gibberish


@register(
    "unigram_logprob_quality",
    f"""
    WITH e AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
               FROM documents),
    fr AS (SELECT tok, count(*) AS freq FROM e GROUP BY tok),
    tot AS (SELECT sum(freq)::DOUBLE AS n_total FROM fr)
    SELECT e.doc_id, count(*) AS n_tok,
           round(avg(ln(fr.freq / tot.n_total)), 4) AS avg_logprob,
           (avg(ln(fr.freq / tot.n_total)) < {UNIGRAM_OUTLIER}) AS is_outlier
    FROM e JOIN fr USING (tok) CROSS JOIN tot
    GROUP BY e.doc_id
    """,
)
def unigram_logprob_quality(spark, sf_dir):
    """Corpus-statistics quality score: a unigram LM fit on the corpus
    itself (token freq / total tokens) scores every document by mean
    token log-probability; docs far below the corpus norm are flagged
    as gibberish/outliers — the classic cheap perplexity proxy that
    runs before any neural quality filter in a training-data pipeline.

    Scale shape: the corpus is exploded ONCE into a materialized
    (doc_id, tok, tf) table; corpus frequency, the grand total, and the
    per-doc score all derive from it (freq = sum(tf) grouped by tok;
    per-instance mean = sum(tf*ln p)/sum(tf)), so the raw text is
    scanned a single time. The tf <-> freq join is keyed on tok and
    deliberately NOT broadcast: the vocabulary grows with the corpus
    (Heap's law), so at 100 TB the freq table is shuffle-joined (AQE
    still broadcasts it while it fits). The single-row total rides a
    broadcast cross join like bm25_topk's (N, avgdl)."""
    e = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    )
    # materialized once: feeds freq, the total, and the scoring join
    # (without it each consumer re-scans + re-explodes the corpus)
    tf = e.groupBy("doc_id", "tok").agg(F.count("*").alias("tf")).localCheckpoint()
    fr = tf.groupBy("tok").agg(F.sum("tf").alias("freq"))
    tot = fr.agg(F.sum("freq").cast("double").alias("n_total"))
    lp = F.log(F.col("freq") / F.col("n_total"))
    mean_lp = F.sum(F.col("tf") * lp) / F.sum("tf")
    return (
        tf.join(fr, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tok"),
            F.round(mean_lp, 4).alias("avg_logprob"),
            (mean_lp < UNIGRAM_OUTLIER).alias("is_outlier"),
        )
    )


TFIDF_TOPK = 3


@register(
    "tfidf_topk_terms",
    f"""
    WITH e AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
               FROM documents),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM e GROUP BY 1, 2),
    dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
    s AS (SELECT tf.doc_id, tf.tok, tf.tf, dfq.df,
                 tf.tf * (ln((n.n_docs + 1) / (dfq.df + 1)) + 1) AS score
          FROM tf JOIN dfq USING (tok) CROSS JOIN n)
    SELECT doc_id, tok, tf, df, round(score, 4) AS tfidf, rnk FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, tok) AS rnk
      FROM s) WHERE rnk <= {TFIDF_TOPK}
    """,
)
def tfidf_topk_terms(spark, sf_dir):
    """Per-document top-{TFIDF_TOPK} terms by smoothed TF-IDF
    (tf * (ln((N+1)/(df+1)) + 1)) — the keyword-extraction /
    sparse-retrieval-indexing stage beside bm25_topk's query-time
    scoring.

    Scale shape: explode -> (doc_id, tok) hash agg for tf; df is a
    second agg OVER THE TF TABLE (never re-scans the corpus) and
    shuffle-joins back on tok (vocab grows with the corpus — same
    no-broadcast reasoning as unigram_logprob_quality); N rides a
    single-row broadcast. The rank window partitions by doc_id, so
    the heaviest task is one document's vocabulary — no corpus-sized
    funnel. Scores are identical doubles cross-engine up to libm ulp;
    equal-score ties break on tok in both window specs."""
    d = _t(spark, sf_dir, "documents")
    e = d.select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
    # materialize tf: it feeds BOTH the df() aggregate and the scoring
    # join, and the partial-agg push-down makes the two exchange
    # subtrees differ, so ReusedExchange never fires and each branch
    # would re-scan + re-explode the corpus (same fix as bm25_topk).
    # tf here is corpus-sized (distinct (doc, tok) pairs), so at 100 TB
    # the checkpoint becomes a persisted table write bucketed by tok —
    # store-once-read-twice beats two explode passes either way.
    tf = e.groupBy("doc_id", "tok").agg(F.count("*").alias("tf")).localCheckpoint()
    dfq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    score = F.col("tf") * (
        F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "tok")
    return (
        tf.join(dfq, "tok")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "tok", "tf", "df", score.alias("score"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TFIDF_TOPK)
        .select("doc_id", "tok", "tf", "df", F.round("score", 4).alias("tfidf"), "rnk")
    )


# ===========================================================================
# F. Round-3b: crawl-scale scheduling & curation ops
#    (trap detection, mirror hosts, budget allocation, DSIR, SemDedup)
# ===========================================================================
TRAP_MIN_URLS = 25  # a template needs this many distinct URLs ...
TRAP_RATIO = 0.9  # ... and ~every hit a fresh URL to be called a trap


@register(
    "url_trap_detect",
    f"""
    WITH u AS (
      SELECT 'h' || (o_custkey % 40)::VARCHAR AS host,
             CASE WHEN (o_custkey % 40) < 4
                  THEN '/cal/' || o_orderkey::VARCHAR || '/day'
                  ELSE '/page/' || (o_orderkey % 20)::VARCHAR END AS path
      FROM orders),
    t AS (SELECT host, regexp_replace(path, '[0-9]+', 'N', 'g') AS template,
                 path FROM u)
    SELECT host, template, count(DISTINCT path) AS n_urls, count(*) AS n_hits,
           (count(DISTINCT path) > {TRAP_MIN_URLS}
            AND count(DISTINCT path)::DOUBLE / count(*) > {TRAP_RATIO}) AS is_trap
    FROM t GROUP BY host, template
    """,
)
def url_trap_detect(spark, sf_dir):
    """Crawler-trap detection: collapse every URL path to a template
    (digit runs -> N) and flag (host, template) groups where nearly every
    hit mints a fresh URL — the calendar/session-id/faceted-search traps
    that drown a frontier in infinite URL spaces. The reference has no
    defense (its two sites are finite, Readme.md:4-7); a general frontier
    must demote trap templates before they starve real pages (the
    expansion gate P10 / similar_companies.py:29-33 is where the flag
    plugs in). Both engines synthesize the identical URL column off
    `orders` (trap hosts mint one URL per order; healthy hosts cycle 20
    stable pages).

    Scale shape: one regexp projection (codegen) + one hash agg keyed
    (host, template) with partial count-distinct — map-side combinable,
    no joins, no windows. At 10^10 URLs the agg output is
    host x template sized (tiny); the flag joins back onto the frontier
    broadcast. Distinct-count exactness matters only per template, where
    cardinality is the thing being measured."""
    o = _t(spark, sf_dir, "orders")
    host = F.concat(F.lit("h"), (F.col("o_custkey") % 40).cast("string"))
    path = F.when(
        (F.col("o_custkey") % 40) < 4,
        F.concat(F.lit("/cal/"), F.col("o_orderkey").cast("string"), F.lit("/day")),
    ).otherwise(F.concat(F.lit("/page/"), (F.col("o_orderkey") % 20).cast("string")))
    t = o.select(
        host.alias("host"),
        path.alias("path"),
    ).withColumn("template", F.regexp_replace("path", "[0-9]+", "N"))
    return (
        t.groupBy("host", "template")
        .agg(
            F.countDistinct("path").alias("n_urls"),
            F.count("*").alias("n_hits"),
        )
        .withColumn(
            "is_trap",
            (F.col("n_urls") > TRAP_MIN_URLS)
            & (F.col("n_urls").cast("double") / F.col("n_hits") > TRAP_RATIO),
        )
    )


MIRROR_FP_MAX_HOSTS = 20  # shingles on more hosts are boilerplate, not mirrors
MIRROR_MIN_JAC = 0.2


@register(
    "mirror_host_detect",
    f"""
    WITH d0 AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
                FROM documents),
    d AS (SELECT 'h' || (doc_id % 30)::VARCHAR AS host, toks FROM d0
          UNION ALL
          SELECT 'h' || (doc_id % 30)::VARCHAR || 'm' AS host, toks FROM d0
          WHERE (doc_id % 30) < 5 AND (doc_id // 30) % 2 = 0),
    sh AS (SELECT DISTINCT host, sh FROM (
             SELECT host, unnest(list_transform(generate_series(1, len(toks)-2),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
             FROM d)),
    rare AS (SELECT sh FROM sh GROUP BY sh
             HAVING count(*) <= {MIRROR_FP_MAX_HOSTS}),
    rs AS (SELECT host, sh.sh FROM sh JOIN rare USING (sh)),
    tot AS (SELECT host, count(*) AS n FROM rs GROUP BY host),
    pairs AS (SELECT a.host AS host_a, b.host AS host_b, count(*) AS n_shared
              FROM rs a JOIN rs b ON a.sh = b.sh AND a.host < b.host
              GROUP BY 1, 2)
    SELECT host_a, host_b, n_shared, ta.n AS n_a, tb.n AS n_b,
           round(n_shared::DOUBLE / (ta.n + tb.n - n_shared), 4) AS jac
    FROM pairs JOIN tot ta ON ta.host = host_a JOIN tot tb ON tb.host = host_b
    WHERE n_shared::DOUBLE / (ta.n + tb.n - n_shared) >= {MIRROR_MIN_JAC}
    """,
)
def mirror_host_detect(spark, sf_dir):
    """Mirror-host detection: hosts whose (rare-)content-shingle sets
    overlap heavily are mirrors of each other; a frontier should crawl
    one and demote the rest. Content evidence = distinct 3-token
    shingles per host; shingles present on more than
    {MIRROR_FP_MAX_HOSTS} hosts are dropped first (ubiquitous
    boilerplate is not mirror evidence — and that cap is also what
    bounds the join). Pair score = Jaccard over each pair's rare-shingle
    sets, reported at >= {MIRROR_MIN_JAC}. Reference analog: cross-source
    discovery dedupes by domain before re-crawling the same company
    elsewhere (discovery.py:80-86); this generalizes it to whole-host
    content identity. Both engines synthesize the identical host
    universe off `documents`: 30 base hosts by doc_id, plus planted
    partial mirrors ('h<k>m' re-serves half of h<k>'s docs for k<5) —
    true mirrors score ~0.5 against their base host while unrelated
    host pairs sit <= ~0.14 on this corpus, so the {MIRROR_MIN_JAC}
    cut separates them cleanly.

    Scale shape: explode -> distinct (host, shingle) hash agg; the
    frequency cap makes the self-join on shingle emit at most
    C({MIRROR_FP_MAX_HOSTS},2) pairs per shingle — candidate volume is
    O(shingles x cap^2), never O(hosts^2) — and the pair agg is
    map-side combinable. Same bounded-block discipline as the banded
    LSH ops; the cap is part of the operator definition (oracle
    mirrors it)."""
    d0 = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), r"\s+").alias("toks")
    )
    base_host = F.concat(F.lit("h"), (F.col("doc_id") % 30).cast("string"))
    d = d0.select(base_host.alias("host"), "toks").unionAll(
        d0.filter(
            ((F.col("doc_id") % 30) < 5) & (F.expr("(doc_id div 30) % 2") == 0)
        ).select(
            F.concat(base_host, F.lit("m")).alias("host"), "toks"
        )
    )
    sh3 = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at("toks", i + 1),
            F.element_at("toks", i + 2),
            F.element_at("toks", i + 3),
        ),
    )
    rs = (
        d.select("host", F.explode(sh3).alias("sh"))
        .distinct()
        .withColumn("n_hosts", F.count("*").over(Window.partitionBy("sh")))
        .filter(F.col("n_hosts") <= MIRROR_FP_MAX_HOSTS)
        .drop("n_hosts")
    )
    tot = rs.groupBy("host").agg(F.count("*").alias("n"))
    b = rs.select(F.col("host").alias("host_b"), "sh")
    pairs = (
        rs.join(b, "sh")
        .filter(F.col("host") < F.col("host_b"))
        .groupBy(F.col("host").alias("host_a"), "host_b")
        .agg(F.count("*").alias("n_shared"))
    )
    jac = F.col("n_shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_shared")
    )
    return (
        pairs.join(tot.select(F.col("host").alias("host_a"), F.col("n").alias("n_a")), "host_a")
        .join(tot.select(F.col("host").alias("host_b"), F.col("n").alias("n_b")), "host_b")
        .filter(jac >= MIRROR_MIN_JAC)
        .select("host_a", "host_b", "n_shared", "n_a", "n_b", F.round(jac, 4).alias("jac"))
    )


BUDGET_TOTAL = 100_000  # fetch slots per round to split across hosts


@register(
    "crawl_budget_alloc",
    f"""
    WITH s AS (SELECT 'h' || (c_custkey % 50)::VARCHAR AS host,
                      CAST(round(sum(greatest(c_acctbal, 0)) * 100) AS BIGINT)
                        AS score_c
               FROM customer GROUP BY 1),
    t AS (SELECT sum(score_c) AS tot FROM s),
    base AS (SELECT host, score_c,
                    ({BUDGET_TOTAL} * score_c) // t.tot AS floor_alloc,
                    ({BUDGET_TOTAL} * score_c) % t.tot AS rem
             FROM s CROSS JOIN t),
    r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, host) AS rk,
                 {BUDGET_TOTAL} - sum(floor_alloc) OVER () AS leftover
          FROM base)
    SELECT host, score_c,
           (floor_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)::BIGINT
             AS alloc
    FROM r
    """,
)
def crawl_budget_alloc(spark, sf_dir):
    """Per-host crawl-budget allocation: split {BUDGET_TOTAL} fetch
    slots per round across hosts proportionally to a host quality score
    (here sum of positive account balances as the stand-in signal),
    using largest-remainder rounding so the allocations are integers
    that sum EXACTLY to the budget — the knob that turns host_pagerank /
    recrawl_schedule signals into the per-host budgets the politeness
    ranker (frontier.select_fetchable, W3) enforces. All arithmetic is
    integer (scores in cents, floor division, remainder rank), so the
    result is bit-identical across engines and cluster sizes.

    Scale shape: one map-side-combinable agg corpus-side; everything
    after operates on the host-sized table (the global remainder-rank
    window runs over hosts, not URLs — same post-aggregation-window
    reasoning as corpus_mix_temperature). Sum(alloc) == budget is
    pinned in pytest."""
    c = _t(spark, sf_dir, "customer")
    # materialized: the host-sized score table feeds both the grand
    # total and the allocation — without it the totals branch re-scans
    # and re-aggregates the corpus (no ReusedExchange across the two
    # differently-shaped agg subtrees)
    s = (
        c.groupBy(
            F.concat(F.lit("h"), (F.col("c_custkey") % 50).cast("string")).alias(
                "host"
            )
        )
        .agg(
            F.round(F.sum(F.greatest(F.col("c_acctbal"), F.lit(0))) * 100)
            .cast("long")
            .alias("score_c")
        )
        .localCheckpoint()
    )
    t = s.agg(F.sum("score_c").alias("tot"))
    base = s.crossJoin(F.broadcast(t)).select(
        "host",
        "score_c",
        F.expr(f"({BUDGET_TOTAL} * score_c) div tot").alias("floor_alloc"),
        F.expr(f"({BUDGET_TOTAL} * score_c) % tot").alias("rem"),
    )
    w = Window.orderBy(F.desc("rem"), "host")
    wall = Window.partitionBy()
    return (
        base.withColumn("rk", F.row_number().over(w))
        .withColumn("leftover", F.lit(BUDGET_TOTAL) - F.sum("floor_alloc").over(wall))
        .select(
            "host",
            "score_c",
            (
                F.col("floor_alloc")
                + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
            ).alias("alloc"),
        )
    )


DSIR_TOPK = 100
DSIR_TARGET_LANG = "en"


@register(
    "dsir_select",
    f"""
    WITH e AS (SELECT doc_id, lang,
                      unnest(string_split_regex(lower(text), '\\s+')) AS tok
               FROM documents),
    fr AS (SELECT tok, count(*) AS fs,
                  sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END)
                    AS ft
           FROM e GROUP BY tok),
    tot AS (SELECT sum(fs)::DOUBLE AS n_s, sum(ft)::DOUBLE AS n_t,
                   count(*)::DOUBLE AS v FROM fr),
    sc AS (SELECT e.doc_id, count(*) AS n_tok,
                  round(avg(ln((fr.ft + 1) / (tot.n_t + tot.v))
                          - ln((fr.fs + 1) / (tot.n_s + tot.v))), 4) AS score
           FROM e JOIN fr USING (tok) CROSS JOIN tot
           WHERE e.lang <> '{DSIR_TARGET_LANG}'
           GROUP BY e.doc_id),
    top AS (SELECT * FROM sc ORDER BY score DESC, doc_id LIMIT {DSIR_TOPK})
    SELECT doc_id, n_tok, score,
           row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
    FROM top
    """,
)
def dsir_select(spark, sf_dir):
    """DSIR-style data selection (Xie et al. 2023): score every
    candidate document by its mean token log-likelihood RATIO between a
    target unigram LM (docs with lang='{DSIR_TARGET_LANG}') and the
    source LM (whole corpus), Laplace-smoothed over the shared
    vocabulary, and keep the top-{DSIR_TOPK} — the importance-resampling
    step that tilts a raw crawl toward a target domain before training.
    Builds on the same corpus-fit machinery as unigram_logprob_quality
    (absolute fluency) but scores *domain match*, the other axis a
    curation pipeline needs.

    Scale shape: one explode -> one (tok) hash agg producing BOTH
    frequency columns (count + conditional count in a single pass —
    never two corpus scans); totals ride a single-row broadcast; the
    scoring join on tok is a shuffle join (vocab grows with the corpus,
    Heap's law — same no-broadcast reasoning as unigram_logprob_quality);
    per-doc agg is map-side combinable. The top-k is a TakeOrdered on
    the ROUNDED score (4dp, doc_id tie-break — cross-engine
    deterministic, same discipline as bm25_topk); the rank window runs
    over the already-limited {DSIR_TOPK} rows, never the corpus."""
    d = _t(spark, sf_dir, "documents")
    e = d.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    )
    # materialized: feeds both the totals agg and the scoring join
    # (same store-once-read-twice reasoning as tfidf_topk_terms' tf)
    fr = (
        e.groupBy("tok")
        .agg(
            F.count("*").alias("fs"),
            F.sum(
                F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0)
            ).alias("ft"),
        )
        .localCheckpoint()
    )
    tot = fr.agg(
        F.sum("fs").cast("double").alias("n_s"),
        F.sum("ft").cast("double").alias("n_t"),
        F.count("*").cast("double").alias("v"),
    )
    llr = F.log((F.col("ft") + 1) / (F.col("n_t") + F.col("v"))) - F.log(
        (F.col("fs") + 1) / (F.col("n_s") + F.col("v"))
    )
    sc = (
        e.filter(F.col("lang") != DSIR_TARGET_LANG)
        .join(fr, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.round(F.avg(llr), 4).alias("score"),
        )
    )
    top = sc.orderBy(F.desc("score"), "doc_id").limit(DSIR_TOPK)
    w = Window.orderBy(F.desc("score"), "doc_id")
    return top.withColumn("rnk", F.row_number().over(w))


SEMDEDUP_K = 8
SEMDEDUP_TAU = 0.35  # cosine cut; matches this corpus's near-dup regime
_EMB_DIM = 64


def _semdedup_sql() -> str:
    """Unrolled 2-iteration k-means + intra-cluster cosine prune in
    DuckDB, mirroring the Spark plan step for step. Centroids and
    distances round to 6dp in both engines so float summation order
    can't flip an assignment."""
    dims = _EMB_DIM
    k = SEMDEDUP_K

    def assign(cent: str, out: str) -> str:
        return f"""
    d_{out} AS (SELECT e.vec_id, c.k,
                     round(sum((e.val - c.cv) * (e.val - c.cv)), 6) AS d
              FROM e JOIN {cent} c USING (i) GROUP BY e.vec_id, c.k),
    {out} AS (SELECT vec_id, k FROM (
               SELECT vec_id, k,
                      row_number() OVER (PARTITION BY vec_id ORDER BY d, k) AS rn
               FROM d_{out}) WHERE rn = 1)"""

    return f"""
    WITH v AS (SELECT vec_id, {_TO_D.format(c='embedding')} AS v FROM embeddings),
    e AS (SELECT vec_id, i::INT AS i, v[i + 1] AS val
          FROM v, range({dims}) t(i)),
    c0 AS (SELECT (vec_id % {k})::INT AS k, i, round(avg(val), 6) AS cv
           FROM e GROUP BY 1, 2),
    {assign('c0', 'a1')},
    c1 AS (SELECT a1.k, e.i, round(avg(e.val), 6) AS cv
           FROM e JOIN a1 USING (vec_id) GROUP BY 1, 2),
    {assign('c1', 'a2')},
    n AS (SELECT vec_id,
                 list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
          FROM v),
    dup AS (SELECT DISTINCT y.vec_id
            FROM a2 x JOIN a2 y ON x.k = y.k AND x.vec_id < y.vec_id
            JOIN n nx ON nx.vec_id = x.vec_id
            JOIN n ny ON ny.vec_id = y.vec_id
            WHERE round(list_dot_product(nx.nv, ny.nv), 4) >= {SEMDEDUP_TAU})
    SELECT a2.vec_id, a2.k AS cluster,
           (dup.vec_id IS NOT NULL) AS is_dup
    FROM a2 LEFT JOIN dup USING (vec_id)
    """


@register("semdedup_prune", _semdedup_sql())
def semdedup_prune(spark, sf_dir):
    """SemDedup (Abbas et al. 2023): cluster embeddings with k-means
    (K={SEMDEDUP_K}, 2 iterations, deterministic init: centroid k =
    mean of vecs with vec_id % K == k), then within each cluster mark a
    vector as a semantic duplicate if some lower-id cluster-mate has
    cosine >= {SEMDEDUP_TAU} — the keep-first pruning rule. Complements
    the pair-emitting near-dup ops (embedding_neardup_cosine emits
    pairs; this emits the per-row keep/drop decision a curation
    pipeline actually applies).

    Scale shape: each k-means iteration is (a) a posexplode ->
    (k, dim) hash agg for centroids (map-side combinable, output is
    K x dim ~ tiny) and (b) an assignment via BROADCAST of the K
    centroid arrays + a zip_with/aggregate squared-distance fold with
    min(struct(d, k)) argmin — no shuffle of the corpus beyond the agg.
    The intra-cluster pairwise verify is quadratic ONLY within a
    cluster: exactly the SemDedup paper's design, where K scales with
    corpus size to bound cluster width (at 10^10 rows you raise K, not
    the per-cluster work; the banded-LSH ops are the alternative when
    no clustering fits). Centroids and distances round to 6dp in both
    engines so cross-engine float summation order can't flip an
    assignment; the argmin tie-breaks on k via the struct ordering."""
    k = SEMDEDUP_K
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    def centroids(assigned):
        cent = (
            assigned.select("k", F.posexplode("v").alias("i", "val"))
            .groupBy("k", "i")
            .agg(F.round(F.avg("val"), 6).alias("cv"))
        )
        return cent.groupBy("k").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "cv"))),
                lambda s: s["cv"],
            ).alias("c")
        )

    def assign(cent_arr):
        j = emb.crossJoin(
            F.broadcast(cent_arr.select(F.col("k").alias("ck"), "c"))
        )
        dist = F.round(
            F.aggregate(
                F.zip_with("v", "c", lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        )
        return (
            j.select("vec_id", dist.alias("d"), "ck")
            .groupBy("vec_id")
            .agg(F.min(F.struct("d", "ck")).alias("m"))
            .select("vec_id", F.col("m.ck").alias("k"))
        )

    a = emb.withColumn("k", (F.col("vec_id") % k).cast("int"))
    for _ in range(2):
        a = assign(centroids(a)).join(emb, "vec_id")
    a = a.select("vec_id", "k").localCheckpoint()  # shared by pair join + output

    norm = emb.select(
        "vec_id",
        F.transform(
            "v",
            lambda x: x
            / F.sqrt(
                F.aggregate(
                    F.zip_with("v", "v", lambda p, q: p * q),
                    F.lit(0.0),
                    lambda acc, z: acc + z,
                )
            ),
        ).alias("nv"),
    )
    cos = F.round(
        F.aggregate(
            F.zip_with("nv", "nv_b", lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        4,
    )
    pairs = (
        a.join(a.select(F.col("vec_id").alias("vec_id_b"), F.col("k")), "k")
        .filter(F.col("vec_id") < F.col("vec_id_b"))
        .join(norm, "vec_id")
        .join(
            norm.select(F.col("vec_id").alias("vec_id_b"), F.col("nv").alias("nv_b")),
            "vec_id_b",
        )
        .filter(cos >= SEMDEDUP_TAU)
        .select(F.col("vec_id_b").alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        a.join(pairs, "vec_id", "left")
        .select(
            "vec_id",
            F.col("k").alias("cluster"),
            F.coalesce(F.col("_dup"), F.lit(False)).alias("is_dup"),
        )
    )


CCNET_BUCKETS = ("tail", "middle", "head")


@register(
    "ccnet_quality_buckets",
    """
    WITH e AS (SELECT doc_id, lang,
                      unnest(string_split_regex(lower(text), '\\s+')) AS tok
               FROM documents),
    fr AS (SELECT tok, count(*) AS freq FROM e GROUP BY tok),
    tot AS (SELECT sum(freq)::DOUBLE AS n_total FROM fr),
    sc AS (SELECT e.doc_id, e.lang,
                  round(avg(ln(fr.freq / tot.n_total)), 4) AS score
           FROM e JOIN fr USING (tok) CROSS JOIN tot
           GROUP BY e.doc_id, e.lang),
    q AS (SELECT lang, quantile_cont(score, 1.0/3) AS q1,
                 quantile_cont(score, 2.0/3) AS q2
          FROM sc GROUP BY lang)
    SELECT doc_id, lang, score,
           CASE WHEN score <= q1 THEN 'tail'
                WHEN score <= q2 THEN 'middle'
                ELSE 'head' END AS bucket
    FROM sc JOIN q USING (lang)
    """,
)
def ccnet_quality_buckets(spark, sf_dir):
    """CCNet-style quality bucketing (Wenzek et al. 2020): score every
    document by its corpus-LM mean token log-prob (the perplexity proxy
    of unigram_logprob_quality) and cut each LANGUAGE into head/middle/
    tail terciles — the curriculum label CCNet ships with CommonCrawl
    and that pretraining mixes sample against. Per-language cuts matter:
    an absolute threshold would dump whole low-resource languages into
    'tail'.

    Scale shape: the scoring reuses the single-scan unigram pipeline
    (one explode, one (tok) agg, vocab shuffle-join, map-side-combinable
    per-doc agg). Tercile boundaries are an exact interpolated
    `percentile` over the PER-DOC score table grouped by lang (doc-
    sized, not corpus-sized) — at 100 TB swap for `approx_percentile`
    (t-digest, mergeable), same documented trade as
    event_value_quantiles; the lang-sized boundary table broadcasts
    back for the codegen'd bucket assignment. Boundaries are computed
    from the 4dp-ROUNDED scores in both engines, so interpolation ulp
    can't flip a boundary comparison (a rounded score equal to a
    boundary neighbor compares identically cross-engine)."""
    d = _t(spark, sf_dir, "documents")
    e = d.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    )
    fr = e.groupBy("tok").agg(F.count("*").alias("freq"))
    tot = fr.agg(F.sum("freq").cast("double").alias("n_total"))
    sc = (
        e.join(fr, "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(
            F.round(F.avg(F.log(F.col("freq") / F.col("n_total"))), 4).alias("score")
        )
        .localCheckpoint()  # feeds both the boundary agg and the assignment
    )
    q = sc.groupBy("lang").agg(
        F.percentile("score", F.lit(1.0 / 3)).alias("q1"),
        F.percentile("score", F.lit(2.0 / 3)).alias("q2"),
    )
    bucket = (
        F.when(F.col("score") <= F.col("q1"), "tail")
        .when(F.col("score") <= F.col("q2"), "middle")
        .otherwise("head")
    )
    return (
        sc.join(F.broadcast(q), "lang")
        .select("doc_id", "lang", "score", bucket.alias("bucket"))
    )


CLIP_NEG_TOK_CAP = 32  # caption tokens on more captions are stopwords here
CLIP_NEG_MIN_JAC = 0.001  # any shared rare token qualifies as "hard"


@register(
    "clip_hard_negatives",
    f"""
    WITH c AS (SELECT image_id, caption,
                      list_distinct(string_split_regex(lower(caption), '\\s+'))
                        AS toks
               FROM read_parquet('{_IMAGES_META}')),
    e AS (SELECT image_id, caption, unnest(toks) AS tok FROM c),
    rare AS (SELECT tok FROM e GROUP BY tok
             HAVING count(*) <= {CLIP_NEG_TOK_CAP}),
    re AS (SELECT e.image_id, e.caption, e.tok FROM e JOIN rare USING (tok)),
    tot AS (SELECT image_id, count(*) AS n FROM re GROUP BY image_id),
    shared AS (SELECT a.image_id AS anchor_id, b.image_id AS neg_id,
                      count(*) AS n_shared
               FROM re a JOIN re b
                 ON a.tok = b.tok AND a.image_id <> b.image_id
                    AND a.caption <> b.caption
               GROUP BY 1, 2),
    j AS (SELECT anchor_id, neg_id,
                 round(n_shared::DOUBLE / (ta.n + tb.n - n_shared), 4) AS jac
          FROM shared JOIN tot ta ON ta.image_id = anchor_id
                      JOIN tot tb ON tb.image_id = neg_id),
    r AS (SELECT *, row_number() OVER (PARTITION BY anchor_id
                       ORDER BY jac DESC, neg_id) AS rn
          FROM j WHERE jac >= {CLIP_NEG_MIN_JAC})
    SELECT anchor_id, neg_id, jac FROM r WHERE rn = 1
    """,
)
def clip_hard_negatives(spark, sf_dir):
    """Hard-negative mining for contrastive image-text training: for
    each image, the most-confusable OTHER image = the one whose caption
    shares the most rare tokens (top-1 by capped-token Jaccard) while
    the caption itself differs — the in-batch negatives that make a
    CLIP-style loss learn fine-grained distinctions instead of trivial
    ones. Exact-caption matches are excluded (those are duplicates —
    crossmodal_dup_classify's department, not negatives).

    Scale shape: token-postings equi-join with an idf cap (tokens on
    more than {CLIP_NEG_TOK_CAP} captions are dropped first — the
    ubiquitous 'caption'/'photo' tokens would otherwise make the
    postings join all-pairs; the cap bounds candidates per token at
    C(cap,2), same discipline as mirror_host_detect). Jaccard is
    computed over the CAPPED token sets; the top-1 window partitions
    by anchor. Ignores sf_dir (fixture universe, like the other
    images_meta ops)."""
    c = spark.read.parquet(_IMAGES_META).select(
        "image_id",
        "caption",
        F.array_distinct(F.split(F.lower("caption"), r"\s+")).alias("toks"),
    )
    e = c.select("image_id", "caption", F.explode("toks").alias("tok"))
    rare = e.groupBy("tok").agg(F.count("*").alias("n_caps")).filter(
        F.col("n_caps") <= CLIP_NEG_TOK_CAP
    )
    re_ = e.join(rare.select("tok"), "tok").localCheckpoint()
    tot = re_.groupBy("image_id").agg(F.count("*").alias("n"))
    b = re_.select(
        F.col("image_id").alias("neg_id"),
        F.col("caption").alias("caption_b"),
        "tok",
    )
    shared = (
        re_.join(b, "tok")
        .filter(
            (F.col("image_id") != F.col("neg_id"))
            & (F.col("caption") != F.col("caption_b"))
        )
        .groupBy(F.col("image_id").alias("anchor_id"), "neg_id")
        .agg(F.count("*").alias("n_shared"))
    )
    jac = F.round(
        F.col("n_shared").cast("double")
        / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        4,
    )
    j = (
        shared.join(
            tot.select(F.col("image_id").alias("anchor_id"), F.col("n").alias("n_a")),
            "anchor_id",
        )
        .join(
            tot.select(F.col("image_id").alias("neg_id"), F.col("n").alias("n_b")),
            "neg_id",
        )
        .select("anchor_id", "neg_id", jac.alias("jac"))
        .filter(F.col("jac") >= CLIP_NEG_MIN_JAC)
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("jac"), "neg_id")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("anchor_id", "neg_id", "jac")
    )


# ===========================================================================
# H. Round-3b additions: substring-level dedup, corpus health, skew
# diagnostics (the partition-skew lens the north rule asks for explicitly)
# ===========================================================================

# Exact-substring dedup at token-window granularity (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better": ExactSubstr
# hashes every K-token position; K=50 there, K=8 here for the synthetic
# corpus's ~150-token docs). A suffix array is the single-node tool; the
# distributed equivalent is a rolling window explode + hash agg, which is
# linear in corpus tokens and map-side combinable.
DUP_SPAN_K = 8  # tokens per window (stride 1, alignment-robust)
DUP_SPAN_HEAVY = 0.2  # dup_frac above this marks the doc for removal

# Overlapping K-gram windows as an array of joined strings; guarded so
# docs shorter than K yield [] (Spark's sequence(1,0) would DESCEND).
_SPAN_GRAMS_SPARK = (
    "CASE WHEN size(toks) >= {k} THEN "
    "transform(sequence(1, size(toks) - {k} + 1), "
    "i -> array_join(slice(toks, i, {k}), ' ')) "
    "ELSE array() END"
).format(k=DUP_SPAN_K)

# DuckDB twin: range(a,b) is [a,b) and empty when b<=a; list slice is
# inclusive on both ends so toks[i : i+K-1] is K elements.
_SPAN_GRAMS_SQL = (
    "list_transform(range(1, len(toks) - {k} + 2), "
    "i -> array_to_string(toks[i : i + {k} - 1], ' '))"
).format(k=DUP_SPAN_K)


@register(
    "dup_span_detect",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_RAW_SQL} AS toks FROM documents),
    w AS (SELECT doc_id,
                 unnest(list_transform({_SPAN_GRAMS_SQL},
                        g -> {_MD5_INT_SQL.format(c='g')})) AS gram_h
          FROM t),
    per_doc_gram AS (SELECT DISTINCT doc_id, gram_h FROM w),
    dup AS (SELECT gram_h FROM per_doc_gram
            GROUP BY gram_h HAVING count(*) >= 2),
    counts AS (SELECT w.doc_id,
                      count(*) AS n_windows,
                      count(*) FILTER (WHERE dup.gram_h IS NOT NULL)
                        AS n_dup_windows
               FROM w LEFT JOIN dup ON w.gram_h = dup.gram_h
               GROUP BY w.doc_id)
    SELECT doc_id, n_windows, n_dup_windows,
           round(n_dup_windows::DOUBLE / n_windows, 4) AS dup_frac,
           (round(n_dup_windows::DOUBLE / n_windows, 4)
              >= {DUP_SPAN_HEAVY}) AS is_dup_heavy
    FROM counts
    """,
)
def dup_span_detect(spark, sf_dir):
    """Intra-corpus exact-substring duplication at K-token-window
    granularity (Lee et al. 2022 ExactSubstr, distributed form): hash
    every stride-1 K-gram window, find windows present in >=2 distinct
    docs, and report each doc's duplicated-window fraction. Alignment-
    robust where the fixed-block variant is not: a one-token insertion
    in a near-dup still shares almost every window.

    Scale shape (the suffix-array alternative is single-node): the
    window explode is linear in corpus TOKENS (~n_tokens rows/doc);
    the dup-gram set comes from a two-phase hash agg on gram_h
    (map-side combinable, distinct-rewritten); the flag-back is a
    shuffle equi-join on gram_h where both sides are data-sized —
    never broadcast, never quadratic. At 100 TB this is the same plan
    with more partitions. Docs shorter than K yield zero windows and
    drop out (mirrored in the oracle: empty unnest produces no rows).

    Reference analog: none — the reference crawls; this is the
    LLM-curation extension (SURVEY.md §2 pipeline ops)."""
    t = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), r"\s+").alias("toks")
    )
    # the window explode is the dominant cost; materialize it once so
    # the dup-gram agg and the flag-back join share one corpus scan
    # (the repo's shared-subtree pattern, cf. minhash_lsh_pairs)
    w = (
        t.select(
            "doc_id",
            F.explode(F.expr(_SPAN_GRAMS_SPARK)).alias("gram"),
        )
        .select("doc_id", _md5_int(F.col("gram")).alias("gram_h"))
        .localCheckpoint(eager=False)
    )
    # two-phase: distinct (gram_h, doc_id) first so a doc repeating its
    # own gram doesn't count as cross-doc duplication
    dup = (
        w.select("doc_id", "gram_h")
        .distinct()
        .groupBy("gram_h")
        .agg(F.count("*").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gram_h")
    )
    counts = (
        w.join(dup.withColumn("is_dup", F.lit(1)), "gram_h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.count("is_dup").alias("n_dup_windows"),
        )
    )
    frac = F.round(
        F.col("n_dup_windows").cast("double") / F.col("n_windows"), 4
    )
    return counts.select(
        "doc_id",
        "n_windows",
        "n_dup_windows",
        frac.alias("dup_frac"),
        (frac >= DUP_SPAN_HEAVY).alias("is_dup_heavy"),
    )


# Zipf rank-frequency slope: a healthy natural-language corpus has
# slope ~ -1 on the log-log rank/frequency curve; template spam and
# boilerplate-heavy crawls flatten or steepen it. Standard corpus-health
# diagnostic (Zipf 1949; used as a crawl-quality signal).
ZIPF_TOP_RANKS = 100  # fit over the head of the distribution


@register(
    "token_zipf_slope",
    f"""
    WITH tok AS (SELECT lang, unnest({_TOKS_RAW_SQL}) AS tok
                 FROM documents),
    freq AS (SELECT lang, tok, count(*) AS f
             FROM tok GROUP BY lang, tok),
    ranked AS (SELECT lang, f,
                      row_number() OVER (PARTITION BY lang
                                         ORDER BY f DESC, tok) AS r,
                      count(*) OVER (PARTITION BY lang) AS vocab_n
               FROM freq)
    SELECT lang, vocab_n::BIGINT AS vocab_n,
           count(*)::BIGINT AS n_ranked,
           round(regr_slope(ln(f::DOUBLE), ln(r::DOUBLE)), 4)
             AS zipf_slope
    FROM ranked WHERE r <= {ZIPF_TOP_RANKS}
    GROUP BY lang, vocab_n
    """,
)
def token_zipf_slope(spark, sf_dir):
    """Per-language Zipf slope: OLS slope of ln(frequency) on ln(rank)
    over the top-{ZIPF_TOP_RANKS} token ranks. Corpus-health
    diagnostic — natural text sits near -1; template/boilerplate
    corpora deviate.

    Scale shape: one explode + two-phase hash agg on (lang, tok) —
    the only corpus-sized work, map-side combinable. The rank window
    partitions by lang over the VOCABULARY (not the corpus), and the
    regression runs over <= {ZIPF_TOP_RANKS} rows/lang via Spark's
    built-in regr_slope aggregate (JVM, mergeable partials). Ties in
    frequency are broken by token text so both engines fit the same
    (f, r) point set exactly."""
    tok = _t(spark, sf_dir, "documents").select(
        "lang", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    )
    freq = tok.groupBy("lang", "tok").agg(F.count("*").alias("f"))
    w = Window.partitionBy("lang").orderBy(F.desc("f"), "tok")
    ranked = freq.select(
        "lang",
        "f",
        F.row_number().over(w).alias("r"),
        F.count("*").over(Window.partitionBy("lang")).alias("vocab_n"),
    ).filter(F.col("r") <= ZIPF_TOP_RANKS)
    return ranked.groupBy("lang", "vocab_n").agg(
        F.count("*").alias("n_ranked"),
        F.round(
            F.expr("regr_slope(ln(cast(f as double)), ln(cast(r as double)))"), 4
        ).alias("zipf_slope"),
    ).select("lang", "vocab_n", "n_ranked", "zipf_slope")


# Partition-skew diagnostics: the north rule requires "partitioning /
# shuffle / skew handled explicitly" — this op is the MEASUREMENT side
# of that contract: given a candidate shuffle key, report the hot keys,
# their share of the table, and the salt factor the engine's adaptive
# census salting (frontier.py) would assign. Host key is synthesized
# with a deliberately non-uniform quadratic map so the diagnostic has
# real skew to find at every scale factor.
SKEW_TOP_HOSTS = 10


@register(
    "skew_diagnostics",
    f"""
    WITH fr AS (SELECT 'h' || (((o_custkey % 20) * (o_custkey % 20)) // 20)::VARCHAR
                  AS host
                FROM orders),
    per_host AS (SELECT host, count(*) AS cnt FROM fr GROUP BY host),
    tot AS (SELECT sum(cnt) AS total, count(*) AS n_hosts,
                   max(cnt) AS max_cnt FROM per_host)
    SELECT host, cnt,
           round(cnt::DOUBLE / total, 4) AS share,
           round(cnt::DOUBLE * n_hosts / total, 4) AS skew_x,
           ceil(cnt::DOUBLE * n_hosts / total)::BIGINT AS salt_factor,
           n_hosts::BIGINT AS n_hosts,
           round(max_cnt::DOUBLE * n_hosts / total, 4) AS table_skew_x
    FROM per_host, tot
    ORDER BY cnt DESC, host LIMIT {SKEW_TOP_HOSTS}
    """,
)
def skew_diagnostics(spark, sf_dir):
    """Shuffle-key skew report for a candidate partition key (per-host
    frontier counts, the politeness-window key): top hot keys with
    count, share of table, per-key skew multiple vs the uniform mean,
    and the integer salt factor a salted-window plan would assign
    (the same cnt/mean census arithmetic frontier.py's adaptive
    salting uses, frontier.py:186-197). `table_skew_x` (max/mean) on
    every row gives the single number that decides salted vs plain
    window at plan time.

    Scale shape: ONE two-phase hash agg on host (map-side combinable)
    produces a key-cardinality-sized table; totals are a single-row
    aggregate broadcast back (1-row broadcast NL join, the repo's
    standard totals pattern); final top-k is TakeOrderedAndProject.
    The corpus is scanned once; nothing corpus-sized is sorted,
    windowed, or joined. Host synthesis uses integer-exact quadratic
    bunching ((k%20)^2 // 20) so both engines see identical skew."""
    o = _t(spark, sf_dir, "orders")
    host = F.concat(
        F.lit("h"),
        (((F.col("o_custkey") % 20) * (F.col("o_custkey") % 20)) / 20)
        .cast("long")
        .cast("string"),
    )
    # per_host is key-cardinality-sized; materialize it so the totals
    # aggregate and the join-back don't each re-scan the orders table
    per_host = (
        o.select(host.alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    tot = per_host.agg(
        F.sum("cnt").alias("total"),
        F.count("*").alias("n_hosts"),
        F.max("cnt").alias("max_cnt"),
    )
    j = per_host.join(F.broadcast(tot))
    skew_x = F.col("cnt").cast("double") * F.col("n_hosts") / F.col("total")
    return (
        j.select(
            "host",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("total"), 4).alias("share"),
            F.round(skew_x, 4).alias("skew_x"),
            F.ceil(skew_x).cast("long").alias("salt_factor"),
            F.col("n_hosts").cast("long").alias("n_hosts"),
            F.round(
                F.col("max_cnt").cast("double") * F.col("n_hosts") / F.col("total"), 4
            ).alias("table_skew_x"),
        )
        .orderBy(F.desc("cnt"), "host")
        .limit(SKEW_TOP_HOSTS)
    )


# ===========================================================================
# I. Round-3c additions: product-quantization ANN and frontier shard
# planning (the packing complement of skew_diagnostics)
# ===========================================================================

# Product quantization (Jegou et al. 2011, "Product Quantization for
# Nearest Neighbor Search"): split the 64-dim embedding into PQ_M=8
# subspaces of 8 dims; each subspace has PQ_K=16 codebook entries, so a
# vector compresses to 8 x 4 bits = ONE int64 code. Codebooks here are
# fixed, seeded, 4-sparse +/-1 directions shared verbatim by Spark and
# the DuckDB oracle (same discipline as _ivf_spec; at scale codebooks
# come from per-subspace sampled k-means, broadcast the same way).
# Because every codebook entry has constant norm (4 nonzero +/-1 =>
# ||c||^2 = 4), argmax inner product == argmin L2, i.e. this IS the
# standard PQ encoder for these codebooks.
PQ_M = 8          # subspaces
PQ_SUBDIM = 8     # dims per subspace (8 x 8 = 64)
PQ_K = 16         # codebook entries per subspace (4 bits)
PQ_NNZ = 4        # nonzeros per codebook direction
PQ_RERANK = 32    # ADC candidates exact-cosine re-ranked


def _pq_spec(seed: int = 23):
    import numpy as np

    rng = np.random.RandomState(seed)
    spec = []  # spec[m][k] = [(global_dim, sign), ...]
    for m in range(PQ_M):
        base = m * PQ_SUBDIM
        spec.append(
            [
                list(
                    zip(
                        (base + rng.choice(PQ_SUBDIM, size=PQ_NNZ, replace=False)).tolist(),
                        rng.choice([-1.0, 1.0], size=PQ_NNZ).tolist(),
                    )
                )
                for _ in range(PQ_K)
            ]
        )
    return spec


_PQ_SPEC = _pq_spec()


def _pq_dot_spark(entry, col: str) -> str:
    # Spark-SQL string, parsed JVM-side in ONE py4j call per consumer:
    # building these 128 4-term dots as Column objects costs ~5s of
    # driver-side py4j round trips (measured); F.expr costs ~0.1s.
    return " + ".join(
        f"({s:+.1f}D * element_at({col}, {d + 1}))" for d, s in entry
    )


def _pq_dot_sql(entry, col: str = "emb") -> str:
    return " + ".join(f"({s:+.1f} * {col}[{d + 1}])" for d, s in entry)


def _pq_codes(df: DataFrame, col: str = "emb", keep: tuple = ()) -> DataFrame:
    """(vec_id, *keep, code): packed int64 PQ code — subspace m contributes
    its argmax codebook index (0..15) shifted into bits [4m, 4m+4).
    Two Projects: the 8 16-dot arrays materialize once, then the
    argmax/pack references the ARRAYS — inlining them into
    array_position+array_max would duplicate every dot expression in
    the generated code and double the Janino compile time (the
    dominant cost at small scale; measured ~2x)."""
    dots = [
        F.expr(
            "array(" + ", ".join(_pq_dot_spark(e, col) for e in _PQ_SPEC[m]) + ")"
        ).alias(f"_d{m}")
        for m in range(PQ_M)
    ]
    packed = F.expr(
        " + ".join(
            f"((array_position(_d{m}, array_max(_d{m})) - 1L) * {1 << (4 * m)}L)"
            for m in range(PQ_M)
        )
    )
    keep = list(keep)
    return df.select("vec_id", *keep, *dots).select(
        "vec_id", *keep, packed.alias("code")
    )


def _pq_code_sql(col: str = "emb") -> str:
    parts = []
    for m in range(PQ_M):
        dots = "[" + ", ".join(_pq_dot_sql(e, col) for e in _PQ_SPEC[m]) + "]"
        parts.append(
            f"((list_position({dots}, list_max({dots})) - 1)::BIGINT * {1 << (4 * m)})"
        )
    return " + ".join(parts)


def _pq_dtable_col(col: str = "qe"):
    """128 ADC lookup entries in m-major order: dtable[m*16 + k] =
    dot(query, codebook[m][k]) over the FULL vector (codebook entries
    are zero outside their subspace, so global dots == subspace dots).
    One F.expr array — see _pq_dot_spark on why strings, not Columns."""
    return F.expr(
        "array("
        + ", ".join(_pq_dot_spark(e, col) for m in range(PQ_M) for e in _PQ_SPEC[m])
        + ")"
    )


def _pq_dtable_sql(col: str = "qe") -> str:
    return (
        "["
        + ", ".join(_pq_dot_sql(e, col) for m in range(PQ_M) for e in _PQ_SPEC[m])
        + "]"
    )


def _pq_adc_col(dtable: str = "dtable", code: str = "code"):
    return F.expr(
        " + ".join(
            f"element_at({dtable}, CAST({m * PQ_K} + "
            f"((shiftright({code}, {4 * m}) & 15) + 1) AS INT))"
            for m in range(PQ_M)
        )
    )


def _pq_adc_sql(dtable: str = "dtable", code: str = "code") -> str:
    return " + ".join(
        f"{dtable}[{m * PQ_K} + ((({code} >> {4 * m}) & 15) + 1)]"
        for m in range(PQ_M)
    )


def _pq_recall_stats(
    e: DataFrame, rerank: int, query_ids: list[int]
) -> dict[str, float]:
    """Measured PQ quality on corpus ``e``: mean recall@5 (vs exact
    cosine top-5) of the ADC top-``rerank`` candidate set over
    ``query_ids``, plus the fixed scanned fraction rerank/(n-1).

    All Spark-side, the _ivf_recall_stats twin: corpus codes are the
    packed int64s; each query row carries its own 128-entry dtable; the
    candidate set is a per-query ADC rank window. Chance recall equals
    the scanned fraction, so recall >> scanned fraction is the evidence
    that ADC ranking carries signal (pinned on a planted-cluster corpus
    in tests/test_round3d_ops.py; the bench corpus is near-orthogonal
    random where every quantizer tracks chance)."""
    emb = e.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    codes = _pq_codes(emb)
    qs = emb.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("qid"),
        F.col("emb").alias("qe"),
        _pq_dtable_col("emb").alias("dtable"),
    )

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)

    # exact ground truth: broadcast the |query_ids| query vectors
    pairs = emb.join(F.broadcast(qs.select("qid", "qe")), F.col("vec_id") != F.col("qid"))
    sim = dot(F.col("emb"), F.col("qe")) / (
        F.sqrt(dot(F.col("emb"), F.col("emb"))) * F.sqrt(dot(F.col("qe"), F.col("qe")))
    )
    w5 = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), "vec_id")
    top5 = (
        pairs.select("qid", "vec_id", sim.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w5))
        .filter(F.col("rnk") <= 5)
    )
    # ADC candidates: per-query rank window over the codes table
    adc = codes.join(
        F.broadcast(qs.select("qid", "dtable")), F.col("vec_id") != F.col("qid")
    ).select("qid", "vec_id", _pq_adc_col().alias("adc"))
    wr = Window.partitionBy("qid").orderBy(F.desc("adc"), "vec_id")
    cand = (
        adc.withColumn("arnk", F.row_number().over(wr))
        .filter(F.col("arnk") <= rerank)
        .select(F.col("qid").alias("cqid"), F.col("vec_id").alias("cvid"))
    )
    hits = top5.join(
        cand,
        (F.col("qid") == F.col("cqid")) & (F.col("vec_id") == F.col("cvid")),
        "left_semi",
    ).count()
    n = emb.count()
    nq = len(query_ids)
    return {
        "scanned_fraction": round(rerank / max(n - 1, 1), 4),
        "recall_at_5": round(hits / (5 * nq), 3),
    }


@register(
    "ann_pq_topk",
    f"""
    WITH base AS (SELECT vec_id, {_TO_D.format(c='embedding')} AS emb
                  FROM embeddings),
    codes AS (SELECT vec_id, {_pq_code_sql()} AS code
              FROM base WHERE vec_id <> 0),
    q AS (SELECT emb AS qe, {_pq_dtable_sql('emb')} AS dtable
          FROM base WHERE vec_id = 0),
    adc AS (SELECT vec_id, {_pq_adc_sql()} AS adc
            FROM codes, q
            ORDER BY adc DESC, vec_id LIMIT {PQ_RERANK}),
    s AS (SELECT adc.vec_id,
                 round(list_dot_product(emb, qe)
                   / (sqrt(list_dot_product(emb, emb))
                      * sqrt(list_dot_product(qe, qe))), 4) AS cos_sim
          FROM adc JOIN base ON adc.vec_id = base.vec_id, q)
    SELECT vec_id, cos_sim FROM s ORDER BY cos_sim DESC, vec_id LIMIT 5
    """,
)
def ann_pq_topk(spark, sf_dir):
    """Product-quantization ANN (Jegou et al. 2011): encode every
    corpus vector as ONE packed int64 (8 subspaces x 4-bit codebook
    index), score candidates by asymmetric distance computation (ADC:
    the query precomputes a 128-entry dot table, a candidate's score is
    8 table lookups summed), exact-cosine re-rank the top PQ_RERANK=32.
    Completes the repo's ANN family: exact (ann_cosine_topk), LSH
    bucket (ann_lsh_bucket_topk), IVF (ann_ivf_topk), PQ (here).

    Scale shape — the reason PQ exists: the scored table is
    (vec_id, code int64) = 12 bytes/vector vs 256 bytes raw, so a
    10^10-vector corpus's scan drops ~20x and never shuffles; the
    dtable is a 1-row broadcast (the repo's query-vector pattern);
    ADC is 8 array lookups + a left-assoc sum in whole-stage codegen;
    top-PQ_RERANK is TakeOrderedAndProject; only the 32 survivors
    re-join the raw embeddings (broadcast ids, data-sized probe).
    Codebook entries have constant norm (4 nonzero +/-1), so the
    argmax-dot encoder IS argmin-L2 — standard PQ, deterministic.
    Both engines share _PQ_SPEC verbatim: identical left-assoc double
    sums, argmax ties to first index (array_position/list_position),
    ADC ties broken by vec_id.

    Reference analog: none (crawler); LLM-pipeline similarity-search
    extension (SURVEY.md §2 pipeline ops)."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    # codes: ids + one packed int64 — the ONLY corpus-sized table ADC
    # touches. _pq_codes keeps the 128-dot Project its own codegen
    # stage (same Janino-cap discipline as embedding_neardup).
    codes = _pq_codes(e.filter(F.col("vec_id") != 0))
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("emb").alias("qe"), _pq_dtable_col("emb").alias("dtable")
    )
    adc = (
        codes.join(F.broadcast(q.select("dtable")))
        .select("vec_id", _pq_adc_col().alias("adc"))
        .orderBy(F.desc("adc"), "vec_id")
        .limit(PQ_RERANK)
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    cand = e.join(F.broadcast(adc.select("vec_id")), "vec_id").join(
        F.broadcast(q.select("qe"))
    )
    sim = F.round(
        dot(F.col("emb"), F.col("qe"))
        / (F.sqrt(dot(F.col("emb"), F.col("emb"))) * F.sqrt(dot(F.col("qe"), F.col("qe")))),
        4,
    )
    return (
        cand.select("vec_id", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(5)
    )


# Frontier shard planning: the PACKING side of the skew contract
# (skew_diagnostics is the measurement side). Given per-host pending
# counts, assign hosts to a fixed number of scheduler shards by
# serpentine (snake) order — sort hosts by load descending, deal them
# boustrophedon across shards — the classic deterministic balanced-
# assignment heuristic (within max-item of optimal for this shape).
SHARD_N = 8


@register(
    "frontier_shard_plan",
    f"""
    WITH fr AS (SELECT 'h' || ((o_custkey * o_custkey) % 137)::VARCHAR AS host
                FROM orders),
    per_host AS (SELECT host, count(*) AS cnt FROM fr GROUP BY host),
    ranked AS (SELECT host, cnt,
                      row_number() OVER (ORDER BY cnt DESC, host) - 1 AS rn
               FROM per_host),
    assigned AS (SELECT host, cnt,
                        CASE WHEN (rn // {SHARD_N}) % 2 = 0
                             THEN rn % {SHARD_N}
                             ELSE {SHARD_N - 1} - (rn % {SHARD_N}) END AS shard
                 FROM ranked),
    shards AS (SELECT shard, count(*) AS n_hosts, sum(cnt) AS pending
               FROM assigned GROUP BY shard),
    tot AS (SELECT sum(pending) AS total FROM shards)
    SELECT shard::BIGINT AS shard, n_hosts::BIGINT AS n_hosts,
           pending::BIGINT AS pending,
           round(pending::DOUBLE / total, 4) AS share,
           round(pending::DOUBLE * {SHARD_N} / total, 4) AS balance_x
    FROM shards, tot ORDER BY shard
    """,
)
def frontier_shard_plan(spark, sf_dir):
    """Frontier shard plan: serpentine bin-packing of hosts onto
    SHARD_N=8 scheduler shards. Hosts sort by pending count descending
    (host tiebreak), then deal boustrophedon (0..7, 7..0, ...) so each
    shard gets one host per "round" of the deal alternating from the
    heavy and light ends — the deterministic, SQL-expressible cousin of
    greedy LPT packing. Output is the per-shard plan: host count, total
    pending, share, and balance_x (shard load vs uniform mean; max
    balance_x near 1.0 = well packed). skew_diagnostics MEASURES hot
    keys; this op PLANS around them — together they evidence the north
    rule's "partitioning / shuffle / skew handled explicitly".

    Scale shape: the corpus-sized work is ONE map-side-combinable
    count per host; everything after runs on the key-cardinality-sized
    hosts table (the politeness-census argument, frontier.py): the
    global rank window is over hosts, not URLs, and the final plan is
    SHARD_N rows joined to a 1-row broadcast total. Host synthesis
    (quadratic residues mod 137, ~69 distinct, x2-range counts) gives
    both engines identical non-uniform load to pack.

    Reference analog: RabbitMQ consumers shard by QUEUE (connection.py
    24-41); per-host shards are what a frontier at 10^10 URLs needs."""
    o = _t(spark, sf_dir, "orders")
    host = F.concat(
        F.lit("h"), ((F.col("o_custkey") * F.col("o_custkey")) % 137).cast("string")
    )
    # per_host is key-cardinality-sized; materialize it so the shard
    # plan and the 1-row total don't each re-scan orders (the repo's
    # totals pattern, cf. skew_diagnostics)
    per_host = (
        o.select(host.alias("host"))
        .groupBy("host")
        .agg(F.count("*").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    rn = F.row_number().over(Window.orderBy(F.desc("cnt"), "host")) - 1
    block_even = ((rn / SHARD_N).cast("long") % 2) == 0
    shard = F.when(block_even, rn % SHARD_N).otherwise(
        F.lit(SHARD_N - 1) - (rn % SHARD_N)
    )
    shards = (
        per_host.select("host", "cnt", shard.alias("shard"))
        .groupBy("shard")
        .agg(F.count("*").alias("n_hosts"), F.sum("cnt").alias("pending"))
    )
    tot = shards.agg(F.sum("pending").alias("total"))
    return (
        shards.join(F.broadcast(tot))
        .select(
            F.col("shard").cast("long").alias("shard"),
            F.col("n_hosts").cast("long").alias("n_hosts"),
            F.col("pending").cast("long").alias("pending"),
            F.round(F.col("pending").cast("double") / F.col("total"), 4).alias("share"),
            F.round(
                F.col("pending").cast("double") * SHARD_N / F.col("total"), 4
            ).alias("balance_x"),
        )
        .orderBy("shard")
    )


@register(
    "ann_ivfpq_topk",
    f"""
    WITH base AS (SELECT vec_id, {_TO_D.format(c='embedding')} AS emb,
                         {_ivf_dots_sql()} AS dots
                  FROM embeddings),
    cells AS (SELECT vec_id, emb,
                     list_position(dots, list_max(dots)) AS cell
              FROM base),
    codes AS (SELECT vec_id, cell, {_pq_code_sql('emb')} AS code
              FROM cells WHERE vec_id <> 0),
    q AS (SELECT emb AS qe, dots AS qdots, {_pq_dtable_sql('emb')} AS dtable
          FROM base WHERE vec_id = 0),
    qtop AS (SELECT r.i AS qcell
             FROM q, range(1, {len(_IVF_SPEC) + 1}) r(i)
             ORDER BY qdots[r.i] DESC, r.i LIMIT {IVF_NPROBE}),
    adc AS (SELECT vec_id, {_pq_adc_sql()} AS adc
            FROM codes JOIN qtop ON codes.cell = qtop.qcell, q
            ORDER BY adc DESC, vec_id LIMIT {PQ_RERANK}),
    s AS (SELECT adc.vec_id,
                 round(list_dot_product(emb, qe)
                   / (sqrt(list_dot_product(emb, emb))
                      * sqrt(list_dot_product(qe, qe))), 4) AS cos_sim
          FROM adc JOIN base ON adc.vec_id = base.vec_id, q)
    SELECT vec_id, cos_sim FROM s ORDER BY cos_sim DESC, vec_id LIMIT 5
    """,
)
def ann_ivfpq_topk(spark, sf_dir):
    """IVFPQ (Jegou et al. 2011, the composition FAISS ships as its
    default large-scale index): the IVF coarse quantizer routes the
    query to its IVF_NPROBE best cells, and WITHIN those cells
    candidates are scored by PQ ADC (8 dtable lookups against the
    packed int64 code), then the top PQ_RERANK exact-cosine re-rank.
    Composes the two routes this registry already ships separately
    (ann_ivf_topk routes, ann_pq_topk compresses) into the index that
    does both: touch nprobe/16 of the corpus AND scan 12 B/vector.

    Scale shape: the codes table is (vec_id, cell, code) — at 10^10
    vectors it is written bucketed by cell (the evidenced
    SelectedBucketsCount story, tests/test_ivf.py), so a query reads
    nprobe buckets of 12 B/vector rows; the probed-cell list and the
    128-double dtable are 1-row/2-row broadcasts; ADC is codegen
    lookups; only PQ_RERANK survivors touch raw embeddings. Both
    engines share _IVF_SPEC and _PQ_SPEC verbatim — identical argmax,
    probe order, and left-assoc sums, ties to first index / vec_id.

    Reference analog: none (crawler); LLM-pipeline similarity-search
    extension (SURVEY.md §2 pipeline ops)."""
    e = _t(spark, sf_dir, "embeddings")
    cells = _ivf_cells(e)
    codes = _pq_codes(cells.filter(F.col("vec_id") != 0), keep=("cell",))
    q = cells.filter(F.col("vec_id") == 0).select(
        F.col("emb").alias("qe"), _pq_dtable_col("emb").alias("dtable")
    )
    qcells = _ivf_query_cells(e).select("qcell")
    adc = (
        codes.join(F.broadcast(qcells), F.col("cell") == F.col("qcell"))
        .join(F.broadcast(q.select("dtable")))
        .select("vec_id", _pq_adc_col().alias("adc"))
        .orderBy(F.desc("adc"), "vec_id")
        .limit(PQ_RERANK)
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    cand = (
        cells.join(F.broadcast(adc.select("vec_id")), "vec_id")
        .join(F.broadcast(q.select("qe")))
    )
    sim = F.round(
        dot(F.col("emb"), F.col("qe"))
        / (F.sqrt(dot(F.col("emb"), F.col("emb"))) * F.sqrt(dot(F.col("qe"), F.col("qe")))),
        4,
    )
    return (
        cand.select("vec_id", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(5)
    )


# ===========================================================================
# F. Round-3 additions: tokenizer training, incremental dedup, boilerplate
# ===========================================================================
BPE_TOPK = 64


@register(
    "bpe_merge_topk",
    f"""
    WITH w AS (
      SELECT word, count(*) AS wf
      FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
            FROM documents)
      WHERE len(word) >= 2
      GROUP BY word),
    p AS (
      SELECT substr(word, i, 1) AS sym_a, substr(word, i + 1, 1) AS sym_b,
             sum(wf)::BIGINT AS pair_count
      FROM (SELECT word, wf, unnest(range(1, len(word))) AS i FROM w)
      GROUP BY 1, 2)
    SELECT sym_a, sym_b, pair_count,
           row_number() OVER (ORDER BY pair_count DESC, sym_a, sym_b) AS merge_rank
    FROM p ORDER BY merge_rank LIMIT {BPE_TOPK}
    """,
)
def bpe_merge_topk(spark, sf_dir):
    """Distributed BPE tokenizer-training step: the top-{BPE_TOPK}
    adjacent-symbol pair counts that pick the first merge of a
    byte-pair-encoding vocabulary (Sennrich et al. 2016).

    The classic trick that makes BPE distributable is counting pairs on
    the WORD-FREQUENCY table, not the corpus: one map-side-combinable
    hash agg collapses 100 TB of text to a vocab-sized (word, wf)
    table, and the per-position pair explode runs over that — O(vocab x
    word_len) rows regardless of corpus size. Subsequent merge rounds
    rewrite only the words containing the merged pair (a filtered
    delta), so each round stays vocab-sized; this query is one round,
    the fixpoint loop is driver-side like _connected_components.

    Scale shape: agg -> vocab-sized explode -> agg -> TakeOrdered
    (never a global sort of all pairs); the row_number window runs
    over the already-limited {BPE_TOPK} rows. Reference analog: none
    (crawler); LLM-pipeline extension (SURVEY.md §2 pipeline ops)."""
    # The local test tables are one parquet row group, so the scan is a
    # single split and the word explode + partial agg (the heavy stage —
    # every word, not the distinct set) would run on one core; fan the
    # rows out first. At 100 TB the scan has thousands of splits and
    # this round-robin exchange of the SMALL pre-explode rows is noise.
    w = (
        _t(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("wf"))
    )
    pairs = (
        w.select(
            "word", "wf", F.explode(F.expr("sequence(1, length(word) - 1)")).alias("i")
        )
        .select(
            F.col("word").substr(F.col("i"), F.lit(1)).alias("sym_a"),
            F.col("word").substr(F.col("i") + F.lit(1), F.lit(1)).alias("sym_b"),
            "wf",
        )
        .groupBy("sym_a", "sym_b")
        .agg(F.sum("wf").alias("pair_count"))
    )
    top = pairs.orderBy(F.desc("pair_count"), "sym_a", "sym_b").limit(BPE_TOPK)
    wdw = Window.orderBy(F.desc("pair_count"), "sym_a", "sym_b")
    return top.withColumn("merge_rank", F.row_number().over(wdw).cast("long"))


def _incremental_candidates(sig: DataFrame) -> DataFrame:
    """(new_id, old_id) band collisions of the batch (doc_id % 10 = 0)
    against its predecessors — the delta⋈index join whose selectivity
    bench.py logs as the scale-safety evidence."""

    def band(cols):
        return F.md5(F.concat_ws("_", *[F.col(c).cast("string") for c in cols]))

    b0 = sig.select("doc_id", band([f"mh{i}" for i in range(8)]).alias("band"))
    b1 = sig.select("doc_id", band([f"mh{i}" for i in range(8, 16)]).alias("band"))
    bands = b0.unionByName(b1)
    n = bands.filter(F.col("doc_id") % 10 == 0).alias("n")
    o = bands.alias("o")
    return (
        n.join(
            o,
            (F.col("n.band") == F.col("o.band"))
            & (
                (F.col("o.doc_id") % 10 != 0)
                | (F.col("o.doc_id") < F.col("n.doc_id"))
            ),
        )
        .select(F.col("n.doc_id").alias("new_id"), F.col("o.doc_id").alias("old_id"))
        .distinct()
    )


@register(
    "incremental_neardup",
    f"""
    WITH sig AS ({_minhash_select_sql(16)}),
    bands AS (
      SELECT doc_id, md5({_B0}) AS band FROM sig
      UNION ALL
      SELECT doc_id, md5({_B1}) AS band FROM sig),
    cand AS (
      SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS old_id
      FROM bands n JOIN bands o ON n.band = o.band
      WHERE n.doc_id % 10 = 0
        AND (o.doc_id % 10 <> 0 OR o.doc_id < n.doc_id)),
    agreed AS (
      SELECT c.new_id, c.old_id FROM cand c
      JOIN sig sa ON sa.doc_id = c.new_id
      JOIN sig sb ON sb.doc_id = c.old_id
      WHERE ({_SIG_AGREE_SQL}) >= 10),
    toks AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    ver AS (
      SELECT new_id, old_id,
             round(len(list_intersect(ta.toks, tb.toks))::DOUBLE
                   / len(list_distinct(list_concat(ta.toks, tb.toks))), 4) AS jac
      FROM agreed JOIN toks ta ON ta.doc_id = new_id
                  JOIN toks tb ON tb.doc_id = old_id
      WHERE len(list_intersect(ta.toks, tb.toks))::DOUBLE
            / len(list_distinct(list_concat(ta.toks, tb.toks))) >= 0.9)
    SELECT new_id AS doc_id, old_id AS dup_of, jac
    FROM (SELECT *, row_number() OVER (PARTITION BY new_id ORDER BY old_id) AS rn
          FROM ver)
    WHERE rn = 1
    """,
)
def incremental_neardup(spark, sf_dir):
    """Incremental (delta-vs-corpus) near-dup dedup — the PRODUCTION
    shape of MinHash dedup at 100 TB: today's crawl batch (docs with
    doc_id % 10 = 0 stand in for the delta) is checked against the
    already-indexed corpus plus earlier-arrived batch members, and the
    corpus index is NEVER recomputed. Output: one row per duplicate
    new doc with its canonical earlier match (min old_id) and verified
    Jaccard >= 0.9.

    Scale shape: the corpus band index (doc_id, band) is a committed
    bucketed table amortized across batches — exactly the engine's
    LSM bloom-segment pattern (bloom.py) applied to near-dup instead
    of exact-dup; per-batch cost is O(delta bands joined against the
    index + collisions), and the delta side of the join is
    broadcast-able when the batch is small. Same 2x8 banding,
    >= 10/16 signature-agreement prefilter, and exact-Jaccard verify
    as minhash_lsh_pairs (recall math documented there); the arrival
    order (corpus before batch, batch by doc_id) is part of the
    contract and mirrored in the oracle. Reference analog: the
    dupefilter's incremental seen-check (dupefilter.py:35-44) done
    for NEAR-dups."""
    sig = _minhash_sigs(spark, sf_dir, 16).localCheckpoint()
    cand = _incremental_candidates(sig)
    siga = sig.select(
        F.col("doc_id").alias("new_id"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(16)],
    )
    sigb = sig.select(
        F.col("doc_id").alias("old_id"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(16)],
    )
    cj = cand.join(siga, "new_id").join(sigb, "old_id")
    agree = None
    for i in range(16):
        t = (F.col(f"a{i}") == F.col(f"b{i}")).cast("int")
        agree = t if agree is None else agree + t
    agreed = cj.filter(agree >= 10).select("new_id", "old_id")
    d = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", _toks_col().alias("toks"))
        .localCheckpoint()
    )
    j = agreed.join(
        d.select(F.col("doc_id").alias("new_id"), F.col("toks").alias("ta")), "new_id"
    ).join(d.select(F.col("doc_id").alias("old_id"), F.col("toks").alias("tb")), "old_id")
    jac = F.size(F.array_intersect("ta", "tb")).cast("double") / F.size(
        F.array_union("ta", "tb")
    )
    ver = j.withColumn("jac_raw", jac).filter(F.col("jac_raw") >= 0.9)
    wdw = Window.partitionBy("new_id").orderBy("old_id")
    return (
        ver.withColumn("rn", F.row_number().over(wdw))
        .filter(F.col("rn") == 1)
        .select(
            F.col("new_id").alias("doc_id"),
            F.col("old_id").alias("dup_of"),
            F.round("jac_raw", 4).alias("jac"),
        )
    )


# Deterministic boilerplate augmentation: the synthetic corpus has no
# page chrome, so both engines wrap every doc in the SAME source-derived
# lines (' | '-separated) before stripping — a per-source subscribe
# banner (share 1.0), the content, and a footer that is shared
# 'copyright <source>' chrome for 2/3 of docs and a unique
# 'doc <id> footer' otherwise. The op must drop the first and the
# shared-footer variants and keep content + unique footers.
_BP_AUG_SQL = (
    "('subscribe to ' || source || ' newsletter | ' || text || ' | ' ||"
    " CASE WHEN doc_id % 3 = 0 THEN 'doc ' || doc_id || ' footer'"
    " ELSE 'copyright ' || source END)"
)


@register(
    "boilerplate_strip",
    f"""
    WITH aug AS (SELECT doc_id, source, {_BP_AUG_SQL} AS t FROM documents),
    lines AS (
      SELECT doc_id, source,
             unnest(string_split(t, ' | ')) AS line,
             unnest(range(1, len(string_split(t, ' | ')) + 1)) AS i
      FROM aug),
    freq AS (SELECT source, line, count(DISTINCT doc_id) AS nd
             FROM lines GROUP BY 1, 2),
    srcn AS (SELECT source, count(*) AS ns FROM documents GROUP BY 1),
    bp AS (SELECT f.source, f.line FROM freq f JOIN srcn s ON f.source = s.source
           WHERE f.nd::DOUBLE / s.ns >= 0.5),
    kept AS (SELECT l.doc_id, l.line, l.i FROM lines l
             ANTI JOIN bp b ON l.source = b.source AND l.line = b.line)
    SELECT doc_id,
           string_agg(line, ' | ' ORDER BY i) AS kept_text,
           count(*) AS n_kept,
           (3 - count(*))::BIGINT AS n_dropped
    FROM kept GROUP BY doc_id
    """,
)
def boilerplate_strip(spark, sf_dir):
    """Corpus-level boilerplate removal (the CCNet/trafilatura page-
    chrome step of a crawl->training-data pipeline): hash every line,
    count the fraction of the host's (source's) docs each line appears
    in, and strip lines shared by >= 50% of them — subscribe banners
    and copyright footers vanish, unique content and one-off footers
    survive, preserved in original order.

    Scale shape: posexplode -> two map-side-combinable hash aggs (per-
    (source, line) distinct-doc count; per-source doc count) -> the
    line-frequency table is TINY relative to the corpus (chrome repeats
    by definition) so the strip join broadcasts per-source boilerplate
    sets back at scan speed; no window over the corpus, the only
    per-doc ordering is the in-doc line index inside a hash-partitioned
    collect. At 100 TB the freq table is computed once per crawl round
    and reused. Reference analog: none — the reference stores raw
    scraped HTML text; this is the LLM-pipeline extension the graft
    calls for (SURVEY.md §2 pipeline ops)."""
    aug = F.concat(
        F.lit("subscribe to "),
        F.col("source"),
        F.lit(" newsletter | "),
        F.col("text"),
        F.lit(" | "),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("doc "), F.col("doc_id").cast("string"), F.lit(" footer")),
        ).otherwise(F.concat(F.lit("copyright "), F.col("source"))),
    )
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", aug.alias("t"))
    lines = d.select(
        "doc_id", "source", F.posexplode(F.split("t", r" \| ")).alias("i", "line")
    )
    freq = lines.groupBy("source", "line").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    srcn = (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("ns"))
    )
    bp = (
        freq.join(F.broadcast(srcn), "source")
        .filter(F.col("nd").cast("double") / F.col("ns") >= 0.5)
        .select("source", "line")
    )
    kept = lines.join(F.broadcast(bp), ["source", "line"], "left_anti")
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "line"))),
                lambda s: s["line"],
            ),
            " | ",
        ).alias("kept_text"),
        F.count("*").alias("n_kept"),
        (F.lit(3) - F.count("*")).cast("long").alias("n_dropped"),
    )


@register(
    "curation_keep_list",
    f"""
    WITH RECURSIVE
    fp AS (SELECT doc_id, {_MD5_INT_SQL.format(c='text')} AS content_fp
           FROM documents),
    ex AS (SELECT doc_id,
                  min(doc_id) OVER (PARTITION BY content_fp) AS exact_canon
           FROM fp),
    pairs AS ({_PAIRS_SQL}),
    und AS (SELECT a_id AS u, b_id AS v FROM pairs
            UNION SELECT b_id, a_id FROM pairs),
    reach(u, v) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.u, e.v FROM reach r JOIN und e ON r.v = e.u),
    comp AS (SELECT u AS doc_id, min(v) AS component_id FROM reach GROUP BY u),
    q AS ({_QSCORE_SQL}),
    jq AS (SELECT c.component_id, q.doc_id, q.qscore
           FROM comp c JOIN q ON c.doc_id = q.doc_id),
    best AS (SELECT component_id, max(qscore) AS best_qscore
             FROM jq GROUP BY component_id),
    canon AS (SELECT b.component_id, min(j.doc_id) AS canonical_id
              FROM best b JOIN jq j ON j.component_id = b.component_id
                                   AND j.qscore = b.best_qscore
              GROUP BY b.component_id),
    rep AS ({{REP_SQL}}),
    dec AS ({{DEC_SQL}}),
    reasons AS (
      SELECT e.doc_id,
             CASE
               WHEN e.doc_id <> e.exact_canon THEN 'exact_dup'
               WHEN cn.canonical_id <> e.doc_id THEN 'near_dup'
               WHEN e.doc_id < {DECON_PROBE_MAX_ID} THEN 'benchmark_probe'
               WHEN d.doc_id IS NOT NULL THEN 'contaminated'
               WHEN r.is_repetitive THEN 'repetitive'
               ELSE 'keep'
             END AS reason
      FROM ex e
      JOIN comp c ON c.doc_id = e.doc_id
      JOIN canon cn ON cn.component_id = c.component_id
      JOIN rep r ON r.doc_id = e.doc_id
      LEFT JOIN dec d ON d.doc_id = e.doc_id)
    SELECT doc_id, reason, (reason = 'keep') AS keep FROM reasons
    """.replace("{REP_SQL}", ORACLES["repetition_quality"]).replace(
        "{DEC_SQL}", ORACLES["benchmark_decontaminate"]
    ),
)
def curation_keep_list(spark, sf_dir):
    """THE curation decision a training pipeline actually ships: one
    keep/drop verdict per document with a prioritized reason code —
    exact_dup (not the min-id copy of its content hash) > near_dup
    (not its cluster's quality-argmax canonical, neardup_canonical_docs)
    > benchmark_probe (the held-out set itself, docs 0..9) >
    contaminated (shares an n-gram with the probe set,
    benchmark_decontaminate) > repetitive (Gopher gates,
    repetition_quality) > keep. Every constituent is a registered
    oracle-checked operator and the oracle composes their SQL verbatim
    as CTEs, so the keep list can never drift from the parts.

    Scale shape: strictly the union of its parts (each documented at
    its own registration) plus doc-keyed joins to assemble reasons —
    hash-partitioned on doc_id, no new window over the corpus (the
    exact-dup min runs per content_fp group, bounded by the largest
    exact-dup cluster). Reference analog: resolve_entities' merge
    verdicts (resolve_entities.py:225-301), promoted to corpus scale."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    w = Window.partitionBy("content_fp")
    ex = d.withColumn("content_fp", _md5_int(F.col("text"))).select(
        "doc_id", F.min("doc_id").over(w).alias("exact_canon")
    )
    comp = neardup_components(spark, sf_dir).localCheckpoint()
    canon = _canonical_docs(spark, sf_dir, comp).select(
        "component_id", "canonical_id"
    )
    nd = comp.join(canon, "component_id").select("doc_id", "canonical_id")
    rep = repetition_quality(spark, sf_dir).select("doc_id", "is_repetitive")
    dec = benchmark_decontaminate(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("is_contaminated")
    )
    reason = (
        F.when(F.col("doc_id") != F.col("exact_canon"), F.lit("exact_dup"))
        .when(F.col("canonical_id") != F.col("doc_id"), F.lit("near_dup"))
        .when(F.col("doc_id") < DECON_PROBE_MAX_ID, F.lit("benchmark_probe"))
        .when(F.col("is_contaminated"), F.lit("contaminated"))
        .when(F.col("is_repetitive"), F.lit("repetitive"))
        .otherwise(F.lit("keep"))
    )
    return (
        ex.join(nd, "doc_id")
        .join(rep, "doc_id")
        .join(dec, "doc_id", "left")
        .select("doc_id", reason.alias("reason"))
        .withColumn("keep", F.col("reason") == "keep")
    )


# ===========================================================================
# K. Round-3 batch VI: link-analysis completion (HITS beside PageRank)
# and the bigram step-up of the corpus-LM quality family.
# ===========================================================================

HITS_ITERS = 2

_HITS_GRAPH_SQL = """
    j AS (SELECT l_suppkey, o_custkey, l_returnflag
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
    edges AS (SELECT DISTINCT 's' || l_suppkey AS src, 'c' || o_custkey AS dst
              FROM j
              UNION ALL
              SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
              FROM j WHERE l_returnflag = 'R'),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)
"""


def _hits_iter_sql(k: int, prev_h: str) -> str:
    """One unrolled HITS iteration as oracle CTEs: raw authority from
    {prev_h} hubs, L2-normalize, raw hubs from the new authorities,
    L2-normalize."""
    return f"""
    a{k}r AS (SELECT e.dst AS node, sum(h.h) AS a
              FROM edges e JOIN {prev_h} h ON e.src = h.node GROUP BY 1),
    a{k}n AS (SELECT sqrt(sum(a * a)) AS z FROM a{k}r),
    a{k} AS (SELECT nodes.node,
                    coalesce(r.a, 0) / (SELECT z FROM a{k}n) AS a
             FROM nodes LEFT JOIN a{k}r r USING (node)),
    h{k}r AS (SELECT e.src AS node, sum(a.a) AS h
              FROM edges e JOIN a{k} a ON e.dst = a.node GROUP BY 1),
    h{k}n AS (SELECT sqrt(sum(h * h)) AS z FROM h{k}r),
    h{k} AS (SELECT nodes.node,
                    coalesce(r.h, 0) / (SELECT z FROM h{k}n) AS h
             FROM nodes LEFT JOIN h{k}r r USING (node))"""


@register(
    "host_hits",
    "WITH "
    + _HITS_GRAPH_SQL
    + ", h0 AS (SELECT node, 1.0 AS h FROM nodes),"
    + ",".join(_hits_iter_sql(k, f"h{k - 1}") for k in range(1, HITS_ITERS + 1))
    + f"""
    SELECT a.node, round(a.a, 6) AS authority, round(h.h, 6) AS hub
    FROM a{HITS_ITERS} a JOIN h{HITS_ITERS} h USING (node)
    """,
)
def host_hits(spark, sf_dir):
    """HITS hubs & authorities (Kleinberg 1999) — the second classic
    link-analysis score a crawl frontier consumes beside host_pagerank:
    authorities rank CONTENT hosts worth fetching deeply, hubs rank
    DIRECTORY/seed hosts worth re-expanding (the reference hardcodes
    this split as its two site queues — tracxn as hub-like seed lists,
    crunchbase as authority-like content pages,
    CrunchyCrawler/rabbitmq/scheduler.py:143-159; HITS derives it from
    the link structure instead). Same data-derived ship/return graph as
    host_pagerank (cycles + one-sided nodes, so zero-hub and
    zero-authority cases are exercised). HITS_ITERS mutual-
    reinforcement iterations, L2-normalized per half-step.

    Scale shape per iteration: two shuffle joins of the edge table
    against the node-sized score table (keyed src then dst — both grow
    with data, never broadcast), each followed by a map-side-combinable
    sum, plus two 1-row broadcast L2 normalizers riding crossJoins
    (bm25_topk's corpus-stats pattern). Scores are localCheckpoint'd
    per half-step so plan size stays O(1) in iterations — the same
    discipline as host_pagerank / _connected_components. The DuckDB
    oracle unrolls identical iterations as CTEs; round(,6) absorbs
    summation-order float noise (normalized scores ~1e-2, relative
    error ~1e-15)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_suppkey", "o_custkey", "l_returnflag"
    )
    s_node = F.concat(F.lit("s"), F.col("l_suppkey"))
    c_node = F.concat(F.lit("c"), F.col("o_custkey"))
    ship = j.select(s_node.alias("src"), c_node.alias("dst")).distinct()
    ret = (
        j.filter(F.col("l_returnflag") == "R")
        .select(c_node.alias("src"), s_node.alias("dst"))
        .distinct()
    )
    edges = ship.unionByName(ret).localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint()
    )
    hubs = nodes.select("node", F.lit(1.0).alias("h"))
    auth = None
    for _ in range(HITS_ITERS):
        ar = (
            edges.join(hubs.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("h").alias("a"))
        )
        az = ar.agg(F.sqrt(F.sum(F.col("a") * F.col("a"))).alias("z"))
        auth = (
            nodes.join(ar, "node", "left")
            .crossJoin(F.broadcast(az))
            .select(
                "node", (F.coalesce("a", F.lit(0.0)) / F.col("z")).alias("a")
            )
            .localCheckpoint()
        )
        hr = (
            edges.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("a").alias("h"))
        )
        hz = hr.agg(F.sqrt(F.sum(F.col("h") * F.col("h"))).alias("z"))
        hubs = (
            nodes.join(hr, "node", "left")
            .crossJoin(F.broadcast(hz))
            .select(
                "node", (F.coalesce("h", F.lit(0.0)) / F.col("z")).alias("h")
            )
            .localCheckpoint()
        )
    return auth.join(hubs, "node").select(
        "node",
        F.round("a", 6).alias("authority"),
        F.round("h", 6).alias("hub"),
    )


BIGRAM_LAMBDA = 0.7  # interpolation weight on the bigram component
BIGRAM_OUTLIER = -7.0  # mean ln p below this flags a doc as gibberish


@register(
    "bigram_logprob_quality",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_RAW_SQL} AS toks FROM documents),
    uni AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    ufr AS (SELECT tok, count(*) AS ufreq FROM uni GROUP BY tok),
    tot AS (SELECT sum(ufreq)::DOUBLE AS n_total FROM ufr),
    b AS (SELECT doc_id,
                 unnest(toks[1:len(toks) - 1]) AS w1,
                 unnest(toks[2:len(toks)]) AS w2
          FROM t WHERE len(toks) >= 2),
    tfb AS (SELECT doc_id, w1, w2, count(*) AS tfb FROM b GROUP BY 1, 2, 3),
    bfr AS (SELECT w1, w2, sum(tfb) AS bfreq FROM tfb GROUP BY 1, 2),
    ctx AS (SELECT w1, sum(bfreq)::DOUBLE AS cfreq FROM bfr GROUP BY 1),
    s AS (SELECT tfb.doc_id, tfb.tfb,
                 ln({BIGRAM_LAMBDA} * (bfr.bfreq / ctx.cfreq)
                    + {1 - BIGRAM_LAMBDA} * (ufr.ufreq / tot.n_total)) AS lp
          FROM tfb JOIN bfr USING (w1, w2) JOIN ctx USING (w1)
                   JOIN ufr ON tfb.w2 = ufr.tok CROSS JOIN tot)
    SELECT doc_id, sum(tfb)::BIGINT AS n_bigrams,
           round(sum(tfb * lp) / sum(tfb), 4) AS avg_logprob,
           (round(sum(tfb * lp) / sum(tfb), 4) < {BIGRAM_OUTLIER}) AS is_outlier
    FROM s GROUP BY doc_id
    """,
)
def bigram_logprob_quality(spark, sf_dir):
    """Interpolated bigram-LM quality score — the step up from
    unigram_logprob_quality toward the KenLM-style n-gram perplexity
    filter every production pipeline (CCNet, Gopher, RefinedWeb) runs:
    p(w2|w1) = BIGRAM_LAMBDA·(bigram freq / context freq) +
    (1-BIGRAM_LAMBDA)·(unigram freq / total), both LMs fit on the
    corpus itself; each doc scores the mean ln p over its bigram
    instances. Word order now matters — a doc of common words in alien
    order scores low where the unigram LM cannot see anything wrong.
    Docs with < 2 tokens have no bigrams and drop out (inner-join
    semantics, stated in both engines).

    Scale shape: the tokenized corpus is materialized ONCE
    (localCheckpoint; at 100 TB a persisted table) and feeds both
    explodes — unigram instances and zipped bigram instances — so raw
    text is scanned a single time. All LM tables derive by
    map-side-combinable aggs: (doc,w1,w2) tf, corpus bigram freq,
    context freq (sum over the BIGRAM table, never a corpus re-scan),
    unigram freq. Scoring joins are keyed on token/bigram and
    deliberately NOT broadcast (vocab and bigram-vocab grow with the
    corpus — Heap's law, same reasoning as unigram_logprob_quality);
    the 1-row grand total rides a broadcast cross join. Rounding to
    4 dp happens BEFORE the outlier compare in both engines so the
    flag can never straddle a float ulp."""
    toks = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.split(F.lower("text"), r"\s+").alias("toks"))
        .localCheckpoint()
    )
    uni = toks.select("doc_id", F.explode("toks").alias("tok"))
    ufr = uni.groupBy("tok").agg(F.count("*").alias("ufreq"))
    tot = ufr.agg(F.sum("ufreq").cast("double").alias("n_total"))
    big = (
        toks.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    # materialized once: feeds corpus bigram freq, context freq, and the
    # per-doc scoring join (otherwise each consumer re-explodes the corpus)
    tfb = big.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("tfb"))
    tfb = tfb.localCheckpoint()
    bfr = tfb.groupBy("w1", "w2").agg(F.sum("tfb").alias("bfreq"))
    ctx = bfr.groupBy("w1").agg(F.sum("bfreq").cast("double").alias("cfreq"))
    lp = F.log(
        F.lit(BIGRAM_LAMBDA) * (F.col("bfreq") / F.col("cfreq"))
        + F.lit(1 - BIGRAM_LAMBDA) * (F.col("ufreq") / F.col("n_total"))
    )
    mean_lp = F.round(F.sum(F.col("tfb") * lp) / F.sum("tfb"), 4)
    return (
        tfb.join(bfr, ["w1", "w2"])
        .join(ctx, "w1")
        .join(ufr.withColumnRenamed("tok", "w2"), "w2")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum("tfb").alias("n_bigrams"),
            mean_lp.alias("avg_logprob"),
            (mean_lp < BIGRAM_OUTLIER).alias("is_outlier"),
        )
    )


@register(
    "robots_policy",
    """
    WITH r AS (
      SELECT 'sup' || s_suppkey::VARCHAR || '.example.com' AS host,
             CASE s_suppkey % 6
               WHEN 0 THEN NULL
               WHEN 1 THEN e'User-agent: *\\nCrawl-delay: '
                           || (s_suppkey % 10)::VARCHAR
                           || e'\\nDisallow: /private\\n'
               WHEN 2 THEN e'User-agent: *\\nDisallow: /\\n'
               WHEN 3 THEN e'User-agent: googlebot\\nCrawl-delay: 1\\n\\n'
                           || e'User-agent: *\\nCrawl-delay: 2.5\\nDisallow: /tmp\\n'
               WHEN 4 THEN e'User-agent: *\\nCrawl-delay: '
                           || (s_suppkey % 10)::VARCHAR
                           || e'\\nDisallow: /ok\\nUser-agent: badbot\\nDisallow: /\\n'
               ELSE 'garbage ###'
             END AS robots_txt
      FROM supplier),
    l AS (SELECT host, lower(coalesce(robots_txt, '')) AS t FROM r),
    sec AS (SELECT host,
                   regexp_replace(
                     coalesce(list_filter(string_split(t, 'user-agent:'),
                                          p -> regexp_matches(p, '^\\s*\\*\\s*\\n'))[1],
                              ''),
                     '^\\s*\\*\\s*\\n', '') AS section
            FROM l)
    SELECT host,
           CASE WHEN regexp_extract(section,
                  'crawl-delay:\\s*([0-9]+(?:\\.[0-9]+)?)', 1) = ''
                THEN 5.0
                ELSE regexp_extract(section,
                  'crawl-delay:\\s*([0-9]+(?:\\.[0-9]+)?)', 1)::DOUBLE
           END AS crawl_delay_s,
           NOT regexp_matches(section, '(?m)^\\s*disallow:\\s*/\\s*$') AS robots_allow
    FROM sec
    """,
)
def robots_policy(spark, sf_dir):
    """robots.txt -> host-policy parsing as a driver-oracled QUERY
    surface (the engine path is robots.parse_robots, exercised by
    tests/test_robots.py and the crawl loop; north_rule: "per-host
    politeness buckets (crawl-delay, robots.txt cache)"). A
    deterministic robots corpus is synthesized per supplier host —
    six variants covering: absent file (permissive default), plain
    crawl-delay, Disallow-all, a star section AFTER a more specific
    bot's section (section isolation), a star section FOLLOWED by a
    disallowing bot section (boundary containment — the later
    'Disallow: /' must not leak into the star policy), and unparseable
    garbage (falls back to defaults, a crawler must stay polite on odd
    robots.txt). The SAME parse_robots the engine broadcasts each
    round does the parsing — pure regexp_extract/rlike column
    expressions, zero per-row Python, linear scan shape at any scale.

    The DuckDB twin cannot use the parser's lookahead section regex
    (RE2) — it isolates the star section by string_split on
    'user-agent:' instead, which defines the identical boundary; the
    crawl-delay and disallow-all regexes are shared verbatim. Values
    are exact doubles (no rounding needed: defaults and small decimal
    literals)."""
    from .robots import parse_robots

    s = _t(spark, sf_dir, "supplier").select("s_suppkey")
    k = F.col("s_suppkey")
    digit = (k % 10).cast("string")
    txt = (
        F.when(k % 6 == 0, F.lit(None).cast("string"))
        .when(
            k % 6 == 1,
            F.concat(
                F.lit("User-agent: *\nCrawl-delay: "),
                digit,
                F.lit("\nDisallow: /private\n"),
            ),
        )
        .when(k % 6 == 2, F.lit("User-agent: *\nDisallow: /\n"))
        .when(
            k % 6 == 3,
            F.lit(
                "User-agent: googlebot\nCrawl-delay: 1\n\n"
                "User-agent: *\nCrawl-delay: 2.5\nDisallow: /tmp\n"
            ),
        )
        .when(
            k % 6 == 4,
            F.concat(
                F.lit("User-agent: *\nCrawl-delay: "),
                digit,
                F.lit("\nDisallow: /ok\nUser-agent: badbot\nDisallow: /\n"),
            ),
        )
        .otherwise(F.lit("garbage ###"))
    )
    host = F.concat(F.lit("sup"), k.cast("string"), F.lit(".example.com"))
    return parse_robots(s.select(host.alias("host"), txt.alias("robots_txt")))


@register(
    "sitemap_extract",
    """
    WITH r AS (
      SELECT 'sup' || s_suppkey::VARCHAR || '.example.com' AS host,
             '<?xml version="1.0"?><urlset>' ||
             array_to_string(list_transform(range(1, s_suppkey % 3 + 2),
               j -> '<url><loc>https://sup' || s_suppkey::VARCHAR
                    || '.example.com/page/' || j::VARCHAR
                    || '</loc><lastmod>2026-05-0' || j::VARCHAR
                    || '</lastmod></url>'), '')
             || '</urlset>' AS xml
      FROM supplier),
    e AS (SELECT host,
                 regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1) AS locs,
                 regexp_extract_all(xml, '<lastmod>([^<]*)</lastmod>', 1) AS mods
          FROM r)
    SELECT host, unnest(locs) AS url, unnest(mods) AS lastmod FROM e
    """,
)
def sitemap_extract(spark, sf_dir):
    """Sitemap ingestion — the crawl seed-expansion source every
    production frontier consumes beside operator-submitted seeds (S1)
    and in-page link expansion (expand.py): parse sitemap XML into
    (host, url, lastmod) rows ready for frontier ingest. The reference
    has no sitemap path (its seeds arrive via POST /createCrawl,
    api/views.py:19-42); north_rule's from-scratch frontier gets the
    standard one. A deterministic sitemap corpus is synthesized per
    supplier host (1-3 <url> entries each); extraction is
    regexp_extract_all over <loc>/<lastmod> + a positional zip-explode
    — pure column expressions, linear scan shape, no XML lib and no
    per-row Python (real-world sitemaps are shallow enough that regex
    extraction is what crawlers actually ship for the fast path;
    Spark's xpath_* SQL functions are the strict-XML alternative).
    lastmod stays a string (date equality is exact cross-engine; the
    frontier's recrawl logic consumes it via recrawl_schedule)."""
    s = _t(spark, sf_dir, "supplier").select("s_suppkey")
    k = F.col("s_suppkey")
    ks = k.cast("string")
    host = F.concat(F.lit("sup"), ks, F.lit(".example.com"))
    xml = F.concat(
        F.lit('<?xml version="1.0"?><urlset>'),
        F.expr(
            "array_join(transform(sequence(1, s_suppkey % 3 + 1), j -> concat("
            "'<url><loc>https://sup', cast(s_suppkey as string),"
            "'.example.com/page/', cast(j as string),"
            "'</loc><lastmod>2026-05-0', cast(j as string),"
            "'</lastmod></url>')), '')"
        ),
        F.lit("</urlset>"),
    )
    r = s.select(host.alias("host"), xml.alias("xml"))
    e = r.select(
        "host",
        F.expr("regexp_extract_all(xml, '<loc>([^<]*)</loc>', 1)").alias("locs"),
        F.expr(
            "regexp_extract_all(xml, '<lastmod>([^<]*)</lastmod>', 1)"
        ).alias("mods"),
    ).withColumn("z", F.explode(F.arrays_zip("locs", "mods")))
    return e.select(
        "host", F.col("z.locs").alias("url"), F.col("z.mods").alias("lastmod")
    )


# ===========================================================================
# R3 batch VII: fully-oracled binary-payload op + SURT CDX-style URL index
# ===========================================================================
_IMAGES_BIN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "images_bin.parquet",
)

_HEXD = "0123456789ABCDEF"


def _hexpair_sql(h: str, i: int) -> str:
    """DuckDB int value of the hex byte at 1-based char offset ``i``."""
    return (
        f"((strpos('{_HEXD}', substr({h},{i},1))-1)*16"
        f" + (strpos('{_HEXD}', substr({h},{i+1},1))-1))"
    )


def _le16_sql(h: str, i: int) -> str:
    """DuckDB little-endian uint16 whose low byte starts at char ``i``."""
    return f"({_hexpair_sql(h, i + 2)}*256 + {_hexpair_sql(h, i)})"


@register(
    "image_header_sniff",
    f"""
    WITH b AS (SELECT image_id, fmt, w, h, bytes
               FROM read_parquet('{_IMAGES_BIN}')),
    hx AS (SELECT image_id, fmt, w, h,
                  octet_length(bytes) AS payload_len,
                  substr(hex(bytes), 1, 18) AS hdr
           FROM b),
    d AS (SELECT *,
      CASE substr(hdr, 1, 8) WHEN '43534C30' THEN 'png'
                             WHEN '43535930' THEN 'jpeg'
                             ELSE 'unknown' END AS fmt_sniffed,
      {_le16_sql('hdr', 9)} AS hdr_w,
      {_le16_sql('hdr', 13)} AS hdr_h,
      {_hexpair_sql('hdr', 17)} AS channels
      FROM hx)
    SELECT image_id, fmt_sniffed, hdr_w, hdr_h, channels, payload_len,
           (fmt_sniffed = fmt AND hdr_w = w AND hdr_h = h) AS meta_match,
           (payload_len * 1000) // (hdr_w * hdr_h * channels) AS bytes_per_kpx
    FROM d
    """,
)
def image_header_sniff(spark, sf_dir):
    """Magic-byte MIME sniff + header field extraction over raw payload
    bytes — ENTIRELY JVM-side (hex + substring + conv column expressions
    on the binary column; zero Python, zero decode). This is the
    fetch-pipeline gate that runs BEFORE any expensive decode: classify
    the container from its magic (CSL0/CSY0 here; JPEG's FFD8FF / PNG's
    89504E47 in production — same expressions, different literals),
    parse the little-endian w/h/channels header, and flag payloads whose
    header disagrees with the catalog metadata (corrupt or mislabeled
    fetches get dropped without ever reaching the decoder).

    First BINARY op with a full DuckDB value-hash oracle (the committed
    fixtures/images_bin.parquet carries the payload bytes; all prior
    image ops were rows-only): both engines parse the same 9 header
    bytes from hex text. Spark substrings the BINARY first (9 bytes ->
    18 hex chars; the scan never widens the payload), DuckDB hexes the
    blob then substrs — this DuckDB build lacks substring-on-BLOB.

    At 100 TB: linear scan, no shuffle, and the binary column's only
    materialization is a 9-byte slice — the sniff runs at IO speed.
    bytes_per_kpx (integer permille, exact cross-engine) is the
    compression-ratio facet that feeds size-anomaly triage (truncated
    zlib streams land far below the fleet's per-format band).
    Reference: Crunchy trusts Content-Type and scrapy's decode
    (spiders/crunchy.py fetch callbacks); the from-scratch engine
    sniffs, per north_rule's fetched image+caption payload table.
    Ignores sf_dir: payload universe is the committed image fixture."""
    b = spark.read.parquet(_IMAGES_BIN)
    hdr = F.hex(F.expr("substring(bytes, 1, 9)"))
    d = b.select(
        "image_id",
        "fmt",
        "w",
        "h",
        F.length("bytes").cast("long").alias("payload_len"),
        hdr.alias("hdr"),
    ).select(
        "image_id",
        "fmt",
        "w",
        "h",
        "payload_len",
        F.when(F.substring("hdr", 1, 8) == "43534C30", "png")
        .when(F.substring("hdr", 1, 8) == "43535930", "jpeg")
        .otherwise("unknown")
        .alias("fmt_sniffed"),
        F.conv(
            F.concat(F.substring("hdr", 11, 2), F.substring("hdr", 9, 2)), 16, 10
        )
        .cast("long")
        .alias("hdr_w"),
        F.conv(
            F.concat(F.substring("hdr", 15, 2), F.substring("hdr", 13, 2)), 16, 10
        )
        .cast("long")
        .alias("hdr_h"),
        F.conv(F.substring("hdr", 17, 2), 16, 10).cast("long").alias("channels"),
    )
    return d.select(
        "image_id",
        "fmt_sniffed",
        "hdr_w",
        "hdr_h",
        "channels",
        "payload_len",
        (
            (F.col("fmt_sniffed") == F.col("fmt"))
            & (F.col("hdr_w") == F.col("w"))
            & (F.col("hdr_h") == F.col("h"))
        ).alias("meta_match"),
        F.floor(
            (F.col("payload_len") * 1000)
            / (F.col("hdr_w") * F.col("hdr_h") * F.col("channels"))
        ).alias("bytes_per_kpx"),
    )


SURT_BLOCK = 256  # URLs per index block (cluster.idx granularity)


@register(
    "surt_url_index",
    f"""
    WITH u AS (
      SELECT o_orderkey AS seq,
             'h' || (o_custkey % 40)::VARCHAR || '.s'
             || (o_orderkey % 3)::VARCHAR || '.crunchbase.com' AS host,
             '/organization/co-' || (o_orderkey % 3000)::VARCHAR AS path
      FROM orders),
    s AS (SELECT seq,
                 array_to_string(list_reverse(string_split(host, '.')), ',')
                 || ')' || path AS surt_key
          FROM u),
    r AS (SELECT surt_key, seq,
                 row_number() OVER (ORDER BY surt_key, seq) AS rnk
          FROM s)
    SELECT (rnk - 1) // {SURT_BLOCK} AS block_id,
           count(*) AS n_urls,
           min(surt_key) AS key_min,
           max(surt_key) AS key_max
    FROM r GROUP BY 1
    """,
)
def surt_url_index(spark, sf_dir):
    """SURT-ordered URL index manifest — the Common-Crawl-CDX-style
    secondary index a 10^10-URL frontier needs for prefix lookups
    ("every URL under host X / domain Y"): canonical sort key =
    reversed host labels joined by commas + ')' + path (SURT), global
    total order over that key, then fixed-size blocks with (key_min,
    key_max, n_urls) per block — the driver-sized manifest (cluster.idx
    analog) that routes a prefix query to the one block-range that can
    contain it.

    Scale shape: the global order comes from global_fifo_rank
    (frontier.py) — repartitionByRange + per-partition row_number + a
    32-row offset census, Spark's parallel total sort — NOT a
    single-partition Window.orderBy. Block stats are a map-side-
    combinable groupBy on (rnk div {SURT_BLOCK}). The reference keeps no
    URL index at all (Mongo find-by-url only, crunchyapp/models.py);
    north_rule's Iceberg frontier gets range metadata for free once
    rows are written in SURT order — this query IS that write-order
    plan plus its manifest."""
    from .frontier import global_fifo_rank

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    host = F.concat(
        F.lit("h"),
        (F.col("o_custkey") % 40).cast("string"),
        F.lit(".s"),
        (F.col("o_orderkey") % 3).cast("string"),
        F.lit(".crunchbase.com"),
    )
    path = F.concat(
        F.lit("/organization/co-"), (F.col("o_orderkey") % 3000).cast("string")
    )
    s = o.select(
        F.col("o_orderkey").alias("seq"),
        F.concat(
            F.concat_ws(",", F.reverse(F.split(host, "\\."))), F.lit(")"), path
        ).alias("surt_key"),
    )
    r = global_fifo_rank(s, ("surt_key", "seq"), "rnk")
    return (
        r.groupBy(F.floor((F.col("rnk") - 1) / SURT_BLOCK).alias("block_id"))
        .agg(
            F.count("*").alias("n_urls"),
            F.min("surt_key").alias("key_min"),
            F.max("surt_key").alias("key_max"),
        )
    )


# ===========================================================================
# R3 batch VIII: WARC-style byte-offset index, conditional-GET revalidation
# planning, and the language-ID confusion matrix
# ===========================================================================
WARC_SHARD_BUDGET = 131_072  # stored payload bytes per archive shard


@register(
    "warc_offset_index",
    f"""
    WITH b AS (SELECT image_id, fmt, octet_length(bytes)::BIGINT AS length
               FROM read_parquet('{_IMAGES_BIN}')),
    c AS (SELECT *,
            coalesce(sum(length) OVER (PARTITION BY fmt ORDER BY image_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM b),
    s AS (SELECT *, (cum_before // {WARC_SHARD_BUDGET})::BIGINT AS shard_id FROM c)
    SELECT image_id, fmt, shard_id,
           (cum_before - min(cum_before) OVER (PARTITION BY fmt, shard_id))::BIGINT
             AS offset,
           length
    FROM s
    """,
)
def warc_offset_index(spark, sf_dir):
    """WARC/CDX-style byte-offset index over the REAL stored payload
    bytes: records pack contiguously in (fmt, image_id) order into
    {WARC_SHARD_BUDGET}-byte archive shards, and every record gets its
    (shard_id, offset, length) — the random-access index that lets a
    trainer or re-parser fetch ONE record from a multi-TB archive with
    a single ranged read (Common Crawl serves exactly this triple per
    CDX line: filename/offset/length). image_shard_pack is the
    manifest (one row per shard); this is the per-record read index.

    Scale shape: the running sum reuses the two-phase range-sort +
    census-offset machinery (_per_lang_cumsum_before) — no
    single-partition window over the corpus; the only windows in the
    final plan are shard-bounded (min(cum_before) per (fmt, shard_id),
    at most a shard's records per group). lengths come from
    octet_length of the committed payload fixture, so the oracle
    hash-matches real byte math, not estimates. The reference archives
    nothing (items go to Mongo, models.py); north_rule's fetched-
    payload table needs replayable storage. Ignores sf_dir (payload
    universe is the committed image fixture)."""
    b = spark.read.parquet(_IMAGES_BIN).select(
        F.col("fmt").alias("lang"),
        F.col("image_id").alias("doc_id"),
        F.length("bytes").cast("long").alias("n_tok"),
    )
    c = _per_lang_cumsum_before(b)
    s = c.select(
        F.col("doc_id").alias("image_id"),
        F.col("lang").alias("fmt"),
        F.col("n_tok").alias("length"),
        F.col("cum_before"),
        F.expr(f"cum_before div {WARC_SHARD_BUDGET}").alias("shard_id"),
    )
    w = Window.partitionBy("fmt", "shard_id")
    return s.select(
        "image_id",
        "fmt",
        "shard_id",
        (F.col("cum_before") - F.min("cum_before").over(w)).alias("offset"),
        "length",
    )


@register("etag_revalidate_plan", None)  # oracle composed below (reuses sitemap CTE)
def etag_revalidate_plan(spark, sf_dir):
    """Conditional-GET revalidation planning — the freshness decision a
    recrawler makes per known URL once sitemap lastmod metadata exists
    (sitemap_extract) and fetch history accumulates (recrawl_schedule's
    input): never-fetched URLs get a full fetch; URLs whose sitemap
    lastmod is newer than the last fetch revalidate with
    If-None-Match when an ETag was stored (a 304 costs headers only)
    and re-fetch fully otherwise; URLs with no newer lastmod are
    skipped this cycle. Bandwidth math at 10^10 URLs: the skip + 304
    classes are the difference between a refresh crawl that moves the
    whole corpus and one that moves the changed slice.

    Deterministic fetch history is synthesized per URL from its host/
    page ids ((k + j) % 7 == 0 never fetched; last_fetch day =
    (k*3 + j) % 4 + 1; ETag stored iff k % 2 == 0 — decoupled from the
    k % 3 page-count key so hosts with newer lastmod pages exist on
    BOTH sides of the ETag split) against the sitemap
    lastmod days 1..3 — ISO date strings compare lexicographically in
    both engines. Plan shape: one projection over sitemap_extract's
    rows, zero joins (history is derived, not looked up — the engine's
    real history join is recrawl_schedule's lag-window path).
    Reference: Crunchy refetches unconditionally (no ETag/lastmod
    anywhere in spiders/); north_rule's politeness budget makes
    conditional revalidation the scale path."""
    sm = QUERIES["sitemap_extract"](spark, sf_dir)
    k = F.regexp_extract("host", r"^sup(\d+)\.", 1).cast("long")
    j = F.regexp_extract("url", r"/page/(\d+)$", 1).cast("long")
    fetched = (k + j) % 7 != 0
    last_fetch = F.when(
        fetched, F.concat(F.lit("2026-05-0"), ((k * 3 + j) % 4 + 1).cast("string"))
    )
    has_etag = fetched & (k % 2 == 0)
    action = (
        F.when(~fetched, F.lit("fetch_full"))
        .when(
            F.col("lastmod") > last_fetch,
            F.when(has_etag, F.lit("conditional_get")).otherwise(F.lit("fetch_full")),
        )
        .otherwise(F.lit("skip"))
    )
    return sm.select(
        "url",
        "lastmod",
        last_fetch.alias("last_fetch"),
        has_etag.alias("has_etag"),
        action.alias("action"),
    )


ORACLES["etag_revalidate_plan"] = f"""
    WITH sm AS ({ORACLES["sitemap_extract"]}),
    d AS (SELECT url, lastmod,
                 regexp_extract(host, '^sup(\\d+)\\.', 1)::BIGINT AS k,
                 regexp_extract(url, '/page/(\\d+)$', 1)::BIGINT AS j
          FROM sm),
    h AS (SELECT url, lastmod,
                 ((k + j) % 7 != 0) AS fetched,
                 CASE WHEN (k + j) % 7 != 0
                      THEN '2026-05-0' || ((k*3 + j) % 4 + 1)::VARCHAR END AS last_fetch,
                 (((k + j) % 7 != 0) AND k % 2 = 0) AS has_etag
          FROM d)
    SELECT url, lastmod, last_fetch, has_etag,
           CASE WHEN NOT fetched THEN 'fetch_full'
                WHEN lastmod > last_fetch AND has_etag THEN 'conditional_get'
                WHEN lastmod > last_fetch THEN 'fetch_full'
                ELSE 'skip' END AS action
    FROM h
    """


@register("lang_confusion", None)  # oracle composed below (reuses lang_id CTE)
def lang_confusion(spark, sf_dir):
    """Language-ID evaluation: the (true lang x predicted lang)
    confusion matrix with each cell's share of its true language — the
    monitoring table that tells a curation pipeline WHERE its lang-ID
    heuristic leaks (e.g. 'de docs misrouted to en' directly sizes the
    contamination of the en training mix). Composes the registered
    lang_id operator verbatim (its oracle SQL is reused as a CTE, so
    this table cannot drift from the classifier it audits — the
    curation_keep_list discipline applied to evaluation).

    Plan shape: one map-side-combinable agg on (lang, pred_lang) over
    lang_id's projection; the share window runs over the AGGREGATED
    <=n_langs^2-row table, never the corpus."""
    li = QUERIES["lang_id"](spark, sf_dir)
    agg = li.groupBy("lang", "pred_lang").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang")
    return agg.select(
        "lang",
        "pred_lang",
        "n",
        F.round(F.col("n") / F.sum("n").over(w), 4).alias("share_of_lang"),
    )


ORACLES["lang_confusion"] = f"""
    WITH li AS ({ORACLES["lang_id"]}),
    agg AS (SELECT lang, pred_lang, count(*) AS n FROM li GROUP BY lang, pred_lang)
    SELECT lang, pred_lang, n,
           round(n::DOUBLE / sum(n) OVER (PARTITION BY lang), 4) AS share_of_lang
    FROM agg
    """


# ===========================================================================
# K. Round-3 continuation: redirect resolution, per-IP politeness,
#    zero-shot prototype matching, SURT index lookup
# ===========================================================================
# Deterministic redirect edges over the documents universe (the corpus
# carries no redirect table, so both engines derive the SAME functional
# graph from doc_id arithmetic — the _PII_AUG_SQL discipline):
#   doc_id % 5 in (1,2,3)            -> doc_id - 1   (chains, depth 1..3)
#   doc_id % 10 = 4 and id+5 <= max  -> doc_id + 5   (2-cycle, one half)
#   doc_id % 10 = 9                  -> doc_id - 5   (2-cycle, other half)
#   doc_id % 5 = 0                   -> terminal page (no out-edge)
# Every src has at most ONE out-edge (the rules are disjoint), so the
# edge set is a functional graph: chains end at a terminal, the %10∈{4,9}
# rows form 2-cycles (redirect loops a crawler must detect and drop).
REDIRECT_MAX_HOPS = 8  # designed max real chain = 3; cap bounds the walk


def _redirect_edges(docs: DataFrame) -> DataFrame:
    """(src, dst) redirect edges derived from doc_id arithmetic (rules
    above). mx rides a 1-row broadcast so the boundary rule (the d+5
    half-cycle needs its partner to exist) never re-scans the corpus."""
    mx = docs.agg(F.max("doc_id").alias("mx"))
    d = docs.crossJoin(F.broadcast(mx))
    dst = (
        F.when(F.col("doc_id") % 5 < 4, F.col("doc_id") - 1)  # %5 in 1,2,3 (src-filtered)
        .when(
            (F.col("doc_id") % 10 == 4) & (F.col("doc_id") + 5 <= F.col("mx")),
            F.col("doc_id") + 5,
        )
        .when(F.col("doc_id") % 10 == 9, F.col("doc_id") - 5)
    )
    return (
        d.filter(
            (F.col("doc_id") % 5).isin(1, 2, 3)
            | ((F.col("doc_id") % 10 == 4) & (F.col("doc_id") + 5 <= F.col("mx")))
            | (F.col("doc_id") % 10 == 9)
        )
        .select(F.col("doc_id").alias("src"), dst.alias("dst"))
    )


_REDIRECT_EDGE_SQL = """
    SELECT doc_id AS src,
           CASE WHEN doc_id % 5 IN (1, 2, 3) THEN doc_id - 1
                WHEN doc_id % 10 = 4 AND doc_id + 5 <= mx.mx THEN doc_id + 5
                WHEN doc_id % 10 = 9 THEN doc_id - 5 END AS dst
    FROM documents CROSS JOIN (SELECT max(doc_id) AS mx FROM documents) mx
    WHERE doc_id % 5 IN (1, 2, 3)
       OR (doc_id % 10 = 4 AND doc_id + 5 <= mx.mx)
       OR doc_id % 10 = 9
"""


@register(
    "redirect_resolve",
    f"""
    WITH RECURSIVE e AS ({_REDIRECT_EDGE_SQL}),
    walk(src, cur, hops) AS (
      SELECT src, dst, 1 FROM e
      UNION ALL
      SELECT w.src, e.dst, w.hops + 1
      FROM walk w JOIN e ON w.cur = e.src
      WHERE w.hops < {REDIRECT_MAX_HOPS}),
    term AS (SELECT w.src, w.cur, w.hops
             FROM walk w LEFT JOIN e ON w.cur = e.src
             WHERE e.src IS NULL)
    SELECT d.doc_id,
           CASE WHEN e0.src IS NULL THEN 'final'
                WHEN t.src IS NOT NULL THEN 'redirect'
                ELSE 'loop' END AS status,
           CASE WHEN e0.src IS NULL THEN d.doc_id ELSE t.cur END AS final_id,
           CASE WHEN e0.src IS NULL THEN 0 ELSE t.hops END AS n_hops
    FROM documents d
    LEFT JOIN e e0 ON d.doc_id = e0.src
    LEFT JOIN term t ON d.doc_id = t.src
    """,
)
def redirect_resolve(spark, sf_dir):
    """Redirect-chain resolution over a functional redirect graph:
    every page resolves to its FINAL landing page with the exact hop
    count, and redirect LOOPS are detected and flagged (status='loop',
    null final) — the batch form of what a fetcher does serially per
    request. The reference crawls through scrapy, whose default
    RedirectMiddleware follows each chain request-at-a-time and aborts
    on cycles (CrunchyCrawler/settings.py sets no REDIRECT_* override,
    so the scrapy defaults apply); at 10^10-URL scale the frontier
    instead resolves ALL chains set-at-a-time before scheduling, so the
    fetch budget is never spent re-walking known 301 hops and loop URLs
    never enter the queue.

    Plan shape: pointer DOUBLING, not step-at-a-time walking —
    ceil(log2({REDIRECT_MAX_HOPS})) = 3 self-join rounds resolve every
    chain up to {REDIRECT_MAX_HOPS} hops (designed max = 3), each round
    one equi-join keyed on the current target, mappings
    localCheckpoint'd per round so the plan stays O(1) in rounds (the
    _connected_components discipline, applied to a DIRECTED functional
    graph with exact hop accounting: hops add across a jump). Cycle
    rows can never reach a terminal; they are flagged afterward by one
    semi-join of the final target against the source set — no
    visited-set state, no driver loop over rows. The DuckDB oracle
    walks the SAME edge SQL with a recursive CTE capped at
    {REDIRECT_MAX_HOPS} hops, so the hash-match proves chains, hop
    counts, AND loop flags."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    e = _redirect_edges(docs).localCheckpoint()  # materialized: reused per round
    m = e.select("src", F.col("dst").alias("cur"), F.lit(1).cast("long").alias("hops"))
    for _ in range(3):  # doubling: resolves chains up to 2^3 = REDIRECT_MAX_HOPS
        j = m.select(
            F.col("src").alias("jsrc"),
            F.col("cur").alias("jcur"),
            F.col("hops").alias("jhops"),
        )
        m = (
            m.join(j, m["cur"] == j["jsrc"], "left")
            .select(
                "src",
                F.coalesce("jcur", "cur").alias("cur"),
                (F.col("hops") + F.coalesce("jhops", F.lit(0))).alias("hops"),
            )
            .localCheckpoint()
        )
    srcs = e.select(F.col("src").alias("cur")).distinct()
    resolved = m.join(srcs, "cur", "left_anti")  # cycle rows never terminate
    return (
        docs.join(e.select("src").withColumnRenamed("src", "doc_id").distinct()
                  .withColumn("_has_edge", F.lit(True)), "doc_id", "left")
        .join(
            resolved.select(
                F.col("src").alias("doc_id"),
                F.col("cur").alias("_final"),
                F.col("hops").alias("_hops"),
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.when(F.col("_has_edge").isNull(), F.lit("final"))
            .when(F.col("_final").isNotNull(), F.lit("redirect"))
            .otherwise(F.lit("loop"))
            .alias("status"),
            F.when(F.col("_has_edge").isNull(), F.col("doc_id"))
            .otherwise(F.col("_final"))
            .alias("final_id"),
            F.when(F.col("_has_edge").isNull(), F.lit(0).cast("long"))
            .otherwise(F.col("_hops"))
            .alias("n_hops"),
        )
    )


N_VHOSTS = 200  # customer-derived virtual hosts
N_IPS = 24  # physical servers those vhosts resolve to
IP_BUDGET = 720  # fetch slots per IP per round (politeness_schedule's 720/host)


@register(
    "host_ip_politeness",
    f"""
    WITH h AS (SELECT 'h' || (c_custkey % {N_VHOSTS})::VARCHAR AS host,
                      count(*) AS pending
               FROM customer GROUP BY 1),
    hi AS (SELECT host, pending,
                  '10.0.0.' || ({_MD5_INT_SQL.format(c="host")} % {N_IPS})::VARCHAR
                    AS ip
           FROM h),
    g AS (SELECT *, sum(pending) OVER (PARTITION BY ip) AS ip_pending,
                 count(*) OVER (PARTITION BY ip) AS n_hosts_on_ip
          FROM hi),
    b AS (SELECT *, least({IP_BUDGET}, ip_pending) AS give FROM g),
    f AS (SELECT *, (give * pending) // ip_pending AS floor_alloc,
                 (give * pending) % ip_pending AS rem
          FROM b),
    r AS (SELECT *,
                 row_number() OVER (PARTITION BY ip ORDER BY rem DESC, host) AS rk,
                 give - sum(floor_alloc) OVER (PARTITION BY ip) AS leftover
          FROM f)
    SELECT host, ip, n_hosts_on_ip, pending,
           (floor_alloc + CASE WHEN rk <= leftover THEN 1 ELSE 0 END)::BIGINT
             AS alloc
    FROM r
    """,
)
def host_ip_politeness(spark, sf_dir):
    """Per-IP politeness pooling: virtual hosts that resolve to the
    same server must SHARE one politeness budget — hammering 50 vhosts
    of one box at 1 req/s each is still 50 req/s against that box.
    Scrapy exposes exactly this knob (CONCURRENT_REQUESTS_PER_IP,
    reference CrunchyCrawler/settings.py:133 — present but commented,
    so the reference throttles per-domain only); at 10^10-URL scale
    IP-level pooling is what keeps a crawler polite against CDNs and
    shared hosting. Hosts map to {N_IPS} servers by a deterministic
    md5 "DNS" (cross-engine identical); each IP's {IP_BUDGET}-slot
    round budget (capped by what's actually pending) splits across its
    vhosts by largest-remainder on pending counts — integer arithmetic
    end-to-end, so allocations are bit-identical across engines and
    cluster sizes, and sum(alloc) per IP == min({IP_BUDGET}, pending)
    exactly (pinned in pytest).

    Plan shape: one map-side-combinable (host) agg collapses the corpus
    to {N_VHOSTS} rows; every window after is PARTITIONED BY ip (the
    crawl_budget_alloc discipline made skew-safe: no global window, no
    SinglePartition exchange — at 10^10 URLs the post-agg table is
    host-cardinality, and each IP's rank runs over only its own
    vhosts)."""
    c = _t(spark, sf_dir, "customer")
    h = c.groupBy(
        F.concat(F.lit("h"), (F.col("c_custkey") % N_VHOSTS).cast("string")).alias(
            "host"
        )
    ).agg(F.count("*").alias("pending"))
    hi = h.select(
        "host",
        "pending",
        F.concat(F.lit("10.0.0."), (_md5_int(F.col("host")) % N_IPS).cast("string")).alias(
            "ip"
        ),
    )
    wip = Window.partitionBy("ip")
    g = hi.select(
        "*",
        F.sum("pending").over(wip).alias("ip_pending"),
        F.count("*").over(wip).alias("n_hosts_on_ip"),
    ).withColumn("give", F.least(F.lit(IP_BUDGET).cast("long"), F.col("ip_pending")))
    f = g.select(
        "*",
        F.expr("(give * pending) div ip_pending").alias("floor_alloc"),
        ((F.col("give") * F.col("pending")) % F.col("ip_pending")).alias("rem"),
    )
    r = f.select(
        "*",
        F.row_number().over(Window.partitionBy("ip").orderBy(F.desc("rem"), "host")).alias("rk"),
        (F.col("give") - F.sum("floor_alloc").over(wip)).alias("leftover"),
    )
    return r.select(
        "host",
        "ip",
        "n_hosts_on_ip",
        "pending",
        (
            F.col("floor_alloc") + F.when(F.col("rk") <= F.col("leftover"), 1).otherwise(0)
        ).alias("alloc"),
    )


EMB_DIM = 64  # embeddings.parquet vector width (TESTDATA.md)


@register(
    "zero_shot_label_match",
    f"""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
    cent AS (SELECT label AS ck, r.i, round(avg(v[r.i]), 6) AS cv
             FROM e CROSS JOIN range(1, {EMB_DIM + 1}) r(i)
             GROUP BY 1, 2),
    carr AS (SELECT ck, list(cv ORDER BY i) AS c FROM cent GROUP BY ck),
    s AS (SELECT vec_id, label, ck,
                 round(list_dot_product(v, c)
                   / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(c, c))),
                   6) AS cos
          FROM e CROSS JOIN carr),
    r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cos DESC, ck) AS rk
          FROM s)
    SELECT p1.vec_id, p1.label, p1.ck AS pred_label, p1.cos AS cos_best,
           round(p1.cos - p2.cos, 6) AS margin,
           (p1.label = p1.ck) AS label_match
    FROM r p1 JOIN r p2 ON p1.vec_id = p2.vec_id AND p2.rk = 2
    WHERE p1.rk = 1
    """,
)
def zero_shot_label_match(spark, sf_dir):
    """CLIP-style zero-shot prototype matching: each class label gets a
    PROTOTYPE embedding (the mean of its members — the stand-in for an
    encoded class prompt, exactly how CLIP zero-shot classification
    scores an image against K class-text embeddings), and every vector
    is scored against all K prototypes by cosine; output = predicted
    label (argmax), best score, top-2 MARGIN, and whether the
    prediction matches the stored label. The margin column is the
    confidence gate a multimodal curation pipeline thresholds on
    (low-margin rows are ambiguous caption/image pairs; mismatched
    high-margin rows are mislabels) — the evaluation/filter twin of
    semdedup_prune's learned clusters, run against GIVEN labels.
    Reference analog: none (the reference stores scraped categories
    verbatim); this is the LLM-data extension the graft calls for.

    Plan shape: prototypes come from one posexplode -> (label, dim)
    map-side-combinable agg (output K x {EMB_DIM} ~ tiny); all K
    prototypes then fold into a SINGLE broadcast row carrying an array
    of (label, centroid) structs, and every corpus row scores the whole
    array inside one codegen'd projection — argmax and runner-up come
    from an in-row array_sort, so the corpus side of the plan is
    scan -> project with ZERO corpus shuffles (K is class-cardinality,
    never data-sized). Centroids and cosines round to 6dp
    in both engines so float summation order can't flip an argmax
    (the semdedup_prune discipline); ties break on label ascending via
    the struct sort order."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = (
        e.select("label", F.posexplode("v").alias("i", "val"))
        .groupBy(F.col("label").alias("ck"), "i")
        .agg(F.round(F.avg("val"), 6).alias("cv"))
    )
    carr = cent.groupBy("ck").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "cv"))), lambda s: s["cv"]
        ).alias("c")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    # all K prototypes fold into ONE row carrying an array of (ck, c)
    # structs; the corpus then crossJoins that single broadcast row and
    # scores every prototype INSIDE a per-row array expression — the
    # corpus is never shuffled at all (scan -> project), where the naive
    # crossJoin + groupBy(vec_id) shape exchanges corpus x K rows.
    protos = carr.agg(
        F.array_sort(F.collect_list(F.struct("ck", "c"))).alias("ps")
    )
    scored = e.crossJoin(F.broadcast(protos)).select(
        "vec_id",
        "label",
        F.array_sort(
            F.transform(
                F.col("ps"),
                lambda p: F.struct(
                    (
                        -F.round(
                            dot(F.col("v"), p["c"])
                            / (
                                F.sqrt(dot(F.col("v"), F.col("v")))
                                * F.sqrt(dot(p["c"], p["c"]))
                            ),
                            6,
                        )
                    ).alias("ncos"),
                    p["ck"].alias("ck"),
                ),
            )
        ).alias("a"),
    )
    return scored.select(
        "vec_id",
        "label",
        F.col("a")[0]["ck"].alias("pred_label"),
        (-F.col("a")[0]["ncos"]).alias("cos_best"),
        F.round(F.col("a")[1]["ncos"] - F.col("a")[0]["ncos"], 6).alias("margin"),
        (F.col("label") == F.col("a")[0]["ck"]).alias("label_match"),
    )


SURT_LOOKUP_PREFIX = "com,crunchbase,s1,h7)"  # all URLs of host h7.s1.crunchbase.com
# Paths in the corpus are ASCII below '~', so every key with prefix P
# lies in [P, P || '~'] — the manifest range test below is a superset
# of the true matches, and the exact starts_with filter restores
# precision on just the touched blocks.
_SURT_HI = SURT_LOOKUP_PREFIX + "~"


@register(
    "surt_prefix_lookup",
    f"""
    WITH u AS (
      SELECT o_orderkey AS seq,
             'h' || (o_custkey % 40)::VARCHAR || '.s'
             || (o_orderkey % 3)::VARCHAR || '.crunchbase.com' AS host,
             '/organization/co-' || (o_orderkey % 3000)::VARCHAR AS path
      FROM orders),
    s AS (SELECT seq,
                 array_to_string(list_reverse(string_split(host, '.')), ',')
                 || ')' || path AS surt_key
          FROM u),
    r AS (SELECT surt_key, seq,
                 row_number() OVER (ORDER BY surt_key, seq) AS rnk
          FROM s),
    blk AS (SELECT *, (rnk - 1) // {SURT_BLOCK} AS block_id FROM r),
    manifest AS (SELECT block_id, min(surt_key) AS key_min,
                        max(surt_key) AS key_max
                 FROM blk GROUP BY 1),
    cand AS (SELECT block_id FROM manifest
             WHERE key_max >= '{SURT_LOOKUP_PREFIX}'
               AND key_min <= '{_SURT_HI}')
    SELECT b.seq, b.surt_key, b.block_id
    FROM blk b JOIN cand USING (block_id)
    WHERE starts_with(b.surt_key, '{SURT_LOOKUP_PREFIX}')
    """,
)
def surt_prefix_lookup(spark, sf_dir):
    """The READ side of surt_url_index: answer "every URL under this
    host/domain prefix" by pruning with the block manifest FIRST — only
    blocks whose [key_min, key_max] range can intersect the prefix
    interval are scanned, then the exact starts_with filter runs on
    just those rows. This is the CDX cluster.idx lookup Common Crawl
    serves per prefix query, and on the north_rule's Iceberg frontier
    it is file-skipping on the SURT sort key: the manifest range test
    here is exactly the min/max-stats pruning an Iceberg scan does when
    rows are written in surt_url_index's block order (at 10^10 URLs the
    difference is touching ~1 block vs scanning the frontier).

    Plan shape: index side reuses the parallel total order
    (global_fifo_rank — no SinglePartition window); the manifest is
    block-cardinality and its qualifying block_ids BROADCAST back onto
    the indexed rows (a broadcast semi-join standing in for scan-time
    file pruning); the exact prefix predicate is a codegen'd
    starts_with on the surviving rows only. tests assert the candidate
    block count is a strict subset of the manifest (the pruning
    actually prunes)."""
    from .frontier import global_fifo_rank

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    host = F.concat(
        F.lit("h"),
        (F.col("o_custkey") % 40).cast("string"),
        F.lit(".s"),
        (F.col("o_orderkey") % 3).cast("string"),
        F.lit(".crunchbase.com"),
    )
    path = F.concat(
        F.lit("/organization/co-"), (F.col("o_orderkey") % 3000).cast("string")
    )
    s = o.select(
        F.col("o_orderkey").alias("seq"),
        F.concat(
            F.concat_ws(",", F.reverse(F.split(host, "\\."))), F.lit(")"), path
        ).alias("surt_key"),
    )
    blk = global_fifo_rank(s, ("surt_key", "seq"), "rnk").withColumn(
        "block_id", F.floor((F.col("rnk") - 1) / SURT_BLOCK)
    )
    manifest = blk.groupBy("block_id").agg(
        F.min("surt_key").alias("key_min"), F.max("surt_key").alias("key_max")
    )
    cand = manifest.filter(
        (F.col("key_max") >= SURT_LOOKUP_PREFIX) & (F.col("key_min") <= _SURT_HI)
    ).select("block_id")
    return (
        blk.join(F.broadcast(cand), "block_id")
        .filter(F.col("surt_key").startswith(SURT_LOOKUP_PREFIX))
        .select("seq", "surt_key", "block_id")
    )


CAPTION_LM_FLOOR = -6.2  # mean ln p below this flags a caption as gibberish
# (at the committed fixture this isolates the 'photo'-suffixed near-dup
# caption group, whose extra OOV token drags the mean below the floor)


@register(
    "caption_lm_fluency",
    f"""
    WITH t AS (SELECT doc_id, {_TOKS_RAW_SQL} AS toks FROM documents),
    uni AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    ufr AS (SELECT tok, count(*) AS ufreq FROM uni GROUP BY tok),
    tot AS (SELECT sum(ufreq)::DOUBLE AS n_total,
                   count(*)::DOUBLE AS v FROM ufr),
    b AS (SELECT doc_id,
                 unnest(toks[1:len(toks) - 1]) AS w1,
                 unnest(toks[2:len(toks)]) AS w2
          FROM t WHERE len(toks) >= 2),
    bfr AS (SELECT w1, w2, count(*) AS bfreq FROM b GROUP BY 1, 2),
    ctx AS (SELECT w1, sum(bfreq)::DOUBLE AS cfreq FROM bfr GROUP BY 1),
    nd AS (SELECT count(*) AS n FROM documents),
    snip AS (SELECT doc_id,
                    array_to_string(({_TOKS_RAW_SQL})[1:5], ' ') AS sn
             FROM documents),
    cap AS (SELECT c.image_id,
                   string_split_regex(
                     lower(c.caption) || ' ' || snip.sn, '\\s+') AS toks
            FROM read_parquet('{_IMAGES_META}') c
            CROSS JOIN nd
            JOIN snip ON snip.doc_id
                         = CAST(substr(c.image_id, 4) AS BIGINT) % nd.n),
    cb AS (SELECT image_id,
                  unnest(toks[1:len(toks) - 1]) AS w1,
                  unnest(toks[2:len(toks)]) AS w2
           FROM cap WHERE len(toks) >= 2),
    s AS (SELECT cb.image_id,
                 ln({BIGRAM_LAMBDA} * coalesce(bfr.bfreq / ctx.cfreq, 0)
                    + {1 - BIGRAM_LAMBDA}
                      * (coalesce(ufr.ufreq, 0) + 1) / (tot.n_total + tot.v))
                   AS lp
          FROM cb LEFT JOIN bfr USING (w1, w2)
                  LEFT JOIN ctx USING (w1)
                  LEFT JOIN ufr ON cb.w2 = ufr.tok
                  CROSS JOIN tot)
    SELECT image_id, count(*) AS n_bigrams,
           round(avg(lp), 4) AS avg_logprob,
           (round(avg(lp), 4) < {CAPTION_LM_FLOOR}) AS is_gibberish
    FROM s GROUP BY image_id
    """,
)
def caption_lm_fluency(spark, sf_dir):
    """Caption fluency via TRANSFER of the corpus bigram LM: the LM is
    fit on the documents corpus (same interpolated-bigram machinery as
    bigram_logprob_quality), then applied to the image CAPTIONS — the
    train/apply split a production multimodal pipeline actually runs
    (KenLM fit on a reference corpus, scoring candidate alt-text to
    drop keyword-stuffed or gibberish captions before CLIP training).
    The synthetic caption bank shares no vocabulary with the reference
    corpus, so both engines deterministically append a 5-token snippet
    of the caption's idx-mapped document first (the _PII_AUG_SQL
    augmentation discipline) — the scored text then mixes in-domain
    and OOV tokens exactly like real alt-text, and scores vary with
    the snippet drawn. Because the caption side is still partly a
    DIFFERENT corpus, unseen tokens and unseen
    contexts are expected: the unigram backoff is Laplace-smoothed over
    the reference vocabulary ((ufreq+1)/(n_total+V), the dsir_select
    smoothing) and missing bigram/context terms contribute zero to the
    interpolation, so every caption scores finitely — no inner-join
    token dropout on the APPLY side (left joins, mirrored in the
    oracle). Reference analog: none (the reference stores scraped text
    verbatim); this is the LLM-data extension the graft calls for.

    Scale shape: LM tables are map-side-combinable aggs over the
    reference corpus, built once; scoring joins are keyed on
    token/bigram and deliberately NOT broadcast (vocab grows with the
    reference corpus — Heap's law); the caption side shuffles only its
    bigram instances (3-4 per caption). Per-caption agg is map-side
    combinable; the flag compares the 4dp-ROUNDED mean in both engines
    (the bigram_logprob_quality ulp discipline)."""
    toks = (
        _t(spark, sf_dir, "documents")
        .select("doc_id", F.split(F.lower("text"), r"\s+").alias("toks"))
        .localCheckpoint()
    )
    ufr = (
        toks.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("ufreq"))
    )
    tot = ufr.agg(
        F.sum("ufreq").cast("double").alias("n_total"),
        F.count("*").cast("double").alias("v"),
    )
    big = (
        toks.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    bfr = big.groupBy("w1", "w2").agg(F.count("*").alias("bfreq"))
    ctx = bfr.groupBy("w1").agg(F.sum("bfreq").cast("double").alias("cfreq"))
    nd = toks.agg(F.count("*").alias("n"))
    snip = toks.select(
        F.col("doc_id").alias("sdoc"),
        F.array_join(F.slice("toks", 1, 5), " ").alias("sn"),
    )
    cap = (
        spark.read.parquet(_IMAGES_META)
        .select(
            "image_id",
            F.substring("image_id", 4, 20).cast("long").alias("idx"),
            "caption",
        )
        .crossJoin(F.broadcast(nd))
        .join(snip, F.expr("idx % n") == F.col("sdoc"))
        .select(
            "image_id",
            F.split(
                F.concat(F.lower("caption"), F.lit(" "), F.col("sn")), r"\s+"
            ).alias("toks"),
        )
    )
    cb = (
        cap.filter(F.size("toks") >= 2)
        .select(
            "image_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 2),"
                    " i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"
                )
            ).alias("bg"),
        )
        .select("image_id", "bg.w1", "bg.w2")
    )
    lp = F.log(
        F.lit(BIGRAM_LAMBDA)
        * F.coalesce(F.col("bfreq") / F.col("cfreq"), F.lit(0.0))
        + F.lit(1 - BIGRAM_LAMBDA)
        * (F.coalesce(F.col("ufreq"), F.lit(0)) + 1)
        / (F.col("n_total") + F.col("v"))
    )
    avg_lp = F.round(F.avg("lp"), 4)
    return (
        cb.join(bfr, ["w1", "w2"], "left")
        .join(ctx, "w1", "left")
        .join(ufr.withColumnRenamed("tok", "w2"), "w2", "left")
        .crossJoin(F.broadcast(tot))
        .select("image_id", lp.alias("lp"))
        .groupBy("image_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            avg_lp.alias("avg_logprob"),
            (avg_lp < CAPTION_LM_FLOOR).alias("is_gibberish"),
        )
    )


KS_DRIFT_TAU = 0.1  # KS statistic above this flags a source as drifted


@register(
    "quality_ks_drift",
    f"""
    WITH q AS ({{QSCORE_SQL}}),
    sc AS (SELECT q.doc_id, d.source, q.qscore
           FROM q JOIN documents d ON q.doc_id = d.doc_id),
    n AS (SELECT source, count(*) AS n_src FROM sc GROUP BY 1),
    tot AS (SELECT count(*)::DOUBLE AS n_all FROM sc),
    pts AS (SELECT qscore, source, count(*) AS c FROM sc GROUP BY 1, 2),
    grid AS (SELECT g.qscore, s.source, coalesce(p.c, 0) AS c
             FROM (SELECT DISTINCT qscore FROM pts) g
             CROSS JOIN (SELECT DISTINCT source FROM pts) s
             LEFT JOIN pts p ON p.qscore = g.qscore AND p.source = s.source),
    cum2 AS (SELECT g.qscore, g.source,
                    sum(g.c) OVER (PARTITION BY g.source ORDER BY g.qscore)
                      AS cum_s,
                    sum(g.c) OVER (ORDER BY g.qscore
                                   RANGE BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum_all
             FROM grid g),
    ks AS (SELECT c2.source,
                  max(abs(c2.cum_s / n.n_src
                          - (c2.cum_all - c2.cum_s) / (tot.n_all - n.n_src)))
                    AS ks_raw
           FROM cum2 c2 JOIN n USING (source) CROSS JOIN tot
           GROUP BY c2.source, n.n_src, tot.n_all)
    SELECT source, round(ks_raw, 4) AS ks_stat,
           (round(ks_raw, 4) > {KS_DRIFT_TAU}) AS drifted
    FROM ks
    """.replace("{QSCORE_SQL}", ORACLES["quality_score"]),
)
def quality_ks_drift(spark, sf_dir):
    """Distribution-drift monitor: the exact two-sample Kolmogorov-
    Smirnov statistic of each source's quality-score distribution
    against the REST of the corpus — KS = max over score points of
    |CDF_source - CDF_rest|. This is the pipeline-health check a
    continuously-fed crawl corpus needs: a source whose quality
    distribution drifts (new spam template, broken extractor, changed
    site chrome) shows up here rounds before it degrades a trained
    model. Composes the registered quality_score operator verbatim
    (its oracle SQL is a CTE — the curation_keep_list discipline), so
    the monitor can never drift from the score it audits.

    Scale shape: the corpus collapses to a (qscore, source) count
    table by one map-side-combinable agg — qscore is 4dp-rounded so
    the grid is BOUNDED (score-cardinality x sources, thousands of
    rows at any corpus size), and every window after runs over that
    bounded grid, never the corpus (the post-aggregation-window
    reasoning of corpus_mix_temperature; the dense source-grid
    cross join makes each source's step CDF defined at every global
    score point). Exact KS by construction — at truly unbounded score
    cardinality the documented swap is binning the score to a fixed
    grid first, the approx_percentile trade."""
    q = QUERIES["quality_score"](spark, sf_dir).select("doc_id", "qscore")
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    sc = q.join(d, "doc_id")
    pts = sc.groupBy("qscore", "source").agg(F.count("*").alias("c"))
    pts = pts.localCheckpoint()  # bounded grid: feeds grid, totals, counts
    n = pts.groupBy("source").agg(F.sum("c").alias("n_src"))
    tot = pts.agg(F.sum("c").cast("double").alias("n_all"))
    grid = (
        pts.select("qscore")
        .distinct()
        .crossJoin(F.broadcast(pts.select("source").distinct()))
        .join(pts, ["qscore", "source"], "left")
        .fillna(0, subset=["c"])
    )
    wsrc = Window.partitionBy("source").orderBy("qscore")
    wall = Window.orderBy("qscore").rangeBetween(Window.unboundedPreceding, 0)
    cum = grid.select(
        "qscore",
        "source",
        F.sum("c").over(wsrc).alias("cum_s"),
        F.sum("c").over(wall).alias("cum_all"),
    )
    ks = (
        cum.join(n, "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_s") / F.col("n_src")
                    - (F.col("cum_all") - F.col("cum_s"))
                    / (F.col("n_all") - F.col("n_src"))
                )
            ).alias("ks_raw")
        )
    )
    return ks.select(
        "source",
        F.round("ks_raw", 4).alias("ks_stat"),
        (F.round("ks_raw", 4) > KS_DRIFT_TAU).alias("drifted"),
    )


def _sitemap_gen_sql(gen: int) -> str:
    """DuckDB CTE body for sitemap snapshot ``gen`` (1 = yesterday,
    2 = today). Generation 2 deterministically evolves generation 1:
    page counts move from s%3+1 to s%4+1 (so hosts gain AND lose
    pages), and hosts with s_suppkey%5==0 bump page 1's lastmod (a
    content change with no URL change)."""
    n = "s_suppkey % 3 + 2" if gen == 1 else "s_suppkey % 4 + 2"
    mod = (
        "'2026-05-0' || j::VARCHAR"
        if gen == 1
        else "CASE WHEN s_suppkey % 5 = 0 AND j = 1 THEN '2026-06-01'"
        " ELSE '2026-05-0' || j::VARCHAR END"
    )
    return f"""
      SELECT 'sup' || s_suppkey::VARCHAR || '.example.com' AS host,
             'https://sup' || s_suppkey::VARCHAR || '.example.com/page/'
               || j::VARCHAR AS url,
             {mod} AS lastmod
      FROM supplier CROSS JOIN LATERAL unnest(range(1, {n})) AS t(j)
    """


def _sitemap_gen_df(s: DataFrame, gen: int) -> DataFrame:
    n = "s_suppkey % 3 + 1" if gen == 1 else "s_suppkey % 4 + 1"
    j = F.explode(F.expr(f"sequence(1, {n})")).alias("j")
    base = s.select("s_suppkey", j)
    ks = F.col("s_suppkey").cast("string")
    mod = F.concat(F.lit("2026-05-0"), F.col("j").cast("string"))
    if gen == 2:
        mod = F.when(
            (F.col("s_suppkey") % 5 == 0) & (F.col("j") == 1), F.lit("2026-06-01")
        ).otherwise(mod)
    return base.select(
        F.concat(F.lit("sup"), ks, F.lit(".example.com")).alias("host"),
        F.concat(
            F.lit("https://sup"), ks, F.lit(".example.com/page/"),
            F.col("j").cast("string"),
        ).alias("url"),
        mod.alias("lastmod"),
    )


@register(
    "sitemap_diff",
    f"""
    WITH v1 AS ({_sitemap_gen_sql(1)}),
    v2 AS ({_sitemap_gen_sql(2)})
    SELECT coalesce(v1.host, v2.host) AS host,
           coalesce(v1.url, v2.url) AS url,
           v1.lastmod AS lastmod_prev, v2.lastmod AS lastmod_cur,
           CASE WHEN v1.url IS NULL THEN 'added'
                WHEN v2.url IS NULL THEN 'removed'
                WHEN v1.lastmod <> v2.lastmod THEN 'changed'
                ELSE 'unchanged' END AS status,
           CASE WHEN v1.url IS NULL OR v1.lastmod <> v2.lastmod THEN 'fetch'
                WHEN v2.url IS NULL THEN 'tombstone'
                ELSE 'skip' END AS action
    FROM v1 FULL OUTER JOIN v2 ON v1.host = v2.host AND v1.url = v2.url
    """,
)
def sitemap_diff(spark, sf_dir):
    """Incremental seed discovery: DIFF two sitemap generations into
    the added / removed / changed / unchanged row set and the crawler
    action each implies (fetch new+changed, tombstone removed, skip
    unchanged) — the change-data-capture of sitemap polling. At
    10^10-URL scale this diff IS the recrawl workload: a daily poll of
    a billion sitemap entries yields a round-sized fetch list instead
    of a full re-crawl (the frontier_changelog idea applied to the
    DISCOVERY side; etag_revalidate_plan then gates the fetches that
    remain). The reference has no sitemap path at all (seeds arrive
    via POST /createCrawl, api/views.py:19-42). Generation 2 evolves
    generation 1 deterministically in both engines: page counts move
    from s%3+1 to s%4+1 (hosts both gain and lose pages) and every
    5th host bumps page 1's lastmod.

    Plan shape: one full outer join keyed on (host, url) — both sides
    shuffle once on the join key and nothing else; statuses and
    actions are pure projections. No windows, no corpus-sized
    broadcast. Status mix (all four present) is pinned in pytest."""
    s = _t(spark, sf_dir, "supplier").select("s_suppkey")
    v1 = _sitemap_gen_df(s, 1).withColumnRenamed("lastmod", "lastmod_prev")
    v2 = _sitemap_gen_df(s, 2).withColumnRenamed("lastmod", "lastmod_cur")
    j = v1.join(v2, ["host", "url"], "full_outer")
    changed = (
        F.col("lastmod_prev").isNotNull()
        & F.col("lastmod_cur").isNotNull()
        & (F.col("lastmod_prev") != F.col("lastmod_cur"))
    )
    status = (
        F.when(F.col("lastmod_prev").isNull(), F.lit("added"))
        .when(F.col("lastmod_cur").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    action = (
        F.when(F.col("lastmod_prev").isNull() | changed, F.lit("fetch"))
        .when(F.col("lastmod_cur").isNull(), F.lit("tombstone"))
        .otherwise(F.lit("skip"))
    )
    return j.select(
        "host", "url", "lastmod_prev", "lastmod_cur",
        status.alias("status"), action.alias("action"),
    )


@register(
    "canonical_resolve",
    f"""
    WITH r AS ({{RR_SQL}}),
    mx AS (SELECT max(doc_id) AS mx FROM documents)
    SELECT r.doc_id, r.status, r.final_id, r.n_hops,
           CASE WHEN r.status <> 'loop' AND r.final_id % 20 = 0
                     AND r.final_id + 10 <= mx.mx
                THEN r.final_id + 10 END AS canonical_id,
           CASE WHEN r.status = 'loop' THEN NULL
                WHEN r.final_id % 20 = 0 AND r.final_id + 10 <= mx.mx
                THEN r.final_id + 10
                ELSE r.final_id END AS effective_id
    FROM r CROSS JOIN mx
    """.replace("{RR_SQL}", ORACLES["redirect_resolve"]),
)
def canonical_resolve(spark, sf_dir):
    """rel=canonical resolution ON TOP of redirect resolution — the
    two-layer URL identity a crawler actually needs: HTTP redirects
    move the request (redirect_resolve), then the landing page may
    DECLARE a different canonical URL in its markup (<link
    rel="canonical">), and dedup/indexing must key on that effective
    id. Composes the registered redirect_resolve operator verbatim
    (its oracle SQL is the CTE — the curation_keep_list discipline, so
    this table cannot drift from the chain resolution it extends); the
    canonical declaration is deterministic in both engines: every 20th
    landing page declares its +10 neighbor (itself a terminal,
    single-hop by construction — real canonicals are one hop; chains
    of canonicals are a spam signal url_trap_detect would catch).
    Loop rows stay unresolvable (null effective_id, the drop signal).
    The reference's scrapy stack follows redirects but stores whatever
    URL it landed on (pipelines.py upserts by the fetched URL);
    canonical collapsing is the missing identity layer.

    Plan shape: redirect_resolve's pointer-doubling plan plus ONE
    projection — the canonical rule is a pure CASE over the resolved
    landing id (no new join; the 1-row max rides the same broadcast
    pattern). At 10^10 URLs the effective_id column is what the
    URL-seen filter and the frontier MERGE key on."""
    rr = QUERIES["redirect_resolve"](spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    mx = docs.agg(F.max("doc_id").alias("mx"))
    j = rr.crossJoin(F.broadcast(mx))
    declares = (
        (F.col("status") != "loop")
        & (F.col("final_id") % 20 == 0)
        & (F.col("final_id") + 10 <= F.col("mx"))
    )
    return j.select(
        "doc_id",
        "status",
        "final_id",
        "n_hops",
        F.when(declares, F.col("final_id") + 10).alias("canonical_id"),
        F.when(F.col("status") == "loop", F.lit(None).cast("long"))
        .when(declares, F.col("final_id") + 10)
        .otherwise(F.col("final_id"))
        .alias("effective_id"),
    )


@register(
    "image_ingest_manifest",
    f"""
    WITH kl AS ({{KEEP_SQL}}),
    d AS (SELECT m.image_id, m.fmt, (m.w * m.h * 3)::BIGINT AS est_bytes
          FROM read_parquet('{_IMAGES_META}') m
          JOIN kl ON m.image_id = kl.image_id
          WHERE kl.keep),
    c AS (SELECT *,
            coalesce(sum(est_bytes) OVER (PARTITION BY fmt ORDER BY image_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
          FROM d)
    SELECT fmt, (cum_before // {SHARD_BUDGET})::BIGINT AS shard_id,
           count(*) AS n_images,
           sum(est_bytes)::BIGINT AS shard_bytes,
           min(image_id) AS first_id, max(image_id) AS last_id
    FROM c GROUP BY fmt, cum_before // {SHARD_BUDGET}
    """.replace("{KEEP_SQL}", ORACLES["image_keep_list"]),
)
def image_ingest_manifest(spark, sf_dir):
    """The end of the multimodal ingest pipeline: the WebDataset shard
    manifest over exactly the CURATED survivors — image_keep_list's
    keep rows (image-dup canonical, caption dup/near-dup, LAION quality
    gates already applied) packed contiguously in (fmt, image_id) order
    under the {SHARD_BUDGET}-decoded-byte budget. This is the artifact
    a training job consumes: dropped images never occupy shard space,
    shard boundaries are deterministic at any cluster size, and because
    both constituent operators' oracle SQL is composed verbatim as
    CTEs, the manifest cannot drift from the keep decisions or the
    packing rule it claims to implement (the curation_keep_list
    discipline, applied end-to-end).

    Scale shape: strictly the union of its parts — the keep list's
    banded/component machinery, then the two-phase range-sort +
    census-offset cumsum over only the survivors (no single-partition
    window), and a map-side-combinable (fmt, shard_id) manifest agg.
    Ignores sf_dir (fixture universe, same data as oracle)."""
    kl = QUERIES["image_keep_list"](spark, sf_dir).filter(F.col("keep"))
    m = (
        spark.read.parquet(_IMAGES_META)
        .join(kl.select("image_id"), "image_id")
        .select(
            F.col("fmt").alias("lang"),
            F.col("image_id").alias("doc_id"),
            (F.col("w") * F.col("h") * 3).cast("long").alias("n_tok"),
        )
    )
    c = _per_lang_cumsum_before(m)
    return (
        c.select(
            F.col("lang").alias("fmt"),
            F.col("doc_id").alias("image_id"),
            F.col("n_tok").alias("est_bytes"),
            F.expr(f"cum_before div {SHARD_BUDGET}").alias("shard_id"),
        )
        .groupBy("fmt", "shard_id")
        .agg(
            F.count("*").alias("n_images"),
            F.sum("est_bytes").alias("shard_bytes"),
            F.min("image_id").alias("first_id"),
            F.max("image_id").alias("last_id"),
        )
    )


SIMHASH_NEAR_BITS = 3  # 16-bit simhash: hamming <= 3 counts as "near"


@register(
    "dedup_layer_agreement",
    f"""
    WITH pairs AS ({{PAIRS_SQL}}),
    sh AS ({{SIMHASH_SQL}}),
    fp AS (SELECT doc_id,
                  {_MD5_INT_SQL.format(c=f"array_to_string(list_sort({_TOKS_SQL}), ' ')")}
                    AS content_fp
           FROM documents)
    SELECT p.a_id, p.b_id, p.jac,
           (fa.content_fp = fb.content_fp) AS exact_dup,
           bit_count(xor(sa.simhash, sb.simhash)) AS simhash_hamming,
           (bit_count(xor(sa.simhash, sb.simhash)) <= {SIMHASH_NEAR_BITS})
             AS simhash_near
    FROM pairs p
    JOIN fp fa ON p.a_id = fa.doc_id
    JOIN fp fb ON p.b_id = fb.doc_id
    JOIN sh sa ON p.a_id = sa.doc_id
    JOIN sh sb ON p.b_id = sb.doc_id
    """.replace("{PAIRS_SQL}", ORACLES["minhash_lsh_pairs"]).replace(
        "{SIMHASH_SQL}", ORACLES["simhash"]
    ),
)
def dedup_layer_agreement(spark, sf_dir):
    """Evaluation table for the dedup STACK: for every MinHash-LSH
    near-dup pair, do the other layers agree? — NORMALIZED-exact
    equality (md5 over the sorted distinct token set, the cheapest
    tier: it must fire exactly on the set-Jaccard-1.0 pairs, which the
    driver hash-match proves) and SimHash Hamming distance (the middle
    layer), per pair. This is the lang_confusion discipline
    applied to deduplication: a pipeline running exact -> simhash ->
    minhash tiers needs to KNOW how much each cheaper tier would have
    caught (exact_dup share) and where simhash's radius sits relative
    to true Jaccard similarity, before tuning tier thresholds at
    100 TB. Composes three registered operators' oracle SQL verbatim
    as CTEs (minhash_lsh_pairs, simhash, dedup_exact's fingerprint
    expression), so the agreement table cannot drift from the layers
    it audits.

    Plan shape: the pair stream comes from the banded LSH join (never
    all-pairs); fingerprints and simhashes are doc-keyed tables joined
    back by id — four data-sized equi joins, hash-partitioned on
    doc_id; the hamming column is codegen'd bit_count(xor). No new
    quadratic surface anywhere."""
    pairs = minhash_lsh_pairs(spark, sf_dir).select("a_id", "b_id", "jac")
    fp = _t(spark, sf_dir, "documents").select(
        "doc_id",
        _md5_int(F.array_join(F.array_sort(_toks_col()), " ")).alias("content_fp"),
    )
    sh = simhash(spark, sf_dir)
    j = (
        pairs.join(
            fp.select(F.col("doc_id").alias("a_id"), F.col("content_fp").alias("fp_a")),
            "a_id",
        )
        .join(
            fp.select(F.col("doc_id").alias("b_id"), F.col("content_fp").alias("fp_b")),
            "b_id",
        )
        .join(
            sh.select(F.col("doc_id").alias("a_id"), F.col("simhash").alias("sh_a")),
            "a_id",
        )
        .join(
            sh.select(F.col("doc_id").alias("b_id"), F.col("simhash").alias("sh_b")),
            "b_id",
        )
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return j.select(
        "a_id",
        "b_id",
        "jac",
        (F.col("fp_a") == F.col("fp_b")).alias("exact_dup"),
        ham.cast("long").alias("simhash_hamming"),
        (ham <= SIMHASH_NEAR_BITS).alias("simhash_near"),
    )


# ===========================================================================
# XII. Link-graph analytics, dataset splits, dedup reporting, entropy
#      gating, recompression planning (round 3, batch XII)
# ===========================================================================
# A deterministic hyperlink graph derived from doc_id arithmetic (the
# _redirect_edges discipline): every page emits LINK_FANOUT outlinks,
# dst = (src*7 + 13k) % n — a full-period affine map, so in-degree is
# near-uniform with designed hot targets where orbits collide — and the
# anchor text of the k-th link is the k-th token of the SOURCE page
# (anchors describe the target in the source's words, which is exactly
# why search engines index them). Hosts partition the id space mod
# N_LINK_HOSTS, mirroring the reference's host-sharded crawl identity
# (CrunchyCrawler pipelines key by domain).
LINK_FANOUT = 3
N_LINK_HOSTS = 53

_LINK_EDGE_SQL = f"""
    SELECT d.doc_id AS src,
           ((d.doc_id * 7 + 13 * k.k) % n.n) AS dst,
           list_extract(string_split_regex(lower(d.text), '\\s+'), k.k)
             AS anchor,
           'h' || (d.doc_id % {N_LINK_HOSTS})::VARCHAR AS src_host
    FROM documents d
    CROSS JOIN (SELECT count(*) AS n FROM documents) n
    CROSS JOIN (VALUES (1), (2), (3)) k(k)
    WHERE ((d.doc_id * 7 + 13 * k.k) % n.n) <> d.doc_id
"""


def _link_edges(docs_text: DataFrame) -> DataFrame:
    """(src, dst, anchor, src_host) hyperlink edges (rules above).

    The doc count rides a 1-row broadcast (the _redirect_edges
    pattern); the fanout explode is a LINK_FANOUT-element literal
    array, so edge generation is a pure projection — zero exchanges
    beyond the scan, linear in corpus size at any scale."""
    nn = docs_text.agg(F.count("*").alias("n"))
    d = docs_text.crossJoin(F.broadcast(nn)).select(
        F.col("doc_id").alias("src"),
        F.split(F.lower("text"), r"\s+").alias("toks"),
        "n",
        F.explode(F.array(*[F.lit(k) for k in range(1, LINK_FANOUT + 1)])).alias("k"),
    )
    dst = (F.col("src") * 7 + 13 * F.col("k")) % F.col("n")
    return d.filter(dst != F.col("src")).select(
        "src",
        dst.alias("dst"),
        F.element_at("toks", F.col("k").cast("int")).alias("anchor"),
        F.concat(F.lit("h"), (F.col("src") % N_LINK_HOSTS).cast("string")).alias(
            "src_host"
        ),
    )


@register(
    "anchor_text_agg",
    f"""
    WITH e AS ({_LINK_EDGE_SQL}),
    per AS (SELECT dst, count(*) AS n_inlinks,
                   count(DISTINCT src_host) AS n_src_hosts,
                   count(DISTINCT anchor) AS n_anchors
            FROM e GROUP BY dst),
    af AS (SELECT dst, anchor, count(*) AS f FROM e GROUP BY dst, anchor),
    top AS (SELECT dst, anchor, f,
                   row_number() OVER (PARTITION BY dst
                                      ORDER BY f DESC, anchor NULLS LAST) AS r
            FROM af)
    SELECT p.dst AS doc_id, p.n_inlinks, p.n_src_hosts, p.n_anchors,
           t.anchor AS top_anchor, t.f AS top_anchor_freq
    FROM per p JOIN top t ON p.dst = t.dst AND t.r = 1
    """,
)
def anchor_text_agg(spark, sf_dir):
    """Per-target anchor-text aggregation — the link-derived evidence a
    crawler/indexer keeps per URL: how many pages link here, from how
    many distinct hosts, with what dominant anchor phrase. Anchor text
    is query-independent relevance evidence (it's how search engines
    describe pages they haven't parsed yet) and in-link host diversity
    is the classic crawl-priority signal (a page linked from many
    hosts outranks one linked many times from one host — the OPIC /
    indegree family the frontier's priority scorer consumes). The
    reference keeps no link evidence at all — its similar_companies
    lookups are content-side only — so this is the missing link-side
    half of its entity graph (knowledgeGraph/generate_graph.py builds
    SIMILAR_TO from content, never from links).

    Plan shape: edge generation is a projection (1-row count
    broadcast, literal fanout explode — no corpus join); both aggs are
    map-side-combinable hash aggs keyed on dst; the top-anchor
    row_number window runs over the AGGREGATED (dst, anchor) table
    partitioned by dst — bounded by distinct anchors per target, never
    corpus-sized, no SinglePartition exchange. At 10^10 URLs this is
    the WAT-extract → anchor-index job Common Crawl runs, same shape,
    more partitions."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    e = _link_edges(docs).localCheckpoint(eager=False)  # shared by both aggs
    per = e.groupBy("dst").agg(
        F.count("*").alias("n_inlinks"),
        F.countDistinct("src_host").alias("n_src_hosts"),
        F.countDistinct("anchor").alias("n_anchors"),
    )
    af = e.groupBy("dst", "anchor").agg(F.count("*").alias("f"))
    # NULLS LAST explicitly on BOTH sides: docs shorter than the link
    # fanout produce NULL anchors, and Spark's asc default (NULLS
    # FIRST) disagrees with DuckDB's (NULLS LAST) on freq ties
    w = Window.partitionBy("dst").orderBy(F.desc("f"), F.asc_nulls_last("anchor"))
    top = af.withColumn("r", F.row_number().over(w)).filter(F.col("r") == 1)
    return per.join(top, "dst").select(
        F.col("dst").alias("doc_id"),
        "n_inlinks",
        "n_src_hosts",
        "n_anchors",
        F.col("anchor").alias("top_anchor"),
        F.col("f").alias("top_anchor_freq"),
    )


@register(
    "host_degree_stats",
    f"""
    WITH e AS ({_LINK_EDGE_SQL}),
    he AS (SELECT src_host,
                  'h' || (dst % {N_LINK_HOSTS})::VARCHAR AS dst_host
           FROM e),
    outd AS (SELECT src_host AS host, count(*) AS out_edges,
                    count(DISTINCT dst_host) AS out_hosts
             FROM he GROUP BY src_host),
    ind AS (SELECT dst_host AS host, count(*) AS in_edges,
                   count(DISTINCT src_host) AS in_hosts
            FROM he GROUP BY dst_host)
    SELECT coalesce(o.host, i.host) AS host,
           coalesce(o.out_edges, 0) AS out_edges,
           coalesce(o.out_hosts, 0) AS out_hosts,
           coalesce(i.in_edges, 0) AS in_edges,
           coalesce(i.in_hosts, 0) AS in_hosts
    FROM outd o FULL OUTER JOIN ind i ON o.host = i.host
    """,
)
def host_degree_stats(spark, sf_dir):
    """Host-graph degree table — the hostgraph analytics Common Crawl
    publishes per crawl (in/out edge and distinct-neighbor counts per
    host) and the first input to seed selection, spam-host triage, and
    politeness capacity planning: a host with huge in-degree from few
    neighbors is a link farm; one with broad in-host diversity is a
    hub worth recrawling. Complements host_pagerank/host_hits (score
    the same graph) with the raw degree evidence those scores
    summarize.

    Plan shape: page edges collapse to host edges in the projection;
    two map-side-combinable hash aggs keyed on host (bounded by
    N_LINK_HOSTS here, by the host universe at scale — millions, not
    10^10), then one host-keyed full-outer merge. The host graph is
    always orders of magnitude smaller than the page graph, which is
    why hostgraph jobs run where pagegraph jobs can't."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    he = _link_edges(docs).select(
        "src_host",
        F.concat(F.lit("h"), (F.col("dst") % N_LINK_HOSTS).cast("string")).alias(
            "dst_host"
        ),
    ).localCheckpoint(eager=False)
    outd = he.groupBy(F.col("src_host").alias("host")).agg(
        F.count("*").alias("out_edges"),
        F.countDistinct("dst_host").alias("out_hosts"),
    )
    ind = he.groupBy(F.col("dst_host").alias("host")).agg(
        F.count("*").alias("in_edges"),
        F.countDistinct("src_host").alias("in_hosts"),
    )
    return (
        outd.join(ind, "host", "full_outer")
        .select(
            "host",
            F.coalesce("out_edges", F.lit(0)).alias("out_edges"),
            F.coalesce("out_hosts", F.lit(0)).alias("out_hosts"),
            F.coalesce("in_edges", F.lit(0)).alias("in_edges"),
            F.coalesce("in_hosts", F.lit(0)).alias("in_hosts"),
        )
    )


# Split-bucket layout: content-hash mod 100 -> 1% test, 1% val, 98%
# train. Keyed on the NORMALIZED CONTENT FINGERPRINT (dedup_exact's
# md5-over-sorted-token-set), not doc_id: exact duplicates MUST land in
# the same split or the held-out sets leak training text — the standard
# url/content-hash split discipline (C4, The Pile, RefinedWeb all split
# by hash for exactly this reason).
SPLIT_TEST_LT = 1
SPLIT_VAL_LT = 2
_CONTENT_FP_SQL = _MD5_INT_SQL.format(
    c=f"array_to_string(list_sort({_TOKS_SQL}), ' ')"
)


@register(
    "dataset_split_assign",
    f"""
    SELECT doc_id, content_fp, bucket,
           CASE WHEN bucket < {SPLIT_TEST_LT} THEN 'test'
                WHEN bucket < {SPLIT_VAL_LT} THEN 'val'
                ELSE 'train' END AS split
    FROM (SELECT doc_id, {_CONTENT_FP_SQL} AS content_fp,
                 {_CONTENT_FP_SQL} % 100 AS bucket
          FROM documents)
    """,
)
def dataset_split_assign(spark, sf_dir):
    """Deterministic, leakage-safe train/val/test assignment: each doc
    hashes its NORMALIZED CONTENT (dedup_exact's fingerprint — sorted
    distinct token set) into one of 100 buckets; buckets 0 -> test,
    1 -> val, rest -> train. Because the key is the content hash and
    not the row id, every exact duplicate of a held-out document lands
    in the SAME held-out split — the invariant that keeps eval numbers
    honest when the corpus still contains dups upstream of the dedup
    pass (and the reason C4-style pipelines split by hash, never by
    position or RNG). Deterministic in both engines: no RNG, no
    wall-clock, stable under repartitioning and re-runs — a doc's
    split never changes when the corpus grows, which rolling-crawl
    training requires (yesterday's val doc must not become today's
    train doc).

    Plan shape: one projection over the scan — the fingerprint is a
    codegen'd md5/conv expression, the bucket a modulo; ZERO exchanges
    (the split is embarrassingly parallel by construction). The
    per-(lang, split) census any consumer needs is one map-side
    combinable agg downstream."""
    d = _t(spark, sf_dir, "documents")
    fp = _md5_int(F.array_join(F.array_sort(_toks_col()), " "))
    return d.select(
        "doc_id",
        fp.alias("content_fp"),
        (fp % 100).alias("bucket"),
        F.when(fp % 100 < SPLIT_TEST_LT, F.lit("test"))
        .when(fp % 100 < SPLIT_VAL_LT, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


@register(
    "neardup_cluster_stats",
    """
    WITH comp AS ({NC_SQL}),
    s AS (SELECT component_id, count(*) AS sz FROM comp GROUP BY component_id)
    SELECT sz AS cluster_size,
           count(*) AS n_clusters,
           sum(sz)::BIGINT AS n_docs
    FROM s GROUP BY sz
    """.replace("{NC_SQL}", ORACLES["neardup_components"]),
)
def neardup_cluster_stats(spark, sf_dir):
    """Cluster-size histogram of the near-dup components — the dedup
    REPORT a pipeline publishes per crawl: how many dup clusters exist
    at each size, and how many documents they hold. sum(n_docs) is the
    corpus; n_docs - n_clusters is exactly the row count dedup removes
    (one canonical survives per cluster); the size tail is the
    template-spam indicator (a 10^4-doc cluster is a boilerplate farm,
    not prose). Composes neardup_components' oracle SQL verbatim as a
    CTE, so the report cannot drift from the clustering it summarizes
    (the curation_keep_list discipline).

    Plan shape: strictly the components machinery (banded LSH pairs +
    pointer-jumping labels), then two map-side-combinable hash aggs —
    component_id-keyed then size-keyed; the histogram is at most
    max-cluster-size rows. Nothing here grows faster than the
    component step that already ran."""
    comp = QUERIES["neardup_components"](spark, sf_dir)
    s = comp.groupBy("component_id").agg(F.count("*").alias("sz"))
    return s.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count("*").alias("n_clusters"),
        F.sum("sz").alias("n_docs"),
    )


# Entropy gate: natural prose has per-token unigram entropy near
# log(vocab-in-doc); keyword-stuffed/template/repeated-token spam
# collapses it. Flag the low tail of the NORMALIZED entropy (entropy /
# ln(distinct tokens) in [0,1], scale-free across doc lengths).
ENTROPY_LOW = 0.7


@register(
    "token_entropy_quality",
    f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKS_RAW_SQL}) AS tok
                 FROM documents),
    f AS (SELECT doc_id, tok, count(*) AS f
          FROM tok GROUP BY doc_id, tok),
    n AS (SELECT doc_id, sum(f)::BIGINT AS n_tokens, count(*) AS n_distinct,
                 round(ln(sum(f)) - sum(f::DOUBLE * ln(f)) / sum(f), 4)
                   AS entropy
          FROM f GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_distinct, entropy,
           CASE WHEN n_distinct > 1
                THEN round(entropy / ln(n_distinct), 4) END AS norm_entropy,
           (n_distinct > 1 AND round(entropy / ln(n_distinct), 4)
              < {ENTROPY_LOW}) AS is_low_entropy
    FROM n
    """,
)
def token_entropy_quality(spark, sf_dir):
    """Per-document token-distribution entropy — the information-
    theoretic quality gate beside the rule-based ones (quality_score's
    length/punct ratios, repetition_quality's dup-word share): entropy
    = -sum p ln p over the doc's unigram frequencies, normalized by
    ln(distinct tokens) so a 50-token and a 5000-token doc are
    comparable. Keyword stuffing, tag clouds, and template spam sit in
    the low tail; natural prose sits near 1 (its frequencies are
    Zipfian but its support is wide). The corpus-level twin is
    token_zipf_slope; this is the per-doc decision column.

    Plan shape: one token explode (linear in corpus tokens), one
    map-side-combinable (doc_id, tok) hash agg, then one doc_id-keyed
    agg with the entropy folded in via the ln-identity
    H = ln n - sum(f ln f)/n (the SAME expression in both engines —
    one pass, no per-p window). No corpus-wide window, no join, 4dp
    rounding pins cross-engine float agreement."""
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    )
    f = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("f"))
    # H = -sum(f/n ln(f/n)) = ln(n) - sum(f ln f)/n : one agg, no window
    n = f.groupBy("doc_id").agg(
        F.sum("f").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("f") * F.log(F.col("f"))).alias("_flf"),
    )
    ent = F.round(
        F.log(F.col("n_tokens")) - F.col("_flf") / F.col("n_tokens"), 4
    )
    norm = F.when(
        F.col("n_distinct") > 1,
        F.round(ent / F.log(F.col("n_distinct")), 4),
    )
    return n.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        ent.alias("entropy"),
        norm.alias("norm_entropy"),
        ((F.col("n_distinct") > 1) & (norm < ENTROPY_LOW)).alias(
            "is_low_entropy"
        ),
    )


# Recompression planning thresholds: drop tiny thumbnails, transcode
# large lossless PNGs to JPEG before training ingest (SDXL/LAION-style
# storage discipline: decoded pixels are the training cost, stored
# bytes are the IO cost; lossless storage of photographic content is
# ~6x the IO for zero model benefit).
RECOMP_MIN_DIM = 48
RECOMP_PNG_PIXELS = 96 * 64
_EST_PNG_DIV = 2  # PNG ~ decoded/2 on-disk (synthetic noise compresses poorly)
_EST_JPEG_DIV = 12  # JPEG q85 ~ decoded/12


@register(
    "image_recompress_plan",
    f"""
    SELECT image_id, fmt, w, h,
           (w * h * 3)::BIGINT AS decoded_bytes,
           CASE WHEN w < {RECOMP_MIN_DIM} OR h < {RECOMP_MIN_DIM}
                  THEN 'drop_small'
                WHEN fmt = 'png' AND w * h >= {RECOMP_PNG_PIXELS}
                  THEN 'recompress_jpeg'
                ELSE 'keep' END AS action,
           CASE WHEN w < {RECOMP_MIN_DIM} OR h < {RECOMP_MIN_DIM}
                  THEN 0
                WHEN fmt = 'png' AND w * h >= {RECOMP_PNG_PIXELS}
                  THEN (w * h * 3) // {_EST_JPEG_DIV}
                WHEN fmt = 'png'
                  THEN (w * h * 3) // {_EST_PNG_DIV}
                ELSE (w * h * 3) // {_EST_JPEG_DIV} END::BIGINT
             AS est_stored_bytes
    FROM read_parquet('{_IMAGES_META}')
    """,
)
def image_recompress_plan(spark, sf_dir):
    """Storage-planning table for the multimodal ingest: per image,
    keep / transcode-to-JPEG / drop-as-thumbnail, with the estimated
    stored bytes after the action — the job that sizes a LAION-style
    recompression pass BEFORE burning cluster time decoding 10^10
    payloads. Thumbnails below 48px never help a vision model (LAION
    filters them at source); large lossless PNGs of photographic
    content cost ~6x the IO of q85 JPEG for no training benefit, so
    they transcode; small PNGs
    (icons, diagrams — where JPEG ringing hurts) keep their format.
    sum(est_stored_bytes) vs sum of the current estimate is the
    fleet-IO saving the plan buys.

    Plan shape: a pure codegen projection over the bytes-free metadata
    table (image_header_sniff supplies these columns from raw payloads
    when no catalog exists) — zero exchanges, zero Python, scan-speed
    at any corpus size; the actual transcode is the downstream
    mapInPandas pass over only the action='recompress_jpeg' slice.
    Ignores sf_dir (fixture universe, same data as oracle)."""
    m = spark.read.parquet(_IMAGES_META)
    decoded = (F.col("w") * F.col("h") * 3).cast("long")
    small = (F.col("w") < RECOMP_MIN_DIM) | (F.col("h") < RECOMP_MIN_DIM)
    big_png = (F.col("fmt") == "png") & (
        F.col("w") * F.col("h") >= RECOMP_PNG_PIXELS
    )
    return m.select(
        "image_id",
        "fmt",
        "w",
        "h",
        decoded.alias("decoded_bytes"),
        F.when(small, F.lit("drop_small"))
        .when(big_png, F.lit("recompress_jpeg"))
        .otherwise(F.lit("keep"))
        .alias("action"),
        F.when(small, F.lit(0))
        .when(big_png, decoded / _EST_JPEG_DIV)
        .when(F.col("fmt") == "png", decoded / _EST_PNG_DIV)
        .otherwise(decoded / _EST_JPEG_DIV)
        .cast("long")
        .alias("est_stored_bytes"),
    )


# ===========================================================================
# XIII. Tokenizer coverage, crawl routing, link-evidence priority,
#       embedding hygiene (round 3, batch XIII)
# ===========================================================================
OOV_HIGH = 0.5  # docs with more than half their tokens OOV are flagged
# evaluate coverage against the top-K head of the trained dictionary:
# the fixture corpus's entire 31-token vocabulary fits inside the
# 256-entry dictionary (OOV would be identically zero), so the gate
# runs at a tighter K to exercise the OOV path — at production scale
# this constant is simply the full vocab size
OOV_VOCAB_K = 16


@register(
    "oov_rate",
    """
    WITH v AS (SELECT tok FROM ({VOCAB_SQL}) WHERE vocab_id <= {K}),
    tok AS (SELECT doc_id, unnest({TOKS_RAW}) AS tok FROM documents)
    SELECT t.doc_id,
           count(*) AS n_tokens,
           count(*) FILTER (WHERE v.tok IS NULL) AS n_oov,
           round(count(*) FILTER (WHERE v.tok IS NULL)::DOUBLE
                 / count(*), 4) AS oov_rate,
           (round(count(*) FILTER (WHERE v.tok IS NULL)::DOUBLE
                  / count(*), 4) > {OOV_HIGH}) AS is_high_oov
    FROM tok t LEFT JOIN v ON t.tok = v.tok
    GROUP BY t.doc_id
    """.replace("{VOCAB_SQL}", ORACLES["vocab_topk"])
    .replace("{TOKS_RAW}", _TOKS_RAW_SQL)
    .replace("{OOV_HIGH}", str(OOV_HIGH))
    .replace("{K}", str(OOV_VOCAB_K)),
)
def oov_rate(spark, sf_dir):
    """Tokenizer-coverage evaluation: per document, the share of tokens
    OUTSIDE the trained vocabulary's top-OOV_VOCAB_K head (vocab_topk's
    oracle SQL composed verbatim, sliced by its dense vocab_id — see
    the OOV_VOCAB_K note) — the QA table a tokenizer-training pipeline
    publishes before freezing the vocab: a rising OOV tail means the
    vocab was fit on a stale or mismatched corpus slice, and per-source
    OOV aggregates catch a new crawl source whose text the tokenizer
    fragments into bytes (the quality_ks_drift story at the token
    level).

    Plan shape: the vocab side is BOUNDED BY CONSTRUCTION
    (VOCAB_TOPK rows) so its join side broadcasts at any corpus scale —
    this is the rare case where broadcast is provably safe at 100 TB;
    the token explode is linear and the per-doc agg is map-side
    combinable. The membership probe compiles to one
    BroadcastHashJoin — no per-row set lookup in Python."""
    v = (
        QUERIES["vocab_topk"](spark, sf_dir)
        .filter(F.col("vocab_id") <= OOV_VOCAB_K)
        .select("tok")
    )
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    )
    j = toks.join(
        F.broadcast(v.withColumn("_in_v", F.lit(1))), "tok", "left"
    )
    agg = j.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.count(F.when(F.col("_in_v").isNull(), 1)).alias("n_oov"),
    )
    rate = F.round(F.col("n_oov").cast("double") / F.col("n_tokens"), 4)
    return agg.select(
        "doc_id",
        "n_tokens",
        "n_oov",
        rate.alias("oov_rate"),
        (rate > OOV_HIGH).alias("is_high_oov"),
    )


N_MIX_HOSTS = 30  # host universe for the routing table (matches mirror ops)


@register(
    "host_lang_mix",
    """
    WITH li AS ({LANG_SQL}),
    h AS (SELECT 'h' || (doc_id % {NH})::VARCHAR AS host, pred_lang
          FROM li),
    g AS (SELECT host, pred_lang, count(*) AS n_docs
          FROM h GROUP BY host, pred_lang),
    t AS (SELECT *, sum(n_docs) OVER (PARTITION BY host) AS host_docs,
                 row_number() OVER (PARTITION BY host
                                    ORDER BY n_docs DESC, pred_lang) AS r
          FROM g)
    SELECT host, pred_lang, n_docs, host_docs::BIGINT AS host_docs,
           round(n_docs::DOUBLE / host_docs, 4) AS share,
           (r = 1) AS is_dominant
    FROM t
    """.replace("{LANG_SQL}", ORACLES["lang_id"]).replace(
        "{NH}", str(N_MIX_HOSTS)
    ),
)
def host_lang_mix(spark, sf_dir):
    """Per-host language mix — the crawl ROUTING table: which hosts
    yield which languages (as PREDICTED by the lang_id classifier the
    pipeline actually runs, its oracle SQL composed verbatim), each
    host's dominant language and its share. This is how a multilingual
    crawl allocates budget against corpus_mix_temperature's quotas: if
    the mix wants more 'de' and h7 is 0.9-dominant 'de', h7's frontier
    budget rises; a host whose dominant share drops between crawls is a
    template/parking-page rot signal.

    Plan shape: the classifier's projection collapses to a (host,
    pred_lang) grid by one map-side-combinable agg — at most
    hosts x langs rows; BOTH windows (host total, dominance rank) run
    over that bounded grid, never the corpus. The corpus is scanned
    once (lang_id is a pure projection over the scan)."""
    li = QUERIES["lang_id"](spark, sf_dir).select(
        F.concat(F.lit("h"), (F.col("doc_id") % N_MIX_HOSTS).cast("string")).alias(
            "host"
        ),
        "pred_lang",
    )
    g = li.groupBy("host", "pred_lang").agg(F.count("*").alias("n_docs"))
    wt = Window.partitionBy("host")
    wr = Window.partitionBy("host").orderBy(F.desc("n_docs"), F.asc("pred_lang"))
    t = g.withColumn("host_docs", F.sum("n_docs").over(wt)).withColumn(
        "r", F.row_number().over(wr)
    )
    return t.select(
        "host",
        "pred_lang",
        "n_docs",
        "host_docs",
        F.round(F.col("n_docs").cast("double") / F.col("host_docs"), 4).alias(
            "share"
        ),
        (F.col("r") == 1).alias("is_dominant"),
    )


@register(
    "link_priority_score",
    f"""
    WITH a AS ({{ANCHOR_SQL}}),
    hd AS ({{HOST_SQL}})
    SELECT a.doc_id,
           a.n_inlinks, a.n_src_hosts,
           round(ln(1 + a.n_inlinks)
                 * (a.n_src_hosts::DOUBLE / a.n_inlinks)
                 * (hd.in_hosts::DOUBLE / hd.in_edges), 4) AS priority
    FROM a
    JOIN hd ON hd.host = 'h' || (a.doc_id % {N_LINK_HOSTS})::VARCHAR
    """.replace("{ANCHOR_SQL}", ORACLES["anchor_text_agg"]).replace(
        "{HOST_SQL}", ORACLES["host_degree_stats"]
    ),
)
def link_priority_score(spark, sf_dir):
    """Link-evidence frontier priority — the score the north-star
    scheduler feeds into queue ranking, built ONLY from link structure
    (available for URLs never yet fetched, which is exactly when a
    frontier must rank them): ln(1+inlinks) volume, damped by page-
    level source-host diversity (many links from one host ~ one vote)
    and by the TARGET host's own in-neighbor diversity (a host fed by
    two neighbors at high edge volume is a link-farm pattern — the
    OPIC/TrustRank-family damping). Composes anchor_text_agg and
    host_degree_stats oracle SQL verbatim, so the score cannot drift
    from the evidence tables it weights; 4dp rounding pins the float
    product cross-engine.

    Plan shape: union of its parts plus ONE host-keyed equi join of the
    page table against the host-universe-sized degree table (broadcast
    at any realistic host count) and a pure projection — no new
    corpus-sized exchange, no window. At 10^10 URLs the score column
    feeds politeness_schedule's queue_rank directly."""
    a = QUERIES["anchor_text_agg"](spark, sf_dir).select(
        "doc_id", "n_inlinks", "n_src_hosts"
    )
    hd = QUERIES["host_degree_stats"](spark, sf_dir).select(
        "host", "in_edges", "in_hosts"
    )
    j = a.withColumn(
        "host",
        F.concat(F.lit("h"), (F.col("doc_id") % N_LINK_HOSTS).cast("string")),
    ).join(F.broadcast(hd), "host")
    pr = F.round(
        F.log(1 + F.col("n_inlinks"))
        * (F.col("n_src_hosts").cast("double") / F.col("n_inlinks"))
        * (F.col("in_hosts").cast("double") / F.col("in_edges")),
        4,
    )
    return j.select("doc_id", "n_inlinks", "n_src_hosts", pr.alias("priority"))


EMB_OUTLIER_Z = 2.0  # z < -2 from the own-label centroid flags the vector


@register(
    "embedding_outlier_flag",
    f"""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
    cent AS (SELECT label AS ck, r.i, round(avg(v[r.i]), 6) AS cv
             FROM e CROSS JOIN range(1, {EMB_DIM + 1}) r(i)
             GROUP BY 1, 2),
    carr AS (SELECT ck, list(cv ORDER BY i) AS c FROM cent GROUP BY ck),
    s AS (SELECT vec_id, label,
                 round(list_dot_product(v, c)
                   / (sqrt(list_dot_product(v, v))
                      * sqrt(list_dot_product(c, c))), 6) AS cos_centroid
          FROM e JOIN carr ON e.label = carr.ck),
    st AS (SELECT label, avg(cos_centroid) AS mu,
                  stddev_pop(cos_centroid) AS sigma
           FROM s GROUP BY label)
    SELECT s.vec_id, s.label, s.cos_centroid,
           round((s.cos_centroid - st.mu) / st.sigma, 4) AS z,
           (round((s.cos_centroid - st.mu) / st.sigma, 4)
              < -{EMB_OUTLIER_Z}) AS is_outlier
    FROM s JOIN st ON s.label = st.label
    WHERE st.sigma > 0
    """,
)
def embedding_outlier_flag(spark, sf_dir):
    """Embedding-hygiene gate before ANN indexing / semantic dedup:
    each vector's cosine to its OWN label centroid, z-scored within the
    label, flagging z < -2 (unusually far from its class). Mislabeled
    vectors, failed encodes, and cross-class contamination sit in that
    tail, and they poison IVF cell assignments and semdedup clusters if
    they reach the index — production vector pipelines run exactly this
    intra-class outlier sweep before training centroids. (The classic
    norm-z variant is degenerate on unit-normalized embeddings — this
    corpus, like any cosine-metric store, has l2 ≡ 1 — so the distance
    statistic must come from direction, not magnitude.) The
    zero_shot_label_match prototypes are reused conceptually: same
    centroid construction, but each vector scores only its own class,
    an equi join instead of the K-way broadcast scan.

    Plan shape: centroids from one posexplode (label, dim) map-side-
    combinable agg (K x EMB_DIM rows); the label-keyed centroid and
    stats tables are LABEL-sized — both ride BroadcastHashJoins at any
    corpus scale; per-vector cosine is a codegen'd array fold (zip_with
    + aggregate, no Python); the stats agg (avg/stddev_pop) is
    mergeable. The vectors shuffle zero times."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = (
        e.select("label", F.posexplode("v").alias("i", "val"))
        .groupBy("label", "i")
        .agg(F.round(F.avg("val"), 6).alias("cv"))
    )
    carr = cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "cv"))), lambda s: s["cv"]
        ).alias("c")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    # s feeds BOTH the stats agg and the flag-back join — materialize it
    # once so the array-fold cosine isn't recomputed per consumer (the
    # repo's shared-subtree pattern; also halves the parquet scans)
    s = (
        e.join(F.broadcast(carr), "label")
        .select(
            "vec_id",
            "label",
            F.round(
                dot(F.col("v"), F.col("c"))
                / (
                    F.sqrt(dot(F.col("v"), F.col("v")))
                    * F.sqrt(dot(F.col("c"), F.col("c")))
                ),
                6,
            ).alias("cos_centroid"),
        )
        .localCheckpoint(eager=False)
    )
    st = s.groupBy("label").agg(
        F.avg("cos_centroid").alias("mu"),
        F.stddev_pop("cos_centroid").alias("sigma"),
    )
    j = s.join(F.broadcast(st.filter(F.col("sigma") > 0)), "label")
    z = F.round((F.col("cos_centroid") - F.col("mu")) / F.col("sigma"), 4)
    return j.select(
        "vec_id",
        "label",
        "cos_centroid",
        z.alias("z"),
        (z < -EMB_OUTLIER_Z).alias("is_outlier"),
    )


FETCH_SLOTS_PER_HOST = 4  # per-host shortlist depth for the link-ranked round


@register(
    "frontier_next_fetch",
    f"""
    WITH p AS ({{PRIORITY_SQL}}),
    r AS (SELECT doc_id,
                 'h' || (doc_id % {N_LINK_HOSTS})::VARCHAR AS host,
                 priority,
                 row_number() OVER (PARTITION BY doc_id % {N_LINK_HOSTS}
                                    ORDER BY priority DESC, doc_id) AS fetch_rank
          FROM p)
    SELECT doc_id, host, priority, fetch_rank
    FROM r WHERE fetch_rank <= {FETCH_SLOTS_PER_HOST}
    """.replace("{PRIORITY_SQL}", ORACLES["link_priority_score"]),
)
def frontier_next_fetch(spark, sf_dir):
    """The capstone scheduling decision the link-evidence stack exists
    for: per host, the top-{FETCH_SLOTS_PER_HOST} never-fetched pages
    by link_priority_score — the shortlist the next crawl round fetches
    within each host's politeness budget. Composes
    link_priority_score's oracle SQL verbatim (which itself composes
    anchor_text_agg + host_degree_stats), so the fetch list provably
    implements the priority it claims: link evidence -> page score ->
    host-bucketed rank -> budget cut, end to end. This is the
    link-aware twin of politeness_schedule (which ranks by stored
    queue_rank): a frontier runs BOTH — queue_rank for crawl-order
    parity on known work, link priority for ordering newly discovered
    URLs that have no history yet.

    Plan shape: its parts plus ONE host-keyed window whose rank filter
    Catalyst rewrites to WindowGroupLimit — every map partition caps
    each host at {FETCH_SLOTS_PER_HOST} rows BEFORE the exchange, so
    the window's shuffle carries at most hosts x slots x partitions
    rows, not the frontier (the politeness_schedule discipline; at
    pathological host skew the adaptive salting of
    frontier.select_fetchable is the documented swap)."""
    p = QUERIES["link_priority_score"](spark, sf_dir)
    w = Window.partitionBy(F.col("doc_id") % N_LINK_HOSTS).orderBy(
        F.desc("priority"), F.asc("doc_id")
    )
    return (
        p.select(
            "doc_id",
            F.concat(
                F.lit("h"), (F.col("doc_id") % N_LINK_HOSTS).cast("string")
            ).alias("host"),
            "priority",
        )
        .withColumn("fetch_rank", F.row_number().over(w))
        .filter(F.col("fetch_rank") <= FETCH_SLOTS_PER_HOST)
    )


# KMV/theta sketch: K minimum hash values per set; theta = the K-th
# smallest (2^60-exhaustive when the set is smaller than K). Set
# EXPRESSIONS over sketches — here intersection cardinality — are what
# HLL cannot do (approx_distinct_diag's sketch only unions).
KMV_K = 32
_KMV_EXH = 1 << 60  # hashes are 60-bit (md5 15-hex); theta for small sets


@register(
    "kmv_intersect_diag",
    f"""
    WITH hu AS (SELECT DISTINCT event_type,
                       {_MD5_INT_SQL.format(c="user_id::VARCHAR")} AS h
                FROM events),
    rk AS (SELECT event_type, h,
                  row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
           FROM hu),
    th AS (SELECT event_type,
                  coalesce(max(CASE WHEN rk = {KMV_K} THEN h END),
                           {_KMV_EXH}) AS theta
           FROM rk GROUP BY event_type),
    sk AS (SELECT r.event_type, r.h
           FROM rk r JOIN th t USING (event_type) WHERE r.h < t.theta),
    est AS (SELECT sa.event_type AS type_a, sb.event_type AS type_b,
                   count(*) AS c
            FROM sk sa JOIN sk sb
              ON sa.h = sb.h AND sa.event_type < sb.event_type
            GROUP BY 1, 2),
    du AS (SELECT DISTINCT event_type, user_id FROM events),
    ex AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                  count(*) AS exact_common
           FROM du a JOIN du b
             ON a.user_id = b.user_id AND a.event_type < b.event_type
           GROUP BY 1, 2)
    SELECT ta.event_type AS type_a, tb.event_type AS type_b,
           coalesce(ex.exact_common, 0) AS exact_common,
           round(coalesce(est.c, 0)
                 / (least(ta.theta, tb.theta) / {_KMV_EXH}.0), 4)
             AS est_common,
           CASE WHEN coalesce(ex.exact_common, 0) > 0 THEN
             round(abs(round(coalesce(est.c, 0)
                       / (least(ta.theta, tb.theta) / {_KMV_EXH}.0), 4)
                       - ex.exact_common) / ex.exact_common, 4) END
             AS rel_err
    FROM th ta
    JOIN th tb ON ta.event_type < tb.event_type
    LEFT JOIN est ON est.type_a = ta.event_type AND est.type_b = tb.event_type
    LEFT JOIN ex ON ex.type_a = ta.event_type AND ex.type_b = tb.event_type
    """,
)
def kmv_intersect_diag(spark, sf_dir):
    """Distinct-set INTERSECTION estimates from KMV/theta sketches, with
    the exact answer beside them — the set-expression capability the
    HLL family lacks (approx_distinct_diag's sketch can only union):
    "how many distinct users did BOTH a purchase AND a signup" without
    a user-level self-join. Per event-type pair: exact common-user
    count, the theta-sketch estimate (count of common sketch hashes
    below min(theta_a, theta_b), scaled by 1/theta), and the relative
    error. Deterministic across engines: the "random" hash is md5 (no
    RNG), theta is an order statistic, and the estimate is a pinned
    double expression rounded 4dp. Sets smaller than K are exhaustive
    (theta = 2^60, estimate == exact — pinned in pytest at sf0.001).

    Scale shape: ONE distinct (type, hash) agg is the only corpus-
    sized work (map-side combinable; at 10^10 rows this is the same
    agg every distinct count needs); ranking windows partition by
    event_type over the distinct-hash table and the K-row sketches
    then drive everything — the pairwise intersection join touches
    K x types rows, not users. The EXACT side exists for evaluation
    only and is the thing you drop at 100 TB: that user-level
    self-join is precisely what the sketch replaces.

    Reference analog: none — Mongo has no sketch ops; this is the
    DataSketches-style capability (Dasgupta et al., "Theta-Sketch
    Framework", public) a production OLAP layer adds."""
    ev = _t(spark, sf_dir, "events")
    hu = ev.select(
        "event_type", _md5_int(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    rk = hu.withColumn("rk", F.row_number().over(w))
    th = rk.groupBy("event_type").agg(
        F.coalesce(
            F.max(F.when(F.col("rk") == KMV_K, F.col("h"))),
            F.lit(_KMV_EXH),
        ).alias("theta")
    )
    sk = (
        rk.join(F.broadcast(th), "event_type")
        .filter(F.col("h") < F.col("theta"))
        .select("event_type", "h")
        .localCheckpoint(eager=False)  # K x types rows, reused per pair
    )
    est = (
        sk.alias("sa")
        .join(
            sk.alias("sb"),
            (F.col("sa.h") == F.col("sb.h"))
            & (F.col("sa.event_type") < F.col("sb.event_type")),
        )
        .groupBy(
            F.col("sa.event_type").alias("type_a"),
            F.col("sb.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("c"))
    )
    du = ev.select("event_type", "user_id").distinct()
    ex = (
        du.alias("a")
        .join(
            du.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("exact_common"))
    )
    pairs = (
        th.alias("ta")
        .join(
            th.alias("tb"),
            F.col("ta.event_type") < F.col("tb.event_type"),
        )
        .select(
            F.col("ta.event_type").alias("type_a"),
            F.col("tb.event_type").alias("type_b"),
            F.least("ta.theta", "tb.theta").alias("theta"),
        )
    )
    est_col = F.round(
        F.coalesce(F.col("c"), F.lit(0))
        / (F.col("theta") / F.lit(float(_KMV_EXH))),
        4,
    )
    j = pairs.join(est, ["type_a", "type_b"], "left").join(
        ex, ["type_a", "type_b"], "left"
    )
    exact = F.coalesce(F.col("exact_common"), F.lit(0))
    return j.select(
        "type_a",
        "type_b",
        exact.alias("exact_common"),
        est_col.alias("est_common"),
        F.when(
            exact > 0, F.round(F.abs(est_col - exact) / exact, 4)
        ).alias("rel_err"),
    )


# RAG/pretraining chunking: fixed-size token windows with overlap so no
# sentence is orphaned at a boundary; stride = CHUNK - OVERLAP.
CHUNK_TOKS = 32
CHUNK_OVERLAP = 8
_CHUNK_STRIDE = CHUNK_TOKS - CHUNK_OVERLAP


@register(
    "chunk_split",
    f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS_RAW_SQL} AS toks,
                      len({_TOKS_RAW_SQL}) AS n
               FROM documents),
    s AS (SELECT doc_id, lang, toks, n,
                 unnest(range(1, n + 1, {_CHUNK_STRIDE})) AS start
          FROM t)
    SELECT doc_id, lang,
           ((start - 1) / {_CHUNK_STRIDE})::BIGINT AS chunk_id,
           start::BIGINT AS start_tok,
           least({CHUNK_TOKS}, n - start + 1)::BIGINT AS n_toks,
           {_MD5_INT_SQL.format(
               c=f"array_to_string(list_slice(toks, start, start + {CHUNK_TOKS} - 1), ' ')"
           )} AS chunk_fp
    FROM s
    """,
)
def chunk_split(spark, sf_dir):
    """Fixed-window token chunking with overlap — the splitter every
    RAG index and long-context pretraining pipeline runs before
    embedding: {CHUNK_TOKS}-token windows at stride {_CHUNK_STRIDE}
    ({CHUNK_OVERLAP}-token overlap so boundary sentences appear in two
    chunks), per chunk a content fingerprint for chunk-level dedup
    (the dup_span_detect granularity, productized). Every token lands
    in at least one chunk; chunk boundaries are a pure function of the
    token sequence — stable under repartition and corpus growth, so
    chunk ids are durable index keys.

    Plan shape: one projection + one explode of the per-doc start
    sequence (output rows ~ n_tokens/stride — LINEAR in corpus tokens,
    smaller than the token explode every LM op already does); the
    slice/join/hash are codegen array expressions; ZERO exchanges, no
    Python. At 100 TB this runs at scan speed and writes
    chunk-partitioned output for the embedding stage."""
    t = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.split(F.lower("text"), r"\s+").alias("toks"),
    ).withColumn("n", F.size("toks"))
    s = t.withColumn(
        "start",
        F.explode(F.sequence(F.lit(1), F.col("n"), F.lit(_CHUNK_STRIDE))),
    )
    chunk = F.slice(F.col("toks"), F.col("start"), CHUNK_TOKS)
    return s.select(
        "doc_id",
        "lang",
        ((F.col("start") - 1) / _CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start_tok"),
        F.least(F.lit(CHUNK_TOKS), F.col("n") - F.col("start") + 1)
        .cast("long")
        .alias("n_toks"),
        _md5_int(F.array_join(chunk, " ")).alias("chunk_fp"),
    )


# Stable evaluation holdout: bottom-K-by-content-hash per language.
# Bottom-k sampling is COHERENT under growth (a new doc only enters the
# sample by having a smaller hash, evicting exactly one) and keyed on
# the dedup fingerprint so the holdout can never contain two copies of
# the same text.
HOLDOUT_K = 20


@register(
    "eval_holdout_sample",
    f"""
    WITH fp AS (SELECT doc_id, lang, {_CONTENT_FP_SQL} AS content_fp
                FROM documents),
    rep AS (SELECT lang, content_fp, min(doc_id) AS doc_id
            FROM fp GROUP BY lang, content_fp),
    rk AS (SELECT lang, content_fp, doc_id,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY content_fp) AS rk
           FROM rep)
    SELECT lang, doc_id, content_fp, rk
    FROM rk WHERE rk <= {HOLDOUT_K}
    """,
)
def eval_holdout_sample(spark, sf_dir):
    """Per-language evaluation holdout via bottom-K-by-hash sampling —
    the KMV sketch's bottom-k mechanics applied to SAMPLING: the K
    docs with the smallest content fingerprint per language. Three
    properties a growing crawl needs that random sampling lacks:
    DETERMINISTIC (no RNG, same sample on every run and every cluster
    size), COHERENT under growth (a new crawl round changes the sample
    one eviction at a time, never reshuffles it — human eval annotations
    stay valid across rounds), and DEDUP-SAFE (keyed on dedup_exact's
    fingerprint with a min-doc_id representative per duplicate group,
    so the holdout can never contain the same text twice). The split
    discipline of dataset_split_assign, specialized to fixed-size eval
    sets.

    Plan shape: fingerprint projection, one (lang, fp) map-side-
    combinable agg collapsing duplicate groups, then a lang-keyed
    rank whose <=K filter compiles to WindowGroupLimit (map partitions
    cap each language at K rows before the exchange). Nothing is
    corpus-sized after the first agg."""
    d = _t(spark, sf_dir, "documents")
    fp = _md5_int(F.array_join(F.array_sort(_toks_col()), " "))
    rep = (
        d.select("doc_id", "lang", fp.alias("content_fp"))
        .groupBy("lang", "content_fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    w = Window.partitionBy("lang").orderBy("content_fp")
    return (
        rep.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= HOLDOUT_K)
        .select("lang", "doc_id", "content_fp", "rk")
    )


@register(
    "quality_calibration",
    """
    WITH q AS ({QSCORE_SQL}),
    r AS ({REP_SQL}),
    e AS ({ENT_SQL}),
    dx AS ({DEDUP_SQL}),
    fp AS (SELECT doc_id, {MD5_TEXT} AS content_fp FROM documents),
    j AS (SELECT q.doc_id, floor(q.qscore * 10)::INT AS score_bin,
                 r.is_repetitive, e.is_low_entropy,
                 (dx.n_dups >= 2) AS is_exact_dup
          FROM q
          JOIN r ON q.doc_id = r.doc_id
          JOIN e ON q.doc_id = e.doc_id
          JOIN fp ON q.doc_id = fp.doc_id
          JOIN dx ON fp.content_fp = dx.content_fp)
    SELECT score_bin,
           count(*) AS n_docs,
           count(*) FILTER (WHERE is_repetitive) AS n_repetitive,
           count(*) FILTER (WHERE is_low_entropy) AS n_low_entropy,
           count(*) FILTER (WHERE is_exact_dup) AS n_exact_dup,
           round(count(*) FILTER (WHERE is_repetitive)::DOUBLE
                 / count(*), 4) AS repetitive_share,
           round(count(*) FILTER (WHERE is_low_entropy)::DOUBLE
                 / count(*), 4) AS low_entropy_share,
           round(count(*) FILTER (WHERE is_exact_dup)::DOUBLE
                 / count(*), 4) AS exact_dup_share
    FROM j GROUP BY score_bin
    """.replace("{QSCORE_SQL}", ORACLES["quality_score"])
    .replace("{REP_SQL}", ORACLES["repetition_quality"])
    .replace("{ENT_SQL}", ORACLES["token_entropy_quality"])
    .replace("{DEDUP_SQL}", ORACLES["dedup_exact"])
    .replace("{MD5_TEXT}", _MD5_INT_SQL.format(c="text")),
)
def quality_calibration(spark, sf_dir):
    """Calibration table for the quality stack: per 0.1-wide
    quality_score bin, how often do the EXPENSIVE gates fire — the
    repetition gate (Gopher-style), the entropy gate, and exact-dup
    membership. This is the table that justifies (or kills) using the
    cheap score as a pre-filter at 100 TB: if the low bins carry the
    flagged mass, the pipeline can run the cheap projection first and
    reserve the explode-heavy gates for the survivors; if not, the
    score is decoration. The dedup_layer_agreement discipline applied
    to QUALITY instead of duplication. Composes four registered
    operators' oracle SQL verbatim, so the calibration cannot drift
    from the gates it audits.

    Plan shape: four doc-keyed equi joins of tables the constituent
    plans already produce (no new corpus explode — the gates' own
    subtrees dominate), one map-side-combinable agg on the 11-bin key.
    The bin expression is floor(qscore*10) on the SAME 4dp-rounded
    double in both engines — bit-identical binning."""
    q = QUERIES["quality_score"](spark, sf_dir).select("doc_id", "qscore")
    r = QUERIES["repetition_quality"](spark, sf_dir).select(
        "doc_id", "is_repetitive"
    )
    e = QUERIES["token_entropy_quality"](spark, sf_dir).select(
        "doc_id", "is_low_entropy"
    )
    dx = QUERIES["dedup_exact"](spark, sf_dir).select("content_fp", "n_dups")
    fp = _t(spark, sf_dir, "documents").select(
        "doc_id", _md5_int(F.col("text")).alias("content_fp")
    )
    j = (
        q.join(r, "doc_id")
        .join(e, "doc_id")
        .join(fp, "doc_id")
        .join(dx, "content_fp")
        .select(
            F.floor(F.col("qscore") * 10).cast("int").alias("score_bin"),
            "is_repetitive",
            "is_low_entropy",
            (F.col("n_dups") >= 2).alias("is_exact_dup"),
        )
    )
    cnt = F.count("*")
    n_rep = F.count(F.when(F.col("is_repetitive"), 1))
    n_ent = F.count(F.when(F.col("is_low_entropy"), 1))
    n_dup = F.count(F.when(F.col("is_exact_dup"), 1))
    return j.groupBy("score_bin").agg(
        cnt.alias("n_docs"),
        n_rep.alias("n_repetitive"),
        n_ent.alias("n_low_entropy"),
        n_dup.alias("n_exact_dup"),
        F.round(n_rep.cast("double") / cnt, 4).alias("repetitive_share"),
        F.round(n_ent.cast("double") / cnt, 4).alias("low_entropy_share"),
        F.round(n_dup.cast("double") / cnt, 4).alias("exact_dup_share"),
    )


# Exponentially-weighted engagement: weight alpha^(steps-behind-latest),
# alpha chosen so ~last 10 events carry most of the mass.
EWMA_ALPHA = 0.8


@register(
    "user_engagement_ewma",
    f"""
    WITH r AS (SELECT user_id, value,
                      row_number() OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS i,
                      count(*) OVER (PARTITION BY user_id) AS n
               FROM events)
    SELECT user_id, max(n)::BIGINT AS n_events,
           round(sum(value * pow({EWMA_ALPHA}, n - i)), 4) AS ewma_value,
           round(sum(value * pow({EWMA_ALPHA}, n - i))
                 * (1 - {EWMA_ALPHA}), 4) AS ewma_normalized
    FROM r GROUP BY user_id
    """,
)
def user_engagement_ewma(spark, sf_dir):
    """Time-decayed engagement score per user: each event's value is
    weighted alpha^(steps behind the user's latest event) and summed —
    the recency-weighted aggregate every ranking/abuse system keeps
    (recent behavior dominates, history decays geometrically instead
    of falling off a cliff at a window edge). The closed form
    sum(v_i * alpha^(n-i)) is EXACTLY the recurrence
    ewma := alpha * ewma + v applied in event order, computed
    set-at-a-time: no per-user iteration, no stateful scan. The same
    decay drives crawl-side host reputation (a host's recent failures
    outweigh last month's successes) — this is the mechanics, on the
    table the fixture set provides.

    Plan shape: ONE user-keyed window pass (rank + count share the
    exchange) and one map-side-combinable agg — two exchanges total,
    both on user_id; pow/mult are codegen. 4dp rounding pins the
    float sum cross-engine."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wu = Window.partitionBy("user_id")
    r = _t(spark, sf_dir, "events").select(
        "user_id",
        "value",
        F.row_number().over(w).alias("i"),
        F.count("*").over(wu).alias("n"),
    )
    s = F.sum(F.col("value") * F.pow(F.lit(EWMA_ALPHA), F.col("n") - F.col("i")))
    return r.groupBy("user_id").agg(
        F.max("n").alias("n_events"),
        F.round(s, 4).alias("ewma_value"),
        F.round(s * (1 - EWMA_ALPHA), 4).alias("ewma_normalized"),
    )


SRC_QUALITY_LOW_PCT = 0.1  # bottom decile within source is flagged


@register(
    "source_relative_quality",
    """
    WITH q AS ({QSCORE_SQL}),
    s AS (SELECT doc_id, source FROM documents),
    r AS (SELECT q.doc_id, s.source, q.qscore,
                 percent_rank() OVER (PARTITION BY s.source
                                      ORDER BY q.qscore, q.doc_id) AS pct
          FROM q JOIN s ON q.doc_id = s.doc_id)
    SELECT doc_id, source, qscore, round(pct, 4) AS pct_in_source,
           (round(pct, 4) < {LOW}) AS is_source_low
    FROM r
    """.replace("{QSCORE_SQL}", ORACLES["quality_score"]).replace(
        "{LOW}", str(SRC_QUALITY_LOW_PCT)
    ),
)
def source_relative_quality(spark, sf_dir):
    """Source-RELATIVE quality normalization: each doc's percentile
    rank within its own source, flagging the bottom decile — the fix
    for the classic curation failure where one absolute threshold
    either guts a verbose source or lets a terse one through wholesale
    (sources have different score distributions; quality_ks_drift
    MEASURES that, this op CORRECTS for it). Thresholding on
    within-source percentile keeps the per-source drop rate constant
    by construction. Composes quality_score's oracle SQL verbatim;
    (qscore, doc_id) ordering makes the rank tie-free and
    deterministic.

    Plan shape: one source-keyed window over the scored projection
    (the corpus exchanges ONCE on source — no SinglePartition; a
    percentile never needs a global sort when the population is the
    partition) plus the doc-keyed score join. At 100 TB this is the
    same two keyed exchanges."""
    q = QUERIES["quality_score"](spark, sf_dir).select("doc_id", "qscore")
    s = _t(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy("qscore", "doc_id")
    r = q.join(s, "doc_id").withColumn("pct", F.percent_rank().over(w))
    return r.select(
        "doc_id",
        "source",
        "qscore",
        F.round("pct", 4).alias("pct_in_source"),
        (F.round("pct", 4) < SRC_QUALITY_LOW_PCT).alias("is_source_low"),
    )


@register(
    "dedup_tier_kappa",
    """
    WITH a AS ({AGREE_SQL}),
    c AS (SELECT count(*) AS n,
                 count(*) FILTER (WHERE exact_dup AND simhash_near) AS yy,
                 count(*) FILTER (WHERE exact_dup AND NOT simhash_near) AS yn,
                 count(*) FILTER (WHERE NOT exact_dup AND simhash_near) AS ny,
                 count(*) FILTER (WHERE NOT exact_dup AND NOT simhash_near) AS nn
          FROM a)
    SELECT n, yy, yn, ny, nn,
           round((yy + nn)::DOUBLE / n, 4) AS observed_agreement,
           round(((yy + yn)::DOUBLE * (yy + ny)
                  + (ny + nn)::DOUBLE * (yn + nn)) / (n::DOUBLE * n), 4)
             AS chance_agreement,
           round(((yy + nn)::DOUBLE / n
                  - ((yy + yn)::DOUBLE * (yy + ny)
                     + (ny + nn)::DOUBLE * (yn + nn)) / (n::DOUBLE * n))
                 / (1 - ((yy + yn)::DOUBLE * (yy + ny)
                         + (ny + nn)::DOUBLE * (yn + nn))
                        / (n::DOUBLE * n)), 4) AS kappa
    FROM c
    """.replace("{AGREE_SQL}", ORACLES["dedup_layer_agreement"]),
)
def dedup_tier_kappa(spark, sf_dir):
    """Cohen's kappa between the exact-dup tier and the SimHash tier
    over the LSH near-dup pair stream — one number summarizing what
    dedup_layer_agreement tabulates pair-by-pair: how much the cheap
    tiers agree BEYOND CHANCE. Raw agreement flatters tiers that both
    say "no" on almost every pair; kappa corrects for the marginals,
    which is why annotation pipelines report it instead. A kappa
    collapse between crawls flags a tier whose threshold has drifted
    off the corpus (e.g. simhash radius too tight after a language-mix
    shift) BEFORE it silently changes what dedup removes. Composes
    dedup_layer_agreement's oracle SQL verbatim.

    Plan shape: the agreement table's own plan, then ONE
    single-partition fold of four counts (a 1-row reduction — the
    countif_diagnostics precedent); every term of kappa is exact
    integer arithmetic until the final 4dp-rounded divisions."""
    a = QUERIES["dedup_layer_agreement"](spark, sf_dir)
    c = a.agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("exact_dup") & F.col("simhash_near"), 1)).alias("yy"),
        F.count(F.when(F.col("exact_dup") & ~F.col("simhash_near"), 1)).alias("yn"),
        F.count(F.when(~F.col("exact_dup") & F.col("simhash_near"), 1)).alias("ny"),
        F.count(
            F.when(~F.col("exact_dup") & ~F.col("simhash_near"), 1)
        ).alias("nn"),
    )
    n = F.col("n").cast("double")
    po = (F.col("yy") + F.col("nn")) / n
    pe = (
        (F.col("yy") + F.col("yn")).cast("double") * (F.col("yy") + F.col("ny"))
        + (F.col("ny") + F.col("nn")).cast("double") * (F.col("yn") + F.col("nn"))
    ) / (n * n)
    return c.select(
        "n",
        "yy",
        "yn",
        "ny",
        "nn",
        F.round(po, 4).alias("observed_agreement"),
        F.round(pe, 4).alias("chance_agreement"),
        F.round((po - pe) / (1 - pe), 4).alias("kappa"),
    )


# Funnel steps in order; a later step only counts if it happens strictly
# after the user's earliest completion of the previous step.
FUNNEL_STEPS = ("view", "click", "purchase")


@register(
    "funnel_conversion",
    f"""
    WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id),
    s2 AS (SELECT e.user_id, min(e.ts) AS t2
           FROM events e JOIN s1 ON e.user_id = s1.user_id
           WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t1
           GROUP BY e.user_id),
    s3 AS (SELECT e.user_id, min(e.ts) AS t3
           FROM events e JOIN s2 ON e.user_id = s2.user_id
           WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t2
           GROUP BY e.user_id),
    u AS (SELECT DISTINCT user_id FROM events)
    SELECT u.user_id,
           CAST(floor(epoch(s1.t1)) AS BIGINT) AS t1,
           CAST(floor(epoch(s2.t2)) AS BIGINT) AS t2,
           CAST(floor(epoch(s3.t3)) AS BIGINT) AS t3,
           (CASE WHEN s3.t3 IS NOT NULL THEN 3
                 WHEN s2.t2 IS NOT NULL THEN 2
                 WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END) AS reached_step
    FROM u
    LEFT JOIN s1 ON u.user_id = s1.user_id
    LEFT JOIN s2 ON u.user_id = s2.user_id
    LEFT JOIN s3 ON u.user_id = s3.user_id
    """,
)
def funnel_conversion(spark, sf_dir):
    """Ordered-funnel analysis: per user, the earliest strictly-ordered
    view -> click -> purchase chain (each step's timestamp is the
    earliest occurrence AFTER the previous step's earliest completion)
    and the furthest step reached — the conversion table every product
    analytics layer computes, and a sequence-pattern query family the
    engine didn't cover (event_sessions groups by gaps; this matches
    ORDER). The greedy earliest-chain rule is the standard funnel
    semantics (a later view can't resurrect a dead funnel) and makes
    the result a pure function of the event set.

    Plan shape: K=3 user-keyed aggregates, each one map-side-
    combinable min over a type-filtered slice joined to the previous
    frontier — all exchanges on user_id, reused across steps by AQE;
    no window over raw events, no per-user iteration. At 100 TB each
    step's filter prunes to one event type BEFORE its join."""
    ev = _t(spark, sf_dir, "events")
    s1 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[1])
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[2])
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    u = ev.select("user_id").distinct()
    j = (
        u.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
    )
    # epoch-seconds output per the module convention (header: timestamps
    # compared as epoch seconds, TZ-proof) — raw TIMESTAMP columns render
    # tz-aware in one engine and naive in the other on Arrow fetch paths
    return j.select(
        "user_id",
        F.unix_timestamp("t1").alias("t1"),
        F.unix_timestamp("t2").alias("t2"),
        F.unix_timestamp("t3").alias("t3"),
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
        .alias("reached_step"),
    )


_WEEK_S = 7 * 24 * 3600
_EPOCH0 = "2024-01-01 00:00:00"  # fixture epoch (TESTDATA.md events start)


@register(
    "retention_cohorts",
    f"""
    WITH w AS (SELECT user_id,
                      ((floor(epoch(ts))::BIGINT
                        - floor(epoch(TIMESTAMP '{_EPOCH0}'))::BIGINT)
                        // {_WEEK_S})::INT AS week
               FROM events),
    first AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id),
    act AS (SELECT DISTINCT w.user_id, f.cohort_week,
                   (w.week - f.cohort_week) AS week_offset
            FROM w JOIN first f ON w.user_id = f.user_id),
    size AS (SELECT cohort_week, count(*) AS cohort_users
             FROM first GROUP BY cohort_week)
    SELECT a.cohort_week, a.week_offset,
           count(*) AS active_users,
           s.cohort_users,
           round(count(*)::DOUBLE / s.cohort_users, 4) AS retention
    FROM act a JOIN size s ON a.cohort_week = s.cohort_week
    GROUP BY a.cohort_week, a.week_offset, s.cohort_users
    """,
)
def retention_cohorts(spark, sf_dir):
    """Weekly retention cohort table: users grouped by first-active
    week, tracked by distinct activity in each subsequent week, with
    the retention share against the cohort's size — the
    triangle-shaped table every growth dashboard renders, and the
    evaluation twin of recrawl freshness (a host cohort's 'retention'
    is its re-fetch hit rate). Week boundaries are integer arithmetic
    on epoch seconds from a fixed origin — no calendar functions, so
    both engines bin identically and the result is timezone-free.

    Plan shape: week projection, one user-keyed min (cohort
    assignment), a distinct on (user, offset) — map-side combinable —
    then a cohort-keyed agg joined to the cohort-size table
    (weeks-universe-sized, broadcast at any scale). All corpus-sized
    exchanges key on user_id."""
    ev = _t(spark, sf_dir, "events")
    week = (
        (
            F.unix_timestamp("ts")
            - F.unix_timestamp(F.lit(_EPOCH0).cast("timestamp"))
        )
        / _WEEK_S
    ).cast("int")
    w = ev.select("user_id", week.alias("week"))
    first = w.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    act = (
        w.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
    )
    size = first.groupBy("cohort_week").agg(F.count("*").alias("cohort_users"))
    return (
        act.groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("active_users"))
        .join(F.broadcast(size), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            "active_users",
            "cohort_users",
            F.round(
                F.col("active_users").cast("double") / F.col("cohort_users"), 4
            ).alias("retention"),
        )
    )


@register(
    "triangle_count_hosts",
    f"""
    WITH e0 AS ({_LINK_EDGE_SQL}),
    he AS (SELECT DISTINCT least(src_host, 'h' || (dst % {N_LINK_HOSTS})::VARCHAR) AS a,
                  greatest(src_host, 'h' || (dst % {N_LINK_HOSTS})::VARCHAR) AS b
           FROM e0
           WHERE src_host <> 'h' || (dst % {N_LINK_HOSTS})::VARCHAR),
    tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM he e1
            JOIN he e2 ON e1.b = e2.a
            JOIN he e3 ON e3.a = e1.a AND e3.b = e2.b)
    SELECT host, count(*) AS n_triangles FROM (
      SELECT x AS host FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri)
    GROUP BY host
    """,
)
def triangle_count_hosts(spark, sf_dir):
    """Triangle counting on the host graph — the standard distributed
    graph kernel (clustering-coefficient numerator): per host, how
    many closed triples it participates in. Dense triangle
    neighborhoods distinguish organic topical clusters from link-farm
    stars (farms have huge degree but star topology ~ zero triangles
    — the degree table of host_degree_stats can't see that
    difference; triangles can). Edges are canonicalized a<b so each
    triangle is generated exactly once as x<y<z, then each corner is
    credited.

    Plan shape: the classic two-path + closing-edge join — two
    host-keyed equi joins over the DEDUPLICATED host-edge table
    (always orders smaller than the page graph), one union + hash agg
    for corner credit. The a<b orientation is the textbook trick that
    stops double counting AND bounds the join fan-out (each wedge
    generated once). At web scale the orientation is by degree, which
    this canonical ordering approximates on the fixture's near-uniform
    degrees; 0 CartesianProduct (plan-pinned)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    e0 = _link_edges(docs).select(
        "src_host",
        F.concat(F.lit("h"), (F.col("dst") % N_LINK_HOSTS).cast("string")).alias(
            "dst_host"
        ),
    ).filter(F.col("src_host") != F.col("dst_host"))
    he = (
        e0.select(
            F.least("src_host", "dst_host").alias("a"),
            F.greatest("src_host", "dst_host").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # three consumers of the edge set
    )
    e1 = he.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = he.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = he.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    corners = (
        tri.select(F.col("x").alias("host"))
        .unionAll(tri.select(F.col("y").alias("host")))
        .unionAll(tri.select(F.col("z").alias("host")))
    )
    return corners.groupBy("host").agg(F.count("*").alias("n_triangles"))


# Efraimidis-Spirakis weighted sampling: rank on ln(u)/w where u is a
# deterministic hash-uniform in (0,1) and w is the doc's quality score —
# the k largest keys ARE a weighted-without-replacement sample.
AES_SAMPLE_K = 25


@register(
    "weighted_sample_aes",
    f"""
    WITH q AS ({{QSCORE_SQL}}),
    u AS (SELECT doc_id,
                 ({_MD5_INT_SQL.format(c="doc_id::VARCHAR")} + 1)
                   / 1152921504606846977.0 AS unif
          FROM documents),
    k AS (SELECT q.doc_id, q.qscore, u.unif,
                 ln(u.unif) / greatest(q.qscore, 0.0001) AS key
          FROM q JOIN u ON q.doc_id = u.doc_id),
    r AS (SELECT doc_id, qscore, round(key, 6) AS sample_key,
                 row_number() OVER (ORDER BY key DESC, doc_id) AS rk
          FROM k)
    SELECT doc_id, qscore, sample_key, rk
    FROM r WHERE rk <= {AES_SAMPLE_K}
    """.replace("{QSCORE_SQL}", ORACLES["quality_score"]),
)
def weighted_sample_aes(spark, sf_dir):
    """Weighted sampling WITHOUT replacement, deterministic: the
    Efraimidis-Spirakis A-ES scheme (keys u^(1/w), taken here in the
    numerically-safer log form ln(u)/w) with the uniform u derived from
    a hash instead of an RNG — each doc's inclusion probability is
    proportional to its quality score, yet the sample is a pure
    function of the corpus (reproducible across runs, clusters, and
    engines — the property that makes a quality-weighted training
    subsample auditable). This is the weighted complement of
    eval_holdout_sample's uniform bottom-k: holdouts must be unbiased,
    training subsamples usually want quality bias.

    Plan shape: score projection + hash-uniform projection joined on
    doc_id, then ONE top-K — the rank filter over a global ORDER
    compiles to TakeOrderedAndProject via InferWindowGroupLimit
    semantics at the filter (per-partition top-K + driver merge of K
    rows, never a global sort). At 100 TB the K rows are the only
    thing that leaves the executors."""
    q = QUERIES["quality_score"](spark, sf_dir).select("doc_id", "qscore")
    u = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (
            (_md5_int(F.col("doc_id").cast("string")) + 1)
            / F.lit(1152921504606846977.0)
        ).alias("unif"),
    )
    k = q.join(u, "doc_id").select(
        "doc_id",
        "qscore",
        (F.log("unif") / F.greatest(F.col("qscore"), F.lit(0.0001))).alias("key"),
    )
    w = Window.orderBy(F.desc("key"), F.asc("doc_id"))
    return (
        k.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= AES_SAMPLE_K)
        .select(
            "doc_id",
            "qscore",
            F.round("key", 6).alias("sample_key"),
            "rk",
        )
    )


MIX_SAMPLE_TOTAL = 60  # docs drawn for the rebalanced mix manifest


@register(
    "mix_rebalance_sample",
    f"""
    WITH mix AS ({{MIX_SQL}}),
    quota AS (SELECT lang,
                     floor({MIX_SAMPLE_TOTAL} * weight)::BIGINT AS take
              FROM mix),
    fp AS (SELECT doc_id, lang, {_CONTENT_FP_SQL} AS content_fp
           FROM documents),
    rep AS (SELECT lang, content_fp, min(doc_id) AS doc_id
            FROM fp GROUP BY lang, content_fp),
    rk AS (SELECT lang, doc_id, content_fp,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY content_fp) AS rk
           FROM rep)
    SELECT r.lang, r.doc_id, r.rk, q.take
    FROM rk r JOIN quota q ON r.lang = q.lang
    WHERE r.rk <= q.take
    """.replace("{MIX_SQL}", ORACLES["corpus_mix_temperature"]),
)
def mix_rebalance_sample(spark, sf_dir):
    """The ARTIFACT corpus_mix_temperature's quotas exist for: the
    actual rebalanced document manifest — per language, the
    temperature-derived share of a {MIX_SAMPLE_TOTAL}-doc mix, drawn
    by the bottom-k-by-content-hash rule (eval_holdout_sample's
    mechanics), so the draw is deterministic, dedup-safe, and coherent
    as the corpus grows. Composes corpus_mix_temperature's oracle SQL
    verbatim for the quota — the manifest cannot drift from the mixing
    policy it implements (the curation_keep_list discipline, applied
    to sampling).

    Plan shape: the quota table is language-sized (broadcast); the
    draw is the holdout's plan — dedup agg + lang-keyed
    WindowGroupLimit rank — with a quota join instead of a constant K.
    Nothing corpus-sized after the first agg."""
    mix = QUERIES["corpus_mix_temperature"](spark, sf_dir).select(
        "lang", F.floor(MIX_SAMPLE_TOTAL * F.col("weight")).alias("take")
    )
    d = _t(spark, sf_dir, "documents")
    fp = _md5_int(F.array_join(F.array_sort(_toks_col()), " "))
    rep = (
        d.select("doc_id", "lang", fp.alias("content_fp"))
        .groupBy("lang", "content_fp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    w = Window.partitionBy("lang").orderBy("content_fp")
    return (
        rep.withColumn("rk", F.row_number().over(w))
        .join(F.broadcast(mix), "lang")
        .filter(F.col("rk") <= F.col("take"))
        .select("lang", "doc_id", "rk", "take")
    )


EQUIDEPTH_K = 10  # equi-depth buckets (each holds ~n/K rows by construction)


@register(
    "value_equidepth_buckets",
    f"""
    WITH r AS (SELECT value,
                      ntile({EQUIDEPTH_K}) OVER (ORDER BY value, event_id)
                        AS bucket
               FROM events)
    SELECT bucket, count(*) AS n_rows,
           round(min(value), 2) AS lo, round(max(value), 2) AS hi
    FROM r GROUP BY bucket
    """,
)
def value_equidepth_buckets(spark, sf_dir):
    """Equi-depth (equal-height) histogram of the value column: K
    buckets holding ~n/K rows each, with their boundary values — the
    histogram query optimizers and skew monitors actually want
    (equi-WIDTH bins lie under skew; equi-depth boundaries ARE the
    quantiles). The DuckDB oracle is plain ntile(); the Spark side
    must produce ntile's exact assignment WITHOUT the single-partition
    global sort ntile implies — so it reuses the engine's census
    machinery (frontier.global_fifo_rank: range-repartition parallel
    sort + per-partition offsets from an n_parts-row census) and then
    computes ntile's bucket arithmetic from the global rank in closed
    form: the first n %% K buckets hold ceil(n/K), the rest floor(n/K)
    — integer-exact, so the hash-match proves the parallel rank equals
    the serial window.

    Plan shape: one range exchange (the parallel total sort) + one
    hash agg on the K-row bucket key; no SinglePartition exchange
    anywhere (plan-pinned) — the same property the SURT index and the
    shard packers rely on, evidenced here against a window-function
    oracle."""
    from .frontier import global_fifo_rank

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    ranked = global_fifo_rank(ev, ("value", "event_id"), "rk")
    n = ranked.count()
    big = n % EQUIDEPTH_K  # buckets 1..big hold (n // K + 1) rows
    size_big = n // EQUIDEPTH_K + 1
    size_small = n // EQUIDEPTH_K
    cut = big * size_big
    bucket = F.when(
        F.col("rk") <= cut,
        ((F.col("rk") - 1) / size_big).cast("long") + 1,
    ).otherwise(
        ((F.col("rk") - 1 - cut) / F.lit(max(size_small, 1))).cast("long")
        + big
        + 1
    )
    return (
        ranked.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


AIMD_DELAY0 = 5.0  # reference DOWNLOAD_DELAY (settings.py:122-130)
AIMD_CAP = 60.0  # never slower than one fetch per minute
AIMD_FLOOR = 1.0  # never faster than 1 req/s
AIMD_UP = 2.0  # multiplicative increase of delay on failure
AIMD_DOWN = 0.9  # gentle decrease on success
N_AIMD_HOSTS = 40
AIMD_FAIL_MOD = 7  # deterministic outcome: fail when o_orderkey % 7 == 0


def aimd_fold_expr(hist: str = "_hist", seed: str | None = None):
    """THE AIMD politeness fold as a Catalyst higher-order expression —
    shared by the registered adaptive_crawl_delay operator, the live
    loop's per-round host_delay state update (loop.py, seeded from each
    host's previous delay so the fold is incremental, never a
    re-fold of all history), and mirrored by the streaming twin
    (streaming.host_delay_fn). ``hist`` names an array<struct> column
    whose ``fail`` field is 1.0/0.0 in fold order; ``seed`` is a SQL
    expression for the starting delay (defaults to AIMD_DELAY0)."""
    s = seed if seed is not None else f"CAST({AIMD_DELAY0} AS DOUBLE)"
    return F.expr(
        f"aggregate(transform({hist}, s -> s.fail), {s},"
        f" (acc, x) -> CASE WHEN x = 1.0D"
        f" THEN least(CAST({AIMD_CAP} AS DOUBLE), acc * {AIMD_UP}D)"
        f" ELSE greatest(CAST({AIMD_FLOOR} AS DOUBLE), acc * {AIMD_DOWN}D) END)"
    )


@register(
    "adaptive_crawl_delay",
    f"""
    WITH o AS (SELECT 'h' || (o_custkey % {N_AIMD_HOSTS})::VARCHAR AS host,
                      o_orderkey,
                      CASE WHEN o_orderkey % {AIMD_FAIL_MOD} = 0
                           THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS fail
               FROM orders),
    h AS (SELECT host,
                 list(fail ORDER BY o_orderkey) AS outcomes,
                 count(*) AS n_rounds,
                 CAST(sum(fail) AS BIGINT) AS n_fails
          FROM o GROUP BY host)
    SELECT host, n_rounds, n_fails,
           round(list_reduce(list_prepend({AIMD_DELAY0}::DOUBLE, outcomes),
                 (acc, x) -> CASE WHEN x = 1.0
                      THEN least({AIMD_CAP}::DOUBLE, acc * {AIMD_UP}::DOUBLE)
                      ELSE greatest({AIMD_FLOOR}::DOUBLE,
                                    acc * {AIMD_DOWN}::DOUBLE) END),
                 4) AS delay_s,
           CAST(floor(3600.0 / round(list_reduce(
                 list_prepend({AIMD_DELAY0}::DOUBLE, outcomes),
                 (acc, x) -> CASE WHEN x = 1.0
                      THEN least({AIMD_CAP}::DOUBLE, acc * {AIMD_UP}::DOUBLE)
                      ELSE greatest({AIMD_FLOOR}::DOUBLE,
                                    acc * {AIMD_DOWN}::DOUBLE) END),
                 4)) AS BIGINT) AS next_round_budget
    FROM h
    """,
)
def adaptive_crawl_delay(spark, sf_dir):
    """AIMD politeness controller as a DATA fold: each host's fetch
    history (deterministic stand-in outcomes over orders) folds into
    its next crawl delay — delay doubles on a failure (the 429/timeout
    reaction every polite crawler implements), decays by {AIMD_DOWN} on
    success, clamped to [{AIMD_FLOOR}, {AIMD_CAP}]s — and the resulting
    per-host budget is exactly what select_fetchable's policy join
    consumes next round. The reference pins DOWNLOAD_DELAY=5 statically
    (settings.py:122-130) and Scrapy's AutoThrottle does this
    reactively in-process; here the controller is a set-at-a-time
    operator over the fetch log.

    Engine shape: the fold is SEQUENTIAL per host but the plan never
    leaves the JVM — collect the host's outcome flags into an ordered
    array (one map-side-combinable agg; history per host is
    round-bounded, the same cardinality argument as politeness
    budgets) and fold with F.aggregate (Catalyst higher-order
    function, whole-stage codegen; clamp steps compose associatively,
    so at 10^10-round scale the same fold runs as a segmented
    prefix-scan — each segment folds its own (shift, lo, hi) triple
    and triples compose, the textbook clamp-monoid). Cross-engine
    float determinism: both engines fold the identical IEEE doubles in
    the identical order (*{AIMD_UP}, *{AIMD_DOWN}, min/max), so the
    4dp-rounded delay is bit-stable; the oracle's list_reduce has no
    init parameter in DuckDB 1.0, so the seed {AIMD_DELAY0} rides as a
    prepended first element — outcome flags are 0/1, never {AIMD_DELAY0},
    so the encoding is unambiguous."""
    o = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (F.col("o_custkey") % N_AIMD_HOSTS).cast("string")).alias(
            "host"
        ),
        "o_orderkey",
        F.when(F.col("o_orderkey") % AIMD_FAIL_MOD == 0, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("fail"),
    )
    h = o.groupBy("host").agg(
        F.array_sort(
            F.collect_list(F.struct("o_orderkey", "fail"))
        ).alias("_hist"),
        F.count("*").alias("n_rounds"),
        F.sum("fail").cast("long").alias("n_fails"),
    )
    delay = F.round(aimd_fold_expr("_hist"), 4)
    return h.select(
        "host",
        "n_rounds",
        "n_fails",
        delay.alias("delay_s"),
        F.floor(F.lit(3600.0) / delay).cast("long").alias("next_round_budget"),
    )


DISCOVERY_ROUND_S = 3600.0  # one logical discovery round
DISCOVERY_DEFAULT_DELAY = 5.0  # reference DOWNLOAD_DELAY for unlisted hosts
DISCOVERY_MAX_BUDGET = 3600  # plan-time cap (1s min delay) for the WGL rewrite


def discovery_fetch_plan(need: DataFrame, rp: DataFrame) -> DataFrame:
    """Shared core of discovery_round_plan (batch) and
    streaming.stream_discovery_plan (per-micro-batch): given the
    fetch-needing rows (url, lastmod, action — skip rows already
    removed) and the host-sized robots policy, produce the per-host
    fetch list — robots budget (disallow -> 0; crawl-delay clamped
    >= 1s over DISCOVERY_ROUND_S), freshest-first rank, cut at the
    budget. Extracting this as ONE function is what makes the
    streaming capstone's equality pin possible: both surfaces execute
    the identical plan, so stream-per-generation == batch by
    construction, and the test proves it stays that way."""
    # host = segment after the FIRST '//' — exact twin of the oracle's
    # string_split(url, '/')[3] (F.get is 0-based, NULL-safe)
    need = need.withColumn("host", F.get(F.split(F.col("url"), "/"), F.lit(2)))
    # crawl-delay 0 means "no delay" in robots.txt; clamp at 1s so the
    # budget is finite and bounded by the plan-time literal
    budget = F.when(
        F.coalesce(F.col("robots_allow"), F.lit(True)),
        F.floor(
            F.lit(DISCOVERY_ROUND_S)
            / F.greatest(
                F.coalesce(
                    F.col("crawl_delay_s"), F.lit(DISCOVERY_DEFAULT_DELAY)
                ),
                F.lit(1.0),
            )
        ).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    b = need.join(F.broadcast(rp), "host", "left").withColumn(
        "host_budget", budget
    )
    w = Window.partitionBy("host").orderBy(
        F.desc_nulls_last("lastmod"), F.asc("url")
    )
    return (
        b.withColumn("fetch_rank", F.row_number().over(w))
        .filter(
            (F.col("fetch_rank") <= F.lit(DISCOVERY_MAX_BUDGET))
            & (F.col("fetch_rank") <= F.col("host_budget"))
        )
        .select("host", "url", "action", "fetch_rank", "host_budget")
    )


@register(
    "discovery_round_plan",
    f"""
    WITH rp AS ({{ROBOTS_SQL}}),
    ep AS ({{ETAG_SQL}}),
    need AS (SELECT url, lastmod, action,
                    string_split(url, '/')[3] AS host
             FROM ep WHERE action <> 'skip'),
    b AS (SELECT n.*,
                 CASE WHEN coalesce(rp.robots_allow, TRUE)
                      THEN CAST(floor({DISCOVERY_ROUND_S}
                           / greatest(coalesce(rp.crawl_delay_s,
                                      {DISCOVERY_DEFAULT_DELAY}), 1.0))
                           AS BIGINT)
                      ELSE 0 END AS host_budget
          FROM need n LEFT JOIN rp ON n.host = rp.host),
    r AS (SELECT *, row_number() OVER (
                 PARTITION BY host
                 ORDER BY lastmod DESC NULLS LAST, url) AS fetch_rank
          FROM b)
    SELECT host, url, action, fetch_rank, host_budget
    FROM r WHERE fetch_rank <= host_budget
    """.replace("{ROBOTS_SQL}", ORACLES["robots_policy"]).replace(
        "{ETAG_SQL}", ORACLES["etag_revalidate_plan"]
    ),
)
def discovery_round_plan(spark, sf_dir):
    """THE discovery capstone: the per-host fetch list for the next
    round, composed from the three discovery-side operators — robots
    policy (per-host crawl-delay budget + disallow), sitemap freshness
    (via etag_revalidate_plan's fetch_full / conditional_get / skip
    classes), and politeness (freshest-first rank cut at the host's
    round budget). Disallowed hosts get budget 0; hosts absent from
    robots default to the reference's DOWNLOAD_DELAY=5s. This is the
    discovery-side twin of frontier_next_fetch (which ranks by LINK
    evidence; this ranks by FRESHNESS evidence), and like every other
    capstone its constituents' oracle SQL is composed verbatim so the
    plan can never drift from its parts.

    Plan shape: ONE exchange total (measured) — the fetch-needing rows
    (a skip-pruned projection of the sitemap table) join the
    HOST-sized robots policy broadcast, and the only window is
    host-keyed over fetch-needing URLs. The {DISCOVERY_MAX_BUDGET}
    literal rides the rank filter, but it sits above the default
    windowGroupLimitThreshold (1000) so the WGL rewrite does NOT fire
    here — acceptable because the window's input is already
    skip-pruned to the changed slice (at 10^10 URLs the overwhelming
    majority never reaches the shuffle); a deployment whose per-host
    changed slice is itself skewed would raise the threshold or route
    through select_fetchable's salted path."""
    rp = QUERIES["robots_policy"](spark, sf_dir)
    ep = QUERIES["etag_revalidate_plan"](spark, sf_dir)
    return discovery_fetch_plan(ep.filter(F.col("action") != "skip"), rp)
