"""S14 graph export: node/edge tables from items (generate_graph.py
analog)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from crunchy_spark import graph
import hashlib

from crunchy_spark.urlnorm import canonicalize_one


def sha1_hex(s: str) -> str:
    return hashlib.sha1(s.encode()).hexdigest()


def _items(spark):
    def item(url, name, founders, industries, similar, funding=None):
        return Row(
            url_canon=canonicalize_one(url),
            url_sha1=sha1_hex(canonicalize_one(url)),
            site="crunchbase",
            name=name,
            founders=founders,
            industries=industries,
            similar_companies=similar,
            funding_usd=funding,
        )

    a = "https://crunchbase.com/organization/acme"
    b = "https://crunchbase.com/organization/globex"
    return spark.createDataFrame(
        [
            item(a, "Acme", ["Ada Wong", "Ben Ito"], ["Tech"], [b + "/"], 5e6),
            # duplicate founder + industry across companies -> node dedup
            item(b, "Globex", ["Ada Wong"], ["Tech", "Finance"], [], 1e6),
        ]
    )


def test_nodes_dedup_and_labels(spark):
    nodes = graph.graph_nodes(_items(spark)).collect()
    by_label = {}
    for r in nodes:
        by_label.setdefault(r["label"], set()).add(r["name"])
    assert by_label["Company"] == {"Acme", "Globex"}
    assert by_label["Founder"] == {"Ada Wong", "Ben Ito"}  # Ada merged
    assert by_label["Industry"] == {"Tech", "Finance"}
    ids = [r["node_id"] for r in nodes]
    assert len(ids) == len(set(ids))


def test_edges_resolve_similar_through_canonicalization(spark):
    edges = graph.graph_edges(_items(spark)).collect()
    rels = {}
    for r in edges:
        rels.setdefault(r["rel"], set()).add((r["src_id"], r["dst_id"]))
    a_id = "company:" + sha1_hex(
        canonicalize_one("https://crunchbase.com/organization/acme")
    )
    b_id = "company:" + sha1_hex(
        canonicalize_one("https://crunchbase.com/organization/globex")
    )
    # the noisy 'globex/' similar URL resolved to globex's canonical node
    assert rels["SIMILAR_TO"] == {(a_id, b_id)}
    assert (a_id, "founder:Ada Wong") in rels["FOUNDED_BY"]
    assert (b_id, "founder:Ada Wong") in rels["FOUNDED_BY"]
    assert (b_id, "industry:Finance") in rels["IN_INDUSTRY"]


def test_export_writes_partitioned_edges(spark, tmp_path):
    import os

    paths = graph.export_graph(_items(spark), str(tmp_path / "g"))
    edges = spark.read.parquet(paths["edges"])
    assert set(r["rel"] for r in edges.select("rel").distinct().collect()) == {
        "FOUNDED_BY",
        "IN_INDUSTRY",
        "SIMILAR_TO",
    }
    # physically partitioned by relation (partition-pruned traversals)
    assert any(d.startswith("rel=") for d in os.listdir(paths["edges"]))
    nodes = spark.read.parquet(paths["nodes"])
    assert nodes.filter(F.col("label") == "Company").count() == 2


def test_end_to_end_from_crawl_items(spark, unit_fixtures, tmp_path_factory):
    """Edges from a real crawl's items: every non-dangling SIMILAR_TO
    target is a company node; FOUNDED_BY count matches exploded founders."""
    from crunchy_spark.loop import CrawlConfig, CrawlEngine
    from crunchy_spark.snapshot import SnapshotStore

    store = SnapshotStore(str(tmp_path_factory.mktemp("gstore")))
    eng = CrawlEngine(spark, store, unit_fixtures, CrawlConfig(round_seconds=1e6))
    eng.bootstrap(
        spark.read.parquet(f"{unit_fixtures}/frontier_seed.parquet").limit(80)
    )
    eng.run(max_rounds=10)
    items = eng.items()
    if items.count() == 0:
        pytest.skip("no items crawled at this fixture slice")
    edges = graph.graph_edges(items)
    n_founded = edges.filter(F.col("rel") == "FOUNDED_BY").count()
    n_exploded = (
        items.select(F.explode_outer("founders").alias("f"))
        .filter(F.col("f").isNotNull())
        .dropDuplicates()
        .count()
    )
    assert n_founded > 0
    # distinct (company, founder) pairs == distinct exploded pairs
    pairs = (
        items.select("url_sha1", F.explode("founders").alias("f"))
        .dropDuplicates()
        .count()
    )
    assert n_founded == pairs
    assert n_exploded <= n_founded
