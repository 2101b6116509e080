"""S14: knowledge-graph export — the Neo4j bulk sink re-expressed as
explode -> node/edge DataFrames -> parquet "graph" tables.

Reference: CrunchyRest/knowledgeGraph/generate_graph.py:68-178 MERGEs
Company/Founder/Industry nodes and FOUNDED_BY / IN_INDUSTRY /
SIMILAR_TO edges per company row, one Cypher call at a time. Here the
same graph materializes as two DataFrames (one distinct-node table, one
edge table partitioned by relation) in a single plan; a Neo4j Spark
connector could consume the exact same frames, but parquet is the core
sink (SURVEY.md §2.1 S14). Traversal queries over the exported edges
are §2.4 self-joins (queries.graph_two_hop, nation_customer_roster).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .urlnorm import with_url_identity

# node id convention: '<label>:<natural key>' — companies key on the
# canonical-URL SHA-1 (the engine's identity), founders/industries on
# their normalized name (generate_graph.py MERGEs on those same keys)


def company_nodes(items: DataFrame) -> DataFrame:
    return items.select(
        F.concat(F.lit("company:"), F.col("url_sha1")).alias("node_id"),
        F.lit("Company").alias("label"),
        F.col("name").alias("name"),
        F.col("url_canon").alias("url_canon"),
        F.col("site").alias("site"),
        F.col("funding_usd").alias("funding_usd"),
    ).dropDuplicates(["node_id"])


def _exploded(items: DataFrame, col: str, label: str) -> DataFrame:
    return (
        items.select(
            F.col("url_sha1").alias("src_sha1"), F.explode_outer(col).alias("val")
        )
        .filter(F.col("val").isNotNull() & (F.col("val") != ""))
        .withColumn("node_id", F.concat(F.lit(f"{label.lower()}:"), F.col("val")))
    )


def attribute_nodes(items: DataFrame) -> DataFrame:
    """Founder + Industry nodes (distinct by natural key)."""
    founders = _exploded(items, "founders", "Founder").select(
        "node_id",
        F.lit("Founder").alias("label"),
        F.col("val").alias("name"),
        F.lit(None).cast("string").alias("url_canon"),
        F.lit(None).cast("string").alias("site"),
        F.lit(None).cast("double").alias("funding_usd"),
    )
    industries = _exploded(items, "industries", "Industry").select(
        "node_id",
        F.lit("Industry").alias("label"),
        F.col("val").alias("name"),
        F.lit(None).cast("string").alias("url_canon"),
        F.lit(None).cast("string").alias("site"),
        F.lit(None).cast("double").alias("funding_usd"),
    )
    return founders.unionByName(industries).dropDuplicates(["node_id"])


def graph_nodes(items: DataFrame) -> DataFrame:
    return company_nodes(items).unionByName(attribute_nodes(items))


def graph_edges(items: DataFrame) -> DataFrame:
    """FOUNDED_BY / IN_INDUSTRY / SIMILAR_TO edge table.

    SIMILAR_TO targets resolve through the same URL canonicalization as
    the crawl identity (so an edge meets its target company node even
    when the page listed a noisy URL variant); targets never crawled
    remain dangling edges, exactly like the reference's
    MERGE-on-crunchbase_url placeholder nodes (generate_graph.py:134-143).
    """
    src = F.concat(F.lit("company:"), F.col("src_sha1")).alias("src_id")
    founded = _exploded(items, "founders", "Founder").select(
        src, F.col("node_id").alias("dst_id"), F.lit("FOUNDED_BY").alias("rel")
    )
    industry = _exploded(items, "industries", "Industry").select(
        src, F.col("node_id").alias("dst_id"), F.lit("IN_INDUSTRY").alias("rel")
    )
    sim_raw = (
        items.select(
            F.col("url_sha1").alias("src_sha1"),
            F.explode_outer("similar_companies").alias("url"),
        )
        .filter(F.col("url").isNotNull() & (F.col("url") != ""))
    )
    similar = with_url_identity(sim_raw, "url").select(
        F.concat(F.lit("company:"), F.col("src_sha1")).alias("src_id"),
        F.concat(F.lit("company:"), F.col("url_sha1")).alias("dst_id"),
        F.lit("SIMILAR_TO").alias("rel"),
    )
    return (
        founded.unionByName(industry)
        .unionByName(similar)
        .dropDuplicates(["src_id", "dst_id", "rel"])
    )


def export_graph(items: DataFrame, out_dir: str) -> dict[str, str]:
    """Write the graph tables: nodes/ plus edges/ partitioned by rel so a
    per-relation consumer (or partition-pruned traversal) reads only its
    edge type."""
    paths = {
        "nodes": os.path.join(out_dir, "nodes"),
        "edges": os.path.join(out_dir, "edges"),
    }
    graph_nodes(items).write.mode("overwrite").parquet(paths["nodes"])
    graph_edges(items).write.mode("overwrite").partitionBy("rel").parquet(
        paths["edges"]
    )
    return paths
