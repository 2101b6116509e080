"""Round-3 batch VII: binary header sniff (first fully-oracled payload
op) and the SURT CDX-style URL index manifest."""

import pyarrow.parquet as pq

from crunchy_spark import datagen
from crunchy_spark.queries import _IMAGES_BIN, SURT_BLOCK, QUERIES

SF = "/root/testdata/sf0.001"


def test_images_bin_fixture_matches_datagen():
    """fixtures/images_bin.parquet is exactly gen_images_pdf(256)'s
    payload projection — Spark and the DuckDB oracle read the same
    deterministic bytes."""
    committed = pq.read_table(_IMAGES_BIN).to_pandas()
    regen = datagen.gen_images_pdf(256)[["image_id", "bytes", "fmt", "w", "h"]]
    assert list(committed.columns) == list(regen.columns)
    assert committed["bytes"].map(bytes).tolist() == regen["bytes"].map(bytes).tolist()
    for col in ("image_id", "fmt", "w", "h"):
        assert committed[col].tolist() == regen[col].tolist(), col


def test_header_sniff_matches_catalog_and_stays_jvm(spark):
    df = QUERIES["image_header_sniff"](spark, SF)
    rows = df.collect()
    assert len(rows) == 256
    assert all(r["meta_match"] for r in rows)
    assert {r["fmt_sniffed"] for r in rows} == {"png", "jpeg"}
    # compressed payloads are smaller than raw pixels for every image
    assert all(r["bytes_per_kpx"] < 1000 * 3 for r in rows)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # pure column expressions over the binary column: no Python stage,
    # no shuffle — the sniff runs at scan speed
    assert "EvalPython" not in plan, plan
    assert "Exchange" not in plan, plan


def test_surt_index_blocks_are_contiguous_and_complete(spark):
    df = QUERIES["surt_url_index"](spark, SF)
    blocks = sorted(df.collect(), key=lambda r: r["block_id"])
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(b["n_urls"] for b in blocks) == n_orders
    # every block full except the last
    assert all(b["n_urls"] == SURT_BLOCK for b in blocks[:-1])
    # key ranges ordered and non-overlapping: a prefix query routes to
    # exactly one contiguous block range
    for a, b in zip(blocks, blocks[1:]):
        assert a["key_min"] <= a["key_max"] < b["key_min"] <= b["key_max"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the total order comes from global_fifo_rank's range partitioning,
    # never a single-partition global window
    assert "Exchange SinglePartition" not in plan, plan


def test_warc_offsets_contiguous_within_shard(spark):
    rows = QUERIES["warc_offset_index"](spark, SF).collect()
    assert len(rows) == 256
    from collections import defaultdict

    shards = defaultdict(list)
    for r in rows:
        shards[(r["fmt"], r["shard_id"])].append(r)
    from crunchy_spark.queries import WARC_SHARD_BUDGET

    for (fmt, sid), recs in shards.items():
        recs.sort(key=lambda r: r["image_id"])
        # records tile the shard: first at 0, each next starts where
        # the previous ended — a single ranged read fetches any record
        assert recs[0]["offset"] == 0, (fmt, sid)
        for a, b in zip(recs, recs[1:]):
            assert b["offset"] == a["offset"] + a["length"], (fmt, sid)
        total = sum(r["length"] for r in recs)
        assert total <= WARC_SHARD_BUDGET + max(r["length"] for r in recs)


def test_etag_plan_partitions_urls(spark):
    rows = QUERIES["etag_revalidate_plan"](spark, SF).collect()
    acts = {r["action"] for r in rows}
    assert acts == {"fetch_full", "conditional_get", "skip"}
    for r in rows:
        if r["last_fetch"] is None:
            assert r["action"] == "fetch_full" and not r["has_etag"]
        elif r["action"] == "skip":
            assert r["lastmod"] <= r["last_fetch"]
        elif r["action"] == "conditional_get":
            assert r["has_etag"] and r["lastmod"] > r["last_fetch"]


def test_lang_confusion_shares_complete(spark):
    rows = QUERIES["lang_confusion"](spark, SF).collect()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n"] for r in rows) == n_docs
    from collections import defaultdict

    by_lang = defaultdict(float)
    for r in rows:
        by_lang[r["lang"]] += r["share_of_lang"]
    for lang, s in by_lang.items():
        assert abs(s - 1.0) < 0.01, (lang, s)
    plan = (
        QUERIES["lang_confusion"](spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan


def test_batch78_oracles_at_driver_scale(spark):
    """Driver-gate mirror at sf0.01 for batches VII+VIII (the pytest
    oracle suite runs at sf0.001; ties/caps can differ between scales)."""
    from crunchy_spark.queries import ORACLES
    from tests.oracle_util import compare, duck_conn

    sf01 = "/root/testdata/sf0.01"
    con = duck_conn(sf01)
    for name in (
        "image_header_sniff",
        "surt_url_index",
        "warc_offset_index",
        "etag_revalidate_plan",
        "lang_confusion",
    ):
        compare(QUERIES[name](spark, sf01), con, ORACLES[name], name)


def test_discovery_host_parse_matches_oracle_on_adversarial_urls(spark):
    """r4 ADVICE queries.py:10035 — the engine's host parse must cut at
    the FIRST '//' like the oracle's string_split(url, '/')[3], even for
    URLs with '//' in the path (latent in clean sitemap data)."""
    import duckdb
    from pyspark.sql import functions as F

    urls = [
        "https://a.example.com/sitemap.xml",
        "https://b.example.com/path//double/slash",
        "http://c.example.com//leading//everything",
        "https://d.example.com",
    ]
    got = [
        r[0]
        for r in spark.createDataFrame([(u,) for u in urls], "url string")
        .select(F.get(F.split(F.col("url"), "/"), F.lit(2)))
        .collect()
    ]
    con = duckdb.connect()
    want = [
        con.sql(f"SELECT string_split('{u}', '/')[3]").fetchone()[0]
        for u in urls
    ]
    assert got == want == [
        "a.example.com", "b.example.com", "c.example.com", "d.example.com"
    ]


def test_images_decoded_meta_fixture_matches_datagen():
    """fixtures/images_decoded_meta.parquet is exactly
    gen_images_decoded_meta_pdf(64) — the committed ground truth the
    image_decode_stats / image_resize oracles read (r4 verdict #2:
    rows-only binary ops upgraded to full value oracles)."""
    from crunchy_spark.queries import _IMAGES_DECODED_META

    committed = pq.read_table(_IMAGES_DECODED_META).to_pandas()
    regen = datagen.gen_images_decoded_meta_pdf(64)
    assert list(committed.columns) == list(regen.columns)
    for col in committed.columns:
        assert committed[col].tolist() == regen[col].tolist(), col


def test_images_tiles_meta_fixture_matches_datagen():
    """fixtures/images_tiles_meta.parquet is exactly
    gen_images_tiles_meta_pdf(64) — image_tile_stats's oracle input."""
    from crunchy_spark.queries import _IMAGES_TILES_META

    committed = pq.read_table(_IMAGES_TILES_META).to_pandas()
    regen = datagen.gen_images_tiles_meta_pdf(64)
    assert list(committed.columns) == list(regen.columns)
    for col in committed.columns:
        assert committed[col].tolist() == regen[col].tolist(), col
