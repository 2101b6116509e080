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
