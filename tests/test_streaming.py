"""Structured Streaming semantics (T1-T7): streaming ingest dedup,
windowed aggs matching the batch twin, stateful host health."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from crunchy_spark import streaming
from crunchy_spark.streaming import SEED_STREAM_SCHEMA


def test_stream_seed_ingest_exactly_once_dedup(spark, tmp_path):
    in_dir, out_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    seeds1 = pd.DataFrame(
        {
            "url": [
                "https://crunchbase.com/organization/a",
                "https://crunchbase.com/organization/a/",  # dup modulo noise
                "https://tracxn.com/d/companies/b/__c",
            ],
            "entry_point": [None, None, "tracxn"],
            "seq": [0, 1, 2],
        }
    )
    spark.createDataFrame(seeds1, schema=SEED_STREAM_SCHEMA).coalesce(1).write.parquet(
        f"{in_dir}/batch1"
    )
    q = streaming.stream_seed_ingest(spark, in_dir + "/*", out_dir, ckpt)
    q.awaitTermination(120)
    out1 = spark.read.parquet(out_dir)
    assert out1.count() == 2  # noise dup collapsed within batch

    # second file: one repeat (cross-batch dedup), one new
    seeds2 = pd.DataFrame(
        {
            "url": [
                "https://WWW.crunchbase.com/organization/a?utm=x",  # seen
                "https://tracxn.com/d/companies/new/__d",
            ],
            "entry_point": [None, None],
            "seq": [3, 4],
        }
    )
    spark.createDataFrame(seeds2, schema=SEED_STREAM_SCHEMA).coalesce(1).write.parquet(
        f"{in_dir}/batch2"
    )
    q2 = streaming.stream_seed_ingest(spark, in_dir + "/*", out_dir, ckpt)
    q2.awaitTermination(120)
    out2 = spark.read.parquet(out_dir)
    assert out2.count() == 3
    assert out2.select("sha_int").distinct().count() == 3


def test_windowed_counts_match_batch_twin(spark):
    sf = "/root/testdata/sf0.001"
    ev_schema = spark.read.parquet(f"{sf}/events.parquet").schema
    # events.parquet is a single file; file-stream sources need a directory
    stream = (
        spark.readStream.schema(ev_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf)
    )
    agg = streaming.windowed_event_counts(stream)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("winout")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["wstart"], r["event_type"]): (r["n"], r["v"])
        for r in spark.sql("SELECT * FROM winout").collect()
    }
    from crunchy_spark.queries import QUERIES

    want = {
        (r["wstart"], r["event_type"]): (r["n"], r["v"])
        for r in QUERIES["event_windowed_counts"](spark, sf).collect()
    }
    assert got == want


@pytest.mark.parametrize("outcomes,expect", [
    ([True, True], ("good", 0, 2)),
    ([False, False, False], ("dead", 3, 0)),
    ([False, False, True], ("good", 0, 1)),
])
def test_host_health_state_machine(spark, tmp_path, outcomes, expect):
    rows = [("h1.example.com", ok) for ok in outcomes]
    pdf = pd.DataFrame(rows, columns=["host", "ok"])
    src_dir = str(tmp_path / "src")
    spark.createDataFrame(pdf).coalesce(1).write.parquet(src_dir)
    stream = spark.readStream.schema("host string, ok boolean").parquet(src_dir)
    out = streaming.host_health_stream(stream)
    name = f"hh_{abs(hash(tuple(outcomes)))}"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    r = spark.sql(f"SELECT * FROM {name}").collect()[-1]
    assert (r["state"], r["fails"], r["successes"]) == expect
