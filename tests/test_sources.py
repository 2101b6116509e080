"""S8/S15/S16 source+sink wrappers (crunchy_spark/sources.py)."""

import json
import os

from pyspark.sql import Row
from pyspark.sql import types as T

from crunchy_spark import sources


def test_read_csv_with_schema(spark, tmp_path):
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write("url,priority\nhttps://a.example/x,0.5\nhttps://b.example/y,0.9\n")
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("priority", T.DoubleType()),
        ]
    )
    df = sources.read_csv(spark, p, schema)
    rows = {r["url"]: r["priority"] for r in df.collect()}
    assert rows == {"https://a.example/x": 0.5, "https://b.example/y": 0.9}
    assert [f.dataType for f in df.schema.fields] == [T.StringType(), T.DoubleType()]


def test_read_json_fixed_schema(spark, tmp_path):
    p = str(tmp_path / "in.json")
    with open(p, "w") as f:
        f.write('{"name": "Acme", "funding": "$1M"}\n{"name": "Globex"}\n')
    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("funding", T.StringType()),
        ]
    )
    df = sources.read_json(spark, p, schema)
    got = {(r["name"], r["funding"]) for r in df.collect()}
    assert got == {("Acme", "$1M"), ("Globex", None)}


def test_item_sink_drops_internals_and_retry_sites(spark, tmp_path):
    out = str(tmp_path / "items")
    items = spark.createDataFrame(
        [
            Row(name="a", site="crunchbase", delivery_tag=1, queue="q", _response="r"),
            Row(name="b", site="retry", delivery_tag=2, queue="q", _response="r"),
            Row(name="c", site="tracxn", delivery_tag=3, queue="q", _response="r"),
        ]
    )
    sources.item_sink(items, out)
    back = spark.read.parquet(out)
    assert sorted(r["name"] for r in back.collect()) == ["a", "c"]
    for internal in sources.INTERNAL_KEYS:
        assert internal not in back.columns
    # partitioned by site (S8 layout)
    assert any(d.startswith("site=") for d in os.listdir(out))


def test_debug_dump_excludes_bytes(spark, tmp_path):
    out = str(tmp_path / "dump")
    payloads = spark.createDataFrame(
        [Row(image_id="img1", bytes=bytearray(b"\x00\x01"), caption="cap")]
    )
    sources.debug_dump(payloads, out)
    lines = []
    for fn in os.listdir(out):
        if fn.endswith(".json"):
            with open(os.path.join(out, fn)) as f:
                lines += [json.loads(line) for line in f if line.strip()]
    assert lines and all("bytes" not in row for row in lines)
    assert lines[0]["caption"] == "cap"


def test_items_to_json_col_roundtrip(spark):
    items = spark.createDataFrame(
        [Row(name="a", site="crunchbase", delivery_tag=7, queue="q", _response="x")]
    )
    out = sources.items_to_json_col(items).first()
    payload = json.loads(out["payload_json"])
    assert payload == {"name": "a", "site": "crunchbase"}
