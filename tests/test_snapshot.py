"""Snapshot store: atomic commits, carry-forward, rollback/resume."""

from crunchy_spark.snapshot import SnapshotStore


def test_commit_load_carryforward(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"))
    a0 = spark.range(5).toDF("x")
    b0 = spark.range(3).toDF("y")
    v0 = store.commit({"a": a0, "b": b0}, meta={"round": 0})
    assert v0 == 0
    v1 = store.commit({"a": spark.range(7).toDF("x")}, meta={"round": 1})
    assert v1 == 1
    assert store.load(spark, "a").count() == 7
    # b carried forward unchanged
    assert store.load(spark, "b").count() == 3
    # old version still readable (snapshot isolation)
    assert store.load(spark, "a", version=0).count() == 5


def test_rollback(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"))
    store.commit({"a": spark.range(2).toDF("x")})
    store.commit({"a": spark.range(9).toDF("x")})
    store.rollback(0)
    assert store.current_version() == 0
    assert store.load(spark, "a").count() == 2


def test_meta_roundtrip(spark, tmp_path):
    store = SnapshotStore(str(tmp_path / "store"))
    store.commit({"a": spark.range(1).toDF("x")}, meta={"round": 3, "fetched": 10})
    assert store.manifest()["meta"] == {"round": 3, "fetched": 10}
