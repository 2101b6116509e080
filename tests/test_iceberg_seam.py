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
    # one frame per segment INCLUDING the overwrite base (r4 ADVICE)
    assert [s.count() for s in segs] == [10, 5]
    assert store.segment_rows("seen") == [10, 5]
    store.rollback(v0)
    assert store.load(spark, "seen").count() == 10
    # rollback discards the delta segment from the manifest (r4 ADVICE)
    assert len(store.manifest()["tables"]["seen"]) == 1
    assert [s.count() for s in store.load_segments(spark, "seen")] == [10]


# -- jar-free pure-logic lifecycle (the r4 ADVICE scenarios) ---------------
# The commit-log manifest logic is module-level pure functions
# (rows_to_manifest / carry_forward_state) precisely so these run
# without a catalog; the jar-gated behavioral test exercises the same
# paths through real Iceberg writes.

import json

from crunchy_spark.iceberg import carry_forward_state, rows_to_manifest


def _rows(version, state, seg_rows, snap=1, meta=None):
    mj = json.dumps(meta or {})
    return [
        {"version": version, "table_name": n, "snapshot_id": snap,
         "segment": s, "row_count": seg_rows.get(f"{n}@{s}"), "meta": mj}
        for n, segs in state.items() for s in segs
    ]


def test_overwrite_then_append_keeps_base_segment():
    """ADVICE r4 iceberg.py:199 — load_segments must yield one frame per
    segment INCLUDING the overwrite base, matching SnapshotStore."""
    empty = {"version": -1, "tables": {}, "meta": {}}
    s0, r0 = carry_forward_state(empty, ["seen"], [], 0, {"seen": 10})
    m0 = rows_to_manifest(_rows(0, s0, r0, meta={"round": 0}), 0)
    assert m0["tables"]["seen"] == ["seen@v000000-base"]
    s1, r1 = carry_forward_state(m0, [], ["seen"], 1, {"seen": 5})
    m1 = rows_to_manifest(_rows(1, s1, r1), 1)
    # base + delta, oldest first — the shape load_segments iterates
    assert m1["tables"]["seen"] == ["seen@v000000-base", "seen@v000001-delta"]
    assert [m1["segment_rows"][p] for p in m1["tables"]["seen"]] == [10, 5]


def test_overwrite_resets_segment_list_and_prunes_counts():
    empty = {"version": -1, "tables": {}, "meta": {}}
    s0, r0 = carry_forward_state(empty, ["f"], [], 0, {"f": 3})
    m0 = rows_to_manifest(_rows(0, s0, r0), 0)
    s1, r1 = carry_forward_state(m0, [], ["f"], 1, {"f": 2})
    m1 = rows_to_manifest(_rows(1, s1, r1), 1)
    s2, r2 = carry_forward_state(m1, ["f"], [], 2, {"f": 4})
    assert s2["f"] == ["v000002-base"]          # overwrite resets the list
    assert r2 == {"f@v000002-base": 4}          # dead segment counts pruned


def test_rollback_discards_later_deltas():
    """ADVICE r4 iceberg.py:216 — each version's rows are its FULL state,
    so re-appending version v's rows as the head reproduces exactly v's
    segment list: later deltas are discarded, nothing duplicates."""
    empty = {"version": -1, "tables": {}, "meta": {}}
    s0, r0 = carry_forward_state(empty, ["seen"], [], 0, {"seen": 10})
    m0 = rows_to_manifest(_rows(0, s0, r0), 0)
    s1, r1 = carry_forward_state(m0, [], ["seen"], 1, {"seen": 5})
    s2, r2 = carry_forward_state(
        rows_to_manifest(_rows(1, s1, r1), 1), [], ["seen"], 2, {"seen": 7})
    # rollback(0) == INSERT v0's rows at head version 3
    head = rows_to_manifest(_rows(3, s0, r0), 3)
    assert head["tables"]["seen"] == ["seen@v000000-base"]
    assert head["segment_rows"] == {"seen@v000000-base": 10}
    # and a commit after the rollback carries v0's state, not v2's
    s4, r4 = carry_forward_state(head, [], ["seen"], 4, {"seen": 1})
    assert s4["seen"] == ["v000000-base", "v000004-delta"]


def test_unchanged_tables_carry_forward_between_commits():
    empty = {"version": -1, "tables": {}, "meta": {}}
    s0, r0 = carry_forward_state(
        empty, ["frontier"], ["seen"], 0, {"frontier": 8, "seen": 10})
    m0 = rows_to_manifest(_rows(0, s0, r0), 0)
    s1, r1 = carry_forward_state(m0, ["frontier"], [], 1, {"frontier": 6})
    # seen untouched: identical path strings (the loop's CDC prefix
    # diff at loop.py:254 depends on this)
    assert s1["seen"] == ["v000000-delta"]
    assert r1["seen@v000000-delta"] == 10
    assert s1["frontier"] == ["v000001-base"]
