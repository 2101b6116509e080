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


def test_expire_snapshots_gc(spark, tmp_path):
    """Iceberg expire_snapshots analog: manifests below the retention
    window disappear with every segment ONLY they reference; segments
    carried forward into retained manifests survive; the retained
    window stays fully readable (time travel included)."""
    import os

    store = SnapshotStore(str(tmp_path / "store"))
    # v0: a + keep (keep never rewritten -> its v0 segment must survive
    # any expiry because live manifests still reference it)
    store.commit({"a": spark.range(1).toDF("x"), "keep": spark.range(4).toDF("k")})
    for i in range(2, 6):
        store.commit({"a": spark.range(i).toDF("x")})  # v1..v4 rewrite a
    res = store.expire_snapshots(keep_last=2)  # retain v3, v4
    assert res == {"manifests_deleted": 3, "segments_deleted": 3}
    # retained window readable, including time travel to v3
    assert store.load(spark, "a").count() == 5
    assert store.load(spark, "a", version=3).count() == 4
    # the carried-forward table still reads from its v0 segment
    assert store.load(spark, "keep").count() == 4
    assert os.path.isdir(tmp_path / "store" / "data" / "keep" / "v000000")
    # dead bases really gone; expired manifests really gone
    assert not os.path.isdir(tmp_path / "store" / "data" / "a" / "v000000")
    assert not os.path.exists(
        tmp_path / "store" / "_snapshots" / "v000000.json"
    )
    # idempotent
    assert store.expire_snapshots(keep_last=2) == {
        "manifests_deleted": 0,
        "segments_deleted": 0,
    }


def test_engine_expiry_bounds_store(spark, tmp_path):
    """A long crawl with a small retention window keeps the snapshot
    dir bounded: manifest count <= keep_last and no dead frontier bases
    accumulate, while the live state stays correct and resumable."""
    import os

    from crunchy_spark import datagen
    from crunchy_spark.loop import CrawlConfig, CrawlEngine

    fx = str(tmp_path / "fx")
    datagen.write_fixtures(spark, fx, scale="unit")
    store = SnapshotStore(str(tmp_path / "store"))
    eng = CrawlEngine(
        spark,
        store,
        fx,
        CrawlConfig(
            round_seconds=1e6,
            compact_every=3,
            snapshot_keep_last=4,
        ),
    )
    eng.bootstrap(spark.read.parquet(fx + "/frontier_seed.parquet"))
    eng.run(max_rounds=12)
    manifests = [
        f
        for f in os.listdir(tmp_path / "store" / "_snapshots")
        if f.endswith(".json")
    ]
    assert len(manifests) <= 4 + 3  # window + rounds since last compaction
    # live state still consistent and resumable from the kept window
    eng2 = CrawlEngine(spark, store, fx, CrawlConfig(round_seconds=1e6))
    assert eng2.items().count() == eng.items().count()
    assert store.load(spark, "frontier").count() > 0


def _brute_changelog(eng, v_from, v_to):
    """Independent reconstruction: full-outer diff of the two merged
    views, computed entirely in the test."""
    cols = ["sha_int", "status", "state_round"]
    old = {r["sha_int"]: r for r in eng.frontier_view(version=v_from).select(*cols).collect()}
    new = {r["sha_int"]: r for r in eng.frontier_view(version=v_to).select(*cols).collect()}
    out = {}
    for k, r in new.items():
        if k not in old:
            out[k] = ("insert", None, r["status"])
        elif (old[k]["status"], old[k]["state_round"]) != (r["status"], r["state_round"]):
            out[k] = ("update", old[k]["status"], r["status"])
    for k, r in old.items():
        if k not in new:
            out[k] = ("delete", r["status"], None)
    return out


def test_frontier_changelog_matches_brute_diff(spark, unit_fixtures, tmp_path):
    """Iceberg-CDC parity: the O(delta) manifest-diff fast path AND the
    post-compaction fallback both reproduce the brute-force full-view
    diff, across every committed version pair."""
    from crunchy_spark.loop import CrawlConfig, CrawlEngine

    store = SnapshotStore(str(tmp_path / "store"))
    eng = CrawlEngine(
        spark,
        store,
        unit_fixtures,
        CrawlConfig(round_seconds=1e6, compact_every=3, snapshot_keep_last=None),
    )
    eng.bootstrap(spark.read.parquet(f"{unit_fixtures}/frontier_seed.parquet"))
    versions = [store.current_version()]
    for _ in range(5):
        if eng.run_round() is None:
            break
        versions.append(store.current_version())
    assert len(versions) >= 4

    def segs(v):
        return store.manifest(v)["tables"]["frontier"]

    # the compact_every=3 run must exercise BOTH lineages
    pairs = [(a, b) for i, a in enumerate(versions) for b in versions[i + 1:]]
    prefix_pairs = [
        (a, b) for a, b in pairs if segs(b)[: len(segs(a))] == segs(a)
    ]
    broken_pairs = [
        (a, b) for a, b in pairs if segs(b)[: len(segs(a))] != segs(a)
    ]
    assert prefix_pairs and broken_pairs
    for a, b in prefix_pairs + broken_pairs:
        got = {
            r["sha_int"]: (r["change"], r["old_status"], r["new_status"])
            for r in eng.frontier_changelog(a, b).collect()
        }
        assert got == _brute_changelog(eng, a, b), (a, b)
    # the engine never deletes keys and every changed row carries its
    # identity columns
    some = eng.frontier_changelog(versions[0], versions[-1]).collect()
    assert some and all(r["change"] in ("insert", "update") for r in some)
    assert all(r["url_canon"] and r["host"] for r in some)
    # identical versions -> empty changelog
    assert eng.frontier_changelog(versions[-1], versions[-1]).count() == 0
