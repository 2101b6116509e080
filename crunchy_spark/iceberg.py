"""Real-Iceberg backing for the snapshot store (jar-gated seam).

The north rule says "Iceberg-backed frontier"; this image has no
iceberg-spark-runtime jar, so the engine ships with `SnapshotStore`
(snapshot.py) — a parquet substrate that emulates the Iceberg semantics
the engine relies on (atomic multi-table commit, snapshot-isolated
reads, time travel, merge-on-read deltas, expire). This module is the
PRODUCTION half of that seam: the same store surface on a real Iceberg
catalog, constructed only where `iceberg_available()` is true.

Design (and why it is faithful Iceberg, not a re-emulation):

- **Per-table writes are native Iceberg operations**: appends are
  `writeTo(...).append()` (fast-append snapshots), overwrites are
  `createOrReplace()` (REPLACE TABLE AS SELECT — one new snapshot, old
  ones retained for time travel).
- **Multi-table atomicity via a commit-log table**: Iceberg
  transactions are single-table, so the engine's atomic multi-table
  round commit is recorded by ONE fast-append to a `commit_log` table
  — rows (version, table_name, snapshot_id, segment, row_count, meta)
  — performed LAST. The append is the commit point (Iceberg appends
  are atomic); a crash before it leaves orphan snapshots that the next
  `expire_snapshots` collects, exactly the SnapshotStore crash
  contract. Each commit writes the FULL table state of its version
  (changed tables plus carried-forward rows for unchanged ones), so
  ``manifest(v)`` is a pure ``version == v`` scan — exactly the
  one-manifest-file-per-version shape of SnapshotStore, and the reason
  ``rollback`` (re-append version v's rows as the new head) discards
  later delta segments instead of accumulating them. Readers resolve a
  version by looking up its snapshot ids in the commit log and reading
  each table pinned at that snapshot — snapshot isolation across
  tables.
- **Merge-on-read deltas stay the ENGINE's discipline** (bloom LSM
  segments, frontier status-flip deltas with equality-delete
  semantics in loop.py): each delta append tags its rows with a
  `_segment` column; `load_segments` reconstitutes per-segment frames
  by filtering on it. On catalogs with format-version=2 the frontier
  delta path can swap to native `MERGE INTO` — see `merge_upsert`,
  the statement the loop's _apply_status_flips documents as its
  production form.
- **expire_snapshots delegates** to the catalog procedure
  (`CALL <catalog>.system.expire_snapshots`) and trims the commit log
  below the retention window — the same retention contract as
  SnapshotStore.expire_snapshots.

Tests: tests/test_iceberg_seam.py pins interface parity with
SnapshotStore TODAY (runs jar-free) and exercises the behavior
whenever a jar-bearing environment runs the suite (skip-gated, the
Kafka/PIL pattern).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rows_to_manifest(rows: list[Any], v: int) -> dict[str, Any]:
    """Pure half of ``manifest()``: fold one version's commit-log rows
    (dict-like: version/table_name/snapshot_id/segment/row_count/meta)
    into the SnapshotStore-shaped manifest dict. Module-level so the
    jar-free tests can pin the overwrite/append/rollback lifecycle
    without an Iceberg catalog."""
    tables: dict[str, list[str]] = {}
    seg_rows: dict[str, int] = {}
    snap_of: dict[str, int] = {}
    meta: dict[str, Any] = {}
    # segment tags sort oldest-first lexicographically (zero-padded
    # version prefix; 'base' < 'delta' within a version)
    for r in sorted(rows, key=lambda r: (r["table_name"], r["segment"])):
        if r["meta"]:
            meta = json.loads(r["meta"])
        if r["table_name"] == "__meta__":
            continue
        path = f"{r['table_name']}@{r['segment']}"
        tables.setdefault(r["table_name"], []).append(path)
        snap_of[r["table_name"]] = int(r["snapshot_id"])
        if r["row_count"] is not None:
            seg_rows[path] = int(r["row_count"])
    return {
        "version": v,
        "tables": tables,
        "meta": meta,
        "segment_rows": seg_rows,
        "snapshot_ids": snap_of,
    }


def carry_forward_state(
    prev: dict[str, Any],
    overwrites: list[str],
    appends: list[str],
    new_version: int,
    counts: dict[str, int],
) -> tuple[dict[str, list[str]], dict[str, int | None]]:
    """Pure half of ``commit()``: the previous manifest's full state
    carried forward with this commit's overwrites/appends applied.
    Returns ({table: [segment tags, oldest first]}, {path: row_count}).
    An overwrite resets the table to a single ``vNNNNNN-base`` segment;
    an append adds a ``vNNNNNN-delta`` segment to the carried list."""
    state: dict[str, list[str]] = {
        n: [p.split("@", 1)[1] for p in segs]
        for n, segs in prev["tables"].items()
    }
    seg_rows: dict[str, int | None] = dict(prev.get("segment_rows", {}))
    for name in overwrites:
        seg = f"v{new_version:06d}-base"
        state[name] = [seg]
        seg_rows[f"{name}@{seg}"] = counts.get(name)
    for name in appends:
        seg = f"v{new_version:06d}-delta"
        state.setdefault(name, []).append(seg)
        seg_rows[f"{name}@{seg}"] = counts.get(name)
    live = {f"{n}@{s}" for n, segs in state.items() for s in segs}
    return state, {p: n for p, n in seg_rows.items() if p in live}


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on this session's classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


class IcebergSnapshotStore:
    """SnapshotStore's surface on a real Iceberg catalog.

    ``root`` is ``catalog.namespace`` (e.g. ``lake.crawl``); every engine
    table becomes ``catalog.namespace.<name>`` and the commit log
    ``catalog.namespace.commit_log``.
    """

    def __init__(self, spark: SparkSession, root: str):
        if not iceberg_available(spark):
            raise RuntimeError(
                "iceberg-spark-runtime jar not on the classpath — use "
                "crunchy_spark.snapshot.SnapshotStore (the parquet substrate)"
            )
        self.spark = spark
        self.root = root  # catalog.namespace
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {root}")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {root}.commit_log ("
            " version BIGINT, table_name STRING, snapshot_id BIGINT,"
            " segment STRING, row_count BIGINT, meta STRING)"
            " USING iceberg"
        )

    # -- manifest plumbing ---------------------------------------------------
    def _tbl(self, name: str) -> str:
        return f"{self.root}.{name}"

    def current_version(self) -> int:
        row = self.spark.sql(
            f"SELECT max(version) AS v FROM {self._tbl('commit_log')}"
        ).first()
        return -1 if row is None or row["v"] is None else int(row["v"])

    def manifest(self, version: int | None = None) -> dict[str, Any]:
        """Full table state of ``version`` — a pure ``version == v`` scan
        (each commit records its complete state, carried-forward rows
        included), mirroring SnapshotStore's one-manifest-per-version.
        Path strings are ``table@vNNNNNN-{base|delta}``; a carried-forward
        segment keeps the identical path string across versions, which the
        loop's CDC diff (loop.py:254) relies on."""
        v = self.current_version() if version is None else version
        if v < 0:
            return {"version": -1, "tables": {}, "meta": {}}
        rows = (
            self.spark.table(self._tbl("commit_log"))
            .filter(F.col("version") == v)
            .collect()
        )
        return rows_to_manifest(rows, v)

    # -- public API ----------------------------------------------------------
    def commit(
        self,
        tables: dict[str, DataFrame] | None = None,
        meta: dict[str, Any] | None = None,
        appends: dict[str, DataFrame] | None = None,
        row_counts: dict[str, int] | None = None,
    ) -> int:
        prev = self.manifest()
        new_version = prev["version"] + 1
        counts = row_counts or {}
        # carry the previous version's full state forward, then apply writes
        state, seg_rows = carry_forward_state(
            prev, list(tables or {}), list(appends or {}), new_version, counts
        )
        snaps: dict[str, int] = dict(prev.get("snapshot_ids", {}))
        changed: set[str] = set()
        for name, df in (tables or {}).items():
            seg = f"v{new_version:06d}-base"
            # every write carries a _segment column so later delta appends
            # never hit Iceberg's extra-column schema check, and
            # load_segments can address the base frame by tag
            df.withColumn("_segment", F.lit(seg)).writeTo(
                self._tbl(name)
            ).using("iceberg").createOrReplace()
            changed.add(name)
        for name, df in (appends or {}).items():
            seg = f"v{new_version:06d}-delta"
            tagged = df.withColumn("_segment", F.lit(seg))
            if self.spark.catalog.tableExists(self._tbl(name)):
                tagged.writeTo(self._tbl(name)).append()
            else:
                tagged.writeTo(self._tbl(name)).using("iceberg").createOrReplace()
            changed.add(name)
        meta_json = json.dumps(meta or {})
        entries = []
        for name, segs in state.items():
            if name in changed:
                snaps[name] = int(
                    self.spark.sql(
                        f"SELECT snapshot_id FROM {self._tbl(name)}.snapshots"
                        " ORDER BY committed_at DESC LIMIT 1"
                    ).first()["snapshot_id"]
                )
            for seg in segs:
                entries.append(
                    (new_version, name, snaps[name], seg,
                     seg_rows.get(f"{name}@{seg}"), meta_json)
                )
        if not entries:  # meta-only commit on an empty store
            entries = [(new_version, "__meta__", 0, "__meta__", None, meta_json)]
        # THE commit point: one atomic fast-append to the commit log
        self.spark.createDataFrame(
            entries,
            "version long, table_name string, snapshot_id long,"
            " segment string, row_count long, meta string",
        ).writeTo(self._tbl("commit_log")).append()
        return new_version

    def load(
        self, spark: SparkSession, name: str, version: int | None = None
    ) -> DataFrame:
        m = self.manifest(version)
        if name not in m["tables"]:
            raise KeyError(f"table {name!r} not in snapshot v{m['version']}")
        snap = m["snapshot_ids"][name]
        df = spark.read.option("snapshot-id", snap).table(self._tbl(name))
        return df.drop("_segment") if "_segment" in df.columns else df

    def load_segments(
        self, spark: SparkSession, name: str, version: int | None = None
    ) -> list[DataFrame]:
        m = self.manifest(version)
        if name not in m["tables"]:
            raise KeyError(f"table {name!r} not in snapshot v{m['version']}")
        snap = m["snapshot_ids"][name]
        df = spark.read.option("snapshot-id", snap).table(self._tbl(name))
        # one frame per manifest path, oldest first, base included —
        # matching SnapshotStore.load_segments; every committed row
        # carries _segment (base rows tagged vNNNNNN-base at write)
        return [
            df.filter(F.col("_segment") == p.split("@", 1)[1]).drop("_segment")
            for p in m["tables"][name]
        ]

    def segment_rows(
        self, name: str, version: int | None = None
    ) -> list[int | None]:
        m = self.manifest(version)
        if name not in m["tables"]:
            raise KeyError(f"table {name!r} not in snapshot v{m['version']}")
        rows = m.get("segment_rows", {})
        return [rows.get(p) for p in m["tables"][name]]

    def has_table(self, name: str) -> bool:
        return name in self.manifest()["tables"]

    def rollback(self, version: int) -> None:
        if version > self.current_version() or version < 0:
            raise ValueError(f"no snapshot v{version}")
        # re-append the target version's rows as the new head — history
        # stays linear and auditable (Iceberg's own rollback procedure
        # works the same way: a new snapshot pointing at old data).
        # Because every version's rows are its FULL state, the head
        # manifest equals v's exactly: delta segments committed after v
        # are discarded, matching SnapshotStore.rollback.
        head = self.current_version() + 1
        self.spark.sql(
            f"INSERT INTO {self._tbl('commit_log')}"
            f" SELECT {head} AS version, table_name, snapshot_id, segment,"
            f" row_count, meta FROM {self._tbl('commit_log')}"
            f" WHERE version = {version}"
        )

    def expire_snapshots(self, keep_last: int = 8) -> dict[str, int]:
        cur = self.current_version()
        cutoff = cur - max(1, keep_last) + 1
        names = [
            r["table_name"]
            for r in self.spark.table(self._tbl("commit_log"))
            .select("table_name")
            .distinct()
            .collect()
            if r["table_name"] not in ("__meta__",)
        ]
        catalog = self.root.split(".", 1)[0]
        for name in names:
            self.spark.sql(
                f"CALL {catalog}.system.expire_snapshots("
                f"table => '{self._tbl(name)}', retain_last => {keep_last})"
            )
        before = self.spark.table(self._tbl("commit_log")).count()
        self.spark.sql(
            f"DELETE FROM {self._tbl('commit_log')} WHERE version < {cutoff}"
        )
        after = self.spark.table(self._tbl("commit_log")).count()
        return {"manifests_deleted": int(before - after), "segments_deleted": -1}


def merge_upsert(spark: SparkSession, target: str, updates: DataFrame,
                 key: str = "sha_int") -> None:
    """The production form of loop.py's frontier status-flip delta:
    native Iceberg MERGE INTO (format-version 2, merge-on-read). The
    parquet substrate emulates exactly this with equality-delete
    semantics; on a real catalog the statement below replaces it."""
    updates.createOrReplaceTempView("_merge_updates")
    spark.sql(
        f"MERGE INTO {target} t USING _merge_updates u ON t.{key} = u.{key}"
        " WHEN MATCHED THEN UPDATE SET *"
        " WHEN NOT MATCHED THEN INSERT *"
    )
