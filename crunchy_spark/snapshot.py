"""Snapshot-committed multi-table store (Iceberg-style, parquet-backed).

The sandbox image has no Iceberg jar, so this is a thin, API-compatible
substrate: each commit writes new parquet versions of the changed tables,
then atomically swaps a root manifest (`os.replace`). Readers always see a
consistent set of table versions; resume = read the current manifest.

At cluster scale this maps 1:1 onto Iceberg:
  commit()  -> one transaction appending/overwriting N tables
  load()    -> snapshot-isolated table scan
  rollback  -> point CURRENT at an older manifest (kept on disk)

Reference analogs: durable RabbitMQ queues + "Resuming crawl (%d requests
scheduled)" (rabbitmq/connection.py:26-32, scheduler.py:122-123) and the
at-least-once ack/nack redelivery (pipelines.py:174-206) — subsumed here
by atomic snapshot commits of the whole engine state.
"""

from __future__ import annotations

import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        self.snap_dir = os.path.join(root, "_snapshots")
        self.data_dir = os.path.join(root, "data")
        os.makedirs(self.snap_dir, exist_ok=True)
        os.makedirs(self.data_dir, exist_ok=True)

    # -- manifest plumbing --------------------------------------------------
    def _current_path(self) -> str:
        return os.path.join(self.snap_dir, "CURRENT")

    def current_version(self) -> int:
        try:
            with open(self._current_path()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return -1

    def manifest(self, version: int | None = None) -> dict[str, Any]:
        v = self.current_version() if version is None else version
        if v < 0:
            return {"version": -1, "tables": {}, "meta": {}}
        with open(os.path.join(self.snap_dir, f"v{v:06d}.json")) as f:
            return json.load(f)

    # -- public API ----------------------------------------------------------
    def commit(
        self,
        tables: dict[str, DataFrame] | None = None,
        meta: dict[str, Any] | None = None,
        appends: dict[str, DataFrame] | None = None,
        row_counts: dict[str, int] | None = None,
    ) -> int:
        """Atomically commit new state.

        ``tables``  — full overwrite (new single segment), for tables whose
                      rows mutate (frontier status flips).
        ``appends`` — append a delta segment to the table's segment list
                      (Iceberg-style fast append; no rewrite of history) —
                      for append-only tables (seen/items/lineage/fetch_log).
        ``row_counts`` — optional {table_name: row_count} for segments
                      written in THIS commit; recorded in the manifest
                      (Iceberg keeps per-data-file record counts the same
                      way) so readers can size merge strategies without a
                      counting job. Callers usually already hold these
                      counts from their own localCheckpoint().count().
        Unchanged tables carry forward from the previous manifest.
        """
        prev = self.manifest()
        new_version = prev["version"] + 1
        table_paths = {k: list(v) for k, v in prev["tables"].items()}
        seg_rows = dict(prev.get("segment_rows", {}))
        counts = row_counts or {}
        for name, df in (tables or {}).items():
            rel = os.path.join("data", name, f"v{new_version:06d}")
            df.write.mode("overwrite").parquet(os.path.join(self.root, rel))
            table_paths[name] = [rel]
            if name in counts:
                seg_rows[rel] = int(counts[name])
        for name, df in (appends or {}).items():
            rel = os.path.join("data", name, f"v{new_version:06d}-delta")
            df.write.mode("overwrite").parquet(os.path.join(self.root, rel))
            table_paths.setdefault(name, []).append(rel)
            if name in counts:
                seg_rows[rel] = int(counts[name])
        live = {p for paths in table_paths.values() for p in paths}
        manifest = {
            "version": new_version,
            "tables": table_paths,
            "meta": meta or {},
            "segment_rows": {p: n for p, n in seg_rows.items() if p in live},
        }
        mpath = os.path.join(self.snap_dir, f"v{new_version:06d}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, mpath)
        # the atomic pointer swap — this is the commit point
        tmp_cur = self._current_path() + ".tmp"
        with open(tmp_cur, "w") as f:
            f.write(str(new_version))
        os.replace(tmp_cur, self._current_path())
        return new_version

    def load(self, spark: SparkSession, name: str, version: int | None = None) -> DataFrame:
        m = self.manifest(version)
        if name not in m["tables"]:
            raise KeyError(f"table {name!r} not in snapshot v{m['version']}")
        paths = [os.path.join(self.root, p) for p in m["tables"][name]]
        return spark.read.parquet(*paths)

    def load_segments(
        self, spark: SparkSession, name: str, version: int | None = None
    ) -> list[DataFrame]:
        """One DataFrame per committed segment, oldest first — for tables
        whose segments are NOT row-unioned at read (e.g. per-round bloom
        delta filters, probed segment-wise)."""
        m = self.manifest(version)
        if name not in m["tables"]:
            raise KeyError(f"table {name!r} not in snapshot v{m['version']}")
        return [
            spark.read.parquet(os.path.join(self.root, p)) for p in m["tables"][name]
        ]

    def segment_rows(
        self, name: str, version: int | None = None
    ) -> list[int | None]:
        """Recorded row count per segment of ``name`` (oldest first),
        None where the committing writer didn't record one."""
        m = self.manifest(version)
        if name not in m["tables"]:
            raise KeyError(f"table {name!r} not in snapshot v{m['version']}")
        rows = m.get("segment_rows", {})
        return [rows.get(p) for p in m["tables"][name]]

    def has_table(self, name: str) -> bool:
        return name in self.manifest()["tables"]

    def rollback(self, version: int) -> None:
        if not os.path.exists(os.path.join(self.snap_dir, f"v{version:06d}.json")):
            raise ValueError(f"no snapshot v{version}")
        tmp = self._current_path() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._current_path())

    def expire_snapshots(self, keep_last: int = 8) -> dict[str, int]:
        """Iceberg ``expire_snapshots`` analog: delete manifests older
        than the newest ``keep_last`` versions, plus every data segment
        referenced ONLY by expired manifests. Without this a long crawl
        retains every historical parquet version forever — at 10^10-URL
        scale the dominant storage cost is dead frontier bases, not live
        state. Time travel / rollback stay available within the retained
        window; the CURRENT pointer (and anything it references) is
        never touched. Returns {manifests_deleted, segments_deleted}.

        Ordering matches Iceberg's safety argument: compute the live
        set from RETAINED manifests first, delete data files, delete
        expired manifests last — a crash mid-expire leaves only
        harmless orphan manifests pointing at missing segments below
        the retention window."""
        import re
        import shutil

        cur = self.current_version()
        if cur < 0:
            return {"manifests_deleted": 0, "segments_deleted": 0}
        cutoff = cur - max(1, keep_last) + 1
        retained, expired = [], []
        for fn in sorted(os.listdir(self.snap_dir)):
            m = re.fullmatch(r"v(\d{6})\.json", fn)
            if m:
                (retained if int(m.group(1)) >= cutoff else expired).append(
                    int(m.group(1))
                )
        live: set[str] = set()
        for v in retained:
            for paths in self.manifest(v)["tables"].values():
                live.update(paths)
        dead: set[str] = set()
        for v in expired:
            for paths in self.manifest(v)["tables"].values():
                dead.update(p for p in paths if p not in live)
        for p in dead:
            full = os.path.join(self.root, p)
            if os.path.isdir(full):
                shutil.rmtree(full)
        for v in expired:
            os.remove(os.path.join(self.snap_dir, f"v{v:06d}.json"))
        return {"manifests_deleted": len(expired), "segments_deleted": len(dead)}
