"""spark-submit --py-files entry point: run the crawl loop end-to-end.

The north-rule deployment surface — package the engine and drive it the
way a cluster would:

    zip -qr /tmp/cs.zip crunchy_spark
    /opt/spark/bin/spark-submit --master 'local[16]' \
        --py-files /tmp/cs.zip bench/drive_crawl.py [n_seeds]

On a real cluster only --master changes; everything the executors need
ships in the zip. Prints per-round stats, the final frontier status
histogram, and item/seen counts. Exits non-zero if the frontier fails to
drain or any pending rows remain.
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import SparkSession


def main() -> int:
    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    from crunchy_spark import datagen
    from crunchy_spark.loop import CrawlConfig, CrawlEngine
    from crunchy_spark.snapshot import SnapshotStore

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="crawl_drive_")
    datagen.write_fixtures(spark, tmp + "/fx", scale="unit")
    store = SnapshotStore(tmp + "/store")
    eng = CrawlEngine(spark, store, tmp + "/fx", CrawlConfig(round_seconds=1e6))
    eng.bootstrap(spark.read.parquet(tmp + "/fx/frontier_seed.parquet"))
    for s in eng.run(max_rounds=50):
        print(f"round {s['round']}: selected={s['selected']} new={s['new_urls']}")
    hist = {
        r["status"]: r["count"]
        for r in store.load(spark, "frontier").groupBy("status").count().collect()
    }
    print("frontier:", hist)
    print("items:", eng.items().count(), "seen:", len(eng.seen_set()))
    if hist.get("pending", 0) != 0:
        print("ERROR: frontier did not drain", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
