"""Stage-level scaling profile of the frontier scheduling job.

Times CUMULATIVE prefixes of the scaling_bench pipeline at two
parallelism levels so scaling loss is attributable to a stage:

  scan      : read frontier parquet, count
  canon     : + canonicalize UDF (Arrow round trip) + identity prune
  dedup     : + first_arrival min-struct aggregate (shuffle)
  unseen    : + bloom probe + exact anti-join vs seen
  select    : + two-phase salted politeness window + broadcast host dim

Usage: python bench/profile_stages.py [n_urls] [cores ...]
Each level runs in its own subprocess (fresh JVM), 1 warmup + 2 timed
reps per stage, min reported. Diagnostic tool — not part of bench.py.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_stages(master: str, cores: int, data_dir: str) -> dict:
    from pyspark.sql import functions as F

    from crunchy_spark.bloom import build_bloom, filter_unseen
    from crunchy_spark.frontier import (
        first_arrival,
        max_host_budget,
        select_fetchable,
    )
    from crunchy_spark.session import get_spark
    from crunchy_spark.urlnorm import with_url_identity

    spark = get_spark(
        app_name=f"profile_{cores}", master=master,
        shuffle_partitions=cores * 8,  # mirror scaling_bench.run_once
        extra_conf={
            # mirror scaling_bench's faithful-executor emulation
            "spark.driver.memory": f"{min(48, 3 * cores)}g",
            "spark.driver.extraJavaOptions": (
                f"-XX:ParallelGCThreads={max(2, cores)} "
                f"-XX:ConcGCThreads={max(1, max(2, cores) // 4)}"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    frontier = spark.read.parquet(f"{data_dir}/frontier")
    seen = spark.read.parquet(f"{data_dir}/seen")
    policy = spark.read.parquet(f"{data_dir}/host_policy")
    bloom = build_bloom(seen).localCheckpoint()
    bloom.count()
    census = (
        with_url_identity(frontier, "url")
        .groupBy("host").agg(F.count("*").alias("n_pending"))
        .localCheckpoint()
    )
    census.count()
    census_k = census.select(F.xxhash64("host").alias("host_key"), "n_pending")
    policy_k = policy.withColumn("host_key", F.xxhash64("host")).drop("host")
    host_dim = census.select("host", F.xxhash64("host").alias("host_key"))

    def ident_df():
        return with_url_identity(frontier, "url").select(
            "sha_int", "seq", F.xxhash64("host").alias("host_key"), "queue_rank"
        )

    def stage_scan():
        return frontier.select("seq")

    def stage_canon():
        return ident_df()

    def stage_dedup():
        return first_arrival(ident_df(), "sha_int", ("seq",))

    def stage_unseen():
        return filter_unseen(stage_dedup(), seen, bloom=bloom, use_bloom=True)

    maxb = max_host_budget(policy, 3600.0)

    def stage_select():
        sel = select_fetchable(
            stage_unseen(), policy_k, round_seconds=3600.0, salt_k=128,
            census=census_k, host_col="host_key", max_budget=maxb,
        )
        return sel.join(F.broadcast(host_dim), "host_key")

    out = {}
    for name, fn in [
        ("scan", stage_scan), ("canon", stage_canon), ("dedup", stage_dedup),
        ("unseen", stage_unseen), ("select", stage_select),
    ]:
        fn().count()  # warmup (codegen/JIT for this plan shape)
        walls = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            fn().count()
            walls.append(time.time() - t0)
        out[name] = round(min(walls), 2)
    spark.stop()
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cores = [int(c) for c in sys.argv[2:]] or [2, 8]
    with tempfile.TemporaryDirectory(prefix="profstages_") as tmp:
        subprocess.run(
            [sys.executable, os.path.join(REPO, "bench", "scaling_bench.py"),
             "--gen", str(n), tmp],
            check=True,
        )
        results = {}
        sys.path.insert(0, os.path.join(REPO, "bench"))
        from scaling_bench import _pin  # same affinity protocol as the bench

        for c in cores:
            out = subprocess.run(
                _pin(c) + [sys.executable, os.path.abspath(__file__), "--one",
                           f"local[{c}]", str(c), tmp],
                capture_output=True, text=True, check=True,
            )
            results[c] = json.loads(out.stdout.strip().splitlines()[-1])
            print(f"# local[{c}]: {results[c]}", file=sys.stderr)
    # per-stage marginal walls + scaling efficiency between the two levels
    lo, hi = cores[0], cores[-1]
    names = list(results[lo].keys())
    marg = {}
    for c in cores:
        prev = 0.0
        marg[c] = {}
        for nm in names:
            marg[c][nm] = round(results[c][nm] - prev, 2)
            prev = results[c][nm]
    report = {
        "n_urls": n, "cumulative": results, "marginal": marg,
        "stage_scaling_eff": {
            nm: round(
                max(marg[lo][nm], 0.01) / ((hi / lo) * max(marg[hi][nm], 0.01)), 3
            )
            for nm in names
        },
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    if len(sys.argv) >= 2 and sys.argv[1] == "--one":
        print(json.dumps(run_stages(sys.argv[2], int(sys.argv[3]), sys.argv[4])))
    else:
        main()
