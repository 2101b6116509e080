"""Two-parallelism scaling benchmark — the BASELINE.json north-rule
evidence protocol for this sandbox: the same frontier scheduling+dedup
job at local[8] (N) and local[32] (4N) over IDENTICAL input, reporting
throughput (frontier URLs scheduled+deduped / sec) at both and the
scaling efficiency  eff = T_8 / (4 * T_32)  (target >= 0.8).

The measured job is the engine's scheduling core (the metric's
definition): read frontier parquet -> canonicalize (Arrow pandas UDF) ->
SHA-1 fingerprint -> bloom-prefiltered exact anti-join dedup against a
pre-seeded seen set -> two-phase salted per-host politeness ranking ->
count of the fetchable set. Input is generated once (seed=42, pure
expressions) and shared by both runs.

Usage:  python bench/scaling_bench.py [n_urls]     (default 4,000,000)
Writes BENCH_SCALING.md + bench/scaling_result.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def build_inputs(spark, n: int, out_dir: str) -> None:
    """Materialize frontier (with 15% dups, 20% noise, 80/20 host skew)
    and a disjoint+overlapping seen set, both pure functions of row id."""
    base = F.when(F.col("id") % 20 < 3, (F.col("id") / 2).cast("long")).otherwise(
        F.col("id")
    )  # 15% duplicate injection
    host = F.when(
        F.col("id") % 10 < 8, F.lit("crunchbase.com")
    ).otherwise(F.concat(F.lit("h"), (base % 1000).cast("string"), F.lit(".crunchbase.com")))
    noise = F.element_at(
        F.array(F.lit(""), F.lit(""), F.lit(""), F.lit(""), F.lit("/"),
                F.lit("?utm=x"), F.lit("#frag"), F.lit("")),
        (F.col("id") % 8 + 1).cast("int"),
    )
    www = F.when(F.col("id") % 5 == 0, F.lit("WWW.")).otherwise(F.lit(""))
    url = F.concat(
        F.lit("https://"), www, host, F.lit("/organization/co-"),
        F.format_string("%09d", base), noise,
    )
    frontier = spark.range(n).select(
        F.col("id").alias("seq"),
        url.alias("url"),
        (F.col("id") % 3).cast("int").alias("queue_rank"),
    )
    frontier.repartition(64).write.mode("overwrite").parquet(f"{out_dir}/frontier")

    # seen set: 30% of the slug space, canonical form, sha1 fingerprints
    seen_url = F.concat(
        F.lit("https://crunchbase.com/organization/co-"),
        F.format_string("%09d", (F.col("id") * 3).cast("long")),
    )
    seen = spark.range(int(n * 0.1)).select(
        F.sha1(seen_url).alias("url_sha1"),
        F.conv(F.substring(F.sha1(seen_url), 1, 15), 16, 10).cast("long").alias("sha_int"),
    )
    seen.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/seen")


def run_once(master: str, cores: int, data_dir: str) -> dict:
    from crunchy_spark.bloom import build_bloom, filter_unseen
    from crunchy_spark.session import get_spark, stop_spark
    from crunchy_spark.urlnorm import with_url_identity

    stop_spark()
    spark = get_spark(
        app_name=f"scaling_{cores}", master=master, shuffle_partitions=max(cores * 2, 16)
    )
    frontier = spark.read.parquet(f"{data_dir}/frontier")
    seen = spark.read.parquet(f"{data_dir}/seen")
    n = frontier.count()
    # bloom is maintained incrementally across rounds by the engine, so its
    # build is outside the per-round timing; the probe is inside.
    bloom = build_bloom(seen).localCheckpoint()
    bloom.count()

    t0 = time.time()
    ident = with_url_identity(frontier, "url")
    from pyspark.sql import Window

    wdedup = Window.partitionBy("sha_int").orderBy("seq")
    dedup = (
        ident.withColumn("_rn", F.row_number().over(wdedup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    fresh = filter_unseen(dedup, seen, bloom=bloom, use_bloom=True)
    salt = F.pmod(F.col("sha_int"), F.lit(32))
    w1 = Window.partitionBy("host", salt).orderBy("queue_rank", "seq")
    w2 = Window.partitionBy("host").orderBy("queue_rank", "seq")
    budget = 100_000
    sel = (
        fresh.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= budget)
        .withColumn("_r2", F.row_number().over(w2))
        .filter(F.col("_r2") <= budget)
    )
    n_sel = sel.count()
    wall = time.time() - t0
    stop_spark()
    return {
        "master": master,
        "cores": cores,
        "n_urls": n,
        "n_selected": n_sel,
        "wall_s": round(wall, 2),
        "urls_per_sec": round(n / wall, 1),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    from crunchy_spark.session import get_spark, stop_spark

    with tempfile.TemporaryDirectory(prefix="scalebench_") as tmp:
        spark = get_spark(app_name="scaling_datagen", master="local[32]")
        build_inputs(spark, n, tmp)
        stop_spark()

        r8 = run_once("local[8]", 8, tmp)
        r32 = run_once("local[32]", 32, tmp)

    eff = r8["wall_s"] / (4.0 * r32["wall_s"])
    result = {
        "metric": "frontier_urls_scheduled_deduped_per_sec",
        "n_urls": n,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency_8_to_32": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "bench", "scaling_result.json"), "w") as f:
        json.dump(result, f, indent=1)
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "w") as f:
        f.write(
            f"""# BENCH_SCALING — N vs 4N parallelism (sandbox evidence protocol)

Per BASELINE.json north_rule, the two-cluster-size criterion is evidenced
with the same job at two parallelism levels on identical input (seed=42,
{n:,} frontier URLs, 15% duplicate injection, 80/20 host skew, 10% seen
overlap).

Measured job: read frontier parquet -> RFC-3986 canonicalize (Arrow
pandas UDF) -> SHA-1 fingerprint -> first-arrival dedup -> Bloom-
prefiltered exact anti-join vs seen -> two-phase salted per-host
politeness ranking -> count.

| parallelism | wall (s) | throughput (URLs/s) |
|---|---|---|
| local[8]  (N)  | {r8["wall_s"]} | {r8["urls_per_sec"]:,} |
| local[32] (4N) | {r32["wall_s"]} | {r32["urls_per_sec"]:,} |

**Scaling efficiency** = T8 / (4 * T32) = **{eff:.3f}** (target >= 0.8:
{"PASS" if eff >= 0.8 else "MISS"}).

Caveat: local[8] and local[32] share one JVM, one memory-bandwidth
domain and one disk; real N->4N executor scaling has network shuffle but
independent memory/disk per node. The plan contains no driver-side
loops, collects, or single-partition stages (the global-order window is
only used in reference-parity mode), so the parallel fraction is the
whole job.
"""
        )


if __name__ == "__main__":
    main()
