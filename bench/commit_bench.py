"""Frontier-commit cost evidence (VERDICT round-1 item 6).

Measures one politeness-budgeted crawl round at several frontier sizes
and reports, per round: wall seconds, rows selected, rows written to the
frontier table (the delta segment), and total frontier rows. The claim
being evidenced: with delta-segment commits the frontier WRITE cost is
O(selected + new) — constant as the frontier grows — where the round-1
engine rewrote the whole frontier table every round. (The read side
still scans pending for selection; that term is inherent to scheduling
and is what the scaling bench measures.)

Usage: python bench/commit_bench.py [sizes_csv]   (default 1,4,16 x 1e6)
Writes BENCH_COMMIT.md at the repo root.
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


def synth_seeds(spark, n: int):
    """n seed URLs, 80/20 host skew, pure column expressions (seed=42
    shape, same family as bench/scaling_bench.py inputs)."""
    host = F.when(F.col("id") % 10 < 8, F.lit("crunchbase.com")).otherwise(
        F.concat(F.lit("h"), (F.col("id") % 1000).cast("string"), F.lit(".crunchbase.com"))
    )
    url = F.concat(
        F.lit("https://"), host, F.lit("/organization/co-"), F.format_string("%09d", F.col("id"))
    )
    return spark.range(n).select(
        url.alias("url"),
        F.lit(None).cast("string").alias("entry_point"),
        F.lit("crunchbase").alias("queue"),
        F.col("id").alias("seq"),
        F.lit(None).cast("string").alias("image_id"),
        F.lit(0.0).alias("priority"),
    )


def run_size(
    spark, n: int, fixtures_dir: str, workdir: str, adaptive: bool = False
) -> list[dict]:
    from crunchy_spark.loop import CrawlConfig, CrawlEngine
    from crunchy_spark.snapshot import SnapshotStore

    store = SnapshotStore(os.path.join(workdir, f"store_{n}_{int(adaptive)}"))
    # round_seconds=5 at the fixture's 1-5s crawl delays => 1-5 URLs per
    # host per round (~3-4k/round across 1001 hosts) regardless of n
    eng = CrawlEngine(
        spark,
        store,
        fixtures_dir,
        CrawlConfig(
            round_seconds=5.0, use_bloom=True, adaptive_delay=adaptive
        ),
    )
    eng.bootstrap(synth_seeds(spark, n))
    out = []
    for _ in range(2):
        t0 = time.time()
        s = eng.run_round()
        wall = time.time() - t0
        if s is None:  # frontier drained (tiny sizes_csv arg)
            break
        segs = store.manifest()["tables"]["frontier"]
        delta_rows = spark.read.parquet(os.path.join(store.root, segs[-1])).count()
        out.append(
            {
                "adaptive_delay": adaptive,
                "frontier_rows": n,
                "round": s["round"],
                "selected": s["selected"],
                "new_urls": s["new_urls"],
                "frontier_rows_written": delta_rows,
                "wall_s": round(wall, 2),
                "write_fraction_of_frontier": round(delta_rows / n, 6),
            }
        )
    return out


def main() -> None:
    sizes = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [1_000_000, 4_000_000, 16_000_000]
    )
    from crunchy_spark import datagen
    from crunchy_spark.loop import CrawlConfig
    from crunchy_spark.session import get_spark

    spark = get_spark(app_name="commit_bench", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    rows: list[dict] = []
    with tempfile.TemporaryDirectory(prefix="commitbench_") as tmp:
        fx = os.path.join(tmp, "fx")
        datagen.write_fixtures(spark, fx, scale="unit")
        for n in sizes:
            new = run_size(spark, n, fx, tmp)
            rows += new
            for r in new:
                print(f"# {r}", file=sys.stderr)
        # the AIMD fold on (Config.adaptive_delay): per-round cost must
        # stay O(round + hosts) — one extra host-sized overwrite, never
        # a history re-fold (r4 verdict #3 acceptance)
        new = run_size(spark, sizes[-1], fx, tmp, adaptive=True)
        rows += new
        for r in new:
            print(f"# {r}", file=sys.stderr)

    print(json.dumps({"metric": "frontier_commit_cost", "rounds": rows}))
    table = "\n".join(
        f"| {r['frontier_rows']:,} | {r['round']} | {r['selected']:,} "
        f"| {r['frontier_rows_written']:,} | {100 * r['write_fraction_of_frontier']:.4f}% "
        f"| {r['wall_s']} | {'yes' if r.get('adaptive_delay') else 'no'} |"
        for r in rows
    )
    if not rows:
        print("# no completed rounds (frontier drained at every size); "
              "BENCH_COMMIT.md not written", file=sys.stderr)
        return
    # first round at the smallest and largest sizes (round 2 can include
    # compaction, so round 1 is the representative per-round cost)
    first = rows[0]
    last = next(r for r in reversed(rows) if r["round"] == 1)
    with open(os.path.join(REPO, "BENCH_COMMIT.md"), "w") as f:
        f.write(
            f"""# BENCH_COMMIT — frontier commit cost vs frontier size

One politeness-budgeted crawl round (round_seconds=5, 1001 hosts, 80/20
host skew) at growing frontier sizes. Round-1's engine rewrote the whole
frontier table per round; the delta-segment commit writes only the rows
the round touched (status flips + new URLs), merged at read by
latest-state-per-key (Iceberg merge-on-read with equality deletes,
compaction every {CrawlConfig().compact_every} segments and on drain).

| frontier rows | round | selected | frontier rows written | % of frontier | wall (s) | AIMD fold |
|---|---|---|---|---|---|---|
{table}

The write stays round-sized while the frontier grows
{last["frontier_rows"] // first["frontier_rows"]}x
({first["frontier_rows_written"]:,} -> {last["frontier_rows_written"]:,} rows written
per round at {first["frontier_rows"]:,} -> {last["frontier_rows"]:,} frontier rows —
{100 * last["write_fraction_of_frontier"]:.4f}% of the table, vs 100% before).
The AIMD-fold rows (Config.adaptive_delay=True, r5) show the live
politeness controller adds only a host-sized overwrite per round — the
fold reads THIS round's log seeded from the carried state (clamp-fold
associativity), never the full history, so the commit stays O(round).
Residual wall growth is the selection READ scan (pending filter +
politeness ranking over the whole frontier), which is the scheduling
work itself — measured and scaled separately in BENCH_SCALING.md.
"""
        )


if __name__ == "__main__":
    main()
