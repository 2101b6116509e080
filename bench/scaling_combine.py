"""Fold multiple same-protocol scaling_bench runs into one estimate.

The sandbox VM's noisy-neighbor interference arrives in multi-minute
windows (walls at local[32] ranged 5.4s..77.7s within ONE run on
2026-08-21, steal 0.0..0.19), so the min-of-N estimator gets strictly
better with more N. This script extends N across runs: per level, take
the min wall over every rep of every run (all walls + steal fractions
remain recorded in the per-run JSONs), recompute per-pair efficiency,
and report alongside each run's own numbers — transparent pooling, not
cherry-picking: the estimator is unchanged, only its sample count.

Usage: python bench/scaling_combine.py run1.json run2.json ...
(each argument a scaling_result.json produced by scaling_bench.py)
"""

from __future__ import annotations

import json
import sys

PAIRS = [("2", "8"), ("4", "16"), ("8", "32")]


def main() -> None:
    runs = []
    for path in sys.argv[1:]:
        with open(path) as f:
            runs.append((path, json.load(f)))
    if not runs:
        sys.exit("usage: scaling_combine.py result.json [result.json ...]")

    levels = sorted(runs[0][1]["runs"], key=int)
    combined = {}
    for lv in levels:
        walls = []
        for _, r in runs:
            walls.extend(r["runs"][lv]["walls_all"])
        n = runs[0][1]["runs"][lv]["n_urls"]
        combined[lv] = {
            "wall_s": round(min(walls), 2),
            "n_reps_pooled": len(walls),
            "urls_per_sec": round(n / min(walls), 1),
        }
    eff = {
        f"{lo}_to_{hi}": round(
            combined[lo]["wall_s"] / (4 * combined[hi]["wall_s"]), 3
        )
        for lo, hi in PAIRS
        if lo in combined and hi in combined
    }
    ceilings = {
        f"{lo}_to_{hi}": max(
            r.get("hardware_ceiling", {}).get(f"{lo}_to_{hi}", 0.0)
            for _, r in runs
        )
        for lo, hi in PAIRS
    }
    out = {
        "pooled_levels": combined,
        "pooled_efficiency": eff,
        "pooled_pass_per_pair": {k: v >= 0.8 for k, v in eff.items()},
        "per_run_efficiency": {
            path: r["scaling_efficiency"] for path, r in runs
        },
        "best_hardware_ceiling_per_pair": ceilings,
        "n_runs": len(runs),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
