"""Pre-flight mirror of the driver's CORRECTNESS gate at sf0.01: run
EVERY queries() entry and its DuckDB oracle side-by-side, compare row
count + sorted column names + order-insensitive normalized value
multiset (the same comparison tests/oracle_util.py implements).

The pytest oracle suite runs at sf0.001; the driver gates at sf0.01 —
ties, caps, and sampling can differ between scales, so this catches
sf-dependent drift before the driver does.

Usage: python bench/validate_oracles.py [sf_dir] [name ...]
Prints one line per query and a FAIL summary; exit 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from crunchy_spark.session import get_spark
    from tests.oracle_util import duck_conn, duck_result, spark_result

    spark = get_spark(app_name="validate_oracles")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_conn(sf_dir)
    qs = e.queries()
    oracles = e.oracle_sql()
    fails: list[str] = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            scols, srows = spark_result(df)
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(srows)} (no_oracle) "
                  f"[{time.time() - t0:.1f}s]")
            continue
        try:
            dcols, drows = duck_result(con, oracles[name])
        except Exception:
            print(f"FAIL {name}: duckdb raised\n{traceback.format_exc()}")
            fails.append(name)
            continue
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} != {dcols}")
            fails.append(name)
        elif len(srows) != len(drows):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(drows)}")
            fails.append(name)
        elif srows != drows:
            ds = set(drows)
            ss = set(srows)
            print(f"FAIL {name}: values differ; "
                  f"spark-only={[r for r in srows if r not in ds][:3]} "
                  f"duck-only={[r for r in drows if r not in ss][:3]}")
            fails.append(name)
        else:
            print(f"ok   {name}: rows={len(srows)} hash-match "
                  f"[{time.time() - t0:.1f}s]")
    print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
