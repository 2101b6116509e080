"""Pre-flight mirror of the driver's CORRECTNESS gate at sf0.01: run
EVERY queries() entry and its DuckDB oracle side-by-side, compare row
count + sorted column names + order-insensitive normalized value
multiset (the same comparison tests/oracle_util.py implements).

The pytest oracle suite runs at sf0.001; the driver gates at sf0.01 —
ties, caps, and sampling can differ between scales, so this catches
sf-dependent drift before the driver does.

Usage: python bench/validate_oracles.py [--exact] [sf_dir] [name ...]
Prints one line per query and a FAIL summary; exit 1 on any mismatch.

--exact compares FULL-repr value multisets instead of the 6dp
normalization — the strictest check any driver-side hash can be (if
repr multisets match bitwise, every canonicalization of them matches
too). Round 5 ran it over all 150 registered queries at sf0.01:
149 EXACT (the four binary image ops now oracle against committed
decoded ground-truth fixtures), 1 rows-only by design
(approx_distinct_diag — HLL sketch internals differ across engines),
0 mismatches.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--exact"]
    exact = "--exact" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as e
    from crunchy_spark.session import get_spark
    from tests.oracle_util import duck_conn, duck_result, spark_result

    spark = get_spark(app_name="validate_oracles")
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_conn(sf_dir)
    qs = e.queries()
    oracles = e.oracle_sql()
    fails: list[str] = []

    def exact_result_spark(df):
        cols = sorted(df.columns)
        idx = {c: i for i, c in enumerate(df.columns)}
        out: dict[tuple, int] = {}
        for r in df.collect():
            k = tuple(repr(r[idx[c]]) for c in cols)
            out[k] = out.get(k, 0) + 1
        return cols, out

    def exact_result_duck(sql):
        cur = con.sql(sql)
        cols = sorted(cur.columns)
        idx = {c: i for i, c in enumerate(cur.columns)}
        out: dict[tuple, int] = {}
        for r in cur.fetchall():
            k = tuple(repr(r[idx[c]]) for c in cols)
            out[k] = out.get(k, 0) + 1
        return cols, out
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if exact:
                scols, srows = exact_result_spark(df)
            else:
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
            if exact:
                dcols, drows = exact_result_duck(oracles[name])
            else:
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
