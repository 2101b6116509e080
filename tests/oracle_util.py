"""Local mirror of the driver's DuckDB-oracle comparison: row count +
column names + order-insensitive value multiset."""

from __future__ import annotations

import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        if r == int(r) and abs(r) < 1e15:
            return str(int(r))
        return f"{r:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, int):
        return str(v)
    return str(v)


def normalize_rows(cols: list[str], rows) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return sorted(cols), out


def spark_result(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return normalize_rows(cols, rows)


def duck_result(con, sql: str):
    cur = con.sql(sql)
    cols = list(cur.columns)
    rows = cur.fetchall()
    return normalize_rows(cols, rows)


def compare(df, con, sql: str, name: str = "") -> None:
    scols, srows = spark_result(df)
    dcols, drows = duck_result(con, sql)
    assert scols == dcols, f"{name}: columns {scols} != {dcols}"
    assert len(srows) == len(drows), f"{name}: rowcount {len(srows)} != {len(drows)}"
    if srows != drows:
        diff_s = [r for r in srows if r not in set(drows)][:5]
        diff_d = [r for r in drows if r not in set(srows)][:5]
        raise AssertionError(f"{name}: values differ; spark-only={diff_s} duck-only={diff_d}")
