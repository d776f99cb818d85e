"""Local replica of the driver's correctness gate: run every queries() entry on
Spark AND its oracle_sql() on DuckDB over the same sf dir; compare row count,
column names, and an order-insensitive value multiset.

Usage: python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from e2e_ocsf_cyber_lakehouse_blueprint_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return repr(v.normalize())
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def row_multiset(rows, col_order):
    out = []
    for r in rows:
        d = dict(zip(r.__fields__ if hasattr(r, "__fields__") else col_order, r))
        out.append(tuple(canon(d[c]) for c in sorted(col_order)))
    return sorted(out)


def duck_rows(con, sql):
    rel = con.sql(sql)
    cols = rel.columns
    rows = rel.fetchall()
    out = []
    idx = {c: i for i, c in enumerate(cols)}
    for r in rows:
        out.append(tuple(canon(r[idx[c]]) for c in sorted(cols)))
    return cols, sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(parallelism=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = df.collect()
            got = row_multiset(rows, cols)
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"[FAIL-spark] {name}: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only ] {name}: {len(got)} rows, {time.time()-t0:.1f}s")
            continue
        try:
            ocols, want = duck_rows(con, oracles[name])
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"[FAIL-duck ] {name}: {e}")
            continue
        status = []
        if len(got) != len(want):
            status.append(f"rowcount {len(got)} vs {len(want)}")
        if sorted(cols) != sorted(ocols):
            status.append(f"cols {sorted(cols)} vs {sorted(ocols)}")
        if not status and got != want:
            diff = [(g, w) for g, w in zip(got, want) if g != w][:3]
            status.append(f"values differ, first diffs: {diff}")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"[FAIL      ] {name}: {'; '.join(status)[:500]}")
        else:
            print(f"[OK        ] {name}: {len(got)} rows, {time.time()-t0:.1f}s")
    print(f"\n{len(failures)} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
