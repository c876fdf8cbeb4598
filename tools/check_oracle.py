"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given sf dir, then compares
row-count, sorted column names, and the order-insensitive multiset of row
values. Floats compare after round(9) (queries already round themselves —
this only absorbs representation noise).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
from collections import Counter

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402
from qvarn_mr_spark.catalog import TESTDATA_TABLES  # noqa: E402
from qvarn_mr_spark.session import get_spark  # noqa: E402


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, bool):
        return int(v)
    return v


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def main():
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = set(a for a in args if "/" not in a)

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        print(f"unknown queries: {sorted(unknown)}")
        sys.exit(2)
    failed = []
    attempted = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        attempted += 1
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            s_cols = sorted(df.columns)
            s_rows = df.collect()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            bound = getattr(entry, "bound_oracles", lambda: {})().get(name)
            if bound is not None:
                exact_sql, check = bound
                try:
                    check(s_rows, con.execute(exact_sql).fetchall())
                except AssertionError as e:
                    print(f"FAIL {name}: bound violated: {e}")
                    failed.append(name)
                    continue
                print(f"PASS {name}: rows={len(s_rows)} (bound oracle)")
                continue
            print(f"okay {name}: rows={len(s_rows)} (no oracle — rows-only)")
            continue
        try:
            res = con.execute(sql)
            d_cols = sorted(d[0] for d in res.description)
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failed.append(name)
            continue
        dt = time.time() - t0
        if s_cols != d_cols:
            print(f"FAIL {name}: columns {s_cols} != {d_cols}")
            failed.append(name)
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount {len(s_rows)} != {len(d_rows)}")
            failed.append(name)
            continue
        sm = rows_multiset(df.columns, [tuple(r) for r in s_rows])
        dm = rows_multiset([d[0] for d in res.description], d_rows)
        if sm != dm:
            diff_s = list((sm - dm).items())[:3]
            diff_d = list((dm - sm).items())[:3]
            print(f"FAIL {name}: value mismatch; spark-only={diff_s} "
                  f"duck-only={diff_d}")
            failed.append(name)
            continue
        print(f"PASS {name}: rows={len(s_rows)} ({dt:.1f}s)")

    print(f"\n{attempted - len(failed)}/{attempted} passed")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
