#!/usr/bin/env python
"""Local replica of the driver's t2 correctness harness.

Runs every ``queries()`` entry from __spark_entry__ on Spark AND its
``oracle_sql()`` on DuckDB (same parquet tables), compares row count,
column names, and order-insensitive values (rounded floats). Usage:

    python scripts/check_oracle.py [substring ...] [--sf DIR]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bool):
        return bool(v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 6)
    except ImportError:
        pass
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def df_to_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(cols[i] for i in idx), sorted(
        tuple(norm(r[i]) for i in idx) for r in rows
    )


def main():
    argv = sys.argv[1:]
    sf_dir = SF_DIR
    if "--sf" in argv:
        i = argv.index("--sf")
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if not a.startswith("--")]

    import duckdb

    import __spark_entry__ as entry
    from bruin_spark import get_spark

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    selected = {
        k: v for k, v in queries.items() if not args or any(a in k for a in args)
    }
    n_pass = n_fail = n_weak = 0
    for name, fn in selected.items():
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK {name}: rows-only check, {len(s_rows)} rows")
            n_weak += 1
            continue
        try:
            rel = con.execute(oracles[name])
            d_cols = [d[0] for d in rel.description]
            d_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue

        sc, sr = df_to_rows(s_cols, s_rows)
        dc, dr = df_to_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: columns differ spark={sc} duckdb={dc}")
            n_fail += 1
        elif len(sr) != len(dr):
            print(f"FAIL {name}: row count spark={len(sr)} duckdb={len(dr)}")
            n_fail += 1
        elif sr != dr:
            diffs = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
