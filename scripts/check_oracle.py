#!/usr/bin/env python
"""Local replica of the driver's t2 correctness harness.

Runs every ``queries()`` entry from __spark_entry__ on Spark AND its
``oracle_sql()`` on DuckDB (same parquet tables), compares row count,
column names, and order-insensitive values.

The comparison goes through pandas on BOTH sides (``toPandas()`` /
``duckdb .df()``) because that is what the driver does, and pandas is
stricter than row tuples: Spark DECIMAL arrives as ``object`` dtype
holding ``Decimal('137869.00')`` while DuckDB DECIMAL arrives as
``float64`` — those must FAIL here (they fail in the driver), so
queries must cast final aggregates to DOUBLE/BIGINT on both engines.
Timestamps beyond pandas datetime64[ns] range (e.g. the SCD2 sentinel
9999-12-31) hard-error, as they do in the driver.

Usage:  python scripts/check_oracle.py [substring ...] [--sf DIR]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, "/root/repo")

from bruin_spark.checkpointing import pinned_scope  # noqa: E402 — needs the path above

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    """Normalize one pandas cell, keeping type CLASS distinctions.

    int-like and float-like values hash differently (the driver's pandas
    path keeps int64 1000 != float64 1000.0), and Decimal objects are kept
    verbatim (Decimal('137869.00') != 137869.0 in the driver)."""
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    # every branch returns a ("tag", payload) 2-tuple so mixed columns
    # (NULL next to floats, etc.) stay mutually comparable under sorted()
    if v is None or v is pd.NaT:
        return ("0null", "")
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return ("f", float("inf"))  # nan sorts deterministically last
        return ("f", round(float(v), 6))
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, pd.Timestamp):
        return ("t", str(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return ("t", str(pd.Timestamp(v)))
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("list", tuple(norm(x) for x in v))
    if isinstance(v, bytes):
        return ("bytes", v)
    return ("s", str(v))


def pdf_to_rows(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        tuple(norm(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    return cols, rows


def main():
    argv = sys.argv[1:]
    sf_dir = SF_DIR
    if "--sf" in argv:
        i = argv.index("--sf")
        if i + 1 >= len(argv):
            print("usage: check_oracle.py [substring ...] [--sf DIR]")
            return 2
        sf_dir = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    unknown = [a for a in argv if a.startswith("--")]
    if unknown:
        print(f"unknown flag(s): {' '.join(unknown)}")
        return 2
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
    import time

    for name, fn in selected.items():
        t_start = time.time()
        try:
            # free per-query pinned blocks (localCheckpoints of
            # multi-referenced subtrees) — 111 entries in one session
            # otherwise accumulate them all
            with pinned_scope():
                sdf = fn(spark, sf_dir)
                complex_cols = [
                    f"{f.name}: {f.dataType.simpleString()}"
                    for f in sdf.schema.fields
                    if f.dataType.typeName() in ("array", "map", "struct")
                ]
                if complex_cols:
                    # the driver's pandas canonicalization cannot hash
                    # lists/dicts — this FAILS in its harness even when
                    # values match (CORRECTNESS_r12 text_bpe_ids)
                    print(f"FAIL {name}: complex top-level columns {complex_cols}")
                    n_fail += 1
                    continue
                s_pdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(
                f"WEAK {name}: rows-only check, {len(s_pdf)} rows"
                f" [{time.time() - t_start:.1f}s]"
            )
            n_weak += 1
            continue
        try:
            d_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue

        sc, sr = pdf_to_rows(s_pdf)
        dc, dr = pdf_to_rows(d_pdf)
        elapsed = time.time() - t_start
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
            print(f"PASS {name} ({len(sr)} rows) [{elapsed:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
