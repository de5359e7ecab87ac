"""Mechanical driver-memory gate (r6 ask #8): every registry entry runs
at sf0.1 with ``DataFrame.collect`` / ``toPandas`` instrumented to count
rows pulled into the Python driver DURING PLAN CONSTRUCTION AND
EXECUTION; any entry whose internal driver-side materialization exceeds
DRIVER_ROW_BOUND fails.

What this guards: operators are allowed scalar probes (CC fingerprints,
BPE's one-row-per-merge, hot-strata quota tables, sensor polls) but must
never funnel a data-sized relation through the driver — at 100 TB that
is the difference between a working operator and an OOM.  The final
result row count is NOT charged to the entry (the gate triggers the
query with ``.count()``, which stays JVM-side); only internal
``collect``/``toPandas`` calls are.
"""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: documented bound: internal driver-side materializations must stay
#: k-row shaped (quota tables, per-round fingerprints), never data-shaped
DRIVER_ROW_BOUND = 10_000


def test_no_registry_entry_materializes_data_on_the_driver(spark, capsys):
    # patch the CONCRETE class: in pyspark 4 the base
    # pyspark.sql.dataframe.DataFrame is abstract and the classic
    # session instantiates pyspark.sql.classic.dataframe.DataFrame,
    # which defines its own collect/toPandas — patching the base is a
    # silent no-op (measured: every entry counted 0)
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # older pyspark
        from pyspark.sql import DataFrame

    from bruin_spark.workloads import collect_queries

    registry = collect_queries()
    counted = {"rows": 0}
    orig_collect = DataFrame.collect
    orig_topandas = DataFrame.toPandas

    def collect_counted(self):
        rows = orig_collect(self)
        counted["rows"] += len(rows)
        return rows

    def topandas_counted(self):
        pdf = orig_topandas(self)
        counted["rows"] += len(pdf)
        return pdf

    DataFrame.collect = collect_counted
    DataFrame.toPandas = topandas_counted
    per_entry: dict[str, int] = {}
    failures: dict[str, str] = {}
    try:
        # canary: the instrumentation must actually intercept, or the
        # whole gate is vacuously green
        spark.range(3).collect()
        assert counted["rows"] == 3, "collect instrumentation not intercepting"
        for name, (fn, _oracle) in sorted(registry.items()):
            counted["rows"] = 0
            try:
                df = fn(spark, SF_DIR)
                df.count()  # triggers execution JVM-side; not charged
            except Exception as e:  # an erroring entry is its own failure
                failures[name] = f"error: {type(e).__name__}: {str(e)[:120]}"
                continue
            per_entry[name] = counted["rows"]
            if counted["rows"] > DRIVER_ROW_BOUND:
                failures[name] = f"{counted['rows']} driver rows > {DRIVER_ROW_BOUND}"
    finally:
        DataFrame.collect = orig_collect
        DataFrame.toPandas = orig_topandas

    top = sorted(per_entry.items(), key=lambda kv: -kv[1])[:10]
    print(f"\ndriver-memory gate: {len(per_entry)} entries, bound {DRIVER_ROW_BOUND}")
    for name, n in top:
        print(f"  {name}: {n} driver rows")
    assert not failures, failures
    assert len(per_entry) >= 100, "registry shrank below the audited surface"
