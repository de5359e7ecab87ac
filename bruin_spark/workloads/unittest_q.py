"""Unit-test-framework workload: drives the fixture-CTE rewrite
(§2.8, ref pkg/unittest/warehouse.go:51-158) through a real
``queries()`` entry so the rewrite itself is oracle-checked.

The asset query aggregates a mocked upstream; ``build_test_query``
injects the fixture rows as a typed literal CTE and renames the
qualified upstream to the CTE-safe identifier.  Both engines run the
REWRITTEN SQL, so a rewrite bug (bad literal typing, missed rename,
broken CTE prepend) surfaces as a value mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bruin_spark.unittests.runner import build_test_query

_ASSET_QUERY = """
SELECT status, COUNT(*) AS n_orders, ROUND(SUM(amount), 2) AS total
FROM sales.orders_raw
WHERE amount > 0
GROUP BY status
"""

_SPEC = {
    "name": "fixture_rollup",
    "inputs": {
        "sales.orders_raw": {
            "columns": ["id", "status", "amount"],
            "types": ["bigint", "string", "double"],
            "rows": [
                [1, "open", 10.5],
                [2, "open", 4.5],
                [3, "done", 7.25],
                [4, "done", -1.0],  # filtered by the WHERE
                [5, "void", 0.0],   # filtered by the WHERE
            ],
        }
    },
}


def unittest_fixture_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    sql = build_test_query(_ASSET_QUERY, _SPEC)
    df = spark.sql(sql)
    return df.select(
        "status",
        df.n_orders.cast("long").alias("n_orders"),
        "total",
    )


# the oracle runs the SAME rewritten SQL through DuckDB (the rewrite is
# engine-portable ANSI SQL — that portability is part of the contract)
def _oracle() -> str:
    sql = build_test_query(_ASSET_QUERY, _SPEC)
    return f"SELECT status, n_orders::BIGINT AS n_orders, total FROM ({sql}) q"


QUERIES = {
    "unittest_fixture_query": (unittest_fixture_query, _oracle()),
}
