"""Lineage workload: the column-lineage resolver run against a
representative CTE+join query, flattened to (out_column, src_table,
src_column) rows and oracle-checked against the expected golden edges —
the same golden-shape check the reference applies to its
parse-whole-pipeline lineage goldens (pkg/lineage/lineage.go tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bruin_spark.parser.lineage import get_column_lineage

_QUERY = """
WITH cust AS (SELECT c_custkey, c_name FROM customer)
SELECT o.o_orderkey AS order_id,
       cust.c_name AS customer_name,
       o.o_totalprice * 0.9 AS discounted
FROM orders o JOIN cust ON o.o_custkey = cust.c_custkey
WHERE o.o_orderstatus = 'F'
"""


def lineage_orders_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    res = get_column_lineage(_QUERY)
    rows = sorted(
        (c["name"], u["table"], u["column"])
        for c in res["columns"]
        for u in c["upstream"]
    )
    return spark.createDataFrame(
        rows, "out_column string, src_table string, src_column string"
    )


# golden edges: the CTE hop must resolve c_name to the physical customer
# table, and the arithmetic expression to its single physical input
LINEAGE_ORACLE = """
SELECT * FROM (VALUES
  ('customer_name', 'customer', 'c_name'),
  ('discounted', 'orders', 'o_totalprice'),
  ('order_id', 'orders', 'o_orderkey')
) AS t(out_column, src_table, src_column)
"""


QUERIES = {
    "lineage_orders_enriched": (lineage_orders_enriched, LINEAGE_ORACLE),
}
