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


_USING_QUERY = """
SELECT n_regionkey,
       COUNT(*) AS cnt,
       MAX((SELECT MAX(s.s_acctbal) FROM supplier s
            WHERE s.s_nationkey = a.n_nationkey)) AS top_acctbal
FROM nation a JOIN nation b USING (n_regionkey)
GROUP BY 1
"""

_SCHEMA = {
    "nation": ["n_nationkey", "n_name", "n_regionkey", "n_comment"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
}


def lineage_using_ordinals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 resolver behaviors as driver-checkable golden edges: a
    JOIN..USING column resolves to BOTH sides without ambiguity, a
    correlated scalar subquery contributes its own leaf upstream, and
    GROUP BY ordinals resolve through the select list into non-selected
    refs (reference bar: pythonsrc/parser/main_test.py nested-subqueries
    + subquery-in-select + snowflake-ordinals cases)."""
    res = get_column_lineage(_USING_QUERY, schema=_SCHEMA)
    rows = sorted(
        {
            ("col:" + c["name"], u["table"], u["column"])
            for c in res["columns"]
            for u in c["upstream"]
        }
        | {
            ("ns:" + c["name"], u["table"], u["column"])
            for c in res["non_selected_columns"]
            for u in c["upstream"]
        }
    )
    return spark.createDataFrame(
        rows, "edge string, src_table string, src_column string"
    )


LINEAGE_USING_ORACLE = """
SELECT * FROM (VALUES
  ('col:n_regionkey', 'nation', 'n_regionkey'),
  ('col:top_acctbal', 'supplier', 's_acctbal'),
  ('ns:n_nationkey', 'nation', 'n_nationkey'),
  ('ns:n_regionkey', 'nation', 'n_regionkey'),
  ('ns:s_nationkey', 'supplier', 's_nationkey')
) AS t(edge, src_table, src_column)
"""


# -- extract_select (ref pkg/sqlparser/parser.go:423-435) ------------------

# a materialization: none asset body: full DDL wrapping a WITH + SELECT.
# `query --asset` / unit tests must run ONLY the inner SELECT.
_DDL_ASSET = """
CREATE OR REPLACE VIEW analytics.order_priority AS
WITH big AS (
  SELECT o_custkey, o_orderpriority, o_totalprice
  FROM orders
  WHERE o_totalprice > 150000
)
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS total_price,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM big
GROUP BY o_orderpriority
"""


def parser_extract_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the extract_select rewrite END-TO-END: the DDL-wrapped
    asset is reduced to its inner SELECT and that SQL is EXECUTED — a
    rewrite bug (CREATE leaking through, WITH clause dropped, span
    mis-sliced) is a hard failure or a value mismatch, not a silent
    pass.  The oracle runs the SAME extracted SQL on DuckDB, so the
    output's engine-portability is part of the contract."""
    from bruin_spark.parser import extract_select
    from bruin_spark.session import load_tables

    load_tables(spark, sf_dir, ["orders"])
    sql = extract_select(_DDL_ASSET)
    df = spark.sql(sql)
    return df.select(
        "priority",
        df.n_orders.cast("long").alias("n_orders"),
        "total_price",
        df.n_customers.cast("long").alias("n_customers"),
    )


def _extract_select_oracle() -> str:
    from bruin_spark.parser import extract_select

    sql = extract_select(_DDL_ASSET)
    return (
        "SELECT priority, n_orders::BIGINT AS n_orders, total_price, "
        f"n_customers::BIGINT AS n_customers FROM ({sql}) q"
    )


QUERIES = {
    "lineage_orders_enriched": (lineage_orders_enriched, LINEAGE_ORACLE),
    "lineage_using_ordinals": (lineage_using_ordinals, LINEAGE_USING_ORACLE),
    "parser_extract_select": (parser_extract_select, _extract_select_oracle()),
}
