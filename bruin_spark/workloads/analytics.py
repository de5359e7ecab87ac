"""Analytical queries over the TPC-H-ish star schema.

These exercise the engine's SQL execution surface (joins, aggregations,
windows, rollup, pivot, series generation — the operations bruin assets
contain and the warehouse, i.e. Catalyst, executes).

Scale notes baked into each plan:
- dimension tables (region/nation/supplier/part/customer) are broadcast;
  no shuffle of the fact side for those joins
- aggregates are expressed on decimals for cross-engine exactness
- every query is a single declarative plan: filter/column pruning reach
  the parquet scan (verified via .explain in tests/bench)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import broadcast

from bruin_spark.session import load_tables


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    import os

    from bruin_spark.session import read_parquet

    return read_parquet(spark, os.path.join(sf_dir, f"{name}.parquet"))


def _dec(c, scale=2):
    return F.col(c).cast(f"decimal(18,{scale})")


# -- q1: pricing summary (TPC-H Q1 shape) -----------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # sums are exact decimals (order-independent); the final cast to
            # double is deterministic and matches what DuckDB hands pandas
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
                .cast("decimal(18,4)")
            ).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# -- q3: revenue by order over segment (TPC-H Q3 shape, full result) ---------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1997-06-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1997-06-15")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
                .cast("decimal(18,4)")
            ).cast("double").alias("revenue")
        )
    )


Q3_ORACLE = """
SELECT l_orderkey,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1997-06-15 00:00:00'
GROUP BY l_orderkey
"""


# -- q5: local supplier volume (multi-join through region) -------------------


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
                .cast("decimal(18,4)")
            ).cast("double").alias("revenue")
        )
    )


Q5_ORACLE = """
SELECT n_name,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY n_name
"""


# -- window functions: rank customers inside each nation ---------------------


def q_window_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.withColumn("bal_rank", F.row_number().over(w))
        .filter(F.col("bal_rank") <= 3)
        .select("c_nationkey", "c_custkey", F.col("c_acctbal").alias("acctbal"), "bal_rank")
    )


Q_WINDOW_ORACLE = """
SELECT c_nationkey, c_custkey, c_acctbal AS acctbal, bal_rank
FROM (
  SELECT c_nationkey, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS bal_rank
  FROM customer
)
WHERE bal_rank <= 3
"""


# -- rollup: multi-level totals ----------------------------------------------


def q_rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("order_year"),
            F.col("o_orderstatus").alias("status"),
            _dec("o_totalprice").alias("price"),
        )
        .rollup("order_year", "status")
        .agg(
            F.sum("price").cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


Q_ROLLUP_ORACLE = """
SELECT EXTRACT(year FROM o_orderdate)::INT AS order_year, o_orderstatus AS status,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price, COUNT(*) AS n_orders
FROM orders
GROUP BY ROLLUP (order_year, status)
"""


# -- pivot --------------------------------------------------------------------


def q_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


Q_PIVOT_ORACLE = """
SELECT o_orderpriority,
       COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END), 0)::BIGINT AS "F",
       COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END), 0)::BIGINT AS "O",
       COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END), 0)::BIGINT AS "P"
FROM orders
GROUP BY o_orderpriority
"""


# -- events: sessionized behavioral metrics (lag / time deltas) ---------------


def q_events_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "gap_minutes",
            F.when(
                F.col("prev_ts").isNotNull(),
                (
                    (
                        F.unix_micros(F.col("ts").cast("timestamp"))
                        - F.unix_micros(F.col("prev_ts").cast("timestamp"))
                    )
                    / F.lit(60_000_000.0)
                ).cast("decimal(18,2)"),
            ),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_errors"),
            F.max("gap_minutes").cast("double").alias("max_gap_minutes"),
        )
    )


Q_EVENTS_ORACLE = """
SELECT user_id, COUNT(*) AS n_events,
       SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_errors,
       CAST(MAX(gap_minutes) AS DOUBLE) AS max_gap_minutes
FROM (
  SELECT user_id, event_type,
         CAST(EXTRACT(epoch FROM ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) / 60.0 AS DECIMAL(18,2)) AS gap_minutes
  FROM events
)
GROUP BY user_id
"""


# -- date spine: zero-filled daily order counts (sequence + explode) ----------


def q_date_spine_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # dogfood the date_spine builtin (the reference's SparkDateSpine
    # emission, end-exclusive): same day set as the old inclusive
    # sequence to 03-31
    from bruin_spark.render.builtins import date_spine

    spine = spark.sql(
        f"SELECT date_day AS d FROM ({date_spine('day', chr(39) + '1997-01-01' + chr(39), chr(39) + '1997-04-01' + chr(39))})"
    )
    daily = (
        orders.filter(F.col("o_orderdate").between("1997-01-01", "1997-03-31"))
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        spine.join(daily, "d", "left")
        .select(F.col("d").alias("order_day"), F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"))
    )


Q_SPINE_ORACLE = """
SELECT d AS order_day, COALESCE(n, 0) AS n_orders
FROM (SELECT UNNEST(generate_series(DATE '1997-01-01', DATE '1997-03-31', INTERVAL 1 DAY))::DATE AS d)
LEFT JOIN (
  SELECT o_orderdate::DATE AS od, COUNT(*) AS n
  FROM orders
  WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-03-31 00:00:00'
  GROUP BY 1
) ON d = od
"""


# -- surrogate key builtin: cross-engine md5 stability ------------------------


def q_surrogate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_tables(spark, sf_dir, ["nation"])
    # uses the Jinja builtin's exact expansion (Spark dialect)
    from bruin_spark.render.builtins import generate_surrogate_key

    expr = generate_surrogate_key("n_nationkey", "n_name")
    return spark.sql(f"SELECT n_nationkey, {expr} AS surrogate_key FROM nation")


Q_SURROGATE_ORACLE = """
SELECT n_nationkey,
       MD5(CONCAT(COALESCE(CAST(n_nationkey AS STRING), '_bruin_surrogate_key_null_'),
                  '-',
                  COALESCE(CAST(n_name AS STRING), '_bruin_surrogate_key_null_'))) AS surrogate_key
FROM nation
"""


QUERIES = {
    "q1_pricing_summary": (q1_pricing_summary, Q1_ORACLE),
    "q3_shipping_priority": (q3_shipping_priority, Q3_ORACLE),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_ORACLE),
    "q_window_top_customers": (q_window_top_customers, Q_WINDOW_ORACLE),
    "q_rollup_sales": (q_rollup_sales, Q_ROLLUP_ORACLE),
    "q_pivot_status_by_priority": (q_pivot_status_by_priority, Q_PIVOT_ORACLE),
    "q_events_user_activity": (q_events_user_activity, Q_EVENTS_ORACLE),
    "q_date_spine_orders": (q_date_spine_orders, Q_SPINE_ORACLE),
    "q_surrogate_keys": (q_surrogate_keys, Q_SURROGATE_ORACLE),
}


# -- q4: orders with late-shipped items (TPC-H Q4 shape, EXISTS semi-join) ----


def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-10-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    # semi join: order has at least one item shipped > 60 days after order
    joined = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
"""


# -- q6: forecast revenue change (TPC-H Q6 — scan-only with full pushdown) ----


def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (_dec("l_extendedprice") * _dec("l_discount")).cast("decimal(18,4)")
            ).cast("double").alias("revenue")
        )
    )


Q6_ORACLE = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.02 AND l_discount <= 0.09
  AND l_quantity < 24
"""


# -- q7: volume between nation pairs (TPC-H Q7 shape) -------------------------


def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    n1 = broadcast(nation.select(F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")))
    n2 = broadcast(nation.select(F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(n1, supp.s_nationkey == F.col("snk"))
        .join(n2, cust.c_nationkey == F.col("cnk"))
        .filter(F.col("supp_nation") < F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
                .cast("decimal(18,4)")
            ).cast("double").alias("revenue")
        )
    )


Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(year FROM l_shipdate)::BIGINT AS l_year,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE n1.n_name < n2.n_name
GROUP BY 1, 2, 3
"""


# -- q10: returned-item revenue by customer (TPC-H Q10 shape) -----------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
                .cast("decimal(18,4)")
            ).cast("double").alias("revenue")
        )
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
GROUP BY 1, 2, 3, 4
"""


# -- q14: promo revenue share (TPC-H Q14 shape) -------------------------------


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    part = _t(spark, sf_dir, "part")
    disc = (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(F.lit(0).cast("decimal(18,4)")))
                / F.sum(disc),
                6,
            ).alias("promo_share_pct")
        )
    )


Q14_ORACLE = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%'
             THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
             ELSE CAST(0 AS DECIMAL(18,4)) END)
       / SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))), 6) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
"""


# -- q18: large-volume orders (TPC-H Q18 shape: agg-filter then join back) ----


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_totalprice",
            F.col("total_qty").cast("double").alias("total_qty"),
        )
    )


Q18_ORACLE = """
SELECT c_custkey, c_name, o_orderkey, o_totalprice, CAST(total_qty AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250
) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


QUERIES.update(
    {
        "q4_late_orders": (q4_late_orders, Q4_ORACLE),
        "q6_revenue_forecast": (q6_revenue_forecast, Q6_ORACLE),
        "q7_nation_volume": (q7_nation_volume, Q7_ORACLE),
        "q10_returned_items": (q10_returned_items, Q10_ORACLE),
        "q14_promo_revenue": (q14_promo_revenue, Q14_ORACLE),
        "q18_large_orders": (q18_large_orders, Q18_ORACLE),
    }
)


# -- q15-like: top suppliers by revenue (agg + max-filter join-back) ----------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    supp = _t(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
            .cast("decimal(18,4)")
        ).alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.join(F.broadcast(top), rev.total_revenue == F.col("mx"))
        .join(broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
"""


# -- q16-like: suppliers per part attribute, with anti-join exclusion ---------


def q16_parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .join(broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .select("p_brand", "p_type", "l_suppkey")
        .distinct()
    )
    return pairs.groupBy("p_brand", "p_type").agg(
        F.count_distinct("l_suppkey").alias("supplier_cnt")
    )


Q16_ORACLE = """
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
"""


# -- q22-like: wealthy customers with no urgent orders (anti-join + subquery) --


def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    wealthy = cust.join(F.broadcast(avg_bal), cust.c_acctbal > F.col("ab"))
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    inactive = wealthy.join(
        urgent.select("o_custkey").distinct(),
        wealthy.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return inactive.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
    )


Q22_ORACLE = """
SELECT c_nationkey, COUNT(*) AS numcust, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND c_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""


QUERIES.update(
    {
        "q15_top_supplier": (q15_top_supplier, Q15_ORACLE),
        "q16_parts_supplier_counts": (q16_parts_supplier_counts, Q16_ORACLE),
        "q22_inactive_customers": (q22_inactive_customers, Q22_ORACLE),
    }
)


# ---------------------------------------------------------------------------
# Remaining TPC-H plan shapes (adapted to the driver schema: no partsupp,
# no shipmode/commitdate/receiptdate/container columns).  Reference parity:
# bruin executes these shapes verbatim in the target warehouse
# (/root/reference/pkg/query/query.go renders + ships asset SQL); here
# Catalyst IS the warehouse, so each shape below is a distinct optimizer
# path worth pinning: correlated min join-back (q2), conditional-ratio agg
# (q8), multi-dim profit agg (q9), late-line priority counts (q12),
# left-join count distribution (q13), correlated-avg filter (q17),
# disjunctive pushdown (q19), having-semi-join (q20), only-late-supplier
# (q21, re-expressed as a single groupBy instead of EXISTS/NOT EXISTS
# self-joins — one shuffle instead of three at 100 TB).
# ---------------------------------------------------------------------------


def q2_min_acctbal_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per small part: supplier(s) with the minimum account balance among
    suppliers that actually shipped it (TPC-H Q2's correlated-min join-back,
    with lineitem standing in for partsupp).

    Scale: distinct (part, supp) pairs first (map-side combine collapses the
    fact table), dims broadcast, then the per-part min as a WINDOW over the
    small pair set — one shuffle on p_partkey and a single lineitem scan,
    instead of an agg + join-back that re-evaluates the distinct twice.
    """
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    supp = _t(spark, sf_dir, "supplier")
    ps = (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .join(broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
    )
    w = Window.partitionBy("p_partkey")
    return (
        ps.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
    )


Q2_ORACLE = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
ps AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
  FROM pairs
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE p_size < 10
)
SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal
FROM ps p
WHERE s_acctbal = (SELECT MIN(s_acctbal) FROM ps x WHERE x.p_partkey = p.p_partkey)
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_7's share of ASIA-customer revenue per order year (TPC-H Q8:
    conditional-sum ratio).  Sums are decimal (order-independent); the final
    ratio is double division rounded to 6 — identical on both engines."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_asia = (
        cust.join(
            broadcast(nation.join(broadcast(region), nation.n_regionkey == region.r_regionkey)),
            cust.c_nationkey == nation.n_nationkey,
        ).select("c_custkey")
    )
    supp_n = supp.join(
        broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        supp.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    vol = (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).cast(
        "decimal(18,4)"
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust_asia), orders.o_custkey == cust_asia.c_custkey)
        .join(broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(F.lit(0).cast("decimal(18,4)"))).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


Q8_ORACLE = """
SELECT YEAR(o_orderdate) AS o_year,
       ROUND(CAST(SUM(CASE WHEN n2.n_name = 'NATION_7'
                 THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
GROUP BY YEAR(o_orderdate)
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on '%red%' parts by supplier nation and order year (TPC-H Q9;
    p_retailprice stands in for ps_supplycost).  Revenue and cost are summed
    as separate exact decimals, subtracted once at the end."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    supp_n = supp.join(
        broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation"))),
        supp.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "nation")
    rev = (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))).cast(
        "decimal(18,4)"
    )
    cost = (F.col("p_retailprice").cast("decimal(18,2)") * _dec("l_quantity")).cast("decimal(18,4)")
    joined = (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .join(broadcast(supp_n), li.l_suppkey == supp_n.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .select("nation", F.year("o_orderdate").alias("o_year"), rev.alias("rev"), cost.alias("cost"))
    )
    return joined.groupBy("nation", "o_year").agg(
        (F.sum("rev") - F.sum("cost")).cast("decimal(18,4)").cast("double").alias("sum_profit")
    )


Q9_ORACLE = """
SELECT nation, o_year,
       CAST(CAST(SUM(rev) - SUM(cost) AS DECIMAL(18,4)) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) AS rev,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4)) AS cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


def q12_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-shipped line counts split by order priority class, per return
    flag (TPC-H Q12 with l_returnflag standing in for l_shipmode)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return late.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
    )


Q12_ORACLE = """
SELECT l_returnflag,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
"""


def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of per-customer order counts (TPC-H Q13: left join with a
    join-condition filter, then a two-level aggregate)."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


Q13_ORACLE = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average yearly revenue lost to small orders of Brand#23 parts (TPC-H
    Q17: correlated AVG subquery, re-expressed as a per-part aggregate joined
    back — one shuffle on l_partkey instead of a correlated rescan)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    brand_li = li.join(broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_q = brand_li.groupBy(F.col("l_partkey").alias("ak")).agg(
        F.avg(_dec("l_quantity")).alias("avg_qty")
    )
    small = brand_li.join(broadcast(avg_q), brand_li.l_partkey == F.col("ak")).filter(
        _dec("l_quantity") < F.lit(0.5).cast("decimal(18,2)") * F.col("avg_qty")
    )
    return small.agg(
        F.round(F.sum(_dec("l_extendedprice")).cast("double") / 7.0, 2).alias("avg_yearly")
    )


Q17_ORACLE = """
WITH brand_li AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
)
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
FROM brand_li b
WHERE CAST(l_quantity AS DECIMAL(18,2)) < CAST(0.5 AS DECIMAL(18,2)) * (
  SELECT AVG(CAST(l_quantity AS DECIMAL(18,2))) FROM brand_li x WHERE x.l_partkey = b.l_partkey
)
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under three disjoint brand/size/quantity bands (TPC-H Q19:
    disjunctive predicate spanning both join sides — Catalyst extracts the
    common p_partkey equi-join and keeps the OR as a post-join filter on the
    broadcast side)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(broadcast(part), li.l_partkey == part.p_partkey)
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(band).agg(
        F.sum(
            (_dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount")))
            .cast("decimal(18,4)")
        ).cast("double").alias("revenue")
    )


Q19_ORACLE = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


def q20_heavy_red_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that shipped more than 100 units of '%red%' parts (TPC-H
    Q20's nested-IN shape: HAVING aggregate feeding a semi-join)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%")).select("p_partkey")
    supp = _t(spark, sf_dir, "supplier")
    heavy = (
        li.join(broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("tot_qty"))
        .filter(F.col("tot_qty") > F.lit(100).cast("decimal(18,2)"))
        .select("l_suppkey")
    )
    return (
        supp.join(broadcast(heavy), supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


Q20_ORACLE = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%red%'
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 100
)
"""


def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that were the sole late shipper on a finished multi-supplier
    order (TPC-H Q21).  The classic EXISTS / NOT EXISTS double self-join is
    re-expressed as ONE groupBy(l_orderkey) computing supplier and late-
    supplier distinct counts — a single shuffle of lineitem instead of three
    at 100 TB.  When exactly one supplier is late, MAX(late supplier key)
    identifies it."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    supp = _t(spark, sf_dir, "supplier")
    is_late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.count_distinct("l_suppkey").alias("n_supp"),
            F.count_distinct(F.when(is_late, F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(is_late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    return (
        per_order.join(broadcast(supp), per_order.late_supp == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


Q21_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN l_suppkey END) AS n_late,
         MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY THEN l_suppkey END) AS late_supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey
)
SELECT s_name, COUNT(*) AS numwait
FROM per_order JOIN supplier ON late_supp = s_suppkey
WHERE n_supp > 1 AND n_late = 1
GROUP BY s_name
"""


QUERIES.update(
    {
        "q2_min_acctbal_supplier": (q2_min_acctbal_supplier, Q2_ORACLE),
        "q8_market_share": (q8_market_share, Q8_ORACLE),
        "q9_product_profit": (q9_product_profit, Q9_ORACLE),
        "q12_late_priority_lines": (q12_late_priority_lines, Q12_ORACLE),
        "q13_customer_order_distribution": (q13_customer_order_distribution, Q13_ORACLE),
        "q17_small_quantity_revenue": (q17_small_quantity_revenue, Q17_ORACLE),
        "q19_disjunctive_revenue": (q19_disjunctive_revenue, Q19_ORACLE),
        "q20_heavy_red_suppliers": (q20_heavy_red_suppliers, Q20_ORACLE),
        "q21_waiting_supplier": (q21_waiting_supplier, Q21_ORACLE),
    }
)


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose shipped value exceeds a fixed fraction of the global
    shipped value (TPC-H Q11: grouped HAVING against a scalar subquery of
    the same aggregate).  Spark evaluates the global sum once (tiny single-
    row broadcast), not per-group."""
    li = _t(spark, sf_dir, "lineitem")
    val = (_dec("l_extendedprice") * _dec("l_quantity")).cast("decimal(18,4)")
    per_part = li.select(F.col("l_partkey"), val.alias("v")).groupBy("l_partkey").agg(
        F.sum("v").alias("part_value")
    )
    # scale-free threshold: 1.3x the average per-part value, computed as
    # exact decimal sum -> one double division (deterministic on both engines)
    total = per_part.agg(
        (F.sum("part_value").cast("double") * F.lit(1.3) / F.count(F.lit(1))).alias("thresh")
    )
    return (
        per_part.join(F.broadcast(total), per_part.part_value.cast("double") > F.col("thresh"))
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
    )


Q11_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS part_value
  FROM lineitem
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(part_value AS DOUBLE) > (SELECT CAST(SUM(part_value) AS DOUBLE) * 1.3 / COUNT(*) FROM per_part)
"""


QUERIES.update({"q11_important_parts": (q11_important_parts, Q11_ORACLE)})
