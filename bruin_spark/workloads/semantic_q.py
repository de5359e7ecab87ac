"""Semantic-layer workloads: metrics/dimensions compiled to SQL.

The oracle story is structural: the semantic engine emits dialect-neutral
ANSI SQL, so the DuckDB oracle IS the same generated string — one
compiler, two engines, value-identical results. This exercises dimension
granularities, derived + filtered metrics, window metrics (wrapped
two-level form), segments, structured filters, joins, sort and limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bruin_spark.semantic import (
    Dimension,
    Filter,
    Join,
    Metric,
    Model,
    Query,
    Segment,
    SemanticEngine,
    SortSpec,
    WindowSpec,
)
from bruin_spark.session import load_tables

ORDERS_MODEL = Model(
    name="orders",
    table="orders",
    primary_key="o_orderkey",
    joins=[
        Join(
            name="customers",
            model="customers",
            relationship="many_to_one",
            foreign_key="o_custkey",
        )
    ],
    dimensions=[
        Dimension(name="o_orderstatus", type="string"),
        Dimension(name="o_orderpriority", type="string"),
        Dimension(
            name="order_date",
            type="time",
            expression="o_orderdate",
            granularities={
                # CAST to DATE: Spark's DATE_TRUNC returns timestamp,
                # DuckDB's returns date — pin a common output type
                "month": "CAST(DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS DATE)",
                "year": "CAST(DATE_TRUNC('year', CAST(o_orderdate AS DATE)) AS DATE)",
            },
        ),
    ],
    metrics=[
        Metric(name="order_count", expression="COUNT(*)"),
        # ROUND on money sums: parallel partial-sum order differs between
        # engines, so raw double SUMs diverge in the last ulp at ~1e9
        Metric(name="revenue", expression="ROUND(SUM(o_totalprice), 2)"),
        Metric(
            name="urgent_revenue",
            expression="ROUND(SUM(o_totalprice), 2)",
            filter="o_orderpriority = '1-URGENT'",
        ),
        Metric(name="avg_order_value", expression="{revenue} / {order_count}"),
        Metric(
            name="running_revenue",
            expression="{revenue}",
            window=WindowSpec(type="running_total", order_by="order_date"),
        ),
        Metric(
            name="revenue_rank",
            expression="{revenue}",
            window=WindowSpec(type="rank", order_by="revenue DESC"),
        ),
        Metric(
            name="prev_month_revenue",
            expression="{revenue}",
            window=WindowSpec(type="lag", order_by="order_date", offset=1),
        ),
        Metric(
            name="revenue_share",
            expression="{revenue}",
            window=WindowSpec(type="percent_of_total"),
        ),
    ],
    segments=[
        Segment(name="open_orders", filter="o_orderstatus = 'O'"),
        Segment(name="big_orders", filter="{revenue} > 1000000"),
    ],
)

CUSTOMERS_MODEL = Model(
    name="customers",
    table="customer",
    primary_key="c_custkey",
    dimensions=[
        Dimension(name="c_mktsegment", type="string"),
        Dimension(name="c_nationkey", type="number"),
    ],
)


def _engine() -> SemanticEngine:
    return SemanticEngine(ORDERS_MODEL, [CUSTOMERS_MODEL])


# windowed SUMs associate differently across engines (DuckDB uses a
# segment tree); round those outputs identically on BOTH sides by
# wrapping the generated SQL — workload-level concern, not an engine one
_ROUND_COLS = {"running_revenue": 2, "prev_month_revenue": 2, "revenue_share": 6}


def _compile(q: Query) -> str:
    sql, cols = _engine().generate_sql_with_columns(q)
    if not any(name in _ROUND_COLS for name, _f in cols):
        return sql
    sel = ", ".join(
        f"ROUND({name}, {_ROUND_COLS[name]}) AS {name}" if name in _ROUND_COLS else name
        for name, _f in cols
    )
    return f"SELECT {sel} FROM ({sql}) AS w"


def _run(spark: SparkSession, sf_dir: str, q: Query) -> DataFrame:
    load_tables(spark, sf_dir, ["orders", "customer"])
    return spark.sql(_compile(q))


# -- queries (each returns both the Spark DF and carries its oracle SQL) -------


def _q_revenue_by_status() -> Query:
    return Query(
        dimensions=["o_orderstatus"],
        metrics=["order_count", "revenue", "avg_order_value"],
        sort=[SortSpec("o_orderstatus")],
    )


def _q_monthly_window() -> Query:
    from bruin_spark.semantic import DimensionRef

    return Query(
        dimensions=[DimensionRef("order_date", granularity="month")],
        metrics=["revenue", "running_revenue", "prev_month_revenue", "revenue_share"],
        sort=[SortSpec("order_date")],
    )


def _q_filtered_segmented() -> Query:
    return Query(
        dimensions=["o_orderpriority"],
        metrics=["revenue", "urgent_revenue"],
        filters=[Filter(dimension="o_orderstatus", operator="in", value=["O", "F"])],
        segments=["open_orders"],
        sort=[SortSpec("revenue", "desc")],
        limit=3,
    )


def _q_joined_segment() -> Query:
    return Query(
        dimensions=["customers.c_mktsegment"],
        metrics=["order_count", "revenue"],
        filters=[
            Filter(dimension="o_orderstatus", operator="not_equals", value="P"),
            Filter(expression="{revenue} > 0"),
        ],
        sort=[SortSpec("customers.c_mktsegment")],
    )


def _q_rank_wrapped() -> Query:
    return Query(
        dimensions=["o_orderpriority"],
        metrics=["revenue", "revenue_rank"],
        sort=[SortSpec("o_orderpriority")],
    )


def _mk(qf):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _run(spark, sf_dir, qf())

    return run


def _oracle(qf) -> str:
    return _compile(qf())


QUERIES = {
    "sem_revenue_by_status": (_mk(_q_revenue_by_status), _oracle(_q_revenue_by_status)),
    "sem_monthly_window": (_mk(_q_monthly_window), _oracle(_q_monthly_window)),
    "sem_filtered_segmented": (_mk(_q_filtered_segmented), _oracle(_q_filtered_segmented)),
    "sem_joined_segment": (_mk(_q_joined_segment), _oracle(_q_joined_segment)),
    "sem_rank_wrapped": (_mk(_q_rank_wrapped), _oracle(_q_rank_wrapped)),
}
