"""Golden-SQL tests for the semantic compiler (no Spark session).

Mirrors the reference's table-driven generated-SQL assertions
(semantic-engine/engine_test.go); shapes per engine.go:251-283, 426-493,
526-566, 605-633, 662-748, 790-849.
"""

import pytest

from bruin_spark.semantic import (
    Dimension,
    DimensionRef,
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
from bruin_spark.semantic.engine import SemanticError


def make_engine():
    orders = Model(
        name="orders",
        table="sales.orders",
        primary_key="id",
        joins=[Join(name="customers", foreign_key="customer_id")],
        dimensions=[
            Dimension(name="status"),
            Dimension(
                name="created",
                type="time",
                expression="created_at",
                granularities={"day": "CAST(created_at AS DATE)"},
            ),
        ],
        metrics=[
            Metric(name="n", expression="COUNT(*)"),
            Metric(name="revenue", expression="SUM(amount)"),
            Metric(name="big_revenue", expression="SUM(amount)", filter="amount > 100"),
            Metric(name="distinct_cust", expression="COUNT(DISTINCT customer_id)", filter="amount > 0"),
            Metric(name="aov", expression="{revenue} / {n}"),
            Metric(
                name="run",
                expression="{revenue}",
                window=WindowSpec(type="running_total", order_by="created_day"),
            ),
        ],
        segments=[Segment(name="done", filter="status = 'done'")],
    )
    customers = Model(
        name="customers",
        table="crm.customers",
        primary_key="id",
        dimensions=[Dimension(name="country")],
    )
    return SemanticEngine(orders, [customers])


def test_simple_group():
    sql = make_engine().generate_sql(Query(dimensions=["status"], metrics=["n", "revenue"]))
    assert sql == (
        "SELECT status AS status, COUNT(*) AS n, SUM(amount) AS revenue"
        " FROM sales.orders AS orders GROUP BY 1"
    )


def test_derived_metric_nullif_divisor():
    sql = make_engine().generate_sql(Query(metrics=["aov"]))
    assert "SUM(amount) / NULLIF((COUNT(*)), 0) AS aov" in sql


def test_metric_filter_case_when():
    sql = make_engine().generate_sql(Query(metrics=["big_revenue"]))
    assert "SUM(CASE WHEN amount > 100 THEN amount ELSE NULL END)" in sql


def test_metric_filter_distinct():
    sql = make_engine().generate_sql(Query(metrics=["distinct_cust"]))
    assert "COUNT(DISTINCT CASE WHEN amount > 0 THEN customer_id ELSE NULL END)" in sql


def test_structured_filters():
    e = make_engine()
    q = Query(
        dimensions=["status"],
        metrics=["n"],
        filters=[
            Filter(dimension="status", operator="in", value=["a", "b"]),
            Filter(dimension="created", operator="between", value=["2024-01-01", "2024-02-01"]),
        ],
    )
    sql = e.generate_sql(q)
    assert "WHERE status IN ('a', 'b') AND created_at BETWEEN '2024-01-01' AND '2024-02-01'" in sql


def test_metric_filter_goes_to_having():
    sql = make_engine().generate_sql(
        Query(dimensions=["status"], metrics=["n"], filters=[Filter(expression="{revenue} > 10")])
    )
    assert "HAVING SUM(amount) > 10" in sql


def test_segment_where_and_having():
    e = make_engine()
    sql = e.generate_sql(Query(dimensions=["status"], metrics=["n"], segments=["done"]))
    assert "WHERE status = 'done'" in sql


def test_join_qualifies_and_sanitizes():
    sql = make_engine().generate_sql(
        Query(dimensions=["customers.country"], metrics=["n"])
    )
    assert "LEFT JOIN crm.customers AS customers ON orders.customer_id = customers.id" in sql
    assert "customers.country AS customers_country" in sql


def test_granularity():
    sql = make_engine().generate_sql(
        Query(dimensions=[DimensionRef("created", granularity="day")], metrics=["n"])
    )
    assert "CAST(created_at AS DATE) AS created" in sql  # same-model grain aliases by dim name (graph.go:278-295)


def test_granularity_on_non_time_rejected():
    with pytest.raises(SemanticError):
        make_engine().generate_sql(
            Query(dimensions=[DimensionRef("status", granularity="day")], metrics=["n"])
        )


def test_window_wraps_two_level():
    sql = make_engine().generate_sql(
        Query(dimensions=[DimensionRef("created", granularity="day")], metrics=["revenue", "run"])
    )
    assert sql.startswith("SELECT base.created, base.revenue AS revenue, SUM(base.revenue) OVER (")
    assert "FROM (SELECT CAST(created_at AS DATE) AS created, SUM(amount) AS revenue" in sql
    assert "ROWS UNBOUNDED PRECEDING) AS run" in sql


def test_sort_limit():
    sql = make_engine().generate_sql(
        Query(dimensions=["status"], metrics=["n"], sort=[SortSpec("n", "desc")], limit=5)
    )
    assert sql.endswith("ORDER BY n DESC LIMIT 5")


def test_unknown_metric_rejected():
    with pytest.raises(SemanticError):
        make_engine().generate_sql(Query(metrics=["nope"]))


def test_empty_query_rejected():
    with pytest.raises(SemanticError):
        make_engine().generate_sql(Query())


def test_segment_over_joined_model_emits_join():
    """A segment referencing a joined relation must pull in the JOIN."""
    from bruin_spark.semantic.engine import SemanticEngine
    from bruin_spark.semantic.model import (
        Dimension, Join, Metric, Model, Query, Segment,
    )

    customers = Model(
        name="customers", table="db.customers", primary_key="c_id",
        dimensions=[Dimension(name="region", type="string")],
    )
    orders = Model(
        name="orders", table="db.orders", primary_key="o_id",
        dimensions=[Dimension(name="status", type="string")],
        metrics=[Metric(name="revenue", expression="SUM(amount)")],
        joins=[Join(name="customers", relationship="many_to_one", foreign_key="customer_id")],
        segments=[Segment(name="emea", filter="{customers.region} = 'EMEA'")],
    )
    eng = SemanticEngine(orders, others=[customers])
    sql = eng.generate_sql(Query(dimensions=["status"], metrics=["revenue"], segments=["emea"]))
    assert "LEFT JOIN db.customers AS customers" in sql
    assert "customers.region = 'EMEA'" in sql


def test_sort_requires_selected_metric():
    import pytest

    from bruin_spark.semantic.engine import SemanticEngine, SemanticError
    from bruin_spark.semantic.model import Dimension, Metric, Model, Query, SortSpec

    m = Model(
        name="orders", table="db.orders", primary_key="o_id",
        dimensions=[Dimension(name="status", type="string")],
        metrics=[Metric(name="revenue", expression="SUM(amount)"),
                 Metric(name="qty", expression="SUM(quantity)")],
    )
    eng = SemanticEngine(m)
    with pytest.raises(SemanticError, match="sort field not found"):
        eng.generate_sql(
            Query(dimensions=["status"], metrics=["revenue"], sort=[SortSpec("qty")])
        )
