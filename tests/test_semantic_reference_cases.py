"""Run the reference semantic engine's OWN generated-SQL test table
(semantic-engine/engine_test.go TestGenerateSQL_Cases) against this
repo's compiler.

The sqlCase literals are harvested at test time from the read-only
reference checkout with a constrained Go-composite-literal parser (no
code copied — the cases are compatibility DATA: query shape in,
must/mustNot substrings out). The fixture model is a transcription of
richTestModel() (engine_test.go:37-108)."""

from __future__ import annotations

import os
import re

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

REF = "/root/reference/semantic-engine/engine_test.go"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference checkout not present"
)


def rich_model() -> Model:
    """Transcription of richTestModel() (engine_test.go:37-108)."""
    return Model(
        name="orders",
        table="analytics.fct_orders",
        dimensions=[
            Dimension(name="order_id", type="string", hidden=True),
            Dimension(name="status", type="string"),
            Dimension(name="country", type="string"),
            Dimension(name="category", type="string"),
            Dimension(
                name="order_date",
                type="time",
                granularities={
                    "day": "date_trunc('day', order_date)",
                    "month": "date_trunc('month', order_date)",
                    "year": "date_trunc('year', order_date)",
                },
            ),
            Dimension(name="is_first_order", type="boolean", expression="customer_order_number = 1"),
            Dimension(
                name="order_size",
                type="string",
                expression="case when amount >= 100 then 'large' else 'small' end",
            ),
        ],
        metrics=[
            Metric(name="revenue", expression="sum(amount)"),
            Metric(name="cost", expression="sum(cogs)"),
            Metric(name="order_count", expression="count(distinct order_id)"),
            Metric(name="row_count", expression="count(*)"),
            Metric(name="completed_revenue", expression="sum(amount)", filter="status = 'completed'"),
            Metric(name="completed_count", expression="count(*)", filter="status = 'completed'"),
            Metric(
                name="completed_distinct_orders",
                expression="count(distinct order_id)",
                filter="status = 'completed'",
            ),
            Metric(name="profit", expression="{revenue} - {cost}"),
            Metric(name="avg_order_value", expression="{revenue} / {order_count}"),
            Metric(name="profit_margin", expression="{profit} / {revenue}"),
            Metric(name="completion_rate", expression="{completed_revenue} / {revenue}"),
            Metric(name="raw_aov", expression="sum(amount) / {order_count}"),
            Metric(
                name="running_revenue",
                expression="{revenue}",
                window=WindowSpec(type="running_total", order_by="order_date", partition_by=["category"]),
            ),
            Metric(
                name="prev_revenue",
                expression="{revenue}",
                window=WindowSpec(type="lag", order_by="order_date", partition_by=["category"], offset=1),
            ),
            Metric(
                name="next_revenue",
                expression="{revenue}",
                window=WindowSpec(type="lead", order_by="order_date", offset=2),
            ),
            Metric(
                name="revenue_rank",
                expression="{revenue}",
                window=WindowSpec(type="rank", order_by="order_date"),
            ),
            Metric(
                name="revenue_share",
                expression="{revenue}",
                window=WindowSpec(type="percent_of_total"),
            ),
            Metric(name="revenue_growth", expression="({revenue} - {prev_revenue}) / {prev_revenue}"),
        ],
        segments=[
            Segment(name="completed", filter="status = 'completed'"),
            Segment(name="high_value", filter="amount > 100"),
            Segment(name="us", filter="country = 'US'"),
        ],
    )


# -- constrained Go composite-literal parser -----------------------------------

_GO_TOKEN = re.compile(
    r"""
    (?P<str>(?:"(?:[^"\\]|\\.)*")|(?:`[^`]*`))
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<num>-?\d+(?:\.\d+)?)
  | (?P<punct>[{}\[\],:&()*])
  | (?P<ws>\s+)
  | (?P<comment>//[^\n]*)
    """,
    re.VERBOSE,
)


def _go_tokens(src: str):
    out = []
    for m in _GO_TOKEN.finditer(src):
        if m.lastgroup in ("ws", "comment"):
            continue
        out.append((m.lastgroup, m.group()))
    return out


class _GoLit:
    """Parses the constrained literal subset used by the sqlCase table:
    struct literals (named or implicit), slice literals, strings,
    numbers, &Type{...} pointers."""

    def __init__(self, toks):
        self.t = toks
        self.i = 0

    def peek(self, off=0):
        j = self.i + off
        return self.t[j] if j < len(self.t) else (None, None)

    def eat(self, text=None):
        k, v = self.t[self.i]
        if text is not None and v != text:
            raise ValueError(f"expected {text!r} got {v!r} at {self.i}")
        self.i += 1
        return v

    def value(self):
        k, v = self.peek()
        if k == "str":
            self.eat()
            if v.startswith("`"):
                return v[1:-1]
            return v[1:-1].encode().decode("unicode_escape")
        if k == "num":
            self.eat()
            return float(v) if "." in v else int(v)
        if v == "&":
            self.eat()
            return self.value()
        if v == "[":
            # []Type{...}
            self.eat("[")
            self.eat("]")
            if self.peek()[0] == "ident":
                self.eat()  # element type name (string/Filter/interface)
                if self.peek()[1] == "{" and self.peek(1)[1] == "}":
                    pass
            if self.peek()[1] == "(":  # interface{} written as interface{}
                raise ValueError("unexpected (")
            return self.composite_body_as_list()
        if k == "ident":
            name = self.eat()
            if name == "interface":  # []interface{} — the {} belongs to the type
                return None  # handled by caller
            if name in ("true", "false"):
                return name == "true"
            if name == "nil":
                return None
            if self.peek()[1] == "{":
                return self.struct_body()
            return name
        raise ValueError(f"unexpected token {self.t[self.i]}")

    def composite_body_as_list(self):
        # optional {} of interface{} type: []interface{}{1, 2}
        if self.peek()[1] == "{" and self.peek(1)[1] == "}":
            self.eat("{")
            self.eat("}")
        out = []
        self.eat("{")
        while self.peek()[1] != "}":
            if self.peek()[1] == "{":  # implicit element struct
                out.append(self.struct_body())
            else:
                out.append(self.value())
            if self.peek()[1] == ",":
                self.eat(",")
        self.eat("}")
        return out

    def struct_body(self):
        self.eat("{")
        d = {}
        while self.peek()[1] != "}":
            key = self.eat()
            self.eat(":")
            d[key] = self.value()
            if self.peek()[1] == ",":
                self.eat(",")
        self.eat("}")
        return d


def _harvest_cases():
    src = open(REF, encoding="utf-8").read()
    start = src.index("cases := []sqlCase{")
    # balanced-brace scan from the opening brace
    i = src.index("{", start)
    depth = 0
    for j in range(i, len(src)):
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                block = src[i : j + 1]
                break
    toks = _go_tokens(block)
    return _GoLit(toks).composite_body_as_list()


def _to_query(q: dict) -> Query:
    dims = [
        DimensionRef(d.get("Name", ""), granularity=d.get("Granularity", ""))
        for d in q.get("Dimensions", [])
    ]
    filters = [
        Filter(
            dimension=f.get("Dimension", ""),
            operator=f.get("Operator", ""),
            value=f.get("Value"),
            expression=f.get("Expression", ""),
        )
        for f in q.get("Filters", [])
    ]
    sort = [
        SortSpec(s.get("Name", ""), direction=s.get("Direction", "") or "asc")
        for s in q.get("Sort", [])
    ]
    return Query(
        dimensions=dims,
        metrics=list(q.get("Metrics", [])),
        filters=filters,
        segments=list(q.get("Segments", [])),
        sort=sort,
        limit=int(q.get("Limit", 0) or 0),
    )


def _params():
    if not os.path.exists(REF):
        return []
    return [
        pytest.param(c, id=re.sub(r"\W+", "_", c["name"])[:60]) for c in _harvest_cases()
    ]


@pytest.mark.parametrize("case", _params())
def test_reference_generate_sql_case(case):
    engine = SemanticEngine(rich_model())
    query = _to_query(case.get("query", {}))
    if "wantErr" in case or case.get("err"):
        with pytest.raises(SemanticError):
            engine.generate_sql(query)
        return
    sql = engine.generate_sql(query)
    for m in case.get("must", []) or []:
        assert m in sql, f"missing {m!r} in:\n{sql}"
    for m in case.get("mustNot", []) or []:
        assert m not in sql, f"forbidden {m!r} in:\n{sql}"


def _harvest_error_cases():
    src = open(REF, encoding="utf-8").read()
    anchor = src.index("TestGenerateSQL_QueryErrors")
    start = src.index("cases := []struct {", anchor)
    start = src.index("}{", start) + 1  # past the anonymous struct type
    i = src.index("{", start)
    depth = 0
    for j in range(i, len(src)):
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                block = src[i : j + 1]
                break
    return _GoLit(_go_tokens(block)).composite_body_as_list()


def _error_params():
    if not os.path.exists(REF):
        return []
    return [
        pytest.param(c, id=re.sub(r"\W+", "_", c["name"])[:60])
        for c in _harvest_error_cases()
    ]


@pytest.mark.parametrize("case", _error_params())
def test_reference_generate_sql_error_case(case):
    engine = SemanticEngine(rich_model())
    query = _to_query(case.get("query", {}))
    with pytest.raises(SemanticError) as exc:
        engine.generate_sql(query)
    assert case["want"] in str(exc.value), str(exc.value)


def _to_model(m: dict) -> Model:
    dims = [
        Dimension(
            name=d.get("Name", ""),
            type=d.get("Type", "string"),
            expression=d.get("Expression", ""),
            granularities=d.get("Granularities", {}) or {},
            hidden=bool(d.get("Hidden", False)),
        )
        for d in m.get("Dimensions", [])
    ]
    mets = []
    for mm in m.get("Metrics", []):
        win = mm.get("Window")
        mets.append(
            Metric(
                name=mm.get("Name", ""),
                expression=mm.get("Expression", ""),
                filter=mm.get("Filter", ""),
                window=WindowSpec(
                    type=win.get("Type", ""),
                    order_by=win.get("OrderBy", ""),
                    partition_by=win.get("PartitionBy", []) or [],
                    offset=int(win.get("Offset", 1) or 1),
                )
                if win
                else None,
            )
        )
    segs = [
        Segment(name=sg.get("Name", ""), filter=sg.get("Filter", ""))
        for sg in m.get("Segments", [])
    ]
    return Model(
        name=m.get("Name", ""),
        table=(m.get("Source") or {}).get("Table", ""),
        dimensions=dims,
        metrics=mets,
        segments=segs,
    )


def _harvest_validation_cases():
    src = open(REF, encoding="utf-8").read()
    anchor = src.index("TestNewEngine_ValidationErrors")
    start = src.index("cases := []struct {", anchor)
    start = src.index("}{", start) + 1
    i = src.index("{", start)
    depth = 0
    for j in range(i, len(src)):
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                block = src[i : j + 1]
                break
    return _GoLit(_go_tokens(block)).composite_body_as_list()


def _validation_params():
    if not os.path.exists(REF):
        return []
    return [
        pytest.param(c, id=re.sub(r"\W+", "_", c["name"])[:60])
        for c in _harvest_validation_cases()
    ]


@pytest.mark.parametrize("case", _validation_params())
def test_reference_model_validation_case(case):
    with pytest.raises(SemanticError) as exc:
        SemanticEngine(_to_model(case.get("model", {})))
    assert case["want"] in str(exc.value), str(exc.value)


def test_focused_regressions_from_reference():
    """engine_test.go focused tests: quote escaping, bool keyword,
    calculated-dimension filters, Jinja delimiters pass-through,
    aggregate-filter rejection in wrapped queries, auto-added inner
    dimensions for window metrics."""
    def mk(dims, mets):
        return SemanticEngine(Model(name="t", table="orders", dimensions=dims, metrics=mets))

    e = mk([Dimension(name="name")], [Metric(name="n", expression="count(*)")])
    sql = e.generate_sql(
        Query(
            metrics=["n"],
            filters=[
                Filter(dimension="name", operator="equals", value="O'Brien"),
                Filter(dimension="name", operator="in", value=["a'b", "c"]),
            ],
        )
    )
    assert "name = 'O''Brien'" in sql and "name IN ('a''b', 'c')" in sql

    e = mk([Dimension(name="active", type="boolean")], [Metric(name="n", expression="count(*)")])
    sql = e.generate_sql(
        Query(metrics=["n"], filters=[Filter(dimension="active", operator="equals", value=True)])
    )
    assert "active = TRUE" in sql

    e = mk(
        [Dimension(name="is_first_order", type="boolean", expression="customer_order_number = 1")],
        [Metric(name="n", expression="count(*)")],
    )
    sql = e.generate_sql(
        Query(metrics=["n"], filters=[Filter(dimension="is_first_order", operator="equals", value=True)])
    )
    assert "WHERE customer_order_number = 1 = TRUE" in sql

    e = mk([Dimension(name="country")], [Metric(name="n", expression="count(*)")])
    sql = e.generate_sql(
        Query(metrics=["n"], filters=[Filter(expression="country = '{{ filters.country }}'")])
    )
    assert "country = '{{ filters.country }}'" in sql

    # aggregate-referencing metric filter rejected in the wrapped path
    m = Model(
        name="m",
        table="t",
        dimensions=[Dimension(name="order_date", type="time")],
        metrics=[
            Metric(name="rev", expression="sum(amount)"),
            Metric(name="weird", expression="sum(amount)", filter="{rev} > 100"),
            Metric(
                name="running_weird",
                expression="{weird}",
                window=WindowSpec(type="running_total", order_by="order_date"),
            ),
        ],
    )
    e = SemanticEngine(m)
    with pytest.raises(SemanticError, match="cannot reference aggregates"):
        e.generate_sql(Query(dimensions=["order_date"], metrics=["running_weird"]))

    # window metrics pull their partition/order dimensions into the inner query
    e = SemanticEngine(rich_model())
    sql = e.generate_sql(Query(metrics=["running_revenue"]))
    assert "category AS category" in sql and "order_date AS order_date" in sql
    assert "GROUP BY 1, 2" in sql
    assert (
        "SUM(base.revenue) OVER (PARTITION BY base.category "
        "ORDER BY base.order_date ROWS UNBOUNDED PRECEDING)" in sql
    )


def test_window_over_derived_and_filter_value_errors():
    """engine_test.go: TestWindowMetricCanReferenceDerivedMetric,
    TestDerivedMetricOverWindowMetricCollectsWindowInputs,
    TestPercentOfTotalUsesPartitionBy,
    TestStructuredFilterValidationRejectsInvalidOperatorAndValue."""
    m = Model(
        name="m",
        table="orders",
        dimensions=[Dimension(name="order_date", type="time")],
        metrics=[
            Metric(name="revenue", expression="sum(amount)"),
            Metric(name="cost", expression="sum(cogs)"),
            Metric(name="profit", expression="{revenue} - {cost}"),
            Metric(
                name="running_profit",
                expression="{profit}",
                window=WindowSpec(type="running_total", order_by="order_date"),
            ),
        ],
    )
    sql = SemanticEngine(m).generate_sql(Query(metrics=["running_profit"]))
    assert "sum(amount) - sum(cogs) AS profit" in sql
    assert (
        "SUM(base.profit) OVER (ORDER BY base.order_date ROWS UNBOUNDED PRECEDING)"
        " AS running_profit" in sql
    )

    m2 = Model(
        name="m",
        table="orders",
        dimensions=[Dimension(name="order_date", type="time")],
        metrics=[
            Metric(name="revenue", expression="sum(amount)"),
            Metric(
                name="running_revenue",
                expression="{revenue}",
                window=WindowSpec(type="running_total", order_by="order_date"),
            ),
            Metric(name="running_revenue_ratio", expression="{running_revenue} / 10"),
        ],
    )
    sql = SemanticEngine(m2).generate_sql(Query(metrics=["running_revenue_ratio"]))
    assert "sum(amount) AS revenue" in sql
    assert (
        "SUM(base.revenue) OVER (ORDER BY base.order_date ROWS UNBOUNDED PRECEDING)"
        " / 10 AS running_revenue_ratio" in sql
    )

    m3 = rich_model()
    for mm in m3.metrics:
        if mm.name == "revenue_share":
            mm.window.partition_by = ["category"]
    sql = SemanticEngine(m3).generate_sql(
        Query(dimensions=["category"], metrics=["revenue_share"])
    )
    assert (
        "base.revenue / NULLIF(SUM(base.revenue) OVER (PARTITION BY base.category), 0)"
        " AS revenue_share" in sql
    )

    e = SemanticEngine(rich_model())
    with pytest.raises(SemanticError, match='invalid filter operator "equal"'):
        e.generate_sql(
            Query(metrics=["revenue"], filters=[Filter(dimension="country", operator="equal", value="US")])
        )
    with pytest.raises(SemanticError, match="invalid between filter value"):
        e.generate_sql(
            Query(
                metrics=["revenue"],
                filters=[Filter(dimension="order_date", operator="between", value=["2025-01-01"])],
            )
        )
    # dict form missing start/end must raise, not render BETWEEN NULL AND ...
    # (reference semantic-engine/engine.go:790-849 filterToSQL raises on
    # malformed filters; an always-false predicate would be a silent wrong answer)
    for bad in (
        {"start": "2025-01-01"},
        {"end": "2025-02-01"},
        {"start": None, "end": "2025-02-01"},
        {"start": "2025-01-01", "end": None},
        {},
        ["2025-01-01", None],
        [None, "2025-02-01"],
    ):
        with pytest.raises(SemanticError, match="invalid between filter value"):
            e.generate_sql(
                Query(
                    metrics=["revenue"],
                    filters=[Filter(dimension="order_date", operator="between", value=bad)],
                )
            )
    # well-formed dict still renders
    sql = e.generate_sql(
        Query(
            metrics=["revenue"],
            filters=[
                Filter(
                    dimension="order_date",
                    operator="between",
                    value={"start": "2025-01-01", "end": "2025-02-01"},
                )
            ],
        )
    )
    assert "BETWEEN '2025-01-01' AND '2025-02-01'" in sql


def test_join_graph_reference_behaviors():
    """engine_test.go JoinGraph tests: reachable joined dimensions,
    unqualified-when-unambiguous, remote structured filters, fanout-path
    rejection, missing-target-key spelling."""
    def build(extra_customer_kw=None, rel="many_to_one"):
        orders = Model(
            name="orders",
            table="orders",
            joins=[Join(name="customers", relationship=rel, foreign_key="customer_id")],
            metrics=[Metric(name="revenue", expression="sum(order_total)")],
        )
        customers = Model(
            name="customers",
            table="customers",
            dimensions=[Dimension(name="country")],
            **(extra_customer_kw or {"primary_key": "customer_id"}),
        )
        return orders, customers

    orders, customers = build()
    e = SemanticEngine(orders, [customers])
    sql = e.generate_sql(Query(dimensions=["customers.country"], metrics=["revenue"]))
    assert "customers.country AS customers_country" in sql
    assert "LEFT JOIN customers AS customers ON orders.customer_id = customers.customer_id" in sql

    # unqualified dim resolves through the join graph when unambiguous
    sql = e.generate_sql(Query(dimensions=["country"], metrics=["revenue"]))
    assert "customers.country AS country" in sql

    # filter-only remote dimension still pulls the join in
    sql = e.generate_sql(
        Query(
            metrics=["revenue"],
            filters=[Filter(dimension="customers.country", operator="equals", value="US")],
        )
    )
    assert "LEFT JOIN customers" in sql and "customers.country = 'US'" in sql

    # fanout (one_to_many) paths are rejected — they inflate aggregates
    oi = Model(name="order_items", table="order_items", primary_key="id",
               dimensions=[Dimension(name="product_id")])
    o2 = Model(
        name="orders",
        table="orders",
        joins=[Join(name="order_items", relationship="one_to_many", foreign_key="order_id")],
        metrics=[Metric(name="revenue", expression="sum(order_total)")],
    )
    e2 = SemanticEngine(o2, [oi])
    with pytest.raises(SemanticError, match="join not found or unsafe: order_items"):
        e2.generate_sql(Query(dimensions=["order_items.product_id"], metrics=["revenue"]))

    # missing target key spelling
    orders, _ = build()
    no_key = Model(name="customers", table="customers", dimensions=[Dimension(name="country")])
    with pytest.raises(
        SemanticError,
        match='model "orders": join "customers" requires target_key or primary_key',
    ):
        SemanticEngine(orders, [no_key])


def test_join_graph_multi_hop_safe_path():
    """TestJoinGraphSupportsMultiHopSafePath: orders -> customers ->
    countries, each hop many_to_one, ON sides chained through the
    intermediate alias."""
    countries = Model(
        name="countries", table="countries", primary_key="country_id",
        dimensions=[Dimension(name="region")],
    )
    customers = Model(
        name="customers", table="customers", primary_key="customer_id",
        joins=[Join(name="countries", relationship="many_to_one", foreign_key="country_id")],
    )
    orders = Model(
        name="orders", table="orders",
        joins=[Join(name="customers", relationship="many_to_one", foreign_key="customer_id")],
        metrics=[Metric(name="revenue", expression="sum(order_total)")],
    )
    e = SemanticEngine(orders, [customers, countries])
    sql = e.generate_sql(Query(dimensions=["countries.region"], metrics=["revenue"]))
    assert "LEFT JOIN customers AS customers ON orders.customer_id = customers.customer_id" in sql
    assert "LEFT JOIN countries AS countries ON customers.country_id = countries.country_id" in sql
    assert "countries.region AS countries_region" in sql
    # a fanout hop anywhere on the path is rejected
    bad_customers = Model(
        name="customers", table="customers", primary_key="customer_id",
        joins=[Join(name="countries", relationship="one_to_many", foreign_key="country_id")],
    )
    e2 = SemanticEngine(orders, [bad_customers, countries])
    with pytest.raises(SemanticError, match="join not found or unsafe: countries"):
        e2.generate_sql(Query(dimensions=["countries.region"], metrics=["revenue"]))
