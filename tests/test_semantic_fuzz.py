"""Property fuzz of the semantic compiler (reference:
semantic-engine/engine.go:251-283, 426-566).

Two invariant layers over randomly generated model/query combos
(nested metric refs × metric filters × window metrics × joins ×
segments × structured filters):

  A. every compiled SQL ANALYZES under spark.sql against real tables
     with the model's schema (300 random queries);
  B. for the oracle-able subset (plain/filtered aggregates + dims +
     filters + segments — no window/derived), the compiled SQL EXECUTED
     on Spark matches an independent pandas groupby computation on the
     same seeded data (40 random queries).
"""

from __future__ import annotations

import random

import pandas as pd
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

STATUSES = ["done", "open", "void"]
COUNTRIES = ["de", "fr", "us", "jp"]


def _seed_frames():
    rng = random.Random(42)
    customers = pd.DataFrame(
        {"id": range(1, 21), "country": [COUNTRIES[i % 4] for i in range(20)]}
    )
    orders = pd.DataFrame(
        {
            "id": range(1, 201),
            "customer_id": [rng.randint(1, 20) for _ in range(200)],
            "amount": [round(rng.uniform(5, 500), 2) for _ in range(200)],
            "qty": [rng.randint(1, 9) for _ in range(200)],
            "status": [rng.choice(STATUSES) for _ in range(200)],
            "created_at": pd.to_datetime(
                [
                    f"2024-{rng.randint(1, 6):02d}-{rng.randint(1, 28):02d} 12:00:00"
                    for _ in range(200)
                ]
            ),
        }
    )
    return orders, customers


@pytest.fixture(scope="module")
def sem_tables(spark):
    orders, customers = _seed_frames()
    spark.sql("CREATE DATABASE IF NOT EXISTS sales")
    spark.sql("CREATE DATABASE IF NOT EXISTS crm")
    spark.sql("DROP TABLE IF EXISTS sales.orders")
    spark.sql("DROP TABLE IF EXISTS crm.customers")
    spark.createDataFrame(orders).write.saveAsTable("sales.orders")
    spark.createDataFrame(customers).write.saveAsTable("crm.customers")
    yield spark, orders, customers
    spark.sql("DROP TABLE IF EXISTS sales.orders")
    spark.sql("DROP TABLE IF EXISTS crm.customers")


# -- random model/query generation ---------------------------------------------

BASE_METRICS = [
    ("m_rev", "SUM(amount)"),
    ("m_n", "COUNT(*)"),
    ("m_cust", "COUNT(DISTINCT customer_id)"),
    ("m_minq", "MIN(qty)"),
    ("m_maxq", "MAX(qty)"),
    ("m_avg", "AVG(amount)"),
]
METRIC_FILTERS = ["", "amount > 100", "qty <= 5", "status = 'done'"]


def _random_model(rng: random.Random) -> tuple[SemanticEngine, list[str], list[str]]:
    """-> (engine, oracle_metric_names, fancy_metric_names)."""
    metrics = []
    oracle_names = []
    for name, expr in BASE_METRICS:
        metrics.append(Metric(name=name, expression=expr, filter=rng.choice(METRIC_FILTERS)))
        oracle_names.append(name)
    fancy = []
    # derived metrics with nesting
    a, b = rng.sample(oracle_names, 2)
    metrics.append(Metric(name="m_d1", expression=f"{{{a}}} / {{{b}}}"))
    metrics.append(Metric(name="m_d2", expression=f"{{m_d1}} + {{{rng.choice(oracle_names)}}}"))
    fancy += ["m_d1", "m_d2"]
    # window metric over the time grain
    metrics.append(
        Metric(
            name="m_run",
            expression=f"{{{rng.choice(oracle_names)}}}",
            window=WindowSpec(type=rng.choice(["running_total", "rank"]), order_by="created_day"),
        )
    )
    fancy.append("m_run")
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
                granularities={"day": "CAST(created_at AS DATE)", "month": "date_trunc('month', created_at)"},
            ),
        ],
        metrics=metrics,
        segments=[Segment(name="done", filter="status = 'done'")],
    )
    customers = Model(
        name="customers",
        table="crm.customers",
        primary_key="id",
        dimensions=[Dimension(name="country")],
    )
    return SemanticEngine(orders, [customers]), oracle_names, fancy


def _random_query(rng: random.Random, oracle_names, fancy, oracle_only: bool) -> Query:
    dims = []
    if rng.random() < 0.7:
        dims.append(DimensionRef("status"))
    if rng.random() < 0.4:
        dims.append(DimensionRef("customers.country"))
    if rng.random() < 0.4:
        dims.append(DimensionRef("created", granularity="day"))
    pool = list(oracle_names) + ([] if oracle_only else list(fancy))
    mets = rng.sample(pool, rng.randint(1, 3))
    if "m_run" in mets and not any(d.name == "created" for d in dims):
        # window order_by needs the grain in the query
        dims.append(DimensionRef("created", granularity="day"))
    filters = []
    if rng.random() < 0.5:
        filters.append(Filter(dimension="status", operator="in", value=rng.sample(STATUSES, 2)))
    if rng.random() < 0.3:
        filters.append(
            Filter(dimension="created", operator="between", value=["2024-02-01", "2024-05-01"])
        )
    if not oracle_only and rng.random() < 0.3:
        filters.append(Filter(expression=f"{{{rng.choice(oracle_names)}}} > 10"))
    segments = ["done"] if rng.random() < 0.25 else []
    sort = []
    if dims and rng.random() < 0.4:
        sort.append(SortSpec(name=dims[0].name if dims[0].name != "customers.country" else "customers_country", direction=rng.choice(["asc", "desc"])))
    limit = rng.choice([0, 0, 0, 5, 50]) if not oracle_only else 0
    return Query(dimensions=dims, metrics=mets, filters=filters, segments=segments, sort=sort, limit=limit)


N_ANALYZE = 300
N_EXEC = 40


def test_fuzz_compiled_sql_analyzes(sem_tables):
    spark, _o, _c = sem_tables
    n_window = n_derived = 0
    for seed in range(N_ANALYZE):
        rng = random.Random(seed)
        engine, oracle_names, fancy = _random_model(rng)
        q = _random_query(rng, oracle_names, fancy, oracle_only=False)
        try:
            sql = engine.generate_sql(q)
        except SemanticError:
            continue  # generator hit a legitimately-rejected combo
        n_window += any(m == "m_run" for m in q.metrics)
        n_derived += any(m in ("m_d1", "m_d2") for m in q.metrics)
        spark.sql(sql)  # analysis must succeed
    # corpus must actually contain the hard shapes
    assert n_window > 10 and n_derived > 30


# -- independent pandas oracle -------------------------------------------------


def _pandas_metric(df: pd.DataFrame, name: str, flt: str) -> float:
    if flt == "amount > 100":
        df = df[df["amount"] > 100]
    elif flt == "qty <= 5":
        df = df[df["qty"] <= 5]
    elif flt == "status = 'done'":
        df = df[df["status"] == "done"]
    if name == "m_rev":
        return df["amount"].sum() if len(df) else None
    if name == "m_n":
        return len(df)
    if name == "m_cust":
        return df["customer_id"].nunique()
    if name == "m_minq":
        return df["qty"].min() if len(df) else None
    if name == "m_maxq":
        return df["qty"].max() if len(df) else None
    if name == "m_avg":
        return df["amount"].mean() if len(df) else None
    raise AssertionError(name)


def _pandas_oracle(orders, customers, engine, q: Query):
    df = orders.merge(
        customers.rename(columns={"id": "cust_id", "country": "country"}),
        left_on="customer_id",
        right_on="cust_id",
        how="left",
    )
    for f in q.filters:
        if f.dimension == "status" and f.operator == "in":
            df = df[df["status"].isin(f.value)]
        elif f.dimension == "created" and f.operator == "between":
            lo, hi = pd.Timestamp(f.value[0]), pd.Timestamp(f.value[1])
            df = df[(df["created_at"] >= lo) & (df["created_at"] <= hi)]
        else:
            raise AssertionError(f)
    if q.segments:
        df = df[df["status"] == "done"]

    keys = []
    for d in q.dimensions:
        if d.name == "status":
            keys.append(("status", df["status"]))
        elif d.name == "customers.country":
            keys.append(("customers_country", df["country"]))
        elif d.name == "created":
            keys.append(("created", df["created_at"].dt.date.astype(str)))
    mfilters = {m.name: m.filter for m in engine.model.metrics}

    rows = []
    if keys:
        gdf = df.copy()
        for kname, kvals in keys:
            gdf[f"__k_{kname}"] = kvals.values
        for gvals, sub in gdf.groupby([f"__k_{k}" for k, _v in keys], dropna=False):
            if not isinstance(gvals, tuple):
                gvals = (gvals,)
            row = list(gvals)
            for m in q.metrics:
                row.append(_pandas_metric(sub, m, mfilters[m]))
            rows.append(row)
    else:
        rows.append([_pandas_metric(df, m, mfilters[m]) for m in q.metrics])
    return rows


def _norm(rows):
    out = []
    for r in rows:
        cells = []
        for v in r:
            if hasattr(v, "item"):  # numpy scalar -> python scalar
                v = v.item()
            if v is None or (isinstance(v, float) and pd.isna(v)):
                cells.append(None)
            elif isinstance(v, (int, float)):
                cells.append(round(float(v), 4))
            else:
                cells.append(str(v))
        out.append(tuple(cells))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def test_fuzz_malformed_filters_always_raise():
    """Malformed structured filters must raise SemanticError, never compile to
    an always-false predicate (reference semantic-engine/engine.go:790-849
    rejects malformed filters). Fuzzes between/in/comparison shapes."""
    rng = random.Random(777)
    n_raised = 0
    for _ in range(200):
        engine, _oracle, _fancy = _random_model(rng)
        kind = rng.randrange(6)
        if kind == 0:  # dict between missing a bound
            v = {rng.choice(["start", "end"]): "2024-03-01"}
            f = Filter(dimension="created", operator="between", value=v)
        elif kind == 1:  # dict between with a None bound
            v = {"start": "2024-01-01", "end": None}
            if rng.random() < 0.5:
                v = {"start": None, "end": "2024-06-01"}
            f = Filter(dimension="created", operator="between", value=v)
        elif kind == 2:  # list between with wrong arity
            v = rng.choice([[], ["2024-01-01"], ["a", "b", "c"]])
            f = Filter(dimension="created", operator="between", value=v)
        elif kind == 3:  # list between with a None bound
            v = rng.choice([["2024-01-01", None], [None, "2024-06-01"]])
            f = Filter(dimension="created", operator="between", value=v)
        elif kind == 4:  # unknown operator
            f = Filter(dimension="status", operator=rng.choice(["equal", "betwen", "like!"]), value="done")
        else:  # unknown dimension
            f = Filter(dimension="no_such_dim", operator="equals", value="x")
        with pytest.raises(SemanticError):
            engine.generate_sql(Query(metrics=["m_rev"], filters=[f]))
        n_raised += 1
    assert n_raised == 200


def test_fuzz_compiled_sql_matches_pandas_oracle(sem_tables):
    spark, orders, customers = sem_tables
    n_checked = 0
    for seed in range(N_EXEC):
        rng = random.Random(10_000 + seed)
        engine, oracle_names, fancy = _random_model(rng)
        q = _random_query(rng, oracle_names, fancy, oracle_only=True)
        q.sort = []  # compare as sets; sort only reorders
        try:
            sql = engine.generate_sql(q)
        except SemanticError:
            continue
        got = _norm([list(r) for r in spark.sql(sql).collect()])
        want = _norm(_pandas_oracle(orders, customers, engine, q))
        assert got == want, f"seed {seed}\nsql={sql}\ngot={got}\nwant={want}"
        n_checked += 1
    assert n_checked >= N_EXEC * 3 // 4
