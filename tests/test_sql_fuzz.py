"""Differential fuzz of the hand-rolled SQL parser services against
ground truth tracked by the grammar generator (tests/sqlgen.py) and
against Spark's own parser/analyzer.

Invariants (reference bar: the sqlglot behaviors in
/root/reference/pythonsrc/parser/main.py:278-460):
  * used_tables(sql) == exactly the physical tables the generator used
  * rename_tables round-trips (forward map then inverse map)
  * extract_ctes returns exactly the top-level CTE names, in order
  * is_single_select is true for every generated statement
  * spark.sql analyzes: the query itself, add_limit / freeze_time /
    select_from_cte / prepend_ctes rewrite outputs
  * get_column_lineage: no exception, no errors, and every upstream
    table is a physical leaf (never a CTE name or alias)

Crashers this suite originally found are pinned at the bottom as
regression tests (comma FROM lists after subqueries, EXTRACT's
expression FROM, LATERAL VIEW lineage, CTE column-list preservation).
"""

from __future__ import annotations

import pytest

from bruin_spark.parser.lineage import get_column_lineage
from bruin_spark.parser.sqlutil import (
    add_limit,
    extract_ctes,
    freeze_time,
    is_single_select,
    prepend_ctes,
    rename_tables,
    select_from_cte,
    used_tables,
)
from tests.sqlgen import CATALOG, generate

N_TEXT = 1600  # text-only invariants (fast)
N_SPARK = 320  # spark-analyzed invariants (per-query analysis cost)


# -- text-only invariants over many seeds --------------------------------------


def test_fuzz_used_tables_and_renames():
    for seed in range(N_TEXT):
        sql, g = generate(seed, spark_mode=(seed % 2 == 0))
        expect = sorted(g.used)
        assert used_tables(sql) == expect, f"seed {seed}: {sql}"
        mapping = {t: "rx." + t.replace(".", "_") for t in g.used}
        renamed = rename_tables(sql, mapping)
        assert used_tables(renamed) == sorted(mapping.values()), f"seed {seed}"
        back = rename_tables(renamed, {v: k for k, v in mapping.items()})
        assert used_tables(back) == expect, f"seed {seed}"


def test_fuzz_ctes_and_single_select():
    for seed in range(N_TEXT):
        sql, g = generate(seed, spark_mode=(seed % 2 == 0))
        assert is_single_select(sql), f"seed {seed}: {sql}"
        assert list(extract_ctes(sql)) == [n for n, _ in g.top_ctes], f"seed {seed}"


def test_fuzz_lineage_never_raises_and_grounds():
    schema = dict(CATALOG)
    for seed in range(N_TEXT):
        sql, g = generate(seed, spark_mode=(seed % 2 == 0))
        lin = get_column_lineage(sql, schema=schema)
        assert lin["errors"] == [], f"seed {seed}: {lin['errors']}\n{sql}"
        ok = g.leaves | {""}
        for col in lin["columns"]:
            for u in col["upstream"]:
                assert u["table"] in ok, f"seed {seed}: ungrounded {u} in {sql}"
        for col in lin["non_selected_columns"]:
            for u in col["upstream"]:
                assert u["table"] in ok, f"seed {seed}: ungrounded {u} in {sql}"


# -- spark-differential invariants ---------------------------------------------


@pytest.fixture(scope="module")
def fuzz_catalog(spark):
    for t, cols in CATALOG.items():
        sel = ", ".join(f"CAST(0 AS BIGINT) AS {c}" for c in cols)
        if "." in t:
            db = t.split(".")[0]
            spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            spark.sql(f"CREATE TABLE {t} USING PARQUET AS SELECT {sel}")
        else:
            spark.sql(f"CREATE OR REPLACE TEMPORARY VIEW {t} AS SELECT {sel}")
    yield spark
    for t in CATALOG:
        if "." in t:
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        else:
            spark.catalog.dropTempView(t)


def test_fuzz_spark_differential(fuzz_catalog):
    spark = fuzz_catalog
    n_cte_checked = 0
    for seed in range(N_SPARK):
        sql, g = generate(seed, spark_mode=True)
        spark.sql(sql)  # generator output must analyze — else no signal
        spark.sql(add_limit(sql, 7))
        if g.has_now:
            spark.sql(freeze_time(sql, "2021-03-04 05:06:07"))
        ctes = dict(g.top_ctes)
        if ctes:
            # a random-but-deterministic CTE, not always the first, so
            # column-list renames on later CTEs are exercised
            names = list(ctes)
            name = names[seed % len(names)]
            spark.sql(select_from_cte(sql, name))
            fixture = "SELECT " + ", ".join(
                f"{i} AS {c}" for i, c in enumerate(ctes[name])
            )
            spark.sql(prepend_ctes(sql, {name: fixture}))
            n_cte_checked += 1
    assert n_cte_checked > N_SPARK // 4  # the corpus actually has CTEs


# -- pinned regressions (crashers found by earlier fuzz runs) ------------------


def test_comma_from_list_after_subquery():
    # the subquery used to swallow the rest of the comma list
    sql = "SELECT 1 FROM (SELECT 1 AS x FROM t1) a, t2 b, db1.t3 c WHERE b.y = c.z"
    assert used_tables(sql) == ["db1.t3", "t1", "t2"]


def test_extract_from_is_not_a_table():
    sql = "SELECT EXTRACT(day FROM o_ts) AS d FROM fz_orders"
    assert used_tables(sql) == ["fz_orders"]
    sql2 = "SELECT SUBSTRING(name FROM 1 FOR 2), TRIM(BOTH ' ' FROM name) FROM t1"
    assert used_tables(sql2) == ["t1"]


def test_lateral_view_lineage():
    schema = {"fz_events": ["e_id", "e_user"]}
    lin = get_column_lineage(
        "SELECT lv.n AS x, a.e_id AS y FROM fz_events a "
        "LATERAL VIEW explode(sequence(1, e_user)) lv AS n",
        schema,
    )
    assert lin["errors"] == []
    by_name = {c["name"]: c["upstream"] for c in lin["columns"]}
    assert by_name["y"] == [{"column": "e_id", "table": "fz_events"}]
    # the exploded column is generator output — no physical upstream
    assert all(u["table"] == "" for u in by_name["x"])
    # the explode argument's refs are grounded as non-selected
    ns = {u["column"] for c in lin["non_selected_columns"] for u in c["upstream"]}
    assert "e_user" in ns


def test_comma_relation_after_join_condition():
    # ON/USING used to close the FROM list permanently, silently
    # dropping a comma-joined relation that follows the join condition
    sql = "SELECT * FROM t1 JOIN t2 ON t1.x = t2.x, t3"
    assert used_tables(sql) == ["t1", "t2", "t3"]
    sql2 = "SELECT * FROM t1 JOIN t2 USING (a, b), t3 x WHERE x.y = 1"
    assert used_tables(sql2) == ["t1", "t2", "t3"]
    # other enders still close the list: GROUP BY commas are not tables
    sql3 = "SELECT a, b FROM t1 JOIN t2 ON t1.x = t2.x GROUP BY a, b"
    assert used_tables(sql3) == ["t1", "t2"]


def test_rename_back_alias_preserves_quoting():
    # a quoted multi-word source must get a QUOTED back-alias
    out = rename_tables('SELECT * FROM "My Table"', {"My Table": "other"})
    assert 'AS "My Table"' in out
    out2 = rename_tables("SELECT * FROM `My Table`", {"My Table": "other"})
    assert "AS `My Table`" in out2
    # plain identifiers keep the unquoted alias
    out3 = rename_tables("SELECT * FROM items", {"items": "new_items"})
    assert "new_items AS items" in out3


def test_cte_column_list_preserved_in_rebuilds():
    sql = (
        "WITH c1(r1, r2) AS (SELECT 1 AS a, 2 AS b), "
        "c2 AS (SELECT r1 + r2 AS s FROM c1) SELECT s FROM c2"
    )
    out = select_from_cte(sql, "c2")
    assert "c1(r1, r2) AS" in out
    pre = prepend_ctes(sql, {"c1": "SELECT 10 AS a, 20 AS b"})
    # the shadowed CTE keeps its declared output names
    assert "c1(r1, r2) AS (SELECT 10 AS a, 20 AS b)" in pre
