"""Column lineage resolver behaviors, modeled on the reference's
parse-lineage goldens (pythonsrc/parser/main.py:278-460,
pkg/lineage/lineage.go:101-269): alias resolution, CTE chains,
derived tables, asterisk expansion, non-selected columns, set ops.
"""

from bruin_spark.parser.lineage import get_column_lineage


def _cols(res):
    return {c["name"]: c["upstream"] for c in res["columns"]}


def test_simple_select_with_aliases():
    res = get_column_lineage(
        "SELECT o.o_orderkey AS id, o.o_totalprice AS price FROM orders o"
    )
    assert res["errors"] == []
    assert _cols(res) == {
        "id": [{"column": "o_orderkey", "table": "orders"}],
        "price": [{"column": "o_totalprice", "table": "orders"}],
    }


def test_expression_combines_upstreams():
    res = get_column_lineage(
        "SELECT l.l_extendedprice * (1 - l.l_discount) AS revenue FROM lineitem l"
    )
    assert _cols(res)["revenue"] == [
        {"column": "l_discount", "table": "lineitem"},
        {"column": "l_extendedprice", "table": "lineitem"},
    ]


def test_function_names_not_columns():
    res = get_column_lineage("SELECT sum(x) AS s, count(1) AS n FROM t")
    assert _cols(res) == {"s": [{"column": "x", "table": "t"}], "n": []}


def test_cte_chain_resolves_to_leaf_tables():
    res = get_column_lineage(
        """
        WITH base AS (SELECT o_custkey AS ck, o_totalprice AS tp FROM orders),
             agg AS (SELECT ck, sum(tp) AS total FROM base GROUP BY ck)
        SELECT c.c_name, a.total FROM customer c JOIN agg a ON c.c_custkey = a.ck
        """
    )
    cols = _cols(res)
    assert cols["c_name"] == [{"column": "c_name", "table": "customer"}]
    # through two CTE hops down to orders
    assert cols["total"] == [{"column": "o_totalprice", "table": "orders"}]


def test_derived_table_subquery():
    res = get_column_lineage(
        "SELECT s.total FROM (SELECT sum(o_totalprice) AS total FROM orders) s"
    )
    assert _cols(res)["total"] == [{"column": "o_totalprice", "table": "orders"}]


def test_star_expansion_with_schema():
    res = get_column_lineage(
        "SELECT * FROM orders",
        schema={"orders": {"o_orderkey": "bigint", "o_custkey": "bigint"}},
    )
    assert res["errors"] == []
    assert _cols(res) == {
        "o_orderkey": [{"column": "o_orderkey", "table": "orders"}],
        "o_custkey": [{"column": "o_custkey", "table": "orders"}],
    }


def test_qualified_star_expansion():
    res = get_column_lineage(
        "SELECT o.*, c.c_name FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey",
        schema={"orders": ["o_orderkey", "o_custkey"], "customer": ["c_custkey", "c_name"]},
    )
    cols = _cols(res)
    assert set(cols) == {"o_orderkey", "o_custkey", "c_name"}
    assert cols["o_orderkey"] == [{"column": "o_orderkey", "table": "orders"}]


def test_star_through_cte_needs_no_schema():
    # the CTE's output list is known, so * expands without a schema
    res = get_column_lineage(
        "WITH x AS (SELECT o_orderkey AS a, o_custkey AS b FROM orders) SELECT * FROM x"
    )
    assert _cols(res) == {
        "a": [{"column": "o_orderkey", "table": "orders"}],
        "b": [{"column": "o_custkey", "table": "orders"}],
    }


def test_star_without_schema_is_an_error():
    res = get_column_lineage("SELECT * FROM orders")
    assert any("schema" in e for e in res["errors"])


def test_non_selected_where_join_group():
    res = get_column_lineage(
        """
        SELECT o.o_orderkey FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_orderstatus = 'F'
        GROUP BY o.o_orderkey
        """
    )
    ns = {n["name"]: n["upstream"] for n in res["non_selected_columns"]}
    assert ns["o_custkey"] == [{"column": "o_custkey", "table": "orders"}]
    assert ns["c_custkey"] == [{"column": "c_custkey", "table": "customer"}]
    assert ns["o_orderstatus"] == [{"column": "o_orderstatus", "table": "orders"}]
    assert ns["o_orderkey"] == [{"column": "o_orderkey", "table": "orders"}]


def test_non_selected_through_cte_resolves_to_leaf():
    res = get_column_lineage(
        "WITH x AS (SELECT o_custkey AS ck FROM orders) SELECT count(1) AS n FROM x WHERE ck > 5"
    )
    ns = {n["name"]: n["upstream"] for n in res["non_selected_columns"]}
    assert ns["ck"] == [{"column": "o_custkey", "table": "orders"}]


def test_union_merges_upstreams_positionally():
    res = get_column_lineage(
        "SELECT o_orderkey AS k FROM orders UNION ALL SELECT l_orderkey AS k FROM lineitem"
    )
    assert _cols(res)["k"] == [
        {"column": "l_orderkey", "table": "lineitem"},
        {"column": "o_orderkey", "table": "orders"},
    ]


def test_unqualified_single_source():
    res = get_column_lineage("SELECT o_orderkey FROM orders WHERE o_totalprice > 0")
    assert _cols(res)["o_orderkey"] == [{"column": "o_orderkey", "table": "orders"}]
    ns = {n["name"] for n in res["non_selected_columns"]}
    assert ns == {"o_totalprice"}


def test_unqualified_multi_source_uses_schema():
    res = get_column_lineage(
        "SELECT o_orderkey, c_name FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey",
        schema={"orders": ["o_orderkey", "o_custkey"], "customer": ["c_custkey", "c_name"]},
    )
    cols = _cols(res)
    assert cols["o_orderkey"] == [{"column": "o_orderkey", "table": "orders"}]
    assert cols["c_name"] == [{"column": "c_name", "table": "customer"}]


def test_case_and_cast_expressions():
    res = get_column_lineage(
        "SELECT CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END AS x, "
        "CAST(o_custkey AS STRING) AS ck FROM orders"
    )
    cols = _cols(res)
    assert cols["x"] == [
        {"column": "o_orderstatus", "table": "orders"},
        {"column": "o_totalprice", "table": "orders"},
    ]
    assert cols["ck"] == [{"column": "o_custkey", "table": "orders"}]


def test_implicit_alias():
    res = get_column_lineage("SELECT o_orderkey id FROM orders")
    assert _cols(res) == {"id": [{"column": "o_orderkey", "table": "orders"}]}


def test_window_function():
    res = get_column_lineage(
        "SELECT rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS r FROM orders"
    )
    assert _cols(res)["r"] == [
        {"column": "o_custkey", "table": "orders"},
        {"column": "o_totalprice", "table": "orders"},
    ]


def test_schema_qualified_tables():
    res = get_column_lineage("SELECT t.x FROM warehouse.schema1.tbl t")
    assert _cols(res)["x"] == [{"column": "x", "table": "warehouse.schema1.tbl"}]


def test_parse_error_is_reported_not_raised():
    res = get_column_lineage("DELETE FROM t WHERE x = 1")
    assert res["columns"] == [] and res["errors"]


def test_binary_expression_not_mistaken_for_alias():
    """`a + b` has no implicit alias; both operands are upstreams."""
    from bruin_spark.parser.lineage import get_column_lineage

    r = get_column_lineage("SELECT price + tax FROM items", {"items": ["price", "tax"]})
    [col] = r["columns"]
    assert {u["column"] for u in col["upstream"]} == {"price", "tax"}
    # implicit alias after a complete expression still works
    r = get_column_lineage("SELECT price p FROM items", {"items": ["price", "tax"]})
    assert r["columns"][0]["name"] == "p"


def test_count_star_keeps_alias():
    from bruin_spark.parser.lineage import get_column_lineage

    r = get_column_lineage("SELECT count(*) AS n FROM items", {"items": ["price", "tax"]})
    assert [c["name"] for c in r["columns"]] == ["n"]
    assert r["errors"] == []


def test_qualifier_requires_part_boundary():
    from bruin_spark.parser.lineage import get_column_lineage

    r = get_column_lineage(
        "SELECT users.id FROM myusers, orders", {"myusers": ["id"], "orders": ["id"]}
    )
    assert any("unknown table or alias" in e for e in r["errors"])


def test_struct_field_refs_resolve_to_top_field():
    """u.profile.email: longest source-matching prefix wins, the next
    part is the COLUMN (rest are struct fields) — sqlglot's behavior."""
    r = get_column_lineage("SELECT u.profile.email AS email, u.id FROM users u")
    assert _cols(r)["email"] == [{"column": "profile", "table": "users"}]
    assert r["errors"] == []
    # unqualified struct path resolves when the schema knows the column
    r = get_column_lineage(
        "SELECT profile.email AS email FROM users", {"users": ["id", "profile"]}
    )
    assert _cols(r)["email"] == [{"column": "profile", "table": "users"}]
    assert r["errors"] == []


def test_values_inline_table():
    """(VALUES ...) AS v(c1, c2): declared names, no upstream lineage."""
    r = get_column_lineage("SELECT * FROM (VALUES (1, 'a'), (2, 'b')) AS v(id, name)")
    assert [c["name"] for c in r["columns"]] == ["id", "name"]
    assert all(c["upstream"] == [] for c in r["columns"])
    assert r["errors"] == []
    r = get_column_lineage(
        "SELECT t.x, v.name FROM t JOIN (VALUES (1,'a')) AS v(id, name) ON t.id = v.id"
    )
    assert _cols(r)["x"] == [{"column": "x", "table": "t"}]
    assert _cols(r)["name"] == []
    assert r["errors"] == []


def test_subquery_refs_stay_in_their_scope():
    """Correlated/scalar/IN subqueries must not leak their inner aliases
    into the outer scope (no spurious unknown-alias errors, no
    misattributed upstreams)."""
    r = get_column_lineage(
        "SELECT o.id FROM orders o WHERE EXISTS "
        "(SELECT 1 FROM lineitem l WHERE l.oid = o.id)"
    )
    assert _cols(r)["id"] == [{"column": "id", "table": "orders"}]
    assert r["errors"] == []
    # a scalar subquery's OWN refs resolve in its own scope and become
    # the item's upstream (reference main_test.py "subquery in select":
    # avg_salary <- salaries.salary); correlated refs resolve outward
    r = get_column_lineage("SELECT id, (SELECT max(x) FROM t2) AS m FROM t1")
    assert _cols(r)["m"] == [{"column": "x", "table": "t2"}] and r["errors"] == []
    r = get_column_lineage(
        "SELECT emp_id, (SELECT AVG(salary) FROM salaries s "
        "WHERE s.emp_id = employees.emp_id) AS avg_salary FROM employees"
    )
    assert _cols(r)["avg_salary"] == [{"column": "salary", "table": "salaries"}]
    assert r["errors"] == []


# -- round-8 ADVICE regressions ------------------------------------------------


def _ns(res):
    return {n["name"]: n["upstream"] for n in res["non_selected_columns"]}


def test_semi_join_on_right_side_column_resolves_to_right_table():
    """Unqualified right-side-only columns in a SEMI/ANTI ON condition must
    resolve to the RIGHT table: Spark scopes the semi-join right side INTO
    the ON clause, only out of the select list."""
    res = get_column_lineage(
        "SELECT a FROM t1 LEFT SEMI JOIN t2 ON x = b",
        schema={"t1": ["a", "x"], "t2": ["b", "y"]},
    )
    assert res["errors"] == []
    assert _cols(res) == {"a": [{"column": "a", "table": "t1"}]}
    assert _ns(res) == {
        "b": [{"column": "b", "table": "t2"}],
        "x": [{"column": "x", "table": "t1"}],
    }


def test_anti_join_on_condition_scope_and_select_invisibility():
    res = get_column_lineage(
        "SELECT a FROM t1 LEFT ANTI JOIN t2 ON a = b AND y > 5",
        schema={"t1": ["a"], "t2": ["b", "y"]},
    )
    assert res["errors"] == []
    ns = _ns(res)
    assert ns["b"] == [{"column": "b", "table": "t2"}]
    assert ns["y"] == [{"column": "y", "table": "t2"}]
    # the right side stays out of the SELECT scope: `a` is t1's
    assert _cols(res) == {"a": [{"column": "a", "table": "t1"}]}


def test_unpivot_in_list_aliases_are_labels_not_columns():
    res = get_column_lineage(
        "SELECT k, v FROM t1 UNPIVOT (v FOR k IN (a AS lbl, b AS lbl2))",
        schema={"t1": ["id", "a", "b"]},
    )
    assert res["errors"] == []
    # value column upstream = only the real IN columns; the AS labels are
    # string values of k, not columns
    assert _cols(res) == {
        "k": [],
        "v": [{"column": "a", "table": "t1"}, {"column": "b", "table": "t1"}],
    }


def test_unpivot_include_nulls_modifier_consumed():
    res = get_column_lineage(
        "SELECT id, k, v FROM t1 UNPIVOT INCLUDE NULLS (v FOR k IN (a, b))",
        schema={"t1": ["id", "a", "b"]},
    )
    assert res["errors"] == []
    assert _cols(res) == {
        "id": [{"column": "id", "table": "t1"}],
        "k": [],
        "v": [{"column": "a", "table": "t1"}, {"column": "b", "table": "t1"}],
    }
    res2 = get_column_lineage(
        "SELECT v FROM t1 UNPIVOT EXCLUDE NULLS (v FOR k IN (a))",
        schema={"t1": ["id", "a"]},
    )
    assert res2["errors"] == []
    assert _cols(res2)["v"] == [{"column": "a", "table": "t1"}]


def test_unpivot_multi_value_in_items_drop_all_columns():
    res = get_column_lineage(
        "SELECT v1, v2 FROM t1 UNPIVOT ((v1, v2) FOR k IN ((a1, a2) AS x, (b1, b2) AS y))",
        schema={"t1": ["id", "a1", "a2", "b1", "b2"]},
    )
    assert res["errors"] == []
    cols = _cols(res)
    # all four source columns feed the value output; labels x/y do not
    ups = {(u["table"], u["column"]) for u in cols.get("v2", cols.get("v1", []))}
    assert ("t1", "x") not in ups and ("t1", "y") not in ups


def test_named_window_spec_feeds_item_upstream():
    res = get_column_lineage(
        "SELECT sum(a) OVER w AS s FROM t1 WINDOW w AS (PARTITION BY x ORDER BY y)",
        schema={"t1": ["a", "x", "y"]},
    )
    assert res["errors"] == []
    assert _cols(res)["s"] == [
        {"column": "a", "table": "t1"},
        {"column": "x", "table": "t1"},
        {"column": "y", "table": "t1"},
    ]


def test_named_window_base_reference_chains():
    res = get_column_lineage(
        "SELECT sum(a) OVER w2 AS s FROM t1 WINDOW w1 AS (PARTITION BY x), w2 AS (w1 ORDER BY y)",
        schema={"t1": ["a", "x", "y"]},
    )
    assert res["errors"] == []
    assert _cols(res)["s"] == [
        {"column": "a", "table": "t1"},
        {"column": "x", "table": "t1"},
        {"column": "y", "table": "t1"},
    ]
